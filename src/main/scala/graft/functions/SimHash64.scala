package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 64-bit SimHash of a document in one pass.
  *
  * Semantics match Dedup.simhashFromHashes over
  * `transform(tokens(text), t => xxhash64(t))`: per lowercase whitespace
  * token, a seed-42 XXH64; signature bit i is set iff the sum over
  * tokens of (2·bit_i(hash) − 1) is positive.
  *
  * The column-algebra version runs 64 interpreted array-aggregates per
  * row (one per bit); this is a single codegen'd call maintaining 64
  * counters in one token scan.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires a STRING input, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def foldable: Boolean = child.foldable

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** [[SimHash64]] with a caller-chosen XXH64 seed: an independent 64-bit
  * signature half. Two seeds give a 128-bit SimHash — the scale path
  * for exhaustive Hamming-≤3 blocking when the 16-bit blocks of a
  * 64-bit signature saturate (per-block-value occupancy ∝ n/2^16 turns
  * the candidate join quadratic; 32-bit blocks push that knee out by
  * 2^16×). Kept as a separate expression so the registered 1-arg
  * `simhash64` SQL function keeps its shape.
  */
case class SimHash64Seeded(child: Expression, seed: Long)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash64_seeded requires a STRING input, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64_seeded"
  override def foldable: Boolean = child.foldable

  override def nullSafeEval(input: Any): Any =
    SimHash64.computeSeeded(input.asInstanceOf[UTF8String], seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHash64.computeSeeded($c, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression)
  : SimHash64Seeded = copy(child = newChild)
}

object SimHash64Seeded {
  def apply(text: Column, seed: Long): Column =
    Bridge.column(SimHash64Seeded(Bridge.expression(text), seed))
}

object SimHash64 {

  def apply(text: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(text)))

  private val Seed = 42L // Spark's xxhash64 seed
  private val SplitPattern = java.util.regex.Pattern.compile("\\s+")

  def compute(text: UTF8String): Long = computeSeeded(text, Seed)

  def computeSeeded(text: UTF8String, seed: Long): Long = {
    val tokens = SplitPattern.split(text.toLowerCase.toString, -1)
    val counters = new Array[Int](64)
    var t = 0
    while (t < tokens.length) {
      val h = XXH64.hashUTF8String(UTF8String.fromString(tokens(t)), seed)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counters(i) += 1 else counters(i) -= 1
        i += 1
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (counters(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }
}
