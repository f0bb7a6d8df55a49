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

object SimHash64 {

  def apply(text: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(text)))

  private val Seed = 42L // Spark's xxhash64 seed
  private val SplitPattern = java.util.regex.Pattern.compile("\\s+")

  def compute(text: UTF8String): Long = {
    val tokens = SplitPattern.split(text.toLowerCase.toString, -1)
    val counters = new Array[Int](64)
    var t = 0
    while (t < tokens.length) {
      val h = XXH64.hashUTF8String(UTF8String.fromString(tokens(t)), Seed)
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
