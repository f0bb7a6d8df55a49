package graft.functions

import java.util.LinkedHashSet

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: distinct xxhash64 values of a document's
  * token n-gram shingles, in one pass over the string.
  *
  * Semantically identical to the column-algebra pipeline
  * `transform(array_distinct(shingles(text, n)), s => xxhash64(s))`
  * (TextOps.shinglesFromTokens + hash), bit-for-bit: same tokenization as
  * `split(lower(text), "\\s+")` (Java regex, limit -1), same space-joined
  * shingle strings, same seed-42 XXH64 as Spark's `xxhash64`.
  *
  * Why an Expression instead of the column algebra: higher-order
  * functions (transform/filter/aggregate) never enter whole-stage
  * codegen and re-evaluate per element with boxing; this expression is
  * one generated static call per row — no intermediate string arrays, no
  * per-element virtual dispatch. It is the hot inner loop of MinHash
  * dedup, n-gram Jaccard, and document fingerprinting.
  */
case class ShingleHashes(child: Expression, n: Int)
  extends UnaryExpression {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires a STRING input, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  // deterministic pure function: let ConstantFolding evaluate literal
  // inputs at plan time
  override def foldable: Boolean = child.foldable

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashes.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {

  /** Column-API entry point. */
  def apply(text: Column, n: Int): Column =
    Bridge.column(ShingleHashes(Bridge.expression(text), n))

  private val Seed = 42L // Spark's xxhash64 seed

  private val SplitPattern = java.util.regex.Pattern.compile("\\s+")

  /** One-pass tokenize → shingle → distinct → hash. Invoked from both
    * interpreted eval and generated code.
    */
  def compute(text: UTF8String, n: Int): ArrayData = {
    // Pattern.split(s, -1) matches Spark's split(col, "\\s+") exactly
    // (leading empty token kept, trailing empties kept with limit -1)
    val tokens = SplitPattern.split(text.toLowerCase.toString, -1)

    val size = tokens.length
    // fewer than n tokens → zero shingles (bit-equal to the guarded
    // TextOps.shinglesFromTokens — no truncated shingle for short docs)
    val nShingles = math.max(size - n + 1, 0)
    val distinct = new LinkedHashSet[String](nShingles * 2)
    var k = 0
    val sb = new java.lang.StringBuilder(64)
    while (k < nShingles) {
      sb.setLength(0)
      var j = k
      val end = math.min(k + n, size)
      while (j < end) {
        if (j > k) sb.append(' ')
        sb.append(tokens(j))
        j += 1
      }
      distinct.add(sb.toString)
      k += 1
    }

    val out = new Array[Long](distinct.size())
    val it = distinct.iterator()
    var o = 0
    while (it.hasNext) {
      out(o) = XXH64.hashUTF8String(UTF8String.fromString(it.next()), Seed)
      o += 1
    }
    new GenericArrayData(out)
  }
}
