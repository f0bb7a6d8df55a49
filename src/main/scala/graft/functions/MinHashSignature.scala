package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: k-function MinHash signature of a
  * document's token n-gram shingles, fully fused — tokenize, shingle,
  * hash, and track the k minima in one pass, with no intermediate
  * arrays at all (the shingle SET is never materialized; min over the
  * multiset equals min over the set).
  *
  * Hash family is identical to
  * `Dedup.minhashSignatureFromHashes(ShingleHashes(text, n), k)`:
  * shingle hash h = seed-42 XXH64 of the space-joined lowercase
  * shingle; draw i = xxhash64(h, i) = hashInt(i, hashLong(h, 42)) —
  * Spark's multi-arg XxHash64 fold. The spec pins that equality.
  */
case class MinHashSignature(child: Expression, n: Int, k: Int)
  extends UnaryExpression {

  require(n >= 1 && k >= 1, s"need n >= 1 and k >= 1, got n=$n k=$k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires a STRING input, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"
  override def foldable: Boolean = child.foldable

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSignature.compute($c, $n, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {

  def apply(text: Column, n: Int, k: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(text), n, k))

  private val Seed = 42L
  private val SplitPattern = java.util.regex.Pattern.compile("\\s+")

  def compute(text: UTF8String, n: Int, k: Int): ArrayData = {
    val tokens = SplitPattern.split(text.toLowerCase.toString, -1)
    val size = tokens.length
    // fewer than n tokens → zero shingles (matches the guarded
    // TextOps.shinglesFromTokens); the signature stays all
    // Long.MaxValue — the min-over-empty-set identity, same as the
    // coalesce in Dedup.minhashSignatureFromHashes
    val nShingles = math.max(size - n + 1, 0)
    val mins = Array.fill(k)(Long.MaxValue)
    val sb = new java.lang.StringBuilder(64)
    var s = 0
    while (s < nShingles) {
      sb.setLength(0)
      var j = s
      val end = math.min(s + n, size)
      while (j < end) {
        if (j > s) sb.append(' ')
        sb.append(tokens(j))
        j += 1
      }
      val h = XXH64.hashUTF8String(UTF8String.fromString(sb.toString), Seed)
      val base = XXH64.hashLong(h, Seed)
      var i = 0
      while (i < k) {
        val m = XXH64.hashInt(i, base)
        if (m < mins(i)) mins(i) = m
        i += 1
      }
      s += 1
    }
    new GenericArrayData(mins)
  }
}
