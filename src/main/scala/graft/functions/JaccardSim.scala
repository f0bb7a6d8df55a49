package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: Jaccard similarity of two LONG-array
  * columns treated as sets — |A ∩ B| / |A ∪ B|, with
  * |A ∪ B| = |A| + |B| − |A ∩ B|.
  *
  * Semantically identical to the column algebra
  * `size(array_intersect(a,b)) / size(array_union(a,b))` on
  * duplicate-free inputs (JaccardSimSpec pins the equality) — but one
  * generated hash-probe loop per pair instead of two built-ins that each
  * MATERIALIZE an intermediate array. This runs once per CANDIDATE PAIR
  * in the MinHash verification join (`Dedup.minhashNearDups`), the
  * hottest dedup stage once banding has done its job: at 100 TB the
  * candidate count is huge even when bucket-local, and allocating two
  * scratch arrays per pair is pure GC pressure.
  *
  * Inputs are [[ShingleHashes]] outputs, which are `array_distinct`'d by
  * construction; duplicates in the input would count once here (set
  * semantics), same as the array_intersect/union form.
  *
  * One DELIBERATE divergence from the algebra: two empty inputs yield
  * 0.0 here, where `size(...)/size(...)` is a 0/0 division — NULL under
  * non-ANSI SQL, a DIVIDE_BY_ZERO error under this project's ANSI
  * sessions. The native form stays total (a primitive double keeps the
  * null-safe codegen fast path), and the only consumer — a
  * `>= threshold` filter — treats 0.0 and NULL alike. JaccardSimSpec
  * pins this edge explicitly; the bit-equality property holds for all
  * non-empty inputs.
  */
case class JaccardSim(left: Expression, right: Expression)
  extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaccard_sim requires ARRAY<BIGINT> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sim"
  override def foldable: Boolean = left.foldable && right.foldable

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaccardSim.compute($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
  : JaccardSim = copy(left = l, right = r)
}

object JaccardSim {

  def apply(a: Column, b: Column): Column =
    Bridge.column(JaccardSim(Bridge.expression(a), Bridge.expression(b)))

  /** Open-addressing probe of the smaller side against a linear-probed
    * hash table of the larger side — no boxing, no scratch arrays.
    * Duplicate elements are counted once (set semantics).
    */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val (small, large) =
      if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val ns = small.numElements()
    val nl = large.numElements()
    if (ns == 0 && nl == 0) return 0.0
    // table sized to the next power of two >= 2*ns, linear probing;
    // EMPTY sentinel handled via a separate "contains zero" flag
    var cap = 4
    while (cap < ns * 2) cap <<= 1
    val mask = cap - 1
    val table = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    var smallDistinct = 0
    var hasMatchedZero = false // dedup handled by table; zero needs a flag
    var containsZero = false
    var i = 0
    while (i < ns) {
      val v = small.getLong(i)
      if (v == 0L) {
        if (!containsZero) { containsZero = true; smallDistinct += 1 }
      } else {
        var idx = (scala.util.hashing.byteswap64(v) & mask).toInt
        var done = false
        while (!done) {
          if (!used(idx)) {
            used(idx) = true; table(idx) = v; smallDistinct += 1; done = true
          } else if (table(idx) == v) done = true
          else idx = (idx + 1) & mask
        }
      }
      i += 1
    }
    var inter = 0
    var largeDistinct = 0
    // count large-side distinct via a second table only if needed —
    // instead, mark matched small entries and count large distinct with
    // its own table-free pass is impossible; use a second table
    val seenL = new Array[Long](math.max(4, Integer.highestOneBit(nl * 2 - 1) << 1))
    val usedL = new Array[Boolean](seenL.length)
    val maskL = seenL.length - 1
    var containsZeroL = false
    i = 0
    while (i < nl) {
      val v = large.getLong(i)
      var isNew = false
      if (v == 0L) {
        if (!containsZeroL) { containsZeroL = true; isNew = true }
      } else {
        var idx = (scala.util.hashing.byteswap64(v) & maskL).toInt
        var done = false
        while (!done) {
          if (!usedL(idx)) {
            usedL(idx) = true; seenL(idx) = v; isNew = true; done = true
          } else if (seenL(idx) == v) done = true
          else idx = (idx + 1) & maskL
        }
      }
      if (isNew) {
        largeDistinct += 1
        if (v == 0L) {
          if (containsZero && !hasMatchedZero) { hasMatchedZero = true; inter += 1 }
        } else {
          var idx = (scala.util.hashing.byteswap64(v) & mask).toInt
          var done = false
          while (!done) {
            if (!used(idx)) done = true
            else if (table(idx) == v) { inter += 1; done = true }
            else idx = (idx + 1) & mask
          }
        }
      }
      i += 1
    }
    val union = smallDistinct + largeDistinct - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
}
