package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: dot product of two float/double array
  * columns in double precision, summed left-to-right — bit-identical to
  * the column-algebra `aggregate(zip_with(a, b, _*_), 0.0, _+_)` (the
  * spec pins it), but one codegen'd loop instead of two interpreted
  * higher-order functions per pair. This is the inner loop of every
  * similarity operator (kNN, LSH verify, IVF), where it runs once per
  * CANDIDATE PAIR, not per row.
  */
case class VectorDot(left: Expression, right: Expression)
  extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vector_dot requires ARRAY<FLOAT|DOUBLE> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"
  override def foldable: Boolean = left.foldable && right.foldable

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorDot.compute(a.asInstanceOf[ArrayData], isFloat(left),
      b.asInstanceOf[ArrayData], isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorDot.compute($a, ${isFloat(left)}, $b, ${isFloat(right)})")

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
  : VectorDot = copy(left = l, right = r)
}

object VectorDot {

  def apply(a: Column, b: Column): Column =
    Bridge.column(VectorDot(Bridge.expression(a), Bridge.expression(b)))

  /** Left-to-right double summation, matching zip_with+aggregate order
    * (zip_with pads the shorter array with null → those terms are null
    * and aggregate's `acc + null` nulls the result; here mismatched
    * lengths only multiply the common prefix, which our callers never
    * hit — all embeddings share one dimensionality).
    */
  def compute(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean)
  : Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }
}
