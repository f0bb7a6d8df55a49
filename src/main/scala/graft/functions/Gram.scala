package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, Encoders}

/** Gram / second-moment matrix (Xᵀ X) of an embedding column as ONE
  * mergeable typed Aggregator pass — the covariance/PCA-whitening prep
  * step of an embedding pipeline (subtract n·μμᵀ for covariance; both
  * derive from this sum).
  *
  * Why an Aggregator and not SQL: the declarative formulation is a
  * double explode to n·d² (row, i, j) rows before the aggregate — at
  * d = 64 that is a 4096× row blow-up of a 100 TB corpus just to feed
  * partial sums. This buffer accumulates the d×d products IN PLACE per
  * partition (d² doubles ≈ 32 KB at d = 64), ships one buffer per
  * partition, and merges by element-wise add — the input is read once
  * and nothing scales with n except the scan itself. Only the upper
  * triangle is accumulated (the matrix is symmetric); the flat buffer
  * keeps i ≤ j at index i·d + j.
  *
  * Vectors that are null or of the wrong length are skipped (same
  * contract as the cosine/kNN ops in [[graft.ext.Similarity]]).
  */
case class GramAggregator(dim: Int)
  extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {

  require(dim >= 1, s"dim must be >= 1, got $dim")

  override def zero: Array[Double] = new Array[Double](dim * dim)

  override def reduce(b: Array[Double], v: Seq[Double]): Array[Double] = {
    if (v != null && v.length == dim) {
      val arr = v.toArray
      var i = 0
      while (i < dim) {
        val xi = arr(i)
        val row = i * dim
        var j = i
        while (j < dim) {
          b(row + j) += xi * arr(j)
          j += 1
        }
        i += 1
      }
    }
    b
  }

  override def merge(x: Array[Double], y: Array[Double]): Array[Double] = {
    var k = 0
    while (k < x.length) { x(k) += y(k); k += 1 }
    x
  }

  override def finish(b: Array[Double]): Seq[Double] =
    b.toIndexedSeq

  override def bufferEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()

  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}

object GramAggregator {
  /** Column form: `gram(dim)(vecCol)` aggregates to the flat row-major
    * upper-triangle d² array.
    */
  def gram(dim: Int)(vec: Column): Column = {
    val fn = org.apache.spark.sql.functions.udaf(
      GramAggregator(dim), ExpressionEncoder[Seq[Double]]())
    fn(vec)
  }
}
