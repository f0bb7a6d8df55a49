package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, Encoders}

/** Exact top-k values per group as a typed Aggregator (SURVEY.md §2.11:
  * the reference has no UDAF surface; this is the extension pattern for
  * metrics the built-in aggregates can't express).
  *
  * The buffer is a k-bounded descending-sorted vector: `reduce` inserts
  * in O(k), `merge` is a bounded merge — so the aggregate is map-side
  * partial like any built-in (each partition ships at most k values to
  * the final aggregation, never the group's row set).
  */
case class TopKAggregator(k: Int)
  extends Aggregator[Double, Seq[Double], Seq[Double]] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def zero: Seq[Double] = Vector.empty

  override def reduce(b: Seq[Double], a: Double): Seq[Double] =
    if (b.length >= k && a <= b.last) b
    else {
      val i = b.indexWhere(_ < a) match { case -1 => b.length; case x => x }
      (b.take(i) :+ a) ++ b.drop(i).take(k - i - 1)
    }

  override def merge(x: Seq[Double], y: Seq[Double]): Seq[Double] =
    (x ++ y).sorted(Ordering[Double].reverse).take(k)

  override def finish(r: Seq[Double]): Seq[Double] = r

  override def bufferEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
}

object TopKAggregator {
  /** Untyped column form for DataFrame.agg. */
  def topK(k: Int): Column => Column = {
    val fn = org.apache.spark.sql.functions.udaf(TopKAggregator(k), Encoders.scalaDouble)
    c => fn(c)
  }
}
