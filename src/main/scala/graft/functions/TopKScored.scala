package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, Encoders}

/** One (score, id) candidate row for [[TopKScoredAggregator]]. */
case class Scored(score: Double, id: Long)

/** Exact per-group top-k of (score, id) pairs — score descending, id
  * ascending tie-break — as a typed Aggregator with a k-BOUNDED buffer.
  *
  * This is the ranking shape that survives a 100× corpus: as a partial
  * aggregate, every map task keeps at most k candidates per group and
  * ships ONLY those to the final aggregation — unlike a row_number
  * window partitioned by the group key, which shuffles every scored
  * candidate row into |groups| reducers and sorts there. For a kNN
  * ranking (|groups| = |queries|, candidates = |corpus|×|queries|) the
  * window funnels the whole scored corpus through a handful of
  * reducers; this aggregator moves k×|partitions| rows per group.
  *
  * `reduce` is an O(k) insertion into a sorted vector, `merge` a
  * bounded merge — same contract as [[TopKAggregator]], with the id
  * carried so the caller can unpack (rank, id, score) via posexplode.
  */
case class TopKScoredAggregator(k: Int)
  extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  require(k >= 1, s"k must be >= 1, got $k")

  // rank order: higher score first, then smaller id (ties on both are
  // impossible for distinct ids). Score comparison is
  // java.lang.Double.compare DESCENDING — NaN ranks FIRST, exactly like
  // the `row_number().over(orderBy(desc))` window this aggregator
  // replaces (Spark orders NaN greater than any value). The negate-and-
  // sort-ascending form (`Ordering.by(-score)`) would rank NaN last,
  // silently demoting zero-norm vectors (cosine 0/0 = NaN) relative to
  // the window/oracle semantics.
  @transient private lazy val ord: Ordering[Scored] = new Ordering[Scored] {
    def compare(a: Scored, b: Scored): Int = {
      val c = java.lang.Double.compare(b.score, a.score)
      if (c != 0) c else java.lang.Long.compare(a.id, b.id)
    }
  }

  override def zero: Seq[Scored] = Vector.empty

  override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] =
    if (b.length >= k && !ord.lt(a, b.last)) b
    else {
      val i = b.indexWhere(x => ord.lt(a, x)) match {
        case -1 => b.length
        case x  => x
      }
      ((b.take(i) :+ a) ++ b.drop(i)).take(k)
    }

  override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] =
    (x ++ y).sorted(ord).take(k)

  override def finish(r: Seq[Scored]): Seq[Scored] = r

  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
}

object TopKScoredAggregator {
  /** Untyped column form: `fn(scoreCol, idCol)` →
    * array&lt;struct&lt;score,id&gt;&gt; of the group's top k.
    */
  def topKScored(k: Int): (Column, Column) => Column = {
    val fn = org.apache.spark.sql.functions.udaf(
      TopKScoredAggregator(k), Encoders.product[Scored])
    (score, id) => fn(score, id)
  }
}
