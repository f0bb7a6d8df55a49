package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, Encoders}

/** Misra–Gries frequent-items summary as a typed Aggregator with a
  * CAPACITY-BOUNDED buffer — the mergeable-summaries formulation
  * (Agarwal et al., "Mergeable Summaries", PODS'12): any item whose true
  * frequency exceeds N/(capacity+1) is guaranteed present in the final
  * summary, under ANY partitioning and merge order of the input.
  *
  * This is the first pass of exact heavy-hitter detection at 100 TB:
  * a full groupBy-count materializes one row per DISTINCT item (unusable
  * for open vocabularies); the MG summary keeps at most `capacity`
  * counters per partial buffer, ships only those, and its candidate set
  * is then recounted EXACTLY with one semi-joined aggregation
  * ([[graft.ext.TextOps.heavyHitters]]) — so approximation affects only
  * candidate generation, never the reported counts.
  *
  * reduce: resident item → increment; free slot → insert; full → the MG
  * step, decrement all counters and drop zeros (amortized O(1) per
  * input: each decrement pays back an earlier increment). merge: sum
  * counts, then if over capacity subtract the (capacity+1)-th largest
  * count and drop non-positives — the summary-space analogue of the
  * decrement step.
  */
case class MisraGriesAggregator(capacity: Int)
  extends Aggregator[String, Map[String, Long], Seq[String]] {

  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
    if (a == null) b
    else b.get(a) match {
      case Some(c) => b.updated(a, c + 1L)
      case None if b.size < capacity => b.updated(a, 1L)
      case None =>
        b.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap
    }

  override def merge(x: Map[String, Long], y: Map[String, Long])
  : Map[String, Long] = {
    val sum = y.foldLeft(x) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + v)
    }
    if (sum.size <= capacity) sum
    else {
      val cut = sum.valuesIterator.toSeq.sorted(Ordering[Long].reverse)
        .apply(capacity) // (capacity+1)-th largest
      sum.view.mapValues(_ - cut).filter(_._2 > 0L).toMap
    }
  }

  /** Sorted for determinism; estimated counts are NOT exposed — callers
    * must recount exactly (the estimates carry up to N/(capacity+1)
    * undercount and would be partitioning-dependent).
    */
  override def finish(r: Map[String, Long]): Seq[String] =
    r.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder()
}

object MisraGriesAggregator {
  /** Untyped column form: `fn(itemCol)` → array&lt;string&gt; candidate
    * items (every item with frequency &gt; N/(capacity+1) is included).
    */
  def frequentItems(capacity: Int): Column => Column = {
    val fn = org.apache.spark.sql.functions.udaf(
      MisraGriesAggregator(capacity), Encoders.STRING)
    item => fn(item)
  }
}
