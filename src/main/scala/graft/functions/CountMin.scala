package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min sketch of a long key column as a mergeable typed
  * Aggregator — the frequency twin of the HLL distinct sketch (q93)
  * and the Misra–Gries candidate set (q71): fixed `depth × width`
  * counter grid per partial buffer, element-wise-summed on merge, so a
  * 100 TB key stream ships kilobytes per partition and the estimate
  * `est(k)` satisfies `true ≤ est ≤ true + eps·N` with probability
  * `confidence` under ANY partitioning and merge order.
  *
  * The buffer is Spark's own `util.sketch.CountMinSketch` held as a
  * live object (Kryo-encoded only at partial-shuffle boundaries —
  * same pattern as [[MisraGriesAggregator]]'s map buffer); `finish`
  * serializes to bytes so the result is a column value a downstream
  * estimate UDF or a persisted sketch store can consume.
  *
  * Where [[MisraGriesAggregator]] answers "WHICH keys are frequent"
  * (candidates, exact recount), the CMS answers "how frequent is THIS
  * key" for any ad-hoc key without a second pass — the two compose:
  * MG proposes, CMS (or the exact recount) scores.
  */
case class CountMinAggregator(eps: Double, confidence: Double, seed: Int)
  extends Aggregator[java.lang.Long, CountMinSketch, Array[Byte]] {

  require(eps > 0 && eps < 1, s"eps in (0,1), got $eps")
  require(confidence > 0 && confidence < 1,
    s"confidence in (0,1), got $confidence")

  override def zero: CountMinSketch =
    CountMinSketch.create(eps, confidence, seed)

  override def reduce(b: CountMinSketch, a: java.lang.Long)
  : CountMinSketch = {
    if (a != null) b.addLong(a)
    b
  }

  override def merge(x: CountMinSketch, y: CountMinSketch)
  : CountMinSketch = x.mergeInPlace(y)

  override def finish(b: CountMinSketch): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    b.writeTo(out)
    out.toByteArray
  }

  override def bufferEncoder: Encoder[CountMinSketch] =
    Encoders.kryo[CountMinSketch]

  override def outputEncoder: Encoder[Array[Byte]] =
    ExpressionEncoder[Array[Byte]]()
}

object CountMinAggregator {
  /** Column form: aggregates the long column to a serialized sketch. */
  def cms(eps: Double, confidence: Double, seed: Int)(key: Column)
  : Column = {
    val fn = org.apache.spark.sql.functions.udaf(
      CountMinAggregator(eps, confidence, seed),
      ExpressionEncoder[java.lang.Long]())
    fn(key)
  }

  /** Point estimate from a serialized sketch (tiny-frame use: the
    * sketch column is one row per group by construction).
    */
  def estimate(sketch: Array[Byte], key: Long): Long =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(sketch))
      .estimateCount(key)
}
