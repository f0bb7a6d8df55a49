package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

import graft.functions.MisraGriesAggregator

/** Pins the Misra–Gries contract heavyHitters relies on: every item
  * with true frequency > N/(capacity+1) survives ANY split of the
  * stream into partial buffers and ANY merge order — the property that
  * makes the candidate pass sound under Spark's partial aggregation.
  */
class MisraGriesSpec extends AnyFunSuite {

  private def runPartitioned(agg: MisraGriesAggregator,
                             stream: Seq[String], splits: Int,
                             rnd: Random): Seq[String] = {
    val parts = stream.grouped(math.max(1, stream.length / splits)).toSeq
    val buffers = parts.map(_.foldLeft(agg.zero)(agg.reduce))
    val merged = rnd.shuffle(buffers).reduce(agg.merge)
    agg.finish(merged)
  }

  test("over-threshold items survive every partitioning and merge order") {
    val rnd = new Random(7)
    for (trial <- 0 until 20) {
      val capacity = 1 + rnd.nextInt(8)
      // skewed stream: a few heavy items over a long uniform tail of
      // distinct items (the adversarial case: tail >> capacity)
      val heavy = (0 until 3).flatMap(h =>
        Seq.fill(30 + rnd.nextInt(40))(s"heavy$h"))
      val tail = (0 until 150).map(i => s"tail${trial}_$i")
      val stream = rnd.shuffle(heavy ++ tail)
      val n = stream.length
      val threshold = n.toDouble / (capacity + 1)
      val trueHeavy = stream.groupBy(identity).collect {
        case (k, v) if v.length > threshold => k
      }.toSet

      val agg = MisraGriesAggregator(capacity)
      for (splits <- Seq(1, 2, 7, 32)) {
        val cands = runPartitioned(agg, stream, splits, rnd).toSet
        assert(trueHeavy.subsetOf(cands),
          s"capacity=$capacity splits=$splits missed " +
            s"${trueHeavy.diff(cands)} (n=$n)")
        assert(cands.size <= capacity,
          s"summary exceeded capacity: ${cands.size} > $capacity")
      }
    }
  }

  test("nulls are skipped, not counted") {
    val agg = MisraGriesAggregator(2)
    val buf = Seq("a", null, "a", null, "b")
      .foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(buf) === Seq("a", "b"))
    assert(buf("a") === 2L)
  }
}

class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  test("heavyHitters == full groupBy HAVING, counts exact, state bounded") {
    val rnd = new Random(11)
    // 400 distinct tail items + 4 heavy ones, capacity 10 << distinct
    val rows = rnd.shuffle(
      (0 until 4).flatMap(h => Seq.fill(200)(s"hot$h")) ++
        (0 until 400).map(i => s"cold$i"))
    val df = rows.toDF("item").repartition(13)
    val hh = graft.ext.TextOps.heavyHitters(df, "item", capacity = 10)
      .as[(String, Long)].collect().sortBy(_._1)
    val n = rows.length
    val exact = rows.groupBy(identity).toSeq
      .collect { case (k, v) if v.length * 11 > n => (k, v.length.toLong) }
      .sortBy(_._1)
    assert(hh.toSeq === exact)
    assert(hh.map(_._1).toSeq === Seq("hot0", "hot1", "hot2", "hot3"))
  }
}
