package graft

import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** The `maxBucketRows` occupancy cap in a TRUNCATING regime (VERDICT
  * r15 #2). Every other spec either runs the shipped path where
  * adaptive planes keep occupancy ≈ 128 (cap idle at 4096) or switches
  * the cap OFF for legacy controls — the degenerate-bucket last resort
  * was itself unverified. Fixtures here COLLAPSE buckets on purpose
  * (scaled copies of one direction share every sign bit exactly), so
  * the cap measurably engages and its three documented properties are
  * pinned:
  *   1. pair budget ≤ Σ_buckets C(min(occ, cap), 2) — with
  *      threshold = −1 every candidate survives the cosine filter, so
  *      the bound is an EQUALITY and the output pair set is exactly
  *      "all pairs among each bucket's cap smallest ids";
  *   2. deterministic across partitionings (row_number ordered by id);
  *   3. conservative compose with bands > 1 — a pair truncated out of
  *      its FIRST agreeing band is dropped, never rescued by a later
  *      agreeing band and never duplicated (built via signature
  *      probing: fillers share the pair's band-0 bucket but not its
  *      band-1 bucket, and out-rank it by id).
  * The [[Similarity.lshBucketStats]] observability companion (ADVICE
  * r15) is exercised against the same fixtures.
  */
class LshOccupancyCapSpec extends SparkTestBase {
  import spark.implicits._

  private val cap = 4
  private val planes = 3

  /** Two bucket-degenerate clusters: positive scalings of one
    * direction share every signature bit exactly, so each cluster is
    * ONE bucket per band regardless of the plane hash. Ids are
    * deliberately interleaved/unsorted so survivor selection by id
    * rank is observable.
    */
  private def degenerate() = {
    val u = Seq(1f, 0.5f, -0.25f, 0.125f)
    val v = Seq(-0.7f, 0.3f, 0.9f, -0.2f)
    val a = Seq(14, 3, 9, 1, 12, 7, 5, 11, 2, 8, 13, 4, 6, 10)
      .map(i => (i, u.map(_ * (1f + 0.01f * i))))
    val b = Seq(27, 21, 25, 29, 23, 26, 22, 28, 24)
      .map(i => (i, v.map(_ * (1f + 0.01f * i))))
    (a ++ b).toDF("vec_id", "embedding")
  }

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Int, Int)] =
    df.select($"id_a".cast("int"), $"id_b".cast("int"))
      .as[(Int, Int)].collect().toSet

  test("engaged cap truncates to exactly all pairs among each bucket's " +
    "cap smallest ids, and the bucket-stats companion reports it") {
    val df = degenerate()
    // per-id bucket under the SAME parameterization the operator uses
    val idBucket = df.select($"vec_id".cast("int").as("id"),
        Similarity.signLshSignature($"embedding", planes, 0).as("bucket"))
      .as[(Int, Long)].collect().toSeq
    val byBucket = idBucket.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    assert(byBucket.values.exists(_.size > cap),
      s"fixture drift: no bucket exceeds the cap ($byBucket)")
    val expected = byBucket.values.flatMap { ids =>
      val survivors = ids.sorted.take(cap)
      for (x <- survivors; y <- survivors if x < y) yield (x, y)
    }.toSet

    val out = Similarity.lshNearNeighbors(df, threshold = -1.0,
      planes = planes, targetBucketRows = 0, maxBucketRows = cap)
    assert(pairsOf(out) === expected,
      "capped output is not exactly the all-pairs of each bucket's " +
        "cap smallest ids")
    // budget bound as an equality at threshold = -1
    val bound = byBucket.values
      .map(ids => { val m = math.min(ids.size, cap); m * (m - 1) / 2 })
      .sum
    assert(out.count() === bound.toLong)
    // uncapped run is a strict superset (the cap only removes pairs)
    val uncapped = pairsOf(Similarity.lshNearNeighbors(df,
      threshold = -1.0, planes = planes, targetBucketRows = 0,
      maxBucketRows = 0))
    assert(expected.subsetOf(uncapped) && uncapped.size > expected.size)

    // observability: the stats companion reports the engaged buckets'
    // TRUE occupancy (> cap), under the same parameterization
    val stats = Similarity.lshBucketStats(df, planes = planes,
        targetBucketRows = 0)
      .select($"bucket", $"occupancy").as[(Long, Long)].collect().toMap
    byBucket.foreach { case (bucket, ids) =>
      assert(stats(bucket) === ids.size.toLong)
    }
    assert(stats.values.count(_ > cap) ===
      byBucket.values.count(_.size > cap))
  }

  test("capped output is deterministic across input partitionings") {
    val df = degenerate()
    val runs = Seq(df, df.repartition(7), df.repartition(1),
      df.repartition(5, $"vec_id"), df.orderBy($"embedding"(1)))
      .map(d => Similarity.lshNearNeighbors(d, threshold = -1.0,
        planes = planes, targetBucketRows = 0, maxBucketRows = cap))
      .map(pairsOf)
    assert(runs.distinct.size === 1,
      "survivor set varies with partitioning — the row_number order " +
        "is not total")
  }

  test("bands > 1: a pair truncated from its first agreeing band is " +
    "dropped, never rescued by a later band, never duplicated") {
    // signature-probed asymmetric fixture: anchor pair (a, b) agrees in
    // BOTH bands; fillers share the pair's band-0 bucket but not its
    // band-1 bucket and out-rank it by id. Band 0 truncates (a, b) out;
    // band 1 holds only {a, b} (≤ cap) so the candidate forms there —
    // and must be dropped by the first-agreeing-band filter.
    val bandPlanes = 2
    val rnd = new scala.util.Random(42)
    val poolLocal = (0 until 400).map { i =>
      (i, Seq.fill(4)(rnd.nextFloat() * 2f - 1f))
    }
    val pool = poolLocal.toDF("vec_id", "embedding")
    val sigs = pool.select($"vec_id".cast("int").as("id"),
        Similarity.signLshSignature($"embedding", bandPlanes, 0).as("b0"),
        Similarity.signLshSignature($"embedding", bandPlanes, bandPlanes)
          .as("b1"))
      .as[(Int, Long, Long)].collect().toSeq
    val byId = sigs.map(s => s._1 -> s).toMap
    // anchor pair: the first (b0, b1) combo holding ≥ 2 vectors
    val anchor = sigs.groupBy(s => (s._2, s._3)).values
      .find(_.size >= 2).getOrElse(fail("no same-(b0,b1) pair in pool"))
    val Seq(a, b) = anchor.take(2).map(_._1).toSeq
    val (b0A, b1A) = (byId(a)._2, byId(a)._3)
    val fillers = sigs
      .filter(s => s._2 == b0A && s._3 != b1A && s._1 != a && s._1 != b)
      .take(6).map(_._1)
    assert(fillers.size === 6, "fixture drift: not enough fillers " +
      "sharing band-0 bucket but not band-1 bucket")
    // reassign ids: fillers 1..6 (out-rank the pair), anchor 100, 101
    val remap = (fillers.zipWithIndex.map { case (id, i) => id -> (i + 1) }
      ++ Seq(a -> 100, b -> 101)).toMap
    val fixture = poolLocal.collect {
      case (i, vec) if remap.contains(i) => (remap(i), vec)
    }.toDF("vec_id", "embedding")

    def run(capRows: Int) = Similarity.lshNearNeighbors(fixture,
      threshold = -1.0, planes = bandPlanes, bands = 2,
      targetBucketRows = 0, maxBucketRows = capRows)

    val capped = run(6)
    val cappedPairs = capped.select($"id_a".cast("int"),
      $"id_b".cast("int")).as[(Int, Int)].collect().toSeq
    assert(!cappedPairs.contains((100, 101)),
      "pair truncated from its first agreeing band was RESCUED by a " +
        "later agreeing band — the conservative compose is broken")
    assert(cappedPairs.size === cappedPairs.distinct.size,
      "capped output duplicates a pair")
    // sanity: without the cap the same pair IS found, exactly once
    val uncapped = run(0).select($"id_a".cast("int"),
      $"id_b".cast("int")).as[(Int, Int)].collect().toSeq
    assert(uncapped.count(_ == ((100, 101))) === 1,
      "fixture drift: anchor pair not found (or duplicated) uncapped")
  }
}
