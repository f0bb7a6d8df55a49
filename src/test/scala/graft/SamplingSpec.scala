package graft

import org.apache.spark.sql.functions._
import graft.ext.Sampling

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus(n: Int) =
    (0 until n).map(i => (i.toLong, s"grp${i % 4}")).toDF("id", "grp")

  test("groupSample: k rows per group, partition-layout independent") {
    val df = corpus(400)
    val s1 = Sampling.groupSample(df, 5, Seq("grp"), "id")
      .select($"grp", $"id", $"rank").as[(String, Long, Long)]
      .collect().sortBy(r => (r._1, r._3))
    assert(s1.groupBy(_._1).forall(_._2.length == 5))
    // the sample is a pure function of the data: reshuffling the input
    // across partitions must not change which rows are picked (the
    // property DataFrame.sample's per-partition RNG streams lack)
    val s2 = Sampling.groupSample(df.repartition(17, $"id"), 5,
        Seq("grp"), "id")
      .select($"grp", $"id", $"rank").as[(String, Long, Long)]
      .collect().sortBy(r => (r._1, r._3))
    assert(s1.toSeq === s2.toSeq)
  }

  test("groupSample: different seeds draw different samples") {
    val df = corpus(400)
    def ids(seed: Long) =
      Sampling.groupSample(df, 5, Seq("grp"), "id", seed = seed)
        .select($"id").as[Long].collect().toSet
    assert(ids(42L) !== ids(7L))
  }

  test("groupSample matches the sort-by-hash formulation exactly") {
    val df = corpus(200)
    val agg = Sampling.groupSample(df, 3, Seq("grp"), "id")
      .select($"grp", $"id").as[(String, Long)].collect().toSet
    // oracle shape: global sort by the same hash within each group
    val byHash = df
      .withColumn("_h", Sampling.hashScore($"id", 42L))
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"grp").orderBy($"_h", $"id")))
      .filter($"_rn" <= 3)
      .select($"grp", $"id").as[(String, Long)].collect().toSet
    assert(agg === byHash)
  }

  test("assignSplits: exhaustive, proportional, stable under repartition") {
    val df = (0 until 4000).map(_.toLong).toDF("id")
    val splits = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val counts = Sampling.assignSplits(df, "id", splits)
      .groupBy($"split").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    // every row lands in exactly one split, proportions within ~3σ
    assert(counts.values.sum === 4000L)
    assert(math.abs(counts("train") - 3200L) < 120, s"train: $counts")
    assert(math.abs(counts("val") - 400L) < 80, s"val: $counts")
    assert(math.abs(counts("test") - 400L) < 80, s"test: $counts")
    // the assignment is a pure function of the id — identical after a
    // repartition (what keeps eval membership frozen as the corpus grows)
    def asg(d: org.apache.spark.sql.DataFrame) =
      Sampling.assignSplits(d, "id", splits)
        .select($"id", $"split").as[(Long, String)].collect().toMap
    assert(asg(df) === asg(df.repartition(13, $"id")))
  }

  test("assignSplits rejects fractions that do not sum to 1") {
    val df = Seq(1L).toDF("id")
    intercept[IllegalArgumentException] {
      Sampling.assignSplits(df, "id", Seq(("a", 0.5), ("b", 0.4)))
    }
  }

  test("weightedMix: rates honored within tolerance, deterministic") {
    val df = (0 until 4000).map(i => (i.toLong, s"src${i % 4}"))
      .toDF("id", "src")
    val kept = Sampling.weightedMix(df, "src",
        rates = Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.0),
        defaultRate = 0.25, idCol = "id")
      .groupBy($"src").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(kept("src0") === 1000L)            // rate 1.0 keeps everything
    assert(!kept.contains("src2"))            // rate 0.0 keeps nothing
    assert(math.abs(kept("src1") - 500L) < 100, s"src1: ${kept("src1")}")
    assert(math.abs(kept("src3") - 250L) < 75, s"src3: ${kept("src3")}")
    // determinism: the kept id set is identical across re-runs
    def keptIds() = Sampling.weightedMix(df.repartition(13), "src",
        rates = Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.0),
        defaultRate = 0.25, idCol = "id")
      .select($"id").as[Long].collect().toSet
    assert(keptIds() === keptIds())
  }

  test("weightedGroupSample: weight dominance, w<=0 excluded, " +
    "repartition-stable") {
    val df = ((0 until 200).map(i => (i.toLong, "g", 0.001)) ++
      Seq((900L, "g", 1e9), (901L, "g", 0.0), (902L, "g", -5.0)))
      .toDF("id", "grp", "w")
    def sample(d: org.apache.spark.sql.DataFrame) =
      Sampling.weightedGroupSample(d, k = 3, Seq("grp"), "id", $"w", 42L)
        .select($"id", $"rank").as[(Long, Long)].collect().toMap
    val got = sample(df)
    // ln(u)/1e9 ≈ 0 beats ln(u)/0.001 by ~12 orders of magnitude: the
    // heavy row must rank first
    assert(got(900L) === 1L)
    // zero/negative weights can never be sampled
    assert(!got.contains(901L) && !got.contains(902L))
    assert(got.size === 3)
    // pure function of (data, seed): identical after repartition
    assert(sample(df.repartition(7, $"id")) === got)
  }

  test("temperatureMix: sqrt-flattened rates, hand-computed, repartition-stable") {
    // source A: 100 docs × 100 = 10000; source B: 10 docs × 10 = 100.
    // isqrt → 100 vs 10, so B's share collapses only 10×, not 100×
    val df = ((0L until 100L).map(i => (i, "A", 100L)) ++
      (100L until 110L).map(i => (i, "B", 10L)))
      .toDF("doc_id", "source", "w")
    val out = Sampling.temperatureMix(df, "source", "doc_id", $"w",
      budget = 1000.0, seed = 42L)
    val rates = out.select($"source", $"rate").distinct()
      .as[(String, Double)].collect().toMap
    // rate_A = min(1, 1000·100/110/10000), rate_B = min(1, 1000·10/110/100)
    assert(math.abs(rates.getOrElse("A", 0.0) - 1000.0 * 100 / 110 / 10000) < 1e-12)
    assert(math.abs(rates.getOrElse("B", 0.0) - 1000.0 * 10 / 110 / 100) < 1e-12)
    // flattening: B survives at 10× A's rate despite 100× less mass
    assert(rates("B") > 9 * rates("A"))
    // deterministic: identical kept set after repartitioning
    val ids = out.select($"doc_id").as[Long].collect().sorted.toSeq
    val ids2 = Sampling.temperatureMix(df.repartition(7, $"doc_id"),
        "source", "doc_id", $"w", budget = 1000.0, seed = 42L)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(ids === ids2 && ids.nonEmpty)
  }

  test("negativeSamples: disjoint from positives, deterministic, k-capped") {
    // user 1 holds items 0..7 of a 10-item domain (dense: oversample
    // can run dry); user 2 holds only item 0
    val pos = (0L to 7L).map(i => (1L, i)) :+ (2L, 0L)
    val df = pos.toDF("user_id", "item_id")
    val got = Sampling.negativeSamples(df, "user_id", "item_id",
      nItems = 10, k = 3, oversample = 3)
    val byUser = got.as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).toSeq).toMap
    val posSet = pos.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for ((u, rows) <- byUser; (_, item, _) <- rows)
      assert(!posSet(u).contains(item), s"user $u drew a positive $item")
    // ranks are 1..n with no gaps; never more than k
    for ((_, rows) <- byUser)
      assert(rows.map(_._3) === (1L to rows.size).toSeq && rows.size <= 3)
    // user 2 has 9 free items and 9 draws → full k
    assert(byUser(2L).size === 3)
    // rerun is bit-identical (hash-deterministic, no rand())
    val again = Sampling.negativeSamples(df, "user_id", "item_id",
      nItems = 10, k = 3, oversample = 3)
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._3)).toSeq
    assert(again === byUser.toSeq.sortBy(_._1).flatMap(_._2))
  }

  test("poissonWeight: inverse-CDF ladder buckets and Poisson(1) mean") {
    val ladder = Seq(0.0 -> 0L, 0.5 -> 1L, 0.9 -> 2L, 0.95 -> 3L,
      0.99 -> 4L, 0.999 -> 5L, 0.9995 -> 6L, 0.99995 -> 7L,
      0.999995 -> 8L, 0.9999999 -> 9L)
    val got = ladder.map(_._1).toDF("u")
      .select(col("u"), Sampling.poissonWeight(col("u")).as("w"))
      .as[(Double, Long)].collect().toMap
    ladder.foreach { case (u, w) => assert(got(u) === w, s"u=$u") }
    // over hash-uniforms the weights should average ≈ 1 (Poisson mean)
    val mean = spark.range(20000)
      .select(Sampling.poissonWeight(
        Sampling.hashScore(col("id"), 7L).cast("double") /
          lit(4503599627370496.0)).as("w"))
      .agg(avg(col("w"))).as[Double].head()
    assert(math.abs(mean - 1.0) < 0.03, s"mean weight $mean")
  }
}
