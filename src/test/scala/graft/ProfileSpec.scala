package graft

import org.apache.spark.sql.functions._
import graft.operators.Profile

class ProfileSpec extends SparkTestBase {
  import spark.implicits._

  test("nullProfile counts the 6-way missingness battery (eda:147-154)") {
    val df = Seq(
      ("ok", "1.5"), ("None of it", "NaN"), ("has NULL inside", ""),
      (null, "2.0"), ("Unknown value", null))
      .toDF("s", "v")
    val row = Profile.nullProfile(df).collect().head
    assert(row.getLong(0) === 4) // None, NULL, null, Unknown
    assert(row.getLong(1) === 3) // NaN, empty string, null
  }

  test("constraintAudit: row rules + uniqueness in one pass, both pass branches") {
    val df = Seq((1, 10, "A"), (2, 60, "A"), (2, 5, "Z"), (3, 20, "A"))
      .toDF("k", "qty", "flag")
    val out = Profile.constraintAudit(df,
      violations = Seq(
        "qty_range" -> (col("qty") < 1 || col("qty") > 50),
        "flag_domain" -> !col("flag").isin("A", "N", "R"),
        "k_positive" -> (col("k") <= 0)),
      uniqueKeys = Seq("k_unique" -> Seq("k")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out("qty_range") === ((1L, 4L, false)))   // 60
    assert(out("flag_domain") === ((1L, 4L, false))) // Z
    assert(out("k_positive") === ((0L, 4L, true)))
    assert(out("k_unique") === ((1L, 4L, false)))    // k=2 twice
    assert(out.size === 4)
  }

  test("summaryStats: exact count/mean/stddev/min/max per column") {
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val r = Profile.summaryStats(df, Seq("x")).collect().head
    assert(r.getAs[Long]("n") === 4)
    assert(r.getAs[Double]("mean") === 2.5)
    assert(math.abs(r.getAs[Double]("stddev") - 1.2910) < 1e-4)
    assert(r.getAs[Double]("min") === 1.0 && r.getAs[Double]("max") === 4.0)
  }

  test("summaryAll: summary()-shaped frame with exact interpolated percentiles") {
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val r = Profile.summaryAll(df, Seq("x")).collect().head
    assert(r.getAs[String]("column_name") === "x")
    assert(r.getAs[Long]("n") === 4)
    assert(r.getAs[Double]("mean") === 2.5)
    assert(math.abs(r.getAs[Double]("stddev") - 1.2910) < 1e-4)
    // linear interpolation on sorted [1,2,3,4]: idx 0.25*(4-1)=0.75
    assert(r.getAs[Double]("p25") === 1.75)
    assert(r.getAs[Double]("p50") === 2.5)
    assert(r.getAs[Double]("p75") === 3.25)
    assert(r.getAs[Double]("min") === 1.0 && r.getAs[Double]("max") === 4.0)
  }

  test("summaryAllApprox tracks the exact summary within sketch tolerance") {
    val df = (1 to 1000).map(_.toDouble).toDF("x")
    val exact = Profile.summaryAll(df, Seq("x")).collect().head
    val approx = Profile.summaryAllApprox(df, Seq("x")).collect().head
    // exact fields identical; percentiles within 1% of the exact values
    assert(approx.getAs[Long]("n") === exact.getAs[Long]("n"))
    assert(approx.getAs[Double]("mean") === exact.getAs[Double]("mean"))
    assert(approx.getAs[Double]("min") === exact.getAs[Double]("min"))
    assert(approx.getAs[Double]("max") === exact.getAs[Double]("max"))
    for (p <- Seq("p25", "p50", "p75")) {
      val e = exact.getAs[Double](p)
      assert(math.abs(approx.getAs[Double](p) - e) <= 0.01 * e + 1.0,
        s"$p: approx=${approx.getAs[Double](p)} exact=$e")
    }
  }

  test("summaryAllGated rank gate: dense-integer step boundary passes") {
    // the round-8 bench-scale worst case, shrunk: p50 sits EXACTLY on
    // the 25->26 value step (position 2499 of 0..4998 is the last 25),
    // where a rank-legal sketch may return 25 OR 26 — a 1.0 value jump
    // (4% of 25) the old 1% value gate sentineled on a CORRECT sketch.
    // The rank window [Q(0.5-eps), Q(0.5+eps)] accepts both and the
    // emitted value must be the EXACT percentile, never the sketch's.
    val vals = (1 to 49).flatMap(v => Seq.fill(100)(v.toDouble)) ++
      Seq.fill(99)(50.0)
    val df = vals.toDF("x")
    val exact = Profile.summaryAll(df, Seq("x")).collect().head
    assert(exact.getAs[Double]("p50") === 25.0) // boundary holds
    val gated = Profile.summaryAllGated(df, Seq("x"), accuracy = 100)
      .collect().head
    for (p <- Seq("p25", "p50", "p75"))
      assert(gated.getAs[Double](p) === exact.getAs[Double](p),
        s"$p: gate sentineled or drifted on a rank-legal sketch")
  }

  test("summaryAllGated rank gate fails closed on degenerate windows") {
    // all-identical column: Q(p-eps) = Q(p) = Q(p+eps) collapses the
    // rank window to a single value, so ONLY an exactly-right sketch
    // passes — the fail-closed end of the contract. approx_percentile
    // is exact here, so every cell must emit the (exact) value, and the
    // window arithmetic must not widen it (lo == hi == exact).
    val df = Seq.fill(1000)(7.5).toDF("x")
    val gated = Profile.summaryAllGated(df, Seq("x"), accuracy = 10)
      .collect().head
    for (p <- Seq("p25", "p50", "p75"))
      assert(gated.getAs[Double](p) === 7.5)
  }

  test("dtypePartition splits numeric vs categorical (eda:175-191)") {
    val df = Seq((1, "a", 2.0)).toDF("i", "s", "d")
    val (num, cat) = Profile.dtypePartition(df)
    assert(num === Seq("i", "d") && cat === Seq("s"))
  }

  test("topCategories = value_counts().head(n) (eda:124)") {
    val df = Seq("a", "a", "a", "b", "b", "c").toDF("t")
    val out = Profile.topCategories(df, "t", 2).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("a", 3L), ("b", 2L)))
  }

  test("missingPct yields per-column percentage") {
    val df = Seq(("a", null), ("b", "x"), (null, null))
      .toDF("c1", "c2")
    val m = Profile.missingPct(df).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(m("c1") - 33.3333) < 0.001)
    assert(math.abs(m("c2") - 66.6667) < 0.001)
  }

  test("equiDepthBins: median split, ties stay in one bin, no window") {
    import spark.implicits._
    val df = (1 to 10).map(_.toDouble).toDF("v")
    val out = Profile.equiDepthBins(df, "v", bins = 2)
      .groupBy($"bin_id").count()
      .as[(Long, Long)].collect().toMap
    assert(out === Map(0L -> 5L, 1L -> 5L)) // cut at 5.5
    // heavy ties: equal values compare identically → a single bin holds
    // them all (the documented equi-depth-under-ties contract)
    val ties = Seq.fill(8)(1.0).map(Tuple1(_)).toDF("v")
    val tied = Profile.equiDepthBins(ties, "v", bins = 4)
      .select($"bin_id").distinct().as[Long].collect().toSeq
    assert(tied.size === 1)
    // scale shape: no Window node (the rejected ntile formulation)
    val plan = Profile.equiDepthBins(df, "v", 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"ntile crept back in:\n$plan")
  }

  test("partitionSkew counts every row exactly once") {
    import spark.implicits._
    val df = (1 to 100).toDF("v").repartition(8)
    val skew = Profile.partitionSkew(df)
      .as[(Int, Long)].collect().toSeq
    assert(skew.map(_._2).sum === 100L)
    assert(skew.map(_._1).distinct.size === skew.size)
  }

  test("shuffleSkewReport: balanced key ≈ 1, degenerate key = n_buckets") {
    import spark.implicits._
    // one single hot key: every row lands in ONE bucket → skew = 1
    // bucket × buckets/1... with a single bucket present, max = mean
    // of the PRESENT buckets → skew 1.0 (absent buckets don't count);
    // the report still exposes the pathology via n_buckets = 1
    val hot = Seq.fill(64)(42L).toDF("k")
    val gotHot = Profile.shuffleSkewReport(hot, "k", buckets = 8)
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(gotHot === ((1L, 64L, 64L, 64L, 1.0)))
    // distinct keys spread: all rows accounted for, skew small
    val spread = (1L to 1000L).toDF("k")
    val got = Profile.shuffleSkewReport(spread, "k", buckets = 8)
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(got._1 === 8L && got._2 === 1000L)
    assert(got._5 >= 1.0 && got._5 < 1.5)
  }

  test("referentialAudit counts nulls and orphans per relationship") {
    val child = Seq(Some(1L), Some(2L), Some(2L), None, Some(5L))
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = Profile.referentialAudit(Seq(
        ("child.fk->parent", child, "fk", parent, "pk")))
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(("child.fk->parent", 5L, 1L, 1L, 0.2)))
  }

  test("fdAudit: holding vs violated candidates, violating rows counted") {
    import spark.implicits._
    // a->b holds (each a maps to one b); a->c violated by a=1 (two
    // distinct c over 3 rows) while a=2 is clean
    val df = Seq((1, "x", "p"), (1, "x", "q"), (1, "x", "p"),
      (2, "y", "r")).toDF("a", "b", "c")
    val got = Profile.fdAudit(Seq(
        ("t.a->b", df, "a", "b"), ("t.a->c", df, "a", "c")))
      .orderBy($"candidate")
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    assert(got === Seq(
      ("t.a->b", 2L, 0L, 0L, true),
      ("t.a->c", 2L, 1L, 3L, false)))
  }
}
