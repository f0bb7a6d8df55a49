package graft

/** Mathematical range/consistency invariants for the round-9 session-3
  * analytics queries, executed against sf0.001. The DuckDB oracle pins
  * exact values at sf0.01/sf0.1; these pin the STATISTICS' contracts —
  * a refactor that keeps hash parity by breaking both sides identically
  * (shared-constant drift, swapped numerators) still trips a range law.
  */
class StatsInvariantSpec extends SparkTestBase {

  private def rows(name: String): Seq[Map[String, Any]] = {
    val df = SparkEntry.queries(name)(spark, sf)
    val cols = df.columns
    df.collect().toSeq.map(r => cols.zipWithIndex.map { case (c, i) =>
      c -> r.get(i)
    }.toMap)
  }

  private def d(v: Any): Double = v match {
    case x: java.lang.Number => x.doubleValue()
    case other => fail(s"not numeric: $other")
  }

  test("q208: Kendall tau-b lies in [-1, 1]") {
    val got = rows("q208_kendall_tau")
    assert(got.nonEmpty)
    got.foreach(r => assert(math.abs(d(r("tau_b"))) <= 1.0))
  }

  test("q210: Kruskal-Wallis H is non-negative and tie correction " +
    "only grows it") {
    val Seq(r) = rows("q210_kruskal_wallis")
    assert(d(r("h")) >= 0.0)
    assert(d(r("h_tie_corrected")) >= d(r("h")) - 1e-9)
  }

  test("q211: Cramer's V lies in [0, 1]") {
    val Seq(r) = rows("q211_cramers_v")
    assert(d(r("cramers_v")) >= 0.0 && d(r("cramers_v")) <= 1.0)
    assert(d(r("chi2")) >= 0.0)
  }

  test("q212: trimmed mean is within the untrimmed range and keeps " +
    "80-100% of rows") {
    rows("q212_trimmed_mean").foreach { r =>
      val (n, kept) = (d(r("n")), d(r("n_kept")))
      // interpolated cuts with no value AT either cut keep ranks
      // strictly inside: as few as ceil(0.8n) − 2 rows
      assert(kept <= n && kept >= 0.8 * n - 2)
      assert(d(r("trimmed_mean")) > 0.0)
    }
  }

  test("q213: conversion rate in [0, 1], lag quartiles ordered") {
    val Seq(r) = rows("q213_conversion_lag")
    assert(d(r("conv_rate")) >= 0.0 && d(r("conv_rate")) <= 1.0)
    assert(d(r("p25_h")) <= d(r("p50_h")) + 1e-9)
    assert(d(r("p50_h")) <= d(r("p75_h")) + 1e-9)
  }

  test("q217: coverage in (0, 1], exposure Gini in [0, 1)") {
    val Seq(r) = rows("q217_rec_coverage")
    assert(d(r("coverage")) > 0.0 && d(r("coverage")) <= 1.0)
    assert(d(r("exposure_gini")) >= 0.0 && d(r("exposure_gini")) < 1.0)
    assert(d(r("n_recommended")) <= d(r("catalog")))
  }

  test("q218: Heaps beta in [0, 1] — vocabulary grows sublinearly") {
    val Seq(r) = rows("q218_heaps_law")
    // 0 is legitimate when a tiny corpus saturates its (synthetic)
    // vocabulary inside the first checkpoint bucket
    assert(d(r("heaps_beta")) >= 0.0 && d(r("heaps_beta")) <= 1.0)
    assert(d(r("total_types")) <= d(r("total_tokens")))
  }

  test("q219: snapshot diff classes partition the user set") {
    val got = rows("q219_snapshot_diff")
    val classes = got.map(_("change_class").toString)
    assert(classes.toSet.subsetOf(Set("new", "changed", "unchanged")))
    val total = got.map(r => d(r("n_users"))).sum
    val users = sources.Tables.load(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(total === users.toDouble)
  }

  test("q222: SRM counts cover all users; chi2 consistent with counts") {
    val Seq(r) = rows("q222_srm_audit")
    val (na, nb) = (d(r("n_a")), d(r("n_b")))
    val users = sources.Tables.load(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(na + nb === users.toDouble)
    val chi2 = math.pow(na - nb, 2) / (na + nb)
    assert(math.abs(d(r("chi2")) - chi2) < 1e-3)
  }

  test("q223: equi-width histogram bins partition each type's rows") {
    val got = rows("q223_equiwidth_hist")
    got.foreach { r =>
      val b = d(r("bin")); assert(b >= 0 && b <= 19)
    }
    val sums = got.groupBy(_("event_type").toString)
      .map { case (t, rs) => t -> rs.map(r => d(r("n"))).sum }
    val counts = sources.Tables.load(spark, sf, "events")
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    assert(sums === counts)
  }

  test("q224: audience-overlap Jaccard in (0, 1]; common bounded by " +
    "smaller side") {
    rows("q224_audience_overlap").foreach { r =>
      assert(d(r("jaccard")) > 0.0 && d(r("jaccard")) <= 1.0)
    }
  }

  test("q226: precision/recall/F1 in [0, 1] and F1 between 0 and " +
    "min-consistent bound") {
    rows("q226_langid_prf").foreach { r =>
      val (p, rc, f1) = (d(r("precision")), d(r("recall")), d(r("f1")))
      Seq(p, rc, f1).foreach(v => assert(v >= 0.0 && v <= 1.0))
      // harmonic mean never exceeds either component (rounding slack)
      assert(f1 <= math.max(p, rc) + 1e-3)
      assert(d(r("tp")) <= math.min(d(r("support")), d(r("n_pred"))))
    }
  }

  test("q228: revenue deciles are a partition with cum_share ending " +
    "at 1") {
    val got = rows("q228_revenue_deciles")
    // cum_share runs top-down (decile desc): the LAST row by decile asc
    // carries the full total
    val last = got.maxBy(r => -d(r("decile")))
    assert(got.map(r => d(r("decile"))).distinct.size === got.size)
    val bottom = got.minBy(r => d(r("decile")))
    assert(math.abs(d(bottom("cum_share")) - 1.0) < 1e-3)
    assert(d(last("cum_share")) > 0.0)
  }

  test("q229: token entropy bounded by ln(vocab)") {
    rows("q229_token_entropy").foreach { r =>
      val h = d(r("entropy"))
      assert(h >= 0.0 && h <= math.log(d(r("vocab"))) + 1e-9)
    }
  }
}
