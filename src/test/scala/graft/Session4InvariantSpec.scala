package graft

/** Range/consistency invariants for the round-9 session-4 queries
  * (q238–q251), executed against sf0.001. The DuckDB oracle pins exact
  * values at sf0.01/sf0.1; these pin the statistics' CONTRACTS — a
  * refactor that keeps hash parity by breaking both engine sides
  * identically still trips a range law.
  */
class Session4InvariantSpec extends SparkTestBase {

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

  test("q238: promo share is a percentage in [0, 100]") {
    val got = rows("q238_promo_revenue")
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(d(r("promo_share_pct")) >= 0.0)
      assert(d(r("promo_share_pct")) <= 100.0)
    }
  }

  test("q239: exactly one top supplier per quarter, revenue positive") {
    val got = rows("q239_top_supplier")
    assert(got.map(_("qtr")).distinct.size === got.size)
    got.foreach(r => assert(d(r("total_revenue")) > 0.0))
  }

  test("q240: top-20 returned-revenue ranking is sorted descending") {
    val lost = rows("q240_returned_customers").map(r => d(r("lost_revenue")))
    assert(lost.nonEmpty && lost.size <= 20)
    assert(lost === lost.sorted.reverse)
  }

  test("q241: the small-quantity filter keeps a strict subset of the " +
    "brand's lineitems") {
    val Seq(r) = rows("q241_small_qty_revenue")
    val brandLines = sources.Tables.load(spark, sf, "lineitem")
      .join(sources.Tables.load(spark, sf, "part")
        .filter(org.apache.spark.sql.functions.col("p_brand") === "Brand#9"),
        org.apache.spark.sql.functions.col("l_partkey")
          === org.apache.spark.sql.functions.col("p_partkey"))
      .count()
    assert(d(r("n_lines")) < brandLines)
  }

  test("q242: every surviving order's total quantity exceeds the cut") {
    rows("q242_big_orders").foreach(r => assert(d(r("total_qty")) > 300))
  }

  test("q243: silhouette lies in [-1, 1] per label") {
    val got = rows("q243_silhouette")
    assert(got.nonEmpty)
    got.foreach(r => assert(math.abs(d(r("mean_silhouette"))) <= 1.0))
  }

  test("q244: confusion matrix counts sum to the corpus size") {
    val total = rows("q244_centroid_classifier").map(r => d(r("n"))).sum
    val nVec = sources.Tables.load(spark, sf, "embeddings").count()
    assert(total === nVec.toDouble)
  }

  test("q245: CUPED never increases variance on a correlated covariate " +
    "beyond rounding") {
    val got = rows("q245_cuped")
    assert(got.size === 2)
    got.foreach { r =>
      assert(d(r("var_raw")) > 0.0)
      assert(d(r("var_cuped")) >= 0.0)
      // var(y − θx) with pooled θ can exceed var(y) per-variant only
      // through the pooled-vs-variant mismatch; allow slack but pin
      // the reduction to a sane band
      assert(d(r("var_reduction_pct")) <= 100.0)
    }
  }

  test("q246: Brown-Forsythe F is non-negative with consistent dfs") {
    val Seq(r) = rows("q246_brown_forsythe")
    assert(d(r("f_stat")) >= 0.0)
    assert(d(r("df1")) === d(r("k_groups")) - 1)
    assert(d(r("df2")) === d(r("n_total")) - d(r("k_groups")))
  }

  test("q247: Hedges' g shrinks |d| toward zero") {
    rows("q247_cohens_d").foreach { r =>
      assert(math.abs(d(r("hedges_g"))) <= math.abs(d(r("cohens_d"))) + 1e-9)
    }
  }

  test("q248: stream enrichment emits every batch purchase exactly once") {
    val got = SparkEntry.queries("q248_stream_static_enrich")(spark, sf)
    val batchPurchases = sources.Tables.load(spark, sf, "events")
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .count()
    assert(got.count() === batchPurchases)
    assert(got.select("event_id").distinct().count() === batchPurchases)
  }

  test("q249: lambda is positive and KS lies in [0, 1]") {
    val got = rows("q249_interarrival_expfit")
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(d(r("lambda")) > 0.0)
      assert(d(r("ks_stat")) >= 0.0 && d(r("ks_stat")) <= 1.0)
    }
  }

  test("q250: JL ratios are positive and p90 distortion bounds max") {
    val Seq(r) = rows("q250_jl_distortion")
    assert(d(r("mean_ratio")) > 0.0)
    assert(d(r("p90_abs_distortion")) <= d(r("max_abs_distortion")) + 1e-9)
  }

  test("q251: TextRank scores are positive and the frame is the vocab") {
    val got = rows("q251_textrank")
    assert(got.nonEmpty && got.size <= 20)
    got.foreach(r => assert(d(r("pr_scaled")) > 0.0))
  }

  test("q252: log-loss is positive and finite") {
    val Seq(r) = rows("q252_logistic_newton")
    assert(d(r("logloss_model")) > 0.0)
    assert(java.lang.Double.isFinite(d(r("beta0"))))
    assert(java.lang.Double.isFinite(d(r("beta1"))))
  }

  test("q253: hits bound transitions and the rate is their ratio") {
    val Seq(r) = rows("q253_covisit_backtest")
    assert(d(r("n_hits")) <= d(r("n_transitions")))
    assert(d(r("hit_rate")) >= 0.0 && d(r("hit_rate")) <= 1.0)
  }

  test("q254: two-step rows distribute over P's support and each " +
    "source's reach sums to 1") {
    val got = rows("q254_two_step_markov")
    assert(got.nonEmpty)
    got.groupBy(_("prev_type")).foreach { case (_, rs) =>
      val s = rs.map(r => d(r("p2"))).sum
      assert(math.abs(s - 1.0) < 0.01, s"reach sums to $s")
    }
  }

  test("q255: the odds ratio lies inside its own 95% CI") {
    val Seq(r) = rows("q255_whale_odds_ratio")
    assert(d(r("ci_lo")) <= d(r("odds_ratio")))
    assert(d(r("odds_ratio")) <= d(r("ci_hi")))
  }

  test("q256: a negative slope yields a positive half-life") {
    rows("q256_retention_halflife").foreach { r =>
      Option(r("halflife_weeks")).foreach { h =>
        assert(d(h) > 0.0)
        assert(d(r("slope")) < 0.0)
      }
    }
  }

  test("q257: outlier list is sorted by z descending") {
    val zs = rows("q257_embedding_outliers").map(r => d(r("z")))
    assert(zs.nonEmpty && zs.size <= 10)
    assert(zs === zs.sorted.reverse)
  }

  test("q258: motifs use the 4-letter alphabet and cover the calendar") {
    val got = rows("q258_sax_motifs")
    assert(got.nonEmpty)
    got.foreach { r =>
      val m = r("motif").toString
      assert(m.length === 3 && m.forall("abcd".contains(_)), m)
    }
    // per type: Σ motif counts = days − 2 (3-day windows over the span)
    got.groupBy(_("event_type")).foreach { case (_, rs) =>
      assert(rs.map(r => d(r("n"))).sum >= 1)
    }
  }

  test("q259: NB r/p appear only under overdispersion, p in (0, 1]") {
    rows("q259_negbin_fit").foreach { r =>
      assert(d(r("dispersion")) > 0.0)
      (Option(r("nb_r")), Option(r("nb_p"))) match {
        case (Some(nr), Some(np)) =>
          assert(d(r("dispersion")) > 1.0)
          assert(d(nr) > 0.0)
          assert(d(np) > 0.0 && d(np) <= 1.0)
        case (None, None) => assert(d(r("dispersion")) <= 1.0 + 1e-9)
        case other => fail(s"half-null NB fit: $other")
      }
    }
  }

  test("q260: local bridges are bounded by the edge count") {
    val Seq(r) = rows("q260_local_bridges")
    // sf0.001's co-engagement graph is empty (corpus-scaled support
    // floor): sum over zero rows is null on BOTH engines — assert the
    // bound only when edges exist
    Option(r("n_local_bridges")).foreach { nb =>
      assert(d(nb) <= d(r("n_edges")))
    }
  }
}
