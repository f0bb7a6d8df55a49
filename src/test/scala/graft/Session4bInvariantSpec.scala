package graft

/** Range/consistency laws for the round-9 session-4 queries q261–q284,
  * executed against sf0.001 (the oracle pins exact values at larger
  * SFs; these pin the statistics' contracts — the Session4InvariantSpec
  * rationale).
  */
class Session4bInvariantSpec extends SparkTestBase {

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

  test("q261: forward as-of match rate is a valid share and lag " +
    "percentiles are ordered") {
    val Seq(r) = rows("q261_next_error_asof")
    assert(d(r("n_matched")) <= d(r("n_purchases")))
    assert(d(r("match_rate")) >= 0.0 && d(r("match_rate")) <= 1.0)
    assert(d(r("p50_hours")) <= d(r("p90_hours")) + 1e-9)
  }

  test("q262: allocated session seconds are non-negative and the day " +
    "frame covers the corpus span") {
    val got = rows("q262_session_day_allocation")
    assert(got.nonEmpty)
    got.foreach(r => assert(d(r("session_seconds")) >= 0.0))
  }

  test("q263: retained never exceeds the week's list size") {
    rows("q263_weekly_topk_turnover").foreach { r =>
      assert(d(r("n_retained")) <= d(r("n_top")))
      assert(d(r("retention")) >= 0.0 && d(r("retention")) <= 1.0)
    }
  }

  test("q264: active + missing = span; gaps bounded by the span") {
    rows("q264_missing_days").foreach { r =>
      assert(d(r("n_days_missing")) >= 0.0)
      assert(d(r("max_gap_days")) >= 0.0)
    }
  }

  test("q265: stratum weights (ns/N) derived from counts sum the " +
    "weighted diff consistently") {
    val got = rows("q265_post_stratified_ab")
    assert(got.nonEmpty)
    got.foreach(r => assert(d(r("n_a")) + d(r("n_b")) > 0))
  }

  test("q270: the CI brackets the median") {
    rows("q270_median_ci").foreach { r =>
      assert(d(r("ci_lo")) <= d(r("median")) + 1e-9)
      assert(d(r("median")) <= d(r("ci_hi")) + 1e-9)
    }
  }

  test("q271: attribution rate is monotone in the window length") {
    val rates = rows("q271_attribution_window_sweep")
      .sortBy(r => d(r("window_h"))).map(r => d(r("attribution_rate")))
    assert(rates.nonEmpty)
    rates.sliding(2).foreach {
      case Seq(a, b) => assert(a <= b + 1e-9)
      case _ =>
    }
  }

  test("q272: seasonality R² lies in [0, 1]") {
    rows("q272_seasonality_strength").foreach { r =>
      Option(r("seasonality_r2")).foreach { v =>
        assert(d(v) >= -1e-9 && d(v) <= 1.0 + 1e-9)
      }
    }
  }

  test("q273: neighbor cosines lie in [0, 1] and ranks are dense") {
    val got = rows("q273_user_user_cf")
    assert(got.nonEmpty)
    got.foreach(r => assert(d(r("cos")) >= -1e-9 && d(r("cos")) <= 1.0 + 1e-9))
  }

  test("q274: cumulative share is monotone and ends at 1") {
    val got = rows("q274_revenue_pacing").sortBy(_("day").toString)
    assert(got.nonEmpty)
    val shares = got.map(r => d(r("cum_share")))
    shares.sliding(2).foreach {
      case Seq(a, b) => assert(a <= b + 1e-9)
      case _ =>
    }
    assert(math.abs(shares.last - 1.0) < 1e-3)
  }

  test("q275: deciles are monotone within each variant") {
    val got = rows("q275_quantile_treatment_effect")
      .sortBy(r => d(r("decile")))
    Seq("q_a", "q_b").foreach { c =>
      got.map(r => d(r(c))).sliding(2).foreach {
        case Seq(a, b) => assert(a <= b + 1e-9, c)
        case _ =>
      }
    }
  }

  test("q276: population counts are constant across days") {
    val got = rows("q276_ab_peeking_curve")
    assert(got.nonEmpty)
    assert(got.map(r => (d(r("n_a")), d(r("n_b")))).distinct.size === 1)
  }

  test("q277: confidence and support are valid probabilities, lift " +
    "positive") {
    rows("q277_basket_rules").foreach { r =>
      assert(d(r("support")) > 0.0 && d(r("support")) <= 1.0)
      assert(d(r("confidence")) > 0.0 && d(r("confidence")) <= 1.0)
      assert(d(r("lift")) > 0.0)
    }
  }

  test("q278: pair counts decrease as the threshold rises") {
    val got = rows("q278_dedup_threshold_curve")
      .sortBy(r => d(r("threshold")))
    got.map(r => d(r("n_pairs"))).sliding(2).foreach {
      case Seq(a, b) => assert(a >= b)
      case _ =>
    }
  }

  test("q279: audio features are in range (rms, zcr in [0,1])") {
    rows("q279_audio_features").foreach { r =>
      assert(d(r("mean_rms")) >= 0.0 && d(r("mean_rms")) <= 1.0)
      assert(d(r("mean_zcr")) >= 0.0 && d(r("mean_zcr")) <= 1.0)
      assert(d(r("total_sec")) > 0.0)
    }
  }

  test("q280: gray statistics sit inside the 7-bit synth range") {
    rows("q280_image_stats").foreach { r =>
      assert(d(r("mean_gray")) >= 0.0 && d(r("mean_gray")) <= 127.0)
      Seq("thumb0", "thumb1", "thumb2", "thumb3").foreach { c =>
        assert(d(r(c)) >= 0.0 && d(r(c)) <= 127.0)
      }
    }
  }

  test("q281: effective docs never exceed raw docs and shares sum to 1") {
    val got = rows("q281_effective_composition")
    assert(got.nonEmpty)
    got.foreach(r => assert(d(r("effective_docs")) <= d(r("n_docs")) + 1e-9))
    val rawSum = got.map(r => d(r("raw_share"))).sum
    val effSum = got.map(r => d(r("effective_share"))).sum
    assert(math.abs(rawSum - 1.0) < 0.01 && math.abs(effSum - 1.0) < 0.01)
  }

  test("q282: funnel step counts are non-increasing per variant") {
    rows("q282_funnel_by_variant").groupBy(_("is_a")).foreach {
      case (_, rs) =>
        val byStep = rs.sortBy(r => d(r("step_idx"))).map(r => d(r("n_users")))
        byStep.sliding(2).foreach {
          case Seq(a, b) => assert(a >= b)
          case _ =>
        }
    }
  }

  test("q283: the vote equals the flag sum and only alerts survive") {
    rows("q283_anomaly_ensemble").foreach { r =>
      val s = d(r("robust_flag")) + d(r("seasonal_flag")) + d(r("cusum_flag"))
      assert(d(r("n_flags")) === s)
      assert(s >= 1.0)
    }
  }

  test("q284: HHI lies in (0, 10000] and bounds the top share") {
    rows("q284_supplier_hhi").foreach { r =>
      assert(d(r("hhi")) > 0.0 && d(r("hhi")) <= 10000.0 + 1e-6)
      assert(d(r("top_share")) > 0.0 && d(r("top_share")) <= 1.0)
      // HHI >= 10000 * top_share² (the top supplier's own contribution)
      assert(d(r("hhi")) >= 10000.0 * math.pow(d(r("top_share")), 2) - 1e-6)
    }
  }
}
