package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions.to_date

import graft.ext.EventOps

class EventOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: Int) = new Timestamp(s * 1000L)

  test("funnel: strict ordering, first-touch anchors, monotone counts") {
    val events = Seq(
      // user 1: full ordered funnel
      (1L, "view", ts(10)), (1L, "click", ts(20)), (1L, "purchase", ts(30)),
      // user 2: clicked BEFORE first view → stops at step 1
      (2L, "click", ts(5)), (2L, "view", ts(10)),
      // user 3: first-touch trap — an early view anchors the funnel,
      // the click after it counts even though a later view also exists
      (3L, "view", ts(10)), (3L, "view", ts(50)), (3L, "click", ts(20)),
      // user 4: purchase exactly AT the click time → strict '>' rejects
      (4L, "view", ts(1)), (4L, "click", ts(2)), (4L, "purchase", ts(2)),
      // user 5: never viewed
      (5L, "purchase", ts(9)))
      .toDF("user_id", "event_type", "ts")
    val got = EventOps.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, "view", 4L),      // users 1-4
      (2L, "click", 3L),     // users 1, 3, 4 (user 2's click too early)
      (3L, "purchase", 1L))) // user 1 only (user 4's tie rejected)
  }

  test("funnel: empty steps keep their zero-count rows") {
    val events = Seq((1L, "view", ts(1))).toDF("user_id", "event_type", "ts")
    val got = EventOps.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, "view", 1L), (2L, "click", 0L),
      (3L, "purchase", 0L)))
  }

  test("funnelTimed: per-step deadlines gate the survivor chain") {
    // delays: click within 60 s of first view, purchase within 100 s
    // of the qualifying click
    val events = Seq(
      // user 1: click at +50 (inside), purchase at +100 from click
      // (boundary — inclusive <=) → survives all steps
      (1L, "view", ts(0)), (1L, "click", ts(50)), (1L, "purchase", ts(150)),
      // user 2: click at +61 — one second past the deadline → out at 2
      (2L, "view", ts(0)), (2L, "click", ts(61)), (2L, "purchase", ts(70)),
      // user 3: EARLY disqualified click, then a qualifying one; its
      // purchase must anchor at the QUALIFYING click (ts 40), not the
      // early one — purchase at 141 > 40+100 → out at step 3
      (3L, "view", ts(10)), (3L, "click", ts(5)), (3L, "click", ts(40)),
      (3L, "purchase", ts(141)))
      .toDF("user_id", "event_type", "ts")
    val got = EventOps.funnelTimed(events, "user_id", "event_type", "ts",
        Seq(("view", 0L), ("click", 60L * 1000000),
          ("purchase", 100L * 1000000)))
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, "view", 3L), (2L, "click", 2L),
      (3L, "purchase", 1L)))
  }

  test("rollingUserAvg: time-range frame, not row-count; per-user") {
    val events = Seq(
      (1L, 101L, ts(0), 1.0),        // t = 0
      (1L, 102L, ts(1800), 2.0),     // t = 30 min
      (1L, 103L, ts(5400), 3.0),     // t = 90 min: first event aged out
      (2L, 201L, ts(5400), 9.0))     // other user untouched
      .toDF("user_id", "event_id", "ts", "value")
    val got = EventOps.rollingUserAvg(events, "user_id", "ts", "value",
        windowMicros = 3600L * 1000000L)
      .select($"event_id", $"roll_avg")
      .as[(Long, Double)].collect().toMap
    assert(got === Map(101L -> 1.0, 102L -> 1.5, 103L -> 2.5,
      201L -> 9.0))
  }

  test("resampleHourlyFfill: forward fill, no back-fill, boundary event " +
    "fills its own slot") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(mins: Int) = new Timestamp(base.getTime + mins * 60000L)
    val events = Seq(
      (1L, at(30), 1.0),   // 00:30
      (1L, at(135), 2.0),  // 02:15
      (2L, at(60), 5.0))   // exactly 01:00 → fills slot 1
      .toDF("user_id", "ts", "value")
    val got = EventOps.resampleHourlyFfill(events, "user_id", "ts",
        "value", "2024-01-01 00:00:00", slots = 4)
      .select($"user_id", $"slot", $"value_ffill")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).sortBy(t => (t._1, t._2)).toSeq
    assert(got === Seq(
      (1L, 0L, None),        // before first observation: no back-fill
      (1L, 1L, Some(1.0)),
      (1L, 2L, Some(1.0)),   // gap carried forward
      (1L, 3L, Some(2.0)),
      (2L, 0L, None),
      (2L, 1L, Some(5.0)),   // boundary event orders before its slot
      (2L, 2L, Some(5.0)),
      (2L, 3L, Some(5.0))))
  }

  test("cohortRetention: first-week cohorts, week offsets, distinct users") {
    val week = 7 * 24 * 3600
    val events = Seq(
      (1L, ts(0)), (1L, ts(10)),          // u1 cohort week 0 (dup row)
      (1L, ts(2 * week)),                 // u1 returns at offset 2
      (2L, ts(60)),                       // u2 cohort week 0, never back
      (3L, ts(2 * week + 60)))            // u3 cohort week 2
      .toDF("user_id", "ts")
    val got = EventOps.cohortRetention(events, "user_id", "ts")
      .select($"week_offset", $"n_users",
        $"cohort_week".cast("string"))
      .as[(Long, Long, String)].collect()
      .map(r => (r._3, r._1) -> r._2).toMap
    val weeks = got.keys.map(_._1).toSeq.distinct.sorted
    assert(weeks.size === 2)
    assert(got((weeks.head, 0L)) === 2L) // u1, u2 in cohort 1
    assert(got((weeks.head, 2L)) === 1L) // only u1 returned
    assert(got((weeks.last, 0L)) === 1L) // u3's own cohort
    assert(got.size === 3)
  }

  test("markovTransitions: per-user lag pairs, integer-ratio probs") {
    val events = Seq(
      (1L, 1L, ts(0), "A"), (1L, 2L, ts(10), "B"),
      (1L, 3L, ts(20), "A"), (1L, 4L, ts(30), "B"),
      (2L, 5L, ts(0), "A"), (2L, 6L, ts(10), "A"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = EventOps.markovTransitions(events, "user_id", "event_type",
        "ts", "event_id")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // prev A: A→B twice (u1), A→A once (u2); prev B: B→A once
    assert(got(("A", "B")) === (2L, 0.6667))
    assert(got(("A", "A")) === (1L, 0.3333))
    assert(got(("B", "A")) === (1L, 1.0))
    assert(got.size === 3)
  }

  test("transitionSurprise: PMI 0 under independence, ln2 for pairing") {
    // bigrams (one 5-event chain, user 1): A→B, B→A, A→B, B→A
    //   n=4 total; every marginal = 2 → pmi = ln(2·4/(2·2)) = ln 2
    val dep = Seq((1L, 1L, ts(0), "A"), (1L, 2L, ts(10), "B"),
      (1L, 3L, ts(20), "A"), (1L, 4L, ts(30), "B"), (1L, 5L, ts(40), "A"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = EventOps.transitionSurprise(dep, "user_id", "event_type",
        "ts", "event_id")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got(("A", "B")) === ((2L, 0.6931)))
    assert(got(("B", "A")) === ((2L, 0.6931)))
    assert(got.size === 2)
    // uniform mix: every bigram equally likely → pmi 0 everywhere
    val mix = Seq((1L, 1L, ts(0), "A"), (1L, 2L, ts(10), "A"),
      (1L, 3L, ts(20), "B"), (1L, 4L, ts(30), "B"),
      (2L, 5L, ts(0), "B"), (2L, 6L, ts(10), "A"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val gotMix = EventOps.transitionSurprise(mix, "user_id",
        "event_type", "ts", "event_id")
      .as[(String, String, Long, Double)].collect()
    // 4 bigrams A→A, A→B, B→B, B→A each n=1, marginals 2,2 → ln(4/4)=0
    assert(gotMix.length === 4 && gotMix.forall(_._4 === 0.0))
  }

  test("sequenceSurprise: certain chains score 0, rare paths score high") {
    // corpus: u1..u3 all walk A→B (det.), u4 walks A→C once
    //   p(B|A) = 3/4, p(C|A) = 1/4
    val events = Seq(
      (1L, 1L, ts(0), "A"), (1L, 2L, ts(10), "B"),
      (2L, 3L, ts(0), "A"), (2L, 4L, ts(10), "B"),
      (3L, 5L, ts(0), "A"), (3L, 6L, ts(10), "B"),
      (4L, 7L, ts(0), "A"), (4L, 8L, ts(10), "C"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = EventOps.sequenceSurprise(events, "user_id", "event_type",
        "ts", "event_id")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val lnP = (p: Double) => math.round((-math.log(p) + 1e-9) * 1e4) / 1e4
    assert(got(1L) === ((1L, 1L, lnP(0.75))))
    assert(got(4L) === ((4L, 1L, lnP(0.25))))
    // a user whose every transition has p = 1 scores exactly +0.0
    val certain = Seq((9L, 1L, ts(0), "X"), (9L, 2L, ts(10), "X"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val gotC = EventOps.sequenceSurprise(certain, "user_id",
        "event_type", "ts", "event_id")
      .as[(Long, Long, Double)].collect().head
    assert(gotC === ((9L, 1L, 0.0)))
    assert(1.0 / gotC._3 > 0, "must be +0.0, not -0.0")
  }

  test("sessionize: strict gap threshold, per-user sessions, durations") {
    val events = Seq(
      // u1: 0, 10min | gap 40min | 50min, 60min → two sessions
      (1L, 1L, ts(0)), (1L, 2L, ts(600)),
      (1L, 3L, ts(3000)), (1L, 4L, ts(3600)),
      // u2: gap EXACTLY 30min stays one session (strict >)
      (2L, 5L, ts(0)), (2L, 6L, ts(1800)))
      .toDF("user_id", "event_id", "ts")
    val got = EventOps.sessionize(events, "user_id", "ts", "event_id",
        gapMinutes = 30)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got((1L, 1L)) === (2L, 600000000L))
    assert(got((1L, 2L)) === (2L, 600000000L))
    assert(got((2L, 1L)) === (2L, 1800000000L))
    assert(got.size === 3)
  }

  test("mergeIntervals: overlap and touch merge, gaps split, per key") {
    val iv = Seq(
      (1L, 0L, 10L), (1L, 5L, 15L),   // overlap → merge
      (1L, 15L, 20L),                 // touches the running end → merge
      (1L, 25L, 30L),                 // gap → new island
      (2L, 0L, 1L))
      .toDF("k", "s", "e")
    val got = EventOps.mergeIntervals(iv, "k", "s", "e")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(got((1L, 1L)) === (0L, 20L, 3L))
    assert(got((1L, 2L)) === (25L, 30L, 1L))
    assert(got((2L, 1L)) === (0L, 1L, 1L))
    assert(got.size === 3)
  }

  test("ewma: recency weighting, partial-frame normalization, frame " +
    "bound") {
    val events = Seq(
      (1L, 1L, ts(0), 1.0), (1L, 2L, ts(10), 2.0), (1L, 3L, ts(20), 4.0),
      (2L, 4L, ts(0), 9.0))
      .toDF("user_id", "event_id", "ts", "value")
    val got = EventOps.ewma(events, "user_id", "ts", "event_id",
        "value", frameRows = 2, decay = 0.5)
      .select($"event_id", $"ewma").as[(Long, Double)].collect().toMap
    assert(got(1L) === 1.0)               // frame [1]
    assert(got(2L) === 1.6667)            // (0.5·1 + 2) / 1.5
    assert(got(3L) === 3.3333)            // frame bound: (0.5·2 + 4) / 1.5
    assert(got(4L) === 9.0)               // other user untouched
  }

  test("collapseRuns: consecutive same-type runs, SCD-2 validity ranges") {
    val events = Seq(
      (1L, 1L, ts(0), "A"), (1L, 2L, ts(1), "A"),
      (1L, 3L, ts(2), "B"), (1L, 4L, ts(3), "A"),
      (2L, 5L, ts(0), "C"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = EventOps.collapseRuns(events, "user_id", "event_type",
        "ts", "event_id")
      .as[(Long, Long, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6)).toMap
    assert(got((1L, 1L)) === ("A", 0L, 2000000L, 2L))
    assert(got((1L, 2L)) === ("B", 2000000L, 3000000L, 1L))
    assert(got((1L, 3L)) === ("A", 3000000L, -1L, 1L)) // open run
    assert(got((2L, 1L)) === ("C", 0L, -1L, 1L))
    assert(got.size === 4)
  }

  test("kaplanMeier matches the textbook estimator; censoring shrinks risk only") {
    // classic 7-subject example: events at 6 (×2), 7, 13; censored at
    // 6, 10, 16 — S = 5/7, ×3/4, ×1/2
    val df = Seq((6L, 1L), (6L, 1L), (6L, 0L), (7L, 1L), (10L, 0L),
      (13L, 1L), (16L, 0L)).toDF("duration", "event")
    val got = EventOps.kaplanMeier(df, "duration", "event")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got === Seq((6L, 7L, 2L, 0.7143), (7L, 4L, 1L, 0.5357),
      (13L, 2L, 1L, 0.2679)))
  }

  test("kaplanMeier terminal row where everyone at risk converts hits S=0") {
    val df = Seq((1L, 1L), (2L, 1L), (2L, 1L)).toDF("duration", "event")
    val got = EventOps.kaplanMeier(df, "duration", "event")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, 3L, 1L, 0.6667), (2L, 2L, 2L, 0.0)))
  }

  test("timeWeightedAvg: duration-weighted mean; degenerate keys drop") {
    val df = Seq(
      (1L, 1L, ts(0), 10.0), (1L, 2L, ts(10), 20.0), (1L, 3L, ts(30), 0.0),
      (2L, 4L, ts(5), 99.0),                       // single event
      (3L, 5L, ts(7), 1.0), (3L, 6L, ts(7), 2.0))  // zero time span
      .toDF("user_id", "event_id", "ts", "value")
    val got = EventOps.timeWeightedAvg(df, "user_id", "ts", "value",
        orderCols = Seq($"event_id"))
      .as[(Long, Long, Double)].collect().toSeq
    // twap = (10·10s + 20·20s) / 30s = 16.6667; last value unweighted
    assert(got === Seq((1L, 3L, 16.6667)))
  }

  test("rfmSegments: hand-computed quartile codes on four customers") {
    val tx = Seq(
      (1L, "2020-01-09", 10.0), (1L, "2020-01-08", 20.0),
      (2L, "2020-01-05", 5.0),
      (3L, "2020-01-01", 100.0),
      (4L, "2020-01-07", 50.0), (4L, "2020-01-06", 1.0),
      (4L, "2020-01-02", 2.0))
      .toDF("cust", "d", "amount")
      .select($"cust", to_date($"d").as("d"), $"amount")
    val got = graft.ext.EventOps
      .rfmSegments(tx, "cust", "d", "amount", anchor = "2020-01-10")
      .orderBy($"rfm_code")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // rec [1,5,9,3] cuts (2.5,4,6); freq [2,1,1,3] cuts (1,1.5,2.25);
    // cents [3000,500,10000,5300] cuts (2375,4150,6475)
    // c1→(r4,f3,m2)=432  c2→(r2,f1,m1)=211  c3→(r1,f1,m4)=114
    // c4→(r3,f4,m3)=343
    assert(got === Seq(
      (114L, 1L, 10000L, 9.0), (211L, 1L, 500L, 5.0),
      (343L, 1L, 5300L, 3.0), (432L, 1L, 3000L, 1.0)))
  }

  test("topSequencePatterns: trigrams never cross users, ranked by count") {
    val ev = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "b"),
      (2L, 1L, "a"), (2L, 2L, "b"), (2L, 3L, "a"))
      .map { case (u, i, t) => (u, new Timestamp(i * 1000L), i, t) }
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = graft.ext.EventOps.topSequencePatterns(ev, "user_id", "ts",
        "event_type", k = 2, orderCols = Seq($"event_id"))
      .as[(String, String, String, Long)].collect().toSeq
    // u1 → aba, bab; u2 → aba; no trigram spans the user boundary
    assert(got === Seq(("a", "b", "a", 2L), ("b", "a", "b", 1L)))
  }

  test("rollingDistinctActives: window union, not sum; active-day anchors") {
    // u1 active d1,d2; u2 active d1 twice (dedup); u3 active d4 only.
    // d3 has NO activity → no output row even though the d1/d2 users'
    // windows cover it. wau(d2) = {u1,u2} (u1 counted once across the
    // window), wau(d4) = {u1,u2,u3} with windowDays=4.
    val ev = Seq(
      (1L, "2024-01-01"), (1L, "2024-01-02"),
      (2L, "2024-01-01"), (2L, "2024-01-01"),
      (3L, "2024-01-04"))
      .toDF("user_id", "d")
      .select($"user_id", to_date($"d").cast("timestamp").as("ts"))
    val got = graft.ext.EventOps
      .rollingDistinctActives(ev, "user_id", "ts", windowDays = 4)
      .orderBy($"day")
      .as[(java.sql.Date, Long, Long, Double)].collect().toSeq
      .map { case (d, a, w, s) => (d.toString, a, w, s) }
    assert(got === Seq(
      ("2024-01-01", 2L, 2L, 1.0),
      ("2024-01-02", 1L, 2L, 0.5),
      ("2024-01-04", 1L, 3L, 0.3333)))
  }
}
