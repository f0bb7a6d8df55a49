package graft

import java.sql.Timestamp

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
}
