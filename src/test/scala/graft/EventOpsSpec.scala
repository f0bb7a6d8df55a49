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
}
