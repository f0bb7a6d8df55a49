package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Relational
import graft.plans.AsOf

/** The native AS-OF operator (LogicalPlan + Strategy + SparkPlan) must
  * agree with the union+window formulation on every input.
  */
class AsOfJoinExecSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("plans through AsOfJoinExec with one exchange + sort per side") {
    val trades = Seq((1, ts("2024-01-01 09:15:00"), "t1")).toDF("k", "tts", "trade")
    val quotes = Seq((1, ts("2024-01-01 09:00:00"), 10.0)).toDF("k", "qts", "price")
    val out = AsOf.join(trades, quotes, Seq("k"), "tts", "qts",
      Seq(("price", "quote_price")))
    val plan = out.queryExecution.executedPlan.toString
    // nodeName strips the Exec suffix
    assert(plan.contains("AsOfJoin "), s"strategy not applied:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 2, plan)
    assert(out.select($"trade", $"quote_price").as[(String, Double)].head() ===
      (("t1", 10.0)))
  }

  test("hand-built cases: inclusive ties, no-match nulls, key isolation") {
    val quotes = Seq(
      (1, ts("2024-01-01 09:00:00"), 10.0),
      (1, ts("2024-01-01 09:30:00"), 11.0),
      (2, ts("2024-01-01 09:00:00"), 99.0)).toDF("k", "qts", "price")
    val trades = Seq(
      (1, ts("2024-01-01 09:15:00"), "t1"),
      (1, ts("2024-01-01 09:30:00"), "t2"),
      (1, ts("2024-01-01 08:00:00"), "t3"),
      (3, ts("2024-01-01 12:00:00"), "t4")).toDF("k", "tts", "trade")
    val out = AsOf.join(trades, quotes, Seq("k"), "tts", "qts",
        Seq(("price", "quote_price")))
      .select($"trade", $"quote_price")
      .as[(String, Option[Double])].collect().toMap
    assert(out === Map("t1" -> Some(10.0), "t2" -> Some(11.0),
      "t3" -> None, "t4" -> None))
  }

  test("tolerance bounds the lookback window") {
    val quotes = Seq(
      (1, ts("2024-01-01 08:00:00"), 9.0),  // 75 min before t1: too old
      (1, ts("2024-01-01 09:00:00"), 10.0)) // 15 min before t1: in window
      .toDF("k", "qts", "price")
    val trades = Seq(
      (1, ts("2024-01-01 09:15:00"), "t1"),
      (1, ts("2024-01-01 10:30:00"), "t2")) // 90 min after latest: null
      .toDF("k", "tts", "trade")
    val out = AsOf.join(trades, quotes, Seq("k"), "tts", "qts",
        Seq(("price", "quote_price")), toleranceMicros = 30L * 60 * 1000000)
      .select($"trade", $"quote_price")
      .as[(String, Option[Double])].collect().toMap
    assert(out === Map("t1" -> Some(10.0), "t2" -> None))
  }

  test("tolerance on a non-timestamp ts column fails fast at plan time") {
    // LONG ts: without the check the exec would silently compare raw longs
    // against a microsecond tolerance
    val quotes = Seq((1, 100L, 10.0)).toDF("k", "qts", "price")
    val trades = Seq((1, 200L, "t1")).toDF("k", "tts", "trade")
    val err = intercept[IllegalArgumentException] {
      AsOf.join(trades, quotes, Seq("k"), "tts", "qts",
        Seq(("price", "quote_price")), toleranceMicros = 1000000L)
    }
    assert(err.getMessage.contains("TIMESTAMP"))
    // no tolerance -> ordering-only semantics, any orderable ts type is fine
    val ok = AsOf.join(trades, quotes, Seq("k"), "tts", "qts",
      Seq(("price", "quote_price")))
    assert(ok.count() === 1L)
  }

  test("agrees with the union+window asofJoin on generated data") {
    val gen = Gen.listOfN(60, for {
      k <- Gen.choose(0, 4)
      t <- Gen.choose(0, 1000)
      v <- Gen.choose(0, 99)
    } yield (k, t, v))
    for (i <- 1 to 4) {
      val rowsL = gen(Gen.Parameters.default, Seed(i.toLong)).get
        .map { case (k, t, v) => (k, new java.sql.Timestamp(t * 1000L), s"L$v-$k-$t") }
        .distinctBy(r => (r._1, r._2))
      val rowsR = gen(Gen.Parameters.default, Seed((i + 100).toLong)).get
        .map { case (k, t, v) => (k, new java.sql.Timestamp(t * 1000L), v.toDouble) }
        .distinctBy(r => (r._1, r._2)) // as-of needs unique (key, ts) right
      val l = rowsL.toDF("k", "lts", "tag")
      val r = rowsR.toDF("k", "rts", "v")
      val native = AsOf.join(l, r, Seq("k"), "lts", "rts", Seq(("v", "rv")))
        .select($"tag", $"rv").as[(String, Option[Double])]
        .collect().sortBy(_._1).toSeq
      val window = Relational.asofJoin(l, r, Seq("k"), "lts", "rts",
          Seq(("v", "rv")))
        .select($"tag", $"rv").as[(String, Option[Double])]
        .collect().sortBy(_._1).toSeq
      // third, implementation-independent oracle: driver-side brute force
      val brute = rowsL.map { case (k, lts, tag) =>
        val m = rowsR.filter(rr => rr._1 == k && !rr._2.after(lts))
        (tag, if (m.isEmpty) None else Some(m.maxBy(_._2.getTime)._3))
      }.sortBy(_._1)
      assert(native === window, s"seed $i")
      assert(native === brute, s"seed $i vs brute force")
    }
  }

  test("forward: earliest right >= left, inclusive ties, shared candidate") {
    val quotes = Seq(
      (1, ts("2024-01-01 09:30:00"), 11.0),
      (1, ts("2024-01-01 10:00:00"), 12.0),
      (2, ts("2024-01-01 09:00:00"), 99.0)).toDF("k", "qts", "price")
    val trades = Seq(
      (1, ts("2024-01-01 09:00:00"), "t1"), // -> 09:30 (first >= 09:00)
      (1, ts("2024-01-01 09:15:00"), "t2"), // -> 09:30 (SHARED candidate)
      (1, ts("2024-01-01 09:30:00"), "t3"), // -> 09:30 (inclusive tie)
      (1, ts("2024-01-01 10:30:00"), "t4"), // -> none (past last quote)
      (3, ts("2024-01-01 09:00:00"), "t5")).toDF("k", "tts", "trade")
    val out = AsOf.join(trades, quotes, Seq("k"), "tts", "qts",
        Seq(("price", "quote_price")), forward = true)
      .select($"trade", $"quote_price")
      .as[(String, Option[Double])].collect().toMap
    assert(out === Map("t1" -> Some(11.0), "t2" -> Some(11.0),
      "t3" -> Some(11.0), "t4" -> None, "t5" -> None))
  }

  test("forward tolerance bounds the lookahead window") {
    val quotes = Seq(
      (1, ts("2024-01-01 10:30:00"), 12.0)).toDF("k", "qts", "price")
    val trades = Seq(
      (1, ts("2024-01-01 10:15:00"), "t1"), // 15 min before: in window
      (1, ts("2024-01-01 09:00:00"), "t2")) // 90 min before: too early
      .toDF("k", "tts", "trade")
    val out = AsOf.join(trades, quotes, Seq("k"), "tts", "qts",
        Seq(("price", "quote_price")), toleranceMicros = 30L * 60 * 1000000,
        forward = true)
      .select($"trade", $"quote_price")
      .as[(String, Option[Double])].collect().toMap
    assert(out === Map("t1" -> Some(12.0), "t2" -> None))
  }

  test("forward agrees with driver-side brute force on generated data") {
    val gen = Gen.listOfN(60, for {
      k <- Gen.choose(0, 4)
      t <- Gen.choose(0, 1000)
      v <- Gen.choose(0, 99)
    } yield (k, t, v))
    for (i <- 1 to 4) {
      val rowsL = gen(Gen.Parameters.default, Seed(i.toLong)).get
        .map { case (k, t, v) => (k, new java.sql.Timestamp(t * 1000L), s"L$v-$k-$t") }
        .distinctBy(r => (r._1, r._2))
      val rowsR = gen(Gen.Parameters.default, Seed((i + 100).toLong)).get
        .map { case (k, t, v) => (k, new java.sql.Timestamp(t * 1000L), v.toDouble) }
        .distinctBy(r => (r._1, r._2))
      val l = rowsL.toDF("k", "lts", "tag")
      val r = rowsR.toDF("k", "rts", "v")
      val native = AsOf.join(l, r, Seq("k"), "lts", "rts", Seq(("v", "rv")),
          forward = true)
        .select($"tag", $"rv").as[(String, Option[Double])]
        .collect().sortBy(_._1).toSeq
      val brute = rowsL.map { case (k, lts, tag) =>
        val m = rowsR.filter(rr => rr._1 == k && !rr._2.before(lts))
        (tag, if (m.isEmpty) None else Some(m.minBy(_._2.getTime)._3))
      }.sortBy(_._1)
      assert(native === brute, s"seed $i vs brute force")
    }
  }
}
