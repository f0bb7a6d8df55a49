package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Relational

/** Property-based invariants (SURVEY.md §5.2), sampled from ScalaCheck
  * generators with fixed seeds (the scalatest-scalacheck bridge is not
  * on the offline classpath, so sampling is driven directly).
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val rowsGen: Gen[List[(Int, Int, Double)]] =
    Gen.listOfN(40, for {
      u <- Gen.choose(0, 5)
      i <- Gen.choose(0, 5)
      r <- Gen.choose(0, 100).map(_ / 10.0)
    } yield (u, i, r))

  test("union row-count arithmetic: |a union-all b| = |a| + |b|") {
    for (Seq(a, b) <- samples(rowsGen, 6).grouped(2)) {
      val (da, db) = (a.toDF("u", "i", "r"), b.toDF("u", "i", "r"))
      assert(Relational.unionAll(Seq(da, db)).count() === a.size + b.size)
    }
  }

  test("dedup idempotence and key-uniqueness") {
    for (rows <- samples(rowsGen, 4)) {
      val df = rows.toDF("u", "i", "r")
      val once = Relational.dedupFirst(df, Seq("u", "i"), Seq($"r", $"u"))
      val twice = Relational.dedupFirst(once, Seq("u", "i"), Seq($"r", $"u"))
      assert(once.count() === twice.count())
      assert(once.count() === rows.map(t => (t._1, t._2)).distinct.size)
    }
  }

  test("group average stays within group min/max") {
    for (rows <- samples(rowsGen, 4)) {
      val avgs = Relational.avgBy(rows.toDF("u", "i", "r"), "i", "r", "m")
        .as[(Int, Double)].collect().toMap
      rows.groupBy(_._2).foreach { case (i, grp) =>
        val vals = grp.map(_._3)
        assert(avgs(i) >= vals.min - 1e-9 && avgs(i) <= vals.max + 1e-9)
      }
    }
  }

  test("topK equals the k-prefix of the full sort") {
    for ((rows, k) <- samples(rowsGen, 4).zip(Seq(1, 3, 5, 10))) {
      val df = rows.toDF("u", "i", "r")
      val top = Relational.topK(df, k, $"r".desc, $"u", $"i")
        .as[(Int, Int, Double)].collect().toSeq
      val full = rows.sortBy(t => (-t._3, t._1, t._2)).take(k)
      assert(top === full)
    }
  }

  test("TopKAggregator matches sort-take; merge of any split = whole") {
    val xsGen = Gen.listOfN(30, Gen.choose(-1000, 1000).map(_ / 7.0))
    for ((xs, k) <- samples(xsGen, 8).zip(Seq(1, 2, 3, 4, 5, 6, 7, 8))) {
      val agg = graft.functions.TopKAggregator(k)
      val viaAgg = xs.foldLeft(agg.zero)(agg.reduce)
      assert(viaAgg === xs.sorted(Ordering[Double].reverse).take(k))
      val (l, r) = xs.splitAt(xs.size / 2)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(merged === viaAgg)
    }
  }

  test("null-profile count equals the exact missing-row count") {
    val gen = Gen.listOfN(20, Gen.option(Gen.oneOf("a", "", "None", "Unknown")))
    for (rows <- samples(gen, 5) if rows.nonEmpty) {
      val df = rows.map(v => Tuple1(v.orNull)).toDF("c")
      val n = graft.operators.Profile.nullProfile(df).head().getLong(0)
      val expected = rows.count(v =>
        v.isEmpty || v.exists(s => s.isEmpty || s == "None" || s == "Unknown"))
      assert(n === expected)
    }
  }

  private val intervalsGen: Gen[List[(Int, Long, Long)]] =
    Gen.listOfN(30, for {
      k <- Gen.choose(0, 2)
      s <- Gen.choose(0L, 60L)
      len <- Gen.choose(1L, 15L)
    } yield (k, s, s + len))

  test("mergeIntervals: islands are disjoint with gaps, cover the " +
    "input union exactly, and merge counts add up") {
    for (iv <- samples(intervalsGen, 5)) {
      val got = graft.ext.EventOps.mergeIntervals(
          iv.toDF("k", "s", "e"), "k", "s", "e")
        .as[(Int, Long, Long, Long, Long)].collect()
      iv.groupBy(_._1).foreach { case (k, grp) =>
        val islands = got.filter(_._1 == k).sortBy(_._2)
        // counts partition the inputs
        assert(islands.map(_._5).sum === grp.size)
        // strictly separated: next start > previous end (touch merges)
        islands.sliding(2).foreach {
          case Array(a, b) => assert(b._3 > a._4)
          case _ =>
        }
        // exact coverage: every covered point is in an island and
        // island bounds are realized by inputs
        val covered = grp.flatMap(t => t._2 until t._3).toSet
        val islandPoints = islands.flatMap(i => i._3 until i._4).toSet
        assert(covered === islandPoints)
      }
    }
  }

  private val eventsGen: Gen[List[(Int, Long)]] =
    Gen.listOfN(40, for {
      u <- Gen.choose(0, 3)
      t <- Gen.choose(0L, 500L)
    } yield (u, t))

  test("sessionize matches a sequential reference model: session " +
    "count, sizes, and durations per user") {
    for (ev0 <- samples(eventsGen, 5)) {
      val ev = ev0.zipWithIndex.map { case ((u, t), i) =>
        (u.toLong, (i + 1).toLong, new java.sql.Timestamp(t * 1000L))
      }
      val got = graft.ext.EventOps.sessionize(
          ev.toDF("user_id", "event_id", "ts"),
          "user_id", "ts", "event_id", gapMinutes = 1)
        .as[(Long, Long, Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(s => (s._3, s._4)))
      // sequential reference: split each user's sorted seconds at >60s
      ev.groupBy(_._1).foreach { case (u, grp) =>
        val times = grp.map(_._3.getTime / 1000L).sorted
        val sessions = times.tail.foldLeft(List(List(times.head))) {
          case (cur :: done, t) =>
            if (t - cur.head > 60L) List(t) :: cur :: done
            else (t :: cur) :: done
          case (Nil, _) => Nil
        }.reverse.map(_.reverse)
        val expect = sessions.map(s =>
          (s.size.toLong, (s.last - s.head) * 1000000L))
        assert(got(u).toSeq === expect,
          s"user $u: got ${got(u).toSeq}, expect $expect")
      }
    }
  }
}
