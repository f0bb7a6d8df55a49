package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Scored, TopKScoredAggregator}

/** Property-pins the k-bounded buffer algebra of
  * [[graft.functions.TopKScoredAggregator]] against the obvious
  * sort-take-k reference. The aggregator is the ranking stage of
  * q33/q47 (kNN / IVF search); its PARTIAL mode means `reduce` and
  * `merge` run in arbitrary interleavings across map tasks, so the
  * properties that matter are exactly "any split of the input through
  * reduce/merge equals sorting the whole input".
  */
class TopKScoredSpec extends AnyFunSuite {

  private def ord: Ordering[Scored] = Ordering.by(s => (-s.score, s.id))

  private def reference(xs: Seq[Scored], k: Int): Seq[Scored] =
    xs.sorted(ord).take(k)

  private def genRows(n: Int): Gen[List[Scored]] =
    Gen.listOfN(n, for {
      // small score domain forces ties (resolved by id); ids unique-ish
      s <- Gen.choose(0, 5)
      id <- Gen.choose(0L, 1000L)
    } yield Scored(s / 2.0, id))

  test("reduce over any input order equals sort-take-k") {
    val cases = Gen.listOfN(50, for {
      n <- Gen.choose(0, 60)
      k <- Gen.choose(1, 12)
      rows <- genRows(n)
    } yield (k, rows))(Gen.Parameters.default, Seed(11L)).get
    cases.foreach { case (k, rows) =>
      val agg = TopKScoredAggregator(k)
      val got = rows.foldLeft(agg.zero)(agg.reduce)
      assert(got === reference(rows, k), s"k=$k rows=$rows")
    }
  }

  test("merge of independently reduced splits equals global sort-take-k") {
    val cases = Gen.listOfN(50, for {
      n <- Gen.choose(0, 80)
      k <- Gen.choose(1, 10)
      split <- Gen.choose(0, n)
      rows <- genRows(n)
    } yield (k, split, rows))(Gen.Parameters.default, Seed(23L)).get
    cases.foreach { case (k, split, rows) =>
      val agg = TopKScoredAggregator(k)
      val (a, b) = rows.splitAt(split)
      val left = a.foldLeft(agg.zero)(agg.reduce)
      val right = b.foldLeft(agg.zero)(agg.reduce)
      // merge must be symmetric and match the unsplit result
      assert(agg.merge(left, right) === reference(rows, k))
      assert(agg.merge(right, left) === reference(rows, k))
      // buffers never exceed k (the map-side boundedness the plan relies on)
      assert(left.size <= k && right.size <= k)
    }
  }

  test("ties on score rank by ascending id, deterministically") {
    val agg = TopKScoredAggregator(3)
    val rows = Seq(Scored(1.0, 9), Scored(1.0, 2), Scored(1.0, 5), Scored(0.5, 1))
    val got = rows.foldLeft(agg.zero)(agg.reduce)
    assert(got === Seq(Scored(1.0, 2), Scored(1.0, 5), Scored(1.0, 9)))
  }
}
