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

  // reference order = the row_number window the aggregator replaces:
  // score DESC with Spark's NaN-greatest semantics (Double.compare), id ASC
  private def ord: Ordering[Scored] = new Ordering[Scored] {
    def compare(a: Scored, b: Scored): Int = {
      val c = java.lang.Double.compare(b.score, a.score)
      if (c != 0) c else java.lang.Long.compare(a.id, b.id)
    }
  }

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

  test("NaN scores rank FIRST, matching the desc window they replace") {
    // zero-norm vectors make cosine 0/0 = NaN; Spark's ORDER BY ... DESC
    // puts NaN before every finite value, so the k-bounded aggregate
    // must too — in reduce (either insertion order) and through merge
    val agg = TopKScoredAggregator(2)
    val rows = Seq(Scored(5.0, 1), Scored(Double.NaN, 2), Scored(7.0, 3))
    val expected = Seq(Scored(Double.NaN, 2), Scored(7.0, 3))
    def same(a: Seq[Scored], b: Seq[Scored]): Boolean =
      a.length == b.length && a.zip(b).forall { case (x, y) =>
        x.id == y.id && (x.score == y.score ||
          (x.score.isNaN && y.score.isNaN))
      }
    assert(same(rows.foldLeft(agg.zero)(agg.reduce), expected))
    assert(same(rows.reverse.foldLeft(agg.zero)(agg.reduce), expected))
    val left = rows.take(1).foldLeft(agg.zero)(agg.reduce)
    val right = rows.drop(1).foldLeft(agg.zero)(agg.reduce)
    assert(same(agg.merge(left, right), expected))
  }
}
