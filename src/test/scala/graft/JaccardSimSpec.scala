package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{JaccardSim, ShingleHashes}

/** Pins the native [[graft.functions.JaccardSim]] hash-probe loop to the
  * `size(array_intersect)/size(array_union)` algebra it replaces in the
  * MinHash verification join (the VectorDot codegen≡algebra pattern).
  */
class JaccardSimSpec extends SparkTestBase {
  import spark.implicits._

  private def algebra = (a: org.apache.spark.sql.Column,
                         b: org.apache.spark.sql.Column) =>
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  test("equals the intersect/union algebra on generated long arrays") {
    val gen = Gen.listOfN(200, for {
      na <- Gen.choose(1, 30)
      nb <- Gen.choose(1, 30)
      // small value domain forces overlaps, duplicates, and zeros
      a <- Gen.listOfN(na, Gen.choose(-5L, 15L))
      b <- Gen.listOfN(nb, Gen.choose(-5L, 15L))
    } yield (a, b))
    val rows = gen(Gen.Parameters.default, Seed(7L)).get
    val out = rows.toDF("a", "b")
      .select(JaccardSim($"a", $"b").as("native"),
        algebra($"a", $"b").as("alg"))
      .as[(Double, Double)].collect()
    out.foreach { case (n, al) =>
      assert(math.abs(n - al) < 1e-12, s"native=$n algebra=$al")
    }
  }

  test("documented divergence: two empty inputs → 0.0 where the algebra fails") {
    // the one edge where native ≠ algebra, by design (primitive-double
    // codegen): 0/0 in the algebra is NULL under non-ANSI SQL and a
    // DIVIDE_BY_ZERO error under the session's ANSI mode — the native
    // form returns a total 0.0 either way, and any >= threshold filter
    // treats all three outcomes identically. Pinned here so the
    // divergence stays documented-and-tested, not latent
    val bothEmpty = Seq((Seq.empty[Long], Seq.empty[Long])).toDF("a", "b")
    assert(bothEmpty.select(JaccardSim($"a", $"b")).head().getDouble(0) === 0.0)
    val e = intercept[Exception] {
      bothEmpty.select(algebra($"a", $"b")).collect()
    }
    assert(e.getMessage.contains("DIVIDE_BY_ZERO"), e.getMessage)
    // one-empty: both forms agree on 0.0 (0/n is well-defined)
    val out = Seq((Seq.empty[Long], Seq(1L, 2L)), (Seq(3L), Seq.empty[Long]))
      .toDF("a", "b")
      .select(JaccardSim($"a", $"b").as("native"), algebra($"a", $"b").as("alg"))
      .collect()
    out.foreach { r =>
      assert(r.getDouble(0) === 0.0 && r.getDouble(1) === 0.0)
    }
  }

  test("equals the algebra over real shingle hashes from the file scan") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), ShingleHashes(col("text"), 3).as("sh"))
    val pairs = docs.as("x").join(docs.as("y"),
        col("x.doc_id") < col("y.doc_id") && col("x.doc_id") < 10 &&
          col("y.doc_id") < 20)
      .select(col("x.sh").as("sh_a"), col("y.sh").as("sh_b"))
    val mismatches = pairs
      .select(JaccardSim($"sh_a", $"sh_b").as("native"),
        algebra($"sh_a", $"sh_b").as("alg"))
      .filter(abs($"native" - $"alg") > 1e-12)
      .count()
    assert(mismatches === 0L)
  }

  test("identical sets score 1, disjoint sets 0; SQL function registered") {
    val r = Seq((Seq(1L, 2L, 3L), Seq(3L, 1L, 2L), Seq(9L, 10L)))
      .toDF("a", "b", "c")
      .select(JaccardSim($"a", $"b").as("same"),
        JaccardSim($"a", $"c").as("disjoint"))
      .as[(Double, Double)].head()
    assert(r === ((1.0, 0.0)))
    val viaSql = spark.sql(
      "SELECT jaccard_sim(array(1L, 2L), array(2L, 3L)) AS j")
      .as[Double].head()
    assert(math.abs(viaSql - 1.0 / 3.0) < 1e-12)
  }
}
