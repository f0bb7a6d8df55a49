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
