package graft

import org.apache.spark.sql.functions._
import graft.ext.TextOps
import graft.functions.ShingleHashes

class ShingleHashesSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b", // fewer tokens than the shingle size
    "  leading space", // split() keeps a leading empty token
    "repeat repeat repeat repeat repeat", // duplicate shingles collapse
    "UPPER Case TeXT mixes").toDF("text")

  test("bit-identical to the column-algebra shingle+xxhash64 pipeline") {
    val native = docs
      .select(ShingleHashes($"text", 3).as("h")).as[Seq[Long]].collect()
    val algebra = docs
      .withColumn("toks", TextOps.tokens($"text"))
      .withColumn("sh", TextOps.shinglesFromTokens($"toks", 3))
      .select(transform($"sh", s => xxhash64(s)).as("h"))
      .as[Seq[Long]].collect()
    assert(native.toSeq === algebra.toSeq)
  }

  test("null text yields null, not a crash") {
    val out = Seq[(Integer, String)]((1, null)).toDF("id", "text")
      .select(ShingleHashes($"text", 3).as("h")).collect()
    assert(out.head.isNullAt(0))
  }

  test("registered as SQL function shingle_hashes via GraftExtensions") {
    docs.createOrReplaceTempView("sh_docs")
    val viaSql = spark.sql(
      "SELECT shingle_hashes(text, 3) AS h FROM sh_docs").as[Seq[Long]].collect()
    val viaColumn = docs.select(ShingleHashes($"text", 3).as("h"))
      .as[Seq[Long]].collect()
    assert(viaSql.toSeq === viaColumn.toSeq)
  }

  test("MinHashSignature equals the staged ShingleHashes composition") {
    val fused = docs
      .select(graft.functions.MinHashSignature($"text", 3, 16).as("sig"))
      .as[Seq[Long]].collect()
    val staged = graft.ext.Dedup.minhashSignatureFromHashes(
        docs.select(ShingleHashes($"text", 3).as("sh")), 16)
      .select($"sig").as[Seq[Long]].collect()
    assert(fused.toSeq === staged.toSeq)
  }

  test("SimHash64 equals the 64-aggregate column-algebra simhash") {
    val native = docs
      .select(graft.functions.SimHash64($"text").as("s")).as[Long].collect()
    val algebra = docs
      .withColumn("toks", TextOps.tokens($"text"))
      .withColumn("hs", transform($"toks", t => xxhash64(t)))
      .select(graft.ext.Dedup.simhashFromHashes($"hs").as("s"))
      .as[Long].collect()
    assert(native.toSeq === algebra.toSeq)
  }

  test("SimHash64 registered as a SQL function") {
    docs.createOrReplaceTempView("sh_docs2")
    val viaSql = spark.sql("SELECT simhash64(text) AS s FROM sh_docs2")
      .as[Long].collect()
    val viaColumn = docs.select(graft.functions.SimHash64($"text").as("s"))
      .as[Long].collect()
    assert(viaSql.toSeq === viaColumn.toSeq)
  }

  test("VectorDot is bit-identical to the zip_with+aggregate algebra") {
    val vecs = Seq(
      (Seq(1.5f, -2.25f, 3.125f), Seq(0.5f, 4.75f, -1.375f)),
      (Seq(0f, 0f, 0f), Seq(1f, 2f, 3f)),
      (Seq(0.1f, 0.2f, 0.3f), Seq(0.3f, 0.2f, 0.1f))).toDF("a", "b")
    val native = vecs
      .select(graft.ext.Similarity.dot($"a", $"b").as("d")).as[Double].collect()
    val algebra = vecs
      .select(graft.ext.Similarity.dotAlgebra($"a", $"b").as("d"))
      .as[Double].collect()
    assert(native.toSeq === algebra.toSeq) // exact, not approximate
  }

  test("vector_dot registered as a SQL function") {
    val got = spark.sql(
      "SELECT vector_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d")
      .as[Double].head()
    assert(got === 11.0)
  }

  test("participates in whole-stage codegen") {
    // a local relation would be folded by ConvertToLocalRelation; use a
    // file scan so the projection actually compiles
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .select(ShingleHashes($"text", 3).as("h"))
    // the "*(n)" prefix is the WholeStageCodegen stage marker
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project [shingle_hashes"), s"no codegen span:\n$p")
    assert(df.count() > 0)
  }
}
