package graft

import org.apache.spark.sql.functions._
import graft.ext.Retrieval

class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark spark spark runs fast"),     // tf(spark)=3, len 5
    (2L, "spark is a query engine"),         // tf(spark)=1, len 5
    (3L, "ducks swim on the pond"),          // no hit
    (4L, "spark spark query engine engine engine word word word word")) // len 10
    .toDF("doc_id", "text")

  test("bm25 matches the hand-computed Robertson formula") {
    val got = Retrieval.bm25(docs, "doc_id", "text", Seq("spark"), k = 4)
      .as[(Long, Double)].collect().toMap
    // N=4, df=3, avgdl=6.25 ⇒ idf = ln((4-3+0.5)/(3+0.5)+1)
    val idf = math.log((4 - 3 + 0.5) / (3 + 0.5) + 1)
    def s(tf: Double, len: Double) =
      math.round((idf * tf * (1.2 + 1) /
        (tf + 1.2 * ((1 - 0.75) + 0.75 * len / 6.25)) + 1e-9) * 1e4) / 1e4
    assert(got(1L) === s(3, 5))
    assert(got(2L) === s(1, 5))
    assert(got(3L) === 0.0)
    assert(got(4L) === s(2, 10))
    // saturation + length normalization: tf=3 beats tf=1 at equal
    // length, but a long doc's tf=2 scores below a short doc's tf=3
    assert(got(1L) > got(4L) && got(4L) > got(2L) && got(2L) > got(3L))
  }

  test("multi-term scores add per-term contributions") {
    val one = Retrieval.bm25(docs, "doc_id", "text", Seq("spark"), k = 4)
      .as[(Long, Double)].collect().toMap
    val other = Retrieval.bm25(docs, "doc_id", "text", Seq("engine"), k = 4)
      .as[(Long, Double)].collect().toMap
    val both = Retrieval.bm25(docs, "doc_id", "text",
      Seq("spark", "engine"), k = 4).as[(Long, Double)].collect().toMap
    docs.select($"doc_id").as[Long].collect().foreach { id =>
      assert(math.abs(both(id) - (one(id) + other(id))) <= 1e-4,
        s"doc $id: ${both(id)} vs ${one(id)} + ${other(id)}")
    }
  }

  test("ranking is a global top-k (TakeOrderedAndProject), one 1-row agg") {
    // write to parquet first: literal local relations constant-fold,
    // which would hide the real plan shape
    val dir = java.nio.file.Files.createTempDirectory("bm25plan").toString
    docs.write.mode("overwrite").parquet(dir)
    val plan = Retrieval.bm25(spark.read.parquet(dir), "doc_id", "text",
      Seq("spark", "engine"), k = 2).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected top-k fusion, no global sort:\n$plan")
    assert(!plan.contains("Window"), s"no window allowed in bm25:\n$plan")
  }

  test("hybridRrf fuses ranks, handles single-list docs, breaks ties by id") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)),     // cos 1.0 → dense rank 1
      (2L, Array(0.9f, 0.1f)),     // cos ~0.994 → dense rank 3
      (3L, Array(0.95f, 0.05f)),   // cos ~0.999 → dense rank 2
      (4L, Array(0.5f, 0.5f)))     // cos ~0.707 → cut at candidates=3
      .toDF("vec_id", "embedding")
    val qv = Seq(Tuple1(Array(1.0f, 0.0f))).toDF("q_vec")
    // lex (terms=spark): 1 → rank 1, 4 → rank 2, 2 → rank 3; so doc 4
    // is lex-only and doc 3 dense-only (null rank on the other side)
    val got = Retrieval.hybridRrf(docs, emb, qv, "doc_id", "text",
        "vec_id", "embedding", Seq("spark"), candidates = 3, k = 4)
      .orderBy($"rrf".desc, $"doc_id")
      .as[(Long, Option[Long], Option[Long], Double)].collect()
    def rrf(l: Option[Int], d: Option[Int]): Double =
      math.round((l.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        d.map(r => 1.0 / (60 + r)).getOrElse(0.0) + 1e-9) * 1e6) / 1e6
    // doc3 (dense 2 only) and doc4 (lex 2 only) fuse to the IDENTICAL
    // score — id ascending breaks the tie
    assert(got.toSeq === Seq(
      (1L, Some(1L), Some(1L), rrf(Some(1), Some(1))),
      (2L, Some(3L), Some(3L), rrf(Some(3), Some(3))),
      (3L, None, Some(2L), rrf(None, Some(2))),
      (4L, Some(2L), None, rrf(Some(2), None))))
  }

  test("rankingMetrics: hand-computed P@k, MRR, NDCG; zero-relevant query") {
    val ranked = Seq(
      (1L, 1L, 1L), (1L, 2L, 0L), (1L, 3L, 1L), (1L, 4L, 0L),
      (2L, 1L, 0L), (2L, 2L, 0L), (2L, 3L, 0L), (2L, 4L, 1L),
      (3L, 1L, 0L), (3L, 2L, 0L), (3L, 3L, 0L), (3L, 4L, 0L))
      .toDF("query_id", "rank", "rel")
    val got = Retrieval.rankingMetrics(ranked, "query_id", "rank", "rel",
        k = 4)
      .as[(Long, Long, Double, Double, Double)].collect()
      .sortBy(_._1).toSeq
    def lg2(x: Double) = math.log(x) / math.log(2.0)
    def r4(x: Double) = math.round((x + 1e-9) * 1e4) / 1e4
    // q1: dcg = 1/log2(2) + 1/log2(4) = 1.5; idcg = 1 + 1/log2(3)
    val ndcg1 = r4(1.5 / (1.0 + 1.0 / lg2(3.0)))
    val ndcg2 = r4(1.0 / lg2(5.0) / 1.0)
    assert(got === Seq(
      (1L, 2L, 0.5, 1.0, ndcg1),
      (2L, 1L, 0.25, 0.25, ndcg2),
      (3L, 0L, 0.0, 0.0, 0.0)))
  }

  test("calibrationBins: hand-computed bins, pred=1.0 clamps into last bin") {
    val scored = Seq((0.05, 0), (0.05, 1), (0.95, 1), (1.0, 1), (0.5, 0))
      .toDF("pred", "label")
    val got = graft.ext.Retrieval.calibrationBins(scored, "pred", "label")
      .orderBy($"bin").as[(Long, Long, Double, Double, Double)]
      .collect().toSeq
    assert(got === Seq(
      (0L, 2L, 0.05, 0.5, 0.45),
      (5L, 1L, 0.5, 0.0, 0.5),
      (9L, 2L, 0.975, 1.0, 0.025)))
  }
}
