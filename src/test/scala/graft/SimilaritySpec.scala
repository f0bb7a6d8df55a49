package graft

import org.apache.spark.sql.functions._
import graft.ext.Similarity

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private def vecs(rows: (Int, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("dot / l2Norm / cosine match hand-computed values") {
    val df = vecs(1 -> Seq(1f, 2f, 3f))
      .crossJoin(vecs(2 -> Seq(4f, 5f, 6f)).select($"embedding".as("b")))
    val r = df.select(
      Similarity.dot($"embedding", $"b").as("dot"),
      Similarity.l2Norm($"embedding").as("norm"),
      Similarity.cosine($"embedding", $"b").as("cos")).head()
    assert(r.getDouble(0) === 32.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(14.0)) < 1e-9)
    assert(math.abs(r.getDouble(2) -
      32.0 / (math.sqrt(14.0) * math.sqrt(77.0))) < 1e-9)
  }

  test("bruteForceKnn ranks by cosine and broadcasts the query side") {
    val corpus = vecs(
      1 -> Seq(1f, 0f), 2 -> Seq(0.9f, 0.1f), 3 -> Seq(0f, 1f), 4 -> Seq(-1f, 0f))
    val knn = Similarity.bruteForceKnn(corpus, corpus.filter($"vec_id" === 1), 3)
    val got = knn.orderBy($"rank")
      .select($"neighbor_id", $"rank").as[(Int, Long)].collect().toSeq
    assert(got === Seq((2, 1L), (3, 2L), (4, 3L)))
    val plan = knn.queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"expected broadcast of queries:\n$plan")
  }

  test("adaptivePlanes: floor below the knee, +1 plane per corpus " +
    "doubling above, capped at 62") {
    import graft.ext.Similarity.adaptivePlanes
    // below the knee (n <= target * 2^floor) the floor wins
    assert(adaptivePlanes(0L, 4, 128) === 4)
    assert(adaptivePlanes(500L, 4, 128) === 4)
    assert(adaptivePlanes(2048L, 4, 128) === 4) // exactly at the knee
    // above it: smallest p with n / 2^p <= target
    assert(adaptivePlanes(2049L, 4, 128) === 5)
    assert(adaptivePlanes(32050L, 4, 128) === 8) // the grown-rung pin
    assert(adaptivePlanes(200000L, 4, 128) === 11) // the 100x corpus
    // signed-long ceiling regardless of n
    assert(adaptivePlanes(Long.MaxValue, 4, 1) === 62)
  }

  test("lshNearNeighbors finds identical vectors (cos 1) in one bucket") {
    val df = vecs(1 -> Seq(1f, 2f, 3f), 2 -> Seq(1f, 2f, 3f), 3 -> Seq(-3f, 1f, -2f))
    val out = Similarity.lshNearNeighbors(df, threshold = 0.9, planes = 4)
      .select($"id_a", $"id_b").as[(Int, Int)].collect().toSet
    assert(out.contains((1, 2)))
    assert(!out.exists(p => p._1 == 3 || p._2 == 3))
  }

  test("ivfSearch ranks only vectors from the probed cells") {
    val corpus = vecs(
      1 -> Seq(1f, 0f), 2 -> Seq(0.95f, 0.05f), 3 -> Seq(0.9f, 0.1f),
      4 -> Seq(0f, 1f), 5 -> Seq(0.05f, 0.95f))
    val centroids = vecs(10 -> Seq(1f, 0f), 20 -> Seq(0f, 1f))
      .select($"vec_id".as("centroid_id"), $"embedding".as("centroid"))
    val got = Similarity.ivfSearch(corpus, centroids,
        corpus.filter($"vec_id" === 1), nprobe = 1, k = 10)
      .select($"neighbor_id").as[Int].collect().toSet
    // with one probe, only the (1,0)-cell vectors are candidates
    assert(got === Set(2, 3))
  }

  test("kmeansStep recovers blob means and iterating converges") {
    // two tight blobs around (1,0) and (0,1); start from two members, not
    // the true means — one step must land near the blob means, and a
    // second step must be a (near) fixed point
    val blobs = vecs(
      1 -> Seq(1f, 0.1f), 2 -> Seq(1f, -0.1f), 3 -> Seq(0.9f, 0f),
      4 -> Seq(0.1f, 1f), 5 -> Seq(-0.1f, 1f), 6 -> Seq(0f, 0.9f))
    def centFrame(rows: Seq[(Long, Seq[Double])]) = rows
      .toDF("centroid_id", "centroid")
    var cents = blobs.filter($"vec_id".isin(1, 4))
      .select($"vec_id".cast("long").as("centroid_id"),
        transform($"embedding", x => x.cast("double")).as("centroid"))
    for (_ <- 1 to 2) {
      // the k-row collect is the caller's loop, not library code
      val next = Similarity.kmeansStep(blobs, cents)
        .select($"centroid_id", $"centroid")
        .as[(Long, Seq[Double])].collect().toSeq
      assert(next.size === 2)
      cents = centFrame(next)
    }
    val got = cents.as[(Long, Seq[Double])].collect().toMap
    val c1 = got(1)
    val c4 = got(4)
    // blob means: ((1+1+0.9)/3, 0) and ((0.1-0.1+0)/3, (1+1+0.9)/3)
    assert(math.abs(c1(0) - 2.9 / 3) < 1e-6 && math.abs(c1(1)) < 1e-6, c1)
    assert(math.abs(c4(0)) < 1e-6 && math.abs(c4(1) - 2.9 / 3) < 1e-6, c4)
  }

  test("kmeans loops to a fixpoint; within-cluster cosine never degrades") {
    val blobs = vecs(
      1 -> Seq(1f, 0.1f), 2 -> Seq(1f, -0.1f), 3 -> Seq(0.9f, 0f),
      4 -> Seq(0.1f, 1f), 5 -> Seq(-0.1f, 1f), 6 -> Seq(0f, 0.9f))
    // deliberately poor init: both seeds inside the x-blob, so the loop
    // has real work to do before the y-blob gets its own centroid
    val init = vecs(10 -> Seq(1f, 0.1f), 20 -> Seq(0.9f, 0f))
      .select($"vec_id".cast("long").as("centroid_id"),
        transform($"embedding", x => x.cast("double")).as("centroid"))
    // mean best-centroid cosine (unrounded — ivfAssign's 4-dp display
    // rounding would mask sub-1e-4 movement)
    def quality(cents: org.apache.spark.sql.DataFrame): Double =
      blobs.join(broadcast(cents))
        .withColumn("c", Similarity.cosine($"embedding", $"centroid"))
        .groupBy($"vec_id").agg(max($"c").as("best"))
        .agg(avg($"best")).head().getDouble(0)

    var cur = init
    var prevQ = quality(cur)
    for (_ <- 1 to 3) {
      cur = Similarity.kmeansStep(blobs, cur)
        .select($"centroid_id", $"centroid")
      val q = quality(cur)
      assert(q >= prevQ - 1e-9, s"quality degraded: $q < $prevQ")
      prevQ = q
    }

    val fix = Similarity.kmeans(blobs, init, maxIter = 10, eps = 1e-9)
    // a fixpoint means one more step moves nothing
    val before = fix.as[(Long, Seq[Double])].collect().toMap
    val after = Similarity.kmeansStep(blobs, fix)
      .select($"centroid_id", $"centroid")
      .as[(Long, Seq[Double])].collect().toMap
    assert(before.keySet === after.keySet)
    before.foreach { case (id, v) =>
      v.zip(after(id)).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"centroid $id still moving")
      }
    }
    // and the fixpoint actually separated the blobs
    assert(quality(fix) > 0.99, s"blobs not separated: ${quality(fix)}")
  }

  test("kmeansStep member counts match ivfAssign on the same centroids") {
    val df = vecs(1 -> Seq(1f, 0f), 2 -> Seq(0f, 1f), 3 -> Seq(0.9f, 0.05f))
    val centroids = vecs(10 -> Seq(1f, 0f), 20 -> Seq(0f, 1f))
      .select($"vec_id".as("centroid_id"), $"embedding".as("centroid"))
    val stepCounts = Similarity.kmeansStep(df, centroids)
      .select($"centroid_id", $"n_members").as[(Int, Long)].collect().toMap
    val asgCounts = Similarity.ivfAssign(df, centroids)
      .groupBy($"centroid_id").count().as[(Int, Long)].collect().toMap
    assert(stepCounts === asgCounts)
  }

  test("ivfAssign assigns each vector to its own centroid when present") {
    val df = vecs(1 -> Seq(1f, 0f), 2 -> Seq(0f, 1f), 3 -> Seq(0.9f, 0.05f))
    val centroids = vecs(10 -> Seq(1f, 0f), 20 -> Seq(0f, 1f))
      .select($"vec_id".as("centroid_id"), $"embedding".as("centroid"))
    val got = Similarity.ivfAssign(df, centroids)
      .select($"vec_id", $"centroid_id").as[(Int, Int)].collect().toMap
    assert(got === Map(1 -> 10, 2 -> 20, 3 -> 10))
  }

  test("pqEncode: codes index the nearest sub-centroid, stable for dups") {
    // hand-built model: 2 subspaces of dim 2, 2 centroids each
    val model = Similarity.PqModel(2, 2, IndexedSeq(
      IndexedSeq(Array(1.0, 0.0), Array(0.0, 1.0)),
      IndexedSeq(Array(1.0, 1.0), Array(-1.0, -1.0))))
    val df = vecs(
      1 -> Seq(0.9f, 0.1f, 1f, 1f),    // sub0→code0, sub1→code0
      2 -> Seq(0.1f, 0.9f, -1f, -1f),  // sub0→code1, sub1→code1
      3 -> Seq(0.9f, 0.1f, 1f, 1f))    // duplicate of 1 → same codes
    val got = Similarity.pqEncode(df, model)
      .as[(Int, Seq[Int])].collect().toMap
    assert(got === Map(1 -> Seq(0, 0), 2 -> Seq(1, 1), 3 -> Seq(0, 0)))
  }

  test("pqSearch: recall@10 vs bruteForceKnn on real embeddings; " +
    "reported cosines are exact") {
    val emb = graft.sources.Tables.load(spark, sf, "embeddings")
    val queries = emb.filter($"vec_id" < 5)
    val model = Similarity.pqTrain(emb, m = 8, k = 16, maxIter = 5)
    val pq = Similarity.pqSearch(emb, model, queries, k = 10, rerank = 200)
    val exact = Similarity.bruteForceKnn(emb, queries, 10)
    def topSet(df: org.apache.spark.sql.DataFrame) = df
      .select($"query_id".cast("long"), $"neighbor_id".cast("long"))
      .as[(Long, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val pqTop = topSet(pq)
    val exTop = topSet(exact)
    val recalls = exTop.map { case (q, s) =>
      pqTop.getOrElse(q, Set.empty).intersect(s).size.toDouble / s.size }
    val mean = recalls.sum / recalls.size
    info(f"PQ recall@10 over ${recalls.size} queries: $mean%.2f")
    assert(mean >= 0.5, f"PQ recall@10 $mean%.2f below 0.5 at " +
      "(m=8, k=16, rerank=200) — the shipped q85 parameters")
    // exact-re-rank contract: every reported cos equals the true cosine
    val reported = pq.join(
        emb.select($"vec_id".as("query_id"), $"embedding".as("qv")), "query_id")
      .join(emb.select($"vec_id".as("neighbor_id"), $"embedding".as("nv")),
        "neighbor_id")
      .select(abs($"cos" - Similarity.cosine($"qv", $"nv")).as("err"))
      .agg(max($"err")).head().getDouble(0)
    assert(reported < 1e-12)
  }

  test("ivfPqSearch: probing every cell degrades exactly to pqSearch; " +
    "nprobe<cells still recalls most true neighbors") {
    val emb = graft.sources.Tables.load(spark, sf, "embeddings")
    val queries = emb.filter($"vec_id" < 5)
    val centroids = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("centroid_id"), $"embedding".as("centroid"))
    val model = Similarity.pqTrain(emb, m = 8, k = 16, maxIter = 5)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select($"query_id".cast("long"), $"neighbor_id".cast("long"), $"rank")
      .as[(Long, Long, Long)].collect().toSet
    // probe ALL cells → the cell restriction is vacuous → identical
    // output to the plain PQ scan (same codes, same LUT, same re-rank)
    val full = Similarity.ivfPqSearch(emb, centroids, model, queries,
      nprobe = 8, k = 10, rerank = 200)
    val pq = Similarity.pqSearch(emb, model, queries, k = 10, rerank = 200)
    assert(rows(full) === rows(pq))
    // partial probe: recall@10 vs the probed-cell EXACT search stays
    // high (the PQ stage should lose little beyond what probing loses)
    val part = Similarity.ivfPqSearch(emb, centroids, model, queries,
      nprobe = 3, k = 10, rerank = 200)
    val ivfExact = Similarity.ivfSearch(emb, centroids, queries,
      nprobe = 3, k = 10)
    def tops(s: Set[(Long, Long, Long)]) =
      s.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val a = tops(rows(part))
    val b = tops(ivfExact
      .select($"query_id".cast("long"), $"neighbor_id".cast("long"), $"rank")
      .as[(Long, Long, Long)].collect().toSet)
    val recalls = b.map { case (q, s) =>
      a.getOrElse(q, Set.empty).intersect(s).size.toDouble / s.size }
    val mean = recalls.sum / recalls.size
    info(f"IVF-PQ recall@10 vs IVF-exact at nprobe=3: $mean%.2f")
    assert(mean >= 0.5, f"IVF-PQ recall $mean%.2f below 0.5")
  }

  test("mmrSelect penalizes redundancy: diverse pick beats exact duplicate") {
    // a and b are IDENTICAL (cos(q,·)=0.9); c is equally relevant but
    // diverse (cos(c,a)=0.81); d is irrelevant
    val corpus = Seq(
      (1L, Array(0.9f, 0.4359f, 0.0f)),   // a
      (2L, Array(0.9f, 0.4359f, 0.0f)),   // b = exact dup of a
      (3L, Array(0.9f, 0.0f, 0.4359f)),   // c diverse, same relevance
      (4L, Array(0.0f, 1.0f, 0.0f)))      // d irrelevant
      .toDF("vec_id", "embedding")
    val qv = Seq(Tuple1(Array(1.0f, 0.0f, 0.0f))).toDF("q_vec")
    val got = Similarity.mmrSelect(corpus, qv, lambdaRel = 0.7,
        candidates = 4, select = 3)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    // pick 1: a (relevance tie a/b/c → smallest id); pick 2: c (0.387)
    // beats the duplicate b (0.7·0.9 − 0.3·1 = 0.33); pick 3: b (0.33)
    // still beats irrelevant d (negative mmr)
    assert(got.map(_._2) === Seq(1L, 3L, 2L))
    val mmr = got.map(_._3)
    assert(math.abs(mmr(0) - 0.63) < 1e-3)
    assert(math.abs(mmr(1) - 0.387) < 1e-3)
    assert(math.abs(mmr(2) - 0.33) < 1e-3)
    // selection-order scores are non-increasing by construction
    assert(mmr(0) >= mmr(1) && mmr(1) >= mmr(2))
  }

  test("mmrSelect rejects a driver-unsafe candidates parameter") {
    val corpus = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val qv = Seq(Tuple1(Array(1.0f, 0.0f))).toDF("q_vec")
    val e = intercept[IllegalArgumentException] {
      Similarity.mmrSelect(corpus, qv, lambdaRel = 0.7,
        candidates = 4096, select = 3)
    }
    assert(e.getMessage.contains("2048"))
  }

  test("sqTrain/sqEncode: hand-computed bounds and codes, zero-range dim") {
    val df = vecs(1 -> Seq(0f, 0f, 7f), 2 -> Seq(10f, 0f, 7f),
      3 -> Seq(10f, 10f, 7f), 4 -> Seq(5f, 10f, 7f))
    val m = Similarity.sqTrain(df)
    assert(m.lo === IndexedSeq(0.0, 0.0, 7.0))
    assert(m.hi === IndexedSeq(10.0, 10.0, 7.0))
    val codes = Similarity.sqEncode(df, m)
      .as[(Int, Seq[Int])].collect().toMap
    assert(codes(1) === Seq(0, 0, 0))
    assert(codes(2) === Seq(255, 0, 0))
    assert(codes(3) === Seq(255, 255, 0))
    // 5/10*255 = 127.5 → HALF_UP 128; constant dim quantizes to 0
    assert(codes(4) === Seq(128, 255, 0))
  }

  test("sqSearch ranks by exact integer code dot, ties by neighbor id") {
    val df = vecs(1 -> Seq(0f, 0f, 7f), 2 -> Seq(10f, 0f, 7f),
      3 -> Seq(10f, 10f, 7f), 4 -> Seq(5f, 10f, 7f))
    val m = Similarity.sqTrain(df)
    val got = Similarity.sqSearch(df, m, df.filter($"vec_id" === 3), k = 3)
      .orderBy($"rank").as[(Int, Int, Long, Long)].collect().toSeq
    // dots vs v3=(255,255,0): v4 128*255+255*255=97665, v2 65025, v1 0
    assert(got === Seq((3, 4, 1L, 97665L), (3, 2, 2L, 65025L),
      (3, 1, 3L, 0L)))
  }
}
