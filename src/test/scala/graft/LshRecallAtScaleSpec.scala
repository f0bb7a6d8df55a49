package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Similarity}
import graft.functions.{ShingleHashes, SimHash64}

/** Bench-scale (sf0.1) recall for the SimHash and sign-LSH shapes —
  * the same promotion PqRecallAtScaleSpec gave the PQ family in round
  * 10, where the first bench-scale measurement immediately exposed a
  * real codebook defect the 500-vector fixture had hidden (recall@10
  * 0.24 vs the fixture's 0.94). LshRecallSpec pins these recalls at
  * fixture scale only; here the SHIPPED q30/q31/q34 parameters run
  * over the full bench corpus, where the candidate-bucket load is
  * ~100× heavier and a collision-structure collapse would show.
  *
  * Truth sets are exact per constructed pair (ShingleHashes Jaccard,
  * SimHash64 Hamming — no LSH in the truth path), so these are real
  * recall numbers, not self-confirmation. Gated on the bench corpus
  * existing so the suite stays runnable anywhere.
  */
class LshRecallAtScaleSpec extends SparkTestBase {

  private val sfBench = "/root/testdata/sf0.1"

  private def benchAvailable: Boolean =
    new java.io.File(s"$sfBench/documents.parquet").exists()

  private lazy val corpus: DataFrame =
    SparkEntry.withNearDups(spark, sfBench)

  /** The 50 constructed (original, truncated-copy) pairs with exact
    * per-pair shingle-hash Jaccard and SimHash Hamming distance —
    * LshRecallSpec's construction over the bench corpus.
    */
  private lazy val constructedPairs: DataFrame = {
    val sigs = corpus.select(col("doc_id"),
      ShingleHashes(col("text"), 3).as("sh"),
      SimHash64(col("text")).as("sig"))
    val orig = sigs.select(col("doc_id").as("id_a"),
      col("sh").as("sh_a"), col("sig").as("sig_a"))
    val copy = sigs.filter(col("doc_id") >= 100000)
      .select((col("doc_id") - 100000).as("id_a"), col("doc_id").as("id_b"),
        col("sh").as("sh_b"), col("sig").as("sig_b"))
    orig.join(copy, "id_a")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("hamming",
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .select("id_a", "id_b", "jaccard", "hamming")
      .cache()
  }

  test("q31 path at sf0.1: SimHash blocking stays EXHAUSTIVE for " +
    "Hamming<=3 positives at bench scale") {
    assume(benchAvailable, s"$sfBench not present")
    val truth = constructedPairs.filter(col("hamming") <= 3)
      .select("id_a", "id_b")
    val nTruth = truth.count()
    assert(nTruth >= 10L, s"vacuous truth set ($nTruth pairs)")
    val found = Dedup.simhashNearDups(corpus, "doc_id", "text",
      maxHamming = 3).select("id_a", "id_b")
    val hits = truth.join(found, Seq("id_a", "id_b"), "left_semi").count()
    info(s"sf0.1 simhash recall: $hits/$nTruth")
    // pigeonhole over 4 disjoint 16-bit blocks: d<=3 forces at least
    // one exact block — a miss at ANY corpus size is a logic bug, so
    // the bench-scale floor is 1.0, not a probabilistic bound
    assert(hits === nTruth,
      s"Hamming<=3 blocking must be exhaustive; missed ${nTruth - hits}")
  }

  /** The 128-bit scale path (q298) must honor the SAME exhaustiveness
    * contract as the 64-bit fixture: Hamming ≤ 3 over the 128-bit
    * signature forces ≥ 1 exact 32-bit block (pigeonhole over 4
    * blocks), so a miss at any corpus size is a logic bug — floor 1.0,
    * not a probabilistic bound. Truth is computed directly from the
    * two signature halves over the q298 corpus (planted exact copies
    * at +200000 guarantee a non-vacuous truth set; the +100000
    * one-word-truncated copies contribute whichever pairs land ≤ 3 at
    * the stricter 128-bit operating point).
    */
  test("q298 path at sf0.1: 128-bit SimHash blocking stays EXHAUSTIVE " +
    "for Hamming<=3 positives at bench scale") {
    assume(benchAvailable, s"$sfBench not present")
    val base = SparkEntry.withNearDups(spark, sfBench)
    val withExact = base.unionByName(base.filter(col("doc_id") < 25)
      .select((col("doc_id") + 200000).as("doc_id"), col("text")))
    val sigs = withExact.select(col("doc_id"),
      graft.functions.SimHash64(col("text")).as("lo"),
      graft.functions.SimHash64Seeded(col("text"), 1042L).as("hi"))
    val orig = sigs.filter(col("doc_id") < 100000)
      .select(col("doc_id").as("id_a"),
        col("lo").as("lo_a"), col("hi").as("hi_a"))
    val copies = sigs.filter(col("doc_id") >= 100000)
      .select((col("doc_id") % 100000).as("id_a"),
        col("doc_id").as("id_b"),
        col("lo").as("lo_b"), col("hi").as("hi_b"))
    val truth = orig.join(copies, "id_a")
      .withColumn("hamming128",
        bit_count(col("lo_a").bitwiseXOR(col("lo_b"))) +
          bit_count(col("hi_a").bitwiseXOR(col("hi_b"))))
      .filter(col("hamming128") <= 3)
      .select("id_a", "id_b")
    val nTruth = truth.count()
    assert(nTruth >= 25L, s"vacuous truth set ($nTruth pairs) — the " +
      "25 exact copies alone should land at Hamming 0")
    val found = Dedup.simhashNearDups128(withExact, "doc_id", "text",
      maxHamming = 3).select("id_a", "id_b")
    val hits = truth.join(found, Seq("id_a", "id_b"), "left_semi").count()
    info(s"sf0.1 simhash128 recall: $hits/$nTruth")
    assert(hits === nTruth,
      s"Hamming<=3 blocking must be exhaustive; missed ${nTruth - hits}")
  }

  test("q30 path at sf0.1: MinHash recall >= 0.8 over true-Jaccard>=0.5 " +
    "positives at bench scale") {
    assume(benchAvailable, s"$sfBench not present")
    val truth = constructedPairs.filter(col("jaccard") >= 0.5)
      .select("id_a", "id_b")
    val nTruth = truth.count()
    assert(nTruth >= 25L, s"vacuous truth set ($nTruth pairs)")
    val found = Dedup.minhashNearDups(corpus, "doc_id", "text",
      threshold = 0.5).select("id_a", "id_b")
    val hits = truth.join(found, Seq("id_a", "id_b"), "left_semi").count()
    val recall = hits.toDouble / nTruth
    info(f"sf0.1 minhash recall: $hits/$nTruth = $recall%.3f")
    assert(recall >= 0.8, f"recall $recall%.3f < 0.8 at bench scale")
  }

  test("q34 path at sf0.1: sign-LSH recall >= 0.8 over perturbed " +
    "embedding copies at bench scale") {
    assume(benchAvailable, s"$sfBench not present")
    val emb = spark.read.parquet(s"$sfBench/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // LshRecallSpec's deterministic ~1%-scale perturbation: cosine with
    // the original stays ~1, far above the 0.3 threshold
    val perturbed = emb.filter(col("vec_id") < 50)
      .select((col("vec_id") + 100000).as("vec_id"),
        zip_with(col("embedding"),
          sequence(lit(0), size(col("embedding")) - 1),
          (x, i) => (x.cast("double") +
            (xxhash64(i) % 100).cast("double") / 10000.0).cast("float"))
          .as("embedding"))
    val withCopies = emb.union(perturbed)
    val found = Similarity.lshNearNeighbors(withCopies,
        threshold = 0.3, planes = 4)
      .filter(col("id_b") === col("id_a") + 100000 && col("id_a") < 50)
    val hits = found.count()
    val recall = hits / 50.0
    info(f"sf0.1 sign-LSH recall: $hits/50 = $recall%.3f")
    assert(recall >= 0.8, f"recall $recall%.3f < 0.8 at bench scale")
  }

  /** The round-15 re-pin at the ADAPTIVE parameterization (VERDICT r14
    * #2): a 16×-grown corpus crosses the planes floor — the formula
    * must widen the bucket space, the candidate-pair budget
    * (Σ occupancy², what the band-bucket self-join generates) must
    * stay ∝ n instead of n²/2^planes, and the planted near-identical
    * pairs must still be found through the shipped path (adaptive
    * planes + occupancy cap both ON). Growth is jittered replicas, not
    * exact copies, so the grown corpus has genuinely new directions
    * like a real corpus would. All jitter is xxhash64-deterministic:
    * the measured recall is a fixed number, not a per-run sample.
    */
  test("q34 path at a 16x-grown corpus: adaptive planes keep the " +
    "pair budget linear with recall >= 0.8") {
    assume(benchAvailable, s"$sfBench not present")
    val emb = spark.read.parquet(s"$sfBench/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val replicas = (1 to 15).map { k =>
      emb.select((col("vec_id") + 200000L * k).as("vec_id"),
        zip_with(col("embedding"),
          sequence(lit(0), size(col("embedding")) - 1),
          (x, i) => (x.cast("double") +
            (xxhash64(i * 31 + lit(k)) % 100).cast("double") / 2000.0)
            .cast("float")).as("embedding"))
    }
    val perturbed = emb.filter(col("vec_id") < 50)
      .select((col("vec_id") + 100000).as("vec_id"),
        zip_with(col("embedding"),
          sequence(lit(0), size(col("embedding")) - 1),
          (x, i) => (x.cast("double") +
            (xxhash64(i) % 100).cast("double") / 10000.0).cast("float"))
          .as("embedding"))
    val grown = replicas.foldLeft(emb.union(perturbed))(_ union _).cache()
    val n = grown.count()

    // (1) the formula crossed the floor: at n≈32k, target 128 → 8 planes
    val pAdaptive = Similarity.adaptivePlanes(n, 4, 128)
    assert(pAdaptive > 4,
      s"adaptive planes did not grow past the floor at n=$n")

    // (2) pair budget Σ occ²: adaptive planes vs the old fixed floor.
    // The adaptive budget must be a large factor below fixed-4-planes
    // (16 buckets → budget ≈ n²/16) and within a constant multiple of
    // n·target (uniform expectation n·target; 4× slack for clustering)
    def pairBudget(planes: Int): Long = grown
      .groupBy(Similarity.signLshSignature(col("embedding"), planes, 0)
        .as("bucket"))
      .agg(count(lit(1)).as("occ"))
      .agg(sum(col("occ") * col("occ")))
      .head().getLong(0)
    val budgetAdaptive = pairBudget(pAdaptive)
    val budgetFixed = pairBudget(4)
    info(s"pair budget at n=$n: adaptive($pAdaptive planes) " +
      s"$budgetAdaptive vs fixed(4 planes) $budgetFixed")
    assert(budgetAdaptive * 4 <= budgetFixed,
      s"adaptive budget $budgetAdaptive not well below fixed $budgetFixed")
    assert(budgetAdaptive <= n * 128L * 4,
      s"adaptive budget $budgetAdaptive exceeds ~linear envelope " +
        s"${n * 128L * 4}")

    // (3) recall through the SHIPPED path (adaptive + occupancy cap on)
    val found = Similarity.lshNearNeighbors(grown, threshold = 0.3,
        planes = 4)
      .filter(col("id_b") === col("id_a") + 100000 && col("id_a") < 50)
    val hits = found.count()
    val recall = hits / 50.0
    info(f"grown-corpus sign-LSH recall: $hits/50 = $recall%.3f")
    grown.unpersist()
    assert(recall >= 0.8, f"recall $recall%.3f < 0.8 at the grown rung")
  }
}
