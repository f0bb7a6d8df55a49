package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed as
  * a shuffle plan that survives 100 TB:
  *
  *  - exact:      hash-groupBy on a content digest (one shuffle on the
  *                digest — uniform keys, no skew)
  *  - MinHash+LSH: shingle → minhash signature (map-side) → band →
  *                bucket-join (shuffle on band hash only; candidate pairs
  *                verified in-bucket, never all-pairs)
  *  - SimHash:    64-bit signature (map-side) → bucket on signature
  *  - n-gram Jaccard: exact verification on candidate pairs
  *  - embedding near-dup: sign-LSH buckets → in-bucket cosine
  */
object Dedup {

  /** Exact dedup: keep the smallest id per content digest. Deterministic
    * (unlike dropDuplicates) and one shuffle on md5(text).
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Stage id + distinct shingle-hash array via the native
    * [[graft.functions.ShingleHashes]] expression: one codegen'd pass per
    * document (tokenize → shingle → distinct → xxhash64), no intermediate
    * string arrays.
    */
  private def shingleHashed(df: DataFrame, idCol: String, textCol: String,
                            shingleN: Int): DataFrame =
    df.select(col(idCol),
      graft.functions.ShingleHashes(col(textCol), shingleN).as("sh"))

  /** Deterministic MinHash signature from a materialized shingle-hash
    * column (`sh: array<long>`). Each of the k hash functions remixes the
    * 64-bit shingle hash with the function index — k long hashes per
    * shingle instead of k string hashes, same LSH family guarantees.
    * Pure column algebra: computed map-side per row; no explode/shuffle.
    */
  def minhashSignatureFromHashes(df: DataFrame, numHashes: Int): DataFrame =
    df.withColumn("sig", array((0 until numHashes).map { i =>
      // min over the empty shingle set (docs shorter than the shingle
      // size) is the Long.MaxValue identity, not null — keeps the
      // signature non-nullable and bit-equal to MinHashSignature
      coalesce(array_min(transform(col("sh"), h => xxhash64(h, lit(i)))),
        lit(Long.MaxValue))
    }: _*))

  /** MinHash LSH banding: (band_id, hash of the band's signature slice)
    * pairs. Rows sharing any band bucket are near-dup candidates.
    * One explode (rows × bands) + one shuffle on the bucket key.
    */
  /** ENGINE-PORTABLE MinHash-LSH near-dup candidates: identical math to
    * [[minhashNearDups]] but built on `md5` — a hash BOTH Spark and
    * DuckDB implement bit-identically — so the whole pipeline (shingle →
    * per-seed minhash → banded buckets → candidate pairs → signature-
    * agreement estimate) is replayable by the SQL oracle, promoting the
    * LSH *math* from CI-pinned to oracle-checked the way q294 did for
    * ALS. The shipped q30/q63 operators keep `xxhash64` (codegen'd
    * long-arithmetic, no hex strings — the fast path); this is the
    * portable twin that certifies the algebra.
    *
    * minhash_s(doc) = min over shingles of md5("s:" || shingle) — a
    * fixed-width lowercase-hex string, so lexicographic MIN equals
    * numeric min. Bands of `numHashes/bands` concatenated hashes bucket
    * the candidates; est_jaccard = (#agreeing seeds)/numHashes, an
    * exact k/n rational (no float drift). Scale shape matches
    * [[minhashNearDups]]: the self-join is (band, bucket)-local, never
    * corpus².
    *
    * Short docs (< shingleN tokens) are safe under ANSI mode (the
    * Spark 4 default): token lookups use `try_element_at`, which
    * returns null out-of-range exactly like DuckDB's `t[i]`, and the
    * null propagates through `concat` (not `concat_ws`) mirroring SQL
    * `||` — the doc's lone shingle is NULL, its md5s are NULL, `min`
    * skips it, and the all-null signature can never clear the
    * agreement threshold, so both engines drop the doc gracefully.
    */
  def minhashNearDupsPortable(df: DataFrame, idCol: String, textCol: String,
                              threshold: Double = 0.5, numHashes: Int = 16,
                              bands: Int = 4, shingleN: Int = 3): DataFrame = {
    // three consumers read the signature frame (banding + both sides of
    // the estimate join) — cached so the 16×|shingles| md5 sweep runs
    // once (the multi-reference rule; measured 3× recompute without it)
    val sigs = graft.core.Caches.cached(
      minhashPortableSigs(df, idCol, textCol, numHashes, shingleN))
    minhashPairsFromSigs(sigs, idCol, threshold, numHashes, bands)
  }

  /** The signature half of [[minhashNearDupsPortable]]: per-doc array
    * of `numHashes` md5 min-hashes over distinct `shingleN`-gram
    * shingles. Exposed separately so a caller can MATERIALIZE the sig
    * frame (cache, or corpus-keyed parquet staging — a production
    * dedup index builds signatures once per corpus snapshot) before
    * the banded pair join: the 16×|shingles| md5 sweep is the whole
    * cold cost of the composite operator.
    */
  def minhashPortableSigs(df: DataFrame, idCol: String, textCol: String,
                          numHashes: Int = 16, shingleN: Int = 3)
  : DataFrame = {
    val toks = split(lower(col(textCol)), "\\s+")
    val sh = array_distinct(transform(
      sequence(lit(1), greatest(size(toks) - (shingleN - 1), lit(1))),
      i => concat((1 until 2 * shingleN).map { j =>
        if (j % 2 == 1) try_element_at(toks, i + (j - 1) / 2) else lit(" ")
      }: _*)))
    // explode to (doc, shingle) rows and take per-seed MIN as a plain
    // aggregate (map-side combine): computing the 16 array_min's over a
    // shingle-array column instead lets CollapseProject inline the
    // whole shingle construction into each of the 16 expressions —
    // measured 22 s vs 2 s at sf0.1 for identical output. The doc-row
    // repartition spreads the 16×|shingles| md5 projection across the
    // cluster — the corpus usually arrives as few parquet files, and
    // without it the hot projection runs at file parallelism
    val hashed = df.select(col(idCol), col(textCol))
      .repartition(col(idCol))
      .select(col(idCol), explode(sh).as("_x"))
      .select(col(idCol) +: (0 until numHashes).map(s =>
        md5(concat(lit(s + ":"), col("_x"))).as(s"_h$s")): _*)
    hashed.groupBy(col(idCol))
      .agg(min(col("_h0")).as("_m0"),
        (1 until numHashes).map(s => min(col(s"_h$s")).as(s"_m$s")): _*)
      .select(col(idCol),
        array((0 until numHashes).map(s => col(s"_m$s")): _*).as("mh"))
  }

  /** The pair half of [[minhashNearDupsPortable]]: banded bucketing
    * over an existing (id, mh) frame, candidate dedup, agreement
    * estimate. The caller owns `sigs`' materialization.
    */
  def minhashPairsFromSigs(sigs: DataFrame, idCol: String,
                           threshold: Double = 0.5, numHashes: Int = 16,
                           bands: Int = 4): DataFrame = {
    val rowsPerBand = numHashes / bands
    val bnd = sigs.select(col(idCol), col("mh"), posexplode(
      transform(sequence(lit(0), lit(bands - 1)), b =>
        concat_ws("", (0 until rowsPerBand).map(r =>
          element_at(col("mh"), b * rowsPerBand + r + 1)): _*)))
      .as(Seq("band", "bucket")))
    val cand = bnd.select(col("band"), col("bucket"), col(idCol).as("id_a"))
      .join(bnd.select(col("band"), col("bucket"), col(idCol).as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    graft.core.Caches.materializedThenRelease(
      cand
        .join(sigs.select(col(idCol).as("id_a"), col("mh").as("mh_a")),
          "id_a")
        .join(sigs.select(col(idCol).as("id_b"), col("mh").as("mh_b")),
          "id_b")
        .withColumn("est_jaccard",
          round(aggregate(zip_with(col("mh_a"), col("mh_b"),
              (x, y) => when(x === y, 1).otherwise(0)),
            lit(0), _ + _).cast("double") / numHashes + lit(1e-9), 4))
        .filter(col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard"),
      sigs)
  }

  private val portableSimhashBits = 60
  private val portableSimhashBlocks = 4

  /** The signature half of [[simhashNearDupsPortable]]: per-doc 60-bit
    * portable SimHash (md5 token hash, per-bit majority vote). Exposed
    * separately so a caller can MATERIALIZE the sig frame (cache, or
    * corpus-keyed parquet staging — a production dedup index builds
    * signatures once per corpus snapshot) before the banded pair join;
    * the boundary is also what bounds CollapseProject (see
    * [[simhashNearDupsPortable]]'s cache note).
    */
  def simhashPortableSigs(df: DataFrame, idCol: String, textCol: String)
  : DataFrame = {
    val bits = portableSimhashBits
    val tokval = conv(substring(md5(col("_tok")), 1, 15), 16, 10)
      .cast("long")
    df.select(col(idCol), col(textCol))
      .repartition(col(idCol))
      .select(col(idCol),
        explode(split(lower(col(textCol)), "\\s+")).as("_tok"))
      .select(col(idCol) +: (0 until bits).map(i =>
        when(shiftright(tokval, i).bitwiseAND(1) === 1, 1L)
          .otherwise(-1L).as(s"_v$i")): _*)
      .groupBy(col(idCol))
      .agg(sum(col("_v0")).as("_s0"),
        (1 until bits).map(i => sum(col(s"_v$i")).as(s"_s$i")): _*)
      .select(col(idCol),
        (0 until bits).map(i =>
          when(col(s"_s$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce(_ + _).as("sig"))
  }

  /** The pair half of [[simhashNearDupsPortable]]: block-exact banding
    * over an existing (id, sig) frame, first-agreeing-block dedup,
    * bit_count verify. The caller owns `sigs`' materialization.
    */
  def simhashPairsFromSigs(sigs: DataFrame, idCol: String,
                           maxHamming: Int = 3): DataFrame =
    bitSigPairsFromSigs(sigs, idCol, maxHamming,
      portableSimhashBits, portableSimhashBlocks)

  /** Generalized block-exact Hamming pair join over any (id, sig)
    * bit-signature frame (`sig` a long holding `totalBits` bits):
    * candidates from exact agreement on one of `blocks` disjoint
    * `totalBits/blocks`-bit blocks — EXHAUSTIVE for Hamming ≤
    * `maxHamming` whenever `maxHamming < blocks` (pigeonhole) — kept
    * only at their FIRST agreeing block (map-side dedup, no distinct
    * shuffle on the pair stream), then `bit_count(xor)` verify. Shared
    * by the SimHash (q296) and sign-LSH (q297) portable twins; the
    * (block, bucket)-local join is never corpus².
    */
  def bitSigPairsFromSigs(sigs: DataFrame, idCol: String,
                          maxHamming: Int, totalBits: Int,
                          blocks: Int): DataFrame = {
    require(totalBits % blocks == 0, "blocks must divide totalBits")
    require(maxHamming < blocks,
      "pigeonhole exhaustiveness needs maxHamming < blocks")
    val bitsPerBlock = totalBits / blocks
    val bnd = sigs.select(col(idCol), col("sig"), posexplode(
        array((0 until blocks).map(b =>
          shiftright(col("sig"), b * bitsPerBlock)
            .bitwiseAND((1L << bitsPerBlock) - 1)): _*))
      .as(Seq("block", "bucket")))
    val l = bnd.select(col("block"), col("bucket"),
      col(idCol).as("id_a"), col("sig").as("sig_a"))
    val r = bnd.select(col("block"), col("bucket"),
      col(idCol).as("id_b"), col("sig").as("sig_b"))
    val xor = col("sig_a").bitwiseXOR(col("sig_b"))
    def blockAgrees(b: Int): Column =
      shiftright(xor, b * bitsPerBlock)
        .bitwiseAND((1L << bitsPerBlock) - 1) === 0
    val firstAgreeing = (0 until blocks - 1).foldLeft(
        when(blockAgrees(0), 0)) { (acc, b) =>
      if (b == 0) acc else acc.when(blockAgrees(b), b)
    }.otherwise(blocks - 1)
    graft.core.Caches.materializedThenRelease(
      l.join(r, Seq("block", "bucket"))
        .filter(col("id_a") < col("id_b"))
        .filter(col("block") === firstAgreeing)
        .withColumn("hamming", bit_count(xor))
        .filter(col("hamming") <= maxHamming)
        .select(col("id_a"), col("id_b"),
          col("hamming").cast("long").as("hamming")),
      sigs)
  }

  /** ENGINE-PORTABLE SimHash near-dup twin (q296) — the q295 promotion
    * applied to the bit-vote math: the shipped q31 operator keys on the
    * codegen'd seed-42 XXH64 [[graft.functions.SimHash64]] (Spark-
    * internal, not replayable by a SQL oracle), so its correctness was
    * CI-pinned only. This twin runs the IDENTICAL algebra — per-token
    * hash, per-bit majority vote, block-exact Hamming candidate
    * generation, bit_count verify — on md5, which Spark and DuckDB
    * implement bit-identically, promoting the SimHash *math* from
    * CI-pinned to oracle-checked.
    *
    * tokval(t) = first 15 md5 hex chars of the lowercase token as a
    * 60-bit integer (Spark `conv(_,16,10)` ≡ DuckDB `('0x'||_)::BIGINT`;
    * 15 hex chars is the widest value that fits a SIGNED 64-bit int in
    * both engines — 16 would overflow BIGINT); signature bit i is set
    * iff Σ_tokens (2·bit_i(tokval) − 1) > 0 — exactly
    * [[simhashFromHashes]]' vote at width 60, within 4 bits of the
    * shipped 64-bit strictness (a 32-bit draft emitted 85k pairs at
    * sf0.1 where the shipped q31 finds ~60 — same math, far looser
    * Hamming-≤-3 semantics). Candidates come from exact agreement on
    * one of 4 disjoint 15-bit blocks (pigeonhole: Hamming ≤ 3 forces
    * ≥ 1 exact block, so blocking is EXHAUSTIVE), kept only at their
    * FIRST agreeing block — [[simhashNearDups]]' map-side dedup, no
    * distinct shuffle on the pair stream. A random-doc pair sits at
    * expected Hamming 30, so the output is near-dup pairs, not bucket
    * noise, and the (block, bucket)-local join is never corpus².
    *
    * Scale shape: one md5 + 32 bit-tests per token row, map-side
    * combined into 32 per-doc sums; everything downstream is
    * |docs|-sized. The vote runs over token ROWS (explode, plain
    * aggregates) for the same CollapseProject reason as
    * [[minhashNearDupsPortable]].
    */
  def simhashNearDupsPortable(df: DataFrame, idCol: String, textCol: String,
                              maxHamming: Int = 3): DataFrame = {
    // CACHED for the same reason minhashNearDupsPortable caches its
    // signature frame, but here the dominant cost is DRIVER-side: the
    // sig column is a 60-term sum of whens over the 60 vote columns,
    // and without a materialization boundary CollapseProject inlines
    // that tree into the 4-element banding array on BOTH join sides —
    // the optimizer then walks ~8 copies of the 60-term tree on every
    // execution (measured: 1.9 s/run planning-bound vs 0.65 s cached
    // at sf0.1, identical output; the executed work is |docs|-sized
    // either way). The cache cuts the lineage to a plain attribute.
    // (q296 goes further: it STAGES the sig frame corpus-keyed, so a
    // cold JVM pays a parquet scan, not the vote + the 60-term plan.)
    val sigs = graft.core.Caches.cached(
      simhashPortableSigs(df, idCol, textCol))
    simhashPairsFromSigs(sigs, idCol, maxHamming)
  }

  def minhashBands(df: DataFrame, idCol: String, textCol: String,
                   numHashes: Int = 16, bands: Int = 4,
                   shingleN: Int = 3): DataFrame = {
    val rowsPerBand = numHashes / bands
    // fused native expression (spec pins equality with the staged
    // minhashSignatureFromHashes ∘ ShingleHashes composition)
    df.select(col(idCol),
        graft.functions.MinHashSignature(col(textCol), shingleN, numHashes)
          .as("sig"))
      .select(col(idCol), posexplode(
        transform(sequence(lit(0), lit(bands - 1)), b =>
          xxhash64(concat_ws(",",
            slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))), b)))
        .as(Seq("band", "bucket")))
  }

  /** Candidate near-dup pairs from shared LSH buckets, verified with
    * exact shingle-Jaccard ≥ `threshold`. The self-join is on
    * (band, bucket) — only same-bucket rows meet, so the pair count is
    * bucket-local, not quadratic in the corpus.
    */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      threshold: Double = 0.7, numHashes: Int = 16,
                      bands: Int = 4, shingleN: Int = 3): DataFrame = {
    val b = minhashBands(df, idCol, textCol, numHashes, bands, shingleN)
    val l = b.select(col("band"), col("bucket"), col(idCol).as("id_a"))
    val r = b.select(col("band"), col("bucket"), col(idCol).as("id_b"))
    val candidates = l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // verification Jaccard runs on the hash arrays — set sizes are
    // identical to string-shingle sets modulo 64-bit collisions. The
    // native JaccardSim expression (one hash-probe loop per pair, no
    // scratch arrays) replaces array_intersect+array_union; the spec
    // pins value equality with that algebra
    val docs = shingleHashed(df, idCol, textCol, shingleN)
    candidates
      .join(docs.select(col(idCol).as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(docs.select(col(idCol).as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard",
        round(graft.functions.JaccardSim(col("sh_a"), col("sh_b")), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash from a materialized token-hash array attribute: each
    * signature bit is the sign of the sum over tokens of (2·bit−1).
    * Column algebra only; per-row cost is tokens × 64 bit tests.
    */
  def simhashFromHashes(hashes: Column): Column = {
    val bits = (0 until 64).map { i =>
      val bitSum = aggregate(hashes, lit(0L), (acc, h) =>
        acc + when(shiftright(h, i).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(bitSum > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ bitwiseOR _)
  }

  /** SimHash near-dup candidates: exact signature match per 16-bit block
    * (Hamming-distance blocking: two signatures within Hamming distance 3
    * must agree on at least one of 4 blocks).
    *
    * BOUNDED-CORPUS VARIANT (round 15/16 adjudication): 16-bit blocks
    * are the widest exhaustive blocking a 64-bit signature allows at
    * d ≤ 3, so the candidate budget is Θ(n²/2^16) — measured ×60.6 for
    * ×9.2 rows by BucketPairBudgetAuditSpec. Fine to ~10^6–10^7 docs
    * (the block join stays under ~10^8 candidates); beyond that use
    * [[simhashNearDups128]] (32-bit blocks, measured linear), a
    * different operating point (Hamming over 128 bits), not a drop-in.
    * q31 keeps this shape because the q296 oracle twin mirrors its
    * 64-bit algebra; it is the only main-source caller.
    *
    * A pair agreeing on SEVERAL blocks meets once per agreeing block;
    * instead of a `distinct()` (a full shuffle of the pair stream), each
    * pair is kept only where the join block is the FIRST agreeing block —
    * computable per row from the signature XOR, so dedup is a map-side
    * filter and the only shuffle left is the bucket join itself.
    */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3): DataFrame = {
    val withSig = df
      .select(col(idCol), graft.functions.SimHash64(col(textCol)).as("sig"))
    val blocks = withSig.select(col(idCol), col("sig"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("sig"), b * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("block", "block_val")))
    val l = blocks.select(col("block"), col("block_val"),
      col(idCol).as("id_a"), col("sig").as("sig_a"))
    val r = blocks.select(col("block"), col("block_val"),
      col(idCol).as("id_b"), col("sig").as("sig_b"))
    val xor = col("sig_a").bitwiseXOR(col("sig_b"))
    def blockAgrees(b: Int): Column =
      shiftright(xor, b * 16).bitwiseAND(0xFFFFL) === 0
    val firstAgreeing = when(blockAgrees(0), 0).when(blockAgrees(1), 1)
      .when(blockAgrees(2), 2).otherwise(3)
    l.join(r, Seq("block", "block_val"))
      .filter(col("id_a") < col("id_b"))
      .filter(col("block") === firstAgreeing)
      .withColumn("hamming", bit_count(xor))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
  }

  /** 128-bit SimHash near-dup pairs — [[simhashNearDups]]' scale path
    * (BucketPairBudgetAuditSpec, round 15). The 64-bit operator's
    * 16-bit blocks are the widest pigeonhole-exhaustive blocking for
    * Hamming ≤ 3 on a 64-bit signature (exhaustive needs ≥ d+1 = 4
    * blocks), so per-block-value occupancy is ∝ n/2^16 and the
    * candidate join's pair budget is Θ(n²/2^16) — measured ×60.6
    * budget growth for ×9.2 rows on the sf0.01→sf0.1 rung while the
    * true-pair output stayed linear (59→588). The fix the audit
    * prescribes is a WIDER KEY SPACE: two independent seed-42/seed-1042
    * XXH64 signature halves form a 128-bit SimHash whose 4 blocks are
    * 32 bits wide — same ≥-1-exact-block exhaustiveness at d ≤ 3, but
    * occupancy ∝ n/2^32, pushing the quadratic knee out by 2^16×
    * (linear to ~10^9 docs). Hamming is over all 128 bits, so d ≤ 3
    * here is a STRICTER near-dup test than the 64-bit operator's (the
    * bit budget doubles but the threshold doesn't) — a different
    * operating point, not a drop-in: q31 keeps the 64-bit fixture the
    * q296 oracle twin mirrors, and callers pick by corpus size.
    */
  def simhashNearDups128(df: DataFrame, idCol: String, textCol: String,
                         maxHamming: Int = 3): DataFrame = {
    require(maxHamming < 4,
      "pigeonhole exhaustiveness over 4 blocks needs maxHamming < 4")
    val withSig = df.select(col(idCol),
      graft.functions.SimHash64(col(textCol)).as("sig_lo"),
      graft.functions.SimHash64Seeded(col(textCol), 1042L).as("sig_hi"))
    // 4 disjoint 32-bit blocks: (lo half, hi half) of each signature;
    // mask AFTER the shift — shiftright is arithmetic, and a sig with
    // bit 63 set would otherwise sign-extend into the block value
    def blockVal(sig: Column, half: Int): Column =
      shiftright(sig, half * 32).bitwiseAND(0xFFFFFFFFL)
    val blocks = withSig.select(col(idCol), col("sig_lo"), col("sig_hi"),
      posexplode(array(
        blockVal(col("sig_lo"), 0), blockVal(col("sig_lo"), 1),
        blockVal(col("sig_hi"), 0), blockVal(col("sig_hi"), 1)))
        .as(Seq("block", "block_val")))
    val l = blocks.select(col("block"), col("block_val"),
      col(idCol).as("id_a"), col("sig_lo").as("lo_a"),
      col("sig_hi").as("hi_a"))
    val r = blocks.select(col("block"), col("block_val"),
      col(idCol).as("id_b"), col("sig_lo").as("lo_b"),
      col("sig_hi").as("hi_b"))
    val xorLo = col("lo_a").bitwiseXOR(col("lo_b"))
    val xorHi = col("hi_a").bitwiseXOR(col("hi_b"))
    def blockAgrees(b: Int): Column = {
      val (sig, half) = if (b < 2) (xorLo, b) else (xorHi, b - 2)
      shiftright(sig, half * 32).bitwiseAND(0xFFFFFFFFL) === 0
    }
    val firstAgreeing = when(blockAgrees(0), 0).when(blockAgrees(1), 1)
      .when(blockAgrees(2), 2).otherwise(3)
    l.join(r, Seq("block", "block_val"))
      .filter(col("id_a") < col("id_b"))
      .filter(col("block") === firstAgreeing)
      .withColumn("hamming", bit_count(xorLo) + bit_count(xorHi))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"),
        col("hamming").cast("long").as("hamming"))
  }

  /** Apply a near-dup pair list to the corpus: drop every document that
    * has a LOWER-id near-duplicate partner, keeping the canonical (min-id)
    * representative of each duplicate group. Pairs are emitted with
    * id_a < id_b by every generator here, so dropping the distinct id_b
    * side removes exactly the non-representatives — one semi-join-shaped
    * anti-join, no connected-components iteration. (Greedy per-pair
    * selection, the standard training-pipeline choice: a long similarity
    * CHAIN keeps its local minima rather than collapsing to one global
    * representative.)
    */
  def dropNearDups(df: DataFrame, pairs: DataFrame, idCol: String): DataFrame =
    df.join(pairs.select(col("id_b").as(idCol)).distinct(),
      Seq(idCol), "left_anti")

  /** Duplicate-cluster assignment: connected components over a near-dup
    * pair graph via iterated min-label propagation. Where
    * [[dropNearDups]] is greedy-per-pair (a similarity CHAIN keeps its
    * local minima), this computes the TRANSITIVE closure: every node in
    * a component gets the component's minimum id as `cluster_id` — the
    * semantics you want when "duplicate group" must mean one canonical
    * representative per chain (A~B, B~C ⇒ {A,B,C} is one cluster even
    * though A≁C directly).
    *
    * Each round: newLabel(v) = min(label(v), min over neighbors'
    * labels) — one shuffle on the edge key and one on the node id per
    * round, each round's frame run through an eager `localCheckpoint`
    * so the logical plan stays ONE round deep (the round function
    * references its predecessor twice — nbrMin and the join back — so
    * a cache-only loop doubles the plan per round and a long
    * non-convergent run OOMs the DRIVER in analysis before the
    * convergence guard can fire; checkpointing truncates that, see
    * [[duplicateClustersAltStar]]'s lineage note and the 64-node-path
    * DedupSpec case). Converges in O(component diameter) rounds, NOT
    * corpus size: near-dup chains are short (a 100 TB corpus has
    * billions of SMALL clusters, not one long path), so 3–5 rounds is
    * typical; `maxIter` bounds the pathological path-graph. (At extreme
    * diameters, alternating large-star/small-star halves path lengths
    * per round for O(log d) — same per-round plan, different edge
    * rewrite; this implementation keeps the simpler propagation.)
    *
    * Input: pairs with (id_a, id_b) columns (any generator above).
    * Output: (id, cluster_id) for every id that appears in a pair —
    * isolated docs aren't duplicated, so they're not in any cluster.
    *
    * If a component's diameter exceeds `maxIter` the loop exits with
    * labels still moving and the transitive-closure contract does NOT
    * hold; that is a data-shape surprise worth failing loudly on, so
    * the exit path throws unless the caller opts into best-effort
    * labels with `failOnNonConvergence = false` (which logs instead).
    *
    * `checkpointDir`: when set, rounds truncate through FAULT-TOLERANT
    * `checkpoint()` into that directory (the cluster choice — blocks
    * survive executor loss); when None, eager `localCheckpoint()`
    * (fast, executor-local — fine for local/driver-resilient runs).
    * Either way each round's storage is RELEASED as soon as the next
    * round has materialized, so a high-maxIter run holds one round of
    * labels, not O(iterations) of them.
    */
  /** Eager plan-truncating checkpoint for the component loops: reliable
    * `checkpoint()` into `checkpointDir` when set (fault-tolerant — the
    * multi-executor-cluster choice), eager `localCheckpoint()` otherwise
    * (fast, executor-local). Both truncate the logical plan to the
    * stored blocks, which is what the loops need; the context checkpoint
    * dir is set once if unset (Spark qualifies and sub-dirs it, so a
    * string compare against getCheckpointDir would never match).
    */
  private[ext] def truncated(df: DataFrame, checkpointDir: Option[String])
  : DataFrame = checkpointDir match {
    case Some(d) =>
      val sc = df.sparkSession.sparkContext
      if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(d)
      df.checkpoint()
    case None => df.localCheckpoint()
  }

  def duplicateClusters(pairs: DataFrame, maxIter: Int = 20,
                        failOnNonConvergence: Boolean = true,
                        checkpointDir: Option[String] = None): DataFrame = {
    val edges = truncated(pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst"))),
      checkpointDir)
    var labelsCkpt = truncated(edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("cluster_id")), checkpointDir)
    var labels = labelsCkpt
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // min label among each node's neighbors (labels keyed to the edge
      // source; name-based joins, so the edges↔labels self-lineage
      // resolves cleanly after Spark's relation dedup)
      val nbrMin = edges
        .join(labels.select(col("id").as("src"),
          col("cluster_id").as("_lbl")), Seq("src"))
        .groupBy(col("dst").as("id")).agg(min(col("_lbl")).as("_nbr_min"))
      val next = truncated(labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster_id"),
            coalesce(col("_nbr_min"), col("cluster_id"))).as("cluster_id"),
          (coalesce(col("_nbr_min"), col("cluster_id"))
            < col("cluster_id")).as("_changed")),
        checkpointDir)
      converged = next.filter(col("_changed")).count() == 0L
      // next is materialized (eager checkpoint) and the convergence test
      // is done — the previous round's blocks are dead, release them
      org.apache.spark.sql.graftbridge.Bridge.releaseCheckpoint(labelsCkpt)
      labelsCkpt = next
      labels = next.select(col("id"), col("cluster_id"))
      iter += 1
    }
    // the returned labels frame reads only the FINAL round's blocks —
    // the edge list is loop-internal, release it
    org.apache.spark.sql.graftbridge.Bridge.releaseCheckpoint(edges)
    if (!converged) {
      val msg = s"duplicateClusters did not converge in $maxIter rounds: " +
        "a component's diameter exceeds maxIter and cluster_id is NOT the " +
        "transitive-closure minimum. Raise maxIter (rounds scale with " +
        "component diameter, not corpus size)."
      if (failOnNonConvergence) throw new IllegalStateException(msg)
      else org.slf4j.LoggerFactory.getLogger(getClass).warn(msg)
    }
    labels
  }

  /** Connected components via the ALTERNATING large-star / small-star
    * algorithm (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14) — the O(log d) twin of [[duplicateClusters]]'s
    * O(diameter) min-label propagation, for the pathological corpus
    * whose near-dup chains are LONG (crawl rings, template drift):
    * path lengths halve per round instead of shrinking by one.
    *
    * Edges are kept canonical (hi > lo). Per round:
    *   - large-star: every neighbor v > u re-points to
    *     m(u) = min(Γ(u) ∪ {u}) — hubs collapse toward their minimum;
    *   - small-star: every neighbor v ≤ u (and u itself) re-points to
    *     the minimum of that set — local stars flatten.
    * Both are one groupBy(min) + one equi-join on the node id, the
    * same shuffle class as a propagation round.
    *
    * Lineage: unlike the propagation loop (whose round function
    * references its predecessor ONCE — linear plan growth, caching
    * suffices), each star round references the previous edge set ~12
    * times (two union branches × the min-join × both star phases), so
    * a cached-only loop builds an EXPONENTIALLY growing logical plan —
    * measured 36k parquet-scan nodes by round 2, with driver-side
    * analysis dwarfing execution. Every round therefore runs through
    * `localCheckpoint` (eager): the frame materializes and its plan is
    * TRUNCATED to the stored blocks, keeping each round's plan one
    * round deep. The trade (documented Spark semantics): local
    * checkpoints are not fault-tolerant — on a cluster that must
    * survive executor loss, pass `checkpointDir` and every round runs
    * through reliable `checkpoint()` instead; the algorithm is
    * unchanged. Each round's storage (both star phases) is RELEASED
    * once the next round has materialized — the loop holds one round
    * of edges, not O(iterations) of them.
    *
    * Same input/output contract as [[duplicateClusters]]: (id,
    * cluster_id = component min) for every id appearing in a pair.
    */
  def duplicateClustersAltStar(pairs: DataFrame, maxIter: Int = 12,
                               failOnNonConvergence: Boolean = true,
                               checkpointDir: Option[String] = None)
  : DataFrame = {
    val init = truncated(pairs
      .select(greatest(col("id_a"), col("id_b")).as("hi"),
        least(col("id_a"), col("id_b")).as("lo"))
      .filter(col("hi") =!= col("lo")).distinct(),
      checkpointDir)
    val nodes = truncated(init.select(col("hi").as("id"))
      .union(init.select(col("lo").as("id"))).distinct(),
      checkpointDir)
    var edges = init
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // large-star: every neighbor v > u re-points to min(Γ(u) ∪ {u})
      val nb = edges.select(col("hi").as("u"), col("lo").as("v"))
        .union(edges.select(col("lo").as("u"), col("hi").as("v")))
      val mL = nb.groupBy(col("u")).agg(min(col("v")).as("_mn"))
        .select(col("u"), least(col("_mn"), col("u")).as("_m"))
      // each row carries a `_ch` rewiring flag instead of the old
      // count+except set-equality test: zero flags ⟺ both phases were
      // the identity ⟺ next = edges (every rewiring strictly decreases
      // an edge lexicographically — large-star lowers lo to m(u) < u,
      // small-star lowers lo to _m < lo or emits a smaller-hi edge —
      // so a changed row can never reproduce the input set: the
      // lexicographically largest edge is only producible by itself,
      // unchanged, and induction descends from there). One filtered
      // count over the checkpointed round replaces the two-to-three
      // jobs the except-based test ran per round. distinct() becomes
      // groupBy(max) so duplicate placements keep the flag if ANY
      // contributor rewired.
      val ls = truncated(nb.join(mL, Seq("u")).filter(col("v") > col("u"))
        .select(col("v").as("hi"), col("_m").as("lo"),
          (col("_m") =!= col("u")).as("_ch"))
        .groupBy(col("hi"), col("lo")).agg(max(col("_ch")).as("_ch")),
        checkpointDir)
      // small-star over the canonical (hi > lo) edges: every lo-side
      // neighbor (and hi itself) re-points to the neighborhood minimum
      val mS = ls.groupBy(col("hi")).agg(min(col("lo")).as("_m"))
      val withM = ls.join(mS, Seq("hi"))
      val next = truncated(withM.filter(col("lo") =!= col("_m"))
        .select(col("lo").as("hi"), col("_m").as("lo"),
          lit(true).as("_ch"))
        .union(withM.select(col("hi"), col("_m").as("lo"),
          (col("_ch") || col("_m") =!= col("lo")).as("_ch")))
        .groupBy(col("hi"), col("lo")).agg(max(col("_ch")).as("_ch")),
        checkpointDir)
      converged = next.filter(col("_ch")).count() == 0L
      // next is materialized and the fixpoint test has read the previous
      // round — release the round's scratch (large-star intermediate)
      // and the predecessor edge set (round 0's `init` has already
      // seeded `nodes`, itself checkpointed, so it is safe to drop too)
      org.apache.spark.sql.graftbridge.Bridge.releaseCheckpoint(ls)
      org.apache.spark.sql.graftbridge.Bridge.releaseCheckpoint(edges)
      edges = next
      iter += 1
    }
    val out = nodes
      .join(edges.select(col("hi").as("id"), col("lo").as("_cl")),
        Seq("id"), "left")
      .groupBy(col("id")).agg(min(col("_cl")).as("_cl"))
      .select(col("id"), coalesce(col("_cl"), col("id")).as("cluster_id"))
    if (!converged) {
      val msg = s"duplicateClustersAltStar did not converge in $maxIter " +
        "rounds (log-diameter bound exceeded — astronomically unlikely " +
        "on real graphs). Raise maxIter."
      if (failOnNonConvergence) throw new IllegalStateException(msg)
      else org.slf4j.LoggerFactory.getLogger(getClass).warn(msg)
    }
    out
  }

  /** Exact pairwise shingle-Jaccard via an inverted index: explode each
    * doc's distinct shingles into postings, equi-join postings on the
    * shingle (within `partitionCols`), count common shingles per pair,
    * derive |A ∪ B| = |A| + |B| − |A ∩ B|. Only pairs that SHARE at least
    * one shingle ever materialize, so cost is Σ posting-list², not
    * corpus².
    *
    * Hot-posting cap (`maxPostingDf`): a shingle appearing in f documents
    * contributes f(f−1)/2 candidate pairs — ONE boilerplate stop-shingle
    * ("all rights reserved") makes the self-join quadratic in its posting
    * list at corpus scale. The document frequency is computed as a window
    * count over the postings repartitioned on the posting key — the SAME
    * exchange the pair join hangs off (ReuseExchange/AQE dedupes it), so
    * the cap rides a shuffle the join needed anyway; over-cap postings are
    * filtered before any pair forms. (An aggregate + broadcast anti-join
    * formulation was measured slower — it re-derives the expensive
    * shingle projection per side; see PLANS.md.) Dropping a hot shingle
    * from both sides undercounts `inter` only for pairs whose overlap was
    * that boilerplate — which is exactly the overlap a near-dup pipeline
    * wants to ignore. Pairs sharing nothing but capped shingles do not
    * materialize at all. Note `jaccard` keeps the PRE-cap set sizes in
    * its denominator, so pairs that do share a capped shingle score lower
    * than their true Jaccard — the exact-oracle hash-match (q61) holds
    * while the corpus has no shingle over the cap.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3,
                        partitionCols: Seq[String] = Nil,
                        maxPostingDf: Int = 1000): DataFrame =
    shinglePairCounts(df, idCol, textCol, shingleN, partitionCols,
        maxPostingDf)
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double"))
      .select(col("id_a"), col("id_b"), col("jaccard"))

  /** Asymmetric CONTAINMENT near-dup pairs: `inter / min(|A|, |B|)` —
    * the subset-inclusion statistic Jaccard misses. A short document
    * quoted whole inside a long one has Jaccard ≈ |A|/|B| (→ 0 as the
    * host grows) but containment ≈ 1; it is the right score for
    * quote-inclusion, article-plus-comments wrappers, and truncated
    * re-crawls (Broder's resemblance-vs-containment distinction,
    * SEQUENCES'97). Same inverted-index plan as [[ngramJaccardPairs]]
    * (Σ posting², hot-posting cap, never corpus²) — only the final
    * projection differs. `minContainment` filters after the exact
    * per-pair count; the denominator uses PRE-cap set sizes, mirroring
    * the jaccard convention documented above.
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       shingleN: Int = 3,
                       partitionCols: Seq[String] = Nil,
                       maxPostingDf: Int = 1000,
                       minContainment: Double = 0.0): DataFrame =
    shinglePairCounts(df, idCol, textCol, shingleN, partitionCols,
        maxPostingDf)
      .withColumn("containment",
        col("inter").cast("double") /
          least(col("n_a"), col("n_b")).cast("double"))
      .filter(col("containment") >= minContainment)
      .select(col("id_a"), col("id_b"), col("containment"))

  /** Shared inverted-index pair engine for [[ngramJaccardPairs]] /
    * [[containmentPairs]]: (id_a, id_b, n_a, n_b, inter) with
    * id_a < id_b, for pairs sharing ≥ 1 sub-cap shingle.
    */
  private def shinglePairCounts(df: DataFrame, idCol: String,
                                textCol: String, shingleN: Int,
                                partitionCols: Seq[String],
                                maxPostingDf: Int): DataFrame = {
    val part = partitionCols.map(col)
    // fanOutForMapWork (r17, guide §2.5): the shingle build is the
    // operator's dominant narrow work and runs in the scan stage — a
    // one-row-group input would shingle the whole corpus in one task
    val d = graft.sources.Tables.fanOutForMapWork(
        df.select(part :+ col(idCol) :+ col(textCol): _*))
      .select(part :+ col(idCol) :+
        graft.functions.ShingleHashes(col(textCol), shingleN).as("sh"): _*)
      .select(part :+ col(idCol) :+ col("sh") :+
        size(col("sh")).as("n_sh"): _*)
    // posting key = one 64-bit remix of (partition cols, shingle hash):
    // the shuffle moves longs instead of string tuples. A cross-key
    // collision needs two xxhash64 values to agree (~n²/2⁶⁵ for n
    // distinct postings) — negligible against shingling sampling noise.
    val rawPostings = d
      .select(part :+ col(idCol) :+ col("n_sh") :+
        explode(col("sh")).as("_shingle"): _*)
      .select(col(idCol), col("n_sh"),
        xxhash64(part :+ col("_shingle"): _*).as("pkey"))
    // shingles are distinct per doc, so count(*) per pkey == document
    // frequency. Computed as a window over postings repartitioned on
    // pkey: both join sides then hang off ONE identical exchange
    // (ReuseExchange dedupes it), so the cap costs one posting shuffle
    // — which the pair join needed anyway — instead of a second
    // shingle-build pass per side.
    val postings = {
      import org.apache.spark.sql.expressions.Window
      rawPostings
        .repartition(col("pkey"))
        .withColumn("_df", count(lit(1)).over(Window.partitionBy("pkey")))
        .filter(col("_df") <= maxPostingDf)
        .drop("_df")
    }
    val a = postings.select(col("pkey"),
      col(idCol).as("id_a"), col("n_sh").as("n_a"))
    val b = postings.select(col("pkey").as("pkey_b"),
      col(idCol).as("id_b"), col("n_sh").as("n_b"))
    // merge hint (r17, sharedSpanPairs' rationale): both sides are the
    // IDENTICAL posting subtree — sort-merge shares its one exchange
    // via ReusedExchange, where the size-estimated broadcast would
    // rebuild the whole shingle pipeline for the build side and is
    // corpus-sized (OOM) at scale
    a.hint("merge")
      .join(b, col("pkey") === col("pkey_b") && col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("inter"))
  }

  /** Verbatim shared-SPAN detection: pairs of documents sharing at
    * least `minShared` identical `window`-character substrings — the
    * contamination/quotation/boilerplate signal whole-doc similarity
    * misses: two long documents sharing ONE 300-char verbatim block
    * have near-zero shingle Jaccard (q32's statistic) yet are exactly
    * what an exact-substring dedup pass must catch. Char-level and
    * tokenizer-free, so it also catches markup/code spans.
    *
    * Alignment: fixed-stride window sampling is offset-sensitive (a
    * span shifted by 1 char samples disjoint windows on the two
    * sides), so selection is CONTENT-DEFINED — every position's
    * window is a candidate, and a window is kept iff its md5 starts
    * with '0' (1/16 of positions, in expectation every ~16 chars of a
    * shared span). Both documents then anchor the SAME windows inside
    * any shared region regardless of offset — the winnowing/
    * fingerprinting family (Schleimer et al., SIGMOD'03), with the
    * deterministic-hash anchor making the result engine-exact (md5 is
    * identical in Spark and any SQL oracle; a production run swaps a
    * rolling polynomial hash for the per-position digest and hashes
    * the posting key to 64-bit — same plan, cheaper per char, at the
    * cost of oracle-exactness).
    *
    * Shape at 100 TB: the posting stream is |corpus chars|/16 rows;
    * pair generation is the inverted-index join — Σ posting² with the
    * same hot-window cap as [[ngramJaccardPairs]] (`maxPostingDf`
    * bounds the boilerplate blowup; the cap rides the SAME exchange
    * the pair join needs, via the window-over-repartition pattern).
    * Docs shorter than `window` yield no postings (both engines'
    * empty position range).
    *
    * Output: (id_a, id_b, n_shared) with id_a < id_b,
    * n_shared ≥ `minShared` anchored windows in common.
    *
    * 64-bit posting-key collision bound (VERDICT r17 #6 — the one
    * documented divergence from the string-keyed oracle): pair
    * generation joins on `xxhash64(window)`, so two DISTINCT surviving
    * windows colliding in 64 bits merge their posting groups. At
    * 100 TB ≈ 10¹⁴ chars the anchored-window stream is ~6×10¹² rows
    * (1/16 sampling), so expected colliding distinct-window pairs are
    * ~D²/2⁶⁵ ≈ 10⁶. A collision only corrupts OUTPUT when (a) the two
    * windows' doc sets cross (typical |docs(w)| ≈ 1 post-sampling,
    * capped at `maxPostingDf`) AND (b) the affected doc pair clears
    * `minShared = 2`, i.e. shares a SECOND key — another independent
    * collision (~10⁶/D ≈ 10⁻⁷ each) or a real shared window (rare by
    * definition for non-duplicate pairs, and already-duplicate pairs
    * are reported anyway). Expected phantom output pairs ≈
    * 10⁶ × P(second shared key) ≪ 1 at 100 TB. To retire even that,
    * widen the key to two independent hashes
    * (`xxhash64(w), xxhash64(reverse(w))`) and join on both — same
    * long-keyed plan, bound drops to ~D²/2¹²⁹ ≈ 10⁻¹³.
    */
  def sharedSpanPairs(df: DataFrame, idCol: String, textCol: String,
                      window: Int = 32, minShared: Long = 2L,
                      maxPostingDf: Int = 1000): DataFrame = {
    // stage text as an attribute before the HOF touches it (the
    // lambda-capture trap: outer EXPRESSIONS re-evaluate per element).
    // fanOutForMapWork (r17, guide §2.5): the per-position window md5
    // below is the operator's dominant cost and runs in the SCAN stage —
    // a one-row-group input would hash the whole corpus in one task
    val staged = graft.sources.Tables.fanOutForMapWork(
      df.select(col(idCol), col(textCol).as("_txt"))
        .filter(length(col("_txt")) >= window))
    // posting key = one 64-bit remix of the anchored window
    // (shinglePairCounts' documented trick): the shuffle moves longs
    // instead of 32-char strings, and a cross-key collision needs two
    // xxhash64 values to agree (~n²/2⁶⁵ for n distinct windows) —
    // negligible against the 1/16 anchor sampling itself (r17)
    val wins = staged
      .select(col(idCol), explode(transform(
        sequence(lit(1), length(col("_txt")) - (window - 1)),
        i => col("_txt").substr(i, lit(window)))).as("_win"))
      .filter(md5(col("_win")).startsWith("0"))
      .select(col(idCol), xxhash64(col("_win")).as("_wkey"))
    // ONE exchange for the whole tail (r17: was distinct-exchange +
    // repartition-exchange): partitioning by _wkey alone already
    // co-locates every (id, _wkey) duplicate, so the per-doc dedup
    // aggregate, the posting-cap window, and (via ReuseExchange) both
    // pair-join sides all ride the same shuffle
    val postings = {
      import org.apache.spark.sql.expressions.Window
      wins.repartition(col("_wkey"))
        .dropDuplicates(idCol, "_wkey")
        .withColumn("_df", count(lit(1)).over(Window.partitionBy("_wkey")))
        .filter(col("_df") <= maxPostingDf)
        .drop("_df")
    }
    val a = postings.select(col("_wkey"), col(idCol).as("id_a"))
    val b = postings.select(col("_wkey").as("_wkey_b"), col(idCol).as("id_b"))
    // merge hint (r17): the self-join's sides are the IDENTICAL posting
    // subtree — as sort-merge they share ONE exchange (ReusedExchange);
    // the size-estimated broadcast alternative rebuilds the whole
    // anchored-window pipeline for the build side, and at corpus scale
    // a posting-stream broadcast is corpus-sized (OOM), so SMJ is also
    // the only 100 TB-correct strategy here
    a.hint("merge")
      .join(b, col("_wkey") === col("_wkey_b") && col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Train/eval decontamination: for every corpus document, count the
    * distinct token n-gram shingles it shares with an evaluation set —
    * the benchmark-leakage audit every serious training pipeline runs
    * before a model ships.
    *
    * Shape at 100 TB: eval sets are small (10³–10⁶ docs), so their
    * distinct shingles BROADCAST; the corpus is exploded to
    * (doc, shingle) map-side and probes the broadcast hash relation —
    * no shuffle touches corpus×eval, and the only exchange is the
    * per-doc overlap count grouped on the high-cardinality doc id. The
    * alternative — arrays_overlap against one giant eval-shingle array
    * — would rebuild the probe set per ROW; the broadcast join builds
    * it once per task.
    *
    * Returns every corpus row's (idCol, n_overlap, contaminated 0/1);
    * docs sharing nothing keep n_overlap = 0, so the caller filters or
    * audits without losing rows.
    */
  def contaminationStats(corpus: DataFrame, eval: DataFrame,
                         idCol: String, textCol: String, shingleN: Int)
  : DataFrame = {
    val evalShingles = shingleStream(eval, idCol, textCol, shingleN)
      .select(col("_sh")).distinct()
    val hits = shingleStream(corpus, idCol, textCol, shingleN)
      .join(broadcast(evalShingles), Seq("_sh"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_overlap"))
    overlapReport(corpus, idCol, hits)
  }

  /** (idCol, _sh) stream of each doc's DISTINCT token n-gram shingles. */
  private def shingleStream(df: DataFrame, idCol: String, textCol: String,
                            shingleN: Int): DataFrame = df
    .select(col(idCol), TextOps.tokens(col(textCol)).as("_toks"))
    .select(col(idCol),
      explode(TextOps.shinglesFromTokens(col("_toks"), shingleN))
        .as("_sh"))

  /** Left-join the per-doc hit counts back so no corpus row is lost. */
  private def overlapReport(corpus: DataFrame, idCol: String,
                            hits: DataFrame): DataFrame =
    corpus.select(col(idCol)).join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)) > 0L).cast("long")
          .as("contaminated"))

  /** [[contaminationStats]] for the regime where even the eval shingle
    * set is too large to broadcast as raw strings (full eval-suite
    * sweeps): ship its BLOOM FILTER instead (~10 bits/item at 1% fpp —
    * two orders of magnitude smaller than the strings), prefilter the
    * corpus shingle stream map-side inside codegen, and run the exact
    * join only over the ~fpp-sized survivor stream. The exact join is a
    * plain shuffle join ON PURPOSE — the premise is that the eval side
    * does not broadcast — but by then the corpus side has been cut by
    * the filter, so the exchange is survivors-only. Bloom filters have
    * no false negatives and the verify join removes the false
    * positives, so the result is IDENTICAL to [[contaminationStats]]
    * (same oracle).
    *
    * Cost: two extra tiny jobs on the eval side (distinct-count to size
    * the filter, then the filter build — Spark's own mergeable
    * treeAggregate under `stat.bloomFilter`).
    */
  def decontaminateBloom(corpus: DataFrame, eval: DataFrame,
                         idCol: String, textCol: String, shingleN: Int,
                         fpp: Double = 0.01): DataFrame = {
    val evalShingles = shingleStream(eval, idCol, textCol, shingleN)
      .select(col("_sh")).distinct()
    val hashed = evalShingles.select(xxhash64(col("_sh")).as("_h"))
    val bf = hashed.stat.bloomFilter("_h",
      math.max(hashed.count(), 1L), fpp)
    val bytes = graft.functions.BloomMightContain.serialize(bf)
    val survivors = shingleStream(corpus, idCol, textCol, shingleN)
      .filter(graft.functions.BloomMightContain(
        xxhash64(col("_sh")), bytes))
    val hits = survivors.join(evalShingles, Seq("_sh"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_overlap"))
    overlapReport(corpus, idCol, hits)
  }

  /** Fuzzy string matching via the SymSpell deletion neighborhood —
    * every pair of DISTINCT strings within Levenshtein distance 1,
    * found without an all-pairs comparison and without recall loss:
    * two strings are within one edit iff they share a member of each
    * other's {identity + single-character-deletion} variant set, so an
    * equi-join on variant keys generates a candidate superset and a
    * per-pair `levenshtein` verify (codegen built-in) removes the rest.
    * This is EXACT blocking — unlike first-letter/length banding there
    * is no "the edit hit the blocking key" escape.
    *
    * Shape at 100 TB: |distinct strings| × (len+1) posting rows, an
    * equi-join whose cost is Σ posting² per variant key (bounded by
    * near-duplicate cluster sizes — the same Σ|bucket|² contract as the
    * MinHash band join), then one distinct on surviving pairs. The
    * entity-resolution/typo-clustering primitive.
    */
  def fuzzyNamePairs(df: DataFrame, strCol: String): DataFrame = {
    val names = df.select(col(strCol).as("_s")).distinct()
    // both sides of the self-join read this frame — cached so the
    // distinct + variant explode runs once (multi-reference rule)
    val keyed = graft.core.Caches.cached(
      names.select(col("_s"),
        explode(array_distinct(transform(
          sequence(lit(0), length(col("_s"))),
          i => concat(col("_s").substr(lit(1), i),
            col("_s").substr(i + 2, length(col("_s"))))))).as("_k")))
    // persist the (small) verified pair list, release the posting frame
    graft.core.Caches.materializedThenRelease(
      keyed
        .join(keyed.select(col("_k"), col("_s").as("name_b")),
          Seq("_k"))
        .filter(col("_s") < col("name_b"))
        .select(col("_s").as("name_a"), col("name_b"))
        .distinct()
        .filter(levenshtein(col("name_a"), col("name_b")) <= 1)
        .select(col("name_a"), col("name_b"),
          levenshtein(col("name_a"), col("name_b")).cast("long").as("dist")),
      keyed)
  }

  /** Line-level boilerplate removal (the C4-style cleanup): drop every
    * line that occurs in more than `maxLineDf` distinct documents
    * ("all rights reserved", cookie banners, nav text), keep everything
    * else in original order, and reassemble each document.
    *
    * Shuffle shape at 100 TB: ONE exchange on the line hash computes
    * per-line document frequency (partial count-distinct map-side); the
    * over-threshold lines are then at most |corpus-lines|/maxLineDf
    * DISTINCT strings — small by construction — so the removal join is
    * a BROADCAST anti-join against the hot-line list, and reassembly
    * shuffles on the high-cardinality doc id. No full-size frame ever
    * meets a skewed or low-cardinality key.
    *
    * Documents whose every line is boilerplate survive with empty text
    * (left join + coalesce), so the operator never drops rows — that is
    * [[dropNearDups]]'s job.
    */
  def dropBoilerplateLines(df: DataFrame, idCol: String, textCol: String,
                           maxLineDf: Long, sep: String = "\n")
  : DataFrame = {
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), sep)).as(Seq("_pos", "_line")))
    val hot = lines.groupBy(col("_line"))
      .agg(countDistinct(col(idCol)).as("_df"))
      .filter(col("_df") > maxLineDf)
      .select(col("_line"))
    val kept = lines.join(broadcast(hot), Seq("_line"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("_pos"), col("_line")))),
          s => s.getField("_line")), sep).as("_clean"))
    df.select(col(idCol)).join(kept, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("_clean"), lit("")).as("text_clean"))
  }

  /** Embedding-cosine near-duplicate pairs, cell-bounded (the SemDeDup
    * shape): assign every vector to its nearest centroid via the same
    * broadcast argmax-cosine as [[Similarity.ivfAssign]] (same tie-break,
    * so IVF search and semantic dedup agree on cells), then score ONLY
    * within-cell pairs. Pair cost is Σ|cell|² instead of |corpus|² — the
    * property that makes semantic dedup feasible at 100 TB, where the
    * all-pairs join is not a plan. Recall < 1 by construction (a near-dup
    * pair split across two cells is missed — raise k-means quality or
    * probe neighboring cells to recover); EXACT copies always share a
    * cell, since identical vectors produce identical centroid cosines.
    * Size k WITH the corpus (k ∝ N / target cell size, e.g. via the
    * [[Similarity.kmeans]] builder): at fixed k, cell occupancy grows
    * linearly with N and the in-cell pair join quadratically — the 10×
    * smoke in PLANS.md measures exactly that on the fixed-k q66.
    *
    * The corpus is scanned once; the vector rides through the argmax
    * window (no re-join to fetch it back). The self-join shuffles both
    * sides on `centroid_id` — one exchange, reused across the two sides.
    * Emits (id_a, id_b, cos) with id_a < id_b, ready for
    * [[dropNearDups]].
    */
  def embeddingNearDups(df: DataFrame, centroids: DataFrame,
                        threshold: Double, idCol: String = "vec_id",
                        vecCol: String = "embedding",
                        cIdCol: String = "centroid_id",
                        cVecCol: String = "centroid"): DataFrame = {
    import graft.operators.Relational
    val joined = df.join(broadcast(centroids))
      .withColumn("_cos", Similarity.cosine(col(vecCol), col(cVecCol)))
    val asg = Relational.topKPerGroup(joined, 1, Seq(idCol),
        Seq(col("_cos").desc, col(cIdCol)))
      .select(col(cIdCol), col(idCol), col(vecCol))
    val a = asg.select(col(cIdCol),
      col(idCol).as("id_a"), col(vecCol).as("_va"))
    val b = asg.select(col(cIdCol).as("_cid_b"),
      col(idCol).as("id_b"), col(vecCol).as("_vb"))
    a.join(b, col(cIdCol) === col("_cid_b") && col("id_a") < col("id_b"))
      .withColumn("cos", Similarity.cosine(col("_va"), col("_vb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
