package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token stats, quality scoring, language ID, document
  * fingerprinting. All pure column algebra (whole-stage codegen; no UDFs,
  * no driver round-trips) so a 100 TB documents table runs one scan with
  * map-side-only work until the final aggregate.
  */
object TextOps {

  /** Whitespace tokenizer (regex split, lowercased). */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword count estimate: words + extra splits at
    * letter/digit/punct boundaries — a cheap deterministic proxy for a
    * real tokenizer's token count.
    *
    * Implemented as mark-then-split (insert a space at every
    * letter↔digit boundary, then split on whitespace/punct and drop
    * empties) instead of lookaround alternation: the marker form is
    * expressible in RE2-based engines too, so the result is
    * cross-checkable against a standard SQL oracle.
    */
  def subwordCount(text: Column): Column = {
    val marked = regexp_replace(
      regexp_replace(lower(text), "(\\p{L})(\\d)", "$1 $2"),
      "(\\d)(\\p{L})", "$1 $2")
    size(filter(split(marked, "[\\s\\p{Punct}]+"), t => t =!= ""))
      .cast("long")
  }

  /** Stopword sets for the n-gram/stopword language-ID heuristic.
    * Tiny on purpose: they broadcast as literals inside the plan.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "un", "una", "es", "por"),
    "fr" -> Seq("le", "la", "de", "et", "que", "en", "un", "une", "est", "pour"),
    "de" -> Seq("der", "die", "das", "und", "zu", "in", "ein", "eine", "ist", "von"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "就", "不", "人"))

  /** Count of tokens that appear in `words` (per-row, no shuffle). */
  def stopwordHits(toks: Column, words: Seq[String]): Column = {
    val set = array(words.map(lit): _*)
    size(filter(toks, t => array_contains(set, t))).cast("long")
  }

  /** Best (hits, lang) struct across the stopword languages — the argmax
    * of per-language stopword hits with deterministic tie-break (struct
    * comparison: hits first, then language name). Stage the RESULT as an
    * attribute before branching on it: a `when(best.hits…, best.lang)`
    * over this unstaged expression evaluates the whole 5-language battery
    * twice.
    */
  def langScores(toks: Column): Column =
    greatest(stopwords.toSeq.map { case (lang, words) =>
      struct(stopwordHits(toks, words).as("hits"), lit(lang).as("lang"))
    }: _*)

  /** 'und' fallback over a materialized [[langScores]] struct. */
  def langIdFromScores(best: Column): Column =
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))

  /** Language-ID from a materialized token array. Convenience composition
    * — hot paths should stage [[langScores]] in its own projection first.
    */
  def langIdFromTokens(toks: Column): Column =
    langIdFromScores(langScores(toks))

  def langId(text: Column): Column = langIdFromTokens(tokens(text))

  /** Round to 4 dp after a +1e-9 nudge: ratio arithmetic frequently lands
    * exactly on a half-boundary (x.xxxx5), where IEEE rounding direction
    * differs across engines; the nudge puts both sides of the oracle
    * compare on the same side of the boundary.
    */
  private def r4(c: Column): Column = round(c + lit(1e-9), 4)

  /** Quality-score feature battery (length, punctuation ratio, stopword
    * ratio, distinct-token ratio, mean word length) + a [0,1] blend.
    * Every component is a per-row expression — the whole battery is one
    * projection over the scan.
    */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val text = col(textCol)
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val punct = length(regexp_replace(text, "[^\\p{Punct}]", "")).cast("double")
    val chars = length(text).cast("double")
    // fanOutForMapWork (r17, guide §2.5): the regex/tokenize battery is
    // the operator's whole cost and runs in the scan stage — single-task
    // on a one-row-group input
    graft.sources.Tables.fanOutForMapWork(df)
      .withColumn("n_tokens", nTok.cast("long"))
      .withColumn("punct_ratio", r4(punct / greatest(chars, lit(1.0))))
      .withColumn("stopword_ratio",
        r4(stopwordHits(toks, stopwords("en")).cast("double") /
          greatest(nTok, lit(1.0))))
      .withColumn("distinct_ratio",
        r4(size(array_distinct(toks)).cast("double") /
          greatest(nTok, lit(1.0))))
      .withColumn("mean_word_len",
        r4((chars - nTok + 1) / greatest(nTok, lit(1.0))))
  }

  /** Blend of quality features into one [0,1] score (higher = better). */
  def qualityScore(df: DataFrame, textCol: String): DataFrame =
    qualityFeatures(df, textCol).withColumn("quality",
      r4(
        when(col("n_tokens").between(5, 10000), lit(0.4)).otherwise(lit(0.0)) +
          lit(0.3) * col("distinct_ratio") +
          lit(0.2) * least(col("stopword_ratio") * 2, lit(1.0)) +
          when(col("punct_ratio") < 0.2, lit(0.1)).otherwise(lit(0.0))))

  /** Shingles from an ALREADY-MATERIALIZED token array column.
    *
    * Perf contract: `toks` must be a plain attribute (stage it with
    * `.withColumn`/`.select` first), never the `tokens(text)` expression
    * itself — Spark evaluates lambda-captured outer expressions once PER
    * ELEMENT, so an inline `split()` here turns O(L) shingling into
    * O(L²) re-tokenization.
    */
  def shinglesFromTokens(toks: Column, n: Int): Column = {
    val idx = sequence(lit(0), size(toks) - n)
    // documents with fewer than n tokens yield NO shingles (not one
    // truncated shingle): this matches SQL engines that build the n-gram
    // by positional indexing, where an out-of-bounds t[i+k] nulls the
    // concatenation and the null is dropped — both sides must agree on
    // short/degenerate docs or dedup stats silently diverge there
    when(size(toks) >= n,
      array_distinct(transform(idx, i =>
        concat_ws(" ", slice(toks, i + 1, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Token n-gram shingles ("a b c" 2-grams → ["a b","b c"]); the unit of
    * MinHash/Jaccard dedup. Convenience form — for hot paths stage the
    * token array first and use [[shinglesFromTokens]].
    */
  def shingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(text), n)

  /** Rolling-hash document fingerprint: xxhash64 each n-gram shingle,
    * keep the k smallest (a deterministic min-k sketch — equal documents
    * get equal fingerprints, near-equal documents share most elements).
    * `sh` must be a materialized shingle attribute (perf contract above).
    */
  def fingerprintFromShingles(sh: Column, k: Int = 8): Column =
    slice(array_sort(transform(sh, s => xxhash64(s))), 1, k)

  def fingerprint(text: Column, n: Int = 3, k: Int = 8): Column =
    fingerprintFromShingles(shingles(text, n), k)

  /** Oracle-friendly fingerprint variant: min-k of md5-hex shingle
    * digests (lexicographic min over lowercase hex strings). Same
    * min-k-sketch semantics as [[fingerprintFromShingles]]; md5 is
    * standard across SQL engines, so the sketch is cross-checkable.
    * Slightly more expensive than the xxhash64 form (hex-string md5 vs
    * 64-bit hash) — prefer [[fingerprintFromShingles]] in hot pipelines.
    */
  def md5FingerprintFromShingles(sh: Column, k: Int = 8): Column =
    slice(array_sort(transform(sh, s => md5(s.cast("binary")))), 1, k)

  /** Overlapping token-window chunking: split each document into
    * chunks of `chunkTokens` tokens starting every `stride` tokens
    * (stride < chunkTokens → overlap) — the preparation step for
    * embedding / retrieval pipelines where models take bounded inputs.
    * Trailing fragments are kept (standard practice: the tail still
    * carries signal).
    *
    * Pure map-side: one tokenization, chunk starts generated inside the
    * plan (`sequence`), slices bound to the STAGED token attribute (the
    * O(L²) lambda-inlining trap does not fire on attributes), and the
    * explode multiplies rows without any shuffle. Output:
    * (idCol, chunk_id, n_chunk_tokens, chunk_text).
    */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
                chunkTokens: Int, stride: Int): DataFrame = {
    require(stride >= 1 && chunkTokens >= 1)
    // NO fan-out (r18): the r17 placement here was inert (priced under
    // the estimate-based floor); once the leaf-bytes gate engaged it,
    // the exchange cost more than the tokenize+slice work (q76 A/B
    // 0.332 s off vs 0.309 s on — flat at best) — removed per the
    // measured placement rule (guide §2.5; graft-fanout-rule)
    val staged = df.select(col(idCol), col(textCol))
      .select(col(idCol), tokens(col(textCol)).as("_toks"))
      .select(col(idCol), col("_toks"),
        size(col("_toks")).cast("long").as("_n"))
    staged.select(col(idCol),
        posexplode(transform(
          sequence(lit(0L), col("_n") - 1L, lit(stride.toLong)),
          st => slice(col("_toks"), (st + 1L).cast("int"),
            lit(chunkTokens))))
          .as(Seq("chunk_id", "_chunk")))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        size(col("_chunk")).cast("long").as("n_chunk_tokens"),
        array_join(col("_chunk"), " ").as("chunk_text"))
  }

  /** Per-group quality gating: keep the rows whose score clears their
    * group's p-th quantile — "top 30% by quality PER LANGUAGE", the
    * mix-balancing filter that stops one language's score distribution
    * from starving another's. Shape: thresholds are a tiny groupBy
    * aggregate (|groups| rows) broadcast back onto the corpus; the
    * corpus itself is scanned once and filtered map-side. A percent_rank
    * window would sort every group's rows in one reducer — |groups| is
    * small, so that is the q33-class funnel.
    *
    * `exact = true` uses the exact interpolated percentile (matches
    * DuckDB quantile_cont bit-for-bit on 4dp-rounded scores — the
    * oracle-checkable form); at 100 TB pass `exact = false` for the
    * mergeable approx_percentile sketch (same plan shape, no per-group
    * value buffering).
    */
  def qualityGate(scored: DataFrame, groupCol: String, scoreCol: String,
                  p: Double, exact: Boolean = true): DataFrame = {
    val q = if (exact) percentile(col(scoreCol), lit(p))
            else approx_percentile(col(scoreCol), lit(p), lit(10000))
    val thresholds = scored.groupBy(col(groupCol))
      .agg(r4(q).as("_thr"))
    scored.join(broadcast(thresholds), Seq(groupCol))
      .filter(col(scoreCol) >= col("_thr"))
      .drop("_thr")
  }

  /** PII scrubbing: mask email addresses and long digit runs (phone
    * numbers, SSN-ish ids) with typed placeholders, and count what was
    * masked — the redaction step a public-corpus pipeline runs before
    * training. Pure map-side regexp algebra (codegen'd, one scan, no
    * shuffle); the patterns use only RE2-compatible constructs so the
    * same regexes run identically in Spark (java.util.regex) and the
    * DuckDB oracle (RE2).
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val longNumRe = "[0-9]{7,}"

  def scrubPii(df: DataFrame, idCol: String, textCol: String): DataFrame =
    // NO fan-out (r18): the r17 placement was inert (estimate-based
    // floor); engaged by the leaf-bytes gate it REGRESSED (q74 A/B
    // 0.160 s off vs 0.253 s on) — the four regex passes are cheaper
    // than the exchange. Removed per the measured placement rule.
    df.select(col(idCol), col(textCol))
      .select(col(idCol),
      regexp_replace(
        regexp_replace(col(textCol), emailRe, "<EMAIL>"),
        longNumRe, "<NUM>").as("text_clean"),
      regexp_count(col(textCol), lit(emailRe)).cast("long").as("n_emails"),
      regexp_count(col(textCol), lit(longNumRe)).cast("long")
        .as("n_longnums"))

  /** Within-document repetition metrics — the Gopher-style quality
    * filters that catch degenerate/templated text before it reaches a
    * training mix:
    *
    *  - `dup_token_frac`:  1 − |distinct tokens| / |tokens|
    *  - `top_token_frac`:  most-frequent-token count / |tokens|
    *  - `dup_2gram_frac`:  1 − |distinct 2-grams| / |2-grams|
    *
    * All map-side column algebra over ONE tokenization: the top-token
    * count is a single O(L) fold over the sorted token array (longest
    * equal-run), not a per-token recount — the HOF-lambda O(L²) trap
    * documented in PLANS.md. One scan, no shuffle, no UDFs.
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String)
  : DataFrame = {
    // NO fan-out (r18): inert in r17, regressed once engaged (q72 A/B
    // 0.181 s off vs 0.271 s on) — removed per the measured rule
    val staged = df.select(col(idCol), col(textCol))
      .select(col(idCol), tokens(col(textCol)).as("_toks"))
      .select(col(idCol), col("_toks"),
        size(col("_toks")).cast("long").as("n_tokens"),
        array_sort(col("_toks")).as("_sorted"))
    // longest equal-run over the sorted array = max token multiplicity;
    // fold state (prev, run, best) makes it one O(L) pass
    val zero = struct(lit("").as("prev"), lit(0L).as("run"),
      lit(0L).as("best"))
    val topRun = aggregate(col("_sorted"), zero, (acc, x) => {
      val run = when(x === acc.getField("prev"),
        acc.getField("run") + lit(1L)).otherwise(lit(1L))
      struct(x.as("prev"), run.as("run"),
        greatest(acc.getField("best"), run).as("best"))
    }).getField("best")
    val nD = size(array_distinct(col("_toks"))).cast("double")
    val n2 = greatest(col("n_tokens") - 1L, lit(1L)).cast("double")
    val d2 = size(shinglesFromTokens(col("_toks"), 2)).cast("double")
    staged.select(col(idCol), col("n_tokens"),
      r4(lit(1.0) - nD / col("n_tokens")).as("dup_token_frac"),
      r4(topRun.cast("double") / col("n_tokens")).as("top_token_frac"),
      r4(lit(1.0) - d2 / n2).as("dup_2gram_frac"))
  }

  /** Exact heavy hitters over an open vocabulary: every item whose
    * frequency strictly exceeds N/(capacity+1), with EXACT counts.
    *
    * Two passes, neither of which materializes the full vocabulary:
    *   1. a [[graft.functions.MisraGriesAggregator]] summary — bounded
    *      to `capacity` counters per partial buffer, mergeable, and
    *      guaranteed to contain every over-threshold item regardless of
    *      partitioning — produces the candidate list (≤ capacity rows);
    *   2. a semi-join against the BROADCAST candidates restricts the
    *      exact groupBy-count to those items, and the integer threshold
    *      cnt×(capacity+1) > N filters to the true heavy hitters.
    *
    * The sketch affects only candidate GENERATION; reported counts are
    * exact — which is what makes the result oracle-checkable and the
    * operator usable for contamination/boilerplate audits where the
    * counts drive decisions. A plain groupBy-count would carry one row
    * per distinct item (the open-vocabulary killer at 100 TB); here
    * state is capacity-bounded end-to-end.
    */
  def heavyHitters(items: DataFrame, itemCol: String, capacity: Int)
  : DataFrame = {
    val mg = graft.functions.MisraGriesAggregator.frequentItems(capacity)
    val cands = items.agg(mg(col(itemCol)).as("_cands"))
      .select(explode(col("_cands")).as(itemCol))
    val total = items.agg(count(col(itemCol)).as("_n"))
    items.join(broadcast(cands), Seq(itemCol), "left_semi")
      .groupBy(col(itemCol)).agg(count(lit(1)).as("cnt"))
      .join(broadcast(total))
      .filter(col("cnt") * (capacity + 1) > col("_n"))
      .select(col(itemCol), col("cnt"))
  }

  /** Unigram-LM log-prob scoring: train an add-one-smoothed unigram
    * language model on the corpus itself and score every document by its
    * mean per-token log-probability — the cheap perplexity-style quality
    * signal pipelines use to rank documents before an expensive model
    * pass (low avg log-prob = rare/garbled vocabulary).
    *
    *   p(t) = (count(t) + 1) / (N + V)   (N tokens, V distinct, OOV → 1/(N+V))
    *
    * Two shapes behind one signature:
    *  - `vocabSize <= 0`: EXACT — score via a token-keyed join of the
    *    token stream against the full vocabulary. Correct at any SF but
    *    the join shuffles the whole corpus on a Zipf-skewed key; test
    *    scale only.
    *  - `vocabSize > 0` (the 100 TB shape): the LM keeps the top-K
    *    tokens by count (deterministic tie-break: token asc) and treats
    *    the tail as OOV. The vocabulary broadcasts (K rows), scoring is
    *    map-side, and the only corpus shuffles are the vocab-count
    *    aggregate (map-side combined, output = |vocab| rows) and the
    *    final per-doc aggregate. N and V still come from the FULL
    *    vocabulary (one tiny aggregate), so smoothing is unchanged —
    *    truncation is deterministic, so the result is still exactly
    *    oracle-checkable.
    *
    * Output: (idCol, n_tokens, avg_logprob), natural log, 4 dp.
    */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String,
                     vocabSize: Int = 0): DataFrame = {
    // NO fan-out (r18): inert in r17, regressed once engaged (q80 A/B
    // 0.459 s off vs 0.546 s on) — removed per the measured rule
    val toks = df.select(col(idCol), col(textCol))
      .select(col(idCol), explode(tokens(col(textCol))).as("_tok"))
    // |vocab|-sized and referenced by totals AND the vocabulary cut —
    // cached so the corpus-sized explode+aggregate runs once (the
    // round-5 multi-reference-derived-frame rule, see PLANS.md)
    val counts = graft.core.Caches.cached(
      toks.groupBy(col("_tok")).agg(count(lit(1)).as("_c")))
    val totals = counts.agg(sum(col("_c")).as("_n"),
      count(lit(1)).as("_v"))
    val vocab =
      if (vocabSize > 0)
        broadcast(counts.orderBy(col("_c").desc, col("_tok"))
          .limit(vocabSize))
      else counts
    // materialize the per-doc scores while the vocab counts are live,
    // then RELEASE the counts (they are plan-internal); the persisted
    // result is the memo a re-declaration hits
    graft.core.Caches.materializedThenRelease(
      toks.join(vocab, Seq("_tok"), "left")
        .join(broadcast(totals))
        .groupBy(col(idCol))
        .agg(count(lit(1)).as("n_tokens"),
          r4(avg(log((coalesce(col("_c"), lit(0L)) + lit(1.0)) /
            (col("_n") + col("_v"))))).as("avg_logprob")),
      counts)
  }

  /** Per-document characteristic terms: top-k distinct tokens by
    * smoothed TF-IDF (sklearn-style idf = ln((N+1)/(df+1)) + 1, so
    * corpus-wide tokens still score > 0 and ties don't collapse to one
    * bucket) — the keyword-extraction step of corpus exploration and
    * cluster labeling.
    *
    * Shapes: the (doc, token) tf aggregate and the token df aggregate
    * both shuffle on high-cardinality keys with map-side combine; N is
    * a broadcast single-row aggregate; the final ranking window
    * partitions on the HIGH-cardinality doc id (each group is ≤ the
    * doc's distinct-token count — the safe window shape, unlike the
    * |queries|-reducer funnel q33 had to avoid). Ranking compares the
    * ROUNDED score then the token, so rank is reproducible across
    * engines regardless of last-ulp libm drift.
    */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // NO fan-out (r18): inert in r17, regressed once engaged (q84 A/B
    // 1.039 s off vs 1.330 s on — the biggest loser of the batch: the
    // token explode feeds a doc-keyed aggregate whose shuffle
    // redistributes anyway) — removed per the measured rule
    val toks = df.select(col(idCol), col(textCol))
      .select(col(idCol), explode(tokens(col(textCol))).as("_tok"))
    val tf = toks.groupBy(col(idCol), col("_tok"))
      .agg(count(lit(1)).as("_tf"))
    val dfreq = tf.groupBy(col("_tok")).agg(count(lit(1)).as("_df"))
    val n = df.agg(count(lit(1)).as("_n"))
    val scored = tf.join(dfreq, Seq("_tok")).join(broadcast(n))
      .withColumn("score",
        r4(col("_tf") * (log((col("_n") + lit(1.0)) / (col("_df") + lit(1.0)))
          + lit(1.0))))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("_tok"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("_tok").as("term"),
        col("rank").cast("long").as("rank"), col("score"))
  }

  /** Bigram-LM scoring — the conditional upgrade of [[unigramLogProb]]:
    * p(w₂|w₁) = (c(w₁w₂) + 1) / (c(w₁) + V), mean over a doc's
    * positional bigrams. Catches garbled word ORDER that unigram
    * statistics cannot (same bag of words, broken transitions).
    *
    * Shapes: positional bigrams come from one staged tokenization (no
    * extra scan); the bigram and context-count aggregates shuffle on
    * high-cardinality keys with map-side combine; V is a broadcast
    * single-row aggregate. Docs with fewer than 2 tokens have no
    * bigrams and drop out (the caller left-joins if it needs them).
    */
  def bigramLogProb(df: DataFrame, idCol: String, textCol: String)
  : DataFrame = {
    // NO fan-out (r18): inert in r17, regressed once engaged (q97 A/B
    // 0.449 s off vs 0.554 s on) — removed per the measured rule
    val staged = df.select(col(idCol), col(textCol))
      .select(col(idCol), tokens(col(textCol)).as("_t"))
      .select(col(idCol), col("_t"), size(col("_t")).as("_n"))
    val pairs = staged.filter(col("_n") >= 2)
      .select(col(idCol),
        explode(transform(sequence(lit(1), col("_n") - 1),
          i => struct(element_at(col("_t"), i).as("_w1"),
            element_at(col("_t"), i + 1).as("_w2")))).as("_bg"))
      .select(col(idCol), col("_bg._w1").as("_w1"), col("_bg._w2").as("_w2"))
    val bigCnt = pairs.groupBy(col("_w1"), col("_w2"))
      .agg(count(lit(1)).as("_cb"))
    // |vocab|-sized, referenced by the scoring join AND the V count —
    // cached so the context explode+aggregate runs once
    val ctxCnt = graft.core.Caches.cached(
      staged.select(explode(col("_t")).as("_w1"))
        .groupBy(col("_w1")).agg(count(lit(1)).as("_cu")))
    val v = ctxCnt.agg(count(lit(1)).as("_v"))
    // same lifecycle as unigramLogProb: persist the result, release the
    // plan-internal context counts
    graft.core.Caches.materializedThenRelease(
      pairs.join(bigCnt, Seq("_w1", "_w2")).join(ctxCnt, Seq("_w1"))
        .join(broadcast(v))
        .groupBy(col(idCol))
        .agg(count(lit(1)).as("n_bigrams"),
          r4(avg(log((col("_cb") + lit(1.0)) / (col("_cu") + col("_v")))))
            .as("avg_logprob")),
      ctxCnt)
  }

  /** Top-k adjacent-bigram collocations by pointwise mutual information
    * PMI = ln( p(ab) / (p(a)·p(b)) ) with p(ab) = c_ab/T₂ over bigram
    * occurrences and p(·) = c/T₁ over unigram occurrences — the classic
    * corpus-analysis screen for multiword expressions ("new york"-style
    * units a whitespace tokenizer splits), next to the q143 raw
    * trigram counts and the q83 co-engagement lift.
    *
    * Shape at 100 TB: bigram and unigram counts are token-keyed
    * aggregates with map-side combine (vocab-bounded outputs); T₁/T₂
    * are single-row broadcast rollups of those frames; the scoring
    * join runs on the |bigram-vocab| frame and `minCount` prunes the
    * long tail BEFORE the top-k sort. Ranking orders the ROUNDED score
    * (cross-engine-stable at the limit boundary, the q84 convention).
    */
  def pmiCollocations(df: DataFrame, textCol: String,
                      minCount: Long = 10L, k: Int = 20): DataFrame = {
    // NO fan-out (r18): inert in r17; same tokenize+explode family as
    // q97/q84, which regressed once the leaf-bytes gate engaged their
    // placements — removed with them per the measured rule
    val staged = df.select(col(textCol))
      .select(tokens(col(textCol)).as("_t"))
      .select(col("_t"), size(col("_t")).as("_n"))
    // both count frames are multi-referenced (totals rollup + scoring
    // joins) — cached so each corpus-level explode+aggregate runs once
    // (the bigramLogProb ctxCnt lifecycle)
    val bigCnt = graft.core.Caches.cached(staged.filter(col("_n") >= 2)
      .select(explode(transform(sequence(lit(1), col("_n") - 1),
        i => struct(element_at(col("_t"), i).as("_w1"),
          element_at(col("_t"), i + 1).as("_w2")))).as("_bg"))
      .groupBy(col("_bg._w1").as("_w1"), col("_bg._w2").as("_w2"))
      .agg(count(lit(1)).as("_cab")))
    val uniCnt = graft.core.Caches.cached(
      staged.select(explode(col("_t")).as("_w"))
        .groupBy(col("_w")).agg(count(lit(1)).as("_cu")))
    val t1 = uniCnt.agg(sum(col("_cu")).as("_t1"))
    val t2 = bigCnt.agg(sum(col("_cab")).as("_t2"))
    graft.core.Caches.materializedThenRelease(
      bigCnt.filter(col("_cab") >= minCount)
        .join(uniCnt.select(col("_w").as("_w1"), col("_cu").as("_ca")),
          Seq("_w1"))
        .join(uniCnt.select(col("_w").as("_w2"), col("_cu").as("_cb")),
          Seq("_w2"))
        .join(broadcast(t1)).join(broadcast(t2))
        .select(col("_w1").as("w1"), col("_w2").as("w2"),
          col("_cab").as("pair_cnt"),
          r4(log((col("_cab") / col("_t2"))
            / ((col("_ca") / col("_t1")) * (col("_cb") / col("_t1")))))
            .as("pmi"))
        .orderBy(col("pmi").desc, col("w1"), col("w2")).limit(k),
      bigCnt, uniCnt)
  }

  /** Jensen-Shannon divergence between the token distributions of two
    * corpus slices — the drift report a pipeline runs when re-mixing
    * sources or comparing a new crawl against the current training mix
    * (JS because it is symmetric, bounded [0, ln 2], and defined even
    * where supports differ).
    *
    * Shape at 100 TB: ONE token-keyed shuffle builds the per-token
    * conditional counts (map-side combined; output = |vocab| rows); the
    * slice totals come from a separate single-row aggregate over
    * per-doc token COUNTS (map-side arithmetic, no explode) that
    * broadcasts back; the divergence itself is a single-row aggregate
    * over the vocab frame. No full-corpus row ever meets a
    * low-cardinality key.
    *
    * Output (one row): n_tokens_a/b, vocab_a/b, js_div (natural log,
    * 4 dp). Zero-count terms contribute 0 (lim p→0 of p·ln(p/m)).
    */
  def tokenDistributionDivergence(df: DataFrame, textCol: String,
                                  sideA: Column): DataFrame = {
    // fanOutForMapWork (r17): tokenize+explode otherwise runs
    // single-task in the scan stage on a one-row-group input
    val fanned = graft.sources.Tables.fanOutForMapWork(df)
    val counts = fanned
      .select(sideA.as("_a"), explode(tokens(col(textCol))).as("_tok"))
      .groupBy(col("_tok")).agg(
        sum(when(col("_a"), 1L).otherwise(0L)).as("_ca"),
        sum(when(col("_a"), 0L).otherwise(1L)).as("_cb"))
    val totals = fanned.select(sideA.as("_a"),
        tokenCount(col(textCol)).as("_n"))
      .agg(sum(when(col("_a"), col("_n")).otherwise(0L)).as("_na"),
        sum(when(col("_a"), 0L).otherwise(col("_n"))).as("_nb"))
    val pa = col("_ca").cast("double") / col("_na")
    val pb = col("_cb").cast("double") / col("_nb")
    val m = (pa + pb) / lit(2.0)
    val contrib =
      when(col("_ca") > 0L, pa * log(pa / m) / lit(2.0)).otherwise(lit(0.0)) +
      when(col("_cb") > 0L, pb * log(pb / m) / lit(2.0)).otherwise(lit(0.0))
    counts.join(broadcast(totals))
      .agg(max(col("_na")).as("n_tokens_a"),
        max(col("_nb")).as("n_tokens_b"),
        sum(when(col("_ca") > 0L, 1L).otherwise(0L)).as("vocab_a"),
        sum(when(col("_cb") > 0L, 1L).otherwise(0L)).as("vocab_b"),
        r4(sum(contrib)).as("js_div"))
  }

  /** Per-group one-vs-rest token-distribution drift: for every value of
    * `groupCol`, the Jensen-Shannon divergence between that group's
    * token distribution and the REST of the corpus — the per-source
    * drift table behind re-mixing decisions
    * ([[tokenDistributionDivergence]] is the two-slice special case;
    * this produces the full one-vs-rest report in one plan instead of
    * |groups| passes).
    *
    * Shape at 100 TB: ONE (group, token)-keyed corpus shuffle builds
    * the conditional counts (map-side combined; output = Σ per-group
    * vocab rows); the global per-token counts derive from THAT frame
    * (vocab-sized aggregate — no second corpus scan), group totals are
    * a |groups|-row broadcast. The one-vs-rest expansion is
    * vocab × |groups| rows — tokens ABSENT from a group still
    * contribute on the rest side (q = ct/(nt−ng) with p = 0), so the
    * expansion joins the global vocab against every group rather than
    * only observed (group, token) pairs; |groups| is small (sources,
    * shards, snapshots), so the blowup is bounded and never touches
    * corpus rows. Zero-count sides contribute 0 (lim p→0 of p·ln(p/m)).
    *
    * Output per group: (groupCol, n_tokens, vocab_terms, js_div) —
    * natural log, 4 dp.
    */
  def sourceDrift(df: DataFrame, groupCol: String, textCol: String)
  : DataFrame = {
    // (group, token) conditional counts — the one corpus-sized shuffle;
    // cached: the global vocab AND the group totals both derive from it
    val gt = graft.core.Caches.cached(
      graft.sources.Tables.fanOutForMapWork(
          df.select(col(groupCol), col(textCol)))
        .select(col(groupCol).as("_g"),
          explode(tokens(col(textCol))).as("_tok"))
        .groupBy(col("_g"), col("_tok")).agg(count(lit(1)).as("_cg")))
    val glob = gt.groupBy(col("_tok")).agg(sum(col("_cg")).as("_ct"))
    val ng = gt.groupBy(col("_g")).agg(sum(col("_cg")).as("_ng"))
    val nt = ng.agg(sum(col("_ng")).as("_nt"))
    val p = col("_cg").cast("double") / col("_ng")
    val q = (col("_ct") - col("_cg")).cast("double") / (col("_nt") - col("_ng"))
    val m = (p + q) / lit(2.0)
    val contrib =
      when(col("_cg") > 0L, p * log(p / m) / lit(2.0)).otherwise(lit(0.0)) +
      when(col("_ct") > col("_cg"), q * log(q / m) / lit(2.0))
        .otherwise(lit(0.0))
    graft.core.Caches.materializedThenRelease(
      glob.join(broadcast(ng)).join(broadcast(nt))
        .join(gt, Seq("_g", "_tok"), "left")
        .withColumn("_cg", coalesce(col("_cg"), lit(0L)))
        .groupBy(col("_g").as(groupCol))
        .agg(sum(col("_cg")).as("n_tokens"),
          sum(when(col("_cg") > 0L, 1L).otherwise(0L)).as("vocab_terms"),
          r4(sum(contrib)).as("js_div")),
      gt)
  }

  /** Concat-and-chunk sequence packing: assign every document its token
    * interval in the id-ordered concatenation of the corpus, and the
    * fixed-size chunk ids that interval lands in — the packing step of
    * an LLM pretraining pipeline (concatenate all text, split into
    * budget-sized training sequences; documents may straddle chunk
    * boundaries).
    *
    * The global running sum is a distributed HIERARCHICAL prefix-sum,
    * not one global-order window (which would sort the entire corpus in
    * a single reducer — unusable at 100 TB):
    *   1. bucket docs by contiguous id range (`bucketSize` ids/bucket)
    *      and aggregate per-bucket token totals — a map-side-combined
    *      shuffle on the high-cardinality bucket key;
    *   2. exclusive-prefix-sum the BUCKET SUMMARIES with one
    *      unpartitioned window — |corpus|/bucketSize rows (~1e5 at 1e11
    *      docs with the default 2^20), the only single-reducer step and
    *      it never touches full-size data;
    *   3. broadcast the bucket offsets back and add the within-bucket
    *      exclusive cumsum — a window partitioned by the bucket key.
    *
    * All-integer arithmetic end-to-end, so the assignment is exact and
    * engine-independent. Zero-length docs occupy their start chunk
    * (`greatest(len, 1)` in the last-chunk bound).
    *
    * Output: idCol, n_tokens, start_off, chunk_first, chunk_last.
    */
  def packSequences(df: DataFrame, idCol: String, len: Column,
                    budget: Long, bucketSize: Long = 1L << 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = df.select(col(idCol), len.cast("long").as("n_tokens"))
      .withColumn("_bucket", floor(col(idCol) / bucketSize).cast("long"))
    val bucketOffsets = docs.groupBy(col("_bucket"))
      .agg(sum(col("n_tokens")).as("_btot"))
      .withColumn("_boff", coalesce(
        sum(col("_btot")).over(Window.orderBy(col("_bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_bucket"), col("_boff"))
    val w = Window.partitionBy(col("_bucket")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.join(broadcast(bucketOffsets), Seq("_bucket"))
      .withColumn("start_off",
        col("_boff") + coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col(idCol), col("n_tokens"), col("start_off"),
        floor(col("start_off") / budget).cast("long").as("chunk_first"),
        floor((col("start_off") + greatest(col("n_tokens"), lit(1L)) - 1)
          / budget).cast("long").as("chunk_last"))
  }

  /** Pairwise vocabulary Jaccard between corpus slices — the
    * coarse-grained corpus-comparison matrix next to the
    * distributional drift reports ([[sourceDrift]] weighs token
    * FREQUENCIES; this asks only which tokens exist at all, the signal
    * for "do these crawls even speak the same language").
    *
    * Shape at 100 TB: one (group, token) DISTINCT (token-keyed,
    * map-side combined), per-group vocabulary sizes (tiny), and a
    * token-keyed self-join whose per-token output is bounded by
    * |groups|² — no corpus-sized pair stream can form. Output is the
    * |groups|²/2 upper triangle: (source_a < source_b, vocab sizes,
    * intersection, union, jaccard 4 dp). Jaccard is a ratio of exact
    * integers — engine-exact before the rounding.
    */
  def vocabularyOverlap(df: DataFrame, groupCol: String, textCol: String)
  : DataFrame = {
    val vocab = graft.core.Caches.cached(
      df.select(col(groupCol).as("_g"), explode(tokens(col(textCol))).as("_t"))
        .distinct())
    val sizes = vocab.groupBy(col("_g")).agg(count(lit(1)).as("_v"))
    val inter = vocab
      .join(vocab.select(col("_g").as("_g2"), col("_t")), Seq("_t"))
      .filter(col("_g") < col("_g2"))
      .groupBy(col("_g"), col("_g2"))
      .agg(count(lit(1)).as("n_common"))
    graft.core.Caches.materializedThenRelease(
      inter
        .join(broadcast(sizes.select(col("_g"), col("_v").as("vocab_a"))),
          Seq("_g"))
        .join(broadcast(sizes.select(col("_g").as("_g2"), col("_v").as("vocab_b"))),
          Seq("_g2"))
        .select(col("_g").as("source_a"), col("_g2").as("source_b"),
          col("vocab_a"), col("vocab_b"), col("n_common"),
          (col("vocab_a") + col("vocab_b") - col("n_common")).as("n_union"),
          round(col("n_common") /
            (col("vocab_a") + col("vocab_b") - col("n_common"))
              .cast("double") + lit(1e-9), 4).as("jaccard")),
      vocab)
  }

  /** Per-document token-distribution entropy (nats): −Σ p·ln p over the
    * document's unigram frequencies — the repetition/diversity quality
    * signal next to [[repetitionStats]] (a spam page repeating one
    * token scores ≈0; diverse prose approaches ln n_distinct). Emitted
    * with the token totals so a gate can combine them.
    *
    * One (doc, token) aggregate (doc-keyed, map-side combined) and one
    * doc-keyed rollup — both partition on the high-cardinality doc id.
    * The +0.0 normalizes −0.0 (single-token docs produce −sum(0)).
    */
  def tokenEntropy(df: DataFrame, idCol: String, textCol: String)
  : DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
    val p = col("_c") / col("_n").cast("double")
    // NO fan-out (r18): inert in r17; same explode-into-doc-keyed-
    // aggregate family as q84 (whose engaged placement regressed
    // 1.039→1.330 s) — removed with it per the measured rule
    df.select(col(idCol), col(textCol))
      .select(col(idCol), explode(tokens(col(textCol))).as("_t"))
      .groupBy(col(idCol), col("_t")).agg(count(lit(1)).as("_c"))
      .withColumn("_n", sum(col("_c")).over(w))
      .groupBy(col(idCol)).agg(
        max(col("_n")).cast("long").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        (round(-sum(p * log(p)) + lit(1e-9), 4) + lit(0.0)).as("entropy"))
  }

  /** DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every raw
    * document by how target-like its hashed-n-gram profile is,
    *
    *   log w(d) = Σ_b c_d(b) · (ln p̂_target(b) − ln p̂_raw(b))
    *
    * where b ranges over `buckets` hashed bigram features (feature =
    * md5-hash of "w₁ w₂" mod buckets — the same cross-engine md5
    * currency as [[Sampling.hashScore]]) and both distributions are
    * add-one smoothed over the bucket space. Sampling raw docs with
    * probability ∝ w(d) yields a target-distribution-matched subset —
    * the pretraining-mix selection step this engine's sampling
    * operators (weighted A-ES) then execute.
    *
    * Shape at 100 TB: the feature space is CLOSED (buckets is a
    * literal, e.g. 256–64k) so both distributions reduce to one
    * bucket-keyed aggregate of bounded output (map-side combined),
    * broadcast back over the per-doc bucket counts; the only
    * corpus-sized shuffle is the (doc, bucket)-keyed count — high
    * cardinality, no skew by construction of the hash. Target
    * membership is a Column predicate evaluated in the same scan, so
    * target and raw counts come out of ONE pass.
    *
    * Output: (idCol, n_feats, log_weight 4 dp) for docs with ≥1 bigram.
    */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
                        isTarget: Column, buckets: Int = 256,
                        seed: Long = 42L): DataFrame = {
    val staged = graft.sources.Tables.fanOutForMapWork(df)
      .select(col(idCol), isTarget.as("_tgt"),
        tokens(col(textCol)).as("_t"))
      .select(col(idCol), col("_tgt"), col("_t"), size(col("_t")).as("_n"))
    val feats = staged.filter(col("_n") >= 2)
      .select(col(idCol), col("_tgt"),
        explode(transform(sequence(lit(1), col("_n") - 1),
          i => pmod(Sampling.hashScore(
            concat_ws(" ", element_at(col("_t"), i),
              element_at(col("_t"), i + 1)), seed),
            lit(buckets.toLong)))).as("_b"))
    // one corpus pass → per-(doc, bucket) counts; the two global
    // distributions derive from it (≤buckets rows each)
    val docBucket = graft.core.Caches.cached(
      feats.groupBy(col(idCol), col("_tgt"), col("_b"))
        .agg(count(lit(1)).cast("double").as("_c")))
    val dist = docBucket.groupBy(col("_b"))
      .agg(sum(when(col("_tgt"), col("_c")).otherwise(0.0)).as("_ct"),
        sum(col("_c")).as("_cr"))
    val totals = docBucket.agg(
      sum(when(col("_tgt"), col("_c")).otherwise(0.0)).as("_nt"),
      sum(col("_c")).as("_nr"))
    val b = lit(buckets.toDouble)
    graft.core.Caches.materializedThenRelease(
      docBucket.join(broadcast(dist), Seq("_b")).join(broadcast(totals))
        .groupBy(col(idCol))
        .agg(sum(col("_c")).cast("long").as("n_feats"),
          (round(sum(col("_c") *
            (log((col("_ct") + lit(1.0)) / (col("_nt") + b)) -
             log((col("_cr") + lit(1.0)) / (col("_nr") + b))))
            + lit(1e-9), 4) + lit(0.0)).as("log_weight")),
      docBucket)
  }
}
