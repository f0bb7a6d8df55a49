package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ranked keyword retrieval over a document corpus — the BM25 scoring a
  * training-data pipeline uses to pull topical subsets ("give me the k
  * docs most about X") and a search engine uses to rank.
  *
  * Shuffle shape at 100 TB: the query's term list is tiny and LITERAL,
  * so per-document term frequencies are a map-side fold over the staged
  * token array — no (doc, term) explode, no shuffle keyed on terms
  * (which would be |terms| hot keys — maximal skew). The corpus-level
  * statistics BM25 needs (N, avgdl, per-term document frequency) reduce
  * to ONE single-row aggregate (partial map-side, |terms|+2 doubles per
  * task), broadcast back over the scored frame. Ranking is a global
  * top-k (TakeOrderedAndProject — per-partition heaps, never a full
  * sort). Total: one corpus scan, one 1-row exchange, one top-k.
  */
object Retrieval {

  private def r4(c: Column): Column = round(c + lit(1e-9), 4)

  /** BM25 scores for `terms` against every document; the standard
    * Robertson/Lucene formulation with the +1 idf floor:
    *
    *   idf(t)  = ln((N − df(t) + 0.5) / (df(t) + 0.5) + 1)
    *   s(D, Q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|D|/avgdl))
    *
    * Scores are rounded to 4 dp (with the half-boundary nudge) so the
    * ranking is reproducible across engines. Returns the top `k` rows
    * as (idCol, score), score descending, id ascending on ties.
    */
  def bm25(df: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k: Int = 10,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    // stage tokens once; each per-term tf references the SAME attribute
    // (≥2 refs keeps CollapseProject from re-inlining the tokenizer)
    val toksed = df
      .select(col(idCol), TextOps.tokens(col(textCol)).as("_toks"))
      .select(col(idCol), col("_toks"),
        size(col("_toks")).cast("double").as("_len"))
    val withTf = terms.indices.foldLeft(toksed) { (acc, i) =>
      acc.withColumn(s"_tf$i",
        size(filter(col("_toks"), t => t === lit(terms(i)))).cast("double"))
    }.drop("_toks")
    // ONE single-row corpus aggregate: N, avgdl, df per term
    val statAggs = (count(lit(1)).cast("double").as("_n") +:
      avg(col("_len")).as("_avgdl") +:
      terms.indices.map(i =>
        sum(when(col(s"_tf$i") > 0, 1.0).otherwise(0.0)).as(s"_df$i"))).toSeq
    val stats = withTf.agg(statAggs.head, statAggs.tail: _*)
    val score = terms.indices.map { i =>
      val tf = col(s"_tf$i")
      val idf = log((col("_n") - col(s"_df$i") + 0.5) /
        (col(s"_df$i") + 0.5) + 1)
      idf * (tf * (k1 + 1)) /
        (tf + lit(k1) * (lit(1 - b) + lit(b) * col("_len") / col("_avgdl")))
    }.reduce(_ + _)
    withTf.join(broadcast(stats))
      .withColumn("score", r4(score))
      .orderBy(col("score").desc, col(idCol))
      .select(col(idCol), col("score"))
      .limit(k)
  }

  /** Hybrid lexical+dense retrieval with reciprocal-rank fusion — the
    * standard two-tower serving shape (Cormack/Clarke/Büttcher RRF,
    * SIGIR'09): a BM25 candidate list and an embedding-cosine candidate
    * list are each cut to `candidates` and fused by
    *
    *   rrf(d) = Σ_lists 1 / (c + rank_list(d))
    *
    * with a document absent from a list contributing 0. RRF needs only
    * RANKS, never comparable scores, which is why it survives mixing
    * retrievers with incommensurable scales.
    *
    * Shuffle shape at 100 TB: each retriever ends in a k-bounded top-k
    * (BM25's TakeOrderedAndProject; the dense side's broadcast-query
    * scan + the same top-k), so the fusion join touches 2×`candidates`
    * rows, never the corpus — both rank windows and the full-outer
    * fusion join run on candidate lists of literal, bounded size. The
    * corpus is scanned exactly twice (once per retriever), each scan a
    * map-side fold with no per-term or per-dim shuffle.
    *
    * `queryVec` must be a single-row frame `(q_vec array<float>)` —
    * broadcast into the corpus scan. Returns top `k` of
    * (idCol, lex_rank, dense_rank, rrf), rrf descending, id ascending;
    * absent ranks are null.
    */
  def hybridRrf(docs: DataFrame, emb: DataFrame, queryVec: DataFrame,
                idCol: String, textCol: String, embIdCol: String,
                vecCol: String, terms: Seq[String],
                candidates: Int = 50, k: Int = 10, c: Int = 60)
  : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // rank windows are unpartitioned BY CONSTRUCTION over ≤candidates
    // rows (post-top-k) — bounded, not a corpus funnel
    val lex = bm25(docs, idCol, textCol, terms, k = candidates)
      .withColumn("lex_rank", row_number().over(
        Window.orderBy(col("score").desc, col(idCol))).cast("long"))
      .select(col(idCol).as("_id"), col("lex_rank"))
    val dense = emb
      .select(col(embIdCol).as("_id"), col(vecCol).as("_v"))
      .join(broadcast(queryVec))
      .withColumn("cos", Similarity.cosine(col("_v"), col("q_vec")))
      .orderBy(col("cos").desc, col("_id"))
      .limit(candidates)
      .withColumn("dense_rank", row_number().over(
        Window.orderBy(col("cos").desc, col("_id"))).cast("long"))
      .select(col("_id"), col("dense_rank"))
    // 6 dp, not the module's 4: adjacent deep ranks differ by
    // ~1/(c+k)² ≈ 8e-5, inside 4-dp aliasing
    lex.join(dense, Seq("_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(c.toDouble) + col("lex_rank")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(c.toDouble) + col("dense_rank")), lit(0.0))
        + lit(1e-9), 6))
      .orderBy(col("rrf").desc, col("_id"))
      .select(col("_id").as(idCol), col("lex_rank"), col("dense_rank"),
        col("rrf"))
      .limit(k)
  }

  /** Offline ranking-quality evaluation — the metrics a retrieval /
    * recommendation pipeline reports per query before shipping an index
    * or a model: precision@k, MRR, and binary NDCG@k
    * (DCG = Σ rel_i / log₂(i+1), ideal DCG = the same sum over the
    * first n_rel positions).
    *
    * Input contract: `ranked` holds one row per (query, result) with a
    * 1-based rank ≤ k and a 0/1 relevance — i.e. the output of any of
    * this module's retrievers joined against ground-truth labels.
    * Shape at 100 TB: the input is ALREADY k-bounded per query (the
    * retriever's top-k did that), so this is one query-keyed partial
    * aggregate over ≤k rows per query plus a literal-length IDCG fold —
    * metric computation can never become the bottleneck; the retriever
    * is the corpus-sized stage.
    *
    * Output: (queryCol, n_rel, p_at_k, mrr, ndcg) — exact rationals for
    * p@k and MRR; DCG/IDCG rounded (4 dp) since their sum order is
    * engine-dependent.
    */
  def rankingMetrics(ranked: DataFrame, queryCol: String, rankCol: String,
                     relCol: String, k: Int): DataFrame = {
    val agg = ranked.groupBy(col(queryCol)).agg(
      sum(col(relCol)).cast("long").as("n_rel"),
      (sum(col(relCol)) / lit(k.toDouble)).as("p_at_k"),
      min(when(col(relCol) === 1, col(rankCol))).as("_first"),
      sum(when(col(relCol) === 1,
        lit(1.0) / log2(col(rankCol) + lit(1.0))).otherwise(lit(0.0)))
        .as("_dcg"))
    agg.select(col(queryCol), col("n_rel"), col("p_at_k"),
        coalesce(lit(1.0) / col("_first"), lit(0.0)).as("mrr"),
        when(col("n_rel") === 0L, lit(0.0)).otherwise(
          round(col("_dcg") / aggregate(sequence(lit(1L), col("n_rel")),
            lit(0.0), (acc, i) => acc + lit(1.0) / log2(i + lit(1.0)))
            + lit(1e-9), 4)).as("ndcg"))
  }

  /** Reliability/calibration curve: equal-width probability bins of a
    * predicted score in [0, 1] vs the observed positive rate — the
    * companion eval to [[rankingMetrics]] (is the model's CONFIDENCE
    * honest, not just its ordering) and the input to an ECE number
    * (Σ n_b/N·|avg_pred−obs_rate|, reported per-bin here).
    *
    * Bin id is `floor(pred·bins)` clamped to bins−1 — when `pred` is an
    * exact rational (a count ratio) the chain is correctly-rounded
    * double arithmetic, so bin assignment is deterministic cross-engine
    * (no percentile/ntile tie machinery needed). One map-side bin tag +
    * one `bins`-key map-side-combined aggregate: corpus-sized work is a
    * single scan regardless of N.
    */
  def calibrationBins(scored: DataFrame, predCol: String, labelCol: String,
                      bins: Int = 10): DataFrame = {
    val bin = least(floor(col(predCol) * bins), lit(bins - 1)).cast("long")
    scored.groupBy(bin.as("bin")).agg(
        count(lit(1)).as("n"),
        avg(col(predCol)).as("_p"),
        avg(col(labelCol).cast("double")).as("_y"))
      .select(col("bin"), col("n"),
        round(col("_p") + lit(1e-9), 4).as("avg_pred"),
        round(col("_y") + lit(1e-9), 4).as("obs_rate"),
        round(abs(col("_p") - col("_y")) + lit(1e-9), 4).as("abs_gap"))
  }
}
