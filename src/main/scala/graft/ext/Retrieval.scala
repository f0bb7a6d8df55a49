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
}
