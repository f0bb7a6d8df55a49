package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's enrichment pipeline shape (reference
  * `model-als.py:141-158`): per-item community average → left-join item
  * metadata → filter by category → top-k by average.
  *
  * Generic over (ratings, items) so it runs both on the reference's
  * anime/ratings schema and on the harness star schema (FIXTURES.md maps
  * lineitem→ratings, part→items).
  */
object Recommend {

  /** @param ratings     fact table (large — stays distributed)
    * @param items       item metadata (small dim — broadcast)
    * @param itemKey     join key column name in `ratings`
    * @param ratingCol   value column in `ratings` to average
    * @param itemsKey    join key column name in `items`
    * @param categoryFilter predicate on item columns (e.g. Type === "TV")
    * @param select      output columns (from items + "avg_rating")
    * @param k           result size
    *
    * The aggregate runs on the fact table FIRST (shrinking it to
    * one-row-per-item) and only then joins the dimension — the join input
    * is |items|, not |ratings|. The dim side is broadcast explicitly: at
    * 100 TB the fact side must never shuffle for a small-dimension join.
    * Final sort+limit fuses to TakeOrderedAndProject.
    */
  def topRatedByCategory(ratings: DataFrame, items: DataFrame,
                         itemKey: String, ratingCol: String, itemsKey: String,
                         categoryFilter: Column, select: Seq[Column],
                         k: Int, tieBreak: Column): DataFrame = {
    val avgRatings = ratings.groupBy(col(itemKey))
      .agg(avg(col(ratingCol)).as("avg_rating"))
    avgRatings
      .join(broadcast(items.filter(categoryFilter)),
        avgRatings(itemKey) === items(itemsKey), "inner")
      .select(select :+ col("avg_rating"): _*)
      .orderBy(col("avg_rating").desc, tieBreak)
      .limit(k)
  }

  /** Item-item co-occurrence ("bought together") with lift — the
    * collaborative signal that needs no model fit, and the classic
    * basket self-join whose cost is Σ|basket|², not |rows|.
    *
    * Scale levers, in order of importance:
    *  - `maxBasket` CAPS each basket before the self-join (keep the
    *    `maxBasket` smallest item ids — deterministic, so the oracle
    *    reproduces the cap exactly). One pathological basket of 10⁶
    *    items would otherwise contribute 10¹² pairs; with the cap every
    *    basket contributes ≤ maxBasket². The capping window partitions
    *    on the HIGH-cardinality basket id — the safe window shape.
    *  - the pair aggregate shuffles on (item_a, item_b) — high
    *    cardinality by construction.
    *  - `minPairCount` prunes the singleton-pair tail BEFORE the lift
    *    join, which at corpus scale is most of the pair stream.
    *
    * lift = pair_cnt · n_baskets / (cnt_a · cnt_b) over the CAPPED
    * baskets (consistent numerator and denominators). Output: top-k
    * pairs by (pair_cnt desc, item_a, item_b) — a total order.
    */
  def cooccurrence(df: DataFrame, basketCol: String, itemCol: String,
                   maxBasket: Int = 64, minPairCount: Long = 2L,
                   k: Int = 50): DataFrame = {
    // cached: referenced by the basket total, the item counts, and BOTH
    // sides of the pair self-join — uncached, the distinct+cap window
    // would run four times
    val capped = cappedBaskets(df, basketCol, itemCol, maxBasket).cache()
    val totals = capped.agg(count_distinct(col("_b")).as("_nb"))
    val itemCnt = capped.groupBy(col("_i")).agg(count(lit(1)).as("_c"))
    pairsOf(capped, minPairCount)
      .join(itemCnt.select(col("_i").as("item_a"), col("_c").as("_ca")),
        Seq("item_a"))
      .join(itemCnt.select(col("_i").as("item_b"), col("_c").as("_cb")),
        Seq("item_b"))
      .join(broadcast(totals))
      .select(col("item_a"), col("item_b"), col("pair_cnt"),
        round((col("pair_cnt") * col("_nb")) / (col("_ca") * col("_cb"))
          + lit(1e-9), 4).as("lift"))
      .orderBy(col("pair_cnt").desc, col("item_a"), col("item_b"))
      .limit(k)
  }

  /** Distinct (basket `_b`, item `_i`) pairs with the deterministic
    * `maxBasket` cap applied (keep the maxBasket smallest item ids per
    * basket) — the shared first stage of [[cooccurrence]] and
    * [[basketPairs]].
    */
  private[graft] def cappedBaskets(df: DataFrame, basketCol: String,
                                   itemCol: String, maxBasket: Int)
  : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val items = df.select(col(basketCol).as("_b"), col(itemCol).as("_i"))
      .distinct()
    val w = Window.partitionBy(col("_b")).orderBy(col("_i"))
    items.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= maxBasket).drop("_rn")
  }

  /** The raw co-occurrence pair list (item_a < item_b, pair_cnt ≥
    * minPairCount) over capped baskets — [[cooccurrence]] without the
    * lift/top-k stage; also the edge list for graph analytics
    * ([[graft.ext.Graph.pageRank]] over the item-affinity graph).
    */
  def basketPairs(df: DataFrame, basketCol: String, itemCol: String,
                  maxBasket: Int = 64, minPairCount: Long = 2L)
  : DataFrame =
    // cached for the same reason as in cooccurrence: the self-join
    // references the capped frame twice
    pairsOf(cappedBaskets(df, basketCol, itemCol, maxBasket).cache(),
      minPairCount)

  private def pairsOf(capped: DataFrame, minPairCount: Long): DataFrame =
    capped
      .join(capped.select(col("_b").as("_b2"), col("_i").as("item_b")),
        col("_b") === col("_b2") && col("_i") < col("item_b"))
      .groupBy(col("_i").as("item_a"), col("item_b"))
      .agg(count(lit(1)).as("pair_cnt"))
      .filter(col("pair_cnt") >= minPairCount)
}
