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
}
