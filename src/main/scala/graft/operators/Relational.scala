package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The relational operator surface of the reference, re-expressed as
  * composable DataFrame transformations (SURVEY.md §2.2–2.6).
  *
  * Everything here is declarative Catalyst plans — no collect(), no
  * driver-side loops — so predicate pushdown, column pruning, partial
  * aggregation and broadcast-join selection apply automatically, and every
  * operator scales by partitioning rather than by driver memory.
  */
object Relational {

  /** UNION ALL by position (reference `model-als.py:107`). */
  def unionAll(dfs: Seq[DataFrame]): DataFrame = dfs.reduce(_.union(_))

  /** union + any-null drop + key dedup — the ratings-prep spine
    * (reference `model-als.py:107-109`).
    *
    * The reference's `dropDuplicates(keys)` keeps an arbitrary row per key
    * (fine for ALS input, where any one rating per (user, item) is valid);
    * we expose that fast path directly.
    */
  def unionDedup(dfs: Seq[DataFrame], keys: Seq[String]): DataFrame =
    unionAll(dfs).na.drop().dropDuplicates(keys)

  /** Deterministic dedup: keep the first row per key group under `order`
    * (SURVEY.md §4.2.5 — the reproducible variant of `dropDuplicates`).
    * One shuffle on the key columns; the window sort is per-group.
    */
  def dedupFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Per-key average (reference `model-als.py:145`). Partial (map-side)
    * aggregation before the shuffle is automatic for avg.
    */
  def avgBy(df: DataFrame, key: String, value: String, as: String): DataFrame =
    df.groupBy(col(key)).agg(avg(col(value)).as(as))

  /** orderBy-desc + limit top-k (reference `model-als.py:151-153`).
    * Catalyst fuses this into TakeOrderedAndProject — per-partition
    * heaps + a k-row merge on the driver, no global sort. That is the
    * shape that survives a 100 TB input.
    */
  def topK(df: DataFrame, k: Int, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** Per-group top-k via row_number window — the distributed analogue of
    * the reference's per-user recommendation cut (reference
    * `model-als.py:132`), usable for any (group, order) pair.
    */
  def topKPerGroup(df: DataFrame, k: Int, groupCols: Seq[String],
                   order: Seq[Column], rankCol: String = "rank"): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w).cast("long"))
      .filter(col(rankCol) <= k)
  }
}
