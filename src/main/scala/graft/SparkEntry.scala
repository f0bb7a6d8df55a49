package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Profile, Recommend, Relational}
import graft.sources.Tables

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, with DuckDB-equivalent SQL in `oracleSql`.
  *
  * Conventions shared by every (query, oracle) pair so the driver's
  * hash-compare is deterministic:
  *   - integer outputs cast to BIGINT on both sides (Spark size/row_number
  *     are 32-bit; DuckDB count/len are 64-bit);
  *   - double aggregates of non-integer values rounded (4 dp) on both
  *     sides — summation order differs between engines;
  *   - timestamps cast to DATE in outputs;
  *   - every result carries an explicit total-order ORDER BY.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Flagship query (reference pipeline shape, `model-als.py:141-158`):
    * per-item community average → broadcast-join metadata → filter
    * category → top-5. Driver smoke-checks rows>0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    q01(spark, "/root/testdata/sf0.001")

  private def q01(s: SparkSession, dir: String): DataFrame =
    Recommend.topRatedByCategory(
      ratings = t(s, dir, "lineitem"), items = t(s, dir, "part"),
      itemKey = "l_partkey", ratingCol = "l_quantity", itemsKey = "p_partkey",
      categoryFilter = col("p_type") === "PROMO",
      select = Seq(col("p_partkey"), col("p_name"), col("p_brand")),
      k = 5, tieBreak = col("p_partkey"))

  /** Queries with no DuckDB-expressible oracle (driver falls back to a
    * rows-only check). Keep this list minimal and justified.
    */
  def rowsOnly: Set[String] = Set()

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- reference relational surface (SURVEY.md §2) ----
    "q01_top5_rated_parts" -> ((s, dir) => q01(s, dir)),

    "q02_avg_rating_by_item" -> ((s, dir) =>
      t(s, dir, "lineitem").groupBy(col("l_partkey"))
        .agg(avg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_partkey"))),

    "q03_union_distinct" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      def slice(lo: String, hi: String) = li
        .filter(col("l_shipdate") >= to_timestamp(lit(lo)) &&
          col("l_shipdate") < to_timestamp(lit(hi)))
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_shipdate").cast("date").as("ship_date"))
      Relational.unionAll(Seq(
          slice("1997-01-01 00:00:00", "1999-01-01 00:00:00"),
          slice("1998-01-01 00:00:00", "2000-01-01 00:00:00")))
        .distinct()
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("ship_date"))
    }),

    "q04_dedup_first_event" -> ((s, dir) =>
      Relational.dedupFirst(t(s, dir, "events"),
          keys = Seq("user_id", "event_type"),
          order = Seq(col("ts"), col("event_id")))
        .select(col("user_id"), col("event_type"), col("event_id"))
        .orderBy(col("user_id"), col("event_type"))),

    "q05_revenue_by_nation" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region")
      // fact-fact join first (shuffle on orderkey), then broadcast dims
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    "q06_semi_join_big_spenders" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val big = t(s, dir, "orders").filter(col("o_totalprice") > 300000)
      cust.join(big, cust("c_custkey") === big("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    "q07_anti_join_no_urgent" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val urgent = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
      cust.join(urgent, cust("c_custkey") === urgent("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    "q08_null_profile_orders" -> ((s, dir) =>
      Profile.nullProfile(t(s, dir, "orders"))),

    "q09_summary_stats" -> ((s, dir) =>
      Profile.summaryStats(t(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount"))
        .orderBy(col("column_name"))),

    "q10_top_categories" -> ((s, dir) =>
      Profile.topCategories(t(s, dir, "events"), "event_type", 20)),

    "q11_window_topk_orders" -> ((s, dir) =>
      Relational.topKPerGroup(t(s, dir, "orders"), 3,
          groupCols = Seq("o_custkey"),
          order = Seq(col("o_totalprice").desc, col("o_orderkey")))
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rank"))
        .orderBy(col("o_custkey"), col("rank"))),

    "q12_running_sum" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "lineitem")
        .withColumn("running_qty", sum(col("l_quantity")).over(w))
        .select(col("l_suppkey"), col("l_shipdate").cast("date").as("ship_date"),
          col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          col("running_qty"))
        .orderBy(col("l_suppkey"), col("ship_date"), col("l_orderkey"),
          col("l_linenumber"))
    })
  )

  /** DuckDB-equivalent SQL per query (same column names, same ordering). */
  def oracleSql: Map[String, String] = Map(
    "q01_top5_rated_parts" ->
      """SELECT p_partkey, p_name, p_brand, avg_rating
        |FROM (SELECT l_partkey, avg(l_quantity) AS avg_rating
        |      FROM lineitem GROUP BY l_partkey) r
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_type = 'PROMO'
        |ORDER BY avg_rating DESC, p_partkey LIMIT 5""".stripMargin,

    "q02_avg_rating_by_item" ->
      """SELECT l_partkey, avg(l_quantity) AS avg_qty,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_partkey ORDER BY l_partkey""".stripMargin,

    "q03_union_distinct" ->
      """SELECT DISTINCT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |       CAST(l_shipdate AS DATE) AS ship_date
        |FROM (SELECT * FROM lineitem
        |      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
        |      UNION ALL
        |      SELECT * FROM lineitem
        |      WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '2000-01-01')
        |ORDER BY l_orderkey, l_linenumber, ship_date""".stripMargin,

    "q04_dedup_first_event" ->
      """SELECT user_id, event_type, event_id FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id, event_type
        |                           ORDER BY ts, event_id) = 1
        |ORDER BY user_id, event_type""".stripMargin,

    "q05_revenue_by_nation" ->
      """SELECT r_name, n_name,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |       CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q06_semi_join_big_spenders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,

    "q07_anti_join_no_urgent" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q08_null_profile_orders" -> {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      cols.map { c =>
        s"""count(CASE WHEN (CAST($c AS VARCHAR) LIKE '%None%'
           | OR CAST($c AS VARCHAR) LIKE '%NULL%' OR CAST($c AS VARCHAR) = ''
           | OR $c IS NULL OR CAST($c AS VARCHAR) LIKE '%Unknown%'
           | OR isnan(TRY_CAST(CAST($c AS VARCHAR) AS DOUBLE))) THEN 1 END) AS $c"""
          .stripMargin.replace("\n", "")
      }.mkString("SELECT ", ", ", " FROM orders")
    },

    "q09_summary_stats" ->
      Seq("l_quantity", "l_extendedprice", "l_discount").map { c =>
        s"""SELECT '$c' AS column_name, CAST(count($c) AS BIGINT) AS n,
           | round(avg($c), 4) AS mean, round(stddev_samp($c), 4) AS stddev,
           | CAST(min($c) AS DOUBLE) AS min, CAST(max($c) AS DOUBLE) AS max
           | FROM lineitem""".stripMargin.replace("\n", "")
      }.mkString("", " UNION ALL ", " ORDER BY column_name"),

    "q10_top_categories" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events
        |GROUP BY event_type ORDER BY n DESC, event_type LIMIT 20""".stripMargin,

    "q11_window_topk_orders" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         CAST(row_number() OVER (PARTITION BY o_custkey
        |              ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rank
        |  FROM orders) WHERE rank <= 3
        |ORDER BY o_custkey, rank""".stripMargin,

    "q12_running_sum" ->
      """SELECT l_suppkey, CAST(l_shipdate AS DATE) AS ship_date, l_orderkey,
        |       CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |       sum(l_quantity) OVER (PARTITION BY l_suppkey
        |           ORDER BY l_shipdate, l_orderkey, l_linenumber
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
        |FROM lineitem
        |ORDER BY l_suppkey, ship_date, l_orderkey, l_linenumber""".stripMargin
  )
}
