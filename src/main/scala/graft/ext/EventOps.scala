package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch event-stream analytics (the streaming variants live in
  * [[graft.streaming.EventStreams]]).
  */
object EventOps {

  /** Ordered funnel conversion: how many users performed step 1, then
    * step 2 STRICTLY AFTER their first step 1, then step 3 strictly
    * after that, … — the product-analytics query behind every
    * conversion dashboard. First-touch semantics: each step anchors at
    * the user's EARLIEST qualifying occurrence (the standard funnel
    * definition, and a deterministic one).
    *
    * Shape: one aggregate per step over the type-filtered events —
    * every shuffle is keyed on the high-cardinality user id, the
    * surviving-user frame shrinks monotonically step over step, and the
    * step counts are single-row aggregates. No windows, no sorts; with
    * `steps.length` small (funnels are 3–6 steps) the whole thing is a
    * short chain of hash joins a 100 TB events table handles the same
    * way it handles any per-user aggregate.
    *
    * Output: (step_idx 1-based, step, n_users), one row per step.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var survivors = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("_t"))
    def stepCount(idx: Int, name: String, frame: DataFrame): DataFrame =
      frame.agg(count(lit(1)).as("n_users"))
        .select(lit(idx.toLong).as("step_idx"), lit(name).as("step"),
          col("n_users"))
    var out = stepCount(1, steps.head, survivors)
    steps.zipWithIndex.drop(1).foreach { case (st, i) =>
      survivors = events.filter(col(typeCol) === st)
        .join(survivors, Seq(userCol))
        .filter(col(tsCol) > col("_t"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("_t"))
      out = out.unionByName(stepCount(i + 1, st, survivors))
    }
    out
  }

  /** Per-user rolling aggregate over a TIME range (not a row count):
    * avg of `valueCol` over the trailing `windowMicros` of event time —
    * the feature-engineering window ("activity in the last hour") where
    * row-count frames are wrong because event density varies.
    *
    * The window partitions on the HIGH-cardinality user id (safe shape)
    * and orders by epoch micros so the range frame is numeric — Spark's
    * rangeBetween needs a numeric ordering key, and integer micros
    * compare exactly across engines where interval arithmetic might
    * not.
    */
  def rollingUserAvg(events: DataFrame, userCol: String, tsCol: String,
                     valueCol: String, windowMicros: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("_us"))
      .rangeBetween(-windowMicros, 0)
    events
      .withColumn("_us", unix_micros(col(tsCol)))
      .withColumn("roll_avg",
        round(avg(col(valueCol)).over(w) + lit(1e-9), 4))
      .drop("_us")
  }

  /** Regular-grid resampling with forward fill: one row per (user,
    * hourly slot) carrying the last observed value at or before the
    * slot — the gap-filling step that turns irregular event streams
    * into the fixed-interval series feature pipelines and joins
    * expect. NULL until a user's first observation (no back-fill).
    *
    * Shape: the slot grid is generated IN the plan (`sequence` +
    * explode over the distinct-user frame — |users|×slots rows, no
    * driver loop); events and slots are unioned and forward-filled by
    * ONE window partitioned on the high-cardinality user id with a
    * rows-frame `last(ignoreNulls)`. An event landing exactly on a
    * slot boundary fills that slot (events order before slots at equal
    * timestamps).
    */
  def resampleHourlyFfill(events: DataFrame, userCol: String,
                          tsCol: String, valueCol: String,
                          startTs: String, slots: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val start = unix_micros(to_timestamp(lit(startTs)))
    val grid = events.select(col(userCol)).distinct()
      .select(col(userCol),
        explode(sequence(lit(0), lit(slots - 1))).as("slot"))
      .select(col(userCol), col("slot"),
        (start + col("slot").cast("long") * lit(3600L * 1000000L))
          .as("_us"),
        lit(null).cast("double").as("_v"), lit(1).as("_pri"))
    val obs = events.select(col(userCol), lit(null).cast("int").as("slot"),
      unix_micros(col(tsCol)).as("_us"), col(valueCol).cast("double").as("_v"),
      lit(0).as("_pri"))
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("_us"), col("_pri"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.unionByName(obs)
      .withColumn("value_ffill",
        round(last(col("_v"), ignoreNulls = true).over(w) + lit(1e-9), 4))
      .filter(col("slot").isNotNull)
      .select(col(userCol), col("slot").cast("long").as("slot"),
        col("value_ffill"))
  }

  /** Weekly cohort retention: bucket each user by their FIRST active
    * week (the cohort), then count distinct users per (cohort week,
    * weeks-since-cohort) — the retention triangle behind every growth
    * dashboard.
    *
    * Shapes: one distinct over (user, week) — the only corpus-sized
    * shuffle, keyed on the high-cardinality user — then a per-user min
    * (map-side combined), a user-keyed join, and a tiny final aggregate
    * (|cohorts| × |offsets| rows).
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String)
  : DataFrame = {
    val weeks = events.select(col(userCol),
        date_trunc("week", col(tsCol)).cast("date").as("_w"))
      .distinct()
    val cohorts = weeks.groupBy(col(userCol))
      .agg(min(col("_w")).as("cohort_week"))
    weeks.join(cohorts, Seq(userCol))
      .groupBy(col("cohort_week"),
        (datediff(col("_w"), col("cohort_week")) / 7).cast("long")
          .as("week_offset"))
      .agg(count_distinct(col(userCol)).as("n_users"))
  }
}
