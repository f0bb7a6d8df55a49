package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface over the events table: the same windowed
  * aggregations the batch queries declare, run incrementally with
  * watermarked state. Batch/stream share one transform function, so the
  * semantics are verified once (against the DuckDB oracle, in batch) and
  * reused streaming.
  */
object EventStreams {

  /** Tumbling-window counts per event_type. Works on both batch and
    * streaming DataFrames (identical plan semantics — that is the point
    * of Structured Streaming).
    */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").cast("string").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Session windows per user: events within `gap` of each other merge
    * into one session (built-in session_window — state-store backed when
    * streaming).
    */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("session_window.start").cast("string").as("session_start"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Streaming exact dedup on event_id, state bounded by the watermark:
    * duplicates arriving within `retention` of the original are dropped;
    * state for older keys is evicted (unbounded dropDuplicates state
    * would otherwise grow forever — the non-negotiable at 100 TB/day).
    */
  def dedupEvents(events: DataFrame, retention: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", retention)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream inner join: (purchase, click) pairs for the same user
    * with the click in [purchase_ts, purchase_ts + gap). Both sides are
    * watermarked and the join condition carries the event-time bound, so
    * each side's buffered state is evicted once the other side's
    * watermark passes — bounded state, the stream-stream analogue of
    * Relational.rangeJoinBucketed (same pair semantics; the parity spec
    * compares them).
    *
    * Works on batch DataFrames too (watermarks are skipped — batch
    * needs none).
    */
  def purchaseClickPairs(events: DataFrame, gap: String = "10 minutes")
  : DataFrame = {
    def wm(df: DataFrame, tsCol: String) =
      if (df.isStreaming) df.withWatermark(tsCol, "1 hour") else df
    val purchases = wm(events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts")), "ts")
    val clicks = wm(events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"),
        col("event_id").as("click_id"), col("ts").as("click_ts")), "click_ts")
    purchases.join(clicks,
      col("user_id") === col("c_user_id") &&
        col("click_ts") >= col("ts") &&
        col("click_ts") < col("ts") + expr(s"INTERVAL $gap"))
      .select(col("user_id"), col("event_id"), col("click_id"))
  }

  /** Open a file-backed stream over an events parquet directory with the
    * batch table's schema. `maxFilesPerTrigger=1` gives deterministic
    * incremental batches in tests.
    */
  def readEventStream(spark: SparkSession, dir: String, schema: StructType)
  : DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

  /** Run a streaming query to completion against a finite source (test
    * harness: memory sink + processAllAvailable), returning the sink table.
    */
  def runToMemorySink(spark: SparkSession, df: DataFrame, name: String,
                      outputMode: String = "append"): DataFrame = {
    val q: StreamingQuery = df.writeStream
      .format("memory").queryName(name).outputMode(outputMode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
