package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
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

  /** Typed result of one user session. Timestamps in epoch micros. */
  case class Session(user_id: Long, session_start: Long, n_events: Long,
                     sum_value: Double)

  /** Open sessions carried between micro-batches. */
  case class SessionState(start: Long, lastTs: Long, n: Long, sum: Double)

  /** Custom stateful sessionization via flatMapGroupsWithState — the
    * escape hatch for session semantics `session_window` can't express
    * (e.g. per-user dynamic gaps, session caps, custom merge logic).
    * This implementation reproduces the fixed-gap semantics exactly so
    * the spec can pin it against the built-in session_window aggregate.
    *
    * State per user is ONE open session (bounded); with event-time
    * timeout + watermark the state store evicts idle users. Batch mode
    * runs the same function with each group's full row set.
    */
  def sessionizeWithState(events: DataFrame, gapMicros: Long,
                          watermark: String = "1 hour")
  : Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val streaming = events.isStreaming // don't capture the frame itself

    def emit(uid: Long, s: SessionState): Session =
      Session(uid, s.start, s.n, math.rint(s.sum * 100) / 100)

    def micros(ts: java.sql.Timestamp): Long = {
      val i = ts.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }

    def fn(uid: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)],
           state: GroupState[SessionState]): Iterator[Session] = {
      val sorted = rows.map { case (_, ts, v) => (micros(ts), v) }
        .toSeq.sortBy(_._1)
      var open = state.getOption
      val out = Seq.newBuilder[Session]
      sorted.foreach { case (ts, v) =>
        open match {
          case Some(s) if ts - s.lastTs < gapMicros =>
            open = Some(s.copy(lastTs = ts, n = s.n + 1, sum = s.sum + v))
          case Some(s) =>
            out += emit(uid, s)
            open = Some(SessionState(ts, ts, 1, v))
          case None =>
            open = Some(SessionState(ts, ts, 1, v))
        }
      }
      open match {
        case Some(s) if state.hasTimedOut || !streaming =>
          out += emit(uid, s); state.remove()
        case Some(s) =>
          state.update(s)
          state.setTimeoutTimestamp((s.lastTs + gapMicros) / 1000)
        case None => state.remove()
      }
      out.result().iterator
    }

    // the watermark-annotated ts column must reach the stateful operator
    // UNTRANSFORMED (any function of it strips the delay metadata the
    // event-time-timeout check looks for); convert to micros inside fn
    val base =
      if (streaming) events.withWatermark("ts", watermark) else events
    base
      .select(col("user_id").cast("long"), col("ts"),
        col("value").cast("double"))
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }

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

  /** foreachBatch sink: run `write(batchDf, batchId)` for every
    * micro-batch — the escape hatch for sinks with no native streaming
    * writer (JDBC upserts, MERGE INTO, multi-table fan-out). The callback
    * receives a plain batch DataFrame, so the full batch API (including
    * writers that do not support streaming) is available; `batchId` is
    * the idempotence key — a replayed batch after recovery carries the
    * same id, so a transactional sink should commit (id, data) atomically
    * and skip ids it has seen.
    */
  def runForeachBatch(df: DataFrame, outputMode: String = "update",
                      checkpoint: Option[String] = None)
                     (write: (DataFrame, Long) => Unit): StreamingQuery = {
    val w = df.writeStream.outputMode(outputMode)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        write(batch.toDF(), id)
      }
    // with a checkpoint location the query is RESUMABLE: offsets, the
    // file-source seen-files log, and every state-store version commit
    // there, so a restarted query continues from the last committed
    // batch instead of reprocessing — the recovery seam
    // StreamingRecoverySpec pins
    checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start()
  }

  /** Run `body` (typically: define + start + drain a streaming query)
    * with `spark.sql.shuffle.partitions` temporarily set to `n`,
    * restoring the previous value after. A streaming query fixes its
    * state-store partition count from this conf at FIRST start, and
    * every micro-batch then commits one state-store delta per
    * partition — for a small-keyspace aggregation (thousands of
    * windows/sessions), 32 partitions × k batches is pure fixed
    * overhead: most deltas carry a handful of keys. 8 partitions cuts
    * the per-batch commit fan-out 4× without touching semantics. At
    * production scale the caller simply doesn't wrap (or wraps with a
    * key-count-appropriate n) — the knob is per-query, not global.
    */
  def withShufflePartitions[T](spark: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, prev)
  }

  /** Materialize a finite stream through the foreachBatch parquet sink:
    * complete-mode output overwrites `outDir` on every micro-batch, so
    * after `processAllAvailable` the directory holds exactly the final
    * aggregate state. This is the streaming-path RESULT (file source →
    * incremental state → sink), not a batch re-run of the same transform
    * — the one seam batch-parity testing can't cover, which is why q64
    * declares it as an oracle-checked query.
    *
    * Complete mode (not append) because a finite input's watermark never
    * passes the last window — append would withhold it forever; complete
    * re-emits full state, and mode("overwrite") keeps the sink idempotent
    * per batch.
    */
  def materializeToParquet(spark: SparkSession, df: DataFrame,
                           outDir: String): DataFrame = {
    val q = runForeachBatch(df, "complete") { (batch, _) =>
      batch.write.mode("overwrite").parquet(outDir)
    }
    q.processAllAvailable()
    q.stop()
    spark.read.parquet(outDir)
  }

  /** APPEND-mode twin of [[materializeToParquet]]: finalized rows are
    * emitted exactly once as the watermark passes them, and each
    * micro-batch's emission is appended to `outDir`; after
    * `processAllAvailable` the directory holds every CLOSED window.
    *
    * This is the SCALE-correct mode for session windows: complete mode
    * works (StreamingSpec pins it) but retains every session ever seen
    * in the state store and re-emits all of them per trigger —
    * unbounded state on an unbounded stream, a test-only convenience.
    * Append + watermark evicts closed sessions, keeping state
    * proportional to OPEN sessions, which is the only shape that
    * survives production ingestion. Update mode is no alternative for
    * a file sink: it re-emits a growing session every batch, and a
    * merged session must REPLACE the partials it absorbed — an
    * upsert-with-delete only a transactional sink expresses. The
    * caller makes the finite input
    * compatible with append's watermark semantics by appending a
    * far-future SENTINEL event as the last-ingested file: the watermark
    * then passes every real session and append emits them all; the
    * sentinel's own (never-closed) session is the one row withheld, and
    * the caller filters its synthetic key out ([[graft.SparkEntry]]'s
    * q178).
    */
  def materializeAppendToParquet(spark: SparkSession, df: DataFrame,
                                 outDir: String): DataFrame = {
    val q = runForeachBatch(df, "append") { (batch, _) =>
      batch.write.mode("append").parquet(outDir)
    }
    q.processAllAvailable()
    q.stop()
    spark.read.parquet(outDir)
  }

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
