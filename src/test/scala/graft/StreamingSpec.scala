package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.streaming.EventStreams

/** Batch/stream parity: the same transform function applied to the events
  * table as a batch DataFrame and as a file-source stream must produce the
  * same result set (complete output mode, so no windows are withheld by
  * the watermark on a finite input).
  */
class StreamingSpec extends SparkTestBase {

  /** FileStreamSource requires a directory; the fixture is a single
    * parquet file, so stage a copy under target/.
    */
  private lazy val streamDir: String = {
    val dir = java.nio.file.Paths.get("target", "stream-events")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf, "events.parquet"),
      dir.resolve("events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  private def streamedEvents: DataFrame = {
    val batchSchema = spark.read.parquet(s"$sf/events.parquet").schema
    Tables.normalizeNanoTimestamps(
      EventStreams.readEventStream(spark, streamDir, batchSchema))
  }

  private def batchEvents: DataFrame = Tables.load(spark, sf, "events")

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("windowedCounts: streaming result equals batch result") {
    val batch = EventStreams.windowedCounts(batchEvents)
    val stream = EventStreams.runToMemorySink(spark,
      EventStreams.windowedCounts(streamedEvents), "win_parity", "complete")
    assert(sortedRows(stream) === sortedRows(batch))
    assert(stream.count() > 0)
  }

  test("sessionCounts: streaming result equals batch result") {
    val batch = EventStreams.sessionCounts(batchEvents)
    val stream = EventStreams.runToMemorySink(spark,
      EventStreams.sessionCounts(streamedEvents), "sess_parity", "complete")
    assert(sortedRows(stream) === sortedRows(batch))
    assert(stream.count() > 0)
  }

  test("append-mode sessions + sentinel watermark advance emit every " +
    "closed session exactly once") {
    // the q178 seam shrunk: a source dir whose LAST-ingested file (by
    // mtime) is a far-future sentinel event; append mode + watermark
    // must then emit exactly the batch session set for the real users
    // — no withheld tail, no duplicates from state re-emission
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sess_append").toFile
    val ev = batchEvents.select(col("ts"), col("user_id"), col("value"))
    ev.coalesce(1).write.mode("overwrite").parquet(dir.toString)
    val before = dir.listFiles().map(_.getName).toSet
    spark.read.parquet(dir.toString).orderBy(col("ts").desc).limit(1)
      .select((col("ts") + expr("INTERVAL 10 DAYS")).as("ts"),
        lit(-1L).as("user_id"), col("value"))
      .coalesce(1).write.mode("append").parquet(dir.toString)
    val t0 = System.currentTimeMillis() - 600000
    dir.listFiles().filter(_.getName.startsWith("part-")).foreach { f =>
      f.setLastModified(if (before(f.getName)) t0 else t0 + 300000L)
    }
    def sessions(df: DataFrame): DataFrame = df
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("session_window.start").cast("string").as("s"),
        col("user_id"), col("n_events"), col("sum_value"))
    val out = java.nio.file.Files
      .createTempDirectory("graft_sess_append_out").toString
    val streamed = EventStreams.materializeAppendToParquet(spark,
      sessions(EventStreams.readEventStream(spark, dir.toString,
        spark.read.parquet(dir.toString).schema)), out)
      .filter(col("user_id") =!= -1L)
    val batch = sessions(ev)
    assert(sortedRows(streamed) === sortedRows(batch))
    assert(streamed.count() > 0)
  }

  test("stream-stream range join equals batch and the bucketed range join") {
    val batchPairs = EventStreams.purchaseClickPairs(batchEvents)
    val streamPairs = EventStreams.runToMemorySink(spark,
      EventStreams.purchaseClickPairs(streamedEvents), "ss_join", "append")
    assert(sortedRows(streamPairs) === sortedRows(batchPairs))
    assert(streamPairs.count() > 0)

    // same pair semantics as the batch banded range join
    val ev = batchEvents
    val viaBuckets = graft.operators.Relational.rangeJoinBucketed(
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts")),
        ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"),
            col("ts").as("click_ts")),
        Seq("user_id"), "ts", "click_ts", 10L * 60 * 1000000)
      .select(col("user_id"), col("event_id"), col("click_id"))
    assert(sortedRows(viaBuckets) === sortedRows(batchPairs))
  }

  test("foreachBatch upsert sink converges to the batch aggregate") {
    // stage the events as 4 TIME-ORDERED files: with maxFilesPerTrigger=1
    // each becomes one micro-batch and the watermark only ever trails the
    // incoming data, so no window is dropped as late — the realistic
    // ordered-ingestion shape
    val dir = "target/stream-events-ordered"
    val ev = batchEvents
    val n = ev.count()
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("ts"), col("event_id"))
    val bucketed = ev.withColumn("_rn", row_number().over(w))
      .withColumn("_b", ((col("_rn") - 1) * 4 / n).cast("int"))
    (0 until 4).foreach { b =>
      bucketed.filter(col("_b") === b).drop("_rn", "_b").coalesce(1)
        .write.mode(if (b == 0) "overwrite" else "append").parquet(dir)
    }
    val schema = spark.read.parquet(dir).schema
    val stream = Tables.normalizeNanoTimestamps(
      EventStreams.readEventStream(spark, dir, schema))

    // driver-side upsert table keyed by (window, event_type): the classic
    // foreachBatch pattern (stand-in for MERGE INTO / JDBC upsert)
    val tbl = new java.util.concurrent.ConcurrentHashMap[
      (String, String), (Long, Double)]()
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = EventStreams.runForeachBatch(
        EventStreams.windowedCounts(stream), "update") { (batch, _) =>
      if (!batch.isEmpty) nBatches.incrementAndGet()
      batch.collect().foreach { r =>
        tbl.put((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))
      }
    }
    q.processAllAvailable()
    q.stop()

    assert(nBatches.get() >= 3, s"expected multiple micro-batches, got ${nBatches.get()}")
    val expected = EventStreams.windowedCounts(batchEvents).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    import scala.jdk.CollectionConverters._
    assert(tbl.asScala.toMap === expected)
  }

  test("flatMapGroupsWithState sessionizer matches session_window exactly") {
    val viaState = EventStreams.sessionizeWithState(
        batchEvents, gapMicros = 30L * 60 * 1000000)
      .toDF("user_id", "session_start", "n_events", "sum_value")
    val viaBuiltin = batchEvents
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start"),
        col("n_events"), col("sum_value"))
    assert(sortedRows(viaState.select("user_id", "session_start", "n_events",
      "sum_value")) === sortedRows(viaBuiltin))
    assert(viaState.count() > 0)
  }

  test("stateful sessionizer also runs as a real stream with timeouts") {
    val sessions = EventStreams.sessionizeWithState(
      streamedEvents, gapMicros = 30L * 60 * 1000000)
    val out = EventStreams.runToMemorySink(spark, sessions.toDF(),
      "state_sessions", "append")
    // one-file stream: only watermark-closed sessions are emitted; they
    // must all agree with the batch sessionization
    val batch = EventStreams.sessionizeWithState(
        batchEvents, gapMicros = 30L * 60 * 1000000)
      .collect().map(_.toString).toSet
    val streamed = out.collect().map(r =>
      EventStreams.Session(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)).toString).toSet
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch),
      s"streamed sessions not in batch set: ${streamed.diff(batch).take(3)}")
  }

  test("dedupEvents drops re-delivered events within the watermark") {
    // stage the SAME file twice: the second micro-batch re-delivers
    // every event_id; watermarked dedup must emit each exactly once
    val dir = java.nio.file.Paths.get("target", "stream-events-dup")
    java.nio.file.Files.createDirectories(dir)
    for (name <- Seq("a.parquet", "b.parquet"))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(sf, "events.parquet"), dir.resolve(name),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val batchSchema = spark.read.parquet(s"$sf/events.parquet").schema
    val stream = Tables.normalizeNanoTimestamps(
      EventStreams.readEventStream(spark, dir.toString, batchSchema))
    val out = EventStreams.runToMemorySink(spark,
      EventStreams.dedupEvents(stream), "dedup_stream", "append")
    assert(out.count() === batchEvents.count())
  }
}
