package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.streaming.EventStreams

/** Checkpoint RECOVERY — the other half of the production streaming
  * contract (the materialized-stream queries prove ingest→state→sink;
  * this spec proves a killed query RESUMES from its checkpoint with
  * nothing lost and nothing double-counted).
  *
  * Protocol: ingest phase-1 files, stop the query (a controlled "kill" —
  * the checkpoint sees exactly what a crash leaves: committed offsets,
  * the file-source seen-files log, state-store deltas), add phase-2
  * files, restart a NEW query object over the SAME checkpoint, drain,
  * and hash the final sink against the uninterrupted batch result.
  * The restarted query can NOT re-read phase-1 files (the seen-files
  * log marks them consumed), so any phase-1 contribution in the final
  * result got there through recovered state — which is the claim.
  */
class StreamingRecoverySpec extends SparkTestBase {

  private def batchEvents: DataFrame = Tables.load(spark, sf, "events")

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** Stage events as 4 time-ordered single-file parquets under `dir`,
    * returning the per-file paths in event-time order.
    */
  private def stageOrderedFiles(dir: java.io.File): Seq[java.io.File] = {
    val ev = batchEvents
    val n = ev.count()
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("ts"), col("event_id"))
    val bucketed = ev.withColumn("_rn", row_number().over(w))
      .withColumn("_b", ((col("_rn") - 1) * 4 / n).cast("int"))
    val staging = java.nio.file.Files
      .createTempDirectory("graft_rec_stage").toFile
    (0 until 4).map { b =>
      val part = new java.io.File(staging, s"b$b")
      bucketed.filter(col("_b") === b).drop("_rn", "_b").coalesce(1)
        .write.mode("overwrite").parquet(part.toString)
      val src = part.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(dir, f"events-$b%02d.parquet")
      java.nio.file.Files.copy(src.toPath, dst.toPath)
      dst.setLastModified(System.currentTimeMillis() - 600000 + b * 1000L)
      dst
    }
  }

  test("windowed aggregation resumes from checkpoint: interrupted run " +
    "equals uninterrupted batch result") {
    val srcDir = java.nio.file.Files.createTempDirectory("graft_rec_src")
      .toFile
    val stagedParts = stageOrderedFiles(
      java.nio.file.Files.createTempDirectory("graft_rec_all").toFile)
    val cp = java.nio.file.Files.createTempDirectory("graft_rec_cp")
      .toString
    val out = java.nio.file.Files.createTempDirectory("graft_rec_out")
      .toString
    val schema = spark.read.parquet(stagedParts.head.toString).schema

    def runPhase(): (Long, Long) = {
      val stream = Tables.normalizeNanoTimestamps(
        EventStreams.readEventStream(spark, srcDir.toString, schema))
      val q = EventStreams.runForeachBatch(
          EventStreams.windowedCounts(stream), "complete", Some(cp)) {
        (batch, _) => batch.write.mode("overwrite").parquet(out)
      }
      q.processAllAvailable()
      val ids = q.recentProgress.toSeq.map(_.batchId)
      q.stop()
      (ids.min, ids.max)
    }

    // phase 1: first two files only, then a controlled kill
    stagedParts.take(2).foreach { f =>
      val dst = new java.io.File(srcDir, f.getName)
      java.nio.file.Files.copy(f.toPath, dst.toPath)
      dst.setLastModified(f.lastModified())
    }
    val (_, lastP1) = runPhase()
    assert(lastP1 >= 1, s"phase 1 should commit >= 2 micro-batches, last=$lastP1")

    // phase 2: remaining files appear AFTER the kill; the restarted query
    // must resume at batch lastP1+1 (proof it recovered, not restarted
    // from scratch) and fold phase-1 state into the final aggregate
    stagedParts.drop(2).foreach { f =>
      val dst = new java.io.File(srcDir, f.getName)
      java.nio.file.Files.copy(f.toPath, dst.toPath)
      dst.setLastModified(f.lastModified())
    }
    val (firstP2, _) = runPhase()
    assert(firstP2 > lastP1,
      s"resumed query must continue past batch $lastP1, began at $firstP2")

    val resumed = spark.read.parquet(out)
    val expected = EventStreams.windowedCounts(batchEvents)
    assert(sortedRows(resumed) === sortedRows(expected))
    assert(resumed.count() > 0)
  }

  test("stream-stream join buffers survive restart: pairs spanning the " +
    "kill boundary are still emitted") {
    // purchases ingested BEFORE the kill must pair with clicks arriving
    // AFTER the restart — only the join's buffered state store can make
    // that match, so a complete final pair set proves both sides'
    // buffers were recovered. gap = 2 days (not q200's 10 minutes):
    // at fixture scale the wider window is what guarantees pairs that
    // genuinely SPAN the kill boundary (guard asserted below)
    val srcDir = java.nio.file.Files.createTempDirectory("graft_rec_jsrc")
      .toFile
    val stagedParts = stageOrderedFiles(
      java.nio.file.Files.createTempDirectory("graft_rec_jall").toFile)
    val cp = java.nio.file.Files.createTempDirectory("graft_rec_jcp")
      .toString
    val pairs =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]()
    val schema = spark.read.parquet(stagedParts.head.toString).schema

    def runPhase(): Unit = {
      val stream = Tables.normalizeNanoTimestamps(
        EventStreams.readEventStream(spark, srcDir.toString, schema))
      val q = EventStreams.runForeachBatch(
          EventStreams.purchaseClickPairs(stream, gap = "2 days"),
          "append", Some(cp)) {
        (batch, _) => batch.collect().foreach(r =>
          pairs.add((r.getLong(0), r.getLong(1), r.getLong(2))))
      }
      q.processAllAvailable()
      q.stop()
    }

    stagedParts.take(2).foreach { f =>
      val dst = new java.io.File(srcDir, f.getName)
      java.nio.file.Files.copy(f.toPath, dst.toPath)
      dst.setLastModified(f.lastModified())
    }
    runPhase()
    stagedParts.drop(2).foreach { f =>
      val dst = new java.io.File(srcDir, f.getName)
      java.nio.file.Files.copy(f.toPath, dst.toPath)
      dst.setLastModified(f.lastModified())
    }
    runPhase()

    import scala.jdk.CollectionConverters._
    val streamed = pairs.asScala.toSet
    val batch = EventStreams.purchaseClickPairs(batchEvents,
        gap = "2 days")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    // at least one pair must genuinely span the kill: purchase in the
    // first half of event time, click matched after the restart —
    // otherwise the recovery claim is vacuous for the purchase buffer
    val phase1Ts = spark.read.parquet(
        stagedParts.take(2).map(_.toString): _*)
      .agg(max(col("ts"))).head().getTimestamp(0)
    val spanning = EventStreams.purchaseClickPairs(batchEvents,
        gap = "2 days")
      .join(batchEvents.select(col("event_id"), col("ts")), "event_id")
      .filter(col("ts") <= phase1Ts)
      .join(batchEvents.select(col("event_id").as("click_id"),
        col("ts").as("click_ts")), "click_id")
      .filter(col("click_ts") > phase1Ts)
    assert(spanning.count() > 0,
      "fixture produced no kill-boundary-spanning pair; test is vacuous")
  }

  test("watermark-dedup state survives restart: post-restart re-delivery " +
    "of pre-restart events is still dropped") {
    val srcDir = java.nio.file.Files.createTempDirectory("graft_rec_dsrc")
      .toFile
    val cp = java.nio.file.Files.createTempDirectory("graft_rec_dcp")
      .toString
    val outRows =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val single = java.nio.file.Files
      .createTempDirectory("graft_rec_done").toFile
    batchEvents.coalesce(1).write.mode("overwrite")
      .parquet(single.toString)
    val oneFile = single.listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val schema = spark.read.parquet(single.toString).schema

    def runPhase(): Unit = {
      val stream = Tables.normalizeNanoTimestamps(
        EventStreams.readEventStream(spark, srcDir.toString, schema))
      val q = EventStreams.runForeachBatch(
          EventStreams.dedupEvents(stream)
            .select(col("event_id")), "append", Some(cp)) { (batch, _) =>
        batch.collect().foreach(r => outRows.add(r.getLong(0).toString))
      }
      q.processAllAvailable()
      q.stop()
    }

    // phase 1: deliver the corpus once, kill
    val a = new java.io.File(srcDir, "a.parquet")
    java.nio.file.Files.copy(oneFile.toPath, a.toPath)
    a.setLastModified(System.currentTimeMillis() - 600000)
    runPhase()
    val afterP1 = outRows.size()
    assert(afterP1.toLong === batchEvents.count())

    // phase 2: re-deliver the SAME events under a new file name after the
    // restart — only recovered state-store contents can know they are
    // duplicates, so zero new emissions proves the state came back
    val b = new java.io.File(srcDir, "b.parquet")
    java.nio.file.Files.copy(oneFile.toPath, b.toPath)
    b.setLastModified(System.currentTimeMillis() - 300000)
    runPhase()
    assert(outRows.size() === afterP1,
      s"re-delivered events leaked past recovered dedup state: " +
        s"${outRows.size()} != $afterP1")
  }
}
