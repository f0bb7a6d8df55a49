package graft

import org.apache.spark.sql.functions._

/** The fingerprint-keyed staged-artifact layer (stagedFrame) now carries
  * the chain-pair list, the PQ codebook, AND the whole materialized
  * stream family — pin its publish protocol directly:
  *
  *  - a COMMITTED artifact (_SUCCESS present) must be served without
  *    re-invoking the build closure (the amortized-setup contract);
  *  - a TORN artifact (directory present, no _SUCCESS — a crash mid-
  *    publish) must be rebuilt, never read.
  *
  * Uses a synthetic table name under the test SF dir fingerprint via a
  * unique tag per test run-shape, so no production staging is touched.
  */
class StagedFrameSpec extends SparkTestBase {

  private def stagedDirFor(tag: String): java.io.File = {
    // mirror stagedPath's key derivation by just building once and
    // finding the dir it published (the path algebra stays private)
    val built = SparkEntry.stagedFrame(spark, sf, "region", tag) {
      graft.sources.Tables.load(spark, sf, "region")
        .select(col("r_regionkey"))
    }
    built.count()
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    tmp.listFiles().filter(f => f.getName.startsWith(s"graft_${tag}_"))
      .maxBy(_.lastModified())
  }

  test("committed staged artifact is served without re-running the build") {
    val tag = "spec_commit_check"
    val dest = stagedDirFor(tag)
    assert(new java.io.File(dest, "_SUCCESS").exists())
    var rebuilt = false
    val again = SparkEntry.stagedFrame(spark, sf, "region", tag) {
      rebuilt = true
      graft.sources.Tables.load(spark, sf, "region")
        .select(col("r_regionkey"))
    }
    assert(again.count() > 0)
    assert(!rebuilt,
      "build closure re-ran despite a committed _SUCCESS artifact")
  }

  test("torn staged artifact (no _SUCCESS) is rebuilt, never read") {
    val tag = "spec_torn_check"
    val dest = stagedDirFor(tag)
    // simulate the crash-mid-publish state: contents present with the
    // commit marker missing, plus garbage a reader would choke on
    new java.io.File(dest, "_SUCCESS").delete()
    java.nio.file.Files.writeString(
      new java.io.File(dest, "part-garbage.parquet").toPath, "not parquet")
    var rebuilt = false
    val again = SparkEntry.stagedFrame(spark, sf, "region", tag) {
      rebuilt = true
      graft.sources.Tables.load(spark, sf, "region")
        .select(col("r_regionkey"))
    }
    assert(rebuilt, "torn artifact was served instead of rebuilt")
    assert(again.count() > 0)
    assert(new java.io.File(dest, "_SUCCESS").exists(),
      "rebuild did not republish a committed artifact")
    assert(!new java.io.File(dest, "part-garbage.parquet").exists(),
      "garbage from the torn publish survived the rebuild")
  }

  test("stagedStreamResult registers its dir for Bench's setup map and " +
    "GCs superseded-fingerprint stagings") {
    // a dir for the SAME stream tag under a different (stale) code
    // fingerprint: this binary can never serve it again, so running
    // the stream query must delete it (ADVICE r11 — fingerprint-keyed
    // staging otherwise accumulates one orphan dir per code edit, and
    // Bench's old blanket /tmp scan misattributed its setup cost)
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val stale = new java.io.File(tmp,
      "graft_q248_result_v1_cdeadbeef_0123456789abcdef")
    stale.mkdirs()
    java.nio.file.Files.writeString(
      stale.toPath.resolve("_SETUP_SECONDS"), "9.999\n")
    // age it past the 6 h liveness cutoff (ADVICE r12): a YOUNG
    // superseded dir may belong to a concurrently running JVM built
    // from different code and must survive — only old orphans go
    stale.setLastModified(System.currentTimeMillis() - 7L * 3600 * 1000)
    // and a young sibling that must NOT be collected
    val live = new java.io.File(tmp,
      "graft_q248_result_v1_clivebeef_0123456789abcdef")
    live.mkdirs()
    SparkEntry.queries("q248_stream_static_enrich")(spark, sf).count()
    assert(!stale.exists(),
      "superseded-fingerprint staging dir survived a stream run")
    assert(live.exists(),
      "young superseded dir was collected — a concurrent JVM's live " +
        "staging would be deleted mid-read")
    org.apache.commons.io.FileUtils.deleteQuietly(live)
    import scala.jdk.CollectionConverters._
    val registered = SparkEntry.stagedStreamDirsThisRun.asScala
    assert(registered.exists(_.contains("graft_q248_result_v1_c")),
      s"stream staging dir not registered for setup attribution: " +
        s"$registered")
  }
}
