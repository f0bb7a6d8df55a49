package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line for the driver (BENCH_r{N}.json). The same line is
  * written to SPARK_GRAFT_BENCH_OUT (default `BENCH.json` in the working
  * directory) AND echoed on stderr: stdout passes through sbt's `[info]`
  * logger, which breaks line-oriented JSON parsing — the file is the
  * canonical artifact, stderr (unprefixed by sbt) the fallback channel.
  *
  * Timing note: each query is driven by `.count()`, which lets Catalyst
  * prune columns and drop a final orderBy — fine for relative iteration
  * (every round pays the same discount), but absolute parity with the
  * Verify path would need a noop-write sink. Same trade in tools/TimeQ.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.tuned(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-bench"),
      shufflePartitions = cpus.toInt
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // steady-state timing: two full passes, per-query minimum — the first
    // pass doubles as JIT/codegen warm-up, and min-of-2 suppresses GC and
    // compilation noise that otherwise dominates sub-second queries
    def pass(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case e: Throwable =>
          // keep the JSON line intact but never hide a broken query
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
        name -> (System.nanoTime() - t0) / 1e9
      }
    val first = pass()
    // Sweep ALL cached frames between passes: pass 2 then re-pays each
    // query's real compute on a warm JVM (JIT + codegen compiled, parquet
    // footers in page cache) but a cold cache — the same steady-state a
    // fresh-JVM isolation run measures, and the honest per-query number.
    // Without the sweep, min-of-2 reports either a ~0s memo-read (cache
    // fits) or, worse, a 2-6x inflated recompute when the storage pool
    // overflows and LRU evicts frames that plans reference more than once
    // (the round-6 8g-heap failure mode). Intra-pass memo hits (q78/q112
    // shared pair list, profile summaries) are intentionally kept — both
    // passes benefit equally, so the min stays comparable.
    spark.catalog.clearCache()
    System.gc()
    val second = pass()
    val results = first.zip(second).map { case ((n, a), (_, b)) => n -> math.min(a, b) }
    // the queries map uses the short qNN prefix ("q32" not
    // "q32_ngram_jaccard") and 4-dp values: the driver captures a bounded
    // tail of the process output, and at 76+ queries the full-name form
    // overflows that window, truncating the line's head and defeating the
    // parse (BENCH_r03/r04 "parsed": null). Full names are recoverable —
    // the prefix is unique by construction (SparkEntry key convention)
    // Locale.ROOT: the f"" interpolator uses the JVM default locale, and a
    // comma decimal separator (e.g. de_DE) would corrupt the JSON line
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    val qs = results.map { case (k, v) =>
      "\"" + k.takeWhile(_ != '_') + "\":" + num(v)
    }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val line =
      s"""{"metric":"total","value":${num(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // three channels so the driver can't miss it: stdout (sbt prefixes it
    // with [info] — parse-hostile), stderr (sbt passes it through
    // UNPREFIXED — grep '^{' to extract), and the SPARK_GRAFT_BENCH_OUT
    // file (default BENCH.json in the working directory)
    println(line)
    System.err.println(line)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    spark.stop()
  }
}
