package graft.tools

import org.apache.spark.sql.SparkSession

/** Time a single SparkEntry query: `runMain graft.tools.TimeQ <name> <sfDir>
  * [passes]`. Same session config as Bench (local[SPARK_GRAFT_CPUS],
  * shuffle partitions = cores); prints per-pass seconds and the min —
  * the per-query view of Bench's min-of-2 protocol, for iterating on one
  * plan without paying for the other queries.
  *
  * Like Bench, the action is `.count()`: Catalyst may prune columns and
  * drop the final orderBy the Verify path pays for, so treat these as
  * RELATIVE numbers (same discount every pass/round); absolute parity
  * with Verify would need a noop write or collect.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.tuned(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-timeq"),
      shufflePartitions = cpus.toInt
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name; known: ${graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val times = (1 to passes).map { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[timeq] pass $i: $sec%.3f s ($n rows)")
      sec
    }
    println(f"[timeq] $name min=${times.min}%.3f s over $passes passes")
    spark.stop()
  }
}
