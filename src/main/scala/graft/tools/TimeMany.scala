package graft.tools

import org.apache.spark.sql.SparkSession

/** Time a LIST of SparkEntry queries in one JVM:
  * `runMain graft.tools.TimeMany <q1,q2,...> <sfDir> [passes]`.
  * One line per query: `[timemany] <name> min=<s> rows=<n>` — the
  * batch version of TimeQ for PLANS.md growth tables (one Spark
  * session amortizes JVM+session startup over the whole list; same
  * `.count()` action and min-of-N protocol as TimeQ/Bench, so numbers
  * are comparable). Session caches persist across queries in the list
  * exactly as in Bench's intra-pass memo behavior.
  */
object TimeMany {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.tuned(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-timemany"),
      shufflePartitions = cpus.toInt
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      var best = Double.MaxValue
      var rows = -1L
      (1 to passes).foreach { _ =>
        val t0 = System.nanoTime()
        rows = fn(spark, sfDir).count()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[timemany] $name min=$best%.3f rows=$rows")
    }
    spark.stop()
  }
}
