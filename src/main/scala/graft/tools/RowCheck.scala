package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: assert every SparkEntry query returns rows at a given SF.
  * Usage: runMain graft.tools.RowCheck <sf_dir>
  */
object RowCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.tuned(
      SparkSession.builder().master("local[32]").appName("rowcheck"), 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var bad = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val n = fn(spark, args(0)).count()
        if (n == 0) { println(s"EMPTY $name"); bad += 1 }
      } catch { case e: Throwable =>
        println(s"FAIL  $name: ${e.getMessage}"); bad += 1
      }
    }
    println(s"$bad bad of ${graft.SparkEntry.queries.size}")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
