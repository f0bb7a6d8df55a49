import org.apache.spark.sql.SparkSession
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.tuned(
      SparkSession.builder().master("local[8]").appName("explain"), 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.SparkEntry.queries(args(0))(spark, args(1))
    val p = q.queryExecution.executedPlan.toString
    println("=== split occurrences: " + "split\\(".r.findAllIn(p).size)
    println(p.take(6000))
    spark.stop()
  }
}
