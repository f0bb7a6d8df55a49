package graft

import org.apache.spark.sql.functions._

/** Unit pins for the probe arithmetic every join-shaped scale audit
  * trusts: if pairBudget or maxKeyFreq were wrong, a whole audit
  * family would pass or flag on garbage. Fixtures are hand-computed.
  */
class JoinProbeSpec extends SparkTestBase {

  import spark.implicits._

  private def joinOf(l: org.apache.spark.sql.DataFrame,
                     r: org.apache.spark.sql.DataFrame) = {
    val js = JoinProbe.equiJoinsOf(
      l.join(r, "k").queryExecution.optimizedPlan)
    assert(js.nonEmpty, "fixture join lost its equi-keys")
    js.head
  }

  test("pairBudget is exactly sum over keys of cntL*cntR") {
    // left: k=1 ×3, k=2 ×2, k=9 ×1; right: k=1 ×2, k=2 ×5, k=7 ×4
    // shared keys → 3*2 + 2*5 = 16; unmatched keys contribute nothing
    val l = Seq(1, 1, 1, 2, 2, 9).toDF("k").withColumn("v", lit("l"))
    val r = Seq(1, 1, 2, 2, 2, 2, 2, 7, 7, 7, 7).toDF("k")
      .withColumn("w", lit("r"))
    val (j, lk, rk) = joinOf(l, r)
    assert(JoinProbe.pairBudget(spark, "fixture-budget", j, lk, rk) === 16L)
  }

  test("maxKeyFreq is the hottest key's row count; empty side probes 0") {
    val l = Seq(5, 5, 5, 5, 8, 8, 3).toDF("k").withColumn("v", lit("l"))
    val r = Seq(5, 8).toDF("k").withColumn("w", lit("r"))
    val (j, lk, _) = joinOf(l, r)
    assert(JoinProbe.maxKeyFreq(spark, "fixture-freq", j.left, lk) === 4L)
    // a side that filters to nothing must probe as 0, not NPE (ADVICE
    // r14). BOTH sides parquet-backed: with a local right side the
    // optimizer infers the impossible predicate across the join,
    // folds the right relation empty, and eliminates the join before
    // the probe can see it.
    val nation = spark.read
      .parquet("/root/testdata/sf0.001/nation.parquet")
      .select($"n_nationkey".as("k"), $"n_name")
    val (je, lke, _) =
      joinOf(nation.filter($"k" > 1000000), nation.select($"k"))
    assert(JoinProbe.maxKeyFreq(spark, "fixture-empty", je.left, lke) === 0L)
  }
}
