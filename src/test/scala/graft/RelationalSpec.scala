package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

class RelationalSpec extends SparkTestBase {
  import spark.implicits._

  test("unionDedup: union + any-null drop + key dedup (model-als.py:107-109)") {
    val a = Seq((1, 10, 5.0), (1, 11, 4.0), (2, 10, 3.0)).toDF("u", "i", "r")
    val b = Seq((1, 10, 2.0), (3, 12, 1.0)).toDF("u", "i", "r")
    val withNull = a.union(Seq((4, 13, null.asInstanceOf[java.lang.Double]))
      .toDF("u", "i", "r").select($"u", $"i", $"r".cast("double")))
    val out = Relational.unionDedup(Seq(withNull, b), Seq("u", "i"))
    assert(out.count() === 4) // (1,10) deduped, null row dropped
    assert(out.filter($"u" === 4).count() === 0)
  }

  test("dedupFirst keeps deterministic winner per key") {
    val df = Seq((1, "a", 3L), (1, "a", 1L), (1, "b", 2L), (2, "a", 9L))
      .toDF("k", "t", "seq")
    val out = Relational.dedupFirst(df, Seq("k", "t"), Seq($"seq"))
      .orderBy($"k", $"t").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(1L, 2L, 9L))
  }

  test("dedup is idempotent") {
    val df = Seq((1, 1), (1, 1), (1, 2), (2, 1)).toDF("a", "b")
    val once = Relational.dedupFirst(df, Seq("a", "b"), Seq($"a"))
    val twice = Relational.dedupFirst(once, Seq("a", "b"), Seq($"a"))
    assert(once.count() === 3 && twice.count() === 3)
  }

  test("topK fuses to TakeOrderedAndProject (no global sort at scale)") {
    val df = Seq(3, 1, 4, 1, 5, 9, 2, 6).toDF("x")
    val top = Relational.topK(df, 3, $"x".desc)
    assert(top.collect().map(_.getInt(0)).toSeq === Seq(9, 6, 5))
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k fusion:\n$plan")
  }

  test("topKPerGroup returns k best per group with rank") {
    val df = Seq(("g1", 1.0), ("g1", 3.0), ("g1", 2.0), ("g2", 5.0))
      .toDF("g", "v")
    val out = Relational.topKPerGroup(df, 2, Seq("g"), Seq($"v".desc))
      .orderBy($"g", $"rank").collect()
    assert(out.map(r => (r.getString(0), r.getDouble(1))).toSeq ===
      Seq(("g1", 3.0), ("g1", 2.0), ("g2", 5.0)))
  }
}
