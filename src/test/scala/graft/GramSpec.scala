package graft

import org.apache.spark.sql.functions._
import graft.functions.GramAggregator

class GramSpec extends SparkTestBase {
  import spark.implicits._

  test("gram matrix matches the hand-computed X^T X on a tiny corpus") {
    // X = [[1,2],[3,4]] → X^T X = [[10,14],[14,20]]
    val df = Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)).toDF("v")
    val g = df.agg(GramAggregator.gram(2)($"v").as("g"))
      .as[Seq[Double]].head()
    assert(g(0) === 10.0) // (0,0)
    assert(g(1) === 14.0) // (0,1)
    assert(g(3) === 20.0) // (1,1)
    assert(g(2) === 0.0)  // lower triangle never accumulated
  }

  test("reduce skips null and wrong-length vectors; merge is " +
    "element-wise add") {
    val agg = GramAggregator(2)
    val b1 = agg.reduce(agg.zero, Seq(1.0, 2.0))
    assert(agg.reduce(b1, null).toSeq === b1.toSeq)
    assert(agg.reduce(b1, Seq(1.0)).toSeq === b1.toSeq)
    val b2 = agg.reduce(agg.zero, Seq(3.0, 4.0))
    val m = agg.merge(b1.clone(), b2)
    assert(m.toSeq === Seq(10.0, 14.0, 0.0, 20.0))
  }

  test("partition-split aggregation equals single-partition result") {
    val vecs = (1 to 40).map(i => Seq(i * 0.5, i * 0.25, 1.0 / i))
    val one = vecs.toDF("v").coalesce(1)
      .agg(GramAggregator.gram(3)($"v")).as[Seq[Double]].head()
    val many = vecs.toDF("v").repartition(7)
      .agg(GramAggregator.gram(3)($"v")).as[Seq[Double]].head()
    one.zip(many).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
  }
}
