package graft

import org.apache.spark.sql.functions._
import graft.functions.CountMinAggregator

class CountMinSpec extends SparkTestBase {
  import spark.implicits._

  test("cms never underestimates and meets the eps*N bound on a " +
    "skewed stream") {
    val keys = (1 to 2000).flatMap { i =>
      Seq.fill(if (i <= 3) 500 else 1)(i.toLong)
    }
    val n = keys.length
    val sk = keys.toDF("k").repartition(8)
      .agg(CountMinAggregator.cms(0.005, 0.99, 7)($"k").as("s"))
      .as[Array[Byte]].head()
    (1 to 3).foreach { i =>
      val est = CountMinAggregator.estimate(sk, i.toLong)
      assert(est >= 500L, s"underestimate for $i: $est")
      assert(est <= 500L + (2 * 0.005 * n).toLong,
        s"bound blown for $i: $est vs N=$n")
    }
  }

  test("partition-split sketch equals the single-partition sketch " +
    "estimates (mergeability)") {
    val keys = (1L to 500L) ++ (1L to 100L)
    val one = keys.toDF("k").coalesce(1)
      .agg(CountMinAggregator.cms(0.01, 0.95, 11)($"k"))
      .as[Array[Byte]].head()
    val many = keys.toDF("k").repartition(13)
      .agg(CountMinAggregator.cms(0.01, 0.95, 11)($"k"))
      .as[Array[Byte]].head()
    (1L to 100L by 17L).foreach { k =>
      assert(CountMinAggregator.estimate(one, k) ===
        CountMinAggregator.estimate(many, k))
    }
  }
}
