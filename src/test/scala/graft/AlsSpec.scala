package graft

import org.apache.spark.sql.functions._
import graft.ml.Als

/** ALS wrapper: the reference's pipeline (model-als.py:111-139) with an
  * explicit seed — same seed must reproduce the same recommendations,
  * which the unseeded reference cannot (SURVEY.md §5.1).
  */
class AlsSpec extends SparkTestBase {
  import spark.implicits._

  // 8 users × 10 items, block preference structure: users 0-3 like even
  // items, users 4-7 like odd items.
  private def ratings = (for {
    u <- 0 until 8; i <- 0 until 10
    if (u + i) % 3 != 0 // drop some cells so there is a test split
  } yield (u, i, if ((u < 4) == (i % 2 == 0)) 5.0 else 1.0))
    .toDF("user_id", "item_id", "rating")

  private val cfg = Als.Config(rank = 4, maxIter = 5, seed = 7L)

  test("trainEval learns the block structure with finite RMSE") {
    val (_, rmse) = Als.trainEval(ratings, cfg)
    assert(!rmse.isNaN && rmse < 2.5, s"rmse=$rmse")
  }

  test("recommend returns k items per user, already unpacked and typed") {
    val (model, _) = Als.trainEval(ratings, cfg)
    val recs = Als.recommend(model, ratings.select($"user_id").distinct(), 3, cfg)
    val counts = recs.groupBy($"user_id").count().as[(Int, Long)].collect()
    assert(counts.length === 8 && counts.forall(_._2 === 3L))
    assert(recs.columns.toSeq ===
      Seq("user_id", "item_id", "predicted_rating"))
  }

  test("evaluator RMSE equals the sqrt(avg(sq err)) aggregate (M5)") {
    val (model, rmse) = Als.trainEval(ratings, cfg)
    val Array(_, test) = ratings.randomSplit(Array(0.8, 0.2), seed = 42L)
    val manual = model.transform(test)
      .select(sqrt(avg(pow(col("rating") - col("prediction"), 2))))
      .head().getDouble(0)
    assert(math.abs(rmse - manual) < 1e-9)
  }

  test("implicit-feedback mode ranks the preferred block higher") {
    // confidence weights instead of scores: high-interaction cells only
    val interactions = (for {
      u <- 0 until 8; i <- 0 until 10
      if (u < 4) == (i % 2 == 0) // users only touch their block's items
    } yield (u, i, 3.0)).toDF("user_id", "item_id", "rating")
    val icfg = cfg.copy(implicitPrefs = true, alpha = 10.0)
    val (model, _) = Als.trainEval(interactions, icfg)
    val recs = Als.recommend(model,
      interactions.select($"user_id").distinct().filter($"user_id" === 0), 4, icfg)
      .select($"item_id").as[Int].collect().toSet
    // user 0 interacts with even items only; top recs should be even
    assert(recs.nonEmpty && recs.forall(_ % 2 == 0), recs.toString)
  }

  test("rankingEval: MAP@k and NDCG@k are valid and the model beats chance") {
    val (model, _) = Als.trainEval(ratings, cfg)
    val Array(_, test) = ratings.randomSplit(Array(0.8, 0.2), seed = 42L)
    val (map, ndcg) = Als.rankingEval(model, test, 5, cfg)
    assert(map >= 0.0 && map <= 1.0, s"MAP@5 out of range: $map")
    assert(ndcg >= 0.0 && ndcg <= 1.0, s"NDCG@5 out of range: $ndcg")
    // the block structure is learnable: top-5 of 10 items must hit some
    // held-out positives for at least one user
    assert(map > 0.0 && ndcg > 0.0, s"no ranking signal: map=$map ndcg=$ndcg")
  }

  test("rankingEval is 1.0 when predictions equal the relevant set") {
    // sanity on the metric plumbing itself: a model whose top-k equals
    // the user's full relevant set must score MAP = NDCG = 1
    val train = ratings
    val (model, _) = Als.trainEval(train, cfg)
    val k = 10
    val recs = Als.recommend(model, train.select($"user_id").distinct(), k, cfg)
      .select($"user_id", $"item_id",
        $"predicted_rating".as("rating"))
    // use the model's own recommendations as the "test" set: predictions
    // and relevance then coincide by construction
    val (map, ndcg) = Als.rankingEval(model, recs, k, cfg,
      relevanceThreshold = Double.MinValue)
    assert(math.abs(map - 1.0) < 1e-9, s"map=$map")
    assert(math.abs(ndcg - 1.0) < 1e-9, s"ndcg=$ndcg")
  }

  test("same seed reproduces identical recommendations") {
    def run() = {
      val (model, _) = Als.trainEval(ratings, cfg)
      Als.recommend(model, ratings.select($"user_id").distinct(), 3, cfg)
        .orderBy($"user_id", $"item_id")
        .select($"user_id", $"item_id").as[(Int, Int)].collect().toSeq
    }
    assert(run() === run())
  }
}
