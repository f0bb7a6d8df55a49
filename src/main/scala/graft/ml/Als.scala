package graft.ml

import org.apache.spark.ml.evaluation.{RankingEvaluator, RegressionEvaluator}
import org.apache.spark.ml.recommendation.{ALS, ALSModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's core ML capability: ALS collaborative filtering
  * (reference `model-als.py:111-139`), with two deliberate departures:
  *
  *  - the ALS seed is EXPLICIT (the reference seeds only randomSplit at
  *    `model-als.py:122`, so its committed outputs are irreproducible —
  *    SURVEY.md §5.1);
  *  - recommendations are unpacked with explode() instead of the
  *    reference's collect-to-driver round trip (`model-als.py:134-139`),
  *    so the top-k result stays distributed (SURVEY.md §4.2.1).
  */
object Als {

  /** @param numBlocks user/item block count; ALS defaults to the session
    *                   parallelism, which over-partitions small inputs
    *                   (32 near-empty blocks × 2 shuffle rounds × maxIter)
    *                   — set explicitly when |ratings| is modest.
    */
  /** @param implicitPrefs treat ratings as implicit-feedback confidence
    *                       weights (view counts, dwell time) instead of
    *                       explicit scores — the common case for the
    *                       event-log data a training pipeline actually has.
    *                       `alpha` scales confidence (MLlib semantics).
    */
  case class Config(rank: Int = 10, maxIter: Int = 10, regParam: Double = 0.1,
                    userCol: String = "user_id", itemCol: String = "item_id",
                    ratingCol: String = "rating", seed: Long = 42L,
                    numBlocks: Int = -1,
                    implicitPrefs: Boolean = false, alpha: Double = 1.0)

  /** Estimator configured as the reference does
    * (`model-als.py:111-120`: nonnegative, coldStartStrategy=drop).
    */
  def estimator(c: Config): ALS = {
    val als = new ALS()
      .setRank(c.rank).setMaxIter(c.maxIter).setRegParam(c.regParam)
      .setUserCol(c.userCol).setItemCol(c.itemCol).setRatingCol(c.ratingCol)
      .setColdStartStrategy("drop").setNonnegative(true).setSeed(c.seed)
      .setImplicitPrefs(c.implicitPrefs).setAlpha(c.alpha)
    if (c.numBlocks > 0)
      als.setNumUserBlocks(c.numBlocks).setNumItemBlocks(c.numBlocks)
    als
  }

  /** 80/20 split + fit + RMSE, the reference's train/eval flow
    * (`model-als.py:122-129`).
    */
  def trainEval(ratings: DataFrame, c: Config = Config()): (ALSModel, Double) = {
    val Array(train, test) = ratings.randomSplit(Array(0.8, 0.2), seed = 42L)
    val model = estimator(c).fit(train)
    val preds = model.transform(test)
    val rmse = new RegressionEvaluator().setMetricName("rmse")
      .setLabelCol(c.ratingCol).setPredictionCol("prediction").evaluate(preds)
    (model, rmse)
  }

  /** Ranking-quality metrics the RMSE flow doesn't cover: MAP@k and
    * NDCG@k of the model's top-k recommendations against held-out
    * positives (test rows with rating ≥ `relevanceThreshold`). Per-user
    * item lists are assembled distributed (groupBy + collect_list of the
    * SMALL per-user top-k / held-out sets — bounded state, no driver
    * round trip); the evaluator then reduces them to one number each.
    *
    * Denominator semantics: the inner join means metrics average over
    * users WITH at least one held-out positive — a user whose test rows
    * all fall below `relevanceThreshold` contributes nothing rather than
    * a zero. That is the usual recommender-eval convention (zero-positive
    * users have no ideal ranking, so NDCG is undefined for them), but it
    * does make the averages look better than an all-users-scored-as-zero
    * reading; left-join with empty label arrays if you want that stricter
    * number.
    */
  def rankingEval(model: ALSModel, test: DataFrame, k: Int,
                  c: Config = Config(), relevanceThreshold: Double = 0.0)
  : (Double, Double) = {
    val users = test.select(col(c.userCol)).distinct()
    val pred = model.recommendForUserSubset(users, k)
      .select(col(c.userCol),
        transform(col("recommendations"),
          r => r.getField(c.itemCol).cast("double")).as("pred"))
    // relevant = held-out items the user actually rated >= threshold,
    // best-rated first (NDCG's ideal ordering)
    val truth = test.filter(col(c.ratingCol) >= relevanceThreshold)
      .groupBy(col(c.userCol))
      .agg(reverse(array_sort(collect_list(
        struct(col(c.ratingCol).as("r"), col(c.itemCol).as("i"))))).as("s"))
      .select(col(c.userCol),
        transform(col("s"), s => s.getField("i").cast("double")).as("label"))
    val joined = graft.core.Caches.cached(pred.join(truth, c.userCol))
    try {
      def metric(name: String): Double = new RankingEvaluator()
        .setMetricName(name).setK(k)
        .setPredictionCol("pred").setLabelCol("label")
        .evaluate(joined)
      (metric("meanAveragePrecisionAtK"), metric("ndcgAtK"))
    } finally joined.unpersist()
  }

  /** Per-user top-k recommendations, unpacked distributed (explode +
    * field access replaces the reference's collect → Python list →
    * createDataFrame round trip, `model-als.py:134-139`).
    */
  def recommend(model: ALSModel, users: DataFrame, k: Int,
                c: Config = Config()): DataFrame =
    model.recommendForUserSubset(users, k)
      .select(col(c.userCol), explode(col("recommendations")).as("rec"))
      .select(col(c.userCol), col(s"rec.${c.itemCol}").as(c.itemCol),
        col("rec.rating").cast("double").as("predicted_rating"))
}
