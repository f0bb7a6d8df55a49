package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.Als
import graft.operators.Relational
import graft.schema.Schemas
import graft.sources.Tables

/** The reference's complete recommendation pipeline, end-to-end
  * (reference `model-als.py:56-174`): CSV ingest → union + null-drop +
  * dedup → seeded ALS train/eval → per-user top-K → metadata enrichment →
  * community-average ranking → top-5 TV + top-5 Movie single-file CSVs.
  *
  * Departures from the reference, both deliberate (SURVEY.md §4.2):
  *  - recommendations stay distributed (explode, not collect→recreate);
  *  - ALS is seeded, so runs are reproducible.
  *
  * One faithful quirk: `avgOverUnion = false` (default) reproduces the
  * reference computing community averages over the MAIN ratings file
  * only, not the union with the personal file (`model-als.py:145` vs
  * `:107` — SURVEY.md §4.2.4); flip the flag for the arguably-intended
  * semantics.
  */
object Recommender {

  case class Config(targetUser: Int, recK: Int = 30, outK: Int = 5,
                    als: Als.Config = Als.Config(
                      userCol = "user_id", itemCol = "anime_id"),
                    avgOverUnion: Boolean = false)

  case class Result(rmse: Double, tv: DataFrame, movies: DataFrame)

  /** @param animeCsv    35-col item metadata (reference `model-als.py:56-67`)
    * @param ratingsCsv  main (user,item,rating) file, with header
    * @param personalCsv personal ratings file, headerless
    *                    (reference `model-als.py:94-101`)
    */
  def run(spark: SparkSession, animeCsv: String, ratingsCsv: String,
          personalCsv: String, cfg: Config): Result = {
    val anime = Tables.csv(spark, animeCsv, Schemas.anime)
    val ratings = Tables.csv(spark, ratingsCsv, Schemas.rating)
    val personal = Tables.csv(spark, personalCsv, Schemas.rating, header = false)

    // ratings spine (model-als.py:107-109); cached — it feeds the split,
    // training, and (optionally) the community average
    val combined = graft.core.Caches.cached(
      Relational.unionDedup(Seq(ratings, personal),
        Seq("user_id", "anime_id")))

    val (model, rmse) = Als.trainEval(combined, cfg.als)

    val targetUsers = spark.range(1).select(lit(cfg.targetUser).as("user_id"))
    val recs = Als.recommend(model, targetUsers, cfg.recK, cfg.als)

    val avgSource = if (cfg.avgOverUnion) combined else ratings
    val avgRatings = Relational.avgBy(avgSource, "anime_id", "rating", "avg_rating")

    // enrichment joins (model-als.py:141-148). The preserved side is the
    // ≤recK-row rec list; both right sides are item-dimension-sized
    // (metadata, per-item averages), so they broadcast — no shuffle
    // anywhere in the enrichment regardless of ratings volume.
    val enriched = recs
      .join(broadcast(anime), recs("anime_id") === anime("ID"), "left")
      .join(broadcast(avgRatings),
        anime("ID") === avgRatings("anime_id"), "left")

    def top(category: String): DataFrame = enriched
      .filter(col("Type") === category)
      .select(col("ID"), col("Name"), col("English name"), col("avg_rating"))
      .orderBy(col("avg_rating").desc, col("ID"))
      .limit(cfg.outK)

    Result(rmse, top("TV"), top("Movie"))
  }

  /** Run + write the reference's two single-file CSV outputs
    * (`recommendations_series.csv` / `recommendations_movies.csv`,
    * reference `model-als.py:173-174`).
    */
  def runAndWrite(spark: SparkSession, animeCsv: String, ratingsCsv: String,
                  personalCsv: String, cfg: Config,
                  tvOut: String, moviesOut: String): Result = {
    val r = run(spark, animeCsv, ratingsCsv, personalCsv, cfg)
    Tables.writeSingleCsv(r.tv, tvOut)
    Tables.writeSingleCsv(r.movies, moviesOut)
    r
  }
}
