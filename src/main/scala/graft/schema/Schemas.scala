package graft.schema

import org.apache.spark.sql.types._

/** Centralized schema declarations.
  *
  * The reference duplicates its 35-field anime schema in two files
  * (reference `model-als.py:18-54` vs `exploratory-data-analysis.py:19-55`);
  * we declare each schema once. All fields nullable, matching the
  * reference (`model-als.py:19-53`). Column names with spaces
  * ("English name") and hyphens ("Score-10", "On-Hold") are preserved —
  * callers must backtick-quote them in SQL.
  */
object Schemas {

  private def f(name: String, t: DataType) = StructField(name, t, nullable = true)

  /** 35-column anime metadata schema (reference `model-als.py:18-54`). */
  val anime: StructType = StructType(Seq(
    f("ID", IntegerType), f("Name", StringType), f("Score", DoubleType),
    f("Genres", StringType), f("English name", StringType),
    f("Japanese name", StringType), f("Type", StringType),
    f("Episodes", IntegerType), f("Aired", StringType),
    f("Premiered", StringType), f("Producers", StringType),
    f("Licensors", StringType), f("Studios", StringType),
    f("Source", StringType), f("Duration", StringType),
    f("Rating", StringType), f("Ranked", DoubleType),
    f("Popularity", IntegerType), f("Members", IntegerType),
    f("Favorites", IntegerType), f("Watching", IntegerType),
    f("Completed", IntegerType), f("On-Hold", IntegerType),
    f("Dropped", IntegerType), f("Plan to Watch", IntegerType),
    f("Score-10", DoubleType), f("Score-9", DoubleType),
    f("Score-8", DoubleType), f("Score-7", DoubleType),
    f("Score-6", DoubleType), f("Score-5", DoubleType),
    f("Score-4", DoubleType), f("Score-3", DoubleType),
    f("Score-2", DoubleType), f("Score-1", DoubleType)))

  /** (user_id, anime_id, rating) triple (reference `model-als.py:73-77`). */
  val rating: StructType = StructType(Seq(
    f("user_id", IntegerType), f("anime_id", IntegerType),
    f("rating", DoubleType)))
}

/** Typed row models for the harness tables — use `Dataset[T]` where
  * compile-time field safety pays (pipelines that thread many columns),
  * `DataFrame` where the schema is dynamic. Field names/types mirror the
  * parquet fixtures exactly so `.as[T]` is a no-op projection.
  */
object Types {
  case class Rating(user_id: Int, anime_id: Int, rating: Double)
  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double, props: String)
  case class Document(doc_id: Long, text: String, lang: String,
                      source: String, n_chars: Long)
  case class Embedding(vec_id: Long, embedding: Seq[Float], label: Int)
}
