package graft

import java.nio.file.Files
import graft.schema.Schemas
import graft.sources.Tables

class TablesSpec extends SparkTestBase {

  test("typed loaders: Dataset[T] over each fixture with exact field match") {
    val ev = graft.sources.Tables.events(spark, sf)
    assert(ev.head().event_type.nonEmpty && ev.count() > 0)
    val docs = graft.sources.Tables.documents(spark, sf)
    assert(docs.head().text.nonEmpty)
    val emb = graft.sources.Tables.embeddings(spark, sf)
    assert(emb.head().embedding.nonEmpty)
    // typed filter + map stay on the same columns, no Row casts
    val perLang = docs.filter(_.lang == "en").map(_.n_chars)(
      org.apache.spark.sql.Encoders.scalaLong).count()
    assert(perLang > 0)
  }

  test("csv scan maps literal 'Unknown' to NULL and honors quote=escape (model-als.py:56-67)") {
    val dir = Files.createTempDirectory("graftcsv").toFile
    val f = new java.io.File(dir, "r.csv")
    java.nio.file.Files.writeString(f.toPath,
      """user_id,anime_id,rating
        |1,10,4.5
        | 2 ,11,Unknown
        |3,12,3.0
        |""".stripMargin)
    val df = Tables.csv(spark, f.getAbsolutePath, Schemas.rating)
    assert(df.count() === 3)
    // 'Unknown' in a double column → NULL; whitespace trimmed on ints
    assert(df.filter(df("rating").isNull).count() === 1)
    assert(df.filter(df("user_id") === 2).count() === 1)
  }

  test("anime schema handles spaces and hyphens in column names") {
    import org.apache.spark.sql.Row
    import scala.jdk.CollectionConverters._
    val row = Row.fromSeq(Seq[Any](1, "x") ++ Seq.fill(33)(null))
    val df = spark.createDataFrame(List(row).asJava, Schemas.anime)
    assert(df.select(df.col("`English name`"), df.col("`Score-10`"),
      df.col("`On-Hold`")).count() === 1)
    assert(Schemas.anime.fields.length === 35)
  }

  test("writeSingleCsv produces one exact-named file with header (model-als.py:173-174)") {
    import spark.implicits._
    val out = Files.createTempDirectory("graftout").resolve("top5.csv").toString
    Tables.writeSingleCsv(Seq((1, "a"), (2, "b")).toDF("id", "name"), out)
    val lines = scala.io.Source.fromFile(out).getLines().toList
    assert(lines.head === "id,name" && lines.size === 3)
  }

  test("events loader normalizes nano timestamps to TimestampType") {
    val ev = Tables.load(spark, sf, "events")
    assert(ev.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    assert(ev.count() > 0)
  }
}
