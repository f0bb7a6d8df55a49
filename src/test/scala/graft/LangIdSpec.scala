package graft

import org.apache.spark.sql.functions._
import graft.ext.TextOps
import graft.functions.LangId

/** Pins the native codegen [[graft.functions.LangId]] expression to the
  * column-algebra battery `TextOps.langId` (the VectorDot
  * codegen≡algebra pattern): same tokenization, same stopword hits,
  * same greatest-of-structs tie-break, same 'und' fallback.
  */
class LangIdSpec extends SparkTestBase {
  import spark.implicits._

  private val tricky = Seq(
    // one clear winner per language
    "the cat sat on the mat and it is that",
    "el perro y la casa que es por un",
    "le chien et la maison est pour une",
    "der hund und die katze ist ein von",
    "的 是 了 在 我",
    // shared stopwords: "la"/"de"/"en"/"un" are es+fr, "in" is en+de
    "la de en un",
    "in the in die",
    // exact tie between en and es hits -> struct order breaks toward the
    // lexicographically larger language name
    "the a el la",
    "von zu the is",
    // no stopword hits / empty / whitespace-only / mixed case / unicode
    "qqq www zzz",
    "",
    "   ",
    "THE CAT IS HERE",
    "Der Hund IST von hier",
    "naïve café résumé",
    "a\tb\nthe\r\nis",
    "singleword")

  test("LangId equals TextOps.langId on the tricky battery (literal frames)") {
    val out = tricky.toDF("text")
      .select(col("text"), LangId(col("text")).as("native"),
        TextOps.langId(col("text")).as("algebra"))
      .collect()
    out.foreach { r =>
      assert(r.getString(1) === r.getString(2),
        s"mismatch on '${r.getString(0)}'")
    }
  }

  test("LangId equals TextOps.langId over the documents file scan (codegen path)") {
    // a parquet scan (not a LocalRelation) so ConvertToLocalRelation can't
    // constant-fold the expressions: this exercises doGenCode for real
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val mismatches = docs
      .select(LangId(col("text")).as("native"),
        TextOps.langId(col("text")).as("algebra"))
      .filter(col("native") =!= col("algebra"))
      .count()
    assert(mismatches === 0L)
    // and the expression really is inside a WholeStageCodegen span
    val plan = docs.select(LangId(col("text")).as("p"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"lang_id fell out of codegen:\n$plan")
  }

  test("LangId is null-safe and registered as SQL function lang_id") {
    val viaSql = spark.sql("SELECT lang_id('el perro y la casa que') AS l")
      .as[String].head()
    assert(viaSql === "es")
    val withNull = Seq(Some("the cat is here"), None).toDF("text")
      .select(LangId(col("text")).as("l"))
      .collect().map(r => Option(r.getString(0)))
    assert(withNull.toSeq === Seq(Some("en"), None))
  }

  test("LangId rejects non-string input at analysis time") {
    val err = intercept[Exception] {
      Seq(1, 2).toDF("n").select(LangId(col("n"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("string"))
  }
}
