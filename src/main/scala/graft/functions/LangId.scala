package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: stopword-based language ID in one pass
  * over the string.
  *
  * Semantically identical to the column-algebra battery
  * `TextOps.langIdFromScores(TextOps.langScores(tokens(text)))`
  * (spec-pinned): tokenize like `split(lower(text), "\\s+")`, count
  * tokens hitting each language's stopword set, return the language
  * with the most hits (ties broken toward the lexicographically larger
  * language name — the `greatest`-of-structs order), or 'und' on zero
  * hits.
  *
  * Why an Expression: the algebra evaluates 5 interpreted
  * filter/array_contains HOFs per row (HOFs never enter whole-stage
  * codegen), which made q28 the slowest bench query at 3.6 s — for a
  * linear map-side op. Here each token is one hash-map probe against a
  * token→language-bitmask table; the row cost is one generated static
  * call.
  */
case class LangId(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lang_id requires a STRING input, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"
  override def foldable: Boolean = child.foldable

  override def nullSafeEval(input: Any): Any =
    LangId.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangId.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
}

object LangId {

  /** Column-API entry point. */
  def apply(text: Column): Column =
    Bridge.column(LangId(Bridge.expression(text)))

  // ascending name order: on tied hit counts the LARGEST index with the
  // max count wins, which is exactly the greatest(struct(hits, lang))
  // tie-break of the column algebra
  private val Langs: Array[UTF8String] =
    graft.ext.TextOps.stopwords.keys.toArray.sorted.map(UTF8String.fromString)

  private val Und = UTF8String.fromString("und")

  // token → bitmask of languages whose stopword set contains it (several
  // sets share tokens: "la" is es+fr, "in" is en+de, ...)
  private val Mask: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    val langNames = graft.ext.TextOps.stopwords.keys.toArray.sorted
    langNames.zipWithIndex.foreach { case (lang, i) =>
      graft.ext.TextOps.stopwords(lang).foreach { w =>
        m.merge(w, Integer.valueOf(1 << i), (a, b) =>
          Integer.valueOf(a.intValue | b.intValue))
      }
    }
    m
  }

  private val SplitPattern = java.util.regex.Pattern.compile("\\s+")

  /** One pass: tokenize, probe the bitmask table per token, argmax.
    * Invoked from both interpreted eval and generated code.
    */
  def compute(text: UTF8String): UTF8String = {
    // Pattern.split(s, -1) matches Spark's split(col, "\\s+") exactly
    val tokens = SplitPattern.split(text.toLowerCase.toString, -1)
    val counts = new Array[Int](Langs.length)
    var i = 0
    while (i < tokens.length) {
      val m = Mask.get(tokens(i))
      if (m != null) {
        val mask = m.intValue
        var b = 0
        while (b < counts.length) {
          if ((mask & (1 << b)) != 0) counts(b) += 1
          b += 1
        }
      }
      i += 1
    }
    var best = -1
    var bestCount = 0
    var b = 0
    while (b < counts.length) {
      if (counts(b) >= bestCount && counts(b) > 0) { // >=: later (larger) lang wins ties
        best = b; bestCount = counts(b)
      }
      b += 1
    }
    if (best < 0) Und else Langs(best)
  }
}
