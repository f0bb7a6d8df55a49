package graft

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.DoubleType

/** The decimal-exposure criterion (PLANS.md "Double money sums cross
  * the 2-dp rounding floor"), EXECUTABLE instead of remembered (r12
  * verdict #4): a double sum's order-dependent error is ~|sum|·1e-13,
  * and a hash-compared money result rounds to the 2-dp grid, so a site
  * is safe only while max|group sum| · 1e-13 stays below the 0.005
  * half-grid at the TARGET scale — 100× the sf0.1 bench corpus, the
  * brief's stated multiplier.
  *
  * The audit walks every `SparkEntry.queries` plan, finds every
  * double-typed `sum` whose inputs reference a money column (the 2-dp
  * base columns, or a derived column with a money-ish name), REBUILDS
  * that exact aggregate via the bridge to measure its true max |group
  * sum| on the test corpus, and extrapolates linearly to the target.
  * Groups keyed on a replica-offset id (order/doc/vec/event keys —
  * MakeTenX offsets these, so per-key group size is scale-invariant)
  * extrapolate ×1; everything else (few coarse groups over a growing
  * corpus, incl. per-user: the default axis deepens user streams)
  * extrapolates with the corpus. Any site this flags gets the
  * DECIMAL(12,2) treatment the eight r12 sites got; DECIMAL sums are
  * invisible here by construction (not DoubleType).
  *
  * Known limitation: `halfGrid` is the 2-dp grid most exposed money
  * sums round to. A site whose OUTPUT rounds finer (q146's 4-dp
  * loo_enc) has a 200× tighter true bound this sweep under-enforces —
  * tying each site's grid to its downstream round() would need
  * expression-lineage tracing. The scale ladder is the empirical
  * backstop for that residue (it is exactly how q146 was caught), and
  * per-row rounded outputs only flip when output-row COUNT makes a
  * ~1e-9-band boundary hit likely — the few-output-row profile means
  * (q09/q58) sit orders below that.
  */
class MoneySumAuditSpec extends SparkTestBase {

  // 2-dp money base columns in the corpus + money-ish derived names
  private val moneyBase = Set("l_extendedprice", "o_totalprice")
  private val moneyName =
    "(?i).*(price|revenue|amount|spend|charge|sales|monetary).*".r.pattern

  private def isMoney(a: Attribute): Boolean =
    moneyBase.contains(a.name) || moneyName.matcher(a.name).matches()

  // corpus multiplier test→target: sf0.001 → 100 × sf0.1
  private val mult = 100.0 * (0.1 / 0.001)
  private val halfGrid = 0.005
  private val relErr = 1e-13

  // grouping keys MakeTenX replica-offsets: per-key group size is flat
  // under replication, so these sums do NOT grow with the corpus
  private val replicaKeys = Set("o_orderkey", "l_orderkey", "doc_id",
    "vec_id", "event_id")

  /** Sites past the magnitude bound whose sums ONLY feed
    * ratio-normalized outputs OF O(1) MAGNITUDE (shares, fitted
    * coefficients): a quotient of two sums carries ~1e-13 RELATIVE
    * error at any corpus size (numerator and denominator grow
    * together), and against an O(1) value a 4-dp grid is a 5e-5
    * ABSOLUTE tolerance — 8+ orders above the error floor.
    *
    * The magnitude qualifier is load-bearing, not decoration: q146's
    * LOO encode sat here through round 12 on the quotient argument
    * alone, but its output is a group MEAN (target magnitude, ~1e5
    * money), where the same 4-dp grid is a ~3e-10 relative tolerance
    * — tens of ulp — and the 100× ladder measured the summation-order
    * ulp crossing it (100/1.5M rows flipped). A ratio entry is valid
    * only when grid ÷ |output| stays orders above 1e-13; group-mean-
    * scaled outputs take the DECIMAL treatment instead (q146 now does).
    * Keyed by (query :: sum-expression) so a future edit that adds a
    * genuinely exposed sum to one of these queries still fails.
    */
  private val ratioNormalized: Map[String, String] = Map(
    ("q163_ridge_regression :: sum((CAST(l_quantity AS DOUBLE) * " +
      "CAST(l_extendedprice AS DOUBLE)))") ->
      "moment feeds Cramer-rule coefficient quotients only",
    ("q163_ridge_regression :: sum((CAST(l_discount AS DOUBLE) * " +
      "CAST(l_extendedprice AS DOUBLE)))") ->
      "moment feeds Cramer-rule coefficient quotients only",
    "q238_promo_revenue :: sum((l_extendedprice * (1.0D - l_discount)))" ->
      "promo share = sumP·100/sumAll, 4-dp ratio of co-scaled sums",
    "q284_supplier_hhi :: sum((l_extendedprice * (1.0D - l_discount)))" ->
      "supplier revenue feeds _r/_tot shares (HHI, top_share) only")

  test("every double money sum stays below the rounding half-grid at " +
    "100x bench scale") {
    val offenders = scala.collection.mutable.LinkedHashSet[String]()
    val hit = scala.collection.mutable.Set[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val analyzed =
        try fn(spark, sf).queryExecution.analyzed
        catch { case e: Throwable =>
          fail(s"$name failed to plan: ${e.getMessage}")
        }
      analyzed.foreach {
        case agg: Aggregate =>
          val sums = agg.aggregateExpressions.flatMap(_.collect {
            case ae @ AggregateExpression(s: Sum, _, _, _, _)
              if s.child.dataType == DoubleType &&
                s.child.references.exists(isMoney) => ae
          })
          if (sums.nonEmpty) {
            val keyed = agg.groupingExpressions
              .flatMap(_.references).exists(a => replicaKeys(a.name))
            val siteMult = if (keyed) 1.0 else mult
            sums.foreach { ae =>
              val probe = Aggregate(agg.groupingExpressions,
                agg.groupingExpressions.map {
                  case a: Attribute => a
                  case e: Expression => Alias(e, "_k")()
                } :+ Alias(ae, "_s")(), agg.child)
              val maxAbs = Bridge.ofRows(spark, probe)
                .agg(max(abs(col("_s")))).head().getDouble(0)
              val bound = maxAbs * siteMult * relErr
              if (bound >= halfGrid) {
                val key = s"$name :: ${ae.sql}"
                if (ratioNormalized.contains(key)) hit += key
                else offenders += f"$key max|group sum|=$maxAbs%.3g " +
                  f"×$siteMult%.0f → err bound $bound%.4f ≥ $halfGrid " +
                  "(needs DECIMAL(12,2) or a ratioNormalized entry)"
              }
            }
          }
        case _ => ()
      }
    }
    assert(offenders.isEmpty,
      s"double money sums past the half-grid at 100×:\n" +
        offenders.mkString("\n"))
    // stale allowlist = an adjudication no longer anchored to a site
    val stale = ratioNormalized.keySet -- hit
    assert(stale.isEmpty,
      s"ratioNormalized entries match no flagged site (stale): $stale")
  }
}
