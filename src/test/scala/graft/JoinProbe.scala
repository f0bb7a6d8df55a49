package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.Count
import org.apache.spark.sql.catalyst.planning.ExtractEquiJoinKeys
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Shared equi-join extraction + cross-scale site matching for the
  * join-shaped scale audits (JoinSkewAuditSpec,
  * BucketPairBudgetAuditSpec) — one copy of the matching rules, like
  * PlanProbe is the one copy of the row-count cache.
  *
  * Matching is by join-key SIGNATURE (the keys' SQL with attribute
  * qualifiers stripped — bucketed-scan qualifiers embed a dir-derived
  * table hash that would mismatch the same site across rungs) plus
  * ordinal rank among equal signatures, not by traversal position
  * alone: if the optimizer emits joins in a different order at another
  * scale, positional pairing compares sides of DIFFERENT joins
  * (ADVICE r14).
  */
object JoinProbe {

  /** Equi-joins with extracted keys: (join, leftKeys, rightKeys). */
  def equiJoinsOf(plan: LogicalPlan)
  : Seq[(Join, Seq[Expression], Seq[Expression])] =
    plan.collect { case j: Join =>
      ExtractEquiJoinKeys.unapply(j).map { t =>
        (j, t._2, t._3)
      }
    }.flatten

  /** Structural signature of a join site: both key lists' SQL with
    * attribute qualifiers stripped.
    */
  def keySig(lk: Seq[Expression], rk: Seq[Expression]): String = {
    def bare(e: Expression): String = e.transform {
      case a: AttributeReference => a.withQualifier(Seq.empty)
    }.sql
    lk.map(bare).mkString(",") + " | " + rk.map(bare).mkString(",")
  }

  /** The join in `js` matching `sig`, taking the `rank`-th occurrence
    * (for plans with several same-signature sites, e.g. self-join
    * chains); None if the other scale has fewer matching sites.
    */
  def matchJoin(js: Seq[(Join, Seq[Expression], Seq[Expression])],
                sig: String, rank: Int)
  : Option[(Join, Seq[Expression], Seq[Expression])] = {
    val same = js.filter { case (_, lk, rk) => keySig(lk, rk) == sig }
    if (same.length > rank) Some(same(rank)) else None
  }

  /** Structural signature of a NON-equi join site (no keys to sign):
    * join type + qualifier-stripped condition SQL.
    */
  def nonEquiSig(j: Join): String = {
    def bare(e: Expression): String = e.transform {
      case a: AttributeReference => a.withQualifier(Seq.empty)
    }.sql
    j.joinType.toString + " " + j.condition.map(bare).getOrElse("<none>")
  }

  /** The non-equi join in `js` matching `sig` at the `rank`-th
    * occurrence; None if the other scale has fewer matching sites.
    */
  def matchNonEqui(js: Seq[Join], sig: String, rank: Int): Option[Join] = {
    val same = js.filter(nonEquiSig(_) == sig)
    if (same.length > rank) Some(same(rank)) else None
  }

  /** Max rows of any single join-key value on one side — the skew
    * probe. An empty side (a filter matching nothing at this rung)
    * probes as 0, not an NPE (ADVICE r14). Cached on canonicalized
    * plan OBJECTS (never hashCode — ADVICE r13).
    */
  private val freqCache = collection.concurrent.TrieMap[
    (String, LogicalPlan, Seq[Expression]), Long]()
  def maxKeyFreq(spark: SparkSession, dir: String, side: LogicalPlan,
                 keys: Seq[Expression]): Long =
    freqCache.getOrElseUpdate(
      (dir, side.canonicalized, keys.map(_.canonicalized)), {
        val probe = Aggregate(keys,
          keys.zipWithIndex.map { case (e, i) => Alias(e, s"_k$i")() }
            :+ Alias(Count(Literal(1)).toAggregateExpression(), "_c")(),
          side)
        Bridge.ofRows(spark, probe)
          .agg(max(col("_c"))).collect().headOption
          .filterNot(_.isNullAt(0)).map(_.getLong(0)).getOrElse(0L)
      })

  /** The join's candidate-pair budget Σ_k cntL(k)·cntR(k) — the exact
    * number of row pairs the equi-join must generate before any
    * residual filter. This is THE quantity that turns quadratic when a
    * fixed bucket/band/posting key space is joined over a growing
    * corpus (the q34 legacy shape), while staying ∝ corpus for
    * constant-fanout FK joins. Cached like the frequency probe.
    */
  private val budgetCache = collection.concurrent.TrieMap[
    (String, LogicalPlan), Long]()
  def pairBudget(spark: SparkSession, dir: String, j: Join,
                 lk: Seq[Expression], rk: Seq[Expression]): Long =
    budgetCache.getOrElseUpdate((dir, j.canonicalized), {
      def counts(side: LogicalPlan, keys: Seq[Expression], pfx: String) = {
        val agg = Aggregate(keys,
          keys.zipWithIndex.map { case (e, i) =>
            Alias(e, s"${pfx}k$i")()
          } :+ Alias(Count(Literal(1)).toAggregateExpression(),
            s"${pfx}c")(), side)
        Bridge.ofRows(spark, agg)
      }
      val l = counts(j.left, lk, "_l")
      val r = counts(j.right, rk, "_r")
      val cond = lk.indices.map(i => col(s"_lk$i") === col(s"_rk$i"))
        .reduce(_ && _)
      l.join(r, cond)
        .agg(sum(col("_lc") * col("_rc"))).collect().headOption
        .filterNot(_.isNullAt(0)).map(_.getLong(0)).getOrElse(0L)
    })
}
