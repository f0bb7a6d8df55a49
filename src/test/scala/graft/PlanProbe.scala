package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.graftbridge.Bridge

/** Shared (dir, canonicalized subtree) → row-count cache for the scale
  * audits' growth probes (broadcast hints, latent-cartesian BNLJ
  * sides, join-skew sides). One cache instead of a private clone per
  * spec: the hashCode-collision fix (ADVICE r13 — keys are the
  * canonicalized plan OBJECTS, whose structural equality is
  * well-defined, never their Int hashCode) lives in exactly one
  * place, and since all suites share one forked JVM the probes also
  * dedupe ACROSS audits — a helper subtree counted by the broadcast
  * sweep is free for the skew sweep.
  *
  * TrieMap getOrElseUpdate: safe under ScalaTest parallelism; a rare
  * race recomputes the same deterministic count, never corrupts.
  */
object PlanProbe {
  private val cache =
    collection.concurrent.TrieMap[(String, LogicalPlan), Long]()

  def rows(spark: SparkSession, dir: String, p: LogicalPlan): Long =
    cache.getOrElseUpdate((dir, p.canonicalized),
      Bridge.ofRows(spark, p).count())
}
