package graft

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Collect}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}

/** The "corpus-scaled collect buffer" criterion, the aggregation-state
  * analog of WindowScaleAuditSpec: `collect_list`/`collect_set`
  * materialize the WHOLE group in one aggregation buffer (unlike
  * sum/count, they have no fixed-size partial state — partial buffers
  * concatenate), so a collect over a group whose row count tracks the
  * corpus is unbounded executor memory at 100 TB, silently green on
  * every test corpus. Every collect therefore carries the same proof
  * obligation a window partition does: the group must be bounded by
  * something corpus-independent (a document's lines, an embedding's
  * dimensions, a user's truth list in a fixed eval window).
  *
  * Funnel (WindowScaleAuditSpec's, applied to Aggregate nodes):
  *   1. plan every `SparkEntry.queries` entry at sf0.001; collect the
  *      Aggregate nodes carrying a `Collect`-family function that
  *      SURVIVE optimization;
  *   2. measure each aggregate's max group size — candidates are
  *      maxRows ≥ 150;
  *   3. re-measure candidates at sf0.01 (10× on every axis) and flag
  *      groups that grew ≥ 4× to ≥ 1500 rows — a buffer tracking the
  *      corpus, not a bound.
  *
  * Flagged sites get a k-bounded aggregate (TopKScoredAggregator), a
  * pre-aggregation that shrinks the group first, or an `adjudicated`
  * entry naming the corpus-independent bound the probe cannot see.
  * Keyed (query :: grouping/collect shape) with stale-entry detection.
  *
  * Collects running OVER a window (not a groupBy) are the window
  * audit's jurisdiction: their buffer is frame-bounded, and the
  * partition-size probe there covers the sort that dominates them.
  */
class CollectScaleAuditSpec extends SparkTestBase {

  private val sfSmall = "/root/testdata/sf0.001"
  private val sfBig = "/root/testdata/sf0.01"

  private val candidateRows = 150L
  private val flagRows = 1500L
  private val flagGrowth = 4.0

  /** Flagged collects whose groups are in fact bounded by something
    * the two-scale probe cannot see. Rationale must name the bound.
    */
  private val adjudicated: Map[String, String] = Map.empty

  // One copy of the max-group-rows probe for all aggregation-state
  // audits (this suite and AggStateAuditSpec): JoinProbe.maxKeyFreq IS
  // the same computation (rows per key value over a subtree), with the
  // shared canonicalized-plan-object cache — a subtree probed by one
  // audit is free for the other.
  private def maxGroupRows(dir: String, a: Aggregate): Long =
    JoinProbe.maxKeyFreq(spark, dir, a.child, a.groupingExpressions)

  private def collectAggsOf(plan: LogicalPlan): Seq[Aggregate] =
    plan.collect {
      case a: Aggregate if a.aggregateExpressions.exists(_.collectFirst {
        case AggregateExpression(c: Collect[_], _, _, _, _) => c
      }.isDefined) => a
    }

  private def label(name: String, a: Aggregate, idx: Int): String = {
    val g = a.groupingExpressions.map(_.sql).mkString(", ")
    s"$name :: collect groupBy($g) #$idx"
  }

  test("no collect_list/collect_set buffers a corpus-scaled group " +
    "(unbounded-buffer criterion, swept)") {
    val offenders = collection.mutable.LinkedHashSet[String]()
    val hit = collection.mutable.Set[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val smallAs =
        try collectAggsOf(fn(spark, sfSmall).queryExecution.optimizedPlan)
        catch { case e: Throwable =>
          fail(s"$name failed to plan at sf0.001: ${e.getMessage}")
        }
      val candidates = smallAs.zipWithIndex.flatMap { case (a, i) =>
        val m = maxGroupRows(sfSmall, a)
        if (m >= candidateRows) Some((i, m)) else None
      }
      if (candidates.nonEmpty) {
        val bigAs =
          collectAggsOf(fn(spark, sfBig).queryExecution.optimizedPlan)
        assert(bigAs.length == smallAs.length,
          s"$name: collect-aggregate count differs across scales " +
            s"(${smallAs.length} vs ${bigAs.length}) — audit cannot " +
            "match sites")
        candidates.foreach { case (i, sm) =>
          val bm = maxGroupRows(sfBig, bigAs(i))
          val growth = bm.toDouble / math.max(sm, 1L)
          if (bm >= flagRows && growth >= flagGrowth) {
            val key = label(name, bigAs(i), i)
            if (adjudicated.contains(key)) hit += key
            else offenders += f"$key maxGroupRows $sm→$bm " +
              f"(×$growth%.1f at 10×) — corpus-scaled collect buffer"
          }
        }
      }
    }
    assert(offenders.isEmpty,
      "collect buffers whose group size tracks the corpus (k-bound " +
        "the aggregate, pre-shrink the group, or adjudicate with a " +
        s"named bound):\n${offenders.mkString("\n")}")
    val stale = adjudicated.keySet -- hit
    assert(stale.isEmpty,
      s"adjudicated entries match no flagged collect (stale): $stale")
  }
}
