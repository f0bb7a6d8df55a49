package graft

import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, LogicalPlan, ResolvedHint}

/** The "forced broadcast of a corpus-scaled side" criterion, EXECUTABLE
  * as a sweep over every explicit `broadcast()` hint instead of
  * remembered per query: an un-hinted join is scale-safe by
  * construction — the static planner sizes it from file statistics and
  * AQE re-decides from ACTUAL runtime sizes, so it degrades to a
  * shuffle join when the small side stops being small. An explicit
  * hint removes that safety net: Spark broadcasts the side at ANY
  * size (driver collect + per-executor copy), so a hinted side whose
  * row count tracks the corpus is a driver/executor OOM waiting at
  * the target scale, silently green on every test corpus.
  *
  * A hint therefore carries a proof obligation: the hinted frame must
  * be bounded by something corpus-independent (a fixed dim like
  * nation/region, a grid, percentile cuts, a k-bounded candidate set,
  * a capacity-capped sketch) — and this audit is that proof, run
  * empirically at two corpus rungs.
  *
  * Funnel (keeps big-corpus probing to genuine candidates):
  *   1. plan every `SparkEntry.queries` entry at sf0.001, collect the
  *      `ResolvedHint(BROADCAST)` nodes from the ANALYZED plan (hints
  *      are erased into join nodes by the optimizer, and the analyzed
  *      plan also sees through later cache substitution);
  *   2. count each hinted subtree's rows — candidates are ≥ 6 rows
  *      (below that, even linear growth stays broadcastable to the
  *      audit's target);
  *   3. re-count candidates at sf0.01 (a 10× corpus on every axis)
  *      and flag sides whose count grew ≥ `flagGrowth` AND whose
  *      PROJECTED count at the target — 100× the sf0.1 bench corpus,
  *      i.e. growth^4 off sf0.001, the same target MoneySumAuditSpec
  *      extrapolates to — exceeds `projectedRowCap` (1M rows is past
  *      any sensible broadcast at that scale once real payload widths
  *      apply).
  *
  * Flagged sites get the hint REMOVED (the planner's size-based
  * choice is the correct one at every scale, and at test scale it
  * still picks broadcast — the PlanSpec physical pins stay green) or
  * an `adjudicated` entry whose rationale names the
  * corpus-independent bound the two-rung probe cannot see (e.g. a
  * domain that saturates after the probe's rungs). Keyed
  * (query :: hinted schema) with stale-entry detection, like
  * MoneySumAuditSpec's allowlist.
  *
  * Limitations: (a) the projection is rows, not bytes — a pathological
  * wide-payload frame could pass on rows while being heavy in bytes;
  * (b) hinted frames behind a staged-parquet leaf are probed as their
  * staged contents (still the right question: it is those rows that
  * broadcast); (c) the target is the harness's sf10 — at a literal
  * 100 TB every linearly-growing side eventually flags, which is the
  * point of preferring un-hinted joins wherever this audit allows.
  */
class BroadcastScaleAuditSpec extends SparkTestBase {

  private val sfSmall = "/root/testdata/sf0.001"
  private val sfBig = "/root/testdata/sf0.01"

  private val candidateRows = 6L // below: broadcastable even ×10^4
  private val flagGrowth = 3.0 // ≥ this across the 10× rung → scales
  private val projectedRowCap = 1000000.0 // rows at growth^4 (sf10)

  /** Flagged hints whose frames are in fact bounded by something the
    * two-scale probe cannot see. Rationale must name the bound.
    */
  private val adjudicated: Map[String, String] = Map.empty

  // hinted subtrees shared across queries (operator helpers) probe
  // once per corpus — and once across ALL audits ([[PlanProbe]])
  private def rowsOf(dir: String, h: ResolvedHint): Long =
    PlanProbe.rows(spark, dir, h.child)

  private def hintsOf(plan: LogicalPlan): Seq[ResolvedHint] =
    plan.collect {
      case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) => h
    }

  private def label(name: String, h: ResolvedHint, idx: Int): String =
    s"$name :: broadcast<${h.child.schema.fieldNames.mkString(",")}> #$idx"

  test("no explicit broadcast hint pins a corpus-scaled side " +
    "(forced-broadcast criterion, swept)") {
    val offenders = collection.mutable.LinkedHashSet[String]()
    val hit = collection.mutable.Set[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val smallHs =
        try hintsOf(fn(spark, sfSmall).queryExecution.analyzed)
        catch { case e: Throwable =>
          fail(s"$name failed to plan at sf0.001: ${e.getMessage}")
        }
      val candidates = smallHs.zipWithIndex.flatMap { case (h, i) =>
        val n = rowsOf(sfSmall, h)
        if (n >= candidateRows) Some((i, n)) else None
      }
      if (candidates.nonEmpty) {
        // same code path → structurally identical plan at the big
        // corpus; match hints by collection order
        val bigHs = hintsOf(fn(spark, sfBig).queryExecution.analyzed)
        assert(bigHs.length == smallHs.length,
          s"$name: hint count differs across scales " +
            s"(${smallHs.length} vs ${bigHs.length}) — audit cannot " +
            "match sites")
        candidates.foreach { case (i, sn) =>
          val bn = rowsOf(sfBig, bigHs(i))
          val growth = bn.toDouble / math.max(sn, 1L)
          val projected = sn * math.pow(growth, 4)
          if (growth >= flagGrowth && projected >= projectedRowCap) {
            val key = label(name, bigHs(i), i)
            if (adjudicated.contains(key)) hit += key
            else offenders += f"$key rows $sn→$bn (×$growth%.1f at " +
              f"10×, ~${projected / 1e6}%.1fM at target) — " +
              "forced broadcast of a corpus-scaled frame"
          }
        }
      }
    }
    assert(offenders.isEmpty,
      "explicit broadcast hints on corpus-scaled frames (drop the " +
        "hint — size-based planning + AQE pick correctly at every " +
        s"scale — or adjudicate with a named bound):\n" +
        offenders.mkString("\n"))
    val stale = adjudicated.keySet -- hit
    assert(stale.isEmpty,
      s"adjudicated entries match no flagged hint (stale): $stale")
  }
}
