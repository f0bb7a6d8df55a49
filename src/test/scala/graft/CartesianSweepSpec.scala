package graft

/** The "no accidental cartesian" criterion, swept package-wide instead
  * of pinned per query: PlanSpec asserts `!CartesianProduct` for the
  * handful of queries whose join conditions looked risky when written
  * (q96/q166/q171/q294/q295), but a cartesian can appear ANYWHERE a
  * join condition stops being an equi-condition Catalyst can extract —
  * a refactor that moves an equality into a post-join filter, a
  * UDF-wrapped key, a typo'd column — and at 100 TB a cartesian over
  * two corpus-scaled sides is not slow, it is unrunnable (|L|·|R|
  * rows materialized per partition pair).
  *
  * This sweep plans every `SparkEntry.queries` entry and the flagship
  * `entry` at sf0.001 and asserts NO physical `CartesianProduct` node
  * anywhere, with a rationale-keyed adjudication map for deliberate
  * exceptions (none today — every intended all-pairs expansion in the
  * repo rides `crossJoin(broadcast(tiny))`, which plans as
  * BroadcastNestedLoopJoin, not CartesianProduct).
  *
  * The second test closes the BNLJ loophole: HINTED
  * BroadcastNestedLoopJoins (`crossJoin(broadcast(…))`) are covered by
  * BroadcastScaleAuditSpec's growth probe, but an UN-hinted non-equi
  * join whose small side merely sizes under the broadcast threshold at
  * test scale also plans as BNLJ and passes the physical sweep — and
  * for an INNER non-equi join the fallback once that side outgrows the
  * threshold is CartesianProduct itself (for outer/semi non-equi it is
  * a forced broadcast of a corpus-scaled side — the OOM twin). AQE's
  * runtime re-check is NOT a safety net here: it re-plans the strategy,
  * but the only strategies for a non-equi join are BNLJ and cartesian.
  * So every un-hinted non-equi logical join goes through the same
  * two-rung growth probe the broadcast audit uses, applied to the side
  * the planner would have to broadcast.
  *
  * Plan-only (initial physical plan, pre-AQE): AQE rewrites exchanges
  * and join STRATEGIES among equi-join implementations; it never
  * introduces a cartesian that the initial plan lacked.
  */
class CartesianSweepSpec extends SparkTestBase {

  /** Deliberate cartesians (query → rationale naming the bound). */
  private val adjudicated: Map[String, String] = Map(
    "q35_als_recommend" ->
      ("Spark ML's own recommendForUserSubset: scoring every " +
        "(user, item) candidate pair is the operator's SEMANTICS, and " +
        "MLlib bounds the expansion by packing factors into ~4096-row " +
        "blocks before the cross join (the cartesian is over block " +
        "PAIRS, each scored as one BLAS GEMM) and reducing per-block " +
        "top-k (TopByKeyAggregator) before any shuffle — the " +
        "recommend-for-all shape every production ALS serving path " +
        "uses; output stays k rows per user"))

  test("no query plans a CartesianProduct anywhere (package-wide sweep)") {
    val offenders = collection.mutable.LinkedHashSet[String]()
    val hit = collection.mutable.Set[String]()
    val plans: Seq[(String, org.apache.spark.sql.DataFrame)] =
      ("entry" -> SparkEntry.entry(spark)) +:
        SparkEntry.queries.toSeq.sortBy(_._1)
          .map { case (n, fn) => n -> fn(spark, sf) }
    plans.foreach { case (name, df) =>
      val cartesians = df.queryExecution.sparkPlan.collect {
        case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      }
      if (cartesians.nonEmpty) {
        if (adjudicated.contains(name)) hit += name
        else offenders += s"$name: ${cartesians.length} CartesianProduct " +
          "node(s) — no equi-condition extracted; unrunnable at scale"
      }
    }
    assert(offenders.isEmpty,
      "queries planning cartesian joins (restore an extractable " +
        "equi-condition or adjudicate with a named bound):\n" +
        offenders.mkString("\n"))
    val stale = adjudicated.keySet -- hit
    assert(stale.isEmpty,
      s"adjudicated entries match no cartesian query (stale): $stale")
  }

  // ---- un-hinted non-equi joins: the latent-cartesian growth probe ----

  private val sfSmall = "/root/testdata/sf0.001"
  private val sfBig = "/root/testdata/sf0.01"
  private val sfBench = "/root/testdata/sf0.1"
  private val candidateRows = 6L // below: broadcastable even ×10^4
  private val flagGrowth = 3.0 // ≥ this across the 10× rung → scales
  private val projectedRowCap = 1000000.0 // rows at growth^4 (sf10)

  /** Flagged un-hinted non-equi joins whose broadcast-obligated side is
    * in fact bounded by something the two-rung probe cannot see.
    * Rationale must name the bound.
    */
  private val bnljAdjudicated: Map[String, String] = Map.empty

  import org.apache.spark.sql.catalyst.planning.ExtractEquiJoinKeys
  import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join, JoinHint, LogicalPlan}
  import org.apache.spark.sql.catalyst.plans.{ExistenceJoin, LeftAnti, LeftOuter, LeftSemi, RightOuter}

  private def hintedBroadcast(h: JoinHint): Boolean =
    Seq(h.leftHint, h.rightHint)
      .exists(_.exists(_.strategy.contains(BROADCAST)))

  /** Non-equi joins with no explicit broadcast hint, from the OPTIMIZED
    * plan (hints have been folded into `Join.hint` there; the optimizer
    * has also finished pushing equality conjuncts INTO conditions, so
    * "non-equi here" is what JoinSelection actually sees).
    */
  private def unhintedNonEqui(plan: LogicalPlan): Seq[Join] =
    plan.collect {
      case j: Join
          if ExtractEquiJoinKeys.unapply(j).isEmpty &&
            !hintedBroadcast(j.hint) => j
    }

  /** The side(s) JoinSelection would have to broadcast for a BNLJ: the
    * non-preserved side for one-sided join types — including
    * ExistenceJoin (from a rewritten EXISTS/IN under OR), where only
    * the right side is broadcastable; either (so the smaller) for
    * inner/cross/full.
    */
  private def broadcastObligatedRows(dir0: String, j: Join)(
      rows: (String, LogicalPlan) => Long): Long = j.joinType match {
    case LeftOuter | LeftSemi | LeftAnti | ExistenceJoin(_) =>
      rows(dir0, j.right)
    case RightOuter => rows(dir0, j.left)
    case _ => math.min(rows(dir0, j.left), rows(dir0, j.right))
  }

  private def rowsOf(dir: String, p: LogicalPlan): Long =
    PlanProbe.rows(spark, dir, p)

  private def bnljLabel(name: String, j: Join, idx: Int): String =
    s"$name :: ${j.joinType} nonEqui<" +
      s"${j.condition.map(_.sql).getOrElse("<none>").take(60)}> #$idx"

  test("no un-hinted non-equi join relies on a corpus-scaled side " +
    "staying under the broadcast threshold (latent-cartesian probe)") {
    val offenders = collection.mutable.LinkedHashSet[String]()
    val hit = collection.mutable.Set[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val smallJs =
        try unhintedNonEqui(fn(spark, sfSmall).queryExecution.optimizedPlan)
        catch { case e: Throwable =>
          fail(s"$name failed to plan at sf0.001: ${e.getMessage}")
        }
      val candidates = smallJs.zipWithIndex.flatMap { case (j, i) =>
        val n = broadcastObligatedRows(sfSmall, j)(rowsOf)
        if (n >= candidateRows) Some((i, n)) else None
      }
      if (candidates.nonEmpty) {
        val bigJs =
          unhintedNonEqui(fn(spark, sfBig).queryExecution.optimizedPlan)
        lazy val benchJs =
          unhintedNonEqui(fn(spark, sfBench).queryExecution.optimizedPlan)
        candidates.foreach { case (i, sn) =>
          // match the site across scales by structural signature +
          // ordinal rank, not position (ADVICE r14: a reordered plan
          // would silently pair sides of DIFFERENT joins)
          val sig = JoinProbe.nonEquiSig(smallJs(i))
          val sigRank = smallJs.take(i)
            .count(JoinProbe.nonEquiSig(_) == sig)
          val bigJ = JoinProbe.matchNonEqui(bigJs, sig, sigRank)
            .getOrElse(fail(s"$name: no sf0.01 non-equi join matches " +
              s"[$sig] occurrence $sigRank — probe cannot match sites"))
          val bn = broadcastObligatedRows(sfBig, bigJ)(rowsOf)
          val g1 = bn.toDouble / math.max(sn, 1L)
          // a side flat on the early pair can still grow on the late
          // one (the embeddings shape — VERDICT r14 #3): fall back to
          // the sf0.01→sf0.1 pair before declaring it safe. Exponent
          // is decades-to-target: 4 from sf0.001, 3 from sf0.01.
          val (growth, base, exponent, loDir, hiDir) =
            if (g1 >= flagGrowth) (g1, sn, 4, sfSmall, sfBig)
            else {
              val benchJ = JoinProbe.matchNonEqui(benchJs, sig, sigRank)
                .getOrElse(fail(s"$name: no sf0.1 non-equi join " +
                  s"matches [$sig] occurrence $sigRank — probe cannot " +
                  "match sites"))
              val cn = broadcastObligatedRows(sfBench, benchJ)(rowsOf)
              (cn.toDouble / math.max(bn, 1L), bn, 3, sfBig, sfBench)
            }
          val projected = base * math.pow(growth, exponent)
          if (growth >= flagGrowth && projected >= projectedRowCap) {
            val key = bnljLabel(name, bigJ, i)
            if (bnljAdjudicated.contains(key)) hit += key
            else offenders += f"$key rows ×$growth%.1f on " +
              f"$loDir→$hiDir (~${projected / 1e6}%.1fM at target) — " +
              "becomes a cartesian (inner) or forced huge broadcast " +
              "(outer) once past the threshold"
          }
        }
      }
    }
    assert(offenders.isEmpty,
      "un-hinted non-equi joins whose broadcast-obligated side tracks " +
        "the corpus (restore an equi-condition, pre-bound the side, " +
        s"or adjudicate with a named bound):\n${offenders.mkString("\n")}")
    val stale = bnljAdjudicated.keySet -- hit
    assert(stale.isEmpty,
      s"adjudicated entries match no flagged join (stale): $stale")
  }
}
