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
  * BroadcastNestedLoopJoin is NOT swept here: a BNLJ's build side is a
  * broadcast, and every explicit broadcast — including the
  * `crossJoin(broadcast(…))` expansions — is covered by
  * BroadcastScaleAuditSpec's two-rung growth probe; an UN-hinted BNLJ
  * only arises when the planner sized the build side under the
  * broadcast threshold itself, which AQE re-checks at runtime. The
  * un-broadcast cartesian is the one shape with no safety net, hence
  * the zero-tolerance sweep.
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
}
