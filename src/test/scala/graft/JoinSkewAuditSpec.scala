package graft

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.functions._

/** The "skewed shuffle join" criterion (the sixth member of the scale
  * audit family — VERDICT r13 #3): q43 salts its hot-key join by hand,
  * but nothing proved the OTHER shuffle joins are skew-safe. A shuffle
  * equi-join partitions BOTH sides by key, so every row of one key
  * lands in one task: a key whose row count tracks the corpus is a
  * straggler sort (and, matched against a hot key on the other side, a
  * |fa|×|fb| output explosion) at 100 TB — silently green on every
  * test corpus. AQE's skew-join split mitigates oversized PARTITIONS,
  * but the per-key growth is the structural signal that the join
  * needed a salt, a pre-aggregation, or a capped expansion.
  *
  * Funnel (the family's rung shape, applied per join SIDE, with the
  * rung PAIR chosen per side — VERDICT r14 #3: the original fixed
  * sf0.001→sf0.01 pair saw zero growth for tables that only start
  * growing later (embeddings are flat 500→500 across that pair and
  * grow 500→2000 only at sf0.1), so every embeddings-sided join was
  * exempted as "corpus-independent" — exactly how q34's hot bucket
  * key escaped the sweep built to catch it):
  *   1. plan every `SparkEntry.queries` entry at sf0.001; collect the
  *      equi-joins (`ExtractEquiJoinKeys`) from the optimized plan;
  *      cross-scale sites are matched by join-key SIGNATURE (the
  *      keys' .sql, with ordinal rank among equal signatures), not by
  *      traversal position alone (ADVICE r14);
  *   2. classify each side's growth on BOTH rung pairs
  *      (sf0.001→sf0.01 and sf0.01→sf0.1): a side is corpus-scaled on
  *      the FIRST pair where its rows grow ≥ 3×, flat only if it
  *      grows on neither. SKIP joins where some side is flat AND its
  *      estimated bytes (rows at sf0.1 × Σ dataType.defaultSize) fit
  *      spark.sql.autoBroadcastJoinThreshold — size-based planning
  *      broadcasts that side at every scale, so no shuffle
  *      materializes. Growth-stability alone is not enough (a flat
  *      but threshold-exceeding side still shuffles), and a row-count
  *      proxy is not enough either (100k wide rows overflow ~10MB —
  *      ADVICE r14). Explicit-hint growth is BroadcastScaleAuditSpec's
  *      jurisdiction;
  *   3. for corpus-scaled sides, probe the side's MAX key frequency
  *      on its join keys at ITS OWN lo rung — candidates are
  *      maxFreq ≥ 150;
  *   4. re-probe candidates at the side's hi rung and flag sides
  *      whose max frequency grew ≥ `flagGrowth` AND whose PROJECTED
  *      hot-key rows at the harness target (growth^e off the lo rung,
  *      e = decades-to-target: 4 from sf0.001, 3 from sf0.01) exceed
  *      `hotKeyRowCap`: a single reducer task sorting that many rows
  *      of one key is the straggler, before any cross-side match
  *      multiplies it.
  *
  * Flagged sites get the q43 treatment (salt the hot side, replicate
  * the other), a pre-aggregation that collapses the key first, a
  * capped expansion (cappedBaskets' contract), or an `adjudicated`
  * entry whose rationale names the corpus-independent frequency bound
  * the probe cannot see. Keyed (query :: keys) with stale-entry
  * detection, like the rest of the family.
  *
  * Limitations: (a) joins behind a cache/staged-parquet boundary are
  * probed as their materialized contents (the right question — those
  * are the rows that shuffle); (b) frequency growth is measured on
  * one 10× rung per side, so a key distribution that only turns
  * Zipfian beyond the last probed rung is invisible — the cap is set
  * low enough (5M rows/key at target) that any linear-in-corpus key
  * flags well before that; (c) the CONSTANT-SHARE hot-key class (a
  * fixed bucket space whose every key tracks the corpus — the q34
  * legacy shape) is under-approximated by the absolute freq threshold
  * at these corpus sizes; BucketPairBudgetAuditSpec owns that class
  * via the Σ count² pair-budget criterion.
  */
class JoinSkewAuditSpec extends SparkTestBase {

  private val sfSmall = "/root/testdata/sf0.001"
  private val sfBig = "/root/testdata/sf0.01"
  private val sfBench = "/root/testdata/sf0.1"

  private val tinyRows = 6L // below: broadcastable at any scale
  private val sideGrowthFloor = 3.0 // rows growth < this on a pair → flat there
  private val candidateFreq = 150L // max key rows at the lo rung worth re-probing
  private val flagGrowth = 3.0 // key-frequency growth ≥ this → corpus-scaled
  private val hotKeyRowCap = 5e6 // projected rows of ONE key at target

  /** Flagged join sides whose hot-key growth is in fact bounded by
    * something the two-rung probe cannot see. Rationale must name the
    * bound.
    */
  private val adjudicated: Map[String, String] = Map.empty

  private def rowsOf(dir: String, p: LogicalPlan): Long =
    PlanProbe.rows(spark, dir, p)

  /** Broadcast threshold in bytes (conf value may carry a size suffix). */
  private lazy val bcThresholdBytes: Long = {
    val s = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(s)
    catch { case _: NumberFormatException => s.toLong }
  }

  private def estBytes(rows: Long, p: LogicalPlan): Long =
    rows * math.max(1, p.output.map(_.dataType.defaultSize).sum)

  // equi-join extraction, cross-scale site matching (qualifier-stripped
  // key signatures + ordinal rank — ADVICE r14), and the cached,
  // null-safe frequency probe all live in JoinProbe: one copy shared
  // with BucketPairBudgetAuditSpec, the PlanProbe discipline.
  private def equiJoinsOf(plan: LogicalPlan) = JoinProbe.equiJoinsOf(plan)
  private def keySig(lk: Seq[Expression], rk: Seq[Expression]) =
    JoinProbe.keySig(lk, rk)
  private def maxKeyFreq(dir: String, side: LogicalPlan,
                         keys: Seq[Expression]): Long =
    JoinProbe.maxKeyFreq(spark, dir, side, keys)

  private def label(name: String, keys: Seq[Expression], side: String,
                    idx: Int): String =
    s"$name :: join#$idx $side keys(${keys.map(_.sql).mkString(", ")})"

  test("no shuffle equi-join side has a hot key whose rows track the " +
    "corpus (q43 salt criterion, swept)") {
    val offenders = collection.mutable.LinkedHashSet[String]()
    val hit = collection.mutable.Set[String]()
    // funnel coverage counters — a sweep that filtered everything at
    // step 1 would pass vacuously; these make the reach visible
    var joinsSeen, freqProbed, hiProbed, lateGrowers = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val smallJs =
        try equiJoinsOf(fn(spark, sfSmall).queryExecution.optimizedPlan)
        catch { case e: Throwable =>
          fail(s"$name failed to plan at sf0.001: ${e.getMessage}")
        }
      lazy val bigJs =
        equiJoinsOf(fn(spark, sfBig).queryExecution.optimizedPlan)
      lazy val benchJs =
        equiJoinsOf(fn(spark, sfBench).queryExecution.optimizedPlan)
      smallJs.zipWithIndex.foreach { case ((j, lk, rk), i) =>
        joinsSeen += 1
        val sig = keySig(lk, rk)
        val sigRank = smallJs.take(i)
          .count { case (_, l2, r2) => keySig(l2, r2) == sig }
        val sides = Seq(("left", j.left, lk), ("right", j.right, rk))
        val smallRows = sides.map { case (_, p, _) => rowsOf(sfSmall, p) }
        if (smallRows.forall(_ >= tinyRows)) {
          freqProbed += 1
          // the same site at the other rungs, matched by signature
          lazy val bigSite = JoinProbe.matchJoin(bigJs, sig, sigRank).getOrElse(
            fail(s"$name: no sf0.01 equi-join matches keys [$sig] " +
              s"occurrence $sigRank — audit cannot match sites"))
          lazy val benchSite = JoinProbe.matchJoin(benchJs, sig, sigRank).getOrElse(
            fail(s"$name: no sf0.1 equi-join matches keys [$sig] " +
              s"occurrence $sigRank — audit cannot match sites"))
          def sideAt(site: (Join, Seq[Expression], Seq[Expression]),
                     which: String) = which match {
            case "left" => (site._1.left, site._2)
            case _ => (site._1.right, site._3)
          }
          // classify growth per side across BOTH rung pairs; a side is
          // probed on the first pair where it actually grows
          case class SideProbe(name: String, loDir: String, hiDir: String,
                               lo: LogicalPlan, loKeys: Seq[Expression],
                               hi: LogicalPlan, hiKeys: Seq[Expression],
                               exponent: Int, flat: Boolean,
                               benchRows: Long)
          val probes = sides.zip(smallRows).map {
            case ((sideName, sp, sk), sr) =>
              val (bp, bk) = sideAt(bigSite, sideName)
              val br = rowsOf(sfBig, bp)
              if (br.toDouble / math.max(sr, 1L) >= sideGrowthFloor)
                SideProbe(sideName, sfSmall, sfBig, sp, sk, bp, bk,
                  exponent = 4, flat = false, benchRows = -1L)
              else {
                val (cp, ck) = sideAt(benchSite, sideName)
                val cr = rowsOf(sfBench, cp)
                val late = cr.toDouble / math.max(br, 1L) >= sideGrowthFloor
                if (late) lateGrowers += 1
                SideProbe(sideName, sfBig, sfBench, bp, bk, cp, ck,
                  exponent = 3, flat = !late, benchRows = cr)
              }
          }
          // exempt only if some side is flat on BOTH pairs AND its
          // estimated bytes fit under the broadcast threshold — then
          // size-based planning broadcasts it at every scale
          val exempt = probes.exists(p => p.flat &&
            estBytes(p.benchRows, p.hi) <= bcThresholdBytes)
          if (!exempt) {
            probes.filterNot(_.flat).foreach { p =>
              val freqLo = maxKeyFreq(p.loDir, p.lo, p.loKeys)
              if (freqLo >= candidateFreq) {
                hiProbed += 1
                val freqHi = maxKeyFreq(p.hiDir, p.hi, p.hiKeys)
                val g = freqHi.toDouble / math.max(freqLo, 1L)
                val projected = freqLo * math.pow(g, p.exponent)
                if (g >= flagGrowth && projected >= hotKeyRowCap) {
                  val key = label(name, p.loKeys, p.name, i)
                  if (adjudicated.contains(key)) hit += key
                  else offenders += f"$key maxKeyRows $freqLo→$freqHi " +
                    f"(×$g%.1f on ${p.loDir}→${p.hiDir}, " +
                    f"~${projected / 1e6}%.1fM rows in ONE key at " +
                    "target) — skewed shuffle join; salt it, " +
                    "pre-aggregate, or cap the group"
                }
              }
            }
          }
        }
      }
    }
    info(s"funnel: $joinsSeen equi-joins seen, $freqProbed with both " +
      s"sides ≥ $tinyRows rows, $lateGrowers late-growing sides " +
      s"(probed on sf0.01→sf0.1), $hiProbed candidate sides re-probed " +
      "at their hi rung")
    assert(joinsSeen > 100 && freqProbed > 10,
      "funnel reach collapsed — the sweep is passing vacuously; " +
        s"seen=$joinsSeen probed=$freqProbed")
    assert(lateGrowers >= 1,
      "no late-growing side classified — the flat-table blind-spot fix " +
        "(VERDICT r14 #3) has nothing to see; at least the q66 corpus " +
        "side (embeddings, flat until sf0.01→sf0.1) should register")
    assert(offenders.isEmpty,
      "shuffle-join sides with corpus-scaled hot keys (q43-salt, " +
        "pre-aggregate, cap, or adjudicate with a named bound):\n" +
        offenders.mkString("\n"))
    val stale = adjudicated.keySet -- hit
    assert(stale.isEmpty,
      s"adjudicated entries match no flagged join side (stale): $stale")
  }

  /** Positive control: the probe + flag arithmetic DOES catch a
    * corpus-scaled hot key. Builds the same join shape at two
    * synthetic "rungs" (a Zipf-head key holding 30% of an N-row fact
    * table, N = 2k then 20k) and asserts the funnel's criterion fires
    * on it — so the main sweep's clean pass certifies the queries,
    * not a probe that can't see skew.
    */
  test("frequency probe flags a planted corpus-scaled hot key " +
    "(positive control)") {
    import spark.implicits._
    def skewed(n: Int) = (0 until n)
      .map(i => (if (i % 10 < 3) 0L else i.toLong, i))
      .toDF("k", "v")
    def planOf(n: Int): (LogicalPlan, Seq[Expression], Seq[Expression]) = {
      val j = skewed(n).join(skewed(n).groupBy($"k")
        .agg(count(lit(1)).as("c")), "k")
      val js = equiJoinsOf(j.queryExecution.optimizedPlan)
      assert(js.nonEmpty, "control join lost its equi-keys")
      (js.head._1.left, js.head._2, js.head._3)
    }
    val (smallSide, smallKeys, _) = planOf(2000)
    val (bigSide, bigKeys, _) = planOf(20000)
    val sf0 = maxKeyFreq("ctrl-small", smallSide, smallKeys)
    val bf = maxKeyFreq("ctrl-big", bigSide, bigKeys)
    assert(sf0 >= candidateFreq, s"control hot key too cold: $sf0")
    val g = bf.toDouble / math.max(sf0, 1L)
    val projected = sf0 * math.pow(g, 4)
    info(f"control: maxKeyRows $sf0→$bf (×$g%.1f), projected " +
      f"${projected / 1e6}%.1fM at target")
    assert(g >= flagGrowth && projected >= hotKeyRowCap,
      f"criterion failed to flag the planted hot key " +
        f"($sf0→$bf, ×$g%.1f, ${projected / 1e6}%.1fM)")
  }

  /** Positive control for the flat-table blind spot (VERDICT r14 #3):
    * the legacy q34 join side — sign-LSH buckets at fixed planes=4
    * with both scale guards OFF — over the REAL parquet embeddings.
    * Under the old funnel it was exempted at step 2: embeddings are
    * flat (500→500) across sf0.001→sf0.01, the only pair the funnel
    * probed. The per-side rung classification must now (a) see the
    * pair-2 growth and classify the side corpus-scaled, and (b)
    * measure its bucket-key frequency growth ≥ flagGrowth on
    * sf0.01→sf0.1 — the growth signal the sweep was structurally
    * blind to. (The absolute candidateFreq/rowCap magnitudes don't
    * fire at these corpus sizes — 2000 vectors over 16 buckets — so
    * the constant-share CLASS is enforced by
    * BucketPairBudgetAuditSpec; this control pins the classification
    * machinery.)
    */
  test("legacy q34 bucket side is classified corpus-scaled via the " +
    "late rung pair (blind-spot positive control)") {
    def legacyJoinSide(dir: String)
    : (LogicalPlan, Seq[Expression]) = {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val j = ext.Similarity.lshNearNeighbors(emb, threshold = 0.3,
        planes = 4, targetBucketRows = 0, maxBucketRows = 0)
      val js = equiJoinsOf(j.queryExecution.optimizedPlan)
      assert(js.nonEmpty, "legacy q34 lost its bucket equi-join")
      (js.head._1.left, js.head._2)
    }
    val (s0, _) = legacyJoinSide(sfSmall)
    val (s1, k1) = legacyJoinSide(sfBig)
    val (s2, k2) = legacyJoinSide(sfBench)
    val r0 = rowsOf(sfSmall, s0)
    val r1 = rowsOf(sfBig, s1)
    val r2 = rowsOf(sfBench, s2)
    info(s"legacy q34 side rows: sf0.001=$r0 sf0.01=$r1 sf0.1=$r2")
    // (a) flat on pair 1 — the OLD funnel's only view — but growing on
    // pair 2: the side must classify as late-corpus-scaled, not flat
    assert(r1.toDouble / math.max(r0, 1L) < sideGrowthFloor,
      "fixture drift: embeddings no longer flat across pair 1; " +
        "this control needs a table the old funnel exempted")
    assert(r2.toDouble / math.max(r1, 1L) >= sideGrowthFloor,
      "fixture drift: embeddings no longer grow across pair 2")
    // (b) the bucket key's frequency growth on the LATE pair shows the
    // corpus-tracking hot key the old rungs could not see
    val f1 = maxKeyFreq(sfBig, s1, k1)
    val f2 = maxKeyFreq(sfBench, s2, k2)
    val g = f2.toDouble / math.max(f1, 1L)
    info(f"legacy q34 bucket maxKeyFreq: sf0.01=$f1 sf0.1=$f2 (×$g%.2f)")
    assert(g >= flagGrowth,
      f"late-pair frequency growth ×$g%.2f < $flagGrowth — the probe " +
        "still cannot see the q34 hot bucket")
  }
}
