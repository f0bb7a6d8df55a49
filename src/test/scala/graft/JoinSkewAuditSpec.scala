package graft

import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.Count
import org.apache.spark.sql.catalyst.planning.ExtractEquiJoinKeys
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

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
  * Funnel (the family's two-rung shape, applied per join SIDE):
  *   1. plan every `SparkEntry.queries` entry at sf0.001; collect the
  *      equi-joins (`ExtractEquiJoinKeys`) from the optimized plan;
  *   2. SKIP joins where some side is corpus-independent AND small —
  *      rows < 6 at sf0.001, or (side-rows growth < 3× across the 10×
  *      rung AND ≤ 100k rows at sf0.01): size-based planning
  *      broadcasts that side at every scale, so no shuffle
  *      materializes. Growth-stability ALONE is not enough — a flat
  *      but 100k+-row side exceeds the ~10MB broadcast threshold and
  *      still shuffles, so its corpus-scaled partner stays in the
  *      sweep. Explicit-hint growth is BroadcastScaleAuditSpec's
  *      jurisdiction;
  *   3. for genuine both-sides-corpus-scaled joins, probe each side's
  *      MAX key frequency on its join keys at sf0.001 — candidates are
  *      maxFreq ≥ 150;
  *   4. re-probe candidates at sf0.01 and flag sides whose max
  *      frequency grew ≥ `flagGrowth` AND whose PROJECTED hot-key rows
  *      at the harness target (growth⁴ off sf0.001 — 100× the sf0.1
  *      bench corpus) exceed `hotKeyRowCap`: a single reducer task
  *      sorting that many rows of one key is the straggler, before any
  *      cross-side match multiplies it.
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
  * are the rows that shuffle); (b) frequency growth is measured on one
  * 10× rung, so a key distribution that only turns Zipfian beyond
  * sf0.01 is invisible — the cap is set low enough (5M rows/key at
  * target) that any linear-in-corpus key flags well before that.
  */
class JoinSkewAuditSpec extends SparkTestBase {

  private val sfSmall = "/root/testdata/sf0.001"
  private val sfBig = "/root/testdata/sf0.01"

  private val tinyRows = 6L // below: broadcastable at any scale
  private val sideGrowthFloor = 3.0 // side-rows growth < this → dim side
  private val flatBroadcastRows = 100000L // flat side ≤ this → broadcastable
  private val candidateFreq = 150L // max key rows at sf0.001 worth re-probing
  private val flagGrowth = 3.0 // key-frequency growth ≥ this → corpus-scaled
  private val hotKeyRowCap = 5e6 // projected rows of ONE key at target

  /** Flagged join sides whose hot-key growth is in fact bounded by
    * something the two-rung probe cannot see. Rationale must name the
    * bound.
    */
  private val adjudicated: Map[String, String] = Map.empty

  private def rowsOf(dir: String, p: LogicalPlan): Long =
    PlanProbe.rows(spark, dir, p)

  // (dir, side plan, keys) → max rows of any single join-key value
  private val freqCache = collection.mutable.HashMap[
    (String, LogicalPlan, Seq[Expression]), Long]()
  private def maxKeyFreq(dir: String, side: LogicalPlan,
                         keys: Seq[Expression]): Long =
    freqCache.getOrElseUpdate(
      (dir, side.canonicalized, keys.map(_.canonicalized)), {
        val probe = Aggregate(keys,
          keys.zipWithIndex.map { case (e, i) => Alias(e, s"_k$i")() }
            :+ Alias(Count(Literal(1)).toAggregateExpression(), "_c")(),
          side)
        Bridge.ofRows(spark, probe)
          .agg(max(col("_c"))).head().getLong(0)
      })

  /** Equi-joins with extracted keys: (join, leftKeys, rightKeys). */
  private def equiJoinsOf(plan: LogicalPlan)
  : Seq[(Join, Seq[Expression], Seq[Expression])] =
    plan.collect { case j: Join =>
      ExtractEquiJoinKeys.unapply(j).map { t =>
        (j, t._2, t._3)
      }
    }.flatten

  private def label(name: String, keys: Seq[Expression], side: String,
                    idx: Int): String =
    s"$name :: join#$idx $side keys(${keys.map(_.sql).mkString(", ")})"

  test("no shuffle equi-join side has a hot key whose rows track the " +
    "corpus (q43 salt criterion, swept)") {
    val offenders = collection.mutable.LinkedHashSet[String]()
    val hit = collection.mutable.Set[String]()
    // funnel coverage counters — a sweep that filtered everything at
    // step 1 would pass vacuously; these make the reach visible
    var joinsSeen, freqProbed, bigProbed = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val smallJs =
        try equiJoinsOf(fn(spark, sfSmall).queryExecution.optimizedPlan)
        catch { case e: Throwable =>
          fail(s"$name failed to plan at sf0.001: ${e.getMessage}")
        }
      lazy val bigJs =
        equiJoinsOf(fn(spark, sfBig).queryExecution.optimizedPlan)
      smallJs.zipWithIndex.foreach { case ((j, lk, rk), i) =>
        joinsSeen += 1
        // step 2: a corpus-independent side means no shuffle at scale
        val sides = Seq(("left", j.left, lk), ("right", j.right, rk))
        val smallRows = sides.map { case (_, p, _) => rowsOf(sfSmall, p) }
        if (smallRows.forall(_ >= tinyRows)) {
          // candidate frequency probe before paying the big rung
          freqProbed += 1
          val smallFreqs = sides.map { case (_, p, k) =>
            maxKeyFreq(sfSmall, p, k)
          }
          if (smallFreqs.exists(_ >= candidateFreq)) {
            bigProbed += 1
            assert(bigJs.length == smallJs.length,
              s"$name: equi-join count differs across scales " +
                s"(${smallJs.length} vs ${bigJs.length}) — audit " +
                "cannot match sites")
            val (bj, blk, brk) = bigJs(i)
            val bigSides = Seq(("left", bj.left, blk),
              ("right", bj.right, brk))
            // exempt only if some side is flat AND absolutely small —
            // growth-stability alone doesn't fit a 100k+-row side
            // under the broadcast threshold, and the partner side's
            // hot key would otherwise escape the sweep
            val exemptSide = sides.zip(bigSides).exists {
              case ((_, sp, _), (_, bp, _)) =>
                val br = rowsOf(sfBig, bp)
                br.toDouble / math.max(rowsOf(sfSmall, sp), 1L) <
                  sideGrowthFloor && br <= flatBroadcastRows
            }
            if (!exemptSide) {
              sides.zip(bigSides).zip(smallFreqs).foreach {
                case (((sideName, _, sk), (_, bp, bk)), sf0) =>
                  if (sf0 >= candidateFreq) {
                    val bf = maxKeyFreq(sfBig, bp, bk)
                    val g = bf.toDouble / math.max(sf0, 1L)
                    val projected = sf0 * math.pow(g, 4)
                    if (g >= flagGrowth && projected >= hotKeyRowCap) {
                      val key = label(name, sk, sideName, i)
                      if (adjudicated.contains(key)) hit += key
                      else offenders += f"$key maxKeyRows $sf0→$bf " +
                        f"(×$g%.1f at 10×, ~${projected / 1e6}%.1fM " +
                        "rows in ONE key at target) — skewed shuffle " +
                        "join; salt it, pre-aggregate, or cap the group"
                    }
                  }
              }
            }
          }
        }
      }
    }
    info(s"funnel: $joinsSeen equi-joins seen, $freqProbed with both " +
      s"sides ≥ $tinyRows rows (frequency-probed), $bigProbed " +
      s"candidate joins re-probed at sf0.01")
    assert(joinsSeen > 100 && freqProbed > 10,
      "funnel reach collapsed — the sweep is passing vacuously; " +
        s"seen=$joinsSeen probed=$freqProbed")
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
}
