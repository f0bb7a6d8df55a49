package graft

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, AggregateFunction, Collect}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.functions._

/** The "aggregation-buffer state" criterion — eighth member of the
  * scale audit family (VERDICT r15 #5). The seven existing audits
  * cover joins, cartesians, driver collects, windows, money sums,
  * broadcasts, and pair budgets; the remaining unaudited
  * executor-memory class is PER-GROUP AGGREGATION BUFFER SIZE. Two
  * sub-classes:
  *
  *  - **Typed Aggregators.** TopKScored / TopK (k-bounded vectors),
  *    MisraGries (capacity-bounded counter map), Gram (d² array),
  *    CountMin (eps/confidence-sized sketch) all CLAIM
  *    corpus-independent buffers. The claim is probed DIRECTLY: drive
  *    each aggregator's own zero/reduce/merge over a chunked input at
  *    n and 10n (simulating partial buffers merged across partitions)
  *    and flag buffer cardinality/bytes growth. A census over every
  *    query plan forces any NEW Scala aggregator through this registry
  *    before it can ship (DriverCollectCensusSpec's discipline).
  *
  *  - **Map-state builtins.** Exact `percentile`/`median`/`mode` hold
  *    a per-group value→count map ∝ DISTINCT VALUES — for continuous
  *    columns that is the group itself, so a percentile over a
  *    corpus-scaled group is the same unbounded-buffer class as a
  *    collect_list (CollectScaleAuditSpec), invisible to it because
  *    the function is not Collect-family. Sites are swept with the
  *    family funnel (rung pair chosen per site, growth-flagged) and
  *    adjudicated BY CLASS: exact-percentile semantics are the oracle
  *    contract, with the sketch-bounded scale path shipped side by
  *    side (approx_percentile, tolerance-gated in q45/q48/q51).
  *
  * Census layer: every aggregate-function class appearing in any
  * query's optimized plan must be classified — constant-state builtin,
  * Collect family (CollectScaleAuditSpec's jurisdiction), map-state
  * builtin (swept here), or a registry-probed typed Aggregator. An
  * unknown class fails the audit until reviewed.
  */
class AggStateAuditSpec extends SparkTestBase {

  private val sfSmall = "/root/testdata/sf0.001"
  private val sfBig = "/root/testdata/sf0.01"
  private val sfBench = "/root/testdata/sf0.1"

  private val pairGrowthFloor = 3.0 // rung-pair pick: group grows here
  private val flagRows = 1500L // flag: hi-rung max group at least this
  private val flagGrowth = 4.0 // flag: group growth at least this
  private val bufferFlagGrowth = 2.0 // typed-aggregator buffer growth

  /** Constant-or-sketch-bounded partial state: safe at any group size. */
  private val boundedBuiltins: Set[String] = Set(
    "Count", "Sum", "Average", "Min", "Max", "First", "Last",
    "CountIf", "AnyValue", "BoolAnd", "BoolOr",
    "BitAndAgg", "BitOrAgg", "BitXorAgg",
    "StddevSamp", "StddevPop", "VarianceSamp", "VariancePop",
    "Corr", "CovSample", "CovPopulation", "Skewness", "Kurtosis",
    "MaxBy", "MinBy", "HyperLogLogPlusPlus", "ApproximatePercentile",
    "CountMinSketchAgg", "BloomFilterAggregate", "CollectTopK",
    "HllSketchAgg", "HllUnionAgg", // Datasketches HLL: lgConfigK-sized
    "PivotFirst", "RegrCount", "RegrAvgX", "RegrAvgY", "RegrSlope",
    "RegrIntercept", "RegrR2", "RegrSXX", "RegrSXY", "RegrSYY")

  /** Per-group value→count map state — the class swept by this audit. */
  private val mapStateBuiltins: Set[String] =
    Set("Percentile", "Median", "Mode", "ListAgg", "HistogramNumeric")

  /** Map-state classes whose corpus-scaled groups are adjudicated.
    * Rationale must name the semantics that force the state AND the
    * shipped bounded alternative.
    */
  private val adjudicatedClasses: Map[String, String] = Map(
    "Percentile" ->
      ("exact-percentile/median semantics are the ORACLE CONTRACT (the " +
        "driver's DuckDB compare needs bit-stable exact quantiles; " +
        "q45/q58/q62/q87 and the summary/EDA surface are exact by " +
        "design — VERDICT r13–r15 adjudicate the class: the value→" +
        "count map IS the data). The buffer is the per-group OpenHashMap " +
        "of distinct values, ∝ distinct values, NOT ∝ rows — bounded " +
        "wherever the domain is (counts, 2-dp money grids), corpus-" +
        "tracking only on continuous columns. The sketch-bounded scale " +
        "path ships side by side and is tolerance-gated against the " +
        "exact value: approx_percentile in q45/q48/q51/q58."))

  /** Typed aggregators audited by the direct buffer probes below. A
    * ScalaAggregator in any plan whose wrapped class is NOT here fails
    * the census — new aggregators must register a probe to ship.
    */
  private def aggregatorProbes: Map[String, Int => (Long, String)] = {
    def grown[I, B](zero: => B, reduce: (B, I) => B, merge: (B, B) => B,
                    inputs: Seq[I], chunks: Int): B =
      inputs.grouped(math.max(1, (inputs.size + chunks - 1) / chunks))
        .toSeq.map(_.foldLeft(zero)(reduce)).reduceLeft(merge)
    Map(
      "TopKScoredAggregator" -> { n =>
        val agg = functions.TopKScoredAggregator(16)
        val rnd = new scala.util.Random(7 + n)
        val buf = grown[functions.Scored, Seq[functions.Scored]](
          agg.zero, agg.reduce, agg.merge,
          (0 until n).map(i => functions.Scored(rnd.nextDouble(), i.toLong)),
          8)
        (buf.size.toLong, "k = 16")
      },
      "TopKAggregator" -> { n =>
        val agg = functions.TopKAggregator(16)
        val rnd = new scala.util.Random(7 + n)
        val buf = grown[Double, Seq[Double]](agg.zero, agg.reduce,
          agg.merge, Seq.fill(n)(rnd.nextDouble()), 8)
        (buf.size.toLong, "k = 16")
      },
      "MisraGriesAggregator" -> { n =>
        val agg = functions.MisraGriesAggregator(32)
        val rnd = new scala.util.Random(7 + n)
        val buf = grown[String, Map[String, Long]](agg.zero, agg.reduce,
          agg.merge, Seq.fill(n)(s"w${rnd.nextInt(1000)}"), 8)
        (buf.size.toLong, "capacity = 32")
      },
      "GramAggregator" -> { n =>
        val agg = functions.GramAggregator(8)
        val rnd = new scala.util.Random(7 + n)
        val buf = grown[Seq[Double], Array[Double]](agg.zero, agg.reduce,
          agg.merge, Seq.fill(n)(Seq.fill(8)(rnd.nextDouble())), 8)
        (buf.length.toLong, "dim² = 64")
      },
      "CountMinAggregator" -> { n =>
        val agg = functions.CountMinAggregator(0.01, 0.99, 42)
        val rnd = new scala.util.Random(7 + n)
        val buf = grown[java.lang.Long,
          org.apache.spark.util.sketch.CountMinSketch](agg.zero,
          agg.reduce, agg.merge,
          Seq.fill(n)(java.lang.Long.valueOf(rnd.nextInt(100000).toLong)),
          8)
        (agg.finish(buf).length.toLong, "eps/confidence-sized sketch")
      })
  }

  private def aggFnsOf(a: Aggregate): Seq[AggregateFunction] =
    a.aggregateExpressions.flatMap(_.collect {
      case ae: AggregateExpression => ae.aggregateFunction
    })

  /** Wrapped Aggregator class name for a ScalaAggregator node. */
  private def wrappedAggregator(f: AggregateFunction): Option[String] =
    if (f.getClass.getSimpleName.startsWith("ScalaAggregator"))
      Some(f.productIterator.collectFirst {
        case a: org.apache.spark.sql.expressions.Aggregator[_, _, _] =>
          a.getClass.getSimpleName
      }.getOrElse("<opaque ScalaAggregator>"))
    else None

  private def maxGroupRows(dir: String, a: Aggregate): Long =
    JoinProbe.maxKeyFreq(spark, dir, a.child, a.groupingExpressions)

  private def mapStateAggsOf(plan: LogicalPlan): Seq[Aggregate] =
    plan.collect {
      case a: Aggregate if aggFnsOf(a)
        .exists(f => mapStateBuiltins(f.getClass.getSimpleName)) => a
    }

  /** Cross-scale site identity by SIGNATURE + ordinal rank, never by
    * traversal position (the JoinProbe rule — ADVICE r14: optimizer
    * order can differ per scale, and positional pairing would compare
    * growth of DIFFERENT sites): qualifier-stripped grouping SQL plus
    * the sorted aggregate-function class list.
    */
  private def aggSig(a: Aggregate): String = {
    def bare(e: org.apache.spark.sql.catalyst.expressions.Expression) =
      e.transform {
        case ar: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
          ar.withQualifier(Seq.empty)
      }.sql
    a.groupingExpressions.map(bare).mkString(",") + " | " +
      aggFnsOf(a).map(_.getClass.getSimpleName).sorted.mkString(",")
  }

  private def matchAgg(as: Seq[Aggregate], sig: String,
                       rank: Int): Option[Aggregate] = {
    val same = as.filter(aggSig(_) == sig)
    if (same.length > rank) Some(same(rank)) else None
  }

  /** The shared flag criterion (factored so the planted controls run
    * the exact production path): pick the site's rung pair where its
    * max group grows ≥ pairGrowthFloor, then flag when the hi-rung
    * group is ≥ flagRows and grew ≥ flagGrowth.
    */
  private def probeSite(small: Aggregate, big: Aggregate,
                        bench: => Aggregate): Option[(Long, Long, Double)] = {
    val mSmall = maxGroupRows(sfSmall, small)
    val mBig = maxGroupRows(sfBig, big)
    val g1 = mBig.toDouble / math.max(mSmall, 1L)
    val pick =
      if (g1 >= pairGrowthFloor) Some((mSmall, mBig, g1))
      else {
        val mBench = maxGroupRows(sfBench, bench)
        val g2 = mBench.toDouble / math.max(mBig, 1L)
        if (g2 >= pairGrowthFloor) Some((mBig, mBench, g2)) else None
      }
    pick.filter { case (_, hi, g) => hi >= flagRows && g >= flagGrowth }
  }

  test("every aggregate-function class in every query plan is " +
    "census-classified, and map-state builtins over corpus-scaled " +
    "groups are adjudicated (swept)") {
    val offenders = collection.mutable.LinkedHashSet[String]()
    val hitClasses = collection.mutable.Set[String]()
    var aggsSeen, mapSites, sitesProbed, sitesFlagged = 0
    val probeRegistry = aggregatorProbes.keySet
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan =
        try fn(spark, sfSmall).queryExecution.optimizedPlan
        catch { case e: Throwable =>
          fail(s"$name failed to plan at sf0.001: ${e.getMessage}")
        }
      val aggs = plan.collect { case a: Aggregate => a }
      // census: classify every aggregate function
      aggs.foreach { a =>
        aggFnsOf(a).foreach { f =>
          aggsSeen += 1
          val cls = f.getClass.getSimpleName
          wrappedAggregator(f) match {
            case Some(w) =>
              if (!probeRegistry(w))
                offenders += s"$name :: UNREVIEWED typed aggregator $w " +
                  "— register a buffer probe in aggregatorProbes"
            case None =>
              val known = boundedBuiltins(cls) ||
                mapStateBuiltins(cls) || f.isInstanceOf[Collect[_]]
              if (!known)
                offenders += s"$name :: UNREVIEWED aggregate class $cls " +
                  "— classify as bounded, map-state, or Collect-family"
          }
        }
      }
      // map-state sweep: probe each site's group growth on its own pair
      val smallMs = mapStateAggsOf(plan)
      if (smallMs.nonEmpty) {
        mapSites += smallMs.length
        lazy val bigMs = mapStateAggsOf(
          fn(spark, sfBig).queryExecution.optimizedPlan)
        lazy val benchMs = mapStateAggsOf(
          fn(spark, sfBench).queryExecution.optimizedPlan)
        smallMs.zipWithIndex.foreach { case (a, i) =>
          val sig = aggSig(a)
          val rank = smallMs.take(i).count(aggSig(_) == sig)
          val big = matchAgg(bigMs, sig, rank).getOrElse(
            fail(s"$name: no sf0.01 map-state aggregate matches [$sig] " +
              s"occurrence $rank — audit cannot match sites"))
          sitesProbed += 1
          probeSite(a, big, matchAgg(benchMs, sig, rank).getOrElse(
            fail(s"$name: no sf0.1 map-state aggregate matches [$sig] " +
              s"occurrence $rank — audit cannot match sites"))
          ).foreach { case (lo, hi, g) =>
            sitesFlagged += 1
            val classes = aggFnsOf(a).map(_.getClass.getSimpleName)
              .filter(mapStateBuiltins).distinct
            val unadjudicated = classes.filterNot(adjudicatedClasses.contains)
            if (unadjudicated.isEmpty) hitClasses ++= classes
            else offenders += f"$name :: agg#$i maxGroupRows $lo→$hi " +
              f"(×$g%.1f) with unadjudicated map-state " +
              s"${unadjudicated.mkString(",")} — per-group value map " +
              "tracks the corpus; use approx_percentile or adjudicate " +
              "the class"
          }
        }
      }
    }
    info(s"funnel: $aggsSeen aggregate functions census-classified, " +
      s"$mapSites map-state sites, $sitesProbed probed, " +
      s"$sitesFlagged flagged into class adjudications")
    assert(aggsSeen > 300 && sitesProbed > 20,
      "funnel reach collapsed — the sweep is passing vacuously; " +
        s"seen=$aggsSeen probed=$sitesProbed")
    assert(offenders.isEmpty,
      "aggregation-state findings:\n" + offenders.mkString("\n"))
    val stale = adjudicatedClasses.keySet -- hitClasses
    assert(stale.isEmpty,
      s"adjudicated classes match no flagged site (stale): $stale")
  }

  test("typed aggregators keep corpus-independent buffers at 10× input " +
    "(direct zero/reduce/merge probe)") {
    val offenders = aggregatorProbes.toSeq.sortBy(_._1).flatMap {
      case (name, probe) =>
        val (lo, boundLo) = probe(3000)
        val (hi, bound) = probe(30000)
        assert(lo > 0, s"$name probe produced an empty buffer")
        assert(boundLo == bound)
        info(f"$name: buffer $lo → $hi at 10× input ($bound)")
        if (hi.toDouble / lo >= bufferFlagGrowth)
          Some(f"$name buffer grew $lo→$hi at 10× input (bound: $bound)")
        else None
    }
    assert(offenders.isEmpty,
      "typed aggregators whose buffer tracks the input:\n" +
        offenders.mkString("\n"))
  }

  test("an unbounded collect-all aggregator flags through the same " +
    "buffer probe (positive control)") {
    def collectAll(n: Int): Long = {
      val inputs = (0L until n.toLong).toVector
      inputs.grouped(math.max(1, n / 8)).toSeq
        .map(_.foldLeft(Vector.empty[Long])(_ :+ _))
        .reduceLeft(_ ++ _).size.toLong
    }
    val (lo, hi) = (collectAll(3000), collectAll(30000))
    assert(hi.toDouble / lo >= bufferFlagGrowth,
      f"criterion failed to flag an unbounded buffer ($lo→$hi)")
  }

  test("a global exact percentile over a corpus-scaled input flags, " +
    "a keyed one over constant groups does not (sweep controls)") {
    def sites(dir: String, keyed: Boolean): Seq[Aggregate] = {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val df =
        if (keyed) li.groupBy(col("l_orderkey"))
          .agg(percentile(col("l_extendedprice"), lit(0.5)).as("p50"))
        else li.agg(percentile(col("l_extendedprice"), lit(0.5)).as("p50"))
      mapStateAggsOf(df.queryExecution.optimizedPlan)
    }
    // positive: the global percentile's one group IS the corpus
    val flagged = probeSite(sites(sfSmall, keyed = false).head,
      sites(sfBig, keyed = false).head,
      sites(sfBench, keyed = false).head)
    assert(flagged.isDefined,
      "criterion failed to flag a global exact percentile over lineitem")
    // negative: constant-fanout groups (rows per order) stay flat
    val keyedFlag = probeSite(sites(sfSmall, keyed = true).head,
      sites(sfBig, keyed = true).head,
      sites(sfBench, keyed = true).head)
    assert(keyedFlag.isEmpty,
      s"criterion misfires on constant-size percentile groups: $keyedFlag")
  }
}
