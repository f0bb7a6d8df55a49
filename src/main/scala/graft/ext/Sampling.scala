package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Deterministic sampling operators for training-data pipelines.
  *
  * Both operators derive their randomness from a cryptographic hash of
  * (seed, row id) instead of an RNG: the sample is a pure function of
  * the data — reproducible across runs, clusters, partitionings, and
  * engines (the DuckDB oracle recomputes the identical hash), and
  * stable under re-partitioning, which `DataFrame.sample`'s
  * per-partition RNG streams are not. That determinism is what lets a
  * 100 TB pipeline re-derive exactly which rows made the training mix
  * months later.
  */
object Sampling {

  /** Uniform hash score in [0, 2^52): the first 13 hex digits of
    * md5(seed ":" id) as an integer. 52 bits so the value is exactly
    * representable as a Double (the TopKScored buffer currency) and
    * exactly reproducible in SQL
    * (`CAST(concat('0x', substr(md5(..), 1, 13)) AS BIGINT)`).
    */
  def hashScore(id: Column, seed: Long): Column =
    conv(substring(md5(concat(lit(seed.toString + ":"),
      id.cast("string"))), 1, 13), 16, 10).cast("long")

  /** Uniform-without-replacement sample of k rows per group: keep the k
    * smallest hash scores within each group. Ranked by the k-bounded
    * [[graft.functions.TopKScoredAggregator]] partial aggregate — map
    * tasks keep at most k candidates per group, so only k×|partitions|
    * rows per group cross the shuffle. The row_number-window
    * formulation would funnel the ENTIRE corpus into |groups| reducers
    * — the exact shape the kNN ranking had to abandon — and |groups|
    * (e.g. language × source) is typically tiny relative to corpus
    * size, making this the difference between a plan that survives
    * 100 TB and one that does not.
    *
    * Output: groupCols ++ (idCol, rankCol), rank 1..k by ascending
    * hash (id-ascending tie-break via the aggregator's ordering).
    */
  def groupSample(df: DataFrame, k: Int, groupCols: Seq[String],
                  idCol: String, seed: Long = 42L,
                  rankCol: String = "rank"): DataFrame =
    // aggregator ranks score DESCENDING; negate for smallest-hash-first
    Relational.topKPerGroupAgg(df, k, groupCols,
        -hashScore(col(idCol), seed).cast("double"), col(idCol),
        "_neg_hash", idCol, rankCol)
      .select((groupCols :+ idCol :+ rankCol).map(col): _*)

  /** WEIGHTED sample-without-replacement of k rows per group —
    * Efraimidis–Spirakis A-ES: each row draws u = hash/2^52 and is
    * ranked by u^(1/w), equivalently ln(u)/w (monotone for w > 0);
    * the top-k per group is a weighted uniform sample where a row's
    * inclusion probability is proportional to its weight. The
    * textbook distributed formulation: keys are computed map-side from
    * the deterministic hash, and the ranking is the same k-bounded
    * partial aggregate as [[groupSample]] — no corpus-into-|groups|
    * window funnel, and the sample is reproducible forever (pure
    * function of the data + seed).
    *
    * Output: groupCols ++ (idCol, rank, es_key 4 dp). Rows with
    * non-positive weight are excluded (they cannot be sampled).
    */
  def weightedGroupSample(df: DataFrame, k: Int, groupCols: Seq[String],
                          idCol: String, weight: Column,
                          seed: Long = 42L): DataFrame = {
    val u = hashScore(col(idCol), seed).cast("double") /
      lit(4503599627370496.0)
    val scored = df.filter(weight > 0)
      .withColumn("_es", log(u) / weight)
    Relational.topKPerGroupAgg(scored, k, groupCols,
        col("_es"), col(idCol), "es_key", idCol)
      .select(groupCols.map(col) :+ col(idCol) :+ col("rank") :+
        // + 0.0 normalizes IEEE signed zero (-0.0 + 0.0 = +0.0): a key
        // that rounds to zero is -0.0 in engines whose round preserves
        // the sign bit (DuckDB) but +0.0 through Spark's BigDecimal
        // round, and a bit-faithful comparator distinguishes them.
        (round(col("es_key") + lit(1e-9), 4) + lit(0.0)).as("es_key"): _*)
  }

  /** Weighted corpus mixture: per-source Bernoulli sampling at the
    * given rates (a training-mix staple — e.g. keep all of wikipedia,
    * 10% of common-crawl). A row survives iff its uniform hash
    * u = hashScore/2^52 < rate(source); sources absent from `rates`
    * get `defaultRate`. Map-side only — a codegen'd CASE over the
    * (small, literal) rate table and one hash per row; no shuffle, no
    * RNG state, and the kept set is independent of partitioning.
    */
  /** Deterministic train/val/test split: each row's uniform hash
    * u = hashScore/2^52 is cut against the cumulative split fractions
    * (e.g. train [0, .8), val [.8, .9), test [.9, 1)). Pure map-side
    * CASE — no shuffle, no RNG — and because u is a function of the row
    * id alone, the assignment is stable under repartitioning, engine
    * changes, and incremental reruns: a document joins the same split
    * forever, which is what keeps eval sets uncontaminated as the
    * corpus grows. Fractions must sum to 1 (±1e-9); the last split
    * absorbs the top of the unit interval.
    */
  def assignSplits(df: DataFrame, idCol: String,
                   splits: Seq[(String, Double)],
                   seed: Long = 42L,
                   splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "assignSplits needs at least one split")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    val u = hashScore(col(idCol), seed).cast("double") /
      lit(4503599627370496.0) // 2^52
    val cuts = splits.scanLeft(0.0)(_ + _._2).tail
    // build the CASE from the last (absorbing) split backwards
    val label = splits.init.zip(cuts.init).foldRight(
      lit(splits.last._1)) { case (((name, _), cut), acc) =>
      when(u < cut, lit(name)).otherwise(acc)
    }
    df.withColumn(splitCol, label)
  }

  def weightedMix(df: DataFrame, sourceCol: String,
                  rates: Map[String, Double], defaultRate: Double,
                  idCol: String, seed: Long = 42L): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (src, r)) =>
      when(col(sourceCol) === src, lit(r)).otherwise(acc)
    }
    df.filter(
      hashScore(col(idCol), seed).cast("double") / lit(4503599627370496.0)
        < rate)
  }

  /** Temperature-flattened corpus mixture (the UniMax/mT5 re-balancing
    * family, τ = 2): per-source sampling shares ∝ √n_s instead of n_s,
    * so dominant sources shrink and small sources survive, cut to a
    * total size `budget`:
    *
    *   share_s = isqrt(n_s) / Σ isqrt(n),  rate_s = min(1, budget·share_s/n_s)
    *
    * where n_s = Σ `weight` per source and isqrt = ⌊√·⌋. Unlike
    * [[weightedMix]] the rate table is DERIVED FROM THE DATA — one
    * tiny per-source aggregate, broadcast back, keep decided map-side
    * by the deterministic md5 hash.
    *
    * Engine-exactness: the flattening uses the INTEGER sqrt — n_s is an
    * exact integer, √ is IEEE correctly-rounded so ⌊√n_s⌋ is the same
    * integer in every engine, the share denominator is an exact integer
    * sum, and the rate expression is a fixed chain of correctly-rounded
    * ops on exact integers — bit-identical cross-engine, so the kept
    * set (hash < rate) is reproducible forever. A real-valued
    * temperature would go through pow/exp/ln, which are NOT correctly
    * rounded and could flip a boundary row between engines.
    *
    * Output: df's rows that survive, plus their source's `rate`.
    */
  def temperatureMix(df: DataFrame, sourceCol: String, idCol: String,
                     weight: Column, budget: Double, seed: Long = 42L)
  : DataFrame = {
    val perSrc = df.groupBy(col(sourceCol))
      .agg(sum(weight).cast("long").as("_n"))
      .withColumn("_s", floor(sqrt(col("_n"))).cast("long"))
    val tot = perSrc.agg(sum(col("_s")).as("_tot"))
    val rates = perSrc.join(broadcast(tot))
      .select(col(sourceCol),
        least(lit(1.0),
          lit(budget) * col("_s") / col("_tot") / col("_n")).as("rate"))
    df.join(broadcast(rates), Seq(sourceCol))
      .filter(
        hashScore(col(idCol), seed).cast("double") / lit(4503599627370496.0)
          < col("rate"))
  }

  /** Hash-deterministic negative sampling for implicit-feedback
    * training pairs: for each user in `positives`, up to `k` items the
    * user has NO interaction with, drawn uniformly from a dense item
    * domain [0, nItems). The training-data step between the
    * interaction frame (q129's input) and a ranking-loss model — every
    * positive needs contrastive negatives, and they must be
    * reproducible across runs/engines (no `rand()`).
    *
    * Candidate item for (user, slot) = [[hashScore]](user"#"slot) mod
    * nItems — generated by exploding `k·oversample` slots per distinct
    * user (map-side; the oversample absorbs candidates lost to
    * positive-collision or duplicate draws), deduped to the user's
    * first slot per item, anti-joined against the positives on the
    * (user, item) key, then cut to the k lowest slots per user. All
    * corpus-sized stages are key-partitioned joins/aggregates; the
    * per-user window ranks ≤ k·oversample candidate rows. A user dense
    * enough to exhaust the oversample yields fewer than k negatives
    * (documented, detectable via rank).
    */
  def negativeSamples(positives: DataFrame, userCol: String,
                      itemCol: String, nItems: Int, k: Int,
                      oversample: Int = 3, seed: Long = 42L): DataFrame = {
    val cands = positives.select(col(userCol)).distinct()
      .select(col(userCol),
        explode(sequence(lit(0), lit(k * oversample - 1))).as("_slot"))
      .withColumn("neg_item",
        hashScore(concat(col(userCol).cast("string"), lit("#"),
          col("_slot").cast("string")), seed) % nItems)
    val firstDraw = cands.groupBy(col(userCol), col("neg_item"))
      .agg(min(col("_slot")).as("_slot"))
    val survivors = firstDraw.join(
      positives.select(col(userCol), col(itemCol).as("neg_item")).distinct(),
      Seq(userCol, "neg_item"), "left_anti")
    Relational.topKPerGroup(survivors, k, Seq(userCol), Seq(col("_slot")))
      .select(col(userCol), col("neg_item"), col("rank"))
  }

  /** Poisson(1) draw from a uniform by inverse-CDF ladder — the
    * distributed (Poisson) bootstrap's resample weight: replicate b
    * weights row i by Poisson(1) seeded from hash(i, b), so B
    * bootstrap replicates come out of ONE corpus pass as B weighted
    * sums (no per-replicate shuffles, no resampled copies of the
    * corpus — the only formulation that survives 100 TB; Chamandy et
    * al., "Estimating Uncertainty for Massive Data Streams", Google
    * 2012). The cumulative thresholds are exact double LITERALS
    * (identical in any engine) and the uniform is a 52-bit
    * [[hashScore]] over 2⁵² (exactly representable), so the weight is
    * engine-exact. Tail truncated at 9 (P ≈ 1.1e-6 — one row in a
    * million gets weight 9 instead of a larger value; the bias is far
    * below bootstrap noise).
    */
  def poissonWeight(u: Column): Column =
    when(u < 0.36787944117144233, 0L)
      .when(u < 0.7357588823428847, 1L)
      .when(u < 0.9196986029286058, 2L)
      .when(u < 0.9810118431238463, 3L)
      .when(u < 0.9963401531726563, 4L)
      .when(u < 0.9994058151824183, 5L)
      .when(u < 0.999916758850712, 6L)
      .when(u < 0.9999897508033253, 7L)
      .when(u < 0.999998874797402, 8L)
      .otherwise(9L)
}
