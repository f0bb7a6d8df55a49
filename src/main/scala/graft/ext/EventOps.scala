package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch event-stream analytics (the streaming variants live in
  * [[graft.streaming.EventStreams]]).
  */
object EventOps {

  /** Ordered funnel conversion: how many users performed step 1, then
    * step 2 STRICTLY AFTER their first step 1, then step 3 strictly
    * after that, … — the product-analytics query behind every
    * conversion dashboard. First-touch semantics: each step anchors at
    * the user's EARLIEST qualifying occurrence (the standard funnel
    * definition, and a deterministic one).
    *
    * Shape: one aggregate per step over the type-filtered events —
    * every shuffle is keyed on the high-cardinality user id, the
    * surviving-user frame shrinks monotonically step over step, and the
    * step counts are single-row aggregates. No windows, no sorts; with
    * `steps.length` small (funnels are 3–6 steps) the whole thing is a
    * short chain of hash joins a 100 TB events table handles the same
    * way it handles any per-user aggregate.
    *
    * Output: (step_idx 1-based, step, n_users), one row per step.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var survivors = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("_t"))
    def stepCount(idx: Int, name: String, frame: DataFrame): DataFrame =
      frame.agg(count(lit(1)).as("n_users"))
        .select(lit(idx.toLong).as("step_idx"), lit(name).as("step"),
          col("n_users"))
    var out = stepCount(1, steps.head, survivors)
    steps.zipWithIndex.drop(1).foreach { case (st, i) =>
      survivors = events.filter(col(typeCol) === st)
        .join(survivors, Seq(userCol))
        .filter(col(tsCol) > col("_t"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("_t"))
      out = out.unionByName(stepCount(i + 1, st, survivors))
    }
    out
  }

  /** Deadline-constrained conversion funnel — [[funnel]] with a per-step
    * completion window: step i counts a user only if an event of that
    * type lands in (tᵢ₋₁, tᵢ₋₁ + maxDelayᵢ] where tᵢ₋₁ is the user's
    * (earliest-completion) time of the previous step. "Clicked within an
    * hour of viewing, purchased within a day of clicking" — the funnel
    * marketing actually measures; the unbounded variant overcounts
    * conversions that took a month.
    *
    * Same scale shape as [[funnel]]: one user-keyed min-aggregate per
    * step, each step's survivor frame joined (user-keyed) onto the next
    * step's candidate events — never a window or a global sort. The
    * earliest-qualifying-completion anchor is deterministic, so a SQL
    * oracle reproduces the survivor chain exactly.
    *
    * @param steps (eventType, maxDelayMicros) per step; the first
    *              step's delay is ignored (it anchors at the user's
    *              earliest occurrence).
    */
  def funnelTimed(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, steps: Seq[(String, Long)]): DataFrame = {
    require(steps.nonEmpty, "funnelTimed needs at least one step")
    val ev = events.select(col(userCol), col(typeCol),
      unix_micros(col(tsCol)).as("_us"))
    var survivors = ev.filter(col(typeCol) === steps.head._1)
      .groupBy(col(userCol)).agg(min(col("_us")).as("_t"))
    def stepCount(idx: Int, name: String, frame: DataFrame): DataFrame =
      frame.agg(count(lit(1)).as("n_users"))
        .select(lit(idx.toLong).as("step_idx"), lit(name).as("step"),
          col("n_users"))
    var out = stepCount(1, steps.head._1, survivors)
    steps.zipWithIndex.drop(1).foreach { case ((st, delay), i) =>
      survivors = ev.filter(col(typeCol) === st)
        .join(survivors, Seq(userCol))
        .filter(col("_us") > col("_t") &&
          col("_us") <= col("_t") + lit(delay))
        .groupBy(col(userCol)).agg(min(col("_us")).as("_t"))
      out = out.unionByName(stepCount(i + 1, st, survivors))
    }
    out
  }

  /** Per-user rolling aggregate over a TIME range (not a row count):
    * avg of `valueCol` over the trailing `windowMicros` of event time —
    * the feature-engineering window ("activity in the last hour") where
    * row-count frames are wrong because event density varies.
    *
    * The window partitions on the HIGH-cardinality user id (safe shape)
    * and orders by epoch micros so the range frame is numeric — Spark's
    * rangeBetween needs a numeric ordering key, and integer micros
    * compare exactly across engines where interval arithmetic might
    * not.
    */
  def rollingUserAvg(events: DataFrame, userCol: String, tsCol: String,
                     valueCol: String, windowMicros: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("_us"))
      .rangeBetween(-windowMicros, 0)
    events
      .withColumn("_us", unix_micros(col(tsCol)))
      .withColumn("roll_avg",
        round(avg(col(valueCol)).over(w) + lit(1e-9), 4))
      .drop("_us")
  }

  /** Regular-grid resampling with forward fill: one row per (user,
    * hourly slot) carrying the last observed value at or before the
    * slot — the gap-filling step that turns irregular event streams
    * into the fixed-interval series feature pipelines and joins
    * expect. NULL until a user's first observation (no back-fill).
    *
    * Shape: the slot grid is generated IN the plan (`sequence` +
    * explode over the distinct-user frame — |users|×slots rows, no
    * driver loop); events and slots are unioned and forward-filled by
    * ONE window partitioned on the high-cardinality user id with a
    * rows-frame `last(ignoreNulls)`. An event landing exactly on a
    * slot boundary fills that slot (events order before slots at equal
    * timestamps).
    */
  def resampleHourlyFfill(events: DataFrame, userCol: String,
                          tsCol: String, valueCol: String,
                          startTs: String, slots: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val start = unix_micros(to_timestamp(lit(startTs)))
    val grid = events.select(col(userCol)).distinct()
      .select(col(userCol),
        explode(sequence(lit(0), lit(slots - 1))).as("slot"))
      .select(col(userCol), col("slot"),
        (start + col("slot").cast("long") * lit(3600L * 1000000L))
          .as("_us"),
        lit(null).cast("double").as("_v"), lit(1).as("_pri"))
    val obs = events.select(col(userCol), lit(null).cast("int").as("slot"),
      unix_micros(col(tsCol)).as("_us"), col(valueCol).cast("double").as("_v"),
      lit(0).as("_pri"))
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("_us"), col("_pri"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.unionByName(obs)
      .withColumn("value_ffill",
        round(last(col("_v"), ignoreNulls = true).over(w) + lit(1e-9), 4))
      .filter(col("slot").isNotNull)
      .select(col(userCol), col("slot").cast("long").as("slot"),
        col("value_ffill"))
  }

  /** First-order Markov transition matrix over per-user event
    * sequences: P(next event type | previous event type), the
    * behavioral model behind next-action prediction and funnel
    * drop-off analysis.
    *
    * Shape: ONE window partitioned on the high-cardinality user id
    * pairs each event with its predecessor (`lag`, ordered by ts with
    * the unique event id as tie-break so the sequence is
    * deterministic), then a map-side-combined aggregate shrinks the
    * corpus to the |types|² transition-count frame. The probability
    * normalization runs a second window over THAT tiny frame —
    * unpartitioned cost never touches full-size data. Probabilities
    * are exact integer ratios (n / row-count), so the 4-dp round is
    * engine-stable.
    *
    * Output: (prev_type, next_type, n, p), p = n / Σ n over prev_type.
    */
  def markovTransitions(events: DataFrame, userCol: String,
                        typeCol: String, tsCol: String, idCol: String)
  : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val trans = events
      .withColumn("_prev", lag(col(typeCol), 1).over(w))
      .filter(col("_prev").isNotNull)
      .groupBy(col("_prev").as("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
    val tot = Window.partitionBy(col("prev_type"))
    trans.withColumn("p",
      round(col("n") / sum(col("n")).over(tot) + lit(1e-9), 4))
  }

  /** Transition SURPRISE scoring: PMI of each consecutive event-type
    * bigram against independence of its marginals —
    * `pmi = ln(n·N / (n_prev·n_next))` over the bigram frame. Where
    * [[markovTransitions]] reports how often a→b happens, this reports
    * whether a→b happens MORE than the traffic mix predicts: the
    * sequence-anomaly signal (a rare-but-reliable `error→refund` chain
    * scores high while `view→view` scores ≈ 0 however common it is).
    *
    * The corpus-sized work is the one user-keyed lag window and the
    * bigram count (map-side combined); marginals derive from the
    * ≤ |types|² bigram frame, and the PMI is an exact-integer-ratio
    * ln both engines round at 4 dp.
    *
    * Output: (prev_type, next_type, n, pmi).
    */
  def transitionSurprise(events: DataFrame, userCol: String,
                         typeCol: String, tsCol: String, idCol: String)
  : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val bigrams = events
      .withColumn("_prev", lag(col(typeCol), 1).over(w))
      .filter(col("_prev").isNotNull)
      .groupBy(col("_prev").as("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
    val margPrev = bigrams.groupBy(col("prev_type"))
      .agg(sum(col("n")).as("_np"))
    val margNext = bigrams.groupBy(col("next_type"))
      .agg(sum(col("n")).as("_nn"))
    val total = bigrams.agg(sum(col("n")).as("_nt"))
    bigrams
      .join(broadcast(margPrev), Seq("prev_type"))
      .join(broadcast(margNext), Seq("next_type"))
      .join(broadcast(total))
      .select(col("prev_type"), col("next_type"), col("n"),
        (round(log((col("n").cast("double") * col("_nt")) /
          (col("_np").cast("double") * col("_nn"))) + lit(1e-9), 4)
          + lit(0.0)).as("pmi"))
  }

  /** Per-user sequence SURPRISE under the corpus transition model:
    * train first-order transition probabilities p(b|a) = n_ab/n_a on
    * the whole stream ([[markovTransitions]]' frame), then score every
    * user by the mean negative log-probability of their own
    * transitions — sequence perplexity per user, the behavioral-
    * anomaly ranking (bots and scripted flows walk high-probability
    * edges → low surprise; erratic/abusive sessions score high).
    *
    * Two corpus-sized stages, both key-partitioned: the user-keyed lag
    * window and the per-user aggregate. The model is the ≤|types]²
    * bigram frame, broadcast onto the transition stream — scoring is
    * map-side. Probabilities are exact integer ratios; the ln/avg
    * chain is identical cross-engine modulo sum order (4-dp round).
    *
    * Output: (user, n_transitions, avg_surprise), surprise in nats.
    */
  def sequenceSurprise(events: DataFrame, userCol: String,
                       typeCol: String, tsCol: String, idCol: String)
  : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val trans = events
      .withColumn("_prev", lag(col(typeCol), 1).over(w))
      .filter(col("_prev").isNotNull)
      .select(col(userCol), col("_prev").as("prev_type"),
        col(typeCol).as("next_type"))
    val counts = trans.groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("_nab"))
    val marg = counts.groupBy(col("prev_type"))
      .agg(sum(col("_nab")).as("_na"))
    trans
      .join(broadcast(counts), Seq("prev_type", "next_type"))
      .join(broadcast(marg), Seq("prev_type"))
      .groupBy(col(userCol)).agg(
        count(lit(1)).as("n_transitions"),
        (round(avg(-log(col("_nab").cast("double") / col("_na")))
          + lit(1e-9), 4) + lit(0.0)).as("avg_surprise"))
  }

  /** Gap-based batch sessionization: split each user's event stream
    * into sessions wherever the inter-event gap exceeds `gapMinutes`,
    * and aggregate one row per session — the batch twin of the
    * streaming session window (q37), and the form every
    * clickstream-analytics warehouse materializes.
    *
    * Shape: the classic two-window gaps-and-islands, BOTH partitioned
    * on the high-cardinality user id (never a global sort): `lag`
    * flags session starts, a running sum over the same ordering turns
    * flags into session ids, and a user+session aggregate collapses
    * events to sessions. Integer micros end-to-end; ordering
    * tie-breaks on the unique event id.
    *
    * Output: (userCol, session_seq 1-based, n_events, duration_us).
    */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 idCol: String, gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("_us"), col(idCol))
    events
      .withColumn("_us", unix_micros(col(tsCol)))
      .withColumn("_prev", lag(col("_us"), 1).over(w))
      .withColumn("_new",
        when(col("_prev").isNull || col("_us") - col("_prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("_new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("_us")) - min(col("_us"))).as("duration_us"))
  }

  /** Merge overlapping-or-touching intervals per key (gaps-and-islands
    * coverage union) — the dedup step for time-range data: on-call
    * windows, ad impressions, maintenance windows, sensor coverage.
    * Intervals are `[startCol, endCol]` in integer micros; an interval
    * starting exactly at the running max end MERGES (touching counts
    * as overlap).
    *
    * Shape: one window partitioned on the key computes the running
    * max end over STRICTLY preceding rows (ordered by start, end — the
    * island flag is tie-order-insensitive for identical intervals), a
    * second identical-keyed window turns new-island flags into island
    * ids, and a key+island aggregate emits the merged spans. All
    * windows stay partitioned on the (high-cardinality) key.
    *
    * `tieCols` (optional) extends the window order to a TOTAL order
    * with a unique id. The island algebra itself doesn't need it —
    * identical (start, end) rows produce the same flags under any
    * permutation — but a replayed-SQL oracle might: at the 10×
    * duplicated-timestamp corpus, DuckDB 1.0's multi-threaded window
    * path returned a DIFFERENT island count on each run of the
    * equivalent SQL (99236/99233/99237; single-threaded it is stable
    * at 99233, which is also exactly this operator's answer — the
    * value any correct execution is forced to). A unique tie-break
    * keeps both engines off tied-sort paths entirely (round 11; the
    * q54/q12 total-order remedy applied to an INTERNAL window).
    *
    * Output: (keyCol, island_seq 1-based, start_us, end_us, n_merged).
    */
  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
                     endCol: String, tieCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol) +: col(endCol) +: tieCols.map(col): _*)
    val prevMax = max(col(endCol))
      .over(ord.rowsBetween(Window.unboundedPreceding, -1))
    df
      .withColumn("_pm", prevMax)
      .withColumn("_new",
        when(col("_pm").isNull || col(startCol) > col("_pm"), 1L)
          .otherwise(0L))
      .withColumn("island_seq", sum(col("_new")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("island_seq"))
      .agg(min(col(startCol)).as("start_us"), max(col(endCol)).as("end_us"),
        count(lit(1)).as("n_merged"))
  }

  /** Run-length collapse of per-user status streams into SCD-2-style
    * validity ranges: consecutive events with the SAME type merge into
    * one run carrying `[valid_from, valid_to)` — the change-data shape
    * warehouses keep for slowly-changing attributes, built here from
    * an append-only event log.
    *
    * Shape: gaps-and-islands again — a user-keyed `lag` flags type
    * changes, a running sum numbers the runs, a user+run aggregate
    * collapses events, and one LAST user-keyed window (`lead` over the
    * already-collapsed run frame, strictly smaller than the input)
    * closes each run with the next run's start. Integer micros;
    * ordering tie-breaks on the unique event id; the open run's
    * valid_to is -1 (not NULL, keeping the column hash-stable).
    *
    * Output: (userCol, run_seq, status, valid_from_us, valid_to_us,
    * n_events).
    */
  def collapseRuns(events: DataFrame, userCol: String, typeCol: String,
                   tsCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("_us"), col(idCol))
    val runs = events
      .withColumn("_us", unix_micros(col(tsCol)))
      .withColumn("_prev", lag(col(typeCol), 1).over(w))
      .withColumn("_chg",
        when(col("_prev").isNull || col("_prev") =!= col(typeCol), 1L)
          .otherwise(0L))
      .withColumn("run_seq", sum(col("_chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("run_seq"))
      .agg(min(col(typeCol)).as("status"),
        min(col("_us")).as("valid_from_us"),
        count(lit(1)).as("n_events"))
    val w2 = Window.partitionBy(col(userCol)).orderBy(col("run_seq"))
    runs.withColumn("valid_to_us",
        coalesce(lead(col("valid_from_us"), 1).over(w2), lit(-1L)))
      .select(col(userCol), col("run_seq"), col("status"),
        col("valid_from_us"), col("valid_to_us"), col("n_events"))
  }

  /** Exponentially-weighted moving average per user over the trailing
    * `frameRows` events — recency-weighted features where the flat
    * rolling mean ([[rollingUserAvg]]) over-weights stale activity.
    * EWMA_t = Σ vᵢ·decay^(age_i) / Σ decay^(age_i) over the frame
    * (age 0 = current row), normalized so partial frames at a user's
    * start are unbiased.
    *
    * Shape: one user-keyed window collects the bounded frame
    * (`collect_list` over a rows frame preserves frame order; ≤
    * `frameRows` doubles per row), and the weighted fold runs as
    * `aggregate`/`transform` HOFs inside codegen — no second window,
    * no self-join. With the default decay 0.5 every weight is a power
    * of two, so products are exact IEEE scalings and the fixed-order
    * fold is bit-identical across engines — the reason the oracle can
    * hash-match a 16-term float recurrence.
    *
    * NULL semantics: rows with a NULL `valueCol` are dropped up front
    * (no output row, no weight position). This is enforced, not
    * assumed: Spark's `collect_list` skips NULLs while e.g. DuckDB's
    * `list()` keeps them as weight positions — filtering first pins ONE
    * semantic that any oracle can reproduce with the same WHERE clause.
    */
  def ewma(events: DataFrame, userCol: String, tsCol: String,
           idCol: String, valueCol: String, frameRows: Int = 16,
           decay: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(frameRows >= 1, "frameRows must be >= 1")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("_us"), col(idCol))
      .rowsBetween(-(frameRows - 1), 0)
    val vals = col("_vals")
    val n = size(vals)
    def fold(term: Column => Column): Column =
      aggregate(sequence(lit(0), n - 1), lit(0.0),
        (acc, i) => acc + term(i))
    val num = fold(i => element_at(vals, i + 1) *
      pow(lit(decay), (n - 1 - i).cast("double")))
    val den = fold(i => pow(lit(decay), (n - 1 - i).cast("double")))
    events
      .filter(col(valueCol).isNotNull)
      .withColumn("_us", unix_micros(col(tsCol)))
      .withColumn("_vals", collect_list(col(valueCol)).over(w))
      .withColumn("ewma", round(num / den + lit(1e-9), 4))
      .drop("_us", "_vals")
  }

  /** Weekly cohort retention: bucket each user by their FIRST active
    * week (the cohort), then count distinct users per (cohort week,
    * weeks-since-cohort) — the retention triangle behind every growth
    * dashboard.
    *
    * Shapes: one distinct over (user, week) — the only corpus-sized
    * shuffle, keyed on the high-cardinality user — then a per-user min
    * (map-side combined), a user-keyed join, and a tiny final aggregate
    * (|cohorts| × |offsets| rows).
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String)
  : DataFrame = {
    val weeks = events.select(col(userCol),
        date_trunc("week", col(tsCol)).cast("date").as("_w"))
      .distinct()
    val cohorts = weeks.groupBy(col(userCol))
      .agg(min(col("_w")).as("cohort_week"))
    weeks.join(cohorts, Seq(userCol))
      .groupBy(col("cohort_week"),
        (datediff(col("_w"), col("cohort_week")) / 7).cast("long")
          .as("week_offset"))
      .agg(count_distinct(col(userCol)).as("n_users"))
  }

  /** Kaplan-Meier survival curve over right-censored durations — the
    * time-to-event analysis behind churn ("how long until a signup
    * converts / a user lapses") on an event log:
    *
    *   S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ)
    *
    * with dᵢ = events at duration tᵢ and nᵢ = subjects still at risk
    * (duration ≥ tᵢ; censored subjects leave the risk set without an
    * event). Input: one row per subject, an integer `durationCol` and
    * a 0/1 `eventCol` (0 = censored at that duration).
    *
    * Shapes at 100 TB: the subject stream collapses FIRST through one
    * map-side-combined per-duration aggregate (d, m per distinct
    * duration) — the only corpus-sized exchange. The curve math then
    * runs on the curve-sized frame: n from a descending cumulative sum,
    * S via exp(Σ ln(1−d/n)) over an ASCENDING-ordered window — the
    * product becomes an ordered sum, which both engines evaluate in
    * the identical sequence. Those windows are unpartitioned BY
    * CONSTRUCTION over |distinct durations| rows (study length, not
    * corpus size) — the q106-margins class, documented.
    *
    * Output (event durations only, the standard KM table):
    * (durationCol, n_risk, n_event, survival 4 dp), ascending.
    */
  def kaplanMeier(df: DataFrame, durationCol: String, eventCol: String)
  : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = df.groupBy(col(durationCol))
      .agg(count(lit(1)).as("_m"), sum(col(eventCol)).cast("long").as("_d"))
    val asc = Window.orderBy(col(durationCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val desc = Window.orderBy(col(durationCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    per
      .withColumn("n_risk", sum(col("_m")).over(desc))
      // d = n can only happen on the LAST row (n is a suffix count):
      // its factor is an exact 0, which must not enter the log —
      // Spark's log would yield null (silently dropped by the window
      // sum) and DuckDB's ln(0) errors. Excluded here, restored below.
      .withColumn("_lnterm",
        when(col("_d") < col("n_risk"),
          log(lit(1.0) - col("_d") / col("n_risk").cast("double")))
          .otherwise(lit(0.0)))
      .withColumn("survival",
        when(col("_d") === col("n_risk"), lit(0.0)).otherwise(
          round(exp(sum(col("_lnterm")).over(asc)) + lit(1e-9), 4)))
      .filter(col("_d") > 0)
      .select(col(durationCol), col("n_risk"), col("_d").as("n_event"),
        col("survival"))
  }

  /** Time-weighted average value per key over an irregular event stream
    * — the TWAP every metering/pricing pipeline needs, where a plain
    * mean over-weights bursts: each observation holds until the next
    * one, so it contributes value × holding-duration,
    *
    *   twap(k) = Σᵢ vᵢ·(tᵢ₊₁ − tᵢ) / (t_last − t_first)
    *
    * The last observation has no holding interval and contributes only
    * its timestamp; keys with a single event have no interval and drop
    * out (the caller left-joins if it needs them).
    *
    * Shape at 100 TB: ONE window, partitioned on the high-cardinality
    * key (lead of the timestamp), then a key-keyed aggregate — the
    * standard per-entity stream pair every event operator here uses.
    * `orderCols` breaks timestamp ties deterministically (equal-ts
    * intervals are zero-width, so tie ORDER cannot change the sum).
    *
    * Output: (keyCol, n_events, round(twap, 4)).
    */
  def timeWeightedAvg(df: DataFrame, keyCol: String, tsCol: String,
                      valueCol: String, orderCols: Seq[Column] = Nil)
  : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol) +: orderCols: _*)
    df.select(col(keyCol) +: col(tsCol) +: col(valueCol) +: orderCols :+
        unix_micros(col(tsCol)).as("_t"): _*)
      .withColumn("_dur",
        (lead(col("_t"), 1).over(w) - col("_t")).cast("double"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol) * col("_dur")).as("_num"),
        sum(col("_dur")).as("_den"))
      // single-event keys (null sum) and zero-span keys (all events at
      // one instant) have no time base — drop rather than emit NaN
      .filter(col("_den") > 0)
      .select(col(keyCol), col("n_events"),
        round(col("_num") / col("_den") + lit(1e-9), 4).as("twap"))
  }

  /** RFM segmentation (Hughes' recency/frequency/monetary quartiles) —
    * the classic customer-value partition, over any (entity, date,
    * amount) transaction stream.
    *
    * Determinism contract: every per-entity dimension is an EXACT
    * integer (recency = days since `anchor`, frequency = count,
    * monetary = HALF_UP cents), and the quartile cutoffs are linear
    * interpolations at {.25,.5,.75} over those integers — every
    * intermediate (integer < 2⁵³, quarter fractions) is exactly
    * representable in binary, so ANY correct percentile_cont
    * implementation produces bit-identical cutoffs and the
    * `val > cutoff` segment comparisons can never flip cross-engine.
    *
    * Shape at 100 TB: one entity-keyed aggregate (map-side combined),
    * ONE single-row percentile aggregate over the entity summary (the
    * documented exact-percentile trade — swap approx_percentile when
    * the entity count itself is huge) broadcast back, then a ≤64-key
    * rollup. No windows, no unpartitioned sorts over the corpus.
    */
  def rfmSegments(tx: DataFrame, idCol: String, dateCol: String,
                  amountCol: String, anchor: String): DataFrame = {
    val per = tx.groupBy(col(idCol)).agg(
      datediff(lit(anchor).cast("date"), max(col(dateCol)))
        .cast("long").as("_rec"),
      count(lit(1)).as("_freq"),
      sum(round(col(amountCol) * 100, 0).cast("long")).as("_cents"))
    val cuts = per.agg(
      percentile(col("_rec"), array(lit(0.25), lit(0.5), lit(0.75)))
        .as("_rc"),
      percentile(col("_freq"), array(lit(0.25), lit(0.5), lit(0.75)))
        .as("_fc"),
      percentile(col("_cents"), array(lit(0.25), lit(0.5), lit(0.75)))
        .as("_mc"))
    def quartile(v: Column, c: Column, reverse: Boolean): Column = {
      // score 1..4; recency is reversed (smaller = more recent = better)
      val raw = lit(1) + (0 until 3).map(i =>
        when(v > element_at(c, i + 1), 1).otherwise(0)).reduce(_ + _)
      if (reverse) lit(5) - raw else raw
    }
    per.join(broadcast(cuts))
      .select(col(idCol),
        (quartile(col("_rec"), col("_rc"), reverse = true) * 100 +
          quartile(col("_freq"), col("_fc"), reverse = false) * 10 +
          quartile(col("_cents"), col("_mc"), reverse = false))
          .cast("long").as("rfm_code"),
        col("_rec"), col("_cents"))
      .groupBy(col("rfm_code")).agg(
        count(lit(1)).as("n_customers"),
        sum(col("_cents")).as("monetary_cents"),
        round(avg(col("_rec")) + lit(1e-9), 4).as("avg_recency_days"))
  }

  /** Top-k sequential trigrams: the most frequent (step1, step2, step3)
    * event-type runs across all per-user timelines —
    * [[markovTransitions]]'s order-2 sibling, the first-pass sequential
    * pattern mine (what three-step journeys dominate) without a full
    * PrefixSpan lattice.
    *
    * Two `lead`s over the (user, time, tie-break) window build each
    * user's trigram stream in place — the window partitions on the
    * high-cardinality user id, trigrams never cross users (trailing
    * leads are null-dropped), and the count is one 3-string-keyed
    * map-side-combined aggregate into a global top-k
    * (TakeOrderedAndProject — k·partitions driver cost). Exact integer
    * counts; ties broken by the trigram itself.
    */
  def topSequencePatterns(events: DataFrame, userCol: String,
                          tsCol: String, typeCol: String, k: Int,
                          orderCols: Seq[Column] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol) +: orderCols: _*)
    events
      .select(col(userCol), col(typeCol).as("step1"),
        lead(col(typeCol), 1).over(w).as("step2"),
        lead(col(typeCol), 2).over(w).as("step3"))
      .filter(col("step3").isNotNull)
      .groupBy(col("step1"), col("step2"), col("step3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("step1"), col("step2"), col("step3"))
      .limit(k)
  }

  /** Rolling distinct actives — the DAU/WAU/stickiness panel: per day,
    * the distinct users active that day (`dau`), in the trailing
    * `windowDays`-day window (`wau`), and their ratio (the classic
    * engagement "stickiness" metric, dau/wau).
    *
    * Exact sliding-window DISTINCT is the textbook scale trap: a
    * day×window range self-join re-reads every row `windowDays` times
    * at raw-event grain. Shape here: the corpus collapses FIRST to the
    * distinct (user, day) frame — the only corpus-sized shuffle, keyed
    * on the high-cardinality user — then each user-day row fans out to
    * the ≤`windowDays` window anchors it can serve (a date-`sequence`
    * explode), so the windowed distinct runs over windowDays×|user-day|
    * rows, independent of raw event volume. Window days with no
    * same-day activity drop out in the final `dau` join (anchors are
    * active days, matching a calendar built from the data). The 100 TB
    * swap when even user-day is too hot: per-day HLL sketches merged
    * across the window (q93's mergeable-sketch currency) — estimated,
    * not exact, with the q48-style tolerance gate if certification is
    * needed.
    */
  def rollingDistinctActives(events: DataFrame, userCol: String,
                             tsCol: String, windowDays: Int = 7)
  : DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val ud = events.select(col(userCol).as("_u"),
      to_date(col(tsCol)).as("day")).distinct()
    val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("_u"), explode(sequence(col("day"),
        date_add(col("day"), windowDays - 1))).as("day"))
      .groupBy(col("day")).agg(count_distinct(col("_u")).as("wau"))
    dau.join(wau, Seq("day"))
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau") + lit(1e-9), 4)
          .as("stickiness"))
  }
}
