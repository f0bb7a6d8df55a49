package graft.ext

import org.apache.spark.sql.DataFrame
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
}
