package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression conversion for graft's native expressions.
  *
  * Spark 4 unified Column on ColumnNode and made the classic converters
  * `private[sql]`; this bridge lives in an org.apache.spark.sql
  * subpackage to reach them — the standard pattern for libraries that
  * ship custom Catalyst expressions (same technique as frameless /
  * sedona / delta).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame over an already-resolved LogicalPlan (custom operator
    * nodes constructed from analyzed children).
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
  : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Release the storage behind a CHECKPOINTED DataFrame: unpersist the
    * LogicalRDD's backing RDD (localCheckpoint keeps its blocks in the
    * block manager until GC of the RDD reference — an iterative loop
    * that checkpoints per round would otherwise hold O(rounds) dead
    * label/edge copies in executor storage) and, for reliable
    * checkpoints, delete the round's checkpoint files. No-op on
    * anything that is not a checkpoint-backed frame; never touches
    * frames a caller could still recompute-from-lineage (a LogicalRDD
    * HAS no lineage — callers must only release rounds they no longer
    * read, which is the point).
    */
  def releaseCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        val r = l.rdd
        r.unpersist(blocking = false)
        if (r.getCheckpointFile.isDefined) // reliable only; None for local
          try org.apache.spark.rdd.ReliableRDDCheckpointData
            .cleanCheckpoint(r.sparkContext, r.id)
          catch { case _: Exception => () } // best-effort file cleanup
      case _ => ()
    }
}
