package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.Bridge

/** Native AS-OF JOIN as a whole custom operator — the (c) tier of the
  * custom-operator ladder: LogicalPlan node + SparkStrategy + SparkPlan,
  * registered through SparkSessionExtensions (GraftExtensions).
  *
  * Semantics match Relational.asofJoin (latest right row with
  * rightTs <= leftTs per key, inclusive; dedup the right side first if
  * (key, ts) can repeat — ties are ambiguous by definition). With
  * `forward = true` the direction flips: EARLIEST right row with
  * rightTs >= leftTs per key (inclusive), tolerance bounding the
  * lookahead instead of the lookback — the "next event after" join
  * (time-to-next-error, next maintenance window). The
  * physical operator declares ClusteredDistribution + (key, ts)
  * ordering requirements, so EnsureRequirements plans ONE co-partitioned
  * exchange per side plus per-partition sorts, and the merge itself is
  * a single forward pass holding ONE buffered right row — no window
  * buffer, no union, no candidate pairs.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTs: Expression, rightTs: Expression,
                        rightValExprs: Seq[Expression],
                        valAttrs: Seq[Attribute],
                        toleranceMicros: Long = -1L,
                        forward: Boolean = false) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ valAttrs

  // valAttrs are GENERATED here (fresh exprIds, like Generate's output):
  // declaring them keeps missingInput empty and stops alias-rewrite rules
  // from touching them
  override def producedAttributes: AttributeSet = AttributeSet(valAttrs)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTs: Expression, rightTs: Expression,
                        rightValExprs: Seq[Expression],
                        valAttrs: Seq[Attribute],
                        toleranceMicros: Long = -1L,
                        forward: Boolean = false) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ valAttrs

  override def producedAttributes: AttributeSet = AttributeSet(valAttrs)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val rValExprs = rightValExprs
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    val nVals = rightValExprs.length
    val tol = toleranceMicros

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsExpr), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsExpr), rOut)
      val rValProj = UnsafeProjection.create(rValExprs, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
      val nullVals = new GenericInternalRow(nVals)
      val joined = new JoinedRow

      if (forward)
        // FORWARD merge: earliest right row with rightTs >= leftTs
        // (inclusive) per key. The buffered row is the candidate ITSELF
        // and is NOT consumed on match — one "next maintenance window"
        // can serve many earlier left rows; it is only discarded once a
        // later left row's ts passes it (at which point no future left
        // row, all ordered later, can need it). Still one forward pass,
        // one buffered row.
        new Iterator[InternalRow] {
          private var rBufKey: InternalRow = _
          private var rBufTs: InternalRow = _
          private var rBufVals: InternalRow = _
          private var haveBuf = false

          override def hasNext: Boolean = lIter.hasNext

          override def next(): InternalRow = {
            val l = lIter.next()
            val lk = lKeyProj(l)
            val lt = lTsProj(l)
            var scan = true
            while (scan) {
              if (!haveBuf && rIter.hasNext) {
                val r = rIter.next()
                rBufKey = rKeyProj(r).copy()
                rBufTs = rTsProj(r).copy()
                rBufVals = rValProj(r).copy()
                haveBuf = true
              }
              if (!haveBuf) scan = false
              else {
                val kc = keyOrd.compare(rBufKey, lk)
                if (kc < 0) haveBuf = false // key ordered out forever
                else if (kc == 0 && tsOrd.compare(rBufTs, lt) < 0)
                  haveBuf = false // strictly before this left: stale
                else scan = false // candidate (same key, ts >= lt) or
                                  // a later key — stop advancing
              }
            }
            val matched = haveBuf && keyOrd.compare(rBufKey, lk) == 0 &&
              (tol < 0L || rBufTs.getLong(0) - lt.getLong(0) <= tol)
            joined(l, if (matched) rBufVals else nullVals)
          }
        }
      else new Iterator[InternalRow] {
        // one buffered right row (not yet merged) + the last merged match
        private var rBufKey: InternalRow = _
        private var rBufTs: InternalRow = _
        private var rBufVals: InternalRow = _
        private var haveBuf = false
        private var lastKey: InternalRow = _
        private var lastTs: InternalRow = _
        private var lastVals: InternalRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          val lt = lTsProj(l)
          var scan = true
          while (scan) {
            if (!haveBuf && rIter.hasNext) {
              val r = rIter.next()
              rBufKey = rKeyProj(r).copy()
              rBufTs = rTsProj(r).copy()
              rBufVals = rValProj(r).copy()
              haveBuf = true
            }
            if (!haveBuf) scan = false
            else {
              val kc = keyOrd.compare(rBufKey, lk)
              if (kc < 0) haveBuf = false // key ordered out forever
              else if (kc == 0 && tsOrd.compare(rBufTs, lt) <= 0) {
                lastKey = rBufKey; lastTs = rBufTs; lastVals = rBufVals
                haveBuf = false
              } else scan = false
            }
          }
          // tolerance: timestamps are epoch micros in their single-col
          // projections (TimestampType physical representation)
          val inWindow = tol < 0L || (lastTs != null &&
            lt.getLong(0) - lastTs.getLong(0) <= tol)
          val vals =
            if (lastVals != null && keyOrd.compare(lastKey, lk) == 0 &&
              inWindow) lastVals
            else nullVals
          joined(l, vals)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, rv, va, tol, fwd) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, rv, va,
        tol, fwd) :: Nil
    case _ => Nil
  }
}

/** Public API: build the (already-resolved) custom node from analyzed
  * children. Requires GraftSession (or any session with GraftExtensions)
  * so the planner knows the strategy.
  */
object AsOf {
  /** @param toleranceMicros when >= 0, a match must additionally satisfy
    *                         leftTs - rightTs <= tolerance (kdb-style
    *                         bounded lookback). Timestamp columns only.
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String,
           rightVals: Seq[(String, String)],
           toleranceMicros: Long = -1L,
           forward: Boolean = false): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
    import org.apache.spark.sql.catalyst.plans.logical.Project
    // Wrap both children in fresh-alias Projects: when left and right
    // derive from the same relation (the common self-as-of case) their
    // subtrees share exprIds, and the analyzer's relation-dedup rewrite
    // cannot fix references held inside a node type it doesn't know.
    // With fresh ids at the boundary, dedup happens entirely inside the
    // known Project nodes below.
    def freshen(p: LogicalPlan): (LogicalPlan, Map[String, Attribute]) = {
      val aliases = p.output.map(a => Alias(a, a.name)())
      (Project(aliases, p), aliases.map(al => al.name -> al.toAttribute).toMap)
    }
    def attr(m: Map[String, Attribute], n: String): Attribute =
      m.getOrElse(n, throw new IllegalArgumentException(
        s"column $n not in [${m.keys.mkString(", ")}]"))
    val (lPlan, lAttrs) = freshen(left.queryExecution.analyzed)
    val (rPlan, rAttrs) = freshen(right.queryExecution.analyzed)
    // The tolerance fast path reads both ts columns as raw epoch-micro
    // longs (AsOfJoinExec.doExecute) — that physical layout is only
    // guaranteed for TimestampType, so reject anything else at plan time
    // instead of silently misreading a DATE (days) or LONG column.
    if (toleranceMicros >= 0L) {
      import org.apache.spark.sql.types.TimestampType
      Seq(leftTs -> attr(lAttrs, leftTs), rightTs -> attr(rAttrs, rightTs))
        .foreach { case (name, a) =>
          if (a.dataType != TimestampType)
            throw new IllegalArgumentException(
              s"as-of tolerance requires TIMESTAMP ts columns; " +
                s"'$name' is ${a.dataType.sql}")
        }
    }
    val node = AsOfJoinPlan(lPlan, rPlan,
      keys.map(attr(lAttrs, _)), keys.map(attr(rAttrs, _)),
      attr(lAttrs, leftTs), attr(rAttrs, rightTs),
      rightVals.map { case (c, _) => attr(rAttrs, c) },
      rightVals.map { case (c, out) =>
        AttributeReference(out, attr(rAttrs, c).dataType, nullable = true)()
      },
      toleranceMicros, forward)
    Bridge.ofRows(left.sparkSession, node)
  }
}
