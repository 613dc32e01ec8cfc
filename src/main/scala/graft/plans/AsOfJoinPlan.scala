package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.types.PhysicalDataType
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Logical as-of join: for each left row, append the `rightValues` of the
  * single right row with the greatest `rightTime <= leftTime` among rows
  * with equal keys — NULL-padded when no right row precedes (LEFT OUTER
  * face, DuckDB's `ASOF LEFT JOIN` semantics; its oracle SQL is the
  * conformance check, see q128).
  *
  * This is the whole-operator tier of the extension ladder: the
  * composition route ([[graft.ops.AsOfJoin.asOf]]) expresses the same
  * semantics as tagged-union + running `last(ignoreNulls)` window, but
  * pays for it — the union doubles the shuffled row count, every left row
  * carries null-padded right columns through the sort, and the window
  * then re-scans each key group. The native operator shuffles each side
  * once at its own width, sorts each side once, and streams a
  * per-partition merge. Both plans are one shuffle round; the native one
  * moves strictly fewer bytes.
  *
  * Scale: distribution is `ClusteredDistribution` per side on the join
  * keys (EnsureRequirements co-partitions them exactly as it does for
  * SortMergeJoin), ordering is (keys..., time) ascending per side, and
  * the merge holds ONE candidate row — O(1) state regardless of key
  * cardinality or rows per key, no per-key buffering. Skewed keys cost
  * what they cost SortMergeJoin, without the output-pair blowup (output
  * is exactly |left| rows).
  *
  * Constructed RESOLVED (from analyzed child plans + resolved
  * attributes) by [[graft.ops.AsOfJoin.asOfNative]]; planned by
  * [[AsOfJoinStrategy]], which `GraftExtensions` installs via
  * `injectPlannerStrategy`.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    leftTime: Attribute,
    rightKeys: Seq[Attribute],
    rightTime: Attribute,
    rightValues: Seq[Attribute],
    forward: Boolean = false) extends BinaryNode {

  // Fail loudly on side-type mismatches: the exec reads the RIGHT
  // side's time through an accessor typed from the LEFT time column and
  // compares keys with an ordering built from the LEFT key types, so a
  // DateType-vs-TimestampType time pair (days compared as micros) or an
  // int-vs-long key pair would produce silently wrong matches, not an
  // analysis error.
  require(leftKeys.length == rightKeys.length,
    s"as-of join: ${leftKeys.length} left keys vs ${rightKeys.length} right keys")
  leftKeys.zip(rightKeys).foreach { case (l, r) =>
    require(l.dataType == r.dataType,
      s"as-of join key type mismatch: ${l.name}: ${l.dataType.sql} vs " +
        s"${r.name}: ${r.dataType.sql} — cast one side explicitly")
  }
  require(leftTime.dataType == rightTime.dataType,
    s"as-of join time type mismatch: ${leftTime.name}: ${leftTime.dataType.sql} vs " +
      s"${rightTime.name}: ${rightTime.dataType.sql} — cast one side explicitly")

  // the match is optional, so right-side values turn nullable
  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override def maxRows: Option[Long] = left.maxRows

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] into [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, lt, rk, rt, rv, fwd) =>
      AsOfJoinExec(lk, lt, rk, rt, rv, fwd, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join.
  *
  * Required layout (EnsureRequirements inserts the shuffles/sorts):
  * both sides hash-clustered on their keys and sorted by
  * (keys..., time) ascending within each partition. The merge then makes
  * one pass over each side per partition.
  *
  * BACKWARD (default, `rt <= lt`, greatest qualifying time):
  *  - advance the right cursor past every row whose key sorts before the
  *    current left key (stale keys can never match later left rows —
  *    left keys only grow);
  *  - at equal keys, fold right rows with `time <= leftTime` into the
  *    single retained candidate (later rows overwrite earlier — the
  *    GREATEST qualifying time — so memory is one row, not one group);
  *  - emit left ++ candidateValues, or left ++ nulls when the candidate
  *    is absent or keyed differently.
  * Retained candidates survive across left rows of the same key (left
  * times ascend, so a previous match stays valid until a later right row
  * supersedes it).
  *
  * FORWARD (`rt >= lt`, smallest qualifying time) needs NO candidate
  * state at all: rows with `rt < lt` are discarded (later left rows
  * have even greater times, so they can never match those either), and
  * the match — when the keys agree — is simply the right cursor's
  * CURRENT row, left unconsumed because it may also match later left
  * rows.
  *
  * NULL semantics follow SQL joins either way: a null in any key or
  * in either time never matches. Null-first sort order makes the skips
  * cheap: null-keyed/timed rows cluster at each boundary's start.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Attribute],
    leftTime: Attribute,
    rightKeys: Seq[Attribute],
    rightTime: Attribute,
    rightValues: Seq[Attribute],
    forward: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  // one output row per left row, in left order
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val keyTypes = leftKeys.map(_.dataType)
    val valueTypes = rightValues.map(_.dataType)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lTimeOrd = left.output.indexWhere(_.exprId == leftTime.exprId)
      val rTimeOrd = right.output.indexWhere(_.exprId == rightTime.exprId)
      val timeType = leftTime.dataType
      val rValueProj = UnsafeProjection.create(rightValues, right.output)
      val keyOrd: Ordering[InternalRow] =
        RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd: Ordering[Any] = PhysicalDataType.ordering(timeType)
      val nullValues = InternalRow.fromSeq(valueTypes.map(_ => null))
      val joined = new JoinedRow
      val out = UnsafeProjection.create(output, output)

      new Iterator[InternalRow] {
        // backward only — the single retained candidate (key + values)
        private var candKey: UnsafeRow = _
        private var candValues: UnsafeRow = _
        private var rRow: InternalRow =
          if (rIter.hasNext) rIter.next() else null

        private def rightTimeVal(): Any =
          if (rRow.isNullAt(rTimeOrd)) null else rRow.get(rTimeOrd, timeType)

        /** Backward: consume qualifying rows into the candidate, stop at
          * the first future-dated or ahead-keyed row. */
        private def advanceBackward(lKey: UnsafeRow, lTimeVal: Any): Unit = {
          var done = false
          while (!done && rRow != null) {
            val rKey = rKeyProj(rRow)
            val c = if (rKey.anyNull) -1 else keyOrd.compare(rKey, lKey)
            if (c < 0) {
              // stale or null-keyed right row: skip (left keys ascend)
              rRow = if (rIter.hasNext) rIter.next() else null
            } else if (c == 0) {
              val rt = rightTimeVal()
              if (rt == null) {
                // null right time never matches anyone: skip
                rRow = if (rIter.hasNext) rIter.next() else null
              } else if (lTimeVal != null && timeOrd.compare(rt, lTimeVal) <= 0) {
                // qualifying: fold into the candidate (later rows have
                // greater-or-equal time, so overwrite == keep greatest)
                candKey = rKey.copy()
                candValues = rValueProj(rRow).copy()
                rRow = if (rIter.hasNext) rIter.next() else null
              } else done = true // future-dated for this left row: hold
            } else done = true // right is ahead: hold for later left keys
          }
        }

        /** Forward: discard rows that can never match this or any later
          * left row; the match (if keys agree) is the CURRENT row, left
          * unconsumed for later left rows. */
        private def advanceForward(lKey: UnsafeRow, lTimeVal: Any): UnsafeRow = {
          var done = false
          var matched: UnsafeRow = null
          while (!done && rRow != null) {
            val rKey = rKeyProj(rRow)
            val c = if (rKey.anyNull) -1 else keyOrd.compare(rKey, lKey)
            if (c < 0) {
              rRow = if (rIter.hasNext) rIter.next() else null
            } else if (c == 0) {
              val rt = rightTimeVal()
              if (rt == null || timeOrd.compare(rt, lTimeVal) < 0) {
                // null time, or already behind EVERY remaining left time
                rRow = if (rIter.hasNext) rIter.next() else null
              } else {
                matched = rValueProj(rRow) // no copy: emitted before next()
                done = true
              }
            } else done = true
          }
          matched
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lKeyProj(lRow)
          val lTimeVal = if (lRow.isNullAt(lTimeOrd)) null
                         else lRow.get(lTimeOrd, timeType)
          var matched: UnsafeRow = null
          if (!lKey.anyNull && lTimeVal != null) {
            if (forward) {
              matched = advanceForward(lKey, lTimeVal)
            } else {
              advanceBackward(lKey, lTimeVal)
              if (candValues != null && keyOrd.compare(candKey, lKey) == 0) {
                matched = candValues
              }
            }
          }
          numOutputRows += 1
          if (matched != null) {
            numMatched += 1
            out(joined(lRow, matched))
          } else {
            out(joined(lRow, nullValues))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
