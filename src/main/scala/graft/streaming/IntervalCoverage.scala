package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sweep-line interval coverage (q141 maintained live):
  * per-key union length of overlapping intervals, folded incrementally.
  *
  * Batch q141 needs the whole interval set sorted per key; the
  * streaming fold needs only the OPEN island per key — constant state —
  * because under lo-ordered arrival an island can never reopen once a
  * later interval's lo clears its max hi. Arrival contract: per key,
  * intervals arrive ordered by (lo, hi) across batches (the staging
  * tiles by lo VALUE range, so equal-lo rows can't straddle a batch
  * boundary out of order); within a batch the handler sorts. A
  * regressed lo would silently merge islands, so it throws instead
  * (the [[EventStream]] guard discipline). Results emit on per-key
  * SENTINEL rows (lo = Long.MaxValue — the st12 punctuation idiom):
  * the sentinel closes the open island and emits the key's one summary
  * row; the sentinel itself never emits.
  */
object IntervalCoverage {

  /** One interval arrival; `lo = Long.MaxValue` is the flush sentinel. */
  case class Iv(sk: Long, lo: Long, hi: Long)

  /** Open island + accumulated summary + the ordering-guard key. */
  case class CovState(start: Long, maxHi: Long, covered: Long,
                      nIslands: Long, maxSpan: Long,
                      lastLo: Long, lastHi: Long)

  case class CovRow(s_suppkey: Long, covered_days: Long,
                    n_islands: Long, max_span: Long)

  /** The pure per-batch fold (PropertySpec proves batch-split
    * invariance against q141's direct sweep-line). */
  private[graft] def covFold(sk: Long, st0: Option[CovState],
                             sorted: Seq[Iv]): (Option[CovState], Seq[CovRow]) = {
    var st = st0
    val out = Seq.newBuilder[CovRow]
    sorted.foreach { iv =>
      st match {
        case Some(s) if s.lastLo != Long.MinValue &&
            (iv.lo < s.lastLo || (iv.lo == s.lastLo && iv.hi < s.lastHi)) =>
          throw new IllegalStateException(
            s"coverageStream: out-of-order interval for key $sk " +
              s"(got (${iv.lo}, ${iv.hi}) after (${s.lastLo}, ${s.lastHi}))")
        case _ => ()
      }
      if (iv.lo == Long.MaxValue) {
        // sentinel: close the open island, emit the summary, reset
        st.foreach { s =>
          val span = s.maxHi - s.start + 1
          out += CovRow(sk, s.covered + span, s.nIslands + 1,
            math.max(s.maxSpan, span))
        }
        st = None
      } else st = st match {
        case None =>
          Some(CovState(iv.lo, iv.hi, 0L, 0L, 0L, iv.lo, iv.hi))
        case Some(s) if iv.lo > s.maxHi =>
          // the open island can never reopen: fold it into the summary
          val span = s.maxHi - s.start + 1
          Some(CovState(iv.lo, iv.hi, s.covered + span, s.nIslands + 1,
            math.max(s.maxSpan, span), iv.lo, iv.hi))
        case Some(s) =>
          Some(s.copy(maxHi = math.max(s.maxHi, iv.hi),
            lastLo = iv.lo, lastHi = iv.hi))
      }
    }
    (st, out.result())
  }

  def coverageStream(ivs: Dataset[Iv]): Dataset[CovRow] = {
    import ivs.sparkSession.implicits._
    ivs.groupByKey(_.sk)
      .flatMapGroupsWithState[CovState, CovRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (sk: Long, rows: Iterator[Iv], state: GroupState[CovState]) =>
          val sorted = rows.toSeq.sortBy(iv => (iv.lo, iv.hi))
          if (sorted.isEmpty) Iterator.empty
          else {
            val (st, out) = covFold(sk, state.getOption, sorted)
            st match {
              case Some(s) => state.update(s)
              case None => if (state.exists) state.remove()
            }
            out.iterator
          }
      }
  }

  // ---- watermarked variant: bounded lo-disorder tolerated -------------------

  /** State for [[coverageStreamWatermarked]]: a bounded reorder buffer
    * (`pending`, intervals whose lo is still inside the slack horizon),
    * the lo high-water mark, the fold frontier (everything with
    * lo < frontier is already folded — the disorder guard), and the
    * open-island summary (`start = Long.MinValue` = no island yet). */
  case class CovStateW(pending: List[(Long, Long)], maxLoSeen: Long,
                       frontier: Long, start: Long, maxHi: Long,
                       covered: Long, nIslands: Long, maxSpan: Long)

  private[graft] val emptyW = CovStateW(Nil, Long.MinValue, Long.MinValue,
    Long.MinValue, Long.MinValue, 0L, 0L, 0L)

  /** Fold ONE lo-ordered interval into the open-island summary. */
  private def sweepInto(st: CovStateW, lo: Long, hi: Long): CovStateW =
    if (st.start == Long.MinValue) st.copy(start = lo, maxHi = hi)
    else if (lo > st.maxHi) {
      val span = st.maxHi - st.start + 1
      st.copy(start = lo, maxHi = hi, covered = st.covered + span,
        nIslands = st.nIslands + 1, maxSpan = math.max(st.maxSpan, span))
    } else st.copy(maxHi = math.max(st.maxHi, hi))

  /** The pure per-batch WATERMARKED fold (PropertySpec proves it equals
    * the ordered sweep under any bounded-disorder arrival + batch
    * split). Arrival contract relaxed from [[covFold]]'s strict
    * (lo, hi) order to a WATERMARK: an interval may arrive while
    * `lo >= maxLoSeen - slack`. Arrivals are buffered; only intervals
    * whose lo falls below `maxLoSeen - slack` (no in-contract future
    * arrival can precede them) are folded, in (lo, hi) order — so the
    * buffer holds at most the intervals of one slack window per key,
    * constant state at any stream length. Disorder past the slack
    * throws the same loud guard as the ordered fold. The sentinel
    * (lo = Long.MaxValue) flushes buffer + island and emits the key's
    * summary row. */
  private[graft] def covFoldW(sk: Long, st0: CovStateW, batch: Seq[Iv],
                              slack: Long): (Option[CovStateW], Seq[CovRow]) = {
    val (sentinels, rows) = batch.partition(_.lo == Long.MaxValue)
    rows.foreach { iv =>
      if (st0.frontier != Long.MinValue && iv.lo < st0.frontier)
        throw new IllegalStateException(
          s"coverageStreamWatermarked: interval (${iv.lo}, ${iv.hi}) for " +
            s"key $sk arrived past the slack horizon (already folded up " +
            s"to lo = ${st0.frontier}; slack = $slack)")
    }
    val merged = st0.pending ++ rows.map(iv => (iv.lo, iv.hi))
    val newMax = (st0.maxLoSeen +: rows.map(_.lo)).max
    if (sentinels.nonEmpty) {
      var st = st0.copy(pending = Nil, maxLoSeen = newMax)
      merged.sorted.foreach { case (lo, hi) => st = sweepInto(st, lo, hi) }
      val out =
        if (st.start == Long.MinValue) Seq.empty[CovRow]
        else {
          val span = st.maxHi - st.start + 1
          Seq(CovRow(sk, st.covered + span, st.nIslands + 1,
            math.max(st.maxSpan, span)))
        }
      (None, out)
    } else if (rows.isEmpty) (Some(st0), Nil)
    else {
      val threshold = newMax - slack
      val (ready, hold) = merged.partition(_._1 < threshold)
      var st = st0.copy(pending = hold, maxLoSeen = newMax,
        frontier = math.max(st0.frontier, threshold))
      ready.sorted.foreach { case (lo, hi) => st = sweepInto(st, lo, hi) }
      (Some(st), Nil)
    }
  }

  /** [[coverageStream]] for feeds that can't promise per-key (lo, hi)
    * arrival order: tolerates disorder up to `slack` via a per-key
    * reorder buffer (see [[covFoldW]]). The ordered fold stays the
    * fast path — zero buffering — for stagings that CAN promise order. */
  def coverageStreamWatermarked(ivs: Dataset[Iv], slack: Long): Dataset[CovRow] = {
    import ivs.sparkSession.implicits._
    ivs.groupByKey(_.sk)
      .flatMapGroupsWithState[CovStateW, CovRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (sk: Long, rows: Iterator[Iv], state: GroupState[CovStateW]) =>
          val batch = rows.toSeq
          if (batch.isEmpty) Iterator.empty
          else {
            val (st, out) = covFoldW(sk, state.getOption.getOrElse(emptyW),
              batch, slack)
            st match {
              case Some(s) => state.update(s)
              case None => if (state.exists) state.remove()
            }
            out.iterator
          }
      }
  }
}
