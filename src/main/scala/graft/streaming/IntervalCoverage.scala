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
}
