package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range join: point-in-interval (and interval-overlap) joins
  * between two LARGE sides without a nested-loop plan.
  *
  * Spark's planner has no range-join operator: a join whose only
  * condition is an inequality becomes BroadcastNestedLoopJoin (when one
  * side fits) or a cartesian product (when neither does) — O(|L|·|R|)
  * either way. The standard fix (Databricks' range-join optimization,
  * Sedona's spatial bins) is binning: quantize the range axis into
  * fixed-width bins, EXPLODE each interval to every bin it covers, tag
  * each point with its single bin, equi-join on the bin id, then
  * re-check the exact predicate. The equi-join shuffles and
  * hash-matches as usual, so cost is O(candidates in the same bin)
  * instead of O(all pairs).
  *
  * Bin width is the tuning knob: ≈ the median interval width makes the
  * per-interval explosion a small constant (an interval covers
  * ⌈width/binWidth⌉ + 1 bins) while keeping bins selective. Degenerate
  * inputs (a few intervals spanning the whole axis) explode to
  * axis/binWidth rows each — cap or split such outliers upstream, the
  * same escape hatch the LSH band joins use (`capBucketsWithDropped`).
  *
  * No dedup pass is needed for point-in-interval: a point lives in
  * exactly ONE bin, so each (point, interval) pair meets at most once.
  */
object RangeJoin {

  private def binOf(c: Column, binWidth: Long): Column = {
    // integer floor-division on longs — exact over the WHOLE long range
    // (the earlier double-division floor was only exact within 2^53 and
    // silently mis-binned beyond): SQL `div` truncates toward zero, so
    // adjust by -1 when a negative value has a remainder. binWidth is
    // validated positive by both joins, so `c % binWidth < 0` iff the
    // value is negative and inexact.
    val t = call_function("div", c, lit(binWidth))
    when(c % binWidth < 0, t - 1).otherwise(t)
  }

  private def requireNoBin(df: DataFrame, side: String): Unit =
    require(!df.columns.contains("__bin"),
      s"$side already has a __bin column — it would collide with the " +
        "join's internal bin tag; rename it first")

  /** Join `points` (scalar column `pointCol`) to `intervals` (columns
    * `loCol`..`hiCol`, inclusive) on containment: lo <= p <= hi.
    * Column sets must be disjoint. Long-typed axis. */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    requireNoBin(points, "points")
    requireNoBin(intervals, "intervals")
    val taggedPoints = points.withColumn("__bin", binOf(col(pointCol), binWidth))
    val explodedIntervals = intervals.withColumn("__bin",
      explode(sequence(binOf(col(loCol), binWidth), binOf(col(hiCol), binWidth))))
    taggedPoints.join(explodedIntervals, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }

  /** Join two interval relations on OVERLAP:
    * `aLo <= bHi && bLo <= aHi` (inclusive ends). Both sides explode to
    * their covered bins and equi-join on the bin id; an overlapping
    * pair shares EVERY bin its intersection covers, so without care it
    * would be emitted once per shared bin. The standard dedup is free
    * at join time: keep the pair only in the FIRST shared bin —
    * `__bin == max(binOf(aLo), binOf(bLo))` — a deterministic
    * arithmetic pick, no `distinct` shuffle afterwards. */
  def intervalOverlap(a: DataFrame, aLo: String, aHi: String,
                      b: DataFrame, bLo: String, bHi: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    requireNoBin(a, "left intervals")
    requireNoBin(b, "right intervals")
    def exploded(df: DataFrame, lo: String, hi: String): DataFrame =
      df.withColumn("__bin",
        explode(sequence(binOf(col(lo), binWidth), binOf(col(hi), binWidth))))
    exploded(a, aLo, aHi).join(exploded(b, bLo, bHi), Seq("__bin"))
      .filter(col(aLo) <= col(bHi) && col(bLo) <= col(aHi) &&
        col("__bin") === greatest(binOf(col(aLo), binWidth),
          binOf(col(bLo), binWidth)))
      .drop("__bin")
  }
}
