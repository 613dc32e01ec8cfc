package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (point-in-time lookup): for each left row, the single right
  * row with the greatest `rightTime <= leftTime` per key.
  *
  * Spark has no native as-of join operator; per the preference order
  * (compose > custom plan) this is the composition route: tag and union
  * both sides, one window sort per key carries the last-seen right row
  * forward (`last(..., ignoreNulls)`), then keep left rows. One shuffle
  * on (key), no range-explosion join — at 100 TB this is the same
  * union-window plan pandas-on-Spark uses for merge_asof, and it scales
  * linearly with rows per key.
  *
  * Right side must be unique per (key, time) — pre-dedup if needed.
  * Inclusive match (`<=`): right rows sort before left rows at equal
  * timestamps.
  */
object AsOfJoin {

  /** left:  (leftKey, leftTime, ...leftCols)
    * right: (rightKey, rightTime, ...valueCols)
    * Result: all left rows + `valueCols` of the matched right row (null
    * when no right row precedes). */
  def asOf(left: DataFrame, right: DataFrame,
           leftKey: String, leftTime: String,
           rightKey: String, rightTime: String,
           valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // tagged union: side 0 = right (visible at equal ts), side 1 = left.
    // Null-timed right rows are dropped FIRST: `time <= leftTime` is
    // never true for them, but NULLS FIRST ordering would sort them
    // ahead of every real row and the running `last` would carry their
    // values into the whole key group (caught by AsOfNativeSpec parity
    // against the native exec's SQL-correct null handling).
    val rightSide = right.filter(col(rightTime).isNotNull).select(
      Seq(col(rightKey).as("__key"), col(rightTime).as("__t"), lit(0).as("__side")) ++
        valueCols.map(col) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val leftSide = left.select(
      Seq(col(leftKey).as("__key"), col(leftTime).as("__t"), lit(1).as("__side")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)) ++
        leftCols.map(col): _*)
    val unioned = rightSide.unionByName(leftSide)
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(unioned) { (df, c) =>
      // null join keys never match (SQL join semantics; the window would
      // otherwise group null-key left rows with null-key right rows)
      df.withColumn(c,
        when(col("__key").isNotNull, last(col(c), ignoreNulls = true).over(w)))
    }
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ valueCols.map(col): _*)
  }

  /** The whole-operator route: same semantics as [[asOf]], executed by
    * the native sort-merge [[graft.plans.AsOfJoinExec]] (one shuffle +
    * one sort per side at each side's own width, O(1) merge state —
    * see the plan's scaladoc for the cost comparison). Requires the
    * session to carry `GraftExtensions` (Verify/Bench/SparkSpec all do);
    * without the injected strategy the plan cannot be executed.
    *
    * Same contract as [[asOf]]: right unique per (key, time), inclusive
    * match, null keys/times never match. Left and right must be
    * DISTINCT frames (an as-of self-join needs a re-analyzed copy —
    * the custom node is invisible to the analyzer's relation dedup).
    *
    * `forward = true` flips the direction: the EARLIEST right row with
    * `rightTime >= leftTime` (pandas merge_asof direction='forward',
    * DuckDB `ASOF ... ON l.t <= r.t`) — same one-pass merge, and in
    * this direction the exec holds no candidate state at all. */
  def asOfNative(left: DataFrame, right: DataFrame,
                 leftKey: String, leftTime: String,
                 rightKey: String, rightTime: String,
                 valueCols: Seq[String],
                 forward: Boolean = false): DataFrame = {
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"asOfNative: no column '$name' in ${plan.output.map(_.name)}"))
    require(lPlan.outputSet.intersect(rPlan.outputSet).isEmpty,
      "asOfNative: left and right share attribute ids (self-join) — " +
        "pass independently-built frames")
    org.apache.spark.sql.graft.DatasetBridge.ofRows(left.sparkSession,
      graft.plans.AsOfJoinPlan(lPlan, rPlan,
        Seq(attr(lPlan, leftKey)), attr(lPlan, leftTime),
        Seq(attr(rPlan, rightKey)), attr(rPlan, rightTime),
        valueCols.map(attr(rPlan, _)), forward))
  }
}
