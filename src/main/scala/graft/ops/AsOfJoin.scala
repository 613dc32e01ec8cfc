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
    // tagged union: side 0 = right (visible at equal ts), side 1 = left
    val rightSide = right.select(
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
}
