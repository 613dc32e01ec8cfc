package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  * One parquet file per table under `$dir/` — mirrors the reference's
  * schema-on-read parquet source (`/root/reference/dags/gold_data_aggregation.py:47`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark's vectorized reader
    // rejects; read it as epoch-nanos long and convert with [[eventTime]].
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** events.ts (epoch nanos, long) -> microsecond timestamp.
    * DuckDB equivalent: `CAST(ts AS TIMESTAMP)` (ns->us truncation).
    * Must be INTEGER division: `/` on longs is double division, and
    * epoch-nanos (~1.7e18) exceeds 2^53, so the double path lands 1 µs
    * off for a fraction of rows. */
  def eventTime(tsNanos: Column): Column =
    timestamp_micros(ColumnBridge.column(
      IntegralDivide(ColumnBridge.expression(tsNanos), Literal(1000L))))

  /** First row's first column as a Long, None when the frame is empty
    * or the value is NULL (e.g. an aggregate over zero rows). The
    * shared null-safe scalar extraction for derive-from-data sizing
    * (compaction targets, sketch capacities). */
  private[graft] def firstLongOption(df: DataFrame): Option[Long] =
    df.head(1).headOption.filterNot(_.isNullAt(0)).map(_.getLong(0))
}
