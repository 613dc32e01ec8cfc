package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.{AdvancedQueries, CoreQueries, NorthStarQueries, ScaleJoinQueries, SourceFormatQueries, StreamMediaQueries, TrainingPrepQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All query families, each a (name, sparkFn, Option[duckdb oracle]) seq. */
  private def inventory: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    CoreQueries.all ++ NorthStarQueries.all ++ StreamMediaQueries.all ++
      AdvancedQueries.all ++ TrainingPrepQueries.all ++ SourceFormatQueries.all ++
      ScaleJoinQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Guards the fixture schemas first so drift (e.g. a re-encoded
    * events.ts) surfaces as ONE loud diagnostic here, not N scattered
    * query failures. */
  def entry(spark: SparkSession): DataFrame = {
    Fixtures.guard(spark, "/root/testdata/sf0.001")
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    inventory.map { case (n, fn, _) => n -> fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    inventory.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
