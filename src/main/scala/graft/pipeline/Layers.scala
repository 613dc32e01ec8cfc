package graft.pipeline

import java.time.{Instant, ZoneId}
import java.time.format.DateTimeFormatter

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Medallion-layer path conventions and latest-run discovery.
  *
  * Reference:
  *  - run-stamped folder naming `brewery_data_{yyyy-MM-dd-HH-mm}` in
  *    America/Sao_Paulo local time
  *    (`/root/reference/dags/fetch_data_with_meta_from_api.py:15,29,34`)
  *  - latest-bronze discovery = newest `brewery_data*` folder containing
  *    `.csv` files (`…/data_transformations_bronze_to_silver.py:52-63`)
  *  - latest-silver discovery = newest folder containing a `_SUCCESS`
  *    marker (`…/gold_data_aggregation.py:19-30`)
  *
  * Uses Hadoop `FileSystem` (not `java.io`) so the same code runs on local
  * FS, HDFS, or object stores on a real cluster. Discovery is driver-side
  * metadata work, never a DataFrame job (SURVEY.md §2.5 row 14).
  */
object Layers {

  /** Reference timezone (`fetch_data_with_meta_from_api.py:15`). Folder
    * naming is explicit-zone `java.time`, never session-TZ dependent. */
  val RunZone: ZoneId = ZoneId.of("America/Sao_Paulo")

  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd-HH-mm")

  val RunPrefix = "brewery_data"

  def runFolderName(ts: Instant): String =
    s"${RunPrefix}_${fmt.format(ts.atZone(RunZone))}"

  def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Newest `brewery_data*` run folder under `layerDir` accepted by
    * `accept`; folder names sort chronologically so lexicographic
    * descending = newest first (reference `folders.sort(reverse=True)`). */
  private def latestRun(spark: SparkSession, layerDir: String)(
      accept: (FileSystem, Path) => Boolean): Option[Path] = {
    val hfs = fs(spark, layerDir)
    val base = new Path(layerDir)
    if (!hfs.exists(base)) return None
    hfs.listStatus(base).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(RunPrefix))
      .sortBy(_.getPath.getName)(Ordering[String].reverse)
      .collectFirst { case s if accept(hfs, s.getPath) => s.getPath }
  }

  /** Latest bronze run: newest folder containing at least one `.csv`
    * (`…bronze_to_silver.py:52-63`). */
  def latestBronzeRun(spark: SparkSession, bronzeDir: String): Option[Path] =
    latestRun(spark, bronzeDir) { (hfs, p) =>
      hfs.listStatus(p).exists(f => f.isFile && f.getPath.getName.endsWith(".csv"))
    }

  /** Latest completed parquet run: newest folder with a `_SUCCESS` marker
    * (`gold_data_aggregation.py:26-30`) — write-completeness gating. */
  def latestSuccessfulRun(spark: SparkSession, layerDir: String): Option[Path] =
    latestRun(spark, layerDir) { (hfs, p) => hfs.exists(new Path(p, "_SUCCESS")) }
}
