package graft.pipeline

import java.io.{BufferedWriter, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.time.Instant

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** EP1 — paginated REST ingestion → bronze CSV.
  *
  * Reference: `/root/reference/dags/fetch_data_with_meta_from_api.py`
  *  - meta probe drives page count (`:18-23`), `per_page=200` (`:37`)
  *  - page loop `1..ceil(total/per_page)` (`:40`)
  *  - one header-bearing CSV per page in a run-stamped folder (`:47-76`)
  *  - completeness invariant: #files == ceil(total/per_page)
  *    (`README.md:84`)
  *
  * The fetcher is injected (no egress at test time — SURVEY.md §7.4.7).
  * Two execution modes:
  *  - [[ingest]]: driver-side loop, byte-parity with the reference (the
  *    realistic mode for a 10^4-row API).
  *  - [[ingestDistributed]]: the 100 TB-scale path — pages fan out across
  *    executors via `spark.range(numPages)` + `mapPartitions`, so ingestion
  *    bandwidth scales with the cluster instead of the driver NIC.
  */
object Ingest {

  /** The one fixed schema in the system: 16 nullable strings
    * (`fetch_data_with_meta_from_api.py:53-70`; explicit StructType at
    * `spark_fetch.py:33-50`). */
  val header: Seq[String] = Seq(
    "id", "name", "brewery_type", "street", "address_1", "address_2",
    "address_3", "city", "state_province", "postal_code", "country",
    "longitude", "latitude", "phone", "website_url", "state")

  val schema: StructType =
    StructType(header.map(StructField(_, StringType, nullable = true)))

  val PerPage = 200

  /** Page-count math, exactly the reference's
    * `total // per_page + (total % per_page > 0)` (`fetch…:40`). */
  def pageCount(total: Int, perPage: Int = PerPage): Int =
    total / perPage + (if (total % perPage > 0) 1 else 0)

  /** A page source: `total()` mirrors the meta probe; `page(n)` one
    * GET. Implementations over HTTP use [[HttpFetcher]]; tests inject a
    * stub. Serializable so [[ingestDistributed]] can ship it to
    * executors. */
  trait Fetcher extends Serializable {
    def total(): Int
    def page(n: Int, perPage: Int): Seq[Map[String, String]]
  }

  /** Per-page progress callback — the analog of the reference's XCom
    * push `{'page': n, 'total': total}` per fetched page
    * (`fetch_data_with_meta_from_api.py:78-81`). Serializable: in
    * [[ingestDistributed]] it fires on executors (progress lands in
    * executor logs; the driver-side count arrives via a named
    * accumulator, visible in the Spark UI). */
  trait ProgressListener extends Serializable {
    def pageFetched(page: Int, total: Int): Unit
  }

  /** Default listener: one structured log line per page. */
  object LogProgress extends ProgressListener {
    override def pageFetched(page: Int, total: Int): Unit =
      // scalastyle:off println — operational progress, reference parity
      println(s"""[ingest] progress {"page":$page,"total":$total}""")
  }

  /** Minimal CSV quoting matching Python's `csv.writer` QUOTE_MINIMAL
    * (`fetch…:49,76`): quote only fields containing delimiter/quote/CR/LF,
    * escape `"` by doubling; None/null → empty field. */
  private[pipeline] def csvLine(fields: Seq[String]): String =
    fields.map { f =>
      val v = if (f == null) "" else f
      if (v.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
        "\"" + v.replace("\"", "\"\"") + "\""
      else v
    }.mkString(",")

  /** Driver-side ingest (reference-parity). Returns the bronze run dir. */
  def ingest(spark: SparkSession, fetcher: Fetcher, bronzeDir: String,
             runTs: Instant, perPage: Int = PerPage,
             progress: ProgressListener = LogProgress): String = {
    val total = fetcher.total()
    val pages = pageCount(total, perPage)
    val runDir = new Path(bronzeDir, Layers.runFolderName(runTs))
    val hfs = Layers.fs(spark, bronzeDir)
    hfs.mkdirs(runDir)
    for (n <- 1 to pages) {
      val rows = fetcher.page(n, perPage)
      val out = hfs.create(new Path(runDir, s"brewery_data_$n.csv"), true)
      val w = new BufferedWriter(new OutputStreamWriter(out, StandardCharsets.UTF_8))
      try {
        w.write(csvLine(header)); w.write("\r\n") // python csv default line terminator
        rows.foreach { r =>
          w.write(csvLine(header.map(k => r.getOrElse(k, null)))); w.write("\r\n")
        }
      } finally w.close()
      progress.pageFetched(n, total) // XCom-parity: after the page lands
    }
    assertComplete(spark, runDir.toString, total, perPage)
    runDir.toString
  }

  /** Distributed ingest: page fan-out over executors, single partitioned
    * CSV dataset out (still header-bearing, glob-compatible with the
    * silver reader). */
  def ingestDistributed(spark: SparkSession, fetcher: Fetcher,
                        bronzeDir: String, runTs: Instant,
                        perPage: Int = PerPage,
                        progress: ProgressListener = LogProgress): String = {
    val total = fetcher.total()
    val pages = pageCount(total, perPage)
    val runDir = new Path(bronzeDir, Layers.runFolderName(runTs)).toString
    val parallelism = math.min(pages, spark.sparkContext.defaultParallelism)
    val pagesFetched = spark.sparkContext.longAccumulator("ingest_pages_fetched")
    val rows: org.apache.spark.rdd.RDD[Row] = spark.range(1, pages + 1L)
      .repartition(math.max(parallelism, 1))
      .rdd.mapPartitions { pageNums =>
        pageNums.flatMap { n =>
          val fetched = fetcher.page(n.toInt, perPage)
          pagesFetched.add(1)
          progress.pageFetched(n.toInt, total)
          fetched.map(r => Row.fromSeq(header.map(k => r.getOrElse(k, null))))
        }
      }
    spark.createDataFrame(rows, schema)
      .write.option("header", true)
      // Spark's CSV writer trims whitespace by default; keep raw bytes so
      // dirty values like " United States" survive to bronze (the silver
      // layer is where cleansing happens — parity with python csv.writer)
      .option("ignoreLeadingWhiteSpace", false)
      .option("ignoreTrailingWhiteSpace", false)
      .mode("overwrite").csv(runDir)
    val written = spark.read.option("header", true).csv(s"$runDir/*.csv").count()
    require(written == total,
      s"ingestion completeness violated: wrote $written rows, expected $total")
    // >= not ==: accumulators in transformations may over-count under
    // task retry/speculation on a real cluster; the row-count check above
    // is the exact completeness gate
    require(pagesFetched.value >= pages,
      s"page-progress mismatch: fetched ${pagesFetched.value} of $pages pages")
    runDir
  }

  /** Completeness invariant (`README.md:84`): one CSV per page. */
  def assertComplete(spark: SparkSession, runDir: String, total: Int,
                     perPage: Int = PerPage): Unit = {
    val hfs = Layers.fs(spark, runDir)
    val nFiles = hfs.listStatus(new Path(runDir))
      .count(f => f.isFile && f.getPath.getName.endsWith(".csv"))
    val expected = pageCount(total, perPage)
    require(nFiles == expected,
      s"ingestion completeness violated: $nFiles csv files, expected $expected " +
        s"(total=$total, per_page=$perPage)")
  }
}
