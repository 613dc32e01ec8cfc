package graft

import java.nio.file.Files
import java.time.Instant

import org.apache.spark.sql.functions._

import graft.pipeline.{Gold, Ingest, Layers, SampleFetcher, Silver}

/** End-to-end medallion pipeline test: stubbed ingest → bronze CSV →
  * silver cleanse → gold counts, plus latest-run discovery, `_SUCCESS`
  * gating, and the ingestion completeness invariant (SURVEY.md §5). */
class PipelineSpec extends SparkSpec {

  private lazy val root = Files.createTempDirectory("graft_pipeline").toString
  private val t0 = Instant.parse("2026-08-12T10:00:00Z")
  private val t1 = Instant.parse("2026-08-12T11:00:00Z")

  test("bronze: ingest writes one CSV per page + completeness invariant") {
    val fetcher = new SampleFetcher(450)
    val runDir = Ingest.ingest(spark, fetcher, s"$root/bronze", t0, perPage = 200)
    val files = new java.io.File(runDir).listFiles().filter(_.getName.endsWith(".csv"))
    assert(files.length == 3) // ceil(450/200)
    // re-read with the silver reader: row count preserved
    val back = spark.read.option("header", true).csv(s"$runDir/*.csv")
    assert(back.count() == 450)
    assert(back.columns.toSeq == Ingest.header)
    // nulls round-trip as nulls through empty CSV fields
    assert(back.filter(col("address_2").isNull).count() == 450)
  }

  test("completeness invariant rejects a short run") {
    val fetcher = new SampleFetcher(450)
    val runDir = Ingest.ingest(spark, fetcher, s"$root/bronze_bad", t0, perPage = 200)
    new java.io.File(s"$runDir/brewery_data_3.csv").delete()
    intercept[IllegalArgumentException] {
      Ingest.assertComplete(spark, runDir, total = 450, perPage = 200)
    }
  }

  test("latest-run discovery picks newest folder with CSVs") {
    // older run t0 already exists; write a newer run t1
    Ingest.ingest(spark, new SampleFetcher(100), s"$root/bronze", t1, perPage = 200)
    val latest = Layers.latestBronzeRun(spark, s"$root/bronze").get
    assert(latest.getName == Layers.runFolderName(t1))
    // an empty newer folder is skipped
    val t2name = Layers.runFolderName(Instant.parse("2026-08-12T12:00:00Z"))
    new java.io.File(s"$root/bronze/$t2name").mkdirs()
    assert(Layers.latestBronzeRun(spark, s"$root/bronze").get.getName ==
      Layers.runFolderName(t1))
  }

  test("silver: cleanse + partitioned write") {
    val silverRun = Silver.run(spark, s"$root/bronze", s"$root/silver", t1)
    val silver = spark.read.parquet(silverRun)
    assert(silver.count() == 100) // row count preserved (t1 run had 100 rows)
    assert(silver.columns.sorted.toSeq == Silver.columns.sorted)
    // partition layout country=/state=
    val dirs = new java.io.File(silverRun).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("country=")))
    // cleanse post-conditions on partition values
    val vals = silver.select("city", "state", "country").distinct().collect()
    vals.foreach { r =>
      Seq(r.getString(0), r.getString(1), r.getString(2)).filter(_ != null).foreach { v =>
        assert(!v.exists(_.isUpper), s"uppercase survived: $v")
        assert(!v.contains(' '), s"space survived: $v")
        assert(!v.contains('�'), s"mojibake survived: $v")
        assert(!v.contains('_'), s"connector punct survived: $v")
      }
    }
    // specific goldens through the full pipeline
    assert(silver.filter(col("country") === "united-states").count() > 0)
    assert(silver.filter(col("city") === "sao-paulo").count() > 0)
    assert(silver.filter(col("city") === "munchen").count() > 0)
  }

  test("gold: _SUCCESS gating skips incomplete silver runs") {
    // fabricate a NEWER silver folder without _SUCCESS: must be skipped
    val fakeName = Layers.runFolderName(Instant.parse("2026-08-12T13:00:00Z"))
    val fake = new java.io.File(s"$root/silver/$fakeName")
    fake.mkdirs()
    val latest = Layers.latestSuccessfulRun(spark, s"$root/silver").get
    assert(latest.getName == Layers.runFolderName(t1))
  }

  test("gold: counts match a direct SQL GROUP BY on silver + view registered") {
    val goldRun = Gold.run(spark, s"$root/silver", s"$root/gold", t1)
    val gold = spark.read.parquet(goldRun)
    assert(gold.columns.sorted.toSeq ==
      Seq("brewery_count", "brewery_type", "country", "state"))
    val silverRun = Layers.latestSuccessfulRun(spark, s"$root/silver").get.toString
    val silver = spark.read.parquet(silverRun)
    // invariant: sum(brewery_count) == silver row count
    assert(gold.agg(sum("brewery_count")).head.getLong(0) == silver.count())
    // equals direct SQL GROUP BY
    silver.createOrReplaceTempView("silver_check")
    val direct = spark.sql(
      """SELECT brewery_type, country, state, COUNT(*) AS brewery_count
        |FROM silver_check GROUP BY 1, 2, 3""".stripMargin)
    assert(direct.exceptAll(gold.select("brewery_type", "country", "state", "brewery_count")).isEmpty)
    assert(gold.select("brewery_type", "country", "state", "brewery_count").exceptAll(direct).isEmpty)
    // global temp view is queryable
    assert(spark.table(s"global_temp.${Gold.ViewName}").count() == gold.count())
  }

  test("distributed ingest parity: same rows as driver-side ingest") {
    val fetcher = new SampleFetcher(450)
    val classicDir = Ingest.ingest(spark, fetcher, s"$root/bronze_classic", t0, perPage = 200)
    val distDir = Ingest.ingestDistributed(spark, fetcher, s"$root/bronze_dist", t0, perPage = 200)
    val dist = spark.read.option("header", true).csv(s"$distDir/*.csv")
    val classic = spark.read.option("header", true).csv(s"$classicDir/*.csv")
    assert(dist.count() == 450)
    assert(dist.exceptAll(classic).isEmpty && classic.exceptAll(dist).isEmpty)
  }

  test("distributed ingest drives the FULL chain: silver + gold over executor-fanned bronze") {
    // Main's --distributed path end to end (the 100 TB ingest shape must
    // not bit-rot behind the ingest-level parity check): bronze via
    // executor fan-out, then the same silver/gold stages the driver-loop
    // chain runs, landing on identical gold aggregates.
    val root2 = java.nio.file.Files.createTempDirectory("graft_dist_e2e").toString
    val t = Instant.parse("2026-08-12T15:00:00Z")
    Ingest.ingestDistributed(spark, new SampleFetcher(450), s"$root2/bronze", t)
    Silver.run(spark, s"$root2/bronze", s"$root2/silver", t)
    val goldRun = Gold.run(spark, s"$root2/silver", s"$root2/gold", t)
    val gold = spark.read.parquet(goldRun)
    // reference chain: same fetcher through the driver-loop ingest
    val rootC = java.nio.file.Files.createTempDirectory("graft_dist_ref").toString
    Ingest.ingest(spark, new SampleFetcher(450), s"$rootC/bronze", t)
    Silver.run(spark, s"$rootC/bronze", s"$rootC/silver", t)
    val refGold = spark.read.parquet(
      Gold.run(spark, s"$rootC/silver", s"$rootC/gold", t))
    assert(gold.agg(sum("brewery_count")).head.getLong(0) == 450L)
    // same aggregate content as the driver-loop pipeline's gold
    assert(gold.exceptAll(refGold).isEmpty && refGold.exceptAll(gold).isEmpty)
  }
}
