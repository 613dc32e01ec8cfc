package graft.pipeline

import java.time.Instant

import org.apache.spark.sql.SparkSession

/** The sequential 3-stage driver replacing the reference's Airflow DAG
  * chain fetch → silver → gold (`TriggerDagRunOperator`, ALL_SUCCESS —
  * `/root/reference/dags/fetch_data_with_meta_from_api.py:102-108`,
  * `…bronze_to_silver.py:135-141`; SURVEY.md §2.8). Each stage returns the
  * path it wrote; failure = exception = chain stops, exactly the
  * ALL_SUCCESS trigger-rule semantics.
  *
  * Usage: `runMain graft.pipeline.Main <dataDir> [nRows]`
  * (offline [[SampleFetcher]]; swap an HTTP fetcher in production).
  */
object Main {
  def main(args: Array[String]): Unit = {
    val dataDir = args.headOption.getOrElse("/tmp/graft_medallion")
    val nRows = args.lift(1).map(_.toInt).getOrElse(450)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-medallion")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val now = Instant.now()
      val bronze = Ingest.ingest(spark, new SampleFetcher(nRows), s"$dataDir/bronze", now)
      println(s"[bronze] $bronze")
      val silver = Silver.run(spark, s"$dataDir/bronze", s"$dataDir/silver", now)
      println(s"[silver] $silver")
      val gold = Gold.run(spark, s"$dataDir/silver", s"$dataDir/gold", now)
      println(s"[gold]   $gold")
      spark.table(s"global_temp.${Gold.ViewName}")
        .orderBy("brewery_count").show(5, truncate = false)
    } finally spark.stop()
  }
}
