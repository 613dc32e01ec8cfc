package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time named queries k times in ONE JVM with Bench's exact
  * session configuration — the clean-box re-measure step the bench-drift
  * gate (scripts/bench_drift.py) prescribes before shipping or explaining
  * a per-query regression. Prints per-run wall times so warm-vs-cold and
  * run-to-run variance are visible (Bench's min-of-two hides both).
  * Usage: SPARK_GRAFT_CPUS=32 runMain graft.BenchOne <sfDir> <n1,n2,...> [k]
  * Not part of the driver contract. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val k = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try Bench.warmup(spark, sfDir) catch { case _: Throwable => () }
    spark.catalog.clearCache()
    names.foreach { n =>
      val times = (1 to k).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[benchone] $n: ${times.map(t => f"$t%.2f").mkString(" ")} s")
    }
    spark.stop()
  }
}
