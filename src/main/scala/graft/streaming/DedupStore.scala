package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Incremental exact-dedup STORE maintained with `foreachBatch` — the
  * merge-on-arrival ingestion pattern: each micro-batch of documents
  * folds into a persistent (text, keep_id, n_copies) store, so the
  * corpus stays deduplicated AS it is ingested instead of via periodic
  * full-corpus rebuilds. `foreachBatch` is the Structured Streaming
  * escape hatch for sinks/merges the built-in sinks can't express —
  * here an aggregate-merge-rewrite (a transactional MERGE INTO where a
  * table format provides one).
  *
  * The store is versioned (`v<batchId>` subdirs): each batch writes a
  * NEW version from (previous version ∪ batch), so a reader never
  * observes a half-written store, and checkpoint recovery resumes from
  * the last committed version — the poor-man's snapshot isolation on
  * plain parquet. The merge is associative and commutative
  * (min(keep_id), sum(n_copies)), so the final state is independent of
  * batch boundaries and file order; with the whole corpus drained it
  * EQUALS the batch exact-dedup (d01) — which is what the st07 oracle
  * certifies.
  *
  * At 100 TB the per-batch rewrite cost is the store's size, which is
  * why the real system swaps the version-rewrite for a Delta/Iceberg
  * MERGE — the foreachBatch shape (idempotent by batchId, bounded
  * per-batch work) is exactly what those sinks require.
  */
object DedupStore {

  private def versions(storeDir: String): Seq[java.io.File] = {
    val d = new java.io.File(storeDir)
    Option(d.listFiles())
      .map(_.toSeq.filter(f => f.isDirectory && f.getName.startsWith("v")))
      .getOrElse(Seq.empty)
  }

  /** Latest committed store version, if any. */
  private def latest(storeDir: String): Option[String] =
    versions(storeDir).sortBy(_.getName.drop(1).toLong).lastOption
      .map(_.getAbsolutePath)

  /** Drain `docs` (a streaming frame with doc_id, text) into the store
    * and return the final deduplicated state. */
  def run(spark: SparkSession, docs: DataFrame,
          storeDir: String, ckptDir: String): DataFrame = {
    val tuned = Seq(
      "spark.sql.streaming.noDataMicroBatches.enabled" -> "true",
      "spark.sql.streaming.checkpoint.fileChecksum.enabled" -> "false")
    val prev = tuned.map { case (k, _) => k -> spark.conf.getOption(k) }
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val mergeBatch: (DataFrame, Long) => Unit = (batch, batchId) => {
        val s = batch.sparkSession
        val incoming = batch
          .groupBy(col("text"))
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        val merged = latest(storeDir) match {
          case Some(prevVersion) =>
            s.read.parquet(prevVersion).unionByName(incoming)
              .groupBy(col("text"))
              .agg(min(col("keep_id")).as("keep_id"),
                sum(col("n_copies")).as("n_copies"))
          case None => incoming
        }
        merged.write.mode("overwrite").parquet(s"$storeDir/v$batchId")
      }
      val q = docs.writeStream
        .foreachBatch(mergeBatch)
        .option("checkpointLocation", ckptDir)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      latest(storeDir).map(spark.read.parquet(_))
        .getOrElse(spark.emptyDataFrame)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
