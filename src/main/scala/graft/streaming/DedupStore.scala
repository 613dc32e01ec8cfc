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
  * The store is versioned (`v<batchId>` subdirs, committed iff their
  * `_SUCCESS` marker exists): batch N writes a NEW version from
  * (newest version with id < N) ∪ batch, so a reader never observes a
  * half-written store and a checkpoint REPLAY of batch N rebuilds vN
  * from N's original base instead of double-counting into a version
  * that already contains it — the poor-man's snapshot isolation +
  * idempotent MERGE on plain parquet. The merge is associative and
  * commutative
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

  /** Store schema — also the shape run() returns when no batch ever
    * commits, so downstream selects resolve against an empty result. */
  private[graft] val STORE_SCHEMA: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("keep_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_copies",
        org.apache.spark.sql.types.LongType)))

  /** Retention: after vN commits, only vN and its merge base (the
    * newest committed version below N) are ever read again — vN is the
    * read target, the base is what a checkpoint REPLAY of batch N would
    * re-merge from. Everything older is dead weight that would grow the
    * store O(batches × size), so drop it at commit time. */
  private def prune(storeDir: String, batchId: Long): Unit = {
    val committed = versions(storeDir).map(_._1).filter(_ <= batchId)
    val keep: Set[Long] =
      committed.filter(_ < batchId).sorted.lastOption.toSet + batchId
    versions(storeDir)
      .filter { case (id, _) => id <= batchId && !keep.contains(id) }
      .foreach { case (_, dir) => deleteRecursively(dir) }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  /** Committed versions only: a `v<id>` dir counts once its `_SUCCESS`
    * marker exists (Spark's committer writes it at job commit), so a
    * half-written version from a mid-write crash can never become a
    * merge base or a read target. */
  private def versions(storeDir: String): Seq[(Long, java.io.File)] = {
    val d = new java.io.File(storeDir)
    Option(d.listFiles())
      .map(_.toSeq
        .filter(f => f.isDirectory && f.getName.startsWith("v") &&
          new java.io.File(f, "_SUCCESS").isFile)
        .map(f => f.getName.drop(1).toLong -> f))
      .getOrElse(Seq.empty)
  }

  /** Latest committed store version, if any. */
  private[graft] def latest(storeDir: String): Option[String] =
    versions(storeDir).sortBy(_._1).lastOption.map(_._2.getAbsolutePath)

  /** Newest committed version STRICTLY BEFORE `batchId` — the merge
    * base for that batch. Using latest() would double-count on
    * checkpoint replay: if batch N committed its version but the
    * streaming checkpoint didn't record N before a crash, N is
    * re-delivered and must merge from N's ORIGINAL base, not from the
    * version that already contains N. */
  private[graft] def baseFor(storeDir: String, batchId: Long): Option[String] =
    versions(storeDir).filter(_._1 < batchId)
      .sortBy(_._1).lastOption.map(_._2.getAbsolutePath)

  /** Drain `docs` (a streaming frame with doc_id, text) into the store
    * and return the final deduplicated state. */
  def run(spark: SparkSession, docs: DataFrame,
          storeDir: String, ckptDir: String): DataFrame = {
    val tuned = Seq(
      // no watermark/stateful operator here: a no-data batch would only
      // rewrite the whole store into a duplicate version
      "spark.sql.streaming.noDataMicroBatches.enabled" -> "false",
      "spark.sql.streaming.checkpoint.fileChecksum.enabled" -> "false")
    val prev = tuned.map { case (k, _) => k -> spark.conf.getOption(k) }
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val mergeBatch: (DataFrame, Long) => Unit = (batch, batchId) => {
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          val incoming = batch
            .groupBy(col("text"))
            .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
          // merge base: newest version with id < batchId (idempotent
          // under checkpoint replay — see baseFor)
          val merged = baseFor(storeDir, batchId) match {
            case Some(prevVersion) =>
              s.read.parquet(prevVersion).unionByName(incoming)
                .groupBy(col("text"))
                .agg(min(col("keep_id")).as("keep_id"),
                  sum(col("n_copies")).as("n_copies"))
            case None => incoming
          }
          merged.write.mode("overwrite").parquet(s"$storeDir/v$batchId")
          prune(storeDir, batchId)
        }
      }
      val q = docs.writeStream
        .foreachBatch(mergeBatch)
        .option("checkpointLocation", ckptDir)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      latest(storeDir).map(spark.read.parquet(_))
        .getOrElse(spark.createDataFrame(
          new java.util.ArrayList[Row](), STORE_SCHEMA))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
