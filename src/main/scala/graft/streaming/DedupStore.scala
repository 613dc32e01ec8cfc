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
  * commutative (min(keep_id), sum(n_copies)), so the final state is
  * independent of batch boundaries and file order; with the whole
  * corpus drained it EQUALS the batch exact-dedup (d01) — which is
  * what the st07 oracle certifies.
  *
  * Scale design — partitioned versions: every version is laid out as
  * `bucket=<pmod(xxhash64(text), nBuckets)>` subdirectories, and a
  * batch MERGES ONLY THE BUCKETS IT TOUCHES: the Spark job reads the
  * base restricted to touched buckets (directory-level partition
  * pruning), shuffles and writes touched buckets only, and untouched
  * bucket directories carry forward into the new version as hard
  * links (copy fallback) — the q59 dynamic-partition-overwrite idiom
  * applied to a versioned store, with the version boundary preserving
  * the replay-idempotency contract that a plain dynamic overwrite
  * would break. Per-batch merge cost is therefore ∝ the store fraction
  * the batch touches (small batches against a large store with
  * proportionally sized nBuckets touch few buckets), not O(store) —
  * the property a Delta/Iceberg MERGE gives via file-level pruning,
  * reproduced here on plain parquet. Commit ordering is crash-safe:
  * the version's `_SUCCESS` is created only after both the written and
  * the carried-forward buckets are in place.
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
    * store O(batches × size), so drop it at commit time. Hard-linked
    * carry-forward files survive deletion of their source version (a
    * link is the same inode, not a reference). */
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
    * marker exists, so a half-written version from a mid-write crash
    * can never become a merge base or a read target. (The marker is
    * OURS, created after carry-forward links land — not the Spark
    * committer's, which would mark the version complete before the
    * untouched buckets exist.) */
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

  /** The store's persisted bucket layout (`_LAYOUT` at the store root):
    * written on first use, ADOPTED on every later run — a store drained
    * with nBuckets=16 and reopened with nBuckets=8 would hash the same
    * text into a DIFFERENT bucket, duplicating its row across buckets
    * and silently splitting n_copies. The stored layout wins; the
    * parameter only sizes a fresh store. */
  private def layoutBuckets(storeDir: String, requested: Int): Int = {
    val f = new java.io.File(storeDir, "_LAYOUT")
    if (f.isFile) {
      new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8).trim.toInt
    } else {
      new java.io.File(storeDir).mkdirs()
      java.nio.file.Files.write(f.toPath,
        requested.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      requested
    }
  }

  /** Hard-link `src` into `dst` (same inode — zero data movement, and
    * retention-safe: deleting the source version later leaves the link
    * intact); copy when the filesystem refuses links. */
  private def linkOrCopy(src: java.nio.file.Path, dst: java.nio.file.Path): Unit =
    try { java.nio.file.Files.createLink(dst, src); () }
    catch {
      case _: UnsupportedOperationException | _: java.io.IOException =>
        java.nio.file.Files.copy(src, dst,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING); ()
    }

  /** Drain `docs` (a streaming frame with doc_id, text) into the store
    * and return the final deduplicated state. `nBuckets` sets the
    * partition granularity: batches rewrite only the buckets they
    * touch, so size it so a typical batch touches a minority of
    * buckets (at corpus scale: store_size / target_partition_size). */
  def run(spark: SparkSession, docs: DataFrame,
          storeDir: String, ckptDir: String, nBuckets: Int = 16): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be positive, got $nBuckets")
    val tuned = Seq(
      // no watermark/stateful operator here: a no-data batch would only
      // re-link the whole store into a duplicate version
      "spark.sql.streaming.noDataMicroBatches.enabled" -> "false",
      "spark.sql.streaming.checkpoint.fileChecksum.enabled" -> "false")
    val prev = tuned.map { case (k, _) => k -> spark.conf.getOption(k) }
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val mergeBatch: (DataFrame, Long) => Unit = (batch, batchId) => {
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          // the store's committed layout wins over the parameter (see
          // layoutBuckets) — re-resolved per batch so a store created
          // by an earlier run of this query is never re-hashed
          val buckets = layoutBuckets(storeDir, nBuckets)
          // cached: consumed twice per batch (touched-bucket collect +
          // the merge job), and re-aggregating the batch for each would
          // double the batch-side work; released before the batch ends
          val incoming = batch
            .groupBy(col("text"))
            .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
            .withColumn("bucket",
              pmod(xxhash64(col("text")), lit(buckets.toLong)).cast("int"))
            .cache()
          try {
          // merge base: newest version with id < batchId (idempotent
          // under checkpoint replay — see baseFor)
          val base = baseFor(storeDir, batchId)
          // the buckets this batch touches — a ≤ nBuckets-row collect
          val touched = incoming.select(col("bucket")).distinct()
            .collect().map(_.getInt(0)).toSet
          // partition discovery exposes `bucket`; the isin filter
          // prunes untouched bucket DIRECTORIES out of the scan, so
          // the job reads only the store fraction it rewrites
          val mergeInput = base match {
            case Some(prevVersion) =>
              s.read.parquet(prevVersion)
                .filter(col("bucket").isin(touched.toSeq: _*))
                .unionByName(incoming)
            case None => incoming
          }
          // ONE shuffle, bucket-keyed: HashPartitioning(bucket) satisfies
          // the (bucket, text) clustering the aggregate requires (subset
          // rule), so the groupBy reuses the repartition exchange instead
          // of adding its own — and the bucket-aligned output means the
          // partitionBy write emits ONE file per bucket per version, not
          // O(shuffle partitions × buckets) slivers (the compaction
          // anti-pattern q52 exists to undo). At scale, size nBuckets so
          // one bucket ≈ one target file.
          val merged = mergeInput.repartition(col("bucket"))
            .groupBy(col("bucket"), col("text"))
            .agg(min(col("keep_id")).as("keep_id"),
              sum(col("n_copies")).as("n_copies"))
          // stage the touched buckets, then assemble the version:
          // staged buckets move in, untouched buckets hard-link from
          // the base, and OUR _SUCCESS lands last (crash before it →
          // the version never counts and a replay rebuilds it)
          val staging = new java.io.File(storeDir, s".staging_v$batchId")
          merged.write.mode("overwrite").partitionBy("bucket")
            .parquet(staging.getAbsolutePath)
          val vDir = new java.io.File(storeDir, s"v$batchId")
          if (vDir.exists()) deleteRecursively(vDir) // uncommitted leftover
          vDir.mkdirs()
          Option(staging.listFiles()).getOrElse(Array.empty)
            .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
            .foreach { b =>
              java.nio.file.Files.move(b.toPath,
                new java.io.File(vDir, b.getName).toPath); ()
            }
          base.foreach { prevVersion =>
            new java.io.File(prevVersion).listFiles()
              .filter(f => f.isDirectory && f.getName.startsWith("bucket=") &&
                !touched.contains(f.getName.stripPrefix("bucket=").toInt))
              .foreach { b =>
                val dst = new java.io.File(vDir, b.getName)
                dst.mkdirs()
                Option(b.listFiles()).getOrElse(Array.empty)
                  .filter(f => f.isFile && !f.getName.startsWith(".") &&
                    !f.getName.startsWith("_"))
                  .foreach(f => linkOrCopy(f.toPath,
                    new java.io.File(dst, f.getName).toPath))
              }
          }
          deleteRecursively(staging)
          new java.io.File(vDir, "_SUCCESS").createNewFile()
          prune(storeDir, batchId)
          // finally: a failed batch (IOException in move/link) must not
          // leave the cached batch aggregate pinned in the shared
          // session after run() rethrows — the stateless house rule
          } finally incoming.unpersist()
        }
      }
      val q = docs.writeStream
        .foreachBatch(mergeBatch)
        .option("checkpointLocation", ckptDir)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      latest(storeDir)
        .map(spark.read.parquet(_).select("text", "keep_id", "n_copies"))
        .getOrElse(spark.createDataFrame(
          new java.util.ArrayList[Row](), STORE_SCHEMA))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
