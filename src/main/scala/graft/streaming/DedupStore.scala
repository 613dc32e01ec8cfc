package graft.streaming

import scala.math.Ordering.Implicits.infixOrderingOps

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
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
  * The store is versioned (`v<major>[.<sub>]` subdirs, committed iff
  * their `_SUCCESS` marker exists): batch N writes a NEW version from
  * (newest version with major < N) ∪ batch, so a reader never observes
  * a half-written store, and a checkpoint REPLAY of batch N is a no-op
  * when vN already committed (deterministic merge — the rebuilt version
  * would be byte-equal) — the poor-man's snapshot isolation + idempotent
  * MERGE on plain parquet. The merge is associative and commutative
  * (min(keep_id), sum(n_copies)), so the final state is independent of
  * batch boundaries and file order; with the whole corpus drained it
  * EQUALS the batch exact-dedup (d01) — which is what the st07 oracle
  * certifies. The `<sub>` component exists for [[purge]]: a targeted
  * delete commits a new version WITHOUT consuming a batch id, so it can
  * never collide with (and silently swallow) a future micro-batch.
  *
  * Scale design — partitioned versions with a per-version MANIFEST:
  * every version's data files live under `bucket=<pmod(xxhash64(text),
  * nBuckets)>` subdirectories, and a batch MERGES ONLY THE BUCKETS IT
  * TOUCHES: the merge job reads exactly the base files of touched
  * buckets (resolved through the base version's `_MANIFEST`), shuffles
  * and writes touched buckets only, and untouched buckets carry forward
  * BY REFERENCE — the new manifest simply points at the base version's
  * files, so carry-forward moves zero bytes on ANY filesystem. (The
  * round-6 design hard-linked untouched files into the new version; on
  * object stores — the actual 100 TB substrate — links don't exist and
  * the copy fallback silently restored O(store) per batch. A manifest is
  * how Delta/Iceberg get the same property, reproduced here on plain
  * parquet.) Per-batch merge cost is therefore ∝ the store fraction the
  * batch touches, not O(store). Commit ordering is crash-safe: the
  * manifest is written atomically (temp + ATOMIC_MOVE), and the
  * version's `_SUCCESS` lands last; retention keeps any version whose
  * files a live manifest still references.
  *
  * Deletion — [[purge]] + tombstones: a takedown rewrites ONLY the
  * victims' buckets into a new (major, sub+1) version and records the
  * victims' 64-bit text hashes under `_TOMBSTONES/`. Tombstones make
  * deletion survive REPLAY (a re-delivered batch re-merges victim texts
  * from source data; the merge filters them out) and suppress
  * re-ingestion of purged texts in future batches — the GDPR contract a
  * corpus store needs. The read path applies the same filter, so a
  * purge is logically complete the moment its tombstone file lands even
  * if the physical rewrite crashes mid-way.
  *
  * Single-writer contract: one drain OR purge at a time per store. The
  * streaming checkpoint already serializes drains; a purge must not
  * race a running drain (both commit versions and prune). Concurrent
  * READS are safe at any time — they resolve a committed version's
  * manifest, and retention never deletes files a committed manifest
  * still references.
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

  /** Version key: (major, sub). Micro-batch N commits (N, 0) as `vN`;
    * a purge on top of (m, s) commits (m, s+1) as `vm.<s+1>` — same
    * ordering position as its base batch, so [[baseFor]] (keyed on
    * majors) and the replay-skip check are unaffected by purges. */
  private[graft] type VKey = (Long, Int)

  private def dirName(k: VKey): String =
    if (k._2 == 0) s"v${k._1}" else s"v${k._1}.${k._2}"

  private def parseKey(name: String): Option[VKey] =
    if (!name.startsWith("v")) None
    else name.drop(1).split("\\.", 2) match {
      case Array(m) => m.toLongOption.map(_ -> 0)
      case Array(m, s) =>
        for (mj <- m.toLongOption; sb <- s.toIntOption) yield (mj, sb)
      case _ => None
    }

  /** Retention: after a version commits, the only LIVE manifests are
    * the commit's own and those of any version ordered after it (a
    * fresh-checkpoint replay rebuilds early majors while the real
    * latest still stands — its references must survive the rebuilds'
    * prunes). A separate "replay base" anchor is no longer needed: a
    * committed batch is never re-merged (run()'s replay fast path skips
    * it), so the only version a future batch reads is the newest one.
    * Versions survive exactly as long as a live manifest references
    * their files; everything else is dead weight that would grow the
    * store O(batches × size) — drop it.
    *
    * Retention is FILE-level, not just version-level: inside surviving
    * versions, data files no live manifest references are deleted too
    * (a referenced version's OWN manifest is history, not a liveness
    * root). This keeps storage at exactly the live byte set — and it is
    * what makes [[purge]]'s physical erasure IMMEDIATE: the superseded
    * victim-bucket files in older versions stop being referenced the
    * moment the purge version commits, so this sweep removes their
    * bytes in the same call, not at some later retention rotation. */
  private def prune(storeDir: String, current: VKey): Unit = {
    val all = versions(storeDir)
    val liveKeys = all.map(_._1).filter(_ >= current)
    val byKey = all.toMap
    val liveFiles: Set[java.io.File] = liveKeys.flatMap { k =>
      byKey.get(k).toSeq.flatMap(dir =>
        manifestEntries(storeDir, dir).map(_._2.getAbsoluteFile))
    }.toSet
    val referenced: Set[VKey] = liveFiles
      .flatMap(f => parseKey(f.getParentFile.getParentFile.getName))
    val keep = referenced ++ liveKeys
    all.filter { case (k, _) => k <= current && !keep.contains(k) }
      .foreach { case (_, dir) => deleteRecursively(dir) }
    // file-level sweep inside surviving versions at or below the
    // commit: drop data files no live manifest references (markers and
    // manifests stay — they are version metadata, not carried data;
    // versions ABOVE the commit are someone else's liveness roots)
    versions(storeDir).filter(_._1 <= current).foreach { case (_, dir) =>
      Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(b => b.isDirectory && b.getName.startsWith("bucket="))
        .foreach { b =>
          Option(b.listFiles()).getOrElse(Array.empty)
            .filter(f => f.isFile && !f.getName.startsWith(".") &&
              !f.getName.startsWith("_") &&
              !liveFiles.contains(f.getAbsoluteFile))
            .foreach(f => f.delete(): Unit)
          if (Option(b.listFiles()).exists(_.isEmpty)) b.delete(): Unit
        }
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  /** Committed versions only: a version dir counts once its `_SUCCESS`
    * marker exists, so a half-written version from a mid-write crash
    * can never become a merge base or a read target. (The marker is
    * OURS, created after the manifest lands — not the Spark committer's,
    * which would mark the version complete before the carried-forward
    * buckets are resolvable.) */
  private def versions(storeDir: String): Seq[(VKey, java.io.File)] = {
    val d = new java.io.File(storeDir)
    Option(d.listFiles())
      .map(_.toSeq
        .filter(f => f.isDirectory && new java.io.File(f, "_SUCCESS").isFile)
        .flatMap(f => parseKey(f.getName).map(_ -> f)))
      .getOrElse(Seq.empty)
  }

  /** Latest committed store version, if any. */
  private[graft] def latest(storeDir: String): Option[String] =
    versions(storeDir).sortBy(_._1).lastOption.map(_._2.getAbsolutePath)

  /** Newest committed version with major STRICTLY BEFORE `batchId` —
    * the merge base for that batch. Purge sub-versions of an earlier
    * major qualify (they carry that major's post-takedown state); the
    * batch's own (possibly purged) versions never do — a replay must
    * merge from the batch's ORIGINAL base, not from a version that
    * already contains it. */
  private[graft] def baseFor(storeDir: String, batchId: Long): Option[String] =
    versions(storeDir).filter(_._1._1 < batchId)
      .sortBy(_._1).lastOption.map(_._2.getAbsolutePath)

  // ---- manifest: bucket -> concrete data files (maybe in older versions) ---

  /** Parse a version's `_MANIFEST`: `<bucket>\t<relpath>` lines, paths
    * relative to the store root (so the store directory is relocatable
    * as a unit). A COMMITTED version without a manifest is refused
    * loudly: treating it as empty would read the store as vacant and
    * let the next commit's prune delete its (unreferenced-looking)
    * data — the silent-total-loss failure mode for a store written by
    * the pre-manifest layout or one whose manifest was lost. */
  private[graft] def manifestEntries(storeDir: String,
                                     vDir: java.io.File): Seq[(Int, java.io.File)] = {
    val mf = new java.io.File(vDir, "_MANIFEST")
    if (!mf.isFile) {
      if (new java.io.File(vDir, "_SUCCESS").isFile)
        throw new IllegalStateException(
          s"committed store version ${vDir.getAbsolutePath} has no " +
            "_MANIFEST — the store was written by an older (pre-manifest) " +
            "layout or the manifest was lost; rebuild the store or restore " +
            "the manifest before opening it with this version")
      Seq.empty
    } else {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.readAllLines(mf.toPath,
          java.nio.charset.StandardCharsets.UTF_8).asScala.toSeq
        .filter(_.nonEmpty)
        .map { line =>
          val Array(b, rel) = line.split("\t", 2)
          b.toInt -> new java.io.File(storeDir, rel)
        }
    }
  }

  /** Atomic manifest write (temp + ATOMIC_MOVE): readers and prune see
    * either the full manifest or none — never a truncated file list. */
  private def writeManifest(vDir: java.io.File,
                            entries: Seq[(Int, String)]): Unit = {
    val body = entries.sortBy(identity)
      .map { case (b, rel) => s"$b\t$rel" }.mkString("", "\n", "\n")
    val tmp = new java.io.File(vDir, "._MANIFEST.tmp")
    java.nio.file.Files.write(tmp.toPath,
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp.toPath,
      new java.io.File(vDir, "_MANIFEST").toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
  }

  /** Resolve a committed version to its concrete data files. */
  private def manifestFiles(storeDir: String, versionPath: String): Seq[(Int, java.io.File)] =
    manifestEntries(storeDir, new java.io.File(versionPath))

  /** Read a committed version through its manifest, tombstone-filtered
    * (see [[loadTombstones]] — normally a no-op; it matters when a
    * purge's tombstones committed but its physical rewrite crashed). */
  private def readVersion(spark: SparkSession, storeDir: String,
                          versionPath: String): DataFrame = {
    val files = manifestFiles(storeDir, versionPath).map(_._2.getAbsolutePath)
    if (files.isEmpty) emptyStore(spark)
    else withoutTombstoned(spark, storeDir,
      spark.read.parquet(files: _*).select("text", "keep_id", "n_copies"))
  }

  private def emptyStore(spark: SparkSession): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[Row](), STORE_SCHEMA)

  // ---- tombstones: purged text hashes that must never resurrect ------------

  /** All tombstoned xxhash64(text) values (one decimal per line across
    * the files under `_TOMBSTONES/`). Hashes, not texts: a deletion
    * marker that stored the deleted content would defeat the point.
    * 64-bit collisions could suppress an innocent text (~n·2⁻⁶⁴ —
    * negligible for bounded takedown lists, and the documented trade). */
  private[graft] def loadTombstones(storeDir: String): Seq[Long] = {
    val d = new java.io.File(storeDir, "_TOMBSTONES")
    import scala.jdk.CollectionConverters._
    // dot-files are in-flight writes (.tN.tmp) — a truncated hash line
    // in one could parse as a WRONG hash, so only committed files count
    Option(d.listFiles())
      .map(_.toSeq.filter(f => f.isFile && !f.getName.startsWith("."))
      .flatMap(f => java.nio.file.Files.readAllLines(f.toPath,
          java.nio.charset.StandardCharsets.UTF_8).asScala
        .flatMap(_.trim.toLongOption))
      .distinct).getOrElse(Seq.empty)
  }

  /** Drop tombstoned texts from `df` (broadcast anti-join on the text
    * hash — bounded takedown lists stay a sub-MB broadcast; an isin
    * literal list would bloat codegen past a few hundred entries). */
  private def withoutTombstoned(spark: SparkSession, storeDir: String,
                                df: DataFrame): DataFrame = {
    val tombs = loadTombstones(storeDir)
    if (tombs.isEmpty) df
    else {
      val tdf = spark.createDataset(tombs)(Encoders.scalaLong).toDF("__thash")
      df.withColumn("__thash", xxhash64(col("text")))
        .join(broadcast(tdf), Seq("__thash"), "left_anti")
        .drop("__thash")
    }
  }

  /** The store's persisted bucket layout (`_LAYOUT` at the store root):
    * written on first use, ADOPTED on every later run — a store drained
    * with nBuckets=16 and reopened with nBuckets=8 would hash the same
    * text into a DIFFERENT bucket, duplicating its row across buckets
    * and silently splitting n_copies. The stored layout wins; the
    * parameter only sizes a fresh store. */
  private def layoutBuckets(storeDir: String, requested: Int): Int = {
    val f = new java.io.File(storeDir, "_LAYOUT")
    if (f.isFile) {
      val raw = new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8).trim
      raw.toIntOption.filter(_ >= 1) match {
        case Some(n) => n
        case None if versions(storeDir).isEmpty =>
          // truncated/corrupt marker with nothing committed: no version
          // was hashed under it, so the requested layout can safely
          // replace it instead of bricking the store
          writeLayout(f, requested); requested
        case None => throw new IllegalStateException(
          s"corrupt _LAYOUT marker '$raw' at ${f.getAbsolutePath} with " +
            "committed versions present — restore the marker to the bucket " +
            "count the committed versions were hashed with (count the " +
            "bucket= dirs in the newest v* directory)")
      }
    } else {
      new java.io.File(storeDir).mkdirs()
      writeLayout(f, requested)
      requested
    }
  }

  /** Atomic marker write: temp file + ATOMIC_MOVE, so a crash mid-write
    * can never leave a truncated marker that later runs fail to parse. */
  private def writeLayout(f: java.io.File, n: Int): Unit = {
    val tmp = new java.io.File(f.getParentFile, s".${f.getName}.tmp")
    java.nio.file.Files.write(tmp.toPath,
      n.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp.toPath, f.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
  }

  /** Write `touched`-bucket rows (text, keep_id, n_copies, bucket) as a
    * new committed version: stage partitioned by bucket, move staged
    * bucket dirs into the version dir, inherit untouched buckets from
    * the base BY MANIFEST REFERENCE, write the manifest atomically, then
    * land `_SUCCESS` and prune. A fully-emptied touched bucket (every
    * row deleted) simply has no manifest entry. */
  private def commitVersion(spark: SparkSession, storeDir: String, key: VKey,
                            rows: DataFrame, touched: Set[Int],
                            base: Option[String]): Unit = {
    val name = dirName(key)
    val staging = new java.io.File(storeDir, s".staging_$name")
    // `rows` arrives already repartition(bucket)-aligned (callers put
    // the repartition BEFORE any aggregate so the exchange is reused via
    // the subset rule), so the partitionBy write emits ONE file per
    // bucket per version, not O(shuffle partitions × buckets) slivers
    // (the compaction anti-pattern q52 exists to undo). At scale, size
    // nBuckets so one bucket ≈ one target file.
    rows.write.mode("overwrite").partitionBy("bucket")
      .parquet(staging.getAbsolutePath)
    val vDir = new java.io.File(storeDir, name)
    if (vDir.exists()) deleteRecursively(vDir) // uncommitted leftover
    vDir.mkdirs()
    val written: Seq[(Int, String)] =
      Option(staging.listFiles()).getOrElse(Array.empty).toSeq
        .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
        .flatMap { b =>
          java.nio.file.Files.move(b.toPath,
            new java.io.File(vDir, b.getName).toPath)
          val bucket = b.getName.stripPrefix("bucket=").toInt
          Option(new java.io.File(vDir, b.getName).listFiles())
            .getOrElse(Array.empty).toSeq
            .filter(f => f.isFile && !f.getName.startsWith(".") &&
              !f.getName.startsWith("_"))
            .map(f => bucket -> s"$name/${b.getName}/${f.getName}")
        }
    deleteRecursively(staging)
    // untouched buckets: inherit the base's concrete file paths — zero
    // data movement on any filesystem (the object-store-safe form of
    // the round-6 hard-link carry-forward)
    val inherited: Seq[(Int, String)] = base.toSeq.flatMap { prev =>
      manifestEntries(storeDir, new java.io.File(prev))
        .filter { case (b, _) => !touched.contains(b) }
        .map { case (b, f) =>
          b -> new java.io.File(storeDir).toPath.relativize(f.toPath).toString
        }
    }
    writeManifest(vDir, written ++ inherited)
    new java.io.File(vDir, "_SUCCESS").createNewFile()
    prune(storeDir, key)
  }

  /** Drain `docs` (a streaming frame with doc_id, text) into the store
    * and return the final deduplicated state. `nBuckets` sets the
    * partition granularity: batches rewrite only the buckets they
    * touch, so size it so a typical batch touches a minority of
    * buckets (at corpus scale: store_size / target_partition_size). */
  def run(spark: SparkSession, docs: DataFrame,
          storeDir: String, ckptDir: String, nBuckets: Int = 16): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be positive, got $nBuckets")
    graft.Confs.withConfs(spark, Seq(
      // no watermark/stateful operator here: a no-data batch would only
      // re-reference the whole store into a duplicate version
      "spark.sql.streaming.noDataMicroBatches.enabled" -> "false",
      "spark.sql.streaming.checkpoint.fileChecksum.enabled" -> "false")) {
      val mergeBatch: (DataFrame, Long) => Unit = (batch, batchId) => {
        // idempotent replay fast path: vN committed means batch N's
        // merge result is already on disk (the merge is deterministic),
        // so a re-delivery after a crash-before-checkpoint-record — or
        // a full re-drain under a fresh checkpoint — skips the rebuild
        // instead of stomping a version that later manifests (a purge's,
        // or under a fresh checkpoint any later batch's) reference into.
        // The cheap local directory check runs FIRST: a skipped batch
        // costs one listFiles(), not a Spark job over the batch files.
        if (!versions(storeDir).exists(_._1._1 == batchId) &&
            !batch.isEmpty) {
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
            // merge base: newest version with major < batchId
            // (idempotent under checkpoint replay — see baseFor)
            val base = baseFor(storeDir, batchId)
            // the buckets this batch touches — a ≤ nBuckets-row collect
            val touched = incoming.select(col("bucket")).distinct()
              .collect().map(_.getInt(0)).toSet
            // the manifest prunes the base read to exactly the touched
            // buckets' files, so the job reads only the store fraction
            // it rewrites
            val baseRows = base.map { prevVersion =>
              val files = manifestFiles(storeDir, prevVersion)
                .filter { case (b, _) => touched.contains(b) }
                .map(_._2.getAbsolutePath)
              if (files.isEmpty) None
              else Some(s.read.parquet(files: _*)
                .select("text", "keep_id", "n_copies")
                .withColumn("bucket",
                  pmod(xxhash64(col("text")), lit(buckets.toLong)).cast("int")))
            }.flatten
            val mergeInput = withoutTombstoned(s, storeDir,
              baseRows.map(_.unionByName(incoming)).getOrElse(incoming))
            // ONE shuffle, bucket-keyed: HashPartitioning(bucket)
            // satisfies the (bucket, text) clustering the aggregate
            // requires (subset rule), so the groupBy reuses the
            // repartition exchange instead of adding its own
            val merged = mergeInput.repartition(col("bucket"))
              .groupBy(col("bucket"), col("text"))
              .agg(min(col("keep_id")).as("keep_id"),
                sum(col("n_copies")).as("n_copies"))
            commitVersion(s, storeDir, (batchId, 0), merged, touched, base)
          // finally: a failed batch (IOException in move) must not leave
          // the cached batch aggregate pinned in the shared session
          // after run() rethrows — the stateless house rule
          } finally incoming.unpersist()
        }
      }
      val q = docs.writeStream
        .foreachBatch(mergeBatch)
        .option("checkpointLocation", ckptDir)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      read(spark, storeDir)
    }
  }

  /** Consumer-side read of the store's current deduplicated state —
    * what run() returns, without running a drain: the newest committed
    * version resolved through its manifest, tombstone-filtered. An
    * empty or uncommitted store reads as the typed empty frame. */
  def read(spark: SparkSession, storeDir: String): DataFrame =
    latest(storeDir).map(readVersion(spark, storeDir, _))
      .getOrElse(emptyStore(spark))

  /** Targeted delete (takedown / right-to-be-forgotten) INSIDE the
    * versioned store: rewrite ONLY the victims' buckets into a new
    * (major, sub+1) version — untouched buckets carry forward by
    * manifest reference — and record the victims' text hashes as
    * tombstones so a checkpoint replay or later re-ingestion of the
    * same text cannot resurrect it. Returns the post-purge store.
    *
    * Cost ∝ victim buckets, not store size — q64's pruned-rewrite
    * shape composed with the version/replay machinery. `victimTexts`
    * is a driver-side list because takedown requests are bounded
    * (thousands, not millions). Erasure is immediate on BOTH axes:
    * logically via the tombstone filter on every read path, and
    * physically via prune's file-level sweep, which deletes the
    * superseded victim-bucket files in this same call (StreamingSpec
    * asserts no parquet file under the store still holds a victim). */
  def purge(spark: SparkSession, storeDir: String,
            victimTexts: Seq[String]): DataFrame = {
    if (victimTexts.isEmpty) return read(spark, storeDir)
    // hash exactly as the store does (one tiny Spark job, so the driver
    // can never drift from the executors' xxhash64)
    val vdf = spark.createDataset(victimTexts.distinct)(Encoders.STRING)
      .toDF("text")
    val hashes = vdf.select(xxhash64(col("text")).as("h"))
      .collect().map(_.getLong(0)).toSeq
    val current = versions(storeDir).sortBy(_._1).lastOption
    val newKey: VKey = current.map { case ((m, s), _) => (m, s + 1) }
      .getOrElse((0L, 1))
    // tombstones land FIRST (atomically): from this moment the texts
    // are logically gone on every read path even if the rewrite below
    // crashes. Each purge appends a FRESH file (monotonic counter) —
    // never a version-derived name, which two purges could share when
    // the first committed no version (victims absent, or a crash after
    // the tombstone landed) and REPLACE_EXISTING would then silently
    // drop the earlier purge's hashes, resurrecting its texts on
    // re-ingestion. A crashed-and-retried purge writes a duplicate
    // file instead; loadTombstones dedups.
    val tombDir = new java.io.File(storeDir, "_TOMBSTONES")
    tombDir.mkdirs()
    val nextTomb = Option(tombDir.listFiles()).getOrElse(Array.empty)
      .flatMap(f => f.getName.stripPrefix("t").toLongOption)
      .maxOption.getOrElse(-1L) + 1
    val tmp = new java.io.File(tombDir, s".t$nextTomb.tmp")
    java.nio.file.Files.write(tmp.toPath, hashes.map(_.toString)
      .mkString("", "\n", "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp.toPath,
      new java.io.File(tombDir, s"t$nextTomb").toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    current match {
      case None => emptyStore(spark) // nothing committed: tombstones only
      case Some((baseKey, baseDir)) =>
        val buckets = layoutBuckets(storeDir, 16)
        val victimBuckets = hashes
          .map(h => (((h % buckets) + buckets) % buckets).toInt).toSet
        val baseManifest = manifestEntries(storeDir, baseDir)
        val touched = victimBuckets.intersect(baseManifest.map(_._1).toSet)
        if (touched.isEmpty) // victims not physically present
          readVersion(spark, storeDir, baseDir.getAbsolutePath)
        else {
          val files = baseManifest.filter(e => touched.contains(e._1))
            .map(_._2.getAbsolutePath)
          val survivors = withoutTombstoned(spark, storeDir,
              spark.read.parquet(files: _*)
                .select("text", "keep_id", "n_copies"))
            .withColumn("bucket",
              pmod(xxhash64(col("text")), lit(buckets.toLong)).cast("int"))
            .repartition(col("bucket"))
          commitVersion(spark, storeDir, newKey, survivors, touched,
            Some(baseDir.getAbsolutePath))
          readVersion(spark, storeDir,
            new java.io.File(storeDir, dirName(newKey)).getAbsolutePath)
        }
    }
  }
}
