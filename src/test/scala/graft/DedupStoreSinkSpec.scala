package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The DSv2 write path of the dedup store: writeStream/write via
  * `format("graft.sources.DedupStoreSink")` must land the SAME store a
  * foreachBatch drain builds — shared merge core, shared version chain,
  * shared lock — with staging fully cleaned after every commit. */
class DedupStoreSinkSpec extends SparkSpec {
  import spark.implicits._

  private val SinkFormat = "graft.sources.DedupStoreSink"

  private def storeState(dir: String): Set[(String, Long, Long)] =
    graft.streaming.DedupStore.read(spark, dir).collect()
      .map(r => (r.getAs[String]("text"), r.getAs[Long]("keep_id"),
        r.getAs[Long]("n_copies"))).toSet

  test("streaming drain through the sink equals the foreachBatch drain") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sink").toString
    // 3 files → 3 micro-batches; cross-file duplicates exercise the merge
    val docs = Seq(
      (1L, "sink alpha"), (2L, "sink beta"), (3L, "sink alpha"),
      (4L, "sink gamma"), (5L, "sink beta"), (6L, "sink delta"))
      .toDF("doc_id", "text")
    docs.repartition(3).write.mode("overwrite").parquet(s"$tmp/in")
    def stream() = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/in/part-*")

    val q = stream().writeStream
      .format(SinkFormat)
      .option("path", s"$tmp/store")
      .option("nBuckets", "4")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // reference: the foreachBatch drain over the same input
    graft.streaming.DedupStore.run(spark, stream(), s"$tmp/ref_store",
      s"$tmp/ref_ckpt", nBuckets = 4)
    assert(storeState(s"$tmp/store") == storeState(s"$tmp/ref_store"))
    assert(storeState(s"$tmp/store") == Set(
      ("sink alpha", 1L, 2L), ("sink beta", 2L, 2L),
      ("sink gamma", 4L, 1L), ("sink delta", 6L, 1L)))
    // staging fully cleaned; lock released
    val staging = new java.io.File(s"$tmp/store/_STAGING")
    assert(!staging.exists() || staging.listFiles().forall(
      d => d.listFiles() == null || d.listFiles().isEmpty),
      "per-epoch staging must be cleaned after commit")
    assert(!new java.io.File(s"$tmp/store/_LOCK").exists())

    // replay under the SAME checkpoint: AvailableNow re-run with no new
    // files commits nothing new (replay-skip), store unchanged
    val before = new java.io.File(s"$tmp/store").listFiles()
      .map(_.getName).filter(_.startsWith("v")).toSet
    val q2 = stream().writeStream.format(SinkFormat)
      .option("path", s"$tmp/store")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val after = new java.io.File(s"$tmp/store").listFiles()
      .map(_.getName).filter(_.startsWith("v")).toSet
    assert(after == before, "a no-new-data restart must commit nothing")
  }

  test("batch write merges into the existing chain at the next free major") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sinkb").toString
    Seq((1L, "bw one"), (2L, "bw two")).toDF("doc_id", "text")
      .write.format(SinkFormat).option("path", s"$tmp/store")
      .option("nBuckets", "4").mode("append").save()
    assert(storeState(s"$tmp/store") ==
      Set(("bw one", 1L, 1L), ("bw two", 2L, 1L)))
    // second delivery: duplicate of "bw one" with a LOWER doc_id folds in
    Seq((0L, "bw one"), (3L, "bw three")).toDF("doc_id", "text")
      .write.format(SinkFormat).option("path", s"$tmp/store")
      .mode("append").save()
    assert(storeState(s"$tmp/store") == Set(
      ("bw one", 0L, 2L), ("bw two", 2L, 1L), ("bw three", 3L, 1L)))
    // the second delivery took the NEXT free major (no collision with
    // v0 — whether v0 itself survives depends on retention: if batch 2
    // touched every bucket v0 held, v0 is correctly pruned)
    val vs = new java.io.File(s"$tmp/store").listFiles()
      .map(_.getName).filter(_.startsWith("v")).toSet
    assert(vs.contains("v1") && vs.subsetOf(Set("v0", "v1")),
      s"expected the chain to top out at major v1: $vs")
    val staging = new java.io.File(s"$tmp/store/_STAGING")
    assert(!staging.exists() || staging.listFiles().forall(
      d => d.listFiles() == null || d.listFiles().isEmpty))
  }

  test("the sink refuses a wrong schema and a held writer lock") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sinkg").toString
    val bad = intercept[Exception] {
      Seq((1L, "x", "extra")).toDF("doc_id", "body", "junk")
        .write.format(SinkFormat).option("path", s"$tmp/store")
        .mode("append").save()
    }
    assert(bad.getMessage.contains("text") || bad.getMessage.contains("schema"),
      s"expected a schema refusal, got: ${bad.getMessage}")
    // a live lock (another writer mid-operation) refuses the commit
    Seq((1L, "lk seed")).toDF("doc_id", "text")
      .write.format(SinkFormat).option("path", s"$tmp/store")
      .mode("append").save()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$tmp/store/_LOCK"),
      s"${System.currentTimeMillis()}\tother\tdrain\n".getBytes("UTF-8"))
    val locked = intercept[Exception] {
      Seq((2L, "lk more")).toDF("doc_id", "text")
        .write.format(SinkFormat).option("path", s"$tmp/store")
        .mode("append").save()
    }
    assert(messages(locked).exists(_.contains("locked by another writer")),
      s"expected the lock refusal, got: ${messages(locked)}")
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$tmp/store/_LOCK"))
    assert(storeState(s"$tmp/store") == Set(("lk seed", 1L, 1L)),
      "a refused commit must leave the store unchanged")
  }

  private def messages(e: Throwable): Seq[String] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq

  test("tombstone GC reads sidecar metadata, not every hit bucket's data") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_gc_bloom").toString
    val docs = (0 until 200).map(i => (i.toLong, s"gcb text $i"))
      .toDF("doc_id", "text")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$tmp/in")
    def stream() = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/in/part-*")
    graft.streaming.DedupStore.run(
      spark, stream(), s"$tmp/store", s"$tmp/ckpt", nBuckets = 16)
    // every committed version dir carries its `_bloom` sidecar
    val versionDirs = new java.io.File(s"$tmp/store").listFiles()
      .filter(d => d.isDirectory && !d.getName.startsWith("_"))
    assert(versionDirs.nonEmpty &&
      versionDirs.forall(d => new java.io.File(d, "_bloom").isFile),
      s"expected a _bloom sidecar in every version dir: ${versionDirs.toSeq}")
    // a COMPLETED purge (victims physically erased — these must fold)
    graft.streaming.DedupStore.purge(spark, s"$tmp/store",
      Seq("gcb text 7", "gcb text 13"))
    // …and a CRASHED purge at its crash point: tombstone landed, the
    // physical rewrite did not — its victim is still in the data, so
    // the sidecar must route the probe INTO that one bucket dir
    val crashedHash = spark.range(1)
      .select(xxhash64(lit("gcb text 3"))).head.getLong(0)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$tmp/store/_TOMBSTONES/t5"),
      s"$crashedHash\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val (kept, dropped) = graft.streaming.DedupStore.compactTombstones(
      spark, s"$tmp/store")
    assert((kept, dropped) == (1, 2),
      s"expected the crashed hash kept and 2 folded, got ($kept, $dropped)")
    // the read-amplification bound the sidecars exist for: exactly ONE
    // version dir can still hold a victim (the one whose commit wrote
    // the crashed purge's bucket), every other candidate version is
    // pruned by metadata alone
    val probe = graft.streaming.DedupStore.lastTombstoneProbe(s"$tmp/store").get
    assert(probe.dirsTotal >= 2,
      s"fixture too small to prove pruning: $probe")
    assert(probe.dirsPruned == probe.dirsTotal - 1,
      s"every victim-free dir must prune via its sidecar: $probe")
    assert(probe.filesRead == 1,
      s"only the crashed victim's data file should be read: $probe")
  }

  test("writer partials flush past the entry cap without losing counts") {
    // per-writer map-side combine: more distinct texts than FlushEntries
    // would need a huge fixture; instead verify the flush path directly
    // by writing through the sink with many duplicates per text — the
    // partial (min, count) must survive multiple flush boundaries via
    // the driver-side min/sum re-combine. (FlushEntries itself is a
    // constant; this guards the re-combine CONTRACT the flush relies on.)
    val tmp = java.nio.file.Files.createTempDirectory("graft_sinkf").toString
    val docs = (0 until 400).map(i => (i.toLong, s"fl text ${i % 7}"))
      .toDF("doc_id", "text")
    docs.write.format(SinkFormat).option("path", s"$tmp/store")
      .option("nBuckets", "4").mode("append").save()
    val got = storeState(s"$tmp/store")
    val want = (0 until 7).map(k =>
      (s"fl text $k", k.toLong, (0 until 400).count(_ % 7 == k).toLong)).toSet
    assert(got == want)
  }
}
