package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStream
import graft.streaming.EventStream.{Event, Session}

/** Structured Streaming behavior: windowed agg ≡ batch equivalent, and
  * stateful sessionization carrying an open session across micro-batches. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("streaming hourly counts equal the batch group-by") {
    val streamed = EventStream.runToMemory(spark,
      EventStream.hourlyCounts(EventStream.readEvents(spark, sf)), "t_hourly")
    val batch = Tables.load(spark, sf, "events")
      .groupBy(date_trunc("hour", Tables.eventTime(col("ts"))).as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("file-sink drain (Append + watermark) emits exactly the finalized windows") {
    val out = java.nio.file.Files.createTempDirectory("graft_fsink").toString
    val drained = EventStream.runToFiles(spark,
      EventStream.hourlyCounts(EventStream.readEvents(spark, sf)),
      s"$out/data", s"$out/ckpt")
    // Append emits a window once the watermark (max event_time - 1h)
    // passes its end: expected = batch windows with end <= watermark
    val events = Tables.load(spark, sf, "events")
      .select(Tables.eventTime(col("ts")).as("event_time"))
    val maxTs = events.agg(max(col("event_time"))).collect()(0).getTimestamp(0)
    val batch = Tables.load(spark, sf, "events")
      .groupBy(date_trunc("hour", Tables.eventTime(col("ts"))).as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .filter(col("hour") + expr("INTERVAL 1 HOUR") <=
        lit(maxTs) - expr("INTERVAL 1 HOUR"))
    assert(drained.count() > 0, "watermark should finalize most windows")
    assert(drained.exceptAll(batch).isEmpty && batch.exceptAll(drained).isEmpty,
      "file sink must hold exactly the watermark-finalized windows")
  }

  test("RocksDB state store provider: same windowed results as the default store") {
    val default = EventStream.runToMemory(spark,
      EventStream.hourlyCounts(EventStream.readEvents(spark, sf)), "t_hourly_hdfs")
      .collect().toSet
    val rocks = EventStream.withRocksDBState(spark) {
      EventStream.runToMemory(spark,
        EventStream.hourlyCounts(EventStream.readEvents(spark, sf)), "t_hourly_rocks")
        .collect().toSet
    }
    assert(rocks == default)
    assert(rocks.nonEmpty)
    // provider conf restored after the block (getOption surfaces the
    // built-in HDFSBacked default, so assert on the value, not on None)
    assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
      .contains("HDFSBackedStateStoreProvider"))
  }

  test("foreachBatch dedup store: multi-batch merge equals batch dedup, versions commit") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_store_spec").toString
    // 3 texts with duplicates spread across files so merges genuinely
    // combine counts across micro-batches
    val docs = Seq(
      (1L, "alpha"), (2L, "beta"), (3L, "alpha"),
      (4L, "gamma"), (5L, "beta"), (6L, "alpha")
    ).toDF("doc_id", "text")
    docs.repartition(3).write.mode("overwrite").parquet(s"$tmp/in")
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$tmp/in/part-*")
    val store = graft.streaming.DedupStore.run(
      spark, stream, s"$tmp/store", s"$tmp/ckpt")
    val got = store.collect()
      .map(r => (r.getAs[String]("text"), r.getAs[Long]("keep_id"),
        r.getAs[Long]("n_copies"))).toSet
    assert(got == Set(("alpha", 1L, 3L), ("beta", 2L, 2L), ("gamma", 4L, 1L)))
    // retention: commit-time pruning keeps only the newest version and
    // its replay base — 3 micro-batches leave v1 (base) + v2 (read
    // target), not O(batches) dead versions
    val versions = new java.io.File(s"$tmp/store").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v"))
      .map(_.getName).sorted
    assert(versions.toSeq == Seq("v1", "v2"),
      s"expected pruned store {v1, v2}, got ${versions.mkString(",")}")
  }

  test("dedup store rewrites only touched hash partitions; untouched carry forward") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_store_part").toString
    // batch 0: 200 distinct texts (touches ~all 16 buckets); batch 1: a
    // single duplicate doc (touches exactly ONE bucket) — the incremental
    // shape where partitioned merge pays off
    val big = (0 until 200).map(i => (i.toLong, s"text body number $i"))
      .toDF("doc_id", "text")
    val soloText = "text body number 7" // dup → batch 1 genuinely merges
    big.coalesce(1).write.mode("overwrite").parquet(s"$tmp/in")
    Seq((1000L, soloText)).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(s"$tmp/in")
    // deterministic micro-batch order: FileStreamSource sorts by mtime
    val parts = new java.io.File(s"$tmp/in").listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.length()).reverse
    assert(parts.length == 2)
    val now = System.currentTimeMillis()
    parts(0).setLastModified(now - 60000) // big file first
    parts(1).setLastModified(now)
    val stream = spark.readStream.schema(big.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/in/part-*")
    val store = graft.streaming.DedupStore.run(
      spark, stream, s"$tmp/store", s"$tmp/ckpt")
    val got = store.collect()
      .map(r => (r.getAs[String]("text"), r.getAs[Long]("keep_id"),
        r.getAs[Long]("n_copies"))).toSet
    assert(got.size == 200 && got(("text body number 7", 7L, 2L)))
    val soloBucket = spark.range(1)
      .select(pmod(xxhash64(lit(soloText)), lit(16L)).cast("int"))
      .head.getInt(0)
    val v0 = new java.io.File(s"$tmp/store/v0")
    val v1 = new java.io.File(s"$tmp/store/v1")
    assert(v0.isDirectory && v1.isDirectory)
    def fileKeys(dir: java.io.File): Map[String, Any] =
      Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && !f.getName.startsWith(".") &&
          !f.getName.startsWith("_"))
        .map(f => f.getName -> java.nio.file.Files.readAttributes(f.toPath,
          classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey)
        .toMap
    val untouched = v0.listFiles().filter(f => f.isDirectory &&
      f.getName.startsWith("bucket=") && f.getName != s"bucket=$soloBucket")
    assert(untouched.length >= 10, "batch 0 should populate most buckets")
    untouched.foreach { b =>
      val carried = new java.io.File(v1, b.getName)
      assert(carried.isDirectory, s"${b.getName} must carry into v1")
      // same file names AND same inodes: hard-linked, not rewritten
      assert(fileKeys(b) == fileKeys(carried),
        s"${b.getName}: untouched partition must be link-carried, not rewritten")
    }
    // the touched bucket was genuinely rewritten (fresh files, no links)
    val touchedNew = fileKeys(new java.io.File(v1, s"bucket=$soloBucket"))
    val touchedOld = fileKeys(new java.io.File(v0, s"bucket=$soloBucket"))
    assert(touchedNew.nonEmpty)
    assert(touchedOld.values.toSet.intersect(touchedNew.values.toSet).isEmpty,
      "touched partition must be rewritten, not linked")
  }

  test("dedup store adopts the committed bucket layout over a mismatched parameter") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_store_layout").toString
    def stream() = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/in/part-*")
    val first = Seq((1L, "alpha"), (2L, "beta"), (3L, "alpha")).toDF("doc_id", "text")
    first.coalesce(1).write.mode("overwrite").parquet(s"$tmp/in")
    graft.streaming.DedupStore.run(spark, stream(), s"$tmp/store", s"$tmp/ckpt",
      nBuckets = 16)
    // proper resumption: same input dir + same checkpoint, a new file
    // arrives — but the CALLER passes a different nBuckets. The
    // persisted _LAYOUT must win: re-hashing "alpha" into a different
    // bucket would duplicate its row across buckets and split n_copies.
    Seq((4L, "alpha"), (5L, "gamma")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(s"$tmp/in")
    val store = graft.streaming.DedupStore.run(spark, stream(), s"$tmp/store", s"$tmp/ckpt",
      nBuckets = 4)
    val got = store.collect()
      .map(r => (r.getAs[String]("text"), r.getAs[Long]("keep_id"),
        r.getAs[Long]("n_copies"))).toSet
    assert(got == Set(("alpha", 1L, 3L), ("beta", 2L, 1L), ("gamma", 5L, 1L)),
      s"layout mismatch corrupted the store: $got")
  }

  test("dedup store run() with no committed batch returns the typed empty store") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_store_empty").toString
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(s"$tmp/in")
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$tmp/in/part-*")
    val store = graft.streaming.DedupStore.run(
      spark, stream, s"$tmp/store", s"$tmp/ckpt")
    // downstream select must resolve even with zero committed versions
    assert(store.select("keep_id", "n_copies").count() == 0L)
    assert(store.schema.fieldNames.toSeq == Seq("text", "keep_id", "n_copies"))
  }

  test("dedup store versions: _SUCCESS gates commits, replay base excludes own batch") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_store_vers").toString
    def mkVersion(id: Long, committed: Boolean): Unit = {
      val d = new java.io.File(s"$tmp/v$id"); d.mkdirs()
      if (committed) new java.io.File(d, "_SUCCESS").createNewFile()
    }
    mkVersion(0, committed = true)
    mkVersion(1, committed = true)
    mkVersion(2, committed = false) // half-written: crashed before job commit
    val latest = graft.streaming.DedupStore.latest(tmp)
    assert(latest.exists(_.endsWith("v1")), s"uncommitted v2 must be invisible: $latest")
    // replay of batch 1 must merge from v0 (its original base), not from
    // v1 — which already contains batch 1 and would double-count
    val base = graft.streaming.DedupStore.baseFor(tmp, 1L)
    assert(base.exists(_.endsWith("v0")), s"replay base for batch 1: $base")
    assert(graft.streaming.DedupStore.baseFor(tmp, 0L).isEmpty)
  }

  test("batch sessionize: gaps > 30 min split sessions; invariants hold") {
    val h = 3600L * 1000 * 1000 * 1000 // 1h in ns
    val evs = Seq(
      Event(1, 0L, 7L, "a", 0, ""), Event(2, 10L * 60 * 1000 * 1000 * 1000, 7L, "a", 0, ""),
      Event(3, 2 * h, 7L, "a", 0, ""), // new session after gap
      Event(4, 0L, 8L, "b", 0, "")).toDS()
    val sessions = EventStream.sessionize(evs).collect().sortBy(s => (s.user_id, s.session_id))
    assert(sessions.map(s => (s.user_id, s.session_id, s.n_events)).toSeq ==
      Seq((7L, 1, 2L), (7L, 2, 1L), (8L, 1, 1L)))
    assert(sessions.head.session_start == 0L)
    assert(sessions.head.session_end == 10L * 60 * 1000 * 1000) // µs
  }

  test("streaming sessionize keeps the open session across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val sessions = EventStream.sessionizeStream(mem.toDS())
    // ProcessingTimeTimeout makes the engine fire timeout-check batches on
    // every trigger: ProcessingTime(0) would spin empty micro-batches
    // back-to-back (endless state commits), and processAllAvailable never
    // settles while timeouts are pending — so throttle the trigger and
    // poll the sink with a deadline instead.
    val q = sessions.writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName("t_sessions")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"))
      .start()
    def awaitRows(n: Long, timeoutMs: Long = 120000): Unit = {
      val deadline = System.currentTimeMillis + timeoutMs
      while (spark.table("t_sessions").count() < n &&
        System.currentTimeMillis < deadline) Thread.sleep(200)
      assert(spark.table("t_sessions").count() >= n,
        s"timed out waiting for $n rows")
    }
    try {
      val m = 60L * 1000 * 1000 * 1000 // 1 min in ns
      // batch 1: two events 5 min apart → still one open session, nothing emitted
      mem.addData(Event(1, 0L, 1L, "a", 0, ""), Event(2, 5 * m, 1L, "a", 0, ""))
      Thread.sleep(3000)
      assert(spark.table("t_sessions").count() == 0)
      // batch 2: an event 90 min later closes the first session (emitted),
      // opens a second one that stays in state
      mem.addData(Event(3, 95 * m, 1L, "a", 0, ""))
      awaitRows(1)
      val out = spark.table("t_sessions").as[Session].collect()
      assert(out.length == 1)
      assert(out.head.session_id == 1)
      assert(out.head.n_events == 2 && out.head.session_start == 0L)
      // batch 3: another long gap closes the SECOND session — its id must
      // continue from state (2), not restart at 1
      mem.addData(Event(4, 200 * m, 1L, "a", 0, ""))
      awaitRows(2)
      val out2 = spark.table("t_sessions").as[Session].collect().sortBy(_.session_id)
      assert(out2.length == 2)
      assert(out2.map(_.session_id).toSeq == Seq(1, 2))
      assert(out2(1).n_events == 1 && out2(1).session_start == 95 * m / 1000)
    } finally q.stop()
  }

  test("sliding windows (st10): every event lands in exactly two aligned windows") {
    import org.apache.spark.sql.functions._
    val out = graft.streaming.EventStream.runToMemory(spark,
      graft.streaming.EventStream.slidingCounts(
        graft.streaming.EventStream.readEvents(spark, sf)),
      s"slide_${System.nanoTime()}")
    val total = out.agg(sum(col("n_events"))).head.getLong(0)
    val n = Tables.load(spark, sf, "events").count()
    assert(total == 2 * n, s"overlap-2 sliding windows must double-count: $total vs 2*$n")
    // every window start is hour-aligned (epoch-aligned slide)
    val misaligned = out.filter(
      col("win_start") =!= date_trunc("hour", col("win_start"))).count()
    assert(misaligned == 0L)
  }

  test("blocklist filter (st11): bloom short-circuit equals the plain anti-join") {
    import org.apache.spark.sql.functions._
    val events = Tables.load(spark, sf, "events")
      .withColumn("event_time", Tables.eventTime(col("ts")))
    val blocklist = events.select(col("user_id")).distinct()
      .filter(col("user_id") % 17 === 0)
    // batch path through the same helper: exact anti-join semantics
    val kept = graft.streaming.EventStream.blocklistFiltered(
      events, blocklist, "user_id")
    val plain = events.join(blocklist, Seq("user_id"), "left_anti")
    assert(kept.count() == plain.count())
    assert(kept.filter(col("user_id") % 17 === 0).count() == 0L,
      "a blocklisted user leaked through the bloom short-circuit")
    // the bloom probe is in the plan (the clean-majority branch)
    assert(kept.queryExecution.executedPlan.toString.contains("might_contain"))
    // EMPTY blocklist: an empty bloom (probes false) must pass every
    // event through — catalyst's empty aggregate returns NULL, which
    // unguarded would NULL-out both filter branches and drop the stream
    val none = blocklist.filter(col("user_id") < 0)
    val keptAll = graft.streaming.EventStream.blocklistFiltered(
      events, none, "user_id")
    assert(keptAll.count() == events.count(),
      "empty blocklist must keep every event")
  }
}
