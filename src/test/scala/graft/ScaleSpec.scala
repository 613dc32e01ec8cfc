package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.ScaleJoins

/** Plan-level scale guarantees: bucketed joins don't shuffle, partitioned
  * reads prune, salted joins preserve semantics while spreading hot keys. */
class ScaleSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    // materialize the AQE final plan
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("bucketed tables join with no shuffle exchange") {
    val li = Tables.load(spark, sf, "lineitem")
    val o = Tables.load(spark, sf, "orders")
    ScaleJoins.writeBucketed(li.select("l_orderkey", "l_quantity"), "li_b", "l_orderkey", 8)
    ScaleJoins.writeBucketed(o.select("o_orderkey", "o_totalprice"), "o_b", "o_orderkey", 8)
    val joined = spark.table("li_b")
      .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
    val plan = planOf(joined)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    // same result as the plain join
    val plain = li.select("l_orderkey", "l_quantity")
      .join(o.select("o_orderkey", "o_totalprice"), col("l_orderkey") === col("o_orderkey"))
    assert(joined.count() == plain.count())
  }

  test("partitioned parquet read prunes partitions under an equality filter") {
    val dir = Files.createTempDirectory("graft_prune").toString
    Tables.load(spark, sf, "nation")
      .withColumn("bucket", (col("n_nationkey") % 5).cast("int"))
      .write.mode("overwrite").partitionBy("bucket").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("bucket") === 2)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), s"no partition filters:\n$scan")
    assert(pruned.collect().length == 5) // 25 nations / 5 buckets
    // only 1 of 5 partition directories feeds the executed scan (collect()
    // above executed pruned's own plan, so its scan metrics are populated)
    val fileScan = pruned.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(fileScan.metrics("numFiles").value == 1,
      s"scan read ${fileScan.metrics("numFiles").value} files, expected 1")
  }

  test("HLL sketch union rollup: error-bounded global estimate from per-shard sketches") {
    val docs = Tables.load(spark, sf, "documents")
    // materialize per-source sketches once, roll up WITHOUT rescanning
    val sketches = docs.groupBy(col("source"))
      .agg(hll_sketch_agg(col("text")).as("sk")).cache()
    val unionEst = sketches
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect()(0).getLong(0)
    val exact = docs.select(count_distinct(col("text"))).collect()(0).getLong(0)
    val relErr = math.abs(unionEst - exact).toDouble / exact
    // lgConfigK=12 standard error ~1.6%; gate at 5%
    assert(relErr <= 0.05, s"union estimate $unionEst vs exact $exact (err $relErr)")
    // per-source sparse estimates are exact at this cardinality (what
    // lets q46's DuckDB oracle use exact COUNT(DISTINCT))
    val perSource = sketches
      .select(col("source"), hll_sketch_estimate(col("sk")).as("est"))
    val exactPer = docs.groupBy(col("source"))
      .agg(count_distinct(col("text")).as("est"))
    assert(perSource.exceptAll(exactPer).isEmpty)
    sketches.unpersist()
    // d06's premise: at lgConfigK=18 the lineitem partkey sketch stays
    // in the exact sparse/coupon regime — asserted at the LARGEST
    // fixture (sf0.1, ~20k distinct per flag, the regime closest to the
    // sparse/dense boundary; this suite's sf0.001 would pass long after
    // the bigger fixtures drifted), so the check flips before the
    // exact-count oracle at sf0.01 or the sf0.1 bench could ever flake
    val d06sf = "/root/testdata/sf0.1"
    assume(new java.io.File(d06sf).isDirectory, s"fixture $d06sf absent")
    val d06 = Tables.load(spark, d06sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("l_partkey"), lit(18))).as("est"),
        count_distinct(col("l_partkey")).as("exact"))
    assert(d06.filter(col("est") =!= col("exact")).count() == 0L,
      "d06 exact-regime premise broken: lgK=18 sketch drifted from exact")
  }

  test("compaction derives the file count from payload bytes and loses nothing") {
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val out = Files.createTempDirectory("graft_compact_spec").toString
    val nFiles = graft.queries.SourceFormatQueries.compact(
      docs, octet_length(col("text")), out, targetBytes = 32L * 1024)
    val expectBytes = docs.agg(sum(octet_length(col("text")).cast("long")))
      .head().getLong(0)
    assert(nFiles == ((expectBytes + 32 * 1024 - 1) / (32 * 1024)).toInt)
    val parts = new java.io.File(out).listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(parts == nFiles, s"wrote $parts part files, sized for $nFiles")
    // content parity: nothing lost, nothing duplicated
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("salted join equals plain join and spreads the hot key") {
    val events = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("value"))
    val customer = Tables.load(spark, sf, "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val plain = events.join(customer, "user_id")
    val salted = ScaleJoins.saltedJoin(events, customer, "user_id",
      saltFactor = 4, saltSource = col("event_id"))
    assert(salted.count() == plain.count())
    assert(salted.select("user_id", "event_id", "c_mktsegment")
      .exceptAll(plain.select("user_id", "event_id", "c_mktsegment")).isEmpty)
  }

  test("bloom prefilter is in the executed plan and is result-transparent (q53)") {
    val docs = Tables.load(spark, sf, "documents")
    val corpus = docs.filter(col("doc_id") % 23 =!= 0)
    val eval = docs.filter(col("doc_id") % 23 === 0)
    val pruned = graft.ops.Sketches.bloomDecontaminatedIds(
      corpus, eval, "doc_id", "text", n = 5)
    // no false negatives: identical id set to the exact gram semi-join
    val exact = graft.ops.Dedup.contaminatedDocs(corpus, eval, "doc_id", "text", n = 5)
      .select("doc_id")
    assert(pruned.exceptAll(exact).isEmpty && exact.exceptAll(pruned).isEmpty,
      "bloom-prefiltered result differs from the exact join")
    // the codegen'd membership probe sits in the plan as a filter
    val plan = planOf(pruned)
    assert(plan.contains("might_contain"), s"no bloom probe in plan:\n$plan")
  }

  test("bloom prune keeps every true match and its fpp tail is small") {
    val li = Tables.load(spark, sf, "lineitem").select("l_orderkey").distinct()
    val keys = Tables.load(spark, sf, "orders")
      .filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey").as("l_orderkey"))
    val pruned = graft.ops.Sketches.bloomPrune(li, "l_orderkey", keys, 4096)
    val truePos = li.join(keys, Seq("l_orderkey"), "left_semi")
    // bloom ⊇ exact (no false negatives) ...
    assert(truePos.exceptAll(pruned).isEmpty)
    // ... and ≤ exact + a bounded false-positive tail (~3% of non-matches)
    val n = li.count(); val tp = truePos.count(); val kept = pruned.count()
    assert(kept - tp <= math.max(16L, ((n - tp) * 0.10).toLong),
      s"false-positive tail too fat: kept=$kept truePos=$tp n=$n")
  }

  test("q55 layout: month-range filter prunes to the in-range partition dirs") {
    val dir = graft.queries.SourceFormatQueries.ensureShipDateLayout(spark, sf)
    val all = spark.read.parquet(dir)
    val pruned = all.filter(col("ship_month").between("1996-01", "1996-12"))
    pruned.collect()
    val plan = pruned.queryExecution.executedPlan
    assert(plan.toString.contains("PartitionFilters"),
      s"no partition filters:\n$plan")
    val scan = plan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    val prunedFiles = scan.metrics("numFiles").value
    // one file per month partition at this scale: 12 in-range dirs of ~83
    val totalMonths = all.select("ship_month").distinct().count()
    assert(prunedFiles <= 12L,
      s"scan read $prunedFiles files for a 12-month range")
    assert(totalMonths > 12L, s"fixture spans only $totalMonths months")
    // pruning dropped no in-range rows
    val expected = Tables.load(spark, sf, "lineitem")
      .filter(date_format(col("l_shipdate"), "yyyy-MM")
        .between("1996-01", "1996-12")).count()
    assert(pruned.count() == expected)
  }

  test("q58 z-order layout clusters BOTH dims; single-key sort only one") {
    def fileSpans(dir: String): Map[String, (Double, Double)] = {
      val rows = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min(col("l_partkey")).as("p0"), max(col("l_partkey")).as("p1"),
          min(col("l_suppkey")).as("s0"), max(col("l_suppkey")).as("s1"))
        .collect()
      rows.map(r => r.getString(0) ->
        ((r.getLong(2) - r.getLong(1)).toDouble, (r.getLong(4) - r.getLong(3)).toDouble))
        .toMap
    }
    val (zdir, (pmin, pmax, smin, smax)) =
      graft.queries.SourceFormatQueries.ensureZOrderLayout(spark, sf)
    val pSpan = (pmax - pmin).toDouble
    val sSpan = (smax - smin).toDouble
    val zf = fileSpans(zdir)
    assert(zf.size >= 8, s"z layout produced only ${zf.size} files")
    val zAvgP = zf.values.map(_._1).sum / zf.size / pSpan
    val zAvgS = zf.values.map(_._2).sum / zf.size / sSpan
    // every z-file is a near-rectangle: both dims well under global span
    assert(zAvgP <= 0.6, s"z-layout avg partkey span $zAvgP")
    assert(zAvgS <= 0.6, s"z-layout avg suppkey span $zAvgS")
    // contrast: the same data sorted by partkey alone leaves suppkey
    // file stats useless (~full span) — the reason z-order exists
    val pdir = java.nio.file.Files.createTempDirectory("graft_psort").toString
    Tables.load(spark, sf, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"), col("l_returnflag"))
      .repartitionByRange(16, col("l_partkey"))
      .sortWithinPartitions(col("l_partkey"))
      .write.mode("overwrite").parquet(pdir)
    val pf = fileSpans(pdir)
    val pAvgS = pf.values.map(_._2).sum / pf.size / sSpan
    assert(pAvgS >= 0.9, s"single-key layout unexpectedly clustered suppkey: $pAvgS")
    // and the q58 predicate pushes down on both columns
    val q58 = SparkEntry.queries("q58_zorder_scan")(spark, sf)
    q58.collect()
    val scans = q58.queryExecution.executedPlan.toString
    assert(scans.contains("l_partkey") && scans.contains("PushedFilters"),
      s"q58 scan lost pushdown:\n$scans")
  }

  test("q60 star join: dimensions broadcast, fact side never builds a hash side") {
    val q60 = SparkEntry.queries("q60_local_supplier_volume")(spark, sf)
    val plan = planOf(q60)
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(nBroadcast >= 3,
      s"expected the dimension joins to broadcast, got $nBroadcast in:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a dimension join fell back to sort-merge at fixture scale:\n$plan")
  }

  test("q69 Q8-shape market share: dims broadcast, filters pushed, no degenerate joins") {
    val q69 = SparkEntry.queries("q69_market_share")(spark, sf)
    val plan = planOf(q69)
    // part/supplier/nation×2/customer/region all broadcast at any
    // realistic dim:fact ratio — at least 4 must show even after AQE
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(nBroadcast >= 4,
      s"expected the dimension joins to broadcast, got $nBroadcast in:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"degenerate join:\n$plan")
    // both selective dimension filters reach their scans
    assert(plan.contains("EqualTo(p_type,PROMO)"),
      s"p_type filter not pushed to the part scan:\n$plan")
    assert(plan.contains("EqualTo(r_name,ASIA)"),
      s"r_name filter not pushed to the region scan:\n$plan")
    // the share's numerator aggregate keeps its map-side partial
    assert(plan.contains("partial_sum"),
      s"aggregate lost its map-side partial:\n$plan")
  }

  test("q28 TPC-H Q3 shape: segment filter pushed to scan, customer broadcast, partial agg") {
    val q28 = SparkEntry.queries("q28_shipping_priority")(spark, sf)
    val plan = planOf(q28)
    // the selective dimension filter must reach the parquet scan, not
    // sit above a full read
    assert(plan.contains("PushedFilters") &&
      plan.contains("EqualTo(c_mktsegment,BUILDING)"),
      s"c_mktsegment filter not pushed to the customer scan:\n$plan")
    // filtered customer is broadcast-joined, never sort-merged or crossed
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the filtered customer dimension to broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"degenerate join:\n$plan")
    // revenue aggregates map-side first: the exchange carries one row
    // per (orderkey, orderdate) per partition, not the joined fact rows
    assert(plan.contains("partial_sum"),
      s"aggregate lost its map-side partial:\n$plan")
    // top-10 is a TakeOrderedAndProject, not a global sort of every group
    assert(plan.contains("TakeOrderedAndProject"),
      s"ORDER BY + LIMIT should plan as top-k, not full sort:\n$plan")
  }

  test("q04 fact-fact join aggregate keeps map-side partials and clean joins") {
    val q04 = SparkEntry.queries("q04_join_agg")(spark, sf)
    val plan = planOf(q04)
    assert(plan.contains("partial_sum") && plan.contains("partial_count"),
      s"group-by lost its map-side partial aggregation:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"degenerate join:\n$plan")
    // both scans project only the join/agg columns (ReadSchema pruned to
    // ≤ 2 columns each), never the full 16-column tables
    val readSchemas = "ReadSchema: struct<[^>]*>".r.findAllIn(plan).toSeq
    assert(readSchemas.nonEmpty &&
      readSchemas.forall(s => s.count(_ == ',') <= 1),
      s"scan reads more columns than the query needs:\n${readSchemas.mkString("\n")}")
  }

  test("targeted delete (q64 shape): only victim partitions rewrite; the rest survive") {
    import graft.queries.SourceFormatQueries.withOverwriteMode
    val out = Files.createTempDirectory("graft_delspec").toString
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"), col("source"))
    docs.write.mode("overwrite").partitionBy("source").parquet(out)
    def filesUnder(src: String): Set[String] = {
      val dir = new java.io.File(s"$out/source=$src")
      if (!dir.isDirectory) Set.empty
      else dir.listFiles.map(_.getName).filter(_.endsWith(".parquet")).toSet
    }
    // source assignment interleaves doc_id mod 20, so src1 holds only
    // ids ≡ 1 (mod 20) — pick victims by a coprime residue
    val victims = docs.filter(col("source") === "src1" && col("doc_id") % 3 === 0)
      .select(col("doc_id"))
    val nVictims = victims.count()
    assert(nVictims > 0, "fixture should produce victims")
    val table = spark.read.parquet(out)
    // two-stage discovery: write-time per-partition id blooms probed
    // driver-side prune the confirm scan to candidate partitions only
    graft.queries.SourceFormatQueries.writeIdBloomStats(docs, out)
    val victimIds = victims.collect().map(_.getLong(0)).toSeq
    val candidates = graft.queries.SourceFormatQueries
      .bloomCandidateSources(spark, out, victimIds)
    val totalSources = docs.select("source").distinct().count()
    assert(candidates.contains("src1"), "bloom prefilter lost a true partition")
    assert(candidates.size < totalSources,
      s"bloom prefilter pruned nothing: ${candidates.size} of $totalSources")
    val prunedBase = table.filter(col("source").isin(candidates: _*))
    val affected = prunedBase.join(broadcast(victims), "doc_id")
      .select(col("source")).distinct().collect().map(_.getString(0)).toSeq
    assert(affected == Seq("src1"), s"victims live in src1 only: $affected")
    // the confirm scan's base read a strict subset of the table's files
    // (simple filter plan — no AQE wrapper — so scan metrics are
    // directly inspectable, the q55 pattern)
    def numFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.get.metrics("numFiles").value
    }
    val prunedFiles = numFiles(prunedBase)
    val totalFiles = numFiles(spark.read.parquet(out))
    assert(prunedFiles < totalFiles,
      s"discovery read $prunedFiles of $totalFiles files")
    val untouchedBefore = filesUnder("src0")
    val touchedBefore = filesUnder("src1")
    assert(untouchedBefore.nonEmpty && touchedBefore.nonEmpty)
    withOverwriteMode(spark, "dynamic") {
      table.filter(col("source").isin(affected: _*))
        .join(broadcast(victims), Seq("doc_id"), "left_anti")
        .write.mode("overwrite").partitionBy("source").parquet(out)
    }
    // unaffected partition: identical files; affected: rewritten
    assert(filesUnder("src0") == untouchedBefore,
      "delete touched a partition with no victims")
    assert(filesUnder("src1") != touchedBefore, "victim partition must rewrite")
    val after = spark.read.parquet(out)
    assert(after.count() == docs.count() - nVictims)
    assert(after.filter(col("source") === "src1" && col("doc_id") % 3 === 0).count() == 0L)
    // whole-partition purge: dynamic overwrite can't replace a partition
    // its output doesn't contain, so a fully-victimized partition needs
    // the explicit directory delete (the q64 bug a %-based fixture list
    // can never hit) — purge ALL remaining src1 rows and assert the
    // partition directory is gone while others still survive
    val allSrc1 = after.filter(col("source") === "src1").select(col("doc_id"))
    assert(allSrc1.count() > 0)
    val table2 = spark.read.parquet(out)
    val survivors2 = table2.filter(col("source") === "src1")
      .join(broadcast(allSrc1), Seq("doc_id"), "left_anti")
    // collect BEFORE the rewrite — afterwards the frame's listing points
    // at replaced files (the q64 bug this test mirrors)
    val survivedSrcs = survivors2.select(col("source")).distinct()
      .collect().map(_.getString(0)).toSet
    withOverwriteMode(spark, "dynamic") {
      survivors2.write.mode("overwrite").partitionBy("source").parquet(out)
    }
    (Set("src1") -- survivedSrcs).foreach { src =>
      val dir = new java.io.File(s"$out/source=$src")
      Option(dir.listFiles()).foreach(_.foreach(f => f.delete(): Unit))
      dir.delete(): Unit
    }
    assert(filesUnder("src1").isEmpty, "fully-purged partition must vanish")
    assert(filesUnder("src0") == untouchedBefore)
    assert(spark.read.parquet(out).filter(col("source") === "src1").count() == 0L)
  }

  test("q66 rollup refresh: source scan pruned to touched days, clean rollup partitions survive") {
    import graft.queries.SourceFormatQueries
    val tmp = Files.createTempDirectory("graft_rollup_t").toString
    val src = s"$tmp/src"; val rollup = s"$tmp/rollup"
    val ev = Tables.load(spark, sf, "events")
      .withColumn("day", date_format(Tables.eventTime(col("ts")), "yyyy-MM-dd"))
      .select(col("day"), col("event_type"), col("event_id"), col("user_id"))
    val Seq(maxDay, prevDay) = ev.select(col("day")).distinct()
      .orderBy(col("day").desc).limit(2).collect().map(_.getString(0)).toSeq
    val late = col("day") === maxDay ||
      (col("day") === prevDay && col("event_id") % 3 === 0)
    val base = ev.filter(!late)
    base.write.partitionBy("day").parquet(src)
    SourceFormatQueries.rollupOf(base).write.partitionBy("day").parquet(rollup)
    ev.filter(late).write.mode("append").partitionBy("day").parquet(src)
    val touched = Seq(maxDay, prevDay)
    def filesUnder(dir: String, day: String): Set[String] = {
      val f = new java.io.File(s"$dir/day=$day")
      if (!f.isDirectory) Set.empty
      else f.listFiles.map(_.getName).filter(_.endsWith(".parquet")).toSet
    }
    val cleanDay = ev.filter(!col("day").isin(touched: _*))
      .agg(min(col("day"))).collect()(0).getString(0)
    val cleanBefore = filesUnder(rollup, cleanDay)
    assert(cleanBefore.nonEmpty, s"no rollup files for clean day $cleanDay")
    // the refresh's source scan reads a strict file subset (q55 pattern:
    // simple filter plan — scan metrics directly inspectable)
    def numFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.get.metrics("numFiles").value
    }
    val prunedFiles = numFiles(
      spark.read.parquet(src).filter(col("day").isin(touched: _*)))
    val totalFiles = numFiles(spark.read.parquet(src))
    assert(prunedFiles > 0 && prunedFiles < totalFiles,
      s"refresh scan read $prunedFiles of $totalFiles source files — not pruned")
    SourceFormatQueries.refreshRollup(spark, src, rollup, touched)
    // clean partition: byte-identical file set; touched: materialized
    assert(filesUnder(rollup, cleanDay) == cleanBefore,
      "refresh rewrote a rollup partition whose source did not change")
    assert(filesUnder(rollup, maxDay).nonEmpty, "new day's rollup missing")
    // the refreshed rollup equals a from-scratch rebuild over the full source
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("day").cast("string"), col("event_type"),
        col("n_events"), col("user_sum")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
    val got = rows(spark.read.parquet(rollup))
    val want = rows(SourceFormatQueries.rollupOf(spark.read.parquet(src)))
    assert(got == want, "incrementally refreshed rollup must equal a full rebuild")
  }

  test("q65 AQE skew join: final plan splits skewed partitions, result matches q44's") {
    val (skewed, plan) = ScaleJoins.withSkewJoinDemo(spark) {
      val df = graft.queries.ScaleJoinQueries.q65Join(spark, sf)
      val rows = df.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      (rows, df.queryExecution.executedPlan.toString)
    }
    // AQE's toString prints the final plan first, the initial one after
    // (the q63 trick) — the skew split must be in the FINAL plan
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(finalPlan.contains("SortMergeJoin"),
      s"skew demo must sort-merge, not broadcast:\n$finalPlan")
    assert(finalPlan.contains("skew=true"),
      s"no runtime skew split in the final plan:\n$finalPlan")
    // result-transparent: identical output to the plain (default-conf)
    // join — the same claim q44's oracle makes for salting
    val plain = graft.queries.ScaleJoinQueries.q65Join(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(skewed == plain)
  }

  test("q188 measured skew: AQE splits exactly the deliberately hot partition") {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec}
    import org.apache.spark.sql.execution.PartialReducerPartitionSpec
    val exec = ScaleJoins.withMeasuredSkewDemo(spark) {
      val df = graft.queries.ScaleJoinQueries.q188Join(spark, sf)
      df.collect()
      df.queryExecution.executedPlan
    }
    val finalPlan = exec match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    assert(finalPlan.toString.contains("SortMergeJoin"),
      s"measured-skew probe must sort-merge, not broadcast:\n$finalPlan")
    assert(finalPlan.toString.contains("skew=true"),
      s"no runtime skew split in the final plan:\n$finalPlan")
    // the MEASUREMENT claim: under a real 4x-median factor, the split
    // lands on exactly ONE reducer partition — the one key 0 hashes
    // into — and the ~511 even keys stay unsplit. (QueryStageExec
    // nodes are tree leaves, so the walk must descend through their
    // wrapped plans explicitly.)
    def walk(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] =
      p +: (p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)
        case o => o.children.flatMap(walk)
      })
    val reads = walk(finalPlan).collect { case r: AQEShuffleReadExec => r }
    assert(reads.exists(_.hasSkewedPartition),
      s"no AQEShuffleRead reports a skewed partition:\n$finalPlan")
    val splitReducers = reads.flatMap(_.partitionSpecs.collect {
      case p: PartialReducerPartitionSpec => p.reducerIndex
    }).distinct
    assert(splitReducers.size == 1,
      s"expected exactly the hot key's partition split, got reducer " +
        s"indices $splitReducers:\n$finalPlan")
  }

  test("q62 funnel: stage frames broadcast, partial aggs, no degenerate joins") {
    val plan = planOf(SparkEntry.queries("q62_funnel")(spark, sf))
    // each stage joins the events scan against the PREVIOUS stage's
    // (small, shrinking) user frame — those must broadcast, never
    // sort-merge or cross
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 2,
      s"stage frames should broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"degenerate join:\n$plan")
    // per-stage min(ts) anchors combine map-side
    assert(plan.contains("partial_min"), s"stage anchor lost its partial:\n$plan")
  }

  test("q63 time-RANGE window: a single hash exchange feeds the window") {
    val plan = planOf(SparkEntry.queries("q63_time_range_window")(spark, sf))
    assert(plan.contains("Window"), s"no window operator:\n$plan")
    // one shuffle on user_id for the window; the final ORDER BY adds a
    // range exchange, never a second hash one. AQE's toString prints
    // the initial plan after the final one — count the final only.
    val finalPlan = plan.split("== Initial Plan ==").head
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(finalPlan).length
    assert(hashExchanges == 1,
      s"expected exactly one hash exchange (the window's), got $hashExchanges:\n$finalPlan")
  }

  test("q72 batch sessionize: ONE hash exchange serves window, session agg and user rollup") {
    // the scale claim in the query's comment: HashPartitioning(user_id)
    // from the lag/running-sum window satisfies the groupBy(user_id,
    // sess_id) AND the final groupBy(user_id) clustering, so the whole
    // pipeline is one shuffle + per-partition work at any corpus size
    val plan = planOf(SparkEntry.queries("q72_batch_sessionize")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(finalPlan).length
    assert(hashExchanges == 1,
      s"expected exactly one hash exchange, got $hashExchanges:\n$finalPlan")
    assert(plan.contains("Window"), s"no window operator:\n$plan")
  }

  test("s13 MIPS: corpus scan joins only against broadcasts — no corpus shuffle") {
    // the norm bound's scale story: the corpus side must stream through
    // broadcast joins (seed + thresholds are tiny); a hash exchange of
    // the corpus would mean the prune shuffles what it should skip. The
    // only shuffle is the final per-query ranking window over survivors.
    val emb = Tables.load(spark, sf, "embeddings").select("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val plan = planOf(graft.ops.Similarity.mipsTopK(emb, queries, k = 5))
    val finalPlan = plan.split("== Initial Plan ==").head
    assert("BroadcastHashJoin|BroadcastNestedLoopJoin".r
      .findFirstIn(finalPlan).isDefined, s"no broadcast join:\n$finalPlan")
    assert(!finalPlan.contains("SortMergeJoin") &&
      !finalPlan.contains("ShuffledHashJoin"),
      s"corpus side got shuffled into a join:\n$finalPlan")
  }

  test("q74 stratified sample: picks via the bounded aggregate, not a window sort") {
    // exact-k per stratum must stay map-side-bounded: partial TopCells
    // before the exchange, never a corpus-wide row_number sort
    val plan = planOf(SparkEntry.queries("q74_stratified_sample")(spark, sf))
    assert(plan.toLowerCase.contains("topcells"),
      s"expected the bounded TopCells aggregate:\n$plan")
    assert(!plan.contains("Window"), s"fell back to a window sort:\n$plan")
  }

  test("q75 shuffle-shard: one shard exchange serves order, positions and stats") {
    // the shard hash exchange must be the ONLY corpus shuffle: the
    // within-shard sort, the positional window and both aggregate
    // phases all run on that partitioning (the final 8-row orderBy is
    // a range exchange over shard stats, not the corpus), and the scan
    // prunes to doc_id — the order key derives from the id alone.
    // clearCache first: a documents frame cached by ANOTHER suite in
    // the shared session replaces the parquet scan with an
    // InMemoryTableScan and the ReadSchema assertion below reads a
    // plan this test didn't shape (the one full-suite flake of r10)
    spark.catalog.clearCache()
    val plan = planOf(SparkEntry.queries("q75_shuffle_shard")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    assert("Exchange hashpartitioning".r.findAllIn(finalPlan).length == 1,
      s"expected exactly one corpus shuffle on shard:\n$finalPlan")
    assert(finalPlan.contains("ReadSchema: struct<doc_id:bigint>"),
      s"scan must prune to doc_id:\n$finalPlan")
  }

  test("s16 filtered ANN: the metadata predicate reaches the parquet scan") {
    // the filtered-search claim: the label cut is a pushed-down scan
    // filter on the candidate side — rejected rows are never assigned
    // or scored, so candidate work shrinks by the filter's selectivity
    // BEFORE any similarity arithmetic; the cell join stays an
    // equality hash join, never a cartesian.
    // clearCache: a cached embeddings frame from another suite would
    // replace the parquet scan (and its PushedFilters line) with an
    // InMemoryTableScan — same shared-session hazard as q75's test
    spark.catalog.clearCache()
    val plan = planOf(SparkEntry.queries("s16_filtered_ann")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(finalPlan.contains("LessThan(label,3)"),
      s"label predicate not pushed to the scan:\n${finalPlan.take(4000)}")
    assert(finalPlan.contains("BroadcastHashJoin [cell_id"),
      s"cell join is not a broadcast equality join:\n${finalPlan.take(4000)}")
    assert(!finalPlan.contains("CartesianProduct"),
      "filtered ANN degenerated to all-pairs")
  }

  test("d12 containment: candidates meet through the gram join — no cartesian, no nested loop") {
    // the inverted-index claim: every candidate pair arrives through an
    // equality join on the gram posting lists; a cartesian or broadcast
    // nested loop here would mean the operator degenerates to all-pairs
    val plan = planOf(SparkEntry.queries("d12_containment_dedup")(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"containment went all-pairs:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), s"no equi-join in plan:\n$plan")
  }

  test("q73 temperature mix: the corpus-side keep decision joins only a broadcast rate table") {
    // the rate table is |langs|-bounded and must broadcast back; the
    // documents scan side never shuffles into the sampling join
    val plan = planOf(SparkEntry.queries("q73_temperature_mix")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"rate table not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"degenerate join:\n$plan")
  }

  test("dynamic partition overwrite (q59): untouched partitions keep their files") {
    import graft.queries.SourceFormatQueries.withOverwriteMode
    val out = Files.createTempDirectory("graft_dynspec").toString
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
    def filesUnder(lang: String): Set[String] = {
      val dir = new java.io.File(s"$out/lang=$lang")
      if (!dir.isDirectory) Set.empty
      else dir.listFiles.map(_.getName).filter(_.endsWith(".parquet")).toSet
    }
    withOverwriteMode(spark, "dynamic") {
      docs.filter(col("doc_id") % 2 === 0)
        .write.mode("overwrite").partitionBy("lang").parquet(out)
      val zhBefore = filesUnder("zh")
      assert(zhBefore.nonEmpty)
      docs.filter(col("lang") === "en")
        .write.mode("overwrite").partitionBy("lang").parquet(out)
      // run 2 carried no zh rows: run 1's physical files must survive
      assert(filesUnder("zh") == zhBefore,
        "dynamic overwrite touched a partition absent from the batch")
    }
    // contrast: STATIC overwrite of the same second batch wipes zh
    withOverwriteMode(spark, "static") {
      docs.filter(col("lang") === "en")
        .write.mode("overwrite").partitionBy("lang").parquet(out)
      assert(filesUnder("zh").isEmpty,
        "static overwrite should have replaced the whole directory")
    }
  }

  test("q70 grouped top-n ranks via the bounded aggregate, not a window sort") {
    val plan = planOf(graft.SparkEntry.queries("q70_grouped_topn")(spark, sf))
    assert(plan.toLowerCase.contains("topcells"),
      "q70 must rank through the TopCells aggregate (bounded partials)")
    assert(!plan.contains("Window"),
      "the whole point of q70 is NO per-group window sort:\n" + plan)
  }

  test("distributed connected components equals driver union-find on a 100k-edge worst case") {
    // The scale path for dup clustering (c02/c03): past the driver
    // union-find's edge threshold, large-star/small-star must produce
    // IDENTICAL clusters. The synthetic graph is adversarial for the
    // propagation-style alternative this replaced: one 60k-node PATH
    // (diameter 60k — min-label propagation would need 60k rounds; the
    // star rounds collapse it in O(log)), plus 20k two-node components,
    // plus a 10k-edge random blob sharing nodes 0..999 with the path's
    // head so transitive merges cross generators.
    import spark.implicits._
    val path = (0 until 60000).map(i => (i.toLong, i + 1L))
    val tiny = (0 until 20000).map(i => (100000 + 2 * i.toLong, 100001 + 2 * i.toLong))
    val rnd = new scala.util.Random(7)
    val blob = (0 until 10000).map { _ =>
      val a = rnd.nextInt(1000).toLong
      val b = 200000L + rnd.nextInt(5000)
      (a, b)
    }
    val pairs = (path ++ tiny ++ blob).toDF("id_a", "id_b")
      .repartition(8).cache()
    val viaDriver = graft.ops.Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaStars = graft.ops.Dedup.connectedComponents(pairs, driverThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.unpersist()
    assert(viaStars.size == viaDriver.size,
      s"node coverage differs: ${viaStars.size} vs ${viaDriver.size}")
    assert(viaStars == viaDriver,
      "large-star/small-star labels must equal the union-find labels")
    // the path, its blob attachments, and blob targets are ONE component
    // rooted at 0 — the transitivity the clusters exist to capture
    assert(viaStars(60000L) == 0L, "path tail must label to the head's 0")
    assert(blob.forall { case (_, b) => viaStars(b) == 0L },
      "blob nodes reachable through the path head must label 0")
  }

  test("q77 sweep: two-phase prefix sum equals the naive global window, corpus windows partitioned") {
    // the scale claim: the ONLY unpartitioned window runs over |hour
    // buckets| rows; every corpus-sized window is partitioned by
    // bucket, and the offsets come back via a broadcast join. Equality
    // against the naive single-partition sweep certifies the
    // decomposition (the DuckDB oracle re-proves it at sf0.01).
    val twoPhase = SparkEntry.queries("q77_concurrency_sweep")(spark, sf)
    val leaseUs = 30L * 60 * 1000 * 1000
    val hourUs = 3600L * 1000 * 1000
    val ev = Tables.load(spark, sf, "events").select(col("ts"), col("event_id"))
    val ticks = ev.select(col("ts").as("t"), lit(1L).as("delta"),
        col("event_id").as("eid"))
      .unionAll(ev.select((col("ts") + leaseUs).as("t"),
        lit(-1L).as("delta"), col("event_id").as("eid")))
    val wNaive = org.apache.spark.sql.expressions.Window
      .orderBy(col("t"), col("delta"), col("eid"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val naive = ticks.withColumn("conc", sum(col("delta")).over(wNaive))
      .groupBy(expr(s"t DIV $hourUs").as("bucket"))
      .agg(max(col("conc")).as("peak"),
        sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("n_starts"))
      .select((col("bucket") * hourUs).as("hour_us"), col("peak"), col("n_starts"))
    assert(twoPhase.exceptAll(naive).isEmpty && naive.exceptAll(twoPhase).isEmpty,
      "two-phase prefix sum must equal the naive global sweep")
    val plan = planOf(SparkEntry.queries("q77_concurrency_sweep")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    assert("Window \\[[^\\]]*\\], \\[bucket".r.findFirstIn(finalPlan).isDefined,
      s"corpus running sum must be a bucket-partitioned window:\n$finalPlan")
    assert(finalPlan.contains("BroadcastHashJoin"),
      s"bucket offsets must come back via broadcast:\n$finalPlan")
  }

  test("q78 MAD outliers: dimension and stat joins all broadcast, no corpus-side merge join") {
    // part (25 brands), the per-brand medians and the per-brand MADs
    // are all tiny frames: every join against the lineitem-sized side
    // must be broadcast — a SortMergeJoin would shuffle the corpus
    // three times for 25-row lookup tables
    val plan = planOf(SparkEntry.queries("q78_mad_outliers")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(!finalPlan.contains("SortMergeJoin") &&
      !finalPlan.contains("ShuffledHashJoin"),
      s"a stat lookup join shuffled the corpus:\n$finalPlan")
    assert("BroadcastHashJoin".r.findAllIn(finalPlan).length >= 3,
      s"expected 3 broadcast joins (part, med, mad):\n$finalPlan")
  }

  test("t14 collocations: bounded top-k prune before the unigram joins") {
    // the vocabulary-sized unigram table must never broadcast: the
    // top-20 pairs are TakeOrdered (bounded, no full sort) and THEY are
    // the broadcast side of both count lookups
    val plan = planOf(SparkEntry.queries("t14_collocations")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(finalPlan.contains("TakeOrderedAndProject"),
      s"global top-k must be TakeOrdered, not a full sort:\n$finalPlan")
    assert(!finalPlan.contains("SortMergeJoin") &&
      !finalPlan.contains("ShuffledHashJoin"),
      s"unigram lookups must be broadcast joins:\n$finalPlan")
  }

  test("s17 recall eval: internally consistent with its own two rankings") {
    // the harness must report exactly |exact ∩ approx| per query — no
    // more, no less — and basis points stay in [0, 10000]
    import graft.functions.CosineSimilarity.cosineSim
    val rows = SparkEntry.queries("s17_recall_eval")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (matched, bp) = (r.getAs[Long]("n_matched"), r.getAs[Long]("recall_bp"))
      assert(matched >= 0 && matched <= 5, s"matched out of range: $matched")
      assert(bp == matched * 2000, s"bp must be integer-derived: $bp")
    }
    val emb = Tables.load(spark, sf, "embeddings").select("vec_id", "embedding")
    val clean = emb.filter(size(col("embedding")) > 0 &&
      !isnan(cosineSim(col("embedding"), col("embedding"))))
    val queries = clean.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val exact = graft.ops.Similarity.bruteForceTopK(clean, queries, k = 5)
      .select("query_id", "neighbor_id")
    val approx = graft.ops.Similarity.ivfTopK(emb, queries,
        k = 5, nCells = 16, nProbe = 4, trainIters = 2)
      .select("query_id", "neighbor_id")
    val inter = exact.intersect(approx).groupBy("query_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val q = r.getAs[Long]("query_id")
      assert(r.getAs[Long]("n_matched") == inter.getOrElse(q, 0L),
        s"query $q: reported matches differ from the direct intersection")
    }
  }

  test("c04 dataset card: counts conserve against the corpus") {
    val docs = Tables.load(spark, sf, "documents")
    val total = docs.count()
    val card = SparkEntry.queries("c04_dataset_card")(spark, sf).collect()
    assert(card.map(_.getAs[Long]("n_docs")).sum == total,
      "card rows must partition the corpus")
    val bp = card.map(_.getAs[Long]("pct_bp")).sum
    assert(bp <= 10000 && bp > 10000 - card.length,
      s"DIV-floored shares must sum to (10000 - #rows, 10000]: $bp")
    card.foreach { r =>
      assert(r.getAs[Long]("n_dup_docs") <= r.getAs[Long]("n_docs"))
      val mq = r.getAs[Double]("mean_quality")
      assert(mq >= 0.0 && mq <= 1.0, s"quality out of range: $mq")
    }
    val dupTotal = card.map(_.getAs[Long]("n_dup_docs")).sum
    val direct = docs.groupBy(md5(col("text"))).count()
      .filter(col("count") > 1).agg(sum(col("count"))).collect()(0)
    val expected = if (direct.isNullAt(0)) 0L else direct.getLong(0)
    assert(dupTotal == expected,
      s"dup docs must equal the direct hash-group count: $dupTotal vs $expected")
  }

  test("c05 pagerank: distributed iterations equal a driver re-run, mass conserved") {
    // the iterative-join decomposition must reproduce the textbook
    // power iteration exactly (same per-edge round-6 contributions,
    // same decimal-exact sums), and on a symmetric graph — every node
    // has outdegree ≥ 1 — total rank mass stays ≈ 1 (up to the per-node
    // 6-dp rounding the oracle shares)
    val ranks = SparkEntry.queries("c05_pagerank_centrality")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ranks.nonEmpty)
    val mass = ranks.values.sum
    assert(math.abs(mass - 1.0) < 1e-3 + ranks.size * 1e-6,
      s"rank mass must conserve: $mass over ${ranks.size} nodes")
    assert(ranks.values.forall(_ > 0), "every node keeps the 0.15/n floor")
    // driver re-run with identical rounding discipline
    val pairs = graft.ops.Dedup.prefixJaccardPairs(
        Tables.load(spark, sf, "documents"), "doc_id", "text",
        n = 2, prefixLen = 50, maxBucket = 0)
      .filter(col("jaccard") >= 0.3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val nodes = edges.map(_._1).distinct.sorted
    val n = nodes.length
    val odeg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var r = nodes.map(_ -> r6(1.0 / n)).toMap
    (1 to 3).foreach { _ =>
      val in = edges.groupBy(_._2).view.mapValues { es =>
        // decimal-exact sum of round-6 contributions, like the query
        es.map { case (src, _) =>
          BigDecimal(r6(r(src) / odeg(src)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP) }.sum
      }.toMap
      r = nodes.map { id =>
        id -> r6(0.15 / n + 0.85 * in.get(id).map(_.toDouble).getOrElse(0.0))
      }.toMap
    }
    assert(ranks == r, "distributed ranks must equal the driver power iteration")
  }

  test("q79 table diff: class counts conserve both table versions") {
    // same+changed+removed must partition v1, same+changed+added must
    // partition v2 — the conservation that makes the summary trustable
    val byClass = SparkEntry.queries("q79_table_diff")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val v1 = Tables.load(spark, sf, "orders").count()
    val nSame = byClass.getOrElse("same", 0L)
    val nChanged = byClass.getOrElse("changed", 0L)
    val nRemoved = byClass.getOrElse("removed", 0L)
    val nAdded = byClass.getOrElse("added", 0L)
    assert(nSame + nChanged + nRemoved == v1,
      s"v1 not partitioned: $byClass vs $v1")
    val v2 = v1 - nRemoved + nAdded
    assert(nSame + nChanged + nAdded == v2,
      s"v2 not partitioned: $byClass vs $v2")
    assert(nChanged > 0 && nRemoved > 0 && nAdded > 0,
      s"the synthetic twin must exercise every class: $byClass")
  }

  test("q86 co-occurrence: basket join co-partitions on user, lookups after the prune") {
    val plan = planOf(SparkEntry.queries("q86_item_cooccurrence")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(finalPlan.contains("TakeOrderedAndProject"),
      s"global top-k must be TakeOrdered:\n$finalPlan")
    // the pruned 20-row pair frame is the broadcast side of the item-
    // count lookups — the vocabulary-sized frequency table never
    // broadcasts; the basket self-join may hash- or sort-merge on
    // user_id (co-partitioned either way), so only assert the lookups
    val afterPrune = finalPlan.split("TakeOrderedAndProject").last
    assert(afterPrune.contains("BroadcastHashJoin") ||
      finalPlan.contains("BroadcastHashJoin"),
      s"item-count lookups must broadcast the pruned pairs:\n$finalPlan")
    val rows = SparkEntry.queries("q86_item_cooccurrence")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_ab") <= math.min(r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b")), "pair support exceeds an item's support")
      assert(r.getAs[Double]("lift") > 0.0)
    }
  }

  test("q84 latest-by-key: squash is a map-side-bounded aggregate, never a window sort") {
    val plan = planOf(SparkEntry.queries("q84_latest_by_key")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(!finalPlan.contains("Window"),
      s"CDC squash fell back to a per-key history sort:\n$finalPlan")
    assert(finalPlan.contains("partial_max_by") ||
      finalPlan.contains("partial_maxby"),
      s"max_by lost its map-side partial:\n$finalPlan")
  }

  test("q85 equi-depth histogram: buckets partition the table, bounds broadcast") {
    val rows = SparkEntry.queries("q85_equi_depth_histogram")(spark, sf).collect()
    val total = Tables.load(spark, sf, "lineitem").count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == total,
      "bucket counts must sum to the table")
    val bounds = rows.map(_.getAs[Double]("upper_bound"))
    assert(bounds.sameElements(bounds.sorted), "bounds must be monotone")
    // equi-depth: no bucket is more than 2x the ideal depth on this
    // near-uniform fixture (ties at bucket edges shift a few rows)
    val ideal = total.toDouble / rows.length
    assert(rows.map(_.getAs[Long]("n_rows")).max <= 2 * ideal,
      s"a bucket is grossly over-deep: ${rows.map(_.getAs[Long]("n_rows")).toSeq}")
    val plan = planOf(SparkEntry.queries("q85_equi_depth_histogram")(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"the 8-row bound table must broadcast:\n$plan")
  }

  test("q83 gap fill: dense per-user grid, LOCF carries the last observed value") {
    val rows = SparkEntry.queries("q83_gap_fill")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getInt(4)))
    val byUser = rows.groupBy(_._1)
    byUser.foreach { case (u, rs) =>
      val sorted = rs.sortBy(_._2)
      // dense: hours form an unbroken sequence over [min, max]
      val hours = sorted.map(_._2)
      assert(hours.last - hours.head ==
        (hours.length - 1) * 3600L * 1000 * 1000,
        s"user $u grid has holes")
      // the first grid hour is observed by construction
      assert(sorted.head._5 == 0, s"user $u first hour marked filled")
      // LOCF: a filled row carries the previous row's value; an
      // observed row resets it
      sorted.sliding(2).foreach {
        case Array((_, _, _, prevV, _), (_, _, n, v, filled)) =>
          if (filled == 1) {
            assert(n == 0L, "filled row claims events")
            assert(v == prevV, s"user $u LOCF broke: $v vs $prevV")
          }
        case _ => ()
      }
    }
  }

  test("q82 DPP: the dim-derived month set prunes fact partitions at runtime") {
    // the dynamic pruning expression must sit in the fact scan's
    // partition filters (no static predicate can cross the join), and
    // the filtered dim must broadcast — otherwise every partition
    // directory is read before the join discards 80/83 of them
    spark.catalog.clearCache()
    val plan = planOf(SparkEntry.queries("q82_dpp_scan")(spark, sf))
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning in the fact scan:\n${plan.take(4000)}")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"the 3-row month dim must broadcast:\n${plan.take(4000)}")
  }

  test("q81 SCD2 merge: one open row per live key, closed rows precede it") {
    // the history invariants a dimension consumer relies on: every key
    // present in the new version has EXACTLY one open row carrying the
    // new value; churned keys have no open row; validity never inverts
    val rows = SparkEntry.queries("q81_scd2_merge")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    val byKey = rows.groupBy(_._1)
    byKey.foreach { case (k, rs) =>
      val open = rs.filter(_._4.isEmpty)
      assert(open.length <= 1, s"key $k has ${open.length} open rows")
      rs.foreach { case (_, _, from, to) =>
        to.foreach(t => assert(from < t, s"key $k validity inverted"))
      }
    }
    val v1 = Tables.load(spark, sf, "customer")
      .select(col("c_custkey").as("k"), col("c_mktsegment").as("seg"))
    val v2 = v1.filter(col("k") % 13 =!= 0)
      .withColumn("seg",
        when(col("k") % 7 === 0, "MACHINERY").otherwise(col("seg")))
      .unionAll(v1.filter(col("k") % 11 === 0)
        .select((col("k") + 1000000L).as("k"), lit("BUILDING").as("seg")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val openByKey = rows.filter(_._4.isEmpty).map(r => r._1 -> r._2).toMap
    assert(openByKey == v2,
      "open rows must carry exactly the new version's keys and values")
  }

  test("s18 kNN classify: label lookup broadcasts the neighbor frame, votes sum to k") {
    val plan = planOf(SparkEntry.queries("s18_knn_classify")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(finalPlan.contains("BroadcastHashJoin"),
      s"the (queries·k)-row neighbor frame must broadcast:\n$finalPlan")
    val rows = SparkEntry.queries("s18_knn_classify")(spark, sf).collect()
    rows.foreach { r =>
      val votes = r.getAs[Long]("n_votes")
      assert(votes >= 1 && votes <= 5, s"votes out of [1, k]: $votes")
    }
  }

  test("q80 column stats: one pass, exact NDV via Expand, counters conserve") {
    val plan = planOf(SparkEntry.queries("q80_column_stats")(spark, sf))
    assert(plan.contains("Expand"),
      s"multi-distinct must plan via Expand (one input pass):\n$plan")
    val rows = SparkEntry.queries("q80_column_stats")(spark, sf).collect()
    val n = Tables.load(spark, sf, "lineitem").count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") == n)
      assert(r.getAs[Long]("ndv") + r.getAs[Long]("n_null") <= n)
      assert(r.getAs[Double]("min_val") <= r.getAs[Double]("max_val"))
    }
  }

  test("q87 sole-blocking supplier: quantifiers plan as semi/anti joins, name lookup broadcasts") {
    spark.catalog.clearCache()
    val plan = planOf(SparkEntry.queries("q87_waiting_suppliers")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(finalPlan.contains("LeftSemi"),
      s"EXISTS must compile to a semi join:\n${finalPlan.take(4000)}")
    assert(finalPlan.contains("LeftAnti"),
      s"NOT EXISTS must compile to an anti join:\n${finalPlan.take(4000)}")
    assert(finalPlan.contains("BroadcastHashJoin"),
      s"the supplier-name lookup must broadcast:\n${finalPlan.take(4000)}")
    // no quantifier may degenerate into a nested-loop scan of the fact
    assert(!finalPlan.contains("CartesianProduct"),
      s"cartesian product in the quantifier plan:\n${finalPlan.take(4000)}")
  }

  test("q88 small-qty revenue: brand prune broadcasts before the fact scan shuffles") {
    spark.catalog.clearCache()
    val plan = planOf(SparkEntry.queries("q88_small_qty_revenue")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(finalPlan.contains("BroadcastHashJoin"),
      s"the brand part-key filter must broadcast into the lineitem scan:\n${
        finalPlan.take(4000)}")
    assert(!finalPlan.contains("CartesianProduct") &&
      !finalPlan.contains("BroadcastNestedLoopJoin"),
      s"degenerate join in the plan:\n${finalPlan.take(4000)}")
    // the result itself: one row, integer count, 2-dp revenue
    val r = SparkEntry.queries("q88_small_qty_revenue")(spark, sf).head()
    assert(r.getLong(0) >= 0L)
  }

  test("m07 shard pack: the kind exchange serves both the window and the shard aggregate") {
    // packedBin partitions the window on kind; the downstream
    // groupBy(kind, shard_id) clusters on a SUPERSET key, so hash
    // partitioning by kind already co-locates every (kind, shard)
    // group — the plan must reuse that one exchange, not add a second
    spark.catalog.clearCache()
    val plan = planOf(SparkEntry.queries("m07_shard_pack")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r
      .findAllMatchIn(finalPlan).length
    assert(exchanges <= 1,
      s"shard packing must reuse the kind exchange ($exchanges found):\n${
        finalPlan.take(4000)}")
  }

  test("q92 fuzzy lookup: the dictionary side broadcasts, no cartesian") {
    spark.catalog.clearCache()
    val plan = planOf(SparkEntry.queries("q92_fuzzy_lookup_join")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(finalPlan.contains("BroadcastHashJoin"),
      s"the reference dictionary must broadcast:\n${finalPlan.take(4000)}")
    assert(!finalPlan.contains("CartesianProduct") &&
      !finalPlan.contains("BroadcastNestedLoopJoin"),
      s"prefix blocking must keep the probe-candidate join keyed:\n${
        finalPlan.take(4000)}")
  }

  test("t12 BM25: top-10 via TakeOrderedAndProject, never a corpus-wide window") {
    // the round-10 regression's structural half: an unpartitioned
    // row_number window funnels the whole scored corpus through ONE
    // task. The shipped plan must select the top 10 with
    // TakeOrderedAndProject and only then rank — so the (unavoidable,
    // bounded) rank window sits ABOVE the take-ordered in the tree,
    // operating on ≤ 10 rows.
    spark.catalog.clearCache()
    val plan = planOf(SparkEntry.queries("t12_bm25_search")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(finalPlan.contains("TakeOrderedAndProject"),
      s"top-10 must plan as TakeOrderedAndProject:\n${finalPlan.take(4000)}")
    val win = finalPlan.indexOf("Window")
    val top = finalPlan.indexOf("TakeOrderedAndProject")
    assert(win >= 0 && win < top,
      "the rank window must consume the take-ordered output (appear above " +
        s"it in the plan), not the full scored corpus:\n${finalPlan.take(4000)}")
  }

  test("q96 disjunctive branches: hoisted bounds reach both parquet scans") {
    // the weakest preconditions of the OR-of-conjuncts must be pushed
    // to the scans (qty bounds on lineitem, brand set + size bound on
    // part) so the join input shrinks before the residual disjunction
    spark.catalog.clearCache()
    val plan = planOf(SparkEntry.queries("q96_disjunctive_scan")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(finalPlan.contains("LessThanOrEqual(l_quantity,30.0)"),
      s"qty upper bound not pushed to the lineitem scan:\n${finalPlan.take(4000)}")
    assert(finalPlan.contains("In(p_brand"),
      s"brand set not pushed to the part scan:\n${finalPlan.take(4000)}")
    assert(finalPlan.contains("BroadcastHashJoin"),
      s"filtered part must broadcast:\n${finalPlan.take(4000)}")
    assert(!finalPlan.contains("CartesianProduct") &&
      !finalPlan.contains("BroadcastNestedLoopJoin"),
      s"degenerate join:\n${finalPlan.take(4000)}")
    assert(finalPlan.contains("partial_sum"),
      s"revenue aggregate lost its map-side partial:\n${finalPlan.take(4000)}")
  }

  test("q95 Q18 shape: top-100 is TakeOrdered over the HAVING survivors, no window") {
    spark.catalog.clearCache()
    val plan = planOf(SparkEntry.queries("q95_big_orders")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(finalPlan.contains("TakeOrderedAndProject"),
      s"top-100 must plan as top-k, not a full sort:\n${finalPlan.take(4000)}")
    assert(!finalPlan.contains("Window"),
      s"no window should appear anywhere in the Q18 shape:\n${finalPlan.take(4000)}")
    assert(finalPlan.contains("partial_sum"),
      s"the per-order qty aggregate lost its map-side partial:\n${finalPlan.take(4000)}")
    assert(!finalPlan.contains("CartesianProduct") &&
      !finalPlan.contains("BroadcastNestedLoopJoin"),
      s"degenerate join:\n${finalPlan.take(4000)}")
  }

  test("q94 Q7 shape: nation bloc broadcasts, one fact-fact shuffle, clean joins") {
    spark.catalog.clearCache()
    val plan = planOf(SparkEntry.queries("q94_nation_trade")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    // the filtered nation dim must broadcast into supplier AND customer
    assert(finalPlan.contains("BroadcastHashJoin"),
      s"nation bloc must broadcast:\n${finalPlan.take(4000)}")
    // the bloc membership filter reaches a scan, not a post-join filter only
    assert(finalPlan.contains("In(n_name"),
      s"nation bloc filter not pushed to the nation scan:\n${finalPlan.take(4000)}")
    assert(!finalPlan.contains("CartesianProduct") &&
      !finalPlan.contains("BroadcastNestedLoopJoin"),
      s"degenerate join:\n${finalPlan.take(4000)}")
    assert(finalPlan.contains("partial_sum"),
      s"revenue aggregate lost its map-side partial:\n${finalPlan.take(4000)}")
  }

  test("q98 Q9 star: part name filter pushed, dims broadcast, partial aggregation") {
    spark.catalog.clearCache()
    val plan = planOf(SparkEntry.queries("q98_product_profit")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(finalPlan.contains("StringContains(p_name,bolt)"),
      s"LIKE '%%bolt%%' not pushed to the part scan:\n${finalPlan.take(4000)}")
    assert(finalPlan.contains("BroadcastHashJoin"),
      s"star dimensions must broadcast:\n${finalPlan.take(4000)}")
    assert(!finalPlan.contains("CartesianProduct") &&
      !finalPlan.contains("BroadcastNestedLoopJoin"),
      s"degenerate join:\n${finalPlan.take(4000)}")
    assert(finalPlan.contains("partial_sum"),
      s"profit aggregate lost its map-side partial:\n${finalPlan.take(4000)}")
  }

  test("q100 Q10 shape: returnflag pushed, date-pruned orders, top-20 TakeOrdered") {
    spark.catalog.clearCache()
    val plan = planOf(SparkEntry.queries("q100_returned_items")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    // the R-only filter must reach the lineitem scan (prunes ~2/3 pre-join)
    assert(finalPlan.contains("EqualTo(l_returnflag,R)"),
      s"returnflag filter not pushed to the lineitem scan:\n${finalPlan.take(4000)}")
    // the quarter window must reach the orders scan
    assert(finalPlan.contains("GreaterThanOrEqual(o_orderdate"),
      s"order-date window not pushed to the orders scan:\n${finalPlan.take(4000)}")
    // top-20 must never plan as a global sort of every customer
    assert(finalPlan.contains("TakeOrderedAndProject"),
      s"top-20 must plan as TakeOrderedAndProject:\n${finalPlan.take(4000)}")
    assert(!finalPlan.contains("CartesianProduct") &&
      !finalPlan.contains("BroadcastNestedLoopJoin"),
      s"degenerate join:\n${finalPlan.take(4000)}")
  }

  test("q101 Q13 shape: outer join keeps zero-order customers, two-level agg") {
    spark.catalog.clearCache()
    val df = SparkEntry.queries("q101_cust_order_histogram")(spark, sf)
    val plan = planOf(df)
    val finalPlan = plan.split("== Initial Plan ==").head
    // the priority filter prunes orders BEFORE the outer join
    assert(finalPlan.contains("Not(EqualTo(o_orderpriority,1-URGENT))"),
      s"priority filter not pushed to the orders scan:\n${finalPlan.take(4000)}")
    // outer-join preservation: the histogram covers EVERY customer (an
    // inner join would drop zero-order customers and undercount). The
    // sf0.001 fixture has no zero-order customer, so assert coverage,
    // and force the zero bucket with a filter no order passes.
    val total = df.agg(sum(col("custdist"))).collect().head.getLong(0)
    val nCust = Tables.load(spark, sf, "customer").count()
    assert(total == nCust,
      s"histogram covers $total customers, expected $nCust — outer join dropped rows")
    val allFiltered = Tables.load(spark, sf, "customer").select("c_custkey")
      .join(Tables.load(spark, sf, "orders")
          .filter(col("o_orderpriority") === "NO_SUCH_PRIORITY")
          .select("o_orderkey", "o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey")).agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
      .collect()
    assert(allFiltered.length == 1 && allFiltered.head.getLong(0) == 0L &&
      allFiltered.head.getLong(1) == nCust,
      "zero-order customers must land in the k=0 bucket, not vanish")
    assert(finalPlan.contains("partial_count"),
      s"first-level count lost its map-side partial:\n${finalPlan.take(4000)}")
  }

  test("c11 source overlap: gram-keyed postings join, never doc x doc") {
    spark.catalog.clearCache()
    val plan = planOf(SparkEntry.queries("c11_source_overlap")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(!finalPlan.contains("CartesianProduct") &&
      !finalPlan.contains("BroadcastNestedLoopJoin"),
      s"source overlap degenerated to a cross product:\n${finalPlan.take(4000)}")
    // candidates meet through gram equality (posting-list join)
    assert(finalPlan.contains("[gram"),
      s"pair join must key on gram:\n${finalPlan.take(4000)}")
  }

  test("q105 merkle diff: row drill-down is bucket-semi-join pruned") {
    spark.catalog.clearCache()
    val plan = planOf(SparkEntry.queries("q105_merkle_diff")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    // both replicas' row scans must be gated by the differing-bucket
    // set (broadcast LeftSemi), not diffed wholesale
    assert("LeftSemi".r.findAllIn(finalPlan).size >= 2,
      s"drill-down lost its bucket pruning semi joins:\n${finalPlan.take(4000)}")
    assert(!finalPlan.contains("CartesianProduct"),
      s"degenerate join:\n${finalPlan.take(4000)}")
  }

  test("q107 grouped count-distinct plans as the two-level distinct aggregate") {
    spark.catalog.clearCache()
    val plan = planOf(SparkEntry.queries("q107_supplier_variety")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(finalPlan.contains("partial_count(distinct"),
      s"count(DISTINCT) lost its partial/distinct split:\n${finalPlan.take(4000)}")
    assert(finalPlan.contains("BroadcastHashJoin"),
      s"part dim must broadcast:\n${finalPlan.take(4000)}")
  }

  test("q112 rolling distinct: bounded fan-out, no window over the event stream") {
    spark.catalog.clearCache()
    val plan = planOf(SparkEntry.queries("q112_rolling_distinct_users")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    // the sliding distinct must come from Generate(+distinct agg), not
    // a window function dragging a 24h frame over raw events
    assert(!finalPlan.contains("WindowExec") && !finalPlan.contains("Window "),
      s"rolling distinct regressed to a window plan:\n${finalPlan.take(4000)}")
    assert(finalPlan.contains("Generate explode"),
      s"coverage fan-out missing:\n${finalPlan.take(4000)}")
  }

  test("q114 gzip jsonl: staged layout is .json.gz and values survive the codec") {
    val out = Files.createTempDirectory("graft_jsgz_spec").toString
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    docs.repartition(4).write.mode("overwrite")
      .option("compression", "gzip").json(out)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(files.nonEmpty && files.forall(_.getName.endsWith(".json.gz")),
      s"expected .json.gz parts, got: ${files.map(_.getName).toSeq}")
    val rd = spark.read.schema(docs.schema).json(out)
    assert(rd.count() == docs.count(), "row loss through the gzip codec")
    assert(rd.exceptAll(docs).isEmpty && docs.exceptAll(rd).isEmpty,
      "values changed through the gzip codec")
  }

  test("q116 LATERAL decorrelates to a windowed join, not per-row subqueries") {
    spark.catalog.clearCache()
    val plan = planOf(SparkEntry.queries("q116_lateral_topn")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    // the scale guarantee: Catalyst rewrote the correlated LATERAL into
    // a rank-filtered join — no nested-loop evaluation per outer row
    assert(finalPlan.contains("Window"),
      s"decorrelation should produce a window rank:\n${finalPlan.take(4000)}")
    assert(!finalPlan.contains("CartesianProduct") &&
      !finalPlan.contains("BroadcastNestedLoopJoin"),
      s"LATERAL fell back to a nested-loop plan:\n${finalPlan.take(4000)}")
  }

  test("q118 Q6 shape: every predicate reaches the scan, one partial-agg row out") {
    spark.catalog.clearCache()
    // default maxMetadataStringLength (100) truncates the PushedFilters
    // list mid-predicate; widen it so the asserts see every filter
    val prev = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    val plan = try planOf(SparkEntry.queries("q118_forecast_revenue")(spark, sf))
      finally spark.conf.set("spark.sql.maxMetadataStringLength", prev)
    val finalPlan = plan.split("== Initial Plan ==").head
    // the whole query must be scan-side: date range, discount band, and
    // quantity cap all pushed, so 100 TB cost is I/O on a pruned scan
    assert(finalPlan.contains("GreaterThanOrEqual(l_shipdate"),
      s"shipdate lower bound not pushed:\n${finalPlan.take(4000)}")
    assert(finalPlan.contains("LessThan(l_quantity,24.0)"),
      s"quantity cap not pushed:\n${finalPlan.take(4000)}")
    assert(finalPlan.contains("GreaterThanOrEqual(l_discount,0.05)"),
      s"discount band not pushed:\n${finalPlan.take(4000)}")
    assert(finalPlan.contains("partial_sum"),
      s"revenue sum lost its map-side partial:\n${finalPlan.take(4000)}")
    assert(!finalPlan.contains("Window") && !finalPlan.contains("SortMergeJoin"),
      s"Q6 must be a pure scan-aggregate:\n${finalPlan.take(4000)}")
  }

  test("q119 Q14 shape: part broadcasts, the fact side never shuffles") {
    spark.catalog.clearCache()
    val plan = planOf(SparkEntry.queries("q119_promo_revenue")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(finalPlan.contains("BroadcastHashJoin"),
      s"part must be the broadcast side:\n${finalPlan.take(4000)}")
    assert(finalPlan.contains("GreaterThanOrEqual(l_shipdate"),
      s"month range not pushed to the lineitem scan:\n${finalPlan.take(4000)}")
    assert(!finalPlan.contains("Exchange hashpartitioning"),
      s"the fact side must stream through without a key shuffle:\n${finalPlan.take(4000)}")
    assert(finalPlan.contains("partial_sum"),
      s"conditional sums lost their map-side partials:\n${finalPlan.take(4000)}")
  }

  test("q120 Q15 shape: max revenue joins back as a broadcast, never a global rank") {
    spark.catalog.clearCache()
    val plan = planOf(SparkEntry.queries("q120_top_supplier")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(!finalPlan.contains("Window"),
      s"the view+max form must not plan a rank window:\n${finalPlan.take(4000)}")
    assert(finalPlan.contains("BroadcastHashJoin"),
      s"the 1-row max and the supplier dim must broadcast:\n${finalPlan.take(4000)}")
    assert(finalPlan.contains("partial_sum"),
      s"per-supplier revenue lost its map-side partial:\n${finalPlan.take(4000)}")
    assert(!finalPlan.contains("CartesianProduct") &&
      !finalPlan.contains("BroadcastNestedLoopJoin"),
      s"degenerate join:\n${finalPlan.take(4000)}")
  }

  test("q121 Q4 shape: lateness EXISTS plans as a semi join, date prune reaches orders") {
    spark.catalog.clearCache()
    val plan = planOf(SparkEntry.queries("q121_late_priority_audit")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(finalPlan.contains("LeftSemi"),
      s"EXISTS must plan as a left-semi join:\n${finalPlan.take(4000)}")
    assert(finalPlan.contains("GreaterThanOrEqual(o_orderdate"),
      s"order-date window not pushed to the orders scan:\n${finalPlan.take(4000)}")
    assert(!finalPlan.contains("CartesianProduct") &&
      !finalPlan.contains("BroadcastNestedLoopJoin"),
      s"the date-arithmetic join condition degenerated:\n${finalPlan.take(4000)}")
  }

  test("q122 rolling z-score: the scoring window is per-user, never global") {
    spark.catalog.clearCache()
    val plan = planOf(SparkEntry.queries("q122_rolling_zscore")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    // the t12 lesson as a standing guarantee for every new window query:
    // the window must carry a partition key (user_id), so scoring runs
    // thousands of bounded frames in parallel instead of one task
    assert(finalPlan.contains("windowspecdefinition(user_id"),
      s"scoring window lost its user partition:\n${finalPlan.take(4000)}")
    assert(finalPlan.contains("partial_sum") || finalPlan.contains("partial_count"),
      s"the rollup lost its map-side partial:\n${finalPlan.take(4000)}")
  }

  test("q125 edit join: the optimizer injects the length guard ahead of the DP") {
    spark.catalog.clearCache()
    val plan = planOf(SparkEntry.queries("q125_guarded_edit_join")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    // the load-bearing claim: the author wrote only `levenshtein <= 2`;
    // LevenshteinLengthGuard (via GraftExtensions) added the O(1)
    // abs-length-difference reject ahead of the O(k·n) edit DP
    assert(finalPlan.contains("abs((length(probe") ||
      finalPlan.contains("abs((length("),
      s"length guard missing from the executed join plan:\n${finalPlan.take(4000)}")
    assert(finalPlan.contains("BroadcastHashJoin"),
      s"dictionary must broadcast on the prefix block key:\n${finalPlan.take(4000)}")
    assert(!finalPlan.contains("CartesianProduct") &&
      !finalPlan.contains("BroadcastNestedLoopJoin"),
      s"edit join degenerated:\n${finalPlan.take(4000)}")
  }

  test("q126 containment verify: the substring length guard lands in the plan") {
    spark.catalog.clearCache()
    val plan = planOf(SparkEntry.queries("q126_containment_verify")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    // the author wrote only `contains(ta, tb)`; SubstringLengthGuard
    // added the O(1) haystack-length reject ahead of the O(n·m) scan
    assert(finalPlan.contains("length(ta") && finalPlan.contains(">= length(tb"),
      s"substring length guard missing:\n${finalPlan.take(4000)}")
    assert(!finalPlan.contains("CartesianProduct") &&
      !finalPlan.contains("BroadcastNestedLoopJoin"),
      s"containment verify degenerated (candidates must come from the " +
        s"gram block, never doc x doc):\n${finalPlan.take(4000)}")
  }

  test("c14 BFS: constant plan depth, counts conserve, no cartesian hop") {
    spark.catalog.clearCache()
    val df = SparkEntry.queries("c14_bfs_reach")(spark, sf)
    val rows = df.collect().map(r => (r.getInt(0), r.getLong(1)))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"a BFS hop degenerated:\n${plan.take(4000)}")
    // min-distance semantics: every doc in exactly one distance class
    val total = rows.map(_._2).sum
    val docs = Tables.load(spark, sf, "documents").count()
    assert(total == docs, s"distance classes must partition the corpus: $total != $docs")
    assert(rows.map(_._1).forall(d => d >= -1 && d <= 3),
      s"distances outside the 3-hop bound: ${rows.toSeq}")
    // the seed slice itself is dist 0
    val seed = Tables.load(spark, sf, "documents")
      .filter(col("source") === "src0").count()
    assert(rows.toMap.getOrElse(0, 0L) == seed,
      s"dist-0 class must be exactly the source slice")
  }

  test("q128 Q12 shape: date prune reaches the fact scan, one conditional-agg pass") {
    spark.catalog.clearCache()
    val plan = planOf(SparkEntry.queries("q128_priority_by_linestatus")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(finalPlan.contains("GreaterThanOrEqual(l_shipdate"),
      s"ship-year not pushed to the lineitem scan:\n${finalPlan.take(4000)}")
    assert(finalPlan.contains("partial_sum"),
      s"priority split lost its map-side partial:\n${finalPlan.take(4000)}")
    // ONE aggregate pass computes both counts — two filtered aggregates
    // would scan the join twice
    assert("partial_sum\\(CASE WHEN".r.findAllIn(finalPlan).length >= 2,
      s"expected both CASE sums in one aggregate:\n${finalPlan.take(4000)}")
  }

  test("q129 Q18 shape: the volume aggregate runs BELOW the enrichment joins") {
    spark.catalog.clearCache()
    val df = SparkEntry.queries("q129_large_volume_customers")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    val aggIdx = plan.indexOf("partial_sum")
    assert(aggIdx >= 0, s"lineitem rollup lost its partial:\n${plan.take(4000)}")
    // the HAVING filter must sit on the aggregate output, before joins:
    // the plan should never join raw lineitem rows to orders
    assert(plan.contains("(total_qty"),
      s"volume threshold not applied on the aggregate:\n${plan.take(4000)}")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"degenerate join:\n${plan.take(4000)}")
  }

  test("q130 Q19 shape: part slice broadcasts, fact side never key-shuffles") {
    spark.catalog.clearCache()
    val plan = planOf(SparkEntry.queries("q130_bracket_revenue")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    // at sf0.001 the bracket slice can be EMPTY, in which case AQE's
    // EmptyRelation propagation deletes the join outright — the best
    // possible plan, so accept it; otherwise demand the broadcast
    assert(finalPlan.contains("BroadcastHashJoin") ||
      finalPlan.contains("EmptyRelation"),
      s"the bracketed part slice must broadcast (or fold empty):\n${finalPlan.take(4000)}")
    assert(!finalPlan.contains("Exchange hashpartitioning"),
      s"lineitem must stream through without a key shuffle:\n${finalPlan.take(4000)}")
    // the static plan must have chosen the broadcast BEFORE runtime
    // stats: the part-side disjunction bounds it at any corpus scale
    val initial = plan.split("== Initial Plan ==").last
    assert(initial.contains("BroadcastHashJoin") || initial.contains("broadcast"),
      s"initial plan did not broadcast the part slice:\n${initial.take(4000)}")
  }

  test("q131 native as-of: the custom exec plans, no union-window machinery") {
    spark.catalog.clearCache()
    val df = SparkEntry.queries("q131_asof_native")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"),
      s"AsOfJoinExec missing — strategy not installed?\n${plan.take(4000)}")
    assert(!plan.contains("Union"),
      s"union leaked into the native route:\n${plan.take(4000)}")
    // row preservation: |output| == |left|, the operator's contract
    val events = Tables.load(spark, sf, "events").count()
    assert(df.count() == events, "as-of must emit exactly one row per left row")
  }

  test("q138 range join: binning turns the inequality join into a hash join") {
    spark.catalog.clearCache()
    val df = SparkEntry.queries("q138_price_range_join")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the entire point: NO nested-loop/cartesian anywhere in the plan
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"range join degenerated to a nested loop:\n${plan.take(4000)}")
    assert(plan.contains("Join") && plan.contains("__bin"),
      s"expected the bin-keyed equi join:\n${plan.take(4000)}")
    assert(plan.contains("Generate explode") || plan.contains("explode"),
      s"interval binning (explode over covered bins) missing:\n${plan.take(4000)}")
  }

  test("q140 forward as-of: same custom exec, same row preservation") {
    spark.catalog.clearCache()
    val df = SparkEntry.queries("q140_asof_forward")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"),
      s"AsOfJoinExec missing from the forward plan:\n${plan.take(4000)}")
    assert(!plan.contains("Union") && !plan.contains("Window"),
      s"composition machinery leaked into the native route:\n${plan.take(4000)}")
    val events = Tables.load(spark, sf, "events").count()
    assert(df.count() == events, "forward as-of must emit one row per left row")
  }

  test("q134 Q20 shape: both fact reductions precede the semi join") {
    spark.catalog.clearCache()
    val plan = planOf(SparkEntry.queries("q134_overstocked_suppliers")(spark, sf))
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(finalPlan.contains("LeftSemi"),
      s"supplier qualification must plan as a semi join:\n${finalPlan.take(4000)}")
    assert(finalPlan.contains("GreaterThanOrEqual(l_shipdate"),
      s"1995 slice not pushed to the shipped-side scan:\n${finalPlan.take(4000)}")
    assert(!finalPlan.contains("CartesianProduct") &&
      !finalPlan.contains("BroadcastNestedLoopJoin"),
      s"degenerate join:\n${finalPlan.take(4000)}")
  }

  test("q141 interval coverage: one key shuffle beyond the distinct, windows reuse it") {
    spark.catalog.clearCache()
    val df = SparkEntry.queries("q141_interval_coverage")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // exchanges: ONE for the (sk, lo, hi) distinct, ONE for the
    // sk-partitioned windows; the island group-by and the per-supplier
    // rollup must REUSE the window's sk partitioning (HashPartitioning
    // on a subset satisfies the wider clustering), and the only other
    // exchange is the final presentation sort
    val keyShuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(keyShuffles <= 2,
      s"expected <= 2 key shuffles (distinct + window), got $keyShuffles:\n${plan.take(4000)}")
    assert(!plan.contains("Window [") || plan.contains("partitionBy") ||
      plan.contains("windowspecdefinition(sk"),
      s"window must be sk-partitioned, never global:\n${plan.take(4000)}")
  }

  test("c15 link prediction: wedge join stays equi-keyed, no nested loop") {
    spark.catalog.clearCache()
    val df = SparkEntry.queries("c15_link_prediction")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"wedge/anti join degenerated to a nested loop:\n${plan.take(4000)}")
    assert(plan.contains("LeftAnti"),
      s"existing-edge exclusion must plan as an anti join:\n${plan.take(4000)}")
  }

  test("c15 capped regime: the degree cap sits BELOW the wedge join and drops are surfaced") {
    spark.catalog.clearCache()
    // cap = 2 on the sf0.001 co-purchase core: hubs past degree 2 exist,
    // so the dropped side must be non-empty (the loud-accounting contract)
    val (capped, dropped) =
      graft.queries.NorthStarQueries.linkPredictionWithDropped(spark, sf, 2)
    assert(dropped.count() > 0,
      "fixture has hub centers past degree 2 — the cap must SURFACE them, not silently filter")
    // the cap (a z-keyed window count + filter) must be a descendant of
    // the wedge self-join in the optimized plan: work is bounded BEFORE
    // the deg² fan-out, not trimmed after
    val opt = capped.queryExecution.optimizedPlan
    val joinsWithCapBelow = opt.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
        if j.children.exists(_.collectFirst {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.windowExpressions.mkString.contains("_bucket_n") => w
        }.isDefined) => j
    }
    assert(joinsWithCapBelow.nonEmpty,
      s"no join has the _bucket_n cap below it:\n${opt.toString.take(4000)}")
    // capped output stays well-formed (subset semantics are data-dependent
    // through the top-20 limit; the invariant is bounded wedge work)
    assert(capped.collect().length <= 20)
    // cap = 0 is the exact-oracle regime: bit-identical to the registered query
    val exact = graft.queries.NorthStarQueries
      .linkPredictionWithDropped(spark, sf, 0)
    assert(exact._2.count() == 0, "cap=0 must drop nothing")
    val reg = SparkEntry.queries("c15_link_prediction")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(exact._1.collect().map(_.toSeq).toSeq == reg,
      "cap=0 result must equal the registered c15 query")
  }

  test("c15 cap: observed drop accounting rides the main job and matches the dropped frame") {
    spark.catalog.clearCache()
    // the production face (linkPrediction, cap > 0) surfaces its drop
    // accounting through Dataset.observe — CollectMetrics partials in
    // the SAME job that computes the result, zero extra evaluations of
    // the capped subtree. The metrics row must agree exactly with the
    // WithDropped face's second frame (which IS a second evaluation),
    // and the kept results must be identical.
    // cap = 6: the fixture's first regime where the capped result is
    // NON-empty (cap ≤ 4 keeps nothing here, and AQE folds an empty
    // result to EmptyRelationExec — erasing the CollectMetrics node and
    // its accumulators with it, so the metrics never materialize; see
    // the capBucketsObserved scaladoc caveat) while 197 hubs still drop
    val capped = graft.queries.NorthStarQueries.linkPrediction(spark, sf, 6)
    val got = capped.collect().map(_.toSeq).toSeq // the one action
    val m = capped.queryExecution.observedMetrics(
      graft.queries.NorthStarQueries.LinkPredCapMetric)
    val (expectDf, dropped) =
      graft.queries.NorthStarQueries.linkPredictionWithDropped(spark, sf, 6)
    assert(m.getAs[Long]("dropped_rows") == dropped.count(),
      s"observed dropped_rows ${m.getAs[Long]("dropped_rows")} != dropped frame")
    assert(m.getAs[Long]("dropped_buckets") ==
      dropped.select(col("z")).distinct().count(),
      s"observed dropped_buckets ${m.getAs[Long]("dropped_buckets")} != distinct hubs")
    assert(m.getAs[Long]("dropped_buckets") > 0,
      "fixture has hubs past degree 6 — accounting must be non-trivial")
    assert(got == expectDf.collect().map(_.toSeq).toSeq,
      "observed face must keep exactly the WithDropped face's rows")
    // and the observation is ON the kept plan, not a side branch
    assert(capped.queryExecution.optimizedPlan.collectFirst {
      case c: org.apache.spark.sql.catalyst.plans.logical.CollectMetrics => c
    }.isDefined, "CollectMetrics node missing from the kept plan")
  }

  test("q164 variant ingest: one scan, partial aggregation, no UDF in the shred path") {
    spark.catalog.clearCache()
    val df = SparkEntry.queries("q164_variant_ingest")(spark, sf)
    df.collect()
    // the adaptive plan string prints BOTH the final and the initial
    // plan — count scans in the final section only
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the shred is scan → project(parse/extract) → partial agg →
    // exchange → final agg: exactly one file scan, no black-box UDF
    // (variant functions are built-in expressions), and the aggregate
    // combines map-side before the one shuffle
    assert("FileScan".r.findAllIn(plan).length == 1,
      s"variant shred must read the corpus once:\n${plan.take(3000)}")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("UDF("),
      s"no UDF belongs in the shred path:\n${plan.take(3000)}")
    assert(plan.contains("partial_count") || plan.contains("partial_"),
      s"aggregation must combine map-side:\n${plan.take(3000)}")
  }

  test("q165 two-wave densify: the persisted dictionary joins broadcast at dim scale") {
    spark.catalog.clearCache()
    val df = SparkEntry.queries("q165_densify_two_waves")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the dictionary is a dimension (one row per distinct key): the
    // fact-side joins must broadcast it, not sort-merge the fact
    assert(plan.contains("BroadcastHashJoin"),
      s"dictionary joins should broadcast at fixture scale:\n${plan.take(3000)}")
    // the bitmap rollup stays an ObjectHashAggregate with a partial
    // phase — bitmap bytes shuffle, not raw rows
    assert(plan.contains("ObjectHashAggregate"),
      s"bitmap aggregate missing:\n${plan.take(3000)}")
  }

  test("q145 bitmap rollup: map-side partial bitmaps, never raw-row shuffles") {
    spark.catalog.clearCache()
    val df = SparkEntry.queries("q145_bitmap_rollup")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // TypedImperativeAggregate plans as ObjectHashAggregate with a
    // partial phase — the shuffle then carries bitmap bytes per
    // (day, type) group, not event rows
    assert(plan.contains("ObjectHashAggregate"),
      s"bitmap aggregate missing from the plan:\n${plan.take(4000)}")
    assert(plan.contains("partial_id_bitmap") || plan.contains("partial_"),
      s"no partial aggregation phase — raw rows would shuffle:\n${plan.take(4000)}")
  }

  test("q147 CEP relational twin: both pattern joins equi-keyed on user_id, no nested loop") {
    spark.catalog.clearCache()
    val df = SparkEntry.queries("q147_cep_triples")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"range residuals must ride the equi join, not a nested loop:\n${plan.take(4000)}")
  }

  test("q149 OLS: one aggregation pass with map-side partials collects all five statistics") {
    spark.catalog.clearCache()
    val df = SparkEntry.queries("q149_ols_slope")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_"),
      s"sufficient statistics must combine map-side:\n${plan.take(4000)}")
    // one key shuffle (the group-by) + the presentation sort — a second
    // key shuffle would mean the stats were not collected in one pass
    val keyShuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(keyShuffles <= 1,
      s"expected one aggregation shuffle, got $keyShuffles:\n${plan.take(4000)}")
  }

  test("q151 TWAP: the segment window is user-partitioned, never global") {
    spark.catalog.clearCache()
    val df = SparkEntry.queries("q151_twap")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(user_id"),
      s"lead() must partition by user_id:\n${plan.take(4000)}")
    val keyShuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(keyShuffles <= 1,
      s"window and group-by must share the user_id partitioning, got $keyShuffles:\n${plan.take(4000)}")
  }

  test("q153 typed reduce: reduceGroups plans as a partial+final aggregate, not a groups shuffle") {
    spark.catalog.clearCache()
    val df = SparkEntry.queries("q153_typed_reduce")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_reduceaggregator") ||
      plan.contains("partial_"),
      s"typed reduce must combine map-side:\n${plan.take(4000)}")
    assert(!plan.contains("FlatMapGroups"),
      s"reduceGroups must not fall back to a raw groups iterator:\n${plan.take(4000)}")
  }

  test("q156 4-stage CEP relational twin: all three pattern joins equi-keyed, no nested loop") {
    spark.catalog.clearCache()
    val df = SparkEntry.queries("q156_cep_quad")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"range residuals must ride the user_id equi joins:\n${plan.take(4000)}")
  }

  test("q157 densified bitmaps: partial bitmap aggregation, rank never a global window") {
    spark.catalog.clearCache()
    val df = SparkEntry.queries("q157_densified_distinct")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") && plan.contains("partial_"),
      s"bitmap build must combine map-side:\n${plan.take(4000)}")
    assert(!plan.contains("Window"),
      s"densify rank must not plan as a global window:\n${plan.take(4000)}")
  }

  test("q158 SQL sketch registry: every sketch build aggregates in two phases") {
    spark.catalog.clearCache()
    val df = SparkEntry.queries("q158_sql_sketch_registry")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"sketch aggregates missing from the plan:\n${plan.take(4000)}")
    assert(plan.contains("partial_"),
      s"no partial phase — raw token rows would shuffle:\n${plan.take(4000)}")
  }

  test("q162 SQL UDF: analyzer-inlined (no black-box UDF node), dimension broadcast") {
    spark.catalog.clearCache()
    val df = SparkEntry.queries("q162_sql_function_face")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the CREATE FUNCTION ... RETURN body must inline into the plan —
    // a ScalaUDF/Invoke node would break whole-stage codegen, which is
    // the reason to prefer the declarative form
    assert(!plan.contains("UDF") && !plan.contains("Invoke"),
      s"SQL UDF failed to inline:\n${plan.take(4000)}")
    assert(plan.contains("BroadcastHashJoin"),
      s"the 5-row table function must broadcast:\n${plan.take(4000)}")
  }

  test("t24 vocab coverage: the 1000-term vocab broadcasts, tokens never re-shuffle for it") {
    spark.catalog.clearCache()
    val df = SparkEntry.queries("t24_vocab_coverage")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"constant-size vocab must broadcast:\n${plan.take(4000)}")
    assert(plan.contains("TakeOrderedAndProject"),
      s"vocab selection must be a bounded top-k, not a global sort:\n${plan.take(4000)}")
  }

  test("q171 variant read-back: one FileScan, no re-parse, probed paths shredded into the read schema") {
    spark.catalog.clearCache()
    val df = SparkEntry.queries("q171_variant_persist")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the landing zone was parsed ONCE at ingest (staging); the
    // read-back plan must touch the variant binary only — any
    // parse_json here means the storage half of the shredding story
    // regressed to q164's parse-per-query shape
    assert(!plan.contains("parse_json"),
      s"read-back must not re-parse JSON:\n${plan.take(3000)}")
    assert("FileScan".r.findAllIn(plan).length == 1,
      s"read-back must scan the landing table once:\n${plan.take(3000)}")
    // variant shredding pushes the probed paths into the parquet read
    // schema as a typed struct — the scan decodes just those
    // subcolumns, never the full value tree (the scan's ReadSchema
    // prints v:struct<…>, one typed field per probed path, NOT
    // v:variant)
    assert(plan.contains("v:struct<"),
      s"probed paths must shred into a typed struct at the scan:\n${plan.take(3000)}")
    assert(!plan.contains("v:variant"),
      s"the scan must not rehydrate the whole variant:\n${plan.take(3000)}")
    assert(plan.contains("partial_"),
      s"aggregation must combine map-side:\n${plan.take(3000)}")
  }

  test("q172 bloom join: the runtime bloom filter lands in the fact side below the shuffle") {
    spark.catalog.clearCache()
    ScaleJoins.withBloomJoinDemo(spark) {
      val df = graft.queries.ScaleJoinQueries.q172Join(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      // InjectRuntimeFilter builds a bloom filter over the selective
      // dim's keys and probes it in the fact side's filter — the rows
      // drop BEFORE the join's exchange, which is the whole point
      assert(plan.contains("might_contain"),
        s"no runtime bloom probe in the plan:\n${plan.take(5000)}")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"the demo join must be a shuffle join (broadcast already prunes):\n${plan.take(5000)}")
    }
  }

  test("q175 CBO: statistics reorder the star — the filtered dim shrinks customer before the fact join") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    spark.catalog.clearCache()
    def deepestJoinTables(df: org.apache.spark.sql.DataFrame): Set[String] = {
      val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
      joins.last.collectLeaves().flatMap(_.collect {
        case r: org.apache.spark.sql.catalyst.catalog.HiveTableRelation =>
          r.tableMeta.identifier.table
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.catalogTable.map(_.identifier.table).getOrElse("")
      }).toSet
    }
    // without CBO the optimizer keeps syntax order: the DEEPEST join is
    // orders ⋈ customer (the declared-first, expensive one)
    val without = deepestJoinTables(
      graft.queries.ScaleJoinQueries.q175Join(spark, sf))
    assert(without.exists(_.startsWith("orders_s")),
      s"fixture sanity: syntax order must start at the fact join: $without")
    // with stats + joinReorder the deepest join becomes customer ⋈
    // nation — the selective dim applies before the fact is touched
    ScaleJoins.withCboDemo(spark) {
      val reordered = deepestJoinTables(
        graft.queries.ScaleJoinQueries.q175Join(spark, sf))
      assert(reordered.exists(_.startsWith("customer_s")) &&
        reordered.exists(_.startsWith("nation_s")) &&
        !reordered.exists(_.startsWith("orders_s")),
        s"CBO must reorder the filtered dim below the fact join: $reordered")
    }
  }

  test("q176 SHUFFLE_HASH hint: the join hashes the build side instead of sorting both") {
    spark.catalog.clearCache()
    graft.Confs.withConfs(spark, Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")) {
      val df = graft.queries.ScaleJoinQueries.q176Join(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("ShuffledHashJoin"),
        s"the hint must pick the shuffled hash join:\n${plan.take(4000)}")
      assert(!plan.contains("SortMergeJoin"),
        s"no sort-merge (and no fact-side sort) should remain:\n${plan.take(4000)}")
    }
  }

  test("q177 REBALANCE: the written files are advisory-sized and even, not plan-shaped") {
    val out = Files.createTempDirectory("graft_rebalspec").toString
    graft.Confs.withConfs(spark, Seq(
      // sized to the sf0.001 fixture's shuffle bytes so the re-slice
      // visibly splits (production uses the 64MB-class defaults); the
      // coalesce floor must drop with it or it re-merges everything
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1KB")) {
      Tables.load(spark, sf, "lineitem")
        .select("l_orderkey", "l_quantity", "l_returnflag")
        .hint("REBALANCE")
        .write.mode("overwrite").parquet(out)
    }
    val sizes = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(_.length()).sorted
    assert(sizes.length > 1,
      s"rebalance must split the output into multiple advisory-sized files: ${sizes.toSeq}")
    // evenness: no file dominates (the skewed-single-file pathology).
    // Measured against the MEDIAN, not the min — AQE's re-slice merges
    // remainders only below smallPartitionFactor × advisory, so one
    // legitimately small tail file must not flake the suite
    val median = sizes(sizes.length / 2)
    assert(sizes.max < 4L * median,
      s"no file may dominate the rebalanced output: ${sizes.toSeq}")
  }

  test("keyed layout V2 write: the sink's required distribution plans the clustering shuffle") {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    // RequiresDistributionAndOrdering is a planner OBLIGATION: the
    // write's executed plan must carry the hash exchange on key (and
    // the within-task sort) that the sink demanded — the engine
    // produces the key-grouped layout, not caller convention
    val tmp = Files.createTempDirectory("graft_spjwrite").toString
    val plans = scala.collection.concurrent.TrieMap.empty[Long, String]
    val ids = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
        plans.put(ids.incrementAndGet(), qe.executedPlan.toString)
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      Tables.load(spark, sf, "nation")
        .select(col("n_regionkey").cast("long").as("key"),
          col("n_nationkey").cast("long").as("id"),
          col("n_name").as("label"))
        .write.format("graft.sources.KeyedPartitionSource")
        .option("path", tmp).mode("append").save()
      val deadline = System.nanoTime() + 10000L * 1000000L
      def writePlan = plans.values.find(p =>
        p.contains("Exchange hashpartitioning(key") && p.contains("Sort [key"))
      while (writePlan.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(20)
      assert(writePlan.nonEmpty,
        s"no write plan with the required clustering exchange + sort:\n" +
          plans.values.mkString("\n----\n").take(4000))
    } finally spark.listenerManager.unregister(listener)
    // the committed manifest pins the layout and the read round-trips
    assert(new java.io.File(tmp, "_manifest").isFile, "commit wrote no manifest")
    val back = spark.read.format("graft.sources.KeyedPartitionSource")
      .option("path", tmp).load()
    assert(back.count() == 25 &&
      back.agg(sum(col("id"))).head().getLong(0) == (0 until 25).sum,
      "V2 write→read round-trip lost rows")
    // append semantics: a second commit MERGES into the manifest —
    // both writes' rows are visible afterwards
    Tables.load(spark, sf, "nation")
      .select(col("n_regionkey").cast("long").as("key"),
        col("n_nationkey").cast("long").as("id"),
        col("n_name").as("label"))
      .write.format("graft.sources.KeyedPartitionSource")
      .option("path", tmp).mode("append").save()
    val appended = spark.read.format("graft.sources.KeyedPartitionSource")
      .option("path", tmp).load()
    assert(appended.count() == 50,
      s"second append must merge into the manifest: ${appended.count()} rows")
  }

  test("q180 clusterBy: metadata round-trips, files hold disjoint slabs, probe touches few") {
    val (tbl, (kmin, kmax)) =
      graft.queries.SourceFormatQueries.ensureClusterByTable(spark, sf)
    // the API surface: clusterBy is recorded as catalog metadata and
    // DESCRIBE reports the Clustering Information block — the contract
    // a clustering-aware connector (and a human) reads the layout from
    val desc = spark.sql(s"DESCRIBE TABLE EXTENDED $tbl").collect()
      .map(r => s"${r.getString(0)}|${r.getString(1)}").mkString("\n")
    assert(desc.contains("# Clustering Information") && desc.contains("l_orderkey"),
      s"clusterBy metadata lost:\n$desc")
    // the physical layout: every file holds one narrow disjoint
    // l_orderkey slab (footer min-max carries a range probe), unlike
    // the unshaped twin where every file spans ~the whole key range
    def fileSpans(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.groupBy(input_file_name().as("f"))
        .agg(min(col("l_orderkey")).as("k0"), max(col("l_orderkey")).as("k1"))
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    val span = (kmax - kmin).toDouble
    val cf = fileSpans(spark.table(tbl))
    assert(cf.size >= 8, s"clustered table produced only ${cf.size} files")
    val avgSpan = cf.map { case (a, b) => (b - a).toDouble }.sum / cf.size / span
    assert(avgSpan <= 0.2, s"clustered files span too much of the range: $avgSpan")
    // the q180 probe interval intersects only the slab's files — what a
    // stats-aware reader skips everything else by
    val lo = kmin + (kmax - kmin) * 40 / 100
    val hi = kmin + (kmax - kmin) * 42 / 100
    val touched = cf.count { case (a, b) => b >= lo && a <= hi }
    assert(touched <= 3,
      s"probe interval intersects $touched of ${cf.size} clustered files")
    val udir = Files.createTempDirectory("graft_uncluster").toString
    Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag"))
      .repartition(16) // hash spray: the layout clusterBy exists to fix
      .write.mode("overwrite").parquet(udir)
    val uf = fileSpans(spark.read.parquet(udir))
    val uTouched = uf.count { case (a, b) => b >= lo && a <= hi }
    assert(uTouched == uf.size,
      s"unclustered twin should intersect every file: $uTouched of ${uf.size}")
    // and the probe's predicate reaches the scan as a pushed filter
    val q = SparkEntry.queries("q180_clusterby")(spark, sf)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("l_orderkey") && plan.contains("PushedFilters"),
      s"q180 scan lost pushdown:\n$plan")
  }

  test("q179 parameter markers fold to literals the scan can push down") {
    // the plan-quality half of the injection-safety story: a bound
    // marker is a LITERAL in the resolved plan, so the parameterized
    // predicates reach the parquet scan as pushed filters exactly like
    // hand-written constants — string-spliced SQL gets this too, but
    // only markers get it WITHOUT a reparse per value
    // default maxMetadataStringLength truncates PushedFilters at 100
    // chars — widen it so the full filter list is assertable
    val plan = graft.Confs.withConfs(spark,
      Seq("spark.sql.maxMetadataStringLength" -> "2000")) {
      val q = SparkEntry.queries("q179_sql_params")(spark, sf)
      q.collect()
      q.queryExecution.executedPlan.toString
    }
    assert(plan.contains("PushedFilters"), s"no pushdown section:\n${plan.take(3000)}")
    assert(plan.contains("LessThan(l_quantity,25.0)"),
      s"bound :maxq must push as a literal comparison:\n${plan.take(3000)}")
    assert(plan.contains("EqualTo(l_linestatus,F)"),
      s"bound :st must push as a literal equality:\n${plan.take(3000)}")
  }

  test("q173 SPJ: connector-reported key grouping plans join AND aggregate with zero Exchange") {
    spark.catalog.clearCache()
    ScaleJoins.withSpjDemo(spark) {
      val df = graft.queries.ScaleJoinQueries.q173Join(spark, sf)
      val plan = planOf(df)
      // KeyGroupedPartitioning from the DSv2 scans satisfies the
      // join's clustered distribution as stored; the groupBy(key)
      // inherits it — not one Exchange anywhere in the plan
      assert(!plan.contains("Exchange"),
        s"storage-partitioned join must not shuffle:\n${plan.take(5000)}")
      assert(plan.contains("SortMergeJoin"),
        s"expected the shuffle-free sort-merge join:\n${plan.take(5000)}")
    }
  }

  test("q184 approx_top_k: the native sketch aggregates in two phases") {
    spark.catalog.clearCache()
    val df = SparkEntry.queries("q184_approx_topk")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the whole point of the sketch at 100 TB: map-side partials merge,
    // raw rows never shuffle to a single aggregator
    assert(plan.contains("approx_top_k"),
      s"native sketch missing from the plan:\n${plan.take(4000)}")
    assert(plan.contains("partial_"),
      s"no partial phase — raw rows would shuffle:\n${plan.take(4000)}")
  }

  test("q183 _metadata: hidden columns don't widen the data read") {
    spark.catalog.clearCache()
    val df = SparkEntry.queries("q183_file_metadata")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // _metadata is constant per file (served from the file listing, not
    // decoded from pages); the only DATA column the aggregate needs is
    // l_quantity — l_orderkey was written but must be pruned from the
    // read, and l_returnflag comes from partition values
    val readSchemas = "ReadSchema: struct<[^>]*>".r.findAllIn(plan).toSeq
    assert(readSchemas.nonEmpty, s"no FileScan in:\n${plan.take(4000)}")
    assert(readSchemas.exists(_.contains("l_quantity")),
      s"expected the quantity read: $readSchemas")
    assert(readSchemas.forall(rs => !rs.contains("l_orderkey")),
      s"column pruning lost — l_orderkey read but never used: $readSchemas")
  }

  test("q187 SQL table function: body inlines (no black-box UDF/generator node)") {
    spark.catalog.clearCache()
    val df = SparkEntry.queries("q187_sql_table_function")(spark, sf)
    // the declarative TVF's whole value at 100 TB: the body becomes an
    // ordinary relational subtree the optimizer owns — an imperative
    // UDTF would be an opaque row generator nothing can push into.
    // Assert on actual optimized-plan NODES (not plan-dump substrings,
    // which false-positive on StaticInvoke renderings or literals):
    // no generator, no python/scala UDF evaluation — and the inlined
    // body's Window(row_number) subtree present.
    val opt = df.queryExecution.optimizedPlan
    val generators = opt.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(generators.isEmpty,
      s"SQL table function left a generator node:\n${opt.treeString.take(4000)}")
    val udfExprs = opt.collect { case n => n.expressions }
      .flatten.flatMap(_.collect {
      case u: org.apache.spark.sql.catalyst.expressions.ScalaUDF => u
      case p: org.apache.spark.sql.catalyst.expressions.PythonUDF => p
    })
    assert(udfExprs.isEmpty,
      s"SQL table function left opaque UDF calls: $udfExprs")
    val windows = opt.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty && windows.exists(_.windowExpressions.exists(
      _.collectFirst {
        case _: org.apache.spark.sql.catalyst.expressions.RowNumber => ()
      }.nonEmpty)),
      s"expected the inlined row_number rank subtree:\n${opt.treeString.take(4000)}")
  }
}
