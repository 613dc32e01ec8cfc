package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Source/sink format coverage beyond CSV + parquet + REST: JSON-lines
  * and ORC round-trips. Each query writes the table through the format
  * and reads it back before aggregating, so the oracle (which reads the
  * original parquet) certifies byte-faithful round-tripping, not just
  * the aggregation. */
object SourceFormatQueries {

  /** Size-targeted compaction: write `df` as exactly
    * ceil(payload bytes / targetBytes) round-robin parquet files and
    * return that file count. The layout is derived from the data — the
    * difference between a compaction job and a hardcoded
    * `repartition(200)`. */
  private[graft] def compact(df: DataFrame, payload: org.apache.spark.sql.Column,
                             out: String, targetBytes: Long): Int = {
    val totalBytes = Tables.firstLongOption(
      df.agg(sum(payload.cast("long")).as("b"))).getOrElse(0L)
    val nFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    df.repartition(nFiles).write.mode("overwrite").parquet(out)
    nFiles
  }

  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(

    // ---- JSON-lines sink + schema-explicit source -------------------------
    ("q42_jsonl_roundtrip",
      (s: SparkSession, d: String) => {
        val out = graft.TempDirs.create("graft_jsonl")
        val docs = Tables.load(s, d, "documents")
          .select(col("doc_id"), col("lang"), col("source"), col("text"))
        docs.write.mode("overwrite").json(out)
        s.read.schema(docs.schema).json(out)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("text")).cast("long")).as("total_chars"),
            min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
          .orderBy(col("lang"))
      },
      Some("""SELECT lang, COUNT(*) AS n_docs,
             |  CAST(SUM(length(text)) AS BIGINT) AS total_chars,
             |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // ---- malformed-CSV quarantine read (PERMISSIVE + corrupt column) ------
    // Real crawls deliver broken records; the ingest contract is
    // q76/st28's: count them, keep them inspectable, never let them
    // poison the table OR vanish. The fixture stages a CSV in which
    // doc_id ≡ 0 (mod 13) rows carry an unparseable numeric field;
    // the read runs PERMISSIVE with columnNameOfCorruptRecord, so a
    // malformed row surfaces as (parsed-what-we-could, raw record) and
    // the summary splits good/quarantined with an id checksum — one
    // misrouted row breaks the hash. (Spark's corrupt-column
    // restriction — no queries referencing ONLY the corrupt column
    // straight off the files — does not bite: the aggregate reads data
    // columns beside it, so no cache/checkpoint materialization is
    // needed and the plan stays one map-side parse + aggregate.)
    // The oracle never reads the CSV — it replays the corruption rule
    // from the source table, certifying the PERMISSIVE parse
    // recovered every parseable field.
    ("q91_corrupt_csv_quarantine",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.types._
        val dir = graft.TempDirs.create("graft_badcsv")
        val docs = Tables.load(s, d, "documents")
        docs.select(concat_ws(",",
            col("doc_id"),
            when(col("doc_id") % 13 === 0, lit("NOT_A_NUMBER"))
              .otherwise(graft.ops.TextAnalysis.tokenCount(col("text"))
                .cast("long").cast("string")),
            col("lang")).as("value"))
          .write.mode("overwrite").text(dir)
        val schema = StructType(Seq(
          StructField("doc_id", LongType), StructField("n_tokens", LongType),
          StructField("lang", StringType),
          StructField("_corrupt_record", StringType)))
        val parsed = s.read.schema(schema)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .csv(dir)
        parsed.agg(
          sum(when(col("_corrupt_record").isNull, 1L).otherwise(0L))
            .as("n_good"),
          sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L))
            .as("n_quarantined"),
          sum(when(col("_corrupt_record").isNull, col("doc_id")))
            .as("good_id_sum"),
          sum(when(col("_corrupt_record").isNull, col("n_tokens")))
            .as("good_token_sum"))
      },
      Some("""SELECT
             |  CAST(SUM(CASE WHEN doc_id % 13 <> 0 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_good,
             |  CAST(SUM(CASE WHEN doc_id % 13 = 0 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_quarantined,
             |  CAST(SUM(CASE WHEN doc_id % 13 <> 0 THEN doc_id END)
             |    AS BIGINT) AS good_id_sum,
             |  CAST(SUM(CASE WHEN doc_id % 13 <> 0 THEN
             |    len(regexp_extract_all(text, '[A-Za-z0-9]+')) END)
             |    AS BIGINT) AS good_token_sum
             |FROM documents""".stripMargin)),

    // ---- ORC sink + source ------------------------------------------------
    // The round-trip is projected to exactly the aggregation's columns:
    // format fidelity per column is what the oracle certifies, and
    // writing columns the query never reads would time dead I/O.
    ("q43_orc_roundtrip",
      (s: SparkSession, d: String) => {
        val out = graft.TempDirs.create("graft_orc")
        Tables.load(s, d, "lineitem")
          .select(col("l_quantity"), col("l_extendedprice"), col("l_returnflag"))
          .write.mode("overwrite").orc(out)
        s.read.orc(out)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("l_quantity")).as("sum_qty"), // integer-valued doubles: exact
            sum(col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
              .cast("double").as("sum_price"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n_items,
             |  SUM(l_quantity) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- size-targeted file compaction ------------------------------------
    // The small-files maintenance job every long-lived 100 TB table
    // needs: derive the output file count from the DATA (ceil of total
    // payload bytes / a target file size) instead of a hardcoded
    // partition count, round-robin repartition to exactly that many
    // files, and certify content parity through the rewrite. The
    // oracle reads the ORIGINAL table — equal aggregates certify the
    // compaction lost and duplicated nothing. File count and content
    // parity are asserted in ScaleSpec.
    ("q52_compaction",
      (s: SparkSession, d: String) => {
        val out = graft.TempDirs.create("graft_compact")
        val docs = Tables.load(s, d, "documents")
          .select(col("doc_id"), col("lang"), col("source"), col("text"))
        // one aggregate job sizes the layout; 64 KiB target keeps the
        // fixture multi-file (production uses 128–1024 MiB)
        compact(docs, octet_length(col("text")), out, targetBytes = 64L * 1024)
        s.read.parquet(out)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(octet_length(col("text")).cast("long")).as("total_bytes"),
            min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
          .orderBy(col("source"))
      },
      Some("""SELECT source, COUNT(*) AS n_docs,
             |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
             |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // ---- plain-text sink + source (line-oriented corpus format) -----------
    // The format most raw LLM corpora arrive in: one record per line,
    // tab-separated fields. Write via the text sink, read back with the
    // text source, re-parse with a bounded split (limit 3 keeps any
    // tabs inside the payload intact) — the oracle on the original
    // parquet certifies lossless line encoding.
    // Fixture invariant (line formats, not this query): text contains
    // no \n/\r (the text source would split one record into several
    // rows) and lang is non-null (concat_ws skips nulls, shifting field
    // positions) — both hold for the generated corpus at every sf, and
    // the oracle's aggregate equality is what would catch a violation.
    // A corpus without that guarantee must escape newlines (or use
    // q42's JSONL sink, which escapes by construction).
    ("q54_text_roundtrip",
      (s: SparkSession, d: String) => {
        val out = graft.TempDirs.create("graft_text")
        Tables.load(s, d, "documents")
          .select(concat_ws("\t", col("doc_id").cast("string"), col("lang"),
            col("text")).as("value"))
          .write.mode("overwrite").text(out)
        s.read.text(out)
          .select(split(col("value"), "\t", 3).as("f"))
          .select(element_at(col("f"), 1).cast("long").as("doc_id"),
            element_at(col("f"), 2).as("lang"),
            element_at(col("f"), 3).as("text"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("text")).cast("long")).as("total_chars"),
            sum(col("doc_id")).as("id_sum"))
          .orderBy(col("lang"))
      },
      Some("""SELECT lang, COUNT(*) AS n_docs,
             |  CAST(SUM(length(text)) AS BIGINT) AS total_chars,
             |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // ---- DYNAMIC partition pruning (runtime join-driven skipping) ---------
    // q55's static month-range prune needs the predicate in the query
    // text; the 100 TB fact-dim reality is the months arrive through a
    // JOIN — here the distinct order months of a Q1-1996 dim filter (3
    // of ~83 fact partitions). No static rule can push a dim filter
    // across the join, so Spark's dynamic partition pruning broadcasts
    // the filtered dim, evaluates the month set at RUNTIME, and the
    // fact scan skips every non-qualifying partition directory before
    // reading a row — the difference between scanning 3 months and 83
    // at any corpus size. ScaleSpec asserts the dynamicpruning
    // expression sits in the scan's PartitionFilters and the dim
    // broadcasts. Oracle runs the same join unpartitioned: equal
    // aggregates certify runtime pruning dropped no qualifying row.
    ("q82_dpp_scan",
      (s: SparkSession, d: String) => {
        val fact = s.read.parquet(ensureShipDateLayout(s, d))
        val dim = Tables.load(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
          .select(date_format(col("o_orderdate"), "yyyy-MM").as("m"))
          .distinct()
        fact.join(dim, col("ship_month") === col("m"))
          .groupBy(col("ship_month"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("ship_month"))
      },
      Some("""WITH m AS (
             |  SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS m FROM orders
             |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             |    AND o_orderdate < TIMESTAMP '1996-04-01')
             |SELECT ship_month, COUNT(*) AS n_items, SUM(l_quantity) AS sum_qty
             |FROM (SELECT strftime(l_shipdate, '%Y-%m') AS ship_month, l_quantity
             |      FROM lineitem) l
             |JOIN m ON l.ship_month = m.m
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- date-partitioned layout + pruned scan ----------------------------
    // The canonical 100 TB fact-table layout: partition directories by
    // ship month, rows sorted by l_shipdate within each file so parquet
    // row-group min/max stats prune inside files too. The layout is
    // built once per (JVM, sf) — write-once/scan-many, same rule as
    // q45's bucketed tables — and the timed query is the month-range
    // scan, which touches 12 of ~83 partition directories
    // (PartitionFilters + numFiles asserted in ScaleSpec). The oracle
    // reads the original unpartitioned table: equal aggregates certify
    // pruning dropped no in-range rows.
    ("q55_partition_pruned_scan",
      (s: SparkSession, d: String) => {
        val dir = ensureShipDateLayout(s, d)
        s.read.parquet(dir)
          .filter(col("ship_month").between("1996-01", "1996-12"))
          .groupBy(col("ship_month"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("l_quantity")).as("sum_qty"), // integer-valued doubles: exact
            sum(col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
              .cast("double").as("sum_price"))
          .orderBy(col("ship_month"))
      },
      Some("""SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
             |  COUNT(*) AS n_items, SUM(l_quantity) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
             |FROM lineitem
             |WHERE strftime(l_shipdate, '%Y-%m') BETWEEN '1996-01' AND '1996-12'
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- schema-evolution read (mergeSchema over heterogeneous files) -----
    // Files written before a column existed read back as NULL in that
    // column under mergeSchema — no rewrite of old data, queries
    // null-fill at the edge (coalesce to a sentinel). The oracle
    // reconstructs the same evolution rule from the original table.
    ("q57_schema_evolution",
      (s: SparkSession, d: String) => {
        val dir = ensureEvolvedLayout(s, d)
        s.read.option("mergeSchema", "true").parquet(dir)
          .groupBy(col("lang"),
            coalesce(col("source"), lit("pre_source")).as("source"))
          .agg(count(lit(1)).as("n_docs"),
            min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
          .orderBy(col("lang"), col("source"))
      },
      Some("""SELECT lang,
             |  CASE WHEN doc_id % 2 = 0 THEN 'pre_source' ELSE source END AS source,
             |  COUNT(*) AS n_docs, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
             |FROM documents
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- Z-ordered layout + two-dimension pruned scan ---------------------
    // Multi-column data skipping: the layout sorts by the Morton
    // interleave of min-max-normalized (l_partkey, l_suppkey), so ANY
    // file holds a near-rectangle of the key plane and per-file min/max
    // stats stay narrow on BOTH columns (ScaleSpec measures the spans
    // vs a single-key sort, where the second column's stats are
    // useless). The timed query range-filters both dimensions; the
    // predicate bounds derive from data min/max with the same integer
    // arithmetic on both engines, so the oracle is exact at every sf.
    ("q58_zorder_scan",
      (s: SparkSession, d: String) => {
        val (dir, (pmin, pmax, smin, smax)) = ensureZOrderLayout(s, d)
        val pLo = pmin + (pmax - pmin) * 3 / 10
        val pHi = pmin + (pmax - pmin) * 5 / 10
        val sLo = smin + (smax - smin) * 3 / 10
        val sHi = smin + (smax - smin) * 5 / 10
        s.read.parquet(dir)
          .filter(col("l_partkey").between(pLo, pHi) &&
            col("l_suppkey").between(sLo, sHi))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH r AS (SELECT MIN(l_partkey) AS pmin, MAX(l_partkey) AS pmax,
             |             MIN(l_suppkey) AS smin, MAX(l_suppkey) AS smax
             |           FROM lineitem)
             |SELECT l_returnflag, COUNT(*) AS n_items, SUM(l_quantity) AS sum_qty
             |FROM lineitem, r
             |WHERE l_partkey BETWEEN pmin + (pmax - pmin) * 3 // 10
             |                    AND pmin + (pmax - pmin) * 5 // 10
             |  AND l_suppkey BETWEEN smin + (smax - smin) * 3 // 10
             |                    AND smin + (smax - smin) * 5 // 10
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- dynamic partition overwrite (incremental-refresh sink) -----------
    // The reference's silver/gold writes are STATIC overwrite — the
    // whole directory is replaced every run (SURVEY.md §2 item 5). The
    // incremental upgrade a scheduled 100 TB pipeline needs is DYNAMIC
    // mode: an update batch replaces ONLY the partitions it carries,
    // untouched partitions keep their files. Here run 1 lands the even
    // half of every lang partition; run 2 carries only lang='en' (all
    // of it) and must not disturb the other langs — so the final state
    // is "all en + even others", which the oracle reconstructs from
    // the original table. ScaleSpec asserts run 1's non-en files
    // literally survive run 2.
    ("q59_dynamic_overwrite",
      (s: SparkSession, d: String) => {
        val out = graft.TempDirs.create("graft_dynover")
        val docs = Tables.load(s, d, "documents")
          .select(col("doc_id"), col("text"), col("lang"))
        withOverwriteMode(s, "dynamic") {
          docs.filter(col("doc_id") % 2 === 0)
            .write.mode("overwrite").partitionBy("lang").parquet(out)
          docs.filter(col("lang") === "en")
            .write.mode("overwrite").partitionBy("lang").parquet(out)
        }
        s.read.parquet(out)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
          .orderBy(col("lang"))
      },
      Some("""SELECT lang, COUNT(*) AS n_docs,
             |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
             |FROM documents
             |WHERE lang = 'en' OR (lang <> 'en' AND doc_id % 2 = 0)
             |GROUP BY lang ORDER BY lang""".stripMargin)),

    // ---- incremental materialized-rollup refresh --------------------------
    // Incremental view maintenance at partition granularity — the
    // maintenance loop behind every serving rollup over an append-mostly
    // fact table: a delta delivery lands in the source (here: one brand-
    // new day plus LATE data for an existing day — the case that forces
    // re-aggregation from source, not count-patching), the touched
    // partition set is derived FROM THE DELTA (bounded driver metadata,
    // never a clean-partition rescan), only those days are recomputed
    // from the source's pruned scan, and dynamic overwrite swaps exactly
    // those rollup partitions. Cost ∝ changed days at any table size;
    // ScaleSpec asserts the refresh scan reads a strict file subset AND
    // untouched rollup partition files survive byte-identical. The
    // oracle recomputes the full rollup from the events table, so it
    // certifies the refreshed rollup equals a from-scratch rebuild —
    // the IVM correctness contract.
    ("q66_incremental_rollup",
      (s: SparkSession, d: String) => {
        val tmp = graft.TempDirs.create("graft_rollup")
        val src = s"$tmp/src"; val rollup = s"$tmp/rollup"
        val ev = Tables.load(s, d, "events")
          .withColumn("day", date_format(Tables.eventTime(col("ts")), "yyyy-MM-dd"))
          .select(col("day"), col("event_type"), col("event_id"), col("user_id"))
        // deterministic delivery split: the newest day arrives entirely
        // in delivery two (a new partition), and every third event of
        // the second-newest day arrives late (an existing partition)
        val Seq(maxDay, prevDay) = ev.select(col("day")).distinct()
          .orderBy(col("day").desc).limit(2).collect().map(_.getString(0)).toSeq
        val late = col("day") === maxDay ||
          (col("day") === prevDay && col("event_id") % 3 === 0)
        val base = ev.filter(!late)
        base.write.partitionBy("day").parquet(src)
        rollupOf(base).write.partitionBy("day").parquet(rollup)
        val delta = ev.filter(late)
        delta.write.mode("append").partitionBy("day").parquet(src)
        val touched = delta.select(col("day")).distinct()
          .collect().map(_.getString(0)).toSeq
        refreshRollup(s, src, rollup, touched)
        s.read.parquet(rollup)
          .select(col("day").cast("string").as("day"), col("event_type"),
            col("n_events"), col("user_sum"))
          .orderBy(col("day"), col("event_type"))
      },
      Some("""SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
             |  event_type, COUNT(*) AS n_events,
             |  CAST(SUM(user_id) AS BIGINT) AS user_sum
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---- partitioned upsert (SCD-1 MERGE on plain parquet) ----------------
    // The row-level merge completing the table-maintenance family:
    // append (q59), delete (q64), aggregate refresh (q66) — and now
    // MERGE: updates arrive as (key, new value) with NO partition info
    // (how CDC feeds actually look), inserts as full rows. Discovery
    // reuses q64's two-stage machinery — per-partition id blooms
    // probed driver-side for candidates, exact broadcast confirm over
    // just those directories — then ONE dynamic overwrite rewrites the
    // affected partitions as survivors (anti-join) ∪ updated rows
    // (partition recovered from the pre-image) ∪ inserts. Cost ∝
    // affected partitions at any table size; every other partition's
    // files are untouched (ScaleSpec's q64 test pins the shared
    // mechanics; the oracle certifies last-writer-wins row semantics
    // by recomputing the post-merge table from scratch). The update
    // key list is takedown-shaped (bounded) — corpus-scale feeds
    // would batch by partition instead of collecting keys.
    ("q68_partitioned_upsert",
      (s: SparkSession, d: String) => {
        val out = graft.TempDirs.create("graft_upsert")
        val docs = Tables.load(s, d, "documents")
          .select(col("doc_id"), col("text"), col("source"))
        docs.write.mode("overwrite").partitionBy("source").parquet(out)
        writeIdBloomStats(docs, out)
        // the merge feed (deterministic: source = src(doc_id mod 20), so
        // updates live in src1 only and inserts declare src3)
        val updates = docs
          .filter(col("doc_id") % 20 === 1 && col("doc_id") % 3 === 0)
          .select(col("doc_id"), concat(lit("v2 "), col("text")).as("text"))
        val maxId = Tables.firstLongOption(docs.agg(max(col("doc_id"))))
          .getOrElse(0L)
        val inserts = docs
          .filter(col("doc_id") % 20 === 3 && col("doc_id") % 5 === 0)
          .select((col("doc_id") + maxId + 1L).as("doc_id"),
            concat(lit("new "), col("text")).as("text"), col("source"))
        val updateIds = updates.select(col("doc_id")).collect()
          .map(_.getLong(0)).toSeq
        val candidates = bloomCandidateSources(s, out, updateIds)
        val table = s.read.parquet(out)
        val confirmed = table.filter(col("source").isin(candidates: _*))
          .join(broadcast(updates.select(col("doc_id"))), "doc_id")
          .select(col("source")).distinct().collect().map(_.getString(0)).toSeq
        val insertSources = inserts.select(col("source")).distinct()
          .collect().map(_.getString(0)).toSeq
        val affected = (confirmed ++ insertSources).distinct
        val pre = table.filter(col("source").isin(affected: _*))
        val survivors = pre.join(
          broadcast(updates.select(col("doc_id"))), Seq("doc_id"), "left_anti")
        val updated = pre.select(col("doc_id"), col("source"))
          .join(broadcast(updates), "doc_id")
        withOverwriteMode(s, "dynamic") {
          survivors.unionByName(updated).unionByName(inserts)
            .write.mode("overwrite").partitionBy("source").parquet(out)
        }
        s.read.parquet(out)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("text")).cast("long")).as("total_chars"),
            sum(col("doc_id")).as("id_sum"))
          .orderBy(col("source"))
      },
      Some("""WITH post AS (
             |  SELECT doc_id, source,
             |    CASE WHEN doc_id % 20 = 1 AND doc_id % 3 = 0
             |         THEN 'v2 ' || text ELSE text END AS text
             |  FROM documents
             |  UNION ALL
             |  SELECT doc_id + (SELECT MAX(doc_id) FROM documents) + 1 AS doc_id,
             |    source, 'new ' || text AS text
             |  FROM documents WHERE doc_id % 20 = 3 AND doc_id % 5 = 0)
             |SELECT source, COUNT(*) AS n_docs,
             |  CAST(SUM(length(text)) AS BIGINT) AS total_chars,
             |  CAST(SUM(doc_id) AS BIGINT) AS id_sum
             |FROM post GROUP BY source ORDER BY source""".stripMargin)),

    // ---- targeted delete (takedown / right-to-be-forgotten) ---------------
    // The deletion-side counterpart of q59's append-side refresh: purge
    // a LIST OF ROW IDS from a partitioned table while rewriting only
    // the partitions that contain them. The takedown list arrives as
    // bare ids (no partition info — how deletion requests actually
    // come). Discovery is two-stage so it never scans the full table:
    // per-partition id BLOOMS (materialized next to the layout at write
    // time — see writeIdBloomStats) are probed driver-side to derive
    // CANDIDATE partitions, then an exact broadcast semi-join over just
    // those directories confirms the affected set — a bloom has no
    // false negatives, so the prefilter is sound, and its ~% false
    // positives only cost a few extra pruned-scan dirs. The rewrite
    // scan is pruned the same way, a broadcast anti-join drops the
    // victims, and dynamic overwrite replaces only affected partitions —
    // every other partition's files are untouched (ScaleSpec asserts
    // file-level survival AND that discovery reads a strict subset of
    // files). At 100 TB this is the plain-parquet form of DELETE WHERE
    // with stats-pruned file skipping: cost ∝ affected partitions, not
    // table size. The oracle recomputes the post-delete aggregates from
    // the original table, certifying the purge dropped exactly the
    // victims and nothing else.
    ("q64_targeted_delete",
      (s: SparkSession, d: String) => {
        val out = graft.TempDirs.create("graft_delete")
        val docs = Tables.load(s, d, "documents")
          .select(col("doc_id"), col("lang"), col("text"), col("source"))
        docs.write.mode("overwrite").partitionBy("source").parquet(out)
        writeIdBloomStats(docs, out) // write-time stats, amortized
        // the takedown list: bare doc ids (spans 2 of ~20 partitions here,
        // but the code derives that — it never assumes). Takedown lists
        // are BOUNDED EXTERNAL INPUTS (a legal/compliance feed, not a
        // query result), so the fixture derivation caps itself the same
        // way: deterministic orderBy + limit makes the collect provably
        // ≤ 10k ids at ANY sf, and the oracle replays the identical cap.
        val victimIds = docs
          .filter(col("source").isin("src3", "src7") && col("doc_id") % 3 === 0)
          .select(col("doc_id")).orderBy(col("doc_id")).limit(10000)
          .collect().map(_.getLong(0)).toSeq
        val victims = s.createDataset(victimIds)(
          org.apache.spark.sql.Encoders.scalaLong).toDF("doc_id")
        val table = s.read.parquet(out)
        val candidates = bloomCandidateSources(s, out, victimIds)
        val affected =
          if (candidates.isEmpty) Seq.empty[String]
          else table.filter(col("source").isin(candidates: _*))
            .join(broadcast(victims), "doc_id")
            .select(col("source")).distinct().collect().map(_.getString(0)).toSeq
        // an empty takedown list touches nothing — skip the rewrite
        if (affected.nonEmpty) {
          val survivors = table.filter(col("source").isin(affected: _*))
            .join(broadcast(victims), Seq("doc_id"), "left_anti")
          // dynamic overwrite only replaces partitions PRESENT in the
          // written data: a partition whose every row is a victim (the
          // whole-source purge — the most common real takedown) emits
          // no rows, so its old files would silently survive. Collect
          // the surviving partitions BEFORE the rewrite (afterwards the
          // frame's file listing points at replaced files), then delete
          // fully-purged partition directories explicitly.
          val survived = survivors.select(col("source")).distinct()
            .collect().map(_.getString(0)).toSet
          withOverwriteMode(s, "dynamic") {
            survivors.write.mode("overwrite").partitionBy("source").parquet(out)
          }
          // Hadoop FileSystem, not java.io.File: the same delete works on
          // HDFS/S3A at cluster scale (the store's substrate rule,
          // DedupStore.scala's metadata layer)
          (affected.toSet -- survived).foreach { src =>
            val p = new org.apache.hadoop.fs.Path(out, s"source=$src")
            val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
            fs.delete(p, true): Unit
          }
        }
        s.read.parquet(out)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(octet_length(col("text")).cast("long")).as("total_bytes"),
            min(col("doc_id")).as("min_id"))
          .orderBy(col("source"))
      },
      Some("""WITH victims AS (
             |  SELECT doc_id FROM documents
             |  WHERE source IN ('src3', 'src7') AND doc_id % 3 = 0
             |  ORDER BY doc_id LIMIT 10000)
             |SELECT source, COUNT(*) AS n_docs,
             |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
             |  MIN(doc_id) AS min_id
             |FROM documents
             |WHERE doc_id NOT IN (SELECT doc_id FROM victims)
             |GROUP BY source ORDER BY source""".stripMargin)),

    // ---- gzip-compressed JSONL sink + source ------------------------------
    // q42's codec face: real corpora ship as .jsonl.gz (CommonCrawl,
    // most hub datasets), where gzip's non-splittability is THE scale
    // decision — one file is one task no matter its size, so the
    // writer keeps many medium files (the upstream repartition) rather
    // than a few giant ones, and reader parallelism is capped by the
    // file count. The staged write lands as .json.gz (ScaleSpec
    // asserts the layout); the read is schema-explicit
    // (q42's rule — no inference scan) and aggregates per source with
    // token totals, certifying values survive the codec byte-exactly.
    ("q114_compressed_jsonl",
      (s: SparkSession, d: String) => {
        val out = graft.TempDirs.create("graft_jsgz")
        val docs = Tables.load(s, d, "documents")
          .select(col("doc_id"), col("source"), col("text"))
        docs.repartition(4).write.mode("overwrite")
          .option("compression", "gzip").json(out)
        s.read.schema(docs.schema).json(out)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(graft.ops.TextAnalysis.tokenCount(col("text")).cast("long"))
              .as("total_tokens"),
            sum(col("doc_id")).as("id_checksum"))
          .orderBy(col("source"))
      },
      Some("""SELECT source, COUNT(*) AS n_docs,
             |  CAST(SUM(len(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS BIGINT)
             |    AS total_tokens,
             |  CAST(SUM(doc_id) AS BIGINT) AS id_checksum
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // ---- malformed-record quarantine (semi-structured ingest) --------------
    // Real feeds interleave broken JSON with good records; dropping
    // them silently corrupts counts, failing the job on one bad line
    // stalls the pipeline. The fixture embeds documents as JSON lines
    // and deterministically corrupts every 7th (truncation — invalid
    // JSON) and every 11th (valid JSON, wrong shape: doc_id as a
    // string). from_json is PERMISSIVE per row: parse failures yield
    // null structs, shape failures yield null fields — both routed to
    // the quarantine count, good rows to per-source totals, in ONE
    // pass over the lines (conditional aggregation, no second scan).
    // The oracle replays the same split with json_valid + json_type.
    ("q137_json_quarantine",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.types._
        // the line is CONCAT-built (not engine to_json) so both engines
        // construct byte-identical fixtures regardless of their JSON
        // escaping conventions; the payload is sanitized to [a-z0-9 ]
        val payload = regexp_replace(lower(substring(col("text"), 1, 40)),
          "[^a-z0-9 ]", "")
        val raw = concat(lit("{\"doc_id\":"), col("doc_id").cast("string"),
          lit(",\"source\":\""), col("source"),
          lit("\",\"text\":\""), payload, lit("\"}"))
        val lines = Tables.load(s, d, "documents")
          .select(col("doc_id"), col("source"), col("text"))
          .select(
            when(col("doc_id") % 7 === 0,
                substring(raw, 1, 14)) // truncated: invalid JSON
              .when(col("doc_id") % 11 === 0, // valid JSON, doc_id not a number
                regexp_replace(raw, "^\\{\"doc_id\":(\\d+)",
                  "{\"doc_id\":\"x$1\""))
              .otherwise(raw).as("line"))
        val schema = StructType(Seq(StructField("doc_id", LongType),
          StructField("source", StringType), StructField("text", StringType)))
        val parsed = lines.select(from_json(col("line"), schema).as("rec"))
        parsed.select(
            when(col("rec").isNull || col("rec.doc_id").isNull, lit(null))
              .otherwise(col("rec.source")).as("source"),
            (col("rec").isNull || col("rec.doc_id").isNull)
              .cast("long").as("bad"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_lines"), sum(col("bad")).as("n_quarantined"))
          .orderBy(col("source"))
      },
      Some("""WITH raw AS (
             |  SELECT doc_id, source,
             |    '{"doc_id":' || CAST(doc_id AS VARCHAR) ||
             |    ',"source":"' || source || '","text":"' ||
             |    regexp_replace(lower(substring(text, 1, 40)),
             |      '[^a-z0-9 ]', '', 'g') || '"}' AS j
             |  FROM documents),
             |lines AS (
             |  SELECT CASE WHEN doc_id % 7 = 0 THEN substring(j, 1, 14)
             |    WHEN doc_id % 11 = 0 THEN
             |      regexp_replace(j, '^\{"doc_id":(\d+)', '{"doc_id":"x\1"')
             |    ELSE j END AS line
             |  FROM raw),
             |parsed AS (
             |  SELECT CASE WHEN json_valid(line)
             |      AND json_type(json_extract(line, '$.doc_id')) IN
             |        ('UBIGINT', 'BIGINT')
             |      THEN json_extract_string(line, '$.source') END AS source
             |  FROM lines)
             |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_lines,
             |  CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_quarantined
             |FROM parsed GROUP BY 1 ORDER BY source""".stripMargin)),

    // ---- XML ingest (from_xml, schema'd extraction + quarantine) -----------
    // The remaining feed format of the semi-structured tier (q137 JSON
    // fixed-schema, q164 VARIANT schema-less): Spark 4's built-in
    // `from_xml` parses element trees against a declared StructType —
    // PERMISSIVE per row, so truncated markup yields a null struct and
    // routes to the quarantine count, optional elements (every 3rd row
    // carries <score>) land as null fields, both in ONE pass. The
    // fixture is CONCAT-built (q137's rule: byte-identical on both
    // engines); DuckDB has no XML functions, so the oracle certifies
    // the extraction by replaying the construction arithmetic — the
    // q166 epistemics: values, nulls, and the quarantine split must
    // all round-trip Spark's parser exactly.
    ("q167_xml_ingest",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.types._
        val base = concat(lit("<rec><id>"), col("doc_id"),
          lit("</id><src>"), col("source"), lit("</src>"),
          when(col("doc_id") % 3 === 0,
            concat(lit("<score>"), col("doc_id") % 97, lit("</score>")))
            .otherwise(lit("")),
          lit("</rec>"))
        val lines = Tables.load(s, d, "documents")
          .select(col("doc_id"), col("source"))
          .select(when(col("doc_id") % 13 === 0, substring(base, 1, 12))
            .otherwise(base).as("xml"))
        val schema = StructType(Seq(StructField("id", LongType),
          StructField("src", StringType), StructField("score", LongType)))
        lines.select(from_xml(col("xml"), schema).as("rec"))
          .select(
            when(col("rec").isNull || col("rec.id").isNull, lit(null))
              .otherwise(col("rec.src")).as("src"),
            col("rec.id").as("id"), col("rec.score").as("score"),
            (col("rec").isNull || col("rec.id").isNull)
              .cast("long").as("bad"))
          .groupBy(col("src"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("bad")).as("n_quarantined"),
            sum(when(col("bad") === 0L, col("id"))).as("id_sum"),
            count(col("score")).as("n_scored"),
            sum(col("score")).as("score_sum"))
          .orderBy(col("src"))
      },
      Some("""WITH p AS (
             |  SELECT
             |    CASE WHEN doc_id % 13 = 0 THEN NULL ELSE source END AS src,
             |    CASE WHEN doc_id % 13 = 0 THEN NULL ELSE doc_id END AS id,
             |    CASE WHEN doc_id % 13 <> 0 AND doc_id % 3 = 0
             |      THEN doc_id % 97 END AS score,
             |    CASE WHEN doc_id % 13 = 0 THEN 1 ELSE 0 END AS bad
             |  FROM documents)
             |SELECT src, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  CAST(SUM(bad) AS BIGINT) AS n_quarantined,
             |  CAST(SUM(id) AS BIGINT) AS id_sum,
             |  CAST(COUNT(score) AS BIGINT) AS n_scored,
             |  CAST(SUM(score) AS BIGINT) AS score_sum
             |FROM p GROUP BY 1 ORDER BY src""".stripMargin)),

    // ---- clusterBy write layout + clustered-table pruned scan --------------------
    // Spark 4's DataFrameWriterV2 `clusterBy` — liquid-style clustering
    // declared as TABLE METADATA (clusteringColumns in the catalog, no
    // explicit bucket count to outgrow), completing the layout family
    // beside partitionBy (q55), bucketBy (q45), z-order (q58), and
    // REBALANCE (q177). In OSS the declaration is metadata-only — the
    // connector owns the physical layout (Delta/Iceberg cluster on
    // write and compaction) — so the table is created through the V2
    // API and its data arrives pre-shaped the way such a connector
    // would shape it: range-partitioned + sorted on the clustering
    // column, one narrow l_orderkey slab per file. The timed query is
    // the read side a clustered table exists for: a selective range
    // probe on the clustering column, where per-file/row-group min-max
    // stats skip everything outside the slab (ScaleSpec measures the
    // spans and the file-intersection count vs an unclustered twin;
    // it also pins the Clustering Information round-trip through
    // DESCRIBE). Bounds derive from data min/max with the same integer
    // arithmetic on both engines, so the oracle is exact at every sf.
    ("q180_clusterby",
      (s: SparkSession, d: String) => {
        val (tbl, (kmin, kmax)) = ensureClusterByTable(s, d)
        val lo = kmin + (kmax - kmin) * 40 / 100
        val hi = kmin + (kmax - kmin) * 42 / 100
        s.table(tbl)
          .filter(col("l_orderkey").between(lo, hi))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("l_quantity").cast("long")).as("sum_qty"),
            sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"))
          .orderBy(col("l_returnflag"))
      },
      Some("""WITH r AS (SELECT MIN(l_orderkey) AS kmin, MAX(l_orderkey) AS kmax
             |           FROM lineitem)
             |SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_items,
             |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
             |    AS BIGINT) AS cents
             |FROM lineitem, r
             |WHERE l_orderkey BETWEEN kmin + (kmax - kmin) * 40 // 100
             |                     AND kmin + (kmax - kmin) * 42 // 100
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---- _metadata hidden file columns (file-level provenance) -------------------
    // The physical complement to c08's row-level ledger: every scan in
    // Spark exposes `_metadata` (file_path / file_name / file_size /
    // file_modification_time / file_block_*) as hidden columns —
    // requested by NAME only, so an unqueried scan pays nothing. This
    // is the lineage/debugging workhorse at 100 TB ("which FILE did the
    // corrupt row come from"), and it composes with partitioned layouts:
    // the face writes lineitem as a l_returnflag-partitioned layout
    // (repartition on the partition column → each value lands in
    // exactly ONE task → exactly one file per partition dir, a
    // deterministic invariant, not a guess — chosen for certifiability;
    // at 100 TB one task per partition value is a skew hazard, so a
    // production layout job repartitions on (partition col, salt) or
    // lets REBALANCE size the files, q177's face), reads it back, and
    // re-derives the partition value FROM the file path — certifying
    // that path-level provenance agrees with the data. file_size and
    // file_modification_time are environment-dependent bytes, so they
    // certify as presence invariants (all files sized > 0, mtime
    // non-null on every row), which hash deterministically.
    ("q183_file_metadata",
      (s: SparkSession, d: String) => {
        val out = graft.TempDirs.create("graft_q183")
        Tables.load(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
          .repartition(col("l_returnflag"))
          .write.partitionBy("l_returnflag").mode("overwrite").parquet(out)
        s.read.parquet(out)
          .select(
            regexp_extract(col("_metadata.file_path"),
              "l_returnflag=([^/]+)/", 1).as("flag"),
            col("_metadata.file_name").as("fname"),
            col("_metadata.file_size").as("fsize"),
            col("_metadata.file_modification_time").as("fmtime"),
            col("l_quantity"))
          .groupBy(col("flag"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("l_quantity").cast("long")).as("sum_qty"),
            countDistinct(col("fname")).as("n_files"),
            (min(col("fsize")) > 0).as("all_sized"),
            (count(col("fmtime")) === count(lit(1))).as("mtime_present"))
          .orderBy(col("flag"))
      },
      Some("""SELECT l_returnflag AS flag, CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             |  CAST(1 AS BIGINT) AS n_files,
             |  TRUE AS all_sized, TRUE AS mtime_present
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),
  )

  /** q64's write-time partition stats: one row per `source` partition
    * holding a bloom filter over that partition's doc ids, materialized
    * under `_stats/` next to the layout (underscore-prefixed, so table
    * scans ignore it). A takedown probes these driver-side and touches
    * only candidate partitions — discovery cost ∝ victim partitions +
    * one tiny stats read, never a full-table scan. Sized for the whole
    * table's row count (a uniform overestimate per partition keeps the
    * fpp below the library default everywhere). Staleness after a
    * partition rewrite is SOUND: a bloom with deleted ids still has no
    * false negatives for the rows that remain, it just over-admits —
    * rebuild per rewritten partition when fpp drift matters. */
  private[graft] def writeIdBloomStats(docs: DataFrame, out: String): Unit = {
    val n = math.max(docs.count(), 1L)
    docs.groupBy(col("source"))
      .agg(graft.ops.Sketches.bloomAgg(col("doc_id"), n).as("bloom"))
      .coalesce(1).write.mode("overwrite").parquet(s"$out/_stats")
  }

  /** Partitions whose bloom might contain ANY victim id — the sound
    * prefilter (no false negatives) for q64's exact confirm join. The
    * probe hashes exactly as [[graft.ops.Sketches.bloomAgg]]'s build
    * side (xxhash64 of the long id, seed 42, then the library's own
    * putLong), so driver and executors can never drift. */
  private[graft] def bloomCandidateSources(s: SparkSession, out: String,
                                           victimIds: Seq[Long]): Seq[String] =
    s.read.parquet(s"$out/_stats").collect().toSeq
      .filter { r =>
        val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("bloom")))
        victimIds.exists(id => bf.mightContainLong(
          org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(id, 42L)))
      }
      .map(_.getAs[String]("source"))

  /** Run `body` with `spark.sql.sources.partitionOverwriteMode` set to
    * `mode`, restoring the previous setting after. */
  private[graft] def withOverwriteMode[T](s: SparkSession, mode: String)(body: => T): T =
    graft.Confs.withConfs(s,
      Seq("spark.sql.sources.partitionOverwriteMode" -> mode))(body)

  /** q66's rollup aggregate — ONE definition shared by the initial
    * build and every refresh (aggregate drift between build and refresh
    * is the classic incremental-view-maintenance bug). */
  private[graft] def rollupOf(ev: DataFrame): DataFrame =
    ev.groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("user_id")).as("user_sum"))

  /** q66's refresh: recompute ONLY `days` from the source's partition-
    * pruned scan and dynamic-overwrite exactly those rollup partitions.
    * Every other rollup partition's files are never read or written. */
  private[graft] def refreshRollup(s: SparkSession, srcDir: String,
                                   rollupDir: String, days: Seq[String]): Unit =
    if (days.nonEmpty) withOverwriteMode(s, "dynamic") {
      rollupOf(s.read.parquet(srcDir).filter(col("day").isin(days: _*)))
        .write.mode("overwrite").partitionBy("day").parquet(rollupDir)
    }

  /** q58's Z-ordered lineitem layout + the (pmin, pmax, smin, smax)
    * bounds it was normalized with, memoized per (JVM, sf). 16 range
    * partitions of the z-value ⇒ ~16 files, each a near-rectangle of
    * the (partkey, suppkey) plane. */
  private val zorderLayouts =
    scala.collection.concurrent.TrieMap.empty[String, (String, (Long, Long, Long, Long))]

  private[graft] def ensureZOrderLayout(
      s: SparkSession, d: String): (String, (Long, Long, Long, Long)) =
    zorderLayouts.getOrElseUpdate(d, {
      val out = graft.TempDirs.create("graft_zorder")
      val li = Tables.load(s, d, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"),
          col("l_quantity"), col("l_returnflag"))
      val r = li.agg(min(col("l_partkey")), max(col("l_partkey")),
        min(col("l_suppkey")), max(col("l_suppkey"))).head()
      val bounds = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      li.withColumn("__z", graft.ops.ScaleJoins.zValue16(
          col("l_partkey"), bounds._1, bounds._2,
          col("l_suppkey"), bounds._3, bounds._4))
        .repartitionByRange(16, col("__z"))
        .sortWithinPartitions(col("__z"))
        .drop("__z")
        .write.mode("overwrite").parquet(out)
      (out, bounds)
    })

  /** q180's clusterBy'd lineitem table, memoized per (JVM, sf) with the
    * (kmin, kmax) orderkey bounds its probe derives from. Created via
    * DataFrameWriterV2 `clusterBy` (the metadata declaration), data
    * pre-shaped as a clustering connector would lay it out: 16 range
    * partitions of l_orderkey, sorted within each, so every file holds
    * one narrow disjoint slab and footer min-max stats carry the probe.
    * Lives in its own session-catalog database at a shutdown-cleaned
    * location (the [[graft.ops.ScaleJoins]] bucketed-tables idiom). */
  private val clusterByTables =
    scala.collection.concurrent.TrieMap.empty[String, (String, (Long, Long))]

  private lazy val clusterDbLocation: String =
    graft.TempDirs.create("graft_cluster")

  private[graft] def ensureClusterByTable(
      s: SparkSession, d: String): (String, (Long, Long)) =
    clusterByTables.getOrElseUpdate(d, {
      s.sql("CREATE DATABASE IF NOT EXISTS graft_cluster " +
        s"LOCATION '$clusterDbLocation'")
      val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
      val tbl = s"graft_cluster.lineitem_cb_$sfx"
      val li = Tables.load(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_returnflag"))
      val r = li.agg(min(col("l_orderkey")), max(col("l_orderkey"))).head()
      val bounds = (r.getLong(0), r.getLong(1))
      if (!s.catalog.tableExists(tbl)) {
        li.repartitionByRange(16, col("l_orderkey"))
          .sortWithinPartitions(col("l_orderkey"))
          .writeTo(tbl).using("parquet").clusterBy("l_orderkey").create()
      }
      (tbl, bounds)
    })

  /** q57's two-batch schema-evolved layout, memoized per (JVM, sf):
    * batch 1 (even doc ids) wrote (doc_id, lang) before the `source`
    * column existed; batch 2 (odd ids) wrote (doc_id, lang, source).
    * Long-lived 100 TB tables ALWAYS look like this — columns arrive
    * over time and old files never rewrite. */
  private val evolvedLayouts = scala.collection.concurrent.TrieMap.empty[String, String]

  private[graft] def ensureEvolvedLayout(s: SparkSession, d: String): String =
    evolvedLayouts.getOrElseUpdate(d, {
      val out = graft.TempDirs.create("graft_evolve")
      val docs = Tables.load(s, d, "documents")
      docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("lang"))
        .write.mode("overwrite").parquet(s"$out/batch=1")
      docs.filter(col("doc_id") % 2 =!= 0)
        .select(col("doc_id"), col("lang"), col("source"))
        .write.mode("overwrite").parquet(s"$out/batch=2")
      out
    })

  /** Per-JVM memoized ship-month-partitioned lineitem layout for q55:
    * directories by `ship_month`, rows sorted by `l_shipdate` within
    * partitions (file/row-group stats line up with the sort key).
    * Built from Bench's warmup so the timed query measures the pruned
    * SCAN — the repeated operation — not the one-off layout job. */
  private val shipLayouts = scala.collection.concurrent.TrieMap.empty[String, String]

  private[graft] def ensureShipDateLayout(s: SparkSession, d: String): String =
    shipLayouts.getOrElseUpdate(d, {
      val out = graft.TempDirs.create("graft_shippart")
      Tables.load(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
          col("l_shipdate"))
        .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
        .repartition(col("ship_month"))
        .sortWithinPartitions(col("l_shipdate"))
        .write.mode("overwrite").partitionBy("ship_month").parquet(out)
      out
    })
}
