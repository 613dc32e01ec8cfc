package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import graft.streaming.DedupStore

/** DataSource V2 READ path for the store's change feed — the consumer
  * half of the CDC story st16/st18 started with API calls, as a
  * Spark-native source:
  *
  * {{{
  *   spark.readStream.format("graft.sources.DedupStoreChanges")
  *     .option("path", storeDir).option("since", cursor).load()
  * }}}
  *
  * Emits `(op, thash, text, keep_id, n_copies)` rows:
  *  - `op = 'upsert'`: a CURRENT row of a bucket rewritten by a version
  *    ordered after the consumer's cursor — [[DedupStore.changedSince]]'s
  *    exact semantics, including the tombstone filter (suppressed texts
  *    never surface as upserts), with `thash = xxhash64(text)` so the
  *    consumer keys deletes and upserts identically;
  *  - `op = 'delete'`: a tombstoned hash (`text`/`keep_id`/`n_copies`
  *    NULL) from `_TOMBSTONES/t*` files the cursor has not consumed.
  *    Applying upserts then deletes per batch reconstructs store state
  *    (st18's algebra); both are idempotent, absorbing bucket-granular
  *    and compaction-fold re-delivery.
  *
  * Offsets: `{version, tomb-file-index}` — version names are the store's
  * own commit points (`vN[.s]`, totally ordered), tombstone files are an
  * append-only indexed log (compaction consolidates into a HIGHER index,
  * so the offset never moves backwards; re-emitted survivor hashes are
  * idempotent deletes). Micro-batch (start, end] plans one partition per
  * changed data file — the same manifest-pruned file set `changedSince`
  * reads, bytes ∝ rewritten buckets, never store size — plus one bounded
  * partition carrying the new tombstone hashes. Batch reads (`spark.read`)
  * deliver the full catch-up from `since` in one shot.
  *
  * The executor-side reader uses parquet-hadoop's example Group API
  * directly (the files are the store's own three-column parquet — no
  * schema inference needed), keeping the source dependency-free; the
  * tombstone prefilter set rides the reader factory as plain longs
  * (bounded takedown lists — the store's documented broadcast regime).
  */
class DedupStoreChanges extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DedupStoreChanges.CHANGE_SCHEMA

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new StoreChangesTable(
      Option(properties.get("path")).getOrElse(throw new IllegalArgumentException(
        "DedupStoreChanges requires .option(\"path\", <store root>)")),
      Option(properties.get("since")),
      Option(properties.get("sincetomb")).orElse(
        Option(properties.get("sinceTomb"))).map(_.toLong))
}

object DedupStoreChanges {
  val CHANGE_SCHEMA: StructType = StructType(Seq(
    StructField("op", StringType, nullable = false),
    StructField("thash", LongType, nullable = false),
    StructField("text", StringType),
    StructField("keep_id", LongType),
    StructField("n_copies", LongType)))

  /** Offset = the newest consumed store version (its `vN[.s]` name, or
    * "" before any) + the highest consumed `_TOMBSTONES/t<i>` index. */
  private[sources] case class ChangesOffset(version: String, tomb: Long)
      extends Offset {
    override def json(): String = s"$version|$tomb"
    def key: (Long, Int) =
      if (version.isEmpty) (-1L, -1)
      else DedupStore.parseKey(version).getOrElse(
        throw new IllegalArgumentException(s"bad store version '$version'"))
  }

  private[sources] def parseOffset(s: String): ChangesOffset = {
    val i = s.lastIndexOf('|')
    ChangesOffset(s.substring(0, i), s.substring(i + 1).toLong)
  }

  /** Highest committed tombstone file index, -1 when none. */
  private[sources] def tombMax(storeDir: String): Long = {
    val (fs, root) = DedupStore.fsRoot(storeDir)
    val d = new Path(root, "_TOMBSTONES")
    if (!fs.exists(d)) -1L
    else fs.listStatus(d).toSeq
      .filter(f => f.isFile && !f.getPath.getName.startsWith("."))
      .flatMap(_.getPath.getName.stripPrefix("t").toLongOption)
      .maxOption.getOrElse(-1L)
  }

  /** Hashes in tombstone files with index in (fromExcl, toIncl]. */
  private[sources] def tombHashes(storeDir: String, fromExcl: Long,
                                  toIncl: Long): Array[Long] = {
    val (fs, root) = DedupStore.fsRoot(storeDir)
    val d = new Path(root, "_TOMBSTONES")
    if (!fs.exists(d)) Array.empty
    else fs.listStatus(d).toSeq
      .filter(f => f.isFile && !f.getPath.getName.startsWith("."))
      .filter(f => f.getPath.getName.stripPrefix("t").toLongOption
        .exists(i => i > fromExcl && i <= toIncl))
      .flatMap(f => DedupStore.readString(fs, f.getPath)
        .split("\n", -1).toSeq.flatMap(_.trim.toLongOption))
      .distinct.toArray
  }

  /** The data files of `endVersion` whose WRITING version (embedded in
    * the manifest path — `vN[.s]/bucket=…/part-…`) orders after
    * `sinceKey`: exactly [[DedupStore.changedSince]]'s pruned file set. */
  private[sources] def changedFilesBetween(storeDir: String,
                                           sinceKey: (Long, Int),
                                           endVersion: String): Seq[String] = {
    val (fs, root) = DedupStore.fsRoot(storeDir)
    DedupStore.versions(fs, root).find(v => DedupStore.parseKey(endVersion)
        .contains(v._1)).toSeq
      .flatMap { case (_, vDir) =>
        DedupStore.entriesOf(fs, root, vDir)
          .filter { case (_, f) =>
            DedupStore.parseKey(f.getParent.getParent.getName)
              .exists(k => k._1 > sinceKey._1 ||
                (k._1 == sinceKey._1 && k._2 > sinceKey._2)) }
          .map(_._2.toString)
      }
  }
}

private[sources] class StoreChangesTable(storeDir: String,
                                         since: Option[String],
                                         sinceTomb: Option[Long])
    extends Table with SupportsRead {
  import DedupStoreChanges._

  override def name(): String = s"graft_store_changes($storeDir)"
  override def schema(): StructType = CHANGE_SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)

  /** The consumer's starting point: the `since` cursor (a name from
    * [[DedupStore.currentVersion]], bare or full path — like
    * changedSince) for upserts; `sinceTomb` (a tombstone file index
    * from a previous offset) for deletes. A bare version name carries
    * no tombstone position, so the default is -1 — EVERY committed
    * tombstone re-emits as a delete, which idempotent delete
    * application absorbs (the safe direction; skipping one would lose
    * an erasure). */
  private def startOffset: ChangesOffset =
    ChangesOffset(since.map(v => new Path(v).getName).getOrElse(""),
      sinceTomb.getOrElse(-1L))

  private def endOffset: ChangesOffset = ChangesOffset(
    DedupStore.currentVersion(storeDir)
      .map(p => new Path(p).getName).getOrElse(""),
    tombMax(storeDir))

  private def plan(start: ChangesOffset, end: ChangesOffset): Array[InputPartition] = {
    if (end.version.isEmpty) return Array.empty
    val files =
      if (end.version == start.version) Seq.empty
      else changedFilesBetween(storeDir, start.key, end.version)
    val deletes = tombHashes(storeDir, start.tomb, end.tomb)
    val parts = files.map(f => UpsertFilePartition(f): InputPartition) ++
      (if (deletes.nonEmpty) Seq(DeletePartition(deletes): InputPartition)
       else Seq.empty)
    parts.toArray
  }

  private def factory: PartitionReaderFactory = {
    // the CURRENT tombstone set prefilters upsert rows (changedSince's
    // withoutTombstoned, pushed to the reader) — bounded, rides the
    // factory as plain longs
    val suppress = tombHashes(storeDir, -1L, Long.MaxValue)
    new ChangesReaderFactory(
      new SerializableConfiguration(
        SparkSession.active.sessionState.newHadoopConf()),
      suppress)
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = CHANGE_SCHEMA

      override def toBatch: Batch = new Batch {
        // one-shot catch-up: everything from `since` to the current tip
        override def planInputPartitions(): Array[InputPartition] =
          plan(startOffset, endOffset)
        override def createReaderFactory(): PartitionReaderFactory = factory
      }

      override def toMicroBatchStream(ckpt: String): MicroBatchStream =
        new MicroBatchStream with SupportsTriggerAvailableNow {
          // an empty store tip before the cursor'd start would move
          // offsets backwards; clamp to the start
          private def tip: ChangesOffset = {
            val e = endOffset
            if (e.version.isEmpty) startOffset else e
          }
          // AvailableNow contract: pin the end at prepare time so the
          // drain stops at the tip it saw, even if writers keep landing
          private var pinned: Option[ChangesOffset] = None
          override def prepareForTriggerAvailableNow(): Unit =
            pinned = Some(tip)
          override def initialOffset(): Offset = startOffset
          override def latestOffset(): Offset = pinned.getOrElse(tip)
          // SupportsAdmissionControl variant (what the engine actually
          // calls): the feed has no rate knob — a batch is whatever the
          // store committed — so limits are acknowledged, not applied
          override def latestOffset(start: Offset,
                                    limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset =
            pinned.getOrElse(tip)
          override def deserializeOffset(json: String): Offset = parseOffset(json)
          override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
            plan(start.asInstanceOf[ChangesOffset], end.asInstanceOf[ChangesOffset])
          override def createReaderFactory(): PartitionReaderFactory = factory
          override def commit(end: Offset): Unit = ()
          override def stop(): Unit = ()
        }
    }
}

private[sources] case class UpsertFilePartition(file: String) extends InputPartition
private[sources] case class DeletePartition(hashes: Array[Long]) extends InputPartition

private[sources] class ChangesReaderFactory(
    conf: SerializableConfiguration, suppress: Array[Long])
    extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case UpsertFilePartition(file) =>
        new UpsertFileReader(file, conf.value, suppress.toSet)
      case DeletePartition(hashes) => new DeleteReader(hashes)
    }
}

/** Reads one store parquet file (text, keep_id, n_copies) with
  * parquet-hadoop's Group API and emits upsert rows, dropping
  * tombstone-suppressed texts. Runs on the executor — one file per
  * task, the store's own write granularity. */
private[sources] class UpsertFileReader(
    file: String, conf: org.apache.hadoop.conf.Configuration,
    suppress: Set[Long]) extends PartitionReader[InternalRow] {
  import org.apache.parquet.hadoop.ParquetReader
  import org.apache.parquet.hadoop.example.GroupReadSupport

  private val reader: ParquetReader[org.apache.parquet.example.data.Group] =
    ParquetReader.builder(new GroupReadSupport(), new Path(file))
      .withConf(conf).build()
  private var row: InternalRow = _

  override def next(): Boolean = {
    var g = reader.read()
    while (g != null) {
      val text = g.getString("text", 0)
      val ut = UTF8String.fromString(text)
      // the engine's own xxhash64 (seed 42), so thash joins exactly
      // against tombstones()/purge hashing
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(ut, StringType, 42L)
      if (!suppress.contains(h)) {
        row = new GenericInternalRow(Array[Any](
          UTF8String.fromString("upsert"), h, ut,
          g.getLong("keep_id", 0), g.getLong("n_copies", 0)))
        return true
      }
      g = reader.read()
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = reader.close()
}

private[sources] class DeleteReader(hashes: Array[Long])
    extends PartitionReader[InternalRow] {
  private var i = -1
  override def next(): Boolean = { i += 1; i < hashes.length }
  override def get(): InternalRow = new GenericInternalRow(
    Array[Any](UTF8String.fromString("delete"), hashes(i), null, null, null))
  override def close(): Unit = ()
}
