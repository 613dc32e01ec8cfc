package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 `TableProvider` over a key-partitioned directory layout
  * (`<path>/k=<key>/data.tsv`) that REPORTS its partitioning to the
  * engine — the storage-partitioned join (SPJ) surface: a scan that
  * declares `KeyGroupedPartitioning(identity(key))` satisfies a join's
  * clustered-distribution requirement AS STORED, so two tables laid out
  * by the same key equi-join with ZERO Exchange under
  * `spark.sql.sources.v2.bucketing.enabled` — and the post-join
  * aggregation on the key inherits the clustering too.
  *
  * This is the 100 TB shuffle-elimination story q45's session-catalog
  * bucketing only approximates: bucketed *tables* need the Hive
  * catalog's bucket handshake, while SPJ is pure connector metadata —
  * any source that knows its files are key-grouped (Iceberg and Delta
  * do exactly this) can hand the engine a shuffle-free join. Each
  * partition directory is one `InputPartition` carrying its key via
  * [[org.apache.spark.sql.connector.read.HasPartitionKey]]; Spark
  * aligns both sides' partitions by key value (missing keys handled by
  * `pushPartValues`, which fills empty splits instead of shuffling).
  *
  * Fixture format notes: one TSV file per key keeps the layout
  * readable in tests; schema is fixed (`key long, id long, label
  * string` — see [[KeyedPartitionSource.schema]]). Column pruning is
  * pushed (unprojected fields never materialize). The identity
  * transform over a bounded key domain is the Hive-partitioned-layout
  * case; a production source over a high-cardinality key reports
  * `bucket(n, key)` the same way.
  */
class KeyedPartitionSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KeyedPartitionSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new KeyedTable(schema, properties.get("path"))
}

object KeyedPartitionSource {
  val schema: StructType = StructType(Seq(
    StructField("key", LongType),
    StructField("id", LongType),
    StructField("label", StringType)))

  /** TSV-safe encoding for the free-text `label` column: a raw tab
    * would shift columns and a raw newline would split the row on
    * read-back, both silently. Backslash-escape the three dangerous
    * bytes (`\` first so the mapping is bijective); [[unescapeLabel]]
    * inverts it in the reader. Clean labels round-trip byte-identical,
    * so existing fixtures are unaffected. */
  def escapeLabel(s: String): String =
    s.replace("\\", "\\\\").replace("\t", "\\t")
      .replace("\n", "\\n").replace("\r", "\\r")

  def unescapeLabel(s: String): String = {
    if (s.indexOf('\\') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '\\' => sb.append('\\'); i += 2
          case 't'  => sb.append('\t'); i += 2
          case 'n'  => sb.append('\n'); i += 2
          case 'r'  => sb.append('\r'); i += 2
          case _    => sb.append(c); i += 1
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Stage `rows` (pre-grouped (key, id, label) tuples) into the
    * layout this source reads: one `k=<key>/data.tsv` per key. The
    * hand-rolled fixture writer kept for spec use — the deployment
    * path is the DSv2 WRITE below (`df.write.format(...)`), where the
    * layout is produced by a distributed job whose clustering the sink
    * itself demands. */
  def stage(dir: String, rows: Iterator[(Long, Long, String)]): Unit = {
    val writers = scala.collection.mutable.Map.empty[Long, java.io.PrintWriter]
    try {
      rows.foreach { case (k, id, label) =>
        val w = writers.getOrElseUpdate(k, {
          val kd = new java.io.File(dir, s"k=$k")
          kd.mkdirs()
          new java.io.PrintWriter(new java.io.File(kd, "data.tsv"), "UTF-8")
        })
        w.println(s"$k\t$id\t${KeyedPartitionSource.escapeLabel(label)}")
      }
    } finally writers.values.foreach(_.close())
  }
}

private[sources] class KeyedTable(tableSchema: StructType, path: String)
    extends Table with SupportsRead with SupportsWrite {

  require(path != null, "option path is required")

  override def name(): String = s"keyed($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KeyedScanBuilder(tableSchema, path)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder { override def build(): Write = new KeyedWrite(path) }
}

/** The write-side half of the SPJ contract: the sink REQUIRES the rows
  * it receives to arrive clustered by `key` (and sorted within the
  * task), so the ENGINE plans the shuffle that produces the key-grouped
  * layout — `RequiresDistributionAndOrdering` is how a connector makes
  * its storage layout a planner obligation instead of a caller
  * convention. Every row of one key lands in exactly one task, each
  * task streams its sorted run into one file per key directory, and
  * the committed layout is precisely what [[KeyedScan]] later reports
  * as `KeyGroupedPartitioning`. Commit protocol: tasks write
  * attempt-unique files and report them in their commit messages; the
  * job commit pins the surviving set in a `_manifest` the reader
  * honors, so a losing speculative attempt's file is never read and
  * job abort deletes everything the tasks reported. */
private[sources] class KeyedWrite(path: String)
    extends Write with RequiresDistributionAndOrdering {

  override def requiredDistribution(): Distribution =
    Distributions.clustered(Array(Expressions.identity("key")))

  override def requiredOrdering(): Array[SortOrder] =
    Array(Expressions.sort(Expressions.identity("key"),
      SortDirection.ASCENDING))

  override def toBatch: BatchWrite = new BatchWrite {
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
      new KeyedWriterFactory(path)

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val files = messages.flatMap(_.asInstanceOf[KeyedFilesWritten].relPaths)
      // append semantics: a later write's commit MERGES into the
      // manifest (attempt-unique file names make union safe), so two
      // appends are both visible — only uncommitted attempts stay out.
      // The read-modify-write of the merge is serialized under an
      // exclusive lock file (CREATE_NEW is atomic on POSIX), because
      // ATOMIC_MOVE alone only protects READERS: two concurrent
      // commits could both read the old manifest and the second move
      // would silently erase the first commit's files. The merged list
      // still lands via write-to-temp + ATOMIC_MOVE so a crash
      // mid-write never exposes a truncated manifest.
      // The lock is an OS advisory lock on the file (FileChannel
      // .tryLock), NOT the file's existence. The kernel releases it the
      // instant the holding process dies (kill -9, OOM), so there is no
      // staleness heuristic at all — and therefore no check-then-act
      // takeover window in which a waiter could delete a LIVE holder's
      // freshly-created lock (round 17's mtime takeover had exactly
      // that race: observe-stale → another waiter breaks it → a new
      // holder recreates it → the first waiter's delete lands on the
      // NEW lock, and two merges run concurrently). The lock file
      // itself is a permanent anchor and is deliberately never deleted:
      // unlinking it would let a waiter lock the orphaned inode while a
      // newcomer locks a fresh file at the same path — two "holders"
      // again. Within one JVM a second channel's tryLock throws
      // OverlappingFileLockException, which we treat as busy. A wedged
      // LIVE holder still fails loudly after 60s rather than silently
      // interleaving commits (the guarded merge is a milliseconds-long
      // small-file rewrite, so 60s of contention means something is
      // genuinely wrong).
      val lockFile = new java.io.File(path, "_manifest.lock")
      ManifestLocks.withLock(lockFile) {
        val mfFile = new java.io.File(path, "_manifest")
        val existing =
          if (mfFile.isFile) {
            val src = scala.io.Source.fromFile(mfFile, "UTF-8")
            try src.getLines().toVector finally src.close()
          } else Vector.empty
        val tmp = new java.io.File(path, s"_manifest.tmp.${java.util.UUID.randomUUID}")
        val mf = new java.io.PrintWriter(tmp, "UTF-8")
        try (existing ++ files).distinct.sorted.foreach(mf.println)
        finally mf.close()
        java.nio.file.Files.move(tmp.toPath, mfFile.toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit =
      messages.filter(_ != null)
        .flatMap(_.asInstanceOf[KeyedFilesWritten].relPaths)
        .foreach(rel => new java.io.File(path, rel).delete())
  }
}

/** Cross-process manifest locking with ONE FileChannel per lock-file
  * path for the whole JVM, never closed. POSIX fcntl semantics (the
  * FileLock javadoc caveat): closing ANY channel onto a file drops ALL
  * of the process's record locks on it — so a waiter that timed out
  * and closed its own channel would silently release a live same-JVM
  * holder's lock against FOREIGN processes, reopening the concurrent-
  * merge window the lock exists to close. In-JVM exclusion is a
  * per-path monitor (so the kernel lock is only ever taken by one
  * thread of this process at a time, and OverlappingFileLockException
  * cannot arise); cross-process exclusion is the cached channel's
  * fcntl lock. The channel cache grows by one entry per distinct
  * store path — bounded by the paths a JVM writes, deliberately
  * leaked, exactly like the anchor file itself. */
private[sources] object ManifestLocks {
  private val channels = scala.collection.concurrent.TrieMap
    .empty[String, java.nio.channels.FileChannel]
  private val mutexes = scala.collection.concurrent.TrieMap
    .empty[String, Object]

  def withLock[T](lockFile: java.io.File, timeoutMs: Long = 60000L)(body: => T): T = {
    val key = lockFile.getCanonicalPath
    val mutex = mutexes.getOrElseUpdate(key, new Object)
    mutex.synchronized {
      val channel = channels.getOrElseUpdate(key,
        java.nio.channels.FileChannel.open(lockFile.toPath,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE))
      var flock: java.nio.channels.FileLock = null
      var waitedMs = 0L
      while (flock == null) {
        // the mutex serializes this JVM's acquisitions, so tryLock can
        // only contend with FOREIGN processes (null, never Overlapping)
        flock = channel.tryLock()
        if (flock == null) {
          waitedMs += 100
          if (waitedMs > timeoutMs) throw new IllegalStateException(
            s"could not acquire ${lockFile.toPath} after ${timeoutMs / 1000}s — " +
              "live committer wedged?")
          Thread.sleep(100)
        }
      }
      // release the record lock but NEVER close the channel (see scaladoc)
      try body finally flock.release()
    }
  }
}

private[sources] case class KeyedFilesWritten(relPaths: Seq[String])
    extends WriterCommitMessage

private[sources] class KeyedWriterFactory(path: String)
    extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val written = Seq.newBuilder[String]
      private var currentKey: Long = Long.MinValue
      private var out: java.io.PrintWriter = _

      override def write(row: InternalRow): Unit = {
        val k = row.getLong(0)
        if (out == null || k != currentKey) {
          // rows arrive key-sorted ascending (requiredOrdering), so
          // each key opens exactly once per task. A key SMALLER than
          // the current one means the engine broke that contract (or
          // this writer was reused without RequiresDistributionAnd-
          // Ordering) — reopening would TRUNCATE the key's earlier
          // rows, so fail loudly instead of losing data silently.
          if (out != null && k < currentKey) throw new IllegalStateException(
            s"ordering contract violated: key $k after $currentKey — " +
              "rows must arrive sorted by key (requiredOrdering); " +
              "refusing to reopen (and truncate) an already-written key")
          if (out != null) out.close()
          val kd = new java.io.File(path, s"k=$k")
          kd.mkdirs()
          val rel = s"k=$k/part-$partitionId-$taskId.tsv"
          written += rel
          out = new java.io.PrintWriter(new java.io.File(path, rel), "UTF-8")
          currentKey = k
        }
        out.println(s"$k\t${row.getLong(1)}\t" +
          KeyedPartitionSource.escapeLabel(row.getUTF8String(2).toString))
      }

      override def commit(): WriterCommitMessage = {
        if (out != null) out.close()
        KeyedFilesWritten(written.result())
      }

      override def abort(): Unit = {
        if (out != null) out.close()
        written.result().foreach(rel => new java.io.File(path, rel).delete())
      }

      override def close(): Unit = if (out != null) { out.close(); out = null }
    }
}

private[sources] class KeyedScanBuilder(schema: StructType, path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var requiredSchema: StructType = schema

  override def pruneColumns(required: StructType): Unit =
    requiredSchema = required

  override def build(): Scan = new KeyedScan(requiredSchema, path)
}

/** One key directory = one split; `partitionKey` is what lets the
  * engine key-group the scan. */
private[sources] case class KeyedSplit(key: Long, files: Seq[String])
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(key)
}

private[sources] class KeyedScan(requiredSchema: StructType, path: String)
    extends Scan with Batch with SupportsReportPartitioning {

  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this

  private lazy val splits: Array[KeyedSplit] = {
    val root = new java.io.File(path)
    val manifest = new java.io.File(root, "_manifest")
    val byKey: Map[Long, Seq[String]] =
      if (manifest.isFile) {
        // committed V2 write: the manifest pins the surviving files —
        // an aborted/speculative attempt's leftovers are never read
        val src = scala.io.Source.fromFile(manifest, "UTF-8")
        try src.getLines().toSeq
          .groupBy(rel => rel.split("/").head.stripPrefix("k=").toLong)
          .map { case (k, rels) =>
            k -> rels.map(r => new java.io.File(root, r).getAbsolutePath)
          }
        finally src.close()
      } else {
        // hand-staged layout (no manifest): every .tsv in each key dir
        Option(root.listFiles()).getOrElse(Array.empty)
          .filter(f => f.isDirectory && f.getName.startsWith("k="))
          .map { d =>
            d.getName.stripPrefix("k=").toLong ->
              d.listFiles().filter(_.getName.endsWith(".tsv"))
                .map(_.getAbsolutePath).sorted.toSeq
          }.toMap
      }
    byKey.toArray.map { case (k, fs) => KeyedSplit(k, fs) }.sortBy(_.key)
  }

  override def planInputPartitions(): Array[InputPartition] =
    splits.toArray[InputPartition]

  /** The SPJ contract: the scan's output is grouped by `key`, one
    * partition per distinct value (identity transform — the
    * Hive-layout case; `Expressions.bucket(n, "key")` is the
    * high-cardinality variant). */
  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(Array(Expressions.identity("key")), splits.length)

  override def createReaderFactory(): PartitionReaderFactory =
    new KeyedReaderFactory(requiredSchema.fieldNames)
}

private[sources] class KeyedReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val split = partition.asInstanceOf[KeyedSplit]
    new PartitionReader[InternalRow] {
      private var open: List[scala.io.Source] = Nil
      private val lines = split.files.iterator.flatMap { f =>
        val src = scala.io.Source.fromFile(f, "UTF-8")
        open ::= src
        src.getLines()
      }
      override def next(): Boolean = lines.hasNext
      override def get(): InternalRow = {
        val parts = lines.next().split("\t", 3)
        new GenericInternalRow(fields.map {
          case "key" => parts(0).toLong
          case "id" => parts(1).toLong
          case "label" =>
            UTF8String.fromString(KeyedPartitionSource.unescapeLabel(parts(2)))
        }.toArray[Any])
      }
      override def close(): Unit = open.foreach(_.close())
    }
  }
}
