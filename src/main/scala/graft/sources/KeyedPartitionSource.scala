package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
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

  /** Stage `rows` (pre-grouped (key, id, label) tuples) into the
    * layout this source reads: one `k=<key>/data.tsv` per key. Driver
    * -side by design — the fixture writer, not the scale path (a real
    * deployment's layout is written by a distributed job; READING is
    * fully distributed here either way). */
  def stage(dir: String, rows: Iterator[(Long, Long, String)]): Unit = {
    val writers = scala.collection.mutable.Map.empty[Long, java.io.PrintWriter]
    try {
      rows.foreach { case (k, id, label) =>
        val w = writers.getOrElseUpdate(k, {
          val kd = new java.io.File(dir, s"k=$k")
          kd.mkdirs()
          new java.io.PrintWriter(new java.io.File(kd, "data.tsv"), "UTF-8")
        })
        w.println(s"$k\t$id\t$label")
      }
    } finally writers.values.foreach(_.close())
  }
}

private[sources] class KeyedTable(tableSchema: StructType, path: String)
    extends Table with SupportsRead {

  require(path != null, "option path is required")

  override def name(): String = s"keyed($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KeyedScanBuilder(tableSchema, path)
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
private[sources] case class KeyedSplit(key: Long, file: String)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(key)
}

private[sources] class KeyedScan(requiredSchema: StructType, path: String)
    extends Scan with Batch with SupportsReportPartitioning {

  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this

  private lazy val splits: Array[KeyedSplit] = {
    val root = new java.io.File(path)
    val dirs = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("k="))
    dirs.map(d => KeyedSplit(d.getName.stripPrefix("k=").toLong,
        new java.io.File(d, "data.tsv").getAbsolutePath))
      .sortBy(_.key)
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
      private val source = scala.io.Source.fromFile(split.file, "UTF-8")
      private val lines = source.getLines()
      override def next(): Boolean = lines.hasNext
      override def get(): InternalRow = {
        val parts = lines.next().split("\t", 3)
        new GenericInternalRow(fields.map {
          case "key" => parts(0).toLong
          case "id" => parts(1).toLong
          case "label" => UTF8String.fromString(parts(2))
        }.toArray[Any])
      }
      override def close(): Unit = source.close()
    }
  }
}
