package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Startup schema guard for the driver-generated fixtures (TESTDATA.md).
  *
  * Round 8 showed why this exists: the testdata was regenerated with
  * `events.ts` re-encoded from INT64 TIMESTAMP(NANOS) to timestamp[us],
  * and the engine's single-encoding assumption turned ONE re-encode into
  * 13 scattered failures (6 analysis errors + 7 silently-wrong streaming
  * answers). The guard turns any such drift into one loud diagnostic at
  * warmup: every table's resolved schema is checked against the expected
  * shape, and every mismatch (type, missing column, extra column, column
  * order) is reported observed-vs-expected in a single exception.
  *
  * Columns with KNOWN legitimate encodings list all of them — `events.ts`
  * may arrive as nanos-as-long, timestamp, or timestamp_ntz, which
  * [[Tables.tsMicros]] canonicalizes — so the guard flags drift the
  * engine can't absorb, not drift it is built for.
  */
object Fixtures {

  private val ts: Set[DataType] = Set(TimestampType, TimestampNTZType)
  private def one(dt: DataType): Set[DataType] = Set(dt)

  /** Expected resolved (post-read) schema per table: column name ->
    * acceptable types, in declared order. */
  val expected: Seq[(String, Seq[(String, Set[DataType])])] = Seq(
    "region" -> Seq("r_regionkey" -> one(IntegerType), "r_name" -> one(StringType)),
    "nation" -> Seq("n_nationkey" -> one(IntegerType), "n_name" -> one(StringType),
      "n_regionkey" -> one(IntegerType)),
    "customer" -> Seq("c_custkey" -> one(LongType), "c_name" -> one(StringType),
      "c_nationkey" -> one(IntegerType), "c_acctbal" -> one(DoubleType),
      "c_mktsegment" -> one(StringType)),
    "supplier" -> Seq("s_suppkey" -> one(LongType), "s_name" -> one(StringType),
      "s_nationkey" -> one(IntegerType), "s_acctbal" -> one(DoubleType)),
    "part" -> Seq("p_partkey" -> one(LongType), "p_name" -> one(StringType),
      "p_brand" -> one(StringType), "p_type" -> one(StringType),
      "p_size" -> one(IntegerType), "p_retailprice" -> one(DoubleType)),
    "orders" -> Seq("o_orderkey" -> one(LongType), "o_custkey" -> one(LongType),
      "o_orderstatus" -> one(StringType), "o_totalprice" -> one(DoubleType),
      "o_orderdate" -> (ts + LongType), // nanos-as-long absorbed like events.ts
      "o_orderpriority" -> one(StringType)),
    "lineitem" -> Seq("l_orderkey" -> one(LongType), "l_partkey" -> one(LongType),
      "l_suppkey" -> one(LongType), "l_linenumber" -> one(IntegerType),
      "l_quantity" -> one(DoubleType), "l_extendedprice" -> one(DoubleType),
      "l_discount" -> one(DoubleType), "l_tax" -> one(DoubleType),
      "l_returnflag" -> one(StringType), "l_linestatus" -> one(StringType),
      "l_shipdate" -> (ts + LongType)), // nanos-as-long absorbed like events.ts
    "events" -> Seq("event_id" -> one(LongType),
      "ts" -> (ts + LongType), // the three encodings Tables.tsMicros absorbs
      "user_id" -> one(LongType), "event_type" -> one(StringType),
      "value" -> one(DoubleType), "props" -> one(StringType)),
    "documents" -> Seq("doc_id" -> one(LongType), "text" -> one(StringType),
      "lang" -> one(StringType), "source" -> one(StringType),
      "n_chars" -> one(LongType)),
    "embeddings" -> Seq("vec_id" -> one(LongType),
      "embedding" -> one(ArrayType(FloatType)), "label" -> one(IntegerType)))

  /** Mismatch lines for one table's resolved schema; empty = conforming.
    * Array element nullability is ignored (writer-dependent, semantically
    * irrelevant here). */
  private[graft] def check(table: String, schema: StructType,
                           exp: Seq[(String, Set[DataType])]): Seq[String] = {
    def norm(dt: DataType): DataType = dt match {
      case ArrayType(e, _) => ArrayType(norm(e))
      case other => other
    }
    val got = schema.fields.map(f => f.name -> norm(f.dataType)).toMap
    val missing = exp.collect { case (c, want) if !got.contains(c) =>
      s"$table.$c: MISSING (expected ${want.map(_.simpleString).mkString("|")})" }
    val extra = schema.fieldNames.filterNot(exp.map(_._1).toSet)
      .map(c => s"$table.$c: UNEXPECTED column (observed ${got(c).simpleString})")
    val wrong = exp.collect {
      case (c, want) if got.contains(c) && !want.map(norm).contains(got(c)) =>
        s"$table.$c: observed ${got(c).simpleString}, expected " +
          want.map(_.simpleString).mkString("|") }
    missing ++ wrong ++ extra
  }

  /** Assert every fixture table under `dir` matches [[expected]]; throws
    * ONE IllegalStateException listing every deviation. Reads footers
    * only (schema resolution, no data scan) — cheap enough for warmup. */
  def guard(spark: SparkSession, dir: String): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val problems = expected.flatMap { case (table, exp) =>
      try check(table, spark.read.parquet(s"$dir/$table.parquet").schema, exp)
      catch { case e: Exception =>
        Seq(s"$table: unreadable (${e.getClass.getSimpleName}: ${e.getMessage})") }
    }
    if (problems.nonEmpty) throw new IllegalStateException(
      s"fixture schema drift under $dir — regenerate the fixtures or teach " +
        s"the engine the new encoding (see Tables.tsMicros):\n  " +
        problems.mkString("\n  "))
  }
}
