package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join-locality tools for cluster scale (SURVEY.md §4 / builder prompt):
  * bucketing for shuffle-free co-located joins, and key salting for
  * skewed joins where one hot key would otherwise pin a single reducer.
  */
object ScaleJoins {

  /** Write `df` bucketed+sorted by `key` into the session catalog. Two
    * tables bucketed the same way join with zero Exchange — at 100 TB the
    * fact tables are written once like this and every subsequent
    * key-equijoin (and groupBy on the key) skips its shuffle. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Salted equi-join of a skewed fact against a dimension:
    * the fact side gets a deterministic salt in [0, saltFactor) derived
    * from `saltSource` (any well-distributed fact column), the dim side
    * is replicated saltFactor times, and the join key becomes
    * (key, salt) — a hot key's rows now spread over saltFactor reducers.
    *
    * Semantically identical to `fact.join(dim, key)` for inner joins;
    * result column set = fact.* ++ dim.* minus the dup key. (AQE's
    * skew-join handles moderate skew automatically; explicit salting is
    * for the pathological single-key case.) */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltFactor: Int, saltSource: Column): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(saltFactor)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Run `body` under AQE skew-join settings aggressive enough to
    * demonstrate runtime skew splitting at fixture scale (q65):
    * broadcast is disabled on BOTH planner and AQE thresholds so the
    * join genuinely sort-merges, the skew factor/threshold are floored
    * so above-median partitions qualify, and forceOptimizeSkewedJoin
    * covers shapes where splitting would add an exchange. Production
    * keeps the defaults (factor 5, 256 MB threshold) — this is the
    * NATIVE answer to the skew scale-killer that q44 solves manually
    * with salting: AQE measures real partition sizes at the shuffle
    * boundary and splits only what is actually hot, no salt-factor
    * guesswork, at the cost of working only at blocking shuffle
    * boundaries (salting also covers streaming/bucketed shapes).
    * Every conf is restored after `body`. */
  def withSkewJoinDemo[T](s: SparkSession)(body: => T): T =
    graft.Confs.withConfs(s, Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1"))(body)

  /** q188's variant of [[withSkewJoinDemo]]: keeps a REAL skew factor
    * (a partition must measure 4× the median to split — the shape of
    * the production default, not q65's floor-everything 1.0) and only
    * lowers the byte floor to fixture scale. Under these settings the
    * split is a MEASUREMENT: AQE must find the one deliberately hot
    * partition and leave the other thirty-odd unsplit (ScaleSpec pins
    * the selectivity through the final plan's partition specs). No
    * forceOptimizeSkewedJoin either — the probe also certifies the
    * rule fires within its no-extra-shuffle planning constraint.
    * Every conf is restored after `body`. */
  def withMeasuredSkewDemo[T](s: SparkSession)(body: => T): T =
    graft.Confs.withConfs(s, Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "4.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      // enough reducers that the ~511 even keys spread thin while the
      // hot key stays concentrated — with a handful of partitions the
      // hot one never clears 4x the (then-fat) median, and there is no
      // skew to measure (the same arithmetic a production job gets for
      // free from its thousands of reducers)
      "spark.sql.shuffle.partitions" -> "32",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1"))(body)

  /** Run `body` under runtime bloom-filter join settings that let the
    * optimizer's InjectRuntimeFilter fire at fixture scale (q172):
    * a selective dim→fact shuffle join gets a bloom filter BUILT from
    * the dim side's join keys at runtime and PUSHED into the fact
    * side's scan-adjacent filter, so most fact rows drop before the
    * shuffle — the complement of dynamic partition pruning for the
    * case where the fact table is NOT partitioned by the join key
    * (DPP skips directories; the bloom filter skips rows). Production
    * keeps the 10 GB application-side floor — at 100 TB the fact scan
    * clears it naturally; the demo floors it to 0 because the fixture
    * fact is small. Broadcast is disabled on both planner and AQE
    * thresholds because the rule only injects into probably-shuffle
    * joins (a broadcast join already prunes at the hash probe).
    * Every conf is restored after `body`. */
  def withBloomJoinDemo[T](s: SparkSession)(body: => T): T =
    graft.Confs.withConfs(s, Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1"))(body)

  /** Run `body` with storage-partitioned joins enabled (q173): a DSv2
    * scan reporting `KeyGroupedPartitioning` satisfies the join's
    * distribution requirement as stored, so the planner omits the
    * Exchange on both sides. `pushPartValues` covers key sets that
    * don't align exactly (a key present on one side only gets an empty
    * split instead of forcing a shuffle). Broadcast is disabled so the
    * demo genuinely plans the shuffle-free sort-merge join — at real
    * scale both sides are facts and broadcast was never on the table.
    * Every conf is restored after `body`. */
  def withSpjDemo[T](s: SparkSession)(body: => T): T =
    graft.Confs.withConfs(s, Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1"))(body)

  /** Run `body` with the cost-based optimizer's join reordering active
    * (q175): with per-table rowCounts and column stats (NDV/min/max
    * from ANALYZE) the optimizer re-derives the cheapest join order
    * from cardinality estimates instead of trusting query syntax.
    * Broadcast is disabled so the reordered tree plans as a
    * deterministic sort-merge nest the spec can assert on — at real
    * scale the dims exceed the broadcast threshold anyway, which is
    * precisely when join ORDER dominates cost. Every conf is restored
    * after `body`. */
  def withCboDemo[T](s: SparkSession)(body: => T): T =
    graft.Confs.withConfs(s, Seq(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1"))(body)

  /** Min-max-normalized 16-bit-per-dimension Z-value for a 2-D sort key
    * ([[graft.functions.ZOrder2]]): each column linearly rescales to
    * 0..65535 from its data min/max (exact integer arithmetic —
    * products stay < 2^53, and [[org.apache.spark.sql.catalyst.expressions.IntegralDivide]]
    * keeps the division exact), then the two 16-bit values interleave.
    * Without normalization, keys of different magnitudes degenerate the
    * interleave to ordering by the wider key. Degenerate dimensions
    * (min == max) normalize to 0. */
  def zValue16(a: Column, aMin: Long, aMax: Long,
               b: Column, bMin: Long, bMax: Long): Column = {
    import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Literal}
    import org.apache.spark.sql.graft.ColumnBridge
    def norm(c: Column, lo: Long, hi: Long): Column =
      if (hi <= lo) lit(0L)
      else ColumnBridge.column(IntegralDivide(
        ColumnBridge.expression((c - lit(lo)) * lit(65535L)),
        Literal(hi - lo)))
    graft.functions.ZOrder2.zorder2(norm(a, aMin, aMax), norm(b, bMin, bMax))
  }
}
