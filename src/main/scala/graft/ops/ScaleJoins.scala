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
}
