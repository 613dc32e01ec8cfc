package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Dictionary densification: map an arbitrary key domain — strings,
  * UUIDs, sparse surrogate longs — onto contiguous dense ids
  * `0 .. n-1`, so the EXACT-distinct bitmap tier
  * ([[graft.functions.IdBitmap]], which enforces a dense
  * `0 <= id < maxBits` contract) composes with the key domains a real
  * pipeline has. The id assignment is the key's 0-based rank in
  * ascending key order — DuckDB's `dense_rank() OVER (ORDER BY key) - 1`
  * — so densified results stay oracle-checkable cross-engine.
  *
  * Scale shape (the reason this is an operator and not a one-line
  * window): the naive `row_number() OVER (ORDER BY key)` is a GLOBAL
  * window — every key funnels through one partition. Here the distinct
  * keys are RANGE-partition sorted (distributed sort, the same
  * machinery as any `orderBy`) and ranked by `zipWithIndex` — one
  * count job over the sorted partitions to learn per-partition offsets,
  * then a map. The global rank is independent of where the range
  * boundaries land, so the assignment is deterministic run-to-run.
  * The dictionary itself stays a distributed frame (at 10⁹ keys it is
  * partitioned like any table) and the join back is a plain key
  * equality join — AQE broadcasts it when it is small.
  *
  * The dictionary's own scale contract: ids are stable only against a
  * PINNED dictionary. Re-deriving it after the key universe grows
  * reassigns ranks, so a deployment persists the dictionary once and
  * assigns NEW keys ids after the existing max (monotone append — the
  * same discipline as any surrogate-key dimension); re-densifying the
  * world invalidates every stored bitmap.
  */
object Densify {

  /** The dictionary frame: `(keyCol, dense_id)`, one row per distinct
    * non-null key, `dense_id` = 0-based ascending-key rank. */
  def dictionary(df: DataFrame, keyCol: String): DataFrame = {
    val spark = df.sparkSession
    val keys = df.select(col(keyCol)).where(col(keyCol).isNotNull)
      .distinct()
      .orderBy(col(keyCol))
    val schema = StructType(keys.schema.fields :+
      StructField("dense_id", LongType, nullable = false))
    val ranked = keys.rdd.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(ranked, schema)
  }

  /** `df` with `denseIdCol` appended: each row's `keyCol` mapped
    * through [[dictionary]]. Null keys are dropped (a null has no
    * rank; filter or coalesce upstream to keep them). */
  def densify(df: DataFrame, keyCol: String,
              denseIdCol: String = "dense_id"): DataFrame =
    df.join(
      dictionary(df, keyCol).withColumnRenamed("dense_id", denseIdCol),
      Seq(keyCol))

  /** Monotone dictionary growth — the append discipline the scaladoc
    * contract names, as working code: keys of `df` not yet in `dict`
    * get ids AFTER the existing max (0-based ascending-new-key rank on
    * top of it), existing assignments are byte-untouched — so every
    * bitmap built against the old dictionary stays valid. One anti
    * join finds the novel keys; the rank is the same distributed
    * sort + zipWithIndex as [[dictionary]]. */
  def append(dict: DataFrame, df: DataFrame, keyCol: String): DataFrame = {
    val spark = dict.sparkSession
    val novel = df.select(col(keyCol)).where(col(keyCol).isNotNull)
      .distinct()
      .join(dict.select(col(keyCol)), Seq(keyCol), "left_anti")
      .orderBy(col(keyCol))
    val base = dict.agg(coalesce(max(col("dense_id")) + 1L, lit(0L)))
      .head().getLong(0)
    val schema = StructType(novel.schema.fields :+
      StructField("dense_id", LongType, nullable = false))
    val ranked = novel.rdd.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (base + i))
    }
    dict.unionByName(spark.createDataFrame(ranked, schema))
  }
}
