package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming SCD type-2 dimension maintenance (st29): q81's history
  * merge applied per micro-batch through the streaming engine, into a
  * VERSIONED dimension directory.
  *
  * State shape: `(k, seg, vf, vt)` — one open row (`vt` null) per live
  * key plus its closed history. A batch of `(k, new_seg)` updates
  * closes every open row whose key receives a DIFFERENT value (at
  * `vf = batchId + 1`) and opens the replacement there; a same-value
  * update is a no-op, so re-delivered feeds cannot fork history (q81's
  * value-compare discipline).
  *
  * Exactly-once is the CdcReplica recipe: each batch reads the newest
  * `_SUCCESS`-committed version STRICTLY BELOW its own batch id (the
  * base dimension when none) and overwrites its own `v_<batchId>` dir —
  * a crash-replay re-reads the original input state and rewrites the
  * identical output; a half-written version has no `_SUCCESS` and is
  * invisible. Dimension tables are small beside their facts, so the
  * per-batch rewrite is the right trade (the store's manifest machinery
  * exists for the corpus-sized case).
  *
  * Scale shape: the update batch is the BROADCAST side of the merge
  * join (a batch touches few keys; the dimension streams through), and
  * the closed-history rows pass through untouched — per-batch cost is
  * one broadcast join over the dimension, never a shuffle of history.
  */
object Scd2Dim {

  // version listing/commit live in [[VersionedView]] — the one shared
  // copy of the exactly-once recipe

  /** One SCD2 merge step over the `(k, seg, vf, vt)` state. */
  def applyBatch(state: DataFrame, updates: DataFrame,
                 batchId: Long): DataFrame = {
    val vf = batchId + 1
    val open = state.filter(col("vt").isNull)
    val closed = state.filter(col("vt").isNotNull)
    // One update per key per batch: a feed that delivers conflicting
    // values for one key inside a batch carries no order column here, so
    // reduce deterministically (max) rather than fork the open row — the
    // broadcast join below must see at most one match per dimension key.
    val u = updates.select(col("k").as("uk"), col("new_seg"))
      .groupBy("uk").agg(max(col("new_seg")).as("new_seg"))
    val j = open.join(broadcast(u), col("k") === col("uk"), "left")
    // null-safe: `seg =!= new_seg` is SQL NULL when either side is NULL
    // (3VL), and a NULL predicate row would vanish from BOTH filter
    // branches below — <=> keeps every open row in exactly one branch.
    val changed = col("uk").isNotNull && !(col("seg") <=> col("new_seg"))
    val nowClosed = j.filter(changed)
      .select(col("k"), col("seg"), col("vf"), lit(vf).as("vt"))
    val stillOpen = j.filter(!changed)
      .select(col("k"), col("seg"), col("vf"), col("vt"))
    val newOpen = j.filter(changed)
      .select(col("k"), col("new_seg").as("seg"), lit(vf).as("vf"),
        lit(null).cast("long").as("vt"))
    closed.unionByName(nowClosed).unionByName(stillOpen).unionByName(newOpen)
  }

  /** Point-in-time (AS OF) enrichment: attach to each fact row the
    * dimension attributes valid at the fact's version epoch — the
    * lookup side of the SCD2 contract (`vf <= epoch < vt`, open rows
    * `vt` null valid forever).
    *
    * Scale shape: the join is an EQUI-join on the dimension key with
    * the validity window as a residual predicate — never a range-only
    * join — and the dimension (small beside its facts, same trade as
    * the per-batch rewrite above) is the broadcast side, so the fact
    * table streams through with no shuffle. */
  def enrichAsOf(facts: DataFrame, dim: DataFrame, factKey: String,
                 epochCol: String, joinType: String = "left"): DataFrame = {
    val d = dim.select(col("k"), col("seg"), col("vf"), col("vt"))
    facts.join(broadcast(d),
      facts(factKey) === d("k") &&
        d("vf") <= facts(epochCol) &&
        (d("vt").isNull || facts(epochCol) < d("vt")),
      joinType)
      .drop("k", "vf", "vt")
  }

  /** Drain the update stream into `dimDir` and return the final SCD2
    * table (the newest committed version). */
  def run(spark: SparkSession, updates: DataFrame, base: DataFrame,
          dimDir: String, ckptDir: String): DataFrame =
    // an empty input drains zero batches: the dimension stays the base
    VersionedView.run(spark, updates, dimDir, ckptDir, base) {
      (state, batch, batchId) => applyBatch(state, batch, batchId)
    }
}
