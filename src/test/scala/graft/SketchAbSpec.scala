package graft

import org.apache.spark.sql.functions._

/** A/B contract for q184: Spark 4.1's native `approx_top_k` and the
  * custom [[graft.functions.SpaceSavingTopK]] aggregate answer the same
  * heavy-hitters question. In the exact regime (capacity ≥ distinct
  * count — the q47/q50 contract) the two must agree item-for-item and
  * count-for-count; the CORRECTNESS gate already certifies each against
  * the DuckDB group-count oracle, this pins them against EACH OTHER so
  * a drift in either sketch's exact-regime behavior is caught even if
  * the fixture distribution changes. */
class SketchAbSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("native approx_top_k == SpaceSavingTopK item-for-item in the exact regime") {
    val ev = Tables.load(spark, sf, "events")
    val native = ev
      .agg(expr("approx_top_k(event_type, 5, 64)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item"), col("e.count"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val custom = ev
      .agg(graft.functions.SpaceSavingTopK.topK(col("event_type"), 5, 64).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.term"), col("e.count"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(native.nonEmpty && native.size == 5)
    assert(native == custom,
      s"sketches disagree: native-only=${native -- custom}, custom-only=${custom -- native}")
  }

  test("approx_top_k exact counts survive accumulate/combine/estimate merge") {
    // the mergeability contract that makes the sketch a 100 TB agg:
    // per-partition partials combined == the one-shot answer
    val ev = Tables.load(spark, sf, "events")
    ev.createOrReplaceTempView("ev_ab")
    val oneShot = spark.sql(
      """SELECT e.item, e.count FROM (
        |  SELECT explode(approx_top_k(event_type, 5, 64)) AS e FROM ev_ab)"""
        .stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val merged = spark.sql(
      """SELECT e.item, e.count FROM (
        |  SELECT explode(approx_top_k_estimate(
        |    approx_top_k_combine(sk, 64), 5)) AS e
        |  FROM (SELECT approx_top_k_accumulate(event_type, 64) AS sk
        |        FROM ev_ab GROUP BY user_id % 8))"""
        .stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(merged == oneShot,
      s"merge path drifted: merged-only=${merged -- oneShot}, oneshot-only=${oneShot -- merged}")
  }
}
