package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.TrainingPrepQueries

/** s10's truncation claim, proven: reciprocal-rank fusion over each
  * arm's top-K candidates (K = 100 — the shipped, scale-safe plan)
  * produces the IDENTICAL top-10 to fusing the arms' full corpus-wide
  * rankings (the naive construction whose unpartitioned windows the
  * shipped query avoids). The fixture has 500 docs per arm, so the
  * K = 100 cut is genuinely binding — 400 ranks per arm are discarded —
  * and the equality is the real argument: a doc outside both top-100s
  * is rank-bounded to rrf ≤ 2/(60 + 101), below any fused top-10
  * score reachable with a sub-100 rank. */
class HybridFusionSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("s10: fused top-10 over truncated candidate lists equals full-rank fusion") {
    import graft.functions.CosineSimilarity.cosineSim
    // full-rank fusion: corpus-wide windows (spec-only baseline)
    val bm = TrainingPrepQueries.bm25Scores(spark, sf, Seq("join", "vector", "scan"))
      .withColumn("r_bm25",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))))
      .select(col("doc_id"), col("r_bm25"))
    val emb = Tables.load(spark, sf, "embeddings")
    val qvec = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).collect()(0).getSeq[Float](0)
    val cos = emb.select(col("vec_id").as("doc_id"),
        round(cosineSim(col("embedding"), typedLit(qvec)), 6).as("cs"))
      .filter(!isnan(col("cs")))
      .withColumn("r_cos",
        row_number().over(Window.orderBy(col("cs").desc, col("doc_id"))))
      .select(col("doc_id"), col("r_cos"))
    val full = bm.join(cos, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        round(coalesce(lit(1.0) / (lit(60.0) + col("r_bm25")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60.0) + col("r_cos")), lit(0.0)), 6).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))

    val shipped = SparkEntry.queries("s10_hybrid_search")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))

    // the truncation must be binding for this to prove anything
    assert(Tables.load(spark, sf, "documents").count() > 100,
      "fixture must exceed K=100 per arm or the cut is vacuous")
    assert(shipped.toSeq == full.toSeq,
      s"truncated fusion diverged from full-rank fusion:\n" +
        s"  shipped: ${shipped.mkString(", ")}\n" +
        s"  full:    ${full.mkString(", ")}")
  }
}
