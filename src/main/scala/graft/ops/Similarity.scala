package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CosineSimilarity.cosineSim

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), north-star extension.
  *
  * Two paths:
  *  - [[bruteForceTopK]] — the correctness baseline: broadcast the (small)
  *    query set against the corpus, score with the codegen'd
  *    [[graft.functions.CosineSimilarity]] expression, rank per query.
  *    Linear in |corpus|·|queries|; the right plan when queries are few.
  *  - [[ivfTopK]] — the scale path: IVF coarse quantization. Corpus
  *    vectors are assigned once to their nearest of `nCells` centroids
  *    (broadcast join, one map pass); a query probes only its `nProbe`
  *    closest cells, so the scored fraction is ~nProbe/nCells of the
  *    corpus. At 100 TB the assignment is a materialized, cell-partitioned
  *    table and probing is partition pruning.
  *
  * Ranking ties are broken by neighbor id on a 6-dp-rounded similarity, so
  * results are engine-reproducible (oracle-safe).
  */
object Similarity {

  /** corpus: (vec_id, embedding); queries: (query_id, q_embedding). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosineSim(col("embedding"), col("q_embedding")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic seed centroids: the nCells lowest-id vectors. */
  def centroids(corpus: DataFrame, nCells: Int): DataFrame =
    corpus.orderBy(col("vec_id")).limit(nCells)
      .select(col("vec_id").as("cell_id"), col("embedding").as("centroid"))

  /** k-means (Lloyd) refinement of the seed centroids, as DataFrame ops:
    * assign (broadcast argmax, as [[ivfAssign]]) → recompute means
    * (groupBy cell, per-dimension average via posexplode) → repeat.
    * Deterministic: seeded from [[centroids]], fixed iteration count,
    * cosine assignment with id tie-breaks. Empty cells keep their
    * previous centroid. One broadcast-join pass + one aggregation per
    * iteration — linear in corpus size, no cartesian. */
  def kmeansCentroids(corpus: DataFrame, nCells: Int, iters: Int = 3): DataFrame = {
    var cents = centroids(corpus, nCells).cache()
    for (_ <- 1 to iters) {
      val assigned = ivfAssign(corpus, cents)
      val means = assigned
        .select(col("cell_id"), posexplode(col("embedding").cast("array<double>")))
        .groupBy(col("cell_id"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .groupBy(col("cell_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell_id"),
          transform(col("pm"), e => e.getField("m").cast("float")).as("centroid"))
      val next = cents.select(col("cell_id"), col("centroid").as("prev"))
        .join(means, Seq("cell_id"), "left")
        .select(col("cell_id"), coalesce(col("centroid"), col("prev")).as("centroid"))
        .cache()
      next.count() // materialize before dropping the previous generation
      cents.unpersist()
      cents = next
    }
    cents
  }

  /** Assign every corpus vector to its nearest centroid: broadcast join +
    * `max_by` argmax. The aggregation gets a map-side partial, so the
    * exchange carries one row per vector — not the nCells-fold expansion
    * a window-rank formulation would shuffle. Ties break to the lowest
    * cell_id (the negated id in the ordering struct). */
  def ivfAssign(corpus: DataFrame, cents: DataFrame): DataFrame =
    corpus.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("cell_id"),
        round(cosineSim(col("embedding"), col("centroid")), 6).as("sim"))
      .groupBy(col("vec_id"))
      .agg(
        first(col("embedding")).as("embedding"),
        max_by(col("cell_id"), struct(col("sim"), -col("cell_id"))).as("cell_id"))

  /** IVF search: probe the query's nProbe nearest cells only.
    * `trainIters > 0` refines the seed centroids with k-means first. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCells: Int = 16, nProbe: Int = 4, trainIters: Int = 0): DataFrame = {
    // nCells rows: the broadcast() at each use site is the right
    // distribution mechanism, a storage-level cache adds nothing
    val cents =
      if (trainIters > 0) kmeansCentroids(corpus, nCells, trainIters)
      else centroids(corpus, nCells)
    val assigned = ivfAssign(corpus, cents)
    // nProbe nearest cells per query
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cell_id"))
    val probes = queries.crossJoin(broadcast(cents))
      .select(col("query_id"), col("q_embedding"), col("cell_id"),
        round(cosineSim(col("q_embedding"), col("centroid")), 6).as("sim"))
      .withColumn("rnk", row_number().over(wq))
      .filter(col("rnk") <= nProbe)
      .select(col("query_id"), col("q_embedding"), col("cell_id"))
    // score only vectors in probed cells
    val scored = probes.join(assigned, "cell_id")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosineSim(col("embedding"), col("q_embedding")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** All-pairs cosine ≥ threshold — embedding near-dup detection.
    * Brute variant (correctness baseline / oracle-checkable). The scale
    * path reuses the IVF cells or SimHash-style sign-LSH banding to bound
    * the pair space. */
  def nearDupPairs(corpus: DataFrame, threshold: Double): DataFrame = {
    val a = corpus.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val b = corpus.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosineSim(col("emb_a"), col("emb_b")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}
