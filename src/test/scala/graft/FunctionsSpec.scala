package graft

import org.apache.spark.sql.functions._

import graft.functions.CosineSimilarity.cosineSim
import graft.functions.SimHash

/** Unit tests for the custom Catalyst expressions. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine_sim matches the HOF reference implementation") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)),
      (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
      (Array(1.0f, 2.0f, 0.5f), Array(-1.0f, 0.25f, 4.0f))
    ).toDF("a", "b")
    val hof = df.select(
      (aggregate(zip_with($"a".cast("array<double>"), $"b".cast("array<double>"),
        (x, y) => x * y), lit(0d), (acc, x) => acc + x) /
        (sqrt(aggregate($"a".cast("array<double>"), lit(0d), (acc, x) => acc + x * x)) *
          sqrt(aggregate($"b".cast("array<double>"), lit(0d), (acc, x) => acc + x * x))))
        .as("c")).as[Double].collect()
    val fast = df.select(cosineSim($"a", $"b").as("c")).as[Double].collect()
    hof.zip(fast).foreach { case (h, f) => assert(math.abs(h - f) < 1e-12) }
    assert(math.abs(fast(0) - 1.0) < 1e-12)
    assert(math.abs(fast(1)) < 1e-12)
  }

  test("cosine_sim is null-safe") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), None: Option[Array[Float]]),
      (None: Option[Array[Float]], Some(Array(1.0f, 2.0f))))
      .toDF("a", "b")
    val out = df.select(cosineSim($"a", $"b")).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("cosine_sim survives codegen (wholestage on)") {
    // larger input so the plan actually goes through WholeStageCodegen
    val n = 1000
    val df = spark.range(n).select(
      transform(sequence(lit(0), lit(7)), i => (col("id") + i).cast("double")).as("a"),
      transform(sequence(lit(0), lit(7)), i => (col("id") * 2 + i).cast("double")).as("b"))
    val res = df.select(cosineSim(col("a"), col("b")).as("c"))
      .agg(min("c"), max("c")).collect()(0)
    assert(res.getDouble(0) > 0.8 && res.getDouble(1) <= 1.0 + 1e-12)
  }

  test("simhash: identical token arrays → identical hash; small perturbation → small hamming") {
    def fp(tokens: Seq[String]*): Seq[Long] =
      tokens.toDF("t").select(SimHash.simhash($"t").as("h")).as[Long].collect().toSeq

    val base = (1 to 200).map(i => s"tok$i")
    val perturbed = base.updated(7, "tokX").updated(91, "tokY")
    val unrelated = (1 to 200).map(i => s"other$i")
    val Seq(h1, h1b, h2, h3) = fp(base, base, perturbed, unrelated)
    assert(h1 == h1b)
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(h1, h2) <= 8, s"perturbed hamming ${hamming(h1, h2)}")
    assert(hamming(h1, h3) >= 16, s"unrelated hamming ${hamming(h1, h3)}")
  }

  test("simhash_md5: single-token fingerprint IS the first 8 md5 bytes (the oracle's bit layout)") {
    graft.functions.GraftFunctions.register(spark)
    // one token → every bit counter is ±1, so the fingerprint equals the
    // token hash itself. md5('a') = 0cc175b9c0f1b6a8..., big-endian
    // first 8 bytes = 0x0cc175b9c0f1b6a8 — exactly the value the d04
    // DuckDB oracle reconstructs from substr(md5(t),1,16) hex digits.
    // This pins the byte order + hex decoding both engines must share.
    val got = spark.sql("SELECT simhash_md5(array('a'))").head.getLong(0)
    assert(got == 0x0cc175b9c0f1b6a8L, f"got $got%016x")
    // null tokens skipped, null array propagates (parity with simhash)
    val r = spark.sql(
      """SELECT simhash_md5(array('a', CAST(NULL AS STRING))),
        |       simhash_md5(CAST(NULL AS ARRAY<STRING>))""".stripMargin).head
    assert(r.getLong(0) == 0x0cc175b9c0f1b6a8L && r.isNullAt(1))
    // non-token input is an ANALYSIS error, not an executor cast crash
    Seq("simhash_md5('abc')", "simhash(array(1, 2))").foreach { bad =>
      val ex = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(s"SELECT $bad").collect()
      }
      assert(ex.getMessage.contains("array<string>"), s"$bad: ${ex.getMessage}")
    }
  }

  test("SQL registration: all graft functions callable from spark.sql") {
    graft.functions.GraftFunctions.register(spark)
    Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .createOrReplaceTempView("emb_sql")
    val r = spark.sql(
      """SELECT cosine_sim(a.embedding, b.embedding) AS c
        |FROM emb_sql a JOIN emb_sql b ON a.vec_id = 0 AND b.vec_id = 1""".stripMargin)
      .collect()(0).getDouble(0)
    assert(r > -1.0 && r < 1.0)
    val rDot = spark.sql(
      """SELECT dot_product(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                   array(CAST(3.0 AS FLOAT), CAST(-0.5 AS FLOAT))) AS d""".stripMargin)
      .collect()(0).getDouble(0)
    assert(math.abs(rDot - 2.0) < 1e-12)
    val r2 = spark.sql(
      """SELECT simhash(split('a b c', ' ')) AS h,
        |       minhash_sig(word_ngrams(split('a b c d', ' '), 2), 4) AS sig""".stripMargin)
      .collect()(0)
    assert(r2.getLong(0) != 0L)
    assert(r2.getSeq[Long](1).length == 4)
    // round-2 functions through SQL: SRP signature, quantized cosine
    // (identical vector → 1.0), Space-Saving aggregate
    val r3 = spark.sql(
      """SELECT srp_sig(array(CAST(1.0 AS FLOAT), CAST(-2.0 AS FLOAT)), 2) AS s,
        |  cosine_sim_q8(array(CAST(1.0 AS FLOAT), CAST(0.5 AS FLOAT)),
        |    array(CAST(127 AS TINYINT), CAST(64 AS TINYINT)),
        |    CAST(0.007874016 AS FLOAT)) AS cq""".stripMargin).collect()(0)
    assert(r3.getSeq[Long](0).length == 2)
    assert(math.abs(r3.getDouble(1) - 1.0) < 1e-3) // 64/127 ≈ 0.5039 ~ 0.5
    val r4 = spark.sql(
      """SELECT space_saving_topk(t, 2, 8) AS tk
        |FROM VALUES ('a'), ('b'), ('a'), ('a') AS v(t)""".stripMargin).collect()(0)
    val top = r4.getSeq[org.apache.spark.sql.Row](0)
    assert(top.head.getString(0) == "a" && top.head.getLong(1) == 3L)
    // kll_quantile: exact regime (capacity ≥ n) → exact lower median
    val r5 = spark.sql(
      """SELECT kll_quantile(CAST(v AS DOUBLE), 5000, 16) AS q
        |FROM VALUES (1), (2), (3), (4) AS t(v)""".stripMargin).collect()(0)
    assert(r5.getSeq[Double](0) == Seq(2.0)) // rank ceil(4·0.5) = 2
    // quantize_q8: max element hits ±127, scale recovers the max
    val r6 = spark.sql(
      """SELECT quantize_q8(array(CAST(0.5 AS FLOAT), CAST(-1.0 AS FLOAT))) AS qz"""
    ).collect()(0).getStruct(0)
    assert(r6.getSeq[Byte](1) == Seq[Byte](64, -127), r6.toString)
    assert(math.abs(r6.getDouble(0) - 1.0 / 127) < 1e-9)
    // GraftExtensions (the spark.sql.extensions deploy path) injects
    // from the same canonical list register() uses — pin its contents
    // so a function added to one path can't silently miss the other
    assert(graft.functions.GraftFunctions.functions.map(_._1).toSet ==
      Set("cosine_sim", "dot_product", "cosine_sim_q8", "simhash", "simhash_md5", "minhash_sig",
        "word_ngrams", "srp_sig", "space_saving_topk", "kll_quantile",
        "quantize_q8", "bloom_filter_agg", "bloom_might_contain",
        "cms_estimate", "kmv_sketch", "kmv_estimate", "kmv_intersect",
        "token_set_count", "zorder2",
        "id_bitmap", "id_bitmap_or", "id_bitmap_count", "id_bitmap_and_count"))
  }

  test("token_set_count and zorder2 evaluate through the SQL registry") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT token_set_count(array('the','cat','sat','the'), array('the','a')) AS n,
        |       zorder2(3L, 5L) AS z""".stripMargin).collect()(0)
    assert(r.getInt(0) == 2, s"token_set_count: ${r.getInt(0)}")
    val viaColumn = spark.range(1)
      .select(graft.functions.ZOrder2.zorder2(
        org.apache.spark.sql.functions.lit(3L),
        org.apache.spark.sql.functions.lit(5L)).as("z"))
      .collect()(0).getLong(0)
    assert(r.getLong(1) == viaColumn, "SQL and Column zorder2 must agree")
  }

  test("cms_estimate reads Spark's built-in count_min_sketch aggregate") {
    graft.functions.GraftFunctions.register(spark)
    val est = spark.sql(
      """SELECT cms_estimate(
        |  (SELECT count_min_sketch(v, 0.001d, 0.99d, 42)
        |   FROM VALUES ('a'),('a'),('a'),('b') AS t(v)), 'a') AS e""".stripMargin)
      .collect()(0).getLong(0)
    assert(est == 3L) // tiny sketch, no collisions: exact
  }

  test("cms_estimate per-thread cache hits across the probe fan-out") {
    graft.functions.GraftFunctions.register(spark)
    // q56's shape: ONE sketch fanned out against many probe rows. Binary
    // values from UnsafeRows are fresh per-row copies, so a reference-
    // keyed cache would re-parse per row — the content (Arrays.equals)
    // key must hold parses to ~one per (thread, sketch), not per row.
    graft.functions.CmsEstimate.parseCount.reset()
    val probes = 500
    // CROSS JOIN (not a scalar subquery, which folds to a literal and
    // would share one array reference): the sketch arrives as a per-row
    // binary column read, the shape the content key exists for
    val est = spark.sql(
      s"""WITH sk AS (SELECT count_min_sketch(CAST(v AS STRING), 0.001d, 0.99d, 42) AS s
         |            FROM range(1000) AS t(v))
         |SELECT cms_estimate(s, CAST(id % 100 AS STRING)) AS e
         |FROM sk CROSS JOIN range($probes)""".stripMargin)
      .collect().map(_.getLong(0))
    assert(est.forall(_ >= 1L)) // every probed value exists once
    val parses = graft.functions.CmsEstimate.parseCount.sum()
    assert(parses > 0, "fan-out must deserialize at least once")
    assert(parses <= 32,
      s"cache never hits: $parses parses for $probes probe rows")
  }

  test("bloom SQL pair: scalar-subquery filter probes with no false negatives") {
    graft.functions.GraftFunctions.register(spark)
    // every member key must probe true (bloom has no false negatives)
    val hits = spark.sql(
      """SELECT bloom_might_contain(
        |  (SELECT bloom_filter_agg(v, 16) FROM VALUES ('a'),('b'),('c') AS t(v)),
        |  v) AS hit
        |FROM VALUES ('a'),('b'),('c') AS t(v)""".stripMargin)
      .collect().map(_.getBoolean(0))
    assert(hits.forall(identity))
    // a clearly-absent key with plenty of filter headroom probes false
    val miss = spark.sql(
      """SELECT bloom_might_contain(
        |  (SELECT bloom_filter_agg(v, 1024) FROM VALUES ('a'),('b'),('c') AS t(v)),
        |  'definitely-not-in-the-set') AS hit""".stripMargin)
      .collect()(0).getBoolean(0)
    assert(!miss)
  }

  test("simhash skips null tokens and nulls propagate") {
    val df = Seq(
      (Seq("a", "b"), Seq("a", "b")),
    ).toDF("x", "y")
      .select(SimHash.simhash($"x").as("hx"),
        SimHash.simhash(array_append($"y", lit(null).cast("string"))).as("hy"))
    val r = df.collect()(0)
    assert(r.getLong(0) == r.getLong(1)) // null token = no vote
    val nulled = Seq(Tuple1(null: Seq[String])).toDF("t")
      .select(SimHash.simhash($"t")).collect()(0)
    assert(nulled.isNullAt(0))
  }

  test("id_bitmap: exact distinct counts, canonical bytes, order-independent merge") {
    import graft.functions.IdBitmap
    // exact count vs count_distinct across many partitions (merge path)
    val ids = spark.range(0, 5000).select((col("id") * 7 % 1000).as("uid"))
      .repartition(16)
    val r = ids.agg(
      IdBitmap.bitmapCount(IdBitmap.idBitmap(col("uid"), 1L << 12)).as("bm"),
      count_distinct(col("uid")).as("cd")).head()
    assert(r.getLong(0) == r.getLong(1), s"bitmap ${r.getLong(0)} != exact ${r.getLong(1)}")
    // canonical serialization: same SET under different partitionings
    // yields byte-identical bitmaps (trailing zero words trimmed)
    val bytesA = ids.repartition(3).agg(IdBitmap.idBitmap(col("uid"), 1L << 12))
      .head().getAs[Array[Byte]](0)
    val bytesB = ids.repartition(13).agg(IdBitmap.idBitmap(col("uid"), 1L << 12))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(bytesA, bytesB), "non-canonical bitmap bytes")
    // re-aggregation: OR of per-group bitmaps == bitmap of the union
    val daily = ids.withColumn("g", col("uid") % 4)
      .groupBy(col("g")).agg(IdBitmap.idBitmap(col("uid"), 1L << 12).as("bm"))
    val merged = daily.agg(
      IdBitmap.bitmapCount(IdBitmap.bitmapOr(col("bm"))).as("n")).head().getLong(0)
    assert(merged == r.getLong(1), s"or-merge $merged != ${r.getLong(1)}")
  }

  test("bitmap_and_count overlap and the dense-id domain guard") {
    import graft.functions.IdBitmap
    val a = spark.range(0, 100).agg(IdBitmap.idBitmap(col("id"), 1L << 10).as("bm"))
    val b = spark.range(50, 200).agg(IdBitmap.idBitmap(col("id"), 1L << 10).as("bm"))
    val both = a.crossJoin(b.select(col("bm").as("bm2")))
      .select(IdBitmap.bitmapAndCount(col("bm"), col("bm2"))).head().getLong(0)
    assert(both == 50L, s"overlap $both != 50")
    // out-of-domain id must fail LOUDLY, not wrap or truncate
    val ex = intercept[Exception] {
      spark.range(0, 10).select((col("id") - 5).as("id"))
        .agg(IdBitmap.idBitmap(col("id"), 1L << 10)).head()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(ex).exists(_.contains("dense-id domain")), chain(ex).toString)
  }

  test("bitmap functions evaluate through the SQL registry") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT id_bitmap_count(bm) AS n,
        |       id_bitmap_and_count(bm, bm) AS overlap
        |FROM (SELECT id_bitmap(CAST(u AS BIGINT), 1024) AS bm
        |      FROM VALUES (1), (2), (2), (900) AS v(u))""".stripMargin).head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L, r.toString)
    // weekly-from-daily through SQL: id_bitmap_or over grouped bitmaps
    val r2 = spark.sql(
      """SELECT id_bitmap_count(id_bitmap_or(bm)) AS n FROM (
        |  SELECT g, id_bitmap(CAST(u AS BIGINT), 1024) AS bm
        |  FROM VALUES (0, 1), (0, 2), (1, 2), (1, 3) AS v(g, u)
        |  GROUP BY g)""".stripMargin).head()
    assert(r2.getLong(0) == 3L, r2.toString)
  }
}
