package graft

import org.apache.spark.sql.functions._

import graft.functions.{MinHashSig, TokenSetCount, WordNGrams}
import graft.ops.Dedup

/** Edge-case behavior of the custom expressions: empty inputs, single
  * tokens, nulls, and cross-path (eval vs codegen) consistency. */
class ExpressionEdgeSpec extends SparkSpec {
  import spark.implicits._

  test("WordNGrams: fewer than n tokens → empty; nulls skipped like concat_ws") {
    val df = Seq(
      Seq("a"),                 // < n
      Seq("a", "b"),            // exactly n
      Seq("a", "b", "a", "b"),  // duplicate grams collapse
      Seq.empty[String]
    ).toDF("t").select(WordNGrams.wordNGrams($"t", 2).as("g"))
    val out = df.as[Seq[String]].collect().toSeq
    assert(out(0) == Seq())
    assert(out(1) == Seq("a b"))
    assert(out(2) == Seq("a b", "b a")) // distinct, first-occurrence order
    assert(out(3) == Seq())
  }

  test("MinHashSig: empty shingles → sentinel signature; determinism; k length") {
    val df = Seq(Seq.empty[String], Seq("x"), Seq("x"), Seq("y"))
      .toDF("s").select(MinHashSig.minhashSig($"s", 8).as("sig"))
    val out = df.as[Seq[Long]].collect().toSeq
    assert(out.forall(_.length == 8))
    assert(out(0).forall(_ == Long.MaxValue)) // no shingle observed
    assert(out(1) == out(2))                  // deterministic
    assert(out(1) != out(3))                  // input-sensitive
  }

  test("TokenSetCount: repeats counted, case-sensitive, empty inputs") {
    val stops = Seq("the", "a")
    val df = Seq(
      Seq("the", "a", "the", "x"),
      Seq("The", "A"),          // case-sensitive: no hits
      Seq.empty[String]
    ).toDF("t").select(TokenSetCount.tokenSetCount($"t", stops).as("n"))
    assert(df.as[Int].collect().toSeq == Seq(3, 0, 0))
  }

  test("SrpSig: word count, determinism, float/double parity, null handling") {
    import graft.functions.SrpSig
    val v = Seq(0.5f, -1.25f, 3.0f, 0.0f)
    val df = Seq(v, v).toDF("e")
      .select(SrpSig.srpSig($"e", 2).as("sig"),
        SrpSig.srpSig($"e".cast("array<double>"), 2).as("sigd"))
    val rows = df.collect()
    val s0 = rows(0).getSeq[Long](0)
    assert(s0.length == 2)
    assert(rows(1).getSeq[Long](0) == s0)            // deterministic
    assert(rows(0).getSeq[Long](1) == s0)            // float ≡ double (exact widening)
    // null array → null signature
    val nullRow = Seq(Option.empty[Seq[Float]]).toDF("e")
      .select(SrpSig.srpSig($"e", 1).as("sig")).collect()(0)
    assert(nullRow.isNullAt(0))
    // sign flip of the vector flips every plane sign → complementary bits
    val flip = Seq(v, v.map(-_)).toDF("e")
      .select(SrpSig.srpSig($"e", 1).as("sig"))
      .collect().map(_.getSeq[Long](0).head)
    // zero-accumulator planes (acc == 0) break ties to 0 on both, so the
    // XOR is a subset of all-ones but nonzero for a non-degenerate vector
    assert(flip(0) != flip(1))
  }

  test("TokenSetCount rejects non-string arrays at analysis") {
    val err = intercept[Exception] {
      Seq(Seq(1, 2)).toDF("t")
        .select(TokenSetCount.tokenSetCount($"t", Seq("x"))).collect()
    }
    assert(err.getMessage.contains("token_set_count") ||
      err.getMessage.toLowerCase.contains("data type mismatch"))
  }

  test("SpaceSavingTopK exact regime: capacity ≥ vocab → exact counts, zero error") {
    import graft.functions.SpaceSavingTopK
    val df = Seq("a", "b", "a", "c", "a", "b").toDF("t").repartition(3)
    val out = df.agg(SpaceSavingTopK.topK($"t", 3, 8).as("tk"))
      .select(explode($"tk").as("e"))
      .select($"e.term", $"e.count", $"e.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a", 3L, 0L), ("b", 2L, 0L), ("c", 1L, 0L)))
  }

  test("SpaceSavingTopK approximate regime: bounded state, heavy hitters guaranteed") {
    import graft.functions.SpaceSavingTopK
    // 5 heavy terms (1000 each) + 500 tail terms (~4 each): vocab 505
    // far exceeds capacity 64, forcing evictions and merges
    val rows = new scala.util.Random(3)
      .shuffle((0 until 5).flatMap(h => Seq.fill(1000)(s"heavy$h")) ++
        (0 until 500).flatMap(t => Seq.fill(4)(s"tail$t")))
    val df = rows.toDF("t").repartition(8)
    val trueCounts = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val out = df.agg(SpaceSavingTopK.topK($"t", 10, 64).as("tk"))
      .select(explode($"tk").as("e"))
      .select($"e.term", $"e.count", $"e.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // every term with f > n/capacity (7000/64 ≈ 109) must be reported
    val reported = out.map(_._1).toSet
    (0 until 5).foreach(h => assert(reported.contains(s"heavy$h"),
      s"heavy$h missing from $reported"))
    // bounds: count - err <= true frequency <= count
    out.foreach { case (t, c, e) =>
      val f = trueCounts.getOrElse(t, 0L)
      assert(f <= c, s"$t: true $f > upper $c")
      assert(c - e <= f, s"$t: lower ${c - e} > true $f")
    }
    // state stayed bounded: the output is a k-list from a 64-counter summary
    assert(out.length == 10)
  }

  test("SpaceSavingTopK merge bound: count − err ≤ f ≤ count under random merge orders") {
    import graft.functions.SpaceSavingTopK.Summary
    // Summary-level property test (no Spark): random skewed streams,
    // capacity << vocab, random substream partitions, two merge
    // topologies (left fold and balanced tree). The mergeable-summaries
    // bound must hold for every reported term in every configuration.
    val rng = new scala.util.Random(17)
    for (trial <- 0 until 20) {
      val capacity = 8 + rng.nextInt(24)           // 8..31
      val vocab = capacity * 3 + rng.nextInt(100)  // always > capacity
      val n = 2000 + rng.nextInt(4000)
      // zipf-ish skew so some terms are genuinely heavy
      val stream = Seq.fill(n) {
        val r = rng.nextDouble()
        if (r < 0.5) s"t${rng.nextInt(5)}" else s"t${rng.nextInt(vocab)}"
      }
      val trueCounts = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val nParts = 2 + rng.nextInt(6)
      val parts = stream.zipWithIndex.groupBy(_._2 % nParts).values.map(_.map(_._1))
      val summaries = parts.map { p =>
        val s = new Summary(capacity)
        p.foreach(t => s.offer(t, 1L, 0L))
        s
      }.toVector
      def check(s: Summary, how: String): Unit =
        s.top(capacity).foreach { case (t, c, e) =>
          val f = trueCounts.getOrElse(t, 0L)
          assert(f <= c, s"trial $trial $how $t: true $f > upper $c")
          assert(c - e <= f, s"trial $trial $how $t: lower ${c - e} > true $f")
        }
      // left fold over a shuffled order
      val foldOrder = rng.shuffle(summaries)
      val folded = foldOrder.map(reserialize(_, capacity)).reduceLeft { (a, b) =>
        a.mergeIn(b); a
      }
      check(folded, "fold")
      // balanced tree merge
      def tree(v: Vector[Summary]): Summary =
        if (v.size == 1) v.head
        else {
          val (l, r) = v.splitAt(v.size / 2)
          val a = tree(l); a.mergeIn(tree(r)); a
        }
      check(tree(rng.shuffle(summaries).map(reserialize(_, capacity))), "tree")
    }
  }

  test("TopCells: exact top-n under random partitions, merge orders, and byte round-trips") {
    import graft.functions.TopCells.Buf
    // Buf-level property test (no Spark): the bounded buffer must
    // produce EXACTLY the reference top-n — (score desc, key asc),
    // truncated at n — for any stream partitioning, any merge topology,
    // and with every partial round-tripped through bytes as the
    // exchange would. Duplicate scores exercise the tie-break; n larger
    // than the input exercises the underfilled regime.
    val rng = new scala.util.Random(23)
    for (trial <- 0 until 30) {
      val n = 1 + rng.nextInt(8)
      val m = rng.nextInt(60)
      val entries = Seq.fill(m)(
        (rng.nextInt(6).toDouble / 2.0, rng.nextInt(1000).toLong))
        .distinct // duplicate (score, key) pairs would legitimately
                  // double-insert in the buffer but not in a set model
      val reference = entries.sortBy { case (s, c) => (-s, c) }
        .map(_._2).take(n)
      val nParts = 1 + rng.nextInt(5)
      val parts = entries.zipWithIndex.groupBy(_._2 % nParts)
        .values.map(_.map(_._1)).toVector
      def mk(p: Seq[(Double, Long)]): Buf = {
        val b = new Buf(n)
        p.foreach { case (s, c) => b.offer(s, c) }
        Buf.fromBytes(b.toBytes, n) // shuffle round-trip
      }
      val folded = rng.shuffle(parts).map(mk).reduceLeft { (a, b) =>
        a.mergeIn(b); a
      }
      assert(folded.result.toSeq == reference,
        s"trial $trial: fold merge diverged from the reference ranking")
      def tree(v: Vector[Buf]): Buf =
        if (v.size == 1) v.head
        else { val (l, r) = v.splitAt(v.size / 2)
               val a = tree(l); a.mergeIn(tree(r)); a }
      assert(tree(rng.shuffle(parts).map(mk)).result.toSeq == reference,
        s"trial $trial: tree merge diverged from the reference ranking")
    }
  }

  test("TopCells ranks NaN scores worst, matching the literal sort_array path") {
    import graft.functions.TopCells.Buf
    // a degenerate centroid can score NaN; the literal path's
    // sort_array puts negated-NaN LAST (Spark orders NaN greatest), so
    // the bounded buffer must too — a strict > alone would let an
    // early NaN lodge at the top and block every later entry
    val b = new Buf(3)
    b.offer(Double.NaN, 7L)
    b.offer(0.5, 2L); b.offer(0.9, 1L); b.offer(0.1, 3L)
    assert(b.result.toSeq == Seq(1L, 2L, 3L),
      s"NaN must not outrank real scores: ${b.result.toSeq}")
    val onlyNaN = new Buf(2)
    onlyNaN.offer(Double.NaN, 9L); onlyNaN.offer(Double.NaN, 4L)
    assert(onlyNaN.result.toSeq == Seq(4L, 9L),
      "all-NaN groups tie-break by cell id")
  }

  /** Round-trip through bytes, as shuffle does — also covers the
    * evicted-flag serialization. */
  private def reserialize(s: graft.functions.SpaceSavingTopK.Summary,
                          capacity: Int): graft.functions.SpaceSavingTopK.Summary =
    graft.functions.SpaceSavingTopK.Summary.fromBytes(s.toBytes, capacity)

  test("KllQuantiles exact regime: capacity ≥ n reproduces exact lower quantiles") {
    import graft.functions.KllQuantiles
    val vals = new scala.util.Random(29).shuffle((1 to 1000).toVector)
    val df = vals.map(_.toDouble).toDF("v").repartition(7)
    val qs = df.agg(KllQuantiles.quantilesBp($"v", Seq(5000, 9000, 9900), 2048).as("q"))
      .collect()(0).getSeq[Double](0)
    // exact lower quantiles of 1..1000: rank (1000·bp + 9999)/10000
    assert(qs == Seq(500.0, 900.0, 990.0), qs.toString)
  }

  test("KllQuantiles approximate regime: bounded state, bounded rank error under merges") {
    import graft.functions.KllQuantiles
    // 100k values, capacity 256: compaction must engage (state ≪ n) and
    // the weighted-rank answer must stay within a few % of exact ranks
    // across the partial-aggregation merge tree
    val n = 100000
    val vals = new scala.util.Random(31).shuffle((1 to n).toVector)
    val df = vals.map(_.toDouble).toDF("v").repartition(16)
    val qs = df.agg(KllQuantiles.quantilesBp($"v", Seq(5000, 9000, 9900), 256).as("q"))
      .collect()(0).getSeq[Double](0)
    val targets = Seq(0.5, 0.9, 0.99).map(_ * n)
    qs.zip(targets).foreach { case (got, want) =>
      val rankErr = math.abs(got - want) / n
      assert(rankErr <= 0.05, s"quantile $got vs exact rank $want: error $rankErr")
    }
    // serialization round-trip preserves the answer (shuffle path)
    val s = new KllQuantiles.Summary(64)
    (1 to 500).foreach(i => s.update(i.toDouble))
    val rt = KllQuantiles.Summary.fromBytes(s.toBytes, 64)
    assert(rt.quantile(5000) == s.quantile(5000))
    // empty summary yields NaN, not a crash
    assert(new KllQuantiles.Summary(8).quantile(5000).isNaN)
  }

  test("minhash candidate generation on a corpus of only short docs is empty") {
    val docs = Seq((1L, "one two"), (2L, "three four"), (3L, "five six"))
      .toDF("doc_id", "text")
    // 3-grams need >= 3 words: all shingle sets empty → zero candidates,
    // zero pairs (not an all-pairs sentinel collision)
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", n = 3, threshold = 0.1)
    assert(pairs.count() == 0)
  }

  test("ZOrder2: interleave round-trips bits, orders rectangles, codegen-safe") {
    import graft.functions.ZOrder2
    // bit-exact: a's bits at even positions, b's at odd
    assert(ZOrder2.interleave(0L, 0L) == 0L)
    assert(ZOrder2.interleave(1L, 0L) == 1L)
    assert(ZOrder2.interleave(0L, 1L) == 2L)
    assert(ZOrder2.interleave(3L, 3L) == 15L)
    // 31 ones spread to even positions 0..60; b shifts them to odd
    assert(ZOrder2.interleave(0x7fffffffL, 0L) == 0x1555555555555555L)
    assert(ZOrder2.interleave(0L, 0x7fffffffL) == 0x2AAAAAAAAAAAAAAAL)
    // monotone within a fixed quadrant: higher (a, b) never lowers z
    for (a <- 0L to 16L; b <- 0L to 16L) {
      assert(ZOrder2.interleave(a + 1, b) > ZOrder2.interleave(a, b) ||
        ZOrder2.interleave(a, b + 1) > ZOrder2.interleave(a, b))
      assert(ZOrder2.interleave(a + 1, b + 1) > ZOrder2.interleave(a, b))
    }
    // expression path (codegen) equals the static helper
    val got = spark.range(100)
      .select(graft.functions.ZOrder2.zorder2(col("id"), col("id") * 3).as("z"))
      .collect().map(_.getLong(0))
    val want = (0L until 100L).map(i => ZOrder2.interleave(i, i * 3))
    assert(got.toSeq == want)
  }

  test("CMS point estimates: never undercount; overcount bounded by eps·N") {
    val sf = "/root/testdata/sf0.001"
    val eps = 0.001
    val terms = Tables.load(spark, sf, "documents")
      .select(col("source"),
        explode(graft.ops.TextAnalysis.tokens(lower(col("text")))).as("term"))
      .cache()
    try {
      val probes = Seq("data", "spark", "table", "window", "zzz_absent")
      val est = terms.groupBy(col("source"))
        .agg(expr("count_min_sketch(term, 0.001d, 0.99d, 42)").as("sk"))
        .select(col("source"),
          explode(array(probes.map(lit): _*)).as("term"), col("sk"))
        .select(col("source"), col("term"),
          graft.functions.CmsEstimate.cmsEstimate(col("sk"), col("term")).as("est"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val exact = terms.filter(col("term").isin(probes.map(lit): _*))
        .groupBy(col("source"), col("term")).count()
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val n = terms.groupBy(col("source")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      est.foreach { case ((src, term), e) =>
        val t = exact.getOrElse((src, term), 0L)
        assert(e >= t, s"CMS undercounted ($src,$term): $e < $t")
        assert(e <= t + math.max(1L, (eps * n(src)).ceil.toLong),
          s"CMS overcount past eps·N for ($src,$term): est $e, exact $t, N ${n(src)}")
        // the fixture runs in the EXACT regime (~31 distinct terms per
        // source vs width 2000 × depth 7: some row is collision-free for
        // every probe), which is what licenses q56's exact-count DuckDB
        // oracle — this assertion flips if the corpus vocabulary ever
        // grows into the approximate regime, so the oracle can't rot
        // silently
        assert(e == t, s"q56 exact-regime premise broken ($src,$term): $e != $t")
      }
      // absent term is present in the probe output for every source
      assert(est.keys.count(_._2 == "zzz_absent") == n.size)
    } finally { terms.unpersist(); () }
  }

  test("KmvSketch exact regime: untrimmed sketches give exact distinct + intersection") {
    import spark.implicits._
    import graft.functions.KmvSketch
    // two overlapping value sets, k well above both cardinalities
    val df = ((0 until 300).map(i => ("a", s"u$i")) ++
      (200 until 600).map(i => ("b", s"u$i"))).toDF("g", "v")
    val sk = df.groupBy($"g").agg(KmvSketch.kmvSketch($"v", 1024).as("sk"))
    val row = sk.select($"g", KmvSketch.kmvEstimate($"sk").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(row == Map("a" -> 300L, "b" -> 400L))
    val a = sk.filter($"g" === "a").select($"sk".as("sk_a"))
    val b = sk.filter($"g" === "b").select($"sk".as("sk_b"))
    val common = a.crossJoin(b)
      .select(KmvSketch.kmvIntersect($"sk_a", $"sk_b")).head.getLong(0)
    assert(common == 100L) // u200..u299
    // merge-topology independence: the sketch is a pure function of the
    // value SET — byte-identical under any partitioning
    def bytesOf(parts: Int): Seq[Array[Byte]] =
      df.repartition(parts).groupBy($"g").agg(KmvSketch.kmvSketch($"v", 1024).as("sk"))
        .orderBy($"g").collect().map(_.getAs[Array[Byte]]("sk")).toSeq
    val Seq(x1, x2) = bytesOf(1)
    val Seq(y1, y2) = bytesOf(13)
    assert(java.util.Arrays.equals(x1, y1) && java.util.Arrays.equals(x2, y2),
      "serialized sketch must not depend on merge topology")
  }

  test("KmvSketch approximate regime: ~1/sqrt(k) error for counts and intersections") {
    import spark.implicits._
    import graft.functions.KmvSketch
    // 20k distinct per side, 10k shared; k = 256 → expect ~6% typical
    // error, gate at 25% (counts) / 35% (intersection — union-scaled)
    val df = ((0 until 20000).map(i => ("a", s"x$i")) ++
      (10000 until 30000).map(i => ("b", s"x$i"))).toDF("g", "v")
    val sk = df.groupBy($"g").agg(KmvSketch.kmvSketch($"v", 256).as("sk"))
    val est = sk.select($"g", KmvSketch.kmvEstimate($"sk").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    est.foreach { case (g, n) =>
      assert(math.abs(n - 20000.0) / 20000.0 <= 0.25, s"$g estimate $n vs 20000")
    }
    val a = sk.filter($"g" === "a").select($"sk".as("sk_a"))
    val b = sk.filter($"g" === "b").select($"sk".as("sk_b"))
    val common = a.crossJoin(b)
      .select(KmvSketch.kmvIntersect($"sk_a", $"sk_b")).head.getLong(0)
    assert(math.abs(common - 10000.0) / 10000.0 <= 0.35,
      s"intersection estimate $common vs 10000")
    // state is bounded: a trimmed sketch serializes ≤ k hashes
    val sizes = sk.select(length($"sk")).collect().map(_.getInt(0))
    assert(sizes.forall(_ <= 5 + 256 * 8), s"sketch exceeded k longs: ${sizes.toSeq}")
  }

  test("KmvSketch SQL registration: kmv_sketch/kmv_estimate/kmv_intersect") {
    graft.functions.GraftFunctions.register(spark)
    val got = spark.sql(
      """WITH sk AS (SELECT kmv_sketch(CAST(v AS STRING), 64) AS s
        |            FROM VALUES ('p'),('q'),('r'),('p') AS t(v))
        |SELECT kmv_estimate(s), kmv_intersect(s, s) FROM sk""".stripMargin)
      .head()
    assert(got.getLong(0) == 3L && got.getLong(1) == 3L)
  }

  test("KmvSketch rejects undersized k at analysis time, like the item-type check") {
    graft.functions.GraftFunctions.register(spark)
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT kmv_sketch(v, 8) FROM VALUES ('p'),('q') AS t(v)")
        .collect()
    }
    assert(ex.getMessage.contains("k >= 16"), ex.getMessage)
  }
}
