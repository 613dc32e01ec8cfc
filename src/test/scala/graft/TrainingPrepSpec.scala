package graft

import org.apache.spark.sql.functions._

import graft.ops.TrainingPrep

/** Invariants for the training-data preparation operators. */
class TrainingPrepSpec extends SparkSpec {
  import spark.implicits._

  test("splitAssign: deterministic, ~trainPct proportion, stable under append") {
    val ids = spark.range(0, 10000).toDF("id")
    val split = ids.select(col("id"), TrainingPrep.splitAssign(col("id"), 90).as("s"))
    val counts = split.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("train") + counts("val") == 10000)
    // multiplicative hashing spreads sequential ids near-uniformly
    assert(counts("train") >= 8700 && counts("train") <= 9300, s"skewed: $counts")
    // per-id assignment is a pure function of the id: evaluating over a
    // subset (append scenario) never flips an existing id's split
    val sub = spark.range(0, 100).toDF("id")
      .select(col("id"), TrainingPrep.splitAssign(col("id"), 90).as("s"))
    val full = split.filter(col("id") < 100)
    assert(sub.exceptAll(full).isEmpty && full.exceptAll(sub).isEmpty)
  }

  test("q67 leakage-free split: no near-dup pair crosses the train/val boundary") {
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, sf, "documents")
    val pairs = graft.ops.Dedup.substringNearDupPairs(docs, "doc_id", "text", n = 8)
    assert(pairs.count() > 0, "fixture must contain near-dup pairs")
    val clusters = graft.ops.Dedup.connectedComponents(pairs)
      .select(col("id").as("doc_id"), col("label").as("cluster"))
    val assign = docs.select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"),
        TrainingPrep.splitAssign(
          coalesce(col("cluster"), col("doc_id")), 90).as("split"))
    // every near-dup pair lands on ONE side — the leak q67 exists to kill
    val crossing = pairs
      .join(assign.select(col("doc_id").as("id_a"), col("split").as("s_a")), "id_a")
      .join(assign.select(col("doc_id").as("id_b"), col("split").as("s_b")), "id_b")
      .filter(col("s_a") =!= col("s_b"))
    assert(crossing.isEmpty, "a near-dup pair crossed the split boundary")
    // the doc-id hash (q40's rule) DOES leak on this fixture — the
    // contrast that motivates the unit hash
    val naive = docs.select(col("doc_id"),
      TrainingPrep.splitAssign(col("doc_id"), 90).as("split"))
    val naiveCrossing = pairs
      .join(naive.select(col("doc_id").as("id_a"), col("split").as("s_a")), "id_a")
      .join(naive.select(col("doc_id").as("id_b"), col("split").as("s_b")), "id_b")
      .filter(col("s_a") =!= col("s_b"))
    assert(!naiveCrossing.isEmpty,
      "fixture has no doc-id-hash leak — the contrast assertion is vacuous")
  }

  test("splitAssign: negative ids still split ~trainPct (pmod, not signed %)") {
    // signed % would make every negative id hash < trainPct ('train');
    // pmod keeps the bucket in [0, 100) so the split holds on any id sign
    val ids = spark.range(-10000, 0).toDF("id")
    val counts = ids.select(TrainingPrep.splitAssign(col("id"), 90).as("s"))
      .groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.getOrElse("val", 0L) >= 700, s"negative ids degenerate: $counts")
    assert(counts("train") + counts.getOrElse("val", 0L) == 10000)
  }

  test("balancedKeep: groups at/under cap keep everything, over-cap groups thin to ~cap") {
    val n = 1000
    val ids = spark.range(0, n).toDF("id")
    // group of size n with cap n: bucket·n < n·1e6 ⟺ bucket < 1e6 — always
    val keptAll = ids.filter(TrainingPrep.balancedKeep(col("id"), lit(n.toLong), n)).count()
    assert(keptAll == n, s"cap == groupN must keep all, kept $keptAll")
    // group of size 1000 with cap 100: expect ~100 kept (hash-uniform)
    val kept = ids.filter(TrainingPrep.balancedKeep(col("id"), lit(n.toLong), 100)).count()
    assert(kept >= 60 && kept <= 140, s"expected ~100 of 1000 kept, got $kept")
    // deterministic: same decision on re-evaluation
    val again = ids.filter(TrainingPrep.balancedKeep(col("id"), lit(n.toLong), 100)).count()
    assert(again == kept)
  }

  test("contaminatedDocs flags exactly the n-gram-overlapping docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),   // eval doc
      (2L, "a quick brown fox jumps over nothing much here"), // shares a 5-gram
      (3L, "completely different words with no overlap at all"),
      (4L, "short text")                                      // < 5 words: no grams
    ).toDF("doc_id", "text")
    val evalSet = docs.filter(col("doc_id") === 1)
    val flagged = graft.ops.Dedup.contaminatedDocs(docs, evalSet, "doc_id", "text", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged.keySet == Set(1L, 2L), flagged.toString)
    assert(flagged(1L) == 5L) // the eval doc shares all 5 of its own 5-grams
    assert(flagged(2L) == 1L) // "quick brown fox jumps over"
  }

  test("balancedKeep/epochRepeat edge weights: cap 0 keeps nothing, weight 0 drops all") {
    val ids = spark.range(0, 500).toDF("id")
    // cap 0: bucket·n < 0 is never true — an empty mix target empties the group
    assert(ids.filter(TrainingPrep.balancedKeep(col("id"), lit(500L), 0)).count() == 0)
    // weight 0 epochs: every repeat count is 0 — the source is excluded
    val reps = ids.select(TrainingPrep.epochRepeat(lit(0L), col("id")).as("r"))
      .agg(max(col("r")), min(col("r"))).head()
    assert(reps.getLong(0) == 0 && reps.getLong(1) == 0)
  }

  test("epochRepeat: floor/ceil repeats in the fractional-epoch proportion") {
    val ids = spark.range(0, 2000).toDF("id")
    val reps = ids.select(TrainingPrep.epochRepeat(lit(2500L), col("id")).as("r"))
      .groupBy("r").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reps.keySet == Set(2L, 3L), s"2.5 epochs must repeat 2 or 3 times: $reps")
    // ~half the ids take the extra repeat
    assert(reps(3L) >= 800 && reps(3L) <= 1200, s"fractional share off: $reps")
    // integral weight: exactly floor, no fractional branch
    val flat = ids.select(TrainingPrep.epochRepeat(lit(2000L), col("id")).as("r"))
      .groupBy("r").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flat == Map(2L -> 2000L), s"integral weight must be exact: $flat")
  }

  test("packedBin: greedy concat-packing reference semantics + conservation") {
    val docs = Seq(
      ("a", 1L, 60L), ("a", 2L, 60L), ("a", 3L, 60L), ("a", 4L, 250L), ("a", 5L, 10L),
      ("b", 1L, 100L), ("b", 2L, 1L)
    ).toDF("shard", "doc_id", "n_tokens")
    val out = docs.withColumn("bin",
        TrainingPrep.packedBin(col("n_tokens"), col("shard"), col("doc_id"), 100))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byKey = out.map(t => (t._1, t._2) -> t._4).toMap
    // shard a cumBefore: 0, 60, 120, 180, 430 → bins 0, 0, 1, 1, 4
    assert(byKey(("a", 1L)) == 0 && byKey(("a", 2L)) == 0)
    assert(byKey(("a", 3L)) == 1 && byKey(("a", 4L)) == 1)
    assert(byKey(("a", 5L)) == 4) // big doc straddles: later bins skip
    // shard b: cumBefore 0, 100 → bins 0, 1 (exact boundary starts a new bin)
    assert(byKey(("b", 1L)) == 0 && byKey(("b", 2L)) == 1)
    // bins are non-decreasing in doc order within a shard
    out.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_._2).map(_._4)
      assert(ordered.zip(ordered.tail).forall { case (x, y) => x <= y })
    }
  }

  test("normalized: formatting variants collapse, distinct content does not") {
    val df = Seq(
      "Hello,  World!", "hello world", "HELLO -- world",
      "hello\nworld", "hello\t \tworld", // line wraps / tabs are whitespace too
      "different text").toDF("t")
      .select(TrainingPrep.normalized(col("t")).as("c"))
    val canon = df.as[String].collect()
    assert(canon.take(5).forall(_ == "hello world"), canon.mkString("|"))
    assert(canon(5) == "different text")
    assert(canon.distinct.length == 2)
  }

  test("chunkStarts: chunks cover the text with the declared overlap") {
    val text = ("x" * 149) + ("y" * 150) + ("z" * 75) // length 374
    val starts = Seq(text).toDF("t")
      .select(TrainingPrep.chunkStarts(col("t"), 150).as("s"))
      .as[Seq[Int]].collect()(0)
    assert(starts == Seq(0, 150, 300))
    val chunks = starts.map(s => text.substring(s, math.min(s + 200, text.length)))
    // non-overlapping prefixes + final chunk reconstruct the text exactly
    val rebuilt = chunks.init.map(_.take(150)).mkString + chunks.last
    assert(rebuilt == text)
    // consecutive chunks share size - stride = 50 chars
    chunks.sliding(2).foreach {
      case Seq(a, b) => if (a.length == 200) assert(a.takeRight(50) == b.take(50))
      case _ =>
    }
    // empty text yields zero chunks (matches the oracle's
    // range(0, ceil(0/stride)) = no rows)
    val empty = Seq("").toDF("t")
      .select(TrainingPrep.chunkStarts(col("t"), 150).as("s"))
      .as[Seq[Int]].collect()(0)
    assert(empty.isEmpty)
  }

  test("redactPii scrubs every email/phone/IP and leaves clean text alone") {
    import graft.ops.TextAnalysis
    val rows = Seq(
      "mail me at jo.doe+x@sub.example.org today",
      "call +1-555-0199 or +44-20-7946",
      "host 192.168.0.1 and 10.0.0.255 up",
      "no pii here at all",
      "combo a@b.io +1-555-0000 1.2.3.4").toDF("t")
      .select(col("t"), TextAnalysis.redactPii(col("t")).as("r"),
        TextAnalysis.patternCount(col("t"), TextAnalysis.EmailPattern).as("ne"),
        TextAnalysis.patternCount(col("t"), TextAnalysis.PhonePattern).as("np"),
        TextAnalysis.patternCount(col("t"), TextAnalysis.Ipv4Pattern).as("ni"))
      .collect()
    assert(rows(0).getString(1) == "mail me at <EMAIL> today")
    assert(rows(1).getString(1) == "call <PHONE> or +44-20-7946") // 3-digit middle required
    assert(rows(2).getString(1) == "host <IP> and <IP> up")
    assert(rows(3).getString(1) == "no pii here at all")
    assert(rows(4).getString(1) == "combo <EMAIL> <PHONE> <IP>")
    // after redaction nothing PII-shaped survives
    rows.foreach { r =>
      Seq(TextAnalysis.EmailPattern, TextAnalysis.PhonePattern,
        TextAnalysis.Ipv4Pattern).foreach { p =>
        assert(!java.util.regex.Pattern.compile(p).matcher(r.getString(1)).find(),
          s"residual $p in '${r.getString(1)}'")
      }
    }
    assert(rows.map(r => (r.getInt(2), r.getInt(3), r.getInt(4))).toSeq ==
      Seq((1, 0, 0), (0, 1, 0), (0, 0, 2), (0, 0, 0), (1, 1, 1)))
  }

  test("word entropy: uniform words hit log2(n), constant doc hits 0") {
    val df = Seq(
      (1L, "a b c d"),        // 4 distinct, uniform -> H = 2 bits, ttr 1
      (2L, "x x x x"),        // constant -> H = 0, ttr 0.25
      (3L, "a a b b")).toDF("doc_id", "text") // H = 1
    val got = df
      .select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n"),
        sum(col("c").cast("double") * log(col("c").cast("double"))).as("slc"),
        count(lit(1)).as("nd"))
      .select(col("doc_id"),
        round((log(col("n").cast("double")) - col("slc") / col("n")) /
          log(lit(2.0)), 6).as("h"),
        round(col("nd").cast("double") / col("n"), 6).as("ttr"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got(1L) == ((2.0, 1.0)))
    assert(got(2L) == ((0.0, 0.25)))
    assert(got(3L) == ((1.0, 0.5)))
  }

  test("q73 temperature mix: rates flatten the distribution, never upsample, hold the budget") {
    // the α<1 contract: sampling rate is ANTITONE in corpus share (the
    // biggest language gets the smallest rate), rates stay ≤ 1 (this is
    // a downsampling mix — q49 owns upsampling), and the realized
    // sample stays near the declared half-corpus budget
    val out = SparkEntry.queries("q73_temperature_mix")(
        spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_docs"),
        r.getAs[Double]("sample_rate"), r.getAs[Long]("n_sampled")))
    assert(out.nonEmpty)
    out.foreach { case (l, _, rate, _) =>
      assert(rate > 0 && rate <= 1.0, s"$l rate $rate out of range") }
    val byCount = out.sortBy(_._2)
    byCount.sliding(2).foreach {
      case Array((l1, c1, r1, _), (l2, c2, r2, _)) if c1 < c2 =>
        assert(r1 >= r2, s"rate must not grow with corpus share: " +
          s"$l1($c1)→$r1 vs $l2($c2)→$r2")
      case _ =>
    }
    val total = out.map(_._2).sum.toDouble
    val sampled = out.map(_._4).sum.toDouble
    assert(math.abs(sampled / total - 0.5) < 0.1,
      s"budget drift: sampled ${sampled / total} of corpus, wanted ~0.5")
  }
}
