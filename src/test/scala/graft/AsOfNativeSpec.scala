package graft

import org.apache.spark.sql.functions._
import graft.ops.AsOfJoin

/** The native sort-merge as-of operator (AsOfJoinPlan/Exec/Strategy)
  * against the composition route (q23's union-window), which is itself
  * oracle-checked against DuckDB's ASOF LEFT JOIN. */
class AsOfNativeSpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  /** Adversarial fixture: duplicate keys, null keys, null times on both
    * sides, keys present on only one side, equal timestamps, and enough
    * rows to cross partition boundaries (shuffle.partitions=4). */
  private lazy val (trades, quotes) = {
    import spark.implicits._
    val trades = spark.range(0, 400).select(
      col("id").as("trade_id"),
      when(col("id") % 37 === 0, lit(null).cast("long"))
        .otherwise(col("id") % 23).as("sym"),
      when(col("id") % 41 === 0, lit(null).cast("long"))
        .otherwise((col("id") * 7) % 1000).as("t"),
      (col("id") * 3 % 97).as("qty"))
    val quotes = spark.range(0, 300).select(
      when(col("id") % 31 === 0, lit(null).cast("long"))
        .otherwise(col("id") % 29).as("qsym"),
      when(col("id") % 43 === 0, lit(null).cast("long"))
        .otherwise((col("id") * 11) % 1000).as("qt"),
      (col("id") % 500).cast("double").as("px"))
      // contract: right unique per (key, time)
      .groupBy(col("qsym"), col("qt")).agg(max(col("px")).as("px"))
    (trades.cache(), quotes.cache())
  }

  test("native as-of matches the oracle-checked composition route") {
    val viaWindow = AsOfJoin.asOf(trades, quotes,
      "sym", "t", "qsym", "qt", Seq("px"))
    val viaNative = AsOfJoin.asOfNative(trades, quotes,
      "sym", "t", "qsym", "qt", Seq("px"))
    assert(viaNative.columns.toSeq == viaWindow.columns.toSeq)
    assert(canon(viaNative) == canon(viaWindow))
    // every left row survives exactly once (left-outer face)
    assert(viaNative.count() == trades.count())
  }

  test("physical plan is the custom exec with one shuffle+sort per side") {
    // uncached inputs so every Exchange in the string belongs to THIS plan
    val l = spark.range(0, 100).select(col("id").as("k"), (col("id") % 50).as("t"))
    val r = spark.range(0, 80).select(col("id").as("rk"), (col("id") % 40).as("rt"),
      (col("id") * 2).as("v"))
    val df = AsOfJoin.asOfNative(l, r, "k", "t", "rk", "rt", Seq("v"))
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("AsOfJoin"), s"custom exec missing:\n$phys")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(phys).length
    assert(shuffles == 2, s"expected 2 key shuffles, got $shuffles:\n$phys")
    // no union/window machinery — the whole point of the native route
    assert(!phys.contains("Window"), s"window leaked into native plan:\n$phys")
  }

  test("empty right side yields all-null matches, not failure") {
    val empty = quotes.filter(lit(false))
    val out = AsOfJoin.asOfNative(trades, empty,
      "sym", "t", "qsym", "qt", Seq("px"))
    assert(out.count() == trades.count())
    assert(out.filter(col("px").isNotNull).count() == 0)
  }

  test("inclusive match at equal timestamps, greatest-time-wins") {
    import spark.implicits._
    val l = Seq((1L, 10L, "a"), (1L, 15L, "b"), (2L, 10L, "c"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 10L, 1.0), (1L, 12L, 2.0), (2L, 11L, 9.0))
      .toDF("rk", "rt", "v")
    val out = AsOfJoin.asOfNative(l, r, "k", "t", "rk", "rt", Seq("v"))
      .select(col("tag"), col("v")).collect()
      .map(r => (r.getString(0), Option(r.get(1)))).toMap
    assert(out("a") == Some(1.0))  // rt=10 <= t=10: inclusive
    assert(out("b") == Some(2.0))  // greatest rt <= 15 is 12
    assert(out("c") == None)       // only future quote for k=2
  }

  test("string keys and timestamp times go through the generic orderings") {
    // exercises keyOrd/timeOrd over non-long types (UTF8String compare,
    // timestamp-as-micros) — the same parity bar as the long fixture
    val l = trades.select(concat(lit("u"), col("sym").cast("string")).as("k"),
      Tables.eventTime(col("t") * 1000000L).as("t"), col("trade_id"))
    val r = quotes.select(concat(lit("u"), col("qsym").cast("string")).as("rk"),
      Tables.eventTime(col("qt") * 1000000L).as("rt"), col("px"))
      .groupBy(col("rk"), col("rt")).agg(max(col("px")).as("px"))
    val viaWindow = AsOfJoin.asOf(l, r, "k", "t", "rk", "rt", Seq("px"))
    val viaNative = AsOfJoin.asOfNative(l, r, "k", "t", "rk", "rt", Seq("px"))
    assert(canon(viaNative) == canon(viaWindow))
  }

  test("forward direction: earliest right at-or-after, proven against a direct computation") {
    import spark.implicits._
    val direct = trades.crossJoin(quotes)
      .filter(col("sym") === col("qsym") && col("qt") >= col("t"))
      .groupBy(col("trade_id"))
      .agg(min_by(col("px"), struct(col("qt"))).as("px_direct"))
    val native = AsOfJoin.asOfNative(trades, quotes,
      "sym", "t", "qsym", "qt", Seq("px"), forward = true)
    val joinedUp = native.join(direct, Seq("trade_id"), "left")
    // every matched row agrees with the direct min-qt answer; every
    // unmatched row has no qualifying quote
    assert(joinedUp.filter(!(col("px") <=> col("px_direct"))).count() == 0)
    assert(native.count() == trades.count())
    // inclusive at equal timestamps, and matches exist in this fixture
    val l = Seq((1L, 10L, "a"), (2L, 99L, "b")).toDF("k", "t", "tag")
    val r = Seq((1L, 10L, 7.0), (1L, 8L, 3.0)).toDF("rk", "rt", "v")
    val out = AsOfJoin.asOfNative(l, r, "k", "t", "rk", "rt", Seq("v"),
        forward = true)
      .collect().map(x => (x.getString(2), Option(x.get(3)))).toMap
    assert(out("a") == Some(7.0)) // rt=10 >= t=10 inclusive; rt=8 skipped
    assert(out("b") == None)      // nothing at-or-after 99
  }

  test("self-join guard fires instead of silently mis-binding") {
    intercept[IllegalArgumentException] {
      AsOfJoin.asOfNative(trades, trades, "sym", "t", "sym", "t", Seq("qty"))
    }
  }

  test("side type mismatches fail loudly instead of comparing through the wrong accessor") {
    import spark.implicits._
    // the exec reads the right time through an accessor typed from the
    // LEFT column and orders keys by the LEFT key types — a date-vs-
    // timestamp time pair (days compared as micros) or an int-vs-long
    // key pair must be an ERROR, not silently wrong matches
    val l = Seq((1L, 100L, "x")).toDF("k", "t", "tag")
    val rTimeMismatch = Seq((1L, 1, 7.0)).toDF("rk", "rt", "v") // rt: int
    val exTime = intercept[IllegalArgumentException] {
      AsOfJoin.asOfNative(l, rTimeMismatch, "k", "t", "rk", "rt", Seq("v"))
    }
    assert(exTime.getMessage.contains("time type mismatch"), exTime.getMessage)
    val rKeyMismatch = Seq((1, 100L, 7.0)).toDF("rk", "rt", "v") // rk: int
    val exKey = intercept[IllegalArgumentException] {
      AsOfJoin.asOfNative(l, rKeyMismatch, "k", "t", "rk", "rt", Seq("v"))
    }
    assert(exKey.getMessage.contains("key type mismatch"), exKey.getMessage)
  }
}
