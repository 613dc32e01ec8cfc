package graft

import java.sql.Timestamp

import graft.ops.AsOfJoin

/** Known-answer tests for the union+window as-of join composition. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOf picks the latest right row at-or-before each left time, per key") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:00"), "t1"),
      (1L, ts("2024-01-01 10:05:00"), "t2"),
      (2L, ts("2024-01-01 10:00:30"), "t3"),
      (3L, ts("2024-01-01 09:00:00"), "t4") // before any quote
    ).toDF("sym", "trade_time", "trade_id")
    val quotes = Seq(
      (1L, ts("2024-01-01 09:59:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0), // equal ts → inclusive match
      (1L, ts("2024-01-01 10:06:00"), 999.0), // after t2, must not match
      (2L, ts("2024-01-01 10:00:00"), 55.0)
    ).toDF("qsym", "quote_time", "price")

    val out = AsOfJoin.asOf(trades, quotes,
        "sym", "trade_time", "qsym", "quote_time", Seq("price"))
      .select("trade_id", "price").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
      .toMap
    assert(out == Map("t1" -> 100.0, "t2" -> 101.0, "t3" -> 55.0, "t4" -> null))
  }

  test("asOf: null join keys never match (SQL semantics)") {
    val left = Seq(
      (Option.empty[Long], ts("2024-01-01 10:00:00"), "null-key"),
      (Some(1L), ts("2024-01-01 10:00:00"), "real-key")
    ).toDF("k", "t", "v")
    val right = Seq(
      (Option.empty[Long], ts("2024-01-01 09:00:00"), 5.0),
      (Some(1L), ts("2024-01-01 09:00:00"), 7.0)
    ).toDF("rk", "rt", "price")
    val out = AsOfJoin.asOf(left, right, "k", "t", "rk", "rt", Seq("price"))
      .select("v", "price").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
      .toMap
    assert(out == Map("null-key" -> null, "real-key" -> 7.0))
  }

  test("asOf keeps every left row (left-join semantics)") {
    val left = Seq((1L, ts("2024-01-01 00:00:00"), "a")).toDF("k", "t", "v")
    val right = Seq((2L, ts("2024-01-01 00:00:00"), 1.0)).toDF("rk", "rt", "x")
    val out = AsOfJoin.asOf(left, right, "k", "t", "rk", "rt", Seq("x"))
    assert(out.count() == 1)
    assert(out.select("x").head.isNullAt(0))
  }

  test("approx_count_distinct within 5% of exact on lineitem parts") {
    val df = SparkEntry.queries("d06_approx_distinct")(spark, "/root/testdata/sf0.001")
    df.collect().foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"approx $approx vs exact $exact")
    }
  }
}
