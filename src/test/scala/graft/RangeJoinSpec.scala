package graft

import org.apache.spark.sql.functions._
import graft.ops.RangeJoin

/** Binned range join vs the direct inequality join (the semantics
  * oracle), on bounds chosen to sit exactly on bin edges. */
class RangeJoinSpec extends SparkSpec {

  test("binned point-in-interval equals the nested-loop answer on edge-aligned bounds") {
    import spark.implicits._
    // points on and around multiples of the bin width (width 10):
    // bin-edge values, negative axis values, interval edges inclusive
    val points = Seq(-25L, -20L, -1L, 0L, 9L, 10L, 11L, 19L, 20L, 35L, 100L)
      .toDF("p")
    val intervals = Seq(
      (-30L, -20L, "a"), // negative axis, hi on a bin edge
      (-5L, 5L, "b"),    // straddles zero
      (0L, 0L, "c"),     // degenerate single-point interval on an edge
      (10L, 20L, "d"),   // both bounds on edges (inclusive both ends)
      (12L, 13L, "e"),   // strictly inside one bin
      (30L, 200L, "f"))  // spans many bins
      .toDF("lo", "hi", "tag")
    val binned = RangeJoin.pointInInterval(points, "p", intervals,
        "lo", "hi", binWidth = 10L)
      .select(col("p"), col("tag"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val direct = points.crossJoin(intervals)
      .filter(col("p") >= col("lo") && col("p") <= col("hi"))
      .select(col("p"), col("tag"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(binned == direct, s"binned=$binned direct=$direct")
    // sanity: the fixture exercises inclusivity at both ends
    assert(direct.contains((10L, "d")) && direct.contains((20L, "d")))
    assert(direct.contains((0L, "c")))
    assert(direct.contains((-20L, "a")))
  }

  test("bins stay exact beyond double's 2^53 integer range, both signs") {
    import spark.implicits._
    // axis values near ±2^62: double floor-division collapses values
    // within one ulp (1024 here) into coarse pseudo-bins; the integer
    // floor-division must keep every bin exact. Cross-check against the
    // nested-loop answer AND against bin identity on edge-straddling
    // values (p and p+1 on opposite sides of a bin edge must part ways).
    val base = (1L << 62) / 10 * 10 // bin-edge-aligned, near 2^62
    val points = Seq(base - 1, base, base + 9, base + 10, base + 519,
      base + 520, -base - 1, -base, -base + 9, -base + 10).toDF("p")
    val intervals = Seq(
      (base, base + 9, "hi_edge"),          // exactly one bin
      (base + 510, base + 529, "hi_ulp"),   // straddles a double ulp
      (-base, -base + 9, "lo_edge"),
      (-base - 10, -base - 1, "lo_neg"))
      .toDF("lo", "hi", "tag")
    val binned = RangeJoin.pointInInterval(points, "p", intervals,
        "lo", "hi", binWidth = 10L)
      .select(col("p"), col("tag"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val direct = points.crossJoin(intervals)
      .filter(col("p") >= col("lo") && col("p") <= col("hi"))
      .select(col("p"), col("tag"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(binned == direct, s"binned=$binned direct=$direct")
    assert(direct.contains((base, "hi_edge")) && direct.contains((base + 9, "hi_edge")))
    assert(direct.contains((-base, "lo_edge")) && direct.contains((-base - 1, "lo_neg")))
    // the one-bin interval must explode to exactly ONE bin row — with
    // double division near 2^62 its lo/hi bins differ (coarse rounding)
    // and the explosion width betrays it even when the output matches
    val oneBin = intervals.filter(col("tag") === "hi_edge")
      .withColumn("nbins",
        size(sequence(
          when(col("lo") % 10 < 0, call_function("div", col("lo"), lit(10L)) - 1)
            .otherwise(call_function("div", col("lo"), lit(10L))),
          when(col("hi") % 10 < 0, call_function("div", col("hi"), lit(10L)) - 1)
            .otherwise(call_function("div", col("hi"), lit(10L))))))
      .head().getAs[Int]("nbins")
    assert(oneBin == 1, s"edge-aligned one-bin interval exploded to $oneBin bins")
  }

  test("a pre-existing __bin column is rejected loudly, not silently clobbered") {
    import spark.implicits._
    val clean = Seq(1L).toDF("p")
    val tainted = clean.withColumn("__bin", lit(0L))
    val ivs = Seq((0L, 5L)).toDF("lo", "hi")
    val ex1 = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(tainted, "p", ivs, "lo", "hi", 10L)
    }
    assert(ex1.getMessage.contains("__bin"), ex1.getMessage)
    val ex2 = intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(ivs, "lo", "hi",
        ivs.withColumn("__bin", lit(0L)).toDF("lo2", "hi2", "__bin"),
        "lo2", "hi2", 10L)
    }
    assert(ex2.getMessage.contains("__bin"), ex2.getMessage)
  }

  test("interval overlap: first-shared-bin dedup equals the nested-loop answer exactly once") {
    import spark.implicits._
    val a = Seq((-15L, 5L, "a1"), (0L, 100L, "a2"), (10L, 10L, "a3"),
      (20L, 29L, "a4")).toDF("alo", "ahi", "atag")
    val b = Seq((-20L, -15L, "b1"), (5L, 12L, "b2"), (10L, 95L, "b3"),
      (30L, 31L, "b4")).toDF("blo", "bhi", "btag")
    val binned = RangeJoin.intervalOverlap(a, "alo", "ahi", b, "blo", "bhi", 10L)
      .select(col("atag"), col("btag"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val direct = a.crossJoin(b)
      .filter(col("alo") <= col("bhi") && col("blo") <= col("ahi"))
      .select(col("atag"), col("btag"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // exactly once: compare as multisets, not sets
    assert(binned.sorted == direct.sorted, s"binned=$binned direct=$direct")
    // the fixture exercises: touch-at-endpoint (a1/b1), long×long
    // multi-bin overlap (a2/b3 share 9 bins — dedup matters), and
    // degenerate single-point intervals (a3)
    assert(direct.sorted.contains(("a1", "b1")) &&
      direct.count(_ == ("a2", "b3")) == 1)
  }

  test("each matching pair is emitted exactly once (points own one bin)") {
    import spark.implicits._
    val points = spark.range(0, 1000).select((col("id") * 3 % 500).as("p"))
    val intervals = spark.range(0, 50)
      .select((col("id") * 10).as("lo"), (col("id") * 10 + 95).as("hi"))
    val binned = RangeJoin.pointInInterval(points, "p", intervals,
      "lo", "hi", binWidth = 17L) // width deliberately off-phase
    val direct = points.crossJoin(intervals)
      .filter(col("p") >= col("lo") && col("p") <= col("hi"))
    assert(binned.count() == direct.count())
  }
}
