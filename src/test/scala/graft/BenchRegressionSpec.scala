package graft

import scala.io.Source

import org.apache.spark.sql.functions._

/** Per-query wall-time regression gate. Round 2 shipped a systemic
  * ~2× bench regression (pinned caches starving later queries) that no
  * test caught because correctness stayed green — this spec makes
  * `sbt test` fail on that class of leak before the driver ever runs.
  *
  * Method: the checked-in baseline (`bench_baseline_sf001.txt`) records
  * each query's warm wall time at sf0.01 AS MEASURED BY THIS SPEC (the
  * shared local[4] test session — recording in any other environment,
  * e.g. Bench's local[8], would skew every comparison); every query
  * re-runs here (same warmup and per-query cache release as Bench) and
  * fails only past `loadFactor × max(3 × baseline, baseline + 2 s)` —
  * far above machine-load variance and JIT jitter on sub-second
  * queries, far below the 5–18× signatures of a real leak.
  *
  * De-flaking (the gate must not cry wolf under suite-level box
  * contention, or it gets ignored):
  *  - CALIBRATION: a fixed reference workload is timed in the same run
  *    and compared to its own baseline row; the ratio (≥ 1) scales
  *    every allowance, so a box running 2× slow — co-scheduled suites,
  *    CI neighbors — widens the gate instead of flagging phantom
  *    regressions. A real leak inflates queries but not the fresh
  *    calibration workload, so the gate still fires.
  *  - BREACH RETRY: a query over its allowance re-measures once and the
  *    MIN counts (Bench's own min-of-two rule) — a transient stall
  *    passes on retry, a genuine regression reproduces.
  * Both behaviors are meta-tested below against synthetic clocks.
  *
  * New queries without a baseline row pass with an info message until
  * the baseline is regenerated: run with `GRAFT_WRITE_BASELINE=1`,
  * which rewrites the resource from this very measurement loop instead
  * of asserting. The multiplier stays tunable via
  * `GRAFT_BENCH_GATE_FACTOR`; the whole test CANCELS where the fixture
  * dir is absent.
  */
class BenchRegressionSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"
  private val baselinePath = "src/test/resources/bench_baseline_sf001.txt"
  private val CalibrationKey = "__calibration"

  private lazy val baseline: Map[String, Double] = {
    val src = Source.fromInputStream(
      getClass.getResourceAsStream("/bench_baseline_sf001.txt"), "UTF-8")
    try src.getLines()
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l => val Array(k, v) = l.split("\\s+"); k -> v.toDouble }
      .toMap
    finally src.close()
  }

  private val gateFactor: Double =
    sys.env.get("GRAFT_BENCH_GATE_FACTOR").map(_.toDouble).getOrElse(3.0)

  /** Fixed reference workload: scan + hash agg + shuffle + sort over a
    * bounded slice — the engine paths every query shares, cheap enough
    * to run three times. Its min is the load probe: immune to a leak in
    * QUERY state (it touches none) but fully exposed to box slowness. */
  private def calibrate(): Double =
    (0 until 3).map { _ =>
      val t0 = System.nanoTime()
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .limit(20000)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("q"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
        .collect()
      (System.nanoTime() - t0) / 1e9
    }.min

  /** The gate decision, parameterized on the clock AND the multiplier
    * so the meta-tests below can drive it with synthetic timings at a
    * pinned factor (the real run passes the env-tunable one — a CI box
    * exporting GRAFT_BENCH_GATE_FACTOR must not flip the meta-test's
    * expected verdicts): measure once; only a breach pays for a second
    * measurement, and the min counts. A breach here is PROVISIONAL —
    * [[adjudicate]] gets the final word. */
  private[graft] def gateOne(name: String, b: Double, loadFactor: Double,
                             measure: () => Double,
                             factor: Double = gateFactor): (Double, Option[String]) = {
    val allowed = loadFactor * math.max(factor * b, b + 2.0)
    val t1 = measure()
    if (t1 <= allowed) (t1, None)
    else {
      val t = math.min(t1, measure())
      if (t <= allowed) (t, None)
      else (t, Some(
        f"$name: $t%.2fs vs baseline $b%.2fs (allowed $allowed%.2fs, load ×$loadFactor%.2f)"))
    }
  }

  /** Solo-rerun adjudication — the same final word scripts/
    * bench_drift.py gives close-run drift. The start-of-run load
    * factor goes STALE when contention arrives mid-suite (round 15:
    * q66 measured 8.97 s in-suite under a ×1.00 factor, yet ran 2.16 s
    * in the close bench minutes later), so a provisional breach
    * re-times the offender ALONE at the end of the run against a
    * FRESH calibration. Contention that has passed → the solo time
    * lands in the allowance and the breach is forgiven on the record;
    * a genuine regression reproduces solo and still fails. */
  private[graft] def adjudicate(name: String, b: Double, suiteTime: Double,
                                freshLoad: Double, measure: () => Double,
                                factor: Double = gateFactor): (Double, Option[String]) = {
    val allowed = freshLoad * math.max(factor * b, b + 2.0)
    val t = measure()
    if (t <= allowed) (t, None)
    else (t, Some(
      f"$name: $suiteTime%.2fs in-suite, $t%.2fs solo vs baseline $b%.2fs " +
        f"(allowed $allowed%.2fs, fresh load ×$freshLoad%.2f) — reproduces alone"))
  }

  test("no query grossly regresses vs the checked-in sf0.01 baseline") {
    assume(new java.io.File(sfDir).isDirectory,
      s"fixture dir $sfDir absent — wall-time gate only runs where the " +
        "driver-generated testdata exists")
    Bench.warmup(spark, sfDir)
    spark.catalog.clearCache()
    val calib = calibrate()
    val loadFactor = baseline.get(CalibrationKey) match {
      case Some(cb) if cb > 0 => math.max(1.0, calib / cb)
      case _ => 1.0
    }
    info(f"calibration $calib%.3fs vs baseline ${
      baseline.getOrElse(CalibrationKey, 0.0)}%.3fs — load factor $loadFactor%.2f")
    val breaches = scala.collection.mutable.ArrayBuffer.empty[(String, Double, Double)]
    val measured = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    def once(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      t
    }
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      baseline.get(name) match {
        case Some(b) =>
          val (t, fail) = gateOne(name, b, loadFactor, () => once(fn))
          measured += name -> t
          fail.foreach { msg => info(s"provisional breach: $msg"); breaches += ((name, b, t)) }
        case None =>
          measured += name -> once(fn)
          info(s"$name has no baseline row — rerun with GRAFT_WRITE_BASELINE=1")
      }
    }
    // end-of-suite solo adjudication: fresh calibration, then each
    // provisional breach gets one more solo run — the verdict that counts
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    if (breaches.nonEmpty) {
      val calib2 = calibrate()
      val freshLoad = baseline.get(CalibrationKey) match {
        case Some(cb) if cb > 0 => math.max(1.0, calib2 / cb)
        case _ => 1.0
      }
      info(f"adjudication calibration $calib2%.3fs — fresh load factor $freshLoad%.2f")
      breaches.foreach { case (name, b, suiteT) =>
        val fn = SparkEntry.queries(name)
        val (soloT, verdict) = adjudicate(name, b, suiteT, freshLoad, () => once(fn))
        verdict match {
          case Some(msg) => failures += msg
          case None => info(
            f"$name adjudicated as contention: $suiteT%.2fs in-suite, $soloT%.2fs solo — forgiven")
        }
      }
    }
    if (sys.env.contains("GRAFT_WRITE_BASELINE")) {
      val header =
        """|# Per-query wall-time baseline at sf0.01, recorded by
           |# BenchRegressionSpec itself (shared local[4] test session) so the
           |# gate compares like with like. __calibration is the reference
           |# workload's time on the recording box; at check time the gate
           |# scales every allowance by max(1, calibration_now / this) so box
           |# contention widens the gate instead of flagging phantoms.
           |# Regenerate:
           |#   GRAFT_WRITE_BASELINE=1 sbt "testOnly graft.BenchRegressionSpec"
           |# Gate: fail past loadFactor * max(3 x baseline, baseline + 2s),
           |# min-of-2 on breach -- gross regressions (the round-2 cache leak
           |# was 5-18x), not machine variance.
           |""".stripMargin
      val body = ((CalibrationKey -> calib) +: measured.sortBy(_._1))
        .map { case (k, v) =>
          String.format(java.util.Locale.ROOT, "%s %.3f%n", k, Double.box(v))
        }.mkString
      java.nio.file.Files.writeString(java.nio.file.Paths.get(baselinePath),
        header + body)
      info(s"baseline rewritten at $baselinePath — no assertions this run")
    } else {
      assert(failures.isEmpty,
        "per-query regressions:\n" + failures.mkString("\n"))
    }
  }

  test("meta: the gate flags a reproducing 3.5x slowdown but forgives a transient stall") {
    // a genuine regression reproduces on the retry — must be flagged
    val (_, caught) = gateOne("slow_q", b = 1.0, loadFactor = 1.0,
      measure = () => 3.6, factor = 3.0)
    assert(caught.isDefined, "a reproducing 3.5x+ slowdown must fail the gate")
    // a transient stall vanishes on retry — min-of-2 must forgive it
    val seq = Iterator(9.0, 0.9)
    val (t, forgiven) = gateOne("stalled_q", b = 1.0, loadFactor = 1.0,
      measure = () => seq.next(), factor = 3.0)
    assert(forgiven.isEmpty && t == 0.9,
      "a one-off stall must pass via the min-of-2 retry")
    // box contention scales the allowance: 2.5x slower box, query 2.8x
    // over baseline (under 2.5 x 3 = 7.5x allowance) — not a regression
    val (_, underLoad) = gateOne("loaded_q", b = 1.0, loadFactor = 2.5,
      measure = () => 2.8, factor = 3.0)
    assert(underLoad.isEmpty,
      "calibrated load must widen the gate for contended runs")
    // ...but a real leak on a loaded box still fires
    val (_, leakOnLoad) = gateOne("leaky_q", b = 1.0, loadFactor = 2.5,
      measure = () => 13.0, factor = 3.0)
    assert(leakOnLoad.isDefined, "a 13x blowup must fail even under load")
  }

  test("meta: solo adjudication forgives in-suite contention, fails a reproducing regression") {
    // round-15 shape: in-suite 8.97s under a stale ×1.00 factor, but
    // the solo rerun lands at 2.2s — contention, forgiven
    val (t, forgiven) = adjudicate("contended_q", b = 2.49, suiteTime = 8.97,
      freshLoad = 1.0, measure = () => 2.2, factor = 3.0)
    assert(forgiven.isEmpty && t == 2.2,
      "a breach that vanishes solo must be adjudicated as contention")
    // a genuine regression reproduces alone — the final verdict fails
    val (_, caught) = adjudicate("regressed_q", b = 1.0, suiteTime = 9.0,
      freshLoad = 1.0, measure = () => 8.5, factor = 3.0)
    assert(caught.isDefined, "a breach that reproduces solo must fail")
    // the fresh calibration still widens the solo allowance under
    // persistent box load (2.5x slow box, solo 7.0 under 7.5 allowance)
    val (_, loadedSolo) = adjudicate("loaded_solo_q", b = 1.0, suiteTime = 9.0,
      freshLoad = 2.5, measure = () => 7.0, factor = 3.0)
    assert(loadedSolo.isEmpty,
      "fresh calibration must widen the solo allowance under persistent load")
  }
}
