package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{KllQuantiles, TopCells, ZOrder2}
import graft.ops.Multimodal

/** Property-based checks (scalacheck) over the PURE kernels the custom
  * Catalyst expressions delegate to — driver-side, no Spark session:
  * randomized inputs hunt the edge cases example tests encode by hand
  * (ties, NaN ordering, empty/degenerate sizes, arbitrary merge
  * splits). Each property runs 200+ generated cases per `sbt test`. */
class PropertySpec extends AnyFunSuite {

  private def checkProp(p: Prop, cases: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases), p)
    assert(res.passed, res.status.toString)
  }

  private val genVals: Gen[List[Double]] =
    Gen.nonEmptyListOf(Gen.chooseNum(-1000000.0, 1000000.0))

  test("KLL exact regime: lower quantile equals the sorted integer-rank answer") {
    checkProp(Prop.forAll(genVals, Gen.choose(1, 10000)) { (vs, qbp) =>
      val s = new KllQuantiles.Summary(math.max(vs.size, 2))
      vs.foreach(s.update)
      val sorted = vs.sorted
      val target = ((vs.size.toLong * qbp + 9999L) / 10000L).toInt
      s.quantile(qbp) == sorted(target - 1)
    })
  }

  test("KLL exact regime: merging any split equals the single-pass summary") {
    checkProp(Prop.forAll(genVals, Gen.choose(0, 1000), Gen.choose(1, 10000)) {
      (vs, cutRaw, qbp) =>
        val cut = cutRaw % (vs.size + 1)
        val (l, r) = vs.splitAt(cut)
        val cap = math.max(vs.size, 2)
        val a = new KllQuantiles.Summary(cap)
        l.foreach(a.update)
        val b = new KllQuantiles.Summary(cap)
        r.foreach(b.update)
        a.mergeIn(b)
        val whole = new KllQuantiles.Summary(cap)
        vs.foreach(whole.update)
        a.quantile(qbp) == whole.quantile(qbp)
    })
  }

  test("KLL approximate regime: every reported quantile is a genuine input value") {
    // the compactor discards values but never invents them — the
    // safety property that makes a sketch answer explainable
    checkProp(Prop.forAll(genVals, Gen.choose(1, 10000)) { (vs, qbp) =>
      val s = new KllQuantiles.Summary(4) // far below |vs|: compaction runs
      vs.foreach(s.update)
      vs.toSet.contains(s.quantile(qbp))
    })
  }

  test("word n-grams: fused expression kernel equals naive sliding-window distinct") {
    val token = Gen.oneOf("a", "b", "c", "ab", "xy", "q1")
    checkProp(Prop.forAll(Gen.listOf(token), Gen.choose(1, 5)) { (toks, n) =>
      val arr = new GenericArrayData(
        toks.map(t => UTF8String.fromString(t): Any).toArray)
      val got = graft.functions.WordNGrams.distinctGrams(arr, n)
        .array.map(_.toString).toSeq
      val want =
        if (toks.size < n) Seq.empty
        else toks.sliding(n).map(_.mkString(" ")).toSeq.distinct
      got == want
    })
  }

  test("z-order: per-dimension order is preserved when the other coordinate is fixed") {
    val coord = Gen.choose(0L, 0x7fffffffL)
    checkProp(Prop.forAll(coord, coord, coord) { (a1, a2, b) =>
      (a1 == a2) || {
        val (lo, hi) = if (a1 < a2) (a1, a2) else (a2, a1)
        ZOrder2.interleave(lo, b) < ZOrder2.interleave(hi, b) &&
          ZOrder2.interleave(b, lo) < ZOrder2.interleave(b, hi)
      }
    })
  }

  test("z-order: interleave is injective on 31-bit pairs") {
    val coord = Gen.choose(0L, 0x7fffffffL)
    checkProp(Prop.forAll(coord, coord, coord, coord) { (a1, b1, a2, b2) =>
      ((a1, b1) == (a2, b2)) ==
        (ZOrder2.interleave(a1, b1) == ZOrder2.interleave(a2, b2))
    })
  }

  test("TopCells: any offer order and any merge split yield sort-take semantics") {
    val entry = for {
      s <- Gen.oneOf(Gen.chooseNum(-100.0, 100.0), Gen.const(Double.NaN))
      c <- Gen.choose(0L, 50L)
    } yield (s, c)
    checkProp(Prop.forAll(Gen.listOf(entry), Gen.choose(1, 8),
      Gen.choose(0, 1000)) { (es, n, cutRaw) =>
      val cut = cutRaw % (es.size + 1)
      val (l, r) = es.splitAt(cut)
      val a = new TopCells.Buf(n)
      l.foreach { case (s, c) => a.offer(s, c) }
      val b = new TopCells.Buf(n)
      r.foreach { case (s, c) => b.offer(s, c) }
      a.mergeIn(b)
      // reference: (score desc, cell asc) with NaN worst — Spark's
      // sort_array(struct(-score, cell)) rank
      val want = es.sortWith { case ((s1, c1), (s2, c2)) =>
        val n1 = java.lang.Double.isNaN(s1)
        val n2 = java.lang.Double.isNaN(s2)
        if (n1 != n2) n2
        else if (!n1 && s1 != s2) s1 > s2
        else c1 < c2
      }.take(n).map(_._2)
      a.result.toSeq == want
    })
  }

  test("byteAHash: 64 bits of '0'/'1', deterministic, equal payloads equal hashes") {
    val bytesGen = Gen.listOf(Gen.choose(-128, 127).map(_.toByte))
    checkProp(Prop.forAll(bytesGen) { bs =>
      val p = bs.toArray
      val h1 = Multimodal.byteAHash(p)
      val h2 = Multimodal.byteAHash(p.clone())
      h1.length == 64 && h1.forall(ch => ch == '0' || ch == '1') && h1 == h2
    })
  }

  test("CMS row inner products never underestimate exact self-join size (q97's invariant)") {
    // q97's estimator arithmetic, replicated driver-side: for ANY key
    // multiset, each sketch row's inner product Σ f_bucket² is the
    // exact F2 plus non-negative collision cross-terms, so the min
    // across rows is a one-sided (over-)estimate. Width is shrunk to 64
    // here to FORCE collisions — the property must hold because of the
    // algebra, not because the fixture happens to be collision-free.
    val seeds = Seq((1103515245L, 12345L), (69069L, 362437L),
      (1664525L, 1013904223L))
    val p = 2147483647L
    val w = 64L
    val keysGen = Gen.nonEmptyListOf(Gen.chooseNum(0L, 100000L))
    checkProp(Prop.forAll(keysGen) { keys =>
      val exact = keys.groupBy(identity).values
        .map(g => g.size.toLong * g.size).sum
      val est = seeds.map { case (a, b) =>
        keys.groupBy(k => ((a * k + b) % p) % w).values
          .map(g => g.size.toLong * g.size).sum
      }.min
      est >= exact
    })
  }

  test("integer z-test: (n·v−s)² > 4(n·q−s²) agrees with the floating |z| > 2 test") {
    // q122/st37's division-free anomaly predicate, proven against the
    // definition it compresses: with population variance over the
    // window, |z| > 2  <=>  (v−μ)² > 4σ²  <=>  (n·v−s)² > 4(n·q−s²).
    // Windows are random cent values (bounded like the fixtures'), and
    // the comparison is run where σ > 0 AND the two sides are not
    // borderline-equal under float rounding — the integer form is the
    // EXACT one, so near-ties are precisely where the engines must use
    // it rather than floats; zero-variance windows assert the exact
    // rule directly (any deviation flags, equality never).
    val winGen = Gen.nonEmptyListOf(Gen.chooseNum(0L, 40000L))
    val vGen = Gen.chooseNum(0L, 40000L)
    checkProp(Prop.forAll(winGen, vGen) { (win, v) =>
      val n = win.size.toLong
      val s = win.sum
      val q = win.iterator.map(x => x * x).sum
      val intFlag = (n * v - s) * (n * v - s) > 4L * (n * q - s * s)
      val mu = s.toDouble / n
      val variance = (q.toDouble / n) - mu * mu
      if (n * q == s * s) {
        // zero variance: flags iff v deviates at all
        intFlag == (n * v != s)
      } else {
        val z2 = (v - mu) * (v - mu) / variance
        // only compare away from the float-rounding boundary; the
        // integer predicate IS the ground truth at the boundary
        math.abs(z2 - 4.0) < 1e-9 || intFlag == (z2 > 4.0)
      }
    })
  }

  test("streak fold: any batch split of in-order days equals the direct gaps-and-islands answer") {
    import graft.streaming.EventStream.{StreakState, foldStreakDays}
    val genDays = Gen.nonEmptyListOf(Gen.choose(0L, 60L))
    val genCuts = Gen.listOf(Gen.choose(0, 60))
    checkProp(Prop.forAll(genDays, genCuts) { (rawDays, cuts) =>
      // normalize INSIDE the property: scalacheck shrinking does not
      // preserve generator invariants
      val days = rawDays.distinct.sorted
      // direct answer: islands of consecutive days
      val runs = days.foldLeft(List.empty[Long]) {
        case (h :: t, d) if days.contains(d - 1) => (h + 1) :: t
        case (acc, _) => 1L :: acc
      }
      // streamed answer: split the day sequence at arbitrary points and
      // fold batch by batch; each later batch RE-INCLUDES the previous
      // batch's last day (a day split across tile files — the one
      // legitimate duplicate under the in-order contract; full-batch
      // replays roll the state back in the engine, so they never reach
      // the fold twice)
      val cutSet = cuts.toSet
      val batches = days.zipWithIndex
        .foldLeft(List(List.empty[Long])) { case (b :: rest, (d, i)) =>
          if (cutSet.contains(i)) List(d) :: b :: rest else (b :+ d) :: rest }
        .reverse.filter(_.nonEmpty)
      val withBoundaryDups = batches match {
        case Nil => Nil
        case h :: t => h :: t.zip(batches).map { case (b, prev) => prev.last :: b }
      }
      val st = withBoundaryDups.foldLeft(
          StreakState(0L, Long.MinValue, 0L, 0L, 0L, 0L)) {
        (s, b) => foldStreakDays(s, b)
      }
      st.bestLen == runs.max && st.nStreaks == runs.length.toLong &&
        st.nDays == days.length.toLong && st.curLen == runs.head
    })
  }

  test("CEP fold: any batch split of an ordered stream emits exactly the k-way-join answer, for any pattern") {
    import graft.streaming.EventStream.{CepState, Event, cepFold}
    val types = Gen.oneOf("view", "click", "purchase", "signup", "other")
    // events on a small integer timeline so windows genuinely cut
    val genEvents = Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 40L), types))
    val genCuts = Gen.listOf(Gen.choose(0, 60))
    // pattern as data: the 3-stage q147 instance, the 4-stage q156
    // instance, and a REPEATED-type pattern (an event type at two
    // stages must extend only chains that existed before it)
    val genPattern = Gen.oneOf(
      Seq(("view", 0L), ("click", 5L), ("purchase", 7L)),
      Seq(("signup", 0L), ("view", 9L), ("click", 5L), ("purchase", 7L)),
      Seq(("view", 0L), ("view", 6L), ("purchase", 7L)))
    checkProp(Prop.forAll(genEvents, genCuts, genPattern) { (raw, cuts, pattern) =>
      // normalize INSIDE the property (shrinking breaks invariants):
      // unique ids from the index, strict (ts, id) arrival order
      val evs = raw.zipWithIndex.map { case ((t, ty), i) =>
        Event(i.toLong, t, 1L, ty, 0.0, "")
      }.sortBy(e => (e.ts, e.event_id))
      // direct answer: the k-way relational join on this fixture
      def extend(chains: Seq[(Long, List[Long])],
                 stage: Int): Seq[(Long, List[Long])] =
        if (stage == pattern.length) chains
        else extend(for {
          (t0, ids) <- chains
          e <- evs if e.event_type == pattern(stage)._1 &&
            e.ts > t0 && e.ts <= t0 + pattern(stage)._2
        } yield (e.ts, ids :+ e.event_id), stage + 1)
      val direct = extend(
        evs.filter(_.event_type == pattern.head._1)
          .map(e => (e.ts, List(e.event_id))), 1).map(_._2).toSet
      // streamed answer: fold through arbitrary prefix cuts
      val cutSet = cuts.toSet
      val batches = evs.zipWithIndex
        .foldLeft(List(List.empty[Event])) { case (b :: rest, (e, i)) =>
          if (cutSet.contains(i)) List(e) :: b :: rest else (b :+ e) :: rest }
        .reverse.filter(_.nonEmpty)
      val (_, emitted) = batches.foldLeft(
          (CepState(Nil, Long.MinValue, Long.MinValue),
            Set.empty[List[Long]])) { case ((st, acc), b) =>
        val (st2, out) = cepFold(1L, st, b, pattern)
        (st2, acc ++ out.map(_.event_ids))
      }
      emitted == direct
    })
  }

  test("gap-session fold: any batch split plus a final flush equals direct gaps-and-islands") {
    import graft.streaming.EventStream.{Event, GapSession, gapSessionFold}
    val gap = 5L
    // events on a small timeline so gaps genuinely occur; ties allowed
    // (equal ts with ascending ids merges into the same session)
    val genTs = Gen.nonEmptyListOf(Gen.choose(0L, 60L))
    val genCuts = Gen.listOf(Gen.choose(0, 80))
    checkProp(Prop.forAll(genTs, genCuts) { (raw, cuts) =>
      // normalize INSIDE the property (shrinking breaks invariants)
      val evs = raw.sorted.zipWithIndex.map { case (t, i) =>
        Event(i.toLong, t, 1L, "view", 0.0, "")
      }
      // independent truth: direct gaps-and-islands scan
      val direct = evs.tail.foldLeft(
          Vector((evs.head.ts, 1L, evs.head.ts))) { case (acc, e) =>
        val (a, n, l) = acc.last
        if (e.ts - l > gap) acc :+ ((e.ts, 1L, e.ts))
        else acc.init :+ ((a, n + 1L, e.ts))
      }.map { case (a, n, l) => GapSession(1L, a, n, l) }
      // streamed answer: fold through arbitrary prefix cuts, then flush
      // the final open session (what the engine's timer does when the
      // watermark passes its deadline)
      val cutSet = cuts.toSet
      val batches = evs.zipWithIndex
        .foldLeft(List(List.empty[Event])) { case (b :: rest, (e, i)) =>
          if (cutSet.contains(i)) List(e) :: b :: rest else (b :+ e) :: rest }
        .reverse.filter(_.nonEmpty)
      val (open, closed) = batches.foldLeft(
          (Option.empty[(Long, Long, Long)], Vector.empty[GapSession])) {
        case ((st, acc), b) =>
          val (st2, out) = gapSessionFold(1L, st, b, gap)
          (st2, acc ++ out)
      }
      val flushed = closed ++ open.map { case (a, n, l) => GapSession(1L, a, n, l) }
      flushed == direct
    })
  }

  test("coverage fold: any batch split equals the order-free overlap-closure answer") {
    import graft.streaming.IntervalCoverage.{CovState, Iv, covFold}
    val genIvs = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0L, 30L), Gen.choose(0L, 10L)))
    val genCuts = Gen.listOf(Gen.choose(0, 40))
    checkProp(Prop.forAll(genIvs, genCuts) { (raw, cuts) =>
      // normalize inside the property (shrinking breaks invariants)
      val ivs = raw.map { case (lo, len) => Iv(1L, lo, lo + len) }
        .distinct.sortBy(iv => (iv.lo, iv.hi))
      // independent truth: transitive closure of the pairwise OVERLAP
      // relation (order-free, no sweep) — q141's islands are maximal
      // overlapping groups, NOT maximal consecutive-day runs (two
      // day-adjacent but disjoint intervals are separate islands)
      val parent = Array.tabulate(ivs.size)(identity)
      def find(i: Int): Int =
        if (parent(i) == i) i else { parent(i) = find(parent(i)); parent(i) }
      for (i <- ivs.indices; j <- ivs.indices if i < j)
        if (ivs(i).lo <= ivs(j).hi && ivs(j).lo <= ivs(i).hi)
          parent(find(i)) = find(j)
      val islands = ivs.indices.groupBy(find).values.toSeq
        .map(ix => ix.map(ivs(_).hi).max - ix.map(ivs(_).lo).min + 1)
      val (covered, runs) = (islands.sum, islands)
      val cutSet = cuts.toSet
      val batches = ivs.zipWithIndex
        .foldLeft(List(List.empty[Iv])) { case (b :: rest, (iv, i)) =>
          if (cutSet.contains(i)) List(iv) :: b :: rest else (b :+ iv) :: rest }
        .reverse.filter(_.nonEmpty) :+ List(Iv(1L, Long.MaxValue, Long.MaxValue))
      val (stEnd, out) = batches.foldLeft(
          (Option.empty[CovState], Seq.empty[graft.streaming.IntervalCoverage.CovRow])) {
        case ((st, acc), b) =>
          val (st2, o) = covFold(1L, st, b)
          (st2, acc ++ o)
      }
      stEnd.isEmpty && out.size == 1 &&
        out.head.covered_days == covered &&
        out.head.n_islands == runs.length.toLong &&
        out.head.max_span == runs.max
    })
  }

  test("watermarked coverage fold: bounded-disorder arrival through any batch split equals the ordered sweep") {
    import graft.streaming.IntervalCoverage.{CovStateW, Iv, covFold, covFoldW, emptyW}
    val slack = 4L
    // (lo, length, jitter < slack): arrival order = (lo + jitter) sort,
    // a genuine bounded shuffle of the lo order
    val genIvs = Gen.nonEmptyListOf(Gen.zip(
      Gen.choose(0L, 30L), Gen.choose(0L, 10L), Gen.choose(0L, slack - 1)))
    val genCuts = Gen.listOf(Gen.choose(0, 40))
    checkProp(Prop.forAll(genIvs, genCuts) { (raw, cuts) =>
      // normalize inside the property (shrinking breaks invariants)
      val withArr = raw.map { case (lo, len, j) => (Iv(1L, lo, lo + len), lo + j) }
        .distinctBy(_._1)
      // ordered truth: the certified strict-order fold over the same set
      val ordered = withArr.map(_._1).sortBy(iv => (iv.lo, iv.hi)) :+
        Iv(1L, Long.MaxValue, Long.MaxValue)
      val (_, truth) = covFold(1L, None, ordered)
      // disordered arrival: sort by the jittered key, split at random cuts,
      // sentinel batch last
      val arrival = withArr.sortBy { case (iv, a) => (a, iv.lo, iv.hi) }.map(_._1)
      val cutSet = cuts.toSet
      val batches = arrival.zipWithIndex
        .foldLeft(List(List.empty[Iv])) { case (b :: rest, (iv, i)) =>
          if (cutSet.contains(i)) List(iv) :: b :: rest else (b :+ iv) :: rest }
        .reverse.filter(_.nonEmpty) :+ List(Iv(1L, Long.MaxValue, Long.MaxValue))
      val (stEnd, out) = batches.foldLeft(
          (Option[CovStateW](emptyW),
            Seq.empty[graft.streaming.IntervalCoverage.CovRow])) {
        case ((st, acc), b) =>
          val (st2, o) = covFoldW(1L, st.getOrElse(emptyW), b, slack)
          (st2, acc ++ o)
      }
      stEnd.isEmpty && out == truth
    })
  }

  test("TSV label codec: every string round-trips; escaped form has no raw delimiters") {
    import graft.sources.KeyedPartitionSource.{escapeLabel, unescapeLabel}
    // arbitrary unicode strings, biased toward the dangerous bytes the
    // codec exists for (tab/newline/CR/backslash runs, lookalike
    // escape sequences, trailing backslashes)
    val nasty = Gen.oneOf("\t", "\n", "\r", "\\", "\\t", "\\n", "\\\\", "x")
    val genLabel: Gen[String] = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.listOf(nasty).map(_.mkString),
      Gen.listOf(Gen.oneOf(Gen.asciiPrintableStr, nasty)).map(_.mkString))
    checkProp(Prop.forAll(genLabel) { s =>
      val esc = escapeLabel(s)
      unescapeLabel(esc) == s &&
        !esc.contains('\t') && !esc.contains('\n') && !esc.contains('\r')
    }, cases = 500)
  }
}
