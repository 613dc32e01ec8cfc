#!/usr/bin/env python3
"""Bench-drift gate (dev/round-close tool; NOT part of the Scala library).

Compares a fresh bench artifact's per-query times against the newest
committed round artifact and flags any query slower than
max(2 x reference, reference + 1.0 s) — the round-10 lesson: t12/t13
shipped a 4x artifact regression that was box contention, and nothing
said so at round close. An absolute +1.0 s floor keeps sub-second
queries from flagging on scheduler noise.

Usage:
    python3 scripts/bench_drift.py [fresh.json] [reference.json]
                                   [--no-adjudicate]

Defaults: fresh = ./bench_last.json, reference = newest BENCH_r*.json
in the repo root. Exit 1 when any query drifts (so a round-close hook
can refuse to ship the artifact silently), 0 otherwise. Queries new in
the fresh artifact (no reference row) and failed queries (-1) are
reported as info, never as drift.

When drift IS found, the gate ADJUDICATES it before failing (the
round-11/12 lesson: every flagged query so far was box contention, and
a human had to re-measure it): flagged queries re-run warm through
graft.BenchOne on an idle-as-possible box, and each gets a verdict —
`box_contention` (the warm re-measure lands back inside the allowance;
annotated, not fatal) or `regression_confirmed` (still slow when timed
alone; exit 1). The adjudication is appended to the fresh artifact
under an "adjudicated" key and echoed, so the round-close record
explains itself. `--no-adjudicate` restores the raw flag-and-exit
behavior (e.g. when no JVM is available).

Three guards keep the auto-verdict honest (a warm solo re-measure can
wave through regressions that only manifest under full-suite
conditions — state-store / cache / memory contention from neighbors —
and can CONFIRM phantoms when the box itself is in a slow phase):

 0. Load probes: every adjudication run also times two stable probe
    queries — one batch aggregate, one streaming drain (the round-16
    phantom inflated micro-batch execution 3-4x while batch stayed
    flat, so a batch-only probe would see nothing) — and the max
    probe inflation vs its reference row scales every solo allowance.
    Past PHASE_BAD (2x) the box is declared degraded: the gate exits 1
    with `box_degraded_retry` verdicts instead of ever confirming a
    regression it cannot distinguish from the environment.

 1. Per-query gap visibility: every adjudication records
    `gap_factor` = artifact / benchone. Any factor > GAP_LOUD (3x)
    prints a LOUD warning and is annotated, so an artifact-vs-solo gap
    far beyond the allowance stays visible to the human reading the
    round-close record even when the verdict is box_contention.
 2. Systemic-contention rerun: when >= SYSTEMIC_MIN queries (or 10% of
    the compared set) drift TOGETHER — the signature of suite-level
    contention, not a single hot query — the gate re-times the WHOLE
    common query set through BenchOne and records BOTH totals in the
    artifact (`suite_rerun`: artifact vs solo-corrected subtotal vs
    reference subtotal). If the solo-corrected subtotal still exceeds
    1.2x the reference subtotal, the suite genuinely regressed (e.g.
    new queries poisoning shared state) -> exit 1.
"""
import glob
import json
import os
import re
import subprocess
import sys


def load(path):
    # Three artifact shapes exist:
    #  1. Bench.scala's own file/stdout record: one JSON object per line,
    #     the full record is the line carrying "queries".
    #  2. The driver's BENCH_r*.json wrapper: a multi-line object whose
    #     "tail" field holds a (possibly truncated) fragment of the
    #     per-query map — recover what pairs survive via regex.
    #  3. A pretty-printed full record (whole-file json with "queries").
    text = open(path).read()
    try:
        obj = json.loads(text)
        if "queries" in obj:
            return obj
        if "tail" in obj:
            qs = {m.group(1): float(m.group(2)) for m in re.finditer(
                r'"([A-Za-z0-9_]+)":(-?\d+\.\d+)', obj["tail"])}
            qs.pop("value", None)
            if qs:
                return {"queries": qs, "value": obj.get("total", "?"),
                        "sf": obj.get("sf"), "partial": True}
    except json.JSONDecodeError:
        pass
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "queries" in obj:
            return obj
    raise SystemExit(f"no bench record with per-query detail in {path}")


def annotate(path, extras):
    """Merge `extras` into the artifact's per-query record IN PLACE,
    preserving every other line. Bench.scala's stdout-captured shape is
    one JSON object per line with the full record (the one carrying
    "queries") first and a short trailer record last — so "annotate the
    last line" destroys the per-query record. Annotate the line load()
    would return instead; pretty-printed whole-file JSON is rewritten
    whole. Returns True when an annotation landed."""
    try:
        text = open(path).read()
    except OSError as e:
        print(f"could not annotate artifact: {e}")
        return False
    try:
        obj = json.loads(text)
        # "queries": Bench.scala's own record; "tail": the driver's
        # BENCH_r*.json wrapper — adjudicating a DRIVER artifact must
        # land the verdicts on the artifact too, so the judge reads
        # them off the file instead of re-measuring by hand.
        if "queries" in obj or "tail" in obj:
            obj.update(extras)
            with open(path, "w") as f:
                f.write(json.dumps(obj) + "\n")
            return True
    except json.JSONDecodeError:
        pass
    lines = text.splitlines()
    for i, line in enumerate(lines):
        stripped = line.strip()
        if not stripped:
            continue
        try:
            obj = json.loads(stripped)
        except json.JSONDecodeError:
            continue
        if "queries" in obj:
            obj.update(extras)
            lines[i] = json.dumps(obj)
            with open(path, "w") as f:
                f.write("\n".join(lines) + "\n")
            return True
    print(f"no line with per-query detail in {path} — annotation skipped")
    return False


def newest_round_artifact(root):
    # prefer the maintained clean-box reference; fall back to the newest
    # driver round artifact (whose per-query detail may be partial)
    ref = os.path.join(root, "BENCH_REF.json")
    if os.path.exists(ref):
        return ref
    arts = glob.glob(os.path.join(root, "BENCH_r*.json"))
    if not arts:
        raise SystemExit("no committed BENCH_REF.json or BENCH_r*.json "
                         "to compare against")

    def rnum(p):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1

    return max(arts, key=rnum)


def benchone(root, sf_dir, names, k=3):
    """Warm re-measure of `names` via graft.BenchOne (one sbt fork —
    same session config as Bench). Returns {name: min_seconds}; an
    empty dict when the run fails (treated as unadjudicated).

    The timeout scales with the request: a whole-suite systemic rerun
    (300+ queries x k) cannot fit the same 30-minute budget a handful
    of drifted queries does."""
    cmd = ["sbt", "-batch",
           f"runMain graft.BenchOne {sf_dir} {','.join(names)} {k}"]
    timeout = max(1800, 20 * len(names) * k)
    try:
        out = subprocess.run(cmd, cwd=root, capture_output=True, text=True,
                             timeout=timeout).stdout
    except (subprocess.TimeoutExpired, OSError) as e:
        print(f"adjudication: BenchOne run failed ({e})")
        return {}
    times = {}
    for m in re.finditer(r"\[benchone\] (\S+): ([0-9. ]+) s", out):
        times[m.group(1)] = min(float(t) for t in m.group(2).split())
    return times


def derive_load(probe_info, corroborate=1.15):
    """Cross-checked load factor from the probe measurements.

    Deriving load from a probe that ITSELF drifted is circular
    (round-17 ADVICE): a genuine code regression in the probe inflates
    load_factor by its own slowdown, which loosens allowed_solo for
    EVERY flagged query and certifies the probe's own regression as
    box_contention — and past PHASE_BAD it becomes a box_degraded_retry
    loop that can never clear, because the "phase" is the code.
    Cross-check the two probes:
     - load read off UNFLAGGED probes is trusted as-is;
     - a FLAGGED probe's inflation counts only when an unflagged probe
       corroborates a slow phase (>= corroborate): only an environment
       phase moves an independent engine too, while a code regression
       in one probe leaves the other flat;
     - when EVERY probe is flagged there is no independent signal left:
       take the MIN of their inflations (a code regression in one probe
       cannot drag the estimate past the other's) and tag the run as
       circular so the round-close record shows exactly where the
       scaling came from.
    Returns (load_factor, load_source)."""
    trusted = [i["load"] for i in probe_info.values() if not i["flagged"]]
    suspect = [i["load"] for i in probe_info.values() if i["flagged"]]
    if trusted:
        load_factor = max(trusted)
        load_source = "unflagged_probes"
        if suspect and max(suspect) > load_factor:
            if load_factor >= corroborate:
                load_factor = max(suspect)
                load_source = "flagged_probe_corroborated"
            else:
                load_source = "flagged_probe_rejected_uncorroborated"
    elif suspect:
        load_factor = min(suspect)
        load_source = "flagged_probes_min_circular"
    else:
        load_factor = 1.0
        load_source = "no_probes"
    return load_factor, load_source


def window_systemic(drifted_names, started, k=5, w=2):
    """Second systemic trigger (timeline clustering): a box-slow PHASE
    hits queries that ran close together in WALL-CLOCK time. Under
    Bench's randomized execution order those are not name-space
    neighbors, and a modest cluster can sit below the 10% count bar
    (round 17: 25 of 354 drifted in one contiguous stretch and the
    count trigger never fired). Systemic when any window of w*k
    consecutively-EXECUTED queries contains >= k drifted ones.
    `started` is the artifact's {name: start_offset_s} map; absent in
    pre-round-18 artifacts -> trigger inert."""
    if not started or not drifted_names:
        return False
    order = [n for n, _ in sorted(started.items(), key=lambda kv: kv[1])]
    flags = [1 if n in drifted_names else 0 for n in order]
    win = min(len(flags), w * k)
    if win <= 0:
        return False
    s = sum(flags[:win])
    if s >= k:
        return True
    for i in range(win, len(flags)):
        s += flags[i] - flags[i - win]
        if s >= k:
            return True
    return False


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    args = [a for a in sys.argv[1:] if a != "--no-adjudicate"]
    adjudicate = "--no-adjudicate" not in sys.argv[1:]
    fresh_path = args[0] if len(args) > 0 else os.path.join(
        root, "bench_last.json")
    ref_path = args[1] if len(args) > 1 else newest_round_artifact(root)
    fresh, ref = load(fresh_path), load(ref_path)
    fq, rq = fresh["queries"], ref["queries"]

    drifted, new, failed = [], [], []
    for name, t in sorted(fq.items()):
        if t < 0:
            failed.append(name)
            continue
        b = rq.get(name)
        if b is None or b < 0:
            new.append(name)
            continue
        allowed = max(2.0 * b, b + 1.0)
        if t > allowed:
            drifted.append((name, t, b, allowed))

    print(f"fresh: {fresh_path} ({len(fq)} queries, "
          f"total {fresh.get('value', '?')}s)")
    print(f"ref:   {ref_path} ({len(rq)} queries, "
          f"total {ref.get('value', '?')}s)")
    if new:
        print(f"info: {len(new)} queries have no reference row: "
              + ", ".join(new))
    if failed:
        print(f"info: {len(failed)} queries FAILED in the fresh run: "
              + ", ".join(failed))
    if drifted:
        print(f"\nDRIFT: {len(drifted)} queries past "
              "max(2 x ref, ref + 1.0 s):")
        for name, t, b, allowed in drifted:
            print(f"  {name}: {t:.3f}s vs ref {b:.3f}s "
                  f"(allowed {allowed:.3f}s, x{t / b:.2f})")
        if not adjudicate:
            print("adjudication skipped (--no-adjudicate) — re-measure on "
                  "an idle box or explain before shipping the artifact")
            sys.exit(1)
        # adjudicate: warm single-JVM re-measure of exactly the flagged
        # queries; a re-measure inside the allowance proves the artifact
        # number was box contention, not a code regression
        sf_dir = fresh.get("sf")
        if sf_dir is not None and not os.path.isdir(str(sf_dir)):
            # driver artifacts carry the scale factor as a NUMBER, not a
            # path — resolve it against the standard testdata layout so
            # the gate can adjudicate a driver run too
            cand = os.path.join(
                os.environ.get("GRAFT_TESTDATA", "/root/testdata"),
                f"sf{sf_dir}")
            if os.path.isdir(cand):
                sf_dir = cand
        if not sf_dir or not os.path.isdir(str(sf_dir)):
            print(f"adjudication: artifact has no usable sf dir ({sf_dir!r})")
            sys.exit(1)
        GAP_LOUD = 3.0
        SYSTEMIC_MIN = 5
        PHASE_BAD = 2.0
        compared = [n for n, t in fq.items()
                    if t >= 0 and rq.get(n, -1) >= 0]
        # two systemic triggers: a count wave (many names drifting) OR a
        # timeline cluster (drifted queries that EXECUTED back-to-back —
        # the signature of a box phase that the count bar can sit under)
        count_systemic = len(drifted) >= max(SYSTEMIC_MIN,
                                             len(compared) // 10)
        timeline_systemic = window_systemic(
            {name for name, *_ in drifted}, fresh.get("started"))
        if timeline_systemic and not count_systemic:
            print("timeline trigger: drifted queries cluster in a "
                  "contiguous execution window — treating as systemic")
        systemic = count_systemic or timeline_systemic
        # LOAD PROBES ride the same BenchOne run (the round-16 lesson: a
        # solo re-measure taken INSIDE a box-slow phase confirmed a
        # phantom regression for st60 — the flagged query was slow alone
        # because the whole box was, and nothing in the adjudication
        # could see that). Two probes, deliberately one per engine: a
        # batch aggregate AND a streaming drain, because the observed
        # phase inflated micro-batch execution 3-4x while CPU-bound
        # batch queries stayed flat — a batch-only probe would have
        # read load 1.0 and still confirmed the phantom. The max probe
        # inflation scales every solo allowance; past PHASE_BAD the box
        # is declared degraded and NO regression verdict is issued.
        PROBES = ["q01_pricing_summary", "st01_stream_hourly"]
        flagged_names = [name for name, *_ in drifted]
        # A probe that drifted itself is STILL a load signal (a systemic
        # box-slow phase — the exact scenario the probes exist for — will
        # likely drift q01/st01 too; dropping them would leave
        # load_factor = 1.0 and free the gate to confirm phantoms).
        # Flagged probes are already in the BenchOne run via
        # flagged_names; only the unflagged ones need adding.
        usable_probes = [p for p in PROBES if rq.get(p, -1) > 0]
        extra = [p for p in usable_probes if p not in flagged_names]
        remeasured = benchone(root, sf_dir, flagged_names + extra)
        probe_info = {}
        for p in usable_probes:
            m = remeasured.get(p)
            if m and m > 0:
                pl = round(max(1.0, m / rq[p]), 2)
                probe_info[p] = {"solo_s": round(m, 3),
                                 "ref_s": rq[p], "load": pl,
                                 "flagged": p in flagged_names}
        # cross-checked load derivation — see derive_load's docstring
        # for the circularity rationale (round-17 ADVICE)
        load_factor, load_source = derive_load(probe_info)
        if probe_info:
            print(f"  load probes: {probe_info} -> "
                  f"load x{load_factor:.2f} ({load_source})")
        box_degraded = load_factor > PHASE_BAD
        verdicts = {}
        loud = []
        for name, t, b, allowed in drifted:
            m = remeasured.get(name)
            if m is None or m <= 0:
                # no solo measurement, or a physically implausible 0 s
                # min (a mis-parse, not a timing): either way the drift
                # is UNADJUDICATED and must fail the gate — a 0 s min
                # classified as contention would wave a real regression
                # through (0 <= allowed vacuously)
                verdicts[name] = {"artifact_s": t, "ref_s": b,
                                  "verdict": "unadjudicated"}
            else:
                allowed_solo = load_factor * allowed
                if m <= allowed_solo:
                    v = "box_contention"
                elif box_degraded:
                    # the probes say the box is in a slow phase right
                    # now: a solo re-measure cannot distinguish code
                    # from environment, so no regression verdict —
                    # fail the gate with the honest diagnosis instead
                    v = "box_degraded_retry"
                else:
                    v = "regression_confirmed"
                gap = round(t / m, 2)
                verdicts[name] = {"artifact_s": t, "ref_s": b,
                                  "benchone_min_s": round(m, 3),
                                  "gap_factor": gap, "load": round(load_factor, 2),
                                  "load_source": load_source,
                                  "verdict": v}
                # Load INFLATES the solo time m, which SHRINKS
                # gap = artifact / m — a genuine suite-conditions
                # regression is already understated under load, so the
                # loud bar must come DOWN with load, not up:
                # gap * load_factor > GAP_LOUD.
                if v == "box_contention" and gap * load_factor > GAP_LOUD:
                    loud.append((name, gap))
            print(f"  adjudicated {name}: {verdicts[name]}")
        extras = {"adjudicated": verdicts}
        if probe_info:
            extras["load_probes"] = probe_info
            extras["load_source"] = load_source
        if loud:
            print(f"\nLOUD: {len(loud)} box_contention verdicts with an "
                  f"artifact-vs-solo gap past {GAP_LOUD}x — "
                  + ", ".join(f"{n} (x{g})" for n, g in loud)
                  + "\n      a solo re-measure cannot rule out a "
                  "suite-conditions regression at that gap; eyeball the "
                  "round-close record")
        suite_bad = False
        if systemic:
            # many queries drifted together: suite-level contention
            # signature. Re-time the WHOLE common set solo and compare
            # subtotals, so a regression that only manifests under
            # full-suite conditions (shared cache/state poisoning from
            # new queries) cannot hide behind per-query waves.
            print(f"\nsystemic signature: {len(drifted)}/{len(compared)} "
                  "compared queries drifted together — re-timing the whole "
                  "common set through BenchOne")
            whole = benchone(root, sf_dir, compared, k=2)
            if whole:
                common = [n for n in compared if n in whole]
                art_total = round(sum(fq[n] for n in common), 1)
                solo_total = round(sum(whole[n] for n in common), 1)
                ref_total = round(sum(rq[n] for n in common), 1)
                # the load probes scale the suite bar too: a box-slow
                # phase inflates the whole-set rerun the same way it
                # inflates per-query solos
                suite_bad = solo_total > 1.2 * load_factor * ref_total
                extras["suite_rerun"] = {
                    "n_common": len(common), "artifact_total_s": art_total,
                    "benchone_total_s": solo_total, "ref_total_s": ref_total,
                    "verdict": ("suite_regression_confirmed" if suite_bad
                                else "suite_contention")}
                print(f"  suite_rerun: {extras['suite_rerun']}")
            else:
                # a failed whole-set rerun leaves a SYSTEMIC signature
                # unadjudicated — that is a gate failure, not a skip: a
                # suite-level regression must never pass silently just
                # because the adjudication run itself fell over
                suite_bad = True
                extras["suite_rerun"] = {"verdict": "unadjudicated"}
                print("  suite rerun failed — systemic drift stays "
                      "unadjudicated, failing the gate")
        # annotate the fresh artifact in place (extra keys — the driver
        # and this script only read "queries"/"value"/"sf")
        if annotate(fresh_path, extras):
            print(f"annotated {fresh_path} with {len(verdicts)} verdicts")
        degraded = [n for n, v in verdicts.items()
                    if v["verdict"] == "box_degraded_retry"]
        bad = [n for n, v in verdicts.items()
               if v["verdict"] not in ("box_contention", "box_degraded_retry")]
        if bad:
            print(f"REGRESSION: {len(bad)} queries still slow when timed "
                  f"alone: {', '.join(bad)}")
            sys.exit(1)
        if degraded:
            print(f"BOX DEGRADED (load x{load_factor:.2f} past {PHASE_BAD}x): "
                  f"{len(degraded)} queries cannot be adjudicated in this "
                  f"phase: {', '.join(degraded)} — re-run the gate when the "
                  "box settles; no regression verdict issued")
            sys.exit(1)
        if suite_bad:
            if extras["suite_rerun"]["verdict"] == "unadjudicated":
                print("SUITE DRIFT UNADJUDICATED: the whole-set rerun "
                      "failed — cannot rule out a suite-level regression")
            else:
                print("SUITE REGRESSION: solo-corrected subtotal still past "
                      "1.2x the reference subtotal — not contention")
            sys.exit(1)
        print("all drift adjudicated as box contention — artifact annotated")
        return
    print("no drift: every query within max(2 x ref, ref + 1.0 s)")


if __name__ == "__main__":
    main()
