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
                        "partial": True}
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
    empty dict when the run fails (treated as unadjudicated)."""
    cmd = ["sbt", "-batch",
           f"runMain graft.BenchOne {sf_dir} {','.join(names)} {k}"]
    try:
        out = subprocess.run(cmd, cwd=root, capture_output=True, text=True,
                             timeout=1800).stdout
    except (subprocess.TimeoutExpired, OSError) as e:
        print(f"adjudication: BenchOne run failed ({e})")
        return {}
    times = {}
    for m in re.finditer(r"\[benchone\] (\S+): ([0-9. ]+) s", out):
        times[m.group(1)] = min(float(t) for t in m.group(2).split())
    return times


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
        if not sf_dir or not os.path.isdir(str(sf_dir)):
            print(f"adjudication: artifact has no usable sf dir ({sf_dir!r})")
            sys.exit(1)
        remeasured = benchone(root, sf_dir, [name for name, *_ in drifted])
        verdicts = {}
        for name, t, b, allowed in drifted:
            m = remeasured.get(name)
            if m is None:
                verdicts[name] = {"artifact_s": t, "ref_s": b,
                                  "verdict": "unadjudicated"}
            else:
                v = "box_contention" if m <= allowed else "regression_confirmed"
                verdicts[name] = {"artifact_s": t, "ref_s": b,
                                  "benchone_min_s": round(m, 3), "verdict": v}
            print(f"  adjudicated {name}: {verdicts[name]}")
        # annotate the fresh artifact in place (extra key — the driver
        # and this script only read "queries"/"value"/"sf")
        try:
            rec = json.loads(open(fresh_path).read().strip().splitlines()[-1])
            rec["adjudicated"] = verdicts
            with open(fresh_path, "w") as f:
                f.write(json.dumps(rec) + "\n")
            print(f"annotated {fresh_path} with {len(verdicts)} verdicts")
        except (json.JSONDecodeError, OSError) as e:
            print(f"could not annotate artifact: {e}")
        bad = [n for n, v in verdicts.items()
               if v["verdict"] != "box_contention"]
        if bad:
            print(f"REGRESSION: {len(bad)} queries still slow when timed "
                  f"alone: {', '.join(bad)}")
            sys.exit(1)
        print("all drift adjudicated as box contention — artifact annotated")
        return
    print("no drift: every query within max(2 x ref, ref + 1.0 s)")


if __name__ == "__main__":
    main()
