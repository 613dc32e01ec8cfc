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

Defaults: fresh = ./bench_last.json, reference = newest BENCH_r*.json
in the repo root. Exit 1 when any query drifts (so a round-close hook
can refuse to ship the artifact silently), 0 otherwise. Queries new in
the fresh artifact (no reference row) and failed queries (-1) are
reported as info, never as drift.
"""
import glob
import json
import os
import re
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


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fresh_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        root, "bench_last.json")
    ref_path = sys.argv[2] if len(sys.argv) > 2 else newest_round_artifact(root)
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
              "max(2 x ref, ref + 1.0 s) — re-measure on an idle box or "
              "explain before shipping the artifact:")
        for name, t, b, allowed in drifted:
            print(f"  {name}: {t:.3f}s vs ref {b:.3f}s "
                  f"(allowed {allowed:.3f}s, x{t / b:.2f})")
        sys.exit(1)
    print("no drift: every query within max(2 x ref, ref + 1.0 s)")


if __name__ == "__main__":
    main()
