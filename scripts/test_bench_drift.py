#!/usr/bin/env python3
"""Unit tests for the bench-drift gate's pure logic (dev tooling check;
run directly: `python3 scripts/test_bench_drift.py`, or via pytest).

Covers the two round-18 additions:
 - derive_load: the cross-checked load factor (a flagged probe must not
   certify its own regression as box contention — round-17 ADVICE);
 - window_systemic: the timeline trigger (drifted queries clustering in
   a contiguous execution window = box phase, even under the 10% count
   bar — round-17 VERDICT item 7).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import bench_drift  # noqa: E402


def probe(load, flagged):
    return {"solo_s": 1.0, "ref_s": 1.0, "load": load, "flagged": flagged}


def test_load_unflagged_probes_trusted():
    lf, src = bench_drift.derive_load({
        "q01": probe(1.6, False), "st01": probe(1.2, False)})
    assert (lf, src) == (1.6, "unflagged_probes")


def test_load_flagged_probe_rejected_when_other_is_flat():
    # the round-17 ADVICE scenario: a code regression in st01 inflates
    # its own solo rerun while the independent batch probe stays flat —
    # the inflation must NOT loosen every allowance
    lf, src = bench_drift.derive_load({
        "q01": probe(1.0, False), "st01": probe(2.5, True)})
    assert lf == 1.0
    assert src == "flagged_probe_rejected_uncorroborated"


def test_load_flagged_probe_accepted_when_corroborated():
    # a genuine box phase moves the independent engine too (round-16
    # lesson: the phase inflated micro-batch 3-4x, batch 1.2x) — the
    # bigger flagged reading is then admissible as load
    lf, src = bench_drift.derive_load({
        "q01": probe(1.2, False), "st01": probe(3.5, True)})
    assert (lf, src) == (3.5, "flagged_probe_corroborated")


def test_load_all_probes_flagged_takes_min():
    # no independent signal left: the MIN cross-check stops a single
    # probe's code regression from dragging the estimate up, and the
    # tag shows the circularity in the round-close record
    lf, src = bench_drift.derive_load({
        "q01": probe(1.3, True), "st01": probe(4.0, True)})
    assert (lf, src) == (1.3, "flagged_probes_min_circular")


def test_load_no_probes():
    assert bench_drift.derive_load({}) == (1.0, "no_probes")


def _started(names):
    return {n: i * 10 for i, n in enumerate(names)}


def test_window_fires_on_contiguous_cluster():
    # 5 drifted queries inside 10 consecutive executions -> systemic,
    # even though 5/100 sits far under the 10% count bar
    names = [f"q{i:03d}" for i in range(100)]
    drifted = {names[i] for i in (40, 42, 43, 45, 47)}
    assert bench_drift.window_systemic(drifted, _started(names))


def test_window_quiet_on_scattered_drift():
    # the same 5 drifted queries spread across the whole run -> not a
    # phase signature; per-query adjudication handles them
    names = [f"q{i:03d}" for i in range(100)]
    drifted = {names[i] for i in (5, 25, 50, 75, 95)}
    assert not bench_drift.window_systemic(drifted, _started(names))


def test_window_inert_without_timestamps():
    # pre-round-18 artifacts carry no "started" map
    assert not bench_drift.window_systemic({"q001"}, None)
    assert not bench_drift.window_systemic(set(), _started(["q001"]))


def test_window_small_suite_needs_k():
    # a suite shorter than the window: still needs k drifted in total
    names = [f"q{i}" for i in range(6)]
    assert not bench_drift.window_systemic(set(names[:4]), _started(names))
    assert bench_drift.window_systemic(set(names[:5]), _started(names))


def main():
    tests = [(n, f) for n, f in sorted(globals().items())
             if n.startswith("test_") and callable(f)]
    failed = 0
    for name, fn in tests:
        try:
            fn()
            print(f"ok   {name}")
        except AssertionError as e:
            failed += 1
            print(f"FAIL {name}: {e}")
    print(f"{len(tests) - failed}/{len(tests)} passed")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
