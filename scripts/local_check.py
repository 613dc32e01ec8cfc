#!/usr/bin/env python3
"""Dev-only oracle pre-check (mimics the driver's t2 gate; NOT part of the
Scala library). Runs each oracle_sql.json query in DuckDB over the same
testdata parquet and compares against the Verify.scala parquet dumps:
row count, column names, and a value hash with columns sorted by name.

Deliberately goes through pandas (duckdb `.df()`), like the driver, so
dtype artifacts surface locally: DuckDB HUGEINT (SUM of integers) coerces
to float64 in pandas and hash-mismatches Spark's int64 even when values
are numerically identical, and unhashable cells (numpy arrays) crash the
row sort — both must fail HERE, not in the graded run.

Usage: python3 scripts/local_check.py <sfDir> <verifyOutDir>
"""
import json, sys, math
from pathlib import Path

import duckdb


TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    """Canonical string per cell, dtype-sensitive: numpy int64 1435 ->
    '1435' but float64 1435.0 -> '1435.0' (the driver's artifact)."""
    if v is None:
        return "NULL"
    if hasattr(v, "item"):  # numpy scalar -> python scalar, keeps int/float split
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def frame_hash(df):
    """Columns sorted by name, rows sorted by all columns (pandas
    sort_values — crashes on unhashable cells exactly like the driver),
    then a sha256 over canonical cell strings."""
    import hashlib
    cols = sorted(df.columns)
    df = df[cols].sort_values(by=cols).reset_index(drop=True)
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(("|".join(canon(v) for v in row) + "\n").encode())
    return h.hexdigest()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            gdf = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            wdf = con.execute(sql).df()
            problems = []
            if sorted(gdf.columns) != sorted(wdf.columns):
                problems.append(
                    f"cols spark={sorted(gdf.columns)} oracle={sorted(wdf.columns)}")
            if len(gdf) != len(wdf):
                problems.append(f"rows spark={len(gdf)} oracle={len(wdf)}")
            if not problems and frame_hash(gdf) != frame_hash(wdf):
                problems.append("value hash mismatch")
                cols = sorted(gdf.columns)
                ga = gdf[cols].sort_values(by=cols).reset_index(drop=True)
                gb = wdf[cols].sort_values(by=cols).reset_index(drop=True)
                for i in range(min(len(ga), len(gb))):
                    ra = [canon(v) for v in ga.iloc[i]]
                    rb = [canon(v) for v in gb.iloc[i]]
                    if ra != rb:
                        problems.append(f"  first diff row {i}: spark={ra} oracle={rb}")
                        break
        except Exception as e:
            print(f"FAIL {name}: error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gdf)} rows)")
            n_pass += 1
    # round-close checklist: regenerate QUERIES.md from the same dump's
    # oracle set (the r13 lesson — the catalog shipped 16 queries stale
    # because regeneration was a manual step). gen_catalog exits 1 on a
    # catalog-vs-oracle mismatch, which counts as a failure here — and
    # the human-readable summary prints AFTER it so the tally a reader
    # sees matches the exit code.
    import subprocess
    cat = subprocess.run(
        [sys.executable, str(Path(__file__).resolve().parent / "gen_catalog.py"),
         out_dir])
    if cat.returncode != 0:
        print("FAIL catalog: gen_catalog.py mismatch vs oracle_sql.json")
        n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
