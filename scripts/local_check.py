#!/usr/bin/env python3
"""Dev-only oracle pre-check (mimics the driver's t2 gate; NOT part of the
Scala library). Runs each oracle_sql.json query in DuckDB over the same
testdata parquet and compares against the Verify.scala parquet dumps:
row count, column names, and a value hash with columns sorted by name.

Usage: python3 scripts/local_check.py <sfDir> <verifyOutDir>
"""
import json, sys, math

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_hash(rows, cols):
    import hashlib
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.sha256()
    for row in rows:
        h.update(("|".join(canon(row[i]) for i in order) + "\n").encode())
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
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            g_cols = [d[0] for d in got.description]
            g_rows = got.fetchall()
            want = con.execute(sql)
            w_cols = [d[0] for d in want.description]
            w_rows = want.fetchall()
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(g_cols) != sorted(w_cols):
            problems.append(f"cols spark={sorted(g_cols)} oracle={sorted(w_cols)}")
        if len(g_rows) != len(w_rows):
            problems.append(f"rows spark={len(g_rows)} oracle={len(w_rows)}")
        if not problems and table_hash(g_rows, g_cols) != table_hash(w_rows, w_cols):
            problems.append("value hash mismatch")
            for i, (a, b) in enumerate(zip(g_rows, w_rows)):
                ga = [canon(a[j]) for j in sorted(range(len(g_cols)), key=lambda k: g_cols[k])]
                gb = [canon(b[j]) for j in sorted(range(len(w_cols)), key=lambda k: w_cols[k])]
                if ga != gb:
                    problems.append(f"  first diff row {i}: spark={ga} oracle={gb}")
                    break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
