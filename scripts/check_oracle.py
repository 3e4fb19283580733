#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json query in DuckDB against the parquet tables in
sfDir, loads the Spark-written parquet from verifyOutDir/<name>/, sorts
columns by name and rows by all values, and compares EXACTLY (bitwise
for floats). Any diff here would be a hash mismatch at the driver.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def key(row):
    return tuple(
        (x is None, str(type(x)), str(x)) for x in row
    )


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir, f"{t}.parquet")
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_pass = n_fail = 0
    rows_only = []
    for d in sorted(Path(out_dir).iterdir()):
        if not d.is_dir():
            continue
        name = d.name
        got = con.execute(
            f"SELECT * FROM read_parquet('{d}/*.parquet')").fetchall()
        got_cols = [c[0] for c in con.description]
        if name not in oracle:
            rows_only.append((name, len(got)))
            continue
        try:
            exp = con.execute(oracle[name]).fetchall()
            exp_cols = [c[0] for c in con.description]
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
            continue
        gi = [got_cols.index(c) for c in sorted(got_cols)]
        ei = [exp_cols.index(c) for c in sorted(exp_cols)]
        g = sorted([tuple(norm(r[i]) for i in gi) for r in got], key=key)
        e = sorted([tuple(norm(r[i]) for i in ei) for r in exp], key=key)
        if g == e:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: {len(g)} vs {len(e)} rows")
            for i, (a, b) in enumerate(zip(g, e)):
                if a != b:
                    print(f"  first diff at row {i} (cols {sorted(got_cols)}):")
                    print(f"    spark : {a}")
                    print(f"    duckdb: {b}")
                    for x, y in zip(a, b):
                        if x != y and isinstance(x, float) and isinstance(y, float):
                            print(f"    float delta: {x!r} vs {y!r} = {x - y}")
                    break
            else:
                if len(g) != len(e):
                    print(f"    extra rows start: {g[len(e):len(e)+2] if len(g)>len(e) else e[len(g):len(g)+2]}")
    for name, n in rows_only:
        print(f"ROWS-ONLY {name}: {n} rows")
    print(f"\n{n_pass} pass, {n_fail} fail, {len(rows_only)} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
