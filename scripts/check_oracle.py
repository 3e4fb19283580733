#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json query in DuckDB against the parquet tables in
sfDir, loads the Spark-written parquet from verifyOutDir/<name>/, sorts
columns by name and rows by all values, and compares EXACTLY (bitwise
for floats). The driver's checker goes through pandas, so dtype KIND
matters: an int column vs a float column fails even when the values
compare equal in Python (DuckDB HUGEINT -> float64 is the classic
trap). int32 vs int64 is fine (both kind 'i'), matching the driver.
"""
import json
import math
import struct
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def cell(x):
    """Normalize a cell for exact comparison: floats bitwise
    (NaN == NaN, -0.0 != 0.0), everything else by (type-kind, str)."""
    if x is None:
        return ("null",)
    if isinstance(x, float):
        return ("f", struct.pack(">d", x))
    if isinstance(x, (int,)):
        return ("i", x)
    return ("o", str(x))


def frame_rows(df):
    rows = []
    for r in df.itertuples(index=False, name=None):
        rows.append(tuple(cell(None if x is pd.NaT else x) for x in r))
    return sorted(rows)


def kindsig(df):
    out = []
    for c in df.columns:
        k = df[c].dtype.kind
        out.append("i" if k in "iu" else k)
    return out


def to_py(df):
    """itertuples yields numpy scalars; convert to python for cell()."""
    return df.astype(object).where(pd.notnull(df), None)


def connect(sf_dir):
    """Fresh DuckDB connection with the table views and the 8GB
    stress limit (the memory budget every oracle must clear)."""
    con = duckdb.connect()
    con.execute("SET memory_limit='8GB'")
    for t in TABLES:
        p = Path(sf_dir, f"{t}.parquet")
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    con = connect(sf_dir)

    n_pass = n_fail = 0
    rows_only = []
    for d in sorted(Path(out_dir).iterdir()):
        if not d.is_dir():
            continue
        name = d.name
        got = con.execute(
            f"SELECT * FROM read_parquet('{d}/*.parquet')").df()
        if name not in oracle:
            # driver still sorts rows-only results -> must be sortable
            try:
                got.sort_values(by=list(got.columns))
            except Exception as e:
                print(f"FAIL {name}: rows-only result unsortable: {e}")
                n_fail += 1
                continue
            rows_only.append((name, len(got)))
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            if "Out of Memory" in str(e):
                # the long-lived connection's buffer pool can be left
                # fragmented by an earlier heavy chain (the q327/q328
                # flake) and OOM on an UNRELATED query: retry once on
                # a fresh connection — a query that really exceeds the
                # 8GB stress limit fails there too
                try:
                    con.close()
                    con = connect(sf_dir)
                    exp = con.execute(oracle[name]).df()
                except Exception as e2:
                    print(f"FAIL {name}: oracle SQL error (fresh "
                          f"connection): {e2}")
                    n_fail += 1
                    continue
            else:
                print(f"FAIL {name}: oracle SQL error: {e}")
                n_fail += 1
                continue
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: columns {sorted(got.columns)} != "
                  f"{sorted(exp.columns)}")
            n_fail += 1
            continue
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        if kindsig(got) != kindsig(exp):
            print(f"FAIL {name}: dtype kinds differ "
                  f"(cols {list(got.columns)}): spark {kindsig(got)} "
                  f"{[str(t) for t in got.dtypes]} vs duckdb {kindsig(exp)} "
                  f"{[str(t) for t in exp.dtypes]}")
            n_fail += 1
            continue
        g = frame_rows(to_py(got))
        e = frame_rows(to_py(exp))
        if g == e:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: {len(g)} vs {len(e)} rows")
            for i, (a, b) in enumerate(zip(g, e)):
                if a != b:
                    print(f"  first diff at row {i} "
                          f"(cols {list(got.columns)}):")
                    print(f"    spark : {a}")
                    print(f"    duckdb: {b}")
                    break
            else:
                if len(g) != len(e):
                    longer = g if len(g) > len(e) else e
                    print(f"    extra rows start: "
                          f"{longer[min(len(g), len(e)):][:2]}")
    for name, n in rows_only:
        print(f"ROWS-ONLY {name}: {n} rows")
    print(f"\n{n_pass} pass, {n_fail} fail, {len(rows_only)} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
