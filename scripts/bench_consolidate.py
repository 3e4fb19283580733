#!/usr/bin/env python3
"""Consolidate N BENCH_DETAIL*.json runs into one best-of file.

The r14 verdict's artifact nit: a consolidated file once carried a
stale `total` copied from an earlier consolidation while its per-query
map had been updated. This script is the only sanctioned way to build
a consolidated artifact: the per-query map is the min across runs per
query, and `total` is ALWAYS recomputed from that map.

Usage: bench_consolidate.py OUT.json RUN1.json RUN2.json [...]
"""
import json
import sys


def main():
    out_path, run_paths = sys.argv[1], sys.argv[2:]
    runs = [json.load(open(p)) for p in run_paths]
    keys = set()
    for r in runs:
        keys |= set(r["queries"])
    merged = {}
    for k in sorted(keys):
        vals = [r["queries"][k] for r in runs if k in r["queries"]]
        merged[k] = min(vals)
    consolidated = {
        "sf": runs[0].get("sf"),
        "unit": "sec",
        "consolidation": f"best-of-{len(runs)}",
        "sources": run_paths,
        "total": round(sum(merged.values()), 3),
        "queries": merged,
    }
    with open(out_path, "w") as f:
        json.dump(consolidated, f, indent=1)
    print(f"{out_path}: {len(merged)} queries, "
          f"total {consolidated['total']}")


if __name__ == "__main__":
    main()
