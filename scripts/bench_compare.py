#!/usr/bin/env python3
"""Compare two bench JSON lines (driver format or raw Bench stdout).

Usage: bench_compare.py OLD.json NEW.json|NEW.log
Accepts either the driver's BENCH_r{N}.json wrapper (queries live inside
the 'tail' field's embedded JSON line) or a raw log containing the bare
{"metric":...} line. Prints common-query totals, the biggest deltas, and
queries present on only one side.
"""
import json
import re
import sys


def canon(queries, base=10):
    """Canonicalize per-query keys across encodings: rounds <=8 emitted
    "q01"/"q135"; round 9 emits the bare decimal number "1"/"135"
    (tail-window budget); mid-round-10+ lines carry an explicit
    "enc":36 marker and render the number in base36 ("3r") — digit
    strings are ambiguous between the two, which is exactly why the
    marker exists. Late round 10 (270 queries) packs the same base36
    keys + single-digit values into the parallel-array pair
    {"k": "1 2 3r …", "v": "993…"} — detected by shape here. All map
    to qNN (two-digit zero-padded, matching the registry's query
    names). Round 10+ OMITS entries that ran <0.5s (same budget) —
    main() gap-fills those to 0.0."""
    if set(queries) == {"k", "v"} and isinstance(queries.get("k"), str):
        keys = queries["k"].split()
        vals = queries["v"]
        assert len(keys) == len(vals), "k/v arrays out of step"
        queries = {k: float(v) for k, v in zip(keys, vals)}
        base = 36
    out = {}
    for k, v in queries.items():
        # Only the LEGACY decimal generations prefix keys with a
        # literal 'q' ("q135" / "q135_dup_span"); in the enc:36
        # generations 'q' is a VALID base36 digit (q26 -> "q",
        # q936.. -> "q?"), so stripping it there mis-decoded those
        # keys (and BENCH_r10.json really does carry a bare "q").
        # Parse base36 keys verbatim; strip 'q' + any trailing name
        # suffix only on the base-10 path.
        # fullmatch, not prefix-match: a malformed legacy key like
        # "q1a" must fall through to the raw-key path, not silently
        # canonicalize to q01 by its leading digits
        lm = re.fullmatch(r"q(\d+)(_.*)?", k) if base == 10 else None
        legacy = base == 10 and k.startswith("q")
        kk = lm.group(1) if lm else (k[1:] if legacy else k)
        try:
            out[f"q{int(kk, 10 if legacy else base):02d}"] = v
        except ValueError:
            out[k] = v
    return out


def selftest():
    """Regression pins for canon() across all four line generations."""
    # enc:36 parallel-array pair: "q" is base36 26, NOT a prefix
    assert canon({"k": "q", "v": "5"}) == {"q26": 5.0}
    assert canon({"k": "1 3r q", "v": "957"}) == {
        "q01": 9.0, "q135": 5.0, "q26": 7.0}
    # legacy decimal generations: 'q' prefix + optional name suffix
    assert canon({"q26": 5.0, "q135_dup_span": 2.0}) == {
        "q26": 5.0, "q135": 2.0}
    # round-9 bare decimal keys
    assert canon({"26": 5.0}) == {"q26": 5.0}
    # malformed legacy key: preserved raw, never coerced by its
    # leading digits
    assert canon({"q1a": 1.0}) == {"q1a": 1.0}
    # enc:36 object form (mid-round-10): verbatim base36 keys
    assert canon({"3r": 4.0, "q": 6.0}, base=36) == {"q135": 4.0, "q26": 6.0}
    print("bench_compare selftest: OK")


def load(path):
    text = open(path).read()
    try:
        doc = json.loads(text)
        if isinstance(doc, dict) and "queries" in doc:
            return canon(doc["queries"], 36 if doc.get("enc") == 36 else 10)
        if isinstance(doc, dict) and "tail" in doc:
            text = doc["tail"]
    except json.JSONDecodeError:
        pass
    m = re.search(r'\{"metric":.*?"queries":(\{.*?\}).*?\}', text)
    if not m:
        sys.exit(f"no bench JSON line found in {path}")
    base = 36 if re.search(r'"enc":36', text) else 10
    return canon(json.loads(m.group(1)), base)


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    # a key present in OLD but absent in NEW means "ran <0.5s in new"
    # (round 10+ omits sub-second entries; queries are never removed),
    # so the common set is old's keys with new gap-filled at 0.0 —
    # a 5s -> 0.4s improvement or 0.4s -> 5s regression both show.
    new = {q: new.get(q, 0.0) for q in old} | {
        q: v for q, v in new.items() if q not in old}
    common = sorted(set(old) & set(new))
    t_old = sum(old[q] for q in common)
    t_new = sum(new[q] for q in common)
    if not common:
        print("no common queries between the two files")
    elif t_old == 0:
        print(f"common {len(common)} queries but old total is 0.0s — "
              f"cannot compute a ratio (new total {t_new:.1f}s)")
    else:
        print(f"common {len(common)} queries: {t_old:.1f}s -> {t_new:.1f}s "
              f"({t_new / t_old:.2f}x)")
        deltas = sorted(common, key=lambda q: abs(new[q] - old[q]),
                        reverse=True)
        print("biggest deltas:")
        for q in deltas[:12]:
            print(f"  {q}: {old[q]:.2f} -> {new[q]:.2f}")
    only_new = sorted(set(new) - set(old))
    only_old = sorted(set(old) - set(new))
    if only_new:
        tn = sum(new[q] for q in only_new)
        print(f"new-only ({len(only_new)}, {tn:.1f}s): " + ", ".join(
            f"{q}={new[q]:.2f}" for q in sorted(
                only_new, key=lambda q: -new[q])[:12]))
    if only_old:
        print(f"old-only: {', '.join(only_old)}")


if __name__ == "__main__":
    if sys.argv[1:] == ["--selftest"]:
        selftest()
    else:
        main()
