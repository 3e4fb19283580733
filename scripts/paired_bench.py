#!/usr/bin/env python3
"""Interleaved PAIRED bench: drive TWO builds' `graft.Bench --serve`
processes alternately per query inside ONE session, so the window term
(noisy-neighbor drift) cancels pairwise — the r14 adjudication needed a
byte-identical control-worktree re-bench to defeat window drift; this
protocol makes every per-query ratio self-controlled instead.

Per query id i over the sorted common set: run (A then B) when i is
even, (B then A) when i is odd — alternating which build pays any
first-touch cost (page cache, JIT of a cold path) so ordering bias
cancels across the set too.

Each serve process gets its own scratch cwd + GRAFT_ARTIFACTS_DIR, so
durable artifacts are built once PER PROCESS (the same economics as a
normal full bench run) and the two builds can't serve each other's
artifacts.

Usage:
  paired_bench.py <jarA> <jarB> [--sf DIR] [--cpus N] [--out FILE]
                  [--label-a NAME] [--label-b NAME] [--mem 8g]
A is the baseline (prev build), B the candidate (current build); the
reported ratio is B/A per query (<1 = B faster). Output JSON carries
full-precision per-query pairs, the per-query ratio MEDIAN (the
headline number), and totals recomputed from the per-query map (never
a carried-over field).
"""
import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

ADD_OPENS = [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
]


def compile_harness(against_jar):
    """Compile scripts/ServeHarness.scala with the scala compiler that
    ships in /opt/spark/jars, against one of the benched jars — so a
    baseline build that PREDATES `graft.Bench --serve` can still be
    driven (its Bench would ignore --serve and run the batch main)."""
    out = tempfile.mkdtemp(prefix="graft_harness_")
    src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ServeHarness.scala")
    subprocess.run(
        ["java", "-cp", "/opt/spark/jars/*", "scala.tools.nsc.Main",
         "-classpath", f"/opt/spark/jars/*:{os.path.abspath(against_jar)}",
         "-d", out, src],
        check=True)
    return out


class Serve:
    def __init__(self, jar, sf, cpus, mem, label, harness):
        self.label = label
        self.scratch = tempfile.mkdtemp(prefix=f"graft_paired_{label}_")
        env = dict(os.environ)
        env["SPARK_GRAFT_SF_DIR"] = sf
        env["SPARK_GRAFT_CPUS"] = str(cpus)
        env["GRAFT_ARTIFACTS_DIR"] = os.path.join(self.scratch, "artifacts")
        cmd = ["java", f"-Xmx{mem}",
               "-Dspark.ui.enabled=false",
               "-Dspark.sql.session.timeZone=UTC"]
        for p in ADD_OPENS:
            cmd += ["--add-opens", f"{p}=ALL-UNNAMED"]
        cmd += ["-cp",
                f"{harness}:/opt/spark/jars/*:{os.path.abspath(jar)}",
                "graftbench.ServeHarness"]
        # stderr goes to a per-process log (Spark noise + the
        # '[bench] <q> failed' lines), never to the bit bucket — a
        # failing query must stay diagnosable
        self.errlog = os.path.join(self.scratch, "serve_stderr.log")
        self.proc = subprocess.Popen(
            cmd, cwd=self.scratch, env=env,
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=open(self.errlog, "w"), text=True, bufsize=1)
        self._await("READY")

    def _await(self, *prefixes):
        while True:
            line = self.proc.stdout.readline()
            if not line:
                raise RuntimeError(f"{self.label}: serve process died")
            if any(line.startswith(p) for p in prefixes):
                return line.strip()

    def list_queries(self):
        self.proc.stdin.write("LIST\n")
        self.proc.stdin.flush()
        return set(self._await("QUERIES").split()[1:])

    def time(self, name):
        """Returns (seconds, ok). A query that THREW must never be
        recorded as a valid fast timing — the serve answers
        'TIME <name> <sec> ok|err' (older harness generations omit the
        flag; absence decodes as ok for backward compatibility)."""
        self.proc.stdin.write(name + "\n")
        self.proc.stdin.flush()
        line = self._await("TIME", "UNKNOWN")
        if line.startswith("UNKNOWN"):
            raise RuntimeError(f"{self.label}: unknown query {name}")
        parts = line.split()
        got, sec = parts[1], parts[2]
        ok = len(parts) < 4 or parts[3] == "ok"
        assert got == name, f"{self.label}: answered {got} for {name}"
        return float(sec), ok

    def close(self):
        try:
            self.proc.stdin.close()
            self.proc.wait(timeout=120)
        except Exception:
            self.proc.kill()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("jar_a")
    ap.add_argument("jar_b")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default="8")
    ap.add_argument("--out", default="BENCH_PAIRED.json")
    ap.add_argument("--label-a", default="prev")
    ap.add_argument("--label-b", default="curr")
    ap.add_argument("--mem", default="8g")
    ap.add_argument("--only", default="",
                    help="comma-separated names: re-pair a suspect "
                         "subset (the double-run rule) instead of the "
                         "whole common set")
    args = ap.parse_args()

    harness = compile_harness(args.jar_b)
    a = Serve(args.jar_a, args.sf, args.cpus, args.mem, args.label_a,
              harness)
    b = Serve(args.jar_b, args.sf, args.cpus, args.mem, args.label_b,
              harness)
    common = sorted(a.list_queries() & b.list_queries())
    only_a = sorted(a.list_queries() - b.list_queries())
    only_b = sorted(b.list_queries() - a.list_queries())
    if args.only:
        wanted = set(args.only.split(","))
        common = [q for q in common if q in wanted]
    print(f"common {len(common)}, only-{args.label_a} {len(only_a)}, "
          f"only-{args.label_b} {len(only_b)}", file=sys.stderr)

    pairs = {}
    errors = []
    for i, q in enumerate(common):
        if i % 2 == 0:
            (ta, oka), (tb, okb) = a.time(q), b.time(q)
        else:
            (tb, okb), (ta, oka) = b.time(q), a.time(q)
        if not (oka and okb):
            # a failed cell is REPORTED, never averaged in as a
            # (deceptively fast) timing
            errors.append({"q": q, "a_ok": oka, "b_ok": okb})
            print(f"[paired] {q} FAILED "
                  f"({args.label_a}_ok={oka} {args.label_b}_ok={okb}) "
                  f"— see serve_stderr.log in the scratch dirs",
                  file=sys.stderr)
            continue
        pairs[q] = {"a": round(ta, 4), "b": round(tb, 4),
                    "ratio": round(tb / ta, 4) if ta > 0 else None}
        print(f"[paired] {q} {args.label_a}={ta:.2f}s "
              f"{args.label_b}={tb:.2f}s ratio={tb / ta:.2f}",
              file=sys.stderr)
    a.close()
    b.close()

    ratios = [p["ratio"] for p in pairs.values() if p["ratio"]]
    total_a = sum(p["a"] for p in pairs.values())
    total_b = sum(p["b"] for p in pairs.values())
    # pairs can end up empty (every common query errored, or --only
    # matched nothing): still write the output JSON with the errors
    # list instead of crashing after the full bench ran
    median_ratio = round(statistics.median(ratios), 4) if ratios else None
    ratio_of_totals = round(total_b / total_a, 4) if total_a > 0 else None
    out = {
        "protocol": "interleaved-paired",
        "sf": args.sf,
        "labels": {"a": args.label_a, "b": args.label_b},
        "n_common": len(common),
        "only_a": only_a,
        "only_b": only_b,
        "errors": errors,
        # the headline: the per-query paired-ratio median — each ratio
        # is its own window control, so no cross-run normalization is
        # needed
        "median_ratio": median_ratio,
        # totals recomputed from the per-query map (the r14 verdict's
        # stale-total finding: a consolidated total must never be a
        # carried-over field)
        "total_a": round(total_a, 3),
        "total_b": round(total_b, 3),
        "ratio_of_totals": ratio_of_totals,
        "queries": pairs,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("median_ratio", "total_a", "total_b",
                       "ratio_of_totals", "n_common")}))


if __name__ == "__main__":
    main()
