#!/usr/bin/env python3
"""Self-certifying leak scan: grep the repo's shippable surface for
anything that looks proprietary/internal, and emit a JSON artifact that
carries its OWN freshness proof (timestamp + file count + per-category
counts), so "0 hits" is verifiable as a fresh scan rather than a stale
file.

Usage: leakcheck.py [repo_root] [> LEAKCHECK_SELF.json]
"""
import json
import os
import re
import sys
import time

CATEGORIES = {
    "internal_host": r"\b[a-z0-9-]+\.(corp|internal|intranet)\.[a-z0-9.-]+",
    "cloud_bucket": r"\b(s3|gs|abfss?|wasbs?)://[a-z0-9][a-z0-9._-]+",
    "slack_link": r"\b[a-z0-9-]+\.slack\.com|slack://|#[a-z0-9-]*-(eng|team|internal)\b",
    "short_link": r"\bgo/[a-z0-9_-]{2,}\b",
    "api_key": r"\b(sk|pk|ghp|gho|xox[bap])[-_][A-Za-z0-9]{16,}",
    "aws_key": r"\bAKIA[0-9A-Z]{16}\b",
    "private_key": r"-----BEGIN [A-Z ]*PRIVATE KEY-----",
}

SCAN_DIRS = ["src", "bin", "scripts", "project"]
SCAN_EXTS = {".scala", ".py", ".sh", ".sbt", ".md", ".json", ""}


def scan(root):
    files, hits = 0, []
    targets = [os.path.join(root, d) for d in SCAN_DIRS]
    targets += [os.path.join(root, f) for f in os.listdir(root)
                if f.endswith((".md", ".sbt"))]
    seen = set()
    for target in targets:
        if not os.path.exists(target):
            continue
        walk = ([(os.path.dirname(target), [], [os.path.basename(target)])]
                if os.path.isfile(target) else os.walk(target))
        for dirpath, dirnames, filenames in walk:
            dirnames[:] = [d for d in dirnames if d != "target"]
            for fn in filenames:
                path = os.path.join(dirpath, fn)
                if path in seen:
                    continue
                seen.add(path)
                if os.path.splitext(fn)[1] not in SCAN_EXTS:
                    continue
                # the scanner's own pattern table matches itself
                if os.path.samefile(path, __file__):
                    continue
                try:
                    text = open(path, errors="replace").read()
                except OSError:
                    continue
                files += 1
                for cat, pat in CATEGORIES.items():
                    for m in re.finditer(pat, text):
                        line = text.count("\n", 0, m.start()) + 1
                        hits.append({"category": cat,
                                     "file": os.path.relpath(path, root),
                                     "line": line,
                                     "match": m.group(0)[:80]})
    return files, hits


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "."
    files, hits = scan(root)
    out = {
        "generated_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "n_files_scanned": files,
        "n_hits": len(hits),
        "categories": {c: sum(1 for h in hits if h["category"] == c)
                       for c in CATEGORIES},
        "hits": hits,
    }
    json.dump(out, sys.stdout, indent=2)
    print()
    sys.exit(1 if hits else 0)


if __name__ == "__main__":
    main()
