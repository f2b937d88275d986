#!/usr/bin/env python
"""Gate per-query RESOURCE regressions on deterministic bytes.

Seconds move with host CPU steal (r9: a driver bench run recorded
186.5 s against 147.2 s committed minima on identical code); shuffle
bytes written and peak execution memory do not. ``bench.py`` records
them per query in ``bench_bytes.json``; this tool diffs the working
tree's sidecar against the committed baseline (or any two files) and
fails on growth beyond the threshold.

Usage::

    python tools/bytes_regression.py                 # HEAD vs working tree
    python tools/bytes_regression.py old.json new.json [--ratio 1.5]

New queries (absent from the baseline) are reported, never failed —
they become the baseline on the next commit.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys

#: Growth below this many bytes never fails the gate — tiny fixture
#: queries jitter by a few KB of AQE bookkeeping between Spark runs.
ABS_FLOOR = 256 * 1024


def load(path: str) -> dict:
    with open(path) as f:
        return json.load(f).get("queries", {})


def load_git(rev: str, path: str) -> dict:
    out = subprocess.run(
        ["git", "show", f"{rev}:{path}"], capture_output=True, text=True
    )
    if out.returncode != 0:
        return {}
    return json.loads(out.stdout).get("queries", {})


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old", nargs="?", default=None)
    ap.add_argument("new", nargs="?", default="bench_bytes.json")
    ap.add_argument("--ratio", type=float, default=1.5)
    args = ap.parse_args()

    old = load(args.old) if args.old else load_git("HEAD", "bench_bytes.json")
    new = load(args.new)
    if not old:
        print("no baseline bytes — nothing to gate (first recording?)")
        return 0

    failures = []
    fresh = []
    for name, m in sorted(new.items()):
        base = old.get(name)
        if base is None:
            fresh.append(name)
            continue
        for key in ("shuffle_write_bytes", "peak_memory_bytes"):
            b, n = base.get(key, 0), m.get(key, 0)
            if n > max(b * args.ratio, b + ABS_FLOOR):
                failures.append(f"{name}.{key}: {b} -> {n} ({n / max(b, 1):.2f}x)")
    if fresh:
        print(f"{len(fresh)} new queries (no baseline): {fresh}")
    if failures:
        print(f"RESOURCE REGRESSIONS (> {args.ratio}x and > {ABS_FLOOR}B growth):")
        for f_ in failures:
            print(" ", f_)
        return 1
    print(f"bytes gate OK: {len(new)} queries within {args.ratio}x of baseline")
    return 0


if __name__ == "__main__":
    sys.exit(main())
