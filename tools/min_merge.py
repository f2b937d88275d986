#!/usr/bin/env python
"""Min-merge a fresh full bench pass into the committed floor sidecar.

The deliberate cross-pass step the per-run bench merge (replacement)
does not do: for queries whose CODE did not change between the passes,
the committed floor keeps the min (host steal never makes a query
faster); for queries named in --changed (code touched since the floor
was recorded), the FRESH value replaces the floor so regressions
surface.

Usage::

    python tools/min_merge.py floor.json fresh.json out.json \
        --changed q1 q2 ...
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    args = sys.argv[1:]
    changed: set[str] = set()
    if "--changed" in args:
        i = args.index("--changed")
        changed = set(args[i + 1 :])
        args = args[:i]
    floor_path, fresh_path, out_path = args
    with open(floor_path) as f:
        floor = json.load(f)
    with open(fresh_path) as f:
        fresh = json.load(f)
    fq, gq = floor["queries"], fresh["queries"]
    merged = {}
    for k in sorted(set(fq) | set(gq)):
        if k not in fq:
            merged[k] = gq[k]
        elif k not in gq:
            merged[k] = fq[k]
        elif k in changed:
            merged[k] = gq[k]
        else:
            merged[k] = min(fq[k], gq[k])
    body = {"sf": fresh.get("sf", floor.get("sf")), "queries": merged}
    body["value"] = round(sum(merged.values()), 3)
    with open(out_path, "w") as f:
        json.dump(body, f, indent=1, sort_keys=True)
    print(
        f"floor {floor.get('value')} + fresh {fresh.get('value')} -> "
        f"{body['value']} ({len(merged)} queries, {len(changed)} changed)"
    )


if __name__ == "__main__":
    main()
