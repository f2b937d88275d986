#!/usr/bin/env python
"""Green-row ledger: makes the registry rotation policy self-enforcing.

The driver's per-round correctness gate covers only the first 50
``QUERIES`` entries (SURVEY §2.3, registry docstring). The contract is:
any query that is NEW, or whose implementation CHANGED since its last
green driver row, must sit inside that window. Round 5 violated this by
hand (5 late additions + a changed ``join_hash`` parked at the back);
this ledger + ``tests/test_rotation_policy.py`` make the violation a
test failure instead of a judge finding (VERDICT r5 "Next round" #2).

Ledger file: ``tools/green_ledger.json`` —
``{query: {"round": N, "kind": "hash"|"rows_only", "fingerprint": sha}}``.

Fingerprint = sha256 over the transitively-referenced package function
sources (operator + every same-package helper it calls, discovered via
``__globals__``), the referenced package constants, the input tables,
and the oracle SQL. Computed against the CURRENT working tree — so
ingest MUST run at round start, before any code edit, while HEAD is
exactly the code the driver verified.

Usage:
    python tools/green_ledger.py ingest CORRECTNESS_r06.json --round 6
    python tools/green_ledger.py check          # what the pytest runs
"""

from __future__ import annotations

import argparse
import ast
import hashlib
import importlib
import inspect
import json
import os
import re
import sys
import textwrap
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PKG = "big_data_trend_analysis_spark"
LEDGER_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "green_ledger.json")
#: Size of the driver's correctness window (first N registry entries).
#: Build rounds 1-11 verified only the first 50 registry entries per
#: round, hence the rotation policy that forced changed/new queries to
#: the front. From round 12 on (the OPTIMIZATION phase) the driver
#: re-runs EVERY declared query against the DuckDB oracle each round —
#: CORRECTNESS_r12+ covers the full inventory — so the window is the
#: whole registry and front-of-registry rotation is no longer the
#: re-verification mechanism. The ledger itself stays load-bearing as
#: the per-query fingerprint/green-round bookkeeping (`stale_or_new`
#: still reports exactly which queries the next driver run must prove).
WINDOW = 10_000

_NAME_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
_ATTR_RE = re.compile(r"([A-Za-z_][A-Za-z0-9_]*)\.([A-Za-z_][A-Za-z0-9_]*)")


def _body_imports(src: str, module: str) -> list:
    """Objects named by ``import``/``from X import Y`` statements anywhere in
    the source (including inside function bodies, which never reach
    ``__globals__`` — ADVICE r6: exact_sum/read_merged_schema were invisible
    to the fingerprint). Relative imports resolve against the function's
    package."""
    out = []
    try:
        tree = ast.parse(textwrap.dedent(src))
    except SyntaxError:
        return out
    package = module.rsplit(".", 1)[0] if "." in module else module
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom):
            name = "." * node.level + (node.module or "")
            try:
                mod = importlib.import_module(name, package=package)
            except Exception:
                continue
            for alias in node.names:
                obj = getattr(mod, alias.name, None)
                if obj is not None:
                    out.append(obj)
        elif isinstance(node, ast.Import):
            for alias in node.names:
                try:
                    out.append(importlib.import_module(alias.name))
                except Exception:
                    continue
    return out


def _const_repr(obj) -> str | None:
    """Stable repr for simple constants worth fingerprinting."""
    if isinstance(obj, (str, int, float, bool, bytes)):
        return repr(obj)
    if isinstance(obj, (tuple, list)) and all(
        isinstance(x, (str, int, float, bool, bytes)) for x in obj
    ):
        return repr(obj)
    if isinstance(obj, (set, frozenset)) and all(
        isinstance(x, (str, int, float, bool, bytes)) for x in obj
    ):
        return repr(sorted(obj))
    if isinstance(obj, dict) and all(
        isinstance(k, str) and isinstance(v, (str, int, float, bool, bytes))
        for k, v in obj.items()
    ):
        return repr(sorted(obj.items()))
    return None


def fingerprint(query_fn, oracle_sql: str | None) -> str:
    """Hash the transitive package-source closure of a registry entry."""
    impl = getattr(query_fn, "__query_impl__", None)
    if impl is not None:
        roots, tables = [impl[0]], impl[1]
    else:
        roots, tables = [query_fn], ()

    seen: set[tuple[str, str]] = set()
    sources: list[tuple[str, str]] = []
    consts: dict[str, str] = {}
    work = list(roots)
    while work:
        fn = work.pop()
        key = (getattr(fn, "__module__", "") or "", getattr(fn, "__qualname__", "") or "")
        if key in seen:
            continue
        seen.add(key)
        try:
            src = inspect.getsource(fn)
        except (TypeError, OSError):
            continue
        sources.append((f"{key[0]}.{key[1]}", src))
        g = dict(getattr(fn, "__globals__", {}))
        # Names bound by import statements inside the body (never in
        # __globals__) participate in the closure too (ADVICE r6).
        for obj in _body_imports(src, key[0] or PKG):
            nm = getattr(obj, "__name__", None)
            if nm:
                g.setdefault(nm, obj)
            if (inspect.isfunction(obj) or inspect.isclass(obj)) and (
                getattr(obj, "__module__", "") or ""
            ).startswith(PKG):
                work.append(obj)

        def _visit(tok: str, obj) -> None:
            if inspect.isfunction(obj) and (obj.__module__ or "").startswith(PKG):
                work.append(obj)
            elif inspect.isclass(obj) and (obj.__module__ or "").startswith(PKG):
                for _, meth in inspect.getmembers(obj, inspect.isfunction):
                    work.append(meth)
            else:
                rep = _const_repr(obj)
                if rep is not None and tok.isupper():
                    consts[f"{key[0]}.{tok}"] = rep

        for tok in set(_NAME_RE.findall(src)):
            obj = g.get(tok)
            if obj is None:
                continue
            _visit(tok, obj)
        # `mod.attr` references into package modules (e.g. dedup._materialize
        # after `from ..operators import dedup`) — resolve the attribute.
        for mod_tok, attr in set(_ATTR_RE.findall(src)):
            mod = g.get(mod_tok)
            if isinstance(mod, types.ModuleType) and mod.__name__.startswith(PKG):
                obj = getattr(mod, attr, None)
                if obj is not None:
                    _visit(attr, obj)

    h = hashlib.sha256()
    for name, src in sorted(sources):
        h.update(name.encode())
        h.update(b"\0")
        h.update(src.encode())
    for name, rep in sorted(consts.items()):
        h.update(name.encode())
        h.update(b"\0")
        h.update(rep.encode())
    h.update(("tables:" + ",".join(tables)).encode())
    h.update(("oracle:" + (oracle_sql or "")).encode())
    return h.hexdigest()


def _load_registry():
    from big_data_trend_analysis_spark.plans.registry import ORACLE_SQL, QUERIES

    return QUERIES, ORACLE_SQL


def load_ledger() -> dict:
    if not os.path.exists(LEDGER_PATH):
        return {}
    with open(LEDGER_PATH) as f:
        return json.load(f)


def stale_or_new(queries=None, oracle_sql=None) -> list[str]:
    """Names (registry order) lacking a green row for their CURRENT code."""
    if queries is None:
        queries, oracle_sql = _load_registry()
    ledger = load_ledger()
    out = []
    for name, fn in queries.items():
        entry = ledger.get(name)
        if entry is None or entry["fingerprint"] != fingerprint(fn, oracle_sql.get(name)):
            out.append(name)
    return out


def cmd_ingest(path: str, round_no: int, exclude: list[str]) -> None:
    queries, oracle_sql = _load_registry()
    with open(path) as f:
        rows = json.load(f)
    ledger = load_ledger()
    n_hash = n_rows = 0
    for name, row in rows.items():
        if name in exclude or name not in queries:
            continue
        if row.get("err") not in (None, "no_oracle"):
            continue
        if row.get("hash_match") is True:
            kind = "hash"
            n_hash += 1
        elif row.get("err") == "no_oracle" and row.get("spark_rows") is not None:
            kind = "rows_only"
            n_rows += 1
        else:
            continue
        ledger[name] = {
            "round": round_no,
            "kind": kind,
            "fingerprint": fingerprint(queries[name], oracle_sql.get(name)),
        }
    with open(LEDGER_PATH, "w") as f:
        json.dump(dict(sorted(ledger.items())), f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"ingested {n_hash} hash + {n_rows} rows-only green rows from {path} (round {round_no})")


def cmd_rehash() -> None:
    """Recompute every stored fingerprint against the CURRENT tree.

    Only sound while HEAD is exactly the code the driver verified (same
    precondition as ingest) — used to migrate the ledger when the
    fingerprint algorithm itself changes.
    """
    queries, oracle_sql = _load_registry()
    ledger = load_ledger()
    n = 0
    for name, entry in ledger.items():
        if name in queries:
            entry["fingerprint"] = fingerprint(queries[name], oracle_sql.get(name))
            n += 1
    with open(LEDGER_PATH, "w") as f:
        json.dump(dict(sorted(ledger.items())), f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"rehashed {n} ledger fingerprints against the current tree")


def cmd_check() -> int:
    queries, oracle_sql = _load_registry()
    names = list(queries)
    pending = stale_or_new(queries, oracle_sql)
    bad = [n for n in pending if names.index(n) >= WINDOW]
    print(f"{len(pending)} stale-or-new entries: {pending}")
    if bad:
        print(f"VIOLATION — outside the first {WINDOW}: {bad}")
        return 1
    print("rotation policy OK")
    return 0


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    ing = sub.add_parser("ingest")
    ing.add_argument("path")
    ing.add_argument("--round", type=int, required=True)
    ing.add_argument("--exclude", nargs="*", default=[])
    sub.add_parser("check")
    sub.add_parser("rehash")
    args = ap.parse_args()
    if args.cmd == "ingest":
        cmd_ingest(args.path, args.round, args.exclude)
    elif args.cmd == "rehash":
        cmd_rehash()
    else:
        sys.exit(cmd_check())


if __name__ == "__main__":
    main()
