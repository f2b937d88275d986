#!/usr/bin/env python
"""Targeted driver-contract oracle diff: verify named queries only.

Same methodology as the full driver simulation (stock session,
foreign-CWD-safe, DuckDB oracle at sf0.01, order-insensitive
sorted-column compare, floats via %.10g) but restricted to the
queries named on argv — the fast per-commit check while optimizing a
handful of operators. The full 304-query sweep stays the per-batch
gate (.claude/skills/verify/verify_driver.py).

Usage::

    python tools/verify_queries.py sql_tpch_q2 sql_tpch_q11 ...
    SPARK_GRAFT_VERIFY_SF=/root/testdata/sf0.001 python tools/verify_queries.py ...
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

SF = os.environ.get("SPARK_GRAFT_VERIFY_SF", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                vals.append("%.10g" % v)
            elif isinstance(v, (bytes, bytearray)):
                vals.append(v.hex())
            else:
                vals.append(str(v))
        out.append("\x01".join(vals))
    out.sort()
    return [cols[i] for i in order], out


def main() -> None:
    names = sys.argv[1:]
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(here, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    Q, O = mod.queries(), mod.oracle_sql()
    fails = []
    for name in names:
        try:
            sdf = Q[name](spark, SF)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if name not in O:
                print(f"ROWSONLY {name}: {len(srows)} rows", flush=True)
                continue
            cur = con.execute(O[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            sc, sv = canon(scols, srows)
            oc, ov = canon(ocols, orows)
            ok = len(sv) == len(ov) and sc == oc and sv == ov
            if not ok:
                fails.append(name)
                print(
                    f"MISMATCH {name}: rows {len(sv)}/{len(ov)} "
                    f"schema_ok={sc == oc}",
                    flush=True,
                )
                for a, b in [(a, b) for a, b in zip(sv, ov) if a != b][:3]:
                    print(f"   spark: {a[:200]}\n   duck : {b[:200]}", flush=True)
            else:
                print(f"MATCH {name}: {len(sv)} rows", flush=True)
        except Exception as e:  # noqa: BLE001 — report-and-continue harness
            fails.append(name)
            print(f"ERROR {name}: {type(e).__name__}: {str(e)[:300]}", flush=True)
    print(json.dumps({"total": len(names), "failed": fails}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()


