#!/usr/bin/env python
"""Capture .explain("formatted") for named queries into plans/r12/.

Usage::

    python tools/capture_plans.py before q1 q2 ...   # -> plans/r12/<q>_before.txt
    python tools/capture_plans.py after  q1 q2 ...   # -> plans/r12/<q>_after.txt

Captures at sf0.1 (the bench tier) with the engine session, so the
plan shapes match what the bench times. AQE initial plans are what
``explain`` can show pre-execution; the Exchange count / join strategy
/ PushedFilters / ReadSchema facts the round-12 optimization notes
cite are all visible there.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_trend_analysis_spark.plans.registry import QUERIES
from big_data_trend_analysis_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("PLANS_ROUND", "r13"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("bdta-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_exchange = plan.count("Exchange")
        print(f"{name}: {len(plan)} chars, {n_exchange} Exchange -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
