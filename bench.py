#!/usr/bin/env python
"""Benchmark: run the declared query inventory and print ONE JSON line.

Contract (driver): run at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``, print
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

Execution is forced with the noop sink (full plan runs distributed; no
driver-side collect — the measured path is the one a cluster would run).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_trend_analysis_spark.plans.registry import QUERIES
from big_data_trend_analysis_spark.session import get_spark


def force(df) -> None:
    """Execute the full plan without moving data to the driver."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    only = sys.argv[1:] or sorted(QUERIES)

    spark = get_spark("bdta-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen once per table family on the smallest tier so
    # per-query times measure the queries, not first-run JIT/classloading.
    for warm in ("agg_basic", "streaming_decay_trend", "text_stats", "sim_search"):
        force(QUERIES[warm](spark, "/root/testdata/sf0.001"))

    # min-of-2: this host shows multi-second CPU-steal stalls (shared
    # VM); the min is the engine's actual cost, the stall is not.
    timings: dict[str, float] = {}
    for name in only:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            force(QUERIES[name](spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
