#!/usr/bin/env python
"""Profile queries: wall seconds + job/stage/task counts.

Usage::

    python tools/profile_query.py q1 q2 ...        # sf0.1 default
    SPARK_GRAFT_SF_DIR=... PROFILE_REPS=3 python tools/profile_query.py ...

For each query: run PROFILE_REPS times (cache cleared each rep, like
bench.py) and report the best rep's wall seconds plus the number of
Spark jobs, stages and tasks it scheduled — separates
scheduling-bound queries (many stages/jobs, tiny tasks) from
compute-bound ones (few stages, high wall).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_trend_analysis_spark.plans.registry import QUERIES
from big_data_trend_analysis_spark.session import get_spark


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("PROFILE_REPS", "2"))
    spark = get_spark("bdta-profile")
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()
    bus = spark.sparkContext._jsc.sc().listenerBus()

    for warm in ("agg_basic", "sentiment_score"):
        force(QUERIES[warm](spark, "/root/testdata/sf0.001"))
    spark.catalog.clearCache()

    print(f"{'query':35s} {'wall_s':>7s} {'jobs':>5s} {'stages':>6s} {'tasks':>6s}")
    for name in names:
        best = None
        for _ in range(reps):
            spark.catalog.clearCache()
            bus.waitUntilEmpty(10_000)
            j0 = set(tracker.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            force(QUERIES[name](spark, sf_dir))
            wall = time.perf_counter() - t0
            bus.waitUntilEmpty(10_000)
            new_jobs = set(tracker.getJobIdsForGroup(None) or []) - j0
            stages = set()
            tasks = 0
            for j in new_jobs:
                info = tracker.getJobInfo(j)
                if info is None:
                    continue
                for s in info.stageIds:
                    if s in stages:
                        continue
                    stages.add(s)
                    si = tracker.getStageInfo(s)
                    if si is not None:
                        tasks += si.numCompletedTasks
            row = (wall, len(new_jobs), len(stages), tasks)
            if best is None or row[0] < best[0]:
                best = row
        print(f"{name:35s} {best[0]:7.3f} {best[1]:5d} {best[2]:6d} {best[3]:6d}")
    spark.stop()


if __name__ == "__main__":
    main()
