"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``big_data_trend_analysis_spark`` (see
SURVEY.md §2.3 for the declared inventory and §7 for the build plan);
this module is a thin adapter.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make the engine importable regardless of the driver's CWD.
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7.1): decay-weighted event-type trend.

    Composes the reference's entire semantic pipeline — scan, JSON
    parse, conditional scoring, exponential decay weighting, windowed
    aggregation, ordering — as one deterministic batch query at
    sf0.001.
    """
    from big_data_trend_analysis_spark.plans.registry import QUERIES

    return QUERIES["streaming_decay_trend"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.3."""
    from big_data_trend_analysis_spark.plans.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query (others rows-only)."""
    from big_data_trend_analysis_spark.plans.registry import ORACLE_SQL

    return dict(ORACLE_SQL)
