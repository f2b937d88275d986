"""Skew-mitigation utilities: salted joins and hot-key isolation.

AQE's skew-join splitting (on by default in session.py) handles most
skew at runtime by splitting oversized shuffle partitions. These
helpers cover the cases AQE can't: joins where one *key* is so hot that
a single key exceeds an executor (AQE can split a partition, not a
key's hash bucket on the build side).

``salted_join`` is the classic construction: the large side's rows get
a deterministic salt in [0, n); the small side is replicated n times;
the join key becomes (key, salt). Row multiplicity is preserved
exactly, so the result is bit-identical to the unsalted join — only the
shuffle distribution changes (each hot key now spreads over n reduce
partitions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, id_cols: list[str], buckets: int, out: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, buckets) from the given identity columns.

    xxhash64-based (not ``rand()``): stable across retries and
    partitionings, so salted plans stay replayable/checkpointable.
    """
    return df.withColumn(
        out, F.pmod(F.xxhash64(*[F.col(c) for c in id_cols]), F.lit(buckets)).cast("int")
    )


def replicate(df: DataFrame, buckets: int, out: str = "_salt") -> DataFrame:
    """Replicate every row once per salt value (small/build side)."""
    return df.withColumn(
        out, F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    buckets: int = 8,
    how: str = "inner",
    large_id_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-join with the hot-key shuffle spread over ``buckets`` salts.

    ``large_id_cols`` defaults to all of the large side's columns — any
    columns that vary per row work; they only feed the salt hash.
    Result equals ``large.join(small, on, how)`` exactly (tested in
    tests/test_scale_utils.py).
    """
    ids = large_id_cols or large.columns
    salted_large = with_salt(large, ids, buckets)
    salted_small = replicate(small, buckets)
    joined = salted_large.join(salted_small, [on, "_salt"], how)
    return joined.drop("_salt")


#: Literal event-type weight dimension for the skew showcase query —
#: the archetypal hot-key join: every events row carries one of five
#: event_type values, so the unsalted shuffle lands the whole table in
#: five reduce buckets.
EVENT_TYPE_WEIGHTS: tuple[tuple[str, float], ...] = (
    ("click", 1.0),
    ("view", 0.5),
    ("purchase", 10.0),
    ("signup", 5.0),
    ("error", -2.0),
)


def join_skewed(events: DataFrame, buckets: int = 8) -> DataFrame:
    """Hot-key join through ``salted_join``, aggregated to a bounded result.

    events (large, 5 distinct join keys → maximal skew) ⋈ the literal
    weight dim on event_type, with the shuffle spread over ``buckets``
    salts; then a per-type aggregate of the weighted value. The result
    is bit-identical to the unsalted join (the oracle computes exactly
    that), proving salting changes only the shuffle distribution —
    which is the property that keeps a 100 TB hot-key join off a single
    reducer.
    """
    spark = events.sparkSession
    dim = spark.createDataFrame(
        list(EVENT_TYPE_WEIGHTS), "event_type string, weight double"
    )
    joined = salted_join(
        events, dim, on="event_type", buckets=buckets, large_id_cols=["event_id"]
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.round(F.col("value") * F.col("weight"), 6).cast("decimal(28,6)")
        )
        .cast("double")
        .alias("weighted_value"),
    )


def hot_keys(df: DataFrame, key: str, min_count: int) -> DataFrame:
    """Keys whose frequency exceeds ``min_count`` (skew census).

    One aggregation pass; feed the result to a two-path plan (broadcast
    the hot-key slice, shuffle the rest) when even salting is too
    coarse.
    """
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )
