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
