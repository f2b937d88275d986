"""Lakehouse layout writers: date-partitioned and bucketed tables.

The physical-layout half of the 100 TB posture (SURVEY.md §4.2 "lay
out event data partitioned by date"):

- **Date partitioning** turns time-range predicates into directory
  pruning — a year-long table scanned for one day reads 1/365th of the
  files, before any row is decoded.
- **Bucketing** pre-shuffles a table by its join key at write time; two
  tables bucketed the same way join with zero Exchange at read time —
  the reusable-partitioning answer for fact⋈fact joins too big to
  broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_date_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str,
    mode: str = "overwrite",
    files_per_date: int = 1,
) -> None:
    """Write parquet partitioned by the date of ``ts_col``.

    Queries filtering on ``p_date`` (or on ``ts_col`` ranges rewritten
    to ``p_date`` ranges) hit Catalyst partition pruning — verify via
    ``PartitionFilters`` in the scan node.

    File-count contract: the input is repartitioned on ``p_date`` before
    ``partitionBy``, so each date lands in exactly one shuffle partition
    and the output is at most ``files_per_date`` files per date directory
    — O(dates), NOT O(upstream_tasks × dates). Without this, every
    upstream task writes a sliver into every date directory (the classic
    small-files catastrophe: thousands of tasks × 365 dates at 100 TB).
    Raise ``files_per_date`` when a single date exceeds a healthy file
    size (~1 GB parquet) — e.g. ``ceil(bytes_per_date / 1 GiB)``; the
    extra files come from a deterministic row-hash salt, so the layout
    stays reproducible.
    """
    if files_per_date < 1:
        raise ValueError(f"files_per_date must be >= 1, got {files_per_date}")
    out = df.withColumn("p_date", F.to_date(F.col(ts_col)))
    if files_per_date == 1:
        out = out.repartition("p_date")
    else:
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(files_per_date)
        )
        out = out.repartition(F.col("p_date"), salt)
    out.write.mode(mode).partitionBy("p_date").parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed (and optionally sorted) managed table.

    Both sides of a co-located join must use the same ``bucket_col``
    semantics and ``n_buckets``; Spark then plans SortMergeJoin with no
    Exchange on either side (asserted in tests/test_scale_utils.py).
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)
