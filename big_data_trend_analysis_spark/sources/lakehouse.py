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

from pyspark.sql import Column, DataFrame, SparkSession
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


def zorder_column(
    df: DataFrame, cols: list[str], bits: int = 10
) -> Column:
    """Z-order (Morton) key over ``cols`` as a pure JVM expression.

    Each column is min/max-scaled into a ``bits``-bit bucket (one
    bounded 1-row aggregate collect for the bounds — the same
    corpus-size-independent pattern as the sketch/codebook trainers),
    then the bucket bits are interleaved:
    ``z = Σ_b Σ_d ((bucket_d >> b) & 1) << (b·ndims + d)``.
    Rows close in z are close in EVERY dimension, so sorting by z
    gives parquet row groups tight min/max ranges on all ``cols`` at
    once — selective filters on any single dimension skip row groups,
    where a plain sort only serves its leading column. All arithmetic
    is shift/and/add on longs — whole-stage-codegen'd, no UDF.
    """
    aggs = []
    for c in cols:
        aggs += [
            F.min(F.col(c).cast("double")).alias(f"mn_{c}"),
            F.max(F.col(c).cast("double")).alias(f"mx_{c}"),
        ]
    row = df.agg(*aggs).collect()[0]
    ndims = len(cols)
    top = (1 << bits) - 1
    parts = []
    for d, c in enumerate(cols):
        mn, mx = row[f"mn_{c}"], row[f"mx_{c}"]
        if mn is None or mx is None:
            raise ValueError(
                f"zorder_column: no numeric bounds for {c!r} — input is "
                "empty, or the column is all-null / not castable to double"
            )
        span = (mx - mn) or 1.0
        bucket = F.least(
            F.lit(top).cast("long"),
            F.floor((F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * top).cast(
                "long"
            ),
        )
        for b in range(bits):
            parts.append(
                F.shiftleft(
                    F.shiftright(bucket, b).bitwiseAND(F.lit(1)), b * ndims + d
                )
            )
    z = parts[0]
    for p in parts[1:]:
        z = z + p
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 10,
    n_files: int = 1,
    mode: str = "overwrite",
    block_size: int | None = None,
) -> None:
    """Write parquet clustered by the Z-order key of ``cols``.

    ``repartitionByRange`` on z gives file-level clustering (range
    filters on any dim touch a file subset); ``sortWithinPartitions``
    gives row-group-level clustering inside each file. The key column
    is dropped before the write — the layout, not the schema, carries
    it. ``block_size`` shrinks row groups for skip-granularity tests;
    leave it None in production (default ~128 MB groups).
    """
    out = df.withColumn("_z", zorder_column(df, cols, bits))
    out = (
        out.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
    writer = out.write.mode(mode)
    if block_size is not None:
        writer = writer.option("parquet.block.size", block_size)
    writer.parquet(path)


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
