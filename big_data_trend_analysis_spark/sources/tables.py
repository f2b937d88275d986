"""Parquet table catalog over the driver-generated test tables.

The batch-side equivalent of the reference's Kafka source (SURVEY.md
§2.1 S1): every streaming operator in this engine has a batch twin that
reads the same schema from parquet, which is what makes the whole
surface oracle-testable.

Scale posture: reads go through ``spark.read.parquet`` so the
vectorized reader, predicate pushdown, and column pruning apply. At
100 TB the same call reads a date-partitioned directory tree and
Catalyst prunes partitions from the WHERE clause; nothing in this
module would change.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Every table the driver materializes per scale factor (TESTDATA.md).
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _nano_ts_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) (footer-level probe).

    Spark has no TimestampType(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` these arrive as long
    nanoseconds and we restore TimestampType by integer-dividing to
    microseconds — the same truncation DuckDB applies, so both engines
    see identical event times. Footer metadata only: no data read.
    """
    import pyarrow as pa

    schema = pq.read_schema(path)
    return [
        field.name
        for field in schema
        if pa.types.is_timestamp(field.type) and field.type.unit == "ns"
    ]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one catalog table from ``{sf_dir}/{name}.parquet``."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Naive (non-UTC-adjusted) micros timestamps must read as TIMESTAMP,
    # not TIMESTAMP_NTZ: the engine's event-time semantics are LTZ under
    # a UTC session (session.py ENGINE_CONF), matching DuckDB's naive
    # read bit-for-bit while keeping ts predicates pushdown-eligible
    # (a post-read cast would defeat parquet filter pushdown).
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(path)
    for col in _nano_ts_columns(path):
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register catalog tables as temp views so ``spark.sql`` works."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_merged_schema(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet directory whose files span schema versions.

    A 100 TB table accumulates schema evolution (new telemetry columns
    appear mid-year); by default Spark takes ONE footer's schema and
    silently drops columns absent from it. ``mergeSchema`` unions the
    footers instead: rows from files predating a column surface it as
    null, and every file's columns are readable. Use for evolving
    ingest directories; the fixed-catalog ``load_table`` path skips the
    footer-merge cost.
    """
    return (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(path)
    )
