"""Custom Python DataSource: the reference's synthetic generator, done
right.

Reference parity: S3 (`producer/fake_producer.py`) fabricates random
tweets on a single process and pushes them through Kafka; SURVEY §2.1
initially mapped it onto driver parquet fixtures. This module closes
the row with a REAL source implementation instead — Spark 4's Python
DataSource API (SPARK-44076): the generator runs ON THE EXECUTORS, one
deterministic slice per input partition, so synthesis scales with the
cluster instead of bottlenecking on one producer process.

Determinism contract (the correctness hook): every column is a pure
integer formula of the global row index ``k``::

    event_type = 'type_' || (k % 5)
    raw        = (k * 37) % 97          -- integer payload
    user_id    = (k * 13) % 50
    value      = raw / 10.0             -- derived display value

so a DuckDB ``range(0, n)`` relation reproduces the source exactly and
the oracle can hash-compare aggregates — the same trick the driver's
parquet fixtures rely on, but exercised through a pluggable source.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class SyntheticEventsReader(DataSourceReader):
    """Executor-side reader: partition ``i`` yields rows
    ``[i * n/parts, (i+1) * n/parts)`` — no coordination, no driver
    data path, deterministic under any scheduling order."""

    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", 10_000))
        self.parts = int(options.get("parts", 8))
        if self.n % self.parts:
            raise ValueError("n must be divisible by parts")

    def partitions(self):
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition):
        per = self.n // self.parts
        start = partition.value * per
        for k in range(start, start + per):
            raw = (k * 37) % 97
            yield (k, f"type_{k % 5}", raw, (k * 13) % 50, raw / 10.0)


class SyntheticEventsSource(DataSource):
    """`spark.read.format("bdta_synthetic")` — registered per session
    via :func:`register_synthetic_source`."""

    @classmethod
    def name(cls) -> str:
        return "bdta_synthetic"

    def schema(self) -> str:
        return (
            "event_id long, event_type string, raw long, "
            "user_id long, value double"
        )

    def reader(self, schema):
        return SyntheticEventsReader(self.options)


def register_synthetic_source(spark) -> None:
    """Idempotently register the source with a SparkSession."""
    spark.dataSource.register(SyntheticEventsSource)
