"""Streaming sinks: foreachBatch with error side-channel, JDBC serving.

Reference parity (K1/K3/M1, SURVEY.md §2.1): per-micro-batch append to
an external store, with failures captured as (batch_id, error,
error_time) rows in a side table instead of crashing the query
(``edw_stream.py:113-136``). Differences by design:

- explicit ``checkpointLocation`` (the reference uses a temp
  checkpoint and silently loses its position on restart);
- the serving write is a pluggable callable, so tests use parquet and
  production uses JDBC with the exact options the reference pins.
"""

from __future__ import annotations

import datetime
import traceback
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

WriteFn = Callable[[DataFrame, int], None]


def jdbc_append_writer(
    url: str,
    table: str,
    user: str,
    password: str,
    driver: str = "org.postgresql.Driver",
) -> WriteFn:
    """Serving-layer JDBC append (reference K1, spark_stream.py:40-48).

    Executors open the JDBC connections (one per partition) — the
    driver never touches row data. Scale note: cap write parallelism
    upstream with ``coalesce`` if the target DB can't take one
    connection per shuffle partition.
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.format("jdbc")
            .option("url", url)
            .option("dbtable", table)
            .option("user", user)
            .option("password", password)
            .option("driver", driver)
            .mode("append")
            .save()
        )

    return write


def kafka_json_writer(
    bootstrap_servers: str,
    topic: str,
) -> WriteFn:
    """Kafka producer sink (reference K2: JSON-serialized rows → topic).

    The reference serializes dict→JSON→UTF-8 on a host Python process
    (fake_producer.py:38-41); here the executors serialize with
    ``to_json(struct(*))`` and publish in parallel, one producer per
    partition. Requires the spark-sql-kafka connector jar.
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        (
            batch_df.select(
                F.to_json(F.struct(*batch_df.columns)).alias("value")
            )
            .write.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("topic", topic)
            .save()
        )

    return write


def parquet_append_writer(path: str) -> WriteFn:
    """Test/lakehouse sink: append the batch to a parquet directory."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(path)

    return write


def foreach_batch_with_errors(
    write: WriteFn,
    on_error: WriteFn | None = None,
) -> Callable[[DataFrame, int], None]:
    """Wrap a batch writer with the reference's error side-channel (K3).

    On write failure the batch's error row goes to ``on_error`` (e.g. a
    ``processing_errors`` table writer) and the stream keeps running —
    reference semantics (edw_stream.py:124-136). Empty batches are
    skipped (reference F1 empty-batch guard).
    """

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        try:
            write(batch_df, batch_id)
        except Exception as exc:  # noqa: BLE001 - side-channel by design
            if on_error is None:
                raise
            error_row = batch_df.sparkSession.createDataFrame(
                [
                    (
                        batch_id,
                        f"{exc}\n{traceback.format_exc(limit=3)}",
                        datetime.datetime.now(datetime.timezone.utc),
                    )
                ],
                "batch_id long, error string, error_time timestamp",
            )
            on_error(error_row, batch_id)

    return handle


def start_foreach_batch(
    df: DataFrame,
    write: WriteFn,
    checkpoint_dir: str,
    on_error: WriteFn | None = None,
    trigger_available_now: bool = False,
    processing_time: str | None = None,
) -> StreamingQuery:
    """writeStream.foreachBatch with checkpointing (reference M1, fixed).

    ``trigger_available_now=True`` drains all available input then
    stops — the batch-parity/testing mode; ``processing_time`` sets a
    paced trigger for steady-state serving.
    """
    writer = df.writeStream.foreachBatch(
        foreach_batch_with_errors(write, on_error)
    ).option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
