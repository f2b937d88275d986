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
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

WriteFn = Callable[[DataFrame, int], None]


#: Write mode every serving append uses (reference K1 semantics:
#: per-batch INSERT, never overwrite — spark_stream.py:47).
JDBC_APPEND_MODE = "append"


def jdbc_connection_options(
    url: str,
    table: str,
    user: str,
    password: str,
    driver: str = "org.postgresql.Driver",
) -> dict[str, str]:
    """The exact JDBC scan/write option set the reference pins
    (spark_stream.py:40-48: url/dbtable/user/password/driver). Factored
    pure so the sandbox (no Postgres) can contract-test the wiring the
    executable path can't reach.
    """
    return {
        "url": url,
        "dbtable": table,
        "user": user,
        "password": password,
        "driver": driver,
    }


#: Optional external JDBC serving target. Set ``JDBC_URL`` (e.g.
#: ``jdbc:postgresql://localhost:5432/bdta?user=bdta&password=bdta&``
#: ``stringtype=unspecified``) to aim the serving-sink tests at a real
#: Postgres — ``stringtype=unspecified`` lets the PG driver coerce the
#: text ``props`` column into a JSONB target column server-side (the
#: reference's JSONB mapping, edw_stream.py:14). Unset (the container
#: default), callers fall back to embedded Derby.
JDBC_URL_ENV = "JDBC_URL"
JDBC_DRIVER_ENV = "JDBC_DRIVER"


def jdbc_target_from_env(
    default_url: str,
    default_driver: str = "org.apache.derby.iapi.jdbc.AutoloadedDriver",
) -> tuple[str, str, bool]:
    """Resolve the serving-database target: ``(url, driver,
    is_external)``.

    The dialect matrix in one switch: an environment with a real
    warehouse exports ``JDBC_URL`` (+ optionally ``JDBC_DRIVER``,
    defaulting to Postgres) and every JDBC test/sink runs against it;
    this container resolves to the embedded-Derby default. Type
    mapping across the two dialects (README "JDBC serving targets"):
    DOUBLE and BIGINT are IEEE/64-bit in both; the JSON side-channel
    column is plain VARCHAR in Derby and JSONB in Postgres via
    ``createTableColumnTypes`` + ``stringtype=unspecified``.
    """
    import os

    url = os.environ.get(JDBC_URL_ENV)
    if url:
        driver = os.environ.get(JDBC_DRIVER_ENV, "org.postgresql.Driver")
        return url, driver, True
    return default_url, default_driver, False


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
    options = jdbc_connection_options(url, table, user, password, driver)

    def write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.format("jdbc").options(**options).mode(
            JDBC_APPEND_MODE
        ).save()

    return write


def serialize_for_kafka(batch_df: DataFrame) -> DataFrame:
    """Rows → single JSON ``value`` column (reference K2 wire format).

    The executable half of the Kafka sink: the reference serializes
    dict→JSON→UTF-8 on a host Python process (fake_producer.py:38-41);
    here executors serialize with ``to_json(struct(*))``. Runs fine
    without a broker, so tests pin the wire format even though the
    publish itself needs the connector jar.
    """
    from pyspark.sql import functions as F

    return batch_df.select(F.to_json(F.struct(*batch_df.columns)).alias("value"))


def kafka_sink_options(bootstrap_servers: str, topic: str) -> dict[str, str]:
    """Kafka producer options (reference K2). Factored pure for
    contract tests — no broker or connector jar in the sandbox."""
    return {"kafka.bootstrap.servers": bootstrap_servers, "topic": topic}


def kafka_json_writer(
    bootstrap_servers: str,
    topic: str,
) -> WriteFn:
    """Kafka producer sink (reference K2: JSON-serialized rows → topic).

    JSON serialization happens executor-side (``serialize_for_kafka``),
    one producer per partition. Requires the spark-sql-kafka connector
    jar.
    """
    options = kafka_sink_options(bootstrap_servers, topic)

    def write(batch_df: DataFrame, batch_id: int) -> None:
        serialize_for_kafka(batch_df).write.format("kafka").options(**options).save()

    return write


def parquet_append_writer(path: str) -> WriteFn:
    """Test/lakehouse sink: append the batch to a parquet directory.

    Blind append: under foreachBatch's at-least-once contract a batch
    RETRY duplicates rows. Use ``parquet_idempotent_writer`` when the
    sink must show each batch's rows exactly once after replay.
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(path)

    return write


def parquet_idempotent_writer(path: str) -> WriteFn:
    """Idempotent batch sink: each batch overwrites its own
    ``batch_id=N`` directory.

    foreachBatch delivers each batch at-least-once (a crash between the
    sink write and the checkpoint commit replays the batch), so blind
    appends duplicate on retry. Keying the write by the checkpointed
    ``batch_id`` and OVERWRITING makes replay land on the same path —
    the standard exactly-once-EFFECT recipe for file sinks. Readers
    scan the root; Spark surfaces ``batch_id`` as a partition column.
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

    return write


def jdbc_idempotent_writer(
    url: str,
    table: str,
    user: str,
    password: str,
    driver: str = "org.postgresql.Driver",
    batch_id_col: str = "batch_id",
) -> WriteFn:
    """Exactly-once-EFFECT JDBC sink: delete-then-append keyed by batch.

    The JDBC analog of ``parquet_idempotent_writer``: each batch's rows
    carry the checkpointed ``batch_id``, and a replayed batch first
    DELETEs its own ``batch_id`` slice (a driver-side statement via the
    JVM's DriverManager — row data never moves through it) before the
    executors append. A crash between append and checkpoint commit then
    replays onto a clean slate instead of duplicating — the upgrade
    over the reference's blind ``mode("append")``
    (spark_stream.py:40-48). Requires ``table`` to exist (the DELETE
    needs it); first-run table creation stays with the blind append
    path or DDL migration.
    """
    options = jdbc_connection_options(url, table, user, password, driver)

    def write(batch_df: DataFrame, batch_id: int) -> None:
        jvm = batch_df.sparkSession._jvm
        jvm.java.lang.Class.forName(driver)
        conn = jvm.java.sql.DriverManager.getConnection(url, user, password)
        try:
            stmt = conn.createStatement()
            # Spark's JDBC writer creates columns with quoted (case-
            # preserved) identifiers — quote the same way here.
            stmt.executeUpdate(
                f'DELETE FROM {table} WHERE "{batch_id_col}" = {int(batch_id)}'
            )
            stmt.close()
        finally:
            conn.close()
        batch_df.withColumn(batch_id_col, F.lit(batch_id).cast("long")).write.format(
            "jdbc"
        ).options(**options).mode(JDBC_APPEND_MODE).save()

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
