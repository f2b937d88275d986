"""Streaming CDC apply: a changelog stream merged into keyed serving
state, one micro-batch at a time.

The reference pipeline is append-only end to end (its JDBC sink is
``mode="append"`` — `processing/spark_stream.py:40-48` — state never
updates in place). The batch half of the engine already closes that
gap (`operators/merge.py` one-pass MERGE, `plans/registry.py`
``merge_roundtrip`` copy-on-write); this module closes the STREAMING
half — the ubiquitous production shape (Debezium/Hudi/Delta "apply
changes"): a change stream drains through ``foreachBatch`` and each
batch MERGEs into a keyed state table with latest-writer-wins
semantics.

Two properties make it CDC apply rather than a mere windowed upsert:

- **Out-of-order guard (precombine).** Change order is by business
  version ``(ts, event_id)``, NOT by arrival. A batch may deliver an
  OLDER version of a key than the state already holds (the gate drains
  an ``event_id % 3`` file split, so every key's versions scatter
  across micro-batches in non-time order by construction); the merge
  keeps ``max_by(payload, (ts, event_id))`` over state ∪ batch, so a
  late old version can never clobber newer state. This is Hudi's
  ``precombine`` / Delta CDF's version resolution.
- **Delete tombstones.** A delete is a change row, and it must be
  RETAINED in state (op and version), not just dropped: if the delete
  were removed outright, an older update arriving in a later batch
  would resurrect the key. Serving reads filter tombstones; a vacuum
  would age them out past the max expected lateness.

Scale posture: each micro-batch does one map-side-combined ``max_by``
over the batch (O(batch) → O(changed keys)) plus one state merge
shuffled on the key — state stays compacted at exactly one row per
ever-seen key, so batch cost is O(batch + |keys|), independent of
stream history length. State lands through a `sources/txnlog.py`
commit per batch — fresh file set + atomic manifest swap, which is
exactly how Delta/Hudi land this merge: readers see whole batch
states only, and every micro-batch's state stays readable by version
(time travel) until a vacuum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: State schema columns, in storage order.
STATE_COLS = ("user_id", "event_type", "event_id", "ts", "value", "is_del")


def changes_from_events(events: DataFrame) -> DataFrame:
    """Interpret the events relation as a CDC changelog.

    Key = (user_id, event_type); version = (ts, event_id); op =
    delete when ``event_id % 7 == 0`` (deterministic and
    oracle-expressible — a real feed carries an op column; ~1/7 of
    changes being deletes exercises the tombstone path at every SF).
    """
    return events.select(
        "user_id",
        "event_type",
        "event_id",
        "ts",
        "value",
        (F.pmod("event_id", F.lit(7)) == 0).alias("is_del"),
    )


def compact_latest(changes: DataFrame) -> DataFrame:
    """Latest change per key, one ``max_by`` pass (the merge.py shape:
    no window, no join — map-side partials absorb hot keys)."""
    payload = F.struct("event_id", "ts", "value", "is_del")
    return (
        changes.groupBy("user_id", "event_type")
        .agg(F.max_by(payload, F.struct("ts", "event_id")).alias("w"))
        .select("user_id", "event_type", "w.event_id", "w.ts", "w.value", "w.is_del")
    )


def cdc_apply_sink(state_path: str, applied_batches: list | None = None):
    """``foreachBatch`` function MERGEing each micro-batch into the
    transaction-logged state table at ``state_path``.

    Each batch lands as ONE atomic `sources/txnlog.py` commit: the
    merged state is written to a fresh per-commit file set (never
    overwriting the files just read — so no lineage break is needed)
    and the manifest swaps the previous snapshot for the new one
    exactly once. A serving reader positioned on version N sees batch
    N's complete state or batch N−1's — never a half-applied merge;
    this is the Delta/Hudi streaming-sink commit mechanic, and it
    gives state TIME TRAVEL for free (version k = state as of
    micro-batch k, superseded file sets retained until a vacuum).

    ``applied_batches`` (optional) collects batch ids on the driver —
    the gate uses its length to certify a real multi-batch drain.
    """
    from big_data_trend_analysis_spark.sources.txnlog import TxnLog

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if applied_batches is not None:
            applied_batches.append(batch_id)
        spark = batch.sparkSession
        log = TxnLog(state_path)
        merged = compact_latest(batch)
        prev = log.latest_version()
        if prev >= 0:
            state = log.read_snapshot(spark, prev).select(*STATE_COLS)
            merged = compact_latest(
                state.unionByName(merged.select(*STATE_COLS))
            )
        # Pin the CAS to the version we MERGED FROM: if a concurrent
        # writer lands prev+1 first, this commit must fail loudly
        # (FileExistsError → Spark retries the batch, which re-reads
        # the new latest) rather than silently dropping the peer's rows.
        log.write_commit(
            merged.select(*STATE_COLS),
            remove=log.manifest(prev)["files"] if prev >= 0 else [],
            expected_version=prev,
        )

    return _apply


def serve_live_state(spark, state_path: str, version: int | None = None) -> DataFrame:
    """Serving view of the applied state (tombstones filtered out) at
    the latest — or a pinned per-micro-batch — snapshot version."""
    from big_data_trend_analysis_spark.sources.txnlog import TxnLog

    return (
        TxnLog(state_path)
        .read_snapshot(spark, version)
        .filter(~F.col("is_del"))
        .drop("is_del")
    )
