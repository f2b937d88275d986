"""Changelog MERGE (SCD-1 upsert) as a single-pass aggregation.

The reference engine is append-only (its JDBC sink is mode="append",
`processing/spark_stream.py:40-48` — it never updates state in
place); a lakehouse
deployment of the same pipelines needs MERGE: apply a changelog onto a
base snapshot, latest-writer-wins per key. Spark without a table
format (Delta/Iceberg) doesn't ship MERGE, so this operator spells out
the scale-correct plan — and deliberately NOT the textbook one:

- The obvious shape (rank each side with a window, full-outer join
  base vs. changes) scans the fact table twice and shuffles full rows
  twice. Instead, both sides compact in ONE aggregation pass:
  ``max_by(payload, CASE WHEN side THEN (ts, id) END)`` picks each
  side's latest row per key, because ``max_by`` skips rows whose
  ordering key is NULL — so one scan, map-side partial aggregation,
  and a single key-shuffle carrying at most two compacted payloads
  per key. No join at all.
- ``event_id`` breaks timestamp ties, making the winner
  order-independent (hash-stable across partitionings).

At 100 TB: one scan + one |keys|-sized exchange — strictly below the
two-scan/two-shuffle lower bound a naive MERGE pays, and the partial
aggregate absorbs skew (a hot key reduces to ≤2 rows per map task).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Snapshot boundary: events strictly before this instant form the
#: base state; the rest is the incoming changelog. Fixed literal so
#: the DuckDB oracle mirrors it exactly at every SF (the fixture's
#: event stream spans 2024-01-01 .. 2024-01-30 at all scales).
SNAPSHOT_CUT = "2024-01-11 00:00:00"


def upsert_scd1(events: DataFrame) -> DataFrame:
    """SCD-1 upsert: changelog (ts >= cut) merged onto base (ts < cut).

    Output: one row per live (user_id, event_type) key with the
    winning value, its timestamp, and the MERGE branch that produced
    it (``update`` = key in both sides, ``insert`` = changelog only,
    ``keep`` = base only).
    """
    cut = F.lit(SNAPSHOT_CUT).cast("timestamp")
    is_base = F.col("ts") < cut
    payload = F.struct("ts", "value")
    order_key = F.struct("ts", "event_id")

    state = events.groupBy("user_id", "event_type").agg(
        F.max_by(payload, F.when(is_base, order_key)).alias("base"),
        F.max_by(payload, F.when(~is_base, order_key)).alias("chg"),
    )
    return state.select(
        "user_id",
        "event_type",
        F.round(F.coalesce("chg.value", "base.value"), 6).alias("value"),
        F.coalesce("chg.ts", "base.ts").alias("as_of_ts"),
        F.when(F.col("chg").isNotNull() & F.col("base").isNotNull(), "update")
        .when(F.col("chg").isNotNull(), "insert")
        .otherwise("keep")
        .alias("op"),
    )


def scd2_history(events: DataFrame) -> DataFrame:
    """SCD-2 history build: the full type-2 dimension beside
    ``upsert_scd1``'s latest-wins flattening — every (user_id,
    event_type) attribute becomes a chain of versions with
    ``effective_from``/``effective_to`` validity ranges, the warehouse
    shape every as-of join and audit query reads.

    Real SCD-2 is change COMPRESSION, not one-row-per-event: an event
    whose value null-safe-equals the previous one extends the open
    version instead of opening a new one (gaps-and-islands). A running
    sum over the change flags labels each event with its version
    ordinal, one aggregation collapses the islands, and ``lead`` over
    the |versions| relation closes each range — ``effective_to`` is
    NULL on the open (current) version, by warehouse convention.

    Scale shape: the single wide exchange is the (user_id, event_type)
    hash partitioning, and it serves the change-flag window, the
    running sum, the island aggregation, and the lead window alike —
    Spark reuses the one sort order; the lead pass runs on versions,
    not events. Ties break on event_id so the chain is deterministic
    under any physical row order.
    """
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    flagged = events.select(
        "user_id", "event_type", "ts", "event_id", "value"
    ).withColumn(
        "chg",
        F.when(F.col("value").eqNullSafe(F.lag("value").over(w)), 0).otherwise(1),
    )
    islands = flagged.withColumn(
        "version_n", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    versions = islands.groupBy("user_id", "event_type", "version_n").agg(
        # every event in an island null-safe-equals the island's value
        # by construction, so min() IS the value (and both engines
        # agree on the all-NULL island: min of nothing is NULL)
        F.min("value").alias("value"),
        F.min("ts").alias("effective_from"),
        F.count(F.lit(1)).alias("n_events_in_version"),
    )
    wv = Window.partitionBy("user_id", "event_type").orderBy("version_n")
    return versions.select(
        "user_id",
        "event_type",
        F.col("version_n").cast("long").alias("version_n"),
        F.round("value", 6).alias("value"),
        "effective_from",
        F.lead("effective_from").over(wv).alias("effective_to"),
        F.lead("effective_from").over(wv).isNull().alias("is_current"),
        "n_events_in_version",
    )


def cdc_snapshot_diff(orders: DataFrame) -> DataFrame:
    """Derive a CDC changelog by diffing two table snapshots.

    The inverse of MERGE: given versions v1 and v2 of a keyed table,
    emit the insert/update/delete row set that transforms one into the
    other — what Delta's change-data-feed or a Debezium snapshot-diff
    produces, and the input every downstream incremental consumer
    (the ``upsert_scd1``/``merge_roundtrip`` write path) expects.

    The two versions are carved deterministically from the orders
    fixture so the operator needs no side-effecting setup: v1 drops
    keys ≡3 (mod 11), v2 drops keys ≡7 (mod 11) and re-prices keys
    ≡0 (mod 5) by exact-decimal ×1.10 (decimal(12,2)×decimal(3,2) —
    exact in both engines, no float rounding decision anywhere).
    Diff = one full-outer self-join on the key:

    - only in v2 → ``insert`` (before NULL),
    - only in v1 → ``delete`` (after NULL),
    - in both with different payload → ``update``,
    - identical rows are dropped (the no-op majority).

    100 TB posture: both sides are projections of the same source, so
    the plan is one scan feeding one key-shuffle full-outer join;
    with real table versions both sides would be bucketed/clustered on
    the key and the join exchange-free. Output is |changes|-sized —
    the whole point of CDC at scale.
    """
    base = orders.select("o_orderkey", F.col("o_totalprice").alias("price"))
    v1 = base.filter(F.pmod("o_orderkey", F.lit(11)) != 3).select(
        "o_orderkey", F.col("price").alias("before_price")
    )
    repriced = (
        F.col("price").cast("decimal(12,2)")
        * F.lit("1.10").cast("decimal(3,2)")
    ).cast("double")
    v2 = base.filter(F.pmod("o_orderkey", F.lit(11)) != 7).select(
        "o_orderkey",
        F.when(F.pmod("o_orderkey", F.lit(5)) == 0, repriced)
        .otherwise(F.col("price"))
        .alias("after_price"),
    )
    diff = v1.join(v2, "o_orderkey", "full_outer").select(
        "o_orderkey",
        "before_price",
        "after_price",
        F.when(F.col("before_price").isNull(), F.lit("insert"))
        .when(F.col("after_price").isNull(), F.lit("delete"))
        .when(F.col("before_price") != F.col("after_price"), F.lit("update"))
        .alias("op"),
    )
    return diff.filter(F.col("op").isNotNull())


def incremental_agg_maintain(events: DataFrame) -> DataFrame:
    """Incremental materialized-view maintenance — merge partial
    aggregates instead of recomputing from scratch.

    The continuous-aggregate mechanic (Timescale caggs / Materialize):
    the standing view holds per-group partials for the closed BASE
    slice; when the DELTA slice lands, only ITS partials are computed
    and the two partial relations merge algebraically — count and
    decimal sums add, min/max combine — so maintenance cost is
    O(delta + groups), never O(history). At 100 TB the base partials
    are a few rows per group; the raw history is never re-read (the
    plan scans each slice exactly once). Distinct-count is the
    non-algebraic odd one out — merge HLL sketches instead
    (hll_merge_check proves that path). The oracle aggregates the
    WHOLE table directly: equality pins merge-correctness.
    """
    cut = F.lit(SNAPSHOT_CUT).cast("timestamp")

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).alias("s"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )

    base = partials(events.filter(F.col("ts") < cut))
    delta = partials(events.filter(F.col("ts") >= cut))
    return (
        base.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("n").alias("n_rows"),
            F.sum("s").cast("double").alias("sum_value"),
            F.min("mn").alias("min_value"),
            F.max("mx").alias("max_value"),
        )
    )
