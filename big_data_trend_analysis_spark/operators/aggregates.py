"""Aggregations: exact groupBy/agg core + sketch-based approximates.

Sketch parity with the reference (SURVEY.md §2.1 A1-A3):

- Count-Min Sketch: the reference hand-rolls a 10×1000 MD5 matrix in
  *driver* memory fed by ``collect()`` (``cms_stream.py:19-47,94-97``).
  Here: Spark's built-in ``count_min_sketch`` aggregate — a distributed,
  mergeable sketch that never leaves the executors.
- Flajolet-Martin distinct count: the reference MD5-hashes collected
  rows on the driver (``flajolent_stream.py:20-28,75-78``); estimate =
  2^(max trailing zeros), single hash function. Here:
  ``approx_count_distinct`` (HyperLogLog++), strictly better accuracy
  at the same cost model, fully distributed and mergeable.

Both keep an *exact twin* (``keyword_freq``/``distinct_count``) that the
DuckDB oracle hash-checks; the sketch versions get rows-only checks
plus property tests (tests/test_sketches.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from big_data_trend_analysis_spark.functions.numeric import PRICE_DEC, RATE_DEC, dec


def agg_basic(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1-shaped groupBy/agg (SURVEY §2.3 agg_basic).

    All measures are summed in exact decimal then surfaced as double —
    order-independent, so results are identical across any shuffle
    partitioning (and hash-match the oracle). Partial aggregation
    (map-side combine) applies: the shuffle carries one row per
    (flag, status) per map task, not per input row.
    """
    one = F.lit("1.00").cast("decimal(3,2)")
    disc_price = dec("l_extendedprice") * (one - dec("l_discount", RATE_DEC))
    charge = disc_price * (one + dec("l_tax", RATE_DEC))
    return (
        lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(dec("l_discount", RATE_DEC)).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def pivot_counts(events: DataFrame) -> DataFrame:
    """Per-user event-type counts pivoted to columns.

    The pivot values are declared explicitly (the fixture's event-type
    domain) so the plan is a single-pass conditional aggregation — no
    extra job to discover distinct values, which matters when the
    input is 100 TB. DuckDB twin: FILTER'd counts.
    """
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        events.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .select(
            "user_id",
            *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in types],
        )
    )


def percentile_agg(lineitem: DataFrame) -> DataFrame:
    """Exact interpolated percentiles of quantity per returnflag.

    ``percentile`` is the exact (sort-based) aggregate — the oracle
    twin of ``approx_percentile`` below; at 100 TB you run the sketch
    version and accept the documented error instead.
    """
    return lineitem.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("p50_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.95)), 6).alias("p95_qty"),
    )


def approx_percentile_agg(lineitem: DataFrame) -> DataFrame:
    """KLL-style approximate percentiles (rows-only; exact twin above)."""
    return lineitem.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", F.lit(0.5), F.lit(10000)).alias("p50_qty"),
        F.percentile_approx("l_quantity", F.lit(0.95), F.lit(10000)).alias("p95_qty"),
    )


def stats_moments(lineitem: DataFrame) -> DataFrame:
    """Second-moment statistics: stddev/variance/correlation/covariance.

    Spark computes these with single-pass co-moment merging (Chan et
    al.) — distributed and mergeable; rounded to 6dp for cross-engine
    stability of the last ulp.
    """
    return lineitem.groupBy("l_linestatus").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 6).alias("cov_qty_price"),
    )


def minmax_by(orders: DataFrame) -> DataFrame:
    """Per-customer argmax/argmin: the order ids of the priciest and
    cheapest orders (``max_by``/``min_by`` ≙ DuckDB arg_max/arg_min).

    Tie-safe on this data: (o_totalprice, o_orderkey) pairs are unique
    per customer at every SF (asserted by the oracle match itself).
    """
    return orders.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", F.struct("o_totalprice", "o_orderkey")).alias(
            "best_order"
        ),
        F.min_by("o_orderkey", F.struct("o_totalprice", "o_orderkey")).alias(
            "worst_order"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )


def multi_distinct(events: DataFrame) -> DataFrame:
    """Several COUNT(DISTINCT) over different columns in one query.

    Catalyst rewrites multi-distinct into a single Expand-based
    aggregation (one shuffle), not one job per distinct — worth
    asserting because the naive plan is N full passes.
    """
    return events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(F.to_date("ts")).alias("n_days"),
        F.count(F.lit(1)).alias("n_events"),
    )


def array_agg_sorted(events: DataFrame) -> DataFrame:
    """Deterministic collect: per-user sorted array of event types used.

    ``collect_set`` order is partition-dependent; sorting makes the
    array a canonical value. Surfaced as a CSV string because array
    columns round-trip differently through Arrow/pandas across engines
    (list vs ndarray), which would break value comparison even when the
    contents are identical.
    """
    return events.groupBy("user_id").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("event_type"))).alias("types_csv")
    )


def distinct_count(documents: DataFrame) -> DataFrame:
    """Exact distinct texts per source (FM's target quantity, A3)."""
    return documents.groupBy("source").agg(
        F.countDistinct("text").alias("n_distinct_texts")
    )


def approx_distinct(documents: DataFrame, rsd: float = 0.05) -> DataFrame:
    """HLL++ distinct texts per source (A3 parity; rows-only check)."""
    return documents.groupBy("source").agg(
        F.approx_count_distinct("text", rsd).alias("approx_distinct_texts")
    )


def approx_distinct_check(documents: DataFrame, rsd: float = 0.05) -> DataFrame:
    """Self-checking HLL++ accuracy invariant (hash-checked).

    One aggregation pass computes both the exact distinct count and the
    HLL++ estimate per source; the output carries the exact count plus
    ``approx_ok`` = |est − exact| / exact ≤ 3·rsd. The estimate is a
    pure function of the value multiset (register merge is max-based,
    so partition order cannot change it), making the boolean
    deterministic and oracle-matchable — the oracle asserts TRUE. This
    turns "the sketch ran" into "the sketch is accurate" in the driver
    gate.
    """
    agg = documents.groupBy("source").agg(
        F.countDistinct("text").alias("n_distinct_texts"),
        F.approx_count_distinct("text", rsd).alias("est"),
    )
    rel_err = F.abs(F.col("est") - F.col("n_distinct_texts")) / F.col(
        "n_distinct_texts"
    )
    return agg.select(
        "source", "n_distinct_texts", (rel_err <= 3 * rsd).alias("approx_ok")
    )


def approx_percentile_check(lineitem: DataFrame) -> DataFrame:
    """Self-checking KLL-percentile accuracy invariant (hash-checked).

    Exact interpolated percentiles (the oracle-matchable values) next
    to ``percentile_approx`` estimates, with ``p50_ok``/``p95_ok`` =
    |est − exact| ≤ 5% of the group's value range. accuracy=10000 gives
    rank error ~1e-4, far inside that band; the generous bound keeps
    the boolean stable under any sketch-merge order, so the oracle can
    assert TRUE without replicating Spark's sketch.
    """
    agg = lineitem.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("p50_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.95)), 6).alias("p95_qty"),
        F.percentile_approx("l_quantity", F.lit(0.5), F.lit(10000)).alias("p50_est"),
        F.percentile_approx("l_quantity", F.lit(0.95), F.lit(10000)).alias("p95_est"),
        F.min("l_quantity").alias("lo"),
        F.max("l_quantity").alias("hi"),
    )
    band = (F.col("hi") - F.col("lo")) * 0.05
    return agg.select(
        "l_returnflag",
        "p50_qty",
        "p95_qty",
        (F.abs(F.col("p50_est") - F.col("p50_qty")) <= band).alias("p50_ok"),
        (F.abs(F.col("p95_est") - F.col("p95_qty")) <= band).alias("p95_ok"),
    )


def probe_cms(spark, sketch_bytes: bytes, keys: list[str]) -> dict[str, int]:
    """Point-query a serialized ``count_min_sketch`` binary.

    Deserializes via Spark's own ``org.apache.spark.util.sketch
    .CountMinSketch`` (same wire format the aggregate emits) and probes
    each key — the serving-side half of the reference's CMS job
    (``cms_stream.py:42-47,110-116``), operating on a KB-sized sketch
    instead of the data.
    """
    jvm = spark._jvm
    stream = jvm.java.io.ByteArrayInputStream(bytes(sketch_bytes))
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(stream)
    return {k: int(cms.estimateCount(k)) for k in keys}


def probe_window_sketches(
    spark,
    sketches: DataFrame,
    keys: tuple[str, ...],
    sketch_col: str = "s",
    start_col: str = "window_start",
    window_range: tuple[str, str] | None = None,
    max_windows: int = 400,
) -> DataFrame:
    """Driver-side probe of per-window CMS binaries, with hard bounds.

    The probe is a SERVING step: it must collect sketch rows (KB each)
    to the driver, so the collection is explicitly bounded — an
    optional ``window_range`` filter (pushed into the plan, before any
    collect) plus a ``max_windows`` guard that RAISES rather than
    silently truncating or pulling an unbounded window set (at eps
    1e-3 a year of 10-minute windows is ~5 GB of sketches — a config
    error, not a workload). Returns one row per (window, key).
    """
    if window_range is not None:
        lo, hi = window_range
        sketches = sketches.filter(
            (F.col(start_col) >= F.lit(lo).cast("timestamp"))
            & (F.col(start_col) < F.lit(hi).cast("timestamp"))
        )
    rows = sketches.limit(max_windows + 1).collect()
    if len(rows) > max_windows:
        raise ValueError(
            f"probe_window_sketches: >{max_windows} windows in range; "
            "narrow window_range or raise max_windows explicitly"
        )
    out = [
        (getattr(r, start_col), key, est)
        for r in rows
        for key, est in probe_cms(spark, getattr(r, sketch_col), list(keys)).items()
    ]
    return spark.createDataFrame(
        out, f"{start_col} timestamp, event_type string, est_count long"
    )


def cms_window_probe(
    events: DataFrame,
    keys: tuple[str, ...] = ("click", "view", "purchase", "signup", "error"),
    window_width: str = "1 day",
    eps: float = 0.01,
    confidence: float = 0.99,
    seed: int = 42,
    window_range: tuple[str, str] | None = None,
    max_windows: int = 400,
) -> DataFrame:
    """Per-window CMS build + hot-key probe (reference ``cms_estimates``).

    The reference probes 5 hard-coded keywords against its driver
    matrix each batch (``cms_stream.py:110-116``); here each event-time
    window gets its own mergeable sketch built executor-side, and only
    the KB-sized sketch binaries reach the driver for probing — one row
    per window regardless of data volume, bounded by
    ``probe_window_sketches``'s range filter + ``max_windows`` guard.
    With width ≫ distinct keys the estimates equal exact counts (no
    collisions), which the DuckDB oracle pins — any future collision
    regression fails loudly.
    """
    spark = events.sparkSession
    sketches = events.groupBy(F.window("ts", window_width).alias("w")).agg(
        F.count_min_sketch(
            "event_type", F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias("s")
    ).select(F.col("w.start").alias("window_start"), "s")
    return probe_window_sketches(
        spark,
        sketches,
        keys,
        sketch_col="s",
        window_range=window_range,
        max_windows=max_windows,
    )


def cms_topk_sketch(
    documents: DataFrame,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """Count-Min Sketch over exploded tokens (A1 parity).

    One mergeable binary sketch per source: tokens never leave the
    executors (vs the reference's driver ``collect()`` loop). The
    reference's width-1000/depth-10 matrix corresponds to eps≈2.7e-3,
    δ≈e^-10; we use eps=1e-3, confidence .99. Deterministic: CMS adds
    commute, so the binary is stable under any row order.
    """
    tokens = documents.select(
        "source", F.explode(F.split("text", " ")).alias("token")
    )
    return tokens.groupBy("source").agg(
        F.count_min_sketch(
            "token", F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias("cms_sketch")
    )
