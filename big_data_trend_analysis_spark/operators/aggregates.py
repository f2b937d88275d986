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
