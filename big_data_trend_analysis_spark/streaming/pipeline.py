"""Reference-exact tweet EDW pipeline (batch-testable transformation).

Reproduces the reference's EDW micro-batch column pipeline
(``processing/edw_stream.py:64-105``) as a pure DataFrame transform:

    time_diff_sec = anchor − created_at            (edw_stream.py:78-81)
    weight        = exp(−RATE·Δt/HALF_LIFE)        (edw_stream.py:81-84)
    sentiment_score: ±1/0 from the label           (edw_stream.py:92-96)
    weighted_sentiment = weight·score              (edw_stream.py:97-100)
    + processing_time, batch_id                    (edw_stream.py:103-104)
    − drop intermediates                           (edw_stream.py:105)

Documented divergences (SURVEY.md §7.3): the anchor is a parameter
(reference: driver ``datetime.now()``, untestable), and the label
comparison is case-normalized (reference compares lowercase against
producer-cased labels, so every score is 0.0 — a bug we fix, not
replicate).

Output schema matches the reference's serving table
``twitter_sentiment_edw`` (DDL at edw_stream.py:10-19; FIXTURES.md A.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from big_data_trend_analysis_spark.functions.decay import (
    DECAY_RATE,
    HALF_LIFE,
    decay_weight,
)
from big_data_trend_analysis_spark.functions.scoring import sentiment_label_score


def edw_transform(
    tweets: DataFrame,
    anchor: str,
    batch_id: int = 0,
    rate: float = DECAY_RATE,
    half_life: float = HALF_LIFE,
) -> DataFrame:
    """tweet rows → decay-weighted serving rows (reference EDW parity)."""
    weighted = (
        tweets.withColumn(
            "weight", decay_weight("created_at", anchor, rate, half_life)
        )
        .withColumn("sentiment_score", sentiment_label_score("sentiment"))
        .withColumn("weighted_sentiment", F.col("weight") * F.col("sentiment_score"))
        .withColumn("processing_time", F.lit(anchor).cast("timestamp"))
        .withColumn("batch_id", F.lit(batch_id).cast("long"))
    )
    return weighted.drop("sentiment_score")
