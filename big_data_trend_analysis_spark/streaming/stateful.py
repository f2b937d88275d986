"""Custom stateful streaming: per-key decayed running scores.

The one capability in the reference that stock streaming aggregation
doesn't express directly: *cross-batch mutable state with custom update
logic* (the driver-resident CMS matrix, ``cms_stream.py:69,94-97``).
The Spark-native answer is ``applyInPandasWithState``: state lives in
the checkpointed state store, partitioned by key across executors,
updated with an arbitrary pandas function per micro-batch.

The operator here keeps, per token, an exponentially-decayed running
score (each batch: ``score ← score·decay + batch_count``) — the
"exponential decaying window" idea from the reference's README applied
to keyword frequency, with fault-tolerant distributed state instead of
a driver matrix lost on restart.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import StatefulProcessor
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("token", StringType()),
        StructField("decayed_score", DoubleType()),
        StructField("total_count", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("score", DoubleType()),
        StructField("count", LongType()),
    ]
)


def decayed_token_scores(
    tokens: DataFrame,
    decay: float = 0.9,
    token_col: str = "token",
) -> DataFrame:
    """Streaming per-token decayed running score via keyed state.

    Input: a *streaming* DataFrame with a token column. Each trigger,
    every token's state decays by ``decay`` and absorbs the batch's
    count; emits (token, decayed_score, total_count) rows in update
    mode. State is per-key in the state store: scales with distinct
    tokens per executor, not with throughput.
    """

    def update(
        key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch_count = sum(len(pdf) for pdf in batches)
        score, total = state.get if state.exists else (0.0, 0)
        score = score * decay + batch_count
        total = total + batch_count
        state.update((score, total))
        yield pd.DataFrame(
            {
                "token": [key[0]],
                "decayed_score": [float(score)],
                "total_count": [int(total)],
            }
        )

    return (
        tokens.groupBy(token_col)
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


class _DecayedScoreProcessor(StatefulProcessor):
    """StatefulProcessor for transformWithStateInPandas (Spark 4 API).

    Same recurrence as ``decayed_token_scores``: per key,
    ``score ← score·decay + batch_count``. State is a typed ValueState
    in the (RocksDB-backed) state store — checkpointed, partitioned by
    key, with optional TTL; the arbitrary-state successor Spark 4
    positions over ``applyInPandasWithState``.
    """

    def __init__(self, decay: float):
        self._decay = decay

    def init(self, handle) -> None:
        self._state = handle.getValueState("decay_state", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        batch_count = sum(len(pdf) for pdf in rows)
        score, total = self._state.get() if self._state.exists() else (0.0, 0)
        score = score * self._decay + batch_count
        total = total + batch_count
        self._state.update((float(score), int(total)))
        yield pd.DataFrame(
            {
                "token": [key[0]],
                "decayed_score": [float(score)],
                "total_count": [int(total)],
            }
        )

    def handleInitialState(self, key, initialState, timerValues) -> None:
        return None

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        yield from ()

    def close(self) -> None:
        return None


def decayed_token_scores_tws(
    tokens: DataFrame,
    decay: float = 0.9,
    token_col: str = "token",
) -> DataFrame:
    """``decayed_token_scores`` on the transformWithStateInPandas API.

    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass = …RocksDBStateStoreProvider``)
    — bundled with Spark, no extra jars; disk-backed state scales past
    executor heap, which is the 100 TB posture for billions of keys.
    """
    return tokens.groupBy(token_col).transformWithStateInPandas(
        statefulProcessor=_DecayedScoreProcessor(decay),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def tokens_from_text_stream(texts: DataFrame, text_col: str = "text") -> DataFrame:
    """Explode a streaming text column into tokens (A4 semantics)."""
    return texts.select(F.explode(F.split(F.col(text_col), " ")).alias("token"))


EXPIRING_OUTPUT_SCHEMA = StructType(
    [
        StructField("token", StringType()),
        StructField("decayed_score", DoubleType()),
        StructField("total_count", LongType()),
        StructField("expired", BooleanType()),
    ]
)


def expiring_token_scores(
    tokens: DataFrame,
    decay: float = 0.9,
    ttl_ms: int = 60_000,
    token_col: str = "token",
) -> DataFrame:
    """``decayed_token_scores`` with state EXPIRY: idle keys evict.

    The unbounded-key-space answer ``NoTimeout`` lacks: a token that
    stops arriving would otherwise hold state-store space forever (at
    100 TB/day of text the key space only grows). A processing-time
    timeout of ``ttl_ms`` per key lets the store self-clean — when a
    key sees no data for a full TTL, the next micro-batch fires its
    timeout branch, which emits a final ``expired=true`` tombstone row
    (the downstream signal to persist/drop the key) and removes the
    state. Live updates re-arm the clock.
    """

    def update(
        key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            score, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "token": [key[0]],
                    "decayed_score": [float(score)],
                    "total_count": [int(total)],
                    "expired": [True],
                }
            )
        else:
            batch_count = sum(len(pdf) for pdf in batches)
            score, total = state.get if state.exists else (0.0, 0)
            score = score * decay + batch_count
            total = total + batch_count
            state.update((score, total))
            state.setTimeoutDuration(ttl_ms)
            yield pd.DataFrame(
                {
                    "token": [key[0]],
                    "decayed_score": [float(score)],
                    "total_count": [int(total)],
                    "expired": [False],
                }
            )

    return tokens.groupBy(token_col).applyInPandasWithState(
        update,
        outputStructType=EXPIRING_OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
