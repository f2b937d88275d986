"""Property-based tests (hypothesis) over the column-function semantics.

Each property drives the real Spark expressions on generated inputs and
checks an algebraic invariant — the SURVEY §5.2-4 layer beyond
fixed-fixture parity. Example counts are kept small because every
example is a Spark job.
"""

from __future__ import annotations

import datetime
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from big_data_trend_analysis_spark.functions.decay import decay_weight
from big_data_trend_analysis_spark.functions.text import quality_score
from big_data_trend_analysis_spark.operators.dedup import dedup_exact
from big_data_trend_analysis_spark.operators.skew import salted_join

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

ANCHOR = "2024-02-01 00:00:00"
ANCHOR_DT = datetime.datetime(2024, 2, 1)


@SETTINGS
@given(
    ages=st.lists(
        st.integers(min_value=0, max_value=10_000_000), min_size=1, max_size=30
    )
)
def test_decay_weight_matches_formula_and_bounds(spark, ages):
    rows = [(ANCHOR_DT - datetime.timedelta(seconds=a),) for a in ages]
    df = spark.createDataFrame(rows, "ts timestamp")
    got = [r.w for r in df.select(decay_weight("ts", ANCHOR).alias("w")).collect()]
    for age, w in zip(ages, got):
        # lower bound inclusive: exp underflows to exactly 0.0 for ages
        # beyond ~7.45e5 s at this rate (found by hypothesis)
        assert 0.0 <= w <= 1.0
        assert w == pytest.approx(math.exp(-0.1 * age / 60.0), rel=1e-12, abs=1e-300)
    # monotonic: older ⇒ smaller weight
    by_age = sorted(zip(ages, got))
    for (a1, w1), (a2, w2) in zip(by_age, by_age[1:]):
        if a1 < a2:
            assert w1 >= w2


@SETTINGS
@given(
    texts=st.lists(
        st.text(alphabet="abc ", min_size=1, max_size=12), min_size=1, max_size=25
    )
)
def test_dedup_exact_invariants(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup_exact(df).collect()
    # one survivor per distinct text, and it is the minimal doc_id
    assert len(out) == len(set(texts))
    expected = {}
    for i, t in enumerate(texts):
        expected.setdefault(t, i)
    assert {r.text: r.doc_id for r in out} == expected


@SETTINGS
@given(
    keys=st.lists(st.integers(min_value=0, max_value=3), min_size=1, max_size=40),
    buckets=st.integers(min_value=1, max_value=8),
)
def test_salted_join_equivalence_under_skew(spark, keys, buckets):
    large = spark.createDataFrame(
        [(k, i) for i, k in enumerate(keys)], "k int, row_id int"
    )
    small = spark.createDataFrame([(k, f"v{k}") for k in range(4)], "k int, v string")
    plain = large.join(small, "k").select("row_id", "v")
    salted = salted_join(large, small, on="k", buckets=buckets).select("row_id", "v")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


@SETTINGS
@given(
    words=st.lists(
        st.text(alphabet="abcdefgh", min_size=1, max_size=10),
        min_size=1,
        max_size=20,
    )
)
def test_quality_score_bounded(spark, words):
    df = spark.createDataFrame([(" ".join(words),)], "text string")
    q = df.select(quality_score("text").alias("q")).collect()[0].q
    assert 0.0 <= q <= 1.0
