"""Edge-case unit tests for the round-7 operator additions.

The oracle gate proves fixture-level equivalence; these tests pin the
corner semantics the fixtures cannot reach: BPE fixpoint on
pathological repeats, the synthetic source's partition contract,
Gini degenerate groups, expectation violations actually failing, the
posting-head cap, MAD boundary arithmetic, and the smoothing blend on
hand-computed numbers.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_bpe_merges_pathological_repeats(spark):
    """'aaaa…' words: 4 replace passes must reach the fixpoint of the
    ('a','a') merge — no ' a a ' substring may survive round 1's
    application (visible via round 2's argmax no longer being a/a)."""
    from big_data_trend_analysis_spark.operators.textstats import (
        bpe_merge_rounds,
    )

    docs = spark.createDataFrame(
        [(i, "aaaaaaaa aaaa") for i in range(20)], "doc_id long, text string"
    )
    rows = {r.round: r for r in bpe_merge_rounds(docs, rounds=2).collect()}
    assert rows[1].lhs == "a" and rows[1].rhs == "a"
    # After a full merge of 'a a' -> 'aa', round 2's best pair is over
    # 'aa' symbols; a leftover ' a a ' would have out-counted it.
    assert rows[2].lhs == "aa" and rows[2].rhs == "aa"


def test_bpe_tie_break_is_lexicographic(spark):
    from big_data_trend_analysis_spark.operators.textstats import (
        bpe_merge_rounds,
    )

    # 'xy' and 'ab' pairs occur with identical frequency: argmax must
    # pick ('a','b') — freq desc, then lexicographic lhs, rhs.
    docs = spark.createDataFrame(
        [(1, "xy ab"), (2, "xy ab")], "doc_id long, text string"
    )
    first = bpe_merge_rounds(docs, rounds=1).collect()[0]
    assert (first.lhs, first.rhs) == ("a", "b")


def test_synthetic_source_partition_contract(spark):
    from big_data_trend_analysis_spark.sources.synthetic import (
        register_synthetic_source,
    )

    register_synthetic_source(spark)
    df = (
        spark.read.format("bdta_synthetic")
        .option("n", "1000")
        .option("parts", "5")
        .load()
    )
    assert df.count() == 1000
    # ids are exactly 0..n-1 once each (partition slices disjoint+complete)
    agg = df.agg(
        F.count_distinct("event_id").alias("d"),
        F.min("event_id").alias("lo"),
        F.max("event_id").alias("hi"),
    ).collect()[0]
    assert (agg.d, agg.lo, agg.hi) == (1000, 0, 999)
    # the declared formula holds on a spot row
    row = df.filter(F.col("event_id") == 123).collect()[0]
    assert row.raw == (123 * 37) % 97
    assert row.user_id == (123 * 13) % 50
    assert row.event_type == f"type_{123 % 5}"


def test_synthetic_source_rejects_ragged_split(spark):
    from big_data_trend_analysis_spark.sources.synthetic import (
        register_synthetic_source,
    )

    register_synthetic_source(spark)
    with pytest.raises(Exception, match="divisible"):
        (
            spark.read.format("bdta_synthetic")
            .option("n", "1000")
            .option("parts", "7")
            .load()
            .count()
        )


def test_gini_degenerate_groups(spark):
    from big_data_trend_analysis_spark.operators.aggregates import (
        gini_by_group,
    )

    events = spark.createDataFrame(
        # 'flat': all equal -> gini 0; 'zero': all zeros -> defined 0;
        # 'skew': one holder of everything -> (n-1)/n
        [("flat", 5.0)] * 4
        + [("zero", 0.0)] * 3
        + [("skew", 0.0), ("skew", 0.0), ("skew", 0.0), ("skew", 9.0)],
        "event_type string, value double",
    )
    out = {r.event_type: r for r in gini_by_group(events).collect()}
    assert out["flat"].gini_r == 0.0
    assert out["zero"].gini_r == 0.0
    assert math.isclose(out["skew"].gini_r, 0.75, abs_tol=1e-6)


def test_expectations_fail_on_violations(spark):
    from big_data_trend_analysis_spark.operators.relational import (
        expectations_check,
    )

    lineitem = spark.createDataFrame(
        [(1, None, 0.5, "N"), (2, 3.0, 1.5, "Z")],
        "l_orderkey long, l_quantity double, l_discount double, l_returnflag string",
    )
    orders = spark.createDataFrame([(1,)], "o_orderkey long")
    res = {r.expectation: r for r in expectations_check(lineitem, orders).collect()}
    assert not res["row_count_min_1000"].passed
    assert res["quantity_not_null"].observed == 1
    assert not res["quantity_not_null"].passed
    assert res["discount_in_unit_range"].observed == 1
    assert res["returnflag_accepted"].observed == 1
    assert res["fk_orders_resolve"].observed == 1  # orderkey 2 is orphaned
    assert not res["fk_orders_resolve"].passed


def test_inverted_index_caps_posting_head_not_df(spark):
    from big_data_trend_analysis_spark.operators.textstats import (
        inverted_index_build,
    )

    docs = spark.createDataFrame(
        [(i, "common") for i in range(30)] + [(100, "rare")],
        "doc_id long, text string",
    )
    out = {r.term: r for r in inverted_index_build(docs, k=5).collect()}
    assert out["common"].df == 30  # exact df over the FULL list
    assert out["common"].postings_head == "0,1,2,3,4"  # capped, sorted
    assert out["common"].last_doc == 29
    assert out["rare"].postings_head == "100"


def test_anomaly_mad_flags_only_true_outliers(spark):
    from big_data_trend_analysis_spark.operators.aggregates import anomaly_mad

    vals = [10.0] * 5 + [11.0] * 5 + [1000.0]
    events = spark.createDataFrame(
        [("a", v) for v in vals], "event_type string, value double"
    )
    row = anomaly_mad(events).collect()[0]
    assert row.n_rows == 11
    assert row.med_r == 11.0  # 6th of 11 sorted values
    assert row.mad_r == 1.0  # absdevs sorted: 0 x5, 1 x5, 989 -> 6th = 1
    # cut = 3*1.4826*1 = 4.4478: only the 989 deviation crosses it
    assert row.n_outliers == 1


def test_target_encoding_shrinks_small_categories(spark):
    from big_data_trend_analysis_spark.operators.aggregates import (
        target_encoding,
    )

    lineitem = spark.createDataFrame(
        [("A", "O", 100.0)] * 99 + [("B", "O", 0.0)],
        "l_returnflag string, l_linestatus string, l_extendedprice double",
    )
    out = {r.l_returnflag: r for r in target_encoding(lineitem, m=10.0).collect()}
    mu = 99.0  # global mean
    # big category barely moves toward the prior...
    expect_a = (99 * 100.0 + 10.0 * mu) / (99 + 10.0)
    assert math.isclose(out["A"].enc_smooth, round(expect_a, 6), abs_tol=2e-6)
    # ...the 1-row category is pulled almost all the way to it
    expect_b = (0.0 + 10.0 * mu) / (1 + 10.0)
    assert math.isclose(out["B"].enc_smooth, round(expect_b, 6), abs_tol=2e-6)
    assert out["B"].enc_smooth > 80.0


def test_incremental_maintain_equals_direct_agg(spark):
    from big_data_trend_analysis_spark.operators.merge import (
        incremental_agg_maintain,
    )

    events = spark.createDataFrame(
        [
            ("x", "2024-01-05 00:00:00", 1.25),
            ("x", "2024-01-20 00:00:00", 2.75),  # lands in the delta slice
            ("y", "2024-01-01 00:00:00", 4.0),
        ],
        "event_type string, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.event_type: r for r in incremental_agg_maintain(events).collect()}
    assert out["x"].n_rows == 2 and out["x"].sum_value == 4.0
    assert out["x"].min_value == 1.25 and out["x"].max_value == 2.75
    assert out["y"].n_rows == 1 and out["y"].sum_value == 4.0


def test_user_growth_counts_each_user_once(spark):
    from big_data_trend_analysis_spark.operators.temporal import (
        user_growth_daily,
    )

    events = spark.createDataFrame(
        [
            (1, "2024-01-01 09:00:00"),
            (1, "2024-01-03 09:00:00"),  # returning: must NOT recount
            (2, "2024-01-01 10:00:00"),
            (3, "2024-01-03 10:00:00"),
        ],
        "user_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = user_growth_daily(events).orderBy("d0").collect()
    assert [(str(r.d0), r.new_users, r.cum_users) for r in rows] == [
        ("2024-01-01", 2, 2),
        ("2024-01-03", 1, 3),
    ]
