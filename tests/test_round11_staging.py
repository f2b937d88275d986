"""Round-11 statistics-tier tests.

Staged in round 10 as library code (the driver window had closed
full), REGISTERED in round 11: t_crit_975 now gates ab_test_welch,
holt_winters_dow and isotonic_daily_fit are oracle-backed registry
entries, and the ADVICE-r10 fixes (surviving-replicate bootstrap
indices, nullable-FK referential integrity, range-partitioned rank
statistics) are pinned here.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from big_data_trend_analysis_spark.functions.stats import (
    t_crit_975,
    t_crit_975_sql,
)

#: Two-sided 5% t-table values (Abramowitz & Stegun table 26.10).
T_TABLE = {
    2: 4.3027,
    3: 3.1824,
    4: 2.7764,
    5: 2.5706,
    8: 2.3060,
    10: 2.2281,
    15: 2.1314,
    30: 2.0423,
    60: 2.0003,
    120: 1.9799,
}


def test_t_crit_matches_table_and_duckdb(spark):
    df = spark.createDataFrame([(float(d),) for d in T_TABLE], "df double")
    got = {
        r.df: r.t
        for r in df.select("df", t_crit_975(F.col("df")).alias("t")).collect()
    }
    con = duckdb.connect()
    for d, expected in T_TABLE.items():
        rel = abs(got[d] - expected) / expected
        assert rel < 8e-3, (d, got[d], expected)
        if d >= 4:
            assert rel < 3e-4, (d, got[d], expected)
        # the oracle twin is the bit-identical polynomial
        dd = con.sql(f"SELECT {t_crit_975_sql(str(d))} AS t").fetchone()[0]
        assert dd == pytest.approx(got[d], abs=0.0, rel=1e-15)


def test_t_crit_clamps_and_propagates_null(spark):
    df = spark.createDataFrame(
        [(0.5,), (1.0,), (None,)], "df double"
    ).select(t_crit_975(F.col("df")).alias("t"))
    rows = [r.t for r in df.collect()]
    # df below 2 clamps to the df = 2 value (more conservative than
    # any larger df; never silently reverts toward 1.96)
    assert rows[0] == rows[1]
    assert rows[0] > 4.2
    assert rows[2] is None


def test_t_crit_monotone_decreasing_toward_normal(spark):
    dfs = [float(d) for d in range(2, 200, 3)]
    df = spark.createDataFrame([(d,) for d in dfs], "df double")
    ts = [
        r.t
        for r in df.select(t_crit_975(F.col("df")).alias("t"))
        .orderBy("df")
        .collect()
    ]
    assert all(a > b for a, b in zip(ts, ts[1:]))
    assert ts[-1] > 1.9599  # approaches but never crosses the normal z


def _daily_events(spark, counts):
    """counts[d] events on 2024-01-(d+1), all type 't'."""
    rows = []
    eid = 0
    for d, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, f"2024-01-{d + 1:02d} 06:00:00", "t"))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts_s string, event_type string"
    ).select(
        "event_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type"
    )


def test_holt_winters_exact_on_pure_weekly_pattern(spark):
    """On y = m + s(dow) with zero trend, additive HW is EXACT: level
    pins to m, trend to 0, seasonals reproduce, and every one-step
    forecast equals the next observation."""
    from big_data_trend_analysis_spark.operators.temporal import (
        holt_winters_dow,
    )

    season = [3, 7, 11, 15, 19, 23, 27]  # mean 15, seasonals sum to 0
    counts = season * 4  # 28 days
    out = sorted(
        holt_winters_dow(_daily_events(spark, counts)).collect(),
        key=lambda r: r.day,
    )
    assert len(out) == 28 - 6  # rows from day p onward
    for r in out:
        assert r.level == 15.0
        assert r.trend == 0.0
    # one_step_ahead predicts the NEXT day's y exactly
    for cur, nxt in zip(out, out[1:]):
        assert cur.one_step_ahead == nxt.y


def test_holt_winters_needs_two_full_seasons(spark):
    from big_data_trend_analysis_spark.operators.temporal import (
        holt_winters_dow,
    )

    out = holt_winters_dow(_daily_events(spark, [5] * 13)).collect()
    assert out == []


def test_holt_winters_deterministic_across_partitionings(spark):
    from big_data_trend_analysis_spark.operators.temporal import (
        holt_winters_dow,
    )

    counts = [4, 9, 2, 8, 5, 11, 7, 6, 10, 3, 9, 4, 12, 8, 5, 7]
    ev = _daily_events(spark, counts)
    a = sorted(map(tuple, holt_winters_dow(ev.coalesce(1)).collect()))
    b = sorted(map(tuple, holt_winters_dow(ev.repartition(16)).collect()))
    assert a == b


def test_isotonic_identity_on_increasing_series(spark):
    from big_data_trend_analysis_spark.operators.trend import (
        isotonic_daily_fit,
    )

    counts = [2, 5, 7, 11, 13]
    out = sorted(
        isotonic_daily_fit(_daily_events(spark, counts)).collect(),
        key=lambda r: r.day,
    )
    assert [r.fit for r in out] == [float(c) for c in counts]
    assert out[0].n_blocks == len(counts)
    assert [r.block_id for r in out] == list(range(len(counts)))


def test_isotonic_pools_textbook_violation(spark):
    """[4, 6, 5] pools the (6, 5) violation to 5.5; [9, 3, 3] pools
    everything to the global mean 5."""
    from big_data_trend_analysis_spark.operators.trend import (
        isotonic_daily_fit,
    )

    out = sorted(
        isotonic_daily_fit(_daily_events(spark, [4, 6, 5])).collect(),
        key=lambda r: r.day,
    )
    assert [r.fit for r in out] == [4.0, 5.5, 5.5]
    assert [r.block_id for r in out] == [0, 1, 1]
    assert out[0].n_blocks == 2

    flat = sorted(
        isotonic_daily_fit(_daily_events(spark, [9, 3, 3])).collect(),
        key=lambda r: r.day,
    )
    assert [r.fit for r in flat] == [5.0, 5.0, 5.0]
    assert flat[0].n_blocks == 1


def test_isotonic_fit_is_monotone_and_mean_preserving(spark):
    from big_data_trend_analysis_spark.operators.trend import (
        isotonic_daily_fit,
    )

    counts = [7, 2, 9, 1, 1, 8, 3, 12, 4, 4, 10]
    out = sorted(
        isotonic_daily_fit(_daily_events(spark, counts)).collect(),
        key=lambda r: r.day,
    )
    fits = [r.fit for r in out]
    assert all(a <= b for a, b in zip(fits, fits[1:]))
    assert sum(fits) == pytest.approx(sum(counts), abs=1e-4)


def test_holt_winters_densifies_calendar_gaps(spark):
    """A zero-event day is y = 0, not missing data: the seasonal ring
    must stay phase-aligned to the calendar across the gap (review
    finding: positional lags over a gapped series mixed weekdays)."""
    from big_data_trend_analysis_spark.operators.temporal import (
        holt_winters_dow,
    )

    season = [3, 7, 11, 15, 19, 23, 27]
    counts = season * 4
    gapped = list(counts)
    gapped[9] = 0  # day 10 has NO events — absent from the rollup
    rows = []
    eid = 0
    for d, c in enumerate(gapped):
        for _ in range(c):
            rows.append((eid, f"2024-01-{d + 1:02d} 06:00:00", "t"))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts_s string, event_type string"
    ).select(
        "event_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type"
    )
    out = sorted(
        holt_winters_dow(ev).collect(), key=lambda r: r.day
    )
    # the gap day materializes with y = 0 and the series length is the
    # FULL calendar span, not the observed-day count
    assert len(out) == 28 - 6
    days = [r.day.isoformat() for r in out]
    assert "2024-01-10" in days
    gap_row = next(r for r in out if r.day.isoformat() == "2024-01-10")
    assert gap_row.y == 0.0
    # phase check: the last week's seasonals still alternate with the
    # planted weekly pattern's ordering (low on the dow planted low)
    last7 = out[-7:]
    planted = {r.day.isoformat(): v for r, v in zip(last7, season)}
    fits = sorted(last7, key=lambda r: r.seasonal)
    expect = sorted(last7, key=lambda r: planted[r.day.isoformat()])
    assert [r.day for r in fits] == [r.day for r in expect]


def test_ri_check_excludes_null_fks_on_both_engines(spark):
    """ADVICE r10 (medium): a NULL child key must not count as an
    orphan — on the ENGINE (isNotNull accounting) and in the ORACLE
    (the orphan subquery's DISTINCT now filters IS NOT NULL). TPC-H
    FKs are non-null, so this pins the parity on a synthetic
    nullable-FK corpus."""
    import pandas as pd

    from big_data_trend_analysis_spark.operators.relational import (
        referential_integrity_check,
    )
    from big_data_trend_analysis_spark.plans.registry import _RI_ORACLE
    from tests.oracle_utils import assert_results_match, run_spark

    tables = {
        # one NULL l_orderkey, one real orphan (99), one NULL partkey
        "lineitem": pd.DataFrame(
            {
                "l_orderkey": [1, 2, None, 99],
                "l_partkey": [10, None, 10, 11],
                "l_suppkey": [100, 100, 101, 101],
            }
        ),
        "orders": pd.DataFrame(
            {"o_orderkey": [1, 2, 3], "o_custkey": [7, None, 8]}
        ),
        "customer": pd.DataFrame({"c_custkey": [7, 8], "c_nationkey": [1, None]}),
        "part": pd.DataFrame({"p_partkey": [10, 11]}),
        "supplier": pd.DataFrame({"s_suppkey": [100, 101], "s_nationkey": [1, 2]}),
        "nation": pd.DataFrame({"n_nationkey": [1, 2, 3]}),
    }
    sdfs = {
        n: spark.createDataFrame(df.astype("Int64").astype(object))
        for n, df in tables.items()
    }
    out = referential_integrity_check(
        sdfs["lineitem"], sdfs["orders"], sdfs["customer"],
        sdfs["part"], sdfs["supplier"], sdfs["nation"],
    )
    rows = {r.relation: r for r in out.collect()}
    lo = rows["lineitem.l_orderkey->orders"]
    # NULL is not a key, not an orphan; 99 is a real orphan
    assert (lo.child_keys, lo.orphan_keys) == (3, 1)
    oc = rows["orders.o_custkey->customer"]
    assert (oc.child_keys, oc.orphan_keys) == (2, 0)
    # oracle replays identically on the same frames
    import duckdb

    con = duckdb.connect()
    for n, df in tables.items():
        con.register(n, df)
    oracle_res = con.execute(_RI_ORACLE)
    assert_results_match(
        run_spark(out),
        ([d[0] for d in oracle_res.description], oracle_res.fetchall()),
        "referential_integrity_check/nullable",
    )


def test_bootstrap_ci_indices_follow_surviving_replicates(spark):
    """ADVICE r10: with a tiny corpus some Poisson replicates draw no
    rows and are excluded; the CI order-statistic indices must follow
    the SURVIVING count m — under the old fixed ceil(.975*B) rank the
    top index vanishes and ci_hi silently collapses onto ci_lo."""
    from big_data_trend_analysis_spark.operators.aggregates import (
        bootstrap_ci_mean,
    )

    ev = spark.createDataFrame(
        [(1, 10.0), (2, 50.0)], "event_id long, value double"
    )
    r = bootstrap_ci_mean(ev).collect()[0]
    assert r.ci_lo is not None and r.ci_hi is not None
    # both rows deterministically enter some replicates alone, so the
    # extreme replicate means straddle the observed mean
    assert r.ci_lo < r.ci_hi
    assert 10.0 <= r.ci_lo <= r.mean_obs <= r.ci_hi <= 50.0


def test_range_cumsum_matches_single_window_and_partitioning(spark):
    """The rank statistics' distributed cumsum (feature_binning's
    shape, extracted): inclusive cumulative sums over the global value
    order must equal the single-window form and be invariant to input
    partitioning and to where the range boundaries fall."""
    import random

    from pyspark.sql import Window

    from big_data_trend_analysis_spark.functions.ranks import range_cumsum

    rng = random.Random(11)
    rows = [
        (round(rng.uniform(0, 50), 2), rng.randint(0, 5), rng.randint(0, 3))
        for _ in range(500)
    ]
    # duplicate values collapse first (the per-value relation contract)
    df = (
        spark.createDataFrame(rows, "value double, a long, b long")
        .groupBy("value")
        .agg(F.sum("a").alias("a"), F.sum("b").alias("b"))
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    expect = {
        r.value: (r.ca, r.cb)
        for r in df.select(
            "value",
            F.sum("a").over(w).alias("ca"),
            F.sum("b").over(w).alias("cb"),
        ).collect()
    }
    for n_parts in (1, 4, 32):
        got = {
            r.value: (r.cum_a, r.cum_b)
            for r in range_cumsum(
                df.repartition(7), "value", ["a", "b"], n_parts=n_parts
            ).collect()
        }
        assert got == expect, n_parts
