"""Round-12 fifth batch: components / runs / Gini / Granger.

Hand-worked anchors on planted inputs; oracle parity at sf0.01 is the
cross-engine check (tools/parity_check.py), these pin the STATISTIC.
"""

from __future__ import annotations

import math

from tests.test_round11_batch2 import _events


# ------------------------------------------------------ connected_components


def test_connected_components_three_islands(spark):
    """Orders {10,11}×2, {12,13}×2, {14}: support-2 edges form two
    pairs plus an isolate — components {10,11}, {12,13}, {14}."""
    from big_data_trend_analysis_spark.operators.graph import (
        connected_components,
    )

    rows = []
    for okey, basket in [
        (1, [10, 11]), (2, [10, 11]),
        (3, [12, 13]), (4, [12, 13]),
        (5, [14]),
    ]:
        for pk in basket:
            rows.append((okey, pk))
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = {r.node: r for r in connected_components(li).collect()}
    assert len(out) == 5
    assert out[10].component == 10 and out[11].component == 10
    assert out[12].component == 12 and out[13].component == 12
    assert out[14].component == 14
    assert out[10].component_size == 2 and out[14].component_size == 1
    assert out[10].n_components == 3


def test_connected_components_chain_within_radius(spark):
    """A 4-node path (each edge in 2 orders) collapses to one
    component — the 6-round radius covers the diameter."""
    from big_data_trend_analysis_spark.operators.graph import (
        connected_components,
    )

    rows = []
    okey = 0
    for a, b in [(20, 21), (21, 22), (22, 23)]:
        for _ in range(2):
            okey += 1
            rows.extend([(okey, a), (okey, b)])
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = {r.node: r for r in connected_components(li).collect()}
    assert {r.component for r in out.values()} == {20}
    assert out[23].component_size == 4 and out[23].n_components == 1


# ----------------------------------------------------------------- runs_test


def test_runs_test_hand_sequence(spark):
    """Daily counts (5,1,5,1,5,9): median 5, the three off-median days
    sign (−,−,+) → R=2, n₁=1, n₂=2: E[R]=7/3, Var=2/9,
    z=(2−7/3)/√(2/9)=−0.707107."""
    from big_data_trend_analysis_spark.operators.trend import runs_test

    rows, eid = [], 0
    for day, cnt in enumerate([5, 1, 5, 1, 5, 9], start=1):
        for _ in range(cnt):
            eid += 1
            rows.append((eid, day, eid, "t", 1.0))
    out = runs_test(_events(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_pos == 1 and r.n_neg == 2 and r.n_runs == 2
    expected_z = round((2 - 7.0 / 3.0) / math.sqrt(2.0 / 9.0), 6)
    assert abs(r.z_runs - expected_z) < 1e-9
    assert abs(r.p_value - 0.4795) < 1e-3
    assert not r.reject


# --------------------------------------------------------------- lorenz_gini


def test_lorenz_gini_hand_case(spark):
    """Revenues (100, 100, 200): G = 2·(100+200+600)/(3·400) − 4/3 =
    1.5 − 1.333333 = 0.166667 (ranks 1..3 with the tie at 100)."""
    from big_data_trend_analysis_spark.operators.aggregates import (
        lorenz_gini,
    )

    rows = [
        (1, 1, 60.0), (2, 1, 40.0),
        (3, 2, 100.0),
        (4, 3, 200.0),
    ]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double"
    )
    r = lorenz_gini(orders).collect()[0]
    assert r.n_customers == 3 and r.total_revenue == 400.0
    assert abs(r.gini - round(2.0 * 900.0 / 1200.0 - 4.0 / 3.0, 6)) < 1e-9


def test_lorenz_gini_uniform_is_zero(spark):
    """Equal revenues: perfect equality, G = 0."""
    from big_data_trend_analysis_spark.operators.aggregates import (
        lorenz_gini,
    )

    rows = [(i, i, 50.0) for i in range(1, 6)]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double"
    )
    r = lorenz_gini(orders).collect()[0]
    assert r.n_customers == 5 and abs(r.gini) < 1e-9


# -------------------------------------------------------------- granger_check


def test_granger_matches_python_replay(spark):
    """Planted near-causal series (y_t tracks x_{t−1} with one
    deviation): the engine's F equals a plain-python replay of the
    same centered-moment algebra, and the driver lag is detected."""
    from big_data_trend_analysis_spark.operators.drift import granger_check

    xs = [1, 2, 3, 1, 2, 3, 1, 2, 3, 1]
    ys = [5] + [x * 2 for x in xs[:-1]]
    ys[4] += 3  # one deviation so RSS_u > 0
    rows, eid = [], 0
    for day, (x, y) in enumerate(zip(xs, ys), start=1):
        for _ in range(x):
            eid += 1
            rows.append((eid, day, eid, "view", 1.0))
        for _ in range(y):
            eid += 1
            rows.append((eid, day, eid, "purchase", 1.0))
    r = granger_check(_events(spark, rows)).collect()[0]

    y = ys[1:]
    u = ys[:-1]
    v = xs[:-1]
    n = float(len(y))
    sy, su, sv = sum(y), sum(u), sum(v)
    cyy = sum(a * a for a in y) - sy * sy / n
    cuu = sum(a * a for a in u) - su * su / n
    cvv = sum(a * a for a in v) - sv * sv / n
    cuy = sum(a * b for a, b in zip(u, y)) - su * sy / n
    cvy = sum(a * b for a, b in zip(v, y)) - sv * sy / n
    cuv = sum(a * b for a, b in zip(u, v)) - su * sv / n
    rss_r = cyy - cuy * cuy / cuu
    det = cuu * cvv - cuv * cuv
    b1 = (cuy * cvv - cvy * cuv) / det
    b2 = (cvy * cuu - cuy * cuv) / det
    rss_u = cyy - b1 * cuy - b2 * cvy
    f = (rss_r - rss_u) / (rss_u / (n - 3))

    assert r.n_obs == 9
    assert abs(r.rss_r - round(rss_r, 6)) < 1e-6
    assert abs(r.rss_u - round(rss_u, 6)) < 1e-6
    assert abs(r.f_stat - round(f, 6)) < 1e-4
    assert r.df2 == 6
    # far from the F(1,6) = 5.99 boundary, so the rounded comparison
    # is decisive
    assert r.reject == (r.f_stat > r.f_crit)
