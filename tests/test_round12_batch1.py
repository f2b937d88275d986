"""Round-12 first batch: semantic tests with hand-computed anchors.

Oracle parity (test_oracle_parity / tools/parity_check.py) proves
Spark == DuckDB; these pin that both equal the STATISTIC — known-value
checks on planted inputs where the quantile / curve / funnel / fit is
computable by hand or by an independent replay.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.test_round11_batch2 import _events


# ---------------------------------------------------------------- f_crit_95


def test_f_crit_95_branches_against_f_table():
    """df1=1 is the exact t² identity, df1=2 the exact closed form,
    df1>=3 Paulson within 0.5% of the published F(0.95) table."""
    from pyspark.sql import SparkSession

    from big_data_trend_analysis_spark.functions.stats import f_crit_95

    spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    cases = [
        (1, 40, 4.0847),
        (2, 10, 4.1028),
        (2, 1000, 3.0047),
        (3, 120, 2.6802),
        (4, 60, 2.5252),
        (5, 100, 2.3053),
        (7, 60, 2.1665),
    ]
    df = spark.createDataFrame(cases, "df1 int, df2 int, expected double")
    rows = df.select(
        "df1", "df2", "expected", f_crit_95(F.col("df1"), F.col("df2")).alias("got")
    ).collect()
    for r in rows:
        tol = 0.002 if r.df1 <= 2 else 0.006
        assert abs(r.got - r.expected) / r.expected < tol, (
            r.df1,
            r.df2,
            r.got,
            r.expected,
        )


def test_f_crit_95_sql_twin_matches_column_exactly():
    """The DuckDB twin evaluates to the bit-identical double."""
    import duckdb

    from pyspark.sql import SparkSession

    from big_data_trend_analysis_spark.functions.stats import (
        f_crit_95,
        f_crit_95_sql,
    )

    spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    for df1, df2 in [(1, 58), (2, 37), (3, 9995), (4, 58), (6, 123456)]:
        got_spark = (
            spark.range(1)
            .select(f_crit_95(F.lit(df1), F.lit(df2)).alias("v"))
            .collect()[0]
            .v
        )
        got_duck = duckdb.sql(
            f"SELECT {f_crit_95_sql(str(df1), str(df2))} AS v"
        ).fetchone()[0]
        assert got_spark == got_duck, (df1, df2, got_spark, got_duck)


# ------------------------------------------------------------- pacf_by_type


def test_pacf_by_type_matches_per_series_recursion(spark):
    """Each type's pacf equals an independent Decimal replay of the
    Durbin–Levinson recursion over THAT type's own ACF rows — and the
    two planted series (alternating vs 3-period) disagree at lag 1,
    so a global fit cannot fake the keyed one."""
    from decimal import ROUND_HALF_UP, Decimal

    from big_data_trend_analysis_spark.operators.drift import pacf_by_type

    rows, eid = [], 0
    for day in range(1, 29):
        for _ in range(10 + (5 if day % 2 == 0 else 0)):
            rows.append((eid, day, eid % 7, "alt", 1.0))
            eid += 1
        for _ in range(10 + (6 if day % 3 == 0 else 0)):
            rows.append((eid, day, eid % 7, "tri", 1.0))
            eid += 1
    out = pacf_by_type(_events(spark, rows)).collect()
    by_type: dict[str, dict[int, tuple]] = {}
    for r in out:
        by_type.setdefault(r.event_type, {})[r.lag] = r
    assert set(by_type) == {"alt", "tri"}
    q6 = Decimal("0.000001")
    for etype, rows_by_lag in by_type.items():
        acf = {
            k: Decimal(repr(v.acf)).quantize(q6, rounding=ROUND_HALF_UP)
            for k, v in rows_by_lag.items()
            if v.acf is not None
        }
        phi: dict[int, Decimal] = {}
        for k in sorted(acf):
            if k == 1:
                phi = {1: acf[1]}
                expect = float(acf[1])
            else:
                num = acf[k] - sum(phi[j] * acf[k - j] for j in range(1, k))
                den = Decimal(1) - sum(phi[j] * acf[j] for j in range(1, k))
                pacf = Decimal(
                    math.floor(float(num) / float(den) * 1_000_000 + 0.5)
                ) / Decimal(1_000_000)
                phi = {
                    j: (phi[j] - pacf * phi[k - j]).quantize(
                        q6, rounding=ROUND_HALF_UP
                    )
                    for j in range(1, k)
                }
                phi[k] = pacf
                expect = float(pacf)
            assert rows_by_lag[k].pacf == expect, (etype, k)
    # the two planted rhythms genuinely differ
    assert by_type["alt"][1].pacf != by_type["tri"][1].pacf
    assert by_type["alt"][1].pacf < 0  # alternating series anticorrelates


# -------------------------------------------------------- cohort_ltv_curves


def test_cohort_ltv_accumulates_per_cohort(spark):
    """Two cohorts, hand-computed cells: the Jan cohort (u1, u2) and
    the Feb cohort (u3); cumulative revenue and per-user LTV follow."""
    from big_data_trend_analysis_spark.operators.temporal import (
        cohort_ltv_curves,
    )

    orders = spark.createDataFrame(
        [
            (1, 1, "O", 100.0, "2024-01-05"),
            (2, 2, "O", 50.0, "2024-01-20"),
            (3, 1, "O", 30.0, "2024-02-10"),  # u1 month_offset 1
            (4, 3, "O", 70.0, "2024-02-01"),  # new Feb cohort
            (5, 2, "O", 20.0, "2024-03-15"),  # u2 offset 2
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate_s string",
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.col("o_orderdate_s").cast("timestamp").alias("o_orderdate"),
    )
    out = {
        (str(r.cohort_month), r.month_offset): r
        for r in cohort_ltv_curves(orders).collect()
    }
    jan0 = out[("2024-01-01", 0)]
    assert (jan0.cohort_size, jan0.n_active) == (2, 2)
    assert (jan0.revenue, jan0.cum_revenue, jan0.ltv_per_user) == (
        150.0,
        150.0,
        75.0,
    )
    jan1 = out[("2024-01-01", 1)]
    assert (jan1.n_active, jan1.revenue, jan1.cum_revenue) == (1, 30.0, 180.0)
    assert jan1.ltv_per_user == 90.0
    jan2 = out[("2024-01-01", 2)]
    assert (jan2.cum_revenue, jan2.ltv_per_user) == (200.0, 100.0)
    feb0 = out[("2024-02-01", 0)]
    assert (feb0.cohort_size, feb0.cum_revenue, feb0.ltv_per_user) == (
        1,
        70.0,
        70.0,
    )
    assert len(out) == 4


# ------------------------------------------------------------ funnel_k_step


def test_funnel_k_step_enforces_order_and_gap(spark):
    """u1 completes in order within gaps; u2's click precedes the view
    (no credit); u3's purchase misses the 48h gap after the click."""
    from big_data_trend_analysis_spark.operators.temporal import funnel_k_step

    rows = [
        # u1: view d1, click d2, purchase d3 — full funnel
        (0, 1, 1, "view", 0.0),
        (1, 2, 1, "click", 0.0),
        (2, 3, 1, "purchase", 0.0),
        # u2: click d1 BEFORE view d2 — stops at view
        (3, 2, 2, "view", 0.0),
        (4, 1, 2, "click", 0.0),
        # u3: view d1, click d2, purchase d10 — gap blown after click
        (5, 1, 3, "view", 0.0),
        (6, 2, 3, "click", 0.0),
        (7, 10, 3, "purchase", 0.0),
        # u4: purchase only — never enters
        (8, 1, 4, "purchase", 0.0),
    ]
    r = funnel_k_step(_events(spark, rows)).collect()[0]
    assert (r.n_view, r.n_click, r.n_purchase) == (3, 2, 1)
    assert r.conv_view_click == round(2 / 3, 6)
    assert r.conv_click_purchase == 0.5
    assert r.conv_overall == round(1 / 3, 6)


# ------------------------------------------------------------- ab_power_mde


def test_ab_power_mde_matches_formula(spark):
    """Planted group with known variance: n=4 values 10,20,30,40 →
    mean 25, var 166.666667; MDE and n_per_arm from the identities."""
    from big_data_trend_analysis_spark.functions.stats import Z_975
    from big_data_trend_analysis_spark.operators.drift import (
        Z_80,
        ab_power_mde,
    )

    rows = [(i, 1, i, "a", v) for i, v in enumerate([10.0, 20.0, 30.0, 40.0])]
    r = ab_power_mde(_events(spark, rows)).collect()[0]
    assert r.n == 4 and r.mean_value == 25.0
    var = round((10**2 + 20**2 + 30**2 + 40**2 - 100**2 / 4) / 3, 6)
    assert r.sd_value == round(math.sqrt(var), 6)
    zsum = Z_975 + Z_80
    assert r.mde_abs == round(zsum * math.sqrt(2 * var / 2.0), 6)
    assert r.n_per_arm == math.ceil(
        round(2 * var * zsum * zsum / (0.05 * 25.0) ** 2, 6)
    )


# ----------------------------------------------------- wilson_ci_proportion


def test_wilson_ci_matches_reference_values(spark):
    """n=10 of N=40 (p̂=0.25): the Wilson 95% interval replayed from
    the closed form in-test, and the interval contains p̂."""
    rows = [(i, 1, i, "a" if i < 10 else "b", 0.0) for i in range(40)]
    from big_data_trend_analysis_spark.functions.stats import Z_975
    from big_data_trend_analysis_spark.operators.drift import (
        wilson_ci_proportion,
    )

    out = {r.event_type: r for r in wilson_ci_proportion(_events(spark, rows)).collect()}
    a = out["a"]
    assert a.p_hat == 0.25
    z, n, p = Z_975, 40.0, 0.25
    center = p + z * z / (2.0 * n)
    half = z * math.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n))
    denom = 1.0 + z * z / n
    assert a.ci_lo == round((center - half) / denom, 6)
    assert a.ci_hi == round((center + half) / denom, 6)
    assert a.ci_lo < a.p_hat < a.ci_hi


# --------------------------------------------------------------- sprt_monitor


def test_sprt_crosses_boundaries_on_planted_shares(spark):
    """Purchase-heavy days push the LLR above ln(19) → accept_h1;
    purchase-free days push it below → accept_h0."""
    from big_data_trend_analysis_spark.operators.drift import (
        SPRT_LOWER,
        SPRT_UPPER,
        sprt_monitor,
    )

    rows, eid = [], 0
    # 3 days at 50% purchases (way above p1) then 10 days at 0%
    for day in range(1, 4):
        for i in range(40):
            rows.append((eid, day, i, "purchase" if i % 2 else "view", 0.0))
            eid += 1
    for day in range(4, 14):
        for i in range(40):
            rows.append((eid, day, i, "view", 0.0))
            eid += 1
    out = sorted(sprt_monitor(_events(spark, rows)).collect(), key=lambda r: r.day)
    assert out[0].decision == "accept_h1" and out[0].llr_cum > SPRT_UPPER
    assert out[-1].decision == "accept_h0" and out[-1].llr_cum < SPRT_LOWER
    # the running sum is consistent with the per-day terms
    assert out[2].llr_cum == pytest.approx(
        sum(r.llr_day for r in out[:3]), abs=1e-6
    )


# -------------------------------------------------------------- zipf / heaps


def test_zipf_slope_recovers_planted_power_law(spark):
    """Corpus where token_k appears round(64/k) times for k=1..8 —
    an exact 1/k law — fits slope ≈ −1 with r² ≈ 1."""
    from big_data_trend_analysis_spark.operators.textstats import (
        zipf_fit_slope,
    )

    words = []
    for k in range(1, 9):
        words += [f"tok{k:02d}"] * round(64 / k)
    docs = spark.createDataFrame(
        [(1, " ".join(words), "en", "s", len(words))],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    r = zipf_fit_slope(docs).collect()[0]
    assert r.n_points == 8 and r.n_types == 8
    assert -1.05 < r.slope < -0.95
    assert r.r2 > 0.99


def test_heaps_fit_on_constructed_vocabulary_growth(spark):
    """Docs sized so V(N) = N^0.5 exactly at each prefix: doc d has
    2d−1 tokens, all new → N_d = d², V_d = d² ... with V = N the
    degenerate β=1 line; check slope == 1 and the curve totals."""
    from big_data_trend_analysis_spark.operators.textstats import (
        heaps_law_fit,
    )

    docs = []
    tok = 0
    for d in range(1, 6):
        words = []
        for _ in range(2 * d - 1):
            words.append(f"w{tok:04d}")
            tok += 1
        docs.append((d, " ".join(words), "en", "s", 1))
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars int"
    )
    r = heaps_law_fit(df).collect()[0]
    assert (r.n_docs, r.n_types, r.n_tokens) == (5, 25, 25)
    assert r.slope == 1.0 and r.r2 == 1.0


# ------------------------------------------------------ adamic_adar_linkpred


def test_adamic_adar_scores_planted_graph(spark):
    """4-brand graph with edges A–B, A–C, B–C, B–D (support met by
    3 co-orders each): candidate pairs are A–D (common neighbor B,
    deg 3 → 1/ln 3) and C–D (common neighbor B → 1/ln 3); existing
    edges are excluded."""
    import math

    from big_data_trend_analysis_spark.operators.graph import (
        adamic_adar_linkpred,
    )

    # parts 1..4 = brands A..D; orders carry the edge's two brands
    part = spark.createDataFrame(
        [(i, f"B{i}") for i in range(1, 5)], "p_partkey long, p_brand string"
    )
    rows, lid = [], 0
    for a, b in [(1, 2), (1, 3), (2, 3), (2, 4)]:
        for rep in range(3):  # meet min_support=3
            okey = lid * 10
            rows.append((okey, a)); rows.append((okey, b))
            lid += 1
    lineitem = spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    )
    out = {
        (r.brand_a, r.brand_b): r
        for r in adamic_adar_linkpred(lineitem, part).collect()
    }
    expected = round(1.0 / math.log(3.0), 6)
    assert set(out) == {("B1", "B4"), ("B3", "B4")}
    for r in out.values():
        assert r.n_common == 1 and r.aa_score == expected


# ------------------------------------------------------------------ ndcg_at_k


def test_ndcg_is_one_for_perfectly_clustered_probe(spark):
    """Probe 0's label-mates are its nearest neighbors by
    construction (identical vectors), so NDCG@10 = 1; a probe whose
    label-mates are orthogonal scores 0."""
    from big_data_trend_analysis_spark.operators.similarity import ndcg_at_k

    rows = []
    # probe 0 + 10 identical same-label vectors, plus orthogonal noise
    rows.append((0, [1.0, 0.0, 0.0, 0.0], 7))
    for i in range(1, 11):
        rows.append((i, [1.0, 0.0, 0.0, 0.0], 7))
    # probe 1: its label (8) appears only on orthogonal-axis vectors
    rows.append((1_000, [0.0, 1.0, 0.0, 0.0], 8))
    rows.append((1_001, [0.0, 0.0, 1.0, 0.0], 8))
    for i in range(20, 40):  # same direction as probe 1 but label 9
        rows.append((i, [0.0, 1.0, 0.0, 0.0], 9))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = {
        r.probe_id: r
        for r in ndcg_at_k(emb, probe_ids=(0, 1_000), k=10).collect()
    }
    assert out[0].n_relevant == 10 and out[0].ndcg == 1.0
    # probe 1000's only label-mate (1001) is orthogonal (sim 0) and
    # outranked by the 20 co-directional label-9 vectors -> dcg 0
    assert out[1_000].n_relevant == 1 and out[1_000].dcg == 0.0
    assert out[1_000].ndcg == 0.0


# --------------------------------------------------------- markov_steady_state


def test_markov_steady_state_converges_to_hand_chain(spark):
    """Two-state chain a→b always, b→a always: steady state is the
    period-2 oscillation fixed by the uniform start (0.5, 0.5)."""
    from big_data_trend_analysis_spark.operators.temporal import (
        markov_steady_state,
    )

    rows, eid = [], 0
    for day in range(1, 11):
        rows.append((eid, day, 1, "a" if day % 2 else "b", 0.0)); eid += 1
    out = {r.event_type: r for r in markov_steady_state(_events(spark, rows)).collect()}
    assert out["a"].pi == 0.5 and out["b"].pi == 0.5
    assert out["a"].n_iters == 15


def test_markov_steady_state_matches_numpy_power(spark):
    """Planted 3-state chain: the operator's floor-quantized iteration
    replayed independently in the test."""
    import math

    from big_data_trend_analysis_spark.operators.temporal import (
        event_transitions,
        markov_steady_state,
    )

    # user timeline: a a b a c b a b c c a ... build via explicit order
    seq = ["a", "a", "b", "a", "c", "b", "a", "b", "c", "c", "a", "b"]
    rows = [(i, 1 + i, 1, t, 0.0) for i, t in enumerate(seq)]
    ev = _events(spark, rows)
    p = {
        (r.from_type, r.to_type): r.p_transition
        for r in event_transitions(ev).collect()
    }
    states = sorted({s for pair in p for s in pair})
    pi = [math.floor(1.0 / 3 * 1e6 + 0.5) / 1e6] * 3
    for _ in range(15):
        nxt = []
        for j, sj in enumerate(states):
            acc = 0.0
            for i, si in enumerate(states):
                acc += pi[i] * p.get((si, sj), 0.0)
            nxt.append(math.floor(acc * 1e6 + 0.5) / 1e6)
        pi = nxt
    out = {r.event_type: r.pi for r in markov_steady_state(ev).collect()}
    assert out == dict(zip(states, pi))


# ------------------------------------------------------ theta_method_forecast


def test_theta_method_on_pure_linear_series(spark):
    """A perfectly linear daily series y_t = 5 + 2t: the OLS line is
    exact, the theta line equals the series itself reflected
    (2y − trend = y), SES tracks toward it, and fc_next combines the
    level with the next trend point."""
    from big_data_trend_analysis_spark.operators.temporal import (
        theta_method_forecast,
    )

    rows, eid = [], 0
    for day in range(1, 11):
        for _ in range(5 + 2 * day):
            rows.append((eid, day, eid % 5, "a", 0.0))
            eid += 1
    out = sorted(
        theta_method_forecast(_events(spark, rows)).collect(),
        key=lambda r: r.t,
    )
    for r in out:
        assert r.trend_fit == float(5 + 2 * r.t)
        # exact fit => theta line == series
        assert r.theta_y == float(r.y)
    # SES of the exact line lags it from below but converges upward
    assert out[0].level == out[0].theta_y
    assert out[-1].level < out[-1].theta_y
    # fc_next replay: 0.5*(level + trend(t+1))
    from decimal import ROUND_HALF_UP, Decimal

    last = out[-1]
    fc = (
        Decimal("0.5")
        * (Decimal(repr(last.level)) + Decimal(repr(float(5 + 2 * (last.t + 1)))))
    ).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    assert last.fc_next == float(fc)


def test_theta_ses_recursion_replay(spark):
    """The level sequence equals an independent decimal replay of
    l_t = 0.2·θ_t + 0.8·l_{t−1} over the operator's own theta line."""
    from decimal import ROUND_HALF_UP, Decimal

    from big_data_trend_analysis_spark.operators.temporal import (
        theta_method_forecast,
    )

    rows, eid = [], 0
    counts = [3, 9, 4, 12, 6, 15, 5, 11]
    for day, c in enumerate(counts, start=1):
        for _ in range(c):
            rows.append((eid, day, eid % 3, "a", 0.0))
            eid += 1
    out = sorted(
        theta_method_forecast(_events(spark, rows)).collect(),
        key=lambda r: r.t,
    )
    q6 = Decimal("0.000001")
    level = None
    for r in out:
        theta = Decimal(repr(r.theta_y))
        if level is None:
            level = theta
        else:
            level = (Decimal("0.2") * theta + Decimal("0.8") * level).quantize(
                q6, rounding=ROUND_HALF_UP
            )
        assert r.level == float(level), r.t


# ---------------------------------------------------------------- dunn_posthoc


def test_dunn_separates_the_shifted_group(spark):
    """Groups a/b share a distribution; c sits far above both: the
    a-c and b-c pairs reject under BH, the a-b pair does not, and the
    z replays from hand rank arithmetic."""
    from big_data_trend_analysis_spark.operators.drift import dunn_posthoc

    rows, eid = [], 0
    for i in range(12):
        rows.append((eid, 1 + i % 9, eid, "a", float(i % 6))); eid += 1
        rows.append((eid, 1 + i % 9, eid, "b", float(i % 6) + 0.5)); eid += 1
        rows.append((eid, 1 + i % 9, eid, "c", 100.0 + i)); eid += 1
    out = {
        (r.type_a, r.type_b): r
        for r in dunn_posthoc(_events(spark, rows)).collect()
    }
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert out[("a", "c")].reject and out[("b", "c")].reject
    assert not out[("a", "b")].reject
    # c occupies the top 12 global ranks: mean rank = (25+36)/2 = 30.5
    assert out[("a", "c")].rbar_b == 30.5
    assert out[("a", "c")].m_tests == 3
    # BH monotonicity: p_adj is non-decreasing in p_rank
    ranked = sorted(out.values(), key=lambda r: r.p_rank)
    assert all(
        x.p_adj <= y.p_adj for x, y in zip(ranked, ranked[1:])
    )


# ------------------------------------------------------- bloom sidecar index


def test_bloom_sidecar_prunes_without_false_negatives(spark, tmp_path):
    """Every present value keeps its file (no false negative — the
    superset guarantee), an absent value prunes everything, and a
    file over the distinct ceiling is conservatively kept."""
    from big_data_trend_analysis_spark.sources.bloom import (
        bloom_prune_files,
        write_bloom_sidecar,
    )
    from big_data_trend_analysis_spark.sources.txnlog import TxnLog

    root = str(tmp_path / "tbl")
    log = TxnLog(root)
    df1 = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y")], "id long, tag string"
    )
    df2 = spark.createDataFrame([(4, "z")], "id long, tag string")
    log.write_commit(df1)
    log.write_commit(df2)
    write_bloom_sidecar(spark, log, ["tag"])
    all_files = set(log.snapshot_files())
    assert len(all_files) == 2
    # no false negatives: each tag keeps at least its own file
    f_x = set(bloom_prune_files(log, {"tag": "x"}))
    f_z = set(bloom_prune_files(log, {"tag": "z"}))
    assert len(f_x) == 1 and len(f_z) == 1 and f_x != f_z
    assert bloom_prune_files(log, {"tag": "absent"}) == []
    # ceiling: max_distinct=1 -> file 1 (2 distinct tags) gets no
    # bloom and is kept even for an absent probe
    write_bloom_sidecar(spark, log, ["tag"], max_distinct=1)
    kept = set(bloom_prune_files(log, {"tag": "absent"}))
    assert len(kept) == 1 and kept == f_x
