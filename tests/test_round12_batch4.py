"""Round-12 fourth batch: the blocked/ordered/robust rank quartet.

Oracle parity (test_oracle_parity / tools/parity_check.py) proves
Spark == DuckDB; these pin that both equal the STATISTIC — hand-worked
textbook cases on planted inputs (Friedman/Mood/Cochran–Armitage/
Mann–Kendall are all small-integer arithmetic when n is tiny).

2024-01-01 is a Monday: Spark ``dayofweek`` = 2, so Jan 1/2/3 are
three distinct weekday blocks and no other January day aliases them
in these fixtures.
"""

from __future__ import annotations

import math

from tests.test_round11_batch2 import _events


# -------------------------------------------------------------- friedman


def test_friedman_matches_hand_computation(spark):
    """3 complete blocks × 3 treatments, c always last: with block
    ranks a=(1,1,2), b=(2,2,1), c=(3,3,3): Ra=4, Rb=5, Rc=9 and
    Q = 12/(3·3·4)·(16+25+81) − 3·3·4 = 122/3 − 36 ≈ 4.666667."""
    from big_data_trend_analysis_spark.operators.drift import friedman_test

    rows = []
    eid = 0
    # (day, type) cell sums = the single event's value
    for day, cells in [
        (1, {"a": 1.0, "b": 2.0, "c": 3.0}),
        (2, {"a": 1.0, "b": 2.0, "c": 3.0}),
        (3, {"a": 2.0, "b": 1.0, "c": 3.0}),
    ]:
        for etype, val in cells.items():
            eid += 1
            rows.append((eid, day, eid, etype, val))
    out = friedman_test(_events(spark, rows)).collect()
    by_type = {r.event_type: r for r in out}
    assert by_type["a"].rank_sum == 4.0
    assert by_type["b"].rank_sum == 5.0
    assert by_type["c"].rank_sum == 9.0
    r = out[0]
    assert r.n_blocks == 3 and r.k_types == 3 and r.df_used == 2
    assert abs(r.q_stat - (122.0 / 3.0 - 36.0)) < 1e-6
    assert r.chi2_crit == 5.991465 and not r.reject


def test_friedman_ties_and_incomplete_blocks(spark):
    """A tied cell takes the doubled average rank; a block missing a
    treatment drops entirely (complete-block requirement)."""
    from big_data_trend_analysis_spark.operators.drift import friedman_test

    rows = []
    eid = 0
    for day, cells in [
        (1, {"a": 1.0, "b": 1.0, "c": 2.0}),  # a,b tie -> rank 1.5
        (2, {"a": 1.0, "b": 2.0, "c": 3.0}),
        (3, {"a": 5.0, "b": 6.0}),  # incomplete: dropped
    ]:
        for etype, val in cells.items():
            eid += 1
            rows.append((eid, day, eid, etype, val))
    out = friedman_test(_events(spark, rows)).collect()
    by_type = {r.event_type: r for r in out}
    assert out[0].n_blocks == 2
    assert by_type["a"].rank_sum == 2.5  # 1.5 + 1
    assert by_type["b"].rank_sum == 3.5  # 1.5 + 2
    assert by_type["c"].rank_sum == 6.0  # 3 + 3


# ----------------------------------------------------------- mood median


def test_mood_median_matches_hand_computation(spark):
    """Values 1..9, groups a={1,2,3} b={4,5,6} c={7,8,9}: the discrete
    median is 5, above-counts (0,1,3), A=4, N=9 and
    χ² = 2.4 + 0.15 + 3.75 = 6.3 > χ²(0.95,2) = 5.991465."""
    from big_data_trend_analysis_spark.operators.drift import mood_median_test

    rows = []
    for i, (g, v) in enumerate(
        [("a", 1), ("a", 2), ("a", 3), ("b", 4), ("b", 5), ("b", 6),
         ("c", 7), ("c", 8), ("c", 9)]
    ):
        rows.append((i + 1, (i % 5) + 1, i + 1, g, float(v)))
    out = mood_median_test(_events(spark, rows)).collect()
    by_type = {r.event_type: r for r in out}
    assert out[0].grand_median == 5.0
    assert by_type["a"].n_above == 0
    assert by_type["b"].n_above == 1
    assert by_type["c"].n_above == 3
    r = out[0]
    assert abs(r.chi2_stat - 6.3) < 1e-6
    assert r.df_used == 2 and r.chi2_crit == 5.991465 and r.reject


# ------------------------------------------------------ cochran-armitage


def test_cochran_armitage_matches_hand_computation(spark):
    """Two weekday groups (Mon=2, Tue=3), values 1..8 so the median is
    4 and success = value>4: r=(1,3) over n=(4,4), p̄=½,
    T = 11 − 10 = 1, Var = ¼·(52 − 50) = ½, z = √2 ≈ 1.414214."""
    from big_data_trend_analysis_spark.operators.drift import (
        cochran_armitage_trend,
    )

    rows = []
    for i, (day, v) in enumerate(
        [(1, 1), (1, 2), (1, 3), (1, 8), (2, 5), (2, 6), (2, 7), (2, 4)]
    ):
        rows.append((i + 1, day, i + 1, "t", float(v)))
    out = cochran_armitage_trend(_events(spark, rows)).collect()
    by_dow = {r.dow: r for r in out}
    assert by_dow[2].n_obs == 4 and by_dow[2].n_succ == 1
    assert by_dow[3].n_obs == 4 and by_dow[3].n_succ == 3
    r = out[0]
    assert r.grand_median == 4.0
    assert abs(r.z_trend - round(math.sqrt(2.0), 6)) < 1e-9
    assert abs(r.p_value - 0.157299) < 1e-4
    assert not r.reject


# --------------------------------------------------------- mann-kendall


def test_mann_kendall_matches_hand_computation(spark):
    """Five strictly increasing daily counts: S = 10, no ties,
    Var = 5·4·15/18 = 50/3, z = 9/√(50/3) ≈ 2.204541 → reject."""
    from big_data_trend_analysis_spark.operators.trend import (
        mann_kendall_trend,
    )

    rows = []
    eid = 0
    for day in range(1, 6):
        for _ in range(day):  # day d carries d events
            eid += 1
            rows.append((eid, day, eid, "t", 1.0))
    out = mann_kendall_trend(_events(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_days == 5 and r.s_stat == 10
    assert abs(r.var_s - round(50.0 / 3.0, 6)) < 1e-9
    assert abs(r.z_mk - round(9.0 / math.sqrt(50.0 / 3.0), 6)) < 1e-9
    assert abs(r.p_value - 0.027523) < 1e-4
    assert r.reject


def test_mann_kendall_no_trend_is_zero(spark):
    """A flat series ties every pair: S = 0, z = 0, p = 1."""
    from big_data_trend_analysis_spark.operators.trend import (
        mann_kendall_trend,
    )

    rows = []
    eid = 0
    for day in range(1, 5):
        for _ in range(3):
            eid += 1
            rows.append((eid, day, eid, "t", 1.0))
    r = mann_kendall_trend(_events(spark, rows)).collect()[0]
    assert r.s_stat == 0 and r.z_mk == 0.0
    assert abs(r.p_value - 1.0) < 1e-6
    assert not r.reject


# ------------------------------------------------- forecast_backtest_mase


def test_mase_backtest_on_linear_series(spark):
    """Counts 1..10 over 10 days: naive errors are all 1 (so the MASE
    scale Q = 1 and naive MASE = 1); seasonal-naive (lag 7) errors
    are all 7 → MASE 7. sMAPE means hand-folded from the 6-dp terms."""
    from big_data_trend_analysis_spark.operators.temporal import (
        forecast_backtest_mase,
    )

    rows, eid = [], 0
    for day in range(1, 11):
        for _ in range(day):
            eid += 1
            rows.append((eid, day, eid, "t", 1.0))
    out = {
        r.method: r
        for r in forecast_backtest_mase(_events(spark, rows)).collect()
    }
    nv, sn = out["naive"], out["snaive"]
    assert nv.n_eval == 3 and sn.n_eval == 3
    assert nv.mae == 1.0 and nv.mase == 1.0
    assert sn.mae == 7.0 and sn.mase == 7.0
    smape_nv = (
        round(2 * 1 / 15, 6) + round(2 * 1 / 17, 6) + round(2 * 1 / 19, 6)
    ) / 3
    smape_sn = (
        round(14 / 9, 6) + round(14 / 11, 6) + round(14 / 13, 6)
    ) / 3
    assert abs(nv.smape - smape_nv) < 2e-6
    assert abs(sn.smape - smape_sn) < 2e-6


# ------------------------------------------------------------ mrr_map_at_k


def test_mrr_map_hand_ranking(spark):
    """Probe 0 (label 7) ranks: id1 label-7 (sim 1), id2 label-9
    (sim .7071), id3 label-7 (sim .4472), id4 label-9 (sim 0):
    RR = 1, AP@10 = (P@1 + P@3)/min(R=2,10) = (1 + 2/3)/2."""
    from big_data_trend_analysis_spark.operators.similarity import (
        mrr_map_at_k,
    )

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 7),
        (1, [1.0, 0.0, 0.0, 0.0], 7),
        (2, [1.0, 1.0, 0.0, 0.0], 9),
        (3, [1.0, 2.0, 0.0, 0.0], 7),
        (4, [0.0, 1.0, 0.0, 0.0], 9),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = mrr_map_at_k(emb, probe_ids=(0,), k=10).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_relevant == 2 and r.first_rel_rank == 1 and r.rr == 1.0
    expected_ap = (1.0 + round(2.0 / 3.0, 6)) / 2
    assert abs(r.ap_at_k - expected_ap) < 2e-6
    assert r.mrr == 1.0 and abs(r.map_at_k - expected_ap) < 2e-6


def test_mrr_map_no_relevant_probe_scores_zero(spark):
    """A probe with no label-mates in the corpus: first_rel_rank NULL,
    RR = AP = 0 (and the fleet means average it in)."""
    from big_data_trend_analysis_spark.operators.similarity import (
        mrr_map_at_k,
    )

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 8),
        (1, [1.0, 0.0, 0.0, 0.0], 9),
        (2, [0.0, 1.0, 0.0, 0.0], 9),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    r = mrr_map_at_k(emb, probe_ids=(0,), k=10).collect()[0]
    assert r.n_relevant == 0 and r.first_rel_rank is None
    assert r.rr == 0.0 and r.ap_at_k == 0.0
    assert r.mrr == 0.0 and r.map_at_k == 0.0


# ------------------------------------------------------ weighted_sample_aes


def test_weighted_sample_aes_replays_in_pure_python(spark):
    """The md5-bucket uniform and the log-domain key replay exactly in
    hashlib, so the selected top-k and the 6-dp keys are checkable
    without Spark arithmetic."""
    import hashlib
    import math

    from big_data_trend_analysis_spark.operators.textstats import (
        weighted_sample_aes,
    )

    docs = [(i, f"text {i}", "en", "s", (i * 37) % 900 + 1) for i in range(30)]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )

    def key(doc_id, n_chars):
        h = hashlib.md5(f"{doc_id}:47".encode()).hexdigest()[:15]
        u = (int(h, 16) + 1) / float(16**15)
        return math.log(u) / max(n_chars, 1)

    expect = sorted(
        ((key(d, n), d, n) for d, _, _, _, n in docs),
        key=lambda t: (-t[0], t[1]),
    )[:20]
    out = weighted_sample_aes(df, k=20).collect()
    assert len(out) == 20
    got = {r.doc_id: r for r in out}
    assert set(got) == {d for _, d, _ in expect}
    for k_val, d, _n in expect:
        assert abs(got[d].es_key - round(k_val, 6)) < 1e-9


# ---------------------------------------------------- levenshtein_blocking


def test_levenshtein_blocking_blocks_and_verifies(spark):
    """Within the 'bolt' block only (hot bolt, red bolt) survives the
    distance-3 verify (hot↔red is exactly 3 substitutions; blue↔red
    and blue↔hot are 4 edits apart); the widget singleton yields no
    pair; duplicate names carry their counts."""
    from big_data_trend_analysis_spark.operators.dedup import (
        levenshtein_blocking,
    )

    rows = [
        (1, "red bolt"), (2, "red bolt"), (3, "hot bolt"),
        (4, "blue bolt"), (5, "red widget"),
    ]
    part = spark.createDataFrame(rows, "p_partkey long, p_name string")
    out = levenshtein_blocking(part).collect()
    assert len(out) == 1
    r = out[0]
    assert r.block_key == "bolt"
    assert (r.name_a, r.name_b) == ("hot bolt", "red bolt")
    assert r.n_a == 1 and r.n_b == 2 and r.lev_dist == 3


# ----------------------------------------------------- shuffle_reuse_check


def test_shuffle_reuse_gate_pins_one_exchange(spark):
    """The self-joined rollup plans a ReusedExchange and its
    aggregates match a direct recompute."""
    from big_data_trend_analysis_spark.plans.registry import (
        _shuffle_reuse_check,
    )
    from big_data_trend_analysis_spark.sources.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    out = {r.event_type: r for r in _shuffle_reuse_check(spark, sf_dir).collect()}
    direct = {
        r.event_type: r
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .count()
        .collect()
    }
    assert set(out) == set(direct)
    for etype, r in out.items():
        assert r.n_rows == direct[etype]["count"]
        assert r.n_rows_doubled == 2 * r.n_rows
        assert r.reuse_planned
