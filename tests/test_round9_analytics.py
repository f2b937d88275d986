"""Planted-case semantics for the round-9 advanced-analytics batch.

Each test replays the operator's arithmetic by hand on a tiny planted
input (the ``test_drift_statistics`` pattern): CUSUM must localize a
level shift, ACF must recover alternating-series correlations exactly,
Theil-Sen must shrug off an outlier day that would wreck an OLS fit,
market-basket lift must match the contingency arithmetic, and the
Dunning G² score must equal the 2x2-table formula term for term.
"""

from __future__ import annotations

import datetime
import math

_EVT = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _daily_events(spark, per_day: dict[str, list[int]]):
    """events rows with ``counts[d]`` rows of each type on 2024-01-(d+1)."""
    rows, eid = [], 0
    for etype, counts in per_day.items():
        for d, n in enumerate(counts):
            ts = datetime.datetime(2024, 1, 1 + d)
            for _ in range(n):
                rows.append((eid, ts, 1, etype, 1.0, "{}"))
                eid += 1
    return spark.createDataFrame(rows, _EVT)


def test_cusum_localizes_level_shift_and_skips_constant(spark):
    from big_data_trend_analysis_spark.operators.drift import changepoint_cusum

    ev = _daily_events(
        spark,
        {"shift": [5] * 10 + [15] * 10, "flat": [7] * 20},
    )
    out = {r.event_type: r for r in changepoint_cusum(ev).collect()}

    s = out["shift"]
    # mean 10 ⇒ cumulative deviation bottoms at day 10 with |C| = 50
    assert s.cp_day == datetime.datetime(2024, 1, 10)
    assert s.max_dev == 50.0
    sd = round(math.sqrt(20 * 25 / 19), 6)  # stddev_samp of 10x5,10x15
    assert s.cusum_stat == round(50.0 / (sd * math.sqrt(20)), 6)
    assert s.is_change  # 2.179 > 1.358

    f = out["flat"]
    # constant series: sd = 0 ⇒ statistic undefined ⇒ NOT flagged
    assert f.max_dev == 0.0
    assert f.cusum_stat is None and f.is_change is False


def test_autocorr_alternating_series_exact(spark):
    from big_data_trend_analysis_spark.operators.drift import autocorr_daily

    ev = _daily_events(spark, {"x": [2, 4] * 4})  # 8 days, devs ±1
    got = {r.lag: r for r in autocorr_daily(ev).collect()}
    assert all(got[k].n_days == 8 for k in (1, 2, 3))
    assert got[1].acf == -0.875  # 7 products of -1 over Σd² = 8
    assert got[2].acf == 0.75  # 6 of +1
    assert got[3].acf == -0.625  # 5 of -1


def test_theil_sen_ignores_outlier_day(spark):
    from big_data_trend_analysis_spark.operators.trend import theil_sen_slope

    ev = _daily_events(spark, {"a": [1, 2, 3, 4, 100]})
    row = theil_sen_slope(ev).collect()[0]
    # 10 pairwise slopes, six of them exactly 1 ⇒ median 1 (an OLS fit
    # over the same series gives ~19x that).
    assert row.n_days == 5 and row.n_pairs == 10
    assert row.sen_slope == 1.0


def test_copurchase_contingency_arithmetic(spark):
    from big_data_trend_analysis_spark.operators.aggregates import copurchase_lift

    part = spark.createDataFrame(
        [(1, "A"), (2, "B"), (3, "C"), (4, "A")],
        "p_partkey long, p_brand string",
    )
    # order 1 holds brand A twice (parts 1 & 4) — baskets dedup it.
    li = spark.createDataFrame(
        [(1, 1), (1, 4), (1, 2), (2, 1), (2, 2), (3, 1), (3, 2),
         (4, 1), (4, 3), (5, 2)],
        "l_orderkey long, l_partkey long",
    )
    rows = copurchase_lift(li, part, min_support=3).collect()
    assert len(rows) == 1  # only (A,B) reaches support 3
    r = rows[0]
    assert (r.brand_a, r.brand_b, r.n_ab, r.n_a, r.n_b) == ("A", "B", 3, 4, 4)
    assert r.support == round(3 / 5, 6)
    assert r.confidence_ab == 0.75  # P(B|A) = 3/4
    assert r.confidence_ba == 0.75  # P(A|B) = 3/4 (directional pair, ADVICE r9)
    assert r.lift == round(3 * 5 / (4 * 4), 6)
    assert r.rnk == 1


def test_collocation_llr_matches_dunning_formula(spark):
    from big_data_trend_analysis_spark.operators.textstats import collocation_llr

    docs = [(i, "strong tea now", "en", "s", 10) for i in range(6)]
    docs += [(100 + i, "weak tea strong arm", "en", "s", 10) for i in range(3)]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = collocation_llr(df, min_count=5).collect()
    # two pairs reach count 5: "strong tea" (x6) and "tea now" (x6)
    assert {(r.w1, r.w2) for r in out} == {("strong", "tea"), ("tea", "now")}

    # replay the G² arithmetic from the planted bigram multiset
    grams = [("strong", "tea")] * 6 + [("tea", "now")] * 6
    grams += [("weak", "tea"), ("tea", "strong"), ("strong", "arm")] * 3
    n_tot = len(grams)

    def xlx(k):
        return round(k * math.log(k), 6) if k > 0 else 0.0

    for r in out:
        k11 = sum(1 for g in grams if g == (r.w1, r.w2))
        c1 = sum(1 for g in grams if g[0] == r.w1)
        c2 = sum(1 for g in grams if g[1] == r.w2)
        k12, k21 = c1 - k11, c2 - k11
        k22 = n_tot - c1 - c2 + k11
        expect = round(
            2.0
            * (
                xlx(k11) + xlx(k12) + xlx(k21) + xlx(k22)
                - xlx(c1) - xlx(n_tot - c1)
                - xlx(c2) - xlx(n_tot - c2)
                + xlx(n_tot)
            ),
            6,
        )
        assert r.k11 == k11 and r.llr == expect, (r.w1, r.w2)
    # ranking is by G² desc, then lexicographic
    assert [r.rnk for r in sorted(out, key=lambda r: (-r.llr, r.w1, r.w2))] == [1, 2]


def test_mixing_weights_cap_and_shares(spark):
    from big_data_trend_analysis_spark.operators.textstats import (
        dataset_mixing_weights,
    )

    # big: 90 tokens over 9 docs; small: 10 tokens over 2 docs
    docs = [(i, "w " * 9 + "w", "en", "big", 1) for i in range(9)]
    docs += [(100, "a b c d e", "en", "small", 1),
             (101, "a b c d e", "en", "small", 1)]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {r.source: r for r in dataset_mixing_weights(df).collect()}
    big, small = out["big"], out["small"]
    assert big.n_tokens == 90 and small.n_tokens == 10
    assert big.token_share == 0.9 and small.token_share == 0.1
    assert big.target_share == 0.5 and small.target_share == 0.5
    # weight = (T/2)/tokens_s: big undersampled, small oversampled 5x -> capped
    assert big.weight == round(50 / 90, 6) and big.capped_weight == big.weight
    assert small.weight == 5.0 and small.capped_weight == 3.0
    assert small.effective_tokens == 30.0  # the cap bit: 50 were wanted


def test_quality_classifier_monotone_in_features(spark):
    import math

    from big_data_trend_analysis_spark.operators.textstats import (
        quality_classifier_score,
    )

    good = "the quality of the analysis is that it holds for the data " * 9
    df = spark.createDataFrame(
        [(1, good.strip(), "en", "s", 1), (2, "x y", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r.doc_id: r for r in quality_classifier_score(df).collect()}
    g, b = out[1], out[2]
    assert g.score > b.score and g.keep and not b.keep
    # replay the logistic arithmetic on the engine's own features
    for r in (g, b):
        z = round(-2.0 + 1.5 * r.f_len + 1.2 * r.f_tok + 2.0 * r.f_stop, 6)
        assert r.score == round(1.0 / (1.0 + math.exp(-z)), 6)


def test_seasonal_adjust_removes_pure_weekly_pattern(spark):
    from big_data_trend_analysis_spark.operators.drift import seasonal_adjust_dow

    # 4 full weeks of a purely weekly signal: dow d gets 10+d events
    counts = []
    for week in range(4):
        for d in range(7):
            counts.append(10 + d)
    ev = _daily_events(spark, {"x": counts})
    rows = seasonal_adjust_dow(ev).collect()
    g_mean = sum(counts) / len(counts)
    # every residual is 0 -> adjusted == global mean, strength == 1
    assert all(r.adjusted == round(g_mean, 6) for r in rows)
    assert all(r.strength == 1.0 for r in rows)


def test_k_anonymity_flags_small_classes(spark):
    import datetime

    from big_data_trend_analysis_spark.operators.relational import (
        k_anonymity_check,
    )

    rows = []
    # safe class: 6 events, same (type, dow, hour)
    for i in range(6):
        rows.append((i, datetime.datetime(2024, 1, 1, 9), 1, "view", 1.0, "{}"))
    # risky class: 2 events
    for i in range(2):
        rows.append((10 + i, datetime.datetime(2024, 1, 1, 23), 1, "view", 1.0, "{}"))
    ev = spark.createDataFrame(rows, _EVT)
    out = {(r.event_type, r.hour): r for r in k_anonymity_check(ev).collect()}
    assert out[("view", 9)].is_safe and not out[("view", 23)].is_safe
    assert out[("view", 9)].n_risky_classes == 1
    assert out[("view", 9)].n_risky_rows == 2


def test_triangle_count_oriented_enumeration(spark):
    from big_data_trend_analysis_spark.operators.graph import triangle_count

    part = spark.createDataFrame(
        [(1, "A"), (2, "B"), (3, "C"), (4, "D")],
        "p_partkey long, p_brand string",
    )
    # 3 baskets x {A,B,C} -> triangle ABC; 3 baskets x {A,D} -> edge only
    li_rows = []
    for o in range(3):
        li_rows += [(o, 1), (o, 2), (o, 3)]
    for o in range(10, 13):
        li_rows += [(o, 1), (o, 4)]
    li = spark.createDataFrame(li_rows, "l_orderkey long, l_partkey long")
    out = {r.brand: r for r in triangle_count(li, part, min_support=3).collect()}
    assert set(out) == {"A", "B", "C"}  # D is in no triangle
    assert all(r.n_triangles == 1 and r.total_triangles == 1 for r in out.values())


def test_welch_t_matches_hand_moments(spark):
    import math

    from big_data_trend_analysis_spark.operators.drift import ab_test_welch

    a_vals = [100.0, 110.0, 120.0, 130.0]  # R cohort
    b_vals = [100.0, 100.0, 101.0]  # N cohort
    rows = [(i, 1, 1, 1, v, 0.0, 0.0, "R", "O",
             datetime.datetime(2024, 1, 1)) for i, v in enumerate(a_vals)]
    rows += [(100 + i, 1, 1, 1, v, 0.0, 0.0, "N", "O",
              datetime.datetime(2024, 1, 1)) for i, v in enumerate(b_vals)]
    li = spark.createDataFrame(
        [(r[0], r[1], r[2], r[3], 1.0, r[4], r[5], r[6], r[7], r[8], r[9])
         for r in rows],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    r = ab_test_welch(li).collect()[0]

    def moments(vals):
        n = len(vals)
        sx, sxx = sum(vals), sum(v * v for v in vals)
        return n, round(sx / n, 6), round((sxx - sx * sx / n) / (n - 1), 6)

    n_a, mean_a, var_a = moments(a_vals)
    n_b, mean_b, var_b = moments(b_vals)
    assert (r.n_a, r.mean_a, r.var_a) == (n_a, mean_a, var_a)
    assert (r.n_b, r.mean_b, r.var_b) == (n_b, mean_b, var_b)
    se2 = var_a / n_a + var_b / n_b
    assert r.t_stat == round((mean_a - mean_b) / math.sqrt(se2), 6)
    assert r.df_welch == round(
        se2 * se2
        / ((var_a / n_a) ** 2 / (n_a - 1) + (var_b / n_b) ** 2 / (n_b - 1)),
        6,
    )
    # the gate is the t quantile at the Welch df, not the normal 1.96
    # — and at df ≈ 3.4 it is far stricter (t_crit > 2.9)
    assert r.t_crit > 2.9
    assert r.significant == (abs(r.t_stat) > r.t_crit)


def test_cap_per_key_survivors_are_replayable(spark):
    import hashlib

    from big_data_trend_analysis_spark.operators.textstats import cap_per_key

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    ids = list(range(30))
    df = spark.createDataFrame([(i, "t", "en", "s", 1) for i in ids], schema)
    r = cap_per_key(df, max_per_key=5).collect()[0]
    assert (r.n_docs, r.n_kept, r.n_dropped) == (30, 5, 25)
    # the md5 order is portable: replay the exact survivor set here
    kept = sorted(
        ids, key=lambda i: (hashlib.md5(f"{i}:17".encode()).hexdigest(), i)
    )[:5]
    assert r.sum_kept_ids == sum(kept)


def test_standardize_features_exact_moments(spark):
    ev_rows = [(i, datetime.datetime(2024, 1, 1), 1, "a", float(v), "{}")
               for i, v in enumerate([1, 2, 3, 4])]
    ev_rows += [(10, datetime.datetime(2024, 1, 1), 1, "b", 7.0, "{}")]
    ev = spark.createDataFrame(ev_rows, _EVT)

    from big_data_trend_analysis_spark.operators.aggregates import (
        standardize_features,
    )

    out = {(r.event_type, r.event_id): r for r in standardize_features(ev).collect()}
    # group a: mean 2.5, var (30 - 100/4)/3 = 5/3, std = sqrt(5/3)
    std = round((5 / 3) ** 0.5, 6)
    r = out[("a", 3)]  # value 4.0
    assert r.z == round((4.0 - 2.5) / std, 6)
    assert r.minmax == 1.0
    assert out[("a", 0)].minmax == 0.0
    # singleton group: std undefined -> z NULL; minmax degenerate -> NULL
    s = out[("b", 10)]
    assert s.z is None and s.minmax is None


def test_survival_km_hand_computed_curve(spark):
    import math

    # 10 users: 4 churn on day 1, 3 on day 2, 3 still active on day 3
    rows, eid = [], 0
    for u in range(10):
        last = 1 if u < 4 else (2 if u < 7 else 3)
        for d in range(1, last + 1):
            rows.append((eid, datetime.datetime(2024, 1, d), u, "view", 1.0, "{}"))
            eid += 1
    ev = spark.createDataFrame(rows, _EVT)

    from big_data_trend_analysis_spark.operators.temporal import survival_km

    out = {r.day.day: r for r in survival_km(ev).collect()}
    assert (out[1].n_risk, out[1].d_churned) == (10, 4)
    assert (out[2].n_risk, out[2].d_churned) == (6, 3)
    assert (out[3].n_risk, out[3].d_churned) == (3, 0)  # censored, not churned

    def s(*hazards):
        return round(
            math.exp(sum(round(math.log(1 - h), 6) for h in hazards)), 6
        )

    assert out[1].s_km == s(0.4)
    assert out[2].s_km == s(0.4, 0.5)
    assert out[3].s_km == s(0.4, 0.5)  # censor day carries S unchanged


def test_rfm_quartiles_are_total_ordered(spark):
    rows = []
    day0 = datetime.datetime(2024, 1, 1)
    # customer c: c orders, each 100.0, last order on day c
    for c in range(1, 9):
        for k in range(c):
            rows.append((c * 100 + k, c, "O", 100.0,
                         day0 + datetime.timedelta(days=c), "1-URGENT"))
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    from big_data_trend_analysis_spark.operators.temporal import rfm_segmentation

    out = {r.o_custkey: r for r in rfm_segmentation(orders).collect()}
    # customer 8: most recent, most frequent, highest spend -> '111'
    assert out[8].segment == "111" and out[8].recency_days == 0
    # customer 1: stalest, least frequent, lowest spend -> '444'
    assert out[1].segment == "444" and out[1].recency_days == 7
    # ntile(4) over 8 customers: exactly 2 per quartile on each axis
    from collections import Counter

    for axis in ("r_q", "f_q", "m_q"):
        assert Counter(getattr(r, axis) for r in out.values()) == {
            1: 2, 2: 2, 3: 2, 4: 2
        }


def test_event_paths_triples_counted_once(spark):
    rows = []
    ts0 = datetime.datetime(2024, 1, 1)
    # user 1: a b c d -> paths "a>b>c", "b>c>d"; user 2: a b c -> "a>b>c"
    for i, t in enumerate(["a", "b", "c", "d"]):
        rows.append((i, ts0 + datetime.timedelta(minutes=i), 1, t, 1.0, "{}"))
    for i, t in enumerate(["a", "b", "c"]):
        rows.append((10 + i, ts0 + datetime.timedelta(minutes=i), 2, t, 1.0, "{}"))
    ev = spark.createDataFrame(rows, _EVT)

    from big_data_trend_analysis_spark.operators.temporal import event_paths_topk

    out = {r.path: r for r in event_paths_topk(ev).collect()}
    assert out["a > b > c"].n_paths == 2 and out["a > b > c"].rnk == 1
    assert out["b > c > d"].n_paths == 1
    assert len(out) == 2  # user boundaries never produce cross-user paths


def test_autocorr_skips_calendar_gaps(spark):
    # days 1,2,3,5,6 with counts 2,4,2,4,2 — day 4 has no events, so
    # the (5,3) adjacency is a 2-day jump and must NOT count at lag 1
    # (it must count at lag 2 instead).
    counts = {1: 2, 2: 4, 3: 2, 5: 4, 6: 2}
    rows, eid = [], 0
    for d, n in counts.items():
        for _ in range(n):
            rows.append((eid, datetime.datetime(2024, 1, d), 1, "view", 1.0, "{}"))
            eid += 1
    ev = spark.createDataFrame(rows, _EVT)

    from big_data_trend_analysis_spark.operators.drift import autocorr_daily

    mu = sum(counts.values()) / 5  # 2.8
    dev = {d: round(n - mu, 6) for d, n in counts.items()}
    den = sum(round(v * v, 6) for v in dev.values())

    def acf(pairs):
        return round(sum(round(dev[a] * dev[b], 6) for a, b in pairs) / den, 6)

    out = {r.lag: r.acf for r in autocorr_daily(ev).collect()}
    assert out[1] == acf([(2, 1), (3, 2), (6, 5)])  # (5,3) excluded
    assert out[2] == acf([(3, 1), (5, 3)])  # true 2-day gaps only
    # lag 3: (6,3) and (5,2) are exactly 3 calendar days apart
    assert out[3] == acf([(6, 3), (5, 2)])
