"""Round-11 second batch: semantic tests with hand-computed anchors.

Oracle parity (test_oracle_parity) proves Spark == DuckDB; these pin
that both equal the STATISTIC — known-value checks on planted series
where H/ρ/z/θ/streaks are computable by hand.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

TS = "2024-01-%02d 06:00:00"


def _events(spark, rows):
    """rows = (event_id, day_of_jan, user_id, event_type, value)."""
    return spark.createDataFrame(
        [
            (eid, TS % day, uid, etype, float(val))
            for eid, day, uid, etype, val in rows
        ],
        "event_id long, ts_s string, user_id long, event_type string, "
        "value double",
    ).select(
        "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
    )


def test_kruskal_wallis_matches_hand_computation(spark):
    """Three groups, no ties: H = 12/(N(N+1))·Σ n_g R̄_g² − 3(N+1).

    Values 1..9 split a={1,4,7} (ranks 1,4,7), b={2,5,8}, c={3,6,9}:
    rank sums 12/15/18, H = 12/(9·10)·(48+75+108) − 30 = 0.8.
    """
    from big_data_trend_analysis_spark.operators.drift import kruskal_wallis

    rows = []
    for i, (g, v) in enumerate(
        [("a", 1), ("b", 2), ("c", 3), ("a", 4), ("b", 5), ("c", 6),
         ("a", 7), ("b", 8), ("c", 9)]
    ):
        rows.append((i, 1 + i % 3, i, g, v))
    out = {r.event_type: r for r in kruskal_wallis(_events(spark, rows)).collect()}
    assert out["a"].h_stat == pytest.approx(0.8, abs=1e-6)
    assert out["a"].df_used == 2
    assert out["a"].chi2_crit == 5.991465
    assert not out["a"].reject
    # doubled rank sums: a has ranks 1,4,7 → Σ2r = 24
    assert out["a"].rank_sum == 24.0
    assert out["b"].rank_sum == 30.0
    assert out["c"].rank_sum == 36.0


def test_spearman_perfect_monotone_pairs(spark):
    """Type b's daily counts are a strictly increasing function of
    type a's → ρ = 1; type c reverses the order → ρ(a,c) = −1."""
    from big_data_trend_analysis_spark.operators.drift import (
        spearman_daily_corr,
    )

    rows, eid = [], 0
    a_counts = [2, 5, 3, 8, 6, 4, 7]
    for d, ca in enumerate(a_counts, start=1):
        for etype, c in (("a", ca), ("b", ca + 3), ("c", 10 - ca)):
            for _ in range(c):
                rows.append((eid, d, eid % 5, etype, 1.0))
                eid += 1
    out = {
        (r.type_a, r.type_b): r.rho
        for r in spearman_daily_corr(_events(spark, rows)).collect()
    }
    assert out[("a", "b")] == pytest.approx(1.0, abs=1e-6)
    assert out[("a", "c")] == pytest.approx(-1.0, abs=1e-6)
    assert out[("b", "c")] == pytest.approx(-1.0, abs=1e-6)


def test_proportions_ztest_hand_value(spark):
    """80/100 vs 60/100 high-value: pooled p=0.7,
    z = 0.2/√(0.21·0.02) ≈ 3.086067 → significant."""
    from big_data_trend_analysis_spark.operators.drift import (
        proportions_ztest,
    )

    rows = []
    eid = 0
    for day, n_conv in ((5, 80), (15, 60)):  # day 5 < cut, 15 >= cut
        for i in range(100):
            rows.append((eid, day, i, "t", 9.0 if i < n_conv else 1.0))
            eid += 1
    r = proportions_ztest(_events(spark, rows)).collect()[0]
    assert (r.n_base, r.n_cur, r.conv_base, r.conv_cur) == (100, 100, 80, 60)
    assert r.z_score == pytest.approx(3.086067, abs=1e-6)
    assert r.significant
    assert r.p_value < 0.01


def test_page_hinkley_fires_on_level_shift(spark):
    """Flat 10/day for two weeks, then 60/day: the PH statistic grows
    after the shift and crosses a λ sized for the fixture."""
    from big_data_trend_analysis_spark.operators.drift import page_hinkley

    rows, eid = [], 0
    for d in range(1, 29):
        c = 10 if d <= 14 else 60
        for _ in range(c):
            rows.append((eid, d, eid % 3, "t", 1.0))
            eid += 1
    out = sorted(
        page_hinkley(_events(spark, rows), lam=100.0).collect(),
        key=lambda r: r.day,
    )
    pre = [r for r in out if r.day <= datetime.date(2024, 1, 14)]
    post = [r for r in out if r.day >= datetime.date(2024, 1, 20)]
    assert all(not r.alarm for r in pre)
    assert all(r.ph_stat == 0.0 for r in pre)  # flat series: no drift
    assert any(r.alarm for r in post)
    # PH is monotone here once the shift starts accumulating
    assert post[-1].ph_stat > 100.0


def test_permutation_test_detects_planted_shift(spark):
    """Base values ≈ 100, current ≈ 1: no Bernoulli relabel of 100
    replicates reaches the observed gap → p = 1/101."""
    from big_data_trend_analysis_spark.operators.drift import (
        permutation_test_mean,
    )

    rows = [(i, 5, i, "t", 100.0 + (i % 3)) for i in range(60)]
    rows += [(100 + i, 15, i, "t", 1.0 + (i % 2)) for i in range(60)]
    r = permutation_test_mean(_events(spark, rows)).collect()[0]
    assert r.n_perms == 100
    assert r.n_extreme == 0
    assert r.p_value == pytest.approx(1 / 101, abs=1e-6)


def test_cuped_recovers_theta_and_reduces_variance(spark):
    """Y = 2X exactly (every user's post sum doubles their pre sum):
    θ = 2 and the CUPED variance collapses to ~0."""
    from big_data_trend_analysis_spark.operators.drift import (
        cuped_adjusted_ab,
    )

    rows, eid = [], 0
    for uid in range(12):
        x = 10.0 + 5 * uid
        rows.append((eid, 5, uid, "t", x)); eid += 1
        rows.append((eid, 15, uid, "t", 2 * x)); eid += 1
    out = {r.arm: r for r in cuped_adjusted_ab(_events(spark, rows)).collect()}
    for arm in (0, 1):
        assert out[arm].theta == pytest.approx(2.0, abs=1e-6)
        assert out[arm].var_y > 0
        assert abs(out[arm].var_y_cuped) < 1e-6
        assert out[arm].var_reduction_pct == pytest.approx(100.0, abs=1e-3)


def test_user_activity_islands_counts_streaks(spark):
    """User 1 active days 1-3, 5, 7-10 → 3 streaks, longest 4 starting
    day 7; a tie between two 3-day streaks picks the earlier start."""
    from big_data_trend_analysis_spark.operators.windows import (
        user_activity_islands,
    )

    rows = [(i, d, 1, "t", 1.0) for i, d in enumerate([1, 2, 3, 5, 7, 8, 9, 10])]
    rows += [
        (100 + i, d, 2, "t", 1.0)
        for i, d in enumerate([1, 2, 3, 8, 9, 10])
    ]
    out = {r.user_id: r for r in user_activity_islands(_events(spark, rows)).collect()}
    u1 = out[1]
    assert (u1.n_active_days, u1.n_streaks, u1.longest_streak) == (8, 3, 4)
    assert u1.longest_streak_start == datetime.date(2024, 1, 7)
    u2 = out[2]
    assert (u2.n_streaks, u2.longest_streak) == (2, 3)
    assert u2.longest_streak_start == datetime.date(2024, 1, 1)


def test_paragraph_dedup_drops_shared_boilerplate(spark):
    """A verbatim 10-word header shared by 3 docs is removed from all
    three; the unique bodies survive with matching clean fingerprints."""
    import hashlib

    from big_data_trend_analysis_spark.operators.textstats import (
        paragraph_dedup,
    )

    header = " ".join(f"h{i}" for i in range(10))
    bodies = {
        1: " ".join(f"a{i}" for i in range(10)),
        2: " ".join(f"b{i}" for i in range(10)),
        3: " ".join(f"c{i}" for i in range(10)),
    }
    docs = spark.createDataFrame(
        [(d, f"{header} {b}") for d, b in bodies.items()]
        + [(4, " ".join(f"d{i}" for i in range(20)))],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in paragraph_dedup(docs).collect()}
    for d in (1, 2, 3):
        assert (out[d].n_paras, out[d].n_dup_paras) == (2, 1)
        assert out[d].clean_fp == hashlib.md5(
            bodies[d].encode()
        ).hexdigest()
    assert (out[4].n_paras, out[4].n_dup_paras) == (2, 0)


def test_gopher_rules_on_crafted_docs(spark):
    from big_data_trend_analysis_spark.operators.textstats import (
        gopher_quality_rules,
    )

    good = " ".join(
        ["the", "be", "to"] + [f"word{i:02d}" for i in range(57)]
    )  # 60 words, mean len ~6, 2+ stopwords
    short = "tiny doc with the and that"
    symbols = " ".join(["the", "of"] + ["#"] * 58)
    docs = spark.createDataFrame(
        [(1, good), (2, short), (3, symbols)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in gopher_quality_rules(docs).collect()}
    assert out[1].pass_gopher
    assert not out[2].rule_word_count and not out[2].pass_gopher
    assert out[2].rule_stopwords  # 'the'+'that'+'and'+'with' present
    assert not out[3].rule_symbol_ratio and not out[3].pass_gopher
    assert not out[3].rule_mean_word_len  # '#' words pull mean < 3


def test_ccnet_buckets_split_terciles(spark):
    """Six docs at three perplexity levels → two per bucket, ties
    sharing a bucket (rare-token docs land in tail)."""
    from big_data_trend_analysis_spark.operators.textstats import (
        ccnet_perplexity_buckets,
    )

    common = " ".join(["alpha"] * 20)
    mid = " ".join(["alpha", "beta"] * 10)
    rare = " ".join(["alpha"] + [f"uniq{i}" for i in range(19)])
    docs = spark.createDataFrame(
        [(1, common), (2, common), (3, mid), (4, mid),
         (5, rare), (6, rare.replace("uniq", "qinu"))],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.bucket for r in ccnet_perplexity_buckets(docs).collect()}
    assert out[1] == out[2] == "head"
    assert out[3] == out[4] == "middle"
    assert out[5] == out[6] == "tail"


def test_dsir_weights_favor_target_like_docs(spark):
    """Docs made of target-domain-distinctive tokens get positive log
    weights; pool-distinctive docs negative."""
    from big_data_trend_analysis_spark.operators.textstats import (
        dsir_importance_weights,
    )

    docs = spark.createDataFrame(
        [
            (1, " ".join(["tgt"] * 20), "src0"),
            (2, " ".join(["tgt"] * 10 + ["pool"] * 10), "src0"),
            (3, " ".join(["pool"] * 20), "src1"),
            (4, " ".join(["tgt"] * 20), "src1"),  # target-LIKE raw doc
        ],
        "doc_id long, text string, source string",
    )
    out = {r.doc_id: r for r in dsir_importance_weights(docs).collect()}
    assert out[1].log_weight > 0
    assert out[3].log_weight < 0
    # selection is content-based, not source-based: doc 4 scores like doc 1
    assert out[4].log_weight == out[1].log_weight


def test_croston_two_series_recurrence(spark):
    """Demands 4 (day 1), 2 (day 6), 8 (day 8): ẑ/q̂ follow the
    textbook α=0.2 updates with q₁=1 by convention."""
    from big_data_trend_analysis_spark.operators.temporal import (
        croston_intermittent,
    )

    rows = []
    eid = 0
    for day, n in ((1, 4), (6, 2), (8, 8)):
        for _ in range(n):
            rows.append((eid, day, eid % 3, "t", 300.0))
            eid += 1
    # low-value noise on other days must NOT create demand
    rows += [(900 + i, 3, i, "t", 1.0) for i in range(5)]
    out = sorted(
        croston_intermittent(_events(spark, rows)).collect(),
        key=lambda r: r.day,
    )
    assert [(r.z, r.q) for r in out] == [(4, 1), (2, 5), (8, 2)]
    assert out[0].z_hat == 4.0 and out[0].q_hat == 1.0
    # ẑ₂ = .2·2 + .8·4 = 3.6 ; q̂₂ = .2·5 + .8·1 = 1.8
    assert out[1].z_hat == 3.6 and out[1].q_hat == 1.8
    assert out[1].forecast == 2.0
    # ẑ₃ = .2·8 + .8·3.6 = 4.48 ; q̂₃ = .2·2 + .8·1.8 = 1.84
    assert out[2].z_hat == 4.48 and out[2].q_hat == 1.84


def test_funnel_latency_keeps_earlier_only_purchasers(spark):
    """User 1 purchases BEFORE their first view (unconverted but still
    a viewer); user 2 converts after 3600 s; user 3 never purchases."""
    from big_data_trend_analysis_spark.operators.temporal import (
        funnel_time_to_convert,
    )

    rows = [
        (1, 2, 1, "purchase", 1.0), (2, 5, 1, "view", 1.0),
        (3, 5, 2, "view", 1.0), (4, 5, 2, "purchase", 1.0),
        (5, 9, 3, "view", 1.0),
    ]
    ev = _events(spark, rows).withColumn(
        "ts",
        F.when(F.col("event_id") == 4, F.col("ts") + F.expr("interval 1 hour"))
        .otherwise(F.col("ts")),
    )
    r = funnel_time_to_convert(ev).collect()[0]
    assert (r.n_viewers, r.n_converted) == (3, 1)
    assert r.median_s == 3600
    assert r.mean_s == 3600.0


def test_kendall_tau_on_monotone_series(spark):
    """Strictly increasing daily counts → τ = 1; strictly decreasing
    → τ = −1."""
    from big_data_trend_analysis_spark.operators.trend import (
        kendall_tau_daily,
    )

    rows, eid = [], 0
    for d, c in enumerate([1, 2, 3, 4, 5], start=1):
        for _ in range(c):
            rows.append((eid, d, eid, "up", 1.0)); eid += 1
        for _ in range(7 - c):
            rows.append((eid, d, eid, "down", 1.0)); eid += 1
    out = {r.event_type: r for r in kendall_tau_daily(_events(spark, rows)).collect()}
    assert out["up"].tau_b == 1.0
    assert out["down"].tau_b == -1.0
    assert out["up"].n_concordant == 10 and out["up"].n_discordant == 0


def test_mcnemar_counts_discordant_pairs(spark):
    """6 users: 3 convert post-only, 1 pre-only, 1 both, 1 neither →
    b=1, c=3, χ² = (|1−3|−1)²/4 = 0.25; clamped to 0 when b=c."""
    from big_data_trend_analysis_spark.operators.drift import mcnemar_test

    rows = []
    # user 0: both; 1: pre-only; 2,3,4: post-only; 5: neither
    rows += [(1, 5, 0, "t", 9.0), (2, 15, 0, "t", 9.0)]
    rows += [(3, 5, 1, "t", 9.0), (4, 15, 1, "t", 1.0)]
    for i, u in enumerate((2, 3, 4)):
        rows += [(10 + 2 * i, 5, u, "t", 1.0), (11 + 2 * i, 15, u, "t", 9.0)]
    rows += [(30, 5, 5, "t", 1.0), (31, 15, 5, "t", 1.0)]
    r = mcnemar_test(_events(spark, rows)).collect()[0]
    assert (r.n_both, r.n_pre_only, r.n_post_only, r.n_neither) == (1, 1, 3, 1)
    assert r.chi2 == 0.25
    assert not r.reject

    balanced = _events(
        spark,
        [(1, 5, 0, "t", 9.0), (2, 15, 0, "t", 1.0),
         (3, 5, 1, "t", 1.0), (4, 15, 1, "t", 9.0)],
    )
    r2 = mcnemar_test(balanced).collect()[0]
    assert r2.chi2 == 0.0  # |b−c| = 0: clamped, not 1/(b+c)


def test_srm_detects_broken_split(spark):
    """A 75/25 split over 400 users is a textbook SRM (χ² = 100,
    p ≈ 0); a clean 50/50 split is not."""
    from big_data_trend_analysis_spark.operators.drift import srm_check

    rows = []
    for i in range(400):
        uid = 2 * i if i % 4 < 3 else 2 * i + 1  # 300 even, 100 odd
        rows.append((i, 5, uid, "t", 1.0))
    r = srm_check(_events(spark, rows)).collect()[0]
    assert (r.n_arm0, r.n_arm1) == (300, 100)
    assert r.chi2 == 100.0
    assert r.srm_detected

    clean = _events(spark, [(i, 5, i, "t", 1.0) for i in range(400)])
    r2 = srm_check(clean).collect()[0]
    assert r2.chi2 == 0.0 and not r2.srm_detected


def test_tokenizer_fertility_reflects_vocab_bias(spark):
    """The merge rules chase the dominant language's pairs: lang 'a'
    words compress to 1 token, lang 'b' words stay fragmented."""
    from big_data_trend_analysis_spark.operators.textstats import (
        tokenizer_fertility,
    )

    docs = spark.createDataFrame(
        [(i, "xy xy xy xy xy xy", "a", "s") for i in range(5)]
        + [(10, "pq rs", "b", "s"), (11, "tu vw", "b", "s")],
        "doc_id long, text string, lang string, source string",
    )
    out = {r.lang: r for r in tokenizer_fertility(docs).collect()}
    # round 1 merges (x, y) — the dominant pair by far — so lang 'a'
    # compresses fully; round 2's leftover rule reaches at most ONE of
    # lang b's four words (7/4 = 1.75 tokens/word)
    assert out["a"].fertility == 1.0
    assert out["b"].fertility == 1.75
    assert out["b"].fertility > out["a"].fertility
    assert (out["a"].n_docs, out["b"].n_docs) == (5, 2)


def test_item_cf_cosine_hand_values(spark):
    """Orders {1,2} both contain parts (10, 20); order 3 has (10, 30):
    cosine(10,20) = 2/√(3·2), cosine(10,30) = 1/√(3·1) — ranks follow."""
    import math

    from big_data_trend_analysis_spark.operators.aggregates import (
        item_cf_neighbors,
    )

    rows = [(1, 10), (1, 20), (2, 10), (2, 20), (3, 10), (3, 30)]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = {
        (r.item, r.neighbor): r
        for r in item_cf_neighbors(li, min_co=1).collect()
    }
    r = out[(10, 20)]
    assert (r.n_co, r.n_item, r.n_neighbor) == (2, 3, 2)
    assert r.cosine == round(2 / math.sqrt(6), 6)
    assert r.rnk == 1
    assert out[(10, 30)].cosine == round(1 / math.sqrt(3), 6)
    assert out[(10, 30)].rnk == 2
    assert out[(20, 10)].rnk == 1 and out[(30, 10)].rnk == 1


def test_brown_forsythe_flags_planted_variance_shift(spark):
    """wide = {41×15, 59×15} (median 41 ⇒ z ∈ {0, 18}), tight =
    {49×15, 51×15} (z ∈ {0, 2}): between = 960, within = 2460,
    W = 58·960/2460 = 22.634146 → reject; identical groups don't.
    Round 12: the gate is F(1, 58) = t(58, .975)² ≈ 4.007 — the
    general-df₂ upgrade of the old F(1, ∞) = 3.841 convention."""
    from big_data_trend_analysis_spark.operators.drift import (
        brown_forsythe_test,
    )
    from big_data_trend_analysis_spark.functions.stats import (
        Z_975, _G1, _G2, _G3, _G4,
    )

    rows, eid = [], 0
    for i in range(30):
        rows.append((eid, 5, i, "wide", 50.0 + (9 if i % 2 else -9))); eid += 1
        rows.append((eid, 5, i, "tight", 50.0 + (1 if i % 2 else -1))); eid += 1
    out = {r.event_type: r for r in brown_forsythe_test(_events(spark, rows)).collect()}
    r = out["wide"]
    inv = 1.0 / 58.0
    t58 = Z_975 + inv * (_G1 + inv * (_G2 + inv * (_G3 + inv * _G4)))
    assert r.df1 == 1 and r.df2 == 58
    assert r.f_crit == round(t58 * t58, 6)
    assert 4.0 < r.f_crit < 4.02  # honest F(1,58), not the 3.841 limit
    assert r.w_stat == 22.634146
    assert r.mean_z == 9.0 and r.median_g == 41.0
    assert r.reject

    same = _events(
        spark,
        [(i, 5, i, "a" if i % 2 else "b", float(i % 7)) for i in range(40)],
    )
    r2 = brown_forsythe_test(same).collect()[0]
    assert not r2.reject


def test_pacf_matches_reference_recursion(spark):
    """pacf(1) == acf(1), and every deeper lag equals an independent
    Decimal replay of the Durbin–Levinson recursion over the
    operator's own ACF output."""
    import math
    from decimal import Decimal, ROUND_HALF_UP

    from big_data_trend_analysis_spark.operators.drift import pacf_daily

    rows, eid = [], 0
    counts = [4, 9, 2, 8, 5, 11, 7, 6, 10, 3, 9, 4, 12, 8, 5, 7, 13, 6]
    for d, c in enumerate(counts, start=1):
        for _ in range(c):
            rows.append((eid, d, eid % 3, "t", 1.0))
            eid += 1
    out = sorted(pacf_daily(_events(spark, rows)).collect(), key=lambda r: r.lag)
    assert [r.lag for r in out] == list(range(1, 8))
    assert out[0].pacf == out[0].acf

    q6 = Decimal("0.000001")
    r = {
        k: Decimal(repr(row.acf)).quantize(q6, rounding=ROUND_HALF_UP)
        for k, row in enumerate(out, start=1)
    }
    phi = {1: r[1]}
    expect = {1: float(r[1])}
    for k in range(2, 8):
        num = r[k] - sum(phi[j] * r[k - j] for j in range(1, k))
        den = Decimal(1) - sum(phi[j] * r[j] for j in range(1, k))
        pacf = Decimal(
            math.floor(float(num) / float(den) * 1_000_000 + 0.5)
        ) / Decimal(1_000_000)
        phi = {
            j: (phi[j] - pacf * phi[k - j]).quantize(q6, rounding=ROUND_HALF_UP)
            for j in range(1, k)
        } | {k: pacf}
        expect[k] = float(pacf)
    assert {row.lag: row.pacf for row in out} == expect
