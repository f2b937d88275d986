"""Round-12 sixth batch: log-rank / Hurst / odds ratio / naive Bayes.

Hand-worked anchors on planted inputs; oracle parity at sf0.01 is the
cross-engine check, these pin the STATISTIC.
"""

from __future__ import annotations

import math

from tests.test_round11_batch2 import _events


# --------------------------------------------------------------- log_rank


def test_log_rank_identical_cohorts_is_zero(spark):
    """Symmetric cohorts churn identically: O = E, chi2 = 0.
    Days 1/2 each kill one user per cohort; day 3 censors the rest:
    e1 = 2·(3/6) = 1 and 2·(2/4) = 1, v = 0.4 + 1/3."""
    from big_data_trend_analysis_spark.operators.temporal import (
        log_rank_test,
    )

    rows = []
    eid = 0
    for uid, day, etype in [
        (1, 1, "signup"), (2, 2, "signup"), (3, 3, "signup"),
        (4, 1, "click"), (5, 2, "click"), (6, 3, "click"),
    ]:
        eid += 1
        rows.append((eid, day, uid, etype, 1.0))
    r = log_rank_test(_events(spark, rows)).collect()[0]
    assert r.n_users_g1 == 3 and r.n_users_g0 == 3
    assert r.obs_g1 == 2 and r.exp_g1 == 2.0
    assert abs(r.var_sum - round(0.4 + round(1.0 / 3.0, 6), 6)) < 1e-6
    assert r.chi2_stat == 0.0 and not r.reject


def test_log_rank_detects_divergent_cohorts(spark):
    """Cohort 1 churns on day 1 en masse while cohort 0 survives to
    censoring: O − E is large and the 1-df gate trips."""
    from big_data_trend_analysis_spark.operators.temporal import (
        log_rank_test,
    )

    rows = []
    eid = 0
    uid = 0
    for _ in range(10):  # g1: all churn day 1
        uid += 1
        eid += 1
        rows.append((eid, 1, uid, "signup", 1.0))
    for _ in range(10):  # g0: all censored at day 5
        uid += 1
        eid += 1
        rows.append((eid, 5, uid, "click", 1.0))
    r = log_rank_test(_events(spark, rows)).collect()[0]
    assert r.obs_g1 == 10 and abs(r.exp_g1 - 5.0) < 1e-9
    assert r.reject


# ---------------------------------------------------------- hurst_exponent


def test_hurst_antipersistent_series(spark):
    """Alternating counts (1,2,1,2,…) over 16 days: var(m=1) > 0 but
    every even-block mean is exactly 1.5, so var collapses at m ≥ 2 —
    the anti-persistent signature H < ½ (slope through the 1e-6
    clamp is steeply negative)."""
    from big_data_trend_analysis_spark.operators.trend import (
        hurst_exponent,
    )

    rows, eid = [], 0
    for day in range(1, 17):
        for _ in range(1 if day % 2 else 2):
            eid += 1
            rows.append((eid, day, eid, "t", 1.0))
    out = {r.m: r for r in hurst_exponent(_events(spark, rows)).collect()}
    assert set(out) == {1, 2, 4, 8}
    assert abs(out[1].var_m - round(16 * 0.25 / 15.0, 6)) < 1e-6
    assert out[2].var_m == 0.0 and out[8].var_m == 0.0
    assert out[2].n_blocks == 8 and out[8].n_blocks == 2
    h = out[1].hurst
    assert h == out[8].hurst  # repeated scalar
    assert h < 0.5


# ------------------------------------------------------------ odds_ratio_ci


def test_odds_ratio_hand_table(spark):
    """Values 1..6 (median 3): weekend days carry (4,5,1), weekdays
    (6,2,3) → a=2,b=1,c=1,d=2: OR = 4, Woolf se = √3."""
    from big_data_trend_analysis_spark.operators.drift import odds_ratio_ci

    # 2024-01-06 is a Saturday, 2024-01-07 a Sunday
    rows = []
    for i, (day, v) in enumerate(
        [(6, 4.0), (7, 5.0), (6, 1.0), (1, 6.0), (2, 2.0), (3, 3.0)]
    ):
        rows.append((i + 1, day, i + 1, "t", v))
    r = odds_ratio_ci(_events(spark, rows)).collect()[0]
    assert (r.n_a, r.n_b, r.n_c, r.n_d) == (2, 1, 1, 2)
    assert r.odds_ratio == 4.0
    se = math.sqrt(3.0)
    assert abs(r.ci_lo - round(math.exp(math.log(4) - 1.959964 * se), 6)) < 1e-6
    assert abs(r.ci_hi - round(math.exp(math.log(4) + 1.959964 * se), 6)) < 1e-6
    assert not r.significant


# --------------------------------------------------------- naive_bayes_lang


def test_naive_bayes_separable_vocab(spark):
    """Two langs with disjoint vocabularies: every test doc scores its
    own lang's tokens overwhelmingly higher — accuracy 1, confusion
    diagonal."""
    from big_data_trend_analysis_spark.operators.textstats import (
        naive_bayes_lang,
    )

    docs = []
    for i in range(40):
        lang = "aa" if i % 2 == 0 else "bb"
        text = "x y x" if lang == "aa" else "z w z"
        docs.append((i, text, lang, "s", len(text)))
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )
    out = naive_bayes_lang(df).collect()
    assert out, "some docs must fall in the 20% test bucket"
    assert all(r.lang_true == r.lang_pred for r in out)
    assert out[0].accuracy == 1.0
    assert sum(r.n_docs for r in out) == out[0].n_test
