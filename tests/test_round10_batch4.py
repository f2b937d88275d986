"""Planted-case unit tests for the round-10 fourth batch: the
nonparametric/multiple-testing statistics (Mann–Whitney U, Ljung–Box,
Benjamini–Hochberg), the deterministic Poisson bootstrap, rolling
distinct actives, document chunking, shingle TF-IDF cosine pair mining,
and the JL sign-projection.

Value parity against DuckDB is covered by test_oracle_parity's
parametrization (every new query is oracle-backed); these tests pin
SEMANTICS on hand-built inputs where the right answer is computed by
arithmetic, not by another engine.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _events(spark, rows):
    """rows = (event_id, ts_string, event_type, value)."""
    return spark.createDataFrame(
        rows, "event_id long, ts_s string, event_type string, value double"
    ).select(
        "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "event_type",
        "value",
    )


# ------------------------------------------------------- Mann–Whitney U


def test_mann_whitney_textbook_shift(spark):
    """5 baseline rows at 1.0 vs 5 current rows at 2.0 → z = −3 exactly.

    avgrank(1.0) = 3, avgrank(2.0) = 8 → R_base = 15, U = 0, μ = 12.5,
    σ² = (25/12)·(11 − 240/90) = 625/36 → σ = 25/6 → z = −12.5/(25/6).
    """
    from big_data_trend_analysis_spark.operators.drift import mann_whitney_u

    rows = [(i, "2024-01-05 00:00:00", "t", 1.0) for i in range(5)]
    rows += [(10 + i, "2024-01-20 00:00:00", "t", 2.0) for i in range(5)]
    r = mann_whitney_u(_events(spark, rows)).collect()[0]
    assert (r.n_base, r.n_cur) == (5, 5)
    assert r.u_stat == 0.0
    assert r.mu_u == 12.5
    assert r.z_score == -3.0
    assert r.significant is True


def test_mann_whitney_all_tied_is_degenerate(spark):
    from big_data_trend_analysis_spark.operators.drift import mann_whitney_u

    rows = [(i, "2024-01-05 00:00:00", "t", 7.0) for i in range(4)]
    rows += [(10 + i, "2024-01-20 00:00:00", "t", 7.0) for i in range(4)]
    r = mann_whitney_u(_events(spark, rows)).collect()[0]
    assert r.sigma_u is None and r.z_score is None
    assert r.significant is False


# ----------------------------------------------------------- Ljung–Box


def test_ljung_box_constant_series_cannot_reject(spark):
    """Identical daily counts → zero deviations → NULL ACF, no reject."""
    from big_data_trend_analysis_spark.operators.drift import ljung_box_check

    rows = []
    for d in range(1, 15):
        for i in range(3):
            rows.append((d * 10 + i, f"2024-01-{d:02d} 06:00:00", "t", 1.0))
    out = ljung_box_check(_events(spark, rows)).collect()
    assert len(out) == 7
    assert all(r.acf is None for r in out)
    assert all(r.df_used == 0 and r.reject is False for r in out)


def test_ljung_box_strong_trend_rejects(spark):
    """A steep monotone daily series is heavily autocorrelated."""
    from big_data_trend_analysis_spark.operators.drift import ljung_box_check

    rows = []
    eid = 0
    for d in range(1, 29):
        for _ in range(d * 5):
            rows.append((eid, f"2024-01-{d:02d} 06:00:00", "t", 1.0))
            eid += 1
    out = ljung_box_check(_events(spark, rows)).collect()
    assert out[0].df_used == 7
    assert out[0].chi2_crit == 14.067140
    assert out[0].q_stat > 14.067140
    assert all(r.reject is True for r in out)


# -------------------------------------------------- Benjamini–Hochberg


def test_bh_rejects_shifted_type_only(spark):
    from big_data_trend_analysis_spark.operators.drift import (
        benjamini_hochberg,
    )

    rows = []
    eid = 0
    # 'shift': base mean 11, current mean 21; 'same': identical cohorts
    for ts, lo in (("2024-01-05", 10.0), ("2024-01-20", 20.0)):
        for i in range(50):
            rows.append((eid, f"{ts} 00:00:00", "shift", lo + (i % 2) * 2))
            eid += 1
    for ts in ("2024-01-05", "2024-01-20"):
        for i in range(50):
            rows.append((eid, f"{ts} 00:00:00", "same", 10.0 + (i % 2) * 2))
            eid += 1
    out = {r.event_type: r for r in benjamini_hochberg(_events(spark, rows)).collect()}
    assert out["shift"].m_tests == 2 and out["same"].m_tests == 2
    assert out["shift"].reject is True and out["shift"].p_adj <= 0.10
    assert out["same"].reject is False and out["same"].p_value > 0.9
    # step-up monotonicity: adjusted p never decreases with rank
    ranked = sorted(
        (r for r in out.values() if r.p_rank is not None),
        key=lambda r: r.p_rank,
    )
    adj = [r.p_adj for r in ranked]
    assert adj == sorted(adj)


def test_bh_degenerate_cohort_excluded_from_m(spark):
    """A type with zero variance on both sides has NULL z and must not
    consume FDR budget."""
    from big_data_trend_analysis_spark.operators.drift import (
        benjamini_hochberg,
    )

    rows = []
    eid = 0
    for ts in ("2024-01-05", "2024-01-20"):
        for i in range(20):
            rows.append((eid, f"{ts} 00:00:00", "ok", 10.0 + (i % 2)))
            eid += 1
        for _ in range(20):
            rows.append((eid, f"{ts} 00:00:00", "flat", 5.0))
            eid += 1
    out = {r.event_type: r for r in benjamini_hochberg(_events(spark, rows)).collect()}
    assert out["flat"].p_value is None
    assert out["flat"].p_rank is None and out["flat"].reject is False
    assert out["ok"].m_tests == 1


# ------------------------------------------------------------ bootstrap


def test_bootstrap_ci_deterministic_and_ordered(spark):
    from big_data_trend_analysis_spark.operators.aggregates import (
        bootstrap_ci_mean,
    )

    events = spark.createDataFrame(
        [(i, float(i % 40)) for i in range(400)], "event_id long, value double"
    )
    a = bootstrap_ci_mean(events).collect()[0]
    b = bootstrap_ci_mean(events).collect()[0]
    assert a == b  # hash-driven weights: no RNG state anywhere
    assert a.n_rows == 400 and a.n_boot == 100
    assert a.ci_lo <= a.mean_obs <= a.ci_hi
    assert a.ci_lo < a.ci_hi


def test_bootstrap_partitioning_invariance(spark):
    """The resample is row-local: repartitioning must not move the CI."""
    from big_data_trend_analysis_spark.operators.aggregates import (
        bootstrap_ci_mean,
    )

    events = spark.createDataFrame(
        [(i, float((i * 7) % 23)) for i in range(300)],
        "event_id long, value double",
    )
    one = bootstrap_ci_mean(events.coalesce(1)).collect()[0]
    many = bootstrap_ci_mean(events.repartition(13)).collect()[0]
    assert one == many


# -------------------------------------------------- rolling active users


def test_rolling_active_users_window_membership(spark):
    from big_data_trend_analysis_spark.operators.windows import (
        rolling_active_users,
    )

    rows = [
        (1, "2024-01-01 10:00:00"),  # u1 active day 1
        (2, "2024-01-01 11:00:00"),  # u2 active day 1
        (2, "2024-01-08 09:00:00"),  # u2 active again day 8
    ]
    events = spark.createDataFrame(
        rows, "user_id long, ts_s string"
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    out = {str(r.day): r for r in rolling_active_users(events).collect()}
    assert out["2024-01-01"].dau == 2 and out["2024-01-01"].wau == 2
    # days 2–7 see no new activity but day-1 actives stay in the window
    for d in range(2, 8):
        assert out[f"2024-01-0{d}"].dau == 0
        assert out[f"2024-01-0{d}"].wau == 2
    # day 8: day-1 activity aged out, only u2's fresh touch remains
    assert out["2024-01-08"].dau == 1 and out["2024-01-08"].wau == 1
    # nothing beyond the last observed day
    assert max(out) == "2024-01-08"
    assert out["2024-01-03"].stickiness == 0.0


# --------------------------------------------------------- doc chunking


def test_doc_chunking_covers_every_token_with_overlap(spark):
    from big_data_trend_analysis_spark.operators.textstats import doc_chunking

    text_long = " ".join(f"w{i}" for i in range(100))
    docs = spark.createDataFrame(
        [(1, text_long), (2, "a b c")], "doc_id long, text string"
    )
    out = doc_chunking(docs).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    long_chunks = sorted(by_doc[1], key=lambda r: r.chunk_id)
    assert [r.start_tok for r in long_chunks] == [0, 48]
    assert [r.n_tok for r in long_chunks] == [64, 52]
    # chunk 1 ends at token 99: start 48 + 52 tokens reaches the tail
    assert long_chunks[-1].start_tok + long_chunks[-1].n_tok == 100
    short = by_doc[2]
    assert len(short) == 1 and short[0].n_tok == 3 and short[0].start_tok == 0


def test_doc_chunking_fingerprints_chunk_text(spark):
    import hashlib

    from big_data_trend_analysis_spark.operators.textstats import doc_chunking

    docs = spark.createDataFrame([(7, "x y z")], "doc_id long, text string")
    r = doc_chunking(docs).collect()[0]
    assert r.chunk_fp == hashlib.md5(b"x y z").hexdigest()


# --------------------------------------------------- tf-idf cosine pairs


def test_tfidf_identical_docs_score_unit_cosine(spark):
    from big_data_trend_analysis_spark.operators.textstats import (
        tfidf_cosine_pairs,
    )

    text = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            (1, text),
            (2, text),
            (3, "alpha beta unrelated words entirely different ones"),
            (4, "another body of text sharing nothing rare"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_cosine_pairs(docs).collect()
    assert out, "identical docs share rare shingles and must surface"
    top = out[0]
    assert (top.doc_a, top.doc_b) == (1, 2)
    assert top.cosine == 1.0
    # every emitted pair's cosine is a valid similarity
    assert all(0.0 <= r.cosine <= 1.0 for r in out)


# ------------------------------------------------------ JL projection


def test_random_projection_is_linear_and_deterministic(spark):
    from big_data_trend_analysis_spark.operators.similarity import (
        embed_random_projection,
    )

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [2.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = embed_random_projection(emb).collect()
    assert len(out) == 16  # 2 vectors × 8 lanes
    p1 = {r.j: r.proj for r in out if r.vec_id == 1}
    p2 = {r.j: r.proj for r in out if r.vec_id == 2}
    for j in range(8):
        assert abs(p1[j]) == 0.5  # ±1/√4
        assert p2[j] == pytest.approx(2 * p1[j], abs=1e-9)
    again = {
        (r.vec_id, r.j): r.proj for r in embed_random_projection(emb).collect()
    }
    assert all(again[(r.vec_id, r.j)] == r.proj for r in out)


# ------------------------------------------------ incremental dedup fix


@pytest.mark.slow  # multi-minute drain; slow tier (pyproject.toml)
def test_incremental_dedup_exact_copies_do_not_mask_near_match(spark):
    """Review regression: verbatim batch copies must not inflate
    shingle df past the rare cut and suppress a genuine near-dup —
    df-rarity is evidence over distinct documents."""
    from big_data_trend_analysis_spark.operators.dedup import (
        incremental_dedup,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta"
    archive = spark.createDataFrame(
        [(1, base)], "doc_id long, text string"
    )
    near_text = base + " extraword"
    batch_rows = [(100, near_text)]
    # 11 verbatim copies of the near-copy (> max_df = 10)
    batch_rows += [(101 + i, near_text) for i in range(11)]
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")
    out = {r.doc_id: r for r in incremental_dedup(archive, batch).collect()}
    # the first-id owner is the survivor and must still near-match
    # the archive doc; every copy drops exact against the owner
    assert out[100].decision == "drop_near"
    assert out[100].match_id == 1
    for i in range(11):
        assert out[101 + i].decision == "drop_exact"
        assert out[101 + i].match_id == 100
