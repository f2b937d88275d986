"""Sketch-accuracy property tests (SURVEY.md §5.2-4): the approximate
aggregates must satisfy their published error contracts on seeded data,
mirroring the reference algorithms' guarantees (CMS: overestimate only,
within εN w.h.p. — cms_stream.py:42-47; FM/HLL: within rsd —
flajolent_stream.py:23-28)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def seeded_tokens(spark):
    """Zipf-ish token stream with known exact counts, seed=7."""
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(200)]
    weights = [1.0 / (i + 1) for i in range(200)]
    toks = rng.choices(vocab, weights=weights, k=20_000)
    df = spark.createDataFrame([(t,) for t in toks], "token string")
    exact = {}
    for t in toks:
        exact[t] = exact.get(t, 0) + 1
    return df, exact


def test_count_min_sketch_overestimates_within_eps(spark, seeded_tokens):
    """CMS contract: estimate ≥ true, and ≤ true + εN w.h.p."""
    df, exact = seeded_tokens
    eps, n = 0.001, sum(exact.values())
    sk = (
        df.agg(
            F.count_min_sketch("token", F.lit(eps), F.lit(0.99), F.lit(42)).alias("s")
        )
        .collect()[0]
        .s
    )
    # The sketch builds distributed (mergeable partial aggregates); only
    # the ~depth×width byte blob returns. Probe it with the same JVM
    # sketch library Spark used to build it.
    cms = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes(sk))
    assert cms.totalCount() == n
    hot = sorted(exact, key=exact.get, reverse=True)[:5]
    for key in hot + ["w150", "w199", "never-seen"]:
        est = cms.estimateCount(key)
        assert est >= exact.get(key, 0)
        assert est <= exact.get(key, 0) + eps * n * 3


def test_approx_count_distinct_within_rsd(spark, seeded_tokens):
    df, exact = seeded_tokens
    rsd = 0.05
    est = df.agg(F.approx_count_distinct("token", rsd).alias("d")).collect()[0].d
    true = len(exact)
    assert abs(est - true) <= max(4 * rsd * true, 10)


def test_hll_sketch_agg_mergeable(spark, seeded_tokens):
    """HLL sketches built on halves and merged ≈ sketch on the union —
    the mergeability that makes distributed distinct-count work."""
    df, exact = seeded_tokens
    halves = df.withColumn("half", (F.monotonically_increasing_id() % 2))
    per_half = halves.groupBy("half").agg(F.hll_sketch_agg("token").alias("sk"))
    merged = per_half.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("d")
    ).collect()[0].d
    true = len(exact)
    assert abs(merged - true) <= max(0.1 * true, 10)


def test_probe_cms_bytes_matches_jvm_bit_for_bit(spark, seeded_tokens):
    """The pure-Python CMS probe (``_probe_cms_bytes``, used executor-
    side by ``probe_sketches``) must agree exactly with the JVM's
    ``CountMinSketch.estimateCount`` on the same binary — across key
    byte-lengths 1..9 (exercising murmur tail handling 0..3), multibyte
    UTF-8, high-byte (sign-extension) tails, and absent keys."""
    from big_data_trend_analysis_spark.operators.aggregates import (
        _probe_cms_bytes,
        probe_cms,
    )

    df, exact = seeded_tokens
    sk = bytes(
        df.agg(
            F.count_min_sketch("token", F.lit(0.001), F.lit(0.99), F.lit(42)).alias(
                "s"
            )
        )
        .collect()[0]
        .s
    )
    keys = (
        sorted(exact, key=exact.get, reverse=True)[:10]
        + ["a", "ab", "abc", "abcd", "abcde", "abcdefghi"]
        + ["naïve", "日本語テキスト", "emoji🙂tail", "\x7f\x80ÿ"]
        + ["never-seen", ""]
    )
    assert _probe_cms_bytes(sk, keys) == probe_cms(spark, sk, keys)


def test_cms_window_probe_range_filter(spark, sf_dir):
    """A window_range pushes into the plan: the probe emits exactly the
    in-range windows × keys, with estimates computed executor-side."""
    from big_data_trend_analysis_spark.operators.aggregates import cms_window_probe
    from big_data_trend_analysis_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    keys = ("click", "view")
    ranged = cms_window_probe(
        events,
        keys=keys,
        window_range=("2024-01-05 00:00:00", "2024-01-10 00:00:00"),
    ).collect()
    assert {r.window_start.day for r in ranged} == {5, 6, 7, 8, 9}
    assert len(ranged) == 5 * len(keys)  # rows = windows-in-range x keys


def test_theta_segment_overlap_near_exact(spark, sf_dir):
    """Theta overlap estimates must track exact pairwise intersections
    (fixture cardinalities sit far below 2^lg_k, so theta operates in
    exact mode) and Jaccard must equal overlap/union."""
    from big_data_trend_analysis_spark.operators.aggregates import (
        theta_segment_overlap,
    )
    from big_data_trend_analysis_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    got = {
        (r.segment_a, r.segment_b): r
        for r in theta_segment_overlap(events).collect()
    }
    users = {
        t: {r.user_id for r in events.filter(F.col("event_type") == t)
            .select("user_id").distinct().collect()}
        for t in [r.event_type for r in events.select("event_type").distinct().collect()]
    }
    assert len(got) == len(users) * (len(users) - 1) // 2
    for (a, b), row in got.items():
        exact_i = len(users[a] & users[b])
        exact_u = len(users[a] | users[b])
        assert abs(row.n_overlap - exact_i) <= max(1.0, 0.05 * exact_i), (a, b)
        assert abs(row.n_union - exact_u) <= max(1.0, 0.05 * exact_u), (a, b)
        assert row.jaccard == pytest.approx(row.n_overlap / row.n_union, abs=1e-6)


def test_kll_rollup_merged_matches_direct(spark, sf_dir):
    """The merged __total__ sketch's quantiles must approximate the
    directly-computed global quantiles within KLL's rank error —
    the property that makes percentile rollups re-aggregable."""
    from big_data_trend_analysis_spark.operators.aggregates import (
        kll_quantile_rollup,
    )
    from big_data_trend_analysis_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    rows = {r.grp: r for r in kll_quantile_rollup(li).collect()}
    assert "__total__" in rows
    assert rows["__total__"].n_rows == li.count()

    # rank-error check: the value KLL returns for q must sit between
    # the exact quantiles at q ± 2% rank
    for q, field in ((0.5, "p50"), (0.95, "p95")):
        lo, hi = (
            li.agg(
                F.expr(
                    f"percentile(l_extendedprice, {max(0.0, q - 0.02)})"
                ).alias("lo"),
                F.expr(
                    f"percentile(l_extendedprice, {min(1.0, q + 0.02)})"
                ).alias("hi"),
            ).first()
        )
        got = getattr(rows["__total__"], field)
        assert lo <= got <= hi, (field, lo, got, hi)
