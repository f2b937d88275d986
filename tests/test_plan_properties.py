"""Physical-plan invariants (SURVEY.md §5.2-5 "scale smoke").

These assertions encode the 100 TB posture: predicates and projections
must reach the parquet scan, small dimensions must broadcast, narrow
pipelines must not shuffle, and nothing may fall back to a cartesian
join except the two declared broadcast-probe patterns (sim_search /
ann_ivf, where the build side is a handful of probe vectors).
"""

from __future__ import annotations

import re

import pytest

from big_data_trend_analysis_spark.plans.registry import QUERIES

# Slow tier (see pyproject.toml): the plans fixture constructs all 304
# query DataFrames (txnlog/stream gates execute their fixture writes
# and drains at construction — ~16 min). Run explicitly: pytest -m slow.
pytestmark = pytest.mark.slow


#: Queries whose plan legitimately contains a cross join: the build
#: side is a broadcast of O(probes) rows (sim_search/ann_ivf) or a
#: 1-row scalar (tfidf's corpus-size N), i.e. a map-side scan pattern.
#: (embed_neardup_check joins two 1-row aggregates — planted count ×
#: recovered count — a scalar × scalar cross join.)
CROSS_JOIN_ALLOWED = {
    "sim_search",
    "ann_ivf",
    "ann_recall_check",
    "tfidf_top_term",
    "embed_neardup_check",
    "embed_pq_check",
    # spine = types × broadcast 1-row (lo, hi) bounds
    "gapfill_locf",
    # broadcast 1-row corpus scalars (N, Σdl / N / exact-vs-merged)
    "bm25_rank",
    "cooccurrence_pmi",
    "hll_merge_check",
    # broadcast 1-row (lo, hi) bounds onto the bucketing scan
    "histogram_numeric",
    # scalar × scalar: 1-row planted count × 1-row recovered count
    # (same shape as embed_neardup_check)
    "dedup_minhash_check",
    # 1-row exact-percentile agg × 1-row merged-sketch agg
    "kll_rollup_check",
    # scalar × scalar: 1-row planted count × 1-row recovered count
    "ann_ivfpq_check",
    # per-event_type agg × broadcast 1-row partition-count scalars
    "merge_roundtrip",
    # per-event_type agg × broadcast 1-row version/file-count scalars
    "txn_log_snapshot_read",
    # per-event_type agg × broadcast 1-row batch-count scalar
    "stream_cdc_apply_live",
    # the pairwise sketch relation joins O(segments) × broadcast
    # O(segments) on an inequality — bounded by segments², never data
    "theta_overlap_check",
    # vocab-sized counts × broadcast 1-row corpus-total scalar
    "unigram_perplexity",
    # nodes × broadcast 1-row (N, dangling-mass) scalars per iteration
    "pagerank_fixed",
    # scalar × scalar: 1-row planted count × 1-row recovered count
    "semdedup_check",
    # histogram × broadcast 9-row rank-interval relation (inequality
    # locate of the quantile floor/ceil values) + 1-row bounds row
    "feature_binning",
    # |categories| rows × broadcast 1-row global-mean scalar
    "target_encoding",
    # vocab rows × broadcast 1-row argmax-pair scalar per merge round
    "bpe_merge_rounds",
    # 5-row top-k × broadcast 1-row (total, n_keys) scalar
    "skew_profile",
    # |vocab| relation × broadcast 1-row merge rule per round (the
    # bpe_merge_rounds shape, reused by the encode path)
    "bpe_encode_check",
    # --- round 8 ---
    # O(segments) sketch relation × broadcast self on an inequality —
    # bounded by segments², never data (same shape as its check twin)
    "theta_segment_overlap",
    # per-bin/per-cell relations × broadcast 1-row totals
    "psi_drift",
    "mutual_information",
    "benford_first_digit",
    # per-type agg × broadcast 1-row vacuum/schema scalar rows
    "txn_log_vacuum_check",
    "txnlog_schema_evolve",
    # spine = types × broadcast 1-row (lo, hi) bounds (locf's shape)
    "gapfill_linear",
    # per-value CDF rows × broadcast 1-row totals
    "ks_test_check",
    # --- round 9 ---
    # per-type agg × broadcast 1-row OCC/partition-evolution scalars
    # (the txn_log_vacuum_check shape)
    "txnlog_concurrent_commit",
    "txnlog_partition_evolve",
    # finalized (day, type) cells × broadcast 1-row audit scalars
    "stream_late_audit",
    # vocab-sized LM relation × broadcast 1-row corpus total (the
    # unigram_perplexity shape)
    "bigram_perplexity",
    # --- round 9 continuation: all "small relation × broadcast 1-row
    # scalar(s)" shapes (the psi_drift/unigram_perplexity pattern) ---
    # days relation × broadcast 1-row moments / decimal denominator
    "autocorr_daily",
    # pair relation × broadcast 1-row basket count
    "copurchase_lift",
    # vocab² bigram relation × broadcast 1-row corpus total
    "collocation_llr",
    # sources relation × broadcast 1-row token totals
    "dataset_mixing_weights",
    # days relation × broadcast 1-row global mean + 1-row strength
    "seasonal_adjust_dow",
    # QI-class relation × broadcast 1-row audit totals
    "k_anonymity_check",
    # per-node triangle counts × broadcast 1-row global count
    "triangle_count",
    # days relation × broadcast 1-row censor day
    "survival_km",
    # customer relation × broadcast 1-row anchor day
    "rfm_segmentation",
    # scalar × scalar: 1-row cohort moments each side
    "ab_test_welch",
    # 3 as-of aggregate rows × broadcast 1-row raise-contract flag
    "txnlog_time_travel",
    # --- round 10 ---
    # per-type recovered-state agg × broadcast 1-row restart/batch
    # scalars (the stream_cdc_apply_live shape)
    "stream_restart_recovery_live",
    # R×C contingency cells × broadcast 1-row (N, levels) totals
    "chi_square_independence",
    # --- round 10 (fourth batch) ---
    # autocorr_daily's day-relation scalars + 7-row terms × broadcast
    # 1-row verdict
    "ljung_box_check",
    # |types| tested relation × broadcast 1-row m-count scalar (twice:
    # the ranked and degenerate branches)
    "benjamini_hochberg",
    # 1-row observed moments × broadcast 1-row CI bounds
    "bootstrap_ci_mean",
    # (user, day)×7 votes relation × broadcast 1-row last-day bound
    # (the histogram_numeric bounds-onto-scan shape)
    "rolling_active_users",
    # corpus shingle relation × broadcast 1-row N scalar
    "tfidf_cosine_pairs",
    # (vec, dim) components × broadcast 8-row lane spine + 1-row √d
    "embed_random_projection",
    # --- round 11 ---
    # 3-row admission ledger × broadcast 1-row final-state scalars
    "stream_rate_limited_live",
    # k-group terms × broadcast 1-row totals, then × 1-row verdict
    "kruskal_wallis",
    # O(B) replicate rows × broadcast 1-row totals/observed scalars
    "permutation_test_mean",
    # 2 arm-moment rows × broadcast 1-row (theta, xbar) scalars
    "cuped_adjusted_ab",
    # per-doc ppl relation × broadcast 1-row tercile cutoffs (plus
    # unigram_perplexity's vocab × 1-row total inside)
    "ccnet_perplexity_buckets",
    # vocab LM relation × broadcast 1-row (N_t, N_all, V) totals
    "dsir_importance_weights",
    # 1-row viewer counts × broadcast 1-row quantile scalars (plus
    # the delay cumsum × broadcast counts inside)
    "funnel_time_to_convert",
    # top-3-per-group rows × broadcast 1-row plan-artifact scalar
    "window_group_limit_check",
    # |vocab| relation × broadcast 1-row merge rule per round (the
    # bpe_encode_check shape, reused via _bpe_encoded_vocab)
    "tokenizer_fertility",
    # per-type agg × broadcast 1-row pruned-ReadSchema scalar
    "nested_prune_check",
    # per-group moments × broadcast 1-row totals, then × 1-row verdict
    "brown_forsythe_test",
    # inherits autocorr_daily's days-relation × broadcast 1-row
    # moments/denominator scalars under its bounded ACF input
    "pacf_daily",
    # --- round 12 ---
    # 1-row vocab totals × broadcast 1-row OLS fit
    "zipf_fit_slope",
    # 1-row corpus totals × broadcast 1-row OLS fit
    "heaps_law_fit",
    # per-type counts × broadcast 1-row grand total
    "wilson_ci_proportion",
    # 1-row step-count aggregates crossed into the single output row
    "funnel_k_step",
    # inherits sim_search's corpus × broadcast 3-row probe side
    "ndcg_at_k",
    # types² pairwise inequality join (the theta_segment_overlap
    # shape) + tiny relations × broadcast 1-row totals/m-count
    "dunn_posthoc",
    # ≤7·|types| cell relation × broadcast k-count/complete-block
    # spine + 1-row verdict
    "friedman_test",
    # corpus counts × broadcast 1-row grand-median, then × 1-row
    # verdict (the kruskal_wallis verdict shape)
    "mood_median_test",
    "cochran_armitage_trend",
    # probes×k eval rows × broadcast 1-row fleet means (plus
    # sim_search's corpus × broadcast probe side inside)
    "mrr_map_at_k",
    # node-sized label relation × broadcast 1-row component count
    "connected_components",
    # bounded days relation × broadcast 1-row censor day + 1-row
    # cohort totals (the survival_km shape)
    "log_rank_test",
    # days×|m| block moments × broadcast 1-row OLS fit
    "hurst_exponent",
    # 1-row 2×2 cells × broadcast 1-row grand-median
    "odds_ratio_ci",
    # |langs|² confusion cells × broadcast 1-row accuracy + the
    # bounded ×|langs| scoring explode (broadcast lang totals)
    "naive_bayes_lang",
}

#: Pure row-at-a-time pipelines: scan → project/filter → sink. Any
#: Exchange here is a regression (a shuffle of the full table).
NARROW = {
    "scan_project",
    "filter_pred",
    "json_extract",
    "conditional_score",
    "decay_weight",
    "quality_filter",
    "doc_profile",
    "tokenize_explode",
    "sentiment_score",
    "multimodal_decode",
    "date_parts",
    "string_funcs",
    "null_handling",
    "embed_quantize",
    "text_clean",
    "sample_mixture",
    # winnowing: the whole rolling-hash selection is higher-order
    # functions inside one projection — any Exchange is a regression
    "winnow_fingerprints",
    # chunking is sequence→posexplode→slice inside one projection —
    # any Exchange is a regression
    "doc_chunking",
    # the Gopher rules are higher-order functions in one projection —
    # any Exchange is a regression
    "gopher_quality_rules",
}


def plan_of(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    return {name: plan_of(q(spark, sf_dir)) for name, q in QUERIES.items()}


def test_no_unexpected_cartesian_joins(plans):
    for name, plan in plans.items():
        if name in CROSS_JOIN_ALLOWED:
            continue
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_narrow_pipelines_do_not_shuffle(plans):
    for name in NARROW:
        assert "Exchange" not in plans[name], f"{name} shuffles a narrow pipeline"


def test_scan_projection_is_pruned(plans):
    m = re.search(r"ReadSchema: struct<([^>]*)>", plans["scan_project"])
    assert m, "no ReadSchema in scan_project plan"
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"}


def test_filter_predicates_are_pushed(plans):
    plan = plans["filter_pred"]
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_shipdate" in plan
    assert "In(l_returnflag" in plan


def test_dimension_joins_broadcast(plans):
    assert "BroadcastHashJoin" in plans["join_broadcast"]
    # the orders⋈customer⋈nation⋈region chain: every dim side broadcasts
    assert plans["join_hash"].count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plans["join_broadcast"]


def test_aggregations_have_partial_phase(plans):
    # partial (map-side) + final HashAggregate pairs around one shuffle
    for name in ("agg_basic", "keyword_freq", "window_tumbling"):
        assert plans[name].count("HashAggregate") >= 2, name
        assert plans[name].count("Exchange") <= 2, name


def test_topk_uses_bounded_selection(plans):
    # orderBy+limit must compile to TakeOrdered, never a global sort
    assert "TakeOrderedAndProject" in plans["keyword_topk"]


def test_semi_anti_join_strategies(plans):
    plan = plans["join_semi_anti"]
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_whole_stage_codegen_covers_core_paths(spark, sf_dir):
    """Partial AND final aggregate stages must be codegen'd (starred).

    Checked with AQE disabled because the AdaptiveSparkPlan wrapper
    hides codegen annotation until the plan is finalized — with AQE on,
    explain shows no stars even for fully codegen'd stages.
    """
    import re

    from big_data_trend_analysis_spark.operators.aggregates import agg_basic
    from big_data_trend_analysis_spark.operators.trend import keyword_freq
    from big_data_trend_analysis_spark.sources.tables import load_table

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for df in (
            agg_basic(load_table(spark, sf_dir, "lineitem")),
            keyword_freq(load_table(spark, sf_dir, "documents")),
        ):
            simple = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "simple"
                )
            )
            assert len(re.findall(r"\*\(\d+\) HashAggregate", simple)) >= 2, simple
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_upsert_scd1_is_single_scan_single_shuffle(plans):
    """The MERGE compaction must stay joinless: one scan, one Exchange.

    Regression guard for the max_by formulation — a windowed-join
    rewrite would reappear here as a second scan and a join.
    """
    plan = plans["upsert_scd1"]
    # formatted explain prints each node twice (tree + detail); count
    # the unique "(n) Op" detail headers.
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, "re-scans input"
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, "extra shuffle"
    assert "Join" not in plan, "upsert_scd1 reintroduced a join"


def test_scd2_history_single_exchange(plans):
    """The SCD-2 islands build must reuse ONE (user_id, event_type)
    exchange for everything downstream: the change-flag window, the
    running-sum ordinals, the island aggregation (its keys extend the
    partitioning, so no re-shuffle), and the lead() range close — and
    the gaps-and-islands formulation must stay joinless.
    """
    plan = plans["scd2_history"]
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, "re-scans input"
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, "extra shuffle"
    assert "Join" not in plan, "islands reintroduced a join"
    # event-order sort + version-order sort only
    assert len(re.findall(r"\(\d+\) Sort", plan)) <= 2, "extra sorts"


def test_funnel_conversion_is_single_scan(plans):
    """The window-chain funnel must not re-scan per stage.

    The naive CTE-chain plan duplicates every upstream sub-plan (~10
    scans for 4 stages); the window chain reads the fact table once and
    stacks all levels on one Exchange+Sort.
    """
    plan = plans["funnel_conversion"]
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, "re-scans fact"
    assert "Join" not in plan, "funnel reintroduced the join chain"
    # user-key exchange + final single-row reduce exchange only
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2, "extra shuffles"
    # identical window specs must stack on ONE Sort — a second Sort
    # means Catalyst stopped collapsing the 3-level window chain
    assert len(re.findall(r"\(\d+\) Sort", plan)) == 1, "window chain re-sorts"
    assert len(re.findall(r"\(\d+\) Window", plan)) == 3


def test_grouping_sets_single_expand_pass(plans):
    """All grouping sets must expand in one operator, one shuffle."""
    plan = plans["grouping_sets_agg"]
    assert len(re.findall(r"\(\d+\) Expand", plan)) == 1
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_rollup_two_level_reaggregates(plans):
    """Daily stats must come from the hourly relation, not raw events:
    two aggregate levels, one scan."""
    plan = plans["rollup_two_level"]
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    # hourly partial+final, daily partial+final
    assert len(re.findall(r"\(\d+\) HashAggregate", plan)) >= 4


def test_gapfill_actuals_join_broadcasts(plans):
    """gapfill_locf: the bucket relation must BROADCAST into the spine
    join (|types x buckets| rows — a sort-merge here would shuffle the
    spine for nothing), and the fact table is scanned once."""
    plan = plans["gapfill_locf"]
    assert "BroadcastHashJoin LeftOuter" in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_trend_anomaly_stats_broadcast_no_rescan(plans):
    """trend_anomaly: per-type moments broadcast back onto the window
    counts; the events table is scanned once (Spark reuses the counts
    subtree via ReusedExchange, not a second scan)."""
    plan = plans["trend_anomaly"]
    assert "BroadcastHashJoin" in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_fuzzy_join_is_equi_join_not_cartesian(plans):
    """fuzzy_token_join: candidate generation must be a hash equi-join
    on the deletion variant — the brute-force cross join lives only in
    the oracle."""
    plan = plans["fuzzy_token_join"]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "levenshtein" in plan.lower()


def test_tpch_q3_broadcasts_and_bounded_topk(plans):
    """Q3: customer/orders sides broadcast onto the lineitem probe, the
    date predicates reach their scans, and the top-10 is a distributed
    TakeOrderedAndProject — never a global Sort of the join output."""
    plan = plans["sql_tpch_q3"]
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) == 2
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert "PushedFilters: [IsNotNull(o_orderdate), LessThan(o_orderdate" in plan
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate" in plan


def test_bm25_and_pmi_topk_bounded(plans):
    """The retrieval top-k must be TakeOrdered (per-partition heaps);
    the rank Window may only run AFTER the limit, on ≤ k rows."""
    for name in ("bm25_rank", "cooccurrence_pmi"):
        plan = plans[name]
        assert "TakeOrderedAndProject" in plan, name
        # the window sees only the take-ordered rows: it must sit above
        # the TakeOrdered in the tree (appears before it in the dump)
        assert plan.index("Window") < plan.index("TakeOrderedAndProject"), name


def test_rolling_and_attribution_single_pass(plans):
    """Both window-chain temporal ops: one scan, one key shuffle, one
    sort — no self-joins."""
    for name in ("rolling_median", "attribution_last_touch"):
        plan = plans[name]
        assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, name
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, name
        assert len(re.findall(r"\(\d+\) Sort", plan)) == 1, name
        assert "Join" not in plan, name


def test_decontaminate_broadcasts_benchmark(plans):
    """The benchmark gram set must broadcast; corpus grams never shuffle.

    The 100 TB contract of the decontamination gate: the only exchanges
    in the plan belong to the benchmark-side distinct and the final
    per-doc aggregation (output-sized) — the corpus-gram relation goes
    scan → explode → broadcast-probe with no Exchange of its own.
    """
    plan = plans["decontaminate_ngram"]
    assert "BroadcastHashJoin" in plan, "benchmark set not broadcast"
    assert "SortMergeJoin" not in plan, "corpus grams shuffled for the join"


def test_histogram_bounds_broadcast_single_scan_pair(plans):
    """Bounds row broadcasts; both passes aggregate map-side-partial."""
    plan = plans["histogram_numeric"]
    assert "BroadcastExchange" in plan, "bounds row not broadcast"
    assert "SortMergeJoin" not in plan
    # bounds agg + bucket agg, each with partial+final HashAggregate
    assert plan.count("HashAggregate") >= 4


def test_retention_join_copartitioned_on_user(plans):
    """Both retention inputs reduce to per-user rows BEFORE the join —
    no events-grain relation crosses the join."""
    plan = plans["retention_cohort"]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tpch_q18_bounded_topk_and_broadcast(plans):
    """Q18's HAVING survivor set must broadcast; top-100 bounded."""
    plan = plans["sql_tpch_q18"]
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_event_transitions_two_exchanges(plans):
    """lag sort on user_id + (from,to) count: ≤3 exchanges total
    (user key, pair key, and the tiny per-from window repartition)."""
    plan = plans["event_transitions"]
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 3
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_bucketed_join_has_no_exchange_on_join_key(plans):
    """Both sides carry the bucketBy(custkey) layout, so the
    SortMergeJoin must consume them without re-shuffling — the write
    paid the shuffle once; every future join rides it for free."""
    plan = plans["bucketed_write_join"]
    assert "SortMergeJoin" in plan, "bucketed join degraded to another strategy"
    assert "Exchange hashpartitioning(o_custkey" not in plan
    assert "Exchange hashpartitioning(c_custkey" not in plan


def test_file_skipping_check_prunes_partitions(plans):
    """The 6-day range must plan as PartitionFilters on p_date —
    directory-level pruning, not a post-scan row filter over all 30
    files. (The gate query's file counts pin the data side; this pins
    the structural prune.)"""
    plan = plans["file_skipping_check"]
    m = re.search(r"PartitionFilters: \[[^\]]*p_date[^\]]*\]", plan)
    assert m, "p_date range did not become a PartitionFilter"
    assert "(p_date" in m.group(0)


def test_tpch_q4_exists_decorrelates_to_semi_join(plans):
    """Q4's correlated EXISTS must plan as a LeftSemi broadcast join
    with the returnflag predicate pushed to the inner scan and the
    quarter predicate pushed to the orders scan — never a re-scan per
    outer row."""
    plan = plans["sql_tpch_q4"]
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" in plan
    assert "EqualTo(l_returnflag,R)" in plan
    assert "GreaterThanOrEqual(o_orderdate,1995-01-01" in plan


def test_tpch_q13_outer_join_preserved(plans):
    """Q13: the ON-clause predicate pushes to the ORDERS scan only —
    zero-order customers must survive null-extended through a
    LeftOuter join into the count histogram."""
    plan = plans["sql_tpch_q13"]
    assert "LeftOuter" in plan or "RightOuter" in plan
    assert "Not(EqualTo(o_orderpriority,1-URGENT))" in plan
    # customer scan carries NO pushed filter that could drop customers
    assert "CartesianProduct" not in plan


def test_tpch_q17_correlated_avg_decorrelates(plans):
    """Q17's per-part scalar subquery must decorrelate to ONE
    aggregate-then-join pass over lineitem (2 lineitem scans total:
    fact + avg build), with the brand filter pushed to part."""
    plan = plans["sql_tpch_q17"]
    assert "EqualTo(p_brand,Brand#23)" in plan
    # 3 scans total: lineitem fact + lineitem avg build + part — the
    # subquery cost is ONE extra scan, not a per-outer-row re-scan.
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 3
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tpch_q19_disjunction_pushes_to_both_scans(plans):
    """Q19's OR-of-ANDs: each side's disjunct union must reach its own
    parquet scan as a pushed Or(...) filter — lineitem reads only
    quantity ∈ [1,30] rows, part only the three brands."""
    plan = plans["sql_tpch_q19"]
    assert re.search(r"PushedFilters: \[[^\]]*Or\([^\]]*l_quantity", plan)
    assert re.search(r"PushedFilters: \[[^\]]*Or\([^\]]*p_brand", plan)


def test_tpch_q22_anti_join_and_scalar_subqueries(plans):
    """Q22: NOT EXISTS plans as LeftAnti over the urgent-orders scan
    (priority predicate pushed); the two scalar subqueries evaluate
    once, not per row."""
    plan = plans["sql_tpch_q22"]
    assert "LeftAnti" in plan
    assert "EqualTo(o_orderpriority,1-URGENT)" in plan
    assert "CartesianProduct" not in plan


def test_tpch_q6_is_pure_pushdown_scan(plans):
    """Q6: no join; all predicates reach the scan; 3-column read."""
    plan = plans["sql_tpch_q6"]
    assert "Join" not in plan
    assert "GreaterThanOrEqual(l_shipdate,1996-01-01" in plan
    assert "GreaterThanOrEqual(l_discount,0.05)" in plan
    assert "LessThan(l_quantity,24.0)" in plan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and {c.split(":")[0] for c in m.group(1).split(",")} == {
        "l_extendedprice", "l_discount", "l_quantity", "l_shipdate"
    }


def test_tpch_q7_q8_dimensions_broadcast(plans):
    """Q7/Q8: every dimension chain (nation in two roles, supplier,
    customer, part, region) broadcasts onto the fact probe — the fact
    table is never shuffled pre-aggregation."""
    for name, min_bhj in (("sql_tpch_q7", 4), ("sql_tpch_q8", 6)):
        plan = plans[name]
        assert plan.count("BroadcastHashJoin") >= min_bhj, name
        assert "SortMergeJoin" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_tpch_q15_bounded_scans(plans):
    """Q15: the revenue CTE costs at most one extra lineitem scan
    (join side + MAX side), with the quarter predicate pushed to
    both."""
    plan = plans["sql_tpch_q15"]
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) <= 3
    assert "GreaterThanOrEqual(l_shipdate,1996-01-01" in plan
    assert "CartesianProduct" not in plan


def test_sql_tpch_q5_broadcasts_all_dimensions(plans):
    """The snowflake's dimensions must broadcast onto the lineitem
    probe; the fact table is never shuffled before aggregation."""
    plan = plans["sql_tpch_q5"]
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan


def test_interval_overlap_single_fact_shuffle(plans):
    """Sweep-line: expand + ONE keyed exchange for the running-sum
    window (plus at most the agg's tiny partial exchange)."""
    plan = plans["interval_overlap"]
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_cdc_snapshot_diff_two_pruned_scans_one_join(plans):
    """Snapshot diff: exactly two 2-column scans of orders (no third
    pass), one full-outer join, no cartesian fallback."""
    plan = plans["cdc_snapshot_diff"]
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 2
    assert "FullOuter" in plan
    assert "CartesianProduct" not in plan
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = {c.split(":")[0] for c in m.group(1).split(",")}
        assert cols == {"o_orderkey", "o_totalprice"}


def test_unigram_perplexity_single_corpus_scan_in_final_plan(plans):
    """Perplexity: the LM (vocab counts) is materialized once, so the
    final plan holds exactly ONE parquet scan of the corpus — the
    doc-token explode; total and bits read the checkpointed vocab."""
    plan = plans["unigram_perplexity"]
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_pagerank_iterations_reuse_materialized_graph(plans):
    """The unrolled iterations must run against the localCheckpointed
    edge/node relations — the raw event log appears in NO branch of
    the final plan (lineage was truncated), and ranks⋈edges is an
    equi-join, not a cartesian."""
    plan = plans["pagerank_fixed"]
    assert "Scan parquet" not in plan or "events.parquet" not in plan
    assert "CartesianProduct" not in plan


def test_feature_binning_single_scan_into_checkpoint(plans):
    """Distributed exact quantile: the fact table is scanned once into
    the materialized value histogram — the final plan reads ONLY the
    checkpoint (no parquet scan, no single-task percentile buffer)."""
    plan = plans["feature_binning"]
    assert "Scan parquet" not in plan
    assert "percentile" not in plan.lower()


def test_tpch_q21_double_self_correlation(plans):
    """Q21: both correlations against lineitem must decorrelate into
    joins — EXISTS (other supplier touched the order) as LeftSemi,
    NOT EXISTS (no other supplier failed) as LeftAnti — with the
    returnflag marker pushed to the anti side's scan and the tiny
    supplier/nation dims broadcast. A correlated re-scan per outer
    row (no Semi/Anti in the plan) would be the scale-killer."""
    plan = plans["sql_tpch_q21"]
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan
    assert "EqualTo(l_returnflag,R)" in plan
    assert "EqualTo(o_orderstatus,F)" in plan
    assert "CartesianProduct" not in plan


def test_inverted_index_single_shuffle(plans):
    """Posting-list build: the row_number cap and the groupBy share
    the term key, so the plan carries exactly ONE exchange (plus AQE
    readers) — a second term shuffle would double the job's cost."""
    plan = plans["inverted_index_build"]
    import re as _re

    assert len(_re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_anomaly_mad_broadcasts_group_stats(plans):
    """MAD outliers: both join-backs of the |event_type|-row stats
    relations must broadcast — shuffling the fact table three times
    on event_type (a skewed low-cardinality key) is the regression."""
    plan = plans["anomaly_mad"]
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_target_encoding_scans_only_needed_columns(plans):
    """Target encode: both aggregates prune to the 3 involved columns
    and the global relation is a broadcast scalar, never a shuffle of
    the category relation against a 1-row table."""
    import re as _re

    plan = plans["target_encoding"]
    for m in _re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
        assert cols <= {"l_returnflag", "l_linestatus", "l_extendedprice"}


def test_bpe_rounds_run_on_materialized_vocab(plans):
    """BPE training: after the one corpus-collapsing word count, every
    merge round must plan against the localCheckpointed vocab — the
    corpus parquet appears in NO branch of the final plan."""
    plan = plans["bpe_merge_rounds"]
    assert "Scan parquet" not in plan


def test_skew_profile_bounded_topk(plans):
    """Skew diagnosis: the heavy-hitter selection must be a bounded
    TakeOrdered over the per-key counts, never a global sort."""
    plan = plans["skew_profile"]
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_mor_read_view_merge_is_joinless(plans):
    """MOR read path: base ∪ delta resolves through ONE max_by
    aggregation — a join-shaped merge (base⋈delta) would re-shuffle
    both layers twice and break the O(one agg) read amplification
    story."""
    plan = plans["mor_read_view"]
    assert "Join" not in plan
    assert plan.count("Union") >= 1


def test_expectations_suite_is_single_scan_per_table(plans):
    """The 4 lineitem expectations fold into ONE conditional-agg scan;
    only the referential anti-join adds a second lineitem read. A
    union-of-branches shape would replay the scan per expectation."""
    plan = plans["expectations_check"]
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) <= 3


def test_incremental_maintenance_never_rereads_history(plans):
    """Partial-merge maintenance: one scan per slice (base, delta),
    merged algebraically — no third scan of the unified history."""
    plan = plans["incremental_agg_maintain"]
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 2
    assert plan.count("HashAggregate") >= 2


def test_python_datasource_is_a_real_batch_scan(plans):
    """The synthetic generator must plan as a v2 BatchScan of the
    registered Python source — executor-partitioned, no parquet, no
    driver-side createDataFrame of pre-generated rows."""
    plan = plans["python_datasource_scan"]
    assert "BatchScan bdta_synthetic" in plan
    assert "Scan parquet" not in plan


def test_udtf_lateral_plumbing(plans):
    """The UDTF runs as BatchEvalPythonUDTF under a bounded top-k —
    the lateral join must not degrade to a cartesian."""
    plan = plans["udtf_bigram_topk"]
    assert "BatchEvalPythonUDTF" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_pandas_udaf_is_arrow_grouped_agg(plans):
    """Gini must aggregate through the Arrow grouped-agg path with the
    cents scaling projected JVM-side BEFORE the Python boundary."""
    plan = plans["pandas_udaf_gini"]
    assert "ArrowAggregatePython" in plan
    assert "round((value" in plan or "round(value" in plan


def test_cdc_compact_is_joinless_single_shuffle(spark, sf_dir):
    """The per-batch CDC compaction must stay the merge.py shape: one
    scan, one key Exchange, no join — a windowed rewrite would re-scan
    and re-shuffle every batch."""
    from big_data_trend_analysis_spark.streaming.cdc import (
        changes_from_events,
        compact_latest,
    )
    from big_data_trend_analysis_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    plan = plan_of(compact_latest(changes_from_events(events)))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, "re-scans input"
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, "extra shuffle"
    assert "Join" not in plan, "cdc compaction reintroduced a join"
    # partial max_by before the exchange: map-side combine absorbs
    # hot-key skew (one compacted row per key per map task).
    assert "partial_max_by" in plan


def test_round10_batch4_plan_shapes(plans):
    """Node-count pins for the fourth-batch heavies (formatted explain
    lists each node twice: tree + detail section).

    - bootstrap_ci_mean: exactly TWO generators (the ×⌈B/8⌉ fan and the
      post-aggregate stack) — a third means the per-lane explode crept
      back into the hot path; ONE corpus-sized aggregation pair plus
      the scalar obs/bounds aggregates.
    - rolling_active_users: exactly ONE generator (the 7-day vote
      posexplode) — rolling distinct must stay bounded replication.
    - mann_whitney_u: NO generator — the rank sums must come from the
      value relation, never a row fan-out. (The round-11 range-cumsum
      rewrite replaced the single distinct-value window with the
      checkpointed per-partition pass + broadcast offsets, so the
      VISIBLE plan is the final assembly over the checkpointed
      relation: broadcast-offset join + rank-sum/tie aggregation —
      4 real exchanges in the formatted double-count.)
    - embed_random_projection: exactly ONE aggregation (the (vec, lane)
      fold) — a second means the lane spine stopped broadcasting.
    """
    assert plans["bootstrap_ci_mean"].count("Generate") == 4
    assert plans["rolling_active_users"].count("Generate") == 2
    mw = plans["mann_whitney_u"]
    assert mw.count("Generate") == 0
    assert mw.count("Exchange") <= 8
    assert plans["embed_random_projection"].count("HashAggregate") == 4
    # chunking stays fully narrow (also in NARROW) and fingerprints
    # inside the projection: no aggregate at all
    assert plans["doc_chunking"].count("HashAggregate") == 0
