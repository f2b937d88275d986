"""Declared query inventory + DuckDB oracle twins (SURVEY.md §2.3).

Every entry in ``QUERIES`` is a callable ``(spark, sf_dir) -> DataFrame``
building a declarative plan from the operator library; every
SQL-expressible entry has an ``ORACLE_SQL`` twin that DuckDB runs on the
same parquet files. The driver hash-compares them order-insensitively
with columns sorted by name — so every computed column is aliased
identically on both sides, and every float aggregate goes through the
deterministic decimal-sum discipline (functions/numeric.py).

Oracle-parity conventions (kept rigorously in both dialects):
- double sums: exact decimal accumulation, cast back to double;
- averages: exact-decimal sum cast double, divided by COUNT(*);
- integer sums: CAST(... AS BIGINT) in DuckDB (its SUM(BIGINT) widens
  to HUGEINT, Spark's stays long);
- full-precision doubles (exp/cosine/ratios): round(…, 6) on both
  sides before comparison or ranking;
- ROW_NUMBER cast to INTEGER in DuckDB (Spark's is int32);
- double→int conversions via FLOOR (DuckDB CAST rounds, Spark
  truncates — FLOOR agrees everywhere for non-negative values).

Rows-only entries (no oracle; SURVEY §5.2-1): ``approx_distinct``
(HLL++ estimate), ``cms_topk_sketch`` (binary sketch), the three
near-dup detectors and the two ANN variants (threshold/bucket
artifacts of deliberately non-SQL algorithms). Each has an exact,
hash-checked twin covering the same input path.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from big_data_trend_analysis_spark.functions.nlp import sentiment_compound, sentiment_label
from big_data_trend_analysis_spark.functions.text import EN_STOPWORDS
from big_data_trend_analysis_spark.operators import (
    aggregates,
    dedup,
    multimodal,
    relational,
    similarity,
    textstats,
    trend,
    windows,
)
from big_data_trend_analysis_spark.session import tune_session
from big_data_trend_analysis_spark.sources.tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]


def _q(op, *tables: str) -> QueryFn:
    """Wrap an operator: load its input tables, apply, return the plan."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        tune_session(spark)
        return op(*[load_table(spark, sf_dir, t) for t in tables])

    return run


def _sentiment_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas_udf showcase: lexicon sentiment over documents (N1/F4).

    The only Python-touching query in the hash-checked set — exercises
    the Arrow pandas-UDF path end-to-end with deterministic semantics.
    """
    from pyspark.sql import functions as F

    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    compound = sentiment_compound(F.col("text"))
    return docs.select(
        "doc_id",
        F.round(compound, 6).alias("compound"),
        sentiment_label(compound).alias("label"),
    )


QUERIES: dict[str, QueryFn] = {
    # -- reference-core semantics (SURVEY §2.1/§2.2) --
    "scan_project": _q(relational.scan_project, "lineitem"),
    "filter_pred": _q(relational.filter_pred, "lineitem"),
    "json_extract": _q(trend.json_extract, "events"),
    "conditional_score": _q(trend.conditional_score, "events"),
    "decay_weight": _q(trend.decay_weight_per_event, "events"),
    "tokenize_explode": _q(trend.tokenize_explode, "documents"),
    "keyword_freq": _q(trend.keyword_freq, "documents"),
    "keyword_topk": _q(trend.keyword_topk, "documents"),
    "distinct_count": _q(aggregates.distinct_count, "documents"),
    "approx_distinct": _q(aggregates.approx_distinct, "documents"),
    "cms_topk_sketch": _q(aggregates.cms_topk_sketch, "documents"),
    "streaming_decay_trend": _q(trend.streaming_decay_trend, "events"),
    # -- relational core (north-star) --
    "agg_basic": _q(aggregates.agg_basic, "lineitem"),
    "window_tumbling": _q(windows.window_tumbling, "events"),
    "window_rank": _q(windows.window_rank, "events"),
    "join_hash": _q(relational.join_hash, "orders", "customer", "nation", "region"),
    "join_broadcast": _q(relational.join_broadcast, "lineitem", "part"),
    "join_semi_anti": _q(relational.join_semi_anti, "customer", "orders"),
    "set_ops": _q(relational.set_ops, "events"),
    "rollup_agg": _q(relational.rollup_agg, "customer", "nation"),
    # -- dedup (north-star) --
    "dedup_exact": _q(dedup.dedup_exact, "documents"),
    "dedup_minhash": _q(dedup.dedup_minhash, "documents"),
    "dedup_simhash": _q(dedup.dedup_simhash, "documents"),
    "ngram_jaccard": _q(dedup.ngram_jaccard, "documents"),
    # -- similarity search (north-star) --
    "sim_search": _q(similarity.sim_search, "embeddings"),
    "ann_ivf": _q(similarity.ann_ivf, "embeddings"),
    "embed_neardup": _q(similarity.embed_neardup, "embeddings"),
    # -- text analysis (north-star) --
    "text_stats": _q(textstats.text_stats, "documents"),
    "doc_profile": _q(textstats.doc_profile, "documents"),
    "quality_filter": _q(textstats.quality_filter, "documents"),
    "sentiment_score": _sentiment_score,
    # -- multimodal plumbing (north-star; stub decode, real Spark path) --
    "multimodal_decode": _q(multimodal.multimodal_decode, "documents"),
}


def _sql_in_list(words) -> str:
    return ", ".join(f"'{w}'" for w in words)


_STOPS = _sql_in_list(EN_STOPWORDS)
_POS = _sql_in_list(
    "good great fast excellent love win best happy nice clean simple useful".split()
)
_NEG = _sql_in_list(
    "bad slow terrible hate lose worst sad broken dirty complex useless error".split()
)

# Shared SQL fragments (DuckDB dialect), mirroring functions/*.py exactly.
_DECAY = "exp(-0.1 * (epoch(TIMESTAMP '2024-02-01 00:00:00') - epoch(ts)) / 60)"
_SCORE = (
    "CASE WHEN lower(event_type) = 'purchase' THEN CAST(1.0 AS DOUBLE) "
    "WHEN lower(event_type) = 'error' THEN CAST(-1.0 AS DOUBLE) "
    "ELSE CAST(0.0 AS DOUBLE) END"
)
_STOP_RATIO = (
    f"(CAST(len(list_filter(string_split(text, ' '), t -> t IN ({_STOPS}))) AS DOUBLE)"
    " / CAST(len(string_split(text, ' ')) AS DOUBLE))"
)
_QUALITY = (
    "round((least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)"
    " + least((CAST(length(text) AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE)) / 8.0, 1.0)"
    f" + least({_STOP_RATIO} / 0.2, 1.0)) / 3.0, 6)"
)
_COSINE = (
    "round(list_dot_product({a}, {b})"
    " / (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
)

ORACLE_SQL: dict[str, str] = {
    "scan_project": """
        SELECT l_orderkey, l_linenumber,
               CAST(FLOOR(l_quantity) AS INTEGER) AS qty_int,
               l_returnflag
        FROM lineitem
    """,
    "filter_pred": """
        SELECT l_orderkey, l_linenumber, l_shipdate, l_discount, l_returnflag
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount >= 0.03
          AND l_returnflag IN ('A', 'R')
    """,
    "json_extract": """
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value
        FROM events
    """,
    "conditional_score": f"""
        SELECT event_id, event_type, {_SCORE} AS score FROM events
    """,
    "decay_weight": f"""
        SELECT event_id, round({_DECAY}, 6) AS weight FROM events
    """,
    "tokenize_explode": """
        SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    """,
    "keyword_freq": """
        SELECT token, COUNT(*) AS freq
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token
    """,
    "keyword_topk": """
        SELECT token, COUNT(*) AS freq
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token
        ORDER BY freq DESC, token ASC
        LIMIT 10
    """,
    "distinct_count": """
        SELECT source, COUNT(DISTINCT text) AS n_distinct_texts
        FROM documents GROUP BY source
    """,
    "streaming_decay_trend": f"""
        WITH scored AS (
            SELECT ts, event_type,
                   {_SCORE} AS score,
                   {_DECAY} AS weight,
                   CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
            FROM events
        )
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
               event_type,
               CAST(SUM(CAST(round(weight * score, 6) AS DECIMAL(28,6))) AS DOUBLE) AS decayed_score,
               CAST(SUM(CAST(round(weight * CAST(k AS DOUBLE), 6) AS DECIMAL(28,6))) AS DOUBLE) AS decayed_k,
               COUNT(*) AS n_events
        FROM scored
        GROUP BY 1, 2
    """,
    "agg_basic": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (CAST('1.00' AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (CAST('1.00' AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
                        * (CAST('1.00' AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
               CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
    """,
    "window_tumbling": """
        SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1
    """,
    "window_rank": """
        SELECT user_id, event_id, value, rnk FROM (
            SELECT user_id, event_id, value,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY value DESC, event_id ASC
                   ) AS INTEGER) AS rnk
            FROM events
        ) WHERE rnk <= 3
    """,
    "join_hash": """
        SELECT r_name AS region_name, n_name AS nation_name,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_totalprice
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY 1, 2
    """,
    "join_broadcast": """
        SELECT p_brand AS brand,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1
    """,
    "join_semi_anti": """
        SELECT c_custkey, 'has_orders' AS tag FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        UNION ALL
        SELECT c_custkey, 'no_orders' AS tag FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "set_ops": """
        WITH a AS (SELECT user_id FROM events WHERE event_type = 'purchase'),
             b AS (SELECT user_id FROM events WHERE value > 100.0)
        SELECT user_id, 'union_all' AS tag
        FROM (SELECT * FROM a UNION ALL SELECT * FROM b)
        UNION ALL
        SELECT user_id, 'intersect' AS tag
        FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
        UNION ALL
        SELECT user_id, 'except_all' AS tag
        FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
    """,
    "rollup_agg": """
        SELECT n_name AS nation_name, c_mktsegment AS mktsegment,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_acctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY ROLLUP(n_name, c_mktsegment)
    """,
    "dedup_exact": """
        SELECT text, MIN(doc_id) AS doc_id FROM documents GROUP BY text
    """,
    "sim_search": f"""
        WITH probes AS (
            SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pv
            FROM embeddings WHERE vec_id IN (0, 1, 2)
        ),
        scored AS (
            SELECT p.probe_id, e.vec_id,
                   {_COSINE.format(a="p.pv", b="CAST(e.embedding AS DOUBLE[])")} AS sim
            FROM embeddings e CROSS JOIN probes p
            WHERE e.vec_id <> p.probe_id
        )
        SELECT probe_id, vec_id, sim, rnk FROM (
            SELECT probe_id, vec_id, sim,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY probe_id ORDER BY sim DESC, vec_id ASC
                   ) AS INTEGER) AS rnk
            FROM scored
        ) WHERE rnk <= 5
    """,
    "text_stats": """
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens
        FROM documents
        GROUP BY lang
    """,
    "doc_profile": f"""
        SELECT doc_id,
               CASE WHEN {_STOP_RATIO} >= 0.08 THEN 'en' ELSE 'other' END AS lang_pred,
               {_QUALITY} AS quality,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+')) AS BIGINT) AS n_word_tok,
               md5(lower(text)) AS fp
        FROM documents
    """,
    "quality_filter": f"""
        SELECT doc_id, lang, quality FROM (
            SELECT doc_id, lang, {_QUALITY} AS quality FROM documents
        ) WHERE quality >= 0.55
    """,
    "sentiment_score": f"""
        WITH scored AS (
            SELECT doc_id,
                   CAST(len(list_filter(string_split(lower(text), ' '), t -> t IN ({_POS})))
                        - len(list_filter(string_split(lower(text), ' '), t -> t IN ({_NEG}))) AS DOUBLE)
                   / len(string_split(lower(text), ' ')) AS compound
            FROM documents
        )
        SELECT doc_id, round(compound, 6) AS compound,
               CASE WHEN compound >= 0.05 THEN 'Positive'
                    WHEN compound <= -0.05 THEN 'Negative'
                    ELSE 'Neutral' END AS label
        FROM scored
    """,
    "multimodal_decode": """
        SELECT doc_id,
               'image/fake' AS mime,
               CAST(strlen(text) AS BIGINT) AS n_bytes,
               CAST(64 + strlen(text) % 512 AS INTEGER) AS width,
               CAST(64 + (7 * strlen(text)) % 512 AS INTEGER) AS height,
               CAST(1 + strlen(text) % 4 AS INTEGER) AS n_frames
        FROM documents
    """,
}
