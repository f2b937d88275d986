"""Scalar function parity: date/time, string, and null-handling suites.

The reference's scalar surface is casts + ``split`` only (SURVEY.md
§2.1 "Not present"); these queries declare the engine's broader scalar
function coverage with cross-engine-stable semantics (every expression
chosen to behave identically in Spark and DuckDB, or mapped explicitly
in the oracle — e.g. day-of-week numbering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def date_parts(orders: DataFrame) -> DataFrame:
    """Date decomposition + truncation + arithmetic on order dates.

    dow is normalized to ISO (Mon=1..Sun=7) via ``dayofweek`` remap —
    Spark's native numbering (Sun=1) differs from DuckDB's (Sun=0), so
    the engine exposes the ISO form both sides agree on.
    """
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        (((F.dayofweek("o_orderdate") + 5) % 7) + 1).alias("o_isodow"),
        F.quarter("o_orderdate").alias("o_quarter"),
        # cast: Spark date_trunc yields TIMESTAMP but the semantic (and
        # DuckDB's) type for a month boundary is DATE — keep both sides DATE
        # so value comparison doesn't depend on the harness normalizing
        # midnight timestamps.
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.datediff(F.lit("2025-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_2025"
        ),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
    )


def string_funcs(part: DataFrame) -> DataFrame:
    """String manipulation suite over part names/brands."""
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_brand", 7, 2).alias("brand_code"),
        F.concat_ws("/", "p_type", "p_brand").alias("type_brand"),
        F.length("p_name").alias("name_len"),
        F.col("p_name").like("%red%").alias("has_red"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.split("p_type", " ").getItem(0).alias("type_head"),
    )


def unpivot_measures(lineitem: DataFrame) -> DataFrame:
    """Wide→long unpivot of the lineitem measures (melt).

    The inverse of pivot_counts: one output row per (row, measure).
    Spark's ``unpivot`` is an Expand node — no shuffle, scan-speed.
    """
    return lineitem.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="measure",
        valueColumnName="value",
    )


def null_handling(orders: DataFrame) -> DataFrame:
    """NULL-logic suite: nullif/coalesce/nvl2-style branching.

    The fixtures are null-free, so nulls are *manufactured* with
    ``nullif`` — the point is the null-propagation semantics, checked
    against the oracle's identical expressions.
    """
    status_null = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return orders.select(
        "o_orderkey",
        status_null.alias("status_or_null"),
        F.coalesce(status_null, F.lit("OPEN")).alias("status_filled"),
        F.when(status_null.isNull(), F.lit("is_open")).otherwise(F.lit("closed")).alias(
            "openness"
        ),
        F.isnull(status_null).alias("is_open_flag"),
    )


def variant_extract(events: DataFrame) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4 / SQL:2023-adjacent).

    ``parse_json`` materializes ``events.props`` as a VARIANT — the
    columnar semi-structured encoding that replaces
    string-JSON-per-row parsing at scale (parse once at scan, typed
    access thereafter; the engine's modern answer to the reference's
    from_json/to_json round-trips, SURVEY §2.1 P2/P5). Extraction is
    typed (``variant_get`` with a target type) plus a ``try_``-variant
    miss (NULL, not error) and a ``typeof``. The DuckDB twin reads the
    same fields through its native JSON type — engine-appropriate
    implementations of one semi-structured contract.
    """
    # try_parse_json, not parse_json: malformed payloads become NULL
    # variants (the PERMISSIVE contract the reference's from_json path
    # relies on, SURVEY §1.2) instead of failing the batch.
    v = F.try_parse_json("props")
    return events.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k_int"),
        F.variant_get(v, "$.k", "string").alias("k_str"),
        F.try_variant_get(v, "$.missing", "int").alias("missing_int"),
        F.schema_of_variant(v).alias("variant_schema"),
    )


#: Fixed probe vocabulary for the array-function suite — analytics
#: terms present in the fixture word bags (mirrored literally in the
#: DuckDB oracle).
ARRAY_SUITE_VOCAB = ("data", "model", "query", "spark", "stream")


def array_functions_suite(documents: DataFrame) -> DataFrame:
    """Array/higher-order-function parity row (scalar breadth).

    Per document: distinct-token cardinality, overlap with a fixed
    probe vocabulary (``array_intersect`` — compared by SIZE, since
    engines order intersection results differently), the 3 smallest
    distinct tokens canonicalized to a CSV string
    (``sort_array`` + ``slice`` + ``array_join`` — fully ordered, so
    string-comparable), and a ``filter`` count of long tokens. All
    row-local scan-speed expressions; zero shuffles.
    """
    toks = F.split("text", " ")
    distinct = F.array_distinct(toks)
    vocab = F.array(*[F.lit(v) for v in ARRAY_SUITE_VOCAB])
    return documents.select(
        "doc_id",
        F.size(distinct).alias("n_distinct"),
        F.size(F.array_intersect(distinct, vocab)).alias("n_vocab_hits"),
        F.array_join(F.slice(F.sort_array(distinct), 1, 3), ",").alias(
            "first3"
        ),
        F.size(F.filter(toks, lambda t: F.length(t) > 6)).alias("n_long"),
    )


def map_functions_suite(events: DataFrame) -> DataFrame:
    """MapType surface parity row: build a per-user event_type→count
    map (map_from_entries over an exact pre-aggregation) and exercise
    the map higher-order functions — size, element_at, map_filter,
    transform_values, map_keys/map_values. Maps never cross the
    engine boundary (key order is undefined in both engines); every
    output is a scalar the oracle recomputes relationally, so the
    gate pins the HOF semantics, not an encoding. One key shuffle to
    the (user, type) counts, map ops are row-local.
    """
    m = (
        events.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("user_id")
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("event_type", "c")))
            ).alias("m")
        )
    )
    doubled = F.transform_values("m", lambda k, v: v * 2)
    return m.select(
        "user_id",
        F.size("m").alias("n_types"),
        F.element_at("m", "click").alias("n_clicks"),
        F.size(F.map_filter("m", lambda k, v: v >= 3)).alias("n_heavy_types"),
        F.aggregate(
            F.map_values(doubled), F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("double_total"),
        F.concat_ws(",", F.array_sort(F.map_keys("m"))).alias("keys_csv"),
    )
