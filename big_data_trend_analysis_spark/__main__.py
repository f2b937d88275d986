"""Runnable demo: ``python -m big_data_trend_analysis_spark [sf_dir]``.

Shows the engine's headline capabilities on the driver testdata: the
flagship decay-weighted trend, keyword top-k, near-dup detection, and
the curation pipeline — the queries a user of the reference project
would run after switching to this engine.
"""

from __future__ import annotations

import sys

from big_data_trend_analysis_spark.plans.registry import QUERIES
from big_data_trend_analysis_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("bdta-demo")
    spark.sparkContext.setLogLevel("ERROR")

    print(f"\n== flagship: decay-weighted event-type trend ({sf_dir}) ==")
    QUERIES["streaming_decay_trend"](spark, sf_dir).show(8, truncate=False)

    print("== trending keywords (top-10) ==")
    QUERIES["keyword_topk"](spark, sf_dir).show(truncate=False)

    print("== near-duplicate documents (MinHash-LSH, Jaccard ≥ 0.6) ==")
    QUERIES["dedup_minhash"](spark, sf_dir).show(8, truncate=False)

    print("== curation pipeline (clean → quality gate → dedup) ==")
    QUERIES["pipeline_curate"](spark, sf_dir).show(5, truncate=80)

    print("== similarity search (exact cosine top-5 per probe) ==")
    QUERIES["sim_search"](spark, sf_dir).show(15, truncate=False)

    print("== benchmark decontamination (3-gram overlap vs eval slice) ==")
    QUERIES["decontaminate_ngram"](spark, sf_dir).orderBy(
        "doc_id"
    ).show(8, truncate=False)

    print("== weekly retention cohorts ==")
    QUERIES["retention_cohort"](spark, sf_dir).orderBy(
        "cohort_week", "week_offset"
    ).show(8, truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
