"""big_data_trend_analysis_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark re-expression of the capability surface of
the reference repo Najel-A/Big-Data-Trend-Analysis (streaming trend
analytics: JSON ingest, exponential time-decay weighting, sketch-based
approximate aggregation, keyword/trend extraction, JDBC serving — see
SURVEY.md), extended with the LLM-data-pipeline operators a 100 TB
training-data pipeline needs (dedup, similarity search, multimodal
columns, text analysis).

Design stance (SURVEY.md §7.0): pure DataFrame library. We declare
logical plans with the DataFrame/SQL API and let Catalyst + AQE +
whole-stage codegen pick the physical strategy. No custom planner, no
RDDs, no driver-side data paths. Python touches data only through
Arrow-batched pandas UDFs, and only where built-ins genuinely cannot
express the semantics (NLP enrichment, multimodal decode).
"""

from big_data_trend_analysis_spark.session import get_spark, tune_session

__all__ = ["get_spark", "tune_session"]
__version__ = "0.1.0"
