"""Query registry: the declared operator inventory (SURVEY.md §2.3)."""

from big_data_trend_analysis_spark.plans.registry import ORACLE_SQL, QUERIES

__all__ = ["QUERIES", "ORACLE_SQL"]
