"""Conditional scoring expressions (reference P8: when/otherwise).

Reference (``processing/edw_stream.py:92-96``) maps sentiment labels to
{+1.0, -1.0, 0.0}; it compares lowercase against producer-cased labels
and therefore always scores 0.0 — a bug we do not replicate (SURVEY.md
§2.1 P8): we normalize with ``lower()`` first.

The engine's batch twin scores ``events.event_type`` the same 3-way
shape so the semantics are oracle-checkable on driver testdata.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def three_way_score(
    col: Column | str,
    positive: str,
    negative: str,
) -> Column:
    """``+1.0`` if value==positive, ``-1.0`` if value==negative, else 0.0.

    Case-insensitive (the reference's P8 case bug, fixed).
    """
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    return (
        F.when(c == positive.lower(), F.lit(1.0))
        .when(c == negative.lower(), F.lit(-1.0))
        .otherwise(F.lit(0.0))
    )


def sentiment_label_score(label: Column | str) -> Column:
    """Reference-exact mapping: Positive→1.0, Negative→-1.0, else 0.0."""
    return three_way_score(label, "positive", "negative")


def event_type_score(event_type: Column | str) -> Column:
    """Batch-twin mapping on driver testdata: purchase→+1, error→-1."""
    return three_way_score(event_type, "purchase", "error")
