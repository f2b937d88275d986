"""Exponential time-decay weighting (the reference's "EDW" core).

Reference semantics (``processing/edw_stream.py:64-105``):
``weight = exp(-DECAY_RATE * time_diff_sec / HALF_LIFE)`` with
``DECAY_RATE=0.1``, ``HALF_LIFE=60``, and ``time_diff_sec`` measured
against a **driver wall-clock anchor** captured once per micro-batch
(``edw_stream.py:75``). Two deliberate divergences, documented in
SURVEY.md §7.3:

- The anchor is an explicit parameter (testability; at scale the anchor
  is the window end or watermark, never driver wall-clock).
- We keep the reference's rate/half-life formula as-is (it is *not* a
  true half-life — weight halves at ~416 s, see SURVEY §2.1 M2) because
  it is the reference's defined semantics.

This is a pure column expression: JVM-side, codegen'd, no UDF — the
decay math costs the same as any arithmetic projection at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DECAY_RATE = 0.1
HALF_LIFE = 60.0

#: Fixed, documented anchor for batch/oracle runs (FIXTURES.md: events
#: span Jan 2024, so 2024-02-01 is strictly after every event).
DEFAULT_ANCHOR = "2024-02-01 00:00:00"


def decay_weight(
    ts: Column | str,
    anchor: str = DEFAULT_ANCHOR,
    rate: float = DECAY_RATE,
    half_life: float = HALF_LIFE,
) -> Column:
    """``exp(-rate * (anchor - ts in seconds) / half_life)`` as a column.

    ``ts.cast("double")`` yields fractional epoch seconds (microsecond
    precision) — matching DuckDB's ``epoch(ts)`` exactly, which keeps
    the oracle differential bit-stable.
    """
    ts_col = F.col(ts) if isinstance(ts, str) else ts
    anchor_sec = F.lit(anchor).cast("timestamp").cast("double")
    age_sec = anchor_sec - ts_col.cast("double")
    return F.exp(-F.lit(rate) * age_sec / F.lit(half_life))
