"""Deterministic numeric aggregation helpers.

Floating-point sums are order-dependent: at cluster scale the same
query can return last-ulp-different totals run-to-run because shuffle
partitioning changes the reduction order. This engine's contract is
*deterministic, oracle-matchable aggregates*, so money/measure sums go
through fixed-point decimal (exact, order-independent) and are cast
back to double at the end. This is also what makes the DuckDB
differential oracle hash-match instead of "close enough".

Precisions are sized so intermediate decimal arithmetic never exceeds
precision 38 (both Spark's and DuckDB's hard cap), keeping every step
exact — no engine-specific precision-loss rounding on either side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Decimal type for price-scale measures (< 1e10, 2 decimal places).
PRICE_DEC = "decimal(12,2)"
#: Decimal type for rate-scale measures in [0, 10) (discount, tax).
RATE_DEC = "decimal(4,2)"


def dec(col: Column | str, dtype: str = PRICE_DEC) -> Column:
    """Cast a 2-dp double measure to exact decimal."""
    return F.col(col).cast(dtype) if isinstance(col, str) else col.cast(dtype)


def exact_sum(col: Column | str, dtype: str = PRICE_DEC) -> Column:
    """Order-independent sum of a 2-dp double column, returned as double."""
    return F.sum(dec(col, dtype)).cast("double")


def exact_avg(col: Column | str, dtype: str = PRICE_DEC) -> Column:
    """Deterministic average: exact decimal sum, one double division."""
    c = F.col(col) if isinstance(col, str) else col
    # COUNT(*) (not COUNT(col)) to mirror the oracle SQL exactly.
    return F.sum(c.cast(dtype)).cast("double") / F.count(F.lit(1))


def rounded_sum(col: Column, scale: int = 6) -> Column:
    """Order-independent sum of a full-precision double expression.

    Rounds each row to ``scale`` decimals (deterministic given the
    per-row value), sums exactly in decimal, casts back to double. Used
    for derived measures like decay weights where inputs are not 2-dp.
    """
    return F.sum(F.round(col, scale).cast(f"decimal(28,{scale})")).cast("double")
