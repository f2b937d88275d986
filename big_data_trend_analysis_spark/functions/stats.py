"""Distribution quantiles as engine-portable column expressions.

Round-11 staging (docs/ROADMAP.md "Round-11 frontier" #1): the
experimentation tier flags significance against fixed normal critical
values (``ab_test_welch`` uses 1.96); the correct Welch gate is the
t-distribution quantile at the Welch–Satterthwaite df. SciPy is the
obvious tool and exactly the wrong one here — the gate needs the SAME
number from Spark and the DuckDB oracle, so the quantile must be a
closed-form expression both engines evaluate identically (the A&S
26.2.17 normal-tail discipline in ``operators/drift.py``).

``t_crit_975`` is the Cornish–Fisher expansion of the t quantile
around the normal quantile z₀.₉₇₅ (Fisher's asymptotic series in
1/df, four correction terms): pure arithmetic in df — no exp, no
gamma. Accuracy vs the t-table: relative error < 1.2e-3 at df = 3,
< 3e-4 at df = 4, < 2e-5 for df ≥ 8; at df = 2 the series reaches
only 4.27 vs 4.3027 (−0.75%), and df < 2 is outside its radius —
callers clamp df ≥ 2 (a Welch df below 2 means one cohort has ~2
rows; anti-conservatism there is the caller's data problem, and the
clamp keeps the gate strictly more conservative than 1.96
everywhere).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Φ⁻¹(0.975) — the fixed normal quantile the expansion corrects.
Z_975 = 1.959963984540054

#: Cornish–Fisher correction-term numerators evaluated at z = Z_975:
#: t ≈ z + g1/df + g2/df² + g3/df³ + g4/df⁴ with
#:   g1 = (z³+z)/4, g2 = (5z⁵+16z³+3z)/96,
#:   g3 = (3z⁷+19z⁵+17z³−15z)/384,
#:   g4 = (79z⁹+776z⁷+1482z⁵−1920z³−945z)/92160.
_G1 = (Z_975**3 + Z_975) / 4.0
_G2 = (5 * Z_975**5 + 16 * Z_975**3 + 3 * Z_975) / 96.0
_G3 = (3 * Z_975**7 + 19 * Z_975**5 + 17 * Z_975**3 - 15 * Z_975) / 384.0
_G4 = (
    79 * Z_975**9
    + 776 * Z_975**7
    + 1482 * Z_975**5
    - 1920 * Z_975**3
    - 945 * Z_975
) / 92160.0


def t_crit_975(df: Column) -> Column:
    """Two-sided 5% Student-t critical value at (possibly fractional) df.

    A pure-arithmetic column expression (portable to any SQL engine as
    the same literal polynomial in 1/df — the oracle twin is the
    identical four-term Horner form). df is clamped at 2 from below;
    NULL df (degenerate Welch cohorts) stays NULL so the caller's
    not-significant coalesce applies.
    """
    # when/otherwise, not greatest: Spark's greatest SKIPS nulls, so a
    # NULL df would silently clamp to 2 instead of propagating
    d = F.when(df.cast("double") < 2.0, F.lit(2.0)).otherwise(
        df.cast("double")
    )
    inv = F.lit(1.0) / d
    return F.lit(Z_975) + inv * (
        F.lit(_G1)
        + inv * (F.lit(_G2) + inv * (F.lit(_G3) + inv * F.lit(_G4)))
    )


def t_crit_975_sql(df_expr: str) -> str:
    """DuckDB twin of ``t_crit_975``: the same Horner polynomial over
    the same double literals, for splicing into an oracle SQL string.
    The clamp is a CASE on both engines — greatest() SKIPS nulls in
    BOTH Spark and DuckDB, which would turn a degenerate-cohort NULL
    df into a significant-looking 4.27 instead of propagating."""
    inv = (
        f"(1.0 / CASE WHEN CAST({df_expr} AS DOUBLE) < 2.0 THEN 2.0"
        f" ELSE CAST({df_expr} AS DOUBLE) END)"
    )
    return (
        f"({Z_975!r} + {inv} * ({_G1!r} + {inv} * ({_G2!r} + {inv} * "
        f"({_G3!r} + {inv} * {_G4!r}))))"
    )
