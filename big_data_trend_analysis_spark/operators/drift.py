"""Distribution-drift / monitoring operators (PSI, KS, mutual info).

A 100 TB pipeline is never run once: every ingest lands beside last
week's, and the first question is "did the data move?". This module
supplies the three standard monitoring statistics as declarative
plans — counts-based, so each is one or two hash aggregations over
slices of the fact table, never a collect of the distributions:

- **PSI** (population stability index): the banking/ML-monitoring
  standard for "has this feature's distribution shifted" — binned
  share comparison, Σ (q−p)·ln(q/p).
- **Two-sample Kolmogorov–Smirnov**: the nonparametric CDF-distance
  test — max |F_base − F_cur| over the merged support, exact from
  cumulative counts (no binning decision to argue about).
- **Mutual information**: the feature-relevance / leakage-audit
  measure between two categorical columns.

All arithmetic follows the engine's cross-engine float discipline:
shares and log-terms are ratios of exact integer counts (identical
IEEE doubles on both engines) rounded to 6 dp before any summation,
and sums of rounded terms fold in ``decimal(18,6)`` so totals are
order-independent (functions/numeric.py).

The baseline/current slices reuse ``operators/merge.SNAPSHOT_CUT`` —
the same deterministic split the CDC/MOR gates carve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from big_data_trend_analysis_spark.operators.merge import SNAPSHOT_CUT

#: Rounded log-terms accumulate exactly in this type (6 dp, 18 digits).
_TERM_DEC = "decimal(18,6)"


def _slices(events: DataFrame):
    cut = F.lit(SNAPSHOT_CUT).cast("timestamp")
    is_base = (F.col("ts") < cut).alias("is_base")
    return events.select("event_type", "ts", "value", is_base)


def psi_drift(events: DataFrame, n_bins: int = 10) -> DataFrame:
    """Population Stability Index of ``value``, baseline vs current.

    Equi-width bins over the GLOBAL min/max (one tiny agg broadcast —
    the ``feature_binning`` shape), then one counts aggregation per
    (bin, slice): the whole statistic is two scans' worth of
    hash-aggregate, shuffling O(bins) rows. Shares are clamped at
    1e-6 (the standard PSI guard for empty bins) so the log stays
    finite; per-bin contributions are rounded to 6 dp and the PSI
    total folds them in exact decimal. Emits one row per bin plus the
    total PSI repeated (flat relation, oracle-friendly):
    (bin, n_base, n_cur, psi_term, psi_total).

    Reading: PSI < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 act.
    """
    sliced = _slices(events)
    bounds = sliced.agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    binned = sliced.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.lit(n_bins - 1),
            F.floor(
                (F.col("value") - F.col("lo"))
                / ((F.col("hi") - F.col("lo")) / n_bins)
            ).cast("int"),
        ).alias("bin"),
        "is_base",
    )
    counts = binned.groupBy("bin").agg(
        F.count_if(F.col("is_base")).alias("n_base"),
        F.count_if(~F.col("is_base")).alias("n_cur"),
    )
    totals = counts.agg(
        F.sum("n_base").alias("t_base"), F.sum("n_cur").alias("t_cur")
    )
    eps = F.lit(1e-6)
    with_shares = counts.crossJoin(F.broadcast(totals)).select(
        "bin",
        "n_base",
        "n_cur",
        F.greatest(eps, F.col("n_base") / F.col("t_base")).alias("p"),
        F.greatest(eps, F.col("n_cur") / F.col("t_cur")).alias("q"),
    )
    term = F.round(
        (F.col("q") - F.col("p")) * F.log(F.col("q") / F.col("p")), 6
    )
    per_bin = with_shares.select("bin", "n_base", "n_cur", term.alias("psi_term"))
    total = per_bin.agg(
        F.sum(F.col("psi_term").cast(_TERM_DEC)).cast("double").alias("psi_total")
    )
    return per_bin.crossJoin(F.broadcast(total))


def ks_test_check(
    events: DataFrame, alpha_c: float = 1.36
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic, baseline vs current
    ``value`` distributions.

    D = max_v |F_base(v) − F_cur(v)| over the merged support, computed
    exactly from cumulative counts: one (value, slice) aggregation,
    one window pass ordered by value (state = |distinct values|, never
    |rows|), one max. ``drift`` flags D against the classical
    large-sample critical value c(α)·√((n+m)/(n·m)) with c(0.05) =
    1.36 — the boolean the oracle pins alongside the exact counts.
    The n·m product is computed in double (ADVICE r8: a BIGINT
    product overflows silently past ~3e9 rows per slice; doubles
    lose only ulp-level precision under a √, identically on both
    engines). Emits 1 row: (n_base, n_cur, d_stat, d_crit, drift).
    """
    sliced = _slices(events)
    per_value = sliced.groupBy("value").agg(
        F.count_if(F.col("is_base")).alias("c_base"),
        F.count_if(~F.col("is_base")).alias("c_cur"),
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    totals = per_value.agg(
        F.sum("c_base").alias("n_base"), F.sum("c_cur").alias("n_cur")
    )
    cdf = per_value.crossJoin(F.broadcast(totals)).select(
        (F.sum("c_base").over(w) / F.col("n_base")).alias("f_base"),
        (F.sum("c_cur").over(w) / F.col("n_cur")).alias("f_cur"),
        "n_base",
        "n_cur",
    )
    nb = F.col("n_base").cast("double")
    nc = F.col("n_cur").cast("double")
    d_crit = F.round(F.lit(alpha_c) * F.sqrt((nb + nc) / (nb * nc)), 6)
    return cdf.groupBy("n_base", "n_cur").agg(
        F.round(F.max(F.abs(F.col("f_base") - F.col("f_cur"))), 6).alias(
            "d_stat"
        )
    ).select(
        "n_base",
        "n_cur",
        "d_stat",
        d_crit.alias("d_crit"),
        (F.col("d_stat") > d_crit).alias("drift"),
    )


def mutual_information(events: DataFrame) -> DataFrame:
    """Mutual information between event_type and day-of-week.

    The feature-relevance / leakage-audit measure: MI(X;Y) =
    Σ_xy (n_xy/N)·ln(N·n_xy / (n_x·n_y)). Everything derives from ONE
    (x, y) contingency aggregation — marginals are re-aggregations of
    the contingency relation (O(|X|·|Y|) rows), so the corpus is
    scanned exactly once. Count products inside the log are computed
    in double (ADVICE r8: N·n_xy as BIGINT overflows silently past
    ~3e9 rows, wrapping to a wrong MI while the oracle errors); the
    double rounding is ulp-level under a ln, identical on both
    engines. Per-cell contributions rounded to 6 dp, total folded in
    exact decimal. Emits one row per (event_type, dow) cell plus the
    MI total repeated.
    """
    xy = events.select(
        "event_type", F.dayofweek("ts").alias("dow")
    ).groupBy("event_type", "dow").agg(F.count(F.lit(1)).alias("n_xy"))
    nx = xy.groupBy("event_type").agg(F.sum("n_xy").alias("n_x"))
    ny = xy.groupBy("dow").agg(F.sum("n_xy").alias("n_y"))
    n = xy.agg(F.sum("n_xy").alias("n_tot"))
    cells = (
        xy.join(F.broadcast(nx), "event_type")
        .join(F.broadcast(ny), "dow")
        .crossJoin(F.broadcast(n))
    )
    term = F.round(
        (F.col("n_xy") / F.col("n_tot"))
        * F.log(
            (F.col("n_tot").cast("double") * F.col("n_xy"))
            / (F.col("n_x").cast("double") * F.col("n_y"))
        ),
        6,
    )
    per_cell = cells.select(
        "event_type", "dow", "n_xy", term.alias("mi_term")
    )
    total = per_cell.agg(
        F.sum(F.col("mi_term").cast(_TERM_DEC)).cast("double").alias("mi_total")
    )
    return per_cell.crossJoin(F.broadcast(total))
