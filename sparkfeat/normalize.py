"""Normalization fit/apply split (SURVEY.md §2.9 N1–N3, §2.4 A6).

The reference fits sklearn scalers per symbol or globally
(``feature/features/financial.py:68-82`` scaler registry, :121-138 fit,
:140-171 apply; orchestration ``transformation/base.py:283-302``) and
re-uses the fitted scaler at predict time. Here the "fitted scaler" IS
a stats table:

    fit:   groupBy(conv_id).agg(count, mean, stddev_pop, min, max,
           percentile([.25, .5, .75]))       → small stats DataFrame
    apply: broadcast-join stats, closed-form Column expression

which makes the fit artifact persistable (write the stats table) and
the serving path zero-leakage by construction (fit on train range,
apply anywhere). Scalers, matching sklearn formulas:

* standard — (v − mean)/std_pop          (StandardScaler, ddof=0)
* min_max  — (v − min)/(max − min)       (MinMaxScaler)
* robust   — (v − median)/(q75 − q25)    (RobustScaler, linear-interp
             quantiles = Spark exact ``percentile``)
* gaussian — rank → Φ⁻¹ (QuantileTransformer(output='normal') rank
             semantics), Φ⁻¹ via Acklam's inverse-normal-CDF
             approximation (public domain algorithm, |ε|<1.15e-9) in a
             vectorized pandas UDF (no scipy in this environment).

NaN handling per reference (financial.py:140-171): NaNs are masked
through the transform and restored — expressions here propagate null
naturally. Zero-scale groups (constant series) → null (sklearn emits
0/ε-guard; the reference's fixtures never hit it — we surface null
rather than invent a value).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCALERS = ("standard", "min_max", "robust", "gaussian")


def fit_stats(
    df: DataFrame, value_col: str, entity_col: str | None = "conv_id"
) -> DataFrame:
    """A6: one stats row per entity (or a single global row when
    ``entity_col=None``) — the persistable fit artifact."""
    aggs = [
        F.count(value_col).alias("n"),
        F.avg(value_col).alias("mean"),
        F.stddev_pop(value_col).alias("std"),
        F.min(value_col).alias("vmin"),
        F.max(value_col).alias("vmax"),
        F.percentile(F.col(value_col), F.lit(0.25)).alias("q25"),
        F.percentile(F.col(value_col), F.lit(0.5)).alias("q50"),
        F.percentile(F.col(value_col), F.lit(0.75)).alias("q75"),
    ]
    if entity_col is None:
        return df.agg(*aggs)
    return df.groupBy(entity_col).agg(*aggs)


def apply_scaler(
    df: DataFrame,
    stats: DataFrame,
    value_col: str,
    method: str,
    out_col: str | None = None,
    entity_col: str | None = "conv_id",
) -> DataFrame:
    """N3: broadcast-join the stats table and scale ``value_col``.

    ``gaussian`` is rank-based and needs no stats join — it computes
    the in-group quantile rank directly (see :func:`gaussian_scale`).
    """
    out_col = out_col or f"{value_col}_{method}"
    if method == "gaussian":
        return gaussian_scale(df, value_col, out_col, entity_col)
    if method not in SCALERS:
        raise ValueError(f"unknown scaler {method!r}")
    # LEFT join: serve-time rows for entities absent from the training
    # fit pass through with null scaled values instead of silently
    # disappearing — callers decide how to handle unseen entities.
    joined = (
        df.join(F.broadcast(stats), on=entity_col, how="left")
        if entity_col
        else df.crossJoin(F.broadcast(stats))
    )
    v = F.col(value_col)
    if method == "standard":
        e = (v - F.col("mean")) / F.nullif(F.col("std"), F.lit(0.0))
    elif method == "min_max":
        e = (v - F.col("vmin")) / F.nullif(F.col("vmax") - F.col("vmin"), F.lit(0.0))
    else:  # robust
        e = (v - F.col("q50")) / F.nullif(F.col("q75") - F.col("q25"), F.lit(0.0))
    stat_cols = [c for c in stats.columns if c != entity_col]
    return joined.withColumn(out_col, e).drop(*stat_cols)


def inverse_scaler(
    df: DataFrame,
    stats: DataFrame,
    z_col: str,
    method: str,
    out_col: str | None = None,
    entity_col: str | None = "conv_id",
) -> DataFrame:
    """Inverse transform for the closed-form scalers — the predict path
    (``financial.py:330-385`` ``inverse_transform_multi_predict_y``
    applies ``scaler.inverse_transform`` to model outputs before
    declassification): broadcast-join the SAME fit-stats artifact and
    invert in place.

    * standard — v = z·σ + μ
    * min_max  — v = z·(max − min) + min
    * robust   — v = z·(q75 − q25) + q50

    For gaussian see :func:`inverse_gaussian_scale` (needs the quantile
    grid, not the moment stats)."""
    out_col = out_col or f"{z_col}_inv"
    if method not in ("standard", "min_max", "robust"):
        raise ValueError(f"no closed-form inverse for scaler {method!r}")
    joined = (
        df.join(F.broadcast(stats), on=entity_col, how="left")
        if entity_col
        else df.crossJoin(F.broadcast(stats))
    )
    z = F.col(z_col)
    if method == "standard":
        e = z * F.col("std") + F.col("mean")
    elif method == "min_max":
        e = z * (F.col("vmax") - F.col("vmin")) + F.col("vmin")
    else:  # robust
        e = z * (F.col("q75") - F.col("q25")) + F.col("q50")
    stat_cols = [c for c in stats.columns if c != entity_col]
    return joined.withColumn(out_col, e).drop(*stat_cols)


#: Φ⁻¹(0.75) — the consistency constant that makes MAD estimate σ for
#: normal data; 0.6745·(x − median)/MAD is the "modified z-score" of
#: Iglewicz & Hoaglin (1993), the robust outlier screen whose breakdown
#: point (50%) survives the heavy-tailed value distributions that wreck
#: mean/σ z-scores on web-scale corpora (one 10⁷-char boilerplate doc
#: drags a mean; it cannot drag a median).
MAD_CONSISTENCY = 0.6744897501960817


def fit_mad(
    df: DataFrame, value_col: str, entity_col: str | None = "conv_id"
) -> DataFrame:
    """MAD fit artifact: one ``(n, med, mad)`` row per entity (or one
    global row) — the robust dispersion companion of :func:`fit_stats`
    (whose 'robust' scaler centers on the median but scales by IQR;
    MAD's 50% breakdown point beats IQR's 25%).

    Two exact-percentile passes — median first, then the median of
    absolute deviations FROM that median (MAD is a nested statistic; no
    single groupBy can express it): the tiny per-entity median table
    broadcast-joins back onto the values, so the value table shuffles
    on the entity key at most twice and nothing ever collects. Exact
    ``percentile`` (linear interpolation ≡ DuckDB ``quantile_cont``,
    the house parity convention for fit artifacts — classify.fit_bins'
    GK-sketch ``method='approx'`` is the documented escape hatch if a
    single entity's turn count ever makes exact unaffordable)."""
    v = F.col(value_col)
    if entity_col is None:
        med = df.agg(F.percentile(v, F.lit(0.5)).alias("med"))
        joined = df.crossJoin(F.broadcast(med))
        return joined.agg(
            F.count(v).alias("n"),
            F.min("med").alias("med"),
            F.percentile(F.abs(v - F.col("med")), F.lit(0.5)).alias("mad"),
        )
    med = df.groupBy(entity_col).agg(F.percentile(v, F.lit(0.5)).alias("med"))
    joined = df.join(F.broadcast(med), entity_col)
    return joined.groupBy(entity_col).agg(
        F.count(v).alias("n"),
        F.min("med").alias("med"),
        F.percentile(F.abs(v - F.col("med")), F.lit(0.5)).alias("mad"),
    )


def apply_mad_z(
    df: DataFrame,
    stats: DataFrame,
    value_col: str,
    z_col: str = "mad_z",
    flag_col: str = "is_outlier",
    entity_col: str | None = "conv_id",
    threshold: float = 3.5,
) -> DataFrame:
    """Modified z-score + outlier flag from a :func:`fit_mad` artifact:
    z = 0.6745·(v − med)/MAD, flag = |z| > 3.5 (the Iglewicz–Hoaglin
    recommendation). Same broadcast-join fit/apply split as
    :func:`apply_scaler` — the artifact persists, the serve path is
    zero-leakage, unseen entities pass through with null z (LEFT join).
    Constant series (MAD = 0) yield null, the house zero-scale
    convention; the flag is computed on the UNROUNDED z so both engines
    compare the same double."""
    joined = (
        df.join(F.broadcast(stats), on=entity_col, how="left")
        if entity_col
        else df.crossJoin(F.broadcast(stats))
    )
    v = F.col(value_col)
    z = (
        F.lit(MAD_CONSISTENCY)
        * (v - F.col("med"))
        / F.nullif(F.col("mad"), F.lit(0.0))
    )
    stat_cols = [c for c in stats.columns if c != entity_col]
    return (
        joined.withColumn(z_col, z)
        .withColumn(flag_col, F.abs(F.col(z_col)) > F.lit(threshold))
        .drop(*stat_cols)
    )


def fit_quantile_grid(
    df: DataFrame,
    value_col: str,
    n_quantiles: int = 101,
    entity_col: str | None = "conv_id",
) -> DataFrame:
    """Fit artifact for the gaussian inverse: the training data's exact
    quantile function sampled at ``n_quantiles`` evenly spaced ranks —
    what sklearn's QuantileTransformer stores as ``quantiles_``. One
    groupBy aggregate; the grid is tiny and broadcastable."""
    ps = [i / (n_quantiles - 1) for i in range(n_quantiles)]
    agg = F.percentile(F.col(value_col), F.array([F.lit(p) for p in ps])).alias(
        "qgrid"
    )
    return df.groupBy(entity_col).agg(agg) if entity_col else df.agg(agg)


def inverse_gaussian_scale(
    df: DataFrame,
    grid: DataFrame,
    z_col: str,
    out_col: str | None = None,
    entity_col: str | None = "conv_id",
) -> DataFrame:
    """Gaussian inverse: v = Q(Φ(z)) — normal CDF of the scaled value,
    then the training quantile function by linear interpolation over the
    broadcast grid (QuantileTransformer.inverse_transform semantics).
    Φ via ``math.erf`` (libm-exact), np.interp per Arrow batch."""
    import math

    from pyspark.sql.types import DoubleType

    out_col = out_col or f"{z_col}_inv"
    joined = (
        df.join(F.broadcast(grid), on=entity_col, how="left")
        if entity_col
        else df.crossJoin(F.broadcast(grid))
    )
    @F.pandas_udf(DoubleType())
    def inv(z: pd.Series, qgrid: pd.Series) -> pd.Series:
        import math as _m

        out = np.full(len(z), np.nan)
        zv = z.to_numpy(dtype=np.float64)
        with np.errstate(invalid="ignore"):
            p = np.array(
                [
                    0.5 * (1.0 + _m.erf(v / _m.sqrt(2.0)))
                    if np.isfinite(v)
                    else np.nan
                    for v in zv
                ]
            )
        for i, g in enumerate(qgrid):
            if g is None or not np.isfinite(p[i]):
                continue
            g = np.asarray(g, dtype=np.float64)
            ranks = np.linspace(0.0, 1.0, len(g))
            out[i] = np.interp(p[i], ranks, g)
        return pd.Series(out)

    return joined.withColumn(out_col, inv(F.col(z_col), F.col("qgrid"))).drop("qgrid")


def _acklam_ndtri(p: np.ndarray) -> np.ndarray:
    """Inverse normal CDF, Acklam's rational approximation (public
    domain; relative error < 1.15e-9). numpy-only — no scipy here."""
    a = [-3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
         1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00]
    b = [-5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
         6.680131188771972e01, -1.328068155288572e01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
         -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
         3.754408661907416e00]
    p = np.asarray(p, dtype=np.float64)
    out = np.full_like(p, np.nan)
    plow, phigh = 0.02425, 1 - 0.02425

    lo = (p > 0) & (p < plow)
    q = np.sqrt(-2 * np.log(p[lo]))
    out[lo] = (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
        (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
    )
    mid = (p >= plow) & (p <= phigh)
    q = p[mid] - 0.5
    r = q * q
    out[mid] = (
        (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5])
        * q
        / (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1)
    )
    hi = (p > phigh) & (p < 1)
    q = np.sqrt(-2 * np.log(1 - p[hi]))
    out[hi] = -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
        (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
    )
    return out


def _ndtri_udf():
    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def ndtri(p: pd.Series) -> pd.Series:
        return pd.Series(_acklam_ndtri(p.to_numpy(dtype=np.float64)))

    return ndtri


def gaussian_scale(
    df: DataFrame,
    value_col: str,
    out_col: str,
    entity_col: str | None = "conv_id",
) -> DataFrame:
    """N1 'gaussian': quantile rank → Φ⁻¹.

    Rank = (count of VALID rows at-or-before in value order − 0.5)/n_valid
    — the midpoint ECDF over non-null, non-NaN values only. Nulls sort
    first and NaNs last in Spark's value ordering, so a naive
    ``cume_dist·n`` would shift every rank when invalid rows are present;
    counting ``when(valid, v)`` over the value-ordered range frame (peers
    included, like cume_dist) excludes them exactly, and invalid rows emit
    null (the reference masks NaNs through the transform,
    financial.py:140-171). Rank clipped away from {0, 1} so Φ⁻¹ stays
    finite (QuantileTransformer clips to [ε, 1−ε] the same way).

    ``entity_col=None`` (global fit) avoids the single-task global sort:
    ``repartitionByRange(value)`` co-locates equal values, each task ranks
    its own value range in parallel, and the tiny per-partition valid
    counts are prefix-summed and broadcast-joined back — exact global
    ranks with no serialized sort (the range exchange is computed once
    and reused for both the counts and the rank side).
    """
    from pyspark.sql import Window

    v = F.col(value_col)
    valid = v.isNotNull() & ~F.isnan(v.cast("double"))
    ndtri = _ndtri_udf()

    if entity_col is not None:
        w_ord = (
            Window.partitionBy(entity_col)
            .orderBy(v)
            .rangeBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cnt_le = F.count(F.when(valid, v)).over(w_ord)
        n = F.count(F.when(valid, v)).over(Window.partitionBy(entity_col))
        rank = (cnt_le - F.lit(0.5)) / n
        clipped = F.least(F.greatest(rank, F.lit(1e-7)), F.lit(1 - 1e-7))
        return df.withColumn(out_col, F.when(valid, ndtri(clipped)))

    # global: two-pass range-partitioned exact rank
    ranged = df.repartitionByRange(v).withColumn("_pid", F.spark_partition_id())
    pc = ranged.groupBy("_pid").agg(F.count(F.when(valid, v)).alias("_c"))
    w_pid = Window.orderBy("_pid")
    offs = pc.select(
        "_pid",
        F.coalesce(
            F.sum("_c").over(w_pid.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("_off"),
        F.sum("_c")
        .over(w_pid.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("_n"),
    )
    w_loc = (
        Window.partitionBy("_pid")
        .orderBy(v)
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = ranged.join(F.broadcast(offs), "_pid")
    cnt_le = F.col("_off") + F.count(F.when(valid, v)).over(w_loc)
    rank = (cnt_le - F.lit(0.5)) / F.col("_n")
    clipped = F.least(F.greatest(rank, F.lit(1e-7)), F.lit(1 - 1e-7))
    return joined.withColumn(out_col, F.when(valid, ndtri(clipped))).drop(
        "_pid", "_off", "_n"
    )
