"""Balanced-bin classification fit/apply (SURVEY.md §2.4 A7, §2.9 N4–N5).

Reference: ``classifier.py`` ``BinDistribution`` — bin edges are
linear-interpolated quantiles of the sorted data::

    edges = np.interp(linspace(0, n-1, nbins+1), arange(n), sort(data))
    (classifier.py:73-74)

which is exactly ``percentile(v, k/nbins)`` with linear interpolation —
Spark's exact ``percentile`` (NOT approx_percentile: edge parity
matters, SURVEY.md §7 Stage 4). Apply is ``np.histogram`` one-hot
(``feature/features/financial.py:305-328``): bins ``[e_i, e_{i+1})``,
**last bin right-inclusive**, out-of-range → zero vector, NaN → null.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_bins(
    df: DataFrame, value_col: str, nbins: int, entity_col: str | None = "conv_id"
) -> DataFrame:
    """A7/N4: per-entity (or global) bin-edge array, exact quantiles."""
    ps = [i / nbins for i in range(nbins + 1)]
    agg = F.percentile(F.col(value_col), F.array([F.lit(p) for p in ps])).alias("edges")
    stats = [
        agg,
        F.avg(value_col).alias("bin_mean"),
        F.percentile(F.col(value_col), F.lit(0.5)).alias("bin_median"),
        F.stddev_pop(value_col).alias("bin_std"),
    ]
    return df.groupBy(entity_col).agg(*stats) if entity_col else df.agg(*stats)


def apply_bins(
    df: DataFrame,
    bins: DataFrame,
    value_col: str,
    nbins: int,
    entity_col: str | None = "conv_id",
    idx_col: str | None = None,
    onehot_col: str | None = None,
) -> DataFrame:
    """N5: broadcast-join edges; emit bin index (−1 = out of range,
    null = null input) and/or the one-hot array.

    np.histogram semantics: value in ``[e_i, e_{i+1})``; the last bin
    includes its right edge. Index = (count of interior edges ≤ v) for
    in-range v — pure array expressions, whole-stage codegen.
    """
    idx_col = idx_col or f"{value_col}_bin"
    # LEFT join: serve-time rows for entities absent from the fit emit
    # null bin indices instead of being silently dropped.
    joined = (
        df.join(F.broadcast(bins), on=entity_col, how="left")
        if entity_col
        else df.crossJoin(F.broadcast(bins))
    )
    v = F.col(value_col)
    e = F.col("edges")
    lo, hi = F.element_at(e, 1), F.element_at(e, nbins + 1)
    interior = F.slice(e, 2, nbins - 1)  # e_1 … e_{nbins-1}
    raw_idx = F.filter(interior, lambda edge: v >= edge)
    idx = (
        F.when(v.isNull() | F.isnan(v), F.lit(None).cast("int"))
        .when((v < lo) | (v > hi), F.lit(-1))
        .when(v == hi, F.lit(nbins - 1))  # last bin right-inclusive
        .otherwise(F.size(raw_idx))
        .cast("int")
    )
    out = joined.withColumn(idx_col, idx)
    if onehot_col:
        i = F.col(idx_col)
        onehot = F.transform(
            F.sequence(F.lit(0), F.lit(nbins - 1)),
            lambda k: F.when(k == i, F.lit(1.0)).otherwise(F.lit(0.0)),
        )
        out = out.withColumn(
            onehot_col, F.when(i.isNull(), F.lit(None)).otherwise(onehot)
        )
    drop = [c for c in bins.columns if c != entity_col]
    return out.drop(*drop)


# ---------------------------------------------------------------------------
# N6 declassification — consumer-side inverse transform (classifier.py:136-298)
# ---------------------------------------------------------------------------


def declassify(pdf: "np.ndarray", edges: "np.ndarray") -> dict:
    """Invert a predicted bin distribution back to point estimates
    (``classifier.py:136-298``): expectation and variance over bin
    centres with **Sheppard's correction** (−w²/12 per bin, grouped-data
    variance de-bias), plus the distribution median by linear
    interpolation within its bin. Operates on model outputs (tiny) —
    numpy, not a Spark op.
    """
    import numpy as np

    pdf = np.asarray(pdf, dtype=np.float64)
    edges = np.asarray(edges, dtype=np.float64)
    p = pdf / pdf.sum() if pdf.sum() > 0 else pdf
    centres = (edges[:-1] + edges[1:]) / 2.0
    widths = np.diff(edges)
    mean = float((p * centres).sum())
    # grouped-data variance with Sheppard's correction per bin
    raw_var = float((p * (centres - mean) ** 2).sum())
    sheppard = float((p * widths**2).sum() / 12.0)
    variance = max(raw_var - sheppard, 0.0)
    # median: first bin where cumulative prob crosses 0.5, linear within
    cum = np.cumsum(p)
    k = int(np.searchsorted(cum, 0.5))
    prev_cum = cum[k - 1] if k > 0 else 0.0
    frac = (0.5 - prev_cum) / p[k] if p[k] > 0 else 0.5
    median = float(edges[k] + frac * widths[k])
    return {"mean": mean, "variance": variance, "median": median}
