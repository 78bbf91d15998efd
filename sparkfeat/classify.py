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

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unit_gaussian_edges(n_edges: int) -> np.ndarray:
    """Equal-probability bin edges of a unit gaussian
    (``classifier.py:331-345`` ``_calculate_unit_gaussian_edges`` exact):
    sampler = arange(−1 + 1/n_edges, 1, 2/n_edges); edges =
    erfinv(sampler)·√2, with erfinv via the Acklam Φ⁻¹
    (erfinv(x)·√2 == Φ⁻¹((x+1)/2); no scipy in this environment)."""
    from sparkfeat.normalize import _acklam_ndtri

    step = 2.0 / n_edges
    sampler = np.arange(-1.0 + step / 2.0, 1.0, step)
    return _acklam_ndtri((sampler + 1.0) / 2.0)


def fit_bins(
    df: DataFrame,
    value_col: str,
    nbins: int,
    entity_col: str | None = "conv_id",
    centred: bool = False,
    method: str = "exact",
    accuracy: int = 10_000,
) -> DataFrame:
    """A7/N4: per-entity (or global) bin-edge array.

    ``centred=False`` — balanced bins: exact linear-interp quantiles
    (classifier.py:73-74). ``centred=True`` — the ``use_centred_bins``
    branch (classifier.py:69-71): edges = unit-gaussian equal-probability
    edges × σ_pop, symmetric around 0 — constants scaled by one per-entity
    aggregate, so the fit stays a single groupBy.

    ``method`` — the physical strategy for the balanced-quantile path:

    * ``'exact'`` (default): Spark's exact ``percentile`` — reference
      edge parity (SURVEY.md §7 Stage 4), but the aggregate BUFFERS
      every value of a group in executor memory, which is the real OOM
      hazard when one entity holds 10^9+ turns.
    * ``'approx'``: ``percentile_approx`` (Greenwald-Khanna sketch,
      bounded memory O(accuracy·log n) per group regardless of group
      size) — the 10^12-row strategy. Rank error ≤ n/``accuracy`` per
      edge (pytest-bounded vs the exact path); bin_median moves to the
      same sketch so the whole fit stays sketch-only.

    ``centred=True`` ignores ``method`` (its only aggregate is a
    constant-memory stddev)."""
    if centred:
        consts = [float(x) for x in unit_gaussian_edges(nbins + 1)]
        sd = F.stddev_pop(value_col)
        agg = F.transform(
            F.array(*[F.lit(c) for c in consts]), lambda e: e * sd
        ).alias("edges")
        med = F.percentile(F.col(value_col), F.lit(0.5))
    elif method == "approx":
        ps = [i / nbins for i in range(nbins + 1)]
        agg = F.percentile_approx(
            F.col(value_col),
            F.array([F.lit(p) for p in ps]),
            F.lit(accuracy),
        ).cast("array<double>").alias("edges")
        med = F.percentile_approx(
            F.col(value_col), F.lit(0.5), F.lit(accuracy)
        ).cast("double")
    elif method == "exact":
        ps = [i / nbins for i in range(nbins + 1)]
        agg = F.percentile(F.col(value_col), F.array([F.lit(p) for p in ps])).alias(
            "edges"
        )
        med = F.percentile(F.col(value_col), F.lit(0.5))
    else:  # pragma: no cover - guard
        raise ValueError(f"unknown fit_bins method {method!r}")
    stats = [
        agg,
        F.avg(value_col).alias("bin_mean"),
        med.alias("bin_median"),
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


def fit_bin_pdf(
    df: DataFrame,
    bins: DataFrame,
    value_col: str,
    nbins: int,
    entity_col: str | None = "conv_id",
    centred: bool = False,
) -> DataFrame:
    """Distributed twin of the BinDistribution pdf fit
    (``classifier.py:26-32``): broadcast-join the edges table, histogram
    each row (np.histogram semantics via the same index math as
    :func:`apply_bins`), fold out-of-range values into the outer bins
    when ``centred`` (classifier.py:28-30 outlier catch; balanced edges
    span the data so -1 cannot occur there), then one groupBy →
    dense ``pdf`` array per entity. At 10^12 rows this is a single
    partial-aggregated count — the numpy fit
    (:func:`fit_bin_distribution`) is for driver-sized series."""
    joined = (
        df.join(F.broadcast(bins), on=entity_col, how="left")
        if entity_col
        else df.crossJoin(F.broadcast(bins))
    )
    v = F.col(value_col)
    e = F.col("edges")
    lo, hi = F.element_at(e, 1), F.element_at(e, nbins + 1)
    interior = F.slice(e, 2, nbins - 1)
    raw_idx = F.size(F.filter(interior, lambda edge: v >= edge))
    below = F.lit(0) if centred else F.lit(-1)
    above = F.lit(nbins - 1) if centred else F.lit(-1)
    idx = (
        F.when(v.isNull() | F.isnan(v.cast("double")), F.lit(None).cast("int"))
        .when(v < lo, below)
        .when(v > hi, above)
        .when(v == hi, F.lit(nbins - 1))
        .otherwise(raw_idx)
        .cast("int")
    )
    idx_df = joined.withColumn("_bi2", idx).drop(
        *[c for c in bins.columns if c != entity_col]
    )
    valid = idx_df.filter(F.col("_bi2").isNotNull() & (F.col("_bi2") >= 0))
    gcols = [entity_col] if entity_col else []
    counts = valid.groupBy(*gcols, "_bi2").agg(F.count(F.lit(1)).alias("_c"))
    per_entity = counts.groupBy(*gcols).agg(
        F.sum("_c").alias("_n"),
        F.map_from_entries(
            F.collect_list(F.struct(F.col("_bi2"), F.col("_c")))
        ).alias("_m"),
    )
    pdf = F.transform(
        F.sequence(F.lit(0), F.lit(nbins - 1)),
        lambda k: F.coalesce(
            F.element_at(F.col("_m"), k).cast("double"), F.lit(0.0)
        )
        / F.col("_n"),
    )
    return per_entity.select(*gcols, F.col("_n").alias("n"), pdf.alias("pdf"))


# ---------------------------------------------------------------------------
# N6 declassification — consumer-side inverse transform (classifier.py:136-298)
# ---------------------------------------------------------------------------


@dataclass
class BinDist:
    """Fitted bin distribution — the serving-side template the reference
    builds per symbol (``classifier.py:9-46`` BinDistribution.__init__).
    Operates on training-series-sized numpy arrays (the fit) and model
    outputs (tiny pdfs); the distributed twin of the edge fit is
    :func:`fit_bins`."""

    n_bins: int
    bin_edges: np.ndarray
    pdf: np.ndarray
    bin_centres: np.ndarray
    weighted_bin_centres: np.ndarray
    bin_widths: np.ndarray
    mean_bin_width: float
    sheppards_correction: float
    mean: float
    median: float
    sigma: float


def find_best_fit_pdf_type(data: np.ndarray | None = None) -> str:
    """Functional-form selector for the fitted distribution. The reference
    (``classifier.py:48-54``) is a hard-coded stub returning ``'Gaussian'``
    (its TODO for t/lognormal was never enabled); mirrored verbatim for
    inventory completeness so config-driven callers have the same hook."""
    return "Gaussian"


def fit_bin_distribution(
    data: np.ndarray, n_bins: int, use_centred_bins: bool = False
) -> BinDist:
    """``BinDistribution.__init__`` exact (classifier.py:9-46): balanced
    (np.interp-quantile) or centred (unit-gaussian × σ) edges, histogram
    pdf with outliers folded into the outer bins when centred, bin
    geometry, Sheppard's correction = median(widths²)/12
    (classifier.py:131-134), and per-bin weighted centres (mean of the
    [lo, hi]-inclusive member values; empty bin → geometric centre)."""
    data = np.asarray(data, dtype=np.float64).flatten()
    data = data[np.isfinite(data)]
    n = len(data)
    if n == 0:
        raise ValueError("empty data")
    mean = float(np.mean(data))
    median = float(np.median(data))
    sigma = float(np.std(data))
    if use_centred_bins:
        edges = unit_gaussian_edges(n_bins + 1) * sigma
    else:
        xr = np.linspace(0, n - 1, n_bins + 1)
        edges = np.interp(xr, np.arange(n), np.sort(data))
    counts, _ = np.histogram(data, edges, density=False)
    if use_centred_bins:  # catch outliers (classifier.py:28-30)
        counts = counts.astype(np.float64)
        counts[0] += np.sum(data < edges[0])
        counts[-1] += np.sum(data > edges[-1])
    pdf = counts / n
    centres = 0.5 * (edges[1:] + edges[:-1])
    widths = edges[1:] - edges[:-1]
    wbc = np.empty(n_bins)
    for i in range(n_bins):
        members = data[(data >= edges[i]) & (data <= edges[i + 1])]
        wbc[i] = members.mean() if len(members) else centres[i]
    return BinDist(
        n_bins=n_bins,
        bin_edges=edges,
        pdf=np.asarray(pdf, dtype=np.float64),
        bin_centres=centres,
        weighted_bin_centres=wbc,
        bin_widths=widths,
        mean_bin_width=float(abs(edges[-1] - edges[0]) / n_bins),
        sheppards_correction=float(np.median(widths**2) / 12.0),
        mean=mean,
        median=median,
        sigma=sigma,
    )


def _single_confidence_level(dist: BinDist, pdf: np.ndarray, level: float) -> float:
    """``classifier.py:152-198`` ``_calculate_single_confidence_interval``
    exact: walk bins to the cumulative ``level``; interpolate linearly
    inside an interior bin, treat the outermost bins as triangles whose
    centre of mass sits at the weighted bin centre."""
    if level < 0 or level > 1:
        raise ValueError(f"invalid confidence level {level}")
    pdf = np.asarray(pdf, dtype=np.float64).flatten()
    if len(pdf) != dist.n_bins:
        raise ValueError(f"pdf length {len(pdf)} != n_bins {dist.n_bins}")
    bin_index = 0
    cumulative = pdf[0]
    while cumulative < level:
        bin_index += 1
        cumulative += pdf[bin_index]
    bin_total = pdf[bin_index]
    if bin_index == 0:  # histogram edge as a triangle (CoM at 1/3)
        bin_offset = dist.bin_edges[1] - dist.weighted_bin_centres[0]
        triangle_width = 3 * bin_offset
        low_edge = dist.bin_edges[1] - triangle_width
        fill = np.sqrt(level / bin_total)
        return float(low_edge + triangle_width * fill)
    if bin_index == dist.n_bins:  # unreachable when pdf sums to 1; kept for parity
        bin_offset = dist.weighted_bin_centres[-1] - dist.bin_edges[-2]
        triangle_width = 3 * bin_offset
        upper_edge = dist.bin_edges[-2] + triangle_width
        fill = np.sqrt((1 - level) / bin_total)
        return float(upper_edge - triangle_width * fill)
    lower_edge = dist.bin_edges[bin_index]
    overflow = cumulative - level
    residue = bin_total - overflow
    return float(lower_edge + dist.bin_widths[bin_index] * residue / bin_total)


def estimate_confidence_interval(
    dist: BinDist, pdf: np.ndarray, confidence_interval: float = 0.68
) -> tuple[float, float, float]:
    """``classifier.py:136-150`` exact: (median, lower, upper) of the
    predicted pdf at the requested central confidence mass — the serving
    path that turns model bin-probability outputs into intervals."""
    half = confidence_interval / 2
    return (
        _single_confidence_level(dist, pdf, 0.5),
        _single_confidence_level(dist, pdf, 0.5 - half),
        _single_confidence_level(dist, pdf, 0.5 + half),
    )


def extract_point_estimates(dist: BinDist, pdf_array: np.ndarray) -> np.ndarray:
    """``classifier.py:212-251`` with ``use_median=False``: per-pdf mean
    Σ centres·pdf, renormalizing pathological (unnormalized) rows the way
    the reference does."""
    pdf_array = np.asarray(pdf_array, dtype=np.float64)
    if pdf_array.ndim == 1:
        pdf_array = pdf_array[None, :]
    sums = pdf_array.sum(axis=1, keepdims=True)
    if abs(float(sums[0, 0]) - 1.0) > 1e-3:
        pdf_array = pdf_array / sums
    return pdf_array @ dist.bin_centres


def declassify_labels(dist: BinDist, pdf_arrays: np.ndarray) -> tuple[float, float]:
    """``classifier.py:284-298`` exact: multi-pass pdfs → (mean,
    variance): mean/var of the per-pass point estimates, de-biased by
    Sheppard's correction and floored at it."""
    points = extract_point_estimates(dist, pdf_arrays)
    mean = float(np.mean(points))
    variance = float(np.var(points)) - dist.sheppards_correction
    return mean, float(np.maximum(variance, dist.sheppards_correction))


def declassify_single_pdf(dist: BinDist, pdf: np.ndarray) -> tuple[np.ndarray, float]:
    """``classifier.py:199-211`` (mean-point-estimate branch): per-pdf
    point estimates plus the within-pdf variance over WEIGHTED bin
    centres, Sheppard-corrected and floored.

    NB the reference's ``use_median=True`` default routes through
    ``calculate_discrete_median`` (classifier.py:302-330), whose edge
    test ``is_not_edge = (bin_index == 0 or ...)`` inverts its own name
    and returns a weighted centre for interior bins; the documented
    median semantics ("step through bins … interpolate") are the ones
    :func:`_single_confidence_level` implements, so consumers wanting the
    median should use ``estimate_confidence_interval``'s first element —
    the dispatcher quirk is deliberately not ported (same policy as P3)."""
    points = extract_point_estimates(dist, pdf)
    pdf = np.asarray(pdf, dtype=np.float64).flatten()
    mean = float(points[0]) if points.size == 1 else float(np.mean(points))
    variance = float(np.sum(dist.weighted_bin_centres**2 * pdf) - mean**2)
    variance -= dist.sheppards_correction
    return points, float(np.maximum(variance, dist.sheppards_correction))


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
