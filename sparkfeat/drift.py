"""Feature-drift monitoring: PSI + moment shift between a reference
and a current window of a generated feature panel.

A feature-generation engine that trains at t₀ and serves at t₁ needs a
distributed answer to "did the feature distributions move?" — the
classic training/serving-skew gate. For each feature this computes:

* **PSI** (population stability index) over ``bins`` equal-width bins
  whose edges fit on the REFERENCE window only (the convention: edges
  are frozen with the training snapshot), with ±0.5 Laplace smoothing
  so empty bins stay finite. Rule-of-thumb thresholds: <0.1 stable,
  0.1–0.25 moderate, >0.25 action.
* **SMD** (standardized mean difference) and per-window mean/std —
  the first-moment story PSI's binning can blur.
* **null rates** per window — schema drift often shows up as nulls
  before it shows up in values.

Scale shape (the 100 TB lens): one melt (``explode`` of a literal
struct array — map-side, no shuffle), then TWO hash aggregates over
the tiny ``(feature[, bucket])`` key space — both map-side combinable,
state O(n_features × bins) regardless of row count — plus one
BROADCAST join of the per-feature edge table (n_features rows) onto
the long stream. No window functions, no per-entity state, no
collect: the job is two scans of the panel whatever the scale.

Equal-width bins (not quantile bins) are deliberate: edges derive from
two exactly-replayable aggregates (MIN/MAX), so the whole monitor is
engine-portable and deterministic — the DuckDB oracle replays it
bit-for-bit. For quantile edges, compose with `classify.fit_bins`
(balanced method) and pass the edges explicitly instead.

No reference counterpart (`/root/reference` has no drift monitor);
the moment algebra mirrors `normalize.py`'s fit conventions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "feature_drift",
    "drift_profile",
    "psi_expr",
    "quantile_edges",
    "categorical_drift",
    "ks_drift",
    "cusum_alarms",
    "cusum_profile",
]


def _melt(df: DataFrame, features: list[str], extra: list[str] = ()) -> DataFrame:
    """Map-side long form: one (feature, value) row per input row per
    feature, via explode of a literal struct array — no shuffle."""
    packed = F.array(
        *[
            F.struct(
                F.lit(f).alias("feature"), F.col(f).cast("double").alias("value")
            )
            for f in features
        ]
    )
    return df.select(*extra, F.explode(packed).alias("_s")).select(
        *extra, F.col("_s.feature").alias("feature"), F.col("_s.value").alias("value")
    )


def _bucket(bins: int):
    """Equal-width bucket of `value` against `_vmin`/`_vmax` columns,
    clamped into [0, bins): out-of-range current values pile into the
    edge bins (the PSI convention for values outside the reference
    range)."""
    width = (F.col("_vmax") - F.col("_vmin")) / F.lit(float(bins))
    return F.when(F.col("_vmax") == F.col("_vmin"), F.lit(0)).otherwise(
        F.greatest(
            F.lit(0),
            F.least(
                F.lit(bins - 1),
                F.floor((F.col("value") - F.col("_vmin")) / width).cast("int"),
            ),
        )
    )


def quantile_edges(
    df: DataFrame, features: list[str], bins: int = 10
) -> DataFrame:
    """One-pass multi-feature quantile edge table for quantile-PSI:
    ``(feature, edges: array<double>)`` of the ``bins - 1`` INTERIOR
    linear-interpolated exact quantiles of each feature — the frame
    `feature_drift(..., edges=...)` expects.

    Same estimator as ``classify.fit_bins(method='exact',
    entity_col=None)`` sliced to its interior points, but ONE melt +
    groupBy over ALL features instead of one full-panel aggregate per
    feature: at 100 TB that is one scan, one tiny shuffle on the
    ``feature`` key (n_features groups), not n_features scans. The
    exact ``percentile`` buffers each feature's values in one group —
    for 10⁹⁺-row panels swap in ``percentile_approx`` exactly as
    `fit_bins(method='approx')` does (the GK sketch bounds group
    state); edges then carry the sketch's rank error into PSI, which
    the 0.5-Laplace smoothing already dominates at that scale."""
    long = _melt(df, features).where(F.col("value").isNotNull())
    ps = [k / bins for k in range(1, bins)]
    return long.groupBy("feature").agg(
        F.percentile(F.col("value"), F.array(*[F.lit(p) for p in ps])).alias(
            "edges"
        )
    )


def drift_profile(
    df: DataFrame, features: list[str], bins: int = 10
) -> DataFrame:
    """Freeze a REFERENCE drift profile from a batch panel: one row per
    feature — ``(feature, _vmin, _vmax, n_ref, c0..c{bins-1})`` — the
    equal-width edges plus per-bin counts. This is the table a serving
    or streaming monitor broadcasts: n_features rows regardless of the
    panel size, so it rides with the training snapshot as a tiny
    artifact. Features that are entirely null are omitted (no edges)."""
    long = _melt(df, features)
    stats = long.groupBy("feature").agg(
        F.count("value").alias("n_ref"),
        F.min("value").alias("_vmin"),
        F.max("value").alias("_vmax"),
    )
    edges = stats.where(F.col("_vmin").isNotNull())
    return (
        long.where(F.col("value").isNotNull())
        .join(F.broadcast(edges), "feature")
        .select("feature", _bucket(bins).alias("_b"))
        .groupBy("feature")
        .agg(
            *[
                F.sum(F.when(F.col("_b") == i, 1).otherwise(0)).alias(f"c{i}")
                for i in range(bins)
            ]
        )
        .join(edges, "feature")
        .select(
            "feature", "_vmin", "_vmax", "n_ref", *[f"c{i}" for i in range(bins)]
        )
    )


def psi_expr(bins: int = 10):
    """PSI as ONE stateless Column over a row that carries current bin
    counts ``q0..q{bins-1}`` + ``n_cur`` alongside joined profile
    columns ``c0..c{bins-1}`` + ``n_ref`` (Laplace ±0.5 smoothing, so
    empty bins on either side stay finite). Shared by the streaming
    monitor; `feature_drift` keeps its long-form aggregation twin."""
    terms = []
    for i in range(bins):
        p = (F.col(f"c{i}") + 0.5) / (F.col("n_ref") + 0.5 * bins)
        q = (F.col(f"q{i}") + 0.5) / (F.col("n_cur") + 0.5 * bins)
        terms.append((p - q) * F.log(p / q))
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    return total


def feature_drift(
    df: DataFrame,
    features: list[str],
    window_col: str = "_window",
    ref: str = "ref",
    cur: str = "cur",
    bins: int = 10,
    edges: DataFrame | None = None,
) -> DataFrame:
    """Per-feature drift panel between ``window_col == ref`` and
    ``window_col == cur`` rows: ``(feature, n_ref, n_cur,
    null_rate_ref, null_rate_cur, mean_ref, mean_cur, std_ref,
    std_cur, smd, psi)``, one row per feature.

    Rows with other ``window_col`` values are ignored. Features whose
    reference window is entirely null get a null PSI (no edges to fit)
    but keep their null-rate row — that IS the drift signal.

    ``edges`` switches PSI from the default equal-width bins to
    EXPLICIT per-feature thresholds: a tiny ``(feature,
    edges: array<double>)`` frame of sorted INTERIOR cut points
    (k edges ⇒ k+1 buckets; bucket = number of edges ≤ value). Pass
    quantile edges from `classify.fit_bins` (balanced, global fit)
    for the industry-standard quantile-PSI variant — the edge table
    broadcasts either way, and features absent from ``edges`` get a
    null PSI. ``bins`` is ignored when ``edges`` is given (the
    smoothing denominator uses each feature's own bucket count).
    """
    is_ref = F.col("_w") == ref
    is_cur = F.col("_w") == cur
    packed = F.array(
        *[
            F.struct(
                F.lit(f).alias("feature"), F.col(f).cast("double").alias("value")
            )
            for f in features
        ]
    )
    long = (
        df.where(F.col(window_col).isin(ref, cur))
        .select(F.col(window_col).alias("_w"), F.explode(packed).alias("_s"))
        .select("_w", F.col("_s.feature").alias("feature"), F.col("_s.value").alias("value"))
    )

    val = F.col("value")
    stats = long.groupBy("feature").agg(
        F.count(F.when(is_ref, val)).alias("n_ref"),
        F.count(F.when(is_cur, val)).alias("n_cur"),
        F.sum(F.when(is_ref & val.isNull(), 1).otherwise(0)).alias("_null_ref"),
        F.sum(F.when(is_cur & val.isNull(), 1).otherwise(0)).alias("_null_cur"),
        F.avg(F.when(is_ref, val)).alias("mean_ref"),
        F.avg(F.when(is_cur, val)).alias("mean_cur"),
        F.var_pop(F.when(is_ref, val)).alias("_var_ref"),
        F.var_pop(F.when(is_cur, val)).alias("_var_cur"),
        F.min(F.when(is_ref, val)).alias("_vmin"),
        F.max(F.when(is_ref, val)).alias("_vmax"),
    )

    if edges is not None:
        edge_tbl = edges.select(
            "feature",
            F.col("edges").cast("array<double>").alias("_edges"),
            (F.size("edges") + 1).cast("double").alias("_nb"),
        )
        bucket = F.size(
            F.filter(F.col("_edges"), lambda e: e <= F.col("value"))
        ).cast("int")
    else:
        width = (F.col("_vmax") - F.col("_vmin")) / F.lit(float(bins))
        bucket = F.when(F.col("_vmax") == F.col("_vmin"), F.lit(0)).otherwise(
            F.greatest(
                F.lit(0),
                F.least(
                    F.lit(bins - 1),
                    F.floor((F.col("value") - F.col("_vmin")) / width).cast("int"),
                ),
            )
        )
        edge_tbl = (
            stats.select("feature", "_vmin", "_vmax")
            .where(F.col("_vmin").isNotNull())
            .withColumn("_nb", F.lit(float(bins)))
        )
    counts = (
        long.where(val.isNotNull())
        .join(F.broadcast(edge_tbl), "feature")
        .select("feature", "_w", "_nb", bucket.alias("_b"))
        .groupBy("feature", "_nb", "_b")
        .agg(
            F.sum(F.when(is_ref, 1).otherwise(0)).alias("_cr"),
            F.sum(F.when(is_cur, 1).otherwise(0)).alias("_cc"),
        )
    )
    # Laplace-smoothed proportions; a bucket absent from `counts` has
    # _cr = _cc = 0 on both sides -> p == q -> PSI term 0, so summing
    # only observed buckets is exact. The n_ref/n_cur denominators are
    # Σ over the feature's own buckets (counts covers exactly the
    # non-null rows — identical integers to joining `stats` back, which
    # would re-evaluate the whole-panel aggregate under different column
    # pruning), and the PSI fold runs over the collected ≤`bins`-entry
    # bucket array — bounded state, still window-free (plan-asserted).
    def _term(tr, tc, s):
        p = (s["_cr"] + 0.5) / (tr + 0.5 * s["_nb"])
        q = (s["_cc"] + 0.5) / (tc + 0.5 * s["_nb"])
        return (p - q) * F.log(p / q)

    psi = (
        counts.groupBy("feature")
        .agg(
            F.sum("_cr").cast("double").alias("_tr"),
            F.sum("_cc").cast("double").alias("_tc"),
            F.collect_list(F.struct("_cr", "_cc", "_nb")).alias("_bs"),
        )
        .select(
            "feature",
            F.aggregate(
                "_bs",
                F.lit(0.0),
                lambda acc, s: acc + _term(F.col("_tr"), F.col("_tc"), s),
            ).alias("psi"),
        )
    )

    total_ref = F.col("n_ref") + F.col("_null_ref")
    total_cur = F.col("n_cur") + F.col("_null_cur")
    pooled = F.sqrt((F.col("_var_ref") + F.col("_var_cur")) / 2.0)
    return (
        stats.join(psi, "feature", "left")
        .select(
            "feature",
            "n_ref",
            "n_cur",
            F.when(total_ref > 0, F.col("_null_ref") / total_ref.cast("double"))
            .alias("null_rate_ref"),
            F.when(total_cur > 0, F.col("_null_cur") / total_cur.cast("double"))
            .alias("null_rate_cur"),
            "mean_ref",
            "mean_cur",
            F.sqrt("_var_ref").alias("std_ref"),
            F.sqrt("_var_cur").alias("std_cur"),
            F.when(pooled > 0, (F.col("mean_cur") - F.col("mean_ref")) / pooled)
            .alias("smd"),
            "psi",
        )
    )


def categorical_drift(
    ref: DataFrame, cur: DataFrame, cat_col: str
) -> DataFrame:
    """Categorical-distribution drift between two corpus slices — the
    chi-square homogeneity statistic plus Cramér's V over a categorical
    column (lang, source, role, quality bucket): the companion of
    :func:`feature_drift`'s numeric PSI/SMD for the dimensions that
    have no order ("did the language mixture shift between crawls?").
    The full 2×k contingency algebra runs in-plan.

    Per category: counts and shares on both sides plus that category's
    chi-square contribution Σ_side (obs − exp)²/exp with
    exp = row_total × col_total / N; table-level ``chi2``, ``dof`` =
    k − 1, and ``cramers_v`` = sqrt(chi2 / (N · min(1, k−1))) ride
    along as constant columns (the probe convention: constants make
    the value hash verify the global solve, not just the per-row
    arithmetic). A category absent from one side counts 0 there —
    exactly the case the test exists for. Shares and contributions are
    rounded to 6 dp (integer counts, so exp/contrib are identical
    doubles in any engine). No p-value by design: the chi-square CDF
    isn't closed-form plan algebra; at corpus scale dof is tiny and N
    huge, so the statistic (or V, its N-free normalization) is the
    decision variable anyway.

    Scale shape: one map-side-combinable ``groupBy(cat)`` per side
    (k rows each ever shuffle), a k-row full-outer join, totals as
    one-row broadcast crossJoins — fully lazy, the slices scan once.
    """
    rc = ref.groupBy(F.col(cat_col).alias("category")).agg(
        F.count(F.lit(1)).alias("n_ref")
    )
    cc = cur.groupBy(F.col(cat_col).alias("category")).agg(
        F.count(F.lit(1)).alias("n_cur")
    )
    cells = (
        rc.join(cc, "category", "full")
        .select(
            "category",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    tot = cells.agg(
        F.sum("n_ref").alias("_tr"),
        F.sum("n_cur").alias("_tc"),
        F.count(F.lit(1)).alias("_k"),
    )
    j = cells.crossJoin(F.broadcast(tot))
    n_all = (F.col("_tr") + F.col("_tc")).cast("double")
    col_tot = (F.col("n_ref") + F.col("n_cur")).cast("double")
    e_ref = F.col("_tr") * col_tot / n_all
    e_cur = F.col("_tc") * col_tot / n_all
    sq = lambda o, e: F.when(  # noqa: E731
        e > 0, (o.cast("double") - e) * (o.cast("double") - e) / e
    ).otherwise(F.lit(0.0))
    contrib = sq(F.col("n_ref"), e_ref) + sq(F.col("n_cur"), e_cur)
    per_cat = j.select(
        "category",
        F.col("n_ref").cast("bigint").alias("n_ref"),
        F.col("n_cur").cast("bigint").alias("n_cur"),
        F.round(F.col("n_ref") / F.col("_tr").cast("double"), 6).alias(
            "share_ref"
        ),
        F.round(F.col("n_cur") / F.col("_tc").cast("double"), 6).alias(
            "share_cur"
        ),
        F.round(contrib, 6).alias("chi2_contrib"),
        n_all.alias("_n_all"),
        F.col("_k"),
    )
    # fold the ROUNDED contributions: a sum of raw doubles is addend-
    # order-dependent in the last ulps, which different engines order
    # differently; summing canonicalized 6-dp terms is order-stable
    table = per_cat.agg(
        F.round(F.sum("chi2_contrib"), 6).alias("chi2"),
        (F.max("_k") - 1).cast("int").alias("dof"),
        F.round(
            F.sqrt(
                F.sum("chi2_contrib")
                # 2×k table: min(rows−1, cols−1) = min(1, k−1), floored
                # at 1 so the degenerate k=1 table (chi2 = 0) yields 0
                / (
                    F.max("_n_all")
                    * F.greatest(
                        F.least(F.lit(1), F.max("_k") - 1), F.lit(1)
                    )
                )
            ),
            6,
        ).alias("cramers_v"),
    )
    return per_cat.crossJoin(F.broadcast(table)).select(
        "category",
        "n_ref",
        "n_cur",
        "share_ref",
        "share_cur",
        "chi2_contrib",
        "chi2",
        "dof",
        "cramers_v",
    )


def ks_drift(
    ref: DataFrame,
    cur: DataFrame,
    features: list[str],
    precision: int = 6,
    alpha_c: float = 1.358,
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov drift per feature — the
    binning-free member of the drift family: :func:`feature_drift`'s
    PSI answers "how much mass moved between these 10 frozen bins",
    KS answers "what is the LARGEST gap anywhere between the two
    ECDFs" — sensitive to a shift PSI's coarse bins can hide (a
    median jump inside one wide bin) and to tail drift equal-width
    edges dilute. D = sup_x |F_ref(x) − F_cur(x)|; the sup over step
    ECDFs is attained at a pooled data point, so evaluating at every
    pooled distinct value is exact, not an approximation. The same
    cumulative pass also yields the Wasserstein-1 (earth-mover)
    distance W1 = ∫|F_ref − F_cur| dx for free — the
    magnitude-of-shift story KS's sup-gap deliberately ignores (KS
    saturates; W1 scales with how FAR the distribution moved, in the
    feature's own units).

    Engine-exact integer arithmetic (the house lcm/round-before-solve
    convention): per distinct value the cumulative counts c_ref, c_cur
    are integers, and the comparison is done on the SCALED gap
    |c_ref·n_cur − c_cur·n_ref| — an exact BIGINT for any input order
    — so max and argmax are bit-identical in any engine; the single
    division by n_ref·n_cur happens once per feature at the end
    (products stay inside bigint to ~3·10⁹ rows per side; beyond that
    cast the two products to DECIMAL(38,0)). ``ks_at`` is the smallest
    value attaining the max (deterministic tie-break). ``crit_05`` is
    the asymptotic 5% critical value c(α)·√((n_ref+n_cur)/(n_ref·n_cur))
    with c(0.05) = 1.358 (Smirnov); at corpus scale it is microscopic —
    ``ks_d`` itself is the decision variable, the flag is a convention.

    Scale shape: one map-side melt per side, ONE map-side-combinable
    ``groupBy(feature, value)`` — duplicate values collapse BEFORE the
    exchange, so what shuffles is the distinct-value table, not the
    corpus — then a per-feature ordered cumulative window over that
    table. Values are rounded to ``precision`` decimals first, which
    bounds the per-feature window state by the VALUE DOMAIN
    (10^precision per unit of range), invariant in corpus rows; coarsen
    ``precision`` for unbounded-range features (the induced error in D
    is at most the mass within one rounding ulp of a boundary). The
    tiny per-feature totals broadcast back; the max and argmax are two
    more aggregates over the distinct-value table. Features entirely
    null on either side report NULL ``ks_d``.
    """
    def side(df: DataFrame, a: int) -> DataFrame:
        return (
            _melt(df, features)
            .where(F.col("value").isNotNull())
            .select(
                "feature",
                F.round(F.col("value"), precision).alias("value"),
                F.lit(a).cast("bigint").alias("_a"),
                F.lit(1 - a).cast("bigint").alias("_b"),
            )
        )

    pv = (
        side(ref, 1)
        .unionByName(side(cur, 0))
        .groupBy("feature", "value")
        .agg(F.sum("_a").alias("_na_v"), F.sum("_b").alias("_nb_v"))
    )
    return _ks_fold(pv, alpha_c)


def ks_drift_tagged(
    df: DataFrame,
    features: list[str],
    window_col: str = "_w",
    ref: str = "ref",
    cur: str = "cur",
    precision: int = 6,
    alpha_c: float = 1.358,
) -> DataFrame:
    """:func:`ks_drift` over a single window-TAGGED panel instead of two
    pre-filtered copies: when ref and cur are slices of one DataFrame
    (the time-split monitors), the two-argument form makes each side a
    separate subtree and the whole upstream panel pipeline executes
    twice; here the melt + per-(feature, value) collapse runs in ONE
    pass with conditional counters. Integer sums, identical (feature,
    value) table, same fold — bit-equal output."""
    pv = (
        _melt(df, features, extra=[window_col])
        .where(F.col("value").isNotNull() & F.col(window_col).isin(ref, cur))
        .select(
            "feature",
            F.round(F.col("value"), precision).alias("value"),
            F.when(F.col(window_col) == ref, F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("_a"),
            F.when(F.col(window_col) == cur, F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("_b"),
        )
        .groupBy("feature", "value")
        .agg(F.sum("_a").alias("_na_v"), F.sum("_b").alias("_nb_v"))
    )
    return _ks_fold(pv, alpha_c)


def _ks_fold(pv: DataFrame, alpha_c: float) -> DataFrame:
    """Shared KS/W1 fold over the collapsed (feature, value, n_ref_at,
    n_cur_at) distinct-value table (see :func:`ks_drift`)."""
    from pyspark.sql import Window

    wcum = (
        Window.partitionBy("feature")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = pv.select(
        "feature",
        "value",
        F.sum("_na_v").over(wcum).alias("_ca"),
        F.sum("_nb_v").over(wcum).alias("_cb"),
    )
    tot = pv.groupBy("feature").agg(
        F.sum("_na_v").alias("n_ref"), F.sum("_nb_v").alias("n_cur")
    )
    gap = (
        cum.join(F.broadcast(tot), "feature")
        .withColumn(
            "_ds",
            F.abs(
                F.col("_ca") * F.col("n_cur") - F.col("_cb") * F.col("n_ref")
            ),
        )
        # Δx to the next pooled value (same feature/value sort — Spark
        # reuses the window's exchange); null on each feature's last
        # row, where both ECDFs have reached 1 and the integral ends
        .withColumn(
            "_dx",
            F.lead("value").over(
                Window.partitionBy("feature").orderBy("value")
            )
            - F.col("value"),
        )
    )
    mx = gap.groupBy("feature", "n_ref", "n_cur").agg(
        F.max("_ds").alias("_dmax"),
        # Wasserstein-1 = ∫|F_ref − F_cur| dx: the scaled gap is an
        # exact bigint, each addend is 6-dp-canonicalized before the
        # (order-stable) sum, one division at the end
        F.sum(F.round(F.col("_ds") * F.col("_dx"), 6)).alias("_w1s"),
    )
    at = (
        gap.select("feature", "value", "_ds")
        .join(F.broadcast(mx.select("feature", "_dmax")), "feature")
        .filter(F.col("_ds") == F.col("_dmax"))
        .groupBy("feature")
        .agg(F.min("value").alias("ks_at"))
    )
    nn = (F.col("n_ref") * F.col("n_cur")).cast("double")
    ks_d = F.when(
        (F.col("n_ref") > 0) & (F.col("n_cur") > 0),
        F.round(F.col("_dmax").cast("double") / nn, 6),
    )
    crit = F.when(
        (F.col("n_ref") > 0) & (F.col("n_cur") > 0),
        F.round(
            F.lit(alpha_c)
            * F.sqrt((F.col("n_ref") + F.col("n_cur")).cast("double") / nn),
            6,
        ),
    )
    return (
        # both sides are n_features rows; broadcast keeps the tail
        # join shuffle-free
        mx.join(F.broadcast(at), "feature", "left")
        .select(
            "feature",
            F.col("n_ref").cast("bigint").alias("n_ref"),
            F.col("n_cur").cast("bigint").alias("n_cur"),
            ks_d.alias("ks_d"),
            "ks_at",
            crit.alias("crit_05"),
            # both operands are identical 6-dp doubles in any engine,
            # so the boundary comparison is deterministic
            (ks_d > crit).alias("drifted"),
            # earth-mover distance in value units — the magnitude-of-
            # shift story KS's sup-gap deliberately ignores (KS of a
            # tiny vs huge median shift can be equal; W1 scales with
            # the shift). Null when either side is empty or the
            # feature has a single pooled value (no intervals).
            F.when(
                (F.col("n_ref") > 0) & (F.col("n_cur") > 0),
                F.round(F.col("_w1s") / nn, 6),
            ).alias("w1"),
        )
    )


def cusum_alarms(
    df: DataFrame,
    series_cols: tuple[str, ...] = ("series",),
    order_col: str = "t",
    value_col: str = "x",
    ref_n: int = 48,
    k: float = 0.5,
    h: float = 4.0,
    nd: int = 6,
) -> DataFrame:
    """Tabular CUSUM change-point detection per metric series — the
    SEQUENTIAL member of the drift family. PSI/KS/chi² compare two
    frozen snapshots; CUSUM (Page 1954) watches an ORDERED stream of
    metric points and flags the first time the mean has shifted by
    more than ~2k standard deviations, accumulating evidence across
    points — it catches slow drifts each individual snapshot test
    would miss.

    Per series: the first ``ref_n`` points are the burn-in reference
    (mean mu, population std sigma); every later point is standardized
    ``z = (x - mu) / sigma`` and folded into the two one-sided
    statistics ``S+_t = max(0, S+_{t-1} + z_t - k)`` (upward shift)
    and ``S-_t = max(0, S-_{t-1} - z_t - k)`` (downward); ``alarm``
    fires while either exceeds ``h``. Defaults k=0.5, h=4 are the
    textbook choice (detects a 1-sigma mean shift with ~ARL-370 false
    alarms).

    The recurrence is deliberately NOT an applyInPandas fold: the
    Page recursion has the closed form ``S_t = C_t - min(0,
    min_{j<=t} C_j)`` where ``C`` is the plain cumulative sum of the
    increments (subtracting the running minimum restarts the sum
    exactly where max(0, ·) would have clamped it), so both statistics
    are two stacked window aggregates over ONE ``series_cols``
    partitioning — O(1) state per row, plain codegen, and the DuckDB
    oracle replays it verbatim.

    Output per input row: ``(*series_cols, order_col, x, in_reference,
    z, s_pos, s_neg, alarm)``, doubles rounded ``nd`` dp. A
    zero-variance burn-in (sigma = 0) yields z NULL and never alarms
    (reported, not crashed). First-alarm extraction is a trivial
    downstream ``where(alarm).groupBy(series).min(order)``.

    Scale shape: series are metric streams (per source/event-type per
    hour), so a partition is tiny by construction; ONE exchange on
    ``series_cols``, every window reuses that partitioning (single
    sort), reference stats ride a per-series equi-join of a
    |series|-row aggregate. No UDFs, no collect.
    """
    from pyspark.sql import Window

    scols = list(series_cols)
    w = Window.partitionBy(*scols).orderBy(order_col)
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    x = F.col(value_col).cast("double")

    staged = df.select(*scols, F.col(order_col), x.alias("_x")).withColumn(
        "_rn", F.row_number().over(w)
    )
    ref = staged.where(F.col("_rn") <= ref_n).groupBy(*scols).agg(
        F.avg("_x").alias("_mu"), F.stddev_pop("_x").alias("_sigma")
    )
    z = F.when(
        F.col("_sigma") > 0, (F.col("_x") - F.col("_mu")) / F.col("_sigma")
    )
    mon = (
        staged.join(ref, scols)
        .withColumn("_z", z)
        .withColumn("_live", (F.col("_rn") > ref_n) & F.col("_z").isNotNull())
        .withColumn(
            "_cp", F.sum(F.when(F.col("_live"), F.col("_z") - k).otherwise(0.0)).over(wcum)
        )
        .withColumn(
            "_cn", F.sum(F.when(F.col("_live"), -F.col("_z") - k).otherwise(0.0)).over(wcum)
        )
        .withColumn("_mp", F.least(F.min("_cp").over(wcum), F.lit(0.0)))
        .withColumn("_mn", F.least(F.min("_cn").over(wcum), F.lit(0.0)))
    )
    s_pos = F.when(F.col("_live"), F.col("_cp") - F.col("_mp")).otherwise(0.0)
    s_neg = F.when(F.col("_live"), F.col("_cn") - F.col("_mn")).otherwise(0.0)
    return mon.select(
        *scols,
        F.col(order_col),
        (F.round(F.col("_x"), nd) + F.lit(0.0)).alias("x"),
        (F.col("_rn") <= ref_n).alias("in_reference"),
        (F.round(F.col("_z"), nd) + F.lit(0.0)).alias("z"),
        (F.round(s_pos, nd) + F.lit(0.0)).alias("s_pos"),
        (F.round(s_neg, nd) + F.lit(0.0)).alias("s_neg"),
        # the boundary compares the ROUNDED statistics: both engines
        # see identical nd-dp doubles, so the flag is deterministic
        # (the ks_drift convention)
        ((F.round(s_pos, nd) > h) | (F.round(s_neg, nd) > h)).alias("alarm"),
    )


def cusum_profile(
    df: DataFrame,
    series_cols: tuple[str, ...] = ("series",),
    order_col: str = "t",
    value_col: str = "x",
    ref_n: int = 48,
) -> DataFrame:
    """Freeze the CUSUM burn-in reference: per series, mean and
    population std of the first ``ref_n`` points — the tiny table a
    LIVE monitor (`streaming.stream_cusum`) broadcasts, exactly as
    `drift_profile` ships PSI's frozen edges. One row per series:
    ``(*series_cols, mu, sigma, n_ref)``."""
    from pyspark.sql import Window

    scols = list(series_cols)
    w = Window.partitionBy(*scols).orderBy(order_col)
    staged = df.select(
        *scols, F.col(order_col), F.col(value_col).cast("double").alias("_x")
    ).withColumn("_rn", F.row_number().over(w))
    return (
        staged.where(F.col("_rn") <= ref_n)
        .groupBy(*scols)
        .agg(
            F.avg("_x").alias("mu"),
            F.stddev_pop("_x").alias("sigma"),
            F.count(F.lit(1)).cast("bigint").alias("n_ref"),
        )
    )
