"""In-plan closed-form linear probe: fit tiny supervised scorers over
a 100 TB corpus with ZERO driver-side math.

The CCNet / LLaMA data-prep move is "fit a cheap classifier on a
curated seed corpus, score the whole crawl with it" (reference: the
reference repo has no supervised fit at all; this extends its
normalization-fit family — fit-on-slice, apply-everywhere — to a
supervised target). For a probe over two bounded features the ridge
normal equations are a 3×3 solve, and 3×3 Cramer's rule is plain
arithmetic — so the WHOLE fit lives in the plan: one map-side-combined
aggregate produces the nine sufficient-statistic moments as a single
row, the cofactor expressions turn that row into (w0, w1, w2), and a
broadcast cross-join streams the weights back over the corpus scan.
No collect, no numpy, no iteration; the model fit is just another
Catalyst subtree, which means it inherits laziness, AQE, and
whole-stage codegen like every other operator here.

Cross-engine determinism: per-doc feature arithmetic is identical IEEE
on any engine, but Σ over doubles is order-dependent, so the nine
moments are canonicalized to 6 decimals BEFORE the solve (the repo's
float-parity convention) — downstream Cramer arithmetic then runs on
bit-identical inputs everywhere.

Scope: exactly two features + intercept (the 3×3 Cramer solve written
out). For wider probes, aggregate X^T X with the Arrow moment kernel in
:mod:`sparkfeat.pca` and solve the small system once on the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _det3(a) -> Column:
    """Determinant of a 3x3 of Columns (row-major nested list)."""
    return (
        a[0][0] * (a[1][1] * a[2][2] - a[1][2] * a[2][1])
        - a[0][1] * (a[1][0] * a[2][2] - a[1][2] * a[2][0])
        + a[0][2] * (a[1][0] * a[2][1] - a[1][1] * a[2][0])
    )


def linear_probe_fit(
    df: DataFrame,
    x1: Column,
    x2: Column,
    label: Column,
    seed: Column,
    ridge: float = 1e-3,
) -> DataFrame:
    """Fit ``score = w0 + w1·x1 + w2·x2`` to ``label`` by ridge least
    squares over the rows where ``seed`` is true, entirely in-plan.

    Returns a ONE-row DataFrame (n_seed, w0, w1, w2). ``ridge`` is
    added to every diagonal entry (including the intercept's — a
    simple, documented choice that keeps the solve non-singular on a
    degenerate seed). Moments are rounded to 6 decimals before the
    solve so the weights replay bit-for-bit in any engine.
    """
    seeded = df.filter(seed)
    r6 = lambda c: F.round(c, 6)  # noqa: E731
    m = seeded.agg(
        r6(F.count(F.lit(1)).cast("double")).alias("n"),
        r6(F.sum(x1)).alias("s1"),
        r6(F.sum(x2)).alias("s2"),
        r6(F.sum(x1 * x1)).alias("s11"),
        r6(F.sum(x1 * x2)).alias("s12"),
        r6(F.sum(x2 * x2)).alias("s22"),
        r6(F.sum(label)).alias("sy"),
        r6(F.sum(x1 * label)).alias("sy1"),
        r6(F.sum(x2 * label)).alias("sy2"),
    )
    lam = F.lit(float(ridge))
    a = [
        [F.col("n") + lam, F.col("s1"), F.col("s2")],
        [F.col("s1"), F.col("s11") + lam, F.col("s12")],
        [F.col("s2"), F.col("s12"), F.col("s22") + lam],
    ]
    b = [F.col("sy"), F.col("sy1"), F.col("sy2")]
    det = _det3(a)
    cols = [F.col("n").cast("bigint").alias("n_seed")]
    for j, name in enumerate(("w0", "w1", "w2")):
        aj = [[b[i] if k == j else a[i][k] for k in range(3)] for i in range(3)]
        cols.append((_det3(aj) / det).alias(name))
    return m.select(*cols)


def linear_probe_score(
    df: DataFrame,
    x1: Column,
    x2: Column,
    label: Column,
    seed: Column,
    ridge: float = 1e-3,
    out_col: str = "score",
) -> DataFrame:
    """Fit on the seed slice, score EVERY row: appends the probe
    ``score`` (w·x, rounded 6dp) plus the fitted weights (constant
    columns — so a value-hash of the output verifies the solve itself,
    not just the per-row dot product).

    Scale shape: the fit is one tiny aggregate; the weights come back
    as a broadcast one-row cross-join onto the corpus scan, and scoring
    is a map-only expression — the 100 TB side is never shuffled.
    """
    w = linear_probe_fit(df, x1, x2, label, seed, ridge=ridge)
    scored = df.crossJoin(F.broadcast(w))
    score = F.col("w0") + F.col("w1") * x1 + F.col("w2") * x2
    return scored.withColumn(out_col, F.round(score, 6)).withColumn(
        "w0", F.round(F.col("w0"), 6)
    ).withColumn("w1", F.round(F.col("w1"), 6)).withColumn(
        "w2", F.round(F.col("w2"), 6)
    )


def shrink_group_means(
    df: DataFrame,
    value: Column,
    group_col: str = "source",
) -> DataFrame:
    """Empirical-Bayes (James–Stein) shrinkage of per-group means —
    the per-DOMAIN quality prior move: a web corpus has millions of
    domains and most contribute a handful of documents, so their raw
    mean quality is noise; the one-way random-effects model
    ``x_ij ~ N(θ_i, σ²), θ_i ~ N(μ, τ²)`` gives the posterior mean
    ``μ + B_i·(m_i − μ)`` with ``B_i = τ²/(τ² + σ²/n_i)`` — sparse
    domains collapse toward the corpus mean, well-observed domains keep
    their own signal. (Efron & Morris 1975; the standard method-of-
    moments one-way ANOVA estimators: σ² = SSW/(N−k),
    τ² = max(0, (MSB − σ²)/n₀), n₀ = (N − Σn_i²/N)/(k−1).)

    Entirely in-plan, zero driver math (the :func:`linear_probe_fit`
    recipe): ONE map-side-combined groupBy(group) produces per-group
    sufficient statistics; ONE one-row aggregate over those k rows
    produces the global moments; the variance components and shrinkage
    are plain arithmetic on that row, broadcast back onto the k-row
    group table. The corpus is touched exactly once and only the k-row
    side ever re-flows — at 100 TB the second aggregate input is
    k ≈ 10⁶ domain rows, not documents.

    Cross-engine determinism: per-group sums are rounded to 6 dp, and
    every global moment is rounded to 6 dp BEFORE the variance-
    component arithmetic (the round-before-solve convention), so both
    engines divide identical doubles. SSB is computed from the
    expansion ``Σ s_i²/n_i − S²/N`` so no second pass over groups is
    needed. Degenerate inputs (k ≤ 1 or every group a singleton) make
    the within/between mean squares undefined — B_i coalesces to 0 and
    every group reports the grand mean.

    Output per group: ``(group, n_docs, mean_raw, shrink_b,
    mean_shrunk, grand_mean)`` — ``grand_mean`` is a constant column so
    the value hash verifies the global arithmetic, not just the
    per-group map.
    """
    r6 = lambda c: F.round(c, 6)  # noqa: E731
    per = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_i"),
        r6(F.sum(value)).alias("s_i"),
        r6(F.sum(value * value)).alias("ss_i"),
    )
    g = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n_i").cast("bigint").alias("N"),
        F.sum(F.col("n_i") * F.col("n_i")).cast("bigint").alias("nn"),
        r6(F.sum("s_i")).alias("S"),
        # within sum of squares: Σ_i (ss_i − s_i²/n_i), each term
        # deterministic arithmetic on the rounded per-group sums
        r6(F.sum(F.col("ss_i") - F.col("s_i") * F.col("s_i") / F.col("n_i"))).alias(
            "SSW"
        ),
        # between-groups raw moment Σ s_i²/n_i (SSB = Q − S²/N)
        r6(F.sum(F.col("s_i") * F.col("s_i") / F.col("n_i"))).alias("Q"),
    )
    mu = F.col("S") / F.col("N")
    msw = F.col("SSW") / F.nullif((F.col("N") - F.col("k")).cast("double"), F.lit(0.0))
    msb = (F.col("Q") - F.col("S") * F.col("S") / F.col("N")) / F.nullif(
        (F.col("k") - 1).cast("double"), F.lit(0.0)
    )
    n0 = (F.col("N").cast("double") - F.col("nn") / F.col("N")) / F.nullif(
        (F.col("k") - 1).cast("double"), F.lit(0.0)
    )
    tau2 = F.greatest(F.lit(0.0), (msb - msw) / F.nullif(n0, F.lit(0.0)))
    gstats = g.select(
        mu.alias("_mu"), msw.alias("_msw"), tau2.alias("_tau2")
    )
    m_i = F.col("s_i") / F.col("n_i")
    b_i = F.coalesce(
        F.col("_tau2")
        / F.nullif(F.col("_tau2") + F.col("_msw") / F.col("n_i"), F.lit(0.0)),
        F.lit(0.0),
    )
    return per.crossJoin(F.broadcast(gstats)).select(
        group_col,
        F.col("n_i").alias("n_docs"),
        r6(m_i).alias("mean_raw"),
        r6(b_i).alias("shrink_b"),
        r6(F.col("_mu") + b_i * (m_i - F.col("_mu"))).alias("mean_shrunk"),
        r6(F.col("_mu")).alias("grand_mean"),
    )


def calibration_table(
    df: DataFrame,
    score: Column,
    label: Column,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability table + expected calibration error (ECE) for a
    probabilistic scorer — the acceptance check a quality probe needs
    before its scores gate a 100 TB corpus: per score-bin, does the
    empirical positive rate track the predicted score? (Guo et al.
    2017's ECE, computed over equal-WIDTH bins between the observed
    min/max — equal-width instead of quantile bins because quantile
    edges need a global sort / ntile, while min/max is one map-side
    aggregate; the standard reliability-diagram binning.)

    Entirely in-plan: one one-row (min, max) aggregate broadcast back,
    one groupBy(bin) over the corpus, then ECE = Σ n_b/N·|mean_score −
    frac_pos| folded over the ≤ n_bins rows and broadcast onto them as
    a constant column (so the value hash verifies the global ECE
    arithmetic, house convention). The corpus is scanned ONCE for the
    range and ONCE for the bin aggregate; everything downstream flows
    k ≤ n_bins rows. Min/max are rounded to 6 dp before the bin-width
    division and per-bin sums before the means (round-before-solve), so
    both engines bin and divide identical doubles. A constant score
    (hi == lo) puts every row in bin 0 via the NULLIF/COALESCE guard.

    Output per occupied bin: ``(bin, n_docs, bin_lo, bin_hi,
    mean_score, frac_pos, ece)``.
    """
    r6 = lambda c: F.round(c, 6)  # noqa: E731
    rng = df.agg(r6(F.min(score)).alias("_lo"), r6(F.max(score)).alias("_hi"))
    width = F.nullif(
        (F.col("_hi") - F.col("_lo")) / F.lit(float(n_bins)), F.lit(0.0)
    )
    binned = df.crossJoin(F.broadcast(rng)).withColumn(
        "_bin",
        F.coalesce(
            F.least(
                F.lit(n_bins - 1),
                F.greatest(
                    F.lit(0),
                    F.floor((score - F.col("_lo")) / width).cast("int"),
                ),
            ),
            F.lit(0),
        ),
    )
    per = (
        binned.groupBy("_bin", "_lo", "_hi")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            r6(F.sum(score)).alias("_ss"),
            r6(F.sum(label)).alias("_sl"),
        )
        .select(
            F.col("_bin").alias("bin"),
            "n_docs",
            r6(F.col("_lo") + F.col("_bin") * (F.col("_hi") - F.col("_lo")) / n_bins)
            .alias("bin_lo"),
            r6(
                F.col("_lo")
                + (F.col("_bin") + 1) * (F.col("_hi") - F.col("_lo")) / n_bins
            ).alias("bin_hi"),
            r6(F.col("_ss") / F.col("n_docs")).alias("mean_score"),
            r6(F.col("_sl") / F.col("n_docs")).alias("frac_pos"),
        )
    )
    ece = per.agg(
        r6(
            F.sum(
                F.col("n_docs")
                * F.abs(F.col("mean_score") - F.col("frac_pos"))
            )
            / F.sum("n_docs")
        ).alias("ece")
    )
    return per.crossJoin(F.broadcast(ece))


def rank_auc(df: DataFrame, score: Column, label: Column) -> DataFrame:
    """Exact tie-corrected ROC-AUC of a scorer against a binary label —
    the rank-quality companion of :func:`calibration_table`: ECE asks
    "are the probabilities honest", AUC asks "does the score ORDER
    positives above negatives at all" (the quantity that matters when
    the score gates a corpus by threshold or top-fraction). Computed
    via the Mann–Whitney identity AUC = P(s⁺ > s⁻) + ½·P(s⁺ = s⁻),
    which over distinct-score counts is
    Σ_s n⁺_s · (below⁻_s + n⁻_s / 2) / (n⁺ · n⁻) — the average-rank /
    trapezoidal-ROC value, exactly.

    Engine-exact: scores are rounded to 6 dp first (the repo float
    convention), counts are integers, and the fold sums the DOUBLED
    numerator n⁺_s·(2·below⁻_s + n⁻_s) — an exact BIGINT in any
    addend order — so the one final division is the only float op
    (products stay in bigint to ~3·10⁹ per class; beyond that cast to
    DECIMAL(38,0)). ``gini`` = 2·AUC − 1 from the same integers.

    Scale shape: ONE map-side-combinable ``groupBy(score)`` — the
    corpus collapses to the distinct-score table before anything
    shuffles — then a cumulative window over that table. Rounding
    bounds the table by the score DOMAIN (≤ ~2·10⁶ rows for a [0,1]
    probe at 6 dp), invariant in corpus rows, so the unpartitioned
    ordered window is a bounded small-table pass, not a corpus sort.
    Output is ONE row: ``(n_pos, n_neg, n_scores, auc, gini)``; a
    degenerate single-class input yields NULL auc/gini.
    """
    from pyspark.sql import Window

    y = label.cast("bigint")
    g = df.groupBy(F.round(score, 6).alias("_s")).agg(
        F.sum(y).alias("_np"),
        F.sum(F.lit(1) - y).alias("_nn"),
    )
    wcum = Window.orderBy("_s").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = g.select(
        "_np",
        "_nn",
        (F.sum("_nn").over(wcum) - F.col("_nn")).alias("_below"),
    )
    agg = cum.agg(
        F.sum("_np").cast("bigint").alias("n_pos"),
        F.sum("_nn").cast("bigint").alias("n_neg"),
        F.count(F.lit(1)).cast("bigint").alias("n_scores"),
        F.sum(
            F.col("_np") * (F.lit(2) * F.col("_below") + F.col("_nn"))
        ).alias("_u2"),
    )
    npnn = F.col("n_pos") * F.col("n_neg")
    ok = (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
    return agg.select(
        "n_pos",
        "n_neg",
        "n_scores",
        F.when(
            ok,
            F.round(
                F.col("_u2").cast("double")
                / (F.lit(2) * npnn).cast("double"),
                6,
            ),
        ).alias("auc"),
        F.when(
            ok,
            F.round(
                (F.col("_u2") - npnn).cast("double") / npnn.cast("double"),
                6,
            ),
        ).alias("gini"),
    )


def mi_table(
    df: DataFrame,
    feature: Column,
    label: Column,
    n_bins: int = 10,
) -> DataFrame:
    """Binned mutual information between a numeric feature and a binary
    label — the feature-relevance acceptance check that precedes
    :func:`linear_probe_fit` in the probe family (fit → ECE calibration
    → rank AUC → MI relevance): AUC asks "does THIS scorer rank well",
    MI asks "how much label information does the raw feature carry at
    all" — including non-monotone dependence a linear probe (and AUC)
    cannot see. I(B;Y) = Σ_cells p_bl·ln(n·c_bl / (c_b·c_l)), with the
    marginals' entropies and NMI = I/√(H_B·H_Y) riding along.

    Binning is :func:`calibration_table`'s: ``n_bins`` equal-width bins
    between the 6-dp-rounded observed min/max (one map-side aggregate,
    broadcast back — never a global sort), NULLIF-guarded for constant
    features. Determinism: every count is an integer, the log argument
    is a quotient of two exact BIGINT products, and each cell term is
    rounded to 6 dp BEFORE the fold (the categorical_drift convention —
    canonicalized addends make the sum order-stable); the entropies
    fold the same way. ln's last-ulp libm variation is absorbed by the
    6-dp canonicalization exactly as in the PSI monitor.

    Scale shape: TWO corpus scans (range, then ONE map-side-combinable
    ``groupBy(bin, label)``) and everything downstream flows ≤ 2·n_bins
    rows through one-row broadcast crossJoins — fully lazy. Output: one
    row per occupied (bin, label) cell — ``(bin, label, n_cell,
    p_cell, mi_contrib)`` — with panel constants (``n``, ``mi_nats``,
    ``h_bin``, ``h_label``, ``nmi``) on every row so the value hash
    verifies the global solve (house convention). Null feature/label
    rows are excluded (MI is over the observed joint)."""
    r6 = lambda c: F.round(c, 6)  # noqa: E731
    d = df.where(feature.isNotNull() & label.isNotNull()).select(
        feature.alias("_x"), label.cast("bigint").alias("_y")
    )
    rng = d.agg(r6(F.min("_x")).alias("_lo"), r6(F.max("_x")).alias("_hi"))
    width = F.nullif(
        (F.col("_hi") - F.col("_lo")) / F.lit(float(n_bins)), F.lit(0.0)
    )
    binned = d.crossJoin(F.broadcast(rng)).withColumn(
        "_bin",
        F.coalesce(
            F.least(
                F.lit(n_bins - 1),
                F.greatest(
                    F.lit(0),
                    F.floor((F.col("_x") - F.col("_lo")) / width).cast("int"),
                ),
            ),
            F.lit(0),
        ),
    )
    cells = binned.groupBy("_bin", "_y").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cell")
    )
    margb = cells.groupBy("_bin").agg(F.sum("n_cell").alias("_cb"))
    margl = cells.groupBy("_y").agg(F.sum("n_cell").alias("_cl"))
    tot = cells.agg(F.sum("n_cell").cast("bigint").alias("n"))
    j = (
        cells.join(F.broadcast(margb), "_bin")
        .join(F.broadcast(margl), "_y")
        .crossJoin(F.broadcast(tot))
    )
    contrib = r6(
        (F.col("n_cell").cast("double") / F.col("n").cast("double"))
        * F.log(
            (F.col("n") * F.col("n_cell")).cast("double")
            / (F.col("_cb") * F.col("_cl")).cast("double")
        )
    )
    per = j.select(
        F.col("_bin").alias("bin"),
        F.col("_y").alias("label"),
        "n_cell",
        r6(F.col("n_cell").cast("double") / F.col("n").cast("double")).alias(
            "p_cell"
        ),
        contrib.alias("mi_contrib"),
        "n",
    )
    ent = lambda cnt: r6(  # noqa: E731  — marginal entropy term, nats
        (cnt.cast("double") / F.col("n").cast("double"))
        * F.log(F.col("n").cast("double") / cnt.cast("double"))
    )
    hb = (
        margb.crossJoin(F.broadcast(tot))
        .select(ent(F.col("_cb")).alias("_t"))
        .agg(r6(F.sum("_t")).alias("h_bin"))
    )
    hl = (
        margl.crossJoin(F.broadcast(tot))
        .select(ent(F.col("_cl")).alias("_t"))
        .agg(r6(F.sum("_t")).alias("h_label"))
    )
    mi = per.agg(r6(F.sum("mi_contrib")).alias("mi_nats"))
    return (
        per.crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(hb))
        .crossJoin(F.broadcast(hl))
        .select(
            "bin",
            "label",
            "n_cell",
            "p_cell",
            "mi_contrib",
            "n",
            "mi_nats",
            "h_bin",
            "h_label",
            F.when(
                (F.col("h_bin") > 0) & (F.col("h_label") > 0),
                r6(
                    F.col("mi_nats")
                    / F.sqrt(F.col("h_bin") * F.col("h_label"))
                ),
            ).alias("nmi"),
        )
    )


def logistic_fit(
    df: DataFrame,
    x1: Column,
    x2: Column,
    label: Column,
    seed: Column,
    n_iter: int = 4,
    ridge: float = 1e-3,
    lineage: str = "persist",
) -> DataFrame:
    """Ridge-regularized LOGISTIC probe fit by ``n_iter`` unrolled
    Newton (IRLS) steps, entirely in-plan — the classification-correct
    upgrade of :func:`linear_probe_fit` (least squares on a 0/1 label
    is miscalibrated exactly in the tails a quality gate thresholds
    on; the logistic MLE is the right geometry, and its Newton step is
    still just a 3×3 solve).

    Per step, with current weights ``w`` broadcast back over the seed
    slice: ``p = sigmoid(w·x)``, Hessian ``H = Σ p(1-p)·x xᵀ + λI``
    and gradient ``g = Σ (y - p)·x − λw`` reduce in ONE map-side
    combine (nine moment sums + carried weights), the step
    ``H⁻¹ g`` is Cramer cofactors ON the moment row (``_det3``'s exact
    term order), and ``w ← w + H⁻¹g``. Moments are 6-dp-canonicalized
    before each solve and weights 9-dp after it (the bt_strengths /
    pagerank convention), so the ENTIRE trajectory replays
    bit-for-bit in any engine — the DuckDB oracle unrolls the same
    CTE chain. A singular Hessian keeps the previous iterate (guard,
    not crash). Initial weights are zeros (p = 0.5 everywhere), so
    step 1 reproduces a scaled linear fit and steps 2+ add the
    reweighting.

    ``lineage='persist'`` (default) lazily caches each 1-row iterate —
    without a boundary Catalyst re-expands the seed aggregate once per
    downstream REFERENCE and the plan triples per step (the
    bt_strengths lesson); ``'none'`` leaves the raw tree (debugging).
    ``n_iter`` is a plan-depth knob: 4 steps land within ~1e-6 of the
    MLE on separable-ish 2-feature problems (pytest pins parity with
    an independent numpy IRLS).

    Scale shape: ``n_iter`` map-side-combined aggregates over the SEED
    slice only (the CCNet move — the seed is the small curated set;
    the 100 TB crawl is touched once, by `logistic_score`'s map-only
    apply). No collect, no numpy, no UDFs.
    """
    if lineage not in ("persist", "none"):
        raise ValueError(f"unknown lineage {lineage!r}")
    seeded = df.filter(seed).select(
        x1.alias("_x1"), x2.alias("_x2"), label.alias("_y")
    )
    if lineage == "persist":
        seeded = seeded.persist()
    lam = float(ridge)
    r6 = lambda c: F.round(c, 6)  # noqa: E731

    spark = df.sparkSession
    w = spark.createDataFrame([(0.0, 0.0, 0.0)], "w0 double, w1 double, w2 double")
    for _ in range(n_iter):
        joined = seeded.crossJoin(F.broadcast(w))
        eta = (
            F.col("w0")
            + F.col("w1") * F.col("_x1")
            + F.col("w2") * F.col("_x2")
        )
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
        s = p * (F.lit(1.0) - p)
        m = joined.agg(
            r6(F.sum(s)).alias("h00"),
            r6(F.sum(s * F.col("_x1"))).alias("h01"),
            r6(F.sum(s * F.col("_x2"))).alias("h02"),
            r6(F.sum(s * F.col("_x1") * F.col("_x1"))).alias("h11"),
            r6(F.sum(s * F.col("_x1") * F.col("_x2"))).alias("h12"),
            r6(F.sum(s * F.col("_x2") * F.col("_x2"))).alias("h22"),
            r6(F.sum(F.col("_y") - p)).alias("g0"),
            r6(F.sum((F.col("_y") - p) * F.col("_x1"))).alias("g1"),
            r6(F.sum((F.col("_y") - p) * F.col("_x2"))).alias("g2"),
            F.first("w0").alias("w0"),
            F.first("w1").alias("w1"),
            F.first("w2").alias("w2"),
        )
        a = [
            [F.col("h00") + lam, F.col("h01"), F.col("h02")],
            [F.col("h01"), F.col("h11") + lam, F.col("h12")],
            [F.col("h02"), F.col("h12"), F.col("h22") + lam],
        ]
        b = [
            F.col("g0") - lam * F.col("w0"),
            F.col("g1") - lam * F.col("w1"),
            F.col("g2") - lam * F.col("w2"),
        ]
        det = _det3(a)
        cols = []
        for j, name in enumerate(("w0", "w1", "w2")):
            aj = [
                [b[i] if k == j else a[i][k] for k in range(3)]
                for i in range(3)
            ]
            step = _det3(aj) / det
            cols.append(
                F.when(det != 0, F.round(F.col(name) + step, 9))
                .otherwise(F.col(name))
                .alias(name)
            )
        w = m.select(*cols)
        if lineage == "persist":
            w = w.persist()
    return w


def logistic_score(
    df: DataFrame,
    x1: Column,
    x2: Column,
    label: Column,
    seed: Column,
    n_iter: int = 4,
    ridge: float = 1e-3,
    out_col: str = "p_hat",
) -> DataFrame:
    """Fit the logistic probe on the seed slice, score EVERY row with
    the calibrated probability ``sigmoid(w·x)`` (rounded 6dp) plus the
    fitted weights as constant columns (the value hash verifies the
    SOLVE, `linear_probe_score`'s convention). Scoring is a broadcast
    one-row cross-join + map-only expression — the corpus side is
    never shuffled."""
    w = logistic_fit(df, x1, x2, label, seed, n_iter=n_iter, ridge=ridge)
    scored = df.crossJoin(F.broadcast(w))
    eta = F.col("w0") + F.col("w1") * x1 + F.col("w2") * x2
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
    return (
        scored.withColumn(out_col, F.round(p, 6))
        .withColumn("w0", F.round(F.col("w0"), 9))
        .withColumn("w1", F.round(F.col("w1"), 9))
        .withColumn("w2", F.round(F.col("w2"), 9))
    )
