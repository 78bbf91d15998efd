"""Zero-temporal-leakage audit as a first-class distributed operator.

The north rule gates throughput on an explicit *zero-leakage audit*: no
feature at ts_t may read turns > t. The audit here is the truncation
test run AS A SPARK JOB — for each cutoff c, the pipeline's output on
the full table restricted to ts ≤ c must equal, bit-for-bit, the
pipeline's output on the table truncated at c BEFORE any feature is
computed (trailing windows only ⇒ identical; any lookahead ⇒ a
violation row). Everything is joins + aggregates: no collect, no
driver-side compare, so the audit runs at the same scale as the
pipeline it audits and lands in the run manifest next to the metrics.

The flagship audit is oracle-replayed end-to-end in DuckDB
(queries.flagship_leakage_audit): both engines compute full-vs-truncated
feature frames and must agree the violation count is zero — the audit
itself is engine-checked, not just the pipeline.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def truncation_leakage_audit(
    build_fn: Callable[[DataFrame], DataFrame],
    df: DataFrame,
    cutoffs: Sequence[str],
    compare_cols: Sequence[str],
    key_cols: Sequence[str] = ("conv_id", "turn_idx"),
    ts_col: str = "ts",
    atol: float = 0.0,
) -> DataFrame:
    """Audit ``build_fn`` (a point-in-time feature pipeline) for
    temporal leakage at each cutoff.

    Per cutoff, emits one row:

    * ``n_rows`` — full-outer-joined row count (both sides at ts ≤ c);
    * ``n_only_full`` / ``n_only_trunc`` — keys present on one side
      only (a leak of *existence*: the pipeline created or dropped rows
      depending on future data);
    * ``n_viol`` — keys present on both sides whose compared values
      differ (null-status or |Δ| > atol);
    * ``max_abs_diff`` — the largest numeric divergence (0.0 when
      leak-free).

    A leak-free pipeline returns all-zero violation columns for every
    cutoff. The full side is computed ONCE and re-filtered per cutoff;
    each truncated side is an independent run of ``build_fn`` on the
    prefix, exactly the data that existed at time c.
    """
    full = build_fn(df)
    keys = list(key_cols)
    parts = []
    for c in cutoffs:
        a = full.filter(F.col(ts_col) <= F.lit(c)).select(
            *keys,
            F.lit(True).alias("_in_a"),
            *[F.col(x).alias(f"_a_{x}") for x in compare_cols],
        )
        b = build_fn(df.filter(F.col(ts_col) <= F.lit(c))).select(
            *keys,
            F.lit(True).alias("_in_b"),
            *[F.col(x).alias(f"_b_{x}") for x in compare_cols],
        )
        j = a.join(b, keys, "full_outer")
        both = F.col("_in_a").isNotNull() & F.col("_in_b").isNotNull()
        viol = F.lit(False)
        diffs = []
        for x in compare_cols:
            av, bv = F.col(f"_a_{x}"), F.col(f"_b_{x}")
            null_skew = av.isNull() != bv.isNull()
            field = j.schema[f"_a_{x}"].dataType.typeName()
            if field in ("double", "float", "decimal"):
                d = F.abs(av - bv)
                diffs.append(F.when(av.isNotNull() & bv.isNotNull(), d))
                viol = viol | null_skew | (
                    av.isNotNull() & bv.isNotNull() & (d > atol)
                )
            else:
                viol = viol | null_skew | (
                    av.isNotNull() & bv.isNotNull() & (av != bv)
                )
        if not diffs:
            max_diff = F.lit(0.0)
        elif len(diffs) == 1:
            max_diff = F.max(diffs[0])
        else:
            max_diff = F.max(F.greatest(*diffs))
        agg = (
            j.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("_in_b").isNull().cast("bigint")).alias(
                    "n_only_full"
                ),
                F.sum(F.col("_in_a").isNull().cast("bigint")).alias(
                    "n_only_trunc"
                ),
                F.sum((both & viol).cast("bigint")).alias("n_viol"),
                F.coalesce(max_diff, F.lit(0.0)).alias("max_abs_diff"),
            )
            .select(F.lit(str(c)).alias("cutoff"), "*")
        )
        parts.append(agg)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int = 5,
) -> DataFrame:
    """k-anonymity release gate over a set of quasi-identifier columns
    (Sweeney 2002) — the privacy companion of the PII scrubber: regex
    scrubbing removes DIRECT identifiers, but a row can still be
    re-identified when its combination of innocuous metadata (source ×
    language × length bucket × date…) is shared by fewer than ``k``
    rows. A release pipeline runs this on the metadata columns it
    plans to publish and either generalizes (coarsen buckets, drop a
    column) or suppresses the at-risk groups.

    One row per distinct quasi-identifier tuple: the tuple's columns,
    ``group_size``, and ``at_risk`` (1 iff group_size < k — nulls in
    quasi columns group together, the conservative reading: a NULL is
    a value an attacker can match on). Riding panel constants —
    ``n_rows``, ``n_groups``, ``n_rows_at_risk``, ``risk_frac``
    (6 dp), ``k_threshold``, and ``min_group_size`` (the corpus's
    actual anonymity level: the table is k'-anonymous for k' =
    min_group_size) — make the value hash verify the census.

    Scale shape: ONE map-side-combinable ``groupBy(quasi_cols)`` —
    the corpus reduces to the distinct-tuple table before anything
    shuffles — then one tiny aggregate over the groups broadcast back.
    Fully lazy; no windows, no driver work. The output is
    group-sized, which is the answer itself (an all-unique worst case
    IS the finding)."""
    groups = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).cast("bigint").alias("group_size")
    )
    at_risk = (F.col("group_size") < k).cast("int")
    g = groups.withColumn("at_risk", at_risk)
    consts = g.agg(
        F.sum("group_size").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(F.col("group_size") * F.col("at_risk"))
        .cast("bigint")
        .alias("n_rows_at_risk"),
        F.round(
            F.sum(F.col("group_size") * F.col("at_risk")).cast("double")
            / F.sum("group_size").cast("double"),
            6,
        ).alias("risk_frac"),
        F.min("group_size").cast("bigint").alias("min_group_size"),
    )
    return (
        g.crossJoin(F.broadcast(consts))
        .withColumn("k_threshold", F.lit(int(k)))
    )


def l_diversity_audit(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    l_threshold: int = 2,
) -> DataFrame:
    """l-diversity release gate (Machanavajjhala et al. 2007) — the
    k-anonymity sibling that catches the attack group SIZE cannot: a
    size-50 quasi group is 50-anonymous, but if all 50 rows share one
    value of the sensitive attribute, membership alone discloses it
    (the homogeneity attack). Per quasi-identifier group this reports
    the number of DISTINCT sensitive values and the stronger
    entropy form: ``entropy_l`` = exp(H) of the sensitive-value
    distribution within the group — the "effective number" of
    sensitive values an attacker must still distinguish (a 49-vs-1
    split has 2 distinct values but entropy_l ≈ 1.1; the distinct
    count alone would pass it).

    ``at_risk`` flags groups with fewer than ``l_threshold`` distinct
    sensitive values; NULL sensitive values count as a value (they are
    disclosable facts too) and NULL quasi values group together (the
    k-anonymity convention). Entropy terms are 9-dp-canonicalized
    before the fold and exp(H) rounded to 6 dp — engine-exact.

    Scale shape: TWO stacked map-side-combinable aggregates —
    ``groupBy(quasi, sensitive)`` then ``groupBy(quasi)`` — so
    per-task state is bounded by the aggregate hash map, never a
    distinct-set buffer under a hot group; census constants broadcast
    back. Output per quasi group: the tuple's columns, ``group_size``,
    ``n_sensitive``, ``entropy_l``, ``at_risk`` + riding
    ``n_groups``, ``n_rows``, ``n_rows_at_risk``, ``risk_frac``,
    ``min_diversity``, ``l_threshold``."""
    qc = [F.col(c) for c in quasi_cols]
    lvl1 = df.groupBy(*qc, F.col(sensitive_col).alias("_sv")).agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    )
    totals = lvl1.groupBy(*qc).agg(F.sum("_c").alias("_n"))
    ent_term = F.round(
        -(F.col("_c").cast("double") / F.col("_n").cast("double"))
        * F.log(F.col("_c").cast("double") / F.col("_n").cast("double")),
        9,
    )
    g = (
        lvl1.join(totals, list(quasi_cols))
        .withColumn("_h", ent_term)
        .groupBy(*[F.col(c) for c in quasi_cols])
        .agg(
            F.max("_n").cast("bigint").alias("group_size"),
            F.count(F.lit(1)).cast("bigint").alias("n_sensitive"),
            F.round(F.exp(F.round(F.sum("_h"), 9)), 6).alias("entropy_l"),
        )
        .withColumn(
            "at_risk",
            (F.col("n_sensitive") < l_threshold).cast("int"),
        )
    )
    consts = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum("group_size").cast("bigint").alias("n_rows"),
        F.sum(F.col("group_size") * F.col("at_risk"))
        .cast("bigint")
        .alias("n_rows_at_risk"),
        F.round(
            F.sum(F.col("group_size") * F.col("at_risk")).cast("double")
            / F.sum("group_size").cast("double"),
            6,
        ).alias("risk_frac"),
        F.min("n_sensitive").cast("bigint").alias("min_diversity"),
    )
    return (
        g.crossJoin(F.broadcast(consts))
        .withColumn("l_threshold", F.lit(int(l_threshold)))
    )


def t_closeness_audit(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    t_threshold: float = 0.2,
) -> DataFrame:
    """t-closeness release gate (Li, Li & Venkatasubramanian 2007) —
    the third member of the privacy trilogy: k-anonymity bounds group
    SIZE, l-diversity bounds within-group VARIETY, t-closeness bounds
    what a group's sensitive DISTRIBUTION reveals relative to the
    corpus (the skewness attack l-diversity misses: a group with 40%
    of a 1%-prevalence sensitive value is plenty "diverse" yet leaks a
    40× belief update). Distance = total variation
    TVD(P_group, Q_global) = ½ Σ_v |p_v − q_v| — the categorical EMD
    under uniform ground distance, the paper's own suggestion for
    nominal attributes.

    Sparse-exact: a group never materializes the full sensitive
    support — Σ over values ABSENT from the group contributes
    ½(1 − Σ_present q_v), so TVD = ½(Σ_present |p−q| + 1 − Σ_present q)
    needs only the group's own (quasi, value) rows joined to the
    global marginals. Terms 9-dp-canonicalized before folds, TVD
    rounded to 6 dp, the threshold compare on the rounded value —
    engine-exact. NULL conventions as the siblings: NULL sensitive is
    a value, NULL quasi groups together.

    Scale shape: the same two stacked map-side aggregates as
    l-diversity plus a BROADCAST join of the |support|-sized global
    marginal table; census constants broadcast back. Output per quasi
    group: the tuple's columns, ``group_size``, ``tvd``, ``at_risk``
    + riding ``max_tvd`` (the table's actual t), ``n_groups``,
    ``n_rows``, ``n_rows_at_risk``, ``risk_frac``, ``t_threshold``."""
    qc = [F.col(c) for c in quasi_cols]
    lvl1 = df.groupBy(*qc, F.col(sensitive_col).alias("_sv")).agg(
        F.count(F.lit(1)).cast("bigint").alias("_c")
    )
    totals = lvl1.groupBy(*qc).agg(F.sum("_c").alias("_n"))
    glob = lvl1.groupBy("_sv").agg(F.sum("_c").alias("_gc"))
    nall = glob.agg(F.sum("_gc").alias("_na"))
    joined = (
        lvl1.join(totals, list(quasi_cols))
        .join(F.broadcast(glob), "_sv")
        .crossJoin(F.broadcast(nall))
    )
    p = F.col("_c").cast("double") / F.col("_n").cast("double")
    q = F.col("_gc").cast("double") / F.col("_na").cast("double")
    g = (
        joined.withColumn("_ad", F.round(F.abs(p - q), 9))
        .withColumn("_qp", F.round(q, 9))
        .groupBy(*[F.col(c) for c in quasi_cols])
        .agg(
            F.max("_n").cast("bigint").alias("group_size"),
            F.round(
                (
                    F.round(F.sum("_ad"), 9)
                    + 1.0
                    - F.round(F.sum("_qp"), 9)
                )
                / 2.0,
                6,
            ).alias("tvd"),
        )
        .withColumn(
            "at_risk", (F.col("tvd") > float(t_threshold)).cast("int")
        )
    )
    consts = g.agg(
        F.max("tvd").alias("max_tvd"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum("group_size").cast("bigint").alias("n_rows"),
        F.sum(F.col("group_size") * F.col("at_risk"))
        .cast("bigint")
        .alias("n_rows_at_risk"),
        F.round(
            F.sum(F.col("group_size") * F.col("at_risk")).cast("double")
            / F.sum("group_size").cast("double"),
            6,
        ).alias("risk_frac"),
    )
    return (
        g.crossJoin(F.broadcast(consts))
        .withColumn("t_threshold", F.lit(float(t_threshold)))
    )


def expectations_audit(
    df: DataFrame,
    rules: Sequence[dict],
    nd: int = 6,
) -> DataFrame:
    """Data-contract gate: declarative row-level expectations checked
    in (almost) ONE corpus scan — the ingestion acceptance test a
    pipeline runs before features, dedup, or packing ever see the
    table (the Great-Expectations idea re-expressed as Column
    algebra; nothing is collected, the verdict table is rules-sized).

    Each rule is a dict with ``name``, ``type`` and type-specific
    keys:

    * ``{"type": "not_null", "col": c}`` — c must be non-null;
    * ``{"type": "range", "col": c, "min": lo, "max": hi}`` — either
      bound optional; NULLs are not range violations (compose with
      not_null — one rule, one verdict each);
    * ``{"type": "allowed", "col": c, "values": [...]}`` — value set
      membership (NULL is a violation unless None is listed);
    * ``{"type": "regex", "col": c, "pattern": p}`` — full-match
      rlike; NULL is a violation;
    * ``{"type": "monotonic", "col": c, "by": entity, "order": o}`` —
      c must never DECREASE along o within each entity (the
      resequence_turns invariant as a gate); adds one window on the
      entity key;
    * ``{"type": "unique", "cols": [c, ...]}`` — the tuple must be
      unique table-wide; adds one distinct aggregate on those cols.

    Output one row per rule: ``(rule, kind, n_checked, n_violations,
    violation_rate, passed)``. ``n_checked`` counts rows the rule
    examined (all rows, except ``monotonic`` which skips each
    entity's first row and ``unique`` which counts distinct tuples).

    Scale shape: every row-level rule compiles to a conditional SUM in
    ONE map-side-combined global aggregate over ONE scan; the verdict
    rows are exploded from a literal struct array on the 1-row
    aggregate. A ``monotonic`` rule adds one window exchange on its
    entity key (reused if the table is already bucketed there); each
    ``unique`` rule adds one distinct aggregate (two-level hash, no
    row ever collected). Rules-sized output, no UDFs.
    """
    aggs: list = []
    outs: list = []

    work = df
    for i, r in enumerate(rules):
        kind = r["type"]
        name = r.get("name") or f"rule_{i}_{kind}"
        if kind == "monotonic":
            from pyspark.sql import Window

            w = Window.partitionBy(r["by"]).orderBy(r["order"])
            flag = f"_mono_{i}"
            prev = F.lag(F.col(r["col"])).over(w)
            work = work.withColumn(
                flag,
                F.when(prev.isNull(), F.lit(None)).otherwise(
                    (F.col(r["col"]) < prev).cast("int")
                ),
            )

    for i, r in enumerate(rules):
        kind = r["type"]
        name = r.get("name") or f"rule_{i}_{kind}"
        if kind == "not_null":
            viol = F.col(r["col"]).isNull().cast("int")
            checked = F.lit(1)
        elif kind == "range":
            c = F.col(r["col"])
            conds = []
            if r.get("min") is not None:
                conds.append(c < F.lit(r["min"]))
            if r.get("max") is not None:
                conds.append(c > F.lit(r["max"]))
            bad = conds[0]
            for x in conds[1:]:
                bad = bad | x
            viol = F.coalesce(bad.cast("int"), F.lit(0))
            checked = F.lit(1)
        elif kind == "allowed":
            c = F.col(r["col"])
            ok = c.isin(*[v for v in r["values"] if v is not None])
            if None in r["values"]:
                ok = ok | c.isNull()
            else:
                ok = F.coalesce(ok, F.lit(False))
            viol = (~ok).cast("int")
            checked = F.lit(1)
        elif kind == "regex":
            c = F.col(r["col"])
            viol = (~F.coalesce(c.rlike(r["pattern"]), F.lit(False))).cast(
                "int"
            )
            checked = F.lit(1)
        elif kind == "monotonic":
            viol = F.coalesce(F.col(f"_mono_{i}"), F.lit(0))
            checked = F.col(f"_mono_{i}").isNotNull().cast("int")
        elif kind == "unique":
            cols = [F.col(c) for c in r["cols"]]
            aggs.append(
                F.count_distinct(*cols).cast("bigint").alias(f"_uq_{i}")
            )
            aggs.append(
                F.count(F.lit(1)).cast("bigint").alias(f"_uqn_{i}")
            )
            outs.append((name, kind, f"_uq_{i}", f"_uqn_{i}", "unique"))
            continue
        else:
            raise ValueError(f"unknown expectation type {kind!r}")
        aggs.append(F.sum(viol).cast("bigint").alias(f"_v_{i}"))
        aggs.append(F.sum(checked).cast("bigint").alias(f"_n_{i}"))
        outs.append((name, kind, f"_v_{i}", f"_n_{i}", "row"))

    agg = work.agg(*aggs)
    structs = []
    for name, kind, a, b, mode in outs:
        if mode == "unique":
            n_checked = F.col(a)  # distinct tuples
            n_viol = F.col(b) - F.col(a)  # duplicate rows
        else:
            n_checked = F.col(b)
            n_viol = F.col(a)
        structs.append(
            F.struct(
                F.lit(name).alias("rule"),
                F.lit(kind).alias("kind"),
                n_checked.cast("bigint").alias("n_checked"),
                n_viol.cast("bigint").alias("n_violations"),
            )
        )
    exploded = agg.select(F.explode(F.array(*structs)).alias("_s")).select(
        "_s.rule", "_s.kind", "_s.n_checked", "_s.n_violations"
    )
    rate = F.when(
        F.col("n_checked") > 0,
        F.round(
            F.col("n_violations").cast("double") / F.col("n_checked"), nd
        )
        + F.lit(0.0),
    )
    return exploded.select(
        "rule",
        "kind",
        "n_checked",
        "n_violations",
        rate.alias("violation_rate"),
        (F.col("n_violations") == 0).alias("passed"),
    )


def dp_release_counts(
    df: DataFrame,
    group_cols: Sequence[str],
    epsilon: float = 1.0,
    sensitivity: float = 1.0,
    seed: str = "dp",
    nd: int = 6,
) -> DataFrame:
    """Laplace-mechanism count release — the RELEASE step after the
    k-anonymity / l-diversity / t-closeness gates: per group tuple,
    the true count plus Laplace(sensitivity/epsilon) noise, clamped at
    0 and rounded to an integer (both valid post-processing). This is
    the ε-DP mechanism SHAPE as a distributed operator: one map-side
    groupBy, noise derived per cell, nothing corpus-sized moves after
    the count.

    REPRODUCIBILITY SEAM (read before using in production): the noise
    here is drawn by inverse CDF from an md5 hash of (seed, cell key)
    — deterministic, so runs, engines, and the DuckDB oracle agree
    bit-for-bit, which is what a correctness harness needs. That
    determinism is exactly what real differential privacy must NOT
    have (an adversary who knows the seed removes the noise): a
    production deployment swaps the hash uniform for a CSPRNG draw at
    this one marked expression and keeps everything else — the
    mechanism algebra, sensitivity accounting, clamping — unchanged.

    Laplace inverse CDF: ``u ∈ (0,1)``, ``x = −b·sign(u−½)·
    ln(1−2|u−½|)`` with ``b = sensitivity/epsilon``; ``u = (h+½)/2³²``
    from the first 8 md5 hex digits (never exactly 0, ½, or 1, so the
    ln argument stays in (0,1]). Output per group: ``(*group_cols,
    n_true, noise, n_released, epsilon, noise_scale)`` — drop
    ``n_true``/``noise`` before publishing; they are emitted so tests
    and the oracle can verify the mechanism, and so the release
    manifest can audit utility loss internally.
    """
    b = float(sensitivity) / float(epsilon)
    counts = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true")
    )
    key = F.concat_ws(
        ":", F.lit(seed), *[F.col(c).cast("string") for c in group_cols]
    )
    h = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint")
    u = (h.cast("double") + 0.5) / 4294967296.0
    centered = u - 0.5
    noise = (
        -F.lit(b)
        * F.signum(centered)
        * F.log(1.0 - 2.0 * F.abs(centered))
    )
    noise_r = F.round(noise, nd) + F.lit(0.0)
    released = F.greatest(
        F.lit(0).cast("bigint"),
        F.round(F.col("n_true") + noise_r, 0).cast("bigint"),
    )
    return counts.select(
        *group_cols,
        "n_true",
        noise_r.alias("noise"),
        released.alias("n_released"),
        F.lit(float(epsilon)).alias("epsilon"),
        F.lit(b).alias("noise_scale"),
    )
