"""Corpus data-card: the multi-level summary table every dataset
release ships (per-source × per-language doc/char counts, size
distribution, null audit — plus every roll-up margin) computed in ONE
corpus scan via grouping sets.

Why ROLLUP and not N separate groupBys: the naive data-card runs one
job per level (source×lang, source, grand total = 3 corpus scans);
``rollup`` expands each row to its grouping-set keys MAP-SIDE and
partial-aggregates before the single exchange, so every margin rides
one scan + one shuffle whose row count is bounded by the distinct key
space, not the corpus. This is the one operator family in the repo
that exercises Spark's multi-dimensional aggregate surface
(rollup/cube/grouping sets) — everything else is single-level.

Margin rows mark rolled-up dimensions with NULL, which is ambiguous
when the dimension itself contains real NULLs; ``grouping_id()``
(bitmask, leftmost dim = most significant bit — DuckDB's
``GROUPING(a, b)`` uses the identical convention, pytest-pinned)
disambiguates: gid 0 = leaf cell, 1 = lang rolled up, 3 = grand
total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_datacard(
    docs: DataFrame,
    dims: tuple[str, ...] = ("source", "lang"),
    text_col: str = "text",
    size_col: str = "n_chars",
) -> DataFrame:
    """One-scan rollup data-card over ``dims`` (leaf cells + every
    prefix margin + grand total).

    Per cell: ``gid`` (grouping_id bitmask), ``n_docs``, ``n_chars``
    (exact integer sum), ``avg_chars`` (6 dp), ``min_chars`` /
    ``max_chars``, ``n_null_text`` (docs with NULL ``text_col`` — the
    ingest-health column), ``null_text_frac`` (6 dp). NULL ``size_col``
    rows count toward ``n_docs``/``n_null_text`` but not the size
    moments (SUM/AVG/MIN/MAX are null-skipping in both engines).

    Scale shape: map-side grouping-set expansion + partial agg, ONE
    hash exchange keyed on (dims…, gid); output rows ≤ Σ distinct
    key prefixes — corpus-size-independent. No window, no join, no
    second scan for the margins.
    """
    size = F.col(size_col)
    return (
        docs.rollup(*dims)
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(size).cast("bigint").alias("n_chars"),
            F.round(F.avg(size), 6).alias("avg_chars"),
            F.min(size).cast("bigint").alias("min_chars"),
            F.max(size).cast("bigint").alias("max_chars"),
            F.sum(F.col(text_col).isNull().cast("bigint")).alias(
                "n_null_text"
            ),
            F.round(
                F.sum(F.col(text_col).isNull().cast("bigint"))
                / F.count(F.lit(1)),
                6,
            ).alias("null_text_frac"),
        )
    )


def _row_fp(cols: tuple[str, ...]):
    """Null-unambiguous row fingerprint: md5 over '\\x01'-joined values
    with NULL encoded as a '\\x00' sentinel (plain concat_ws SKIPS
    nulls, making ('a', NULL) collide with (NULL, 'a'))."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols
    ]
    return F.md5(F.concat_ws("\x01", *parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    compare_cols: tuple[str, ...] = ("text",),
    carry_cols: tuple[str, ...] = ("source",),
) -> DataFrame:
    """CDC between two corpus snapshots: one full-outer equi-join on
    ``id_col`` classifying every document as ``added`` (new only),
    ``removed`` (old only), ``changed`` (both, ``compare_cols``
    fingerprint differs) or ``unchanged`` — the audit a recurring
    crawl/ingest runs before promoting a snapshot, and the input to
    incremental recompute (recompute exactly the non-``unchanged``
    set instead of the corpus).

    ``carry_cols`` are reported from the NEW side, falling back to the
    old side for removed docs. Output: ``(id_col, carry_cols…,
    status)``.

    Scale shape: each side is pre-projected to (id, fingerprint,
    carry) — the md5 runs map-side in the scan stage, so the join
    shuffles two narrow streams, never the text; on snapshots stored
    bucketed by ``id_col`` (the iceberg posture) the exchanges elide
    entirely. No window, no skew surface (doc ids are unique per
    side).
    """
    o = old.select(
        F.col(id_col).alias("_id"),
        _row_fp(compare_cols).alias("_fp_old"),
        *[F.col(c).alias(f"_old_{c}") for c in carry_cols],
    )
    n = new.select(
        F.col(id_col).alias("_id"),
        _row_fp(compare_cols).alias("_fp_new"),
        *[F.col(c).alias(f"_new_{c}") for c in carry_cols],
    )
    status = (
        F.when(F.col("_fp_old").isNull(), F.lit("added"))
        .when(F.col("_fp_new").isNull(), F.lit("removed"))
        .when(F.col("_fp_old") != F.col("_fp_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return o.join(n, "_id", "full").select(
        F.col("_id").alias(id_col),
        *[
            F.coalesce(F.col(f"_new_{c}"), F.col(f"_old_{c}")).alias(c)
            for c in carry_cols
        ],
        status.alias("status"),
    )


def snapshot_churn(
    diff: DataFrame, dims: tuple[str, ...] = ("source",)
) -> DataFrame:
    """Per-``dims`` churn rollup of a :func:`snapshot_diff` table:
    counts per status plus ``churn_frac`` = (added + removed +
    changed) / total — the promote/abort gate number. One map-side
    pivot (conditional sums), one exchange on ``dims``."""
    n_add = F.sum((F.col("status") == "added").cast("bigint"))
    n_rem = F.sum((F.col("status") == "removed").cast("bigint"))
    n_chg = F.sum((F.col("status") == "changed").cast("bigint"))
    n_same = F.sum((F.col("status") == "unchanged").cast("bigint"))
    total = F.count(F.lit(1))
    return diff.groupBy(*dims).agg(
        n_add.alias("n_added"),
        n_rem.alias("n_removed"),
        n_chg.alias("n_changed"),
        n_same.alias("n_unchanged"),
        F.round((n_add + n_rem + n_chg) / total, 6).alias("churn_frac"),
    )


def incremental_update(
    diff: DataFrame,
    old_features: DataFrame,
    new_docs: DataFrame,
    feature_fn,
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental feature recompute driven by a :func:`snapshot_diff`
    table — the operator that turns the churn audit into the 100 TB
    win: ``feature_fn`` (any per-doc deterministic DataFrame → keyed
    DataFrame transform) runs ONLY over the added/changed slice of the
    new snapshot; unchanged docs carry their previous feature rows
    forward untouched; removed docs drop. At a few-percent churn the
    expensive feature pipeline touches a few percent of the corpus.

    Correctness law (pytest-pinned two ways): the result is row-for-row
    equal to ``feature_fn(new_docs)``, AND sentinel-poisoned old
    feature rows for unchanged docs SURVIVE into the output — proving
    the carry path really reads the old table instead of recomputing.

    Scale shape: two LEFT SEMI joins on ``id_col`` (dirty-slice gate on
    the new snapshot, keep-slice gate on the old feature table) — the
    semi side is the diff projection (id + status only), broadcastable
    at promotion-gate churn rates and bucket-elidable on id-bucketed
    tables; one unionByName. ``feature_fn`` sees a DataFrame, so its
    own plan fuses behind the semi gate (filter-before-compute).
    """
    dirty = diff.filter(F.col("status").isin("added", "changed")).select(
        F.col(id_col)
    )
    keep = diff.filter(F.col("status") == "unchanged").select(F.col(id_col))
    recomputed = feature_fn(new_docs.join(dirty, id_col, "left_semi"))
    carried = old_features.join(keep, id_col, "left_semi")
    return carried.unionByName(recomputed)
