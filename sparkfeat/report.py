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
