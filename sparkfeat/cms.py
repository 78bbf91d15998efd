"""In-plan count-min sketch (Cormode & Muthukrishnan 2005): estimate
per-key frequencies over a key population whose cardinality is far too
large to groupBy exactly, with shuffle volume bounded by the SKETCH
size instead of the key cardinality. Sibling of :mod:`sparkfeat.bloom`
(membership → frequency): the sketch is ordinary Column algebra end to
end — no driver math, no UDFs, no JVM sketch objects — so estimates
replay bit-for-bit in any engine with md5.

Why it exists: corpus-wide term/n-gram frequency at 100 TB means
~10¹¹ distinct keys; an exact ``groupBy(term)`` shuffles all of them
(map-side combine helps per-partition volume but the reduce side still
materializes the full cardinality). The CMS build shuffles at most
``partitions × depth × width`` cells (map-side combine collapses each
partition to ≤ d·w rows), and the packed sketch is ``d·w`` bigints —
e.g. 4 × 2¹⁸ ≈ 8 MB — broadcast to score any candidate set map-only.

Error model: one-sided — ``estimate ≥ true count`` ALWAYS (hash
collisions only ever add), and ``estimate ≤ true + e·N/width`` with
probability ``1 − e^−depth`` per query (N = total inserted weight).
Heavy hitters therefore can't be missed by the sketch; they can only
be joined by a few overestimated impostors, the right failure mode
for a frequent-terms screen.

Row hashing is Kirsch–Mitzenmacher style (position in row ``i`` =
``(h1 + i·h2) mod width``) from exactly TWO 48-bit md5-prefix integers
per key — the same construction, salts aside, as
:func:`sparkfeat.bloom.bloom_build`, and exact in a bigint AND a
double in every engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparkfeat.bloom import _h12


def _h1_h2(key: Column, width) -> tuple[Column, Column]:
    """KM pair for the row probes: h1 in [0, width), h2 in [1, width)
    (never 0, so the per-row columns never collapse). Salts differ from
    the bloom filter's so a key's bloom bits and CMS cells are
    independent."""
    h1 = _h12(key, "c1") % width
    h2 = _h12(key, "c2") % (width - 1) + 1
    return h1, h2


def cms_build(
    keys: DataFrame,
    key_col: str = "key",
    weight_col: str | None = None,
    width: int = 2048,
    depth: int = 4,
) -> DataFrame:
    """Fold a key-instance table into the sketch: ONE row, ``cells`` =
    array<bigint>[depth·width] (index = row·width + col) plus the
    (width, depth) geometry the estimator needs. Each key instance adds
    its weight (1 if ``weight_col`` is None) to one cell per row.

    Scale shape: instances explode to ``depth`` cells (map), ONE
    map-side-combined ``groupBy(cell)`` sum — each input partition
    emits at most d·w combined rows no matter how many instances or
    distinct keys it held — then the dense packed array is one tiny
    aggregate row (map_from_entries + sequence-transform fill, zeros
    where nothing landed). Size ``width ≥ e·N / target_abs_error``.
    """
    n_cells = width * depth
    w = (
        F.col(weight_col).cast("bigint")
        if weight_col is not None
        else F.lit(1).cast("bigint")
    )
    h1, h2 = _h1_h2(F.col(key_col), F.lit(width))
    cell = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(depth - 1)),
            lambda i: i.cast("bigint") * width
            + (F.col("_h1") + i.cast("bigint") * F.col("_h2")) % F.lit(width),
        )
    ).alias("cell")
    sparse = (
        keys.select(h1.alias("_h1"), h2.alias("_h2"), w.alias("_w"))
        .select(cell, F.col("_w"))
        .groupBy("cell")
        .agg(F.sum("_w").alias("cnt"))
    )
    return sparse.agg(
        F.map_from_entries(F.collect_list(F.struct("cell", "cnt"))).alias("_m")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_cells - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col("_m"), i.cast("bigint")), F.lit(0).cast("bigint")
            ),
        ).alias("cells"),
        F.lit(width).alias("width"),
        F.lit(depth).alias("depth"),
    )


def cms_estimate(
    df: DataFrame,
    key: Column,
    cms: DataFrame,
    out_col: str = "est_count",
) -> DataFrame:
    """Append ``out_col`` = count-min estimate of ``key``'s total
    inserted weight: min over the depth rows of the key's cell. The
    one-row sketch broadcasts (a one-row cross-join is a map operator);
    the probe is an ``array_min`` over pure Column algebra — the probed
    side never shuffles and never sees the key population."""
    width = F.col("width").cast("bigint")
    h1, h2 = _h1_h2(key, width)

    def _cell(i: Column) -> Column:
        pos = i.cast("bigint") * width + (F.col("_h1") + i.cast("bigint") * F.col("_h2")) % width
        return F.element_at(F.col("cells"), pos.cast("int") + 1)

    est = F.array_min(
        F.transform(F.sequence(F.lit(0), F.col("depth") - 1), _cell)
    )
    return (
        df.crossJoin(F.broadcast(cms))
        .withColumn("_h1", h1)
        .withColumn("_h2", h2)
        .withColumn(out_col, est)
        .drop("cells", "width", "depth", "_h1", "_h2")
    )


def heavy_terms(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 30,
    width: int = 4096,
    depth: int = 4,
    sample_pct: int = 25,
    sample_start: int = 17,
) -> DataFrame:
    """Corpus-wide top-``k`` most frequent terms WITHOUT an exact
    full-cardinality groupBy: the classic sample-proposes /
    sketch-disposes split. Token instances from EVERY doc fold into the
    CMS (shuffle bounded by sketch size); the CANDIDATE term set comes
    from a deterministic md5 ``sample_pct``% doc slice (a term covering
    a meaningful corpus share appears in any constant-fraction sample
    with overwhelming probability — missing one requires it to be
    concentrated in <~4 docs at 25%, which is not a heavy hitter);
    each candidate is scored map-only against the broadcast sketch and
    ranked (est desc, term asc — deterministic ties).

    One-sided by construction: estimates only overestimate, so a true
    heavy hitter in the candidate set can never be ranked below its
    exact-count position by the sketch — impostors can only join from
    below. Output: (term, est_count), exactly ``k`` rows.
    """
    from sparkfeat.corpus import hash_bucket

    toks = docs.select(
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("term"),
        hash_bucket(id_col, start=sample_start, buckets=1000).alias("_sb"),
    ).filter(F.col("term") != "")
    cms = cms_build(toks, "term", width=width, depth=depth)
    cands = toks.filter(F.col("_sb") < sample_pct * 10).select("term").distinct()
    return (
        cms_estimate(cands, F.col("term"), cms)
        .orderBy(F.col("est_count").desc(), F.col("term"))
        .limit(k)
        .select("term", F.col("est_count").cast("bigint").alias("est_count"))
    )
