"""End-to-end training-corpus preparation as a reusable composition.

The four stages a pretraining data pipeline runs over a raw document
corpus — quality gate, language confirmation, exact dedup, MinHash
near-dup drop — wired as ONE Spark job with per-document stage verdicts
(auditable: why did doc X fall out?). The driver query
``corpus_prep_pipeline`` wraps this over the testdata scan; the corpus
scaling bench (scripts/corpus_scaling_bench.py) runs the same
composition over a replicated corpus at two parallelism levels.

Scale shape: one corpus scan feeds the stateless gates (whole-stage
codegen Column expressions), one fingerprint shuffle feeds exact dedup,
one signature+band shuffle feeds the near-dup candidates; nothing is
quadratic in the corpus and every join is an equi-join (plan-asserted in
tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(key, start: int = 25, buckets: int = 1000):
    """Deterministic uniform bucket in [0, buckets) from 8 hex digits of
    ``md5(cast(key as string))`` starting at 1-based hex position
    ``start`` — pure JVM expression (no UDF), replayable byte-for-byte
    in any engine with md5. Different ``start`` values give independent
    buckets (e.g. one for the split, one for stratified keep), which is
    what makes hash sampling composable: membership is a property of
    the KEY, not of an RNG state, so every rerun, every engine, and
    every downstream join sees the same subset."""
    col = key if not isinstance(key, str) else F.col(key)
    return (
        F.conv(F.substring(F.md5(col.cast("string")), start, 8), 16, 10)
        .cast("bigint")
        % buckets
    )


def sample_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    lang_col: str = "lang",
    train: float = 0.8,
    val: float = 0.1,
    lang_rates: dict[str, float] | None = None,
) -> DataFrame:
    """Reproducible train/val/test assignment + stratified downsampling
    for a training corpus:

    * ``split``: hash-bucket the id into train/val/test by the given
      fractions — stable under corpus growth (a doc never changes
      split when new docs arrive; the leakage-safety property random
      splits lose on incremental corpora);
    * ``strat_keep``: a SECOND independent hash bucket thresholded by a
      per-language rate (e.g. downsample over-represented languages) —
      the standard rebalancing move, deterministic and auditable.
    """
    b_split = hash_bucket(id_col, start=25)
    b_keep = hash_bucket(id_col, start=17)
    split = (
        F.when(b_split < int(train * 1000), "train")
        .when(b_split < int((train + val) * 1000), "val")
        .otherwise("test")
    )
    if lang_rates:
        keep = F.lit(False)
        expr = None
        for lang, rate in sorted(lang_rates.items()):
            cond = (F.col(lang_col) == lang) & (b_keep < int(rate * 1000))
            expr = cond if expr is None else (expr | cond)
        keep = expr
    else:
        keep = F.lit(True)
    return docs.select(
        id_col,
        lang_col,
        b_split.cast("int").alias("split_bucket"),
        split.alias("split"),
        b_keep.cast("int").alias("keep_bucket"),
        keep.alias("strat_keep"),
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    block: int = 4096,
) -> DataFrame:
    """Concat-then-chunk sequence packing: documents in ``id_col`` order
    are laid end-to-end on a global token axis and cut into training
    sequences of ``budget`` tokens (``seq_id`` = which sequence a doc
    STARTS in, ``seq_offset`` = its start position inside it) — the
    deterministic packing step that turns a filtered corpus into
    fixed-length pretraining samples.

    The global prefix sum is computed WITHOUT a single-task window: docs
    group into ``floor(id / block)`` blocks, per-block token sums
    (thousands of rows, not corpus-sized) come to the driver for a
    python cumsum, and the broadcast block offsets + a per-block window
    give every doc its exact global position in parallel. Derived from
    the id, not the physical partitioning, so the layout is identical on
    any cluster — and the oracle is one plain global window cumsum."""
    from sparkfeat.text import token_count

    d = docs.select(
        F.col(id_col),
        token_count(text_col).cast("bigint").alias("n_tok"),
        (F.col(id_col) / block).cast("bigint").alias("_blk"),
    )
    sums = {
        r["_blk"]: r["s"]
        for r in d.groupBy("_blk").agg(F.sum("n_tok").alias("s")).collect()
    }
    offsets, acc = {}, 0
    for blk in sorted(sums):
        offsets[blk] = acc
        acc += sums[blk]
    off = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    w = (
        Window.partitionBy("_blk")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_excl = off[F.col("_blk")] + F.sum("n_tok").over(w) - F.col("n_tok")
    return d.select(
        id_col,
        "n_tok",
        cum_excl.alias("tok_start"),
        (cum_excl / budget).cast("bigint").alias("seq_id"),
        (cum_excl % budget).alias("seq_offset"),
    )


def corpus_prep_flags(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    neardup_est_jaccard: float = 0.5,
) -> DataFrame:
    """Per-document stage verdicts + final ``keep`` for the 4-stage
    corpus filter:

    1. Gopher-family quality gate (pure Column expressions);
    2. char-trigram language ID, kept only when it confirms the claimed
       ``lang`` (catches mislabeled/mixed documents);
    3. exact dedup on the canonical bag fingerprint (keep = min id);
    4. MinHash(64)+LSH(16 bands) near-dup drop (est Jaccard ≥
       ``neardup_est_jaccard`` — drop the higher id of each pair).
    """
    from sparkfeat import text as X
    from sparkfeat.dedup import exact_dedup, minhash_lsh_pairs

    flags = docs.select(
        id_col,
        X.gopher_quality_pass(text_col).alias("quality_pass"),
        (X.lang_ngram_guess(text_col) == F.col(lang_col)).alias("lang_ok"),
    )
    ex = exact_dedup(docs, text_col=text_col, id_col=id_col).select(
        id_col, F.col("keep").alias("exact_keep")
    )
    drops = (
        minhash_lsh_pairs(docs, num_perm=64, bands=16, shingle_n=2)
        .filter(F.col("est_jaccard") >= neardup_est_jaccard)
        .select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("neardup_drop", F.lit(True))
    )
    return (
        flags.join(ex, id_col)
        .join(drops, id_col, "left")
        .withColumn("neardup_drop", F.coalesce("neardup_drop", F.lit(False)))
        .withColumn(
            "keep",
            F.col("quality_pass")
            & F.col("lang_ok")
            & F.col("exact_keep")
            & ~F.col("neardup_drop"),
        )
    )
