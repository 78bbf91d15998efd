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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
