"""DSIR — data selection via importance resampling (hashed n-grams).

DSIR (Xie et al. 2023, public) weights every raw document by how much
it looks like a TARGET corpus: featurize docs as hashed n-gram counts,
fit smoothed categorical distributions p (target) and q (raw) over the
hash buckets, and score ``log w(doc) = Σ_b c_doc[b]·(ln p[b] − ln q[b])``.
Training-data teams then resample the raw corpus ∝ w to shift it toward
the target domain. This module is the Spark-relational re-expression:

* Features: unigrams + bigrams of the whitespace tokenization, hashed
  into ``n_buckets`` via the same md5 positional-hex bucket every other
  sampling operator here uses (`corpus.hash_bucket` — engine-replayable,
  no RNG state), counted per (doc, bucket).
* Distributions: one groupBy over the per-doc feature table per side;
  add-one smoothing over the bucket space so unseen-in-target buckets
  stay finite. The bucket tables are ``n_buckets`` rows — broadcast
  material by construction, so scoring is a map-side join however big
  the corpus is.
* Totals ride 1-row broadcast crossJoins (lazy, no driver collect).

Scale shape: the corpus stream is touched twice (feature explode for
counts, the same features for scoring — one job, Catalyst reuses the
subplan); every join key is either the tiny bucket id or doc_id. No
cartesian, no skewed shuffle: bucket-level tables are fixed-size.

No reference counterpart (`/root/reference` has no text operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkfeat.corpus import hash_bucket

__all__ = ["dsir_logweights"]


def _grams(c):
    toks = F.filter(F.split(F.lower(c), r"\s+"), lambda x: x != "")
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return F.concat(toks, bigrams)


def dsir_logweights(
    docs: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> DataFrame:
    """Score every doc in ``docs`` (the raw corpus) against ``target``.

    Output: ``(doc_id, n_grams, dsir_logweight)`` — one row per raw
    doc; zero-gram docs (null/empty text) keep their row with 0 grams
    and null weight. Positive weight ⇒ more target-like than the raw
    average; downstream resampling keeps docs ∝ exp(weight).
    """
    def feats(src: DataFrame) -> DataFrame:
        return (
            src.select(
                F.col(id_col).alias("doc_id"),
                F.explode(_grams(F.col(text_col))).alias("gram"),
            )
            .withColumn("b", hash_bucket("gram", start=25, buckets=n_buckets))
            .groupBy("doc_id", "b")
            .agg(F.count("*").alias("k"))
        )

    doc_feats = feats(docs)
    tgt_counts = (
        feats(target).groupBy("b").agg(F.sum("k").alias("ct"))
    )
    raw_counts = doc_feats.groupBy("b").agg(F.sum("k").alias("cr"))

    t_total = tgt_counts.agg(F.sum("ct").cast("double").alias("t_tot"))
    r_total = raw_counts.agg(F.sum("cr").cast("double").alias("r_tot"))

    # every bucket a raw doc touches is in raw_counts by construction;
    # target counts are left-joined with a 0 floor (add-one smoothing
    # keeps ln finite).
    ratio = (
        raw_counts.join(tgt_counts, "b", "left")
        .crossJoin(F.broadcast(t_total))
        .crossJoin(F.broadcast(r_total))
        .select(
            "b",
            (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + 1)
                    / (F.col("t_tot") + F.lit(float(n_buckets)))
                )
                - F.log(
                    (F.col("cr") + 1) / (F.col("r_tot") + F.lit(float(n_buckets)))
                )
            ).alias("lr"),
        )
    )

    per_doc = (
        doc_feats.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("k").cast("bigint").alias("n_grams"),
            F.sum(F.col("k") * F.col("lr")).alias("_lw"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0).cast("bigint")).alias("n_grams"),
            (F.round(F.col("_lw"), 6) + F.lit(0.0)).alias("dsir_logweight"),
        )
    )
