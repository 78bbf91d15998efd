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
    # ONE union-tagged gram pass feeds everything (r6): the old
    # per-side ``feats`` DAG was referenced 5x (raw counts, raw total,
    # per-doc scoring; target counts, target total), and each reference
    # re-ran the explode + per-gram md5 bucketing — the dominant CPU.
    # Here both corpora union into a single (side, doc, bucket) count
    # table whose every consumer prunes to the same aggregate, so AQE
    # reuses one exchange; the side/doc totals fold out of the
    # n_buckets-row bucket table (window state bounded by the FIXED
    # bucket space, not data). The union is repartitioned by doc id
    # before the explode: hashpartitioning(doc_id) satisfies the
    # (side, doc_id, b) grouping, so gram rows never cross an exchange
    # and hashing runs wide even off a single-split file.
    tagged = (
        docs.select(
            F.lit("r").alias("_side"),
            F.col(id_col).alias("doc_id"),
            F.col(text_col).alias("_t"),
        ).unionByName(
            target.select(
                F.lit("t").alias("_side"),
                F.col(id_col).alias("doc_id"),
                F.col(text_col).alias("_t"),
            )
        )
    ).repartition(
        docs.sparkSession.sparkContext.defaultParallelism, F.col("doc_id")
    )
    combined = (
        tagged.select(
            "_side", "doc_id", F.explode(_grams(F.col("_t"))).alias("gram")
        )
        .withColumn("b", hash_bucket("gram", start=25, buckets=n_buckets))
        .groupBy("_side", "doc_id", "b")
        .agg(F.count("*").alias("k"))
    )
    bucket_counts = combined.groupBy("b").agg(
        F.sum(F.when(F.col("_side") == "r", F.col("k"))).alias("cr"),
        F.sum(F.when(F.col("_side") == "t", F.col("k"))).alias("ct"),
    )
    # side totals: exact bigint window sums over the ≤n_buckets-row
    # bucket table (null-skipping, so each total covers exactly the
    # buckets its side touched — identical integers to the old
    # per-side aggregates)
    from pyspark.sql import Window

    wall = Window.partitionBy()
    ratio = (
        bucket_counts.withColumn(
            "t_tot", F.sum("ct").over(wall).cast("double")
        )
        .withColumn("r_tot", F.sum("cr").over(wall).cast("double"))
        .where(F.col("cr").isNotNull())
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
        combined.where(F.col("_side") == "r")
        .join(F.broadcast(ratio), "b")
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
