"""cluster_safe_split (sparkfeat/corpus.py): the no-straddle invariant
(no near-dup cluster crosses a split fence), exact nesting with the
doc-level sample_split for singletons, and the contamination contrast —
a doc-level split DOES strand planted near-dup pairs across train/test,
which is precisely the leak this operator removes."""

from __future__ import annotations

import pyspark.sql.functions as F

from sparkfeat.corpus import cluster_safe_split, hash_bucket, sample_split


def _docs(spark, n=400):
    return spark.createDataFrame(
        [(f"doc-{i:04d}", f"text {i}") for i in range(n)], "doc_id string, text string"
    )


def _chain_pairs(spark, pairs):
    return spark.createDataFrame(pairs, "id_a string, id_b string")


def test_no_cluster_straddles_splits(spark):
    """Every multi-doc cluster lands in exactly ONE split — the whole
    point. Chains force transitive grouping (A~B, B~C => one cluster)."""
    docs = _docs(spark)
    pairs = _chain_pairs(
        spark,
        [(f"doc-{i:04d}", f"doc-{i + 1:04d}") for i in range(0, 60, 3)]
        + [(f"doc-{i + 1:04d}", f"doc-{i + 2:04d}") for i in range(0, 60, 3)],
    )
    out = cluster_safe_split(docs, pairs)
    straddlers = (
        out.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .count()
    )
    assert straddlers == 0


def test_singletons_keep_doc_level_assignment(spark):
    """A doc with no near-dups clusters with itself, so its split must
    be bit-identical to sample_split's — adopting cluster-safety only
    ever moves members of multi-doc clusters."""
    docs = _docs(spark).withColumn("lang", F.lit("en"))
    pairs = _chain_pairs(spark, [("doc-0000", "doc-0001")])
    safe = cluster_safe_split(docs, pairs).filter(F.col("cluster_size") == 1)
    doc_level = sample_split(docs).select("doc_id", F.col("split").alias("dsplit"))
    diff = (
        safe.join(doc_level, "doc_id")
        .filter(F.col("split") != F.col("dsplit"))
        .count()
    )
    assert diff == 0
    assert safe.count() == 398  # everything but the one planted pair


def test_doc_level_split_leaks_cluster_split_does_not(spark):
    """The contrast pin: plant near-dup pairs whose members' DOC-level
    buckets fall on opposite sides of the train fence; doc-level split
    strands them, cluster-safe split keeps every pair together."""
    docs = _docs(spark, n=1000).withColumn("lang", F.lit("en"))
    buckets = {
        r["doc_id"]: r["b"]
        for r in docs.select(
            "doc_id", hash_bucket("doc_id", start=25).alias("b")
        ).collect()
    }
    train_ids = [d for d, b in buckets.items() if b < 800]
    test_ids = [d for d, b in buckets.items() if b >= 900]
    planted = list(zip(train_ids[:20], test_ids[:20]))
    pairs = _chain_pairs(spark, planted)

    doc_level = sample_split(docs)
    dsp = {r["doc_id"]: r["split"] for r in doc_level.collect()}
    assert all(dsp[a] == "train" and dsp[b] == "test" for a, b in planted)

    safe = cluster_safe_split(docs, pairs)
    ssp = {r["doc_id"]: r["split"] for r in safe.collect()}
    assert all(ssp[a] == ssp[b] for a, b in planted)


def test_split_fractions_near_targets(spark):
    """Cluster-granularity fractions track 80/10/10 (loose: the hash is
    uniform but 400 singleton clusters is a small sample)."""
    docs = _docs(spark)
    pairs = _chain_pairs(spark, [("doc-0000", "doc-0001")])
    frac = {
        r["split"]: r["n"]
        for r in cluster_safe_split(docs, pairs)
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n = sum(frac.values())
    assert n == 400
    assert 0.70 < frac["train"] / n < 0.90, frac
    assert frac.get("val", 0) > 0 and frac.get("test", 0) > 0, frac
