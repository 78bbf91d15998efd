"""In-plan Bloom filter (sparkfeat/bloom.py): no false negatives ever,
false-positive rate near theory for a correctly-sized filter, packed
layout invariants, and the map-only gate plan. The decontaminate_bloom
composition must flag a SUPERSET of the exact decontaminate verdicts."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from sparkfeat.bloom import BITS_PER_WORD, bloom_build, bloom_gate


def _keys(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "key string")


def test_bloom_zero_false_negatives(spark):
    """Every inserted key must test positive — the one-sided guarantee
    the whole design rests on."""
    vals = [f"key-{i}" for i in range(500)]
    bloom = bloom_build(_keys(spark, vals), n_words=128, n_hashes=5)
    probed = bloom_gate(_keys(spark, vals), F.col("key"), bloom)
    assert probed.filter(~F.col("bloom_hit")).count() == 0


def test_bloom_fpr_near_theory(spark):
    """2000 non-members against a 500-key filter: observed FPR within a
    loose factor of the (1 - e^{-kn/m})^k prediction."""
    n, n_words, k = 500, 128, 5
    m = n_words * BITS_PER_WORD
    bloom = bloom_build(
        _keys(spark, [f"key-{i}" for i in range(n)]), n_words=n_words, n_hashes=k
    )
    probes = _keys(spark, [f"other-{i}" for i in range(2000)])
    fp = bloom_gate(probes, F.col("key"), bloom).filter(F.col("bloom_hit")).count()
    expect = (1 - math.exp(-k * n / m)) ** k  # ~0.0094
    assert fp / 2000 < 5 * expect + 0.005, (fp, expect)


def test_bloom_packed_layout_and_empty(spark):
    """The packed row is exactly n_words bigints; an EMPTY key set
    yields all-zero words and an all-false gate."""
    empty = _keys(spark, []).filter(F.lit(False))
    bloom = bloom_build(empty, n_words=16, n_hashes=3)
    row = bloom.collect()[0]
    assert len(row["words"]) == 16 and all(w == 0 for w in row["words"])
    assert row["n_words"] == 16 and row["n_hashes"] == 3
    probed = bloom_gate(_keys(spark, ["a", "b"]), F.col("key"), bloom)
    assert probed.filter(F.col("bloom_hit")).count() == 0
    # non-empty: words are non-negative (63-bit layout never sets the
    # sign bit — the portability invariant)
    row2 = bloom_build(
        _keys(spark, [f"k{i}" for i in range(300)]), n_words=8, n_hashes=4
    ).collect()[0]
    assert all(w >= 0 for w in row2["words"])
    assert any(w > 0 for w in row2["words"])


def test_bloom_gate_plan_broadcast_map_only(spark):
    """The one-row filter broadcasts; the probed corpus side has no
    sort-merge join and no range partitioning."""
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bloom = bloom_build(
        d.select(F.md5("text").alias("key")).limit(50), n_words=64
    )
    out = bloom_gate(d.select(F.md5("text").alias("key")), F.col("key"), bloom)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p
    assert "rangepartitioning" not in p.lower(), p


def test_decontaminate_bloom_superset_of_exact(spark):
    """On a planted contamination fixture the Bloom screen flags every
    exactly-contaminated doc (no false negatives) and n_hit_bloom >=
    n_hit exact per doc."""
    from sparkfeat.corpus import decontaminate, decontaminate_bloom

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id bigint, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "xx the quick brown fox jumps over the lazy yy"),
            (2, "xx quick brown fox jumps over the lazy yy"),
            (3, "completely unrelated text about something else entirely here"),
        ],
        "doc_id bigint, text string",
    )
    exact = {
        r["doc_id"]: r for r in decontaminate(corpus, bench, n=8).collect()
    }
    bloomed = {
        r["doc_id"]: r
        for r in decontaminate_bloom(
            corpus, bench, n=8, n_words=64, n_hashes=5
        ).collect()
    }
    assert set(bloomed) == set(exact)
    for d_id, ex in exact.items():
        bl = bloomed[d_id]
        assert bl["n_grams"] == ex["n_grams"]
        assert bl["n_hit_bloom"] >= ex["n_hit"]
        if ex["contaminated"]:
            assert bl["flagged"]
