"""In-plan count-min sketch (sparkfeat/cms.py): one-sided estimates
(never under), exactness at generous width, the e·N/width error bound
at deliberately-tight width, the map-only estimate plan, and the
heavy-terms sample-proposes / sketch-disposes composition recovering
the exact top-k."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from sparkfeat.cms import cms_build, cms_estimate, heavy_terms


def _instances(spark, n_keys=200, reps=lambda i: i % 7 + 1):
    """Key-instance table where key-i appears reps(i) times."""
    rows = [(f"key-{i}",) for i in range(n_keys) for _ in range(reps(i))]
    return spark.createDataFrame(rows, "key string")


def _exact(spark, n_keys=200, reps=lambda i: i % 7 + 1):
    return {f"key-{i}": reps(i) for i in range(n_keys)}


def test_cms_never_underestimates(spark):
    """estimate >= true count for EVERY key — the one-sided guarantee;
    width deliberately tight (64) so collisions definitely occur."""
    inst = _instances(spark)
    cms = cms_build(inst, width=64, depth=4)
    got = {
        r["key"]: r["est"]
        for r in cms_estimate(inst.distinct(), F.col("key"), cms, "est").collect()
    }
    exact = _exact(spark)
    assert all(got[k] >= v for k, v in exact.items()), {
        k: (got[k], v) for k, v in exact.items() if got[k] < v
    }


def test_cms_exact_at_generous_width(spark):
    """width >> distinct keys: a pair only inflates an estimate by
    colliding in ALL depth rows (p ~ width^-depth), so every estimate
    is exact."""
    inst = _instances(spark, n_keys=50)
    cms = cms_build(inst, width=8192, depth=4)
    got = {
        r["key"]: r["est"]
        for r in cms_estimate(inst.distinct(), F.col("key"), cms, "est").collect()
    }
    assert got == _exact(spark, n_keys=50)


def test_cms_error_bound(spark):
    """Cormode–Muthukrishnan: overshoot <= e*N/width with probability
    1 - e^-depth per query. At width=64, depth=4 over N=800 instances,
    the expected violation rate is ~1.8%; assert <10% violate and the
    90th-percentile overshoot stays inside the bound."""
    inst = _instances(spark)
    n_total = inst.count()
    width = 64
    cms = cms_build(inst, width=width, depth=4)
    exact = _exact(spark)
    got = {
        r["key"]: r["est"]
        for r in cms_estimate(inst.distinct(), F.col("key"), cms, "est").collect()
    }
    bound = math.e * n_total / width
    overs = sorted(got[k] - v for k, v in exact.items())
    violations = sum(1 for o in overs if o > bound)
    assert violations / len(overs) < 0.10, (violations, len(overs), bound)
    assert overs[int(0.9 * len(overs))] <= bound, (overs[-5:], bound)


def test_cms_weighted_build(spark):
    """weight_col: one row per key with its count must build the same
    sketch as the exploded instance table."""
    inst = _instances(spark, n_keys=80)
    weighted = inst.groupBy("key").agg(F.count("*").alias("w"))
    a = cms_build(inst, width=256, depth=4).collect()[0]["cells"]
    b = cms_build(weighted, weight_col="w", width=256, depth=4).collect()[0]["cells"]
    assert a == b


def test_cms_estimate_plan_broadcast_map_only(spark):
    """The probe side must broadcast the one-row sketch — never a
    shuffle join of the probed table."""
    inst = _instances(spark, n_keys=30)
    cms = cms_build(inst, width=128, depth=4)
    p = cms_estimate(
        inst.distinct(), F.col("key"), cms, "est"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p


def test_cms_packed_layout(spark):
    """Dense cells array has exactly width*depth entries, total mass =
    depth * N (every instance lands in one cell per row), zeros where
    nothing landed."""
    inst = _instances(spark, n_keys=20)
    n_total = inst.count()
    row = cms_build(inst, width=512, depth=3).collect()[0]
    assert len(row["cells"]) == 512 * 3
    assert sum(row["cells"]) == 3 * n_total
    assert 0 in row["cells"]


def test_heavy_terms_recovers_exact_topk(spark, sf_dir):
    """Generous width + full-population candidates: the sketch top-k
    must equal the exact groupBy top-k, same order."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = heavy_terms(
        docs, k=20, width=65536, depth=4, sample_pct=100
    ).collect()
    exact = (
        docs.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .count()
        .orderBy(F.col("count").desc(), F.col("term"))
        .limit(20)
        .collect()
    )
    assert [(r["term"], r["est_count"]) for r in got] == [
        (r["term"], r["count"]) for r in exact
    ]


def test_heavy_terms_sample_contains_true_heavies(spark, sf_dir):
    """The 25% md5 doc sample must propose every true top-10 term — a
    heavy hitter concentrated enough to dodge a constant-fraction
    sample is not a heavy hitter."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {r["term"] for r in heavy_terms(docs, k=30, width=65536, depth=4).collect()}
    exact = (
        docs.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .count()
        .orderBy(F.col("count").desc(), F.col("term"))
        .limit(10)
        .collect()
    )
    assert {r["term"] for r in exact} <= got
