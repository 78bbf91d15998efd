"""hll_distinct (sparkfeat/hll.py): estimation accuracy vs exact
countDistinct across cardinality regimes (linear-count branch and raw
branch), determinism, null-key exclusion, union monotonicity, and the
no-key-shuffle scale shape."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from sparkfeat.hll import M_REGS, hll_distinct


def _keys(spark, spec):
    """spec: {group: n_distinct} — keys g:0..n-1, each duplicated 3x
    (duplication must not move the estimate: registers are max-folded)."""
    rows = [
        (g, f"{g}:{i}") for g, n in spec.items() for i in range(n) for _ in range(3)
    ]
    return spark.createDataFrame(rows, "g string, k string")


def _est(spark, spec):
    df = hll_distinct(_keys(spark, spec), F.col("k"), "g")
    return {r["g"]: r.asDict() for r in df.collect()}


def test_small_cardinalities_linear_count_regime(spark):
    got = _est(spark, {"a": 1, "b": 5, "c": 20})
    # tiny sets occupy few registers; linear counting is near-exact
    assert got["a"]["est_distinct"] == pytest.approx(1.0, abs=0.1)
    assert got["b"]["est_distinct"] == pytest.approx(5.0, rel=0.25)
    assert got["c"]["est_distinct"] == pytest.approx(20.0, rel=0.25)
    assert got["a"]["regs_hit"] == 1


def test_large_cardinalities_within_hll_error(spark):
    spec = {"x": 500, "y": 2000, "z": 8000}
    got = _est(spark, spec)
    for g, n in spec.items():
        rel = abs(got[g]["est_distinct"] - n) / n
        # sigma = 1.04/sqrt(64) ~ 13%; allow ~3 sigma on a fixed seed
        assert rel < 0.40, (g, got[g]["est_distinct"], n)
    errs = sorted(
        abs(got[g]["est_distinct"] - n) / n for g, n in spec.items()
    )
    assert errs[1] < 0.20  # median error well inside one-ish sigma


def test_duplicates_and_determinism(spark):
    """Registers are max-folded: duplicating every key 3x (done in
    _keys) vs 1x must give the IDENTICAL estimate; re-running gives
    the identical estimate (pure hash function of the key set)."""
    once = [(g, f"{g}:{i}") for g, n in {"a": 300}.items() for i in range(n)]
    df1 = spark.createDataFrame(once, "g string, k string")
    e1 = hll_distinct(df1, F.col("k"), "g").first()["est_distinct"]
    e3 = _est(spark, {"a": 300})["a"]["est_distinct"]
    assert e1 == e3
    assert hll_distinct(df1, F.col("k"), "g").first()["est_distinct"] == e1


def test_null_keys_dropped(spark):
    df = spark.createDataFrame(
        [("a", "k1"), ("a", None), ("a", "k2"), ("a", None)],
        "g string, k string",
    )
    got = hll_distinct(df, F.col("k"), "g").first()
    assert got["est_distinct"] == pytest.approx(2.0, abs=0.1)


def test_union_monotone(spark):
    """Adding keys can never decrease the estimate (register maxes are
    monotone under union) — the property that makes HLL mergeable."""
    small = _est(spark, {"a": 200})["a"]["est_distinct"]
    big = _est(spark, {"a": 1000})["a"]["est_distinct"]
    assert big > small
    assert all(
        r["regs_hit"] <= M_REGS
        for r in hll_distinct(
            _keys(spark, {"a": 1000}), F.col("k"), "g"
        ).collect()
    )


def test_keys_never_hash_exchanged(spark):
    """The scale claim: the key stream reaches the first aggregate as
    (group, register, rho) — at most groups x 64 distinct rows survive
    the map-side combine; no exchange carries the key column."""
    import re

    df = _keys(spark, {"a": 100, "b": 100})
    out = hll_distinct(df, F.col("k"), "g")
    plan = out._jdf.queryExecution().executedPlan().toString()
    exchanges = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert exchanges, plan
    assert all("k#" not in e for e in exchanges), exchanges


def test_overlap_inclusion_exclusion(spark):
    """Planted overlap: groups sharing half their keys read jaccard
    near 1/3 (|inter|/|union| = 500/1500); disjoint groups read near
    0; identical groups read near 1. The per-group estimates inside
    the overlap output must EQUAL hll_distinct's (same registers, same
    fold)."""
    from sparkfeat.hll import hll_overlap, hll_registers

    rows = (
        [("p", f"s:{i}") for i in range(500)]          # shared half
        + [("p", f"p:{i}") for i in range(500)]
        + [("q", f"s:{i}") for i in range(500)]
        + [("q", f"q:{i}") for i in range(500)]
        + [("r", f"r:{i}") for i in range(1000)]       # disjoint
        + [("p2", f"s:{i}") for i in range(500)]       # == p
        + [("p2", f"p:{i}") for i in range(500)]
    )
    df = spark.createDataFrame(rows, "g string, k string")
    regs = hll_registers(df, F.col("k"), "g")
    got = {
        (r["src_a"], r["src_b"]): r.asDict()
        for r in hll_overlap(regs, "g").collect()
    }
    pq = got[("p", "q")]
    assert pq["jaccard"] == pytest.approx(1 / 3, abs=0.15)
    assert got[("p", "r")]["jaccard"] < 0.15
    assert got[("p", "p2")]["jaccard"] == pytest.approx(1.0, abs=0.02)
    # identical sets: union == either side's estimate
    assert got[("p", "p2")]["est_union"] == got[("p", "p2")]["est_a"]
    # per-group estimates agree with hll_distinct exactly
    single = {
        r["g"]: r["est_distinct"]
        for r in hll_distinct(df, F.col("k"), "g").collect()
    }
    assert pq["est_a"] == single["p"] and pq["est_b"] == single["q"]
