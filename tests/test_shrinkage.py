"""shrink_group_means (sparkfeat/probe.py): the James–Stein
direction-of-pull invariants (sparse groups shrink harder than dense
ones, every shrunk mean lies between the raw mean and the grand mean),
numpy parity of the variance components on identical rounded moments,
the tau²=0 collapse, degenerate-input safety, and laziness."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from sparkfeat.probe import shrink_group_means


def _panel(spark):
    """3 dense groups with distinct means + 1 sparse outlier group."""
    rng = np.random.default_rng(7)
    rows = []
    for src, mu, n in [("a", 0.20, 200), ("b", 0.50, 200), ("c", 0.80, 200)]:
        for v in rng.normal(mu, 0.05, n):
            rows.append((src, float(np.clip(v, 0.0, 1.0))))
    # sparse group with an extreme raw mean — the shrinkage target
    rows += [("tiny", 0.99), ("tiny", 0.97)]
    return spark.createDataFrame(rows, "source string, v double")


def _by(df):
    return {r["source"]: r.asDict() for r in df.collect()}


def _np_reference(rows):
    """Reference variance components from the SAME rounded per-group
    sums the operator aggregates (one-way ANOVA method of moments)."""
    groups = {}
    for s, v in rows:
        groups.setdefault(s, []).append(v)
    n = {s: len(vs) for s, vs in groups.items()}
    s1 = {s: round(sum(vs), 6) for s, vs in groups.items()}
    s2 = {s: round(sum(v * v for v in vs), 6) for s, vs in groups.items()}
    k, N = len(groups), sum(n.values())
    S = round(sum(s1.values()), 6)
    ssw = round(sum(s2[s] - s1[s] ** 2 / n[s] for s in groups), 6)
    q = round(sum(s1[s] ** 2 / n[s] for s in groups), 6)
    mu = S / N
    msw = ssw / (N - k)
    msb = (q - S * S / N) / (k - 1)
    n0 = (N - sum(x * x for x in n.values()) / N) / (k - 1)
    tau2 = max(0.0, (msb - msw) / n0)
    out = {}
    for s in groups:
        b = tau2 / (tau2 + msw / n[s])
        m = s1[s] / n[s]
        out[s] = {
            "mean_raw": round(m, 6),
            "shrink_b": round(b, 6),
            "mean_shrunk": round(mu + b * (m - mu), 6),
            "grand_mean": round(mu, 6),
        }
    return out


def test_matches_numpy_reference(spark):
    df = _panel(spark)
    rows = [(r["source"], r["v"]) for r in df.collect()]
    want = _np_reference(rows)
    got = _by(shrink_group_means(df, F.col("v")))
    assert set(got) == set(want)
    for s in want:
        for key, val in want[s].items():
            assert got[s][key] == pytest.approx(val, abs=2e-6), (s, key)


def test_sparse_group_shrinks_harder_and_stays_between(spark):
    got = _by(shrink_group_means(_panel(spark), F.col("v")))
    mu = got["a"]["grand_mean"]
    # shrink factor is monotone in n: the 2-doc group pulls in hardest
    assert got["tiny"]["shrink_b"] < got["a"]["shrink_b"]
    # dense groups with real signal keep most of it
    assert got["a"]["shrink_b"] > 0.9
    for s, r in got.items():
        lo, hi = sorted((r["mean_raw"], mu))
        assert lo - 1e-6 <= r["mean_shrunk"] <= hi + 1e-6, s
    # the outlier moved toward the mean by a visible amount
    assert got["tiny"]["mean_shrunk"] < got["tiny"]["mean_raw"] - 0.005


def test_no_between_variance_collapses_to_grand_mean(spark):
    """All group means identical (constant value) → tau²=0 → every
    group reports the grand mean exactly (B coalesces to 0 even though
    msw is 0/undefined)."""
    rows = [("a", 0.5)] * 10 + [("b", 0.5)] * 3 + [("c", 0.5)] * 7
    df = spark.createDataFrame(rows, "source string, v double")
    got = _by(shrink_group_means(df, F.col("v")))
    for r in got.values():
        assert r["shrink_b"] == 0.0
        assert r["mean_shrunk"] == r["grand_mean"] == 0.5


def test_degenerate_inputs_do_not_crash(spark):
    # single group: msb undefined → B=0, mean_shrunk = grand mean
    one = spark.createDataFrame(
        [("a", 0.1), ("a", 0.9)], "source string, v double"
    )
    got = _by(shrink_group_means(one, F.col("v")))
    assert got["a"]["shrink_b"] == 0.0
    assert got["a"]["mean_shrunk"] == got["a"]["grand_mean"]
    # all singletons: msw undefined → B coalesces to 0
    single = spark.createDataFrame(
        [("a", 0.1), ("b", 0.9)], "source string, v double"
    )
    got = _by(shrink_group_means(single, F.col("v")))
    assert all(r["shrink_b"] == 0.0 for r in got.values())


def test_build_is_lazy(spark):
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup() or [])
    shrink_group_means(_panel(spark), F.col("v"))
    after = len(tracker.getJobIdsForGroup() or [])
    assert before == after
