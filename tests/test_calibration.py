"""calibration_table (sparkfeat/probe.py): a perfectly calibrated
scorer gets ECE ~0, a systematically biased one gets ECE ~ its bias,
bin edges partition [lo, hi], counts conserve rows, the constant-score
degenerate input lands in bin 0, and the build is lazy."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from sparkfeat.probe import calibration_table


def _scored(spark, bias: float = 0.0, n: int = 4000):
    """Rows whose label is Bernoulli(score): calibrated when bias=0;
    adding bias to the reported score breaks calibration by ~bias."""
    rng = np.random.default_rng(11)
    s = rng.uniform(0.05, 0.95, n)
    y = (rng.uniform(0, 1, n) < s).astype(float)
    rows = [(float(min(1.0, si + bias)), float(yi)) for si, yi in zip(s, y)]
    return spark.createDataFrame(rows, "score double, y double")


def test_calibrated_scorer_has_low_ece(spark):
    out = calibration_table(
        _scored(spark), F.col("score"), F.col("y")
    ).collect()
    assert out[0]["ece"] < 0.05
    # conservation: every input row lands in exactly one bin
    assert sum(r["n_docs"] for r in out) == 4000
    # reliability: within each decently-populated bin the positive
    # rate tracks the mean score
    for r in out:
        if r["n_docs"] >= 200:
            assert abs(r["frac_pos"] - r["mean_score"]) < 0.1, r


def test_biased_scorer_ece_reflects_bias(spark):
    lo = calibration_table(_scored(spark), F.col("score"), F.col("y"))
    hi = calibration_table(
        _scored(spark, bias=0.25), F.col("score"), F.col("y")
    )
    e_lo = lo.first()["ece"]
    e_hi = hi.first()["ece"]
    assert e_hi > e_lo + 0.1
    assert e_hi == pytest.approx(0.25, abs=0.08)


def test_bin_edges_partition_range(spark):
    out = sorted(
        calibration_table(_scored(spark), F.col("score"), F.col("y")).collect(),
        key=lambda r: r["bin"],
    )
    assert [r["bin"] for r in out] == list(range(10))
    for a, b in zip(out, out[1:]):
        assert b["bin_lo"] == pytest.approx(a["bin_hi"], abs=2e-6)
    # every bin's mean score lies inside its edges
    for r in out:
        assert r["bin_lo"] - 1e-6 <= r["mean_score"] <= r["bin_hi"] + 1e-6


def test_constant_score_degenerate(spark):
    df = spark.createDataFrame(
        [(0.5, 1.0), (0.5, 0.0), (0.5, 1.0)], "score double, y double"
    )
    out = calibration_table(df, F.col("score"), F.col("y")).collect()
    assert len(out) == 1 and out[0]["bin"] == 0 and out[0]["n_docs"] == 3
    assert out[0]["mean_score"] == 0.5


def test_build_is_lazy(spark):
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup() or [])
    calibration_table(_scored(spark), F.col("score"), F.col("y"))
    after = len(tracker.getJobIdsForGroup() or [])
    assert before == after
