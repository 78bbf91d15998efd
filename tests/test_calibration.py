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


# ---------------------------------------------------------------------------
# rank_auc — exact tie-corrected Mann–Whitney ROC-AUC
# ---------------------------------------------------------------------------


def _py_auc(scores, labels):
    """Average-rank AUC reference: U statistic with half-credit ties."""
    pos = [s for s, y in zip(scores, labels) if y == 1]
    neg = [s for s, y in zip(scores, labels) if y == 0]
    u = sum(
        (1.0 if p > n else 0.5 if p == n else 0.0) for p in pos for n in neg
    )
    return u / (len(pos) * len(neg))


def _auc_row(spark, scores, labels):
    from sparkfeat.probe import rank_auc

    df = spark.createDataFrame(
        list(zip([float(s) for s in scores], [float(y) for y in labels])),
        "s double, y double",
    )
    return rank_auc(df, F.col("s"), F.col("y")).collect()[0]


def test_auc_matches_pairwise_reference(spark):
    import numpy as np

    rng = np.random.default_rng(23)
    labels = [int(v) for v in rng.integers(0, 2, 300)]
    # informative but noisy score, rounded to force real ties
    scores = [
        float(round(y * 0.6 + v, 1))
        for y, v in zip(labels, rng.normal(0, 0.8, 300))
    ]
    row = _auc_row(spark, scores, labels)
    assert row.n_pos == sum(labels)
    assert row.n_neg == 300 - sum(labels)
    assert abs(row.auc - round(_py_auc(scores, labels), 6)) < 1e-12
    assert abs(row.gini - round(2 * _py_auc(scores, labels) - 1, 6)) < 1e-6


def test_auc_perfect_inverted_random(spark):
    # perfect separation
    assert _auc_row(spark, [1, 2, 3, 4], [0, 0, 1, 1]).auc == 1.0
    # perfectly inverted
    assert _auc_row(spark, [4, 3, 2, 1], [0, 0, 1, 1]).auc == 0.0
    # constant score: every pos-neg pair is a tie -> 0.5 exactly
    row = _auc_row(spark, [7, 7, 7, 7], [0, 1, 0, 1])
    assert row.auc == 0.5 and row.gini == 0.0 and row.n_scores == 1


def test_auc_single_class_is_null(spark):
    row = _auc_row(spark, [1, 2, 3], [1, 1, 1])
    assert row.n_neg == 0 and row.auc is None and row.gini is None


# ---------------------------------------------------------------------------
# mi_table — binned mutual information feature-relevance audit
# ---------------------------------------------------------------------------


def _py_mi(xs, ys, n_bins=10):
    """Numpy-free reference: same binning, exact-count MI in nats."""
    import math

    lo, hi = round(min(xs), 6), round(max(xs), 6)
    width = (hi - lo) / n_bins if hi > lo else None

    def bucket(v):
        if width is None:
            return 0
        return max(0, min(n_bins - 1, math.floor((v - lo) / width)))

    from collections import Counter

    cells = Counter((bucket(x), y) for x, y in zip(xs, ys))
    n = sum(cells.values())
    cb = Counter()
    cl = Counter()
    for (b, y), c in cells.items():
        cb[b] += c
        cl[y] += c
    mi = sum(
        round((c / n) * math.log((n * c) / (cb[b] * cl[y])), 6)
        for (b, y), c in cells.items()
    )
    hl = sum(round((c / n) * math.log(n / c), 6) for c in cl.values())
    return round(mi, 6), round(hl, 6)


def _mi_rows(spark, xs, ys):
    from sparkfeat.probe import mi_table

    df = spark.createDataFrame(
        list(zip([float(x) for x in xs], [float(y) for y in ys])),
        "x double, y double",
    )
    return mi_table(df, F.col("x"), F.col("y")).collect()


def test_mi_matches_python_reference(spark):
    import numpy as np

    rng = np.random.default_rng(31)
    ys = [int(v) for v in rng.integers(0, 2, 400)]
    # label-dependent location shift => positive MI
    xs = [float(round(y * 0.8 + v, 2)) for y, v in zip(ys, rng.normal(0, 1, 400))]
    rows = _mi_rows(spark, xs, ys)
    mi, hl = _py_mi(xs, ys)
    assert rows[0].mi_nats == mi and rows[0].h_label == hl
    assert rows[0].mi_nats > 0.05
    # cell probabilities are a distribution
    assert abs(sum(r.p_cell for r in rows) - 1.0) < 1e-4


def test_mi_independent_near_zero_and_deterministic_near_entropy(spark):
    # independent: feature cycles independently of the label
    xs = [float(i % 10) for i in range(400)]
    ys = [(i // 10) % 2 for i in range(400)]
    ind = _mi_rows(spark, xs, ys)[0]
    assert abs(ind.mi_nats) < 0.01
    # deterministic: label is a function of the bin -> MI == H_label
    xs2 = [0.0] * 100 + [9.0] * 300
    ys2 = [0] * 100 + [1] * 300
    det = _mi_rows(spark, xs2, ys2)[0]
    assert abs(det.mi_nats - det.h_label) < 1e-6
    # bins and labels induce the SAME partition -> perfect NMI
    assert det.nmi == 1.0


def test_mi_constant_feature_zero_info(spark):
    rows = _mi_rows(spark, [5.0] * 40, [0, 1] * 20)
    assert len(rows) == 2  # one bin x two labels
    r = rows[0]
    assert r.mi_nats == 0.0 and r.h_bin == 0.0 and r.nmi is None
