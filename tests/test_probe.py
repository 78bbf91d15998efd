"""In-plan closed-form linear probe (sparkfeat/probe.py): weights must
equal the numpy ridge solution computed from the SAME 6dp-rounded
moments; scoring must separate a planted signal; the plan must stay
map-only on the scored side."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from sparkfeat.probe import linear_probe_fit, linear_probe_score


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, x1 double, x2 double, y double")


def _numpy_fit(rows, ridge=1e-3):
    """The definitional ridge solve on the same rounded moments."""
    x1 = np.array([r[1] for r in rows])
    x2 = np.array([r[2] for r in rows])
    y = np.array([r[3] for r in rows])
    n = float(len(rows))
    m = [
        n,
        x1.sum(),
        x2.sum(),
        (x1 * x1).sum(),
        (x1 * x2).sum(),
        (x2 * x2).sum(),
        y.sum(),
        (x1 * y).sum(),
        (x2 * y).sum(),
    ]
    n, s1, s2, s11, s12, s22, sy, sy1, sy2 = [round(v, 6) for v in m]
    A = np.array(
        [
            [n + ridge, s1, s2],
            [s1, s11 + ridge, s12],
            [s2, s12, s22 + ridge],
        ]
    )
    b = np.array([sy, sy1, sy2])
    return np.linalg.solve(A, b)


def test_probe_fit_matches_numpy_ridge(spark):
    rng = np.random.RandomState(7)
    rows = []
    for i in range(500):
        x1, x2 = float(rng.rand()), float(rng.rand())
        y = float(0.3 + 1.5 * x1 - 0.8 * x2 + 0.05 * rng.randn())
        rows.append((i, x1, x2, y))
    w = linear_probe_fit(
        _df(spark, rows), F.col("x1"), F.col("x2"), F.col("y"), F.lit(True)
    ).collect()[0]
    expect = _numpy_fit(rows)
    assert w["n_seed"] == 500
    assert w["w0"] == pytest.approx(expect[0], abs=1e-6)
    assert w["w1"] == pytest.approx(expect[1], abs=1e-6)
    assert w["w2"] == pytest.approx(expect[2], abs=1e-6)
    # recovers the generating coefficients to noise level
    assert w["w1"] == pytest.approx(1.5, abs=0.1)
    assert w["w2"] == pytest.approx(-0.8, abs=0.1)


def test_probe_fit_uses_only_seed_rows(spark):
    """Rows outside the seed must not influence the fit: poison the
    non-seed slice with an inverted relationship."""
    rows = [(i, i / 100.0, 0.0, i / 100.0) for i in range(100)]  # y = x1
    poison = [(1000 + i, i / 100.0, 0.0, -i / 100.0) for i in range(100)]
    w = linear_probe_fit(
        _df(spark, rows + poison),
        F.col("x1"),
        F.col("x2"),
        F.col("y"),
        F.col("doc_id") < 1000,
    ).collect()[0]
    assert w["n_seed"] == 100
    assert w["w1"] == pytest.approx(1.0, abs=0.01)


def test_probe_score_separates_planted_signal(spark):
    """Fit on half, score all: the scored classes separate (mean score
    of label-1 rows well above label-0 rows, including NON-seed rows
    the fit never saw)."""
    rng = np.random.RandomState(3)
    rows = []
    for i in range(800):
        y = float(i % 2)
        x1 = float(0.6 * y + 0.2 * rng.rand())
        x2 = float(rng.rand())
        rows.append((i, x1, x2, y))
    out = linear_probe_score(
        _df(spark, rows),
        F.col("x1"),
        F.col("x2"),
        F.col("y"),
        F.col("doc_id") < 400,
    ).collect()
    hold = [r for r in out if r["doc_id"] >= 400]
    m1 = np.mean([r["score"] for r in hold if r["y"] == 1.0])
    m0 = np.mean([r["score"] for r in hold if r["y"] == 0.0])
    assert m1 - m0 > 0.5
    # weights are constant columns
    assert len({(r["w0"], r["w1"], r["w2"]) for r in out}) == 1


def test_probe_plan_broadcast_map_only(spark):
    """The weights come back as a broadcast one-row join; the scored
    corpus side has no sort-merge join, no cartesian of corpus rows, no
    exchange besides the fit aggregate's."""
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        F.col("text").isNotNull()
    )
    from sparkfeat import text as X

    out = linear_probe_score(
        d,
        X.stopword_ratio("text"),
        F.least(X.avg_word_len("text") / 8.0, F.lit(1.0)),
        (F.col("lang") == "en").cast("double"),
        F.lit(True),
    )
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p
    assert "rangepartitioning" not in p.lower(), p
