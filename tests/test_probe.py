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


# ------------------------------------------------------ logistic IRLS


def _np_irls(x1, x2, y, n_iter=4, lam=1e-3):
    """Independent numpy IRLS with the engine's exact canonicalization
    points (moments 6dp before each solve, weights 9dp after)."""
    import numpy as np

    X = np.column_stack([np.ones_like(x1), x1, x2])
    w = np.zeros(3)
    for _ in range(n_iter):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        s = p * (1 - p)
        H = np.round((X * s[:, None]).T @ X, 6) + lam * np.eye(3)
        g = np.round(X.T @ (y - p), 6) - lam * w
        # engine rounds the nine moment SUMS, not the matrix: redo
        # entries individually to match exactly
        h00 = round(float(np.sum(s)), 6) + lam
        h01 = round(float(np.sum(s * x1)), 6)
        h02 = round(float(np.sum(s * x2)), 6)
        h11 = round(float(np.sum(s * x1 * x1)), 6) + lam
        h12 = round(float(np.sum(s * x1 * x2)), 6)
        h22 = round(float(np.sum(s * x2 * x2)), 6) + lam
        H = np.array([[h00, h01, h02], [h01, h11, h12], [h02, h12, h22]])
        g = np.array(
            [
                round(float(np.sum(y - p)), 6) - lam * w[0],
                round(float(np.sum((y - p) * x1)), 6) - lam * w[1],
                round(float(np.sum((y - p) * x2)), 6) - lam * w[2],
            ]
        )
        if np.linalg.det(H) != 0:
            w = np.round(w + np.linalg.solve(H, g), 9)
    return w


def test_logistic_fit_matches_numpy_irls(spark):
    import numpy as np

    from sparkfeat.probe import logistic_fit

    rng = [(i, (i * 37) % 100 / 100.0, ((i * 61) % 100) / 100.0) for i in range(300)]
    rows = [
        (i, a, b, 1.0 if (2.0 * a - 1.5 * b - 0.2 + ((i * 13) % 7 - 3) * 0.05) > 0 else 0.0)
        for i, a, b in rng
    ]
    df = spark.createDataFrame(rows, "id long, x1 double, x2 double, y double")
    got = logistic_fit(
        df, F.col("x1"), F.col("x2"), F.col("y"), F.lit(True), n_iter=4
    ).collect()[0]
    x1 = np.array([r[1] for r in rows])
    x2 = np.array([r[2] for r in rows])
    y = np.array([r[3] for r in rows])
    want = _np_irls(x1, x2, y, n_iter=4)
    # identical canonicalization points -> agreement far below the 9dp
    # rounding grain (Cramer vs np.linalg.solve differ only in ulps)
    assert got["w0"] == pytest.approx(want[0], abs=1e-6)
    assert got["w1"] == pytest.approx(want[1], abs=1e-6)
    assert got["w2"] == pytest.approx(want[2], abs=1e-6)
    # the planted direction is recovered
    assert got["w1"] > 0 and got["w2"] < 0


def test_logistic_beats_linear_probe_on_log_loss(spark):
    """The point of the upgrade: on a genuinely logistic-shaped
    planted problem the calibrated sigmoid must have strictly lower
    log-loss than the clipped linear-least-squares probe (whose
    predictions are not probabilities). The driver-testdata labels are
    nearly feature-independent, so this pin uses the planted stream."""
    from sparkfeat.probe import linear_probe_score, logistic_score

    rows = [
        (
            i,
            (i * 37) % 100 / 100.0,
            ((i * 61) % 100) / 100.0,
            1.0
            if (
                4.0 * ((i * 37) % 100 / 100.0)
                - 3.0 * (((i * 61) % 100) / 100.0)
                - 0.5
                + ((i * 13) % 7 - 3) * 0.1
            )
            > 0
            else 0.0,
        )
        for i in range(400)
    ]
    docs = spark.createDataFrame(rows, "id long, x1 double, x2 double, y double")
    x1, x2 = F.col("x1"), F.col("x2")
    label = F.col("y")
    seed = F.lit(True)
    lin = linear_probe_score(docs, x1, x2, label, seed).withColumn("_y", label)
    log = logistic_score(docs, x1, x2, label, seed, n_iter=6).withColumn(
        "_y", label
    )

    def loss(df, col, clip=True):
        p = F.col(col)
        if clip:
            p = F.least(F.greatest(p, F.lit(1e-6)), F.lit(1.0 - 1e-6))
        ll = -(F.col("_y") * F.log(p) + (1 - F.col("_y")) * F.log(1 - p))
        return df.agg(F.avg(ll)).collect()[0][0]

    assert loss(log, "p_hat") < loss(lin, "score")


def test_logistic_singular_guard_keeps_iterate(spark):
    """A seed whose features are constant makes H singular beyond the
    ridge; the fit must return finite weights, not NaN."""
    import math

    from sparkfeat.probe import logistic_fit

    df = spark.createDataFrame(
        [(i, 0.5, 0.5, float(i % 2)) for i in range(20)],
        "id long, x1 double, x2 double, y double",
    )
    w = logistic_fit(
        df, F.col("x1"), F.col("x2"), F.col("y"), F.lit(True), n_iter=3
    ).collect()[0]
    assert all(
        v is not None and not math.isnan(v) for v in (w["w0"], w["w1"], w["w2"])
    )
