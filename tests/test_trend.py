"""rolling_slope (sparkfeat/transforms.py): numpy-polyfit parity on a
pandas replay, exact slope on a synthetic linear signal, sign on
monotone signals, min_periods gating, null-y handling, and the
no-extra-exchange plan shape."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pyspark.sql.functions as F
import pytest

from sparkfeat.transforms import rolling_slope


def _df(spark, ys):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("a", i, None if y is None else float(y), t0 + dt.timedelta(minutes=i))
        for i, y in enumerate(ys)
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, y double, ts timestamp"
    )


def _slopes(spark, ys, window=4, min_periods=3):
    df = _df(spark, ys).select(
        "turn_idx",
        F.round(rolling_slope("y", window, min_periods), 6).alias("s"),
    )
    return {r["turn_idx"]: r["s"] for r in df.collect()}


def test_exact_linear_signal(spark):
    # y = 3x + 1 → slope exactly 3 once min_periods rows are in frame
    got = _slopes(spark, [3 * i + 1 for i in range(10)])
    assert got[0] is None and got[1] is None  # n < min_periods
    for i in range(2, 10):
        assert got[i] == pytest.approx(3.0, abs=1e-9), i


def test_matches_numpy_polyfit(spark):
    rng = np.random.default_rng(3)
    ys = list(np.round(rng.uniform(0, 100, 30)))
    got = _slopes(spark, ys, window=5, min_periods=3)
    for i in range(2, 30):
        lo = max(0, i - 4)
        xs = np.arange(lo, i + 1, dtype=float)
        want = np.polyfit(xs, np.array(ys[lo : i + 1], dtype=float), 1)[0]
        assert got[i] == pytest.approx(want, abs=1e-6), i


def test_null_y_rows_excluded_consistently(spark):
    # the null row must drop out of BOTH x- and y-moments
    got = _slopes(spark, [0.0, None, 2.0, 4.0, 6.0], window=5, min_periods=3)
    assert got[1] is None  # frame {0.0, None} has 1 non-null < min_periods
    # at idx 3 the frame holds y=(0,2,4) at x=(1,3,4) → polyfit slope
    xs, ys = np.array([1.0, 3.0, 4.0]), np.array([0.0, 2.0, 4.0])
    want = np.polyfit(xs, ys, 1)[0]
    assert got[3] == pytest.approx(want, abs=1e-6)


def test_sign_on_monotone_signals(spark):
    up = _slopes(spark, [1, 2, 4, 8, 16, 32])
    dn = _slopes(spark, [32, 16, 8, 4, 2, 1])
    assert all(v > 0 for k, v in up.items() if v is not None)
    assert all(v < 0 for k, v in dn.items() if v is not None)


def test_no_extra_exchange(transcripts):
    """Stacking the trend slope on the other transforms must not add
    an exchange beyond the single conv_id hash partition."""
    import re

    from sparkfeat.schema import with_turn_signals

    sig = with_turn_signals(transcripts)
    out = sig.select(
        "conv_id",
        "turn_idx",
        rolling_slope("text_len", 6).alias("trend"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_rolling_corr_matches_pandas(spark):
    """rolling_corr == pandas rolling(...).corr on a seeded frame,
    incl. pairwise-null handling and the perfect +/-1 edges."""
    import pandas as pd

    from sparkfeat.transforms import rolling_corr

    rng = np.random.default_rng(5)
    n = 40
    xs = [float(v) for v in np.round(rng.uniform(0, 50, n))]
    ys = [x * 2 + float(np.round(rng.uniform(0, 20))) for x in xs]
    xs[7], ys[13] = None, None  # pairwise-complete drops
    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            ("a", i, xs[i], ys[i], t0 + dt.timedelta(minutes=i))
            for i in range(n)
        ],
        "conv_id string, turn_idx int, x double, y double, ts timestamp",
    )
    got = {
        r["turn_idx"]: r["c"]
        for r in df.select(
            "turn_idx", F.round(rolling_corr("x", "y", 6), 6).alias("c")
        ).collect()
    }
    pdf = pd.DataFrame({"x": xs, "y": ys}, dtype=float)
    # pandas rolling corr uses pairwise-complete rows the same way
    want = pdf["x"].rolling(6, min_periods=3).corr(pdf["y"])
    for i in range(n):
        w = want.iloc[i]
        if pd.isna(w) or got[i] is None:
            assert pd.isna(w) and got[i] is None, i
        else:
            assert got[i] == pytest.approx(w, abs=2e-6), i


def test_rolling_autocorr_matches_pandas(spark):
    """rolling_autocorr(lag=k) == pandas rolling corr against the
    k-shifted series (the textbook windowed ACF), incl. the null head
    each conversation gets from the lag."""
    import pandas as pd

    from sparkfeat.transforms import rolling_autocorr

    rng = np.random.default_rng(11)
    n = 50
    # AR(1)-ish signal so the ACF is meaningfully nonzero
    ys = [50.0]
    for _ in range(n - 1):
        ys.append(float(np.round(0.8 * ys[-1] + rng.uniform(0, 20))))
    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("a", i, ys[i], t0 + dt.timedelta(minutes=i)) for i in range(n)],
        "conv_id string, turn_idx int, y double, ts timestamp",
    )
    for lag in (1, 2):
        got = {
            r["turn_idx"]: r["c"]
            for r in df.select(
                "turn_idx",
                F.round(rolling_autocorr("y", lag, 8), 6).alias("c"),
            ).collect()
        }
        s = pd.Series(ys)
        want = s.rolling(8, min_periods=3).corr(s.shift(lag))
        for i in range(n):
            w = want.iloc[i]
            if pd.isna(w) or got[i] is None:
                assert pd.isna(w) and got[i] is None, (lag, i)
            else:
                assert got[i] == pytest.approx(w, abs=2e-6), (lag, i)


def test_rolling_autocorr_perfect_on_linear(spark):
    """A strictly linear signal has lag-k autocorrelation exactly 1."""
    from sparkfeat.transforms import rolling_autocorr

    df = _df(spark, [2.0 * i + 1 for i in range(12)])
    got = {
        r["turn_idx"]: r["c"]
        for r in df.select(
            "turn_idx", F.round(rolling_autocorr("y", 1, 6), 6).alias("c")
        ).collect()
    }
    assert got[0] is None and got[1] is None and got[2] is None
    for i in range(3, 12):
        assert got[i] == pytest.approx(1.0, abs=1e-9), i


def test_rolling_corr_sign_and_degenerate(spark):
    from sparkfeat.transforms import rolling_corr

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # y = -x → corr -1; then a constant-x stretch → null (zero var)
        ("a", i, float(i), float(-i), t0 + dt.timedelta(minutes=i))
        for i in range(6)
    ] + [
        ("b", i, 5.0, float(i), t0 + dt.timedelta(minutes=i))
        for i in range(6)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, x double, y double, ts timestamp"
    )
    got = {
        (r["conv_id"], r["turn_idx"]): r["c"]
        for r in df.select(
            "conv_id", "turn_idx", F.round(rolling_corr("x", "y", 6), 6).alias("c")
        ).collect()
    }
    assert got[("a", 5)] == pytest.approx(-1.0, abs=1e-9)
    assert all(got[("b", i)] is None for i in range(6))  # zero x-variance
