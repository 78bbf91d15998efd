"""Resample-and-fill parity vs pandas resample/ffill/interpolate
(reference semantics: cleaning.py:88-101 label/closed='right',
:221-265 limited ffill, :268-316 linear interpolate)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from sparkfeat.resample import densify, ffill, interpolate, resample
from sparkfeat.schema import with_turn_signals

FREQ = 300  # 5 minutes


def _pandas_resampled(pdf: pd.DataFrame, how: str) -> pd.Series:
    pdf = pdf.copy()
    pdf["text_len"] = pdf["text"].str.len().astype("float64")
    g = (
        pdf.set_index("ts")
        .groupby("conv_id")["text_len"]
        .resample("5min", label="right", closed="right")
    )
    if how == "sum":
        # empty buckets: pandas sum() emits 0.0; the engine emits no row
        # (densify() restores the grid) — min_count=1 aligns the oracle.
        return g.sum(min_count=1)
    return getattr(g, how)()


def _spark_resampled(transcripts, how: str) -> pd.DataFrame:
    df = with_turn_signals(transcripts)
    out = resample(df, FREQ, {"text_len": how})
    return (
        out.toPandas()
        .sort_values(["conv_id", "bucket_ts"])
        .reset_index(drop=True)
    )


def test_resample_agg_parity(transcripts, transcripts_pdf):
    for how in ["mean", "sum", "min", "max", "first", "last", "median"]:
        want = _pandas_resampled(transcripts_pdf, how).dropna().rename("v").reset_index()
        want["ts"] = pd.to_datetime(want["ts"]).dt.tz_localize(None)
        want = want.sort_values(["conv_id", "ts"]).reset_index(drop=True)
        got = _spark_resampled(transcripts, how)
        assert len(got) == len(want), how
        assert (got["conv_id"] == want["conv_id"]).all(), how
        assert (got["bucket_ts"] == want["ts"]).all(), how
        np.testing.assert_allclose(
            got[f"text_len_{how}"].to_numpy(dtype=float),
            want["v"].to_numpy(dtype=float),
            rtol=1e-12,
            err_msg=how,
        )


def test_densify_ffill_parity(transcripts, transcripts_pdf):
    limit = 2
    df = with_turn_signals(transcripts)
    r = resample(df, FREQ, {"text_len": "last"})
    dense = densify(r, FREQ)
    filled = ffill(dense, ["text_len_last"], limit=limit)
    got = (
        filled.toPandas().sort_values(["conv_id", "bucket_ts"]).reset_index(drop=True)
    )

    want = _pandas_resampled(transcripts_pdf, "last")  # full grid incl. NaN buckets
    want_filled = want.groupby(level=0).ffill(limit=limit)
    w = want_filled.rename("v").reset_index()
    w["ts"] = pd.to_datetime(w["ts"]).dt.tz_localize(None)
    w = w.sort_values(["conv_id", "ts"]).reset_index(drop=True)
    assert len(got) == len(w)
    assert (got["bucket_ts"] == w["ts"]).all()
    g = got["text_len_last_filled"].to_numpy(dtype=float)
    v = w["v"].to_numpy(dtype=float)
    assert np.array_equal(np.isnan(g), np.isnan(v))
    np.testing.assert_allclose(g[~np.isnan(v)], v[~np.isnan(v)], rtol=1e-12)


def test_interpolate_parity(transcripts, transcripts_pdf):
    for limit in [None, 1, 3]:
        df = with_turn_signals(transcripts)
        r = resample(df, FREQ, {"text_len": "mean"})
        dense = densify(r, FREQ)
        got = (
            interpolate(dense, ["text_len_mean"], limit=limit)
            .toPandas()
            .sort_values(["conv_id", "bucket_ts"])
            .reset_index(drop=True)
        )
        want = _pandas_resampled(transcripts_pdf, "mean")
        w = (
            want.groupby(level=0)
            .apply(
                lambda s: s.reset_index(level=0, drop=True).interpolate(
                    method="linear", limit=limit, limit_direction="forward"
                )
            )
            .rename("v")
            .reset_index()
        )
        w["ts"] = pd.to_datetime(w["ts"]).dt.tz_localize(None)
        w = w.sort_values(["conv_id", "ts"]).reset_index(drop=True)
        assert len(got) == len(w), limit
        g = got["text_len_mean_interp"].to_numpy(dtype=float)
        v = w["v"].to_numpy(dtype=float)
        assert np.array_equal(np.isnan(g), np.isnan(v)), f"limit={limit}"
        np.testing.assert_allclose(g[~np.isnan(v)], v[~np.isnan(v)], rtol=1e-12)


def test_drop_nan_entities_after_fill(spark):
    """fill_gaps(dropna=True) semantics: entities still containing NaN
    after the limited fill are dropped entirely (cleaning.py:246-250)."""
    import pandas as pd

    from sparkfeat.resample import drop_nan_entities, ffill

    rows = pd.DataFrame(
        {
            "conv_id": ["a"] * 4 + ["b"] * 4,
            "bucket_ts": list(pd.date_range("2024-01-01", periods=4, freq="1h")) * 2,
            "v": [1.0, None, 3.0, 4.0, 1.0, None, None, None],  # b: gap > limit
        }
    )
    df = ffill(spark.createDataFrame(rows), ["v"], limit=1)
    out = drop_nan_entities(df, ["v_filled"])
    kept = {r["conv_id"] for r in out.select("conv_id").distinct().collect()}
    assert kept == {"a"}
    assert out.count() == 4
