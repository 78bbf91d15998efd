"""Property-based fuzzing (hypothesis) of the trickiest semantics:
as-of tie-breaks, EWMA strategy equivalence, interpolation limits, and
histogram binning — each against an independent pandas/numpy oracle on
randomized inputs. Example counts are kept small because every example
is a Spark round trip; the generators bias toward the edges (duplicate
timestamps, NaNs, out-of-range values, tiny/odd lengths)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def _series_with_dup_ts(draw):
    n = draw(st.integers(min_value=2, max_value=40))
    # duplicate-heavy timestamp pool: collisions are the interesting case
    offsets = draw(
        st.lists(st.integers(min_value=0, max_value=n // 2 + 1), min_size=n, max_size=n)
    )
    vals = draw(
        st.lists(
            st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
            min_size=n,
            max_size=n,
        )
    )
    return offsets, vals


@given(data=_series_with_dup_ts(), probe_off=st.integers(min_value=0, max_value=25))
@settings(**SETTINGS)
def test_asof_join_matches_merge_asof(spark, data, probe_off):
    """Backward as-of (incl. equal-ts ties) == pd.merge_asof: the carried
    row among duplicate timestamps is the last in stable (ts, turn_idx)
    order."""
    from sparkfeat.asof import asof_join

    offsets, vals = data
    t0 = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame(
        {
            "conv_id": "c",
            "ts": [t0 + pd.Timedelta(minutes=o) for o in offsets],
            "turn_idx": np.arange(len(offsets), dtype="int32"),
            "v": vals,
        }
    ).sort_values(["ts", "turn_idx"], kind="mergesort")
    pdf["turn_idx"] = np.arange(len(pdf), dtype="int32")  # stable order ids
    probes = pd.DataFrame(
        {"conv_id": ["c"], "probe_ts": [t0 + pd.Timedelta(minutes=probe_off)]}
    )
    got = (
        asof_join(
            spark.createDataFrame(probes),
            spark.createDataFrame(pdf),
            ["v"],
        )
        .toPandas()["v"]
        .iloc[0]
    )
    want = pd.merge_asof(
        probes[["probe_ts"]],
        pdf[["ts", "v"]],
        left_on="probe_ts",
        right_on="ts",
        direction="backward",
    )["v"].iloc[0]
    if pd.isna(want):
        assert pd.isna(got)
    else:
        assert got == want


@given(
    n=st.integers(min_value=1, max_value=200),
    halflife=st.floats(min_value=0.3, max_value=60.0, allow_nan=False),
    chunk=st.integers(min_value=2, max_value=64),
    nan_every=st.integers(min_value=0, max_value=5),
)
@settings(**SETTINGS)
def test_ewma_strategies_agree_with_pandas(spark, n, halflife, chunk, nan_every):
    """All three EWMA strategies == pandas ewm(halflife, adjust=True)
    for random lengths/halflives/chunk sizes, with NaN gaps."""
    from sparkfeat import transforms as T
    from sparkfeat.windows import repartition_sorted

    rng = np.random.default_rng(n * 31 + chunk)
    vals = rng.normal(0, 10, n)
    if nan_every == 1:
        vals[:] = np.nan  # fully-NaN series: W stays 0 ⇒ all-null output
    elif nan_every > 1:
        vals[::nan_every] = np.nan
    pdf = pd.DataFrame(
        {
            "conv_id": "c",
            "turn_idx": np.arange(n, dtype="int32"),
            "ts": pd.date_range("2024-01-01", periods=n, freq="1min"),
            "v": vals,
        }
    )
    df = repartition_sorted(spark.createDataFrame(pdf))
    out = T.ewma(df, "v", halflife, out_col="e_plain")
    out = T.ewma(out, "v", halflife, out_col="e_chunk", chunk_size=chunk)
    out = T.ewma_sorted(out, [("v", halflife, "e_stream")])
    got = out.toPandas().sort_values("turn_idx").reset_index(drop=True)
    want = pdf["v"].ewm(halflife=halflife).mean()
    for col in ("e_plain", "e_chunk", "e_stream"):
        g = got[col].to_numpy()
        w = want.to_numpy()
        mask = ~np.isnan(w)
        np.testing.assert_allclose(g[mask], w[mask], rtol=1e-9, atol=1e-9)
        assert np.isnan(g[~mask]).all()


@given(
    present=st.lists(st.booleans(), min_size=3, max_size=30),
    limit=st.integers(min_value=1, max_value=5),
)
@settings(**SETTINGS)
def test_interpolate_matches_pandas(spark, present, limit):
    """Linear interpolation with forward limit == pandas
    interpolate(method='linear', limit=..., limit_direction='forward',
    limit_area=None) over arbitrary null patterns."""
    from sparkfeat.resample import interpolate

    n = len(present)
    rng = np.random.default_rng(n * 7 + limit)
    vals = [float(rng.normal(50, 5)) if p else None for p in present]
    pdf = pd.DataFrame(
        {
            "conv_id": "c",
            "bucket_ts": pd.date_range("2024-01-01", periods=n, freq="1h"),
            "v": vals,
        }
    )
    got = (
        interpolate(spark.createDataFrame(pdf), ["v"], limit=limit)
        .toPandas()
        .sort_values("bucket_ts")["v_interp"]
        .reset_index(drop=True)
    )
    want = pdf["v"].astype("float64").interpolate(
        method="linear", limit=limit, limit_direction="forward"
    )
    g, w = got.to_numpy(dtype="float64"), want.to_numpy(dtype="float64")
    mask = ~np.isnan(w)
    np.testing.assert_allclose(g[mask], w[mask], rtol=1e-9, atol=1e-9)
    assert np.isnan(g[~mask]).all()


@given(
    vals=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        min_size=4,
        max_size=40,
        unique=True,
    ),
    nbins=st.integers(min_value=2, max_value=7),
    probes=st.lists(
        st.floats(min_value=-500, max_value=500, allow_nan=False),
        min_size=1,
        max_size=8,
    ),
)
@settings(**SETTINGS)
def test_apply_bins_matches_np_histogram(spark, vals, nbins, probes):
    """Fit on random data, apply to random probes: the bin index equals
    np.histogram one-hot semantics for in-range values (right-inclusive
    last bin) and -1 out of range; edges equal np.interp balanced
    quantiles."""
    from sparkfeat.classify import apply_bins, fit_bins

    fit_pdf = pd.DataFrame(
        {"conv_id": "c", "turn_idx": np.arange(len(vals), dtype="int32"), "v": vals}
    )
    fit_df = spark.createDataFrame(fit_pdf)
    bins = fit_bins(fit_df, "v", nbins)
    edges_got = np.array(bins.collect()[0]["edges"])
    s = np.sort(np.asarray(vals, dtype="float64"))
    edges_want = np.interp(
        np.linspace(0, len(s) - 1, nbins + 1), np.arange(len(s)), s
    )
    np.testing.assert_allclose(edges_got, edges_want, rtol=1e-12, atol=1e-12)

    probe_pdf = pd.DataFrame(
        {
            "conv_id": "c",
            "turn_idx": np.arange(len(probes), dtype="int32"),
            "v": probes,
        }
    )
    got = (
        apply_bins(spark.createDataFrame(probe_pdf), bins, "v", nbins, idx_col="b")
        .toPandas()
        .sort_values("turn_idx")["b"]
        .reset_index(drop=True)
    )
    for i, v in enumerate(probes):
        if v < edges_want[0] or v > edges_want[-1]:
            assert got[i] == -1
        else:
            h, _ = np.histogram([v], edges_want)
            assert got[i] == int(np.argmax(h)), (v, edges_want.tolist())


@st.composite
def _vector_batch(draw):
    d = draw(st.integers(min_value=1, max_value=6))
    n = draw(st.integers(min_value=1, max_value=8))
    vals = draw(
        st.lists(
            st.lists(
                st.floats(
                    min_value=-1e6, max_value=1e6, allow_nan=False, width=32
                ),
                min_size=d,
                max_size=d,
            ),
            min_size=n,
            max_size=n,
        )
    )
    return vals


@given(vecs=_vector_batch())
@settings(**SETTINGS)
def test_quantize_int8_error_bound_property(spark, vecs):
    """For ANY float vector (negatives, zeros, huge/tiny magnitudes):
    q fits in int8, dequantization error per element is <= scale/2, and
    an all-zero vector quantizes to null rather than dividing by 0."""
    from sparkfeat.similarity import quantize_int8

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    out = quantize_int8(df).toPandas().sort_values("vec_id")
    for row, v in zip(out.itertuples(), vecs):
        arr = np.asarray(v, dtype=np.float64)
        amax = np.abs(arr).max()
        if amax == 0:
            assert row.q is None
            continue
        scale = amax / 127.0
        q = np.asarray(row.q, dtype=np.float64)
        assert np.abs(q).max() <= 127
        assert np.abs(arr - q * scale).max() <= scale / 2 * (1 + 1e-12)


@given(vecs=_vector_batch())
@settings(**SETTINGS)
def test_pca_roundtrip_property(spark, vecs):
    """Full-rank PCA fit->project->inverse reconstructs ANY corpus
    (degenerate dims, single rows, constant columns included) to
    numerical identity."""
    from sparkfeat.pca import pca_fit, pca_inverse, pca_project

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    d = len(vecs[0])
    fit = pca_fit(df, k=d)
    proj = pca_project(df, fit, out_col="p")
    rec = (
        pca_inverse(proj, fit, proj_col="p", out_col="r")
        .select("vec_id", "r")
        .toPandas()
        .sort_values("vec_id")
    )
    got = np.stack(rec["r"].to_numpy())
    want = np.asarray(vecs, dtype=np.float64)
    scale = max(1.0, np.abs(want).max())
    assert np.abs(got - want).max() <= 1e-7 * scale
