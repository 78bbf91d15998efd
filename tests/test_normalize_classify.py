"""Normalization + classification fit/apply parity vs numpy oracles
(reference: sklearn scaler formulas feature/features/financial.py:68-82,
bin math classifier.py:56-134, one-hot financial.py:305-328)."""

from __future__ import annotations

import statistics

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparkfeat.classify import apply_bins, fit_bins
from sparkfeat.normalize import _acklam_ndtri, apply_scaler, fit_stats, gaussian_scale
from sparkfeat.schema import with_turn_signals


@pytest.fixture(scope="module")
def sig(transcripts):
    return with_turn_signals(transcripts).cache()


@pytest.fixture(scope="module")
def sig_pdf(transcripts_pdf):
    pdf = transcripts_pdf.copy()
    pdf["text_len"] = pdf["text"].str.len().astype("float64")
    return pdf.sort_values(["conv_id", "ts", "turn_idx"]).reset_index(drop=True)


def _collect(df, col):
    out = (
        df.select("conv_id", "turn_idx", col)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    return out[col].to_numpy(dtype="float64")


@pytest.mark.parametrize("method", ["standard", "min_max", "robust"])
def test_scaler_parity(sig, sig_pdf, method):
    stats = fit_stats(sig, "text_len")
    got = _collect(apply_scaler(sig, stats, "text_len", method), f"text_len_{method}")

    def oracle(s: pd.Series) -> pd.Series:
        x = s.to_numpy()
        if method == "standard":
            return (s - x.mean()) / x.std(ddof=0)
        if method == "min_max":
            return (s - x.min()) / (x.max() - x.min())
        q25, q50, q75 = np.quantile(x, [0.25, 0.5, 0.75])
        return (s - q50) / (q75 - q25)

    want = sig_pdf.groupby("conv_id")["text_len"].transform(oracle).to_numpy()
    mask = ~np.isnan(want)  # constant groups → engine null, numpy inf/nan
    np.testing.assert_allclose(got[mask], want[mask], rtol=1e-12)


def test_mad_z_parity(sig, sig_pdf):
    """fit_mad/apply_mad_z == the numpy modified z-score
    (0.6745·(x − median)/median(|x − median|), Iglewicz–Hoaglin) per
    conversation, and the flag fires exactly where |z| > 3.5."""
    from sparkfeat.normalize import MAD_CONSISTENCY, apply_mad_z, fit_mad

    out = (
        apply_mad_z(sig, fit_mad(sig, "text_len"), "text_len")
        .select("conv_id", "turn_idx", "mad_z", "is_outlier")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )

    def oracle(s: pd.Series) -> pd.Series:
        med = np.median(s.to_numpy())
        mad = np.median(np.abs(s.to_numpy() - med))
        if mad == 0:
            return pd.Series(np.nan, index=s.index)
        return MAD_CONSISTENCY * (s - med) / mad

    want = sig_pdf.groupby("conv_id")["text_len"].transform(oracle).to_numpy()
    got = out["mad_z"].to_numpy(dtype="float64")
    mask = ~np.isnan(want)
    np.testing.assert_allclose(got[mask], want[mask], rtol=1e-12)
    assert not np.isnan(want).any() or np.isnan(got[np.isnan(want)]).all()
    flag = out["is_outlier"].to_numpy()
    np.testing.assert_array_equal(
        flag[mask].astype(bool), np.abs(want[mask]) > 3.5
    )


def test_mad_zero_scale_and_unseen_entity(spark):
    """Constant series → MAD 0 → null z (house zero-scale convention);
    an entity absent from the fit passes through with null z (LEFT
    join), never silently dropped."""
    from sparkfeat.normalize import apply_mad_z, fit_mad

    df = spark.createDataFrame(
        [("a", i, 5.0) for i in range(4)] + [("b", 0, 1.0), ("b", 1, 9.0)],
        "conv_id string, turn_idx int, v double",
    )
    stats = fit_mad(df.filter(F.col("conv_id") == "a"), "v")
    out = apply_mad_z(df, stats, "v").toPandas()
    assert len(out) == 6  # row-preserving
    assert out[out.conv_id == "a"]["mad_z"].isna().all()  # MAD 0 → null
    assert out[out.conv_id == "b"]["mad_z"].isna().all()  # unseen → null


def test_scaler_invariants(sig):
    stats = fit_stats(sig, "text_len")
    out = apply_scaler(sig, stats, "text_len", "standard")
    agg = (
        out.groupBy("conv_id")
        .agg(
            F.avg("text_len_standard").alias("m"),
            F.stddev_pop("text_len_standard").alias("s"),
            F.count("text_len_standard").alias("n"),
        )
        .filter(F.col("n") > 1)  # zero-scale (1-turn) convs are null by design
        .toPandas()
    )
    np.testing.assert_allclose(agg["m"], 0.0, atol=1e-9)
    np.testing.assert_allclose(agg["s"], 1.0, atol=1e-9)
    mm = apply_scaler(sig, stats, "text_len", "min_max")
    r = mm.agg(F.min("text_len_min_max"), F.max("text_len_min_max")).collect()[0]
    assert r[0] == 0.0 and r[1] == 1.0


def test_acklam_ndtri_accuracy():
    ps = np.concatenate(
        [np.linspace(1e-9, 0.02, 50), np.linspace(0.03, 0.97, 200), np.linspace(0.98, 1 - 1e-9, 50)]
    )
    want = np.array([statistics.NormalDist().inv_cdf(p) for p in ps])
    got = _acklam_ndtri(ps)
    np.testing.assert_allclose(got, want, rtol=2e-9, atol=2e-9)


def test_gaussian_scale_matches_rank_oracle(sig, sig_pdf):
    got = _collect(gaussian_scale(sig, "text_len", "g"), "g")

    def oracle(s: pd.Series) -> pd.Series:
        n = len(s)
        # cume_dist = rank(method='max')/n; midpoint rank = (r_max − 0.5)/n
        r = s.rank(method="max")
        p = np.clip((r - 0.5) / n, 1e-7, 1 - 1e-7)
        return pd.Series([statistics.NormalDist().inv_cdf(x) for x in p], index=s.index)

    want = sig_pdf.groupby("conv_id")["text_len"].transform(oracle).to_numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)


def test_fit_bins_matches_reference_formula(sig, sig_pdf):
    nbins = 5
    edges = fit_bins(sig, "text_len", nbins).toPandas().set_index("conv_id")["edges"]
    for conv, g in sig_pdf.groupby("conv_id"):
        x = np.sort(g["text_len"].to_numpy())
        n = len(x)
        # classifier.py:73-74 exact formula
        want = np.interp(np.linspace(0, n - 1, nbins + 1), np.arange(n), x)
        np.testing.assert_allclose(np.array(edges[conv]), want, rtol=1e-12, err_msg=conv)


def test_apply_bins_matches_histogram(sig, sig_pdf):
    nbins = 5
    bins = fit_bins(sig, "text_len", nbins)
    out = (
        apply_bins(sig, bins, "text_len", nbins, onehot_col="oh")
        .select("conv_id", "turn_idx", "text_len_bin", "oh")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    for conv, g in sig_pdf.groupby("conv_id"):
        x = g.sort_values(["ts", "turn_idx"])["text_len"].to_numpy()
        n = len(x)
        edges = np.interp(np.linspace(0, n - 1, nbins + 1), np.arange(n), np.sort(x))
        want_idx = np.searchsorted(edges, x, side="right") - 1
        want_idx = np.where(x == edges[-1], nbins - 1, want_idx)
        want_idx = np.where((x < edges[0]) | (x > edges[-1]), -1, want_idx)
        sub = out[out["conv_id"] == conv]
        got_idx = sub["text_len_bin"].to_numpy()
        np.testing.assert_array_equal(got_idx, want_idx, err_msg=conv)
        # one-hot agreement: histogram counts per bin match
        hist, _ = np.histogram(x, edges)
        oh = np.stack(sub["oh"].to_numpy())
        got_hist = oh.sum(axis=0)
        got_hist_in_range = oh[got_idx >= 0].sum(axis=0)
        np.testing.assert_array_equal(got_hist_in_range, hist, err_msg=conv)
        # out-of-range rows are zero vectors
        assert (oh[got_idx == -1].sum(axis=1) == 0).all()


def test_declassify_point_mass():
    import numpy as np

    from sparkfeat.classify import declassify

    edges = np.array([0.0, 1.0, 2.0, 3.0, 4.0])
    out = declassify(np.array([0, 0, 1, 0]), edges)
    # all mass in bin [2,3): mean = centre 2.5; variance = -w^2/12 floored at 0
    assert out["mean"] == 2.5
    assert out["variance"] == 0.0
    assert out["median"] == 2.5


def test_declassify_uniform_matches_continuous_uniform():
    import numpy as np

    from sparkfeat.classify import declassify

    edges = np.linspace(0, 8, 9)
    out = declassify(np.ones(8) / 8, edges)
    # grouped variance of the centres is 5.25; classical Sheppard
    # subtracts h²/12 (= 1/12) from it
    np.testing.assert_allclose(out["mean"], 4.0)
    np.testing.assert_allclose(out["variance"], 5.25 - 1.0 / 12.0)
    np.testing.assert_allclose(out["median"], 4.0)


def test_gaussian_scale_masks_nulls_and_nans(spark):
    """ADVICE r1: nulls sort first and NaNs last in the value-ordered
    window — neither may shift valid ranks, and both emit null output."""
    import math

    pdf = pd.DataFrame(
        {
            "conv_id": ["c"] * 10,
            "turn_idx": list(range(10)),
            "ts": pd.date_range("2024-01-01", periods=10, freq="1min"),
            "v": [None, 1.0, 2.0, float("nan"), 3.0, 4.0, None, 5.0, float("nan"), 6.0],
        }
    )
    out = (
        gaussian_scale(spark.createDataFrame(pdf), "v", "g")
        .toPandas()
        .sort_values("turn_idx")
        .reset_index(drop=True)
    )
    # invalid rows → null out
    invalid = out.loc[[0, 3, 6, 8], "g"]
    assert invalid.isna().all()
    # valid ranks = (i+1-0.5)/6 over the 6 valid values, unaffected by invalids
    valid_vals = out.loc[[1, 2, 4, 5, 7, 9], "g"].to_numpy(dtype="float64")
    want = np.array(
        [statistics.NormalDist().inv_cdf((i + 0.5) / 6.0) for i in range(6)]
    )
    np.testing.assert_allclose(valid_vals, want, rtol=1e-6, atol=1e-9)


def test_gaussian_scale_global_two_pass(spark, sig, sig_pdf):
    """Global (entity_col=None) path: range-partitioned two-pass rank ==
    single-sequence rank oracle; plan contains no single-task global sort."""
    out = gaussian_scale(sig, "text_len", "g", entity_col=None)
    got = _collect(out, "g")

    s = sig_pdf["text_len"]
    r = s.rank(method="max")
    p = np.clip((r - 0.5) / len(s), 1e-7, 1 - 1e-7)
    want = np.array([statistics.NormalDist().inv_cdf(x) for x in p])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)


def test_apply_scaler_left_join_passes_unseen_entities(spark, sig):
    """ADVICE r1: serve-time rows for entities absent from the fit must
    surface with null scaled values, not vanish."""
    held_out = sig.select("conv_id").first()["conv_id"]
    stats = fit_stats(sig.filter(F.col("conv_id") != held_out), "text_len")
    out = apply_scaler(sig, stats, "text_len", "standard")
    n_in = sig.count()
    assert out.count() == n_in
    unseen = out.filter(F.col("conv_id") == held_out)
    assert unseen.count() > 0
    assert unseen.filter(F.col("text_len_standard").isNotNull()).count() == 0

    bins = fit_bins(sig.filter(F.col("conv_id") != held_out), "text_len", 5)
    b = apply_bins(sig, bins, "text_len", 5, idx_col="bin_idx", onehot_col="oh")
    assert b.count() == n_in
    ub = b.filter(F.col("conv_id") == held_out)
    assert ub.filter(F.col("bin_idx").isNotNull() | F.col("oh").isNotNull()).count() == 0


def test_fit_bins_approx_rank_error_bounded(spark):
    """The sketch strategy (method='approx', bounded memory per group —
    the 10^12-row path) lands every edge within the Greenwald-Khanna
    rank guarantee (n/accuracy) of the exact quantile's rank, per
    entity, on a skewed distribution."""
    import pandas as pd

    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {
            "conv_id": np.repeat(["a", "b"], 10_000),
            "v": np.concatenate(
                [rng.lognormal(0, 1.0, 10_000), rng.normal(50, 5, 10_000)]
            ),
        }
    )
    df = spark.createDataFrame(pdf)
    nbins, accuracy = 10, 100
    out = (
        fit_bins(df, "v", nbins, entity_col="conv_id", method="approx",
                 accuracy=accuracy)
        .toPandas()
        .set_index("conv_id")
    )
    for conv, g in pdf.groupby("conv_id"):
        x = np.sort(g["v"].to_numpy())
        n = len(x)
        edges = np.array(out.loc[conv, "edges"])
        assert len(edges) == nbins + 1
        assert (np.diff(edges) >= 0).all()
        # GK guarantee: returned element's rank within n/accuracy of target
        tol = n / accuracy + 1
        for k, e in enumerate(edges):
            target = k / nbins * (n - 1)
            rank = np.searchsorted(x, e, side="left")
            assert abs(rank - target) <= tol, (conv, k, rank, target)
        # p=0 / p=1 are exact min/max in the sketch
        assert edges[0] == x[0] and edges[-1] == x[-1]
        # sketch median obeys the same bound
        med_rank = np.searchsorted(x, out.loc[conv, "bin_median"], side="left")
        assert abs(med_rank - 0.5 * (n - 1)) <= tol
