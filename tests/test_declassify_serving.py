"""N6 declassification + inverse-transform parity vs the reference's own
test suite (reference/tests/test_classifier.py is the spec: same fixture
values, same expected numbers) plus the predict-path round trips."""

from __future__ import annotations

import statistics

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkfeat.classify import (
    declassify_labels,
    fit_bin_pdf,
    declassify_single_pdf,
    estimate_confidence_interval,
    extract_point_estimates,
    fit_bin_distribution,
    fit_bins,
    unit_gaussian_edges,
)
from sparkfeat.normalize import (
    apply_scaler,
    fit_quantile_grid,
    fit_stats,
    gaussian_scale,
    inverse_gaussian_scale,
    inverse_scaler,
)
from sparkfeat.schema import with_turn_signals

# reference/tests/helpers.py:9-19 fixture, verbatim values
EPS = 1e-10
N_BINS = 10
MIN_EDGE, MAX_EDGE = 0, 10
TEST_EDGES = np.linspace(MIN_EDGE, MAX_EDGE, num=N_BINS + 1)
TEST_BIN_CENTRES = np.linspace(0.5, 9.5, num=N_BINS)
TEST_ARRAY = np.linspace(MIN_EDGE + EPS, MAX_EDGE - EPS, num=100)
TEST_TRAIN_LABELS = np.stack((TEST_ARRAY, TEST_ARRAY, TEST_ARRAY))

RTOL, ATOL = 1e-5, 1e-8


@pytest.fixture(scope="module")
def dist():
    return fit_bin_distribution(TEST_TRAIN_LABELS, N_BINS)


def test_balanced_edges_centres_widths(dist):
    # test_compute_balanced_bin_edges / bin_centres / bin_widths
    np.testing.assert_allclose(dist.bin_edges, TEST_EDGES, rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(dist.bin_centres[1], 1.5, rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(dist.bin_widths, np.ones(N_BINS), rtol=RTOL, atol=ATOL)
    assert dist.mean_bin_width == pytest.approx((MAX_EDGE - MIN_EDGE) / N_BINS)


def test_sheppards_correction(dist):
    # reference test: correction == mean(widths)**2/12 (widths are equal
    # here, so the median formula classifier.py:131-134 agrees)
    assert dist.sheppards_correction == pytest.approx(
        np.mean(dist.bin_widths) ** 2 / 12
    )


def test_single_confidence_levels_match_reference_numbers(dist):
    # test_calculate_single_confidence_interval, all four literals
    from sparkfeat.classify import _single_confidence_level

    ub = TEST_EDGES[-1]
    assert _single_confidence_level(dist, dist.pdf, 0.5) == pytest.approx(
        ub / 2, abs=1e-5
    )
    assert _single_confidence_level(dist, dist.pdf, 0.975) == pytest.approx(
        ub * 0.975, abs=1e-5
    )
    pdf2 = np.zeros(N_BINS)
    pdf2[-1] = 1
    assert _single_confidence_level(dist, pdf2, 0.5) == pytest.approx(
        ub * 0.95, abs=1e-5
    )
    assert _single_confidence_level(dist, pdf2, 0.975) == pytest.approx(
        ub * 0.9975, abs=1e-5
    )


def test_estimate_confidence_interval_orders(dist):
    med, lo, hi = estimate_confidence_interval(dist, dist.pdf, 0.68)
    assert lo < med < hi
    # uniform pdf over [0,10]: central 68% interval is symmetric
    assert med == pytest.approx(5.0, abs=1e-5)
    assert hi - med == pytest.approx(med - lo, abs=1e-5)


def test_declassify_labels_reference_numbers(dist):
    # test_declassify_labels: mean == mean(train), variance == w^2/12
    mean, variance = declassify_labels(dist, dist.pdf)
    assert mean == pytest.approx(float(np.mean(TEST_TRAIN_LABELS)), abs=1e-6)
    assert variance == pytest.approx(1.0 / 12, abs=1e-6)


def test_extract_point_estimates_reference(dist):
    pdf_array = np.zeros((2, N_BINS))
    pdf_array[0, 2] = 1
    pdf_array[1, 5] = 1
    got = extract_point_estimates(dist, pdf_array)
    np.testing.assert_allclose(
        got, [TEST_BIN_CENTRES[2], TEST_BIN_CENTRES[5]], rtol=RTOL, atol=ATOL
    )


def test_declassify_single_pdf_point_mass(dist):
    pdf = np.zeros(N_BINS)
    pdf[3] = 1
    points, variance = declassify_single_pdf(dist, pdf)
    assert points[0] == pytest.approx(TEST_BIN_CENTRES[3], abs=1e-5)
    # point mass: raw variance ~0 -> floored at sheppards
    assert variance == pytest.approx(dist.sheppards_correction, abs=1e-9)


def test_unit_gaussian_edges_vs_normaldist():
    # classifier.py:331-345: arange sampler -> erfinv*sqrt(2)
    n_edges = N_BINS + 1
    got = unit_gaussian_edges(n_edges)
    step = 2 / n_edges
    sampler = np.arange(-1 + step / 2, 1, step)
    want = np.array(
        [statistics.NormalDist().inv_cdf((s + 1) / 2) for s in sampler]
    )
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-9)
    # symmetric, increasing
    np.testing.assert_allclose(got, -got[::-1], atol=1e-9)
    assert np.all(np.diff(got) > 0)


def test_centred_bin_distribution_folds_outliers():
    rng = np.random.default_rng(7)
    data = rng.normal(0, 2.0, 5000)
    d = fit_bin_distribution(data, 6, use_centred_bins=True)
    np.testing.assert_allclose(
        d.bin_edges, unit_gaussian_edges(7) * d.sigma, rtol=1e-12
    )
    assert d.pdf.sum() == pytest.approx(1.0, abs=1e-12)  # outliers folded in
    # symmetric edges around zero
    np.testing.assert_allclose(d.bin_edges, -d.bin_edges[::-1], atol=1e-9)


def test_fit_bins_centred_spark_matches_numpy(spark, transcripts):
    sig = with_turn_signals(transcripts)
    got = {
        r["conv_id"]: np.array(r["edges"])
        for r in fit_bins(sig, "text_len", 5, centred=True).collect()
    }
    pdf = sig.select("conv_id", "text_len").toPandas()
    for conv, g in pdf.groupby("conv_id"):
        sigma = g["text_len"].to_numpy().std(ddof=0)
        want = unit_gaussian_edges(6) * sigma
        np.testing.assert_allclose(got[conv], want, rtol=1e-9)


# ---------------------------------------------------------------------------
# Inverse transforms (financial.py:330-385 predict path)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def sig(transcripts):
    return with_turn_signals(transcripts).cache()


@pytest.mark.parametrize("method", ["standard", "min_max", "robust"])
def test_inverse_scaler_round_trip(sig, method):
    stats = fit_stats(sig, "text_len")
    z = apply_scaler(sig, stats, "text_len", method, out_col="z")
    rt = inverse_scaler(z, stats, "z", method, out_col="v_rt")
    bad = rt.filter(
        F.col("z").isNotNull() & (F.abs(F.col("v_rt") - F.col("text_len")) > 1e-9)
    ).count()
    assert bad == 0
    # constant (zero-scale) groups scale to null and stay null
    assert rt.filter(F.col("z").isNull() & F.col("v_rt").isNotNull()).count() == 0


def test_inverse_gaussian_round_trip(sig):
    grid = fit_quantile_grid(sig, "text_len", n_quantiles=201)
    z = gaussian_scale(sig, "text_len", "z")
    rt = inverse_gaussian_scale(z, grid, "z", out_col="v_rt")
    pdf = rt.select("text_len", "v_rt").toPandas()
    # rank -> phi-inverse -> phi -> quantile-interp: recovers the value up
    # to grid interpolation between adjacent order statistics
    err = (pdf["v_rt"] - pdf["text_len"]).abs()
    scale = pdf["text_len"].abs().clip(lower=1.0)
    assert (err / scale).median() < 0.02
    assert (err / scale).quantile(0.95) < 0.25


def test_fit_bin_pdf_matches_numpy_fit(spark, sig):
    """Distributed pdf fit == BinDistribution numpy fit, both balanced
    and centred (outliers folded into outer bins)."""
    pdf_local = sig.select("conv_id", "text_len").toPandas()
    for centred in (False, True):
        bins = fit_bins(sig, "text_len", 5, centred=centred)
        got = {
            r["conv_id"]: np.array(r["pdf"])
            for r in fit_bin_pdf(
                sig, bins, "text_len", 5, centred=centred
            ).collect()
        }
        for conv, g in pdf_local.groupby("conv_id"):
            d = fit_bin_distribution(
                g["text_len"].to_numpy(), 5, use_centred_bins=centred
            )
            np.testing.assert_allclose(got[conv], d.pdf, atol=1e-12, err_msg=f"{conv} centred={centred}")
