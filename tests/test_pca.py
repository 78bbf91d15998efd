"""PCA / whitening: Arrow moment kernel vs expr twin vs numpy, fit
guarantees (eigh parity, sign pinning, orthonormality), projection and
whitening numerics, and the scale-shape plan assertions."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkfeat.pca import correlation_long, covariance_long, pca_fit, pca_project


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def emb_np(emb):
    pdf = emb.select("vec_id", "embedding").toPandas().sort_values("vec_id")
    return np.stack(pdf["embedding"].to_numpy()).astype(np.float64)


def _cov_matrix(df):
    pdf = df.toPandas()
    d = int(pdf["i"].max()) + 1
    m = np.zeros((d, d))
    m[pdf["i"].to_numpy(), pdf["j"].to_numpy()] = pdf["cov"].to_numpy()
    return m


def test_covariance_arrow_matches_numpy(emb, emb_np):
    got = _cov_matrix(covariance_long(emb, method="arrow"))
    want = np.cov(emb_np, rowvar=False, ddof=0)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_covariance_expr_twin_equal(emb):
    a = _cov_matrix(covariance_long(emb, method="arrow"))
    e = _cov_matrix(covariance_long(emb, method="expr"))
    np.testing.assert_allclose(a, e, rtol=1e-9, atol=1e-12)


def test_covariance_arrow_is_single_data_pass(emb):
    df = covariance_long(emb, method="arrow")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the corpus is read ONCE: the 1-row moment fold means every
    # derivation is an array expression — exactly one Python/Arrow map
    # over the scan, and no join machinery at all.
    assert plan.count("MapInPandas") == 1, plan
    for node in ("SortMergeJoin", "CartesianProduct", "BroadcastHashJoin"):
        assert node not in plan, plan


def test_moments_row_empty_input(spark):
    from sparkfeat.pca import moments_row

    empty = spark.createDataFrame([], "embedding array<float>")
    assert moments_row(empty).count() == 0
    assert covariance_long(empty, method="arrow").count() == 0


def test_pca_fit_matches_numpy_eigh(emb, emb_np):
    fit = pca_fit(emb, k=8).toPandas().sort_values("component")
    cov = np.cov(emb_np, rowvar=False, ddof=0)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:8]
    np.testing.assert_allclose(
        fit["eigval"].to_numpy(), evals[order], rtol=1e-9, atol=1e-12
    )
    w = np.stack(fit["weights"].to_numpy())
    want = evecs[:, order].T
    flip = np.sign(want[np.arange(8), np.abs(want).argmax(axis=1)])
    want = want * flip[:, None]
    np.testing.assert_allclose(w, want, rtol=1e-7, atol=1e-10)
    # orthonormal, sign-pinned (largest-|w| coordinate positive)
    np.testing.assert_allclose(w @ w.T, np.eye(8), atol=1e-9)
    assert (w[np.arange(8), np.abs(w).argmax(axis=1)] > 0).all()
    # explained fractions: eigval / trace, descending
    np.testing.assert_allclose(
        fit["explained"].to_numpy(), evals[order] / np.trace(cov), rtol=1e-9
    )
    assert (np.diff(fit["eigval"].to_numpy()) <= 0).all()


def test_project_matches_numpy_and_whiten_unit_variance(emb, emb_np):
    fit = pca_fit(emb, k=4)
    out = (
        pca_project(emb, fit, out_col="pca")
        .select("vec_id", "pca")
        .toPandas()
        .sort_values("vec_id")
    )
    got = np.stack(out["pca"].to_numpy())
    fp = fit.toPandas().sort_values("component")
    w = np.stack(fp["weights"].to_numpy())
    mu = np.asarray(fp["mu"].iloc[0])
    want = (emb_np - mu) @ w.T
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-10)
    # population variance of component c == eigval_c; whitened == 1
    np.testing.assert_allclose(
        got.var(axis=0), fp["eigval"].to_numpy(), rtol=1e-9
    )
    white = (
        pca_project(emb, fit, out_col="pca", whiten=True)
        .select("pca")
        .toPandas()["pca"]
    )
    np.testing.assert_allclose(
        np.stack(white.to_numpy()).var(axis=0), np.ones(4), rtol=1e-9
    )


def test_project_plan_is_broadcast_jvm_only(emb):
    fit = pca_fit(emb, k=2)
    out = pca_project(emb, fit, out_col="pca")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # the apply side is pure expression work — no Python in the hot path
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan, plan


def test_whiten_zero_variance_component_stays_zero(spark):
    # 3-dim vectors whose 3rd dimension is constant: its eigval is 0 and
    # the whitened projection must be 0 (not NaN from 0 · inf)
    rows = [([float(i), float(i % 3), 5.0],) for i in range(20)]
    df = spark.createDataFrame(rows, "embedding array<double>")
    fit = pca_fit(df, k=3)
    out = np.stack(
        pca_project(df, fit, out_col="pca", whiten=True)
        .select("pca")
        .toPandas()["pca"]
        .to_numpy()
    )
    assert np.isfinite(out).all()
    ev = fit.toPandas().sort_values("component")["eigval"].to_numpy()
    np.testing.assert_allclose(out[:, ev <= 1e-12], 0.0, atol=1e-9)


def test_correlation_matches_numpy_corrcoef(emb, emb_np):
    pdf = correlation_long(emb).toPandas()
    d = int(pdf["i"].max()) + 1
    got = np.zeros((d, d))
    got[pdf["i"].to_numpy(), pdf["j"].to_numpy()] = pdf["corr"].to_numpy()
    want = np.corrcoef(emb_np, rowvar=False)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.diag(got), np.ones(d), atol=1e-12)


def test_correlation_zero_variance_dim_is_null(spark):
    rows = [([float(i), 5.0],) for i in range(10)]
    df = spark.createDataFrame(rows, "embedding array<double>")
    pdf = correlation_long(df).toPandas()
    const = pdf[(pdf["i"] == 1) | (pdf["j"] == 1)]
    assert const["corr"].isna().all()
    assert pdf[(pdf["i"] == 0) & (pdf["j"] == 0)]["corr"].iloc[0] == 1.0


def test_correlation_is_single_data_pass(emb):
    plan = correlation_long(emb)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1, plan
    for node in ("SortMergeJoin", "CartesianProduct", "BroadcastHashJoin"):
        assert node not in plan, plan


def test_inverse_full_rank_is_identity(emb, emb_np):
    from sparkfeat.pca import pca_inverse

    d = emb_np.shape[1]
    for whiten in (False, True):
        fit = pca_fit(emb, k=d)
        proj = pca_project(emb, fit, out_col="pca", whiten=whiten)
        rec = (
            pca_inverse(proj, fit, proj_col="pca", out_col="recon", whiten=whiten)
            .select("vec_id", "recon")
            .toPandas()
            .sort_values("vec_id")
        )
        np.testing.assert_allclose(
            np.stack(rec["recon"].to_numpy()), emb_np, rtol=1e-7, atol=1e-8
        )


def test_inverse_truncated_mse_equals_tail_eigenmass(emb, emb_np):
    from sparkfeat.pca import pca_inverse

    k = 8
    fit = pca_fit(emb, k=k)
    proj = pca_project(emb, fit, out_col="pca", whiten=True)
    rec = (
        pca_inverse(proj, fit, proj_col="pca", out_col="recon", whiten=True)
        .select("vec_id", "recon")
        .toPandas()
        .sort_values("vec_id")
    )
    got = np.stack(rec["recon"].to_numpy())
    # mean squared residual over all vectors == sum of dropped eigvals / d
    cov = np.cov(emb_np, rowvar=False, ddof=0)
    evals = np.sort(np.linalg.eigh(cov)[0])[::-1]
    want_mse = evals[k:].sum() / emb_np.shape[1]
    got_mse = ((emb_np - got) ** 2).sum(axis=1).mean() / emb_np.shape[1]
    np.testing.assert_allclose(got_mse, want_mse, rtol=1e-9)


def test_inverse_plan_is_broadcast_jvm_only(emb):
    from sparkfeat.pca import pca_inverse

    fit = pca_fit(emb, k=2)
    proj = pca_project(emb, fit, out_col="pca")
    plan = (
        pca_inverse(proj, fit, proj_col="pca")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan, plan
    assert "ArrowEvalPython" not in plan, plan


def test_covariance_ignores_null_vectors(spark, emb):
    with_null = emb.select("embedding").unionByName(
        spark.createDataFrame([(None,)], "embedding array<float>")
    )
    a = _cov_matrix(covariance_long(with_null, method="arrow"))
    b = _cov_matrix(covariance_long(emb, method="arrow"))
    np.testing.assert_allclose(a, b, rtol=1e-12)
    e = _cov_matrix(covariance_long(with_null, method="expr"))
    np.testing.assert_allclose(e, b, rtol=1e-9, atol=1e-12)


def test_grouped_moments_equal_per_slice_moments(spark, emb):
    from sparkfeat.pca import grouped_moments, moments_row

    tagged = emb.withColumn(
        "_g", F.when(F.col("vec_id") % 2 == 0, "a").otherwise("b")
    )
    got = {
        r["_g"]: r
        for r in grouped_moments(tagged, "embedding", "_g").collect()
    }
    for g, pred in (("a", F.col("vec_id") % 2 == 0), ("b", F.col("vec_id") % 2 != 0)):
        want = moments_row(emb.filter(pred), "embedding").collect()[0]
        assert got[g]["n"] == want["n"]
        np.testing.assert_allclose(got[g]["s"], want["s"], rtol=1e-12)
        np.testing.assert_allclose(got[g]["ss"], want["ss"], rtol=1e-12)


def test_embedding_drift_stats_match_numpy(spark, emb, emb_np):
    from sparkfeat.pca import embedding_drift_stats

    ref = emb.filter(F.col("vec_id") % 2 == 0)
    cur = emb.filter(F.col("vec_id") % 2 != 0)
    pdf = embedding_drift_stats(ref, cur).toPandas().sort_values("i")
    mat = emb_np  # emb_np is already vec_id-sorted
    mref, mcur = mat[::2], mat[1::2]
    np.testing.assert_allclose(pdf["mean_ref"], mref.mean(axis=0), rtol=1e-9)
    np.testing.assert_allclose(pdf["mean_cur"], mcur.mean(axis=0), rtol=1e-9)
    np.testing.assert_allclose(pdf["var_ref"], mref.var(axis=0), rtol=1e-9)
    np.testing.assert_allclose(
        pdf["var_ratio"], mcur.var(axis=0) / mref.var(axis=0), rtol=1e-9
    )
    np.testing.assert_allclose(
        pdf["mean_shift"], np.abs(mcur.mean(axis=0) - mref.mean(axis=0)), atol=1e-12
    )


def test_embedding_drift_is_single_pass_no_join(emb):
    from sparkfeat.pca import embedding_drift_stats

    ref = emb.filter(F.col("vec_id") % 2 == 0)
    cur = emb.filter(F.col("vec_id") % 2 != 0)
    plan = (
        embedding_drift_stats(ref, cur)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # two filtered branches of one cached-free union: each side scans
    # once, the pivot is an aggregate — never a self-join on the moments
    for node in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert node not in plan, plan
    assert plan.count("MapInPandas") == 1, plan
