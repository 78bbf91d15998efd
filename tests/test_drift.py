"""sparkfeat.drift — PSI / moment-shift feature drift monitor."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

import pytest

from sparkfeat.drift import feature_drift


def _panel(spark, ref_vals, cur_vals, feature="x"):
    rows = [("ref", v) for v in ref_vals] + [("cur", v) for v in cur_vals]
    return spark.createDataFrame(rows, f"_window string, {feature} double")


def _py_psi(ref, cur, bins=10):
    """Pure-Python replica of the operator's smoothed equal-width PSI."""
    ref_v = [v for v in ref if v is not None]
    cur_v = [v for v in cur if v is not None]
    vmin, vmax = min(ref_v), max(ref_v)
    width = (vmax - vmin) / bins

    def bucket(v):
        if vmax == vmin:
            return 0
        return max(0, min(bins - 1, math.floor((v - vmin) / width)))

    cr = [0] * bins
    cc = [0] * bins
    for v in ref_v:
        cr[bucket(v)] += 1
    for v in cur_v:
        cc[bucket(v)] += 1
    total = 0.0
    for i in range(bins):
        p = (cr[i] + 0.5) / (len(ref_v) + 0.5 * bins)
        q = (cc[i] + 0.5) / (len(cur_v) + 0.5 * bins)
        total += (p - q) * math.log(p / q)
    return total


def test_identical_windows_zero_drift(spark):
    vals = [float(i) for i in range(10)] * 3
    row = feature_drift(_panel(spark, vals, vals), ["x"]).collect()[0]
    assert row.feature == "x"
    assert row.n_ref == 30 and row.n_cur == 30
    assert abs(row.psi) < 1e-12
    assert row.smd == 0.0
    assert row.null_rate_ref == 0.0 and row.null_rate_cur == 0.0


def test_shifted_window_matches_python_replica(spark):
    ref = [float(i) for i in range(20)]
    cur = [float(i) + 12.0 for i in range(20)]  # mass pushed off the top
    row = feature_drift(_panel(spark, ref, cur), ["x"]).collect()[0]
    assert row.psi == pytest.approx(_py_psi(ref, cur), rel=1e-9)
    assert row.psi > 0.25  # "action" territory by the rule of thumb
    mean_r, mean_c = sum(ref) / 20, sum(cur) / 20
    var = sum((v - mean_r) ** 2 for v in ref) / 20  # same var both sides
    assert row.smd == pytest.approx((mean_c - mean_r) / math.sqrt(var), rel=1e-9)


def test_all_null_reference_keeps_null_rate_row(spark):
    row = feature_drift(
        _panel(spark, [None, None], [1.0, None]), ["x"]
    ).collect()[0]
    assert row.psi is None  # no edges to fit
    assert row.null_rate_ref == 1.0
    assert row.null_rate_cur == 0.5
    assert row.n_ref == 0 and row.n_cur == 1


def test_multifeature_and_constant_feature(spark):
    rows = [("ref", float(i % 7), 1.0) for i in range(50)] + [
        ("cur", float(i % 7) + 3.0, 1.0) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "_window string, a double, c double")
    got = {r.feature: r for r in feature_drift(df, ["a", "c"]).collect()}
    assert set(got) == {"a", "c"}
    # constant feature: everything in bucket 0 both sides -> psi 0, smd null
    assert abs(got["c"].psi) < 1e-12
    assert got["c"].smd is None
    assert got["a"].psi == pytest.approx(
        _py_psi([float(i % 7) for i in range(50)],
                [float(i % 7) + 3.0 for i in range(50)]),
        rel=1e-9,
    )


def test_drift_plan_broadcast_edges_no_window(spark):
    """Scale posture: the edges join must broadcast (n_features rows)
    and the whole monitor must stay window-free."""
    vals = [float(i) for i in range(10)]
    plan = (
        feature_drift(_panel(spark, vals, vals), ["x"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_stream_feature_drift_matches_batch(spark, transcripts, tmp_path):
    import pandas as pd

    from sparkfeat.drift import drift_profile, feature_drift
    from sparkfeat.schema import with_turn_signals
    from sparkfeat.streaming import stream_feature_drift

    feats = ["text_len", "token_est"]
    sig = with_turn_signals(transcripts).select("ts", *feats)
    lo, hi = sig.agg(F.min("ts"), F.max("ts")).collect()[0]
    mid = lo + (hi - lo) / 2
    ref, cur = sig.where(F.col("ts") < F.lit(mid)), sig.where(F.col("ts") >= F.lit(mid))
    profile = drift_profile(ref, feats)

    # far-future sentinel advances the watermark so append-mode emits
    # every real window (a live pipeline gets this from new arrivals)
    flush = spark.createDataFrame(
        pd.DataFrame({"ts": [pd.Timestamp(hi) + pd.Timedelta(days=30)],
                      "text_len": [0.0], "token_est": [0.0]}),
        schema=cur.schema,
    )
    inp = str(tmp_path / "drift_in")
    cur.unionByName(flush).write.mode("overwrite").parquet(inp)

    stream = spark.readStream.schema(cur.schema).parquet(inp)
    q = (
        stream_feature_drift(stream, profile, feats, window="1 hour",
                             watermark="1 minute")
        .writeStream.format("memory").queryName("drift_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = (
        spark.sql("SELECT * FROM drift_stream").toPandas()
        .sort_values(["window_start", "feature"]).reset_index(drop=True)
    )

    # ground truth 1: the SAME plan over the batch frame (withWatermark
    # is a batch no-op) must agree window-for-window
    want = (
        stream_feature_drift(cur, profile, feats, window="1 hour",
                             watermark="1 minute")
        .toPandas().sort_values(["window_start", "feature"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_exact=False, rtol=1e-12)

    # ground truth 2: one window's PSI must equal the batch
    # feature_drift monitor fed (ref, that window) — same edge fitting,
    # same smoothing, independent aggregation shape
    w0 = want.iloc[0]
    win_rows = cur.where(
        (F.col("ts") >= F.lit(w0.window_start)) & (F.col("ts") < F.lit(w0.window_end))
    )
    panel = ref.withColumn("_window", F.lit("ref")).unionByName(
        win_rows.withColumn("_window", F.lit("cur"))
    )
    batch = {r.feature: r.psi for r in feature_drift(panel, feats).collect()}
    got_w0 = {
        r.feature: r.psi
        for _, r in want[want.window_start == w0.window_start].iterrows()
    }
    for f in feats:
        assert got_w0[f] == pytest.approx(batch[f], rel=1e-9)


def _py_psi_edges(ref, cur, interior):
    """Replica of PSI with explicit interior edges (k edges, k+1 buckets)."""
    nb = len(interior) + 1

    def bucket(v):
        return sum(1 for e in interior if e <= v)

    cr, cc = [0] * nb, [0] * nb
    for v in ref:
        cr[bucket(v)] += 1
    for v in cur:
        cc[bucket(v)] += 1
    tot = 0.0
    for i in range(nb):
        p = (cr[i] + 0.5) / (len(ref) + 0.5 * nb)
        q = (cc[i] + 0.5) / (len(cur) + 0.5 * nb)
        tot += (p - q) * math.log(p / q)
    return tot


def test_explicit_edges_psi_matches_replica(spark):
    ref = [float(i) for i in range(30)]
    cur = [float(i) + 7.0 for i in range(30)]
    interior = [5.0, 12.0, 21.0]
    edges = spark.createDataFrame([("x", interior)], "feature string, edges array<double>")
    row = feature_drift(_panel(spark, ref, cur), ["x"], edges=edges).collect()[0]
    assert row.psi == pytest.approx(_py_psi_edges(ref, cur, interior), rel=1e-9)
    # feature missing from the edges table -> null PSI, moments intact
    edges_other = spark.createDataFrame(
        [("y", interior)], "feature string, edges array<double>"
    )
    row2 = feature_drift(_panel(spark, ref, cur), ["x"], edges=edges_other).collect()[0]
    assert row2.psi is None and row2.mean_ref is not None


def test_quantile_psi_composes_with_fit_bins(spark):
    """The documented quantile-PSI composition: global balanced edges
    from classify.fit_bins feed feature_drift's explicit-edges path."""
    from sparkfeat.classify import fit_bins

    ref = [float(i) for i in range(40)]
    cur = [float(i) * 1.5 for i in range(40)]
    panel = _panel(spark, ref, cur)
    nbins = 4
    fitted = fit_bins(
        panel.where("_window = 'ref'"), "x", nbins, entity_col=None
    )
    edges = fitted.select(
        F.lit("x").alias("feature"),
        F.slice("edges", 2, nbins - 1).alias("edges"),  # interior cut points
    )
    row = feature_drift(panel, ["x"], edges=edges).collect()[0]
    interior = fitted.collect()[0].edges[1:-1]
    assert row.psi == pytest.approx(_py_psi_edges(ref, cur, interior), rel=1e-9)
    # balanced edges on the ref itself -> near-uniform ref histogram
    assert row.psi > 0.0


def test_stream_drift_sliding_windows_batch(spark):
    """slide < window: each value lands in window/slide windows; the
    tumbling run is the slide == window special case."""
    import datetime as dt

    from sparkfeat.drift import drift_profile
    from sparkfeat.streaming import stream_feature_drift

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [(base + dt.timedelta(minutes=10 * i), float(i)) for i in range(12)]
    cur = spark.createDataFrame(rows, "ts timestamp, x double")
    profile = drift_profile(cur, ["x"])
    tumble = stream_feature_drift(cur, profile, ["x"], window="1 hour").collect()
    slide = stream_feature_drift(
        cur, profile, ["x"], window="1 hour", slide="30 minutes"
    ).collect()
    assert sum(r.n_cur for r in tumble) == 12
    assert sum(r.n_cur for r in slide) == 24  # every row in exactly 2 windows
    # tumbling windows appear among the sliding ones with equal counts
    t = {(r.window_start, r.window_end): r.n_cur for r in tumble}
    s = {(r.window_start, r.window_end): r.n_cur for r in slide}
    for k, v in t.items():
        assert s[k] == v


def test_quantile_edges_matches_fit_bins_interior(spark):
    """quantile_edges is the one-pass multi-feature twin of
    classify.fit_bins(method='exact', entity_col=None) sliced to the
    interior cut points."""
    from sparkfeat.classify import fit_bins
    from sparkfeat.drift import quantile_edges

    vals = [float(i) ** 1.3 for i in range(37)]
    df = spark.createDataFrame(
        [(v, 2.0 * v + 1.0) for v in vals], "x double, y double"
    )
    got = {r.feature: r.edges for r in quantile_edges(df, ["x", "y"], bins=5).collect()}
    assert set(got) == {"x", "y"}
    for col in ("x", "y"):
        fb = fit_bins(df, col, 5, entity_col=None).collect()[0]
        assert got[col] == pytest.approx(fb.edges[1:-1], rel=1e-12)


# ---------------------------------------------------------------------------
# categorical_drift (chi-square + Cramér's V)
# ---------------------------------------------------------------------------


def _cat(spark, counts):
    rows = []
    i = 0
    for cat, n in counts.items():
        for _ in range(n):
            rows.append((i, cat))
            i += 1
    return spark.createDataFrame(rows, "id bigint, cat string")


def test_categorical_drift_textbook_chi2(spark):
    from sparkfeat.drift import categorical_drift

    # 2x2: ref 30/20, cur 20/30 -> chi2 = N (ad-bc)^2 / (r1 r2 c1 c2)
    ref = _cat(spark, {"a": 30, "b": 20})
    cur = _cat(spark, {"a": 20, "b": 30})
    out = {r["category"]: r for r in categorical_drift(ref, cur, "cat").collect()}
    exp_chi2 = 100 * (30 * 30 - 20 * 20) ** 2 / (50 * 50 * 50 * 50)
    assert abs(out["a"]["chi2"] - exp_chi2) < 1e-6
    assert out["a"]["dof"] == 1
    # 2x2 Cramer's V == phi == sqrt(chi2/N)
    import math

    assert abs(out["a"]["cramers_v"] - math.sqrt(exp_chi2 / 100)) < 1e-6
    # scipy-free sanity: shares
    assert abs(out["a"]["share_ref"] - 0.6) < 1e-9
    assert abs(out["a"]["share_cur"] - 0.4) < 1e-9
    # constant columns identical on every row
    assert out["a"]["chi2"] == out["b"]["chi2"]


def test_categorical_drift_identical_slices_zero(spark):
    from sparkfeat.drift import categorical_drift

    ref = _cat(spark, {"a": 10, "b": 30, "c": 5})
    out = categorical_drift(ref, ref, "cat").collect()
    assert all(r["chi2"] == 0.0 and r["cramers_v"] == 0.0 for r in out)
    assert out[0]["dof"] == 2


def test_categorical_drift_absent_category(spark):
    from sparkfeat.drift import categorical_drift

    ref = _cat(spark, {"a": 10})
    cur = _cat(spark, {"a": 10, "newcat": 10})
    out = {r["category"]: r for r in categorical_drift(ref, cur, "cat").collect()}
    assert out["newcat"]["n_ref"] == 0 and out["newcat"]["n_cur"] == 10
    assert out["newcat"]["chi2_contrib"] > 0
    assert out["a"]["chi2"] > 0


def test_categorical_drift_is_lazy(spark):
    from sparkfeat.drift import categorical_drift

    ref = _cat(spark, {"a": 5, "b": 5})
    cur = _cat(spark, {"a": 5, "b": 5})
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None))
    out = categorical_drift(ref, cur, "cat")
    after = set(tracker.getJobIdsForGroup(None))
    assert after == before, "plan build fired a Spark job"
    assert out.count() == 2


# ---------------------------------------------------------------------------
# ks_drift — exact two-sample Kolmogorov–Smirnov
# ---------------------------------------------------------------------------


def _py_ks(ref, cur):
    """Pure-Python exact two-sample KS over pooled distinct values."""
    ref = [v for v in ref if v is not None]
    cur = [v for v in cur if v is not None]
    vals = sorted(set(ref) | set(cur))
    na, nb = len(ref), len(cur)
    best, at = -1, None
    ca = cb = 0
    for v in vals:
        ca += sum(1 for x in ref if x == v)
        cb += sum(1 for x in cur if x == v)
        d = abs(ca * nb - cb * na)
        if d > best:
            best, at = d, v
    return best / (na * nb), at


def _two(spark, ref_vals, cur_vals):
    from sparkfeat.drift import ks_drift

    ref = spark.createDataFrame([(v,) for v in ref_vals], "x double")
    cur = spark.createDataFrame([(v,) for v in cur_vals], "x double")
    return ks_drift(ref, cur, ["x"]).collect()[0]


def test_ks_matches_python_reference(spark):
    import numpy as np

    rng = np.random.default_rng(17)
    ref = [float(v) for v in np.round(rng.normal(0.0, 1.0, 400), 2)]
    cur = [float(v) for v in np.round(rng.normal(0.4, 1.3, 300), 2)]
    row = _two(spark, ref, cur)
    d, at = _py_ks(ref, cur)
    assert row.n_ref == 400 and row.n_cur == 300
    assert abs(row.ks_d - round(d, 6)) < 1e-12
    assert row.ks_at == at
    # D exceeds the 5% critical value for a 0.4-sigma location shift
    assert row.drifted


def test_ks_identical_and_disjoint(spark):
    vals = [float(i % 7) for i in range(50)]
    same = _two(spark, vals, list(vals))
    assert same.ks_d == 0.0 and not same.drifted
    # disjoint supports: ECDFs never overlap -> D = 1 at the ref max,
    # yet at n=3 vs 2 the critical value exceeds 1 — tiny samples can
    # never reach significance, exactly the flag's job
    dis = _two(spark, [1.0, 2.0, 3.0], [10.0, 11.0])
    assert dis.ks_d == 1.0 and dis.ks_at == 3.0
    assert dis.crit_05 > 1.0 and not dis.drifted


def test_ks_ties_and_duplicates_collapse(spark):
    # heavy duplication: the distinct-value table is tiny, D still exact
    ref = [0.0] * 90 + [1.0] * 10
    cur = [0.0] * 50 + [1.0] * 50
    row = _two(spark, ref, cur)
    d, at = _py_ks(ref, cur)
    assert abs(row.ks_d - round(d, 6)) < 1e-12  # = |0.9 - 0.5| = 0.4
    assert row.ks_at == 0.0 and row.ks_d == 0.4


def test_ks_null_side_and_multifeature(spark):
    from sparkfeat.drift import ks_drift

    ref = spark.createDataFrame(
        [(1.0, None), (2.0, None), (3.0, None)], "x double, y double"
    )
    cur = spark.createDataFrame(
        [(1.0, 5.0), (9.0, 6.0)], "x double, y double"
    )
    rows = {r.feature: r for r in ks_drift(ref, cur, ["x", "y"]).collect()}
    assert rows["x"].ks_d is not None
    assert rows["y"].n_ref == 0 and rows["y"].ks_d is None
    assert rows["y"].drifted is None


def test_ks_argmax_smallest_value_tiebreak(spark):
    # two values attain the same scaled gap; ks_at must be the smaller
    row = _two(spark, [1.0, 2.0], [3.0, 4.0])
    assert row.ks_d == 1.0 and row.ks_at == 2.0


def test_ks_wasserstein_matches_reference_and_units(spark):
    import numpy as np

    def py_w1(a, b):
        vals = sorted(set(a) | set(b))
        na, nb = len(a), len(b)
        ca = cb = 0
        tot = 0.0
        for v, nxt in zip(vals, vals[1:]):
            ca += sum(1 for x in a if x == v)
            cb += sum(1 for x in b if x == v)
            tot += round(abs(ca * nb - cb * na) * (nxt - v), 6)
        return round(tot / (na * nb), 6)

    rng = np.random.default_rng(41)
    ref = [float(round(v, 2)) for v in rng.normal(0, 1, 300)]
    cur = [float(round(v + 2.5, 2)) for v in rng.normal(0, 1, 250)]
    row = _two(spark, ref, cur)
    assert row.w1 == py_w1(ref, cur)
    # a pure location shift: W1 ~= the shift itself, in value units
    assert 2.2 < row.w1 < 2.8
    # KS is already deep in "drifted" territory on the same input —
    # but bounded by 1, while W1 carries the actual shift magnitude
    assert row.ks_d > 0.7 and row.drifted
    # identical windows: zero distance
    assert _two(spark, ref, list(ref)).w1 == 0.0
    # single pooled value: no intervals -> null W1, zero KS
    single = _two(spark, [3.0, 3.0], [3.0])
    assert single.w1 is None and single.ks_d == 0.0
