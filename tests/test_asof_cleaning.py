"""As-of join (union-tag sort-merge vs pandas merge_asof) and cleaning
operator semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparkfeat import cleaning as C
from sparkfeat.asof import asof_join, asof_join_pandas, with_targets
from sparkfeat.schema import with_turn_signals


@pytest.fixture(scope="module")
def sig(transcripts):
    return with_turn_signals(transcripts).cache()


@pytest.fixture(scope="module")
def probes(spark, transcripts_pdf):
    # deterministic probes: each conv's min ts + fixed offsets (some before
    # any turn, some between turns, some after the last)
    rng = np.random.default_rng(5)
    rows = []
    for conv, g in transcripts_pdf.groupby("conv_id"):
        t0 = g["ts"].min()
        for off in [-60, 0, 90, 600, 3600, 86400]:
            rows.append((conv, t0 + pd.Timedelta(seconds=off + float(rng.integers(0, 30)))))
    pdf = pd.DataFrame(rows, columns=["conv_id", "probe_ts"])
    pdf["probe_ts"] = pd.to_datetime(pdf["probe_ts"], utc=True).dt.tz_localize(None)
    return spark.createDataFrame(pdf)


def _canon(pdf):
    return pdf.sort_values(["conv_id", "probe_ts"]).reset_index(drop=True)


def test_asof_backward_matches_merge_asof(sig, probes):
    a = _canon(asof_join(probes, sig, ["text_len", "turn_idx"]).toPandas())
    b = _canon(asof_join_pandas(probes, sig, ["text_len", "turn_idx"]).toPandas())
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_asof_equal_ts_is_inclusive(spark):
    data = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["c"] * 3,
                "turn_idx": [0, 1, 2],
                "ts": pd.to_datetime(["2024-01-01 00:00", "2024-01-01 00:05", "2024-01-01 00:10"]),
                "v": [1.0, 2.0, 3.0],
            }
        )
    )
    probes = spark.createDataFrame(
        pd.DataFrame(
            {"conv_id": ["c"] * 2, "probe_ts": pd.to_datetime(["2024-01-01 00:05", "2024-01-01 00:04"])}
        )
    )
    out = asof_join(probes, data, ["v"]).toPandas().sort_values("probe_ts")
    assert list(out["v"]) == [1.0, 2.0]  # 00:04 → v@00:00, 00:05 → v@00:05 (inclusive)


def test_asof_forward(spark):
    data = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["c"] * 2,
                "turn_idx": [0, 1],
                "ts": pd.to_datetime(["2024-01-01 00:00", "2024-01-01 00:10"]),
                "v": [1.0, 2.0],
            }
        )
    )
    probes = spark.createDataFrame(
        pd.DataFrame({"conv_id": ["c"] * 2, "probe_ts": pd.to_datetime(["2024-01-01 00:01", "2024-01-01 00:11"])})
    )
    out = asof_join(probes, data, ["v"], direction="forward").toPandas().sort_values("probe_ts")
    assert list(out["v"])[0] == 2.0
    assert np.isnan(out["v"].iloc[1])


def test_with_targets_lead(sig, transcripts_pdf):
    out = (
        with_targets(sig, "text_len", [1, 3])
        .select("conv_id", "turn_idx", "y_lead_1", "y_lead_3")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pdf = transcripts_pdf.copy()
    pdf["text_len"] = pdf["text"].str.len().astype(float)
    pdf = pdf.sort_values(["conv_id", "ts", "turn_idx"]).reset_index(drop=True)
    for k in (1, 3):
        want = pdf.groupby("conv_id")["text_len"].shift(-k).to_numpy()
        got = out[f"y_lead_{k}"].to_numpy(dtype=float)
        assert np.array_equal(np.isnan(got), np.isnan(want))
        np.testing.assert_allclose(got[~np.isnan(want)], want[~np.isnan(want)])


def test_floor_ceiling_semantics(sig):
    pdf = sig.select("conv_id", "text_len").toPandas()
    mins = pdf.groupby("conv_id")["text_len"].min()
    maxs = pdf.groupby("conv_id")["text_len"].max()
    floor = float(mins.median())
    keep_floor = set(mins[mins > floor].index)
    got = set(
        r[0] for r in C.select_above_floor(sig, "text_len", floor).select("conv_id").distinct().collect()
    )
    assert got == keep_floor
    ceil = float(maxs.median())
    keep_ceil = set(maxs[maxs < ceil].index)
    got = set(
        r[0] for r in C.select_below_ceiling(sig, "text_len", ceil).select("conv_id").distinct().collect()
    )
    assert got == keep_ceil


def test_slice_and_topk(sig):
    head = C.slice_head(sig, 3).groupBy("conv_id").count().toPandas()
    assert (head["count"] <= 3).all()
    tail = C.slice_tail(sig, 2)
    t = tail.groupBy("conv_id").agg(F.max("turn_idx").alias("mx"), F.count("*").alias("n")).toPandas()
    full = sig.groupBy("conv_id").agg(F.max("turn_idx").alias("mx")).toPandas()
    m = t.merge(full, on="conv_id", suffixes=("", "_full"))
    assert (m["mx"] == m["mx_full"]).all()

    top2 = C.top_k_entities(sig, "token_est", 2)
    kept = set(r[0] for r in top2.select("conv_id").distinct().collect())
    totals = sig.groupBy("conv_id").agg(F.sum("token_est").alias("t")).toPandas()
    want = set(totals.sort_values(["t", "conv_id"], ascending=[False, True]).head(2)["conv_id"])
    assert kept == want


def test_asof_join_equal_ts_tie_break(spark):
    """ADVICE r1: two data rows sharing a timestamp — backward must carry
    the max-turn_idx row (pd.merge_asof last-in-stable-sort), forward the
    min-turn_idx row, independent of partition-sort luck."""
    import pandas as pd

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    data = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["c"] * 4,
                "ts": [t0, t0, t0 + pd.Timedelta("1h"), t0 + pd.Timedelta("1h")],
                "turn_idx": [0, 1, 2, 3],
                "v": [10.0, 11.0, 20.0, 21.0],
            }
        )
    )
    probes = spark.createDataFrame(
        pd.DataFrame({"conv_id": ["c", "c"], "probe_ts": [t0, t0 + pd.Timedelta("1h")]})
    )
    back = (
        asof_join(probes, data, ["v"])
        .toPandas()
        .sort_values("probe_ts")["v"]
        .tolist()
    )
    assert back == [11.0, 21.0]  # max turn_idx at each equal-ts group
    fwd = (
        asof_join(probes, data, ["v"], direction="forward")
        .toPandas()
        .sort_values("probe_ts")["v"]
        .tolist()
    )
    assert fwd == [10.0, 20.0]  # min turn_idx at each equal-ts group


def test_filter_by_intervals_inclusivity_and_entity(spark):
    """Generic interval membership: inclusive/exclusive bounds and the
    per-entity schedule variant (select_trading_hours semantics)."""
    import pandas as pd

    from sparkfeat.cleaning import filter_by_intervals, probes_after_open

    t = pd.Timestamp("2024-01-01 09:00:00")
    rows = pd.DataFrame(
        {
            "conv_id": ["a", "a", "a", "b"],
            "ts": [t, t + pd.Timedelta("4h"), t + pd.Timedelta("8h"), t],
            "v": [1.0, 2.0, 3.0, 4.0],
        }
    )
    df = spark.createDataFrame(rows)
    ivs = spark.createDataFrame(
        pd.DataFrame(
            {"open": [t], "close": [t + pd.Timedelta("8h")], "conv_id": ["a"]}
        )
    )
    # global schedule, inclusive both: all of a's rows + b at open
    assert filter_by_intervals(df, ivs.drop("conv_id")).count() == 4
    # exclusive bounds drop the endpoints
    assert (
        filter_by_intervals(
            df, ivs.drop("conv_id"), include_start=False, include_end=False
        ).count()
        == 1
    )
    # per-entity schedule: b has no interval
    assert filter_by_intervals(df, ivs, entity_col="conv_id").count() == 3

    probes = probes_after_open(ivs, minutes=90).toPandas()
    assert probes["probe_ts"].iloc[0] == t + pd.Timedelta("90min")


def test_drop_correlated_duplicates_keeps_higher_volume(spark):
    """A9 resolution: of a >0.999-correlated pair, the lower-total-volume
    entity is dropped (cleaning.py:473-495 semantics)."""
    import numpy as np
    import pandas as pd

    from sparkfeat.universe import drop_correlated_duplicates

    rng = np.random.default_rng(3)
    ts = pd.date_range("2024-01-01", periods=60, freq="6h")
    base = rng.normal(100, 10, size=60)
    rows = []
    for conv, (scale, vol) in {
        "dup_lo": (1.0, 1.0),
        "dup_hi": (2.0, 9.0),  # perfectly correlated with dup_lo, more volume
        "indep": (None, 5.0),
    }.items():
        series = base * scale if scale else rng.normal(100, 10, size=60)
        for t, v in zip(ts, series):
            rows.append((conv, t, float(v), vol))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "ts", "text_len", "token_est"])
    )
    out = drop_correlated_duplicates(
        df, "text_len", "token_est", bucket_seconds=21600, threshold=0.999
    )
    kept = {r["conv_id"] for r in out.select("conv_id").distinct().collect()}
    assert kept == {"dup_hi", "indep"}


def test_slice_range_iloc_parity(sig):
    """slice_range must match pandas iloc[start:end] per entity for
    every sign combination, out-of-range indices included (reference
    slice_data_dict semantics, cleaning.py:442-456)."""
    pdf = (
        sig.select("conv_id", "ts", "turn_idx")
        .toPandas()
        .sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort")
    )
    cases = [(2, 7), (0, None), (3, None), (-4, None), (-6, -2), (2, -1),
             (-3, 2), (5, 3), (0, 10_000), (-10_000, 2)]
    for start, end in cases:
        got = (
            C.slice_range(sig, start, end)
            .select("conv_id", "turn_idx")
            .toPandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        want = (
            pdf.groupby("conv_id", group_keys=False)
            .apply(lambda g: g.iloc[start:end] if end is not None else g.iloc[start:])
            [["conv_id", "turn_idx"]]
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False), (start, end)


def test_to_utc_matches_pandas(spark):
    """to_utc == pandas tz_localize(source).tz_convert('UTC') on
    unambiguous wall times, in both a DST zone (America/New_York,
    winter + summer offsets) and a fixed-offset zone (Asia/Kolkata)."""
    wall = pd.to_datetime(
        ["2024-01-15 09:30:00", "2024-07-15 09:30:00", "2024-03-09 12:00:00",
         "2024-11-02 12:00:00", "2024-06-01 00:00:00"]
    )
    pdf = pd.DataFrame({"i": range(len(wall)), "ts": wall})
    df = spark.createDataFrame(pdf)
    for tz in ("America/New_York", "Asia/Kolkata"):
        got = (
            C.to_utc(df, "ts", tz)
            .orderBy("i")
            .toPandas()["ts"]
            .dt.tz_localize(None)
        )
        want = wall.tz_localize(tz).tz_convert("UTC").tz_localize(None)
        assert list(got) == list(want), (tz, list(got), list(want))
