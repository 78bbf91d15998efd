"""Per-operator parity vs a pandas-recomputed oracle (SURVEY.md §5:
the reference tests each transform against inline pandas recomputation,
e.g. tests/feature/transform/test_log_return.py:44-49, asserting to 5
decimals — we assert to allclose 1e-9 except where float32 is at play).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparkfeat import transforms as T
from sparkfeat.schema import with_turn_signals
from sparkfeat.windows import ORDER_COLS

MAX_LOG_RETURN = 0.1


def _signal_pdf(transcripts_pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = transcripts_pdf.copy()
    pdf["text_len"] = pdf["text"].str.len().astype("float64")
    return pdf.sort_values(["conv_id", *ORDER_COLS]).reset_index(drop=True)


def _oracle_log_return(s: pd.Series) -> pd.Series:
    r = np.log(s.pct_change() + 1)
    r = r.replace([np.inf, -np.inf], np.nan)
    return r.clip(-MAX_LOG_RETURN, MAX_LOG_RETURN)


def _collect(df, col):
    pdf = (
        df.select("conv_id", *ORDER_COLS, col)
        .toPandas()
        .sort_values(["conv_id", *ORDER_COLS])
        .reset_index(drop=True)
    )
    return pdf[col].to_numpy(dtype="float64")


def _assert_close(got, want, **kw):
    assert got.shape == want.shape
    assert np.array_equal(np.isnan(got), np.isnan(want)), "null masks differ"
    np.testing.assert_allclose(got[~np.isnan(want)], want[~np.isnan(want)], **kw)


@pytest.fixture(scope="module")
def sig(spark, transcripts):
    return with_turn_signals(transcripts).cache()


@pytest.fixture(scope="module")
def sig_pdf(transcripts_pdf):
    return _signal_pdf(transcripts_pdf)


def test_log_return_parity(sig, sig_pdf):
    got = _collect(sig.withColumn("lr", T.log_return("text_len")), "lr")
    want = (
        sig_pdf.groupby("conv_id")["text_len"].transform(_oracle_log_return).to_numpy()
    )
    _assert_close(got, want, rtol=1e-12)


def _oracle_log_return_raw(s: pd.Series) -> pd.Series:
    r = np.log(s.pct_change() + 1)
    return r.replace([np.inf, -np.inf], np.nan)


def test_volatility_parity(sig, sig_pdf):
    # reference volatility never shrink_tails (transform.py:101-102):
    # std of UNCLIPPED log-returns
    got = _collect(sig.withColumn("vol", T.volatility("text_len", window=10)), "vol")
    want = (
        sig_pdf.groupby("conv_id")["text_len"]
        .transform(lambda s: _oracle_log_return_raw(s).rolling(10, min_periods=3).std())
        .to_numpy()
    )
    _assert_close(got, want, rtol=1e-9)


def test_volatility_clip_opt_in(sig, sig_pdf):
    got = _collect(
        sig.withColumn("vol", T.volatility("text_len", window=10, clip=MAX_LOG_RETURN)),
        "vol",
    )
    want = (
        sig_pdf.groupby("conv_id")["text_len"]
        .transform(lambda s: _oracle_log_return(s).rolling(10, min_periods=3).std())
        .to_numpy()
    )
    _assert_close(got, want, rtol=1e-9)


def test_stochastic_k_parity(sig, sig_pdf):
    got = _collect(sig.withColumn("k", T.stochastic_k("text_len", length=14)), "k")

    def oracle(s: pd.Series) -> pd.Series:
        mn = s.rolling(14, min_periods=1).min()
        mx = s.rolling(14, min_periods=1).max()
        out = 100 * (s - mn) / (mx - mn)
        return out.replace([np.inf, -np.inf], np.nan)

    want = sig_pdf.groupby("conv_id")["text_len"].transform(oracle).to_numpy()
    _assert_close(got, want, rtol=1e-12)


def test_ker_parity(sig, sig_pdf):
    lag = 5
    got = _collect(sig.withColumn("ker", T.ker("text_len", lag=lag)), "ker")

    def oracle(s: pd.Series) -> pd.Series:
        direction = s.diff(lag).abs()
        vol = s.diff(1).abs().rolling(lag).sum()
        out = direction / vol
        return out.replace([np.inf, -np.inf], np.nan)

    want = sig_pdf.groupby("conv_id")["text_len"].transform(oracle).to_numpy()
    _assert_close(got, want, rtol=1e-12)


def test_ewma_parity_exact(sig, sig_pdf):
    got = _collect(T.ewma(sig, "text_len", halflife=7.5, out_col="e"), "e")
    want = (
        sig_pdf.groupby("conv_id")["text_len"]
        .transform(lambda s: s.ewm(halflife=7.5).mean())
        .to_numpy()
    )
    _assert_close(got, want, rtol=1e-12)


def test_ewma_with_nans_matches_pandas(spark):
    rng = np.random.default_rng(3)
    x = rng.normal(size=300)
    x[rng.integers(0, 300, 40)] = np.nan
    pdf = pd.DataFrame(
        {
            "conv_id": "c0",
            "turn_idx": np.arange(300, dtype="int32"),
            "ts": pd.date_range("2024-01-01", periods=300, freq="1min"),
            "v": x,
        }
    )
    df = spark.createDataFrame(pdf)
    got = _collect(T.ewma(df, "v", halflife=4.0, out_col="e"), "e")
    want = pdf["v"].ewm(halflife=4.0).mean().to_numpy()
    _assert_close(got, want, rtol=1e-12)


def test_ewma_chunked_equals_unchunked(sig):
    plain = _collect(T.ewma(sig, "text_len", halflife=3.0, out_col="e"), "e")
    chunked = _collect(
        T.ewma(sig, "text_len", halflife=3.0, out_col="e", chunk_size=16), "e"
    )
    _assert_close(chunked, plain, rtol=1e-10)


def test_ewma_tiny_halflife_no_overflow(spark):
    # halflife ≪ block: scale factor 2^(i/h) must not overflow (blocked cumsum).
    n = 5000
    pdf = pd.DataFrame(
        {
            "conv_id": "c0",
            "turn_idx": np.arange(n, dtype="int32"),
            "ts": pd.date_range("2024-01-01", periods=n, freq="1s"),
            "v": np.sin(np.arange(n) / 10.0),
        }
    )
    df = spark.createDataFrame(pdf)
    got = _collect(T.ewma(df, "v", halflife=0.5, out_col="e"), "e")
    want = pdf["v"].ewm(halflife=0.5).mean().to_numpy()
    assert np.isfinite(got).all()
    _assert_close(got, want, rtol=1e-9)


def test_gasf_known_values():
    # hand-computed: x=[-1,0,1] (already image_size-long, scaled to [-1,1])
    img = T.gasf_image(np.array([0.0, 1.0, 2.0]), image_size=3)
    cos = np.array([-1.0, 0.0, 1.0])
    sin = np.sqrt(1 - cos**2)
    want = (np.outer(cos, cos) - np.outer(sin, sin)).ravel()
    np.testing.assert_allclose(img, want, atol=1e-12)


def test_gadf_antisymmetric():
    img = T.gadf_image(np.arange(16.0), image_size=4).reshape(4, 4)
    np.testing.assert_allclose(img, -img.T, atol=1e-12)
    np.testing.assert_allclose(np.diag(img), 0.0, atol=1e-12)


def test_mtf_rows_are_probabilities():
    img = T.mtf_image(np.sin(np.arange(64.0)), image_size=8)
    assert img.shape == (64,)
    assert (img >= 0).all() and (img <= 1).all()


def test_window_image_feature_shapes(sig):
    out = T.window_image_feature(sig, "text_len", length=16, image_size=4, kind="gasf")
    pdf = out.select("conv_id", "text_len_gasf").toPandas()
    lens = pdf["text_len_gasf"].dropna().map(len).unique()
    assert list(lens) == [16]
    # conversations shorter than the window produce only nulls
    short = pdf[pdf["conv_id"] == "conv004"]
    assert short["text_len_gasf"].isna().all()


def test_zero_leakage_truncation_audit(sig):
    """North-rule audit: features at ts_t computed on data truncated at
    ts_t equal the full-history values bit-for-bit (trailing frames
    only ⇒ no future reads)."""
    full = (
        sig.withColumn("lr", T.log_return("text_len"))
        .withColumn("vol", T.volatility("text_len", 10))
        .withColumn("k", T.stochastic_k("text_len", 14))
    )
    cutoff = "2024-03-01 03:00:00"
    trunc_in = sig.filter(F.col("ts") <= cutoff)
    trunc = (
        trunc_in.withColumn("lr", T.log_return("text_len"))
        .withColumn("vol", T.volatility("text_len", 10))
        .withColumn("k", T.stochastic_k("text_len", 14))
    )
    cols = ["conv_id", "turn_idx", "lr", "vol", "k"]
    a = (
        full.filter(F.col("ts") <= cutoff)
        .select(cols)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    b = trunc.select(cols).toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_ewma_sorted_equals_plain(sig):
    from sparkfeat.windows import repartition_sorted

    sorted_sig = repartition_sorted(sig)
    fast = T.ewma_sorted(
        sorted_sig,
        [("text_len", 7.5, "e1"), ("text_len", 2.0, "e2")],
    )
    got1 = _collect(fast, "e1")
    got2 = _collect(fast, "e2")
    want1 = _collect(T.ewma(sig, "text_len", 7.5, out_col="e1"), "e1")
    want2 = _collect(T.ewma(sig, "text_len", 2.0, out_col="e2"), "e2")
    _assert_close(got1, want1, rtol=1e-12)
    _assert_close(got2, want2, rtol=1e-12)


def test_ewma_sorted_cross_batch_carry(spark):
    """Force conversations to span Arrow batches (tiny batch size) —
    the carried (S, W) state must keep results exact."""
    import pandas as pd

    from sparkfeat.windows import repartition_sorted

    n = 5000
    pdf = pd.DataFrame(
        {
            "conv_id": np.repeat([f"c{i}" for i in range(4)], n // 4),
            "turn_idx": np.tile(np.arange(n // 4, dtype="int32"), 4),
            "ts": np.tile(
                pd.date_range("2024-01-01", periods=n // 4, freq="1min"), 4
            ),
            "v": np.random.default_rng(9).normal(size=n),
        }
    )
    df = repartition_sorted(spark.createDataFrame(pdf), entity_col="conv_id")
    small_batches = df.sparkSession.conf.get(
        "spark.sql.execution.arrow.maxRecordsPerBatch"
    )
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "100")
    try:
        got = (
            T.ewma_sorted(df, [("v", 4.0, "e")])
            .select("conv_id", "turn_idx", "e")
            .toPandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)["e"]
            .to_numpy()
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", small_batches)
    want = (
        pdf.sort_values(["conv_id", "turn_idx"])
        .groupby("conv_id")["v"]
        .transform(lambda s: s.ewm(halflife=4.0).mean())
        .to_numpy()
    )
    _assert_close(got, want, rtol=1e-10)


# ---------------------------------------------------------------------------
# running_drawdown / cumulative_log_return (expanding T-family members)
# ---------------------------------------------------------------------------


def test_running_drawdown_matches_pandas_cummax(spark, transcripts):
    import pandas as pd
    from pyspark.sql import functions as F

    from sparkfeat.transforms import running_drawdown

    got = (
        transcripts.select(
            "conv_id",
            "turn_idx",
            F.length("text").cast("double").alias("v"),
            running_drawdown(F.length("text").cast("double")).alias("dd"),
        )
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
    )
    for _, g in got.groupby("conv_id"):
        peak = g["v"].cummax()
        exp = (1.0 - g["v"] / peak).where(peak > 0)
        pd.testing.assert_series_equal(
            g["dd"].reset_index(drop=True),
            exp.reset_index(drop=True),
            check_names=False,
            atol=1e-12,
            rtol=0,
        )


def test_running_drawdown_zero_at_peaks_and_null_guard(spark):
    from pyspark.sql import functions as F

    from sparkfeat.transforms import running_drawdown

    rows = [
        ("c", 0, 10.0),
        ("c", 1, 20.0),   # fresh peak -> 0
        ("c", 2, 5.0),    # 1 - 5/20 = 0.75
        ("c", 3, None),   # null value -> null
        ("c", 4, 40.0),   # new peak -> 0
        ("z", 0, -3.0),   # non-positive peak -> null
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, v double")
    df = df.withColumn("ts", F.to_timestamp(F.lit("2024-01-01")) + F.make_interval(secs=F.col("turn_idx")))
    out = {
        (r["conv_id"], r["turn_idx"]): r["dd"]
        for r in df.select(
            "conv_id",
            "turn_idx",
            running_drawdown(F.col("v")).alias("dd"),
        ).collect()
    }
    assert out[("c", 0)] == 0.0 and out[("c", 1)] == 0.0
    assert abs(out[("c", 2)] - 0.75) < 1e-12
    assert out[("c", 3)] is None
    assert out[("c", 4)] == 0.0
    assert out[("z", 0)] is None


def test_cumulative_log_return_telescopes(spark):
    import math

    from pyspark.sql import functions as F

    from sparkfeat.transforms import cumulative_log_return

    # small steps (under the clip): cum lr telescopes to ln(v_t / v_0)
    vals = [100.0, 104.0, 99.0, 103.0, 108.0]
    rows = [("c", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, v double")
    df = df.withColumn("ts", F.to_timestamp(F.lit("2024-01-01")) + F.make_interval(secs=F.col("turn_idx")))
    out = {
        r["turn_idx"]: r["clr"]
        for r in df.select(
            "turn_idx", cumulative_log_return(F.col("v"), clip=0.1).alias("clr")
        ).collect()
    }
    assert out[0] is None  # no step yet: SUM of zero rows is null
    for i in range(1, len(vals)):
        assert abs(out[i] - math.log(vals[i] / vals[0])) < 1e-9
    # a clipped step caps the contribution at +-0.1
    rows2 = [("d", 0, 100.0), ("d", 1, 1000.0)]
    df2 = spark.createDataFrame(rows2, "conv_id string, turn_idx int, v double")
    df2 = df2.withColumn("ts", F.to_timestamp(F.lit("2024-01-01")) + F.make_interval(secs=F.col("turn_idx")))
    r2 = {
        r["turn_idx"]: r["clr"]
        for r in df2.select(
            "turn_idx", cumulative_log_return(F.col("v"), clip=0.1).alias("clr")
        ).collect()
    }
    assert abs(r2[1] - 0.1) < 1e-12
