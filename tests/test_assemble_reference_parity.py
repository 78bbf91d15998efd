"""Sample assembly (J6/G4) tests + parity against the reference's own
CSV fixtures (north star: numpy-allclose to the reference's
FinancialFeature fixtures).

The reference fixture is a wide hourly OHLCV CSV
(/root/reference/tests/resources/financial_data_dict/hourly/close.csv,
259 rows × 5 symbols); we melt it to the long transcript layout
(symbol → conv_id) and check our transforms against the reference's
formulas (transform.py) recomputed in pandas — including the float32
cast the reference applies on the hot path (rtol 1e-4, the tolerance
the reference's own golden tests use, test_financial.py:22). Skipped if
the reference tree is absent.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparkfeat import transforms as T
from sparkfeat.assemble import assemble_vectors, onehot_targets, purge_nan_rows
from sparkfeat.schema import with_turn_signals

REF_CSV = "/root/reference/tests/resources/financial_data_dict/hourly/close.csv"


def test_assemble_vectors_shapes(spark, transcripts):
    sig = with_turn_signals(transcripts)
    sig = sig.withColumn("lr", T.log_return("text_len"))
    out = assemble_vectors(sig, ["text_len", "lr"], length=8)
    pdf = out.toPandas()
    assert set(pdf.columns) == {"conv_id", "ts", "turn_idx", "text_len_vec", "lr_vec"}
    assert pdf["text_len_vec"].map(len).eq(8).all()
    assert pdf["lr_vec"].map(len).eq(8).all()
    # first 8 turns of each conv can't have a full lr window (lr[0] null)
    counts = pdf.groupby("conv_id")["turn_idx"].min()
    assert (counts >= 8).all()  # row k needs lr back to k-7, lr starts at 1
    # float32 cast applied
    v = pdf["text_len_vec"].iloc[0][0]
    assert np.asarray(v).dtype.kind == "f"


def test_assemble_zero_leakage(spark, transcripts):
    """Vector at turn t contains exactly the values at turns t-7..t."""
    sig = with_turn_signals(transcripts)
    out = assemble_vectors(sig, ["text_len"], length=8).toPandas()
    raw = (
        with_turn_signals(transcripts)
        .select("conv_id", "turn_idx", "text_len")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
    )
    for conv, g in raw.groupby("conv_id"):
        vals = g["text_len"].to_numpy()
        sub = out[out["conv_id"] == conv].sort_values("turn_idx")
        for r in sub.head(3).itertuples():
            t = r.turn_idx
            np.testing.assert_allclose(r.text_len_vec, vals[t - 7 : t + 1], rtol=1e-6)


def test_purge_nan_rows(spark):
    pdf = pd.DataFrame(
        {
            "id": [0, 1, 2],
            "a": [[1.0, 2.0], [np.nan, 2.0], [3.0, 4.0]],
            "b": [[1.0, 1.0], [1.0, 1.0], [np.nan, 1.0]],
        }
    )
    from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType

    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("a", ArrayType(DoubleType())),
            StructField("b", ArrayType(DoubleType())),
        ]
    )
    df = spark.createDataFrame(pdf, schema=schema)
    kept = purge_nan_rows(df, ["a", "b"]).select("id").toPandas()["id"].tolist()
    assert kept == [0]


def test_onehot_targets(spark):
    pdf = pd.DataFrame({"i": [0, 1, 2], "bin": pd.array([2, -1, None], dtype="Int32")})
    df = spark.createDataFrame(pdf)
    out = onehot_targets(df, "bin", nbins=4).toPandas().sort_values("i")
    assert list(out["y_onehot"].iloc[0]) == [0.0, 0.0, 1.0, 0.0]
    assert list(out["y_onehot"].iloc[1]) == [0.0, 0.0, 0.0, 0.0]
    assert out["y_onehot"].iloc[2] is None


# ---------------------------------------------------------------------------
# Reference-fixture parity
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_long(spark):
    if not os.path.exists(REF_CSV):
        pytest.skip("reference fixture tree not available")
    wide = pd.read_csv(REF_CSV, parse_dates=[0])
    wide = wide.rename(columns={wide.columns[0]: "ts"})
    long = wide.melt(id_vars="ts", var_name="conv_id", value_name="close")
    long["ts"] = pd.to_datetime(long["ts"], utc=True).dt.tz_localize(None)
    long = long.sort_values(["conv_id", "ts"]).reset_index(drop=True)
    long["turn_idx"] = long.groupby("conv_id").cumcount().astype("int32")
    return long, spark.createDataFrame(long)


def _ref_compare(sdf, pdf_long, col, oracle_fn, rtol=1e-4, atol=0.0):
    got = (
        sdf.select("conv_id", "turn_idx", col)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)[col]
        .to_numpy(dtype="float64")
    )
    want = (
        pdf_long.groupby("conv_id")["close"].transform(oracle_fn).to_numpy(dtype="float64")
    )
    mask = ~np.isnan(want)
    assert np.array_equal(np.isnan(got), np.isnan(want))
    np.testing.assert_allclose(got[mask], want[mask], rtol=rtol, atol=atol)


def test_reference_log_return_parity(ref_long):
    """transform.py:32-52 — log(pct_change+1) as float32, ±inf→nan,
    clip ±0.1 — on the reference's own close prices."""
    pdf, sdf = ref_long
    out = sdf.withColumn("lr", T.log_return("close").cast("float"))

    def oracle(s: pd.Series) -> pd.Series:
        r = np.log((s.pct_change() + 1).astype("float32"))
        r = pd.Series(r, index=s.index).replace([np.inf, -np.inf], np.nan)
        return r.clip(-0.1, 0.1)

    # reference computes the log itself in float32 (np.log(..., dtype=float32));
    # we compute float64 then downcast — absolute tolerance 1e-5 matches the
    # reference suite's ASSERT_NDECIMALS=5 (tests/feature/transform/__init__.py:1)
    _ref_compare(out, pdf, "lr", oracle, rtol=1e-4, atol=1e-5)


def test_reference_volatility_parity(ref_long):
    """transform.py:97-114 — rolling(window=10, min_periods=3).std()."""
    pdf, sdf = ref_long
    out = sdf.withColumn("vol", T.volatility("close", window=10))

    def oracle(s: pd.Series) -> pd.Series:
        # reference never shrink_tails the log-return before the rolling
        # std (transform.py:101-102) — unclipped, exactly as here
        lr = np.log(s.pct_change() + 1).replace([np.inf, -np.inf], np.nan)
        return lr.rolling(10, min_periods=3).std()

    _ref_compare(out, pdf, "vol", oracle, rtol=1e-6)


def test_reference_ewma_parity(ref_long):
    """transform.py:131-141 — ewm(halflife).mean()."""
    pdf, sdf = ref_long
    out = T.ewma(sdf, "close", halflife=12.0, out_col="e")
    _ref_compare(out, pdf, "e", lambda s: s.ewm(halflife=12.0).mean(), rtol=1e-9)


def test_reference_stochastic_k_parity(ref_long):
    """transform.py:117-128 — whole-window %K at the last row equals our
    trailing-window %K evaluated at that row."""
    pdf, sdf = ref_long
    n = int(pdf.groupby("conv_id").size().iloc[0])
    out = sdf.withColumn("k", T.stochastic_k("close", length=n))
    last = (
        out.toPandas().sort_values(["conv_id", "turn_idx"]).groupby("conv_id").last()
    )
    for conv, g in pdf.groupby("conv_id"):
        s = g["close"]
        want = 100 * (s.iloc[-1] - s.min()) / (s.max() - s.min())
        np.testing.assert_allclose(last.loc[conv, "k"], want, rtol=1e-9)


def test_reference_ker_parity(ref_long):
    """transform.py:144-166 — |Δ_lag| / rolling_lag_sum(|Δ1|)."""
    pdf, sdf = ref_long
    out = sdf.withColumn("ker", T.ker("close", lag=10))

    def oracle(s: pd.Series) -> pd.Series:
        direction = s.diff(10).abs()
        vol = s.diff(1).abs().rolling(10).sum()
        return (direction / vol).replace([np.inf, -np.inf], np.nan)

    _ref_compare(out, pdf, "ker", oracle, rtol=1e-9)


def test_reference_asof_window_selection(ref_long, spark):
    """feature/features/financial.py:241-250 — as-of 'pad' lookup + the
    preceding `length` rows: our assembled vector at the last row before
    an arbitrary probe equals the reference's window selection."""
    from sparkfeat.asof import asof_join

    pdf, sdf = ref_long
    length = 15
    vecs = assemble_vectors(sdf, ["close"], length=length, float32=False)
    # probe: 1 second after the 100th timestamp → pad selects row 100
    for conv, g in list(pdf.groupby("conv_id"))[:2]:
        probe_ts = g["ts"].iloc[100] + pd.Timedelta(seconds=1)
        probes = spark.createDataFrame(
            pd.DataFrame({"conv_id": [conv], "probe_ts": [probe_ts]})
        )
        got = asof_join(probes, vecs, ["close_vec"]).toPandas()["close_vec"].iloc[0]
        want = g["close"].iloc[100 - length + 1 : 101].to_numpy()
        np.testing.assert_allclose(np.array(got), want, rtol=1e-12)
