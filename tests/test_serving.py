"""Point-in-time serving lifecycle (SURVEY.md §3.2 create_predict_data):
fit artifacts (stats/bins tables) are persisted from the training range
and re-applied at serving time with no refit — zero leakage by
construction."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from sparkfeat.classify import apply_bins, fit_bins
from sparkfeat.normalize import apply_scaler, fit_stats
from sparkfeat.schema import with_turn_signals

CUTOFF = "2024-03-01 03:00:00"


@pytest.fixture(scope="module")
def sig(transcripts):
    return with_turn_signals(transcripts).cache()


def _latest_turns(df):
    w = Window.partitionBy("conv_id").orderBy(F.col("ts").desc(), F.col("turn_idx").desc())
    return df.withColumn("_r", F.row_number().over(w)).filter(F.col("_r") == 1).drop("_r")


def test_serving_reuses_training_fit(spark, sig, tmp_path):
    train = sig.filter(F.col("ts") <= CUTOFF)
    stats_path = str(tmp_path / "stats")
    # persist the fit artifact exactly as a production run would
    fit_stats(train, "text_len").write.mode("overwrite").parquet(stats_path)
    stats_train = spark.read.parquet(stats_path)

    served = _latest_turns(apply_scaler(sig, stats_train, "text_len", "standard"))
    got = served.select("conv_id", "text_len", "text_len_standard").toPandas()

    # oracle: per-conv mean/std computed on the TRAIN range only
    train_pdf = train.select("conv_id", "text_len").toPandas()
    mu = train_pdf.groupby("conv_id")["text_len"].mean()
    sd = train_pdf.groupby("conv_id")["text_len"].std(ddof=0)
    for r in got.itertuples():
        if r.conv_id not in mu.index or sd[r.conv_id] == 0:
            continue
        want = (r.text_len - mu[r.conv_id]) / sd[r.conv_id]
        np.testing.assert_allclose(r.text_len_standard, want, rtol=1e-12)

    # leakage check: serving stats must NOT equal full-history stats
    full_mu = (
        sig.select("conv_id", "text_len").toPandas().groupby("conv_id")["text_len"].mean()
    )
    assert any(abs(full_mu[c] - mu[c]) > 1e-9 for c in mu.index if c in full_mu.index)


def test_serving_bins_from_training_range(spark, sig):
    train = sig.filter(F.col("ts") <= CUTOFF)
    bins_train = fit_bins(train, "text_len", 5)
    served = _latest_turns(apply_bins(sig, bins_train, "text_len", 5, idx_col="b"))
    got = served.select("conv_id", "text_len", "b").toPandas()

    edges = bins_train.toPandas().set_index("conv_id")["edges"]
    for r in got.itertuples():
        if r.conv_id not in edges.index:
            continue
        e = np.array(edges[r.conv_id])
        v = r.text_len
        if v < e[0] or v > e[-1]:
            want = -1  # serve-time value outside training support
        elif v == e[-1]:
            want = 4
        else:
            want = int(np.searchsorted(e, v, side="right") - 1)
        assert r.b == want, (r.conv_id, v, e, r.b, want)
