"""Config-driven pipeline assembly parity with the reference factory
(feature/factory.py + transformation/schemas.py): validation contracts
and end-to-end equality with directly-built plans."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkfeat.config import (
    InvalidConfigurationError,
    build_pipeline,
    parse_config,
)
from sparkfeat.schema import with_turn_signals

BASE = {
    "feature_config_list": [
        {"name": "text_len", "transformation": {"name": "value"}},
        {
            "name": "text_len",
            "transformation": {"name": "volatility", "window": 10},
            "normalization": "standard",
            "length": 10,
        },
        {
            "name": "token_est",
            "transformation": {"name": "ker", "lag": 5},
            "length": 5,
        },
        {
            "name": "text_len",
            "transformation": {"name": "log-return"},
            "nbins": 5,
            "is_target": True,
        },
    ],
    "fill_limit": 3,
    "n_forecasts": 2,
}


def test_single_target_assertion():
    # factory.py:32-40: exactly one target
    cfg = {k: v for k, v in BASE.items()}
    cfg["feature_config_list"] = [
        dict(f, is_target=True) for f in BASE["feature_config_list"][:2]
    ]
    with pytest.raises(InvalidConfigurationError, match="exactly one"):
        parse_config(cfg)
    cfg["feature_config_list"] = [
        dict(f, is_target=False) for f in BASE["feature_config_list"]
    ]
    with pytest.raises(InvalidConfigurationError, match="exactly one"):
        parse_config(cfg)


def test_unknown_names_rejected():
    bad = {
        "feature_config_list": [
            {"name": "text_len", "transformation": {"name": "wavelet"}, "is_target": True}
        ]
    }
    with pytest.raises(InvalidConfigurationError, match="unknown transformation"):
        parse_config(bad)
    bad2 = {
        "feature_config_list": [
            {"name": "text_len", "normalization": "zscore", "is_target": True}
        ]
    }
    with pytest.raises(InvalidConfigurationError, match="unknown normalization"):
        parse_config(bad2)


def test_end_to_end_matches_direct_plan(spark, transcripts):
    """The compiled pipeline's columns equal the directly-built
    operator calls (same transforms, same normalization, same one-hot
    target) on the shared fixture."""
    from sparkfeat import transforms as T
    from sparkfeat.normalize import apply_scaler, fit_stats

    sig = with_turn_signals(transcripts)
    out = build_pipeline(sig, parse_config(BASE))

    direct = sig.withColumn("vol", T.volatility("text_len", window=10))
    stats = fit_stats(direct, "vol")
    direct = apply_scaler(direct, stats, "vol", "standard", out_col="vol_z")

    got = (
        out.select("conv_id", "turn_idx", "text_len_volatility_scaled")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        direct.select("conv_id", "turn_idx", "vol_z")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    g = got["text_len_volatility_scaled"].to_numpy(dtype="float64")
    w = want["vol_z"].to_numpy(dtype="float64")
    mask = ~np.isnan(w)
    assert (np.isnan(g) == np.isnan(w)).all()
    np.testing.assert_allclose(g[mask], w[mask], rtol=1e-12)

    # target plumbing: 2 forecast leads + 5-bin one-hot present and valid
    row = out.filter(F.col("text_len_log-return_onehot").isNotNull()).first()
    assert "y_lead_1" in out.columns and "y_lead_2" in out.columns
    assert len(row["text_len_log-return_onehot"]) == 5
    assert sum(row["text_len_log-return_onehot"]) in (0.0, 1.0)


def test_pipeline_single_shuffle(transcripts):
    """The whole compiled plan (transforms + sessionize) still rides one
    hash(conv_id) exchange; normalization adds only broadcast joins."""
    import re

    sig = with_turn_signals(transcripts)
    cfg = parse_config(
        {
            "feature_config_list": [
                {"name": "text_len", "transformation": {"name": "volatility", "window": 10}},
                {"name": "text_len", "transformation": {"name": "value"}, "is_target": True},
            ]
        }
    )
    out = build_pipeline(sig, cfg)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning\(conv_id", plan)) <= 1, plan
