"""Config-driven pipeline assembly — the reference's user-facing API.

A reference user describes the whole run as a validated config dict:
``transformation/schemas.py`` (DataTransformationConfigurationSchema:
fill_limit, n_classification_bins, classify/normalise_per_series,
feature_config_list, n_forecasts) plus one feature dict per feature
(``feature/factory.py:42-68``: name, transformation {name, ...params},
normalization, nbins, length, is_target) with exactly ONE target
(``factory.py:32-40`` ``_assert_single_target``). This module accepts
the same shape and compiles it into the single declarative Spark plan:

    transforms  → pipeline.apply_features (trailing windows, length
                  = the reference's ticks count)
    normalization → normalize.fit_stats/apply_scaler per feature
                  (per-series or global, financial.py:121-171)
    target      → asof.with_targets (n_forecasts leads) + optional
                  classification (classify.fit_bins/apply_bins one-hot)
    gap filling → resample.ffill limit = fill_limit

Validation mirrors the marshmallow schema semantics: unknown
transformations, multiple targets, or a missing target raise
``InvalidConfigurationError`` before any job runs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from sparkfeat import transforms as T
from sparkfeat.pipeline import FeatureSpec, apply_features

KNOWN_TRANSFORMS = set(T.COLUMN_TRANSFORMS) | set(T.FRAME_TRANSFORMS)
KNOWN_NORMALIZATIONS = {None, "standard", "min_max", "robust", "gaussian"}


class InvalidConfigurationError(ValueError):
    """Reference twin of transformation/schemas.py
    InvalidConfigurationException."""


@dataclass(frozen=True)
class FeatureConfig:
    """One entry of ``feature_config_list`` (factory.py:42-68)."""

    name: str
    transformation: dict = field(default_factory=lambda: {"name": "value"})
    normalization: str | None = None
    nbins: int | None = None
    length: int = 1
    is_target: bool = False
    classify_per_series: bool = True
    normalise_per_series: bool = True

    @property
    def transform_name(self) -> str:
        return self.transformation.get("name", "value")

    @property
    def full_name(self) -> str:
        return f"{self.name}_{self.transform_name}"


@dataclass(frozen=True)
class PipelineConfig:
    """DataTransformationConfigurationSchema twin (schemas.py:15-31),
    minus the market-calendar fields the transcript engine replaces with
    gap sessionization (SURVEY §1.4)."""

    features: tuple[FeatureConfig, ...]
    fill_limit: int | None = None
    n_forecasts: int = 1
    gap_seconds: float = 1800.0


def parse_config(raw: dict) -> PipelineConfig:
    """Validate a reference-shaped dict → PipelineConfig.

    Enforces the schema's contracts up front: known transformation and
    normalization names, positive lengths, integer n_forecasts, and
    exactly one target feature."""
    feats = []
    for fc in raw.get("feature_config_list", []):
        cfg = FeatureConfig(
            name=fc["name"],
            transformation=fc.get("transformation", {"name": "value"}),
            normalization=fc.get("normalization"),
            nbins=fc.get("nbins"),
            length=int(fc.get("length", 1)),
            is_target=bool(fc.get("is_target", False)),
            classify_per_series=bool(fc.get("classify_per_series", True)),
            normalise_per_series=bool(fc.get("normalise_per_series", True)),
        )
        if cfg.transform_name not in KNOWN_TRANSFORMS:
            raise InvalidConfigurationError(
                f"unknown transformation {cfg.transform_name!r} "
                f"(known: {sorted(KNOWN_TRANSFORMS)})"
            )
        if cfg.normalization not in KNOWN_NORMALIZATIONS:
            raise InvalidConfigurationError(
                f"unknown normalization {cfg.normalization!r}"
            )
        if cfg.length < 1:
            raise InvalidConfigurationError(f"length must be >= 1: {cfg}")
        if cfg.nbins is not None and cfg.nbins < 2:
            raise InvalidConfigurationError(f"nbins must be >= 2: {cfg}")
        feats.append(cfg)
    targets = [f for f in feats if f.is_target]
    if len(targets) != 1:
        raise InvalidConfigurationError(
            f"exactly one feature must be the target, found {len(targets)}"
        )
    n_forecasts = int(raw.get("n_forecasts", 1))
    if n_forecasts < 1:
        raise InvalidConfigurationError("n_forecasts must be >= 1")
    return PipelineConfig(
        features=tuple(feats),
        fill_limit=raw.get("fill_limit"),
        n_forecasts=n_forecasts,
        gap_seconds=float(raw.get("gap_seconds", 1800.0)),
    )


def _to_spec(fc: FeatureConfig) -> FeatureSpec:
    params = {k: v for k, v in fc.transformation.items() if k != "name"}
    if fc.transform_name in ("volatility",) and "window" not in params:
        params["window"] = fc.length
    if fc.transform_name == "stochastic_k" and "length" not in params:
        params["length"] = fc.length
    if fc.transform_name in ("gasf", "gadf", "mtf") and "length" not in params:
        params["length"] = fc.length
    return FeatureSpec(fc.name, fc.transform_name, params, fc.is_target)


def build_pipeline(df: DataFrame, config: PipelineConfig) -> DataFrame:
    """Compile the validated config into ONE DataFrame plan.

    Input: a transcript table with the signal columns already derived
    (``schema.with_turn_signals``). Output columns per feature:
    ``{name}_{transform}`` (the reference naming, financial.py:84-91),
    plus ``{full}_scaled`` when normalized, ``y_lead_k`` target leads,
    and ``{target}_bin``/``{target}_onehot`` when the target declares
    nbins. All stages share the one hash(conv_id) partitioning."""
    from sparkfeat.asof import with_targets
    from sparkfeat.classify import apply_bins, fit_bins
    from sparkfeat.normalize import apply_scaler, fit_stats
    from sparkfeat.windows import repartition_sorted, sessionize

    out = sessionize(repartition_sorted(df), gap_seconds=config.gap_seconds)
    out = apply_features(out, [_to_spec(f) for f in config.features])

    for fc in config.features:
        if fc.normalization:
            entity = "conv_id" if fc.normalise_per_series else None
            stats = fit_stats(out, fc.full_name, entity_col=entity)
            out = apply_scaler(
                out,
                stats,
                fc.full_name,
                fc.normalization,
                out_col=f"{fc.full_name}_scaled",
                entity_col=entity,
            )

    target = next(f for f in config.features if f.is_target)
    out = with_targets(
        out, target.full_name, list(range(1, config.n_forecasts + 1))
    )
    if target.nbins:
        entity = "conv_id" if target.classify_per_series else None
        bins = fit_bins(out, target.full_name, target.nbins, entity_col=entity)
        out = apply_bins(
            out,
            bins,
            target.full_name,
            target.nbins,
            entity_col=entity,
            idx_col=f"{target.full_name}_bin",
            onehot_col=f"{target.full_name}_onehot",
        )
    return out
