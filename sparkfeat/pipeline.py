"""Feature pipeline: descriptors → one windowed DataFrame plan.

The reference's lifecycle (SURVEY.md §3.1: config → feature factory →
per-date pool fan-out → normalization → classification → stacking)
collapses here into a single declarative plan: scan → derive signals →
windowed transforms per conv_id → (optional) fit/apply normalization →
feature-vector assembly. One shuffle (hash(conv_id)); every prediction
timestamp is computed in the same pass — the reference re-selects the
trailing window once per prediction date (transformation/financial.py:96-101),
an O(dates × history) rescan this design eliminates.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkfeat import transforms as T
from sparkfeat.windows import repartition_sorted, sessionize


@dataclass(frozen=True)
class FeatureSpec:
    """Mirror of the reference's feature descriptor
    (``feature/features/financial.py:25-82``): name/transform/params,
    naming convention ``{name}_{transform}`` (financial.py:84-91)."""

    name: str  # source signal column (e.g. text_len)
    transformation: str  # registry key
    params: dict = field(default_factory=dict)
    is_target: bool = False

    @property
    def full_name(self) -> str:
        return f"{self.name}_{self.transformation}"


def apply_features(df: DataFrame, specs: list[FeatureSpec]) -> DataFrame:
    """Append one column per feature spec; column-expression transforms
    fuse into a single window stage, frame transforms (ewma/images) add
    their own Arrow stages."""
    for spec in specs:
        p = dict(spec.params)
        if spec.transformation in T.COLUMN_TRANSFORMS:
            builder = T.COLUMN_TRANSFORMS[spec.transformation]
            df = df.withColumn(spec.full_name, builder(spec.name, **p))
        elif spec.transformation == "ewma":
            df = T.ewma(df, spec.name, out_col=spec.full_name, **p)
        elif spec.transformation in ("gasf", "gadf", "mtf"):
            df = T.window_image_feature(
                df, spec.name, kind=spec.transformation, out_col=spec.full_name, **p
            )
        else:
            raise KeyError(f"unknown transformation {spec.transformation!r}")
    return df


DEFAULT_SPECS = [
    FeatureSpec("text_len", "value"),
    FeatureSpec("text_len", "log-return"),
    FeatureSpec("text_len", "volatility", {"window": 10}),
    FeatureSpec("text_len", "stochastic_k", {"length": 14}),
    FeatureSpec("token_est", "ker", {"lag": 5}),
]

#: production-shaped feature set (~24 windowed features over 2 signals) —
#: what a real training pipeline computes per pass; used by the scaling
#: bench so the measured job has production CPU-per-row, all in ONE
#: window stage after the single sort.
WIDE_SPECS = [
    FeatureSpec("text_len", "value"),
    *[FeatureSpec("text_len", "volatility", {"window": w}) for w in (5, 10, 20, 40)],
    *[FeatureSpec("text_len", "stochastic_k", {"length": n}) for n in (7, 14, 28, 56)],
    *[FeatureSpec("text_len", "ker", {"lag": k}) for k in (3, 5, 10, 20)],
    FeatureSpec("token_est", "log-return"),
    *[FeatureSpec("token_est", "volatility", {"window": w}) for w in (5, 10, 20)],
    *[FeatureSpec("token_est", "stochastic_k", {"length": n}) for n in (7, 14, 28)],
    *[FeatureSpec("token_est", "ker", {"lag": k}) for k in (3, 5, 10)],
]


def flagship_features(
    df: DataFrame,
    specs: list[FeatureSpec] | None = None,
    gap_seconds: float = 1800.0,
    partitions: int | None = None,
    pre_partitioned: bool = False,
) -> DataFrame:
    """The flagship point-in-time feature plan over a transcript table.

    scan → repartition(hash(conv_id)) + sortWithinPartitions → derive
    per-turn signals → sessionize → windowed transforms → one feature row
    per (conv_id, ts, turn_idx). Text is carried through untouched
    (per-turn text equality invariant).

    ``pre_partitioned=True`` — the steady-state 100 TB path: the input
    is an Iceberg/bucketed table already hash-distributed by conv_id
    and sorted by (conv_id, ts, turn_idx), so the explicit exchange is
    skipped and the whole plan is shuffle-free (scan → window).
    """
    from sparkfeat.schema import with_turn_signals

    specs = DEFAULT_SPECS if specs is None else specs
    out = df if pre_partitioned else repartition_sorted(df, partitions)
    out = with_turn_signals(out)
    out = sessionize(out, gap_seconds=gap_seconds)
    out = apply_features(out, specs)
    return out
