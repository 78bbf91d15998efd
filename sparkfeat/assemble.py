"""Training-sample assembly: stacking + NaN purge + float32 cast
(SURVEY.md §2 J6, G4; reference ``stack_samples_for_each_feature``
``transformation/base.py:400-429`` and ``_remove_nans_from_dict``
``transformation/financial.py:344-381``).

The reference materializes per-prediction-date ndarray dicts
``[n_samples, n_timesteps, n_symbols]``. Long-format re-expression: one
row per (conv_id, prediction point) carrying each feature's trailing
window as an ``array<float>`` column — the consumer's tensor assembly
is a reshape, and sample alignment across features is positional within
the row (no join: every feature is computed in the same plan, J6's
"intersect sample sets" is free).

Zero leakage: windows are trailing collect_list frames; targets (if
any) come from :func:`sparkfeat.asof.with_targets` lead columns and are
purged/validated the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkfeat.windows import trailing


def assemble_vectors(
    df: DataFrame,
    feature_cols: list[str],
    length: int,
    entity_col: str = "conv_id",
    keep_cols: tuple[str, ...] = ("ts", "turn_idx"),
    float32: bool = True,
    require_full: bool = True,
) -> DataFrame:
    """One training row per (entity, turn): each feature's trailing
    ``length`` values as an array column ``{feature}_vec``.

    * ``float32=True`` replicates the reference's hot-path downcast
      (transformation/financial.py:149-150) — parity fixtures carry
      float32 rounding.
    * ``require_full=True`` drops rows whose window is shorter than
      ``length`` (the reference rejects wrong-dimension samples,
      base.py:111-125).
    """
    fr = trailing(length, entity_col)
    elem = "float" if float32 else "double"
    out = df
    for c in feature_cols:
        vec = F.collect_list(F.col(c).cast(elem)).over(fr)
        out = out.withColumn(f"{c}_vec", vec)
    vec_cols = [f"{c}_vec" for c in feature_cols]
    if require_full:
        # collect_list skips nulls ⇒ size < length also catches windows
        # containing nulls: exactly G4's "any NaN anywhere ⇒ drop sample"
        cond = None
        for vc in vec_cols:
            c = F.size(vc) == length
            cond = c if cond is None else (cond & c)
        out = out.filter(cond)
    return out.select(entity_col, *keep_cols, *vec_cols)


def purge_nan_rows(df: DataFrame, array_cols: list[str]) -> DataFrame:
    """G4 standalone: drop rows where any array feature contains NaN
    (``_remove_nans_from_dict``, transformation/financial.py:344-381)."""
    cond = None
    for c in array_cols:
        # null elements count as invalid too (Arrow frequently surfaces
        # pandas NaN as null in array columns)
        has_bad = F.exists(F.col(c), lambda x: x.isNull() | F.isnan(x))
        keep = F.col(c).isNotNull() & ~has_bad
        cond = keep if cond is None else (cond & keep)
    return df.filter(cond)


def onehot_targets(
    df: DataFrame,
    bin_idx_col: str,
    nbins: int,
    out_col: str = "y_onehot",
) -> DataFrame:
    """y-path one-hot assembly (``[n_samples, n_bins]``; reference emits
    float arrays, tests/transformation/.../test_financial_create_data.py:52-53):
    out-of-range (−1) ⇒ zero vector, null ⇒ null."""
    i = F.col(bin_idx_col)
    arr = F.transform(
        F.sequence(F.lit(0), F.lit(nbins - 1)),
        lambda k: F.when(k == i, F.lit(1.0)).otherwise(F.lit(0.0)).cast("float"),
    )
    return df.withColumn(out_col, F.when(i.isNull(), F.lit(None)).otherwise(arr))
