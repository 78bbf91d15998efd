"""Resample-and-fill: time-bucket aggregation, grid densification,
limited forward-fill, linear interpolation (SURVEY.md §2.4 A1–A4, §2.6
G1–G3; north rule "resample-and-fill backfill").

Reference semantics preserved exactly:

* ``resample_data_frame`` (cleaning.py:88-101): rule built as
  ``f'{minutes}T'`` (resampling.py:30-34), **label='right',
  closed='right'** — a row at exactly a boundary belongs to the bucket
  it closes. Re-expressed on epoch microseconds:
  ``bucket_end = floor((us - 1)/dur)·dur + dur`` (exact integer math,
  engine-portable).
* per-field agg map open→first / high→max / low→min / close→last /
  volume→sum (cleaning.py:126-142); first/last are order-dependent →
  ``min_by``/``max_by`` on the (ts, turn_idx) struct.
* ``fill_gaps`` (cleaning.py:221-265): ``fillna(method='ffill',
  limit=k)`` ⇒ ``last(v, ignorenulls)`` over a ``(-k, 0)`` rows frame —
  a null further than k rows from the last valid stays null.
* ``interpolate_gaps`` (cleaning.py:268-316): linear,
  ``limit_direction='forward'`` — leading nulls stay, interior nulls
  blend prev/next valid by row distance, trailing nulls clamp to the
  last valid value (np.interp edge behavior), all subject to ``limit``
  consecutive fills.

Scale note: densification emits |entities| × |grid| rows; the grid is
generated per entity with ``sequence``+``explode`` (no driver loop, no
cross join with a materialized calendar), and every fill is a bounded
window over the same conv_id partitioning — one shuffle end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparkfeat.windows import w_entity

AGG_FUNCS = ("mean", "median", "sum", "first", "last", "min", "max", "count")


def _bucket_end_us(ts_col: str, dur_us: int):
    # pure integer arithmetic (no double division): a boundary row closes
    # its own bucket (closed='right'), identical in any engine.
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return ((us - 1) - (us - 1) % dur_us + dur_us).cast("long")


def resample(
    df: DataFrame,
    freq_seconds: int,
    aggs: dict[str, str],
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    bucket_col: str = "bucket_ts",
) -> DataFrame:
    """A1/A2/A3 time-bucket aggregate, right-closed/right-labeled.

    ``aggs`` maps value column → one of AGG_FUNCS. Result: one row per
    (entity, non-empty bucket); bucket label = bucket end (pandas
    label='right'). Empty buckets are absent — densify() restores them.
    """
    dur_us = int(freq_seconds) * 1_000_000
    order = F.struct(F.col(ts_col), F.col("turn_idx")) if "turn_idx" in df.columns else F.col(ts_col)
    exprs = []
    for col, fn in aggs.items():
        if fn == "mean":
            e = F.avg(col)
        elif fn == "median":
            e = F.percentile(F.col(col), F.lit(0.5))
        elif fn == "sum":
            e = F.sum(col)
        elif fn == "min":
            e = F.min(col)
        elif fn == "max":
            e = F.max(col)
        elif fn == "count":
            e = F.count(col)
        elif fn == "first":
            e = F.min_by(F.col(col), order)
        elif fn == "last":
            e = F.max_by(F.col(col), order)
        else:
            raise ValueError(f"unsupported agg {fn!r} (one of {AGG_FUNCS})")
        exprs.append(e.alias(f"{col}_{fn}"))
    bucket = _bucket_end_us(ts_col, dur_us)
    return (
        df.groupBy(F.col(entity_col), F.timestamp_micros(bucket).alias(bucket_col))
        .agg(*exprs)
    )


def densify(
    df: DataFrame,
    freq_seconds: int,
    entity_col: str = "conv_id",
    bucket_col: str = "bucket_ts",
) -> DataFrame:
    """G3: restore the full per-entity bucket grid (resample emits only
    non-empty buckets; pandas resample emits the whole range).

    Per entity: grid = sequence(min_bucket, max_bucket, step) exploded,
    left-joined back. The grid join is conv_id-equi + bucket-equi, so it
    co-partitions with the data — no broadcast of a global calendar, no
    skew (grid size is per-entity span / freq).
    """
    step_us = int(freq_seconds) * 1_000_000
    span = df.groupBy(entity_col).agg(
        F.min(bucket_col).alias("_mn"), F.max(bucket_col).alias("_mx")
    )
    grid = span.select(
        entity_col,
        F.explode(
            F.sequence(
                F.unix_micros(F.col("_mn").cast("timestamp")),
                F.unix_micros(F.col("_mx").cast("timestamp")),
                F.lit(step_us),
            )
        ).alias("_us"),
    ).select(entity_col, F.timestamp_micros(F.col("_us")).alias(bucket_col))
    return grid.join(df, [entity_col, bucket_col], "left")


def ffill(
    df: DataFrame,
    cols: list[str],
    limit: int | None = None,
    entity_col: str = "conv_id",
    ts_col: str = "bucket_ts",
    suffix: str = "_filled",
) -> DataFrame:
    """G1 limited forward fill (cleaning.py:221-265)."""
    w = Window.partitionBy(entity_col).orderBy(ts_col)
    frame = w.rowsBetween(-limit if limit is not None else Window.unboundedPreceding, 0)
    for c in cols:
        df = df.withColumn(c + suffix, F.last(F.col(c), ignorenulls=True).over(frame))
    return df


def drop_nan_entities(
    df: DataFrame, cols: list[str], entity_col: str = "conv_id"
) -> DataFrame:
    """G1/G2 ``dropna=True`` option (cleaning.py:246-250: after gap
    filling, drop COLUMNS — i.e. entities in the long layout — that
    still contain any NaN). One pass to find offending entities (tiny
    set), broadcast anti-join back; the fact side never shuffles."""
    cond = None
    for c in cols:
        bad = F.col(c).isNull() | F.isnan(F.col(c).cast("double"))
        cond = bad if cond is None else (cond | bad)
    offenders = df.filter(cond).select(entity_col).distinct()
    return df.join(F.broadcast(offenders), entity_col, "left_anti")


def interpolate(
    df: DataFrame,
    cols: list[str],
    limit: int | None = None,
    entity_col: str = "conv_id",
    ts_col: str = "bucket_ts",
    suffix: str = "_interp",
) -> DataFrame:
    """G2 linear interpolation, pandas ``interpolate(method='linear',
    limit=k, limit_direction='forward')`` semantics (cleaning.py:268-316):
    blend by **row position** (pandas default ignores the index), leading
    nulls stay, trailing nulls clamp to last valid, ≤ limit consecutive.
    """
    w = Window.partitionBy(entity_col).orderBy(ts_col)
    pos = F.row_number().over(w)
    back = w.rowsBetween(Window.unboundedPreceding, 0)
    fwd = w.rowsBetween(0, Window.unboundedFollowing)
    df = df.withColumn("_pos", pos)
    for c in cols:
        pos_v = F.when(F.col(c).isNotNull(), F.col("_pos"))
        prev_v = F.last(F.col(c), ignorenulls=True).over(back)
        prev_p = F.last(pos_v, ignorenulls=True).over(back)
        next_v = F.first(F.col(c), ignorenulls=True).over(fwd)
        next_p = F.first(pos_v, ignorenulls=True).over(fwd)
        dist = F.col("_pos") - prev_p
        within = F.lit(True) if limit is None else dist <= limit
        blended = prev_v + (next_v - prev_v) * dist / (next_p - prev_p)
        filled = (
            F.when(F.col(c).isNotNull(), F.col(c))
            .when(prev_v.isNull(), F.lit(None))  # leading: no forward source
            .when(~within, F.lit(None))
            .when(next_v.isNull(), prev_v)  # trailing: clamp
            .otherwise(blended)
        )
        df = df.withColumn(c + suffix, filled)
    return df.drop("_pos")
