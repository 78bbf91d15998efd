"""Row/entity filters, slicing, top-k (SURVEY.md §2.2 P1–P6, §2.7 O2–O3).

Long-format re-expressions of ``alphai_feature_generation/cleaning.py``.
Entity-level predicates ("keep symbols whose every value clears a
floor") become groupBy + left-semi join — Catalyst turns the small keep
set into a broadcast semi join, so the big side streams.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sparkfeat.windows import ORDER_COLS

#: hash-shard count for two-phase top-k ranks: any value works (the
#: shard pass is a lossless superset prune), it only bounds the final
#: window to shards×k rows; 32 matches search.bm25_topk's convention.
TOPK_SHARDS = 32


def to_utc(
    df: DataFrame, ts_col: str = "ts", source_tz: str = "America/New_York"
) -> DataFrame:
    """Reference ``convert_to_utc`` family (cleaning.py:376-414): a
    timezone-naive timestamp column is interpreted as ``source_tz``
    wall time and converted to the UTC instant (kept naive — the
    engine's convention; sessions pin spark.sql.session.timeZone=UTC).
    Pure Column expression (``to_utc_timestamp`` does the IANA tzdata
    lookup JVM-side), so non-UTC sources are first-class at scan time
    rather than relying on session config."""
    return df.withColumn(
        ts_col, F.to_utc_timestamp(F.col(ts_col).cast("timestamp"), source_tz)
    )


def select_between(
    df: DataFrame, start, end, ts_col: str = "ts"
) -> DataFrame:
    """P1 ``select_between_timestamps`` (cleaning.py:13-66): inclusive
    ``start ≤ ts ≤ end``. A plain predicate ⇒ pushed to the scan
    (parquet/Iceberg min-max pruning)."""
    return df.filter((F.col(ts_col) >= start) & (F.col(ts_col) <= end))


def _entity_semi_join(df: DataFrame, keep: DataFrame, entity_col: str) -> DataFrame:
    return df.join(keep, entity_col, "left_semi")


def select_above_floor(
    df: DataFrame, value_col: str, floor: float, entity_col: str = "conv_id"
) -> DataFrame:
    """P2 ``select_above_floor`` (cleaning.py:145-180): keep entities
    whose EVERY value > floor ⇔ min(value) > floor."""
    keep = (
        df.groupBy(entity_col)
        .agg(F.min(value_col).alias("_mn"))
        .filter(F.col("_mn") > floor)
        .select(entity_col)
    )
    return _entity_semi_join(df, keep, entity_col)


def select_below_ceiling(
    df: DataFrame, value_col: str, ceiling: float, entity_col: str = "conv_id"
) -> DataFrame:
    """P3 ``select_below_ceiling`` (cleaning.py:183-218): keep entities
    whose every value < ceiling. NB the reference's dict dispatcher
    mistakenly routes to the floor variants (cleaning.py:190-194); we
    implement the documented semantics, not the bug."""
    keep = (
        df.groupBy(entity_col)
        .agg(F.max(value_col).alias("_mx"))
        .filter(F.col("_mx") < ceiling)
        .select(entity_col)
    )
    return _entity_semi_join(df, keep, entity_col)


def select_entities(
    df: DataFrame, entities: list[str], entity_col: str = "conv_id"
) -> DataFrame:
    """P5 ``select_columns_data_dict`` (cleaning.py:432-439)."""
    return df.filter(F.col(entity_col).isin(entities))


def slice_head(
    df: DataFrame, n: int, entity_col: str = "conv_id"
) -> DataFrame:
    """P6 ``slice_data_dict`` (cleaning.py:442-456): positional head per
    entity — explicit (ts, turn_idx) ordering makes 'positional' well
    defined in a distributed table."""
    w = Window.partitionBy(entity_col).orderBy(*ORDER_COLS)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def slice_range(
    df: DataFrame,
    start: int,
    end: int | None = None,
    entity_col: str = "conv_id",
) -> DataFrame:
    """P6 ``slice_data_dict(slice_start, slice_end)`` complete surface
    (cleaning.py:442-456): pandas ``iloc[start:end]`` per entity,
    including negative indices and ``end=None``. Position = 0-based
    rank under the canonical (ts, turn_idx) order; per-entity length
    comes from an unbounded count over the same partition — one window
    exchange on entity_col, no second scan."""
    w = Window.partitionBy(entity_col).orderBy(*ORDER_COLS)
    w_all = Window.partitionBy(entity_col)
    pos = F.row_number().over(w) - 1
    n = F.count(F.lit(1)).over(w_all)
    lo = (
        F.lit(start)
        if start >= 0
        else F.greatest(n + F.lit(start), F.lit(0))
    )
    if end is None:
        hi = n
    elif end >= 0:
        hi = F.lit(end)
    else:
        hi = n + F.lit(end)
    return (
        df.withColumn("_pos", pos)
        .withColumn("_lo", lo)
        .withColumn("_hi", hi)
        .filter((F.col("_pos") >= F.col("_lo")) & (F.col("_pos") < F.col("_hi")))
        .drop("_pos", "_lo", "_hi")
    )


def slice_tail(df: DataFrame, n: int, entity_col: str = "conv_id") -> DataFrame:
    """P6 tail variant: last n rows per entity."""
    w = Window.partitionBy(entity_col).orderBy(
        F.col(ORDER_COLS[0]).desc(), F.col(ORDER_COLS[1]).desc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def filter_by_intervals(
    df: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    entity_col: str | None = None,
    include_start: bool = True,
    include_end: bool = True,
) -> DataFrame:
    """Generic broadcast interval-membership filter — the re-expression
    of trading-hours selection (``cleaning.py:319-373``
    ``select_trading_hours``) that works for ANY small (open, close[,
    entity]) schedule: market calendars, maintenance windows, on-call
    shifts.

    ``intervals`` must be small (one row per calendar interval) — it
    broadcasts and the fact side streams through a left-semi range join
    with zero shuffle. ``include_start``/``include_end`` mirror the
    reference's ``between_time`` inclusivity flags."""
    cols = [
        F.col("open").alias("_open"),
        F.col("close").alias("_close"),
    ]
    if entity_col:
        cols.append(F.col(entity_col).alias("_ent"))
    iv = intervals.select(*cols)
    t = F.col(ts_col)
    lower = (t >= F.col("_open")) if include_start else (t > F.col("_open"))
    upper = (t <= F.col("_close")) if include_end else (t < F.col("_close"))
    cond = lower & upper
    if entity_col:
        cond = cond & (F.col(entity_col) == F.col("_ent"))
    return df.join(F.broadcast(iv), cond, "left_semi")


def probes_after_open(
    intervals: DataFrame, minutes: float, out_col: str = "probe_ts"
) -> DataFrame:
    """One probe per interval at ``open + minutes``
    (``cleaning.py:417-429`` ``sample_minutes_after_market_open``): feed
    the result to :func:`sparkfeat.asof.asof_join` for the point-in-time
    daily sample (the as-of lookup generalizes the reference's exact
    ``.loc`` + dropna). Integer epoch-microsecond arithmetic — engine
    portable. Carries every interval column through."""
    probe_us = F.unix_micros(F.col("open").cast("timestamp")) + F.lit(
        int(minutes * 60_000_000)
    )
    return intervals.withColumn(out_col, F.timestamp_micros(probe_us))


def top_k_entities(
    df: DataFrame,
    value_col: str,
    k: int,
    entity_col: str = "conv_id",
    agg: Column | None = None,
) -> DataFrame:
    """A5/O2 liquidity-style top-k (universe.py:68-77): rank entities by
    total ``value_col`` desc (entity id asc tie-break for determinism),
    keep top k. Partial aggregation map-side; the rank is the house
    TWO-PHASE shard rank (the bm25_topk / length_batches pattern): a
    per-shard ``row_number`` keeps each hash shard's local top-k —
    window state k rows per shard, fully parallel — and the global
    window ranks only shards×k survivors, so the per-entity totals
    table (one row per ENTITY — billions at corpus scale) never funnels
    through a single-task sort. Per-shard top-k is a superset of the
    global top-k, so the keep set is exact and identical. The big-table
    filter is a broadcast semi join."""
    totals = df.groupBy(entity_col).agg(
        (agg if agg is not None else F.sum(value_col)).alias("_total")
    )
    order = [F.col("_total").desc(), F.col(entity_col)]
    local = Window.partitionBy(
        F.pmod(F.hash(F.col(entity_col)), F.lit(TOPK_SHARDS))
    ).orderBy(*order)
    pruned = totals.withColumn("_lr", F.row_number().over(local)).filter(
        F.col("_lr") <= k
    )
    w = Window.orderBy(*order)  # ≤ TOPK_SHARDS·k rows by construction
    keep = pruned.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") <= k)
    return _entity_semi_join(df, keep.select(entity_col), entity_col)
