"""Entity-universe provider + interval membership (SURVEY.md §3.3,
P8/J5/A5/A9).

Reference: ``VolumeUniverseProvider.get_historical_universes``
(universe.py:79-116) — for each period, rank entities by trailing
volume, keep top-N, emit an interval table ``[start, end, assets]``;
membership lookups are interval scans (transformation/financial.py:329-342).

Spark re-expression: period index = integer division of epoch time (no
calendar table), per-(entity, period) partial sums, trailing-period
window sum, per-period rank → a *small* interval table that broadcast
semi-joins against the big fact table. The only all-data pass is the
first partial aggregation; everything after operates on
|entities|×|periods| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: hash-shard count for the two-phase per-period rank (lossless superset
#: prune; bounds the per-period window to shards×top_n rows).
_RANK_SHARDS = 32


def period_index(ts_col: str, period_seconds: int, t0_us: int = 0):
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return F.floor((us - F.lit(t0_us)) / F.lit(period_seconds * 1_000_000)).cast(
        "long"
    )


def active_universe(
    df: DataFrame,
    period_seconds: int,
    top_n: int,
    value_col: str,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    lookback_periods: int = 1,
    t0_us: int = 0,
) -> DataFrame:
    """Top-N entities per period by trailing summed ``value_col``.

    Emits (period, period_start, period_end, conv_id, total, rank).
    The trailing sum is a rangeBetween window over the period index, so
    period gaps are handled without densification.

    Periods are anchored to a FIXED epoch (``t0_us``, default 0 — floor
    of epoch time to the period width), not to ``min(ts)``: a data-derived
    anchor costs an extra full pass over the fact table just to start the
    grid and makes period ids irreproducible across runs/backfills."""
    per = df.withColumn("_p", period_index(ts_col, period_seconds, t0_us))
    sums = per.groupBy(entity_col, "_p").agg(F.sum(value_col).alias("_v"))
    wtrail = (
        Window.partitionBy(entity_col)
        .orderBy("_p")
        .rangeBetween(-(lookback_periods - 1), 0)
    )
    trailed = sums.withColumn("total", F.sum("_v").over(wtrail))
    # two-phase per-period rank (the house shard-rank pattern): a plain
    # partitionBy(_p) window makes each PERIOD a hot partition holding
    # every entity's row; the (period, shard) local top-n keeps window
    # state at top_n rows per shard, and the per-period pass then ranks
    # only shards×top_n survivors — exact (local top-n ⊇ global top-n)
    order = [F.col("total").desc(), F.col(entity_col)]
    wlocal = Window.partitionBy(
        "_p", F.pmod(F.hash(F.col(entity_col)), F.lit(_RANK_SHARDS))
    ).orderBy(*order)
    pruned = trailed.withColumn("_lr", F.row_number().over(wlocal)).filter(
        F.col("_lr") <= top_n
    )
    wrank = Window.partitionBy("_p").orderBy(*order)
    ranked = pruned.withColumn("rank", F.row_number().over(wrank).cast("int")).filter(
        F.col("rank") <= top_n
    )
    p_us = F.col("_p") * F.lit(period_seconds * 1_000_000) + F.lit(t0_us)
    return ranked.select(
        F.col("_p").alias("period"),
        F.timestamp_micros(p_us).alias("period_start"),
        F.timestamp_micros(p_us + F.lit(period_seconds * 1_000_000)).alias("period_end"),
        F.col(entity_col),
        F.col("total"),
        F.col("rank"),
    )


def universe_membership(
    df: DataFrame,
    universe: DataFrame,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """P8/J5 interval membership: keep rows whose (entity, ts) falls in
    an active universe interval. The universe table is small by
    construction → broadcast left-semi range join (no shuffle of the
    fact side)."""
    u = universe.select(
        F.col(entity_col).alias("_ue"),
        F.col("period_start").alias("_us_"),
        F.col("period_end").alias("_ue_"),
    )
    cond = (
        (F.col(entity_col) == F.col("_ue"))
        & (F.col(ts_col) >= F.col("_us_"))
        & (F.col(ts_col) < F.col("_ue_"))
    )
    return df.join(F.broadcast(u), cond, "left_semi")


def correlated_pairs(
    df: DataFrame,
    value_col: str,
    bucket_seconds: int,
    threshold: float = 0.999,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """A9 correlation dedup (cleaning.py:459-495): pairwise Pearson corr
    of per-entity bucketed sums; emit pairs above threshold.

    Series are aligned by equi-join on the bucket (only co-observed
    buckets correlate — pandas .corr() pairwise-complete semantics).
    O(entities²) in the worst case but the join keys on bucket first;
    for the reference's use (drop one of a >0.999 pair) entities ≪ rows.
    """
    from sparkfeat.resample import _bucket_end_us

    b = df.select(
        F.col(entity_col),
        _bucket_end_us(ts_col, bucket_seconds * 1_000_000).alias("_b"),
        F.col(value_col),
    )
    sums = b.groupBy(entity_col, "_b").agg(F.sum(value_col).alias("_v"))
    a = sums.select(F.col(entity_col).alias("id_a"), "_b", F.col("_v").alias("_va"))
    c = sums.select(F.col(entity_col).alias("id_b"), "_b", F.col("_v").alias("_vb"))
    joined = a.join(c, "_b").filter(F.col("id_a") < F.col("id_b"))
    return (
        joined.groupBy("id_a", "id_b")
        .agg(F.corr("_va", "_vb").alias("corr"), F.count(F.lit(1)).alias("n_buckets"))
        .filter(F.col("corr") > threshold)
    )


def resolve_correlated(
    pairs: DataFrame,
    volumes: DataFrame,
    entity_col: str = "conv_id",
    volume_col: str = "volume",
) -> DataFrame:
    """A9 resolution step (``cleaning.py:473-495``
    ``remove_duplicated_symbols_ohlcv``): for every over-threshold pair
    drop the LOWER-total-volume member, keeping the higher (ties → keep
    ``id_a``, the smaller id — deterministic where pandas' stable sort
    was order-dependent). ``pairs`` is (id_a, id_b); ``volumes`` is the
    per-entity total. Returns the distinct drop set — anti-join it
    against the fact table (:func:`drop_correlated_duplicates`)."""
    va = volumes.select(
        F.col(entity_col).alias("id_a"), F.col(volume_col).alias("_va")
    )
    vb = volumes.select(
        F.col(entity_col).alias("id_b"), F.col(volume_col).alias("_vb")
    )
    j = pairs.join(F.broadcast(va), "id_a").join(F.broadcast(vb), "id_b")
    loser = F.when(F.col("_vb") > F.col("_va"), F.col("id_a")).otherwise(
        F.col("id_b")
    )
    return j.select(loser.alias(entity_col)).distinct()


def drop_correlated_duplicates(
    df: DataFrame,
    value_col: str,
    volume_col: str,
    bucket_seconds: int,
    threshold: float = 0.999,
    min_buckets: int = 2,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """End-to-end A9: correlate bucketed ``value_col`` series, resolve
    each >threshold pair by total ``volume_col`` (reference: corr on
    close, keep higher volume), anti-join the losers out. The pair/drop
    tables are |entities|-sized — both joins broadcast."""
    pairs = correlated_pairs(
        df, value_col, bucket_seconds, threshold, entity_col, ts_col
    ).filter(F.col("n_buckets") >= min_buckets)
    volumes = df.groupBy(entity_col).agg(F.sum(volume_col).alias("volume"))
    drops = resolve_correlated(pairs, volumes, entity_col)
    return df.join(F.broadcast(drops), entity_col, "left_anti")
