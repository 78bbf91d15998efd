"""Per-entity window algebra: ordering, trailing frames, sessionization.

The reference's implicit contract is "a series is one symbol's column,
ordered by the DatetimeIndex" (``feature/transform.py`` throughout).
Here the contract is explicit: every order-dependent operator runs over

    Window.partitionBy('conv_id').orderBy('ts', 'turn_idx')

``turn_idx`` tie-breaks equal timestamps so ordering is total and stable
(north rule: per-turn text equality under stable (conv_id, turn_idx)
ordering). Zero temporal leakage is by construction: every frame is
trailing (``rowsBetween(-k, 0)``), mirroring the reference's
``(index >= start) & (index <= prediction_timestamp)`` guard
(``feature/features/financial.py:224-231``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

#: Total order within a conversation.
ORDER_COLS = ("ts", "turn_idx")


def w_entity(entity_col="conv_id") -> WindowSpec:
    """The canonical per-conversation ordered window. ``entity_col`` may
    be a single column name or a sequence (used by the chunked-window
    skew strategy, which partitions by (conv_id, chunk))."""
    cols = [entity_col] if isinstance(entity_col, str) else list(entity_col)
    return Window.partitionBy(*cols).orderBy(*ORDER_COLS)


def trailing(length: int, entity_col="conv_id") -> WindowSpec:
    """Trailing frame of exactly ``length`` rows ending at the current row.

    Maps the reference's window selection ``get_total_ticks_x`` row count
    (``transformation/base.py:151-162``) to a rows-preceding frame.
    Trailing-only ⇒ no feature at ts_t can read turns > t.
    """
    return w_entity(entity_col).rowsBetween(-(length - 1), 0)


def unbounded_trailing(entity_col="conv_id") -> WindowSpec:
    """Expanding frame from conversation start to the current row."""
    return w_entity(entity_col).rowsBetween(Window.unboundedPreceding, 0)


def chunked_bounded_windows(
    df: DataFrame,
    apply_fn,
    max_window: int,
    chunk_size: int,
    entity_col: str = "conv_id",
):
    """Skew strategy for BOUNDED trailing windows (SURVEY.md §4: windows
    can't be salted — chunk long conversations into ranged sub-partitions
    and carry boundary context).

    A single window function over one mega-conversation serializes into
    one task. For any transform whose frame looks back at most
    ``max_window − 1`` rows (rolling stats, lag-k, %K, KER — not EWMA or
    cumulative sums, which have their own carry strategies), split each
    conversation into ``chunk_size``-row chunks and REPLICATE the last
    ``max_window − 1`` rows of each chunk into the next as context rows:

        pos   = row_number per conv − 1;  chunk = pos // chunk_size
        ctx   = rows with pos % chunk_size ≥ chunk_size − (max_window−1),
                duplicated into chunk+1, flagged _ctx=1
        apply_fn(union, entity_cols=(conv_id, _chunk))   # parallel chunks
        keep _ctx = 0

    Every trailing frame of width ≤ max_window sees exactly the rows it
    would have seen unchunked (context rows sort first by (ts, turn_idx)),
    so results are bit-identical — proven in tests. Cost: ~(max_window−1)/
    chunk_size row duplication; parallelism becomes rows/chunk_size per
    conversation instead of 1.

    ``apply_fn(df, entity_cols) -> df`` must build its window transforms
    with the given entity partition columns.
    """
    if chunk_size < max_window - 1:
        raise ValueError(
            f"chunk_size ({chunk_size}) must be >= max_window - 1 "
            f"({max_window - 1}): context rows are replicated only from "
            "the immediately preceding chunk, so smaller chunks would "
            "silently truncate trailing windows"
        )
    w = w_entity(entity_col)
    overlap = max_window - 1
    base = df.withColumn("_pos", F.row_number().over(w) - 1).withColumn(
        "_chunk", (F.col("_pos") / chunk_size).cast("long")
    )
    main = base.withColumn("_ctx", F.lit(0))
    ctx = (
        base.filter(F.col("_pos") % chunk_size >= chunk_size - overlap)
        .withColumn("_chunk", F.col("_chunk") + 1)
        .withColumn("_ctx", F.lit(1))
    )
    u = main.unionByName(ctx)
    out = apply_fn(u, (entity_col, "_chunk"))
    return out.filter(F.col("_ctx") == 0).drop("_pos", "_chunk", "_ctx")


def repartition_sorted(
    df: DataFrame, partitions: int | None = None, entity_col: str = "conv_id"
) -> DataFrame:
    """Hash-partition by conversation and sort within partitions.

    This is the engine's physical layout (north rule: as-of sort-merge
    over ts-sorted, conv_id-hash-partitioned partitions). Done once up
    front, every subsequent window/as-of/sessionize stage reuses the
    exchange — Catalyst recognizes the child distribution and elides the
    extra shuffle. At 100 TB the Iceberg table is written
    ``bucket(N, conv_id), days(ts)`` with a sort order of
    ``(conv_id, ts, turn_idx)`` so even this first exchange is a
    scan-local sort, not a network shuffle.
    """
    parts = [F.col(entity_col)]
    rep = df.repartition(partitions, *parts) if partitions else df.repartition(*parts)
    return rep.sortWithinPartitions(entity_col, *ORDER_COLS)


def sessionize(
    df: DataFrame,
    gap_seconds: float = 1800.0,
    entity_col: str = "conv_id",
    out_col: str = "session_idx",
    ts_col: str = "ts",
) -> DataFrame:
    """Split conversations into sessions on inactivity gaps (north rule).

    Pure window algebra — two analytic passes over the same partitioning,
    zero extra shuffles after :func:`repartition_sorted`:

        new_session = (ts - lag(ts) > gap) :: int   (first turn ⇒ 1)
        session_idx = sum(new_session) over trailing unbounded

    Gap comparison is done on epoch-microseconds (exact integer math,
    identical in any SQL engine). The reference's analog is
    calendar-based trading-hour segmentation (``cleaning.py:319-373``);
    gap-based sessions generalize it without a calendar table.
    """
    w = w_entity(entity_col)
    # parquet timestamps may surface as TIMESTAMP_NTZ; session tz is UTC so
    # the cast is lossless and unix_micros gets the type it requires.
    cur_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev_us = F.lag(cur_us).over(w)
    gap_us = int(round(gap_seconds * 1_000_000))
    is_new = F.when(prev_us.isNull(), 1).otherwise(
        (cur_us - prev_us > F.lit(gap_us)).cast("int")
    )
    return df.withColumn(
        out_col,
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("int"),
    )


def tool_chain_stats(
    df: DataFrame,
    entity_col: str = "conv_id",
    order_col: str = "turn_idx",
    tool_col: str = "tool",
    role_col: str = "role",
) -> DataFrame:
    """Per-conversation agent-behavior profile over the transcript
    data model: how much of the conversation is tool traffic, how many
    retries, and the longest unbroken tool-call chain — the features an
    agent-quality dashboard or a data-curation filter ("drop
    conversations that are 90% retry loops") reads.

    Output per entity: ``n_turns``, ``n_tool_turns`` (tool non-null),
    ``n_retries`` (tool = 'retry'), ``max_tool_streak`` (longest run of
    CONSECUTIVE turns by ``order_col`` with a non-null tool — the
    classic gaps-and-islands: island id = order − dense run index, so
    the whole derivation is two window passes over the SAME conv_id
    partitioning), ``assistant_frac`` (6-dp rounded).

    Scale shape: one hash exchange on ``conv_id`` (shuffle-free on the
    bucketed table), then windows + one groupBy reusing it. Streak
    state is O(1) per row — no arrays, no collect.
    """
    w = Window.partitionBy(entity_col).orderBy(order_col)
    is_tool = F.col(tool_col).isNotNull()
    # gaps-and-islands: among tool turns, consecutive order values have
    # a constant (order - running tool count) -> one island per chain.
    run_idx = F.sum(is_tool.cast("int")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    island = F.when(is_tool, F.col(order_col) - run_idx)
    flagged = df.select(
        F.col(entity_col),
        F.col(order_col),
        is_tool.alias("_t"),
        (F.col(tool_col) == "retry").alias("_r"),
        (F.col(role_col) == "assistant").alias("_a"),
        island.alias("_isl"),
    )
    streaks = (
        flagged.where(F.col("_t"))
        .groupBy(entity_col, "_isl")
        .agg(F.count(F.lit(1)).alias("_len"))
        .groupBy(entity_col)
        .agg(F.max("_len").alias("max_tool_streak"))
    )
    base = flagged.groupBy(entity_col).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.col("_t").cast("bigint")).alias("n_tool_turns"),
        F.sum(F.col("_r").cast("bigint")).alias("n_retries"),
        (
            F.round(
                F.sum(F.col("_a").cast("bigint")) / F.count(F.lit(1)), 6
            )
            + F.lit(0.0)
        ).alias("assistant_frac"),
    )
    return base.join(streaks, entity_col, "left").select(
        entity_col,
        "n_turns",
        "n_tool_turns",
        "n_retries",
        F.coalesce("max_tool_streak", F.lit(0).cast("bigint")).alias(
            "max_tool_streak"
        ),
        "assistant_frac",
    )


def conv_latency_stats(
    df: DataFrame,
    entity_col: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
    role_col: str = "role",
    method: str = "exact",
) -> DataFrame:
    """Per-conversation timing profile from the transcript timestamps:
    how long the conversation ran, how bursty it was, and how fast the
    assistant answered — the latency features an agent-quality model or
    an SLA dashboard trains on.

    Output per entity: ``duration_s`` (last − first ts), ``n_turns``,
    ``median_gap_s`` / ``p95_gap_s`` (inter-turn gaps by ``order_col``),
    ``median_response_s`` (gap on assistant turns whose PREVIOUS turn
    was a user turn — i.e. actual answer latency), ``n_responses``.
    Seconds as 6-dp doubles; single-turn conversations get NULL gap
    stats and 0 duration.

    Scale shape: one window pass for the lagged gaps + one groupBy,
    both in the SAME ``conv_id`` partitioning (zero extra exchanges on
    the bucketed table). ``method='exact'`` uses ``percentile`` — the
    per-group aggregation buffer holds that conversation's gaps, fine
    to ~10⁶ turns per conversation; ``method='approx'`` swaps in
    ``approx_percentile`` (GK sketch, bounded state) for heavy-tailed
    10⁷+-turn conversations — the same documented strategy pair as
    `classify.fit_bins`.
    """
    pctl = F.percentile if method == "exact" else F.approx_percentile
    w = Window.partitionBy(entity_col).orderBy(order_col)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap_s = (us - F.lag(us).over(w)) / F.lit(1_000_000.0)
    resp_s = F.when(
        (F.col(role_col) == "assistant") & (F.lag(F.col(role_col)).over(w) == "user"),
        gap_s,
    )
    g = df.select(
        F.col(entity_col),
        us.alias("_us"),
        gap_s.alias("_gap"),
        resp_s.alias("_resp"),
    )
    r6 = lambda c: F.round(c, 6) + F.lit(0.0)  # noqa: E731  (-0.0 canon)
    return g.groupBy(entity_col).agg(
        r6((F.max("_us") - F.min("_us")) / F.lit(1_000_000.0)).alias("duration_s"),
        F.count(F.lit(1)).alias("n_turns"),
        r6(pctl("_gap", F.lit(0.5))).alias("median_gap_s"),
        r6(pctl("_gap", F.lit(0.95))).alias("p95_gap_s"),
        r6(pctl("_resp", F.lit(0.5))).alias("median_response_s"),
        F.sum(F.col("_resp").isNotNull().cast("bigint")).alias("n_responses"),
    )
