"""Structured Streaming surface: streaming gap-sessionization and
incremental feature aggregates.

The reference is batch-only (SURVEY.md §2.10) and the north rule is
resumable batch, so this module is the *streaming twin* of the batch
operators for pipelines that tail a transcript table: the batch
``sessionize`` (window algebra) becomes ``session_window`` (state-store
sessions with watermarked late-data handling), and per-session
aggregates stream out incrementally.

Semantics note: batch sessionize assigns a session index per
conversation; streaming ``session_window(ts, gap)`` merges events whose
windows overlap within the watermark — identical session boundaries for
in-order data, late data beyond the watermark is dropped (documented
divergence; the batch path is the source of truth for backfills).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_feature_drift(
    stream: DataFrame,
    profile: DataFrame,
    features: list[str],
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    bins: int = 10,
    slide: str | None = None,
) -> DataFrame:
    """Streaming drift monitor: PSI of each event-time window of a
    feature stream against a FROZEN reference profile
    (`drift.drift_profile` — the tiny per-feature edges + bin-counts
    table that ships with the training snapshot). Output one row per
    (window, feature): ``(window_start, window_end, feature, n_cur,
    n_null_cur, psi)``.

    Built around Structured Streaming's one-stateful-operator shape:
    the ``bins`` buckets are unrolled into conditional counts inside a
    SINGLE watermarked ``groupBy(window, feature)`` aggregation —
    state is O(open windows × features), independent of stream rate —
    and PSI is then a stateless expression (`drift.psi_expr`) against
    the broadcast profile. No second aggregation, no stream-stream
    join, so this runs identically under ``availableNow`` backfill and
    a live trigger; the batch `feature_drift` remains the source of
    truth for full-history audits (same bucket algebra, pytest-pinned
    equal).

    A feature with no profile row (entirely null in the reference —
    `drift_profile` omits it) is dropped by the edges join: there are
    no edges to bucket against. Monitor such features with the batch
    null-rate panel instead. ``slide`` turns the tumbling windows into
    sliding ones (e.g. window="1 hour", slide="15 minutes"): each row
    then lands in window/slide open windows — state and output volume
    scale by the same factor."""
    from sparkfeat.drift import _bucket, _melt, psi_expr

    edges = profile.select("feature", "_vmin", "_vmax")
    long = _melt(stream, features, extra=[ts_col]).join(
        F.broadcast(edges), "feature"
    )
    bucketed = long.select(
        ts_col,
        "feature",
        F.when(F.col("value").isNotNull(), _bucket(bins)).alias("_b"),
    )
    agg = (
        bucketed.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window, slide or window).alias("_win"),
            F.col("feature"),
        )
        .agg(
            *[
                F.sum(F.when(F.col("_b") == i, 1).otherwise(0)).alias(f"q{i}")
                for i in range(bins)
            ],
            F.count("_b").alias("n_cur"),
            F.sum(F.when(F.col("_b").isNull(), 1).otherwise(0)).alias("n_null_cur"),
        )
    )
    return agg.join(F.broadcast(profile), "feature").select(
        F.col("_win.start").alias("window_start"),
        F.col("_win.end").alias("window_end"),
        "feature",
        "n_cur",
        "n_null_cur",
        psi_expr(bins).alias("psi"),
    )


def stream_session_aggregates(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    entity_col: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming per-session aggregates over a transcript stream.

    One state-store keyed by (conv_id, session_window); watermark bounds
    state size — at 10^12-turn scale this is what keeps the job O(active
    sessions), not O(history).
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(entity_col),
            F.session_window(F.col(ts_col), gap).alias("session"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.length("text").cast("double")).alias("total_text_len"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
        )
        .select(
            entity_col,
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_turns",
            "total_text_len",
            "first_ts",
            "last_ts",
        )
    )


def stream_ewma(
    stream: DataFrame,
    value_col: str,
    halflife: float,
    out_col: str = "ewma",
    entity_col: str = "conv_id",
) -> DataFrame:
    """Custom stateful streaming operator: per-conversation EWMA via
    ``applyInPandasWithState`` — the streaming twin of
    ``transforms.ewma``. Each conversation's (S, W) weighted-cumsum
    state lives in the state store and carries across micro-batches AND
    across restarts (checkpoint recovery), using the same decayed-carry
    algebra as the chunk-scan and sorted-stream kernels, so emitted
    values equal the batch ``ewm(halflife, adjust=True).mean()`` exactly
    when turns arrive in (ts, turn_idx) order per conversation (the
    append-only transcript-log contract; within a micro-batch order is
    restored by an explicit sort).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import DoubleType, StructField, StructType

    from sparkfeat.transforms import _ewma_sw

    a = 0.5 ** (1.0 / halflife)
    src_fields = {f.name: f for f in stream.schema.fields}
    out_schema = StructType(
        [
            src_fields[entity_col],
            src_fields["ts"],
            src_fields["turn_idx"],
            StructField(value_col, DoubleType(), True),
            StructField(out_col, DoubleType(), True),
        ]
    )
    state_schema = StructType(
        [StructField("s", DoubleType(), True), StructField("w", DoubleType(), True)]
    )

    def fn(key, pdfs, state: GroupState):
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "turn_idx"], kind="mergesort")
        s0, w0 = state.get if state.exists else (0.0, 0.0)
        x = rows[value_col].to_numpy(dtype=np.float64)
        S, W = _ewma_sw(x, a, s0, w0)
        state.update((float(S[-1]), float(W[-1])))
        with np.errstate(invalid="ignore", divide="ignore"):
            m = np.where(W > 0, S / W, np.nan)
        out = pd.DataFrame(
            {
                entity_col: key[0],
                "ts": rows["ts"],
                "turn_idx": rows["turn_idx"],
                value_col: x,
                out_col: m,
            }
        )
        yield out

    return stream.groupBy(entity_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def stream_corpus_filter(
    stream: DataFrame,
    watermark: str = "1 hour",
    ts_col: str = "ingest_ts",
    text_col: str = "text",
) -> DataFrame:
    """Streaming twin of the corpus-prep front half for a document
    INGESTION stream: the Gopher-family quality gate runs as a
    stateless codegen filter, then streaming exact dedup drops any doc
    whose bag fingerprint was already admitted within the watermark
    (``dropDuplicatesWithinWatermark`` — state is O(unique fingerprints
    per window), the bound that keeps a perpetual crawler's dedup state
    from growing with history). Near-dup (MinHash) stays batch: its
    candidate join is not expressible as per-key streaming state, which
    is the honest seam between the two modes (run it on the daily
    compaction, as production pipelines do)."""
    from sparkfeat.text import bag_fingerprint, gopher_quality_pass

    return (
        stream.withWatermark(ts_col, watermark)
        .filter(gopher_quality_pass(text_col))
        .withColumn("fingerprint", bag_fingerprint(text_col))
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


def run_stream_once(
    spark,
    input_path: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    output_path: str | None = None,
) -> DataFrame:
    """Drive the streaming sessionizer over a parquet directory with
    ``trigger(availableNow)`` — processes everything currently present,
    checkpoints, and stops; re-running picks up only new files (the
    streaming analog of checkpoint.run_checkpointed resume).

    ``output_path=None`` uses the in-memory sink (single-run debugging;
    the memory sink cannot recover a checkpoint). For resumable runs
    pass a parquet ``output_path``; the returned DataFrame then reads
    only THIS invocation's newly committed files.
    """
    import os

    from pyspark.sql import functions as F

    from sparkfeat.schema import TRANSCRIPT_SCHEMA

    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(input_path)
    agg = stream_session_aggregates(stream, gap=gap)
    if output_path is None:
        q = (
            agg.writeStream.format("memory")
            .queryName("sparkfeat_sessions")
            .outputMode("append")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.sql("SELECT * FROM sparkfeat_sessions")

    before = set()
    if os.path.isdir(output_path):
        before = {f for f in os.listdir(output_path) if f.endswith(".parquet")}
    q = (
        agg.writeStream.format("parquet")
        .option("path", output_path)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    new = [
        os.path.join(output_path, f)
        for f in os.listdir(output_path)
        if f.endswith(".parquet") and f not in before
    ]
    if not new:
        return spark.createDataFrame([], schema=agg.schema)
    return spark.read.parquet(*new)


def stream_preference_pairs(
    stream: DataFrame,
    entity_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    tool_col: str = "tool",
    retry_tool: str = "retry",
) -> DataFrame:
    """Custom stateful streaming operator: the streaming twin of
    ``conv.preference_pairs``. Batch mining needs LOOKAHEAD (the chosen
    resolution arrives after the rejected retry), so the streaming form
    holds each conversation's unresolved retries in the state store —
    ``(last_user_text, pending retry idx/prompt/rejected arrays)`` per
    ``conv_id`` — and emits the finished (prompt, rejected, chosen)
    pairs the moment the first non-retry turn arrives, in that later
    micro-batch. State survives checkpoint restarts.

    State is O(pending retries per conversation) — bounded by the
    longest retry run, not by history; an agent looping forever on
    retries grows its own state only, and a TTL policy can cap it
    upstream. Emission matches the batch operator exactly for in-order
    per-conversation arrival (the append-only transcript-log contract;
    within a micro-batch order is restored by an explicit sort).

    The per-row Python walk is deliberate: emission CLEARS pending
    state at each non-retry turn, which is inherently sequential; the
    batch is still Arrow-transferred and the walk is O(turns) with a
    tiny constant.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    out_cols = [
        entity_col,
        "retry_idx",
        "prompt_text",
        "rejected_text",
        "chosen_idx",
        "chosen_role",
        "chosen_text",
    ]
    out_schema = StructType(
        [
            StructField(entity_col, StringType(), False),
            StructField("retry_idx", IntegerType(), False),
            StructField("prompt_text", StringType(), True),
            StructField("rejected_text", StringType(), True),
            StructField("chosen_idx", IntegerType(), False),
            StructField("chosen_role", StringType(), True),
            StructField("chosen_text", StringType(), True),
        ]
    )
    state_schema = StructType(
        [
            StructField("last_user", StringType(), True),
            StructField("idxs", ArrayType(IntegerType(), False), True),
            StructField("prompts", ArrayType(StringType(), True), True),
            StructField("rejs", ArrayType(StringType(), True), True),
        ]
    )

    def fn(key, pdfs, state: GroupState):
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            [order_col], kind="mergesort"
        )
        if state.exists:
            last_user, idxs, prompts, rejs = state.get
            idxs, prompts, rejs = list(idxs), list(prompts), list(rejs)
        else:
            last_user, idxs, prompts, rejs = None, [], [], []
        out = []
        for r in rows.itertuples(index=False):
            tool = getattr(r, tool_col)
            role = getattr(r, role_col)
            text = getattr(r, text_col)
            idx = int(getattr(r, order_col))
            if tool == retry_tool:
                idxs.append(idx)
                prompts.append(last_user)
                rejs.append(text)
            else:
                out.extend(
                    (key[0], i, p, rej, idx, role, text)
                    for i, p, rej in zip(idxs, prompts, rejs)
                )
                idxs, prompts, rejs = [], [], []
            if role == "user":
                last_user = text
        state.update((last_user, idxs, prompts, rejs))
        if out:
            yield pd.DataFrame(out, columns=out_cols)

    return stream.groupBy(entity_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def stream_asof_serve(
    probe_stream: DataFrame,
    intervals: DataFrame,
    value_cols: list[str],
    entity_col: str = "conv_id",
    probe_ts: str = "probe_ts",
    broadcast: bool = False,
) -> DataFrame:
    """Point-in-time feature SERVING on a live probe stream: each
    incoming ``(entity, probe_ts)`` is answered with the snapshot's
    last observation at-or-before it — the flagship as-of join
    (asof.asof_join) in streaming form, against a FROZEN
    ``asof.snapshot_intervals`` table. This is the training/serving
    symmetry gate in the other direction: the serving path answers
    with literally the same join algebra the training path was built
    from (pytest pins stream ≡ batch ≡ union-tag sort-merge).

    Implementation: a stream-static LEFT join — each probe lands in at
    most one validity interval per entity, so the result is
    row-preserving (probes before the first observation emit nulls),
    stateless, and watermark-free: no stream-stream range state, no
    late-data loss. The static side is re-planned per micro-batch —
    ``.persist()`` the interval table for hot serving, write it
    bucketed by ``entity_col`` so the per-batch join co-locates, or
    pass ``broadcast=True`` when the snapshot is dim-sized (the probe
    stream then never shuffles at all)."""
    from sparkfeat.asof import asof_join_intervals

    return asof_join_intervals(
        probe_stream,
        intervals,
        value_cols,
        entity_col=entity_col,
        probe_ts=probe_ts,
        broadcast=broadcast,
    )


def stream_cusum(
    stream: DataFrame,
    profile: DataFrame,
    series_col: str = "series",
    order_col: str = "t",
    value_col: str = "x",
    k: float = 0.5,
    h: float = 4.0,
    nd: int = 6,
) -> DataFrame:
    """LIVE sequential change-point monitor: the streaming twin of
    `drift.cusum_alarms`, watching a metric stream against the FROZEN
    burn-in profile (`drift.cusum_profile` — mu/sigma per series, the
    table that ships with the deployment like PSI's frozen edges).

    Per series the two one-sided Page statistics live in the state
    store — TWO DOUBLES per series, carried across micro-batches and
    restarts — and each batch folds its (order-sorted) points through
    the same closed form the batch operator uses, generalized for a
    carried initial value: with ``C = cumsum(z - k)``,

        S_i = max(0, s0 + C_i, C_i - running_min(C)_i)

    (either the pre-batch statistic ``s0`` survives un-clamped, or the
    last clamp was at an in-batch point — the same
    cumsum-minus-running-min identity, so stream ≡ batch is exact, not
    approximate, and pytest pins it bit-for-bit across a restart).

    Rows whose series has no profile row (or sigma = 0) emit NULL z
    with zero statistics and never alarm — the batch operator's
    convention. Alarms compare the ``nd``-rounded statistic (the
    engine-deterministic boundary). Output per input row:
    ``(series, order, x, z, s_pos, s_neg, alarm)``.

    Scale shape: one broadcast stream-static join (|series| rows) then
    ONE stateful operator keyed by series — state O(series), not
    O(points); within a batch the fold is numpy over the series'
    batch rows.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        StructField,
        StructType,
    )

    src = {f.name: f for f in stream.schema.fields}
    joined = stream.join(
        F.broadcast(profile.select(series_col, "mu", "sigma")),
        series_col,
        "left",
    )
    out_schema = StructType(
        [
            src[series_col],
            src[order_col],
            StructField("x", DoubleType(), True),
            StructField("z", DoubleType(), True),
            StructField("s_pos", DoubleType(), True),
            StructField("s_neg", DoubleType(), True),
            StructField("alarm", BooleanType(), True),
        ]
    )
    state_schema = StructType(
        [
            StructField("sp", DoubleType(), True),
            StructField("sn", DoubleType(), True),
        ]
    )

    def _fold(y: np.ndarray, s0: float) -> np.ndarray:
        c = np.cumsum(y)
        runmin = np.minimum.accumulate(c)
        return np.maximum(0.0, np.maximum(s0 + c, c - runmin))

    def fn(key, pdfs, state: GroupState):
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values([order_col], kind="mergesort")
        x = rows[value_col].to_numpy(dtype=np.float64)
        mu = rows["mu"].to_numpy(dtype=np.float64)
        sig = rows["sigma"].to_numpy(dtype=np.float64)
        live = np.isfinite(mu) & np.isfinite(sig) & (sig > 0)
        n = len(rows)
        z = np.full(n, np.nan)
        sp_out = np.zeros(n)
        sn_out = np.zeros(n)
        if live.any():
            zl = (x[live] - mu[live]) / sig[live]
            z[live] = zl
            s0p, s0n = state.get if state.exists else (0.0, 0.0)
            spl = _fold(zl - k, s0p)
            snl = _fold(-zl - k, s0n)
            sp_out[live] = spl
            sn_out[live] = snl
            state.update((float(spl[-1]), float(snl[-1])))
        rp = np.round(sp_out, nd)
        rn_ = np.round(sn_out, nd)
        out = pd.DataFrame(
            {
                series_col: key[0],
                order_col: rows[order_col],
                "x": np.round(x, nd),
                "z": np.round(z, nd),
                "s_pos": rp,
                "s_neg": rn_,
                "alarm": (rp > h) | (rn_ > h),
            }
        )
        out.loc[~live, "z"] = None
        yield out

    return joined.groupBy(series_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def stream_sprt(
    stream: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    order_col: str = "t",
    a_won_col: str = "a_won",
    p0: float = 0.5,
    p1: float = 0.6,
    alpha: float = 0.05,
    beta: float = 0.05,
    nd: int = 6,
) -> DataFrame:
    """LIVE Wald SPRT per model pair: the streaming twin of
    `arena.sprt_monitor`, deciding each pairing the moment its running
    LLR leaves the corridor instead of at batch end — the whole point
    of a SEQUENTIAL test is to stop paying for judgments early, which
    only a live monitor can actually do.

    State per pair is THREE values — the running LLR, the judgment
    count, and the frozen decision — carried across micro-batches and
    restarts. Each batch folds its (order-sorted) judgments through
    the same two literal increments as the batch operator, comparing
    the ``nd``-rounded LLR against the Wald boundaries; once a pair
    decides, its statistic FREEZES (later judgments no longer move it
    — the sequential-test contract the batch summary can only infer
    after the fact). Emits one row per judgment:
    ``(a, b, order, n, llr, decision)`` with ``decision`` NULL while
    the corridor holds — so the batch operator's summary (first
    crossing, frozen LLR) is reproducible from the stream's rows and
    pytest pins exactly that across a restart.

    Scale shape: ONE stateful operator keyed by the pair; state is
    O(pairs), the per-batch fold is numpy over the pair's batch rows.
    """
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    up = math.log(p1 / p0)
    down = math.log((1.0 - p1) / (1.0 - p0))
    hi = round(math.log((1.0 - beta) / alpha), nd)
    lo = round(math.log(beta / (1.0 - alpha)), nd)

    src = {f.name: f for f in stream.schema.fields}
    out_schema = StructType(
        [
            src[a_col],
            src[b_col],
            src[order_col],
            StructField("n", LongType(), True),
            StructField("llr", DoubleType(), True),
            StructField("decision", StringType(), True),
        ]
    )
    state_schema = StructType(
        [
            StructField("llr", DoubleType(), True),
            StructField("n", LongType(), True),
            StructField("decision", StringType(), True),
        ]
    )

    def fn(key, pdfs, state: GroupState):
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values([order_col], kind="mergesort")
        llr0, n0, dec = state.get if state.exists else (0.0, 0, None)
        won = rows[a_won_col].to_numpy(dtype=bool)
        llrs = np.empty(len(rows))
        decs: list = []
        llr = llr0
        for i, w in enumerate(won):
            if dec is None:
                llr += up if w else down
                r = round(llr, nd)
                if r >= hi:
                    dec = "accept_h1"
                elif r <= lo:
                    dec = "accept_h0"
            llrs[i] = round(llr, nd)
            decs.append(dec)
        n = n0 + len(rows)
        state.update((float(llr), int(n), dec))
        yield pd.DataFrame(
            {
                a_col: key[0],
                b_col: key[1],
                order_col: rows[order_col],
                "n": np.arange(n0 + 1, n + 1, dtype=np.int64),
                "llr": llrs,
                "decision": decs,
            }
        )

    return stream.groupBy(a_col, b_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
