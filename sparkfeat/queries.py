"""Driver-facing query registry: Spark implementation + DuckDB oracle
per operator (SURVEY.md §2 inventory).

Every transcript query derives the transcript table from the driver's
``events`` parquet with byte-identical logic on both engines
(``schema.TRANSCRIPTS_CTE`` ↔ ``schema.transcripts_from_events``), so
the DuckDB oracle checks real end-to-end semantics, not a toy.

Float columns are rounded to 6 decimals **in both engines** so the
driver's order-insensitive value hash is robust to sub-ulp libm
differences (JVM vs C math).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkfeat import transforms as T
from sparkfeat.pipeline import flagship_features
from sparkfeat.schema import TRANSCRIPTS_CTE, transcripts_from_events, with_turn_signals
from sparkfeat.windows import sessionize

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _r(c, nd: int = 6):
    return F.round(c, nd)


# ---------------------------------------------------------------------------
# Shared oracle SQL fragments
# ---------------------------------------------------------------------------

_SIG_CTE = f"""WITH {TRANSCRIPTS_CTE},
sig AS (
    SELECT *,
        CAST(LENGTH(text) AS DOUBLE) AS text_len,
        CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE) AS token_est,
        CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END AS is_tool
    FROM transcripts
)"""

_W = "PARTITION BY conv_id ORDER BY ts, turn_idx"


# ---------------------------------------------------------------------------
# Flagship: point-in-time feature vectors (T1,T2,T4,T5,T7 + sessionize)
# ---------------------------------------------------------------------------

_FLAGSHIP_ORACLE = f"""{_SIG_CTE},
lagged AS (
    SELECT *,
        CASE WHEN LAG(epoch_us(ts)) OVER ({_W}) IS NULL THEN 1
             WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER ({_W}) > 1800000000 THEN 1
             ELSE 0 END AS is_new,
        LN(text_len / NULLIF(LAG(text_len) OVER ({_W}), 0)) AS lr_raw,
        ABS(token_est - LAG(token_est, 5) OVER ({_W})) AS ker_dir,
        ABS(token_est - LAG(token_est, 1) OVER ({_W})) AS ker_d1
    FROM sig
),
clipped AS (
    SELECT *,
        CASE WHEN lr_raw IS NULL THEN NULL
             ELSE LEAST(GREATEST(lr_raw, -0.1), 0.1) END AS lr
    FROM lagged
),
feat AS (
    SELECT conv_id, turn_idx, role, text, tool, ts, text_len, token_est, is_tool,
        CAST(SUM(is_new) OVER ({_W} ROWS UNBOUNDED PRECEDING) AS INTEGER) AS session_idx,
        lr,
        CASE WHEN COUNT(lr) OVER ({_W} ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) >= 3
             THEN STDDEV_SAMP(lr) OVER ({_W} ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
             END AS vol,
        100.0 * (text_len - MIN(text_len) OVER ({_W} ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
            / NULLIF(MAX(text_len) OVER ({_W} ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
                   - MIN(text_len) OVER ({_W} ROWS BETWEEN 13 PRECEDING AND CURRENT ROW), 0) AS stoch_k,
        ker_dir / NULLIF(
            CASE WHEN COUNT(ker_d1) OVER ({_W} ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) >= 5
                 THEN SUM(ker_d1) OVER ({_W} ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                 END, 0) AS ker
    FROM clipped
)
SELECT conv_id, turn_idx, role, text, tool, ts, text_len, token_est, is_tool,
    session_idx,
    ROUND(lr, 6) AS text_len_lr,
    ROUND(vol, 6) AS text_len_vol,
    ROUND(stoch_k, 6) AS text_len_stoch_k,
    ROUND(ker, 6) AS token_est_ker
FROM feat"""


@register("flagship_features", _FLAGSHIP_ORACLE)
def q_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The headline point-in-time feature plan (SURVEY.md §7 Stage 0):
    one windowed pass per conv_id producing per-turn feature vectors with
    zero leakage; text carried through for the equality invariant."""
    df = transcripts_from_events(spark, sf_dir)
    out = flagship_features(df)
    return out.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        "ts",
        "text_len",
        "token_est",
        "is_tool",
        "session_idx",
        _r(F.col("text_len_log-return")).alias("text_len_lr"),
        _r(F.col("text_len_volatility")).alias("text_len_vol"),
        _r(F.col("text_len_stochastic_k")).alias("text_len_stoch_k"),
        _r(F.col("token_est_ker")).alias("token_est_ker"),
    )


# ---------------------------------------------------------------------------
# Sessionization + per-session windowed aggregates (north rule)
# ---------------------------------------------------------------------------

_SESSION_ORACLE = f"""{_SIG_CTE},
lagged AS (
    SELECT *,
        CASE WHEN LAG(epoch_us(ts)) OVER ({_W}) IS NULL THEN 1
             WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER ({_W}) > 1800000000 THEN 1
             ELSE 0 END AS is_new
    FROM sig
),
sess AS (
    SELECT *,
        CAST(SUM(is_new) OVER ({_W} ROWS UNBOUNDED PRECEDING) AS INTEGER) AS session_idx
    FROM lagged
)
SELECT conv_id, session_idx,
    CAST(COUNT(*) AS BIGINT) AS n_turns,
    CAST(SUM(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT) AS n_user,
    CAST(SUM(is_tool) AS BIGINT) AS n_tool_turns,
    MIN(ts) AS session_start,
    MAX(ts) AS session_end,
    ROUND(AVG(text_len), 6) AS avg_text_len,
    ROUND(MAX(token_est), 6) AS max_token_est
FROM sess
GROUP BY conv_id, session_idx"""


@register("sessionize_aggregate", _SESSION_ORACLE)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-sessionization (30 min) + per-session aggregates. Session
    assignment and the groupBy share the conv_id hash partitioning —
    one shuffle total."""
    df = with_turn_signals(transcripts_from_events(spark, sf_dir))
    df = sessionize(df, gap_seconds=1800.0)
    return df.groupBy("conv_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum((F.col("role") == "user").cast("bigint")).alias("n_user"),
        F.sum("is_tool").cast("bigint").alias("n_tool_turns"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        _r(F.avg("text_len")).alias("avg_text_len"),
        _r(F.max("token_est")).alias("max_token_est"),
    )


# ---------------------------------------------------------------------------
# EWMA (T6) — Arrow applyInPandas engine vs closed-form SQL oracle
# ---------------------------------------------------------------------------

_EWMA_ORACLE = f"""{_SIG_CTE},
pos AS (
    SELECT conv_id, turn_idx, ts, text_len,
        CAST(ROW_NUMBER() OVER ({_W}) - 1 AS DOUBLE) AS p
    FROM sig
),
scaled AS (
    SELECT *,
        text_len * POW(POW(0.5, 1.0/7.5), -p) AS xa,
        POW(POW(0.5, 1.0/7.5), -p) AS wa
    FROM pos
)
SELECT conv_id, turn_idx, ts,
    ROUND(SUM(xa) OVER ({_W} ROWS UNBOUNDED PRECEDING)
        / SUM(wa) OVER ({_W} ROWS UNBOUNDED PRECEDING), 6) AS text_len_ewma
FROM scaled"""


@register("ewma_halflife", _EWMA_ORACLE)
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas-exact EWMA (halflife=7.5, adjust=True) via Arrow
    applyInPandas; oracle is the closed-form weighted cumsum. Plain
    per-conversation path — the chunked scan (T.ewma chunk_size=…) is
    reserved for mega-conversation skew and covered by unit tests; tiny
    chunks at test scale just multiply Arrow per-group overhead."""
    df = with_turn_signals(transcripts_from_events(spark, sf_dir))
    out = T.ewma(df, "text_len", halflife=7.5, out_col="ewma_raw")
    return out.select(
        "conv_id", "turn_idx", "ts", _r(F.col("ewma_raw")).alias("text_len_ewma")
    )


# ---------------------------------------------------------------------------
# Resample (A1/A2) — right-closed/right-labeled OHLC-style buckets
# ---------------------------------------------------------------------------

_B600 = "epoch_us(ts) - 1 - ((epoch_us(ts) - 1) % 600000000) + 600000000"

_RESAMPLE_ORACLE = f"""{_SIG_CTE},
b AS (
    SELECT conv_id, text_len, token_est,
        {_B600} AS bus,
        ROW_NUMBER() OVER (PARTITION BY conv_id, {_B600} ORDER BY ts, turn_idx) AS rn_a,
        ROW_NUMBER() OVER (PARTITION BY conv_id, {_B600} ORDER BY ts DESC, turn_idx DESC) AS rn_z
    FROM sig
)
SELECT conv_id, make_timestamp(bus) AS bucket_ts,
    MAX(CASE WHEN rn_a = 1 THEN text_len END) AS open_len,
    MAX(text_len) AS high_len,
    MIN(text_len) AS low_len,
    MAX(CASE WHEN rn_z = 1 THEN text_len END) AS close_len,
    ROUND(SUM(token_est), 6) AS vol_tokens,
    CAST(COUNT(*) AS BIGINT) AS n_turns,
    ROUND(MEDIAN(text_len), 6) AS med_len
FROM b GROUP BY conv_id, bus"""


@register("resample_ohlc", _RESAMPLE_ORACLE)
def q_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2: 10-min right-closed/right-labeled buckets with the OHLCV
    per-field agg map (open→first, high→max, low→min, close→last,
    volume→sum; cleaning.py:126-142) over per-turn signals."""
    from sparkfeat.resample import _bucket_end_us

    sig = with_turn_signals(transcripts_from_events(spark, sf_dir))
    # one groupBy computes the whole per-field agg map (resample() maps one
    # func per column; the OHLC map wants several over text_len, so build
    # the same bucketed groupBy directly).

    bucket = F.timestamp_micros(_bucket_end_us("ts", 600_000_000)).alias("bucket_ts")
    order = F.struct(F.col("ts"), F.col("turn_idx"))
    return sig.groupBy("conv_id", bucket).agg(
        F.min_by(F.col("text_len"), order).alias("open_len"),
        F.max("text_len").alias("high_len"),
        F.min("text_len").alias("low_len"),
        F.max_by(F.col("text_len"), order).alias("close_len"),
        _r(F.sum("token_est")).alias("vol_tokens"),
        F.count(F.lit(1)).alias("n_turns"),
        _r(F.percentile(F.col("text_len"), F.lit(0.5))).alias("med_len"),
    )


# ---------------------------------------------------------------------------
# Resample → densify → limited ffill (G1/G3, north-rule backfill)
# ---------------------------------------------------------------------------

_B300 = "epoch_us(ts) - 1 - ((epoch_us(ts) - 1) % 300000000) + 300000000"

_FILL_ORACLE = f"""{_SIG_CTE},
b AS (
    SELECT conv_id, text_len,
        {_B300} AS bus,
        ROW_NUMBER() OVER (PARTITION BY conv_id, {_B300} ORDER BY ts DESC, turn_idx DESC) AS rn_z
    FROM sig
),
r AS (
    SELECT conv_id, make_timestamp(bus) AS bucket_ts,
        MAX(CASE WHEN rn_z = 1 THEN text_len END) AS v
    FROM b GROUP BY conv_id, bus
),
grid AS (
    SELECT conv_id, unnest(generate_series(mn, mx, INTERVAL 5 MINUTE)) AS bucket_ts
    FROM (SELECT conv_id, MIN(bucket_ts) AS mn, MAX(bucket_ts) AS mx FROM r GROUP BY conv_id) s
),
j AS (
    SELECT g.conv_id, g.bucket_ts, r.v
    FROM grid g LEFT JOIN r ON g.conv_id = r.conv_id AND g.bucket_ts = r.bucket_ts
)
SELECT conv_id, bucket_ts,
    ROUND(v, 6) AS text_len_last,
    ROUND(last_value(v IGNORE NULLS) OVER (
        PARTITION BY conv_id ORDER BY bucket_ts
        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS text_len_filled
FROM j"""


@register("resample_densify_ffill", _FILL_ORACLE)
def q_resample_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3 grid densification + G1 limited forward fill (limit=3) over a
    5-min last-value resample — the north rule's resample-and-fill."""
    from sparkfeat.resample import densify, ffill, resample

    sig = with_turn_signals(transcripts_from_events(spark, sf_dir))
    r = resample(sig, 300, {"text_len": "last"})
    dense = densify(r, 300)
    filled = ffill(dense, ["text_len_last"], limit=3)
    return filled.select(
        "conv_id",
        "bucket_ts",
        _r(F.col("text_len_last")).alias("text_len_last"),
        _r(F.col("text_len_last_filled")).alias("text_len_filled"),
    )


# ---------------------------------------------------------------------------
# Linear interpolation with limit (G2)
# ---------------------------------------------------------------------------

_INTERP_ORACLE = f"""{_SIG_CTE},
b AS (
    SELECT conv_id, text_len, {_B300} AS bus
    FROM sig
),
r AS (
    SELECT conv_id, make_timestamp(bus) AS bucket_ts, AVG(text_len) AS v
    FROM b GROUP BY conv_id, bus
),
grid AS (
    SELECT conv_id, unnest(generate_series(mn, mx, INTERVAL 5 MINUTE)) AS bucket_ts
    FROM (SELECT conv_id, MIN(bucket_ts) AS mn, MAX(bucket_ts) AS mx FROM r GROUP BY conv_id) s
),
j AS (
    SELECT g.conv_id, g.bucket_ts, r.v,
        ROW_NUMBER() OVER (PARTITION BY g.conv_id ORDER BY g.bucket_ts) AS pos
    FROM grid g LEFT JOIN r ON g.conv_id = r.conv_id AND g.bucket_ts = r.bucket_ts
),
k AS (
    SELECT *,
        last_value(v IGNORE NULLS) OVER (PARTITION BY conv_id ORDER BY bucket_ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
        last_value(CASE WHEN v IS NOT NULL THEN pos END IGNORE NULLS)
            OVER (PARTITION BY conv_id ORDER BY bucket_ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_p,
        first_value(v IGNORE NULLS) OVER (PARTITION BY conv_id ORDER BY bucket_ts
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
        first_value(CASE WHEN v IS NOT NULL THEN pos END IGNORE NULLS)
            OVER (PARTITION BY conv_id ORDER BY bucket_ts
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_p
    FROM j
)
SELECT conv_id, bucket_ts, ROUND(v, 6) AS text_len_mean,
    ROUND(CASE
        WHEN v IS NOT NULL THEN v
        WHEN prev_v IS NULL THEN NULL
        WHEN pos - prev_p > 2 THEN NULL
        WHEN next_v IS NULL THEN prev_v
        ELSE prev_v + (next_v - prev_v) * (pos - prev_p) / (next_p - prev_p)
    END, 6) AS text_len_interp
FROM k"""


@register("interpolate_limit", _INTERP_ORACLE)
def q_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2: pandas-style linear interpolation (limit=2, forward) over the
    densified 5-min mean series."""
    from sparkfeat.resample import densify, interpolate, resample

    sig = with_turn_signals(transcripts_from_events(spark, sf_dir))
    r = resample(sig, 300, {"text_len": "mean"})
    dense = densify(r, 300)
    out = interpolate(dense, ["text_len_mean"], limit=2)
    return out.select(
        "conv_id",
        "bucket_ts",
        _r(F.col("text_len_mean")).alias("text_len_mean"),
        _r(F.col("text_len_mean_interp")).alias("text_len_interp"),
    )


# ---------------------------------------------------------------------------
# Future targets via lead (J2/J3) — y path, never features
# ---------------------------------------------------------------------------

_TARGETS_ORACLE = f"""{_SIG_CTE},
t AS (
    SELECT conv_id, turn_idx, ts, text_len,
        LEAD(text_len, 1) OVER ({_W}) AS y1,
        LEAD(text_len, 3) OVER ({_W}) AS y3
    FROM sig
)
SELECT conv_id, turn_idx, ts, text_len,
    y1 AS y_lead_1, y3 AS y_lead_3,
    ROUND(CASE WHEN LN(y1 / NULLIF(text_len, 0)) IS NULL THEN NULL
        ELSE LEAST(GREATEST(LN(y1 / NULLIF(text_len, 0)), -0.1), 0.1) END, 6)
        AS y_logret_1
FROM t"""


@register("lead_targets", _TARGETS_ORACLE)
def q_lead_targets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/J3 target extraction: lead values at t+1/t+3 plus the clipped
    y log-return (transform.py:55-62) — future data flows only to y."""
    from sparkfeat.asof import with_targets
    from sparkfeat.transforms import log_return_y

    sig = with_turn_signals(transcripts_from_events(spark, sf_dir))
    out = with_targets(sig, "text_len", [1, 3])
    return out.select(
        "conv_id",
        "turn_idx",
        "ts",
        "text_len",
        "y_lead_1",
        "y_lead_3",
        _r(log_return_y("y_lead_1", "text_len")).alias("y_logret_1"),
    )


# ---------------------------------------------------------------------------
# As-of join on an hourly probe grid (J1 — the north-rule operator)
# ---------------------------------------------------------------------------

_ASOF_ORACLE = f"""{_SIG_CTE},
spans AS (
    SELECT conv_id,
        make_timestamp(epoch_us(MIN(ts)) - (epoch_us(MIN(ts)) % 3600000000)) AS h0,
        MAX(ts) AS mx
    FROM sig GROUP BY conv_id
),
probes AS (
    SELECT conv_id, unnest(generate_series(h0, mx, INTERVAL 1 HOUR)) AS probe_ts
    FROM spans
)
SELECT p.conv_id, p.probe_ts,
    ROUND(d.text_len, 6) AS asof_text_len,
    CAST(d.turn_idx AS DOUBLE) AS asof_turn
FROM probes p ASOF LEFT JOIN sig d
    ON p.conv_id = d.conv_id AND p.probe_ts >= d.ts"""


@register("asof_join_grid", _ASOF_ORACLE)
def q_asof_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 point-in-time as-of join: for every hourly grid timestamp per
    conversation, the last turn at-or-before it. Union-tag sort-merge
    over hash(conv_id) — the oracle cross-checks with DuckDB's native
    ASOF JOIN, an independent implementation of the same semantics."""
    from sparkfeat.asof import asof_join

    sig = with_turn_signals(transcripts_from_events(spark, sf_dir))
    spans = sig.groupBy("conv_id").agg(
        (
            F.unix_micros(F.min("ts").cast("timestamp"))
            - F.unix_micros(F.min("ts").cast("timestamp")) % 3_600_000_000
        ).alias("_h0"),
        F.unix_micros(F.max("ts").cast("timestamp")).alias("_mx"),
    )
    probes = spans.select(
        "conv_id",
        F.explode(F.sequence(F.col("_h0"), F.col("_mx"), F.lit(3_600_000_000))).alias("_us"),
    ).select("conv_id", F.timestamp_micros(F.col("_us")).alias("probe_ts"))
    out = asof_join(probes, sig, ["text_len", "turn_idx"])
    return out.select(
        "conv_id",
        "probe_ts",
        _r(F.col("text_len")).alias("asof_text_len"),
        F.col("turn_idx").cast("double").alias("asof_turn"),
    )


# ---------------------------------------------------------------------------
# Entity-level predicates (P2/P3), positional slice (P6), top-k (A5/O2)
# ---------------------------------------------------------------------------

_FLOOR_ORACLE = f"""{_SIG_CTE},
keep AS (
    SELECT conv_id FROM sig GROUP BY conv_id HAVING MIN(text_len) > 14
)
SELECT s.conv_id, CAST(COUNT(*) AS BIGINT) AS n_turns,
    ROUND(MIN(s.text_len), 6) AS min_len, ROUND(AVG(s.text_len), 6) AS avg_len
FROM sig s JOIN keep k ON s.conv_id = k.conv_id
GROUP BY s.conv_id"""


@register("entity_floor_filter", _FLOOR_ORACLE)
def q_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 select_above_floor: keep conversations whose every turn length
    clears the floor; per-entity stats of the survivors."""
    from sparkfeat.cleaning import select_above_floor

    sig = with_turn_signals(transcripts_from_events(spark, sf_dir))
    kept = select_above_floor(sig, "text_len", 14.0)
    return kept.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        _r(F.min("text_len")).alias("min_len"),
        _r(F.avg("text_len")).alias("avg_len"),
    )


_CEIL_ORACLE = f"""{_SIG_CTE},
keep AS (
    SELECT conv_id FROM sig GROUP BY conv_id HAVING MAX(text_len) < 42
)
SELECT s.conv_id, CAST(COUNT(*) AS BIGINT) AS n_turns,
    ROUND(MAX(s.text_len), 6) AS max_tok
FROM sig s JOIN keep k ON s.conv_id = k.conv_id
GROUP BY s.conv_id"""


@register("entity_ceiling_filter", _CEIL_ORACLE)
def q_ceiling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 select_below_ceiling (documented semantics — the reference's
    dispatcher bug at cleaning.py:190-194 is deliberately not ported)."""
    from sparkfeat.cleaning import select_below_ceiling

    sig = with_turn_signals(transcripts_from_events(spark, sf_dir))
    kept = select_below_ceiling(sig, "text_len", 42.0)
    return kept.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        _r(F.max("text_len")).alias("max_tok"),
    )


_SLICE_ORACLE = f"""{_SIG_CTE},
rn AS (
    SELECT conv_id, turn_idx, role, text, ts,
        ROW_NUMBER() OVER ({_W}) AS r
    FROM sig
)
SELECT conv_id, turn_idx, role, text, ts FROM rn WHERE r <= 5"""


@register("slice_head", _SLICE_ORACLE)
def q_slice_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 positional head slice (first 5 turns per conversation) —
    carries text through to exercise the per-turn text-equality
    invariant under stable ordering."""
    from sparkfeat.cleaning import slice_head

    t = transcripts_from_events(spark, sf_dir)
    return slice_head(t, 5).select("conv_id", "turn_idx", "role", "text", "ts")


_TOPK_ORACLE = f"""{_SIG_CTE},
totals AS (
    SELECT conv_id, SUM(token_est) AS total_tokens, CAST(COUNT(*) AS BIGINT) AS n_turns
    FROM sig GROUP BY conv_id
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (ORDER BY total_tokens DESC, conv_id) AS rk
    FROM totals
)
SELECT conv_id, ROUND(total_tokens, 6) AS total_tokens, n_turns, CAST(rk AS INT) AS rk
FROM ranked WHERE rk <= 10"""


@register("topk_entities", _TOPK_ORACLE)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/O2 liquidity-style top-k: rank conversations by total token
    volume (map-side partial agg → tiny ranked set; deterministic
    conv_id tie-break)."""
    from pyspark.sql import Window

    sig = with_turn_signals(transcripts_from_events(spark, sf_dir))
    totals = sig.groupBy("conv_id").agg(
        F.sum("token_est").alias("_tot"), F.count(F.lit(1)).alias("n_turns")
    )
    w = Window.orderBy(F.col("_tot").desc(), F.col("conv_id"))
    return (
        totals.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 10)
        .select(
            "conv_id", _r(F.col("_tot")).alias("total_tokens"), "n_turns", "rk"
        )
    )


# ---------------------------------------------------------------------------
# Normalization fit/apply (A6, N1–N3)
# ---------------------------------------------------------------------------

_NORM_ORACLE = f"""{_SIG_CTE},
stats AS (
    SELECT conv_id,
        AVG(text_len) AS m, STDDEV_POP(text_len) AS sd,
        MIN(text_len) AS mn, MAX(text_len) AS mx,
        quantile_cont(text_len, 0.25) AS q25,
        quantile_cont(text_len, 0.5) AS q50,
        quantile_cont(text_len, 0.75) AS q75
    FROM sig GROUP BY conv_id
)
SELECT s.conv_id, s.turn_idx, s.text_len,
    ROUND((s.text_len - t.m) / NULLIF(t.sd, 0), 6) AS z_standard,
    ROUND((s.text_len - t.mn) / NULLIF(t.mx - t.mn, 0), 6) AS z_minmax,
    ROUND((s.text_len - t.q50) / NULLIF(t.q75 - t.q25, 0), 6) AS z_robust
FROM sig s JOIN stats t ON s.conv_id = t.conv_id"""


@register("normalize_scalers", _NORM_ORACLE)
def q_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6+N1–N3 fit/apply: per-conversation stats agg (the persistable
    fit artifact) broadcast-joined back; standard/min-max/robust
    closed-form apply."""
    from sparkfeat.normalize import apply_scaler, fit_stats

    sig = with_turn_signals(transcripts_from_events(spark, sf_dir))
    stats = fit_stats(sig, "text_len")
    out = apply_scaler(sig, stats, "text_len", "standard", out_col="z_standard")
    out = apply_scaler(out, stats, "text_len", "min_max", out_col="z_minmax")
    out = apply_scaler(out, stats, "text_len", "robust", out_col="z_robust")
    return out.select(
        "conv_id",
        "turn_idx",
        "text_len",
        _r(F.col("z_standard")).alias("z_standard"),
        _r(F.col("z_minmax")).alias("z_minmax"),
        _r(F.col("z_robust")).alias("z_robust"),
    )


@register("gaussian_scaler")  # no SQL oracle: Φ⁻¹ not expressible in DuckDB
def q_gaussian(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N1 'gaussian' quantile scaler (rank → Φ⁻¹ via vectorized Acklam
    pandas UDF). Rows-only driver check; exactness is covered by the
    pytest oracle against statistics.NormalDist.inv_cdf."""
    from sparkfeat.normalize import gaussian_scale

    sig = with_turn_signals(transcripts_from_events(spark, sf_dir))
    out = gaussian_scale(sig, "text_len", "z_gaussian")
    return out.select(
        "conv_id", "turn_idx", "text_len", _r(F.col("z_gaussian")).alias("z_gaussian")
    )


# ---------------------------------------------------------------------------
# Classification: balanced bins fit + histogram one-hot apply (A7, N4/N5)
# ---------------------------------------------------------------------------

_BINS_ORACLE = f"""{_SIG_CTE},
edges AS (
    SELECT conv_id, quantile_cont(text_len, [0.0, 0.2, 0.4, 0.6, 0.8, 1.0]) AS e
    FROM sig GROUP BY conv_id
)
SELECT s.conv_id, s.turn_idx, s.text_len,
    CAST(CASE
        WHEN s.text_len < e[1] OR s.text_len > e[6] THEN -1
        WHEN s.text_len = e[6] THEN 4
        ELSE LEN(list_filter(e[2:5], x -> s.text_len >= x))
    END AS INT) AS bin_idx
FROM sig s JOIN edges t ON s.conv_id = t.conv_id"""


@register("classify_bins", _BINS_ORACLE)
def q_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 exact-quantile bin edges (np.interp semantics,
    classifier.py:73-74) + N5 histogram bin assignment with the
    right-inclusive last bin."""
    from sparkfeat.classify import apply_bins, fit_bins

    sig = with_turn_signals(transcripts_from_events(spark, sf_dir))
    bins = fit_bins(sig, "text_len", 5)
    out = apply_bins(sig, bins, "text_len", 5, idx_col="bin_idx")
    return out.select("conv_id", "turn_idx", "text_len", "bin_idx")


# ---------------------------------------------------------------------------
# Time-range selection (P1)
# ---------------------------------------------------------------------------

_BETWEEN_ORACLE = f"""{_SIG_CTE}
SELECT conv_id, turn_idx, role, text, tool, ts
FROM transcripts
WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts <= TIMESTAMP '2024-01-14 23:59:59'"""


@register("select_between", _BETWEEN_ORACLE)
def q_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 inclusive time-range row filter — pushed to the parquet scan
    (PushedFilters on ts), full transcript schema preserved."""
    from sparkfeat.cleaning import select_between

    t = transcripts_from_events(spark, sf_dir)
    return select_between(t, "2024-01-08 00:00:00", "2024-01-14 23:59:59")
