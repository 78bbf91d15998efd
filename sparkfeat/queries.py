"""Driver-facing query registry: Spark implementation + DuckDB oracle
per operator (SURVEY.md §2 inventory).

Every transcript query derives the transcript table from the driver's
``events`` parquet with byte-identical logic on both engines
(``schema.TRANSCRIPTS_CTE`` ↔ ``schema.transcripts_from_events``), so
the DuckDB oracle checks real end-to-end semantics, not a toy.

Float columns are rounded to 6 decimals **in both engines** so the
driver's order-insensitive value hash is robust to sub-ulp libm
differences (JVM vs C math), and every ROUND is followed by ``+ 0.0``
on both sides (``_canon_signed_zero`` / ``_r``) so IEEE ``-0.0`` never
reaches the hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkfeat import transforms as T
from sparkfeat.pipeline import flagship_features
from sparkfeat.schema import (
    TRANSCRIPTS_CTE,
    TURN_SIGNALS_SQL,
    transcripts_from_events,
    with_turn_signals,
)
from sparkfeat.windows import sessionize

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}
# Strategy twins / folded variants: oracle-checked in pytest only, so the
# driver registry stays ≤50 and its 50-row sample covers everything.
EXTRA_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
EXTRA_ORACLES: dict[str, str] = {}


def _canon_signed_zero(sql: str) -> str:
    """Rewrite every ``ROUND(...)`` in an oracle as ``(ROUND(...) + 0.0)``.

    DuckDB's ROUND emits IEEE ``-0.0`` when a tiny negative (e.g. a window
    sum that cancels, a log-return of -1e-9) rounds to zero; Spark's
    ``F.round`` emits ``+0.0`` for the same input. The driver's value hash
    distinguishes the two, so both engines canonicalize: ``-0.0 + 0.0``
    is ``+0.0`` under IEEE-754 round-to-nearest on both. NULL + 0.0 stays
    NULL, and every ROUND site here is a terminal double-typed projection
    (verified: no CAST-of-ROUND in any oracle), so the rewrite is
    value- and schema-neutral apart from the zero sign.

    The scanner is SQL-aware where it matters: single-quoted string
    literals (with ``''`` escapes) are copied verbatim both while
    looking for ``ROUND(`` and while walking to its matching close
    paren, and a match must start at an identifier boundary — so a
    literal containing ``ROUND(``, an identifier ending in ``ROUND``,
    or an unbalanced paren inside a quoted argument can never be
    silently mangled (regression-tested in tests/test_oracle_parity).
    """

    def _skip_str(k: int) -> int:
        """Given k at an opening quote, return index just past the
        closing quote ('' escapes handled)."""
        k += 1
        while k < n:
            if sql[k] == "'":
                if k + 1 < n and sql[k + 1] == "'":
                    k += 2
                    continue
                return k + 1
            k += 1
        return n

    out: list[str] = []
    i = 0
    n = len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":
            j = _skip_str(i)
            out.append(sql[i:j])
            i = j
            continue
        if sql.startswith("ROUND(", i) and (
            i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] == "_")
        ):
            depth = 0
            k = i + len("ROUND(") - 1  # index of the opening paren
            while k < n:
                c = sql[k]
                if c == "'":
                    k = _skip_str(k)
                    continue
                if c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                    if depth == 0:
                        break
                k += 1
            out.append("(" + sql[i : k + 1] + " + 0.0)")
            i = k + 1
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def register(name: str, oracle: str | None = None, driver: bool = True):
    """Register a query. ``driver=True`` entries go to the driver-facing
    registry (capped at 50 so the driver's 50-row correctness sample
    covers EVERY query each round); ``driver=False`` entries are
    physical-strategy twins / trivial variants that stay fully
    oracle-checked in pytest (tests/test_oracle_parity.py runs both
    dicts) without consuming a driver slot."""

    def deco(fn):
        target_q = QUERIES if driver else EXTRA_QUERIES
        target_o = ORACLES if driver else EXTRA_ORACLES
        target_q[name] = fn
        if oracle is not None:
            target_o[name] = _canon_signed_zero(oracle)
        return fn

    return deco


def _r(c, nd: int = 6):
    # + 0.0 canonicalizes IEEE signed zero to match the oracle-side
    # rewrite in _canon_signed_zero (see its docstring).
    return F.round(c, nd) + F.lit(0.0)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents scan with a parallelism floor. A small corpus arrives
    as 1-2 parquet splits, which serializes the expression-heavy text
    operators onto one core (measured 10.5 s → ~1 s for the quality
    gate at sf0.1); a production corpus arrives as thousands of splits
    and takes the no-repartition branch, so no shuffle is ever added at
    scale.

    Applied only to the narrow expression/mapInPandas pipelines (text
    metrics, language ID, fingerprints, multimodal codecs, the
    corpus-prep composition). The dedup operators deliberately read
    plain: MinHash/SimHash repartition internally on the id, and the
    Jaccard/exact paths shuffle at their first groupBy — measured, the
    extra pre-shuffle there costs ~1 s without adding parallelism."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    want = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, want // 2):
        df = df.repartition(want)
    return df


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
        CASE WHEN COUNT(lr_raw) OVER ({_W} ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) >= 3
             THEN STDDEV_SAMP(lr_raw) OVER ({_W} ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
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
def q_flagship(
    spark: SparkSession, sf_dir: str, spread: bool = False
) -> DataFrame:
    """The headline point-in-time feature plan (SURVEY.md §7 Stage 0):
    one windowed pass per conv_id producing per-turn feature vectors with
    zero leakage; text carried through for the equality invariant.
    ``spread`` pins the transcript exchange wide (see
    transcripts_from_events) — on for the nested drift capstones whose
    post-window melt+fold work dominates."""
    df = transcripts_from_events(spark, sf_dir, spread=spread)
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
    """pandas-exact EWMA (halflife=7.5, adjust=True) via the
    sorted-stream mapInPandas kernel — ONE Python crossing per Arrow
    batch with cross-batch state carry, the production path (the
    per-group applyInPandas strategy pays per-conversation Arrow
    overhead: builder measured 197s vs 22s on 5M turns; it stays
    oracle-covered as ``ewma_grouped``). Oracle is the closed-form
    weighted cumsum."""
    from sparkfeat.transforms import ewma_sorted
    from sparkfeat.windows import repartition_sorted

    df = repartition_sorted(with_turn_signals(transcripts_from_events(spark, sf_dir)))
    out = ewma_sorted(df, [("text_len", 7.5, "ewma_raw")])
    return out.select(
        "conv_id", "turn_idx", "ts", _r(F.col("ewma_raw")).alias("text_len_ewma")
    )


@register("ewma_grouped", _EWMA_ORACLE, driver=False)
def q_ewma_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 EWMA via per-conversation Arrow applyInPandas — the simple
    strategy, kept oracle-covered to prove all physical strategies agree
    (the chunked scan for skew is pytest-covered)."""
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

_B4H = "epoch_us(ts) - 1 - ((epoch_us(ts) - 1) % 14400000000) + 14400000000"

_FILL_ORACLE = f"""{_SIG_CTE},
b AS (
    SELECT conv_id, text_len,
        {_B4H} AS bus,
        ROW_NUMBER() OVER (PARTITION BY conv_id, {_B4H} ORDER BY ts DESC, turn_idx DESC) AS rn_z
    FROM sig
),
r AS (
    SELECT conv_id, make_timestamp(bus) AS bucket_ts,
        MAX(CASE WHEN rn_z = 1 THEN text_len END) AS v
    FROM b GROUP BY conv_id, bus
),
grid AS (
    SELECT conv_id, unnest(generate_series(mn, mx, INTERVAL 4 HOUR)) AS bucket_ts
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
    r = resample(sig, 14400, {"text_len": "last"})
    dense = densify(r, 14400)
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
    SELECT conv_id, text_len, {_B4H} AS bus
    FROM sig
),
r AS (
    SELECT conv_id, make_timestamp(bus) AS bucket_ts, AVG(text_len) AS v
    FROM b GROUP BY conv_id, bus
),
grid AS (
    SELECT conv_id, unnest(generate_series(mn, mx, INTERVAL 4 HOUR)) AS bucket_ts
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
    r = resample(sig, 14400, {"text_len": "mean"})
    dense = densify(r, 14400)
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


@register("asof_interval_grid", _ASOF_ORACLE, driver=False)
def q_asof_interval_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 as-of, THIRD physical strategy (serving path): the snapshot
    is compiled once into validity intervals (asof.snapshot_intervals —
    one lead window, paid at snapshot time) and each probe answers via
    an equi+range LEFT join (asof.asof_join_intervals). The identical
    code path serves streaming probes (streaming.stream_asof_serve,
    stream-static join; stream ≡ batch pytest-pinned). Same DuckDB
    native-ASOF oracle as the union-tag strategy — three independent
    implementations of one semantic."""
    from sparkfeat.asof import asof_join_intervals, snapshot_intervals

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
    iv = snapshot_intervals(sig, ["text_len", "turn_idx"])
    out = asof_join_intervals(probes, iv, ["text_len", "turn_idx"])
    return out.select(
        "conv_id",
        "probe_ts",
        _r(F.col("text_len")).alias("asof_text_len"),
        F.col("turn_idx").cast("double").alias("asof_turn"),
    )


_CONFIG_ORACLE = f"""{_SIG_CTE},
lagged AS (
    SELECT *,
        LN(text_len / NULLIF(LAG(text_len) OVER ({_W}), 0)) AS lr_raw
    FROM sig
),
feat AS (
    SELECT conv_id, turn_idx, ts, text_len,
        CASE WHEN lr_raw IS NULL THEN NULL
             ELSE LEAST(GREATEST(lr_raw, -0.1), 0.1) END AS lr,
        CASE WHEN COUNT(lr_raw) OVER ({_W} ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) >= 3
             THEN STDDEV_SAMP(lr_raw) OVER ({_W} ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
             END AS vol
    FROM lagged
),
stats AS (
    SELECT conv_id, AVG(vol) AS m, STDDEV_POP(vol) AS sd,
        quantile_cont(lr, [0.0, 0.2, 0.4, 0.6, 0.8, 1.0]) AS e
    FROM feat GROUP BY conv_id
),
j AS (
    SELECT f.*, s.m, s.sd, s.e,
        LEAD(f.lr, 1) OVER (PARTITION BY f.conv_id ORDER BY f.ts, f.turn_idx) AS y1,
        LEAD(f.lr, 2) OVER (PARTITION BY f.conv_id ORDER BY f.ts, f.turn_idx) AS y2
    FROM feat f JOIN stats s ON f.conv_id = s.conv_id
)
SELECT conv_id, turn_idx,
    ROUND(text_len, 6) AS text_len_value,
    ROUND((vol - m) / NULLIF(sd, 0), 6) AS vol_z,
    ROUND(y1, 6) AS y_lead_1,
    ROUND(y2, 6) AS y_lead_2,
    CAST(CASE
        WHEN lr IS NULL THEN NULL
        WHEN lr < e[1] OR lr > e[6] THEN -1
        WHEN lr = e[6] THEN 4
        ELSE LEN(list_filter(e[2:5], x -> lr >= x))
    END AS INT) AS y_bin
FROM j"""


@register("config_pipeline", _CONFIG_ORACLE)
def q_config_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end config-driven user journey (factory/schemas twin):
    a reference-shaped config — value + normalized volatility features,
    a clipped log-return target with 5 balanced bins and 2 forecast
    leads — compiled by config.build_pipeline into one plan; the oracle
    replays every stage (transform, fit/apply normalization, leads, bin
    assignment) in SQL."""
    from sparkfeat.config import build_pipeline, parse_config

    cfg = parse_config(
        {
            "feature_config_list": [
                {"name": "text_len", "transformation": {"name": "value"}},
                {
                    "name": "text_len",
                    "transformation": {"name": "volatility", "window": 10},
                    "normalization": "standard",
                    "length": 10,
                },
                {
                    "name": "text_len",
                    "transformation": {"name": "log-return"},
                    "nbins": 5,
                    "is_target": True,
                },
            ],
            "n_forecasts": 2,
        }
    )
    sig = with_turn_signals(transcripts_from_events(spark, sf_dir))
    out = build_pipeline(sig, cfg)
    return out.select(
        "conv_id",
        "turn_idx",
        _r(F.col("text_len_value")).alias("text_len_value"),
        _r(F.col("text_len_volatility_scaled")).alias("vol_z"),
        _r(F.col("y_lead_1")).alias("y_lead_1"),
        _r(F.col("y_lead_2")).alias("y_lead_2"),
        F.col("`text_len_log-return_bin`").alias("y_bin"),
    )


# ---------------------------------------------------------------------------
# Calendar interval membership + minutes-after-open sampling (P4/J4)
# ---------------------------------------------------------------------------

_US_DAY = 86_400_000_000
_HOURS_ORACLE = f"""{_SIG_CTE}
SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_in_hours,
    ROUND(AVG(text_len), 6) AS avg_len
FROM sig
WHERE (epoch_us(ts) % {_US_DAY}) BETWEEN {9 * 3_600_000_000} AND {17 * 3_600_000_000}
GROUP BY conv_id"""


def _daily_intervals(sig: DataFrame, with_entity: bool) -> DataFrame:
    """09:00–17:00 UTC interval per calendar day present in the data
    (the deterministic stand-in for a pandas_market_calendar schedule —
    the operator takes ANY small (open, close) table)."""
    cols = (["conv_id"] if with_entity else []) + [F.to_date("ts").alias("_d")]
    days = sig.select(*cols).distinct()
    day_us = F.unix_date(F.col("_d")).cast("long") * F.lit(_US_DAY)
    return days.select(
        *(["conv_id"] if with_entity else []),
        F.timestamp_micros(day_us + F.lit(9 * 3_600_000_000)).alias("open"),
        F.timestamp_micros(day_us + F.lit(17 * 3_600_000_000)).alias("close"),
    )


@register("trading_hours_filter", _HOURS_ORACLE, driver=False)
def q_trading_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4/J4 calendar-hours membership: broadcast interval semi-join of
    the fact table against a small (open, close) schedule (09:00–17:00
    per day here); the oracle reduces the same schedule to time-of-day
    arithmetic. The fact side never shuffles for the filter."""
    from sparkfeat.cleaning import filter_by_intervals

    sig = with_turn_signals(transcripts_from_events(spark, sf_dir))
    ivs = _daily_intervals(sig, with_entity=False)
    kept = filter_by_intervals(sig, ivs)
    return kept.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_in_hours"),
        _r(F.avg("text_len")).alias("avg_len"),
    )


_TZ_ORACLE = f"""WITH {TRANSCRIPTS_CTE}
SELECT conv_id, turn_idx,
    timezone('UTC', timezone('Asia/Kolkata', ts)) AS ts_utc
FROM transcripts"""


@register("tz_to_utc", _TZ_ORACLE)
def q_tz_to_utc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference convert_to_utc (cleaning.py:376-414): the transcript
    timestamps re-interpreted as Asia/Kolkata wall time (a fixed
    UTC+05:30 zone — no DST ambiguity, so both engines' tzdata walks
    agree on every instant) and converted to naive-UTC. Exercises the
    non-UTC-source scan path end-to-end."""
    from sparkfeat.cleaning import to_utc

    t = transcripts_from_events(spark, sf_dir)
    out = to_utc(t, "ts", "Asia/Kolkata")
    return out.select("conv_id", "turn_idx", F.col("ts").alias("ts_utc"))


_MAO_ORACLE = f"""{_SIG_CTE},
probes AS (
    SELECT DISTINCT conv_id,
        CAST(CAST(ts AS DATE) AS TIMESTAMP) + INTERVAL 9 HOUR + INTERVAL 30 MINUTE
            AS probe_ts
    FROM sig
)
SELECT p.conv_id, p.probe_ts,
    ROUND(d.text_len, 6) AS asof_text_len,
    CAST(d.turn_idx AS DOUBLE) AS asof_turn
FROM probes p ASOF LEFT JOIN sig d
    ON p.conv_id = d.conv_id AND p.probe_ts >= d.ts"""


@register("minutes_after_open", _MAO_ORACLE)
def q_minutes_after_open(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily point-in-time sampling k minutes after open
    (cleaning.py:417-429): probe generation from the interval table +
    as-of join — checked against DuckDB's native ASOF JOIN."""
    from sparkfeat.asof import asof_join
    from sparkfeat.cleaning import probes_after_open

    sig = with_turn_signals(transcripts_from_events(spark, sf_dir))
    ivs = _daily_intervals(sig, with_entity=True)
    probes = probes_after_open(ivs, minutes=30).select("conv_id", "probe_ts")
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


@register("entity_ceiling_filter", _CEIL_ORACLE, driver=False)
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


@register("slice_head", _SLICE_ORACLE, driver=False)
def q_slice_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 positional head slice (first 5 turns per conversation) —
    carries text through to exercise the per-turn text-equality
    invariant under stable ordering."""
    from sparkfeat.cleaning import slice_head

    t = transcripts_from_events(spark, sf_dir)
    return slice_head(t, 5).select("conv_id", "turn_idx", "role", "text", "ts")


_SLICE_RANGE_ORACLE = f"""{_SIG_CTE},
rn AS (
    SELECT conv_id, turn_idx, role, text, ts,
        ROW_NUMBER() OVER ({_W}) - 1 AS p,
        COUNT(*) OVER (PARTITION BY conv_id) AS n
    FROM sig
)
SELECT conv_id, turn_idx, role, text, ts FROM rn
WHERE p >= GREATEST(n - 7, 0) AND p < n - 2"""


@register("slice_range", _SLICE_RANGE_ORACLE)
def q_slice_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 arbitrary positional slice with pandas iloc semantics
    (reference slice_data_dict, cleaning.py:442-456): here
    iloc[-7:-2] per conversation — negative start AND negative end, the
    part slice_head/tail cannot express."""
    from sparkfeat.cleaning import slice_range

    t = transcripts_from_events(spark, sf_dir)
    return slice_range(t, -7, -2).select("conv_id", "turn_idx", "role", "text", "ts")


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

    from sparkfeat.cleaning import TOPK_SHARDS

    sig = with_turn_signals(transcripts_from_events(spark, sf_dir))
    totals = sig.groupBy("conv_id").agg(
        F.sum("token_est").alias("_tot"), F.count(F.lit(1)).alias("n_turns")
    )
    # two-phase shard rank (house pattern; exact — local top-k is a
    # superset of the global top-k): no single-task sort of the
    # one-row-per-entity totals table
    order = [F.col("_tot").desc(), F.col("conv_id")]
    local = Window.partitionBy(
        F.pmod(F.hash(F.col("conv_id")), F.lit(TOPK_SHARDS))
    ).orderBy(*order)
    pruned = totals.withColumn("_lr", F.row_number().over(local)).filter(
        F.col("_lr") <= 10
    )
    w = Window.orderBy(*order)  # ≤ shards×10 rows by construction
    return (
        pruned.withColumn("rk", F.row_number().over(w).cast("int"))
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


def _acklam_sql(p: str) -> str:
    """Acklam's inverse-normal-CDF as a DuckDB scalar expression over
    ``p`` — the same public-domain rational approximation (and the same
    operation order) as ``normalize._acklam_ndtri``, so the two engines
    agree to ~1e-15 (libm log/sqrt), far inside the round-6 tolerance."""
    a = [-3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
         1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00]
    b = [-5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
         6.680131188771972e01, -1.328068155288572e01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
         -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
         3.754408661907416e00]

    def pc(q: str) -> str:
        return (f"((((({c[0]!r}*{q} + {c[1]!r})*{q} + {c[2]!r})*{q} + {c[3]!r})*{q}"
                f" + {c[4]!r})*{q} + {c[5]!r})")

    def pd_(q: str) -> str:
        return (f"(((({d[0]!r}*{q} + {d[1]!r})*{q} + {d[2]!r})*{q} + {d[3]!r})*{q}"
                " + 1)")

    qlo = f"sqrt(-2*ln({p}))"
    qhi = f"sqrt(-2*ln(1-({p})))"
    r = f"((({p})-0.5)*(({p})-0.5))"
    qm = f"(({p})-0.5)"
    num_mid = (f"((((({a[0]!r}*{r} + {a[1]!r})*{r} + {a[2]!r})*{r} + {a[3]!r})*{r}"
               f" + {a[4]!r})*{r} + {a[5]!r})*{qm}")
    den_mid = (f"((((({b[0]!r}*{r} + {b[1]!r})*{r} + {b[2]!r})*{r} + {b[3]!r})*{r}"
               f" + {b[4]!r})*{r} + 1)")
    return (f"CASE WHEN {p} < 0.02425 THEN {pc(qlo)} / {pd_(qlo)} "
            f"WHEN {p} > 0.97575 THEN -({pc(qhi)}) / {pd_(qhi)} "
            f"ELSE {num_mid} / {den_mid} END")


_GAUSS_ORACLE = f"""{_SIG_CTE},
rk AS (
    SELECT conv_id, turn_idx, text_len,
        COUNT(text_len) OVER (PARTITION BY conv_id ORDER BY text_len) AS cle,
        COUNT(text_len) OVER (PARTITION BY conv_id) AS n
    FROM sig
),
pr AS (
    SELECT conv_id, turn_idx, text_len,
        LEAST(GREATEST((cle - 0.5) / n, 1e-7), 1 - 1e-7) AS p
    FROM rk
)
SELECT conv_id, turn_idx, text_len,
    ROUND({_acklam_sql('p')}, 6) AS z_gaussian
FROM pr"""


@register("gaussian_scaler", _GAUSS_ORACLE)
def q_gaussian(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N1 'gaussian' quantile scaler (valid-rank → Φ⁻¹ via vectorized
    Acklam pandas UDF); the oracle replays the midpoint-ECDF rank (COUNT
    over the value-ordered peer-inclusive frame) and the same Acklam
    rational approximation in pure SQL."""
    from sparkfeat.normalize import gaussian_scale

    sig = with_turn_signals(transcripts_from_events(spark, sf_dir))
    out = gaussian_scale(sig, "text_len", "z_gaussian")
    return out.select(
        "conv_id", "turn_idx", "text_len", _r(F.col("z_gaussian")).alias("z_gaussian")
    )


_INV_ORACLE = f"""{_SIG_CTE},
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
    ROUND((s.text_len - t.m) / NULLIF(t.sd, 0) * t.sd + t.m, 6) AS v_std_rt,
    ROUND((s.text_len - t.q50) / NULLIF(t.q75 - t.q25, 0) * (t.q75 - t.q25) + t.q50, 6)
        AS v_rob_rt
FROM sig s JOIN stats t ON s.conv_id = t.conv_id"""


@register("inverse_scalers", _INV_ORACLE)
def q_inverse_scalers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predict-path inverse transforms (financial.py:330-385): scale with
    the fit artifact, then invert model-space values back to raw units
    with the SAME stats table — the oracle replays both directions and
    the round trip must reproduce text_len."""
    from sparkfeat.normalize import apply_scaler, fit_stats, inverse_scaler

    sig = with_turn_signals(transcripts_from_events(spark, sf_dir))
    stats = fit_stats(sig, "text_len")
    z = apply_scaler(sig, stats, "text_len", "standard", out_col="z_standard")
    z = apply_scaler(z, stats, "text_len", "robust", out_col="z_robust")
    rt = inverse_scaler(z, stats, "z_standard", "standard", out_col="v_std_rt")
    rt = inverse_scaler(rt, stats, "z_robust", "robust", out_col="v_rob_rt")
    return rt.select(
        "conv_id",
        "turn_idx",
        "text_len",
        _r(F.col("z_standard")).alias("z_standard"),
        _r(F.col("v_std_rt")).alias("v_std_rt"),
        _r(F.col("v_rob_rt")).alias("v_rob_rt"),
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


# ---------------------------------------------------------------------------
# Documents: text stats / quality / language heuristic
# ---------------------------------------------------------------------------

_STOP_SQL = "('the','a','an','and','or','of','to','in','is','it')"
_TOKS = r"regexp_split_to_array(text, '\s+')"
_BPE_PAT = r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"

_DOCSTATS_ORACLE = f"""WITH t AS (
    SELECT doc_id, lang, text,
        CAST(LEN({_TOKS}) AS INT) AS n_tok,
        CAST(LEN(list_distinct({_TOKS})) AS INT) AS n_dist,
        CAST(LEN(list_filter({_TOKS}, w -> w IN {_STOP_SQL})) AS DOUBLE)
            / LEN({_TOKS}) AS stop_ratio,
        CAST(LENGTH(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
            / LEN({_TOKS}) AS awl,
        CAST(LEN(regexp_extract_all(text, '{_BPE_PAT}', 1)) AS INT) AS n_bpe
    FROM documents
),
q AS (
    SELECT *,
        CAST(n_dist AS DOUBLE) / n_tok AS ttr,
        0.25 * LEAST(n_tok / 50.0, 1.0)
        + 0.25 * (CAST(n_dist AS DOUBLE) / n_tok)
        + 0.25 * (1.0 - LEAST(ABS(stop_ratio - 0.4) / 0.4, 1.0))
        + 0.25 * LEAST(awl / 8.0, 1.0) AS quality
    FROM t
)
SELECT doc_id, lang, n_tok, n_dist, n_bpe,
    ROUND(ttr, 6) AS ttr,
    ROUND(stop_ratio, 6) AS stop_ratio,
    ROUND(awl, 6) AS avg_word_len,
    ROUND(quality, 6) AS quality,
    CASE WHEN stop_ratio >= 0.08 THEN 'en' ELSE 'unknown' END AS lang_guess
FROM q"""


@register("doc_textstats", _DOCSTATS_ORACLE)
def q_docstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish regex), type/token ratio,
    stopword/word-length stats, composite quality score, stopword-based
    language heuristic — all JVM Column expressions."""
    from sparkfeat import text as X

    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        "lang",
        X.token_count("text").alias("n_tok"),
        X.distinct_token_count("text").alias("n_dist"),
        X.bpe_ish_token_count("text").alias("n_bpe"),
        _r(X.type_token_ratio("text")).alias("ttr"),
        _r(X.stopword_ratio("text")).alias("stop_ratio"),
        _r(X.avg_word_len("text")).alias("avg_word_len"),
        _r(X.quality_score("text")).alias("quality"),
        X.lang_guess("text").alias("lang_guess"),
    )


def _lang_ngram_oracle() -> str:
    """Replay the Cavnar–Trenkle trigram language ID in SQL: same
    trigram extraction, same (count desc, trigram asc) top-k via struct
    sort, same profile intersections and (score, lang) struct max."""
    from sparkfeat.text import LANG_PROFILES

    def lit_list(items):
        return "[" + ",".join("'" + t.replace("'", "''") + "'" for t in items) + "]"

    scored = ",".join(
        "{score: len(list_intersect(doc_top, " + lit_list(prof) + ")), "
        f"lang: '{lang}'}}"
        for lang, prof in LANG_PROFILES.items()
    )
    return f"""WITH t AS (
    SELECT doc_id, lower(text) AS lc FROM documents
),
tri AS (
    SELECT doc_id,
        CASE WHEN LENGTH(lc) >= 3
             THEN list_transform(generate_series(1, LENGTH(lc) - 2),
                                 i -> substr(lc, i, 3))
             ELSE CAST([] AS VARCHAR[]) END AS tris
    FROM t
),
cnt AS (
    SELECT doc_id, tris,
        list_transform(list_distinct(tris), g ->
            {{neg: -len(list_filter(tris, x -> x = g)), tri: g}}) AS counted
    FROM tri
),
topk AS (
    SELECT doc_id,
        list_transform(list_sort(counted)[1:40], s -> s.tri) AS doc_top
    FROM cnt
),
sc AS (
    SELECT doc_id, list_max([{scored}]) AS best FROM topk
)
SELECT doc_id,
    CASE WHEN best.score >= 3 THEN best.lang ELSE 'unknown' END AS lang_ngram
FROM sc"""


@register("doc_lang_ngram", _lang_ngram_oracle())
def q_lang_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram language ID (Cavnar–Trenkle profile match over
    embedded en/de/fr/es seed profiles) via the Arrow batch kernel —
    the production path (~4x the interpreted HOF expression algebra,
    measured at sf0.1). The oracle replays the SEMANTICS in SQL; the
    expr-path twin stays oracle-checked as ☆doc_lang_ngram_expr."""
    from sparkfeat import text as X

    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id", X.lang_ngram_guess_arrow("text").alias("lang_ngram")
    )


@register("doc_lang_ngram_expr", _lang_ngram_oracle(), driver=False)
def q_lang_ngram_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Catalyst list-algebra twin of doc_lang_ngram (zero UDFs,
    replayable anywhere Column HOFs run) — kept oracle-checked; the
    Arrow kernel is the at-scale recommendation since HOF lambdas are
    not codegen-able and run interpreted."""
    from sparkfeat import text as X

    docs = _docs(spark, sf_dir)
    return docs.select("doc_id", X.lang_ngram_guess("text").alias("lang_ngram"))


_QRULES_ORACLE = r"""WITH t AS (
    SELECT doc_id, text,
        regexp_split_to_array(lower(text), '\s+') AS ws,
        regexp_split_to_array(text, '\s+') AS rws,
        str_split(text, chr(10)) AS lines
    FROM documents
),
b AS (
    SELECT doc_id, text, ws, rws, lines,
        CASE WHEN len(ws) >= 2
             THEN list_transform(generate_series(1, len(ws) - 1),
                                 i -> ws[i] || ' ' || ws[i + 1])
        END AS bg
    FROM t
),
m AS (
    SELECT doc_id, text, rws, lines,
        CAST(len(rws) AS INT) AS n_tok,
        CASE WHEN len(rws) >= 2 THEN
            CAST(list_max(list_transform(list_distinct(bg),
                 x -> len(list_filter(bg, y -> y = x)))) * 2 AS DOUBLE) / len(rws)
        ELSE 0.0 END AS top_bigram,
        1.0 - CAST(len(list_distinct(lines)) AS DOUBLE) / len(lines) AS dup_lines,
        CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[#…]|\.\.\.', '', 'g'))
             AS DOUBLE) / len(rws) AS sym_ratio,
        CAST(LENGTH(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) / len(rws) AS awl,
        len(list_intersect(list_distinct(regexp_split_to_array(lower(text), '\s+')),
            ['the','a','an','and','or','of','to','in','is','it'])) AS n_stops
    FROM b
)
SELECT doc_id, n_tok,
    ROUND(top_bigram, 6) AS top_bigram_frac,
    ROUND(dup_lines, 6) AS dup_line_frac,
    ROUND(sym_ratio, 6) AS symbol_ratio,
    (n_tok >= 5 AND n_tok <= 100000 AND awl >= 2.0 AND awl <= 12.0
     AND sym_ratio <= 0.1 AND top_bigram <= 0.5 AND n_stops >= 1) AS quality_pass
FROM m"""


@register("doc_quality_rules", _QRULES_ORACLE)
def q_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-family document quality gate: word-count bounds, mean word
    length band, symbol-to-word ceiling, top-bigram repetition ceiling,
    duplicate-line fraction, stopword presence — all whole-stage-codegen
    Column expressions (the shape of a trillion-token pretraining filter
    pass), fully replayed in SQL."""
    from sparkfeat import text as X

    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        X.token_count("text").alias("n_tok"),
        _r(X.top_bigram_fraction("text")).alias("top_bigram_frac"),
        _r(X.duplicate_line_fraction("text")).alias("dup_line_frac"),
        _r(X.symbol_word_ratio("text")).alias("symbol_ratio"),
        X.gopher_quality_pass("text").alias("quality_pass"),
    )


_FP_NORM = "regexp_replace(lower(text), '\\s+', ' ', 'g')"
_FINGERPRINT_ORACLE = f"""WITH n AS (
    SELECT doc_id,
        md5({_FP_NORM}) AS content_fp,
        md5_number_lower({_FP_NORM}) AS u,
        md5(array_to_string(list_sort(list_distinct(
            regexp_split_to_array(lower(text), '\\s+'))), ' ')) AS bag_fp
    FROM documents
),
g AS (
    SELECT doc_id, content_fp, u,
        COUNT(*) OVER (PARTITION BY content_fp) AS cg,
        COUNT(*) OVER (PARTITION BY bag_fp) AS bg
    FROM n
)
SELECT doc_id, content_fp,
    CAST(CAST(u AS HUGEINT)
         - 18446744073709551616 * CAST(u >> 63 AS HUGEINT) AS BIGINT) AS fp64,
    CAST(cg AS BIGINT) AS content_group,
    bg > cg AS reorder_only_dup
FROM g"""


@register("doc_fingerprint", _FINGERPRINT_ORACLE)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: canonical content md5 (case/whitespace
    jitter collapsed), the compact signed-64 key (`content_fp64`), the
    duplicate-group size under the content key, and a flag for docs that
    are duplicates only under the word-order-insensitive bag key (i.e.
    shuffled/templated copies the content hash misses)."""
    from sparkfeat.text import fingerprint_summary

    docs = _docs(spark, sf_dir)
    return fingerprint_summary(docs)


# ---------------------------------------------------------------------------
# Dedup: exact bag-fingerprint groups
# ---------------------------------------------------------------------------

_EXACT_DEDUP_ORACLE = f"""WITH fp AS (
    SELECT doc_id,
        md5(array_to_string(list_sort(list_distinct(
            regexp_split_to_array(lower(text), '\\s+'))), ' ')) AS fingerprint
    FROM documents
)
SELECT doc_id, fingerprint,
    CAST(COUNT(*) OVER (PARTITION BY fingerprint) AS BIGINT) AS group_size,
    doc_id = MIN(doc_id) OVER (PARTITION BY fingerprint) AS keep
FROM fp"""


@register("dedup_exact", _EXACT_DEDUP_ORACLE)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on the bag-of-words md5 fingerprint: canonical row =
    min doc_id per group; hash-keyed shuffle is skew-free."""
    from sparkfeat.dedup import exact_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return exact_dedup(docs).select("doc_id", "fingerprint", "group_size", "keep")


# ---------------------------------------------------------------------------
# Dedup: n-gram/token-set Jaccard near-dup pairs (banded)
# ---------------------------------------------------------------------------

_JACCARD_ORACLE = f"""WITH t AS (
    SELECT doc_id, lang,
        list_distinct(regexp_split_to_array(lower(text), '\\s+')) AS toks
    FROM documents
),
pairs AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(LEN(list_intersect(a.toks, b.toks)) AS DOUBLE)
            / LEN(list_distinct(a.toks || b.toks)) AS jaccard
    FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, ROUND(jaccard, 6) AS jaccard
FROM pairs WHERE jaccard >= 0.9"""


#: fitted jaccard vocab ranks, keyed by (spark app, sf_dir) — the
#: fit-once-reuse pattern a repeated-dedup pipeline uses (same policy as
#: persisted scaler stats); each entry is a persisted ≤65536-row table.
_JACCARD_RANKS: dict[tuple[str, str], DataFrame] = {}


@register("dedup_jaccard_pairs", _JACCARD_ORACLE)
def q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by token-set Jaccard ≥ 0.9 within a language —
    LOSSLESS prefix-filter blocking (rarest-token prefixes), so the
    oracle is the full brute-force within-lang join: the blocking is an
    optimization, not a recall contract. The rarest-first vocab ranks
    are fitted once per corpus and reused across calls
    (jaccard_vocab_ranks — a fitted artifact, like scaler stats)."""
    from sparkfeat.dedup import jaccard_pairs, jaccard_vocab_ranks

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    key = (spark.sparkContext.applicationId, sf_dir)
    ranks = _JACCARD_RANKS.get(key)
    if ranks is None:
        ranks = jaccard_vocab_ranks(docs).persist()
        _JACCARD_RANKS[key] = ranks
    out = jaccard_pairs(docs, threshold=0.9, vocab_ranks=ranks)
    return out.select("id_a", "id_b", _r(F.col("jaccard")).alias("jaccard"))


def _minhash_sig_ctes(num_perm: int = 64, seed: int = 42) -> str:
    """WITH-body fragment (CTEs ``w``, ``sh``, ``hv``, ``sig``) that
    replays sparkfeat.dedup.minhash_signatures in DuckDB — md5-lower-64
    bigram-shingle hashes folded into the Mersenne-31 field, permuted,
    column-min'd. Shared by the pair oracle and the incremental-dedup
    oracle so both check the SAME integers."""
    from sparkfeat.dedup import _MERSENNE, _perm_params

    a, b = _perm_params(num_perm, seed=seed)
    A = "[" + ",".join(str(int(x)) for x in a) + "]"
    B = "[" + ",".join(str(int(x)) for x in b) + "]"
    M = int(_MERSENNE)
    return f"""w AS (
    SELECT doc_id,
        list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS ws
    FROM documents
),
sh AS (
    SELECT doc_id,
        CASE WHEN len(ws) = 0 THEN CAST([] AS VARCHAR[])
             WHEN len(ws) < 2 THEN [array_to_string(ws, ' ')]
             ELSE list_transform(generate_series(1, len(ws) - 1),
                                 i -> ws[i] || ' ' || ws[i + 1]) END AS sh
    FROM w
),
hv AS (
    SELECT doc_id,
        list_transform(sh, s ->
            CAST((md5_number_lower(s) & 4294967295) % {M} AS BIGINT)) AS hs
    FROM sh
),
sig AS (
    SELECT doc_id,
        CASE WHEN len(hs) = 0
             THEN list_transform(generate_series(1, {num_perm}), j -> CAST({M} AS BIGINT))
             ELSE list_transform(generate_series(1, {num_perm}), j ->
                 list_min(list_transform(hs, h ->
                     ({A}[j] * h + {B}[j]) % {M})))
        END AS sig
    FROM hv
)"""


def _minhash_banded_cte(bands: int = 16, rows: int = 4) -> str:
    """The ``banded`` CTE over ``sig``: one row per (doc, band) with the
    band's signature slice as the bucket key."""
    return f"""banded AS (
    SELECT doc_id, sig, b AS band, sig[b * {rows} + 1 : b * {rows} + {rows}] AS key
    FROM sig, generate_series(0, {bands - 1}) t(b)
)"""


def _minhash_oracle() -> str:
    """Replay the full MinHash+LSH pipeline in DuckDB: md5-lower-64
    shingle hashes → (a·h + b) mod Mersenne-31 permutations → column-min
    signatures → 16 bands of 4 rows → bucket self-join → signature
    agreement. Bit-for-bit the same integers as sparkfeat.dedup."""
    num_perm = 64
    return f"""WITH {_minhash_sig_ctes(num_perm)},
{_minhash_banded_cte()},
cand AS (
    SELECT DISTINCT x.doc_id AS id_a, x.sig AS sa, y.doc_id AS id_b, y.sig AS sb
    FROM banded x JOIN banded y
      ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
),
est AS (
    SELECT id_a, id_b,
        CAST(len(list_filter(generate_series(1, {num_perm}), j -> sa[j] = sb[j]))
             AS DOUBLE) / {num_perm}.0 AS est_jaccard
    FROM cand
)
SELECT id_a, id_b, est_jaccard FROM est WHERE est_jaccard >= 0.5"""


@register("dedup_minhash_lsh", _minhash_oracle())
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64 perms)+LSH(16 bands) candidate pairs with estimated
    Jaccard ≥ 0.5. The oracle replays signatures/banding exactly in SQL
    (md5-based shingle hashes); estimator accuracy and recall are
    additionally pytest-verified against exact Jaccard."""
    from sparkfeat.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return minhash_lsh_pairs(docs, num_perm=64, bands=16, shingle_n=2).filter(
        F.col("est_jaccard") >= 0.5
    )


def _corpus_prep_oracle() -> str:
    """Compose the already-verified stage oracles (quality gate, language
    ID, exact dedup, MinHash+LSH near-dup) as DuckDB subqueries-with-CTEs
    — the oracle of the pipeline is the pipeline of the oracles."""
    return f"""SELECT q.doc_id,
    q.quality_pass,
    l.lang_ok,
    e.exact_keep,
    COALESCE(d.neardup_drop, FALSE) AS neardup_drop,
    (q.quality_pass AND l.lang_ok AND e.exact_keep
     AND NOT COALESCE(d.neardup_drop, FALSE)) AS keep
FROM (SELECT doc_id, quality_pass FROM ({_QRULES_ORACLE}) _q) q
JOIN (
    SELECT g.doc_id, g.lang_ngram = doc.lang AS lang_ok
    FROM ({_lang_ngram_oracle()}) g JOIN documents doc USING (doc_id)
) l USING (doc_id)
JOIN (
    SELECT doc_id, keep AS exact_keep FROM ({_EXACT_DEDUP_ORACLE}) _e
) e USING (doc_id)
LEFT JOIN (
    SELECT DISTINCT id_b AS doc_id, TRUE AS neardup_drop
    FROM ({_minhash_oracle()}) _m
) d USING (doc_id)"""


@register("corpus_prep_pipeline", _corpus_prep_oracle())
def q_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus preparation — the composition a real
    pretraining data pipeline runs as ONE Spark job over the raw corpus:

    1. Gopher-family quality gate (pure Column expressions, codegen);
    2. char-trigram language ID, kept only when it confirms the claimed
       ``lang`` (catches mislabeled/mixed documents);
    3. exact dedup on the canonical bag fingerprint (keep = min doc_id);
    4. MinHash(64)+LSH(16 bands) near-dup drop (est Jaccard ≥ 0.5 —
       drop the higher doc_id of each candidate pair).

    All four verdicts are returned per document plus the final ``keep``,
    so the filter is auditable (why did doc X fall out?) — and the
    DuckDB oracle replays every stage. ONE projection over the corpus
    scan computes the stage-1/2 verdicts AND the stage-3 fingerprint,
    and the boolean flags ride the fingerprint shuffle through the
    exact-dedup window (stage fusion: no flags⋈exact equi-join
    re-shuffling the corpus on the doc id); one signature+band shuffle
    feeds 4; nothing is quadratic in the corpus. The composition lives
    in sparkfeat.corpus (shared with the corpus scaling bench)."""
    from sparkfeat.corpus import corpus_prep_flags

    return corpus_prep_flags(_docs(spark, sf_dir))


def _sample_split_oracle(
    train: float = 0.8, val: float = 0.1, lang_rates: dict[str, float] | None = None
) -> str:
    """Replay hash_bucket in SQL: the same 8 hex digits of
    md5(CAST(doc_id AS VARCHAR)) expanded positionally."""
    lang_rates = lang_rates or {}

    def bucket(start):
        terms = " + ".join(
            f"(strpos('0123456789abcdef', substr(h, {start + j}, 1)) - 1) * {16 ** (7 - j)}"
            for j in range(8)
        )
        return f"({terms}) % 1000"

    # Mirrors sample_split: listed languages are thresholded, everything
    # else (incl. NULL lang) defaults to keep — an incomplete rates map
    # must not drop whole languages.
    keep = (
        "CASE "
        + " ".join(
            f"WHEN lang = '{lang}' THEN kb < {int(rate * 1000)}"
            for lang, rate in sorted(lang_rates.items())
        )
        + " ELSE TRUE END"
        if lang_rates
        else "TRUE"
    )
    return f"""WITH h AS (
    SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents
),
b AS (
    SELECT doc_id, lang,
        {bucket(25)} AS sb,
        {bucket(17)} AS kb
    FROM h
)
SELECT doc_id, lang,
    CAST(sb AS INT) AS split_bucket,
    CASE WHEN sb < {int(train * 1000)} THEN 'train'
         WHEN sb < {int((train + val) * 1000)} THEN 'val'
         ELSE 'test' END AS split,
    CAST(kb AS INT) AS keep_bucket,
    {keep} AS strat_keep
FROM b"""


# n_tok mirrors text.token_count (size(split(text, '\s+')) — unfiltered,
# the repo-wide _TOKS convention); the CASTs keep DuckDB's HUGEINT window
# sum from surfacing as float64 in the driver's value hash.
_PACK_CUMSUM_CTE = r"""t AS (
    SELECT doc_id,
        CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tok
    FROM documents
),
c AS (
    SELECT doc_id, n_tok,
        CAST(SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) - n_tok AS BIGINT) AS tok_start
    FROM t
)"""

_PACK_ORACLE = f"""WITH {_PACK_CUMSUM_CTE}
SELECT doc_id, n_tok, tok_start,
    CAST(tok_start // 512 AS BIGINT) AS seq_id,
    CAST(tok_start % 512 AS BIGINT) AS seq_offset
FROM c"""


@register("corpus_pack_sequences", _PACK_ORACLE)
def q_corpus_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing (budget 512): each doc's
    global token-axis start, the training sequence it starts in, and
    its offset inside it — computed with a two-level distributed prefix
    sum (block sums to the driver, per-block windows in parallel; no
    single-task global window). The oracle is the plain global cumsum
    the distributed plan must equal."""
    from sparkfeat.corpus import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return pack_sequences(docs, budget=512)


_SPANS_ORACLE = f"""WITH {_PACK_CUMSUM_CTE},
x AS (
    SELECT doc_id, n_tok, tok_start,
        unnest(generate_series(tok_start // 512,
                               (tok_start + n_tok - 1) // 512)) AS sq
    FROM c WHERE n_tok > 0
)
SELECT doc_id, n_tok, tok_start,
    CAST(sq AS BIGINT) AS seq_id,
    CAST(GREATEST(sq * 512 - tok_start, 0) AS BIGINT) AS tok_from,
    CAST(LEAST(sq * 512 + 512 - tok_start, n_tok) AS BIGINT) AS tok_to,
    CAST(GREATEST(tok_start - sq * 512, 0) AS BIGINT) AS seq_offset
FROM x"""


@register("corpus_span_manifest", _SPANS_ORACLE)
def q_corpus_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full packing manifest a sample-writer consumes: one row per
    (doc, sequence) the doc TOUCHES — a doc longer than its first
    sequence's remaining budget spans several, and each span row carries
    the in-doc token slice [tok_from, tok_to) plus where it lands
    (seq_offset). sequence()+explode over the doc's covered seq range on
    top of the distributed prefix sum; the oracle replays it with a
    per-row generate_series."""
    from sparkfeat.corpus import pack_spans

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return pack_spans(docs, budget=512)


_SAMPLE_RATES = {"en": 1.0, "de": 0.5, "fr": 0.5, "es": 0.5, "zh": 0.25}


@register("corpus_sample_split", _sample_split_oracle(lang_rates=_SAMPLE_RATES), driver=False)
def q_corpus_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split + stratified per-language
    downsampling via independent md5 hash buckets — membership is a
    property of the doc id, not an RNG state, so every engine, rerun,
    and incremental corpus refresh agrees on the subset (the
    leakage-safety property random sampling loses when the corpus
    grows). Pure JVM expressions; the oracle replays the hex-digit
    bucket math positionally."""
    from sparkfeat.corpus import sample_split

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return sample_split(docs, train=0.8, val=0.1, lang_rates=_SAMPLE_RATES)


def _training_manifest_oracle() -> str:
    """The capstone composition: corpus filter → hash split/stratify →
    pack the surviving train docs — each stage's oracle is already
    verified standalone; this nests them as subqueries, with the packing
    cumsum running over exactly the filtered+sampled train subset."""
    return f"""WITH kept AS (
    SELECT p.doc_id
    FROM ({_corpus_prep_oracle()}) p
    JOIN ({_sample_split_oracle(lang_rates=_SAMPLE_RATES)}) s USING (doc_id)
    WHERE p.keep AND s.strat_keep AND s.split = 'train'
),
t AS (
    SELECT doc_id,
        CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_tok
    FROM documents WHERE doc_id IN (SELECT doc_id FROM kept)
),
c AS (
    SELECT doc_id, n_tok,
        CAST(SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) - n_tok AS BIGINT) AS tok_start
    FROM t
)
SELECT doc_id, n_tok, tok_start,
    CAST(tok_start // 512 AS BIGINT) AS seq_id,
    CAST(tok_start % 512 AS BIGINT) AS seq_offset
FROM c"""


@register("training_dataset_manifest", _training_manifest_oracle())
def q_training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole journey as ONE job — what 'turn this crawl into
    training data' actually runs: the 4-stage corpus filter picks
    survivors, the deterministic hash split + stratified language
    downsampling picks the train subset, and sequence packing lays the
    result into fixed 512-token training sequences. Emits the packing
    manifest (doc → sequence/offset) a sample-writer would consume.
    Every stage is the already-oracle-verified library op; the oracle
    composes their SQL replays."""
    from sparkfeat.corpus import corpus_prep_flags, pack_sequences, sample_split

    docs = _docs(spark, sf_dir)
    flags = corpus_prep_flags(docs).filter(F.col("keep")).select("doc_id")
    split = (
        sample_split(docs, train=0.8, val=0.1, lang_rates=_SAMPLE_RATES)
        .filter(F.col("strat_keep") & (F.col("split") == "train"))
        .select("doc_id")
    )
    kept = docs.join(flags, "doc_id").join(split, "doc_id")
    return pack_sequences(kept, budget=512)


_SIMHASH_ORACLE = r"""WITH w AS (
    SELECT doc_id,
        list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS ws
    FROM documents
),
hv AS (
    SELECT doc_id, list_transform(ws, s -> md5_number_lower(s)) AS hs FROM w
),
bits AS (
    -- Charikar sign vector replayed as a 64-entry 0/1 list (packing into
    -- a BIGINT would overflow DuckDB's checked 1<<63)
    SELECT doc_id,
        list_transform(generate_series(0, 63), k ->
            CASE WHEN len(hs) = 0 THEN 0
                 WHEN list_sum(list_transform(hs, h ->
                     CASE WHEN (h >> k) & 1 = 1 THEN 1 ELSE -1 END)) > 0 THEN 1
                 ELSE 0 END) AS bits
    FROM hv
),
blocks AS (
    SELECT doc_id, bits, b AS blk,
        list_sum(list_transform(generate_series(0, 15),
                                k -> bits[b * 16 + k + 1] * (1 << k))) AS val
    FROM bits, generate_series(0, 3) t(b)
),
cand AS (
    SELECT DISTINCT x.doc_id AS id_a, x.bits AS ba, y.doc_id AS id_b, y.bits AS bb
    FROM blocks x JOIN blocks y
      ON x.blk = y.blk AND x.val = y.val AND x.doc_id < y.doc_id
),
ham AS (
    SELECT id_a, id_b,
        CAST(len(list_filter(generate_series(1, 64), k -> ba[k] <> bb[k])) AS INT)
            AS hamming
    FROM cand
)
SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 3"""


@register("dedup_simhash", _SIMHASH_ORACLE)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming ≤ 3) via 16-bit pigeonhole
    blocking + exact bit_count verify; the oracle rebuilds the md5-based
    sign vectors bit-for-bit in SQL."""
    from sparkfeat.dedup import simhash_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simhash_pairs(docs, max_hamming=3)


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------

_ANN_ORACLE = """WITH c AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
n AS (
    -- mirror the engine's normalize-then-dot scoring (identical fold order)
    SELECT vec_id, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS u
    FROM c
),
p AS (SELECT vec_id AS probe_id, u AS pu FROM n WHERE vec_id < 10),
scored AS (
    SELECT p.probe_id, n.vec_id, list_dot_product(p.pu, n.u) AS cosine
    FROM n, p WHERE n.vec_id <> p.probe_id
),
r AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS rk
    FROM scored
)
SELECT probe_id, vec_id, ROUND(cosine, 6) AS cosine, CAST(rk AS INT) AS rk
FROM r WHERE rk <= 5"""


@register("ann_cosine_topk", _ANN_ORACLE)
def q_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for 10 probe vectors: float32 widened to
    double, JVM zip_with/aggregate dot products, broadcast probes,
    window rank with deterministic tie-break."""
    from sparkfeat.similarity import cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    out = cosine_topk(emb, probes, k=5)
    return out.select("probe_id", "vec_id", _r(F.col("cosine")).alias("cosine"), "rk")


_COS = (
    "list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
    " * sqrt(list_dot_product({b}, {b})))"
)

_IVF_ORACLE = f"""WITH c AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
cents AS (
    SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cent_id, v AS cv
    FROM (SELECT * FROM c ORDER BY vec_id LIMIT 16)
),
assigned AS (
    SELECT vec_id, v, cent_id FROM (
        SELECT c.vec_id, c.v, cents.cent_id,
            ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
                {_COS.format(a='c.v', b='cents.cv')} DESC, cents.cent_id) AS r
        FROM c, cents) WHERE r = 1
),
p AS (SELECT vec_id AS probe_id, v AS pv FROM c WHERE vec_id < 10),
pc AS (
    SELECT probe_id, pv, cent_id FROM (
        SELECT p.probe_id, p.pv, cents.cent_id,
            ROW_NUMBER() OVER (PARTITION BY p.probe_id ORDER BY
                {_COS.format(a='p.pv', b='cents.cv')} DESC, cents.cent_id) AS r
        FROM p, cents) WHERE r <= 4
),
an AS (
    SELECT vec_id, cent_id,
        list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS u
    FROM assigned
),
pn AS (
    SELECT probe_id, cent_id,
        list_transform(pv, x -> x / sqrt(list_dot_product(pv, pv))) AS pu
    FROM pc
),
scored AS (
    SELECT pn.probe_id, an.vec_id, list_dot_product(pn.pu, an.u) AS cosine
    FROM an JOIN pn ON an.cent_id = pn.cent_id
    WHERE an.vec_id <> pn.probe_id
),
r AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id)
        AS rk
    FROM scored
)
SELECT probe_id, vec_id, ROUND(cosine, 6) AS cosine, CAST(rk AS INT) AS rk
FROM r WHERE rk <= 5"""


@register("ann_ivf_topk", _IVF_ORACLE, driver=False)
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN (16 deterministic centroids, nprobe=4): the
    scale path — each probe scans ~nprobe/16 of the corpus. The oracle
    replays centroid selection, nearest-centroid assignment, probe
    fan-out, and the in-bucket top-k rank in SQL (both engines fold dot
    products left-to-right, so ranks agree bit-for-bit); recall vs brute
    force is additionally pytest-gated."""
    from sparkfeat.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    out = ivf_topk(emb, probes, k=5, n_centroids=16, nprobe=4)
    return out.select("probe_id", "vec_id", _r(F.col("cosine")).alias("cosine"), "rk")


@register("ann_ivf_served", _IVF_ORACLE)
def q_ann_ivf_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The build/serve split a production ANN deployment runs: fit the
    IVF index ONCE (centroids + pre-normalized assignments persisted
    ``partitionBy('cent_id')``), then answer probes from the persisted
    index with no corpus pass — the bucket join broadcast-prunes to the
    probed cent_id partitions, so a search reads nprobe/C of the FILES.
    Same centroids/params as ``ann_ivf_topk``, so the oracle is the
    identical in-plan IVF replay — a green row here proves the
    persisted-index path, not just the in-plan path."""
    import tempfile

    from sparkfeat.similarity import build_ivf_index, ivf_topk_index

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    path = tempfile.mkdtemp(prefix="sparkfeat_ivf_")
    build_ivf_index(emb, path, n_centroids=16)
    out = ivf_topk_index(spark, path, probes, k=5, nprobe=4)
    return out.select("probe_id", "vec_id", _r(F.col("cosine")).alias("cosine"), "rk")


def _lloyd_round(prev: str, nxt: str) -> str:
    """One Lloyd iteration as SQL CTEs: nearest-centroid assignment
    (cosine, ties → lower cent_id) → element-wise mean per cluster →
    empty clusters keep the previous centroid. Mirrors
    ``similarity.kmeans_centroids`` (posexplode + groupBy avg)."""
    return f"""a_{nxt} AS (
    SELECT vec_id, v, cent_id FROM (
        SELECT c.vec_id, c.v, {prev}.cent_id,
            ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
                {_COS.format(a='c.v', b=f'{prev}.cv')} DESC, {prev}.cent_id) AS r
        FROM c, {prev}) WHERE r = 1
),
m_{nxt} AS (
    SELECT cent_id, i, AVG(v[i]) AS m
    FROM a_{nxt}, UNNEST(generate_series(1, len(v))) AS t(i)
    GROUP BY cent_id, i
),
g_{nxt} AS (SELECT cent_id, list(m ORDER BY i) AS cv FROM m_{nxt} GROUP BY cent_id),
{nxt} AS (
    SELECT {prev}.cent_id, COALESCE(g_{nxt}.cv, {prev}.cv) AS cv
    FROM {prev} LEFT JOIN g_{nxt} USING (cent_id)
)"""


_IVF_KMEANS_ORACLE = f"""WITH c AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
cents0 AS (
    SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cent_id, v AS cv
    FROM (SELECT * FROM c ORDER BY vec_id LIMIT 16)
),
{_lloyd_round('cents0', 'cents1')},
{_lloyd_round('cents1', 'cents2')},
assigned AS (
    SELECT vec_id, v, cent_id FROM (
        SELECT c.vec_id, c.v, cents2.cent_id,
            ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
                {_COS.format(a='c.v', b='cents2.cv')} DESC, cents2.cent_id) AS r
        FROM c, cents2) WHERE r = 1
),
p AS (SELECT vec_id AS probe_id, v AS pv FROM c WHERE vec_id < 10),
pc AS (
    SELECT probe_id, pv, cent_id FROM (
        SELECT p.probe_id, p.pv, cents2.cent_id,
            ROW_NUMBER() OVER (PARTITION BY p.probe_id ORDER BY
                {_COS.format(a='p.pv', b='cents2.cv')} DESC, cents2.cent_id) AS r
        FROM p, cents2) WHERE r <= 4
),
an AS (
    SELECT vec_id, cent_id,
        list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS u
    FROM assigned
),
pn AS (
    SELECT probe_id, cent_id,
        list_transform(pv, x -> x / sqrt(list_dot_product(pv, pv))) AS pu
    FROM pc
),
scored AS (
    SELECT pn.probe_id, an.vec_id, list_dot_product(pn.pu, an.u) AS cosine
    FROM an JOIN pn ON an.cent_id = pn.cent_id
    WHERE an.vec_id <> pn.probe_id
),
r AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id)
        AS rk
    FROM scored
)
SELECT probe_id, vec_id, ROUND(cosine, 6) AS cosine, CAST(rk AS INT) AS rk
FROM r WHERE rk <= 5"""


#: fitted k-means centroids, keyed by (spark app, sf_dir) — the fitted
#: IVF index artifact, cached like _JACCARD_RANKS (each entry is a
#: persisted 16-row table).
_KMEANS_CENTROIDS: dict[tuple[str, str], DataFrame] = {}


@register("ann_ivf_kmeans", _IVF_KMEANS_ORACLE)
def q_ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with k-means-refined centroids (2 distributed Lloyd
    rounds over the first-16-by-id seed, then nprobe=4 bucket search).
    The oracle replays both Lloyd rounds in SQL CTEs — assignment rank,
    element-wise cluster means, empty-cluster carry — then the same
    bucketed top-k. Lloyd is deterministic given the seed, so the two
    engines walk identical centroid trajectories (means differ only in
    summation order, ~1e-15, far inside round-6 and assignment
    margins).

    The centroid fit is cached per (app, corpus) like the Jaccard vocab
    ranks — a fitted index artifact: repeated searches against the same
    corpus pay the Lloyd rounds once and only the bucket probe per
    query, which is exactly how an IVF index amortizes at serving
    time."""
    from sparkfeat.similarity import ivf_topk, kmeans_centroids

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    key = (spark.sparkContext.applicationId, sf_dir)
    cents = _KMEANS_CENTROIDS.get(key)
    if cents is None:
        cents = kmeans_centroids(emb, n_centroids=16, n_iter=2).persist()
        _KMEANS_CENTROIDS[key] = cents
    out = ivf_topk(emb, probes, k=5, n_centroids=16, nprobe=4, centroids=cents)
    return out.select("probe_id", "vec_id", _r(F.col("cosine")).alias("cosine"), "rk")


def _lsh_oracle(n_planes: int = 48, n_bands: int = 8, dim: int = 64) -> str:
    """Replay the random-hyperplane multi-probe LSH in SQL: the
    md5-derived planes are inlined as double literals (bit-identical —
    repr round-trips), the sign bits use the same left-to-right
    list_dot_product fold as Spark's aggregate, band packing is the same
    little-endian slice, and the Hamming-1 probe expansion is the same
    XOR-mask unnest."""
    from sparkfeat.similarity import lsh_planes

    planes = lsh_planes(dim, n_planes)
    rb = n_planes // n_bands
    masks = "[" + ",".join(str(m) for m in [0] + [1 << j for j in range(rb)]) + "]"

    def arr(p):
        return "[" + ",".join(repr(float(x)) for x in p) + "]"

    bits = ",\n        ".join(
        f"CASE WHEN list_dot_product(v, {arr(p)}) >= 0 THEN 1 ELSE 0 END"
        for p in planes
    )
    key = " + ".join(f"bits[{rb}*band_idx + {j + 1}] * {1 << j}" for j in range(rb))
    return f"""WITH c AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
s AS (
    SELECT vec_id, [{bits}] AS bits FROM c
),
cb AS (
    SELECT vec_id, band_idx, {key} AS band_key
    FROM s, (SELECT unnest(generate_series(0, {n_bands - 1})) AS band_idx)
),
pb AS (
    SELECT vec_id AS probe_id, band_idx, xor(band_key, m) AS band_key
    FROM cb, (SELECT unnest({masks}) AS m)
    WHERE vec_id < 10
),
cand AS (
    SELECT DISTINCT pb.probe_id, cb.vec_id
    FROM cb JOIN pb USING (band_idx, band_key)
    WHERE cb.vec_id <> pb.probe_id
),
un AS (
    SELECT vec_id, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS u
    FROM c
),
scored AS (
    SELECT cand.probe_id, cand.vec_id, list_dot_product(pu.u, cu.u) AS cosine
    FROM cand
    JOIN un cu ON cand.vec_id = cu.vec_id
    JOIN un pu ON cand.probe_id = pu.vec_id
),
r AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id)
        AS rk
    FROM scored
)
SELECT probe_id, vec_id, ROUND(cosine, 6) AS cosine, CAST(rk AS INT) AS rk
FROM r WHERE rk <= 5"""


@register("ann_lsh_topk", _lsh_oracle(), driver=False)
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane multi-probe LSH ANN (48 md5-derived planes, 8
    bands of 6 sign bits, Hamming-1 probe expansion): the
    data-independent scale path — no fit pass, planes are constants,
    candidates come from an equi-join on band keys. Complements IVF
    (ann_ivf_topk) the way SimHash complements MinHash on the text
    side; recall vs brute force is pytest-gated."""
    from sparkfeat.similarity import lsh_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    out = lsh_topk(emb, probes, k=5, n_planes=48, n_bands=8, dim=64)
    return out.select("probe_id", "vec_id", _r(F.col("cosine")).alias("cosine"), "rk")


@register("ann_lsh_arrow", _lsh_oracle())
def q_ann_lsh_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same multi-probe LSH ANN with ``sign_impl='arrow'``: band keys
    from one BLAS matmul per Arrow batch instead of 48 interpreted JVM
    folds per row — the throughput path for hashing a 10^8-row corpus.
    Shares ann_lsh_topk's oracle: the band keys are pytest-asserted
    identical to the expression path (a sign can differ only when
    |v·p| < ~1e-13, absent in any non-adversarial corpus)."""
    from sparkfeat.similarity import lsh_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    out = lsh_topk(
        emb, probes, k=5, n_planes=48, n_bands=8, dim=64, sign_impl="arrow"
    )
    return out.select("probe_id", "vec_id", _r(F.col("cosine")).alias("cosine"), "rk")


_MM_REAL_ORACLE = """WITH d AS (
    SELECT doc_id,
        list_transform(generate_series(0, 15), j ->
            CAST((strpos('0123456789abcdef', substr(md5(text), j*2+1, 1)) - 1) * 16
               + (strpos('0123456789abcdef', substr(md5(text), j*2+2, 1)) - 1)
               AS DOUBLE)) AS db
    FROM documents
)
SELECT doc_id AS media_id,
    CAST(doc_id % 2 AS INT) AS mime,
    CAST(CASE WHEN doc_id % 2 = 0 THEN 246 ELSE 1644 END AS BIGINT) AS n_bytes,
    ROUND(CASE WHEN doc_id % 2 = 0 THEN
        list_sum(list_transform(generate_series(0, 63), k -> db[((3*k) % 16) + 1]))
            / 64.0 END, 6) AS img_mean_r,
    ROUND(CASE WHEN doc_id % 2 = 1 THEN
        sqrt(list_sum(list_transform(generate_series(0, 799), k ->
            POWER(TRUNC(sin(2 * pi() * (100.0 + (doc_id % 50) * 10.0) * k / 16000.0)
                        * 12000) / 32768.0, 2))) / 800.0) END, 6) AS audio_rms
FROM d"""


@register("multimodal_real_decode", _MM_REAL_ORACLE)
def q_multimodal_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL multimodal decode: deterministic BMP/WAV payloads are
    encoded per doc (md5-pixel image / id-derived sine), then decoded by
    the struct-level codecs; the oracle recomputes the decoded features
    (red-channel mean from md5 bytes; RMS of the truncated sine) from
    first principles in SQL — an encode→decode mathematical round trip."""
    from sparkfeat.multimodal import attach_real_payloads, decode_features

    docs = _docs(spark, sf_dir)
    media = attach_real_payloads(docs)
    out = decode_features(media, mode="real")
    return out.select(
        "media_id",
        "mime",
        "n_bytes",
        _r(F.when(F.col("mime") == 0, F.element_at("features", 3))).alias(
            "img_mean_r"
        ),
        _r(F.when(F.col("mime") == 1, F.element_at("features", 4))).alias(
            "audio_rms"
        ),
    )


def _resize_px(dy: int, dx: int) -> str:
    """Source byte for resized pixel k (k = Y*12 + X*3 + c, 4×4×3
    row-major) offset by (dy, dx) inside its 2×2 source block: source
    pixel (2Y+dy, 2X+dx, c) lives at digest byte (y*24 + x*3 + c) mod 16
    (the md5 digest is tiled across the 8×8 image row-major)."""
    return (
        f"db[(((k // 12) * 2 + {dy}) * 24"
        f" + (((k % 12) // 3) * 2 + {dx}) * 3 + (k % 3)) % 16 + 1]"
    )


_MM_RESIZE_ORACLE = f"""WITH d AS (
    SELECT doc_id,
        list_transform(generate_series(0, 15), j ->
            CAST((strpos('0123456789abcdef', substr(md5(text), j*2+1, 1)) - 1) * 16
               + (strpos('0123456789abcdef', substr(md5(text), j*2+2, 1)) - 1)
               AS DOUBLE)) AS db
    FROM documents WHERE doc_id % 2 = 0
),
r AS (
    SELECT doc_id,
        list_transform(generate_series(0, 47), k ->
            CAST({_resize_px(0, 0)} + {_resize_px(0, 1)}
               + {_resize_px(1, 0)} + {_resize_px(1, 1)} AS BIGINT) // 4) AS rz
    FROM d
)
SELECT doc_id AS media_id,
    CAST(4 AS INT) AS out_w, CAST(4 AS INT) AS out_h,
    CAST(102 AS BIGINT) AS n_bytes,
    ROUND(list_sum(list_transform(generate_series(0, 15), q -> rz[q*3 + 1]))
        / 16.0, 6) AS r_mean,
    ROUND(list_sum(list_transform(generate_series(0, 15), q -> rz[q*3 + 2]))
        / 16.0, 6) AS g_mean,
    ROUND(list_sum(list_transform(generate_series(0, 15), q -> rz[q*3 + 3]))
        / 16.0, 6) AS b_mean
FROM r"""


@register("multimodal_resize", _MM_RESIZE_ORACLE)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize stage: the real 8×8 BMP payloads are decoded,
    box-averaged to 4×4 with exact integer arithmetic (floor of block
    mean — no float rounding mode to disagree about), re-encoded, and
    summarized per channel. The oracle replays the whole
    encode→decode→resize chain from the md5 digest bytes in SQL."""
    from sparkfeat.multimodal import attach_real_payloads, resize_images

    docs = _docs(spark, sf_dir)
    media = attach_real_payloads(docs).filter(F.col("mime") == 0)
    out = resize_images(media, out_h=4, out_w=4)
    return out.select(
        "media_id",
        "out_w",
        "out_h",
        "n_bytes",
        _r(F.col("r_mean")).alias("r_mean"),
        _r(F.col("g_mean")).alias("g_mean"),
        _r(F.col("b_mean")).alias("b_mean"),
    )


def _video_frames_oracle(n_frames: int = 6, h: int = 4, w: int = 4, k: int = 3) -> str:
    """Replay the RVID frame sampling from the md5 digest bytes: frame
    f's pixel byte j = digest[(7f + j) mod 16]; sampled frame indices
    are floor(j·(n−1)/(k−1)) — inlined as literals."""
    picks = [int(j * (n_frames - 1) / (k - 1)) for j in range(k)] if k > 1 else [0]
    npx = h * w

    def mean(f, c):
        terms = " + ".join(f"db[(({7 * f} + {q * 3 + c}) % 16) + 1]" for q in range(npx))
        return f"ROUND(({terms}) / {npx}.0, 6)"

    rows = ",\n    ".join(
        f"({f}, {mean(f, 0)}, {mean(f, 1)}, {mean(f, 2)})" for f in picks
    )
    return f"""WITH d AS (
    SELECT doc_id,
        list_transform(generate_series(0, 15), j ->
            CAST((strpos('0123456789abcdef', substr(md5(text), j*2+1, 1)) - 1) * 16
               + (strpos('0123456789abcdef', substr(md5(text), j*2+2, 1)) - 1)
               AS DOUBLE)) AS db
    FROM documents
)
SELECT doc_id AS media_id, CAST(f.frame_idx AS INT) AS frame_idx,
    f.r_mean, f.g_mean, f.b_mean
FROM d, LATERAL (VALUES
    {rows}
) f(frame_idx, r_mean, g_mean, b_mean)"""


@register("multimodal_video_frames", _video_frames_oracle())
def q_multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL raw-video frame sampling: every doc gets an uncompressed
    RVID container (6 frames of 4×4 RGB derived from the text's md5),
    and the sampler reads the 16-byte header, seek-decodes ONLY the 3
    evenly spaced sample frames (offset arithmetic, O(frame) not
    O(video)), and emits per-frame channel means. The oracle replays
    the whole encode→seek→decode chain from the digest bytes. Only
    COMPRESSED video stays behind the ffmpeg seam."""
    from sparkfeat.multimodal import attach_video_payloads, frame_sample_rawvideo

    docs = _docs(spark, sf_dir)
    media = attach_video_payloads(docs)
    out = frame_sample_rawvideo(media, k=3)
    return out.select(
        "media_id",
        "frame_idx",
        _r(F.col("r_mean")).alias("r_mean"),
        _r(F.col("g_mean")).alias("g_mean"),
        _r(F.col("b_mean")).alias("b_mean"),
    )


_MM_FAKE_ORACLE = """WITH c AS (
    SELECT doc_id, LENGTH(text) AS n,
        list_transform(
            list_filter(string_split_regex(text, ''), ch -> ch <> ''),
            ch -> unicode(ch) // 16) AS bins
    FROM documents
)
SELECT doc_id AS media_id,
    CAST(doc_id % 3 AS INT) AS mime,
    CAST(n AS BIGINT) AS n_bytes,
    ROUND(CAST(len(list_filter(bins, b -> b = 2)) AS DOUBLE) / n, 6) AS feat_2,
    ROUND(CAST(len(list_filter(bins, b -> b = 6)) AS DOUBLE) / n, 6) AS feat_6,
    ROUND(CAST(len(list_filter(bins, b -> b = 7)) AS DOUBLE) / n, 6) AS feat_7
FROM c"""


@register("multimodal_decode", _MM_FAKE_ORACLE, driver=False)
def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode plumbing: deterministic binary payloads →
    Arrow mapInPandas feature extraction (byte-histogram stand-in
    kernel). The corpus is pure ASCII, so the oracle recomputes the
    utf-8 byte histogram from codepoints in SQL — full parity for the
    plumbing path too (the REAL codecs are covered by
    multimodal_real_decode)."""
    from sparkfeat.multimodal import attach_fake_payloads, decode_features

    docs = _docs(spark, sf_dir)
    media = attach_fake_payloads(docs)
    out = decode_features(media, mode="fake")
    return out.select(
        "media_id",
        "mime",
        "n_bytes",
        _r(F.element_at("features", 3)).alias("feat_2"),
        _r(F.element_at("features", 7)).alias("feat_6"),
        _r(F.element_at("features", 8)).alias("feat_7"),
    )


# ---------------------------------------------------------------------------
# Entity universe per period + interval membership (A5, P8/J5, §3.3)
# ---------------------------------------------------------------------------

_PERIOD_US = 3 * 24 * 3600 * 1_000_000  # 3-day periods

_UNIVERSE_ORACLE = f"""{_SIG_CTE},
per AS (
    SELECT conv_id, (epoch_us(ts) // {_PERIOD_US}) AS p, token_est
    FROM sig
),
sums AS (SELECT conv_id, p, SUM(token_est) AS v FROM per GROUP BY conv_id, p),
tr AS (
    SELECT *, SUM(v) OVER (PARTITION BY conv_id ORDER BY p
        RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS total
    FROM sums
),
rk AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY p ORDER BY total DESC, conv_id) AS rank
    FROM tr
)
SELECT CAST(p AS BIGINT) AS period,
    make_timestamp(p * {_PERIOD_US}) AS period_start,
    make_timestamp((p + 1) * {_PERIOD_US}) AS period_end,
    conv_id, ROUND(total, 6) AS total, CAST(rank AS INT) AS rank
FROM rk WHERE rank <= 20"""


@register("universe_topn", _UNIVERSE_ORACLE)
def q_universe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/§3.3 universe provider: top-20 conversations per 3-day period
    by trailing-2-period token volume → small interval table."""
    from sparkfeat.universe import active_universe

    sig = with_turn_signals(transcripts_from_events(spark, sf_dir))
    u = active_universe(
        sig, period_seconds=3 * 24 * 3600, top_n=20, value_col="token_est",
        lookback_periods=2,
    )
    return u.select(
        "period", "period_start", "period_end", "conv_id",
        _r(F.col("total")).alias("total"), "rank",
    )


_MEMBERSHIP_ORACLE = f"""{_SIG_CTE},
per AS (
    SELECT conv_id, (epoch_us(ts) // {_PERIOD_US}) AS p, token_est
    FROM sig
),
sums AS (SELECT conv_id, p, SUM(token_est) AS v FROM per GROUP BY conv_id, p),
tr AS (
    SELECT *, SUM(v) OVER (PARTITION BY conv_id ORDER BY p
        RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS total
    FROM sums
),
rk AS (
    SELECT conv_id, p,
        ROW_NUMBER() OVER (PARTITION BY p ORDER BY total DESC, conv_id) AS rank
    FROM tr
),
uni AS (SELECT conv_id, p FROM rk WHERE rank <= 20)
SELECT s.conv_id, CAST(COUNT(*) AS BIGINT) AS n_in_universe
FROM sig s
WHERE EXISTS (
    SELECT 1 FROM uni u
    WHERE u.conv_id = s.conv_id
      AND u.p = (epoch_us(s.ts) // {_PERIOD_US})
)
GROUP BY s.conv_id"""


@register("universe_membership", _MEMBERSHIP_ORACLE)
def q_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8/J5 interval membership: per conversation, how many of its
    turns fall inside its active-universe periods — broadcast range
    semi-join against the tiny interval table."""
    from sparkfeat.universe import active_universe, universe_membership

    sig = with_turn_signals(transcripts_from_events(spark, sf_dir))
    u = active_universe(
        sig, period_seconds=3 * 24 * 3600, top_n=20, value_col="token_est",
        lookback_periods=2,
    )
    kept = universe_membership(sig, u)
    return kept.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_in_universe"))


# ---------------------------------------------------------------------------
# Correlation dedup (A9): pairwise Pearson corr of bucketed series
# ---------------------------------------------------------------------------

_B6H = "epoch_us(ts) - 1 - ((epoch_us(ts) - 1) % 21600000000) + 21600000000"

_CORR_ORACLE = f"""{_SIG_CTE},
b AS (
    SELECT conv_id, {_B6H} AS bus, SUM(text_len) AS v
    FROM sig GROUP BY conv_id, bus
),
pairs AS (
    SELECT a.conv_id AS id_a, c.conv_id AS id_b,
        corr(a.v, c.v) AS corr_v, COUNT(*) AS n_buckets
    FROM b a JOIN b c ON a.bus = c.bus AND a.conv_id < c.conv_id
    GROUP BY a.conv_id, c.conv_id
),
flt AS (
    SELECT id_a, id_b, ROUND(corr_v, 6) AS corr_r, CAST(n_buckets AS BIGINT) AS n_buckets
    FROM pairs WHERE n_buckets >= 20
)
SELECT id_a, id_b, corr_r AS corr, n_buckets,
    CAST(ROW_NUMBER() OVER (ORDER BY corr_r DESC, id_a, id_b) AS INT) AS rk
FROM flt QUALIFY rk <= 20"""


@register("corr_pairs_topk", _CORR_ORACLE, driver=False)
def q_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 correlation dedup: Pearson corr of 6-hour text_len sums across
    co-observed buckets, top-20 pairs (rank on the rounded value so both
    engines rank identically; ≥20 shared buckets)."""
    from pyspark.sql import Window

    from sparkfeat.universe import correlated_pairs

    sig = with_turn_signals(transcripts_from_events(spark, sf_dir))
    pairs = correlated_pairs(
        sig, "text_len", bucket_seconds=21600, threshold=-2.0
    ).filter(F.col("n_buckets") >= 20)
    from sparkfeat.cleaning import TOPK_SHARDS

    rounded = pairs.select(
        "id_a", "id_b", _r(F.col("corr")).alias("corr"), "n_buckets"
    )
    # two-phase shard rank over the (potentially entities²-sized) pair
    # table — exact, no single-task sort (house pattern)
    order = [F.col("corr").desc(), F.col("id_a"), F.col("id_b")]
    local = Window.partitionBy(
        F.pmod(F.hash(F.col("id_a"), F.col("id_b")), F.lit(TOPK_SHARDS))
    ).orderBy(*order)
    pruned = rounded.withColumn("_lr", F.row_number().over(local)).filter(
        F.col("_lr") <= 20
    )
    w = Window.orderBy(*order)  # ≤ shards×20 rows by construction
    return (
        pruned.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 20)
        .drop("_lr")
    )


_CORR_DROPS_ORACLE = f"""{_SIG_CTE},
b AS (
    SELECT conv_id, {_B6H} AS bus, SUM(text_len) AS v
    FROM sig GROUP BY conv_id, bus
),
pairs AS (
    SELECT a.conv_id AS id_a, c.conv_id AS id_b,
        ROUND(corr(a.v, c.v), 6) AS corr_r, COUNT(*) AS n_buckets
    FROM b a JOIN b c ON a.bus = c.bus AND a.conv_id < c.conv_id
    GROUP BY a.conv_id, c.conv_id
    HAVING COUNT(*) >= 20 AND ROUND(corr(a.v, c.v), 6) > 0.5
),
vol AS (
    SELECT conv_id, ROUND(SUM(token_est), 6) AS volume FROM sig GROUP BY conv_id
)
SELECT DISTINCT CASE WHEN vb.volume > va.volume THEN p.id_a ELSE p.id_b END
    AS conv_id
FROM pairs p
JOIN vol va ON va.conv_id = p.id_a
JOIN vol vb ON vb.conv_id = p.id_b"""


@register("corr_dedup_drops", _CORR_DROPS_ORACLE)
def q_corr_drops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 resolution (cleaning.py:473-495): correlated pairs (6-hour
    text_len sums, rounded corr > 0.5, ≥20 shared buckets) resolved by
    total token volume — the lower-volume member of each pair lands in
    the drop set. Rounded corr/volume on BOTH engines so the threshold
    and tie comparisons are engine-stable."""
    from sparkfeat.universe import correlated_pairs, resolve_correlated

    sig = with_turn_signals(transcripts_from_events(spark, sf_dir))
    pairs = (
        correlated_pairs(sig, "text_len", bucket_seconds=21600, threshold=-2.0)
        .filter(F.col("n_buckets") >= 20)
        .select("id_a", "id_b", _r(F.col("corr")).alias("corr_r"))
        .filter(F.col("corr_r") > 0.5)
    )
    volumes = sig.groupBy("conv_id").agg(_r(F.sum("token_est")).alias("volume"))
    return resolve_correlated(pairs, volumes)


# ---------------------------------------------------------------------------
# Training-sample assembly (J6 stacking + G4 purge) and image transforms
# ---------------------------------------------------------------------------

_ASSEMBLE_ORACLE = f"""{_SIG_CTE},
w8 AS (
    SELECT conv_id, turn_idx, ts, text_len,
        COUNT(*) OVER ({_W} ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS n_in_win,
        LAG(text_len, 7) OVER ({_W}) AS first_el
    FROM sig
)
SELECT conv_id, turn_idx, ts,
    CAST(8 AS INT) AS vec_len,
    ROUND(first_el, 6) AS vec_first,
    ROUND(text_len, 6) AS vec_last
FROM w8 WHERE n_in_win = 8"""


@register("assemble_vectors", _ASSEMBLE_ORACLE)
def q_assemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 sample stacking: trailing length-8 float32 vectors per turn
    (rows with short windows dropped, base.py:111-125 semantics). The
    oracle pins the window boundaries: first element = value at t−7,
    last = value at t."""
    from sparkfeat.assemble import assemble_vectors

    sig = with_turn_signals(transcripts_from_events(spark, sf_dir))
    out = assemble_vectors(sig, ["text_len"], length=8)
    return out.select(
        "conv_id",
        "turn_idx",
        "ts",
        F.size("text_len_vec").cast("int").alias("vec_len"),
        _r(F.element_at("text_len_vec", 1).cast("double")).alias("vec_first"),
        _r(F.element_at("text_len_vec", 8).cast("double")).alias("vec_last"),
    )


def _polar_field_oracle(element_expr: str, agg_expr: str) -> str:
    """Shared GASF/GADF oracle scaffold: trailing-16 window collect →
    PAA(4) → min-max to [−1,1] (cos) + sqrt(1−cos²) (sin) → 4×4 field
    element at k = (i=k//4, j=k%4) — the same op order as
    ``transforms.gasf_image``/``gadf_image``, so per-element doubles are
    bit-identical; only the final 16-term sum order can differ (≈1e-16,
    far inside round-6)."""
    return f"""{_SIG_CTE},
w AS (
    SELECT conv_id, turn_idx,
        list(text_len) OVER ({_W} ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS win
    FROM sig
),
f AS (SELECT conv_id, turn_idx, win FROM w WHERE len(win) >= 16),
paa AS (
    SELECT conv_id, turn_idx,
        list_transform(generate_series(0, 3),
            i -> (win[i*4+1] + win[i*4+2] + win[i*4+3] + win[i*4+4]) / 4.0) AS p
    FROM f
),
sc AS (
    SELECT conv_id, turn_idx,
        list_transform(p, x -> CASE WHEN list_max(p) = list_min(p) THEN 0.0
            ELSE LEAST(GREATEST(2.0*(x - list_min(p))/(list_max(p) - list_min(p)) - 1.0,
                                -1.0), 1.0) END) AS cosv
    FROM paa
),
g AS (
    SELECT conv_id, turn_idx, cosv,
        list_transform(cosv, x -> sqrt(LEAST(GREATEST(1.0 - x*x, 0.0), 1.0))) AS sinv
    FROM sc
),
fld AS (
    SELECT conv_id, turn_idx,
        list_transform(generate_series(0, 15), k -> {element_expr}) AS img
    FROM g
)
SELECT conv_id, turn_idx, CAST(16 AS INT) AS img_len,
    ROUND({agg_expr}, 6) AS img_sum
FROM fld"""


_GASF_ORACLE = _polar_field_oracle(
    "cosv[k//4+1]*cosv[k%4+1] - sinv[k//4+1]*sinv[k%4+1]",
    "list_sum(img)",
)

# GADF's plain sum is identically 0 (antisymmetric field) — checksum on |x|
_GADF_ORACLE = _polar_field_oracle(
    "sinv[k//4+1]*cosv[k%4+1] - cosv[k//4+1]*sinv[k%4+1]",
    "list_sum(list_transform(img, x -> abs(x)))",
)


def _q_image(spark: SparkSession, sf_dir: str, kind: str, use_abs: bool) -> DataFrame:
    from sparkfeat.transforms import window_image_feature

    sig = with_turn_signals(transcripts_from_events(spark, sf_dir))
    col = f"text_len_{kind}"
    out = window_image_feature(
        sig, "text_len", length=16, image_size=4, kind=kind, dtype="float64"
    )
    term = (lambda a, x: a + F.abs(x)) if use_abs else (lambda a, x: a + x)
    return out.filter(F.col(col).isNotNull()).select(
        "conv_id",
        "turn_idx",
        F.size(col).alias("img_len"),
        _r(F.aggregate(col, F.lit(0.0), term)).alias("img_sum"),
    )


@register("gasf_window_images", _GASF_ORACLE, driver=False)
def q_gasf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8 GASF image features over trailing 16-turn windows (image 4×4,
    Arrow pandas UDF, float64 for the checksum path); the oracle rebuilds
    PAA → polar encoding → field in SQL and checks the per-row sum."""
    return _q_image(spark, sf_dir, "gasf", use_abs=False)


@register("gadf_window_images", _GADF_ORACLE, driver=False)
def q_gadf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9 GADF (difference field): per-row sum of |field| — the plain sum
    is identically zero by antisymmetry, so |·| makes the checksum
    informative."""
    return _q_image(spark, sf_dir, "gadf", use_abs=True)


_MTF_ORACLE = f"""{_SIG_CTE},
w AS (
    SELECT conv_id, turn_idx,
        list(text_len) OVER ({_W} ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS win
    FROM sig
),
b AS (
    SELECT conv_id, turn_idx, win, list_sort(win) AS s FROM w WHERE len(win) >= 16
),
qx AS (
    SELECT conv_id, turn_idx, win,
        list_transform(generate_series(1, 6), k ->
            s[CAST(FLOOR(15*k/7.0) AS INT) + 1]
            + (15*k/7.0 - FLOOR(15*k/7.0))
              * (s[CAST(FLOOR(15*k/7.0) AS INT) + 2]
                 - s[CAST(FLOOR(15*k/7.0) AS INT) + 1])) AS qs
    FROM b
),
qq AS (
    SELECT conv_id, turn_idx,
        list_transform(win, x -> len(list_filter(qs, v -> v <= x))) AS q
    FROM qx
),
wc AS (
    SELECT conv_id, turn_idx, q,
        list_transform(generate_series(0, 48), c ->
            len(list_filter(generate_series(1, 15),
                            i -> q[i] = c // 7 AND q[i+1] = c % 7))) AS tc
    FROM qq
),
rs AS (
    SELECT conv_id, turn_idx, q, tc,
        list_transform(generate_series(0, 6), a -> list_sum(tc[a*7+1 : a*7+7])) AS rsum
    FROM wc
)
SELECT conv_id, turn_idx, CAST(16 AS INT) AS img_len,
    ROUND(list_sum(list_transform(generate_series(0, 255), st ->
        CASE WHEN rsum[q[st // 16 + 1] + 1] = 0 THEN 0.0
             ELSE CAST(tc[q[st // 16 + 1] * 7 + q[st % 16 + 1] + 1] AS DOUBLE)
                  / rsum[q[st // 16 + 1] + 1] END)) / 16.0, 6) AS img_sum
FROM rs"""


@register("mtf_window_images", _MTF_ORACLE, driver=False)
def q_mtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T10 Markov transition field over trailing 16-turn windows
    (7 quantile bins, PAA to 4×4): the oracle rebuilds np.quantile's
    linear interpolation, searchsorted-right binning, the 7×7 transition
    matrix, row normalization, and the 16×16 field sum entirely in SQL
    list algebra (agrees to ~2e-15, far inside round-6)."""
    return _q_image(spark, sf_dir, "mtf", use_abs=False)


# The driver-facing consolidation of T8/T9/T10: all three window-image
# encodings in one row per (conv_id, turn_idx), so one driver slot covers
# the whole family while each encoding keeps its standalone pytest oracle.
_WINDOW_IMAGES_ORACLE = f"""SELECT conv_id, turn_idx, g.img_len,
    g.img_sum AS gasf_sum, d.img_sum AS gadf_sum, m.img_sum AS mtf_sum
FROM ({_GASF_ORACLE}) g
JOIN ({_GADF_ORACLE}) d USING (conv_id, turn_idx)
JOIN ({_MTF_ORACLE}) m USING (conv_id, turn_idx)"""


@register("window_images", _WINDOW_IMAGES_ORACLE)
def q_window_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8+T9+T10 in one result: GASF / GADF(|·|) / MTF checksums per
    trailing 16-turn window, joined on the (conv_id, turn_idx) key all
    three share. Each encoding's full SQL replay stays standalone in
    pytest (gasf/gadf/mtf_window_images, driver=False); this row is the
    driver's one-slot umbrella for the family."""
    keys = ["conv_id", "turn_idx"]
    g = _q_image(spark, sf_dir, "gasf", use_abs=False).withColumnRenamed(
        "img_sum", "gasf_sum"
    )
    d = (
        _q_image(spark, sf_dir, "gadf", use_abs=True)
        .withColumnRenamed("img_sum", "gadf_sum")
        .drop("img_len")
    )
    m = (
        _q_image(spark, sf_dir, "mtf", use_abs=False)
        .withColumnRenamed("img_sum", "mtf_sum")
        .drop("img_len")
    )
    return g.join(d, keys).join(m, keys)


@register("ewma_chunked_scan", _EWMA_ORACLE, driver=False)  # same closed-form oracle
def q_ewma_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 EWMA via the distributed chunk scan (mega-conversation skew
    strategy: per-chunk local state + decayed carry broadcast back) —
    checked against the same closed-form weighted-cumsum oracle, proving
    all three physical strategies agree end-to-end."""
    sig = with_turn_signals(transcripts_from_events(spark, sf_dir))
    out = T.ewma(sig, "text_len", halflife=7.5, out_col="ewma_c", chunk_size=512)
    return out.select("conv_id", "turn_idx", "ts", _r(F.col("ewma_c")).alias("text_len_ewma"))


_EMB_PAIRS_ORACLE = f"""WITH c AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
cents AS (
    SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cent_id, v AS cv
    FROM (SELECT * FROM c ORDER BY vec_id LIMIT 8)
),
assigned AS (
    SELECT vec_id, v, cent_id FROM (
        SELECT c.vec_id, c.v, cents.cent_id,
            ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
                {_COS.format(a='c.v', b='cents.cv')} DESC, cents.cent_id) AS r
        FROM c, cents) WHERE r <= 4
),
normed AS (
    -- mirror the engine's pre-normalized verify: unit vectors first,
    -- then a single dot product per pair (identical fold order)
    SELECT cent_id, vec_id,
        list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS nv
    FROM assigned
)
SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
    ROUND(list_dot_product(a.nv, b.nv), 6) AS cosine
FROM normed a JOIN normed b
  ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
WHERE list_dot_product(a.nv, b.nv) >= 0.4"""


def _emb_lsh_oracle(
    threshold: float = 0.4, n_planes: int = 48, n_bands: int = 8, dim: int = 64
) -> str:
    """Replay the fit-free sign-LSH near-dup in SQL: same inlined plane
    literals, same left-to-right fold for the sign bits, same band
    self-join + unit-cosine verify."""
    from sparkfeat.similarity import lsh_planes

    planes = lsh_planes(dim, n_planes)
    rb = n_planes // n_bands

    def arr(p):
        return "[" + ",".join(repr(float(x)) for x in p) + "]"

    bits = ",\n        ".join(
        f"CASE WHEN list_dot_product(v, {arr(p)}) >= 0 THEN 1 ELSE 0 END"
        for p in planes
    )
    key = " + ".join(f"bits[{rb}*band_idx + {j + 1}] * {1 << j}" for j in range(rb))
    return f"""WITH c AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
s AS (
    SELECT vec_id, [{bits}] AS bits FROM c
),
cb AS (
    SELECT vec_id, band_idx, {key} AS band_key
    FROM s, (SELECT unnest(generate_series(0, {n_bands - 1})) AS band_idx)
),
cand AS (
    SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
    FROM cb a JOIN cb b USING (band_idx, band_key)
    WHERE a.vec_id < b.vec_id
),
un AS (
    SELECT vec_id, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS u
    FROM c
)
SELECT id_a, id_b, ROUND(list_dot_product(ua.u, ub.u), 6) AS cosine
FROM cand
JOIN un ua ON cand.id_a = ua.vec_id
JOIN un ub ON cand.id_b = ub.vec_id
WHERE list_dot_product(ua.u, ub.u) >= {threshold}"""


@register("dedup_embedding_lsh", _emb_lsh_oracle())
def q_embedding_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via fit-free sign-LSH banding (48
    md5-derived planes, 8 bands of 6 bits) + exact unit-cosine verify —
    the no-fit-pass alternative to the IVF route (dedup_embedding_pairs)
    for corpora that churn faster than a centroid fit amortizes. At this
    fixture's moderate-similarity pairs (max cosine 0.51) the banding
    keeps ~half the brute-force pairs — by design; the c≥0.9 near-dup
    design point measures ≥0.9 recall on planted duplicates in pytest.
    The oracle replays the full LSH, so engine parity is exact."""
    from sparkfeat.dedup import embedding_pairs_lsh

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = embedding_pairs_lsh(emb, threshold=0.4, n_planes=48, n_bands=8, dim=64)
    return out.select("id_a", "id_b", _r(F.col("cosine")).alias("cosine"))


@register("dedup_embedding_pairs", _EMB_PAIRS_ORACLE)
def q_embedding_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cosine ≥ 0.4) via IVF-bucket
    co-membership candidates + exact cosine verify — no CartesianProduct
    in the plan (asserted in test_plans). The oracle replays the same
    assignment and in-bucket pairing; recall vs the brute-force baseline
    is pytest-measured."""
    from sparkfeat.dedup import embedding_pairs_bucketed

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = embedding_pairs_bucketed(emb, threshold=0.4, n_centroids=8, n_assign=4)
    return out.select("id_a", "id_b", _r(F.col("cosine")).alias("cosine"))


# ---------------------------------------------------------------------------
# Round 4: PII scrubbing, n-gram repetition, decontamination, global
# shuffle, mixture sampling — the remaining corpus-prep primitives a
# trillion-token pipeline runs that had no driver slot yet.
# ---------------------------------------------------------------------------


def _hex_bucket_sql(col: str, start: int, buckets: int, hexpr: str | None = None) -> str:
    """The SQL replay of corpus.hash_bucket: 8 hex digits of md5(col)
    starting at 1-based position ``start``, expanded positionally.
    Pass ``hexpr`` to bucket an existing hex-string expression instead
    of md5-ing the column."""
    h = hexpr or f"md5(CAST({col} AS VARCHAR))"
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr({h}, "
        f"{start + j}, 1)) - 1) * {16 ** (7 - j)}"
        for j in range(8)
    )
    return f"(({terms}) % {buckets})"


# Deterministic PII enrichment: the synthetic corpus carries no PII, so
# the query plants typed contacts derived from the doc id — mirrored
# byte-for-byte in the oracle — and then scrubs them. The scrub itself
# is the operator under test; the enrichment just makes it fire.
_PII_AUG_SQL = (
    "text"
    " || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@example.com' ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN ' ssn 123-45-6789' ELSE '' END"
    " || CASE WHEN doc_id % 7 = 0 THEN ' call 555-123-4567' ELSE '' END"
    " || CASE WHEN doc_id % 11 = 0 THEN ' host 10.0.0.' ||"
    " CAST(doc_id % 255 AS VARCHAR) ELSE '' END"
)


def _pii_oracle() -> str:
    """Stepwise CTE chain mirroring scrub_pii: each kind's count runs on
    the PREVIOUS kind's scrub output, so a span is attributed to exactly
    one kind on both engines."""
    from sparkfeat.text import PII_PATTERNS

    steps, acc = [], []
    prev_tbl, prev_txt = "a", "t0"
    for i, (kind, pat, rep) in enumerate(PII_PATTERNS):
        carried = (", " + ", ".join(acc)) if acc else ""
        steps.append(
            f"s{i} AS (SELECT doc_id{carried}, "
            f"CAST(len(regexp_extract_all({prev_txt}, '{pat}')) AS INT) AS n_{kind}, "
            f"regexp_replace({prev_txt}, '{pat}', '{rep}', 'g') AS t{i + 1} "
            f"FROM {prev_tbl})"
        )
        acc.append(f"n_{kind}")
        prev_tbl, prev_txt = f"s{i}", f"t{i + 1}"
    return (
        f"WITH a AS (SELECT doc_id, {_PII_AUG_SQL} AS t0 FROM documents),\n"
        + ",\n".join(steps)
        + f"\nSELECT doc_id, {', '.join(acc)}, "
        f"CAST(LENGTH({prev_txt}) AS INT) AS red_len, md5({prev_txt}) AS red_fp "
        f"FROM {prev_tbl}"
    )


@register("doc_pii_scrub", _pii_oracle())
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass: emails, SSNs, phone numbers, IPv4 addresses
    replaced by typed placeholders with stepwise per-kind counts (each
    span attributed to exactly one kind). Pure regexp_replace/
    regexp_count Column chain in the Java∩RE2 regex subset — map-only,
    whole-stage codegen, fuses into the corpus scan at 100 TB. The
    corpus is synthetic and PII-free, so the query first plants
    deterministic doc_id-derived contacts (mirrored in the oracle);
    emits the redacted text's length+md5 rather than the text itself."""
    from sparkfeat.text import scrub_pii

    docs = _docs(spark, sf_dir)
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 5 == 0, F.lit(" ssn 123-45-6789")).otherwise(
                F.lit("")
            ),
            F.when(F.col("doc_id") % 7 == 0, F.lit(" call 555-123-4567")).otherwise(
                F.lit("")
            ),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.concat(
                    F.lit(" host 10.0.0."), (F.col("doc_id") % 255).cast("string")
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    out = scrub_pii(aug)
    return out.select(
        "doc_id",
        "n_email",
        "n_ssn",
        "n_phone",
        "n_ip",
        F.length("red_text").alias("red_len"),
        F.md5("red_text").alias("red_fp"),
    )


_REPETITION_ORACLE = r"""WITH t AS (
    SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS ws FROM documents
),
g AS (
    SELECT doc_id,
        unnest(list_transform(generate_series(1, len(ws) - 2),
                              i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS gram
    FROM t WHERE len(ws) >= 3
),
c AS (
    SELECT doc_id, gram, COUNT(*) AS cnt FROM g GROUP BY doc_id, gram
),
d AS (
    SELECT doc_id,
        CAST(SUM(cnt) AS BIGINT) AS n_grams,
        CAST(COUNT(*) AS BIGINT) AS n_dist_grams,
        CAST(MAX(cnt) AS BIGINT) AS max_ngram_rep,
        CAST(SUM(cnt - 1) AS BIGINT) AS n_excess
    FROM c GROUP BY doc_id
)
SELECT doc_id,
    COALESCE(n_grams, 0) AS n_grams,
    COALESCE(n_dist_grams, 0) AS n_dist_grams,
    COALESCE(max_ngram_rep, 0) AS max_ngram_rep,
    ROUND(CASE WHEN n_grams > 0
               THEN CAST(n_excess AS DOUBLE) / n_grams ELSE 0.0 END, 6)
        AS dup_ngram_frac
FROM documents LEFT JOIN d USING (doc_id)"""


@register("doc_repetition", _REPETITION_ORACLE)
def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document word-trigram repetition profile (duplicate-gram
    fraction, max repeat count) via the explode→groupBy shape: per-task
    memory is bounded by the aggregate hash map, not the document
    length, so heavy-tailed docs (a 1 GB pathological page) can't blow
    a task — the scale-out twin of the in-row list-algebra repetition
    signals in doc_quality_rules."""
    from sparkfeat.text import ngram_repetition

    docs = _docs(spark, sf_dir)
    out = ngram_repetition(docs, n=3)
    return out.select(
        "doc_id",
        "n_grams",
        "n_dist_grams",
        "max_ngram_rep",
        _r(F.col("dup_ngram_frac")).alias("dup_ngram_frac"),
    )


def _decontaminate_oracle(n: int = 3, bench_pct: int = 20) -> str:
    gram = " || ' ' || ".join(f"ws[i+{k}]" if k else "ws[i]" for k in range(n))
    return f"""WITH h AS (
    SELECT doc_id, lower(text) AS lc, {_hex_bucket_sql("doc_id", 9, 1000)} AS bb
    FROM documents
),
w AS (
    SELECT doc_id, bb, regexp_split_to_array(lc, '\\s+') AS ws FROM h
),
gr AS (
    SELECT doc_id, bb,
        list_distinct(list_transform(generate_series(1, len(ws) - {n - 1}),
                                     i -> md5({gram}))) AS grams
    FROM w
),
bg AS (
    SELECT DISTINCT unnest(grams) AS gram FROM gr WHERE bb < {bench_pct}
),
corp AS (
    SELECT doc_id, grams FROM gr WHERE bb >= {bench_pct}
),
x AS (
    SELECT doc_id, unnest(grams) AS gram FROM corp
),
hit AS (
    SELECT doc_id, COUNT(*) AS n_hit FROM x JOIN bg USING (gram) GROUP BY doc_id
)
SELECT corp.doc_id,
    CAST(len(grams) AS BIGINT) AS n_grams,
    CAST(COALESCE(n_hit, 0) AS BIGINT) AS n_hit,
    COALESCE(n_hit, 0) > 0 AS contaminated
FROM corp LEFT JOIN hit USING (doc_id)"""


@register("corpus_decontaminate", _decontaminate_oracle())
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing any word
    n-gram with a held-out benchmark set (the test-set-leakage sweep run
    before pretraining; n=3 here for the tiny synthetic vocabulary, n=8
    for English prose — pytest covers n=8 on planted contamination).
    The benchmark slice is a deterministic 2% md5 bucket of the corpus.
    Scale shape: eval sets are MBs, so their distinct gram hashes
    BROADCAST; the corpus side explodes per-doc distinct grams into a
    broadcast semi-join + doc-keyed count — the 100 TB side is never
    shuffled on the gram (plan-asserted)."""
    from sparkfeat.corpus import decontaminate, hash_bucket

    docs = _docs(spark, sf_dir)
    bb = hash_bucket("doc_id", start=9, buckets=1000)
    bench = docs.filter(bb < 20)
    corpus = docs.filter(bb >= 20)
    return decontaminate(corpus, bench, n=3)


def _dup_spans_oracle(n: int = 3, min_count: int = 2) -> str:
    gram = " || ' ' || ".join(f"ws[i+{k + 1}]" for k in range(n))
    return f"""WITH w AS (
    SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS ws FROM documents
),
g AS (
    SELECT doc_id, u.pos AS pos, u.gram AS gram
    FROM (
        SELECT doc_id,
            unnest(list_transform(generate_series(0, len(ws) - {n}),
                i -> {{'pos': i, 'gram': md5({gram})}})) AS u
        FROM w WHERE len(ws) >= {n}
    )
),
c AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= {min_count}),
d AS (SELECT g.doc_id, g.pos FROM g JOIN c USING (gram)),
isl AS (
    SELECT doc_id, pos,
        pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS k
    FROM d
),
runs AS (SELECT doc_id, COUNT(*) AS run FROM isl GROUP BY doc_id, k),
mr AS (SELECT doc_id, MAX(run) AS max_run FROM runs GROUP BY doc_id),
pd AS (
    SELECT doc_id, COUNT(*) AS n_dup,
        len(list_distinct(flatten(
            list_transform(list(pos), p -> range(p, p + {n}))))) AS covered
    FROM d GROUP BY doc_id
)
SELECT w.doc_id,
    CAST(greatest(len(ws) - {n - 1}, 0) AS BIGINT) AS n_grams,
    CAST(COALESCE(n_dup, 0) AS BIGINT) AS n_dup_grams,
    ROUND(CASE WHEN len(ws) - {n - 1} > 0
        THEN CAST(COALESCE(n_dup, 0) AS DOUBLE) / (len(ws) - {n - 1})
        ELSE 0.0 END, 6) AS dup_fraction,
    CAST(COALESCE(covered, 0) AS BIGINT) AS covered_tokens,
    ROUND(CAST(COALESCE(covered, 0) AS DOUBLE) / len(ws), 6)
        AS coverage_fraction,
    CAST(CASE WHEN COALESCE(n_dup, 0) > 0 THEN max_run + {n - 1}
        ELSE 0 END AS BIGINT) AS max_dup_span
FROM w LEFT JOIN pd ON w.doc_id = pd.doc_id
LEFT JOIN mr ON w.doc_id = mr.doc_id"""


@register("doc_duplicate_spans", _dup_spans_oracle(), driver=False)
def q_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicate-span sweep (n-gram-granularity exact
    substring dedup): per doc, how much of it is repeated verbatim
    anywhere in the corpus — dup-gram fraction, span token coverage,
    and the longest duplicated substring. n=3 for the tiny synthetic
    vocabulary (pytest covers n=4 on planted shared sentences).
    Oracle replays the positional gram lattice, occurrence counts, the
    span union, and the gaps-and-islands run length in DuckDB."""
    from sparkfeat.corpus import duplicate_spans

    out = duplicate_spans(_docs(spark, sf_dir), n=3)
    return out.select(
        "doc_id",
        "n_grams",
        "n_dup_grams",
        _r(F.col("dup_fraction")).alias("dup_fraction"),
        "covered_tokens",
        _r(F.col("coverage_fraction")).alias("coverage_fraction"),
        "max_dup_span",
    )


def _cut_dup_spans_oracle(n: int = 3, min_count: int = 2) -> str:
    gram = " || ' ' || ".join(f"ws[i+{k + 1}]" for k in range(n))
    return f"""WITH w AS (
    SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS ws FROM documents
),
g AS (
    SELECT doc_id, u.pos AS pos, u.gram AS gram
    FROM (
        SELECT doc_id,
            unnest(list_transform(generate_series(0, len(ws) - {n}),
                i -> {{'pos': i, 'gram': md5({gram})}})) AS u
        FROM w WHERE len(ws) >= {n}
    )
),
r AS (
    SELECT doc_id, pos,
        COUNT(*) OVER (PARTITION BY gram) AS n_occ,
        ROW_NUMBER() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rk
    FROM g
),
cp AS (
    SELECT doc_id,
        list_distinct(flatten(
            list_transform(list(pos), p -> range(p, p + {n})))) AS cut_pos
    FROM r WHERE n_occ >= {min_count} AND rk > 1
    GROUP BY doc_id
)
SELECT w.doc_id,
    COALESCE(array_to_string(
        list_filter(ws, (t, i) -> cut_pos IS NULL
            OR NOT list_contains(cut_pos, i - 1)), ' '), '') AS text,
    CAST(len(ws) AS BIGINT) AS n_tokens,
    CAST(COALESCE(len(cut_pos), 0) AS BIGINT) AS n_cut_tokens,
    ROUND(CAST(len(ws) - COALESCE(len(cut_pos), 0) AS DOUBLE) / len(ws), 6)
        AS kept_fraction
FROM w LEFT JOIN cp ON w.doc_id = cp.doc_id"""


@register("corpus_cut_dup_spans", _cut_dup_spans_oracle(), driver=False)
def q_cut_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-deduplicated corpus rebuild: every duplicated n-gram span
    is cut from all but its lexicographically-first (doc_id, pos)
    occurrence; the oracle replays the gram lattice, the corpus-wide
    occurrence window, the first-occurrence ranking, the span union,
    and the index-lambda token filter in DuckDB — the rebuilt TEXT
    itself is hash-compared, not just the counts."""
    from sparkfeat.corpus import cut_duplicate_spans

    out = cut_duplicate_spans(_docs(spark, sf_dir), n=3)
    return out.select(
        "doc_id",
        "text",
        "n_tokens",
        "n_cut_tokens",
        _r(F.col("kept_fraction")).alias("kept_fraction"),
    )


def _global_shuffle_oracle(shards: int = 64, seed: str = "0") -> str:
    return f"""WITH k AS (
    SELECT doc_id, md5('{seed}:' || CAST(doc_id AS VARCHAR)) AS skey
    FROM documents
),
s AS (
    SELECT doc_id, skey,
        CAST({_hex_bucket_sql("doc_id", 1, shards, hexpr="skey")} AS INT) AS shard
    FROM k
)
SELECT doc_id, skey AS shuffle_key, shard,
    CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY skey, doc_id) - 1
         AS BIGINT) AS pos
FROM s"""


@register("corpus_global_shuffle", _global_shuffle_oracle())
def q_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training-example order: every
    doc gets an md5(seed‖id) shuffle key, a uniform shard, and its rank
    within the shard — reading shards in (shard, pos) order IS the
    shuffled epoch; same seed replays byte-identically on any cluster,
    no orderBy(rand()). The only wide op is the per-shard row_number
    (hash-partitioned window over corpus/shards rows), never a global
    sort."""
    from sparkfeat.corpus import global_shuffle

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return global_shuffle(docs, shards=64, seed="0")


_MIXTURE_TARGETS = {"en": 0.5, "de": 0.2, "fr": 0.2, "es": 0.1}
_MIXTURE_FRAC = 0.5


def _mixture_oracle(
    targets: dict[str, float] = _MIXTURE_TARGETS, frac: float = _MIXTURE_FRAC
) -> str:
    cases = " ".join(
        f"WHEN lang = '{g}' THEN LEAST(1.0, ({p!r} * ({frac!r} * tot)) / n_group)"
        for g, p in sorted(targets.items())
    )
    return f"""WITH c AS (
    SELECT lang, COUNT(*) AS n_group FROM documents GROUP BY lang
),
t AS (
    SELECT COUNT(*) AS tot FROM documents
),
r AS (
    SELECT lang, n_group,
        CASE {cases} ELSE 0.0 END AS rate
    FROM c, t
),
h AS (
    SELECT doc_id, lang, {_hex_bucket_sql("doc_id", 13, 1_000_000)} AS kb
    FROM documents
)
SELECT doc_id, h.lang,
    CAST(n_group AS BIGINT) AS n_group,
    ROUND(rate, 6) AS rate,
    kb < CAST(FLOOR(rate * 1000000) AS BIGINT) AS keep
FROM h JOIN r ON h.lang = r.lang"""


@register("corpus_mixture_sample", _mixture_oracle())
def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain/language mixture sampling: per-group hash-keep rates
    chosen so the kept corpus hits the target mixture proportions at an
    overall 50% budget (rate_g = min(1, p_g·frac·N/n_g) — waterfilling
    without iteration; undersized groups kept whole). Membership is a
    property of the doc id (md5 bucket), so the sample is stable under
    corpus growth and byte-replayable in any engine. One tiny
    groupBy-count broadcast back; the keep decision is map-side."""
    from sparkfeat.corpus import mixture_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = mixture_sample(docs, _MIXTURE_TARGETS, frac=_MIXTURE_FRAC)
    return out.select(
        "doc_id",
        "lang",
        "n_group",
        _r(F.col("rate")).alias("rate"),
        "keep",
    )


# ---------------------------------------------------------------------------
# Zero-leakage audit as an operator (north rule: "allclose feature
# parity + zero-leakage audit" gates the throughput metric)
# ---------------------------------------------------------------------------

_AUDIT_CUTOFFS = ["2024-01-10 00:00:00", "2024-01-20 00:00:00"]
_AUDIT_FLOATS = ["text_len_lr", "text_len_vol", "text_len_stoch_k", "token_est_ker"]


def _flagship_sql_truncated(cutoff: str | None) -> str:
    """The flagship oracle computed over transcripts truncated at
    ``cutoff`` BEFORE any feature math — the 'data as it existed at
    time c' side of the truncation audit."""
    if cutoff is None:
        return _FLAGSHIP_ORACLE
    needle = "FROM transcripts\n)"
    assert _FLAGSHIP_ORACLE.count(needle) == 1
    return _FLAGSHIP_ORACLE.replace(
        needle, f"FROM transcripts WHERE ts <= TIMESTAMP '{cutoff}'\n)", 1
    )


def _leakage_audit_oracle() -> str:
    def one(c: str) -> str:
        null_skew = " OR ".join(
            f"((a.{f} IS NULL) <> (b.{f} IS NULL))" for f in _AUDIT_FLOATS
        )
        num_diff = " OR ".join(
            f"(a.{f} IS NOT NULL AND b.{f} IS NOT NULL AND ABS(a.{f} - b.{f}) > 0)"
            for f in _AUDIT_FLOATS
        )
        diffs = ", ".join(
            f"CASE WHEN a.{f} IS NOT NULL AND b.{f} IS NOT NULL "
            f"THEN ABS(a.{f} - b.{f}) END"
            for f in _AUDIT_FLOATS
        )
        viol = f"(a.session_idx <> b.session_idx) OR {null_skew} OR {num_diff}"
        return f"""SELECT '{c}' AS cutoff,
    CAST(COUNT(*) AS BIGINT) AS n_rows,
    CAST(SUM(CASE WHEN b.ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_only_full,
    CAST(SUM(CASE WHEN a.ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_only_trunc,
    CAST(SUM(CASE WHEN a.ts IS NOT NULL AND b.ts IS NOT NULL AND ({viol})
             THEN 1 ELSE 0 END) AS BIGINT) AS n_viol,
    COALESCE(MAX(GREATEST({diffs})), 0.0) AS max_abs_diff
FROM (SELECT * FROM ({_flagship_sql_truncated(None)})
      WHERE ts <= TIMESTAMP '{c}') a
FULL JOIN ({_flagship_sql_truncated(c)}) b USING (conv_id, turn_idx)"""

    return "\nUNION ALL\n".join(one(c) for c in _AUDIT_CUTOFFS)


@register("flagship_leakage_audit", _leakage_audit_oracle(), driver=False)
def q_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north rule's zero-leakage audit RUN AS A SPARK JOB: for each
    cutoff c, the flagship features computed on the full table and
    restricted to ts ≤ c must equal the features computed on the table
    truncated at c before any feature math (trailing windows only ⇒
    bit-identical; any lookahead ⇒ violation rows). Full-outer join +
    aggregate — no collect, audits at pipeline scale. The oracle
    replays BOTH sides and the comparison in DuckDB, so the audit
    itself is engine-checked: both engines must agree the violation
    count is zero."""
    from sparkfeat.audit import truncation_leakage_audit
    from sparkfeat.pipeline import flagship_features

    def build(df: DataFrame) -> DataFrame:
        out = flagship_features(df)
        return out.select(
            "conv_id",
            "turn_idx",
            "ts",
            "session_idx",
            _r(F.col("text_len_log-return")).alias("text_len_lr"),
            _r(F.col("text_len_volatility")).alias("text_len_vol"),
            _r(F.col("text_len_stochastic_k")).alias("text_len_stoch_k"),
            _r(F.col("token_est_ker")).alias("token_est_ker"),
        )

    df = transcripts_from_events(spark, sf_dir)
    return truncation_leakage_audit(
        build,
        df,
        cutoffs=_AUDIT_CUTOFFS,
        compare_cols=["session_idx", *_AUDIT_FLOATS],
    )


def _neardup_clusters_oracle() -> str:
    """Transitive closure of the MinHash near-dup pair graph as a
    recursive CTE (tiny at sf0.01 — 25 pairs), then the same
    min-id-label + cluster-size + keep projection as
    ``dedup.neardup_clusters``. The Spark side computes the identical
    labels with O(log n) large-star/small-star rounds; the oracle checks
    the SEMANTICS (min reachable id) with brute-force closure."""
    return f"""WITH RECURSIVE pairs AS (
    SELECT id_a, id_b FROM ({_minhash_oracle()}) _mh
),
edges AS (
    SELECT id_a AS u, id_b AS v FROM pairs
    UNION
    SELECT id_b, id_a FROM pairs
),
reach(n, r) AS (
    SELECT u, u FROM edges
    UNION
    SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.n
),
lab AS (SELECT n AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY n),
alldocs AS (
    SELECT d.doc_id, COALESCE(lab.cluster_id, d.doc_id) AS cluster_id
    FROM documents d LEFT JOIN lab USING (doc_id)
),
sizes AS (
    SELECT cluster_id, COUNT(*) AS cluster_size
    FROM alldocs GROUP BY cluster_id
)
SELECT a.doc_id, a.cluster_id, s.cluster_size,
       a.doc_id = a.cluster_id AS keep
FROM alldocs a JOIN sizes s USING (cluster_id)"""


@register("dedup_neardup_clusters", _neardup_clusters_oracle())
def q_dedup_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs → clusters → canonical keep-list: connected components over
    the MinHash+LSH near-dup pair graph (alternating large-star /
    small-star contractions, O(log n) rounds, lineage checkpointed per
    round), then one doc kept per duplicate cluster (the smallest id —
    deterministic on any cluster). This is the action step a training
    corpus needs on top of pairwise near-dup evidence: pairwise drops
    can't dedupe transitive chains (A≈B, B≈C, A̸≈C keeps nothing or the
    wrong set depending on order); components can."""
    from sparkfeat.dedup import minhash_lsh_pairs, neardup_clusters

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = minhash_lsh_pairs(docs, num_perm=64, bands=16, shingle_n=2).filter(
        F.col("est_jaccard") >= 0.5
    )
    return neardup_clusters(docs, pairs)


# ---------------------------------------------------------------------------
# Driver-slot rotation (policy: COVERAGE.md "Driver-slot rotation").
#
# The driver registry is capped at 50 so its 50-row correctness sample
# covers every driver query each round; the remaining registered queries
# are strategy twins / variants that stay fully DuckDB-oracle-checked in
# ---------------------------------------------------------------------------
# BM25 keyword search (sparkfeat.search)
# ---------------------------------------------------------------------------

#: fixed probe queries over the synthetic corpus vocabulary — literal in
#: both engines, so the query set is part of the checked contract.
_BM25_PROBES = [
    (0, "hash join merge"),
    (1, "window sort order"),
    (2, "spark stream batch"),
    (3, "vector scan"),
    (4, "slow query filter"),
]


def _bm25_chain_ctes(k1: float = 1.5, b: float = 0.75) -> str:
    """The BM25 scoring chain as CTEs ``d`` .. ``r`` — expects a ``qt``
    CTE of (query_id, term) to exist. Shared by the standalone BM25
    oracle (literal probe queries) and the hybrid-retrieval oracle
    (queries derived in-plan from probe docs)."""
    return f"""d AS (
    SELECT doc_id,
        list_filter(regexp_split_to_array(lower(text), '\\s+'),
                    x -> x <> '') AS tk
    FROM documents
),
dl AS (SELECT doc_id, len(tk) AS dl FROM d),
st AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM dl),
hits AS (
    SELECT doc_id, unnest(tk) AS term FROM d
),
tf AS (
    SELECT h.term, h.doc_id, COUNT(*) AS tf
    FROM hits h JOIN (SELECT DISTINCT term FROM qt) t USING (term)
    GROUP BY h.term, h.doc_id
),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
sc AS (
    SELECT qt.query_id, tf.doc_id,
        ROUND(SUM(
            ln(1.0 + (st.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
            * (tf.tf * {k1 + 1.0}
               / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / st.avgdl)))
        ), 6) AS score
    FROM tf
    JOIN dfreq USING (term)
    JOIN qt USING (term)
    JOIN dl ON dl.doc_id = tf.doc_id
    CROSS JOIN st
    GROUP BY qt.query_id, tf.doc_id
),
r AS (
    SELECT query_id, doc_id, score,
        row_number() OVER (PARTITION BY query_id
                           ORDER BY score DESC, doc_id) AS rnk
    FROM sc
)"""


def _bm25_oracle(k: int = 10, k1: float = 1.5, b: float = 0.75) -> str:
    vals = ", ".join(f"({i}, '{q}')" for i, q in _BM25_PROBES)
    return f"""WITH probes(query_id, query) AS (VALUES {vals}),
qt AS (
    SELECT DISTINCT query_id, unnest(list_filter(
        regexp_split_to_array(lower(query), '\\s+'), x -> x <> '')) AS term
    FROM probes
),
{_bm25_chain_ctes(k1, b)}
SELECT query_id, doc_id, score, CAST(rnk AS BIGINT) AS rank
FROM r WHERE rnk <= {k}"""


@register("bm25_topk", _bm25_oracle())
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact BM25 top-10 per probe query (sparkfeat.search.bm25_topk):
    broadcast probe terms prune the corpus token lattice map-side, the
    corpus constants ride a one-row broadcast, and top-k is the exact
    two-phase shard prune — no full-corpus inverted-index shuffle, no
    single-reducer hot-query window. Scores rounded to 6dp BEFORE
    ranking, ties broken by doc_id, so the ranking is engine-stable."""
    from sparkfeat.search import bm25_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    probes = spark.createDataFrame(_BM25_PROBES, "query_id long, query string")
    return bm25_topk(docs, probes, k=10)


#: probe docs for hybrid retrieval: lexical query = the doc's first 8
#: tokens, semantic query = the doc's embedding (vec_id aligns 1:1).
_HYBRID_PROBES = [3, 47, 91]


def _hybrid_oracle(
    k: int = 10, arm_k: int = 20, c: int = 60, n_qtok: int = 8
) -> str:
    ids = ", ".join(str(i) for i in _HYBRID_PROBES)
    return f"""WITH pd AS (
    SELECT doc_id,
        list_filter(regexp_split_to_array(lower(text), '\\s+'),
                    x -> x <> '') AS tk
    FROM documents WHERE doc_id IN ({ids})
),
qt AS (
    SELECT DISTINCT doc_id AS query_id, unnest(tk[1:{n_qtok}]) AS term
    FROM pd
),
{_bm25_chain_ctes()},
lex AS (
    SELECT query_id AS probe_id, doc_id, rnk AS r
    FROM r WHERE rnk <= {arm_k}
),
ce AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
nrm AS (
    SELECT vec_id,
        list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS u
    FROM ce
),
pv AS (SELECT vec_id AS probe_id, u AS pu FROM nrm WHERE vec_id IN ({ids})),
semr AS (
    SELECT probe_id, vec_id AS doc_id,
        row_number() OVER (PARTITION BY probe_id
                           ORDER BY list_dot_product(pu, u) DESC, vec_id)
            AS r
    FROM nrm, pv WHERE nrm.vec_id <> pv.probe_id
),
sem AS (SELECT probe_id, doc_id, r FROM semr WHERE r <= {arm_k}),
arms AS (
    SELECT probe_id, doc_id, 1.0 / ({c} + r) AS s FROM lex
    UNION ALL
    SELECT probe_id, doc_id, 1.0 / ({c} + r) AS s FROM sem
),
fused AS (
    SELECT probe_id, doc_id,
        ROUND(SUM(s), 6) AS rrf_score,
        CAST(COUNT(*) AS BIGINT) AS n_arms
    FROM arms WHERE doc_id <> probe_id
    GROUP BY probe_id, doc_id
)
SELECT probe_id, doc_id, rrf_score, n_arms, fused_rank
FROM (
    SELECT *, CAST(row_number() OVER (
        PARTITION BY probe_id
        ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS fused_rank
    FROM fused
) WHERE fused_rank <= {k}"""


@register("hybrid_search_rrf", _hybrid_oracle())
def q_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval — the modern RAG shape — as ONE plan: for each
    probe doc, a LEXICAL arm (BM25 top-20 with the doc's first 8 tokens
    as the query, sparkfeat.search.bm25_topk) and a SEMANTIC arm (exact
    cosine top-20 on the doc's embedding, similarity.cosine_topk) fused
    by reciprocal-rank fusion (search.rrf_fuse, 1/(60+rank), self-hits
    dropped). Each arm keeps its own scale discipline (broadcast term
    prune / broadcast probes); fusion runs on ≤ arms×20 candidates per
    probe by construction. The oracle replays both arms AND the fusion."""
    from sparkfeat.search import bm25_topk, rrf_fuse
    from sparkfeat.similarity import cosine_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ids = list(_HYBRID_PROBES)
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
    probes_q = docs.filter(F.col("doc_id").isin(ids)).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", F.slice(toks, 1, 8)).alias("query"),
    )
    lex = bm25_topk(docs, probes_q, k=20).select(
        F.col("query_id").alias("probe_id"), "doc_id", "rank"
    )
    probes_v = emb.filter(F.col("vec_id").isin(ids)).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    sem = cosine_topk(emb, probes_v, k=20).select(
        "probe_id", F.col("vec_id").alias("doc_id"), F.col("rk").alias("rank")
    )
    return rrf_fuse([lex, sem], k=10)


# ---------------------------------------------------------------------------
# Incremental dedup: batch vs corpus (sparkfeat.dedup.incremental_dedup)
# ---------------------------------------------------------------------------


def _incremental_oracle(num_perm: int = 64, threshold: float = 0.5) -> str:
    bucket = _hex_bucket_sql("doc_id", 5, 100)
    return f"""WITH {_minhash_sig_ctes(num_perm)},
{_minhash_banded_cte()},
split AS (SELECT doc_id, {bucket} < 80 AS in_corpus FROM documents),
fp AS (
    SELECT doc_id,
        md5(array_to_string(list_sort(list_distinct(
            regexp_split_to_array(lower(text), '\\s+'))), ' ')) AS fingerprint
    FROM documents
),
bfp AS (
    SELECT f.doc_id, f.fingerprint
    FROM fp f JOIN split s USING (doc_id) WHERE NOT s.in_corpus
),
cfp AS (
    SELECT DISTINCT f.fingerprint
    FROM fp f JOIN split s USING (doc_id) WHERE s.in_corpus
),
bband AS (
    SELECT b.* FROM banded b JOIN split s USING (doc_id)
    WHERE NOT s.in_corpus
),
cband AS (
    SELECT b.* FROM banded b JOIN split s USING (doc_id) WHERE s.in_corpus
),
near AS (
    SELECT DISTINCT x.doc_id
    FROM bband x JOIN cband y ON x.band = y.band AND x.key = y.key
    WHERE CAST(len(list_filter(generate_series(1, {num_perm}),
                               j -> x.sig[j] = y.sig[j])) AS DOUBLE)
          / {num_perm}.0 >= {threshold}
)
SELECT doc_id,
    COALESCE(fingerprint IN (SELECT fingerprint FROM cfp), FALSE)
        AS exact_dup,
    doc_id > MIN(doc_id) OVER (PARTITION BY fingerprint) AS batch_dup,
    COALESCE(doc_id IN (SELECT doc_id FROM near), FALSE) AS near_dup,
    NOT (COALESCE(fingerprint IN (SELECT fingerprint FROM cfp), FALSE)
         OR doc_id > MIN(doc_id) OVER (PARTITION BY fingerprint)
         OR COALESCE(doc_id IN (SELECT doc_id FROM near), FALSE)) AS keep
FROM bfp"""


@register("dedup_incremental", _incremental_oracle())
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup of a crawl increment against the standing
    corpus (sparkfeat.dedup.incremental_dedup): documents hash-split
    80/20 into corpus/batch by an independent md5 bucket (replayed
    positionally in the oracle); each batch doc gets exact / in-batch /
    MinHash-near-dup verdicts + keep. Production serves the corpus side
    from the persisted build_dedup_index tables — pytest pins
    indexed ≡ inline."""
    from sparkfeat.corpus import hash_bucket
    from sparkfeat.dedup import incremental_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    in_corpus = hash_bucket("doc_id", start=5, buckets=100) < 80
    return incremental_dedup(
        docs.filter(in_corpus), docs.filter(~in_corpus)
    )


# ---------------------------------------------------------------------------
# RAG-style overlapping chunking (sparkfeat.corpus.chunk_documents)
# ---------------------------------------------------------------------------


def _chunks_oracle(chunk: int = 32, overlap: int = 8) -> str:
    step = chunk - overlap
    return f"""WITH d AS (
    SELECT doc_id,
        list_filter(regexp_split_to_array(lower(text), '\\s+'),
                    x -> x <> '') AS tk
    FROM documents
),
n AS (SELECT doc_id, tk, len(tk) AS n FROM d),
c AS (
    SELECT doc_id, tk, n,
        CASE WHEN n <= 0 THEN 0
             ELSE 1 + GREATEST(CAST(FLOOR(
                 (n - {chunk} + {step - 1}) / {step}.0) AS BIGINT), 0)
        END AS nc
    FROM n
),
e AS (
    SELECT doc_id, tk, n, unnest(generate_series(0, nc - 1)) AS ci
    FROM c WHERE nc > 0
)
SELECT doc_id,
    CAST(ci AS BIGINT) AS chunk_id,
    CAST(ci * {step} AS BIGINT) AS start_tok,
    CAST(LEAST(ci * {step} + {chunk}, n) AS BIGINT) AS end_tok,
    CAST(LEAST(ci * {step} + {chunk}, n) - ci * {step} AS BIGINT)
        AS n_chunk_tokens,
    array_to_string(tk[ci * {step} + 1 : LEAST(ci * {step} + {chunk}, n)],
                    ' ') AS chunk_text
FROM e"""


@register("corpus_chunks", _chunks_oracle())
def q_corpus_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token chunking (chunk 32, overlap 8) with per-chunk
    source spans (sparkfeat.corpus.chunk_documents) — one map-only
    expression pass, no shuffle/UDF; heavy docs explode into rows,
    never into one oversized array."""
    from sparkfeat.corpus import chunk_documents

    docs = _docs(spark, sf_dir)
    return chunk_documents(docs, chunk_tokens=32, overlap=8)


# ---------------------------------------------------------------------------
# BPE tokenizer induction (sparkfeat.bpe)
# ---------------------------------------------------------------------------

_BPE_SY_CTES = """wf AS (
    SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
    FROM (
        SELECT unnest(list_filter(
            regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) AS word
        FROM documents
    ) GROUP BY word
),
sy AS (
    SELECT word, freq,
        list_transform(generate_series(1, length(word)), i -> word[i])
            || ['</w>'] AS syms
    FROM wf
)"""


def _bpe_pairs_sql(rel: str) -> str:
    """Weighted adjacent-pair counts over a (freq, syms) relation."""
    return f"""SELECT p.a AS a, p.b AS b,
        CAST(SUM(freq) AS BIGINT) AS pair_freq
    FROM (
        SELECT freq,
            unnest(list_transform(generate_series(1, len(syms) - 1),
                                  i -> {{'a': syms[i], 'b': syms[i + 1]}})) AS p
        FROM {rel} WHERE len(syms) >= 2
    ) GROUP BY p.a, p.b"""


def _bpe_pair_counts_oracle() -> str:
    return f"WITH {_BPE_SY_CTES}\n{_bpe_pairs_sql('sy')}"


@register("bpe_pair_counts", _bpe_pair_counts_oracle())
def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 0 of BPE induction as a standalone query: distinct-word
    frequency table (the ONE corpus pass) → initial character symbols →
    weighted adjacent-pair counts (map-side-combined groupBy)."""
    from sparkfeat.bpe import bpe_pair_counts

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bpe_pair_counts(docs)


def _bpe_round_ctes(n_merges: int, final_rewrite: bool) -> list[str]:
    """CTE chain r0, (p_i, m_i, r_{i+1})* for the BPE merge loop; with
    ``final_rewrite`` the post-last-merge words table r{n_merges} is
    built too (the encode oracle needs it; the learn oracle does not)."""
    parts = [f"WITH {_BPE_SY_CTES},", "r0 AS (SELECT word, freq, syms FROM sy)"]
    sep = "chr(1)"
    for i in range(n_merges):
        parts.append(
            f""",
p{i} AS ({_bpe_pairs_sql(f'r{i}')}),
m{i} AS (SELECT a, b, pair_freq FROM p{i}
         ORDER BY pair_freq DESC, a, b LIMIT 1)"""
        )
        if i < n_merges - 1 or final_rewrite:
            parts.append(
                f""",
r{i + 1} AS (
    SELECT r.word, r.freq,
        list_transform(
            str_split(
                replace(
                    array_to_string(list_transform(r.syms,
                        s -> {sep} || s || {sep}), ''),
                    {sep} || m.a || {sep} || {sep} || m.b || {sep},
                    {sep} || m.a || m.b || {sep}),
                {sep} || {sep}),
            s -> trim(s, {sep})) AS syms
    FROM r{i} r, m{i} m
)"""
            )
    return parts


def _bpe_learn_oracle(n_merges: int = 6) -> str:
    """Replay train_bpe's full merge loop in SQL. The merge rewrite
    renders each symbol as chr(1)||s||chr(1) and string-replaces the
    doubly-delimited pair — every symbol carries BOTH its delimiters, so
    a match can never cross a symbol boundary or bind to a symbol whose
    text merely ends/starts with a/b, and left-to-right non-overlapping
    replace() reproduces the Spark fold's greedy semantics exactly
    (x x x --(x,x)--> [xx, x]). Ties broken (pair_freq DESC, a, b) on
    both engines, so the learned sequence is deterministic."""
    parts = _bpe_round_ctes(n_merges, final_rewrite=False)
    sel = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS BIGINT) AS merge_idx, a, b, pair_freq FROM m{i}"
        for i in range(n_merges)
    )
    return "".join(parts) + "\n" + sel


@register("bpe_learn", _bpe_learn_oracle())
def q_bpe_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six rounds of distributed BPE induction (sparkfeat.bpe.train_bpe):
    per round one partial-aggregated pair count over the cached
    distinct-word table, a ONE-ROW argmax to the driver, and a map-only
    fold rewrite (lineage cut per round). The oracle replays the whole
    loop in SQL via a boundary-safe string-replace merge, so the learned
    merge sequence — order, pairs, and weights — is checked end-to-end."""
    from sparkfeat.bpe import train_bpe

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = train_bpe(docs, n_merges=6)
    return spark.createDataFrame(
        [(i, a, b, pf) for i, (a, b, pf) in enumerate(merges)],
        "merge_idx long, a string, b string, pair_freq long",
    )


def _bpe_encode_oracle(n_merges: int = 6) -> str:
    """Derive the merge table IN SQL (the learn-oracle chain, one extra
    rewrite to get the post-merge word table) and apply it to every
    document: tokens joined back to their encoded word forms, flattened
    in token order. Checks that the Arrow kernel's rank-priority greedy
    encode equals replaying the merges in training order."""
    parts = _bpe_round_ctes(n_merges, final_rewrite=True)
    return "".join(parts) + f""",
dtk AS (
    SELECT doc_id,
        list_filter(regexp_split_to_array(lower(text), '\\s+'),
                    x -> x <> '') AS tk
    FROM documents
),
dt AS (
    SELECT d.doc_id, d.tk[u.i] AS term, u.i AS pos
    FROM dtk d, unnest(generate_series(1, len(d.tk))) AS u(i)
),
enc AS (
    SELECT dt.doc_id,
        flatten(list(r.syms ORDER BY dt.pos)) AS bpe
    FROM dt JOIN r{n_merges} r ON r.word = dt.term
    GROUP BY dt.doc_id
)
SELECT a.doc_id,
    COALESCE(array_to_string(e.bpe, ' '), '') AS bpe_text,
    CAST(COALESCE(len(e.bpe), 0) AS BIGINT) AS n_bpe_tokens
FROM (SELECT doc_id FROM documents) a LEFT JOIN enc e USING (doc_id)"""


@register("bpe_encode_corpus", _bpe_encode_oracle())
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train 6 BPE merges, then ENCODE the whole corpus with the learned
    table (sparkfeat.bpe.bpe_encode: Arrow-batched rank-priority greedy
    merge with a per-batch distinct-word memo cache — map-only, fuses
    into the scan). The oracle derives the SAME merge table in SQL and
    applies it in training order, pinning the standard equivalence of
    the two encode algorithms on every document."""
    from sparkfeat.bpe import bpe_encode, train_bpe

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = train_bpe(docs, n_merges=6)
    out = bpe_encode(docs, merges)
    return out.select(
        "doc_id",
        F.concat_ws(" ", "bpe_tokens").alias("bpe_text"),
        "n_bpe_tokens",
    )


_SFT_BUDGET = 12
_SFT_MAX_TURNS = 6

_SFT_PAIRS_ORACLE = f"""WITH {TRANSCRIPTS_CTE},
tok AS (
    SELECT conv_id, turn_idx, role, text,
        CAST(GREATEST(COALESCE(len(string_split(text, ' ')), 0), 0) AS BIGINT) AS tok
    FROM transcripts
),
cum AS (
    SELECT *,
        CAST(COALESCE(SUM(tok) OVER (
            PARTITION BY conv_id ORDER BY turn_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS pc
    FROM tok
),
tgt AS (SELECT * FROM cum WHERE role = 'assistant'),
ctx AS (
    SELECT t.conv_id, t.turn_idx,
        string_agg(j.role || ': ' || j.text, chr(10) ORDER BY j.turn_idx) AS prompt,
        CAST(COUNT(*) AS BIGINT) AS n_context_turns,
        CAST(SUM(j.tok) AS BIGINT) AS context_tokens
    FROM tgt t JOIN cum j
      ON j.conv_id = t.conv_id
     AND j.turn_idx < t.turn_idx
     AND j.turn_idx >= t.turn_idx - {_SFT_MAX_TURNS}
     AND j.pc >= t.pc - {_SFT_BUDGET}
    GROUP BY t.conv_id, t.turn_idx
)
SELECT t.conv_id, t.turn_idx,
    COALESCE(c.prompt, '') AS prompt,
    t.text AS response,
    CAST(COALESCE(c.n_context_turns, 0) AS BIGINT) AS n_context_turns,
    CAST(COALESCE(c.context_tokens, 0) AS BIGINT) AS context_tokens,
    t.tok AS response_tokens
FROM tgt t LEFT JOIN ctx c USING (conv_id, turn_idx)"""


@register("sft_pairs", _SFT_PAIRS_ORACLE)
def q_sft_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcripts → (prompt, response) SFT pairs: one per assistant
    turn, prompt = newest-first prior turns under a 12-token budget,
    at most 6 turns considered (sparkfeat.sft.sft_pairs — ONE conv_id
    exchange, bounded window frame, prefix-sum budget cut). The oracle
    replays the budget arithmetic with an explicit self-join, so the
    window-frame formulation is checked against the set-definition of
    the same semantics."""
    from sparkfeat.sft import sft_pairs

    tr = transcripts_from_events(spark, sf_dir)
    return sft_pairs(
        tr, token_budget=_SFT_BUDGET, max_context_turns=_SFT_MAX_TURNS
    )


def _lm_ppl_oracle() -> str:
    """Replay sparkfeat.lm.lm_perplexity in SQL: bigram stupid-backoff
    LM fit on the 80% md5-bucket slice (same positional hex expansion as
    corpus.hash_bucket), scored over ALL docs at the distinct
    (doc_id, prev, w) pair level, terciled with quantile_cont (the same
    type-7 linear interpolation Spark's exact `percentile` uses)."""
    fit_pred = f"{_hex_bucket_sql('doc_id', 25, 100)} < 80"
    return f"""WITH tk AS (
    SELECT doc_id,
        list_filter(regexp_split_to_array(lower(text), '\\s+'),
                    x -> x <> '') AS t
    FROM documents
),
tok AS (
    SELECT tk.doc_id, u.i AS pos, tk.t[u.i] AS w
    FROM tk, unnest(generate_series(1, len(tk.t))) AS u(i)
),
tok2 AS (
    SELECT doc_id, pos, w,
        lag(w) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
    FROM tok
),
ftok AS (SELECT * FROM tok2 WHERE {fit_pred}),
uni AS (SELECT w, COUNT(*) AS c1 FROM ftok GROUP BY w),
tot AS (SELECT CAST(SUM(c1) AS DOUBLE) AS n_total FROM uni),
big AS (
    SELECT prev, w, COUNT(*) AS c2 FROM ftok
    WHERE prev IS NOT NULL GROUP BY prev, w
),
pairs AS (
    SELECT doc_id, prev, w, COUNT(*) AS k FROM tok2
    GROUP BY doc_id, prev, w
),
scored AS (
    SELECT p.doc_id, p.k,
        CASE
            WHEN p.prev IS NULL
                THEN ln(COALESCE(uw.c1, 1) / t.n_total)
            WHEN b.c2 IS NOT NULL
                THEN ln(b.c2 * 1.0 / up.c1)
            ELSE ln(0.4 * COALESCE(uw.c1, 1) / t.n_total)
        END AS lp
    FROM pairs p
    LEFT JOIN uni uw ON uw.w = p.w
    LEFT JOIN uni up ON up.w = p.prev
    LEFT JOIN big b ON b.prev = p.prev AND b.w = p.w
    CROSS JOIN tot t
),
per_doc AS (
    SELECT doc_id, SUM(k * lp) AS lp_sum,
        CAST(SUM(k) AS BIGINT) AS n_tokens
    FROM scored GROUP BY doc_id
),
pd2 AS (SELECT *, exp(-lp_sum / n_tokens) AS ppl FROM per_doc),
thr AS (
    SELECT ROUND(quantile_cont(ppl, 0.3333333333333333), 6) AS t1,
           ROUND(quantile_cont(ppl, 0.6666666666666666), 6) AS t2
    FROM pd2
)
SELECT d.doc_id,
    CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens,
    ROUND(p.lp_sum, 6) AS logprob,
    ROUND(p.ppl, 6) AS ppl,
    CASE WHEN p.ppl IS NULL THEN NULL
         WHEN ROUND(p.ppl, 6) <= t.t1 THEN 0
         WHEN ROUND(p.ppl, 6) <= t.t2 THEN 1
         ELSE 2 END AS ppl_bucket
FROM documents d LEFT JOIN pd2 p USING (doc_id) CROSS JOIN thr t"""


@register("doc_lm_perplexity", _lm_ppl_oracle())
def q_doc_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style corpus scoring: bigram stupid-backoff LM fit on the
    80% md5-bucket slice, every document scored + terciled into
    head/middle/tail (sparkfeat.lm.lm_perplexity). The held-out fit
    makes both the alpha-backoff (unseen bigram) and the OOV count-1
    floor real on this corpus, so the oracle checks every branch of the
    scoring CASE, the Zipf pair-level aggregation, and the exact
    percentile terciles."""
    from sparkfeat.corpus import hash_bucket
    from sparkfeat.lm import lm_perplexity

    docs = _docs(spark, sf_dir)
    fit = docs.where(hash_bucket("doc_id", start=25, buckets=100) < 80)
    return lm_perplexity(docs, fit_docs=fit)


def _dsir_oracle(n_buckets: int = 256) -> str:
    """Replay sparkfeat.dsir.dsir_logweights in SQL: unigram+bigram
    explode, md5 positional-hex bucket (same expansion as
    corpus.hash_bucket), add-one-smoothed target(lang='en')/raw log
    ratio per bucket, multiplicity-weighted per-doc sum."""
    bexpr = _hex_bucket_sql("gram", 25, n_buckets, hexpr="md5(gram)")
    nb = float(n_buckets)
    return f"""WITH tk AS (
    SELECT doc_id, lang,
        list_filter(regexp_split_to_array(lower(text), '\\s+'),
                    x -> x <> '') AS t
    FROM documents
),
gr AS (
    SELECT tk.doc_id, tk.lang, tk.t[u.i] AS gram
    FROM tk, unnest(generate_series(1, len(tk.t))) AS u(i)
    UNION ALL
    SELECT tk.doc_id, tk.lang, tk.t[u.i] || ' ' || tk.t[u.i + 1]
    FROM tk, unnest(generate_series(1, len(tk.t) - 1)) AS u(i)
),
bk AS (SELECT doc_id, lang, {bexpr} AS b FROM gr),
df_ AS (SELECT doc_id, lang, b, COUNT(*) AS k FROM bk GROUP BY doc_id, lang, b),
tgt AS (SELECT b, SUM(k) AS ct FROM df_ WHERE lang = 'en' GROUP BY b),
raw AS (SELECT b, SUM(k) AS cr FROM df_ GROUP BY b),
tot AS (
    SELECT CAST((SELECT SUM(ct) FROM tgt) AS DOUBLE) AS t_tot,
           CAST((SELECT SUM(cr) FROM raw) AS DOUBLE) AS r_tot
),
ratio AS (
    SELECT raw.b,
        ln((COALESCE(tgt.ct, 0) + 1) / (tot.t_tot + {nb}))
      - ln((raw.cr + 1) / (tot.r_tot + {nb})) AS lr
    FROM raw LEFT JOIN tgt ON tgt.b = raw.b CROSS JOIN tot
),
per_doc AS (
    SELECT d.doc_id,
        CAST(SUM(d.k) AS BIGINT) AS n_grams,
        SUM(d.k * r.lr) AS lw
    FROM df_ d JOIN ratio r ON r.b = d.b
    GROUP BY d.doc_id
)
SELECT docs.doc_id,
    CAST(COALESCE(p.n_grams, 0) AS BIGINT) AS n_grams,
    ROUND(p.lw, 6) AS dsir_logweight
FROM documents docs LEFT JOIN per_doc p USING (doc_id)"""


@register("dsir_weights", _dsir_oracle())
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): hashed unigram+bigram
    features, target = the lang='en' slice, raw = the whole corpus;
    per-doc log weight = Σ k·(ln p_target − ln p_raw) with add-one
    smoothing over 256 md5 buckets (sparkfeat.dsir.dsir_logweights —
    bucket tables broadcast by construction, map-side scoring)."""
    from sparkfeat.dsir import dsir_logweights

    docs = _docs(spark, sf_dir)
    return dsir_logweights(docs, docs.where(F.col("lang") == "en"))


def _semdedup_oracle() -> str:
    """SemDeDup closure: the IVF-bucketed embedding pair oracle as the
    edge set, brute-force transitive closure (recursive CTE), min-id
    label + cluster size + keep — the same shape as the MinHash
    neardup-clusters oracle but over the embedding table."""
    return f"""WITH RECURSIVE pairs AS (
    SELECT id_a, id_b FROM ({_EMB_PAIRS_ORACLE}) _ep
),
edges AS (
    SELECT id_a AS u, id_b AS v FROM pairs
    UNION
    SELECT id_b, id_a FROM pairs
),
reach(n, r) AS (
    SELECT u, u FROM edges
    UNION
    SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.n
),
lab AS (SELECT n AS vec_id, MIN(r) AS cluster_id FROM reach GROUP BY n),
allv AS (
    SELECT e.vec_id, COALESCE(lab.cluster_id, e.vec_id) AS cluster_id
    FROM embeddings e LEFT JOIN lab USING (vec_id)
),
sizes AS (
    SELECT cluster_id, COUNT(*) AS cluster_size
    FROM allv GROUP BY cluster_id
)
SELECT a.vec_id, a.cluster_id, s.cluster_size,
       a.vec_id = a.cluster_id AS keep
FROM allv a JOIN sizes s USING (cluster_id)"""


@register("semdedup_keeplist", _semdedup_oracle())
def q_semdedup_keeplist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): embedding-space duplicate groups →
    one kept representative per group (sparkfeat.dedup.semdedup_keeplist
    — IVF-bucketed candidate pairs + exact unit-cosine verify +
    large-star/small-star components; threshold 0.4 so groups are
    non-trivial on the synthetic embeddings, whose max pair cosine is
    ~0.51). The oracle replays pairs AND the transitive closure."""
    from sparkfeat.dedup import semdedup_keeplist

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return semdedup_keeplist(emb, threshold=0.4)


def _sft_pack_oracle(budget: int = 128) -> str:
    """The SFT capstone: the sft_pairs oracle feeds a rendered
    (prompt ⏎ response) example table keyed by a numeric total order
    derived from (conv_id, turn_idx); packing replays as one plain
    window cumsum (the engine side uses the two-level distributed
    prefix sum — same contract as training_dataset_manifest)."""
    return f"""WITH sp AS (
    SELECT * FROM ({_SFT_PAIRS_ORACLE}) _sp
),
ex AS (
    SELECT
        CAST(substr(conv_id, 2) AS BIGINT) * 1000000 + turn_idx AS example_id,
        prompt || chr(10) || response AS ex_text
    FROM sp
),
t AS (
    SELECT example_id,
        CAST(len(regexp_split_to_array(ex_text, '\\s+')) AS BIGINT) AS n_tok
    FROM ex
),
c AS (
    SELECT example_id, n_tok,
        CAST(SUM(n_tok) OVER (ORDER BY example_id ROWS BETWEEN UNBOUNDED
            PRECEDING AND CURRENT ROW) - n_tok AS BIGINT) AS tok_start
    FROM t
)
SELECT example_id, n_tok, tok_start,
    CAST(tok_start // {budget} AS BIGINT) AS seq_id,
    CAST(tok_start % {budget} AS BIGINT) AS seq_offset
FROM c"""


@register("sft_pack_manifest", _sft_pack_oracle())
def q_sft_pack_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcripts → SFT pairs → fixed-length training sequences, ONE
    job: sft_pairs extracts budget-truncated (prompt, response)
    examples, each is rendered prompt⏎response and keyed by a numeric
    total order embedded in (conv_id, turn_idx) (snowflake-style id —
    packing layout is id-order by contract), then pack_sequences lays
    the examples onto the global token axis with the two-level
    distributed prefix sum (no single-task window, no driver collect).
    This is the manifest an SFT sample-writer consumes. Composition of
    two already-verified stages; the oracle nests their replays."""
    from sparkfeat.corpus import pack_sequences
    from sparkfeat.sft import sft_pairs

    tr = transcripts_from_events(spark, sf_dir)
    pairs = sft_pairs(
        tr, token_budget=_SFT_BUDGET, max_context_turns=_SFT_MAX_TURNS
    )
    examples = pairs.select(
        (
            F.expr("CAST(substring(conv_id, 2) AS BIGINT)") * 1000000
            + F.col("turn_idx")
        ).alias("example_id"),
        F.concat_ws("\n", "prompt", "response").alias("ex_text"),
    )
    return pack_sequences(
        examples, budget=128, text_col="ex_text", id_col="example_id"
    )


_TOOL_CHAIN_ORACLE = f"""WITH {TRANSCRIPTS_CTE},
f AS (
    SELECT conv_id, turn_idx,
        tool IS NOT NULL AS t,
        role = 'assistant' AS a,
        tool = 'retry' AS rr,
        CASE WHEN tool IS NOT NULL THEN
            turn_idx - SUM(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END)
                OVER (PARTITION BY conv_id ORDER BY turn_idx
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        END AS isl
    FROM transcripts
),
st AS (
    SELECT conv_id, CAST(MAX(len) AS BIGINT) AS max_tool_streak
    FROM (
        SELECT conv_id, isl, COUNT(*) AS len
        FROM f WHERE t GROUP BY conv_id, isl
    ) GROUP BY conv_id
),
b AS (
    SELECT conv_id,
        CAST(COUNT(*) AS BIGINT) AS n_turns,
        CAST(SUM(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS n_tool_turns,
        CAST(SUM(CASE WHEN rr THEN 1 ELSE 0 END) AS BIGINT) AS n_retries,
        ROUND(SUM(CASE WHEN a THEN 1 ELSE 0 END) / COUNT(*), 6)
            AS assistant_frac
    FROM f GROUP BY conv_id
)
SELECT b.conv_id, b.n_turns, b.n_tool_turns, b.n_retries,
    CAST(COALESCE(st.max_tool_streak, 0) AS BIGINT) AS max_tool_streak,
    b.assistant_frac
FROM b LEFT JOIN st USING (conv_id)"""


@register("tool_chain_stats", _TOOL_CHAIN_ORACLE)
def q_tool_chain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation agent-behavior profile: tool-turn counts, retry
    counts, longest consecutive tool chain (gaps-and-islands over the
    conv_id window — O(1) state per row), assistant-turn fraction
    (sparkfeat.windows.tool_chain_stats). The curation filter an agent
    dataset runs before training ("drop retry-loop conversations")."""
    from sparkfeat.windows import tool_chain_stats

    return tool_chain_stats(transcripts_from_events(spark, sf_dir))


# SQL replay of conv._turn_term: 60-bit md5-derived per-turn term over
# the canonical '|'-joined turn string (turn_idx INSIDE the hash makes
# the SUM order-aware), summed as DECIMAL(38,0), emitted as VARCHAR.
_CONV_TERM_SQL = (
    "CAST(CAST(('0x' || substr(md5("
    "CAST(turn_idx AS VARCHAR) || '|' || COALESCE(role, '<null>') || '|' "
    "|| COALESCE(text, '<null>') || '|' || COALESCE(tool, '<null>')"
    "), 1, 15)) AS BIGINT) AS DECIMAL(38,0))"
)

_CONV_DEDUP_ORACLE = f"""WITH {TRANSCRIPTS_CTE},
t2 AS (
    SELECT * FROM transcripts
    UNION ALL
    SELECT conv_id || '_dup' AS conv_id, turn_idx, role, text, tool, ts
    FROM transcripts
    WHERE CAST(('0x' || substr(md5(conv_id), 5, 8)) AS BIGINT) % 4 = 0
),
sig AS (
    SELECT conv_id,
        CAST(CAST(SUM({_CONV_TERM_SQL}) AS DECIMAL(38,0)) AS VARCHAR)
            AS conv_sig,
        CAST(COUNT(*) AS BIGINT) AS n_turns
    FROM t2 GROUP BY conv_id
),
g AS (
    SELECT conv_sig, n_turns,
        CAST(COUNT(*) AS BIGINT) AS group_size,
        MIN(conv_id) AS keep_id
    FROM sig GROUP BY conv_sig, n_turns
)
SELECT sig.conv_id, sig.conv_sig, sig.n_turns, g.group_size,
    sig.conv_id = g.keep_id AS keep
FROM sig JOIN g USING (conv_sig, n_turns)"""


@register("conv_dedup_exact", _CONV_DEDUP_ORACLE)
def q_conv_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact CONVERSATION-level dedup keep-list
    (sparkfeat.conv.conv_dedup_exact): order-aware md5-sum signature
    with O(1) aggregation state per conversation — no collect_list, so
    a 10⁷-turn conversation costs the same buffer as a 3-turn one.
    The derived transcripts are all-unique, so the query plants
    duplicates deterministically in-plan: conversations in md5 bucket
    0-of-4 are cloned under ``conv_id || '_dup'`` (both engines replay
    the cloning), and the keep-list must call every clone a duplicate
    of its original and nothing else."""
    from sparkfeat.conv import conv_dedup_exact
    from sparkfeat.corpus import hash_bucket

    t = transcripts_from_events(spark, sf_dir)
    dupes = t.where(hash_bucket("conv_id", start=5, buckets=4) == 0).withColumn(
        "conv_id", F.concat(F.col("conv_id"), F.lit("_dup"))
    )
    return conv_dedup_exact(t.unionByName(dupes))


# Salted per-turn CONTENT hash (no turn_idx — conv.py:_content_term):
# 60 bits of md5('{perm}#role|text|tool') as BIGINT.
_CONV_CONTENT_HASH_SQL = (
    "CAST(('0x' || substr(md5(CAST(p.perm AS VARCHAR) || '#' || "
    "COALESCE(role, '<null>') || '|' || COALESCE(text, '<null>') || '|' "
    "|| COALESCE(tool, '<null>')), 1, 15)) AS BIGINT)"
)

# Planted near-dup corpus shared by the pair and cluster oracles:
# conversations in md5 bucket 0-of-4 cloned under conv_id || '_nd'
# minus their final turn (a tail-truncated re-ingest, Jaccard (n-1)/n).
_CONV_ND_T2_SQL = """mx AS (SELECT conv_id, MAX(turn_idx) AS mt FROM transcripts GROUP BY conv_id),
t2 AS (
    SELECT * FROM transcripts
    UNION ALL
    SELECT t.conv_id || '_nd' AS conv_id, t.turn_idx, t.role, t.text,
           t.tool, t.ts
    FROM transcripts t JOIN mx USING (conv_id)
    WHERE CAST(('0x' || substr(md5(t.conv_id), 5, 8)) AS BIGINT) % 4 = 0
      AND t.turn_idx < mx.mt
)"""

_CONV_NEARDUP_ORACLE = f"""WITH {TRANSCRIPTS_CTE},
{_CONV_ND_T2_SQL},
hv AS (
    SELECT conv_id, p.perm AS perm, {_CONV_CONTENT_HASH_SQL} AS h
    FROM t2, range(16) AS p(perm)
),
sig AS (
    SELECT conv_id, perm, MIN(h) AS m FROM hv GROUP BY conv_id, perm
),
nd AS (
    SELECT conv_id, CAST(COUNT(DISTINCT h) AS BIGINT) AS n
    FROM hv WHERE perm = 0 GROUP BY conv_id
),
banded AS (
    SELECT conv_id, CAST(perm / 4 AS INTEGER) AS band,
        md5(string_agg(CAST(m AS VARCHAR), ',' ORDER BY perm)) AS bkey
    FROM sig GROUP BY conv_id, CAST(perm / 4 AS INTEGER)
),
cand AS (
    SELECT DISTINCT a.conv_id AS conv_a, b.conv_id AS conv_b
    FROM banded a
    JOIN banded b ON a.band = b.band AND a.bkey = b.bkey
        AND a.conv_id < b.conv_id
    JOIN nd na ON na.conv_id = a.conv_id
    JOIN nd nb ON nb.conv_id = b.conv_id
    WHERE CAST(LEAST(na.n, nb.n) AS DOUBLE)
          >= 0.7 * GREATEST(na.n, nb.n)
),
th AS (SELECT DISTINCT conv_id, h FROM hv WHERE perm = 0),
inter AS (
    SELECT c.conv_a, c.conv_b, COUNT(*) AS i
    FROM cand c
    JOIN th ta ON ta.conv_id = c.conv_a
    JOIN th tb ON tb.conv_id = c.conv_b AND tb.h = ta.h
    GROUP BY c.conv_a, c.conv_b
),
est AS (
    SELECT c.conv_a, c.conv_b,
        SUM(CASE WHEN sa.m = sb.m THEN 1.0 ELSE 0.0 END) / 16.0 AS e
    FROM cand c
    JOIN sig sa ON sa.conv_id = c.conv_a
    JOIN sig sb ON sb.conv_id = c.conv_b AND sb.perm = sa.perm
    GROUP BY c.conv_a, c.conv_b
)
SELECT i.conv_a, i.conv_b, na.n AS n_turns_a, nb.n AS n_turns_b,
    ROUND(est.e, 6) AS est_jaccard,
    ROUND(CAST(i.i AS DOUBLE) / (na.n + nb.n - i.i), 6) AS jaccard
FROM inter i
JOIN nd na ON na.conv_id = i.conv_a
JOIN nd nb ON nb.conv_id = i.conv_b
JOIN est ON est.conv_a = i.conv_a AND est.conv_b = i.conv_b
WHERE CAST(i.i AS DOUBLE) / (na.n + nb.n - i.i) >= 0.7"""


def _conv_nd_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of ``_CONV_ND_T2_SQL``: transcripts plus their planted
    tail-truncated near-dup clones."""
    from pyspark.sql import Window

    from sparkfeat.corpus import hash_bucket

    t = transcripts_from_events(spark, sf_dir, spread=True)
    w = Window.partitionBy("conv_id")
    clones = (
        t.withColumn("_mt", F.max("turn_idx").over(w))
        .where(
            (hash_bucket("conv_id", start=5, buckets=4) == 0)
            & (F.col("turn_idx") < F.col("_mt"))
        )
        .withColumn("conv_id", F.concat(F.col("conv_id"), F.lit("_nd")))
        .drop("_mt")
    )
    return t.unionByName(clones)


@register("conv_neardup_pairs", _CONV_NEARDUP_ORACLE, driver=False)
def q_conv_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CONVERSATION pairs (sparkfeat.conv.conv_neardup_pairs):
    MinHash over the turn-content set where every signature component
    is a plain ``MIN`` aggregate — O(k) state per conversation, map-side
    combinable, no turn-set materialization — then LSH banding (16/4)
    and an exact join-shaped Jaccard verify at threshold 0.7.

    The derived transcripts are all-unique at conversation level, so
    near-dups are planted in-plan: conversations in md5 bucket 0-of-4
    are cloned under ``conv_id || '_nd'`` MINUS their final turn — a
    re-ingest-with-truncated-tail, Jaccard (n−1)/n. Both engines replay
    the cloning AND the full MinHash/banding pipeline, so the (shared)
    LSH recall behavior is bit-identical; the exact verify keeps every
    reported pair honest."""
    from sparkfeat.conv import conv_neardup_pairs

    pairs = conv_neardup_pairs(_conv_nd_base(spark, sf_dir), threshold=0.7)
    return pairs.select(
        "conv_a",
        "conv_b",
        F.col("n_turns_a").cast("bigint").alias("n_turns_a"),
        F.col("n_turns_b").cast("bigint").alias("n_turns_b"),
        _r(F.col("est_jaccard")).alias("est_jaccard"),
        _r(F.col("jaccard")).alias("jaccard"),
    )


@register("conv_neardup_pairs_xx64", driver=False)
def q_conv_neardup_pairs_xx64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-path twin of ★conv_neardup_pairs: the xx64 hash
    family (one xxhash64 per (turn, perm) instead of an md5 hex
    round-trip — measured 1.4× faster end-to-end at sf0.1). No SQL
    oracle by design: xxhash64 is not replayable outside the JVM, and
    the two hash families may admit marginally different LSH candidate
    sets; tests/test_conv.py pins md5 ≡ xx64 on the verified pair set
    where LSH recall agrees, and the md5 twin carries the full DuckDB
    oracle. Registered rows-only so the bench can time the path users
    should run at scale."""
    from sparkfeat.conv import conv_neardup_pairs

    pairs = conv_neardup_pairs(
        _conv_nd_base(spark, sf_dir), threshold=0.7, method="xx64"
    )
    return pairs.select(
        "conv_a",
        "conv_b",
        F.col("n_turns_a").cast("bigint").alias("n_turns_a"),
        F.col("n_turns_b").cast("bigint").alias("n_turns_b"),
        _r(F.col("est_jaccard")).alias("est_jaccard"),
        _r(F.col("jaccard")).alias("jaccard"),
    )


_CONV_ND_CLUSTERS_ORACLE = f"""WITH RECURSIVE {TRANSCRIPTS_CTE},
{_CONV_ND_T2_SQL},
pairs AS (
    SELECT conv_a, conv_b FROM ({_CONV_NEARDUP_ORACLE}) _np
),
edges AS (
    SELECT conv_a AS u, conv_b AS v FROM pairs
    UNION
    SELECT conv_b, conv_a FROM pairs
),
reach(n, r) AS (
    SELECT u, u FROM edges
    UNION
    SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.n
),
lab AS (SELECT n AS conv_id, MIN(r) AS cluster_id FROM reach GROUP BY n),
allconvs AS (SELECT DISTINCT conv_id FROM t2),
alld AS (
    SELECT a.conv_id, COALESCE(lab.cluster_id, a.conv_id) AS cluster_id
    FROM allconvs a LEFT JOIN lab USING (conv_id)
),
sizes AS (
    SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
    FROM alld GROUP BY cluster_id
)
SELECT a.conv_id, a.cluster_id, s.cluster_size,
       a.conv_id = a.cluster_id AS keep
FROM alld a JOIN sizes s USING (cluster_id)"""


@register("conv_neardup_clusters", _CONV_ND_CLUSTERS_ORACLE, driver=False)
def q_conv_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation-level pairs → clusters → canonical keep-list: the
    MinHash near-dup pair graph from ★conv_neardup_pairs fed through
    the same large-star/small-star connected components as the
    document path (dedup.neardup_clusters is id-agnostic), one
    conversation kept per duplicate cluster. The oracle replays the
    closure with a recursive CTE over the identically-planted corpus —
    every clone must label into its original's cluster."""
    from sparkfeat.conv import conv_neardup_pairs
    from sparkfeat.dedup import neardup_clusters

    base = _conv_nd_base(spark, sf_dir)
    pairs = conv_neardup_pairs(base, threshold=0.7)
    convs = base.select("conv_id").distinct()
    return neardup_clusters(
        convs, pairs, id_col="conv_id", id_a="conv_a", id_b="conv_b"
    )


def _drift_sql(panel_sql: str, features: list[str]) -> str:
    """Generic DuckDB twin of ``drift.feature_drift`` over a first-half
    vs second-half time split of any panel query: ``panel_sql`` must
    emit a ``ts`` column plus the ``features`` columns. The split
    midpoint derives from one MIN/MAX epoch aggregate (replayed by the
    Spark side's ``_time_split_drift``)."""
    unions = "\n    UNION ALL\n    ".join(
        f"SELECT _w, '{f}' AS feature, CAST(\"{f}\" AS DOUBLE) AS value FROM w"
        for f in features
    )
    return f"""WITH src AS (SELECT * FROM ({panel_sql}) _panel),
b AS (SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx FROM src),
w AS (
    SELECT src.*,
        CASE WHEN epoch_us(ts) < CAST(FLOOR((mn + mx) / 2.0) AS BIGINT)
             THEN 'ref' ELSE 'cur' END AS _w
    FROM src, b
),
lng AS (
    {unions}
),
stats AS (
    SELECT feature,
        CAST(COUNT(CASE WHEN _w = 'ref' THEN value END) AS BIGINT) AS n_ref,
        CAST(COUNT(CASE WHEN _w = 'cur' THEN value END) AS BIGINT) AS n_cur,
        SUM(CASE WHEN _w = 'ref' AND value IS NULL THEN 1 ELSE 0 END) AS null_ref,
        SUM(CASE WHEN _w = 'cur' AND value IS NULL THEN 1 ELSE 0 END) AS null_cur,
        AVG(CASE WHEN _w = 'ref' THEN value END) AS mean_ref,
        AVG(CASE WHEN _w = 'cur' THEN value END) AS mean_cur,
        VAR_POP(CASE WHEN _w = 'ref' THEN value END) AS var_ref,
        VAR_POP(CASE WHEN _w = 'cur' THEN value END) AS var_cur,
        MIN(CASE WHEN _w = 'ref' THEN value END) AS vmin,
        MAX(CASE WHEN _w = 'ref' THEN value END) AS vmax
    FROM lng GROUP BY feature
),
cnts AS (
    SELECT l.feature,
        CASE WHEN s.vmax = s.vmin THEN 0
             ELSE GREATEST(0, LEAST(9, CAST(FLOOR(
                 (l.value - s.vmin) / ((s.vmax - s.vmin) / 10.0)
             ) AS INTEGER))) END AS bkt,
        SUM(CASE WHEN l._w = 'ref' THEN 1 ELSE 0 END) AS cr,
        SUM(CASE WHEN l._w = 'cur' THEN 1 ELSE 0 END) AS cc
    FROM lng l JOIN stats s USING (feature)
    WHERE l.value IS NOT NULL AND s.vmin IS NOT NULL
    GROUP BY 1, 2
),
psi AS (
    SELECT c.feature,
        SUM(((c.cr + 0.5) / (s.n_ref + 5.0) - (c.cc + 0.5) / (s.n_cur + 5.0))
            * LN(((c.cr + 0.5) / (s.n_ref + 5.0))
                 / ((c.cc + 0.5) / (s.n_cur + 5.0)))) AS psi
    FROM cnts c JOIN stats s USING (feature) GROUP BY c.feature
)
SELECT s.feature, s.n_ref, s.n_cur,
    ROUND(CAST(s.null_ref AS DOUBLE) / (s.n_ref + s.null_ref), 6) AS null_rate_ref,
    ROUND(CAST(s.null_cur AS DOUBLE) / (s.n_cur + s.null_cur), 6) AS null_rate_cur,
    ROUND(s.mean_ref, 6) AS mean_ref,
    ROUND(s.mean_cur, 6) AS mean_cur,
    ROUND(SQRT(s.var_ref), 6) AS std_ref,
    ROUND(SQRT(s.var_cur), 6) AS std_cur,
    ROUND((s.mean_cur - s.mean_ref) / SQRT((s.var_ref + s.var_cur) / 2.0), 6)
        AS smd,
    ROUND(psi.psi, 6) AS psi
FROM stats s JOIN psi USING (feature)"""


_DRIFT_ORACLE = _drift_sql(
    f"WITH {TRANSCRIPTS_CTE} SELECT *, {TURN_SIGNALS_SQL} FROM transcripts",
    ["text_len", "token_est", "is_tool"],
)


def _time_split_drift(panel: DataFrame, features: list[str]) -> DataFrame:
    """Spark twin of ``_drift_sql``: split ``panel`` at the midpoint of
    its ts range (one MIN/MAX aggregate riding a broadcast crossJoin —
    lazy, no driver collect) and run `drift.feature_drift`, rounding
    the float columns to the oracle convention."""
    from sparkfeat.drift import feature_drift

    us = F.unix_micros(F.col("ts").cast("timestamp"))
    bounds = panel.agg(F.min(us).alias("_mn"), F.max(us).alias("_mx"))
    mid = F.floor((F.col("_mn") + F.col("_mx")) / F.lit(2.0)).cast("long")
    base = panel.crossJoin(F.broadcast(bounds)).withColumn(
        "_window", F.when(us < mid, "ref").otherwise("cur")
    )
    out = feature_drift(base, features)
    return out.select(
        "feature",
        F.col("n_ref").cast("bigint").alias("n_ref"),
        F.col("n_cur").cast("bigint").alias("n_cur"),
        _r(F.col("null_rate_ref")).alias("null_rate_ref"),
        _r(F.col("null_rate_cur")).alias("null_rate_cur"),
        _r(F.col("mean_ref")).alias("mean_ref"),
        _r(F.col("mean_cur")).alias("mean_cur"),
        _r(F.col("std_ref")).alias("std_ref"),
        _r(F.col("std_cur")).alias("std_cur"),
        _r(F.col("smd")).alias("smd"),
        _r(F.col("psi")).alias("psi"),
    )


@register("feature_drift_psi", _DRIFT_ORACLE, driver=False)
def q_feature_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training/serving-skew monitor (sparkfeat.drift.feature_drift):
    PSI over reference-fitted equal-width bins + standardized mean
    difference + null rates per feature, between the first and second
    half of the transcript time range (the split midpoint derives from
    one MIN/MAX aggregate both engines replay). Scale shape: one melt
    (map-side explode), two tiny hash aggregates (state O(features ×
    bins)), one broadcast edges join — two scans of the panel at any
    row count, no windows, no collect."""
    sig = with_turn_signals(transcripts_from_events(spark, sf_dir))
    return _time_split_drift(sig, ["text_len", "token_est", "is_tool"])


_QPSI_FEATS = ["text_len", "token_est", "is_tool"]

_QPSI_UNIONS = "\n    UNION ALL\n    ".join(
    f"SELECT _w, '{f}' AS feature, CAST(\"{f}\" AS DOUBLE) AS value FROM w"
    for f in _QPSI_FEATS
)

# Quantile-PSI twin of _drift_sql: interior edges are exact
# linear-interp quantiles of the REFERENCE window (quantile_cont ≡
# Spark's exact percentile, the classify.fit_bins estimator), rounded
# to 6 decimals on BOTH engines before bucketing so the bucket
# boundary comparison is deterministic across engines; bucket = number
# of interior edges ≤ value (k edges ⇒ k+1 buckets).
_QUANTILE_DRIFT_ORACLE = f"""WITH src AS (
    SELECT * FROM (WITH {TRANSCRIPTS_CTE} SELECT *, {TURN_SIGNALS_SQL} FROM transcripts) _panel
),
b AS (SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx FROM src),
w AS (
    SELECT src.*,
        CASE WHEN epoch_us(ts) < CAST(FLOOR((mn + mx) / 2.0) AS BIGINT)
             THEN 'ref' ELSE 'cur' END AS _w
    FROM src, b
),
lng AS (
    {_QPSI_UNIONS}
),
ed AS (
    SELECT feature,
        list_transform(
            quantile_cont(value, [{", ".join(str(k / 10) for k in range(1, 10))}]),
            e -> ROUND(e, 6)
        ) AS edges
    FROM lng WHERE _w = 'ref' AND value IS NOT NULL GROUP BY feature
),
stats AS (
    SELECT feature,
        CAST(COUNT(CASE WHEN _w = 'ref' THEN value END) AS BIGINT) AS n_ref,
        CAST(COUNT(CASE WHEN _w = 'cur' THEN value END) AS BIGINT) AS n_cur
    FROM lng GROUP BY feature
),
cnts AS (
    SELECT l.feature,
        LEN(list_filter(e.edges, x -> x <= l.value)) AS bkt,
        SUM(CASE WHEN l._w = 'ref' THEN 1 ELSE 0 END) AS cr,
        SUM(CASE WHEN l._w = 'cur' THEN 1 ELSE 0 END) AS cc
    FROM lng l JOIN ed e USING (feature)
    WHERE l.value IS NOT NULL
    GROUP BY 1, 2
),
psi AS (
    SELECT c.feature,
        SUM(((c.cr + 0.5) / (s.n_ref + 5.0) - (c.cc + 0.5) / (s.n_cur + 5.0))
            * LN(((c.cr + 0.5) / (s.n_ref + 5.0))
                 / ((c.cc + 0.5) / (s.n_cur + 5.0)))) AS psi
    FROM cnts c JOIN stats s USING (feature) GROUP BY c.feature
)
SELECT s.feature, s.n_ref, s.n_cur, ROUND(p.psi, 6) AS psi
FROM stats s LEFT JOIN psi p USING (feature)"""


@register("quantile_drift_psi", _QUANTILE_DRIFT_ORACLE, driver=False)
def q_quantile_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-PSI drift (the industry-standard PSI variant): interior
    bin edges are the 9 exact linear-interp deciles of the REFERENCE
    window (drift.quantile_edges — one melt + one tiny groupBy, the
    same estimator as classify.fit_bins), fed to
    drift.feature_drift(edges=...). Edges are rounded to 6 decimals on
    both engines before bucketing so the boundary comparison is
    engine-deterministic. Scale shape: three scans of the panel (edge
    fit + moments + bucket counts), all aggregates with O(features ×
    bins) state, edges broadcast — no windows, no collect."""
    from sparkfeat.drift import feature_drift, quantile_edges

    panel = with_turn_signals(transcripts_from_events(spark, sf_dir))
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    bounds = panel.agg(F.min(us).alias("_mn"), F.max(us).alias("_mx"))
    mid = F.floor((F.col("_mn") + F.col("_mx")) / F.lit(2.0)).cast("long")
    base = panel.crossJoin(F.broadcast(bounds)).withColumn(
        "_window", F.when(us < mid, "ref").otherwise("cur")
    )
    edges = quantile_edges(
        base.where(F.col("_window") == "ref"), _QPSI_FEATS, bins=10
    ).select(
        "feature",
        F.transform("edges", lambda e: F.round(e, 6)).alias("edges"),
    )
    out = feature_drift(base, _QPSI_FEATS, edges=edges)
    return out.select(
        "feature",
        F.col("n_ref").cast("bigint").alias("n_ref"),
        F.col("n_cur").cast("bigint").alias("n_cur"),
        _r(F.col("psi")).alias("psi"),
    )


_FLAGSHIP_DRIFT_ORACLE = _drift_sql(
    _FLAGSHIP_ORACLE,
    ["text_len_lr", "text_len_vol", "text_len_stoch_k", "token_est_ker"],
)


@register("flagship_drift_psi", _FLAGSHIP_DRIFT_ORACLE, driver=False)
def q_flagship_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift monitor over the ACTUAL generated feature panel: the
    flagship point-in-time features (clipped log-return, rolling vol,
    stochastic %K, Kaufman ER) fed through `drift.feature_drift` on a
    first-half vs second-half time split — the production question
    ("did my TRAINING features move between snapshots?") asked of the
    engine's own output. Features are rounded to the 6-dp oracle
    convention BEFORE binning so bucket edges are engine-exact; the
    oracle replays the full flagship window pipeline and then the full
    drift pipeline in SQL. Nulls from warm-up windows (first turns of
    each conversation) land in the null-rate columns by design."""
    panel = q_flagship(spark, sf_dir, spread=True)
    return _time_split_drift(
        panel, ["text_len_lr", "text_len_vol", "text_len_stoch_k", "token_est_ker"]
    )


def _windowed_drift_sql(features: list[str], bins: int = 10) -> str:
    """DuckDB twin of `streaming.stream_feature_drift`'s algebra run as
    a batch over the second-half window stream, with the profile frozen
    on the first half: per (epoch-aligned hour, feature) the unrolled
    bin counts and the smoothed PSI."""
    melt_ref = "\n    UNION ALL\n    ".join(
        f"SELECT '{f}' AS feature, CAST({f} AS DOUBLE) AS value FROM ref"
        for f in features
    )
    melt_cur = "\n    UNION ALL\n    ".join(
        f"SELECT ts, '{f}' AS feature, CAST({f} AS DOUBLE) AS value FROM cur"
        for f in features
    )
    c_sums = ",\n        ".join(
        f"SUM(CASE WHEN bkt = {i} THEN 1 ELSE 0 END) AS c{i}" for i in range(bins)
    )
    q_sums = ",\n        ".join(
        f"SUM(CASE WHEN bkt = {i} THEN 1 ELSE 0 END) AS q{i}" for i in range(bins)
    )
    terms = " + ".join(
        f"((c{i} + 0.5) / (n_ref + {0.5 * bins}) - (q{i} + 0.5) / (n_cur + {0.5 * bins}))"
        f" * LN(((c{i} + 0.5) / (n_ref + {0.5 * bins}))"
        f" / ((q{i} + 0.5) / (n_cur + {0.5 * bins})))"
        for i in range(bins)
    )
    bucket = (
        "CASE WHEN value IS NULL THEN NULL"
        " WHEN _vmax = _vmin THEN 0"
        f" ELSE GREATEST(0, LEAST({bins - 1}, CAST(FLOOR("
        f"(value - _vmin) / ((_vmax - _vmin) / {float(bins)})) AS INTEGER))) END"
    )
    return f"""WITH {TRANSCRIPTS_CTE},
sig AS (SELECT *, {TURN_SIGNALS_SQL} FROM transcripts),
b AS (SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx FROM sig),
ref AS (SELECT sig.* FROM sig, b
        WHERE epoch_us(ts) < CAST(FLOOR((mn + mx) / 2.0) AS BIGINT)),
cur AS (SELECT sig.* FROM sig, b
        WHERE epoch_us(ts) >= CAST(FLOOR((mn + mx) / 2.0) AS BIGINT)),
lngr AS ({melt_ref}),
edges AS (
    SELECT feature, CAST(COUNT(value) AS BIGINT) AS n_ref,
        MIN(value) AS _vmin, MAX(value) AS _vmax
    FROM lngr GROUP BY feature
    HAVING MIN(value) IS NOT NULL
),
prof AS (
    SELECT l.feature,
        {c_sums}
    FROM (SELECT lngr.feature, {bucket} AS bkt
          FROM lngr JOIN edges USING (feature)
          WHERE value IS NOT NULL) l
    GROUP BY l.feature
),
lngc AS ({melt_cur}),
cb AS (
    SELECT epoch_us(ts) - (epoch_us(ts) % 3600000000) AS win_us,
        lngc.feature, {bucket} AS bkt
    FROM lngc JOIN edges USING (feature)
),
agg AS (
    SELECT win_us, feature,
        {q_sums},
        CAST(COUNT(bkt) AS BIGINT) AS n_cur,
        CAST(SUM(CASE WHEN bkt IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_null_cur
    FROM cb GROUP BY win_us, feature
)
SELECT make_timestamp(win_us) AS window_start,
    make_timestamp(win_us + 3600000000) AS window_end,
    agg.feature, n_cur, n_null_cur,
    ROUND({terms}, 6) AS psi
FROM agg JOIN prof USING (feature) JOIN edges USING (feature)"""


@register(
    "windowed_drift_psi",
    _windowed_drift_sql(["text_len", "token_est", "is_tool"]),
    driver=False,
)
def q_windowed_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming drift monitor's EXACT algebra run as a batch: the
    reference profile freezes on the first half of the time range
    (`drift.drift_profile`), then `streaming.stream_feature_drift` —
    whose watermark is a batch no-op — computes per-hour PSI over the
    second half. tests/test_drift.py pins availableNow-stream ≡ this
    batch plan window-for-window, so this oracle transitively covers
    the live streaming path at DuckDB-oracle grade."""
    from sparkfeat.drift import drift_profile
    from sparkfeat.streaming import stream_feature_drift

    feats = ["text_len", "token_est", "is_tool"]
    sig = with_turn_signals(transcripts_from_events(spark, sf_dir))
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    bounds = sig.agg(F.min(us).alias("_mn"), F.max(us).alias("_mx"))
    mid = F.floor((F.col("_mn") + F.col("_mx")) / F.lit(2.0)).cast("long")
    split = sig.crossJoin(F.broadcast(bounds))
    ref = split.where(us < mid).select("ts", *feats)
    cur = split.where(us >= mid).select("ts", *feats)
    out = stream_feature_drift(
        cur, drift_profile(ref, feats), feats, window="1 hour"
    )
    return out.select(
        "window_start",
        "window_end",
        "feature",
        F.col("n_cur").cast("bigint").alias("n_cur"),
        F.col("n_null_cur").cast("bigint").alias("n_null_cur"),
        _r(F.col("psi")).alias("psi"),
    )


_PREF_PAIRS_ORACLE = f"""WITH {TRANSCRIPTS_CTE},
f AS (
    SELECT conv_id, turn_idx AS retry_idx,
        LAST_VALUE(CASE WHEN role = 'user' THEN text END IGNORE NULLS)
            OVER (PARTITION BY conv_id ORDER BY turn_idx
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            AS prompt_text,
        text AS rejected_text,
        MIN(CASE WHEN tool IS DISTINCT FROM 'retry' THEN turn_idx END)
            OVER (PARTITION BY conv_id ORDER BY turn_idx
                  ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
            AS chosen_idx,
        FIRST_VALUE(CASE WHEN tool IS DISTINCT FROM 'retry' THEN role END
                    IGNORE NULLS)
            OVER (PARTITION BY conv_id ORDER BY turn_idx
                  ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
            AS chosen_role,
        FIRST_VALUE(CASE WHEN tool IS DISTINCT FROM 'retry' THEN text END
                    IGNORE NULLS)
            OVER (PARTITION BY conv_id ORDER BY turn_idx
                  ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
            AS chosen_text,
        tool = 'retry' AS r
    FROM transcripts
)
SELECT conv_id, retry_idx, prompt_text, rejected_text,
    CAST(chosen_idx AS INTEGER) AS chosen_idx, chosen_role, chosen_text
FROM f WHERE r AND chosen_idx IS NOT NULL"""


@register("preference_pairs", _PREF_PAIRS_ORACLE)
def q_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPO-style preference-pair mining from agent transcripts
    (sparkfeat.conv.preference_pairs): each retry-flagged turn is a
    rejected attempt, the first following non-retry turn the chosen
    resolution, the last preceding user turn the shared prompt —
    resolved entirely with ``first/last(..., ignorenulls)`` windows in
    ONE conv_id partitioning pass (no self-join, no collect)."""
    from sparkfeat.conv import preference_pairs

    return preference_pairs(transcripts_from_events(spark, sf_dir))


_RESEQ_ORACLE = f"""WITH {TRANSCRIPTS_CTE},
corrupted AS (
    SELECT * FROM transcripts
    WHERE CAST(('0x' || substr(md5(conv_id || ':' || CAST(turn_idx AS VARCHAR)), 9, 8))
          AS BIGINT) % 7 <> 0
)
SELECT conv_id, turn_idx,
    CAST(ROW_NUMBER() OVER w - 1 AS INTEGER) AS new_turn_idx,
    CAST(turn_idx - COALESCE(LAG(turn_idx) OVER w, -1) - 1 AS INTEGER)
        AS gap_before,
    COALESCE(ts < LAG(ts) OVER w, FALSE) AS ts_regressed
FROM corrupted
WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx, ts)"""


_CONV_LATENCY_ORACLE = f"""WITH {TRANSCRIPTS_CTE},
g AS (
    SELECT conv_id, epoch_us(ts) AS us,
        (epoch_us(ts) - LAG(epoch_us(ts)) OVER w) / 1000000.0 AS gap,
        CASE WHEN role = 'assistant' AND LAG(role) OVER w = 'user'
             THEN (epoch_us(ts) - LAG(epoch_us(ts)) OVER w) / 1000000.0
        END AS resp
    FROM transcripts
    WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
)
SELECT conv_id,
    ROUND((MAX(us) - MIN(us)) / 1000000.0, 6) AS duration_s,
    CAST(COUNT(*) AS BIGINT) AS n_turns,
    ROUND(quantile_cont(gap, 0.5), 6) AS median_gap_s,
    ROUND(quantile_cont(gap, 0.95), 6) AS p95_gap_s,
    ROUND(quantile_cont(resp, 0.5), 6) AS median_response_s,
    CAST(SUM(CASE WHEN resp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_responses
FROM g GROUP BY conv_id"""


@register("conv_latency_stats", _CONV_LATENCY_ORACLE, driver=False)
def q_conv_latency_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation timing profile
    (sparkfeat.windows.conv_latency_stats): duration, inter-turn gap
    median/p95, assistant answer latency — integer epoch-microsecond
    math end to end, exact percentile with a documented approx
    strategy for heavy-tailed conversations. EXTRA this round (slots
    taken); rotation rule 2 queues it IN for round 6."""
    from sparkfeat.windows import conv_latency_stats

    return conv_latency_stats(transcripts_from_events(spark, sf_dir))


_AGENT_CURATION_ORACLE = f"""WITH {TRANSCRIPTS_CTE},
t2 AS (
    SELECT * FROM transcripts
    UNION ALL
    SELECT conv_id || '_dup' AS conv_id, turn_idx, role, text, tool, ts
    FROM transcripts
    WHERE CAST(('0x' || substr(md5(conv_id), 5, 8)) AS BIGINT) % 4 = 0
),
sig AS (
    SELECT conv_id,
        CAST(CAST(SUM({_CONV_TERM_SQL}) AS DECIMAL(38,0)) AS VARCHAR)
            AS conv_sig,
        COUNT(*) AS n_turns,
        SUM(CASE WHEN tool = 'retry' THEN 1 ELSE 0 END) AS n_retries
    FROM t2 GROUP BY conv_id
),
kept AS (
    SELECT conv_id FROM sig
    WHERE conv_id = (
        SELECT MIN(s2.conv_id) FROM sig s2
        WHERE s2.conv_sig = sig.conv_sig AND s2.n_turns = sig.n_turns
    )
    AND n_retries <= 0.2 * n_turns
),
f AS (
    SELECT conv_id, turn_idx AS retry_idx,
        LAST_VALUE(CASE WHEN role = 'user' THEN text END IGNORE NULLS)
            OVER (PARTITION BY conv_id ORDER BY turn_idx
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            AS prompt_text,
        text AS rejected_text,
        MIN(CASE WHEN tool IS DISTINCT FROM 'retry' THEN turn_idx END)
            OVER (PARTITION BY conv_id ORDER BY turn_idx
                  ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
            AS chosen_idx,
        FIRST_VALUE(CASE WHEN tool IS DISTINCT FROM 'retry' THEN role END
                    IGNORE NULLS)
            OVER (PARTITION BY conv_id ORDER BY turn_idx
                  ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
            AS chosen_role,
        FIRST_VALUE(CASE WHEN tool IS DISTINCT FROM 'retry' THEN text END
                    IGNORE NULLS)
            OVER (PARTITION BY conv_id ORDER BY turn_idx
                  ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
            AS chosen_text,
        tool = 'retry' AS r
    FROM t2 WHERE conv_id IN (SELECT conv_id FROM kept)
)
SELECT conv_id, retry_idx, prompt_text, rejected_text,
    CAST(chosen_idx AS INTEGER) AS chosen_idx, chosen_role, chosen_text
FROM f WHERE r AND chosen_idx IS NOT NULL"""


@register("agent_curation_pairs", _AGENT_CURATION_ORACLE, driver=False)
def q_agent_curation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agent-dataset curation capstone — the end-to-end job an RLHF
    data team runs over raw agent transcripts, composed from three
    already-verified stages in ONE lazy plan:

    1. exact conversation dedup (order-aware O(1)-state signature;
       duplicates planted in-plan as in ★conv_dedup_exact so the stage
       has real work),
    2. retry-loop curation filter (drop conversations whose retry
       fraction exceeds 0.2 — the tool_chain_stats counters, fused
       into the same conv-level aggregate as the signature),
    3. DPO preference-pair mining over the surviving conversations.

    Scale shape: the conv-level verdict table (one row per
    conversation) broadcast-joins back to filter turns, then the
    windows run in the same conv_id partitioning — no global sort, no
    collect. Registered as a pytest-oracle EXTRA this round (the 50
    driver slots are taken); rotation rule 2 queues it IN for round 6.
    """
    from sparkfeat.conv import _turn_term, preference_pairs
    from sparkfeat.corpus import hash_bucket

    t = transcripts_from_events(spark, sf_dir)
    dupes = t.where(hash_bucket("conv_id", start=5, buckets=4) == 0).withColumn(
        "conv_id", F.concat(F.col("conv_id"), F.lit("_dup"))
    )
    t2 = t.unionByName(dupes)

    # conv_signature's sum-of-terms plus the retry counter, fused into
    # ONE conv-level aggregation (the filter needs both anyway).
    sig = t2.groupBy("conv_id").agg(
        F.sum(_turn_term("turn_idx", "role", "text", "tool"))
        .cast("decimal(38,0)")
        .cast("string")
        .alias("conv_sig"),
        F.count(F.lit(1)).alias("n_turns"),
        F.sum((F.col("tool") == "retry").cast("bigint")).alias("n_retries"),
    )
    keep_id = sig.groupBy("conv_sig", "n_turns").agg(
        F.min("conv_id").alias("_keep_id")
    )
    kept = (
        sig.join(keep_id, ["conv_sig", "n_turns"])
        .where(
            (F.col("conv_id") == F.col("_keep_id"))
            & (F.col("n_retries") <= 0.2 * F.col("n_turns"))
        )
        .select("conv_id")
    )
    survivors = t2.join(F.broadcast(kept), "conv_id")
    return preference_pairs(survivors)


@register("resequence_turns", _RESEQ_ORACLE)
def q_resequence_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turn-order integrity repair (sparkfeat.conv.resequence_turns):
    re-derive a dense 0-based turn order and flag gaps / timestamp
    regressions — the ingest audit the north rule's "stable turn
    ordering" invariant rests on. The driver corpus is clean, so the
    query first drops ~1/7 of turns via a deterministic md5 bucket
    (replayed identically in the oracle) and repairs the damage; every
    synthetic gap must be counted by ``gap_before`` and closed by
    ``new_turn_idx``. One window pass, per-partition row_number, never
    a global sort."""
    from sparkfeat.conv import resequence_turns
    from sparkfeat.corpus import hash_bucket

    t = transcripts_from_events(spark, sf_dir)
    key = F.concat(F.col("conv_id"), F.lit(":"), F.col("turn_idx").cast("string"))
    corrupted = t.where(hash_bucket(key, start=9, buckets=7) != 0)
    return resequence_turns(corrupted).select(
        "conv_id", "turn_idx", "new_turn_idx", "gap_before", "ts_regressed"
    )


# ---------------------------------------------------------------------------
# Embedding PCA / whitening (late round 5 — pytest-oracle slots; the
# driver-50 is frozen mid-round, the rotation overlay below applies the
# policy next round)
# ---------------------------------------------------------------------------

_COV_ORACLE = """WITH x AS (
    SELECT vec_id,
           generate_subscripts(embedding, 1) - 1 AS i,
           CAST(unnest(embedding) AS DOUBLE) AS xi
    FROM embeddings
)
SELECT CAST(a.i AS INT) AS i, CAST(b.i AS INT) AS j,
       ROUND(covar_pop(a.xi, b.xi), 6) AS cov
FROM x a JOIN x b ON a.vec_id = b.vec_id
GROUP BY 1, 2"""


@register("embedding_covariance", _COV_ORACLE, driver=False)
def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population covariance of the 64-dim embedding corpus, long form
    (d² rows) — the Arrow partial-moment production path (O(d²) state
    per task, one data pass); the expr twin is pytest-pinned equal and
    the DuckDB oracle replays `covar_pop` over the unnested pairs."""
    from sparkfeat.pca import covariance_long

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = covariance_long(emb, "embedding", method="arrow")
    return out.select("i", "j", _r(F.col("cov")).alias("cov"))


@register("embedding_pca_whiten", None, driver=False)
def q_embedding_pca_whiten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA-whitened projection (k=8) of every embedding — rows-only slot
    (the eigendecomposition is not SQL-expressible); the numeric
    guarantees (matches numpy eigh, per-component unit variance,
    orthonormal sign-pinned components) are pytest-pinned in
    tests/test_pca.py."""
    from sparkfeat.pca import pca_fit, pca_project

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    fit = pca_fit(emb, k=8)
    out = pca_project(emb, fit, out_col="pca", whiten=True)
    return out.select(
        "vec_id", *[F.round(F.col("pca")[c], 6).alias(f"pc{c}") for c in range(8)]
    )


_FEATURE_CORR_ORACLE = f"""{_SIG_CTE},
w8 AS (
    SELECT conv_id, turn_idx,
        COUNT(*) OVER ({_W} ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS n_in_win,
        list(text_len) OVER ({_W} ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS win
    FROM sig
),
x AS (
    SELECT conv_id, turn_idx,
           generate_subscripts(win, 1) - 1 AS i,
           CAST(unnest(win) AS DOUBLE) AS xi
    FROM w8 WHERE n_in_win = 8
)
SELECT CAST(a.i AS INT) AS i, CAST(b.i AS INT) AS j,
       ROUND(corr(a.xi, b.xi), 6) AS corr
FROM x a JOIN x b ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
GROUP BY 1, 2"""


_IVF_QUANT_ORACLE = (
    """WITH raw AS (
    SELECT vec_id,
           generate_subscripts(embedding, 1) AS i,
           CAST(unnest(embedding) AS DOUBLE) AS x
    FROM embeddings
),
sc AS (
    SELECT vec_id, MAX(ABS(x)) / 127.0 AS scale FROM raw GROUP BY vec_id
),
c AS (
    SELECT raw.vec_id,
           list(CAST(ROUND(raw.x / sc.scale) AS INT) * sc.scale
                ORDER BY raw.i) AS v
    FROM raw JOIN sc USING (vec_id) GROUP BY raw.vec_id
),
"""
    + _IVF_ORACLE.split("),\n", 1)[1]
)


@register("ann_ivf_quantized", _IVF_QUANT_ORACLE, driver=False)
def q_ann_ivf_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The int8-served ANN path: IVF top-k over DEQUANTIZED int8
    vectors (corpus, centroids and probes all quantized — exactly what
    an index serving from 4×-compressed RAM computes). Same
    centroids/params as ann_ivf_topk; the oracle is the identical IVF
    replay with its corpus CTE swapped for the quantize→dequantize
    rebuild, so a green row pins the full quantized serving math
    end-to-end (dequantized element doubles are bit-identical per
    engine — see embedding_quantize_audit)."""
    from sparkfeat.similarity import ivf_topk, quantize_int8

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dq = quantize_int8(emb).select(
        "vec_id",
        F.transform("q", lambda qi: qi.cast("double") * F.col("scale")).alias(
            "embedding"
        ),
    )
    probes = dq.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    out = ivf_topk(dq, probes, k=5, n_centroids=16, nprobe=4)
    return out.select("probe_id", "vec_id", _r(F.col("cosine")).alias("cosine"), "rk")


_SRC_CROSS_ORACLE = _minhash_oracle().replace(
    "SELECT id_a, id_b, est_jaccard FROM est WHERE est_jaccard >= 0.5",
    """, pairs AS (
    SELECT id_a, id_b, est_jaccard FROM est WHERE est_jaccard >= 0.5
),
src AS (SELECT doc_id, source FROM documents)
SELECT LEAST(a.source, b.source) AS source_a,
       GREATEST(a.source, b.source) AS source_b,
       COUNT(*) AS n_pairs,
       ROUND(AVG(est_jaccard), 6) AS mean_est_jaccard
FROM pairs p
JOIN src a ON p.id_a = a.doc_id
JOIN src b ON p.id_b = b.doc_id
GROUP BY 1, 2""",
)
# the replace target is the MinHash oracle's final SELECT; if that
# oracle changes shape, fail at import instead of shipping a
# half-replaced oracle
assert "pairs AS (" in _SRC_CROSS_ORACLE


@register("dedup_source_crossrates", _SRC_CROSS_ORACLE, driver=False)
def q_dedup_source_crossrates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which sources duplicate which: the MinHash near-dup pairs rolled
    up to an unordered source×source matrix (pair count + mean
    estimated Jaccard) — the crawl-snapshot provenance audit a corpus
    curator reads before deciding which source to drop. The pair table
    is the small side BY CONSTRUCTION (post-LSH survivors), so both
    provenance lookups broadcast it against the column-pruned
    (doc_id, source) scan — the 100 TB corpus is never shuffled. The
    oracle extends the bit-exact MinHash replay with the same rollup."""
    from sparkfeat.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = minhash_lsh_pairs(docs, num_perm=64, bands=16, shingle_n=2).filter(
        F.col("est_jaccard") >= 0.5
    )
    src = docs.select("doc_id", "source")
    j = (
        src.join(
            F.broadcast(pairs), src["doc_id"] == pairs["id_a"], "inner"
        )
        .select("id_a", "id_b", "est_jaccard", F.col("source").alias("_sa"))
        .alias("l")
    )
    j2 = src.join(F.broadcast(j), src["doc_id"] == j["id_b"], "inner").select(
        "_sa", F.col("source").alias("_sb"), "est_jaccard"
    )
    return j2.groupBy(
        F.least("_sa", "_sb").alias("source_a"),
        F.greatest("_sa", "_sb").alias("source_b"),
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        _r(F.avg("est_jaccard")).alias("mean_est_jaccard"),
    )


_EVAL_SAMPLE_ORACLE = """WITH keyed AS (
    SELECT lang, doc_id,
           md5('0' || ':' || CAST(doc_id AS VARCHAR)) AS key
    FROM documents
),
r AS (
    SELECT lang, doc_id,
           ROW_NUMBER() OVER (PARTITION BY lang ORDER BY key, doc_id)
               AS sample_rank
    FROM keyed
)
SELECT lang, doc_id, CAST(sample_rank AS INT) AS sample_rank
FROM r WHERE sample_rank <= 25"""


@register("corpus_eval_sample", _EVAL_SAMPLE_ORACLE, driver=False)
def q_corpus_eval_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic exact-25-per-language eval sample: md5(seed:id)
    order, two-phase per-group top-k (no single-task window over a
    whole language). The oracle is the single plain window the
    two-phase plan must equal — the same
    distributed-vs-definitional pinning as pack_sequences."""
    from sparkfeat.corpus import eval_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return eval_sample(docs, k=25, group_col="lang", seed="0", shards=8)


_EMB_DRIFT_ORACLE = f"""WITH e AS (
    SELECT vec_id,
           CASE WHEN {_hex_bucket_sql("vec_id", 25, 100)} < 80
                THEN 'ref' ELSE 'cur' END AS g,
           generate_subscripts(embedding, 1) - 1 AS i,
           CAST(unnest(embedding) AS DOUBLE) AS x
    FROM embeddings
),
per AS (
    SELECT g, CAST(i AS INT) AS i, AVG(x) AS mean, var_pop(x) AS var
    FROM e GROUP BY 1, 2
),
piv AS (
    SELECT i,
        MAX(CASE WHEN g = 'ref' THEN mean END) AS mean_ref,
        MAX(CASE WHEN g = 'cur' THEN mean END) AS mean_cur,
        MAX(CASE WHEN g = 'ref' THEN var END) AS var_ref,
        MAX(CASE WHEN g = 'cur' THEN var END) AS var_cur
    FROM per GROUP BY 1
)
SELECT i,
    ROUND(mean_ref, 6) AS mean_ref,
    ROUND(mean_cur, 6) AS mean_cur,
    ROUND(ABS(mean_cur - mean_ref), 6) AS mean_shift,
    ROUND(var_ref, 6) AS var_ref,
    ROUND(var_cur, 6) AS var_cur,
    ROUND(CASE WHEN var_ref > 0 THEN var_cur / var_ref END, 6) AS var_ratio
FROM piv"""


@register("embedding_drift", _EMB_DRIFT_ORACLE, driver=False)
def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift audit: per-dimension mean shift and
    population-variance ratio between an 80% reference md5-bucket slice
    and the 20% 'new crawl' slice — the vector-space companion to the
    scalar drift monitors. ONE union pass (grouped Arrow moment
    kernel, O(slices×d²) task state), stats pivot out of the two
    moment rows in-plan; the oracle replays slice tagging, AVG and
    var_pop per (slice, dim) and the same pivot."""
    from sparkfeat.corpus import hash_bucket
    from sparkfeat.pca import embedding_drift_stats

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    b = hash_bucket("vec_id", start=25, buckets=100)
    out = embedding_drift_stats(
        emb.filter(b < 80), emb.filter(b >= 80), "embedding"
    )
    return out.select(
        "i",
        *[
            _r(F.col(c)).alias(c)
            for c in (
                "mean_ref",
                "mean_cur",
                "mean_shift",
                "var_ref",
                "var_cur",
                "var_ratio",
            )
        ],
    )


_QUANT_ORACLE = """WITH e AS (
    SELECT vec_id,
           generate_subscripts(embedding, 1) AS i,
           CAST(unnest(embedding) AS DOUBLE) AS x
    FROM embeddings
),
s AS (
    SELECT vec_id, MAX(ABS(x)) / 127.0 AS scale FROM e GROUP BY vec_id
),
q AS (
    SELECT e.vec_id, e.x,
           CAST(ROUND(e.x / s.scale) AS INT) * s.scale AS dq
    FROM e JOIN s USING (vec_id)
    WHERE s.scale > 0
),
agg AS (
    SELECT vec_id,
           SUM(x * dq) AS dot,
           SQRT(SUM(x * x)) AS nv,
           SQRT(SUM(dq * dq)) AS nq,
           MAX(ABS(x - dq)) AS maxerr
    FROM q GROUP BY vec_id
)
SELECT a.vec_id,
       ROUND(s.scale, 6) AS scale,
       ROUND(a.dot / (a.nv * a.nq), 6) AS cos_sim,
       ROUND(a.maxerr, 6) AS max_abs_err
FROM agg a JOIN s USING (vec_id)"""


@register("embedding_quantize_audit", _QUANT_ORACLE, driver=False)
def q_embedding_quantize_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization round-trip audit — the gate before
    serving a 4×-smaller ANN index: per vector, the dequantized-vs-
    exact cosine and the max element error (≤ scale/2 by
    construction). Map-only expression work that fuses into the scan;
    the oracle replays scale, ties-away-from-zero rounding, dequant
    and the cosine from the unnested elements. Every element-level
    double (scale, dq, |x−dq|) is bit-identical on both engines —
    only the final sums differ by accumulation order, far inside the
    6-dp round."""
    from sparkfeat.similarity import quantize_audit

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = quantize_audit(emb, "vec_id", "embedding")
    return out.select(
        "vec_id",
        _r(F.col("scale")).alias("scale"),
        _r(F.col("cos_sim")).alias("cos_sim"),
        _r(F.col("max_abs_err")).alias("max_abs_err"),
    )


@register("embedding_pca_recon_error", None, driver=False)
def q_embedding_pca_recon_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector PCA compression-error audit: project to k=8, invert,
    report the reconstruction MSE — the number a curation pipeline
    checks before swapping raw embeddings for compressed ones.
    Rows-only slot (eigh); the numeric guarantees (k=d round trip is
    the identity, mean MSE == tail eigenvalue mass) are pytest-pinned
    in tests/test_pca.py."""
    from sparkfeat.pca import pca_fit, pca_inverse, pca_project

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    fit = pca_fit(emb, k=8)
    proj = pca_project(emb, fit, out_col="pca", whiten=True)
    rec = pca_inverse(proj, fit, proj_col="pca", out_col="recon", whiten=True)
    v = F.col("embedding").cast("array<double>")
    sqerr = F.aggregate(
        F.zip_with(v, F.col("recon"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return rec.select(
        "vec_id", _r(sqerr / F.size("recon")).alias("recon_mse")
    )


@register("feature_corr_matrix", _FEATURE_CORR_ORACLE, driver=False)
def q_feature_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-lag correlation structure of the assembled training
    vectors: Pearson corr matrix (8×8, long form) over the trailing-8
    text_len windows from J6's `assemble_vectors` — the autocorrelation
    audit a feature pipeline runs before whitening model inputs. Same
    one-scan moment shape as embedding_covariance (every corr cell is
    element_at algebra on the ONE moment row); the oracle replays the
    window assembly and SQL `corr` (≡ population correlation — the
    n/(n−1) factors cancel). text_len is integer-valued, so the
    float32 vector cast is exact on both engines."""
    from sparkfeat.assemble import assemble_vectors
    from sparkfeat.pca import correlation_long

    sig = with_turn_signals(transcripts_from_events(spark, sf_dir))
    vec = assemble_vectors(sig, ["text_len"], length=8)
    out = correlation_long(vec, "text_len_vec")
    return out.select("i", "j", _r(F.col("corr")).alias("corr"))


def _semantic_decon_oracle(threshold: float = 0.42) -> str:
    bucket = _hex_bucket_sql("vec_id", 7, 100)
    return f"""WITH c AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
n AS (
    SELECT vec_id, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS u
    FROM c
),
split AS (SELECT vec_id, {bucket} < 10 AS is_bench FROM embeddings),
b AS (SELECT u FROM n JOIN split USING (vec_id) WHERE is_bench),
co AS (SELECT n.vec_id, n.u FROM n JOIN split USING (vec_id) WHERE NOT is_bench),
s AS (SELECT co.vec_id, list_dot_product(co.u, b.u) AS cos FROM co, b)
SELECT vec_id, ROUND(MAX(cos), 6) AS max_cosine,
    CAST(COUNT(*) FILTER (cos >= {threshold}) AS BIGINT) AS n_above,
    COUNT(*) FILTER (cos >= {threshold}) > 0 AS contaminated
FROM s GROUP BY vec_id"""


@register("corpus_decontaminate_semantic", _semantic_decon_oracle(), driver=False)
def q_corpus_decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic (embedding-space) decontamination — the paraphrase-
    robust complement of corpus_decontaminate's 8-gram sweep: corpus
    vectors whose cosine against ANY eval vector reaches 0.42 are
    flagged. The eval set is a deterministic 10% md5 bucket of vec_id
    (replayed positionally in the oracle); 0.42 sits ≥1.2e-3 from every
    pair cosine at both driver SFs, far beyond cross-engine float
    noise. Engine side is map-only over the corpus (packed broadcast
    bench, plan-asserted); the oracle replays normalize-then-dot with
    the same fold order as every other embedding oracle."""
    from sparkfeat.corpus import hash_bucket
    from sparkfeat.similarity import semantic_contamination

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    is_bench = hash_bucket("vec_id", start=7, buckets=100) < 10
    out = semantic_contamination(
        emb.filter(~is_bench), emb.filter(is_bench), threshold=0.42
    )
    return out.select(
        "vec_id",
        _r(F.col("max_cosine")).alias("max_cosine"),
        "n_above",
        "contaminated",
    )


_HARDNEG_ORACLE = """WITH c AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
n AS (
    SELECT vec_id, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS u
    FROM c
),
p AS (SELECT vec_id AS probe_id, u AS pu FROM n WHERE vec_id < 10),
s AS (
    SELECT p.probe_id, n.vec_id, list_dot_product(p.pu, n.u) AS cosine
    FROM n, p WHERE n.vec_id <> p.probe_id
),
banded AS (SELECT * FROM s WHERE cosine >= 0.15 AND cosine < 0.42),
r AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS rk
    FROM banded
)
SELECT probe_id, vec_id, ROUND(cosine, 6) AS cosine, CAST(rk AS INT) AS rk
FROM r WHERE rk <= 10"""


@register("ann_hard_negatives", _HARDNEG_ORACLE, driver=False)
def q_ann_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining (DPR/Contriever prep): per probe, top-10 by
    cosine INSIDE the band [0.15, 0.42) — informative negatives below
    the positive/near-dup ceiling. Both band edges sit ≥3e-5 from every
    probe-corpus cosine at the driver SFs (same fold order on both
    engines → cross-engine noise ~1e-15). Band filter is map-side,
    before the rank."""
    from sparkfeat.similarity import hard_negatives

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    out = hard_negatives(emb, probes, k=10, lo=0.15, hi=0.42)
    return out.select(
        "probe_id", "vec_id", _r(F.col("cosine")).alias("cosine"), "rk"
    )


_PMI_ORACLE = r"""WITH t AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS ws
  FROM documents
),
tok AS (
  SELECT doc_id, generate_subscripts(ws, 1) - 1 AS pos, unnest(ws) AS tok FROM t
),
l AS (SELECT doc_id, pos + off AS jpos, tok AS tok_a FROM tok, generate_series(1, 3) s(off)),
pr AS (SELECT l.tok_a, r.tok AS tok_b FROM l JOIN tok r ON l.doc_id = r.doc_id AND l.jpos = r.pos),
pc AS (SELECT tok_a, tok_b, COUNT(*) AS c_ab FROM pr GROUP BY tok_a, tok_b),
la AS (SELECT tok_a, SUM(c_ab) AS c_a FROM pc GROUP BY tok_a),
rb AS (SELECT tok_b, SUM(c_ab) AS c_b FROM pc GROUP BY tok_b),
tot AS (SELECT SUM(c_ab) AS p FROM pc),
sc AS (
  SELECT tok_a, tok_b, c_ab,
     ROUND(ln(CAST(c_ab AS DOUBLE) * CAST(p AS DOUBLE) / (CAST(c_a AS DOUBLE) * CAST(c_b AS DOUBLE))), 6) AS pmi
  FROM pc JOIN la USING (tok_a) JOIN rb USING (tok_b), tot
  WHERE c_ab >= 5
),
r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY pmi DESC, tok_a, tok_b) AS rank FROM sc)
SELECT tok_a, tok_b, CAST(c_ab AS BIGINT) AS c_ab, pmi, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 100"""


@register("doc_pmi_topk", _PMI_ORACLE, driver=False)
def q_doc_pmi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide PMI collocation top-100 (window-3 skip-grams,
    min_count 5): pair generation is posexplode + offset explode + ONE
    (doc, position) equi-join — tokens × window rows, never n² — and
    top-k is the two-phase shard rank. PMI marginals come from the
    pair table itself (columns sum to the total exactly); pmi rounded
    6dp BEFORE ranking with a (tok_a, tok_b) tie-break. Verified
    bit-equal against the oracle at sf0.001 AND sf0.01 during
    development."""
    from sparkfeat.text import pmi_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return pmi_topk(docs, window=3, min_count=5, k=100)


def _curriculum_oracle(shards: int = 16, seed: str = "0") -> str:
    # global_pos = per-(stage, shard) offset + in-group pos, where the
    # offsets walk groups in (stage, shard) order — identically the
    # global rank under ORDER BY (stage, shard, skey, doc_id), which is
    # how the oracle replays the two-level offset join in one window.
    return f"""WITH s AS (
    SELECT doc_id,
        CASE WHEN n_chars < 400 THEN 0
             WHEN n_chars < 1200 THEN 1
             ELSE 2 END AS stage,
        md5('{seed}:' || CAST(doc_id AS VARCHAR)) AS skey
    FROM documents
),
b AS (
    SELECT doc_id, stage, skey,
        CAST({_hex_bucket_sql("doc_id", 1, shards, hexpr="skey")} AS INT)
            AS shard
    FROM s
)
SELECT doc_id, CAST(stage AS INT) AS stage, shard,
    CAST(ROW_NUMBER() OVER (PARTITION BY stage, shard
                            ORDER BY skey, doc_id) - 1 AS BIGINT) AS pos,
    CAST(ROW_NUMBER() OVER (ORDER BY stage, shard, skey, doc_id) - 1
         AS BIGINT) AS global_pos
FROM b"""


@register("corpus_curriculum_order", _curriculum_oracle(), driver=False)
def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum training order: stage docs easiest-first (here a
    deterministic length bucket standing in for a perplexity bucket),
    deterministically shuffled within each stage, with a single
    contiguous ``global_pos`` across stages from the broadcast
    per-(stage, shard) offset join. The oracle replays the md5 shuffle
    key, hex-bucket shard, per-(stage, shard) rank, AND the composed
    global position as one global window — so the offset-join algebra
    is hash-checked end to end, not just the in-group ranks."""
    from sparkfeat.corpus import curriculum_order

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "ppl_bucket",
        F.when(F.col("n_chars") < 400, 0)
        .when(F.col("n_chars") < 1200, 1)
        .otherwise(2),
    )
    return curriculum_order(docs, stage_col="ppl_bucket", shards=16, seed="0")


_LINE_DEDUP_ORACLE = """WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
  WHERE text IS NOT NULL
),
rw AS (
  SELECT doc_id,
    array_to_string(
      list_transform(range(1, CAST(ceil(len(ws) / 3.0) AS BIGINT) + 1),
                     i -> array_to_string(list_slice(ws, (i-1)*3+1, i*3), ' ')),
      chr(10)) AS t2
  FROM w
),
l AS (
  SELECT doc_id, generate_subscripts(ls, 1) AS pos, unnest(ls) AS line
  FROM (SELECT doc_id, string_split(t2, chr(10)) AS ls FROM rw)
),
k AS (
  SELECT doc_id, pos, line, md5(trim(line)) AS lkey,
         length(trim(line)) >= 10 AS elig
  FROM l
),
hot AS (SELECT lkey FROM k WHERE elig GROUP BY lkey HAVING COUNT(*) >= 5),
m AS (SELECT k.*, hot.lkey IS NOT NULL AS is_hot FROM k LEFT JOIN hot USING (lkey)),
r AS (
  SELECT doc_id,
    COALESCE(string_agg(CASE WHEN NOT is_hot THEN line END,
                        chr(10) ORDER BY pos), '') AS text,
    COUNT(*) AS nl,
    SUM(CASE WHEN is_hot THEN 1 ELSE 0 END) AS nr
  FROM m GROUP BY doc_id
)
SELECT d.doc_id, r.text,
  CAST(COALESCE(r.nl, 0) AS BIGINT) AS n_lines,
  CAST(COALESCE(r.nr, 0) AS BIGINT) AS n_removed,
  CASE WHEN r.nl > 0 THEN ROUND(CAST(r.nr AS DOUBLE) / r.nl, 6) END
    AS removed_frac
FROM documents d LEFT JOIN r USING (doc_id)"""


@register("corpus_line_dedup", _LINE_DEDUP_ORACLE, driver=False)
def q_corpus_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate line removal (CCNet / RefinedWeb
    exact line-dedup): any trimmed line occurring >= 5 times across the
    corpus is cut from every doc; lines under 10 chars never count.
    The synthetic corpus is single-line word soup, so the query prep
    deterministically re-wraps each doc into 3-word lines (~11% of
    line instances land in the hot set at sf0.01 — non-degenerate both
    ways) before calling the operator. The oracle replays the re-wrap,
    the trimmed-md5 key, the >= k hot set, and the in-order rebuild —
    the rebuilt TEXT itself is hash-compared."""
    from sparkfeat.corpus import dedup_lines

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ws = F.split(F.col("text"), " ")
    nl = F.ceil(F.size(ws) / F.lit(3.0)).cast("int")
    wrapped = docs.withColumn(
        "text",
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), nl),
                lambda i: F.array_join(F.slice(ws, (i - 1) * 3 + 1, F.lit(3)), " "),
            ),
            "\n",
        ),
    )
    return dedup_lines(wrapped, min_occurrences=5, min_chars=10)


#: repetition-plan driver query: weights/budget/max_epochs chosen so the
#: sf0.01 gate exercises EVERY path at once — src0 wants 3.77 epochs →
#: capped at 3.0 (frac 0), src1 lands 1 full + 0.75 fractional, src2
#: 1 + 0.17, src3 fractional-only (0.787), the other 16 sources absent
#: from the whitelist → excluded.
_EPOCH_W = {"src0": 0.5, "src1": 0.25, "src2": 0.15, "src3": 0.10}
_EPOCH_BUDGET = 60_000


def _epoch_oracle() -> str:
    total = sum(_EPOCH_W.values())
    want_case = " ".join(
        f"WHEN '{g}' THEN {w / total * _EPOCH_BUDGET!r}"
        for g, w in sorted(_EPOCH_W.items())
    )
    srcs = ", ".join(f"'{g}'" for g in sorted(_EPOCH_W))
    return f"""WITH g AS (
  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS tok
  FROM documents WHERE source IN ({srcs})
  GROUP BY source HAVING SUM(n_chars) > 0
),
p AS (
  SELECT source,
    LEAST(CASE source {want_case} END, 3.0 * CAST(tok AS DOUBLE))
      / CAST(tok AS DOUBLE) AS eps
  FROM g
),
q AS (
  SELECT source,
    CAST(FLOOR(eps) AS INT) AS n_epochs_full,
    CAST(FLOOR((eps - FLOOR(eps)) * 1000000) AS BIGINT) AS frac_ppm
  FROM p
),
e AS (
  SELECT d.doc_id, d.source, CAST(d.n_chars AS BIGINT) AS n_tok,
         q.n_epochs_full, q.frac_ppm, CAST(u.epoch AS INT) AS epoch
  FROM documents d
  JOIN q USING (source),
  LATERAL UNNEST(range(0, q.n_epochs_full
        + CASE WHEN q.frac_ppm > 0 THEN 1 ELSE 0 END)) AS u(epoch)
)
SELECT doc_id, source, n_tok, epoch,
  epoch = n_epochs_full AS is_frac, n_epochs_full, frac_ppm
FROM e
WHERE epoch < n_epochs_full
   OR {_hex_bucket_sql("doc_id", 17, 1_000_000)} < frac_ppm"""


@register("corpus_epoch_manifest", _epoch_oracle(), driver=False)
def q_corpus_epoch_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-constrained repetition manifest (Muennighoff et al. 2023):
    a 60k-token budget split 50/25/15/10 over four whitelisted sources,
    each share expressed in epochs of that source capped at 3 passes —
    full epochs expand every doc, the fractional last pass keeps docs
    by the deterministic md5 ppm threshold. The oracle replays the
    whole chain (group token sums, python-literal want, cap, floor
    split into full + ppm, lateral range explode, hash keep), and the
    manifest's plan fields are integers, so the hash check is exact."""
    from sparkfeat.corpus import epoch_expand

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return epoch_expand(
        docs,
        _EPOCH_W,
        _EPOCH_BUDGET,
        token_col="n_chars",
        group_col="source",
        max_epochs=3.0,
    )


def _probe_oracle() -> str:
    # The replaced-column determinants are written in EXACTLY _det3's
    # term order (sparkfeat/probe.py) — identical rounded moments in,
    # identical IEEE arithmetic, bit-identical weights out.
    bucket = _hex_bucket_sql("doc_id", 21, 100)
    return f"""WITH f AS (
  SELECT doc_id, lang,
    CAST(LEN(list_filter({_TOKS}, w -> w IN {_STOP_SQL})) AS DOUBLE)
        / LEN({_TOKS}) AS x1,
    LEAST(CAST(LENGTH(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
        / LEN({_TOKS}) / 8.0, 1.0) AS x2,
    CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
    ({bucket} < 50) AS is_seed
  FROM documents WHERE text IS NOT NULL
),
m AS (
  SELECT ROUND(CAST(COUNT(*) AS DOUBLE), 6) AS n,
         ROUND(SUM(x1), 6) AS s1, ROUND(SUM(x2), 6) AS s2,
         ROUND(SUM(x1*x1), 6) AS s11, ROUND(SUM(x1*x2), 6) AS s12,
         ROUND(SUM(x2*x2), 6) AS s22, ROUND(SUM(y), 6) AS sy,
         ROUND(SUM(x1*y), 6) AS sy1, ROUND(SUM(x2*y), 6) AS sy2
  FROM f WHERE is_seed
),
a AS (
  SELECT (n + 0.001) AS a00, s1 AS a01, s2 AS a02,
         s1 AS a10, (s11 + 0.001) AS a11, s12 AS a12,
         s2 AS a20, s12 AS a21, (s22 + 0.001) AS a22,
         sy AS b0, sy1 AS b1, sy2 AS b2, n
  FROM m
),
w AS (
  SELECT CAST(n AS BIGINT) AS n_seed,
    (b0*(a11*a22 - a12*a21) - a01*(b1*a22 - a12*b2)
       + a02*(b1*a21 - a11*b2)) / det AS w0,
    (a00*(b1*a22 - a12*b2) - b0*(a10*a22 - a12*a20)
       + a02*(a10*b2 - b1*a20)) / det AS w1,
    (a00*(a11*b2 - b1*a21) - a01*(a10*b2 - b1*a20)
       + b0*(a10*a21 - a11*a20)) / det AS w2
  FROM (SELECT *,
          (a00*(a11*a22 - a12*a21) - a01*(a10*a22 - a12*a20)
             + a02*(a10*a21 - a11*a20)) AS det
        FROM a)
)
SELECT f.doc_id, f.lang, ROUND(f.x1, 6) AS x1, ROUND(f.x2, 6) AS x2,
  f.is_seed, w.n_seed,
  ROUND(w.w0 + w.w1 * f.x1 + w.w2 * f.x2, 6) AS score,
  ROUND(w.w0, 6) AS w0, ROUND(w.w1, 6) AS w1, ROUND(w.w2, 6) AS w2
FROM f, w"""


@register("doc_quality_probe", _probe_oracle(), driver=False)
def q_doc_quality_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-plan closed-form linear probe (the CCNet 'fit a cheap scorer
    on a curated seed, score the whole crawl' move): ridge-fit
    English-ness from two bounded text stats (stopword ratio, capped
    avg word length) on a deterministic 50% md5 seed slice — the 3x3
    normal equations solved by Cramer cofactors ON THE MOMENT ROW, no
    driver math — then every doc scored via a broadcast one-row
    cross-join. The oracle replays moments (rounded 6dp before the
    solve, the canonicalization that makes the weights engine-exact),
    the cofactor arithmetic in _det3's exact term order, and the
    scoring; the constant w0/w1/w2 columns make the value hash verify
    the SOLVE, not just the dot product."""
    from sparkfeat import text as X
    from sparkfeat.corpus import hash_bucket
    from sparkfeat.probe import linear_probe_score

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
    )
    x1 = X.stopword_ratio("text")
    x2 = F.least(X.avg_word_len("text") / 8.0, F.lit(1.0))
    label = (F.col("lang") == "en").cast("double")
    seed = hash_bucket("doc_id", start=21, buckets=100) < 50
    out = linear_probe_score(docs, x1, x2, label, seed)
    return out.select(
        "doc_id",
        "lang",
        F.round(x1, 6).alias("x1"),
        F.round(x2, 6).alias("x2"),
        seed.alias("is_seed"),
        "n_seed",
        "score",
        "w0",
        "w1",
        "w2",
    )


def _hex_int12_sql(hexpr: str) -> str:
    """First 12 hex digits of a hex-string expression as a BIGINT (48
    bits — exact everywhere), expanded positionally like
    _hex_bucket_sql; the replay of sparkfeat.bloom's hash position."""
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr({hexpr}, {j + 1}, 1)) - 1)"
        f" * {16 ** (11 - j)}"
        for j in range(12)
    )
    return f"({terms})"


def _decontaminate_bloom_oracle(
    n: int = 3, bench_pct: int = 20, n_words: int = 128, n_hashes: int = 5
) -> str:
    gram = " || ' ' || ".join(f"ws[i+{k}]" if k else "ws[i]" for k in range(n))
    n_bits = n_words * 63
    md5_h1 = "md5('h1:' || gram)"
    md5_h2 = "md5('h2:' || gram)"
    h1 = f"({_hex_int12_sql(md5_h1)} % {n_bits})"
    h2 = f"({_hex_int12_sql(md5_h2)} % {n_bits - 1} + 1)"
    return f"""WITH h AS (
    SELECT doc_id, lower(text) AS lc, {_hex_bucket_sql("doc_id", 9, 1000)} AS bb
    FROM documents
),
w AS (
    SELECT doc_id, bb, regexp_split_to_array(lc, '\\s+') AS ws FROM h
),
gr AS (
    SELECT doc_id, bb,
        list_distinct(list_transform(generate_series(1, len(ws) - {n - 1}),
                                     i -> md5({gram}))) AS grams
    FROM w
),
bg AS (
    SELECT DISTINCT unnest(grams) AS gram FROM gr WHERE bb < {bench_pct}
),
bh AS (
    SELECT gram, {h1} AS h1, {h2} AS h2 FROM bg
),
bp AS (
    SELECT (h1 + i * h2) % {n_bits} AS pos
    FROM bh, generate_series(0, {n_hashes - 1}) s(i)
),
wt AS (
    SELECT CAST(pos // 63 AS INT) AS word_idx,
           bit_or(1::BIGINT << CAST(pos % 63 AS INT)) AS word
    FROM bp GROUP BY 1
),
corp AS (SELECT doc_id, grams FROM gr WHERE bb >= {bench_pct}),
x AS (SELECT doc_id, unnest(grams) AS gram FROM corp),
xh AS (
    SELECT doc_id, gram, {h1} AS h1, {h2} AS h2 FROM x
),
xp AS (
    SELECT doc_id, gram, i, (h1 + i * h2) % {n_bits} AS pos
    FROM xh, generate_series(0, {n_hashes - 1}) s(i)
),
xb AS (
    SELECT doc_id, gram,
        bool_and(COALESCE(
            (wt.word & (1::BIGINT << CAST(xp.pos % 63 AS INT))) != 0,
            FALSE)) AS hit
    FROM xp LEFT JOIN wt ON wt.word_idx = CAST(xp.pos // 63 AS INT)
    GROUP BY doc_id, gram
),
hb AS (
    SELECT doc_id, SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS n_hit_bloom
    FROM xb GROUP BY doc_id
)
SELECT corp.doc_id,
    CAST(len(grams) AS BIGINT) AS n_grams,
    CAST(COALESCE(n_hit_bloom, 0) AS BIGINT) AS n_hit_bloom,
    COALESCE(n_hit_bloom, 0) > 0 AS flagged
FROM corp LEFT JOIN hb USING (doc_id)"""


@register("corpus_decontaminate_bloom", _decontaminate_bloom_oracle(), driver=False)
def q_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corpus_decontaminate's scale path: the SAME 2% bench slice and
    3-gram keys, but the bench grams fold into an in-plan Bloom filter
    (128 words × 63 bits ≈ 10 bits/key at sf0.01, k=5 → ~1% FPR) and
    the corpus grams are gated map-only against the packed bits —
    bits broadcast where a 10⁹-gram string set couldn't. One-sided by
    construction: exact-contaminated docs are always flagged; the
    deterministic handful of false-positive grams lands identically on
    both engines (the oracle rebuilds the words via bit_or and probes
    with the same Kirsch–Mitzenmacher h1 + i·h2 positions from the
    same 12-hex-digit md5 integers), so the hash check covers the FPs
    too."""
    from sparkfeat.corpus import decontaminate_bloom, hash_bucket

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bb = hash_bucket("doc_id", start=9, buckets=1000)
    return decontaminate_bloom(
        docs.filter(bb >= 20),
        docs.filter(bb < 20),
        n=3,
        n_words=128,
        n_hashes=5,
    )


def _heavy_terms_oracle(
    k: int = 30, width: int = 1024, depth: int = 4, sample_pct: int = 25
) -> str:
    md5_c1 = "md5('c1:' || term)"
    md5_c2 = "md5('c2:' || term)"
    h1 = f"({_hex_int12_sql(md5_c1)} % {width})"
    h2 = f"({_hex_int12_sql(md5_c2)} % {width - 1} + 1)"
    return f"""WITH tok0 AS (
    SELECT {_hex_bucket_sql("doc_id", 17, 1000)} AS sb,
           unnest(regexp_split_to_array(lower(text), '\\s+')) AS term
    FROM documents
),
tok AS (SELECT * FROM tok0 WHERE term <> ''),
h AS (SELECT term, sb, {h1} AS h1, {h2} AS h2 FROM tok),
cells AS (
    SELECT (i * {width} + (h1 + i * h2) % {width}) AS cell,
           COUNT(*)::BIGINT AS cnt
    FROM h, generate_series(0, {depth - 1}) s(i)
    GROUP BY 1
),
cand AS (SELECT DISTINCT term, h1, h2 FROM h WHERE sb < {sample_pct * 10}),
est AS (
    SELECT term, MIN(COALESCE(cnt, 0)) AS est_count
    FROM (
        SELECT cand.term, cells.cnt
        FROM cand CROSS JOIN generate_series(0, {depth - 1}) s(i)
        LEFT JOIN cells
          ON cells.cell = i * {width} + (cand.h1 + i * cand.h2) % {width}
    ) GROUP BY term
)
SELECT term, CAST(est_count AS BIGINT) AS est_count
FROM est ORDER BY est_count DESC, term LIMIT {k}"""


@register("doc_heavy_terms", _heavy_terms_oracle(), driver=False)
def q_doc_heavy_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-30 terms via the in-plan count-min sketch
    (:mod:`sparkfeat.cms` — the frequency sibling of the Bloom gate):
    every token instance folds into a packed 1024×4 cell array whose
    build shuffles at most partitions × depth × width combined cells —
    NOT the term cardinality, which at 100 TB (~10¹¹ distinct n-grams)
    is what kills the exact groupBy — and a deterministic 25% md5 doc
    sample proposes candidates that the broadcast sketch scores
    map-only (sample proposes, sketch disposes). Width is deliberately
    tight at sf0.01 so real collisions occur: the oracle rebuilds the
    SAME cells from the same Kirsch–Mitzenmacher positions and 48-bit
    md5-prefix integers, so every overestimated count and every tie
    (est desc, term asc) hash-matches — the check covers the sketch's
    error behavior, not just its happy path. Estimates are one-sided
    (never under), so a true heavy hitter can never be ranked below
    its exact position; pytest pins top-k == exact top-k at generous
    width and the e·N/width bound at tight width."""
    from sparkfeat.cms import heavy_terms

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return heavy_terms(docs, k=30, width=1024, depth=4, sample_pct=25)


def _cluster_safe_split_oracle(train: float = 0.8, val: float = 0.1) -> str:
    t1, t2 = int(train * 1000), int((train + val) * 1000)
    return f"""WITH cl AS (SELECT * FROM ({_neardup_clusters_oracle()}) _cl),
b AS (
    SELECT doc_id, cluster_id, cluster_size,
           {_hex_bucket_sql("cluster_id", 25, 1000)} AS sb
    FROM cl
)
SELECT doc_id, cluster_id, cluster_size,
       CAST(sb AS INT) AS split_bucket,
       CASE WHEN sb < {t1} THEN 'train'
            WHEN sb < {t2} THEN 'val'
            ELSE 'test' END AS split
FROM b"""


@register("corpus_cluster_safe_split", _cluster_safe_split_oracle(), driver=False)
def q_cluster_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: assignment is hashed from the
    near-dup CLUSTER id (MinHash+LSH pairs → large-star/small-star
    connected components → smallest reachable doc id), never the doc id
    — a doc-level hash split strands ~2·p·(1−p) of every near-dup pair
    across the train/test fence, the classic eval-contamination
    failure. Nests with corpus_sample_split: the cluster id is hashed
    with the SAME bucket position and thresholds, and a singleton's
    cluster id is its own doc id, so only multi-doc-cluster members
    ever move. The oracle replays the full chain — recursive-CTE
    transitive closure of the same pair graph, then the same positional
    hex bucket on the winning cluster id — so the hash check covers
    both the component labels and the split arithmetic."""
    from sparkfeat.corpus import cluster_safe_split
    from sparkfeat.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = minhash_lsh_pairs(docs, num_perm=64, bands=16, shingle_n=2).filter(
        F.col("est_jaccard") >= 0.5
    )
    return cluster_safe_split(docs, pairs)


def _temperature_oracle(alpha: float = 0.3) -> str:
    return f"""WITH s AS (
    SELECT source, CAST(SUM(n_chars) AS BIGINT) AS tok_group
    FROM documents GROUP BY source HAVING SUM(n_chars) > 0
),
t AS (SELECT CAST(SUM(tok_group) AS BIGINT) AS tot FROM s),
p AS (
    SELECT source, tok_group,
           CAST(tok_group AS DOUBLE) / tot AS p_raw,
           ROUND(POW(CAST(tok_group AS DOUBLE) / tot, {alpha}), 9) AS w
    FROM s, t
),
z AS (SELECT SUM(w) AS z FROM p)
SELECT source, tok_group,
       ROUND(p_raw, 6) AS p_raw,
       ROUND(w / z, 6) AS q_temp,
       ROUND(w / z / p_raw, 6) AS oversample
FROM p, z"""


@register("corpus_temperature_mix", _temperature_oracle(), driver=False)
def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights (q ∝ p^0.3, the XLM-family
    source-sampling rule): DERIVES the per-source training mixture from
    the corpus's own token shares — the upstream of mixture_sample /
    epoch_plan, which consume such weights. Two one-row broadcast
    cross-joins around one tiny groupBy; the p^α terms are rounded to
    9 dp BEFORE the normalizing sum so both engines divide identical
    doubles (pow is the only libm call, canonicalized immediately).
    The hash check covers the share arithmetic end to end."""
    from sparkfeat.corpus import temperature_weights

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return temperature_weights(docs, alpha=0.3, token_col="n_chars")


def _shrink_oracle() -> str:
    # Variance-component arithmetic written in EXACTLY
    # probe.shrink_group_means' term order — identical rounded
    # per-group sums in, bit-identical shrinkage out.
    return f"""WITH f AS (
  SELECT source,
    CAST(LEN(list_filter({_TOKS}, w -> w IN {_STOP_SQL})) AS DOUBLE)
        / LEN({_TOKS}) AS v
  FROM documents WHERE text IS NOT NULL
),
per AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_i,
         ROUND(SUM(v), 6) AS s_i, ROUND(SUM(v * v), 6) AS ss_i
  FROM f GROUP BY source
),
g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(n_i) AS BIGINT) AS nt,
         CAST(SUM(n_i * n_i) AS BIGINT) AS nn,
         ROUND(SUM(s_i), 6) AS s,
         ROUND(SUM(ss_i - s_i * s_i / n_i), 6) AS ssw,
         ROUND(SUM(s_i * s_i / n_i), 6) AS q
  FROM per
),
st AS (
  SELECT s / nt AS mu, ssw / CAST(nt - k AS DOUBLE) AS msw,
    GREATEST(0.0,
      ((q - s * s / nt) / CAST(k - 1 AS DOUBLE)
         - ssw / CAST(nt - k AS DOUBLE))
      / ((CAST(nt AS DOUBLE) - nn / nt) / CAST(k - 1 AS DOUBLE))) AS tau2
  FROM g
)
SELECT per.source, per.n_i AS n_docs,
  ROUND(s_i / n_i, 6) AS mean_raw,
  ROUND(tau2 / (tau2 + msw / n_i), 6) AS shrink_b,
  ROUND(mu + tau2 / (tau2 + msw / n_i) * (s_i / n_i - mu), 6)
      AS mean_shrunk,
  ROUND(mu, 6) AS grand_mean
FROM per, st"""


@register("source_quality_shrunk", _shrink_oracle(), driver=False)
def q_source_quality_shrunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes per-source quality prior (James–Stein / one-way
    random-effects shrinkage): a web corpus has millions of domains,
    most contributing a handful of docs whose raw mean quality is
    noise — the posterior mean mu + B_i (m_i − mu) with
    B_i = tau² / (tau² + sigma²/n_i) collapses sparse sources toward
    the corpus mean and lets well-observed sources keep their signal
    (the RefinedWeb-style per-domain prior). Entirely in-plan: one
    groupBy(source) for sufficient stats, one one-row aggregate over
    the k source rows for the method-of-moments variance components,
    broadcast back — the corpus is scanned ONCE and only k rows ever
    re-flow. The oracle replays the per-group rounded sums, the
    expansion SSB = Q − S²/N, and the component arithmetic in the same
    term order; the constant grand_mean column makes the hash verify
    the global solve, not just the per-group map."""
    from sparkfeat import text as X
    from sparkfeat.probe import shrink_group_means

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
    )
    return shrink_group_means(docs, X.stopword_ratio("text"), "source")


def _probe_sc_ctes() -> str:
    # The shared probe-fit prefix (same moments, same Cramer term order
    # as _probe_oracle), ending at the scored stream `sc(y, s)`:
    # reused by the calibration (ECE) and rank-AUC oracles.
    bucket = _hex_bucket_sql("doc_id", 21, 100)
    return f"""WITH f AS (
  SELECT doc_id, lang,
    CAST(LEN(list_filter({_TOKS}, w -> w IN {_STOP_SQL})) AS DOUBLE)
        / LEN({_TOKS}) AS x1,
    LEAST(CAST(LENGTH(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
        / LEN({_TOKS}) / 8.0, 1.0) AS x2,
    CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
    ({bucket} < 50) AS is_seed
  FROM documents WHERE text IS NOT NULL
),
m AS (
  SELECT ROUND(CAST(COUNT(*) AS DOUBLE), 6) AS n,
         ROUND(SUM(x1), 6) AS s1, ROUND(SUM(x2), 6) AS s2,
         ROUND(SUM(x1*x1), 6) AS s11, ROUND(SUM(x1*x2), 6) AS s12,
         ROUND(SUM(x2*x2), 6) AS s22, ROUND(SUM(y), 6) AS sy,
         ROUND(SUM(x1*y), 6) AS sy1, ROUND(SUM(x2*y), 6) AS sy2
  FROM f WHERE is_seed
),
a AS (
  SELECT (n + 0.001) AS a00, s1 AS a01, s2 AS a02,
         s1 AS a10, (s11 + 0.001) AS a11, s12 AS a12,
         s2 AS a20, s12 AS a21, (s22 + 0.001) AS a22,
         sy AS b0, sy1 AS b1, sy2 AS b2
  FROM m
),
w AS (
  SELECT
    (b0*(a11*a22 - a12*a21) - a01*(b1*a22 - a12*b2)
       + a02*(b1*a21 - a11*b2)) / det AS w0,
    (a00*(b1*a22 - a12*b2) - b0*(a10*a22 - a12*a20)
       + a02*(a10*b2 - b1*a20)) / det AS w1,
    (a00*(a11*b2 - b1*a21) - a01*(a10*b2 - b1*a20)
       + b0*(a10*a21 - a11*a20)) / det AS w2
  FROM (SELECT *,
          (a00*(a11*a22 - a12*a21) - a01*(a10*a22 - a12*a20)
             + a02*(a10*a21 - a11*a20)) AS det
        FROM a)
),
sc AS (
  SELECT f.y, ROUND(w.w0 + w.w1 * f.x1 + w.w2 * f.x2, 6) AS s
  FROM f, w
)"""


def _calibration_oracle() -> str:
    # Embeds the shared probe-fit prefix, then replays
    # calibration_table's binning: rounded (lo, hi), NULLIF-guarded
    # equal-width bins, rounded per-bin sums, and the ECE fold — in
    # probe.calibration_table's exact arithmetic order.
    return _probe_sc_ctes() + """,
r AS (SELECT ROUND(MIN(s), 6) AS lo, ROUND(MAX(s), 6) AS hi FROM sc),
b AS (
  SELECT COALESCE(LEAST(9, GREATEST(0,
           CAST(FLOOR((s - lo) / NULLIF((hi - lo) / 10.0, 0))
                AS INTEGER))), 0) AS bin,
         s, y, lo, hi
  FROM sc, r
),
per AS (
  SELECT bin, lo, hi, CAST(COUNT(*) AS BIGINT) AS n_docs,
         ROUND(SUM(s), 6) AS ss, ROUND(SUM(y), 6) AS sl
  FROM b GROUP BY bin, lo, hi
),
p2 AS (
  SELECT bin, n_docs,
    ROUND(lo + bin * (hi - lo) / 10, 6) AS bin_lo,
    ROUND(lo + (bin + 1) * (hi - lo) / 10, 6) AS bin_hi,
    ROUND(ss / n_docs, 6) AS mean_score,
    ROUND(sl / n_docs, 6) AS frac_pos
  FROM per
),
e AS (SELECT ROUND(SUM(n_docs * ABS(mean_score - frac_pos))
                   / SUM(n_docs), 6) AS ece FROM p2)
SELECT p2.*, e.ece FROM p2, e"""


@register("probe_calibration", _calibration_oracle(), driver=False)
def q_probe_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability table + ECE for the quality probe — the acceptance
    check before probe scores gate a corpus: per equal-width score bin
    (min/max from one map-side aggregate, NO global sort — the reason
    quantile bins are avoided at 100 TB), the empirical positive rate
    vs the mean predicted score, plus the Guo et al. 2017 expected
    calibration error folded over the ≤10 bin rows and broadcast back
    as a constant column (the hash verifies the global ECE arithmetic,
    not just the per-bin means). The oracle embeds the full probe-fit
    replay (rounded moments, Cramer term order) and the exact binning
    arithmetic."""
    from sparkfeat import text as X
    from sparkfeat.corpus import hash_bucket
    from sparkfeat.probe import calibration_table, linear_probe_score

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
    )
    x1 = X.stopword_ratio("text")
    x2 = F.least(X.avg_word_len("text") / 8.0, F.lit(1.0))
    label = (F.col("lang") == "en").cast("double")
    seed = hash_bucket("doc_id", start=21, buckets=100) < 50
    scored = linear_probe_score(docs, x1, x2, label, seed)
    return calibration_table(scored, F.col("score"), label)


def _cumdistinct_oracle() -> str:
    def flag(col: str) -> str:
        return (
            f"CASE WHEN {col} IS NULL THEN 0 "
            f"WHEN LAG({col}) OVER (PARTITION BY conv_id "
            f"ORDER BY {col}, ts, turn_idx) IS NOT DISTINCT FROM {col} "
            f"THEN 0 ELSE 1 END"
        )

    return f"""WITH {TRANSCRIPTS_CTE},
f AS (
  SELECT conv_id, turn_idx, ts,
    {flag("tool")} AS ft,
    {flag("role")} AS fr,
    {flag("text")} AS fx
  FROM transcripts
)
SELECT conv_id, turn_idx,
  CAST(SUM(ft) OVER w AS INTEGER) AS n_distinct_tool,
  CAST(SUM(fr) OVER w AS INTEGER) AS n_distinct_role,
  CAST(SUM(fx) OVER w AS INTEGER) AS n_distinct_text
FROM f
WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx
             ROWS UNBOUNDED PRECEDING)"""


@register("conv_distinct_sofar", _cumdistinct_oracle(), driver=False)
def q_conv_distinct_sofar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct-count turn features (distinct tools / roles /
    texts seen so far per conversation) — the agent-telemetry staple,
    point-in-time by construction. NOT collect_set-over-window (O(n²)
    state on a 10⁶-turn agent loop) and NOT row_number over
    (conv, value) (a second full-stream exchange): first occurrences
    are lag-detected in a value-re-sorted pass of the SAME conv_id
    partitioning, then cumulative-summed chronologically — ONE hash
    exchange for all three features (zero on the bucketed table),
    plan-asserted. The oracle replays the block-boundary flags and the
    running sums; value-sort null placement provably cancels (each
    non-null block's first row flags 1 under either engine's null
    order)."""
    from sparkfeat.conv import cumulative_distinct
    from sparkfeat.schema import transcripts_from_events

    t = transcripts_from_events(spark, sf_dir)
    out = cumulative_distinct(t, "tool")
    out = cumulative_distinct(out, "role")
    out = cumulative_distinct(out, "text")
    return out.select(
        "conv_id", "turn_idx", "n_distinct_tool", "n_distinct_role",
        "n_distinct_text",
    )


def _trend_oracle(window: int = 6, min_periods: int = 3) -> str:
    return f"""WITH {TRANSCRIPTS_CTE},
s AS (
  SELECT conv_id, turn_idx, ts,
    CAST(LENGTH(text) AS DOUBLE) AS y,
    CAST(ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY ts, turn_idx)
         AS DOUBLE) AS x
  FROM transcripts
),
m AS (
  SELECT conv_id, turn_idx,
    CAST(COUNT(y) OVER w AS DOUBLE) AS n,
    SUM(CASE WHEN y IS NOT NULL THEN x END) OVER w AS sx,
    SUM(y) OVER w AS sy,
    SUM(x * y) OVER w AS sxy,
    SUM(CASE WHEN y IS NOT NULL THEN x * x END) OVER w AS sxx
  FROM s
  WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx
               ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW)
)
SELECT conv_id, turn_idx,
  ROUND(CASE WHEN n >= {min_periods}
        THEN (n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0) END, 6)
      AS trend_slope
FROM m"""


def _hll_oracle() -> str:
    from sparkfeat.hll import ALPHA_64, M_REGS, W_BITS

    md5h = "md5('hll:' || tok)"
    bitlen = "CASE " + " ".join(
        f"WHEN w >= {1 << b} THEN {b + 1}" for b in range(W_BITS - 1, -1, -1)
    ) + " ELSE 0 END"
    am2 = ALPHA_64 * M_REGS * M_REGS
    return f"""WITH t AS (
  SELECT source,
         unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
  FROM documents WHERE text IS NOT NULL
),
h AS (
  SELECT source, {_hex_int12_sql(md5h)} AS hv FROM t
),
r AS (
  SELECT source, hv >> {W_BITS} AS j,
         {W_BITS + 1} - ({bitlen.replace("w >=", f"(hv % {1 << W_BITS}) >=")})
             AS rho
  FROM h
),
m AS (SELECT source, j, MAX(rho) AS mr FROM r GROUP BY source, j),
p AS (
  SELECT source, CAST(COUNT(*) AS INTEGER) AS regs_hit,
         SUM(1.0 / (1::BIGINT << mr)) AS sp
  FROM m GROUP BY source
)
SELECT source, regs_hit,
  ROUND(CASE WHEN {am2} / (sp + ({M_REGS} - regs_hit)) <= {2.5 * M_REGS}
              AND ({M_REGS} - regs_hit) > 0
        THEN ROUND({float(M_REGS)} * LN({float(M_REGS)}
                   / ({M_REGS} - regs_hit)), 9)
        ELSE {am2} / (sp + ({M_REGS} - regs_hit)) END, 3) AS est_distinct
FROM p"""


@register("source_distinct_hll", _hll_oracle(), driver=False)
def q_source_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct-token cardinality via the in-plan
    HyperLogLog — the sketch-trilogy completion (Bloom = membership,
    CMS = frequency, HLL = cardinality): exact countDistinct of
    n-grams at 100 TB shuffles ~10¹¹ (group, key) rows, the HLL build
    shuffles at most groups × 64 register rows (map-side max-combined)
    and the key stream never hash-exchanges. Deterministic md5
    registers, exact threshold-CASE bit_length (no float log), exact
    power-of-two harmonic sums (order-independent in a double), ln
    canonicalized 9 dp in the linear-count branch — the whole estimate
    replays bit-for-bit in SQL, collisions and bias included."""
    from sparkfeat.hll import hll_distinct

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
    )
    toks = docs.select(
        "source",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"),
    )
    return hll_distinct(toks, F.col("tok"), "source")


def _temperature_sample_oracle(alpha: float = 0.3, frac: float = 0.5) -> str:
    return f"""WITH s AS (
    SELECT source, CAST(SUM(n_chars) AS BIGINT) AS tok_group
    FROM documents GROUP BY source HAVING SUM(n_chars) > 0
),
t2 AS (SELECT CAST(SUM(tok_group) AS BIGINT) AS tot_tok FROM s),
p AS (
    SELECT source,
           ROUND(POW(CAST(tok_group AS DOUBLE) / tot_tok, {alpha}), 9) AS w
    FROM s, t2
),
z AS (SELECT SUM(w) AS z FROM p),
q AS (SELECT source, ROUND(w / z, 6) AS q_temp FROM p, z),
c AS (SELECT source, COUNT(*) AS n_group FROM documents GROUP BY source),
t AS (SELECT COUNT(*) AS tot FROM documents),
r AS (
    SELECT c.source, c.n_group,
        CASE WHEN q.q_temp IS NULL THEN 0.0
             ELSE LEAST(1.0, q.q_temp * ({frac!r} * tot) / c.n_group)
        END AS rate
    FROM c CROSS JOIN t LEFT JOIN q ON q.source = c.source
),
h AS (
    SELECT doc_id, source, {_hex_bucket_sql("doc_id", 13, 1_000_000)} AS kb
    FROM documents
)
SELECT doc_id, h.source,
    CAST(n_group AS BIGINT) AS n_group,
    ROUND(rate, 6) AS rate,
    kb < CAST(FLOOR(rate * 1000000) AS BIGINT) AS keep
FROM h JOIN r ON h.source = r.source"""


@register("corpus_temperature_sample", _temperature_sample_oracle(), driver=False)
def q_corpus_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed mixture pipeline in ONE lazy plan: derive the
    temperature mixture q ∝ p^0.3 from the corpus's own token shares
    (temperature_weights), convert it to per-source keep rates with the
    waterfilling cap, and flag every doc by the md5-bucket threshold
    (mixture_sample_from — the DataFrame-weights composition joint; no
    driver round-trip, no collect of the weights). The oracle replays
    the whole composition: power weights, normalizer, rate math, and
    the positional hash keep."""
    from sparkfeat.corpus import mixture_sample_from, temperature_weights

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = temperature_weights(docs, alpha=0.3, group_col="source",
                            token_col="n_chars")
    out = mixture_sample_from(docs, w, frac=0.5, group_col="source")
    return out.select(
        "doc_id", "source", "n_group", _r(F.col("rate")).alias("rate"), "keep"
    )


def _weighted_sample_oracle(k: int = 20) -> str:
    md5h = "md5('0:' || CAST(doc_id AS VARCHAR))"
    return f"""WITH b AS (
  SELECT lang, doc_id, CAST(n_chars AS DOUBLE) AS weight,
    ROUND(LN(({_hex_int12_sql(md5h)} + 1) / {float(1 << 48)})
          / CAST(n_chars AS DOUBLE), 9) AS r
  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
),
rk AS (
  SELECT lang, doc_id, weight,
    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY r DESC, doc_id ASC)
        AS sample_rank
  FROM b
)
SELECT lang, doc_id, weight, CAST(sample_rank AS INTEGER) AS sample_rank
FROM rk WHERE sample_rank <= {k}"""


@register("corpus_weighted_sample", _weighted_sample_oracle(), driver=False)
def q_corpus_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted exact-k per-group sample (Efraimidis–Spirakis A-Res):
    rank key ln(u)/w with u a deterministic md5 uniform — marginal
    inclusion probability proportional to weight, no RNG state, same
    seed replays on any cluster. The quality/size-weighted eval-set
    builder (here: k=20 docs per language weighted by n_chars). Spark
    runs the two-phase top-k (per-(group, shard) prune, then rank
    ≤ shards×k survivors — a 10⁹-doc group never fills one window
    partition); the oracle ranks directly — identical results because
    the prune is exactness-preserving. ln canonicalized 9 dp before
    the rank compare, ties broken by id."""
    from sparkfeat.corpus import weighted_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return weighted_sample(
        docs, k=20, weight_col="n_chars", group_col="lang", seed="0"
    )


def _hll_overlap_oracle() -> str:
    from sparkfeat.hll import ALPHA_64, M_REGS, W_BITS

    md5h = "md5('hll:' || tok)"
    bitlen = "CASE " + " ".join(
        f"WHEN w >= {1 << b} THEN {b + 1}" for b in range(W_BITS - 1, -1, -1)
    ) + " ELSE 0 END"
    am2 = ALPHA_64 * M_REGS * M_REGS

    def est(hit: str, sp: str) -> str:
        s = f"({sp} + ({M_REGS} - {hit}))"
        v = f"({M_REGS} - {hit})"
        raw = f"{am2} / {s}"
        lin = f"ROUND({float(M_REGS)} * LN({float(M_REGS)} / {v}), 9)"
        return (
            f"CASE WHEN {raw} <= {2.5 * M_REGS} AND {v} > 0 "
            f"THEN {lin} ELSE {raw} END"
        )

    def hit(m: str) -> str:
        return f"SUM(CASE WHEN {m} > 0 THEN 1 ELSE 0 END)"

    def sp(m: str) -> str:
        return f"SUM(CASE WHEN {m} > 0 THEN 1.0 / (1::BIGINT << {m}) ELSE 0 END)"

    return f"""WITH t AS (
  SELECT source,
         unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
  FROM documents WHERE text IS NOT NULL
),
h AS (
  SELECT source, {_hex_int12_sql(md5h)} AS hv FROM t
),
r AS (
  SELECT source, hv >> {W_BITS} AS j,
         {W_BITS + 1} - ({bitlen.replace("w >=", f"(hv % {1 << W_BITS}) >=")})
             AS rho
  FROM h
),
m AS (SELECT source, j, MAX(rho) AS mr FROM r GROUP BY source, j),
d AS (
  SELECT s.source, g.j, COALESCE(m.mr, 0) AS mr
  FROM (SELECT DISTINCT source FROM m) s
  CROSS JOIN (SELECT unnest(range(0, {M_REGS})) AS j) g
  LEFT JOIN m ON m.source = s.source AND m.j = g.j
),
u AS (
  SELECT a.source AS src_a, b.source AS src_b,
         a.mr AS ma, b.mr AS mb, GREATEST(a.mr, b.mr) AS mu
  FROM d a JOIN d b ON a.j = b.j AND a.source < b.source
),
e AS (
  SELECT src_a, src_b,
         {est(hit("ma"), sp("ma"))} AS ea,
         {est(hit("mb"), sp("mb"))} AS eb,
         {est(hit("mu"), sp("mu"))} AS eu
  FROM u GROUP BY src_a, src_b
)
SELECT src_a, src_b,
  ROUND(ea, 3) AS est_a, ROUND(eb, 3) AS est_b,
  ROUND(eu, 3) AS est_union,
  ROUND(GREATEST(0.0, ea + eb - eu), 3) AS est_inter,
  ROUND(GREATEST(0.0, ea + eb - eu) / eu, 3) AS jaccard
FROM e"""


@register("source_overlap_hll", _hll_overlap_oracle(), driver=False)
def q_source_overlap_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source vocabulary overlap from mergeable HLL registers
    alone (inclusion–exclusion: |A∩B| ≈ |A|+|B|−|A∪B| where the union
    estimate reads the elementwise-max registers) — the source-overlap
    planning tool at a cost independent of corpus size: after the
    register build (key stream never hash-exchanges) the pair join is
    groups × 64 register rows, never keys. The oracle replays the
    dense register vectors, the exact power-of-two harmonic folds, and
    the inclusion–exclusion arithmetic; estimation noise (±13% at
    m=64) is identical in both engines because it is a deterministic
    function of the md5 registers."""
    from sparkfeat.hll import hll_overlap, hll_registers

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
    )
    toks = docs.select(
        "source",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"),
    )
    return hll_overlap(hll_registers(toks, F.col("tok"), "source"), "source")


def _rollcorr_oracle(window: int = 8, min_periods: int = 3) -> str:
    return f"""WITH {TRANSCRIPTS_CTE},
s AS (
  SELECT conv_id, turn_idx, ts,
    CAST(LENGTH(text) AS DOUBLE) AS x,
    CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE) AS y
  FROM transcripts
),
m AS (
  SELECT conv_id, turn_idx,
    CAST(COUNT(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN 1 END)
         OVER w AS DOUBLE) AS n,
    SUM(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN x END) OVER w AS sx,
    SUM(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN y END) OVER w AS sy,
    SUM(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN x * x END)
        OVER w AS sxx,
    SUM(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN y * y END)
        OVER w AS syy,
    SUM(CASE WHEN x IS NOT NULL AND y IS NOT NULL THEN x * y END)
        OVER w AS sxy
  FROM s
  WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx
               ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW)
)
SELECT conv_id, turn_idx,
  ROUND(CASE WHEN n >= {min_periods}
              AND (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
        THEN (n * sxy - sx * sy)
             / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)) END, 6)
      AS len_tok_corr
FROM m"""


@register("rolling_len_tok_corr", _rollcorr_oracle(), driver=False)
def q_rolling_len_tok_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling Pearson correlation between the price-like (text_len)
    and volume-like (token_est) signals over the trailing 8 turns —
    the bivariate member of the closed-form window-stat family (six
    trailing sums + one quotient, all codegen, same single conv_id
    exchange, trailing-only = leakage-free). Pairwise-complete null
    handling: a row missing either signal drops from all six moments.
    Integer signals keep the sums exact and sqrt is IEEE-exact, so the
    oracle's identical normal-form arithmetic hash-matches."""
    from sparkfeat.schema import transcripts_from_events, with_turn_signals
    from sparkfeat.transforms import rolling_corr

    t = with_turn_signals(transcripts_from_events(spark, sf_dir))
    return t.select(
        "conv_id",
        "turn_idx",
        _r(rolling_corr("text_len", "token_est", window=8, min_periods=3))
        .alias("len_tok_corr"),
    )


@register("rolling_trend_slope", _trend_oracle(), driver=False)
def q_rolling_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling OLS trend slope of the price-like signal (text_len)
    over the trailing 6 turns — the momentum sibling of T4 volatility,
    closed form from five trailing-window sums (no UDF, no second
    exchange: x is the conv-global row_number, and slope is invariant
    to the affine shift between global and window-local positions).
    Trailing-only frame = zero temporal leakage by construction.
    Integer-valued signal × integer x → every sum exact in doubles, so
    the division replays bit-for-bit; the oracle computes the same
    normal-equation sums over the same frame."""
    from sparkfeat.schema import transcripts_from_events, with_turn_signals
    from sparkfeat.transforms import rolling_slope

    t = with_turn_signals(transcripts_from_events(spark, sf_dir))
    return t.select(
        "conv_id",
        "turn_idx",
        _r(rolling_slope("text_len", window=6, min_periods=3)).alias(
            "trend_slope"
        ),
    )


#: deterministic arena judgments from documents: doc 2k vs doc 2k+1
#: (one equi-join on doc_id div 2), the longer doc's SOURCE wins, tie
#: to the even (smaller-id) doc — a synthetic LLM-judge sweep whose
#: every judgment replays bit-for-bit in any engine.
_ARENA_JUDGMENTS_CTE = """e AS (
    SELECT doc_id // 2 AS half, source AS s_e, n_chars AS c_e
    FROM documents WHERE doc_id % 2 = 0
),
o AS (
    SELECT doc_id // 2 AS half, source AS s_o, n_chars AS c_o
    FROM documents WHERE doc_id % 2 = 1
),
judg AS (
    SELECT CASE WHEN c_e >= c_o THEN s_e ELSE s_o END AS winner,
           CASE WHEN c_e >= c_o THEN s_o ELSE s_e END AS loser
    FROM e JOIN o USING (half)
),
wmat AS (
    SELECT winner AS a, loser AS b, COUNT(*) AS w
    FROM judg WHERE winner <> loser GROUP BY winner, loser
),
cells AS (
    SELECT COALESCE(w1.a, w2.b) AS a, COALESCE(w1.b, w2.a) AS b,
           COALESCE(w1.w, 0) AS w_int,
           COALESCE(w1.w, 0) + COALESCE(w2.w, 0) AS n_int
    FROM wmat w1 FULL JOIN wmat w2 ON w1.a = w2.b AND w1.b = w2.a
)"""


def _arena_judgments(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = d.filter(F.col("doc_id") % 2 == 0).select(
        F.expr("doc_id div 2").alias("half"),
        F.col("source").alias("s_e"),
        F.col("n_chars").alias("c_e"),
    )
    od = d.filter(F.col("doc_id") % 2 == 1).select(
        F.expr("doc_id div 2").alias("half"),
        F.col("source").alias("s_o"),
        F.col("n_chars").alias("c_o"),
    )
    won = F.col("c_e") >= F.col("c_o")
    return ev.join(od, "half").select(
        F.when(won, F.col("s_e")).otherwise(F.col("s_o")).alias("winner"),
        F.when(won, F.col("s_o")).otherwise(F.col("s_e")).alias("loser"),
    )


def _arena_bt_oracle(n_iter: int = 5, prior: float = 0.1) -> str:
    ctes = [
        _ARENA_JUDGMENTS_CTE,
        f"""tot AS (
    SELECT a AS player,
           CAST(SUM(w_int) AS DOUBLE) + {prior!r} * COUNT(*) AS wreg,
           CAST(SUM(w_int) AS BIGINT) AS wins,
           CAST(SUM(n_int) AS BIGINT) AS games
    FROM cells GROUP BY a
)""",
        "s0 AS (SELECT player, 1.0 AS s FROM tot)",
    ]
    for k in range(1, n_iter + 1):
        ctes.append(f"""d{k} AS (
    SELECT p.a AS player, SUM((p.n_int + {2 * prior!r}) / (si.s + sj.s)) AS d
    FROM cells p
    JOIN s{k - 1} si ON si.player = p.a
    JOIN s{k - 1} sj ON sj.player = p.b
    GROUP BY p.a
),
s{k} AS (
    SELECT r.player,
           ROUND(r.raw * (COUNT(*) OVER ()) / (SUM(r.raw) OVER ()), 9) AS s
    FROM (
        SELECT t.player, t.wreg / d{k}.d AS raw
        FROM tot t JOIN d{k} ON d{k}.player = t.player
    ) r
)""")
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT t.player, t.wins, t.games, ROUND(s{n_iter}.s, 6) AS strength
FROM tot t JOIN s{n_iter} ON s{n_iter}.player = t.player"""
    )


@register("arena_bt_strengths", _arena_bt_oracle(), driver=False)
def q_arena_bt_strengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley–Terry leaderboard (sparkfeat.arena.bt_strengths) over a
    deterministic source-vs-source judgment stream mined from the
    documents table (doc 2k vs 2k+1, longer doc's source wins): the
    arena-style "pairwise LLM-judge results → global strengths"
    aggregation, 5 unrolled in-plan MM iterations (Hunter 2004), every
    iterate 9 dp-canonicalized. The oracle replays the ENTIRE
    trajectory — judgment mining, directed counts, symmetrized pair
    matrix, regularized win totals, all five MM rounds with the mean-1
    gauge, and the final join — so the value hash verifies the
    iteration itself, not just the fixed point's neighborhood."""
    from sparkfeat.arena import bt_strengths

    out = bt_strengths(_arena_judgments(spark, sf_dir), n_iter=5, prior=0.1)
    return out.select(
        "player", "wins", "games", _r(F.col("strength")).alias("strength")
    )


_ARENA_WINRATE_ORACLE = f"""WITH {_ARENA_JUDGMENTS_CTE}
SELECT a, b,
    CAST(w_int AS BIGINT) AS wins,
    CAST(n_int AS BIGINT) AS games,
    ROUND(w_int / CAST(n_int AS DOUBLE), 6) AS win_rate,
    ROUND((w_int / CAST(n_int AS DOUBLE) + (1.96 * 1.96) / (2 * n_int)
           - 1.96 * SQRT(w_int / CAST(n_int AS DOUBLE)
                         * (1 - w_int / CAST(n_int AS DOUBLE)) / n_int
                         + (1.96 * 1.96) / (4.0 * n_int * n_int)))
          / (1 + (1.96 * 1.96) / n_int), 6) AS wilson_lb
FROM cells"""


@register("arena_winrate_matrix", _ARENA_WINRATE_ORACLE, driver=False)
def q_arena_winrate_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head-to-head win-rate cells with Wilson lower confidence bounds
    (sparkfeat.arena.winrate_matrix) over the same deterministic
    source-vs-source judgments as arena_bt_strengths — the leaderboard
    companion that ranks cells by supported evidence (the bound), not
    the raw rate. Closed-form column algebra on the players²-bounded
    count matrix; oracle replays the Wilson formula termwise."""
    from sparkfeat.arena import winrate_matrix

    return winrate_matrix(_arena_judgments(spark, sf_dir), z=1.96)


#: pointwise rewards mined from events: each user's purchase events
#: are a "prompt group" of scored candidates (group ≈ 13 candidates at
#: sf0.01 — the realistic GRPO fan-out).
_REWARDS_CTE = """r AS (
    SELECT user_id AS group_id, event_id AS cand_id, value AS reward
    FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
)"""

_GRPO_ORACLE = f"""WITH {_REWARDS_CTE},
m AS (
    SELECT group_id, cand_id, reward,
           COUNT(*) OVER (PARTITION BY group_id) AS n,
           SUM(reward) OVER (PARTITION BY group_id) AS s,
           SUM(reward * reward) OVER (PARTITION BY group_id) AS ss
    FROM r
)
SELECT group_id, cand_id, ROUND(reward, 6) AS reward,
    CAST(n AS INTEGER) AS n_g, ROUND(s / n, 6) AS mean_g,
    ROUND((reward - s / n)
          / (SQRT(GREATEST(ss / n - (s / n) * (s / n), 0.0)) + 1e-6),
          6) AS advantage
FROM m"""

_RLOO_ORACLE = f"""WITH {_REWARDS_CTE},
m AS (
    SELECT group_id, cand_id, reward,
           COUNT(*) OVER (PARTITION BY group_id) AS n,
           SUM(reward) OVER (PARTITION BY group_id) AS s
    FROM r
)
SELECT group_id, cand_id, ROUND(reward, 6) AS reward,
    CAST(n AS INTEGER) AS n_g, ROUND(s / n, 6) AS mean_g,
    ROUND(CASE WHEN n > 1 THEN reward - (s - reward) / (n - 1) END,
          6) AS advantage
FROM m"""

_BON_ORACLE = f"""WITH {_REWARDS_CTE},
rk AS (
    SELECT group_id, cand_id, reward,
           ROW_NUMBER() OVER (
               PARTITION BY group_id ORDER BY reward DESC, cand_id ASC
           ) AS bon_rank
    FROM r
)
SELECT group_id, cand_id, ROUND(reward, 6) AS reward,
    CAST(bon_rank AS INTEGER) AS bon_rank
FROM rk WHERE bon_rank <= 3"""


def _event_rewards(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("group_id"),
            F.col("event_id").alias("cand_id"),
            F.col("value").alias("reward"),
        )
    )


@register("reward_grpo_advantages", _GRPO_ORACLE, driver=False)
def q_reward_grpo_advantages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRPO group-relative advantages (sparkfeat.reward.
    group_advantages, DeepSeekMath eq. 3): each user's purchase events
    are a prompt group of scored candidates; advantage = (r − mean_g)
    / (pop-std_g + eps) from ONE window pass on the single group_id
    exchange. Degenerate all-equal groups hit the eps floor (A = 0,
    no NaN). Oracle replays count/sum/sum-of-squares, the clamped
    variance, and the eps-floored quotient termwise."""
    from sparkfeat.reward import group_advantages

    return group_advantages(_event_rewards(spark, sf_dir), method="grpo")


@register("reward_rloo_advantages", _RLOO_ORACLE, driver=False)
def q_reward_rloo_advantages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RLOO leave-one-out advantages (sparkfeat.reward.
    group_advantages, Ahmadian et al. 2024): A_i = r_i − mean of the
    OTHER candidates' rewards — the unbiased baseline, zero-sum within
    every group (pytest-asserted); singleton groups yield NULL. Same
    single-exchange window shape as the GRPO variant."""
    from sparkfeat.reward import group_advantages

    return group_advantages(_event_rewards(spark, sf_dir), method="rloo")


@register("reward_best_of_n", _BON_ORACLE, driver=False)
def q_reward_best_of_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-of-n rejection-sampling keep-list (sparkfeat.reward.
    best_of_n, k=3): top-3 candidates per prompt group by reward,
    ties broken by cand_id so the selection replays bit-for-bit;
    NULL rewards can never win. The BoN/rejection-sampling curation
    extractor over the same event-mined reward groups."""
    from sparkfeat.reward import best_of_n

    return best_of_n(_event_rewards(spark, sf_dir), k=3)


_DATACARD_ORACLE = """SELECT source, lang,
    CAST(GROUPING(source, lang) AS INTEGER) AS gid,
    COUNT(*) AS n_docs,
    CAST(SUM(n_chars) AS BIGINT) AS n_chars,
    ROUND(AVG(n_chars), 6) AS avg_chars,
    CAST(MIN(n_chars) AS BIGINT) AS min_chars,
    CAST(MAX(n_chars) AS BIGINT) AS max_chars,
    CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_null_text,
    ROUND(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END)
          / CAST(COUNT(*) AS DOUBLE), 6) AS null_text_frac
FROM documents GROUP BY ROLLUP (source, lang)"""


@register("corpus_datacard", _DATACARD_ORACLE, driver=False)
def q_corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan rollup data-card (sparkfeat.report.corpus_datacard):
    per-(source, lang) doc/char stats plus every roll-up margin and
    the grand total from ONE corpus scan + ONE exchange (map-side
    grouping-set expansion; plan-asserted no join/window/second scan).
    grouping_id disambiguates rolled-up NULLs from real NULL dims —
    pytest pins that Spark's bitmask convention equals DuckDB's
    GROUPING(a, b). The only multi-dimensional-aggregate surface in
    the repo; the oracle is the literal SQL ROLLUP."""
    from sparkfeat.report import corpus_datacard

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return corpus_datacard(docs)


#: two deterministic corpus snapshots from one table: the "previous
#: crawl" misses every doc_id ≡ 3 (mod 11); the "new crawl" misses
#: every doc_id ≡ 7 (mod 19) and re-extracted every doc_id ≡ 0
#: (mod 13) with a ' v2' suffix (NULL text stays NULL through the
#: append in both engines, so null-text docs re-extract to unchanged).
_SNAPSHOT_DIFF_CTE = """old AS (
    SELECT doc_id, source, text FROM documents WHERE doc_id % 11 <> 3
),
new AS (
    SELECT doc_id, source,
           CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END AS text
    FROM documents WHERE doc_id % 19 <> 7
),
o AS (
    SELECT doc_id AS id,
           md5(COALESCE(CAST(text AS VARCHAR), CHR(0))) AS fp_old,
           source AS src_old
    FROM old
),
n AS (
    SELECT doc_id AS id,
           md5(COALESCE(CAST(text AS VARCHAR), CHR(0))) AS fp_new,
           source AS src_new
    FROM new
),
diff AS (
    SELECT COALESCE(o.id, n.id) AS doc_id,
        COALESCE(src_new, src_old) AS source,
        CASE WHEN fp_old IS NULL THEN 'added'
             WHEN fp_new IS NULL THEN 'removed'
             WHEN fp_old <> fp_new THEN 'changed'
             ELSE 'unchanged' END AS status
    FROM o FULL JOIN n ON o.id = n.id
)"""


def _snapshot_pair(spark: SparkSession, sf_dir: str):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    old = d.filter(F.col("doc_id") % 11 != 3).select("doc_id", "source", "text")
    new = d.filter(F.col("doc_id") % 19 != 7).select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" v2"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return old, new


@register(
    "corpus_snapshot_diff",
    f"WITH {_SNAPSHOT_DIFF_CTE} SELECT doc_id, source, status FROM diff",
    driver=False,
)
def q_corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC between two corpus snapshots (sparkfeat.report.
    snapshot_diff): full-outer join on doc_id over map-side md5
    fingerprints (null-sentinel-coded so ('a', NULL)/(NULL, 'a') can't
    collide) classifying every doc added/removed/changed/unchanged —
    the promote-or-recompute audit for a recurring crawl. The join
    shuffles only (id, fp, source), never the text (plan-asserted).
    Snapshots are derived deterministically from the documents table;
    the oracle replays derivation, fingerprints, and the CASE."""
    from sparkfeat.report import snapshot_diff

    old, new = _snapshot_pair(spark, sf_dir)
    return snapshot_diff(old, new)


_SNAPSHOT_CHURN_ORACLE = f"""WITH {_SNAPSHOT_DIFF_CTE}
SELECT source,
    CAST(SUM(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT)
        AS n_added,
    CAST(SUM(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS BIGINT)
        AS n_removed,
    CAST(SUM(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) AS BIGINT)
        AS n_changed,
    CAST(SUM(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT)
        AS n_unchanged,
    ROUND(SUM(CASE WHEN status <> 'unchanged' THEN 1 ELSE 0 END)
          / CAST(COUNT(*) AS DOUBLE), 6) AS churn_frac
FROM diff GROUP BY source"""


@register("corpus_snapshot_churn", _SNAPSHOT_CHURN_ORACLE, driver=False)
def q_corpus_snapshot_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source churn rollup of the snapshot diff (sparkfeat.report.
    snapshot_churn): status counts + churn_frac, the single number a
    promotion gate thresholds. Composes snapshot_diff → one
    conditional-sum aggregate; oracle replays the whole composition."""
    from sparkfeat.report import snapshot_churn, snapshot_diff

    old, new = _snapshot_pair(spark, sf_dir)
    return snapshot_churn(snapshot_diff(old, new))


@register(
    "corpus_incremental_features",
    f"""WITH {_SNAPSHOT_DIFF_CTE}
SELECT doc_id, source,
    CAST(LEN({_TOKS}) AS INT) AS n_tok,
    CAST(LENGTH(text) AS INT) AS len_chars
FROM new""",
    driver=False,
)
def q_corpus_incremental_features(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental feature recompute (sparkfeat.report.
    incremental_update): snapshot_diff gates the feature pipeline to
    the added/changed slice via LEFT SEMI joins; unchanged docs carry
    their previous feature rows forward; removed docs drop. The
    correctness law — incremental result == full recompute over the
    new snapshot — IS the oracle (features over the new CTE); the
    carry-path-really-carries property is pinned separately in pytest
    with sentinel-poisoned old features (an oracle can't see the
    difference, a sentinel can)."""
    from sparkfeat import text as X
    from sparkfeat.report import incremental_update, snapshot_diff

    old, new = _snapshot_pair(spark, sf_dir)

    def features(docs: DataFrame) -> DataFrame:
        return docs.select(
            "doc_id",
            "source",
            X.token_count("text").alias("n_tok"),
            F.length("text").cast("int").alias("len_chars"),
        )

    return incremental_update(
        snapshot_diff(old, new), features(old), new, features
    )


# ---------------------------------------------------------------------------
# Per-source distinctive terms (sparkfeat.text.source_distinctive_terms)
# ---------------------------------------------------------------------------


def _distinctive_terms_oracle(k: int = 10, min_df: int = 2) -> str:
    return f"""WITH tk AS (
    SELECT source, doc_id,
        unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                           x -> x <> '')) AS term
    FROM documents
),
tf AS (SELECT source, term, COUNT(*) AS tf FROM tk GROUP BY ALL),
dfr AS (
    SELECT term, COUNT(*) AS df
    FROM (SELECT DISTINCT term, doc_id FROM tk) GROUP BY term
),
n AS (SELECT COUNT(*) AS nd FROM documents),
sc AS (
    SELECT source, term, tf, df,
        ROUND(tf * LN(CAST(nd + 1 AS DOUBLE) / CAST(df + 1 AS DOUBLE)), 6)
            AS score
    FROM tf JOIN dfr USING (term), n
    WHERE df >= {min_df}
),
r AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY source ORDER BY score DESC, term) AS rank
    FROM sc
)
SELECT source, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
    score, CAST(rank AS INT) AS rank
FROM r WHERE rank <= {k}"""


@register("corpus_distinctive_terms", _distinctive_terms_oracle(), driver=False)
def q_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 tf-idf-distinctive terms per source
    (sparkfeat.text.source_distinctive_terms) — the "does this source's
    content match its label" audit before mixture weighting trusts the
    source column. Scores rounded 6 dp BEFORE ranking with a term
    tie-break (engine-stable order); exact two-phase per-source top-k
    (no single-task window over a source's vocabulary). The oracle
    replays tokenization, tf, the two-level document frequency, the
    smoothed idf, and the rank as one direct window — pinning the
    two-phase rank's exactness."""
    from sparkfeat.text import source_distinctive_terms

    return source_distinctive_terms(_docs(spark, sf_dir), k=10, min_df=2)


# ---------------------------------------------------------------------------
# Running drawdown + cumulative log-return (transforms T-family extension)
# ---------------------------------------------------------------------------

_DRAWDOWN_ORACLE = f"""WITH {TRANSCRIPTS_CTE},
sig AS (
    SELECT conv_id, turn_idx, ts, CAST(LENGTH(text) AS DOUBLE) AS v
    FROM transcripts
),
st AS (
    SELECT *,
        LN(v / NULLIF(LAG(v) OVER ({_W}), 0)) AS lr_raw,
        MAX(v) OVER ({_W} ROWS UNBOUNDED PRECEDING) AS peak
    FROM sig
),
f AS (
    SELECT conv_id, turn_idx, ts, v, peak,
        CASE WHEN lr_raw IS NULL THEN NULL
             ELSE LEAST(GREATEST(lr_raw, -0.1), 0.1) END AS lr
    FROM st
)
SELECT conv_id, turn_idx,
    ROUND(CASE WHEN v IS NOT NULL AND peak > 0 THEN 1.0 - v / peak END, 6)
        AS drawdown,
    ROUND(SUM(lr) OVER ({_W} ROWS UNBOUNDED PRECEDING), 6) AS cum_lr
FROM f"""


@register("turn_drawdown_cumret", _DRAWDOWN_ORACLE, driver=False)
def q_turn_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expanding-window members of the transform family: running
    drawdown (1 − value/running-max — distance below the
    conversation's high-water mark, transforms.running_drawdown) and
    cumulative clipped log-return since conversation start
    (transforms.cumulative_log_return) over the text-length turn
    signal. Both are single-window expressions on the same conv_id
    partitioning as every other T-family feature (no extra exchange)
    and trailing-only ⇒ leakage-free; the oracle replays the running
    max, the clipped per-step log-return, and the ordered running sum."""
    from sparkfeat.schema import transcripts_from_events
    from sparkfeat.transforms import (
        cumulative_log_return,
        running_drawdown,
    )

    t = transcripts_from_events(spark, sf_dir)
    sig = t.select(
        "conv_id",
        "turn_idx",
        "ts",
        F.length("text").cast("double").alias("text_len"),
    )
    return sig.select(
        "conv_id",
        "turn_idx",
        _r(running_drawdown(F.col("text_len"))).alias("drawdown"),
        _r(cumulative_log_return(F.col("text_len"), clip=0.1)).alias(
            "cum_lr"
        ),
    )


# ---------------------------------------------------------------------------
# Categorical drift (sparkfeat.drift.categorical_drift)
# ---------------------------------------------------------------------------


def _categorical_drift_oracle() -> str:
    hb = _hex_bucket_sql("doc_id", 21, 100)
    return f"""WITH d AS (
    SELECT COALESCE(lang, '<null>') AS category, {hb} AS bb FROM documents
),
r AS (SELECT category, COUNT(*) AS n_ref FROM d WHERE bb < 80 GROUP BY category),
c AS (SELECT category, COUNT(*) AS n_cur FROM d WHERE bb >= 80 GROUP BY category),
cells AS (
    SELECT COALESCE(r.category, c.category) AS category,
        COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur
    FROM r FULL JOIN c ON r.category = c.category
),
tot AS (SELECT SUM(n_ref) AS tr, SUM(n_cur) AS tc, COUNT(*) AS k FROM cells),
pc AS (
    SELECT category, n_ref, n_cur, tr, tc, k,
        ROUND(n_ref / CAST(tr AS DOUBLE), 6) AS share_ref,
        ROUND(n_cur / CAST(tc AS DOUBLE), 6) AS share_cur,
        ROUND(
            (CASE WHEN tr * CAST(n_ref + n_cur AS DOUBLE)
                       / CAST(tr + tc AS DOUBLE) > 0
                THEN (CAST(n_ref AS DOUBLE)
                      - tr * CAST(n_ref + n_cur AS DOUBLE)
                        / CAST(tr + tc AS DOUBLE))
                     * (CAST(n_ref AS DOUBLE)
                        - tr * CAST(n_ref + n_cur AS DOUBLE)
                          / CAST(tr + tc AS DOUBLE))
                     / (tr * CAST(n_ref + n_cur AS DOUBLE)
                        / CAST(tr + tc AS DOUBLE))
                ELSE 0.0 END)
            + (CASE WHEN tc * CAST(n_ref + n_cur AS DOUBLE)
                         / CAST(tr + tc AS DOUBLE) > 0
                THEN (CAST(n_cur AS DOUBLE)
                      - tc * CAST(n_ref + n_cur AS DOUBLE)
                        / CAST(tr + tc AS DOUBLE))
                     * (CAST(n_cur AS DOUBLE)
                        - tc * CAST(n_ref + n_cur AS DOUBLE)
                          / CAST(tr + tc AS DOUBLE))
                     / (tc * CAST(n_ref + n_cur AS DOUBLE)
                        / CAST(tr + tc AS DOUBLE))
                ELSE 0.0 END), 6) AS chi2_contrib
    FROM cells, tot
),
tb AS (
    SELECT ROUND(SUM(chi2_contrib), 6) AS chi2,
        CAST(MAX(k) - 1 AS INT) AS dof,
        ROUND(SQRT(SUM(chi2_contrib)
                   / (CAST(MAX(tr + tc) AS DOUBLE)
                      * GREATEST(LEAST(1, MAX(k) - 1), 1))), 6) AS cramers_v
    FROM pc
)
SELECT category, CAST(n_ref AS BIGINT) AS n_ref,
    CAST(n_cur AS BIGINT) AS n_cur,
    share_ref, share_cur, chi2_contrib, chi2, dof, cramers_v
FROM pc, tb"""


@register("corpus_categorical_drift", _categorical_drift_oracle(), driver=False)
def q_categorical_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square homogeneity + Cramér's V over the language mixture of
    two md5-bucket corpus slices (sparkfeat.drift.categorical_drift) —
    the categorical companion of the numeric PSI/SMD monitor ("did the
    language mixture shift between crawls?"). The whole 2×k contingency
    algebra runs in-plan (k-row aggregates, one-row broadcast totals,
    6 dp round-before-fold); the oracle replays counts, expected
    values, per-category contributions, and the table-level statistics
    termwise, so the hash verifies the solve itself (the constant
    chi2/dof/cramers_v columns ride every row, the probe convention)."""
    from sparkfeat.corpus import hash_bucket
    from sparkfeat.drift import categorical_drift

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.coalesce("lang", F.lit("<null>")).alias("lang")
    )
    in_ref = hash_bucket("doc_id", start=21, buckets=100) < 80
    return categorical_drift(d.filter(in_ref), d.filter(~in_ref), "lang")


# ---------------------------------------------------------------------------
# Role-transition profile (sparkfeat.conv.role_transitions)
# ---------------------------------------------------------------------------

_ROLE_TRANSITIONS_ORACLE = f"""WITH {TRANSCRIPTS_CTE},
b AS (
    SELECT conv_id, role,
        LEAD(role) OVER ({_W}) AS nxt,
        ROW_NUMBER() OVER ({_W}) AS rn
    FROM transcripts
),
t AS (
    SELECT role AS role_from, COALESCE(nxt, 'END') AS role_to FROM b
    UNION ALL
    SELECT 'START', role FROM b WHERE rn = 1
),
c AS (SELECT role_from, role_to, COUNT(*) AS n FROM t GROUP BY ALL)
SELECT role_from, role_to, CAST(n AS BIGINT) AS n,
    ROUND(n / CAST(SUM(n) OVER (PARTITION BY role_from) AS DOUBLE), 6) AS p
FROM c"""


@register("conv_role_transitions", _ROLE_TRANSITIONS_ORACLE, driver=False)
def q_role_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide role-transition Markov matrix with START/END
    sentinels (sparkfeat.conv.role_transitions) — the agent-telemetry
    shape audit: who speaks after whom, per (role_from, role_to), with
    row-conditional probabilities. One hash(conv_id) exchange feeds the
    lead() window; the transition stream collapses map-side to a
    roles²-bounded table. Oracle replays the window, sentinels, counts
    and the conditional normalizer over TRANSCRIPTS_CTE."""
    from sparkfeat.conv import role_transitions
    from sparkfeat.schema import transcripts_from_events

    return role_transitions(transcripts_from_events(spark, sf_dir))


# ---------------------------------------------------------------------------
# Outlink domain statistics (sparkfeat.text.domain_stats)
# ---------------------------------------------------------------------------

#: deterministic URL enrichment: the synthetic corpus has no URLs, so
#: the query plants doc_id-derived links — domain repeats within a doc
#: (%5 branch shares the %3 branch's domain) separate n_occ from
#: n_docs, and the ':port' URL pins the domain pattern's boundary set.
_URL_AUG_SQL = (
    "text"
    " || CASE WHEN doc_id % 3 = 0 THEN ' see https://ex'"
    " || CAST(doc_id % 7 AS VARCHAR) || '.com/p/'"
    " || CAST(doc_id AS VARCHAR) ELSE '' END"
    " || CASE WHEN doc_id % 4 = 0 THEN ' at http://sub.ex'"
    " || CAST(doc_id % 5 AS VARCHAR) || '.org:8080/x' ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN ' and https://EX'"
    " || CAST(doc_id % 7 AS VARCHAR) || '.com/q?u=1' ELSE '' END"
)


def _domain_stats_oracle() -> str:
    return f"""WITH a AS (SELECT doc_id, {_URL_AUG_SQL} AS t0 FROM documents),
d AS (
    SELECT doc_id,
        lower(unnest(regexp_extract_all(t0, 'https?://([^/\\s:?#]+)', 1)))
            AS domain
    FROM a
),
pd AS (SELECT domain, doc_id, COUNT(*) AS k FROM d GROUP BY ALL),
pm AS (SELECT domain, SUM(k) AS n_occ, COUNT(*) AS n_docs FROM pd
       GROUP BY domain),
n AS (SELECT COUNT(*) AS n_corpus FROM documents)
SELECT domain, CAST(n_occ AS BIGINT) AS n_occ,
    CAST(n_docs AS BIGINT) AS n_docs,
    ROUND(n_docs / CAST(n_corpus AS DOUBLE), 6) AS doc_frac
FROM pm, n"""


@register("corpus_domain_stats", _domain_stats_oracle(), driver=False)
def q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlink domain profile (sparkfeat.text.domain_stats): per cited
    domain, URL occurrences, distinct citing docs, and corpus doc-share
    — the crawl-curation table behind link-spam filters. Map-only
    regexp extraction + two-level map-side-combinable distinct-doc
    count + a lazy one-row broadcast total. The corpus carries no URLs,
    so the query plants deterministic doc_id-derived links (mirrored in
    the oracle) with within-doc domain repeats, a mixed-case domain
    (lowercasing under test) and a ':port' URL (boundary set under
    test)."""
    from sparkfeat.text import domain_stats

    docs = _docs(spark, sf_dir)
    did = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit(" see https://ex"),
                (did % 7).cast("string"),
                F.lit(".com/p/"),
                did.cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 4 == 0,
            F.concat(
                F.lit(" at http://sub.ex"),
                (did % 5).cast("string"),
                F.lit(".org:8080/x"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit(" and https://EX"),
                (did % 7).cast("string"),
                F.lit(".com/q?u=1"),
            ),
        ).otherwise(F.lit("")),
    )
    return domain_stats(docs.select("doc_id", aug.alias("text")))


# ---------------------------------------------------------------------------
# Inter-rater agreement (sparkfeat.arena.rater_agreement)
# ---------------------------------------------------------------------------

#: deterministic 3-rater judgment stream over documents: the shared
#: ground label is a doc property (n_chars decile), each rater covers
#: an independent md5-bucket 85% slice and flips the label on an
#: independent 15% slice — raters agree above chance but not perfectly,
#: so every kappa branch carries real signal. Replayed bucket-for-bucket.
_RATER_SPECS = (("r1", 15, 3), ("r2", 17, 7), ("r3", 19, 11))


def _rater_judgments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    from sparkfeat.corpus import hash_bucket

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = F.when((F.col("n_chars") % 10) < 6, F.lit("good")).otherwise(
        F.lit("bad")
    )
    flipped = F.when(base == "good", F.lit("bad")).otherwise(F.lit("good"))
    parts = []
    for rid, cov_s, flip_s in _RATER_SPECS:
        lab = F.when(
            hash_bucket("doc_id", start=flip_s, buckets=1000) < 150, flipped
        ).otherwise(base)
        parts.append(
            d.filter(hash_bucket("doc_id", start=cov_s, buckets=1000) < 850)
            .select(
                F.col("doc_id").alias("item_id"),
                F.lit(rid).alias("rater_id"),
                lab.alias("label"),
            )
        )
    return reduce(lambda a, b: a.unionAll(b), parts)


def _rater_arms_sql() -> str:
    return "\nUNION ALL\n".join(
        f"""SELECT doc_id, '{rid}' AS r,
    CASE WHEN {_hex_bucket_sql("doc_id", flip_s, 1000)} < 150
         THEN (CASE WHEN b = 'good' THEN 'bad' ELSE 'good' END)
         ELSE b END AS l
FROM base WHERE {_hex_bucket_sql("doc_id", cov_s, 1000)} < 850"""
        for rid, cov_s, flip_s in _RATER_SPECS
    )


def _rater_kappa_oracle() -> str:
    arms = _rater_arms_sql()
    return f"""WITH base AS (
    SELECT doc_id,
        CASE WHEN (n_chars % 10) < 6 THEN 'good' ELSE 'bad' END AS b
    FROM documents
),
j AS ({arms}),
p AS (
    SELECT a.r AS ra, b.r AS rb, a.l AS la, b.l AS lb
    FROM j a JOIN j b ON a.doc_id = b.doc_id AND a.r < b.r
),
cells AS (SELECT ra, rb, la, lb, COUNT(*) AS cnt FROM p GROUP BY ALL),
ma AS (SELECT ra, rb, la, SUM(cnt) AS na FROM cells GROUP BY ALL),
mb AS (SELECT ra, rb, lb, SUM(cnt) AS nb FROM cells GROUP BY ALL),
pn AS (
    SELECT ma.ra, ma.rb, SUM(na * nb) AS pe_num
    FROM ma JOIN mb ON ma.ra = mb.ra AND ma.rb = mb.rb AND ma.la = mb.lb
    GROUP BY ma.ra, ma.rb
),
tot AS (SELECT ra, rb, SUM(cnt) AS n_shared FROM cells GROUP BY ALL),
ag AS (SELECT ra, rb, SUM(cnt) AS n_agree FROM cells WHERE la = lb
       GROUP BY ALL),
f AS (
    SELECT t.ra, t.rb, t.n_shared, COALESCE(ag.n_agree, 0) AS n_agree,
        ROUND(COALESCE(ag.n_agree, 0) / CAST(t.n_shared AS DOUBLE), 6) AS po,
        ROUND(pe_num / (CAST(t.n_shared AS DOUBLE) * t.n_shared), 6) AS pe
    FROM tot t
    LEFT JOIN ag ON ag.ra = t.ra AND ag.rb = t.rb
    JOIN pn ON pn.ra = t.ra AND pn.rb = t.rb
)
SELECT ra AS rater_a, rb AS rater_b,
    CAST(n_shared AS BIGINT) AS n_shared,
    CAST(n_agree AS BIGINT) AS n_agree,
    po, pe,
    CASE WHEN pe < 1.0 THEN ROUND((po - pe) / (1.0 - pe), 6) END AS kappa
FROM f"""


@register("arena_rater_kappa", _rater_kappa_oracle(), driver=False)
def q_rater_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Cohen's kappa over a deterministic 3-rater judgment
    stream (sparkfeat.arena.rater_agreement) — the above-chance
    agreement audit a labeling pipeline runs before its judgments train
    a reward model. The stream plants a shared ground label plus
    per-rater md5-bucket coverage (85%) and label-flip noise (15%), so
    observed agreement is high but kappa discounts the chance floor;
    the oracle replays the judgment mining, the item self-join, the
    confusion cells, both marginal vectors, and the rounded po/pe
    quotient end to end."""
    from sparkfeat.arena import rater_agreement

    return rater_agreement(_rater_judgments(spark, sf_dir))


def _fleiss_oracle(m: int = 3) -> str:
    arms = _rater_arms_sql()
    return f"""WITH base AS (
    SELECT doc_id,
        CASE WHEN (n_chars % 10) < 6 THEN 'good' ELSE 'bad' END AS b
    FROM documents
),
j AS ({arms}),
il AS (SELECT doc_id, l, COUNT(*) AS nik FROM j GROUP BY ALL),
nr AS (SELECT doc_id, r, COUNT(*) AS c FROM j GROUP BY ALL),
rc AS (SELECT doc_id, COUNT(*) AS nrr, SUM(c) AS nj FROM nr GROUP BY doc_id),
elig AS (SELECT doc_id FROM rc WHERE nrr = {m} AND nj = {m}),
pi AS (
    SELECT il.doc_id, SUM(nik * nik) AS sq
    FROM il JOIN elig USING (doc_id) GROUP BY il.doc_id
),
panel AS (SELECT COUNT(*) AS n_items, SUM(sq) AS ssq FROM pi),
lbl AS (
    SELECT l, SUM(nik) AS n_label
    FROM il JOIN elig USING (doc_id) GROUP BY l
),
lp AS (
    SELECT l AS label, n_label, n_items, ssq,
        ROUND(n_label / CAST(n_items * {m} AS DOUBLE), 9) AS pk
    FROM lbl, panel
),
st AS (
    SELECT MAX(n_items) AS n,
        ROUND(SUM(ROUND(pk * pk, 9)), 6) AS pe,
        ROUND(CAST(MAX(ssq) - MAX(n_items) * {m} AS DOUBLE)
              / CAST(MAX(n_items) * {m} * {m - 1} AS DOUBLE), 6) AS pbar
    FROM lp
)
SELECT label, CAST(n_label AS BIGINT) AS n_label,
    ROUND(pk, 6) AS p_label,
    CAST(n_items AS BIGINT) AS n_items,
    pbar AS p_bar, pe AS p_e,
    CASE WHEN pe < 1.0 THEN ROUND((pbar - pe) / (1.0 - pe), 6) END AS kappa
FROM lp, st"""


@register("arena_fleiss_kappa", _fleiss_oracle(), driver=False)
def q_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa over the 3-rater judgment stream
    (sparkfeat.arena.fleiss_kappa) — panel-level chance-corrected
    agreement on the items all three raters judged (the fixed-panel
    complement of the pairwise Cohen audit). Exact-integer in-plan
    arithmetic up to three rounded divisions; the oracle replays the
    per-item label-count squares, the exact-panel gate, the label
    shares, and the P̄/P̄ₑ/kappa solve termwise — the constant columns
    make the hash verify the statistic itself."""
    from sparkfeat.arena import fleiss_kappa

    return fleiss_kappa(_rater_judgments(spark, sf_dir), m=3)


# ---------------------------------------------------------------------------
# Corpus text normalization (sparkfeat.text.clean_text)
# ---------------------------------------------------------------------------

#: deterministic noise enrichment: the synthetic corpus is clean ASCII,
#: so the query plants doc_id-derived unicode noise — zero-width, NBSP,
#: curly quotes + em-dash + rsquo, a decomposed e+combining-acute (NFC
#: must compose it), a C0 control, double spaces — mirrored chr-for-chr
#: in the oracle. The scrub itself is the operator under test.
_CLEAN_AUG_SQL = (
    "text"
    " || CASE WHEN doc_id % 3 = 0 THEN ' a' || chr(8203) || 'b' ELSE '' END"
    " || CASE WHEN doc_id % 4 = 0 THEN ' c' || chr(160) || 'd' ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN ' ' || chr(8220) || 'q' || chr(8221)"
    " || ' ' || chr(8212) || ' don' || chr(8217) || 't' ELSE '' END"
    " || CASE WHEN doc_id % 7 = 0 THEN ' e' || chr(769) || 'clair' ELSE '' END"
    " || CASE WHEN doc_id % 11 = 0 THEN ' ctl' || chr(20) ELSE '' END"
    " || CASE WHEN doc_id % 2 = 0 THEN '  wide   gap' ELSE '' END"
)


def _clean_aug_col() -> Column:
    did = F.col("doc_id")
    br = [
        (3, " a​b"),
        (4, " c d"),
        (5, " “q” — don’t"),
        (7, " éclair"),
        (11, " ctl\x14"),
        (2, "  wide   gap"),
    ]
    return F.concat(
        F.col("text"),
        *[
            F.when(did % m == 0, F.lit(s)).otherwise(F.lit(""))
            for m, s in br
        ],
    )


def _clean_text_oracle() -> str:
    """Stepwise CTE chain mirroring clean_text (the _pii_oracle shape):
    NFC first, then each kind's count on the PREVIOUS kind's output.
    Patterns are embedded as resolved literal codepoints — the one
    escape dialect Java regex and RE2 agree on byte-for-byte."""
    from sparkfeat.text import CLEAN_PATTERNS

    steps, acc = [], []
    prev_tbl, prev_txt = "a", "t0"
    for i, (kind, pat, rep) in enumerate(CLEAN_PATTERNS):
        p, r = pat.replace("'", "''"), rep.replace("'", "''")
        carried = (", " + ", ".join(acc)) if acc else ""
        steps.append(
            f"s{i} AS (SELECT doc_id{carried}, "
            f"CAST(len(regexp_extract_all({prev_txt}, '{p}')) AS INT) AS n_{kind}, "
            f"regexp_replace({prev_txt}, '{p}', '{r}', 'g') AS t{i + 1} "
            f"FROM {prev_tbl})"
        )
        acc.append(f"n_{kind}")
        prev_tbl, prev_txt = f"s{i}", f"t{i + 1}"
    return (
        f"WITH raw AS (SELECT doc_id, {_CLEAN_AUG_SQL} AS t_raw FROM documents),\n"
        "a AS (SELECT doc_id, t_raw, nfc_normalize(t_raw) AS t0 FROM raw),\n"
        + ",\n".join(steps)
        + f",\nfin AS (SELECT {prev_tbl}.*, raw.t_raw,"
        f" trim(regexp_replace({prev_txt}, '  +', ' ', 'g')) AS tc"
        f" FROM {prev_tbl} JOIN raw USING (doc_id))\n"
        f"SELECT doc_id, {', '.join(acc)}, "
        "CAST(LENGTH(tc) AS INT) AS clean_len, md5(tc) AS clean_fp, "
        "(t_raw IS DISTINCT FROM tc) AS changed "
        "FROM fin"
    )


@register("doc_clean_text", _clean_text_oracle(), driver=False)
def q_clean_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus text normalization (sparkfeat.text.clean_text): strips
    control/zero-width codepoints, folds unicode spaces to ASCII,
    canonicalizes curly quotes and long dashes, collapses space runs,
    NFC-composes — the byte-noise cleanup that runs BEFORE any
    fingerprint/dedup stage so invisible characters can't split
    identical documents into different hashes. Map-only regexp chain
    (whole-stage codegen; NFC is the one Arrow crossing). The corpus
    is clean ASCII, so the query plants deterministic doc_id-derived
    noise (mirrored chr-for-chr in the oracle) covering every scrub
    kind plus a decomposed accent the NFC pass must compose; emits the
    cleaned text's length + md5 and the stepwise per-kind counts."""
    from sparkfeat.text import CLEAN_PATTERNS, clean_text

    docs = _docs(spark, sf_dir)
    aug = docs.select("doc_id", _clean_aug_col().alias("text"))
    out = clean_text(aug, nfc=True)
    kinds = [f"n_{k}" for k, _, _ in CLEAN_PATTERNS]
    return out.select(
        "doc_id",
        *kinds,
        F.length("clean_text").cast("int").alias("clean_len"),
        F.md5("clean_text").alias("clean_fp"),
        "changed",
    )


# ---------------------------------------------------------------------------
# Length-bucketed dynamic-batching manifest (sparkfeat.corpus.length_batches)
# ---------------------------------------------------------------------------


def _length_batches_oracle(
    width: int = 16,
    budget: int = 256,
    cap: int = 512,
    shards: int = 64,
    seed: str = "0",
) -> str:
    return f"""WITH t AS (
    SELECT doc_id,
        len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                        x -> x <> '')) AS n_tok,
        md5('{seed}:' || CAST(doc_id AS VARCHAR)) AS skey
    FROM documents
),
d AS (
    SELECT doc_id, n_tok, skey,
        CAST({_hex_bucket_sql("doc_id", 1, shards, hexpr="skey")} AS INT)
            AS shard,
        LEAST(n_tok, {cap}) AS capt
    FROM t WHERE n_tok > 0
),
b AS (
    SELECT *,
        CAST((capt - 1) // {width} AS INT) AS bucket,
        CAST(((capt - 1) // {width} + 1) * {width} AS INT) AS pad_len
    FROM d
),
s AS (
    SELECT *,
        CAST(GREATEST(FLOOR({budget}.0 / pad_len), 1) AS INT) AS batch_size,
        ROW_NUMBER() OVER (
            PARTITION BY bucket ORDER BY shard, skey, doc_id) - 1 AS rnk
    FROM b
)
SELECT doc_id,
    CAST(n_tok AS BIGINT) AS n_tok,
    bucket, pad_len, batch_size,
    CAST((rnk - (rnk % batch_size)) // batch_size AS BIGINT) AS batch_id,
    CAST(rnk % batch_size AS INT) AS pos_in_batch,
    CAST(pad_len - capt AS INT) AS pad_waste,
    CAST(n_tok - capt AS BIGINT) AS n_trunc_tokens
FROM s"""


@register("corpus_length_batches", _length_batches_oracle(), driver=False)
def q_length_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed max-tokens batching manifest
    (sparkfeat.corpus.length_batches): examples bucketed by token
    length (width 16, capped at 512), padded to the bucket edge, packed
    into 256-padded-token batches in deterministic md5-shuffled order —
    the instruction-tuning/eval loader's dynamic batching, with
    examples ATOMIC (vs pack_sequences' concat-and-split). The oracle
    replays the token count, hex shard, bucket/pad/batch-size integer
    math, and the two-phase rank as one direct per-bucket window —
    exactness of the shard-offset composition is what's under test."""
    from sparkfeat.corpus import length_batches

    return length_batches(
        _docs(spark, sf_dir),
        bucket_width=16,
        max_batch_tokens=256,
        cap_tokens=512,
        shards=64,
        seed="0",
    )


# ---------------------------------------------------------------------------
# Transcript-curation audits: response echo rate, stuck loops, judge
# length bias (sparkfeat.conv.echo_stats / conv.stuck_loops /
# arena.length_bias)
# ---------------------------------------------------------------------------

_ECHO_ORACLE = f"""WITH {TRANSCRIPTS_CTE},
l AS (
    SELECT conv_id, role, text,
        LAG(text) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_text
    FROM transcripts
),
e AS (
    SELECT conv_id,
        len(list_intersect(list_distinct(string_split(text, ' ')),
                           list_distinct(string_split(prev_text, ' '))))
            / CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
            AS echo
    FROM l
    WHERE role = 'assistant' AND prev_text IS NOT NULL AND text IS NOT NULL
)
SELECT conv_id,
    CAST(COUNT(*) AS BIGINT) AS n_responses,
    ROUND(AVG(echo), 6) AS mean_echo,
    ROUND(MAX(echo), 6) AS max_echo,
    CAST(SUM(CASE WHEN echo >= 1.0 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_full_echo
FROM e GROUP BY conv_id"""


@register("conv_echo_stats", _ECHO_ORACLE, driver=False)
def q_conv_echo_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Response parroting audit (sparkfeat.conv.echo_stats): per
    conversation, the distinct-token containment of each assistant
    turn in the turn immediately before it — mean/max echo and the
    count of pure-parrot (echo == 1) turns. One conv_id exchange; the
    oracle replays the lag, both distinct-token sets, the intersection
    ratio, and the per-conversation fold with DuckDB list algebra."""
    from sparkfeat.conv import echo_stats

    return echo_stats(transcripts_from_events(spark, sf_dir))


#: stuck-loop driver input: the wedged-agent signature is repeating the
#: same CALL, so the loop key coarsens text to its first token (the
#: event_type in the deterministic transcript derivation) — consecutive
#: same-type events by one user then form genuine loops in the testdata.
_STUCK_ORACLE = f"""WITH {TRANSCRIPTS_CTE},
f AS (
    SELECT conv_id, turn_idx,
        CASE WHEN ROW_NUMBER() OVER w > 1
              AND role IS NOT DISTINCT FROM LAG(role) OVER w
              AND tool IS NOT DISTINCT FROM LAG(tool) OVER w
              AND string_split(text, ' ')[1]
                  IS NOT DISTINCT FROM LAG(string_split(text, ' ')[1]) OVER w
             THEN 1 ELSE 0 END AS rep
    FROM transcripts
    WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
i AS (
    SELECT conv_id, rep,
        SUM(1 - rep) OVER (PARTITION BY conv_id ORDER BY turn_idx
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS isl
    FROM f
),
b AS (
    SELECT conv_id, isl, COUNT(*) AS blen, SUM(rep) AS nrep
    FROM i GROUP BY conv_id, isl
)
SELECT conv_id,
    CAST(SUM(blen) AS BIGINT) AS n_turns,
    CAST(SUM(nrep) AS BIGINT) AS n_repeated_turns,
    CAST(MAX(blen) AS BIGINT) AS max_loop_len,
    ROUND(SUM(nrep) / CAST(SUM(blen) AS DOUBLE), 6) AS loop_frac
FROM b GROUP BY conv_id"""


@register("conv_stuck_loops", _STUCK_ORACLE, driver=False)
def q_conv_stuck_loops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stuck-loop detection (sparkfeat.conv.stuck_loops) over the
    call-signature view of the transcript (text coarsened to its first
    token = the event type, so a user repeating the same action forms
    a genuine loop): per conversation, the longest identical block,
    the redundant turn count a loop-cut would remove, and the repeated
    fraction. The oracle replays the null-safe lag compare, the
    gaps-and-islands running sum, and both folds."""
    from sparkfeat.conv import stuck_loops

    t = transcripts_from_events(spark, sf_dir).withColumn(
        "text", F.element_at(F.split(F.col("text"), " "), 1)
    )
    return stuck_loops(t)


_LENGTH_BIAS_ORACLE = """WITH e AS (
    SELECT doc_id // 2 AS half, n_chars AS c_e
    FROM documents WHERE doc_id % 2 = 0
),
o AS (
    SELECT doc_id // 2 AS half, n_chars AS c_o
    FROM documents WHERE doc_id % 2 = 1
),
j AS (
    SELECT CASE WHEN c_e >= c_o THEN c_e ELSE c_o END AS wl,
           CASE WHEN c_e >= c_o THEN c_o ELSE c_e END AS ll
    FROM e JOIN o USING (half)
    WHERE c_e > 0 AND c_o > 0
),
a AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_judgments,
        CAST(SUM(CASE WHEN wl > ll THEN 1 ELSE 0 END) AS BIGINT)
            AS n_longer_wins,
        CAST(SUM(CASE WHEN wl < ll THEN 1 ELSE 0 END) AS BIGINT)
            AS n_shorter_wins,
        CAST(SUM(CASE WHEN wl = ll THEN 1 ELSE 0 END) AS BIGINT)
            AS n_length_ties,
        AVG(LN(CAST(wl AS DOUBLE) / ll)) AS mlr
    FROM j
)
SELECT n_judgments, n_longer_wins, n_shorter_wins, n_length_ties,
    ROUND(CASE WHEN n_longer_wins + n_shorter_wins > 0 THEN
        n_longer_wins / CAST(n_longer_wins + n_shorter_wins AS DOUBLE)
        END, 6) AS longer_win_rate,
    ROUND(mlr, 6) AS mean_log_ratio,
    ROUND(CASE WHEN n_longer_wins + n_shorter_wins > 0 THEN
        (n_longer_wins / CAST(n_longer_wins + n_shorter_wins AS DOUBLE)
         - 0.5) * 2.0 * SQRT(CAST(n_longer_wins + n_shorter_wins AS DOUBLE))
        END, 6) AS bias_z
FROM a"""


@register("arena_length_bias", _LENGTH_BIAS_ORACLE, driver=False)
def q_arena_length_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Judge length-bias audit (sparkfeat.arena.length_bias) over the
    same synthetic doc-vs-doc judge the BT/winrate queries mine — that
    judge decides BY length, so the audit must flag it at the maximum:
    longer_win_rate 1.0 on every decisive pair and a bias_z equal to
    +sqrt(n_decisive), with mean_log_ratio the judge's effect size.
    The oracle replays the pairing, the decisive-direction counts, the
    sign-test rate/z, and the log-ratio mean closed-form."""
    from sparkfeat.arena import length_bias

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = d.filter(F.col("doc_id") % 2 == 0).select(
        F.expr("doc_id div 2").alias("half"), F.col("n_chars").alias("c_e")
    )
    od = d.filter(F.col("doc_id") % 2 == 1).select(
        F.expr("doc_id div 2").alias("half"), F.col("n_chars").alias("c_o")
    )
    won = F.col("c_e") >= F.col("c_o")
    judg = ev.join(od, "half").select(
        F.when(won, F.col("c_e")).otherwise(F.col("c_o")).alias("winner_len"),
        F.when(won, F.col("c_o")).otherwise(F.col("c_e")).alias("loser_len"),
    )
    return length_bias(judg)


_TRUNC_ORACLE = f"""WITH {TRANSCRIPTS_CTE},
t AS (
    SELECT conv_id, turn_idx, role, text, tool, ts,
        SUM(GREATEST(COALESCE(len(string_split(text, ' ')), 0), 0))
            OVER (PARTITION BY conv_id ORDER BY turn_idx DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS suffix_tokens,
        ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn
    FROM transcripts
)
SELECT conv_id, turn_idx, role, text, tool, ts,
    CAST(suffix_tokens AS BIGINT) AS suffix_tokens,
    (rn = 1 AND NOT suffix_tokens <= 64) AS pinned_head
FROM t WHERE suffix_tokens <= 64 OR rn = 1"""


@register("conv_truncate_context", _TRUNC_ORACLE, driver=False)
def q_conv_truncate_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turn-granular context-window fitting
    (sparkfeat.conv.truncate_context, max_tokens=64): every
    conversation keeps the newest whole-turn suffix that fits the
    budget plus the pinned opener. The oracle replays the reverse
    cumulative token sum, the contiguous-tail filter, and the
    pinned-head flag row-for-row (suffix_tokens is part of the output,
    so the hash verifies the budget algebra, not just membership)."""
    from sparkfeat.conv import truncate_context

    return truncate_context(
        transcripts_from_events(spark, sf_dir), max_tokens=64
    )


#: shared-opener driver input: openers are mined on the call-signature
#: view (text coarsened to the event type, as in conv_stuck_loops) so
#: the deterministic testdata has genuine template groups.
_OPENERS_ORACLE = f"""WITH {TRANSCRIPTS_CTE},
op AS (
    SELECT conv_id, MIN_BY(string_split(text, ' ')[1], turn_idx) AS opener
    FROM transcripts WHERE role = 'user'
    GROUP BY conv_id
),
g AS (
    SELECT opener AS opener_text, CAST(COUNT(*) AS BIGINT) AS n_convs,
           MIN(conv_id) AS sample_conv
    FROM op WHERE opener IS NOT NULL
    GROUP BY opener
    HAVING COUNT(*) >= 2
)
SELECT md5(opener_text) AS opener_fp, opener_text, n_convs, sample_conv
FROM g"""


@register("conv_shared_openers", _OPENERS_ORACLE, driver=False)
def q_conv_shared_openers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template-spam detection (sparkfeat.conv.shared_openers) on the
    call-signature view of the transcript (text coarsened to its first
    token = the event type, so the synthetic corpus has real template
    groups): conversations grouped by their first user turn, groups of
    ≥2 reported with the house smallest-id representative. The oracle
    replays the min_by opener pick, the rollup, and the md5 join
    key."""
    from sparkfeat.conv import shared_openers

    t = transcripts_from_events(spark, sf_dir).withColumn(
        "text", F.element_at(F.split(F.col("text"), " "), 1)
    )
    return shared_openers(t)


_DIVERSITY_ORACLE = """WITH w AS (
    SELECT source,
        list_filter(regexp_split_to_array(lower(text), '\\s+'),
                    x -> x <> '') AS ws
    FROM documents
),
g AS (
    SELECT source, 1 AS n, unnest(ws) AS gram FROM w
    UNION ALL
    SELECT source, 2 AS n,
        unnest(list_transform(generate_series(0, len(ws) - 2),
                              i -> ws[i + 1] || ' ' || ws[i + 2])) AS gram
    FROM w WHERE len(ws) >= 2
    UNION ALL
    SELECT source, 3 AS n,
        unnest(list_transform(generate_series(0, len(ws) - 3),
            i -> ws[i + 1] || ' ' || ws[i + 2] || ' ' || ws[i + 3])) AS gram
    FROM w WHERE len(ws) >= 3
),
c AS (
    SELECT source, n, gram, COUNT(*) AS cnt
    FROM g GROUP BY source, n, gram
)
SELECT source, n,
    CAST(SUM(cnt) AS BIGINT) AS total_grams,
    CAST(COUNT(*) AS BIGINT) AS distinct_grams,
    ROUND(COUNT(*) / CAST(SUM(cnt) AS DOUBLE), 6) AS distinct_ratio
FROM c GROUP BY source, n"""


@register("corpus_ngram_diversity", _DIVERSITY_ORACLE, driver=False)
def q_corpus_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-n diversity profile (sparkfeat.text.ngram_diversity,
    n=1..3) per source — the templated-source screen. One scan, one
    explode (all three gram lattices tagged in-row), two
    map-side-combinable groupBys; the oracle rebuilds each lattice
    positionally and replays both folds."""
    from sparkfeat.text import ngram_diversity

    return ngram_diversity(_docs(spark, sf_dir), max_n=3)


_ZIPF_ORACLE = """WITH t AS (
    SELECT source,
        unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                           x -> x <> '')) AS term
    FROM documents
),
c AS (SELECT source, term, COUNT(*) AS freq FROM t GROUP BY source, term),
r AS (
    SELECT source, term, freq,
        ROW_NUMBER() OVER (PARTITION BY source
                           ORDER BY freq DESC, term ASC) AS rank
    FROM c
),
kk AS (SELECT * FROM r WHERE rank <= 100),
s AS (
    SELECT source, COUNT(*) AS n,
        MAX(CASE WHEN rank = 1 THEN term END) AS top_term,
        MAX(CASE WHEN rank = 1 THEN freq END) AS top_freq,
        SUM(log10(rank)) AS sx, SUM(log10(freq)) AS sy,
        SUM(log10(rank) * log10(freq)) AS sxy,
        SUM(log10(rank) * log10(rank)) AS sxx,
        SUM(log10(freq) * log10(freq)) AS syy
    FROM kk GROUP BY source
)
SELECT source,
    CAST(n AS BIGINT) AS n_ranks,
    top_term,
    CAST(top_freq AS BIGINT) AS top_freq,
    ROUND(CASE WHEN n * sxx - sx * sx > 0
        THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END, 6)
        AS zipf_slope,
    ROUND(CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        THEN (n * sxy - sx * sy) * (n * sxy - sx * sy)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)) END, 6)
        AS zipf_r2
FROM s"""


@register("corpus_zipf_fit", _ZIPF_ORACLE, driver=False)
def q_corpus_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit (sparkfeat.text.zipf_fit, top-100 tokens) per
    source: closed-form OLS of log10(freq) on log10(rank) with r² —
    the power-law distribution audit. The oracle replays the counts,
    the freq-desc/term-asc rank, the rank-1 pick, and every moment sum
    of the regression, so the hash verifies the fit algebra itself."""
    from sparkfeat.text import zipf_fit

    return zipf_fit(_docs(spark, sf_dir), k=100)


def _langid_agreement_oracle() -> str:
    """Wrap the full lang-ID replay as a subquery and roll it up
    against the corpus's own lang labels per source."""
    pred = _lang_ngram_oracle()
    return f"""SELECT d.source,
    CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(CASE WHEN p.lang_ngram <> 'unknown' THEN 1 ELSE 0 END)
        AS BIGINT) AS n_detected,
    CAST(SUM(CASE WHEN p.lang_ngram <> 'unknown'
                   AND p.lang_ngram = d.lang THEN 1 ELSE 0 END)
        AS BIGINT) AS n_match,
    ROUND(CASE WHEN SUM(CASE WHEN p.lang_ngram <> 'unknown' THEN 1
                        ELSE 0 END) > 0 THEN
        SUM(CASE WHEN p.lang_ngram <> 'unknown'
                  AND p.lang_ngram = d.lang THEN 1.0 ELSE 0.0 END)
        / SUM(CASE WHEN p.lang_ngram <> 'unknown' THEN 1.0 ELSE 0.0 END)
        END, 6) AS agreement,
    ROUND(SUM(CASE WHEN p.lang_ngram = 'unknown' THEN 1.0 ELSE 0.0 END)
        / COUNT(*), 6) AS unknown_rate
FROM documents d JOIN ({pred}) p USING (doc_id)
GROUP BY d.source"""


@register("corpus_langid_agreement", _langid_agreement_oracle(), driver=False)
def q_corpus_langid_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-QA audit (sparkfeat.text.langid_agreement): per-source
    agreement between the corpus's own lang labels and the
    content-based Arrow lang-ID kernel, with the unknown rate that
    bounds the audit's own signal. The oracle wraps the full
    Cavnar-Trenkle SQL replay as a subquery and rolls it up against
    the labels — detection AND aggregation are both hash-verified."""
    from sparkfeat.text import langid_agreement

    return langid_agreement(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# Conversation serving-cost profile + turn-pattern screen
# (sparkfeat.conv.context_cost / conv.pattern_screen)
# ---------------------------------------------------------------------------

_CONTEXT_COST_ORACLE = f"""WITH {TRANSCRIPTS_CTE},
tok AS (
    SELECT conv_id, turn_idx,
        CASE WHEN role = 'assistant' THEN 1 ELSE 0 END AS gen,
        CASE WHEN text IS NULL THEN 0
             ELSE len(string_split(text, ' ')) END AS tok
    FROM transcripts
),
c AS (
    SELECT conv_id, gen, tok,
        SUM(tok) OVER (PARTITION BY conv_id ORDER BY turn_idx
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS cum
    FROM tok
)
SELECT conv_id,
    CAST(COUNT(*) AS BIGINT) AS n_turns,
    CAST(SUM(gen) AS BIGINT) AS n_gen_turns,
    CAST(SUM(tok) AS BIGINT) AS total_tokens,
    CAST(COALESCE(SUM(CASE WHEN gen = 1 THEN cum END), 0) AS BIGINT)
        AS prefill_tokens,
    CAST(MAX(CASE WHEN gen = 1 THEN cum END) AS BIGINT) AS peak_context,
    ROUND(SUM(CASE WHEN gen = 1
                   THEN CAST(cum AS DOUBLE) * cum END), 6) AS attn_cost
FROM c GROUP BY conv_id"""


@register("conv_context_cost", _CONTEXT_COST_ORACLE, driver=False)
def q_conv_context_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-growth / serving-cost profile (sparkfeat.conv.
    context_cost): per conversation, the linear prefill cost (sum of
    running token totals at assistant turns), the context high-water
    mark, and the quadratic-attention proxy — what a packing/budgeting
    pass charges a conversation before admitting it. The oracle
    replays the token estimate, the inclusive running sum, and every
    conditional fold."""
    from sparkfeat.conv import context_cost

    return context_cost(transcripts_from_events(spark, sf_dir))


#: screen driver input: the deterministic transcript derivation pads
#: text with ``repeat(' extra', event_id % 5)``, so "extra extra extra"
#: is genuine boilerplate that ~2/5 of assistant turns carry — the
#: pattern fires with real per-conversation rate variation.
_PATTERN_SCREEN_ORACLE = f"""WITH {TRANSCRIPTS_CTE},
f AS (
    SELECT conv_id, turn_idx,
        CASE WHEN text IS NOT NULL
              AND regexp_matches(text, '(?:extra extra extra)')
             THEN 1 ELSE 0 END AS flag
    FROM transcripts
    WHERE role = 'assistant'
)
SELECT conv_id,
    CAST(COUNT(*) AS BIGINT) AS n_role_turns,
    CAST(SUM(flag) AS BIGINT) AS n_flagged,
    ROUND(SUM(flag) / CAST(COUNT(*) AS DOUBLE), 6) AS flag_rate,
    CAST(MIN(CASE WHEN flag = 1 THEN turn_idx END) AS INTEGER)
        AS first_flag_turn,
    CAST(CASE WHEN SUM(flag) / CAST(COUNT(*) AS DOUBLE) <= 0.5
              THEN 1 ELSE 0 END AS INTEGER) AS keep
FROM f GROUP BY conv_id"""


@register("conv_pattern_screen", _PATTERN_SCREEN_ORACLE, driver=False)
def q_conv_pattern_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Refusal/boilerplate turn-pattern screen (sparkfeat.conv.
    pattern_screen) over assistant turns, flagging the 3-repeat
    boilerplate template the deterministic transcripts genuinely carry:
    per-conversation flag counts, rate, first flagged turn, and the
    keep verdict at max_flag_rate=0.5. The oracle replays the regex
    flag and the whole rollup."""
    from sparkfeat.conv import pattern_screen

    return pattern_screen(
        transcripts_from_events(spark, sf_dir),
        patterns=["extra extra extra"],
        role="assistant",
        max_flag_rate=0.5,
    )


_NEAR_LOOPS_ORACLE = f"""WITH {TRANSCRIPTS_CTE},
p AS (
    SELECT conv_id, turn_idx,
        substring(text, 1, 1000) AS cur,
        LAG(substring(text, 1, 1000)) OVER w AS prev,
        (role IS NOT DISTINCT FROM LAG(role) OVER w) AS same_role
    FROM transcripts
    WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
f AS (
    SELECT conv_id, turn_idx,
        CASE WHEN cur IS NOT NULL AND prev IS NOT NULL AND same_role
             THEN 1 ELSE 0 END AS pair,
        CASE WHEN cur IS NULL OR prev IS NULL OR NOT same_role THEN 0
             WHEN abs(length(cur) - length(prev))
                  > 0.3 * greatest(length(cur), length(prev), 1) THEN 0
             WHEN cur = prev THEN 1
             WHEN levenshtein(cur, prev)
                  / CAST(greatest(length(cur), length(prev), 1) AS DOUBLE)
                  <= 0.3 THEN 1
             ELSE 0 END AS near
    FROM p
),
i AS (
    SELECT conv_id, pair, near,
        SUM(1 - near) OVER (PARTITION BY conv_id ORDER BY turn_idx
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS isl
    FROM f
),
b AS (
    SELECT conv_id, isl, SUM(pair) AS np, SUM(near) AS nn
    FROM i GROUP BY conv_id, isl
)
SELECT conv_id,
    CAST(SUM(np) AS BIGINT) AS n_pairs,
    CAST(SUM(nn) AS BIGINT) AS n_near,
    ROUND(SUM(nn) / CAST(SUM(np) AS DOUBLE), 6) AS near_frac,
    CAST(MAX(nn) AS BIGINT) AS max_near_run
FROM b GROUP BY conv_id
HAVING SUM(np) > 0"""


@register("conv_near_loops", _NEAR_LOOPS_ORACLE, driver=False)
def q_conv_near_loops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-loop detection (sparkfeat.conv.near_loops): consecutive
    same-role turns within normalized edit distance 0.3 — the
    rephrased-retry wedge exact stuck_loops misses. The synthetic
    transcripts carry genuine near-pairs (same event type, different
    payload digits) and genuine far-pairs (the boilerplate padding
    swings lengths past the prune bound). The oracle replays the
    substring cap, the lossless length prune, the levenshtein ratio,
    and the gaps-and-islands run algebra."""
    from sparkfeat.conv import near_loops

    return near_loops(
        transcripts_from_events(spark, sf_dir), threshold=0.3, prefix=1000
    )


_WINDOW_FIT_ORACLE = f"""WITH {TRANSCRIPTS_CTE},
totals AS (
    SELECT conv_id,
        SUM(CASE WHEN text IS NULL THEN 0
                 ELSE len(string_split(text, ' ')) END) AS total
    FROM transcripts GROUP BY conv_id
),
lat AS (
    SELECT t.total, w.win
    FROM totals t CROSS JOIN (VALUES (64), (256), (1024), (4096)) w(win)
)
SELECT win AS "window",
    CAST(COUNT(*) AS BIGINT) AS n_convs,
    CAST(SUM(CASE WHEN total <= win THEN 1 ELSE 0 END) AS BIGINT)
        AS n_fit,
    ROUND(SUM(CASE WHEN total <= win THEN 1 ELSE 0 END)
          / CAST(COUNT(*) AS DOUBLE), 6) AS frac_fit,
    CAST(SUM(total) AS BIGINT) AS tokens_total,
    CAST(SUM(LEAST(total, win)) AS BIGINT) AS tokens_kept,
    ROUND(SUM(LEAST(total, win)) / CAST(SUM(total) AS DOUBLE), 6)
        AS token_coverage
FROM lat GROUP BY win"""


@register("conv_window_fit", _WINDOW_FIT_ORACLE, driver=False)
def q_conv_window_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window fit histogram (sparkfeat.conv.window_fit) at
    64/256/1024/4096 tokens: fraction of conversations fully fitting
    and corpus-token coverage under head truncation, per candidate
    window — the max_seq_len planning table. The oracle replays the
    per-conversation totals, the window lattice, and both coverage
    folds."""
    from sparkfeat.conv import window_fit

    return window_fit(
        transcripts_from_events(spark, sf_dir),
        windows=[64, 256, 1024, 4096],
    )


def _keep_best_oracle() -> str:
    """The neardup_clusters closure plus the quality-aware pick:
    representative = argmax(n_chars), ties broken by smallest id —
    replayed as a per-cluster ROW_NUMBER window."""
    return f"""WITH RECURSIVE pairs AS (
    SELECT id_a, id_b FROM ({_minhash_oracle()}) _mh
),
edges AS (
    SELECT id_a AS u, id_b AS v FROM pairs
    UNION
    SELECT id_b, id_a FROM pairs
),
reach(n, r) AS (
    SELECT u, u FROM edges
    UNION
    SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.n
),
lab AS (SELECT n AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY n),
alldocs AS (
    SELECT d.doc_id, d.n_chars,
        COALESCE(lab.cluster_id, d.doc_id) AS cluster_id
    FROM documents d LEFT JOIN lab USING (doc_id)
),
sizes AS (
    SELECT cluster_id, COUNT(*) AS cluster_size
    FROM alldocs GROUP BY cluster_id
),
reps AS (
    SELECT cluster_id, doc_id AS rep_id FROM (
        SELECT cluster_id, doc_id,
            ROW_NUMBER() OVER (PARTITION BY cluster_id
                               ORDER BY n_chars DESC, doc_id ASC) AS rn
        FROM alldocs
    ) WHERE rn = 1
)
SELECT a.doc_id, a.n_chars, a.cluster_id, s.cluster_size, r.rep_id,
       a.doc_id = r.rep_id AS keep
FROM alldocs a JOIN sizes s USING (cluster_id)
JOIN reps r USING (cluster_id)"""


@register("dedup_cluster_keep_best", _keep_best_oracle(), driver=False)
def q_dedup_cluster_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical keep-list (sparkfeat.dedup.
    cluster_keep_best) over the MinHash near-dup clusters: keep the
    LONGEST doc (n_chars, ties -> smallest id) per duplicate cluster
    instead of the min-id pick — the rule that keeps the full crawl of
    a page over its truncated copy. Cluster labels stay min-id so
    cluster identity is score-independent. The oracle extends the
    recursive-CTE closure with the same argmax window."""
    from sparkfeat.dedup import cluster_keep_best, minhash_lsh_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = minhash_lsh_pairs(docs, num_perm=64, bands=16, shingle_n=2).filter(
        F.col("est_jaccard") >= 0.5
    )
    return cluster_keep_best(docs, pairs, score_col="n_chars")


def _fertility_oracle(n_merges: int = 6) -> str:
    """Wrap the full encode oracle (merge table derived IN SQL, applied
    in training order) and roll it up per source with the encoder's own
    whitespace word count — fertility AND compression are hash-checked
    on top of an already-verified encode."""
    return f"""SELECT d.source,
    CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(d.words) AS BIGINT) AS n_words,
    CAST(SUM(e.n_bpe_tokens) AS BIGINT) AS n_bpe_tokens,
    CAST(SUM(d.chars) AS BIGINT) AS n_chars,
    ROUND(SUM(e.n_bpe_tokens)
          / CAST(NULLIF(SUM(d.words), 0) AS DOUBLE), 6) AS fertility,
    ROUND(SUM(d.chars)
          / CAST(NULLIF(SUM(e.n_bpe_tokens), 0) AS DOUBLE), 6)
        AS chars_per_token
FROM ({_bpe_encode_oracle(n_merges)}) e
JOIN (
    SELECT doc_id, source,
        CASE WHEN text IS NULL THEN 0
             ELSE len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                  x -> x <> '')) END AS words,
        CASE WHEN text IS NULL THEN 0 ELSE length(text) END AS chars
    FROM documents
) d USING (doc_id)
GROUP BY d.source"""


@register("bpe_fertility", _fertility_oracle(), driver=False)
def q_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit (sparkfeat.bpe.fertility_stats): train
    6 merges, encode the corpus in the SAME single scan (passthrough
    projection, no join), and report BPE-tokens-per-word and
    chars-per-token per source — the table that converts byte budgets
    into token budgets and flags slices the tokenizer fragments. The
    oracle derives the merge table in SQL, replays the encode, and
    hash-checks the per-source folds."""
    from sparkfeat.bpe import fertility_stats, train_bpe

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = train_bpe(docs, n_merges=6)
    return fertility_stats(docs, merges)


# ---------------------------------------------------------------------------
# Rolling autocorrelation (sparkfeat.transforms.rolling_autocorr)
# ---------------------------------------------------------------------------


def _autocorr_oracle(
    window: int = 8, min_periods: int = 3, lags: tuple[int, ...] = (1, 2)
) -> str:
    moments, sel = [], []
    for k in lags:
        c = f"y IS NOT NULL AND y{k} IS NOT NULL"
        moments.append(f"""
    CAST(COUNT(CASE WHEN {c} THEN 1 END) OVER w AS DOUBLE) AS n{k},
    SUM(CASE WHEN {c} THEN y END) OVER w AS sx{k},
    SUM(CASE WHEN {c} THEN y{k} END) OVER w AS sy{k},
    SUM(CASE WHEN {c} THEN y * y END) OVER w AS sxx{k},
    SUM(CASE WHEN {c} THEN y{k} * y{k} END) OVER w AS syy{k},
    SUM(CASE WHEN {c} THEN y * y{k} END) OVER w AS sxy{k}""")
        sel.append(f"""ROUND(CASE WHEN n{k} >= {min_periods}
              AND (n{k} * sxx{k} - sx{k} * sx{k}) > 0
              AND (n{k} * syy{k} - sy{k} * sy{k}) > 0
        THEN (n{k} * sxy{k} - sx{k} * sy{k})
             / SQRT((n{k} * sxx{k} - sx{k} * sx{k})
                    * (n{k} * syy{k} - sy{k} * sy{k})) END, 6)
      AS acf{k}""")
    lag_cols = ", ".join(f"LAG(y, {k}) OVER pw AS y{k}" for k in lags)
    return f"""WITH {TRANSCRIPTS_CTE},
s AS (
  SELECT conv_id, turn_idx, ts, CAST(LENGTH(text) AS DOUBLE) AS y
  FROM transcripts
),
l AS (
  SELECT conv_id, turn_idx, ts, y, {lag_cols}
  FROM s
  WINDOW pw AS (PARTITION BY conv_id ORDER BY ts, turn_idx)
),
m AS (
  SELECT conv_id, turn_idx,{",".join(moments)}
  FROM l
  WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx
               ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW)
)
SELECT conv_id, turn_idx, {", ".join(sel)}
FROM m"""


@register("turn_autocorr", _autocorr_oracle(), driver=False)
def q_turn_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling lag-1/lag-2 autocorrelation of text_len over the
    trailing 8 turns (sparkfeat.transforms.rolling_autocorr) — the
    serial-dependence member of the closed-form window-stat family
    (Box–Jenkins ACF restricted to a trailing frame): lag() feeds the
    six rolling_corr sums on the SAME single conv_id exchange, zero
    UDFs, trailing-only = leakage-free. Integer signal keeps every sum
    exact in doubles and sqrt is IEEE-exact, so the oracle's identical
    normal-form arithmetic hash-matches at 6 dp."""
    t = with_turn_signals(transcripts_from_events(spark, sf_dir))
    return t.select(
        "conv_id",
        "turn_idx",
        _r(T.rolling_autocorr("text_len", 1, 8)).alias("acf1"),
        _r(T.rolling_autocorr("text_len", 2, 8)).alias("acf2"),
    )


# ---------------------------------------------------------------------------
# MAD robust scaler / modified z-score outliers (sparkfeat.normalize)
# ---------------------------------------------------------------------------


def _mad_oracle(threshold: float = 3.5) -> str:
    from sparkfeat.normalize import MAD_CONSISTENCY

    return f"""WITH {TRANSCRIPTS_CTE},
s AS (
  SELECT conv_id, turn_idx, CAST(LENGTH(text) AS DOUBLE) AS y
  FROM transcripts
),
m1 AS (SELECT conv_id, quantile_cont(y, 0.5) AS med FROM s GROUP BY conv_id),
m2 AS (
  SELECT s.conv_id, quantile_cont(ABS(y - med), 0.5) AS mad
  FROM s JOIN m1 USING (conv_id) GROUP BY s.conv_id
),
z AS (
  SELECT s.conv_id, s.turn_idx,
    {MAD_CONSISTENCY!r} * (y - med) / NULLIF(mad, 0.0) AS zraw
  FROM s JOIN m1 USING (conv_id) JOIN m2 USING (conv_id)
)
SELECT conv_id, turn_idx, ROUND(zraw, 6) AS mad_z,
  ABS(zraw) > {threshold!r} AS is_outlier
FROM z"""


@register("mad_outliers", _mad_oracle(), driver=False)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation modified z-score + Iglewicz–Hoaglin outlier
    flag on text_len (sparkfeat.normalize.fit_mad / apply_mad_z) — the
    50%-breakdown robust outlier screen the N1 scaler family stops
    short of (robust scales by IQR; MAD survives up to half the values
    being garbage — the right default for heavy-tailed web text). Two
    exact-percentile passes fit the (med, MAD) artifact, a broadcast
    LEFT join applies it; the flag compares the UNROUNDED z on both
    engines so the hash verifies the screen itself, threshold
    included."""
    from sparkfeat.normalize import apply_mad_z, fit_mad

    t = with_turn_signals(transcripts_from_events(spark, sf_dir))
    sig = t.select(
        "conv_id",
        "turn_idx",
        F.col("text_len").cast("double").alias("y"),
    )
    out = apply_mad_z(sig, fit_mad(sig, "y"), "y")
    return out.select(
        "conv_id",
        "turn_idx",
        _r(F.col("mad_z")).alias("mad_z"),
        "is_outlier",
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (sparkfeat.text.winnow_fingerprints / winnow_pairs)
# ---------------------------------------------------------------------------


def _hex_int10_sql(hexpr: str) -> str:
    """First 10 hex digits of a hex-string expression as a BIGINT (40
    bits) — the positional-strpos recipe of _hex_int12_sql, two digits
    shorter so hash·2^20 + pos stays inside 63 signed bits."""
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr({hexpr}, {j + 1}, 1)) - 1)"
        f" * {16 ** (9 - j)}"
        for j in range(10)
    )
    return f"({terms})"


def _winnow_ctes(k: int, w: int) -> str:
    from sparkfeat.text import _WPOS

    return f"""n AS (
  SELECT doc_id, regexp_replace(lower(text), '\\s+', ' ', 'g') AS norm
  FROM documents WHERE text IS NOT NULL
),
g0 AS (
  SELECT doc_id, norm,
    unnest(range(0, GREATEST(LENGTH(norm) - {k} + 1, 0))) AS pos
  FROM n
),
g AS (
  SELECT doc_id, CAST(pos AS INT) AS pos,
    {_hex_int10_sql(f"md5(substr(norm, CAST(pos AS INT) + 1, {k}))")} AS h40
  FROM g0
),
kx AS (
  SELECT doc_id, pos,
    MIN(h40 * {_WPOS} + ({_WPOS - 1} - pos)) OVER
      (PARTITION BY doc_id ORDER BY pos
       ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW) AS kmin,
    MAX(pos) OVER (PARTITION BY doc_id) AS maxpos
  FROM g
),
sel AS (
  SELECT DISTINCT doc_id, kmin // {_WPOS} AS fp,
    CAST({_WPOS - 1} - (kmin % {_WPOS}) AS INT) AS pos
  FROM kx WHERE pos >= {w - 1} OR pos = maxpos
)"""


def _winnow_fp_oracle(k: int = 5, w: int = 4) -> str:
    return f"""WITH {_winnow_ctes(k, w)}
SELECT doc_id, CAST(fp AS BIGINT) AS fp, pos FROM sel"""


@register("doc_winnow_fingerprints", _winnow_fp_oracle(), driver=False)
def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer–Wilkerson–Aiken
    SIGMOD'03 / MOSS; sparkfeat.text.winnow_fingerprints) over the
    corpus: every selected (fp, pos) row hash-compared, so the oracle
    verifies the k-gram lattice, the 40-bit md5-prefix hash, the
    packed rightmost-min window selection AND the short-doc whole-
    window convention bit-for-bit. The local-guarantee complement of
    MinHash: any ≥(w+k−1)-char substring match survives selection."""
    from sparkfeat.text import winnow_fingerprints

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
    )
    return winnow_fingerprints(docs, k=5, w=4)


def _winnow_pairs_oracle(
    k: int = 7, w: int = 5, min_shared: int = 3, df_cap: int = 20
) -> str:
    return f"""WITH {_winnow_ctes(k, w)},
dfp AS (SELECT DISTINCT doc_id, fp FROM sel),
freq AS (SELECT fp, COUNT(*) AS dfq FROM dfp GROUP BY fp),
kept AS (
  SELECT dfp.doc_id, dfp.fp
  FROM dfp JOIN freq USING (fp) WHERE dfq <= {df_cap}
),
sz AS (SELECT doc_id, COUNT(*) AS nfp FROM kept GROUP BY doc_id),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
  FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2 HAVING COUNT(*) >= {min_shared}
)
SELECT id_a, id_b, CAST(n_shared AS BIGINT) AS n_shared,
  ROUND(n_shared / CAST(LEAST(sa.nfp, sb.nfp) AS DOUBLE), 6) AS score
FROM p
JOIN sz sa ON sa.doc_id = id_a
JOIN sz sb ON sb.doc_id = id_b"""


@register("dedup_winnow_pairs", _winnow_pairs_oracle(), driver=False)
def q_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style partial-overlap pairs from winnowing fingerprints
    (sparkfeat.text.winnow_pairs): distinct per-doc fps → document-
    frequency cap (drops boilerplate fingerprints BEFORE the join, the
    paper's own hot-posting-list mitigation) → fp equi-join →
    ≥min_shared pairs with the containment-shaped shared/min(n_fps)
    score. Oracle replays selection, cap, join, and score."""
    from sparkfeat.text import winnow_fingerprints, winnow_pairs

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
    )
    fps = winnow_fingerprints(docs, k=7, w=5)
    out = winnow_pairs(fps, min_shared=3, df_cap=20)
    return out.select("id_a", "id_b", "n_shared", _r(F.col("score")).alias("score"))


# ---------------------------------------------------------------------------
# Krippendorff's alpha (sparkfeat.arena.krippendorff_alpha)
# ---------------------------------------------------------------------------


def _krippendorff_oracle(max_raters: int = 8) -> str:
    from math import lcm

    L = lcm(*range(1, max_raters))
    arms = _rater_arms_sql()
    return f"""WITH base AS (
    SELECT doc_id,
        CASE WHEN (n_chars % 10) < 6 THEN 'good' ELSE 'bad' END AS b
    FROM documents
),
j AS ({arms}),
il AS (SELECT doc_id, l, COUNT(*) AS nic FROM j GROUP BY ALL),
pi AS (
    SELECT doc_id, SUM(nic) AS ni, SUM(nic * (nic - 1)) AS ti
    FROM il GROUP BY doc_id
),
pair AS (SELECT * FROM pi WHERE ni >= 2 AND ni <= {max_raters}),
ao AS (
    SELECT SUM(ni) AS n, SUM(ti * ({L} // (ni - 1))) AS aol,
           COUNT(*) AS n_items
    FROM pair
),
nc AS (
    SELECT il.l, SUM(nic) AS n_label
    FROM il JOIN pair USING (doc_id) GROUP BY il.l
),
sq AS (SELECT SUM(n_label * n_label) AS snc2 FROM nc)
SELECT l AS label, CAST(n_label AS BIGINT) AS n_label,
    CAST(n_items AS BIGINT) AS n_items, CAST(n AS BIGINT) AS n_judgments,
    ROUND(CAST(n * {L} - aol AS DOUBLE) / (n * {L}), 6) AS d_o,
    ROUND(CAST(n * n - snc2 AS DOUBLE) / (n * (n - 1)), 6) AS d_e,
    CASE WHEN (n * n - snc2) > 0 THEN
        ROUND(1.0 - CAST((n * {L} - aol) * (n - 1) AS DOUBLE)
                    / CAST((n * n - snc2) * {L} AS DOUBLE), 6)
    END AS alpha
FROM nc, ao, sq"""


@register("arena_krippendorff_alpha", _krippendorff_oracle(), driver=False)
def q_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha over the 3-rater 85%-coverage judgment
    stream (sparkfeat.arena.krippendorff_alpha) — the ragged-panel
    member of the agreement family: Cohen audits pairs, Fleiss needs
    the full panel and drops partially-covered items, alpha uses every
    item with ≥2 judgments. The lcm-scaled integer fold makes the
    order-dependent 1/(n_i−1) weights exact, so both engines divide
    identical integers; the oracle replays judgment mining, the
    pairable gate, the scaled coincidence fold, and the one-quotient
    alpha solve termwise."""
    from sparkfeat.arena import krippendorff_alpha

    return krippendorff_alpha(_rater_judgments(spark, sf_dir))


# ---------------------------------------------------------------------------
# Directional containment near-dup (sparkfeat.dedup.containment_pairs)
# ---------------------------------------------------------------------------


def _containment_oracle(threshold: float = 0.95, min_tokens: int = 30) -> str:
    return f"""WITH t AS (
    SELECT doc_id, lang,
        list_distinct(regexp_split_to_array(lower(text), '\\s+')) AS toks
    FROM documents
),
f AS (
    SELECT doc_id, lang, toks, LEN(toks) AS n
    FROM t WHERE LEN(toks) >= {min_tokens}
),
pairs AS (
    SELECT a.doc_id AS probe_id, b.doc_id AS host_id,
        a.n AS n_probe,
        LEN(list_intersect(a.toks, b.toks)) AS n_common
    FROM f a JOIN f b ON a.lang = b.lang AND a.doc_id <> b.doc_id
)
SELECT probe_id, host_id, CAST(n_probe AS BIGINT) AS n_probe,
    CAST(n_common AS BIGINT) AS n_common,
    ROUND(CAST(n_common AS DOUBLE) / n_probe, 6) AS containment
FROM pairs WHERE CAST(n_common AS DOUBLE) / n_probe >= {threshold!r}"""


@register("dedup_containment_pairs", _containment_oracle(), driver=False)
def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional containment near-dup (C(probe→host) ≥ 0.95 over ≥30
    distinct tokens, within a language) — the asymmetric complement of
    the Jaccard query: quoted/embedded/prefix-crawled subset
    duplicates have Jaccard → 0 but containment → 1. The probe-prefix
    × host-all blocking is LOSSLESS, so the oracle is the full
    brute-force ordered within-lang join — the blocking is an
    optimization, not a recall contract (the jaccard_pairs oracle
    discipline, extended to the directional predicate)."""
    from sparkfeat.dedup import containment_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = containment_pairs(docs, threshold=0.95, min_tokens=30)
    return out.select(
        "probe_id",
        "host_id",
        F.col("n_probe").cast("bigint").alias("n_probe"),
        F.col("n_common").cast("bigint").alias("n_common"),
        _r(F.col("containment")).alias("containment"),
    )


# ---------------------------------------------------------------------------
# Two-sample KS drift (sparkfeat.drift.ks_drift)
# ---------------------------------------------------------------------------

def _ks_sql(panel_sql: str, features: list[str]) -> str:
    """Generic DuckDB twin of ``drift.ks_drift`` over the same
    first-half vs second-half time split as ``_drift_sql``:
    ``panel_sql`` must emit ``ts`` plus the ``features`` columns. The
    fold runs on the SCALED integer gap |c_ref·n_cur − c_cur·n_ref|
    so max/argmax are exact in both engines."""
    unions = "\n    UNION ALL\n    ".join(
        f"SELECT _w, '{f}' AS feature, CAST(\"{f}\" AS DOUBLE) AS value FROM w"
        for f in features
    )
    return f"""WITH src AS (SELECT * FROM ({panel_sql}) _panel),
b AS (SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx FROM src),
w AS (
    SELECT src.*,
        CASE WHEN epoch_us(ts) < CAST(FLOOR((mn + mx) / 2.0) AS BIGINT)
             THEN 'ref' ELSE 'cur' END AS _w
    FROM src, b
),
lng AS (
    {unions}
),
pv AS (
    SELECT feature, ROUND(value, 6) AS value,
        CAST(SUM(CASE WHEN _w = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS na_v,
        CAST(SUM(CASE WHEN _w = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS nb_v
    FROM lng WHERE value IS NOT NULL GROUP BY 1, 2
),
tot AS (
    SELECT feature, CAST(SUM(na_v) AS BIGINT) AS n_ref,
        CAST(SUM(nb_v) AS BIGINT) AS n_cur
    FROM pv GROUP BY 1
),
cum AS (
    SELECT feature, value,
        CAST(SUM(na_v) OVER (PARTITION BY feature ORDER BY value
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ca,
        CAST(SUM(nb_v) OVER (PARTITION BY feature ORDER BY value
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cb
    FROM pv
),
gap AS (
    SELECT c.feature, c.value,
        CAST(ABS(c.ca * t.n_cur - c.cb * t.n_ref) AS BIGINT) AS ds,
        LEAD(c.value) OVER (PARTITION BY c.feature ORDER BY c.value)
            - c.value AS dx,
        t.n_ref, t.n_cur
    FROM cum c JOIN tot t USING (feature)
),
mx AS (SELECT feature, n_ref, n_cur, MAX(ds) AS dmax,
              SUM(ROUND(ds * dx, 6)) AS w1s
       FROM gap GROUP BY 1, 2, 3),
at AS (
    SELECT g.feature, MIN(g.value) AS ks_at
    FROM gap g JOIN mx ON g.feature = mx.feature AND g.ds = mx.dmax
    GROUP BY 1
),
fin AS (
    SELECT mx.feature, mx.n_ref, mx.n_cur,
        ROUND(CAST(dmax AS DOUBLE)
              / CAST(mx.n_ref * mx.n_cur AS DOUBLE), 6) AS ks_d,
        at.ks_at,
        ROUND(1.358 * SQRT(CAST(mx.n_ref + mx.n_cur AS DOUBLE)
              / CAST(mx.n_ref * mx.n_cur AS DOUBLE)), 6) AS crit_05,
        ROUND(w1s / CAST(mx.n_ref * mx.n_cur AS DOUBLE), 6) AS w1
    FROM mx JOIN at USING (feature)
)
SELECT feature, n_ref, n_cur, ks_d, ks_at, crit_05,
    CAST(CASE WHEN ks_d > crit_05 THEN 1 ELSE 0 END AS INTEGER) AS drifted,
    w1
FROM fin"""


_KS_DRIFT_ORACLE = _ks_sql(
    f"WITH {TRANSCRIPTS_CTE} SELECT *, {TURN_SIGNALS_SQL} FROM transcripts",
    _QPSI_FEATS,
)


def _time_split_ks(panel: DataFrame, features: list[str]) -> DataFrame:
    """Spark twin of ``_ks_sql``: the `_time_split_drift` midpoint
    split (lazy broadcast MIN/MAX, no driver collect) feeding
    `drift.ks_drift_tagged`'s integer-exact fold — the tagged form
    melts the panel ONCE with conditional side counters, where the old
    two-filtered-copies call re-executed the whole upstream panel
    pipeline (for the flagship capstone, the full window chain) per
    side."""
    from sparkfeat.drift import ks_drift_tagged

    us = F.unix_micros(F.col("ts").cast("timestamp"))
    bounds = panel.agg(F.min(us).alias("_mn"), F.max(us).alias("_mx"))
    mid = F.floor((F.col("_mn") + F.col("_mx")) / F.lit(2.0)).cast("long")
    base = panel.crossJoin(F.broadcast(bounds)).withColumn(
        "_w", F.when(us < mid, "ref").otherwise("cur")
    )
    out = ks_drift_tagged(base, features)
    return out.withColumn("drifted", F.col("drifted").cast("int"))


@register("feature_drift_ks", _KS_DRIFT_ORACLE, driver=False)
def q_feature_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov drift per transcript signal
    (sparkfeat.drift.ks_drift) between the first and second half of the
    time range — the binning-free companion of the PSI monitor: PSI
    reports mass moved between 10 frozen bins, KS reports the largest
    ECDF gap ANYWHERE (a median jump inside one wide bin is invisible
    to PSI, maximal to KS). The max runs on the SCALED integer gap
    |c_ref·n_cur − c_cur·n_ref| so max and argmax are bit-identical in
    both engines; duplicate values collapse in a map-side-combinable
    (feature, value) aggregate BEFORE anything shuffles, so the window
    state is the distinct-value table, invariant in corpus rows."""
    from sparkfeat.schema import transcripts_from_events, with_turn_signals

    sig = with_turn_signals(transcripts_from_events(spark, sf_dir))
    return _time_split_ks(sig, _QPSI_FEATS)


_FLAGSHIP_KS_ORACLE = _ks_sql(
    _FLAGSHIP_ORACLE,
    ["text_len_lr", "text_len_vol", "text_len_stoch_k", "token_est_ker"],
)


@register("flagship_drift_ks", _FLAGSHIP_KS_ORACLE, driver=False)
def q_flagship_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KS drift over the engine's OWN generated feature panel — the
    capstone pairing of flagship_drift_psi: the flagship point-in-time
    features (clipped log-return, rolling vol, stochastic %K, Kaufman
    ER) compared first-half vs second-half by the exact two-sample KS
    statistic. The features are already 6-dp-rounded by the flagship
    query, so the distinct-value collapse and the integer gap fold are
    engine-exact end-to-end; warm-up-window nulls are excluded per
    side (KS is over the observed ECDFs — the PSI twin carries the
    null-rate story). The oracle nests the full flagship window
    pipeline replay inside the KS fold."""
    panel = q_flagship(spark, sf_dir, spread=True)
    return _time_split_ks(
        panel,
        ["text_len_lr", "text_len_vol", "text_len_stoch_k", "token_est_ker"],
    )


# ---------------------------------------------------------------------------
# Probe rank quality: exact tie-corrected ROC-AUC (sparkfeat.probe.rank_auc)
# ---------------------------------------------------------------------------


def _auc_oracle() -> str:
    # Shared probe-fit prefix down to the scored stream sc(y, s), then
    # the Mann–Whitney fold over distinct-score counts: the DOUBLED
    # integer numerator Σ n⁺_s·(2·below⁻_s + n⁻_s) is exact bigint in
    # any addend order; the two final divisions are the only float ops.
    return _probe_sc_ctes() + """,
g AS (
  SELECT s,
    CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS np,
    CAST(SUM(CASE WHEN y = 1.0 THEN 0 ELSE 1 END) AS BIGINT) AS nn
  FROM sc GROUP BY s
),
c AS (
  SELECT np, nn,
    CAST(SUM(nn) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) - nn
         AS BIGINT) AS below
  FROM g
),
t AS (
  SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
         CAST(SUM(nn) AS BIGINT) AS n_neg,
         CAST(COUNT(*) AS BIGINT) AS n_scores,
         CAST(SUM(np * (2 * below + nn)) AS BIGINT) AS u2
  FROM c
)
SELECT n_pos, n_neg, n_scores,
  ROUND(CAST(u2 AS DOUBLE) / CAST(2 * n_pos * n_neg AS DOUBLE), 6) AS auc,
  ROUND(CAST(u2 - n_pos * n_neg AS DOUBLE)
        / CAST(n_pos * n_neg AS DOUBLE), 6) AS gini
FROM t"""


@register("probe_rank_auc", _auc_oracle(), driver=False)
def q_probe_rank_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-corrected ROC-AUC of the quality probe against its
    label (sparkfeat.probe.rank_auc) — the rank-quality acceptance
    check beside probe_calibration's ECE: calibration verifies the
    probabilities are honest, AUC verifies the score actually ORDERS
    positives above negatives, the property a threshold/top-fraction
    corpus gate consumes. Same probe fit and scored stream as the
    calibration query (shared oracle prefix); the Mann–Whitney fold
    runs over the distinct-score table after one map-side-combinable
    groupBy(score), with the doubled numerator kept in exact bigints
    so both engines solve identical integers."""
    from sparkfeat import text as X
    from sparkfeat.corpus import hash_bucket
    from sparkfeat.probe import linear_probe_score, rank_auc

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
    )
    x1 = X.stopword_ratio("text")
    x2 = F.least(X.avg_word_len("text") / 8.0, F.lit(1.0))
    label = (F.col("lang") == "en").cast("double")
    seed = hash_bucket("doc_id", start=21, buckets=100) < 50
    scored = linear_probe_score(docs, x1, x2, label, seed)
    return rank_auc(scored, F.col("score"), label)


# ---------------------------------------------------------------------------
# Feature relevance: binned mutual information (sparkfeat.probe.mi_table)
# ---------------------------------------------------------------------------


def _mi_oracle() -> str:
    # calibration_table's equal-width binning replayed over the raw
    # feature, then the MI fold: every log argument is a quotient of
    # exact BIGINT products, every cell/entropy term rounded to 6 dp
    # BEFORE its sum (order-stable canonicalized addends, the
    # categorical_drift convention).
    return f"""WITH d AS (
  SELECT
    CAST(LEN(list_filter({_TOKS}, w -> w IN {_STOP_SQL})) AS DOUBLE)
        / LEN({_TOKS}) AS x,
    CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS y
  FROM documents WHERE text IS NOT NULL
),
d2 AS (SELECT x, y FROM d WHERE x IS NOT NULL),
r AS (SELECT ROUND(MIN(x), 6) AS lo, ROUND(MAX(x), 6) AS hi FROM d2),
b AS (
  SELECT COALESCE(LEAST(9, GREATEST(0,
           CAST(FLOOR((x - lo) / NULLIF((hi - lo) / 10.0, 0))
                AS INTEGER))), 0) AS bin, y
  FROM d2, r
),
cells AS (
  SELECT bin, y, CAST(COUNT(*) AS BIGINT) AS n_cell FROM b GROUP BY 1, 2
),
mb AS (SELECT bin, CAST(SUM(n_cell) AS BIGINT) AS cb FROM cells GROUP BY 1),
ml AS (SELECT y, CAST(SUM(n_cell) AS BIGINT) AS cl FROM cells GROUP BY 1),
t AS (SELECT CAST(SUM(n_cell) AS BIGINT) AS n FROM cells),
per AS (
  SELECT c.bin, c.y AS label, c.n_cell,
    ROUND(CAST(c.n_cell AS DOUBLE) / CAST(n AS DOUBLE), 6) AS p_cell,
    ROUND((CAST(c.n_cell AS DOUBLE) / CAST(n AS DOUBLE))
          * LN(CAST(n * c.n_cell AS DOUBLE)
               / CAST(cb * cl AS DOUBLE)), 6) AS mi_contrib,
    n
  FROM cells c JOIN mb USING (bin) JOIN ml ON c.y = ml.y, t
),
mi AS (SELECT ROUND(SUM(mi_contrib), 6) AS mi_nats FROM per),
hb AS (
  SELECT ROUND(SUM(ROUND((CAST(cb AS DOUBLE) / CAST(n AS DOUBLE))
      * LN(CAST(n AS DOUBLE) / CAST(cb AS DOUBLE)), 6)), 6) AS h_bin
  FROM mb, t
),
hl AS (
  SELECT ROUND(SUM(ROUND((CAST(cl AS DOUBLE) / CAST(n AS DOUBLE))
      * LN(CAST(n AS DOUBLE) / CAST(cl AS DOUBLE)), 6)), 6) AS h_label
  FROM ml, t
)
SELECT per.bin, per.label, per.n_cell, per.p_cell, per.mi_contrib, per.n,
  mi.mi_nats, hb.h_bin, hl.h_label,
  CASE WHEN h_bin > 0 AND h_label > 0
       THEN ROUND(mi_nats / SQRT(h_bin * h_label), 6) END AS nmi
FROM per, mi, hb, hl"""


@register("probe_feature_mi", _mi_oracle(), driver=False)
def q_probe_feature_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned mutual information between the stopword-ratio feature and
    the en-label (sparkfeat.probe.mi_table) — the feature-relevance
    acceptance check that PRECEDES the probe fit in the probe family:
    MI sees non-monotone label dependence a linear probe (and its AUC)
    cannot, so it is the audit for "is this feature worth fitting at
    all". Equal-width 10-bin layout shared with the calibration query;
    all log arguments are quotients of exact bigint products and every
    addend is 6-dp-canonicalized before its fold, so both engines sum
    identical doubles."""
    from sparkfeat import text as X
    from sparkfeat.probe import mi_table

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
    )
    label = (F.col("lang") == "en").cast("double")
    return mi_table(docs, X.stopword_ratio("text"), label)


# ---------------------------------------------------------------------------
# Link analysis: in-plan PageRank over the outlink domain graph
# ---------------------------------------------------------------------------


def _pagerank_sql(
    edges_sql: str,
    iters: int = 3,
    damping: float = 0.85,
    teleport_sql: str | None = None,
) -> str:
    """DuckDB twin of ``graph.pagerank``: the power method UNROLLED as
    ``iters`` CTE stages — dangling mass, contribution spread, gather,
    update — with every addend and every rank rounded to 9 dp before
    its sum, exactly the operator's canonicalization, so each round is
    bit-identical and the final 6-dp ranks hash-match. ``edges_sql``
    must emit ``(s, d, w)``. ``teleport_sql`` (emitting ``(node, sw)``;
    may reference the ``e`` CTE) switches to the TrustRank form:
    teleport and dangling mass flow by the L1-normalized seed vector
    instead of 1/N — the operator's seeded branch, including its
    multiplication (not division) arithmetic."""
    dd, one_minus = repr(float(damping)), repr(1.0 - float(damping))
    if teleport_sql is None:
        base_ctes = """b AS (SELECT nodes.node, outw.wout
     FROM nodes LEFT JOIN outw USING (node)),
r0 AS (SELECT node, wout, ROUND(1.0 / n, 9) AS rank FROM b, t)"""
        update = (
            f"ROUND({one_minus} / n\n"
            f"              + {dd} * (COALESCE(g.inr, 0.0)"
            f" + d.dang / n), 9) AS rank"
        )
        bt = ""
    else:
        base_ctes = f"""tele AS (
    SELECT tl.node, tl.sw FROM ({teleport_sql}) tl JOIN nodes USING (node)
),
ts AS (SELECT SUM(sw) AS tsum FROM tele),
b AS (SELECT b0.node, b0.wout,
          ROUND(COALESCE(tele.sw, 0.0) / ts.tsum, 9) AS tv
      FROM (SELECT nodes.node, outw.wout
            FROM nodes LEFT JOIN outw USING (node)) b0
      LEFT JOIN tele USING (node), ts),
r0 AS (SELECT node, wout, tv, tv AS rank FROM b)"""
        update = (
            f"ROUND({one_minus} * b.tv\n"
            f"              + {dd} * (COALESCE(g.inr, 0.0)"
            f" + d.dang * b.tv), 9) AS rank"
        )
        bt = ", b.tv"
    parts = [
        f"""WITH e AS ({edges_sql}),
nodes AS (SELECT DISTINCT node
          FROM (SELECT s AS node FROM e UNION ALL SELECT d FROM e)),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
outw AS (SELECT s AS node, ROUND(SUM(w), 9) AS wout FROM e GROUP BY 1),
{base_ctes}"""
    ]
    for k in range(iters):
        parts.append(
            f""",
d{k} AS (SELECT COALESCE(ROUND(SUM(CASE WHEN wout IS NULL THEN rank END),
                               9), 0.0) AS dang FROM r{k}),
c{k} AS (SELECT e.d AS node, ROUND(r.rank * e.w / r.wout, 9) AS c
         FROM r{k} r JOIN e ON r.node = e.s WHERE r.wout IS NOT NULL),
g{k} AS (SELECT node, ROUND(SUM(c), 9) AS inr FROM c{k} GROUP BY 1),
r{k + 1} AS (
    SELECT b.node, b.wout{bt},
        {update}
    FROM b LEFT JOIN g{k} g USING (node), t, d{k} d
)"""
        )
    parts.append(
        f""",
tot AS (SELECT ROUND(SUM(rank), 6) AS rank_sum FROM r{iters})
SELECT node, ROUND(rank, 6) AS rank, n AS n_nodes, rank_sum
FROM r{iters}, t, tot"""
    )
    return "".join(parts)


_PAGERANK_EDGES_SQL = f"""SELECT source AS s, domain AS d,
    CAST(COUNT(*) AS DOUBLE) AS w
FROM (
    SELECT source,
        lower(unnest(regexp_extract_all(t0, 'https?://([^/\\s:?#]+)', 1)))
            AS domain
    FROM (SELECT source, {_URL_AUG_SQL} AS t0 FROM documents)
)
GROUP BY 1, 2"""


def _domain_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared source → outlink-domain weighted edge table for the link-
    analysis queries (PageRank / HITS): corpus_domain_stats' planted
    URLs, extracted map-only, weighted by occurrence count."""
    from sparkfeat.text import extract_domains

    docs = _docs(spark, sf_dir)
    did = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit(" see https://ex"),
                (did % 7).cast("string"),
                F.lit(".com/p/"),
                did.cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 4 == 0,
            F.concat(
                F.lit(" at http://sub.ex"),
                (did % 5).cast("string"),
                F.lit(".org:8080/x"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit(" and https://EX"),
                (did % 7).cast("string"),
                F.lit(".com/q?u=1"),
            ),
        ).otherwise(F.lit("")),
    )
    d = extract_domains(docs.withColumn("text", aug))
    return (
        d.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source", "domain")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "corpus_domain_pagerank", _pagerank_sql(_PAGERANK_EDGES_SQL), driver=False
)
def q_domain_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the source → outlink-domain citation graph
    (sparkfeat.graph.pagerank, 3 power-method rounds, d = 0.85) — the
    link-analysis signal crawl curation ranks domains by before it
    ranks documents (harvest ordering, link-spam demotion, per-domain
    quality priors). Edges reuse corpus_domain_stats' deterministic
    URL planting (the corpus carries no links) weighted by occurrence
    count; sources only emit links, domains only receive, so the
    domain side accumulates rank while source nodes hold teleport +
    dangling mass — both replayed exactly by the unrolled oracle. The
    ``rank_sum`` constant column makes the value hash verify rank
    conservation (Σr = 1), not just per-node arithmetic."""
    from sparkfeat.graph import pagerank

    edges = _domain_edges(spark, sf_dir)
    # checkpoint=True: the lazy tree triples per round — at 3 rounds
    # that is pure Catalyst-analysis cost (measured 5.8 s lazy vs ~1 s
    # cut at sf0.1); values are pytest-identical between the paths
    return pagerank(
        edges, iters=3, src="source", dst="domain", weight="cnt",
        checkpoint=True,
    )


def _hits_sql(edges_sql: str, iters: int = 3) -> str:
    """DuckDB twin of ``graph.hits``: the mutual hub/authority
    recursion UNROLLED as CTE stages with L1 normalization each
    half-round and the operator's exact 9-dp canonicalization (per-edge
    product rounded, gather sum rounded, normalized score rounded)."""
    parts = [
        f"""WITH e AS ({edges_sql}),
nodes AS (SELECT DISTINCT node
          FROM (SELECT s AS node FROM e UNION ALL SELECT d FROM e)),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
h0 AS (SELECT node, ROUND(1.0 / n, 9) AS hub FROM nodes, t)"""
    ]
    for k in range(iters):
        parts.append(
            f""",
ar{k} AS (SELECT e.d AS node, ROUND(SUM(ROUND(h.hub * e.w, 9)), 9) AS raw
          FROM h{k} h JOIN e ON h.node = e.s GROUP BY 1),
at{k} AS (SELECT SUM(raw) AS tot FROM ar{k}),
a{k + 1} AS (
    SELECT nodes.node, ROUND(COALESCE(ar.raw, 0.0) / at.tot, 9) AS auth
    FROM nodes LEFT JOIN ar{k} ar USING (node), at{k} at
),
hr{k} AS (SELECT e.s AS node, ROUND(SUM(ROUND(a.auth * e.w, 9)), 9) AS raw
          FROM a{k + 1} a JOIN e ON a.node = e.d GROUP BY 1),
ht{k} AS (SELECT SUM(raw) AS tot FROM hr{k}),
h{k + 1} AS (
    SELECT nodes.node, ROUND(COALESCE(hr.raw, 0.0) / ht.tot, 9) AS hub
    FROM nodes LEFT JOIN hr{k} hr USING (node), ht{k} ht
)"""
        )
    parts.append(
        f""",
fin AS (SELECT h.node, h.hub, a.auth
        FROM h{iters} h JOIN a{iters} a USING (node)),
sums AS (SELECT ROUND(SUM(hub), 6) AS hub_sum,
                ROUND(SUM(auth), 6) AS auth_sum FROM fin)
SELECT node, ROUND(hub, 6) AS hub, ROUND(auth, 6) AS auth,
       hub_sum, auth_sum
FROM fin, sums"""
    )
    return "".join(parts)


@register("corpus_domain_hits", _hits_sql(_PAGERANK_EDGES_SQL), driver=False)
def q_domain_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs-and-authorities over the same source → outlink-domain
    graph as corpus_domain_pagerank (sparkfeat.graph.hits, 3 rounds,
    L1-normalized): PageRank says where rank flows, HITS separates
    "links to good places" (hub — the well-sourced crawl source) from
    "linked by good hubs" (authority — the domain worth harvesting).
    On this bipartite planting the sources carry all hub mass and the
    domains all authority mass, with the back-edge-free direction
    pinned at exactly 0 — both conservation constants (hub_sum,
    auth_sum = 1) ride every row for the value hash."""
    from sparkfeat.graph import hits

    edges = _domain_edges(spark, sf_dir)
    # checkpoint=True is load-bearing here: the mutual recursion's
    # lazy tree grows ~3x per HALF-round — measured 169 s of pure
    # plan analysis at 3 rounds vs ~1 s with the per-round cut
    return hits(
        edges, iters=3, src="source", dst="domain", weight="cnt",
        checkpoint=True,
    )


_TRUSTRANK_SEEDS_SQL = """SELECT DISTINCT s AS node, 1.0 AS sw FROM e
WHERE CAST(SUBSTR(s, 4) AS INTEGER) % 3 = 0"""


@register(
    "corpus_domain_trustrank",
    _pagerank_sql(_PAGERANK_EDGES_SQL, teleport_sql=_TRUSTRANK_SEEDS_SQL),
    driver=False,
)
def q_domain_trustrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TrustRank (Gyöngyi et al. 2004) over the same source →
    outlink-domain graph: teleport AND dangling mass flow only to a
    deterministic trusted-source seed set (every third source id), so
    domains earn rank ONLY through links from trust — the link-spam
    demotion scheme. Unseeded sources hold exactly zero teleport floor
    (their rank decays to the pure link inflow, here 0 on the
    bipartite planting) — the contrast with corpus_domain_pagerank's
    uniform floor is the point of the pair. Same 9-dp canonicalized
    power method; the oracle replays the seeded branch's
    multiplication (not division) teleport arithmetic."""
    from sparkfeat.graph import pagerank

    edges = _domain_edges(spark, sf_dir)
    # try_cast, not cast: the inner seed⋈nodes join lets Catalyst push
    # this predicate onto the node table, whose domain rows ('ex1.com')
    # would make an ANSI cast throw mid-scan
    seeds = (
        edges.select(F.col("source").alias("node"))
        .distinct()
        .filter(F.expr("try_cast(substring(node, 4) AS int) % 3 = 0"))
    )
    return pagerank(
        edges, iters=3, src="source", dst="domain", weight="cnt",
        seeds=seeds, checkpoint=True,
    )


_UNIMAX_ORACLE = """WITH g AS (
  SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS tok_group
  FROM documents GROUP BY 1 HAVING SUM(n_chars) > 0
),
g2 AS (SELECT lang, tok_group, ROUND(tok_group * 1.0, 6) AS cap FROM g),
k AS (SELECT CAST(COUNT(*) AS BIGINT) AS kk,
             ROUND(SUM(tok_group) * 0.8, 6) AS b FROM g2),
r AS (
  SELECT lang, tok_group, cap,
    ROW_NUMBER() OVER (ORDER BY cap, lang) AS idx,
    ROUND(SUM(cap) OVER (ORDER BY cap, lang ROWS UNBOUNDED PRECEDING)
          - cap, 6) AS pfx
  FROM g2
),
f AS (
  SELECT r.*, kk, b,
    ROUND((b - pfx) / CAST(kk - idx + 1 AS DOUBLE), 9) AS fair
  FROM r, k
),
fc AS (
  SELECT *, MIN(CASE WHEN cap <= fair THEN 1 ELSE 0 END)
            OVER (ORDER BY idx ROWS UNBOUNDED PRECEDING) AS capped
  FROM f
),
tau AS (SELECT arg_min(fair, idx) FILTER (WHERE capped = 0) AS tv FROM fc),
a AS (
  SELECT fc.lang, fc.tok_group, fc.cap, fc.capped, fc.kk, tau.tv,
    ROUND(CASE WHEN capped = 1 THEN cap ELSE tau.tv END, 6) AS alloc
  FROM fc, tau
),
u AS (SELECT ROUND(SUM(alloc), 6) AS budget_used FROM a)
SELECT a.lang, a.tok_group, a.cap, a.alloc,
  ROUND(a.alloc / CAST(a.tok_group AS DOUBLE), 6) AS epochs,
  CAST(a.capped AS INTEGER) AS capped,
  ROUND(a.tv, 6) AS waterline,
  u.budget_used,
  a.kk AS n_groups
FROM a, u"""


@register("corpus_unimax_plan", _UNIMAX_ORACLE, driver=False)
def q_unimax_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax budgeted mixture allocation (Chung et al. 2023) per
    language (sparkfeat.corpus.unimax_allocation): given 80% of the
    corpus's own chars as the training budget and a 1-epoch repetition
    cap, water-fill the budget — tail languages contribute their full
    cap, head languages share one waterline — the budgeted complement
    of the temperature mixture (no tail starvation, explicit repetition
    bound). The budget derives from the corpus IN-PLAN (budget_frac —
    no driver count); the closed-form prefix solve (row_number +
    cumulative caps + running-min capped flag + first-uncapped
    waterline) runs entirely on the k-row language table, every
    division canonicalized, and the riding waterline/budget_used
    constants make the hash verify the water-filling itself. The lang
    skew in the testdata puts four languages at their cap and English
    at the waterline — both branches live at both dev SFs."""
    from sparkfeat.corpus import unimax_allocation

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return unimax_allocation(
        docs,
        budget_frac=0.8,
        max_epochs=1.0,
        group_col="lang",
        token_col="n_chars",
    )


def _retrieval_eval_oracle(k: int = 10) -> str:
    # Nests the BM25 chain (the run under evaluation), derives the
    # graded qrel set from term containment (docs matching ≥2 distinct
    # probe terms; rel = matches − 1), then replays retrieval_eval's
    # folds: 9-dp gain terms, deterministic (rel DESC, doc_id) ideal
    # ranking, NULL ndcg for empty qrel sets, macro means skipping
    # nulls (AVG semantics — identical in Spark).
    vals = ", ".join(f"({i}, '{q}')" for i, q in _BM25_PROBES)
    return f"""WITH probes(query_id, query) AS (VALUES {vals}),
qt AS (
    SELECT DISTINCT query_id, unnest(list_filter(
        regexp_split_to_array(lower(query), '\\s+'), x -> x <> '')) AS term
    FROM probes
),
{_bm25_chain_ctes()},
res AS (SELECT query_id, doc_id, CAST(rnk AS BIGINT) AS rank
        FROM r WHERE rnk <= {k}),
qrel AS (
    SELECT qt.query_id, h.doc_id,
        CAST(COUNT(DISTINCT qt.term) - 1 AS BIGINT) AS rel
    FROM (SELECT DISTINCT doc_id, term FROM hits) h
    JOIN qt USING (term)
    GROUP BY 1, 2
    HAVING COUNT(DISTINCT qt.term) >= 2
),
j AS (
    SELECT res.query_id, res.rank, qrel.rel
    FROM res LEFT JOIN qrel
      ON res.query_id = qrel.query_id AND res.doc_id = qrel.doc_id
),
got AS (
    SELECT query_id,
        CAST(COUNT(*) AS BIGINT) AS n_ret,
        MIN(CASE WHEN rel > 0 THEN rank END) AS first_rel_rank,
        CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS hits_k,
        ROUND(SUM(CASE WHEN rel > 0 THEN
            ROUND((POW(2.0, rel) - 1.0) / LOG2(rank + 1.0), 9)
            ELSE 0.0 END), 9) AS dcg_k
    FROM j GROUP BY 1
),
ideal AS (
    SELECT query_id, ROUND(SUM(
        ROUND((POW(2.0, rel) - 1.0) / LOG2(idx + 1.0), 9)), 9) AS idcg_k
    FROM (
        SELECT query_id, rel,
            ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY rel DESC, doc_id) AS idx
        FROM qrel
    ) WHERE idx <= {k} GROUP BY 1
),
nrel AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_rel
         FROM qrel GROUP BY 1),
per AS (
    SELECT COALESCE(got.query_id, nrel.query_id, ideal.query_id)
               AS query_id,
        COALESCE(n_rel, 0) AS n_rel,
        COALESCE(n_ret, 0) AS n_ret,
        first_rel_rank,
        ROUND(COALESCE(1.0 / first_rel_rank, 0.0), 6) AS mrr,
        COALESCE(hits_k, 0) AS hits_k,
        CASE WHEN COALESCE(n_rel, 0) > 0 THEN
            ROUND(COALESCE(hits_k, 0) / CAST(n_rel AS DOUBLE), 6)
        END AS recall_k,
        COALESCE(dcg_k, 0.0) AS dcg_k,
        idcg_k,
        CASE WHEN idcg_k > 0 THEN
            ROUND(COALESCE(dcg_k, 0.0) / idcg_k, 6)
        END AS ndcg_k
    FROM got
    FULL JOIN nrel USING (query_id)
    FULL JOIN ideal USING (query_id)
),
macro AS (
    SELECT ROUND(AVG(mrr), 6) AS mean_mrr,
        ROUND(AVG(recall_k), 6) AS mean_recall,
        ROUND(AVG(ndcg_k), 6) AS mean_ndcg,
        CAST(COUNT(*) AS BIGINT) AS n_queries
    FROM per
)
SELECT per.*, macro.mean_mrr, macro.mean_recall, macro.mean_ndcg,
       macro.n_queries
FROM per, macro"""


@register("search_retrieval_eval", _retrieval_eval_oracle(), driver=False)
def q_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline retrieval-quality panel (sparkfeat.search.retrieval_eval)
    over the BM25 run: MRR, recall@10 and graded NDCG@10 per probe
    query plus macro means — the acceptance metric for the retrieval
    family, the way ECE/AUC gate the quality probe. The graded qrel
    set derives deterministically from term containment (a doc is
    relevant iff it contains ≥2 distinct probe terms, graded by the
    match count) so run and judgment come from independent definitions
    of the same information need; the oracle nests the full BM25
    scoring chain, the qrel derivation, and every eval fold."""
    from sparkfeat.search import _toks, bm25_topk, retrieval_eval

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    probes = spark.createDataFrame(_BM25_PROBES, "query_id long, query string")
    run = bm25_topk(docs, probes, k=10)
    qt = probes.select(
        "query_id",
        F.explode(F.array_distinct(_toks("query"))).alias("term"),
    )
    doc_terms = docs.select(
        "doc_id", F.explode(F.array_distinct(_toks("text"))).alias("term")
    )
    qrels = (
        doc_terms.join(F.broadcast(qt), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count_distinct("term").alias("_m"))
        .filter(F.col("_m") >= 2)
        .select(
            "query_id", "doc_id", (F.col("_m") - 1).cast("long").alias("rel")
        )
    )
    return retrieval_eval(run, qrels, k=10)


_TRANSITIVITY_ORACLE = f"""WITH {_ARENA_JUDGMENTS_CTE},
pr AS (
    SELECT LEAST(winner, loser) AS a, GREATEST(winner, loser) AS b,
        SUM(CASE WHEN winner = LEAST(winner, loser) THEN 1 ELSE 0 END)
            AS wab,
        COUNT(*) AS games
    FROM judg WHERE winner <> loser GROUP BY 1, 2
),
dd AS (
    SELECT a, b,
        CASE WHEN wab * 2 > games THEN 1
             WHEN wab * 2 < games THEN -1 END AS dir
    FROM pr
),
d2 AS (SELECT a, b, dir FROM dd WHERE dir IS NOT NULL),
tri AS (
    SELECT p1.a AS player_x, p1.b AS player_y, p2.b AS player_z,
        p1.dir AS d1, p2.dir AS d2, p3.dir AS d3,
        CAST(CASE WHEN p1.dir = p2.dir AND p3.dir <> p1.dir
             THEN 1 ELSE 0 END AS INTEGER) AS cyclic
    FROM d2 p1
    JOIN d2 p2 ON p1.b = p2.a
    JOIN d2 p3 ON p3.a = p1.a AND p3.b = p2.b
),
np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_players FROM
       (SELECT DISTINCT p FROM
        (SELECT a AS p FROM d2 UNION ALL SELECT b FROM d2))),
npr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs_decided FROM d2),
c AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles,
        CAST(SUM(cyclic) AS BIGINT) AS n_cyclic,
        ROUND(SUM(cyclic) / CAST(COUNT(*) AS DOUBLE), 6) AS cyclic_rate
    FROM tri
)
SELECT tri.*, c.n_triangles, c.n_cyclic, c.cyclic_rate,
       npr.n_pairs_decided, np.n_players
FROM tri, c, npr, np"""


@register("arena_transitivity", _TRANSITIVITY_ORACLE, driver=False)
def q_arena_transitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Judge transitivity audit (sparkfeat.arena.transitivity_audit)
    over the deterministic source-vs-source judgment stream shared
    with arena_bt_strengths: the fraction of decided majority triples
    forming a cycle (A beats B beats C beats A) — the structural
    check that the Bradley–Terry leaderboard's transitive-strength
    ASSUMPTION holds for this judge. The 10⁹-judgment reduction is
    one map-side pair groupBy; triangle enumeration runs on the
    players²-bounded majority table; per-triangle direction rows plus
    riding census constants make the hash verify the whole count."""
    from sparkfeat.arena import transitivity_audit

    return transitivity_audit(_arena_judgments(spark, sf_dir))


_COPELAND_ORACLE = f"""WITH {_ARENA_JUDGMENTS_CTE},
pr AS (
    SELECT LEAST(winner, loser) AS a, GREATEST(winner, loser) AS b,
        SUM(CASE WHEN winner = LEAST(winner, loser) THEN 1 ELSE 0 END)
            AS wab,
        COUNT(*) AS games
    FROM judg WHERE winner <> loser GROUP BY 1, 2
),
dd AS (
    SELECT a, b,
        CASE WHEN wab * 2 > games THEN 1
             WHEN wab * 2 < games THEN -1 ELSE 0 END AS dir
    FROM pr
),
sides AS (
    SELECT a AS player, dir AS rel FROM dd
    UNION ALL
    SELECT b AS player, -dir AS rel FROM dd
),
per AS (
    SELECT player,
        CAST(SUM(CASE WHEN rel = 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS maj_wins,
        CAST(SUM(CASE WHEN rel = 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS maj_ties,
        CAST(SUM(CASE WHEN rel = -1 THEN 1 ELSE 0 END) AS BIGINT)
            AS maj_losses,
        CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM sides GROUP BY 1
),
sc AS (SELECT *, maj_wins * 2 + maj_ties AS c2 FROM per),
np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_players FROM per)
SELECT player, maj_wins, maj_ties, maj_losses, n_pairs,
    ROUND(c2 / 2.0, 6) AS copeland,
    CAST(ROW_NUMBER() OVER (ORDER BY c2 DESC, player) AS INTEGER) AS rank,
    np.n_players
FROM sc, np"""


@register("arena_copeland", _COPELAND_ORACLE, driver=False)
def q_arena_copeland(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copeland leaderboard (sparkfeat.arena.copeland_ranking) over the
    shared source-vs-source judgment stream — the model-free
    voting-theory ranking that stays meaningful when arena_transitivity
    reports cycles BT's latent-strength assumption can't represent:
    1 per majority win, ½ per exact majority tie, doubled to pure
    bigint arithmetic, deterministic (score DESC, player) rank. Same
    one map-side pair reduction as the transitivity audit."""
    from sparkfeat.arena import copeland_ranking

    return copeland_ranking(_arena_judgments(spark, sf_dir))


_KANON_ORACLE = """WITH g AS (
    SELECT lang, source, CAST(n_chars // 200 AS BIGINT) AS len_bucket,
        CAST(COUNT(*) AS BIGINT) AS group_size
    FROM documents GROUP BY 1, 2, 3
),
g2 AS (
    SELECT *, CAST(CASE WHEN group_size < 5 THEN 1 ELSE 0 END AS INTEGER)
        AS at_risk
    FROM g
),
c AS (
    SELECT CAST(SUM(group_size) AS BIGINT) AS n_rows,
        CAST(COUNT(*) AS BIGINT) AS n_groups,
        CAST(SUM(group_size * at_risk) AS BIGINT) AS n_rows_at_risk,
        ROUND(SUM(group_size * at_risk) / CAST(SUM(group_size) AS DOUBLE),
              6) AS risk_frac,
        CAST(MIN(group_size) AS BIGINT) AS min_group_size
    FROM g2
)
SELECT g2.*, c.n_rows, c.n_groups, c.n_rows_at_risk, c.risk_frac,
    c.min_group_size, CAST(5 AS INTEGER) AS k_threshold
FROM g2, c"""


@register("corpus_k_anonymity", _KANON_ORACLE, driver=False)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity release gate (sparkfeat.audit.k_anonymity_audit)
    over the metadata a release would publish — (lang, source,
    200-char length bucket): groups smaller than k = 5 are
    re-identification risks even after PII scrubbing removes direct
    identifiers. One map-side groupBy collapses the corpus to the
    distinct-tuple table; riding census constants (rows at risk, risk
    fraction, the corpus's actual min group size = its k'-anonymity
    level) make the hash verify the gate's verdict."""
    from sparkfeat.audit import k_anonymity_audit

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "len_bucket", F.expr("n_chars div 200").cast("bigint")
    )
    return k_anonymity_audit(docs, ["lang", "source", "len_bucket"], k=5)


_LDIV_ORACLE = """WITH l1 AS (
    SELECT source, CAST(n_chars // 400 AS BIGINT) AS len_bucket, lang,
        CAST(COUNT(*) AS BIGINT) AS c
    FROM documents GROUP BY 1, 2, 3
),
tt AS (
    SELECT source, len_bucket, SUM(c) AS n FROM l1 GROUP BY 1, 2
),
h AS (
    SELECT l1.source, l1.len_bucket, l1.c, tt.n,
        ROUND(-(l1.c / CAST(tt.n AS DOUBLE))
              * LN(l1.c / CAST(tt.n AS DOUBLE)), 9) AS ht
    FROM l1 JOIN tt USING (source, len_bucket)
),
g AS (
    SELECT source, len_bucket,
        CAST(MAX(n) AS BIGINT) AS group_size,
        CAST(COUNT(*) AS BIGINT) AS n_sensitive,
        ROUND(EXP(ROUND(SUM(ht), 9)), 6) AS entropy_l,
        CAST(CASE WHEN COUNT(*) < 2 THEN 1 ELSE 0 END AS INTEGER)
            AS at_risk
    FROM h GROUP BY 1, 2
),
c AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
        CAST(SUM(group_size) AS BIGINT) AS n_rows,
        CAST(SUM(group_size * at_risk) AS BIGINT) AS n_rows_at_risk,
        ROUND(SUM(group_size * at_risk)
              / CAST(SUM(group_size) AS DOUBLE), 6) AS risk_frac,
        CAST(MIN(n_sensitive) AS BIGINT) AS min_diversity
    FROM g
)
SELECT g.*, c.n_groups, c.n_rows, c.n_rows_at_risk, c.risk_frac,
    c.min_diversity, CAST(2 AS INTEGER) AS l_threshold
FROM g, c"""


@register("corpus_l_diversity", _LDIV_ORACLE, driver=False)
def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity release gate (sparkfeat.audit.l_diversity_audit) —
    the homogeneity-attack check k-anonymity cannot make: per
    (source, 400-char bucket) quasi group, the distinct and ENTROPY
    diversity of the language attribute (exp(H) = the effective number
    of values an attacker must still distinguish; a 49-vs-1 split has
    2 distinct values but entropy_l ≈ 1.1). Two stacked map-side
    aggregates bound per-task state; the oracle replays the 9-dp
    entropy fold and the census constants."""
    from sparkfeat.audit import l_diversity_audit

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "len_bucket", F.expr("n_chars div 400").cast("bigint")
    )
    return l_diversity_audit(
        docs, ["source", "len_bucket"], "lang", l_threshold=2
    )


_TCLOSE_ORACLE = """WITH l1 AS (
    SELECT source, CAST(n_chars // 400 AS BIGINT) AS len_bucket, lang,
        CAST(COUNT(*) AS BIGINT) AS c
    FROM documents GROUP BY 1, 2, 3
),
tt AS (SELECT source, len_bucket, SUM(c) AS n FROM l1 GROUP BY 1, 2),
gl AS (SELECT lang, SUM(c) AS gc FROM l1 GROUP BY 1),
na AS (SELECT SUM(gc) AS nall FROM gl),
j AS (
    SELECT l1.source, l1.len_bucket, tt.n,
        ROUND(ABS(l1.c / CAST(tt.n AS DOUBLE)
                  - gl.gc / CAST(na.nall AS DOUBLE)), 9) AS ad,
        ROUND(gl.gc / CAST(na.nall AS DOUBLE), 9) AS qp
    FROM l1 JOIN tt USING (source, len_bucket)
    JOIN gl USING (lang), na
),
g AS (
    SELECT source, len_bucket,
        CAST(MAX(n) AS BIGINT) AS group_size,
        ROUND((ROUND(SUM(ad), 9) + 1.0 - ROUND(SUM(qp), 9)) / 2.0, 6)
            AS tvd
    FROM j GROUP BY 1, 2
),
g2 AS (
    SELECT *, CAST(CASE WHEN tvd > 0.2 THEN 1 ELSE 0 END AS INTEGER)
        AS at_risk
    FROM g
),
c AS (
    SELECT MAX(tvd) AS max_tvd,
        CAST(COUNT(*) AS BIGINT) AS n_groups,
        CAST(SUM(group_size) AS BIGINT) AS n_rows,
        CAST(SUM(group_size * at_risk) AS BIGINT) AS n_rows_at_risk,
        ROUND(SUM(group_size * at_risk)
              / CAST(SUM(group_size) AS DOUBLE), 6) AS risk_frac
    FROM g2
)
SELECT g2.*, c.max_tvd, c.n_groups, c.n_rows, c.n_rows_at_risk,
    c.risk_frac, 0.2 AS t_threshold
FROM g2, c"""


@register("corpus_t_closeness", _TCLOSE_ORACLE, driver=False)
def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness release gate (sparkfeat.audit.t_closeness_audit) —
    the skewness-attack check completing the privacy trilogy: per
    (source, 400-char bucket) quasi group, the total-variation
    distance between the group's language distribution and the
    corpus's (a group can be diverse yet leak a 40× belief update on a
    rare value). Sparse-exact TVD — absent values fold in closed form,
    the group never materializes the full support; same stacked
    aggregates as the l-diversity gate plus one broadcast marginal
    join. Riding max_tvd reports the table's actual t."""
    from sparkfeat.audit import t_closeness_audit

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "len_bucket", F.expr("n_chars div 400").cast("bigint")
    )
    return t_closeness_audit(
        docs, ["source", "len_bucket"], "lang", t_threshold=0.2
    )


_BLEU_PAIRS_ORACLE = f"""WITH {TRANSCRIPTS_CTE},
f AS (
    SELECT conv_id, turn_idx AS retry_idx,
        text AS rejected_text,
        MIN(CASE WHEN tool IS DISTINCT FROM 'retry' THEN turn_idx END)
            OVER (PARTITION BY conv_id ORDER BY turn_idx
                  ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
            AS chosen_idx,
        FIRST_VALUE(CASE WHEN tool IS DISTINCT FROM 'retry' THEN text END
                    IGNORE NULLS)
            OVER (PARTITION BY conv_id ORDER BY turn_idx
                  ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
            AS chosen_text,
        tool = 'retry' AS r
    FROM transcripts
),
p AS (
    SELECT conv_id, retry_idx,
        list_filter(regexp_split_to_array(lower(COALESCE(chosen_text, '')),
                    '\\s+'), x -> x <> '') AS ct,
        list_filter(regexp_split_to_array(lower(COALESCE(rejected_text, '')),
                    '\\s+'), x -> x <> '') AS rt
    FROM f WHERE r AND chosen_idx IS NOT NULL
),
g AS (
    SELECT conv_id, retry_idx, v.n,
        unnest(list_transform(generate_series(1, greatest(len(ct) - v.n + 1, 0)),
               i -> array_to_string(ct[i:i + v.n - 1], ' '))) AS gram,
        1 AS is_cand
    FROM p CROSS JOIN (VALUES (1), (2), (3), (4)) v(n)
    UNION ALL
    SELECT conv_id, retry_idx, v.n,
        unnest(list_transform(generate_series(1, greatest(len(rt) - v.n + 1, 0)),
               i -> array_to_string(rt[i:i + v.n - 1], ' '))) AS gram,
        0 AS is_cand
    FROM p CROSS JOIN (VALUES (1), (2), (3), (4)) v(n)
),
c AS (
    SELECT conv_id, retry_idx, n, gram,
        SUM(CASE WHEN is_cand = 1 THEN 1 ELSE 0 END) AS c,
        SUM(CASE WHEN is_cand = 0 THEN 1 ELSE 0 END) AS r
    FROM g GROUP BY conv_id, retry_idx, n, gram
),
pn AS (
    SELECT conv_id, retry_idx, n, SUM(LEAST(c, r)) AS clip
    FROM c GROUP BY conv_id, retry_idx, n
),
pl AS (SELECT conv_id, retry_idx, len(ct) AS clen, len(rt) AS rlen FROM p),
agg AS (
    SELECT pl.conv_id, pl.retry_idx, pl.clen, pl.rlen,
        SUM(LN((CASE WHEN pn.clip > 0 THEN CAST(pn.clip AS DOUBLE)
                     ELSE 0.1 END) / (pl.clen - pn.n + 1))) AS logp,
        MAX(CASE WHEN pn.n = 1 THEN pn.clip END) AS clip1
    FROM pl LEFT JOIN pn
      ON pl.conv_id = pn.conv_id AND pl.retry_idx = pn.retry_idx
    GROUP BY pl.conv_id, pl.retry_idx, pl.clen, pl.rlen
),
res AS (
    SELECT conv_id, retry_idx,
        CAST(clen AS BIGINT) AS cand_len, CAST(rlen AS BIGINT) AS ref_len,
        clen >= 4 AND rlen >= 1 AS valid,
        CASE WHEN clen = 0 THEN 0.0 WHEN clen >= rlen THEN 1.0
             ELSE exp(1 - rlen / CAST(clen AS DOUBLE)) END AS bp_raw,
        logp, clip1
    FROM agg
)
SELECT conv_id, retry_idx, cand_len, ref_len,
    CASE WHEN valid THEN ROUND(clip1 / CAST(cand_len AS DOUBLE), 6)
         ELSE 0.0 END AS unigram_prec,
    CASE WHEN valid THEN ROUND(bp_raw, 6) ELSE 0.0 END AS brevity_penalty,
    CASE WHEN valid THEN ROUND(bp_raw * exp(logp / 4), 6)
         ELSE 0.0 END AS bleu,
    (CASE WHEN valid THEN ROUND(bp_raw * exp(logp / 4), 6)
          ELSE 0.0 END) >= 0.5 AS low_contrast
FROM res"""


@register("preference_pair_bleu", _BLEU_PAIRS_ORACLE, driver=False)
def q_preference_pair_bleu(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair contrast screen (sparkfeat.geneval.bleu_pairs):
    BLEU(chosen | rejected) for every mined DPO pair — pairs whose two
    responses are lexically near-identical (``low_contrast``) carry no
    preference signal and get dropped before training. Pure relational
    BLEU: one explode per side, two stacked (pair, n, gram)-keyed
    combines (the pair id is IN the key, so Zipf-head grams never
    concentrate), equi-join back to the pair spine — no UDFs, no
    window, no collect."""
    from sparkfeat.conv import preference_pairs
    from sparkfeat.geneval import bleu_pairs

    pp = preference_pairs(transcripts_from_events(spark, sf_dir))
    return bleu_pairs(pp.select("conv_id", "retry_idx", "chosen_text", "rejected_text"))


_CUSUM_ORACLE = """WITH hourly AS (
    SELECT event_type AS series, date_trunc('hour', ts) AS t,
        AVG(value) AS x
    FROM events GROUP BY event_type, date_trunc('hour', ts)
),
st AS (
    SELECT series, t, x,
        ROW_NUMBER() OVER (PARTITION BY series ORDER BY t) AS rn
    FROM hourly
),
ref AS (
    SELECT series, AVG(x) AS mu, stddev_pop(x) AS sigma
    FROM st WHERE rn <= 48 GROUP BY series
),
z AS (
    SELECT st.*,
        CASE WHEN ref.sigma > 0 THEN (st.x - ref.mu) / ref.sigma END AS zv
    FROM st JOIN ref USING (series)
),
l AS (SELECT *, rn > 48 AND zv IS NOT NULL AS live FROM z),
c AS (
    SELECT *,
        SUM(CASE WHEN live THEN zv - 0.5 ELSE 0.0 END) OVER w AS cp,
        SUM(CASE WHEN live THEN -zv - 0.5 ELSE 0.0 END) OVER w AS cn
    FROM l
    WINDOW w AS (PARTITION BY series ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
m AS (
    SELECT *,
        LEAST(MIN(cp) OVER w, 0.0) AS mp,
        LEAST(MIN(cn) OVER w, 0.0) AS mn
    FROM c
    WINDOW w AS (PARTITION BY series ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT series, t, ROUND(x, 6) AS x, rn <= 48 AS in_reference,
    ROUND(zv, 6) AS z,
    ROUND(CASE WHEN live THEN cp - mp ELSE 0.0 END, 6) AS s_pos,
    ROUND(CASE WHEN live THEN cn - mn ELSE 0.0 END, 6) AS s_neg,
    ROUND(CASE WHEN live THEN cp - mp ELSE 0.0 END, 6) > 4.0
        OR ROUND(CASE WHEN live THEN cn - mn ELSE 0.0 END, 6) > 4.0 AS alarm
FROM m"""


def _textrank_oracle(
    max_sents: int = 32, n_iter: int = 3, damping: float = 0.85
) -> str:
    base_c = repr(1.0 - damping)
    ctes = [
        """d0 AS (
    SELECT doc_id,
        list_filter(list_transform(
            regexp_split_to_array(lower(COALESCE(text, '')), '[.!?]+'),
            s -> trim(s)), s -> s <> '') AS segs
    FROM documents
)""",
        f"""b2 AS (
    SELECT doc_id, CAST(u.i AS INT) AS si, segs[CAST(u.i + 1 AS INT)] AS sent,
        list_distinct(list_filter(
            regexp_split_to_array(segs[CAST(u.i + 1 AS INT)], '\\s+'),
            x -> x <> '')) AS tok
    FROM d0, unnest(generate_series(0, CAST(len(segs) - 1 AS BIGINT))) u(i)
    WHERE u.i < {max_sents}
)""",
        """b3 AS (SELECT *, CAST(len(tok) AS BIGINT) AS lt FROM b2)""",
        """nn AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
    FROM b3 GROUP BY doc_id)""",
        """raw AS (
    SELECT a.doc_id, a.si AS i, b.si AS j,
        ROUND(CAST(len(list_intersect(a.tok, b.tok)) AS DOUBLE)
              / (ln(CAST(a.lt AS DOUBLE)) + ln(CAST(b.lt AS DOUBLE))), 9)
            AS w
    FROM b3 a JOIN b3 b ON a.doc_id = b.doc_id AND a.si < b.si
    WHERE (ln(CAST(a.lt AS DOUBLE)) + ln(CAST(b.lt AS DOUBLE))) > 0
      AND len(list_intersect(a.tok, b.tok)) > 0
)""",
        """edges AS (
    SELECT doc_id, i, j, w FROM raw
    UNION ALL SELECT doc_id, j AS i, i AS j, w FROM raw
)""",
        """ws AS (SELECT doc_id, i AS j, SUM(w) AS wsum
    FROM edges GROUP BY doc_id, i)""",
        """ew AS (
    SELECT e.doc_id, e.i, e.j, e.w, s.wsum
    FROM edges e JOIN ws s ON s.doc_id = e.doc_id AND s.j = e.j
)""",
        """r_0 AS (
    SELECT b3.doc_id, b3.si AS node, 1.0 / nn.n AS r, nn.n
    FROM b3 JOIN nn USING (doc_id)
)""",
    ]
    for k in range(n_iter):
        ctes.append(
            f"""c_{k + 1} AS (
    SELECT ew.doc_id, ew.i AS node, SUM(r_{k}.r * ew.w / ew.wsum) AS cs
    FROM ew JOIN r_{k} ON r_{k}.doc_id = ew.doc_id AND r_{k}.node = ew.j
    GROUP BY ew.doc_id, ew.i
)"""
        )
        ctes.append(
            f"""r_{k + 1} AS (
    SELECT r_{k}.doc_id, r_{k}.node,
        ROUND({base_c} / r_{k}.n + {damping!r} * COALESCE(c_{k + 1}.cs, 0.0),
              9) AS r,
        r_{k}.n
    FROM r_{k} LEFT JOIN c_{k + 1}
      ON c_{k + 1}.doc_id = r_{k}.doc_id AND c_{k + 1}.node = r_{k}.node
)"""
        )
    joined = ",\n".join(ctes)
    return f"""WITH {joined}
SELECT b2.doc_id, b2.si AS sent_idx, b2.sent AS sentence,
    CAST(rf.n AS INT) AS n_sents, rf.r AS score,
    CAST(row_number() OVER (PARTITION BY b2.doc_id
                            ORDER BY rf.r DESC, b2.si) AS INT) AS rank
FROM b2 JOIN r_{n_iter} rf ON rf.doc_id = b2.doc_id AND rf.node = b2.si"""


@register("doc_textrank", _textrank_oracle(), driver=False)
def q_doc_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document TextRank (sparkfeat.text.textrank_sentences):
    extractive sentence-centrality scores for every corpus document in
    one lazy plan — millions of tiny sentence graphs iterating
    simultaneously, every join/aggregate keyed by (doc, sentence) so
    no stage ever sees a whole-corpus key (contrast graph.pagerank's
    single global graph). 3 damped rounds, iterates 9-dp-canonicalized;
    the oracle unrolls the identical trajectory."""
    from sparkfeat.text import textrank_sentences

    return textrank_sentences(_docs(spark, sf_dir))


def _threshold_curve_oracle(thresholds=(0.5, 0.6, 0.7, 0.8, 0.9)) -> str:
    p = ",\n        ".join(
        f"CAST(SUM(CASE WHEN est_jaccard >= {t!r} THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS p{int(t * 100)}"
        for t in thresholds
    )
    d = ",\n        ".join(
        f"CAST(SUM(CASE WHEN lvl >= {t!r} THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS d{int(t * 100)}"
        for t in thresholds
    )
    rows = "\n    UNION ALL ".join(
        f"SELECT {t!r} AS threshold, p{int(t * 100)} AS n_pairs,"
        f" d{int(t * 100)} AS n_docs_dropped FROM agg"
        for t in thresholds
    )
    return f"""WITH base AS ({_minhash_oracle()}),
lvl AS (SELECT id_b, MAX(est_jaccard) AS lvl FROM base GROUP BY id_b),
pa AS (SELECT {p} FROM base),
da AS (SELECT {d} FROM lvl),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
agg AS (SELECT * FROM pa CROSS JOIN da CROSS JOIN nd),
rows_out AS (
    {rows}
)
SELECT threshold, n_pairs, n_docs_dropped,
    ROUND(n_docs_dropped / CAST((SELECT n FROM nd) AS DOUBLE), 6)
        AS drop_frac
FROM rows_out"""


@register("dedup_threshold_curve", _threshold_curve_oracle(), driver=False)
def q_dedup_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup threshold sweep (sparkfeat.dedup.dedup_threshold_curve):
    pairs fired and corpus fraction removed at each candidate MinHash
    threshold — the removal-rate dial the "which threshold?" decision
    reads. One pass over the banded candidate pairs: per-doc max drop
    level (one map-side groupBy) turns the sweep into conditional
    counts; corpus size rides a one-row broadcast."""
    from sparkfeat.dedup import dedup_threshold_curve, minhash_lsh_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = minhash_lsh_pairs(docs, num_perm=64, bands=16, shingle_n=2).filter(
        F.col("est_jaccard") >= 0.5
    )
    return dedup_threshold_curve(pairs, docs)


def _dp_release_oracle(
    epsilon: float = 1.0, sensitivity: float = 1.0, seed: str = "dp"
) -> str:
    b = sensitivity / epsilon
    hv = _hex_bucket_sql(
        None,
        1,
        4294967296,
        hexpr=(
            f"md5(concat_ws(':', '{seed}', CAST(lang AS VARCHAR), "
            "CAST(source AS VARCHAR)))"
        ),
    )
    return f"""WITH counts AS (
    SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_true
    FROM documents GROUP BY lang, source
),
n AS (
    SELECT *, (({hv}) + 0.5) / 4294967296.0 AS u FROM counts
),
x AS (
    SELECT *, ROUND(-{b!r} * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5)),
                    6) AS noise
    FROM n
)
SELECT lang, source, n_true, noise,
    GREATEST(CAST(0 AS BIGINT),
             CAST(ROUND(n_true + noise, 0) AS BIGINT)) AS n_released,
    {epsilon!r} AS epsilon, {b!r} AS noise_scale
FROM x"""


@register("corpus_dp_release", _dp_release_oracle(), driver=False)
def q_corpus_dp_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism count release (sparkfeat.audit.dp_release_counts)
    over the (lang, source) margins — the RELEASE step after the
    k/l/t privacy gates: true count + Laplace(1/ε) noise, clamped and
    integer-rounded (valid post-processing). Noise is hash-derived at
    ONE documented seam (reproducible-testing mode; production swaps in
    a CSPRNG there and keeps the mechanism algebra), which is what
    makes the bit-exact oracle replay possible."""
    from sparkfeat.audit import dp_release_counts

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dp_release_counts(
        docs, ["lang", "source"], epsilon=1.0, sensitivity=1.0, seed="dp"
    )


_READABILITY_ORACLE = """WITH t AS (
    SELECT doc_id,
        list_filter(regexp_split_to_array(lower(COALESCE(text, '')),
                    '\\s+'), x -> x <> '') AS tk
    FROM documents
),
c AS (
    SELECT doc_id,
        CAST(len(tk) AS BIGINT) AS n_words,
        CAST(list_sum(list_transform(tk,
            w -> GREATEST(1, len(regexp_extract_all(w, '[aeiouy]+')))))
            AS BIGINT) AS n_syl,
        CASE WHEN len(tk) > 0 THEN CAST(GREATEST(1,
            len(regexp_extract_all(array_to_string(tk, ' '), '[.!?]+')))
            AS BIGINT) ELSE 0 END AS n_sent
    FROM t
)
SELECT doc_id, n_words, n_sent AS n_sentences,
    COALESCE(n_syl, 0) AS n_syllables,
    CASE WHEN n_words > 0 THEN
        ROUND(n_words / CAST(n_sent AS DOUBLE), 6) END
        AS words_per_sentence,
    CASE WHEN n_words > 0 THEN
        ROUND(COALESCE(n_syl, 0) / CAST(n_words AS DOUBLE), 6) END
        AS syllables_per_word,
    CASE WHEN n_words > 0 THEN
        ROUND(206.835 - 1.015 * (n_words / CAST(n_sent AS DOUBLE))
              - 84.6 * (COALESCE(n_syl, 0) / CAST(n_words AS DOUBLE)), 6) END
        AS flesch_ease,
    CASE WHEN n_words > 0 THEN
        ROUND(0.39 * (n_words / CAST(n_sent AS DOUBLE))
              + 11.8 * (COALESCE(n_syl, 0) / CAST(n_words AS DOUBLE))
              - 15.59, 6) END AS fk_grade
FROM c"""


@register("doc_readability", _READABILITY_ORACLE, driver=False)
def q_doc_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Readability panel (sparkfeat.text.readability): Flesch ease +
    Flesch-Kincaid grade from pinned word/sentence/vowel-group
    heuristics — the sentence-complexity quality axis the Gopher gates
    don't cover. Map-only, in-row transform+aggregate fold, zero
    shuffle."""
    from sparkfeat.text import readability

    return readability(_docs(spark, sf_dir))


def _rm3_oracle(
    fb_docs: int = 5,
    fb_terms: int = 8,
    alpha: float = 0.5,
    k: int = 10,
    k1: float = 1.5,
    b: float = 0.75,
) -> str:
    vals = ", ".join(f"({i}, '{q}')" for i, q in _BM25_PROBES)
    idf = "ln(1.0 + (st.n - dfreq.df + 0.5) / (dfreq.df + 0.5))"
    tfp = (
        f"(tf.tf * {k1 + 1.0} / (tf.tf + {k1} * "
        f"(1.0 - {b} + {b} * dl.dl / st.avgdl)))"
    )
    return f"""WITH probes(query_id, query) AS (VALUES {vals}),
qt AS (
    SELECT DISTINCT query_id, unnest(list_filter(
        regexp_split_to_array(lower(query), '\\s+'), x -> x <> '')) AS term
    FROM probes
),
{_bm25_chain_ctes(k1, b)},
fb AS (SELECT query_id, doc_id, score FROM r WHERE rnk <= {fb_docs}),
fbsum AS (SELECT query_id, SUM(score) AS ssum FROM fb GROUP BY query_id),
fbw AS (
    SELECT fb.query_id, fb.doc_id, ROUND(fb.score / fbsum.ssum, 6) AS wd
    FROM fb JOIN fbsum USING (query_id) WHERE fbsum.ssum > 0
),
fbtf AS (
    SELECT h.doc_id, dl.dl, h.term, COUNT(*) AS tf
    FROM hits h
    JOIN (SELECT DISTINCT doc_id FROM fbw) fd USING (doc_id)
    JOIN dl USING (doc_id)
    GROUP BY h.doc_id, dl.dl, h.term
),
prm AS (
    SELECT fbw.query_id, fbtf.term,
        ROUND(SUM(fbw.wd * fbtf.tf / fbtf.dl), 6) AS prm
    FROM fbw JOIN fbtf USING (doc_id)
    GROUP BY fbw.query_id, fbtf.term
),
top AS (
    SELECT query_id, term, prm FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY prm DESC, term) AS tr
        FROM prm) WHERE tr <= {fb_terms}
),
tsum AS (SELECT query_id, SUM(prm) AS tsum FROM top GROUP BY query_id),
expw AS (
    SELECT top.query_id, top.term,
        ROUND({1.0 - alpha} * (top.prm / tsum.tsum), 6) AS we
    FROM top JOIN tsum USING (query_id) WHERE tsum.tsum > 0
),
qn AS (SELECT query_id, COUNT(*) AS qn FROM qt GROUP BY query_id),
origw AS (
    SELECT qt.query_id, qt.term, {alpha} / qn.qn AS wo
    FROM qt JOIN qn USING (query_id)
),
comb AS (
    SELECT COALESCE(o.query_id, e.query_id) AS query_id,
        COALESCE(o.term, e.term) AS term,
        ROUND(COALESCE(o.wo, 0.0) + COALESCE(e.we, 0.0), 6) AS w
    FROM origw o FULL JOIN expw e
      ON o.query_id = e.query_id AND o.term = e.term
),
tf1 AS (
    SELECT h.term, h.doc_id, COUNT(*) AS tf
    FROM hits h JOIN (SELECT DISTINCT term FROM comb) t USING (term)
    GROUP BY h.term, h.doc_id
),
dfreq1 AS (SELECT term, COUNT(*) AS df FROM tf1 GROUP BY term),
sc1 AS (
    SELECT comb.query_id, tf.doc_id,
        ROUND(SUM(comb.w *
            ({idf.replace('dfreq.df', 'dfreq1.df')} * {tfp.replace('tf.tf', 'tf.tf')})
        ), 6) AS score
    FROM tf1 tf
    JOIN dfreq1 USING (term)
    JOIN comb USING (term)
    JOIN dl ON dl.doc_id = tf.doc_id
    CROSS JOIN st
    GROUP BY comb.query_id, tf.doc_id
),
r1 AS (
    SELECT query_id, doc_id, score,
        row_number() OVER (PARTITION BY query_id
                           ORDER BY score DESC, doc_id) AS rnk
    FROM sc1
)
SELECT query_id, doc_id, score, CAST(rnk AS BIGINT) AS rank
FROM r1 WHERE rnk <= {k}"""


@register("search_rm3_topk", _rm3_oracle(), driver=False)
def q_search_rm3_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RM3 pseudo-relevance feedback (sparkfeat.search.rm3_expand_topk):
    BM25 pass one → top-5 pseudo-relevant docs → relevance model
    P(t|R) = Σ w_d·tf/dl → 8 heaviest expansion terms interpolated 0.5
    with the original query → weighted BM25 pass two. Every
    intermediate weight 6-dp-rounded before ranking/reuse so the whole
    two-pass trajectory is engine-exact; two probe-pruned corpus
    passes, feedback work bounded by queries × fb_docs."""
    from sparkfeat.search import rm3_expand_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    probes = spark.createDataFrame(_BM25_PROBES, "query_id long, query string")
    return rm3_expand_topk(docs, probes, fb_docs=5, fb_terms=8, k=10)


def _fim_oracle(fim_rate: float = 0.5, spm_rate: float = 0.5) -> str:
    g = _hex_bucket_sql("doc_id", 1, 1000)
    sp = _hex_bucket_sql("doc_id", 25, 1000)
    r1 = _hex_bucket_sql("doc_id", 9, 1_000_000)
    r2 = _hex_bucket_sql("doc_id", 17, 1_000_000)
    return f"""WITH d AS (
    SELECT doc_id,
        list_filter(regexp_split_to_array(lower(COALESCE(text, '')),
                    '\\s+'), x -> x <> '') AS toks
    FROM documents
),
b AS (
    SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n,
        ({g}) < {int(fim_rate * 1000)} AS gate,
        ({sp}) < {int(spm_rate * 1000)} AS spm
    FROM d
),
cuts AS (
    SELECT *,
        CASE WHEN n >= 3 THEN LEAST(({r1}) % (n - 1) + 1,
                                    ({r2}) % (n - 1) + 1) END AS c1,
        CASE WHEN n >= 3 THEN GREATEST(({r1}) % (n - 1) + 1,
                                       ({r2}) % (n - 1) + 1) END AS c2
    FROM b
),
parts AS (
    SELECT doc_id, n, gate, spm, gate AND n >= 3 AS applied,
        -- DuckDB's array_to_string([]) is NULL where Spark's
        -- array_join([]) is '' — coalesce so concat_ws sees the same
        -- (empty-middle docs keep their separator slot on both engines)
        COALESCE(array_to_string(toks[1:CAST(c1 AS INT)], ' '), '') AS pre,
        COALESCE(array_to_string(toks[CAST(c1 + 1 AS INT):CAST(c2 AS INT)],
                                 ' '), '') AS mid,
        COALESCE(array_to_string(toks[CAST(c2 + 1 AS INT):CAST(n AS INT)],
                                 ' '), '') AS suf,
        COALESCE(array_to_string(toks, ' '), '') AS verbatim
    FROM cuts
)
SELECT doc_id, n AS n_tok, applied AS fim_applied,
    CASE WHEN applied AND spm THEN 'spm'
         WHEN applied THEN 'psm' END AS fim_order,
    CASE WHEN applied AND spm THEN
        concat_ws(' ', '<fim_pre>', '<fim_mid>', suf, '<fim_suf>', pre, mid)
    WHEN applied THEN
        concat_ws(' ', '<fim_pre>', pre, '<fim_mid>', suf, '<fim_suf>', mid)
    ELSE verbatim END AS fim_text
FROM parts"""


@register("corpus_fim", _fim_oracle(), driver=False)
def q_corpus_fim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-middle transformation (sparkfeat.corpus.fim_transform,
    Bavarian et al. 2022): hashed transform gate, order-normalized
    hashed cut points, PSM/SPM coin — four independent md5 buckets of
    the doc id, so the layout replays bit-for-bit anywhere; middle
    always last (where the infilling loss lives). Map-only, zero
    shuffle."""
    from sparkfeat.corpus import fim_transform

    return fim_transform(_docs(spark, sf_dir))


def _span_corruption_oracle(
    frame: int = 20, span: int = 3, seed: str = "sc"
) -> str:
    mod = frame - span + 1
    hf = _hex_bucket_sql(
        None,
        1,
        mod,
        hexpr=f"md5('{seed}:' || CAST(doc_id AS VARCHAR) || ':' || CAST(f AS VARCHAR))",
    )
    hi = _hex_bucket_sql(
        None,
        1,
        mod,
        hexpr=(
            f"md5('{seed}:' || CAST(doc_id AS VARCHAR) || ':' "
            f"|| CAST(i // {frame} AS VARCHAR))"
        ),
    )
    return f"""WITH d AS (
    SELECT doc_id,
        list_filter(regexp_split_to_array(lower(COALESCE(text, '')),
                    '\\s+'), x -> x <> '') AS toks
    FROM documents
),
b AS (
    SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n,
        CAST(len(toks) // {frame} AS BIGINT) AS ff
    FROM d
),
built AS (
    SELECT doc_id, n, ff,
        array_to_string(list_filter(
            list_transform(
                CASE WHEN n > 0 THEN generate_series(0, CAST(n - 1 AS BIGINT))
                     ELSE [] END,
                i -> CASE
                    WHEN i // {frame} < ff
                         AND i - (i // {frame}) * {frame} - ({hi}) = 0
                    THEN '<extra_id_' || CAST(i // {frame} AS VARCHAR) || '>'
                    WHEN i // {frame} < ff
                         AND i - (i // {frame}) * {frame} - ({hi}) > 0
                         AND i - (i // {frame}) * {frame} - ({hi}) < {span}
                    THEN NULL
                    ELSE toks[CAST(i + 1 AS INT)] END),
            x -> x IS NOT NULL), ' ') AS input_text,
        array_to_string(
            list_transform(
                CASE WHEN ff > 0 THEN generate_series(0, CAST(ff - 1 AS BIGINT))
                     ELSE [] END,
                f -> '<extra_id_' || CAST(f AS VARCHAR) || '> ' ||
                    array_to_string(
                        toks[CAST(f * {frame} + ({hf}) + 1 AS INT) :
                             CAST(f * {frame} + ({hf}) + {span} AS INT)],
                        ' ')),
            ' ') AS spans_joined
    FROM b
)
SELECT doc_id, n AS n_tok, CAST(ff AS INT) AS n_spans, input_text,
    CASE WHEN ff > 0 THEN spans_joined || ' ' ELSE '' END
        || '<extra_id_' || CAST(ff AS VARCHAR) || '>' AS target_text
FROM built"""


@register("corpus_span_corruption", _span_corruption_oracle(), driver=False)
def q_corpus_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style denoising pairs (sparkfeat.corpus.span_corruption):
    fixed 20-token frames each corrupt one hashed-offset 3-token span
    (rate 15% exact by construction, spans never overlap, sentinel k =
    frame k) — the determinized cousin of T5's rejection sampler, a
    pure function of (seed, doc, position). Map-only: the span
    containing any position is CLOSED-FORM, so no span list and no
    per-token probe; one md5 per token, fuses into the scan."""
    from sparkfeat.corpus import span_corruption

    return span_corruption(
        _docs(spark, sf_dir), corruption_rate=0.15, span_len=3, seed="sc"
    )


def _nstep_oracle(horizon: int = 8, gamma: float = 0.97) -> str:
    """LEAD-chain replay of reward.nstep_returns: the sum is written
    j-ascending left-associated — the fold's exact addition order —
    with repr'd discount literals, so both engines add identical
    doubles."""
    leads = ",\n        ".join(
        f"LEAD(reward, {j}) OVER w2 AS r{j}" for j in range(1, horizon)
    )
    terms = " + ".join(
        [f"reward * {gamma**0!r}"]
        + [f"COALESCE(r{j}, 0.0) * {gamma**j!r}" for j in range(1, horizon)]
    )
    return f"""WITH rw AS (
    SELECT 'c' || CAST(user_id AS VARCHAR) AS conv_id,
        CAST(ROW_NUMBER() OVER w - 1 AS INTEGER) AS turn_idx,
        COALESCE(value, 0.0) AS reward,
        CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_conv,
        ROW_NUMBER() OVER w AS rn
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
l AS (
    SELECT conv_id, turn_idx, reward, rn, n_conv,
        {leads}
    FROM rw WINDOW w2 AS (PARTITION BY conv_id ORDER BY turn_idx)
)
SELECT conv_id, turn_idx, ROUND(reward, 6) AS reward,
    CAST(LEAST({horizon}, n_conv - rn + 1) AS INT) AS n_terms,
    ROUND({terms}, 6) AS return_n
FROM l"""


@register("turn_nstep_returns", _nstep_oracle(), driver=False)
def q_turn_nstep_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline-RL value targets (sparkfeat.reward.nstep_returns): the
    H-step discounted return G_t = Σ_{j<8} 0.97ʲ·r_{t+j} per turn of
    the per-user event-value stream — an EXACT bounded window (frame
    collect + literal-powers fold, no reverse recursion, no γ^t
    under/overflow on long conversations), end-of-episode rows
    truncate honestly via n_terms. One conversation-key exchange."""
    from pyspark.sql import Window

    from sparkfeat.reward import nstep_returns

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    rew = ev.select(
        F.concat(F.lit("c"), F.col("user_id").cast("string")).alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.coalesce(F.col("value"), F.lit(0.0)).alias("reward"),
    )
    return nstep_returns(rew, horizon=8, gamma=0.97)


def _dimtrunc_oracle(dims=(64, 32, 16, 8), k: int = 5) -> str:
    stages = [
        """c AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
)""",
        "p AS (SELECT vec_id AS probe_id, v AS pv FROM c WHERE vec_id < 10)",
    ]
    rank_tmpl = """t{d} AS (
    SELECT probe_id, vec_id, rk FROM (
        SELECT p.probe_id, c.vec_id,
            ROW_NUMBER() OVER (PARTITION BY p.probe_id ORDER BY
                list_dot_product(
                    list_transform(p.pv[1:{d}],
                        x -> x / sqrt(list_dot_product(p.pv[1:{d}], p.pv[1:{d}]))),
                    list_transform(c.v[1:{d}],
                        x -> x / sqrt(list_dot_product(c.v[1:{d}], c.v[1:{d}]))))
                DESC, c.vec_id) AS rk
        FROM c, p WHERE c.vec_id <> p.probe_id) WHERE rk <= {k}
)"""
    full_cos = _COS.format(a="pp.pv", b="cv.v")
    agg_tmpl = """a{d} AS (
    SELECT t.probe_id, CAST({d} AS INT) AS n_dims,
        CAST(SUM(CASE WHEN f.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS INT)
            AS overlap_at_k,
        arg_min(t.vec_id, t.rk) = ANY_VALUE(ft.top1) AS top1_kept,
        ROUND(AVG(ROUND({full_cos}, 6)), 6)
            AS mean_full_cosine_of_trunc_topk
    FROM t{d} t
    LEFT JOIN t{dfull} f ON f.probe_id = t.probe_id AND f.vec_id = t.vec_id
    JOIN (SELECT probe_id, arg_min(vec_id, rk) AS top1 FROM t{dfull}
          GROUP BY probe_id) ft ON ft.probe_id = t.probe_id
    JOIN c cv ON cv.vec_id = t.vec_id
    JOIN p pp ON pp.probe_id = t.probe_id
    GROUP BY t.probe_id
)"""
    dfull = dims[0]
    for d in dims:
        stages.append(rank_tmpl.format(d=d, k=k))
    for d in dims:
        stages.append(
            agg_tmpl.format(d=d, dfull=dfull, full_cos=full_cos)
        )
    union = "\nUNION ALL ".join(f"SELECT * FROM a{d}" for d in dims)
    return "WITH " + ",\n".join(stages) + "\n" + union


@register("embedding_dim_truncation", _dimtrunc_oracle(), driver=False)
def q_embedding_dim_truncation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka storage audit
    (sparkfeat.similarity.dim_truncation_audit): exact cosine top-5
    per probe at dim budgets 64/32/16/8 (sliced + renormalized),
    scored against the full-dimension ranking — set overlap@k, top-1
    retention, and the truncated picks' mean cosine UNDER THE FULL
    metric (what serving a truncated index actually costs). The other
    storage lever beside the int8 index; one cosine_topk pass per
    budget, broadcast probes, no UDFs."""
    from sparkfeat.similarity import dim_truncation_audit

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    return dim_truncation_audit(emb, probes, dims=[64, 32, 16, 8], k=5)


_WATERFALL_ORACLE = f"""WITH fl AS (
    SELECT quality_pass AS p0, lang_ok AS p1, exact_keep AS p2,
        NOT neardup_drop AS p3
    FROM ({_corpus_prep_oracle()}) _f
),
agg AS (
    SELECT
        CAST(COUNT(*) AS BIGINT) AS in0,
        CAST(SUM(CASE WHEN NOT p0 THEN 1 ELSE 0 END) AS BIGINT) AS dr0,
        CAST(SUM(CASE WHEN NOT p0 THEN 1 ELSE 0 END) AS BIGINT) AS if0,
        CAST(SUM(CASE WHEN p0 THEN 1 ELSE 0 END) AS BIGINT) AS in1,
        CAST(SUM(CASE WHEN p0 AND NOT p1 THEN 1 ELSE 0 END) AS BIGINT) AS dr1,
        CAST(SUM(CASE WHEN NOT p1 THEN 1 ELSE 0 END) AS BIGINT) AS if1,
        CAST(SUM(CASE WHEN p0 AND p1 THEN 1 ELSE 0 END) AS BIGINT) AS in2,
        CAST(SUM(CASE WHEN p0 AND p1 AND NOT p2 THEN 1 ELSE 0 END) AS BIGINT)
            AS dr2,
        CAST(SUM(CASE WHEN NOT p2 THEN 1 ELSE 0 END) AS BIGINT) AS if2,
        CAST(SUM(CASE WHEN p0 AND p1 AND p2 THEN 1 ELSE 0 END) AS BIGINT)
            AS in3,
        CAST(SUM(CASE WHEN p0 AND p1 AND p2 AND NOT p3 THEN 1 ELSE 0 END)
            AS BIGINT) AS dr3,
        CAST(SUM(CASE WHEN NOT p3 THEN 1 ELSE 0 END) AS BIGINT) AS if3,
        CAST(SUM(CASE WHEN p0 AND p1 AND p2 AND p3 THEN 1 ELSE 0 END)
            AS BIGINT) AS kept
    FROM fl
),
rows_out AS (
    SELECT 0 AS stage_idx, 'quality' AS stage, in0 AS n_in,
        dr0 AS n_dropped_here, if0 AS n_fail_independent FROM agg
    UNION ALL SELECT 1, 'langid', in1, dr1, if1 FROM agg
    UNION ALL SELECT 2, 'exact_dedup', in2, dr2, if2 FROM agg
    UNION ALL SELECT 3, 'neardup', in3, dr3, if3 FROM agg
    UNION ALL SELECT 4, 'kept', kept, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
    FROM agg
)
SELECT CAST(stage_idx AS INT) AS stage_idx, stage, n_in, n_dropped_here,
    n_fail_independent,
    CASE WHEN n_in > 0 THEN
        ROUND(n_dropped_here / CAST(n_in AS DOUBLE), 6) END AS drop_rate
FROM rows_out"""


@register("corpus_filter_waterfall", _WATERFALL_ORACLE, driver=False)
def q_corpus_filter_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop-attribution waterfall (sparkfeat.corpus.filter_waterfall)
    over the 4-stage corpus-prep verdicts: each document is charged to
    its FIRST failing stage (waterfall) next to the order-free marginal
    count (n_fail_independent) — the ablation table a curation
    discussion starts from. ONE map-side-combined aggregate of prefix
    conjunctions over the verdict table; stages+1 output rows."""
    from sparkfeat.corpus import corpus_prep_flags, filter_waterfall

    flags = corpus_prep_flags(_docs(spark, sf_dir))
    return filter_waterfall(
        flags,
        [
            ("quality", "quality_pass"),
            ("langid", "lang_ok"),
            ("exact_dedup", "exact_keep"),
            ("neardup", ~F.col("neardup_drop")),
        ],
    )


_EXPECT_ORACLE = f"""WITH {TRANSCRIPTS_CTE},
mono AS (
    SELECT CASE WHEN LAG(ts) OVER w IS NULL THEN NULL
                WHEN ts < LAG(ts) OVER w THEN 1 ELSE 0 END AS flag
    FROM transcripts
    WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
rows_out AS (
    SELECT 'text_not_null' AS rule, 'not_null' AS kind,
        CAST(COUNT(*) AS BIGINT) AS n_checked,
        CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_violations
    FROM transcripts
    UNION ALL
    SELECT 'role_allowed', 'allowed', CAST(COUNT(*) AS BIGINT),
        CAST(SUM(CASE WHEN role IN ('user', 'assistant', 'tool')
                 THEN 0 ELSE 1 END) AS BIGINT)
    FROM transcripts
    UNION ALL
    SELECT 'turn_idx_range', 'range', CAST(COUNT(*) AS BIGINT),
        CAST(SUM(CASE WHEN turn_idx < 0 THEN 1 ELSE 0 END) AS BIGINT)
    FROM transcripts
    UNION ALL
    SELECT 'conv_id_format', 'regex', CAST(COUNT(*) AS BIGINT),
        CAST(SUM(CASE WHEN conv_id IS NOT NULL
                      AND regexp_matches(conv_id, '^c[0-9]+$')
                 THEN 0 ELSE 1 END) AS BIGINT)
    FROM transcripts
    UNION ALL
    SELECT 'tool_not_null', 'not_null', CAST(COUNT(*) AS BIGINT),
        CAST(SUM(CASE WHEN tool IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM transcripts
    UNION ALL
    SELECT 'ts_monotonic', 'monotonic', CAST(COUNT(flag) AS BIGINT),
        CAST(COALESCE(SUM(flag), 0) AS BIGINT)
    FROM mono
    UNION ALL
    SELECT 'turn_key_unique', 'unique',
        CAST(COUNT(DISTINCT (conv_id, turn_idx)) AS BIGINT),
        CAST(COUNT(*) - COUNT(DISTINCT (conv_id, turn_idx)) AS BIGINT)
    FROM transcripts
)
SELECT rule, kind, n_checked, n_violations,
    CASE WHEN n_checked > 0 THEN
        ROUND(n_violations / CAST(n_checked AS DOUBLE), 6) END
        AS violation_rate,
    n_violations = 0 AS passed
FROM rows_out"""


@register("transcripts_expectations", _EXPECT_ORACLE, driver=False)
def q_transcripts_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-contract gate (sparkfeat.audit.expectations_audit): seven
    declarative expectations over the transcript table — null/set/
    range/format row rules compile into ONE map-side-combined scan,
    ts-monotonicity adds its conv_id window, the (conv_id, turn_idx)
    key adds one distinct aggregate; the verdict table is rules-sized.
    The deliberately failing tool_not_null row pins the honest-failure
    path (tool is null on most turns)."""
    from sparkfeat.audit import expectations_audit

    tr = transcripts_from_events(spark, sf_dir)
    rules = [
        {"name": "text_not_null", "type": "not_null", "col": "text"},
        {
            "name": "role_allowed",
            "type": "allowed",
            "col": "role",
            "values": ["user", "assistant", "tool"],
        },
        {"name": "turn_idx_range", "type": "range", "col": "turn_idx", "min": 0},
        {
            "name": "conv_id_format",
            "type": "regex",
            "col": "conv_id",
            "pattern": "^c[0-9]+$",
        },
        {"name": "tool_not_null", "type": "not_null", "col": "tool"},
        {
            "name": "ts_monotonic",
            "type": "monotonic",
            "col": "ts",
            "by": "conv_id",
            "order": "turn_idx",
        },
        {
            "name": "turn_key_unique",
            "type": "unique",
            "cols": ["conv_id", "turn_idx"],
        },
    ]
    return expectations_audit(tr, rules)


_CLUSTER_SAMPLE_ORACLE = f"""WITH c AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
cents AS (
    SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cent_id, v AS cv
    FROM (SELECT * FROM c ORDER BY vec_id LIMIT 16)
),
assigned AS (
    SELECT vec_id, cent_id FROM (
        SELECT c.vec_id, cents.cent_id,
            ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
                {_COS.format(a='c.v', b='cents.cv')} DESC, cents.cent_id) AS r
        FROM c, cents) WHERE r = 1
),
keyed AS (
    SELECT cent_id, vec_id,
        md5('cb' || ':' || CAST(vec_id AS VARCHAR)) AS key
    FROM assigned
),
rk AS (
    SELECT cent_id, vec_id,
        ROW_NUMBER() OVER (PARTITION BY cent_id ORDER BY key, vec_id)
            AS sample_rank
    FROM keyed
)
SELECT CAST(cent_id AS INT) AS cent_id, vec_id,
    CAST(sample_rank AS INT) AS sample_rank
FROM rk WHERE sample_rank <= 25"""


@register("embedding_cluster_sample", _CLUSTER_SAMPLE_ORACLE, driver=False)
def q_embedding_cluster_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic-diversity balancing
    (sparkfeat.similarity.cluster_balanced_sample): exactly 25 vectors
    per embedding cluster — broadcast nearest-centroid assignment then
    the two-phase exact-k md5 rank, so no task ever owns a whole
    cluster; the oracle replays assignment (the IVF CTE) and the rank
    as its definitional single window."""
    from sparkfeat.similarity import cluster_balanced_sample

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = cluster_balanced_sample(emb, n_centroids=16, k_per_cluster=25)
    return out.select(
        F.col("cent_id").cast("int").alias("cent_id"), "vec_id", "sample_rank"
    )


def _logit_oracle(n_iter: int = 4, lam: float = 1e-3) -> str:
    """Unrolled IRLS replay (sparkfeat.probe.logistic_fit): one
    (moments → Cramer step) CTE pair per Newton iteration, every
    determinant written in _det3's exact term order, moments ROUND 6 /
    weights ROUND 9 at the same points as the engine."""

    def det(a) -> str:
        return (
            f"({a[0][0]}) * (({a[1][1]}) * ({a[2][2]}) - ({a[1][2]}) * ({a[2][1]}))"
            f" - ({a[0][1]}) * (({a[1][0]}) * ({a[2][2]}) - ({a[1][2]}) * ({a[2][0]}))"
            f" + ({a[0][2]}) * (({a[1][0]}) * ({a[2][1]}) - ({a[1][1]}) * ({a[2][0]}))"
        )

    bucket = _hex_bucket_sql("doc_id", 21, 100)
    ctes = [
        f"""f AS (
  SELECT doc_id, lang,
    CAST(LEN(list_filter({_TOKS}, w -> w IN {_STOP_SQL})) AS DOUBLE)
        / LEN({_TOKS}) AS x1,
    LEAST(CAST(LENGTH(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
        / LEN({_TOKS}) / 8.0, 1.0) AS x2,
    CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
    ({bucket} < 50) AS is_seed
  FROM documents WHERE text IS NOT NULL
)""",
        "w_0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2)",
    ]
    for k in range(n_iter):
        p = "(1.0 / (1.0 + EXP(-(w.w0 + w.w1 * f.x1 + w.w2 * f.x2))))"
        s = f"({p} * (1.0 - {p}))"
        ctes.append(
            f"""m_{k} AS (
  SELECT ROUND(SUM({s}), 6) AS h00,
         ROUND(SUM({s} * f.x1), 6) AS h01,
         ROUND(SUM({s} * f.x2), 6) AS h02,
         ROUND(SUM({s} * f.x1 * f.x1), 6) AS h11,
         ROUND(SUM({s} * f.x1 * f.x2), 6) AS h12,
         ROUND(SUM({s} * f.x2 * f.x2), 6) AS h22,
         ROUND(SUM(f.y - {p}), 6) AS g0,
         ROUND(SUM((f.y - {p}) * f.x1), 6) AS g1,
         ROUND(SUM((f.y - {p}) * f.x2), 6) AS g2,
         ANY_VALUE(w.w0) AS w0, ANY_VALUE(w.w1) AS w1, ANY_VALUE(w.w2) AS w2
  FROM f CROSS JOIN w_{k} w WHERE f.is_seed
)"""
        )
        a = [
            [f"h00 + {lam}", "h01", "h02"],
            ["h01", f"h11 + {lam}", "h12"],
            ["h02", "h12", f"h22 + {lam}"],
        ]
        b = [f"g0 - {lam} * w0", f"g1 - {lam} * w1", f"g2 - {lam} * w2"]
        d = det(a)
        steps = []
        for j, name in enumerate(("w0", "w1", "w2")):
            aj = [
                [b[i] if c == j else a[i][c] for c in range(3)]
                for i in range(3)
            ]
            steps.append(
                f"CASE WHEN ({d}) <> 0 THEN ROUND({name} + ({det(aj)}) / ({d}), 9)"
                f" ELSE {name} END AS {name}"
            )
        ctes.append(
            f"w_{k + 1} AS (SELECT {', '.join(steps)} FROM m_{k})"
        )
    body = ",\n".join(ctes)
    p_final = "(1.0 / (1.0 + EXP(-(w.w0 + w.w1 * f.x1 + w.w2 * f.x2))))"
    return f"""WITH {body}
SELECT f.doc_id, f.lang,
    ROUND(f.x1, 6) AS x1, ROUND(f.x2, 6) AS x2, f.is_seed,
    ROUND({p_final}, 6) AS p_hat,
    ROUND(w.w0, 9) AS w0, ROUND(w.w1, 9) AS w1, ROUND(w.w2, 9) AS w2
FROM f CROSS JOIN w_{n_iter} w"""


@register("doc_logistic_probe", _logit_oracle(), driver=False)
def q_doc_logistic_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-plan IRLS logistic probe (sparkfeat.probe.logistic_fit): the
    classification-correct upgrade of doc_quality_probe — 4 unrolled
    Newton steps, each one map-side-combined moment aggregate over the
    50% md5 seed slice + a Cramer 3x3 solve ON the moment row, weights
    broadcast back; every doc then scored with the calibrated
    sigmoid(w·x). Moments ROUND 6 before each solve, weights ROUND 9
    after (the bt_strengths trajectory-replay convention) — the oracle
    unrolls the identical CTE chain, so the hash verifies the whole
    MLE trajectory, not just the final dot product."""
    from sparkfeat import text as X
    from sparkfeat.corpus import hash_bucket
    from sparkfeat.probe import logistic_score

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
    )
    x1 = X.stopword_ratio("text")
    x2 = F.least(X.avg_word_len("text") / 8.0, F.lit(1.0))
    label = (F.col("lang") == "en").cast("double")
    seed = hash_bucket("doc_id", start=21, buckets=100) < 50
    out = logistic_score(docs, x1, x2, label, seed, n_iter=4)
    return out.select(
        "doc_id",
        "lang",
        F.round(x1, 6).alias("x1"),
        F.round(x2, 6).alias("x2"),
        seed.alias("is_seed"),
        "p_hat",
        "w0",
        "w1",
        "w2",
    )


def _memorization_oracle(n: int = 3, ref_pct: int = 500) -> str:
    gram = " || ' ' || ".join(f"ws[i+{k}]" if k else "ws[i]" for k in range(n))
    return f"""WITH h AS (
    SELECT doc_id, lower(text) AS lc, {_hex_bucket_sql("doc_id", 9, 1000)} AS bb
    FROM documents
),
w AS (
    SELECT doc_id, bb, regexp_split_to_array(lc, '\\s+') AS ws FROM h
),
gr AS (
    SELECT doc_id, bb,
        list_transform(generate_series(1, GREATEST(len(ws) - {n - 1}, 0)),
                       i -> md5({gram})) AS grams
    FROM w
),
refg AS (
    SELECT DISTINCT unnest(grams) AS gram FROM gr WHERE bb < {ref_pct}
),
cand AS (SELECT doc_id, grams FROM gr WHERE bb >= {ref_pct}),
cg AS (
    SELECT doc_id, gram, COUNT(*) AS mult
    FROM (SELECT doc_id, unnest(grams) AS gram FROM cand)
    GROUP BY doc_id, gram
),
hit AS (
    SELECT cg.doc_id, SUM(cg.mult) AS n_hit, COUNT(*) AS n_distinct_hit
    FROM cg JOIN refg USING (gram) GROUP BY cg.doc_id
)
SELECT cand.doc_id,
    CAST(len(grams) AS BIGINT) AS n_grams,
    CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
    CAST(COALESCE(n_hit, 0) AS BIGINT) AS n_hit,
    CAST(COALESCE(n_distinct_hit, 0) AS BIGINT) AS n_distinct_hit,
    CASE WHEN len(grams) > 0 THEN
        ROUND(COALESCE(n_hit, 0) / CAST(len(grams) AS DOUBLE), 6) END
        AS mem_rate,
    CASE WHEN len(list_distinct(grams)) > 0 THEN
        ROUND(COALESCE(n_distinct_hit, 0)
              / CAST(len(list_distinct(grams)) AS DOUBLE), 6) END
        AS distinct_mem_rate
FROM cand LEFT JOIN hit USING (doc_id)"""


@register("corpus_memorization", _memorization_oracle(), driver=False)
def q_corpus_memorization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verbatim-overlap memorization audit
    (sparkfeat.corpus.memorization_score): per candidate doc, the
    position-weighted and distinct fraction of its word n-grams
    already present ANYWHERE in the reference half of the corpus
    (deterministic md5 50/50 split; n=3 for the tiny synthetic
    vocabulary, n=8 for prose). The inverse-scale complement of
    corpus_decontaminate: the reference side can never broadcast, so
    it distinct-collapses map-side and the one wide op is the
    gram-keyed semi-join."""
    from sparkfeat.corpus import hash_bucket, memorization_score

    docs = _docs(spark, sf_dir)
    bb = hash_bucket("doc_id", start=9, buckets=1000)
    return memorization_score(
        docs.filter(bb >= 500), docs.filter(bb < 500), n=3
    )


def _sft_mask_oracle(budget: int = 128) -> str:
    """Loss-mask manifest oracle: the pack oracle's global cumsum plus
    the response-span clip — one generate_series explode per example
    over the sequences its response touches."""
    return f"""WITH packed AS (
    SELECT * FROM ({_sft_pack_oracle(budget)}) _pk
),
sp AS (
    SELECT * FROM ({_SFT_PAIRS_ORACLE}) _sp
),
rr AS (
    SELECT
        CAST(substr(conv_id, 2) AS BIGINT) * 1000000 + turn_idx AS example_id,
        CAST(len(regexp_split_to_array(response, '\\s+')) AS BIGINT) AS r
    FROM sp
),
spans AS (
    SELECT p.example_id,
        p.tok_start + p.n_tok - rr.r AS s,
        p.tok_start + p.n_tok AS e
    FROM packed p JOIN rr USING (example_id)
    WHERE p.tok_start + p.n_tok > p.tok_start + p.n_tok - rr.r
),
ex AS (
    SELECT example_id, s, e,
        unnest(generate_series(s // {budget}, (e - 1) // {budget})) AS seq_id
    FROM spans
)
SELECT example_id, CAST(seq_id AS BIGINT) AS seq_id,
    CAST(GREATEST(s, seq_id * {budget}) - seq_id * {budget} AS BIGINT)
        AS mask_start,
    CAST(LEAST(e, (seq_id + 1) * {budget}) - seq_id * {budget} AS BIGINT)
        AS mask_end,
    CAST(LEAST(e, (seq_id + 1) * {budget})
         - GREATEST(s, seq_id * {budget}) AS BIGINT) AS n_trainable
FROM ex"""


@register("sft_loss_mask", _sft_mask_oracle(), driver=False)
def q_sft_loss_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loss-mask manifest (sparkfeat.sft.loss_mask_spans) for the SFT
    pack: per (example, sequence) intersection, the token range inside
    the sequence whose loss is KEPT (the response's last-r-tokens span,
    clipped at sequence boundaries) — the mask table the sample-writer
    reads next to sft_pack_manifest. Distributed prefix sum + one
    equi-join + a bounded sequence() explode; exact bigint index math
    end to end."""
    from sparkfeat.sft import loss_mask_spans, sft_pairs

    tr = transcripts_from_events(spark, sf_dir)
    pairs = sft_pairs(
        tr, token_budget=_SFT_BUDGET, max_context_turns=_SFT_MAX_TURNS
    )
    examples = pairs.select(
        (
            F.expr("CAST(substring(conv_id, 2) AS BIGINT)") * 1000000
            + F.col("turn_idx")
        ).alias("example_id"),
        "prompt",
        "response",
    )
    return loss_mask_spans(examples, budget=128)


import math as _math

# identical float literals on BOTH engines (repr round-trips exactly),
# so the cumulative LLR is the same sequence of double additions —
# bit-identical before the 6-dp rounding even sees it
_SPRT_UP = repr(_math.log(0.6 / 0.5))
_SPRT_DOWN = repr(_math.log(0.4 / 0.5))
_SPRT_HI = repr(_math.log(0.95 / 0.05))
_SPRT_LO = repr(_math.log(0.05 / 0.95))

_SPRT_ORACLE = f"""WITH e AS (
    SELECT doc_id // 2 AS half, source AS s_e, n_chars AS c_e
    FROM documents WHERE doc_id % 2 = 0
),
o AS (
    SELECT doc_id // 2 AS half, source AS s_o, n_chars AS c_o
    FROM documents WHERE doc_id % 2 = 1
),
judg AS (
    SELECT half,
        CASE WHEN c_e >= c_o THEN s_e ELSE s_o END AS winner,
        CASE WHEN c_e >= c_o THEN s_o ELSE s_e END AS loser
    FROM e JOIN o USING (half)
),
stream AS (
    SELECT LEAST(winner, loser) AS a, GREATEST(winner, loser) AS b,
        half AS t, winner = LEAST(winner, loser) AS a_won
    FROM judg WHERE winner <> loser
),
st AS (
    SELECT a, b, t, a_won,
        ROW_NUMBER() OVER w AS n,
        ROUND(SUM(CASE WHEN a_won THEN {_SPRT_UP}
                       ELSE {_SPRT_DOWN} END) OVER
              (PARTITION BY a, b ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
            AS llr
    FROM stream
    WINDOW w AS (PARTITION BY a, b ORDER BY t)
),
cr AS (
    SELECT *, CASE WHEN llr >= {_SPRT_HI} THEN 'accept_h1'
                   WHEN llr <= {_SPRT_LO} THEN 'accept_h0' END AS cross_d
    FROM st
)
SELECT a, b,
    CAST(COUNT(*) AS BIGINT) AS n_judgments,
    ROUND(max_by(llr, n), 6) AS llr_final,
    COALESCE(min_by(cross_d, CASE WHEN cross_d IS NOT NULL THEN n END),
             'continue') AS decision,
    CAST(MIN(CASE WHEN cross_d IS NOT NULL THEN n END) AS BIGINT)
        AS n_decision,
    ROUND(min_by(llr, CASE WHEN cross_d IS NOT NULL THEN n END), 6)
        AS llr_at_decision
FROM cr GROUP BY a, b"""


_BOOT_N = 64  # replicates in the driver query (operator default 200)

_BOOT_LADDER = " ".join(
    f"WHEN bkt < {t} THEN {k}"
    for k, t in enumerate((367879, 735758, 919698, 981011, 996340, 999405, 999916))
)

_BOOT_ORACLE = f"""WITH e AS (
    SELECT doc_id // 2 AS half, source AS s_e, n_chars AS c_e
    FROM documents WHERE doc_id % 2 = 0
),
o AS (
    SELECT doc_id // 2 AS half, source AS s_o, n_chars AS c_o
    FROM documents WHERE doc_id % 2 = 1
),
judg AS (
    SELECT half,
        CASE WHEN c_e >= c_o THEN s_e ELSE s_o END AS winner,
        CASE WHEN c_e >= c_o THEN s_o ELSE s_e END AS loser
    FROM e JOIN o USING (half)
),
stream AS (
    SELECT LEAST(winner, loser) AS a, GREATEST(winner, loser) AS b,
        CAST(half AS VARCHAR) AS t,
        CAST(winner = LEAST(winner, loser) AS INT) AS aw
    FROM judg WHERE winner <> loser
),
reps AS (
    SELECT s.*, r.rep,
        CAST(('0x' || substr(md5('bs:' || CAST(r.rep AS VARCHAR) || ':' ||
            s.a || ':' || s.b || ':' || s.t), 1, 8)) AS BIGINT) % 1000000
            AS bkt
    FROM stream s CROSS JOIN
        (SELECT unnest(generate_series(1, {_BOOT_N})) AS rep) r
),
wts AS (
    SELECT a, b, rep, aw,
        CASE {_BOOT_LADDER} ELSE 7 END AS w
    FROM reps
),
per_rep AS (
    SELECT a, b, rep, SUM(w) AS wt, SUM(w * aw) AS ww
    FROM wts GROUP BY a, b, rep
    HAVING SUM(w) > 0
),
ci AS (
    SELECT a, b,
        quantile_cont(CAST(ww AS DOUBLE) / wt, 0.025) AS lo,
        quantile_cont(CAST(ww AS DOUBLE) / wt, 0.975) AS hi,
        CAST(COUNT(*) AS BIGINT) AS n_boot
    FROM per_rep GROUP BY a, b
),
pt AS (
    SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_judgments,
        SUM(aw) AS wins
    FROM stream GROUP BY a, b
)
SELECT pt.a, pt.b, pt.n_judgments,
    ROUND(CAST(pt.wins AS DOUBLE) / pt.n_judgments, 6) AS win_rate,
    ROUND(ci.lo, 6) AS ci_lo,
    ROUND(ci.hi, 6) AS ci_hi,
    ROUND(ci.hi - ci.lo, 6) AS ci_width,
    ci.n_boot
FROM pt JOIN ci USING (a, b)"""


@register("arena_winrate_bootstrap", _BOOT_ORACLE, driver=False)
def q_arena_winrate_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic online-bootstrap CI (arena.bootstrap_winrate_ci)
    for each pairing's win rate: per (judgment, replicate) an md5
    integer bucket draws a Poisson(1) weight by integer inverse-CDF
    ladder (no RNG state — the hash-sampling composability argument),
    replicate rates reduce map-side, exact percentiles across
    replicates give the CI. The explode multiplies the stream by
    n_boot but what shuffles is pairs x n_boot aggregate rows."""
    from sparkfeat.arena import bootstrap_winrate_ci

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = d.filter(F.col("doc_id") % 2 == 0).select(
        F.expr("doc_id div 2").alias("half"),
        F.col("source").alias("s_e"),
        F.col("n_chars").alias("c_e"),
    )
    od = d.filter(F.col("doc_id") % 2 == 1).select(
        F.expr("doc_id div 2").alias("half"),
        F.col("source").alias("s_o"),
        F.col("n_chars").alias("c_o"),
    )
    won = F.col("c_e") >= F.col("c_o")
    judg = ev.join(od, "half").select(
        F.col("half"),
        F.when(won, F.col("s_e")).otherwise(F.col("s_o")).alias("winner"),
        F.when(won, F.col("s_o")).otherwise(F.col("s_e")).alias("loser"),
    )
    stream = judg.where(F.col("winner") != F.col("loser")).select(
        F.least("winner", "loser").alias("a"),
        F.greatest("winner", "loser").alias("b"),
        F.col("half").alias("t"),
        (F.col("winner") == F.least("winner", "loser")).alias("a_won"),
    )
    return bootstrap_winrate_ci(stream, n_boot=_BOOT_N, seed="bs")


@register("arena_sprt", _SPRT_ORACLE, driver=False)
def q_arena_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential eval early-stopping (sparkfeat.arena.sprt_monitor):
    Wald's SPRT per source pairing over the deterministic length-judge
    stream — H0 p=0.5 vs H1 p=0.6, alpha=beta=0.05; each pair decides
    at its first 6-dp-rounded LLR boundary crossing or reports
    'continue'. One pair-keyed exchange: ordered cumsum of two literal
    increments + conditional-MIN first crossing + the summary rollup,
    all in the same partitioning. The oracle interpolates the SAME
    repr'd float literals, so both engines add identical doubles."""
    from sparkfeat.arena import sprt_monitor

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = d.filter(F.col("doc_id") % 2 == 0).select(
        F.expr("doc_id div 2").alias("half"),
        F.col("source").alias("s_e"),
        F.col("n_chars").alias("c_e"),
    )
    od = d.filter(F.col("doc_id") % 2 == 1).select(
        F.expr("doc_id div 2").alias("half"),
        F.col("source").alias("s_o"),
        F.col("n_chars").alias("c_o"),
    )
    won = F.col("c_e") >= F.col("c_o")
    judg = ev.join(od, "half").select(
        F.col("half"),
        F.when(won, F.col("s_e")).otherwise(F.col("s_o")).alias("winner"),
        F.when(won, F.col("s_o")).otherwise(F.col("s_e")).alias("loser"),
    )
    stream = judg.where(F.col("winner") != F.col("loser")).select(
        F.least("winner", "loser").alias("a"),
        F.greatest("winner", "loser").alias("b"),
        F.col("half").alias("t"),
        (F.col("winner") == F.least("winner", "loser")).alias("a_won"),
    )
    return sprt_monitor(stream, p0=0.5, p1=0.6, alpha=0.05, beta=0.05)


@register("preference_pair_rouge", None, driver=False)
def q_preference_pair_rouge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-L contrast screen (sparkfeat.geneval.rouge_l_pairs) over
    the mined DPO pairs — the order-sensitive complement of
    preference_pair_bleu (LCS credits only same-order tokens). The LCS
    is a true DP, hence the Arrow-kernel seam: rows-only driver check;
    the DP itself is pytest-pinned against a pure-Python reference
    (tests/test_geneval.py), the house convention for non-relational
    kernels (EWMA, GASF)."""
    from sparkfeat.conv import preference_pairs
    from sparkfeat.geneval import rouge_l_pairs

    pp = preference_pairs(transcripts_from_events(spark, sf_dir))
    return rouge_l_pairs(
        pp.select("conv_id", "retry_idx", "chosen_text", "rejected_text")
    )


@register("events_cusum", _CUSUM_ORACLE, driver=False)
def q_events_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential change-point monitoring (sparkfeat.drift.cusum_alarms)
    over the hourly per-event-type mean-value stream: the first 48 hours
    per series are the burn-in reference; the two one-sided Page CUSUM
    statistics accumulate standardized deviations and ``alarm`` fires
    past h=4. The max(0, ·) recursion runs as its closed form (cumsum
    minus clamped running min) — two stacked windows on ONE series
    exchange, no fold UDF."""
    from sparkfeat.drift import cusum_alarms

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hourly = ev.groupBy(
        F.col("event_type").alias("series"),
        F.date_trunc("hour", F.col("ts")).alias("t"),
    ).agg(F.avg("value").alias("x"))
    return cusum_alarms(hourly, ("series",), "t", "x", ref_n=48, k=0.5, h=4.0)


# pytest (tests/test_oracle_parity.py runs QUERIES ∪ EXTRA_QUERIES).
# A frozen split would let a query sit outside the driver gate forever —
# round 4 shipped two brand-new operators (doc_duplicate_spans,
# corpus_cut_dup_spans) that had never earned a driver CORRECTNESS row.
# Policy: EVERY registered query must be driver-green at least once per
# 2 rounds, so the out-group (17 queries) swaps with an equal-sized set
# of multi-round-green driver queries each round. The `driver=` flag on
# each @register call records the query's HOME group (primary vs twin);
# this block applies the per-round overlay in one audited place.
#
# Round 6 staging (rule 2: new queries take priority IN): the round-5
# late EXTRA registrations — conv_latency_stats, agent_curation_pairs,
# embedding_covariance, embedding_pca_whiten, embedding_pca_recon_error,
# feature_corr_matrix, embedding_quantize_audit, ann_ivf_quantized,
# dedup_source_crossrates, corpus_eval_sample, embedding_drift,
# corpus_decontaminate_semantic, ann_hard_negatives, doc_pmi_topk,
# corpus_curriculum_order, corpus_line_dedup, corpus_epoch_manifest,
# doc_quality_probe, corpus_decontaminate_bloom, doc_heavy_terms,
# corpus_cluster_safe_split, corpus_temperature_mix,
# source_quality_shrunk, probe_calibration, conv_distinct_sofar,
# rolling_trend_slope, source_distinct_hll, source_overlap_hll,
# rolling_len_tok_corr, corpus_weighted_sample,
# corpus_temperature_sample, arena_bt_strengths, arena_winrate_matrix,
# reward_grpo_advantages, reward_rloo_advantages, reward_best_of_n,
# corpus_datacard, corpus_snapshot_diff, corpus_snapshot_churn,
# corpus_incremental_features, arena_rater_kappa, doc_clean_text,
# corpus_length_batches, conv_role_transitions, corpus_domain_stats,
# corpus_categorical_drift, turn_drawdown_cumret,
# corpus_distinctive_terms, arena_fleiss_kappa, conv_echo_stats,
# conv_stuck_loops, arena_length_bias, conv_truncate_context,
# conv_shared_openers, corpus_ngram_diversity, corpus_zipf_fit,
# corpus_langid_agreement, conv_context_cost, conv_pattern_screen,
# conv_near_loops, conv_window_fit, dedup_cluster_keep_best,
# bpe_fertility, doc_winnow_fingerprints, dedup_winnow_pairs,
# arena_krippendorff_alpha, dedup_containment_pairs, feature_drift_ks,
# probe_rank_auc, probe_feature_mi, flagship_drift_ks,
# corpus_domain_pagerank, corpus_domain_hits,
# corpus_domain_trustrank, corpus_unimax_plan,
# search_retrieval_eval, arena_transitivity, arena_copeland,
# corpus_k_anonymity, corpus_l_diversity, corpus_t_closeness,
# preference_pair_bleu, events_cusum, preference_pair_rouge,
# arena_sprt, sft_loss_mask, arena_winrate_bootstrap,
# corpus_memorization, doc_logistic_probe, embedding_cluster_sample,
# transcripts_expectations, corpus_filter_waterfall,
# embedding_dim_truncation, turn_nstep_returns, corpus_span_corruption,
# corpus_fim —
# have never held a driver slot and must
# rotate IN next round, ceding multi-round-green untouched rows.
#
# Round 5 overlay: the entire round-4 out-group rotates IN (all 17 —
# 15 were driver-green in r2/r3 with code untouched since; the two span
# operators get their first driver row); 17 queries that are driver-green
# in ≥2 consecutive rounds (r3+r4) and whose code is untouched this
# round rotate OUT. Queries whose code changed this round (doc_lang_ngram,
# doc_fingerprint, corpus_mixture_sample, ann_ivf_kmeans) and every
# r4-first-green query stay IN.
# ---------------------------------------------------------------------------
ROTATION_ROUND = 5
_ROTATE_IN = [
    "ewma_grouped",
    "trading_hours_filter",
    "entity_ceiling_filter",
    "slice_head",
    "doc_lang_ngram_expr",
    "corpus_sample_split",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "multimodal_decode",
    "corr_pairs_topk",
    "gasf_window_images",
    "gadf_window_images",
    "mtf_window_images",
    "ewma_chunked_scan",
    "doc_duplicate_spans",
    "corpus_cut_dup_spans",
    "flagship_leakage_audit",
]
_ROTATE_OUT = [
    "tz_to_utc",
    "slice_range",
    "entity_floor_filter",
    "topk_entities",
    "select_between",
    "minutes_after_open",
    "lead_targets",
    "interpolate_limit",
    "resample_ohlc",
    "inverse_scalers",
    "universe_topn",
    "universe_membership",
    "corr_dedup_drops",
    "doc_textstats",
    "dedup_exact",
    "dedup_simhash",
    "multimodal_resize",
    # one extra slot ceded to the round-5 NEW query dedup_neardup_clusters
    # (rotation rule 2: new queries take priority IN)
    "gaussian_scaler",
    # three more slots ceded to the round-5 NEW queries bm25_topk,
    # dedup_incremental, corpus_chunks (all r3+r4-green, untouched)
    "normalize_scalers",
    "classify_bins",
    "assemble_vectors",
    # two more ceded to the round-5 NEW BPE queries bpe_pair_counts,
    # bpe_learn (both r2..r4-green, untouched)
    "ewma_halflife",
    "resample_densify_ffill",
    # one more ceded to the round-5 NEW hybrid_search_rrf, whose oracle
    # re-verifies the identical cosine math end-to-end
    "ann_cosine_topk",
    # one more ceded to the round-5 NEW bpe_encode_corpus (r1..r4-green,
    # untouched; stays benched + pytest-oracle-checked)
    "sessionize_aggregate",
    # ceded to the round-5 NEW sft_pairs (r3+r4-green, minhash path
    # untouched this round; stays benched + pytest-oracle-checked)
    "dedup_minhash_lsh",
    # ceded to the round-5 NEW doc_lm_perplexity (r3+r4-green, IVF pair
    # path untouched this round; stays benched + pytest-oracle-checked)
    "dedup_embedding_pairs",
    # ceded to the round-5 NEW dsir_weights (r3+r4-green, GASF/GADF/MTF
    # image path untouched this round; stays pytest-oracle-checked)
    "window_images",
    # ceded to the round-5 NEW semdedup_keeplist (r3+r4-green, video
    # codec untouched this round; stays pytest-oracle-checked)
    "multimodal_video_frames",
    # ceded to the round-5 NEW sft_pack_manifest (r3+r4-green, PPJoin
    # path untouched this round; stays benched + pytest-oracle-checked)
    "dedup_jaccard_pairs",
    # ceded to the round-5 NEW tool_chain_stats (r3+r4-green, config
    # module untouched this round; stays pytest-oracle-checked)
    "config_pipeline",
    # three more ceded to the round-5 NEW conversation-level queries
    # conv_dedup_exact, preference_pairs, resequence_turns (all three
    # ceded are r3+r4-green; multimodal.py untouched since r3, the
    # quality-rules and sign-LSH arrow code paths untouched this round
    # — text.py/similarity.py edits were other functions; all stay
    # benched where applicable + pytest-oracle-checked)
    "multimodal_real_decode",
    "doc_quality_rules",
    "ann_lsh_arrow",
]
for _name in _ROTATE_IN:
    QUERIES[_name] = EXTRA_QUERIES.pop(_name)
    if _name in EXTRA_ORACLES:
        ORACLES[_name] = EXTRA_ORACLES.pop(_name)
for _name in _ROTATE_OUT:
    EXTRA_QUERIES[_name] = QUERIES.pop(_name)
    if _name in ORACLES:
        EXTRA_ORACLES[_name] = ORACLES.pop(_name)

# Late-round-5 amendment (rule 2, applied within the round): nine
# driver rows that are r4-green with code UNTOUCHED this round cede
# their slots to nine never-driver-green operators, so the final
# CORRECTNESS run covers as many first-time rows as the cap allows.
# Kept in place despite being r4-green: flagship_features (entry()),
# and every r4-green row whose code path changed this round
# (doc_lang_ngram — arrow kernel null fix + vectorization;
# doc_fingerprint — left-join row preservation; corpus_mixture_sample
# — lazy in-plan total; ann_ivf_kmeans — lineage checkpoint flag;
# ann_ivf_served — int8 index storage option; corpus_prep_pipeline —
# lang stage rides the fixed kernel). All nine ceded rows stay fully
# DuckDB-oracle-checked in pytest and benched where applicable.
_ROTATE_IN_2 = [
    "arena_rater_kappa",
    "doc_clean_text",
    "corpus_length_batches",
    "conv_role_transitions",
    "corpus_domain_stats",
    "corpus_categorical_drift",
    "arena_bt_strengths",
    "corpus_line_dedup",
    "corpus_cluster_safe_split",
]
_ROTATE_OUT_2 = [
    "asof_join_grid",
    "corpus_decontaminate",
    "corpus_global_shuffle",
    "corpus_pack_sequences",
    "corpus_span_manifest",
    "dedup_embedding_lsh",
    "doc_pii_scrub",
    "doc_repetition",
    "training_dataset_manifest",
]
for _name in _ROTATE_IN_2:
    QUERIES[_name] = EXTRA_QUERIES.pop(_name)
    if _name in EXTRA_ORACLES:
        ORACLES[_name] = EXTRA_ORACLES.pop(_name)
for _name in _ROTATE_OUT_2:
    EXTRA_QUERIES[_name] = QUERIES.pop(_name)
    if _name in ORACLES:
        EXTRA_ORACLES[_name] = ORACLES.pop(_name)
assert len(QUERIES) <= 50, f"driver registry overflow: {len(QUERIES)}"
