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
