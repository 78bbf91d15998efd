"""Transcript data model + deterministic sources.

The engine's input is a long table of multi-turn conversation/agent
transcripts (BASELINE.json ``input_hint``)::

    conv_id: string, turn_idx: int32, role: string, text: string,
    tool: string, ts: timestamp

This replaces the reference's wide pandas layout (DatetimeIndex rows x
one column per symbol, ``tests/helpers.py:22-32``): entity is a key
column, not a schema element, so the same plan handles 15 or 10^9
conversations.

Two deterministic sources:

* :func:`transcripts_from_events` — derives transcripts from the driver
  testdata ``events`` table with pure SQL-expressible logic, so a DuckDB
  oracle can reconstruct the identical table (see ``TRANSCRIPTS_CTE``).
* :func:`synth_transcripts_pdf` — seeded numpy generator for unit tests
  (pandas-oracle parity, skew/chunking tests) with controllable
  conversation lengths.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), False),
    ]
)

#: DuckDB CTE that rebuilds the exact transcript table from the
#: pre-registered ``events`` view. Every oracle_sql() query for a
#: transcript operator starts with this. Kept 1:1 with
#: :func:`transcripts_from_events` — any edit must change both.
TRANSCRIPTS_CTE = """
transcripts AS (
    SELECT
        'c' || CAST(user_id AS VARCHAR) AS conv_id,
        CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INTEGER) AS turn_idx,
        CASE
            WHEN event_type IN ('signup', 'click', 'view') THEN 'user'
            WHEN event_type = 'purchase' THEN 'assistant'
            ELSE 'tool'
        END AS role,
        event_type || ' ' || props || repeat(' extra', CAST(event_id % 5 AS INTEGER)) AS text,
        CASE
            WHEN event_type = 'error' THEN 'retry'
            WHEN event_type = 'purchase' THEN 'checkout'
            ELSE NULL
        END AS tool,
        ts
    FROM events
)
""".strip()


def transcripts_from_events(
    spark: SparkSession, sf_dir: str, spread: bool = False
) -> DataFrame:
    """Deterministic transcript table derived from ``events`` parquet.

    Mirrors ``TRANSCRIPTS_CTE`` exactly (same expressions, same
    ROW_NUMBER tie-break on the unique ``event_id``) so DuckDB and Spark
    agree bit-for-bit on every row.

    ``spread=True`` pins the user_id exchange (which the row_number
    window needs anyway) to the session's configured shuffle
    parallelism: AQE's bytes-based coalescing folds a small-but-
    compute-dense table into 1-3 partitions, serializing every
    downstream per-turn transform that reuses the partitioning —
    right for consumers whose post-shuffle work is hash/window-heavy
    (MinHash signatures, nested drift replays), overhead for one-window
    readers. At cluster scale the exchange is far above the coalescing
    target either way and the pin changes nothing; the count stays
    conf-driven (spark.sql.shuffle.partitions), never hard-coded.
    """
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    if spread:
        ev = ev.repartition(
            int(spark.conf.get("spark.sql.shuffle.partitions")), "user_id"
        )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        F.concat(F.lit("c"), F.col("user_id").cast("string")).alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.when(F.col("event_type").isin("signup", "click", "view"), "user")
        .when(F.col("event_type") == "purchase", "assistant")
        .otherwise("tool")
        .alias("role"),
        F.concat(
            F.col("event_type"),
            F.lit(" "),
            F.col("props"),
            F.repeat(F.lit(" extra"), (F.col("event_id") % 5).cast("int")),
        ).alias("text"),
        F.when(F.col("event_type") == "error", "retry")
        .when(F.col("event_type") == "purchase", "checkout")
        .alias("tool"),
        F.col("ts"),
    )


def with_turn_signals(df: DataFrame) -> DataFrame:
    """Derive per-turn numeric signal columns from the transcript.

    The reference's transform layer is value-agnostic (``transform.py``
    operates on any numeric frame); the raw OHLCV fields map to derived
    per-turn numerics (SURVEY.md §1.4): ``text_len`` is the price-like
    signal, ``token_est`` the volume-like one.
    """
    return df.withColumn("text_len", F.length("text").cast("double")).withColumn(
        "token_est", F.size(F.split(F.col("text"), " ")).cast("double")
    ).withColumn("is_tool", F.col("tool").isNotNull().cast("int"))


#: SQL fragment matching with_turn_signals for DuckDB oracles.
TURN_SIGNALS_SQL = (
    "CAST(LENGTH(text) AS DOUBLE) AS text_len, "
    "CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE) AS token_est, "
    "CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END AS is_tool"
)


def synth_transcripts_pdf(
    n_convs: int = 8,
    turns_per_conv: int | list[int] = 60,
    seed: int = 7,
    start: str = "2024-03-01",
    gap_seconds: float = 120.0,
) -> pd.DataFrame:
    """Seeded synthetic transcript frame for unit tests.

    Deterministic (numpy Generator with fixed seed); conversation
    lengths may be heterogeneous (pass a list) to exercise skew paths.
    Timestamps step by an exponential gap around ``gap_seconds`` so
    sessionization has real gaps to find.
    """
    rng = np.random.default_rng(seed)
    lengths = (
        [turns_per_conv] * n_convs if isinstance(turns_per_conv, int) else list(turns_per_conv)
    )
    roles = np.array(["user", "assistant", "tool"])
    words = np.array(
        "the quick brown fox jumps over lazy dog spark feature window "
        "rolling asof join session transcript agent tool call result".split()
    )
    rows = []
    base = pd.Timestamp(start, tz="UTC")
    for c, length in enumerate(lengths):
        t = base + pd.Timedelta(seconds=float(rng.integers(0, 3600)))
        for i in range(length):
            n_words = int(rng.integers(1, 12))
            text = " ".join(rng.choice(words, size=n_words))
            role = roles[i % 3]
            tool = "search" if (role == "tool" and rng.random() < 0.5) else None
            rows.append((f"conv{c:03d}", i, role, text, tool, t.to_pydatetime()))
            t = t + pd.Timedelta(seconds=float(rng.exponential(gap_seconds)) + 1.0)
    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )


def synth_transcripts(spark: SparkSession, **kwargs) -> DataFrame:
    """Spark DataFrame over :func:`synth_transcripts_pdf`."""
    pdf = synth_transcripts_pdf(**kwargs)
    pdf["ts"] = pd.to_datetime(pdf["ts"], utc=True).dt.tz_localize(None)
    return spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)
