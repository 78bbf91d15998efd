"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship point-in-time feature query on
sf0.001; ``queries()``/``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 with a DuckDB oracle (registry lives in
``sparkfeat.queries``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sparkfeat import queries as _q  # noqa: E402
from sparkfeat.shipping import ensure_shipped  # noqa: E402


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    """Ship the sparkfeat zip to executors before building the plan —
    Arrow UDF closures unpickle by module reference on workers — and pin
    the session timezone: epoch-microsecond bucket/gap math casts
    TIMESTAMP_NTZ through TIMESTAMP, which must mean UTC to agree with
    DuckDB's timezone-free epoch_us."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_shipped(spark)
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        return fn(spark, sf_dir)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _wrap(_q.QUERIES["flagship_features"])(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _wrap(fn) for name, fn in _q.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (same column names,
    floats rounded identically on both sides)."""
    return dict(_q.ORACLES)
