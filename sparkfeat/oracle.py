"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its DuckDB oracle SQL over the same
parquet directory, then compares row count, column-name set, and
order-insensitive values (rows sorted by all columns, NaN==NaN). Used
by tests/test_oracle_parity.py so mismatches surface before the driver's
CORRECTNESS gate does.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    try:
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_df, oracle_df: pd.DataFrame, float_tol: float = 1e-9) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    got = _canon(spark_df.toPandas())
    want = _canon(oracle_df)
    if set(got.columns) != set(want.columns):
        problems.append(f"columns differ: spark={sorted(got.columns)} oracle={sorted(want.columns)}")
        return problems
    if len(got) != len(want):
        problems.append(f"row count differs: spark={len(got)} oracle={len(want)}")
        return problems
    for c in got.columns:
        # the driver's value hash distinguishes 42 from 42.0: a float
        # column on one side vs integer on the other (DuckDB's
        # SUM(BIGINT) OVER → HUGEINT → float64 hazard) is a hash fail
        # even when every value compares equal, so fail it here first.
        gf = pd.api.types.is_float_dtype(got[c])
        wf = pd.api.types.is_float_dtype(want[c])
        if gf != wf:
            problems.append(
                f"{c}: float/integer dtype mismatch (hash hazard): "
                f"spark={got[c].dtype} oracle={want[c].dtype}"
            )
    if problems:
        return problems
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g):
            gn, wn = g.isna(), w.isna()
            if not gn.equals(wn):
                problems.append(f"{c}: null mask differs ({int((gn != wn).sum())} rows)")
                continue
            diff = (g[~gn] - w[~wn]).abs()
            scale = w[~wn].abs().clip(lower=1.0)
            bad = diff > float_tol * scale
            if bad.any():
                i = diff[bad].idxmax()
                problems.append(
                    f"{c}: {int(bad.sum())} values differ, worst row {i}: "
                    f"spark={g[i]!r} oracle={w[i]!r}"
                )
        else:
            neq = ~((g == w) | (g.isna() & w.isna()))
            if neq.any():
                i = neq.idxmax()
                problems.append(
                    f"{c}: {int(neq.sum())} values differ, e.g. row {i}: "
                    f"spark={g[i]!r} oracle={w[i]!r}"
                )
    return problems


def check_query(spark, name: str, sf_dir: str, float_tol: float = 1e-9) -> list[str]:
    """Check one query — driver-facing or pytest-only (EXTRA_*) — against
    its DuckDB oracle."""
    from sparkfeat import queries as q

    queries = {**q.QUERIES, **q.EXTRA_QUERIES}
    oracles = {**q.ORACLES, **q.EXTRA_ORACLES}
    if name not in oracles:
        df = queries[name](spark, sf_dir)
        n = df.count()
        return [] if n >= 0 else [f"{name}: query failed"]
    spark_df = queries[name](spark, sf_dir)
    oracle_df = run_oracle(oracles[name], sf_dir)
    return compare(spark_df, oracle_df, float_tol)
