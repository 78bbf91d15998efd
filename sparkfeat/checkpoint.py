"""Resumable checkpointed runs: per-partition manifests with lineage +
metrics (north rule).

A run is split into B deterministic buckets (``pmod(hash(conv_id), B)``
— the same hash partitioning the windowed plan uses, so bucket filters
prune cleanly). ONE Spark job writes every pending bucket as
``data/bucket=N/`` partitions (single input scan), and a bucket's JSON
manifest is written only after its data is durably on storage — so a
crash leaves either (data+manifest) or (no manifest ⇒ bucket re-run,
idempotent overwrite). Resume = enumerate manifests, re-run the
complement. No driver-side row loops.

The reference has no persistence at all (results are in-memory ndarray
dicts, transformation/financial.py:135); this layer is what a 10^12-turn
run needs instead: kill -9 at any point loses at most one batch.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def bucket_of(entity_col: str, num_buckets: int):
    return F.pmod(F.xxhash64(F.col(entity_col)), F.lit(num_buckets)).cast("int")


def _manifest_dir(output_path: str) -> str:
    return os.path.join(output_path, "_manifests")


def _bucket_rows_from_footers(output_path: str, bucket: int) -> int:
    """Per-bucket row count from the committed parquet file FOOTERS
    (``num_rows`` in each file's metadata) — storage truth without
    re-reading the output data. Footers are a few KB per file, so at a
    100 TB output this reads megabytes instead of scanning the whole
    output back through Spark (the round-2 implementation's second
    read). Local-filesystem walk; an object-store deployment swaps in
    the FileSystem listing API, same footer reads."""
    import pyarrow.parquet as pq

    d = os.path.join(output_path, "data", f"_bucket={bucket}")
    if not os.path.isdir(d):
        return 0
    total = 0
    for root, _, files in os.walk(d):
        for fn in files:
            if fn.endswith(".parquet") and not fn.startswith("."):
                total += pq.read_metadata(os.path.join(root, fn)).num_rows
    return total


def completed_buckets(output_path: str) -> set[int]:
    mdir = _manifest_dir(output_path)
    if not os.path.isdir(mdir):
        return set()
    out = set()
    for f in os.listdir(mdir):
        if f.startswith("bucket=") and f.endswith(".json"):
            out.add(int(f[len("bucket=") : -len(".json")]))
    return out


def run_checkpointed(
    spark: SparkSession,
    plan: Callable[[SparkSession], DataFrame],
    output_path: str,
    num_buckets: int = 16,
    batch_size: int | None = None,
    entity_col: str = "conv_id",
    lineage: dict | None = None,
) -> dict:
    """Execute ``plan`` with per-bucket manifests and resume.

    **Single input pass** by default: ONE job writes every pending bucket
    via ``partitionBy('_bucket')`` (the input is scanned once, not
    ``num_buckets/batch`` times — at 100 TB the old per-batch filter was
    a 4× read amplification), and per-bucket manifests are published
    AFTER the write commits, from a recount of what actually landed
    (storage truth). A crash leaves either (data + manifest) or (no
    manifest ⇒ bucket re-runs, dynamic-partition overwrite replaces any
    half-written data — idempotent, never duplicated).

    ``batch_size=k`` opts back into k-buckets-per-job batching for
    blast-radius control (each batch re-filters the plan — pay the extra
    scans only if a mid-run checkpoint cadence is genuinely needed).

    Returns the run summary (buckets written/skipped, rows, seconds,
    jobs).
    """
    os.makedirs(_manifest_dir(output_path), exist_ok=True)
    done = completed_buckets(output_path)
    todo = [b for b in range(num_buckets) if b not in done]
    summary = {
        "num_buckets": num_buckets,
        "skipped": sorted(done),
        "written": [],
        "rows": 0,
        "seconds": 0.0,
        "jobs": 0,
    }
    df = plan(spark).withColumn("_bucket", bucket_of(entity_col, num_buckets))
    step = batch_size if batch_size else max(len(todo), 1)
    for i in range(0, len(todo), step):
        batch = todo[i : i + step]
        t0 = time.perf_counter()
        part = df.filter(F.col("_bucket").isin(batch))
        part.write.mode("overwrite").partitionBy("_bucket").option(
            "partitionOverwriteMode", "dynamic"
        ).parquet(os.path.join(output_path, "data"))
        elapsed = time.perf_counter() - t0
        summary["jobs"] += 1
        # rows per bucket from what actually landed (storage truth) —
        # committed parquet footers, not a second Spark read of the output
        counts = {b: _bucket_rows_from_footers(output_path, b) for b in batch}
        for b in batch:
            manifest = {
                "bucket": b,
                "rows": counts.get(b, 0),
                "written_at_unix": time.time(),
                "batch_seconds": round(elapsed, 3),
                "entity_col": entity_col,
                "lineage": lineage or {},
                "spark_version": spark.version,
            }
            tmp = os.path.join(_manifest_dir(output_path), f".bucket={b}.json.tmp")
            final = os.path.join(_manifest_dir(output_path), f"bucket={b}.json")
            with open(tmp, "w") as f:
                json.dump(manifest, f)
            os.replace(tmp, final)  # atomic publish
            summary["written"].append(b)
            summary["rows"] += counts.get(b, 0)
        summary["seconds"] += elapsed
    return summary


def read_checkpointed(spark: SparkSession, output_path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(output_path, "data"))


def run_metrics(output_path: str) -> list[dict]:
    """All manifests for a run — the metrics/lineage record."""
    mdir = _manifest_dir(output_path)
    out = []
    for f in sorted(os.listdir(mdir)):
        if f.endswith(".json"):
            with open(os.path.join(mdir, f)) as fh:
                out.append(json.load(fh))
    return out


def publish_audit(
    output_path: str, audit_df: DataFrame, name: str = "leakage"
) -> dict:
    """Publish an audit result (e.g. ``audit.truncation_leakage_audit``)
    into the run's manifest directory, next to the per-bucket metrics —
    the north rule gates throughput on the zero-leakage audit, so the
    audit verdict is part of the run record, not a side channel.

    The audit DataFrame is per-cutoff aggregates (a handful of rows by
    construction), so the collect here is O(cutoffs), never O(data).
    Atomic publish like the bucket manifests; ``run_metrics`` picks it
    up with the rest."""
    rows = [r.asDict() for r in audit_df.collect()]
    payload = {
        "audit": name,
        "rows": rows,
        "clean": all(
            r.get("n_viol", 1) == 0
            and r.get("n_only_full", 1) == 0
            and r.get("n_only_trunc", 1) == 0
            for r in rows
        )
        and bool(rows),
        "written_at_unix": time.time(),
    }
    mdir = _manifest_dir(output_path)
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".audit={name}.json.tmp")
    final = os.path.join(mdir, f"audit={name}.json")
    with open(tmp, "w") as f:
        json.dump(payload, f, default=str)
    os.replace(tmp, final)
    return payload
