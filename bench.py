#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "turns_per_sec_flagship", "value": N, "unit": "sec",
     "queries": {...per-query seconds...}, "sf": ..., "turns": ...}

The north-star metric is turns/sec of the flagship point-in-time
feature plan (BASELINE.json). Scaling-efficiency evidence (local[8] vs
local[32]) is produced by scripts/scaling_bench.py and recorded in
BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

#: queries timed per-round; flagship defines the headline metric.
BENCH_QUERIES = [
    "flagship_features",
    "sessionize_aggregate",
    "ewma_halflife",
]


def main() -> None:
    from sparkfeat import queries as q
    from sparkfeat.session import get_spark

    spark = get_spark("sparkfeat-bench", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once (excluded from timings)
    turns = spark.read.parquet(f"{SF_DIR}/events.parquet").count()

    per_query: dict[str, float] = {}
    for name in BENCH_QUERIES:
        if name not in q.QUERIES:
            continue
        fn = q.QUERIES[name]
        t0 = time.perf_counter()
        # count() forces the full plan without driver-side collect cost
        fn(spark, SF_DIR).count()
        per_query[name] = round(time.perf_counter() - t0, 3)

    flagship_sec = per_query.get("flagship_features", float("nan"))
    print(
        json.dumps(
            {
                "metric": "flagship_feature_gen_sec",
                "value": flagship_sec,
                "unit": "sec",
                "queries": per_query,
                "sf": SF_DIR,
                "turns": turns,
                "turns_per_sec": round(turns / flagship_sec, 1)
                if flagship_sec == flagship_sec
                else None,
                "cpus": int(CPUS),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
