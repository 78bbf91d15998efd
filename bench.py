#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "flagship_feature_gen_sec", "value": N, "unit": "sec",
     "queries": {...per-query seconds...}, "sf": ..., "turns": ...,
     "turns_per_sec": ...}

Timings force FULL materialization through the `noop` sink — a bare
count() lets Catalyst prune every feature column and you end up timing
the scan (measured: 150M-row "feature job" in 0.5s — all windows
eliminated). Scaling-efficiency evidence (N vs 4N cores) is produced by
scripts/scaling_bench.py and recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
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
    "asof_join_grid",
    "resample_densify_ffill",
    "dedup_jaccard_pairs",
    "ann_cosine_topk",
    # round 2 additions (kept after the original seven for cross-round
    # comparability of the shared keys)
    "dedup_minhash_lsh",
    "dedup_embedding_pairs",
    "gaussian_scaler",
    # round 3 additions: the de-quadraticized text-quality path, the
    # k-means-refined IVF search (2 Lloyd rounds + bucket probe), and the
    # fit-free LSH ANN scale path
    "doc_quality_rules",
    "ann_ivf_kmeans",
    "ann_lsh_topk",
    "ann_lsh_arrow",
    # the end-to-end training-corpus filter (quality + langid + exact
    # dedup + minhash near-dup in ONE job)
    "corpus_prep_pipeline",
    # round 4 additions: the full packing manifest (distributed prefix
    # sum + span explode), the persisted-index ANN serving path, the
    # map-only PII scrub, and the broadcast decontamination sweep
    "corpus_span_manifest",
    "ann_ivf_served",
    "doc_pii_scrub",
    "corpus_decontaminate",
    # cross-doc duplicate-span cut (n-gram exact-substring dedup rebuild)
    "corpus_cut_dup_spans",
]


def main() -> None:
    from sparkfeat import queries as q
    from sparkfeat.session import get_spark

    spark = get_spark("sparkfeat-bench", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once (excluded from timings)
    turns = spark.read.parquet(f"{SF_DIR}/events.parquet").count()

    per_query: dict[str, float] = {}
    # EXTRA_QUERIES holds pytest-only strategy twins (e.g. the expr-HOF
    # LSH path ann_lsh_topk) — still benched for cross-round comparability.
    registry = {**q.QUERIES, **q.EXTRA_QUERIES}
    for name in BENCH_QUERIES:
        if name not in registry:
            continue
        fn = registry[name]
        # steady-state timing: one untimed execution first (whole-stage
        # codegen compilation + JIT warmup otherwise dominates the first
        # run and adds ±40% run-to-run noise at this input size), then
        # the MEDIAN of 3 timed runs — this VM takes minutes-long bursts
        # of external hypervisor load (measured: the same query 0.8 s
        # quiet vs 9.9 s mid-burst), and a single timed run lands inside
        # a burst often enough to corrupt a round's numbers. noop sink:
        # full evaluation of every output column, no driver collect.
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        per_query[name] = round(statistics.median(times), 3)

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
