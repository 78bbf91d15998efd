#!/usr/bin/env python3
"""Scaling evidence for the CONVERSATION pipeline (round-5 agent ops):
the same N→4N two-parallelism protocol as scripts/scaling_bench.py and
scripts/corpus_scaling_bench.py, applied to the agent-curation job —
conversation signature dedup + retry-loop filter + preference-pair
mining (the q_agent_curation_pairs composition, minus the test-only
planted clones) over transcripts.

Input: sf0.1 transcripts replicated R times with distinct conv_id
suffixes (deterministic derivation of driver testdata only) — replica
conversations share no conv_id, so the conv-level aggregations scale in
group count, which is the realistic shape. The table is written in the
engine's steady-state posture — bucketed by conv_id, sorted by
(conv_id, ts, turn_idx), the Iceberg bucket()+WRITE ORDERED BY
stand-in (sparkfeat/iceberg.py) — so the job's only exchange is the
tiny survivor-list broadcast; the plan asserts ZERO hash exchanges.
(First measured on plain parquet: the conv_id hash exchange + sort of
every turn is memory-bus-bound on this host and capped efficiency at
0.64; the bucketed layout is the honest 100 TB shape and what the
flagship scaling evidence already uses.)

Protocol: fresh JVM per measurement, interleaved L,H,L,H,… ordering,
median of N with min..max spread, shuffle scratch on tmpfs. Default
pair is 1→4 per the host CPU calibration (scripts/cpu_calib.py: 0.93
per-process throughput retention at P=4, 0.80 at P=8 — the 2→8 pair is
capped by the box, not the job; BASELINE.md round 4).

Usage: python scripts/agent_scaling_bench.py [--low 1 --high 4]
       [--replicate 40] [--repeats 3]
Markdown rows on stdout + machine-readable JSON last line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import textwrap

SCRATCH = "/dev/shm/sparkfeat-agent-scratch"
BUCKETS = 64

DDL = (
    "CREATE TABLE IF NOT EXISTS agent_scaling_input "
    "(conv_id STRING, turn_idx INT, role STRING, text STRING, tool STRING, "
    "ts TIMESTAMP_NTZ) "
    f"USING parquet CLUSTERED BY (conv_id) SORTED BY (conv_id, ts, turn_idx) "
    f"INTO {BUCKETS} BUCKETS "
    "LOCATION '{data}'"
)

PREP = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    from pyspark.sql import functions as F
    from sparkfeat.session import get_spark
    from sparkfeat.schema import transcripts_from_events

    out, sf_dir, reps, wh = sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4]
    spark = get_spark("agent-prep-data", master="local[32]",
                      extra_conf={{"spark.sql.warehouse.dir": wh}})
    spark.sparkContext.setLogLevel("ERROR")
    t = transcripts_from_events(spark, sf_dir)
    r = spark.range(reps).select(F.col("id").cast("string").alias("_r"))
    big = t.crossJoin(r).withColumn(
        "conv_id", F.concat_ws("_", "conv_id", "_r")
    ).drop("_r")
    (big.repartition({buckets}, "conv_id")
        .write.bucketBy({buckets}, "conv_id").sortBy("conv_id", "ts", "turn_idx")
        .option("path", out).mode("overwrite").format("parquet")
        .saveAsTable("agent_scaling_input"))
    print(spark.table("agent_scaling_input").count())
    spark.stop()
    """
)

RUNNER = textwrap.dedent(
    """
    import json, os, sys, time
    sys.path.insert(0, {repo!r})
    os.environ.setdefault("SPARKFEAT_DRIVER_MEM", "48g")
    from pyspark.sql import functions as F
    from sparkfeat.session import get_spark
    from sparkfeat.conv import preference_pairs

    cores, data, wh = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    os.makedirs({scratch!r}, exist_ok=True)
    spark = get_spark(
        "agent-scaling", master=f"local[{{cores}}]", shuffle_partitions={buckets},
        extra_conf={{"spark.local.dir": {scratch!r},
                     "spark.sql.warehouse.dir": wh}},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql({ddl!r}.format(data=data))
    t = spark.table("agent_scaling_input")
    n = t.count()  # footer warm-up outside the timer

    # the q_agent_curation_pairs composition on the raw corpus: one
    # fused conv-level aggregation (order-aware signature + retry
    # counters), smallest-id keep + retry-frac filter, broadcast
    # survivor list back, preference-pair windows.
    # engine-fast xx64 signature (conv_signature(method='xx64'); the
    # md5 twin is the driver-oracle path — measured 2.8x slower from
    # per-row hex/BigDecimal allocation, which also inflated per-cycle
    # CPU cost under multi-core memory pressure)
    sig = t.groupBy("conv_id").agg(
        F.bit_xor(
            F.xxhash64(F.col("turn_idx"), F.col("role"), F.col("text"), F.col("tool"))
        ).alias("conv_sig"),
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
    out = preference_pairs(
        t.join(F.broadcast(kept), "conv_id"), sort_cols=("ts", "turn_idx")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the 4M-turn stream must never hash-exchange (bucketed layout);
    # the conv-LEVEL keep-list derivation re-keys by (conv_sig,
    # n_turns) — one row per conversation, vanishing next to the turn
    # stream — and that is the only hash partitioning allowed.
    assert "hashpartitioning(conv_id" not in plan, (
        "turn stream must not hash-exchange on the bucketed table"
    )
    t0 = time.perf_counter()
    out.write.format("noop").mode("overwrite").save()
    elapsed = time.perf_counter() - t0
    print(json.dumps({{"cores": cores, "turns": n, "times": [elapsed]}}))
    spark.stop()
    """
)


def _run_py(
    code: str, args: list[str], timeout: int = 3600, env: dict | None = None
) -> str:
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(code)
        path = f.name
    try:
        out = subprocess.run(
            [sys.executable, path, *args],
            capture_output=True,
            text=True,
            timeout=timeout,
            env=env,
        )
        if out.returncode != 0:
            raise RuntimeError(out.stderr[-2000:])
        return out.stdout.strip().splitlines()[-1]
    finally:
        os.unlink(path)


def _weak_scaling(runner: str, data: str, wh: str, n_procs: int) -> None:
    """Cluster-analog WEAK scaling: one local[1] JVM solo, then
    ``n_procs`` concurrent local[1] JVMs each running the full job on
    the same input — the sandbox stand-in for "N → 4N executors", since
    real executors are separate JVMs (own heap, own GC), not extra
    threads in one heap. Reports per-process retention and aggregate
    weak-scaling efficiency."""
    # a real executor gets a bounded heap; 4×48g driver-default heaps
    # overcommit the box and measure swap, not the job
    env = {**os.environ, "SPARKFEAT_DRIVER_MEM": "8g"}
    solo = json.loads(_run_py(runner, ["1", data, wh], env=env))["times"][0]
    procs = []
    for i in range(n_procs):
        with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
            f.write(runner)
            procs.append(
                subprocess.Popen(
                    [sys.executable, f.name, "1", data, wh],
                    stdout=subprocess.PIPE,
                    text=True,
                    env=env,
                )
            )
    walls = []
    for p in procs:
        out, _ = p.communicate(timeout=3600)
        walls.append(json.loads(out.strip().splitlines()[-1])["times"][0])
    med = statistics.median(walls)
    print(f"solo local[1]: {solo:.2f} s")
    print(
        f"{n_procs} concurrent local[1] JVMs: walls "
        + ", ".join(f"{w:.2f}" for w in sorted(walls))
    )
    print(
        json.dumps(
            {
                "mode": "weak",
                "procs": n_procs,
                "solo_s": round(solo, 2),
                "concurrent_s": [round(w, 2) for w in sorted(walls)],
                "per_process_retention": round(solo / med, 3),
                "weak_efficiency": round(solo / med, 3),
            }
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--replicate", type=int, default=160)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--low", type=int, default=1)
    ap.add_argument("--high", type=int, default=4)
    ap.add_argument("--data", default="/tmp/sparkfeat_agent_scaling")
    ap.add_argument(
        "--weak",
        type=int,
        default=0,
        metavar="N",
        help="cluster-analog weak scaling: solo local[1] vs N concurrent "
        "local[1] JVMs (executors are separate JVMs on a real cluster)",
    )
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    wh = args.data + "_wh"
    if not os.path.isdir(args.data):
        n = _run_py(
            PREP.format(repo=repo, buckets=BUCKETS),
            [args.data, args.sf_dir, str(args.replicate), wh],
        )
        print(f"prepared {n} turns at {args.data}")

    runner = RUNNER.format(repo=repo, scratch=SCRATCH, buckets=BUCKETS, ddl=DDL)
    if args.weak:
        _weak_scaling(runner, args.data, wh, args.weak)
        return
    times: dict[int, list[float]] = {args.low: [], args.high: []}
    turns = 0
    for _ in range(args.repeats):
        for cores in (args.low, args.high):  # interleaved L,H,L,H,…
            shutil.rmtree(SCRATCH, ignore_errors=True)
            r = json.loads(_run_py(runner, [str(cores), args.data, wh]))
            times[cores].append(r["times"][0])
            turns = r["turns"]

    med = {c: statistics.median(ts) for c, ts in times.items()}
    thr = {c: turns / med[c] for c in med}
    eff = (thr[args.high] / thr[args.low]) / (args.high / args.low)
    print(f"| cores | median s | min..max | turns/s |")
    print(f"|---|---|---|---|")
    for c in (args.low, args.high):
        lo, hi = min(times[c]), max(times[c])
        print(f"| {c} | {med[c]:.2f} | {lo:.2f}..{hi:.2f} | {thr[c]:,.0f} |")
    print(f"scaling efficiency {args.low}->{args.high}: {eff:.2f}")
    print(
        json.dumps(
            {
                "job": "agent_curation_pairs",
                "turns": turns,
                "low": args.low,
                "high": args.high,
                "median_s": {str(c): round(med[c], 2) for c in med},
                "spread_s": {
                    str(c): [round(min(ts), 2), round(max(ts), 2)]
                    for c, ts in times.items()
                },
                "turns_per_sec": {str(c): round(thr[c], 1) for c in thr},
                "efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
