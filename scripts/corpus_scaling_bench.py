#!/usr/bin/env python3
"""Scaling evidence for the DOCUMENT pipeline (corpus_prep_flags): the
same N→4N two-parallelism protocol as scripts/scaling_bench.py, applied
to the LLM-data path (quality gate + language ID + exact dedup +
MinHash near-dup) instead of the transcript feature job.

Input: the sf documents table replicated R times. Each replica prefixes
every token with a replica salt (``q<j>``), so replicas share NO tokens
— duplicate structure stays per-replica (R × the original dup groups)
instead of exploding into cross-replica near-dup cliques, which is the
realistic shape (a crawler's corpus is mostly unique docs, not R copies
of itself).

Protocol (same as the transcript bench): fresh JVM per measurement,
interleaved L,H,L,H,… ordering, median of N with min..max spread,
shuffle scratch on tmpfs.

Default pair is N=1→4N=4 (same as the transcript evidence): the host
CPU calibration (scripts/cpu_calib.py) retains 0.93 per-process
throughput at P=4 but only 0.80 at P=8, so the 2→8 pair is capped by
the box, not the job — see BASELINE.md round 4.

Usage: python scripts/corpus_scaling_bench.py [--low 1 --high 4]
       [--replicate 10] [--repeats 3]
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

SCRATCH = "/dev/shm/sparkfeat-corpus-scratch"

PREP = textwrap.dedent(
    """
    import sys
    from functools import reduce
    sys.path.insert(0, {repo!r})
    from pyspark.sql import functions as F
    from sparkfeat.session import get_spark

    out, sf_dir, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
    spark = get_spark("corpus-prep-data", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{{sf_dir}}/documents.parquet")
    parts = [
        docs.select(
            (F.col("doc_id") + j * 10_000_000).alias("doc_id"),
            F.regexp_replace("text", r"(^|\\s)", "$1q%d" % j).alias("text"),
            "lang",
            "source",
        )
        for j in range(reps)
    ]
    big = reduce(lambda a, b: a.unionByName(b), parts)
    big.repartition(64).write.mode("overwrite").parquet(out)
    print(spark.read.parquet(out).count())
    spark.stop()
    """
)

RUNNER = textwrap.dedent(
    """
    import json, os, sys, time
    sys.path.insert(0, {repo!r})
    os.environ.setdefault("SPARKFEAT_DRIVER_MEM", "48g")
    from sparkfeat.session import get_spark
    from sparkfeat.corpus import corpus_prep_flags

    cores, data = int(sys.argv[1]), sys.argv[2]
    evlog = sys.argv[3] if len(sys.argv) > 3 else ""
    os.makedirs({scratch!r}, exist_ok=True)
    conf = {{"spark.local.dir": {scratch!r}}}
    if evlog:
        os.makedirs(evlog, exist_ok=True)
        conf["spark.eventLog.enabled"] = "true"
        conf["spark.eventLog.dir"] = "file://" + evlog
        # Spark 4 defaults to rolling event-log DIRECTORIES with
        # zstd-compressed segments; force one plain-text file so the
        # parse below needs no decompressor.
        conf["spark.eventLog.rolling.enabled"] = "false"
        conf["spark.eventLog.compress"] = "false"
    spark = get_spark(
        "corpus-scaling", master=f"local[{{cores}}]", shuffle_partitions=64,
        extra_conf=conf,
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(data)
    n = docs.count()  # footer warm-up outside the timer
    out = corpus_prep_flags(docs)
    w0 = time.time() * 1000  # epoch ms: event-log task window boundary
    t0 = time.perf_counter()
    out.write.format("noop").mode("overwrite").save()
    elapsed = time.perf_counter() - t0
    w1 = time.time() * 1000
    print(json.dumps({{"cores": cores, "docs": n, "times": [elapsed],
                       "t0_ms": w0, "t1_ms": w1}}))
    spark.stop()
    """
)


def _parse_eventlog(evdir: str, t0_ms: float, t1_ms: float) -> dict:
    """Sum per-task executor run/CPU time for tasks that FINISH inside
    the timed window [t0_ms, t1_ms] (the warm-up count's tasks finish
    before t0). Spark event logs are JSON lines; task metrics carry
    'Executor Run Time' (ms) and 'Executor CPU Time' (ns)."""
    files = []
    for root, _dirs, names in os.walk(evdir):
        files += [
            os.path.join(root, f)
            for f in names
            if not f.startswith((".", "appstatus"))
        ]
    run_ms = cpu_ns = n_tasks = 0
    for path in files:
        if path.endswith((".zstd", ".zst")):
            # rolling-log segment (Spark 4 default); zstandard isn't in
            # the container, pyarrow's codec stream is
            import io

            import pyarrow as pa

            fh = io.TextIOWrapper(
                pa.input_stream(path, compression="zstd"), errors="replace"
            )
        else:
            fh = open(path, errors="replace")
        with fh:
            for line in fh:
                if '"SparkListenerTaskEnd"' not in line:
                    continue
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                info = ev.get("Task Info", {})
                if not (t0_ms <= info.get("Finish Time", 0) <= t1_ms):
                    continue
                m = ev.get("Task Metrics") or {}
                run_ms += m.get("Executor Run Time", 0)
                cpu_ns += m.get("Executor CPU Time", 0)
                n_tasks += 1
    return {
        "task_run_s": round(run_ms / 1e3, 1),
        "task_cpu_s": round(cpu_ns / 1e9, 1),
        "n_tasks": n_tasks,
    }


def _run_py(code: str, args: list[str], timeout: int = 3600) -> str:
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(code)
        path = f.name
    try:
        out = subprocess.run(
            [sys.executable, path, *args], capture_output=True, text=True, timeout=timeout
        )
        if out.returncode != 0:
            raise RuntimeError(out.stderr[-2000:])
        return out.stdout.strip().splitlines()[-1]
    finally:
        os.unlink(path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--replicate", type=int, default=40)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--low", type=int, default=1)
    ap.add_argument("--high", type=int, default=4)
    ap.add_argument("--data", default="/tmp/sparkfeat_corpus_scaling")
    ap.add_argument(
        "--paired",
        type=int,
        default=0,
        metavar="N",
        help="same-window paired mode: N back-to-back (low, high) pairs, "
        "each run event-log-profiled; reports per-pair efficiency + "
        "high-level core utilization (the round-4 stage-profiled "
        "protocol, repeated so the headline doesn't rest on one pair)",
    )
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    marker = os.path.join(args.data, "_replicate.marker")
    if os.path.isdir(args.data):
        # refuse to silently reuse a corpus prepared at a different
        # replication factor (a stale dir once shrank a "4x larger"
        # rerun back to the old corpus without any visible sign)
        prev = open(marker).read().strip() if os.path.exists(marker) else "?"
        if prev != str(args.replicate):
            sys.exit(
                f"{args.data} holds a --replicate {prev} corpus; "
                f"requested {args.replicate}. Delete it or pass --data."
            )
    else:
        n = _run_py(
            PREP.format(repo=repo), [args.data, args.sf_dir, str(args.replicate)]
        )
        with open(marker, "w") as fh:
            fh.write(str(args.replicate))
        print(f"prepared {n} docs at {args.data}", file=sys.stderr)

    runner = RUNNER.format(repo=repo, scratch=SCRATCH)

    if args.paired:
        scale = args.high / args.low
        pairs = []
        docs = 0
        for i in range(args.paired):
            pair = {}
            for cores in (args.low, args.high):
                shutil.rmtree(SCRATCH, ignore_errors=True)
                evdir = tempfile.mkdtemp(prefix="sparkfeat_evlog_")
                try:
                    r = json.loads(_run_py(runner, [str(cores), args.data, evdir]))
                    prof = _parse_eventlog(evdir, r["t0_ms"], r["t1_ms"])
                finally:
                    shutil.rmtree(evdir, ignore_errors=True)
                elapsed = r["times"][0]
                docs = r["docs"]
                pair[cores] = {
                    "elapsed_s": round(elapsed, 1),
                    **prof,
                    "utilization": round(
                        prof["task_run_s"] / (elapsed * cores), 3
                    ),
                }
            eff = pair[args.low]["elapsed_s"] / (
                scale * pair[args.high]["elapsed_s"]
            )
            pairs.append({"pair": i, "efficiency": round(eff, 3), **{
                f"local{c}": pair[c] for c in (args.low, args.high)
            }})
            print(
                f"pair {i}: eff={eff:.3f} "
                f"L={pair[args.low]['elapsed_s']}s "
                f"H={pair[args.high]['elapsed_s']}s "
                f"(H util {pair[args.high]['utilization']:.1%}, "
                f"H cpu {pair[args.high]['task_cpu_s']}s)",
                file=sys.stderr,
            )
        effs = [p["efficiency"] for p in pairs]
        print("| pair | eff | low s (util) | high s (util) | high task-cpu s |")
        print("|---|---|---|---|---|")
        for p in pairs:
            lo, hi = p[f"local{args.low}"], p[f"local{args.high}"]
            print(
                f"| {p['pair']} | {p['efficiency']} "
                f"| {lo['elapsed_s']} ({lo['utilization']:.0%}) "
                f"| {hi['elapsed_s']} ({hi['utilization']:.0%}) "
                f"| {hi['task_cpu_s']} |"
            )
        print(
            f"\nsame-window paired efficiency local[{args.low}]→local[{args.high}]: "
            f"median **{statistics.median(effs):.3f}** "
            f"(n={len(effs)}, spread {min(effs):.3f}..{max(effs):.3f})"
        )
        print(
            json.dumps(
                {
                    "mode": "paired",
                    "levels": [args.low, args.high],
                    "pairs": pairs,
                    "efficiency_median": round(statistics.median(effs), 3),
                    "efficiency_spread": [min(effs), max(effs)],
                    "docs": docs,
                    "replicate": args.replicate,
                }
            )
        )
        return

    times: dict[int, list[float]] = {args.low: [], args.high: []}
    docs = 0
    # interleaved L,H,L,H,… — drift penalizes neither level (see
    # scripts/scaling_bench.py for the rationale)
    for _ in range(args.repeats):
        for cores in (args.low, args.high):
            shutil.rmtree(SCRATCH, ignore_errors=True)
            r = json.loads(_run_py(runner, [str(cores), args.data]))
            times[cores].extend(r["times"])
            docs = r["docs"]

    rows = {}
    for cores in (args.low, args.high):
        med = statistics.median(times[cores])
        rows[cores] = {
            "median_sec": round(med, 3),
            "min_sec": round(min(times[cores]), 3),
            "max_sec": round(max(times[cores]), 3),
            "times": [round(t, 3) for t in times[cores]],
            "docs_per_sec": round(docs / med, 1),
        }
    scale = args.high / args.low
    eff = rows[args.low]["median_sec"] / (scale * rows[args.high]["median_sec"])
    env = [
        rows[args.low]["min_sec"] / (scale * rows[args.high]["max_sec"]),
        rows[args.low]["max_sec"] / (scale * rows[args.high]["min_sec"]),
    ]
    print("| parallelism | median sec (min..max) | docs/sec |")
    print("|---|---|---|")
    for cores in (args.low, args.high):
        r = rows[cores]
        print(
            f"| local[{cores}] | {r['median_sec']} ({r['min_sec']}..{r['max_sec']}) "
            f"| {r['docs_per_sec']} |"
        )
    print(
        f"\ndocs: {docs}; corpus-prep scaling efficiency "
        f"local[{args.low}]→local[{args.high}]: **{eff:.3f}** "
        f"(envelope {env[0]:.3f}..{env[1]:.3f}, interleaved, median of {args.repeats})"
    )
    print(
        json.dumps(
            {
                "low": rows[args.low],
                "high": rows[args.high],
                "levels": [args.low, args.high],
                "scale_factor": scale,
                "efficiency": round(eff, 3),
                "efficiency_envelope": [round(env[0], 3), round(env[1], 3)],
                "interleaved": True,
                "docs": docs,
                "sf_dir": args.sf_dir,
                "replicate": args.replicate,
            }
        )
    )


if __name__ == "__main__":
    main()
