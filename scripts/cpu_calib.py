#!/usr/bin/env python3
"""Host CPU-scaling calibration: the ceiling any parallel job has here.

Runs P identical single-threaded workers (md5 + regex — the corpus
pipeline's ALU mix) for a fixed wall-time each and reports per-process
throughput retention vs P=1. On a shared VM the retention < 1 comes
from all-core turbo limits + hypervisor steal; no Spark job can scale
better than this, so scaling-efficiency readings in BASELINE.md are
interpreted against these ceilings (e.g. retention 0.80 at P=8 means a
perfectly-scaling job reads ≈0.8 efficiency at 2→8 on this box, and the
N→4N evidence pair must sit where the ceiling is near 1).

Usage: python scripts/cpu_calib.py [--procs 1,4,8] [--seconds 8]
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess
import sys
import textwrap

WORKER = textwrap.dedent(
    """
    import hashlib, re, time
    rx = re.compile(r"[a-z]+[0-9]{2,}")
    s = b"the quick brown fox jumps over the lazy dog 1234 " * 20
    txt = ("token%d abc123 xyz99 " % 7) * 10
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < SECONDS:
        hashlib.md5(s + str(n).encode()).hexdigest()
        rx.findall(txt)
        n += 1
    print(n / (time.perf_counter() - t0))
    """
)


def run_level(p: int, seconds: float) -> list[float]:
    code = WORKER.replace("SECONDS", repr(seconds))
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code], stdout=subprocess.PIPE, text=True
        )
        for _ in range(p)
    ]
    return [float(pr.communicate()[0].strip()) for pr in procs]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", default="1,4,8")
    ap.add_argument("--seconds", type=float, default=8.0)
    args = ap.parse_args()
    levels = [int(x) for x in args.procs.split(",")]
    out = {}
    base = None
    for p in levels:
        rates = run_level(p, args.seconds)
        med = statistics.median(rates)
        if base is None:
            base = med
        out[p] = {
            "median_rate": round(med, 1),
            "retention_vs_p1": round(med / base, 3),
        }
        print(
            f"P={p}: median {med:,.0f} iter/s/process, "
            f"retention {med / base:.3f}"
        )
    print(json.dumps({"levels": out, "seconds": args.seconds}))


if __name__ == "__main__":
    main()
