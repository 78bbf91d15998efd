"""spark-submit entry point (north rule: ``spark-submit --py-files
sparkfeat.zip -m sparkfeat.cli``-style launch).

Runs the flagship point-in-time feature plan over a transcript parquet
(or the driver's events table, deriving transcripts) and writes a
checkpointed, resumable output with per-bucket manifests.

Example::

    python -m sparkfeat.shipping            # build sparkfeat.zip
    spark-submit --py-files /tmp/sparkfeat-*.zip sparkfeat/cli.py \
        --events /root/testdata/sf0.1 --output /tmp/run1 \
        --num-buckets 32 --gap-seconds 1800

Re-running the same command resumes from the manifests.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# spark-submit runs this file as a script: make the package importable
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("sparkfeat")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--transcripts", help="parquet path with transcript schema")
    src.add_argument("--events", help="testdata sf dir (transcripts derived)")
    p.add_argument("--output", required=True)
    p.add_argument("--num-buckets", type=int, default=16)
    p.add_argument("--batch-size", type=int, default=None,
                   help="buckets per job; default = all pending in ONE job "
                        "(single input scan). Set for blast-radius batching.")
    p.add_argument("--gap-seconds", type=float, default=1800.0)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument("--master", default=None)
    return p


def run_job(spark, args) -> dict:
    from sparkfeat.checkpoint import run_checkpointed
    from sparkfeat.pipeline import flagship_features
    from sparkfeat.schema import transcripts_from_events

    def plan(s):
        if args.events:
            t = transcripts_from_events(s, args.events)
            src = {"events": args.events}
        else:
            t = s.read.parquet(args.transcripts)
            src = {"transcripts": args.transcripts}
        plan.lineage = src
        return flagship_features(t, gap_seconds=args.gap_seconds)

    plan(spark)  # resolve lineage eagerly for the manifest
    return run_checkpointed(
        spark,
        plan,
        args.output,
        num_buckets=args.num_buckets,
        batch_size=args.batch_size,
        lineage={"source": plan.lineage, "gap_seconds": args.gap_seconds},
    )


def main(argv=None) -> int:
    from sparkfeat.session import get_spark
    from sparkfeat.shipping import ensure_shipped

    args = build_parser().parse_args(argv)
    spark = get_spark(
        "sparkfeat-cli", master=args.master, shuffle_partitions=args.shuffle_partitions
    )
    ensure_shipped(spark)
    summary = run_job(spark, args)
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
