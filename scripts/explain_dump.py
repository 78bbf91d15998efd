#!/usr/bin/env python3
"""Dump .explain('formatted') for named registry queries to
plans/<round>/<name>_<tag>.txt (judge deliverable + optimization aid).

Usage: python scripts/explain_dump.py <tag> <query> [<query>...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), PLANS_DIR.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANS = os.environ.get("PLANS_DIR", "plans/r06")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    from sparkfeat import queries as q
    from sparkfeat.session import get_spark

    spark = get_spark("sparkfeat-explain")
    spark.sparkContext.setLogLevel("ERROR")
    registry = {**q.QUERIES, **q.EXTRA_QUERIES}
    os.makedirs(PLANS, exist_ok=True)
    for name in names:
        df = registry[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out = os.path.join(PLANS, f"{name}_{tag}.txt")
        with open(out, "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        n_reuse = plan.count("ReusedExchange")
        n_py = plan.count("EvalPython") + plan.count("MapInArrow") + plan.count(
            "MapInPandas"
        )
        print(f"{name}: {len(plan.splitlines())} lines, Exchange={n_ex} "
              f"(reused={n_reuse}), python_nodes={n_py} -> {out}")
    spark.stop()


if __name__ == "__main__":
    main()
