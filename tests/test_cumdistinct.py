"""cumulative_distinct (sparkfeat/conv.py): hand-checked running
distinct counts, null exclusion, monotonicity + final-count equality
with countDistinct, independence from value-sort null placement, and
the one-exchange plan shape."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
from pyspark.sql import Window

from sparkfeat.conv import cumulative_distinct


def _conv(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # conv a: tools retry, None, retry, checkout, None, checkout
        ("a", 0, "retry"),
        ("a", 1, None),
        ("a", 2, "retry"),
        ("a", 3, "checkout"),
        ("a", 4, None),
        ("a", 5, "checkout"),
        # conv b: all null
        ("b", 0, None),
        ("b", 1, None),
        # conv c: one turn
        ("c", 0, "search"),
    ]
    return spark.createDataFrame(
        [(c, i, v, t0 + dt.timedelta(minutes=i)) for c, i, v in rows],
        "conv_id string, turn_idx int, tool string, ts timestamp",
    )


def test_hand_checked_running_counts(spark):
    out = {
        (r["conv_id"], r["turn_idx"]): r["n_distinct_tool"]
        for r in cumulative_distinct(_conv(spark), "tool").collect()
    }
    assert [out[("a", i)] for i in range(6)] == [1, 1, 1, 2, 2, 2]
    assert [out[("b", i)] for i in range(2)] == [0, 0]  # nulls never count
    assert out[("c", 0)] == 1


def test_monotone_and_matches_count_distinct(spark):
    df = cumulative_distinct(_conv(spark), "tool")
    # monotone non-decreasing along each conversation
    w_prev = (
        df.withColumn(
            "_prev",
            F.lag("n_distinct_tool").over(
                Window.partitionBy("conv_id").orderBy("ts", "turn_idx")
            ),
        )
        .filter(F.col("_prev") > F.col("n_distinct_tool"))
        .count()
    )
    assert w_prev == 0
    # the last turn's running count equals the exact distinct count
    final = (
        df.groupBy("conv_id")
        .agg(F.max("n_distinct_tool").alias("run"))
        .join(
            _conv(spark)
            .groupBy("conv_id")
            .agg(F.countDistinct("tool").alias("exact")),
            "conv_id",
        )
        .filter("run <> exact")
        .count()
    )
    assert final == 0


def test_one_exchange_for_stacked_features(transcripts):
    """All three stacked running-distinct features must share ONE
    hash(conv_id) exchange — value-resorted lag detection instead of a
    second (conv, value) shuffle or collect_set state."""
    import re

    out = cumulative_distinct(transcripts, "tool")
    out = cumulative_distinct(out, "role")
    out = cumulative_distinct(out, "text")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    assert "collect_set" not in plan, plan
