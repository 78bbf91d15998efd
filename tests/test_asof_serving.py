"""The interval (serving-path) as-of strategy: snapshot_intervals +
asof_join_intervals must be row-for-row equal to the union-tag
sort-merge asof_join — including equal-timestamp ties and probes
before the first observation — and the SAME code path must serve a
streaming probe side (stream-static join) with identical output."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sparkfeat.asof import asof_join, asof_join_intervals, snapshot_intervals


def _t(m: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, m, 0)


@pytest.fixture(scope="module")
def grid(spark, transcripts):
    sig = transcripts.withColumn("text_len", F.length("text").cast("double"))
    spans = sig.groupBy("conv_id").agg(
        (
            F.unix_micros(F.min("ts").cast("timestamp"))
            - F.unix_micros(F.min("ts").cast("timestamp")) % 3_600_000_000
        ).alias("_h0"),
        F.unix_micros(F.max("ts").cast("timestamp")).alias("_mx"),
    )
    probes = spans.select(
        "conv_id",
        F.explode(
            F.sequence(F.col("_h0"), F.col("_mx"), F.lit(3_600_000_000))
        ).alias("_us"),
    ).select("conv_id", F.timestamp_micros(F.col("_us")).alias("probe_ts"))
    return sig, probes


def _key(rows):
    return sorted(
        (r.conv_id, r.probe_ts, r.text_len, r.turn_idx) for r in rows
    )


def test_interval_asof_equals_union_tag(spark, grid):
    sig, probes = grid
    cols = ["text_len", "turn_idx"]
    a = asof_join(probes, sig, cols).collect()
    iv = snapshot_intervals(sig, cols)
    b = asof_join_intervals(probes, iv, cols).collect()
    assert len(a) == len(b) == probes.count()  # left join row-preserving
    assert _key(a) == _key(b)
    # probes from before the first observation exist and carry nulls
    assert any(r.text_len is None for r in b)


def test_interval_asof_tie_break_max_tie_row(spark):
    """Two observations at the SAME ts: the max-turn_idx row is served
    (the non-last row's interval is empty), matching asof_join."""
    data = spark.createDataFrame(
        [
            ("c", 0, _t(10), 1.0),
            ("c", 1, _t(10), 2.0),  # same ts, higher tie -> this one serves
            ("c", 2, _t(30), 3.0),
        ],
        "conv_id string, turn_idx int, ts timestamp, v double",
    )
    probes = spark.createDataFrame(
        [("c", _t(10)), ("c", _t(20)), ("c", _t(40)), ("c", _t(5))],
        "conv_id string, probe_ts timestamp",
    )
    iv = snapshot_intervals(data, ["v"])
    got = {
        r.probe_ts: r.v
        for r in asof_join_intervals(probes, iv, ["v"]).collect()
    }
    want = {
        r.probe_ts: r.v for r in asof_join(probes, data, ["v"]).collect()
    }
    assert got == want == {_t(10): 2.0, _t(20): 2.0, _t(40): 3.0, _t(5): None}


def test_stream_asof_serve_matches_batch(spark, grid, tmp_path):
    """availableNow probe stream against the static interval table ==
    the batch interval join (and therefore == asof_join)."""
    from sparkfeat.streaming import stream_asof_serve

    sig, probes = grid
    cols = ["text_len", "turn_idx"]
    probes.write.parquet(str(tmp_path / "probes"))
    iv = snapshot_intervals(sig, cols).persist()
    batch = _key(asof_join_intervals(probes, iv, cols).collect())

    probe_stream = spark.readStream.schema(
        "conv_id string, probe_ts timestamp"
    ).parquet(str(tmp_path / "probes"))
    served = stream_asof_serve(probe_stream, iv, cols)
    q = (
        served.writeStream.format("memory")
        .queryName("asof_served")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = _key(spark.sql("SELECT * FROM asof_served").collect())
    iv.unpersist()
    assert got == batch


def test_interval_asof_broadcast_plan(spark, grid):
    """broadcast=True: the snapshot is broadcast-side, the probe side
    never shuffles; no cartesian either way."""
    sig, probes = grid
    iv = snapshot_intervals(sig, ["text_len"])
    out = asof_join_intervals(probes, iv, ["text_len"], broadcast=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan
