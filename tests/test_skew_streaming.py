"""Mega-conversation skew (FIXTURES.md F1: convs ≥10k turns alongside
tiny ones) and the Structured Streaming sessionization twin."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparkfeat import transforms as T
from sparkfeat.windows import repartition_sorted, sessionize


@pytest.fixture(scope="module")
def skewed(spark):
    """2 tiny convs + one 50k-turn mega-conversation."""
    rng = np.random.default_rng(17)
    frames = []
    for conv, n in [("tiny_a", 12), ("mega", 50_000), ("tiny_b", 5)]:
        frames.append(
            pd.DataFrame(
                {
                    "conv_id": conv,
                    "turn_idx": np.arange(n, dtype="int32"),
                    "ts": pd.date_range("2024-01-01", periods=n, freq="30s"),
                    "v": rng.normal(100, 10, size=n),
                }
            )
        )
    pdf = pd.concat(frames, ignore_index=True)
    return pdf, spark.createDataFrame(pdf)


def test_mega_conversation_windows_and_chunked_ewma(skewed):
    """Windows + all three EWMA strategies stay correct on a 50k-turn
    conversation; the chunk scan bounds per-task state."""
    pdf, df = skewed
    df = repartition_sorted(df)
    out = df.withColumn("vol", T.volatility("v", window=20))
    out = T.ewma(out, "v", halflife=50.0, out_col="e_chunk", chunk_size=4096)
    out = T.ewma_sorted(out, [("v", 50.0, "e_stream")])
    got = (
        out.select("conv_id", "turn_idx", "vol", "e_chunk", "e_stream")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    want_e = want.groupby("conv_id")["v"].transform(
        lambda s: s.ewm(halflife=50.0).mean()
    )
    np.testing.assert_allclose(got["e_chunk"], want_e, rtol=1e-9)
    np.testing.assert_allclose(got["e_stream"], want_e, rtol=1e-9)

    def vol_oracle(s):
        # unclipped log-returns: reference volatility never shrink_tails
        lr = np.log(s.pct_change() + 1).replace([np.inf, -np.inf], np.nan)
        return lr.rolling(20, min_periods=3).std()

    want_v = want.groupby("conv_id")["v"].transform(vol_oracle)
    mask = ~want_v.isna()
    np.testing.assert_allclose(got["vol"][mask], want_v[mask], rtol=1e-9)
    assert got["vol"][~mask].isna().all()


def _with_flush(spark, df, days_ahead: int, tag: str):
    """Append a far-future sentinel turn: advances the event-time
    watermark past every real session so append-mode emits them (a real
    pipeline gets this for free from continuously arriving data)."""
    from pyspark.sql import functions as F

    mx = df.agg(F.max("ts")).collect()[0][0]
    flush = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": [f"_flush_{tag}"],
                "turn_idx": np.array([0], dtype="int32"),
                "role": ["system"],
                "text": ["flush"],
                "tool": [None],
                "ts": [pd.Timestamp(mx) + pd.Timedelta(days=days_ahead)],
            }
        ),
        schema=df.schema,
    )
    return df.unionByName(flush)


def test_streaming_sessionization_matches_batch(spark, transcripts, tmp_path):
    from sparkfeat.streaming import run_stream_once

    inp = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    _with_flush(spark, transcripts, 10, "a").write.mode("overwrite").parquet(inp)

    got = (
        run_stream_once(spark, inp, ckpt, gap="30 minutes")
        .toPandas()
        .query("~conv_id.str.startswith('_flush')")
        .sort_values(["conv_id", "session_start"])
        .reset_index(drop=True)
    )

    batch = sessionize(transcripts, gap_seconds=1800.0)
    want = (
        batch.groupBy("conv_id", "session_idx")
        .agg(F.count(F.lit(1)).alias("n_turns"), F.min("ts").alias("first_ts"))
        .toPandas()
        .sort_values(["conv_id", "first_ts"])
        .reset_index(drop=True)
    )
    # identical sessions (count, per-session sizes, start timestamps)
    assert len(got) == len(want)
    pd.testing.assert_series_equal(
        got["n_turns"].astype("int64"),
        want["n_turns"].astype("int64"),
        check_names=False,
    )
    pd.testing.assert_series_equal(
        pd.to_datetime(got["first_ts"]),
        pd.to_datetime(want["first_ts"]),
        check_names=False,
    )


def test_streaming_resume_processes_only_new_files(spark, transcripts, tmp_path):
    from sparkfeat.streaming import run_stream_once

    inp = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    first_in = _with_flush(
        spark, transcripts.filter(F.col("conv_id") != "conv005"), 10, "a"
    )
    outp = str(tmp_path / "out")
    first_in.write.mode("overwrite").parquet(inp)
    first = run_stream_once(spark, inp, ckpt, output_path=outp).toPandas()
    convs1 = {c for c in first["conv_id"] if not c.startswith("_flush")}
    assert "conv005" not in convs1 and len(convs1) > 0

    # new data arrives LATER in event time than the advanced watermark
    shifted = transcripts.filter(F.col("conv_id") == "conv005").withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 12 DAYS")
    )
    _with_flush(spark, shifted, 10, "b").write.mode("append").parquet(inp)
    second = run_stream_once(spark, inp, ckpt, output_path=outp).toPandas()
    convs2 = {c for c in second["conv_id"] if not c.startswith("_flush")}
    assert convs2 == {"conv005"}  # only the delta, no re-emission


def test_chunked_bounded_windows_bit_identical(skewed):
    """The chunked-window skew strategy (overlap-carry sub-partitions)
    must be bit-identical to the plain per-conversation windows for every
    bounded transform, including the partial-window head of each conv."""
    from sparkfeat.windows import chunked_bounded_windows

    pdf, df = skewed

    def features(d, entity_cols):
        return (
            d.withColumn("vol", T.volatility("v", window=20, entity_col=entity_cols))
            .withColumn("k", T.stochastic_k("v", length=14, entity_col=entity_cols))
            .withColumn("ker", T.ker("v", lag=5, entity_col=entity_cols))
        )

    plain = (
        features(df, "conv_id")
        .select("conv_id", "turn_idx", "vol", "k", "ker")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    chunked = (
        chunked_bounded_windows(df, features, max_window=21, chunk_size=1000)
        .select("conv_id", "turn_idx", "vol", "k", "ker")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(plain, chunked)


def test_chunked_bounded_windows_rejects_short_chunks(skewed):
    """ADVICE r1: chunk_size < max_window − 1 would silently truncate
    trailing windows (context only replicates from the previous chunk)."""
    from sparkfeat.windows import chunked_bounded_windows

    _, df = skewed
    with pytest.raises(ValueError, match="chunk_size"):
        chunked_bounded_windows(df, lambda d, e: d, max_window=50, chunk_size=10)


def test_stream_ewma_state_carries_across_invocations(spark, transcripts, tmp_path):
    """applyInPandasWithState streaming EWMA == batch ewm(): the (S, W)
    state survives in the state store across two availableNow
    invocations (checkpoint recovery), so late turns continue each
    conversation's weighted cumsum exactly."""
    from sparkfeat import transforms as T
    from sparkfeat.schema import TRANSCRIPT_SCHEMA
    from sparkfeat.streaming import stream_ewma

    indir = str(tmp_path / "in")
    ck = str(tmp_path / "ck")
    outdir = str(tmp_path / "out")

    def run_once(batch_df):
        batch_df.write.mode("append").parquet(indir)
        st = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(indir)
        st = st.withColumn("text_len", F.length("text").cast("double"))
        q = (
            stream_ewma(st, "text_len", halflife=7.5, out_col="e")
            .writeStream.format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once(transcripts.filter("turn_idx < 10"))
    run_once(transcripts.filter("turn_idx >= 10"))

    got = (
        spark.read.parquet(outdir)
        .toPandas()
        .sort_values(["conv_id", "ts", "turn_idx"])
        .reset_index(drop=True)
    )
    sig = transcripts.withColumn("text_len", F.length("text").cast("double"))
    want = (
        T.ewma(sig, "text_len", halflife=7.5, out_col="e")
        .select("conv_id", "ts", "turn_idx", "e")
        .toPandas()
        .sort_values(["conv_id", "ts", "turn_idx"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    np.testing.assert_allclose(got["e"], want["e"], rtol=1e-9)


def test_stream_corpus_filter_quality_and_dedup(spark, tmp_path):
    """Streaming ingestion filter: quality-fail docs never emit, a
    fingerprint re-sent in a later microbatch within the watermark is
    dropped, and fresh docs pass — state-store dedup matching the batch
    exact-dedup verdicts on the same data."""
    import pandas as pd

    from sparkfeat.streaming import stream_corpus_filter

    good = "the quick brown fox jumps over the lazy dog again and again in the morning"
    good2 = "a different and perfectly reasonable document about the weather in the old town"
    bad = "### ### ### ###"  # symbol-ratio + stopword fail
    indir = str(tmp_path / "in")
    ck = str(tmp_path / "ck")
    outdir = str(tmp_path / "out")

    def batch(rows, name):
        pdf = pd.DataFrame(rows, columns=["doc_id", "text", "ingest_ts"])
        pdf["ingest_ts"] = pd.to_datetime(pdf["ingest_ts"])
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(indir)

    def run_once():
        st = spark.readStream.schema(
            "doc_id BIGINT, text STRING, ingest_ts TIMESTAMP"
        ).parquet(indir)
        q = (
            stream_corpus_filter(st, watermark="1 hour")
            .writeStream.format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    batch(
        [(1, good, "2024-03-01 10:00:00"), (2, bad, "2024-03-01 10:01:00")],
        "b1",
    )
    run_once()
    batch(
        [(3, good, "2024-03-01 10:05:00"), (4, good2, "2024-03-01 10:06:00")],
        "b2",
    )
    run_once()

    got = spark.read.parquet(outdir).toPandas().sort_values("doc_id")
    # doc 2 fails quality; doc 3 is a within-watermark duplicate of doc 1
    assert list(got["doc_id"]) == [1, 4], got
    assert got["fingerprint"].nunique() == 2


def test_stream_preference_pairs_matches_batch_across_restart(
    spark, transcripts, tmp_path
):
    """Streaming preference mining == batch conv.preference_pairs: a
    retry pending at the micro-batch boundary waits in the state store
    across an availableNow restart and emits when its resolution
    arrives in the SECOND invocation. (The synth fixture's only tool
    value is 'search', so that plays the retry marker here.)"""
    import pandas as pd

    from sparkfeat.conv import preference_pairs
    from sparkfeat.schema import TRANSCRIPT_SCHEMA
    from sparkfeat.streaming import stream_preference_pairs

    indir = str(tmp_path / "in")
    ck = str(tmp_path / "ck")
    outdir = str(tmp_path / "out")

    def run_once(batch_df):
        batch_df.write.mode("append").parquet(indir)
        st = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(indir)
        q = (
            stream_preference_pairs(st, retry_tool="search")
            .writeStream.format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once(transcripts.filter("turn_idx < 10"))
    run_once(transcripts.filter("turn_idx >= 10"))

    cols = [
        "conv_id",
        "retry_idx",
        "prompt_text",
        "rejected_text",
        "chosen_idx",
        "chosen_role",
        "chosen_text",
    ]
    got = (
        spark.read.parquet(outdir)
        .toPandas()[cols]
        .sort_values(["conv_id", "retry_idx"])
        .reset_index(drop=True)
    )
    want = (
        preference_pairs(transcripts, retry_tool="search")
        .toPandas()[cols]
        .sort_values(["conv_id", "retry_idx"])
        .reset_index(drop=True)
    )
    assert len(want) > 0  # the fixture must actually exercise the path
    pd.testing.assert_frame_equal(got, want)


def test_stream_cusum_equals_batch_across_restart(spark, tmp_path):
    """stream_cusum ≡ cusum_alarms: the live monitor fed the
    post-burn-in points (profile frozen from the burn-in) reproduces
    the batch operator's live rows exactly, with the (s_pos, s_neg)
    state carried across two availableNow invocations (restart
    recovery); a stable series stays silent, the shifted one alarms."""
    import pandas as pd

    from sparkfeat.drift import cusum_alarms, cusum_profile
    from sparkfeat.streaming import stream_cusum

    ref_n = 8
    xs_shift = [10.0, 10.4, 9.6, 10.2, 9.8, 10.1, 9.9, 10.0] + [12.5] * 10
    xs_flat = [5.0 + (0.1 if i % 2 else -0.1) for i in range(18)]
    rows = [("up", i, x) for i, x in enumerate(xs_shift)] + [
        ("flat", i, x) for i, x in enumerate(xs_flat)
    ]
    df = spark.createDataFrame(rows, "series string, t int, x double")

    batch = {
        (r["series"], r["t"]): r.asDict()
        for r in cusum_alarms(df, ("series",), "t", "x", ref_n=ref_n).collect()
    }
    prof = cusum_profile(df, ("series",), "t", "x", ref_n=ref_n)

    indir, ck, outdir = (
        str(tmp_path / d) for d in ("in_cusum", "ck_cusum", "out_cusum")
    )
    live = df.where(F.col("t") >= ref_n)

    def run_once(part):
        part.write.mode("append").parquet(indir)
        st = spark.readStream.schema("series string, t int, x double").parquet(
            indir
        )
        q = (
            stream_cusum(st, prof, "series", "t", "x", k=0.5, h=4.0)
            .writeStream.format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once(live.where(F.col("t") < 12))
    run_once(live.where(F.col("t") >= 12))

    got = spark.read.parquet(outdir).collect()
    assert len(got) == live.count()
    for r in got:
        b = batch[(r["series"], r["t"])]
        assert r["s_pos"] == pytest.approx(b["s_pos"], abs=1e-9), (r, b)
        assert r["s_neg"] == pytest.approx(b["s_neg"], abs=1e-9), (r, b)
        assert r["alarm"] == b["alarm"], (r, b)
        assert r["z"] == pytest.approx(b["z"], abs=1e-9)
    assert any(r["alarm"] for r in got if r["series"] == "up")
    assert not any(r["alarm"] for r in got if r["series"] == "flat")


def test_stream_cusum_unknown_series_emits_null_z(spark, tmp_path):
    """A series with no profile row must flow through with NULL z and
    silent statistics (the batch zero-variance convention), not crash
    the stream."""
    from sparkfeat.drift import cusum_profile
    from sparkfeat.streaming import stream_cusum

    known = [("a", i, float(i % 3)) for i in range(6)]
    df = spark.createDataFrame(known, "series string, t int, x double")
    prof = cusum_profile(df, ("series",), "t", "x", ref_n=6)

    indir, ck, outdir = (
        str(tmp_path / d) for d in ("in_cu2", "ck_cu2", "out_cu2")
    )
    mixed = spark.createDataFrame(
        [("a", 10, 9.9), ("ghost", 0, 1.0), ("ghost", 1, 2.0)],
        "series string, t int, x double",
    )
    mixed.write.mode("append").parquet(indir)
    st = spark.readStream.schema("series string, t int, x double").parquet(indir)
    q = (
        stream_cusum(st, prof, "series", "t", "x")
        .writeStream.format("parquet")
        .option("path", outdir)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r["series"], r["t"]): r.asDict() for r in spark.read.parquet(outdir).collect()}
    assert len(got) == 3
    assert got[("ghost", 0)]["z"] is None
    assert got[("ghost", 0)]["alarm"] is False
    assert got[("a", 10)]["z"] is not None


def test_stream_sprt_matches_batch_and_freezes_after_decision(spark, tmp_path):
    """stream_sprt ≡ sprt_monitor: the live monitor's first non-null
    decision row reproduces the batch summary's (decision, n_decision,
    llr_at_decision), the statistic FREEZES after deciding, and state
    survives an availableNow restart mid-stream."""
    import math

    from sparkfeat.arena import sprt_monitor
    from sparkfeat.streaming import stream_sprt

    up = math.log(0.6 / 0.5)
    need = math.ceil(math.log(0.95 / 0.05) / up)
    rows = [("m1", "m2", t, True) for t in range(need + 6)]  # decides
    rows += [("m1", "m3", t, t % 2 == 0) for t in range(30)]  # never
    df = spark.createDataFrame(rows, "a string, b string, t int, a_won boolean")
    batch = {
        (r["a"], r["b"]): r.asDict() for r in sprt_monitor(df).collect()
    }

    indir, ck, outdir = (
        str(tmp_path / d) for d in ("in_sprt", "ck_sprt", "out_sprt")
    )

    def run_once(part):
        part.write.mode("append").parquet(indir)
        st = spark.readStream.schema(
            "a string, b string, t int, a_won boolean"
        ).parquet(indir)
        q = (
            stream_sprt(st)
            .writeStream.format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # split mid-decision: the crossing happens in invocation 2
    run_once(df.where(F.col("t") < 5))
    run_once(df.where(F.col("t") >= 5))

    got = spark.read.parquet(outdir).collect()
    by_pair: dict = {}
    for r in sorted(got, key=lambda r: (r["a"], r["b"], r["t"])):
        by_pair.setdefault((r["a"], r["b"]), []).append(r)

    d12 = by_pair[("m1", "m2")]
    first_dec = next(r for r in d12 if r["decision"] is not None)
    assert first_dec["decision"] == batch[("m1", "m2")]["decision"]
    assert first_dec["n"] == batch[("m1", "m2")]["n_decision"]
    assert first_dec["llr"] == pytest.approx(
        batch[("m1", "m2")]["llr_at_decision"], abs=1e-9
    )
    # frozen: every row after the decision carries the same llr
    tail = [r for r in d12 if r["n"] >= first_dec["n"]]
    assert all(r["llr"] == first_dec["llr"] for r in tail)
    assert all(r["decision"] == first_dec["decision"] for r in tail)
    # the undecided pair never decides and its llr keeps moving
    d13 = by_pair[("m1", "m3")]
    assert all(r["decision"] is None for r in d13)
    assert batch[("m1", "m3")]["decision"] == "continue"
    assert d13[-1]["llr"] == pytest.approx(
        batch[("m1", "m3")]["llr_final"], abs=1e-9
    )
