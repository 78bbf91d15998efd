"""Physical-plan audits: the properties that matter at 100 TB.

Reading ``explain`` output programmatically: number of exchanges
(shuffles), predicate pushdown into the parquet scan, broadcast joins
for small sides. These lock in the scale design — a regression that
adds a shuffle or un-pushes a filter fails here, not in production.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from sparkfeat.normalize import apply_scaler, fit_stats
from sparkfeat.pipeline import flagship_features
from sparkfeat.schema import with_turn_signals


def plan_of(df, extended: bool = False) -> str:
    qe = df._jdf.queryExecution()
    return qe.toString() if extended else qe.executedPlan().toString()


def n_shuffles(df) -> int:
    return len(re.findall(r"Exchange hashpartitioning", plan_of(df)))


def test_flagship_single_shuffle_from_transcripts(transcripts):
    """From a materialized transcript table, the whole flagship plan —
    signals, sessionize, log-return, volatility, stochastic-k, KER —
    runs on ONE hash(conv_id) exchange; every window reuses it."""
    out = flagship_features(transcripts)
    assert n_shuffles(out) == 1, plan_of(out)
    # and exactly one sort feeds all five window stages
    assert plan_of(out).count("Sort [conv_id") <= 2


def test_windows_reuse_partitioning(transcripts):
    """Stacked per-conv windowed transforms add zero extra exchanges."""
    from sparkfeat import transforms as T
    from sparkfeat.windows import repartition_sorted

    sig = with_turn_signals(repartition_sorted(transcripts))
    one = sig.withColumn("lr", T.log_return("text_len"))
    many = (
        one.withColumn("vol", T.volatility("text_len", 10))
        .withColumn("k", T.stochastic_k("text_len", 14))
        .withColumn("ker", T.ker("text_len", 5))
    )
    assert n_shuffles(one) == n_shuffles(many) == 1


def test_filter_pushdown_to_scan(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        (F.col("ts") >= "2024-01-08") & (F.col("event_type") == "error")
    ).select("user_id", "ts")
    p = plan_of(ev, extended=True)
    assert "PushedFilters" in p and "GreaterThanOrEqual(ts" in p, p
    # column pruning: scan reads only the needed columns
    m = re.search(r"ReadSchema: ([^\n]*)", p)
    assert m and "event_type" in m.group(1) and "props" not in m.group(1)


def test_normalize_apply_is_broadcast_join(transcripts):
    sig = with_turn_signals(transcripts)
    stats = fit_stats(sig, "text_len")
    out = apply_scaler(sig, stats, "text_len", "standard")
    assert "BroadcastHashJoin" in plan_of(out), plan_of(out)


def test_asof_join_single_data_shuffle(spark, transcripts):
    import pandas as pd

    from sparkfeat.asof import asof_join

    probes = spark.createDataFrame(
        pd.DataFrame(
            {"conv_id": ["conv000"], "probe_ts": pd.to_datetime(["2024-03-01 01:00"])}
        )
    )
    sig = with_turn_signals(transcripts)
    out = asof_join(probes, sig, ["text_len"])
    # union-tag idiom: one exchange for the unioned stream, none extra
    assert n_shuffles(out) <= 2, plan_of(out)
    assert "SortMergeJoin" not in plan_of(out)  # no pairwise join at all


def test_session_agg_reuses_session_partitioning(transcripts):
    from sparkfeat.windows import sessionize

    sig = sessionize(with_turn_signals(transcripts))
    agg = sig.groupBy("conv_id", "session_idx").agg(F.count(F.lit(1)).alias("n"))
    # window shuffle on conv_id; groupBy on (conv_id, session_idx) can
    # partially aggregate map-side — at most one more exchange
    assert n_shuffles(agg) <= 2, plan_of(agg)


def test_embedding_pairs_bucketed_no_cartesian(spark, sf_dir):
    """The scale-path embedding near-dup must not contain a corpus-level
    CartesianProduct: candidates come from a shuffle equi-join on the
    IVF bucket id (broadcast nested-loop against the tiny centroid set
    is fine)."""
    from sparkfeat.dedup import embedding_pairs_bucketed

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = embedding_pairs_bucketed(emb, threshold=0.4)
    p = plan_of(out)
    assert "CartesianProduct" not in p, p


def test_embedding_pairs_lsh_no_cartesian(spark, sf_dir):
    """The fit-free LSH near-dup: candidates from a band-key equi-join,
    verify via id equi-joins — no CartesianProduct anywhere."""
    from sparkfeat.dedup import embedding_pairs_lsh

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = embedding_pairs_lsh(emb, threshold=0.9, dim=64)
    p = plan_of(out)
    assert "CartesianProduct" not in p, p


def test_corpus_prep_pipeline_no_cartesian(spark, sf_dir):
    """The end-to-end corpus filter composes four stages and must stay
    free of corpus-level CartesianProduct — every join is an equi-join
    on doc_id, fingerprint, or a band key."""
    from sparkfeat.queries import QUERIES

    out = QUERIES["corpus_prep_pipeline"](spark, sf_dir)
    p = plan_of(out)
    assert "CartesianProduct" not in p, p


def test_interval_filter_is_broadcast_semi_join(spark, transcripts):
    """filter_by_intervals must stream the fact side through a broadcast
    semi join — no exchange of the big table for the filter."""
    import pandas as pd

    from sparkfeat.cleaning import filter_by_intervals

    sig = with_turn_signals(transcripts)
    ivs = spark.createDataFrame(
        pd.DataFrame(
            {
                "open": pd.to_datetime(["2024-03-01 09:00"]),
                "close": pd.to_datetime(["2024-03-01 17:00"]),
            }
        )
    )
    out = filter_by_intervals(sig, ivs)
    p = plan_of(out)
    assert "BroadcastNestedLoopJoin" in p and "LeftSemi" in p, p
    assert n_shuffles(out) == 0, p


def test_jaccard_verify_stage_no_cartesian(spark, sf_dir):
    """Prefix-filter candidate generation + id-join verify: the whole
    plan is equi-joins — no CartesianProduct anywhere."""
    from sparkfeat.dedup import jaccard_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = plan_of(jaccard_pairs(docs, threshold=0.9))
    assert "CartesianProduct" not in p, p


def test_checkpoint_write_partitions_by_bucket(spark, transcripts, tmp_path):
    """The single-job checkpoint write plans one scan of the input (no
    per-bucket re-filter subplans)."""
    from sparkfeat.checkpoint import bucket_of

    df = transcripts.withColumn("_bucket", bucket_of("conv_id", 8))
    # one scan node in the filtered write plan
    p = plan_of(df.filter(F.col("_bucket").isin(list(range(8)))))
    assert p.count("Scan ") <= 1 or p.count("InMemoryTableScan") <= 1


def test_pack_sequences_offsets_broadcast_not_literal(spark, sf_dir):
    """The pack_sequences block-offset mechanism must be a broadcast
    equi-join on _blk, NOT a literal create_map built from a driver
    collect() — a corpus-sized literal bloats the Catalyst expression
    tree at 10^8 docs and OOMs the driver at 10^12."""
    from sparkfeat.corpus import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = pack_sequences(docs, budget=512)
    p = plan_of(out)
    assert "BroadcastHashJoin" in p, p
    logical = plan_of(out, extended=True)
    assert "create_map" not in logical and "map_from_arrays" not in logical, logical


def test_fingerprint_summary_no_window_hot_partition(spark, sf_dir):
    """Duplicate-group sizes must come from groupBy-count + equi-join,
    never Window.partitionBy(fp): a boilerplate doc repeated 10^8 times
    is one un-splittable window partition, while the groupBy combines
    map-side and the join-back is AQE-skew-splittable."""
    from sparkfeat.text import fingerprint_summary

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = fingerprint_summary(docs)
    p = plan_of(out)
    assert "Window" not in p, p
    assert "HashAggregate" in p, p


def test_feature_drift_edges_join_is_broadcast(transcripts):
    """The explicit-edges (quantile-PSI) drift path: the per-feature
    edge table joins onto the melted panel as a BROADCAST hash join —
    n_features rows must never shuffle the 100 TB long stream — and
    the whole monitor stays window-free."""
    from sparkfeat.drift import feature_drift, quantile_edges

    sig = with_turn_signals(transcripts).withColumn(
        "_window", F.when(F.col("turn_idx") < 3, "ref").otherwise("cur")
    )
    feats = ["text_len", "token_est"]
    edges = quantile_edges(sig.where("_window = 'ref'"), feats, bins=5)
    out = feature_drift(sig, feats, edges=edges)
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan, plan
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_shrinkage_one_corpus_shuffle_components_broadcast(spark, sf_dir):
    """shrink_group_means: the corpus contributes exactly ONE
    hash-exchange (the groupBy(source) sufficient-stats aggregate);
    the variance components come back over BROADCAST exchanges, never
    a re-shuffle of data rows — at 100 TB only the k-row group table
    re-flows."""
    from sparkfeat.probe import shrink_group_means
    from sparkfeat.text import stopword_ratio

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("text").isNotNull()
    )
    out = shrink_group_means(docs, stopword_ratio("text"), "source")
    p = plan_of(out)
    assert n_shuffles(out) <= 2, p  # group stats + the k-row global agg
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p, p
    assert "CartesianProduct" not in p, p
    assert "Window" not in p, p


def test_temperature_weights_broadcast_only(spark, sf_dir):
    """temperature_weights: one tiny groupBy; the total and the
    normalizer fold back as one-row BROADCAST cross-joins (never a
    shuffled join), and no window/global sort appears."""
    from sparkfeat.corpus import temperature_weights

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = temperature_weights(docs, alpha=0.3, token_col="n_chars")
    p = plan_of(out)
    assert "BroadcastNestedLoopJoin" in p, p
    assert "CartesianProduct" not in p, p
    assert "Window" not in p, p


def test_calibration_bins_broadcast_no_sort(spark, sf_dir):
    """calibration_table: equal-width binning must come from a
    broadcast (min,max) row — NO global sort / ntile window (the
    quantile-bin trap at corpus scale), no cartesian."""
    from sparkfeat.probe import calibration_table

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .withColumn("score", F.length("text").cast("double"))
        .withColumn("y", (F.col("lang") == "en").cast("double"))
    )
    out = calibration_table(docs, F.col("score"), F.col("y"))
    p = plan_of(out)
    assert "BroadcastNestedLoopJoin" in p, p
    assert "Window" not in p, p
    assert "CartesianProduct" not in p, p
    assert "Sort [" not in p, p  # no global sort anywhere in the plan


def test_bt_strengths_single_corpus_pass_no_cartesian(spark, sf_dir):
    """bt_strengths: the unrolled MM iteration references the match
    matrix once per round per self-reference — a lineage boundary must
    keep the corpus aggregate from re-executing (raw plan: 380
    FileScans at T=5, measured), and the full-outer symmetrization
    must never degrade to a cartesian. Default 'persist' (lazy)
    shows every reuse as an InMemoryTableScan; 'cut' collapses the
    final plan to the last iterate's RDD (no parquet scan at all)."""
    from sparkfeat.arena import bt_strengths
    from sparkfeat.queries import _arena_judgments

    j = _arena_judgments(spark, sf_dir)
    p = plan_of(bt_strengths(j, n_iter=3))
    assert "CartesianProduct" not in p, p
    assert "InMemoryTableScan" in p, p  # lazy persist boundary active
    p2 = plan_of(bt_strengths(j, n_iter=3, lineage="cut"))
    assert "ExistingRDD" in p2 or "Scan ExistingRDD" in p2, p2
    assert "FileScan parquet" not in p2, p2  # lineage fully truncated
    assert "CartesianProduct" not in p2, p2


def test_group_advantages_one_exchange(spark, sf_dir):
    """group_advantages: ONE hash exchange on the prompt group — the
    count/sum/sum-of-squares moments ride a single window pass."""
    from sparkfeat.queries import _event_rewards
    from sparkfeat.reward import group_advantages

    r = _event_rewards(spark, sf_dir)
    for method in ("grpo", "rloo"):
        out = group_advantages(r, method=method)
        assert n_shuffles(out) == 1, plan_of(out)
        assert "CartesianProduct" not in plan_of(out)


def test_best_of_n_one_exchange(spark, sf_dir):
    from sparkfeat.queries import _event_rewards
    from sparkfeat.reward import best_of_n

    out = best_of_n(_event_rewards(spark, sf_dir), k=3)
    assert n_shuffles(out) == 1, plan_of(out)


def test_ks_drift_collapses_before_window(spark):
    """ks_drift's 100 TB contract: the corpus collapses in a map-side-
    combinable (feature, value) aggregate BEFORE the ordered window —
    so the cumulative pass and everything after it run on the
    distinct-value table — the per-feature totals join back as a
    BROADCAST, and nothing is ever a cartesian or sort-merge join."""
    from sparkfeat.drift import ks_drift

    ref = spark.range(1000).select((F.col("id") % 13).cast("double").alias("x"))
    cur = spark.range(800).select((F.col("id") % 11).cast("double").alias("x"))
    p = plan_of(ks_drift(ref, cur, ["x"]))
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p and "SortMergeJoin" not in p, p
    # partial aggregation fires below the first exchange (map-side
    # combine of duplicate values: the corpus never shuffles raw)
    first_exchange = p.index("Exchange hashpartitioning")
    assert "partial_count" in p[first_exchange:] or "HashAggregate" in p[:first_exchange] or "partial" in p, p


def test_rank_auc_groups_before_window_no_corpus_sort(spark):
    """rank_auc's contract: ONE groupBy(score) collapses the corpus to
    the distinct-score table; the unpartitioned cumulative window sorts
    only that bounded table (a SinglePartition exchange of distinct
    scores), never the corpus, and no join of any kind appears."""
    from sparkfeat.probe import rank_auc

    df = spark.range(100000).select(
        (F.col("id") % 97).cast("double").alias("s"),
        (F.col("id") % 2).cast("double").alias("y"),
    )
    p = plan_of(rank_auc(df, F.col("s"), F.col("y")))
    assert "Join" not in p and "CartesianProduct" not in p, p
    # the single-partition exchange feeding the window sits ABOVE the
    # hash aggregate that already collapsed the corpus
    agg = p.index("Exchange hashpartitioning")
    single = p.index("Exchange SinglePartition")
    assert "HashAggregate" in p, p
    assert single < agg or p.count("Exchange") >= 2, p


def test_mi_table_broadcast_no_sort_no_window(spark, sf_dir):
    """mi_table: binning from a broadcast (min,max) row, marginals and
    totals as broadcast joins of ≤2·n_bins-row tables — no window, no
    global sort, no cartesian anywhere; the corpus is scanned twice
    (range + cells) and never shuffled on anything wider than the
    (bin, label) key."""
    from sparkfeat.probe import mi_table

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
    )
    out = mi_table(
        docs,
        F.length("text").cast("double"),
        (F.col("lang") == "en").cast("double"),
    )
    p = plan_of(out)
    assert "BroadcastNestedLoopJoin" in p, p
    assert "Window" not in p, p
    assert "CartesianProduct" not in p, p
    assert "Sort [" not in p, p


def test_unimax_single_corpus_exchange(spark, sf_dir):
    """unimax_allocation: ONE corpus aggregate; every window after it
    runs on the k-row group table (SinglePartition — bounded by group
    cardinality, not corpus rows); no cartesian, broadcast folds."""
    from sparkfeat.corpus import unimax_allocation

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = unimax_allocation(
        docs, budget_frac=0.8, max_epochs=1.0,
        group_col="lang", token_col="n_chars",
    )
    p = plan_of(out)
    assert "CartesianProduct" not in p, p
    # the k-row group table is persisted: all four references to it
    # read the cache — the corpus scan + groupBy(lang) runs ONCE at
    # execution even though the printed tree repeats the cached subplan
    assert "InMemoryTableScan" in p, p
    assert "BroadcastNestedLoopJoin" in p, p  # one-row constant folds


def test_pagerank_no_cartesian_broadcast_scalars(spark):
    """pagerank: scalar folds (node count, dangling mass) broadcast;
    no cartesian product anywhere in a 3-round lazy plan."""
    from sparkfeat.graph import pagerank

    e = spark.range(200).select(
        (F.col("id") % 20).cast("string").alias("src"),
        (F.col("id") % 31).cast("string").alias("dst"),
    )
    p = plan_of(pagerank(e, iters=3))
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" in p, p


def test_topk_rank_is_two_phase_sharded(spark, transcripts):
    """A5/O2 contract (r6): the top-k rank must never funnel the
    one-row-per-entity totals table into a single-partition window.
    Phase one is a pmod(hash)-sharded local row_number (parallel,
    k rows of state per shard); only shards x k survivors reach the
    final global window — so the plan's windows come in (sharded,
    global) pairs, with a Filter between them."""
    import re as _re

    from sparkfeat import cleaning as C
    from sparkfeat.schema import with_turn_signals
    from sparkfeat.universe import active_universe

    sig = with_turn_signals(transcripts)
    for df in (
        C.top_k_entities(sig, "token_est", 2),
        active_universe(sig, 86400, 2, "token_est"),
    ):
        p = plan_of(df)
        # two ranking windows: the sharded local phase (partitioned by
        # the pmod(hash) key, projected as a _w# column) and the
        # bounded global phase above it
        n_windows = len(_re.findall(r"Window \[row_number\(\)", p))
        assert n_windows >= 2, p
        # and Spark 4's rank-limit pushdown proves the local phase
        # prunes map-side BEFORE anything crosses an exchange
        assert "WindowGroupLimit" in p and "Partial" in p, p
