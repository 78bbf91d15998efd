"""Keyword search over a document corpus: exact BM25 scoring + top-k
retrieval as ONE declarative Spark plan.

This is the batch-retrieval primitive an LLM-data pipeline needs for
targeted corpus mining ("pull the top-k docs for each of these probe
queries") and for building weak-supervision / curriculum subsets —
complementing the embedding-space ANN operators in
:mod:`sparkfeat.similarity` with the lexical half of hybrid retrieval.
No reference counterpart (`/root/reference` has no text operators); the
scoring is the public Robertson/Spärck Jones BM25 formulation.

Scale design (the 100 TB lens):

* **The corpus token lattice is never shuffled.** Query terms are tiny
  (a handful of probe queries × a few terms) and are BROADCAST; the
  exploded corpus tokens are filtered map-side against them, so the
  only rows that ever enter a shuffle are query-term hits. Document
  frequency of the probe terms, term frequency per (term, doc), and
  doc length are all computed from those hits plus a map-only length
  projection — the full-corpus groupBy(term) a naive inverted-index
  build would do (and its hot-stopword skew) never happens.
* **Corpus-level constants (N, avgdl) ride a one-row broadcast
  cross-join**, not a driver collect: the plan stays lazy and whole.
* **Top-k is two-phase.** A per-(query, shard) row_number prunes each
  hash shard to its local top-k (window state = k rows per shard, fully
  parallel), then the global per-query window ranks only
  ``shards × k`` survivors — so no single reducer ever sees the full
  candidate list of a hot query. Per-shard top-k is a superset of the
  global top-k, so the two-phase result is exact, and both phases
  order by ``(score DESC, doc_id)`` which makes the ranking
  deterministic across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["bm25_topk", "rrf_fuse"]


def _toks(col) -> "F.Column":
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), r"\s+"), lambda x: x != "")


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.5,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    shards: int = 32,
) -> DataFrame:
    """Exact BM25 top-``k`` docs per probe query.

    ``queries`` is a small DataFrame ``(query_id: long, query: string)``
    — whitespace-tokenized, lowercased, deduplicated per query. Returns
    ``(query_id, doc_id, score, rank)`` with ``rank`` 1..k per query,
    ordered by ``(score DESC, doc_id)``; ``score`` is rounded to 6
    decimals BEFORE ranking so the ordering is reproducible across
    engines (the DuckDB oracle replays the identical formula).

    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5));
    w(t, d) = idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).
    """
    qterms = queries.select(
        "query_id",
        F.explode(F.array_distinct(_toks("query"))).alias("term"),
    )
    # hash-repartition by doc id before tokenization: partition keys are
    # a subset of both the (term, id, dl) tf grouping and the
    # (query_id, id) score grouping, so the exploded token-hit stream
    # and the per-(query, doc) weight stream never cross an exchange --
    # only raw doc rows do -- and tokenization runs at full width even
    # off a single-split file.
    docs = docs.repartition(
        docs.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
    )
    d = docs.select(F.col(id_col), _toks(text_col).alias("_tk")).select(
        id_col, "_tk", F.size("_tk").alias("_dl")
    )
    # corpus constants: one-row broadcast, in-plan (no driver collect)
    stats = d.agg(
        F.count(F.lit(1)).alias("_n"), F.avg("_dl").alias("_avgdl")
    )
    terms = qterms.select("term").distinct()
    # map-side prune: only probe-term occurrences survive the explode
    hits = (
        d.select(id_col, "_dl", F.explode("_tk").alias("term"))
        .join(F.broadcast(terms), "term")
    )
    tf = hits.groupBy("term", id_col, "_dl").agg(
        F.count(F.lit(1)).alias("_tf")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))

    idf = F.log(
        1.0 + (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
    )
    w_td = idf * (
        F.col("_tf")
        * (k1 + 1.0)
        / (
            F.col("_tf")
            + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl"))
        )
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
        .select("query_id", id_col, w_td.alias("_w"))
        .groupBy("query_id", id_col)
        .agg((F.round(F.sum("_w"), 6) + F.lit(0.0)).alias("score"))
    )
    order = [F.col("score").desc(), F.col(id_col).asc()]
    local = Window.partitionBy(
        "query_id", F.pmod(F.hash(id_col), F.lit(shards))
    ).orderBy(*order)
    pruned = scored.withColumn("_lr", F.row_number().over(local)).filter(
        F.col("_lr") <= k
    )
    final = Window.partitionBy("query_id").orderBy(*order)
    return (
        pruned.withColumn("rank", F.row_number().over(final))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            id_col,
            "score",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def rrf_fuse(
    arms: list[DataFrame],
    k: int = 10,
    c: int = 60,
    probe_col: str = "probe_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of N retrieval arms
    — the standard hybrid-search combiner (lexical BM25 + embedding ANN
    being the classic pair). Each arm contributes ``1/(c + rank)`` per
    (probe, doc); fused score is the sum over the arms that retrieved
    the doc, rounded to 6dp BEFORE the final ranking (doc_id
    tie-break) for engine-stable ordering. Self-hits (doc == probe) are
    dropped.

    Scale shape: each arm is already top-K per probe, so the union is
    ≤ arms·K rows per probe — the fusion groupBy and final per-probe
    window run on a candidate set that is TINY by construction
    regardless of corpus size; all the heavy lifting stays inside the
    arms (which prune/shard as documented on their own operators)."""
    tagged = [
        a.select(
            F.col(probe_col).alias("_p"),
            F.col(doc_col).alias("_d"),
            (1.0 / (F.lit(c) + F.col(rank_col))).alias("_s"),
        )
        for a in arms
    ]
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionByName(t)
    fused = (
        u.filter(F.col("_d") != F.col("_p"))
        .groupBy("_p", "_d")
        .agg(
            (F.round(F.sum("_s"), 6) + F.lit(0.0)).alias("rrf_score"),
            F.count(F.lit(1)).cast("bigint").alias("n_arms"),
        )
    )
    w = Window.partitionBy("_p").orderBy(
        F.col("rrf_score").desc(), F.col("_d").asc()
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("fused_rank") <= k)
        .select(
            F.col("_p").alias(probe_col),
            F.col("_d").alias(doc_col),
            "rrf_score",
            "n_arms",
            "fused_rank",
        )
    )


def retrieval_eval(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Offline retrieval-quality evaluation — MRR, recall@k and graded
    NDCG@k per query plus macro averages: the acceptance check for the
    retrieval family (:func:`bm25_topk`, the hybrid RRF fusion, the ANN
    servers) the same way ECE/AUC gate the quality probe. ``results``
    is a ranked run ``(query_id, doc_id, rank)`` (rank 1-based, the
    bm25_topk output shape); ``qrels`` is the graded relevance set
    ``(query_id, doc_id, rel > 0)``.

    Per query: reciprocal rank of the first relevant hit (0 when none
    retrieved), recall@k = hits@k / |rel set|, and
    NDCG@k = DCG@k / IDCG@k with the standard graded gain
    (2^rel − 1)/log2(rank + 1); IDCG ranks the qrel set by
    (rel DESC, doc_id) — the deterministic ideal ordering. NDCG is
    NULL for queries with an empty qrel set (undefined, excluded from
    the macro mean); a query with relevant docs but no retrieved hits
    scores honest zeros. Every DCG/IDCG term is rounded to 9 dp before
    its fold and every metric to 6 dp (order-stable sums, identical
    doubles in any engine — log2/pow on small integers are exact).

    Scale shape: one rank-filtered equi-join of the run against qrels,
    two map-side-combinable groupBy(query) folds, one k-bounded window
    over the QRELS table (partitioned by query — never a global sort),
    and the macro means ride a one-row broadcast crossJoin. Handles
    10⁶ queries × deep runs without any per-query driver work.

    Output per query: ``(query_id, n_rel, n_ret, first_rel_rank, mrr,
    hits_k, recall_k, dcg_k, idcg_k, ndcg_k)`` + riding macro
    constants ``(mean_mrr, mean_recall, mean_ndcg, n_queries)``."""
    from pyspark.sql import Window

    r6 = lambda c: F.round(c, 6)  # noqa: E731
    r9 = lambda c: F.round(c, 9)  # noqa: E731
    res = results.select(
        F.col(query_col).alias("_q"),
        F.col(doc_col).alias("_d"),
        F.col(rank_col).cast("bigint").alias("_rk"),
    ).filter(F.col("_rk") <= k)
    rel = qrels.select(
        F.col(query_col).alias("_q"),
        F.col(doc_col).alias("_d"),
        F.col(rel_col).cast("bigint").alias("_rel"),
    ).filter(F.col("_rel") > 0)
    gain = lambda g, pos: r9(  # noqa: E731
        (F.pow(F.lit(2.0), g.cast("double")) - 1.0)
        / F.log2(pos.cast("double") + 1.0)
    )
    j = res.join(rel, ["_q", "_d"], "left")
    got = j.groupBy("_q").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ret"),
        F.min(F.when(F.col("_rel") > 0, F.col("_rk"))).alias(
            "first_rel_rank"
        ),
        F.sum(
            F.when(F.col("_rel") > 0, F.lit(1)).otherwise(F.lit(0))
        ).cast("bigint").alias("hits_k"),
        r9(
            F.sum(
                F.when(
                    F.col("_rel") > 0, gain(F.col("_rel"), F.col("_rk"))
                ).otherwise(F.lit(0.0))
            )
        ).alias("dcg_k"),
    )
    # one pass over qrels yields BOTH the ideal-DCG fold (first k rows of
    # the deterministic ideal ordering) and the relevant-set size: the
    # old separate nrel aggregate re-inlined the whole qrels subtree for
    # one count and cost a second exchange + a third full join
    wq = Window.partitionBy("_q").orderBy(F.col("_rel").desc(), "_d")
    relagg = (
        rel.withColumn("_idx", F.row_number().over(wq))
        .groupBy("_q")
        .agg(
            r9(
                F.sum(
                    F.when(
                        F.col("_idx") <= k,
                        gain(F.col("_rel"), F.col("_idx")),
                    ).otherwise(F.lit(0.0))
                )
            ).alias("idcg_k"),
            F.count(F.lit(1)).cast("bigint").alias("n_rel"),
        )
    )
    per = (
        got.join(relagg, "_q", "full")
        .select(
            F.col("_q"),
            F.coalesce("n_rel", F.lit(0)).alias("n_rel"),
            F.coalesce("n_ret", F.lit(0)).alias("n_ret"),
            "first_rel_rank",
            r6(
                F.coalesce(
                    1.0 / F.col("first_rel_rank").cast("double"),
                    F.lit(0.0),
                )
            ).alias("mrr"),
            F.coalesce("hits_k", F.lit(0)).alias("hits_k"),
            F.when(
                F.coalesce("n_rel", F.lit(0)) > 0,
                r6(
                    F.coalesce("hits_k", F.lit(0)).cast("double")
                    / F.col("n_rel").cast("double")
                ),
            ).alias("recall_k"),
            F.coalesce("dcg_k", F.lit(0.0)).alias("dcg_k"),
            "idcg_k",
            F.when(
                F.col("idcg_k") > 0,
                r6(F.coalesce("dcg_k", F.lit(0.0)) / F.col("idcg_k")),
            ).alias("ndcg_k"),
        )
    )
    macro = per.agg(
        r6(F.avg("mrr")).alias("mean_mrr"),
        r6(F.avg("recall_k")).alias("mean_recall"),
        r6(F.avg("ndcg_k")).alias("mean_ndcg"),
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
    )
    return per.crossJoin(F.broadcast(macro)).withColumnRenamed(
        "_q", query_col
    )


def rm3_expand_topk(
    docs: DataFrame,
    queries: DataFrame,
    fb_docs: int = 5,
    fb_terms: int = 8,
    orig_weight: float = 0.5,
    k: int = 10,
    k1: float = 1.5,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    shards: int = 32,
) -> DataFrame:
    """RM3 pseudo-relevance feedback (Lavrenko & Croft 2001; Abdul-Jaleel
    et al. 2004) — the query-EXPANSION member of the retrieval family:
    run BM25 once, treat the top ``fb_docs`` as pseudo-relevant, build
    the relevance model ``P(t|R) = Σ_d w_d·tf(t,d)/dl_d`` (w_d = the
    doc's normalized first-pass score), keep the ``fb_terms`` heaviest
    terms, interpolate with the original query (``orig_weight``), and
    re-score. Fixes pure BM25's vocabulary-mismatch failure: documents
    using the ANSWER's words but not the QUERY's words become findable.

    Determinism contract (engine-stable, DuckDB-replayable): every
    intermediate weight — doc weight, relevance-model mass, normalized
    expansion weight, combined term weight, final score — is rounded
    to 6 dp BEFORE any ranking or reuse, and every rank breaks ties on
    the id/term ascending (the bm25_topk convention).

    Output: ``(query_id, doc_id, score, rank)`` of the EXPANDED
    ranking, rank 1..k. A query whose first pass matches nothing has
    no relevance model and simply keeps its original terms (scaled by
    ``orig_weight`` — ranking-invariant scaling).

    Scale shape: two probe-pruned corpus passes (each the bm25_topk
    shape — broadcast terms prune the token lattice map-side, exact
    two-phase top-k, no full inverted-index shuffle) plus feedback-set
    work bounded by queries × fb_docs documents. The relevance-model
    tf runs only over the fb docs (broadcast-joined BEFORE the corpus
    is tokenized), so expansion cost is independent of corpus size.

    Plan shape (r6): every intermediate is referenced ONCE. The
    normalizing sums (_ssum, _tsum, _qn) ride unbounded windows over
    their tiny per-query partitions instead of aggregate+self-join, and
    the second pass joins the token lattice straight to the broadcast
    ``combined`` term-weight table (grouping tf by query as well) rather
    than pruning on a separately-derived distinct-term set and
    re-joining. The original aggregate+rejoin form inlined the whole
    first-pass DAG at every reference — 784 Exchanges / a 12k-line
    physical plan at fan-out 16 — which cost seconds of Catalyst
    planning and hundreds of runtime stages for identical arithmetic
    (same addend sets, same 6-dp rounding points).
    """
    alpha = float(orig_weight)
    fb = bm25_topk(
        docs,
        queries,
        k=fb_docs,
        k1=k1,
        b=b,
        text_col=text_col,
        id_col=id_col,
        shards=shards,
    ).select("query_id", id_col, "score")
    w_q = Window.partitionBy("query_id")
    fbw = (
        fb.withColumn("_ssum", F.sum("score").over(w_q))
        .where(F.col("_ssum") > 0)
        .select(
            "query_id",
            id_col,
            (F.round(F.col("score") / F.col("_ssum"), 6) + F.lit(0.0)).alias(
                "_wd"
            ),
        )
    )
    # term frequencies over the FEEDBACK docs only: the tiny (query,
    # doc, weight) table is broadcast onto the raw corpus BEFORE any
    # tokenization, so only queries×fb_docs documents are ever split
    fbtf = (
        docs.join(F.broadcast(fbw), id_col)
        .select("query_id", id_col, "_wd", _toks(text_col).alias("_tk"))
        .select(
            "query_id",
            id_col,
            "_wd",
            F.size("_tk").alias("_dl"),
            F.explode("_tk").alias("term"),
        )
        .groupBy("query_id", id_col, "_wd", "_dl", "term")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    p_rm = fbtf.groupBy("query_id", "term").agg(
        (
            F.round(F.sum(F.col("_wd") * F.col("_tf") / F.col("_dl")), 6)
            + F.lit(0.0)
        ).alias("_prm")
    )
    w_top = Window.partitionBy("query_id").orderBy(
        F.col("_prm").desc(), F.col("term").asc()
    )
    exp_w = (
        p_rm.withColumn("_r", F.row_number().over(w_top))
        .filter(F.col("_r") <= fb_terms)
        .withColumn("_tsum", F.sum("_prm").over(w_q))
        .where(F.col("_tsum") > 0)
        .select(
            "query_id",
            "term",
            (
                F.round(
                    (1.0 - alpha) * (F.col("_prm") / F.col("_tsum")), 6
                )
                + F.lit(0.0)
            ).alias("_we"),
        )
    )
    qterms = queries.select(
        "query_id", F.explode(F.array_distinct(_toks("query"))).alias("term")
    )
    orig_w = qterms.withColumn("_qn", F.count(F.lit(1)).over(w_q)).select(
        "query_id",
        "term",
        (F.lit(alpha) / F.col("_qn")).alias("_wo"),
    )
    # orig ∪ expansion folded by sum — same value as the old full-outer
    # join's coalesce(_wo,0)+coalesce(_we,0) (≤2 addends, double addition
    # is exactly commutative), one exchange instead of a sort-merge join
    combined = (
        orig_w.select("query_id", "term", F.col("_wo").alias("_v"))
        .unionByName(exp_w.select("query_id", "term", F.col("_we").alias("_v")))
        .groupBy("query_id", "term")
        .agg((F.round(F.sum("_v"), 6) + F.lit(0.0)).alias("_w"))
    )
    # weighted second pass: the broadcast term-weight table itself prunes
    # the token lattice map-side (it IS the distinct-term set, with the
    # weights riding along), so `combined` appears once in the plan; the
    # id-repartition serves the tf and score aggregates exchange-free
    # exactly as in bm25_topk
    docs = docs.repartition(
        docs.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
    )
    d = docs.select(F.col(id_col), _toks(text_col).alias("_tk")).select(
        id_col, "_tk", F.size("_tk").alias("_dl")
    )
    stats = d.agg(F.count(F.lit(1)).alias("_n"), F.avg("_dl").alias("_avgdl"))
    hits = d.select(id_col, "_dl", F.explode("_tk").alias("term")).join(
        F.broadcast(combined), "term"
    )
    tf = hits.groupBy("query_id", "_w", "term", id_col, "_dl").agg(
        F.count(F.lit(1)).alias("_tf")
    )
    dfreq = tf.groupBy("term").agg(
        F.count_distinct(F.col(id_col)).alias("_df")
    )
    w_td = F.log(
        1.0 + (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
    ) * (
        F.col("_tf")
        * (k1 + 1.0)
        / (F.col("_tf") + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl")))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select("query_id", id_col, (F.col("_w") * w_td).alias("_s"))
        .groupBy("query_id", id_col)
        .agg((F.round(F.sum("_s"), 6) + F.lit(0.0)).alias("score"))
    )
    order = [F.col("score").desc(), F.col(id_col).asc()]
    local = Window.partitionBy(
        "query_id", F.pmod(F.hash(id_col), F.lit(shards))
    ).orderBy(*order)
    pruned = scored.withColumn("_lr", F.row_number().over(local)).filter(
        F.col("_lr") <= k
    )
    final = Window.partitionBy("query_id").orderBy(*order)
    return (
        pruned.withColumn("rank", F.row_number().over(final))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            id_col,
            "score",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )
