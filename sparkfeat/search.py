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
