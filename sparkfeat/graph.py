"""Link analysis over corpus citation graphs: in-plan PageRank.

Crawl curation ranks domains before it ranks documents — harvest
ordering, link-spam demotion, and per-domain quality priors (the
Common-Crawl-style pipeline) all consume a centrality score over the
"who cites whom" graph that :func:`sparkfeat.text.extract_domains`
already produces. PageRank (Page et al. 1999) is the standard one, and
a fixed-iteration power method is plain DataFrame algebra: each Lloyd-
style round is one join (spread rank along out-edges), one map-side-
combinable ``groupBy(dst)`` (gather), and two one-row broadcast
aggregates (node count, dangling mass) — so the whole k-round solve is
a single lazy plan per round, no driver-side math, no RDDs, no GraphX.

Engine determinism (the repo convention): every per-edge contribution
and every per-round rank is rounded to 9 decimals BEFORE it is summed
— canonicalized addends make the double folds order-stable across
engines and shuffle orders — so a DuckDB oracle that unrolls the same
k rounds reproduces every rank bit-for-bit. 9 dp (not the output's 6)
keeps ~3 guard digits through the iteration so the final 6-dp compare
is exact, while still canonicalizing well above double ulp.

Scale shape at 10⁹ nodes / 10¹¹ edges: the edge table shuffles ONCE per
round on its join key (pre-partition or bucket it by ``src`` and every
round reuses the layout); ranks and out-strengths are node-sized;
node count and dangling mass are one-row broadcasts. Lineage: each
round references the previous rank table THREE times (dangling mass,
contribution spread, gather join), so the fully-lazy plan tree grows
~3× per round — fine to ``iters`` ≈ 3-4, Catalyst-analysis-prohibitive
beyond. Pass ``checkpoint=True`` for more rounds: a ``localCheckpoint``
per round truncates the tree exactly like the k-means refiner
(`similarity.py`'s documented strategy; 20 rounds measured ~14 s on
the toy graph vs un-analyzable lazy). Default off so small solves stay
fully lazy and plan-inspectable.

No reference counterpart (`/root/reference` has no graph operators);
the iteration-as-plan style mirrors `similarity.kmeans_centroids`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "hits"]


def _r9(c: Column) -> Column:
    return F.round(c, 9)


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    checkpoint: bool = False,
    seeds: DataFrame | None = None,
    seed_node: str = "node",
    seed_weight: str | None = None,
) -> DataFrame:
    """Weighted PageRank over ``edges`` by fixed-iteration power method.

    Node set = distinct(src ∪ dst). Per round, with W_out(u) the total
    out-weight of u, D the dangling mass (rank sitting on nodes with
    no out-edges), and t(·) the teleport distribution:

        r'(v) = (1−d)·t(v) + d·( Σ_{u→v} r(u)·w(u,v)/W_out(u) + D·t(v) )

    which preserves Σr = 1 each round (up to the 9-dp canonicalization;
    the output's ``rank_sum`` constant column lets the value hash
    verify conservation). ``weight=None`` means unweighted (w = 1).
    Multi-edges are legal and simply add weight; self-loops are kept
    (they retain rank like any edge).

    ``seeds=None`` is classic PageRank: t uniform = 1/N (computed as
    the exact ``/N`` division, not a stored vector). Passing ``seeds``
    — a ``(seed_node[, seed_weight])`` frame — gives TrustRank /
    personalized PageRank (Gyöngyi et al. 2004): teleport AND dangling
    mass flow only to the trusted seed set (L1-normalized, 9-dp), so
    rank reaches other nodes ONLY through links from trust — the
    link-spam-demotion scheme (a spam cluster citing itself gets no
    teleport floor to amplify; an unseeded node with no trusted path
    decays toward 0). Seed rows for nodes absent from the graph are
    ignored by the join; non-seed nodes get t = 0.

    Returns one row per node: ``(node, rank, n_nodes, rank_sum)`` with
    ``rank`` rounded to 6 dp — ready for the broadcast-join back onto a
    corpus scan as a per-domain quality prior."""
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(
        F.col(src).alias("_s"), F.col(dst).alias("_d"), w.alias("_w")
    )
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionByName(e.select(F.col("_d").alias("node")))
        .distinct()
    )
    outw = e.groupBy(F.col("_s").alias("node")).agg(
        _r9(F.sum("_w")).alias("_wout")
    )
    n = nodes.agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    # node-sized ⋈ node-sized: equi-join, NOT broadcast-hinted — at
    # 10⁹ nodes both sides must hash-partition (AQE still broadcasts
    # small solves on its own)
    base = nodes.join(outw, "node", "left")
    if seeds is not None:
        sw = (
            F.col(seed_weight).cast("double") if seed_weight else F.lit(1.0)
        )
        tele = seeds.select(
            F.col(seed_node).alias("node"), sw.alias("_sw")
        )
        # keep only seeds that are graph nodes BEFORE normalizing, so
        # t sums to exactly 1 over the node set
        in_graph = tele.join(nodes, "node")
        tsum = in_graph.agg(F.sum("_sw").alias("_ts"))
        base = (
            base.join(in_graph, "node", "left")
            .crossJoin(F.broadcast(tsum))
            .withColumn(
                "_t",
                _r9(
                    F.coalesce(F.col("_sw"), F.lit(0.0)) / F.col("_ts")
                ),
            )
            .drop("_sw", "_ts")
        )
    if checkpoint:
        base = base.localCheckpoint(eager=False)
    d = float(damping)
    tcol = F.col("_t") if seeds is not None else None
    keep = ["node", "_wout", *(["_t"] if seeds is not None else []), "_n"]
    r = base.crossJoin(F.broadcast(n)).select(
        *keep,
        (
            tcol if seeds is not None else _r9(F.lit(1.0) / F.col("_n"))
        ).alias("rank"),
    )
    for _ in range(iters):
        dang = r.agg(
            F.coalesce(
                _r9(F.sum(F.when(F.col("_wout").isNull(), F.col("rank")))),
                F.lit(0.0),
            ).alias("_dang")
        )
        contrib = (
            r.where(F.col("_wout").isNotNull())
            .join(e, F.col("node") == F.col("_s"))
            .select(
                F.col("_d").alias("node"),
                _r9(F.col("rank") * F.col("_w") / F.col("_wout")).alias(
                    "_c"
                ),
            )
        )
        gathered = contrib.groupBy("node").agg(_r9(F.sum("_c")).alias("_in"))
        inflow = F.coalesce(F.col("_in"), F.lit(0.0))
        if seeds is not None:
            update = (1.0 - d) * tcol + F.lit(d) * (
                inflow + F.col("_dang") * tcol
            )
        else:
            # keep the EXACT division form (x/n is not bit-equal to
            # x·(1/n)) — the uniform oracle replays this arithmetic
            update = (1.0 - d) / F.col("_n") + F.lit(d) * (
                inflow + F.col("_dang") / F.col("_n")
            )
        r = (
            base.join(gathered, "node", "left")
            .crossJoin(F.broadcast(n))
            .crossJoin(F.broadcast(dang))
            .select(*keep, _r9(update).alias("rank"))
        )
        if checkpoint:
            r = r.localCheckpoint(eager=False)
    total = r.agg(F.round(F.sum("rank"), 6).alias("rank_sum"))
    return (
        r.crossJoin(F.broadcast(total))
        .select(
            "node",
            F.round(F.col("rank"), 6).alias("rank"),
            F.col("_n").alias("n_nodes"),
            "rank_sum",
        )
    )


def hits(
    edges: DataFrame,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    checkpoint: bool = False,
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) over ``edges`` — the
    complementary centrality to :func:`pagerank` on the same citation
    graph: PageRank ranks where rank FLOWS, HITS separates "links to
    good places" (hub — a curated index page, a well-sourced doc) from
    "is linked by good hubs" (authority — the domain worth crawling).
    Mutual recursion, L1-normalized each half-round so scores stay a
    distribution (the deterministic-normalization choice: an L2 norm
    would put a sqrt inside every round; L1 keeps the solve in sums
    and one division, and converges to the same principal eigenvector
    direction):

        auth'(v) = Σ_{u→v} hub(u)·w(u,v)   then  auth' /= Σ auth'
        hub'(u)  = Σ_{u→v} auth'(v)·w(u,v) then  hub'  /= Σ hub'

    Determinism: per-edge products rounded to 9 dp before each
    map-side-combinable gather, per-node scores rounded to 9 dp after
    each normalization (the `pagerank` canonicalization) — an unrolled
    SQL oracle reproduces every round bit-for-bit. Lineage grows ~2×
    per round; ``checkpoint=True`` truncates per round as in
    :func:`pagerank`. Output one row per node: ``(node, hub, auth,
    hub_sum, auth_sum)`` — both 6-dp scores plus the two Σ=1
    conservation constants for the value hash. Nodes with no out-edges
    have hub 0; nodes with no in-edges have auth 0.
    """
    if iters < 1:
        raise ValueError("hits needs at least one round")
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(
        F.col(src).alias("_s"), F.col(dst).alias("_d"), w.alias("_w")
    )
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionByName(e.select(F.col("_d").alias("node")))
        .distinct()
    )
    n = nodes.agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    cur = nodes.crossJoin(F.broadcast(n)).select(
        "node", _r9(F.lit(1.0) / F.col("_n")).alias("hub")
    )
    if checkpoint:
        cur = cur.localCheckpoint(eager=False)

    def _pass(scores: DataFrame, score_col: str, key: str, other: str,
              out_col: str) -> DataFrame:
        # gather score along edges from `key` endpoint onto `other`,
        # then L1-normalize: raw(v) = Σ round(score·w, 9)
        raw = (
            scores.join(e, F.col("node") == F.col(key))
            .select(
                F.col(other).alias("node"),
                _r9(F.col(score_col) * F.col("_w")).alias("_p"),
            )
            .groupBy("node")
            .agg(_r9(F.sum("_p")).alias("_raw"))
        )
        tot = raw.agg(F.sum("_raw").alias("_tot"))
        return (
            nodes.join(raw, "node", "left")
            .crossJoin(F.broadcast(tot))
            .select(
                "node",
                _r9(
                    F.coalesce(F.col("_raw"), F.lit(0.0)) / F.col("_tot")
                ).alias(out_col),
            )
        )

    for _ in range(iters):
        auth = _pass(cur, "hub", "_s", "_d", "auth")
        if checkpoint:
            auth = auth.localCheckpoint(eager=False)
        cur = _pass(auth, "auth", "_d", "_s", "hub")
        if checkpoint:
            cur = cur.localCheckpoint(eager=False)
    joined = cur.join(auth, "node")
    sums = joined.agg(
        F.round(F.sum("hub"), 6).alias("hub_sum"),
        F.round(F.sum("auth"), 6).alias("auth_sum"),
    )
    return (
        joined.crossJoin(F.broadcast(sums))
        .select(
            "node",
            F.round(F.col("hub"), 6).alias("hub"),
            F.round(F.col("auth"), 6).alias("auth"),
            "hub_sum",
            "auth_sum",
        )
    )
