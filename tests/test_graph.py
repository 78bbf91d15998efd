"""sparkfeat.graph — in-plan PageRank."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkfeat.graph import pagerank


def _py_pagerank(out, weights=None, iters=3, d=0.85):
    """Reference power method with dangling redistribution; `out` maps
    node -> list of (dst, w)."""
    nodes = set(out) | {v for vs in out.values() for v, _ in vs}
    n = len(nodes)
    ranks = {u: round(1.0 / n, 9) for u in nodes}
    for _ in range(iters):
        dang = round(sum(ranks[u] for u in nodes if not out.get(u)), 9)
        incoming = {u: 0.0 for u in nodes}
        for u, vs in out.items():
            wout = round(sum(w for _, w in vs), 9)
            for v, w in vs:
                incoming[v] += round(ranks[u] * w / wout, 9)
        ranks = {
            u: round(
                (1.0 - d) / n + d * (round(incoming[u], 9) + dang / n), 9
            )
            for u in nodes
        }
    return {u: round(r, 6) for u, r in ranks.items()}


def _edges(spark, rows, weighted=False):
    schema = "src string, dst string" + (", w double" if weighted else "")
    return spark.createDataFrame(rows, schema)


def test_pagerank_matches_power_method_deep(spark):
    e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")])
    got = {
        r.node: r.rank for r in pagerank(e, iters=20, checkpoint=True).collect()
    }
    out = {"a": [("b", 1.0), ("c", 1.0)], "b": [("c", 1.0)], "c": [("a", 1.0)]}
    assert got == _py_pagerank(out, iters=20)


def test_pagerank_lazy_equals_checkpointed(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("c", "b")])
    lazy = {r.node: r.rank for r in pagerank(e, iters=3).collect()}
    ckpt = {
        r.node: r.rank for r in pagerank(e, iters=3, checkpoint=True).collect()
    }
    assert lazy == ckpt


def test_pagerank_dangling_and_conservation(spark):
    # b is dangling (receives, never emits): its rank must flow back
    # uniformly, and total rank must stay 1
    e = _edges(spark, [("a", "b"), ("c", "b"), ("c", "a")])
    rows = pagerank(e, iters=10, checkpoint=True).collect()
    assert rows[0].rank_sum == 1.0
    got = {r.node: r.rank for r in rows}
    out = {"a": [("b", 1.0)], "c": [("b", 1.0), ("a", 1.0)]}
    assert got == _py_pagerank(out, iters=10)
    # the sink accumulates the most rank
    assert got["b"] == max(got.values())


def test_pagerank_weighted_multi_edges(spark):
    # a splits 3:1 between b and c via weights; a duplicate edge row
    # adds weight rather than creating a parallel channel
    e = _edges(
        spark,
        [("a", "b", 2.0), ("a", "b", 1.0), ("a", "c", 1.0), ("b", "a", 1.0),
         ("c", "a", 1.0)],
        weighted=True,
    )
    got = {
        r.node: r.rank
        for r in pagerank(e, iters=8, weight="w", checkpoint=True).collect()
    }
    out = {
        "a": [("b", 3.0), ("c", 1.0)],
        "b": [("a", 1.0)],
        "c": [("a", 1.0)],
    }
    assert got == _py_pagerank(out, iters=8)
    assert got["b"] > got["c"]


def test_pagerank_checkpoint_cuts_plan_depth(spark):
    """The documented lineage strategy: with checkpoint=True the plan
    string must NOT grow with the round count (the lazy tree grows ~3×
    per round and becomes un-analyzable past a handful)."""
    e = _edges(spark, [("a", "b"), ("b", "a")])
    p3 = pagerank(e, iters=3, checkpoint=True)._jdf.queryExecution()
    p6 = pagerank(e, iters=6, checkpoint=True)._jdf.queryExecution()
    assert len(p6.logical().toString()) <= len(p3.logical().toString()) * 2


# ---------------------------------------------------------------------------
# hits — hubs and authorities
# ---------------------------------------------------------------------------


def _py_hits(out, nodes, iters=3):
    """Replica with the operator's exact 9-dp canonicalization."""
    r9 = lambda v: round(v, 9)  # noqa: E731
    hub = {u: r9(1.0 / len(nodes)) for u in nodes}
    auth = {}
    for _ in range(iters):
        raw = {u: 0.0 for u in nodes}
        for u, vs in out.items():
            for v, w in vs:
                raw[v] += r9(hub[u] * w)
        raw = {u: r9(v) for u, v in raw.items()}
        tot = sum(raw.values())
        auth = {u: r9(v / tot) for u, v in raw.items()}
        raw2 = {u: 0.0 for u in nodes}
        for u, vs in out.items():
            for v, w in vs:
                raw2[u] += r9(auth[v] * w)
        raw2 = {u: r9(v) for u, v in raw2.items()}
        tot2 = sum(raw2.values())
        hub = {u: r9(v / tot2) for u, v in raw2.items()}
    return {
        u: (round(hub[u], 6), round(auth[u], 6)) for u in nodes
    }


def test_hits_matches_replica_and_separates_roles(spark):
    from sparkfeat.graph import hits

    e = _edges(
        spark, [("a", "x"), ("a", "y"), ("b", "x"), ("c", "y"), ("x", "a")]
    )
    rows = hits(e, iters=5, checkpoint=True).collect()
    got = {r.node: (r.hub, r.auth) for r in rows}
    out = {
        "a": [("x", 1.0), ("y", 1.0)],
        "b": [("x", 1.0)],
        "c": [("y", 1.0)],
        "x": [("a", 1.0)],
    }
    assert got == _py_hits(out, {"a", "b", "c", "x", "y"}, iters=5)
    # the two-outlink node is the best hub; pure receivers best auths
    assert got["a"][0] == max(h for h, _ in got.values())
    assert got["y"][1] == max(a for _, a in got.values())
    # y emits nothing -> hub exactly 0; b/c receive nothing -> auth 0
    assert got["y"][0] == 0.0 and got["b"][1] == 0.0
    assert rows[0].hub_sum == 1.0 and rows[0].auth_sum == 1.0


def test_hits_lazy_equals_checkpointed_and_weighted(spark):
    from sparkfeat.graph import hits

    e = _edges(
        spark,
        [("a", "x", 3.0), ("b", "x", 1.0), ("a", "y", 1.0), ("y", "b", 1.0)],
        weighted=True,
    )
    lazy = {
        r.node: (r.hub, r.auth)
        for r in hits(e, iters=2, weight="w").collect()
    }
    ckpt = {
        r.node: (r.hub, r.auth)
        for r in hits(e, iters=2, weight="w", checkpoint=True).collect()
    }
    assert lazy == ckpt
    out = {
        "a": [("x", 3.0), ("y", 1.0)],
        "b": [("x", 1.0)],
        "y": [("b", 1.0)],
    }
    assert lazy == _py_hits(out, {"a", "b", "x", "y"}, iters=2)


# ---------------------------------------------------------------------------
# pagerank(seeds=...) — TrustRank / personalized teleport
# ---------------------------------------------------------------------------


def _py_trustrank(out, nodes, seeds, iters=3, d=0.85):
    """Replica of the seeded branch (teleport + dangling by the
    normalized seed vector, multiplication arithmetic)."""
    r9 = lambda v: round(v, 9)  # noqa: E731
    t = {u: r9((1.0 if u in seeds else 0.0) / len(seeds)) for u in nodes}
    ranks = dict(t)
    for _ in range(iters):
        dang = r9(sum(ranks[u] for u in nodes if not out.get(u)))
        inc = {u: 0.0 for u in nodes}
        for u, vs in out.items():
            wout = r9(sum(w for _, w in vs))
            for v, w in vs:
                inc[v] += r9(ranks[u] * w / wout)
        ranks = {
            u: r9((1.0 - d) * t[u] + d * (r9(inc[u]) + dang * t[u]))
            for u in nodes
        }
    return {u: round(r, 6) for u, r in ranks.items()}


def test_trustrank_matches_replica_and_demotes_unseeded(spark):
    # spam ring (s1<->s2) cites itself; trusted "a" cites "x"
    e = _edges(
        spark,
        [("a", "x"), ("x", "a"), ("s1", "s2"), ("s2", "s1"), ("s2", "x")],
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {
        r.node: r.rank
        for r in pagerank(e, iters=6, seeds=seeds, checkpoint=True).collect()
    }
    out = {
        "a": [("x", 1.0)],
        "x": [("a", 1.0)],
        "s1": [("s2", 1.0)],
        "s2": [("s1", 1.0), ("x", 1.0)],
    }
    assert got == _py_trustrank(out, set("ax") | {"s1", "s2"}, {"a"}, iters=6)
    # the self-citing ring has NO teleport floor: it decays below every
    # trusted-path node despite having as many internal links
    assert max(got["s1"], got["s2"]) < min(got["a"], got["x"])
    assert abs(sum(got.values()) - 1.0) < 1e-5


def test_trustrank_uniform_seed_set_approaches_pagerank(spark):
    # seeding EVERY node ~ uniform teleport: same fixpoint direction as
    # classic pagerank (arithmetic differs in rounding path, so compare
    # loosely, not bit-for-bit)
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    seeds = spark.createDataFrame([("a",), ("b",), ("c",)], "node string")
    classic = {r.node: r.rank for r in pagerank(e, iters=5).collect()}
    seeded = {
        r.node: r.rank for r in pagerank(e, iters=5, seeds=seeds).collect()
    }
    for u in classic:
        assert abs(classic[u] - seeded[u]) < 1e-4


def test_trustrank_weighted_seeds_and_missing_seed_ignored(spark):
    e = _edges(spark, [("a", "x"), ("b", "x")])
    # "ghost" is not a graph node -> must not soak up teleport mass
    seeds = spark.createDataFrame(
        [("a", 3.0), ("b", 1.0), ("ghost", 100.0)], "node string, w double"
    )
    got = {
        r.node: r.rank
        for r in pagerank(
            e, iters=4, seeds=seeds, seed_weight="w", checkpoint=True
        ).collect()
    }
    assert abs(sum(got.values()) - 1.0) < 1e-5
    assert got["a"] > got["b"]  # 3:1 teleport split survives the solve
