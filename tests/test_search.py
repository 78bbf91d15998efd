"""BM25 search operator: hand-computed scores on a tiny corpus, the
two-phase top-k exactness property, and edge cases."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


DOCS = [
    (0, "spark spark join"),
    (1, "join merge sort"),
    (2, "spark window"),
    (3, "sort sort sort merge"),
    (4, ""),
]


def _bm25_ref(docs, query_terms, k1=1.5, b=0.75):
    """Plain-python BM25 over the token lists (empty docs count toward
    N and avgdl, like the operator)."""
    toks = {i: t.split() for i, t in docs}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for term in query_terms:
        df = sum(1 for v in toks.values() if term in v)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for i, v in toks.items():
            tf = v.count(term)
            if tf == 0:
                continue
            w = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
            out[i] = out.get(i, 0.0) + w
    return {i: round(s, 6) for i, s in out.items()}


@pytest.fixture(scope="module")
def tiny(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_bm25_matches_hand_formula(spark, tiny):
    from sparkfeat.search import bm25_topk

    probes = spark.createDataFrame(
        [(0, "spark join"), (1, "sort")], "query_id long, query string"
    )
    got = {
        (r.query_id, r.doc_id): (r.score, r.rank)
        for r in bm25_topk(tiny, probes, k=10).collect()
    }
    for qid, qtext in [(0, "spark join"), (1, "sort")]:
        ref = _bm25_ref(DOCS, qtext.split())
        ranked = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))
        for rank, (doc, score) in enumerate(ranked, start=1):
            assert got[(qid, doc)] == pytest.approx((score, rank), abs=1e-9)
        # and nothing extra
        assert len([1 for (g, _d) in got if g == qid]) == len(ranked)


def test_bm25_two_phase_topk_is_exact(spark, tiny):
    """Per-shard pruning (any shard count) must reproduce the global
    ranking — per-shard top-k is a superset of the global top-k."""
    from sparkfeat.search import bm25_topk

    probes = spark.createDataFrame([(0, "spark sort merge")], "query_id long, query string")
    base = bm25_topk(tiny, probes, k=3, shards=1).collect()
    for shards in (2, 7, 64):
        alt = bm25_topk(tiny, probes, k=3, shards=shards).collect()
        assert sorted(map(tuple, alt)) == sorted(map(tuple, base))


def test_bm25_duplicate_query_terms_count_once(spark, tiny):
    from sparkfeat.search import bm25_topk

    probes1 = spark.createDataFrame([(0, "spark spark spark")], "query_id long, query string")
    probes2 = spark.createDataFrame([(0, "spark")], "query_id long, query string")
    r1 = sorted(map(tuple, bm25_topk(tiny, probes1, k=5).collect()))
    r2 = sorted(map(tuple, bm25_topk(tiny, probes2, k=5).collect()))
    assert r1 == r2


def test_bm25_unmatched_query_empty(spark, tiny):
    from sparkfeat.search import bm25_topk

    probes = spark.createDataFrame([(9, "zzz")], "query_id long, query string")
    assert bm25_topk(tiny, probes, k=5).count() == 0


def test_bm25_k_larger_than_matches(spark, tiny):
    from sparkfeat.search import bm25_topk

    probes = spark.createDataFrame([(0, "window")], "query_id long, query string")
    rows = bm25_topk(tiny, probes, k=100).collect()
    assert [r.doc_id for r in rows] == [2]
    assert rows[0].rank == 1


def test_bm25_plan_broadcasts_terms_no_cartesian(spark, tiny):
    from sparkfeat.search import bm25_topk

    probes = spark.createDataFrame([(0, "spark join")], "query_id long, query string")
    plan = bm25_topk(tiny, probes, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_rrf_fuse_hand_case(spark):
    from sparkfeat.search import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2), (1, 1, 3)],  # doc 1 == probe -> dropped
        "probe_id long, doc_id long, rank long",
    )
    sem = spark.createDataFrame(
        [(1, 20, 1), (1, 30, 2)], "probe_id long, doc_id long, rank long"
    )
    rows = {r.doc_id: r for r in rrf_fuse([lex, sem], k=10, c=60).collect()}
    assert set(rows) == {10, 20, 30}
    assert rows[20].n_arms == 2 and rows[20].fused_rank == 1
    assert rows[20].rrf_score == pytest.approx(
        round(1 / 61 + 1 / 62, 6), abs=1e-9
    )
    assert rows[10].rrf_score == pytest.approx(round(1 / 61, 6), abs=1e-9)
    # tie between doc 10 (lex rank 1) and sem-only doc at rank 1 would be
    # broken by doc_id; here 10 (1/61) beats 30 (1/62)
    assert rows[10].fused_rank == 2 and rows[30].fused_rank == 3


def test_rrf_fuse_k_truncates(spark):
    from sparkfeat.search import rrf_fuse

    arm = spark.createDataFrame(
        [(1, d, d) for d in range(2, 30)], "probe_id long, doc_id long, rank long"
    )
    out = rrf_fuse([arm], k=5).collect()
    assert len(out) == 5
    assert sorted(r.fused_rank for r in out) == [1, 2, 3, 4, 5]


# ---------------------------------------------------------------------------
# retrieval_eval — MRR / recall@k / graded NDCG@k
# ---------------------------------------------------------------------------


def _eval(spark, res_rows, qrel_rows, k=3):
    from sparkfeat.search import retrieval_eval

    res = spark.createDataFrame(
        res_rows, "query_id long, doc_id string, rank long"
    )
    qr = spark.createDataFrame(
        qrel_rows, "query_id long, doc_id string, rel long"
    )
    return {
        r.query_id: r for r in retrieval_eval(res, qr, k=k).collect()
    }


def test_retrieval_eval_hand_computed(spark):
    import math

    rows = _eval(
        spark,
        [(0, "a", 1), (0, "c", 2), (0, "b", 3), (1, "x", 1)],
        [(0, "a", 2), (0, "b", 1), (0, "z", 1), (2, "m", 1)],
    )
    q0 = rows[0]
    # DCG = 3/log2(2) + 1/log2(4); IDCG over ideal a(2),b(1),z(1)
    dcg = round(3 / 1.0, 9) + round(1 / 2.0, 9)
    idcg = round(3.0, 9) + round(1 / math.log2(3), 9) + round(0.5, 9)
    assert q0.mrr == 1.0 and q0.hits_k == 2 and q0.recall_k == 0.666667
    assert q0.dcg_k == round(dcg, 9) and q0.idcg_k == round(idcg, 9)
    assert q0.ndcg_k == round(dcg / idcg, 6)
    # query with results but empty qrel set: metrics undefined, not 0
    q1 = rows[1]
    assert q1.mrr == 0.0 and q1.recall_k is None and q1.ndcg_k is None
    # query judged but never retrieved: honest zeros
    q2 = rows[2]
    assert q2.recall_k == 0.0 and q2.ndcg_k == 0.0 and q2.n_ret == 0
    assert q0.n_queries == 3


def test_retrieval_eval_perfect_run(spark):
    # run == ideal ordering -> NDCG exactly 1, MRR 1, full recall
    rows = _eval(
        spark,
        [(5, "a", 1), (5, "b", 2)],
        [(5, "a", 3), (5, "b", 1)],
    )
    r = rows[5]
    assert r.ndcg_k == 1.0 and r.mrr == 1.0 and r.recall_k == 1.0


def test_retrieval_eval_rank_cutoff(spark):
    # a relevant doc at rank 4 is invisible to k=3 everywhere
    rows = _eval(
        spark,
        [(7, "a", 1), (7, "b", 2), (7, "c", 3), (7, "d", 4)],
        [(7, "d", 2)],
    )
    r = rows[7]
    assert r.hits_k == 0 and r.mrr == 0.0 and r.recall_k == 0.0
    assert r.dcg_k == 0.0 and r.ndcg_k == 0.0


# ----------------------------------------------------------------- RM3


def test_rm3_finds_vocabulary_mismatched_doc(spark):
    """The RM3 point: doc 99 shares NO term with the query but uses the
    feedback docs' vocabulary — invisible to plain BM25, found by the
    expanded query."""
    from sparkfeat.search import bm25_topk, rm3_expand_topk

    docs = spark.createDataFrame(
        [
            (1, "alpha retrieval engine beta index"),
            (2, "alpha ranking beta scoring model"),
            (3, "alpha beta posting lists merge"),
            (99, "beta beta beta relevance feedback"),  # no 'alpha'
            (50, "unrelated cooking recipe tomato basil"),
            (51, "weather forecast rain tomorrow cold"),
        ],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(0, "alpha")], "query_id long, query string")
    plain = {r["doc_id"] for r in bm25_topk(docs, q, k=6).collect()}
    rm3 = {r["doc_id"] for r in rm3_expand_topk(docs, q, fb_docs=3, fb_terms=4, k=6).collect()}
    assert 99 not in plain
    assert 99 in rm3
    # and the original-term docs are still retrieved (interpolation
    # keeps the query anchored)
    assert {1, 2, 3} <= rm3


def test_rm3_no_feedback_degrades_to_scaled_bm25(spark):
    """A query matching nothing has no relevance model: the expanded
    ranking must equal plain BM25's (empty on a no-match query)."""
    from sparkfeat.search import bm25_topk, rm3_expand_topk

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    q = spark.createDataFrame(
        [(0, "zzz qqq")], "query_id long, query string"
    )
    assert bm25_topk(docs, q, k=5).count() == 0
    assert rm3_expand_topk(docs, q, k=5).count() == 0


def test_rm3_deterministic(spark):
    from sparkfeat.search import rm3_expand_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = spark.createDataFrame(
        [(0, "hash join merge"), (1, "window sort order")],
        "query_id long, query string",
    )
    a = sorted(map(tuple, rm3_expand_topk(docs, q, k=5).collect()))
    b = sorted(map(tuple, rm3_expand_topk(docs, q, k=5).collect()))
    assert a == b
    assert len(a) == 10  # 5 per query
