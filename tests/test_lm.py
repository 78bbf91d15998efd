"""sparkfeat.lm — bigram stupid-backoff perplexity + bucketing."""

import math

import pytest

from sparkfeat.lm import lm_perplexity

DOCS = [
    (0, "a b a b"),
    (1, "a a"),
    (2, "c"),
    (3, ""),          # zero tokens -> null score, null bucket
    (4, None),        # null text  -> same
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _expected():
    # corpus counts: c1 = {a: 4, b: 2, c: 1}, N = 7
    # bigrams: (a,b): 2, (b,a): 1, (a,a): 1  — all seen, no backoff;
    # doc 2's single token exercises the unigram branch alone.
    lp0 = math.log(4 / 7) + 2 * math.log(2 / 4) + math.log(1 / 2)
    lp1 = math.log(4 / 7) + math.log(1 / 4)
    lp2 = math.log(1 / 7)
    return {
        0: (4, lp0, math.exp(-lp0 / 4)),
        1: (2, lp1, math.exp(-lp1 / 2)),
        2: (1, lp2, math.exp(-lp2 / 1)),
    }


def test_lm_perplexity_hand_computed(spark):
    rows = {r.doc_id: r for r in lm_perplexity(_df(spark)).collect()}
    assert set(rows) == {0, 1, 2, 3, 4}
    for did, (n, lp, ppl) in _expected().items():
        r = rows[did]
        assert r.n_tokens == n
        assert r.logprob == pytest.approx(lp, abs=2e-6)
        assert r.ppl == pytest.approx(ppl, abs=2e-6)
    for did in (3, 4):
        r = rows[did]
        assert r.n_tokens == 0
        assert r.logprob is None and r.ppl is None and r.ppl_bucket is None


def test_lm_bucket_order(spark):
    """Terciles: the most fluent doc (lowest ppl) lands in bucket 0, the
    least fluent in bucket 2, and buckets are monotone in ppl."""
    rows = [r for r in lm_perplexity(_df(spark)).collect() if r.ppl is not None]
    rows.sort(key=lambda r: r.ppl)
    assert rows[0].ppl_bucket == 0
    assert rows[-1].ppl_bucket == 2
    assert all(
        a.ppl_bucket <= b.ppl_bucket for a, b in zip(rows, rows[1:])
    )


def test_lm_backoff_and_oov_heldout_fit(spark):
    """Held-out fit exercises BOTH extra branches: unseen bigram ->
    alpha backoff; OOV word -> count-1 singleton floor."""
    fit = spark.createDataFrame(
        [(0, "a b"), (1, "a c")], "doc_id long, text string"
    )
    # fit counts: a:2 b:1 c:1, N=4; bigrams (a,b):1 (a,c):1
    score = spark.createDataFrame([(2, "b c x")], "doc_id long, text string")
    r = lm_perplexity(score, alpha=0.4, fit_docs=fit).collect()[0]
    # b: ln(1/4); (b,c) unseen -> ln(0.4*1/4); (c,x) OOV x -> ln(0.4*1/4)
    want = math.log(0.25) + 2 * math.log(0.4 * 0.25)
    assert r.n_tokens == 3
    assert r.logprob == pytest.approx(want, abs=2e-6)
    # a smaller alpha must strictly lower the backoff logprob
    r2 = lm_perplexity(score, alpha=0.1, fit_docs=fit).collect()[0]
    assert r2.logprob < r.logprob


def test_lm_selffit_alpha_inert(spark):
    """Under self-fit every scored bigram was counted, so the backoff
    branch is unreachable and alpha must not move any score."""
    df = spark.createDataFrame(
        [(0, "a b"), (1, "a c"), (2, "c b")], "doc_id long, text string"
    )
    a = {x.doc_id: x.logprob for x in lm_perplexity(df, alpha=0.4).collect()}
    b = {x.doc_id: x.logprob for x in lm_perplexity(df, alpha=0.01).collect()}
    assert a == b


def test_lm_approx_matches_exact_buckets(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    exact = {
        r.doc_id: r.ppl_bucket
        for r in lm_perplexity(docs, method="exact").collect()
    }
    approx = {
        r.doc_id: r.ppl_bucket
        for r in lm_perplexity(docs, method="approx").collect()
    }
    n = len(exact)
    agree = sum(exact[k] == approx[k] for k in exact)
    assert agree / n > 0.98, (agree, n)


def test_lm_plan_no_cartesian(spark):
    plan = (
        lm_perplexity(_df(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
