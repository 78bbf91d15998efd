"""sparkfeat.dsir — hashed-n-gram importance weights."""

import hashlib
import math
from collections import Counter

import pytest

from sparkfeat.dsir import dsir_logweights

RAW = [
    (0, "big cat big cat"),
    (1, "small dog runs"),
    (2, ""),
    (3, None),
]
TARGET = [(10, "big cat big"), (11, "big cat")]
B = 256


def _bucket(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[24:32], 16) % B


def _grams(text: str) -> list[str]:
    toks = [t for t in text.lower().split() if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _expected() -> dict[int, float]:
    raw_c: Counter = Counter()
    doc_c: dict[int, Counter] = {}
    for did, t in RAW:
        c = Counter(_bucket(g) for g in _grams(t or ""))
        doc_c[did] = c
        raw_c.update(c)
    tgt_c: Counter = Counter()
    for _did, t in TARGET:
        tgt_c.update(_bucket(g) for g in _grams(t))
    t_tot, r_tot = sum(tgt_c.values()), sum(raw_c.values())
    out = {}
    for did, c in doc_c.items():
        if not c:
            out[did] = None
            continue
        out[did] = sum(
            k
            * (
                math.log((tgt_c.get(b, 0) + 1) / (t_tot + B))
                - math.log((raw_c[b] + 1) / (r_tot + B))
            )
            for b, k in c.items()
        )
    return out


def _dfs(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    return raw, tgt


def test_dsir_hand_computed(spark):
    raw, tgt = _dfs(spark)
    got = {
        r.doc_id: r for r in dsir_logweights(raw, tgt, n_buckets=B).collect()
    }
    want = _expected()
    assert set(got) == {0, 1, 2, 3}
    for did, w in want.items():
        if w is None:
            assert got[did].dsir_logweight is None
            assert got[did].n_grams == 0
        else:
            assert got[did].dsir_logweight == pytest.approx(w, abs=2e-6)
    # n_grams = unigrams + bigrams
    assert got[0].n_grams == 4 + 3
    assert got[1].n_grams == 3 + 2


def test_dsir_target_like_scores_higher(spark):
    raw, tgt = _dfs(spark)
    got = {
        r.doc_id: r.dsir_logweight
        for r in dsir_logweights(raw, tgt, n_buckets=B).collect()
    }
    # doc 0 shares every gram with the target; doc 1 shares none
    assert got[0] > got[1]


def test_dsir_plan_shape(spark):
    raw, tgt = _dfs(spark)
    plan = (
        dsir_logweights(raw, tgt)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    # the bucket-ratio table joins broadcast (map-side scoring)
    assert "BroadcastHashJoin" in plan
