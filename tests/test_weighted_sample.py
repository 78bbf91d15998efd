"""weighted_sample (sparkfeat/corpus.py): the A-Res statistical law
(inclusion frequency proportional to weight, validated with an
independent hashlib replication over many seeds), Spark == replay
equality on one seed, exact-k, weight gating, seed replay determinism,
and two-phase == direct-rank equivalence."""

from __future__ import annotations

import hashlib
import math

import pytest

from sparkfeat.corpus import weighted_sample


def _py_rank(seed: str, doc_id: int, w: float) -> float:
    """Independent replication of the rank key from first principles:
    48-bit md5 prefix -> u in (0,1] -> round(ln(u)/w, 9)."""
    h = int(hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()[:12], 16)
    u = (h + 1) / float(1 << 48)
    return round(math.log(u) / w, 9)


def test_inclusion_frequency_proportional_to_weight():
    """Pure-math law check (no Spark): k=1 A-Res picks item i with
    probability w_i / sum(w). 400 seeds over weights 1,1,1,1,6 ->
    the heavy item wins ~60% of the time."""
    weights = {0: 1.0, 1: 1.0, 2: 1.0, 3: 1.0, 4: 6.0}
    wins = {i: 0 for i in weights}
    for s in range(400):
        ranks = {i: _py_rank(str(s), i, w) for i, w in weights.items()}
        wins[max(ranks, key=lambda i: (ranks[i], -i))] += 1
    assert wins[4] / 400 == pytest.approx(0.6, abs=0.08)
    for i in range(4):
        assert wins[i] / 400 == pytest.approx(0.1, abs=0.06)


def test_spark_matches_independent_replay(spark):
    docs = spark.createDataFrame(
        [("en", i, (i % 7 + 1) * 10) for i in range(200)]
        + [("de", 1000 + i, (i % 3 + 1) * 5) for i in range(50)],
        "lang string, doc_id long, n_chars long",
    )
    got = weighted_sample(docs, k=10, seed="s1")
    rows = {(r["lang"], r["doc_id"]): r["sample_rank"] for r in got.collect()}
    # independent replay: rank all docs per group in pure python
    for lang, ids in (("en", range(200)), ("de", range(1000, 1050))):
        w_of = lambda i: float((i % 7 + 1) * 10) if lang == "en" else float(
            ((i - 1000) % 3 + 1) * 5
        )  # noqa: E731
        ranked = sorted(
            ((_py_rank("s1", i, w_of(i)), -i) for i in ids), reverse=True
        )
        want = {-neg: pos + 1 for pos, (_, neg) in enumerate(ranked[:10])}
        got_lang = {d: r for (lg, d), r in rows.items() if lg == lang}
        assert got_lang == want, lang


def test_exact_k_and_weight_gating(spark):
    docs = spark.createDataFrame(
        [("en", i, 100) for i in range(30)]
        + [("en", 100 + i, 0) for i in range(5)]     # zero weight: never
        + [("en", 200 + i, None) for i in range(5)]  # null weight: never
        + [("fr", 300 + i, 10) for i in range(3)],   # group smaller than k
        "lang string, doc_id long, n_chars long",
    )
    got = weighted_sample(docs, k=8, seed="0").collect()
    by_lang = {}
    for r in got:
        by_lang.setdefault(r["lang"], []).append(r)
    assert len(by_lang["en"]) == 8
    assert len(by_lang["fr"]) == 3  # all of an undersized group
    picked = {r["doc_id"] for r in got}
    assert all(d < 100 or d >= 300 for d in picked)  # gated rows absent
    assert sorted(r["sample_rank"] for r in by_lang["en"]) == list(range(1, 9))


def test_seed_replay_and_seed_sensitivity(spark):
    docs = spark.createDataFrame(
        [("en", i, (i % 5 + 1) * 7) for i in range(100)],
        "lang string, doc_id long, n_chars long",
    )
    a1 = {r["doc_id"] for r in weighted_sample(docs, k=10, seed="a").collect()}
    a2 = {r["doc_id"] for r in weighted_sample(docs, k=10, seed="a").collect()}
    b = {r["doc_id"] for r in weighted_sample(docs, k=10, seed="b").collect()}
    assert a1 == a2
    assert a1 != b  # different seed, different draw (overwhelmingly)
