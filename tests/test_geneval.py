"""Unit tests for sparkfeat.geneval.bleu_pairs and
sparkfeat.drift.cusum_alarms: each operator vs an independent
pure-Python reference implementation, plus edge cases and plan shape.
(The DuckDB oracle parity runs separately via test_oracle_parity.py —
these tests pin the SEMANTICS against the textbook definitions.)"""

from __future__ import annotations

import math
from collections import Counter

import pytest


# ---------------------------------------------------------------- BLEU


def _ref_bleu(cand: str, ref: str, max_n: int = 4, eps: float = 0.1):
    """Textbook BLEU: clipped modified n-gram precision (smoothing-1
    floor on zero numerators) x brevity penalty; 0.0 when the candidate
    has fewer than max_n tokens or the reference is empty."""
    ct = [t for t in cand.lower().split() if t]
    rt = [t for t in ref.lower().split() if t]
    if len(ct) < max_n or not rt:
        return 0.0
    logp = 0.0
    for n in range(1, max_n + 1):
        cg = Counter(tuple(ct[i : i + n]) for i in range(len(ct) - n + 1))
        rg = Counter(tuple(rt[i : i + n]) for i in range(len(rt) - n + 1))
        clip = sum(min(c, rg[g]) for g, c in cg.items())
        total = len(ct) - n + 1
        logp += math.log((clip if clip > 0 else eps) / total)
    bp = 1.0 if len(ct) >= len(rt) else math.exp(1 - len(rt) / len(ct))
    return round(bp * math.exp(logp / max_n), 6)


PAIRS = [
    # (pair_id, candidate, reference)
    (1, "the cat sat on the mat", "the cat sat on the mat"),  # identical
    (2, "the cat sat on the mat", "a dog ran in the park today"),  # disjoint-ish
    (3, "the quick brown fox jumps", "the quick brown fox jumps over it"),  # short cand
    (4, "alpha beta gamma", "alpha beta gamma"),  # cand_len < max_n -> 0
    (5, "one two three four five six", ""),  # empty ref -> 0
    (6, "a a a a a a", "a a"),  # heavy repetition, clipping matters
    (7, "x y z w v u t s", "x y z w"),  # partial prefix overlap
]


@pytest.fixture(scope="module")
def bleu_result(spark):
    from sparkfeat.geneval import bleu_pairs

    df = spark.createDataFrame(
        PAIRS, "pair_id int, cand string, ref string"
    )
    out = bleu_pairs(
        df, id_cols=("pair_id",), cand_col="cand", ref_col="ref"
    )
    return {r["pair_id"]: r.asDict() for r in out.collect()}


def test_bleu_matches_pure_python_reference(bleu_result):
    for pid, cand, ref in PAIRS:
        got = bleu_result[pid]["bleu"]
        want = _ref_bleu(cand, ref)
        assert got == pytest.approx(want, abs=1e-6), (pid, got, want)


def test_bleu_identical_pair_scores_one(bleu_result):
    assert bleu_result[1]["bleu"] == 1.0
    assert bleu_result[1]["low_contrast"] is True
    assert bleu_result[1]["brevity_penalty"] == 1.0
    assert bleu_result[1]["unigram_prec"] == 1.0


def test_bleu_degenerate_pairs_score_zero(bleu_result):
    # candidate shorter than max_n tokens
    assert bleu_result[4]["bleu"] == 0.0
    assert bleu_result[4]["low_contrast"] is False
    # empty reference
    assert bleu_result[5]["bleu"] == 0.0
    assert bleu_result[5]["ref_len"] == 0


def test_bleu_clipping_bounds_repeated_grams(bleu_result):
    # cand "a a a a a a" vs ref "a a": unigram clip = min(6, 2) = 2,
    # NOT 6 — the Papineni clipping. p1 = 2/6.
    assert bleu_result[6]["unigram_prec"] == pytest.approx(round(2 / 6, 6))


def test_bleu_row_count_and_null_text(spark):
    from sparkfeat.geneval import bleu_pairs

    df = spark.createDataFrame(
        [(1, None, "some reference here"), (2, "a b c d e", None)],
        "pair_id int, cand string, ref string",
    )
    rows = {
        r["pair_id"]: r.asDict()
        for r in bleu_pairs(
            df, id_cols=("pair_id",), cand_col="cand", ref_col="ref"
        ).collect()
    }
    # nulls behave as empty text: row preserved, score 0 — one null
    # pair must not kill (or shrink) a billion-pair screen
    assert set(rows) == {1, 2}
    assert rows[1]["bleu"] == 0.0 and rows[1]["cand_len"] == 0
    assert rows[2]["bleu"] == 0.0 and rows[2]["ref_len"] == 0


def test_bleu_plan_no_python_udf_no_cartesian(spark):
    from sparkfeat.geneval import bleu_pairs

    df = spark.createDataFrame(
        PAIRS, "pair_id int, cand string, ref string"
    )
    plan = (
        bleu_pairs(df, id_cols=("pair_id",), cand_col="cand", ref_col="ref")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


# --------------------------------------------------------------- CUSUM


def _ref_cusum(xs, ref_n=5, k=0.5, h=4.0):
    """Direct Page recursion (the max(0, .) fold the operator replaces
    with its closed form): returns per-index (s_pos, s_neg, alarm)."""
    import statistics

    ref = xs[:ref_n]
    mu = sum(ref) / len(ref)
    sigma = math.sqrt(sum((v - mu) ** 2 for v in ref) / len(ref))
    sp = sn = 0.0
    out = []
    for i, v in enumerate(xs):
        if i < ref_n or sigma == 0:
            out.append((0.0, 0.0, False))
            continue
        z = (v - mu) / sigma
        sp = max(0.0, sp + z - k)
        sn = max(0.0, sn - z - k)
        out.append(
            (round(sp, 6), round(sn, 6), round(sp, 6) > h or round(sn, 6) > h)
        )
    return out


def test_cusum_closed_form_equals_page_recursion(spark):
    from sparkfeat.drift import cusum_alarms

    # stable burn-in, then a +2-sigma mean shift at t=10
    xs = [10.0, 10.5, 9.5, 10.2, 9.8] + [10.1, 9.9, 10.0, 10.3, 9.7] + [12.0] * 6
    df = spark.createDataFrame(
        [("s", i, x) for i, x in enumerate(xs)], "series string, t int, x double"
    )
    got = {
        r["t"]: r.asDict()
        for r in cusum_alarms(
            df, ("series",), "t", "x", ref_n=5, k=0.5, h=4.0
        ).collect()
    }
    want = _ref_cusum(xs, ref_n=5)
    assert len(got) == len(xs)
    for i, (sp, sn, alarm) in enumerate(want):
        assert got[i]["s_pos"] == pytest.approx(sp, abs=1e-6), i
        assert got[i]["s_neg"] == pytest.approx(sn, abs=1e-6), i
        assert got[i]["alarm"] == alarm, i
    # the planted shift must actually alarm (power), and not before t=10
    alarm_ts = sorted(t for t, r in got.items() if r["alarm"])
    assert alarm_ts and alarm_ts[0] >= 10


def test_cusum_stable_series_never_alarms_and_downshift_fires_s_neg(spark):
    from sparkfeat.drift import cusum_alarms

    stable = [("a", i, 5.0 + (0.1 if i % 2 else -0.1)) for i in range(30)]
    down = [("b", i, 5.0 + (0.1 if i % 2 else -0.1)) for i in range(10)] + [
        ("b", i, 3.0) for i in range(10, 20)
    ]
    df = spark.createDataFrame(
        stable + down, "series string, t int, x double"
    )
    rows = cusum_alarms(df, ("series",), "t", "x", ref_n=10, k=0.5, h=4.0).collect()
    a = [r for r in rows if r["series"] == "a"]
    b = [r for r in rows if r["series"] == "b"]
    assert not any(r["alarm"] for r in a)
    fired = [r for r in b if r["alarm"]]
    assert fired and all(r["s_neg"] > 4.0 for r in fired)  # downward side


def test_cusum_zero_variance_burn_in_reports_null_z(spark):
    from sparkfeat.drift import cusum_alarms

    df = spark.createDataFrame(
        [("c", i, 7.0) for i in range(8)], "series string, t int, x double"
    )
    rows = cusum_alarms(df, ("series",), "t", "x", ref_n=4).collect()
    assert len(rows) == 8
    assert all(r["z"] is None for r in rows)
    assert not any(r["alarm"] for r in rows)


def test_cusum_single_exchange_plan(spark):
    """All windows + the ref join reuse ONE series partitioning: the
    executed plan must not shuffle the stream more than twice (the
    stream side + the tiny ref aggregate side)."""
    from sparkfeat.drift import cusum_alarms

    df = spark.createDataFrame(
        [("s", i, float(i)) for i in range(20)], "series string, t int, x double"
    )
    plan = (
        cusum_alarms(df, ("series",), "t", "x")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") <= 3, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
