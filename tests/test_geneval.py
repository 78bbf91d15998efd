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


# -------------------------------------------------------------- ROUGE-L


def _ref_lcs(a, b):
    """Plain O(n·m) textbook LCS — independent of the numpy kernel."""
    n, m = len(a), len(b)
    dp = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            dp[i][j] = (
                dp[i - 1][j - 1] + 1
                if a[i - 1] == b[j - 1]
                else max(dp[i - 1][j], dp[i][j - 1])
            )
    return dp[n][m]


ROUGE_PAIRS = [
    (1, "the cat sat on the mat", "the cat sat on the mat"),
    (2, "the cat sat on the mat", "mat the on sat cat the"),  # shuffled copy
    (3, "a b c d e f g", "a x b y c z d"),
    (4, "alpha beta", ""),
    (5, "", "some reference text"),
    (6, "w w w w w", "w w"),
]


def test_rouge_l_matches_textbook_lcs(spark):
    from sparkfeat.geneval import rouge_l_pairs

    df = spark.createDataFrame(ROUGE_PAIRS, "pair_id int, cand string, ref string")
    got = {
        r["pair_id"]: r.asDict()
        for r in rouge_l_pairs(
            df, id_cols=("pair_id",), cand_col="cand", ref_col="ref"
        ).collect()
    }
    for pid, cand, ref in ROUGE_PAIRS:
        ct, rt = cand.split(), ref.split()
        lcs = _ref_lcs(ct, rt)
        assert got[pid]["lcs_len"] == lcs, pid
        if ct and rt:
            r_ = lcs / len(rt)
            p_ = lcs / len(ct)
            f_ = 2 * r_ * p_ / (r_ + p_) if lcs else 0.0
            assert got[pid]["rouge_r"] == pytest.approx(round(r_, 6)), pid
            assert got[pid]["rouge_p"] == pytest.approx(round(p_, 6)), pid
            assert got[pid]["rouge_f"] == pytest.approx(round(f_, 6)), pid
        else:
            assert got[pid]["rouge_f"] == 0.0


def test_rouge_l_order_sensitivity_vs_bleu_blindspot(spark):
    """The shuffled copy: identical unigram bag, destroyed order —
    ROUGE-L must punish it while unigram precision stays 1."""
    from sparkfeat.geneval import bleu_pairs, rouge_l_pairs

    df = spark.createDataFrame(
        [(1, "the cat sat on the mat", "mat the on sat cat the")],
        "pair_id int, cand string, ref string",
    )
    rouge = rouge_l_pairs(
        df, id_cols=("pair_id",), cand_col="cand", ref_col="ref"
    ).collect()[0]
    bleu = bleu_pairs(
        df, id_cols=("pair_id",), cand_col="cand", ref_col="ref"
    ).collect()[0]
    assert bleu["unigram_prec"] == 1.0
    # shuffling cut ROUGE-L in half (LCS 3 of 6) while the unigram bag
    # is still a perfect match — the order-blindness gap
    assert rouge["rouge_f"] == 0.5


def test_rouge_l_token_cap_bounds_dp(spark):
    """A pathological long pair must respect max_tokens: LCS computed
    on the capped prefixes only (and the call returns promptly)."""
    from sparkfeat.geneval import rouge_l_pairs

    long_text = " ".join(f"t{i}" for i in range(5000))
    df = spark.createDataFrame(
        [(1, long_text, long_text)], "pair_id int, cand string, ref string"
    )
    row = rouge_l_pairs(
        df, id_cols=("pair_id",), cand_col="cand", ref_col="ref", max_tokens=64
    ).collect()[0]
    assert row["lcs_len"] == 64  # capped prefix is identical
    assert row["cand_len"] == 5000  # lengths reported pre-cap
    assert row["rouge_r"] == 1.0  # recall normalized by min(len, cap)


# ---------------------------------------------------------------- SPRT


def test_sprt_decides_and_stops_at_first_crossing(spark):
    import math

    from sparkfeat.arena import sprt_monitor

    up = math.log(0.6 / 0.5)
    hi = math.log(0.95 / 0.05)
    need = math.ceil(hi / up)  # consecutive a-wins to cross
    rows = [("m1", "m2", t, True) for t in range(need + 5)]
    # a pair that never decides: strict alternation hovers near 0
    rows += [("m1", "m3", t, t % 2 == 0) for t in range(40)]
    df = spark.createDataFrame(rows, "a string, b string, t int, a_won boolean")
    got = {
        (r["a"], r["b"]): r.asDict()
        for r in sprt_monitor(df).collect()
    }
    d12 = got[("m1", "m2")]
    assert d12["decision"] == "accept_h1"
    assert d12["n_decision"] == need  # stopped exactly at first crossing
    assert d12["llr_at_decision"] >= round(hi, 6)
    d13 = got[("m1", "m3")]
    assert d13["decision"] == "continue"
    assert d13["n_decision"] is None and d13["llr_at_decision"] is None


def test_sprt_symmetric_loss_stream_accepts_h0(spark):
    import math

    from sparkfeat.arena import sprt_monitor

    down = math.log(0.4 / 0.5)
    lo = math.log(0.05 / 0.95)
    need = math.ceil(lo / down)
    rows = [("x", "y", t, False) for t in range(need + 3)]
    df = spark.createDataFrame(rows, "a string, b string, t int, a_won boolean")
    d = sprt_monitor(df).collect()[0].asDict()
    assert d["decision"] == "accept_h0"
    assert d["n_decision"] == need


def test_sprt_matches_sequential_reference_fold(spark):
    """Random-ish deterministic stream vs a pure-Python Wald fold."""
    import math

    from sparkfeat.arena import sprt_monitor

    up, down = math.log(0.6 / 0.5), math.log(0.4 / 0.5)
    hi, lo = math.log(0.95 / 0.05), math.log(0.05 / 0.95)
    wins = [(t * 2654435761) % 97 < 55 for t in range(200)]
    df = spark.createDataFrame(
        [("p", "q", t, w) for t, w in enumerate(wins)],
        "a string, b string, t int, a_won boolean",
    )
    got = sprt_monitor(df).collect()[0].asDict()
    llr, decision, n_dec, llr_dec = 0.0, "continue", None, None
    for i, w in enumerate(wins, 1):
        llr += up if w else down
        r = round(llr, 6)
        if decision == "continue" and (r >= round(hi, 6) or r <= round(lo, 6)):
            decision = "accept_h1" if r >= round(hi, 6) else "accept_h0"
            n_dec, llr_dec = i, r
    assert got["decision"] == decision
    assert got["n_decision"] == n_dec
    assert got["llr_final"] == pytest.approx(round(llr, 6), abs=2e-6)
    if llr_dec is not None:
        assert got["llr_at_decision"] == pytest.approx(llr_dec, abs=2e-6)
