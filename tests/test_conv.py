"""sparkfeat.conv — conversation-level dedup / preference pairs /
turn-order repair."""

from __future__ import annotations

import hashlib
from datetime import datetime

from sparkfeat.conv import (
    conv_dedup_exact,
    conv_signature,
    preference_pairs,
    resequence_turns,
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(c, i, r, t, tool, ts) for (c, i, r, t, tool, ts) in rows],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )


def _ts(i):
    return datetime(2024, 1, 1, 0, 0, i)


def _py_sig(turns):
    """Pure-Python replica of conv._turn_term summed per conversation."""
    total = 0
    for idx, role, text, tool in turns:
        canon = "|".join(
            [str(idx), role or "<null>", text or "<null>", tool or "<null>"]
        )
        total += int(hashlib.md5(canon.encode()).hexdigest()[:15], 16)
    return str(total)


BASE = [  # conversation content shared by a and its clone b
    (0, "user", "hi", None),
    (1, "assistant", "hello", None),
    (2, "tool", "grep foo", "search"),
]


def test_signature_matches_python_replica_and_order_awareness(spark):
    rows = (
        [("a", i, r, t, tool, _ts(i)) for (i, r, t, tool) in BASE]
        # c: same turn CONTENTS as a but swapped order 0<->1
        + [
            ("c", 0, "assistant", "hello", None, _ts(0)),
            ("c", 1, "user", "hi", None, _ts(1)),
            ("c", 2, "tool", "grep foo", "search", _ts(2)),
        ]
    )
    sigs = {r.conv_id: r for r in conv_signature(_df(spark, rows)).collect()}
    assert sigs["a"].conv_sig == _py_sig(BASE)
    assert sigs["a"].n_turns == 3
    # same multiset of (role, text, tool) in a different order -> the
    # turn_idx inside each md5 term changes -> different signature
    assert sigs["a"].conv_sig != sigs["c"].conv_sig


def test_dedup_exact_keeplist(spark):
    rows = (
        [("a", i, r, t, tool, _ts(i)) for (i, r, t, tool) in BASE]
        + [("b", i, r, t, tool, _ts(i + 9)) for (i, r, t, tool) in BASE]  # ts differs
        + [("z", 0, "user", "solo", None, _ts(0))]
    )
    got = {r.conv_id: r for r in conv_dedup_exact(_df(spark, rows)).collect()}
    assert got["a"].keep and not got["b"].keep  # smallest id kept; ts ignored
    assert got["a"].group_size == got["b"].group_size == 2
    assert got["a"].conv_sig == got["b"].conv_sig
    assert got["z"].keep and got["z"].group_size == 1


def test_preference_pairs_hand_computed(spark):
    rows = [
        ("a", 0, "user", "do the thing", None, _ts(0)),
        ("a", 1, "assistant", "attempt 1", None, _ts(1)),
        ("a", 2, "tool", "boom", "retry", _ts(2)),
        ("a", 3, "tool", "boom again", "retry", _ts(3)),
        ("a", 4, "assistant", "fixed it", "checkout", _ts(4)),
        # b: retry with no resolution after it -> no pair
        ("b", 0, "user", "hi", None, _ts(0)),
        ("b", 1, "tool", "err", "retry", _ts(1)),
    ]
    got = {
        (r.conv_id, r.retry_idx): r
        for r in preference_pairs(_df(spark, rows)).collect()
    }
    assert set(got) == {("a", 2), ("a", 3)}
    for k in [("a", 2), ("a", 3)]:  # consecutive retries share one chosen
        r = got[k]
        assert r.prompt_text == "do the thing"
        assert r.chosen_idx == 4
        assert r.chosen_role == "assistant"
        assert r.chosen_text == "fixed it"
    assert got[("a", 2)].rejected_text == "boom"
    assert got[("a", 3)].rejected_text == "boom again"


def test_resequence_turns_gaps_and_regression(spark):
    rows = [
        ("a", 0, "user", "t0", None, _ts(0)),
        ("a", 3, "user", "t3", None, _ts(3)),  # gap of 2 before
        ("a", 4, "user", "t4", None, _ts(1)),  # ts goes backwards
        ("b", 2, "user", "opener dropped", None, _ts(0)),  # gap from -1
    ]
    got = {
        (r.conv_id, r.turn_idx): r
        for r in resequence_turns(_df(spark, rows)).collect()
    }
    assert got[("a", 0)].new_turn_idx == 0 and got[("a", 0)].gap_before == 0
    assert got[("a", 3)].new_turn_idx == 1 and got[("a", 3)].gap_before == 2
    assert got[("a", 4)].gap_before == 0 and got[("a", 4)].ts_regressed
    assert not got[("a", 3)].ts_regressed
    assert got[("b", 2)].new_turn_idx == 0 and got[("b", 2)].gap_before == 2


def test_preference_pairs_single_exchange(spark, transcripts):
    plan = preference_pairs(transcripts)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # one conv_id hash partitioning
    assert "CartesianProduct" not in plan


def test_conv_dedup_plan_no_cartesian(spark, transcripts):
    plan = conv_dedup_exact(transcripts)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_conv_latency_stats_hand_computed(spark):
    from sparkfeat.windows import conv_latency_stats

    rows = [
        ("a", 0, "user", "q", None, datetime(2024, 1, 1, 0, 0, 0)),
        ("a", 1, "assistant", "ans", None, datetime(2024, 1, 1, 0, 0, 10)),
        ("a", 2, "user", "more", None, datetime(2024, 1, 1, 0, 0, 40)),
        ("b", 0, "user", "solo", None, datetime(2024, 1, 1, 0, 0, 0)),
    ]
    got = {r.conv_id: r for r in conv_latency_stats(_df(spark, rows)).collect()}
    a = got["a"]
    assert a.duration_s == 40.0 and a.n_turns == 3
    assert a.median_gap_s == 20.0  # gaps 10, 30
    assert a.p95_gap_s == 29.0  # 10 + 0.95 * (30 - 10)
    assert a.median_response_s == 10.0 and a.n_responses == 1
    b = got["b"]
    assert b.duration_s == 0.0 and b.median_gap_s is None and b.n_responses == 0


def test_conv_latency_approx_close_to_exact(spark, transcripts):
    from sparkfeat.windows import conv_latency_stats

    ex = {r.conv_id: r for r in conv_latency_stats(transcripts).collect()}
    ap = {
        r.conv_id: r
        for r in conv_latency_stats(transcripts, method="approx").collect()
    }
    assert set(ex) == set(ap)
    for k in ex:  # GK sketch: rank-error-bounded, same order of magnitude
        if ex[k].median_gap_s is not None:
            assert abs(ap[k].median_gap_s - ex[k].median_gap_s) <= max(
                1.0, 0.2 * ex[k].median_gap_s
            )


def test_preference_pairs_sort_cols_equivalent(spark, transcripts):
    base = sorted(
        map(tuple, preference_pairs(transcripts).collect())
    )
    alt = sorted(
        map(
            tuple,
            preference_pairs(transcripts, sort_cols=("ts", "turn_idx")).collect(),
        )
    )
    assert base == alt


def test_conv_signature_xx64_induces_same_grouping(spark):
    rows = (
        [("a", i, r, t, tool, _ts(i)) for (i, r, t, tool) in BASE]
        + [("b", i, r, t, tool, _ts(i + 9)) for (i, r, t, tool) in BASE]
        + [("z", 0, "user", "solo", None, _ts(0))]
        # y: same contents as z but different turn_idx -> distinct group
        + [("y", 1, "user", "solo", None, _ts(0))]
    )
    df = _df(spark, rows)
    md5 = {r.conv_id: (r.keep, r.group_size) for r in conv_dedup_exact(df).collect()}
    xx = {
        r.conv_id: (r.keep, r.group_size)
        for r in conv_dedup_exact(df, method="xx64").collect()
    }
    assert md5 == xx
    assert md5["a"] == (True, 2) and md5["b"] == (False, 2)
    assert md5["z"] == (True, 1) and md5["y"] == (True, 1)


def _mk_conv(cid, texts, t0=0):
    return [
        (cid, i, "user" if i % 2 == 0 else "assistant", t, None, _ts(t0 + i))
        for i, t in enumerate(texts)
    ]


def test_conv_neardup_pairs_finds_truncated_clone(spark):
    from sparkfeat.conv import conv_neardup_pairs

    texts = [f"msg {i}" for i in range(10)]
    rows = (
        _mk_conv("orig", texts)
        + _mk_conv("clone", texts[:-1])          # tail-truncated re-ingest, j=0.9
        + _mk_conv("other", [f"zzz {i}" for i in range(10)])  # disjoint
    )
    got = {
        (r.conv_a, r.conv_b): r
        for r in conv_neardup_pairs(_df(spark, rows), threshold=0.7).collect()
    }
    assert set(got) == {("clone", "orig")}
    r = got[("clone", "orig")]
    assert r.n_turns_a == 9 and r.n_turns_b == 10
    assert abs(r.jaccard - 0.9) < 1e-9
    assert 0.0 <= r.est_jaccard <= 1.0


def test_conv_neardup_exact_dupe_and_order_insensitivity(spark):
    from sparkfeat.conv import conv_neardup_pairs

    texts = [f"t {i}" for i in range(8)]
    rows = (
        _mk_conv("a", texts)
        # b: identical turn CONTENT but reversed order (role parity flips
        # with position, so keep roles aligned with a's by reusing the
        # same (role, text) pairs at different turn_idx)
        + [("b", 7 - i, role, t, tool, ts) for (_, i, role, t, tool, ts) in _mk_conv("x", texts)]
    )
    got = conv_neardup_pairs(_df(spark, rows), threshold=0.7).collect()
    assert {(r.conv_a, r.conv_b) for r in got} == {("a", "b")}
    r = got[0]
    # content sets are identical -> exact jaccard 1.0 and est 1.0
    assert r.jaccard == 1.0 and r.est_jaccard == 1.0


def test_conv_minhash_signature_is_partial_aggregable(spark):
    """The signature must be a plain hash-aggregate (map-side combine),
    never a collect_list/sort-aggregate: O(k) state per conversation."""
    from sparkfeat.conv import conv_minhash_signature

    df = _df(spark, _mk_conv("a", ["x", "y", "z"]))
    plan = (
        conv_minhash_signature(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "HashAggregate" in plan
    assert "collect_list" not in plan and "CollectList" not in plan


def test_conv_neardup_size_ratio_prune_blocks_subset(spark):
    from sparkfeat.conv import conv_neardup_pairs

    texts = [f"m {i}" for i in range(20)]
    # clone keeps only 10 of 20 turns: jaccard 0.5 < 0.7 -> no pair even
    # though every clone turn collides with orig in the LSH buckets
    rows = _mk_conv("orig", texts) + _mk_conv("half", texts[:10])
    got = conv_neardup_pairs(_df(spark, rows), threshold=0.7).collect()
    assert got == []


def test_conv_neardup_xx64_same_verified_pairs(spark):
    """The exact-verify stage only distinct-counts hash values, so the
    verified pair set must be identical under md5 and xx64 hashing
    wherever LSH recall agrees (high-similarity clones collide in all
    bands under either hash family)."""
    from sparkfeat.conv import conv_neardup_pairs

    texts = [f"line {i} of the conversation" for i in range(12)]
    rows = (
        _mk_conv("orig", texts)
        + _mk_conv("clone", texts[:-1])
        + _mk_conv("exact", texts, t0=40)
        + _mk_conv("other", [f"unrelated {i}" for i in range(12)])
    )
    df = _df(spark, rows)

    def run(method):
        return {
            (r.conv_a, r.conv_b): (r.n_turns_a, r.n_turns_b, r.jaccard)
            for r in conv_neardup_pairs(df, threshold=0.7, method=method).collect()
        }

    md5, xx = run("md5"), run("xx64")
    assert md5 == xx
    assert ("exact", "orig") in md5 and md5[("exact", "orig")][2] == 1.0


# ---------------------------------------------------------------------------
# role_transitions (corpus-wide Markov matrix with sentinels)
# ---------------------------------------------------------------------------


def test_role_transitions_hand_computed(spark):
    from sparkfeat.conv import role_transitions

    rows = [
        ("a", 0, "user", "q", None, _ts(0)),
        ("a", 1, "assistant", "r", None, _ts(1)),
        ("a", 2, "tool", "x", "search", _ts(2)),
        ("a", 3, "assistant", "s", None, _ts(3)),
        ("b", 0, "user", "q2", None, _ts(0)),
        ("b", 1, "assistant", "r2", None, _ts(1)),
    ]
    out = {
        (r["role_from"], r["role_to"]): r
        for r in role_transitions(_df(spark, rows)).collect()
    }
    assert out[("START", "user")]["n"] == 2
    assert out[("user", "assistant")]["n"] == 2
    assert out[("assistant", "tool")]["n"] == 1
    assert out[("tool", "assistant")]["n"] == 1
    assert out[("assistant", "END")]["n"] == 2
    # conditional rows: from 'assistant' = tool 1 + END 2 = 3
    assert abs(out[("assistant", "tool")]["p"] - 1 / 3) < 1e-6
    assert abs(out[("assistant", "END")]["p"] - 2 / 3) < 1e-6
    # every from-row's probabilities sum to ~1
    from collections import defaultdict

    sums = defaultdict(float)
    for (f, _t), r in out.items():
        sums[f] += r["p"]
    for f, s in sums.items():
        assert abs(s - 1.0) < 1e-5, (f, s)


def test_role_transitions_single_turn_conv(spark):
    from sparkfeat.conv import role_transitions

    rows = [("solo", 0, "user", "only", None, _ts(0))]
    out = {
        (r["role_from"], r["role_to"]): r["n"]
        for r in role_transitions(_df(spark, rows)).collect()
    }
    assert out == {("START", "user"): 1, ("user", "END"): 1}


def test_role_transitions_single_exchange(spark, transcripts):
    from sparkfeat.conv import role_transitions

    plan = (
        role_transitions(transcripts)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    n_conv_ex = len(
        re.findall(r"Exchange hashpartitioning\(conv_id", plan)
    )
    assert n_conv_ex <= 1, plan


# ---------------------------------------------------------------------------
# pattern_screen / context_cost
# ---------------------------------------------------------------------------


def test_pattern_screen_counts_rate_and_verdict(spark):
    from sparkfeat.conv import pattern_screen

    rows = [
        # conv a: 3 assistant turns, 2 flagged (refusal template) -> drop
        ("a", 0, "user", "please do X", None, _ts(0)),
        ("a", 1, "assistant", "I cannot help with that", None, _ts(1)),
        ("a", 2, "assistant", "sure, here is X", None, _ts(2)),
        ("a", 3, "assistant", "As an AI I must refuse", None, _ts(3)),
        # conv b: 2 assistant turns, 0 flagged (one null text) -> keep
        ("b", 0, "assistant", "the answer is 42", None, _ts(0)),
        ("b", 1, "assistant", None, None, _ts(1)),
        # conv c: no assistant turns at all -> excluded from the panel
        ("c", 0, "user", "I cannot help with that", None, _ts(0)),
    ]
    out = {
        r["conv_id"]: r
        for r in pattern_screen(
            _df(spark, rows),
            patterns=["I cannot help", "[Aa]s an AI"],
            max_flag_rate=0.5,
        ).collect()
    }
    assert set(out) == {"a", "b"}
    a = out["a"]
    assert (a["n_role_turns"], a["n_flagged"]) == (3, 2)
    assert a["flag_rate"] == round(2 / 3, 6)  # 6-dp rounded by design
    assert a["first_flag_turn"] == 1 and a["keep"] == 0
    b = out["b"]
    assert (b["n_role_turns"], b["n_flagged"]) == (2, 0)
    assert b["flag_rate"] == 0.0
    assert b["first_flag_turn"] is None and b["keep"] == 1


def test_context_cost_prefix_sum_algebra(spark):
    from sparkfeat.conv import context_cost

    rows = [
        # conv a: tokens 2,3,1 — assistant at idx 1 (cum 5) and 2 (cum 6)
        ("a", 0, "user", "a b", None, _ts(0)),
        ("a", 1, "assistant", "c d e", None, _ts(1)),
        ("a", 2, "assistant", "f", None, _ts(2)),
        # conv b: null text (0 tokens) then user only -> no gen turns
        ("b", 0, "user", None, None, _ts(0)),
        ("b", 1, "user", "x y z", None, _ts(1)),
    ]
    out = {
        r["conv_id"]: r
        for r in context_cost(_df(spark, rows)).collect()
    }
    a = out["a"]
    assert (a["n_turns"], a["n_gen_turns"], a["total_tokens"]) == (3, 2, 6)
    assert a["prefill_tokens"] == 5 + 6
    assert a["peak_context"] == 6
    assert a["attn_cost"] == 25.0 + 36.0
    b = out["b"]
    assert (b["n_turns"], b["n_gen_turns"], b["total_tokens"]) == (2, 0, 3)
    assert b["prefill_tokens"] == 0
    assert b["peak_context"] is None and b["attn_cost"] is None


def test_near_loops_flags_rephrased_retries(spark):
    from sparkfeat.conv import near_loops

    rows = [
        # conv a: three near-identical assistant retries (1-char edits)
        # then a completely different turn -> 3 pairs, 2 near, run 2
        ("a", 0, "assistant", "run the query on table X", None, _ts(0)),
        ("a", 1, "assistant", "run the query on table Y", None, _ts(1)),
        ("a", 2, "assistant", "run the query on table Z", None, _ts(2)),
        ("a", 3, "assistant", "completely unrelated content here!", None, _ts(3)),
        # conv b: role alternates -> pairs never comparable -> dropped
        ("b", 0, "user", "same text", None, _ts(0)),
        ("b", 1, "assistant", "same text", None, _ts(1)),
        # conv c: exact repeat counts as near (distance 0)
        ("c", 0, "tool", "grep foo", "search", _ts(0)),
        ("c", 1, "tool", "grep foo", "search", _ts(1)),
    ]
    out = {
        r["conv_id"]: r
        for r in near_loops(_df(spark, rows), threshold=0.3).collect()
    }
    assert set(out) == {"a", "c"}
    a = out["a"]
    assert (a["n_pairs"], a["n_near"], a["max_near_run"]) == (3, 2, 2)
    assert a["near_frac"] == round(2 / 3, 6)
    c = out["c"]
    assert (c["n_pairs"], c["n_near"], c["max_near_run"]) == (1, 1, 1)


def test_near_loops_length_prune_is_lossless(spark):
    """A pair pruned by the |len gap| > thr*max_len shortcut must agree
    with the unpruned levenshtein verdict (lev >= |len gap| always)."""
    from sparkfeat.conv import near_loops

    long = "x" * 100
    rows = [
        ("a", 0, "assistant", long, None, _ts(0)),
        ("a", 1, "assistant", long + "y" * 60, None, _ts(1)),  # gap 60 > 0.3*160
        ("a", 2, "assistant", long + "y" * 60, None, _ts(2)),  # exact repeat
    ]
    out = near_loops(_df(spark, rows), threshold=0.3).collect()[0]
    assert (out["n_pairs"], out["n_near"]) == (2, 1)


def test_window_fit_hand_computed(spark):
    from sparkfeat.conv import window_fit

    rows = [
        # conv a: totals 2 + 3 = 5 tokens; conv b: 10 tokens; conv c:
        # null text only -> 0 tokens (always fits)
        ("a", 0, "user", "t u", None, _ts(0)),
        ("a", 1, "assistant", "v w x", None, _ts(1)),
        ("b", 0, "user", "a b c d e f g h i j", None, _ts(0)),
        ("c", 0, "user", None, None, _ts(0)),
    ]
    out = {
        r["window"]: r
        for r in window_fit(_df(spark, rows), windows=[4, 8, 16]).collect()
    }
    assert set(out) == {4, 8, 16}
    w4 = out[4]
    assert (w4["n_convs"], w4["n_fit"]) == (3, 1)  # only c fits at 4
    assert w4["tokens_total"] == 15
    assert w4["tokens_kept"] == 4 + 4 + 0  # a,b truncated to 4
    assert w4["token_coverage"] == round(8 / 15, 6)
    w8 = out[8]
    assert w8["n_fit"] == 2  # a (5) and c (0)
    assert w8["tokens_kept"] == 5 + 8 + 0
    w16 = out[16]
    assert (w16["n_fit"], w16["tokens_kept"]) == (3, 15)
    assert w16["frac_fit"] == 1.0 and w16["token_coverage"] == 1.0
