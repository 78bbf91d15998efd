"""Hand-computed fixtures for the transcript-curation audits:
conv.echo_stats, conv.stuck_loops, arena.length_bias. DuckDB oracle
parity for the corresponding registered queries (conv_echo_stats,
conv_stuck_loops, arena_length_bias) runs in test_oracle_parity.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _rows(df):
    return {r[0]: r.asDict() for r in df.collect()}


def test_echo_stats_hand_computed(spark):
    from sparkfeat.conv import echo_stats

    data = [
        ("c1", 0, "user", "hello world", None),
        ("c1", 1, "assistant", "hello world", None),
        ("c1", 2, "user", "what is up", None),
        ("c1", 3, "assistant", "up is fine", None),
        ("c2", 0, "assistant", "solo", None),
    ]
    df = spark.createDataFrame(
        data, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    out = _rows(echo_stats(df))
    # c2's only assistant turn is the opener (no prior turn) -> excluded.
    assert set(out) == {"c1"}
    r = out["c1"]
    assert r["n_responses"] == 2
    # turn 1 echoes the user verbatim (echo 1.0); turn 3 shares 2 of its
    # 3 distinct tokens with turn 2 (2/3).
    assert r["max_echo"] == 1.0
    assert r["n_full_echo"] == 1
    assert r["mean_echo"] == pytest.approx(round((1.0 + 2.0 / 3.0) / 2, 6))


def test_echo_stats_null_and_repeat_tokens(spark):
    from sparkfeat.conv import echo_stats

    data = [
        ("c1", 0, "user", "go go go stop", None),
        ("c1", 1, "assistant", "go go", None),  # distinct {go} ⊆ prev
        ("c1", 2, "user", None, None),
        ("c1", 3, "assistant", "anything", None),  # prev text null -> skip
    ]
    df = spark.createDataFrame(
        data, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    r = _rows(echo_stats(df))["c1"]
    # only turn 1 qualifies; duplicates collapse before the ratio.
    assert r["n_responses"] == 1
    assert r["mean_echo"] == 1.0
    assert r["n_full_echo"] == 1


def test_stuck_loops_hand_computed(spark):
    from sparkfeat.conv import stuck_loops

    data = [
        ("c1", 0, "user", "a", None),
        ("c1", 1, "user", "a", None),
        ("c1", 2, "user", "a", None),
        ("c1", 3, "assistant", "a", None),
        ("c1", 4, "assistant", "a", "retry"),
        ("c1", 5, "assistant", "a", "retry"),
        ("c2", 0, "user", "x", None),
    ]
    df = spark.createDataFrame(
        data, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    out = _rows(stuck_loops(df))
    r1 = out["c1"]
    # blocks: [0,1,2] identical, [3] role flip, [4,5] tool flip then repeat.
    assert r1["n_turns"] == 6
    assert r1["n_repeated_turns"] == 3
    assert r1["max_loop_len"] == 3
    assert r1["loop_frac"] == 0.5
    r2 = out["c2"]
    assert (r2["n_turns"], r2["n_repeated_turns"], r2["max_loop_len"]) == (1, 0, 1)
    assert r2["loop_frac"] == 0.0


def test_stuck_loops_null_safe_fields(spark):
    from sparkfeat.conv import stuck_loops

    # null tool == null tool must count as identical (eqNullSafe), and a
    # null text never matches a non-null one.
    data = [
        ("c1", 0, "tool", None, "search"),
        ("c1", 1, "tool", None, "search"),
        ("c1", 2, "tool", "out", "search"),
    ]
    df = spark.createDataFrame(
        data, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    r = _rows(stuck_loops(df))["c1"]
    assert r["n_repeated_turns"] == 1
    assert r["max_loop_len"] == 2


def test_length_bias_hand_computed(spark):
    import math

    from sparkfeat.arena import length_bias

    data = [
        (10, 5),  # longer wins
        (3, 6),  # shorter wins
        (4, 4),  # length tie
        (7, None),  # dropped
        (0, 2),  # dropped (non-positive)
    ]
    df = spark.createDataFrame(data, "winner_len int, loser_len int")
    r = length_bias(df).collect()[0].asDict()
    assert r["n_judgments"] == 3
    assert (r["n_longer_wins"], r["n_shorter_wins"], r["n_length_ties"]) == (1, 1, 1)
    assert r["longer_win_rate"] == 0.5
    assert r["bias_z"] == 0.0
    # ln2 + ln(1/2) + ln1 = 0
    assert r["mean_log_ratio"] == 0.0

    biased = spark.createDataFrame([(5, 2), (9, 1)], "winner_len int, loser_len int")
    b = length_bias(biased).collect()[0].asDict()
    assert b["longer_win_rate"] == 1.0
    # sign-test z for 2/2 successes: (1.0 - 0.5) * 2 * sqrt(2) = sqrt(2)
    assert b["bias_z"] == pytest.approx(round(math.sqrt(2.0), 6))
    assert b["mean_log_ratio"] == pytest.approx(
        round((math.log(2.5) + math.log(9.0)) / 2, 6)
    )


def test_echo_stats_single_exchange_plan(spark):
    """The lag window and the per-conversation fold must share ONE
    hash(conv_id) exchange — the house scale-shape for every
    transcript operator."""
    from sparkfeat.conv import echo_stats
    from sparkfeat.schema import synth_transcripts

    plan = echo_stats(
        synth_transcripts(spark, n_convs=4, turns_per_conv=[6, 6, 6, 6], seed=3)
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 1


def test_truncate_context_hand_computed(spark):
    from sparkfeat.conv import truncate_context

    # token counts: t0=3, t1=2, t2=2, t3=2 -> suffixes: t3=2, t2=4,
    # t1=6, t0=9. budget 6: kept tail = t1..t3; opener pinned.
    data = [
        ("c1", 0, "user", "a b c", None),
        ("c1", 1, "assistant", "d e", None),
        ("c1", 2, "user", "f g", None),
        ("c1", 3, "assistant", "h i", None),
    ]
    df = spark.createDataFrame(
        data, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    out = {
        r["turn_idx"]: r.asDict()
        for r in truncate_context(df, max_tokens=6).collect()
    }
    assert set(out) == {0, 1, 2, 3}
    assert out[0]["pinned_head"] and out[0]["suffix_tokens"] == 9
    assert not out[1]["pinned_head"] and out[1]["suffix_tokens"] == 6
    # budget 3: only t3 fits; opener still pinned.
    out3 = {
        r["turn_idx"]: r.asDict()
        for r in truncate_context(df, max_tokens=3).collect()
    }
    assert set(out3) == {0, 3}
    assert out3[0]["pinned_head"]
    # keep_first=False drops the over-budget opener.
    out_nf = {
        r["turn_idx"]
        for r in truncate_context(df, max_tokens=3, keep_first=False).collect()
    }
    assert out_nf == {3}
    # a fitting conversation is passed through whole, nothing pinned.
    fit = truncate_context(df, max_tokens=100).collect()
    assert len(fit) == 4 and not any(r["pinned_head"] for r in fit)


def test_shared_openers_hand_computed(spark):
    from sparkfeat.conv import shared_openers

    data = [
        ("c1", 0, "user", "reset my password", None),
        ("c1", 1, "assistant", "ok", None),
        ("c2", 0, "tool", "boot", None),
        ("c2", 1, "user", "reset my password", None),
        ("c3", 0, "user", "unique question", None),
        ("c4", 0, "user", "reset my password", None),
        ("c5", 0, "assistant", "no user turn here", None),
    ]
    df = spark.createDataFrame(
        data, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    rows = shared_openers(df).collect()
    # one template group: c1/c2/c4 share the opener; c3 is unique,
    # c5 has no user turn.
    assert len(rows) == 1
    r = rows[0].asDict()
    assert r["opener_text"] == "reset my password"
    assert r["n_convs"] == 3
    assert r["sample_conv"] == "c1"
    assert len(r["opener_fp"]) == 32


def test_ngram_diversity_hand_computed(spark):
    from sparkfeat.text import ngram_diversity

    df = spark.createDataFrame(
        [("s1", "a b c"), ("s1", "a b"), ("s2", "x")],
        "source string, text string",
    )
    rows = {
        (r["source"], r["n"]): r.asDict()
        for r in ngram_diversity(df, max_n=3).collect()
    }
    # s1 unigrams: a,b,c,a,b; bigrams: "a b","b c","a b"; trigram: "a b c"
    assert rows[("s1", 1)]["total_grams"] == 5
    assert rows[("s1", 1)]["distinct_grams"] == 3
    assert rows[("s1", 1)]["distinct_ratio"] == 0.6
    assert rows[("s1", 2)]["total_grams"] == 3
    assert rows[("s1", 2)]["distinct_grams"] == 2
    assert rows[("s1", 2)]["distinct_ratio"] == pytest.approx(0.666667)
    assert rows[("s1", 3)]["total_grams"] == 1
    assert rows[("s1", 3)]["distinct_ratio"] == 1.0
    # s2 has one token: only the n=1 row exists.
    assert rows[("s2", 1)]["total_grams"] == 1
    assert ("s2", 2) not in rows and ("s2", 3) not in rows
    assert len(rows) == 4


def test_ngram_diversity_single_explode_plan(spark):
    """All three gram lattices must ride ONE Generate (explode) over
    one scan — tagging n in-row, not a union of three explodes."""
    from sparkfeat.text import ngram_diversity

    df = spark.createDataFrame([("s1", "a b c d")], "source string, text string")
    plan = ngram_diversity(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate explode") == 1, plan


def test_zipf_fit_hand_computed(spark):
    import numpy as np

    from sparkfeat.text import zipf_fit

    df = spark.createDataFrame(
        [("s1", "a a a a b b c"), ("flat", "z"), ("tie", "b a")],
        "source string, text string",
    )
    rows = {r["source"]: r.asDict() for r in zipf_fit(df, k=100).collect()}
    r = rows["s1"]
    assert (r["top_term"], r["top_freq"], r["n_ranks"]) == ("a", 4, 3)
    x = np.log10([1.0, 2.0, 3.0])
    y = np.log10([4.0, 2.0, 1.0])
    slope = np.polyfit(x, y, 1)[0]
    r2 = np.corrcoef(x, y)[0, 1] ** 2
    assert r["zipf_slope"] == pytest.approx(round(float(slope), 6), abs=1e-6)
    assert r["zipf_r2"] == pytest.approx(round(float(r2), 6), abs=1e-6)
    # single-rank source: variance undefined -> NULLs, not crashes.
    f = rows["flat"]
    assert f["n_ranks"] == 1 and f["zipf_slope"] is None and f["zipf_r2"] is None
    # equal frequencies: rank 1 goes to the lexicographically smaller term.
    assert rows["tie"]["top_term"] == "a"


def test_langid_agreement_hand_computed(spark):
    from sparkfeat.text import langid_agreement

    en = (
        "she walked through the garden while the children were playing "
        "with their small wooden toys near the old stone wall"
    )
    de = (
        "sie ging durch den garten während die kinder mit ihren kleinen "
        "holzspielzeugen neben der alten steinmauer spielten"
    )
    junk = "zzqx vvk pffft 12398"
    data = [
        (0, en, "en", "s1"),  # detected en, label en -> match
        (1, de, "en", "s1"),  # detected de, label en -> mismatch
        (2, junk, "en", "s1"),  # unknown -> excluded from agreement
        (3, en, "en", "s2"),  # clean source
    ]
    df = spark.createDataFrame(
        data, "doc_id long, text string, lang string, source string"
    )
    rows = {r["source"]: r.asDict() for r in langid_agreement(df).collect()}
    s1 = rows["s1"]
    assert (s1["n_docs"], s1["n_detected"], s1["n_match"]) == (3, 2, 1)
    assert s1["agreement"] == 0.5
    assert s1["unknown_rate"] == pytest.approx(round(1 / 3, 6))
    s2 = rows["s2"]
    assert s2["agreement"] == 1.0 and s2["unknown_rate"] == 0.0


def test_curation_audit_invariants_on_synth(spark):
    """Structural invariants on a seeded synthetic corpus — the property
    net under the hand-computed fixtures."""
    from sparkfeat.conv import echo_stats, stuck_loops, truncate_context
    from sparkfeat.schema import synth_transcripts

    t = synth_transcripts(
        spark, n_convs=8, turns_per_conv=[1, 2, 7, 13, 30, 30, 50, 90], seed=5
    ).cache()
    n_in = t.count()

    for r in echo_stats(t).collect():
        assert 0.0 <= r["mean_echo"] <= 1.0
        assert 0.0 <= r["max_echo"] <= 1.0
        assert r["mean_echo"] <= r["max_echo"] + 1e-9
        assert 0 <= r["n_full_echo"] <= r["n_responses"]

    loops = stuck_loops(t).collect()
    assert sum(r["n_turns"] for r in loops) == n_in
    for r in loops:
        assert 1 <= r["max_loop_len"] <= r["n_turns"]
        assert 0 <= r["n_repeated_turns"] < r["n_turns"] or r["n_turns"] == 0
        assert r["loop_frac"] <= (r["n_turns"] - 1) / r["n_turns"] + 1e-9

    for budget in (0, 7, 40, 10_000):
        kept = truncate_context(t, max_tokens=budget)
        rows = kept.collect()
        assert len(rows) <= n_in
        by_conv = {}
        for r in rows:
            by_conv.setdefault(r["conv_id"], []).append(r)
        src_counts = {
            r["conv_id"]: r["cnt"]
            for r in t.groupBy("conv_id").agg(F.count(F.lit(1)).alias("cnt")).collect()
        }
        for conv, rs in by_conv.items():
            rs.sort(key=lambda r: r["turn_idx"])
            tail = [r for r in rs if not r["pinned_head"]]
            # unpinned survivors fit the budget and form a contiguous tail.
            n_src = src_counts[conv]
            if tail:
                assert all(r["suffix_tokens"] <= budget for r in tail)
                idxs = [r["turn_idx"] for r in tail]
                assert idxs == list(range(idxs[0], idxs[0] + len(idxs)))
                assert idxs[-1] == n_src - 1
            for r in rs:
                if r["pinned_head"]:
                    assert r["turn_idx"] == 0 and r["suffix_tokens"] > budget
            # every conversation retains its opener (pinned or fitting).
            assert rs[0]["turn_idx"] == 0


def test_corpus_stat_invariants_on_docs(spark, sf_dir):
    from sparkfeat.text import ngram_diversity, zipf_fit

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for r in ngram_diversity(docs, max_n=3).collect():
        assert 1 <= r["distinct_grams"] <= r["total_grams"]
        assert 0.0 < r["distinct_ratio"] <= 1.0
    for r in zipf_fit(docs, k=50).collect():
        assert 1 <= r["n_ranks"] <= 50
        assert r["top_freq"] >= 1
        if r["zipf_slope"] is not None:
            # frequency is non-increasing in rank, so the OLS slope of
            # log f on log rank can never be positive.
            assert r["zipf_slope"] <= 0.0
            assert 0.0 <= r["zipf_r2"] <= 1.0


# ------------------------------------------------------- expectations


def test_expectations_audit_every_rule_kind(spark):
    """One synthetic table with a planted violation per rule kind; the
    gate must localize each violation to its own rule row with exact
    counts, and pass the clean rules."""
    from sparkfeat.audit import expectations_audit

    rows = [
        # (id, ent, ord, val, name, cat)
        (1, "a", 0, 1.0, "x1", "good"),
        (2, "a", 1, 2.0, None, "good"),      # name null -> not_null viol
        (3, "a", 2, -5.0, "x3", "good"),     # val < 0 -> range viol
        (4, "b", 0, 3.0, "x4", "weird"),     # cat not allowed
        (5, "b", 1, 4.0, "4x", "good"),      # name fails regex
        (5, "b", 2, 5.0, "x6", "good"),      # id 5 repeated -> unique viol
        (6, "c", 0, 6.0, "x7", "good"),
        (7, "c", 1, 5.5, "x8", "good"),      # val decreases within c -> mono viol
    ]
    df = spark.createDataFrame(
        rows, "id long, ent string, ord int, val double, name string, cat string"
    )
    rules = [
        {"name": "name_not_null", "type": "not_null", "col": "name"},
        {"name": "val_range", "type": "range", "col": "val", "min": 0.0},
        {"name": "cat_allowed", "type": "allowed", "col": "cat", "values": ["good"]},
        {"name": "name_regex", "type": "regex", "col": "name", "pattern": "^x[0-9]+$"},
        {"name": "val_mono", "type": "monotonic", "col": "val", "by": "ent", "order": "ord"},
        {"name": "id_unique", "type": "unique", "cols": ["id"]},
    ]
    got = {r["rule"]: r.asDict() for r in expectations_audit(df, rules).collect()}
    assert got["name_not_null"]["n_violations"] == 1
    assert got["val_range"]["n_violations"] == 1  # NULL-safe: only -5.0
    assert got["cat_allowed"]["n_violations"] == 1
    # regex: '4x' fails AND the null name fails (null never matches)
    assert got["name_regex"]["n_violations"] == 2
    # monotonic checks rows with a predecessor: 8 rows - 3 entity openers;
    # violations: -5.0 after 2.0 in ent a (the range row trips this rule
    # too) and 5.5 after 6.0 in ent c
    assert got["val_mono"]["n_checked"] == 5
    assert got["val_mono"]["n_violations"] == 2
    assert got["id_unique"]["n_checked"] == 7  # distinct ids
    assert got["id_unique"]["n_violations"] == 1  # one duplicate row
    assert not got["id_unique"]["passed"]
    assert all(
        not got[r]["passed"] for r in got
    )  # every rule here has a planted violation
    # rates are exact
    assert got["val_mono"]["violation_rate"] == pytest.approx(0.4)


def test_expectations_audit_clean_table_passes(spark):
    from sparkfeat.audit import expectations_audit

    df = spark.createDataFrame(
        [(i, "e", i, float(i)) for i in range(10)],
        "id long, ent string, ord int, val double",
    )
    rules = [
        {"name": "val_nn", "type": "not_null", "col": "val"},
        {"name": "rng", "type": "range", "col": "val", "min": 0.0, "max": 100.0},
        {"name": "mono", "type": "monotonic", "col": "val", "by": "ent", "order": "ord"},
        {"name": "uq", "type": "unique", "cols": ["id"]},
    ]
    rows = expectations_audit(df, rules).collect()
    assert len(rows) == 4
    assert all(r["passed"] for r in rows)
    assert all(r["n_violations"] == 0 for r in rows)


def test_expectations_unknown_rule_raises(spark):
    from sparkfeat.audit import expectations_audit

    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="unknown expectation"):
        expectations_audit(df, [{"type": "nope", "col": "id"}]).collect()


# --------------------------------------------------------- DP release


def test_dp_release_laplace_mechanism_properties(spark):
    """The hash-derived Laplace draws must actually look Laplace(b):
    over ~500 cells, mean |noise| ≈ b, sign split ≈ 50/50; release is
    clamped at 0 and integer; determinism + seed sensitivity; larger
    epsilon -> smaller noise on the SAME cells."""
    from sparkfeat.audit import dp_release_counts

    df = spark.createDataFrame(
        [(i % 500, "x") for i in range(2000)], "g int, v string"
    )
    out1 = dp_release_counts(df, ["g"], epsilon=1.0, seed="s").collect()
    out2 = dp_release_counts(df, ["g"], epsilon=1.0, seed="s").collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    noises = [r["noise"] for r in out1]
    assert len(noises) == 500
    mean_abs = sum(abs(x) for x in noises) / len(noises)
    assert 0.8 <= mean_abs <= 1.25  # E|Laplace(1)| = b = 1
    pos = sum(1 for x in noises if x > 0)
    assert 200 <= pos <= 300
    assert all(r["n_released"] >= 0 for r in out1)
    assert all(isinstance(r["n_released"], int) for r in out1)
    # epsilon scaling: same u draws, scale b halves at epsilon=2
    out_eps2 = {
        r["g"]: r["noise"]
        for r in dp_release_counts(df, ["g"], epsilon=2.0, seed="s").collect()
    }
    n1 = {r["g"]: r["noise"] for r in out1}
    for g in n1:
        assert out_eps2[g] == pytest.approx(n1[g] / 2.0, abs=2e-6)
    # a different seed re-draws
    out_s2 = {
        r["g"]: r["noise"]
        for r in dp_release_counts(df, ["g"], epsilon=1.0, seed="t").collect()
    }
    assert any(out_s2[g] != n1[g] for g in n1)


def test_dp_release_true_count_preserved_for_audit(spark):
    from sparkfeat.audit import dp_release_counts

    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "g int, v string"
    )
    got = {r["g"]: r.asDict() for r in dp_release_counts(df, ["g"]).collect()}
    assert got[1]["n_true"] == 2 and got[2]["n_true"] == 1
    assert got[1]["noise_scale"] == 1.0 and got[1]["epsilon"] == 1.0
