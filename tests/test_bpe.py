"""BPE induction: parity with a plain-python reference implementation
(the classic Sennrich dict-of-counts loop), greedy-run merge semantics,
and the lineage-checkpoint contract."""

from __future__ import annotations

from collections import Counter

from sparkfeat.bpe import EOW


def _ref_bpe(texts: list[str], n_merges: int):
    """Classic single-machine BPE with the same tie-break (freq DESC,
    then (a, b) lexicographic) and greedy left-fold merge."""
    wf = Counter(w for t in texts for w in t.lower().split())
    syms = {w: tuple(list(w) + [EOW]) for w in wf}
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, f in wf.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        (a, b), pf = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, pf))
        for w in syms:
            s, out = syms[w], []
            for tok in s:
                if out and out[-1] == a and tok == b:
                    out[-1] = a + b
                else:
                    out.append(tok)
            syms[w] = tuple(out)
    return merges


TEXTS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
]


def test_train_bpe_matches_reference(spark):
    from sparkfeat.bpe import train_bpe

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    assert train_bpe(docs, n_merges=8) == _ref_bpe(TEXTS, 8)


def test_train_bpe_no_checkpoint_same_result(spark):
    from sparkfeat.bpe import train_bpe

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    assert train_bpe(docs, 4, checkpoint=False) == train_bpe(docs, 4)


def test_merge_pair_greedy_runs(spark):
    """x x x under merge (x, x) -> [xx, x], the sequential left-fold —
    never [x, xx] and never a double-consume [xx, xx]."""
    from pyspark.sql import functions as F

    from sparkfeat.bpe import _merge_pair

    syms = spark.createDataFrame(
        [("w", 1, ["x", "x", "x"]), ("v", 1, ["x", "x", "x", "x"])],
        "word string, freq long, syms array<string>",
    )
    got = {r.word: r.syms for r in _merge_pair(syms, "x", "x").collect()}
    assert got["w"] == ["xx", "x"]
    assert got["v"] == ["xx", "xx"]


def test_pair_counts_weighted_by_word_freq(spark):
    from sparkfeat.bpe import bpe_pair_counts

    docs = spark.createDataFrame(
        [(0, "ab ab ab"), (1, "ab")], "doc_id long, text string"
    )
    rows = {(r.a, r.b): r.pair_freq for r in bpe_pair_counts(docs).collect()}
    # 'ab' occurs 4 times -> every pair of its symbol seq weighs 4
    assert rows[("a", "b")] == 4
    assert rows[("b", EOW)] == 4


def test_train_bpe_checkpoint_bounds_plan_depth(spark):
    """With checkpoint=True the per-round rewrite must not stack: the
    symbols table after training is a LogicalRDD scan, not n_merges
    nested projections."""
    from sparkfeat.bpe import _merge_pair, symbolize, word_freqs

    docs = spark.createDataFrame([(0, "aa aa ab")], "doc_id long, text string")
    syms = symbolize(word_freqs(docs)).localCheckpoint(eager=True)
    for _ in range(5):
        syms = _merge_pair(syms, "a", "a").localCheckpoint(eager=True)
    plan = syms._jdf.queryExecution().optimizedPlan().toString()
    assert "aggregate(" not in plan  # rewrite folded away by the checkpoint


def test_bpe_encode_equals_training_order_replay(spark):
    """Rank-priority greedy encode (the Arrow kernel) == applying the
    learned merges in training order (the _merge_pair expr path)."""
    from pyspark.sql import functions as F

    from sparkfeat.bpe import (
        _merge_pair,
        bpe_encode,
        symbolize,
        train_bpe,
        word_freqs,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    merges = train_bpe(docs, n_merges=6)
    got = {
        r.doc_id: r.bpe_tokens for r in bpe_encode(docs, merges).collect()
    }
    # replay in training order on the distinct-word table
    syms = symbolize(word_freqs(docs))
    for a, b, _pf in merges:
        syms = _merge_pair(syms, a, b)
    word_map = {r.word: r.syms for r in syms.collect()}
    for i, t in enumerate(TEXTS):
        want = [s for w in t.lower().split() for s in word_map[w]]
        assert got[i] == want, (i, got[i], want)


def test_bpe_encode_edge_cases(spark):
    from sparkfeat.bpe import bpe_encode

    docs = spark.createDataFrame(
        [(0, "ab ab"), (1, ""), (2, None)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in bpe_encode(docs, [("a", "b")]).collect()}
    assert rows[0].bpe_tokens == ["ab", "</w>", "ab", "</w>"]
    assert rows[1].bpe_tokens == [] and rows[1].n_bpe_tokens == 0
    assert rows[2].bpe_tokens == [] and rows[2].n_bpe_tokens == 0


def test_fertility_stats_hand_computed(spark):
    """No merges: every word of length L costs L+1 syms (chars + EOW);
    one merge changes the token count; nulls cost nothing."""
    from sparkfeat.bpe import EOW, fertility_stats

    docs = spark.createDataFrame(
        [
            (0, "ab c", "s1"),      # words 2, chars 4; no-merge toks (2+1)+(1+1)=5
            (1, None, "s1"),        # 0 everywhere
            (2, "ab ab", "s2"),     # words 2, chars 5; no-merge toks 6
        ],
        "doc_id long, text string, source string",
    )
    out = {
        r.source: r for r in fertility_stats(docs, merges=[]).collect()
    }
    s1 = out["s1"]
    assert (s1.n_docs, s1.n_words, s1.n_bpe_tokens, s1.n_chars) == (2, 2, 5, 4)
    assert s1.fertility == 2.5 and s1.chars_per_token == 0.8
    s2 = out["s2"]
    assert (s2.n_words, s2.n_bpe_tokens) == (2, 6)
    # one merge (a,b) -> "ab" becomes ["ab", EOW]: s2 toks drop 6 -> 4
    out2 = {
        r.source: r
        for r in fertility_stats(docs, merges=[("a", "b")]).collect()
    }
    assert out2["s2"].n_bpe_tokens == 4
    assert out2["s2"].fertility == 2.0


def test_fertility_all_null_group_has_null_ratios(spark):
    from sparkfeat.bpe import fertility_stats

    docs = spark.createDataFrame(
        [(0, None, "empty")], "doc_id long, text string, source string"
    )
    row = fertility_stats(docs, merges=[]).collect()[0]
    assert (row.n_words, row.n_bpe_tokens, row.n_chars) == (0, 0, 0)
    assert row.fertility is None and row.chars_per_token is None
