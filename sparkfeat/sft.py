"""Transcript → supervised-fine-tuning training pairs.

The endpoint of the whole transcript pipeline: turn multi-turn
conversations into (prompt, response) examples, one per assistant turn,
where the prompt is the most recent prior context that fits a token
budget. This is the operator a training-data team runs right before
packing (`corpus.pack_sequences`) — it is transcript-native (uses the
`conv_id`/`turn_idx`/`role` data model from `schema.py`), leakage-safe
by construction (the context frame ends at `turn_idx - 1`; nothing at
or after the response turn can enter the prompt — the same invariant
`audit.leakage_audit` checks for numeric features), and deterministic.

Budgeting semantics (both knobs explicit so the per-row cost is bounded
by construction):

* ``token_budget`` — a prior turn enters the context iff the WHOLE
  suffix from it through ``turn_idx - 1`` fits the budget, i.e. turns
  are taken newest-first and a turn that would overflow the budget cuts
  the context there (classic left-truncation, whole turns only).
* ``max_context_turns`` — hard cap on how many prior turns are even
  considered (the window frame is ``rowsBetween(-max_context_turns,
  -1)``), which bounds the per-row collected array regardless of how
  degenerate the token counts are.

Scale shape: ONE hash exchange on ``conv_id`` (the same partitioning
every other transcript operator uses, so on the bucketed/Iceberg table
it is shuffle-free), then pure expression work. Per-row memory is
O(max_context_turns) structs — a bounded window, the exact pattern
`windows.chunked_bounded_windows` documents for skewed conversations.
Suffix token sums come from ONE cumulative sum + ``lag`` (prefix-sum
trick: tokens(j..t-1) = S(t-1) - S(j-1), so the filter inside the
collected frame is a per-element comparison, not a nested re-scan).

No reference counterpart (`/root/reference` is numeric-only; SURVEY.md
§2 ends at feature vectors) — this extends the engine toward the
LLM-training-data pipeline the north star describes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sft_pairs", "loss_mask_spans"]


def sft_pairs(
    df: DataFrame,
    token_budget: int = 64,
    max_context_turns: int = 16,
    response_role: str = "assistant",
) -> DataFrame:
    """Extract one (prompt, response) pair per ``response_role`` turn.

    Output: ``conv_id, turn_idx, prompt, response, n_context_turns,
    context_tokens, response_tokens`` — ``prompt`` is the kept prior
    turns rendered ``"role: text"`` joined by newlines in turn order
    (empty string when no prior turn fits, e.g. the conversation
    opener), ``context_tokens`` the whitespace-token total of the kept
    turns.

    Tokens are whitespace counts (``size(split(text, ' '))``), the same
    cheap estimator `schema.with_turn_signals` uses; swap in
    `bpe.bpe_encode` lengths upstream for tokenizer-exact budgeting.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    # null-safe: a null text counts as 0 tokens (size(split(null)) is -1,
    # which would break the prefix-sum monotonicity the budget cut relies
    # on). Non-null text is always >= 1 token, so S is non-decreasing and
    # the budget filter always keeps a CONTIGUOUS newest-first suffix.
    tok = F.coalesce(
        F.size(F.split(F.col("text"), " ")), F.lit(-1)
    ).cast("bigint")
    tok = F.greatest(tok, F.lit(0).cast("bigint"))

    base = df.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        tok.alias("_tok"),
    ).withColumn(
        # S(t) = tokens of turns 0..t; S(t-1) via lag, 0 at the opener.
        "_prev_cum",
        F.coalesce(
            F.lag(
                F.sum("_tok").over(
                    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                ),
                1,
            ).over(w),
            F.lit(0),
        ),
    )

    ctx_frame = w.rowsBetween(-max_context_turns, -1)
    ctx = F.collect_list(
        F.struct(
            F.col("turn_idx").alias("ti"),
            F.col("role").alias("role"),
            F.col("text").alias("text"),
            F.col("_tok").alias("tok"),
            F.col("_prev_cum").alias("pc"),
        )
    ).over(ctx_frame)

    # turn j (with prefix S(j-1) = pc) fits iff tokens(j..t-1)
    # = S(t-1) - S(j-1) <= budget  ⟺  pc >= S(t-1) - budget.
    cutoff = F.col("_prev_cum") - F.lit(token_budget)
    kept = F.filter(F.col("_ctx"), lambda x: x["pc"] >= cutoff)

    out = (
        base.withColumn("_ctx", ctx)
        .where(F.col("role") == response_role)
        .withColumn("_kept", kept)
        .select(
            "conv_id",
            "turn_idx",
            F.array_join(
                F.transform(
                    F.col("_kept"),
                    lambda x: F.concat_ws(": ", x["role"], x["text"]),
                ),
                "\n",
            ).alias("prompt"),
            F.col("text").alias("response"),
            F.size("_kept").cast("bigint").alias("n_context_turns"),
            F.aggregate(
                F.col("_kept"), F.lit(0).cast("bigint"), lambda a, x: a + x["tok"]
            ).alias("context_tokens"),
            F.col("_tok").alias("response_tokens"),
        )
    )
    return out


def loss_mask_spans(
    examples: DataFrame,
    budget: int = 128,
    id_col: str = "example_id",
    prompt_col: str = "prompt",
    response_col: str = "response",
    block: int = 4096,
) -> DataFrame:
    """Trainable-span manifest for packed SFT sequences — the LOSS MASK
    the sample-writer needs next to `corpus.pack_sequences`' layout:
    SFT trains only on response tokens, so every packed sequence needs
    the token ranges whose loss is kept (everything else — prompts,
    and the tail of a truncated example — is masked).

    Each example renders ``prompt ⏎ response`` (the sft_pack_manifest
    layout) and its RESPONSE occupies the last ``r`` tokens of the
    rendered example, where ``r`` is the whitespace token count of the
    response alone — defining the span from the END sidesteps the
    empty-prompt tokenization quirk (an empty prompt still contributes
    a leading empty split token to the rendered count). An example may
    cross sequence boundaries (concat-then-chunk packing), so its
    response span is CLIPPED per sequence: one output row per
    (example, sequence) intersection —

    ``(example_id, seq_id, mask_start, mask_end, n_trainable)``

    with ``mask_start``/``mask_end`` token positions INSIDE the
    sequence (end exclusive) and ``n_trainable`` the row's span width.
    A writer materializing sequence ``s`` keeps loss exactly on the
    union of that sequence's spans. Examples with an empty response
    emit no row. All index math is exact bigint (no 2^53 ceiling).

    Scale shape: `pack_sequences`' two-level distributed prefix sum
    (no single-task window, no driver collect) + ONE equi-join back to
    the example table on ``id_col`` + a per-example `sequence()`
    explode bounded by ceil(example_tokens / budget) — linear in
    corpus tokens, and the explode fans out only for examples longer
    than a sequence. No UDFs.
    """
    from sparkfeat.corpus import pack_sequences

    rendered = examples.select(
        F.col(id_col),
        F.concat_ws("\n", F.col(prompt_col), F.col(response_col)).alias("_ex"),
        F.size(F.split(F.col(response_col), r"\s+")).cast("bigint").alias("_r"),
    )
    packed = pack_sequences(
        rendered.select(id_col, "_ex"), budget=budget, text_col="_ex", id_col=id_col
    )
    j = packed.join(rendered.select(id_col, "_r"), id_col)
    start = F.col("tok_start") + F.col("n_tok") - F.col("_r")
    end = F.col("tok_start") + F.col("n_tok")
    # bigint floor-div via SQL div (start/end are non-negative)
    j = j.select(
        F.col(id_col),
        start.alias("_s"),
        end.alias("_e"),
    ).where(F.col("_e") > F.col("_s"))
    j = j.withColumn("_slo", F.expr(f"_s div {budget}")).withColumn(
        "_shi", F.expr(f"(_e - 1) div {budget}")
    )
    out = j.select(
        F.col(id_col),
        "_s",
        "_e",
        F.explode(F.sequence(F.col("_slo"), F.col("_shi"))).alias("seq_id"),
    )
    mask_start = F.greatest(F.col("_s"), F.col("seq_id") * budget) - F.col(
        "seq_id"
    ) * budget
    mask_end = F.least(F.col("_e"), (F.col("seq_id") + 1) * budget) - F.col(
        "seq_id"
    ) * budget
    return out.select(
        F.col(id_col),
        F.col("seq_id").cast("bigint").alias("seq_id"),
        mask_start.cast("bigint").alias("mask_start"),
        mask_end.cast("bigint").alias("mask_end"),
        (mask_end - mask_start).cast("bigint").alias("n_trainable"),
    )
