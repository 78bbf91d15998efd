"""Reward-based curation for RL-style training data: turn a table of
(prompt-group, candidate, scalar reward) rows into the two artifacts
an RLHF/RLVR pipeline actually trains on — group-normalized
ADVANTAGES (GRPO, Shao et al. 2024 "DeepSeekMath", eq. 3; or the
leave-one-out baseline of RLOO, Ahmadian et al. 2024) and the
BEST-OF-N keep-list (rejection sampling / BoN distillation, the
Llama-2 and WebGPT curation step).

Sits beside :mod:`sparkfeat.conv` (mines DPO pairs from transcript
structure) and :mod:`sparkfeat.arena` (global strengths from pairwise
judgments): this module consumes POINTWISE scalar rewards, the third
judgment modality.

Scale shape: both operators are one window (or one map-side-combined
aggregate + broadcast-back join) partitioned by the prompt group —
group cardinality is the number of sampled candidates per prompt
(4–64 in practice), so no group ever strains a window partition and
the only corpus-sized movement is the single hash exchange on
``group_col``. No collect, no driver math; everything closed-form
column algebra (the sqrt is IEEE-correctly-rounded; outputs 6
dp-canonicalized for cross-engine replay).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_advantages(
    rewards: DataFrame,
    group_col: str = "group_id",
    cand_col: str = "cand_id",
    reward_col: str = "reward",
    method: str = "grpo",
    eps: float = 1e-6,
) -> DataFrame:
    """Per-candidate advantage from group-relative reward
    normalization, one hash exchange on ``group_col``.

    ``method='grpo'``: ``A_i = (r_i − mean_g) / (std_g + eps)`` with
    the POPULATION std (the group IS the whole sample the policy
    update sees — no hidden-population inference; a degenerate group
    whose rewards are all equal gets A = 0 via the eps floor, matching
    the GRPO implementations' behavior rather than emitting NaN).

    ``method='rloo'``: ``A_i = r_i − (sum_g − r_i) / (n_g − 1)`` — the
    unbiased leave-one-out baseline; singleton groups have no
    leave-one-out baseline and yield NULL (callers drop or fall back).

    Rows with NULL reward are dropped (an unscored candidate
    contributes nothing to the baseline and cannot be trained on).
    Output: input key columns + ``(n_g, mean_g, advantage)``, floats 6
    dp-canonicalized. Variance is computed as ``E[r²] − mean²``
    clamped at 0 (exact-cancellation guard) from ONE window pass —
    count/sum/sum-of-squares are all map-side-combinable if the plan
    is rewritten to groupBy+join, but the window form keeps the row
    set intact without a join and the partition is candidate-bounded.
    """
    if method not in ("grpo", "rloo"):
        raise ValueError(f"unknown method {method!r}")
    w = Window.partitionBy(group_col)
    r = F.col(reward_col).cast("double")
    base = rewards.filter(r.isNotNull()).select(
        group_col, cand_col, r.alias("_r")
    )
    n = F.count(F.lit(1)).over(w)
    s = F.sum("_r").over(w)
    mean = s / n
    if method == "grpo":
        var = F.greatest(
            F.sum(F.col("_r") * F.col("_r")).over(w) / n - mean * mean,
            F.lit(0.0),
        )
        adv = (F.col("_r") - mean) / (F.sqrt(var) + F.lit(float(eps)))
    else:
        adv = F.when(
            n > 1, F.col("_r") - (s - F.col("_r")) / (n - F.lit(1))
        )
    return base.select(
        group_col,
        cand_col,
        F.round("_r", 6).alias("reward"),
        n.cast("int").alias("n_g"),
        F.round(mean, 6).alias("mean_g"),
        F.round(adv, 6).alias("advantage"),
    )


def best_of_n(
    rewards: DataFrame,
    k: int = 1,
    group_col: str = "group_id",
    cand_col: str = "cand_id",
    reward_col: str = "reward",
) -> DataFrame:
    """Rejection-sampling keep-list: the top-``k`` candidates per
    prompt group by reward, ties broken by ``cand_col`` ascending so
    the selection replays bit-for-bit anywhere. NULL-reward rows can
    never win and are dropped. Output adds ``bon_rank`` (1 = best).

    One window on the candidate-bounded group partition — the BoN
    distillation extractor (keep the best sampled response per prompt
    as an SFT target) and, at k > 1, the "train on the top quartile"
    rejection-sampling variant.
    """
    w = Window.partitionBy(group_col).orderBy(
        F.col("_r").desc(), F.col(cand_col).asc()
    )
    r = F.col(reward_col).cast("double")
    return (
        rewards.filter(r.isNotNull())
        .select(group_col, cand_col, r.alias("_r"))
        .withColumn("bon_rank", F.row_number().over(w))
        .filter(F.col("bon_rank") <= k)
        .select(
            group_col,
            cand_col,
            F.round("_r", 6).alias("reward"),
            F.col("bon_rank").cast("int").alias("bon_rank"),
        )
    )


def nstep_returns(
    df: DataFrame,
    entity_col: str = "conv_id",
    order_col: str = "turn_idx",
    reward_col: str = "reward",
    horizon: int = 8,
    gamma: float = 0.97,
    nd: int = 6,
) -> DataFrame:
    """Per-turn N-step discounted return — the VALUE TARGET an offline
    RL pipeline trains on over agent transcripts: ``G_t = Σ_{j<H}
    γʲ·r_{t+j}`` (TD(n) with a hard horizon). The bounded horizon is
    the deliberate design point at transcript scale: the infinite-
    horizon recursion ``G_t = r_t + γ·G_{t+1}`` needs a reverse
    sequential scan whose ``γ^t`` rescaling under/overflows on
    10⁵-turn conversations, while the H-step form is an EXACT bounded
    window — per-row state O(H), no recurrence, no Python — and for
    γ^H ≪ 1 (0.97⁸ ≈ 0.78... pick H so γ^H is your truncation
    tolerance) it approximates the infinite sum with a known bound
    (tail ≤ γ^H·r_max/(1−γ), reported per row as ``n_terms`` so
    truncated tail rows are self-describing).

    Output: input keys + ``reward``, ``n_terms`` (how many future
    turns actually existed, ≤ H — end-of-episode rows truncate
    honestly), ``return_n`` (6 dp). Discount powers come from a
    LITERAL array (``element_at`` on relative position), so every
    γʲ is the same double in any engine — the oracle replays the
    exact sum order (window order = ascending j).

    Scale shape: ONE hash exchange on the conversation key (zero on
    the bucketed table), one ordered window with a ``rowsBetween(0,
    H-1)`` frame collecting (relative-rank, reward) structs, and a
    per-row ``aggregate`` fold over ≤ H elements. No UDFs, no
    collect.
    """
    from pyspark.sql import Window

    powers = F.array(*[F.lit(float(gamma**j)) for j in range(horizon)])
    w = Window.partitionBy(entity_col).orderBy(order_col)
    frame = w.rowsBetween(Window.currentRow, horizon - 1)
    base = df.select(
        F.col(entity_col),
        F.col(order_col),
        F.col(reward_col).cast("double").alias("_r"),
    ).withColumn("_rn", F.row_number().over(w))
    fut = F.collect_list(F.struct(F.col("_rn").alias("j"), F.col("_r").alias("r"))).over(
        frame
    )
    g = F.aggregate(
        F.col("_fut"),
        F.lit(0.0),
        lambda acc, x: acc
        + x["r"] * F.element_at(powers, (x["j"] - F.col("_rn") + 1).cast("int")),
    )
    return (
        base.withColumn("_fut", fut)
        .select(
            entity_col,
            order_col,
            (F.round(F.col("_r"), nd) + F.lit(0.0)).alias("reward"),
            F.size("_fut").cast("int").alias("n_terms"),
            (F.round(g, nd) + F.lit(0.0)).alias("return_n"),
        )
    )
