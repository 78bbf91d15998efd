"""Generation-eval metrics over paired texts: corpus-scale BLEU (pure
relational algebra) and ROUGE-L (Arrow LCS kernel).

The preference-pair miner (`sparkfeat.conv.preference_pairs`) emits
(chosen, rejected) response pairs; a DPO batch built from pairs whose
two sides are near-identical lexically carries almost no preference
signal (the gradient of the DPO loss vanishes as the two completions
coincide). The standard screen is a pairwise overlap metric — this
module implements BLEU (Papineni et al. 2002, the n-gram-precision ×
brevity-penalty form) as pure relational algebra, so the screen runs
as one Spark job over billions of pairs.

Semantics (pinned, so the DuckDB oracle can replay them bit-for-bit):

* tokens = lowercase whitespace split, empties dropped (the repo-wide
  tokenizer — `lm.py`, `text.ngram_diversity`, `search.bm25_topk`);
* for n = 1..max_n: ``p_n = clipped_n / (cand_len - n + 1)`` where
  ``clipped_n = Σ_gram min(count_cand, count_ref)`` (the clipped
  modified precision); a zero numerator is floored to ``smooth_eps``
  (Lin & Och smoothing-1; default 0.1) so ``ln`` stays finite;
* brevity penalty ``BP = 1 if cand_len >= ref_len else
  exp(1 - ref_len/cand_len)``;
* ``bleu = BP * exp(mean_n ln p_n)``;
* degenerate pairs — candidate shorter than ``max_n`` tokens or an
  empty reference — score 0.0 exactly (sacrebleu's convention for
  undefined precisions), with ``brevity_penalty`` reported 0.0 so the
  row is self-describing.

Scale shape (the 100 TB lens):

* Both sides' gram lattices (all n, tagged in-row) come out of ONE
  projection each and ONE explode each — gram rows are O(max_n ×
  tokens) per pair, linear in corpus size.
* The only wide operations are two stacked map-side-combinable
  groupBys keyed by (pair, n, gram) then (pair, n): the key CONTAINS
  the pair id, so Zipf-head grams ("the") never concentrate — state
  per reducer is bounded by single-pair gram counts, not corpus
  frequencies (contrast `lm.py`, where corpus-keyed tables need AQE
  skew handling).
* The final assembly is an equi-join of the per-pair aggregate back
  onto the pair spine on the pair key — no window, no collect, no
  cartesian; every stage is plain codegen Column algebra (no UDFs).

No reference counterpart (`/root/reference` has no text operators);
public algorithm, standard smoothing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bleu_pairs", "rouge_l_pairs"]


def _tokens(c):
    return F.filter(F.split(F.lower(F.coalesce(c, F.lit(""))), r"\s+"), lambda x: x != "")


def _gram_structs(tok, n: int):
    """All n-grams of `tok` as (n, gram) structs; empty when too short.

    Grams are built positionally with an `element_at` chain (n is a
    Python int ≤ max_n, so the chain is unrolled at plan-build time —
    stays whole-stage-codegen, no HOF slice)."""
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(tok, i + F.lit(j + 1)) for j in range(n)]
    )
    return F.when(
        F.size(tok) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(tok) - n),
            lambda i: F.struct(
                F.lit(n).alias("n"), gram(i).alias("gram")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<n:int,gram:string>>"))


def bleu_pairs(
    pairs: DataFrame,
    id_cols: tuple[str, ...] = ("conv_id", "retry_idx"),
    cand_col: str = "chosen_text",
    ref_col: str = "rejected_text",
    max_n: int = 4,
    smooth_eps: float = 0.1,
    low_contrast_at: float = 0.5,
    nd: int = 6,
) -> DataFrame:
    """Pairwise BLEU(candidate | reference) for every row of ``pairs``.

    Returns one row per input pair: ``(*id_cols, cand_len, ref_len,
    unigram_prec, brevity_penalty, bleu, low_contrast)`` —
    ``low_contrast`` flags pairs whose BLEU ≥ ``low_contrast_at``
    (the two responses are lexically near-identical; drop or
    down-weight them before DPO training). All doubles rounded to
    ``nd`` dp.
    """
    ids = [F.col(c) for c in id_cols]
    base = pairs.select(
        *ids,
        _tokens(F.col(cand_col)).alias("_ct"),
        _tokens(F.col(ref_col)).alias("_rt"),
    ).select(
        *id_cols,
        "_ct",
        "_rt",
        F.size("_ct").cast("long").alias("cand_len"),
        F.size("_rt").cast("long").alias("ref_len"),
    )

    def side(tok_col: str, is_cand: int) -> DataFrame:
        allg = F.concat(
            *[_gram_structs(F.col(tok_col), n) for n in range(1, max_n + 1)]
        )
        return base.select(
            *id_cols,
            "cand_len",
            F.explode(allg).alias("_g"),
            F.lit(is_cand).alias("_is_cand"),
        ).select(
            *id_cols,
            "cand_len",
            F.col("_g.n").alias("n"),
            F.col("_g.gram").alias("gram"),
            "_is_cand",
        )

    counts = (
        side("_ct", 1)
        .unionByName(side("_rt", 0))
        .groupBy(*id_cols, "n", "gram")
        .agg(
            F.sum(F.when(F.col("_is_cand") == 1, 1).otherwise(0)).alias("_c"),
            F.sum(F.when(F.col("_is_cand") == 0, 1).otherwise(0)).alias("_r"),
            F.first("cand_len").alias("cand_len"),
        )
    )
    per_n = counts.groupBy(*id_cols, "n").agg(
        F.sum(F.least("_c", "_r")).alias("_clip"),
        F.first("cand_len").alias("cand_len"),
    )
    # p_n with the smoothing-1 floor; total_n = cand_len - n + 1. A
    # pair whose candidate is SHORTER than n can still have per-n rows
    # (ref-side grams), where total_n <= 0 — those log terms are nulled
    # (ANSI-safe, no division) and the pair lands in the bleu=0 branch
    # anyway; valid pairs (cand_len >= max_n) have every total_n > 0,
    # so their sum over n is complete.
    total_n = F.col("cand_len") - F.col("n") + 1
    p_n = F.when(F.col("_clip") > 0, F.col("_clip").cast("double")).otherwise(
        F.lit(float(smooth_eps))
    ) / total_n
    per_pair = per_n.groupBy(*id_cols).agg(
        F.sum(F.when(total_n > 0, F.log(p_n))).alias("_logp"),
        F.max(F.when(F.col("n") == 1, F.col("_clip"))).alias("_clip1"),
    )

    out = base.drop("_ct", "_rt").join(per_pair, list(id_cols), "left")
    valid = (F.col("cand_len") >= max_n) & (F.col("ref_len") >= 1)
    bp = F.when(
        F.col("cand_len") >= F.col("ref_len"), F.lit(1.0)
    ).otherwise(F.exp(1 - F.col("ref_len") / F.col("cand_len").cast("double")))
    bleu = F.round(bp * F.exp(F.col("_logp") / max_n), nd) + F.lit(0.0)
    return out.select(
        *id_cols,
        "cand_len",
        "ref_len",
        F.when(
            valid, F.round(F.col("_clip1") / F.col("cand_len"), nd) + F.lit(0.0)
        )
        .otherwise(F.lit(0.0))
        .alias("unigram_prec"),
        F.when(valid, F.round(bp, nd) + F.lit(0.0))
        .otherwise(F.lit(0.0))
        .alias("brevity_penalty"),
        F.when(valid, bleu).otherwise(F.lit(0.0)).alias("bleu"),
        (F.when(valid, bleu).otherwise(F.lit(0.0)) >= low_contrast_at).alias(
            "low_contrast"
        ),
    )


def rouge_l_pairs(
    pairs: DataFrame,
    id_cols: tuple[str, ...] = ("conv_id", "retry_idx"),
    cand_col: str = "chosen_text",
    ref_col: str = "rejected_text",
    max_tokens: int = 512,
    beta: float = 1.0,
    nd: int = 6,
) -> DataFrame:
    """ROUGE-L (Lin 2004) per pair: LCS-based recall/precision/F —
    BLEU's order-sensitive complement (BLEU counts bag-of-ngram
    overlap; ROUGE-L credits only tokens appearing in the SAME ORDER,
    so a shuffled copy scores high BLEU-1 but low ROUGE-L).

    The token LCS is a true dynamic program — not expressible as
    relational algebra — so this is an Arrow-kernel operator (the
    EWMA/lang-ID seam): one `pandas_udf` whose inner DP is
    numpy-vectorized over the reference axis (per candidate token:
    ``c = max(prev[1:], prev[:-1] + match)`` then the running-max
    ``np.maximum.accumulate`` closes the in-row dependency), so the
    Python cost is O(min(len, max_tokens)) numpy ops per pair, not
    O(n·m) interpreted steps. Both sides are CAPPED at ``max_tokens``
    (DP cost is quadratic; a 10⁷-token boilerplate doc must not own a
    task — the text.py bounded-time discipline). The cap is part of
    the metric's definition here and recorded in the column names'
    contract: rouge_r = LCS / min(ref_len, cap) etc.

    Output per pair: ``(*id_cols, cand_len, ref_len, lcs_len,
    rouge_r, rouge_p, rouge_f)`` (lengths pre-cap, LCS over capped
    prefixes; F = (1+β²)·P·R / (R + β²·P), β=1 harmonic default;
    empty/null side → zeros). Scale shape: map-only — the kernel
    fuses into the scan, no shuffle at all; partition-size-bounded
    Arrow batches.
    """
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def _lcs(cand: pd.Series, ref: pd.Series) -> pd.Series:
        out = np.zeros(len(cand), dtype=np.int64)
        for i, (ct, rt) in enumerate(zip(cand, ref)):
            if ct is None or rt is None or len(ct) == 0 or len(rt) == 0:
                continue
            a = ct[:max_tokens]
            b = np.asarray(rt[:max_tokens], dtype=object)
            dp = np.zeros(len(b) + 1, dtype=np.int64)
            for tok in a:
                match = np.asarray(b == tok).astype(np.int64)
                c = np.maximum(dp[1:], dp[:-1] + match)
                dp = np.concatenate(([0], np.maximum.accumulate(c)))
            out[i] = dp[-1]
        return pd.Series(out)

    base = pairs.select(
        *id_cols,
        _tokens(F.col(cand_col)).alias("_ct"),
        _tokens(F.col(ref_col)).alias("_rt"),
    ).select(
        *id_cols,
        F.size("_ct").cast("long").alias("cand_len"),
        F.size("_rt").cast("long").alias("ref_len"),
        _lcs(F.col("_ct"), F.col("_rt")).alias("lcs_len"),
    )
    r = F.col("lcs_len") / F.least(F.col("ref_len"), F.lit(max_tokens))
    p = F.col("lcs_len") / F.least(F.col("cand_len"), F.lit(max_tokens))
    b2 = beta * beta
    f = F.when(
        (F.col("lcs_len") > 0),
        (1.0 + b2) * r * p / (r + b2 * p),
    ).otherwise(F.lit(0.0))
    zero = (F.col("cand_len") == 0) | (F.col("ref_len") == 0)
    r6 = lambda c: F.round(c, nd) + F.lit(0.0)  # noqa: E731
    return base.select(
        *id_cols,
        "cand_len",
        "ref_len",
        "lcs_len",
        r6(F.when(zero, F.lit(0.0)).otherwise(r)).alias("rouge_r"),
        r6(F.when(zero, F.lit(0.0)).otherwise(p)).alias("rouge_p"),
        r6(F.when(zero, F.lit(0.0)).otherwise(f)).alias("rouge_f"),
    )
