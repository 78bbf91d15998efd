"""N-gram language-model perplexity scoring + bucketing (CCNet-style).

CCNet (Wenzek et al. 2020, public) ranks web documents by the
perplexity of a small LM and splits the corpus into head/middle/tail
buckets; the tail is dropped or down-sampled. This module is that
operator re-expressed as Spark relational algebra: a bigram LM with
stupid backoff (Brants et al. 2007 — no discounting, a fixed backoff
penalty ``alpha``, the standard web-scale choice precisely because it
needs only COUNTS, i.e. two map-side-combined aggregations) is fit on
the corpus and every document is scored and bucketed.

Token-level math, natural log throughout (no OOV is possible when the
LM is fit on the corpus being scored — every token has a unigram count;
fit on a reference slice upstream via ``docs.where(...)`` for the
held-out CCNet setup, then ``alpha``-backoff also covers OOV bigrams):

* first token ``w0``:            ``ln(c1(w0) / N)``
* seen bigram ``(prev, w)``:     ``ln(c2(prev, w) / c1(prev))``
* unseen bigram (backoff):       ``ln(alpha * c1(w) / N)``

``ppl = exp(-sum(lp) / n_tokens)``; buckets = terciles of ``ppl``.

Scale shape (the 100 TB lens):

* The corpus token stream is NEVER joined row-per-token: scoring
  aggregates each document to its DISTINCT (prev, word) pairs with
  multiplicities first (Zipf ⇒ orders-of-magnitude smaller), joins the
  count tables once per distinct pair, and weights by multiplicity —
  the same distinct-key amortization the MinHash signature and BPE
  encode kernels use.
* The unigram/bigram tables are plain equi-join sides; Zipf-head keys
  ("the") are exactly what AQE skew-join splits. No cartesian, no
  driver collect; totals and tercile thresholds ride 1-row broadcast
  crossJoins so the whole plan stays lazy (the mixture_sample lesson).
* Tercile thresholds use exact ``percentile`` by default (single
  aggregation buffer over one double per document — fine to ~10^8
  docs); ``method='approx'`` swaps in ``approx_percentile`` for the
  10^9+ path, mirroring `classify.fit_bins`' documented strategy.

No reference counterpart (`/root/reference` has no text operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["lm_perplexity"]


def _tokens(c):
    return F.filter(F.split(F.lower(c), r"\s+"), lambda x: x != "")


def lm_perplexity(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
    method: str = "exact",
    fit_docs: DataFrame | None = None,
) -> DataFrame:
    """Score every document under a bigram stupid-backoff LM fit on
    ``fit_docs`` (default: ``docs`` itself — self-fit) and bucket by
    perplexity terciles.

    With a held-out ``fit_docs`` (the CCNet setup: fit on a trusted
    slice, score the whole corpus) two extra cases arise and are both
    handled in-expression: an UNSEEN BIGRAM takes the ``alpha`` backoff
    branch, and an OOV WORD scores as a count-1 singleton (``c1 := 1``)
    — the standard add-one-unknown floor that keeps every logprob
    finite without a dedicated <unk> pass. Under self-fit neither case
    can fire (every token of a scored doc was counted).

    Output: ``(doc_id, n_tokens, logprob, ppl, ppl_bucket)`` — one row
    per input document; zero-token documents (null/empty/whitespace
    text) keep their row with null score and null bucket. ``ppl_bucket``
    is 0 (head / most fluent), 1 (middle) or 2 (tail), by comparing the
    6-dp-rounded perplexity against the 6-dp-rounded tercile thresholds
    (rounded on BOTH sides so the bucket edge is reproducible across
    engines).
    """
    if method not in ("exact", "approx"):
        raise ValueError(f"method must be 'exact' or 'approx', got {method!r}")

    def _tok_table(src: DataFrame) -> DataFrame:
        t = src.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(_tokens(F.col(text_col))).alias("pos", "w"),
        )
        w_doc = Window.partitionBy("doc_id").orderBy("pos")
        return t.withColumn("prev", F.lag("w", 1).over(w_doc))

    tok = _tok_table(docs)
    fit_tok = tok if fit_docs is None else _tok_table(fit_docs)

    uni = fit_tok.groupBy("w").agg(F.count("*").alias("c1"))
    total = uni.agg(F.sum("c1").cast("double").alias("n_total"))
    big = fit_tok.where(F.col("prev").isNotNull()).groupBy("prev", "w").agg(
        F.count("*").alias("c2")
    )

    # Zipf amortization: one scored row per DISTINCT (prev, w) pair per
    # doc, weighted by its multiplicity — the join inputs shrink from
    # |tokens| to |distinct pairs per doc|.
    pairs = tok.groupBy("doc_id", "prev", "w").agg(F.count("*").alias("k"))

    uni_w = uni.select(F.col("w"), F.col("c1").alias("c1_w"))
    uni_p = uni.select(F.col("w").alias("prev"), F.col("c1").alias("c1_prev"))

    scored = (
        pairs.join(uni_w, "w", "left")
        .join(uni_p, "prev", "left")
        .join(big, ["prev", "w"], "left")
        .crossJoin(F.broadcast(total))
    )
    c1w = F.coalesce(F.col("c1_w"), F.lit(1))  # OOV floor: count-1 singleton
    lp = (
        F.when(F.col("prev").isNull(), F.log(c1w / F.col("n_total")))
        .when(
            F.col("c2").isNotNull(), F.log(F.col("c2") / F.col("c1_prev"))
        )
        .otherwise(F.log(F.lit(alpha) * c1w / F.col("n_total")))
    )
    per_doc = (
        scored.groupBy("doc_id")
        .agg(
            F.sum(F.col("k") * lp).alias("_lp_sum"),
            F.sum("k").cast("bigint").alias("n_tokens"),
        )
        .withColumn("_ppl", F.exp(-F.col("_lp_sum") / F.col("n_tokens")))
    )

    pctl = "percentile" if method == "exact" else "approx_percentile"
    thr = per_doc.agg(
        F.expr(
            f"{pctl}(_ppl, array(0.3333333333333333D, 0.6666666666666666D))"
        ).alias("_t")
    ).select(
        F.round(F.col("_t")[0], 6).alias("_t1"),
        F.round(F.col("_t")[1], 6).alias("_t2"),
    )

    ppl_r = F.round(F.col("_ppl"), 6)
    out = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .crossJoin(F.broadcast(thr))
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0).cast("bigint")).alias("n_tokens"),
            (F.round(F.col("_lp_sum"), 6) + F.lit(0.0)).alias("logprob"),
            (ppl_r + F.lit(0.0)).alias("ppl"),
            F.when(F.col("_ppl").isNull(), F.lit(None).cast("int"))
            .when(ppl_r <= F.col("_t1"), 0)
            .when(ppl_r <= F.col("_t2"), 1)
            .otherwise(2)
            .alias("ppl_bucket"),
        )
    )
    return out
