"""Distributed BPE (byte-pair-encoding) tokenizer induction over a
corpus — the tokenizer-training half of an LLM data pipeline (Sennrich
et al. 2016, the public BPE algorithm), expressed Spark-first.

The classic implementation is a single-machine dict-of-counts loop; at
corpus scale the state that matters is tiny and the scans are huge, so
the Spark shape inverts it:

* **The corpus is touched ONCE.** ``word_freqs`` collapses 100 TB of
  text to the distinct-word frequency table (groupBy(word) with
  map-side combine — Zipf makes the distinct table many orders smaller
  than the corpus). Every BPE iteration afterwards runs on that cached
  table, never the corpus.
* **Each merge round is one partial-aggregated pair count + one
  map-only rewrite.** Adjacent symbol pairs explode with the word's
  frequency as weight; ``groupBy(pair).sum`` has map-side combine so
  the shuffle carries one row per distinct pair per task. The argmax
  pair (ONE row — ties broken lexicographically, so induction is
  deterministic on any cluster/partitioning) is the only thing the
  driver ever sees; the merge itself is an ``aggregate`` fold over the
  symbol array, map-only.
* **Lineage is cut per round** (``localCheckpoint``, same move as
  ``similarity.kmeans_centroids``): the words table is rewritten
  n_merges times, and without the cut the plan nests n_merges
  transforms deep.

No reference counterpart (`/root/reference` has no text operators).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, StringType

__all__ = ["word_freqs", "symbolize", "bpe_pair_counts", "train_bpe", "bpe_encode"]

#: end-of-word sentinel (classic BPE): lets merges distinguish
#: word-final from word-internal occurrences of a symbol.
EOW = "</w>"


def word_freqs(
    docs: DataFrame, text_col: str = "text", min_freq: int = 1
) -> DataFrame:
    """Distinct-word frequency table ``(word, freq)`` — the ONE pass
    over the corpus; everything else in BPE induction runs on this."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    out = (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    if min_freq > 1:
        out = out.filter(F.col("freq") >= min_freq)
    return out


def symbolize(words: DataFrame) -> DataFrame:
    """Initial symbol sequences: every word becomes its character array
    plus the end-of-word sentinel — ``(word, freq, syms)``."""
    return words.select(
        "word",
        "freq",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(EOW))
        ).alias("syms"),
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over ``(freq, syms)`` rows: one row
    per distinct (a, b) with the summed word frequencies. Map-side
    combine collapses Zipf-hot pairs per task before the shuffle."""
    pairs = F.expr(
        "transform(sequence(1, size(syms) - 1),"
        "          i -> struct(syms[i - 1] AS a, syms[i] AS b))"
    )
    return (
        syms.filter(F.size("syms") >= 2)
        .select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("pair_freq"))
    )


def bpe_pair_counts(
    docs: DataFrame, text_col: str = "text", min_freq: int = 1
) -> DataFrame:
    """One BPE statistics round straight off the corpus: distinct-word
    freqs → initial symbols → weighted adjacent-pair counts. This is
    round 0 of :func:`train_bpe` as a standalone auditable query."""
    return _pair_counts(symbolize(word_freqs(docs, text_col, min_freq)))


def _merge_pair(syms: DataFrame, a: str, b: str) -> DataFrame:
    """Map-only rewrite replacing every adjacent (a, b) in ``syms`` with
    the merged symbol — a left fold that mirrors the sequential
    semantics of the classic implementation (after 'x x'→'xx', the
    sequence x x x yields [xx, x], never [x, xx])."""
    merged = F.expr(
        f"""aggregate(
            syms,
            CAST(array() AS array<string>),
            (acc, s) -> CASE
                WHEN size(acc) > 0
                     AND element_at(acc, -1) = {a!r} AND s = {b!r}
                THEN concat(slice(acc, 1, size(acc) - 1),
                            array({(a + b)!r}))
                ELSE concat(acc, array(s)) END)"""
    )
    return syms.select("word", "freq", merged.alias("syms"))


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_freq: int = 1,
    checkpoint: bool = True,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges over the corpus; returns the merge
    table ``[(a, b, pair_freq), ...]`` in learned order — the artifact
    a tokenizer ships.

    Each round: one pair-count aggregation over the cached distinct-word
    table, a ONE-ROW argmax to the driver (highest ``pair_freq``, ties
    broken by (a, b) lexicographically — deterministic under any
    partitioning), and a map-only merge rewrite. ``checkpoint`` cuts
    the per-round lineage growth exactly like
    ``similarity.kmeans_centroids`` (n_merges nested transforms would
    otherwise stack in the plan)."""
    syms = symbolize(word_freqs(docs, text_col, min_freq))
    syms = syms.localCheckpoint(eager=True) if checkpoint else syms.cache()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(syms)
            .orderBy(F.col("pair_freq").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, pf = top[0]["a"], top[0]["b"], int(top[0]["pair_freq"])
        merges.append((a, b, pf))
        syms = _merge_pair(syms, a, b)
        if checkpoint:
            syms = syms.localCheckpoint(eager=True)
    return merges


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]] | list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
    passthrough: tuple = (),
) -> DataFrame:
    """Apply a learned merge table to the corpus — the ENCODE half of
    the tokenizer (the artifact :func:`train_bpe` ships). Emits
    ``(doc_id, bpe_tokens: array<string>, n_bpe_tokens)``.

    The standard fast encode: per WORD, greedily merge the
    highest-priority (lowest merge-index) adjacent pair until no learned
    pair remains — identical output to replaying the merges in training
    order. Runs as an Arrow-batched pandas UDF with a per-batch
    memoization cache over DISTINCT words (Zipf: a batch of 10k docs
    holds a few thousand distinct words, each encoded once) — the same
    batch-amortization move as the MinHash signature kernel. The merge
    table broadcasts via the UDF closure (tokenizer tables are KBs-MBs;
    a 50k-merge GPT-2-class table is ~1 MB).

    Scale shape: map-only — fuses into the corpus scan, no shuffle; the
    heavy work is C-speed dict lookups per distinct word per batch."""
    ranks = {(a, b): i for i, (a, b, *_rest) in enumerate(merges)}

    @F.pandas_udf(ArrayType(StringType()))
    def enc(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def word_syms(w: str) -> list[str]:
            got = cache.get(w)
            if got is not None:
                return got
            syms = list(w) + [EOW]
            while len(syms) > 1:
                best = None
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best is None or r < best[0]):
                        best = (r, i)
                if best is None:
                    break
                # merge ALL occurrences of the best pair left-to-right
                # (greedy fold — same semantics as _merge_pair)
                a, b = syms[best[1]], syms[best[1] + 1]
                out: list[str] = []
                for s in syms:
                    if out and out[-1] == a and s == b:
                        out[-1] = a + b
                    else:
                        out.append(s)
                syms = out
            cache[w] = syms
            return syms

        res = []
        for t in texts:
            if t is None:
                res.append([])
                continue
            toks: list[str] = []
            for w in t.lower().split():
                toks.extend(word_syms(w))
            res.append(toks)
        return pd.Series(res)

    return docs.select(
        F.col(id_col),
        *[F.col(c) for c in passthrough],
        enc(F.col(text_col)).alias("bpe_tokens"),
    ).withColumn("n_bpe_tokens", F.size("bpe_tokens").cast("bigint"))


def fertility_stats(
    docs: DataFrame,
    merges: list[tuple[str, str]] | list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Tokenizer fertility audit per ``group_col``: how well the learned
    merge table compresses each slice of the corpus — ``fertility``
    (BPE tokens per whitespace word; 1.0 = every word is one token,
    high values mean the tokenizer fragments this slice) and
    ``chars_per_token`` (the compression ratio that converts a byte
    budget into a token budget). The per-source table is what a
    mixture-weighting pass reads before trusting token counts: a source
    the tokenizer fragments 2x pays 2x the context window for the same
    text.

    Output per group: ``n_docs``, ``n_words``, ``n_bpe_tokens``,
    ``n_chars``, ``fertility`` (6 dp, NULL when the group has no
    words), ``chars_per_token`` (6 dp, NULL when no tokens). Word =
    the encoder's own whitespace split; null text = 0 words/chars.

    Scale shape: ONE corpus scan (the encode UDF and the word/char
    expressions share the same projection via ``passthrough``), then
    one map-side-combinable groupBy on the tiny group key. No joins.
    """
    enc = bpe_encode(
        docs,
        merges,
        text_col=text_col,
        id_col=id_col,
        passthrough=(group_col, text_col),
    )
    words = F.when(F.col(text_col).isNull(), F.lit(0)).otherwise(
        F.size(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda x: x != F.lit(""),
            )
        )
    )
    chars = F.when(F.col(text_col).isNull(), F.lit(0)).otherwise(
        F.length(text_col)
    )
    base = enc.select(
        F.col(group_col),
        words.alias("_w"),
        chars.alias("_c"),
        "n_bpe_tokens",
    )
    nz = lambda c: F.when(c > 0, c)  # noqa: E731 — NULLIF(x, 0)
    return base.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("_w").cast("bigint").alias("n_words"),
        F.sum("n_bpe_tokens").cast("bigint").alias("n_bpe_tokens"),
        F.sum("_c").cast("bigint").alias("n_chars"),
        (
            F.round(F.sum("n_bpe_tokens") / nz(F.sum("_w")), 6)
            + F.lit(0.0)
        ).alias("fertility"),
        (
            F.round(F.sum("_c") / nz(F.sum("n_bpe_tokens")), 6)
            + F.lit(0.0)
        ).alias("chars_per_token"),
    )
