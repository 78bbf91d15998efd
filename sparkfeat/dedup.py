"""Deduplication operators for web-scale corpora: exact, n-gram
Jaccard, MinHash+LSH, SimHash.

Scale design:

* **exact** — one md5 groupBy; shuffle keyed on the 128-bit hash, so
  perfectly balanced regardless of text skew.
* **n-gram Jaccard** — LOSSLESS PPJoin-style prefix filtering:
  candidates share a rarest-first prefix token (frequency ranks for the
  common vocabulary broadcast), size-ratio pruned, then exact
  ``array_intersect``/``array_union`` verify over survivors only. The
  result equals brute force within a language — blocking is an
  optimization, not a recall contract.
* **MinHash+LSH** — per-doc signature (k permutations of md5-derived
  shingle hashes in the Mersenne-31 field — pure uint64 SIMD, and
  replayable in the DuckDB oracle), banded into r-row bands; docs
  sharing a band bucket are candidates (standard Broder/LSH
  construction). Cost: O(docs·shingles) + one groupBy on band buckets —
  no pairwise stage until candidates are already rare.
* **SimHash** — 64-bit sign-aggregated md5-token-hash vector;
  candidates share one of 4 16-bit blocks (Hamming ≤ 3 guaranteed
  recall via pigeonhole); verify by exact Hamming distance in JVM bit
  ops.
* **Embedding near-dup** — multi-probe IVF bucket co-membership
  candidates, within-bucket verify as one BLAS matmul per bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from sparkfeat.text import bag_fingerprint, md5_lower64_np, tokens


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact (content-hash) dedup: canonical row = min id per fingerprint.
    Adds ``fingerprint``, ``group_size``, ``keep`` (bool)."""
    out = df.withColumn("fingerprint", bag_fingerprint(text_col))
    w = Window.partitionBy("fingerprint")
    return out.withColumn("group_size", F.count(F.lit(1)).over(w)).withColumn(
        "keep", F.col(id_col) == F.min(id_col).over(w)
    )


# ---------------------------------------------------------------------------
# n-gram / token-set Jaccard
# ---------------------------------------------------------------------------


def jaccard_vocab_ranks(
    df: DataFrame, text_col: str = "text", common_vocab: int = 65536
) -> DataFrame:
    """Global token-frequency ranks for :func:`jaccard_pairs`: the
    ``common_vocab`` most frequent tokens (distinct-per-doc counts),
    emitted as (_tok, _cnt). This is a fitted artifact — like scaler
    stats — so a pipeline that calls ``jaccard_pairs`` repeatedly fits
    it ONCE, persists it, and passes it in, shaving one full
    explode+aggregate pass over the corpus off every subsequent call.
    Broadcast-sized by construction (≤ common_vocab rows)."""
    toks = F.array_distinct(tokens(F.lower(F.col(text_col))))
    return (
        df.select(F.explode(toks).alias("_tok"))
        .groupBy("_tok")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .orderBy(F.col("_cnt").desc(), "_tok")
        .limit(common_vocab)
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    band_cols: tuple[str, ...] = ("lang",),
    threshold: float = 0.8,
    common_vocab: int = 65536,
    vocab_ranks: DataFrame | None = None,
    positional_filter: bool = False,
) -> DataFrame:
    """Near-dup pairs (a < b) by token-set Jaccard ≥ threshold within
    ``band_cols`` groups — **lossless** prefix-filter blocking (the
    PPJoin probing prefix, Xiao et al. 2008), no length banding and no
    recall caveat: the result equals the brute-force within-band join.

    Candidate generation: each doc's distinct tokens are ordered
    rarest-first (global frequency; only the ``common_vocab`` most
    frequent tokens need ranks — they ride a ONE-ROW broadcast
    ``map_from_entries``, so ranking + sorting + prefix-slicing are
    pure map-side expressions with no token explode and no per-doc
    collect_list shuffle; everything unranked is rare and sorts first),
    and the first ``n − ⌈t·n⌉ + 1`` tokens form its prefix. Two sets
    with Jaccard ≥ t MUST share a prefix token, so the candidate join
    keys on (band, prefix_token) — rare tokens ⇒ small buckets ⇒ the
    quadratic stage collapses. A lossless size-ratio prune (jaccard ≥
    t ⇒ min(|A|,|B|)/max ≥ t) runs before dedup, and the heavy token
    arrays shuffle only for surviving candidates.

    ``positional_filter=True`` adds PPJoin's positional prune (also
    lossless: at the FIRST shared prefix token every common token sits
    at position ≥ pos_a in A and ≥ pos_b in B, so overlap ≤ 1 +
    min(n_a − pos_a, n_b − pos_b); later-match rows may fail the bound
    spuriously but the first-match row of a true pair always passes,
    and the dedup needs one survivor). Use it when prefix buckets stay
    fat AFTER frequency ordering — Zipf-shaped corpora with heavy
    boilerplate. Default off: on the driver corpus (31-word vocab,
    ~25% of in-band pairs genuinely ≥ t) it cut co-occurrence rows
    2.25M → 1.07M but final candidates only 946k → 842k, and the wider
    shuffle rows (two extra position ints through the self-join) made
    the end-to-end ~15% slower — the prune must pay for its own
    plumbing, which needs buckets where most candidates are FALSE."""
    toks = F.array_distinct(tokens(F.lower(F.col(text_col))))
    keys = [f"_b_{c}" for c in band_cols]
    base = df.select(
        F.col(id_col).alias("_id"),
        *[F.col(c).alias(f"_b_{c}") for c in band_cols],
        toks.alias("_toks"),
    ).withColumn("_n", F.size("_toks"))

    # rarest-first global order: broadcast ranks for the common vocab,
    # everything unranked is rare (cnt 0) and sorts before common tokens;
    # a pre-fitted vocab_ranks (jaccard_vocab_ranks) skips the aggregate.
    # (The tempting map-side variant — one-row map_from_entries +
    # rank-lookup inside transform()/array_sort() lambdas — measured
    # ~35% SLOWER end-to-end: HOF lambdas run interpreted, while this
    # explode → broadcast-hash-join → groupBy chain stays inside
    # whole-stage codegen and repartitions the work to every core.)
    exploded = base.select("_id", *keys, "_n", F.explode("_toks").alias("_tok"))
    common = (
        vocab_ranks
        if vocab_ranks is not None
        else (
            exploded.groupBy("_tok")
            .agg(F.count(F.lit(1)).alias("_cnt"))
            .orderBy(F.col("_cnt").desc(), "_tok")
            .limit(common_vocab)
        )
    )
    ranked = exploded.join(F.broadcast(common), "_tok", "left").withColumn(
        "_cnt", F.coalesce(F.col("_cnt"), F.lit(0))
    )
    plen = (F.col("_n") - F.ceil(F.lit(threshold) * F.col("_n")) + 1).cast("int")
    grouped = ranked.groupBy("_id", *keys, "_n").agg(
        F.array_sort(F.collect_list(F.struct("_cnt", "_tok"))).alias("_st")
    )
    ptoks = F.slice(F.transform("_st", lambda s: s["_tok"]), F.lit(1), plen)
    pos_cols = []
    if positional_filter:
        prefixes = (
            grouped.select(
                "_id", *keys, "_n", F.posexplode(ptoks).alias("_pp", "_ptok")
            )
            .withColumn("_pos", (F.col("_pp") + 1).cast("int"))
            .drop("_pp")
        )
        pos_cols = ["_pos"]
    else:
        prefixes = grouped.select(
            "_id", *keys, "_n", F.explode(ptoks).alias("_ptok")
        )
    # pre-partition the prefix table on the join key at the cluster's
    # parallelism: the self-join's OUTPUT is ~200x its input, so AQE's
    # input-bytes coalescing would otherwise funnel the pair explosion
    # into one task; both sides reuse this single exchange
    prefixes = prefixes.repartition(
        df.sparkSession.sparkContext.defaultParallelism, *keys, "_ptok"
    )
    a = prefixes.select(
        *keys,
        "_ptok",
        F.col("_id").alias("id_a"),
        F.col("_n").alias("_na"),
        *[F.col(c).alias("_pa") for c in pos_cols],
    )
    b = prefixes.select(
        *keys,
        "_ptok",
        F.col("_id").alias("id_b"),
        F.col("_n").alias("_nb"),
        *[F.col(c).alias("_pb") for c in pos_cols],
    )
    keep = F.least(F.col("_na"), F.col("_nb")).cast("double") >= F.lit(
        threshold
    ) * F.greatest(F.col("_na"), F.col("_nb"))
    if positional_filter:
        keep = keep & (
            (
                F.lit(1.0)
                + F.least(F.col("_na") - F.col("_pa"), F.col("_nb") - F.col("_pb"))
            )
            >= F.lit(threshold / (1.0 + threshold)) * (F.col("_na") + F.col("_nb"))
        )
    # explicit-count repartition: the candidate join EXPLODES its input
    # (5k docs → ~1M pairs on the driver corpus), so AQE's bytes-based
    # coalescing — which only sees the tiny pre-join shuffle — would run
    # the dedup + verify on 1-6 tasks; pinning the exchange to the
    # cluster's parallelism keeps the verify (the dominant CPU: ~12 s of
    # array_intersect on ~1M pairs here) fully parallel at every scale
    cand = (
        a.join(b, [*keys, "_ptok"])
        .filter((F.col("id_a") < F.col("id_b")) & keep)
        .select("id_a", "id_b")
        .repartition(
            df.sparkSession.sparkContext.defaultParallelism, "id_a", "id_b"
        )
        .dropDuplicates(["id_a", "id_b"])
    )

    # exact verify: token arrays shuffle once per side, candidates only.
    # |A∪B| = |A|+|B| − |A∩B| (both sides are array_distinct'ed), which
    # skips array_union's second per-pair hash-set build — integer
    # arithmetic, bit-identical jaccard.
    ta = base.select(F.col("_id").alias("id_a"), F.col("_toks").alias("_ta"))
    tb = base.select(F.col("_id").alias("id_b"), F.col("_toks").alias("_tb"))
    pairs = cand.join(ta, "id_a").join(tb, "id_b")
    inter = F.size(F.array_intersect("_ta", "_tb")).cast("double")
    union = (F.size("_ta") + F.size("_tb")).cast("double") - inter
    return (
        pairs.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    band_cols: tuple[str, ...] = ("lang",),
    threshold: float = 0.95,
    min_tokens: int = 30,
    common_vocab: int = 65536,
    vocab_ranks: DataFrame | None = None,
) -> DataFrame:
    """DIRECTIONAL near-dup pairs by token-set containment
    C(probe→host) = |probe ∩ host| / |probe| ≥ threshold — the
    asymmetric complement of :func:`jaccard_pairs`: a short document
    quoted or embedded inside a long one has Jaccard ≈ |A|/|B| → 0 but
    containment ≈ 1, so symmetric near-dup misses exactly the
    subset-duplication (quoted replies, article + commentary, prefix
    crawls) this operator exists for. **Lossless** within bands above
    the ``min_tokens`` probe floor: equals the brute-force ordered
    join (the floor is principled — containment of a 3-token set is
    noise, the standard containment-join guard).

    Candidate generation is the PPJoin prefix filter adapted to the
    asymmetric predicate: C(A→B) ≥ t needs |A∩B| ≥ ⌈t·|A|⌉, and A has
    only ⌈t|A|⌉ − 1 tokens OUTSIDE its rarest-first prefix of length
    |A| − ⌈t|A|⌉ + 1, so some witness token lies in the prefix — but
    B is unconstrained (any superset qualifies), so the INDEX side
    must post ALL its tokens: the join is probe-prefix × host-all.
    No size-ratio prune applies (that's the symmetric identity).
    Hot-token postings on the host side are the skew hazard; the
    rarest-first prefix means probe keys are mostly rare tokens
    (short postings), and a probe prefix contains a stopword only
    when the probe is nearly all stopwords — AQE skew-join splits
    what remains. Verify is exact (array_intersect on the candidate
    pairs only). Output: one row per PASSING DIRECTION —
    ``(probe_id, host_id, n_probe, n_common, containment)``; a
    mutual-containment pair yields two rows, which is the information
    a dedup policy needs (cut the probe, keep the host)."""
    toks = F.array_distinct(tokens(F.lower(F.col(text_col))))
    keys = [f"_b_{c}" for c in band_cols]
    base = (
        df.select(
            F.col(id_col).alias("_id"),
            *[F.col(c).alias(f"_b_{c}") for c in band_cols],
            toks.alias("_toks"),
        )
        .withColumn("_n", F.size("_toks"))
        .filter(F.col("_n") >= min_tokens)
    )
    exploded = base.select("_id", *keys, "_n", F.explode("_toks").alias("_tok"))
    common = (
        vocab_ranks
        if vocab_ranks is not None
        else (
            exploded.groupBy("_tok")
            .agg(F.count(F.lit(1)).alias("_cnt"))
            .orderBy(F.col("_cnt").desc(), "_tok")
            .limit(common_vocab)
        )
    )
    ranked = exploded.join(F.broadcast(common), "_tok", "left").withColumn(
        "_cnt", F.coalesce(F.col("_cnt"), F.lit(0))
    )
    plen = (F.col("_n") - F.ceil(F.lit(threshold) * F.col("_n")) + 1).cast(
        "int"
    )
    grouped = ranked.groupBy("_id", *keys, "_n").agg(
        F.array_sort(F.collect_list(F.struct("_cnt", "_tok"))).alias("_st")
    )
    ptoks = F.slice(F.transform("_st", lambda s: s["_tok"]), F.lit(1), plen)
    probe = grouped.select(
        *keys,
        F.explode(ptoks).alias("_ptok"),
        F.col("_id").alias("probe_id"),
    )
    host = exploded.select(
        *keys,
        F.col("_tok").alias("_ptok"),
        F.col("_id").alias("host_id"),
    )
    cand = (
        probe.join(host, [*keys, "_ptok"])
        .filter(F.col("probe_id") != F.col("host_id"))
        .select("probe_id", "host_id")
        .dropDuplicates(["probe_id", "host_id"])
    )
    ta = base.select(
        F.col("_id").alias("probe_id"),
        F.col("_toks").alias("_ta"),
        F.col("_n").alias("n_probe"),
    )
    tb = base.select(F.col("_id").alias("host_id"), F.col("_toks").alias("_tb"))
    pairs = cand.join(ta, "probe_id").join(tb, "host_id")
    inter = F.size(F.array_intersect("_ta", "_tb"))
    return (
        pairs.withColumn("n_common", inter)
        .withColumn(
            "containment",
            F.col("n_common").cast("double") / F.col("n_probe").cast("double"),
        )
        .filter(F.col("containment") >= threshold)
        .select("probe_id", "host_id", "n_probe", "n_common", "containment")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

#: Mersenne-31 hash field: a·h + b < 2^62 fits uint64, so the whole
#: (shingles × perms) permutation matrix is plain vectorized numpy —
#: the 61-bit field would force object-dtype python-int products
#: (~50× slower in the scan-dominant signature stage).
_MERSENNE = (1 << 31) - 1


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def _shingles(text: str, n: int) -> list[str]:
    ws = text.lower().split()
    if len(ws) < n:
        return [" ".join(ws)] if ws else []
    return [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Per-doc MinHash signature (ArrayType<long>, length num_perm).

    Shingle hashes are md5-lower-64 (== DuckDB ``md5_number_lower``)
    folded into the Mersenne prime field; permutations
    h_i(x) = (a_i·x + b_i) mod p. One Arrow batch per partition — numpy
    does (docs×perms) mins vectorized. The whole signature is replayable
    in SQL, so the driver oracle checks it end-to-end.

    The input is hash-repartitioned on the id first: signature hashing is
    the CPU-heavy stage and must parallelize regardless of how few files
    the source scan produced (a single-file corpus would otherwise hash
    in one task)."""
    a, b = _perm_params(num_perm, seed)
    # Signature hashing needs PARALLELISM, not key locality: only add
    # the exchange when the scan arrived under-split (a small corpus in
    # 1-2 files would otherwise hash on one core). An explicit partition
    # count because AQE would coalesce this tiny-by-bytes exchange back
    # to one partition, serializing the CPU-bound stage; an
    # already-parallel input (any production corpus) skips the shuffle.
    n_part = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, n_part // 2):
        df = df.repartition(n_part, F.col(id_col))

    @F.pandas_udf(ArrayType(LongType()))
    def sig(texts: pd.Series) -> pd.Series:
        # md5 is the batch bottleneck (per-string hashlib) and shingles
        # are Zipfian: hash each DISTINCT shingle once per Arrow batch,
        # then take per-doc column-mins over the shared permuted table.
        # A doc's signature is min over its shingle SET, so deduping is
        # semantics-free — the SQL oracle replay is unchanged.
        doc_sh = [_shingles(t, shingle_n) for t in texts]
        flat = sorted({s for sh in doc_sh for s in sh})
        if flat:
            pos = {s: i for i, s in enumerate(flat)}
            hv = (md5_lower64_np(flat) & np.uint64(0xFFFFFFFF)) % np.uint64(
                _MERSENNE
            )
            # (n_unique, num_perm) permuted hashes; pure uint64 SIMD
            # (max product (2^31)² + b < 2^62, no overflow)
            perms = (hv[:, None] * a[None, :] + b[None, :]) % np.uint64(_MERSENNE)
        empty = [int(_MERSENNE)] * num_perm
        out = []
        for sh in doc_sh:
            if not sh:
                out.append(empty)
                continue
            rows = np.fromiter((pos[s] for s in set(sh)), dtype=np.int64)
            out.append(perms[rows].min(axis=0).astype(np.int64).tolist())
        return pd.Series(out)

    return df.select(F.col(id_col).alias("_id"), sig(F.col(text_col)).alias("sig"))


def _band_keys(sigs: DataFrame, bands: int, rows: int) -> DataFrame:
    """Explode a ``(_id, sig)`` signature table into its LSH band keys:
    one row per (doc, band) with ``key`` = that band's ``rows``-slice of
    the signature cast to string (an exact-equality join key)."""
    return sigs.select(
        "_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.slice("sig", i * rows + 1, rows).cast("string").alias("key"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("_id", "sig", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """LSH candidate pairs + estimated Jaccard (signature agreement).

    bands·rows = num_perm; a pair lands in a bucket iff one band of the
    signatures agrees exactly. Emits (id_a, id_b, est_jaccard)."""
    rows = num_perm // bands
    sigs = minhash_signatures(df, text_col, id_col, num_perm, shingle_n, seed)
    banded = _band_keys(sigs, bands, rows)
    a = banded.select("band", "key", F.col("_id").alias("id_a"), F.col("sig").alias("_sa"))
    b = banded.select("band", "key", F.col("_id").alias("id_b"), F.col("sig").alias("_sb"))
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_sa", "_sb")
        .dropDuplicates(["id_a", "id_b"])
    )
    agree = F.size(
        F.filter(F.zip_with("_sa", "_sb", lambda x, y: x == y), lambda v: v)
    )
    return cand.withColumn(
        "est_jaccard", agree.cast("double") / F.lit(float(num_perm))
    ).select("id_a", "id_b", "est_jaccard")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per doc (Charikar): sum ±1 per bit over token
    hashes, sign → bit. Token hashes via md5-lower-64 (one Arrow pass;
    == DuckDB ``md5_number_lower``, so the SQL oracle replays the bit
    vector exactly). Hash-repartitioned on the id first (explicit
    partition count — AQE's byte-based coalescing would serialize the
    CPU-bound hashing) so the stage parallelizes independent of source
    file count."""
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism, F.col(id_col))

    @F.pandas_udf(LongType())
    def sh(texts: pd.Series) -> pd.Series:
        out = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            ws = t.lower().split()
            if not ws:
                out[i] = 0
                continue
            hv = md5_lower64_np(ws)
            bits = ((hv[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
                np.int64
            )
            v = (2 * bits - 1).sum(axis=0)
            # exact bit packing (a python sum() of uint64 scalars promotes
            # to float64 under numpy 1.x and silently corrupts high bits)
            packed = np.packbits((v > 0).astype(np.uint8), bitorder="little")
            out[i] = packed.view("<i8")[0]
        return pd.Series(out)

    return df.withColumn("simhash", sh(F.col(text_col)))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming.

    Pigeonhole blocking: 4 blocks of 16 bits; any pair with ≤3 differing
    bits agrees on ≥1 block → candidates = bucket-join on (block_idx,
    block_value); verify with JVM bit_count(xor)."""
    s = simhash(df, text_col, id_col).select(F.col(id_col).alias("_id"), "simhash")
    blocks = s.select(
        "_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned(F.col("simhash"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select("_id", "simhash", F.col("b.blk").alias("blk"), F.col("b.val").alias("val"))
    a = blocks.select("blk", "val", F.col("_id").alias("id_a"), F.col("simhash").alias("_ha"))
    b = blocks.select("blk", "val", F.col("_id").alias("id_b"), F.col("simhash").alias("_hb"))
    cand = (
        a.join(b, ["blk", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs: all (a < b) with cosine ≥
    threshold. Brute-force quadratic stage — the verification baseline;
    at corpus scale, route candidates through ``similarity.ivf_topk``
    buckets first (same scoring expressions) so each vector scores only
    its nprobe/C fraction. Float32 widened to double (engine-portable)."""
    from sparkfeat.similarity import _as_double, _dot, _norm

    base = emb.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_v"))
    a = base.select(F.col(id_col).alias("id_a"), F.col("_v").alias("_va"))
    b = base.select(F.col(id_col).alias("id_b"), F.col("_v").alias("_vb"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    cos = _dot(F.col("_va"), F.col("_vb")) / (_norm(F.col("_va")) * _norm(F.col("_vb")))
    return (
        pairs.withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def embedding_pairs_bucketed(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    n_assign: int = 4,
) -> DataFrame:
    """Scale path for embedding-cosine near-dup: candidates are pairs
    CO-ASSIGNED to at least one shared IVF centroid bucket
    (``similarity.ivf_assign`` with multi-probe ``n_assign`` — one
    broadcast pass over the corpus), then the exact cosine verify.

    The all-pairs stage is a shuffle equi-join on ``cent_id``, quadratic
    only WITHIN a bucket (O(n_assign²·Σ bᵢ²) ≪ n² when buckets scale with
    the corpus; no CartesianProduct node in the plan — asserted in
    tests/test_plans.py). Recall contract: a pair sharing NO assigned
    bucket is not emitted — multi-probe n_assign=4 measures recall 1.0 on
    the test corpora at threshold 0.4 and is the standard knob to trade
    verify cost for recall (tests/test_similarity_multimodal.py)."""
    from sparkfeat.similarity import _norm, ivf_assign, ivf_centroids

    cents = ivf_centroids(emb, n_centroids, id_col, vec_col)
    assigned = ivf_assign(emb, cents, id_col, vec_col, n_assign=n_assign)
    # pre-normalize ONCE per assignment row: the per-pair verify then
    # needs a single dot-product fold instead of dot + two norms (3×
    # fewer higher-order-function passes on the quadratic stage);
    # repartition on the bucket key so big buckets spread across tasks
    # regardless of the input's file layout
    normed = (
        assigned.repartition(F.col("cent_id"))
        .withColumn("_n", _norm(F.col("_cv")))
        .select(
            "cent_id",
            F.col(id_col),
            F.transform("_cv", lambda x: x / F.col("_n")).alias("_nv"),
        )
    )

    # within-bucket verify as ONE BLAS matmul per bucket (applyInPandas):
    # a bucket of m unit vectors → m×m similarity in numpy, ~3 orders of
    # magnitude faster than a per-pair SQL fold. Each task holds one
    # bucket's matrix — bounded when n_centroids scales with the corpus
    # (mega-bucket fallback: raise n_centroids). Float sums differ from
    # a sequential fold at ~1e-15 ≪ the round-6 comparison tolerance.
    from pyspark.sql.types import DoubleType, StructField, StructType

    id_field = [f for f in emb.schema.fields if f.name == id_col][0]
    out_schema = StructType(
        [
            StructField("id_a", id_field.dataType, True),
            StructField("id_b", id_field.dataType, True),
            StructField("cosine", DoubleType(), True),
        ]
    )
    thr = float(threshold)

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        if m < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        ids = pdf[id_col].to_numpy()
        V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["_nv"]])
        S = V @ V.T
        iu, ju = np.triu_indices(m, k=1)
        keep = S[iu, ju] >= thr
        ia, ib = ids[iu[keep]], ids[ju[keep]]
        lo = np.minimum(ia, ib)
        hi = np.maximum(ia, ib)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": S[iu, ju][keep]})

    pairs = normed.groupBy("cent_id").applyInPandas(bucket_pairs, out_schema)
    return pairs.dropDuplicates(["id_a", "id_b"])


def embedding_pairs_lsh(
    emb: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 48,
    n_bands: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    tag: str = "lsh",
) -> DataFrame:
    """Fit-free embedding near-dup: candidates = pairs whose sign-LSH
    band keys collide in ANY band (the SimHash recipe applied to dense
    vectors — random-hyperplane bits instead of token-hash majorities),
    then an exact unit-cosine verify ≥ threshold. Complements
    :func:`embedding_pairs_bucketed` the way SimHash complements
    MinHash on the text side: no centroid fit, so it works on a corpus
    that churns faster than a k-means pass is worth re-running.

    Recall at cosine c per band = p^(n_planes/n_bands) with
    p = 1 − arccos(c)/π (≈0.98 over 8×6-bit bands at c=0.9); random
    pairs collide w.p. ≈ n_bands/2^(bits/band), so RAISE bits-per-band
    with log₂(corpus) (e.g. 16 bands × 12 bits at 10⁸ rows) to keep
    within-bucket pair counts bounded — the standard LSH memory/recall
    dial. The band self-join is an equi-join (hash shuffle, no
    CartesianProduct); the verify is one fold per surviving pair on
    pre-normalized vectors."""
    from sparkfeat.similarity import _as_double, _dot, _lsh_bands, _norm, lsh_planes

    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    planes = lsh_planes(dim, n_planes, tag)
    key_array = _lsh_bands(
        f"transform({vec_col}, x -> CAST(x AS DOUBLE))", planes, n_bands
    )
    b = emb.select(
        F.col(id_col), F.posexplode(key_array).alias("band_idx", "band_key")
    )
    cand = (
        b.select(F.col(id_col).alias("id_a"), "band_idx", "band_key")
        .join(
            b.select(F.col(id_col).alias("id_b"), "band_idx", "band_key"),
            ["band_idx", "band_key"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    normed = emb.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("_v")
    ).withColumn("_n", _norm(F.col("_v"))).select(
        id_col, F.transform("_v", lambda x: x / F.col("_n")).alias("_u")
    )
    return (
        cand.join(normed.select(F.col(id_col).alias("id_a"), F.col("_u").alias("_ua")), "id_a")
        .join(normed.select(F.col(id_col).alias("id_b"), F.col("_u").alias("_ub")), "id_b")
        .withColumn("cosine", _dot(F.col("_ua"), F.col("_ub")))
        .filter(F.col("cosine") >= F.lit(float(threshold)))
        .select("id_a", "id_b", "cosine")
    )


# ---------------------------------------------------------------------------
# Near-dup clustering: pairs -> connected components -> canonical keep-list
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    checkpoint: bool = True,
) -> DataFrame:
    """Distributed connected components over a near-duplicate pair graph
    via alternating **large-star / small-star** contractions (Kiveris et
    al., *Connected Components in MapReduce and Beyond*, SoCC'14 — the
    standard O(log n)-round formulation; plain min-label propagation is
    O(graph diameter) rounds, and LSH band collisions chain near-dup
    docs into long paths, exactly the adversarial case). Returns one row
    per non-isolated node: ``(node, component)`` where ``component`` is
    the smallest node id in its component — deterministic on any
    cluster, no rand/iteration-order dependence.

    Each round is two groupBy-join passes over the CURRENT edge set
    (which only shrinks toward one star per component — never the raw
    corpus); convergence is detected by an order-insensitive edge-set
    checksum (count + sum of xxhash64(u,v)), and ``checkpoint=True``
    (default) cuts lineage with an eager ``localCheckpoint()`` per round
    — without it the plan nests one contraction per round and a retry
    recomputes the whole history (same hazard the k-means fit guards;
    pytest asserts constant plan depth). Raises after ``max_iter``
    rounds (components need ~log₂(n) large/small rounds; 25 covers any
    realistic pair graph) rather than returning unconverged labels.

    No reference counterpart (the reference has no corpus operators);
    the DuckDB oracle twin replays the closure with a recursive CTE.
    """

    def _star(edges: DataFrame, large: bool) -> DataFrame:
        sym = edges.select(
            F.col("u").alias("n"), F.col("v").alias("w")
        ).unionByName(edges.select(F.col("v").alias("n"), F.col("u").alias("w")))
        m = sym.groupBy("n").agg(F.min("w").alias("_mw"))
        joined = sym.join(m, "n").withColumn(
            "m", F.least(F.col("_mw"), F.col("n"))
        )
        kept = joined.filter(
            F.col("w") > F.col("n") if large else F.col("w") <= F.col("n")
        )
        out = kept.select(F.col("w").alias("u"), F.col("m").alias("v"))
        if not large:
            # small-star also re-links each center to its min
            out = out.unionByName(
                joined.select(F.col("n").alias("u"), F.col("m").alias("v")).distinct()
            )
        return (
            out.filter(F.col("u") != F.col("v"))
            .select(
                F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
            )
            .distinct()
        )

    def _checksum(edges: DataFrame):
        row = edges.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal(38,0) sum: 2^63-magnitude terms would overflow an
            # ANSI BIGINT sum after a handful of edges
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).first()
        return (row["n"], row["h"])

    edges = (
        pairs.select(
            F.greatest(F.col(id_a), F.col(id_b)).alias("u"),
            F.least(F.col(id_a), F.col(id_b)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    prev = None
    for _ in range(max_iter):
        edges = _star(_star(edges, large=True), large=False)
        if checkpoint:
            edges = edges.localCheckpoint(eager=True)
        cur = _checksum(edges)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    # converged: edges form stars (u=member, v=component min); the root
    # itself appears only on the v side.
    return (
        edges.select(F.col("u").alias("node"), F.col("v").alias("component"))
        .unionByName(
            edges.select(F.col("v").alias("node"), F.col("v").alias("component"))
        )
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )


def neardup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Canonical keep-list from a near-dup pair graph: every doc gets its
    ``cluster_id`` (smallest doc id reachable through the pair graph;
    singletons cluster with themselves), ``cluster_size``, and
    ``keep`` = (doc == cluster representative) — the action step that
    turns pairwise near-dup evidence into "keep one doc per duplicate
    group" for a training corpus. One left join against the (tiny,
    non-isolated-nodes-only) component labels + one cluster-size
    groupBy; docs never shuffle on text."""
    comp = connected_components(pairs, id_a=id_a, id_b=id_b)
    lab = (
        docs.select(F.col(id_col))
        .join(comp, F.col(id_col) == F.col("node"), "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("cluster_id"),
        )
    )
    sizes = lab.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return lab.join(sizes, "cluster_id").select(
        id_col,
        "cluster_id",
        "cluster_size",
        (F.col(id_col) == F.col("cluster_id")).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Incremental dedup: a new batch against an existing (indexed) corpus
# ---------------------------------------------------------------------------


def _incremental_flags(
    batch_fp: DataFrame,
    corpus_fp: DataFrame,
    batch_bands: DataFrame,
    corpus_bands: DataFrame,
    id_col: str,
    num_perm: int,
    threshold: float,
) -> DataFrame:
    """Shared core of the inline and index-backed incremental dedup:
    join the batch's fingerprints / band keys against the corpus
    index tables and fold into per-doc verdicts."""
    exact = batch_fp.join(
        corpus_fp.select("fingerprint", F.lit(True).alias("_hit")),
        "fingerprint",
        "left",
    )
    w = Window.partitionBy("fingerprint")
    flags = exact.select(
        F.col(id_col),
        F.coalesce("_hit", F.lit(False)).alias("exact_dup"),
        (F.col(id_col) > F.min(id_col).over(w)).alias("batch_dup"),
    )
    agree = F.size(
        F.filter(F.zip_with("_sb", "_sc", lambda x, y: x == y), lambda v: v)
    )
    near = (
        batch_bands.select(
            "band", "key", F.col("_id").alias(id_col), F.col("sig").alias("_sb")
        )
        .join(
            corpus_bands.select("band", "key", F.col("sig").alias("_sc")),
            ["band", "key"],
        )
        .filter(agree.cast("double") / F.lit(float(num_perm)) >= threshold)
        .select(id_col)
        .distinct()
        .withColumn("_near", F.lit(True))
    )
    return flags.join(near, id_col, "left").select(
        id_col,
        "exact_dup",
        "batch_dup",
        F.coalesce("_near", F.lit(False)).alias("near_dup"),
        (
            ~(
                F.col("exact_dup")
                | F.col("batch_dup")
                | F.coalesce("_near", F.lit(False))
            )
        ).alias("keep"),
    )


def incremental_dedup(
    corpus: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 2,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Dedup an incoming BATCH against an existing CORPUS — the
    steady-state shape of a crawl pipeline, where the 100 TB corpus is
    already deduplicated and each new crawl increment must be gated
    against it without re-deduplicating the world.

    Per batch doc: ``exact_dup`` (bag fingerprint already in the
    corpus), ``batch_dup`` (an EARLIER batch doc — smaller id — has the
    same fingerprint, so the batch stays self-consistent), ``near_dup``
    (shares an LSH band bucket with a corpus doc AND the MinHash
    signature agreement estimates Jaccard ≥ ``threshold``), and
    ``keep`` = none of the above. Batch-internal NEAR-dups are
    deliberately out of scope here — that is exactly
    :func:`minhash_lsh_pairs` over the batch, composable downstream.

    Scale shape: the batch (small) broadcasts nothing and collects
    nothing; both probes are equi-joins — fingerprint⋈fingerprint and
    (band, key)⋈(band, key) — that shuffle each side on a uniform hash
    key. The corpus side here recomputes fingerprints + signatures
    inline for oracle replayability; production uses
    :func:`build_dedup_index` once + :func:`incremental_dedup_indexed`
    per increment, which reads the SAME two tables from parquet (the
    pytest equality test pins inline ≡ indexed)."""
    rows = num_perm // bands
    batch_fp = batch.select(
        F.col(id_col), bag_fingerprint(text_col).alias("fingerprint")
    )
    corpus_fp = corpus.select(
        bag_fingerprint(text_col).alias("fingerprint")
    ).distinct()
    b_sig = minhash_signatures(batch, text_col, id_col, num_perm, shingle_n, seed)
    c_sig = minhash_signatures(corpus, text_col, id_col, num_perm, shingle_n, seed)
    return _incremental_flags(
        batch_fp,
        corpus_fp,
        _band_keys(b_sig, bands, rows),
        _band_keys(c_sig, bands, rows),
        id_col,
        num_perm,
        threshold,
    )


def build_dedup_index(
    corpus: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 2,
    seed: int = 42,
) -> None:
    """Materialize the corpus-side dedup index once per corpus: distinct
    bag fingerprints at ``{path}/fingerprints`` and LSH band keys
    (band, key, sig) at ``{path}/bands``, both repartitioned on their
    probe key so an increment's equi-join reads co-located files. The
    once-per-corpus batch job of the build→persist→serve split (same
    pattern as similarity.build_ivf_index)."""
    rows = num_perm // bands
    corpus.select(
        bag_fingerprint(text_col).alias("fingerprint")
    ).distinct().repartition(F.col("fingerprint")).write.mode(
        "overwrite"
    ).parquet(f"{path}/fingerprints")
    sigs = minhash_signatures(corpus, text_col, id_col, num_perm, shingle_n, seed)
    _band_keys(sigs, bands, rows).select(
        "band", "key", "sig"
    ).repartition(F.col("band"), F.col("key")).write.mode("overwrite").parquet(
        f"{path}/bands"
    )


def incremental_dedup_indexed(
    spark,
    path: str,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 2,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Serve incremental dedup from a persisted :func:`build_dedup_index`
    — the corpus is never rescanned; only its two index tables are
    read. Output ≡ :func:`incremental_dedup` (pytest-pinned)."""
    rows = num_perm // bands
    batch_fp = batch.select(
        F.col(id_col), bag_fingerprint(text_col).alias("fingerprint")
    )
    b_sig = minhash_signatures(batch, text_col, id_col, num_perm, shingle_n, seed)
    return _incremental_flags(
        batch_fp,
        spark.read.parquet(f"{path}/fingerprints"),
        _band_keys(b_sig, bands, rows),
        spark.read.parquet(f"{path}/bands"),
        id_col,
        num_perm,
        threshold,
    )


# ---------------------------------------------------------------------------
# SemDeDup: semantic (embedding-space) dedup keep-list
# ---------------------------------------------------------------------------


def semdedup_keeplist(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    n_assign: int = 4,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, public): cluster the embedding
    space, call any within-cluster pair with cosine above ``threshold``
    a semantic duplicate, and keep ONE representative per duplicate
    group. The published recipe is k-means + within-cluster pairwise
    cosine + a keep-one sweep; here each stage is the engine's existing
    scale-shaped primitive, composed:

    * candidate pairs: :func:`embedding_pairs_bucketed` — IVF bucket
      co-membership (multi-probe ``n_assign``) + exact unit-cosine
      verify as one BLAS matmul per bucket; no CartesianProduct.
    * duplicate groups: :func:`connected_components` (large-star /
      small-star, O(log n) rounds) via :func:`neardup_clusters` —
      SemDeDup's "keep one per group" needs TRANSITIVE groups, not raw
      pairs (A≈B, B≈C must collapse to one kept vector even if A̸≈C).
    * keep rule: smallest id per component — deterministic on any
      cluster (the paper keeps a random member; a fixed representative
      is the reproducible choice and what the parity harness needs).

    Output: ``(vec_id, cluster_id, cluster_size, keep)`` — one row per
    input vector; singletons keep themselves.
    """
    pairs = embedding_pairs_bucketed(
        emb,
        threshold=threshold,
        id_col=id_col,
        vec_col=vec_col,
        n_centroids=n_centroids,
        n_assign=n_assign,
    )
    return neardup_clusters(emb, pairs, id_col=id_col)


def cluster_keep_best(
    docs: DataFrame,
    pairs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Quality-aware canonical keep-list: like :func:`neardup_clusters`
    but the kept representative of each duplicate cluster is the doc
    with the HIGHEST ``score_col`` (ties → smallest id) instead of the
    smallest id — the "keep the longest / highest-quality copy" rule a
    production dedup pass actually wants (the min-id pick is
    deterministic but quality-blind: it happily keeps the truncated
    crawl of a page and drops the full one).

    Output per doc: ``score_col``, ``cluster_id`` (min reachable id —
    the stable cluster LABEL stays min-id so cluster identity never
    depends on the score column), ``cluster_size``, ``rep_id`` (the
    argmax-score member) and ``keep`` = (doc == rep). Requires a
    numeric ``id_col`` (the deterministic tie-break negates it).

    Scale shape: identical to ``neardup_clusters`` — component labels
    from O(log n) large-star/small-star rounds on the (tiny) pair
    graph, one left join against the label table, and ONE extra
    aggregate on the cluster key whose state is O(1) per cluster
    (``max_by`` over a (score, -id) struct — no member lists). Docs
    never shuffle on text.
    """
    comp = connected_components(pairs, id_a=id_a, id_b=id_b)
    lab = (
        docs.select(F.col(id_col), F.col(score_col))
        .join(comp, F.col(id_col) == F.col("node"), "left")
        .select(
            id_col,
            score_col,
            F.coalesce("component", F.col(id_col)).alias("cluster_id"),
        )
    )
    reps = lab.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size"),
        F.max_by(
            F.col(id_col),
            F.struct(
                F.coalesce(
                    F.col(score_col).cast("double"), F.lit(float("-inf"))
                ).alias("s"),
                (-F.col(id_col)).alias("t"),
            ),
        ).alias("rep_id"),
    )
    return lab.join(reps, "cluster_id").select(
        id_col,
        score_col,
        "cluster_id",
        "cluster_size",
        "rep_id",
        (F.col(id_col) == F.col("rep_id")).alias("keep"),
    )


def dedup_threshold_curve(
    pairs: DataFrame,
    docs: DataFrame,
    thresholds: tuple = (0.5, 0.6, 0.7, 0.8, 0.9),
    id_col: str = "doc_id",
    sim_col: str = "est_jaccard",
    nd: int = 6,
) -> DataFrame:
    """Dedup threshold-sweep table: for each candidate similarity
    threshold, how many near-dup pairs fire and how much of the corpus
    the drop-higher-id policy would remove — the table the "which
    threshold?" curation decision is actually made from (a threshold
    is a removal-rate dial; picking it blind to the curve is guessing).

    One pass over the candidate-pair table: every threshold is a
    conditional aggregate (n_pairs, distinct dropped docs via the
    max-threshold-per-doc trick below), corpus size rides a one-row
    broadcast. Output one row per threshold: ``(threshold, n_pairs,
    n_docs_dropped, drop_frac)``.

    The distinct-dropped count per threshold does NOT re-scan pairs
    per threshold: each doc's DROP LEVEL is its maximum similarity as
    the higher id of any pair (one map-side groupBy), and a doc is
    dropped at threshold t iff drop_level ≥ t — so the sweep is a
    |thresholds| × |dropped docs| conditional count over the tiny
    per-doc level table. Pairs table shape is whatever the candidate
    generator produced (banded LSH — never cartesian).
    """
    levels = pairs.groupBy(F.col("id_b").alias(id_col)).agg(
        F.max(sim_col).alias("_lvl")
    )
    n_docs = docs.select(F.count(F.lit(1)).cast("bigint").alias("_n"))
    aggs = []
    for t in thresholds:
        aggs.append(
            F.sum((F.col("_lvl") >= t).cast("int"))
            .cast("bigint")
            .alias(f"_d_{int(t * 100)}")
        )
    lvl_agg = levels.agg(*aggs)
    pair_aggs = [
        F.sum((F.col(sim_col) >= t).cast("int"))
        .cast("bigint")
        .alias(f"_p_{int(t * 100)}")
        for t in thresholds
    ]
    p_agg = pairs.agg(*pair_aggs)
    structs = [
        F.struct(
            F.lit(float(t)).alias("threshold"),
            F.col(f"_p_{int(t * 100)}").alias("n_pairs"),
            F.col(f"_d_{int(t * 100)}").alias("n_docs_dropped"),
        )
        for t in thresholds
    ]
    out = (
        p_agg.crossJoin(lvl_agg)
        .crossJoin(F.broadcast(n_docs))
        .select(F.col("_n"), F.explode(F.array(*structs)).alias("_s"))
        .select(
            F.col("_s.threshold").alias("threshold"),
            F.col("_s.n_pairs").alias("n_pairs"),
            F.col("_s.n_docs_dropped").alias("n_docs_dropped"),
            (
                F.round(
                    F.col("_s.n_docs_dropped").cast("double") / F.col("_n"),
                    nd,
                )
                + F.lit(0.0)
            ).alias("drop_frac"),
        )
    )
    return out
