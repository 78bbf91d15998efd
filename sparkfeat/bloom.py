"""In-plan Bloom filter (Bloom 1970): build a packed bit-array
membership sketch from a key table and probe it map-only — no driver
collect, no JVM sketch objects, no UDFs; the filter is ordinary Column
algebra end to end, so it replays bit-for-bit in any engine with md5.

Why it exists: the broadcast-set decontamination path
(:func:`sparkfeat.corpus.decontaminate`) ships the benchmark's DISTINCT
gram hash STRINGS to every executor — fine for MB-scale eval sets, but
a 10⁹-key reference set is ~32 GB of md5 strings and stops
broadcasting. Bits don't: at 10 bits/key the same set is ~1.2 GB of
``bigint`` words (k=5 → ~1% false positives, tunable), so the gate
stays a broadcast and the 100 TB side stays map-only. False positives
are one-sided (a Bloom hit may be wrong, a miss never is), so the
filter is used to flag/route, with an exact confirm pass over the
flagged minority when exactness matters.

Engine-portable bit layout: 63 usable bits per word. DuckDB (and other
overflow-checked engines) reject ``1::BIGINT << 63``, and capping the
shift at 62 also keeps every word non-negative — no two's-complement /
arithmetic-shift traps anywhere. Masks come from a 63-element literal
powers-of-two array (``element_at``), never a runtime shift by a
column.

Hash family: Kirsch–Mitzenmacher double hashing (2006) — position i =
``(h1 + i·h2) mod n_bits`` from exactly TWO md5s per key (``h1`` from
``md5('h1:' key)``, ``h2`` odd-ized into [1, n_bits)), asymptotically
the same FPR as k independent hashes at 2/k of the probe-side hash
cost; each hash is the first 12 hex digits (48 bits — exact in a
double AND a bigint everywhere) of the md5, the same positional-hex
construction as :func:`sparkfeat.corpus.hash_bucket`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: usable bits per bigint word — see module docstring.
BITS_PER_WORD = 63


def _powers() -> Column:
    """[1, 2, 4, ..., 2^62] as a literal array<bigint> (mask lookup)."""
    return F.array(*[F.lit(1 << b).cast("bigint") for b in range(BITS_PER_WORD)])


def _h12(key: Column, salt: str) -> Column:
    """48-bit integer from the first 12 hex digits of md5(salt ':' key)."""
    h = F.md5(F.concat_ws(":", F.lit(salt), key.cast("string")))
    return F.conv(F.substring(h, 1, 12), 16, 10).cast("bigint")


def _h1_h2(key: Column, n_bits) -> tuple[Column, Column]:
    """The Kirsch–Mitzenmacher pair: h1 in [0, n_bits), h2 in
    [1, n_bits) (never 0, so the k probe positions never collapse)."""
    h1 = _h12(key, "h1") % n_bits
    h2 = _h12(key, "h2") % (n_bits - 1) + 1
    return h1, h2


def bloom_build(
    keys: DataFrame,
    key_col: str = "key",
    n_words: int = 256,
    n_hashes: int = 5,
) -> DataFrame:
    """Build the filter: ONE row, ``words`` = array<bigint>[n_words]
    plus the (n_words, n_hashes) geometry the probe needs.

    Scale shape: keys explode to k bit positions (map), ONE
    map-side-combined ``groupBy(word_idx)`` bit_or — at most ``n_words``
    rows ever shuffle, regardless of key count — then the dense packed
    array is one tiny aggregate row (map_from_entries + a
    sequence-transform fill, zeros where no key landed). Size the
    filter as n_words ≈ keys × bits_per_key / 63 (10 bits/key and
    k = 5-7 gives ~1% FPR).
    """
    n_bits = n_words * BITS_PER_WORD
    h1, h2 = _h1_h2(F.col(key_col), F.lit(n_bits))
    pos = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_hashes - 1)),
            lambda i: (F.col("_h1") + i.cast("bigint") * F.col("_h2"))
            % F.lit(n_bits),
        )
    ).alias("pos")
    bits = keys.select(h1.alias("_h1"), h2.alias("_h2")).select(pos).select(
        (F.col("pos") / BITS_PER_WORD).cast("int").alias("word_idx"),
        (F.col("pos") % BITS_PER_WORD).cast("int").alias("bit"),
    )
    sparse = bits.groupBy("word_idx").agg(
        F.bit_or(F.element_at(_powers(), F.col("bit") + 1)).alias("word")
    )
    return sparse.agg(
        F.map_from_entries(F.collect_list(F.struct("word_idx", "word"))).alias("_m")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col("_m"), i.cast("int")), F.lit(0).cast("bigint")
            ),
        ).alias("words"),
        F.lit(n_words).alias("n_words"),
        F.lit(n_hashes).alias("n_hashes"),
    )


def bloom_gate(
    df: DataFrame,
    key: Column,
    bloom: DataFrame,
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Append ``out_col`` = probable-membership of ``key`` in the
    filter built by :func:`bloom_build`. The one-row filter broadcasts
    (a cross-join of one row is a map operator under AQE); the k bit
    tests are a ``forall`` over pure Column algebra — the probed side
    is never shuffled and never sees the key set itself.
    """
    n_bits = (F.col("n_words") * BITS_PER_WORD).cast("bigint")

    def _bit_set(i: Column) -> Column:
        pos = (F.col("_h1") + i.cast("bigint") * F.col("_h2")) % n_bits
        word = F.element_at(F.col("words"), (pos / BITS_PER_WORD).cast("int") + 1)
        mask = F.element_at(_powers(), (pos % BITS_PER_WORD).cast("int") + 1)
        return word.bitwiseAND(mask) != 0

    hit = F.forall(F.sequence(F.lit(0), F.col("n_hashes") - 1), _bit_set)
    h1, h2 = _h1_h2(key, n_bits)
    return (
        df.crossJoin(F.broadcast(bloom))
        .withColumn("_h1", h1)
        .withColumn("_h2", h2)
        .withColumn(out_col, hit)
        .drop("words", "n_words", "n_hashes", "_h1", "_h2")
    )
