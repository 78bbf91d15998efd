"""In-plan HyperLogLog (Flajolet–Fusy–Gandouet–Meunier 2007): estimate
per-group distinct-key counts without ever shuffling the keys — the
cardinality sibling of the in-plan Bloom filter (membership,
:mod:`sparkfeat.bloom`) and count-min sketch (frequency,
:mod:`sparkfeat.cms`), built from the same deterministic
md5/positional-hex recipe so the whole estimate replays bit-for-bit in
any engine with md5.

Why not ``approx_count_distinct``: Spark's built-in is a JVM HLL++
whose sketch internals (and therefore exact estimates) are not
reproducible outside Spark — unusable under this repo's value-hash
oracle gate. Why not exact ``countDistinct``: at 100 TB the per-group
distinct n-gram count materializes ~10¹¹ (group, gram) rows through a
hash exchange; the HLL build shuffles AT MOST groups × m register rows
(map-side max-combined) regardless of key count.

Construction (m = 64 registers, b = 6 index bits from a 48-bit md5
integer): register ``j = h >> 42``; suffix ``w = h mod 2⁴²``;
``ρ = 43 − bit_length(w)`` (leading-zero count + 1, computed as an
exact 42-term threshold CASE — no float log); per (group, j) the
register is ``max(ρ)``; the harmonic sum folds ``1 / (1 << M_j)`` —
every term an EXACT power of two, partial sums exact in a double
(value span 43 bits + 6 carry bits < 53-bit mantissa), so the sum is
order-independent and engine-exact. Raw estimate ``α₆₄·m²/S`` with
α₆₄ = 0.709; the standard small-range correction switches to linear
counting ``m·ln(m/V)`` when ``E ≤ 2.5m`` and V (empty registers) > 0 —
``ln`` is the only libm call and is canonicalized to 9 dp immediately
(the pow-in-temperature_weights convention). Standard error
≈ 1.04/√m ≈ 13% at m = 64; raise m for tighter estimates (b = log₂ m
and the suffix width adjust together).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparkfeat.bloom import _h12

#: registers (2^B_BITS) and md5-suffix width; m=64 keeps the pytest
#: register space small enough that real collisions occur.
B_BITS = 6
M_REGS = 1 << B_BITS
W_BITS = 48 - B_BITS
ALPHA_64 = 0.709


def _bit_length(w: Column) -> Column:
    """Exact bit_length of a non-negative < 2^W_BITS integer Column via
    a threshold CASE chain (no float log — log2 rounds untrustworthily
    at exact-power boundaries and differs across libm builds)."""
    c = F.when(w >= F.lit(1 << (W_BITS - 1)), W_BITS)
    for b in range(W_BITS - 2, -1, -1):
        c = c.when(w >= F.lit(1 << b), b + 1)
    return c.otherwise(0)


def hll_distinct(
    df: DataFrame,
    key: Column,
    group_col: str = "source",
    out_col: str = "est_distinct",
) -> DataFrame:
    """Per-group HLL distinct estimate of ``key``.

    Output: ``(group_col, regs_hit, est_distinct)`` — ``regs_hit`` the
    number of non-empty registers (diagnostic + the linear-count
    input), ``est_distinct`` rounded to 3 dp.

    Scale shape: one map pass derives (group, register, ρ); ONE
    map-side-combined ``groupBy(group, register) max(ρ)`` shuffles at
    most groups × m rows; the fold to the estimate is a second
    aggregate over those register rows. The 100 TB key stream never
    hash-exchanges. NULL keys are dropped (SQL COUNT DISTINCT
    convention).
    """
    per = hll_registers(df, key, group_col).groupBy(group_col).agg(
        F.count(F.lit(1)).cast("int").alias("regs_hit"),
        # shiftleft with a COLUMN bit count needs the SQL form (the
        # Python wrapper only takes an int literal); exact power of two
        F.sum(F.lit(1.0) / F.expr("shiftleft(cast(1 as bigint), _m)")).alias(
            "_s_present"
        ),
    )
    return per.select(
        group_col,
        "regs_hit",
        F.round(_estimate_from(F.col("regs_hit"), F.col("_s_present")), 3).alias(
            out_col
        ),
    )


def hll_registers(
    df: DataFrame, key: Column, group_col: str = "source"
) -> DataFrame:
    """The mergeable form: per-group register table ``(group, _j,
    _m)`` — max-folded, at most m rows per group. Registers are the
    HLL's whole state: union of key sets == elementwise max of
    registers, which is what makes the sketch mergeable across
    partitions, days, or sources without touching keys again."""
    h = _h12(key, "hll")
    return (
        df.filter(key.isNotNull())
        .select(
            F.col(group_col),
            F.shiftright(h, W_BITS).cast("int").alias("_j"),
            (F.lit(W_BITS + 1) - _bit_length(h % F.lit(1 << W_BITS)))
            .cast("int")
            .alias("_rho"),
        )
        .groupBy(group_col, "_j")
        .agg(F.max("_rho").alias("_m"))
    )


def _estimate_from(regs_hit: Column, s_present: Column) -> Column:
    """The shared estimate fold: harmonic count + small-range linear
    correction, exactly as :func:`hll_distinct` documents."""
    s = s_present + (F.lit(M_REGS) - regs_hit).cast("double")
    v = F.lit(M_REGS) - regs_hit
    e_raw = F.lit(ALPHA_64 * M_REGS * M_REGS) / s
    e_lin = F.round(
        F.lit(float(M_REGS)) * F.log(F.lit(float(M_REGS)) / v.cast("double")), 9
    )
    return F.when((e_raw <= F.lit(2.5 * M_REGS)) & (v > 0), e_lin).otherwise(e_raw)


def hll_overlap(
    regs: DataFrame, group_col: str = "source", min_jaccard: float = 0.0
) -> DataFrame:
    """Pairwise distinct-set overlap between groups from their register
    tables alone — inclusion–exclusion on mergeable sketches:
    ``|A∪B|`` is the estimate of the elementwise-max registers, so
    ``|A∩B| ≈ |A| + |B| − |A∪B|`` and Jaccard follows. The
    source-overlap planning tool ("which crawls share vocabulary /
    boilerplate?") at a cost independent of corpus size: the input is
    ≤ m rows per group, the pair join is (groups·m × groups·m) on the
    register index — never the keys. Pairs are canonical (a < b).

    Output: ``(src_a, src_b, est_a, est_b, est_union, est_inter,
    jaccard)`` — intersection floored at 0 (inclusion–exclusion on
    independent ±13% estimates can go slightly negative on disjoint
    sets), everything rounded to 3 dp.
    """
    full = F.sequence(F.lit(0), F.lit(M_REGS - 1))
    dense = regs.groupBy(group_col).agg(
        F.map_from_entries(F.collect_list(F.struct("_j", "_m"))).alias("_mp")
    ).select(
        F.col(group_col).alias("_g"),
        F.transform(
            full,
            lambda i: F.coalesce(F.element_at(F.col("_mp"), i.cast("int")), F.lit(0)),
        ).alias("_regs"),
    )
    a, b = dense.alias("a"), dense.alias("b")
    pairs = a.join(b, F.col("a._g") < F.col("b._g"))

    # exact 2^k lookup table (the fold must use the same exact
    # power-of-two arithmetic as the build path, never float pow)
    pow2 = F.array(*[F.lit(float(1 << k)) for k in range(W_BITS + 2)])

    def est_of(arr: Column) -> Column:
        hit = F.size(F.filter(arr, lambda m: m > 0))
        sp = F.aggregate(
            F.filter(arr, lambda m: m > 0),
            F.lit(0.0),
            lambda acc, m: acc + F.lit(1.0) / F.element_at(pow2, m + 1),
        )
        return _estimate_from(hit, sp)

    ua = F.zip_with(
        F.col("a._regs"), F.col("b._regs"), lambda x, y: F.greatest(x, y)
    )
    ea, eb, eu = est_of(F.col("a._regs")), est_of(F.col("b._regs")), est_of(ua)
    inter = F.greatest(F.lit(0.0), ea + eb - eu)
    out = pairs.select(
        F.col("a._g").alias("src_a"),
        F.col("b._g").alias("src_b"),
        F.round(ea, 3).alias("est_a"),
        F.round(eb, 3).alias("est_b"),
        F.round(eu, 3).alias("est_union"),
        F.round(inter, 3).alias("est_inter"),
        F.round(inter / eu, 3).alias("jaccard"),
    )
    if min_jaccard > 0.0:
        out = out.filter(F.col("jaccard") >= F.lit(float(min_jaccard)))
    return out
