"""Text analysis for large-scale training-data pipelines: token stats,
quality scoring, language heuristic, fingerprinting.

All hot-path expressions are JVM Column expressions (whole-stage
codegen); the only Python crossing is the 64-bit rolling-hash
fingerprint (Arrow pandas UDF, vectorized numpy).

These operate on the ``documents`` table (doc_id, text, lang, source,
n_chars) but take column names, so they compose with the transcript
``text`` column too.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

#: tiny English stopword list used by the ratio features and the lang
#: heuristic; fixed and duplicated into the SQL oracles — do not reorder.
STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

PUNCT_CLASS = r"[.,!?;:'\"()\[\]{}]"


def tokens(text: str | Column) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, r"\s+")


def token_count(text: str | Column) -> Column:
    """Whitespace token count (the whitespace tokenizer baseline)."""
    return F.size(tokens(text))


def bpe_ish_token_count(text: str | Column) -> Column:
    """BPE-ish token estimate: count of word/number/punct chunks after
    splitting on a GPT-2-style coarse pattern (letters runs, digit runs,
    single punctuation). Upper-bounds real BPE within ~20% on English."""
    c = F.col(text) if isinstance(text, str) else text
    # one token per letter-run, digit-run, or non-space symbol
    chunks = F.regexp_extract_all(c, F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"), 1)
    return F.size(chunks)


def distinct_token_count(text: str | Column) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def type_token_ratio(text: str | Column) -> Column:
    return distinct_token_count(text).cast("double") / token_count(text)


def stopword_ratio(text: str | Column) -> Column:
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return hits.cast("double") / F.size(toks)


def punct_ratio(text: str | Column) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    stripped = F.regexp_replace(c, PUNCT_CLASS, "")
    return (F.length(c) - F.length(stripped)).cast("double") / F.length(c)


def avg_word_len(text: str | Column) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    no_space = F.regexp_replace(c, r"\s+", "")
    return F.length(no_space).cast("double") / token_count(c)


def quality_score(text: str | Column) -> Column:
    """Heuristic document quality in [0, 1] — the standard pretraining
    filter family (length, lexical diversity, stopword band, word
    length). Deterministic closed form; weights fixed."""
    ntok = token_count(text).cast("double")
    ttr = type_token_ratio(text)
    stop = stopword_ratio(text)
    awl = avg_word_len(text)
    len_term = F.least(ntok / F.lit(50.0), F.lit(1.0))
    stop_term = F.lit(1.0) - F.least(F.abs(stop - F.lit(0.4)) / F.lit(0.4), F.lit(1.0))
    awl_term = F.least(awl / F.lit(8.0), F.lit(1.0))
    return 0.25 * len_term + 0.25 * ttr + 0.25 * stop_term + 0.25 * awl_term


def lang_guess(text: str | Column, threshold: float = 0.08) -> Column:
    """n-gram-free language heuristic: English stopword density. A real
    deployment swaps in per-language stopword tables; the operator shape
    (pure Column expression, no UDF) is the point."""
    return F.when(stopword_ratio(text) >= threshold, F.lit("en")).otherwise(
        F.lit("unknown")
    )


def _sorted_run_counts(arr: Column) -> Column:
    """Per-distinct-value counts of a string array in O(n log n), pure
    Column algebra: ``array_sort`` groups equal values into runs; a run
    START is a position whose predecessor differs, a run END one whose
    successor differs; the k-th start pairs with the k-th end (runs
    cannot nest), so ``zip_with(ends, starts)`` yields per-run lengths.
    Emits ``array<struct<neg:int, tri:string>>`` with ``neg`` = -count,
    so a plain ``array_sort`` on the result orders by count desc, value
    asc — the Cavnar–Trenkle profile order. Replaces the earlier nested
    filter-count (O(distinct·n) per doc — quadratic on 100 KB docs).

    Construction note: every lambda below reads ONLY its bound
    variables. An outer array referenced inside a higher-order-function
    lambda (e.g. ``element_at(sorted, i)``) is re-evaluated per element
    by Catalyst — that turns the scan into O(n² log n). Hence the
    shifted-copy zips instead of indexed lookups."""
    s = F.array_sort(arr)
    n = F.size(s)
    null1 = F.array(F.lit(None).cast("string"))
    prv = F.when(n >= 2, F.concat(null1, F.slice(s, 1, n - 1))).otherwise(null1)
    nxt = F.when(n >= 2, F.concat(F.slice(s, 2, n - 1), null1)).otherwise(null1)

    def _boundaries(neighbor: Column) -> Column:
        pairs = F.zip_with(
            s,
            neighbor,
            lambda a, b: F.struct(a.alias("val"), b.alias("nb")),
        )
        indexed = F.transform(
            pairs,
            lambda p, i: F.struct(
                (i + F.lit(1)).alias("pos"),
                p["val"].alias("val"),
                p["nb"].alias("nb"),
            ),
        )
        return F.filter(indexed, lambda q: q["nb"].isNull() | (q["nb"] != q["val"]))

    counted = F.zip_with(
        _boundaries(nxt),  # run ends, in order
        _boundaries(prv),  # run starts, in order
        lambda e, st: F.struct(
            (-(e["pos"] - st["pos"] + F.lit(1))).alias("neg"),
            e["val"].alias("tri"),
        ),
    )
    empty = F.array().cast("array<struct<neg:int,tri:string>>")
    return F.when(n >= 1, counted).otherwise(empty)


def top_bigram_fraction(text: str | Column) -> Column:
    """Repetition signal: fraction of tokens covered by the single most
    frequent word bigram (Gopher/Rae et al. repetition filters use
    exactly this family). Pure Column algebra, O(n log n) per doc via
    sort-and-run-scan (``_sorted_run_counts``), JVM-side."""
    toks = tokens(F.lower(text if isinstance(text, Column) else F.col(text)))
    n = F.size(toks)
    # zip the token array against its shift-by-one — NOT
    # element_at(toks, i+2) inside the lambda, which would re-evaluate
    # the whole split per element (quadratic in doc length).
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    )
    top = -F.array_min(
        F.transform(_sorted_run_counts(bigrams), lambda st: st["neg"])
    )
    return F.when(
        n >= 2, (top * 2).cast("double") / n.cast("double")
    ).otherwise(F.lit(0.0))


def duplicate_line_fraction(text: str | Column) -> Column:
    """Repetition signal: fraction of lines that are duplicates of an
    earlier line (1 − distinct/total over newline-split lines)."""
    c = text if isinstance(text, Column) else F.col(text)
    lines = F.split(c, "\n")
    n = F.size(lines)
    return (
        F.lit(1.0) - F.size(F.array_distinct(lines)).cast("double") / n.cast("double")
    )


def symbol_word_ratio(text: str | Column) -> Column:
    """Gopher rule input: symbol characters (#, …, ellipsis dots) per
    whitespace word."""
    c = text if isinstance(text, Column) else F.col(text)
    n_sym = F.length(c) - F.length(F.regexp_replace(c, r"[#…]|\.\.\.", ""))
    return n_sym.cast("double") / token_count(c).cast("double")


def gopher_quality_pass(
    text: str | Column,
    min_words: int = 5,
    max_words: int = 100_000,
    min_avg_word_len: float = 2.0,
    max_avg_word_len: float = 12.0,
    max_symbol_ratio: float = 0.1,
    max_top_bigram_frac: float = 0.5,
    min_stopword_hits: int = 1,
) -> Column:
    """Composite Gopher-style document gate (Rae et al. 2021 §A1.1
    family, thresholds tuned for short synthetic docs): word-count
    bounds, mean-word-length band, symbol-to-word ceiling, top-bigram
    repetition ceiling, and a minimum number of distinct stopwords.
    Pure whole-stage-codegen expressions — the shape of a trillion-token
    pretraining filter pass."""
    toks = tokens(text)
    n = F.size(toks)
    distinct_stops = F.size(
        F.array_intersect(
            F.array_distinct(tokens(F.lower(text if isinstance(text, Column) else F.col(text)))),
            F.array(*[F.lit(s) for s in STOPWORDS]),
        )
    )
    return (
        (n >= min_words)
        & (n <= max_words)
        & (avg_word_len(text) >= min_avg_word_len)
        & (avg_word_len(text) <= max_avg_word_len)
        & (symbol_word_ratio(text) <= max_symbol_ratio)
        & (top_bigram_fraction(text) <= max_top_bigram_frac)
        & (distinct_stops >= min_stopword_hits)
    )


# ---------------------------------------------------------------------------
# n-gram language ID (Cavnar–Trenkle-style profile match, Column algebra)
# ---------------------------------------------------------------------------

#: deterministic seed text per language (composed here; public common
#: vocabulary) — profiles are the top character trigrams of these.
_LANG_SEEDS = {
    "en": (
        "the quick brown fox jumps over the lazy dog and then it runs to "
        "the river where the water is cold and the light of the morning "
        "sun is soft with all of the things that we know and love here"
    ),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund und dann "
        "läuft er zum fluss wo das wasser kalt ist und das licht der "
        "morgensonne weich ist mit allen dingen die wir kennen und lieben"
    ),
    "fr": (
        "le renard brun rapide saute par dessus le chien paresseux et puis "
        "il court vers la rivière où l'eau est froide et la lumière du "
        "matin est douce avec toutes les choses que nous aimons ici"
    ),
    "es": (
        "el rápido zorro marrón salta sobre el perro perezoso y luego "
        "corre hacia el río donde el agua está fría y la luz de la mañana "
        "es suave con todas las cosas que conocemos y amamos aquí"
    ),
}


def _seed_profile(seed: str, k: int = 40) -> list[str]:
    """Top-k character trigrams of the seed by (count desc, trigram asc)
    — plain python, evaluated once at plan-build time."""
    from collections import Counter

    tris = [seed[i : i + 3] for i in range(len(seed) - 2)]
    counts = Counter(tris)
    return [t for t, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]]


LANG_PROFILES = {lang: _seed_profile(s) for lang, s in _LANG_SEEDS.items()}


def char_trigrams(text: str | Column) -> Column:
    """All character trigrams of the lowercased text (Column algebra:
    split to a char array, zip three shifted copies — NOT
    ``substr(i, 3)`` inside a transform lambda, which re-evaluates the
    lowered string per position and goes quadratic on 100 KB docs)."""
    c = F.lower(text if isinstance(text, Column) else F.col(text))
    chars = F.split(c, "")
    m = F.length(c) - 2  # number of trigrams
    pair = F.zip_with(
        F.slice(chars, 1, m),
        F.slice(chars, 2, m),
        lambda a, b: F.concat(a, b),
    )
    tri = F.zip_with(
        pair, F.slice(chars, 3, m), lambda ab, cch: F.concat(ab, cch)
    )
    return F.when(F.length(c) >= 3, tri).otherwise(
        F.array().cast("array<string>")
    )


def lang_ngram_guess(
    text: str | Column, top_k: int = 40, min_overlap: int = 3
) -> Column:
    """Cavnar–Trenkle-style n-gram language ID, whole-stage codegen:
    the doc's ``top_k`` character trigrams (by count desc, trigram asc)
    are intersected with each language's seed profile; the language with
    the largest overlap wins (score ties → lexicographically last
    language, deterministic), overlaps below ``min_overlap`` →
    'unknown'. A production system swaps the embedded seed profiles for
    corpus-trained ones — the operator shape (no UDF, replayable in SQL)
    is the point."""
    tris = char_trigrams(text)
    counted = _sorted_run_counts(tris)
    doc_top = F.transform(
        F.slice(F.array_sort(counted), 1, top_k), lambda s: s["tri"]
    )
    scored = F.array(
        *[
            F.struct(
                F.size(
                    F.array_intersect(
                        doc_top, F.array(*[F.lit(t) for t in prof])
                    )
                ).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, prof in LANG_PROFILES.items()
        ]
    )
    best = F.array_max(scored)
    return F.when(best["score"] >= min_overlap, best["lang"]).otherwise(
        F.lit("unknown")
    )


def content_fingerprint(text: str | Column) -> Column:
    """Canonical content hash: lowercase, collapse whitespace, md5.
    Exact-dup key that survives case/spacing jitter."""
    c = F.col(text) if isinstance(text, str) else text
    norm = F.regexp_replace(F.lower(c), r"\s+", " ")
    return F.md5(norm)


def bag_fingerprint(text: str | Column) -> Column:
    """Bag-of-words hash: md5 of the sorted distinct token set — keys
    word-order-insensitive duplicates (template/permutation dups)."""
    c = F.col(text) if isinstance(text, str) else text
    bag = F.array_join(F.array_sort(F.array_distinct(tokens(F.lower(c)))), " ")
    return F.md5(bag)


def content_fp64(text: str | Column) -> Column:
    """Compact 8-byte content key: signed lower-64 md5 of the case- and
    whitespace-normalized text (same normalization as
    ``content_fingerprint``, same md5-lower-64 convention as MinHash) —
    the dedup/join key you'd carry at 10^12 docs when a 32-byte hex md5
    is too fat. The SQL oracle replays it via ``md5_number_lower``."""
    c = F.col(text) if isinstance(text, str) else text
    norm = F.regexp_replace(F.lower(c), r"\s+", " ")

    @F.pandas_udf(LongType())
    def fp(texts: pd.Series) -> pd.Series:
        # null-preserving: hash only the non-null slots (None.encode()
        # would otherwise kill the batch — same hazard class as the
        # lang-ID kernel's null guard).
        mask = texts.notna()
        out = pd.Series([None] * len(texts), dtype="object")
        if mask.any():
            vals = md5_lower64_np(texts[mask]).astype(np.int64)
            out[mask] = list(vals)
        return out

    return fp(norm)


def fingerprint_summary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document fingerprint panel: canonical content md5, the compact
    signed-64 key, the duplicate-group size under the content key, and a
    flag for docs that are duplicates only under the word-order-insensitive
    bag key (shuffled/templated copies the content hash misses).

    Group sizes come from ``groupBy``-count + equi-join-back, NOT a
    ``Window.partitionBy(fp)``: a boilerplate document repeated 10⁸×
    makes one degenerate duplicate group, and a window materializes the
    whole group in one un-splittable task, while the groupBy combines
    map-side (the hot key arrives at the reducer as a handful of
    partial counts) and the join-back is an equi-join AQE's skew-join
    CAN split. Same shuffle count (one per key), no hot partition.

    Row-preserving: docs with a NULL text hash to NULL fingerprints,
    which an inner equi-join would silently drop (NULL never equals
    NULL) — so the join-backs are LEFT joins with the group count
    coalesced to 1 (a null-text doc is its own singleton group), and
    the panel always has exactly one row per input doc."""
    d = docs.select(
        "doc_id",
        content_fingerprint(text_col).alias("content_fp"),
        content_fp64(text_col).alias("fp64"),
        bag_fingerprint(text_col).alias("bag_fp"),
    )
    cg = d.groupBy("content_fp").agg(F.count(F.lit(1)).alias("_content_group"))
    bg = d.groupBy("bag_fp").agg(F.count(F.lit(1)).alias("_bag_group"))
    return (
        d.join(cg, "content_fp", "left")
        .join(bg, "bag_fp", "left")
        .select(
            "doc_id",
            "content_fp",
            "fp64",
            F.coalesce("_content_group", F.lit(1)).alias("content_group"),
            (
                F.coalesce("_bag_group", F.lit(1))
                > F.coalesce("_content_group", F.lit(1))
            ).alias("reorder_only_dup"),
        )
    )


def md5_lower64_np(strings) -> np.ndarray:
    """Lower 64 bits of md5 per string — defined as the little-endian
    integer of digest bytes 8..16, exactly DuckDB's ``md5_number_lower``.
    This is the token/shingle hash for MinHash and SimHash so their SQL
    oracles can replay signatures bit-for-bit."""
    import hashlib

    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[8:], "little")
            for s in strings
        ),
        dtype=np.uint64,
        count=len(strings),
    )


_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def _fnv1a_bytes(data: bytes) -> np.uint64:
    h = _FNV_OFFSET
    for b in data:
        h = np.uint64((int(h) ^ b) * int(_FNV_PRIME) & 0xFFFFFFFFFFFFFFFF)
    return h


def fnv1a64_np(strings: pd.Series) -> np.ndarray:
    """Vectorized-ish FNV-1a 64 over a string series (per-value loop in
    C-speed bytes; fine for fingerprint columns, not the hot path)."""
    return np.fromiter(
        (int(_fnv1a_bytes(s.encode("utf-8"))) for s in strings),
        dtype=np.uint64,
        count=len(strings),
    )


#: winnowing packs (hash, position) into ONE bigint so the rightmost-min
#: window selection is a plain MIN over a window frame in any engine:
#: key = h40·2^20 + (2^20−1−pos). 40-bit hash + 20-bit position = 60
#: bits < the 63-bit signed range; min(key) ⇔ (min hash, then MAX
#: position) — exactly the paper's tie-break.
WINNOW_POS_BITS = 20
_WPOS = 1 << WINNOW_POS_BITS


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
    2003 — the MOSS scheme): hash every char k-gram of the normalized
    text, slide a window of ``w`` consecutive hashes, and in each
    window select the minimum hash (rightmost occurrence on ties).
    Guarantee: any substring match of length ≥ w+k−1 between two
    documents shares at least one selected fingerprint, and no match
    shorter than k is ever detected — the LOCAL fingerprinting
    guarantee MinHash (a global sketch) cannot give, which is why this
    is the scheme for partial-overlap/plagiarism-style dedup while
    MinHash serves whole-document near-dup.

    All-JVM-codegen column algebra, one doc_id window pass: k-grams
    come from ``sequence``+``posexplode`` over the normalized text
    (linear in corpus chars — the span-manifest shape), the 40-bit
    md5-prefix hash and the window position pack into one bigint key
    (module constant above) so "rightmost minimum of each window" is a
    single ``MIN OVER (ROWS w−1 PRECEDING)`` + DISTINCT — no UDF, no
    per-doc state. Documents shorter than w grams contribute their
    global minimum (one fingerprint), matching the whole-doc window
    convention; null/short-of-k texts contribute nothing. Positions
    must fit 20 bits (~1M chars/doc) — cap or chunk gigadocs upstream
    (the duplicate-span operators' documented hazard class).

    Returns ``(id_col, fp, pos)`` — one row per selected fingerprint
    occurrence. Companion: :func:`winnow_pairs`.
    """
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    n = F.length(norm)
    # hash-repartition the RAW documents by id before the ~(chars)×
    # k-gram fan-out: the doc_id window downstream reuses this exact
    # partitioning, so the heavy gram stream (tens of bytes per char of
    # input) never crosses an exchange — only the raw text does — and
    # gram hashing runs at full parallelism even when the scan is a
    # single unsplittable file
    docs = docs.repartition(
        docs.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
    )
    base = docs.select(F.col(id_col), norm.alias("_norm"), n.alias("_n"))
    grams = base.select(
        id_col,
        F.posexplode(
            F.when(
                F.col("_n") >= k,
                F.expr(f"sequence(0, _n - {k})"),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("pos", "_p"),
        F.col("_norm"),
    ).select(
        id_col,
        "pos",
        F.substring(F.col("_norm"), F.col("pos") + 1, k).alias("_gram"),
    )
    h40 = F.conv(F.substring(F.md5(F.col("_gram")), 1, 10), 16, 10).cast(
        "bigint"
    )
    key = h40 * F.lit(_WPOS) + (F.lit(_WPOS - 1) - F.col("pos"))
    from pyspark.sql import Window

    wf = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(-(w - 1), 0)
    )
    wp = Window.partitionBy(id_col)
    wo = Window.partitionBy(id_col).orderBy("pos")
    keyed = grams.select(
        id_col,
        "pos",
        F.min(key).over(wf).alias("_kmin"),
        F.max("pos").over(wp).alias("_maxpos"),
    )
    # Run-dedupe instead of DISTINCT: a selected (hash, pos) occupies
    # CONSECUTIVE windows — once a strictly smaller key enters the
    # window it stays until the selected occurrence itself has left, so
    # the same kmin can never reappear after a gap (keys are unique:
    # position is packed in). Keeping each run's first window therefore
    # yields exactly the distinct fingerprint set without the second
    # hash exchange a DISTINCT would add — the whole operator is ONE
    # doc_id exchange (plan-asserted in tests/test_text_dedup.py).
    runs = keyed.withColumn("_prev", F.lag("_kmin").over(wo))
    sel = runs.filter(
        (F.col("pos") == w - 1)
        | ((F.col("pos") > w - 1) & (F.col("_kmin") != F.col("_prev")))
        | ((F.col("_maxpos") < w - 1) & (F.col("pos") == F.col("_maxpos")))
    )
    return sel.select(
        id_col,
        F.expr(f"_kmin div {_WPOS}").alias("fp"),
        (F.lit(_WPOS - 1) - F.col("_kmin") % F.lit(_WPOS))
        .cast("int")
        .alias("pos"),
    )


def winnow_pairs(
    fps: DataFrame,
    min_shared: int = 2,
    df_cap: int | None = 50,
    id_col: str = "doc_id",
) -> DataFrame:
    """Document pairs sharing winnowing fingerprints — the MOSS match
    step: distinct per-doc fingerprints, equi-join on fp, count shared
    fps per unordered pair, keep pairs with ≥ ``min_shared``. The
    score is containment-shaped: shared / min(n_fps) ∈ (0, 1].

    ``df_cap`` drops fingerprints present in more than that many
    documents BEFORE the join — MOSS's own mitigation ("ignore
    fingerprints that occur in many documents": boilerplate k-grams
    would otherwise build O(df²) candidate pairs from one hot posting
    list; legitimate pairwise overlap still has rarer fingerprints).
    The cap is a groupBy-count + semi-join-shaped filter, so the hot
    key never reaches the pair join; set ``None`` to disable."""
    d = fps.select(id_col, "fp").distinct()
    if df_cap is not None:
        dfreq = d.groupBy("fp").agg(F.count(F.lit(1)).alias("_df"))
        d = (
            d.join(dfreq.filter(F.col("_df") <= df_cap), "fp", "inner")
            .drop("_df")
        )
    sizes = d.groupBy(id_col).agg(F.count(F.lit(1)).alias("_nfp"))
    a = d.select(F.col(id_col).alias("id_a"), "fp")
    b = d.select(F.col(id_col).alias("id_b"), "fp")
    pairs = (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("_nfp").alias("_na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("_nfp").alias("_nb"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_shared",
            (
                F.col("n_shared").cast("double")
                / F.least("_na", "_nb").cast("double")
            ).alias("score"),
        )
    )


def rolling_fingerprint(df: DataFrame, text_col: str, out_col: str = "fp64") -> DataFrame:
    """64-bit rolling (FNV-1a) document fingerprint as a signed long
    column — compact dedup/join key when md5 strings are too fat
    (SURVEY-level: 8 bytes/doc instead of 32)."""

    @F.pandas_udf(LongType())
    def fp(texts: pd.Series) -> pd.Series:
        return pd.Series(fnv1a64_np(texts).astype(np.int64))

    return df.withColumn(out_col, fp(F.col(text_col)))


# ---------------------------------------------------------------------------
# PII scrubbing (regex redaction, whole-stage codegen)
# ---------------------------------------------------------------------------

#: (kind, pattern, replacement) in scrub ORDER — email first (its local
#: part can contain digit runs a later pattern would eat), then SSN
#: before phone (3-2-4 vs 3-3-4 digit shapes are disjoint, but order is
#: part of the contract), then phone before IP (a dotted phone like
#: 555.123.4567 must become <PHONE>, not half an <IP>). Patterns stay in
#: the Java-regex ∩ RE2 common subset (no lookaround, no backrefs) so
#: the DuckDB oracle replays them byte-for-byte.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def scrub_pii(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """PII redaction pass for a pretraining corpus: emails, SSNs, phone
    numbers, IPv4 addresses replaced by typed placeholder tokens, with a
    per-kind match count. Counting is STEPWISE on the progressively
    scrubbed text (count emails on the original, scrub, count SSNs on
    the result, …) so a span is attributed to exactly one kind — the
    counts always sum to the number of placeholders in the output.

    Pure ``regexp_replace``/``regexp_count`` Column chain: whole-stage
    codegen, no UDF, no shuffle — at 100 TB this is a map-only pass that
    fuses into whatever scan feeds it. Returns ``red_text`` plus
    ``n_email/n_ssn/n_phone/n_ip``.
    """
    cur = F.col(text_col)
    out: list[Column] = [F.col(id_col)]
    for kind, pat, rep in PII_PATTERNS:
        out.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{kind}"))
        cur = F.regexp_replace(cur, pat, rep)
    out.append(cur.alias("red_text"))
    return docs.select(*out)


def ngram_repetition(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Within-document word n-gram repetition profile via the
    explode → groupBy shape: duplicate-n-gram fraction
    (1 − distinct/total) and max single-n-gram repeat count — the
    Rae et al. (Gopher §A1.1) repetition-filter family.

    Unlike the in-row list-algebra variant (``top_bigram_fraction``),
    the counting here happens in a ``groupBy(doc, gram)`` aggregate:
    per-task memory is bounded by the aggregate hash map, not by the
    document length, so a pathological 1 GB document cannot blow a task
    — the shape you want when the corpus has heavy-tailed doc sizes.
    The n-gram build itself is linear Column algebra (zip of n shifted
    slices — never ``element_at`` in a lambda, which goes quadratic).
    """
    c = F.lower(F.col(text_col))
    toks = F.split(c, r"\s+")
    m = F.size(toks) - (n - 1)  # number of n-grams
    grams = F.slice(toks, 1, m)
    for k in range(1, n):
        grams = F.zip_with(
            grams, F.slice(toks, k + 1, m), lambda a, b: F.concat_ws(" ", a, b)
        )
    grams = F.when(m >= 1, grams).otherwise(F.array().cast("array<string>"))
    g = (
        docs.select(F.col(id_col), F.explode(grams).alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    per_doc = g.groupBy(id_col).agg(
        F.sum("cnt").alias("n_grams"),
        F.count(F.lit(1)).alias("n_dist_grams"),
        F.max("cnt").alias("max_ngram_rep"),
        F.sum(F.col("cnt") - 1).alias("n_excess"),
    )
    base = docs.select(id_col)
    return (
        base.join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_dist_grams", F.lit(0)).alias("n_dist_grams"),
            F.coalesce("max_ngram_rep", F.lit(0)).alias("max_ngram_rep"),
            F.when(
                F.col("n_grams") > 0,
                F.col("n_excess").cast("double") / F.col("n_grams"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_ngram_frac"),
        )
    )


def _pack3(tri: str) -> int:
    """Pack a 3-codepoint trigram into one integer key, 21 bits per
    codepoint (max codepoint 0x10FFFF < 2^21): key comparison order ==
    codepoint-tuple order == Python/Spark lexicographic string order."""
    a, b, c = (ord(ch) for ch in tri)
    return (a << 42) | (b << 21) | c


def lang_ngram_guess_arrow(
    text: str | Column, top_k: int = 40, min_overlap: int = 3
) -> Column:
    """Arrow-kernel twin of :func:`lang_ngram_guess` — identical
    Cavnar–Trenkle semantics (top-k trigrams by count desc / trigram
    asc, profile overlap, (score, lang) struct max, min_overlap gate),
    computed per Arrow batch in Python instead of interpreted Catalyst
    list algebra. Higher-order-function expressions are NOT codegen-able
    (the expr path runs interpreted), so the batch kernel is the
    production path at corpus scale — same expr-vs-arrow split as the
    EWMA and LSH operators. Equality with the expr path is
    pytest-asserted; the SQL oracle replay is shared (it checks
    semantics, not implementation). Null text → 'unknown',
    matching the expr path (its ``when(length >= 3)`` guard is
    null-false, so a null doc gets the empty trigram list and falls
    through the ``min_overlap`` gate) — one null doc must not kill a
    corpus job.

    The kernel is WHOLE-BATCH numpy (round 5; the previous version
    looped ``Counter``+``sorted`` per doc — batch-amortized but still
    Python-per-doc CPU): the batch lowercases through pandas, encodes
    ONCE to a flat UTF-32 codepoint array, packs each trigram into one
    ``uint64`` key (3 × 21 bits, codepoint max 0x10FFFF — key order ==
    codepoint-tuple order == Python/Spark string order, so every
    tie-break is preserved exactly), masks windows that cross a doc
    boundary, then does per-(doc, trigram) counts and the
    (-count, trigram) top-k rank with two ``lexsort`` passes and
    profile-overlap scores with a ``searchsorted`` join against the
    (profile trigram → language) table — zero per-doc Python. Winner =
    max (score, lang) with the greater language string breaking ties,
    reproduced as last-argmax over name-ascending language ids."""
    from pyspark.sql.types import StringType

    lang_names = sorted(LANG_PROFILES)  # ids ascending by name
    pairs = sorted(
        (_pack3(tri), lid)
        for lid, lang in enumerate(lang_names)
        for tri in LANG_PROFILES[lang]
    )
    prof_keys = np.array([k for k, _ in pairs], dtype=np.uint64)
    prof_lang = np.array([lid for _, lid in pairs], dtype=np.int64)
    n_lang = len(lang_names)
    names = np.array(lang_names + ["unknown"])

    @F.pandas_udf(StringType())
    def guess(texts: pd.Series) -> pd.Series:
        notnull = texts.notna().to_numpy()
        low = texts[notnull].str.lower()
        nd = len(low)
        out = np.full(len(texts), n_lang, dtype=np.int64)  # default: unknown
        if nd:
            lens = low.str.len().to_numpy(dtype=np.int64)
            cp = np.frombuffer(
                "".join(low.tolist()).encode("utf-32-le"), dtype=np.uint32
            ).astype(np.uint64)
            doc_of = np.repeat(np.arange(nd, dtype=np.int64), lens)
            if len(cp) >= 3:
                keys = (cp[:-2] << np.uint64(42)) | (cp[1:-1] << np.uint64(21)) | cp[2:]
                in_doc = doc_of[:-2] == doc_of[2:]  # window stays inside one doc
                keys, tdoc = keys[in_doc], doc_of[:-2][in_doc]
            else:
                keys = np.empty(0, dtype=np.uint64)
                tdoc = np.empty(0, dtype=np.int64)
            scores = np.zeros((nd, n_lang), dtype=np.int64)
            if len(keys):
                # per-(doc, trigram) counts: sort, run-length encode
                o = np.lexsort((keys, tdoc))
                keys, tdoc = keys[o], tdoc[o]
                new = np.empty(len(keys), dtype=bool)
                new[0] = True
                new[1:] = (tdoc[1:] != tdoc[:-1]) | (keys[1:] != keys[:-1])
                starts = np.flatnonzero(new)
                gd, gk = tdoc[starts], keys[starts]
                gc = np.diff(np.append(starts, len(keys)))
                # top-k by (-count, trigram) within each doc
                o2 = np.lexsort((gk, -gc, gd))
                gd, gk = gd[o2], gk[o2]
                doc_first = np.flatnonzero(
                    np.r_[True, gd[1:] != gd[:-1]]
                )
                rank = np.arange(len(gd)) - np.repeat(
                    doc_first, np.diff(np.append(doc_first, len(gd)))
                )
                keep = rank < top_k
                qd, qk = gd[keep], gk[keep]
                # profile join: spans of equal keys in the sorted table
                lo = np.searchsorted(prof_keys, qk, "left")
                hi = np.searchsorted(prof_keys, qk, "right")
                span = hi - lo
                m = span > 0
                if m.any():
                    # expand [lo, hi) ranges without a Python loop
                    reps = span[m]
                    idx = np.repeat(lo[m] + reps - reps.cumsum(), reps) + np.arange(
                        int(reps.sum())
                    )
                    np.add.at(
                        scores, (np.repeat(qd[m], reps), prof_lang[idx]), 1
                    )
            best = n_lang - 1 - np.argmax(scores[:, ::-1], axis=1)  # last argmax
            best_score = scores[np.arange(nd), best]
            out[notnull] = np.where(best_score >= min_overlap, best, n_lang)
        return pd.Series(names[out], index=texts.index)

    return guess(text if not isinstance(text, str) else F.col(text))


def pmi_topk(
    docs: DataFrame,
    window: int = 3,
    min_count: int = 5,
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
    shards: int = 32,
) -> DataFrame:
    """Corpus-wide PMI co-occurrence top-``k``: the distributional-
    semantics collocation table (which token pairs co-occur within a
    ``window``-token skip-gram far above chance) — the classic feature
    behind phrase detection, word-vector objectives and collocation-
    aware tokenizer audits.

    Directional skip-gram pairs (center, right-neighbor ≤ window);
    PMI = ln(c_ab · P / (c_a · c_b)) with marginals taken FROM the
    pair table (self-consistent — columns sum to P exactly, no edge-
    effect mismatch vs raw token counts). ``pmi`` is rounded to 6
    decimals BEFORE ranking with a (tok_a, tok_b) tie-break, so the
    ordering is reproducible across engines.

    Scale shape: pair generation is posexplode + an offset explode +
    one (doc, position) EQUI-join — exactly tokens × window rows, never
    the n² blowup of a within-doc theta-join, and no giant in-row pair
    array for a heavy-tailed doc. Pair counts are a map-side-combined
    groupBy; the two marginal tables are vocabulary-sized (equi-joined
    back, AQE handles the Zipf head); the corpus total rides a 1-row
    broadcast crossJoin (lazy, no driver collect). ``min_count`` prunes
    the long tail BEFORE the marginal joins. Top-k is the two-phase
    rank (per-shard prune → global rank over shards × k survivors);
    the result is shard-count-independent because any global top-k row
    is also top-k within its own shard.
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("_doc"),
        F.posexplode(
            F.filter(tokens(F.lower(F.col(text_col))), lambda x: x != "")
        ).alias("_pos", "_tok"),
    )
    left = (
        toks.select(
            "_doc",
            "_pos",
            F.col("_tok").alias("tok_a"),
            F.explode(F.sequence(F.lit(1), F.lit(int(window)))).alias("_off"),
        )
        .select(
            "_doc", (F.col("_pos") + F.col("_off")).alias("_jpos"), "tok_a"
        )
    )
    right = toks.select(
        "_doc", F.col("_pos").alias("_jpos"), F.col("_tok").alias("tok_b")
    )
    pairs = left.join(right, ["_doc", "_jpos"])
    pc = pairs.groupBy("tok_a", "tok_b").agg(F.count(F.lit(1)).alias("c_ab"))
    la = pc.groupBy("tok_a").agg(F.sum("c_ab").alias("_c_a"))
    rb = pc.groupBy("tok_b").agg(F.sum("c_ab").alias("_c_b"))
    tot = pc.agg(F.sum("c_ab").alias("_p"))
    pmi = F.round(
        F.log(
            F.col("c_ab").cast("double")
            * F.col("_p").cast("double")
            / (F.col("_c_a").cast("double") * F.col("_c_b").cast("double"))
        ),
        6,
    ) + F.lit(0.0)
    scored = (
        pc.filter(F.col("c_ab") >= int(min_count))
        .join(la, "tok_a")
        .join(rb, "tok_b")
        .crossJoin(F.broadcast(tot))
        .select("tok_a", "tok_b", "c_ab", pmi.alias("pmi"))
    )
    order = [F.col("pmi").desc(), F.col("tok_a"), F.col("tok_b")]
    local = Window.partitionBy(
        F.pmod(F.hash("tok_a", "tok_b"), F.lit(int(shards)))
    ).orderBy(*order)
    final = Window.partitionBy(F.lit(0)).orderBy(*order)
    return (
        scored.withColumn("_lr", F.row_number().over(local))
        .filter(F.col("_lr") <= k)
        .withColumn("rank", F.row_number().over(final).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("tok_a", "tok_b", F.col("c_ab").cast("bigint").alias("c_ab"), "pmi", "rank")
    )


# ---------------------------------------------------------------------------
# Corpus text normalization (control/zero-width scrub, unicode spaces,
# punctuation canonicalization, optional NFC)
# ---------------------------------------------------------------------------

#: (kind, pattern, replacement) in scrub ORDER — counts are stepwise on
#: the progressively cleaned text (the scrub_pii convention), so each
#: codepoint is attributed to exactly one kind. Patterns stay in the
#: Java-regex ∩ RE2 common subset so the DuckDB oracle replays them
#: byte-for-byte ('g' flag on the DuckDB side; Spark replaces globally
#: by default).
CLEAN_PATTERNS: tuple[tuple[str, str, str], ...] = (
    # C0 controls minus \t\n\r, plus DEL — dropped outright
    ("ctrl", "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]", ""),
    # zero-width space/non-joiner/joiner, BOM, soft hyphen — dropped
    ("zw", "[\u200b\u200c\u200d\ufeff\u00ad]", ""),
    # unicode space family → ASCII space
    ("unispace", "[\u00a0\u1680\u2000-\u200a\u202f\u205f\u3000]", " "),
    # curly quotes / primes → ASCII
    ("squote", "[\u2018\u2019\u201a\u2032]", "'"),
    ("dquote", "[\u201c\u201d\u201e\u2033]", "\""),
    # en/em/horizontal-bar dashes, minus sign → hyphen
    ("dash", "[\u2013\u2014\u2015\u2212]", "-"),
)


def clean_text(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    nfc: bool = False,
    collapse_spaces: bool = True,
) -> DataFrame:
    """Corpus text normalization — the cleanup pass that runs before any
    hashing/dedup stage so that byte-level noise (zero-width chars,
    NBSP, curly quotes) can't split otherwise-identical documents into
    different fingerprints: strips control and zero-width codepoints,
    folds the unicode space family to ASCII space, canonicalizes curly
    quotes and long dashes, optionally collapses space runs, and
    (``nfc=True``) applies Unicode NFC composition.

    Counting is STEPWISE on the progressively cleaned text (the
    :func:`scrub_pii` convention) so every codepoint is attributed to
    exactly one kind and the counts reconcile with the diff. The regex
    chain is pure ``regexp_replace`` Column algebra — whole-stage
    codegen, map-only, fuses into the scan; at 100 TB this is a free
    rider on whatever pass reads the text. NFC is the one Python
    crossing (``unicodedata.normalize`` has no JVM-expression
    equivalent), Arrow-batched and applied FIRST so the regex scrubs
    see composed codepoints; null text passes through as null.

    Returns ``clean_text`` + per-kind counts ``n_ctrl / n_zw /
    n_unispace / n_squote / n_dquote / n_dash`` and ``changed``.
    """
    cur: Column = F.col(text_col)
    if nfc:
        from pyspark.sql.types import StringType

        @F.pandas_udf(StringType())
        def _nfc(s: pd.Series) -> pd.Series:
            import unicodedata

            return s.map(
                lambda t: unicodedata.normalize("NFC", t)
                if t is not None
                else None
            )

        cur = _nfc(cur)
    out: list[Column] = [F.col(id_col)]
    for kind, pat, rep in CLEAN_PATTERNS:
        out.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{kind}"))
        cur = F.regexp_replace(cur, pat, rep)
    if collapse_spaces:
        cur = F.trim(F.regexp_replace(cur, "  +", " "))
    out.append(cur.alias("clean_text"))
    # null-safe: a null doc is unchanged (null), not a diff
    out.append(
        (~F.col(text_col).eqNullSafe(cur)).alias("changed")
    )
    return docs.select(*out)


# ---------------------------------------------------------------------------
# URL / domain extraction (crawl-curation statistics)
# ---------------------------------------------------------------------------

#: domain capture: scheme, then everything up to the first /, :, ?, #
#: or whitespace. Java-regex ∩ RE2 subset, replayed verbatim in SQL.
DOMAIN_PATTERN = r"https?://([^/\s:?#]+)"


def extract_domains(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per URL occurrence: ``(id, domain)``, domain lowercased.
    Pure ``regexp_extract_all`` + explode — map-only, fuses into the
    scan; a link-farm doc explodes into rows, never one giant array."""
    doms = F.regexp_extract_all(F.col(text_col), F.lit(DOMAIN_PATTERN), 1)
    return docs.select(
        F.col(id_col), F.explode(doms).alias("domain")
    ).withColumn("domain", F.lower(F.col("domain")))


def domain_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-wide outlink domain profile — which domains the corpus
    cites, how often, and in what fraction of documents: the
    crawl-curation table behind link-spam filters (a domain cited by
    0.1% of docs 40× per doc is a link farm) and citation-quality
    audits. Emits per domain: ``n_occ`` (URL occurrences), ``n_docs``
    (distinct citing docs), ``doc_frac`` (share of the whole corpus,
    rounded 6 dp).

    Scale shape: map-only extraction; distinct-doc counting via the
    two-level ``groupBy(domain, doc) → groupBy(domain)`` (map-side
    combinable both levels — never a ``countDistinct`` set buffer under
    a hot domain); the corpus total rides a one-row broadcast crossJoin
    so the plan stays lazy (no driver count)."""
    d = extract_domains(docs, text_col, id_col)
    per_doc = d.groupBy("domain", id_col).agg(
        F.count(F.lit(1)).alias("_k")
    )
    per_dom = per_doc.groupBy("domain").agg(
        F.sum("_k").alias("n_occ"), F.count(F.lit(1)).alias("n_docs")
    )
    total = docs.agg(F.count(F.lit(1)).alias("_n_corpus"))
    return per_dom.crossJoin(F.broadcast(total)).select(
        "domain",
        F.col("n_occ").cast("bigint").alias("n_occ"),
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.round(
            F.col("n_docs").cast("double") / F.col("_n_corpus"), 6
        ).alias("doc_frac"),
    )


def source_distinctive_terms(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    k: int = 10,
    min_df: int = 2,
    shards: int = 32,
) -> DataFrame:
    """Top-k distinctive terms per source by tf-idf against the whole
    corpus — the "what actually lives in this source" audit run before
    trusting source labels for mixture weighting (a 'wikipedia' slice
    whose distinctive terms are casino spam is mislabeled upstream),
    and the summary a dataset card quotes per subset.

    Score = tf_{source,term} · ln((N+1)/(df_term+1)) (smoothed idf,
    document frequency over the WHOLE corpus), rounded to 6 dp BEFORE
    ranking with a term tie-break (the bm25 rank convention, so the
    ordering is engine-stable); terms below ``min_df`` docs are pruned
    (hapax noise scores highest otherwise).

    Scale shape: one token explode; per-(source, term) counts and the
    per-term document frequency both collapse map-side (df via the
    two-level ``groupBy(term, doc) → groupBy(term)`` — never a
    countDistinct set buffer under a stopword); the corpus total rides
    a one-row broadcast crossJoin (lazy); top-k per source is the
    exact two-phase rank (per-(source, shard) prune to k, then a
    global rank over ≤ shards·k survivors — no single-task window over
    a whole source's vocabulary)."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    base = docs.select(
        F.col(group_col), F.col(id_col), F.explode(toks).alias("term")
    )
    tf = base.groupBy(group_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = (
        base.groupBy("term", id_col)
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
    )
    total = docs.agg(F.count(F.lit(1)).alias("_n"))
    scored = (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * F.log(
                    (F.col("_n") + 1).cast("double")
                    / (F.col("df") + 1).cast("double")
                ),
                6,
            ),
        )
    )
    order = [F.col("score").desc(), F.col("term").asc()]
    local = Window.partitionBy(
        group_col, F.pmod(F.hash(F.col("term")), F.lit(shards))
    ).orderBy(*order)
    pruned = scored.withColumn("_lr", F.row_number().over(local)).filter(
        F.col("_lr") <= k
    )
    final = Window.partitionBy(group_col).orderBy(*order)
    return (
        pruned.withColumn("rank", F.row_number().over(final))
        .filter(F.col("rank") <= k)
        .select(
            group_col,
            "term",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            "score",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def ngram_diversity(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    max_n: int = 3,
) -> DataFrame:
    """Distinct-n diversity profile per corpus slice: for each n in
    1..``max_n``, the ratio of DISTINCT word n-grams to total n-grams
    (Li et al. 2016's distinct-n, lifted from generation eval to corpus
    audit) — a templated/boilerplate-heavy source scores low at n ≥ 2
    long before exact dedup fires, so this is the cheap first look a
    mixture designer takes at each slice.

    Output per (``group_col``, n): ``total_grams``, ``distinct_grams``,
    ``distinct_ratio`` (6 dp). Tokenization: lowercase, whitespace
    split, empties dropped (the `source_distinctive_terms` convention).

    Scale shape: ONE corpus scan and ONE explode — every n's gram list
    is built from the same token array with the linear zip-shift chain
    (`corpus.token_ngram_hashes`'s move; an outer-array slice inside a
    transform re-evaluates the split per element and goes quadratic)
    and tagged with n in-row, so the three lattices ride one explode.
    Both aggregations are map-side-combinable groupBys (the two-level
    count: (group, n, gram) → (group, n)) — per-task state is the agg
    hash map, never a distinct-set buffer; 10¹² tokens shuffle once on
    the gram key.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    d = docs.select(F.col(group_col), toks.alias("_t"))
    branches = []
    for n in range(1, max_n + 1):
        if n == 1:
            grams = F.col("_t")
        else:
            m = F.size("_t") - (n - 1)
            grams = F.slice("_t", 1, F.greatest(m, F.lit(0)))
            for k in range(1, n):
                grams = F.zip_with(
                    grams,
                    F.slice("_t", k + 1, F.greatest(m, F.lit(0))),
                    lambda a, b: F.concat_ws(" ", a, b),
                )
        def _tag(col, n_val):
            # one-arg lambda on purpose: a two-arg transform lambda
            # receives (element, array_index) and the index would
            # shadow any default-bound n.
            return F.transform(
                col,
                lambda g: F.struct(F.lit(n_val).alias("n"), g.alias("gram")),
            )

        branches.append(_tag(grams, n))
    base = d.select(
        F.col(group_col), F.explode(F.concat(*branches)).alias("_g")
    ).select(F.col(group_col), F.col("_g.n").alias("n"), F.col("_g.gram"))
    counts = base.groupBy(group_col, "n", "gram").agg(
        F.count(F.lit(1)).alias("_c")
    )
    return counts.groupBy(group_col, "n").agg(
        F.sum("_c").cast("bigint").alias("total_grams"),
        F.count(F.lit(1)).cast("bigint").alias("distinct_grams"),
        (
            F.round(F.count(F.lit(1)) / F.sum("_c").cast("double"), 6)
            + F.lit(0.0)
        ).alias("distinct_ratio"),
    )


def zipf_fit(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    k: int = 100,
    shards: int = 32,
) -> DataFrame:
    """Zipf-law fit per corpus slice: OLS of log10(frequency) on
    log10(rank) over the top-``k`` tokens — natural text tracks slope
    ≈ −1 with high r²; synthetic/templated/spammy slices bend away
    from the power law, so (slope, r²) is a two-number distribution
    audit a data card quotes per source and a mixture designer screens
    on.

    Output per group: ``n_ranks`` (min(k, vocab)), ``top_term`` /
    ``top_freq`` (rank-1, freq-desc/term-asc tie-break — the bm25 rank
    convention), ``zipf_slope``, ``zipf_r2`` (both 6 dp; NULL when
    fewer than 2 ranks or zero variance).

    Scale shape: one token explode into a map-side-combinable
    ``groupBy(group, term)`` count; the rank is the exact two-phase
    top-k (per-(group, hash-shard) prune to k, then one window over
    ≤ shards·k survivors — never a single-task window over a whole
    source's vocabulary, `source_distinctive_terms`'s move); the OLS
    is closed-form moment sums over ≤ k rows per group. 10¹² tokens
    shuffle once; everything after the count is k-bounded.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    counts = (
        docs.select(F.col(group_col), F.explode(toks).alias("term"))
        .groupBy(group_col, "term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    order = [F.col("freq").desc(), F.col("term").asc()]
    local = Window.partitionBy(
        group_col, F.pmod(F.hash(F.col("term")), F.lit(shards))
    ).orderBy(*order)
    pruned = counts.withColumn("_lr", F.row_number().over(local)).filter(
        F.col("_lr") <= k
    )
    final = Window.partitionBy(group_col).orderBy(*order)
    ranked = (
        pruned.withColumn("rank", F.row_number().over(final))
        .filter(F.col("rank") <= k)
        .select(
            F.col(group_col),
            "term",
            "freq",
            F.log10(F.col("rank").cast("double")).alias("_x"),
            F.log10(F.col("freq").cast("double")).alias("_y"),
            "rank",
        )
    )
    s = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ranks"),
        F.max(F.when(F.col("rank") == 1, F.col("term"))).alias("top_term"),
        F.max(F.when(F.col("rank") == 1, F.col("freq")))
        .cast("bigint")
        .alias("top_freq"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
    )
    n = F.col("n_ranks").cast("double")
    cov = n * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    vx = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    vy = n * F.col("_syy") - F.col("_sy") * F.col("_sy")
    r6 = lambda c: F.round(c, 6) + F.lit(0.0)  # noqa: E731
    return s.select(
        group_col,
        "n_ranks",
        "top_term",
        "top_freq",
        r6(F.when(vx > 0, cov / vx)).alias("zipf_slope"),
        r6(F.when((vx > 0) & (vy > 0), cov * cov / (vx * vy))).alias(
            "zipf_r2"
        ),
    )


def langid_agreement(
    docs: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    group_col: str = "source",
) -> DataFrame:
    """Label-QA audit: how often does the content-based language ID
    (:func:`lang_ngram_guess_arrow`) agree with the corpus's own
    ``lang_col`` metadata, per source? Upstream language labels come
    from crawl heuristics (URL TLDs, HTTP headers, site config) and are
    routinely wrong for exactly the sources a mixture weighting trusts
    them on — this is the check run before `corpus.mixture_sample`
    keys rates off the label.

    Output per source: ``n_docs``, ``n_detected`` (ID confident, i.e.
    not 'unknown'), ``n_match`` (detected == label), ``agreement``
    (n_match / n_detected, 6 dp, NULL when nothing was detected) and
    ``unknown_rate`` (6 dp) — a LOW agreement flags mislabeling; a
    high unknown_rate says the audit itself lacks signal there.

    Scale shape: one corpus scan through the Arrow lang-ID kernel
    (whole-batch numpy, the production path), then ONE
    map-side-combinable groupBy — state is O(sources), no shuffle
    wider than the |sources|-row combine.
    """
    det = lang_ngram_guess_arrow(text_col)
    base = docs.select(
        F.col(group_col),
        F.col(lang_col).alias("_label"),
        det.alias("_det"),
    )
    decided = F.col("_det") != "unknown"
    r6 = lambda c: F.round(c, 6) + F.lit(0.0)  # noqa: E731
    return base.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(decided.cast("bigint")).alias("n_detected"),
        F.sum(
            (decided & (F.col("_det") == F.col("_label"))).cast("bigint")
        ).alias("n_match"),
        r6(
            F.when(
                F.sum(decided.cast("bigint")) > 0,
                F.sum(
                    (decided & (F.col("_det") == F.col("_label"))).cast(
                        "double"
                    )
                )
                / F.sum(decided.cast("double")),
            )
        ).alias("agreement"),
        r6(
            F.sum((~decided).cast("double")) / F.count(F.lit(1))
        ).alias("unknown_rate"),
    )


def readability(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    nd: int = 6,
) -> DataFrame:
    """Classic readability panel per document: Flesch Reading Ease and
    Flesch–Kincaid grade from the three standard counts — words,
    sentences, syllables — the quality-screen family member the Gopher
    gates don't cover (they bound repetition/symbols/stopwords;
    readability bounds SENTENCE COMPLEXITY, the axis that separates
    prose from listicles and SEO sludge).

    Heuristics (pinned so the oracle replays them bit-for-bit):
    sentences = count of ``[.!?]+`` runs, floored at 1; syllables per
    word = count of ``[aeiouy]+`` vowel groups (lowercased), floored
    at 1 per word — the standard cheap estimator (±~10% vs dictionary
    syllabification on English prose, which the formulas tolerate).

    * ease  = 206.835 − 1.015·(W/S) − 84.6·(Syl/W)
    * grade = 0.39·(W/S) + 11.8·(Syl/W) − 15.59

    Output: ``(id, n_words, n_sentences, n_syllables,
    words_per_sentence, syllables_per_word, flesch_ease, fk_grade)``;
    empty/null docs report zeros with NULL ratios/scores. Scale shape:
    map-only — one token explode-free pass (syllable totals via an
    in-row ``transform`` + ``aggregate`` fold over the token array),
    fuses into the scan, zero shuffle, no UDFs.
    """
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda x: x != "",
    )
    syl_of = lambda w: F.greatest(  # noqa: E731
        F.lit(1),
        F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), 0)),
    )
    base = docs.select(F.col(id_col), toks.alias("_tk")).select(
        id_col,
        F.size("_tk").cast("bigint").alias("n_words"),
        F.aggregate(
            F.col("_tk"),
            F.lit(0).cast("bigint"),
            lambda acc, w: acc + syl_of(w).cast("bigint"),
        ).alias("n_syllables"),
        F.when(
            F.size("_tk") > 0,
            F.greatest(
                F.lit(1),
                F.size(
                    F.regexp_extract_all(
                        F.array_join(F.col("_tk"), " "),
                        F.lit("[.!?]+"),
                        0,
                    )
                ),
            ),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("n_sentences"),
    )
    wps = F.col("n_words").cast("double") / F.col("n_sentences")
    spw = F.col("n_syllables").cast("double") / F.col("n_words")
    r6 = lambda c: F.round(c, nd) + F.lit(0.0)  # noqa: E731
    has = F.col("n_words") > 0
    return base.select(
        id_col,
        "n_words",
        "n_sentences",
        "n_syllables",
        F.when(has, r6(wps)).alias("words_per_sentence"),
        F.when(has, r6(spw)).alias("syllables_per_word"),
        F.when(has, r6(206.835 - 1.015 * wps - 84.6 * spw)).alias(
            "flesch_ease"
        ),
        F.when(has, r6(0.39 * wps + 11.8 * spw - 15.59)).alias("fk_grade"),
    )


def textrank_sentences(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_sents: int = 32,
    n_iter: int = 3,
    damping: float = 0.85,
    nd: int = 9,
) -> DataFrame:
    """Per-document TextRank (Mihalcea & Tarau 2004): extractive
    sentence-importance scores for EVERY document of a corpus in one
    lazy plan — the summarization-score operator a curation pipeline
    uses to keep each document's most central sentences (snippeting,
    context compression, lead-bias-free previews).

    Per doc: sentences are ``[.!?]+`` segments (the readability
    convention), CAPPED at ``max_sents`` (the similarity graph is
    O(s²) per doc — the cap bounds per-doc work exactly like the
    ROUGE token cap); edge weight = |shared distinct tokens| /
    (ln|Sᵢ| + ln|Sⱼ|) (the paper's normalization), zero-overlap and
    zero-denominator pairs dropped; then ``n_iter`` damped power-
    iteration rounds ``r ← (1−d)/n + d·Σ r_j·w_ji/Σw_j`` with every
    iterate 9-dp-canonicalized (the graph-module convention, so the
    trajectory replays in any engine). Sentences with no edges hold
    the teleport base — the per-doc analog of PageRank dangling mass.

    Contrast `graph.pagerank`: that operator iterates ONE global graph
    with one-row broadcast totals; here MILLIONS of tiny graphs
    iterate simultaneously — every join and aggregate is keyed by
    (doc, sentence), so the work distributes by document and no
    stage ever sees a whole-corpus key. Lineage: per-iteration
    boundaries are lazily persisted (the bt_strengths lesson) so the
    sentence table materializes once, not 3^T times.

    Output: one row per kept sentence — ``(id, sent_idx, sentence,
    n_sents, score, rank)`` with rank 1 = most central (ties → lower
    sent_idx). Downstream: ``filter(rank <= k)`` is the extractive
    summary.
    """
    from pyspark.sql import Window

    segs = F.filter(
        F.transform(
            F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"[.!?]+"),
            lambda s: F.trim(s),
        ),
        lambda s: s != "",
    )
    base = (
        docs.select(F.col(id_col), F.posexplode(segs).alias("_si", "_sent"))
        .where(F.col("_si") < max_sents)
        .select(
            id_col,
            "_si",
            "_sent",
            F.array_distinct(
                F.filter(F.split(F.col("_sent"), r"\s+"), lambda x: x != "")
            ).alias("_tok"),
        )
        .withColumn("_lt", F.size("_tok"))
    )
    n_doc = base.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"))
    base = base.join(n_doc, id_col).persist()

    a = base.select(
        id_col,
        F.col("_si").alias("_i"),
        F.col("_tok").alias("_ti"),
        F.col("_lt").alias("_li"),
    )
    b = base.select(
        id_col,
        F.col("_si").alias("_j"),
        F.col("_tok").alias("_tj"),
        F.col("_lt").alias("_lj"),
    )
    raw = (
        a.join(b, id_col)
        .where(F.col("_i") < F.col("_j"))
        .select(
            id_col,
            "_i",
            "_j",
            (
                F.size(F.array_intersect("_ti", "_tj")).cast("double")
                / (F.log(F.col("_li").cast("double")) + F.log(F.col("_lj").cast("double")))
            ).alias("_wraw"),
            (F.log(F.col("_li").cast("double")) + F.log(F.col("_lj").cast("double"))).alias("_den"),
            F.size(F.array_intersect("_ti", "_tj")).alias("_ov"),
        )
        .where((F.col("_den") > 0) & (F.col("_ov") > 0))
        .select(id_col, "_i", "_j", (F.round(F.col("_wraw"), nd) + F.lit(0.0)).alias("_w"))
    )
    edges = raw.unionByName(
        raw.select(
            id_col,
            F.col("_j").alias("_i"),
            F.col("_i").alias("_j"),
            "_w",
        )
    ).persist()
    wsum = edges.groupBy(id_col, F.col("_i").alias("_j")).agg(
        F.sum("_w").alias("_wsum")
    )
    # edges annotated with the SOURCE's outgoing weight sum
    ew = edges.join(wsum, [id_col, "_j"]).persist()

    r = base.select(
        id_col,
        F.col("_si").alias("_node"),
        (F.lit(1.0) / F.col("_n")).alias("_r"),
        "_n",
    )
    d = float(damping)
    for _ in range(n_iter):
        contrib = (
            ew.join(
                r.select(id_col, F.col("_node").alias("_j"), "_r"),
                [id_col, "_j"],
            )
            .select(
                id_col,
                F.col("_i").alias("_node"),
                (F.col("_r") * F.col("_w") / F.col("_wsum")).alias("_c"),
            )
            .groupBy(id_col, "_node")
            .agg(F.sum("_c").alias("_cs"))
        )
        r = (
            r.join(contrib, [id_col, "_node"], "left")
            .select(
                id_col,
                "_node",
                (
                    F.round(
                        (1.0 - d) / F.col("_n")
                        + d * F.coalesce(F.col("_cs"), F.lit(0.0)),
                        nd,
                    )
                    + F.lit(0.0)
                ).alias("_r"),
                "_n",
            )
            .persist()
        )
    w_rank = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("sent_idx")
    )
    return (
        base.select(
            id_col, F.col("_si").alias("sent_idx"), F.col("_sent").alias("sentence"), F.col("_n")
        )
        .join(
            r.select(id_col, F.col("_node").alias("sent_idx"), F.col("_r").alias("score")),
            [id_col, "sent_idx"],
        )
        .select(
            id_col,
            "sent_idx",
            "sentence",
            F.col("_n").cast("int").alias("n_sents"),
            "score",
        )
        .withColumn("rank", F.row_number().over(w_rank).cast("int"))
    )
