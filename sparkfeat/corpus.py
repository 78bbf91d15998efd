"""End-to-end training-corpus preparation as a reusable composition.

The four stages a pretraining data pipeline runs over a raw document
corpus — quality gate, language confirmation, exact dedup, MinHash
near-dup drop — wired as ONE Spark job with per-document stage verdicts
(auditable: why did doc X fall out?). The driver query
``corpus_prep_pipeline`` wraps this over the testdata scan; the corpus
scaling bench (scripts/corpus_scaling_bench.py) runs the same
composition over a replicated corpus at two parallelism levels.

Scale shape: one corpus scan feeds the stateless gates (whole-stage
codegen Column expressions), one fingerprint shuffle feeds exact dedup,
one signature+band shuffle feeds the near-dup candidates; nothing is
quadratic in the corpus and every join is an equi-join (plan-asserted in
tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(key, start: int = 25, buckets: int = 1000):
    """Deterministic uniform bucket in [0, buckets) from 8 hex digits of
    ``md5(cast(key as string))`` starting at 1-based hex position
    ``start`` — pure JVM expression (no UDF), replayable byte-for-byte
    in any engine with md5. Different ``start`` values give independent
    buckets (e.g. one for the split, one for stratified keep), which is
    what makes hash sampling composable: membership is a property of
    the KEY, not of an RNG state, so every rerun, every engine, and
    every downstream join sees the same subset."""
    col = key if not isinstance(key, str) else F.col(key)
    return (
        F.conv(F.substring(F.md5(col.cast("string")), start, 8), 16, 10)
        .cast("bigint")
        % buckets
    )


def sample_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    lang_col: str = "lang",
    train: float = 0.8,
    val: float = 0.1,
    lang_rates: dict[str, float] | None = None,
) -> DataFrame:
    """Reproducible train/val/test assignment + stratified downsampling
    for a training corpus:

    * ``split``: hash-bucket the id into train/val/test by the given
      fractions — stable under corpus growth (a doc never changes
      split when new docs arrive; the leakage-safety property random
      splits lose on incremental corpora);
    * ``strat_keep``: a SECOND independent hash bucket thresholded by a
      per-language rate (e.g. downsample over-represented languages) —
      the standard rebalancing move, deterministic and auditable.
    """
    b_split = hash_bucket(id_col, start=25)
    b_keep = hash_bucket(id_col, start=17)
    split = (
        F.when(b_split < int(train * 1000), "train")
        .when(b_split < int((train + val) * 1000), "val")
        .otherwise("test")
    )
    if lang_rates:
        # Languages absent from the rates map (and NULL lang) default to
        # rate 1.0 — an incomplete map must never silently drop whole
        # languages from the corpus; listing a language is an explicit
        # decision to downsample it.
        w = None
        for lang, rate in sorted(lang_rates.items()):
            cond = F.col(lang_col) == lang
            thr = b_keep < int(rate * 1000)
            w = F.when(cond, thr) if w is None else w.when(cond, thr)
        keep = w.otherwise(F.lit(True))
    else:
        keep = F.lit(True)
    return docs.select(
        id_col,
        lang_col,
        b_split.cast("int").alias("split_bucket"),
        split.alias("split"),
        b_keep.cast("int").alias("keep_bucket"),
        keep.alias("strat_keep"),
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    block: int = 4096,
) -> DataFrame:
    """Concat-then-chunk sequence packing: documents in ``id_col`` order
    are laid end-to-end on a global token axis and cut into training
    sequences of ``budget`` tokens (``seq_id`` = which sequence a doc
    STARTS in, ``seq_offset`` = its start position inside it) — the
    deterministic packing step that turns a filtered corpus into
    fixed-length pretraining samples.

    The global prefix sum is computed WITHOUT a single-task window and
    WITHOUT anything corpus-sized touching the driver: docs group into
    ``id div block`` blocks; the tiny block-sum table gets its own
    exclusive prefix sum via one more level of the same decomposition
    (superblocks of ``block`` blocks), so the only single-task window
    runs over ``D / block²`` superblock rows (~60k rows at 10¹² docs
    with the default block) — then the block offsets broadcast-join
    back on ``_blk``. No ``collect()``, no literal maps in the plan, so
    Catalyst never sees a corpus-dependent expression tree. Derived
    from the id, not the physical partitioning, so the layout is
    identical on any cluster — and the oracle is one plain global
    window cumsum. All index math is integer (``div``/``%`` on
    bigint): exact at any corpus size, no 2^53 double ceiling. Doc ids
    must be non-negative (``div`` truncation == floor there)."""
    from sparkfeat.text import token_count

    d = docs.select(
        F.col(id_col),
        token_count(text_col).cast("bigint").alias("n_tok"),
        F.expr(f"CAST({id_col} AS BIGINT) div {block}").alias("_blk"),
    )
    # Level 1: per-block sums (D/block rows). Level 2: superblock sums
    # (D/block² rows) take the one global-ordered window — tiny by
    # construction at any realistic corpus size.
    blocks = d.groupBy("_blk").agg(F.sum("n_tok").alias("_bsum"))
    blocks = blocks.withColumn("_sblk", F.expr(f"_blk div {block}"))
    w_blk = (
        Window.partitionBy("_sblk")
        .orderBy("_blk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    blocks = blocks.withColumn(
        "_cum_in_sblk", F.sum("_bsum").over(w_blk) - F.col("_bsum")
    )
    supers = blocks.groupBy("_sblk").agg(F.sum("_bsum").alias("_ssum"))
    w_sup = (
        Window.orderBy("_sblk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    supers = supers.select(
        "_sblk", (F.sum("_ssum").over(w_sup) - F.col("_ssum")).alias("_soff")
    )
    offsets = (
        blocks.join(F.broadcast(supers), "_sblk")
        .select("_blk", (F.col("_soff") + F.col("_cum_in_sblk")).alias("_boff"))
    )
    w = (
        Window.partitionBy("_blk")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = d.join(F.broadcast(offsets), "_blk").withColumn(
        "tok_start", F.col("_boff") + F.sum("n_tok").over(w) - F.col("n_tok")
    )
    return cum.select(
        id_col,
        "n_tok",
        "tok_start",
        F.expr(f"tok_start div {budget}").alias("seq_id"),
        (F.col("tok_start") % budget).alias("seq_offset"),
    )


def pack_spans(
    docs: DataFrame,
    budget: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    block: int = 4096,
) -> DataFrame:
    """The full packing manifest a sample-writer consumes: one row per
    (document, training sequence) the document TOUCHES, not just the
    sequence it starts in. A doc longer than the remaining budget of
    its first sequence spans several; each span row carries the in-doc
    token slice ``[tok_from, tok_to)`` that lands in ``seq_id`` and the
    position ``seq_offset`` where it lands. Invariants (pytest): spans
    of a doc tile ``[0, n_tok)`` exactly, and spans of a sequence sum
    to exactly ``budget`` tokens (except the final partial sequence).

    One ``sequence()`` + ``explode`` over ``tok_start div budget ..
    (tok_start+n_tok-1) div budget`` on top of :func:`pack_sequences` —
    fan-out is ceil(n_tok/budget)+1 per doc, so the explode is linear
    in total corpus tokens, never quadratic."""
    p = pack_sequences(
        docs, budget=budget, text_col=text_col, id_col=id_col, block=block
    )
    spans = p.filter(F.col("n_tok") > 0).select(
        id_col,
        "n_tok",
        "tok_start",
        F.explode(
            F.sequence(
                F.expr(f"tok_start div {budget}"),
                F.expr(f"(tok_start + n_tok - 1) div {budget}"),
            )
        ).alias("seq_id"),
    )
    seq_base = F.col("seq_id") * budget
    return spans.select(
        id_col,
        "n_tok",
        "tok_start",
        "seq_id",
        F.greatest(seq_base - F.col("tok_start"), F.lit(0)).alias("tok_from"),
        F.least(
            seq_base + budget - F.col("tok_start"), F.col("n_tok")
        ).alias("tok_to"),
        F.greatest(F.col("tok_start") - seq_base, F.lit(0)).alias("seq_offset"),
    )


def corpus_prep_flags(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    neardup_est_jaccard: float = 0.5,
) -> DataFrame:
    """Per-document stage verdicts + final ``keep`` for the 4-stage
    corpus filter:

    1. Gopher-family quality gate (pure Column expressions);
    2. char-trigram language ID, kept only when it confirms the claimed
       ``lang`` (catches mislabeled/mixed documents);
    3. exact dedup on the canonical bag fingerprint (keep = min id);
    4. MinHash(64)+LSH(16 bands) near-dup drop (est Jaccard ≥
       ``neardup_est_jaccard`` — drop the higher id of each pair).
    """
    from sparkfeat import text as X
    from sparkfeat.dedup import minhash_lsh_pairs
    from sparkfeat.text import bag_fingerprint

    # Stage fusion: the quality/lang verdicts and the content fingerprint
    # come out of ONE projection over the corpus scan, and the two boolean
    # flags ride through the fingerprint shuffle of the exact-dedup window
    # — no flags⋈exact equi-join on the doc id (that join re-shuffled the
    # corpus twice for columns this stage already had in hand).
    w = Window.partitionBy("fingerprint")
    flagged = docs.select(
        id_col,
        X.gopher_quality_pass(text_col).alias("quality_pass"),
        # the Arrow kernel twin of lang_ngram_guess: same semantics
        # (pytest-asserted equal), ~4x faster — HOF list algebra is not
        # codegen-able, so the expr path runs interpreted anyway
        (X.lang_ngram_guess_arrow(text_col) == F.col(lang_col)).alias("lang_ok"),
        bag_fingerprint(text_col).alias("fingerprint"),
    ).withColumn("exact_keep", F.col(id_col) == F.min(id_col).over(w))
    drops = (
        minhash_lsh_pairs(docs, num_perm=64, bands=16, shingle_n=2)
        .filter(F.col("est_jaccard") >= neardup_est_jaccard)
        .select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("neardup_drop", F.lit(True))
    )
    return (
        flagged.drop("fingerprint")
        .join(drops, id_col, "left")
        .withColumn("neardup_drop", F.coalesce("neardup_drop", F.lit(False)))
        .withColumn(
            "keep",
            F.col("quality_pass")
            & F.col("lang_ok")
            & F.col("exact_keep")
            & ~F.col("neardup_drop"),
        )
    )


def token_ngram_hashes(text_col, n: int = 8):
    """md5 hashes of all word ``n``-grams of the lowercased text — the
    contamination key. Linear Column algebra: n shifted-slice zips (an
    outer-array ``slice`` inside a transform lambda re-evaluates the
    split per element and goes quadratic; the zip chain doesn't).
    Returns an empty array for docs shorter than ``n`` tokens."""
    c = F.lower(text_col if not isinstance(text_col, str) else F.col(text_col))
    toks = F.split(c, r"\s+")
    m = F.size(toks) - (n - 1)
    grams = F.slice(toks, 1, m)
    for k in range(1, n):
        grams = F.zip_with(
            grams, F.slice(toks, k + 1, m), lambda a, b: F.concat_ws(" ", a, b)
        )
    hashed = F.transform(grams, F.md5)
    return F.when(m >= 1, hashed).otherwise(F.array().cast("array<string>"))


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: flag every corpus document sharing at
    least one word ``n``-gram with a benchmark/eval set (the standard
    n-gram-overlap test-set-leakage check run before pretraining; n=8
    for English prose — pass a smaller n for tiny-vocabulary corpora).

    Scale shape: the benchmark side is eval sets — MBs, not TBs — so its
    distinct n-gram hashes BROADCAST; the corpus side explodes its
    per-doc distinct n-grams (≈ one row per corpus token, linear) into a
    broadcast left-semi-style hit count and re-aggregates on the doc id
    with map-side combine. The 100 TB corpus is never shuffled on the
    gram — only the (doc_id, n_hit) pairs move. Plan-asserted: broadcast
    join, no sort-merge on the corpus side.

    Output: one row per corpus doc — ``n_grams`` (distinct), ``n_hit``
    (distinct grams also in the benchmark), ``contaminated``.
    """
    bench_grams = (
        bench.select(
            F.explode(token_ngram_hashes(text_col, n=n)).alias("gram")
        ).distinct()
    )
    corpus_grams = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(token_ngram_hashes(text_col, n=n))).alias("gram"),
    )
    hits = (
        corpus_grams.join(F.broadcast(bench_grams), "gram", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    base = docs.select(
        F.col(id_col),
        F.size(F.array_distinct(token_ngram_hashes(text_col, n=n))).alias(
            "n_grams"
        ),
    )
    return base.join(hits, id_col, "left").select(
        id_col,
        F.col("n_grams").cast("bigint").alias("n_grams"),
        F.coalesce("n_hit", F.lit(0)).cast("bigint").alias("n_hit"),
        (F.coalesce("n_hit", F.lit(0)) > 0).alias("contaminated"),
    )


def duplicate_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Cross-document duplicate **span** statistics: the n-gram-
    granularity distributed version of exact-substring dedup ("for each
    position, is this n-token window repeated anywhere in the corpus?"
    — the check Lee et al.'s *Deduplicating Training Data Makes
    Language Models Better* runs with a suffix array on one machine; at
    corpus scale the n-gram lattice is the shuffle-friendly
    equivalent). A word n-gram occurring ≥ ``min_count`` times in the
    whole corpus (same-doc repeats included) marks its n-token span
    duplicated.

    Per doc: ``n_grams``; ``n_dup_grams`` + ``dup_fraction`` (how much
    of the gram lattice is repeated); ``covered_tokens`` +
    ``coverage_fraction`` (union of duplicated [pos, pos+n) spans — the
    fraction of the doc a span-level deduper would cut); and
    ``max_dup_span`` (longest run of consecutive duplicated grams +
    n-1 = length of the longest maximal duplicated substring, in
    tokens).

    Scale shape: one row per corpus token (posexplode of the gram
    lattice); occurrence counts via ``groupBy(gram)`` — map-side
    partial aggregation collapses hot boilerplate grams per task
    BEFORE the corpus-wide shuffle, so the count stage has no hot key;
    the gram⋈count equi-join back is the one skew-exposed stage and
    rides AQE skew-join splitting (session default). The per-doc span
    math is WINDOW-shaped, never a per-doc array: a lead()/islands
    pass over the (doc, pos) rows (``WindowExec`` buffers spill to
    disk, so a 10⁷-gram boilerplate doc is disk-bounded, not an
    in-memory ``collect_list`` agg buffer) — covered tokens is
    Σ min(next_pos − pos, n) over the sorted duplicated positions,
    max run is the classic pos − row_number gaps-and-islands, both
    then folded by ordinary partial-aggregating groupBys.

    No reference counterpart (the reference has no corpus operators);
    the oracle twin replays gram hashing positionally in DuckDB
    (queries.py ``_dup_spans_oracle``).
    """
    grams = docs.select(
        F.col(id_col),
        F.posexplode(token_ngram_hashes(text_col, n=n)).alias("pos", "gram"),
    )
    counts = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .filter(F.col("n_occ") >= min_count)
        .select("gram")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    stepped = grams.join(counts, "gram").select(
        F.col(id_col),
        # union-of-spans contribution of this position: the next
        # duplicated gram either overlaps (gap < n → count only the
        # gap) or doesn't (count the full window n); the last position
        # always contributes n.
        F.least(
            F.coalesce(F.lead("pos").over(w) - F.col("pos"), F.lit(n)),
            F.lit(n),
        ).alias("_cov"),
        (F.col("pos") - F.row_number().over(w)).alias("_isl"),
    )
    # islands → runs → per-doc; hash(doc) clusters (doc, isl) too, so
    # neither groupBy re-exchanges after the window's doc shuffle.
    runs = stepped.groupBy(id_col, "_isl").agg(
        F.count(F.lit(1)).alias("_run"), F.sum("_cov").alias("_covs")
    )
    per_doc = runs.groupBy(id_col).agg(
        F.sum("_run").alias("n_dup_grams"),
        F.sum("_covs").alias("covered_tokens"),
        F.max("_run").alias("_max_run"),
    )
    lc = F.lower(F.col(text_col))
    base = docs.select(
        F.col(id_col),
        F.size(F.split(lc, r"\s+")).alias("_n_tok"),
        F.greatest(
            F.size(F.split(lc, r"\s+")) - (n - 1), F.lit(0)
        ).alias("n_grams"),
    )
    nz = lambda c: F.coalesce(c, F.lit(0))  # noqa: E731
    return base.join(per_doc, id_col, "left").select(
        id_col,
        F.col("n_grams").cast("bigint").alias("n_grams"),
        nz(F.col("n_dup_grams")).cast("bigint").alias("n_dup_grams"),
        F.when(F.col("n_grams") > 0, nz(F.col("n_dup_grams")) / F.col("n_grams"))
        .otherwise(F.lit(0.0))
        .alias("dup_fraction"),
        nz(F.col("covered_tokens")).cast("bigint").alias("covered_tokens"),
        (nz(F.col("covered_tokens")) / F.col("_n_tok")).alias(
            "coverage_fraction"
        ),
        F.when(nz(F.col("n_dup_grams")) > 0, F.col("_max_run") + (n - 1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("max_dup_span"),
    )


def cut_duplicate_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Produce the span-deduplicated corpus: every duplicated n-gram
    span (≥ ``min_count`` corpus-wide occurrences) is CUT from all but
    its first occurrence — the action step on top of
    :func:`duplicate_spans`'s statistics, i.e. the n-gram-granularity
    distributed version of Lee et al.'s exact-substring dedup cut.

    "First occurrence" is the lexicographic minimum ``(doc_id, pos)``
    of the gram — deterministic on any cluster, no rand/row-order
    dependence. Cut spans within a doc are unioned before cutting, so
    overlapping duplicated grams never double-cut a token.

    Scale shape: identical to :func:`duplicate_spans` up to the cut
    set (map-side combined ``groupBy(gram)`` carrying
    ``min(struct(doc_id, pos))``, AQE-skew-handled join back). The cut
    positions are then interval-MERGED before they ever touch a per-doc
    array: a running-max window over the sorted (doc, pos) rows
    (spill-to-disk ``WindowExec``, not an agg buffer) labels maximal
    overlapping/adjacent span groups, a groupBy collapses each group to
    one ``(start, end)`` struct — so the per-doc collected state is
    O(merged spans) ≤ tokens/(n+1), and a boilerplate-heavy doc whose
    duplicated grams run contiguously (the operator's target input)
    collapses to a handful of spans, not 10⁷ positions. The rebuild is
    LINEAR: the disjoint sorted spans flatten to the cut-position
    array, ``array_except(sequence(0, n_tok−1), cut_pos)`` (hash-set
    difference, order-preserving) yields the kept indices, and a
    single ``transform`` gathers kept tokens by O(1) array index —
    O(tokens + cuts) per doc, never the O(tokens × cuts)
    per-token-containment probe (a fully-duplicated 200k-token doc is
    bounded-time pytested).

    Output: ``doc_id``, ``text`` (rebuilt, single-space joined — the
    tokenization this operator works at), ``n_tokens``,
    ``n_cut_tokens``, ``kept_fraction``.
    """
    grams = docs.select(
        F.col(id_col),
        F.posexplode(token_ngram_hashes(text_col, n=n)).alias("pos", "gram"),
    )
    occ = (
        grams.groupBy("gram")
        .agg(
            F.count(F.lit(1)).alias("n_occ"),
            F.min(F.struct(F.col(id_col), F.col("pos"))).alias("first"),
        )
        .filter(F.col("n_occ") >= min_count)
        .select("gram", "first")
    )
    cut_rows = grams.join(occ, "gram").filter(
        ~(
            (F.col(id_col) == F.col(f"first.{id_col}"))
            & (F.col("pos") == F.col("first.pos"))
        )
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    # interval merge: a span [pos, pos+n) starts a new group iff it
    # clears the running max end of everything before it (strict > :
    # adjacency merges too, keeping groups disjoint so the flatten
    # below needs no array_distinct).
    prev_end = F.max(F.col("pos") + n).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = cut_rows.select(
        F.col(id_col),
        F.col("pos"),
        F.when(F.col("pos") > F.coalesce(prev_end, F.lit(-1)), 1)
        .otherwise(0)
        .alias("_new"),
    )
    grouped = flagged.select(
        F.col(id_col),
        F.col("pos"),
        F.sum("_new")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("_grp"),
    )
    spans = grouped.groupBy(id_col, "_grp").agg(
        F.min("pos").alias("_s"), (F.max("pos") + n).alias("_e")
    )
    cuts = spans.groupBy(id_col).agg(
        F.sort_array(F.collect_list(F.struct("_s", "_e"))).alias("_spans"),
        F.sum(F.col("_e") - F.col("_s")).alias("_n_cut"),
    )
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    out = docs.join(cuts, id_col, "left").withColumn("_toks", toks)
    kept = F.expr(
        "transform("
        "  array_except("
        "    sequence(0, size(_toks) - 1),"
        "    flatten(transform(coalesce(_spans, array()),"
        "                      s -> sequence(s._s, s._e - 1)))),"
        "  i -> _toks[i])"
    )
    n_tok = F.size(F.col("_toks"))
    n_cut = F.coalesce(F.col("_n_cut"), F.lit(0))
    return out.select(
        id_col,
        F.concat_ws(" ", kept).alias("text"),
        n_tok.cast("bigint").alias("n_tokens"),
        n_cut.cast("bigint").alias("n_cut_tokens"),
        ((n_tok - n_cut) / n_tok).alias("kept_fraction"),
    )


def global_shuffle(
    docs: DataFrame,
    id_col: str = "doc_id",
    shards: int = 64,
    seed: str = "0",
) -> DataFrame:
    """Deterministic global shuffle for training-example ordering:
    every doc gets a pseudo-random ``shuffle_key`` (md5 of seed‖id), a
    ``shard`` (uniform hash bucket of the key), and its rank ``pos``
    inside the shard (ordered by key, id-tie-broken). Reading shards in
    ``(shard, pos)`` order IS the shuffled epoch order; changing
    ``seed`` reshuffles, same seed replays byte-identically on any
    cluster — no RNG state, no ``orderBy(rand())``.

    Scale shape: the ONLY wide op is the per-shard ``row_number`` — a
    hash-partitioned window over ``corpus/shards`` rows each, never a
    global sort. Pick ``shards`` so a shard fits an executor
    (10⁹ docs / 4096 shards ≈ 250k rows per window partition)."""
    key = F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string")))
    d = docs.select(
        F.col(id_col),
        key.alias("shuffle_key"),
        (F.conv(F.substring(key, 1, 8), 16, 10).cast("bigint") % shards)
        .cast("int")
        .alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("shuffle_key", id_col)
    return d.withColumn("pos", (F.row_number().over(w) - 1).cast("bigint"))


def mixture_sample(
    docs: DataFrame,
    targets: dict[str, float],
    frac: float = 0.5,
    group_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Domain/language mixture sampling: choose per-group hash-sampling
    rates so the kept corpus approximates the ``targets`` proportions at
    overall budget ``frac`` of the corpus, then keep each doc by a
    deterministic hash threshold (same md5-bucket machinery as
    ``sample_split`` — membership is a property of the id, stable under
    corpus growth and replayable in any engine).

    Rate math (waterfilling without iteration): group g with observed
    count n_g gets ``rate_g = min(1, targets[g] · frac · N / n_g)`` — a
    group too small to fill its target share is kept whole (capped at
    1.0; no upsampling). ``targets`` is a whitelist BY DESIGN: a mixture
    spec enumerates what goes in the training set, so groups absent from
    it get ``default_rate`` (default 0.0 = excluded) — the opposite
    default from :func:`sample_split`'s rebalancing map, where listing a
    language is an opt-in to downsample it.

    Scale shape: one tiny groupBy-count (|groups| rows) broadcast back;
    the keep decision is a pure map-side expression. Fully LAZY: the
    corpus total N is derived in-plan from the same group-counts
    aggregate (a second tiny agg cross-joined as a broadcast one-row
    table), not an eager ``docs.count()`` — building the plan fires no
    job, composes under further laziness, and never forces a second
    scan of a non-parquet source."""
    counts_raw = docs.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_group")
    )
    total_df = counts_raw.agg(F.sum("n_group").alias("_total"))
    counts = counts_raw.crossJoin(F.broadcast(total_df))
    rate_expr = None
    for g, p in sorted(targets.items()):
        cond = F.col(group_col) == g
        r = F.least(
            F.lit(1.0),
            F.lit(p) * (F.lit(frac) * F.col("_total")) / F.col("n_group"),
        )
        rate_expr = F.when(cond, r) if rate_expr is None else rate_expr.when(cond, r)
    rate_expr = (
        rate_expr.otherwise(F.lit(float(default_rate)))
        if rate_expr is not None
        else F.lit(float(default_rate))
    )
    b_keep = hash_bucket(id_col, start=13, buckets=1_000_000)
    return (
        docs.select(id_col, group_col)
        .join(F.broadcast(counts), group_col)
        .select(
            F.col(id_col),
            F.col(group_col),
            F.col("n_group").cast("bigint").alias("n_group"),
            rate_expr.alias("rate"),
            # floor, not cast: DuckDB CAST(double AS BIGINT) rounds while
            # Spark's cast truncates — FLOOR is the portable threshold.
            (b_keep < F.floor(rate_expr * 1_000_000).cast("bigint")).alias(
                "keep"
            ),
        )
    )


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split every document into overlapping fixed-size token chunks —
    the retrieval/embedding-context unit of a RAG or context-window
    pipeline (chunk i covers tokens ``[i·step, i·step + chunk)`` with
    ``step = chunk_tokens − overlap``; the last chunk is short rather
    than padded; docs with zero tokens yield zero chunks).

    Emits ``(doc_id, chunk_id, start_tok, end_tok, n_chunk_tokens,
    chunk_text)`` — the (start, end) token span makes every chunk
    traceable back to its source doc, the same manifest discipline as
    :func:`pack_spans`.

    Scale shape: pure per-row expression work — tokenize once,
    ``sequence``-explode the chunk starts, ``slice`` each chunk out of
    the shared token array by index. No shuffle, no UDF; the operator
    fuses into the scan projection, so chunking 100 TB is exactly one
    map-only pass. Chunk counts are linear in doc length
    (n/step + 1), so a heavy-tailed doc explodes into rows — spill- and
    split-friendly — never into one oversized array or agg buffer.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    step = chunk_tokens - overlap
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    base = docs.select(F.col(id_col), toks.alias("_tk")).withColumn(
        "_n", F.size("_tk")
    )
    # number of chunks: 1 + ceil((n - chunk)/step), floored at 1; 0 for
    # empty docs. ceil(a/b) as floor((a + b - 1)/b) — exact in integers.
    n_chunks = F.when(F.col("_n") <= 0, F.lit(0)).otherwise(
        1
        + F.greatest(
            F.floor(
                (F.col("_n") - chunk_tokens + (step - 1)) / F.lit(step)
            ),
            F.lit(0),
        )
    )
    starts = F.when(
        n_chunks > 0, F.sequence(F.lit(0), (n_chunks - 1).cast("int"))
    ).otherwise(F.array().cast("array<int>"))
    ex = base.select(
        id_col, "_tk", "_n", F.explode(starts).alias("_ci")
    ).select(
        id_col,
        "_tk",
        "_n",
        F.col("_ci"),
        (F.col("_ci") * step).alias("_s"),
        F.least(F.col("_ci") * step + chunk_tokens, F.col("_n")).alias("_e"),
    )
    return ex.select(
        id_col,
        F.col("_ci").cast("bigint").alias("chunk_id"),
        F.col("_s").cast("bigint").alias("start_tok"),
        F.col("_e").cast("bigint").alias("end_tok"),
        (F.col("_e") - F.col("_s")).cast("bigint").alias("n_chunk_tokens"),
        F.concat_ws(
            " ", F.slice("_tk", F.col("_s") + 1, F.col("_e") - F.col("_s"))
        ).alias("chunk_text"),
    )


def eval_sample(
    docs: DataFrame,
    k: int = 50,
    group_col: str = "lang",
    id_col: str = "doc_id",
    seed: str = "0",
    shards: int = 32,
) -> DataFrame:
    """Deterministic EXACT-k per-group sample — eval-set construction
    wants exactly k docs per language/domain, not a rate (the
    hash-rate samplers `sample_split`/`mixture_sample` give binomial
    counts). Order is md5(seed‖id) with id tie-break: membership is a
    pure function of (seed, id, the group's k smallest keys) — same
    seed replays identically on any cluster, a grown corpus only
    swaps members whose keys enter the bottom-k.

    Scale shape: exact top-k-per-group via the two-phase rank
    (`search.bm25_topk`'s move) — a per-(group, hash-shard) window
    prunes to k, then the global per-group window ranks only the
    ≤ shards×k survivors, so no single task ever sees a whole group
    (the 10⁹-doc 'en' group never lands in one window partition)."""
    key = F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string")))
    base = docs.select(group_col, id_col).withColumn("_key", key)
    order = [F.col("_key").asc(), F.col(id_col).asc()]
    local = Window.partitionBy(
        group_col, F.pmod(F.hash(F.col(id_col)), F.lit(shards))
    ).orderBy(*order)
    pruned = base.withColumn("_lr", F.row_number().over(local)).filter(
        F.col("_lr") <= k
    )
    final = Window.partitionBy(group_col).orderBy(*order)
    return (
        pruned.withColumn("sample_rank", F.row_number().over(final))
        .filter(F.col("sample_rank") <= k)
        .select(
            group_col,
            id_col,
            F.col("sample_rank").cast("int").alias("sample_rank"),
        )
    )


def curriculum_order(
    docs: DataFrame,
    stage_col: str = "ppl_bucket",
    id_col: str = "doc_id",
    shards: int = 64,
    seed: str = "0",
) -> DataFrame:
    """Curriculum training order (Bengio et al. 2009, the data-prep
    step): consume stages easiest-first, deterministically shuffled
    WITHIN each stage — e.g. feed ``ppl_bucket`` 0 (most fluent) before
    1 before 2. The difficulty label is any small-cardinality int
    column; docs with a NULL stage (unscoreable, e.g. zero-token) are
    excluded from the manifest by design.

    Ordering machinery is :func:`global_shuffle`'s: md5(seed‖id)
    shuffle key (no RNG state, same seed replays byte-identically on
    any cluster), uniform shard from the key's first 8 hex digits,
    per-(stage, shard) rank — the only corpus-sized wide op is that
    hash-partitioned window, never a global sort. ``global_pos`` (the
    single contiguous epoch position: every stage-s doc before every
    stage-s+1 doc) comes from the pack_sequences move: per-(stage,
    shard) counts → running offsets on a stages×shards-row table (the
    one single-partition window, bounded by shards, NOT by corpus) →
    broadcast-joined back.

    Output: (id, stage, shard, pos, global_pos); reading in
    (stage, shard, pos) order — or by ``global_pos`` — IS the
    curriculum epoch.
    """
    key = F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string")))
    d = docs.filter(F.col(stage_col).isNotNull()).select(
        F.col(id_col),
        F.col(stage_col).cast("int").alias("stage"),
        key.alias("shuffle_key"),
        (F.conv(F.substring(key, 1, 8), 16, 10).cast("bigint") % shards)
        .cast("int")
        .alias("shard"),
    )
    w = Window.partitionBy("stage", "shard").orderBy("shuffle_key", id_col)
    ranked = d.withColumn("pos", (F.row_number().over(w) - 1).cast("bigint"))
    counts = ranked.groupBy("stage", "shard").agg(
        F.count(F.lit(1)).alias("_c")
    )
    w_off = (
        Window.partitionBy(F.lit(0))
        .orderBy("stage", "shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = counts.select(
        "stage",
        "shard",
        F.coalesce(F.sum("_c").over(w_off), F.lit(0)).alias("_off"),
    )
    return (
        ranked.join(F.broadcast(offs), ["stage", "shard"])
        .withColumn("global_pos", (F.col("_off") + F.col("pos")).cast("bigint"))
        .select(id_col, "stage", "shard", "pos", "global_pos")
    )


def dedup_lines(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_occurrences: int = 5,
    min_chars: int = 10,
    broadcast_hot: bool = True,
) -> DataFrame:
    """Cross-document line-level boilerplate removal (the CCNet /
    RefinedWeb exact line-dedup stage): a line whose TRIMMED text
    occurs ``>= min_occurrences`` times across the whole corpus — "Sign
    in to continue", nav bars, cookie banners — is cut from EVERY doc
    (all occurrences, no first-keeper: removal is a property of the
    line alone, so the result is independent of row order and of which
    shard saw the line first). Lines shorter than ``min_chars`` after
    trimming never count and are never cut (short structural lines —
    headings, blanks — are legitimately frequent).

    Row-preserving: every input doc comes back, rebuilt in original
    line order ('' if every line was boilerplate, NULL text stays
    NULL), with per-doc audit counts.

    Scale shape (100 TB lens): explode to lines (map), ONE
    map-side-combined ``groupBy(line_key)`` count — boilerplate keys
    are exactly the hot keys, and partial aggregation collapses them
    before the exchange — filtered to the hot set, which is joined back
    by equi-key: BROADCAST by default (the >= k set is tiny next to the
    corpus; set ``broadcast_hot=False`` at extreme hot-set cardinality
    and AQE's skew join handles the fan-in), then ONE ``groupBy(doc)``
    rebuild whose per-task state is the doc's own kept lines (the text
    already lived in one row). Nothing quadratic, no global sort.

    Output: (id, text rebuilt, n_lines, n_removed, removed_frac).
    """
    trimmed = F.trim(F.col("line"))
    lines = (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("line_no", "line"),
        )
        .withColumn("lkey", F.md5(trimmed))
        .withColumn("elig", F.length(trimmed) >= min_chars)
    )
    hot = (
        lines.filter(F.col("elig"))
        .groupBy("lkey")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= min_occurrences)
        .select("lkey", F.lit(True).alias("_h"))
    )
    if broadcast_hot:
        hot = F.broadcast(hot)
    marked = lines.join(hot, "lkey", "left").withColumn(
        "_hot", F.coalesce(F.col("_h"), F.lit(False))
    )
    kept = F.when(
        ~F.col("_hot"), F.struct(F.col("line_no").alias("p"), F.col("line").alias("l"))
    )
    rebuilt = marked.groupBy(id_col).agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(kept)), lambda s: s["l"]), "\n"
        ).alias("_text"),
        F.count(F.lit(1)).alias("_nl"),
        F.sum(F.col("_hot").cast("bigint")).alias("_nr"),
    )
    n_lines = F.coalesce(F.col("_nl"), F.lit(0)).cast("bigint")
    n_removed = F.coalesce(F.col("_nr"), F.lit(0)).cast("bigint")
    return (
        docs.select(id_col)
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.col("_text").alias(text_col),
            n_lines.alias("n_lines"),
            n_removed.alias("n_removed"),
            F.when(
                n_lines > 0, F.round(n_removed / n_lines, 6)
            ).alias("removed_frac"),
        )
    )


def epoch_plan(
    docs: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    token_col: str = "n_tok",
    group_col: str = "source",
    max_epochs: float = 4.0,
) -> DataFrame:
    """Data-constrained repetition plan (Muennighoff et al. 2023: when
    the token budget exceeds the corpus, repeat your best sources — but
    past ~4 epochs repeated tokens stop buying loss): split
    ``token_budget`` across groups by normalized ``weights`` (a
    whitelist, like :func:`mixture_sample` — absent groups contribute
    nothing), then express each group's share in EPOCHS of that group:
    ``n_epochs_full`` whole passes plus a fractional last pass kept at
    ``frac_ppm`` parts-per-million, the want capped at ``max_epochs``
    passes (``capped`` flags groups whose weight asked for more).

    ``frac_ppm`` is an exact integer (floor of the fractional epoch ×
    10⁶) so the downstream hash-keep threshold — and the whole manifest
    — is integer-stable across engines. Fully lazy, one tiny
    groupBy(group) aggregate; zero-token groups are excluded (an epoch
    of nothing is undefined).
    """
    total_w = float(sum(weights.values()))
    want = {g: float(w) / total_w * float(token_budget) for g, w in weights.items()}
    stats = (
        docs.filter(F.col(group_col).isin(list(weights)))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col(token_col)).cast("bigint").alias("tok_group"),
        )
        .filter(F.col("tok_group") > 0)
    )
    want_expr = None
    for g, v in sorted(want.items()):
        cond = F.col(group_col) == g
        want_expr = (
            F.when(cond, F.lit(v)) if want_expr is None else want_expr.when(cond, F.lit(v))
        )
    tokd = F.col("tok_group").cast("double")
    cap = F.lit(float(max_epochs)) * tokd
    eff = F.least(want_expr, cap)
    epochs = eff / tokd
    n_full = F.floor(epochs).cast("int")
    return stats.select(
        group_col,
        "n_docs",
        "tok_group",
        F.round(want_expr, 6).alias("want_tokens"),
        n_full.alias("n_epochs_full"),
        F.floor((epochs - F.floor(epochs)) * 1_000_000)
        .cast("bigint")
        .alias("frac_ppm"),
        (want_expr > cap).alias("capped"),
    )


def epoch_expand(
    docs: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    id_col: str = "doc_id",
    token_col: str = "n_tok",
    group_col: str = "source",
    max_epochs: float = 4.0,
) -> DataFrame:
    """The action step of :func:`epoch_plan`: the per-document
    repetition manifest. Every doc of group g appears once per full
    epoch (``epoch`` = 0..n_full-1) plus — when the plan has a
    fractional pass — an ``is_frac`` row kept iff the doc's
    deterministic md5 bucket (property of the id: stable under corpus
    growth, replayable in any engine, independent of the split/keep
    buckets by hex offset) lands under ``frac_ppm``, so the realized
    extra pass is an unbiased frac-rate subset with zero RNG state.

    Scale shape: the plan (≤ |groups| rows) broadcasts onto the corpus
    scan; expansion is explode(sequence) — map-only, output exactly
    Σ_g n_g·epochs_g rows, no shuffle of the corpus at all.
    """
    plan = epoch_plan(
        docs, weights, token_budget,
        token_col=token_col, group_col=group_col, max_epochs=max_epochs,
    )
    n_eps = F.col("n_epochs_full") + (F.col("frac_ppm") > 0).cast("int")
    joined = docs.select(
        id_col, group_col, F.col(token_col).cast("bigint").alias("n_tok")
    ).join(
        F.broadcast(plan.select(group_col, "n_epochs_full", "frac_ppm")), group_col
    )
    eps = F.when(n_eps > 0, F.sequence(F.lit(0), n_eps - 1))
    exploded = joined.select(
        id_col, group_col, "n_tok", "n_epochs_full", "frac_ppm",
        F.explode(eps).alias("epoch"),
    )
    is_frac = F.col("epoch") == F.col("n_epochs_full")
    keep_b = hash_bucket(id_col, start=17, buckets=1_000_000)
    return exploded.filter(~is_frac | (keep_b < F.col("frac_ppm"))).select(
        id_col,
        group_col,
        "n_tok",
        F.col("epoch").cast("int").alias("epoch"),
        is_frac.alias("is_frac"),
        "n_epochs_full",
        "frac_ppm",
    )


def decontaminate_bloom(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    n_words: int = 256,
    n_hashes: int = 5,
) -> DataFrame:
    """:func:`decontaminate` at reference-set scales where the exact
    broadcast stops working: the benchmark's distinct gram hashes are
    folded into an in-plan Bloom filter (:mod:`sparkfeat.bloom` — bits
    broadcast ~30-50× smaller than the md5 strings), and every corpus
    gram is gated map-only against the packed words. One-sided error:
    ``n_hit_bloom >= n_hit`` exact always (no false negatives — a
    contaminated doc is NEVER missed); the ~FPR·n_grams overcount flags
    a small superset, which is the right failure mode for a
    contamination screen (confirm the flagged minority exactly if
    needed). Deterministic: same keys → same bits → same verdicts on
    any engine.

    Output mirrors :func:`decontaminate`: (id, n_grams, n_hit_bloom,
    flagged).
    """
    from sparkfeat.bloom import bloom_build, bloom_gate

    bench_grams = bench.select(
        F.explode(token_ngram_hashes(text_col, n=n)).alias("gram")
    ).distinct()
    bloom = bloom_build(bench_grams, "gram", n_words=n_words, n_hashes=n_hashes)
    corpus_grams = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(token_ngram_hashes(text_col, n=n))).alias("gram"),
    )
    hits = (
        bloom_gate(corpus_grams, F.col("gram"), bloom)
        .groupBy(id_col)
        .agg(F.sum(F.col("bloom_hit").cast("bigint")).alias("n_hit_bloom"))
    )
    base = docs.select(
        F.col(id_col),
        F.size(F.array_distinct(token_ngram_hashes(text_col, n=n))).alias("n_grams"),
    )
    return base.join(hits, id_col, "left").select(
        id_col,
        F.col("n_grams").cast("bigint").alias("n_grams"),
        F.coalesce("n_hit_bloom", F.lit(0)).cast("bigint").alias("n_hit_bloom"),
        (F.coalesce("n_hit_bloom", F.lit(0)) > 0).alias("flagged"),
    )


def cluster_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    train: float = 0.8,
    val: float = 0.1,
) -> DataFrame:
    """Leakage-safe train/val/test assignment: split membership is a
    property of the near-duplicate CLUSTER, never the individual doc.
    A doc-level hash split (:func:`sample_split`) puts ~2·p·(1−p) of
    every near-dup pair on opposite sides of the train/test fence —
    the classic test-set-contamination failure (the eval set "novelty"
    is a near-copy of training data, so measured loss is memorization,
    not generalization). Here every doc inherits the split of its
    connected-component cluster id (smallest reachable doc id through
    the pair graph, :func:`sparkfeat.dedup.connected_components` —
    deterministic on any cluster), so a near-dup group moves as one
    unit by construction.

    Nests with :func:`sample_split`: the cluster id is hashed with the
    SAME bucket (start=25) and thresholds, and a singleton's cluster id
    is its own doc id — so docs with no near-dups keep their exact
    doc-level assignment, and adopting cluster-safety only ever moves
    members of multi-doc clusters. Scale shape: the component labels
    cover only non-isolated nodes (pair-graph sized, not corpus sized);
    the corpus side is one id-projected left join + a cluster-size
    groupBy — text never shuffles.

    Output: (id, cluster_id, cluster_size, split_bucket, split).
    """
    from sparkfeat.dedup import neardup_clusters

    lab = neardup_clusters(docs, pairs, id_col=id_col)
    b = hash_bucket("cluster_id", start=25)
    split = (
        F.when(b < int(train * 1000), "train")
        .when(b < int((train + val) * 1000), "val")
        .otherwise("test")
    )
    return lab.select(
        id_col,
        "cluster_id",
        "cluster_size",
        b.cast("int").alias("split_bucket"),
        split.alias("split"),
    )


def temperature_weights(
    docs: DataFrame,
    alpha: float = 0.3,
    group_col: str = "source",
    token_col: str = "n_tok",
) -> DataFrame:
    """Temperature-scaled source sampling weights — the multilingual /
    multi-source mixture rule (Lample & Conneau 2019, XLM; used
    unchanged by mT5/XLM-R/BLOOM): sample source i with probability
    ``q_i ∝ p_i^α`` where ``p_i`` is its raw token share. ``α = 1``
    reproduces natural proportions; ``α → 0`` is uniform; the usual
    0.2–0.7 lifts low-resource sources without drowning the head.
    Complements :func:`mixture_sample` (which needs target proportions
    as INPUT) and :func:`epoch_plan` (whose ``weights`` this output
    feeds): this operator DERIVES the mixture from the corpus itself.

    All plan arithmetic, no driver math: ONE tiny groupBy(group)
    aggregate, total and normalizer folded back as one-row broadcast
    cross-joins. The unnormalized ``p_i^α`` terms are canonicalized to
    9 dp BEFORE the normalizing sum (the same round-before-solve move
    as :mod:`sparkfeat.probe`), so every downstream ratio is arithmetic
    on identical doubles in any engine. Fully lazy.

    Output per group: ``(group, tok_group, p_raw, q_temp, oversample)``
    — ``oversample`` = q/p, the repetition factor each source needs at
    training time (>1 = upsampled), all shares rounded to 6 dp.
    """
    stats = (
        docs.groupBy(group_col)
        .agg(F.sum(F.col(token_col)).cast("bigint").alias("tok_group"))
        .filter(F.col("tok_group") > 0)
    )
    tot = stats.agg(F.sum("tok_group").cast("bigint").alias("_tot"))
    p = (
        stats.crossJoin(F.broadcast(tot))
        .withColumn("p_raw", F.col("tok_group").cast("double") / F.col("_tot"))
        .withColumn("_w", F.round(F.pow("p_raw", F.lit(float(alpha))), 9))
    )
    z = p.agg(F.sum("_w").alias("_z"))
    return p.crossJoin(F.broadcast(z)).select(
        group_col,
        "tok_group",
        F.round("p_raw", 6).alias("p_raw"),
        F.round(F.col("_w") / F.col("_z"), 6).alias("q_temp"),
        F.round(F.col("_w") / F.col("_z") / F.col("p_raw"), 6).alias("oversample"),
    )


def unimax_allocation(
    docs: "DataFrame",
    budget: float | None = None,
    max_epochs: float = 4.0,
    group_col: str = "source",
    token_col: str = "n_tok",
    budget_frac: float | None = None,
) -> "DataFrame":
    """UniMax budgeted mixture allocation (Chung et al. 2023, "UniMax:
    Fairer and More Effective Language Sampling for Large-Scale
    Multilingual Pretraining") — the BUDGETED complement of
    :func:`temperature_weights`: temperature reshapes *shares*, UniMax
    answers the planning question "given a total token budget B and an
    epoch cap e, how many tokens does each source contribute?" by
    water-filling: spread B uniformly, but never take more than
    ``e · n_g`` tokens from group g (the repetition ceiling past which
    data-constrained scaling degrades); surplus from capped small
    groups reflows to the rest. Head sources share one waterline τ,
    tail sources contribute their full cap — fairer than temperature
    (no tail starvation) with an explicit repetition bound.

    Closed form, no iteration: the capped set is a PREFIX of the
    cap-ascending order, so one ``row_number``/``cumsum`` window over
    the k-row group table finds it — ``fair_i = (B − Σ_{j<i} cap_j) /
    (k − i + 1)``, group i capped iff every prefix group satisfies
    ``cap ≤ fair`` (a running-min flag — belt and braces for the
    prefix theorem), τ = ``fair`` at the first uncapped row. Caps are
    6-dp-canonicalized before the prefix sum and fairs to 9 dp, so
    every comparison and the final allocations are arithmetic on
    identical doubles in any engine. Scale shape: ONE tiny
    groupBy(group) over the corpus; everything after flows k rows
    (windows over the GROUP table, not the corpus), τ/budget-used as
    one-row broadcast folds. Fully lazy. Pass ``budget`` as an
    absolute token count, or ``budget_frac`` to derive B = frac · Σ
    tokens from the corpus itself IN-PLAN (no driver count — the
    mixture_sample laziness lesson), exactly one of the two.

    Output per group: ``(group, tok_group, cap, alloc, epochs,
    capped)`` plus panel constants (``waterline`` — NULL when the
    budget covers every cap, ``budget_used`` = Σ alloc ≤ B, ``n_groups``)
    riding every row so the value hash verifies the water-filling
    solve, not just per-row arithmetic."""
    from pyspark.sql import Window

    r6 = lambda c: F.round(c, 6)  # noqa: E731
    r9 = lambda c: F.round(c, 9)  # noqa: E731
    g = (
        docs.groupBy(group_col)
        .agg(F.sum(F.col(token_col)).cast("bigint").alias("tok_group"))
        .filter(F.col("tok_group") > 0)
        .withColumn(
            "cap", r6(F.col("tok_group") * F.lit(float(max_epochs)))
        )
        # LAZY persist (no job fires): the solve references this k-row
        # table four times (totals, rank, waterline, budget fold) — at
        # 100 TB each reference would otherwise re-scan the corpus to
        # rebuild the aggregate; cached, the scan happens once (the
        # bt_strengths lineage strategy)
        .persist()
    )
    if (budget is None) == (budget_frac is None):
        raise ValueError("pass exactly one of budget / budget_frac")
    wo = Window.orderBy("cap", group_col)
    wrun = wo.rowsBetween(Window.unboundedPreceding, 0)
    k = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("_k"),
        # budget_frac derives B from the corpus itself, IN-PLAN (no
        # driver count): B = frac · Σ tokens, 6-dp-canonicalized
        r6(
            F.sum("tok_group").cast("double")
            * F.lit(float(budget_frac if budget_frac is not None else 0.0))
        ).alias("_bfrac"),
    )
    bcol = (
        F.lit(float(budget)) if budget is not None else F.col("_bfrac")
    )
    ranked = (
        g.crossJoin(F.broadcast(k))
        .withColumn("_idx", F.row_number().over(wo))
        .withColumn("_pfx", r6(F.sum("cap").over(wrun) - F.col("cap")))
        .withColumn(
            "_fair",
            r9(
                (bcol - F.col("_pfx"))
                / (F.col("_k") - F.col("_idx") + 1).cast("double")
            ),
        )
        .withColumn(
            "_capped",
            F.min((F.col("cap") <= F.col("_fair")).cast("int")).over(wrun),
        )
    )
    tau = ranked.agg(
        F.min_by(
            F.col("_fair"), F.when(F.col("_capped") == 0, F.col("_idx"))
        ).alias("_tau")
    )
    alloc = F.when(F.col("_capped") == 1, F.col("cap")).otherwise(
        F.col("_tau")
    )
    out = (
        ranked.crossJoin(F.broadcast(tau))
        .withColumn("alloc", r6(alloc))
        .withColumn(
            "epochs", r6(F.col("alloc") / F.col("tok_group").cast("double"))
        )
    )
    used = out.agg(r6(F.sum("alloc")).alias("budget_used"))
    return out.crossJoin(F.broadcast(used)).select(
        group_col,
        "tok_group",
        "cap",
        "alloc",
        "epochs",
        F.col("_capped").cast("int").alias("capped"),
        r6(F.col("_tau")).alias("waterline"),
        "budget_used",
        F.col("_k").alias("n_groups"),
    )


def weighted_sample(
    docs: DataFrame,
    k: int = 50,
    weight_col: str = "n_chars",
    group_col: str = "lang",
    id_col: str = "doc_id",
    seed: str = "0",
    shards: int = 32,
) -> DataFrame:
    """Deterministic weighted EXACT-k per-group sample without
    replacement — Efraimidis–Spirakis A-Res (2006): give every row the
    key ``ln(u) / w`` (``u`` uniform, ``w`` its weight) and keep the k
    LARGEST keys; marginal inclusion probability is proportional to
    weight. The quality-weighted eval-set / seed-corpus builder: "k
    docs per language, preferring high-quality ones" — the weighted
    upgrade of :func:`eval_sample` (which this mirrors exactly at
    uniform weights in machinery, sharing its two-phase rank).

    Determinism: ``u = (h + 1) / 2⁴⁸ ∈ (0, 1]`` from the first 12 hex
    digits of ``md5(seed ‖ id)`` — no RNG state, same seed replays
    byte-identically on any cluster; ``ln`` (the one libm call) is
    canonicalized to 9 dp BEFORE the rank compare (house convention),
    ties broken by id. Rows with NULL or non-positive weight are
    excluded (they have zero inclusion probability in the limit
    anyway; documents with no mass can't be sampled).

    Scale shape: exact top-k-per-group via the two-phase rank
    (`eval_sample` / `search.bm25_topk`'s move) — per-(group, shard)
    windows prune to k, the global per-group window ranks only
    ≤ shards × k survivors, so a 10⁹-doc group never lands in one
    window partition.

    Output: ``(group_col, id_col, weight, sample_rank)``.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("bigint")
    u = (h + F.lit(1)).cast("double") / F.lit(float(1 << 48))
    w = F.col(weight_col).cast("double")
    base = (
        docs.filter(w.isNotNull() & (w > 0))
        .select(group_col, id_col, w.alias("weight"))
        .withColumn("_r", F.round(F.log(u) / F.col("weight"), 9))
    )
    order = [F.col("_r").desc(), F.col(id_col).asc()]
    local = Window.partitionBy(
        group_col, F.pmod(F.hash(F.col(id_col)), F.lit(shards))
    ).orderBy(*order)
    pruned = base.withColumn("_lr", F.row_number().over(local)).filter(
        F.col("_lr") <= k
    )
    final = Window.partitionBy(group_col).orderBy(*order)
    return (
        pruned.withColumn("sample_rank", F.row_number().over(final))
        .filter(F.col("sample_rank") <= k)
        .select(
            group_col,
            id_col,
            "weight",
            F.col("sample_rank").cast("int").alias("sample_rank"),
        )
    )


def mixture_sample_from(
    docs: DataFrame,
    weights: DataFrame,
    frac: float = 0.5,
    group_col: str = "lang",
    id_col: str = "doc_id",
    weight_col: str = "q_temp",
) -> DataFrame:
    """:func:`mixture_sample` with the target mixture supplied as a
    DATAFRAME instead of a Python dict — the composition joint that
    lets :func:`temperature_weights` (or any learned mixture) feed the
    sampler in ONE lazy plan with zero driver round-trip: derive
    q ∝ p^α from the corpus, turn it into per-group keep rates, flag
    every doc — a single composed DAG, no collect of the weights.

    Same rate math (waterfilling cap at 1.0), same md5-bucket keep
    machinery, same scale shape (two tiny aggregates + broadcast
    joins; the corpus-sized side is map-only). Groups absent from
    ``weights`` get rate 0 (a mixture spec is a whitelist).
    """
    counts_raw = docs.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_group"))
    total_df = counts_raw.agg(F.sum("n_group").alias("_total"))
    counts = counts_raw.crossJoin(F.broadcast(total_df))
    # NB: guard the whitelist with when(), NOT coalesce(least(1.0, x))
    # — least() IGNORES nulls in Spark and DuckDB alike, so a missing
    # weight would silently become rate 1.0 (keep the whole group)
    raw = F.col("_q") * (F.lit(float(frac)) * F.col("_total")) / F.col("n_group")
    rate = F.when(F.col("_q").isNull(), F.lit(0.0)).otherwise(
        F.least(F.lit(1.0), raw)
    )
    rates = counts.join(
        weights.select(group_col, F.col(weight_col).alias("_q")),
        group_col,
        "left",
    ).select(group_col, "n_group", rate.alias("_rate"))
    b_keep = hash_bucket(id_col, start=13, buckets=1_000_000)
    return (
        docs.select(id_col, group_col)
        .join(F.broadcast(rates), group_col)
        .select(
            F.col(id_col),
            F.col(group_col),
            F.col("n_group").cast("bigint").alias("n_group"),
            F.col("_rate").alias("rate"),
            (b_keep < F.floor(F.col("_rate") * 1_000_000).cast("bigint")).alias(
                "keep"
            ),
        )
    )


def length_batches(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_width: int = 16,
    max_batch_tokens: int = 256,
    cap_tokens: int = 512,
    shards: int = 64,
    seed: str = "0",
) -> DataFrame:
    """Length-bucketed dynamic-batching manifest — the max-tokens
    batching every SFT/eval loader runs (fairseq/T5 style): examples
    are bucketed by token length, padded to the bucket's upper edge,
    and packed into batches of ``max_batch_tokens`` PADDED tokens, so
    every batch is a dense rectangle and the padding waste is bounded
    by ``bucket_width − 1`` per example. Unlike :func:`pack_sequences`
    (which concatenates and splits across doc boundaries — the
    pretraining mode), examples here stay ATOMIC — the instruction-
    tuning / eval mode where splitting an example corrupts it.

    Within a bucket the pad length is constant (``pad_len =
    (bucket+1)·bucket_width``), so the token budget collapses to an
    exact per-bucket ``batch_size = max(1, floor(budget / pad_len))``
    and greedy fill ≡ ``batch_id = floor(rank / batch_size)`` — the
    one case where budget batching IS integer math, which is exactly
    why the bucketing comes first. Order within a bucket is the
    deterministic md5(seed‖id) shuffle (same seed replays on any
    cluster; batches are i.i.d.-ish in length AND content). Docs longer
    than ``cap_tokens`` are truncated for budgeting (``n_trunc_tokens``
    audits the loss); zero-token / null docs are excluded.

    Scale shape: :func:`curriculum_order`'s two-phase rank — per-
    (bucket, shard) window rank plus a buckets×shards-row offset table
    broadcast back — so a 10⁹-example bucket never lands in one window
    partition and the only corpus-sized wide op is the hash-partitioned
    window. Everything else is integer Column math that fuses into the
    scan.

    Output: (id, n_tok, bucket, pad_len, batch_size, batch_id,
    pos_in_batch, pad_waste, n_trunc_tokens); reading in
    (bucket, batch_id, pos_in_batch) order materializes the batches.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    key = F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string")))
    d = (
        docs.select(
            F.col(id_col),
            F.size(toks).alias("n_tok"),
            key.alias("_key"),
            (F.conv(F.substring(key, 1, 8), 16, 10).cast("bigint") % shards)
            .cast("int")
            .alias("_shard"),
        )
        .filter(F.col("n_tok") > 0)
        .withColumn("_cap", F.least(F.col("n_tok"), F.lit(cap_tokens)))
        .withColumn(
            "bucket",
            F.floor((F.col("_cap") - 1) / bucket_width).cast("int"),
        )
        .withColumn(
            "pad_len", ((F.col("bucket") + 1) * bucket_width).cast("int")
        )
        .withColumn(
            "batch_size",
            F.greatest(
                F.floor(F.lit(max_batch_tokens) / F.col("pad_len")), F.lit(1)
            ).cast("int"),
        )
    )
    w = Window.partitionBy("bucket", "_shard").orderBy("_key", id_col)
    ranked = d.withColumn("_pos", (F.row_number().over(w) - 1).cast("bigint"))
    counts = ranked.groupBy("bucket", "_shard").agg(
        F.count(F.lit(1)).alias("_c")
    )
    w_off = (
        Window.partitionBy("bucket")
        .orderBy("_shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = counts.select(
        "bucket",
        "_shard",
        F.coalesce(F.sum("_c").over(w_off), F.lit(0)).alias("_off"),
    )
    rank = F.col("_off") + F.col("_pos")
    pos_in_batch = rank % F.col("batch_size")
    # exact integer division: subtract the remainder first — the
    # quotient of a double division can round UP across an integer
    # boundary at extreme rank, floor()ing to the wrong batch.
    batch_id = (rank - pos_in_batch) / F.col("batch_size")
    return (
        ranked.join(F.broadcast(offs), ["bucket", "_shard"])
        .select(
            F.col(id_col),
            F.col("n_tok").cast("bigint").alias("n_tok"),
            "bucket",
            "pad_len",
            "batch_size",
            batch_id.cast("bigint").alias("batch_id"),
            pos_in_batch.cast("int").alias("pos_in_batch"),
            (F.col("pad_len") - F.col("_cap")).cast("int").alias("pad_waste"),
            (F.col("n_tok") - F.col("_cap")).cast("bigint").alias(
                "n_trunc_tokens"
            ),
        )
    )


def memorization_score(
    candidates: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    nd: int = 6,
) -> DataFrame:
    """Per-candidate n-gram memorization rate against a reference
    corpus — the Lee/Carlini-style verbatim-overlap audit run on model
    GENERATIONS vs their training data (or on a new crawl vs an
    already-trained corpus). `decontaminate` answers "does this corpus
    doc touch the (tiny, broadcastable) benchmark?"; this operator
    answers the inverse-scale question — "how much of each candidate
    is already verbatim in the (100 TB) reference?" — so the reference
    side can NEVER broadcast and the join shape is different by
    design.

    Per candidate: ``n_grams`` (all word-``n``-gram positions),
    ``n_distinct``, ``n_hit`` (positions whose gram occurs anywhere in
    the reference), ``n_distinct_hit``, ``mem_rate = n_hit/n_grams``
    (position-weighted — a doc that repeats one memorized line scores
    by how much of its TEXT is covered), ``distinct_mem_rate``.
    Candidates shorter than ``n`` tokens report zeros with NULL rates.

    Scale shape: the reference collapses to its DISTINCT gram-hash
    table map-side BEFORE any join (Zipf ⇒ far smaller than its token
    stream); candidates pre-aggregate to (doc, gram, multiplicity).
    The single wide operation is the gram-keyed LEFT-SEMI equi-join —
    md5 8-gram keys are near-uniform, residual boilerplate heads are
    AQE skew-join's case — followed by a doc-keyed map-side-combinable
    rollup. Nothing corpus-sized reaches the driver; no UDFs.
    """
    ref_grams = reference.select(
        F.explode(token_ngram_hashes(text_col, n=n)).alias("gram")
    ).distinct()
    # ONE candidate gram-hash pass (r6): totals and distinct counts are
    # derived FROM the (doc, gram, multiplicity) aggregate — n_grams =
    # Σ mult, n_distinct = row count — instead of a separate whole-text
    # size() projection that re-ran the md5 n-gram chain; both consumers
    # of `cg` prune to the identical aggregate, so its exchange is
    # computed once. Sub-n-token candidates (no gram rows) re-enter via
    # the id-only left join with zero-coalesced counts, exactly the old
    # contract.
    cg = (
        candidates.select(
            F.col(id_col),
            F.explode(token_ngram_hashes(text_col, n=n)).alias("gram"),
        )
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("_mult"))
    )
    base = cg.groupBy(id_col).agg(
        F.sum("_mult").cast("bigint").alias("n_grams"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
    )
    hits = (
        cg.join(ref_grams, "gram", "left_semi")
        .groupBy(id_col)
        .agg(
            F.sum("_mult").cast("bigint").alias("n_hit"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_hit"),
        )
    )
    r6 = lambda c: F.round(c, nd) + F.lit(0.0)  # noqa: E731
    out = (
        candidates.select(F.col(id_col))
        .join(base, id_col, "left")
        .join(hits, id_col, "left")
    )
    n_grams = F.coalesce("n_grams", F.lit(0)).cast("bigint")
    n_distinct = F.coalesce("n_distinct", F.lit(0)).cast("bigint")
    return out.select(
        id_col,
        n_grams.alias("n_grams"),
        n_distinct.alias("n_distinct"),
        F.coalesce("n_hit", F.lit(0)).cast("bigint").alias("n_hit"),
        F.coalesce("n_distinct_hit", F.lit(0))
        .cast("bigint")
        .alias("n_distinct_hit"),
        F.when(
            n_grams > 0,
            r6(F.coalesce("n_hit", F.lit(0)).cast("double") / n_grams),
        ).alias("mem_rate"),
        F.when(
            n_distinct > 0,
            r6(
                F.coalesce("n_distinct_hit", F.lit(0)).cast("double")
                / n_distinct
            ),
        ).alias("distinct_mem_rate"),
    )


def filter_waterfall(
    flags: DataFrame,
    stages: list,
    nd: int = 6,
) -> DataFrame:
    """Drop-attribution waterfall for a composed filter: given a
    per-doc verdict table (each stage's PASS predicate) and the stage
    ORDER, report where documents actually fall out — the curation
    report every ablation discussion starts from ("dedup removed 40%"
    is meaningless unless you say what ran before it).

    ``stages`` is an ordered list of ``(stage_name, pass_column)``
    (Column or column-name; NULL counts as fail). Output one row per
    stage, in order, plus a final ``kept`` row:

    * ``n_in`` — docs that SURVIVED every earlier stage;
    * ``n_dropped_here`` — of those, docs this stage rejects (the
      waterfall attribution: each doc is charged to its FIRST failing
      stage);
    * ``n_fail_independent`` — docs this stage rejects regardless of
      order (the marginal view; the two differ exactly by overlap);
    * ``drop_rate`` — n_dropped_here / n_in (6 dp, NULL at n_in = 0).

    Scale shape: every count is a conditional SUM over prefix
    conjunctions of the pass predicates — ONE map-side-combined global
    aggregate over one scan of the verdict table; output rows explode
    from a literal struct array on the 1-row aggregate (the
    expectations_audit shape). 10⁹ docs → stages+1 rows, no collect.
    """
    norm = []
    for name, c in stages:
        col = F.col(c) if isinstance(c, str) else c
        norm.append((name, F.coalesce(col.cast("boolean"), F.lit(False))))

    aggs = [F.count(F.lit(1)).cast("bigint").alias("_total")]
    prefix = F.lit(True)
    for i, (name, p) in enumerate(norm):
        aggs.append(
            F.sum(prefix.cast("int")).cast("bigint").alias(f"_in_{i}")
        )
        aggs.append(
            F.sum((prefix & ~p).cast("int")).cast("bigint").alias(f"_dr_{i}")
        )
        aggs.append(F.sum((~p).cast("int")).cast("bigint").alias(f"_if_{i}"))
        prefix = prefix & p
    aggs.append(F.sum(prefix.cast("int")).cast("bigint").alias("_kept"))

    agg = flags.agg(*aggs)
    structs = [
        F.struct(
            F.lit(i).alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.col(f"_in_{i}").alias("n_in"),
            F.col(f"_dr_{i}").alias("n_dropped_here"),
            F.col(f"_if_{i}").alias("n_fail_independent"),
        )
        for i, (name, _) in enumerate(norm)
    ] + [
        F.struct(
            F.lit(len(norm)).alias("stage_idx"),
            F.lit("kept").alias("stage"),
            F.col("_kept").alias("n_in"),
            F.lit(0).cast("bigint").alias("n_dropped_here"),
            F.lit(0).cast("bigint").alias("n_fail_independent"),
        )
    ]
    out = agg.select(F.explode(F.array(*structs)).alias("_s")).select(
        F.col("_s.stage_idx").cast("int").alias("stage_idx"),
        "_s.stage",
        "_s.n_in",
        "_s.n_dropped_here",
        "_s.n_fail_independent",
    )
    return out.withColumn(
        "drop_rate",
        F.when(
            F.col("n_in") > 0,
            F.round(
                F.col("n_dropped_here").cast("double") / F.col("n_in"), nd
            )
            + F.lit(0.0),
        ),
    )


def span_corruption(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    corruption_rate: float = 0.15,
    span_len: int = 3,
    seed: str = "sc",
) -> DataFrame:
    """T5-style span-corruption pairs (Raffel et al. 2020 §3.1.4):
    replace token spans with sentinels to make (input, target)
    denoising examples — the objective-construction step between
    corpus prep and packing for encoder-decoder / UL2 pretraining.

    T5's sampler draws random span starts then rejects overlaps — a
    sequential process. This operator uses its DETERMINIZED cousin:
    positions partition into fixed frames of ``frame = round(span_len
    / corruption_rate)`` tokens, and each FULL frame corrupts exactly
    one ``span_len``-token span whose offset inside the frame is an
    md5 hash of (seed, doc, frame). Corruption rate and span length
    are then exact by construction, spans can never overlap, sentinel
    k is frame k (strictly increasing, as T5 requires), and every
    choice is a pure function of (seed, doc id, position) — the
    hash-sampling replayability argument, and what makes a bit-exact
    DuckDB oracle possible where the rejection sampler has none.

    Output per doc: ``(id, n_tok, n_spans, input_text, target_text)``
    — input has each span replaced by ``<extra_id_k>``, target is the
    T5 layout ``<extra_id_0> span0 <extra_id_1> span1 … <extra_id_n>``
    (trailing sentinel terminates the last span). Docs shorter than
    one frame corrupt nothing (input = text, target = just the
    terminal sentinel).

    Scale shape: map-only — pure per-position Column arithmetic (the
    span containing position i is CLOSED-FORM: its frame's hashed
    offset, so no span list is ever materialized and no per-token
    probe over a span array — the cut_duplicate_spans lesson), one
    md5 per token, linear in corpus tokens, fuses into the scan. No
    shuffle, no UDFs.
    """
    frame = int(round(span_len / corruption_rate))
    if frame <= span_len:
        raise ValueError("corruption_rate too high for span_len")
    mod = frame - span_len + 1
    toks = F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    toks = F.filter(toks, lambda x: x != "")

    def h_of(f):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.lit(seed),
                            F.col(id_col).cast("string"),
                            f.cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % mod
        )

    n = F.size("_toks")
    full_frames = (n / frame).cast("bigint")
    base = docs.select(
        F.col(id_col), toks.alias("_toks")
    ).select(
        id_col,
        "_toks",
        n.cast("bigint").alias("n_tok"),
        F.expr(f"size(_toks) div {frame}").cast("bigint").alias("_ff"),
    )

    def piece(i):
        f = (i / frame).cast("bigint")
        off = i - f * frame - h_of(f)
        return (
            F.when(
                (f < F.col("_ff")) & (off == 0),
                F.concat(F.lit("<extra_id_"), f.cast("string"), F.lit(">")),
            )
            .when(
                (f < F.col("_ff")) & (off > 0) & (off < span_len),
                F.lit(None).cast("string"),
            )
            .otherwise(F.element_at(F.col("_toks"), (i + 1).cast("int")))
        )

    input_text = F.array_join(
        F.filter(
            F.transform(
                F.when(F.col("n_tok") > 0, F.sequence(F.lit(0).cast("bigint"), F.col("n_tok") - 1))
                .otherwise(F.array().cast("array<bigint>")),
                piece,
            ),
            lambda x: x.isNotNull(),
        ),
        " ",
    )
    span_of = lambda f: F.array_join(  # noqa: E731
        F.slice(
            F.col("_toks"),
            (f * frame + h_of(f) + 1).cast("int"),
            span_len,
        ),
        " ",
    )
    spans_joined = F.array_join(
        F.transform(
            F.when(
                F.col("_ff") > 0,
                F.sequence(F.lit(0).cast("bigint"), F.col("_ff") - 1),
            ).otherwise(F.array().cast("array<bigint>")),
            lambda f: F.concat(
                F.lit("<extra_id_"),
                f.cast("string"),
                F.lit("> "),
                span_of(f),
            ),
        ),
        " ",
    )
    final_sentinel = F.concat(
        F.lit("<extra_id_"), F.col("_ff").cast("string"), F.lit(">")
    )
    target_text = F.when(
        F.col("_ff") > 0, F.concat_ws(" ", spans_joined, final_sentinel)
    ).otherwise(final_sentinel)
    return base.select(
        id_col,
        "n_tok",
        F.col("_ff").cast("int").alias("n_spans"),
        input_text.alias("input_text"),
        target_text.alias("target_text"),
    )


def fim_transform(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    fim_rate: float = 0.5,
    spm_rate: float = 0.5,
    seed: str = "fim",
) -> DataFrame:
    """Fill-in-the-middle transformation (Bavarian et al. 2022): with
    probability ``fim_rate`` a document is split into (prefix, middle,
    suffix) at two hashed token positions and re-laid-out with
    sentinels so a CAUSAL model learns infilling — ``span_corruption``'s
    sibling for decoder-only pretraining. Among transformed docs,
    ``spm_rate`` use SPM order (suffix before prefix; the paper trains
    a mix, PSM+SPM, for best infilling transfer).

    Every choice is a pure function of (seed, doc id): the transform
    gate, the two cut points (order-normalized), and the PSM/SPM coin
    each come from independent md5 buckets (`hash_bucket` starts 1, 9,
    17, 25 — the documented composable-hash convention), so the
    layout replays bit-for-bit on any engine/cluster and a grown
    corpus transforms a superset, never a reshuffle.

    Output: ``(id, n_tok, fim_applied, fim_order
    ('psm'|'spm'|NULL), fim_text)`` — untransformed docs pass through
    verbatim (``fim_text = text``'s token join). Layout:

    * PSM: ``<fim_pre> prefix <fim_mid> suffix <fim_suf> middle``
    * SPM: ``<fim_pre> <fim_mid> suffix <fim_suf> prefix middle``

    (the paper's token order with the middle always LAST, where the
    loss lives). Docs with < 3 tokens never transform (no nonempty
    3-way split exists). Map-only: slices + concat fused into the
    scan, zero shuffle, no UDFs.
    """
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda x: x != "",
    )
    base = docs.select(F.col(id_col), toks.alias("_toks")).select(
        id_col, "_toks", F.size("_toks").cast("bigint").alias("n_tok")
    )
    gate = hash_bucket(F.col(id_col), start=1, buckets=1000) < int(
        fim_rate * 1000
    )
    spm = hash_bucket(F.col(id_col), start=25, buckets=1000) < int(
        spm_rate * 1000
    )
    # two cut points in [1, n-1], order-normalized so all three parts
    # are non-empty ranges (middle may still be empty when c1 == c2 —
    # the paper allows empty middles; prefix/suffix never are)
    n = F.col("n_tok")
    r1 = hash_bucket(F.col(id_col), start=9, buckets=1_000_000)
    r2 = hash_bucket(F.col(id_col), start=17, buckets=1_000_000)
    c1r = (r1 % (n - 1)) + 1
    c2r = (r2 % (n - 1)) + 1
    c1 = F.least(c1r, c2r)
    c2 = F.greatest(c1r, c2r)
    prefix = F.array_join(F.slice(F.col("_toks"), 1, c1.cast("int")), " ")
    middle = F.array_join(
        F.slice(F.col("_toks"), (c1 + 1).cast("int"), (c2 - c1).cast("int")),
        " ",
    )
    suffix = F.array_join(
        F.slice(F.col("_toks"), (c2 + 1).cast("int"), (n - c2).cast("int")),
        " ",
    )
    psm = F.concat_ws(
        " ",
        F.lit("<fim_pre>"),
        prefix,
        F.lit("<fim_mid>"),
        suffix,
        F.lit("<fim_suf>"),
        middle,
    )
    spm_txt = F.concat_ws(
        " ",
        F.lit("<fim_pre>"),
        F.lit("<fim_mid>"),
        suffix,
        F.lit("<fim_suf>"),
        prefix,
        middle,
    )
    applied = gate & (n >= 3)
    return base.select(
        id_col,
        "n_tok",
        applied.alias("fim_applied"),
        F.when(applied & spm, F.lit("spm"))
        .when(applied, F.lit("psm"))
        .alias("fim_order"),
        F.when(applied & spm, spm_txt)
        .when(applied, psm)
        .otherwise(F.array_join(F.col("_toks"), " "))
        .alias("fim_text"),
    )
