"""Round-4 corpus-prep primitives: PII scrubbing, n-gram repetition,
benchmark decontamination, deterministic global shuffle, mixture
sampling. Semantics on crafted fixtures here; engine parity vs DuckDB
runs in test_oracle_parity (all five are driver queries)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from sparkfeat.corpus import decontaminate, global_shuffle, mixture_sample
from sparkfeat.text import ngram_repetition, scrub_pii


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------


def test_scrub_pii_each_kind(spark):
    d = _docs(
        spark,
        [
            (1, "mail me at jo.doe+x@sub.example.org today"),
            (2, "ssn is 123-45-6789 ok"),
            (3, "call 555-123-4567 or 555.123.4567"),
            (4, "server at 10.0.0.1 and 192.168.1.255"),
            (5, "clean document with no pii at all"),
        ],
    )
    out = {r["doc_id"]: r for r in scrub_pii(d).collect()}
    assert out[1]["n_email"] == 1 and "<EMAIL>" in out[1]["red_text"]
    assert "jo.doe" not in out[1]["red_text"]
    assert out[2]["n_ssn"] == 1 and "<SSN>" in out[2]["red_text"]
    assert out[3]["n_phone"] == 2 and out[3]["red_text"].count("<PHONE>") == 2
    assert out[4]["n_ip"] == 2 and out[4]["red_text"].count("<IP>") == 2
    assert out[5]["red_text"] == "clean document with no pii at all"
    assert all(out[5][f"n_{k}"] == 0 for k in ("email", "ssn", "phone", "ip"))


def test_scrub_pii_attribution_order(spark):
    """A dotted phone must become <PHONE>, not half an <IP>; an SSN must
    not be eaten by the phone pattern; counts sum to the number of
    placeholders (stepwise attribution)."""
    d = _docs(spark, [(1, "dial 555.123.4567 then ssn 123-45-6789 at 1.2.3.4")])
    r = scrub_pii(d).collect()[0]
    assert r["n_phone"] == 1 and r["n_ssn"] == 1 and r["n_ip"] == 1
    assert r["red_text"] == "dial <PHONE> then ssn <SSN> at <IP>"
    n_placeholders = sum(
        r["red_text"].count(t) for t in ("<EMAIL>", "<SSN>", "<PHONE>", "<IP>")
    )
    assert n_placeholders == r["n_email"] + r["n_ssn"] + r["n_phone"] + r["n_ip"]


# ---------------------------------------------------------------------------
# n-gram repetition
# ---------------------------------------------------------------------------


def test_ngram_repetition_counts(spark):
    # "a b c" appears 3x among the 7 trigrams of doc 1
    d = _docs(
        spark,
        [
            (1, "a b c a b c a b c"),  # 7 trigrams, 'a b c' x3, 'b c a' x2, 'c a b' x2
            (2, "all words here are distinct okay"),
            (3, "too short"),  # < 3 tokens -> zero grams
        ],
    )
    out = {r["doc_id"]: r for r in ngram_repetition(d, n=3).collect()}
    assert out[1]["n_grams"] == 7 and out[1]["max_ngram_rep"] == 3
    assert out[1]["n_dist_grams"] == 3
    assert out[1]["dup_ngram_frac"] == pytest.approx((7 - 3) / 7)
    assert out[2]["max_ngram_rep"] == 1 and out[2]["dup_ngram_frac"] == 0.0
    assert out[3]["n_grams"] == 0 and out[3]["dup_ngram_frac"] == 0.0


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------


def test_decontaminate_n8_planted(spark):
    """Real-world n=8: a corpus doc embedding a verbatim 8-gram from the
    benchmark is flagged; rephrased/partial overlap below 8 tokens is
    not."""
    bench = _docs(
        spark, [(100, "the quick brown fox jumps over the lazy dog tonight")]
    )
    corpus = _docs(
        spark,
        [
            # contains 'the quick brown fox jumps over the lazy' (8-gram)
            (1, "xx the quick brown fox jumps over the lazy yy"),
            # only a 7-token overlap
            (2, "xx quick brown fox jumps over the lazy yy"),
            (3, "completely unrelated text about something else entirely here now"),
        ],
    )
    out = {r["doc_id"]: r for r in decontaminate(corpus, bench, n=8).collect()}
    assert out[1]["contaminated"] and out[1]["n_hit"] >= 1
    assert not out[2]["contaminated"]
    assert not out[3]["contaminated"]
    assert out[3]["n_hit"] == 0 and out[3]["n_grams"] > 0


def test_decontaminate_is_broadcast_no_corpus_shuffle_on_gram(spark):
    """The benchmark grams broadcast; the corpus side must never
    sort-merge on the gram (that would shuffle the 100 TB side)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from sparkfeat.corpus import hash_bucket

    bb = hash_bucket("doc_id", start=9, buckets=1000)
    out = decontaminate(docs.filter(bb >= 20), docs.filter(bb < 20), n=3)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p
    assert "CartesianProduct" not in p, p


# ---------------------------------------------------------------------------
# global shuffle
# ---------------------------------------------------------------------------


def test_global_shuffle_deterministic_and_dense(spark):
    d = _docs(spark, [(i, "x") for i in range(500)])
    a = global_shuffle(d, shards=8, seed="s1").collect()
    b = global_shuffle(d, shards=8, seed="s1").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # replayable
    # positions are dense 0..k-1 within each shard
    by_shard = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss))), shard
    assert len(by_shard) == 8  # 500 docs spread over all 8 shards
    # a different seed produces a different order
    c = global_shuffle(d, shards=8, seed="s2").collect()
    key_a = {r["doc_id"]: (r["shard"], r["pos"]) for r in a}
    key_c = {r["doc_id"]: (r["shard"], r["pos"]) for r in c}
    assert key_a != key_c


def test_global_shuffle_no_global_sort(spark):
    """The only exchange is the hash partition for the per-shard window
    — never a rangepartitioning (global sort)."""
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = global_shuffle(d, shards=16)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in p.lower(), p


# ---------------------------------------------------------------------------
# mixture sampling
# ---------------------------------------------------------------------------


def test_mixture_sample_rates_and_proportions(spark):
    rows = (
        [(i, "en") for i in range(6000)]
        + [(i + 10000, "de") for i in range(3000)]
        + [(i + 20000, "rare") for i in range(50)]
        + [(i + 30000, "junk") for i in range(1000)]
    )
    d = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = mixture_sample(
        d, {"en": 0.5, "de": 0.4, "rare": 0.1}, frac=0.4, group_col="lang"
    )
    agg = {
        r["lang"]: r
        for r in out.groupBy("lang")
        .agg(
            F.first("rate").alias("rate"),
            F.sum(F.col("keep").cast("int")).alias("kept"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    total = 10050
    budget = 0.4 * total
    # en target: 0.5*budget = 2010 of 6000 -> rate .335
    assert agg["en"]["rate"] == pytest.approx(0.5 * budget / 6000)
    # rare group too small to fill 0.1*budget=402 -> capped at 1.0, kept whole
    assert agg["rare"]["rate"] == 1.0 and agg["rare"]["kept"] == 50
    # junk absent from targets -> excluded entirely
    assert agg["junk"]["kept"] == 0
    # kept counts land within hash-sampling noise of the target
    assert agg["en"]["kept"] == pytest.approx(2010, rel=0.1)
    assert agg["de"]["kept"] == pytest.approx(0.4 * budget, rel=0.1)


def test_mixture_sample_stable_under_corpus_growth(spark):
    """A doc's keep verdict depends only on its id and its group's rate
    — adding docs to ANOTHER group never flips it (the incremental-
    refresh property RNG sampling loses)."""
    base = [(i, "en") for i in range(1000)] + [(i + 5000, "de") for i in range(500)]
    grown = base + [(i + 9000, "fr") for i in range(400)]
    t = {"en": 0.6, "de": 0.4}
    a = {
        r["doc_id"]: r["keep"]
        for r in mixture_sample(
            spark.createDataFrame(base, "doc_id bigint, lang string"), t, frac=0.5
        ).collect()
    }
    # same targets, same absolute budget: frac scaled so frac*N is constant
    n0, n1 = len(base), len(grown)
    b = {
        r["doc_id"]: r["keep"]
        for r in mixture_sample(
            spark.createDataFrame(grown, "doc_id bigint, lang string"),
            t,
            frac=0.5 * n0 / n1,
        ).collect()
    }
    assert all(b[k] == v for k, v in a.items())


# ---------------------------------------------------------------------------
# cross-document duplicate spans
# ---------------------------------------------------------------------------


def test_duplicate_spans_planted_shared_sentence(spark):
    """Two docs share an 8-token sentence; n=4 grams. Hand-computed:
    the shared region contributes 5 duplicated gram starts per doc
    (positions of the 8-token run), covering 8 tokens, longest
    duplicated substring = 8 tokens."""
    from sparkfeat.corpus import duplicate_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    d = _docs(
        spark,
        [
            (1, f"u1 v1 {shared} w1"),
            (2, f"x2 {shared} y2 z2 q2"),
            (3, "totally unique words only here nothing repeats ever"),
        ],
    )
    out = {r["doc_id"]: r for r in duplicate_spans(d, n=4).collect()}
    # doc 1: 11 tokens -> 8 grams; shared block at positions 2..9 ->
    # duplicated gram starts 2..6 (5 grams), covered tokens 2..9 (8)
    assert out[1]["n_grams"] == 8
    assert out[1]["n_dup_grams"] == 5
    assert out[1]["covered_tokens"] == 8
    assert out[1]["max_dup_span"] == 8
    assert out[1]["dup_fraction"] == pytest.approx(5 / 8)
    assert out[1]["coverage_fraction"] == pytest.approx(8 / 11)
    # doc 2: 12 tokens -> 9 grams; shared block at 1..8 -> starts 1..5
    assert out[2]["n_dup_grams"] == 5
    assert out[2]["covered_tokens"] == 8
    assert out[2]["max_dup_span"] == 8
    # doc 3: clean
    assert out[3]["n_dup_grams"] == 0
    assert out[3]["covered_tokens"] == 0
    assert out[3]["max_dup_span"] == 0
    assert out[3]["coverage_fraction"] == 0.0


def test_duplicate_spans_within_doc_repeat_counts(spark):
    """Occurrence counting is corpus-wide INCLUDING same-doc repeats
    (Lee et al. semantics: any repeated substring is cuttable), and a
    doc shorter than n emits zeros, not nothing."""
    from sparkfeat.corpus import duplicate_spans

    d = _docs(
        spark,
        [
            (1, "a b c d x y z a b c d"),  # "a b c d" twice in ONE doc
            (2, "tiny doc"),
        ],
    )
    out = {r["doc_id"]: r for r in duplicate_spans(d, n=4).collect()}
    assert out[1]["n_dup_grams"] == 2  # gram "a b c d" at pos 0 and 7
    assert out[1]["covered_tokens"] == 8
    assert out[1]["max_dup_span"] == 4  # runs are length-1 each
    assert out[2]["n_grams"] == 0 and out[2]["n_dup_grams"] == 0


def test_duplicate_spans_disjoint_runs_merge_coverage(spark):
    """Overlapping duplicated grams union their spans (no double
    counting) and consecutive gram starts extend max_dup_span."""
    from sparkfeat.corpus import duplicate_spans

    d = _docs(
        spark,
        [
            (1, "p q r s t m1 m2"),
            (2, "p q r s t n1 n2"),  # 5-token shared prefix, n=3
        ],
    )
    out = {r["doc_id"]: r for r in duplicate_spans(d, n=3).collect()}
    # shared run: gram starts 0,1,2 (consecutive) -> covered 0..4 = 5
    for i in (1, 2):
        assert out[i]["n_dup_grams"] == 3
        assert out[i]["covered_tokens"] == 5
        assert out[i]["max_dup_span"] == 5


def test_cut_duplicate_spans_keeps_first_occurrence(spark):
    """The lexicographically-first (doc_id, pos) occurrence survives;
    every other occurrence's span is cut; untouched docs come back
    lowercased/space-normalized but token-identical."""
    from sparkfeat.corpus import cut_duplicate_spans

    shared = "alpha beta gamma delta"
    d = _docs(
        spark,
        [
            (1, f"u1 {shared} v1"),
            (2, f"{shared} w2 x2"),
            (3, "nothing here repeats at all"),
        ],
    )
    out = {r["doc_id"]: r for r in cut_duplicate_spans(d, n=4).collect()}
    # doc 1 owns the first occurrence (doc_id 1 < 2): kept intact
    assert out[1]["text"] == f"u1 {shared} v1"
    assert out[1]["n_cut_tokens"] == 0
    # doc 2 loses the shared block
    assert out[2]["text"] == "w2 x2"
    assert out[2]["n_cut_tokens"] == 4
    assert out[2]["kept_fraction"] == pytest.approx(2 / 6)
    assert out[3]["text"] == "nothing here repeats at all"
    assert out[3]["n_cut_tokens"] == 0


def test_cut_duplicate_spans_within_doc_and_overlap_union(spark):
    """Same-doc repeats cut all but the first; overlapping duplicated
    grams union before cutting (no token cut twice, counts exact)."""
    from sparkfeat.corpus import cut_duplicate_spans

    d = _docs(
        spark,
        [
            (1, "a b c a b c tail"),  # "a b c" twice within one doc, n=3
            (2, "p q r s p q r s"),  # "p q r s" grams overlap: starts 0..1 vs 4..5
        ],
    )
    out = {r["doc_id"]: r for r in cut_duplicate_spans(d, n=3).collect()}
    # doc 1: gram "a b c" at 0 and 3; first kept, cut span [3,6) -> "a b c tail"
    assert out[1]["text"] == "a b c tail"
    assert out[1]["n_cut_tokens"] == 3
    # doc 2: grams "p q r"(0,4) "q r s"(1,5); firsts at 0,1 kept;
    # cut starts {4,5} union span = positions 4..7 -> "p q r s"
    assert out[2]["text"] == "p q r s"
    assert out[2]["n_cut_tokens"] == 4


def test_duplicate_spans_heavy_tailed_doc_bounded_time(spark):
    """The heavy-tailed-document hazard pin: a ~200k-token doc that is
    duplicated WHOLESALE (a second doc with identical text, plus heavy
    internal repetition) must clear both span operators in bounded
    time. The old shape failed twice here: duplicate_spans collected
    every duplicated position into ONE agg-buffer array (10^5+ ints, no
    spill), and cut_duplicate_spans probed array_contains(cut_pos, i)
    PER TOKEN — O(tokens x cuts) ~ 4e10 comparisons on this input. The
    window/islands rewrite is O(rows log rows) disk-spillable and the
    rebuild is O(tokens + cuts); semantics are pinned exactly against
    closed-form expectations (every gram duplicated, one merged span)."""
    import time

    from sparkfeat.corpus import cut_duplicate_spans, duplicate_spans

    n_tok = 200_000
    phrase = [f"w{i}" for i in range(50)]  # 50-token phrase repeated 4000x
    doc = " ".join(phrase * (n_tok // len(phrase)))
    d = _docs(spark, [(1, doc), (2, doc), (3, "no repeats in this one zz")])

    t0 = time.monotonic()
    spans = {r["doc_id"]: r for r in duplicate_spans(d, n=8).collect()}
    cut = {r["doc_id"]: r for r in cut_duplicate_spans(d, n=8).collect()}
    elapsed = time.monotonic() - t0
    assert elapsed < 120, f"span ops on 200k-token dup doc took {elapsed:.0f}s"

    m = n_tok - 7  # grams per big doc
    for i in (1, 2):
        assert spans[i]["n_grams"] == m
        assert spans[i]["n_dup_grams"] == m  # every gram occurs >= 4 times
        assert spans[i]["covered_tokens"] == n_tok  # one merged span = whole doc
        assert spans[i]["max_dup_span"] == n_tok
    assert spans[3]["n_dup_grams"] == 0

    # doc 1 owns every first occurrence (lexicographic min doc_id):
    # kept whole; doc 2 is cut to nothing but its never-first tail? No -
    # every gram of doc 2 has its first occurrence in doc 1, so doc 2 is
    # cut ENTIRELY; doc 1 also self-repeats, so its second..4000th
    # phrase repetitions are cut too (first occurrence of each gram is
    # its first position in doc 1).
    assert cut[1]["n_cut_tokens"] + len(cut[1]["text"].split()) == n_tok
    assert cut[1]["n_cut_tokens"] > 0  # internal repeats cut
    assert cut[2]["text"] == "" and cut[2]["n_cut_tokens"] == n_tok
    assert cut[3]["text"] == "no repeats in this one zz"


def test_mixture_sample_is_lazy(spark):
    """Building the mixture_sample plan must fire NO Spark job: the
    corpus total is derived in-plan from the group-counts aggregate
    (round-4 finding: an eager docs.count() in the builder broke
    laziness and forced a scan at plan-build time on any source)."""
    d = spark.createDataFrame(
        [(i, "en" if i % 2 else "de") for i in range(100)],
        "doc_id bigint, lang string",
    )
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None))
    out = mixture_sample(d, {"en": 0.7, "de": 0.3}, frac=0.5)
    after = set(tracker.getJobIdsForGroup(None))
    assert after == before, "plan build fired a Spark job"
    # and the plan still evaluates correctly once acted on
    kept = out.filter("keep").count()
    assert 0 < kept < 100


# ---------------------------------------------------------------------------
# RAG chunking
# ---------------------------------------------------------------------------


def test_chunk_documents_spans(spark):
    from sparkfeat.corpus import chunk_documents

    docs = spark.createDataFrame(
        [
            (0, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),  # 10 tokens
            (1, "a b c"),  # shorter than one chunk
            (2, ""),  # no tokens -> no chunks
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_tokens=4, overlap=2)
    rows = sorted(
        ((r.doc_id, r.chunk_id, r.start_tok, r.end_tok, r.chunk_text) for r in out.collect())
    )
    # step=2, nc = 1 + ceil((10-4)/2) = 4: the last start (6) already
    # reaches the end of the doc, so no degenerate tail chunk is emitted
    assert [t for t in rows if t[0] == 0] == [
        (0, 0, 0, 4, "t0 t1 t2 t3"),
        (0, 1, 2, 6, "t2 t3 t4 t5"),
        (0, 2, 4, 8, "t4 t5 t6 t7"),
        (0, 3, 6, 10, "t6 t7 t8 t9"),
    ]
    assert [t for t in rows if t[0] == 1] == [(1, 0, 0, 3, "a b c")]
    assert not [t for t in rows if t[0] == 2]


def test_chunk_documents_covers_every_token(spark):
    """Union of chunk spans == [0, n_tokens) for every doc; consecutive
    chunks overlap by exactly `overlap` except the (possibly short) tail."""
    from sparkfeat.corpus import chunk_documents
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    chunks = chunk_documents(docs, chunk_tokens=32, overlap=8)
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(
            F.min("start_tok").alias("lo"),
            F.max("end_tok").alias("hi"),
            F.count(F.lit(1)).alias("nc"),
        )
        .collect()
    )
    n_tok = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id",
            F.size(
                F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
            ).alias("n"),
        ).collect()
    }
    assert len(per_doc) > 0
    for r in per_doc:
        assert r.lo == 0 and r.hi == n_tok[r.doc_id]


def test_chunk_documents_is_map_only(spark):
    from sparkfeat.corpus import chunk_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # fuses into the scan: zero shuffles


def test_eval_sample_exact_k_and_shard_invariance(spark, sf_dir):
    """Exactly k per group; the two-phase plan equals the definitional
    single window under ANY shard count and ANY physical partitioning."""
    from sparkfeat.corpus import eval_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = eval_sample(docs, k=10, shards=1).toPandas()
    b = eval_sample(docs, k=10, shards=7).toPandas()
    c = eval_sample(docs.repartition(13), k=10, shards=32).toPandas()
    key = ["lang", "sample_rank"]
    a, b, c = (x.sort_values(key).reset_index(drop=True) for x in (a, b, c))
    assert list(a["doc_id"]) == list(b["doc_id"]) == list(c["doc_id"])
    counts = a.groupby("lang")["doc_id"].count()
    n_lang = docs.select("lang").distinct().count()
    assert len(counts) == n_lang and (counts == 10).all()
    # ranks are dense 1..k within each group
    assert (
        a.groupby("lang")["sample_rank"].apply(lambda s: sorted(s) == list(range(1, 11))).all()
    )


# ---------------------------------------------------------------------------
# curriculum ordering
# ---------------------------------------------------------------------------


def _staged_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, ppl_bucket int")


def test_curriculum_order_stages_contiguous_and_dense(spark):
    """global_pos is a dense permutation of 0..N-1 in which EVERY
    stage-s doc precedes every stage-(s+1) doc; within a (stage, shard)
    the pos ranks are dense; null-stage docs are excluded."""
    from sparkfeat.corpus import curriculum_order

    rows = [(i, i % 3) for i in range(600)] + [(9999, None)]
    out = curriculum_order(
        _staged_docs(spark, rows), shards=8, seed="s1"
    ).collect()
    assert len(out) == 600  # null stage dropped
    gp = sorted(r["global_pos"] for r in out)
    assert gp == list(range(600))  # dense permutation, no gaps
    # stage blocks are contiguous: max global_pos of stage s < min of s+1
    by_stage = {}
    for r in out:
        by_stage.setdefault(r["stage"], []).append(r["global_pos"])
    for s in (0, 1):
        assert max(by_stage[s]) < min(by_stage[s + 1])
    # per-(stage, shard) pos dense and consistent with global_pos order
    by_grp = {}
    for r in out:
        by_grp.setdefault((r["stage"], r["shard"]), []).append(
            (r["pos"], r["global_pos"])
        )
    for grp, pairs in by_grp.items():
        pairs.sort()
        assert [p for p, _ in pairs] == list(range(len(pairs))), grp
        gps = [g for _, g in pairs]
        assert gps == sorted(gps), grp  # pos order == global order in-group


def test_curriculum_order_deterministic_and_seeded(spark):
    from sparkfeat.corpus import curriculum_order

    d = _staged_docs(spark, [(i, i % 2) for i in range(400)])
    a = curriculum_order(d, shards=8, seed="s1").collect()
    b = curriculum_order(d, shards=8, seed="s1").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    c = curriculum_order(d, shards=8, seed="s2").collect()
    key_a = {r["doc_id"]: r["global_pos"] for r in a}
    key_c = {r["doc_id"]: r["global_pos"] for r in c}
    assert key_a != key_c  # reshuffles within stages...
    stage_a = {r["doc_id"]: r["stage"] for r in a}
    stage_c = {r["doc_id"]: r["stage"] for r in c}
    assert stage_a == stage_c  # ...but never across stages


def test_curriculum_order_offsets_broadcast_no_global_sort(spark):
    """The offsets table joins back as a BROADCAST hash join and the
    corpus never range-partitions: the only corpus-sized exchange is
    the (stage, shard) hash partition for the in-group window."""
    from sparkfeat.corpus import curriculum_order

    d = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).withColumn("ppl_bucket", (F.col("doc_id") % 3).cast("int"))
    out = curriculum_order(d, shards=16)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p, p
    assert "rangepartitioning" not in p.lower(), p


# ---------------------------------------------------------------------------
# cross-document line dedup (boilerplate removal)
# ---------------------------------------------------------------------------

BOILER = "SUBSCRIBE TO OUR NEWSLETTER TODAY"


def test_dedup_lines_removes_hot_keeps_unique(spark):
    """A line occurring >= min_occurrences times is cut from EVERY doc
    (all occurrences, no first-keeper); unique lines survive in their
    original order; trimmed-whitespace variants share one key."""
    from sparkfeat.corpus import dedup_lines

    rows = [(i, f"unique opener {i}\n{BOILER}\nunique closer {i}") for i in range(4)]
    rows.append((100, f"  {BOILER}  \nonly other line here"))  # padded variant
    rows.append((200, "totally unique document line"))
    out = {
        r["doc_id"]: r
        for r in dedup_lines(_docs(spark, rows), min_occurrences=5).collect()
    }
    for i in range(4):
        assert out[i]["text"] == f"unique opener {i}\nunique closer {i}"
        assert out[i]["n_lines"] == 3 and out[i]["n_removed"] == 1
    assert out[100]["text"] == "only other line here"  # padded copy also cut
    assert out[200]["text"] == "totally unique document line"
    assert out[200]["n_removed"] == 0 and out[200]["removed_frac"] == 0.0


def test_dedup_lines_below_threshold_and_short_lines_kept(spark):
    """4 occurrences < min_occurrences=5 -> kept; a short frequent line
    (under min_chars after trim) is never counted or cut."""
    from sparkfeat.corpus import dedup_lines

    rows = [(i, f"{BOILER}\nok\nbody {i}") for i in range(4)]
    rows += [(10 + i, f"ok\nmore body text {10 + i}") for i in range(8)]
    out = {
        r["doc_id"]: r
        for r in dedup_lines(
            _docs(spark, rows), min_occurrences=5, min_chars=10
        ).collect()
    }
    for i in range(4):  # boiler only 4x -> kept whole
        assert out[i]["text"] == f"{BOILER}\nok\nbody {i}"
    for i in range(8):  # "ok" occurs 12x but is ineligible
        assert out[10 + i]["text"] == f"ok\nmore body text {10 + i}"
        assert out[10 + i]["n_removed"] == 0


def test_dedup_lines_row_preserving_empty_and_null(spark):
    """A doc that is ALL boilerplate comes back as '' (still a row);
    NULL text stays NULL with zero counts."""
    from sparkfeat.corpus import dedup_lines

    rows = [(i, BOILER) for i in range(6)] + [(50, None)]
    out = {
        r["doc_id"]: r
        for r in dedup_lines(_docs(spark, rows), min_occurrences=5).collect()
    }
    assert len(out) == 7
    for i in range(6):
        assert out[i]["text"] == "" and out[i]["removed_frac"] == 1.0
        assert out[i]["n_lines"] == 1 and out[i]["n_removed"] == 1
    assert out[50]["text"] is None
    assert out[50]["n_lines"] == 0 and out[50]["n_removed"] == 0
    assert out[50]["removed_frac"] is None


def test_dedup_lines_plan_broadcast_no_cartesian(spark):
    """The hot set joins back as a BROADCAST hash join; nothing in the
    plan is a cartesian product or a global sort of the corpus."""
    from sparkfeat.corpus import dedup_lines

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = (
        dedup_lines(d, min_occurrences=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p, p
    assert "rangepartitioning" not in p.lower(), p


# ---------------------------------------------------------------------------
# data-constrained epoch plan / expansion
# ---------------------------------------------------------------------------


def _src_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, source string, n_tok bigint")


def test_epoch_plan_paths(spark):
    """One fixture hits every branch: capped at max_epochs, full+frac,
    frac-only, whitelist exclusion, zero-token exclusion. Groups of 10
    docs x 100 tokens = 1000 tokens each."""
    from sparkfeat.corpus import epoch_plan

    rows = [(g * 100 + i, f"s{g}", 100) for g in range(4) for i in range(10)]
    rows.append((999, "s3", 0))  # does not change s3's 1000-token sum
    rows = [(d, s, t if d != 999 else 0) for d, s, t in rows]
    rows.append((1000, "zero", 0))  # zero-token group -> excluded
    d = _src_docs(spark, rows)
    # budget 6000: s0 wants 3000 (3 epochs > cap 2) -> capped; s1 wants
    # 1500 = 1 full + .5; s2 wants 900 = 0 full + .9; s3 wants 600 = .6;
    # 'zero' and unlisted groups excluded.
    w = {"s0": 0.5, "s1": 0.25, "s2": 0.15, "s3": 0.10, "zero": 0.0}
    plan = {
        r["source"]: r
        for r in epoch_plan(d, w, 6000, max_epochs=2.0).collect()
    }
    assert set(plan) == {"s0", "s1", "s2", "s3"}
    assert plan["s0"]["n_epochs_full"] == 2 and plan["s0"]["frac_ppm"] == 0
    assert plan["s0"]["capped"] is True
    assert plan["s1"]["n_epochs_full"] == 1 and plan["s1"]["frac_ppm"] == 500_000
    assert plan["s2"]["n_epochs_full"] == 0 and plan["s2"]["frac_ppm"] == 900_000
    assert plan["s3"]["n_epochs_full"] == 0 and plan["s3"]["frac_ppm"] == 600_000
    assert not plan["s1"]["capped"] and not plan["s3"]["capped"]
    assert plan["s1"]["want_tokens"] == 1500.0


def test_epoch_expand_counts_and_determinism(spark):
    """Every doc appears in every full epoch; the fractional pass keeps
    a deterministic md5 subset at ~frac_ppm; reruns are identical."""
    from sparkfeat.corpus import epoch_expand

    rows = [(i, "a", 10) for i in range(400)]
    # tokens 4000, want 10000 -> 2 full + .5 frac
    out = epoch_expand(_src_docs(spark, rows), {"a": 1.0}, 10_000).collect()
    again = epoch_expand(_src_docs(spark, rows), {"a": 1.0}, 10_000).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    by_epoch = {}
    for r in out:
        by_epoch.setdefault(r["epoch"], []).append(r)
    assert len(by_epoch[0]) == 400 and len(by_epoch[1]) == 400
    assert all(not r["is_frac"] for r in by_epoch[0] + by_epoch[1])
    assert all(r["is_frac"] for r in by_epoch[2])
    # md5 buckets are uniform: 50% +- a generous band at n=400
    assert 140 <= len(by_epoch[2]) <= 260
    # the fractional subset is id-deterministic: a superset rate keeps
    # every doc the lower rate kept (thresholds nest)
    out75 = epoch_expand(_src_docs(spark, rows), {"a": 1.0}, 11_000).collect()
    kept50 = {r["doc_id"] for r in out if r["is_frac"]}
    kept75 = {r["doc_id"] for r in out75 if r["is_frac"]}
    assert kept50 <= kept75


def test_epoch_expand_plan_broadcast_map_only(spark):
    """The plan broadcasts onto the corpus scan and expansion is
    map-only: no SortMergeJoin, no cartesian, no corpus exchange on the
    probe side beyond the tiny plan aggregate."""
    from sparkfeat.corpus import epoch_expand

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = epoch_expand(
        d, {"src0": 0.6, "src1": 0.4}, 20_000,
        token_col="n_chars", group_col="source",
    )
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p
    assert "CartesianProduct" not in p, p


# ---------------------------------------------------------------------------
# length_batches (length-bucketed dynamic batching)
# ---------------------------------------------------------------------------


def _lb_docs(spark):
    # token counts 1..40 plus an over-cap doc and degenerate rows
    rows = [(i, " ".join(f"w{j}" for j in range(i))) for i in range(1, 41)]
    rows += [(100, " ".join("x" for _ in range(500)))]  # truncated at cap
    rows += [(101, ""), (102, None)]  # excluded: zero tokens / null
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_length_batches_bucket_and_pad_math(spark):
    from sparkfeat.corpus import length_batches

    out = length_batches(
        _lb_docs(spark), bucket_width=8, max_batch_tokens=32, cap_tokens=64
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert 101 not in rows and 102 not in rows
    for i in range(1, 41):
        r = rows[i]
        assert r["bucket"] == (i - 1) // 8
        assert r["pad_len"] == (r["bucket"] + 1) * 8
        assert r["pad_len"] >= min(i, 64) > r["pad_len"] - 8
        assert r["batch_size"] == max(32 // r["pad_len"], 1)
        assert r["pad_waste"] == r["pad_len"] - min(i, 64)
        assert r["n_trunc_tokens"] == 0
    big = rows[100]
    assert big["n_tok"] == 500 and big["n_trunc_tokens"] == 500 - 64
    assert big["bucket"] == (64 - 1) // 8 and big["pad_len"] == 64


def test_length_batches_dense_batches_and_budget(spark):
    from sparkfeat.corpus import length_batches

    out = length_batches(
        _lb_docs(spark), bucket_width=8, max_batch_tokens=32, cap_tokens=64
    ).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r)
    for bucket, rs in by_bucket.items():
        bs = rs[0]["batch_size"]
        assert all(r["batch_size"] == bs for r in rs)
        # batch budget: a full batch's padded tokens fit the budget
        # (or the batch is a single over-budget example, bs == 1)
        assert bs * rs[0]["pad_len"] <= 32 or bs == 1
        batches = {}
        for r in rs:
            batches.setdefault(r["batch_id"], []).append(r["pos_in_batch"])
        last = max(batches)
        for bid, poss in batches.items():
            assert sorted(poss) == list(range(len(poss)))  # dense positions
            if bid < last:
                assert len(poss) == bs  # every non-final batch is full
        # batch ids are contiguous from 0
        assert sorted(batches) == list(range(last + 1))


def test_length_batches_seed_replay_and_reshuffle(spark):
    from sparkfeat.corpus import length_batches

    d = _lb_docs(spark)
    a = {
        r["doc_id"]: (r["batch_id"], r["pos_in_batch"])
        for r in length_batches(d, seed="7").collect()
    }
    b = {
        r["doc_id"]: (r["batch_id"], r["pos_in_batch"])
        for r in length_batches(d, seed="7").collect()
    }
    c = {
        r["doc_id"]: (r["batch_id"], r["pos_in_batch"])
        for r in length_batches(d, seed="8").collect()
    }
    assert a == b  # same seed replays byte-identically
    assert a != c  # reseeding reshuffles


def test_length_batches_two_phase_equals_direct_window(spark):
    from pyspark.sql import Window

    from sparkfeat.corpus import length_batches

    d = _lb_docs(spark)
    got = length_batches(d, shards=4)
    # direct replica: one window per bucket over (shard, key, id)
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")
    key = F.md5(F.concat_ws(":", F.lit("0"), F.col("doc_id").cast("string")))
    base = (
        d.select(
            "doc_id",
            F.size(toks).alias("n_tok"),
            key.alias("_key"),
            (F.conv(F.substring(key, 1, 8), 16, 10).cast("bigint") % 4)
            .cast("int")
            .alias("_shard"),
        )
        .filter(F.col("n_tok") > 0)
        .withColumn("_cap", F.least(F.col("n_tok"), F.lit(512)))
        .withColumn("bucket", F.floor((F.col("_cap") - 1) / 16).cast("int"))
    )
    w = Window.partitionBy("bucket").orderBy("_shard", "_key", "doc_id")
    ref = {
        (r["doc_id"]): (r["bucket"], r["rnk"])
        for r in base.withColumn(
            "rnk", F.row_number().over(w) - 1
        ).collect()
    }
    for r in got.collect():
        bucket, rnk = ref[r["doc_id"]]
        assert r["bucket"] == bucket
        assert r["batch_id"] * r["batch_size"] + r["pos_in_batch"] == rnk


# ------------------------------------------------------- memorization


def test_memorization_score_planted_overlap(spark):
    from sparkfeat.corpus import memorization_score

    ref = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    cands = spark.createDataFrame(
        [
            # verbatim copy: every 3-gram memorized
            (1, "alpha beta gamma delta epsilon zeta"),
            # half-copied: prefix from ref, novel suffix
            (2, "alpha beta gamma nova one two three"),
            # fully novel
            (3, "red green blue cyan magenta yellow"),
            # repeats one memorized trigram 3x: position-weighted counts
            # all 3 occurrences, distinct counts it once
            (4, "alpha beta gamma alpha beta gamma alpha beta gamma"),
            # shorter than n
            (5, "too short"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in memorization_score(cands, ref, n=3).collect()
    }
    assert got[1]["mem_rate"] == 1.0 and got[1]["distinct_mem_rate"] == 1.0
    # doc 2: grams = 5 positions, only 'alpha beta gamma' is in ref
    assert got[2]["n_grams"] == 5 and got[2]["n_hit"] == 1
    assert got[2]["mem_rate"] == 0.2
    assert got[3]["n_hit"] == 0 and got[3]["mem_rate"] == 0.0
    # doc 4: 7 gram positions cycling 3 distinct trigrams; only
    # 'alpha beta gamma' (3 of the 7 positions) is in ref -> position
    # rate 3/7, distinct rate 1/3
    assert got[4]["n_grams"] == 7 and got[4]["n_hit"] == 3
    assert got[4]["n_distinct"] == 3 and got[4]["n_distinct_hit"] == 1
    assert got[4]["mem_rate"] == pytest.approx(round(3 / 7, 6))
    assert got[4]["distinct_mem_rate"] == pytest.approx(round(1 / 3, 6))
    # doc 5: below n -> zeros with NULL rates (self-describing row)
    assert got[5]["n_grams"] == 0 and got[5]["mem_rate"] is None


def test_memorization_reference_never_broadcasts_whole_docs(spark):
    """Plan shape: the reference side must collapse to DISTINCT gram
    hashes before the join, and the join must be gram-keyed (no
    cartesian, no broadcast of the raw reference)."""
    from sparkfeat.corpus import memorization_score

    ref = spark.range(200).selectExpr(
        "id AS doc_id", "concat('tok', id, ' tok', id+1, ' tok', id+2, ' tok', id+3) AS text"
    )
    cand = spark.range(50).selectExpr(
        "id + 1000 AS doc_id", "concat('tok', id, ' tok', id+1, ' tok', id+2) AS text"
    )
    df = memorization_score(cand, ref, n=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    # every candidate trigram is the prefix trigram of one ref doc
    rows = {r["doc_id"]: r for r in df.collect()}
    assert all(rows[i + 1000]["n_hit"] == 1 for i in range(50))


# ---------------------------------------------------- filter waterfall


def test_filter_waterfall_first_fail_attribution(spark):
    """Hand-built verdicts: waterfall charges each doc to its FIRST
    failing stage; independent counts see overlaps; invariants
    n_in[k+1] = n_in[k] - dropped[k] and kept = final survivors."""
    from sparkfeat.corpus import filter_waterfall

    rows = [
        # (id, a, b, c): doc passes stage iff flag
        (1, True, True, True),    # survives all
        (2, False, True, True),   # dies at a
        (3, False, False, True),  # dies at a; would also die at b
        (4, True, False, False),  # dies at b; would also die at c
        (5, True, True, False),   # dies at c
        (6, True, None, True),    # NULL = fail -> dies at b
    ]
    df = spark.createDataFrame(rows, "id long, a boolean, b boolean, c boolean")
    got = {
        r["stage"]: r.asDict()
        for r in filter_waterfall(
            df, [("a", "a"), ("b", "b"), ("c", "c")]
        ).collect()
    }
    assert got["a"]["n_in"] == 6 and got["a"]["n_dropped_here"] == 2
    assert got["a"]["n_fail_independent"] == 2
    assert got["b"]["n_in"] == 4 and got["b"]["n_dropped_here"] == 2
    assert got["b"]["n_fail_independent"] == 3  # docs 3, 4, 6
    assert got["c"]["n_in"] == 2 and got["c"]["n_dropped_here"] == 1
    assert got["c"]["n_fail_independent"] == 2  # docs 4, 5
    assert got["kept"]["n_in"] == 1
    # chain invariant
    assert got["b"]["n_in"] == got["a"]["n_in"] - got["a"]["n_dropped_here"]
    assert got["c"]["n_in"] == got["b"]["n_in"] - got["b"]["n_dropped_here"]
    assert got["kept"]["n_in"] == got["c"]["n_in"] - got["c"]["n_dropped_here"]
    assert got["a"]["drop_rate"] == pytest.approx(round(2 / 6, 6))


def test_filter_waterfall_matches_prep_keep_count(spark):
    """On the real pipeline flags, the waterfall's kept row must equal
    the pipeline's own keep count (same conjunction, different
    algebra)."""
    from sparkfeat.corpus import corpus_prep_flags, filter_waterfall

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    flags = corpus_prep_flags(docs)
    wf = {
        r["stage"]: r.asDict()
        for r in filter_waterfall(
            flags,
            [
                ("quality", "quality_pass"),
                ("langid", "lang_ok"),
                ("exact_dedup", "exact_keep"),
                ("neardup", ~F.col("neardup_drop")),
            ],
        ).collect()
    }
    keep_n = flags.where("keep").count()
    assert wf["kept"]["n_in"] == keep_n
    assert wf["quality"]["n_in"] == flags.count()


# ----------------------------------------------------- span corruption


def test_span_corruption_exact_rate_and_t5_layout(spark):
    """45 tokens, frame 20, span 3: exactly 2 spans, 6 tokens masked
    (15% of the 40 full-frame tokens), T5 sentinel layout, and the
    round-trip invariant: substituting the target's spans back into
    the input's sentinels reproduces the original text."""
    from sparkfeat.corpus import span_corruption

    text = " ".join(f"t{i}" for i in range(45))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = span_corruption(df, corruption_rate=0.15, span_len=3).collect()[0]
    assert r["n_spans"] == 2
    inp, tgt = r["input_text"], r["target_text"]
    assert "<extra_id_0>" in inp and "<extra_id_1>" in inp
    assert tgt.endswith("<extra_id_2>")
    # round trip: replace sentinel k in input with target span k
    import re

    spans = dict(
        re.findall(r"<extra_id_(\d+)> ((?:\S+ ?){0,3}?)(?= <extra_id_|\Z)", tgt)
    )
    rebuilt = inp
    for k, s in spans.items():
        rebuilt = rebuilt.replace(f"<extra_id_{k}>", s.strip())
    assert rebuilt == text
    # masked token count = n_spans * span_len
    assert len(inp.split()) == 45 - 2 * 3 + 2  # minus spans plus sentinels


def test_span_corruption_short_and_null_docs(spark):
    from sparkfeat.corpus import span_corruption

    df = spark.createDataFrame(
        [(1, "a b c"), (2, None)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in span_corruption(df).collect()}
    assert got[1]["n_spans"] == 0 and got[1]["input_text"] == "a b c"
    assert got[1]["target_text"] == "<extra_id_0>"
    assert got[2]["n_tok"] == 0 and got[2]["input_text"] == ""


def test_span_corruption_deterministic_and_seed_sensitive(spark):
    from sparkfeat.corpus import span_corruption

    text = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame([(7, text)], "doc_id long, text string")
    a = span_corruption(df, seed="s1").collect()[0]
    b = span_corruption(df, seed="s1").collect()[0]
    c = span_corruption(df, seed="s2").collect()[0]
    assert a["input_text"] == b["input_text"]
    assert a["input_text"] != c["input_text"]  # different spans chosen
    assert a["n_spans"] == c["n_spans"] == 5  # rate is seed-independent


def test_span_corruption_map_only_plan(spark):
    from sparkfeat.corpus import span_corruption

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        span_corruption(d)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ----------------------------------------------------------------- FIM


def test_fim_transform_round_trip_and_layout(spark):
    """Transformed docs reassemble to the original: PSM parts are
    (pre, suf, mid) around the sentinels and pre+mid+suf in order is
    the source text; untransformed docs pass through verbatim; rate
    and PSM/SPM mix land near their targets on 400 docs."""
    import re

    from sparkfeat.corpus import fim_transform

    docs = [(i, " ".join(f"w{i}_{j}" for j in range(12))) for i in range(400)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = fim_transform(df, fim_rate=0.5, spm_rate=0.5).collect()
    orig = dict(docs)
    n_applied = n_spm = 0
    for r in rows:
        if not r["fim_applied"]:
            assert r["fim_text"] == orig[r["doc_id"]]
            continue
        n_applied += 1
        m = re.match(
            r"<fim_pre> (.*?) ?<fim_mid> (.*?) ?<fim_suf> ?(.*)",
            r["fim_text"],
        )
        assert m, r["fim_text"]
        if r["fim_order"] == "psm":
            pre, suf, mid = m.groups()
        else:
            n_spm += 1
            # SPM: <fim_pre> <fim_mid> suffix <fim_suf> prefix middle
            assert m.group(1) == ""
            suf = m.group(2)
            tail = m.group(3)
            # prefix and middle both live in the tail; just check
            # token multiset reassembly below
            pre, mid = tail, ""
        tokens = sorted((pre + " " + mid + " " + suf).split())
        assert tokens == sorted(orig[r["doc_id"]].split()), r["doc_id"]
        if r["fim_order"] == "psm":
            assert pre + " " + mid + " " + suf == orig[r["doc_id"]] or (
                mid == "" and pre + " " + suf == orig[r["doc_id"]]
            )
    assert 120 <= n_applied <= 280  # ~50% gate
    assert 0.2 <= n_spm / n_applied <= 0.8  # ~50% SPM among applied


def test_fim_short_docs_never_transform(spark):
    from sparkfeat.corpus import fim_transform

    df = spark.createDataFrame(
        [(1, "a b"), (2, "a"), (3, None)], "doc_id long, text string"
    )
    rows = fim_transform(df, fim_rate=1.0).collect()
    assert all(not r["fim_applied"] for r in rows)
    assert all(r["fim_order"] is None for r in rows)


def test_fim_map_only_plan(spark):
    from sparkfeat.corpus import fim_transform

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = fim_transform(d)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
