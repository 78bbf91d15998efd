"""Text stats, fingerprints, dedup family (exact / Jaccard / MinHash /
SimHash) against python oracles and crafted near-duplicates."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparkfeat import text as X
from sparkfeat.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash_pairs,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


def test_token_stats_oracle(docs):
    got = (
        docs.select(
            "doc_id",
            X.token_count("text").alias("n_tok"),
            X.distinct_token_count("text").alias("n_dist"),
            X.stopword_ratio("text").alias("stop"),
            X.avg_word_len("text").alias("awl"),
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pdf = docs.select("doc_id", "text").toPandas().sort_values("doc_id").reset_index(drop=True)
    toks = pdf["text"].str.split()
    np.testing.assert_array_equal(got["n_tok"], toks.map(len))
    np.testing.assert_array_equal(got["n_dist"], toks.map(lambda t: len(set(t))))
    want_stop = toks.map(lambda t: sum(w in X.STOPWORDS for w in t) / len(t))
    np.testing.assert_allclose(got["stop"], want_stop, rtol=1e-12)
    want_awl = toks.map(lambda t: sum(len(w) for w in t) / len(t))
    np.testing.assert_allclose(got["awl"], want_awl, rtol=1e-12)


def test_quality_score_range(docs):
    q = docs.select(X.quality_score("text").alias("q")).toPandas()["q"]
    assert (q >= 0).all() and (q <= 1).all()
    assert q.nunique() > 10  # actually discriminates


def test_fnv1a_known_vector():
    # public FNV-1a 64 test vector
    assert int(X.fnv1a64_np(pd.Series(["abc"]))[0]) == 0xE71FA2190541574B


def test_rolling_fingerprint_deterministic(docs):
    a = X.rolling_fingerprint(docs, "text").select("doc_id", "fp64").toPandas()
    b = X.rolling_fingerprint(docs, "text").select("doc_id", "fp64").toPandas()
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True),
    )
    assert a["fp64"].nunique() == len(a)  # no collisions on this corpus


@pytest.fixture(scope="module")
def dup_docs(spark):
    base = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "sphinx of black quartz judge my vow",
        "how vexingly quick daft zebras jump",
    ]
    rows = []
    i = 0
    for t in base:
        rows.append((i, t, "en")); i += 1
        rows.append((i, t.upper(), "en")); i += 1                 # case dup
        ws = t.split(); rows.append((i, " ".join(ws[::-1]), "en")); i += 1  # permuted dup
        rows.append((i, t + " extra tail words here now", "en")); i += 1    # near dup
    rows.append((i, "completely different content about spark engines", "en"))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text", "lang"]))


def test_exact_dedup_bag_semantics(dup_docs):
    out = exact_dedup(dup_docs).toPandas().sort_values("doc_id").reset_index(drop=True)
    # case + permutation dups share a fingerprint with the original
    for base_id in (0, 4, 8, 12):
        grp = out.loc[[base_id, base_id + 1, base_id + 2], "fingerprint"]
        assert grp.nunique() == 1
        assert out.loc[base_id, "keep"] and not out.loc[base_id + 1, "keep"]
    # the near-dup (added words) does NOT collapse
    assert out.loc[3, "fingerprint"] != out.loc[0, "fingerprint"]


def test_fingerprint_summary_semantics(dup_docs):
    import hashlib

    import numpy as np

    out = (
        X.fingerprint_summary(dup_docs)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    texts = dup_docs.toPandas().sort_values("doc_id")["text"].tolist()
    for base_id in (0, 4, 8, 12):
        # content key collapses the case dup (group of 2) but not the
        # permuted or extended copies
        assert out.loc[base_id, "content_fp"] == out.loc[base_id + 1, "content_fp"]
        assert out.loc[base_id, "content_group"] == 2
        assert out.loc[base_id + 2, "content_group"] == 1
        # orig/case/permuted share a bag group of 3 > their content groups
        assert out.loc[[base_id, base_id + 1, base_id + 2], "reorder_only_dup"].all()
        # the near dup (added words) is neither
        assert not out.loc[base_id + 3, "reorder_only_dup"]
    assert not out.iloc[-1]["reorder_only_dup"]  # the unique doc
    # fp64 is exactly the signed lower-64 md5 of the normalized text
    import re

    for i in (0, 3, 16):
        norm = re.sub(r"\s+", " ", texts[i].lower())
        u = int.from_bytes(hashlib.md5(norm.encode()).digest()[8:], "little")
        assert int(out.loc[i, "fp64"]) == int(np.uint64(u).astype(np.int64))


def test_fingerprint_summary_preserves_null_text_rows(spark):
    """Null-text docs hash to NULL fingerprints; the group-count
    join-backs are LEFT joins so the panel stays row-preserving (an
    inner join on a NULL key silently drops the doc — the regression
    this pins). Null docs count as their own singleton group and the
    fp64 pandas kernel must pass the None through, not crash the
    batch."""
    d = spark.createDataFrame(
        [(1, "shared text here"), (2, "shared text here"), (3, None), (4, None)],
        "doc_id bigint, text string",
    )
    out = X.fingerprint_summary(d).toPandas().set_index("doc_id").sort_index()
    assert len(out) == 4  # row-preserving incl. both null-text docs
    assert out.loc[1, "content_group"] == 2
    for i in (3, 4):
        assert out.loc[i, "content_fp"] is None
        assert out.loc[i, "fp64"] is None or np.isnan(out.loc[i, "fp64"])
        assert out.loc[i, "content_group"] == 1
        assert not out.loc[i, "reorder_only_dup"]


def test_jaccard_pairs_vs_bruteforce(dup_docs):
    got = (
        jaccard_pairs(dup_docs, threshold=0.5)
        .toPandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    pdf = dup_docs.toPandas()
    sets = {r.doc_id: set(r.text.lower().split()) for r in pdf.itertuples()}
    want = []
    ids = sorted(sets)
    for i in ids:
        for j in ids:
            if i < j:
                jac = len(sets[i] & sets[j]) / len(sets[i] | sets[j])
                if jac >= 0.5:
                    want.append((i, j, jac))
    want_df = pd.DataFrame(want, columns=["id_a", "id_b", "jaccard"])
    assert len(got) == len(want_df)
    np.testing.assert_allclose(
        got["jaccard"].to_numpy(), want_df["jaccard"].to_numpy(), rtol=1e-12
    )


def test_minhash_lsh_finds_high_jaccard_pairs(dup_docs):
    got = minhash_lsh_pairs(dup_docs, num_perm=64, bands=16, shingle_n=2).toPandas()
    pairs = set(zip(got["id_a"], got["id_b"]))
    # permuted-word dup has shingle-jaccard < 1 but case dup == 1:
    for base_id in (0, 4, 8, 12):
        assert (base_id, base_id + 1) in pairs, f"case dup {base_id} missed"
    # est_jaccard of exact shingle dups is 1.0
    exact = got[(got["id_b"] - got["id_a"] == 1) & (got["id_a"] % 4 == 0)]
    assert (exact["est_jaccard"] == 1.0).all()


def test_minhash_estimate_tracks_true_jaccard(docs):
    sample = docs.limit(40)
    got = minhash_lsh_pairs(sample, num_perm=128, bands=32, shingle_n=1).toPandas()
    if len(got) == 0:
        pytest.skip("no candidate pairs in sample")
    pdf = sample.toPandas()
    sets = {r.doc_id: set(r.text.lower().split()) for r in pdf.itertuples()}
    true = got.apply(
        lambda r: len(sets[r.id_a] & sets[r.id_b]) / len(sets[r.id_a] | sets[r.id_b]),
        axis=1,
    )
    err = (got["est_jaccard"] - true).abs()
    assert err.mean() < 0.12  # 128 perms ⇒ σ≈0.04; generous bound


def test_simhash_near_dups(dup_docs):
    out = simhash_pairs(dup_docs, max_hamming=6).toPandas()
    pairs = set(zip(out["id_a"], out["id_b"]))
    for base_id in (0, 4, 8, 12):
        # case dup and permuted dup hash identically (token multiset equal)
        assert (base_id, base_id + 1) in pairs
        assert (base_id, base_id + 2) in pairs
        h = out[(out["id_a"] == base_id) & (out["id_b"] == base_id + 1)]["hamming"]
        assert (h == 0).all()


def test_jaccard_prefix_filter_is_lossless(spark, sf_dir):
    """The prefix-filter blocking must equal brute force exactly — no
    band-boundary or bucket recall caveat (VERDICT r1 item 10). Runs on
    the real documents table at two thresholds."""
    import duckdb

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    for t in (0.5, 0.9):
        got = {
            (r.id_a, r.id_b): r.jaccard
            for r in jaccard_pairs(docs, threshold=t).collect()
        }
        want = {
            (a, b): j
            for a, b, j in con.execute(
                r"""WITH x AS (SELECT doc_id, lang,
                        list_distinct(regexp_split_to_array(lower(text), '\s+')) toks
                    FROM documents)
                , p AS (
                    SELECT a.doc_id ia, b.doc_id ib,
                        CAST(LEN(list_intersect(a.toks, b.toks)) AS DOUBLE)
                            / LEN(list_distinct(a.toks || b.toks)) j
                    FROM x a JOIN x b ON a.lang = b.lang AND a.doc_id < b.doc_id
                )
                SELECT ia, ib, j FROM p WHERE j >= ?""",
                [t],
            ).fetchall()
        }
        assert set(got) == set(want), (t, len(got), len(want))
        for k in got:
            assert abs(got[k] - want[k]) < 1e-12


def test_quality_rules_hand_cases(spark):
    """Gopher-style gate semantics pinned on crafted documents."""
    import pandas as pd
    from pyspark.sql import functions as F

    from sparkfeat import text as X

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [
                    "the quick brown fox jumps over a lazy dog in the sun",  # good
                    "spam ham spam ham spam ham spam ham spam ham",  # repeated bigram
                    "line one\nline one\nline one\nthe end",  # duplicate lines
                    "### ### ### the ### ### ###",  # symbol heavy
                ],
            }
        )
    )
    out = (
        docs.select(
            "doc_id",
            F.round(X.top_bigram_fraction("text"), 6).alias("bg"),
            F.round(X.duplicate_line_fraction("text"), 6).alias("dl"),
            F.round(X.symbol_word_ratio("text"), 6).alias("sr"),
            X.gopher_quality_pass("text").alias("ok"),
        )
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc[0, "ok"] and out.loc[0, "bg"] < 0.3 and out.loc[0, "dl"] == 0.0
    # "spam ham" appears 5x in 9 bigrams over 10 tokens -> 5*2/10 = 1.0
    assert out.loc[1, "bg"] == 1.0 and not out.loc[1, "ok"]
    # 4 lines, 2 distinct -> 0.5 duplicated
    assert out.loc[2, "dl"] == 0.5
    # 18 '#' chars over 7 words = 2.571429
    assert abs(out.loc[3, "sr"] - 18 / 7) < 1e-6 and not out.loc[3, "ok"]


def test_lang_ngram_guess_multilingual(spark):
    """Trigram-profile language ID separates real language samples
    (sentences deliberately different from the seed texts)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from sparkfeat import text as X

    samples = {
        "en": "she walked through the garden while the children were playing with their small wooden toys near the old stone wall",
        "de": "sie ging durch den garten während die kinder mit ihren kleinen holzspielzeugen neben der alten steinmauer spielten",
        "fr": "elle marchait dans le jardin pendant que les enfants jouaient avec leurs petits jouets en bois près du vieux mur de pierre",
        "es": "ella caminaba por el jardín mientras los niños jugaban con sus pequeños juguetes de madera cerca del viejo muro de piedra",
    }
    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": range(len(samples)), "text": list(samples.values())}
        )
    )
    got = [
        r["g"]
        for r in df.select(X.lang_ngram_guess("text").alias("g"))
        .orderBy("g")
        .collect()
    ]
    assert sorted(got) == sorted(samples.keys()), got
    # garbage → unknown
    junk = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": ["zzqx vvk pffft 12398"]}))
    assert junk.select(X.lang_ngram_guess("text").alias("g")).first()["g"] == "unknown"


def test_long_doc_counters_bounded_time(spark):
    """The sort-and-run-scan counters (_sorted_run_counts) keep
    top_bigram_fraction / lang_ngram_guess O(n log n) per document:
    a ~50k-token doc must finish in seconds (the earlier nested
    filter-count was O(distinct*n) ~ 4e8 comparisons here) and match
    a python Counter oracle exactly."""
    import time
    from collections import Counter

    import pandas as pd

    from sparkfeat import text as X

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(5000)] + list(X.STOPWORDS)
    words = rng.choice(vocab, size=50_000).tolist()
    doc = " ".join(words)
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": [doc]}))

    t0 = time.monotonic()
    row = df.select(
        X.top_bigram_fraction("text").alias("bg"),
        X.lang_ngram_guess("text").alias("lang"),
    ).first()
    elapsed = time.monotonic() - t0
    assert elapsed < 30, f"long-doc counters took {elapsed:.1f}s"

    low = doc.lower().split()
    bigrams = [f"{a} {b}" for a, b in zip(low, low[1:])]
    want_bg = 2 * Counter(bigrams).most_common(1)[0][1] / len(low)
    assert abs(row["bg"] - want_bg) < 1e-12

    # trigram top-40 replay: count desc, trigram asc — then profile match
    tris = [doc.lower()[i : i + 3] for i in range(len(doc) - 2)]
    top40 = [
        t
        for t, _ in sorted(Counter(tris).items(), key=lambda kv: (-kv[1], kv[0]))[:40]
    ]
    scores = {
        lang: len(set(top40) & set(prof)) for lang, prof in X.LANG_PROFILES.items()
    }
    best = max(sorted(scores.items()), key=lambda kv: (kv[1], kv[0]))
    want_lang = best[0] if best[1] >= 3 else "unknown"
    assert row["lang"] == want_lang


def test_sample_split_deterministic_and_stratified(spark, sf_dir):
    """Hash sampling: assignments are a pure function of the id (stable
    when the corpus grows), split fractions land near the requested
    80/10/10, and per-language keep rates track the stratified targets."""
    from pyspark.sql import functions as F

    from sparkfeat.corpus import sample_split

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rates = {"en": 1.0, "de": 0.5, "fr": 0.5, "es": 0.5, "zh": 0.25}
    full = sample_split(docs, train=0.8, val=0.1, lang_rates=rates).toPandas()
    half = sample_split(
        docs.filter(F.col("doc_id") % 2 == 0), train=0.8, val=0.1, lang_rates=rates
    ).toPandas()
    # growth-stability: the half-corpus rows agree exactly with the full run
    merged = half.merge(full, on="doc_id", suffixes=("_h", "_f"))
    assert (merged["split_h"] == merged["split_f"]).all()
    assert (merged["strat_keep_h"] == merged["strat_keep_f"]).all()
    # fractions near targets (binomial noise at n=500)
    frac = full["split"].value_counts(normalize=True)
    assert abs(frac.get("train", 0) - 0.8) < 0.06
    assert abs(frac.get("val", 0) - 0.1) < 0.05
    # stratified keep rate per language tracks its target
    for lang, rate in rates.items():
        sub = full[full["lang"] == lang]
        if len(sub) >= 30:
            got = sub["strat_keep"].mean()
            assert abs(got - rate) < 0.2, (lang, rate, got)


def test_pack_sequences_matches_global_cumsum(spark, sf_dir):
    """The two-level distributed prefix sum equals the plain global
    cumsum, and the layout is independent of physical partitioning."""
    import numpy as np
    from pyspark.sql import functions as F

    from sparkfeat.corpus import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = pack_sequences(docs, budget=512).toPandas().sort_values("doc_id")
    pdf = docs.select("doc_id", "text").toPandas().sort_values("doc_id")
    ntok = pdf["text"].str.split().str.len().to_numpy(dtype="int64")
    start = np.cumsum(ntok) - ntok
    np.testing.assert_array_equal(got["n_tok"].to_numpy(), ntok)
    np.testing.assert_array_equal(got["tok_start"].to_numpy(), start)
    np.testing.assert_array_equal(got["seq_id"].to_numpy(), start // 512)
    # partition-independence: a different physical layout packs identically
    re = pack_sequences(docs.repartition(17), budget=512).toPandas().sort_values("doc_id")
    np.testing.assert_array_equal(re["tok_start"].to_numpy(), start)


def test_pack_sequences_many_blocks_exact(spark):
    """10^5 blocks (block=1 over 10^5 docs): the two-level prefix sum
    stays exact with a block table far past what a literal-map broadcast
    could carry, and integer div keeps tok_start exact."""
    import numpy as np
    from pyspark.sql import functions as F

    from sparkfeat.corpus import pack_sequences

    n = 100_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit("a b c").alias("text")
    )
    got = (
        pack_sequences(docs, budget=512, block=1)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ids = got["doc_id"].to_numpy()
    np.testing.assert_array_equal(got["n_tok"].to_numpy(), np.full(n, 3))
    np.testing.assert_array_equal(got["tok_start"].to_numpy(), 3 * ids)
    np.testing.assert_array_equal(got["seq_id"].to_numpy(), (3 * ids) // 512)


def test_pack_spans_tile_docs_and_fill_sequences(spark, sf_dir):
    """Span-manifest invariants a sample-writer depends on: each doc's
    spans tile [0, n_tok) contiguously, and every non-final sequence is
    filled to exactly `budget` tokens."""
    from sparkfeat.corpus import pack_spans

    budget = 128
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    spans = pack_spans(docs, budget=budget).toPandas()
    for doc_id, g in spans.groupby("doc_id"):
        g = g.sort_values("seq_id")
        assert g["tok_from"].iloc[0] == 0
        assert g["tok_to"].iloc[-1] == g["n_tok"].iloc[0]
        # contiguous tiling of the doc
        assert (g["tok_from"].iloc[1:].to_numpy() == g["tok_to"].iloc[:-1].to_numpy()).all()
        # consecutive sequence ids
        assert (g["seq_id"].diff().iloc[1:] == 1).all()
        # span lands where the offset says
        assert (
            g["seq_offset"] == (g["tok_start"] + g["tok_from"]) - g["seq_id"] * budget
        ).all()
    fill = spans.groupby("seq_id").apply(
        lambda g: (g["tok_to"] - g["tok_from"]).sum(), include_groups=False
    )
    assert (fill.iloc[:-1] == budget).all()
    assert 0 < fill.iloc[-1] <= budget


def test_lang_ngram_arrow_equals_expr(spark, sf_dir):
    """The Arrow kernel and the Catalyst list-algebra path implement the
    SAME Cavnar-Trenkle semantics — equal on every testdata doc and on
    the seed texts themselves (incl. accented chars, where Python's
    codepoint ordering must match Spark's binary UTF-8 ordering)."""
    import pyspark.sql.functions as F

    from sparkfeat import text as X

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    seeds = spark.createDataFrame(
        [(i, s) for i, s in enumerate(X._LANG_SEEDS.values())]
        + [
            (99, ""),
            (100, "ab"),
            (101, "the the the"),
            (102, None),
            # İ lowercases to TWO codepoints (i + combining dot): the
            # batch kernel's flat encode must take lengths AFTER lower
            (103, "İİİ the and of to in is that it was"),
            # astral-plane codepoints (> 0xFFFF) exercise the 21-bit
            # trigram packing; mixed de/en content exercises tie-breaks
            (104, "😀😀😀 der die und the the of and"),
            (105, "abc"),
        ],
        "doc_id long, text string",
    )
    for d in (docs, seeds):
        n = (
            d.select(
                X.lang_ngram_guess("text").alias("a"),
                X.lang_ngram_guess_arrow("text").alias("b"),
            )
            .filter("NOT (a <=> b)")  # null-safe: a null on either side is a diff
            .count()
        )
        assert n == 0
    # the null doc must come back 'unknown' from BOTH paths, not kill
    # the batch (one null doc in a corpus must not fail the job)
    row = (
        seeds.filter("doc_id = 102")
        .select(
            X.lang_ngram_guess("text").alias("a"),
            X.lang_ngram_guess_arrow("text").alias("b"),
        )
        .first()
    )
    assert row["a"] == "unknown" and row["b"] == "unknown"


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_connected_components_matches_union_find(spark):
    """Large-star/small-star CC vs a union-find reference on the
    adversarial shapes: a long chain (worst case for naive min-label
    propagation — O(diameter) rounds there, O(log n) here), a clique, a
    star, an isolated pair, and a cross-link merging two shapes.
    Duplicate and self edges must be tolerated."""
    from sparkfeat.dedup import connected_components

    edges = (
        [(i, i + 1) for i in range(40)]  # 41-node chain
        + [(a, b) for a in range(100, 105) for b in range(a + 1, 105)]
        + [(200, 201), (300, 301), (300, 302), (300, 303)]
        + [(40, 100)]  # chain ∪ clique merge
        + [(5, 4), (7, 7), (200, 201)]  # reversed dup, self edge, dup
    )
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r.node: r.component for r in connected_components(df).collect()
    }
    want = _union_find_components((a, b) for a, b in edges if a != b)
    assert got == want


def test_neardup_clusters_keep_list_invariants(spark):
    """Keep-list semantics: exactly one keep per cluster, the keeper is
    the cluster min, singletons keep themselves, and cluster sizes
    partition the doc set."""
    from sparkfeat.dedup import neardup_clusters

    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    pairs = spark.createDataFrame(
        [(0, 3), (3, 7), (1, 2)], "id_a long, id_b long"
    )
    out = neardup_clusters(docs, pairs).collect()
    by_doc = {r.doc_id: r for r in out}
    assert len(by_doc) == 10
    assert {r.doc_id for r in out if r.keep} == {0, 1, 4, 5, 6, 8, 9}
    assert by_doc[7].cluster_id == 0 and by_doc[7].cluster_size == 3
    assert by_doc[2].cluster_id == 1 and by_doc[2].cluster_size == 2
    assert by_doc[9].cluster_id == 9 and by_doc[9].cluster_size == 1
    assert sum(r.cluster_size for r in out if r.keep) == 10


# ---------------------------------------------------------------------------
# Incremental dedup (batch vs corpus)
# ---------------------------------------------------------------------------


def test_incremental_dedup_flags(spark):
    from sparkfeat.dedup import incremental_dedup

    corpus = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),
            (1, "one two three four five six seven"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            # exact dup of corpus doc 0 (same token bag)
            (10, "alpha beta gamma delta epsilon zeta"),
            # near dup of corpus doc 1 (one token changed)
            (11, "one two three four five six EIGHT"),
            # novel
            (12, "completely unrelated fresh content here"),
            # exact dup of an EARLIER batch doc (12)
            (13, "completely unrelated fresh content here"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in incremental_dedup(corpus, batch, shingle_n=2).collect()
    }
    assert rows[10].exact_dup and not rows[10].keep
    assert rows[11].near_dup and not rows[11].exact_dup and not rows[11].keep
    assert rows[12].keep and not (
        rows[12].exact_dup or rows[12].near_dup or rows[12].batch_dup
    )
    assert rows[13].batch_dup and not rows[13].exact_dup and not rows[13].keep


def test_incremental_dedup_indexed_equals_inline(spark, tmp_path):
    from sparkfeat.dedup import (
        build_dedup_index,
        incremental_dedup,
        incremental_dedup_indexed,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = docs.filter("doc_id % 5 != 0")
    batch = docs.filter("doc_id % 5 = 0")
    path = str(tmp_path / "dedup_index")
    build_dedup_index(corpus, path)
    inline = sorted(map(tuple, incremental_dedup(corpus, batch).collect()))
    served = sorted(
        map(tuple, incremental_dedup_indexed(spark, path, batch).collect())
    )
    assert served == inline and len(inline) > 0


def test_jaccard_positional_filter_is_lossless(spark, sf_dir):
    """PPJoin positional prune (positional_filter=True) must not change
    the result set: later-match co-occurrence rows may fail the bound
    spuriously, but every true pair's first-match row passes, so the
    deduped pair set is identical to the default path."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for t in (0.5, 0.9):
        base = {
            (r.id_a, r.id_b): r.jaccard
            for r in jaccard_pairs(docs, threshold=t).collect()
        }
        pos = {
            (r.id_a, r.id_b): r.jaccard
            for r in jaccard_pairs(
                docs, threshold=t, positional_filter=True
            ).collect()
        }
        assert base == pos


def test_source_crossrates_broadcasts_pairs(spark, sf_dir):
    """The provenance rollup joins the (small) post-LSH pair table to
    the corpus twice — both lookups must broadcast the pair side, never
    shuffle the corpus scan."""
    from sparkfeat.queries import EXTRA_QUERIES, QUERIES

    fn = {**QUERIES, **EXTRA_QUERIES}["dedup_source_crossrates"]
    plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2, plan[:3000]
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# PMI collocations
# ---------------------------------------------------------------------------


def _pmi_replica(texts, window, min_count):
    """Pure-Python replica of pmi_topk's counting + formula."""
    import math
    from collections import Counter

    pc = Counter()
    for t in texts:
        ws = [w for w in t.lower().split() if w]
        for i, a in enumerate(ws):
            for j in range(i + 1, min(i + window, len(ws) - 1) + 1):
                pc[(a, ws[j])] += 1
    P = sum(pc.values())
    ca, cb = Counter(), Counter()
    for (a, b), c in pc.items():
        ca[a] += c
        cb[b] += c
    return {
        (a, b): (c, round(math.log(c * P / (ca[a] * cb[b])), 6))
        for (a, b), c in pc.items()
        if c >= min_count
    }


def test_pmi_topk_hand_case(spark):
    from sparkfeat.text import pmi_topk

    texts = [
        "the cat sat on the mat",
        "the cat ate the fish",
        "a dog sat on a log",
        "the cat sat quietly",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = {
        (r["tok_a"], r["tok_b"]): (r["c_ab"], r["pmi"])
        for r in pmi_topk(docs, window=2, min_count=2, k=1000).collect()
    }
    assert got == _pmi_replica(texts, window=2, min_count=2)
    # ranks: pmi desc, then (tok_a, tok_b) asc — a strict total order
    rows = sorted(
        pmi_topk(docs, window=2, min_count=2, k=1000).collect(),
        key=lambda r: r["rank"],
    )
    keys = [(-r["pmi"], r["tok_a"], r["tok_b"]) for r in rows]
    assert keys == sorted(keys)


def test_pmi_topk_shard_independent(spark, sf_dir):
    """Two-phase top-k returns the identical table for any shard count
    (any global top-k row is top-k within its own shard)."""
    from sparkfeat.text import pmi_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = pmi_topk(docs, k=25, shards=1).collect()
    b = pmi_topk(docs, k=25, shards=7).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pmi_topk_no_cartesian(spark, sf_dir):
    """Pair generation is an equi-join on (doc, position): no cartesian
    / nested-loop pair blowup anywhere in the plan (the one
    BroadcastNestedLoopJoin is the 1-row corpus-total crossJoin)."""
    from sparkfeat.text import pmi_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = pmi_topk(docs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan


# ---------------------------------------------------------------------------
# clean_text (corpus normalization scrub)
# ---------------------------------------------------------------------------


def _cdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_clean_text_each_kind(spark):
    from sparkfeat.text import clean_text

    d = _cdocs(
        spark,
        [
            (1, "a\x00b\x14c"),                       # controls dropped
            (2, "x​y‌﻿z­"),       # zero-width dropped
            (3, "a b c　d"),            # unispace -> ' '
            (4, "‘q’ “w”"),       # quotes -> ascii
            (5, "a – b — c − 5"),      # dashes -> '-'
            (6, "a   b\t\tc"),                        # collapse (spaces only)
            (7, "already clean"),
            (8, None),
        ],
    )
    out = {r["doc_id"]: r for r in clean_text(d).collect()}
    assert out[1]["n_ctrl"] == 2 and out[1]["clean_text"] == "abc"
    assert out[2]["n_zw"] == 4 and out[2]["clean_text"] == "xyz"
    assert out[3]["n_unispace"] == 3 and out[3]["clean_text"] == "a b c d"
    assert out[4]["n_squote"] == 2 and out[4]["n_dquote"] == 2
    assert out[4]["clean_text"] == "'q' \"w\""
    assert out[5]["n_dash"] == 3 and out[5]["clean_text"] == "a - b - c - 5"
    assert out[6]["clean_text"] == "a b\t\tc"  # only space runs collapse
    assert out[7]["changed"] is False and out[7]["clean_text"] == "already clean"
    assert out[8]["clean_text"] is None and out[8]["changed"] is False
    for i in (1, 2, 3, 4, 5, 6):
        assert out[i]["changed"] is True


def test_clean_text_nfc_composes(spark):
    from sparkfeat.text import clean_text

    d = _cdocs(spark, [(1, "café"), (2, "café")])
    out = {r["doc_id"]: r for r in clean_text(d, nfc=True).collect()}
    assert out[1]["clean_text"] == "café" and out[1]["changed"] is True
    assert out[2]["clean_text"] == "café" and out[2]["changed"] is False
    # without nfc the decomposed form passes through untouched
    raw = {r["doc_id"]: r for r in clean_text(d).collect()}
    assert raw[1]["clean_text"] == "café"
    assert raw[1]["changed"] is False


def test_clean_text_is_map_only(spark):
    from sparkfeat.text import clean_text

    d = _cdocs(spark, [(1, "x")])
    plan = clean_text(d)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_clean_text_counts_reconcile_stepwise(spark):
    from sparkfeat.text import clean_text

    # a zero-width char INSIDE a unicode space run: the zw pass removes
    # it first, so unispace still sees its own codepoints (stepwise
    # attribution, no double counting)
    d = _cdocs(spark, [(1, "a ​ b")])
    r = clean_text(d).collect()[0]
    assert r["n_zw"] == 1 and r["n_unispace"] == 2
    assert r["clean_text"] == "a b"


# ---------------------------------------------------------------------------
# domain_stats (outlink domain profile)
# ---------------------------------------------------------------------------


def test_domain_stats_hand_computed(spark):
    from sparkfeat.text import domain_stats

    d = _cdocs(
        spark,
        [
            (1, "see https://a.com/x and https://A.com/y and http://b.org/z"),
            (2, "ref https://a.com:8080/q plus text"),
            (3, "no links here"),
            (4, None),
        ],
    )
    out = {r["domain"]: r for r in domain_stats(d).collect()}
    assert set(out) == {"a.com", "b.org"}
    # a.com: doc 1 cites twice (case-folded), doc 2 once (port stripped)
    assert out["a.com"]["n_occ"] == 3 and out["a.com"]["n_docs"] == 2
    assert out["b.org"]["n_occ"] == 1 and out["b.org"]["n_docs"] == 1
    # doc_frac over the WHOLE corpus (4 docs incl. link-free and null)
    assert abs(out["a.com"]["doc_frac"] - 0.5) < 1e-9
    assert abs(out["b.org"]["doc_frac"] - 0.25) < 1e-9


def test_domain_stats_is_lazy(spark):
    from sparkfeat.text import domain_stats

    d = _cdocs(spark, [(i, f"https://d{i % 3}.com/x") for i in range(30)])
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None))
    out = domain_stats(d)
    after = set(tracker.getJobIdsForGroup(None))
    assert after == before, "plan build fired a Spark job"
    assert out.count() == 3


# ---------------------------------------------------------------------------
# source_distinctive_terms (per-source tf-idf audit)
# ---------------------------------------------------------------------------


def test_distinctive_terms_hand_computed(spark):
    import math

    from sparkfeat.text import source_distinctive_terms

    rows = [
        (1, "the cat sat", "pets"),
        (2, "the cat ran", "pets"),
        (3, "the tax form", "gov"),
        (4, "the tax rate", "gov"),
    ]
    d = spark.createDataFrame(
        rows, "doc_id bigint, text string, source string"
    )
    out = source_distinctive_terms(d, k=3, min_df=2).collect()
    got = {(r["source"], r["term"]): r for r in out}
    # 'the' is in all 4 docs -> idf = ln(5/5) = 0 -> never distinctive
    n = 4
    the = got[("pets", "the")]
    assert the["score"] == 0.0 and the["df"] == 4
    cat = got[("pets", "cat")]
    assert cat["tf"] == 2 and cat["df"] == 2
    assert abs(cat["score"] - round(2 * math.log((n + 1) / 3), 6)) < 1e-9
    assert cat["rank"] == 1
    tax = got[("gov", "tax")]
    assert tax["rank"] == 1 and tax["tf"] == 2
    # hapax terms (sat/ran/form/rate: df=1) pruned by min_df=2
    assert not any(t in ("sat", "ran", "form", "rate") for (_, t) in got)


def test_distinctive_terms_shard_invariance(spark):
    from sparkfeat.text import source_distinctive_terms

    rows = [
        (i, f"w{i % 7} w{i % 5} shared", "s" + str(i % 2)) for i in range(40)
    ]
    d = spark.createDataFrame(
        rows, "doc_id bigint, text string, source string"
    )
    a = {
        (r["source"], r["rank"]): r["term"]
        for r in source_distinctive_terms(d, k=5, shards=2).collect()
    }
    b = {
        (r["source"], r["rank"]): r["term"]
        for r in source_distinctive_terms(d, k=5, shards=64).collect()
    }
    assert a == b  # the two-phase rank is shard-count independent


# ---------------------------------------------------------------------------
# Winnowing fingerprints (text.winnow_fingerprints / winnow_pairs)
# ---------------------------------------------------------------------------


def _winnow_ref(text: str, k: int, w: int) -> set[tuple[int, int]]:
    """Pure-python winnowing per the SIGMOD'03 paper: char k-grams of
    the normalized text, 40-bit md5-prefix hash, in each window of w
    hashes select the min (rightmost on ties); docs shorter than w
    grams contribute their global min."""
    import hashlib
    import re

    norm = re.sub(r"\s+", " ", text.lower())
    grams = [norm[i : i + k] for i in range(len(norm) - k + 1)]
    hs = [
        int(hashlib.md5(g.encode("utf-8")).hexdigest()[:10], 16)
        for g in grams
    ]
    sel: set[tuple[int, int]] = set()
    if not hs:
        return sel
    for e in range(min(w, len(hs)) - 1, len(hs)):
        lo = max(0, e - w + 1)
        win = list(range(lo, e + 1))
        # min hash, rightmost occurrence on ties
        best = max(win, key=lambda i: (-hs[i], i))
        sel.add((hs[best], best))
    return sel


def _winnow_spark(spark, texts, k, w):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = X.winnow_fingerprints(df, k=k, w=w)
    got: dict[int, set[tuple[int, int]]] = {i: set() for i in range(len(texts))}
    for r in out.collect():
        got[r["doc_id"]].add((r["fp"], r["pos"]))
    return got


def test_winnow_matches_python_reference(spark):
    texts = [
        "A do run run run, a do run run",  # the paper's flavor of input
        "the quick brown fox jumps over the lazy dog",
        "aaaaaaaaaaaa",  # constant text → heavy hash ties (rightmost rule)
        "short",  # fewer grams than w → global min only
        "tiny",  # shorter than k → no fingerprints
    ]
    k, w = 5, 4
    got = _winnow_spark(spark, texts, k, w)
    for i, t in enumerate(texts):
        assert got[i] == _winnow_ref(t, k, w), i


def test_winnow_local_guarantee(spark):
    """Two documents sharing a substring of length ≥ w+k−1 must share
    at least one fingerprint (the paper's detection guarantee)."""
    k, w = 5, 4
    shared = "xylophone quartz boulevard"  # 26 chars ≥ w+k−1 = 8
    texts = [
        "first document begins " + shared + " and then diverges fully",
        "completely different preamble " + shared + " other ending here",
    ]
    got = _winnow_spark(spark, texts, k, w)
    fps0 = {fp for fp, _ in got[0]}
    fps1 = {fp for fp, _ in got[1]}
    assert fps0 & fps1, "guaranteed shared fingerprint missing"


def test_winnow_short_doc_conventions(spark):
    k, w = 5, 4
    got = _winnow_spark(spark, ["abcdefg", "abc"], k, w)
    # 3 grams < w → exactly one fingerprint (the global min)
    assert len(got[0]) == 1
    # shorter than k → nothing
    assert got[1] == set()


def test_winnow_pairs_df_cap_drops_boilerplate(spark):
    """A fingerprint present in MORE than df_cap documents must not
    generate pairs; rarer overlap still pairs up."""
    # identical texts → identical selected fingerprints → every
    # boilerplate fp has df = 6 > cap and dies before the join
    boiler = "standard legal disclaimer footer text here"
    rare = "unique shared paragraph about xylophones"
    texts = [boiler for _ in range(6)]
    texts += [rare + " one tail", rare + " two tail"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    fps = X.winnow_fingerprints(df, k=5, w=4)
    pairs = X.winnow_pairs(fps, min_shared=1, df_cap=5).collect()
    ids = {(r["id_a"], r["id_b"]) for r in pairs}
    assert ids == {(6, 7)}, ids
    scores = {(r["id_a"], r["id_b"]): r["score"] for r in pairs}
    assert 0.0 < scores[(6, 7)] <= 1.0
    # without the cap the boilerplate clique comes back in full
    uncapped = X.winnow_pairs(fps, min_shared=1, df_cap=None).collect()
    uids = {(r["id_a"], r["id_b"]) for r in uncapped}
    assert {(a, b) for a in range(6) for b in range(a + 1, 6)} <= uids


def test_winnow_single_exchange_plan(spark, sf_dir):
    """The fingerprint selection (explode, window min, run-dedupe) must
    stay ONE doc_id hash exchange — the run-dedupe exists precisely to
    avoid DISTINCT's second shuffle."""
    import re

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("text").isNotNull()
    )
    out = X.winnow_fingerprints(docs, k=5, w=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


# ---------------------------------------------------------------------------
# Directional containment near-dup (dedup.containment_pairs)
# ---------------------------------------------------------------------------


def test_containment_direction_and_losslessness(spark):
    """A short doc quoted inside a long one: containment fires in the
    probe→host direction only, Jaccard misses the pair entirely, and
    the prefix-filtered result equals a brute-force python replay."""
    from sparkfeat.dedup import containment_pairs

    quote = " ".join(f"quoted{i}" for i in range(40))
    host = quote + " " + " ".join(f"body{i}" for i in range(200))
    other = " ".join(f"other{i}" for i in range(120))
    rows = [(0, quote, "en"), (1, host, "en"), (2, other, "en")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        (r["probe_id"], r["host_id"]): r["containment"]
        for r in containment_pairs(
            df, threshold=0.9, min_tokens=10
        ).collect()
    }
    assert got == {(0, 1): 1.0}  # quote ⊂ host; host ⊄ quote; other alone
    # jaccard on the same pair is 40/240 — far below any useful bar
    from sparkfeat.dedup import jaccard_pairs

    assert jaccard_pairs(df, threshold=0.5).count() == 0

    # brute-force replay over every ordered pair
    sets = {i: set(t.lower().split()) for i, t, _ in rows}
    want = {
        (a, b): len(sets[a] & sets[b]) / len(sets[a])
        for a in sets
        for b in sets
        if a != b
        and len(sets[a]) >= 10
        and len(sets[a] & sets[b]) / len(sets[a]) >= 0.9
    }
    assert set(got) == set(want)


def test_containment_min_tokens_floor_and_bands(spark):
    """Tiny probes are excluded by the floor (their containment is
    noise), and pairs never cross language bands."""
    from sparkfeat.dedup import containment_pairs

    tiny = "common words here"
    host_en = tiny + " " + " ".join(f"en{i}" for i in range(50))
    host_fr = tiny + " " + " ".join(f"fr{i}" for i in range(50))
    df = spark.createDataFrame(
        [(0, tiny, "en"), (1, host_en, "en"), (2, host_fr, "fr")],
        "doc_id long, text string, lang string",
    )
    # floor 10 excludes the 3-token probe → nothing fires
    assert containment_pairs(df, threshold=0.9, min_tokens=10).count() == 0
    # floor 3 admits it, but only within the en band
    got = {
        (r["probe_id"], r["host_id"])
        for r in containment_pairs(
            df, threshold=0.9, min_tokens=3
        ).collect()
    }
    assert got == {(0, 1)}


def test_containment_mutual_pair_yields_both_directions(spark):
    from sparkfeat.dedup import containment_pairs

    t = " ".join(f"w{i}" for i in range(60))
    df = spark.createDataFrame(
        [(0, t, "en"), (1, t + " extra", "en")],
        "doc_id long, text string, lang string",
    )
    got = {
        (r["probe_id"], r["host_id"]): (r["n_common"], r["containment"])
        for r in containment_pairs(
            df, threshold=0.9, min_tokens=10
        ).collect()
    }
    assert set(got) == {(0, 1), (1, 0)}
    assert got[(0, 1)] == (60, 1.0)           # 0 fully inside 1
    n_c, c = got[(1, 0)]
    assert n_c == 60 and c == pytest.approx(60 / 61)


# ----------------------------------------------------------- readability


def test_readability_hand_counts(spark):
    """'the cat sat. the dog ran!' -> 6 words, 2 sentences, 6
    one-syllable words; 'unbelievable complexity everywhere.' -> long
    words push the FK grade far above the monosyllable doc's."""
    from sparkfeat.text import readability

    df = spark.createDataFrame(
        [
            (1, "the cat sat. the dog ran!"),
            (2, "unbelievable complexity everywhere."),
            (3, ""),
            (4, None),
            (5, "no terminal punctuation here"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in readability(df).collect()}
    r1 = got[1]
    assert r1["n_words"] == 6 and r1["n_sentences"] == 2
    assert r1["n_syllables"] == 6  # all monosyllables by the vowel-group rule
    assert r1["words_per_sentence"] == 3.0
    assert r1["syllables_per_word"] == 1.0
    assert r1["flesch_ease"] == pytest.approx(
        round(206.835 - 1.015 * 3 - 84.6 * 1, 6)
    )
    r2 = got[2]
    # unbelievable: u/e/ie/a/e -> 5; complexity: o/e/i/y -> 4;
    # everywhere: e/e/y/e/e -> 5
    assert r2["n_syllables"] == 14 and r2["n_words"] == 3
    assert r2["fk_grade"] > r1["fk_grade"]
    # degenerate docs: zeros and NULL scores
    for d in (3, 4):
        assert got[d]["n_words"] == 0 and got[d]["n_sentences"] == 0
        assert got[d]["flesch_ease"] is None
    # no terminal punctuation floors sentences at 1
    assert got[5]["n_sentences"] == 1


def test_readability_map_only(spark):
    from sparkfeat.text import readability

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = readability(d)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


# ---------------------------------------------------- threshold curve


def test_dedup_threshold_curve_hand_computed(spark):
    """Hand-built pair table: counts at each threshold are monotone
    non-increasing, dropped docs deduplicate across pairs (a doc in
    two pairs is dropped once, at its MAX similarity level)."""
    from sparkfeat.dedup import dedup_threshold_curve

    pairs = spark.createDataFrame(
        [
            (1, 2, 0.95),  # 2 dropped at level .95
            (1, 3, 0.65),  # 3 dropped at level .65
            (4, 2, 0.55),  # 2 again, lower level -> level stays .95
            (5, 6, 0.85),
        ],
        "id_a long, id_b long, est_jaccard double",
    )
    docs = spark.createDataFrame([(i,) for i in range(1, 11)], "doc_id long")
    got = {
        r["threshold"]: r.asDict()
        for r in dedup_threshold_curve(
            pairs, docs, thresholds=(0.5, 0.7, 0.9)
        ).collect()
    }
    assert got[0.5]["n_pairs"] == 4 and got[0.5]["n_docs_dropped"] == 3
    assert got[0.7]["n_pairs"] == 2 and got[0.7]["n_docs_dropped"] == 2
    assert got[0.9]["n_pairs"] == 1 and got[0.9]["n_docs_dropped"] == 1
    assert got[0.5]["drop_frac"] == 0.3
    # monotone
    ts = sorted(got)
    for a, b in zip(ts, ts[1:]):
        assert got[a]["n_pairs"] >= got[b]["n_pairs"]
        assert got[a]["n_docs_dropped"] >= got[b]["n_docs_dropped"]


def test_dedup_threshold_curve_consistent_with_pipeline_drop(spark):
    """At the prep pipeline's own threshold (0.5) the curve's dropped
    count must equal the distinct id_b set the pipeline drops."""
    from sparkfeat.dedup import dedup_threshold_curve, minhash_lsh_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = minhash_lsh_pairs(
        docs, num_perm=64, bands=16, shingle_n=2
    ).filter(F.col("est_jaccard") >= 0.5)
    want = pairs.select("id_b").distinct().count()
    got = {
        r["threshold"]: r["n_docs_dropped"]
        for r in dedup_threshold_curve(pairs, docs).collect()
    }
    assert got[0.5] == want


# -------------------------------------------------------------- TextRank


def _py_textrank(sents, n_iter=3, d=0.85):
    """Independent reference: same graph, same damped iteration, same
    9-dp canonicalization per round."""
    import math

    toks = [set(s.lower().split()) for s in sents]
    n = len(sents)
    w = {}
    for i in range(n):
        for j in range(i + 1, n):
            den = math.log(len(toks[i])) + math.log(len(toks[j]))
            ov = len(toks[i] & toks[j])
            if den > 0 and ov > 0:
                w[(i, j)] = round(ov / den, 9)
    out = {i: [] for i in range(n)}
    for (i, j), wv in w.items():
        out[i].append((j, wv))
        out[j].append((i, wv))
    wsum = {i: sum(wv for _, wv in out[i]) for i in range(n)}
    r = [1.0 / n] * n
    for _ in range(n_iter):
        nxt = []
        for i in range(n):
            cs = sum(
                r[j] * wv / wsum[j]
                for j, wv in out[i]
            )
            nxt.append(round((1 - d) / n + d * cs, 9))
        r = nxt
    return r


def test_textrank_matches_python_power_iteration(spark):
    from sparkfeat.text import textrank_sentences

    sents = [
        "the cat sat on the mat",
        "the dog chased the cat",
        "a bird flew far away",
        "the cat ran from the dog",
        "mat and dog and cat together",
    ]
    df = spark.createDataFrame(
        [(1, ". ".join(sents) + ".")], "doc_id long, text string"
    )
    got = {
        r["sent_idx"]: r["score"]
        for r in textrank_sentences(df).collect()
    }
    want = _py_textrank(sents)
    for i in range(len(sents)):
        assert got[i] == pytest.approx(want[i], abs=1e-8), i
    # the isolated sentence holds the teleport base, below every
    # connected one
    assert got[2] == min(got.values())


def test_textrank_per_doc_independence_and_degenerates(spark):
    from sparkfeat.text import textrank_sentences

    doc1 = "alpha beta gamma. beta gamma delta. unrelated words here."
    solo = spark.createDataFrame([(1, doc1)], "doc_id long, text string")
    both = spark.createDataFrame(
        [(1, doc1), (2, "totally different text. another different text.")],
        "doc_id long, text string",
    )
    a = {
        r["sent_idx"]: r["score"]
        for r in textrank_sentences(solo).where("doc_id = 1").collect()
    }
    b = {
        r["sent_idx"]: r["score"]
        for r in textrank_sentences(both).where("doc_id = 1").collect()
    }
    assert a == b  # other docs never leak into a doc's graph
    # degenerate docs
    deg = spark.createDataFrame(
        [(3, "one sentence"), (4, None), (5, "")],
        "doc_id long, text string",
    )
    rows = textrank_sentences(deg).collect()
    assert {r["doc_id"] for r in rows} == {3}
    assert rows[0]["rank"] == 1 and rows[0]["score"] == pytest.approx(0.15)


def test_textrank_sentence_cap_bounds_graph(spark):
    from sparkfeat.text import textrank_sentences

    many = ". ".join(f"tok{i} shared word" for i in range(100)) + "."
    df = spark.createDataFrame([(1, many)], "doc_id long, text string")
    rows = textrank_sentences(df, max_sents=16).collect()
    assert len(rows) == 16
    assert all(r["n_sents"] == 16 for r in rows)
