"""corpus_datacard (sparkfeat/report.py): margin arithmetic against
hand-computed values, grouping_id bitmask convention (incl. the
real-NULL-dimension ambiguity gid resolves), null-size handling, and
the one-exchange/no-join plan shape."""

from __future__ import annotations

import pytest

from sparkfeat.report import corpus_datacard


def _docs(spark):
    rows = [
        ("web", "en", "a", 10), ("web", "en", "b", 20),
        ("web", "de", None, 30),
        ("book", "en", "c", None),      # null size: counted, no moments
        ("book", None, "d", 5),          # REAL null lang in a leaf cell
    ]
    return spark.createDataFrame(
        rows, "source string, lang string, text string, n_chars int"
    )


def _key(r):
    return (r["gid"], r["source"], r["lang"])


def test_rollup_margins_hand_computed(spark):
    got = {_key(r): r for r in corpus_datacard(_docs(spark)).collect()}
    # leaf cells: gid 0
    leaf = got[(0, "web", "en")]
    assert (leaf["n_docs"], leaf["n_chars"], leaf["avg_chars"]) == (2, 30, 15.0)
    assert (leaf["min_chars"], leaf["max_chars"]) == (10, 20)
    assert leaf["n_null_text"] == 0 and leaf["null_text_frac"] == 0.0
    # the REAL-null-lang leaf is gid 0 with lang NULL — distinguishable
    # from the rolled-up margin (book, NULL) at gid 1
    real_null = got[(0, "book", None)]
    assert real_null["n_docs"] == 1 and real_null["n_chars"] == 5
    book_margin = got[(1, "book", None)]
    assert book_margin["n_docs"] == 2       # c + d
    assert book_margin["n_chars"] == 5      # null size skipped in sum
    assert book_margin["min_chars"] == 5 and book_margin["max_chars"] == 5
    # per-source margin for web: 3 docs, one null text
    web = got[(1, "web", None)]
    assert (web["n_docs"], web["n_chars"], web["n_null_text"]) == (3, 60, 1)
    assert web["null_text_frac"] == pytest.approx(round(1 / 3, 6))
    # grand total: gid 3
    tot = got[(3, None, None)]
    assert (tot["n_docs"], tot["n_chars"]) == (5, 65)
    assert tot["avg_chars"] == pytest.approx(round(65 / 4, 6))  # null skipped
    # row count: 4 leaves + 2 source margins + 1 total
    assert len(got) == 7


def test_null_size_cell_moments_are_null(spark):
    got = {_key(r): r for r in corpus_datacard(_docs(spark)).collect()}
    cell = got[(0, "book", "en")]
    assert cell["n_docs"] == 1
    assert cell["n_chars"] is None and cell["avg_chars"] is None
    assert cell["min_chars"] is None and cell["max_chars"] is None


def test_plan_one_exchange_no_join(spark):
    from tests.test_plans import n_shuffles, plan_of

    out = corpus_datacard(_docs(spark))
    assert n_shuffles(out) == 1, plan_of(out)
    p = plan_of(out)
    assert "Join" not in p and "Window" not in p, p
    assert "Expand" in p, p  # the map-side grouping-set expansion


def test_build_is_lazy(spark):
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup() or [])
    corpus_datacard(_docs(spark))
    after = len(tracker.getJobIdsForGroup() or [])
    assert before == after


def _snap(spark):
    from sparkfeat.report import snapshot_diff

    old = spark.createDataFrame(
        [(1, "web", "a"), (2, "web", "b"), (3, "book", "c"),
         (4, "book", None), (5, "web", "e")],
        "doc_id int, source string, text string",
    )
    new = spark.createDataFrame(
        [(1, "web", "a"),            # unchanged
         (2, "web", "b2"),           # changed
         (4, "book", "d-now"),       # changed (was NULL text)
         (5, "web", None),           # changed (now NULL text)
         (6, "news", "f")],          # added; doc 3 removed
        "doc_id int, source string, text string",
    )
    return snapshot_diff(old, new)


def test_snapshot_diff_statuses(spark):
    got = {r["doc_id"]: (r["status"], r["source"]) for r in _snap(spark).collect()}
    assert got == {
        1: ("unchanged", "web"),
        2: ("changed", "web"),
        3: ("removed", "book"),   # carry falls back to the old side
        4: ("changed", "book"),   # NULL -> value is a change, not a crash
        5: ("changed", "web"),    # value -> NULL likewise
        6: ("added", "news"),
    }


def test_snapshot_null_ambiguity_guard(spark):
    """('a', NULL) vs (NULL, 'a') must NOT collide: the sentinel-coded
    fingerprint distinguishes them where concat_ws would not."""
    from sparkfeat.report import snapshot_diff

    old = spark.createDataFrame(
        [(1, "s", "a", None)], "doc_id int, source string, t1 string, t2 string"
    )
    new = spark.createDataFrame(
        [(1, "s", None, "a")], "doc_id int, source string, t1 string, t2 string"
    )
    got = snapshot_diff(old, new, compare_cols=("t1", "t2")).collect()
    assert got[0]["status"] == "changed"


def test_snapshot_churn(spark):
    from sparkfeat.report import snapshot_churn

    got = {r["source"]: r for r in snapshot_churn(_snap(spark)).collect()}
    web = got["web"]
    assert (web["n_added"], web["n_removed"], web["n_changed"],
            web["n_unchanged"]) == (0, 0, 2, 1)
    assert web["churn_frac"] == pytest.approx(round(2 / 3, 6))
    assert got["news"]["n_added"] == 1 and got["news"]["churn_frac"] == 1.0
    book = got["book"]
    assert (book["n_removed"], book["n_changed"]) == (1, 1)


def test_snapshot_diff_plan_narrow_join(spark):
    """The join must shuffle (id, fp, carry) projections — the text
    column may not survive into either exchange."""
    from tests.test_plans import plan_of

    p = plan_of(_snap(spark))
    assert "CartesianProduct" not in p, p
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p or "BroadcastHashJoin" in p, p
    import re
    for ex in re.findall(r"Exchange hashpartitioning\[[^\]]*\]", p):
        assert "text" not in ex, p


def test_incremental_update_equals_full_recompute_and_carries(spark):
    """The law: incremental == feature_fn(new) row-for-row; AND
    sentinel-poisoned old rows for unchanged docs survive (the carry
    path reads the old table, it does not silently recompute)."""
    import pyspark.sql.functions as F

    from sparkfeat.report import incremental_update, snapshot_diff

    old = spark.createDataFrame(
        [(1, "s", "aa"), (2, "s", "bb"), (3, "s", "cc")],
        "doc_id int, source string, text string",
    )
    new = spark.createDataFrame(
        [(1, "s", "aa"), (2, "s", "bb-changed"), (4, "s", "dddd")],
        "doc_id int, source string, text string",
    )

    def features(docs):
        return docs.select("doc_id", F.length("text").alias("n_chars"))

    diff = snapshot_diff(old, new)
    # poison: unchanged doc 1 gets a sentinel feature value; if the
    # operator recomputed it, the sentinel would be lost
    old_feats = spark.createDataFrame(
        [(1, -777), (2, 2), (3, 2)], "doc_id int, n_chars int"
    )
    got = {
        r["doc_id"]: r["n_chars"]
        for r in incremental_update(diff, old_feats, new, features).collect()
    }
    assert got == {1: -777, 2: 10, 4: 4}  # carried sentinel, 2 fresh, 3 gone
    # with truthful old features the law holds exactly
    honest = features(old)
    got2 = {
        r["doc_id"]: r["n_chars"]
        for r in incremental_update(diff, honest, new, features).collect()
    }
    want = {r["doc_id"]: r["n_chars"] for r in features(new).collect()}
    assert got2 == want


def test_incremental_update_plan_semi_gates(spark):
    import pyspark.sql.functions as F

    from sparkfeat.report import incremental_update, snapshot_diff
    from tests.test_plans import plan_of

    old = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit("s").alias("source"),
        F.col("id").cast("string").alias("text"),
    )
    new = old.withColumn(
        "text", F.when(F.col("doc_id") % 3 == 0, F.lit("x")).otherwise(F.col("text"))
    )
    diff = snapshot_diff(old, new)
    out = incremental_update(
        diff, old.select("doc_id", F.length("text").alias("n")), new,
        lambda d: d.select("doc_id", F.length("text").alias("n")),
    )
    p = plan_of(out)
    assert p.count("LeftSemi") == 2, p
    assert "CartesianProduct" not in p, p
