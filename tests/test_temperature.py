"""temperature_weights (sparkfeat/corpus.py): the α-limit identities
(α=1 → natural shares, α=0 → uniform), the flattening direction for
0<α<1 (head compressed, tail lifted — the whole point of the rule),
normalization, zero-token exclusion, and laziness."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from sparkfeat.corpus import temperature_weights


def _docs(spark):
    # token masses 7000 / 2000 / 1000 => p = .7 / .2 / .1
    rows = (
        [("a", 70) for _ in range(100)]
        + [("b", 20) for _ in range(100)]
        + [("c", 10) for _ in range(100)]
        + [("empty", 0) for _ in range(5)]
    )
    return spark.createDataFrame(rows, "source string, n_tok int")


def _by_source(df):
    return {r["source"]: r.asDict() for r in df.collect()}


def test_alpha_one_reproduces_natural_shares(spark):
    got = _by_source(temperature_weights(_docs(spark), alpha=1.0))
    assert got["a"]["q_temp"] == got["a"]["p_raw"] == 0.7
    assert got["b"]["q_temp"] == 0.2 and got["c"]["q_temp"] == 0.1
    assert all(abs(v["oversample"] - 1.0) < 1e-6 for v in got.values())


def test_alpha_zero_is_uniform(spark):
    got = _by_source(temperature_weights(_docs(spark), alpha=0.0))
    assert all(abs(v["q_temp"] - 1 / 3) < 1e-5 for v in got.values())


def test_fractional_alpha_flattens(spark):
    """0<α<1 must compress the head and lift the tail, keep the rank
    order, and stay normalized; oversample >1 exactly for tail groups."""
    got = _by_source(temperature_weights(_docs(spark), alpha=0.3))
    assert got["a"]["q_temp"] < got["a"]["p_raw"]
    assert got["c"]["q_temp"] > got["c"]["p_raw"]
    assert got["a"]["q_temp"] > got["b"]["q_temp"] > got["c"]["q_temp"]
    assert abs(sum(v["q_temp"] for v in got.values()) - 1.0) < 3e-6
    assert got["a"]["oversample"] < 1.0 < got["c"]["oversample"]


def test_zero_token_groups_excluded(spark):
    got = _by_source(temperature_weights(_docs(spark), alpha=0.3))
    assert set(got) == {"a", "b", "c"}


def test_build_is_lazy(spark):
    """Constructing the plan must not fire a Spark job (the
    mixture_sample eager-count lesson from round 4)."""
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup() or [])
    temperature_weights(_docs(spark), alpha=0.3)
    after = len(tracker.getJobIdsForGroup() or [])
    assert before == after


def test_mixture_sample_from_composition(spark):
    """temperature_weights → mixture_sample_from composes in ONE lazy
    plan: rates follow q·frac·N/n_g with the waterfilling cap, groups
    missing from the weights get rate 0, and the kept fraction tracks
    the rate."""
    from sparkfeat.corpus import mixture_sample_from, temperature_weights

    rows = (
        [("big", i, 100) for i in range(2000)]
        + [("small", 10_000 + i, 100) for i in range(100)]
        + [("zero", 20_000 + i, 0) for i in range(50)]  # no token mass
    )
    docs = spark.createDataFrame(rows, "source string, doc_id long, n_tok int")
    w = temperature_weights(docs, alpha=0.3, group_col="source")
    out = mixture_sample_from(
        docs, w, frac=0.3, group_col="source", id_col="doc_id"
    )
    rows_out = out.collect()
    by = {}
    for r in rows_out:
        by.setdefault(r["source"], []).append(r)
    # temperature lifts the tail: the small group's rate caps at 1.0
    # (its q share times the budget exceeds its size)
    assert by["small"][0]["rate"] == 1.0
    assert all(r["keep"] for r in by["small"])
    # the big group is downsampled: 0 < rate < 1, kept fraction ~ rate
    rate_big = by["big"][0]["rate"]
    assert 0.0 < rate_big < 1.0
    kept = sum(r["keep"] for r in by["big"]) / len(by["big"])
    assert kept == pytest.approx(rate_big, abs=0.03)
    # zero-token source is absent from the weights -> rate 0, none kept
    assert all(r["rate"] == 0.0 and not r["keep"] for r in by["zero"])


def test_mixture_sample_from_is_lazy(spark):
    from sparkfeat.corpus import mixture_sample_from, temperature_weights

    docs = _docs(spark)
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup() or [])
    w = temperature_weights(docs, alpha=0.3)
    mixture_sample_from(docs, w, group_col="source", id_col="n_tok")
    after = len(tracker.getJobIdsForGroup() or [])
    assert before == after


# ---------------------------------------------------------------------------
# unimax_allocation — budgeted water-filling mixture
# ---------------------------------------------------------------------------


def _unimax(spark, sizes, budget=None, frac=None, e=1.0):
    from sparkfeat.corpus import unimax_allocation

    docs = spark.createDataFrame(
        [(g, n) for g, n in sizes.items()], "source string, n_tok long"
    )
    return {
        r.source: r
        for r in unimax_allocation(
            docs, budget=budget, budget_frac=frac, max_epochs=e
        ).collect()
    }


def test_unimax_hand_computed_waterline(spark):
    # caps [10, 20, 100, 200], B=100: a,b capped; waterline
    # (100-30)/2 = 35 shared by c,d; budget exactly consumed
    got = _unimax(spark, {"a": 10, "b": 20, "c": 100, "d": 200}, budget=100)
    assert (got["a"].alloc, got["b"].alloc) == (10.0, 20.0)
    assert got["c"].alloc == got["d"].alloc == 35.0
    assert got["a"].capped == 1 and got["c"].capped == 0
    assert got["c"].waterline == 35.0 and got["c"].budget_used == 100.0
    assert got["c"].epochs == 0.35 and got["a"].epochs == 1.0


def test_unimax_budget_covers_everything(spark):
    # B >= sum(caps): every group at its cap, no waterline, surplus
    # honestly reported via budget_used < B
    got = _unimax(spark, {"a": 10, "b": 20}, budget=1000, e=2.0)
    assert got["a"].alloc == 20.0 and got["b"].alloc == 40.0
    assert got["a"].waterline is None and got["a"].budget_used == 60.0


def test_unimax_no_group_capped_uniform_split(spark):
    # tiny budget: nobody reaches cap, everyone gets B/k
    got = _unimax(spark, {"a": 100, "b": 100, "c": 100}, budget=30)
    assert all(r.alloc == 10.0 and r.capped == 0 for r in got.values())


def test_unimax_epoch_cap_and_frac_budget(spark):
    # frac path: B = 0.5 * 330 = 165, e=1 -> a,b capped at 10/20,
    # waterline (165-30)/2 = 67.5
    got = _unimax(spark, {"a": 10, "b": 20, "c": 100, "d": 200}, frac=0.5)
    assert got["c"].alloc == 67.5 and got["c"].waterline == 67.5
    assert got["a"].budget_used == 165.0
    # epoch cap binds: e=0.5 halves every cap
    got2 = _unimax(spark, {"a": 10, "b": 20}, budget=1000, e=0.5)
    assert got2["a"].alloc == 5.0 and got2["b"].alloc == 10.0


def test_unimax_exactly_one_budget_arg(spark):
    import pytest as _pt

    from sparkfeat.corpus import unimax_allocation

    docs = spark.createDataFrame([("a", 10)], "source string, n_tok long")
    with _pt.raises(ValueError):
        unimax_allocation(docs)
    with _pt.raises(ValueError):
        unimax_allocation(docs, budget=10.0, budget_frac=0.5)
