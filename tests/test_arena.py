"""bt_strengths / winrate_matrix (sparkfeat/arena.py): parity with an
independent pure-python MM implementation, planted-strength order
recovery, log-likelihood monotonicity across iterations, prior
degeneracy guard, and Wilson-bound closed-form checks."""

from __future__ import annotations

import math

import pytest

from sparkfeat.arena import bt_strengths, winrate_matrix


def _py_bt(matches, n_iter=5, prior=0.1):
    """Independent reference: same MM update, same mean-1 gauge, same
    9 dp canonicalization, written from the Hunter 2004 paper not from
    the Spark code. ``matches`` = {(a, b): wins_of_a_over_b}."""
    players = sorted({p for ab in matches for p in ab})
    obs = {}  # ordered observed pairs with directed int wins
    for (a, b), w in matches.items():
        obs[(a, b)] = obs.get((a, b), 0) + w
        obs.setdefault((b, a), 0)
    W = {p: 0.0 for p in players}
    opp = {p: set() for p in players}
    for (a, b), w in obs.items():
        W[a] += w
        opp[a].add(b)
    for p in players:
        W[p] += prior * len(opp[p])
    s = {p: 1.0 for p in players}
    for _ in range(n_iter):
        d = {}
        for p in players:
            d[p] = sum(
                (obs[(p, q)] + obs[(q, p)] + 2 * prior) / (s[p] + s[q])
                for q in opp[p]
            )
        raw = {p: W[p] / d[p] for p in players}
        tot = sum(raw.values())
        s = {p: round(raw[p] * len(players) / tot, 9) for p in players}
    return s


def _loglik(matches, s):
    return sum(
        w * math.log(s[a] / (s[a] + s[b])) for (a, b), w in matches.items() if w
    )


MATCHES = {
    ("gpt", "llama"): 30, ("llama", "gpt"): 10,
    ("gpt", "mistral"): 25, ("mistral", "gpt"): 15,
    ("llama", "mistral"): 22, ("mistral", "llama"): 18,
    ("gpt", "tiny"): 12, ("tiny", "gpt"): 1,
    ("mistral", "tiny"): 9, ("tiny", "mistral"): 3,
}


def _judgments(spark, matches=MATCHES):
    rows = [(a, b) for (a, b), w in matches.items() for _ in range(w)]
    return spark.createDataFrame(rows, "winner string, loser string")


def test_matches_independent_mm_reference(spark):
    got = {
        r["player"]: (r["wins"], r["games"], r["strength"])
        for r in bt_strengths(_judgments(spark)).collect()
    }
    want_s = _py_bt(MATCHES)
    assert set(got) == set(want_s)
    for p, s in want_s.items():
        assert got[p][2] == pytest.approx(s, abs=1e-9), p
    # integer audit columns are exact
    assert got["gpt"][0] == 30 + 25 + 12
    assert got["gpt"][1] == 40 + 40 + 13
    assert got["tiny"][0] == 4 and got["tiny"][1] == 25


def test_planted_order_recovered(spark):
    got = bt_strengths(_judgments(spark)).collect()
    order = [r["player"] for r in sorted(got, key=lambda r: -r["strength"])]
    # gpt dominates everyone; tiny loses nearly everything; mistral
    # edges llama DESPITE losing their head-to-head 18-22 — its 15/40
    # vs gpt beats llama's 10/40 against the strongest opponent, which
    # BT weighs more than the close direct cell (fixed point:
    # mistral 0.892 vs llama 0.874). Exactly the strength-of-schedule
    # correction a raw win-rate leaderboard can't make.
    assert order == ["gpt", "mistral", "llama", "tiny"]


def test_loglik_monotone_in_iterations(spark):
    """MM is an ascent algorithm: likelihood at n_iter=k+2 >= at k."""
    j = _judgments(spark)
    lls = []
    for it in (1, 3, 5):
        s = {r["player"]: r["strength"] for r in
             bt_strengths(j, n_iter=it).collect()}
        lls.append(_loglik(MATCHES, s))
    assert lls[0] <= lls[1] + 1e-12 and lls[1] <= lls[2] + 1e-12
    # and 5 iterations is near the fixed point: one more barely moves it
    s6 = {r["player"]: r["strength"] for r in
          bt_strengths(j, n_iter=6).collect()}
    s5 = {r["player"]: r["strength"] for r in
          bt_strengths(j, n_iter=5).collect()}
    assert max(abs(s6[p] - s5[p]) for p in s5) < 0.02


def test_zero_win_player_stays_finite(spark):
    """A player with zero wins has a divergent raw MLE; the prior keeps
    the strength positive, finite, and strictly smallest."""
    m = {("a", "b"): 5, ("b", "c"): 5, ("a", "c"): 7}
    got = {r["player"]: r for r in bt_strengths(_judgments(spark, m)).collect()}
    assert got["c"]["wins"] == 0
    assert 0.0 < got["c"]["strength"] < got["b"]["strength"]
    assert got["a"]["strength"] == max(r["strength"] for r in got.values())


def test_nulls_and_self_play_dropped(spark):
    rows = [("a", "b")] * 3 + [("b", "a")] * 1 + [
        ("a", None), (None, "b"), ("a", "a"), ("b", "b"),
    ]
    df = spark.createDataFrame(rows, "winner string, loser string")
    got = {r["player"]: r for r in bt_strengths(df).collect()}
    assert set(got) == {"a", "b"}
    assert got["a"]["wins"] == 3 and got["a"]["games"] == 4
    assert got["a"]["strength"] > got["b"]["strength"]


def test_winrate_matrix_wilson(spark):
    got = {(r["a"], r["b"]): r for r in
           winrate_matrix(_judgments(spark)).collect()}
    cell = got[("gpt", "llama")]
    assert cell["wins"] == 30 and cell["games"] == 40
    assert cell["win_rate"] == 0.75
    # textbook Wilson lower bound at z=1.96
    p, n, z = 0.75, 40.0, 1.96
    lb = (p + z * z / (2 * n) - z * math.sqrt(
        p * (1 - p) / n + z * z / (4 * n * n))) / (1 + z * z / n)
    assert cell["wilson_lb"] == pytest.approx(round(lb, 6), abs=1e-6)
    # the mirror cell complements the rate and both directions exist
    mirror = got[("llama", "gpt")]
    assert mirror["wins"] == 10 and mirror["games"] == 40
    assert mirror["win_rate"] == 0.25
    # rank-by-bound beats rank-by-rate: 1/1 must not outrank 30/40
    m = {("x", "y"): 1, ("gpt", "llama"): 30, ("llama", "gpt"): 10}
    g2 = {(r["a"], r["b"]): r for r in
          winrate_matrix(_judgments(spark, m)).collect()}
    assert g2[("x", "y")]["win_rate"] == 1.0
    assert g2[("x", "y")]["wilson_lb"] < g2[("gpt", "llama")]["wilson_lb"]


def test_build_is_lazy(spark):
    j = _judgments(spark)
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup() or [])
    bt_strengths(j)
    winrate_matrix(j)
    after = len(tracker.getJobIdsForGroup() or [])
    assert before == after


# ---------------------------------------------------------------------------
# rater_agreement (pairwise Cohen's kappa)
# ---------------------------------------------------------------------------


def _judg(spark, rows):
    return spark.createDataFrame(
        rows, "item_id bigint, rater_id string, label string"
    )


def test_kappa_hand_computed(spark):
    from sparkfeat.arena import rater_agreement

    # A: g on 1-5, b on 6-10; B agrees on 8, flips items 5 and 10
    rows = []
    for i in range(1, 11):
        a = "g" if i <= 5 else "b"
        rows.append((i, "A", a))
        b = {5: "b", 10: "g"}.get(i, a)
        rows.append((i, "B", b))
    out = rater_agreement(_judg(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["rater_a"], r["rater_b"]) == ("A", "B")
    assert r["n_shared"] == 10 and r["n_agree"] == 8
    # marginals: A g5 b5; B g5 b5 -> pe = .5; po = .8 -> kappa = .6
    assert r["po"] == 0.8 and r["pe"] == 0.5
    assert abs(r["kappa"] - 0.6) < 1e-9


def test_kappa_perfect_and_degenerate(spark):
    from sparkfeat.arena import rater_agreement

    # perfect agreement with label variety -> kappa = 1
    rows = [(i, r, "g" if i % 2 else "b") for i in range(1, 9) for r in "AB"]
    r = rater_agreement(_judg(spark, rows)).collect()[0]
    assert r["kappa"] == 1.0 and r["po"] == 1.0
    # both raters constant on one label -> pe = 1 -> kappa undefined
    rows = [(i, r, "g") for i in range(1, 9) for r in "AB"]
    r = rater_agreement(_judg(spark, rows)).collect()[0]
    assert r["pe"] == 1.0 and r["kappa"] is None


def test_kappa_pairs_nulls_and_min_shared(spark):
    from sparkfeat.arena import rater_agreement

    rows = [(i, r, "g") for i in range(1, 6) for r in "ABC"]
    rows += [(99, "A", None), (98, "B", None)]  # null labels drop
    out = rater_agreement(_judg(spark, rows))
    got = {(r["rater_a"], r["rater_b"]): r for r in out.collect()}
    assert set(got) == {("A", "B"), ("A", "C"), ("B", "C")}
    assert all(r["n_shared"] == 5 for r in got.values())
    # min_shared gate
    assert rater_agreement(_judg(spark, rows), min_shared=6).count() == 0


def test_kappa_partial_overlap_counts_shared_items_only(spark):
    from sparkfeat.arena import rater_agreement

    rows = [(i, "A", "g") for i in range(1, 8)]
    rows += [(i, "B", "g" if i <= 4 else "b") for i in range(3, 10)]
    r = rater_agreement(_judg(spark, rows)).collect()[0]
    # shared items: 3..7 -> 5; agree on 3,4
    assert r["n_shared"] == 5 and r["n_agree"] == 2


# ---------------------------------------------------------------------------
# fleiss_kappa (fixed-panel multi-rater agreement)
# ---------------------------------------------------------------------------


def _fj(spark, items):
    """items: {item_id: list of (rater, label)}"""
    rows = [
        (i, r, l) for i, rls in items.items() for (r, l) in rls
    ]
    return spark.createDataFrame(
        rows, "item_id bigint, rater_id string, label string"
    )


def test_fleiss_hand_computed(spark):
    from sparkfeat.arena import fleiss_kappa

    items = {
        1: [("A", "g"), ("B", "g"), ("C", "g")],   # 3-0 -> sq 9
        2: [("A", "g"), ("B", "g"), ("C", "b")],   # 2-1 -> sq 5
        3: [("A", "g"), ("B", "b"), ("C", "b")],   # 1-2 -> sq 5
        4: [("A", "b"), ("B", "b"), ("C", "b")],   # 0-3 -> sq 9
    }
    out = {r["label"]: r for r in fleiss_kappa(_fj(spark, items), m=3).collect()}
    r = out["g"]
    assert r["n_items"] == 4 and r["n_label"] == 6
    assert abs(r["p_label"] - 0.5) < 1e-9
    # P_bar = (28 - 12) / 24; Pe = .5 -> kappa = (.666667-.5)/.5
    assert abs(r["p_bar"] - 16 / 24) < 1e-6
    assert abs(r["p_e"] - 0.5) < 1e-9
    assert abs(r["kappa"] - (round(16 / 24, 6) - 0.5) / 0.5) < 1e-9


def test_fleiss_exact_panel_gate(spark):
    from sparkfeat.arena import fleiss_kappa

    items = {
        1: [("A", "g"), ("B", "g"), ("C", "g")],
        2: [("A", "g"), ("B", "g")],                     # only 2 raters: drop
        3: [("A", "g"), ("A", "g"), ("B", "g")],          # dup rater: drop
        4: [("A", "b"), ("B", "b"), ("C", "b")],
    }
    out = fleiss_kappa(_fj(spark, items), m=3).collect()
    assert all(r["n_items"] == 2 for r in out)
    # perfect agreement on the surviving items, both labels present
    assert all(r["p_bar"] == 1.0 and r["kappa"] == 1.0 for r in out)


def test_fleiss_constant_raters_degenerate(spark):
    from sparkfeat.arena import fleiss_kappa

    items = {i: [("A", "g"), ("B", "g"), ("C", "g")] for i in range(1, 6)}
    out = fleiss_kappa(_fj(spark, items), m=3).collect()
    assert len(out) == 1
    r = out[0]
    assert r["p_e"] == 1.0 and r["kappa"] is None  # undefined, like Cohen


# ---------------------------------------------------------------------------
# Krippendorff's alpha (arena.krippendorff_alpha)
# ---------------------------------------------------------------------------


def _alpha_ref(items):
    """Direct-formula nominal alpha over a list of per-item label
    lists (Krippendorff 2004, coincidence-matrix form)."""
    from collections import Counter

    pair = [it for it in items if len(it) >= 2]
    n = sum(len(it) for it in pair)
    ao = 0.0
    nc: Counter = Counter()
    for it in pair:
        cnt = Counter(it)
        ao += sum(c * (c - 1) for c in cnt.values()) / (len(it) - 1)
        nc.update(cnt)
    de_num = n * n - sum(v * v for v in nc.values())
    if de_num <= 0:
        return None
    return 1.0 - (n - ao) * (n - 1) / de_num


def _alpha_spark(spark, items, **kw):
    from sparkfeat.arena import krippendorff_alpha

    rows = [
        (i, f"r{k}", lab)
        for i, it in enumerate(items)
        for k, lab in enumerate(it)
    ]
    df = spark.createDataFrame(
        rows, "item_id long, rater_id string, label string"
    )
    return krippendorff_alpha(df, **kw).collect()


def test_alpha_matches_direct_formula(spark):
    """Ragged panel (1-4 raters per item, missing data everywhere) —
    the case Fleiss can't score at all — matches the direct-formula
    reference to 6 dp."""
    items = [
        ["a", "a", "b"],
        ["a", "a"],
        ["b", "b", "b", "b"],
        ["a", "b"],
        ["b"],          # unpairable: excluded
        [],             # no judgments: excluded
        ["a", "a", "a"],
        ["b", "a", "b"],
    ]
    got = _alpha_spark(spark, items)
    want = _alpha_ref(items)
    assert got, "no output rows"
    assert got[0]["alpha"] == pytest.approx(want, abs=1e-6)
    # pairable = 6 items, n = 3+2+4+2+3+3 = 17
    assert got[0]["n_items"] == 6
    assert got[0]["n_judgments"] == 17
    # constants ride every label row
    assert len({r["alpha"] for r in got}) == 1


def test_alpha_perfect_and_degenerate(spark):
    # unanimous two-label data → alpha 1
    got = _alpha_spark(spark, [["a", "a", "a"], ["b", "b"], ["a", "a"]])
    assert all(r["alpha"] == pytest.approx(1.0, abs=1e-9) for r in got)
    # single label everywhere → d_e = 0 → alpha null
    got = _alpha_spark(spark, [["a", "a"], ["a", "a", "a"]])
    assert all(r["alpha"] is None for r in got)


def test_alpha_oversize_panels_excluded(spark):
    """Items with more judgments than max_raters fall outside the
    lcm-exact range and are excluded, not mis-scored."""
    items = [["a", "a"], ["a", "b"], ["a"] * 9]  # 9 > max_raters=8
    got = _alpha_spark(spark, items)
    assert got[0]["n_items"] == 2
    assert got[0]["n_judgments"] == 4
    want = _alpha_ref(items[:2])
    assert got[0]["alpha"] == pytest.approx(want, abs=1e-6)


def test_alpha_keeps_items_fleiss_drops(spark):
    """The 85%-coverage synthetic stream: alpha's pairable gate keeps
    strictly more items than Fleiss' exact-3 gate."""
    from sparkfeat.arena import fleiss_kappa, krippendorff_alpha

    rows = []
    for i in range(60):
        labs = ["good" if (i + k) % 3 else "bad" for k in range(3)]
        # rater k skips items where (i*7+k) % 5 == 0 → ragged panel
        rows += [
            (i, f"r{k}", labs[k])
            for k in range(3)
            if (i * 7 + k) % 5 != 0
        ]
    df = spark.createDataFrame(
        rows, "item_id long, rater_id string, label string"
    )
    a = krippendorff_alpha(df).collect()
    f = fleiss_kappa(df, m=3).collect()
    assert a[0]["n_items"] > f[0]["n_items"]


# ---------------------------------------------------------------------------
# transitivity_audit — cyclic-preference census
# ---------------------------------------------------------------------------


def _tri(spark, judgments, **kw):
    from sparkfeat.arena import transitivity_audit

    df = spark.createDataFrame(judgments, "winner string, loser string")
    return transitivity_audit(df, **kw).collect()


def test_transitivity_rps_cycle_vs_dominant_player(spark):
    # a>b, b>c, c>a cycle (with one dissenting a<b judgment outvoted);
    # d dominates everyone -> 4 triangles, exactly 1 cyclic
    j = (
        [("a", "b")] * 3 + [("b", "a")] + [("b", "c")] * 2
        + [("c", "a")] * 2 + [("d", "a")] * 2 + [("d", "b")] * 2
        + [("d", "c")] * 2
    )
    rows = {(r.player_x, r.player_y, r.player_z): r for r in _tri(spark, j)}
    assert len(rows) == 4
    assert rows[("a", "b", "c")].cyclic == 1
    assert sum(r.cyclic for r in rows.values()) == 1
    any_row = rows[("a", "b", "c")]
    assert any_row.n_triangles == 4 and any_row.n_cyclic == 1
    assert any_row.cyclic_rate == 0.25
    assert any_row.n_pairs_decided == 6 and any_row.n_players == 4
    # both rotations of the cycle detect: reverse every edge
    rev = [(l, w) for w, l in j]
    rows_r = {(r.player_x, r.player_y, r.player_z): r for r in _tri(spark, rev)}
    assert rows_r[("a", "b", "c")].cyclic == 1
    assert sum(r.cyclic for r in rows_r.values()) == 1


def test_transitivity_tied_pair_breaks_triangle(spark):
    # a-b exactly tied -> pair undecided -> the only triple never forms
    j = [("a", "b"), ("b", "a"), ("b", "c"), ("a", "c")]
    assert _tri(spark, j) == []


def test_transitivity_min_games_gate(spark):
    # each pair decided on a single judgment; min_games=2 excludes all
    j = [("a", "b"), ("b", "c"), ("c", "a")]
    assert len(_tri(spark, j)) == 1  # the cycle, at min_games=1
    assert _tri(spark, j, min_games=2) == []


def test_copeland_hand_computed_with_tie_and_cycle(spark):
    from sparkfeat.arena import copeland_ranking

    # d beats everyone (3 wins); a/b/c in a cycle (1 win 1 loss each
    # within the cycle, all lose to d); e-f exactly tied
    j = (
        [("a", "b")] * 2 + [("b", "c")] * 2 + [("c", "a")] * 2
        + [("d", "a")] + [("d", "b")] + [("d", "c")]
        + [("e", "f"), ("f", "e")]
    )
    df = spark.createDataFrame(j, "winner string, loser string")
    rows = {r.player: r for r in copeland_ranking(df).collect()}
    assert rows["d"].copeland == 3.0 and rows["d"].rank == 1
    # cycle members share the score — Copeland is honest about cycles
    assert rows["a"].copeland == rows["b"].copeland == rows["c"].copeland == 1.0
    assert rows["e"].copeland == rows["f"].copeland == 0.5
    assert rows["e"].maj_ties == 1 and rows["e"].maj_wins == 0
    # deterministic name tie-break inside equal scores
    assert [rows[p].rank for p in ["a", "b", "c"]] == [2, 3, 4]
    assert rows["a"].n_players == 6


def test_copeland_min_games_drops_thin_pairs(spark):
    from sparkfeat.arena import copeland_ranking

    df = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("a", "c")], "winner string, loser string"
    )
    rows = {r.player: r for r in copeland_ranking(df, min_games=2).collect()}
    # a-c pair (1 game) vanishes entirely; c never appears
    assert set(rows) == {"a", "b"}
    assert rows["a"].copeland == 1.0 and rows["a"].n_pairs == 1


# ------------------------------------------------------ bootstrap CI


def _boot_stream(spark, n=400, p_num=3, p_den=5):
    """Deterministic stream: a wins on a fixed residue pattern
    (p_num/p_den of judgments)."""
    rows = [("m1", "m2", t, (t * 7919) % p_den < p_num) for t in range(n)]
    return spark.createDataFrame(rows, "a string, b string, t int, a_won boolean")


def test_bootstrap_ci_is_deterministic_and_brackets_the_rate(spark):
    from sparkfeat.arena import bootstrap_winrate_ci

    df = _boot_stream(spark, n=400)
    r1 = bootstrap_winrate_ci(df, n_boot=100).collect()[0].asDict()
    r2 = bootstrap_winrate_ci(df, n_boot=100).collect()[0].asDict()
    assert r1 == r2  # hash-derived weights: no RNG state anywhere
    assert r1["n_judgments"] == 400
    assert r1["win_rate"] == pytest.approx(0.6, abs=0.01)
    assert r1["ci_lo"] < r1["win_rate"] < r1["ci_hi"]
    # a 95% CI on 400 Bernoulli(0.6) draws is roughly ±2*sqrt(pq/n) ≈ ±0.049
    assert 0.05 < r1["ci_width"] < 0.2
    assert r1["n_boot"] == 100


def test_bootstrap_ci_narrows_with_sample_size(spark):
    from sparkfeat.arena import bootstrap_winrate_ci

    small = bootstrap_winrate_ci(_boot_stream(spark, n=100), n_boot=100)
    large = bootstrap_winrate_ci(_boot_stream(spark, n=1600), n_boot=100)
    ws = small.collect()[0]["ci_width"]
    wl = large.collect()[0]["ci_width"]
    assert wl < ws  # 16x the data -> ~4x narrower; strictly less is the pin


def test_bootstrap_seed_changes_resamples_not_the_story(spark):
    from sparkfeat.arena import bootstrap_winrate_ci

    df = _boot_stream(spark, n=400)
    a = bootstrap_winrate_ci(df, n_boot=100, seed="s1").collect()[0].asDict()
    b = bootstrap_winrate_ci(df, n_boot=100, seed="s2").collect()[0].asDict()
    assert a["win_rate"] == b["win_rate"]  # point estimate is seed-free
    assert (a["ci_lo"], a["ci_hi"]) != (b["ci_lo"], b["ci_hi"])  # resamples differ
    # both seeds bracket the truth
    for r in (a, b):
        assert r["ci_lo"] < 0.6 < r["ci_hi"]


def test_bootstrap_poisson_weights_mean_one(spark):
    """The integer inverse-CDF ladder must draw ~Poisson(1): across a
    large deterministic draw the mean weight sits near 1 and the zero
    fraction near e^-1."""
    import math

    from pyspark.sql import functions as F

    from sparkfeat.arena import POISSON1_MILLIONTHS

    df = spark.range(20000).select(
        (
            F.conv(
                F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10
            ).cast("bigint")
            % 1000000
        ).alias("bkt")
    )
    w = F.lit(7)
    for k in range(len(POISSON1_MILLIONTHS) - 1, -1, -1):
        w = F.when(F.col("bkt") < POISSON1_MILLIONTHS[k], F.lit(k)).otherwise(w)
    got = df.select(
        F.avg(w).alias("mean_w"),
        F.avg((w == 0).cast("double")).alias("zero_frac"),
    ).collect()[0]
    assert got["mean_w"] == pytest.approx(1.0, abs=0.03)
    assert got["zero_frac"] == pytest.approx(math.exp(-1), abs=0.02)
