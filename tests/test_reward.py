"""group_advantages / best_of_n (sparkfeat/reward.py): hand-computed
GRPO and RLOO values, the normalization laws (mean-0/std-1 per group
for GRPO, zero-sum for RLOO), degenerate and singleton groups, null
handling, tie-break determinism, and laziness."""

from __future__ import annotations

import math

import pytest

from sparkfeat.reward import best_of_n, group_advantages


def _rewards(spark):
    rows = [
        ("p1", 0, 1.0), ("p1", 1, 2.0), ("p1", 2, 6.0),
        ("p2", 0, 5.0), ("p2", 1, 5.0),          # degenerate: zero std
        ("p3", 0, 7.0),                            # singleton
        ("p4", 0, None), ("p4", 1, 3.0), ("p4", 2, 1.0),  # null dropped
    ]
    return spark.createDataFrame(
        rows, "group_id string, cand_id int, reward double"
    )


def test_grpo_hand_computed(spark):
    got = {
        (r["group_id"], r["cand_id"]): r
        for r in group_advantages(_rewards(spark)).collect()
    }
    # p1: mean 3, var ((1-3)^2+(2-3)^2+(6-3)^2)/3 = 14/3
    std = math.sqrt(14 / 3)
    for cid, rv in ((0, 1.0), (1, 2.0), (2, 6.0)):
        r = got[("p1", cid)]
        assert r["n_g"] == 3 and r["mean_g"] == 3.0
        assert r["advantage"] == pytest.approx(
            round((rv - 3.0) / (std + 1e-6), 6), abs=1e-6
        )
    # degenerate group: zero std -> eps floor -> advantage exactly 0
    assert got[("p2", 0)]["advantage"] == 0.0
    assert got[("p2", 1)]["advantage"] == 0.0
    # singleton: r == mean -> 0
    assert got[("p3", 0)]["advantage"] == 0.0
    # null reward dropped; survivors' baseline excludes it
    assert ("p4", 0) not in got
    assert got[("p4", 1)]["n_g"] == 2 and got[("p4", 1)]["mean_g"] == 2.0


def test_grpo_normalization_law(spark):
    """Within every non-degenerate group the advantages have mean ~0
    and population std ~1 (up to the eps floor)."""
    rows = [
        (f"g{g}", i, float((g * 7 + i * i * 3) % 11))
        for g in range(6) for i in range(8)
    ]
    df = spark.createDataFrame(rows, "group_id string, cand_id int, reward double")
    by = {}
    for r in group_advantages(df).collect():
        by.setdefault(r["group_id"], []).append(r["advantage"])
    for g, advs in by.items():
        assert sum(advs) / len(advs) == pytest.approx(0.0, abs=1e-5)
        std = math.sqrt(sum(a * a for a in advs) / len(advs))
        assert std == pytest.approx(1.0, abs=1e-4), g


def test_rloo_hand_computed_and_zero_sum(spark):
    got = {
        (r["group_id"], r["cand_id"]): r
        for r in group_advantages(_rewards(spark), method="rloo").collect()
    }
    # p1 cand 0: 1 - (2+6)/2 = -3 ; cand 2: 6 - (1+2)/2 = 4.5
    assert got[("p1", 0)]["advantage"] == -3.0
    assert got[("p1", 1)]["advantage"] == -1.5
    assert got[("p1", 2)]["advantage"] == 4.5
    # zero-sum law: sum_i A_i = sum r - n*mean_others... = n/(n-1)*(sum-sum)=0
    assert sum(
        got[("p1", i)]["advantage"] for i in range(3)
    ) == pytest.approx(0.0, abs=1e-9)
    # singleton has no LOO baseline
    assert got[("p3", 0)]["advantage"] is None
    # degenerate group: every r equals the others' mean -> 0
    assert got[("p2", 0)]["advantage"] == 0.0


def test_method_validation(spark):
    with pytest.raises(ValueError):
        group_advantages(_rewards(spark), method="ppo")


def test_best_of_n(spark):
    got = best_of_n(_rewards(spark), k=1).collect()
    best = {r["group_id"]: (r["cand_id"], r["reward"]) for r in got}
    assert best["p1"] == (2, 6.0)
    assert best["p2"] == (0, 5.0)  # tie at 5.0 -> lower cand_id wins
    assert best["p3"] == (0, 7.0)
    assert best["p4"] == (1, 3.0)  # null never wins
    got2 = best_of_n(_rewards(spark), k=2).collect()
    p1 = sorted(
        (r["bon_rank"], r["cand_id"]) for r in got2 if r["group_id"] == "p1"
    )
    assert p1 == [(1, 2), (2, 1)]


def test_build_is_lazy(spark):
    df = _rewards(spark)
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup() or [])
    group_advantages(df)
    group_advantages(df, method="rloo")
    best_of_n(df, k=3)
    after = len(tracker.getJobIdsForGroup() or [])
    assert before == after


# ------------------------------------------------------ n-step returns


def test_nstep_returns_hand_computed(spark):
    """Three-turn episode, H=2, gamma=0.5: G_0 = 1 + 0.5*2 = 2,
    G_1 = 2 + 0.5*4 = 4, G_2 = 4 (truncated, n_terms=1)."""
    from sparkfeat.reward import nstep_returns

    df = spark.createDataFrame(
        [("c", 0, 1.0), ("c", 1, 2.0), ("c", 2, 4.0)],
        "conv_id string, turn_idx int, reward double",
    )
    got = {
        r["turn_idx"]: r.asDict()
        for r in nstep_returns(df, horizon=2, gamma=0.5).collect()
    }
    assert got[0]["return_n"] == 2.0 and got[0]["n_terms"] == 2
    assert got[1]["return_n"] == 4.0 and got[1]["n_terms"] == 2
    assert got[2]["return_n"] == 4.0 and got[2]["n_terms"] == 1


def test_nstep_returns_matches_python_fold_and_truncation_bound(spark):
    """Longer episode vs a pure-Python reference; the H-step return
    must equal the infinite-horizon return within the documented tail
    bound gamma^H * r_max / (1 - gamma)."""
    from sparkfeat.reward import nstep_returns

    gamma, H = 0.9, 6
    rs = [((i * 29) % 10) / 2.0 for i in range(40)]
    df = spark.createDataFrame(
        [("e", i, r) for i, r in enumerate(rs)],
        "conv_id string, turn_idx int, reward double",
    )
    got = {
        r["turn_idx"]: r["return_n"]
        for r in nstep_returns(df, horizon=H, gamma=gamma).collect()
    }
    for t in range(40):
        want = sum(gamma**j * rs[t + j] for j in range(min(H, 40 - t)))
        assert got[t] == pytest.approx(round(want, 6), abs=1e-9), t
        full = sum(gamma**j * rs[t + j] for j in range(40 - t))
        assert abs(got[t] - full) <= gamma**H * max(rs) / (1 - gamma) + 1e-9


def test_nstep_returns_single_exchange_no_udf(spark):
    from sparkfeat.reward import nstep_returns

    df = spark.createDataFrame(
        [("c", i, float(i)) for i in range(50)],
        "conv_id string, turn_idx int, reward double",
    )
    plan = (
        nstep_returns(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") <= 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
