"""The truncation leakage audit: zero on the leak-free flagship (its
DuckDB replay runs in test_oracle_parity), and — the power test — a
deliberately leaky pipeline must be flagged."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from sparkfeat.audit import truncation_leakage_audit
from sparkfeat.schema import with_turn_signals


def test_audit_flags_lookahead(spark, transcripts):
    """A lead() feature reads turn t+1 at turn t: the audit must report
    violations at any cutoff that truncates a conversation mid-way."""
    mid = transcripts.approxQuantile("turn_idx", [0.5], 0.0)[0]
    cut = (
        transcripts.filter(F.col("turn_idx") <= mid)
        .agg(F.max("ts"))
        .collect()[0][0]
    )

    def leaky(df):
        sig = with_turn_signals(df)
        w = Window.partitionBy("conv_id").orderBy("ts", "turn_idx")
        return sig.select(
            "conv_id",
            "turn_idx",
            "ts",
            F.lead("text_len").over(w).alias("next_len"),
        )

    out = truncation_leakage_audit(
        leaky, transcripts, cutoffs=[str(cut)], compare_cols=["next_len"]
    ).collect()[0]
    # the last surviving turn of every truncated conversation has a
    # next_len on the full side but NULL on the truncated side
    assert out["n_viol"] > 0


def test_audit_zero_on_trailing_only(spark, transcripts):
    """A trailing-window feature passes with all-zero violations."""

    def clean(df):
        sig = with_turn_signals(df)
        w = (
            Window.partitionBy("conv_id")
            .orderBy("ts", "turn_idx")
            .rowsBetween(-4, 0)
        )
        return sig.select(
            "conv_id",
            "turn_idx",
            "ts",
            F.avg("text_len").over(w).alias("trail_avg"),
        )

    cut = transcripts.selectExpr(
        "timestamp_micros(cast(percentile(unix_micros(ts), 0.6) as bigint))"
    ).collect()[0][0]
    out = truncation_leakage_audit(
        clean, transcripts, cutoffs=[str(cut)], compare_cols=["trail_avg"]
    ).collect()[0]
    assert out["n_viol"] == 0 and out["n_only_full"] == 0
    assert out["max_abs_diff"] == 0.0


def test_audit_published_into_run_manifest(spark, transcripts, tmp_path):
    """The audit verdict lands in the run's manifest directory next to
    the per-bucket metrics (run_metrics surfaces it)."""
    from sparkfeat.checkpoint import publish_audit, run_checkpointed, run_metrics

    out = str(tmp_path / "run")
    run_checkpointed(
        spark, lambda s: with_turn_signals(transcripts), out, num_buckets=4
    )

    def clean(df):
        w = (
            Window.partitionBy("conv_id")
            .orderBy("ts", "turn_idx")
            .rowsBetween(-4, 0)
        )
        return with_turn_signals(df).select(
            "conv_id", "turn_idx", "ts",
            F.avg("text_len").over(w).alias("trail_avg"),
        )

    cut = transcripts.selectExpr(
        "timestamp_micros(cast(percentile(unix_micros(ts), 0.5) as bigint))"
    ).collect()[0][0]
    payload = publish_audit(
        out,
        truncation_leakage_audit(
            clean, transcripts, cutoffs=[str(cut)], compare_cols=["trail_avg"]
        ),
    )
    assert payload["clean"] is True
    recs = run_metrics(out)
    audits = [r for r in recs if r.get("audit") == "leakage"]
    assert len(audits) == 1 and audits[0]["clean"] is True
    assert len([r for r in recs if "bucket" in r]) == 4


# ---------------------------------------------------------------------------
# k_anonymity_audit — release-gate census
# ---------------------------------------------------------------------------


def test_k_anonymity_hand_computed(spark):
    from sparkfeat.audit import k_anonymity_audit

    rows = (
        [("en", "s1")] * 5  # safe at k=5
        + [("en", "s2")] * 2  # at risk
        + [("fr", "s1")]  # unique -> at risk
    )
    df = spark.createDataFrame(rows, "lang string, source string")
    got = {
        (r.lang, r.source): r
        for r in k_anonymity_audit(df, ["lang", "source"], k=5).collect()
    }
    assert got[("en", "s1")].at_risk == 0
    assert got[("en", "s2")].at_risk == 1 and got[("fr", "s1")].at_risk == 1
    c = got[("en", "s1")]
    assert c.n_rows == 8 and c.n_groups == 3
    assert c.n_rows_at_risk == 3 and c.risk_frac == 0.375
    assert c.min_group_size == 1 and c.k_threshold == 5


def test_k_anonymity_nulls_group_conservatively(spark):
    from sparkfeat.audit import k_anonymity_audit

    df = spark.createDataFrame(
        [("en",), (None,), (None,), (None,), (None,), (None,)],
        "lang string",
    )
    got = {r.lang: r for r in k_anonymity_audit(df, ["lang"], k=5).collect()}
    # five NULLs form one size-5 group (matchable value), 'en' is unique
    assert got[None].group_size == 5 and got[None].at_risk == 0
    assert got["en"].at_risk == 1


def test_k_anonymity_all_unique_worst_case(spark):
    from sparkfeat.audit import k_anonymity_audit

    df = spark.createDataFrame([(str(i),) for i in range(4)], "uid string")
    rows = k_anonymity_audit(df, ["uid"], k=2).collect()
    assert all(r.at_risk == 1 for r in rows)
    assert rows[0].risk_frac == 1.0 and rows[0].min_group_size == 1


def test_l_diversity_homogeneity_attack_and_entropy(spark):
    import math

    from sparkfeat.audit import l_diversity_audit

    rows = (
        [("g1", "flu")] * 49 + [("g1", "hiv")]  # 50-anonymous, near-
        + [("g2", "flu")] * 3 + [("g2", "cold")] * 3  # homogeneous
        + [("g3", "flu")] * 5  # fully homogeneous -> at risk
    )
    df = spark.createDataFrame(rows, "grp string, dx string")
    got = {
        r.grp: r
        for r in l_diversity_audit(df, ["grp"], "dx", l_threshold=2).collect()
    }
    # distinct count passes g1, but entropy exposes the 49-vs-1 split
    assert got["g1"].n_sensitive == 2 and got["g1"].at_risk == 0
    h = round(-(49 / 50) * math.log(49 / 50), 9) + round(
        -(1 / 50) * math.log(1 / 50), 9
    )
    assert got["g1"].entropy_l == round(math.exp(round(h, 9)), 6)
    assert got["g2"].entropy_l == 2.0  # balanced 3-3
    assert got["g3"].at_risk == 1 and got["g3"].entropy_l == 1.0
    assert got["g1"].n_rows_at_risk == 5 and got["g1"].min_diversity == 1


def test_l_diversity_null_sensitive_counts_as_value(spark):
    from sparkfeat.audit import l_diversity_audit

    df = spark.createDataFrame(
        [("g", "a"), ("g", None), ("h", None), ("h", None)],
        "grp string, dx string",
    )
    got = {
        r.grp: r
        for r in l_diversity_audit(df, ["grp"], "dx", l_threshold=2).collect()
    }
    assert got["g"].n_sensitive == 2 and got["g"].at_risk == 0
    assert got["h"].n_sensitive == 1 and got["h"].at_risk == 1


def test_t_closeness_skewness_attack(spark):
    from sparkfeat.audit import t_closeness_audit

    # corpus: flu 90%, hiv 10%; g1 mirrors it (tvd 0), g2 mildly
    # skewed, g3 pure-flu (tvd exactly 0.1 via the absent-value fold)
    rows = (
        [("g1", "flu")] * 45 + [("g1", "hiv")] * 5
        + [("g2", "flu")] * 30 + [("g2", "hiv")] * 5
        + [("g3", "flu")] * 15
    )
    df = spark.createDataFrame(rows, "grp string, dx string")
    got = {
        r.grp: r
        for r in t_closeness_audit(df, ["grp"], "dx", t_threshold=0.05
                                   ).collect()
    }
    assert got["g1"].tvd == 0.0 and got["g1"].at_risk == 0
    assert got["g2"].tvd == 0.042857 and got["g2"].at_risk == 0
    assert got["g3"].tvd == 0.1 and got["g3"].at_risk == 1
    assert got["g1"].max_tvd == 0.1 and got["g1"].n_rows_at_risk == 15
    # l-diversity would flag nothing here but g3: the 40%-hiv version
    skew = [("s", "hiv")] * 4 + [("s", "flu")] * 6 + [("t", "flu")] * 86 + [
        ("t", "hiv")
    ] * 4
    df2 = spark.createDataFrame(skew, "grp string, dx string")
    got2 = {
        r.grp: r
        for r in t_closeness_audit(df2, ["grp"], "dx", t_threshold=0.2
                                    ).collect()
    }
    # global hiv prevalence 8%; group s shows 40% -> big TVD, flagged
    assert got2["s"].tvd > 0.3 and got2["s"].at_risk == 1
    assert got2["t"].at_risk == 0
