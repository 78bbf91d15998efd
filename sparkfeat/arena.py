"""Arena-style pairwise-outcome aggregation: turn a table of "A beat
B" judgments into a global leaderboard — the curation step that sits
downstream of :func:`sparkfeat.conv.preference_pairs` and of any
LLM-judge sweep (chatbot-arena-style evals, best-of-n response
selection, source-quality tournaments).

Two operators:

* :func:`bt_strengths` — Bradley–Terry (1952) maximum-likelihood
  strengths via a FIXED number of unrolled Minorize–Maximize
  iterations (Hunter 2004, "MM algorithms for generalized
  Bradley-Terry models"): ``s_i ← W_i / Σ_j n_ij / (s_i + s_j)``,
  renormalized to mean 1 each round. Everything stays in the plan —
  the match matrix is a tiny aggregate of the (possibly 100 TB) raw
  judgment stream, and the T iterations are T joins + aggregates over
  that players²-bounded table; no driver loop over data, no collect.
  Every iteration canonicalizes to 9 dp BEFORE the next compare
  (house convention) so the full trajectory — not just the fixed
  point — replays bit-for-bit in any engine; the DuckDB oracle
  unrolls the identical CTE chain.
* :func:`winrate_matrix` — the per-(i, j) empirical win rate with a
  Wilson lower confidence bound (the leaderboard companion that says
  which head-to-head cells are actually supported by data). Pure
  closed-form column algebra; one aggregate.

Scale shape: the only corpus-sized operation in either operator is the
FIRST ``groupBy(winner, loser)`` — a map-side-combined count whose
output is bounded by players², independent of judgment volume. The MM
iterations and the Wilson bound never touch raw rows again. At 10⁹
judgments over 10³ players the shuffle carries ≤10⁶ rows.

Degeneracy guard: raw BT is undefined for players with zero wins (or
zero losses — their MLE diverges). ``prior`` adds a virtual half-win
in EACH direction of every OBSERVED pairing (Davidson-style
regularization); with prior > 0 every s_i stays positive and finite
and the iteration is a contraction on the observed comparison graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bt_strengths(
    judgments: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
    n_iter: int = 5,
    prior: float = 0.1,
    lineage: str = "persist",
) -> DataFrame:
    """Bradley–Terry strengths from a raw judgment stream, T unrolled
    MM iterations in one lazy plan.

    Input: one row per judgment, ``winner_col`` / ``loser_col`` naming
    the two players (rows where either side is NULL, or where winner
    == loser — self-play carries no pairwise information — are
    dropped). Output:
    ``(player, wins, games, strength)`` with ``strength`` the 9
    dp-canonicalized MM iterate after ``n_iter`` rounds, normalized to
    mean 1 over players each round (BT is scale-free; the mean-1 gauge
    is arithmetic-only — no log/exp — so it is engine-exact).

    The update (Hunter 2004 eq. 2, with the symmetric pair total
    ``n_ij = w_ij + w_ji + 2·prior``):

        s_i ← W_i / Σ_{j≠i} n_ij / (s_i + s_j)

    where ``W_i = wins_i + prior·(distinct observed opponents)`` —
    the prior's virtual half-win each way enters both numerator and
    pair totals, keeping every player's strength positive and finite.

    Scale: the judgment stream collapses to ≤players² rows in ONE
    map-side-combined count; each iteration joins the current
    strengths (players rows) onto that matrix twice by key and
    re-aggregates — broadcast-sized both sides for any realistic
    leaderboard. ``n_iter`` is a plan-depth knob, not a convergence
    loop: 5 rounds lands within ~1% of the fixed point on
    well-connected graphs (pytest asserts monotone log-likelihood and
    planted-order recovery); raise it for tighter gaps.

    ``lineage`` controls how the self-referential unrolled iteration
    is kept from re-executing its upstream (raw plan: 380 corpus
    FileScans at T=5, measured). ``'persist'`` (default) lazily caches
    the boundary tables — build fires NO job (the house laziness law),
    the corpus aggregate executes once, and every reuse is an
    InMemoryTableScan; the cost is a constant ~seconds of scheduling
    for the 2^T tiny cached stages, independent of corpus size (at
    100 TB the one real aggregate dominates). ``'cut'`` additionally
    truncates lineage with ``localCheckpoint(eager=False)`` per
    iterate — 5.6× lower total latency (A/B at sf0.01: 8.3 s vs
    1.5 s, bit-identical rows), but under AQE the checkpoint
    finalizes query stages at BUILD time (jobs fire before any
    action), so it is the serving/benchmark option, not the default;
    it also ties recompute to executor-local blocks (avoid with
    dynamic allocation). ``'none'`` leaves the raw plan — debugging
    only.
    """
    if lineage not in ("cut", "persist", "none"):
        raise ValueError(f"unknown lineage {lineage!r}")

    def _bound(df: DataFrame) -> DataFrame:
        if lineage == "cut":
            return df.localCheckpoint(eager=False)
        if lineage == "persist":
            return df.persist()
        return df
    j = judgments.filter(
        F.col(winner_col).isNotNull()
        & F.col(loser_col).isNotNull()
        & (F.col(winner_col) != F.col(loser_col))
    )
    # Directed win counts: one corpus-sized aggregate, players²-bounded.
    wins = (
        j.select(
            F.col(winner_col).cast("string").alias("a"),
            F.col(loser_col).cast("string").alias("b"),
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    # Bound wins BEFORE the self-join below references it twice — this
    # is the line that makes the corpus aggregate run exactly once.
    wins = _bound(wins)
    # Symmetrize to per-ordered-pair totals n_ij (+ the prior's virtual
    # half-win each way: w'_ij = w_ij + prior, so n_ij picks up 2·prior
    # once per unordered observed pair).
    rev = wins.select(
        F.col("b").alias("a"), F.col("a").alias("b"), F.col("w").alias("w_rev")
    )
    pairs = wins.join(rev, ["a", "b"], "full").select(
        "a",
        "b",
        F.coalesce("w", F.lit(0)).alias("w_int"),
        (F.coalesce("w", F.lit(0)) + F.coalesce("w_rev", F.lit(0))).alias(
            "n_int"
        ),
    )
    # The unrolled self-referential iteration references these tables
    # once per round PER SELF-REFERENCE — without a materialization
    # boundary Catalyst re-plans the whole upstream subtree at every
    # reference (measured: 380 corpus FileScans / 473 exchanges at
    # T=5; ReuseExchange does NOT collapse them). Both boundaries are
    # lazy (no job fires at build time) and players²-bounded.
    pairs = _bound(pairs)
    # Per-player totals: wins/games stay exact integers; the
    # regularized _W adds the prior once per observed opponent.
    totals = pairs.groupBy(F.col("a").alias("player")).agg(
        (
            F.sum("w_int").cast("double")
            + F.lit(float(prior)) * F.count(F.lit(1)).cast("double")
        ).alias("_W"),
        F.sum("w_int").cast("bigint").alias("wins"),
        F.sum("n_int").cast("bigint").alias("games"),
    )
    totals = _bound(totals)
    s = totals.select("player", F.lit(1.0).alias("s"))
    for _ in range(n_iter):
        si = s.select(F.col("player").alias("a"), F.col("s").alias("s_i"))
        sj = s.select(F.col("player").alias("b"), F.col("s").alias("s_j"))
        denom = (
            pairs.join(si, "a")
            .join(sj, "b")
            .groupBy(F.col("a").alias("player"))
            .agg(
                F.sum(
                    (F.col("n_int") + F.lit(2.0 * prior))
                    / (F.col("s_i") + F.col("s_j"))
                ).alias("_D")
            )
        )
        raw = totals.join(denom, "player").select(
            "player", (F.col("_W") / F.col("_D")).alias("_raw")
        )
        # Mean-1 gauge fix, arithmetic only; canonicalize BEFORE the
        # next iteration reads s so the trajectory replays anywhere.
        # A GLOBAL window (players-sized table — no bottleneck), not a
        # crossJoin of two more self-references: the strengths plan is
        # self-referential across iterations, so every extra reference
        # multiplies the unrolled tree (4^T leaves froze Catalyst
        # analysis at T=5; the window form is 2^T).
        w_all = Window.partitionBy()
        s = raw.select(
            "player",
            F.round(
                F.col("_raw")
                * F.count(F.lit(1)).over(w_all)
                / F.sum("_raw").over(w_all),
                9,
            ).alias("s"),
        )
        if lineage == "cut":
            s = s.localCheckpoint(eager=False)
    return totals.join(s, "player").select(
        "player", "wins", "games", F.col("s").alias("strength")
    )


def winrate_matrix(
    judgments: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
    z: float = 1.96,
) -> DataFrame:
    """Head-to-head leaderboard cells: for every ordered observed pair
    (a, b), the empirical win rate of a over b and its Wilson-score
    lower confidence bound at normal quantile ``z`` (default 95%) —
    the standard "is this cell supported or noise" gate (rank by the
    bound, not the rate: a 1/1 record stops outranking 70/100).

    Output: ``(a, b, wins, games, win_rate, wilson_lb)``, rates 6
    dp-canonicalized. Wilson (1927):

        (p̂ + z²/2n − z·√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n)

    — closed-form column algebra on the players²-bounded count matrix;
    ``sqrt`` is IEEE-correctly-rounded, so 6 dp canonicalization makes
    it engine-exact. One corpus-sized aggregate, nothing else touches
    raw judgments.
    """
    j = judgments.filter(
        F.col(winner_col).isNotNull()
        & F.col(loser_col).isNotNull()
        & (F.col(winner_col) != F.col(loser_col))
    )
    wins = (
        j.select(
            F.col(winner_col).cast("string").alias("a"),
            F.col(loser_col).cast("string").alias("b"),
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    rev = wins.select(
        F.col("b").alias("a"), F.col("a").alias("b"), F.col("w").alias("w_rev")
    )
    cells = wins.join(rev, ["a", "b"], "full").select(
        "a",
        "b",
        F.coalesce("w", F.lit(0)).alias("wins"),
        (F.coalesce("w", F.lit(0)) + F.coalesce("w_rev", F.lit(0))).alias(
            "games"
        ),
    )
    n = F.col("games").cast("double")
    p = F.col("wins").cast("double") / n
    z2 = F.lit(z * z)
    lb = (
        p
        + z2 / (2 * n)
        - F.lit(z) * F.sqrt(p * (1 - p) / n + z2 / (4 * n * n))
    ) / (1 + z2 / n)
    return cells.select(
        "a",
        "b",
        "wins",
        "games",
        F.round(p, 6).alias("win_rate"),
        F.round(lb, 6).alias("wilson_lb"),
    )


def rater_agreement(
    judgments: DataFrame,
    item_col: str = "item_id",
    rater_col: str = "rater_id",
    label_col: str = "label",
    min_shared: int = 1,
) -> DataFrame:
    """Pairwise inter-rater agreement — Cohen's kappa per rater pair —
    the audit a judgment stream passes BEFORE its labels train a reward
    model or gate a corpus (raw percent agreement rewards raters who
    spam the majority label; kappa discounts chance agreement, Cohen
    1960). Completes the judgment-modality trio's quality loop:
    ``conv.preference_pairs`` mines structural pairs, ``bt_strengths``
    aggregates pairwise winners, this measures whether the raters who
    produced them agree above chance.

    Per unordered rater pair (a < b), over the items BOTH judged:
    ``po`` = observed agreement rate, ``pe`` = chance agreement
    Σ_k p_a(k)·p_b(k) from each rater's own label marginals on the
    SHARED item set, ``kappa = (po − pe)/(1 − pe)`` (NULL when a
    degenerate pair has pe = 1 — both raters constant on one label —
    where kappa is undefined). ``po``/``pe`` are rounded to 6 dp
    BEFORE the quotient (the round-before-solve convention) so both
    engines divide identical doubles; null labels and self-pairs drop.

    Scale shape: ONE equi-join of the judgment stream with itself on
    the item (raters per item is bounded — single digits — so the
    join fans out per-item-constant, never quadratic in the stream),
    collapsed immediately by a map-side-combinable groupBy to
    raters² × labels² confusion cells; every downstream agg runs on
    that tiny table. 10⁹ judgments shuffle once, by item.
    """
    j = judgments.filter(F.col(label_col).isNotNull()).select(
        F.col(item_col).alias("_it"),
        F.col(rater_col).cast("string").alias("_r"),
        F.col(label_col).cast("string").alias("_l"),
    )
    ja = j.select(
        F.col("_it"), F.col("_r").alias("ra"), F.col("_l").alias("la")
    )
    jb = j.select(
        F.col("_it"), F.col("_r").alias("rb"), F.col("_l").alias("lb")
    )
    cells = (
        ja.join(jb, "_it")
        .filter(F.col("ra") < F.col("rb"))
        .groupBy("ra", "rb", "la", "lb")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # per-pair marginals on the SHARED item set: rater a's label
    # distribution (sum over lb) and rater b's (sum over la)
    ma = cells.groupBy("ra", "rb", "la").agg(F.sum("cnt").alias("na"))
    # rename before the self-join: ma and mb share cells' lineage, and
    # same-expr-ID equi-conditions trip Spark's ambiguity detection
    mb = (
        cells.groupBy("ra", "rb", "lb")
        .agg(F.sum("cnt").alias("nb"))
        .select(
            F.col("ra").alias("_ra2"),
            F.col("rb").alias("_rb2"),
            F.col("lb").alias("_lb2"),
            "nb",
        )
    )
    pe_terms = ma.join(
        mb,
        (F.col("ra") == F.col("_ra2"))
        & (F.col("rb") == F.col("_rb2"))
        & (F.col("la") == F.col("_lb2")),
    ).select("ra", "rb", (F.col("na") * F.col("nb")).alias("_ab"))
    pe_num = pe_terms.groupBy("ra", "rb").agg(F.sum("_ab").alias("_pe_num"))
    tot = cells.groupBy("ra", "rb").agg(F.sum("cnt").alias("n_shared"))
    agree = (
        cells.filter(F.col("la") == F.col("lb"))
        .groupBy("ra", "rb")
        .agg(F.sum("cnt").alias("_n_agree"))
    )
    n = F.col("n_shared").cast("double")
    po = F.round(F.coalesce(F.col("_n_agree"), F.lit(0)) / n, 6)
    pe = F.round(F.col("_pe_num") / (n * n), 6)
    return (
        tot.join(agree, ["ra", "rb"], "left")
        .join(pe_num, ["ra", "rb"])
        .filter(F.col("n_shared") >= min_shared)
        .select(
            F.col("ra").alias("rater_a"),
            F.col("rb").alias("rater_b"),
            F.col("n_shared").cast("bigint").alias("n_shared"),
            F.coalesce(F.col("_n_agree"), F.lit(0))
            .cast("bigint")
            .alias("n_agree"),
            po.alias("po"),
            pe.alias("pe"),
            F.when(pe < 1.0, F.round((po - pe) / (F.lit(1.0) - pe), 6))
            .alias("kappa"),
        )
    )


def fleiss_kappa(
    judgments: DataFrame,
    m: int,
    item_col: str = "item_id",
    rater_col: str = "rater_id",
    label_col: str = "label",
) -> DataFrame:
    """Fleiss' kappa — chance-corrected agreement for a FIXED panel of
    ``m`` raters per item (Fleiss 1971), the multi-rater complement of
    the pairwise :func:`rater_agreement`: one number for "does the
    whole labeling panel agree above chance", computed over the items
    that exactly ``m`` distinct raters judged (the statistic is
    undefined on ragged panels; partially-covered items are excluded
    by construction, which is also the honest treatment).

    In-plan arithmetic is exact-integer until three final divisions:
    per item Σ_k n_ik² (label-count squares), so
    P̄ = (ΣΣ n_ik² − N·m)/(N·m·(m−1)) is ONE quotient of exact
    integers; label shares p_k = S_k/(N·m) likewise; P̄ₑ = Σ p_k².
    P̄/P̄ₑ round to 6 dp BEFORE the kappa quotient (round-before-solve)
    and per-label squares to 9 dp before their fold, so every engine
    divides identical doubles. Output: one row per label —
    ``(label, n_label, p_label)`` — with the panel-level ``n_items``,
    ``p_bar``, ``p_e``, ``kappa`` riding every row as constants (the
    probe convention: the value hash verifies the solve).

    Scale shape: ONE ``groupBy(item, label)`` count (map-side
    combinable; 10⁹ judgments shuffle once by item), an items-sized
    ``groupBy(item)`` fold, then label-count-sized aggregates and
    one-row broadcast crossJoins — fully lazy, nothing wider than the
    judgment stream's own item key.
    """
    j = judgments.filter(F.col(label_col).isNotNull()).select(
        F.col(item_col).alias("_it"),
        F.col(rater_col).cast("string").alias("_r"),
        F.col(label_col).cast("string").alias("_l"),
    )
    il = j.groupBy("_it", "_l").agg(F.count(F.lit(1)).alias("nik"))
    per_item = il.groupBy("_it").agg(
        F.sum("nik").alias("_m_it"),
        F.sum(F.col("nik") * F.col("nik")).alias("_sq"),
    )
    # exact-m gate: items some rater skipped (or judged twice) drop.
    # _m_it counts judgments; a duplicate (item, rater) would also pass
    # a raw count gate, so require m DISTINCT raters via the pair table.
    nr = j.groupBy("_it", "_r").agg(F.count(F.lit(1)).alias("_c"))
    rcount = nr.groupBy("_it").agg(
        F.count(F.lit(1)).alias("_nr"), F.sum("_c").alias("_nj")
    )
    eligible = rcount.filter(
        (F.col("_nr") == m) & (F.col("_nj") == m)
    ).select("_it")
    kept = per_item.join(eligible, "_it")
    panel = kept.agg(
        F.count(F.lit(1)).alias("n_items"), F.sum("_sq").alias("_ssq")
    )
    lbl = (
        il.join(eligible, "_it")
        .groupBy("_l")
        .agg(F.sum("nik").alias("n_label"))
    )
    lp = lbl.crossJoin(F.broadcast(panel)).select(
        F.col("_l").alias("label"),
        F.col("n_label").cast("bigint").alias("n_label"),
        "n_items",
        "_ssq",
        F.round(
            F.col("n_label") / (F.col("n_items") * F.lit(m)).cast("double"),
            9,
        ).alias("_pk"),
    )
    stats = lp.agg(
        F.max("n_items").alias("_n"),
        F.max("_ssq").alias("_s"),
        F.round(F.sum(F.round(F.col("_pk") * F.col("_pk"), 9)), 6).alias(
            "_pe"
        ),
    ).select(
        "_n",
        "_pe",
        F.round(
            (F.col("_s") - F.col("_n") * m).cast("double")
            / (F.col("_n") * m * (m - 1)).cast("double"),
            6,
        ).alias("_pbar"),
    )
    return lp.crossJoin(F.broadcast(stats)).select(
        "label",
        "n_label",
        F.round("_pk", 6).alias("p_label"),
        F.col("n_items").cast("bigint").alias("n_items"),
        F.col("_pbar").alias("p_bar"),
        F.col("_pe").alias("p_e"),
        F.when(
            F.col("_pe") < 1.0,
            F.round(
                (F.col("_pbar") - F.col("_pe")) / (F.lit(1.0) - F.col("_pe")),
                6,
            ),
        ).alias("kappa"),
    )


def krippendorff_alpha(
    judgments: DataFrame,
    max_raters: int = 8,
    item_col: str = "item_id",
    rater_col: str = "rater_id",
    label_col: str = "label",
) -> DataFrame:
    """Krippendorff's alpha, nominal data (Krippendorff, *Content
    Analysis*, 2004) — the missing-data-robust member of the agreement
    family: :func:`rater_agreement` (Cohen) audits rater PAIRS,
    :func:`fleiss_kappa` needs a FIXED full panel per item and drops
    every partially-covered item, while alpha uses every item with ≥2
    judgments whatever subset of raters produced them — the realistic
    shape of a labeling queue (Fleiss' exact-m gate discards 38% of the
    synthetic 85%-coverage stream; alpha keeps all pairable items).

    Coincidence-matrix form, nominal metric: with n_ic = count of label
    c on item i, n_i = Σ_c n_ic over pairable items (n_i ≥ 2),
    A_o = Σ_i Σ_c n_ic(n_ic−1)/(n_i−1), n = Σ n_i, n_c = label
    marginals: α = 1 − (n − A_o)(n − 1)/(n² − Σ_c n_c²).

    Engine-exact arithmetic: the per-item 1/(n_i−1) weights make a
    naive double fold ORDER-DEPENDENT (doubles don't associate; the
    shuffle order differs between engines), so A_o is scaled by
    L = lcm(1..max_raters−1): t_i·(L div (n_i−1)) is an exact BIGINT
    for every panel size, the fold is an integer SUM, and alpha is ONE
    quotient of exact integers — bit-identical in any engine (the
    Fleiss round-before-solve convention, strengthened to fully
    integer). Items with more than ``max_raters`` judgments are
    excluded (L would stop dividing evenly; raise the parameter for
    bigger panels — lcm(1..12) is only 27720). The two n-scale
    products stay inside bigint up to ~10⁹ judgments; beyond that cast
    the final numerator/denominator to DECIMAL(38,0).

    Scale shape: ONE groupBy(item, label) count (map-side combinable),
    an items-sized fold, then label-sized aggregates and one-row
    broadcast crossJoins — the Fleiss plan with the exact-m gate
    replaced by the pairable gate. Output: one row per label
    (``label``, ``n_label`` coincidence marginal) with panel constants
    (``n_items``, ``n_judgments``, ``d_o``, ``d_e``, ``alpha``) riding
    every row so the value hash verifies the solve itself."""
    from math import lcm

    L = lcm(*range(1, max_raters)) if max_raters > 2 else 1
    j = judgments.filter(F.col(label_col).isNotNull()).select(
        F.col(item_col).alias("_it"),
        F.col(label_col).cast("string").alias("_l"),
    )
    il = j.groupBy("_it", "_l").agg(F.count(F.lit(1)).alias("nic"))
    pi = il.groupBy("_it").agg(
        F.sum("nic").alias("ni"),
        F.sum(F.col("nic") * (F.col("nic") - 1)).alias("ti"),
    )
    pair = pi.filter((F.col("ni") >= 2) & (F.col("ni") <= max_raters))
    ao = pair.agg(
        F.sum("ni").alias("_n"),
        F.sum(F.col("ti") * F.expr(f"{L} div (ni - 1)")).alias("_aol"),
        F.count(F.lit(1)).alias("_n_items"),
    )
    nc = (
        il.join(pair.select("_it"), "_it")
        .groupBy("_l")
        .agg(F.sum("nic").alias("n_label"))
    )
    sq = nc.agg(F.sum(F.col("n_label") * F.col("n_label")).alias("_snc2"))
    n, aol = F.col("_n"), F.col("_aol")
    snc2 = F.col("_snc2")
    de_num = n * n - snc2
    do_l = n * F.lit(L) - aol  # n·L − A_o·L = L·(observed disagreements)
    return (
        nc.crossJoin(F.broadcast(ao))
        .crossJoin(F.broadcast(sq))
        .select(
            F.col("_l").alias("label"),
            F.col("n_label").cast("bigint").alias("n_label"),
            F.col("_n_items").cast("bigint").alias("n_items"),
            n.cast("bigint").alias("n_judgments"),
            F.round(do_l.cast("double") / (n * F.lit(L)), 6).alias("d_o"),
            F.round(de_num.cast("double") / (n * (n - 1)), 6).alias("d_e"),
            F.when(
                de_num > 0,
                F.round(
                    F.lit(1.0)
                    - (do_l * (n - 1)).cast("double")
                    / (de_num * F.lit(L)).cast("double"),
                    6,
                ),
            ).alias("alpha"),
        )
    )


def length_bias(
    judgments: DataFrame,
    winner_len_col: str = "winner_len",
    loser_len_col: str = "loser_len",
) -> DataFrame:
    """Judge length-bias audit: does this pairwise judgment stream
    systematically prefer the LONGER response? The standard sanity
    gate before preference data trains a reward model or feeds DPO —
    verbosity bias is the best-documented failure mode of LLM judges,
    and a stream that flunks this audit teaches the policy to pad.

    Input: one row per judgment with the winning and losing responses'
    lengths (characters or tokens — any consistent measure). Rows with
    a null or non-positive length on either side are dropped. Output:
    ONE summary row —

    * ``n_judgments`` — audited rows;
    * ``n_longer_wins`` / ``n_shorter_wins`` / ``n_length_ties`` —
      decisive-direction counts;
    * ``longer_win_rate`` — n_longer / (n_longer + n_shorter), the
      audit's headline (0.5 = length-blind judge; ties excluded, as in
      a sign test);
    * ``mean_log_ratio`` — avg ln(winner_len / loser_len), the effect
      size in length space;
    * ``bias_z`` — the sign-test normal deviate
      (p̂ − 0.5)·2·√n_decisive; |z| > 3 on a large stream means the
      judge is reading length, not quality.

    All rates 6-dp rounded. Scale shape: ONE map-side-combined global
    aggregate — 10⁹ judgments reduce to a single row, no shuffle wider
    than the final single-partition combine; pure closed-form column
    algebra (ln / sqrt are IEEE-correctly-rounded, so 6-dp
    canonicalization is engine-exact).
    """
    wl = F.col(winner_len_col).cast("double")
    ll = F.col(loser_len_col).cast("double")
    j = judgments.filter(
        wl.isNotNull() & ll.isNotNull() & (wl > 0) & (ll > 0)
    ).select(
        (wl > ll).cast("bigint").alias("_longer"),
        (wl < ll).cast("bigint").alias("_shorter"),
        (wl == ll).cast("bigint").alias("_tie"),
        F.log(wl / ll).alias("_lr"),
    )
    agg = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_judgments"),
        F.sum("_longer").cast("bigint").alias("n_longer_wins"),
        F.sum("_shorter").cast("bigint").alias("n_shorter_wins"),
        F.sum("_tie").cast("bigint").alias("n_length_ties"),
        F.avg("_lr").alias("_mlr"),
    )
    nd = (F.col("n_longer_wins") + F.col("n_shorter_wins")).cast("double")
    p = F.col("n_longer_wins").cast("double") / nd
    r6 = lambda c: F.round(c, 6) + F.lit(0.0)  # noqa: E731
    return agg.select(
        "n_judgments",
        "n_longer_wins",
        "n_shorter_wins",
        "n_length_ties",
        r6(F.when(nd > 0, p)).alias("longer_win_rate"),
        r6(F.col("_mlr")).alias("mean_log_ratio"),
        r6(F.when(nd > 0, (p - 0.5) * 2.0 * F.sqrt(nd))).alias("bias_z"),
    )


def transitivity_audit(
    judgments: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
    min_games: int = 1,
) -> DataFrame:
    """Judge transitivity audit — how often do the judge's MAJORITY
    preferences form a cycle (A beats B beats C beats A)? The
    structural sanity gate beside :func:`length_bias`: Bradley–Terry
    and every other leaderboard model ASSUME a transitive latent
    strength, and a judgment stream with a high cyclic-triangle rate is
    telling you the judge is answering different questions for
    different pairs (style vs correctness vs verbosity) — its ranking
    is an artifact. The standard tournament-theory measure: over every
    triple of players whose three pairwise majority directions are all
    decided, a triple is either transitive or a 3-cycle; report the
    cycle fraction.

    Per pair (a < b): majority direction from the win counts (+1 =
    a beats b, −1 = b beats a); exact ties and pairs with fewer than
    ``min_games`` judgments are undecided and excluded (their triples
    simply don't form). Per decided triple x < y < z with directions
    (d1: x-y, d2: y-z, d3: x-z): cyclic ⇔ d1 = d2 and d3 ≠ d1 (both
    rotations; every other sign pattern has a dominant vertex and is
    transitive).

    Scale shape: the 10⁹-row judgment stream reduces in ONE
    map-side-combinable ``groupBy(pair)`` — everything after runs on
    the ≤ players²-bounded pair table (players are few by nature; the
    stream is what's huge): two self-equi-joins enumerate each
    triangle exactly once (the a < b normalization makes x < y < z
    automatic). Output: one row per decided triangle —
    ``(player_x, player_y, player_z, d1, d2, d3, cyclic)`` — with
    riding panel constants (``n_triangles``, ``n_cyclic``,
    ``cyclic_rate``, ``n_pairs_decided``, ``n_players``) so the value
    hash verifies the census, not just per-triangle logic."""
    j = judgments.filter(
        F.col(winner_col).isNotNull()
        & F.col(loser_col).isNotNull()
        & (F.col(winner_col) != F.col(loser_col))
    )
    a = F.least(F.col(winner_col), F.col(loser_col))
    b = F.greatest(F.col(winner_col), F.col(loser_col))
    pairs = j.groupBy(a.alias("_a"), b.alias("_b")).agg(
        F.sum(
            F.when(F.col(winner_col) == F.least(
                F.col(winner_col), F.col(loser_col)
            ), 1).otherwise(0)
        ).alias("_wab"),
        F.count(F.lit(1)).alias("_games"),
    )
    decided = (
        pairs.filter(F.col("_games") >= min_games)
        .withColumn(
            "_dir",
            F.when(F.col("_wab") * 2 > F.col("_games"), F.lit(1)).when(
                F.col("_wab") * 2 < F.col("_games"), F.lit(-1)
            ),
        )
        .filter(F.col("_dir").isNotNull())
        .select("_a", "_b", "_dir")
    )
    p1 = decided.select(
        F.col("_a").alias("player_x"),
        F.col("_b").alias("player_y"),
        F.col("_dir").alias("d1"),
    )
    p2 = decided.select(
        F.col("_a").alias("player_y"),
        F.col("_b").alias("player_z"),
        F.col("_dir").alias("d2"),
    )
    p3 = decided.select(
        F.col("_a").alias("player_x"),
        F.col("_b").alias("player_z"),
        F.col("_dir").alias("d3"),
    )
    tri = (
        p1.join(p2, "player_y")
        .join(p3, ["player_x", "player_z"])
        .withColumn(
            "cyclic",
            (
                (F.col("d1") == F.col("d2"))
                & (F.col("d3") != F.col("d1"))
            ).cast("int"),
        )
    )
    nplayers = (
        decided.select(F.col("_a").alias("p"))
        .unionByName(decided.select(F.col("_b").alias("p")))
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_players"))
    )
    npairs = decided.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs_decided")
    )
    consts = tri.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles"),
        F.sum("cyclic").cast("bigint").alias("n_cyclic"),
        F.round(
            F.sum("cyclic").cast("double") / F.count(F.lit(1)), 6
        ).alias("cyclic_rate"),
    )
    return (
        tri.select(
            "player_x", "player_y", "player_z", "d1", "d2", "d3", "cyclic"
        )
        .crossJoin(F.broadcast(consts))
        .crossJoin(F.broadcast(npairs))
        .crossJoin(F.broadcast(nplayers))
    )


def copeland_ranking(
    judgments: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
    min_games: int = 1,
) -> DataFrame:
    """Copeland leaderboard over the majority graph — the voting-theory
    companion of :func:`bt_strengths` and the fallback
    :func:`transitivity_audit` points to: Copeland scores each player
    1 per pairwise majority win and ½ per exact majority tie, no
    latent-strength model at all, so the ranking stays meaningful when
    the cyclic-triple rate says Bradley–Terry's transitivity
    assumption is violated (inside a cycle all members simply share
    the score — honest, where BT would manufacture an ordering).
    Pairs with fewer than ``min_games`` judgments contribute nothing.

    Integer-exact: scores are DOUBLED (wins·2 + ties) so the fold and
    the ranking are pure bigint arithmetic; ``copeland`` = the halved
    6-dp presentation. Scale shape: the judgment stream reduces in the
    SAME one map-side pair groupBy as the transitivity audit;
    everything after runs on the players²-bounded pair table, the
    final rank a window over ≤ players rows. Output per player:
    ``(player, maj_wins, maj_ties, maj_losses, n_pairs, copeland,
    rank)`` with ties broken by player name (deterministic), plus a
    riding ``n_players`` constant."""
    from pyspark.sql import Window

    j = judgments.filter(
        F.col(winner_col).isNotNull()
        & F.col(loser_col).isNotNull()
        & (F.col(winner_col) != F.col(loser_col))
    )
    a = F.least(F.col(winner_col), F.col(loser_col))
    b = F.greatest(F.col(winner_col), F.col(loser_col))
    pairs = (
        j.groupBy(a.alias("_a"), b.alias("_b"))
        .agg(
            F.sum(
                F.when(
                    F.col(winner_col)
                    == F.least(F.col(winner_col), F.col(loser_col)),
                    1,
                ).otherwise(0)
            ).alias("_wab"),
            F.count(F.lit(1)).alias("_games"),
        )
        .filter(F.col("_games") >= min_games)
        .withColumn(
            "_dir",
            F.when(F.col("_wab") * 2 > F.col("_games"), F.lit(1))
            .when(F.col("_wab") * 2 < F.col("_games"), F.lit(-1))
            .otherwise(F.lit(0)),
        )
    )
    side = lambda p, d: pairs.select(  # noqa: E731
        F.col(p).alias("player"), (F.col("_dir") * d).alias("_rel")
    )
    per = (
        side("_a", 1)
        .unionByName(side("_b", -1))
        .groupBy("player")
        .agg(
            F.sum(F.when(F.col("_rel") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("maj_wins"),
            F.sum(F.when(F.col("_rel") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("maj_ties"),
            F.sum(F.when(F.col("_rel") == -1, 1).otherwise(0))
            .cast("bigint")
            .alias("maj_losses"),
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        )
        .withColumn(
            "_c2", F.col("maj_wins") * 2 + F.col("maj_ties")
        )
    )
    w = Window.orderBy(F.col("_c2").desc(), "player")
    n = per.agg(F.count(F.lit(1)).cast("bigint").alias("n_players"))
    return (
        per.withColumn("rank", F.row_number().over(w))
        .crossJoin(F.broadcast(n))
        .select(
            "player",
            "maj_wins",
            "maj_ties",
            "maj_losses",
            "n_pairs",
            F.round(F.col("_c2").cast("double") / 2.0, 6).alias("copeland"),
            "rank",
            "n_players",
        )
    )


def sprt_monitor(
    judgments: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    order_col: str = "t",
    a_won_col: str = "a_won",
    p0: float = 0.5,
    p1: float = 0.6,
    alpha: float = 0.05,
    beta: float = 0.05,
    nd: int = 6,
) -> DataFrame:
    """Wald's Sequential Probability Ratio Test per model pair — the
    EARLY-STOPPING member of the arena family. The leaderboards
    (Bradley–Terry, Copeland, Wilson) score a FINISHED judgment batch;
    an eval pipeline paying per judgment wants to stop each pairing as
    soon as the evidence clears a bar. SPRT (Wald 1945) is the optimal
    such rule: it needs on average the fewest judgments of ANY test
    with the same error rates.

    Input: one row per judgment, ``(a, b, order, a_won)`` with the pair
    canonically oriented (a < b) and ``order`` the judgment sequence
    (timestamp or index; ties broken by the column itself being
    unique per pair). Testing H0: P(a wins) = ``p0`` against
    H1: P(a wins) = ``p1`` with type-I/II error targets ``alpha`` /
    ``beta``, each judgment adds ``ln(p1/p0)`` (a won) or
    ``ln((1-p1)/(1-p0))`` (b won) to the pair's log-likelihood ratio;
    the pair DECIDES the first time the running LLR leaves
    ``(ln(beta/(1-alpha)), ln((1-beta)/alpha))`` — ``accept_h1`` above
    (a is better at the tested margin), ``accept_h0`` below.

    Output: ONE row per pair — ``(a, b, n_judgments, llr_final,
    decision, n_decision, llr_at_decision)`` — ``decision`` is
    ``'continue'`` with null ``n_decision`` when the stream ends
    inside the corridor (the honest "keep collecting" verdict).
    Boundary comparisons use the ``nd``-dp ROUNDED running LLR
    (engine-deterministic, the house ks_drift/cusum convention).

    Scale shape: ONE exchange on the pair key; the running LLR is a
    plain ordered cumulative sum (increments are two literals — no
    per-row transcendentals), the first-crossing is a conditional MIN
    in the same partitioning, and the summary groupBy reuses it — a
    10⁹-judgment stream reduces to a players²-bounded table with no
    window wider than one pair. No UDFs, no collect.
    """
    import math

    up = math.log(p1 / p0)
    down = math.log((1.0 - p1) / (1.0 - p0))
    hi = math.log((1.0 - beta) / alpha)
    lo = math.log(beta / (1.0 - alpha))

    w = Window.partitionBy("a", "b").orderBy("_t")
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    inc = F.when(F.col("_aw"), F.lit(up)).otherwise(F.lit(down))
    staged = (
        judgments.select(
            F.col(a_col).alias("a"),
            F.col(b_col).alias("b"),
            F.col(order_col).alias("_t"),
            F.col(a_won_col).alias("_aw"),
        )
        .withColumn("_n", F.row_number().over(Window.partitionBy("a", "b").orderBy("_t")))
        .withColumn("_llr", F.round(F.sum(inc).over(wcum), nd))
        .withColumn(
            "_cross",
            F.when(F.col("_llr") >= hi, F.lit("accept_h1")).when(
                F.col("_llr") <= lo, F.lit("accept_h0")
            ),
        )
    )
    r6 = lambda c: F.round(c, nd) + F.lit(0.0)  # noqa: E731
    out = staged.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_judgments"),
        F.max_by(F.col("_llr"), F.col("_n")).alias("_llr_final"),
        F.min(F.when(F.col("_cross").isNotNull(), F.col("_n"))).alias("_nd"),
        F.min_by(
            F.when(F.col("_cross").isNotNull(), F.struct("_cross", "_llr")),
            F.when(F.col("_cross").isNotNull(), F.col("_n")),
        ).alias("_dec"),
    )
    return out.select(
        "a",
        "b",
        "n_judgments",
        r6(F.col("_llr_final")).alias("llr_final"),
        F.coalesce(F.col("_dec._cross"), F.lit("continue")).alias("decision"),
        F.col("_nd").cast("bigint").alias("n_decision"),
        r6(F.col("_dec._llr")).alias("llr_at_decision"),
    )


#: cumulative Poisson(1) CDF scaled to integer millionths — the
#: inverse-CDF ladder for the deterministic online bootstrap. Integer
#: thresholds mean the weight is a pure bigint comparison, replayable
#: bit-for-bit in any engine with md5 (the hash_bucket convention).
POISSON1_MILLIONTHS = (367879, 735758, 919698, 981011, 996340, 999405, 999916)


def bootstrap_winrate_ci(
    judgments: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    order_col: str = "t",
    a_won_col: str = "a_won",
    n_boot: int = 200,
    conf: float = 0.95,
    seed: str = "bs",
    nd: int = 6,
) -> DataFrame:
    """Percentile-bootstrap confidence interval for each pair's win
    rate — the UNCERTAINTY companion of `winrate_matrix` (whose Wilson
    bound assumes independent Bernoulli wins; the bootstrap makes no
    parametric assumption and generalizes to any per-pair statistic).

    Online (Poisson) bootstrap, the standard one-pass distributed
    form: resampling n rows with replacement is, per row, Binomial(n,
    1/n) ≈ Poisson(1) copies — so each judgment row gets, for every
    replicate b, a DETERMINISTIC Poisson(1) weight drawn by inverse
    CDF from an md5 integer bucket of (seed, b, pair, order). No RNG
    state: every engine, rerun, and retry sees the same resamples
    (hash-sampling's composability argument, `corpus.hash_bucket`).
    Weights are capped at 7 (P(W>7) < 1e-5; at most a 1e-5 relative
    distortion of the resample mass, far inside bootstrap noise).

    Output per pair: ``(a, b, n_judgments, win_rate, ci_lo, ci_hi,
    ci_width, n_boot)`` — ``ci_lo``/``ci_hi`` the (1∓conf)/2 exact
    percentiles across the ``n_boot`` replicate rates (replicates
    whose total weight resamples to zero are dropped — the honest
    convention for tiny pairs).

    Scale shape: the replicate explode multiplies the stream by
    ``n_boot`` BUT feeds straight into a map-side-combinable
    groupBy(pair, replicate) — what shuffles is pairs × n_boot
    aggregate rows, not the exploded stream; the percentile then runs
    per pair over ``n_boot`` doubles (bounded state). One more tiny
    groupBy for the point estimate joins back on the pair key.
    """
    lo_q, hi_q = (1.0 - conf) / 2.0, 1.0 - (1.0 - conf) / 2.0
    base = judgments.select(
        F.col(a_col).alias("a"),
        F.col(b_col).alias("b"),
        F.col(order_col).cast("string").alias("_t"),
        F.col(a_won_col).cast("int").alias("_aw"),
    )
    reps = base.withColumn(
        "_rep", F.explode(F.sequence(F.lit(1), F.lit(int(n_boot))))
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.lit(seed),
                        F.col("_rep").cast("string"),
                        F.col("a"),
                        F.col("b"),
                        F.col("_t"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 1000000
    )
    w = F.lit(7)
    for k in range(len(POISSON1_MILLIONTHS) - 1, -1, -1):
        w = F.when(bucket < POISSON1_MILLIONTHS[k], F.lit(k)).otherwise(w)
    per_rep = (
        reps.withColumn("_w", w.cast("bigint"))
        .groupBy("a", "b", "_rep")
        .agg(
            F.sum("_w").alias("_wt"),
            F.sum(F.col("_w") * F.col("_aw")).alias("_ww"),
        )
        .where(F.col("_wt") > 0)
        .withColumn("_rate", F.col("_ww").cast("double") / F.col("_wt"))
    )
    ci = per_rep.groupBy("a", "b").agg(
        F.percentile(F.col("_rate"), F.array(F.lit(lo_q), F.lit(hi_q))).alias(
            "_ci"
        ),
        F.count(F.lit(1)).cast("bigint").alias("_nrep"),
    )
    point = base.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_judgments"),
        F.sum("_aw").cast("bigint").alias("_wins"),
    )
    r6 = lambda c: F.round(c, nd) + F.lit(0.0)  # noqa: E731
    return point.join(ci, ["a", "b"]).select(
        "a",
        "b",
        "n_judgments",
        r6(F.col("_wins").cast("double") / F.col("n_judgments")).alias(
            "win_rate"
        ),
        r6(F.element_at("_ci", 1)).alias("ci_lo"),
        r6(F.element_at("_ci", 2)).alias("ci_hi"),
        r6(F.element_at("_ci", 2) - F.element_at("_ci", 1)).alias("ci_width"),
        F.col("_nrep").alias("n_boot"),
    )
