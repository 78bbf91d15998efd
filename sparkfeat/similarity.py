"""Similarity search over embedding columns (array<float>).

* :func:`cosine_topk` — brute-force baseline: broadcast the (small)
  probe set against the corpus, JVM-side dot product via
  ``zip_with``+``aggregate`` (no Python in the loop), per-probe top-k by
  window rank. Exact; O(probes × corpus) — the verification baseline
  and the right answer when probes ≪ corpus.
* :func:`ivf_topk` — IVF-style scale path: corpus assigned to the
  nearest of C centroids once (one pass), probes search only their
  ``nprobe`` nearest centroid buckets — the candidate set shrinks by
  ~C/nprobe. Same scoring expressions; recall measured in tests against
  the brute-force baseline.

All math widens float32 → double first so results are reproducible
across engines (and the DuckDB oracle agrees)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def with_cosine(df: DataFrame, a_col: str, b_col: str, out_col: str = "cosine") -> DataFrame:
    a, b = _as_double(F.col(a_col)), _as_double(F.col(b_col))
    return df.withColumn(out_col, _dot(a, b) / (_norm(a) * _norm(b)))


def cosine_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id: str = "probe_id",
) -> DataFrame:
    """Exact top-k by cosine for each probe (excluding self-matches on
    equal ids). Probe set is broadcast; ties broken by corpus id. Both
    sides are pre-normalized to unit vectors, so the per-pair score is
    one dot-product fold (the oracle mirrors the same normalize-then-dot
    order)."""
    p = (
        probes.select(F.col(probe_id), _as_double(F.col(vec_col)).alias("_pv"))
        .withColumn("_pn", _norm(F.col("_pv")))
        .select(
            probe_id, F.transform("_pv", lambda x: x / F.col("_pn")).alias("_pu")
        )
    )
    c = (
        corpus.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_cv"))
        .withColumn("_cn", _norm(F.col("_cv")))
        .select(id_col, F.transform("_cv", lambda x: x / F.col("_cn")).alias("_cu"))
    )
    scored = (
        c.crossJoin(F.broadcast(p))
        .filter(F.col(id_col) != F.col(probe_id))
        .withColumn("cosine", _dot(F.col("_pu"), F.col("_cu")))
    )
    w = Window.partitionBy(probe_id).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= k)
        .select(probe_id, id_col, "cosine", "rk")
    )


def ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic IVF centroids: the first ``n_centroids`` corpus
    vectors by id (a k-means fit would slot in here; determinism matters
    more for the parity harness). Emits (cent_id, _centv)."""
    cents = (
        corpus.orderBy(id_col)
        .limit(n_centroids)
        .select(
            F.col(id_col).alias("_cent_rank_src"),
            _as_double(F.col(vec_col)).alias("_centv"),
        )
    )
    w_c = Window.orderBy("_cent_rank_src")
    return cents.withColumn("cent_id", F.row_number().over(w_c) - 1).drop(
        "_cent_rank_src"
    )


def ivf_assign(
    corpus: DataFrame,
    cents: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_assign: int = 1,
) -> DataFrame:
    """Attach every corpus vector to its ``n_assign`` nearest centroids
    by cosine (ties → lower cent_id). One broadcast pass; emits one
    (id, _cv, cent_id) row per assignment. ``n_assign > 1`` is the
    multi-probe trick: candidates recalled through ANY shared bucket —
    shared by ivf_topk (n_assign=1) and the bucketed embedding near-dup."""
    c = corpus.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_cv"))
    assign_w = Window.partitionBy(id_col).orderBy(
        F.col("_sim").desc(), F.col("cent_id")
    )
    return (
        c.crossJoin(F.broadcast(cents))
        .withColumn("_sim", _dot(F.col("_cv"), F.col("_centv")) / (_norm(F.col("_cv")) * _norm(F.col("_centv"))))
        .withColumn("_r", F.row_number().over(assign_w))
        .filter(F.col("_r") <= n_assign)
        .select(id_col, "_cv", "cent_id")
    )


def kmeans_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed Lloyd's k-means refinement of the IVF centroids
    (cosine assignment): init = first-C-by-id (the deterministic seed),
    then ``n_iter`` rounds of broadcast-assign → per-cluster
    element-wise mean (posexplode + groupBy avg — never collects the
    corpus). Empty clusters keep their previous centroid. Better-shaped
    buckets than the raw seed → higher recall per nprobe; the fit cost
    is n_iter broadcast passes over the corpus. A production run would
    checkpoint the (C × dim) centroid table between rounds to cut
    lineage; at these C it is a trivial plan."""
    cents = ivf_centroids(corpus, n_centroids, id_col, vec_col)
    for _ in range(n_iter):
        assigned = ivf_assign(corpus, cents, id_col, vec_col)
        pos = assigned.select(
            "cent_id", F.posexplode("_cv").alias("_pos", "_val")
        )
        means = pos.groupBy("cent_id", "_pos").agg(F.avg("_val").alias("_m"))
        new = (
            means.groupBy("cent_id")
            .agg(F.array_sort(F.collect_list(F.struct("_pos", "_m"))).alias("_s"))
            .select(
                "cent_id", F.transform("_s", lambda x: x["_m"]).alias("_centv")
            )
        )
        cents = (
            cents.select("cent_id", F.col("_centv").alias("_prev"))
            .join(new, "cent_id", "left")
            .select(
                "cent_id", F.coalesce(F.col("_centv"), F.col("_prev")).alias("_centv")
            )
        )
    return cents


def ivf_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id: str = "probe_id",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-bucketed approximate top-k.

    Corpus rows attach to their nearest centroid; each probe scans only
    its ``nprobe`` nearest buckets. At 10^9 vectors this turns a full
    scan into nprobe/C of one. ``centroids`` overrides the deterministic
    first-C seed — pass :func:`kmeans_centroids` output for real
    cluster-shaped buckets."""
    cents = (
        centroids
        if centroids is not None
        else ivf_centroids(corpus, n_centroids, id_col, vec_col)
    )
    assigned = (
        ivf_assign(corpus, cents, id_col, vec_col)
        .withColumn("_cn", _norm(F.col("_cv")))
        .select(
            id_col,
            "cent_id",
            F.transform("_cv", lambda x: x / F.col("_cn")).alias("_cu"),
        )
    )

    p = probes.select(F.col(probe_id), _as_double(F.col(vec_col)).alias("_pv"))
    probe_w = Window.partitionBy(probe_id).orderBy(F.col("_sim").desc(), F.col("cent_id"))
    probe_cents = (
        p.crossJoin(F.broadcast(cents))
        .withColumn("_sim", _dot(F.col("_pv"), F.col("_centv")) / (_norm(F.col("_pv")) * _norm(F.col("_centv"))))
        .withColumn("_r", F.row_number().over(probe_w))
        .filter(F.col("_r") <= nprobe)
        .withColumn("_pn", _norm(F.col("_pv")))
        .select(
            probe_id,
            "cent_id",
            F.transform("_pv", lambda x: x / F.col("_pn")).alias("_pu"),
        )
    )

    # pre-normalized sides ⇒ the in-bucket score is one dot-product fold
    scored = (
        assigned.join(probe_cents, "cent_id")
        .filter(F.col(id_col) != F.col(probe_id))
        .withColumn("cosine", _dot(F.col("_pu"), F.col("_cu")))
    )
    w = Window.partitionBy(probe_id).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= k)
        .select(probe_id, id_col, "cosine", "rk")
    )
