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
* :func:`lsh_topk` — the other scale path: random-hyperplane (sign)
  LSH with Hamming-1 multi-probe (Lv et al., VLDB'07). Hyperplanes are
  derived from md5 so they exist without touching the data (no fit
  pass at all, unlike IVF); vectors sharing any band of sign bits —
  exactly, or within one flipped bit on the probe side — become
  candidates. Data-independent bucketing — the right trade when the
  corpus churns faster than a centroid fit is worth re-running.

All math widens float32 → double first so results are reproducible
across engines (and the DuckDB oracle agrees)."""

from __future__ import annotations

import numpy as np
import pandas as pd
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
    # spread the corpus before the per-(vector, probe) dot-product fan-out:
    # the HOF dot fold is the CPU and would otherwise run inside however
    # few scan splits the source file produced (1, for a small parquet)
    corpus = corpus.repartition(
        corpus.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
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
    checkpoint: bool = False,
) -> DataFrame:
    """Distributed Lloyd's k-means refinement of the IVF centroids
    (cosine assignment): init = first-C-by-id (the deterministic seed),
    then ``n_iter`` rounds of broadcast-assign → per-cluster
    element-wise mean (posexplode + groupBy avg — never collects the
    corpus). Empty clusters keep their previous centroid. Better-shaped
    buckets than the raw seed → higher recall per nprobe; the fit cost
    is n_iter broadcast passes over the corpus.

    ``checkpoint=True`` cuts lineage between Lloyd rounds with an eager
    ``localCheckpoint()`` on the (C × dim) centroid table: without it
    the centroid plan nests one full corpus-assignment subtree per
    round (plan depth — and Catalyst analysis cost — grows linearly in
    ``n_iter``, and a failure-triggered recompute replays every round);
    with it each round's plan hangs off a materialized C-row table, so
    plan size is constant in ``n_iter`` (pytest-asserted) and each
    corpus pass runs exactly once. The flag defaults to off so the
    fully-lazy plan (replayable by the DuckDB oracle with no side
    effects) stays the default; large ``n_iter``/C fits should turn it
    on. Checkpointed values are the computed centroids, so results are
    bit-identical either way (pytest-asserted)."""
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
        if checkpoint:
            cents = cents.localCheckpoint(eager=True)
    return cents


def lsh_planes(dim: int, n_planes: int = 16, tag: str = "lsh") -> np.ndarray:
    """Deterministic random hyperplanes, component (h, d) = uniform in
    [-1, 1) derived from ``md5_lower64(f"{tag}:{h}:{d}")``. No data, no
    RNG state — any engine (the DuckDB oracle inlines the same values)
    and any executor regenerates the identical planes."""
    from sparkfeat.text import md5_lower64_np

    keys = [f"{tag}:{h}:{d}" for h in range(n_planes) for d in range(dim)]
    u = md5_lower64_np(keys).astype(np.float64)
    return (u / 9223372036854775808.0 - 1.0).reshape(n_planes, dim)


def _lsh_bands(vec_sql: str, planes: np.ndarray, n_bands: int):
    """Array-of-band-keys expression for one vector column (given as a
    SQL fragment): bit_h = (v·plane_h ≥ 0), band b packs bits
    [rb·b, rb·(b+1)) little-endian. Pure JVM folds — same left-to-right
    order as DuckDB's list_dot_product, so the oracle reproduces every
    bit. Built as ONE ``F.expr`` SQL string: per-element ``F.lit`` /
    lambda-HOF construction costs ~55 ms of py4j round-trips *per
    plane* (≈5 s at 48×64); one string is a single driver call. The
    ``D`` suffix makes every literal a DoubleType (shortest-repr
    round-trips exactly); plain decimals would parse as DECIMAL under
    ANSI mode and lose precision."""
    n_planes = len(planes)
    rb = n_planes // n_bands

    def dot(p):
        arr = "array(" + ",".join(repr(float(w)) + "D" for w in p) + ")"
        return (
            f"aggregate(zip_with({vec_sql}, {arr}, (x, y) -> x * y), "
            "0.0D, (acc, x) -> acc + x)"
        )

    bit = [f"(CASE WHEN {dot(p)} >= 0 THEN 1 ELSE 0 END)" for p in planes]
    keys = [
        " + ".join(f"{bit[b * rb + j]} * {1 << j}" for j in range(rb))
        for b in range(n_bands)
    ]
    return F.expr("array(" + ", ".join(keys) + ")")


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    n_centroids: int = 16,
    kmeans_iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: bool = False,
) -> None:
    """Fit-and-persist the IVF index — the build/serve separation a
    production ANN deployment runs: centroids (tiny) and the
    pre-normalized assigned corpus written ``partitionBy('cent_id')``,
    so a probe's ``nprobe`` buckets are whole parquet partitions and
    serving reads ONLY those (dynamic partition pruning against the
    broadcast probe-bucket set — at 10^9 vectors a search touches
    nprobe/C of the files, not nprobe/C of the rows of every file).
    ``kmeans_iters > 0`` refines the deterministic first-C seed with
    distributed Lloyd rounds before assignment. ``quantize=True``
    stores the normalized vectors int8 (per-vector symmetric scale —
    8× smaller on disk/RAM than the double array; unit vectors never
    have scale 0) and :func:`ivf_topk_index` dequantizes on read —
    rank drift is bounded by the ≤ scale/2 element error
    (pytest-pinned ≥4/5 top-5 agreement vs the float index)."""
    cents = (
        kmeans_centroids(corpus, n_centroids, kmeans_iters, id_col, vec_col)
        if kmeans_iters
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
    if quantize:
        scale = F.array_max(F.transform("_cu", F.abs)) / F.lit(127.0)
        assigned = assigned.select(
            id_col,
            "cent_id",
            scale.alias("_scale"),
            F.transform(
                "_cu", lambda x: F.round(x / scale, 0).cast("tinyint")
            ).alias("_q"),
        )
    assigned.write.mode("overwrite").partitionBy("cent_id").parquet(
        f"{path}/assignments"
    )
    cents.write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_topk_index(
    spark,
    path: str,
    probes: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id: str = "probe_id",
) -> DataFrame:
    """Serve top-k from a persisted :func:`build_ivf_index` — no fit, no
    corpus pass: probes rank the stored centroids, and the bucket join
    against the partitioned assignments broadcast-prunes to the probed
    ``cent_id`` partitions. Scores are identical to :func:`ivf_topk`
    with the same centroids (same pre-normalized dot)."""
    cents = spark.read.parquet(f"{path}/centroids")
    assigned = spark.read.parquet(f"{path}/assignments")
    if "_q" in assigned.columns:  # int8-stored index: dequantize on read
        assigned = assigned.select(
            id_col,
            "cent_id",
            F.transform(
                "_q", lambda qi: qi.cast("double") * F.col("_scale")
            ).alias("_cu"),
        )

    p = probes.select(F.col(probe_id), _as_double(F.col(vec_col)).alias("_pv"))
    probe_w = Window.partitionBy(probe_id).orderBy(
        F.col("_sim").desc(), F.col("cent_id")
    )
    probe_cents = (
        p.crossJoin(F.broadcast(cents))
        .withColumn(
            "_sim",
            _dot(F.col("_pv"), F.col("_centv"))
            / (_norm(F.col("_pv")) * _norm(F.col("_centv"))),
        )
        .withColumn("_r", F.row_number().over(probe_w))
        .filter(F.col("_r") <= nprobe)
        .withColumn("_pn", _norm(F.col("_pv")))
        .select(
            probe_id,
            "cent_id",
            F.transform("_pv", lambda x: x / F.col("_pn")).alias("_pu"),
        )
    )
    scored = (
        assigned.join(F.broadcast(probe_cents), "cent_id")
        .filter(F.col(id_col) != F.col(probe_id))
        .withColumn("cosine", _dot(F.col("_pu"), F.col("_cu")))
    )
    w = Window.partitionBy(probe_id).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= k)
        .select(probe_id, id_col, "cosine", "rk")
    )


def _lsh_bands_arrow(
    df: DataFrame,
    key: str,
    planes: "np.ndarray",
    n_bands: int,
    vec_col: str,
) -> DataFrame:
    """Arrow/BLAS twin of the :func:`_lsh_bands` expression: one
    ``V @ planes.T`` matmul per Arrow batch instead of n_planes
    interpreted folds per row (~1000× per-row at 48×64). The scale path
    for hashing a large corpus; the dot products can differ from the
    sequential fold only in the last ulp (pairwise vs left-to-right
    summation), which flips a sign bit only when |v·p| is within ~1e-13
    of zero — the equality is pytest-asserted on the fixture corpus."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    key_field = df.schema[key]
    schema = StructType(
        [
            StructField(key, key_field.dataType, key_field.nullable),
            StructField("band_idx", IntegerType(), False),
            StructField("band_key", IntegerType(), False),
        ]
    )
    n_planes = len(planes)
    rb = n_planes // n_bands
    pt = planes.T.copy()
    pows = (1 << np.arange(rb)).astype(np.int64)

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack([np.asarray(x, dtype=np.float64) for x in pdf[vec_col]])
            bits = (v @ pt) >= 0
            bk = (bits.reshape(len(v), n_bands, rb) * pows).sum(axis=2)
            ids = np.repeat(pdf[key].to_numpy(), n_bands)
            bidx = np.tile(np.arange(n_bands, dtype=np.int32), len(v))
            yield pd.DataFrame(
                {key: ids, "band_idx": bidx, "band_key": bk.reshape(-1).astype(np.int32)}
            )

    return df.select(key, vec_col).mapInPandas(run, schema)


def lsh_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    n_planes: int = 48,
    n_bands: int = 8,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id: str = "probe_id",
    dim: int | None = None,
    tag: str = "lsh",
    sign_impl: str = "expr",
) -> DataFrame:
    """Random-hyperplane LSH approximate top-k: corpus and probes are
    hashed into ``n_bands`` sign-bit band buckets (collision probability
    per bit = 1 − θ/π); candidates = pairs sharing ANY band bucket,
    then exact cosine + window rank on the (small) candidate set only.

    ``probe_hamming=1`` enables multi-probe LSH (Lv et al., VLDB'07):
    each probe also visits every band key at Hamming distance 1 (one
    sign bit flipped), which multiplies per-band neighbour recall by
    roughly (1 + rb·(1−p)/p) at the cost of rb extra probe keys per
    band — the published trade of probes-for-tables that keeps index
    storage flat at corpus scale. Only the (tiny) probe side expands;
    the corpus is still hashed exactly once per band.

    Scale shape: one narrow (id, band_idx, band_key) table per side,
    an equi-join on the band key (hash shuffle, no cartesian), distinct,
    then a candidate-sized scoring join. Unlike IVF there is no fit
    pass — the planes are constants — so the corpus is touched exactly
    once before the join.

    ``sign_impl='expr'`` (default) computes the sign bits with JVM
    folds in the exact left-to-right order the DuckDB oracle replays;
    ``'arrow'`` swaps in :func:`_lsh_bands_arrow` (one BLAS matmul per
    Arrow batch — the throughput path for hashing 10^8-row corpora,
    ~1000× less per-row sign cost, same results on any non-degenerate
    input)."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = lsh_planes(dim, n_planes, tag)
    rb = n_planes // n_bands

    def units(df, key):
        d = df.select(F.col(key), _as_double(F.col(vec_col)).alias("_v"))
        d = d.withColumn("_n", _norm(F.col("_v")))
        return d.select(
            key, F.transform("_v", lambda x: x / F.col("_n")).alias("_u")
        )

    key_array = _lsh_bands(
        f"transform({vec_col}, x -> CAST(x AS DOUBLE))", planes, n_bands
    )

    def bands(df, key, hamming=0):
        # posexplode first: the Generate node is a projection barrier, so
        # the 48 dot-product folds are planned exactly once per row — the
        # mask expansion below XORs the *exploded* key attribute instead
        # of duplicating the fold expression tree 7x (which multiplies
        # Catalyst analysis cost by the mask count).
        if sign_impl == "arrow":
            out = _lsh_bands_arrow(df, key, planes, n_bands, vec_col)
        else:
            out = df.select(
                F.col(key), F.posexplode(key_array).alias("band_idx", "band_key")
            )
        if hamming:
            masks = F.array(*[F.lit(m) for m in [0] + [1 << j for j in range(rb)]])
            out = out.select(
                key, "band_idx", F.col("band_key").alias("_k"),
                F.explode(masks).alias("_m"),
            ).select(
                key, "band_idx", F.col("_k").bitwiseXOR(F.col("_m")).alias("band_key")
            )
        return out

    cb = bands(corpus, id_col)
    pb = bands(probes, probe_id, hamming=probe_hamming)
    cand = (
        cb.join(pb, ["band_idx", "band_key"])
        .filter(F.col(id_col) != F.col(probe_id))
        .select(probe_id, id_col)
        .distinct()
    )
    scored = (
        cand.join(units(corpus, id_col), id_col)
        .join(F.broadcast(units(probes, probe_id).withColumnRenamed("_u", "_pu")), probe_id)
        .withColumn("cosine", _dot(F.col("_pu"), F.col("_u")))
    )
    w = Window.partitionBy(probe_id).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= k)
        .select(probe_id, id_col, "cosine", "rk")
    )


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


def quantize_int8(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector int8 quantization of an embedding column:
    ``scale = max|x| / 127``, ``q_i = round(x_i / scale)`` (ties away
    from zero — Spark ROUND ≡ SQL ROUND, engine-replayable) stored as
    ``array<tinyint>`` — 4× smaller than float32, the standard memory
    lever for serving a 10⁹-vector ANN index from RAM. Pure expression
    work (transform/array_max), map-only, fuses into the scan; the
    audit columns a pipeline gates on before switching the index over —
    dequantized cosine vs the exact vector and the max absolute
    element error (≤ scale/2 by construction, pytest-pinned) — come
    from :func:`quantize_audit`. Zero vectors (scale 0) keep a null
    ``q`` rather than poisoning a division."""
    v = _as_double(F.col(vec_col))
    amax = F.array_max(F.transform(v, F.abs))
    scale = amax / F.lit(127.0)
    q = F.when(
        amax > 0,
        F.transform(v, lambda x: F.round(x / scale, 0).cast("tinyint")),
    )
    return df.select(
        F.col(id_col), scale.alias("scale"), q.alias("q"), F.col(vec_col)
    )


def quantize_audit(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector int8 round-trip audit: dequantized-vs-exact cosine
    and max absolute element error. One projection over
    :func:`quantize_int8` — still map-only, no shuffle."""
    qd = quantize_int8(df, id_col, vec_col)
    v = _as_double(F.col(vec_col))
    dq = F.transform(F.col("q"), lambda qi: qi.cast("double") * F.col("scale"))
    err = F.array_max(F.zip_with(v, dq, lambda a, b: F.abs(a - b)))
    return qd.select(
        id_col,
        "scale",
        (_dot(v, dq) / (_norm(v) * _norm(dq))).alias("cos_sim"),
        err.alias("max_abs_err"),
    )


def semantic_contamination(
    corpus: DataFrame,
    bench: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space test-set-leakage sweep: flag every corpus vector
    whose cosine against ANY benchmark/eval vector reaches
    ``threshold`` — the semantic complement of
    ``corpus.decontaminate``'s n-gram overlap check (catches
    paraphrased eval leakage that shares no 8-gram; the pairing CCNet/
    GPT-3-style pipelines run both of).

    Scale shape: eval sets are thousands of vectors, not TBs, so the
    WHOLE normalized bench matrix packs into ONE row (``collect_list``
    inside an agg — the tiny side, never the corpus) and broadcast-
    crossJoins onto the corpus scan; per corpus vector the bench
    cosines are one in-row ``transform`` over that array. The 100 TB
    side is MAP-ONLY — no groupBy, no exchange, no window: the sweep
    fuses into the corpus scan (plan-asserted in tests). ``max`` and
    ``count`` over the in-row cosine list are order-insensitive, so
    the nondeterministic ``collect_list`` order never reaches the
    output.

    Output: one row per corpus vector — ``max_cosine`` (NULL iff the
    bench is empty), ``n_above`` (bench vectors at/over threshold),
    ``contaminated``.
    """
    b = (
        bench.select(_as_double(F.col(vec_col)).alias("_bv"))
        .withColumn("_bn", _norm(F.col("_bv")))
        .select(F.transform("_bv", lambda x: x / F.col("_bn")).alias("_bu"))
        .agg(F.collect_list("_bu").alias("_bus"))
    )
    c = (
        corpus.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_cv"))
        .withColumn("_cn", _norm(F.col("_cv")))
        .select(id_col, F.transform("_cv", lambda x: x / F.col("_cn")).alias("_cu"))
    )
    cos = F.transform(
        "_bus", lambda bv: _dot(F.col("_cu"), bv)
    )
    scored = c.crossJoin(F.broadcast(b)).withColumn("_cos", cos)
    n_above = F.size(
        F.filter("_cos", lambda x: x >= F.lit(float(threshold)))
    ).cast("bigint")
    return scored.select(
        F.col(id_col),
        F.array_max("_cos").alias("max_cosine"),
        n_above.alias("n_above"),
        (n_above > 0).alias("contaminated"),
    )


def hard_negatives(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    lo: float = 0.15,
    hi: float = 0.42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id: str = "probe_id",
) -> DataFrame:
    """Hard-negative mining for contrastive / embedding training
    (DPR / Contriever style): for each probe, the top-``k`` corpus
    vectors whose cosine lands in the band ``[lo, hi)`` — similar
    enough to be informative negatives, but BELOW the positive /
    near-dup ceiling ``hi`` (above it they'd be false negatives that
    poison the loss).

    Scale shape: probes (training queries) broadcast like every other
    probe set here; the band filter is applied map-side BEFORE the
    per-probe rank, so the window only ever sees in-band candidates
    (at web scale the band is a thin shell — the filter is the whole
    point). Ties break on corpus id, deterministic on any cluster.
    For a 10⁹-vector corpus swap the brute scoring for the IVF bucket
    candidates (``ivf_topk``'s assignment tables) and keep the same
    band + rank tail.

    Output: (probe_id, id, cosine, rk) — ``rk`` 1..k by cosine DESC
    within the band.
    """
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
    banded = (
        c.crossJoin(F.broadcast(p))
        .filter(F.col(id_col) != F.col(probe_id))
        .withColumn("cosine", _dot(F.col("_pu"), F.col("_cu")))
        .filter(
            (F.col("cosine") >= F.lit(float(lo)))
            & (F.col("cosine") < F.lit(float(hi)))
        )
    )
    w = Window.partitionBy(probe_id).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        banded.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= k)
        .select(probe_id, id_col, "cosine", "rk")
    )


def cluster_balanced_sample(
    corpus: DataFrame,
    n_centroids: int = 16,
    k_per_cluster: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "cb",
    shards: int = 32,
) -> DataFrame:
    """Semantic-diversity balancing: exactly ``k_per_cluster`` vectors
    from EACH embedding cluster — the SemDeDup-adjacent curation move
    that keeps a corpus's topic coverage flat instead of letting the
    dominant mode (one crawl template, one language register) own the
    sample. Metadata-keyed balancing (`corpus.mixture_sample` on
    source/lang) can't see semantic skew INSIDE a key; clustering the
    embedding space and sampling per cluster can.

    Composition of two verified parts: `ivf_assign` (broadcast
    nearest-centroid pass — each vector touches only the
    n_centroids-row broadcast, never another vector) labels every
    vector with its cluster, then `corpus.eval_sample`'s two-phase
    exact-k rank (md5(seed‖id) order, per-(cluster, shard) prune to k
    before the per-cluster rank sees ≤ shards·k survivors) draws the
    deterministic sample — no single task ever owns a whole cluster,
    so a 90%-of-corpus mega-cluster is as safe as a tail one.

    Output: ``(cent_id, id, sample_rank)`` — clusters smaller than
    ``k_per_cluster`` contribute everything they have (honest, not
    padded). Membership is a pure function of (centroids, seed, id).
    """
    from sparkfeat.corpus import eval_sample

    cents = ivf_centroids(corpus, n_centroids, id_col=id_col, vec_col=vec_col)
    assigned = ivf_assign(corpus, cents, id_col=id_col, vec_col=vec_col).select(
        id_col, "cent_id"
    )
    return eval_sample(
        assigned,
        k=k_per_cluster,
        group_col="cent_id",
        id_col=id_col,
        seed=seed,
        shards=shards,
    )


def dim_truncation_audit(
    corpus: DataFrame,
    probes: DataFrame,
    dims: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id: str = "probe_id",
    nd: int = 6,
) -> DataFrame:
    """Matryoshka-style storage audit: how much ANN quality survives
    truncating embeddings to their first ``d`` dimensions? (The OTHER
    storage lever beside `quantize_int8` — int8 cuts bytes per dim,
    truncation cuts dims; MRL-trained encoders make prefixes usable,
    and this table says whether YOURS are.)

    For each budget ``d`` in ``dims``: the exact cosine top-k is
    recomputed with both sides sliced to their first ``d`` components
    (re-normalized — the slice changes the norm), and compared to the
    full-dimension top-k per probe. One output row per (probe,
    budget): ``(probe_id, n_dims, overlap_at_k, top1_kept,
    mean_full_cosine_of_trunc_topk)`` — the last column scores the
    truncated ranking's picks UNDER THE FULL metric (what you actually
    lose by serving the truncated index; set overlap alone overstates
    damage when the swapped-in neighbors are nearly as close).

    Scale shape: each budget is one `cosine_topk` pass (probes
    broadcast, corpus scanned; the slice fuses into the scan) plus a
    probe-keyed join of two k-row-per-probe tables and a full-metric
    rescoring join on (probe, neighbor) — all equi-joins on small
    keys. Budgets are a Python loop over UNIONed plans (the lattice is
    |dims| literal slices of one scan, AQE handles reuse); no UDFs.
    """
    full = cosine_topk(
        corpus, probes, k=k, id_col=id_col, vec_col=vec_col, probe_id=probe_id
    ).select(
        F.col(probe_id),
        F.col(id_col).alias("_fid"),
        F.col("rk").alias("_frk"),
        F.col("cosine").alias("_fcos"),
    )
    full_sets = full.groupBy(probe_id).agg(
        F.collect_list("_fid").alias("_fids"),
        F.max_by("_fid", -F.col("_frk")).alias("_ftop1"),
    )
    # full-metric cosine for every (probe, corpus) pair the truncated
    # rankings might pick: recompute lazily per pair via a rescoring
    # join against the full-dim normalized tables
    outs = []
    for d in dims:
        tc = corpus.select(
            F.col(id_col), F.slice(F.col(vec_col), 1, d).alias(vec_col)
        )
        tp = probes.select(
            F.col(probe_id), F.slice(F.col(vec_col), 1, d).alias(vec_col)
        )
        tk = cosine_topk(
            tc, tp, k=k, id_col=id_col, vec_col=vec_col, probe_id=probe_id
        )
        # score the truncated ranking's picks UNDER THE FULL metric via
        # an exact rescoring join against the raw vectors (rounded 6dp
        # like every cosine in this module, so the oracle replays it)
        raw_p = probes.select(
            F.col(probe_id), _as_double(F.col(vec_col)).alias("_pv")
        )
        raw_c = corpus.select(
            F.col(id_col), _as_double(F.col(vec_col)).alias("_cv")
        )
        rescored = (
            tk.select(F.col(probe_id), F.col(id_col), F.col("rk"))
            .join(F.broadcast(raw_p), probe_id)
            .join(raw_c, id_col)
            .withColumn(
                "_cos_any",
                F.round(
                    _dot(F.col("_pv"), F.col("_cv"))
                    / (_norm(F.col("_pv")) * _norm(F.col("_cv"))),
                    6,
                ),
            )
        )
        agg = rescored.groupBy(probe_id).agg(
            F.collect_list(F.col(id_col)).alias("_tids"),
            F.max_by(F.col(id_col), -F.col("rk")).alias("_ttop1"),
            F.avg("_cos_any").alias("_mcos"),
        )
        outs.append(
            agg.join(full_sets, probe_id).select(
                F.col(probe_id),
                F.lit(d).cast("int").alias("n_dims"),
                F.size(
                    F.array_intersect(F.col("_tids"), F.col("_fids"))
                )
                .cast("int")
                .alias("overlap_at_k"),
                (F.col("_ttop1") == F.col("_ftop1")).alias("top1_kept"),
                (F.round(F.col("_mcos"), nd) + F.lit(0.0)).alias(
                    "mean_full_cosine_of_trunc_topk"
                ),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
