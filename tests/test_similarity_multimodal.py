"""ANN (brute-force + IVF) vs numpy oracle; multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparkfeat.multimodal import attach_fake_payloads, decode_features, frame_sample
from sparkfeat.similarity import cosine_topk, ivf_topk, with_cosine


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def emb_np(emb):
    pdf = emb.select("vec_id", "embedding").toPandas().sort_values("vec_id")
    return pdf["vec_id"].to_numpy(), np.stack(pdf["embedding"].map(np.asarray)).astype(
        np.float64
    )


def _brute_topk(ids, mat, probe_ids, k):
    normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    out = {}
    id_to_row = {v: i for i, v in enumerate(ids)}
    for p in probe_ids:
        sims = normed @ normed[id_to_row[p]]
        order = sorted(zip(-sims, ids))  # score desc, id asc
        out[p] = [(i, -s) for s, i in order if i != p][:k]
    return out


def test_cosine_topk_matches_numpy(emb, emb_np):
    ids, mat = emb_np
    probe_ids = ids[:5].tolist()
    probes = emb.filter(F.col("vec_id").isin(probe_ids)).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    got = cosine_topk(emb, probes, k=5).toPandas()
    want = _brute_topk(ids, mat, probe_ids, 5)
    for p in probe_ids:
        sub = got[got["probe_id"] == p].sort_values("rk")
        w = want[p]
        assert list(sub["vec_id"]) == [i for i, _ in w]
        np.testing.assert_allclose(sub["cosine"], [s for _, s in w], rtol=1e-9)


def test_ivf_recall_vs_bruteforce(emb, emb_np):
    ids, mat = emb_np
    probe_ids = ids[:10].tolist()
    probes = emb.filter(F.col("vec_id").isin(probe_ids)).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    got = ivf_topk(emb, probes, k=5, n_centroids=8, nprobe=3).toPandas()
    want = _brute_topk(ids, mat, probe_ids, 5)
    hits = total = 0
    for p in probe_ids:
        w = {i for i, _ in want[p]}
        g = set(got[got["probe_id"] == p]["vec_id"])
        hits += len(w & g)
        total += len(w)
    recall = hits / total
    assert recall >= 0.5, f"IVF recall {recall:.2f} too low"
    # scores the IVF path does return are exact cosines
    sub = got[got["probe_id"] == probe_ids[0]]
    id_to_row = {v: i for i, v in enumerate(ids)}
    normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for r in sub.itertuples():
        true = float(normed[id_to_row[r.probe_id]] @ normed[id_to_row[r.vec_id]])
        assert abs(r.cosine - true) < 1e-9


def test_lsh_planes_deterministic_and_uniform():
    from sparkfeat.similarity import lsh_planes

    a, b = lsh_planes(64, 48), lsh_planes(64, 48)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (48, 64)
    assert -1.0 <= a.min() and a.max() < 1.0
    assert abs(a.mean()) < 0.05  # md5-uniform components


def test_lsh_recall_and_exact_scores(emb, emb_np):
    from sparkfeat.similarity import lsh_topk

    ids, mat = emb_np
    probe_ids = ids[:10].tolist()
    probes = emb.filter(F.col("vec_id").isin(probe_ids)).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    got = lsh_topk(emb, probes, k=5, n_planes=48, n_bands=8).toPandas()
    want = _brute_topk(ids, mat, probe_ids, 5)
    # recall of the TRUE nearest neighbour (the high-cosine target LSH is
    # built to keep): sign-bit collision prob rises with cosine, so rank-1
    # is the meaningful gate; rank-5 of a random corpus is cosine ~0.3
    # where any sub-linear method loses candidates. With 8 bands × 6 bits
    # + Hamming-1 multi-probe, a cos≈0.35 neighbour collides w.p. ≈0.9.
    top1_hits = sum(
        1 for p in probe_ids if want[p][0][0] in set(got[got["probe_id"] == p]["vec_id"])
    )
    assert top1_hits >= 6, f"LSH top-1 recall {top1_hits}/10 too low"
    # scores it does return are exact cosines
    id_to_row = {v: i for i, v in enumerate(ids)}
    normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for r in got.itertuples():
        true = float(normed[id_to_row[r.probe_id]] @ normed[id_to_row[r.vec_id]])
        assert abs(r.cosine - true) < 1e-9


def test_lsh_arrow_sign_impl_matches_expr(emb, emb_np):
    """The BLAS band-key path emits exactly the expression path's keys
    (sign flips need |v·p| within ~1e-13 of 0), and the full top-k is
    identical."""
    from sparkfeat.similarity import _lsh_bands, _lsh_bands_arrow, lsh_planes, lsh_topk

    planes = lsh_planes(64, 48)
    expr_keys = (
        emb.select(
            "vec_id",
            F.posexplode(
                _lsh_bands("transform(embedding, x -> CAST(x AS DOUBLE))", planes, 8)
            ).alias("band_idx", "band_key"),
        )
        .toPandas()
        .sort_values(["vec_id", "band_idx"])
        .reset_index(drop=True)
    )
    arrow_keys = (
        _lsh_bands_arrow(emb, "vec_id", planes, 8, "embedding")
        .toPandas()
        .sort_values(["vec_id", "band_idx"])
        .reset_index(drop=True)
    )
    assert (expr_keys["band_key"].to_numpy() == arrow_keys["band_key"].to_numpy()).all()

    ids, _ = emb_np
    probes = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    a = lsh_topk(emb, probes, k=5, sign_impl="expr").toPandas()
    b = lsh_topk(emb, probes, k=5, sign_impl="arrow").toPandas()
    key = ["probe_id", "rk"]
    a, b = a.sort_values(key).reset_index(drop=True), b.sort_values(key).reset_index(drop=True)
    assert list(a["vec_id"]) == list(b["vec_id"])
    np.testing.assert_allclose(a["cosine"], b["cosine"], rtol=0, atol=1e-12)


def test_lsh_candidates_sublinear(emb, emb_np):
    """The bucketing must actually shrink the scored set (scale story):
    with 8 bands × 6 bits + Hamming-1 multi-probe, a random (cos≈0)
    pair collides w.p. 1−(1−7/64)^8 ≈ 0.60 on this unstructured corpus
    — well under a full scan, and bucket-sized on clustered data."""
    from sparkfeat.similarity import _lsh_bands, lsh_planes

    ids, _ = emb_np
    planes = lsh_planes(64, 48)
    keys = _lsh_bands("transform(embedding, x -> CAST(x AS DOUBLE))", planes, 8)
    cb = emb.select(
        "vec_id", F.posexplode(keys).alias("band_idx", "band_key")
    )
    masks = F.array(*[F.lit(m) for m in [0, 1, 2, 4, 8, 16, 32]])
    pb = (
        cb.filter(F.col("vec_id") < 10)
        .select(
            F.col("vec_id").alias("probe_id"),
            "band_idx",
            F.explode(masks).alias("_m"),
            "band_key",
        )
        .select(
            "probe_id",
            "band_idx",
            F.col("band_key").bitwiseXOR(F.col("_m")).alias("band_key"),
        )
    )
    n_cand = (
        cb.join(pb, ["band_idx", "band_key"])
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id")
        .distinct()
        .count()
    )
    assert n_cand < 10 * len(ids) * 0.8, f"{n_cand} candidates ~ full scan"


def test_with_cosine_identity(emb):
    d = emb.select(
        F.col("embedding").alias("a"), F.col("embedding").alias("b")
    ).limit(10)
    vals = with_cosine(d, "a", "b").select("cosine").toPandas()["cosine"]
    np.testing.assert_allclose(vals, 1.0, rtol=1e-12)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return attach_fake_payloads(docs).cache()


def test_decode_features_fake(media):
    out = decode_features(media).toPandas()
    assert len(out) == media.count()
    feats = out["features"].dropna()
    assert feats.map(len).eq(16).all()
    np.testing.assert_allclose(feats.map(sum), 1.0, rtol=1e-9)
    # deterministic across runs
    out2 = decode_features(media).toPandas()
    a = out.sort_values("media_id")["features"].map(tuple).tolist()
    b = out2.sort_values("media_id")["features"].map(tuple).tolist()
    assert a == b


def test_decode_real_video_is_stubbed(spark, media):
    """Video (mime 2) is the one genuinely stubbed codec — it raises at
    the ffmpeg seam; BMP/WAV decode natively (tests below)."""
    import pytest as _pt

    video_only = media.filter("mime = 2")
    with _pt.raises(Exception) as ei:
        decode_features(video_only, mode="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_bmp_wav_codecs_round_trip():
    """Byte-level encode→decode exactness for the struct-level codecs."""
    import numpy as _np

    from sparkfeat.multimodal import decode_bmp, decode_wav, encode_bmp, encode_wav

    rng = _np.random.default_rng(5)
    px = rng.integers(0, 256, size=(5, 7, 3), dtype=_np.uint8)  # w*3 not %4
    assert _np.array_equal(decode_bmp(encode_bmp(px)), px)
    samples = rng.integers(-32768, 32767, size=333, dtype=_np.int16)
    sr, x = decode_wav(encode_wav(samples, 8000))
    assert sr == 8000
    _np.testing.assert_allclose(x, samples.astype(_np.float64) / 32768.0, rtol=0, atol=0)


def test_resize_box_exact_and_round_trip():
    """Integer box-average: hand-checkable blocks, floor semantics, and
    the resized image re-encodes/decodes byte-exactly."""
    import numpy as _np

    from sparkfeat.multimodal import decode_bmp, encode_bmp, resize_box

    px = _np.arange(8 * 8 * 3, dtype=_np.uint8).reshape(8, 8, 3) % 251
    rz = resize_box(px, 4, 4)
    # block (0,0) channel 0: pixels (0,0),(0,1),(1,0),(1,1) → floor(mean)
    blk = [int(px[0, 0, 0]), int(px[0, 1, 0]), int(px[1, 0, 0]), int(px[1, 1, 0])]
    assert rz[0, 0, 0] == sum(blk) // 4
    assert rz.shape == (4, 4, 3)
    assert _np.array_equal(decode_bmp(encode_bmp(rz)), rz)
    with pytest.raises(ValueError):
        resize_box(px, 3, 4)  # non-integer factor


def test_resize_images_spark_matches_numpy(spark, sf_dir):
    import hashlib

    import numpy as _np

    from sparkfeat.multimodal import attach_real_payloads, resize_box, resize_images

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    media = attach_real_payloads(docs).filter(F.col("mime") == 0)
    out = resize_images(media, out_h=2, out_w=2).toPandas().set_index("media_id")
    texts = {r.doc_id: r.text for r in docs.collect()}
    assert len(out) > 0
    for mid, row in out.iterrows():
        digest = hashlib.md5(texts[mid].encode()).digest()
        px = _np.frombuffer((digest * 12)[: 8 * 8 * 3], dtype=_np.uint8).reshape(
            8, 8, 3
        )
        want = resize_box(px, 2, 2)
        assert row["out_w"] == 2 and row["out_h"] == 2
        _np.testing.assert_allclose(row["r_mean"], want[:, :, 0].mean(), rtol=1e-12)
        _np.testing.assert_allclose(row["b_mean"], want[:, :, 2].mean(), rtol=1e-12)
        from sparkfeat.multimodal import decode_bmp

        assert _np.array_equal(decode_bmp(bytes(row["payload"])), want)


def test_rawvideo_codec_round_trip_and_seek():
    import numpy as _np

    from sparkfeat.multimodal import (
        decode_rawvideo,
        decode_rawvideo_frame,
        decode_rawvideo_header,
        encode_rawvideo,
    )

    frames = (_np.arange(6 * 4 * 4 * 3, dtype=_np.uint8) % 251).reshape(6, 4, 4, 3)
    p = encode_rawvideo(frames)
    assert decode_rawvideo_header(p) == (6, 4, 4)
    _np.testing.assert_array_equal(decode_rawvideo(p), frames)
    # seek-decode touches only one frame and matches the full decode
    _np.testing.assert_array_equal(decode_rawvideo_frame(p, 4), frames[4])
    with pytest.raises(ValueError):
        decode_rawvideo_header(b"XXXX" + p[4:])
    with pytest.raises(IndexError):
        decode_rawvideo_frame(p, 6)


def test_frame_sample_rawvideo_matches_numpy(spark, sf_dir):
    import hashlib

    import numpy as _np

    from sparkfeat.multimodal import attach_video_payloads, frame_sample_rawvideo

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    out = (
        frame_sample_rawvideo(attach_video_payloads(docs), k=3)
        .toPandas()
        .sort_values(["media_id", "frame_idx"])
    )
    texts = {r.doc_id: r.text for r in docs.collect()}
    assert set(out["frame_idx"]) == {0, 2, 5}  # floor(j*5/2), j=0..2
    assert len(out) == 3 * len(texts)
    for (mid, fidx), row in out.set_index(["media_id", "frame_idx"]).iterrows():
        digest = hashlib.md5(texts[mid].encode()).digest()
        fsz = 4 * 4 * 3
        tiled = _np.frombuffer(digest * (2 * fsz // 16 + 2), dtype=_np.uint8)
        fr = tiled[(7 * fidx) % 16 :][:fsz].reshape(4, 4, 3).astype(_np.float64)
        _np.testing.assert_allclose(row["r_mean"], fr[:, :, 0].mean(), rtol=1e-12)
        _np.testing.assert_allclose(row["b_mean"], fr[:, :, 2].mean(), rtol=1e-12)


def test_real_decode_end_to_end(spark, sf_dir):
    """attach_real_payloads → decode_features(mode='real'): BMP images
    report exact 8×8 geometry and md5-derived channel means; WAV audio
    reports the synth sine's exact sample count/duration and an RMS near
    amplitude/sqrt(2)."""
    import hashlib

    import numpy as _np

    from sparkfeat.multimodal import attach_real_payloads

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    media = attach_real_payloads(docs)
    out = decode_features(media, mode="real").toPandas().set_index("media_id")
    texts = {r.doc_id: r.text for r in docs.collect()}
    for mid, row in out.iterrows():
        f = row["features"]
        if row["mime"] == 0:
            assert f[0] == 8.0 and f[1] == 8.0
            digest = hashlib.md5(texts[mid].encode()).digest()
            px = _np.frombuffer((digest * 12)[: 8 * 8 * 3], dtype=_np.uint8).reshape(
                8, 8, 3
            )
            _np.testing.assert_allclose(f[2], px[:, :, 0].mean(), rtol=1e-12)
            _np.testing.assert_allclose(f[4], px[:, :, 2].mean(), rtol=1e-12)
        else:
            assert f[0] == 16000.0 and f[1] == 800.0
            assert abs(f[2] - 800 / 16000.0) < 1e-12
            assert 0.2 < f[3] < 0.3  # sine RMS = A/sqrt(2) = 0.366/1.414 ≈ 0.259
            assert f[4] <= 12000 / 32768.0 + 1e-9


def test_frame_sample_shapes(media):
    out = frame_sample(media, n_frames=4, frame_bytes=16).toPandas()
    per = out.groupby("media_id")["frame_idx"].count()
    assert (per == 4).all()
    assert out["frame"].map(len).le(16).all()


def test_embedding_pairs_vs_numpy(emb, emb_np):
    from sparkfeat.dedup import embedding_pairs

    ids, mat = emb_np
    got = (
        embedding_pairs(emb, threshold=0.4)
        .toPandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = normed @ normed.T
    iu = np.triu_indices(len(ids), k=1)
    mask = sims[iu] >= 0.4
    want = sorted(zip(np.array(ids)[iu[0]][mask], np.array(ids)[iu[1]][mask]))
    assert list(zip(got["id_a"], got["id_b"])) == want
    want_cos = {(a, b): sims[list(ids).index(a), list(ids).index(b)] for a, b in want}
    for r in got.itertuples():
        np.testing.assert_allclose(r.cosine, want_cos[(r.id_a, r.id_b)], rtol=1e-9)


def test_embedding_pairs_bucketed_recall_and_exactness(spark, sf_dir):
    """Bucketed near-dup vs the brute-force baseline: every emitted pair
    is exact (same cosine), and recall at 0.4 stays usable (near-dups are
    near-identical vectors, which co-assign except on bucket ties)."""
    from sparkfeat.dedup import embedding_pairs, embedding_pairs_bucketed

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    brute = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_pairs(emb, threshold=0.4).collect()
    }
    buck = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_pairs_bucketed(emb, threshold=0.4).collect()
    }
    assert set(buck) <= set(brute)  # no false positives
    for k, v in buck.items():
        assert abs(v - brute[k]) < 1e-12  # identical scoring
    recall = len(buck) / max(len(brute), 1)
    assert recall >= 0.5, f"recall {recall:.2f} ({len(buck)}/{len(brute)})"


def test_embedding_pairs_lsh_design_point(spark, emb, emb_np):
    """The fit-free sign-LSH near-dup at its c≥0.9 design point: plant
    true near-duplicates (small perturbations of corpus vectors) and
    require ≥0.9 recall on them, zero false positives vs brute force,
    and exact cosines on everything emitted."""
    from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

    from sparkfeat.dedup import embedding_pairs_lsh

    ids, mat = emb_np
    rng = np.random.RandomState(7)
    base = mat[:40]
    dup = base + 0.02 * rng.standard_normal(base.shape)  # cosine ≈ 0.998
    rows = [(int(ids[i]), base[i].astype(np.float32).tolist()) for i in range(40)]
    rows += [(int(1_000_000 + i), dup[i].astype(np.float32).tolist()) for i in range(40)]
    schema = StructType(
        [
            StructField("vec_id", LongType(), False),
            StructField("embedding", ArrayType(FloatType()), False),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    got = embedding_pairs_lsh(df, threshold=0.9, n_planes=48, n_bands=8, dim=64).toPandas()
    planted = {(int(ids[i]), int(1_000_000 + i)) for i in range(40)}
    # brute truth over the 80-vector corpus
    m = np.stack([np.asarray(v, dtype=np.float64) for _, v in rows])
    n = m / np.linalg.norm(m, axis=1, keepdims=True)
    S = n @ n.T
    rid = [r[0] for r in rows]
    truth = {}
    for i in range(len(rid)):
        for j in range(i + 1, len(rid)):
            a, b = sorted((rid[i], rid[j]))
            if S[i, j] >= 0.9:
                truth[(a, b)] = S[i, j]
    got_pairs = {(int(r.id_a), int(r.id_b)): r.cosine for r in got.itertuples()}
    assert set(got_pairs) <= set(truth)  # no false positives
    hits = len(set(got_pairs) & planted)
    assert hits >= 0.9 * len(planted), f"LSH near-dup recall {hits}/{len(planted)}"
    for k, v in got_pairs.items():
        assert abs(v - truth[k]) < 1e-9


def test_ivf_index_build_serve_matches_direct(spark, sf_dir, tmp_path, emb):
    """Persisted-index serving: build writes cent_id-partitioned
    assignments, and serving from disk returns exactly what the direct
    (fit-inline) ivf_topk returns with the same centroids; the bucket
    join prunes to the probed partitions."""
    from sparkfeat.similarity import (
        build_ivf_index,
        ivf_centroids,
        ivf_topk,
        ivf_topk_index,
    )

    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, n_centroids=8)
    import os

    parts = [d for d in os.listdir(f"{path}/assignments") if d.startswith("cent_id=")]
    assert len(parts) == 8, parts

    probes = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    served = (
        ivf_topk_index(spark, path, probes, k=5, nprobe=3)
        .toPandas()
        .sort_values(["probe_id", "rk"])
        .reset_index(drop=True)
    )
    cents = ivf_centroids(emb, 8)
    direct = (
        ivf_topk(emb, probes, k=5, nprobe=3, centroids=cents)
        .toPandas()
        .sort_values(["probe_id", "rk"])
        .reset_index(drop=True)
    )
    assert list(served["vec_id"]) == list(direct["vec_id"])
    np.testing.assert_allclose(served["cosine"], direct["cosine"], rtol=0, atol=1e-12)
    # serving plan prunes the partitioned assignments to the probed buckets
    plan = ivf_topk_index(spark, path, probes, k=5, nprobe=3)._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower() or "PartitionFilters: [" in plan, plan[:2000]


def test_kmeans_centroids_improve_assignment_objective(spark, sf_dir):
    """Lloyd refinement: the mean cosine between vectors and their
    assigned centroid must improve over the first-C seed, and IVF recall
    with k-means centroids stays usable. (On this near-random corpus
    recall parity is enough — there is no cluster structure to exploit;
    on clustered corpora the refined buckets are strictly better.)"""
    from pyspark.sql import functions as F

    from sparkfeat.similarity import (
        _dot,
        _norm,
        cosine_topk,
        ivf_assign,
        ivf_centroids,
        ivf_topk,
        kmeans_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()

    def objective(cents):
        assigned = ivf_assign(emb, cents)
        sim = assigned.join(F.broadcast(cents), "cent_id").select(
            (
                _dot(F.col("_cv"), F.col("_centv"))
                / (_norm(F.col("_cv")) * _norm(F.col("_centv")))
            ).alias("s")
        )
        return sim.agg(F.avg("s")).collect()[0][0]

    seed = ivf_centroids(emb, 16)
    km = kmeans_centroids(emb, 16, n_iter=3)
    assert objective(km) > objective(seed)

    probes = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    truth = {(r.probe_id, r.vec_id) for r in cosine_topk(emb, probes, k=5).collect()}
    got = {
        (r.probe_id, r.vec_id)
        for r in ivf_topk(emb, probes, k=5, nprobe=4, centroids=km).collect()
    }
    recall_km = len(got & truth) / len(truth)
    assert recall_km >= 0.6


def test_kmeans_checkpoint_constant_plan_depth_same_result(spark, sf_dir):
    """``checkpoint=True`` cuts centroid lineage between Lloyd rounds:
    the analyzed-plan size must stay CONSTANT in n_iter (the lazy plan
    nests one corpus-assignment subtree per round, so its size grows
    linearly), and the fitted centroids must be bit-identical to the
    lazy path (localCheckpoint stores the computed values — no
    recompute, no nondeterminism)."""
    from sparkfeat.similarity import kmeans_centroids

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def plan_len(n_iter):
        df = kmeans_centroids(emb, 8, n_iter=n_iter, checkpoint=True)
        return len(df._jdf.queryExecution().analyzed().toString())

    # lazy plan roughly triples per extra round; checkpointed plan hangs
    # off a materialized C-row scan, so 1 vs 4 rounds must be ~equal.
    assert plan_len(4) <= plan_len(1) * 1.05

    lazy = kmeans_centroids(emb, 8, n_iter=2).collect()
    ckpt = kmeans_centroids(emb, 8, n_iter=2, checkpoint=True).collect()
    as_map = lambda rows: {r.cent_id: r._centv for r in rows}  # noqa: E731
    assert as_map(lazy) == as_map(ckpt)


def test_kmeans_beats_seed_on_clustered_corpus(spark, sf_dir):
    """Where cluster structure exists, k-means-refined IVF buckets must
    recall at least as much as the first-C seed (and in practice more).
    The clustered corpus is derived deterministically from the driver's
    embeddings table: 8 cluster centers = the first 8 vectors, members =
    unit-normalized 0.9*center + 0.1*mixer; ids are laid out so the
    first-16-by-id seed sits almost entirely inside cluster 0 — the
    degenerate case Lloyd refinement exists to fix."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from sparkfeat.similarity import (
        cosine_topk,
        ivf_centroids,
        ivf_topk,
        kmeans_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pdf = emb.orderBy("vec_id").limit(48).toPandas()
    mat = np.stack(pdf["embedding"].map(np.asarray)).astype(np.float64)
    base, mix = mat[:8], mat[8:48]
    rows = []
    for ci in range(8):
        for mi in range(40):
            v = 0.9 * base[ci] + 0.1 * mix[(ci * 40 + mi) % 40]
            v = v / np.linalg.norm(v)
            rows.append((ci * 40 + mi, v.astype(np.float32).tolist()))
    cl = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    probes = cl.filter((F.col("vec_id") % 40) >= 35).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    truth = {(r.probe_id, r.vec_id) for r in cosine_topk(cl, probes, k=5).collect()}

    def recall(cents):
        got = {
            (r.probe_id, r.vec_id)
            for r in ivf_topk(cl, probes, k=5, nprobe=4, centroids=cents).collect()
        }
        return len(got & truth) / len(truth)

    r_seed = recall(ivf_centroids(cl, 16))
    r_km = recall(kmeans_centroids(cl, 16, n_iter=3))
    assert r_km >= r_seed, (r_km, r_seed)
    assert r_km >= 0.95, r_km


def test_quantize_int8_roundtrip_and_bound(spark, emb, emb_np):
    from sparkfeat.similarity import quantize_audit, quantize_int8

    ids, mat = emb_np
    qd = quantize_int8(emb).toPandas().sort_values("vec_id")
    scale = np.abs(mat).max(axis=1) / 127.0
    np.testing.assert_allclose(qd["scale"].to_numpy(), scale, rtol=1e-7)
    q = np.stack(qd["q"].to_numpy()).astype(np.float64)
    assert np.abs(q).max() <= 127
    # dtype is the real memory lever: int8 elements, 4x under float32
    assert qd["q"].iloc[0].dtype == np.int8
    # numpy rounds half-to-even vs Spark half-away — compare off-tie
    diff = np.abs(q - mat / scale[:, None])
    assert (diff <= 0.5 + 1e-9).all()
    audit = quantize_audit(emb).toPandas().sort_values("vec_id")
    # max element error bounded by half a quantization step
    assert (
        audit["max_abs_err"].to_numpy() <= scale / 2.0 + 1e-12
    ).all()
    assert (audit["cos_sim"].to_numpy() > 0.999).all()


def test_quantize_int8_zero_vector_null(spark):
    from sparkfeat.similarity import quantize_int8

    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, -2.0])], "vec_id long, embedding array<double>"
    )
    out = quantize_int8(df).toPandas().sort_values("vec_id")
    assert out["q"].iloc[0] is None
    assert list(out["q"].iloc[1]) == [64, -127]


def test_quantize_audit_plan_is_map_only(emb):
    from sparkfeat.similarity import quantize_audit

    plan = quantize_audit(emb)._jdf.queryExecution().executedPlan().toString()
    for node in ("Exchange", "SortMergeJoin", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan, plan


def test_ivf_quantized_agrees_with_float_path(emb, emb_np):
    from sparkfeat.similarity import ivf_topk, quantize_int8

    probes = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    exact = ivf_topk(emb, probes, k=5, n_centroids=16, nprobe=4).toPandas()
    dq = quantize_int8(emb).select(
        "vec_id",
        F.transform("q", lambda qi: qi.cast("double") * F.col("scale")).alias(
            "embedding"
        ),
    )
    qprobes = dq.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    quant = ivf_topk(dq, qprobes, k=5, n_centroids=16, nprobe=4).toPandas()
    # int8 error (~scale/2 per element) must not reorder the retrieval:
    # per-probe top-5 sets overlap >= 4/5, and cosines agree to ~1e-3
    overlap = 0
    for p in range(5):
        a = set(exact[exact.probe_id == p]["vec_id"])
        b = set(quant[quant.probe_id == p]["vec_id"])
        overlap += len(a & b)
    assert overlap >= 20, overlap
    merged = exact.merge(quant, on=["probe_id", "vec_id"], suffixes=("_e", "_q"))
    assert (merged["cosine_e"] - merged["cosine_q"]).abs().max() < 5e-3


def test_ivf_index_int8_smaller_and_agrees(spark, emb, tmp_path):
    import os

    from sparkfeat.similarity import build_ivf_index, ivf_topk_index

    probes = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    fpath, qpath = str(tmp_path / "f"), str(tmp_path / "q")
    build_ivf_index(emb, fpath, n_centroids=16)
    build_ivf_index(emb, qpath, n_centroids=16, quantize=True)

    def _bytes(p):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(f"{p}/assignments")
            for f in fs
            if f.endswith(".parquet")
        )

    # int8 + per-vector scale vs array<double>: well under half the bytes
    assert _bytes(qpath) < 0.5 * _bytes(fpath), (_bytes(qpath), _bytes(fpath))

    f = ivf_topk_index(spark, fpath, probes, k=5, nprobe=4).toPandas()
    q = ivf_topk_index(spark, qpath, probes, k=5, nprobe=4).toPandas()
    overlap = 0
    for p in range(5):
        overlap += len(
            set(f[f.probe_id == p]["vec_id"]) & set(q[q.probe_id == p]["vec_id"])
        )
    assert overlap >= 20, overlap
    merged = f.merge(q, on=["probe_id", "vec_id"], suffixes=("_f", "_q"))
    assert (merged["cosine_f"] - merged["cosine_q"]).abs().max() < 5e-3
    # the int8 index keeps the partition-pruned serving plan
    plan = (
        ivf_topk_index(spark, qpath, probes, k=5, nprobe=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "dynamicpruning" in plan.lower() or "PartitionFilters: [" in plan, plan[
        :2000
    ]


# ---------------------------------------------------------------------------
# semantic contamination (embedding-space decontamination)
# ---------------------------------------------------------------------------


def test_semantic_contamination_hand_case(spark):
    from sparkfeat.similarity import semantic_contamination

    schema = "vec_id bigint, embedding array<float>"
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])], schema
    )
    bench = spark.createDataFrame([(100, [2.0, 0.0]), (101, [0.0, 3.0])], schema)
    rows = {
        r["vec_id"]: r
        for r in semantic_contamination(corpus, bench, threshold=0.9).collect()
    }
    assert rows[1]["max_cosine"] == pytest.approx(1.0)
    assert rows[1]["n_above"] == 1 and rows[1]["contaminated"]
    assert rows[2]["max_cosine"] == pytest.approx(1.0)
    assert rows[2]["n_above"] == 1 and rows[2]["contaminated"]
    # [1,1] is 45 degrees from both axes: cos = 1/sqrt(2) < 0.9
    assert rows[3]["max_cosine"] == pytest.approx(2 ** -0.5)
    assert rows[3]["n_above"] == 0 and not rows[3]["contaminated"]
    # n_above counts EVERY bench hit, not just the argmax
    both = {
        r["vec_id"]: r
        for r in semantic_contamination(corpus, bench, threshold=0.5).collect()
    }
    assert both[3]["n_above"] == 2 and both[3]["contaminated"]


def test_semantic_contamination_empty_bench(spark):
    from sparkfeat.similarity import semantic_contamination

    schema = "vec_id bigint, embedding array<float>"
    corpus = spark.createDataFrame([(1, [1.0, 0.0])], schema)
    bench = spark.createDataFrame([], schema)
    row = semantic_contamination(corpus, bench).collect()[0]
    assert row["max_cosine"] is None
    assert row["n_above"] == 0 and not row["contaminated"]


def test_semantic_contamination_corpus_side_map_only(emb):
    """The 100 TB side never shuffles: the only exchanges in the plan
    belong to the one-row bench pack (SinglePartition agg); the corpus
    stream feeds a BroadcastNestedLoopJoin with no hash exchange, no
    sort-merge, no cartesian."""
    from sparkfeat.corpus import hash_bucket
    from sparkfeat.similarity import semantic_contamination

    is_bench = hash_bucket("vec_id", start=7, buckets=100) < 10
    out = semantic_contamination(
        emb.filter(~is_bench), emb.filter(is_bench), threshold=0.42
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan, plan


# ---------------------------------------------------------------------------
# hard-negative mining
# ---------------------------------------------------------------------------


def test_hard_negatives_band_and_rank(emb, emb_np):
    """Band semantics + rank vs the numpy oracle: every returned pair
    is in [lo, hi); ranks are exactly the in-band cosine order; no
    in-band candidate ranked <= k is missing."""
    from sparkfeat.similarity import hard_negatives

    ids, mat = emb_np
    probes = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    lo, hi, k = 0.15, 0.42, 7
    got = hard_negatives(emb, probes, k=k, lo=lo, hi=hi).collect()
    normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    row_of = {v: i for i, v in enumerate(ids)}
    expect = {}
    for p in range(5):
        sims = normed @ normed[row_of[p]]
        cand = sorted(
            ((-s, i) for i, s in zip(ids, sims) if i != p and lo <= s < hi)
        )[:k]
        expect[p] = [(i, -s) for s, i in cand]
    by_probe = {}
    for r in sorted(got, key=lambda r: (r["probe_id"], r["rk"])):
        assert lo <= r["cosine"] < hi
        by_probe.setdefault(r["probe_id"], []).append((r["vec_id"], r["cosine"]))
    assert set(by_probe) == set(expect)
    for p, exp in expect.items():
        assert [i for i, _ in by_probe[p]] == [i for i, _ in exp]
        for (_, a), (_, b) in zip(by_probe[p], exp):
            assert a == pytest.approx(b, abs=1e-9)


def test_hard_negatives_excludes_positives(spark):
    """A near-duplicate of the probe (cos ~1) must NOT appear — that is
    the whole point of the ceiling."""
    from sparkfeat.similarity import hard_negatives

    schema = "vec_id bigint, embedding array<float>"
    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.001]),   # near-dup of the probe: cos ~ 1 -> excluded
            (2, [1.0, 1.5]),     # cos ~ 0.55 -> in band
            (3, [0.0, 1.0]),     # cos 0 -> below floor
        ],
        schema,
    )
    probes = spark.createDataFrame([(0, [1.0, 0.0])], schema).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    got = hard_negatives(corpus, probes, k=5, lo=0.2, hi=0.9).collect()
    assert [r["vec_id"] for r in got] == [2]


def test_cluster_balanced_sample_flattens_skew(spark):
    """A corpus where one mode dominates 10:1: per-cluster exact-k must
    return (close to) equal counts per cluster, membership must be
    deterministic, and sub-k clusters contribute all they have."""
    import numpy as np

    from sparkfeat.similarity import cluster_balanced_sample

    rng = np.random.default_rng(7)
    rows = []
    # two well-separated modes: 200 near +e1, 20 near -e1 (ids interleave)
    for i in range(220):
        big = i % 11 != 0
        base = np.array([1.0, 0.0, 0.0, 0.0]) if big else np.array([-1.0, 0.0, 0.0, 0.0])
        v = base + rng.normal(0, 0.05, 4)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = cluster_balanced_sample(emb, n_centroids=2, k_per_cluster=15).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cent_id"], set()).add(r["vec_id"])
    # both clusters present, each capped at k
    assert set(len(v) for v in by_cluster.values()) <= {15}
    assert len(by_cluster) == 2
    # deterministic replay
    again = cluster_balanced_sample(emb, n_centroids=2, k_per_cluster=15).collect()
    assert sorted((r["cent_id"], r["vec_id"]) for r in again) == sorted(
        (r["cent_id"], r["vec_id"]) for r in out
    )
    # the dominant mode contributed 15 of ~200, the tail 15 of ~20:
    # the SAMPLE is flat even though the corpus is 10:1
    sizes = sorted(len(v) for v in by_cluster.values())
    assert sizes == [15, 15]


def test_dim_truncation_audit_full_budget_is_identity(spark):
    """At the full dimension budget the audit must report a perfect
    match (overlap = k, top1 kept, mean cosine = the full top-k's own
    mean); a 1-dim budget on structured vectors must degrade overlap."""
    import numpy as np

    from sparkfeat.similarity import dim_truncation_audit

    rng = np.random.default_rng(3)
    rows = [
        (i, [float(x) for x in rng.normal(0, 1, 16)]) for i in range(120)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    probes = emb.where("vec_id < 4").selectExpr(
        "vec_id AS probe_id", "embedding"
    )
    out = dim_truncation_audit(emb, probes, dims=[16, 1], k=5)
    got = {(r["probe_id"], r["n_dims"]): r.asDict() for r in out.collect()}
    for p in range(4):
        full = got[(p, 16)]
        assert full["overlap_at_k"] == 5 and full["top1_kept"] is True
    # 1 of 16 dims: random gaussians -> ranking is near-independent of
    # the full one; SOME probe must lose overlap (all 4 perfect would
    # mean the audit isn't measuring anything)
    assert any(got[(p, 1)]["overlap_at_k"] < 5 for p in range(4))
    # and the full-metric quality of the truncated picks can't exceed
    # the full ranking's own picks
    for p in range(4):
        assert (
            got[(p, 1)]["mean_full_cosine_of_trunc_topk"]
            <= got[(p, 16)]["mean_full_cosine_of_trunc_topk"] + 1e-9
        )
