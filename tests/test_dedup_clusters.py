"""SemDeDup keep-list (sparkfeat.dedup.semdedup_keeplist)."""


def test_semdedup_keeplist_transitive_chain(spark):
    """A≈B and B≈C but A's cosine to C alone would not pair them at the
    threshold via a single hop — SemDeDup must still collapse all three
    into one kept representative; an orthogonal vector stays a kept
    singleton."""
    from sparkfeat.dedup import semdedup_keeplist

    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.98, 0.199, 0.0]),   # cos(v0,v1) ~ 0.98
        (2, [0.90, 0.436, 0.0]),   # cos(v1,v2) ~ 0.985, cos(v0,v2) = 0.90
        (3, [0.0, 0.0, 1.0]),      # orthogonal singleton
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs],
        "vec_id long, embedding array<float>",
    )
    out = {
        r.vec_id: r
        for r in semdedup_keeplist(
            emb, threshold=0.95, n_centroids=2, n_assign=2
        ).collect()
    }
    assert out[0].cluster_id == 0 and out[0].keep
    assert out[1].cluster_id == 0 and not out[1].keep
    assert out[2].cluster_id == 0 and not out[2].keep
    assert out[0].cluster_size == 3
    assert out[3].cluster_id == 3 and out[3].keep and out[3].cluster_size == 1


def test_cluster_keep_best_argmax_and_tiebreak(spark):
    """Representative = highest score, ties -> smallest id; cluster
    LABELS stay min-id so identity never depends on the score; null
    scores lose to any real score; singletons keep themselves."""
    from sparkfeat.dedup import cluster_keep_best

    docs = spark.createDataFrame(
        [
            (1, 10),   # cluster {1,2,3}: 3 has the highest score
            (2, 30),
            (3, None), # null score -> never the rep
            (5, 7),    # cluster {5,6}: tie on score -> smallest id (5)
            (6, 7),
            (9, 1),    # singleton
        ],
        "doc_id long, score long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    out = {
        r.doc_id: r
        for r in cluster_keep_best(docs, pairs, score_col="score").collect()
    }
    assert out[2].keep and out[2].rep_id == 2  # argmax score in {1,2,3}
    assert not out[1].keep and not out[3].keep
    assert out[1].cluster_id == 1  # label stays min reachable id
    assert out[1].cluster_size == 3
    assert out[5].keep and out[5].rep_id == 5 and not out[6].keep  # tie
    assert out[9].keep and out[9].cluster_size == 1
