"""Similarity search tests: brute force vs numpy model, LSH recall."""

from __future__ import annotations

import numpy as np
import pytest

from p6__mapreduce_spark.dedup.embedding import cosine_neardup_pairs
from p6__mapreduce_spark.similarity.bruteforce import knn_bruteforce
from p6__mapreduce_spark.similarity.lsh import hyperplane_buckets, knn_lsh
from p6__mapreduce_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings").cache()


def numpy_topk(vecs: dict[int, np.ndarray], query_ids, k):
    ids = sorted(vecs)
    M = np.stack([vecs[i] for i in ids]).astype(np.float64)
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    out = {}
    for qid in query_ids:
        sims = M @ (vecs[qid] / np.linalg.norm(vecs[qid]))
        order = sorted(
            ((-s, i) for s, i in zip(sims, ids) if i != qid)
        )[:k]
        out[qid] = [i for _, i in order]
    return out


def test_bruteforce_matches_numpy(spark, emb):
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    qids = [i for i in range(8)]
    want = numpy_topk(vecs, qids, k=5)
    got_rows = knn_bruteforce(emb, queries=emb.filter("vec_id < 8"), k=5).collect()
    got: dict[int, list[int]] = {}
    for r in got_rows:
        got.setdefault(r.query_id, []).append(r.neighbor_id)
    assert got == want


def test_lsh_recall_on_clustered_data(spark):
    # hyperplane LSH's guarantee is about HIGH-similarity pairs: plant
    # 30 clusters of 5 near-identical vectors (cosine ~0.99) and require
    # the approximate search to find same-cluster neighbors
    rng = np.random.default_rng(7)
    rows = []
    vid = 0
    for c in range(30):
        center = rng.standard_normal(64)
        for _ in range(5):
            v = center + 0.05 * rng.standard_normal(64)
            rows.append((vid, [float(x) for x in v], c))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, cluster int")
    qdf = df.filter("vec_id % 5 = 0")  # one query per cluster
    got = knn_lsh(df, qdf, k=4, dim=64, num_planes=8).collect()
    cluster_of = {r[0]: r[2] for r in rows}
    hits = sum(1 for r in got if cluster_of[r.neighbor_id] == cluster_of[r.query_id])
    recall = hits / (30 * 4)
    assert recall >= 0.9, f"clustered LSH recall {recall:.2f} too low"


def test_ivf_recall_on_clustered_data(spark):
    from p6__mapreduce_spark.similarity.ivf import knn_ivf

    rng = np.random.default_rng(11)
    rows = []
    vid = 0
    for c in range(20):
        center = rng.standard_normal(64)
        for _ in range(5):
            v = center + 0.05 * rng.standard_normal(64)
            rows.append((vid, [float(x) for x in v], c))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, cluster int")
    qdf = df.filter("vec_id % 5 = 0")
    got = knn_ivf(df, qdf, k=4, n_centroids=8, nprobe=2).collect()
    cluster_of = {r[0]: r[2] for r in rows}
    hits = sum(1 for r in got if cluster_of[r.neighbor_id] == cluster_of[r.query_id])
    assert hits / (20 * 4) >= 0.9, f"IVF clustered recall {hits/(20*4):.2f} too low"


def test_ivf_sample_is_partition_layout_independent(spark):
    # A plain limit(n) sample reads the first partitions only — if the
    # file happens to be physically ordered by cluster, every sampled
    # vector comes from one cluster and the trained centroids collapse.
    # The sha256-order sample must give the SAME centroids whether the
    # data arrives cluster-ordered in 1 partition or shuffled across 16.
    from p6__mapreduce_spark.similarity.ivf import train_centroids

    rng = np.random.default_rng(3)
    rows = []
    vid = 0
    for c in range(8):  # cluster-ordered: all of cluster 0 first, etc.
        center = 10.0 * rng.standard_normal(8)
        for _ in range(40):
            v = center + 0.1 * rng.standard_normal(8)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    ordered = spark.createDataFrame(rows, "vec_id long, embedding array<double>").coalesce(1)
    shuffled = (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        .repartition(16, "vec_id")
    )
    c1 = train_centroids(ordered, n_centroids=8, sample_size=64)
    c2 = train_centroids(shuffled, n_centroids=8, sample_size=64)
    assert c1 == c2
    # and the bounded sample (64 of 320 rows) must span clusters: with a
    # first-partitions sample it would cover only clusters 0-1
    import numpy as _np

    centers = _np.array(c1)
    spread = _np.linalg.norm(centers - centers.mean(axis=0), axis=1)
    assert (spread > 1.0).sum() >= 6, "centroids collapsed onto few clusters"


def test_lsh_prunes_but_still_finds_some_neighbors_on_random_data(spark, emb):
    # uniform-random embeddings have no cluster structure — ANN pruning
    # cannot be both fast and high-recall there; just sanity-bound it
    qdf = emb.filter("vec_id < 32")
    exact = {(r.query_id, r.neighbor_id) for r in knn_bruteforce(emb, qdf, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in knn_lsh(emb, qdf, k=5, dim=64, num_planes=6).collect()}
    assert len(exact & approx) / len(exact) >= 0.15


def test_hyperplane_buckets_deterministic_and_bounded(spark, emb):
    b1 = {r.vec_id: r.bucket for r in hyperplane_buckets(emb, dim=64, num_planes=8).collect()}
    b2 = {r.vec_id: r.bucket for r in hyperplane_buckets(emb, dim=64, num_planes=8).collect()}
    assert b1 == b2
    assert all(0 <= b < 256 for b in b1.values())


def test_cosine_neardup_symmetric_threshold(spark, emb):
    rows = cosine_neardup_pairs(emb, threshold=0.45).collect()
    assert all(r.id1 < r.id2 for r in rows)
    assert all(r.cosine >= 0.45 for r in rows)
