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


def test_kmeans_lloyd_separates_planted_clusters(spark):
    from p6__mapreduce_spark.similarity.kmeans import kmeans_lloyd

    # two tight planted clusters around (0,0) and (10,10); ids 0 and 1
    # (the deterministic init seeds) sit one in each cluster
    pts = [
        (0, [0.0, 0.1]),
        (1, [10.0, 10.1]),
        (2, [0.1, 0.0]),
        (3, [10.1, 10.0]),
        (4, [0.05, 0.05]),
        (5, [9.95, 10.05]),
    ]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    rows = kmeans_lloyd(df, k=2, iters=2).collect()
    assert len(rows) == 2 * 2  # k=2 clusters x d=2 dims
    by_c = {}
    for r in rows:
        by_c.setdefault(r.cluster_id, {})[r.dim] = r
    # both clusters got 3 points
    assert by_c[0][1].n_points == 3 and by_c[1][1].n_points == 3
    # centroids (quantized 1e6) land on the planted means
    assert abs(by_c[0][1].coord_q - 50_000) < 5_000  # mean(0, .1, .05) = .05
    assert abs(by_c[1][1].coord_q - 10_016_666) < 5_000  # mean(10,10.1,9.95)
    # tight clusters: tiny inertia vs the 10-unit separation
    assert by_c[0][1].inertia_q < 10**11 and by_c[1][1].inertia_q < 10**11


def test_kmeans_lloyd_empty_cluster_keeps_previous_centroid(spark):
    from p6__mapreduce_spark.similarity.kmeans import QUANT, kmeans_lloyd

    # id 1's init centroid is an outlier no point (not even itself,
    # after round 1 moves the near centroid onto the mass) ends up
    # nearest to... construct: ids 0,1 both near origin; id 1 = (5,5)
    # actually IS a point, so cluster 1 keeps >=1 member. Instead: all
    # mass at origin; init centroid 1 at (5,5) attracts only itself in
    # round 1; in round 2 it sits exactly on (5,5) still with 1 member.
    # True empty clusters need the member itself to defect: put id 1
    # midway at (1,1) — round 1: centroid 0 = origin-mass mean pulls
    # id 1? dist((1,1)->c0~(0,0)) > dist((1,1)->(1,1))=0, so id 1 stays.
    # Simplest guaranteed-empty: k=2 with duplicate init points — ids
    # 0 and 1 identical, so every point is strictly nearer c0 (tie ->
    # lowest cluster id) and cluster 1 is empty from round 1 on.
    pts = [(i, [0.5, 0.5]) for i in range(4)]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    by_c = {}
    for r in kmeans_lloyd(df, k=2, iters=2).collect():
        by_c.setdefault(r.cluster_id, {})[r.dim] = r
    assert by_c[0][1].n_points == 4
    assert by_c[1][1].n_points == 0 and by_c[1][1].inertia_q == 0
    # the empty cluster's centroid survives as its init value
    assert by_c[1][1].coord_q == by_c[0][1].coord_q == int(0.5 * QUANT)


def test_pq_codes_recover_planted_subspace_clusters(spark):
    from p6__mapreduce_spark.similarity.pq import pq_codes

    # 4-dim vectors, m=2 subspaces of 2 dims; each subspace has two
    # planted clusters ((0,0) vs (5,5)); ids 0/1 seed k=2 init with one
    # member of each cluster in BOTH subspaces
    lo, hi = [0.01, 0.02], [5.01, 5.02]
    rows = [
        (0, lo + lo),
        (1, hi + hi),
        (2, lo + hi),
        (3, hi + lo),
        (4, [0.03, 0.0] + [4.99, 5.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {(r.vec_id, r.subspace): r for r in pq_codes(df, m=2, k=2, iters=2).collect()}
    assert len(out) == 10
    # same-cluster vectors share a code per subspace; cross pairs differ
    assert out[(0, 0)].code == out[(2, 0)].code == out[(4, 0)].code
    assert out[(1, 0)].code == out[(3, 0)].code != out[(0, 0)].code
    assert out[(0, 1)].code == out[(3, 1)].code
    assert out[(1, 1)].code == out[(2, 1)].code == out[(4, 1)].code
    # tight clusters: per-subspace quantization error stays tiny
    # (coords quantized at 1e6; spread ~0.02 -> err ~ (2e4)^2 * 2)
    assert all(r.err_q < 10**10 for r in out.values())
    # deterministic under a different layout
    out2 = {
        (r.vec_id, r.subspace): r.code
        for r in pq_codes(df.repartition(5), m=2, k=2, iters=2).collect()
    }
    assert out2 == {kk: r.code for kk, r in out.items()}


def test_knn_pq_self_match_and_recall(spark):
    from p6__mapreduce_spark.similarity.pq import knn_pq

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    rows = knn_pq(emb, n_queries=8, topk=5).collect()
    assert len(rows) == 8 * 5
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rs in by_q.items():
        # ADC distance of a vector to ITSELF is its own quantization
        # error — small, so every query's rank-1 hit is itself on this
        # well-separated synthetic corpus
        assert rs[0].vec_id == qid
        # ranks are 1..5 with non-decreasing distances
        assert [r.rank for r in rs] == [1, 2, 3, 4, 5]
        dists = [r.adc_dist_q for r in rs]
        assert dists == sorted(dists)


def test_contrastive_mining_roles_and_ranks(spark):
    # 2D toy: labels split left/right of the x axis. Query (1,0) label 0.
    # Hard negative = label-1 vector closest in cosine; hard positive =
    # label-0 vector farthest in cosine.
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.9, 0.1], 0),    # near positive
        (2, [0.1, 0.9], 0),    # far positive -> hardest
        (3, [0.8, 0.2], 1),    # most confusable negative
        (4, [-1.0, 0.0], 1),   # easy negative
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    from p6__mapreduce_spark.similarity.mining import mine_contrastive_pairs

    out = mine_contrastive_pairs(
        emb, emb.filter("vec_id = 0"), k_neg=2
    ).collect()
    negs = [r.neighbor_id for r in out if r.role == "hard_neg"]
    pos = [r.neighbor_id for r in out if r.role == "hard_pos"]
    assert negs == [3, 4]  # confusable first
    assert pos == [2]      # most distant same-label only
    assert all(r.rank == i + 1 for r in out if r.role == "hard_neg" for i in [negs.index(r.neighbor_id)])


def test_contrastive_mining_composes_with_candidate_prefilter(spark):
    # the scale path: restricting candidates must only shrink the pool,
    # never change ranking semantics within it
    rows = [
        (0, [1.0, 0.0], 0),
        (3, [0.8, 0.2], 1),
        (4, [-1.0, 0.0], 1),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    from p6__mapreduce_spark.similarity.mining import mine_contrastive_pairs

    out = mine_contrastive_pairs(
        emb, emb.filter("vec_id = 0"), k_neg=5,
        candidates=emb.filter("vec_id = 4"),
    ).collect()
    assert [(r.role, r.neighbor_id) for r in out] == [("hard_neg", 4)]


def test_hybrid_rrf_fuses_both_legs(spark):
    # doc 1 dominates the lexical leg, doc 3 the vector leg; doc 2 is
    # second on both -> RRF must rank doc 2 first:
    # d2: 1/62 + 1/62 = 0.03226 > d1: 1/61 + 1/63 = 0.03227? compute:
    # 1/61+1/63 = .016393+.015873 = .032266; 2/62 = .032258 -> d1 wins.
    # Use rank-3 ties instead: d1 lex=(1), vec=(3); d3 lex=(3), vec=(1);
    # d2 lex=2, vec=2. 1/61+1/63=.032266 vs 2/62=.032258: d1 & d3 tie
    # ahead of d2, tie broken by doc_id -> order d1, d3, d2.
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark join"),
            (2, "spark join x y"),
            (3, "join a b c"),
            (4, "zz zz zz zz"),
        ],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [
            (1, [0.1, 0.9]),
            (2, [0.6, 0.4]),
            (3, [0.99, 0.01]),
            (4, [-1.0, 0.0]),
            (9, [1.0, 0.0]),  # the query vector
        ],
        "vec_id long, embedding array<float>",
    )
    from p6__mapreduce_spark.similarity.hybrid import hybrid_search_rrf

    out = hybrid_search_rrf(docs, emb, ["spark"], 9, k=3, n_candidates=3).collect()
    assert [r.doc_id for r in out] == [1, 3, 2]
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].lex_rank == 1 and by_id[3].vec_rank == 1
    # doc 3 has no 'spark' -> may still rank lexically (score 0) but
    # the fused score must reflect both legs
    assert abs(by_id[2].rrf_score - (1 / 62 + 1 / 62)) < 1e-12


def test_hybrid_rrf_legs_plan_take_ordered(spark):
    # scale pin: neither leg may globally sort the corpus — both cuts
    # must plan as TakeOrderedAndProject partial top-k
    from p6__mapreduce_spark.similarity.hybrid import hybrid_search_rrf
    from p6__mapreduce_spark.sources.readers import load_table
    from tests.test_plans import SF, plan_of

    plan = plan_of(
        hybrid_search_rrf(
            load_table(spark, SF, "documents"),
            load_table(spark, SF, "embeddings"),
            ["spark"],
            42,
        )
    )
    assert plan.count("TakeOrderedAndProject") >= 2, plan
    assert "CartesianProduct" not in plan


def test_kmeans_sample_mod_one_equals_full_training(spark):
    # sample_mod=1 keeps every row (x % 1 == 0) and the testdata ids
    # are contiguous from 0, so the k-smallest-ids init coincides with
    # the default vec_id < k init: the sampled path must reproduce the
    # oracle-pinned full-training result bit-for-bit
    from p6__mapreduce_spark.similarity.kmeans import kmeans_lloyd

    emb = load_table(spark, SF, "embeddings")
    full = kmeans_lloyd(emb, k=4, iters=2).collect()
    sampled = kmeans_lloyd(emb, k=4, iters=2, sample_mod=1).collect()
    assert [tuple(r) for r in full] == [tuple(r) for r in sampled]


def test_kmeans_sample_training_stays_close_to_full(spark):
    # sample_mod=2 trains on ~half the corpus; the clustering is a
    # different (still deterministic) model but must remain a sane
    # quantizer: every point assigned, per-point quantization error of
    # the same order as full training
    from p6__mapreduce_spark.similarity.kmeans import kmeans_lloyd

    emb = load_table(spark, SF, "embeddings")
    n = emb.count()
    full = {(r.cluster_id, r.dim): r for r in kmeans_lloyd(emb, k=4, iters=2).collect()}
    samp = {
        (r.cluster_id, r.dim): r
        for r in kmeans_lloyd(emb, k=4, iters=2, sample_mod=2).collect()
    }
    assert set(samp) == set(full)  # same k x d exploded shape
    assert sum(r.n_points for (c, d), r in samp.items() if d == 1) == n
    inertia_full = sum(r.inertia_q for (c, d), r in full.items() if d == 1)
    inertia_samp = sum(r.inertia_q for (c, d), r in samp.items() if d == 1)
    assert 0 < inertia_samp < inertia_full * 2
    # determinism of the sampled path itself (partitioning-invariant)
    again = {
        (r.cluster_id, r.dim): (r.coord_q, r.n_points, r.inertia_q)
        for r in kmeans_lloyd(emb.repartition(7), k=4, iters=2, sample_mod=2).collect()
    }
    assert again == {k: (r.coord_q, r.n_points, r.inertia_q) for k, r in samp.items()}


def test_pq_sample_mod_one_equals_full_training(spark):
    from p6__mapreduce_spark.similarity.pq import pq_codes

    emb = load_table(spark, SF, "embeddings")
    full = pq_codes(emb, m=4, k=8, iters=2).collect()
    sampled = pq_codes(emb, m=4, k=8, iters=2, sample_mod=1).collect()
    assert [tuple(r) for r in full] == [tuple(r) for r in sampled]


def test_pq_sample_training_encodes_full_corpus(spark):
    from p6__mapreduce_spark.similarity.pq import pq_codes

    emb = load_table(spark, SF, "embeddings")
    n = emb.count()
    out = pq_codes(emb, m=4, k=8, iters=2, sample_mod=2).collect()
    # every corpus vector gets a code in every subspace (encoding runs
    # over the FULL table even though training saw only bucket 0)
    assert len(out) == n * 4
    assert all(0 <= r.code < 8 and r.err_q >= 0 for r in out)


def test_knn_pq_sample_training_searches_full_corpus(spark):
    from p6__mapreduce_spark.similarity.pq import knn_pq

    emb = load_table(spark, SF, "embeddings")
    out = knn_pq(emb, n_queries=4, topk=3, m=4, k=8, iters=2, sample_mod=2).collect()
    assert len(out) == 4 * 3
    # ranks are dense per query and distances non-decreasing in rank
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == [1, 2, 3]
        assert all(a.adc_dist_q <= b.adc_dist_q for a, b in zip(rows, rows[1:]))


def test_knn_ivfpq_shape_and_ordering(spark):
    from p6__mapreduce_spark.similarity.ivfpq import knn_ivfpq

    emb = load_table(spark, SF, "embeddings")
    out = knn_ivfpq(emb, n_queries=4, topk=3, k_coarse=4, nprobe=2, m=4, k=8).collect()
    assert len(out) == 4 * 3
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == [1, 2, 3]
        assert all(a.adc_dist_q <= b.adc_dist_q for a, b in zip(rows, rows[1:]))
    # a query probing its own cell must find itself at distance ~0
    # (its residual IS a codebook training point family); at minimum
    # the query id itself appears in its own top-3 with the smallest
    # distance of its list
    for qid, rows in by_q.items():
        ids = [r.vec_id for r in rows]
        if qid in ids:
            assert rows[0].vec_id == qid or rows[0].adc_dist_q <= [
                r for r in rows if r.vec_id == qid
            ][0].adc_dist_q


def test_knn_ivfpq_candidates_come_from_probed_cells_only(spark):
    # IVF semantics: every returned candidate's cell must be one of
    # the query's nprobe nearest coarse cells — the pruning that makes
    # the index sublinear
    from p6__mapreduce_spark.similarity.ivfpq import knn_ivfpq
    from p6__mapreduce_spark.similarity.kmeans import lloyd_train, quantized_expr
    from pyspark.sql import functions as F

    emb = load_table(spark, SF, "embeddings")
    q = emb.select(F.col("vec_id"), quantized_expr("embedding").alias("e"))
    coarse = lloyd_train(q.localCheckpoint(eager=True), 4, 2)
    out = knn_ivfpq(emb, n_queries=4, topk=3, k_coarse=4, nprobe=2, m=4, k=8).collect()
    queries = {r.vec_id: list(r.e) for r in q.filter(F.col("vec_id") < 4).collect()}
    for r in out:
        qe = queries[r.query_id]
        dists = sorted(
            (sum((a - b) * (a - b) for a, b in zip(qe, cent)), ci)
            for ci, cent in enumerate(coarse)
        )
        probed = {ci for _, ci in dists[:2]}
        assert r.cell in probed, (r, probed)


def test_knn_ivfpq_partitioning_invariant(spark):
    from p6__mapreduce_spark.similarity.ivfpq import knn_ivfpq

    emb = load_table(spark, SF, "embeddings")
    a = [tuple(r) for r in knn_ivfpq(emb, n_queries=3, topk=3, k_coarse=4, m=4, k=8).collect()]
    b = [
        tuple(r)
        for r in knn_ivfpq(
            emb.repartition(7), n_queries=3, topk=3, k_coarse=4, m=4, k=8
        ).collect()
    ]
    assert a == b


def test_knn_ivfpq_sample_training_full_search(spark):
    from p6__mapreduce_spark.similarity.ivfpq import knn_ivfpq

    emb = load_table(spark, SF, "embeddings")
    out = knn_ivfpq(
        emb, n_queries=3, topk=3, k_coarse=4, nprobe=2, m=4, k=8, sample_mod=2
    ).collect()
    assert len(out) == 3 * 3
    assert all(r.adc_dist_q >= 0 for r in out)
