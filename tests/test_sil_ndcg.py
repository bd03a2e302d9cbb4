"""Centroid-silhouette and nDCG@10: hand-computed expectations."""

from __future__ import annotations

import pytest

from p6__mapreduce_spark.queries import _NDCG_CUM_Q9, _NDCG_DISC_Q9
from p6__mapreduce_spark.similarity.silhouette import silhouette_by_cluster


def _emb(spark, vecs, labels=None):
    labels = labels or [0] * len(vecs)
    return spark.createDataFrame(
        [(i, [float(x) for x in v], int(l)) for i, (v, l) in enumerate(zip(vecs, labels))],
        "vec_id long, embedding array<float>, label int",
    )


class TestSilhouette:
    def test_well_separated_clusters(self, spark):
        # two tight clusters around (0,) and (10,): silhouette near 1
        vecs = [[0.0], [0.2], [10.0], [10.2]]
        cents = [[0.1], [10.1]]
        out = {r["cluster"]: r for r in silhouette_by_cluster(_emb(spark, vecs), cents).collect()}
        assert out[0]["n_points"] == 2 and out[1]["n_points"] == 2
        assert out[0]["mean_silhouette"] > 0.99
        assert out[1]["mean_silhouette"] > 0.99

    def test_point_on_centroid_scores_one(self, spark):
        # a point exactly at centroid 0: a=0, b>0 -> s = 1
        vecs = [[0.0], [5.0]]
        cents = [[0.0], [5.0]]
        out = {r["cluster"]: r for r in silhouette_by_cluster(_emb(spark, vecs), cents).collect()}
        assert out[0]["mean_silhouette"] == pytest.approx(1.0)

    def test_midpoint_scores_zero(self, spark):
        # equidistant point: b == a -> s = 0
        vecs = [[2.5]]
        cents = [[0.0], [5.0]]
        out = silhouette_by_cluster(_emb(spark, vecs), cents).collect()
        assert out[0]["mean_silhouette"] == pytest.approx(0.0)
        assert out[0]["cluster"] == 0  # tie breaks to the lower centroid id


class TestNdcgLiterals:
    def test_discounts_monotone(self):
        assert _NDCG_DISC_Q9[0] == 10**9  # 1/log2(2) = 1
        assert all(a > b for a, b in zip(_NDCG_DISC_Q9, _NDCG_DISC_Q9[1:]))
        assert _NDCG_CUM_Q9[-1] == sum(_NDCG_DISC_Q9)

    def test_perfect_ranking_gives_ndcg_one(self, spark):
        import os
        import shutil
        import tempfile

        import p6__mapreduce_spark.queries as Q

        # 1 query (id 0) + 3 same-label neighbors clustered next to it,
        # plus distant other-label vectors: the top-3 are all relevant,
        # total relevant = 3 -> dcg = idcg -> ndcg = 1.
        vecs = [[1.0, 0.0], [0.99, 0.01], [0.98, 0.02], [0.97, 0.03],
                [-1.0, 0.0], [-0.9, -0.1]]
        labels = [1, 1, 1, 1, 2, 2]
        df = _emb(spark, vecs, labels)
        d = tempfile.mkdtemp(prefix="p6_ndcg_")
        df.write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))
        try:
            out = {r["query_id"]: r for r in Q.QUERIES["retrieval_ndcg_eval"](spark, d).collect()}
        finally:
            shutil.rmtree(d, ignore_errors=True)
        r0 = out[0]
        assert r0["dcg_q9"] == _NDCG_CUM_Q9[2]  # ranks 1..3 relevant
        assert r0["idcg_q9"] == _NDCG_CUM_Q9[2]
        assert r0["ndcg"] == pytest.approx(1.0)
        # query 4 (label 2): its single same-label partner ranks LAST
        # among 5 candidates (all label-1 vectors are closer in cosine? no
        # — cosine([-1,0],[-0.9,-0.1]) is high) — just assert bounds
        assert 0.0 <= out[4]["ndcg"] <= 1.0
