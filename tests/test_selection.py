"""MMR diversification and Gonzalez k-center: the greedy sequences on
hand-constructed geometries where diversity visibly changes the order."""

from __future__ import annotations

import pytest

from p6__mapreduce_spark.similarity.selection import kcenter_coreset, mmr_diversified_topk


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )


class TestMmr:
    def test_diversity_beats_pure_relevance(self, spark):
        # query = [1,0]; candidate 2 is an exact duplicate direction of
        # 1 (sim = 1.0); 3 is slightly less relevant but diverse. At
        # λ=0.5 the duplicate's redundancy penalty (0.5·(1−0.857))
        # outweighs its relevance edge (0.5·(0.990−0.921)), so MMR
        # picks 3 second. Pure relevance order would be 1, 2, 3.
        vecs = [
            [1.0, 0.0],        # 0: query
            [0.99, 0.14],      # 1: most relevant
            [1.98, 0.28],      # 2: exact duplicate direction of 1
            [0.92, -0.39],     # 3: diverse
        ]
        out = mmr_diversified_topk(
            _emb(spark, vecs), query_vec_id=0, k=3, pool_size=10, lam_num=5
        ).collect()
        seq = [r["doc_id"] for r in out]
        assert seq[0] == 1          # relevance seeds the selection
        assert seq[1] == 3          # diversity overrides duplicate 2
        assert seq[2] == 2

    def test_first_pick_score_is_lambda_rel(self, spark):
        vecs = [[1.0, 0.0], [0.6, 0.8], [0.0, 1.0]]
        out = mmr_diversified_topk(_emb(spark, vecs), query_vec_id=0, k=2, pool_size=10).collect()
        first = out[0]
        assert first["mmr_q"] == 7 * first["rel_q"]

    def test_lambda_one_is_pure_relevance(self, spark):
        vecs = [[1.0, 0.0], [0.99, 0.14], [0.98, 0.17], [0.8, 0.6]]
        out = mmr_diversified_topk(
            _emb(spark, vecs), query_vec_id=0, k=3, pool_size=10, lam_num=10
        ).collect()
        assert [r["doc_id"] for r in out] == [1, 2, 3]  # relevance order


class TestKcenter:
    def test_line_traversal(self, spark):
        # points on a line at x = 0, 1, 2, 10. Seed = id 0 (x=0);
        # farthest = x=10 (id 3); then the point maximizing min-dist to
        # {0, 10} is x=2 (id 2, min-dist 4 > x=1's 1... min(4, 64)=4 vs
        # min(1, 81)=1) -> sequence 0, 3, 2.
        vecs = [[0.0], [1.0], [2.0], [10.0]]
        out = kcenter_coreset(_emb(spark, vecs), k=3).collect()
        assert [r["center_id"] for r in out] == [0, 3, 2]
        # radius at step 2 = d²(0, 10) = 100 at 1e12 scale
        assert out[1]["radius_q"] == 100 * 10**12
        assert out[2]["radius_q"] == 4 * 10**12

    def test_radius_monotone_nonincreasing(self, spark):
        vecs = [[0.0, 0.0], [3.0, 0.0], [0.0, 4.0], [5.0, 5.0], [1.0, 1.0], [4.0, 1.0]]
        out = kcenter_coreset(_emb(spark, vecs), k=4).collect()
        radii = [r["radius_q"] for r in out[1:]]
        assert radii == sorted(radii, reverse=True)

    def test_k_equals_n_covers_exactly(self, spark):
        vecs = [[0.0], [5.0], [9.0]]
        out = kcenter_coreset(_emb(spark, vecs), k=3).collect()
        assert sorted(r["center_id"] for r in out) == [0, 1, 2]


class TestShortInputGuards:
    """r6 ADVICE fix: fewer-than-k candidates must yield the shorter
    selection (the oracle's step < k recursion just stops), and an
    empty table must yield an empty frame — never a TypeError from
    subscripting a None .first()."""

    def test_kcenter_k_exceeds_n_returns_all_points(self, spark):
        vecs = [[0.0], [5.0]]
        out = kcenter_coreset(_emb(spark, vecs), k=8).collect()
        assert sorted(r["center_id"] for r in out) == [0, 1]
        assert [r["step"] for r in out] == [1, 2]

    def test_kcenter_empty_table_returns_empty(self, spark):
        out = kcenter_coreset(_emb(spark, []), k=4)
        assert out.count() == 0
        assert [f.name for f in out.schema.fields] == ["step", "center_id", "radius_q"]

    def test_mmr_pool_smaller_than_k_returns_pool(self, spark):
        # 3 candidate vectors besides the query -> only 3 picks possible
        vecs = [[1.0, 0.0], [0.9, 0.1], [0.0, 1.0], [0.5, 0.5]]
        out = mmr_diversified_topk(
            _emb(spark, vecs), query_vec_id=0, k=8, pool_size=30
        ).collect()
        assert len(out) == 3
        assert [r["step"] for r in out] == [1, 2, 3]

    def test_mmr_only_query_vector_returns_empty(self, spark):
        out = mmr_diversified_topk(_emb(spark, [[1.0]]), query_vec_id=0, k=5)
        assert out.count() == 0
        assert [f.name for f in out.schema.fields] == [
            "step",
            "doc_id",
            "rel_q",
            "mmr_q",
        ]
