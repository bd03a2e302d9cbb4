"""Degree-oriented triangle counting unit tests on hand-built graphs."""

from __future__ import annotations


def _stats(spark, edges):
    from p6__mapreduce_spark.dedup.triangles import triangle_stats

    pairs = spark.createDataFrame(edges, "id1 long, id2 long")
    return {r.doc_id: (r.degree, r.n_triangles, r.lcc_q6) for r in triangle_stats(pairs).collect()}


def test_single_triangle(spark):
    got = _stats(spark, [(1, 2), (1, 3), (2, 3)])
    assert got == {1: (2, 1, 1_000_000), 2: (2, 1, 1_000_000), 3: (2, 1, 1_000_000)}


def test_chain_has_no_triangles(spark):
    got = _stats(spark, [(1, 2), (2, 3), (3, 4)])
    assert got[2] == (2, 0, 0) and got[3] == (2, 0, 0)
    assert got[1] == (1, 0, 0) and got[4] == (1, 0, 0)


def test_four_clique(spark):
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    got = _stats(spark, edges)
    # every node: degree 3, sits in C(3,2)=3 triangles, lcc = 1
    assert got == {v: (3, 3, 1_000_000) for v in range(1, 5)}


def test_clique_plus_pendant(spark):
    # triangle 1-2-3 with pendant 4 hanging off 3: node 3 has deg 3,
    # 1 triangle, lcc = 2*1/(3*2) = 1/3
    got = _stats(spark, [(1, 2), (1, 3), (2, 3), (3, 4)])
    assert got[3] == (3, 1, 333_333)
    assert got[4] == (1, 0, 0)


def test_two_disjoint_triangles(spark):
    got = _stats(spark, [(1, 2), (1, 3), (2, 3), (10, 11), (10, 12), (11, 12)])
    assert all(v == (2, 1, 1_000_000) for v in got.values())
    assert len(got) == 6


def test_equal_degree_tiebreak_still_counts_once(spark):
    # all nodes in a triangle have equal degree — orientation falls to
    # the id tiebreak; the triangle must still be counted exactly once
    # per corner (regression guard for a broken total order)
    got = _stats(spark, [(5, 9), (5, 7), (7, 9)])
    assert [got[v][1] for v in (5, 7, 9)] == [1, 1, 1]
