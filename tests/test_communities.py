"""Label propagation and Naive Bayes unit tests — hand-traced graphs
and a lexically-separable corpus."""

from __future__ import annotations


def test_lpa_bridge_between_two_triangles(spark):
    from p6__mapreduce_spark.dedup.communities import label_propagation

    # triangle {1,2,3} - bridge 3-4 - triangle {4,5,6}: LPA must keep
    # the two cliques in separate communities (hand-traced 3 rounds)
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)],
        "id1 long, id2 long",
    )
    out = {r.doc_id: r for r in label_propagation(pairs, rounds=3).collect()}
    assert set(out) == {1, 2, 3, 4, 5, 6}
    left = {out[v].community for v in (1, 2, 3)}
    right = {out[v].community for v in (4, 5, 6)}
    assert len(left) == 1 and len(right) == 1
    assert left != right
    assert all(out[v].community_size == 3 for v in out)


def test_lpa_single_edge_pair(spark):
    from p6__mapreduce_spark.dedup.communities import label_propagation

    # two nodes, one edge: each adopts the other's label every round;
    # after an odd round count labels have swapped once -> both report
    # a 1-member community (the degenerate oscillation the fixed round
    # count makes deterministic)
    pairs = spark.createDataFrame([(10, 20)], "id1 long, id2 long")
    out = {r.doc_id: r for r in label_propagation(pairs, rounds=3).collect()}
    assert out[10].community == 20 and out[20].community == 10


def test_lpa_clique_converges_to_min_label(spark):
    from p6__mapreduce_spark.dedup.communities import label_propagation

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)], "id1 long, id2 long"
    )
    out = label_propagation(pairs, rounds=3).collect()
    assert {r.community for r in out} == {1}
    assert all(r.community_size == 4 for r in out)


def test_nbayes_separable_sources(spark):
    from p6__mapreduce_spark.operators.nbayes import nbayes_source_confusion

    docs = spark.createDataFrame(
        [
            (0, "alpha alpha common", "A"),
            (1, "alpha common", "A"),
            (2, "beta beta common", "B"),
            (3, "beta common", "B"),
        ],
        "doc_id long, text string, source string",
    )
    out = {(r.actual, r.predicted): r.n_docs for r in nbayes_source_confusion(docs).collect()}
    assert out == {("A", "A"): 2, ("B", "B"): 2}


def test_nbayes_empty_doc_gets_prior_argmax(spark):
    from p6__mapreduce_spark.operators.nbayes import nbayes_source_confusion

    # doc 4 has no tokens: score reduces to the prior; A has more docs
    # so the empty doc lands on A
    docs = spark.createDataFrame(
        [
            (0, "alpha", "A"),
            (1, "alpha", "A"),
            (2, "alpha", "A"),
            (3, "beta", "B"),
            (4, "...", "B"),
        ],
        "doc_id long, text string, source string",
    )
    out = {(r.actual, r.predicted): r.n_docs for r in nbayes_source_confusion(docs).collect()}
    assert out[("B", "A")] == 1  # the empty doc
    assert out[("A", "A")] == 3


def test_kcore_peels_the_tail(spark):
    from p6__mapreduce_spark.dedup.kcore import kcore

    # triangle {1,2,3} with a tail 3-4-5: the 2-core is the triangle,
    # every core degree 2; nodes 4, 5 peel off
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)], "id1 long, id2 long"
    )
    out = {r.doc_id: r.core_degree for r in kcore(pairs, k=2, rounds=6).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_kcore_path_graph_empties(spark):
    from p6__mapreduce_spark.dedup.kcore import kcore

    # a pure path has no 2-core: synchronous peel eats one node from
    # each end per round until nothing remains
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], "id1 long, id2 long"
    )
    assert kcore(pairs, k=2, rounds=6).count() == 0


def test_kcore_raises_when_rounds_too_small(spark):
    import pytest

    from p6__mapreduce_spark.dedup.kcore import kcore

    # a 16-node path needs ~8 synchronous peel rounds; rounds=2 must
    # refuse rather than return a non-core set
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 16)], "id1 long, id2 long"
    )
    with pytest.raises(ValueError, match="did not converge"):
        kcore(pairs, k=2, rounds=2)


def test_kcore_clique_keeps_everything(spark):
    from p6__mapreduce_spark.dedup.kcore import kcore

    pairs = spark.createDataFrame(
        [(a, b) for a in range(1, 5) for b in range(a + 1, 5)], "id1 long, id2 long"
    )
    out = {r.doc_id: r.core_degree for r in kcore(pairs, k=2, rounds=3).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}
