"""Sorted-neighborhood dedup + Markov accuracy unit tests."""

from __future__ import annotations

import datetime as dt

import pytest


def _docs(spark, rows):
    """rows: (doc_id, text)."""
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for (i, t) in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_snm_finds_adjacent_near_dup(spark):
    from p6__mapreduce_spark.dedup.neighborhood import sorted_neighborhood_pairs

    # same 8-char block ("alpha be"), adjacent after sort, jaccard 3/4
    docs = _docs(
        spark,
        [
            (0, "alpha beta gamma delta"),
            (1, "alpha beta gamma zeta"),
            (2, "omega psi chi phi"),
        ],
    )
    got = sorted_neighborhood_pairs(docs, min_jaccard=0.5).collect()
    assert len(got) == 1
    assert (got[0].doc_a, got[0].doc_b) == (0, 1)
    assert got[0].jaccard == pytest.approx(3 / 5)


def test_snm_window_limits_comparisons(spark):
    from p6__mapreduce_spark.dedup.neighborhood import sorted_neighborhood_pairs

    # five identical-block docs, window=2: only adjacent ranks pair,
    # so identical docs 4 ranks apart are NOT compared (the documented
    # miss mode) while adjacent identicals are found
    docs = _docs(
        spark,
        [
            (0, "block one aaa"),
            (1, "block one bbb"),
            (2, "block one bbb"),
            (3, "block one yyy"),
            (4, "block one aaa"),  # sorts adjacent to doc 0
        ],
    )
    got = sorted_neighborhood_pairs(docs, window=2, min_jaccard=0.99).collect()
    pairs = {(r.doc_a, r.doc_b) for r in got}
    assert pairs == {(0, 4), (1, 2)}


def test_snm_blocking_prevents_cross_block_pairs(spark):
    from p6__mapreduce_spark.dedup.neighborhood import sorted_neighborhood_pairs

    # identical token sets but different first-8-chars: never compared
    docs = _docs(spark, [(0, "aaaaaaaa x y z"), (1, "bbbbbbbb x y z")])
    assert sorted_neighborhood_pairs(docs, min_jaccard=0.1).collect() == []


def _events(spark, rows):
    """rows: (event_id, user_id, minute, event_type)."""
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [(i, base + dt.timedelta(minutes=m), u, t, 1.0) for (i, u, m, t) in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def test_markov_argmax_and_accuracy(spark):
    from p6__mapreduce_spark.queries import QUERIES  # noqa: F401
    from p6__mapreduce_spark.queries import q_markov_next_accuracy

    # user 1: a->b, b->a, a->b ; user 2: a->c
    # context a: {b:2, c:1} -> predict b, acc 2/3; context b: {a:1} -> acc 1
    ev = _events(
        spark,
        [
            (0, 1, 0, "a"), (1, 1, 1, "b"), (2, 1, 2, "a"), (3, 1, 3, "b"),
            (4, 2, 0, "a"), (5, 2, 1, "c"),
        ],
    )
    import p6__mapreduce_spark.queries as qmod

    orig = qmod.load_table
    qmod.load_table = lambda s, d, n: ev
    try:
        got = {r.prev_type: r for r in q_markov_next_accuracy(spark, "ignored").collect()}
    finally:
        qmod.load_table = orig
    assert got["a"].predicted_next == "b"
    assert got["a"].n_transitions == 3 and got["a"].hits == 2
    assert got["a"].accuracy == pytest.approx(2 / 3)
    assert got["b"].accuracy == pytest.approx(1.0)


def test_markov_tie_breaks_lexicographically(spark):
    from p6__mapreduce_spark.queries import q_markov_next_accuracy
    import p6__mapreduce_spark.queries as qmod

    # context a: {b:1, c:1} tie -> lexicographically smallest 'b'
    ev = _events(spark, [(0, 1, 0, "a"), (1, 1, 1, "b"), (2, 2, 0, "a"), (3, 2, 1, "c")])
    orig = qmod.load_table
    qmod.load_table = lambda s, d, n: ev
    try:
        got = {r.prev_type: r for r in q_markov_next_accuracy(spark, "x").collect()}
    finally:
        qmod.load_table = orig
    assert got["a"].predicted_next == "b"
    assert got["a"].accuracy == pytest.approx(0.5)
