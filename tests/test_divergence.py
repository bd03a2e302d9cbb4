"""JSD unit tests — hand-computed two-source corpus, identity and
bound properties."""

from __future__ import annotations

import math

import pytest


def _docs(spark, rows):
    """rows: (doc_id, source, text)."""
    return spark.createDataFrame(
        [(i, t, "en", s, len(t)) for (i, s, t) in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_jsd_hand_computed_two_sources(spark):
    from p6__mapreduce_spark.operators.divergence import jsd_source_unigrams

    # A: {x:2/3, y:1/3}, B: {x:1/2, z:1/2}
    docs = _docs(spark, [(0, "a", "x x y"), (1, "b", "x z")])
    row = jsd_source_unigrams(docs).collect()[0]
    assert (row.source_a, row.source_b) == ("a", "b")
    assert row.n_shared_tokens == 1
    kl_p = (2 / 3) * math.log((2 / 3) / (7 / 12)) + (1 / 3) * math.log(2)
    kl_q = (1 / 2) * math.log((1 / 2) / (7 / 12)) + (1 / 2) * math.log(2)
    assert row.jsd == pytest.approx(0.5 * (kl_p + kl_q), abs=2e-6)


def test_jsd_identical_distributions_is_zero(spark):
    from p6__mapreduce_spark.operators.divergence import jsd_source_unigrams

    docs = _docs(spark, [(0, "a", "x x y"), (1, "b", "x y x")])
    row = jsd_source_unigrams(docs).collect()[0]
    assert row.jsd == pytest.approx(0.0, abs=2e-6)


def test_jsd_bounded_by_ln2_and_pair_order(spark):
    from p6__mapreduce_spark.operators.divergence import jsd_source_unigrams

    docs = _docs(
        spark,
        [(0, "a", "x x x y"), (1, "b", "y z z"), (2, "c", "x y z w w")],
    )
    got = jsd_source_unigrams(docs).collect()
    assert [(r.source_a, r.source_b) for r in got] == [("a", "b"), ("a", "c"), ("b", "c")]
    for r in got:
        assert 0.0 <= r.jsd <= math.log(2) + 1e-9
