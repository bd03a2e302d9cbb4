"""Planted-fixture tests for the named Gopher / C4 filter suites —
the parquet testdata is single-line lowercase word-soup, so the
symbol/brace/phrase rules only light up on these synthetic docs."""

from __future__ import annotations

import pytest


def docs_df(spark, texts: list[str]):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_gopher_quality_filters_rules(spark):
    from p6__mapreduce_spark.operators.quality_filters import gopher_quality_filters

    good = "the cat and the dog have fun with all of that stuff " * 5  # 60 words
    too_short = "the cat and that dog"  # 5 words < 50
    no_stop = "alpha beta gamma delta " * 15  # 60 words, 0 stopword hits
    symbols = ("the cat and that dog " + "# " * 40) * 2  # symbol ratio >0.1
    rows = {
        r.doc_id: r
        for r in gopher_quality_filters(
            docs_df(spark, [good, too_short, no_stop, symbols])
        ).collect()
    }
    assert rows[0].pass_gopher
    assert rows[0].n_words == 60 and rows[0].stopword_hits >= 2
    assert not rows[1].pass_gopher  # word floor
    assert not rows[2].pass_gopher and rows[2].stopword_hits == 0
    assert not rows[3].pass_gopher and rows[3].symbol_hits == 80
    assert rows[3].symbol_ratio > 0.1


def test_gopher_quality_mean_word_len_bounds(spark):
    from p6__mapreduce_spark.operators.quality_filters import gopher_quality_filters

    # 60 words of length 12 -> mean 12 > 10 fails; stopwords present
    longwords = ("extraordinary " * 58) + "the of"
    rows = gopher_quality_filters(docs_df(spark, [longwords])).collect()
    assert len(rows) == 1
    assert rows[0].mean_word_len > 10 and not rows[0].pass_gopher


def test_gopher_top_ngram_frac_closed_form(spark):
    from p6__mapreduce_spark.operators.quality_filters import gopher_top_ngram_frac

    # tokens [a b a b a b]: top 2-gram "a b" x3, top 3-gram "a b a" x2,
    # top 4-gram "a b a b" x2 (ties "b a b a" -> lexicographic smallest)
    rows = {(r.doc_id, r.n): r for r in gopher_top_ngram_frac(docs_df(spark, ["a b a b a b"])).collect()}
    total = len("a b a b a b")
    r2 = rows[(0, 2)]
    assert (r2.top_gram_chars, r2.top_gram_count, r2.total_chars) == (3, 3, total)
    assert r2.covered_chars == 9 and abs(r2.top_frac - 9 / total) < 1e-12
    r3 = rows[(0, 3)]
    assert (r3.top_gram_chars, r3.top_gram_count) == (5, 2)
    r4 = rows[(0, 4)]
    assert (r4.top_gram_chars, r4.top_gram_count) == (7, 2)


def test_gopher_top_ngram_short_docs_omitted(spark):
    from p6__mapreduce_spark.operators.quality_filters import gopher_top_ngram_frac

    # 2 tokens: only the n=2 row exists; 1 token: no rows at all
    rows = gopher_top_ngram_frac(docs_df(spark, ["x y", "z"])).collect()
    assert [(r.doc_id, r.n) for r in rows] == [(0, 2)]


def test_c4_quality_filters_flags(spark):
    from p6__mapreduce_spark.operators.quality_filters import c4_quality_filters

    texts = [
        "a perfectly normal document with enough words here",
        "short one",  # < 5 words
        "function f() { return 1 }",  # brace
        "Lorem Ipsum dolor sit amet etc etc",  # phrase, case-insensitive
        "please read our Privacy Policy before continuing on",
    ]
    rows = {r.doc_id: r for r in c4_quality_filters(docs_df(spark, texts)).collect()}
    assert rows[0].keep and not rows[0].has_brace and not rows[0].has_policy_phrase
    assert not rows[1].keep  # word floor
    assert rows[2].has_brace and not rows[2].keep
    assert rows[3].has_policy_phrase and not rows[3].keep
    assert rows[4].has_policy_phrase and not rows[4].keep


def test_quality_filters_are_map_side_only(spark):
    # scale pin: both per-doc suites must plan with NO exchange — one
    # map-side pass over the scan (the top-ngram profile legitimately
    # aggregates per doc and is exempt)
    from p6__mapreduce_spark.operators.quality_filters import (
        c4_quality_filters,
        gopher_quality_filters,
    )
    from p6__mapreduce_spark.plans import optimized_logical_plan
    from p6__mapreduce_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    for op in (gopher_quality_filters, c4_quality_filters):
        plan = optimized_logical_plan(op(docs))
        # orderBy is presentation; check the pre-sort body has no agg/join
        assert "Join" not in plan and "Aggregate" not in plan, plan
