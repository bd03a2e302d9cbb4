"""TF-IDF / BM25 scoring and sampling-operator tests on crafted data.

Hand-computed expectations: corpus of 3 docs, so N, tf, df, dl and
avgdl are all small enough to verify against the closed-form formulas.
"""

from __future__ import annotations

import math

import pytest

from p6__mapreduce_spark.operators.pipeline import stratified_sample
from p6__mapreduce_spark.operators.ranking import bm25_scores, tfidf_doc_terms


def docs_df(spark, texts: list[str]):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


CORPUS = ["a a b", "b c", "c c c d"]
# tf: d0:{a:2,b:1} d1:{b:1,c:1} d2:{c:3,d:1}; df: a=1 b=2 c=2 d=1; N=3


def test_tfidf_matches_closed_form(spark):
    rows = tfidf_doc_terms(docs_df(spark, CORPUS)).collect()
    got = {(r.doc_id, r.token): (r.tf, r.df, r.tfidf_q4) for r in rows}
    assert len(got) == 6
    for (doc, tok), (tf, df, q4) in got.items():
        expect = math.floor(tf * math.log(3.0 / df) * 10000 + 0.5)
        assert q4 == expect, (doc, tok, q4, expect)
    assert got[(0, "a")][:2] == (2, 1)
    assert got[(2, "c")][:2] == (3, 2)


def test_bm25_matches_closed_form(spark):
    k1, b = 1.2, 0.75
    rows = bm25_scores(docs_df(spark, CORPUS), ["c", "zzz"], k1=k1, b=b).collect()
    dls = [3, 2, 4]
    avgdl = sum(dls) / 3
    # df: c=2, zzz=0 -> idf(zzz) = ln(3.5/0.5) counted with tf=0 -> 0 term
    tfs = [0, 1, 3]
    for r, dl, tf in zip(sorted(rows, key=lambda r: r.doc_id), dls, tfs):
        idf = math.log((3 - 2 + 0.5) / (2 + 0.5))
        score = idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl)) if tf else 0.0
        assert r.dl == dl
        assert r.score_q4 == math.floor(score * 10000 + 0.5), (r.doc_id, r.score_q4, score)


def test_bm25_rare_term_outranks_common(spark):
    # 5-doc corpus: 'c' in two docs (df=2), 'd' in one (df=1); the docs
    # matching each term have identical tf (1) and dl (2), so the ONLY
    # difference is idf — ln(3.5/2.5) vs ln(4.5/1.5) — and the rare-term
    # doc must score strictly higher. Both idfs are positive, so neither
    # score degenerates to 0 (an earlier 2-doc version had idf=ln(1)=0
    # for both terms and could not detect a ranking regression).
    corpus = ["c x", "d x", "c y", "z z", "w w"]
    rows = {r.doc_id: r.score_q4 for r in bm25_scores(docs_df(spark, corpus), ["c", "d"]).collect()}
    assert rows[0] > 0 and rows[1] > 0
    assert rows[1] > rows[0]  # rare 'd' outranks common 'c' at equal tf/dl


def test_bm25_empty_query_terms_raises(spark):
    from p6__mapreduce_spark.operators.ranking import bm25_oracle_sql

    with pytest.raises(ValueError):
        bm25_scores(docs_df(spark, ["a"]), [])
    with pytest.raises(ValueError):
        bm25_oracle_sql([])


def test_unigram_surprise_closed_form(spark):
    from p6__mapreduce_spark.operators.ranking import unigram_surprise

    # corpus "a a b" + "b c": counts a=2 b=2 c=1, total=5
    rows = {r.doc_id: r for r in unigram_surprise(docs_df(spark, ["a a b", "b c"])).collect()}
    q6 = lambda cnt: math.floor(math.log(cnt / 5) * 1e6 + 0.5)
    assert rows[0].n_tokens == 3
    assert rows[0].surprise_q6 == -(2 * q6(2) + q6(2))
    assert rows[1].surprise_q6 == -(q6(2) + q6(1))
    # rare tokens -> higher surprisal
    assert rows[1].surprise_q6 / 2 > rows[0].surprise_q6 / 3


def test_stratified_sample_rates_and_determinism(spark):
    rows = spark.createDataFrame(
        [(i, "hot" if i % 2 else "cold") for i in range(2000)], "event_id long, event_type string"
    )
    out = stratified_sample(rows, {"hot": 1.0, "cold": 0.1})
    got = out.groupBy("event_type").count().collect()
    counts = {r.event_type: r["count"] for r in got}
    assert counts["hot"] == 1000  # rate 1.0 keeps everything
    assert 50 <= counts["cold"] <= 150  # ~10% of 1000, hash-deterministic
    assert out.count() == out.count()  # recompute-stable (no rand())
    # strata without a configured rate are dropped
    assert stratified_sample(rows, {"hot": 1.0}).filter("event_type = 'cold'").count() == 0


def test_bigram_entropy_closed_form(spark):
    from p6__mapreduce_spark.operators.ranking import bigram_entropy

    rows = {r.doc_id: r for r in bigram_entropy(docs_df(spark, ["a b a b a", "a a a a a"])).collect()}
    # doc 0 bigrams: "a b" x2, "b a" x2 -> uniform over 2 -> H = ln 2
    # doc 1 bigrams: "a a" x4 -> H = 0
    assert rows[1].entropy == 0.0
    assert abs(rows[0].entropy - math.log(2)) < 1e-5
    assert rows[0].n_bigrams == 4 and rows[1].n_bigrams == 4


def test_bigram_perplexity_backoff_and_ordering(spark):
    from p6__mapreduce_spark.operators.ranking import bigram_perplexity

    corpus = [
        "a b a b a b",  # doc 0: (a,b) x3, (b,a) x2 — high-probability pairs
        "a b a b",      # doc 1: reinforces the same pairs
        "x y",          # doc 2: hapax pair -> pure stupid-backoff scoring
        "z",            # doc 3: no bigrams -> absent from output
    ]
    df = spark.createDataFrame(list(enumerate(corpus)), "doc_id long, text string")
    rows = {r.doc_id: r for r in bigram_perplexity(df).collect()}
    assert set(rows) == {0, 1, 2}  # single-token doc drops out
    assert rows[0].n_bigrams == 5 and rows[2].n_bigrams == 1
    # predictable template text scores far lower NLL than the hapax pair
    assert rows[0].avg_nll < rows[2].avg_nll
    assert rows[1].avg_nll < rows[2].avg_nll
    # exact relationship between the integer sum and the average
    assert abs(rows[0].avg_nll - rows[0].nll_q6 / (5 * 1e6)) < 1e-12
