"""Text-analysis operator tests on crafted documents."""

from __future__ import annotations


from p6__mapreduce_spark.functions.hashing import POLY_BASE, POLY_MOD
from p6__mapreduce_spark.operators.text_analysis import (
    fingerprints,
    lang_id,
    quality_score,
    token_stats,
    word_freq,
)


def docs_df(spark, texts: list[str]):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def py_poly_hash(s: str, base: int = POLY_BASE, mod: int = POLY_MOD) -> int:
    h = 0
    for ch in s:
        h = (h * base + ord(ch)) % mod
    return h


def test_token_stats(spark):
    rows = token_stats(docs_df(spark, ["Hello, hello world!", "a b a b a"])).orderBy("doc_id").collect()
    assert (rows[0].n_tokens, rows[0].n_unique) == (3, 2)  # hello hello world
    assert (rows[1].n_tokens, rows[1].n_unique) == (5, 2)
    assert rows[1].unique_ratio == 2 / 5


def test_word_freq(spark):
    rows = word_freq(docs_df(spark, ["a b a", "b c"])).collect()
    assert [(r.token, r.cnt) for r in rows] == [("a", 2), ("b", 2), ("c", 1)]


def test_lang_id_stopword_heuristic(spark):
    rows = (
        lang_id(
            docs_df(
                spark,
                [
                    "the cat sat on the mat and the dog is here",
                    "der hund und die katze ist ein tier",
                    "xyz qqq zzz www",
                ],
            )
        )
        .orderBy("doc_id")
        .collect()
    )
    assert [r.pred_lang for r in rows] == ["en", "de", "und"]


def test_quality_score_components(spark):
    long_doc = " ".join(f"tok{i}" for i in range(30))
    rows = quality_score(docs_df(spark, [long_doc, "x y"])).orderBy("doc_id").collect()
    assert rows[0].len_ok == 1 and rows[0].quality == 1.0
    assert rows[1].len_ok == 0  # too short


def test_winnow_shared_substring_shares_fingerprint(spark):
    from p6__mapreduce_spark.operators.text_analysis import winnow_fingerprints

    shared = "the quick brown fox jumps over the lazy dog near the river bank"
    d = docs_df(
        spark,
        [
            "intro text before " + shared + " and some trailing words here",
            "totally different opening then " + shared + " closing remarks",
            "no overlap with anything else in this corpus at all whatsoever",
        ],
    )
    fps = {}
    for r in winnow_fingerprints(d, k=16, window=8).collect():
        fps.setdefault(r.doc_id, set()).add(r.fp)
    assert fps[0] & fps[1], "docs sharing a long substring must share a fingerprint"
    assert not (fps[0] & fps[2]) or len(fps[0] & fps[2]) < len(fps[0] & fps[1])


def test_fingerprints_match_python_model(spark):
    import hashlib

    texts = ["hello world", "abc", ""]
    rows = fingerprints(docs_df(spark, texts)).orderBy("doc_id").collect()
    for row, text in zip(rows, texts):
        assert row.sha256_hex == hashlib.sha256(text.encode()).hexdigest()
        assert row.poly_hash == py_poly_hash(text)


def test_textrank_uniform_cycle_is_stationary(spark):
    from p6__mapreduce_spark.operators.textrank import UNIT, textrank_keywords

    # "a b c a": cycle graph, all degrees equal -> uniform ranks are the
    # exact fixed point: BASE + 0.85*UNIT = UNIT survives both rounds
    df = spark.createDataFrame([(0, "a b c a")], "doc_id long, text string")
    rows = textrank_keywords(df, iters=2, top_k=10).collect()
    assert len(rows) == 3
    assert all(r.rank_q == UNIT for r in rows)
    # deterministic tie-break: token ascending
    assert [r.token for r in rows] == ["a", "b", "c"]


def test_textrank_hub_outranks_leaves(spark):
    from p6__mapreduce_spark.operators.textrank import cooccurrence_edges, textrank_keywords

    # star graph: 'a' adjacent to b, c, d -> hub receives 3 full
    # contributions, leaves get 1/3 of the hub's mass
    df = spark.createDataFrame([(0, "a b a c a d")], "doc_id long, text string")
    edges = {(r.src, r.dst): r.w for r in cooccurrence_edges(df).collect()}
    assert edges[("a", "b")] == edges[("b", "a")]  # symmetric
    assert ("b", "c") not in edges  # leaves not adjacent
    rows = textrank_keywords(df, iters=2, top_k=10).collect()
    ranks = {r.token: r.rank_q for r in rows}
    # hub first; b/c (edge weight 2: pair + its reverse both occur)
    # tie; d (weight-1 edge — 'a d' appears once, never reversed) last
    assert ranks["a"] > ranks["b"] == ranks["c"] > ranks["d"]


def test_lexicon_hits_counts_and_clean_flag(spark):
    from p6__mapreduce_spark.operators.text_analysis import lexicon_hits

    docs = spark.createDataFrame(
        [
            (0, "bad word here and bad again"),
            (1, "perfectly fine text"),
            (2, "word BAD word"),  # case-folded by the tokenizer
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in lexicon_hits(docs, ["bad", "word"]).collect()}
    assert rows[0].n_hits == 3 and rows[0].n_terms == 2 and rows[0].terms == "bad,word"
    assert not rows[0].clean
    assert rows[1].n_hits == 0 and rows[1].terms == "" and rows[1].clean
    assert rows[2].n_hits == 3 and rows[2].n_terms == 2


def test_readability_hand_computed(spark):
    from p6__mapreduce_spark.operators.text_analysis import readability_scores

    docs = spark.createDataFrame(
        [
            # 4 words, 2 sentences, syllable groups: "the"1 "cat sat"2 "on"1... count
            (0, "The cat sat. On a mat!"),
            (1, "no punctuation here"),  # sentences floored at 1
            (2, "..."),  # zero words -> filtered out
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in readability_scores(docs).collect()}
    assert set(out) == {0, 1}
    r0 = out[0]
    assert r0.n_words == 6
    assert r0.n_sentences == 2
    # vowel groups in "the cat sat. on a mat!": e,a,a,o,a,a -> 6
    assert r0.n_syllables == 6
    wps, spw = 6 / 2, 6 / 6
    assert abs(r0.flesch_ease - (206.835 - 1.015 * wps - 84.6 * spw)) < 1e-12
    assert abs(r0.fk_grade - (0.39 * wps + 11.8 * spw - 15.59)) < 1e-12
    r1 = out[1]
    assert r1.n_sentences == 1
    # "no punctuation here": o | u,ua,io | e,e  -> groups: o(1) u(1) ua(1) io(1) e(1) e(1)?
    # count directly: n-o / p-u-n-c-t-u-a-t-i-o-n / h-e-r-e ->
    # 'o','u','ua','io','e','e' = 6 groups
    assert r1.n_syllables == 6
