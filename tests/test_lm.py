"""Kneser-Ney bigram LM unit tests — hand-computed probabilities."""

from __future__ import annotations

import pytest


def _kn(spark, texts, min_pair_count=1):
    from p6__mapreduce_spark.operators.lm import kneser_ney_bigram

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {
        (r.w1, r.w2): r
        for r in kneser_ney_bigram(docs, min_pair_count=min_pair_count).collect()
    }


def test_hand_computed_probabilities(spark):
    # corpus "a b a b a c": bigrams (a,b)x2 (b,a)x2 (a,c)x1
    # T=3 types; c(a.)=3, N1+(a,.)=2; c(b.)=2, N1+(b,.)=1
    # Ncont(a)=1, Ncont(b)=1, Ncont(c)=1
    out = _kn(spark, ["a b a b a c"])
    ab = out[("a", "b")]
    assert (ab.c_pair, ab.c_ctx, ab.n1_w1, ab.ncont_w2) == (2, 3, 2, 1)
    # ((4*2-3)*3 + 3*2*1) / (4*3*3) = 21/36
    assert ab.pkn == pytest.approx(21 / 36, abs=0)
    ba = out[("b", "a")]
    # ((8-3)*3 + 3*1*1) / (4*2*3) = 18/24
    assert ba.pkn == pytest.approx(0.75, abs=0)
    ac = out[("a", "c")]
    # ((4-3)*3 + 3*2*1) / 36 = 9/36
    assert ac.pkn == pytest.approx(0.25, abs=0)


def test_discount_moves_mass_to_diverse_continuations(spark):
    # "x y" seen once in many contexts makes y a diverse continuation;
    # a bigram with the same raw count but a diverse right word must
    # score higher than one with a one-context right word
    out = _kn(spark, ["p q", "r q", "s q", "t u"])
    # c(p,q)=c(t,u)=1, same context stats (each left word once);
    # Ncont(q)=3 vs Ncont(u)=1
    assert out[("p", "q")].pkn > out[("t", "u")].pkn


def test_min_pair_count_filters_output_not_normalization(spark):
    full = _kn(spark, ["a b a b a c"], min_pair_count=1)
    cut = _kn(spark, ["a b a b a c"], min_pair_count=2)
    assert ("a", "c") in full and ("a", "c") not in cut
    # surviving rows unchanged by the cut (stats computed pre-cut)
    assert cut[("a", "b")].pkn == full[("a", "b")].pkn


def test_seen_successor_mass_below_one(spark):
    out = _kn(spark, ["a b a b a c a d a e"])
    mass = sum(r.pkn for (w1, _), r in out.items() if w1 == "a")
    assert 0 < mass < 1  # discount reserves mass for unseen successors
