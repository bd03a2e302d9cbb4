"""KS statistic and Mann-Whitney AUC unit tests — hand-computed."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def _ks(spark, g1_vals, g2_vals):
    from p6__mapreduce_spark.operators.evaluate import ks_statistic

    rows = [(v, "a") for v in g1_vals] + [(v, "b") for v in g2_vals]
    df = spark.createDataFrame(rows, "v long, g string")
    return ks_statistic(
        df, F.col("v"), F.col("g") == "a", F.col("g") == "b"
    ).collect()[0]


def test_ks_identical_samples_zero(spark):
    r = _ks(spark, [1, 2, 3, 4], [1, 2, 3, 4])
    assert (r.n1, r.n2, r.d_num) == (4, 4, 0)
    assert r.ks == 0.0


def test_ks_disjoint_samples_one(spark):
    r = _ks(spark, [1, 2, 3], [10, 11, 12])
    assert r.ks == 1.0
    assert r.at_value == 3  # sup first attained at g1's max


def test_ks_hand_computed_with_ties(spark):
    # g1 = [1,2,2,3], g2 = [2,3,3,4]:
    # v=1: F1=1/4, F2=0    -> |1*4-0*4| = 4
    # v=2: F1=3/4, F2=1/4  -> |3*4-1*4| = 8  <- sup (ks = 8/16 = .5)
    # v=3: F1=4/4, F2=3/4  -> 4 ; v=4: 0
    r = _ks(spark, [1, 2, 2, 3], [2, 3, 3, 4])
    assert (r.d_num, r.at_value) == (8, 2)
    assert r.ks == pytest.approx(0.5, abs=0)


def _auc(spark, scored):
    from p6__mapreduce_spark.operators.evaluate import mann_whitney_auc

    df = spark.createDataFrame(scored, "s long, y boolean")
    return mann_whitney_auc(df, F.col("s"), F.col("y")).collect()[0]


def test_auc_perfect_separation(spark):
    r = _auc(spark, [(1, False), (2, False), (10, True), (11, True)])
    assert (r.n_pos, r.n_neg) == (2, 2)
    assert r.auc == 1.0


def test_auc_reversed_separation_zero(spark):
    r = _auc(spark, [(10, False), (11, False), (1, True), (2, True)])
    assert r.auc == 0.0


def test_auc_uninformative_half(spark):
    # all scores tied: midranks make AUC exactly 0.5
    r = _auc(spark, [(5, True), (5, False), (5, True), (5, False)])
    assert r.auc == pytest.approx(0.5, abs=0)


def test_auc_hand_computed_with_ties(spark):
    # scores: neg@1, tie{pos,neg}@2, pos@3
    # ranks: 1; midrank 2.5, 2.5; 4 -> ranksum_pos = 2.5 + 4 = 6.5
    # U = 6.5 - 2*3/2 = 3.5 ; AUC = 3.5/(2*2) = 0.875
    r = _auc(spark, [(1, False), (2, True), (2, False), (3, True)])
    assert r.u2 == 7  # doubled U
    assert r.auc == pytest.approx(0.875, abs=0)
