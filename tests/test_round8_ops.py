"""Round-8 operator batch: int8 quantization audit, skip-gram PMI,
Spearman rank correlation, Markov removal-effect attribution.
Hand-computed models on tiny inputs; the cross-engine exactness is
covered by the oracle gate."""

import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_int8_quant_audit_hand_computed(spark):
    from p6__mapreduce_spark.similarity.quantize import int8_quant_audit

    # dim1: values 1.0, -0.5, 0.25 -> q = 1e6, -5e5, 2.5e5; s = 1e6
    #   codes = 127, -64 (round half away: 63.5 -> 64), 32 (31.75 -> 32)
    # dim2: all zeros -> s = 0, codes 0, errors 0
    rows = [
        (1, [1.0, 0.0]),
        (2, [-0.5, 0.0]),
        (3, [0.25, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.dim: r for r in int8_quant_audit(df).collect()}
    d1 = out[1]
    assert d1.s_q == 1_000_000 and d1.n_vecs == 3 and d1.n_sat == 1
    # errors in 127*q units: |127*(-5e5) - (-64)*1e6| = 500000,
    # |127*2.5e5 - 32*1e6| = 250000, exact dim max
    assert d1.max_err == 500_000
    assert d1.sse_err == 500_000**2 + 250_000**2
    d2 = out[2]
    assert d2.s_q == 0 and d2.n_sat == 0 and d2.max_err == 0 and d2.sse_err == 0


def test_skipgram_pmi_matches_python_model(spark):
    from p6__mapreduce_spark.operators.collocations import skipgram_pmi

    texts = [
        "alpha beta gamma alpha beta",
        "alpha gamma beta delta",
        "beta beta alpha",
    ]
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 "doc_id long, text string")
    got = {(r.w1, r.w2): (r.c_xy, r.c1, r.c2, r.lift_q6)
           for r in skipgram_pmi(docs, window=2, min_count=1, top_k=100).collect()}
    # python model: ordered pairs within distance 2
    from collections import Counter
    pair_c, uni_c = Counter(), Counter()
    for t in texts:
        w = t.split()
        uni_c.update(w)
        for i in range(len(w)):
            for d in (1, 2):
                if i + d < len(w):
                    pair_c[(w[i], w[i + d])] += 1
    n = sum(uni_c.values())
    assert set(got) == set(pair_c)
    for (w1, w2), cxy in pair_c.items():
        c1, c2 = uni_c[w1], uni_c[w2]
        lift = math.floor(cxy * 1.0 * n / c1 / c2 * 1e6)
        assert got[(w1, w2)] == (cxy, c1, c2, lift), (w1, w2)


def test_spearman_perfect_monotone_and_ties(spark):
    from p6__mapreduce_spark.operators.rankcorr import spearman_user_activity_value

    # users: event counts 1,2,3 with values that are a NONLINEAR but
    # strictly monotone function of count -> spearman 1, pearson < 1
    rows = []
    eid = 0
    for uid, (n_ev, per_val) in enumerate([(1, 1.0), (2, 10.0), (3, 100.0)]):
        for _ in range(n_ev):
            eid += 1
            rows.append((eid, f"2024-01-0{uid+1} 00:00:0{eid % 10}", uid, "click", per_val))
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", __import__("pyspark.sql.functions", fromlist=["F"]).to_timestamp("ts"))
    r = spearman_user_activity_value(df).collect()[0]
    assert r.n_users == 3
    assert abs(r.rho_spearman - 1.0) < 1e-12
    assert r.rho_pearson < 0.999


def test_spearman_all_tied_returns_null(spark):
    from p6__mapreduce_spark.operators.rankcorr import spearman_user_activity_value

    rows = [(i, "2024-01-01 00:00:01", i, "click", 5.0) for i in range(4)]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", __import__("pyspark.sql.functions", fromlist=["F"]).to_timestamp("ts"))
    r = spearman_user_activity_value(df).collect()[0]
    # every user has x=1, y=500 -> zero variance -> guarded NULL
    assert r.rho_spearman is None and r.rho_pearson is None


def test_markov_removal_single_path_chain(spark):
    from p6__mapreduce_spark.operators.attribution_markov import (
        markov_removal_attribution,
    )

    # one user: view -> click -> purchase. Episode edges:
    # START->view, view->click, click->CONV. All probabilities 1.
    # base p(START) = 1e6; removing view or click severs the only
    # path -> removed 0, effect 1e6. error/signup never appear ->
    # their removal changes nothing (effect 0).
    rows = [
        (1, "2024-01-01 00:00:01", 7, "view", 0.0),
        (2, "2024-01-01 00:00:02", 7, "click", 0.0),
        (3, "2024-01-01 00:00:03", 7, "purchase", 9.9),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", __import__("pyspark.sql.functions", fromlist=["F"]).to_timestamp("ts"))
    got = {r.channel: r for r in markov_removal_attribution(df).collect()}
    assert set(got) == {"click", "error", "signup", "view"}
    assert got["view"].base_conv_q6 == 1_000_000
    assert got["view"].removed_conv_q6 == 0
    assert got["view"].removal_effect_q6 == 1_000_000
    assert got["click"].removed_conv_q6 == 0
    assert got["error"].removed_conv_q6 == 1_000_000
    assert got["error"].removal_effect_q6 == 0
    assert got["signup"].removal_effect_q6 == 0


def test_markov_removal_fifty_fifty_split(spark):
    from p6__mapreduce_spark.operators.attribution_markov import (
        markov_removal_attribution,
    )

    # two users: (view -> purchase) and (click -> END). base chain:
    # START->view 1/2, START->click 1/2, view->CONV 1, click->NULL 1.
    # base p = 0.5. removing view -> p 0 (effect 1e6); removing click
    # -> START->click mass goes to NULL, p stays 0.5 (effect 0).
    rows = [
        (1, "2024-01-01 00:00:01", 1, "view", 0.0),
        (2, "2024-01-01 00:00:02", 1, "purchase", 5.0),
        (3, "2024-01-01 00:00:01", 2, "click", 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", __import__("pyspark.sql.functions", fromlist=["F"]).to_timestamp("ts"))
    got = {r.channel: r for r in markov_removal_attribution(df).collect()}
    assert got["view"].base_conv_q6 == 500_000
    assert got["view"].removed_conv_q6 == 0
    assert got["view"].removal_effect_q6 == 1_000_000
    assert got["click"].removed_conv_q6 == 500_000
    assert got["click"].removal_effect_q6 == 0
