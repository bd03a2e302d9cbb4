"""Round-8 continuation batch, part 2: ALS factorization, log-rank
test, positional phrase search — each against an independent Python
model."""

import math
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


# --- ALS --------------------------------------------------------------------


def _als_python_model(ratings, sweeps):
    """Bit-faithful replica of the shared stage text: per-entity 2x2
    ridge solves on fq6-quantized integer moments."""
    FQ, LAM = 1.0e6, 1.0e-1

    def fq(e):
        return math.floor(e * FQ + 0.5)

    items = sorted({i for _, i, _ in ratings})
    q = {i: (1000000, (i % 201 - 100) * 10000) for i in items}
    p = {}

    def half(solve_for_user):
        moments = {}
        for u, i, r in ratings:
            key, (qq1, qq2) = (u, q[i]) if solve_for_user else (i, p[u])
            f1, f2 = float(qq1) / FQ, float(qq2) / FQ
            m = moments.setdefault(key, [0, 0, 0, 0, 0])
            m[0] += fq(f1 * f1)
            m[1] += fq(f1 * f2)
            m[2] += fq(f2 * f2)
            m[3] += fq(float(r) * f1)
            m[4] += fq(float(r) * f2)
        out = {}
        for key, (m11, m12, m22, b1s, b2s) in moments.items():
            a11 = float(m11) / FQ + LAM
            a12 = float(m12) / FQ
            a22 = float(m22) / FQ + LAM
            bb1 = float(b1s) / FQ
            bb2 = float(b2s) / FQ
            det = a11 * a22 - a12 * a12
            n1 = (a22 * bb1 - a12 * bb2) / det
            n2 = (a11 * bb2 - a12 * bb1) / det
            out[key] = (fq(n1), fq(n2))
        return out

    for _ in range(sweeps):
        p = half(True)
        q = half(False)
    return p, q


def _mk_orders_lineitem(spark, ratings):
    """Build orders/lineitem frames whose (custkey, partkey) join
    counts reproduce ``ratings`` exactly (one order per rating unit)."""
    orows, lrows, ok = [], [], 0
    for u, i, r in ratings:
        for _ in range(r):
            ok += 1
            orows.append((ok, u, "O", 1.0, "1995-01-01", "1-URGENT"))
            lrows.append((ok, i, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "1995-01-02"))
    o = spark.createDataFrame(
        orows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    )
    li = spark.createDataFrame(
        lrows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string, l_shipdate string",
    )
    return o, li


def test_als_matches_python_model_exactly(spark):
    from p6__mapreduce_spark.similarity.als import SWEEPS, als_factorization

    rng = random.Random(13)
    ratings = []
    for u in range(12):
        for i in rng.sample(range(1, 30), 6):
            ratings.append((u, i, rng.randint(1, 4)))
    # NOTE: the engine counts one rating unit per (order, part) pair,
    # so each rating r becomes r orders -> ratings table value r
    o, li = _mk_orders_lineitem(spark, ratings)
    got = {r["i"]: r for r in als_factorization(o, li).collect()}
    _, q = _als_python_model(ratings, SWEEPS)
    top = sorted(q)[:20]
    assert sorted(got) == top
    for i in top:
        assert (got[i]["qq1"], got[i]["qq2"]) == q[i], i
    row = next(iter(got.values()))
    assert row["n_ratings"] == len(ratings)


def test_als_reduces_error_vs_init(spark):
    """The fitted factors must beat the deterministic init on SSE —
    ALS monotonically improves the objective."""
    from p6__mapreduce_spark.similarity.als import als_factorization

    rng = random.Random(29)
    # planted rank-1 structure: r = au * bi rounded
    a = {u: rng.randint(1, 3) for u in range(15)}
    b = {i: rng.randint(1, 3) for i in range(1, 25)}
    ratings = [(u, i, a[u] * b[i]) for u in a for i in rng.sample(sorted(b), 8)]
    o, li = _mk_orders_lineitem(spark, ratings)
    row = als_factorization(o, li).collect()[0]
    # init: q = (1, ~[-1,1]) -> predicting ~1 for every rating;
    # planted ratings reach 9 -> init SSE per rating >> fitted
    init_sse = sum((r - 1.0) ** 2 for _, _, r in ratings)
    assert row["sse_q6"] / 1.0e6 < 0.5 * init_sse
    assert row["rmse"] < 1.5


# --- Log-rank ---------------------------------------------------------------


def _logrank_python_model(durations):
    """(o1, d_tot, e1_q9, v_q9) from (t, converted, g) tuples — the
    textbook definition, independently coded."""
    import collections

    def fq9(x):
        return math.floor(x * 1.0e9 + 0.5)

    times = sorted({t for t, _, _ in durations})
    o1 = d_tot = e1_q9 = v_q9 = 0
    for t in times:
        n_t = sum(1 for tt, _, _ in durations if tt >= t)
        n1 = sum(1 for tt, _, g in durations if tt >= t and g == 1)
        d_t = sum(1 for tt, c, _ in durations if tt == t and c == 1)
        d1 = sum(1 for tt, c, g in durations if tt == t and c == 1 and g == 1)
        if d_t > 0 and n_t > 1:
            o1 += d1
            d_tot += d_t
            e1_q9 += fq9(float(d_t) * float(n1) / float(n_t))
            v_q9 += fq9(
                float(d_t)
                * (float(n1) / float(n_t))
                * (1.0 - float(n1) / float(n_t))
                * ((float(n_t) - float(d_t)) / (float(n_t) - 1.0))
            )
    return o1, d_tot, e1_q9, v_q9


def test_logrank_matches_python_model(spark):
    """Constructed cohort where group membership is forced through the
    value-mean split; engine sums == the textbook per-time model."""
    from p6__mapreduce_spark.operators.causal import logrank_test_conversion

    rng = random.Random(17)
    rows, eid, durations = [], 0, []
    for u in range(120):
        high = u % 2 == 0
        # high-value users: one big-value event; convert faster
        t_conv = rng.randint(1, 4) if high else rng.randint(8, 14)
        converted = rng.random() < 0.8
        rows.append((eid, "2024-01-01 08:00:00", u, "view", 900.0 if high else 1.0))
        eid += 1
        if converted:
            day = 1 + t_conv
            rows.append((eid, f"2024-01-{day:02d} 08:00:00", u, "purchase", 1.0))
            eid += 1
            t = t_conv
        else:
            t = 31  # censored at 2024-02-01
        durations.append((t, 1 if converted else 0, 1 if high else 0))
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    )
    got = logrank_test_conversion(df).collect()[0]
    o1, d_tot, e1_q9, v_q9 = _logrank_python_model(durations)
    assert got["o1"] == o1
    assert got["d_tot"] == d_tot
    assert got["e1_q9"] == e1_q9
    assert got["v_q9"] == v_q9
    assert got["n_users_g1"] == 60 and got["n_users_g0"] == 60
    # the planted effect: high-value users convert faster -> hr > 1
    assert got["hazard_ratio"] > 1.0 and got["chi2"] > 3.84  # p < 0.05


def test_logrank_degenerate_single_group_yields_nulls(spark):
    """All users in one group: chi2/hazard_ratio must be NULL (not a
    Spark ANSI divide-by-zero)."""
    from p6__mapreduce_spark.operators.causal import logrank_test_conversion

    rows = []
    for u in range(5):
        rows.append((u * 2, "2024-01-01 08:00:00", u, "view", 1.0))
        rows.append((u * 2 + 1, "2024-01-03 08:00:00", u, "purchase", 1.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    )
    got = logrank_test_conversion(df).collect()[0]
    assert got["chi2"] is None and got["hazard_ratio"] is None


# --- Phrase search ----------------------------------------------------------


def test_phrase_search_overlapping_and_counts(spark):
    from p6__mapreduce_spark.operators.ranking import phrase_search

    docs = [
        (1, "x a b a b a y", 2),  # overlapping "a b a": pos 2 and 4
        (2, "a b a", 1),
        (3, "a b c a b a", 1),  # one occurrence at pos 4
        (4, "b a b", 0),
        (5, "a c a b b a", 0),
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t, _ in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        r["doc_id"]: (r["n_occurrences"], r["first_pos"])
        for r in phrase_search(df, ("a", "b", "a")).collect()
    }
    assert got == {1: (2, 2), 2: (1, 1), 3: (1, 4)}
