"""Round-8 continuation batch: Good-Turing counts, IRLS logistic
regression, isotonic (PAV) calibration, bipartite link prediction,
Hilbert-curve codes — each checked against an independent pure-Python
model (the house fuzz discipline)."""

import math
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


# --- Hilbert -----------------------------------------------------------------


def test_hilbert_spark_matches_python_model(spark):
    """hilbert_df == the Python reference walk on min-max-scaled
    coordinates, over a random integer point set."""
    from p6__mapreduce_spark.functions.hilbert import SIDE, hilbert_code_py, hilbert_df

    rng = random.Random(7)
    pts = [(i, rng.randint(0, 5000), rng.randint(-300, 900)) for i in range(500)]
    df = spark.createDataFrame(pts, "k long, a long, b long")
    amin = min(p[1] for p in pts)
    aspan = max(1, max(p[1] for p in pts) - amin)
    bmin = min(p[2] for p in pts)
    bspan = max(1, max(p[2] for p in pts) - bmin)

    def scale(v, lo, span):
        return math.floor((v - lo) * float(SIDE - 1) / span)

    expect = {
        k: hilbert_code_py(scale(a, amin, aspan), scale(b, bmin, bspan))
        for k, a, b in pts
    }
    got = {r["k"]: r["hcode"] for r in hilbert_df(df, "k", "a", "b").collect()}
    assert got == expect


def test_hilbert_empty_input_returns_empty_frame(spark):
    """Degenerate input: MIN/MAX are NULL — hilbert_df must return the
    empty (key, hcode) frame the DuckDB oracle produces, not raise a
    driver TypeError (r8 ADVICE)."""
    from p6__mapreduce_spark.functions.hilbert import hilbert_df

    df = spark.createDataFrame([], "k long, a long, b long")
    out = hilbert_df(df, "k", "a", "b")
    assert out.columns == ["k", "hcode"]
    assert [f.dataType.simpleString() for f in out.schema.fields] == ["bigint", "bigint"]
    assert out.count() == 0


def test_hilbert_model_is_a_bijection_with_adjacent_steps():
    """The walk is a true Hilbert curve (the same self-similar
    recurrence at every grid size): bijective on the 32x32 grid with
    every consecutive pair of codes Manhattan-adjacent. The full
    1024^2 proof was run once at development time; 32x32 keeps the
    property in-suite at test cost."""
    from p6__mapreduce_spark.functions.hilbert import hilbert_code_py

    inv = {}
    for x in range(32):
        for y in range(32):
            inv[hilbert_code_py(x, y, levels=5)] = (x, y)
    assert len(inv) == 1024 and sorted(inv) == list(range(1024))
    for d in range(1, 1024):
        (x1, y1), (x2, y2) = inv[d - 1], inv[d]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


# --- Good-Turing -------------------------------------------------------------


def test_good_turing_matches_counter_model(spark):
    from collections import Counter

    from p6__mapreduce_spark.operators.lm import good_turing_unigrams

    texts = [
        "a a a b b c",
        "b c d d",
        "e f g a",
        "h h h h",
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    tok = Counter(w for t in texts for w in t.split())
    foff = Counter(tok.values())
    n_tokens = sum(r * nr for r, nr in foff.items())
    rows = {r["r"]: r for r in good_turing_unigrams(df).collect()}
    assert set(rows) == set(foff)
    for r, nr in foff.items():
        row = rows[r]
        assert row["n_r"] == nr
        nr1 = foff.get(r + 1, 0)
        assert row["n_r1"] == nr1
        assert row["n_tokens"] == n_tokens
        if nr1 > 0:
            assert row["r_star"] == (r + 1) * nr1 * 1.0 / nr
            assert row["p_star"] == (r + 1) * nr1 * 1.0 / nr / n_tokens
        else:
            assert row["r_star"] is None and row["p_star"] is None
        assert row["raw_mass"] == r * nr * 1.0 / n_tokens
    # the r=1 row's raw mass is the unseen-probability estimate
    assert rows[1]["raw_mass"] == foff[1] / n_tokens


# --- Isotonic / PAV ----------------------------------------------------------


def _pav_sequential(bins):
    """Classic pool-adjacent-violators sweep on [(n, s)] ordered bins —
    the independent model for the minimax closed form."""
    blocks = [[n, s] for n, s in bins]  # [weight, sum]
    out_blocks = []
    for b in blocks:
        out_blocks.append(b)
        while len(out_blocks) >= 2:
            n2, s2 = out_blocks[-1]
            n1, s1 = out_blocks[-2]
            if s1 * n2 >= s2 * n1:  # mean1 >= mean2 -> violation, pool
                out_blocks[-2:] = [[n1 + n2, s1 + s2]]
            else:
                break
    fit = []
    for n, s in out_blocks:
        fit.extend([s / n] * 1)
    # expand back to per-input-bin values
    vals, i = [], 0
    for n, s in out_blocks:
        # count how many original bins this block covers by weight
        w = 0
        while w < n:
            w += bins[i][0]
            vals.append(s / n)
            i += 1
    return vals


def test_minimax_equals_sequential_pav_fuzz():
    """The max-min closed form equals the sequential PAV sweep on
    random weighted bin tables (200 trials)."""
    rng = random.Random(42)
    for _ in range(200):
        nb = rng.randint(1, 12)
        bins = [(rng.randint(1, 20), 0) for _ in range(nb)]
        bins = [(n, rng.randint(0, n)) for n, _ in bins]
        # minimax: iso_i = max_{j<=i} min_{k>=i} pooled mean j..k
        iso = []
        for i in range(nb):
            best = -1.0
            for j in range(i + 1):
                worst = None
                for k in range(i, nb):
                    n = sum(b[0] for b in bins[j : k + 1])
                    s = sum(b[1] for b in bins[j : k + 1])
                    m = s / n
                    worst = m if worst is None or m < worst else worst
                best = worst if worst > best else best
            iso.append(best)
        seq = _pav_sequential(bins)
        assert all(abs(a - b) < 1e-12 for a, b in zip(iso, seq)), (bins, iso, seq)


def test_isotonic_calibration_monotone_and_pooled(spark):
    """End-to-end on constructed events: the fit is non-decreasing,
    agrees with the sequential PAV model, and preserves total mass."""
    from p6__mapreduce_spark.operators.causal import isotonic_calibration

    rng = random.Random(3)
    rows, eid = [], 0
    # users u with clicks c on one day each; purchase prob decreasing
    # then increasing in c -> guaranteed pooling work for PAV
    for u in range(400):
        c = rng.randint(0, 5)
        day = f"2024-02-{(u % 9) + 1:02d}"
        for i in range(c):
            rows.append((eid, f"{day} 10:{i:02d}:00", u, "click", 1.0))
            eid += 1
        p = [0.7, 0.3, 0.45, 0.35, 0.6, 0.8][c]
        if rng.random() < p:
            rows.append((eid, f"{day} 11:00:00", u, "purchase", 5.0))
            eid += 1
        else:
            rows.append((eid, f"{day} 11:00:00", u, "view", 0.0))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    )
    got = sorted(
        (r["b"], r["n_users"], r["n_purchasers"], r["iso_rate"])
        for r in isotonic_calibration(df).collect()
    )
    fits = [g[3] for g in got]
    assert fits == sorted(fits)  # monotone
    model = _pav_sequential([(g[1], g[2]) for g in got])
    assert all(abs(a - b) < 1e-12 for a, b in zip(fits, model))


# --- Link prediction ---------------------------------------------------------


def test_link_prediction_handcrafted_graph(spark):
    from p6__mapreduce_spark.operators.graph import RA_SCALE, part_link_prediction

    # orders: 10->{1,2,3}, 20->{1,2}, 30->{2,3}, 40->{1,2}
    rows = []
    for o, parts in [(10, [1, 2, 3]), (20, [1, 2]), (30, [2, 3]), (40, [1, 2])]:
        for p in parts:
            # duplicate lineitem rows must not double-count (DISTINCT)
            rows.append((o, p, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "1995-01-01"))
            rows.append((o, p, 2, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "1995-01-01"))
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string, l_shipdate string",
    )
    got = {
        (r["p1"], r["p2"]): r
        for r in part_link_prediction(df, min_common=1, k=10).collect()
    }
    # degrees: part1 in {10,20,40}=3, part2 in all 4, part3 in {10,30}=2
    r12 = got[(1, 2)]
    assert r12["cn"] == 3 and r12["deg1"] == 3 and r12["deg2"] == 4
    assert r12["jaccard"] == 3.0 / (3 + 4 - 3)
    exp_ra = (
        round(RA_SCALE / 3.0)  # order 10, |parts| = 3
        + round(RA_SCALE / 2.0)  # order 20
        + round(RA_SCALE / 2.0)  # order 40
    )
    assert r12["ra_x1e12"] == exp_ra
    r23 = got[(2, 3)]
    assert r23["cn"] == 2 and r23["ra_x1e12"] == round(RA_SCALE / 3.0) + round(
        RA_SCALE / 2.0
    )
    r13 = got[(1, 3)]
    assert r13["cn"] == 1 and r13["ra_x1e12"] == round(RA_SCALE / 3.0)
    # ordering: by ra desc -> (1,2) first
    assert list(got)[0] == (1, 2)


# --- Logistic regression -----------------------------------------------------


def _logreg_python_model(feats, rounds):
    """Bit-faithful Python replica of the shared expression text:
    same op order, same quantizations."""
    BQ, CQ, R = 1.0e9, 1.0e6, 1.0e-2

    def fq(e):
        return math.floor(e * CQ + 0.5)

    bq = (0, 0, 0)
    for _ in range(rounds):
        b0, b1, b2 = (float(b) / BQ for b in bq)
        m = dict(m00=0, m01=0, m02=0, m11=0, m12=0, m22=0, g0s=0, g1s=0, g2s=0)
        for x1, x2, y in feats:
            z = max(min(b0 + b1 * x1 + b2 * x2, 16.0), -16.0)
            t = 1.0 + z / 1024.0
            for _i in range(10):
                t = t * t
            p = t / (1.0 + t)
            w = p * (1.0 - p)
            m["m00"] += fq(w)
            m["m01"] += fq(w * x1)
            m["m02"] += fq(w * x2)
            m["m11"] += fq(w * x1 * x1)
            m["m12"] += fq(w * x1 * x2)
            m["m22"] += fq(w * x2 * x2)
            m["g0s"] += fq(float(y) - p)
            m["g1s"] += fq((float(y) - p) * x1)
            m["g2s"] += fq((float(y) - p) * x2)
        a00 = float(m["m00"]) / CQ + R
        a01 = float(m["m01"]) / CQ
        a02 = float(m["m02"]) / CQ
        a11 = float(m["m11"]) / CQ + R
        a12 = float(m["m12"]) / CQ
        a22 = float(m["m22"]) / CQ + R
        g0 = float(m["g0s"]) / CQ - R * b0
        g1 = float(m["g1s"]) / CQ - R * b1
        g2 = float(m["g2s"]) / CQ - R * b2
        k00 = a11 * a22 - a12 * a12
        k01 = a01 * a22 - a12 * a02
        k02 = a01 * a12 - a11 * a02
        k11 = a00 * a22 - a02 * a02
        k12 = a00 * a12 - a01 * a02
        k22 = a00 * a11 - a01 * a01
        det = a00 * k00 - a01 * k01 + a02 * k02
        d0 = (k00 * g0 - k01 * g1 + k02 * g2) / det
        d1 = ((-k01) * g0 + k11 * g1 - k12 * g2) / det
        d2 = (k02 * g0 - k12 * g1 + k22 * g2) / det
        bq = (
            math.floor((b0 + d0) * BQ + 0.5),
            math.floor((b1 + d1) * BQ + 0.5),
            math.floor((b2 + d2) * BQ + 0.5),
        )
    return bq


def _mk_events(rows, spark):
    return spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    )


def test_logreg_matches_python_model_exactly(spark):
    """Spark betas == the Python replica's, to the exact 1e-9 integer —
    the shared-expression-text guarantee, checked end to end."""
    from p6__mapreduce_spark.operators.logreg import ROUNDS, logreg_quality_irls

    rng = random.Random(11)
    rows, eid, feats = [], 0, []
    for u in range(300):
        n_act = rng.randint(1, 8)
        clicks = rng.randint(0, n_act)
        day = "2024-03-05"
        for i in range(clicks):
            rows.append((eid, f"{day} 09:{i:02d}:00", u, "click", 1.0))
            eid += 1
        for i in range(n_act - clicks):
            rows.append((eid, f"{day} 10:{i:02d}:00", u, "view", 1.0))
            eid += 1
        buy = rng.random() < min(0.9, 0.1 * n_act)
        if buy:
            rows.append((eid, f"{day} 11:00:00", u, "purchase", 9.0))
            eid += 1
        feats.append((n_act / 10.0, clicks / 10.0, 1 if buy else 0))
    got = logreg_quality_irls(_mk_events(rows, spark)).collect()[0]
    bq = _logreg_python_model(feats, ROUNDS)
    assert got["beta0"] == float(bq[0]) / 1.0e9
    assert got["beta1"] == float(bq[1]) / 1.0e9
    assert got["beta2"] == float(bq[2]) / 1.0e9
    assert got["n_rows"] == 300


def test_logreg_learns_a_planted_signal(spark):
    """Strongly separable synthetic data: high activity -> purchase.
    The fit must beat the base rate clearly and weight activity
    positively."""
    from p6__mapreduce_spark.operators.logreg import logreg_quality_irls

    rng = random.Random(5)
    rows, eid = [], 0
    for u in range(400):
        n_act = rng.randint(1, 10)
        day = f"2024-04-{(u % 7) + 1:02d}"
        for i in range(n_act):
            rows.append((eid, f"{day} 09:{i:02d}:00", u, "view", 1.0))
            eid += 1
        if n_act >= 6:
            rows.append((eid, f"{day} 11:00:00", u, "purchase", 9.0))
            eid += 1
    got = logreg_quality_irls(_mk_events(rows, spark)).collect()[0]
    assert got["beta1"] > 1.0  # activity weight clearly positive
    assert got["accuracy"] > 0.9  # separable up to the 0.55/0.65 boundary bin


def test_hilbert_locality_beats_morton():
    """The design claim, quantified: over all consecutive code pairs
    on a 32x32 grid, Hilbert's mean Manhattan step is exactly 1.0
    (every step adjacent); Morton's Z-seam jumps make its mean step
    strictly larger — why the Hilbert layout tightens per-file min/max
    ranges at the same file count."""
    from p6__mapreduce_spark.functions.hilbert import hilbert_code_py
    from p6__mapreduce_spark.functions.zorder import _SPREAD_STEPS  # noqa: F401

    def morton(x, y):
        def spread(v):
            v &= 0xFFFF
            for shift, mask in _SPREAD_STEPS:
                v = (v | (v << shift)) & mask
            return v

        return (spread(x) << 1) + spread(y)

    def mean_step(code_fn):
        inv = {}
        for x in range(32):
            for y in range(32):
                inv[code_fn(x, y)] = (x, y)
        codes = sorted(inv)
        steps = [
            abs(inv[a][0] - inv[b][0]) + abs(inv[a][1] - inv[b][1])
            for a, b in zip(codes, codes[1:])
        ]
        return sum(steps) / len(steps)

    h = mean_step(lambda x, y: hilbert_code_py(x, y, levels=5))
    m = mean_step(morton)
    assert h == 1.0
    assert m > 1.3  # Z-order's measured mean step on this grid is ~1.67
