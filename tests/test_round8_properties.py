"""Property tests for the round-8 operators: random inputs fuzzed
against direct Python models (the test_properties.py discipline).
Hypothesis drives the input space; each property uses a single Spark
action over a small generated frame."""

import math
import os
import sys
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _py_poly(s: str, base=31, mod=2147483647) -> int:
    h = 0
    for ch in s:
        h = (h * base + ord(ch)) % mod
    return h


def _py_winnow(text: str, k: int, window: int):
    text = text.strip()
    n = len(text) - k + 1
    hashes = [_py_poly(text[i : i + k]) for i in range(max(n, 0))]
    return {min(hashes[i : i + window]) for i in range(0, n - window + 1)}


@settings(**_SETTINGS)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=0,
            max_size=120,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_winnow_doubling_matches_model_on_random_text(spark, texts):
    """Random printable-ASCII docs: the hash-doubling + sparse-table
    winnow must equal the direct per-substring fold model exactly
    (k=16 doubling fast path, window=8)."""
    from p6__mapreduce_spark.operators.text_analysis import winnow_fingerprints

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got: dict[int, set] = {}
    for r in winnow_fingerprints(docs).collect():
        got.setdefault(r.doc_id, set()).add(r.fp)
    for i, t in enumerate(texts):
        assert got.get(i, set()) == _py_winnow(t, 16, 8), (i, t)


@settings(**_SETTINGS)
@given(
    groups=st.lists(
        st.tuples(
            st.sampled_from(["ga", "gb", "gc"]),
            st.integers(min_value=0, max_value=120),
        ),
        min_size=2,
        max_size=60,
    )
)
def test_kmv_small_group_overlaps_are_exact_set_intersections(spark, groups):
    """While every group holds < K distinct users the KMV sketch IS
    the set: n_inter_sketch and est_overlap must equal the exact
    intersection for every ordered pair."""
    from p6__mapreduce_spark.operators.kmv import kmv_audience_overlap

    rows = [
        (i, "2024-01-01 00:00:01", u, g, 1.0) for i, (g, u) in enumerate(groups)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    )
    sets: dict[str, set] = {}
    for g, u in groups:
        sets.setdefault(g, set()).add(u)
    got = {(r.type_a, r.type_b): r for r in kmv_audience_overlap(df).collect()}
    names = sorted(sets)
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            a, b = names[i], names[j]
            want = len(sets[a] & sets[b])
            r = got[(a, b)]
            assert r.exact_overlap == want
            assert r.n_inter_sketch == want  # sketch == set below K
            assert r.est_overlap == float(want)


def _py_w1(xs, ys):
    """Exact W1 over integer samples via the ECDF-gap model."""
    vals = sorted(set(xs) | set(ys))
    n1, n2 = len(xs), len(ys)
    cx = cy = 0
    num = 0
    for v, v_next in zip(vals, vals[1:]):
        cx += sum(1 for x in xs if x == v)
        cy += sum(1 for y in ys if y == v)
        num += abs(cx * n2 - cy * n1) * (v_next - v)
    return num, num / (n1 * n2)


@settings(**_SETTINGS)
@given(
    xs=st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=40),
    ys=st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=40),
)
def test_wasserstein1_matches_model_on_random_samples(spark, xs, ys):
    from pyspark.sql import functions as F

    from p6__mapreduce_spark.operators.evaluate import wasserstein1

    rows = [("a", v) for v in xs] + [("b", v) for v in ys]
    df = spark.createDataFrame(rows, "g string, v long")
    r = wasserstein1(df, F.col("v"), F.col("g") == "a", F.col("g") == "b").collect()[0]
    num, w1 = _py_w1(xs, ys)
    assert (r.n1, r.n2, r.w1_num) == (len(xs), len(ys), num)
    assert math.isclose(r.w1, w1, rel_tol=0, abs_tol=1e-12)


@settings(**_SETTINGS)
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=12),  # events per user
            st.integers(min_value=1, max_value=500),  # cents per event
        ),
        min_size=2,
        max_size=25,
    )
)
def test_spearman_properties_random_users(spark, pairs):
    """Spearman bounds and the tie-correct midrank formula, checked
    against a direct Python midrank Pearson."""
    from pyspark.sql import functions as F

    from p6__mapreduce_spark.operators.rankcorr import spearman_user_activity_value

    rows = []
    eid = 0
    for uid, (n_ev, cents) in enumerate(pairs):
        for _ in range(n_ev):
            eid += 1
            rows.append((eid, "2024-01-01 00:00:01", uid, "click", cents / 100.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    r = spearman_user_activity_value(df).collect()[0]
    xs = [n for n, _ in pairs]
    ys = [n * c for n, c in pairs]

    def midranks(vs):
        c = Counter(vs)
        out = {}
        below = 0
        for v in sorted(c):
            out[v] = below + (c[v] + 1) / 2
            below += c[v]
        return [out[v] for v in vs]

    def pearson(a, b):
        n = len(a)
        sa, sb = sum(a), sum(b)
        num = n * sum(x * y for x, y in zip(a, b)) - sa * sb
        da = n * sum(x * x for x in a) - sa * sa
        db = n * sum(y * y for y in b) - sb * sb
        if da <= 0 or db <= 0:
            return None
        return num / math.sqrt(da * db)

    want = pearson(midranks(xs), midranks(ys))
    if want is None:
        assert r.rho_spearman is None
    else:
        assert r.rho_spearman is not None
        assert math.isclose(r.rho_spearman, want, rel_tol=1e-9, abs_tol=1e-9)
        assert -1.0 - 1e-9 <= r.rho_spearman <= 1.0 + 1e-9


def test_markov_removal_effects_bounded_on_corpus(spark):
    """Structural invariants on real data: base/removed probabilities
    in [0, 1e6], removal effect in [0, 1e6] (removing a channel can
    only reduce absorption into CONV — transitions are redirected to
    NULL, never created), one row per channel."""
    from p6__mapreduce_spark.operators.attribution_markov import (
        markov_removal_attribution,
    )
    from p6__mapreduce_spark.sources.readers import load_table

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    rows = markov_removal_attribution(ev).collect()
    assert [r.channel for r in rows] == ["click", "error", "signup", "view"]
    for r in rows:
        assert 0 <= r.base_conv_q6 <= 1_000_000
        assert 0 <= r.removed_conv_q6 <= r.base_conv_q6
        assert 0 <= r.removal_effect_q6 <= 1_000_000
