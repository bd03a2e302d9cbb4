"""Unit tests: Markov entropy rate, overdispersion, decision stump."""

from __future__ import annotations

import datetime as dt
import math

import pytest

import p6__mapreduce_spark.queries as qmod


def _events(spark, rows):
    """rows: (event_id, user_id, day, minute, event_type, value)."""
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, d, 10, m), u, t, float(v))
            for (i, u, d, m, t, v) in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def _with_table(ev, fn, spark):
    orig = qmod.load_table
    qmod.load_table = lambda s, d, n: ev
    try:
        return fn(spark, "x").collect()
    finally:
        qmod.load_table = orig


def test_markov_entropy_deterministic_context_is_zero(spark):
    # context a always goes to b -> H(next|a) = 0
    ev = _events(
        spark,
        [(0, 1, 1, 0, "a", 1), (1, 1, 1, 1, "b", 1), (2, 2, 1, 0, "a", 1), (3, 2, 1, 1, "b", 1)],
    )
    got = {r.prev_type: r for r in _with_table(ev, qmod.q_markov_entropy_rate, spark)}
    assert got["a"].entropy_nats == pytest.approx(0.0, abs=1e-5)
    assert got["a"].n_successors == 1


def test_markov_entropy_uniform_is_ln_k(spark):
    # context a -> {b, c} each once: H = ln 2
    ev = _events(
        spark,
        [(0, 1, 1, 0, "a", 1), (1, 1, 1, 1, "b", 1), (2, 2, 1, 0, "a", 1), (3, 2, 1, 1, "c", 1)],
    )
    got = {r.prev_type: r for r in _with_table(ev, qmod.q_markov_entropy_rate, spark)}
    assert got["a"].entropy_nats == pytest.approx(math.log(2), abs=1e-5)
    assert got["a"].n_transitions == 2


def test_overdispersion_constant_series_is_zero(spark):
    # 2 events/day for 3 days: mean 2, var 0, dispersion 0
    ev = _events(
        spark,
        [(i, 1, d, m, "view", 1) for i, (d, m) in enumerate([(1, 0), (1, 1), (2, 0), (2, 1), (3, 0), (3, 1)])],
    )
    got = {r.event_type: r for r in _with_table(ev, qmod.q_overdispersion_by_type, spark)}
    r = got["view"]
    assert r.n_days == 3 and r.mean_daily == pytest.approx(2.0)
    assert r.var_daily == pytest.approx(0.0) and r.dispersion == pytest.approx(0.0)


def test_overdispersion_known_variance(spark):
    # daily counts 1, 3 -> mean 2, sample var 2, dispersion 1
    ev = _events(spark, [(0, 1, 1, 0, "view", 1), (1, 1, 2, 0, "view", 1), (2, 1, 2, 1, "view", 1), (3, 2, 2, 2, "view", 1)])
    got = {r.event_type: r for r in _with_table(ev, qmod.q_overdispersion_by_type, spark)}
    r = got["view"]
    assert r.var_daily == pytest.approx(2.0)
    assert r.dispersion == pytest.approx(1.0)


def test_overdispersion_single_day_guarded(spark):
    ev = _events(spark, [(0, 1, 1, 0, "view", 1)])
    r = _with_table(ev, qmod.q_overdispersion_by_type, spark)[0]
    assert r.var_daily is None and r.dispersion is None


def test_decision_stump_perfect_split(spark):
    # purchases all below 25, views all >= 50: threshold 25 or 50
    # separates perfectly -> weighted gini 0 there
    ev = _events(
        spark,
        [
            (0, 1, 1, 0, "purchase", 10),
            (1, 1, 1, 1, "purchase", 20),
            (2, 2, 1, 0, "view", 60),
            (3, 2, 1, 1, "view", 70),
        ],
    )
    got = {r.threshold: r for r in _with_table(ev, qmod.q_decision_stump_value, spark)}
    assert got[25.0].weighted_gini == pytest.approx(0.0)
    assert (got[25.0].n_left, got[25.0].n_right) == (2, 2)


def test_decision_stump_useless_split_keeps_base_gini(spark):
    # classes perfectly mixed on both sides: weighted gini = 0.5 everywhere
    ev = _events(
        spark,
        [
            (0, 1, 1, 0, "purchase", 10),
            (1, 1, 1, 1, "view", 12),
            (2, 2, 1, 0, "purchase", 60),
            (3, 2, 1, 1, "view", 61),
        ],
    )
    got = {r.threshold: r for r in _with_table(ev, qmod.q_decision_stump_value, spark)}
    assert got[25.0].weighted_gini == pytest.approx(0.5)


def _orders(spark, day_dollars):
    base = dt.datetime(1995, 1, 6)
    rows = [
        (i, 1, "1-URGENT", float(v), base + dt.timedelta(days=d))
        for i, (d, v) in enumerate(day_dollars)
    ]
    return spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderpriority string, "
        "o_totalprice double, o_orderdate timestamp",
    )


def test_durbin_watson_perfect_line_zero_residuals(spark):
    from p6__mapreduce_spark.operators.timeseries import durbin_watson_daily

    # exact line -> residuals all 0 -> see = 0 -> dw NULL (guarded)
    orders = _orders(spark, [(d, 100000.0 + 100000.0 * d) for d in range(5)])
    r = durbin_watson_daily(orders).collect()[0]
    assert r.n_days == 5 and r.dw is None


def test_durbin_watson_orthogonal_pattern_exact(spark):
    from p6__mapreduce_spark.operators.timeseries import durbin_watson_daily

    # residual pattern (+,-,-,+) per 4-day block is orthogonal to the
    # trend (sum e = 0 AND sum x*e = 0 in each block), so OLS fits the
    # flat mean exactly and e is the pattern itself: over 8 days the
    # diffs are (-2e,0,2e,0,-2e,0,2e) -> dw = 16e^2 / 8e^2 = 2.0
    pat = [1, -1, -1, 1, 1, -1, -1, 1]
    vals = [100000.0 * (2 + p) for p in pat]
    orders = _orders(spark, list(enumerate(vals)))
    r = durbin_watson_daily(orders).collect()[0]
    assert r.dw == pytest.approx(2.0, abs=1e-6)


def test_char_bigram_entropy_repetitive_vs_diverse(spark):
    docs = spark.createDataFrame(
        [(0, "aaaa", "en", "s", 4), (1, "abcd", "en", "s", 4)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r.doc_id: r for r in _with_table(docs, qmod.q_char_bigram_entropy, spark)}
    # 'aaaa' -> bigrams {aa,aa,aa}: entropy 0; 'abcd' -> 3 distinct: ln 3
    assert got[0].n_bigrams == 3 and got[0].entropy_nats == pytest.approx(0.0, abs=1e-5)
    assert got[1].entropy_nats == pytest.approx(math.log(3), abs=1e-5)


def test_xcorr_lag_zero_perfect_correlation(spark):
    # value proportional to count each day -> xcorr at lag 0 == 1
    rows, eid = [], 0
    for d, k in [(1, 1), (2, 2), (3, 3), (4, 4)]:
        for j in range(k):
            rows.append((eid, 1, d, j, "view", 10.0))
            eid += 1
    ev = _events(spark, rows)
    got = {r.lag: r for r in _with_table(ev, qmod.q_xcorr_count_value_daily, spark)}
    assert got[0].xcorr == pytest.approx(1.0, abs=1e-9)
    assert got[0].n_pairs == 4
    # lag windows shrink at the edges
    assert got[3].n_pairs == 1 and got[3].xcorr is None  # single pair: zero variance


def test_wow_change_exact(spark):
    rows = [
        (0, dt.datetime(2024, 1, 1), 100.0),   # week of Jan 1 (Mon)
        (1, dt.datetime(2024, 1, 8), 150.0),   # next week: +50%
    ]
    orders = spark.createDataFrame(
        [(i, 1, "1-URGENT", v, ts) for (i, ts, v) in rows],
        "o_orderkey long, o_custkey long, o_orderpriority string, "
        "o_totalprice double, o_orderdate timestamp",
    )
    got = sorted(
        _with_table(orders, qmod.q_wow_revenue_change, spark), key=lambda r: r.week
    )
    assert got[0].wow_change is None
    assert got[1].wow_change == pytest.approx(0.5)


def test_tukey_fences_hand_computed(spark):
    # type 'a': values 1..8 (cents 100..800) plus one wild 100.00 ->
    # n=9, lower-pick Q1 = ceil(9/4)=3rd value (300), Q3 = ceil(27/4)=7th (700)
    # IQR=400, fences [300-600, 700+600] = [-300, 1300] -> 10000 is the 1 outlier
    rows = [(i, 1, 1, i, "a", float(v)) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 100])]
    ev = _events(spark, rows)
    r = _with_table(ev, qmod.q_tukey_outlier_fences, spark)[0]
    assert (r.n, r.q1_cents, r.q3_cents, r.iqr_cents) == (9, 300, 700, 400)
    assert r.n_outliers == 1


def test_tukey_fences_no_outliers_uniform(spark):
    rows = [(i, 1, 1, i, "a", float(v)) for i, v in enumerate([10, 20, 30, 40])]
    ev = _events(spark, rows)
    r = _with_table(ev, qmod.q_tukey_outlier_fences, spark)[0]
    assert r.n_outliers == 0
