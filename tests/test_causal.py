"""Causal/experimentation unit tests: IPW stratified uplift, CUPED
theta and lift, calibration bins — hand-computed corpora."""

from __future__ import annotations

import datetime as dt

import pytest


def _orders(spark, rows):
    """rows: (orderkey, custkey, priority, price)."""
    data = [(k, c, p, float(v), dt.datetime(1995, 1, 1)) for (k, c, p, v) in rows]
    return spark.createDataFrame(
        data,
        "o_orderkey long, o_custkey long, o_orderpriority string, "
        "o_totalprice double, o_orderdate timestamp",
    )


def _customer(spark, rows):
    """rows: (custkey, segment)."""
    return spark.createDataFrame(
        [(c, f"Customer#{c}", 0, 0.0, s) for (c, s) in rows],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    )


def test_ipw_uplift_per_stratum_diff_in_means(spark):
    from p6__mapreduce_spark.operators.causal import ipw_uplift_by_segment

    # segment A: treated {100, 200}, control {50}; segment B: treated {10}, control {20, 40}
    orders = _orders(
        spark,
        [
            (1, 1, "1-URGENT", 100),
            (2, 1, "2-HIGH", 200),
            (3, 2, "5-LOW", 50),
            (4, 3, "1-URGENT", 10),
            (5, 4, "3-MEDIUM", 20),
            (6, 4, "4-NOT SPECIFIED", 40),
        ],
    )
    cust = _customer(spark, [(1, "A"), (2, "A"), (3, "B"), (4, "B")])
    got = {r.segment: r for r in ipw_uplift_by_segment(orders, cust).collect()}
    a, b = got["A"], got["B"]
    assert (a.n, a.n_treated) == (3, 2)
    assert a.propensity == pytest.approx(2 / 3)
    assert a.uplift == pytest.approx(150.0 - 50.0)
    assert b.uplift == pytest.approx(10.0 - 30.0)


def test_ipw_degenerate_stratum_is_null_not_nan(spark):
    from p6__mapreduce_spark.operators.causal import ipw_uplift_by_segment

    # all-treated stratum: mean_control and uplift must be NULL
    orders = _orders(spark, [(1, 1, "1-URGENT", 100), (2, 1, "2-HIGH", 60)])
    cust = _customer(spark, [(1, "A")])
    row = ipw_uplift_by_segment(orders, cust).collect()[0]
    assert row.mean_treated == pytest.approx(80.0)
    assert row.mean_control is None and row.uplift is None


def _events(spark, rows):
    """rows: (event_id, user_id, day, value) — day in Jan 2024."""
    data = [
        (i, dt.datetime(2024, 1, d), u, "view", float(v)) for (i, u, d, v) in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_cuped_perfectly_correlated_covariate_kills_variance(spark):
    from p6__mapreduce_spark.operators.causal import cuped_adjusted_lift

    # y = x per user and equal arm means of x -> theta = 1 and the
    # adjusted lift equals the raw lift shifted by theta*(x-arm diff):
    # arms have identical x distributions, so lift_cuped == lift_raw
    rows = [
        (0, 1, 5, 10.0), (1, 1, 20, 10.0),   # u1 (treat): x=10, y=10
        (2, 3, 5, 30.0), (3, 3, 20, 30.0),   # u3 (treat): x=30, y=30
        (4, 2, 5, 10.0), (5, 2, 20, 10.0),   # u2 (ctrl):  x=10, y=10
        (6, 4, 5, 30.0), (7, 4, 20, 30.0),   # u4 (ctrl):  x=30, y=30
    ]
    row = cuped_adjusted_lift(_events(spark, rows)).collect()[0]
    assert (row.n, row.n_t) == (4, 2)
    assert row.theta == pytest.approx(1.0)
    assert row.lift_raw == pytest.approx(0.0)
    assert row.lift_cuped == pytest.approx(0.0)


def test_cuped_corrects_covariate_imbalance(spark):
    from p6__mapreduce_spark.operators.causal import cuped_adjusted_lift

    # y = x exactly (no treatment effect), but treated users start
    # richer: raw lift shows a spurious +20, CUPED removes it fully
    rows = [
        (0, 1, 5, 30.0), (1, 1, 20, 30.0),   # treat: x=30,y=30
        (2, 3, 5, 40.0), (3, 3, 20, 40.0),   # treat: x=40,y=40
        (4, 2, 5, 10.0), (5, 2, 20, 10.0),   # ctrl:  x=10,y=10
        (6, 4, 5, 20.0), (7, 4, 20, 20.0),   # ctrl:  x=20,y=20
    ]
    row = cuped_adjusted_lift(_events(spark, rows)).collect()[0]
    assert row.lift_raw == pytest.approx(20.0)
    assert row.theta == pytest.approx(1.0)
    assert row.lift_cuped == pytest.approx(0.0)


def test_cuped_zero_variance_covariate_is_null(spark):
    from p6__mapreduce_spark.operators.causal import cuped_adjusted_lift

    rows = [(0, 1, 5, 10.0), (1, 2, 5, 10.0)]  # identical x, no post
    row = cuped_adjusted_lift(_events(spark, rows)).collect()[0]
    assert row.theta is None and row.lift_cuped is None


def test_calibration_bins_rates_and_clamp(spark):
    from p6__mapreduce_spark.operators.causal import calibration_bins

    data = [
        (0, dt.datetime(2024, 1, 1), 1, "purchase", 10.0),  # bin 0
        (1, dt.datetime(2024, 1, 1), 1, "view", 30.0),      # bin 0
        (2, dt.datetime(2024, 1, 1), 2, "purchase", 60.0),  # bin 1
        (3, dt.datetime(2024, 1, 1), 2, "view", 9999.0),    # clamps to bin 9
    ]
    ev = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = {r.bin: r for r in calibration_bins(ev).collect()}
    assert got[0].n == 2 and got[0].purchase_rate == pytest.approx(0.5)
    assert got[0].mean_value == pytest.approx(20.0)
    assert got[1].purchase_rate == pytest.approx(1.0)
    assert 9 in got and got[9].n == 1
