"""Theil-Sen and seasonal median/MAD unit tests — hand-computed and
outlier-robustness properties."""

from __future__ import annotations

import datetime as dt


def _orders(spark, day_cents):
    """day_cents: list of (day offset from 1995-01-06 [a Friday], dollars)."""
    base = dt.datetime(1995, 1, 6)
    rows = [
        (i, base + dt.timedelta(days=d), float(v)) for i, (d, v) in enumerate(day_cents)
    ]
    return spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate timestamp, o_totalprice double"
    )


def test_theil_sen_exact_line(spark):
    from p6__mapreduce_spark.operators.robust import theil_sen_daily_revenue

    # perfect line: revenue = 10 + 2*d dollars -> slope 200 cents/day
    orders = _orders(spark, [(d, 10 + 2 * d) for d in range(6)])
    row = theil_sen_daily_revenue(orders).collect()[0]
    assert (row.n_days, row.n_pairs) == (6, 15)
    assert row.slope_q6 == 200 * 1_000_000


def test_theil_sen_shrugs_off_outlier(spark):
    from p6__mapreduce_spark.operators.robust import theil_sen_daily_revenue

    # same line with one wild outlier day: median slope must hold
    pts = [(d, 10 + 2 * d) for d in range(9)] + [(9, 100000)]
    row = theil_sen_daily_revenue(_orders(spark, pts)).collect()[0]
    assert row.slope_q6 == 200 * 1_000_000


def test_theil_sen_aggregates_same_day_orders(spark):
    from p6__mapreduce_spark.operators.robust import theil_sen_daily_revenue

    # two orders on one day sum before the slope: days (0,30), (1,50)
    orders = _orders(spark, [(0, 10), (0, 20), (1, 50)])
    row = theil_sen_daily_revenue(orders).collect()[0]
    assert (row.n_days, row.n_pairs) == (2, 1)
    assert row.slope_q6 == 2000 * 1_000_000  # (5000-3000) cents/day


def test_seasonal_anomaly_flags_only_the_spike(spark):
    from p6__mapreduce_spark.operators.robust import seasonal_anomaly_daily

    # 8 weeks of the same Friday revenue with mild jitter + one 100x week
    pts = [(7 * w, 100 + (w % 3)) for w in range(8)] + [(7 * 8, 10000)]
    out = seasonal_anomaly_daily(_orders(spark, pts), k_mad=3).collect()
    assert all(r.dow == out[0].dow for r in out)  # all Fridays
    flags = {r.day_idx: r.is_anomaly for r in out}
    spike_day = max(flags)
    assert flags[spike_day] is True
    assert sum(flags.values()) == 1  # jitter days stay quiet


def test_seasonal_anomaly_zero_mad_constant_cohort(spark):
    from p6__mapreduce_spark.operators.robust import seasonal_anomaly_daily

    # constant cohort: MAD 0; equal days not flagged (strict >), the
    # single deviating day is
    pts = [(7 * w, 100) for w in range(5)] + [(35, 101)]
    out = {r.day_idx: r for r in seasonal_anomaly_daily(_orders(spark, pts)).collect()}
    deviating = max(out)
    assert out[deviating].is_anomaly is True
    assert all(not r.is_anomaly for d, r in out.items() if d != deviating)
    assert out[deviating].mad_cents == 0
