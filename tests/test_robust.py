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


def test_cusum_finds_the_level_shift(spark):
    from p6__mapreduce_spark.operators.robust import cusum_changepoint_daily

    # 10 days at $100 then 10 days at $300: CUSUM argmax = last low day
    pts = [(d, 100) for d in range(10)] + [(d, 300) for d in range(10, 20)]
    row = cusum_changepoint_daily(_orders(spark, pts)).collect()[0]
    assert row.n_days == 20
    assert row.cp_pos == 10  # boundary after the 10th (last low) day
    assert row.before_days == 10 and row.after_days == 10
    assert row.before_cents == 10 * 100 * 100
    assert row.after_cents == 10 * 300 * 100
    # |D| at the boundary: n*P_i - i*T = 20*100000 - 10*400000
    assert row.max_abs_dev == abs(20 * 100_000 - 10 * 400_000)


def test_cusum_flat_series_earliest_tie(spark):
    from p6__mapreduce_spark.operators.robust import cusum_changepoint_daily

    # constant series: every D_i is exactly 0 -> earliest day wins the tie
    row = cusum_changepoint_daily(_orders(spark, [(d, 50) for d in range(6)])).collect()[0]
    assert row.max_abs_dev == 0.0
    assert row.cp_pos == 1


def test_mann_kendall_monotone_series(spark):
    from p6__mapreduce_spark.operators.robust import mann_kendall_trend

    # strictly increasing 12 days: S = C(12,2) = 66, no ties
    row = mann_kendall_trend(_orders(spark, [(d, 100 + d) for d in range(12)])).collect()[0]
    n = 12
    assert row.s_stat == n * (n - 1) // 2
    assert row.var_num == n * (n - 1) * (2 * n + 5)
    assert row.trend == "increasing"
    # decreasing mirror
    row2 = mann_kendall_trend(_orders(spark, [(d, 100 - d) for d in range(12)])).collect()[0]
    assert row2.s_stat == -66
    assert row2.trend == "decreasing"
    assert row2.z_stat == -row.z_stat


def test_mann_kendall_tie_correction_and_no_trend(spark):
    from p6__mapreduce_spark.operators.robust import mann_kendall_trend

    # alternating two values: S ~ 0, ties present
    pts = [(d, 100 if d % 2 == 0 else 200) for d in range(8)]
    row = mann_kendall_trend(_orders(spark, pts)).collect()[0]
    n, t = 8, 4  # two groups of 4 tied values
    assert row.var_num == n * (n - 1) * (2 * n + 5) - 2 * (t * (t - 1) * (2 * t + 5))
    assert row.trend == "no_trend"
    # constant series: S = 0, var_num = 0 (all one tie group) -> z defined as 0
    rowc = mann_kendall_trend(_orders(spark, [(d, 100) for d in range(5)])).collect()[0]
    assert rowc.s_stat == 0 and rowc.z_stat == 0.0 and rowc.trend == "no_trend"
