"""Interval-analytics unit tests: SCD2 run compaction, sweep-line
peak concurrency, weighted median — hand-computed corpora."""

from __future__ import annotations

import datetime as dt


def _events(spark, rows):
    """rows: (event_id, minute offset, user_id, event_type, value)."""
    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    data = [
        (i, base + dt.timedelta(minutes=m), u, t, float(v))
        for (i, m, u, t, v) in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_scd2_collapses_runs_and_flags_current(spark):
    from p6__mapreduce_spark.operators.intervals import scd2_user_state

    # user 1: view,view,buy,view -> 3 intervals; user 2: buy only
    ev = _events(
        spark,
        [
            (0, 0, 1, "view", 1),
            (1, 5, 1, "view", 1),
            (2, 10, 1, "buy", 1),
            (3, 20, 1, "view", 1),
            (4, 0, 2, "buy", 1),
        ],
    )
    got = scd2_user_state(ev).collect()
    u1 = [r for r in got if r.user_id == 1]
    assert [r.event_type for r in u1] == ["view", "buy", "view"]
    # first interval closes at the buy's ts, not at the second view's
    assert u1[0].valid_to == dt.datetime(2024, 3, 1, 12, 10)
    assert [r.is_current for r in u1] == [False, False, True]
    u2 = [r for r in got if r.user_id == 2]
    assert len(u2) == 1 and u2[0].is_current and u2[0].valid_to is None


def test_scd2_simultaneous_events_break_ties_by_event_id(spark):
    from p6__mapreduce_spark.operators.intervals import scd2_user_state

    # two events at the same instant: event_id orders them, so the
    # run sequence is a(id0) -> b(id1), two intervals not one
    ev = _events(spark, [(0, 0, 1, "a", 1), (1, 0, 1, "b", 1)])
    got = scd2_user_state(ev).collect()
    assert [r.event_type for r in got] == ["a", "b"]
    assert got[0].valid_to == got[1].valid_from


def test_peak_concurrency_counts_overlaps_half_open(spark):
    from p6__mapreduce_spark.operators.intervals import peak_concurrency_daily

    # 30-min intervals: t=0, t=10, t=20 overlap 3-deep at t=20;
    # t=30 opens exactly when t=0 closes -> close discharges first
    # (half-open), so the peak stays 3.
    ev = _events(
        spark,
        [(0, 0, 1, "view", 1), (1, 10, 2, "view", 1), (2, 20, 3, "view", 1), (3, 30, 4, "view", 1)],
    )
    got = peak_concurrency_daily(ev).collect()
    assert len(got) == 1
    assert got[0].peak_concurrent == 3
    assert got[0].first_open == dt.datetime(2024, 3, 1, 12, 0)


def test_peak_concurrency_disjoint_is_one(spark):
    from p6__mapreduce_spark.operators.intervals import peak_concurrency_daily

    ev = _events(spark, [(0, 0, 1, "view", 1), (1, 60, 2, "view", 1)])
    assert peak_concurrency_daily(ev).collect()[0].peak_concurrent == 1


def _lineitem(spark, rows):
    """rows: (orderkey, linenumber, returnflag, price, qty)."""
    return spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber long, l_returnflag string, "
        "l_extendedprice double, l_quantity double",
    )


def test_weighted_median_is_cumulative_weight_pick(spark):
    from p6__mapreduce_spark.operators.intervals import weighted_median_price

    # weights 1,1,8 on prices 10,20,30: total 10, half 5 -> first
    # cum>=5 is price 30 (the heavy row dominates the plain median)
    li = _lineitem(
        spark,
        [(1, 1, "A", 10.0, 1.0), (1, 2, "A", 20.0, 1.0), (2, 1, "A", 30.0, 8.0)],
    )
    row = weighted_median_price(li).collect()[0]
    assert row.wmedian_price_cents == 3000
    assert row.total_quantity == 10


def test_weighted_median_even_split_takes_lower(spark):
    from p6__mapreduce_spark.operators.intervals import weighted_median_price

    # equal weights on 10 and 20: 2*cum(10)=total -> lower median 10
    li = _lineitem(spark, [(1, 1, "A", 10.0, 3.0), (2, 1, "A", 20.0, 3.0)])
    assert weighted_median_price(li).collect()[0].wmedian_price_cents == 1000


def test_weighted_median_groups_independent(spark):
    from p6__mapreduce_spark.operators.intervals import weighted_median_price

    li = _lineitem(
        spark,
        [(1, 1, "A", 10.0, 1.0), (2, 1, "B", 99.0, 5.0), (3, 1, "B", 1.0, 1.0)],
    )
    got = {r.l_returnflag: r.wmedian_price_cents for r in weighted_median_price(li).collect()}
    assert got == {"A": 1000, "B": 9900}
