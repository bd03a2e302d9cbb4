"""Analytics operator unit tests (cube/pivot/as-of/approx)."""

from __future__ import annotations

from datetime import datetime

from p6__mapreduce_spark.operators.analytics import (
    approx_stats,
    asof_last_event,
    cube_counts,
    status_pivot,
)
from p6__mapreduce_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


def test_cube_has_all_grouping_sets(spark):
    rows = cube_counts(load_table(spark, SF, "lineitem")).collect()
    grand = [r for r in rows if r.l_returnflag is None and r.l_linestatus is None]
    assert len(grand) == 1 and grand[0].cnt == 6000
    per_flag = [r for r in rows if r.l_returnflag is not None and r.l_linestatus is None]
    assert sum(r.cnt for r in per_flag) == 6000


def test_pivot_row_sums_match_total(spark):
    rows = status_pivot(load_table(spark, SF, "orders")).collect()
    assert sum((r.O or 0) + (r.F or 0) + (r.P or 0) for r in rows) == 1500


def test_asof_marker_is_most_recent_signup(spark):
    ev = [
        (1, datetime(2024, 1, 1, 0, 0), 1, "view", 0.0, "{}"),
        (2, datetime(2024, 1, 1, 0, 10), 1, "signup", 0.0, "{}"),
        (3, datetime(2024, 1, 1, 0, 20), 1, "click", 0.0, "{}"),
        (4, datetime(2024, 1, 1, 0, 30), 2, "click", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        ev, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    rows = {r.event_id: r.last_marker_sec for r in asof_last_event(df, "signup").collect()}
    signup_sec = int(datetime(2024, 1, 1, 0, 10).timestamp())
    assert rows[1] is None          # before any signup
    assert rows[2] == signup_sec    # the signup itself
    assert rows[3] == signup_sec    # carried forward
    assert rows[4] is None          # other user never signed up


def test_approx_stats_close_to_exact(spark):
    from pyspark.sql import functions as F

    li = load_table(spark, SF, "lineitem")
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag").agg(F.countDistinct("l_orderkey").alias("n")).collect()
    }
    for r in approx_stats(li).collect():
        assert abs(r.approx_orders - exact[r.l_returnflag]) / exact[r.l_returnflag] < 0.1
        assert r.price_p50 <= r.price_p95
