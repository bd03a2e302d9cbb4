"""Bin-bucketed interval join unit tests: exact match semantics at
bin boundaries, no duplicate pairs, multi-bin intervals."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _join(spark, points, intervals, bin_seconds):
    from p6__mapreduce_spark.operators.rangejoin import interval_bin_join

    pts = spark.createDataFrame(points, "pid long, ts timestamp")
    ivs = spark.createDataFrame(intervals, "iid long, start timestamp, end timestamp")
    return {
        (r.pid, r.iid)
        for r in interval_bin_join(pts, ivs, bin_seconds=bin_seconds).collect()
    }


def test_half_open_boundaries(spark):
    # interval [10:00, 11:00): point at 10:00 IN, point at 11:00 OUT
    got = _join(
        spark,
        [(1, _ts("2024-01-01T10:00:00")), (2, _ts("2024-01-01T11:00:00"))],
        [(7, _ts("2024-01-01T10:00:00"), _ts("2024-01-01T11:00:00"))],
        bin_seconds=600,
    )
    assert got == {(1, 7)}


def test_multi_bin_interval_produces_each_match_once(spark):
    # 30-min interval spans 4 x 10-min bins; the contained point must
    # appear exactly once even though the interval occupies 4 bins
    from p6__mapreduce_spark.operators.rangejoin import interval_bin_join

    pts = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:15:00"))], "pid long, ts timestamp"
    )
    ivs = spark.createDataFrame(
        [(7, _ts("2024-01-01T09:55:00"), _ts("2024-01-01T10:25:00"))],
        "iid long, start timestamp, end timestamp",
    )
    rows = interval_bin_join(pts, ivs, bin_seconds=600).collect()
    assert [(r.pid, r.iid) for r in rows] == [(1, 7)]


def test_interval_ending_on_bin_boundary_skips_next_bin(spark):
    # end exactly on a bin edge: the point in the next bin must not match,
    # and the interval must not even explode into that bin
    got = _join(
        spark,
        [(1, _ts("2024-01-01T00:10:05"))],
        [(7, _ts("2024-01-01T00:00:00"), _ts("2024-01-01T00:10:00"))],
        bin_seconds=600,
    )
    assert got == set()


def test_overlapping_intervals_all_match(spark):
    got = _join(
        spark,
        [(1, _ts("2024-01-01T00:05:00"))],
        [
            (7, _ts("2024-01-01T00:00:00"), _ts("2024-01-01T00:10:00")),
            (8, _ts("2024-01-01T00:04:00"), _ts("2024-01-01T00:06:00")),
            (9, _ts("2024-01-01T00:06:00"), _ts("2024-01-01T00:07:00")),
        ],
        bin_seconds=600,
    )
    assert got == {(1, 7), (1, 8)}


def test_promo_window_counts_match_nested_loop(spark):
    """The bin join must equal the naive nested-loop range join."""
    from p6__mapreduce_spark.operators.rangejoin import promo_window_event_stats

    base = _ts("1995-01-01T00:00:00")
    orders = spark.createDataFrame(
        [
            (i, base + dt.timedelta(days=3 * i), "1-URGENT" if i % 2 == 0 else "3-MEDIUM")
            for i in range(10)
        ],
        "o_orderkey long, o_orderdate timestamp, o_orderpriority string",
    )
    lineitem = spark.createDataFrame(
        [
            (i, base + dt.timedelta(hours=13 * i), float(i % 5 + 1))
            for i in range(60)
        ],
        "l_orderkey long, l_shipdate timestamp, l_quantity double",
    )
    got = {
        r.o_orderkey: (r.n_shipments, r.sum_qty_cents)
        for r in promo_window_event_stats(orders, lineitem).collect()
    }
    urgent = [r for r in orders.collect() if r.o_orderpriority == "1-URGENT"]
    li = lineitem.collect()
    for o in urgent:
        hits = [
            l
            for l in li
            if o.o_orderdate <= l.l_shipdate < o.o_orderdate + dt.timedelta(days=3)
        ]
        want = (len(hits), int(sum(round(l.l_quantity * 100) for l in hits)))
        assert got[o.o_orderkey] == want, o.o_orderkey
    assert set(got) == {o.o_orderkey for o in urgent}


def test_bin_join_plan_has_no_nested_loop(spark):
    """The whole point: the physical plan must be an equi-join
    (SortMerge or ShuffledHash on the bin), never BroadcastNestedLoop
    or Cartesian."""
    from p6__mapreduce_spark.operators.rangejoin import interval_bin_join

    pts = spark.range(100).select(
        F.col("id").alias("pid"), F.timestamp_seconds(F.col("id") * 100).alias("ts")
    )
    ivs = spark.range(50).select(
        F.col("id").alias("iid"),
        F.timestamp_seconds(F.col("id") * 200).alias("start"),
        F.timestamp_seconds(F.col("id") * 200 + 500).alias("end"),
    )
    df = interval_bin_join(pts, ivs, bin_seconds=600)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    text = buf.getvalue()
    assert "NestedLoop" not in text and "Cartesian" not in text
    assert "Join" in text


def test_degenerate_interval_dropped_before_explode(spark):
    """An interval with end <= start (corrupt data) must produce no
    matches and no bin fan-out (sequence() would DESCEND otherwise)."""
    import datetime as dt

    from p6__mapreduce_spark.operators.rangejoin import interval_bin_join

    t = dt.datetime.fromisoformat
    pts = spark.createDataFrame(
        [(1, t("2024-01-01T10:00:00"))], "pid long, ts timestamp"
    )
    ivs = spark.createDataFrame(
        [
            (7, t("2024-01-01T10:00:00"), t("2023-01-01T00:00:00")),  # end far past
            (8, t("2024-01-01T10:00:00"), t("2024-01-01T10:00:00")),  # empty
        ],
        "iid long, start timestamp, end timestamp",
    )
    out = interval_bin_join(pts, ivs, bin_seconds=600)
    assert out.count() == 0


def test_keyed_bin_join_matches_naive_key_join(spark):
    """keys=("user_id",): the keyed bin-bucket join equals the naive
    user-equi-join + time filter — including a hot user holding most
    rows (the r10 skew-audit regime the keyed variant exists for)."""
    import datetime as dt

    from p6__mapreduce_spark.operators.rangejoin import conversion_window_pairs

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    eid = 0
    # hot user 1: 120 clicks + 30 purchases across 6 hours; users 2-9
    # sparse
    for i in range(120):
        rows.append((eid, base + dt.timedelta(minutes=3 * i), 1, "click", 0.0, "{}"))
        eid += 1
    for i in range(30):
        rows.append((eid, base + dt.timedelta(minutes=12 * i + 1), 1, "purchase", 10.0 + i, "{}"))
        eid += 1
    for u in range(2, 10):
        rows.append((eid, base + dt.timedelta(minutes=u), u, "click", 0.0, "{}"))
        eid += 1
        rows.append((eid, base + dt.timedelta(minutes=u + 30), u, "purchase", 5.0, "{}"))
        eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {
        (r.click_id, r.purchase_id, r.p_cents)
        for r in conversion_window_pairs(ev).collect()
    }
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id").alias("cu"), F.col("ts").alias("cts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("pu"),
        F.col("ts").alias("pts_"),
        F.round(F.col("value") * 100).cast("long").alias("p_cents"),
    )
    want = {
        (r.click_id, r.purchase_id, r.p_cents)
        for r in clicks.join(
            purchases,
            (F.col("cu") == F.col("pu"))
            & (F.col("cts") < F.col("pts_"))
            & (F.col("cts") >= F.col("pts_") - F.expr("INTERVAL 1 HOUR")),
        ).collect()
    }
    assert got == want and len(got) > 300
