"""RFM segmentation and Merkle bucket checksum unit tests."""

from __future__ import annotations

import datetime as dt


def _run(spark, name, rows, tmp_path, sub="a"):
    from p6__mapreduce_spark.queries import QUERIES

    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    sf = str(tmp_path / sub)
    df.write.parquet(f"{sf}/orders.parquet")
    return QUERIES[name](spark, sf)


def _orders(n=25):
    base = dt.datetime(1995, 1, 1)
    return [
        (
            i,
            i % 10,
            "OF"[i % 2],
            100.0 + i,
            base + dt.timedelta(days=i),
            f"{i % 5 + 1}-X",
        )
        for i in range(n)
    ]


def test_rfm_scores_rank_customers(spark, tmp_path):
    out = {r.o_custkey: r for r in _run(spark, "rfm_segments", _orders(30), tmp_path).collect()}
    # customer 9 has the latest order (day 29) -> top recency quintile
    assert out[9].r_score == 5
    # all customers have 3 orders -> f tie broken by custkey: quintiles 1..5 ascending
    assert out[0].f_score == 1 and out[9].f_score == 5
    # rfm code composes digits
    r = out[3]
    assert r.rfm == r.r_score * 100 + r.f_score * 10 + r.m_score


def test_checksum_detects_single_field_change(spark, tmp_path):
    rows = _orders(25)
    a = {r.bucket: (r.n_rows, r.xor_hash, r.sum_hash)
         for r in _run(spark, "orders_merkle_checksum", rows, tmp_path, "a").collect()}
    rows_b = list(rows)
    k, cust, st, price, d, pr = rows_b[7]
    rows_b[7] = (k, cust, st, price + 0.01, d, pr)  # one cent, one row
    b = {r.bucket: (r.n_rows, r.xor_hash, r.sum_hash)
         for r in _run(spark, "orders_merkle_checksum", rows_b, tmp_path, "b").collect()}
    diff = [bk for bk in a if a[bk] != b[bk]]
    assert diff == [7 % 64]
    # row counts unchanged — only the hash legs moved
    assert a[7][0] == b[7][0]


def test_checksum_partition_invariant(spark, tmp_path):
    from p6__mapreduce_spark.queries import QUERIES

    rows = _orders(40)
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    sf1, sf2 = str(tmp_path / "p1"), str(tmp_path / "p8")
    df.coalesce(1).write.parquet(f"{sf1}/orders.parquet")
    df.repartition(8).write.parquet(f"{sf2}/orders.parquet")
    q = QUERIES["orders_merkle_checksum"]
    one = [(r.bucket, r.n_rows, r.xor_hash, r.sum_hash) for r in q(spark, sf1).collect()]
    eight = [(r.bucket, r.n_rows, r.xor_hash, r.sum_hash) for r in q(spark, sf2).collect()]
    assert one == eight


def test_cohort_ltv_hand_computed(spark, tmp_path):
    import datetime as dt

    from p6__mapreduce_spark.queries import QUERIES

    base = dt.datetime(2024, 1, 1, 12, 0)
    day = dt.timedelta(days=1)
    rows = [
        # user 1: first seen day 0 (click), buys 10.00 on day 0 and day 2
        (1, base, 1, "click", 0.0),
        (2, base + dt.timedelta(hours=1), 1, "purchase", 10.0),
        (3, base + 2 * day, 1, "purchase", 10.0),
        # user 2: same cohort (day 0), never buys
        (4, base, 2, "view", 0.0),
        # user 3: cohort day 1, buys 5.00 on day 3 (age 2)
        (5, base + day, 3, "signup", 0.0),
        (6, base + 3 * day, 3, "purchase", 5.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    sf = str(tmp_path / "ltv")
    df.write.parquet(f"{sf}/events.parquet")
    out = [
        (r.cohort_day, r.age_day, r.cohort_users, r.rev_cents, r.cum_rev_cents,
         r.ltv_cents_per_user)
        for r in QUERIES["cohort_ltv_curve"](spark, sf).collect()
    ]
    d0 = (dt.date(2024, 1, 1) - dt.date(1970, 1, 1)).days
    assert out == [
        (d0, 0, 2, 1000, 1000, 500.0),
        (d0, 2, 2, 1000, 2000, 1000.0),
        (d0 + 1, 2, 1, 500, 500, 500.0),
    ]


def test_benford_grid_complete_and_normalized(spark):
    from p6__mapreduce_spark.queries import QUERIES

    out = QUERIES["benford_price_digits"](spark, "/root/testdata/sf0.001").collect()
    assert [r.digit for r in out] == list(range(1, 10))
    assert abs(sum(r.expected_p for r in out) - 1.0) < 1e-12
    assert all(r.chisq_term >= 0 for r in out)
