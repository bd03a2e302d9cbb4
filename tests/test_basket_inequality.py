"""Market-basket rules + Gini/Lorenz unit tests — hand-computed."""

from __future__ import annotations

import pytest


def test_basket_pair_stats_hand_computed(spark):
    from p6__mapreduce_spark.operators.basket import basket_part_pairs

    # orders: {1,2} x3, {1,3} x1, {2} x1  -> 5 orders
    rows = []
    for o, parts in enumerate([(1, 2), (1, 2), (1, 2), (1, 3), (2,)]):
        rows += [(o, p) for p in parts]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = {(r.part1, r.part2): r for r in basket_part_pairs(li, min_pair_support=2).collect()}
    assert list(out) == [(1, 2)]  # (1,3) pair support 1 < 2
    r = out[(1, 2)]
    assert (r.supp_pair, r.supp1, r.supp2, r.n_orders) == (3, 4, 4, 5)
    assert r.confidence == pytest.approx(3 / 4, abs=0)
    assert r.lift == pytest.approx(3 * 5 / (4 * 4), abs=0)


def test_basket_duplicate_lineitems_count_once(spark):
    from p6__mapreduce_spark.operators.basket import basket_part_pairs

    # same part twice in one order (two line numbers) must not inflate support
    li = spark.createDataFrame(
        [(1, 10), (1, 10), (1, 20), (2, 10), (2, 20)],
        "l_orderkey long, l_partkey long",
    )
    out = basket_part_pairs(li, min_pair_support=2).collect()
    assert len(out) == 1
    assert out[0].supp_pair == 2 and out[0].supp1 == 2


def _orders_df(spark, cents_by_cust):
    return spark.createDataFrame(
        [(c, i, v / 100) for i, (c, v) in enumerate(cents_by_cust)],
        "o_custkey long, o_orderkey long, o_totalprice double",
    )


def test_gini_perfect_equality(spark):
    from p6__mapreduce_spark.operators.analytics import revenue_gini

    row = revenue_gini(_orders_df(spark, [(c, 1000) for c in range(10)])).collect()[0]
    assert row.n_customers == 10 and row.total_cents == 10000
    assert row.gini == pytest.approx(0.0, abs=0)


def test_gini_total_concentration_approaches_one(spark):
    from p6__mapreduce_spark.operators.analytics import revenue_gini

    # one customer holds everything (others epsilon-free: they must
    # still appear, so give them 0-value orders via two orders summing)
    data = [(0, 1_000_000)] + [(c, 1) for c in range(1, 100)]
    row = revenue_gini(_orders_df(spark, data)).collect()[0]
    # G -> (n-1)/n as concentration completes; with tiny tails ~0.98
    assert row.gini > 0.95


def test_gini_aggregates_multi_order_customers(spark):
    from p6__mapreduce_spark.operators.analytics import revenue_gini

    # two orders for one customer equal one order of the sum
    a = revenue_gini(_orders_df(spark, [(1, 300), (1, 700), (2, 1000)])).collect()[0]
    b = revenue_gini(_orders_df(spark, [(1, 1000), (2, 1000)])).collect()[0]
    assert a.gini == b.gini == 0.0
    assert a.n_customers == 2


def test_lorenz_deciles_monotone_and_complete(spark):
    from p6__mapreduce_spark.operators.analytics import revenue_lorenz_deciles

    data = [(c, (c + 1) * 100) for c in range(50)]
    out = revenue_lorenz_deciles(_orders_df(spark, data)).collect()
    assert [r.decile for r in out] == list(range(1, 11))
    assert sum(r.n_customers for r in out) == 50
    shares = [r.cum_share for r in out]
    assert all(b > a for a, b in zip(shares, shares[1:]))  # strictly rising
    assert shares[-1] == pytest.approx(1.0, abs=0)
    # convexity of the Lorenz curve: later deciles add more share
    adds = [out[0].cum_share] + [b - a for a, b in zip(shares, shares[1:])]
    assert all(b >= a for a, b in zip(adds, adds[1:]))
