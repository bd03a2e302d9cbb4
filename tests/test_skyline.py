"""Pareto frontier (2D skyline) unit tests via the registry query."""

from __future__ import annotations


def _frontier(spark, rows, tmp_path):
    from p6__mapreduce_spark.queries import QUERIES

    df = spark.createDataFrame(
        [(k, float(p), s) for k, p, s in rows],
        "p_partkey long, p_retailprice double, p_size int",
    )
    sf = str(tmp_path / "sf")
    df.write.parquet(f"{sf}/part.parquet")
    out = QUERIES["pareto_frontier_parts"](spark, sf)
    return [(r.p_partkey, r.price_cents, r.p_size) for r in out.collect()]


def test_skyline_hand_computed(spark, tmp_path):
    rows = [
        (1, 10.0, 5),   # frontier (cheapest)
        (2, 12.0, 7),   # frontier (pricier but bigger)
        (3, 11.0, 4),   # dominated by 1 (pricier, smaller)
        (4, 12.0, 6),   # dominated by 2 (same price, smaller)
        (5, 15.0, 7),   # dominated by 2 (pricier, same size)
        (6, 20.0, 9),   # frontier
    ]
    got = _frontier(spark, rows, tmp_path)
    assert got == [(1, 1000, 5), (2, 1200, 7), (6, 2000, 9)]


def test_skyline_equal_point_duplicates_all_survive(spark, tmp_path):
    rows = [(1, 10.0, 5), (2, 10.0, 5), (3, 30.0, 2)]
    got = _frontier(spark, rows, tmp_path)
    assert got == [(1, 1000, 5), (2, 1000, 5)]


def test_skyline_monotone_chain_keeps_everything(spark, tmp_path):
    # strictly increasing price AND size: nothing dominates anything
    rows = [(i, 10.0 + i, 5 + i) for i in range(6)]
    got = _frontier(spark, rows, tmp_path)
    assert [g[0] for g in got] == list(range(6))
