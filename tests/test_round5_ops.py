"""Round-5 operator unit tests on crafted data: Bloom prejoin filter,
fixed-grid quantile sketch, weighted PageRank."""

from __future__ import annotations

from pyspark.sql import functions as F

from p6__mapreduce_spark.operators.graph import SCALE


def test_bloom_no_false_negatives_and_low_fpr(spark):
    from p6__mapreduce_spark.operators.bloom import build_bloom, member_expr

    keys = spark.createDataFrame([(i * 7,) for i in range(500)], "k long")
    words = build_bloom(keys, "k", mbits=65536)
    probe = spark.createDataFrame([(i,) for i in range(5000)], "k long")
    out = probe.select("k", member_expr("k", words, mbits=65536).alias("adm")).collect()
    admitted = {r.k for r in out if r.adm}
    members = {i * 7 for i in range(500) if i * 7 < 5000}
    # Bloom guarantee: every member admitted (no false negatives)
    assert members <= admitted
    # 500 keys in 65536 bits, k=3: expected FPR ~0.03%; allow a wide margin
    false_pos = len(admitted - members)
    assert false_pos <= 25, false_pos


def test_bloom_empty_keys_admits_nothing(spark):
    from p6__mapreduce_spark.operators.bloom import build_bloom, member_expr

    keys = spark.createDataFrame([], "k long")
    words = build_bloom(keys, "k")
    assert all(w == 0 for w in words)
    probe = spark.createDataFrame([(i,) for i in range(100)], "k long")
    assert probe.filter(member_expr("k", words)).count() == 0


def test_bloom_prejoin_audit_counts_consistent(spark):
    from p6__mapreduce_spark.operators.bloom import bloom_prejoin_audit

    customer = spark.createDataFrame(
        [(i, "SEG%d" % (i % 2)) for i in range(200)], "c_custkey long, c_mktsegment string"
    )
    orders = spark.createDataFrame(
        [(i, float(500000 if i % 10 == 0 else 100)) for i in range(200)],
        "o_custkey long, o_totalprice double",
    )
    rows = bloom_prejoin_audit(customer, orders).collect()
    assert sum(r.n_customers for r in rows) == 200
    assert sum(r.n_members for r in rows) == 20  # custkeys 0,10,...,190
    for r in rows:
        # members are always admitted; false positives counted beyond them
        assert r.n_admitted >= r.n_members
        assert r.n_false_pos == r.n_admitted - r.n_members
        assert 0.0 <= r.fpr_nonmember <= 1.0


def test_grid_quantile_exact_on_integer_values(spark):
    from p6__mapreduce_spark.operators.sketches import grid_quantile_sketch

    ev = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 101)], "event_type string, value double"
    )
    out = {int(r.q_bp): r for r in grid_quantile_sketch(ev).collect()}
    # integer values land on exact bin edges: estimates are exact quantiles
    assert out[5000].est_value == 50.0
    assert out[9000].est_value == 90.0
    assert out[9900].est_value == 99.0
    assert out[5000].n == 100


def test_grid_quantile_overflow_clamps_to_top_bin(spark):
    from p6__mapreduce_spark.operators.sketches import grid_quantile_sketch

    ev = spark.createDataFrame(
        [("a", 1e9), ("a", 2e9), ("a", 3e9)], "event_type string, value double"
    )
    out = grid_quantile_sketch(ev).collect()
    assert all(r.est_value == 4095 / 8 for r in out)  # saturates at grid edge


def _pagerank_fixture(spark, lineitem_rows):
    nation = spark.createDataFrame(
        [(0, "A"), (1, "B"), (2, "C")], "n_nationkey long, n_name string"
    )
    customer = spark.createDataFrame(
        [(i, i) for i in range(3)], "c_custkey long, c_nationkey long"
    )
    supplier = spark.createDataFrame(
        [(i, i) for i in range(3)], "s_suppkey long, s_nationkey long"
    )
    orders = spark.createDataFrame(
        [(i, i % 3) for i in range(9)], "o_orderkey long, o_custkey long"
    )
    lineitem = spark.createDataFrame(
        lineitem_rows, "l_orderkey long, l_suppkey long, l_extendedprice double, l_discount double"
    )
    return nation, customer, supplier, orders, lineitem


def test_pagerank_mass_conserved_and_sink_favored(spark):
    from p6__mapreduce_spark.operators.graph import nation_trade_pagerank

    # all revenue flows into customer-nation 0 from suppliers 1 and 2
    rows = [(0, 1, 100.0, 0.0), (0, 2, 300.0, 0.0)]
    out = nation_trade_pagerank(*_pagerank_fixture(spark, rows)).collect()
    by = {r.n_name: r for r in out}
    # total rank mass stays ~SCALE (rounding slack: a few units per node/round)
    assert abs(sum(r.pr_q for r in out) - SCALE) <= 100
    # the sink nation accumulates the most rank; it has no out-edges
    assert out[0].n_name == "A" and by["A"].out_w_q == 0
    assert by["A"].pr_q > by["B"].pr_q and by["A"].pr_q > by["C"].pr_q
    # B and C both only hold dangling+teleport shares, B == C
    assert by["B"].pr_q == by["C"].pr_q


def test_pagerank_uniform_on_symmetric_graph(spark):
    from p6__mapreduce_spark.operators.graph import nation_trade_pagerank

    # perfect 3-cycle with equal weights: ranks stay uniform
    rows = [(0, 1, 50.0, 0.0), (1, 2, 50.0, 0.0), (2, 0, 50.0, 0.0)]
    out = nation_trade_pagerank(*_pagerank_fixture(spark, rows)).collect()
    prs = {r.pr_q for r in out}
    assert len(prs) == 1
    assert abs(sum(r.pr_q for r in out) - SCALE) <= 100
