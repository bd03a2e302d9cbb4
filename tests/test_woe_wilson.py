"""WOE/IV and Wilson-LCB ranking: hand-computed expectations."""

from __future__ import annotations

import datetime as dt
import math
import os
import shutil
import tempfile

import pytest

import p6__mapreduce_spark.queries as Q


def _write(df, d, name):
    df.write.mode("overwrite").parquet(os.path.join(d, f"{name}.parquet"))


class TestWoeIv:
    def test_hand_computed(self, spark):
        # segment A: 3 pos 1 neg; segment B: 1 pos 3 neg; totals 4/4.
        # WOE(A) = ln((3*4)/(1*4)) = ln 3; WOE(B) = ln(1/3) = -ln 3.
        # IV term(A) = (3/4 - 1/4) * ln 3 = 0.5 * ln 3.
        cust = spark.createDataFrame(
            [(i, f"C{i}", 0, 0.0, "A" if i < 4 else "B") for i in range(8)],
            "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
        )
        # orders: A customers 0-3 -> F,F,F,O ; B customers 4-7 -> F,O,O,O
        statuses = ["F", "F", "F", "O", "F", "O", "O", "O"]
        orders = spark.createDataFrame(
            [(i, i, s, 10.0, dt.datetime(2020, 1, 1), "1") for i, s in enumerate(statuses)],
            "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, "
            "o_orderdate timestamp, o_orderpriority string",
        )
        d = tempfile.mkdtemp(prefix="p6_woe_")
        _write(cust, d, "customer"); _write(orders, d, "orders")
        try:
            out = {r["c_mktsegment"]: r for r in Q.QUERIES["woe_iv_segments"](spark, d).collect()}
        finally:
            shutil.rmtree(d, ignore_errors=True)
        ln3_q6 = math.floor(math.log(3.0) * 1e6 + 0.5)
        assert out["A"]["n_pos"] == 3 and out["A"]["n_neg"] == 1
        assert out["A"]["woe_q6"] == ln3_q6
        assert out["B"]["woe_q6"] == math.floor(math.log(1 / 3) * 1e6 + 0.5)
        assert out["A"]["iv_term"] == pytest.approx(0.5 * ln3_q6 / 1e6)
        # symmetric design -> IV terms equal
        assert out["B"]["iv_term"] == pytest.approx(out["A"]["iv_term"])

    def test_zero_cell_guard(self, spark):
        cust = spark.createDataFrame(
            [(0, "C0", 0, 0.0, "A"), (1, "C1", 0, 0.0, "B")],
            "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
        )
        orders = spark.createDataFrame(
            [(0, 0, "F", 1.0, dt.datetime(2020, 1, 1), "1"),
             (1, 1, "O", 1.0, dt.datetime(2020, 1, 1), "1")],
            "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, "
            "o_orderdate timestamp, o_orderpriority string",
        )
        d = tempfile.mkdtemp(prefix="p6_woe0_")
        _write(cust, d, "customer"); _write(orders, d, "orders")
        try:
            out = {r["c_mktsegment"]: r for r in Q.QUERIES["woe_iv_segments"](spark, d).collect()}
        finally:
            shutil.rmtree(d, ignore_errors=True)
        assert out["A"]["woe_q6"] is None and out["A"]["iv_term"] is None


class TestWilsonLcb:
    def test_small_sample_ranks_below_large(self, spark):
        # brand X: 1/1 returned (naive rate 1.0); brand Y: 50/100.
        # Wilson LCB must rank Y ABOVE X.
        part = spark.createDataFrame(
            [(0, "a", "X", "t", 1, 1.0), (1, "b", "Y", "t", 1, 1.0)],
            "p_partkey long, p_name string, p_brand string, p_type string, p_size int, p_retailprice double",
        )
        rows = [(0, 0, 0, 1, 1.0, 1.0, 0.0, 0.0, "R", "O", dt.datetime(2020, 1, 1))]
        rows += [
            (i + 1, 1, 0, 1, 1.0, 1.0, 0.0, 0.0, "R" if i < 50 else "N", "O", dt.datetime(2020, 1, 1))
            for i in range(100)
        ]
        li = spark.createDataFrame(
            rows,
            "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, l_quantity double, "
            "l_extendedprice double, l_discount double, l_tax double, l_returnflag string, "
            "l_linestatus string, l_shipdate timestamp",
        )
        d = tempfile.mkdtemp(prefix="p6_wil_")
        _write(part, d, "part"); _write(li, d, "lineitem")
        try:
            out = Q.QUERIES["wilson_lcb_return_rates"](spark, d).collect()
        finally:
            shutil.rmtree(d, ignore_errors=True)
        assert [r["p_brand"] for r in out] == ["Y", "X"]
        y = {r["p_brand"]: r for r in out}["Y"]
        # closed-form check at r=50, n=100, z=1.96
        p, n, z2 = 0.5, 100.0, 3.8416
        expect = (p + z2 / (2 * n) - 1.96 * math.sqrt((p * (1 - p) + z2 / (4 * n)) / n)) / (1 + z2 / n)
        assert y["wilson_lcb"] == pytest.approx(expect, abs=1e-9)
