"""k-anonymity audit and split-conformal intervals: hand-computed."""

from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile

import pytest

import p6__mapreduce_spark.queries as Q


def _run(spark, d, name):
    try:
        return Q.QUERIES[name](spark, d).collect()
    finally:
        shutil.rmtree(d, ignore_errors=True)


class TestKAnonymity:
    def test_singleton_classes_surface(self, spark):
        # QI = (nation, segment, floor(bal/1000)): rows 0,1 share a
        # class; row 2 is singled out (different nation).
        cust = spark.createDataFrame(
            [
                (0, "A", 1, 1500.0, "S"),
                (1, "B", 1, 1700.0, "S"),
                (2, "C", 2, 1500.0, "S"),
            ],
            "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
        )
        d = tempfile.mkdtemp(prefix="p6_kanon_")
        cust.write.mode("overwrite").parquet(os.path.join(d, "customer.parquet"))
        out = {r["class_size"]: r for r in _run(spark, d, "k_anonymity_audit")}
        assert out[1]["n_classes"] == 1 and out[1]["n_rows"] == 1
        assert out[2]["n_classes"] == 1 and out[2]["n_rows"] == 2
        # the size-2 class holds two distinct names -> l-diversity 2
        assert out[2]["min_l_diversity"] == 2


class TestConformal:
    def _orders(self, spark, day_vals):
        rows = [
            (i, 1, "O", float(v * 1000), dt.datetime(2020, 1, 1) + dt.timedelta(days=i), "1")
            for i, v in enumerate(day_vals)
        ]
        return spark.createDataFrame(
            rows,
            "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, "
            "o_orderdate timestamp, o_orderpriority string",
        )

    def test_perfect_line_gives_zero_qhat(self, spark):
        # y = 2x + 3 exactly on all days: residuals are 0 -> qhat 0,
        # coverage 1.0
        vals = [2 * i + 3 for i in range(21)]
        d = tempfile.mkdtemp(prefix="p6_conf_")
        self._orders(spark, vals).write.mode("overwrite").parquet(
            os.path.join(d, "orders.parquet")
        )
        out = _run(spark, d, "conformal_interval_daily")[0]
        assert out["slope_kd"] == pytest.approx(2.0, abs=1e-9)
        assert out["qhat_q6"] == 0
        assert out["coverage"] == pytest.approx(1.0)
        # parity split: 21 days -> 11 even-index train, 10 odd cal
        assert out["n_train"] == 11 and out["n_cal"] == 10

    def test_qhat_is_ninth_of_ten_residuals(self, spark):
        # train days (even) follow y = x; odd days deviate by
        # increasing noise 1..10 (k$) -> sorted |residuals| are
        # 1..10 k$ and qhat = ceil(0.9 * 11) = 10th smallest = 10 k$.
        vals = []
        noise = iter(range(1, 11))
        for i in range(20):
            vals.append(i if i % 2 == 0 else i + next(noise))
        d = tempfile.mkdtemp(prefix="p6_conf2_")
        self._orders(spark, vals).write.mode("overwrite").parquet(
            os.path.join(d, "orders.parquet")
        )
        out = _run(spark, d, "conformal_interval_daily")[0]
        # fit on exact y=x train -> slope 1, intercept 0; residual on
        # odd day i is its noise value exactly
        assert out["slope_kd"] == pytest.approx(1.0, abs=1e-9)
        assert out["qhat_q6"] == 10 * 10**6
        assert out["coverage"] == pytest.approx(1.0)
