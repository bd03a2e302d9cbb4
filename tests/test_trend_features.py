"""OLS daily trend, lag-k autocorrelation, and leave-one-out target
encoding: hand-computed expectations on tiny exact-arithmetic frames."""

from __future__ import annotations

import datetime as dt

import pytest

from p6__mapreduce_spark.operators.features import target_encode_loo
from p6__mapreduce_spark.operators.timeseries import acf_daily_revenue, ols_daily_trend


def _orders(spark, rows):
    """rows: (orderkey, custkey, price_dollars, date)"""
    return spark.createDataFrame(
        [(k, c, "O", float(p), dt.datetime.combine(d, dt.time()), "1-URGENT") for k, c, p, d in rows],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, "
        "o_orderdate timestamp, o_orderpriority string",
    )


def _day(i: int) -> dt.date:
    return dt.date(2020, 1, 1) + dt.timedelta(days=i)


class TestOlsDailyTrend:
    def test_exact_linear_fit(self, spark):
        # one order per day priced so daily kilodollars = 3x + 5
        rows = [(i, 1, (3 * i + 5) * 1000, _day(i)) for i in range(10)]
        out = ols_daily_trend(_orders(spark, rows)).collect()[0]
        assert out["n_days"] == 10
        assert out["slope_kd_per_day"] == pytest.approx(3.0, abs=1e-12)
        assert out["intercept_kd"] == pytest.approx(5.0, abs=1e-12)
        assert out["r2"] == pytest.approx(1.0, abs=1e-12)

    def test_constant_series_has_null_slope_guarded_r2(self, spark):
        rows = [(i, 1, 7000, _day(i)) for i in range(5)]
        out = ols_daily_trend(_orders(spark, rows)).collect()[0]
        # denx > 0 (x varies) so slope is defined and 0; deny == 0 so r2 is NULL
        assert out["slope_kd_per_day"] == pytest.approx(0.0)
        assert out["r2"] is None

    def test_gap_days_use_actual_day_index(self, spark):
        # days 0 and 10 only: slope spans the gap, (15-5)/(10-0) = 1
        rows = [(1, 1, 5000, _day(0)), (2, 1, 15000, _day(10))]
        out = ols_daily_trend(_orders(spark, rows)).collect()[0]
        assert out["slope_kd_per_day"] == pytest.approx(1.0)


class TestAcfDailyRevenue:
    def test_alternating_series(self, spark):
        # daily k$ alternates 1, 3, 1, 3, ... -> lag-1 acf = -1, lag-2 = +1
        rows = [(i, 1, (1 if i % 2 == 0 else 3) * 1000, _day(i)) for i in range(12)]
        out = {r["lag"]: r for r in acf_daily_revenue(_orders(spark, rows), max_lag=2).collect()}
        assert out[1]["n_pairs"] == 11
        assert out[1]["acf"] == pytest.approx(-1.0, abs=1e-12)
        assert out[2]["acf"] == pytest.approx(1.0, abs=1e-12)

    def test_constant_series_yields_null(self, spark):
        rows = [(i, 1, 4000, _day(i)) for i in range(6)]
        out = acf_daily_revenue(_orders(spark, rows), max_lag=1).collect()
        assert out[0]["acf"] is None

    def test_calendar_gap_shrinks_pairs(self, spark):
        # days 0,1,2, 5,6: lag-1 pairs are (0,1),(1,2),(5,6) -> 3
        rows = [(i, 1, float(1000 * (i + 1)), _day(d)) for i, d in enumerate([0, 1, 2, 5, 6])]
        out = acf_daily_revenue(_orders(spark, rows), max_lag=1).collect()
        assert out[0]["n_pairs"] == 3


class TestTargetEncodeLoo:
    def _customer(self, spark, rows):
        return spark.createDataFrame(
            [(c, f"Customer#{c}", 0, 0.0, seg) for c, seg in rows],
            "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
        )

    def test_loo_excludes_own_row(self, spark):
        # segment A: prices 10, 20, 30 -> LOO for the 10-order = (20+30)/2 = 25
        cust = self._customer(spark, [(1, "A"), (2, "A"), (3, "A")])
        orders = _orders(spark, [(1, 1, 10, _day(0)), (2, 2, 20, _day(0)), (3, 3, 30, _day(0))])
        got = {r["o_orderkey"]: r["loo_mean_cents"] for r in target_encode_loo(orders, cust).collect()}
        assert got[1] == pytest.approx(2500.0)  # cents
        assert got[2] == pytest.approx(2000.0)
        assert got[3] == pytest.approx(1500.0)

    def test_singleton_segment_falls_back_to_global(self, spark):
        # segment B has one order (price 100); global others are 10 and 20
        cust = self._customer(spark, [(1, "A"), (2, "A"), (3, "B")])
        orders = _orders(spark, [(1, 1, 10, _day(0)), (2, 2, 20, _day(0)), (3, 3, 100, _day(0))])
        got = {r["o_orderkey"]: r["loo_mean_cents"] for r in target_encode_loo(orders, cust).collect()}
        # LOO global mean for order 3 = (1000 + 2000) / 2 cents
        assert got[3] == pytest.approx(1500.0)

    def test_mean_reconstruction(self, spark):
        # for a segment of n rows, sum(loo_i) = n*mean - ... sanity: each
        # loo value must differ from the plain mean unless all targets equal
        cust = self._customer(spark, [(1, "A"), (2, "A")])
        orders = _orders(spark, [(1, 1, 10, _day(0)), (2, 2, 30, _day(0))])
        got = {r["o_orderkey"]: r["loo_mean_cents"] for r in target_encode_loo(orders, cust).collect()}
        assert got[1] == pytest.approx(3000.0)
        assert got[2] == pytest.approx(1000.0)

    def test_one_row_table_yields_null_not_nan(self, spark):
        # r6 ADVICE fix: a degenerate one-row table has no "others"
        # even globally — the fallback division by (g_n - 1) = 0 must
        # be guarded to NULL on both engines, never inf/NaN
        cust = self._customer(spark, [(1, "A")])
        orders = _orders(spark, [(1, 1, 10, _day(0))])
        out = target_encode_loo(orders, cust).collect()
        assert len(out) == 1 and out[0]["loo_mean_cents"] is None
