"""Physical-plan assertions: the scale guarantees are properties of the
plan, not just the output. These tests pin them down so a regression
that silently de-optimizes (lost pushdown, dropped broadcast, Python in
a hot path) fails CI even though results stay correct.
"""

from __future__ import annotations

from p6__mapreduce_spark.operators.analytics import pricing_summary, revenue_by_nation
from p6__mapreduce_spark.operators.core import line_count
from p6__mapreduce_spark.queries import QUERIES
from p6__mapreduce_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q1_filter_pushed_to_parquet_scan(spark):
    df = pricing_summary(load_table(spark, SF, "lineitem"))
    plan = formatted(df)
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]


def test_q1_prunes_unread_columns(spark):
    plan = formatted(pricing_summary(load_table(spark, SF, "lineitem")))
    read_schema = plan.split("ReadSchema")[1][:400]
    assert "l_comment" not in read_schema
    assert "l_partkey" not in read_schema  # unused column pruned


def test_dimension_joins_are_broadcast(spark):
    t = {n: load_table(spark, SF, n) for n in ("customer", "orders", "lineitem", "nation", "region")}
    plan = plan_of(revenue_by_nation(t["customer"], t["orders"], t["lineitem"], t["nation"], t["region"]))
    assert "BroadcastHashJoin" in plan


def test_core_operators_have_no_python_in_plan(spark):
    df = line_count(
        load_table(spark, SF, "orders").selectExpr("cast(o_custkey as string) as value")
    )
    df.collect()  # materialize so AQE finalizes the physical plan
    plan = plan_of(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "*(" in plan  # whole-stage-codegen stage markers
    assert "partial_count" in plan  # map-side combine before the exchange


def test_declarative_queries_avoid_python_udfs(spark):
    # every query except the MR facade (whose POINT is arbitrary Python)
    # and multimodal (pandas plumbing by design) must stay JVM-side
    exempt = {"mr_facade_wordcount", "mr_facade_sort", "multimodal_features"}
    for name, fn in QUERIES.items():
        if name in exempt:
            continue
        plan = plan_of(fn(spark, SF))
        assert "EvalPython" not in plan, f"{name} fell back to Python UDF"
