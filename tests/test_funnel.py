"""Filter-funnel attrition report: monotonicity + conservation."""

from __future__ import annotations

import p6__mapreduce_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_funnel_monotone_and_conserves(spark):
    rows = Q.QUERIES["filter_funnel_report"](spark, SF_DIR).collect()
    assert [r["stage"] for r in rows] == [0, 1, 2, 3, 4, 5]
    surv = [r["survivors"] for r in rows]
    # survivors never increase through the funnel
    assert all(a >= b for a, b in zip(surv, surv[1:]))
    # dropped_here at stage k equals the survivor delta
    for k in range(1, 6):
        assert rows[k]["dropped_here"] == surv[k - 1] - surv[k]
    assert rows[0]["dropped_here"] == 0


def test_final_stage_matches_pass_gopher(spark):
    from p6__mapreduce_spark.operators.quality_filters import gopher_quality_filters
    from p6__mapreduce_spark.sources.readers import load_table

    rows = Q.QUERIES["filter_funnel_report"](spark, SF_DIR).collect()
    g = gopher_quality_filters(load_table(spark, SF_DIR, "documents"))
    n_pass = g.filter("pass_gopher").count()
    assert rows[5]["survivors"] == n_pass
