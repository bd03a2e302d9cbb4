"""functions/ranks.py — two-phase ranking + closed-form ntile.

The r6 plan rewrites (rfm_segments, quantile_normalize_tokens) stand
on these two primitives, so they get direct equivalence tests against
the single-window forms they replace: two_phase_rank must equal
row_number() over the naive global/grouped window for EVERY row, and
ntile_expr must equal F.ntile for every (n, tiles) split shape —
including the ragged ones where n % tiles != 0 and the degenerate
ones where n < tiles.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from p6__mapreduce_spark.functions.ranks import ntile_expr, two_phase_rank


def _rows(n, seed=7):
    rng = random.Random(seed)
    # duplicate sort values on purpose: ties must be broken by the id
    # column, and duplicated keys are the case where a range boundary
    # could split equal keys across partitions
    return [(i, rng.randint(0, 20), ["a", "b", "c"][i % 3]) for i in range(n)]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(_rows(500), "id long, v long, g string")


def test_global_rank_matches_single_window(spark, df):
    got = two_phase_rank(df, ["v", "id"], rank_col="rk", num_partitions=7)
    naive = df.withColumn("rk", F.row_number().over(Window.orderBy("v", "id")))
    assert (
        got.select("id", "rk").exceptAll(naive.select("id", "rk")).count() == 0
    )
    assert got.count() == naive.count() == 500


def test_grouped_rank_matches_partitioned_window(spark, df):
    got = two_phase_rank(
        df, ["v", "id"], group_cols=["g"], rank_col="rk", num_partitions=7
    )
    naive = df.withColumn(
        "rk", F.row_number().over(Window.partitionBy("g").orderBy("v", "id"))
    )
    assert (
        got.select("id", "g", "rk").exceptAll(naive.select("id", "g", "rk")).count()
        == 0
    )


def test_group_count_col_matches_group_sizes(spark, df):
    got = two_phase_rank(
        df,
        ["v", "id"],
        group_cols=["g"],
        rank_col="rk",
        group_count_col="n_g",
        num_partitions=5,
    )
    sizes = {r["g"]: r["c"] for r in df.groupBy("g").agg(F.count("*").alias("c")).collect()}
    for r in got.select("g", "n_g").distinct().collect():
        assert r["n_g"] == sizes[r["g"]]


def test_rank_with_single_partition_degenerates_cleanly(spark, df):
    got = two_phase_rank(df, ["v", "id"], rank_col="rk", num_partitions=1)
    naive = df.withColumn("rk", F.row_number().over(Window.orderBy("v", "id")))
    assert got.select("id", "rk").exceptAll(naive.select("id", "rk")).count() == 0


@pytest.mark.parametrize("n", [1, 2, 4, 5, 6, 7, 24, 25, 26, 100, 101])
@pytest.mark.parametrize("tiles", [3, 5])
def test_ntile_expr_matches_spark_ntile(spark, n, tiles):
    base = spark.createDataFrame([(i,) for i in range(n)], "id long")
    want = base.select(
        "id", F.ntile(tiles).over(Window.orderBy("id")).alias("t")
    )
    got = base.select(
        "id",
        ntile_expr(
            F.row_number().over(Window.orderBy("id")).cast("long"),
            F.lit(n).cast("long"),
            tiles,
        ).alias("t"),
    )
    assert got.exceptAll(want).count() == 0


def test_ntile_expr_matches_duckdb_ntile(spark):
    # the oracle engine's ntile must agree too (it's what the driver
    # hashes rfm_segments against)
    import duckdb

    n, tiles = 23, 5
    duck = {
        r[0]: r[1]
        for r in duckdb.sql(
            f"SELECT i, ntile({tiles}) OVER (ORDER BY i) FROM range({n}) t(i)"
        ).fetchall()
    }
    base = spark.createDataFrame([(i,) for i in range(n)], "id long")
    got = {
        r["id"]: r["t"]
        for r in base.select(
            "id",
            ntile_expr(
                F.row_number().over(Window.orderBy("id")).cast("long"),
                F.lit(n).cast("long"),
                tiles,
            ).alias("t"),
        ).collect()
    }
    assert got == duck
