"""Round-7 guard fixes.

1. ``two_phase_rank(check_unique=True)`` — the key-uniqueness contract
   (docstring-only before r7) is now runtime-enforceable: a unique key
   passes with identical output, a duplicated key raises instead of
   silently double-counting ranks across a range boundary.
2. ``streaming.idempotent.table_checksum`` — the redelivery proof's
   distributed fingerprint: order- and partitioning-independent,
   sensitive to any single-row change (count, XOR fold, sum fold of
   per-row xxhash64).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from p6__mapreduce_spark.functions.ranks import two_phase_rank
from p6__mapreduce_spark.streaming.idempotent import table_checksum


def test_check_unique_passes_on_unique_key_with_identical_ranks(spark):
    df = spark.createDataFrame(
        [(i, i % 5, "ab"[i % 2]) for i in range(200)], "id long, v long, g string"
    )
    got = two_phase_rank(
        df,
        ["v", "id"],
        group_cols=["g"],
        rank_col="rk",
        num_partitions=7,
        check_unique=True,
    )
    naive = df.withColumn(
        "rk", F.row_number().over(Window.partitionBy("g").orderBy("v", "id"))
    )
    assert (
        got.select("id", "g", "rk").exceptAll(naive.select("id", "g", "rk")).count()
        == 0
    )


def test_check_unique_raises_on_duplicate_key(spark):
    # v alone is NOT unique (every value appears ~40x) — the exact
    # silent-corruption case the contract exists for
    df = spark.createDataFrame(
        [(i, i % 5) for i in range(200)], "id long, v long"
    )
    with pytest.raises(ValueError, match="not a unique key"):
        two_phase_rank(df, ["v"], rank_col="rk", check_unique=True)


def test_table_checksum_order_and_partitioning_independent(spark):
    rows = [(i, f"t{i}", float(i) * 0.5) for i in range(100)]
    a = spark.createDataFrame(rows, "id long, s string, x double")
    b = spark.createDataFrame(list(reversed(rows)), "id long, s string, x double")
    assert table_checksum(a) == table_checksum(a.repartition(13))
    assert table_checksum(a) == table_checksum(b)


def test_table_checksum_detects_single_row_change(spark):
    rows = [(i, f"t{i}") for i in range(50)]
    base = spark.createDataFrame(rows, "id long, s string")
    changed = spark.createDataFrame(
        rows[:-1] + [(49, "DIFFERENT")], "id long, s string"
    )
    extra = spark.createDataFrame(rows + [(50, "t50")], "id long, s string")
    assert table_checksum(base) != table_checksum(changed)
    assert table_checksum(base) != table_checksum(extra)
    # duplicated row: count catches what a pure XOR fold would miss
    dup = spark.createDataFrame(rows + [rows[0]], "id long, s string")
    assert table_checksum(base) != table_checksum(dup)


def test_table_checksum_empty_table(spark):
    empty = spark.createDataFrame([], "id long, s string")
    n, x, s = table_checksum(empty)
    assert (n, x, s) == (0, 0, "0")
