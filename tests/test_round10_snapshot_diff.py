"""Round-10 optimization guard: snapshot_diff's single-pass 'new'
snapshot derivation.

r10 folded the 'new' side's UNION of two filtered orders scans
(surviving keys re-priced / every-101st key re-inserted under a
shifted key) into ONE pass that emits 0-2 struct rows per input row
(NULL-struct when a slice condition fails, filtered before the
explode). The fold is exact because the slice filters are unchanged
and independent — a key can survive, be re-inserted, both, or
neither, and each case must yield the same row multiset as the union.
These tests pin that equivalence on a fixture that exercises every
case, including the %97-and-%101 overlap the real data hits rarely
(keys divisible by both appear only as re-inserted), plus the derived
diff classes end to end.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

_ORDERS_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.StringType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

# every slice case: 97*101 (both: drops from survivors, re-inserted),
# 97*2 (removed, not re-inserted), 101*3 (survives AND re-inserted),
# plain keys (survive; one urgent -> re-priced, one with a fractional
# price so re-pricing actually changes cents), and a key whose row is
# entirely unchanged (must drop out of the diff).
_ROWS = [
    (97 * 101, 1, "F", 100.10, "1995-01-01", "3-MEDIUM"),
    (97 * 2, 1, "O", 200.00, "1995-01-02", "1-URGENT"),
    (101 * 3, 2, "F", 300.99, "1995-01-03", "2-HIGH"),
    (5, 2, "P", 400.49, "1995-01-04", "1-URGENT"),
    (6, 3, "O", 500.00, "1995-01-05", "1-URGENT"),
    (7, 3, "F", 600.25, "1995-01-06", "4-NOT SPECIFIED"),
]


def _orders(spark):
    return spark.createDataFrame(_ROWS, _ORDERS_SCHEMA)


def _union_new_side(o):
    """The retired two-scan UNION derivation, kept as the reference."""
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        o.filter(F.col("o_orderkey") % 97 != 0)
        .select(
            F.col("o_orderkey").alias("k_new"),
            F.col("o_orderstatus").alias("st_new"),
            F.when(
                F.col("o_orderpriority") == "1-URGENT",
                (F.round(F.round(F.col("o_totalprice")) * 100)).cast("long"),
            )
            .otherwise(cents)
            .alias("pc_new"),
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 101 == 0).select(
                (F.col("o_orderkey") + 10_000_000).alias("k_new"),
                F.col("o_orderstatus").alias("st_new"),
                cents.alias("pc_new"),
            )
        )
    )


def _explode_new_side(o):
    """The shipped single-pass derivation, replicated structurally
    (the query builds it inline; this mirrors queries.q_snapshot_diff)."""
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    survives = F.when(
        F.col("o_orderkey") % 97 != 0,
        F.struct(
            F.col("o_orderkey").alias("k_new"),
            F.col("o_orderstatus").alias("st_new"),
            F.when(
                F.col("o_orderpriority") == "1-URGENT",
                (F.round(F.round(F.col("o_totalprice")) * 100)).cast("long"),
            )
            .otherwise(cents)
            .alias("pc_new"),
        ),
    )
    reinserted = F.when(
        F.col("o_orderkey") % 101 == 0,
        F.struct(
            (F.col("o_orderkey") + 10_000_000).alias("k_new"),
            F.col("o_orderstatus").alias("st_new"),
            cents.alias("pc_new"),
        ),
    )
    return (
        o.select(
            F.explode(
                F.filter(F.array(survives, reinserted), lambda x: x.isNotNull())
            ).alias("r")
        )
        .select("r.k_new", "r.st_new", "r.pc_new")
    )


def test_new_side_row_multiset_identical(spark):
    o = _orders(spark)
    ref = sorted(map(tuple, _union_new_side(o).collect()))
    got = sorted(map(tuple, _explode_new_side(o).collect()))
    assert got == ref
    # the fixture exercises every slice case
    keys = [r[0] for r in ref]
    assert 97 * 101 not in keys  # dropped from survivors
    assert 97 * 101 + 10_000_000 in keys  # ...but re-inserted
    assert 97 * 2 not in keys  # removed outright
    assert 101 * 3 in keys and 101 * 3 + 10_000_000 in keys  # both slices


def test_new_side_per_row_fanout(spark):
    # 0 rows for %97-only keys, 2 for %101 non-%97 keys, 1 otherwise
    o = _orders(spark)
    got = (
        _explode_new_side(o)
        .withColumn("base_k", F.col("k_new") % 10_000_000)
        .groupBy("base_k")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    fanout = {r["base_k"]: r["n"] for r in got.collect()}
    assert fanout == {97 * 101: 1, 101 * 3: 2, 5: 1, 6: 1, 7: 1}


def test_snapshot_diff_classes_on_fixture(tmp_path, spark):
    # end to end through the registered query on a parquet fixture:
    # removed = the two %97 keys; added = the two re-inserted keys;
    # changed = the urgent keys whose re-priced cents differ (5: 400.49
    # -> 40000; 6: 500.00 re-prices to the same 50000 -> drops out; 7
    # non-urgent unchanged -> drops out; 101*3 survives unchanged).
    from p6__mapreduce_spark.queries import QUERIES

    sf_dir = str(tmp_path)
    _orders(spark).write.mode("overwrite").parquet(f"{sf_dir}/orders.parquet")
    got = {
        r["change"]: r["n_rows"]
        for r in QUERIES["snapshot_diff"](spark, sf_dir).collect()
    }
    assert got == {"added": 2, "changed": 1, "removed": 2}
