"""Scale-feature tests: SQL entry point, bucketed shuffle-free joins,
salted skew-safe aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from p6__mapreduce_spark.functions.skew import salted_count_distinct, with_salt
from p6__mapreduce_spark.sources.readers import load_table
from p6__mapreduce_spark.sources.sinks import write_bucketed
from p6__mapreduce_spark.sql import register_tables, sql
from p6__mapreduce_spark.plans import physical_plan

SF = "/root/testdata/sf0.001"


def test_sql_entry_point_matches_dataframe(spark):
    from p6__mapreduce_spark.operators.analytics import pricing_summary

    register_tables(spark, SF)
    got = sql(
        spark,
        """
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity) AS sum_qty,
               SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sum_base_cents,
               SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS sum_disc_cents,
               SUM(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS sum_charge_cents,
               COUNT(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY 1, 2 ORDER BY 1, 2
        """,
    ).collect()
    want = pricing_summary(load_table(spark, SF, "lineitem")).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_bucketed_join_skips_shuffle(spark):
    import shutil

    # in-memory catalog + persistent warehouse dir: clear leftovers from
    # previous sessions or saveAsTable refuses the location
    for t in ("b_lineitem", "b_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{spark.conf.get('spark.sql.warehouse.dir').removeprefix('file:')}/{t}", ignore_errors=True)

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    od = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "b_lineitem", "l_orderkey", 8)
    write_bucketed(od, "b_orders", "o_orderkey", 8)
    joined = (
        spark.table("b_lineitem")
        .join(spark.table("b_orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    joined.collect()
    plan = physical_plan(joined)
    # co-located buckets: the join itself needs no exchange
    join_section = plan.split("SortMergeJoin")[1] if "SortMergeJoin" in plan else plan
    assert "Exchange hashpartitioning(l_orderkey" not in join_section
    assert "SelectedBucketsCount" in plan


def test_salted_count_distinct_matches_exact(spark):
    li = load_table(spark, SF, "lineitem")
    got = {
        r.l_returnflag: r.n_distinct
        for r in salted_count_distinct(li, "l_returnflag", "l_partkey", 8).collect()
    }
    want = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag").agg(F.count_distinct("l_partkey").alias("n")).collect()
    }
    assert got == want


def test_with_salt_bounded_and_deterministic(spark):
    df = load_table(spark, SF, "orders").limit(100)
    s1 = [r._salt for r in with_salt(df, 4).collect()]
    s2 = [r._salt for r in with_salt(df, 4).collect()]
    assert s1 == s2
    assert all(0 <= s < 4 for s in s1)


def test_runtime_bloom_filter_fires_and_preserves_result(spark):
    """At 100 TB the probe-side scan clears the default 10 GB
    application threshold and Catalyst injects the runtime bloom filter
    on its own; local data never can, so pin the machinery by lowering
    the thresholds: the selective dim side must produce a
    bloom_filter_agg subquery whose might_contain lands in the fact
    scan's filter, and the filtered join must return the identical
    result."""
    from p6__mapreduce_spark.plans import formatted_plan

    def build():
        o = load_table(spark, SF, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
        li = load_table(spark, SF, "lineitem")
        return (
            li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum("l_quantity").alias("qty"))
        )

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the shuffle join bloom targets
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        baseline = {tuple(r) for r in build().collect()}
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = build()
        plan = formatted_plan(df)
        assert "might_contain" in plan and "bloom_filter_agg" in plan
        assert {tuple(r) for r in df.collect()} == baseline
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_morton_code_known_values(spark):
    from p6__mapreduce_spark.functions.zorder import morton_code

    df = spark.createDataFrame(
        [(1, 0), (0, 1), (3, 3), (0xFFFF, 0xFFFF), (2, 1)], "a long, b long"
    )
    got = [
        r.z
        for r in df.select(morton_code("a", "b").alias("z")).orderBy("a", "b").collect()
    ]
    #  (0,1)->1, (1,0)->2, (2,1)->9, (3,3)->15, (ffff,ffff)->2^32-1
    assert got == [1, 2, 9, 15, 2**32 - 1]


def test_zordered_write_tightens_both_dimensions(spark, tmp_path):
    from p6__mapreduce_spark.functions.zorder import write_zordered

    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    # 16 files = 4 top Morton bits = 2 bits of constraint PER dimension
    write_zordered(orders, zpath, "o_custkey", "o_orderkey", n_files=16)
    # baseline: single-column sort (narrow custkey, wide orderkey)
    (
        orders.repartitionByRange(16, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(spath)
    )

    def spans(path):
        df = spark.read.parquet(path).withColumn("f", F.input_file_name())
        return (
            df.groupBy("f")
            .agg(
                (F.max("o_custkey") - F.min("o_custkey")).alias("c_span"),
                (F.max("o_orderkey") - F.min("o_orderkey")).alias("o_span"),
            )
            .agg(F.avg("c_span").alias("c"), F.avg("o_span").alias("o"))
            .first()
        )

    z, s = spans(zpath), spans(spath)
    olo, ohi, clo, chi = orders.agg(
        F.min("o_orderkey"), F.max("o_orderkey"), F.min("o_custkey"), F.max("o_custkey")
    ).first()
    full_o, full_c = ohi - olo, chi - clo
    # single-column sort leaves orderkey unconstrained per file...
    assert s.o > 0.8 * full_o
    # ...while z-order tightens BOTH dimensions well below full span
    assert z.o < 0.5 * full_o
    assert z.c < 0.5 * full_c


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    import glob

    from p6__mapreduce_spark.functions.zorder import compact_parquet

    src, dst = str(tmp_path / "frag"), str(tmp_path / "compact")
    # simulate a fragmented streaming sink: 64 tiny files
    load_table(spark, SF, "orders").repartition(64).write.parquet(src)
    assert len(glob.glob(f"{src}/*.parquet")) == 64
    n = compact_parquet(spark, src, dst, target_mb=128)
    files = glob.glob(f"{dst}/*.parquet")
    assert len(files) == n == 1  # tiny table: one file target
    # content preserved exactly
    assert (
        spark.read.parquet(dst).orderBy("o_orderkey").collect()
        == spark.read.parquet(src).orderBy("o_orderkey").collect()
    )


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """Dynamic partition pruning: joining a partitioned fact table on
    its partition column with a SELECTIVE dimension must inject a
    dynamicpruning subquery into the fact scan — at 100 TB this is
    what turns a full-table scan into reading only the partitions the
    dim side selects. Pinned on a returnflag-partitioned lineitem."""
    from p6__mapreduce_spark.plans import formatted_plan

    fact_path = str(tmp_path / "li_part")
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    li.write.partitionBy("l_returnflag").parquet(fact_path)

    dim = spark.createDataFrame(
        [("R", "returned"), ("A", "ack")], "flag string, label string"
    ).filter(F.col("label") == "returned")

    fact = spark.read.parquet(fact_path)
    joined = (
        fact.join(dim.hint("broadcast"), fact["l_returnflag"] == dim["flag"])
        .groupBy("label")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    plan = formatted_plan(joined)
    assert "dynamicpruning" in plan.lower()
    # and the result equals the statically-filtered aggregate
    want = (
        li.filter(F.col("l_returnflag") == "R")
        .agg(F.sum("l_quantity"))
        .first()[0]
    )
    got = joined.collect()
    assert len(got) == 1 and got[0].qty == want


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE skew-join splitting — the session-default remedy SCALE.md
    leans on for hot join keys. Local data can't cross the 256 MB
    default skew threshold, so lower it and require the executed plan
    to read the hot side as 'AQEShuffleRead skewed' (the runtime
    split) with the join result unchanged. Note the documented
    limitation this test encodes: a keyed operator directly downstream
    of the join suppresses the split (duplicated partitions would
    break its distribution), so the probe aggregates globally."""
    import io
    from contextlib import redirect_stdout

    hot = spark.range(300_000).select(F.lit(0).alias("k"), F.col("id").alias("v"))
    cold = spark.range(9_000).select((F.col("id") % 9 + 1).alias("k"), F.col("id").alias("v"))
    left = hot.union(cold)
    right = spark.range(200_000).select((F.col("id") % 10).alias("k"), F.col("id").alias("w"))

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        # the split needs enough map partitions for the size statistics
        # to isolate the hot key (the 8-partition test default lumps
        # keys together and the skew detector stays quiet)
        "spark.sql.shuffle.partitions": "32",
    }
    saved = {c: spark.conf.get(c) for c in confs}

    def run():
        df = left.join(right, "k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("w").alias("s")
        )
        # collect() (not first(): that builds a separate limit plan)
        # so THIS df's adaptive plan executes and explain() shows the
        # final runtime-optimized plan
        row = df.collect()[0]
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain()
        return (row.n, row.s), buf.getvalue()

    try:
        want, _ = run()
        for c, v in confs.items():
            spark.conf.set(c, v)
        got, plan = run()
        assert "AQEShuffleRead skewed" in plan
        assert got == want
    finally:
        for c, v in saved.items():
            spark.conf.set(c, v)


def test_parquet_aggregate_pushdown_footer_stats(spark):
    # COUNT/MIN/MAX answered from parquet footers: the v2 scan must
    # show a non-empty PushedAggregation, and the values must equal a
    # full-scan aggregation
    from p6__mapreduce_spark.sources.readers import parquet_stats

    path = f"{SF}/lineitem.parquet"
    [row] = parquet_stats(spark, path, ["l_orderkey"])
    full = spark.read.parquet(path).agg(
        F.count(F.lit(1)).alias("n"), F.min("l_orderkey").alias("lo"), F.max("l_orderkey").alias("hi")
    ).collect()[0]
    assert (row.row_count, row.min_l_orderkey, row.max_l_orderkey) == (full.n, full.lo, full.hi)
    # plan-shape: rebuild the pushed plan under the same confs and pin it
    old_v1 = spark.conf.get("spark.sql.sources.useV1SourceList")
    old_agg = spark.conf.get("spark.sql.parquet.aggregatePushdown")
    try:
        spark.conf.set("spark.sql.sources.useV1SourceList", "avro,csv,json,kafka,orc,text")
        spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
        plan = physical_plan(
            spark.read.parquet(path).agg(F.count(F.lit(1)).alias("n"), F.min("l_orderkey").alias("lo"))
        )
        pushed = [l for l in plan.splitlines() if "PushedAggregation" in l]
        assert pushed and "COUNT(*)" in pushed[0] and "MIN(l_orderkey)" in pushed[0], plan
    finally:
        spark.conf.set("spark.sql.sources.useV1SourceList", old_v1)
        spark.conf.set("spark.sql.parquet.aggregatePushdown", old_agg)
    # session restored
    assert spark.conf.get("spark.sql.sources.useV1SourceList") == old_v1
