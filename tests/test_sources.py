"""Source/sink round-trips: every format the engine reads or writes."""

from __future__ import annotations

from p6__mapreduce_spark.sources.readers import (
    read_csv,
    read_json,
    read_lines,
    read_orc,
    read_parquet,
)
from p6__mapreduce_spark.sources.sinks import collect_lines, write_orc, write_parquet
from p6__mapreduce_spark.plans import physical_plan


def test_orc_roundtrip_partitioned_with_pushdown(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "x"), (3, "c", "y")], "id long, v string, part string"
    )
    out = str(tmp_path / "orc_out")
    write_orc(df, out, partition_by=["part"])
    back = read_orc(spark, out)
    assert {(r.id, r.v, r.part) for r in back.collect()} == {
        (1, "a", "x"), (2, "b", "x"), (3, "c", "y")
    }
    plan = physical_plan(back.filter("part = 'x' and id = 1"))
    # partition pruning on the dir column AND predicate pushdown to stripes
    assert "PartitionFilters: [isnotnull(part" in plan
    assert "PushedFilters: [" in plan and "id" in plan.split("PushedFilters")[1][:80]


def test_parquet_roundtrip_partitioned(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "x"), (3, "c", "y")], "id long, v string, part string"
    )
    out = str(tmp_path / "out")
    write_parquet(df, out, partition_by=["part"])
    back = read_parquet(spark, out)
    assert {(r.id, r.v, r.part) for r in back.collect()} == {
        (1, "a", "x"), (2, "b", "x"), (3, "c", "y")
    }
    # partition pruning: filtering on the partition column prunes files
    plan = physical_plan(back.filter("part = 'x'"))
    assert "PartitionFilters: [isnotnull(part" in plan


def test_csv_roundtrip_with_schema(spark, tmp_path):
    p = str(tmp_path / "c.csv")
    (tmp_path / "c.csv").write_text("id,v\n1,a\n2,b\n")
    df = read_csv(spark, p, schema="id long, v string")
    assert [(r.id, r.v) for r in df.orderBy("id").collect()] == [(1, "a"), (2, "b")]


def test_json_roundtrip(spark, tmp_path):
    p = str(tmp_path / "j.json")
    (tmp_path / "j.json").write_text('{"id": 1, "v": "a"}\n{"id": 2, "v": "b"}\n')
    df = read_json(spark, p, schema="id long, v string")
    assert [(r.id, r.v) for r in df.orderBy("id").collect()] == [(1, "a"), (2, "b")]


def test_collect_lines_stdout_shape(spark):
    df = spark.createDataFrame([("a", 2), ("b", 1)], "key string, cnt int").orderBy("key")
    assert collect_lines(df) == ["a 2", "b 1"]


def test_orc_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    out = str(tmp_path / "orc_out")
    df.write.orc(out)
    assert {(r.id, r.v) for r in spark.read.orc(out).collect()} == {(1, "a"), (2, "b")}


def test_lakehouse_connectors_are_gated(spark, tmp_path):
    import pytest as _pytest

    from p6__mapreduce_spark.sources.lakehouse import format_available, read_table_format

    # none of the lakehouse jars ship in this image
    for fmt in ("delta", "iceberg", "hudi"):
        assert format_available(spark, fmt) is False
        with _pytest.raises(NotImplementedError):
            read_table_format(spark, fmt, str(tmp_path))
    with _pytest.raises(ValueError):
        read_table_format(spark, "bogus", str(tmp_path))


def test_publish_parquet_atomic_swaps_versions(spark, tmp_path):
    from p6__mapreduce_spark.sources.sinks import publish_parquet_atomic

    import os

    target = str(tmp_path / "dataset")
    v1 = spark.range(5).selectExpr("id", "id * 2 AS v")
    assert publish_parquet_atomic(v1, target) is None  # no previous version
    assert spark.read.parquet(target).count() == 5
    # the published path is a symlink into the version store: the swap
    # is ONE rename, so readers always resolve a complete version
    assert os.path.islink(target)

    v2 = spark.range(9).selectExpr("id", "id * 3 AS v")
    old = publish_parquet_atomic(v2, target)
    assert spark.read.parquet(target).count() == 9
    assert spark.read.parquet(old).count() == 5  # previous version retained

    # a failed write leaves the published data untouched
    import pytest as _pytest

    bad = spark.range(3).selectExpr("raise_error('boom') AS x")
    with _pytest.raises(Exception):
        publish_parquet_atomic(bad, target)
    assert spark.read.parquet(target).count() == 9

    # GC: a third publish keeps the newest keep_versions=2 and drops v1
    v3 = spark.range(2).selectExpr("id", "id AS v")
    old2 = publish_parquet_atomic(v3, target)
    assert spark.read.parquet(target).count() == 2
    assert spark.read.parquet(old2).count() == 9
    versions = sorted(os.listdir(target + ".versions"))
    assert len(versions) == 2  # v1 garbage-collected


def test_read_parquet_evolving_merges_schemas(spark, tmp_path):
    from p6__mapreduce_spark.sources.readers import read_parquet_evolving

    root = str(tmp_path / "evolving")
    spark.range(3).selectExpr("id").write.parquet(root + "/batch=1")
    spark.range(3).selectExpr("id", "id * 2 AS extra").write.parquet(root + "/batch=2")
    df = read_parquet_evolving(spark, root)
    assert set(df.columns) == {"id", "extra", "batch"}
    rows = df.orderBy("batch", "id").collect()
    assert all(r.extra is None for r in rows if r.batch == 1)  # pre-evolution files -> NULL
    assert any(r.extra == 4 for r in rows if r.batch == 2)


def test_read_json_quarantines_corrupt_records(spark, tmp_path):
    from p6__mapreduce_spark.sources.readers import read_json

    p = tmp_path / "data.jsonl"
    p.write_text('{"k": 1, "v": "a"}\n{BROKEN\n{"k": 2, "v": "b"}\n')
    schema = "k long, v string, _corrupt_record string"
    # Spark disallows projecting ONLY _corrupt_record off the raw scan
    # (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — materialize first
    df = read_json(spark, str(p), schema=schema, keep_corrupt=True).cache()
    good = df.filter("_corrupt_record IS NULL")
    bad = df.filter("_corrupt_record IS NOT NULL")
    assert good.count() == 2 and bad.count() == 1
    assert bad.collect()[0]._corrupt_record.startswith("{BROKEN")


def test_python_datasource_numbered_lines(spark, tmp_path):
    # Spark-4 Python DataSource API: per-file sequential line numbers —
    # the thing byte-range text splits cannot provide
    a, b = tmp_path / "a.txt", tmp_path / "b.txt"
    a.write_text("x\ny\nz\n")
    b.write_text("q\n")
    from p6__mapreduce_spark.sources.pyds import read_numbered_lines

    df = read_numbered_lines(spark, [str(a), str(b)])
    rows = {(r.file.split("/")[-1], r.line_no): r.line for r in df.collect()}
    assert rows == {
        ("a.txt", 1): "x", ("a.txt", 2): "y", ("a.txt", 3): "z",
        ("b.txt", 1): "q",
    }
    # parallelism = files: exactly 2 partitions
    assert df.rdd.getNumPartitions() == 2
    # registration is idempotent
    assert read_numbered_lines(spark, str(a)).count() == 3


def test_observed_write_collects_metrics_in_one_job(spark, tmp_path):
    # df.observe: QA counters ride the write job's tasks — no second scan
    from p6__mapreduce_spark.sources.sinks import write_parquet_observed

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, None)], "id long, v string"
    )
    out = str(tmp_path / "observed")
    metrics = write_parquet_observed(df, out, null_check_cols=["v"])
    assert metrics == {"row_count": 4, "nulls_v": 2}
    # the write itself is intact
    assert spark.read.parquet(out).count() == 4


def test_time_travel_read_over_publish_history(spark, tmp_path):
    from p6__mapreduce_spark.sources.sinks import (
        publish_parquet_atomic,
        published_versions,
        read_published,
    )

    path = str(tmp_path / "dataset")
    v1 = spark.createDataFrame([(1, "old")], "id long, v string")
    v2 = spark.createDataFrame([(1, "new"), (2, "new")], "id long, v string")
    publish_parquet_atomic(v1, path, keep_versions=2)
    publish_parquet_atomic(v2, path, keep_versions=2)
    assert published_versions(path) == [1, 2]
    # live read = latest; explicit versions readable; GC'd raises
    assert read_published(spark, path).count() == 2
    assert {r.v for r in read_published(spark, path, version=1).collect()} == {"old"}
    v3 = spark.createDataFrame([(9, "x")], "id long, v string")
    publish_parquet_atomic(v3, path, keep_versions=2)  # GCs v1
    assert published_versions(path) == [2, 3]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="available"):
        read_published(spark, path, version=1)
