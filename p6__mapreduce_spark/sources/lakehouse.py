"""Lakehouse table-format connectors (Delta / Iceberg / Hudi).

The format jars are not on this image's classpath, so each connector is
gated behind a capability probe: if the format is available it reads
through the normal `spark.read.format(...)` path (full pushdown /
time-travel options), otherwise it raises a clear error instead of a
cryptic ClassNotFoundException. The parquet sink plus `write_bucketed`
cover the durable-storage story in this environment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_FORMAT_PROBE_CLASSES = {
    "delta": "org.apache.spark.sql.delta.sources.DeltaDataSource",
    "iceberg": "org.apache.iceberg.spark.source.IcebergSource",
    "hudi": "org.apache.hudi.DefaultSource",
}


def format_available(spark: SparkSession, fmt: str) -> bool:
    """True if the format's DataSource class is on the JVM classpath."""
    cls = _FORMAT_PROBE_CLASSES.get(fmt)
    if cls is None:
        return False
    try:
        # Documented compatibility shim — the ONE private-internal use in
        # the package: there is no public PySpark API for "is this
        # DataSource class on the classpath?". Under Spark Connect
        # (_jvm absent) the AttributeError lands in the except and the
        # format reports unavailable, which is the safe default.
        spark._jvm.java.lang.Class.forName(cls)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def read_table_format(
    spark: SparkSession, fmt: str, path: str, *, options: dict[str, str] | None = None
) -> DataFrame:
    """Read a Delta/Iceberg/Hudi table, or fail with an actionable error.

    Options pass through (e.g. ``versionAsOf`` for Delta time travel,
    ``snapshot-id`` for Iceberg).
    """
    if fmt not in _FORMAT_PROBE_CLASSES:
        raise ValueError(f"unknown table format: {fmt!r}")
    if not format_available(spark, fmt):
        raise NotImplementedError(
            f"{fmt} jars are not on the classpath in this environment; "
            f"add the {fmt} Spark package to spark.jars.packages to enable "
            "this connector (the read path below is exercised as soon as "
            "the class probe passes)"
        )
    reader = spark.read.format(fmt)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load(path)
