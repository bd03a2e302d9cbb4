"""SparkSession factory with scale-aware defaults.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads); the
same configs are what we would ship to a 1000-executor cluster: AQE on
(runtime coalescing + skew-join splitting), Arrow for every Python<->JVM
hop, UTC session time so results are zone-independent, and shuffle
parallelism sized to the environment instead of the legacy 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _cpus() -> int:
    try:
        return max(1, int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    except ValueError:
        return 32


def get_session(app_name: str = "p6__mapreduce_spark", *, shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) the engine session.

    On a real cluster the master/deploy settings come from spark-submit;
    everything below is cluster-safe: AQE re-plans shuffles at runtime
    (coalesce small partitions, split skewed ones), broadcast threshold
    stays at Spark's default so Catalyst auto-broadcasts dimension
    tables, and Arrow keeps pandas-UDF exchange columnar.
    """
    cpus = _cpus()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # Scan split size. Default 128 MB (Spark's own default, right
        # for the driver bench and cluster scans); the env override
        # exists for the scaling probes (tools/scale_gen.py datasets
        # are single snappy files of a few MB — at 128 MB every corpus
        # map stage collapses to ONE task and core-count scaling
        # measurements read ≈1 by construction; r10 verdict item 6).
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "134217728"),
        )
        # read TIMESTAMP(NANOS) parquet columns as raw nanos longs
        # (Spark has no nanos timestamp type); readers convert to micros
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # parquet timestamp[us] without isAdjustedToUTC must read as
        # TIMESTAMP, not TIMESTAMP_NTZ: watermarks/unix_micros need an
        # instant type, and with the session pinned to UTC the two are
        # value-identical
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark-graft-warehouse"),
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
