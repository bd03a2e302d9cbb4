"""Sources.

The reference's only source is newline-delimited text files named on the
command line (``map___reduce/mapreduce.c:156-186`` builds the file queue
from argv; ``wordcount.c:9-21`` reads line-by-line). Multiple files are a
work queue feeding one shared partition set, i.e. an implicit UNION ALL
(``mapreduce.c:108-124``). Spark's ``read.text`` over a path list gives
both behaviors natively, with splits scheduled per task instead of a
mutex-guarded file counter.

Parquet/JSON/CSV readers are the engine's scale-path sources (columnar
scan, predicate pushdown, partition pruning — none of which the
reference had).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_lines(spark: SparkSession, paths: str | Sequence[str]) -> DataFrame:
    """Text-file scan (reference O1) + multi-file UNION ALL (O2).

    One ``value: string`` row per line; a list of paths is read as a
    single dataset exactly like the reference's shared file queue.
    """
    if isinstance(paths, str):
        paths = [paths]
    return spark.read.text(list(paths))


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_parquet_evolving(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan across partitions written under EVOLVING schemas
    (columns added over time): ``mergeSchema`` reconciles per-file
    footers into the union schema; files predating a column yield NULL.

    Off by default in Spark because footer-merging costs a driver pass
    over file metadata — use this reader only for datasets known to
    evolve; pin the final schema once evolution stops.
    """
    return spark.read.option("mergeSchema", "true").parquet(path)


def read_json(spark: SparkSession, path: str, schema=None, *, keep_corrupt: bool = False) -> DataFrame:
    """JSON-lines scan. With ``keep_corrupt``, malformed rows land in a
    ``_corrupt_record`` column instead of poisoning the job (PERMISSIVE
    mode) — at 100 TB of crawled data some records are ALWAYS broken,
    and a fail-fast read of a petabyte that dies at 99% is the
    expensive way to find that out. Filter
    ``_corrupt_record IS NOT NULL`` into a quarantine sink and keep the
    pipeline moving. (Spark refuses a query that projects ONLY the
    corrupt column off the raw scan — write/cache the parsed frame
    first, then split good/quarantine from the materialized result.)
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if keep_corrupt:
        reader = reader.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", "_corrupt_record"
        )
    return reader.json(path)


def read_csv(spark: SparkSession, path: str, schema=None, *, header: bool = True) -> DataFrame:
    """CSV scan. Always pass an explicit schema in production — schema
    inference is a full extra pass over the data (prohibitive at scale)."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_orc(spark: SparkSession, path: str | Sequence[str]) -> DataFrame:
    """ORC scan — Spark-native columnar source with the same pushdown /
    pruning behavior as parquet (vectorized reader, PushedFilters reach
    the stripe level). No extra jars: ORC support ships in Spark core."""
    paths = [path] if isinstance(path, str) else list(path)
    return spark.read.orc(*paths)


def parquet_stats(spark: SparkSession, path: str, cols: Sequence[str] = ()) -> list:
    """COUNT(*) + per-column MIN/MAX answered from parquet FOOTER
    metadata — no data pages read at all. At 100 TB this is the
    difference between an O(files) metadata pass and a full scan for
    profiling/row-count/watermark-bound questions.

    Mechanics: Spark's aggregate pushdown (PushedAggregation in the
    scan) only exists on the DSv2 parquet reader, so the session is
    temporarily flipped to v2-parquet + aggregatePushdown for THIS
    plan and restored after (the confs only affect plan *creation*, so
    scoping them around the collect is safe in a shared session).
    MIN/MAX is limited to types whose parquet stats are trustworthy
    (ints/longs/doubles/strings — notably NOT timestamps); the caller
    picks ``cols`` accordingly. Returns the collected 1-row result."""
    from pyspark.sql import functions as F

    old_v1 = spark.conf.get("spark.sql.sources.useV1SourceList")
    old_agg = spark.conf.get("spark.sql.parquet.aggregatePushdown")
    try:
        spark.conf.set("spark.sql.sources.useV1SourceList", "avro,csv,json,kafka,orc,text")
        spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
        aggs = [F.count(F.lit(1)).alias("row_count")]
        for c in cols:
            aggs.append(F.min(c).alias(f"min_{c}"))
            aggs.append(F.max(c).alias(f"max_{c}"))
        return spark.read.parquet(path).agg(*aggs).collect()
    finally:
        spark.conf.set("spark.sql.sources.useV1SourceList", old_v1)
        spark.conf.set("spark.sql.parquet.aggregatePushdown", old_agg)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic benchmark table from a scale-factor directory.

    The events table stores ts as parquet TIMESTAMP(NANOS), which Spark
    reads as a nanos long (``spark.sql.legacy.parquet.nanosAsLong``);
    convert to a proper microsecond timestamp here so downstream
    operators see a TimestampType column.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    # Defensive session conf: the caller may pass a session built
    # elsewhere (the driver harness does). Nanos-timestamp parquet needs
    # the legacy long read, and oracle comparison assumes UTC semantics
    # for timestamp literals. Both are runtime-settable SQL confs.
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # timestamp[us] parquet (no isAdjustedToUTC) must come back as
        # TIMESTAMP, not NTZ — watermarks reject NTZ; UTC session makes
        # the two value-identical
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    except Exception:  # pragma: no cover - conf locked down
        pass

    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # integer DIV: float division would lose precision on e18 nanos
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: Sequence[str] = TPCH_TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}
