"""Reference-parity core operators (SURVEY.md §2 O1-O11), Spark-first.

Each operator is a declarative DataFrame transform: Catalyst handles
partial aggregation, shuffle planning, and pushdown; AQE coalesces or
splits shuffle partitions at runtime. Nothing here collects to the
driver, holds driver-side state, or assumes a partition count — all
scale axes (input splits, shuffle width, sort) are Spark-managed, so the
same plans run unchanged on a 1000-executor cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from p6__mapreduce_spark.functions.buckets import uint32_range_bucket


def line_count(df: DataFrame, key: str | Column = "value", *, key_name: str = "key", count_name: str = "cnt") -> DataFrame:
    """Per-key frequency count — the reference's ``wordcount`` query.

    Reference semantics (SURVEY.md §2 O8, ``wordcount.c:35-39``): key is
    the whole line (not tokenized), count = SUM of emitted "1"s, output
    canonically ordered by key ascending (``wordcount_parser.py:40-41``).

    Physical plan: scan -> partial HashAggregate -> exchange on key ->
    final HashAggregate -> sort. The partial agg is the map-side combine
    the reference never had (it shuffled every emitted pair).
    """
    key_col = F.col(key) if isinstance(key, str) else key
    return (
        df.select(key_col.alias(key_name))
        .groupBy(key_name)
        .agg(F.count(F.lit(1)).alias(count_name))
        .orderBy(key_name)
    )


def distinct_sorted(df: DataFrame, key: str | Column = "value", *, key_name: str = "key") -> DataFrame:
    """DISTINCT + global ORDER BY — the reference's ``sort`` query, P=1.

    Byte-wise (strcmp) ascending order (SURVEY.md §2.3#1): Spark's
    default UTF8_BINARY string ordering matches C strcmp for the
    ASCII test domain. Dedup verified against ``tests/1.out`` semantics
    (9,999 in / 6,293 distinct out).

    Physical plan: scan -> partial HashAggregate(distinct) -> range
    exchange -> sort. Global order comes from Spark's range partitioner,
    the scalable replacement for the reference's single reducer thread.
    """
    key_col = F.col(key) if isinstance(key, str) else key
    return df.select(key_col.alias(key_name)).distinct().orderBy(key_name)


def range_bucket_sort(
    df: DataFrame,
    key: str | Column = "value",
    num_partitions: int = 4,
    *,
    key_name: str = "key",
    bucket_name: str = "bucket",
) -> DataFrame:
    """DISTINCT + (range-bucket, key) global order — ``sort`` with P>1.

    Reproduces the observable output order of ``MR_SortedPartition``
    (``map___reduce/mapreduce.c:229-258``): bucket = top ceil(log2(P))
    bits of uint32(atoi(key)), ordered bucket-major then byte-wise by
    key (verified semantics of ``tests/11.out``, where 3333333333 —
    uint32 top bits 3 — prints after 75687785, bucket 0). The bucket is
    an ordinary column expression, so it both orders the output and
    remains usable as an explicit repartition key.
    """
    key_col = F.col(key) if isinstance(key, str) else key
    return (
        df.select(key_col.alias(key_name))
        .distinct()
        .withColumn(bucket_name, uint32_range_bucket(key_name, num_partitions).cast("long"))
        .orderBy(bucket_name, key_name)
        .select(bucket_name, key_name)
    )
