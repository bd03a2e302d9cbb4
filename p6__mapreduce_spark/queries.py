"""Query registry: every implemented operator exposed as a (spark,
sf_dir) -> DataFrame callable plus, where SQL-expressible, a DuckDB
oracle string over the pre-registered table views (region nation
customer supplier part orders lineitem events documents embeddings).

Reference parity queries map SURVEY.md §2's operator inventory onto the
synthetic star schema per FIXTURES.md: "lines" are string projections of
key columns (F1), token streams come from documents.text (F2), and the
multi-file union fixture (F3) is a union of per-table projections.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from p6__mapreduce_spark.operators.core import distinct_sorted, line_count, range_bucket_sort
from p6__mapreduce_spark.operators.mapreduce import mr_run, sort_job, wordcount_job
from p6__mapreduce_spark.sources.readers import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Reference parity (SURVEY.md §2): wordcount / sort / union / facade
# ---------------------------------------------------------------------------


@register(
    "wordcount_lines",
    oracle="""
    SELECT CAST(o_custkey AS VARCHAR) AS key, COUNT(*) AS cnt
    FROM orders GROUP BY 1 ORDER BY 1
    """,
)
def q_wordcount_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O8 line_count: per-line frequency, whole line is the key (wordcount.c:35-39)."""
    lines = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").cast("string").alias("value"))
    return line_count(lines)


@register(
    "wordcount_union",
    oracle="""
    SELECT key, COUNT(*) AS cnt FROM (
      SELECT CAST(l_orderkey AS VARCHAR) AS key FROM lineitem
      UNION ALL
      SELECT CAST(o_orderkey AS VARCHAR) AS key FROM orders
    ) GROUP BY 1 ORDER BY 1
    """,
)
def q_wordcount_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 multi-file UNION ALL feeding one shared aggregation (mapreduce.c:108-124)."""
    a = load_table(spark, sf_dir, "lineitem").select(F.col("l_orderkey").cast("string").alias("value"))
    b = load_table(spark, sf_dir, "orders").select(F.col("o_orderkey").cast("string").alias("value"))
    return line_count(a.unionAll(b))


@register(
    "distinct_sorted",
    oracle="""
    SELECT DISTINCT CAST(l_partkey AS VARCHAR) AS key
    FROM lineitem ORDER BY 1
    """,
)
def q_distinct_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O9 sort query, P=1: DISTINCT + byte-wise global order (sort.c:22-28)."""
    lines = load_table(spark, sf_dir, "lineitem").select(F.col("l_partkey").cast("string").alias("value"))
    return distinct_sorted(lines)


@register(
    "range_bucket_sort",
    oracle="""
    SELECT (CAST(key AS BIGINT) & 4294967295) >> 29 AS bucket, key
    FROM (SELECT DISTINCT CAST(l_orderkey AS VARCHAR) AS key FROM lineitem)
    ORDER BY 1, 2
    """,
)
def q_range_bucket_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5+O9 sort query P=8: uint32-top-bits bucket then byte-wise order
    (MR_SortedPartition, mapreduce.c:229-258; tests/11.out semantics)."""
    lines = load_table(spark, sf_dir, "lineitem").select(F.col("l_orderkey").cast("string").alias("value"))
    return range_bucket_sort(lines, num_partitions=8)


@register(
    "mr_facade_wordcount",
    oracle="""
    SELECT CAST(o_custkey AS VARCHAR) AS key, CAST(COUNT(*) AS VARCHAR) AS out
    FROM orders GROUP BY 1 ORDER BY 1
    """,
)
def q_mr_facade_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O10 MR_Run facade running the wordcount client end-to-end
    (mapreduce.h:17-20): mapInPandas map -> hash repartition ->
    applyInPandas reduce."""
    lines = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").cast("string").alias("value"))
    return mr_run(spark, lines, wordcount_job(num_partitions=8)).select("key", "out")


@register(
    "mr_facade_sort",
    oracle="""
    SELECT key, key AS out
    FROM (SELECT DISTINCT CAST(l_suppkey AS VARCHAR) AS key FROM lineitem)
    ORDER BY (CAST(key AS BIGINT) & 4294967295) >> 30, key
    """,
)
def q_mr_facade_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O10 facade running the sort client: range partitioner + distinct
    (sort.c:9-36). Output = (key, out=key) like the reducer's print."""
    lines = load_table(spark, sf_dir, "lineitem").select(F.col("l_suppkey").cast("string").alias("value"))
    return mr_run(spark, lines, sort_job(num_partitions=4)).select("key", "out")
