"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship smoke query at sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2 +
driver extensions); each takes (spark, sf_dir) and returns a DataFrame.
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query key.

Column names are aliased identically on both sides; float aggregates are
computed via exact decimal sums (or exact integer division) so Spark and
DuckDB produce bit-identical doubles regardless of partial-aggregation
order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from p6__mapreduce_spark.queries import QUERIES, get_oracle_sql
from p6__mapreduce_spark.sources.readers import load_table


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: token wordcount over documents at sf0.001.

    Exercises the whole reference lifecycle (SURVEY.md §3): scan ->
    map/emit (token explode) -> shuffle on key -> aggregate -> global
    sort.
    """
    from pyspark.sql import functions as F

    from p6__mapreduce_spark.functions.text import tokens_expr

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    return (
        docs.select(F.explode(tokens_expr("text")).alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("key")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return get_oracle_sql()
