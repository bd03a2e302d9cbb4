"""SQL API surface: run the engine over ANSI SQL.

Registers the synthetic star schema as temp views so users can express
queries in SQL; Catalyst produces the same plans as the DataFrame
operators (asserted in tests). This is the third entry point alongside
the DataFrame operators and the MapReduce facade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from p6__mapreduce_spark.sources.readers import TPCH_TABLES, load_table


def register_tables(spark: SparkSession, sf_dir: str, names=TPCH_TABLES) -> None:
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def sql(spark: SparkSession, query: str) -> DataFrame:
    return spark.sql(query)
