from p6__mapreduce_spark.sources.readers import (
    load_table,
    load_tables,
    read_json,
    read_lines,
    read_parquet,
)
from p6__mapreduce_spark.sources.sinks import collect_lines, write_parquet

__all__ = [
    "read_lines",
    "read_parquet",
    "read_json",
    "load_table",
    "load_tables",
    "collect_lines",
    "write_parquet",
]
