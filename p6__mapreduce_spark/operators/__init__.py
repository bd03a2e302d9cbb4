from p6__mapreduce_spark.operators.core import (
    distinct_sorted,
    line_count,
    range_bucket_sort,
)
from p6__mapreduce_spark.operators.mapreduce import MapReduceJob, mr_run

__all__ = [
    "line_count",
    "distinct_sorted",
    "range_bucket_sort",
    "mr_run",
    "MapReduceJob",
]
