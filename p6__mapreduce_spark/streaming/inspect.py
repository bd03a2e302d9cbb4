"""Streaming state-store observability (Spark 4 statestore reader).

Debugging a production streaming job means answering "what is in the
state right now?" without stopping the query or adding printlns. Spark
4 ships a batch read format for exactly this: ``spark.read.format(
"statestore").load(checkpoint)`` materializes the keyed state of a
committed micro-batch as a DataFrame. This module wraps it with the
engine's conventions so checkpoint forensics compose with everything
else (joins against expected state, drift asserts in tests, ad-hoc
SQL over state).

At scale this reads the checkpoint's state files directly (one task
per state partition) — no interaction with the running query, no
state-sized driver memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_query_state(spark: SparkSession, checkpoint: str) -> DataFrame:
    """Raw keyed state of the latest committed micro-batch:
    (key struct, value struct, partition_id)."""
    return spark.read.format("statestore").load(checkpoint)


def state_key_counts(spark: SparkSession, checkpoint: str) -> DataFrame:
    """(partition_id, n_keys): how state is spread over partitions —
    the first question when a streaming job develops a hot state
    partition (skewed grouping keys)."""
    return (
        read_query_state(spark, checkpoint)
        .groupBy("partition_id")
        .agg(F.count(F.lit(1)).alias("n_keys"))
        .orderBy("partition_id")
    )
