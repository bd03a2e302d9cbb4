"""Skew-mitigation helpers.

Spark's AQE already splits skewed JOIN partitions
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py) and plain
aggregations are protected by map-side partial aggregation. The
remaining hot spot at 100 TB is a *distinct-style* aggregation on a
skewed key (partial aggs can't combine distinct sets): salting splits
each hot key across ``n_salts`` sub-keys, aggregates the salted key,
then combines — two small shuffles instead of one skewed one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16, col_name: str = "_salt") -> DataFrame:
    """Deterministic per-row salt in [0, n_salts): derived by hashing the
    whole row (no rand() — keeps plans re-executable/deterministic,
    which retries and speculative tasks require)."""
    return df.withColumn(
        col_name, F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )


def salted_count_distinct(
    df: DataFrame, key: str, value: str, n_salts: int = 16
) -> DataFrame:
    """COUNT(DISTINCT value) GROUP BY key, skew-safe.

    Phase 1 shuffles on (key, salt(value)) — a hot key spreads over
    n_salts reducers, and the distinct dedup happens there. Phase 2
    shuffles the already-deduplicated counts on key alone.
    """
    salted = df.withColumn("_salt", F.pmod(F.hash(F.col(value)), F.lit(n_salts)))
    phase1 = salted.groupBy(key, "_salt").agg(
        F.count_distinct(F.col(value)).alias("_partial")
    )
    return phase1.groupBy(key).agg(F.sum("_partial").alias("n_distinct"))
