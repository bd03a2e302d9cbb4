"""Volume-derived shuffle/state-store partitioning for streaming runs.

Structured Streaming sizes its state store by `spark.sql.shuffle.
partitions` AT QUERY START (AQE is disabled for streaming, so nothing
re-coalesces at runtime). The engine session pins shuffle partitions
to the core count — right for the batch queries whose exchanges AQE
re-sizes, but for the protocol runners it means every micro-batch
schedules `cores` state tasks and rewrites `cores` state files no
matter how small the batch: at sf0.1 that is 32 state partitions for
single-digit-MB inputs across dozens of forced micro-batches, pure
scheduler + state-file overhead (r10 verdict item 4).

The rule here derives the count from the INPUT VOLUME the stream will
ingest, the same way a batch stage sizes partitions from bytes (guide
§2.2 "fewer, larger partitions", §6 input split sizing):

    partitions = clamp(ceil(input_bytes / 32 MB), 1, 4 * default_parallelism)

Both bounds are environment-shaped, not local constants: the 32 MB
target is the per-state-partition ingest volume (state for these
runners is a bounded reduction of the input), and the cap scales with
the cluster (4 tasks per core keeps every core fed once batches are
large enough to matter). On a 1000-executor cluster ingesting TBs the
rule saturates the cap — identical behavior to today's config — while
a small replay gets the handful of partitions its volume justifies.

Results are partition-count independent (keyed aggregations /
stream-stream joins / keyed state), which the DuckDB oracles verify
every round.
"""

from __future__ import annotations

import math
import os
from contextlib import contextmanager

from pyspark.sql import SparkSession

_TARGET_BYTES = 32 << 20  # ~32 MB of ingested input per state partition


def _input_bytes(path: str) -> int:
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def stream_shuffle_partitions(spark: SparkSession, *paths: str) -> int:
    """Partition count for a streaming query ingesting ``paths``."""
    nbytes = sum(_input_bytes(p) for p in paths)
    cap = 4 * spark.sparkContext.defaultParallelism
    return max(1, min(cap, math.ceil(nbytes / _TARGET_BYTES)))


def set_stream_partitions(spark: SparkSession, *paths: str) -> str:
    """Imperative form of :func:`stream_partitions` for runners whose
    start/stop region is already deeply nested: sets the volume-derived
    count and returns the previous session value for the paired
    :func:`restore_stream_partitions` in the runner's ``finally``."""
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    spark.conf.set(key, str(stream_shuffle_partitions(spark, *paths)))
    return old


def restore_stream_partitions(spark: SparkSession, old: str) -> None:
    spark.conf.set("spark.sql.shuffle.partitions", old)


@contextmanager
def stream_partitions(spark: SparkSession, *paths: str):
    """Scope `spark.sql.shuffle.partitions` to a volume-derived count
    for the duration of one streaming run; restores the session value
    afterwards (batch queries keep the AQE-managed session setting).
    The conf is read by the stream at start(), so the whole
    start→processAllAvailable→stop region must sit inside."""
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    spark.conf.set(key, str(stream_shuffle_partitions(spark, *paths)))
    try:
        yield
    finally:
        spark.conf.set(key, old)
