"""Streaming deduplication — Structured Streaming dropDuplicates.

The streaming twin of ``dedup.exact``: a continuously-ingesting
pipeline drops rows whose key it has already seen. State is one entry
per distinct key (here: the projected key columns only, so the state
row is tiny); on a real cluster the same plan runs against Kafka with
``dropDuplicatesWithinWatermark`` when keys are time-bounded.

The runner stages the input parquet TWICE and forces one file per
micro-batch, so duplicates genuinely arrive across batch boundaries
and survive only if the dedup state works — a single-batch run would
pass trivially.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

from p6__mapreduce_spark.streaming.partitions import stream_partitions


def run_streaming_dedup(
    spark: SparkSession,
    events_parquet: str,
    keys: tuple[str, ...] = ("user_id", "event_type"),
) -> DataFrame:
    """Distinct ``keys`` tuples of the event stream, computed by a real
    Structured Streaming query (file source, 1 file per micro-batch,
    append-mode memory sink, input duplicated across batches).

    Output equals batch ``SELECT DISTINCT`` over the same columns, so
    the query shares a plain SQL oracle.
    """
    src = tempfile.mkdtemp(prefix="p6_stream_dedup_")
    shutil.copy(events_parquet, os.path.join(src, "batch_a.parquet"))
    shutil.copy(events_parquet, os.path.join(src, "batch_b.parquet"))
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # pragma: no cover - conf locked down
        pass
    schema = spark.read.parquet(events_parquet).schema
    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force cross-batch dedup state
        .parquet(src)
        .select(*keys)
        .dropDuplicates(list(keys))
    )
    with stream_partitions(spark, src):  # volume-derived state partitions
        query = (
            stream.writeStream.outputMode("append").format("memory").queryName(name).start()
        )
        try:
            query.processAllAvailable()
        finally:
            query.stop()
            # the memory sink owns the rows once the run finishes; keeping
            # the staged parquet copies would leak 2x the input per call
            shutil.rmtree(src, ignore_errors=True)
    out = spark.sql(f"SELECT * FROM {name}")  # noqa: S608 - generated name
    return out.orderBy(*keys)


def run_streaming_dedup_ttl(
    spark: SparkSession,
    events_parquet: str,
    keys: tuple[str, ...] = ("event_id",),
    delay: str = "24 hours",
) -> DataFrame:
    """``dropDuplicatesWithinWatermark`` (Spark 3.5+): the state-TTL
    variant of streaming dedup — the form that actually survives an
    unbounded stream. Plain ``dropDuplicates`` keeps one state row per
    key FOREVER (state grows with distinct keys seen, unbounded at
    100 TB/day); the within-watermark variant evicts a key's state
    once the watermark passes its event time + delay, so state is
    bounded by the key arrival rate inside one watermark window.

    Duplicates here arrive across FORCED micro-batch boundaries with
    identical event times, i.e. well inside the watermark delay, so
    the guaranteed-dedup path is what's exercised: the output equals
    batch DISTINCT over the same columns (asserted by the caller).
    Returns the deduplicated (keys..., ts) rows; the caller can also
    inspect ``query.lastProgress`` — this runner stores the final
    progress dict on the returned DataFrame's ``_ttl_progress``
    attribute — to see the dedupeWithinWatermark state operator and
    its watermark actually engaged.
    """
    src = tempfile.mkdtemp(prefix="p6_stream_dedup_ttl_")
    shutil.copy(events_parquet, os.path.join(src, "batch_a.parquet"))
    shutil.copy(events_parquet, os.path.join(src, "batch_b.parquet"))
    schema = spark.read.parquet(events_parquet).schema
    name = f"stream_dedup_ttl_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .select(*keys, "ts")
        .withWatermark("ts", delay)
        .dropDuplicatesWithinWatermark(list(keys))
    )
    query = (
        stream.writeStream.outputMode("append").format("memory").queryName(name).start()
    )
    try:
        query.processAllAvailable()
        progress = query.lastProgress
    finally:
        query.stop()
        shutil.rmtree(src, ignore_errors=True)
    out = spark.sql(f"SELECT * FROM {name}")  # noqa: S608 - generated name
    out = out.orderBy(*keys)
    out._ttl_progress = progress  # type: ignore[attr-defined]
    return out
