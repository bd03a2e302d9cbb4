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
