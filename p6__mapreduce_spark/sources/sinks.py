"""Sinks.

The reference's only sink is lines printed to stdout by the Reducer
(``wordcount.c:39``, ``sort.c:27``). ``collect_lines`` reproduces that
(driver-side, test/demo use only — never on the 100 TB path);
``write_parquet`` is the engine's real distributed sink.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def collect_lines(df: DataFrame, sep: str = " ") -> list[str]:
    """Render each row as a space-joined text line (reference stdout shape).

    Driver-side materialization — only for golden-file tests at test
    scale, mirroring how the reference's stdout was diffed against
    ``tests/*.out``.
    """
    return [sep.join("" if v is None else str(v) for v in row) for row in df.collect()]


def write_parquet(df: DataFrame, path: str, *, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    num_buckets: int = 32,
    *,
    sort_key: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: later equi-joins/aggregations on
    ``bucket_key`` between tables with matching bucketing read
    co-located buckets and skip the shuffle entirely — the 100 TB
    answer to repeated joins on the same key (pay the shuffle once at
    write time, never again at read time).
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_key)
    if sort_key:
        writer = writer.sortBy(sort_key)
    writer.saveAsTable(table)


def publish_parquet_atomic(df: DataFrame, path: str, *, partition_by: list[str] | None = None) -> str:
    """All-or-nothing batch publish: write to a staging directory
    beside the target, then swap it in with directory renames.

    Readers of ``path`` never observe a half-written dataset: they see
    the complete old version until the rename, then the complete new
    one (rename is atomic on POSIX filesystems and HDFS; on object
    stores use a manifest/lakehouse format instead — see
    ``lakehouse.read_table_format``). A failed job leaves the target
    untouched and only a ``<path>.staging`` directory to garbage-collect;
    re-running the job is idempotent. This is the poor-man's
    transactional commit underlying every lakehouse format's v0.

    Returns the path of the previous version (``<path>.old``) so the
    caller can retain or delete it.
    """
    import shutil

    staging = path + ".staging"
    old = path + ".old"
    shutil.rmtree(staging, ignore_errors=True)
    writer = df.write.mode("errorifexists")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)
    # swap: current -> .old, staging -> current
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(staging, path)
    return old
