"""Sinks.

The reference's only sink is lines printed to stdout by the Reducer
(``wordcount.c:39``, ``sort.c:27``). ``collect_lines`` reproduces that
(driver-side, test/demo use only — never on the 100 TB path);
``write_parquet`` is the engine's real distributed sink.
"""

from __future__ import annotations

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
