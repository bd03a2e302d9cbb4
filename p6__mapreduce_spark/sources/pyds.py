"""Custom Python Data Source (Spark 4 DataSource API): numbered lines.

Spark's built-in text reader cannot emit stable line numbers: a file
is split into byte-range partitions, so no task knows how many lines
precede its range. This source fills that real gap with the Spark-4
Python DataSource API (pyspark.sql.datasource): ONE partition per
file (the unit that CAN be numbered sequentially), each task streaming
its file line-by-line and yielding (file, line_no, line).

Scale shape: parallelism = number of files — exactly how a 100 TB
text corpus is laid out (many files, bounded size each); memory per
task is one line (generator, no file-sized buffering). Filters/limits
still apply Spark-side; the source is batch-only by design (the
streaming counterpart of per-file processing is the file-source
Structured Streaming input, already covered by streaming/).

This is the engine's extension-point demonstration: the same API a
user would use to expose the reference's custom input layouts
(mapreduce.c:64-124 reads whole files line-by-line the same way)
without writing a JVM DataSourceV2.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType


class _FilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class LineNumberReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        paths = options.get("paths", options.get("path", ""))
        # the option travels as one comma-joined string (DSv2 options
        # are str->str); commas in paths are not supported here
        self._paths = [p for p in paths.split(",") if p]

    def partitions(self) -> Sequence[InputPartition]:
        # one partition per file: the unit that can be numbered
        return [_FilePartition(p) for p in sorted(self._paths)]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        with open(partition.path, encoding="utf-8") as fh:
            for i, line in enumerate(fh, start=1):
                yield (partition.path, i, line.rstrip("\n"))


class LineNumberDataSource(DataSource):
    """``spark.read.format("numbered_lines").option("paths", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "numbered_lines"

    def schema(self) -> str:
        return "file string, line_no long, line string"

    def reader(self, schema: StructType) -> LineNumberReader:
        return LineNumberReader(self.options)


def register_numbered_lines(spark) -> None:
    """Idempotent registration of the custom source on a session."""
    spark.dataSource.register(LineNumberDataSource)


def read_numbered_lines(spark, paths: str | Sequence[str]):
    """DataFrame of (file, line_no, line) with per-file sequential
    numbering — parallelism = |files|, memory = one line per task."""
    register_numbered_lines(spark)
    opt = paths if isinstance(paths, str) else ",".join(paths)
    return spark.read.format("numbered_lines").option("paths", opt).load()
