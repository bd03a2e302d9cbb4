"""The reference's two client programs, as engine entry points.

``wordcount`` (``map___reduce/wordcount.c``) and ``sort``
(``map___reduce/sort.c``) are what a user of the reference actually
runs; these functions are the drop-in equivalents over text files:

  wordcount f1.txt f2.txt M R P   ->  wordcount(spark, [f1, f2], P)
  sort f1.txt M 1 P               ->  sort_unique(spark, [f1], P)

Thread counts (M, R) have no meaning on Spark (the scheduler owns
parallelism) and are accepted/ignored by ``MR_Run`` for API parity.

Both declarative fast paths and the generic facade produce identical
results (tests/test_clients.py); the declarative forms are the default
because Catalyst plans them (partial aggregation, AQE) with no Python
in the data path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from p6__mapreduce_spark.operators.core import distinct_sorted, line_count, range_bucket_sort
from p6__mapreduce_spark.sources.readers import read_lines


def wordcount(spark: SparkSession, paths: str | Sequence[str], num_partitions: int = 0) -> DataFrame:
    """Per-line frequency over text files; output key-ascending —
    the post-``wordcount_parser.py`` canonical form (`key cnt` rows).

    num_partitions is accepted for CLI parity; partition placement is
    unobservable in wordcount output (SURVEY.md §2.3#6).
    """
    return line_count(read_lines(spark, paths))


def sort_unique(spark: SparkSession, paths: str | Sequence[str], num_partitions: int = 1) -> DataFrame:
    """Distinct lines in the reference sort's global output order:
    byte-wise ascending for P=1, (uint32-top-bits bucket, byte-wise)
    for P>1 (``tests/11.out`` semantics)."""
    lines = read_lines(spark, paths)
    if num_partitions <= 1:
        return distinct_sorted(lines)
    return range_bucket_sort(lines, num_partitions=num_partitions).select("key")


def _main(argv: list[str]) -> int:
    """CLI mirroring the reference binaries' argv contract
    (``wordcount.c:42-51``: files... then num_mappers num_reducers
    num_partitions as the LAST THREE arguments; thread counts ignored).

        python -m p6__mapreduce_spark.clients wordcount f1.txt f2.txt 4 2 2
        python -m p6__mapreduce_spark.clients sort f1.txt 5 1 8
    """
    from p6__mapreduce_spark.session import get_session

    if len(argv) < 5:
        print("usage: clients (wordcount|sort) FILE... M R P", flush=True)
        return 2
    prog, *rest = argv
    files, (_m, _r, p) = rest[:-3], rest[-3:]
    spark = get_session(f"client-{prog}")
    if prog == "wordcount":
        rows = wordcount(spark, files, int(p)).collect()
        for row in rows:
            print(f"{row.key} {row.cnt}")
    elif prog == "sort":
        for row in sort_unique(spark, files, int(p)).collect():
            print(row.key)
    else:
        print(f"unknown client: {prog}", flush=True)
        return 2
    return 0


if __name__ == "__main__":  # pragma: no cover - exercised via subprocess test
    import sys

    raise SystemExit(_main(sys.argv[1:]))
