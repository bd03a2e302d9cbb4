"""Replay the reference's OWN 25-test golden suite against this engine.

Each ``tests/N.run`` in the reference repo invokes ``./sort`` or
``./wordcount`` over ``tests/*.txt`` inputs and diffs stdout (sort) or
the parser-canonicalized output (wordcount) against ``tests/N.out``.
Here the same input files (read-only; data, not code) drive
``clients.sort_unique`` / ``clients.wordcount`` and the engine output
is compared to the same golden files byte-for-byte.

Thread counts (M, R) in the .run lines are scheduling parameters with
no observable output effect (the parser's tid checks aside, replaced by
partition-invariance tests elsewhere); P (num_partitions) IS observable
for sort and is honored.
"""

from __future__ import annotations

import re
from pathlib import Path

import pytest

from p6__mapreduce_spark.clients import sort_unique, wordcount

TESTS_DIR = Path("/root/reference/map___reduce/tests")


def parse_run(n: int):
    line = (TESTS_DIR / f"{n}.run").read_text().strip()
    m = re.match(r"\./(sort|wordcount)\s+((?:tests/\S+\.txt\s+)+)(\d+)\s+(\d+)\s+(\d+)", line)
    assert m, f"unparsed run line: {line}"
    prog = m.group(1)
    files = [str(TESTS_DIR / Path(p).name) for p in m.group(2).split()]
    num_partitions = int(m.group(5))
    return prog, files, num_partitions


def golden(n: int) -> list[str]:
    return (TESTS_DIR / f"{n}.out").read_text().splitlines()


ALL_TESTS = [n for n in range(1, 26) if (TESTS_DIR / f"{n}.run").exists()]


@pytest.mark.parametrize("n", ALL_TESTS)
def test_reference_golden(spark, n):
    prog, files, p = parse_run(n)
    if prog == "sort":
        got = [r.key for r in sort_unique(spark, files, num_partitions=p).collect()]
    else:
        got = [f"{r.key} {r.cnt}" for r in wordcount(spark, files, p).collect()]
    assert got == golden(n), f"reference test {n} ({prog}, P={p}) diverged"
