"""Golden tests porting the reference's 25-test CLI matrix (SURVEY.md §5).

Expected outputs are computed from first principles (Counter /
sorted-set / uint32 bucket model) exactly as the reference's golden
files were; thread-count assertions become partition-invariance checks.
"""

from __future__ import annotations

from collections import Counter

import pytest

from p6__mapreduce_spark.operators.core import distinct_sorted, line_count, range_bucket_sort
from p6__mapreduce_spark.operators.mapreduce import mr_run, sort_job, wordcount_job
from p6__mapreduce_spark.sources.readers import read_lines
from tests import conftest as fx


def u32_bucket(key: str, p: int) -> int:
    """Python model of MR_SortedPartition (mapreduce.c:229-258)."""
    if p == 1:
        return 0
    bits = (p - 1).bit_length()
    try:
        v = int(key)
    except ValueError:
        v = 0
    return (v & 0xFFFFFFFF) >> (32 - bits)


# --- sort path (tests/1-3, 5-8, 11-12, 21-24 analogs) ----------------------

@pytest.mark.parametrize("gen", [fx.f1_tiny, fx.f1_sorted, fx.f1_reverse, fx.f1_medium])
def test_distinct_sorted_matches_c_sort_u(spark, gen):
    lines = gen()
    got = [r.key for r in distinct_sorted(fx.lines_df(spark, lines)).collect()]
    assert got == sorted(set(lines))  # python str sort == strcmp for ASCII


@pytest.mark.parametrize("p", [2, 4, 8])
@pytest.mark.parametrize("gen", [fx.f1_tiny, fx.f1_medium])
def test_range_bucket_sort_order(spark, gen, p):
    lines = gen()
    got = [(r.bucket, r.key) for r in range_bucket_sort(fx.lines_df(spark, lines), num_partitions=p).collect()]
    want = sorted({(u32_bucket(k, p), k) for k in lines})
    assert got == want


def test_uint32_wrap_lands_in_top_bucket(spark):
    # tests/11.out semantics: 3333333333 (uint32 top-2-bits = 3) sorts after
    # byte-wise-larger keys in lower buckets
    got = [r.key for r in range_bucket_sort(fx.lines_df(spark, fx.f1_tiny()), num_partitions=4).collect()]
    assert got == ["1000000000", "42", "7", "3333333333"]


# --- wordcount path (tests/4, 9-10, 13-20, 25 analogs) ----------------------

@pytest.mark.parametrize("gen", [fx.f1_medium, fx.f2_words])
def test_line_count_matches_counter(spark, gen):
    lines = gen()
    got = [(r.key, r.cnt) for r in line_count(fx.lines_df(spark, lines)).collect()]
    assert got == sorted(Counter(lines).items())


def test_line_count_byte_order_uppercase_first(spark):
    # tests/4.out: 'Venus' sorts before 'abuse' (byte-wise, not locale)
    got = [r.key for r in line_count(fx.lines_df(spark, ["abuse", "Venus", "abuse"])).collect()]
    assert got == ["Venus", "abuse"]


def test_multifile_union(spark, tmp_path):
    # tests/19 analog: 8 files processed as one dataset; counts aggregate
    # ACROSS files (mapreduce.c:108-124 work-queue semantics)
    all_lines: list[str] = []
    paths = []
    for i in range(8):
        chunk = [str((i * 37 + j) % 50) for j in range(100)]
        f = tmp_path / f"{i}.txt"
        f.write_text("\n".join(chunk) + "\n")
        paths.append(str(f))
        all_lines += chunk
    got = [(r.key, r.cnt) for r in line_count(read_lines(spark, paths)).collect()]
    assert got == sorted(Counter(all_lines).items())


# --- MR facade parity (entry point C) ---------------------------------------

def test_facade_wordcount_matches_native(spark):
    lines = fx.f2_words()
    df = fx.lines_df(spark, lines)
    facade = {(r.key, int(r.out)) for r in mr_run(spark, df, wordcount_job(4)).collect()}
    native = {(r.key, r.cnt) for r in line_count(df).collect()}
    assert facade == native


@pytest.mark.parametrize("p", [1, 4])
def test_facade_sort_matches_reference_order(spark, p):
    lines = fx.f1_tiny() + fx.f1_tiny()  # duplicates must be dropped
    got = [r.key for r in mr_run(spark, fx.lines_df(spark, lines), sort_job(p)).collect()]
    want = [k for _, k in sorted({(u32_bucket(k, p), k) for k in lines})]
    assert got == want


# --- partition invariance (replaces thread-count checks, SURVEY.md §5) ------

@pytest.mark.parametrize("partitions", [1, 3, 16])
def test_results_invariant_to_shuffle_width(spark, partitions):
    lines = fx.f1_medium()
    df = fx.lines_df(spark, lines).repartition(partitions)
    got = [(r.key, r.cnt) for r in line_count(df).collect()]
    assert got == sorted(Counter(lines).items())
    got_d = [r.key for r in distinct_sorted(df).collect()]
    assert got_d == sorted(set(lines))
