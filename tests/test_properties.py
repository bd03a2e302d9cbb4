"""Property-based checks (SURVEY.md §5): invariants that replace the
reference parser's assertions (wordcount_parser.py:28-38).

Pure-Python models (bucket math, djb2) get full hypothesis fuzzing;
Spark round-trips use a small example budget to keep the suite fast.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from p6__mapreduce_spark.functions.hashing import djb2
from p6__mapreduce_spark.operators.core import distinct_sorted, line_count
from tests.conftest import lines_df

ascii_line = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1, max_size=20
)

spark_settings = settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
)


@given(st.lists(ascii_line, min_size=1, max_size=50))
@spark_settings
def test_count_sum_equals_input_rows(spark, lines):
    rows = line_count(lines_df(spark, lines)).collect()
    assert sum(r.cnt for r in rows) == len(lines)          # no pair lost
    assert len(rows) == len(set(lines))                    # one reduce per key
    assert dict((r.key, r.cnt) for r in rows) == Counter(lines)


@given(st.lists(ascii_line, min_size=1, max_size=50))
@spark_settings
def test_distinct_output_sorted_and_unique(spark, lines):
    got = [r.key for r in distinct_sorted(lines_df(spark, lines)).collect()]
    assert got == sorted(set(lines))


@given(st.text(min_size=0, max_size=64), st.integers(min_value=1, max_value=64))
def test_djb2_in_range_and_deterministic(key, n):
    assert 0 <= djb2(key, n) < n
    assert djb2(key, n) == djb2(key, n)
