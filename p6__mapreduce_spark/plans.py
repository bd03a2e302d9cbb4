"""Public-API physical/logical plan introspection.

Everything here goes through ``DataFrame.explain`` (which prints to
Python stdout) captured via ``redirect_stdout`` — no ``_jdf`` /
``_sc._jvm`` private internals, so it survives PySpark upgrades and
works unchanged under Spark Connect, where the JVM handle simply does
not exist. Used by the plan-shape test suite (``tests/test_plans.py``
etc.), the plan scorecard (``tools/plan_audit.py``) and the CLI's
``--explain`` flag.

``explain("extended")`` emits all four plan stages with ``== X ==``
section headers; the section helpers slice those, so callers asserting
on the optimized logical plan don't accidentally match the physical
plan text (e.g. "LocalLimit" appears in both).
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame

_SECTIONS = (
    "== Parsed Logical Plan ==",
    "== Analyzed Logical Plan ==",
    "== Optimized Logical Plan ==",
    "== Physical Plan ==",
)


def explain_str(df: DataFrame, mode: str = "simple") -> str:
    """The text ``df.explain(mode=...)`` would print, as a string."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def physical_plan(df: DataFrame) -> str:
    """The executed physical plan (AQE initial plan), simple mode."""
    return explain_str(df, "simple")


def formatted_plan(df: DataFrame) -> str:
    """Formatted physical plan — the mode that shows ``PushedFilters``
    and ``ReadSchema`` per scan node."""
    return explain_str(df, "formatted")


def _section(df: DataFrame, header: str) -> str:
    text = explain_str(df, "extended")
    start = text.index(header) + len(header)
    end = len(text)
    for other in _SECTIONS:
        pos = text.find(other, start)
        if pos != -1:
            end = min(end, pos)
    return text[start:end]


def optimized_logical_plan(df: DataFrame) -> str:
    return _section(df, "== Optimized Logical Plan ==")


def parsed_logical_plan(df: DataFrame) -> str:
    return _section(df, "== Parsed Logical Plan ==")
