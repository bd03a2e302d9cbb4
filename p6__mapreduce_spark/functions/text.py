"""Text expressions: tokenization, normalization, shingling.

All built-in higher-order / string functions — JVM-side, codegen'd, no
Python on the hot path. Each has a documented ANSI-SQL equivalent so the
DuckDB oracle can reproduce results exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_PATTERN = "[^a-z0-9]+"


def normalize_text(col: Column | str) -> Column:
    """lower + trim. Oracle: ``lower(trim(col))``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(c))


def tokens_expr(col: Column | str, pattern: str = TOKEN_PATTERN) -> Column:
    """Array of non-empty lowercase tokens.

    Oracle: ``list_filter(string_split_regex(lower(trim(col)), pattern),
    t -> t <> '')``.
    """
    toks = F.split(normalize_text(col), pattern)
    return F.filter(toks, lambda t: t != F.lit(""))


def word_shingles(col: Column | str, k: int = 3, sep: str = " ") -> Column:
    """Distinct k-word shingles of a text column as array<string>.

    Built from the token array with ``transform`` over running indexes —
    no explode, so it stays one row per document until the caller decides
    to explode (the scale-friendly shape: shingling is a map-side
    operation, the shuffle only happens on the downstream join/agg).

    Oracle (DuckDB): build w = tokens, then
      (SELECT list(DISTINCT w[i] || ' ' || w[i+1] || ' ' || w[i+2])
       FROM generate_series(1, len(w) - k + 1) t(i))
    """
    toks = tokens_expr(col)
    n = F.size(toks)
    # sequence(0, n-k) counts DOWN when n < k — guard with empty array
    idx = F.when(n >= F.lit(k), F.sequence(F.lit(0), n - F.lit(k))).otherwise(
        F.array().cast("array<int>")
    )
    shingles = F.transform(
        idx,
        lambda i: F.array_join(F.slice(toks, i + 1, k), sep),
    )
    return F.array_distinct(shingles)
