"""PII detection and redaction — regex scrubbing for training corpora.

The standard pre-release pass over a text corpus: find and mask
emails, phone numbers, SSN-shaped ids, and IP addresses before the
data reaches a training run. Everything is ``regexp_extract_all`` /
``regexp_replace`` column expressions — JVM-side, whole-stage codegen,
linear in input size, trivially parallel at 100 TB (no shuffle at
all: detection and redaction are pure map operators).

The synthetic test corpus contains no PII (counts are all zero there),
so the operator's behavior is pinned by unit tests with planted
values (tests/test_pipeline.py) rather than a registry oracle entry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Order matters for redaction: email before phone so the digits inside
# an already-masked token cannot re-match. Patterns use only syntax
# with identical semantics in Java regex and RE2 (no backrefs, no
# lookaround), so the same strings work in DuckDB regexp_* oracles.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"(?:\+\d{1,3}[ .-]?)?\(?\d{3}\)?[ .-]\d{3}[ .-]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append one ``n_<kind>`` match-count column per PII pattern plus
    ``n_pii`` (their sum) — the triage pass that decides which
    documents need redaction or quarantine."""
    out = df
    for kind, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{kind}",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)).cast("long"),
        )
    total = None
    for kind in PII_PATTERNS:
        c = F.col(f"n_{kind}")
        total = c if total is None else total + c
    return out.withColumn("n_pii", total)


def redact_pii(df: DataFrame, text_col: str = "text", out_col: str | None = None) -> DataFrame:
    """Replace every PII match with a typed mask token (``[EMAIL]``,
    ``[SSN]``, ...). Masks are applied in PII_PATTERNS order so earlier
    masks cannot be re-matched by later (digit-hungry) patterns."""
    expr = F.col(text_col)
    for kind, pat in PII_PATTERNS.items():
        expr = F.regexp_replace(expr, pat, f"[{kind.upper()}]")
    return df.withColumn(out_col or text_col, expr)
