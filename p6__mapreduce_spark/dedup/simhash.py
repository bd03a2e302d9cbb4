"""SimHash fingerprinting (32-bit).

Each token hashes to 31 usable bits (polynomial hash); bit b of the
fingerprint is 1 iff the sum over token occurrences of (+1 if bit set
else -1) is positive. One explode + one partial-aggregated groupBy —
the shuffle carries 32 small vote sums per doc per map task.
Near-duplicate candidates = fingerprints within small Hamming distance
(grouping by band of the fingerprint, same LSH idea as minhash).

The whole computation is reproducible in ANSI SQL (DuckDB list
comprehensions) — see ``simhash_oracle_sql``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from p6__mapreduce_spark.functions.hashing import poly_hash_expr
from p6__mapreduce_spark.functions.text import tokens_expr
from p6__mapreduce_spark.operators.text_analysis import TOKENS_ORACLE, poly_hash_oracle_sql

NUM_BITS = 32


def simhash(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash: long) — 32-bit fingerprint; docs with no tokens
    are dropped (no signal).

    Plan shape mirrors minhash: explode tokens -> one polynomial hash
    per (doc, token) row -> groupBy(doc_id) with 32 SUM(+-1 bit vote)
    aggregates (partial map-side), then assemble bits. Hashing each
    token exactly once in codegen beats 32 interpreted higher-order
    folds over the token array.
    """
    hashed = docs.select(
        "doc_id", F.explode(tokens_expr("text")).alias("tok")
    ).select("doc_id", poly_hash_expr("tok").alias("h"))
    votes = hashed.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(NUM_BITS)
        ]
    )
    bit_cols = [
        F.when(F.col(f"v{b}") > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long"))
        for b in range(NUM_BITS)
    ]
    fingerprint = sum(bit_cols[1:], bit_cols[0])
    return votes.select("doc_id", fingerprint.alias("simhash"))


def simhash_oracle_sql() -> str:
    """DuckDB SQL computing identical 32-bit simhash values."""
    ph = poly_hash_oracle_sql("t")
    toks = TOKENS_ORACLE.format(col="text")
    bit_terms = " + ".join(
        f"(CASE WHEN list_sum([CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END for h in hashes]) > 0 "
        f"THEN CAST({2**b} AS BIGINT) ELSE 0 END)"
        for b in range(NUM_BITS)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, {toks} AS w FROM documents
    ), hashed AS (
      SELECT doc_id, [{ph} for t in w] AS hashes FROM toks WHERE len(w) > 0
    )
    SELECT doc_id, {bit_terms} AS simhash FROM hashed ORDER BY doc_id
    """
