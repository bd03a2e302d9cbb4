"""SimHash fingerprinting (32-bit).

Each token hashes to 31 usable bits (polynomial hash); bit b of the
fingerprint is 1 iff the sum over token occurrences of (+1 if bit set
else -1) is positive. Pure map-side expression work — the token-hash
array is computed once, then 32 `aggregate` folds produce the bit
votes. Near-duplicate candidates = fingerprints within small Hamming
distance (grouping by band of the fingerprint, same LSH idea as
minhash).

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
    are dropped (no signal)."""
    toks = tokens_expr("text")
    hashes = F.transform(toks, lambda t: poly_hash_expr(t))
    def bit_vote(b: int):
        # closure factory: aggregate's merge lambda must be exactly 2-ary
        return lambda acc, h: acc + F.when(
            F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bit_cols = []
    for b in range(NUM_BITS):
        vote = F.aggregate(hashes, F.lit(0).cast("long"), bit_vote(b))
        bit_cols.append(F.when(vote > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long")))
    fingerprint = sum(bit_cols[1:], bit_cols[0])
    return (
        docs.select("doc_id", F.size(toks).alias("_n"), fingerprint.alias("simhash"))
        .filter(F.col("_n") > 0)
        .select("doc_id", "simhash")
    )


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
