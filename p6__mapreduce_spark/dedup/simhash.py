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


def simhash_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """(id1, id2, hamming) — document pairs whose simhashes differ in at
    most ``max_hamming`` of the 32 bits.

    Banding is EXACT here, not probabilistic: the fingerprint splits
    into 4 byte-bands, and <= 3 flipped bits cannot touch all 4 bands
    (pigeonhole), so every qualifying pair shares at least one intact
    band and is found by the equi-join on (band, byte). One shuffle on
    the band key, O(bucket^2) verify per bucket — at larger corpora
    widen the fingerprint (64-bit) and band count so buckets stay
    small; exactness holds whenever bands > max_hamming.
    """
    if max_hamming >= 4:
        raise ValueError("4-band/32-bit geometry is exact only for max_hamming <= 3")
    sh = simhash(docs)
    bands = sh.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), 8 * b).bitwiseAND(F.lit(255))
                    for b in range(4)
                ]
            )
        ).alias("band", "key"),
    )
    a = bands.select(
        F.col("doc_id").alias("id1"), F.col("simhash").alias("sa"), "band", "key"
    )
    b = bands.select(
        F.col("doc_id").alias("id2"), F.col("simhash").alias("sb"), "band", "key"
    )
    hamming = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", "sa", "sb")
        .distinct()
        .filter(hamming <= max_hamming)
        .select("id1", "id2", hamming.cast("int").alias("hamming"))
        .orderBy("id1", "id2")
    )


def simhash_pairs_oracle_sql(max_hamming: int = 3) -> str:
    """DuckDB SQL for the identical pair set (exact banding argument)."""
    base = simhash_oracle_sql().replace("ORDER BY doc_id", "")
    return f"""
    WITH s AS ({base}),
    bands AS (
      SELECT doc_id, simhash, b, (simhash >> (8 * b)) & 255 AS key
      FROM s, UNNEST([0, 1, 2, 3]) AS u(b)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2, a.simhash AS sa, b.simhash AS sb
      FROM bands a JOIN bands b ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id
    )
    SELECT id1, id2, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
    FROM cand WHERE bit_count(xor(sa, sb)) <= {max_hamming}
    ORDER BY 1, 2
    """
