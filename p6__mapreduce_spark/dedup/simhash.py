"""SimHash fingerprinting (32-bit and 64-bit).

Each token hashes to a fixed-width integer; bit b of the fingerprint
is 1 iff the sum over token occurrences of (+1 if bit set else -1) is
positive. One explode + one partial-aggregated groupBy — the shuffle
carries one small vote sum per bit per doc per map task.
Near-duplicate candidates = fingerprints within small Hamming distance
(grouping by band of the fingerprint, same LSH idea as minhash), and
byte-banding is EXACT, not probabilistic, whenever the band count
exceeds ``max_hamming`` (pigeonhole: k flipped bits cannot touch all
k+1 bands, so a qualifying pair always shares an intact band).

Widths:

- 32-bit (``simhash``/``simhash_pairs``): one 31-bit polynomial token
  hash, 4 byte-bands, exact for max_hamming <= 3. Fine for
  corpus-scale ~10^6: expected bucket occupancy per (band, byte) key
  stays small.
- 64-bit (``simhash64``/``simhash64_pairs``, round 4 — the corpus-
  scale variant SCALE.md commits to): TWO independent 32-bit
  polynomial hashes (base 31 / base 37, mod 2^32) give 64 real bits,
  8 byte-bands, exact for max_hamming <= 7. At 100 TB (~10^10 docs)
  32-bit fingerprints saturate (birthday collisions at ~2^16 docs make
  buckets quadratic); 64 bits push band-key cardinality to 2^8 per
  band over a 2^56 prefix space, keeping bucket-verify linear.

The whole computation is reproducible in ANSI SQL (DuckDB list
comprehensions) — see ``*_oracle_sql``. Bit 63 is materialized as a
signed two's-complement add of -2^63 in BOTH engines, so the 64-bit
fingerprints agree exactly including the sign bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from p6__mapreduce_spark.functions.hashing import poly_hash_expr
from p6__mapreduce_spark.functions.text import tokens_expr
from p6__mapreduce_spark.operators.text_analysis import TOKENS_ORACLE, poly_hash_oracle_sql

NUM_BITS = 32
_MOD32 = 2**32  # full 32-bit hashes for the 64-bit fingerprint
_HI_BASE = 37  # second, independent polynomial (different base+seed)
_HI_SEED = 1


def _bit_value(b: int) -> F.Column:
    # two's complement: setting bit 63 == adding -2^63 (sum of bits
    # 0..62 is < 2^63, so the add cannot overflow)
    return F.lit(-(2**63) if b == 63 else 2**b).cast("long")


def _fingerprint(hashed: DataFrame, specs: list[tuple[str, int, int]]) -> DataFrame:
    """Vote + assemble: ``specs`` maps hash columns to fingerprint bit
    ranges as (hash_col, start_bit, n_bits)."""
    votes = hashed.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col(col), b).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"v{start + b}")
            for col, start, nbits in specs
            for b in range(nbits)
        ]
    )
    all_bits = [
        F.when(F.col(f"v{start + b}") > 0, _bit_value(start + b)).otherwise(
            F.lit(0).cast("long")
        )
        for col, start, nbits in specs
        for b in range(nbits)
    ]
    fingerprint = sum(all_bits[1:], all_bits[0])
    return votes.select("doc_id", fingerprint.alias("simhash"))


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
    return _fingerprint(hashed, [("h", 0, NUM_BITS)])


def simhash64(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash: long) — 64-bit fingerprint from two independent
    full-32-bit polynomial hashes (bits 0-31 from base 31, bits 32-63
    from base 37/seed 1). Same single-explode single-groupBy plan as
    the 32-bit path, just 64 vote sums; the shuffle still carries one
    small row per doc per map task."""
    hashed = docs.select(
        "doc_id", F.explode(tokens_expr("text")).alias("tok")
    ).select(
        "doc_id",
        poly_hash_expr("tok", mod=_MOD32).alias("hlo"),
        poly_hash_expr("tok", base=_HI_BASE, seed=_HI_SEED, mod=_MOD32).alias("hhi"),
    )
    return _fingerprint(hashed, [("hlo", 0, 32), ("hhi", 32, 32)])


def _oracle_bits(hashes_expr: str, shift: int, start: int, nbits: int) -> str:
    return " + ".join(
        f"(CASE WHEN list_sum([CASE WHEN (h >> {b - start + shift}) & 1 = 1 THEN 1 ELSE -1 END "
        f"for h in {hashes_expr}]) > 0 "
        f"THEN CAST({-(2**63) if b == 63 else 2**b} AS BIGINT) ELSE 0 END)"
        for b in range(start, start + nbits)
    )


def simhash_oracle_sql() -> str:
    """DuckDB SQL computing identical 32-bit simhash values."""
    ph = poly_hash_oracle_sql("t")
    toks = TOKENS_ORACLE.format(col="text")
    bit_terms = _oracle_bits("hashes", 0, 0, NUM_BITS)
    return f"""
    WITH toks AS (
      SELECT doc_id, {toks} AS w FROM documents
    ), hashed AS (
      SELECT doc_id, [{ph} for t in w] AS hashes FROM toks WHERE len(w) > 0
    )
    SELECT doc_id, {bit_terms} AS simhash FROM hashed ORDER BY doc_id
    """


def simhash64_oracle_sql() -> str:
    """DuckDB SQL computing identical 64-bit simhash values (both
    polynomial hashes + the signed bit-63 add replayed literally)."""
    ph_lo = poly_hash_oracle_sql("t", mod=_MOD32)
    ph_hi = poly_hash_oracle_sql("t", base=_HI_BASE, seed=_HI_SEED, mod=_MOD32)
    toks = TOKENS_ORACLE.format(col="text")
    terms = (
        _oracle_bits("hlo", 0, 0, 32) + " + " + _oracle_bits("hhi", 0, 32, 32)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, {toks} AS w FROM documents
    ), hashed AS (
      SELECT doc_id,
             [{ph_lo} for t in w] AS hlo,
             [{ph_hi} for t in w] AS hhi
      FROM toks WHERE len(w) > 0
    )
    SELECT doc_id, {terms} AS simhash FROM hashed ORDER BY doc_id
    """


def _banded_pairs(sh: DataFrame, n_bands: int, max_hamming: int) -> DataFrame:
    bands = sh.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), 8 * b).bitwiseAND(F.lit(255))
                    for b in range(n_bands)
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


def simhash_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """(id1, id2, hamming) — document pairs whose simhashes differ in at
    most ``max_hamming`` of the 32 bits.

    Banding is EXACT here, not probabilistic: the fingerprint splits
    into 4 byte-bands, and <= 3 flipped bits cannot touch all 4 bands
    (pigeonhole), so every qualifying pair shares at least one intact
    band and is found by the equi-join on (band, byte). One shuffle on
    the band key, O(bucket^2) verify per bucket — at larger corpora use
    ``simhash64_pairs`` (8 bands, 64 bits) so buckets stay small;
    exactness holds whenever bands > max_hamming.
    """
    if max_hamming >= 4:
        raise ValueError("4-band/32-bit geometry is exact only for max_hamming <= 3")
    return _banded_pairs(simhash(docs), 4, max_hamming)


def simhash64_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """64-bit variant: 8 byte-bands, exact for max_hamming <= 7 by the
    same pigeonhole argument. The corpus-scale default — band-key
    space per band is still 256 values, but bucket membership requires
    agreement on a full byte of a 64-bit fingerprint whose other 56
    bits spread docs out, so expected bucket sizes stay ~n/256 with
    far fewer accidental multi-band repeats than 32-bit at 10^8+ docs.
    """
    if max_hamming >= 8:
        raise ValueError("8-band/64-bit geometry is exact only for max_hamming <= 7")
    return _banded_pairs(simhash64(docs), 8, max_hamming)


def _pairs_oracle(base_sql: str, n_bands: int, max_hamming: int) -> str:
    bands_list = ", ".join(str(b) for b in range(n_bands))
    return f"""
    WITH s AS ({base_sql}),
    bands AS (
      SELECT doc_id, simhash, b, (simhash >> (8 * b)) & 255 AS key
      FROM s, UNNEST([{bands_list}]) AS u(b)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2, a.simhash AS sa, b.simhash AS sb
      FROM bands a JOIN bands b ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id
    )
    SELECT id1, id2, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
    FROM cand WHERE bit_count(xor(sa, sb)) <= {max_hamming}
    ORDER BY 1, 2
    """


def simhash_pairs_oracle_sql(max_hamming: int = 3) -> str:
    """DuckDB SQL for the identical pair set (exact banding argument)."""
    base = simhash_oracle_sql().replace("ORDER BY doc_id", "")
    return _pairs_oracle(base, 4, max_hamming)


def simhash64_pairs_oracle_sql(max_hamming: int = 3) -> str:
    """DuckDB SQL for the identical 64-bit pair set."""
    base = simhash64_oracle_sql().replace("ORDER BY doc_id", "")
    return _pairs_oracle(base, 8, max_hamming)
