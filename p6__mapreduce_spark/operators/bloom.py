"""Bloom-filter prejoin: broadcast approximate-membership pruning.

The scale technique behind "filter the 100 TB fact table BEFORE the
shuffle": build a fixed-size Bloom filter (Bloom 1970) over the join
keys of the SMALL side, collect it to the driver (bounded — mbits/32
int64 words, independent of key count), broadcast it as a plan
literal, and test the big side map-side. Rows the filter rejects are
guaranteed non-members and never reach the join shuffle; admitted rows
include a tunable false-positive tail the exact join still eliminates.
Spark's AQE injects runtime bloom filters for exactly this reason
(``spark.sql.optimizer.runtime.bloomFilter.enabled``); this module is
the engine-level, oracle-checkable version of the same idea — built on
portable integer hashes so the *bit array itself* and every admit /
reject decision replay exactly in DuckDB (Spark's own ``bloom_filter``
uses Murmur3 with engine-private bit layout, which no oracle can
reproduce).

Geometry: ``mbits`` bits as ``mbits/32`` 32-bit words stored in int64
(bit index < 32 keeps every mask positive — no sign-bit divergence
between engines), ``k`` independent affine hashes
``((x % P) * A_j + B_j) % P % mbits`` over the Mersenne prime
P = 2^31 - 1 (products stay < 2^62, exact in int64). Expected FPR ≈
(1 - e^(-k*n/mbits))^k — the audit query reports the REALIZED rate
next to the membership truth so the cost of the technique is measured,
not assumed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

P = 2147483647  # 2^31 - 1
# fixed affine hash constants (A_j < P so (x % P) * A_j < 2^62)
HASHES: tuple[tuple[int, int], ...] = (
    (1103515245, 12345),
    (784588716, 456789123),
    (1588635695, 907633385),
)


def _positions(col: Column, mbits: int) -> list[Column]:
    """The k bit positions of a non-negative int64 key, one per hash."""
    x = col.cast("long") % F.lit(P)
    return [(x * F.lit(a) + F.lit(b)) % F.lit(P) % F.lit(mbits) for a, b in HASHES]


def _mask(pos: Column) -> Column:
    """1 << (pos % 32) as int64 — via a 32-entry powers-of-two literal
    (PySpark's shiftleft only shifts by a Python-int constant)."""
    pow2 = F.lit([1 << i for i in range(32)])
    return F.element_at(pow2, (pos.bitwiseAND(F.lit(31)) + 1).cast("int"))


def build_bloom(keys: DataFrame, col: str, *, mbits: int = 65536) -> list[int]:
    """The filter as a dense list of mbits/32 int64 words (bit i of
    word w set iff some key hashed to position w*32 + i).

    ONE distributed pass: each key emits k (word, mask) pairs map-side
    (duplicate keys are free — OR is idempotent), a partial-combined
    ``bit_or`` aggregation shrinks every partition to <= mbits/32 rows
    before the single bounded shuffle, and only the non-zero words
    travel to the driver. Driver traffic is O(mbits), never O(keys) —
    the property that makes the pattern usable on a 100 TB key side.
    """
    pairs = F.array(
        *[
            F.struct(F.shiftright(pos, 5).alias("word"), _mask(pos).alias("mask"))
            for pos in _positions(F.col(col), mbits)
        ]
    )
    rows = (
        keys.select(F.explode(pairs).alias("wm"))
        .groupBy(F.col("wm.word").alias("word"))
        .agg(F.bit_or("wm.mask").alias("mask"))
        .collect()
    )
    words = [0] * (mbits // 32)
    for r in rows:
        words[int(r["word"])] = int(r["mask"])
    return words


def member_expr(col: Column | str, words: list[int], *, mbits: int = 65536) -> Column:
    """Map-side membership test against the broadcast word array (ONE
    array literal — data, not unrolled code): true iff every hash's bit
    is set. False ⇒ definitely absent; true ⇒ present or false
    positive."""
    c = F.col(col) if isinstance(col, str) else col
    lit_words = F.lit([int(w) for w in words])
    tests = [
        (
            F.element_at(lit_words, (F.shiftright(pos, 5) + 1).cast("int")).bitwiseAND(_mask(pos))
            != 0
        )
        for pos in _positions(c, mbits)
    ]
    out = tests[0]
    for t in tests[1:]:
        out = out & t
    return out


def bloom_prejoin_audit(
    customer: DataFrame,
    orders: DataFrame,
    *,
    min_totalprice: float = 480000.0,
    mbits: int = 65536,
) -> DataFrame:
    """Per c_mktsegment: how a Bloom prejoin on "has a >= min_totalprice
    order" performs — (n_customers, n_admitted, n_members, n_false_pos,
    fpr_nonmember). The filter is built over the qualifying orders'
    custkeys and tested on every customer MAP-SIDE; the exact semi-join
    runs beside it only to score the filter (in production it would run
    on the admitted survivors only).

    Scale shape: build = one pass over orders + bounded bit_or shuffle
    + O(mbits) collect; test = zero-shuffle scan of customer with the
    word array broadcast in the plan; the scoring semi-join broadcasts
    the DISTINCT qualifying keys (small by construction of the
    predicate)."""
    keys = orders.filter(F.col("o_totalprice") >= F.lit(min_totalprice)).select("o_custkey")
    words = build_bloom(keys, "o_custkey", mbits=mbits)
    members = (
        keys.distinct()
        .withColumnRenamed("o_custkey", "c_custkey")
        .withColumn("is_member", F.lit(True))
    )
    flagged = customer.select(
        "c_mktsegment",
        member_expr("c_custkey", words, mbits=mbits).alias("admitted"),
        F.col("c_custkey"),
    ).join(F.broadcast(members), "c_custkey", "left")
    is_member = F.coalesce(F.col("is_member"), F.lit(False))
    agg = flagged.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("admitted").cast("long")).alias("n_admitted"),
        F.sum(is_member.cast("long")).alias("n_members"),
        F.sum((F.col("admitted") & ~is_member).cast("long")).alias("n_false_pos"),
    )
    nonmembers = F.col("n_customers") - F.col("n_members")
    return agg.select(
        "c_mktsegment",
        "n_customers",
        "n_admitted",
        "n_members",
        "n_false_pos",
        F.when(nonmembers > 0, F.col("n_false_pos") * F.lit(1.0) / nonmembers)
        .otherwise(F.lit(0.0))
        .alias("fpr_nonmember"),
    ).orderBy("c_mktsegment")


def bloom_audit_oracle_sql(*, min_totalprice: float = 480000.0, mbits: int = 65536) -> str:
    """DuckDB replica: identical hashes, identical 32-bit word layout,
    identical admit/reject decisions. The membership test is expressed
    as a per-(customer, hash) join against the word table with a
    bool_and roll-up — same arithmetic as Spark's broadcast-literal
    lookup, different (SQL-natural) shape."""
    hash_rows = " UNION ALL ".join(
        f"SELECT {a} AS a, {b} AS b" for a, b in HASHES
    )
    return f"""
    WITH h(a, b) AS ({hash_rows}),
    keys AS (
      SELECT o_custkey AS k FROM orders WHERE o_totalprice >= {min_totalprice}
    ), pos AS (
      SELECT ((k % {P}) * a + b) % {P} % {mbits} AS pos FROM keys CROSS JOIN h
    ), words AS (
      SELECT pos >> 5 AS word,
             bit_or(CAST(1 AS BIGINT) << CAST(pos & 31 AS INTEGER)) AS mask
      FROM pos GROUP BY 1
    ), probe AS (
      SELECT c.c_custkey, c.c_mktsegment,
             ((c.c_custkey % {P}) * h.a + h.b) % {P} % {mbits} AS pos
      FROM customer c CROSS JOIN h
    ), admit AS (
      SELECT c_custkey, c_mktsegment,
             bool_and(
               (COALESCE(w.mask, 0) & (CAST(1 AS BIGINT) << CAST(p.pos & 31 AS INTEGER))) <> 0
             ) AS admitted
      FROM probe p LEFT JOIN words w ON w.word = p.pos >> 5
      GROUP BY 1, 2
    ), truth AS (
      SELECT a.c_custkey, a.c_mktsegment, a.admitted,
             EXISTS (SELECT 1 FROM keys WHERE keys.k = a.c_custkey) AS is_member
      FROM admit a
    ), agg AS (
      SELECT c_mktsegment,
             CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(CASE WHEN admitted THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
             CAST(SUM(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT) AS n_members,
             CAST(SUM(CASE WHEN admitted AND NOT is_member THEN 1 ELSE 0 END) AS BIGINT)
               AS n_false_pos
      FROM truth GROUP BY 1
    )
    SELECT c_mktsegment, n_customers, n_admitted, n_members, n_false_pos,
           CASE WHEN n_customers - n_members > 0
                THEN n_false_pos * 1.0e0 / (n_customers - n_members)
                ELSE 0.0e0 END AS fpr_nonmember
    FROM agg ORDER BY c_mktsegment
    """
