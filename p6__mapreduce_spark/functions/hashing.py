"""Hash functions.

``djb2`` mirrors the reference's default hash partitioner
(``map___reduce/mapreduce.c:260-266``: ``h = 5381; h = h*33 + c``) for
API compatibility in the MapReduce facade. Partition *placement* is
unobservable in the reference's tests (SURVEY.md §2.3#6), so the engine
normally lets Spark's Murmur3 place keys; djb2 is provided for clients
that pass an explicit partitioner.

``poly_hash_expr`` is the engine's oracle-friendly string hash: a
polynomial rolling hash evaluated entirely JVM-side with the
``aggregate`` higher-order function (whole-stage codegen, no Python).
It is reproducible in ANSI SQL (DuckDB ``list_reduce``), which is what
makes fingerprint/simhash/minhash results independently checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

POLY_MOD = 2147483647  # 2^31 - 1 (Mersenne prime): acc*base + c stays < 2^63
POLY_BASE = 31


def djb2(key: str, num_partitions: int) -> int:
    """Reference-equivalent default hash partitioner (driver-side helper)."""
    h = 5381
    for ch in key.encode("utf-8"):
        h = (h * 33 + ch) & 0xFFFFFFFFFFFFFFFF
    return h % num_partitions


def poly_hash_expr(col: Column | str, *, base: int = POLY_BASE, seed: int = 0, mod: int = POLY_MOD) -> Column:
    """31-bit polynomial rolling hash of a string column, pure SQL.

    h = fold(chars, seed, (acc, ch) -> (acc * base + ascii(ch)) % mod)

    DuckDB oracle equivalent:
      list_reduce(
        [seed] || string_split(col, ''),
        (acc, ch) -> (acc * base + ascii(ch)) % mod)
    """
    c = F.col(col) if isinstance(col, str) else col
    # split('', -1) yields one element per character; empty string -> ['']
    chars = F.filter(F.split(c, ""), lambda ch: ch != F.lit(""))
    return F.aggregate(
        chars,
        F.lit(seed).cast("long"),
        lambda acc, ch: (acc * F.lit(base) + F.ascii(ch)) % F.lit(mod),
    )
