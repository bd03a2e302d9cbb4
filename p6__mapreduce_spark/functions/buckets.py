"""Range-bucket expression reproducing the reference's sorted partitioner.

``MR_SortedPartition`` (``map___reduce/mapreduce.c:229-258``) buckets a
key by the top ``floor(log2(n))`` bits of ``(unsigned int) atoi(key)``:
a 32-bit unsigned reinterpretation, so values > 2^31 wrap modulo 2^32
(observed in ``tests/11.out``: key 3333333333 lands in the top bucket).
n == 1 always maps to bucket 0; the reference only supports power-of-two
``n``.

Spark's ``repartitionByRange`` samples split points instead of bit
slicing, so the bucket id is computed here as an ordinary column
expression — Catalyst folds it into the scan projection and it is usable
both for observable output ordering and as a repartition key.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

UINT32_MASK = 0xFFFFFFFF


def uint32_range_bucket(key: Column | str, num_partitions: int) -> Column:
    """Bucket id = top floor(log2(n)) bits of uint32(atoi(key)).

    Non-numeric keys fold to 0 (C ``atoi`` returns 0 on no-digit input;
    the reference's sort tests only ever use numeric keys).
    """
    if num_partitions < 1:
        raise ValueError("num_partitions must be >= 1")
    if num_partitions == 1:
        return F.lit(0).cast("long")
    col = F.col(key) if isinstance(key, str) else key
    # floor(log2(n)), mirroring the reference's halving loop
    # (`for (i = n; i >= 2; i /= 2) index++` — mapreduce.c:252-255),
    # so non-power-of-two n buckets identically to the C partitioner.
    bits = num_partitions.bit_length() - 1
    # try_cast: ANSI-safe — non-numeric keys fold to 0 like C atoi
    as_u32 = F.coalesce(col.try_cast("long"), F.lit(0)).bitwiseAND(F.lit(UINT32_MASK))
    return F.shiftright(as_u32, 32 - bits)
