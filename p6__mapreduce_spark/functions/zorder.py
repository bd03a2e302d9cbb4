"""Z-order (Morton) interleaving for multi-column data layout.

Sorting a table by one column gives parquet min/max pruning on that
column only; interleaving the bits of TWO key columns and sorting by
the result gives every output file a narrow value range in BOTH
dimensions — the layout trick behind Delta/Iceberg ``ZORDER BY`` that
turns min/max row-group statistics into a 2-D data-skipping index.
At 100 TB this is the difference between scanning one dimension's
slice (10⁻² of files) and the intersection slice (10⁻⁴).

The bit-spread uses the classic mask-shift ladder (Bit Twiddling
Hacks): 4 shift+mask steps spread a uint16 into the even bit
positions of a uint32; two spread values OR together (disjoint bits,
so ``+`` == ``|``). Pure 64-bit integer ops — identical in Spark
codegen and DuckDB, so Morton codes are exactly oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SPREAD_STEPS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16(col: Column) -> Column:
    """uint16 -> its bits in the even positions of a uint32. (PySpark's
    ``&``/``|`` on Columns are BOOLEAN operators — bitwiseAND/OR are
    the integer ones.)"""
    x = col.cast("long").bitwiseAND(F.lit(0xFFFF).cast("long"))
    for shift, mask in _SPREAD_STEPS:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask).cast("long"))
    return x


def morton_code(a, b) -> Column:
    """Interleave the low 16 bits of two integer columns: a's bits land
    in the odd positions, b's in the even — lexicographic order on the
    result is Z-order on (a, b). Callers must present both dimensions
    at COMPARABLE bit widths: if one column's range uses 14 bits and
    the other's 8, the top interleaved bits all come from the wide
    column and the file ranges only tighten in that dimension (use
    ``scaled_morton`` for raw columns)."""
    return F.shiftleft(_spread16(F.col(a) if isinstance(a, str) else a), 1) + _spread16(
        F.col(b) if isinstance(b, str) else b
    )


def scaled_morton(df: DataFrame, a: str, b: str) -> Column:
    """Morton code over min-max-scaled dimensions (each normalized to
    the full 16-bit range so both contribute equally to every bit
    level). The min/max scalars are one tiny aggregate collected to
    the driver and folded in as literals."""
    amin, amax, bmin, bmax = df.agg(
        F.min(a), F.max(a), F.min(b), F.max(b)
    ).first()
    if amin is None or bmin is None:
        # MIN is NULL on an empty input (zero rows to map — any
        # expression works) AND on a non-empty input whose column is
        # entirely NULL. The oracle's scalar-subquery MIN is NULL in
        # both cases and NULL-propagates through the whole
        # scale/spread ladder, so mirror it with a typed NULL — NOT a
        # zero, which would stamp every all-NULL row with code 0
        # while the oracle keeps NULL (r9 ADVICE #1; the int(None)
        # crash this guard replaced was the r9 degenerate-input audit).
        return F.lit(None).cast("long")
    sa = (F.col(a) - F.lit(int(amin))) * F.lit(65535) / F.lit(max(1, int(amax - amin)))
    sb = (F.col(b) - F.lit(int(bmin))) * F.lit(65535) / F.lit(max(1, int(bmax - bmin)))
    return morton_code(F.floor(sa).cast("long"), F.floor(sb).cast("long"))


def scaled_morton_oracle_expr(a: str, b: str, table: str) -> str:
    """DuckDB twin of ``scaled_morton`` (min/max via scalar
    subqueries; identical double multiply/divide then floor)."""

    def scaled(col: str) -> str:
        lo = f"(SELECT MIN({col}) FROM {table})"
        span = f"greatest(1, (SELECT MAX({col}) FROM {table}) - {lo})"
        return f"CAST(floor(({col} - {lo}) * 65535.0 / {span}) AS BIGINT)"

    return morton_oracle_expr(scaled(a), scaled(b))


def morton_oracle_expr(a: str, b: str) -> str:
    """The identical mask-shift ladder as a DuckDB SQL expression over
    two column/expression strings."""

    def spread(col: str) -> str:
        x = f"(CAST({col} AS BIGINT) & 65535)"
        for shift, mask in _SPREAD_STEPS:
            x = f"(({x} | ({x} << {shift})) & {mask})"
        return x

    return f"(({spread(a)} << 1) + {spread(b)})"


def write_zordered(
    df: DataFrame, path: str, a: str, b: str, *, n_files: int = 8
) -> None:
    """Write ``df`` as parquet laid out in Z-order on (a, b):
    range-partition by the Morton code (file boundaries = contiguous
    Z-ranges) and sort within each file so row-group min/max stats are
    tight in both dimensions."""
    z = scaled_morton(df, a, b).alias("_z")
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_parquet(
    spark, src: str, dst: str, *, target_mb: int = 128
) -> int:
    """Small-file compaction: rewrite ``src`` into ceil(bytes/target)
    files. The operational fix for streaming/incremental sinks that
    accumulate thousands of tiny files (each costing a task + a
    footer read at scan time). Returns the output file count.

    Uses the source's on-disk size (post-compression) as the sizing
    signal and repartition(n) — a round-robin shuffle, so output files
    are near-uniform regardless of input skew."""
    import math
    import os

    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(src)
        for f in files
        if f.endswith(".parquet")
    )
    n = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    spark.read.parquet(src).repartition(n).write.mode("overwrite").parquet(dst)
    return n
