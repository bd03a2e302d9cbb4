"""Hilbert-curve index for multi-column data layout — the
locality-preserving upgrade of `functions/zorder.py`.

Morton (Z-order) codes jump across the key space at every power-of-two
boundary (the "Z" diagonal seam), so a contiguous code range maps to up
to 2 disjoint rectangles per level; the Hilbert curve's rotations keep
every adjacent pair of codes in ADJACENT cells, which tightens per-file
min/max ranges further for the same file count — why Databricks ships
liquid clustering on Hilbert rather than Z-order curves.

The classic xy2d walk (Hilbert 1891; the bit-twiddling formulation is
public domain via Wikipedia's pseudocode) processes one bit level per
step, carrying a (rotate/flip) state in the transformed coordinates:

    for s in (n/2 .. 1):                     # one step per bit level
        rx, ry = bit s of x, bit s of y
        d += s*s * ((3*rx) XOR ry)           # quadrant rank
        if ry == 0:
            if rx == 1: x, y = s-1-x, s-1-y  # flip
            x, y = y, x                      # rotate

Each step is pure int64 arithmetic on (x, y, d). The XOR collapses to
`3*rx + ry - 2*rx*ry` (checked exhaustively on the 4 bit pairs), so
every step uses only `&`, `*`, `-`, `+` and CASE — operators with
IDENTICAL syntax and semantics in Spark SQL and DuckDB. Both engines
therefore run the SAME generated expression text per level
(`_step_exprs`), the strongest cross-engine guarantee in the repo:
there is no twin implementation to drift.

Scale shape: LEVELS chained projections fuse into one WholeStageCodegen
stage in Spark (a single map pass, no shuffle); the oracle chains the
same text through LEVELS CTEs. Min-max scaling to the 2^LEVELS grid
follows `zorder.scaled_morton` exactly (one tiny aggregate folded in as
literals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

LEVELS = 10
SIDE = 1 << LEVELS  # 1024 x 1024 grid


def _step_exprs(s: int) -> tuple[str, str, str]:
    """(new hx, new hy, new hd) expression text for bit level ``s`` —
    one shared string per column, valid in both Spark SQL and DuckDB."""
    ry0 = f"(hy & {s}) = 0"
    rx1 = f"(hx & {s}) > 0"
    quad = (
        f"(CASE WHEN {rx1} THEN 3 ELSE 0 END"
        f" + CASE WHEN NOT ({ry0}) THEN 1 ELSE 0 END"
        f" - 2 * CASE WHEN ({rx1}) AND NOT ({ry0}) THEN 1 ELSE 0 END)"
    )
    x = (
        f"CASE WHEN {ry0} THEN CASE WHEN {rx1} THEN {s - 1} - hy ELSE hy END"
        f" ELSE hx END"
    )
    y = (
        f"CASE WHEN {ry0} THEN CASE WHEN {rx1} THEN {s - 1} - hx ELSE hx END"
        f" ELSE hy END"
    )
    d = f"hd + {s * s} * {quad}"
    return x, y, d


def _levels() -> list[int]:
    return [SIDE >> k for k in range(1, LEVELS + 1)]  # n/2 .. 1


def hilbert_code_py(x: int, y: int, levels: int = LEVELS) -> int:
    """Pure-Python reference (test model): same walk, same collapse.
    ``levels`` < LEVELS runs the same curve on a smaller grid (the
    walk is self-similar, so the property tests can afford the full
    bijection/adjacency proof)."""
    d = 0
    for s in [(1 << levels) >> k for k in range(1, levels + 1)]:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * (3 * rx + ry - 2 * rx * ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
    return d


def hilbert_df(df: DataFrame, key: str, a: str, b: str) -> DataFrame:
    """(key, hcode): Hilbert index of min-max-scaled (a, b). The
    LEVELS chained selects fuse into one codegen stage — `.explain`
    shows a single Project over the scan."""
    from pyspark.sql import functions as F

    cnt, amin, amax, bmin, bmax = df.agg(
        F.count(F.lit(1)), F.min(a), F.max(a), F.min(b), F.max(b)
    ).first()
    if cnt == 0:
        # Empty input: return the empty (key, hcode) frame the DuckDB
        # oracle produces instead of a driver TypeError at int(None)
        # (r8 ADVICE; an engine-divergent crash on the degenerate input).
        return df.selectExpr(key, "CAST(0 AS BIGINT) AS hcode").limit(0)

    def _axis(col: str, lo, span) -> str:
        if lo is None:
            # Non-empty input, all-NULL axis: the oracle's scalar
            # subquery MIN is NULL and NULL-propagates through the
            # identical per-level ladder — mirror it with a typed NULL
            # axis instead of dropping the rows (r9 ADVICE #1; the
            # empty-guard used to swallow this case and return 0 rows
            # while the oracle kept n rows). Both engines then run the
            # same expression text, so three-valued-logic outcomes in
            # the CASE ladder agree by construction.
            return "CAST(NULL AS BIGINT)"
        return f"CAST(floor(({col} - {int(lo)}) * {SIDE - 1}.0 / {span}) AS BIGINT)"

    sa = _axis(a, amin, max(1, int(amax - amin)) if amin is not None else 1)
    sb = _axis(b, bmin, max(1, int(bmax - bmin)) if bmin is not None else 1)
    out = df.selectExpr(key, f"{sa} AS hx", f"{sb} AS hy", "CAST(0 AS BIGINT) AS hd")
    for s in _levels():
        x, y, d = _step_exprs(s)
        out = out.selectExpr(key, f"({x}) AS hx", f"({y}) AS hy", f"({d}) AS hd")
    return out.selectExpr(key, "hd AS hcode")


def hilbert_oracle_sql(table: str, key: str, a: str, b: str) -> str:
    """The identical per-level expression text chained through CTEs."""
    lo_a = f"(SELECT MIN({a}) FROM {table})"
    lo_b = f"(SELECT MIN({b}) FROM {table})"
    span_a = f"greatest(1, (SELECT MAX({a}) FROM {table}) - {lo_a})"
    span_b = f"greatest(1, (SELECT MAX({b}) FROM {table}) - {lo_b})"
    ctes = [
        f"h0 AS (SELECT {key}, "
        f"CAST(floor(({a} - {lo_a}) * {SIDE - 1}.0 / {span_a}) AS BIGINT) AS hx, "
        f"CAST(floor(({b} - {lo_b}) * {SIDE - 1}.0 / {span_b}) AS BIGINT) AS hy, "
        f"CAST(0 AS BIGINT) AS hd FROM {table})"
    ]
    for i, s in enumerate(_levels(), start=1):
        x, y, d = _step_exprs(s)
        ctes.append(
            f"h{i} AS (SELECT {key}, ({x}) AS hx, ({y}) AS hy, ({d}) AS hd"
            f" FROM h{i - 1})"
        )
    chain = ",\n".join(ctes)
    return f"WITH {chain}\nSELECT {key}, hd AS hcode FROM h{LEVELS} ORDER BY {key}"
