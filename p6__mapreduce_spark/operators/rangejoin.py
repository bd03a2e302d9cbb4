"""Bin-bucketed interval (range) join — the non-equi join Spark's
optimizer has no native strategy for.

A predicate like ``p.ts BETWEEN i.start AND i.end`` with no equi-key
falls back to BroadcastNestedLoopJoin (fine only when one side is
tiny) or a cartesian product (never fine). The classic fix — used by
Databricks' range-join optimization and by every GIS engine's grid
index — is to quantize time into fixed-width bins and manufacture an
equi-key:

- each POINT lands in exactly one bin: ``floor(ts / width)``;
- each INTERVAL is exploded to every bin it overlaps (``sequence``
  over the floor-quantized endpoints — bounded by
  ``interval_len / width + 1`` rows, a plan-time constant when
  interval lengths are bounded);
- a plain shuffled equi-join on ``bin`` then a residual exact range
  filter. No duplicate elimination is needed: a (point, interval)
  match is produced exactly once because the point occupies exactly
  one bin.

At 100 TB this is the difference between a cartesian (dead) and ONE
hash-partitioned shuffle whose fan-out is the overlap factor: with
``width`` chosen ~ the median interval length, each interval explodes
to ~2 bins and each bin's population is data-proportional, so the join
parallelizes like any equi-join and AQE's skew splitting applies to
hot bins. Events at one timestamp never concentrate beyond their bin.

The reference engine has no joins at all (SURVEY.md §2.4); this is
part of the analytics surface built beyond it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 3 days, in seconds. Intervals produced by promo_window_event_stats
# are exactly 3 days long, so each explodes to at most 2 bins.
DEFAULT_BIN_SECONDS = 3 * 86400


def interval_bin_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bin_seconds: int = DEFAULT_BIN_SECONDS,
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= ts < end`` (half-open, the streaming-window convention)
    via the bin-bucket equi-join described in the module docstring.

    Both inputs keep all their columns; callers aggregate after. The
    timestamp columns must be Spark timestamps; binning uses epoch
    seconds (``unix_timestamp`` — integer, so bin assignment is exact
    and engine-independent).
    """
    p_bin = F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(bin_seconds))
    s_bin = F.floor(F.unix_timestamp(F.col(start_col)) / F.lit(bin_seconds))
    # end is exclusive: an interval ending exactly on a bin boundary
    # does not overlap the next bin, hence the -1 second nudge.
    e_bin = F.floor((F.unix_timestamp(F.col(end_col)) - 1) / F.lit(bin_seconds))

    pts = points.withColumn("_bin", p_bin)
    # drop degenerate intervals (end <= start) BEFORE the explode: the
    # half-open predicate can never match them anyway, but Spark's
    # sequence() DESCENDS when stop < start, so a corrupt far-past end
    # timestamp would otherwise fan out into thousands of waste bins
    ivs = intervals.filter(F.col(end_col) > F.col(start_col)).withColumn(
        "_bin", F.explode(F.sequence(s_bin, e_bin))
    )
    return (
        pts.join(ivs, on="_bin")
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("_bin")
    )


def promo_window_event_stats(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Per URGENT order: how many lineitems (of ANY order) shipped in
    the 3 days starting at its order date, and their total quantity —
    the "activity inside my window" shape (promo attribution, blast
    -radius analysis) that is a pure range join: no shared key exists
    between the interval and the points it captures.

    Plan: lineitem projects (l_shipdate, qty-cents) only; urgent
    orders explode to ≤2 bin rows each; one equi-shuffle on the bin,
    residual range filter, then a keyed aggregation on o_orderkey.
    Quantities sum as exact integer cents so partial-agg order cannot
    perturb the result. Left join back to the interval set so windows
    that captured nothing still report 0 — same row count as the
    urgent-order filter, verified by the oracle.
    """
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey",
        F.col("o_orderdate").alias("start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 3 DAYS")).alias("end"),
    )
    pts = lineitem.select(
        F.col("l_shipdate").alias("ts"),
        F.round(F.col("l_quantity") * 100).cast("long").alias("qty_cents"),
    )
    hits = (
        interval_bin_join(pts, urgent)
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_shipments"),
            F.sum("qty_cents").alias("sum_qty_cents"),
        )
    )
    return (
        urgent.select("o_orderkey")
        .join(hits, on="o_orderkey", how="left")
        .select(
            "o_orderkey",
            F.coalesce(F.col("n_shipments"), F.lit(0)).alias("n_shipments"),
            F.coalesce(F.col("sum_qty_cents"), F.lit(0)).alias("sum_qty_cents"),
        )
        .orderBy("o_orderkey")
    )


PROMO_WINDOW_ORACLE_SQL = """
WITH urgent AS (
  SELECT o_orderkey, o_orderdate AS s, o_orderdate + INTERVAL 3 DAY AS e
  FROM orders WHERE o_orderpriority = '1-URGENT'
), hits AS (
  SELECT u.o_orderkey, COUNT(*) AS n_shipments,
         SUM(CAST(round(l.l_quantity * 100) AS BIGINT)) AS sum_qty_cents
  FROM urgent u JOIN lineitem l
    ON l.l_shipdate >= u.s AND l.l_shipdate < u.e
  GROUP BY 1
)
SELECT u.o_orderkey,
       CAST(coalesce(h.n_shipments, 0) AS BIGINT) AS n_shipments,
       CAST(coalesce(h.sum_qty_cents, 0) AS BIGINT) AS sum_qty_cents
FROM urgent u LEFT JOIN hits h USING (o_orderkey)
ORDER BY o_orderkey
"""
