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
    keys: tuple[str, ...] = (),
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= ts < end`` (half-open, the streaming-window convention)
    via the bin-bucket equi-join described in the module docstring.

    Both inputs keep all their columns; callers aggregate after. The
    timestamp columns must be Spark timestamps; binning uses epoch
    seconds (``unix_timestamp`` — integer, so bin assignment is exact
    and engine-independent).

    ``keys``: extra same-named equi-columns joined ALONGSIDE the bin
    (e.g. ``("user_id",)`` for a per-user conversion window). This is
    the hot-key defense for keyed range joins: with the key alone, one
    Zipfian user concentrates its clicks x purchases cross product in
    a single task (measured 10x at a 50%-hot key, r10 skew audit);
    compounding the time bin into the join key splits that user's pair
    space across every active bin, so AQE's skew handling sees
    orderly, bounded partitions. Uniform-data cost is one extra join
    column and a <= 2-row explode on the interval side.
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
        pts.join(ivs, on=[*keys, "_bin"])
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


def conversion_window_pairs(
    events: DataFrame,
    *,
    touch_type: str = "click",
    conversion_type: str = "purchase",
    window_seconds: int = 3600,
) -> DataFrame:
    """(click_id, purchase_id, p_cents, click_ts) pairs: every
    conversion joined to the same user's touches in the preceding
    ``window_seconds`` (half-open — touch strictly before, within the
    window). The shared pair stage of the attribution queries.

    Plan: keyed bin-bucket join on (user_id, hour-bin) — the
    conversion's lookback interval spans <= 2 bins of the window
    width, the touch occupies exactly 1, so each true pair is produced
    once and NO per-user cross product ever materializes. With
    user_id alone as the join key, a hot user (50% of events — the
    r10 skew audit's regime) put ~6M click x purchase candidates in
    ONE task before the time filter ran: 10x wall-clock at sf0.1,
    unbounded at corpus scale. Binning the key bounds each task by
    the user's per-hour activity instead of their lifetime total.
    """
    touches = events.filter(F.col("event_type") == touch_type).select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    conversions = events.filter(F.col("event_type") == conversion_type).select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        F.round(F.col("value") * 100).cast("long").alias("p_cents"),
        (F.col("ts") - F.expr(f"INTERVAL {window_seconds} SECONDS")).alias("start"),
        F.col("ts").alias("end"),
    )
    return interval_bin_join(
        touches,
        conversions,
        ts_col="click_ts",
        bin_seconds=window_seconds,
        keys=("user_id",),
    ).select("click_id", "purchase_id", "p_cents", "click_ts")
