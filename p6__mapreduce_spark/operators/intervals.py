"""Interval analytics: SCD Type-2 history, sweep-line concurrency,
weighted median.

Three operators every warehouse team rebuilds by hand:

* ``scd2_user_state`` — collapse an event log into Slowly-Changing-
  Dimension Type-2 validity intervals: one row per (user, state run)
  with ``valid_from`` / ``valid_to`` / ``is_current``. The standard
  dimension-history builder behind every `dim_*_history` table.
* ``peak_concurrency_daily`` — classic sweep-line: max number of
  simultaneously-open intervals per day (capacity planning, license
  audits, "how many concurrent sessions did we peak at").
* ``weighted_median_price`` — weighted median via the cumulative-
  weight window; the robust price summary when rows carry volume.

Scale shape (100 TB notes in SCALE.md):

* SCD2 is two window passes over the SAME ``(user_id) ORDER BY ts``
  partitioning — Catalyst reuses one sort+shuffle for both ``lag``
  (change detection) and ``lead`` (interval close). No joins, no
  state bigger than a row.
* The sweep-line unions +1/-1 boundary rows (map-side, no shuffle),
  then runs ONE running-sum window per day partition. Day-partitioned,
  so no global single-partition window; the running sum is an exact
  integer. Peak extraction is an ordinary groupBy.
* Weighted median collapses to the (flag, price_cents) weight
  HISTOGRAM first (map-side-partial groupBy), then runs the cumulative
  window over the histogram — per-flag window input is bounded by the
  distinct-price value domain, never the corpus row count. The
  cumulative weight is an exact BIGINT (quantities are integral); the
  median pick is min(price) over rows with 2·cum ≥ total.

Exactness: timestamps, counts, and quantized cents are the only
values that cross engines; no float arithmetic anywhere, so DuckDB
equality is bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_user_state(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """SCD Type-2 compaction of an event log.

    Consecutive events with the same ``state_col`` per key collapse
    into one validity interval; an interval runs from its first
    event's timestamp until the next *different* state's first
    timestamp (half-open, NULL ``valid_to`` for the current state,
    ``is_current`` flag). Simultaneous events are ordered by
    ``tiebreak_col`` so run boundaries are deterministic.
    """
    w = Window.partitionBy("k").orderBy("ts", "tb")
    runs = (
        events.select(
            F.col(key_col).alias("k"),
            F.col(ts_col).alias("ts"),
            F.col(state_col).alias("state"),
            F.col(tiebreak_col).alias("tb"),
        )
        # change detection: a run starts where the state differs from
        # the previous event's state (or at the key's first event)
        .withColumn("prev_state", F.lag("state").over(w))
        .withColumn(
            "is_start",
            F.col("prev_state").isNull() | (F.col("prev_state") != F.col("state")),
        )
        .filter(F.col("is_start"))
    )
    # interval close: next run's start on the same key partitioning
    w_runs = Window.partitionBy("k").orderBy("ts", "tb")
    return (
        runs.withColumn("valid_to", F.lead("ts").over(w_runs))
        .select(
            F.col("k").alias(key_col),
            F.col("state").alias(state_col),
            F.col("ts").alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
        .orderBy(key_col, "valid_from")
    )


SCD2_ORACLE_SQL = """
WITH runs AS (
  SELECT k, ts, state, tb,
         LAG(state) OVER (PARTITION BY k ORDER BY ts, tb) AS prev_state
  FROM (SELECT {key} AS k, {ts} AS ts, {state} AS state, {tiebreak} AS tb
        FROM {table})
), starts AS (
  SELECT k, ts, state, tb FROM runs
  WHERE prev_state IS NULL OR prev_state <> state
)
SELECT k AS {key}, state AS {state},
       ts AS valid_from,
       LEAD(ts) OVER (PARTITION BY k ORDER BY ts, tb) AS valid_to,
       LEAD(ts) OVER (PARTITION BY k ORDER BY ts, tb) IS NULL AS is_current
FROM starts
ORDER BY 1, 3
"""


def peak_concurrency_daily(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    duration_minutes: int = 30,
) -> DataFrame:
    """Max concurrent open intervals per day, sweep-line style.

    Each event opens an interval ``[ts, ts + duration)``. Boundary
    rows (+1 at open, −1 at close) are unioned map-side; a running
    sum ordered by ``(boundary ts, delta)`` inside each day partition
    gives the live count (closes sort before opens at the same
    instant — the standard half-open convention, so an interval
    ending exactly when another starts does not double-count).

    DAY-ATTRIBUTION SEMANTICS (deliberate, matches the oracle): each
    interval belongs entirely to its OPEN day — closes landing past
    midnight discharge within that day's sweep, so ``peak_concurrent``
    for day D is the peak among intervals OPENED on D. A day's peak
    therefore excludes carry-over from intervals opened the previous
    day; with the default 30-minute duration the discrepancy window is
    the first 30 minutes after midnight, and it grows with duration
    (durations approaching 24 h make the open-day reading materially
    undercount next-day concurrency). This is the "sessions started
    per day" reading, the right one for license/burst audits keyed to
    arrival cohorts. For true calendar-day concurrency, pre-split each
    interval at midnight boundaries (one ``sequence(day_open,
    day_close)`` explode — bounded by ⌈duration/1 day⌉ + 1 rows per
    event) and feed the pieces to this same sweep; the operator's
    day-partitioned shape is unchanged.
    """
    # ONE corpus scan: each event emits its +1/-1 boundary pair via an
    # inline-array explode (a union of two selects would scan twice)
    bounds = events.select(
        F.date_trunc("day", F.col(ts_col)).alias("day"),
        F.explode(
            F.array(
                F.struct(F.col(ts_col).alias("bts"), F.lit(1).alias("delta")),
                F.struct(
                    (
                        F.col(ts_col)
                        + F.expr(f"INTERVAL {int(duration_minutes)} MINUTES")
                    ).alias("bts"),
                    F.lit(-1).alias("delta"),
                ),
            )
        ).alias("b"),
    ).select("day", F.col("b.bts").alias("bts"), F.col("b.delta").alias("delta"))
    w = (
        Window.partitionBy("day")
        .orderBy("bts", "delta")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    swept = bounds.withColumn("live", F.sum("delta").over(w))
    return (
        swept.groupBy("day")
        .agg(
            F.max("live").alias("peak_concurrent"),
            F.min(F.when(F.col("delta") == 1, F.col("bts"))).alias("first_open"),
        )
        .orderBy("day")
    )


PEAK_CONCURRENCY_ORACLE_SQL = """
WITH bounds AS (
  SELECT date_trunc('day', {ts}) AS day, {ts} AS bts, 1 AS delta FROM {table}
  UNION ALL
  SELECT date_trunc('day', {ts}) AS day,
         {ts} + INTERVAL {minutes} MINUTES AS bts, -1 AS delta FROM {table}
), swept AS (
  SELECT day, bts, delta,
         CAST(SUM(delta) OVER (PARTITION BY day ORDER BY bts, delta
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS live
  FROM bounds
)
SELECT day, CAST(MAX(live) AS BIGINT) AS peak_concurrent,
       MIN(CASE WHEN delta = 1 THEN bts END) AS first_open
FROM swept GROUP BY day ORDER BY day
"""


def weighted_median_price(lineitem: DataFrame) -> DataFrame:
    """Quantity-weighted (lower) median of ``l_extendedprice`` per
    ``l_returnflag``: the first price, scanning ascending, whose
    cumulative quantity reaches half the group total. Prices quantize
    to exact cents; quantities are integral.

    Two-phase histogram shape (the r5-verdict fix): the corpus first
    collapses to the ``(flag, price_cents)`` weight histogram — an
    ordinary map-side-partial groupBy, fully parallel — and only THEN
    runs the cumulative window, whose per-flag input is bounded by the
    price VALUE DOMAIN (distinct cents values), never by row count.
    The naive single-pass form funneled ~|lineitem|/3 rows through one
    window task per flag (|flags| = 3, a constant fraction of the
    corpus at any scale). The median is a pure function of the
    per-price cumulative weights, so the row-level tie order of the
    original formulation (``l_orderkey, l_linenumber``) cannot change
    which PRICE first reaches half the total — result identical, plan
    scale-safe. The final pick needs no second window: the lower
    weighted median is simply ``min(price_cents)`` over the rows with
    ``2·cum ≥ total``.
    """
    q = lineitem.select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_cents"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    hist = q.groupBy("flag", "price_cents").agg(F.sum("w").alias("w"))
    w_cum = (
        Window.partitionBy("flag")
        .orderBy("price_cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("flag")
    ranked = hist.withColumn("cum_w", F.sum("w").over(w_cum)).withColumn(
        "tot_w", F.sum("w").over(w_tot)
    )
    return (
        ranked.filter(F.col("cum_w") * 2 >= F.col("tot_w"))
        .groupBy("flag")
        .agg(
            F.min("price_cents").alias("wmedian_price_cents"),
            F.max("tot_w").alias("total_quantity"),
        )
        .select(
            F.col("flag").alias("l_returnflag"),
            "wmedian_price_cents",
            "total_quantity",
        )
        .orderBy("l_returnflag")
    )


WEIGHTED_MEDIAN_ORACLE_SQL = """
WITH q AS (
  SELECT l_returnflag AS flag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
         CAST(l_quantity AS BIGINT) AS w, l_orderkey, l_linenumber
  FROM lineitem
), ranked AS (
  SELECT flag, price_cents, w, l_orderkey, l_linenumber,
         CAST(SUM(w) OVER (PARTITION BY flag
                      ORDER BY price_cents, l_orderkey, l_linenumber
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_w,
         CAST(SUM(w) OVER (PARTITION BY flag) AS BIGINT) AS tot_w
  FROM q
), hits AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY flag
              ORDER BY price_cents, l_orderkey, l_linenumber) AS rn
  FROM ranked WHERE cum_w * 2 >= tot_w
)
SELECT flag AS l_returnflag, price_cents AS wmedian_price_cents,
       tot_w AS total_quantity
FROM hits WHERE rn = 1 ORDER BY 1
"""
