"""Time-series regularization: per-key calendar grid + forward fill.

The resample/gap-fill primitive every metrics pipeline needs (sensor
rollups, daily-active dashboards, feature snapshots for training):
turn an irregular event stream into one row per (key, period) over
each key's observed span, carrying the last observed value forward
through empty periods.

Scale shape: the grid is generated distributed — ``sequence()`` per
key row then ``explode`` (no driver loop, no cross join against a
calendar table); the only shuffles are the per-(key, period)
last-observation aggregation and the per-key window for the forward
fill. Grid cardinality = sum of key spans, linear in output. The fill
is ``last(value, ignorenulls=True)`` over an unbounded-preceding row
frame — Spark evaluates it in one pass per key partition, and the
DuckDB oracle's ``last_value(v IGNORE NULLS)`` is the identical
semantic. Values pass through untouched (no float arithmetic), so
cross-engine equality is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_daily(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """One row per (key, day) across each key's [first, last] event
    days: the day's last observation (latest ``ts``, ties broken by
    ``tiebreak_col``) forward-filled through days with no events,
    plus an ``is_observed`` flag distinguishing real from carried
    values."""
    day = F.date_trunc("day", F.col(ts_col))
    w_last = Window.partitionBy("k", "day").orderBy(
        F.col(ts_col).desc(), F.col(tiebreak_col).desc()
    )
    daily = (
        events.select(
            F.col(key_col).alias("k"), day.alias("day"), F.col(ts_col), F.col(tiebreak_col), F.col(value_col)
        )
        .withColumn("rn", F.row_number().over(w_last))
        .filter(F.col("rn") == 1)
        .select("k", "day", F.col(value_col).alias("v_obs"))
    )
    grid = (
        daily.groupBy("k")
        .agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select("k", F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day"))
    )
    w_fill = Window.partitionBy("k").orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        grid.join(daily, ["k", "day"], "left")
        .select(
            F.col("k").alias(key_col),
            "day",
            F.last("v_obs", ignorenulls=True).over(w_fill).alias("value_filled"),
            F.col("v_obs").isNotNull().alias("is_observed"),
        )
        .orderBy(key_col, "day")
    )


GAP_FILL_ORACLE_SQL = """
WITH daily AS (
  SELECT k, day, v_obs FROM (
    SELECT {key} AS k, date_trunc('day', {ts}) AS day, {value} AS v_obs,
           ROW_NUMBER() OVER (PARTITION BY {key}, date_trunc('day', {ts})
                              ORDER BY {ts} DESC, {tiebreak} DESC) AS rn
    FROM {table}
  ) WHERE rn = 1
), grid AS (
  SELECT k, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
  FROM (SELECT k, MIN(day) AS lo, MAX(day) AS hi FROM daily GROUP BY 1)
)
SELECT g.k AS {key}, g.day,
       last_value(d.v_obs IGNORE NULLS) OVER (
         PARTITION BY g.k ORDER BY g.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled,
       d.v_obs IS NOT NULL AS is_observed
FROM grid g LEFT JOIN daily d ON g.k = d.k AND g.day = d.day
ORDER BY 1, 2
"""
