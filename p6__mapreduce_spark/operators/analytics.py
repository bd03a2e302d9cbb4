"""Analytic queries over the star schema — the engine's OLAP surface.

The reference had no joins/filters/windows (SURVEY.md §2.4); these
operators are the engine's demonstration that the full declarative
surface composes on Spark: multi-way joins with broadcast dimensions,
grouped aggregation with map-side combine, window top-k, JSON
extraction.

Money sums use exact integer cents (round(x*100) per row, then a
bigint sum): partial-aggregation order cannot perturb the result, so
Spark and the DuckDB oracle agree bit-for-bit. Quantity sums are
integral-valued doubles (exact in IEEE754 up to 2^53) — safe as-is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cents(col) -> F.Column:
    return F.round(col * 100).cast("long")


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1 shape: grouped pricing summary with map-side combine,
    oracle-exact money arithmetic (integer cents).

    Plan: parquet scan with the shipdate predicate PUSHED to the
    reader, partial HashAggregate, one exchange on the 2 group keys
    (tiny cardinality), final agg + sort.
    """
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
            F.sum(_cents(disc_price)).alias("sum_disc_cents"),
            F.sum(_cents(charge)).alias("sum_charge_cents"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def revenue_by_nation(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, nation: DataFrame, region: DataFrame
) -> DataFrame:
    """Multi-way star join: fact tables shuffle on join keys; nation and
    region are broadcast (Catalyst auto-broadcasts under the 10 MB
    threshold — asserted in tests/test_plans.py). Revenue in exact
    cents."""
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(F.sum(rev).alias("revenue_cents"), F.count(F.lit(1)).alias("n_items"))
        .orderBy("r_name", "n_name")
    )


def top_orders_per_customer(orders: DataFrame, k: int = 3) -> DataFrame:
    """Window top-k: rank orders per customer by price desc (ties by
    orderkey asc — deterministic), keep the top k. One shuffle on
    o_custkey."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "o_custkey",
            "o_orderkey",
            _cents(F.col("o_totalprice")).alias("price_cents"),
            F.col("rk").cast("int").alias("rk"),
        )
        .orderBy("o_custkey", "rk")
    )


def cube_counts(lineitem: DataFrame) -> DataFrame:
    """CUBE over (returnflag, linestatus): all grouping-set combinations
    in one pass (Spark expands the sets before the single exchange)."""
    return (
        lineitem.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("l_quantity").alias("sum_qty"))
        .orderBy("l_returnflag", "l_linestatus")
    )


def status_pivot(orders: DataFrame) -> DataFrame:
    """Pivot order status into columns per priority (explicit value list
    so the plan is static — required for both Catalyst and at-scale
    schema stability)."""
    piv = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    # An empty (priority, status) cell pivots to NULL but COUNT semantics
    # (and the SQL FILTER-clause equivalent) call for 0.
    return piv.select(
        "o_orderpriority",
        *[F.coalesce(F.col(f"`{c}`"), F.lit(0)).alias(c) for c in ("O", "F", "P")],
    ).orderBy("o_orderpriority")


def asof_last_event(events: DataFrame, event_type: str = "signup") -> DataFrame:
    """As-of join (point-in-time lookup), self-form: for every event,
    the timestamp of the most recent <= event of ``event_type`` for the
    same user.

    Spark has no native as-of join; the scalable composition is a
    conditional running MAX over the event-time window — one shuffle on
    user_id, no range cross-join, state O(1) per row. The same pattern
    joins a fact stream to a slowly-changing dimension: union the two
    sources, window over the union, filter back to fact rows.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marker = F.when(F.col("event_type") == event_type, F.col("ts").cast("long"))
    return events.select(
        "event_id",
        "user_id",
        F.col("ts").cast("long").alias("ts_sec"),
        F.max(marker).over(w).alias("last_marker_sec"),
    ).orderBy("event_id")


def approx_stats(lineitem: DataFrame) -> DataFrame:
    """Approximate aggregates: HLL++ distinct counts and approximate
    quantiles — the sketches a 100 TB profile pass uses instead of
    exact DISTINCT/percentile (no full shuffle of the key space).
    Engine-specific estimators -> rows-only correctness check; exact
    counterparts are covered by distinct_sorted / tpch_q1.
    """
    q = F.percentile_approx("l_extendedprice", [0.5, 0.95], 10000)
    return (
        lineitem.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey").alias("approx_orders"),
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            q.alias("_q"),
        )
        # Scalar projections (not one array column): array cells are
        # unsortable/unhashable downstream of a pandas round-trip.
        .select(
            "l_returnflag",
            "approx_orders",
            "approx_parts",
            F.element_at("_q", 1).alias("price_p50"),
            F.element_at("_q", 2).alias("price_p95"),
        )
        .orderBy("l_returnflag")
    )


def event_json_stats(events: DataFrame) -> DataFrame:
    """JSON extraction + aggregation over the semi-structured props
    column: get_json_object stays JVM-side (Jackson), no Python."""
    k = F.get_json_object("props", "$.k").try_cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )
