"""Market-basket association rules over order line items — the
support/confidence/lift core of frequent-itemset mining (Agrawal &
Srikant 1994), specialized to pairs.

Full Apriori/FP-growth generality is unnecessary for the dominant
retail question ("which parts co-occur in orders beyond chance?") and
its generic-candidate explosion is exactly what kills naive ports at
scale. Pair mining has a tight distributed shape:

- collapse lineitem to DISTINCT (order, part) — one shuffle;
- self-join WITHIN the order key: the join is equi on l_orderkey, so
  pair fan-out is Σ k_o·(k_o−1)/2 over per-order item counts k_o —
  linear in orders for bounded basket sizes (TPC-H ~4, retail ~10),
  never corpus²; a pathological mega-basket is an input-data property
  surfaced by the basket-size profile, not a plan hazard;
- aggregate pair supports, join the two per-part support legs, and a
  1-row order-count scalar for lift.

Exactness: supports are integer counts; confidence and lift are each
ONE IEEE division of exact int64 products, so the DuckDB oracle
matches bit-for-bit. ``min_pair_support`` prunes the hapax-pair tail
(noise for rule purposes AND the bulk of the output) AFTER supports
are computed, so surviving statistics are unaffected by the cut.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def basket_part_pairs(lineitem: DataFrame, min_pair_support: int = 3) -> DataFrame:
    """(part1, part2, supp_pair, supp1, supp2, n_orders, confidence,
    lift): association statistics for part pairs co-occurring in at
    least ``min_pair_support`` orders. confidence = P(part2 | part1)
    with part1 < part2 (the symmetric direction is derivable);
    lift > 1 ⇔ co-occurrence beyond independence."""
    items = lineitem.select("l_orderkey", "l_partkey").distinct()
    supp = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("supp"))
    a = items.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("part1"))
    b = items.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("part2"))
    pairs = (
        a.join(b, "o")
        .filter(F.col("part1") < F.col("part2"))
        .groupBy("part1", "part2")
        .agg(F.count(F.lit(1)).alias("supp_pair"))
        .filter(F.col("supp_pair") >= min_pair_support)
    )
    n_orders = items.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )
    s1 = supp.select(F.col("l_partkey").alias("part1"), F.col("supp").alias("supp1"))
    s2 = supp.select(F.col("l_partkey").alias("part2"), F.col("supp").alias("supp2"))
    return (
        pairs.join(s1, "part1")
        .join(s2, "part2")
        .crossJoin(F.broadcast(n_orders))  # 1-row scalar broadcast (labeled)
        .select(
            "part1",
            "part2",
            "supp_pair",
            "supp1",
            "supp2",
            "n_orders",
            (F.col("supp_pair") * F.lit(1.0) / F.col("supp1")).alias("confidence"),
            (
                (F.col("supp_pair") * F.col("n_orders"))
                * F.lit(1.0)
                / (F.col("supp1") * F.col("supp2"))
            ).alias("lift"),
        )
        .orderBy("part1", "part2")
    )


BASKET_ORACLE_SQL = """
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), supp AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS supp FROM items GROUP BY 1
), pairs AS (
  SELECT a.l_partkey AS part1, b.l_partkey AS part2,
         CAST(COUNT(*) AS BIGINT) AS supp_pair
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {min_pair_support}
), n AS (
  SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM items
)
SELECT p.part1, p.part2, p.supp_pair, s1.supp AS supp1, s2.supp AS supp2,
       n.n_orders,
       p.supp_pair * 1.0e0 / s1.supp AS confidence,
       (p.supp_pair * n.n_orders) * 1.0e0 / (s1.supp * s2.supp) AS lift
FROM pairs p
JOIN supp s1 ON s1.l_partkey = p.part1
JOIN supp s2 ON s2.l_partkey = p.part2
CROSS JOIN n
ORDER BY p.part1, p.part2
"""


def basket_oracle_sql(min_pair_support: int = 3) -> str:
    return BASKET_ORACLE_SQL.format(min_pair_support=min_pair_support)
