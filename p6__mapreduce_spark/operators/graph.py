"""Weighted PageRank over an aggregated entity graph.

The two-phase shape every corpus-scale graph centrality job takes:
(1) a DISTRIBUTED edge aggregation boils the 100 TB fact table down to
a (src, dst, weight) matrix whose size is bounded by the entity
vocabulary, never the row count; (2) a fixed number of power-iteration
rounds runs over that bounded matrix as plain joins + integer sums —
the same two layers as `operators/textrank.py`, lifted from a per-doc
token graph to the corpus-level entity graph (and the same
architecture as GraphX/Pregel PageRank, whose per-superstep message
aggregation is exactly the contribution groupBy below).

Exactness discipline (cross-engine, partition-order independent):
edge weights quantize to int64 cents PER ROW before the integer sum;
ranks live as int64 at a 1e12 scale; every per-edge contribution is
one fixed-shape double expression round(d * r * w / W) whose operands
are exact int64 — IEEE doubles make each elementary op deterministic,
and the only reduction over doubles is avoided entirely because
contributions are rounded back to int64 BEFORE summation (float sums
depend on partition order; integer sums don't). Dangling mass (nodes
with no out-edges) is redistributed uniformly per the standard
formulation (Page et al. 1999).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000  # rank fixed-point scale (1e12)


def nation_trade_pagerank(
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    *,
    iters: int = 3,
    damping: float = 0.85,
    rest: float = 0.15,
) -> DataFrame:
    """(nation_key, n_name, pr_q, out_w_q): PageRank of the nation
    trade network — edge src→dst weighted by total discounted revenue
    (int64 cents) flowing from supplier-nation src to customer-nation
    dst — after ``iters`` damped power-iteration rounds from a uniform
    start.

    Plan: lineitem→orders is the one big shuffle; customer and
    supplier sides broadcast; the edge matrix (<= N^2 rows, N = nation
    count) is localCheckpoint-ed once and every iteration is joins
    over that bounded relation — per-round cost independent of corpus
    size, the property that lets the loop run as many rounds as needed
    at 100 TB. ``rest`` is passed as its own literal rather than
    computed as 1 - damping (1 - 0.85 and the literal 0.15 are
    DIFFERENT doubles; both engines must parse the same constant)."""
    rev_q = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * F.lit(100.0)
    ).cast("long")
    edges = (
        lineitem.select("l_orderkey", "l_suppkey", rev_q.alias("rev_q"))
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy(F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst"))
        .agg(F.sum("rev_q").alias("w"))
        .localCheckpoint(eager=True)  # <= N^2 rows; reused every round
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    nodes = nation.select(F.col("n_nationkey").alias("node"), "n_name")
    nn = nodes.agg(F.count(F.lit(1)).alias("nn"))

    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "node", F.round(F.lit(float(SCALE)) / F.col("nn")).cast("long").alias("r")
    )
    for _ in range(iters):
        contrib = (
            edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outw, "src")
            .select(
                "dst",
                F.round(F.lit(damping) * F.col("r") * F.col("w") / F.col("out_w"))
                .cast("long")
                .alias("c"),
            )
        )
        inflow = contrib.groupBy("dst").agg(F.sum("c").alias("inflow"))
        dang = (
            ranks.join(outw.withColumnRenamed("src", "node"), "node", "left")
            .filter(F.col("out_w").isNull())
            .agg(F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("d_mass"))
        )
        ranks = (
            nodes.select("node")
            .join(inflow.withColumnRenamed("dst", "node"), "node", "left")
            .crossJoin(F.broadcast(dang))
            .crossJoin(F.broadcast(nn))
            .select(
                "node",
                (
                    F.round(F.lit(rest) * F.lit(float(SCALE)) / F.col("nn")).cast("long")
                    + F.round(F.lit(damping) * F.col("d_mass").cast("double") / F.col("nn")).cast(
                        "long"
                    )
                    + F.coalesce(F.col("inflow"), F.lit(0).cast("long"))
                ).alias("r"),
            )
        )
    return (
        ranks.join(nodes, "node")
        .join(outw.withColumnRenamed("src", "node"), "node", "left")
        .select(
            F.col("node").alias("nation_key"),
            "n_name",
            F.col("r").alias("pr_q"),
            F.coalesce(F.col("out_w"), F.lit(0).cast("long")).alias("out_w_q"),
        )
        .orderBy(F.desc("pr_q"), "nation_key")
    )


def pagerank_oracle_sql(*, iters: int = 3, damping: float = 0.85, rest: float = 0.15) -> str:
    """DuckDB replica: the edge aggregation plus every power-iteration
    round unrolled as CTEs (the `kmeans._iteration_sql` pattern) with
    the identical fixed-shape double expressions."""
    d, rst = repr(float(damping)), repr(float(rest))
    parts = [
        """edges AS (
  SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
         CAST(SUM(CAST(round(l.l_extendedprice * (1.0e0 - l.l_discount) * 100.0e0)
                  AS BIGINT)) AS BIGINT) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
)""",
        "outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS out_w FROM edges GROUP BY 1)",
        "nnv AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM nation)",
        f"""r0 AS (
  SELECT n_nationkey AS node,
         CAST(round(CAST({SCALE} AS DOUBLE) / nn.nn) AS BIGINT) AS r
  FROM nation CROSS JOIN nnv nn
)""",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""c{i} AS (
  SELECT e.dst, CAST(round({d} * r.r * e.w / o.out_w) AS BIGINT) AS c
  FROM edges e JOIN r{i - 1} r ON r.node = e.src JOIN outw o ON o.src = e.src
)"""
        )
        parts.append(
            f"""d{i} AS (
  SELECT CAST(COALESCE(SUM(r.r), 0) AS BIGINT) AS d_mass
  FROM r{i - 1} r LEFT JOIN outw o ON o.src = r.node
  WHERE o.out_w IS NULL
)"""
        )
        parts.append(
            f"""r{i} AS (
  SELECT n.node,
         CAST(round({rst} * CAST({SCALE} AS DOUBLE) / nn.nn) AS BIGINT)
           + CAST(round({d} * CAST(dg.d_mass AS DOUBLE) / nn.nn) AS BIGINT)
           + COALESCE(i.inflow, 0) AS r
  FROM (SELECT n_nationkey AS node FROM nation) n
  LEFT JOIN (SELECT dst AS node, CAST(SUM(c) AS BIGINT) AS inflow
             FROM c{i} GROUP BY 1) i USING (node)
  CROSS JOIN d{i} dg CROSS JOIN nnv nn
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT r.node AS nation_key, n.n_name, CAST(r.r AS BIGINT) AS pr_q,
       CAST(COALESCE(o.out_w, 0) AS BIGINT) AS out_w_q
FROM r{iters} r
JOIN nation n ON n.n_nationkey = r.node
LEFT JOIN outw o ON o.src = r.node
ORDER BY pr_q DESC, nation_key"""
    )
