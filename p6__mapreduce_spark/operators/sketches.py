"""Count-Min Sketch: mergeable heavy-hitter counting.

The streaming/mergeable counterpart of exact GROUP BY counting
(Cormode & Muthukrishnan 2005): a depth x width integer matrix where
each of ``depth`` independent hash rows increments one of ``width``
cells per item. Estimates are upper bounds (min over rows), with
overestimate bounded by ~ 2N/width at 1 - (1/2)^depth confidence. The
reason it exists at 100 TB: the sketch is a FIXED-SIZE relation that
merges by cell-wise addition — per-day sketches roll up to
month/all-time without rescanning days, exactly like the HLL rollup in
``operators/analytics.distinct_users_sketch_rollup``, but for
frequencies rather than cardinalities.

Everything is exact integer arithmetic over portable polynomial
hashes, so the sketch — and every estimate read from it — is
bit-identical across engines and partitionings; the DuckDB oracle
rebuilds the same matrix and the same estimates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from p6__mapreduce_spark.functions.hashing import poly_hash_expr


def _row_hash(col: str | Column, seed: int, width: int) -> Column:
    # independent rows via distinct hash seeds; the seed folds into the
    # polynomial like a virtual first character
    return poly_hash_expr(col, seed=seed) % F.lit(width)


def count_min_sketch(
    items: DataFrame, col: str, *, depth: int = 4, width: int = 256
) -> DataFrame:
    """(row, cell, cnt): the CMS matrix of the items' frequency
    distribution. ONE pass, one bounded shuffle: each item maps to
    ``depth`` (row, cell) increments (map-side array, exploded), the
    aggregation is partial-combined, and the output is at most
    depth*width rows regardless of input size."""
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"), _row_hash(col, 1 + r, width).alias("cell")
            )
            for r in range(depth)
        ]
    )
    return (
        items.select(F.explode(cells).alias("rc"))
        .groupBy(F.col("rc.row").alias("row"), F.col("rc.cell").alias("cell"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_token_audit(
    docs: DataFrame, *, depth: int = 4, width: int = 256, top: int = 20
) -> DataFrame:
    """(token, exact_cnt, cms_est) for the ``top`` true-heaviest corpus
    tokens: the accuracy audit to run before trusting sketch counts at
    scale (the CMS analogue of ``minhash_estimate_error``). The
    estimate is min over rows of the matrix cell each row hashes the
    token to — a broadcast join of the tiny top-token set against the
    bounded sketch. CMS guarantees est >= exact; the audit shows the
    collision inflation actually realized on this corpus/geometry."""
    from p6__mapreduce_spark.functions.text import tokens_expr

    toks = docs.select(F.explode(tokens_expr("text")).alias("token"))
    sketch = count_min_sketch(toks, "token", depth=depth, width=width)
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("exact_cnt"))
    heavy = exact.orderBy(F.desc("exact_cnt"), "token").limit(top)
    probes = heavy.select(
        "token",
        "exact_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _row_hash("token", 1 + r, width).alias("cell"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rc"),
    ).select("token", "exact_cnt", F.col("rc.row").alias("row"), F.col("rc.cell").alias("cell"))
    return (
        probes.join(F.broadcast(sketch), ["row", "cell"])
        .groupBy("token")
        .agg(
            F.max("exact_cnt").alias("exact_cnt"),
            F.min("cnt").alias("cms_est"),
        )
        .orderBy(F.desc("exact_cnt"), "token")
    )


def cms_audit_oracle_sql(*, depth: int = 4, width: int = 256, top: int = 20) -> str:
    """DuckDB replica of :func:`cms_token_audit` (same hashes, same
    matrix, same min-over-rows estimate)."""
    from p6__mapreduce_spark.operators.text_analysis import (
        TOKENS_ORACLE,
        poly_hash_oracle_sql,
    )

    toks = TOKENS_ORACLE.format(col="text")
    probe_rows = " UNION ALL ".join(
        f"SELECT token, exact_cnt, {r} AS row,"
        f" {poly_hash_oracle_sql('token', seed=1 + r)} % {width} AS cell FROM heavy"
        for r in range(depth)
    )
    cell_rows = " UNION ALL ".join(
        f"SELECT {r} AS row,"
        f" {poly_hash_oracle_sql('token', seed=1 + r)} % {width} AS cell FROM toks"
        for r in range(depth)
    )
    return f"""
    WITH toks AS (
      SELECT unnest({toks}) AS token FROM documents
    ), sketch AS (
      SELECT row, cell, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM ({cell_rows}) GROUP BY 1, 2
    ), exact AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_cnt FROM toks GROUP BY 1
    ), heavy AS (
      SELECT token, exact_cnt FROM exact ORDER BY exact_cnt DESC, token LIMIT {top}
    ), probes AS ({probe_rows})
    SELECT token, MAX(exact_cnt) AS exact_cnt, CAST(MIN(cnt) AS BIGINT) AS cms_est
    FROM probes JOIN sketch USING (row, cell)
    GROUP BY token ORDER BY exact_cnt DESC, token
    """
