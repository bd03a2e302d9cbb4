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


def grid_quantile_sketch(
    events: DataFrame,
    col: str = "value",
    group: str = "event_type",
    *,
    bins: int = 4096,
    inv_width: int = 8,
    q_bps: tuple[int, ...] = (5000, 9000, 9900),
) -> DataFrame:
    """(group, q_bp, n, est_value): quantile estimates per group from a
    FIXED-GRID mergeable histogram — the bounded-state alternative to a
    full sort when "p50/p90/p99 per key over 100 TB" is the ask.

    Each value maps to bin = clamp(floor(value * inv_width), 0,
    bins-1) (the top bin absorbs overflow — estimates saturate at the
    grid edge, the documented trade of a fixed grid); the per-(group,
    bin) counts are the ENTIRE sketch state: <= groups x bins rows
    regardless of input size, built map-side with partial aggregation
    — per-partition histograms merge by cell-wise addition exactly
    like the CMS above, so day->month->all-time rollups never rescan.
    The q-th estimate is the lower edge of the first bin whose
    cumulative count reaches ceil(n * q) — integer arithmetic
    throughout (targets via integer ceil-division, edges via an exact
    binary fraction), so estimates replay bit-for-bit cross-engine,
    unlike t-digest/GK sketches whose merge order changes the answer.
    The window runs over the bounded histogram (<= bins rows per
    group-partition), never the raw events."""
    from pyspark.sql import Window

    b = F.least(
        F.greatest(F.floor(F.col(col) * F.lit(float(inv_width))).cast("long"), F.lit(0)),
        F.lit(bins - 1),
    )
    # NULL measurements are excluded in BOTH engines (a NULL bin would
    # otherwise sort NULLS FIRST in Spark vs NULLS LAST in DuckDB
    # inside the cumulative window — a cross-engine divergence trap)
    hist = (
        events.filter(F.col(col).isNotNull())
        .groupBy(F.col(group), b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cum = hist.select(
        group,
        "bin",
        F.sum("cnt")
        .over(Window.partitionBy(group).orderBy("bin").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
        F.sum("cnt").over(Window.partitionBy(group)).alias("n"),
    )
    t = cum.select(
        group,
        "bin",
        "cum",
        "n",
        F.explode(F.lit([int(q) for q in q_bps]).cast("array<long>")).alias("q_bp"),
    ).withColumn(
        "target_rank",
        F.floor((F.col("n") * F.col("q_bp") + F.lit(9999)) / F.lit(10000)).cast("long"),
    )
    return (
        t.filter(F.col("cum") >= F.col("target_rank"))
        .groupBy(group, "q_bp")
        .agg(F.max("n").alias("n"), F.min("bin").alias("est_bin"))
        .select(
            group,
            "q_bp",
            "n",
            (F.col("est_bin") * F.lit(1.0 / inv_width)).alias("est_value"),
        )
        .orderBy(group, "q_bp")
    )


def grid_quantile_oracle_sql(
    *, bins: int = 4096, inv_width: int = 8, q_bps: tuple[int, ...] = (5000, 9000, 9900)
) -> str:
    """DuckDB replica of :func:`grid_quantile_sketch` over events
    (identical binning, targets and edge arithmetic)."""
    qlist = ", ".join(str(q) for q in q_bps)
    return f"""
    WITH hist AS (
      SELECT event_type,
             LEAST(GREATEST(CAST(floor(value * {float(inv_width)}) AS BIGINT), 0),
                   {bins - 1}) AS bin,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    ), cum AS (
      SELECT event_type, bin,
             CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS BIGINT) AS cum,
             CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM hist
    ), t AS (
      SELECT c.event_type, c.bin, c.cum, c.n, CAST(q.q_bp AS BIGINT) AS q_bp,
             CAST(floor((c.n * q.q_bp + 9999) * 1.0e0 / 10000) AS BIGINT) AS target_rank
      FROM cum c CROSS JOIN (SELECT unnest([{qlist}]) AS q_bp) q
    )
    SELECT event_type, q_bp, MAX(n) AS n,
           MIN(bin) * {1.0 / inv_width!r} AS est_value
    FROM t WHERE cum >= target_rank
    GROUP BY 1, 2 ORDER BY event_type, q_bp
    """


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
