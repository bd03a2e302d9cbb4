"""Distributed Lloyd k-means over the full embeddings table, exactly
cross-engine reproducible.

`similarity/ivf.py` trains centroids driver-side on a bounded sample;
this module is the complementary *distributed* trainer: every Lloyd
iteration scans the whole table, the per-cluster statistics (count +
per-dimension coordinate sums) are computed by Spark, and only k×d
integers return to the driver to form the next round's centroids —
exactly how Spark MLlib's KMeans iterates (collect-and-rebroadcast of
a few KB per round), so the shape survives 100 TB unchanged: per
iteration one map-side assignment pass (nested-array centroid literal,
same Janino-safe pattern as ``ivf._scores_expr``) and one shuffle
whose payload is the k×d partial sums per map task, never the vectors.

What makes it *exactly* oracle-checkable — normally impossible for
float k-means because per-cluster mean is a float sum whose value
depends on addition order — is coordinate quantization: embeddings are
scaled by 1e6 and rounded to int64 up front, so distances and cluster
sums are exact integer arithmetic (order-independent), and the single
rounding in the centroid update (round(sum/count), half away from
zero) is applied to a ratio of exact integers, which every engine's
double division computes bit-identically. The algorithm is honestly
"k-means on 1e-6-quantized coordinates": same clustering behavior
(quantization error 5e-7 per coordinate vs. embedding scale ~0.3),
deterministic everywhere.

Init = the embeddings of the k smallest ids (deterministic,
data-defined, no RNG); an empty cluster keeps its previous centroid
(standard Lloyd fallback), mirrored by the oracle's LEFT JOIN +
COALESCE.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUANT = 1_000_000


def quantized_expr(vec_col: str) -> Column:
    """array<bigint>: round(coord * 1e6), half away from zero — Spark's
    BigDecimal HALF_UP on the exact double equals DuckDB's std::round."""
    return F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * F.lit(float(QUANT))).cast("long"),
    )


def _best_expr(e_col: str, cents: list[list[int]]) -> Column:
    """struct<d: squared L2 distance (exact bigint), i: cluster id> of
    the nearest centroid; ``array_min`` over (d, i) structs breaks
    distance ties toward the lowest cluster id. The centroid matrix is
    ONE nested-array literal (data, not unrolled code — see
    ivf._scores_expr for the Janino compile-time rationale)."""
    matrix = F.lit([[int(x) for x in c] for c in cents])

    def dist(c: Column, i: Column) -> Column:
        d = F.aggregate(
            F.zip_with(F.col(e_col), c, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        return F.struct(d.alias("d"), i.cast("long").alias("i"))

    return F.array_min(F.transform(matrix, dist))


def _round_half_away(v: float) -> int:
    """round-half-away-from-zero on the exact double value — matches
    DuckDB round(DOUBLE) and Spark round(); Python's built-in round()
    is banker's rounding and math.floor(v + 0.5) misrounds doubles just
    below .5, so go through exact Decimal."""
    return int(Decimal(v).quantize(Decimal("1"), rounding=ROUND_HALF_UP))


def lloyd_train(q: DataFrame, k: int, iters: int) -> list[list[int]]:
    """The driver-coordinated Lloyd loop over a (vec_id, e) DataFrame
    of quantized int64 vectors: init = the k smallest ids' vectors,
    per round one map-side assignment + one k-row partial-agg shuffle,
    k*d ints back to the driver. Shared by kmeans_lloyd and the
    product quantizer (which trains one codebook per subspace)."""
    init = q.filter(F.col("vec_id") < k).orderBy("vec_id").select("vec_id", "e").collect()
    cents: list[list[int]] = [list(r.e) for r in init]
    d = len(cents[0])
    for _ in range(iters):
        assigned = q.select(_best_expr("e", cents).getField("i").alias("cluster_id"), "e")
        stats = (
            assigned.groupBy("cluster_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[F.sum(F.element_at("e", i + 1)).alias(f"s{i}") for i in range(d)],
            )
            .collect()
        )
        by_cluster = {int(r.cluster_id): r for r in stats}
        cents = [
            [
                _round_half_away(by_cluster[c][f"s{i}"] * 1.0 / by_cluster[c]["n"])
                for i in range(d)
            ]
            if c in by_cluster
            else cents[c]  # empty cluster: keep previous centroid
            for c in range(k)
        ]
    return cents


def kmeans_lloyd(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """`iters` Lloyd rounds then a final assignment; returns one row per
    (cluster_id, dim): the final centroid coordinate plus the cluster's
    point count and total inertia (exploded layout so every output cell
    is a scalar integer — hash-stable across engines, no array-
    rendering ambiguity).

    Driver memory is k×d int64 per round regardless of table size; the
    per-round Spark job is scan → map-side assignment → partial-agg
    shuffle of k rows × (d+1) columns.
    """
    spark = embeddings.sparkSession
    # one materialization feeds init + every iteration + the final
    # stats (2*iters + 2 separate jobs otherwise re-scan the source and
    # re-quantize each time — measured ~40% of wall at sf0.1); at
    # cluster scale this is the written quantized-features intermediate
    q = embeddings.select(
        F.col(id_col).alias("vec_id"), quantized_expr(vec_col).alias("e")
    ).localCheckpoint(eager=True)

    cents = lloyd_train(q, k, iters)
    best = _best_expr("e", cents)
    final_stats = (
        q.select(
            best.getField("i").alias("cluster_id"), best.getField("d").alias("dist")
        )
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n_points"), F.sum("dist").alias("inertia_q"))
    )
    cent_rows = [
        (c, dim + 1, int(coord))
        for c, cent in enumerate(cents)
        for dim, coord in enumerate(cent)
    ]
    cent_df = spark.createDataFrame(cent_rows, "cluster_id long, dim long, coord_q long")
    return (
        cent_df.join(F.broadcast(final_stats), "cluster_id", "left")
        .select(
            "cluster_id",
            "dim",
            "coord_q",
            F.coalesce("n_points", F.lit(0).cast("long")).alias("n_points"),
            F.coalesce("inertia_q", F.lit(0).cast("long")).alias("inertia_q"),
        )
        .orderBy("cluster_id", "dim")
    )


def _iteration_sql(prev: str, nxt: str, step: int, k: int, *, src: str = "q", pre: str = "") -> str:
    """One unrolled Lloyd round: assignment (window argmin with the
    same (distance, cluster_id) tie-break), per-(cluster, dim) integer
    sums, centroid update with empty-cluster COALESCE. ``src`` names
    the quantized-vectors CTE and ``pre`` prefixes the working CTE
    names so multiple chains (one per PQ subspace) can coexist in a
    single WITH."""
    return f"""
{pre}a{step} AS (
  SELECT vec_id, e, cluster_id,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cluster_id) AS rn
  FROM (
    SELECT q.vec_id, q.e, c.cluster_id,
           CAST(list_sum(list_transform(list_zip(q.e, c.c),
                z -> (z[1] - z[2]) * (z[1] - z[2]))) AS BIGINT) AS dist
    FROM {src} q CROSS JOIN {prev} c
  )
),
{pre}s{step} AS (
  SELECT cluster_id, dim, CAST(SUM(v) AS BIGINT) AS s, COUNT(*) AS n
  FROM (SELECT cluster_id, generate_subscripts(e, 1) AS dim, unnest(e) AS v
        FROM {pre}a{step} WHERE rn = 1)
  GROUP BY 1, 2
),
{nxt}x AS (
  SELECT p.cluster_id, p.dim,
         COALESCE(CAST(round(s.s * 1.0 / s.n) AS BIGINT), p.coord) AS coord
  FROM (SELECT cluster_id, generate_subscripts(c, 1) AS dim, unnest(c) AS coord
        FROM {prev}) p
  LEFT JOIN {pre}s{step} s USING (cluster_id, dim)
),
{nxt} AS (
  SELECT cluster_id, list(coord ORDER BY dim) AS c FROM {nxt}x GROUP BY 1
)"""


def kmeans_oracle_sql(k: int = 8, iters: int = 2) -> str:
    """The identical computation as straight DuckDB SQL (no literals:
    init, every iteration, and the final stats all run in-query)."""
    rounds = ",".join(
        _iteration_sql(f"c{i}", f"c{i + 1}", i + 1, k) for i in range(iters)
    )
    fin = iters
    return f"""
WITH q AS (
  SELECT vec_id,
         [CAST(round(CAST(x AS DOUBLE) * {QUANT}.0) AS BIGINT) for x in embedding] AS e
  FROM embeddings
),
c0 AS (SELECT vec_id AS cluster_id, e AS c FROM q WHERE vec_id < {k}),
{rounds},
af AS (
  SELECT vec_id, cluster_id, dist,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cluster_id) AS rn
  FROM (
    SELECT q.vec_id, c.cluster_id,
           CAST(list_sum(list_transform(list_zip(q.e, c.c),
                z -> (z[1] - z[2]) * (z[1] - z[2]))) AS BIGINT) AS dist
    FROM q CROSS JOIN c{fin} c
  )
),
st AS (
  SELECT cluster_id, COUNT(*) AS n_points, CAST(SUM(dist) AS BIGINT) AS inertia_q
  FROM af WHERE rn = 1 GROUP BY 1
)
SELECT cx.cluster_id, cx.dim, cx.coord AS coord_q,
       COALESCE(st.n_points, 0) AS n_points,
       COALESCE(st.inertia_q, 0) AS inertia_q
FROM (SELECT cluster_id, generate_subscripts(c, 1) AS dim, unnest(c) AS coord
      FROM c{fin}) cx
LEFT JOIN st USING (cluster_id)
ORDER BY cluster_id, dim
"""
