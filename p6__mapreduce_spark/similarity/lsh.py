"""Approximate nearest neighbors via random-hyperplane LSH.

The scale path for similarity search: sign(v · r_i) over ``num_planes``
fixed pseudo-random hyperplanes gives a compact bucket id whose
collision probability rises with cosine similarity. Queries probe
their own bucket plus all Hamming-distance-1 neighbors (multi-probe),
then rank exactly within the probed buckets.

Cost model at 100 TB: candidates per query ≈ n / 2^num_planes ×
(1 + num_planes) instead of n — the cross join never happens. The
hyperplanes are generated from a fixed seed on the driver (a few KB)
and folded into the plan as literals, so executors share them without
a broadcast variable.

Approximate by construction — but the hyperplanes are fixed plan
literals, so the *same* bucket assignment, multi-probe and exact rank
are expressible in DuckDB (``knn_lsh_oracle_sql``): the operator is
exactly checkable despite being an ANN. Recall vs knn_bruteforce is
additionally asserted in tests (tests/test_similarity.py).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from p6__mapreduce_spark.functions.vectors import dot_product, l2_norm

SEED = 42


def _planes(dim: int, num_planes: int, seed: int = SEED) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((num_planes, dim)).tolist()


def _bucket_expr(vec_col: str, planes: list[list[float]]) -> Column:
    """Integer bucket id: bit i = sign(v · plane_i).

    The plane matrix is ONE nested-array literal looped with
    transform(), not per-plane unrolled literal arrays: unrolling makes
    the constants part of the generated code and costs seconds of
    Janino compilation per consuming plan (see similarity/ivf.py).
    Bit values are exact integers, so the summation order change is
    value-neutral."""
    matrix = F.lit([[float(x) for x in p] for p in planes])
    weights = F.lit([1 << i for i in range(len(planes))])
    v = F.col(vec_col).cast("array<double>")

    def bit(p: Column, i: Column) -> Column:
        dot = F.aggregate(
            F.zip_with(v, p, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )
        return F.when(dot > 0, F.element_at(weights, i + F.lit(1))).otherwise(F.lit(0)).cast("long")

    return F.aggregate(F.transform(matrix, bit), F.lit(0).cast("long"), lambda acc, x: acc + x)


def hyperplane_buckets(
    embeddings: DataFrame,
    dim: int,
    num_planes: int = 8,
    *,
    vec_col: str = "embedding",
) -> DataFrame:
    """Attach the LSH bucket id (map-side only; no shuffle)."""
    return embeddings.withColumn("bucket", _bucket_expr(vec_col, _planes(dim, num_planes)))


def knn_lsh(
    embeddings: DataFrame,
    queries: DataFrame | None = None,
    k: int = 5,
    *,
    dim: int = 64,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probe own bucket + Hamming-1 neighbors, rank
    exactly within the probed candidate set."""
    if queries is None:
        queries = embeddings
    planes = _planes(dim, num_planes)
    cand = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        l2_norm(vec_col).alias("cn"),
        _bucket_expr(vec_col, planes).alias("bucket"),
    )
    probes = F.array(
        F.col("qbucket"), *[F.col("qbucket").bitwiseXOR(F.lit(1 << i)) for i in range(num_planes)]
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        l2_norm(vec_col).alias("qn"),
        _bucket_expr(vec_col, planes).alias("qbucket"),
    ).select("query_id", "qv", "qn", F.explode(probes).alias("bucket"))
    scored = (
        F.broadcast(q)
        .join(cand, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", dot_product("qv", "cv") / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    )


def sql_double_list(vals: list[float]) -> str:
    """DuckDB DOUBLE[] literal: .17e scientific literals parse as DOUBLE
    (not DECIMAL) and round-trip bit-exactly at 17 significant digits."""
    return "[" + ", ".join(f"{v:.17e}" for v in vals) + "]"


def bucket_sql_expr(planes: list[list[float]], vec: str = "v") -> str:
    """DuckDB twin of ``_bucket_expr`` — bit-identical because Spark's
    ``aggregate`` dot fold and ``list_inner_product`` agree on DOUBLE[]."""
    return " + ".join(
        f"(CASE WHEN list_inner_product({vec}, {sql_double_list(p)}) > 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )


def probe_sql_list(num_planes: int, bucket: str = "bucket") -> str:
    """DuckDB twin of the Hamming-1 multi-probe array."""
    return f"[{bucket}" + "".join(f", xor({bucket}, {1 << i})" for i in range(num_planes)) + "]"


def knn_lsh_oracle_sql(
    *,
    dim: int = 64,
    num_planes: int = 8,
    k: int = 5,
    query_filter: str = "vec_id < 16",
) -> str:
    """DuckDB SQL computing the identical LSH result: same sign-bit
    buckets over the same plane literals, same Hamming-1 multi-probe,
    same exact rank."""
    planes = _planes(dim, num_planes)
    bucket = bucket_sql_expr(planes)
    probe_list = probe_sql_list(num_planes)
    return f"""
    WITH b AS (
      SELECT vec_id, embedding::DOUBLE[] AS v, ({bucket}) AS bucket
      FROM embeddings
    ), probes AS (
      SELECT vec_id AS query_id, v AS qv, unnest({probe_list}) AS pbucket
      FROM b WHERE {query_filter}
    ), scored AS (
      SELECT p.query_id, c.vec_id AS neighbor_id,
             list_inner_product(p.qv, c.v) /
             (sqrt(list_inner_product(p.qv, p.qv)) * sqrt(list_inner_product(c.v, c.v))) AS cosine
      FROM probes p JOIN b c ON p.pbucket = c.bucket
      WHERE p.query_id != c.vec_id
    )
    SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank FROM (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= {k} ORDER BY query_id, rank
    """
