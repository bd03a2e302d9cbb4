"""SemDeDup-style semantic deduplication over embedding vectors.

"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication" (Abbas et al., 2023) removes semantically redundant
training examples: cluster the embedding space coarsely, then compare
pairs ONLY within a cluster and drop one member of every pair whose
cosine similarity exceeds a threshold. The clustering bounds the
quadratic term — at corpus scale the within-cluster join touches
n²/n_clusters pairs instead of n², and n_clusters grows with the corpus
(√n is the usual choice), so per-cluster work stays constant.

Spark shape:

1. centroids trained once on a deterministic sample (reuses the IVF
   trainer — a few KB, folded into the plan as ONE nested-array
   literal, same Janino-compile-collapse trick as knn_ivf);
2. cluster assignment is map-side (no shuffle): argmin over the
   centroid scores array;
3. the candidate join is an equi-join on list_id — Spark shuffles both
   sides by cluster id once; AQE splits skewed clusters. id1 < id2
   halves the pair count; cosine in codegen'd float64 (bit-identical to
   DuckDB's list_inner_product, so the op is exactly oracle-checkable);
4. keep policy: the LOWER vec_id of every duplicate pair survives —
   deterministic and join-free to express (losers = distinct id2).

The oracle generator mirrors the exact same centroids via the Spark-free
trainer replica, so Spark and DuckDB agree bit-for-bit.

Reference scope: the reference engine (mapreduce.c) has no embedding
operators; this extends the training-data-curation surface per the
brief, alongside dedup/embedding.py's raw-cosine variants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from p6__mapreduce_spark.functions.vectors import dot_product, l2_norm
from p6__mapreduce_spark.similarity.ivf import (
    _sql_double_list,
    ivf_assign,
    train_centroids,
    train_centroids_from_parquet,
)


def semantic_dedup(
    embeddings: DataFrame,
    *,
    n_centroids: int = 16,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """(vec_id, list_id, keep) — keep=false for the higher-id member of
    every within-cluster pair with cosine >= threshold.

    ``centroids`` lets callers share one trained model across operators
    (knn_ivf and semantic_dedup train identically); training is a Spark
    sample job, so reuse saves a full scan per extra caller."""
    cents = centroids if centroids is not None else train_centroids(
        embeddings, n_centroids=n_centroids, vec_col=vec_col
    )
    assigned = ivf_assign(embeddings, cents, vec_col=vec_col)
    a = assigned.select(
        F.col(id_col).alias("id1"),
        "list_id",
        F.col(vec_col).alias("v1"),
        l2_norm(vec_col).alias("n1"),
    )
    b = assigned.select(
        F.col(id_col).alias("id2"),
        "list_id",
        F.col(vec_col).alias("v2"),
        l2_norm(vec_col).alias("n2"),
    )
    losers = (
        a.join(b, "list_id")
        .filter(F.col("id1") < F.col("id2"))
        .withColumn("cosine", dot_product("v1", "v2") / (F.col("n1") * F.col("n2")))
        .filter(F.col("cosine") >= threshold)
        .select(F.col("id2").alias(id_col))
        .distinct()
        .withColumn("dup", F.lit(True))
    )
    return (
        assigned.join(losers, id_col, "left")
        .select(
            id_col,
            F.col("list_id").cast("int").alias("list_id"),
            F.coalesce(~F.col("dup"), F.lit(True)).alias("keep"),
        )
        .orderBy(id_col)
    )


def semantic_dedup_oracle_sql(
    parquet_path: str,
    *,
    n_centroids: int = 16,
    threshold: float = 0.4,
) -> str:
    """DuckDB SQL computing the identical result: same centroids (the
    Spark-free trainer replica), same map-side argmin, same
    within-cluster cosine pairs. Valid for the parquet it was
    generated against."""
    centroids = train_centroids_from_parquet(parquet_path, n_centroids)
    from p6__mapreduce_spark.similarity.ivf import _cc

    scores = "[" + ", ".join(
        f"{{'s': {_cc(c):.17e} - 2.0e0 * list_inner_product(v, {_sql_double_list(c)}), 'i': {i}}}"
        for i, c in enumerate(centroids)
    ) + "]"
    return f"""
    WITH b AS (
      SELECT vec_id, embedding::DOUBLE[] AS v, {scores} AS scores
      FROM embeddings
    ), asg AS (
      SELECT vec_id, v, list_min(scores).i AS list_id FROM b
    ), losers AS (
      SELECT DISTINCT y.vec_id
      FROM asg x JOIN asg y ON x.list_id = y.list_id AND x.vec_id < y.vec_id
      WHERE list_inner_product(x.v, y.v) /
            (sqrt(list_inner_product(x.v, x.v)) * sqrt(list_inner_product(y.v, y.v)))
            >= {threshold}
    )
    SELECT a.vec_id, CAST(a.list_id AS INTEGER) AS list_id,
           (l.vec_id IS NULL) AS keep
    FROM asg a LEFT JOIN losers l ON a.vec_id = l.vec_id
    ORDER BY a.vec_id
    """
