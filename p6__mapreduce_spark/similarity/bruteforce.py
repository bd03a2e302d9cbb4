"""Brute-force cosine top-k — the exact ANN baseline.

Query set × candidate set via a broadcast join (the query side is small
by construction), cosine in codegen'd float64 expressions, top-k via a
window partitioned by query. One shuffle (the window repartition on
query_id); the candidate scan is embarrassingly parallel, so on a
1000-executor cluster this is scan-bound — the right baseline to hold
LSH/IVF recall against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from p6__mapreduce_spark.functions.vectors import dot_product, l2_norm


def knn_bruteforce(
    embeddings: DataFrame,
    queries: DataFrame | None = None,
    k: int = 5,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    ``queries`` defaults to the embeddings table itself (all-pairs kNN);
    pass a small DataFrame with the same (id, vec) columns for the
    query-set form. Self-matches are excluded. Ties break by neighbor
    id ascending (deterministic).
    """
    if queries is None:
        queries = embeddings
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), l2_norm(vec_col).alias("qn")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), l2_norm(vec_col).alias("cn")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
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
