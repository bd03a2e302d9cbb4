"""Embedding-cosine near-duplicate pairs.

Brute-force form: all (id1 < id2) pairs with cosine >= threshold. The
dot product / norms are `zip_with` + `aggregate` expressions in float64
(bit-reproducible vs the DuckDB oracle's list_inner_product on
::DOUBLE[]).

Scale path: the O(n²) join is the wrong tool past ~10^6 vectors — use
``similarity.lsh.hyperplane_buckets`` to pre-bucket and run this
pairwise step within buckets only (same output contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from p6__mapreduce_spark.functions.vectors import dot_product, l2_norm


def cosine_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.4,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id1, id2, cosine) for id1 < id2 and cosine >= threshold.

    Norms are computed once per vector BEFORE the pair join (n rows,
    not n² pairs) — the join then evaluates only the dot product per
    pair. cosine = dot/(norm1*norm2) in float64, identical operation
    order to the oracle's list_inner_product/sqrt formula.
    """
    # cast float->double ONCE per input row: a per-pair cast would
    # allocate two fresh arrays for each of the O(n^2) join outputs
    with_norm = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        l2_norm(vec_col).alias("norm"),
    )
    a = with_norm.select(F.col("id").alias("id1"), F.col("v").alias("v1"), F.col("norm").alias("n1"))
    b = with_norm.select(F.col("id").alias("id2"), F.col("v").alias("v2"), F.col("norm").alias("n2"))
    return (
        a.join(b, F.col("id1") < F.col("id2"))
        .withColumn("cosine", dot_product("v1", "v2") / (F.col("n1") * F.col("n2")))
        .filter(F.col("cosine") >= F.lit(threshold))
        .select("id1", "id2", "cosine")
        .orderBy("id1", "id2")
    )
