"""IVF (inverted-file) approximate nearest neighbors.

The second ANN scale path (alongside random-hyperplane LSH): a small
set of coarse centroids partitions the vector space; every vector is
assigned map-side to its nearest centroid (the "inverted list"), and a
query probes only the ``nprobe`` nearest lists.

Centroid training runs driver-side on a bounded sample (k-means on at
most ``sample_size`` vectors, fixed seed) — the trained centroids are a
few KB and fold into the plan as literals, so assignment is a pure
codegen expression: no MLlib dependency, no broadcast variable, no
shuffle for assignment. Cost per query ≈ n * nprobe / n_centroids
candidates instead of n.

Approximate by construction -> rows-only driver check; recall against
knn_bruteforce is asserted on clustered data in tests.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from p6__mapreduce_spark.functions.vectors import dot_product, l2_norm

SEED = 42


def train_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    *,
    vec_col: str = "embedding",
    sample_size: int = 2048,
    iters: int = 10,
    seed: int = SEED,
) -> list[list[float]]:
    """Driver-side mini k-means on a bounded deterministic sample.

    The sample is tiny by construction (``sample_size`` rows regardless
    of table size — take over a seeded sort of a hash, no full scan
    materialization), so this is NOT a driver-side loop over the data:
    it is model fitting, the model being a few KB of centroids.
    """
    # limit() short-circuits the scan (no global sort/shuffle for a
    # sample — at 100 TB a sort-by-hash "random" sample would be a full
    # shuffle); k-means only needs a representative subset, and the
    # fixed seed keeps the fit deterministic for a given input prefix
    rows = (
        embeddings.select(F.col(vec_col).alias("v"))
        .limit(sample_size)
        .collect()
    )
    X = np.array([list(r.v) for r in rows], dtype=np.float64)
    rng = np.random.default_rng(seed)
    centroids = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        d = ((X[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(centroids)):
            members = X[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids.tolist()


def _sq_dist(vec_col: str, center: list[float]) -> Column:
    diff = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        F.array(*[F.lit(x) for x in center]),
        lambda v, c: (v - c) * (v - c),
    )
    return F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x)


def _nearest_expr(vec_col: str, centroids: list[list[float]]) -> Column:
    """argmin over centroid distances as a pure expression."""
    dists = F.array(*[_sq_dist(vec_col, c) for c in centroids])
    return F.array_position(dists, F.array_min(dists)).cast("int") - 1


def ivf_assign(embeddings: DataFrame, centroids: list[list[float]], *, vec_col: str = "embedding") -> DataFrame:
    """Attach the inverted-list id (map-side, no shuffle)."""
    return embeddings.withColumn("list_id", _nearest_expr(vec_col, centroids))


def knn_ivf(
    embeddings: DataFrame,
    queries: DataFrame | None = None,
    k: int = 5,
    *,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probe the nprobe nearest inverted lists, rank
    exactly within the probed candidates."""
    if queries is None:
        queries = embeddings
    centroids = train_centroids(embeddings, n_centroids, vec_col=vec_col)
    cand = ivf_assign(
        embeddings.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
            l2_norm(vec_col).alias("cn"),
        ),
        centroids,
        vec_col="cv",
    )
    # query side: nprobe nearest lists via sorted distance array
    dists = F.array(*[_sq_dist("qv", c) for c in centroids])
    sorted_d = F.array_sort(dists)
    probes = F.transform(
        F.slice(sorted_d, 1, nprobe),
        lambda d: F.array_position(dists, d).cast("int") - 1,
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        l2_norm(vec_col).alias("qn"),
    ).select("query_id", "qv", "qn", F.explode(probes).alias("list_id"))
    scored = (
        F.broadcast(q)
        .join(cand, "list_id")
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
