"""Contrastive-pair mining for embedding-model training.

The data-side half of contrastive fine-tuning (SimCLR/SBERT-style
batch construction): for every query vector, mine the top-k **hard
negatives** — different label, highest cosine (the confusable
impostors that carry the gradient signal) — and the **hardest
positive** — same label, lowest cosine (the most distant view the
model must still pull in). Random negatives are nearly free to
classify and teach nothing; hard-negative mining is what makes the
contrastive batch worth its compute at training time.

One scored relation feeds both roles: a single window partitioned by
(query, role) with a sign-flipped cosine sort key ranks negatives
descending and positives ascending — no second pass, no second
shuffle. The query side broadcasts (query sets are small by
construction); the candidate scan is embarrassingly parallel.

At 100 TB the brute-force candidate set is the exact baseline (this
module), and the scale path is composition: pass ``candidates=`` a
bucketed ANN pre-filter (IVF probes or LSH buckets from
``similarity.ivf``/``similarity.lsh``) so each query scores only its
probe set; the ranking semantics are unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from p6__mapreduce_spark.functions.vectors import dot_product, l2_norm


def mine_contrastive_pairs(
    embeddings: DataFrame,
    queries: DataFrame,
    *,
    k_neg: int = 5,
    candidates: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """(query_id, role, neighbor_id, rank) — role in ('hard_neg',
    'hard_pos'); top ``k_neg`` negatives, 1 hardest positive. Ties
    break by neighbor id ascending; self-matches excluded."""
    cand = embeddings if candidates is None else candidates
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            l2_norm(vec_col).alias("qn"),
            F.col(label_col).alias("q_label"),
        )
    )
    c = cand.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        l2_norm(vec_col).alias("cn"),
        F.col(label_col).alias("c_label"),
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.when(F.col("q_label") == F.col("c_label"), F.lit("hard_pos"))
            .otherwise(F.lit("hard_neg"))
            .alias("role"),
            (dot_product("qv", "cv") / (F.col("qn") * F.col("cn"))).alias("cosine"),
        )
    )
    # negatives rank by cosine DESC (most confusable first), positives
    # by cosine ASC (most distant first): one window, signed sort key
    sort_key = F.when(F.col("role") == "hard_neg", -F.col("cosine")).otherwise(
        F.col("cosine")
    )
    w = Window.partitionBy("query_id", "role").orderBy(sort_key, "neighbor_id")
    keep = F.when(F.col("role") == "hard_neg", F.lit(k_neg)).otherwise(F.lit(1))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= keep)
        .select("query_id", "role", "neighbor_id", "rank")
        .orderBy("query_id", "role", "rank")
    )


def mining_oracle_sql(*, k_neg: int = 5, query_filter: str = "vec_id < 16") -> str:
    """DuckDB replica of :func:`mine_contrastive_pairs` over the
    ``embeddings`` view (same roles, same signed sort key, same ties)."""
    return f"""
    SELECT query_id, role, neighbor_id, CAST(rank AS INTEGER) AS rank FROM (
      SELECT q.vec_id AS query_id,
             CASE WHEN q.label = c.label THEN 'hard_pos' ELSE 'hard_neg' END AS role,
             c.vec_id AS neighbor_id,
             row_number() OVER (
               PARTITION BY q.vec_id,
                 CASE WHEN q.label = c.label THEN 'hard_pos' ELSE 'hard_neg' END
               ORDER BY
                 CASE WHEN q.label = c.label THEN 1.0 ELSE -1.0 END *
                 (list_inner_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
                  (sqrt(list_inner_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
                   sqrt(list_inner_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[])))),
                 c.vec_id) AS rank
      FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
      WHERE q.{query_filter}
    ) WHERE rank <= CASE WHEN role = 'hard_neg' THEN {k_neg} ELSE 1 END
    ORDER BY query_id, role, rank
    """
