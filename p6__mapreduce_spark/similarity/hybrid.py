"""Hybrid lexical+vector retrieval via Reciprocal Rank Fusion.

The modern retrieval-stack default (Cormack et al. 2009; every
production hybrid-search engine): run a lexical ranker (BM25) and a
vector ranker (cosine) independently, then fuse by summing
1/(rrf_k + rank) over the lists a document appears in. Rank fusion is
score-scale-free, which is exactly why it works across two signals
with incomparable score distributions.

Scale shape: each leg reduces to its top-``n_candidates`` with
orderBy+limit — Spark plans TakeOrderedAndProject, a parallel partial
top-k per partition followed by a driver-side merge of k-row heaps, so
NO global sort and no single-task corpus window. The rank windows then
run over the bounded candidate sets (tens of rows), and the fusion
join is candidate-sized. At 100 TB the legs stay scan-bound and
embarrassingly parallel; everything downstream is O(n_candidates).

Determinism: the BM25 leg ranks on the exact fixed-point ``score_q4``
(integer), the vector leg on the same float64 cosine both engines
compute identically; all ties break by doc id. The fused score
1/(60+a) + 1/(60+b) is two IEEE divisions and one add of exact small
ints — bit-identical cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from p6__mapreduce_spark.functions.vectors import dot_product, l2_norm
from p6__mapreduce_spark.operators.ranking import bm25_scores


def hybrid_search_rrf(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vec_id: int,
    *,
    k: int = 10,
    n_candidates: int = 50,
    rrf_k: int = 60,
) -> DataFrame:
    """(doc_id, lex_rank, vec_rank, rrf_score) for the fused top ``k``.

    A doc missing from one leg's candidate list contributes only its
    other leg's term (that leg's rank column is NULL) — the standard
    RRF-over-top-N semantics. The query document itself is excluded
    from both legs."""
    lex = (
        bm25_scores(docs, query_terms)
        .filter(F.col("doc_id") != query_vec_id)
        .orderBy(F.desc("score_q4"), "doc_id")
        .limit(n_candidates)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("score_q4"), "doc_id"))
            .alias("lex_rank"),
        )
    )
    qv = embeddings.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qv"), l2_norm("embedding").alias("qn")
    )
    vec = (
        embeddings.filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            (dot_product("embedding", "qv") / (l2_norm("embedding") * F.col("qn"))).alias(
                "cosine"
            ),
        )
        .orderBy(F.desc("cosine"), "doc_id")
        .limit(n_candidates)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("cosine"), "doc_id"))
            .alias("vec_rank"),
        )
    )
    contrib = lambda r: F.when(  # noqa: E731
        F.col(r).isNotNull(), F.lit(1.0) / (F.lit(rrf_k) + F.col(r))
    ).otherwise(F.lit(0.0))
    return (
        lex.join(vec, "doc_id", "full_outer")
        .select(
            "doc_id",
            "lex_rank",
            "vec_rank",
            (contrib("lex_rank") + contrib("vec_rank")).alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), "doc_id")
        .limit(k)
    )


def hybrid_rrf_oracle_sql(
    query_terms: list[str],
    query_vec_id: int,
    *,
    k: int = 10,
    n_candidates: int = 50,
    rrf_k: int = 60,
) -> str:
    """DuckDB replica of :func:`hybrid_search_rrf` (same legs, same
    candidate cuts, same tie-breaks, same fused arithmetic)."""
    from p6__mapreduce_spark.operators.ranking import bm25_oracle_sql

    bm25 = bm25_oracle_sql(query_terms).strip().rstrip().removesuffix("ORDER BY doc_id")
    # bm25_oracle_sql ends with its own SELECT; wrap it as a CTE source
    return f"""
    WITH bm25 AS ({bm25}),
    lex AS (
      SELECT doc_id, CAST(row_number() OVER (ORDER BY score_q4 DESC, doc_id) AS INTEGER)
               AS lex_rank
      FROM (SELECT * FROM bm25 WHERE doc_id != {query_vec_id}
            ORDER BY score_q4 DESC, doc_id LIMIT {n_candidates})
    ),
    qv AS (SELECT embedding FROM embeddings WHERE vec_id = {query_vec_id}),
    vec AS (
      SELECT doc_id, CAST(row_number() OVER (ORDER BY cosine DESC, doc_id) AS INTEGER)
               AS vec_rank
      FROM (
        SELECT c.vec_id AS doc_id,
               list_inner_product(c.embedding::DOUBLE[], qv.embedding::DOUBLE[]) /
                 (sqrt(list_inner_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[])) *
                  sqrt(list_inner_product(qv.embedding::DOUBLE[], qv.embedding::DOUBLE[])))
                 AS cosine
        FROM embeddings c CROSS JOIN qv
        WHERE c.vec_id != {query_vec_id}
        ORDER BY cosine DESC, doc_id LIMIT {n_candidates}
      )
    )
    SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id, lex_rank, vec_rank,
           COALESCE(1.0e0 / ({rrf_k} + lex_rank), 0.0e0)
             + COALESCE(1.0e0 / ({rrf_k} + vec_rank), 0.0e0) AS rrf_score
    FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
    ORDER BY rrf_score DESC, COALESCE(lex.doc_id, vec.doc_id)
    LIMIT {k}
    """
