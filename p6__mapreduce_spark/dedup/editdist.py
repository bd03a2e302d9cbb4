"""Edit-distance verification over near-duplicate candidate pairs.

Character-level Levenshtein is the classic *second-stage* near-dup
verifier: shingle Jaccard is insensitive to local token reorderings,
while edit distance penalizes them, so curation pipelines that must
distinguish "same doc, minor edit" from "same vocabulary, shuffled"
(e.g. template spam vs true revisions) score both. Computing it over
all O(n²) pairs is infeasible; over the verified Jaccard>=t pair set
it is a per-pair refinement whose cost scales with the *duplicate*
count, not the corpus.

Scale shape: the candidate pair set arrives as (id1, id2) edges (at
100 TB, a written intermediate); two joins re-attach the document
texts (each a shuffle keyed by doc_id — at cluster scale these join
against the bucketed documents table without a full-corpus shuffle);
``F.levenshtein`` runs JVM-side inside whole-stage codegen, O(len²)
per pair but only on pairs already known to be near-dups. No Python,
no driver state, no cartesian anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edit_distance_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per candidate pair: character Levenshtein distance and the
    normalized edit similarity ``1 - dist / max(len1, len2)``.

    ``pairs`` must carry ``id1``/``id2`` (extra columns — e.g. the
    jaccard score — are passed through). The similarity denominator
    uses character lengths, so identical docs score 1.0 and disjoint
    equal-length docs score >= 0.0. All inputs to the final division
    are exact integers; the single double division is bit-reproducible
    cross-engine.
    """
    d1 = docs.select(
        F.col(id_col).alias("id1"),
        F.col(text_col).alias("_t1"),
        F.length(text_col).alias("_len1"),
    )
    d2 = docs.select(
        F.col(id_col).alias("id2"),
        F.col(text_col).alias("_t2"),
        F.length(text_col).alias("_len2"),
    )
    return (
        pairs.join(d1, "id1")
        .join(d2, "id2")
        .withColumn("edit_dist", F.levenshtein("_t1", "_t2"))
        .withColumn(
            "edit_sim",
            F.lit(1.0)
            - F.col("edit_dist") * F.lit(1.0) / F.greatest("_len1", "_len2"),
        )
        .drop("_t1", "_t2", "_len1", "_len2")
    )


# Oracle: the exact Jaccard>=threshold pair set (same CTE chain the
# jaccard/minhash oracles use) refined with DuckDB's levenshtein —
# both engines implement unit-cost insert/delete/substitute Levenshtein
# over unicode codepoints, so the integer distances agree exactly.
EDITDIST_ORACLE_SQL = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '[^a-z0-9]+'), t -> t <> '') AS w
  FROM documents
), idx AS (
  SELECT doc_id, w, unnest(range(1, len(w) - {k} + 2)) AS i FROM toks WHERE len(w) >= {k}
), sh AS (
  SELECT DISTINCT doc_id, list_aggregate(w[i : i + {k} - 1], 'string_agg', ' ') AS shingle
  FROM idx
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1
), pairs AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), jac AS (
  SELECT id1, id2, n_inter * 1.0 / (s1.n + s2.n - n_inter) AS jaccard
  FROM pairs JOIN sizes s1 ON s1.doc_id = id1 JOIN sizes s2 ON s2.doc_id = id2
  WHERE n_inter * 1.0 / (s1.n + s2.n - n_inter) >= {threshold}
)
SELECT id1, id2, jaccard,
       CAST(levenshtein(t1.text, t2.text) AS INTEGER) AS edit_dist,
       1.0 - levenshtein(t1.text, t2.text) * 1.0
             / greatest(len(t1.text), len(t2.text)) AS edit_sim
FROM jac
JOIN documents t1 ON t1.doc_id = id1
JOIN documents t2 ON t2.doc_id = id2
ORDER BY 1, 2
"""
