"""Exact deduplication by content hash.

hash-groupBy: one shuffle on the 256-bit digest, map-side partial
aggregation for free. At 100 TB this is the cheapest dedup pass — the
digest (32 bytes) shuffles instead of the document body, and AQE
coalesces the post-shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct content: canonical (min) id + duplicate count.

    Oracle: SELECT sha256(text) AS content_hash, MIN(doc_id) AS keep_id,
    COUNT(*) AS n_copies FROM documents GROUP BY 1.
    """
    return (
        docs.select(F.sha2(F.col(text_col), 256).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .orderBy("content_hash")
    )
