from p6__mapreduce_spark.functions.buckets import uint32_range_bucket
from p6__mapreduce_spark.functions.hashing import djb2, poly_hash_expr
from p6__mapreduce_spark.functions.text import normalize_text, tokens_expr, word_shingles
from p6__mapreduce_spark.functions.vectors import cosine_similarity, dot_product, l2_norm

__all__ = [
    "uint32_range_bucket",
    "djb2",
    "poly_hash_expr",
    "tokens_expr",
    "normalize_text",
    "word_shingles",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
]
