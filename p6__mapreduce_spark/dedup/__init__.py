from p6__mapreduce_spark.dedup.exact import exact_dedup
from p6__mapreduce_spark.dedup.jaccard import ngram_jaccard_pairs
from p6__mapreduce_spark.dedup.minhash import minhash_lsh_pairs, minhash_signatures
from p6__mapreduce_spark.dedup.simhash import simhash
from p6__mapreduce_spark.dedup.embedding import cosine_neardup_pairs

__all__ = [
    "exact_dedup",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash",
    "cosine_neardup_pairs",
]
