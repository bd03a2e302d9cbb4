from p6__mapreduce_spark.similarity.bruteforce import knn_bruteforce
from p6__mapreduce_spark.similarity.lsh import hyperplane_buckets, knn_lsh

__all__ = ["knn_bruteforce", "knn_lsh", "hyperplane_buckets"]
