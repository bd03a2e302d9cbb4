"""p6__mapreduce_spark — a PySpark-native analytics engine.

Brand-new engine providing the query/data-processing capabilities of the
reference MapReduce library (``NiharikaTomar/p6--MapReduce``, studied in
SURVEY.md): a generic map/shuffle/reduce facade over (key, value) string
pairs, per-line frequency counting, distinct globally-ordered output via
hash/range partitioning — re-expressed on DataFrame/SQL primitives so
Catalyst/Tungsten/AQE pick the physical strategy — plus the large-scale
LLM-data-pipeline extensions (dedup, similarity search, multimodal
columns, text analysis) designed for 100 TB-scale clusters.
"""

from p6__mapreduce_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
