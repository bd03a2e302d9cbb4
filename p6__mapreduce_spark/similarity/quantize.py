"""Int8 scalar-quantization audit for embedding columns.

The standard pre-flight check before shipping embeddings to an ANN
index or a vector store as int8 (FAISS ``SQ8``, pgvector ``halfvec``/
int8, Milvus SQ): symmetric absmax quantization per DIMENSION —
``code = round(127 * x / max_dim|x|)`` — and the realized
reconstruction error per dimension, so scale outliers (one hot dim
ruining 63 others) and saturation are visible BEFORE recall drops in
production. Complements ``similarity/pq.py`` (vector-wise codebook
compression) with the cheaper dimension-wise scalar scheme.

Exactness recipe (the repo's embedding discipline, cf.
``operators/analytics.embedding_dim_stats``): coordinates quantize to
1e-6 int64 up front; the per-dim scale is an exact integer MAX; the
int8 code is computed by INTEGER round-half-away arithmetic
(``(2*127*|q| + s) div (2*s)`` via floor of a double ratio that is
safe because numerator/denominator are ints far below 2^53 and the
true ratio is never within one ulp of an integer unless exact); the
reconstruction error ``|127*q - code*s|`` stays integer to the end.
Every column therefore replays bit-for-bit in DuckDB.

Plan shape: ONE posexplode of the corpus into (dim, q) rows, one
(dim) MAX shuffle for the scales (64 rows), scales broadcast back,
one (dim) aggregation for the error profile. No window over the raw
table, no floats before the two final fixed-shape ratios. At 100 TB
the sse accumulator would move to decimal(38,0) (int64 holds it to
~10^18 error-units; the audit is usually run on a sample anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Q = 1_000_000  # 1e-6 coordinate quantization (shared discipline)
LEVELS = 127  # int8 symmetric range [-127, 127]


def int8_quant_audit(emb: DataFrame, *, vec_col: str = "embedding") -> DataFrame:
    """(dim, s_q, n_vecs, n_sat, max_err, sse_err, mse_err): per-dim
    absmax int8 quantization scale, saturation count (|code| = 127),
    and exact reconstruction-error profile in 127*1e-6 units."""
    q = F.round(F.col("x").cast("double") * F.lit(float(Q))).cast("long")
    exploded = emb.select(F.posexplode(vec_col).alias("pos", "x")).select(
        (F.col("pos") + 1).alias("dim"), q.alias("q")
    )
    scales = exploded.groupBy("dim").agg(F.max(F.abs(F.col("q"))).alias("s"))
    j = exploded.join(F.broadcast(scales), "dim")
    a = F.abs(F.col("q")) * F.lit(2 * LEVELS)  # 2*127*|q|
    # round-half-away-from-zero of 127*|q|/s as pure integer arithmetic;
    # floor of the double ratio is exact here (ints < 2^53, and a
    # non-integer true ratio is >= 1/(2s) > ulp away from any integer)
    code_abs = F.when(
        F.col("s") > 0, F.floor((a + F.col("s")) / (F.lit(2.0) * F.col("s")))
    ).otherwise(F.lit(0)).cast("long")
    code = F.when(F.col("q") < 0, -code_abs).otherwise(code_abs)
    err = F.abs(F.lit(LEVELS) * F.col("q") - code * F.col("s"))
    scored = j.select(
        "dim",
        "s",
        code.alias("code"),
        err.alias("err"),
    )
    return (
        scored.groupBy("dim")
        .agg(
            F.max("s").alias("s_q"),  # constant within dim
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum((F.abs(F.col("code")) == F.lit(LEVELS)).cast("long")).alias("n_sat"),
            F.max("err").alias("max_err"),
            F.sum(F.col("err") * F.col("err")).alias("sse_err"),
        )
        .select(
            "dim",
            "s_q",
            "n_vecs",
            "n_sat",
            "max_err",
            "sse_err",
            (F.col("sse_err").cast("double") / F.col("n_vecs")).alias("mse_err"),
        )
        .orderBy("dim")
    )


INT8_QUANT_AUDIT_ORACLE_SQL = f"""
WITH e AS (
  SELECT generate_subscripts(embedding, 1) AS dim,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * {float(Q):.1f}e0) AS BIGINT) AS q
  FROM embeddings
), sc AS (
  SELECT dim, MAX(abs(q)) AS s FROM e GROUP BY 1
), j AS (
  SELECT e.dim, e.q, sc.s,
         CASE WHEN sc.s > 0
              THEN CAST(floor((abs(e.q) * {2 * LEVELS} + sc.s) * 1.0e0
                              / (2.0e0 * sc.s)) AS BIGINT)
              ELSE 0 END AS ca
  FROM e JOIN sc USING (dim)
), coded AS (
  SELECT dim, s,
         CASE WHEN q < 0 THEN -ca ELSE ca END AS code,
         abs({LEVELS} * q - (CASE WHEN q < 0 THEN -ca ELSE ca END) * s) AS err
  FROM j
)
SELECT dim, MAX(s) AS s_q,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(CASE WHEN abs(code) = {LEVELS} THEN 1 ELSE 0 END) AS BIGINT) AS n_sat,
       MAX(err) AS max_err,
       CAST(SUM(err * err) AS BIGINT) AS sse_err,
       CAST(SUM(err * err) AS BIGINT) * 1.0e0 / COUNT(*) AS mse_err
FROM coded GROUP BY dim ORDER BY dim
"""
