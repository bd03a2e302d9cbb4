"""Top principal component of the embedding corpus by distributed
power iteration — the whitening/anisotropy diagnostic.

Embedding corpora routinely collapse onto a few dominant directions
(anisotropy — Ethayarajh 2019; "all-but-the-top" Mu 2018 removes the
top PCs before retrieval). The pre-flight question is "how dominant
is the top component" — this operator answers it exactly and
in-engine: the d x d scatter matrix from ONE corpus pass, then a
fixed 15-round power iteration that runs entirely on the bounded
d^2-row matrix relation — the corpus is never rescanned and no
linear-algebra library runs anywhere.

Exactness (the pagerank/HITS integer-renormalization discipline):
coordinates quantize to 1e-4 int64; the scatter C = n*Sigma(q q^T) -
S S^T is exact integer; C is max-normalized to 1e6 fixed point by ONE
floor((c/maxc)*1e6) double expression (IEEE-identical cross-engine);
each iteration u = C''v renormalizes the same way, so every round is
reproducible and the whole chain (moments -> scatter -> normalize ->
15 rounds -> Rayleigh quotient) replays in a chained-CTE DuckDB
oracle. The eigenvalue is reported as the Rayleigh quotient over a
1e-3 requantized v (keeps the quadratic form inside int64) and the
explained-variance ratio divides by trace(C'') — two mirrored final
double expressions.

Scale: the moments pass emits d^2 products per vector (d=64 ->
4096/row) with map-side partial aggregation collapsing each task to
<= d^2 rows before the one shuffle — the standard exact-covariance
cost; at 100 TB you'd sample vectors (hash-sample like
kmeans_lloyd_sampled) or switch to randomized sketching, and the
int64 scatter (n^2 * max_q^2 headroom) moves to decimal(38,0) past
~10^6 rows. The iteration cost is corpus-size independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Q4 = 10_000  # 1e-4 coordinate quantization (int64 headroom for n * q^2)
SCALE6 = 1_000_000.0
ITERS = 15


def pca_top_component(emb: DataFrame, *, vec_col: str = "embedding") -> DataFrame:
    """(dim, loading_q6, eigval_norm, explained_ratio): the dominant
    eigenvector of the scatter matrix (1e6 fixed point, max-normalized
    so max |loading| = 1e6), its Rayleigh-quotient eigenvalue in
    normalized-scatter units, and eigenvalue / trace — the fraction of
    (normalized) variance the top component carries."""
    q = F.round(F.col("x").cast("double") * F.lit(float(Q4))).cast("long")
    e = (
        emb.select(F.col("vec_id"), F.posexplode(vec_col).alias("pos", "x"))
        .select("vec_id", (F.col("pos") + 1).alias("dim"), q.alias("q"))
        .localCheckpoint(eager=True)  # feeds moments + sums + count once
    )
    n_row = e.select((F.count_distinct("vec_id")).alias("n"))
    sums = e.groupBy("dim").agg(F.sum("q").alias("s"))
    m = (
        e.select(F.col("dim").alias("i"), F.col("q").alias("qi"), "vec_id")
        .join(
            e.select(F.col("dim").alias("j"), F.col("q").alias("qj"), "vec_id"),
            "vec_id",
        )
        .groupBy("i", "j")
        .agg(F.sum(F.col("qi") * F.col("qj")).alias("m"))
    )
    scatter = (
        m.join(sums.select(F.col("dim").alias("i"), F.col("s").alias("si")), "i")
        .join(sums.select(F.col("dim").alias("j"), F.col("s").alias("sj")), "j")
        .crossJoin(F.broadcast(n_row))
        .select(
            "i",
            "j",
            (F.col("n") * F.col("m") - F.col("si") * F.col("sj")).alias("c"),
        )
    )
    maxc = scatter.agg(F.max(F.abs(F.col("c"))).alias("mc"))
    cq = (
        scatter.crossJoin(F.broadcast(maxc))
        .select(
            "i",
            "j",
            F.when(
                F.col("mc") > 0,
                F.floor(
                    (F.col("c").cast("double") / F.col("mc")) * F.lit(SCALE6)
                ).cast("long"),
            )
            .otherwise(F.lit(0))
            .alias("cq"),
        )
        # d^2 rows: ONE partition is the right shape for the rounds
        # (and keeps 15 rounds of checkpoint blocks to one file each)
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    v = cq.select(F.col("i").alias("dim")).distinct().withColumn(
        "v", F.lit(1_000_000).cast("long")
    )
    for _ in range(ITERS):
        u = (
            cq.join(
                v.select(F.col("dim").alias("jj"), "v"),
                F.col("j") == F.col("jj"),
            )
            .groupBy("i")
            .agg(F.sum(F.col("cq") * F.col("v")).alias("u"))
        )
        mu = u.agg(F.max(F.abs(F.col("u"))).alias("mu"))
        v = (
            u.crossJoin(F.broadcast(mu))
            .select(
                F.col("i").alias("dim"),
                F.when(
                    F.col("mu") > 0,
                    F.floor(
                        (F.col("u").cast("double") / F.col("mu")) * F.lit(SCALE6)
                    ).cast("long"),
                )
                .otherwise(F.lit(0))
                .alias("v"),
            )
            .coalesce(1)
            .localCheckpoint(eager=True)
        )
    # Rayleigh quotient on the 1e-3 requantized vector (int64-safe
    # quadratic form) + trace of the normalized scatter
    vq = v.select("dim", F.floor(F.col("v") / F.lit(1000.0)).cast("long").alias("w"))
    num = (
        cq.join(vq.select(F.col("dim").alias("i"), F.col("w").alias("wi")), "i")
        .join(vq.select(F.col("dim").alias("j"), F.col("w").alias("wj")), "j")
        .agg(F.sum(F.col("wi") * F.col("cq") * F.col("wj")).alias("num"))
    )
    den = vq.agg(F.sum(F.col("w") * F.col("w")).alias("den"))
    trace = cq.filter(F.col("i") == F.col("j")).agg(F.sum("cq").alias("tr"))
    eig = (
        num.crossJoin(F.broadcast(den))
        .crossJoin(F.broadcast(trace))
        .select(
            # try_divide: a degenerate corpus (e.g. a single vector)
            # iterates the eigenvector to zero mass -> den/tr are 0;
            # DuckDB's / yields NULL there while Spark-ANSI throws —
            # identical values whenever den/tr are non-zero (r9 audit)
            F.try_divide(F.col("num").cast("double"), F.col("den")).alias(
                "eigval_norm"
            ),
            F.try_divide(
                F.try_divide(F.col("num").cast("double"), F.col("den")),
                F.col("tr"),
            ).alias("explained_ratio"),
        )
    )
    return (
        v.select("dim", F.col("v").alias("loading_q6"))
        .crossJoin(F.broadcast(eig))
        .orderBy("dim")
    )


def pca_oracle_sql() -> str:
    """Chained-CTE DuckDB replica: moments, scatter, max-normalize,
    all 15 power-iteration rounds, Rayleigh quotient, trace."""
    rounds = []
    for k in range(1, ITERS + 1):
        rounds.append(
            f"""u_{k} AS MATERIALIZED (
      SELECT c.i, CAST(SUM(c.cq * p.v) AS BIGINT) AS u
      FROM cq c JOIN p_{k - 1} p ON p.dim = c.j GROUP BY 1
    ), mu_{k} AS MATERIALIZED (
      SELECT MAX(abs(u)) AS mu FROM u_{k}
    ), p_{k} AS MATERIALIZED (
      SELECT u.i AS dim,
             CASE WHEN m.mu > 0
                  THEN CAST(floor((CAST(u.u AS DOUBLE) / m.mu)
                                  * {SCALE6:.1f}e0) AS BIGINT)
                  ELSE 0 END AS v
      FROM u_{k} u CROSS JOIN mu_{k} m
    )"""
        )
    chain = ",\n    ".join(rounds)
    return f"""
    WITH e AS MATERIALIZED (
      SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
             CAST(round(CAST(unnest(embedding) AS DOUBLE) * {float(Q4):.1f}e0)
                  AS BIGINT) AS q
      FROM embeddings
    ), nr AS (
      SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n FROM e
    ), sums AS (
      SELECT dim, CAST(SUM(q) AS BIGINT) AS s FROM e GROUP BY 1
    ), m AS (
      SELECT a.dim AS i, b.dim AS j, CAST(SUM(a.q * b.q) AS BIGINT) AS m
      FROM e a JOIN e b USING (vec_id) GROUP BY 1, 2
    ), scatter AS (
      SELECT m.i, m.j, nr.n * m.m - si.s * sj.s AS c
      FROM m
      JOIN sums si ON si.dim = m.i
      JOIN sums sj ON sj.dim = m.j
      CROSS JOIN nr
    ), mc AS (
      SELECT MAX(abs(c)) AS mc FROM scatter
    ), cq AS MATERIALIZED (
      SELECT i, j,
             CASE WHEN mc.mc > 0
                  THEN CAST(floor((CAST(c AS DOUBLE) / mc.mc)
                                  * {SCALE6:.1f}e0) AS BIGINT)
                  ELSE 0 END AS cq
      FROM scatter CROSS JOIN mc
    ), p_0 AS MATERIALIZED (
      SELECT DISTINCT i AS dim, CAST(1000000 AS BIGINT) AS v FROM cq
    ),
    {chain},
    vq AS (
      SELECT dim, CAST(floor(v / 1000.0e0) AS BIGINT) AS w FROM p_{ITERS}
    ), num AS (
      SELECT CAST(SUM(wi.w * c.cq * wj.w) AS BIGINT) AS num
      FROM cq c
      JOIN vq wi ON wi.dim = c.i
      JOIN vq wj ON wj.dim = c.j
    ), den AS (
      SELECT CAST(SUM(w * w) AS BIGINT) AS den FROM vq
    ), tr AS (
      SELECT CAST(SUM(cq) AS BIGINT) AS tr FROM cq WHERE i = j
    )
    SELECT p.dim, p.v AS loading_q6,
           CAST(num.num AS DOUBLE) / den.den AS eigval_norm,
           (CAST(num.num AS DOUBLE) / den.den) / tr.tr AS explained_ratio
    FROM p_{ITERS} p CROSS JOIN num CROSS JOIN den CROSS JOIN tr
    ORDER BY p.dim
    """
