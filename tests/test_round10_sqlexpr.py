"""Round-10 optimization guards: the SQL-string expression builders.

The r10 optimization round replaced the Py4J Column-by-Column
construction of the trainer-family argmin/encode expressions with
single parsed SQL strings (kmeans._best_sql, pq._pq_best_sql /
pq._encode_sql, ivf._scores_sql) — profiling showed DataFrame
CONSTRUCTION, not execution, dominated every Lloyd/PQ iteration.
These tests pin the load-bearing equivalence claims:

1. the parsed trees compute exactly what an independent Python
   replica computes (exact integer / IEEE-754 double arithmetic,
   same (distance, index) tie-breaks);
2. the centroid matrices stay plan DATA (one foldable array literal),
   never unrolled scalar code — the Janino-compile-time discipline the
   family has carried since r6 (a constant-folded scalar unroll
   recompiles per iteration, measured 21-55 s per plan).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from p6__mapreduce_spark.plans import explain_str
from p6__mapreduce_spark.similarity.ivf import _cc, _scores_sql
from p6__mapreduce_spark.similarity.kmeans import _best_sql
from p6__mapreduce_spark.similarity.pq import _encode_sql, _pq_best_sql

# deterministic small fixture: 7 vectors x 8 dims, values that exercise
# negatives, ties and zero rows
VECS = [
    [(i * 37 + j * 11) % 23 - 11 for j in range(8)] for i in range(7)
]
VECS[3] = list(VECS[1])  # exact duplicate -> distance ties
VECS[5] = [0] * 8
CENTS = [VECS[0], VECS[2], list(VECS[0])]  # duplicate centroid -> index tie


def _py_best(e, cents):
    return min(
        (sum((a - b) * (a - b) for a, b in zip(e, c)), i)
        for i, c in enumerate(cents)
    )


def _df(spark):
    rows = [(i, v) for i, v in enumerate(VECS)]
    return spark.createDataFrame(rows, "vec_id long, e array<bigint>")


def test_best_sql_matches_python_replica(spark):
    got = (
        _df(spark)
        .selectExpr("vec_id", f"{_best_sql('e', CENTS)} AS b")
        .selectExpr("vec_id", "b.d AS d", "b.i AS i")
        .collect()
    )
    for r in got:
        d, i = _py_best(VECS[r.vec_id], CENTS)
        assert (r.d, r.i) == (d, i), f"vec {r.vec_id}: {(r.d, r.i)} != {(d, i)}"


def test_pq_encode_sql_matches_python_replica(spark):
    m, dsub = 2, 4
    codebooks = [
        [c[s * dsub : (s + 1) * dsub] for c in CENTS] for s in range(m)
    ]
    got = (
        _df(spark)
        .select("vec_id", F.explode(F.expr(_encode_sql(m, dsub, codebooks))).alias("ps"))
        .selectExpr("vec_id", "ps.subspace AS s", "ps.b.i AS code", "ps.b.d AS err")
        .collect()
    )
    assert len(got) == len(VECS) * m
    for r in got:
        sub = VECS[r.vec_id][r.s * dsub : (r.s + 1) * dsub]
        d, i = _py_best(sub, codebooks[r.s])
        assert (r.err, r.code) == (d, i)


def test_scores_sql_matches_python_replica(spark):
    cents = [[x * 0.25 for x in c] for c in CENTS]
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(VECS)]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    got = (
        df.selectExpr("vec_id", f"array_min({_scores_sql('v', cents)}) AS b")
        .selectExpr("vec_id", "b.s AS s", "b.i AS i")
        .collect()
    )
    for r in got:
        v = [float(x) for x in VECS[r.vec_id]]
        # replica of the exact fold: left-to-right double accumulation
        def score(c):
            dot = 0.0
            for x, y in zip(v, c):
                dot = dot + x * y
            return _cc(c) - 2.0 * dot
        want = min((score(c), i) for i, c in enumerate(cents))
        assert (r.s, r.i) == want


def test_matrix_stays_plan_data_not_unrolled_code(spark):
    """The parsed argmin keeps ONE array-literal matrix: the optimized
    plan must show a higher-order `transform(...)` over a folded array
    literal (data), not k x d unrolled per-scalar arithmetic. A scalar
    unroll would recompile per Lloyd round (the measured 21-55 s Janino
    pathology the family's docstrings pin)."""
    df = _df(spark).selectExpr(f"{_best_sql('e', CENTS)}.i AS i")
    txt = explain_str(df, "extended")
    opt = txt[txt.index("== Optimized Logical Plan ==") :]
    assert "transform(" in opt and "aggregate(" in opt
    # the matrix folded to a single nested-array literal: the centroid
    # values appear inside ONE [[...]] literal, not as repeated scalar
    # subtraction terms
    assert opt.count("lambdafunction") >= 2
