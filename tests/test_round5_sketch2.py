"""Round-5 continuation unit tests: portable HLL, matryoshka audit."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_hll_estimate_within_envelope(spark):
    from p6__mapreduce_spark.operators.hll import hll_portable_audit

    # 2000 distinct users, one event type: n >> m so the raw estimator
    # is in its working regime (std err ~ 1.04/sqrt(256) = 6.5%)
    ev = spark.createDataFrame(
        [(i % 2000, "click") for i in range(6000)], "user_id long, event_type string"
    )
    (row,) = hll_portable_audit(ev).collect()
    assert row.exact_distinct == 2000
    assert abs(row.raw_est - 2000) / 2000 < 0.2  # 3 sigma
    assert 0 < row.n_hit_regs <= 256


def test_hll_registers_merge_by_max(spark):
    """The mergeability property: registers of a union == elementwise
    max of the parts' registers (the reason day->month rollups never
    rescan)."""
    from p6__mapreduce_spark.operators.hll import _mix32, _rho_expr, M

    def regs(rows):
        df = spark.createDataFrame(rows, "user_id long")
        w = _mix32(F.col("user_id"))
        out = (
            df.select(w.bitwiseAND(F.lit(M - 1)).alias("idx"),
                      _rho_expr(F.shiftright(w, 8)).alias("rho"))
            .groupBy("idx").agg(F.max("rho").alias("r")).collect()
        )
        return {r.idx: r.r for r in out}

    a = regs([(i,) for i in range(0, 500)])
    b = regs([(i,) for i in range(300, 900)])
    u = regs([(i,) for i in range(0, 900)])
    merged = {i: max(a.get(i, 0), b.get(i, 0)) for i in set(a) | set(b)}
    assert merged == u


def test_hll_mixer_beats_affine_bias(spark):
    """The documented reason for the avalanche mixer: consecutive ids
    through the mixer estimate within 20%; the plain affine hash's
    arithmetic-progression structure broke that on this shape."""
    from p6__mapreduce_spark.operators.hll import hll_portable_audit

    ev = spark.createDataFrame(
        [(i, "t") for i in range(5000)], "user_id long, event_type string"
    )
    (row,) = hll_portable_audit(ev).collect()
    assert abs(row.raw_est - 5000) / 5000 < 0.2


def test_matryoshka_full_prefix_is_perfect_recall(spark):
    """Truncating to the FULL dimension must reproduce the exact top-k
    (overlap == k for every query) — the audit's self-consistency."""
    from p6__mapreduce_spark.similarity.matryoshka import matryoshka_recall_audit

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = matryoshka_recall_audit(emb, n_queries=4, topk=3, trunc_dims=(64,)).collect()
    assert len(out) == 4
    assert all(r.n_overlap == 3 for r in out)


def test_matryoshka_overlap_monotone_in_prefix(spark):
    """Longer prefixes cannot systematically lose recall: mean overlap
    at 32 dims >= mean overlap at 8 dims on the test corpus."""
    from p6__mapreduce_spark.similarity.matryoshka import matryoshka_recall_audit

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = matryoshka_recall_audit(emb, n_queries=8, topk=5, trunc_dims=(8, 32)).collect()
    mean = {}
    for d in (8, 32):
        vals = [r.n_overlap for r in rows if r.trunc_d == d]
        assert len(vals) == 8
        mean[d] = sum(vals) / len(vals)
    assert mean[32] >= mean[8]
