"""Round-6 two-phase rewrites: result-identity against the naive
single-window forms they replaced, on seeded random + adversarial
boundary data.

The oracle gate already hash-checks these against DuckDB on the
TPC-H-ish corpora; these tests attack the REWRITE ARGUMENTS
specifically — budget boundaries where the kept set's token sum lands
exactly on the budget, duplicate (price, size) skyline points split
across salt groups, tied sort keys straddling range-partition
boundaries — with the naive Spark formulation as the model.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from p6__mapreduce_spark.operators.analytics import pareto_frontier
from p6__mapreduce_spark.operators.intervals import weighted_median_price
from p6__mapreduce_spark.operators.pipeline import token_budget_pack


class TestTokenBudgetPack:
    def _docs(self, spark, rows):
        # rows: (doc_id, source, n_tokens) -> synthesize text with
        # exactly n_tokens whitespace tokens
        return spark.createDataFrame(
            [(i, s, " ".join(["tok"] * n)) for i, s, n in rows],
            "doc_id long, source string, text string",
        )

    def _naive(self, docs, budget=5000):
        from p6__mapreduce_spark.functions.text import tokens_expr

        toks = docs.select(
            "doc_id",
            "source",
            F.size(tokens_expr("text")).cast("long").alias("n_tokens"),
        ).filter(F.col("n_tokens") > 0)
        w = (
            Window.partitionBy("source")
            .orderBy(F.col("n_tokens").desc(), "doc_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        ranked = toks.withColumn("cum", F.sum("n_tokens").over(w).cast("long"))
        kept = F.when(F.col("cum") <= budget, F.lit(1)).otherwise(F.lit(0))
        kept_t = F.when(F.col("cum") <= budget, F.col("n_tokens")).otherwise(F.lit(0))
        return (
            ranked.groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("docs_total"),
                F.sum(kept).cast("long").alias("docs_kept"),
                F.sum(kept_t).cast("long").alias("tokens_kept"),
            )
            .orderBy("source")
        )

    def _assert_equal(self, spark, rows, budget=5000):
        docs = self._docs(spark, rows)
        got = token_budget_pack(docs, budget=budget).collect()
        want = self._naive(docs, budget=budget).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in want]

    def test_random_corpus_matches_naive(self, spark):
        rng = random.Random(6)
        rows = [
            (i, f"s{rng.randint(0, 3)}", rng.randint(1, 400)) for i in range(600)
        ]
        self._assert_equal(spark, rows, budget=2000)

    def test_budget_hit_exactly_at_boundary(self, spark):
        # kept set sums to exactly the budget; the first cut row's
        # stage-2 predecessors must still carry >= budget tokens
        rows = [(1, "a", 4999), (2, "a", 1), (3, "a", 100), (4, "a", 1)]
        self._assert_equal(spark, rows, budget=5000)

    def test_first_cut_row_larger_than_later_kept_candidates(self, spark):
        # the sum-path case from the proof: K={4000}, f=2000 (cut),
        # later 500-token rows must ALSO be cut even though
        # sum(K) + 500 <= budget
        rows = [(1, "a", 4000), (2, "a", 2000), (3, "a", 500), (4, "a", 400)]
        self._assert_equal(spark, rows, budget=5000)

    def test_single_doc_over_budget(self, spark):
        rows = [(1, "a", 9000), (2, "a", 100)]
        self._assert_equal(spark, rows, budget=5000)

    def test_many_single_token_docs(self, spark):
        # rank-path bound: kept set is exactly `budget` docs of 1 token
        rows = [(i, "a", 1) for i in range(300)]
        self._assert_equal(spark, rows, budget=200)


class TestWeightedMedianHistogram:
    def _li(self, spark, rows):
        return spark.createDataFrame(
            [
                (flag, float(price), float(qty), i, 1)
                for i, (flag, price, qty) in enumerate(rows)
            ],
            "l_returnflag string, l_extendedprice double, l_quantity double,"
            " l_orderkey long, l_linenumber int",
        )

    def _naive(self, li):
        q = li.select(
            F.col("l_returnflag").alias("flag"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_cents"),
            F.col("l_quantity").cast("long").alias("w"),
            "l_orderkey",
            "l_linenumber",
        )
        w_cum = (
            Window.partitionBy("flag")
            .orderBy("price_cents", "l_orderkey", "l_linenumber")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        ranked = q.withColumn("cum_w", F.sum("w").over(w_cum)).withColumn(
            "tot_w", F.sum("w").over(Window.partitionBy("flag"))
        )
        hits = ranked.filter(F.col("cum_w") * 2 >= F.col("tot_w"))
        w_first = Window.partitionBy("flag").orderBy(
            "price_cents", "l_orderkey", "l_linenumber"
        )
        return (
            hits.withColumn("rn", F.row_number().over(w_first))
            .filter(F.col("rn") == 1)
            .select(
                F.col("flag").alias("l_returnflag"),
                F.col("price_cents").alias("wmedian_price_cents"),
                F.col("tot_w").alias("total_quantity"),
            )
            .orderBy("l_returnflag")
        )

    def test_random_matches_row_level_form(self, spark):
        rng = random.Random(66)
        rows = [
            (
                rng.choice(["A", "N", "R"]),
                rng.choice([10.0, 10.0, 25.5, 99.99, 1000.0]),  # heavy ties
                rng.randint(1, 50),
            )
            for _ in range(500)
        ]
        li = self._li(spark, rows)
        got = [tuple(r) for r in weighted_median_price(li).collect()]
        want = [tuple(r) for r in self._naive(li).collect()]
        assert got == want

    def test_half_total_exactly_on_price_boundary(self, spark):
        # group total 100; cumulative reaches exactly 50 at price 10 —
        # lower median must be 10 (2*50 >= 100), not the next price
        rows = [("A", 10.0, 50), ("A", 20.0, 50)]
        li = self._li(spark, rows)
        out = weighted_median_price(li).collect()
        assert out[0]["wmedian_price_cents"] == 1000
        assert out[0]["total_quantity"] == 100


class TestParetoTwoLevel:
    def _parts(self, spark, rows):
        return spark.createDataFrame(
            [(i, float(p), int(s)) for i, (p, s) in enumerate(rows)],
            "p_partkey long, p_retailprice double, p_size int",
        )

    def _naive(self, parts):
        p = parts.select(
            "p_partkey",
            F.round(F.col("p_retailprice") * 100).cast("long").alias("price_cents"),
            F.col("p_size").cast("long").alias("p_size"),
        )
        w_lt = Window.orderBy("price_cents").rangeBetween(
            Window.unboundedPreceding, -1
        )
        w_eq = Window.partitionBy("price_cents")
        s = p.select(
            "p_partkey",
            "price_cents",
            "p_size",
            F.max("p_size").over(w_lt).alias("bc"),
            F.max("p_size").over(w_eq).alias("bs"),
        )
        return (
            s.filter(
                (F.col("bc").isNull() | (F.col("p_size") > F.col("bc")))
                & (F.col("p_size") == F.col("bs"))
            )
            .select("p_partkey", "price_cents", "p_size")
            .orderBy("price_cents", "p_partkey")
        )

    def test_random_matches_single_pass(self, spark):
        rng = random.Random(7)
        rows = [
            (rng.choice([5.0, 9.5, 9.5, 20.0, 33.3]), rng.randint(1, 10))
            for _ in range(400)
        ]
        parts = self._parts(spark, rows)
        got = [tuple(r) for r in pareto_frontier(parts).collect()]
        want = [tuple(r) for r in self._naive(parts).collect()]
        assert got == want

    def test_duplicate_frontier_points_all_survive(self, spark):
        # equal (price, size) duplicates: neither strictly dominates,
        # all must survive both levels even when salted apart
        rows = [(10.0, 5)] * 8 + [(20.0, 3)] * 4 + [(5.0, 2)]
        parts = self._parts(spark, rows)
        out = pareto_frontier(parts).collect()
        # frontier: the 5.0/2 point and all eight 10.0/5 points; the
        # 20.0/3 points are dominated (10.0 is cheaper with size 5)
        assert len(out) == 9

    def test_equal_price_smaller_size_dominated(self, spark):
        rows = [(10.0, 5), (10.0, 4), (12.0, 6)]
        parts = self._parts(spark, rows)
        out = {r["p_partkey"] for r in pareto_frontier(parts).collect()}
        assert out == {0, 2}


class TestEmptyInputGuards:
    """r6 proactive audit: every trainer/runner that subscripts a
    .first() row now raises a contract error on an empty input table
    instead of a TypeError deep in the loop (the selection.py ADVICE
    class, applied to the remaining call sites)."""

    def _empty_emb(self, spark):
        return spark.createDataFrame(
            [], "vec_id long, embedding array<float>, label int"
        )

    def test_pq_empty_raises_value_error(self, spark):
        from p6__mapreduce_spark.similarity.pq import pq_codes

        with pytest.raises(ValueError, match="non-empty"):
            pq_codes(self._empty_emb(spark)).collect()

    def test_ivfpq_empty_raises_value_error(self, spark):
        from p6__mapreduce_spark.similarity.ivfpq import knn_ivfpq

        with pytest.raises(ValueError, match="non-empty"):
            knn_ivfpq(self._empty_emb(spark)).collect()

    def test_jl_empty_raises_value_error(self, spark):
        from p6__mapreduce_spark.similarity.jl import jl_projection_audit

        with pytest.raises(ValueError, match="non-empty"):
            jl_projection_audit(self._empty_emb(spark)).collect()

    def test_matryoshka_empty_raises_value_error(self, spark):
        from p6__mapreduce_spark.similarity.matryoshka import matryoshka_recall_audit

        with pytest.raises(ValueError, match="non-empty"):
            matryoshka_recall_audit(self._empty_emb(spark)).collect()
