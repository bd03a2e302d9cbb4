"""HITS hubs/authorities and cross-source quantile normalization:
hand-computed expectations on tiny exact frames."""

from __future__ import annotations

import datetime as dt

from p6__mapreduce_spark.operators.graph import nation_trade_hits


def _star(spark, edges):
    """Build the minimal star schema producing exactly ``edges`` =
    [(src_nation, dst_nation, dollars)] in the trade matrix: one
    supplier per src nation, one customer per dst nation, one order +
    lineitem per edge."""
    nations = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    nation = spark.createDataFrame(
        [(n, f"N{n}", 0) for n in nations], "n_nationkey int, n_name string, n_regionkey int"
    )
    supplier = spark.createDataFrame(
        [(n, f"S{n}", n, 0.0) for n in nations],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    customer = spark.createDataFrame(
        [(n, f"C{n}", n, 0.0, "A") for n in nations],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    )
    orows, lrows = [], []
    for i, (s, d, dollars) in enumerate(edges):
        orows.append((i, d, "O", 0.0, dt.datetime(2020, 1, 1), "1-URGENT"))
        lrows.append((i, 0, s, float(dollars), 0.0))
    orders = spark.createDataFrame(
        orows,
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, "
        "o_orderdate timestamp, o_orderpriority string",
    )
    lineitem = spark.createDataFrame(
        lrows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_extendedprice double, l_discount double",
    )
    return nation, customer, supplier, orders, lineitem


class TestHits:
    def test_single_dominant_exporter(self, spark):
        # 0 exports to 1 and 2; 3 exports a little to 1.
        # Node 0 must be the top hub; node 1 (receiving from both) the top authority.
        n, c, s, o, li = _star(spark, [(0, 1, 500), (0, 2, 400), (3, 1, 100)])
        out = {r["nation_key"]: r for r in nation_trade_hits(n, c, s, o, li, iters=2).collect()}
        assert out[0]["hub_q6"] == 1_000_000  # renormalized max
        assert out[3]["hub_q6"] < out[0]["hub_q6"]
        assert out[1]["auth_q6"] == 1_000_000
        assert out[2]["auth_q6"] < out[1]["auth_q6"]
        # nodes with no out-edges are zero hubs; no in-edges, zero authorities
        assert out[1]["hub_q6"] == 0
        assert out[0]["auth_q6"] == 0

    def test_symmetric_pair_ties(self, spark):
        # two disjoint equal-weight edges -> equal hub scores, equal auth scores
        n, c, s, o, li = _star(spark, [(0, 1, 300), (2, 3, 300)])
        out = {r["nation_key"]: r for r in nation_trade_hits(n, c, s, o, li, iters=2).collect()}
        assert out[0]["hub_q6"] == out[2]["hub_q6"] == 1_000_000
        assert out[1]["auth_q6"] == out[3]["auth_q6"] == 1_000_000


class TestQuantileNormalizeTokens:
    def _run(self, spark, docs):
        import p6__mapreduce_spark.queries as Q

        df = spark.createDataFrame(
            [(i, t, "en", src, len(t)) for i, (src, t) in enumerate(docs)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        # exercise the registered query body directly against a temp dir
        import os
        import tempfile

        d = tempfile.mkdtemp(prefix="p6_qnorm_")
        df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        try:
            return {
                r["doc_id"]: r for r in Q.QUERIES["quantile_normalize_tokens"](spark, d).collect()
            }
        finally:
            import shutil

            shutil.rmtree(d, ignore_errors=True)

    def test_source_distributions_align(self, spark):
        # source A: 1,2,3-token docs; source B: 10,20,30-token docs.
        # After normalization both sources map rank 1/2/3 onto the SAME
        # pooled positional quantiles of {1,2,3,10,20,30}.
        docs = [
            ("A", "a"), ("A", "a b"), ("A", "a b c"),
            ("B", " ".join(["w"] * 10)), ("B", " ".join(["w"] * 20)), ("B", " ".join(["w"] * 30)),
        ]
        out = self._run(spark, docs)
        # N=6; for n_src=3: g_rank = 1 + (rn-1)*5 div 2 -> ranks 1, 3, 6
        # pooled sorted values: 1,2,3,10,20,30 -> positions 1,3,6 = 1, 3, 30
        a_vals = [out[i]["norm_tokens"] for i in range(3)]
        b_vals = [out[i]["norm_tokens"] for i in range(3, 6)]
        assert a_vals == b_vals == [1, 3, 30]

    def test_singleton_source_gets_global_median(self, spark):
        docs = [("A", "a"), ("A", "a b"), ("A", "a b c d"), ("B", " ".join(["w"] * 9))]
        out = self._run(spark, docs)
        # N=4 -> median position (4+1) div 2 = 2; pooled sorted: 1,2,4,9 -> value 2
        assert out[3]["norm_tokens"] == 2
