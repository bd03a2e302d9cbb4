"""Property-based checks (SURVEY.md §5): invariants that replace the
reference parser's assertions (wordcount_parser.py:28-38).

Pure-Python models (bucket math, djb2) get full hypothesis fuzzing;
Spark round-trips use a small example budget to keep the suite fast.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from p6__mapreduce_spark.functions.hashing import djb2
from p6__mapreduce_spark.operators.core import distinct_sorted, line_count
from tests.conftest import lines_df

ascii_line = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1, max_size=20
)

spark_settings = settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
)


@given(st.lists(ascii_line, min_size=1, max_size=50))
@spark_settings
def test_count_sum_equals_input_rows(spark, lines):
    rows = line_count(lines_df(spark, lines)).collect()
    assert sum(r.cnt for r in rows) == len(lines)          # no pair lost
    assert len(rows) == len(set(lines))                    # one reduce per key
    assert dict((r.key, r.cnt) for r in rows) == Counter(lines)


@given(st.lists(ascii_line, min_size=1, max_size=50))
@spark_settings
def test_distinct_output_sorted_and_unique(spark, lines):
    got = [r.key for r in distinct_sorted(lines_df(spark, lines)).collect()]
    assert got == sorted(set(lines))


@given(st.text(min_size=0, max_size=64), st.integers(min_value=1, max_value=64))
def test_djb2_in_range_and_deterministic(key, n):
    assert 0 <= djb2(key, n) < n
    assert djb2(key, n) == djb2(key, n)


def test_new_pipeline_ops_partition_invariant(spark):
    # the determinism claim: output is a pure function of the DATA, not
    # the layout. Same result at 1 partition and at a skewed 13.
    from p6__mapreduce_spark.operators.analytics import winsorize_by_group
    from p6__mapreduce_spark.operators.pipeline import doc_chunks, sequence_packing
    from p6__mapreduce_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    ev = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .select("event_type", "value")
        .limit(2000)
    )
    for op, src in (
        (lambda d: doc_chunks(d), docs),
        (lambda d: sequence_packing(d), docs),
        (lambda d: winsorize_by_group(d, "event_type", "value"), ev),
    ):
        a = sorted(map(tuple, op(src.repartition(1)).collect()))
        b = sorted(map(tuple, op(src.repartition(13)).collect()))
        assert a == b and len(a) > 0


def test_doc_chunks_reconstructs_token_stream(spark):
    # stitching chunks back together (dropping each chunk's leading
    # `overlap` tokens after the first) must reproduce the exact token
    # stream — no token lost or duplicated at any boundary
    from pyspark.sql import functions as F

    from p6__mapreduce_spark.functions.text import tokens_expr
    from p6__mapreduce_spark.operators.pipeline import doc_chunks
    from p6__mapreduce_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(50)
    chunks = doc_chunks(docs, chunk_size=16, overlap=4).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_text.split(" ")))
    want = {
        r.doc_id: r.toks
        for r in docs.select("doc_id", tokens_expr("text").alias("toks")).collect()
        if r.toks
    }
    assert set(by_doc) == set(want)
    for doc_id, parts in by_doc.items():
        parts.sort()
        stream = list(parts[0][1])
        for idx, toks in parts[1:]:
            start = idx * 12  # stride = 16 - 4
            # tokens before len(stream) are already emitted; append the rest
            stream += toks[len(stream) - start :]
        assert stream == want[doc_id], doc_id


@settings(deadline=None, max_examples=30, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 0xFFFF), st.integers(0, 0xFFFF)),
        min_size=1,
        max_size=20,
    )
)
def test_morton_code_interleave_roundtrip(spark, pairs):
    """morton_code is a bijection on uint16 pairs: de-interleaving the
    engine's output bits recovers exactly (a, b), for arbitrary
    inputs — the property the Z-order layout key depends on."""
    from p6__mapreduce_spark.functions.zorder import morton_code

    df = spark.createDataFrame(pairs, "a long, b long")
    rows = df.select("a", "b", morton_code("a", "b").alias("z")).collect()

    def deinterleave(z: int) -> tuple[int, int]:
        a = b = 0
        for i in range(16):
            b |= ((z >> (2 * i)) & 1) << i
            a |= ((z >> (2 * i + 1)) & 1) << i
        return a, b

    for r in rows:
        assert deinterleave(r.z) == (r.a, r.b)


def test_continuation_ops_partition_invariant(spark):
    # round-4 continuation ops: result is a pure function of the data,
    # not the partitioning — 1 partition vs a skewed 13 must agree
    # bit-for-bit (all of these quantize/fix-point before aggregation)
    from p6__mapreduce_spark.operators.dsir import dsir_weights
    from p6__mapreduce_spark.operators.pipeline import weighted_sample
    from p6__mapreduce_spark.operators.sketches import cms_token_audit
    from p6__mapreduce_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    for op in (
        lambda d: dsir_weights(d),
        lambda d: cms_token_audit(d),
        lambda d: weighted_sample(d),
    ):
        a = sorted(map(tuple, op(docs.repartition(1)).collect()))
        b = sorted(map(tuple, op(docs.repartition(13)).collect()))
        assert a == b and len(a) > 0


def test_bpe_merges_partition_invariant(spark):
    from p6__mapreduce_spark.operators.bpe import bpe_learn_merges
    from p6__mapreduce_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    a = [tuple(r) for r in bpe_learn_merges(spark, docs.repartition(1), 4).collect()]
    b = [tuple(r) for r in bpe_learn_merges(spark, docs.repartition(13), 4).collect()]
    assert a == b and len(a) == 4


def _bpe_reference(texts, num_merges):
    # pure-Python BPE reference: word-frequency vocab, weighted pair
    # counts, (count desc, lhs, rhs) argmax, leftmost-nonoverlap merge
    import re
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in re.split(r"[^a-z0-9]+", t.lower().strip()):
            if w:
                words[w] += 1
    vocab = {w: list(w) for w in words}
    merges = []
    for idx in range(num_merges):
        pairs = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += words[w]
        if not pairs:
            break
        (lhs, rhs), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((idx, lhs, rhs, c))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


@given(st.lists(st.text(alphabet="abc ", min_size=1, max_size=12), min_size=1, max_size=8))
@spark_settings
def test_bpe_matches_python_reference(spark, texts):
    from p6__mapreduce_spark.operators.bpe import bpe_learn_merges

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r.merge_idx, r.lhs, r.rhs, r.pair_count)
        for r in bpe_learn_merges(spark, docs, num_merges=3).collect()
    ]
    assert got == _bpe_reference(texts, 3)


@given(
    st.lists(
        st.lists(st.sampled_from("aa bb cc dd ee ff gg hh".split()), min_size=3, max_size=12),
        min_size=2,
        max_size=8,
    )
)
@spark_settings
def test_prefix_filter_equals_full_join_on_random_corpora(spark, word_lists):
    # the prefix lemma must hold on ANY corpus, including degenerate
    # ones (identical docs, disjoint docs, single-shingle docs)
    from p6__mapreduce_spark.dedup.jaccard import (
        ngram_jaccard_pairs,
        prefix_filter_pairs,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(word_lists)],
        "doc_id long, text string",
    )
    full = {(r.id1, r.id2) for r in ngram_jaccard_pairs(docs, 0.6).collect()}
    pref = {(r.id1, r.id2) for r in prefix_filter_pairs(docs, 0.6).collect()}
    assert pref == full


def test_round5_continuation_ops_partition_invariant(spark):
    # round-5 continuation ops: 1 partition vs a skewed 13 must agree
    # bit-for-bit (integer quantization before any aggregation)
    from p6__mapreduce_spark.dedup.jaccard import containment_pairs
    from p6__mapreduce_spark.dedup.triangles import triangle_stats
    from p6__mapreduce_spark.operators.lm import kneser_ney_bigram
    from p6__mapreduce_spark.operators.robust import (
        seasonal_anomaly_daily,
        theil_sen_daily_revenue,
    )
    from p6__mapreduce_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (3, 5)], "id1 long, id2 long"
    )
    cases = [
        (docs, kneser_ney_bigram),
        (docs, lambda d: containment_pairs(d, threshold=0.5)),
        (orders, theil_sen_daily_revenue),
        (orders, seasonal_anomaly_daily),
        (edges, triangle_stats),
    ]
    for df, op in cases:
        a = sorted(map(tuple, op(df.repartition(1)).collect()))
        b = sorted(map(tuple, op(df.repartition(13)).collect()))
        assert a == b and len(a) > 0


def test_interval_bin_join_equals_nested_loop_on_random_data(spark):
    import datetime as dt
    import random

    from pyspark.sql import functions as F

    from p6__mapreduce_spark.operators.rangejoin import interval_bin_join

    rng = random.Random(99)
    base = dt.datetime(2024, 1, 1)
    pts = [(i, base + dt.timedelta(seconds=rng.randrange(0, 86400))) for i in range(80)]
    ivs = [
        (j, base + dt.timedelta(seconds=(s := rng.randrange(0, 86400))),
         base + dt.timedelta(seconds=s + rng.randrange(1, 7200)))
        for j in range(40)
    ]
    pdf = spark.createDataFrame(pts, "pid long, ts timestamp")
    idf = spark.createDataFrame(ivs, "iid long, start timestamp, end timestamp")
    got = {
        (r.pid, r.iid)
        for r in interval_bin_join(pdf, idf, bin_seconds=600).collect()
    }
    want = {
        (p, j)
        for p, t in pts
        for j, s, e in ivs
        if s <= t < e
    }
    assert got == want


def test_round5_closing_ops_partition_invariant(spark):
    # round-5 closing batch: 1 partition vs a skewed 13 must agree
    # bit-for-bit (integer sums / quantization before any reduction)
    from p6__mapreduce_spark.operators.features import target_encode_loo
    from p6__mapreduce_spark.operators.timeseries import acf_daily_revenue, ols_daily_trend
    from p6__mapreduce_spark.similarity.selection import kcenter_coreset
    from p6__mapreduce_spark.similarity.silhouette import silhouette_by_cluster
    from p6__mapreduce_spark.sources.readers import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    cust = load_table(spark, "/root/testdata/sf0.001", "customer")
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = [[0.0] * 64, [1.0] * 64]
    cases = [
        (orders, ols_daily_trend),
        (orders, lambda o: acf_daily_revenue(o, max_lag=3)),
        (orders, lambda o: target_encode_loo(o, cust)),
        (emb, lambda e: silhouette_by_cluster(e, cents)),
        (emb, lambda e: kcenter_coreset(e, k=4)),
    ]
    for df, op in cases:
        a = sorted(map(tuple, op(df.repartition(1)).collect()))
        b = sorted(map(tuple, op(df.repartition(13)).collect()))
        assert a == b and len(a) > 0


def test_round5_closing_ops_partition_invariant(spark):
    """The 16 closing-batch operators produce identical results on 1
    vs 13 input partitions — windows, sweep-lines, posting joins and
    moment aggregates must not depend on physical layout."""
    from p6__mapreduce_spark.dedup.neighborhood import sorted_neighborhood_pairs
    from p6__mapreduce_spark.operators.causal import (
        calibration_bins,
        cuped_adjusted_lift,
        ipw_uplift_by_segment,
    )
    from p6__mapreduce_spark.operators.divergence import jsd_source_unigrams
    from p6__mapreduce_spark.operators.intervals import (
        peak_concurrency_daily,
        scd2_user_state,
        weighted_median_price,
    )
    from p6__mapreduce_spark.operators.ranking import tfidf_cosine_topk
    from p6__mapreduce_spark.operators.timeseries import durbin_watson_daily
    from p6__mapreduce_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    orders = load_table(spark, sf, "orders")
    events = load_table(spark, sf, "events")
    lineitem = load_table(spark, sf, "lineitem")
    customer = load_table(spark, sf, "customer")

    cases = [
        (events, scd2_user_state),
        (events, peak_concurrency_daily),
        (lineitem, weighted_median_price),
        (events, cuped_adjusted_lift),
        (events, calibration_bins),
        (docs, jsd_source_unigrams),
        (docs, sorted_neighborhood_pairs),
        (docs, lambda d: tfidf_cosine_topk(d, k=3, max_df=50)),
        (orders, durbin_watson_daily),
    ]
    for df, op in cases:
        a = sorted(map(tuple, op(df.repartition(1)).collect()))
        b = sorted(map(tuple, op(df.repartition(13)).collect()))
        assert a == b and len(a) > 0
    # two-table op separately (repartition the fact side)
    a = sorted(map(tuple, ipw_uplift_by_segment(orders.repartition(1), customer).collect()))
    b = sorted(map(tuple, ipw_uplift_by_segment(orders.repartition(13), customer).collect()))
    assert a == b and len(a) > 0


def test_round5_final_queries_partition_invariant(spark):
    """The registry-level closing queries (monkeypatched load_table)
    are layout-independent on 1 vs 13 partitions."""
    import p6__mapreduce_spark.queries as qmod
    from p6__mapreduce_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    events = load_table(spark, sf, "events")
    orders = load_table(spark, sf, "orders")
    docs = load_table(spark, sf, "documents")
    cases = [
        (events, qmod.q_markov_next_accuracy),
        (events, qmod.q_markov_entropy_rate),
        (events, qmod.q_overdispersion_by_type),
        (events, qmod.q_decision_stump_value),
        (events, qmod.q_rolling_7d_active_users),
        (events, qmod.q_xcorr_count_value_daily),
        (events, qmod.q_calibration_bins),
        (orders, qmod.q_wow_revenue_change),
        (docs, qmod.q_char_bigram_entropy),
    ]
    orig = qmod.load_table
    try:
        for df, q in cases:
            for parts in (1, 13):
                qmod.load_table = (
                    lambda s, d, n, _df=df, _p=parts: _df.repartition(_p)
                )
                got = sorted(map(tuple, q(spark, "x").collect()))
                if parts == 1:
                    base = got
                else:
                    assert got == base and len(base) > 0, q.__name__
    finally:
        qmod.load_table = orig


# --- r7: two-phase ranking primitives under fuzzed shapes ------------
# two_phase_rank's correctness argument (range boundary + offset join)
# must hold for ANY group skew / duplicate density / partition count,
# not just the fixed shapes in test_ranks.py. The model is Python
# sorting; ntile_expr's model is the SQL-standard bucket split.

rank_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),   # duplicate-heavy sort value
        st.sampled_from(["a", "b", "c", "d"]),   # group
    ),
    min_size=1,
    max_size=60,
)


@given(rank_rows, st.sampled_from([1, 3, 7, 50]))
@spark_settings
def test_two_phase_rank_matches_python_model(spark, rows, nparts):
    from p6__mapreduce_spark.functions.ranks import two_phase_rank

    df = spark.createDataFrame(
        [(i, v, g) for i, (v, g) in enumerate(rows)], "id long, v long, g string"
    )
    got = {
        (r.g, r.id): r.rk
        for r in two_phase_rank(
            df, ["v", "id"], group_cols=["g"], rank_col="rk", num_partitions=nparts
        ).collect()
    }
    model: dict = {}
    by_g: dict = {}
    for i, (v, g) in enumerate(rows):
        by_g.setdefault(g, []).append((v, i))
    for g, vals in by_g.items():
        for rank, (v, i) in enumerate(sorted(vals), start=1):
            model[(g, i)] = rank
    assert got == model


@given(
    st.integers(min_value=1, max_value=200),  # group size n
    st.integers(min_value=1, max_value=12),   # tiles
)
@settings(max_examples=40, deadline=None)
def test_ntile_expr_matches_sql_standard_split(n, tiles):
    # pure column math — evaluate the closed form in Python against the
    # SQL-standard definition: first (n mod t) buckets get ceil(n/t)
    q, r = divmod(n, tiles)
    def model(rank):
        big = r * (q + 1)
        if rank <= big:
            return (rank - 1) // (q + 1) + 1
        return r + (rank - big - 1) // q + 1 if q else r
    # Spark evaluation of the expression over all ranks 1..n at once
    from pyspark.sql import functions as F
    from p6__mapreduce_spark.functions.ranks import ntile_expr
    from p6__mapreduce_spark.session import get_session

    spark = get_session("ntile_prop")
    out = (
        spark.range(1, n + 1)
        .select(
            F.col("id").alias("rank"),
            ntile_expr(F.col("id"), F.lit(n).cast("long"), tiles).alias("t"),
        )
        .collect()
    )
    assert {r_.rank: r_.t for r_ in out} == {k: model(k) for k in range(1, n + 1)}
