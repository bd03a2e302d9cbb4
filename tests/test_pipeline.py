"""Training-data pipeline operators: repetition, decontamination,
deterministic splits, weighted mixing, stream-stream join."""

from __future__ import annotations

from pyspark.sql import functions as F

from p6__mapreduce_spark.operators.pipeline import (
    contamination_pairs,
    mixture_sample,
    repetition_stats,
    split_assign,
)
from p6__mapreduce_spark.plans import physical_plan

SF = "/root/testdata/sf0.001"


def docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_repetition_stats_counts(spark):
    df = docs_df(
        spark,
        [
            (1, "a b c a b c a b c", "s"),  # 'a b c' 3x of 7 trigrams
            (2, "one two three four", "s"),  # all distinct
            (3, "too short", "s"),  # < k tokens -> omitted
        ],
    )
    out = {r.doc_id: r for r in repetition_stats(df, k=3).collect()}
    assert set(out) == {1, 2}
    assert out[1].n_total == 7 and out[1].n_distinct == 3 and out[1].max_repeat == 3
    assert abs(out[1].rep_ratio - (1 - 3 / 7)) < 1e-15
    assert out[2].n_total == 2 and out[2].max_repeat == 1 and out[2].rep_ratio == 0.0


def test_split_assign_is_stable_and_partitioned(spark):
    df = docs_df(spark, [(i, f"text {i}", "s") for i in range(500)])
    a = {r.doc_id: r.split for r in split_assign(df).collect()}
    # deterministic under re-evaluation and under corpus growth: the
    # first 100 docs keep their labels when 400 more arrive
    small = {r.doc_id: r.split for r in split_assign(df.filter("doc_id < 100")).collect()}
    assert all(a[i] == small[i] for i in small)
    counts = {s: sum(1 for v in a.values() if v == s) for s in ("train", "val", "test")}
    assert sum(counts.values()) == 500
    assert counts["train"] > 300 and counts["val"] > 10 and counts["test"] > 10


def test_mixture_sample_weights(spark):
    df = docs_df(
        spark,
        [(i, f"some text number {i}", ["keep_all", "drop", "half"][i % 3]) for i in range(600)],
    )
    out = mixture_sample(df, {"keep_all": 1.0, "half": 0.5}).collect()
    srcs = [r.source for r in out]
    assert srcs.count("keep_all") == 200  # weight 1.0 keeps every doc
    assert srcs.count("drop") == 0  # absent from weights -> dropped
    assert 60 <= srcs.count("half") <= 140  # ~binomial(200, .5)
    # deterministic: a second evaluation returns the identical sample
    again = mixture_sample(df, {"keep_all": 1.0, "half": 0.5}).collect()
    assert sorted(r.doc_id for r in again) == sorted(r.doc_id for r in out)


def test_contamination_finds_planted_leak(spark):
    leak = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, f"filler{i} " + " ".join(f"w{i}_{j}" for j in range(12)), "s") for i in range(40)]
    # doc 9 is in the eval split (sha256('9') starts with '1'); plant the
    # same 10-token window in train doc 11 (sha256('11') does not)
    rows[9] = (9, leak + " tail9", "s")
    rows[11] = (11, "head11 " + leak, "s")
    out = contamination_pairs(docs_df(spark, rows), k=5, min_overlap=5).collect()
    assert [(r.eval_id, r.train_id) for r in out] == [(9, 11)]
    assert out[0].n_overlap == 6  # 10-token shared window -> 6 shared 5-grams


def test_pii_counts_and_redaction(spark):
    from p6__mapreduce_spark.operators.pii import pii_counts, redact_pii

    df = docs_df(
        spark,
        [
            (1, "mail me at jane.doe+x@example.co.uk or call 555-123-4567", "s"),
            (2, "ssn 123-45-6789 from host 10.0.255.1", "s"),
            (3, "clean text with numbers 42 and 2024 only", "s"),
        ],
    )
    counts = {r.doc_id: r for r in pii_counts(df).collect()}
    assert counts[1].n_email == 1 and counts[1].n_phone == 1 and counts[1].n_pii == 2
    assert counts[2].n_ssn == 1 and counts[2].n_ipv4 == 1 and counts[2].n_pii == 2
    assert counts[3].n_pii == 0

    red = {r.doc_id: r.text for r in redact_pii(df).collect()}
    assert red[1] == "mail me at [EMAIL] or call [PHONE]"
    assert red[2] == "ssn [SSN] from host [IPV4]"
    assert red[3] == "clean text with numbers 42 and 2024 only"
    # the full synthetic corpus is PII-free: the scan proves it
    from p6__mapreduce_spark.sources.readers import load_table

    corpus = pii_counts(load_table(spark, SF, "documents"))
    assert corpus.agg(F.sum("n_pii")).first()[0] == 0


def test_streaming_join_equals_batch_twin(spark):
    from p6__mapreduce_spark.sources.readers import load_table
    from p6__mapreduce_spark.streaming.join import run_streaming_click_purchase_join

    got = run_streaming_click_purchase_join(spark, SF).collect()
    ev = load_table(spark, SF, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("event_id").alias("click_id"), F.col("ts").alias("cts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("event_id").alias("purchase_id"), F.col("ts").alias("pts")
    )
    want = (
        c.join(
            p,
            (F.col("user_id") == F.col("pu"))
            & (F.col("pts") >= F.col("cts"))
            & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 6 hours")),
        )
        .select("user_id", "click_id", "purchase_id")
        .collect()
    )
    assert len(got) == len(want) > 0
    assert {(r.click_id, r.purchase_id) for r in got} == {
        (r.click_id, r.purchase_id) for r in want
    }
    # and the streaming run genuinely crossed a batch boundary: pairs on
    # both sides of the stage midpoint exist (guaranteed by staging)
    assert len({r.user_id for r in got}) > 1


def test_doc_chunks_overlap_and_tail(spark):
    from p6__mapreduce_spark.operators.pipeline import doc_chunks

    # 10 tokens, chunk_size=4, overlap=2 -> stride 2 -> starts 0,2,4,6
    # (last chunk [g h i j] covers the tail exactly); short doc -> 1 chunk
    rows = [
        (1, "a b c d e f g h i j", "s"),
        (2, "x y", "s"),
        (3, "", "s"),  # empty: no tokens, no chunks
    ]
    out = doc_chunks(docs_df(spark, rows), chunk_size=4, overlap=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert [r.chunk_text for r in by_doc[1]] == ["a b c d", "c d e f", "e f g h", "g h i j"]
    assert [r.n_chunk_tokens for r in by_doc[1]] == [4, 4, 4, 4]
    assert [r.chunk_text for r in by_doc[2]] == ["x y"]
    assert 3 not in by_doc
    # ragged tail: 9 tokens -> starts 0,2,4,6 with last chunk len 3
    out9 = doc_chunks(docs_df(spark, [(1, "a b c d e f g h i", "s")]), 4, 2).collect()
    assert [r.n_chunk_tokens for r in out9] == [4, 4, 4, 3]


def test_sequence_packing_no_global_window(spark):
    from p6__mapreduce_spark.operators.pipeline import sequence_packing

    rows = [(i, " ".join(["tok"] * 10), "s") for i in range(16)]
    out = sequence_packing(docs_df(spark, rows), seq_len=25, n_shards=4)
    got = {r.doc_id: r for r in out.collect()}
    # shard 0 holds docs 0,4,8,12 (10 tokens each): starts 0,10,20,30
    # -> seq ids 0,0,0,1 and offsets 0,10,20,5
    assert [(got[i].seq_id, got[i].offset_in_seq) for i in (0, 4, 8, 12)] == [
        (0, 0), (0, 10), (0, 20), (1, 5)
    ]
    # scale guard: the window must be partitioned by shard, never global
    plan = physical_plan(out)
    assert "SinglePartition" not in plan


def test_run_pipeline_end_to_end(spark, tmp_path):
    # the capstone tool: quality -> dedup -> chunk -> pack -> atomic
    # publish, one subprocess, readable output at the end
    import json
    import subprocess
    import sys

    res = subprocess.run(
        [sys.executable, "tools/run_pipeline.py", str(tmp_path)],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        # ~200s on an idle machine, ~460s on a drifted one (r6 measured
        # both); the gate runs this beside the suite's own JVM, so the
        # ceiling needs idle-time x drift x co-tenancy headroom — 480s
        # flaked twice in r6 under exactly that stack-up
        timeout=900,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    payload = json.loads(res.stdout.strip().splitlines()[-1])
    c = payload["counts"]
    assert c["after_dedup"] < c["input"]  # the near-dups really left
    assert 0 < c["after_surprisal"] <= c["after_quality"]  # gibberish gate ran
    assert 0 < c["after_mixture"] <= c["after_dedup"]  # rebalancing ran
    assert c["published"] == c["chunks"] > 0
    out = spark.read.parquet(str(tmp_path / "training_chunks"))
    assert {"doc_id", "shard", "seq_id", "offset_in_seq", "chunk_text", "split"} <= set(
        out.columns
    )
    assert out.count() == c["published"]
    # split is a physical partition column with all three values
    assert {r.split for r in out.select("split").distinct().collect()} == {
        "train",
        "val",
        "test",
    }


def test_source_cap_identical_to_naive_single_window(spark):
    from pyspark.sql import Window

    from p6__mapreduce_spark.operators.pipeline import source_cap
    from p6__mapreduce_spark.sources.readers import load_table

    docs = load_table(spark, SF, "documents")
    order = (F.sha2(F.col("text"), 256), F.col("doc_id"))
    naive = (
        docs.withColumn("rk", F.row_number().over(Window.partitionBy("source").orderBy(*order)))
        .filter("rk <= 3")
        .select("doc_id", "source")
    )
    for salts in (1, 2, 64):  # salts=1 degenerates to the naive plan's groups
        got = source_cap(docs, 3, salts=salts).select("doc_id", "source")
        assert {tuple(r) for r in got.collect()} == {tuple(r) for r in naive.collect()}


def test_source_cap_respects_k_and_hot_source(spark):
    from p6__mapreduce_spark.operators.pipeline import source_cap

    # one pathologically hot source (900 of 1000 docs) + tiny sources
    rows = [(i, f"text {i}", "hot" if i < 900 else f"s{i % 7}") for i in range(1000)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = source_cap(docs, 5).groupBy("source").count().collect()
    counts = {r.source: r["count"] for r in out}
    assert counts["hot"] == 5
    assert all(v <= 5 for v in counts.values())


def test_temperature_mixture_flattens_sources(spark):
    from p6__mapreduce_spark.operators.pipeline import temperature_mixture

    rows = [(i, f"doc text number {i}", "big" if i < 400 else "small") for i in range(425)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    kept = temperature_mixture(df).collect()
    by_src = {}
    for r in kept:
        by_src[r.source] = by_src.get(r.source, 0) + 1
    # smallest source keeps rate 1.0 -> all 25 rows survive
    assert by_src["small"] == 25
    # big source: rate sqrt(25/400) = 0.25 -> ~100 of 400 (hash noise)
    assert 60 <= by_src["big"] <= 140
    # deterministic: identical on re-run
    assert {(r.doc_id, r.source) for r in temperature_mixture(df).collect()} == {
        (r.doc_id, r.source) for r in kept
    }


def test_stable_dense_ids_dense_and_layout_independent(spark):
    from p6__mapreduce_spark.operators.pipeline import stable_dense_ids

    rows = [(i, f"text {i % 7}") for i in range(50)]  # duplicate texts: tie-break by id
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {(r.doc_id, r.stable_id) for r in stable_dense_ids(df).collect()}
    # dense permutation of 1..N
    assert {sid for _, sid in a} == set(range(1, 51))
    # identical under a different physical layout
    b = {(r.doc_id, r.stable_id) for r in stable_dense_ids(df.repartition(7)).collect()}
    assert a == b
    # duplicate-text group: ids ascend with doc_id (the tie-break)
    ids = sorted(sid for d, sid in a if d % 7 == 3)
    docs = sorted(d for d, _ in a if d % 7 == 3)
    got = {d: s for d, s in a if d % 7 == 3}
    assert [got[d] for d in docs] == ids


def test_leakage_safe_splits_keep_neardups_together(spark):
    from p6__mapreduce_spark.queries import QUERIES

    rows = QUERIES["leakage_safe_splits"](spark, "/root/testdata/sf0.001").collect()
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r.component, set()).add(r.split)
    # every near-dup component lives in exactly one split — no leakage
    assert all(len(s) == 1 for s in by_comp.values())
    # multi-member components exist (otherwise the test is vacuous)
    from collections import Counter

    sizes = Counter(r.component for r in rows)
    assert any(v >= 2 for v in sizes.values())
    # all three splits are populated
    assert {r.split for r in rows} == {"train", "val", "test"}


def test_weighted_sample_exact_k_and_weight_bias(spark):
    # exactly k rows out; a 100x-weight stratum must dominate the
    # sample (E-S inclusion probability scales with weight)
    rows = [(i, 10000 if i < 50 else 100) for i in range(1000)]
    docs = spark.createDataFrame(rows, "doc_id long, n_chars int")
    from p6__mapreduce_spark.operators.pipeline import weighted_sample

    out = weighted_sample(docs, k=50).collect()
    assert len(out) == 50
    heavy = sum(1 for r in out if r.doc_id < 50)
    # 50 heavy docs at 100x weight vs 950 light: the sample must be
    # mostly heavy (derandomized, so this is a fixed property of the
    # hash, not flaky)
    assert heavy >= 35
    # zero/negative weights never sampled
    docs2 = spark.createDataFrame([(1, 0), (2, 5)], "doc_id long, n_chars int")
    assert [r.doc_id for r in weighted_sample(docs2, k=10).collect()] == [2]


def test_weighted_sample_plan_take_ordered(spark):
    from p6__mapreduce_spark.operators.pipeline import weighted_sample
    from p6__mapreduce_spark.sources.readers import load_table
    from tests.test_plans import SF, plan_of

    plan = plan_of(weighted_sample(load_table(spark, SF, "documents")))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange" not in plan  # pure map-side + heap merge
