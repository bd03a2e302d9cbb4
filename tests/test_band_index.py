"""Persisted MinHash band index (dedup/band_index.py — r9 verdict #8).

The cross-run dedup shape: corpus banded+persisted once, later
sessions probe a new batch against the parquet index without touching
historical text. Pinned here:

1. probe == the portable slice-equality model (estimate filter, band
   collision semantics) on a corpus with known near-dups;
2. persistence roundtrip: the probe runs from a FRESH parquet read —
   no lineage back to the corpus DataFrame — and finds the same pairs;
3. partition pruning is real: the probe's index scan opens only the
   batch's band buckets (inputFiles strictly fewer than the index's);
4. append mode: a second day's ingest lands as new bucket files and
   probes see the union.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from p6__mapreduce_spark.dedup.band_index import (
    INDEX_BUCKETS,
    probe_band_index,
    probe_model_pairs,
    write_band_index,
)


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def corpus_batch(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    corpus = _mk_docs(
        spark,
        [(i, f"{base} corpus doc {i} extra tokens {i * 7} {i * 13}") for i in range(40)],
    )
    batch = _mk_docs(
        spark,
        # 3 near-dups of corpus docs (same text, one token changed) +
        # 3 novel docs
        [
            (1000, f"{base} corpus doc 5 extra tokens 35 65"),
            (1001, f"{base} corpus doc 17 extra tokens 119 221"),
            (1002, f"{base} corpus doc 30 extra tokens 210 390 changed"),
            (1003, "completely different text about spark shuffles and parquet row groups"),
            (1004, "another unrelated document mentioning watermarks and state stores"),
            (1005, "tokenizer vocabularies and byte pair encodings have nothing in common here"),
        ],
    )
    return corpus, batch


def test_probe_matches_slice_equality_model(spark, corpus_batch, tmp_path):
    corpus, batch = corpus_batch
    path = str(tmp_path / "band_index")
    write_band_index(corpus, path)
    got = [
        (r.id1, r.id2, round(r.minhash_est, 9))
        for r in probe_band_index(spark, path, batch, threshold=0.5).collect()
    ]
    want = [
        (r.id1, r.id2, round(r.minhash_est, 9))
        for r in probe_model_pairs(corpus, batch, threshold=0.5).collect()
    ]
    assert got == want
    # the known near-dups are found, novel docs match nothing
    assert {id2 for _, id2, _ in got} >= {1000, 1001}
    assert all(id2 not in (1003, 1004, 1005) for _, id2, _ in got)


def test_probe_runs_from_fresh_read_and_prunes_partitions(spark, corpus_batch, tmp_path):
    corpus, batch = corpus_batch
    path = str(tmp_path / "band_index")
    write_band_index(corpus, path)

    all_files = set(spark.read.parquet(path).inputFiles())
    # one tiny batch: its band buckets cover a strict subset of the
    # corpus's populated buckets, so the pruned scan READS fewer files.
    # (inputFiles() reports the relation's full file index regardless
    # of pushed filters, so measure the files the executed scan
    # actually touches via input_file_name().)
    one = batch.filter(F.col("doc_id") == 1003)
    from p6__mapreduce_spark.dedup.band_index import _banded_sigs

    ps = sorted(r.p for r in _banded_sigs(one, 3, 32, 16).select("p").distinct().collect())
    read = {
        r[0]
        for r in spark.read.parquet(path)
        .filter(F.col("p").isin(ps))
        .select(F.input_file_name())
        .distinct()
        .collect()
    }
    assert len(read) < len(all_files), (len(read), len(all_files))
    assert len(ps) <= 16 <= INDEX_BUCKETS
    assert len(read) <= len(ps)  # at most one file per probed bucket here

    # and the probe itself works against the persisted files alone
    # (fresh session-level read; corpus DataFrame not involved)
    got = probe_band_index(spark, path, batch, threshold=0.5)
    assert got.columns == ["id1", "id2", "minhash_est"]
    assert got.count() >= 2


def test_append_mode_daily_ingest(spark, corpus_batch, tmp_path):
    corpus, batch = corpus_batch
    path = str(tmp_path / "band_index")
    day1 = corpus.filter(F.col("doc_id") < 20)
    day2 = corpus.filter(F.col("doc_id") >= 20)
    write_band_index(day1, path)
    n1 = probe_band_index(spark, path, batch, threshold=0.5).count()
    write_band_index(day2, path, mode="append")
    got = [
        (r.id1, r.id2, round(r.minhash_est, 9))
        for r in probe_band_index(spark, path, batch, threshold=0.5).collect()
    ]
    want = [
        (r.id1, r.id2, round(r.minhash_est, 9))
        for r in probe_model_pairs(corpus, batch, threshold=0.5).collect()
    ]
    assert got == want  # union of both days == whole-corpus model
    assert len(got) >= n1


def test_probe_plan_never_scans_document_text(spark, corpus_batch, tmp_path):
    """The probe's physical plan reads the index parquet and the batch
    only — no shingle explode over historical text (the whole point:
    historical corpus cost is paid once at write time)."""
    corpus, batch = corpus_batch
    path = str(tmp_path / "band_index")
    write_band_index(corpus, path)
    plan = (
        probe_band_index(spark, path, batch, threshold=0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # exactly one parquet scan (the index); the only other leaves are
    # the batch's in-memory scans (the plan string truncates long
    # paths, so count scan nodes rather than matching the path)
    assert plan.count("Scan parquet") == 1
    assert "Scan ExistingRDD" in plan
