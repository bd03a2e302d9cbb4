#!/usr/bin/env python3
"""End-to-end training-data pipeline: one command from raw documents to
packed, deduplicated, atomically-published training chunks.

Stages (each a registered operator; see COVERAGE.md):
  1. profile     — column data-quality audit of the input (printed)
  2. quality     — Gopher-style gate: keep docs scoring >= 2 of 3
  3. surprisal   — perplexity-proxy gate: drop docs whose mean token
                   surprisal under the corpus unigram LM exceeds
                   1.25x the corpus mean (gibberish filter)
  4. dedup       — MinHash-LSH pairs -> connected components -> keep
                   the best-quality doc per near-dup cluster
  5. mixture     — temperature (n^0.5) source rebalancing
  6. split       — leakage-safe train/val/test labels keyed by the
                   near-dup component (reuses the dedup stage's map)
  7. chunk       — 64-token context windows, 16-token overlap
  8. pack        — fixed-budget sequence ids per shard
  9. publish     — atomic parquet publish partitioned by split
                   (readers never see a half-written dataset; training
                   jobs read their split via partition pruning)

Everything is one lazily-composed set of Catalyst plans; nothing is
collected to the driver. Deterministic end to end: re-running on
different partitioning/cluster produces byte-identical output.

Usage: python tools/run_pipeline.py OUT_DIR [SF_DIR]
Prints one JSON line with per-stage row counts.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__, file=sys.stderr)
        return 2
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

    from p6__mapreduce_spark.dedup.components import dedup_components
    from p6__mapreduce_spark.dedup.minhash import minhash_lsh_pairs
    from p6__mapreduce_spark.operators.analytics import profile_columns
    from p6__mapreduce_spark.operators.pipeline import doc_chunks, sequence_packing
    from p6__mapreduce_spark.operators.text_analysis import quality_score
    from p6__mapreduce_spark.session import get_session
    from p6__mapreduce_spark.sources.readers import load_table
    from p6__mapreduce_spark.sources.sinks import publish_parquet_atomic

    spark = get_session("pipeline")
    docs = load_table(spark, sf_dir, "documents")
    counts: dict[str, int] = {"input": docs.count()}

    # 1. profile (audit only — printed, not a filter)
    for r in profile_columns(docs, ["doc_id", "lang", "source"]).collect():
        print(f"# profile {r.col_name}: nulls={r.n_rows - r.n_nonnull} distinct={r.n_distinct}")

    # 2. quality gate
    q = quality_score(docs).filter(F.col("quality") >= 2.0 / 3.0).select("doc_id")
    kept_q = docs.join(q, "doc_id")
    counts["after_quality"] = kept_q.count()

    # 2b. surprisal gate: mean token surprisal <= 1.25x the corpus mean
    # (1.25 is exact in binary, and both sides are correctly-rounded
    # divisions of exact integers — deterministic at any partitioning)
    from p6__mapreduce_spark.operators.ranking import unigram_surprise

    sup = unigram_surprise(kept_q)
    tot = sup.agg(F.sum("surprise_q6").alias("s_all"), F.sum("n_tokens").alias("t_all"))
    calm = (
        sup.crossJoin(F.broadcast(tot))
        .filter(
            F.col("surprise_q6") / F.col("n_tokens")
            <= F.lit(1.25) * (F.col("s_all") / F.col("t_all"))
        )
        .select("doc_id")
    )
    kept_q = kept_q.join(calm, "doc_id")
    counts["after_surprisal"] = kept_q.count()

    # 3. near-dup removal, keep the best-quality member per cluster
    comp = dedup_components(kept_q, minhash_lsh_pairs(kept_q, threshold=0.8))
    q3 = quality_score(kept_q).select(
        "doc_id",
        (
            F.col("len_ok")
            + F.col("tok_len_ok")
            + F.when(F.col("diversity") >= 0.3, 1).otherwise(0)
        ).alias("q3"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("component").orderBy(F.desc("q3"), "doc_id")
    keepers = (
        comp.join(q3, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id")
    )
    deduped = kept_q.join(keepers, "doc_id")
    counts["after_dedup"] = deduped.count()

    # 3b. temperature rebalancing: flatten hot sources toward n^0.5
    from p6__mapreduce_spark.operators.pipeline import temperature_mixture

    mix = temperature_mixture(deduped).select("doc_id")
    deduped = deduped.join(mix, "doc_id")
    counts["after_mixture"] = deduped.count()

    # 3b'. DSIR tilt: keep docs whose hashed-n-gram importance weight
    # (target = 'en') is non-negative — the published
    # importance-resampling gate, here as a cheap threshold filter on
    # the survivors (full Gumbel-top-k resampling is the
    # dsir_resample_topk query)
    from p6__mapreduce_spark.operators.dsir import dsir_weights

    tilt = dsir_weights(deduped).filter(F.col("logweight_q6") >= 0).select("doc_id")
    deduped = deduped.join(tilt, "doc_id")
    counts["after_dsir"] = deduped.count()

    # 3c. leakage-safe split labels from the SAME component map the
    # dedup stage already computed: near-dup survivors of one cluster
    # can only ever land in one split
    from p6__mapreduce_spark.operators.pipeline import _key_hash_bucket

    cbucket = _key_hash_bucket(F.col("component"), 100)
    split_of = comp.select(
        "doc_id",
        F.when(cbucket < 80, F.lit("train"))
        .when(cbucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )

    # 4+5. chunk, then pack the chunks as pseudo-docs
    chunks = doc_chunks(deduped, chunk_size=64, overlap=16)
    packed = sequence_packing(
        chunks.select(
            (F.col("doc_id") * 10_000 + F.col("chunk_idx")).alias("doc_id"),
            F.col("chunk_text").alias("text"),
        ),
        seq_len=256,
        n_shards=8,
    )
    final = packed.join(
        chunks.select(
            (F.col("doc_id") * 10_000 + F.col("chunk_idx")).alias("doc_id"), "chunk_text"
        ),
        "doc_id",
    ).withColumn("orig_doc_id", F.expr("doc_id div 10000"))
    final = final.join(
        split_of.withColumnRenamed("doc_id", "orig_doc_id"), "orig_doc_id"
    ).drop("orig_doc_id")
    counts["chunks"] = final.count()

    # 6. atomic publish, physically partitioned by split so a training
    # job reads its split via partition pruning alone
    publish_parquet_atomic(
        final, os.path.join(out_dir, "training_chunks"), partition_by=["split"]
    )
    counts["published"] = spark.read.parquet(os.path.join(out_dir, "training_chunks")).count()

    print(json.dumps({"sf_dir": sf_dir, "out": out_dir, "counts": counts}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
