#!/usr/bin/env python3
"""Probe-cost growth check for the persisted band index (r9 verdict
#8's scale claim): with a FIXED daily batch, growing the historical
corpus K x must grow probe latency far sublinearly — the probe's work
is the pruned band-bucket scan plus the colliding-key join, not the
corpus.

Method: build the index from sf0.1 documents at 1x and at Kx
(suffixed-token copies — disjoint vocabulary per copy, same shape as
tools/scale_probe.py's inflate_documents), probe the SAME 50-doc batch
(near-dups of base docs) against both, report {probe_1x, probe_kx,
ratio, pairs found}. Build times are reported too (those SHOULD grow
~K x — the corpus is scanned once at write time by design).

Usage: python tools/band_index_probe.py [K] [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from p6__mapreduce_spark.dedup.band_index import probe_band_index, write_band_index
    from p6__mapreduce_spark.session import get_session
    from p6__mapreduce_spark.sources.readers import load_table

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scale_probe import inflate_documents

    def inflate_keep_copy0(d, kk):
        # copy 0 keeps the ORIGINAL text (so the fixed batch's
        # near-dups exist in every corpus size); copies 1..k-1 get the
        # disjoint suffixed vocabulary of scale_probe.inflate_documents
        rest = inflate_documents(d, kk).filter(F.col("doc_id") >= 10_000_000)
        return d.unionAll(rest)

    spark = get_session("band-index-probe")
    # warm the session (JVM + codegen) so the 1x build doesn't absorb
    # first-job startup and understate the build ratio
    spark.range(1_000_000).select(F.sum("id")).collect()
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.count()

    # fixed batch: 50 docs derived from the base corpus (one token
    # appended -> high-jaccard near-dups that MUST hit the index)
    batch = (
        docs.filter(F.col("doc_id") % 100 == 0)
        .limit(50)
        .select(
            (F.col("doc_id") + 90_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" probe")).alias("text"),
        )
        .localCheckpoint(eager=True)
    )

    root = tempfile.mkdtemp(prefix="band_index_probe_")
    out: dict = {"k": k, "batch_docs": 50}
    try:
        for label, corpus in (("1x", docs), (f"{k}x", inflate_keep_copy0(docs, k))):
            path = os.path.join(root, f"idx_{label}")
            t0 = time.time()
            write_band_index(corpus, path)
            build = round(time.time() - t0, 3)
            t0 = time.time()
            n_pairs = probe_band_index(spark, path, batch, threshold=0.5).count()
            probe = round(time.time() - t0, 3)
            # second probe: steady (JVM/codegen warm) — the number a
            # long-lived ingest daemon actually sees
            t0 = time.time()
            probe_band_index(spark, path, batch, threshold=0.5).count()
            steady = round(time.time() - t0, 3)
            out[label] = {"build_s": build, "probe_s": probe, "probe_steady_s": steady, "pairs": n_pairs}
            print(f"{label}: build {build}s probe {probe}s steady {steady}s pairs {n_pairs}", flush=True)
        out["probe_ratio"] = round(out[f"{k}x"]["probe_s"] / max(out["1x"]["probe_s"], 1e-9), 2)
        out["probe_steady_ratio"] = round(
            out[f"{k}x"]["probe_steady_s"] / max(out["1x"]["probe_steady_s"], 1e-9), 2
        )
        out["build_ratio"] = round(out[f"{k}x"]["build_s"] / max(out["1x"]["build_s"], 1e-9), 2)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
