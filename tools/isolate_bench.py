#!/usr/bin/env python3
"""Isolated steady-state timing for a set of registered queries.

BENCH_LOCAL_r5's regressions block left ~17 queries marked
"investigate": their in-bench steady recheck stayed above the r4
number. But that recheck ran at the END of a ~400s 187-query bench
session — exactly the condition BENCH_NOTES_r5 showed carries ±50%
variance. This tool gives each query a clean courtroom: ONE fresh
session, a warmup query, then N timed runs per query with the median
reported, so the number is a property of the plan rather than of the
session history.

Usage: python tools/isolate_bench.py [sf_dir] [runs] [query ...]
       (no queries -> the BENCH_LOCAL_r5 "investigate" set)

Prints one JSON line {query: {cold, steady, runs: [...]}}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INVESTIGATE = [
    "bigram_entropy",
    "bigram_lm",
    "bm25_scores",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_prefix_filter",
    "dedup_simhash",
    "dedup_simhash64",
    "doc_fingerprints",
    "dup_ngram_coverage",
    "minhash_estimate_error",
    "minhash_geometry_probe",
    "multimodal_video_decode",
    "passage_dedup_rewrite",
    "pii_redact",
    "unigram_surprise",
    "vocab_coverage",
]


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(args[1]) if len(args) > 1 else 3
    names = args[2:] or INVESTIGATE

    from p6__mapreduce_spark.queries import QUERIES
    from p6__mapreduce_spark.session import get_session

    spark = get_session("isolate-bench")
    # warmup: JVM + parquet footers, not any of the timed plans
    QUERIES["distinct_sorted"](spark, sf_dir).count()

    out = {}
    for name in names:
        fn = QUERIES[name]
        times = []
        for _ in range(runs):
            t0 = time.time()
            fn(spark, sf_dir).count()
            times.append(round(time.time() - t0, 3))
        out[name] = {
            "cold": times[0],
            "steady": round(statistics.median(times[1:] or times), 3),
            "runs": times,
        }
        print(f"{name}: cold {times[0]}s steady {out[name]['steady']}s", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "runs": runs, "queries": out}))


if __name__ == "__main__":
    main()
