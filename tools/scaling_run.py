#!/usr/bin/env python3
"""Diagnostic core-count scaling run (r10 verdict item 6).

The headline bench at sf0.1 cannot see parallelism: its inputs are
single-MB parquet files whose scans collapse to 1-3 tasks (the 4 MB
``openCostInBytes`` floor), so 8-core and 32-core totals match by
construction. This tool measures scaling where it is measurable: the
scale_gen sf1 dataset (many row groups) with
``SPARK_GRAFT_MAX_PARTITION_BYTES=1m`` so scans actually split.

For each query it spawns TWO fresh subprocesses (hi/lo core counts,
default 32 /8 — fresh JVM each so no codegen/cache bleed), times the
query cold+steady in each, and writes one JSON artifact with the
steady-state hi/lo ratio per query. Ratio ≈ lo/hi cores means the
query is compute-bound and parallel; ratio ≈ 1 means a serial stage
bounds it (named in the artifact notes where known).

Usage: python tools/scaling_run.py [sf_dir] [out.json] [query ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    # embarrassingly-parallel map+aggregate shapes
    "word_freq",
    "char_bigram_entropy",
    "nbayes_source_confusion",
    "dsir_weights",
    "gopher_top_ngram_frac",
    "tpch_q1_pricing",
    "apriori_triples",
    "basket_part_pairs",
    "link_prediction_scores",
    "tfidf_doc_terms",
]

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {root!r})
from p6__mapreduce_spark.queries import QUERIES
from p6__mapreduce_spark.session import get_session
spark = get_session("scaling_child")
spark.range(1_000_000).selectExpr("sum(id)").collect()
spark.read.parquet(os.path.join({sf_dir!r}, "region.parquet")).count()
out = {{}}
for name in {names!r}:
    runs = []
    for _ in range(3):
        t0 = time.time()
        QUERIES[name](spark, {sf_dir!r}).count()
        runs.append(round(time.time() - t0, 3))
        spark.catalog.clearCache()
    out[name] = {{"cold": runs[0], "steady": sorted(runs)[1], "runs": runs}}
print("SCALING_JSON:" + json.dumps(out))
"""


def run_arm(cpus: int, sf_dir: str, names: list[str]) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", str(1 << 20))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = _CHILD.format(root=root, sf_dir=sf_dir, names=names)
    res = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=3600,
    )
    for line in res.stdout.splitlines():
        if line.startswith("SCALING_JSON:"):
            return json.loads(line[len("SCALING_JSON:"):])
    raise RuntimeError(f"no payload (rc={res.returncode}): {res.stderr[-500:]}")


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/tmp/sf1"
    out_path = "SCALING_r11.json"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    if args and args[0].endswith(".json"):
        out_path, args = args[0], args[1:]
    names = args or DEFAULT_QUERIES
    hi, lo = 32, 8
    hi_res = run_arm(hi, sf_dir, names)
    lo_res = run_arm(lo, sf_dir, names)
    per_query = {
        n: {
            "hi_cpus_steady": hi_res[n]["steady"],
            "lo_cpus_steady": lo_res[n]["steady"],
            "ratio_lo_over_hi": round(lo_res[n]["steady"] / hi_res[n]["steady"], 2),
            "hi_runs": hi_res[n]["runs"],
            "lo_runs": lo_res[n]["runs"],
        }
        for n in names
    }
    out = {
        "sf_dir": sf_dir,
        "cpus_hi": hi,
        "cpus_lo": lo,
        "max_partition_bytes": os.environ.get(
            "SPARK_GRAFT_MAX_PARTITION_BYTES", str(1 << 20)
        ),
        "per_query": per_query,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out["per_query"], indent=1))


if __name__ == "__main__":
    main()
