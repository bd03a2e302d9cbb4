#!/usr/bin/env python3
"""Root-cause probe for the r4 similarity-family bench drift.

The r4 verdict found the similarity/dedup family consistently +17-69%
slower at sf0.1 vs round 3 (`knn_ivf` 2.74->3.87s, `ann_recall_audit`
1.95->3.29s, ...) with UNCHANGED files and pinned plans, and suspected
"session pressure from ~70 added bench queries" — the same unproven
story twice. This script turns the story into a measurement:

  A. fresh-session: warmup, then time the drifted family cold —
     the no-pressure baseline.
  B. pressured: same session, run `--pressure N` other headline
     queries first (untimed), then time the family again — the
     in-bench condition.
  C. mitigated: force JVM GC + clearCache, re-time — if C recovers
     to ~A, the pressure is reclaimable heap/code-cache garbage and
     bench.py can afford a periodic GC.

Prints one JSON line {query: {fresh, pressured, mitigated}} plus the
family ratios. Run on an otherwise idle machine: the probe measures
session state, not CPU contention.

Usage: python tools/drift_probe.py [sf_dir] [--pressure N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAMILY = [
    "knn_lsh",
    "knn_ivf",
    "ann_recall_audit",
    "embedding_neardup",
    "semantic_dedup",
    "dedup_simhash",
    "minhash_estimate_error",
    "dedup_minhash_lsh",
]


def time_family(QUERIES, spark, sf_dir: str) -> dict[str, float]:
    out = {}
    for name in FAMILY:
        t0 = time.time()
        QUERIES[name](spark, sf_dir).count()
        out[name] = round(time.time() - t0, 3)
        spark.catalog.clearCache()
    return out


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    pressure = 60
    for i, a in enumerate(sys.argv):
        if a == "--pressure":
            pressure = int(sys.argv[i + 1])

    from bench import HEADLINE

    from p6__mapreduce_spark.queries import QUERIES
    from p6__mapreduce_spark.session import get_session

    spark = get_session("drift-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    fresh = time_family(QUERIES, spark, sf_dir)

    if "--iterative" in sys.argv:
        # pressure = ONLY the localCheckpoint-heavy iterative trainers,
        # repeated — isolates the storage-block-accumulation hypothesis
        # (clearCache() drops cached relations but NOT checkpoint RDD
        # blocks; they linger until the py4j reference is collected AND
        # the JVM runs a GC)
        heavy = [
            "kmeans_lloyd",
            "pq_codes",
            "knn_pq",
            "cluster_medoids",
            "textrank_keywords",
        ]
        others = (heavy * 3)[: pressure or len(heavy) * 3]
    else:
        others = [n for n in HEADLINE if n not in FAMILY][:pressure]
    t0 = time.time()
    for name in others:
        QUERIES[name](spark, sf_dir).count()
        spark.catalog.clearCache()
    pressure_wall = round(time.time() - t0, 3)

    pressured = time_family(QUERIES, spark, sf_dir)

    # mitigation: drop what a long session can reclaim — cached
    # relations are already cleared per query, so what's left is JVM
    # garbage (broadcast blocks, codegen classes, listener events)
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    time.sleep(2)
    mitigated = time_family(QUERIES, spark, sf_dir)

    def total(d: dict[str, float]) -> float:
        return round(sum(d.values()), 3)

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "pressure_queries": len(others),
                "pressure_wall": pressure_wall,
                "fresh": fresh,
                "pressured": pressured,
                "mitigated": mitigated,
                "totals": {
                    "fresh": total(fresh),
                    "pressured": total(pressured),
                    "mitigated": total(mitigated),
                    "pressured_over_fresh": round(total(pressured) / total(fresh), 3),
                    "mitigated_over_fresh": round(total(mitigated) / total(fresh), 3),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
