#!/usr/bin/env python3
"""Interleaved A/B for the r11 streaming state-partition rule.

Arm A = the retired shape (state-store partitions = the session's
core-count shuffle setting); arm B = the shipped volume-derived rule
(streaming/partitions.py). Alternated rep by rep in one session; each
runner's first A and B results are also row-compared.

Usage: python tools/ab_stream.py [sf_dir] [reps] [runner ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNNERS = [
    "events_window_streaming",
    "events_dedup_streaming",
    "clicks_to_purchases_streaming",
    "clicks_left_outer_streaming",
    "stateful_running_totals",
    "append_finalized_windows_streaming",
    "session_windows_streaming",
    "clicks_full_outer_streaming",
    "foreachbatch_idempotent_upsert",
]


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    reps = 3
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    if args and args[0].isdigit():
        reps, args = int(args[0]), args[1:]
    names = args or RUNNERS

    from p6__mapreduce_spark.queries import QUERIES
    from p6__mapreduce_spark.session import get_session
    from p6__mapreduce_spark.streaming import partitions as P

    spark = get_session("ab_stream")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    shipped = P.stream_shuffle_partitions

    def retired(spark_, *paths):  # the old shape: session core count
        return int(spark_.conf.get("spark.sql.shuffle.partitions"))

    def run(name: str, rule, timed: bool):
        P.stream_shuffle_partitions = rule
        try:
            t0 = time.time()
            df = QUERIES[name](spark, sf_dir)
            rows = (
                None
                if timed
                # NULLs-first sort key: full-outer rows carry Nones,
                # which plain tuple comparison cannot order
                else sorted(
                    map(tuple, df.collect()),
                    key=lambda t: tuple((v is not None, v) for v in t),
                )
            )
            if timed:
                df.count()
            dt = time.time() - t0
        finally:
            P.stream_shuffle_partitions = shipped
            spark.catalog.clearCache()
        return dt, rows

    for name in names:
        _, ra = run(name, retired, timed=False)
        _, rb = run(name, shipped, timed=False)
        a_times, b_times = [], []
        for _ in range(reps):
            a_times.append(round(run(name, retired, timed=True)[0], 3))
            b_times.append(round(run(name, shipped, timed=True)[0], 3))
        print(
            json.dumps(
                {
                    "runner": name,
                    "a_med": statistics.median(a_times),
                    "b_med": statistics.median(b_times),
                    "a": a_times,
                    "b": b_times,
                    "rows_equal": ra == rb,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
