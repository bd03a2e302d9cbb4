#!/usr/bin/env python3
"""Build the hot-key (Zipfian) audit dataset: /tmp/sf_skew.

The r9 degenerate-input trilogy covered empty / one-row / all-ties but
kept key distributions uniform; a 100 TB corpus is Zipfian — one user,
one part, one customer can carry a double-digit share of a partition's
rows, which is exactly what breaks naive per-key windows and
shuffle-hash joins. This generator derives a skewed twin of a testdata
sf dir with DETERMINISTIC rules (no RNG — the same twin reproduces
bit-for-bit, so oracle hashes are stable):

- events:   50% of rows (event_id % 2 = 0) reassigned to the MIN
            user_id — one hot user holds half the event stream.
- lineitem: 50% of rows ((l_orderkey + l_linenumber) % 2 = 0)
            reassigned to the MIN l_partkey — one hot part in half
            the order lines (stresses the part-side joins of
            q17/q18/basket_part_pairs).
- orders:   50% of rows (o_orderkey % 2 = 0) reassigned to the MIN
            o_custkey — one hot customer (stresses custkey joins /
            groupBys: q13, customer_order_stats, top_orders...).
- every other table copied unchanged (FK targets keep existing: the
  hot keys are existing MIN keys, so fk_integrity-style queries stay
  consistent).

Row counts, schemas, and every non-key column are untouched, so plan
shapes are comparable with the uniform run and only the key
distribution changes. DuckDB does the rewrite (no Spark needed).

Usage: python tools/skew_gen.py [src_sf_dir] [dst_dir]
       (defaults /root/testdata/sf0.1 -> /tmp/sf_skew)
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def build(src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    rewrites = {
        "events": """
            SELECT event_id, ts,
                   CASE WHEN event_id % 2 = 0
                        THEN (SELECT MIN(user_id) FROM t) ELSE user_id
                   END AS user_id,
                   event_type, value, props
            FROM t
        """,
        "lineitem": """
            SELECT * REPLACE (
              CASE WHEN (l_orderkey + l_linenumber) % 2 = 0
                   THEN (SELECT MIN(l_partkey) FROM t) ELSE l_partkey
              END AS l_partkey)
            FROM t
        """,
        "orders": """
            SELECT * REPLACE (
              CASE WHEN o_orderkey % 2 = 0
                   THEN (SELECT MIN(o_custkey) FROM t) ELSE o_custkey
              END AS o_custkey)
            FROM t
        """,
    }
    for name in TABLES:
        s, d = os.path.join(src, f"{name}.parquet"), os.path.join(dst, f"{name}.parquet")
        if name not in rewrites:
            shutil.copyfile(s, d)
            continue
        con.execute(f"CREATE OR REPLACE VIEW t AS SELECT * FROM '{s}'")
        con.execute(
            f"COPY ({rewrites[name]}) TO '{d}' (FORMAT PARQUET, COMPRESSION SNAPPY)"
        )
    # sanity: report the realized hot-key shares
    for tbl, key in (("events", "user_id"), ("lineitem", "l_partkey"), ("orders", "o_custkey")):
        p = os.path.join(dst, f"{tbl}.parquet")
        top, n, total = con.sql(
            f"SELECT {key}, COUNT(*) AS c, (SELECT COUNT(*) FROM '{p}') FROM '{p}' "
            f"GROUP BY 1 ORDER BY c DESC LIMIT 1"
        ).fetchone()
        print(f"{tbl}: hot {key}={top} holds {n}/{total} rows ({100.0 * n / total:.1f}%)")


if __name__ == "__main__":
    argv = sys.argv[1:]
    src = argv[0] if argv else "/root/testdata/sf0.1"
    dst = argv[1] if len(argv) > 1 else "/tmp/sf_skew"
    build(src, dst)
    print(f"wrote {dst}")
