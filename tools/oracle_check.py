#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry at a given sf dir, runs the matching
``oracle_sql()`` in DuckDB over the same parquet tables, and compares
row count, column names, and order-insensitive values (columns sorted by
name, rows sorted, exact equality; floats reported with max abs diff
when they mismatch).

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(rows: list[tuple], cols: list[str]) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    return [cols[i] for i in order], sorted(out, key=lambda r: tuple(str(x) for x in r))


def values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def compare(name: str, spark_df, con, sql: str | None) -> str:
    t0 = time.time()
    srows = [tuple(r) for r in spark_df.collect()]
    scols = spark_df.columns
    t_spark = time.time() - t0
    if sql is None:
        return f"{name}: rows-only, {len(srows)} rows ({t_spark:.1f}s)"
    ores = con.sql(sql)
    ocols = list(ores.columns)
    orows = [tuple(r) for r in ores.fetchall()]
    msgs = []
    if len(srows) != len(orows):
        msgs.append(f"ROWCOUNT spark={len(srows)} oracle={len(orows)}")
    sc, sr = canon(srows, scols)
    oc, orr = canon(orows, ocols)
    if sc != oc:
        msgs.append(f"COLS spark={sc} oracle={oc}")
    elif not msgs:
        bad = 0
        max_float_diff = 0.0
        example = None
        for r1, r2 in zip(sr, orr):
            for v1, v2 in zip(r1, r2):
                if not values_equal(v1, v2):
                    bad += 1
                    if isinstance(v1, float) and isinstance(v2, float):
                        max_float_diff = max(max_float_diff, abs(v1 - v2))
                    if example is None:
                        example = (v1, v2)
                    break
        if bad:
            msgs.append(f"VALUES {bad}/{len(sr)} rows differ, max_float_diff={max_float_diff:.3e}, e.g. {example}")
    status = "OK" if not msgs else "FAIL " + "; ".join(msgs)
    return f"{name}: {status} [{len(srows)} rows, {t_spark:.1f}s]"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from p6__mapreduce_spark.session import get_session

    spark = get_session("oracle_check")
    con = duck_con(sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            line = compare(name, fn(spark, sf_dir), con, oracles.get(name))
        except Exception as exc:  # noqa: BLE001
            line = f"{name}: ERROR {type(exc).__name__}: {exc}"
        if "OK" not in line and "rows-only" not in line:
            failed += 1
        print(line, flush=True)
    print(f"== {failed} failures ==")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
