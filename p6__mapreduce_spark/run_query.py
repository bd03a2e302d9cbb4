"""Registry-query and ad-hoc-SQL command line runner.

The user-facing completeness piece: every operator the engine
implements is runnable from a shell, the way the reference's binaries
were. Three modes:

    python -m p6__mapreduce_spark.run_query --list
    python -m p6__mapreduce_spark.run_query NAME [--sf-dir DIR] [--limit N]
    python -m p6__mapreduce_spark.run_query --sql "SELECT ..." [--sf-dir DIR]

``--explain`` prints the formatted physical plan instead of rows (both
modes) — the from-a-shell way to check pushdown/broadcast/shuffle shape.

``NAME`` is any registry entry (``p6__mapreduce_spark.queries``);
``--sql`` registers the star-schema tables as views first, so ad-hoc
ANSI SQL runs against the same data through the same Catalyst planner.
Output is TSV on stdout (header first), exit code 0 on success.
"""

from __future__ import annotations

import argparse
import sys

DEFAULT_SF_DIR = "/root/testdata/sf0.01"


def _emit(df, limit: int | None, explain: bool = False) -> None:
    if explain:
        # public API (prints to stdout) — survives Spark Connect and
        # PySpark upgrades, unlike the JVM-private explainString call
        df.explain(mode="formatted")
        return
    if limit is not None:
        df = df.limit(limit)
    cols = df.columns
    print("\t".join(cols))
    for row in df.collect():
        print("\t".join("" if row[c] is None else str(row[c]) for c in cols))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="run_query", description=__doc__)
    ap.add_argument("name", nargs="?", help="registry query name")
    ap.add_argument("--list", action="store_true", help="list registry queries")
    ap.add_argument("--sql", metavar="QUERY", help="run ad-hoc SQL over the star schema")
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ap.add_argument("--limit", type=int, default=None, help="cap printed rows")
    ap.add_argument(
        "--explain", action="store_true", help="print the physical plan instead of rows"
    )
    args = ap.parse_args(argv)

    from p6__mapreduce_spark.queries import QUERIES

    if args.list:
        for name in QUERIES:
            print(name)
        return 0

    from p6__mapreduce_spark.session import get_session

    if args.sql:
        from p6__mapreduce_spark.sql import register_tables, sql

        spark = get_session("run-query-sql")
        register_tables(spark, args.sf_dir)
        _emit(sql(spark, args.sql), args.limit, args.explain)
        return 0

    if not args.name:
        ap.print_usage(sys.stderr)
        return 2
    if args.name not in QUERIES:
        print(f"unknown query: {args.name} (try --list)", file=sys.stderr)
        return 2
    spark = get_session(f"run-query-{args.name}")
    _emit(QUERIES[args.name](spark, args.sf_dir), args.limit, args.explain)
    return 0


if __name__ == "__main__":  # pragma: no cover - exercised via subprocess test
    raise SystemExit(main())
