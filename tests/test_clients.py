"""Reference client-program parity: wordcount / sort over real text
files, checked against the golden-rule models (`LC_ALL=C sort -u`,
Counter), plus the MR_Run signature wrapper."""

from __future__ import annotations

from collections import Counter

from p6__mapreduce_spark.clients import sort_unique, wordcount
from p6__mapreduce_spark.operators.mapreduce import MR_Run
from tests import conftest as fx


def write_files(tmp_path, datasets: list[list[str]]) -> list[str]:
    paths = []
    for i, lines in enumerate(datasets):
        p = tmp_path / f"in{i}.txt"
        p.write_text("\n".join(lines) + "\n")
        paths.append(str(p))
    return paths


def test_wordcount_client_multi_file(spark, tmp_path):
    d1, d2 = fx.f2_words(), fx.f1_medium()[:500]
    paths = write_files(tmp_path, [d1, d2])
    got = [(r.key, r.cnt) for r in wordcount(spark, paths).collect()]
    assert got == sorted(Counter(d1 + d2).items())


def test_sort_client_p1_matches_c_sort_u(spark, tmp_path):
    lines = fx.f1_medium()
    paths = write_files(tmp_path, [lines])
    got = [r.key for r in sort_unique(spark, paths, num_partitions=1).collect()]
    assert got == sorted(set(lines))  # LC_ALL=C sort -u


def test_sort_client_p8_bucket_order(spark, tmp_path):
    lines = fx.f1_tiny()
    paths = write_files(tmp_path, [lines])
    got = [r.key for r in sort_unique(spark, paths, num_partitions=8).collect()]
    # top-3-bit buckets (shift 29): 42,7 -> 0; 1000000000 -> 1;
    # 3333333333 (uint32 wrap) -> 6; byte-wise within bucket ('42' < '7')
    assert got == ["42", "7", "1000000000", "3333333333"]


def test_mr_run_signature_wrapper(spark, tmp_path):
    lines = ["b", "a", "b", "c", "a", "b"]
    paths = write_files(tmp_path, [lines])

    def mapper(line):
        yield (line, "1")

    def reducer(key, values):
        yield str(sum(int(v) for v in values))

    # M=9, R=8 accepted-and-ignored like the reference CLI's thread args
    out = MR_Run(spark, paths, mapper, 9, reducer, 8, "hash", 4)
    assert {(r.key, r.out) for r in out.collect()} == {("a", "2"), ("b", "3"), ("c", "1")}


def test_run_query_cli_list_and_run(spark, capsys):
    from p6__mapreduce_spark.run_query import main

    assert main(["--list"]) == 0
    names = capsys.readouterr().out.split()
    assert "tpch_q1_pricing" in names and len(names) >= 75

    assert main(["word_freq", "--sf-dir", "/root/testdata/sf0.001", "--limit", "3"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].split("\t")[0] == "token" and len(out) == 4

    assert main(["--sql", "SELECT COUNT(*) AS n FROM region", "--sf-dir", "/root/testdata/sf0.001"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out == ["n", "5"]

    assert main(["no_such_query"]) == 2


def test_run_query_cli_explain(spark, capsys):
    from p6__mapreduce_spark.run_query import main

    assert main(["tpch_q6_forecast_revenue", "--sf-dir", "/root/testdata/sf0.001", "--explain"]) == 0
    out = capsys.readouterr().out
    assert "== Physical Plan ==" in out and "Scan parquet" in out
    assert "PushedFilters" in out  # the plan detail a user runs --explain FOR
