"""Shared pytest fixtures: one local SparkSession per test session and
the FIXTURES.md synthetic line corpora (deterministic, seed=42)."""

from __future__ import annotations

import random

import pytest

from p6__mapreduce_spark.session import get_session


@pytest.fixture(scope="session")
def spark():
    return get_session("p6-tests", shuffle_partitions=8)


def lines_df(spark, lines: list[str]):
    return spark.createDataFrame([(l,) for l in lines], "value string")


# --- FIXTURES.md F1: numeric-string lines ---------------------------------

def f1_tiny() -> list[str]:
    # includes a value > 2^31 to exercise uint32 wrap (tests/3.txt analog)
    return ["7", "3333333333", "42", "1000000000"]


def f1_sorted() -> list[str]:
    return [str(v) for v in range(0, 10000, 10)]


def f1_reverse() -> list[str]:
    return [str(v) for v in range(9999, -1, -10)]


def f1_medium() -> list[str]:
    rng = random.Random(42)
    return [str(rng.randint(0, 9999)) for _ in range(9999)]


def f1_large() -> list[str]:
    rng = random.Random(42)
    return [str(rng.randint(0, 99999)) for _ in range(100000)]


# --- FIXTURES.md F2: ASCII word lines --------------------------------------

WORDS = [
    "gun", "twist", "parachute", "Venus", "abuse", "zebra", "apple",
    "Mars", "quirk", "lattice", "drum", "echo", "fjord", "glyph",
]


def f2_words() -> list[str]:
    rng = random.Random(42)
    return [rng.choice(WORDS) for _ in range(100)]
