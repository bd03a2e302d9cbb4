"""Round-10 optimization guard: the lm_greedy_generation succ-table
driver walk.

r10 replaced the fully-relational decode chain (each step = join +
TakeOrdered against the pinned bigram relation, all steps UNIONed —
an O(steps²) lazy plan: 5033 formatted-plan lines, 136 embedded RDD
scans at steps=15) with ONE window pass that precomputes the argmax
successor per context and a driver-side walk over 1-row lookups.
These tests pin the equivalence claims the rewrite rests on:

1. the walk emits the exact rollout the retired chain emitted —
   including (count DESC, token ASC) tie-breaks and greedy cycles —
   verified against an independent pure-Python replica of the chain
   semantics on tie-heavy fixtures;
2. a dead-end context (token with no successor) ends the rollout
   early, exactly like the retired empty-join chain;
3. empty corpus -> empty result with the contract schema.
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import types as T

from p6__mapreduce_spark.operators.lm import lm_greedy_generation

_DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


def _docs(spark, texts):
    rows = [(i, t, "en", "s") for i, t in enumerate(texts)]
    return spark.createDataFrame(rows, _DOC_SCHEMA)


def _py_walk(texts, steps):
    """Independent replica of the retired relational chain: bigram
    counts from the same [^a-z0-9]+ tokenization, seed = max unigram
    context by (count DESC, token ASC), each step = max successor by
    (count DESC, token ASC)."""
    pairs: Counter = Counter()
    for t in texts:
        toks = [w for w in re.split(r"[^a-z0-9]+", t.lower().strip()) if w]
        for a, b in zip(toks, toks[1:]):
            pairs[(a, b)] += 1
    if not pairs:
        return []
    uni: Counter = Counter()
    for (a, _b), c in pairs.items():
        uni[a] += c
    token = min(uni, key=lambda w: (-uni[w], w))
    out = [(0, token, uni[token])]
    for k in range(1, steps + 1):
        succ = [(w2, c) for (w1, w2), c in pairs.items() if w1 == token]
        if not succ:
            break
        w2, c = min(succ, key=lambda x: (-x[1], x[0]))
        out.append((k, w2, c))
        token = w2
    return out


def _check(spark, texts, steps):
    got = [
        (r["step"], r["token"], r["in_count"])
        for r in lm_greedy_generation(_docs(spark, texts), steps=steps).collect()
    ]
    assert got == _py_walk(texts, steps)


def test_walk_matches_chain_replica_with_ties(spark):
    # "b b" and "b c" tie on count=2 -> token ASC picks "b"; greedy
    # cycle b->b afterwards (the documented honest argmax loop)
    _check(spark, ["a b b c", "a b c d", "b b x"], steps=6)


def test_walk_breaks_count_ties_lexicographically(spark):
    # successors of "t": u and s with equal counts -> "s" wins
    _check(spark, ["t u q", "t s q", "z t"], steps=4)


def test_dead_end_ends_rollout_early(spark):
    # most frequent context "e" leads to unique terminal "x" (never a
    # context) -> rollout stops before steps are exhausted
    texts = ["e x", "e x", "e x", "q r"]
    _check(spark, texts, steps=5)
    rows = lm_greedy_generation(_docs(spark, texts), steps=5).collect()
    assert len(rows) == 2  # seed + one step, 3 steps short of the cap


def test_empty_corpus_yields_empty_contract_schema(spark):
    df = lm_greedy_generation(_docs(spark, []), steps=3)
    assert df.schema.simpleString() == "struct<step:bigint,token:string,in_count:bigint>"
    assert df.count() == 0
