"""Distributed BPE merge learning (byte-pair encoding vocabulary).

The tokenizer-training half of an LLM data pipeline: learn the first K
BPE merges from corpus word frequencies (Sennrich et al. 2016). The
scale structure is the important part:

- The 100 TB corpus is scanned ONCE, collapsing to the word-frequency
  vocabulary (groupBy word, map-side partial counts — the same shrink
  the reference's wordcount performs). Every subsequent iteration runs
  on the vocab aggregate, whose size is bounded by |distinct words|,
  not by corpus bytes.
- Each round is one weighted pair-count aggregation (explode adjacent
  symbol pairs, SUM(word_count)) plus a deterministic global argmax
  (exact integer counts; ties break lexicographically), then a
  map-side fold that merges the chosen pair inside each word's symbol
  array (leftmost-first, non-overlapping — the BPE contract).
- The argmax is the ONLY driver round-trip per merge (one row), the
  same shape as Lloyd iterations in similarity/kmeans; vocab state is
  localCheckpoint-truncated so round R's plan does not replay rounds
  1..R-1.

The result (the merge table itself) is deterministic, so the DuckDB
oracle reproduces the whole iteration as K chained CTE stages — pair
counts, argmax, and the same fold via list_reduce — with no literals
smuggled from the Spark run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from p6__mapreduce_spark.functions.text import tokens_expr


def _merge_fold(syms: Column | str, left: str, right: str) -> Column:
    """Merge adjacent (left, right) symbol pairs, leftmost-first,
    non-overlapping: fold symbols into an accumulator, replacing the
    accumulator's tail when it is `left` and the incoming symbol is
    `right` (a just-formed merge can never be the left half of another
    merge in the same round — the BPE contract)."""
    c = F.col(syms) if isinstance(syms, str) else syms
    return F.aggregate(
        c,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(left + right))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def word_vocab(docs: DataFrame) -> DataFrame:
    """(word, n, syms): corpus word frequencies with initial
    character-level symbol arrays — the one corpus-sized job."""
    return (
        docs.select(F.explode(tokens_expr("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "word",
            "n",
            F.filter(F.split("word", ""), lambda ch: ch != F.lit("")).alias("syms"),
        )
    )


def _train(
    docs: DataFrame, num_merges: int
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Run the merge-learning iteration; returns (merge list, final
    vocab state with fully-merged symbol arrays).

    Job-shape note (r11, guide §2.6): deferring the per-round vocab
    checkpoint behind a lazy fold chain (re-checkpoint every 4 rounds,
    halving per-round job count) was implemented, verified
    merge-identical, and measured 2.17 -> 2.25 s at sf0.1 — the
    chained folds' re-evaluation plus deeper per-round expressions
    cost MORE than the saved checkpoint job, so the per-round eager
    checkpoint stays (it is also what bounds plan depth at any
    num_merges)."""
    vocab = word_vocab(docs).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for i in range(num_merges):
        # sequence(1, 0) would be DESCENDING in Spark, so single-symbol
        # words must produce an explicitly empty pair array
        pair_arr = F.when(
            F.size("syms") >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size("syms") - 1),
                lambda j: F.struct(
                    F.element_at("syms", j).alias("lhs"),
                    F.element_at("syms", j + 1).alias("rhs"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<lhs:string,rhs:string>>"))
        pairs = vocab.select("n", F.posexplode(pair_arr).alias("_p", "pair"))
        top = (
            pairs.groupBy(
                F.col("pair").getField("lhs").alias("lhs"),
                F.col("pair").getField("rhs").alias("rhs"),
            )
            .agg(F.sum("n").alias("c"))
            .orderBy(F.desc("c"), "lhs", "rhs")
            .limit(1)
            .collect()
        )
        if not top:
            break
        lhs, rhs, c = top[0].lhs, top[0].rhs, int(top[0].c)
        merges.append((i, lhs, rhs, c))
        vocab = vocab.select(
            "word", "n", _merge_fold("syms", lhs, rhs).alias("syms")
        ).localCheckpoint(eager=True)
    return merges, vocab


def bpe_learn_merges(
    spark: SparkSession, docs: DataFrame, num_merges: int = 8
) -> DataFrame:
    """(merge_idx, lhs, rhs, pair_count): the first ``num_merges``
    learned BPE merges in training order. Stops early if no adjacent
    pair remains."""
    merges, _ = _train(docs, num_merges)
    return spark.createDataFrame(
        merges, "merge_idx int, lhs string, rhs string, pair_count long"
    ).orderBy("merge_idx")


def bpe_encode_stats(
    spark: SparkSession, docs: DataFrame, num_merges: int = 8
) -> DataFrame:
    """(doc_id, n_words, n_pieces, fertility): tokenize the corpus with
    the merges just learned from it and report per-document subword
    counts — fertility (pieces per word) is the standard tokenizer-fit
    diagnostic a curation pipeline thresholds on.

    Scale shape: the fold runs once per DISTINCT word (the final vocab
    state falls out of training for free); documents then join their
    exploded words to the word -> piece-count table — bounded by
    |vocab|, so Catalyst broadcasts it — and aggregate per doc. The
    100 TB corpus is touched by exactly two jobs (the vocab build and
    this count join), never by the per-round iteration."""
    _, vocab = _train(docs, num_merges)
    pieces = vocab.select("word", F.size("syms").cast("long").alias("pieces"))
    words = docs.select(
        "doc_id", F.explode(tokens_expr("text")).alias("word")
    )
    return (
        words.join(F.broadcast(pieces), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("pieces").alias("n_pieces"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_pieces",
            (F.col("n_pieces") * F.lit(1.0) / F.col("n_words")).alias("fertility"),
        )
        .orderBy("doc_id")
    )


def _oracle_ctes(num_merges: int, *, emit_final_vocab: bool) -> tuple[list[str], list[str]]:
    """Shared CTE generator for both oracle shapes: K chained
    (pairs -> argmax -> re-merged vocab) stages reproducing the exact
    iteration — integer counts, lexicographic tie-break, list_reduce
    fold. Returns (ctes, per-merge selects)."""
    from p6__mapreduce_spark.operators.text_analysis import TOKENS_ORACLE

    toks = TOKENS_ORACLE.format(col="text")

    def fold(src: str, t: str) -> str:
        return (
            f"list_reduce([CAST([] AS VARCHAR[])] || [[s] for s in {src}.syms], "
            f"(acc, x) -> CASE WHEN len(acc) > 0 AND acc[len(acc)] = {t}.lhs "
            f"AND x[1] = {t}.rhs THEN acc[1:len(acc)-1] || [{t}.lhs || {t}.rhs] "
            f"ELSE acc || x END)"
        )

    ctes = [
        "v0 AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n,"
        " string_split(word, '') AS syms"
        f" FROM (SELECT unnest({toks}) AS word FROM documents) GROUP BY 1)"
    ]
    selects = []
    for i in range(num_merges):
        v, p, t, nv = f"v{i}", f"p{i}", f"t{i}", f"v{i + 1}"
        ctes.append(
            f"{p} AS (SELECT syms[i] AS lhs, syms[i+1] AS rhs,"
            f" CAST(SUM(n) AS BIGINT) AS c"
            f" FROM (SELECT n, syms, unnest(range(1, len(syms))) AS i FROM {v})"
            f" GROUP BY 1, 2)"
        )
        ctes.append(f"{t} AS (SELECT lhs, rhs, c FROM {p} ORDER BY c DESC, lhs, rhs LIMIT 1)")
        if i < num_merges - 1 or emit_final_vocab:
            ctes.append(
                f"{nv} AS (SELECT word, n, {fold(v, t)} AS syms"
                f" FROM {v} CROSS JOIN {t})"
            )
        selects.append(
            f"SELECT CAST({i} AS INTEGER) AS merge_idx, lhs, rhs,"
            f" c AS pair_count FROM {t}"
        )
    return ctes, selects


def bpe_oracle_sql(num_merges: int = 8) -> str:
    """DuckDB replica of :func:`bpe_learn_merges` (the merge table)."""
    ctes, selects = _oracle_ctes(num_merges, emit_final_vocab=False)
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY merge_idx"
    )


def bpe_encode_oracle_sql(num_merges: int = 8) -> str:
    """DuckDB replica of :func:`bpe_encode_stats`: re-derives the final
    vocab state v{K} through the same chained iteration, then joins the
    corpus words to per-word piece counts.

    NOTE: a merge round that finds no pair leaves t{i} empty and the
    CROSS JOIN empties v{i+1} — the same corpora where the Spark loop
    breaks early — so this oracle is only valid when all ``num_merges``
    rounds fire (true for the driver corpora; asserted in tests)."""
    from p6__mapreduce_spark.operators.text_analysis import TOKENS_ORACLE

    ctes, _ = _oracle_ctes(num_merges, emit_final_vocab=True)
    toks = TOKENS_ORACLE.format(col="text")
    return (
        "WITH " + ",\n".join(ctes) + f""",
    pieces AS (SELECT word, CAST(len(syms) AS BIGINT) AS pieces FROM v{num_merges}),
    words AS (SELECT doc_id, unnest({toks}) AS word FROM documents)
    SELECT doc_id, COUNT(*) AS n_words, CAST(SUM(pieces) AS BIGINT) AS n_pieces,
           CAST(SUM(pieces) AS BIGINT) * 1.0e0 / COUNT(*) AS fertility
    FROM words JOIN pieces USING (word)
    GROUP BY 1 ORDER BY 1"""
    )
