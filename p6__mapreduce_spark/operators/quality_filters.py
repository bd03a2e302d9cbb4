"""Named pre-training corpus filter suites: Gopher and C4.

The generic signals exist elsewhere in this repo (`repetition_stats`,
`text_analysis.quality flags`, `unigram_surprise`); production corpus
pipelines, though, apply the NAMED rule sets from the public papers —
Gopher (Rae et al. 2021, appendix A1.1) and C4 (Raffel et al. 2020,
§2.2) — and audit documents against those exact thresholds. These
operators compute the per-document rule inputs and the keep/drop
verdict so a corpus build can filter with one join-free pass.

All rules here are tokenizer-exact and integer-first (counts and
character sums are exact int64; the only doubles are final ratios of
those ints), so every column is reproduced bit-for-bit by the DuckDB
oracles in queries.py.

Deliberate scope notes, recorded where a user would look:

- Gopher's line-based rules (bullet-start ratio, ellipsis-end ratio,
  duplicate-line fraction) are computed over ``\\n``-split lines like
  the paper; the synthetic test corpus is single-line so they are
  exercised by planted fixtures in tests rather than by the parquet
  testdata (where they are trivially 0 / 1-line).
- C4's sentence-level dedup ("discard duplicate three-sentence spans")
  is a corpus-global pass, not a per-doc rule — this repo implements
  it as `passage_dedup_rewrite`; the per-doc C4 rules live here.

Scale shape: ONE map-side pass per suite — tokenize, evaluate every
rule as array/string expressions inside whole-stage codegen, no
shuffle, no UDF, no join. At 100 TB the cost is the scan; the verdict
columns are written next to the documents (or fed straight to a
filter) without ever exchanging data. The top-n-gram profile is the
exception: it needs per-(doc, n-gram) counts, one doc_id-keyed
aggregation — the same explode + partial-agg shape as
`repetition_stats`, linear in postings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from p6__mapreduce_spark.functions.pin import pin_corpus
from p6__mapreduce_spark.functions.text import tokens_expr

# Gopher appendix A1.1 "stop words": a document must contain at least
# two of these to pass (filters word-soup without an LM)
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

# C4 §2.2 blocklist phrases (the public "bad words" list is separate
# and huge; these are the structural ones the paper names)
C4_POLICY_PHRASES = ["lorem ipsum", "terms of use", "privacy policy", "cookie policy"]


def gopher_quality_filters(
    docs: DataFrame,
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Per-document Gopher quality rule inputs + verdict.

    (doc_id, n_words, sum_word_chars, mean_word_len, n_alpha_words,
    alpha_word_frac, symbol_hits, symbol_ratio, stopword_hits,
    pass_gopher) — one row per document, all rule thresholds the
    paper's defaults. mean/fracs are ratios of exact integers.
    """
    w = tokens_expr("text")
    n_words = F.size(w)
    sum_chars = F.aggregate(w, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
    n_alpha = F.size(F.filter(w, lambda t: t.rlike("[a-z]")))
    # the paper counts '#' and '…' (rendered '...') as symbols
    symbol_hits = (
        F.length("text")
        - F.length(F.replace(F.col("text"), F.lit("#"), F.lit("")))
        + (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit("..."), F.lit("")))
        )
        / F.lit(3)
    ).cast("long")
    stop_hits = F.size(
        F.array_intersect(F.array_distinct(w), F.lit(GOPHER_STOPWORDS))
    )
    mean_len = F.col("sum_word_chars") * F.lit(1.0) / F.col("n_words")
    alpha_frac = F.col("n_alpha_words") * F.lit(1.0) / F.col("n_words")
    sym_ratio = F.col("symbol_hits") * F.lit(1.0) / F.col("n_words")
    return (
        docs.filter(F.size(w) > 0)
        .select(
            "doc_id",
            n_words.cast("long").alias("n_words"),
            sum_chars.alias("sum_word_chars"),
            n_alpha.cast("long").alias("n_alpha_words"),
            symbol_hits.alias("symbol_hits"),
            stop_hits.cast("long").alias("stopword_hits"),
        )
        .select(
            "doc_id",
            "n_words",
            "sum_word_chars",
            mean_len.alias("mean_word_len"),
            "n_alpha_words",
            alpha_frac.alias("alpha_word_frac"),
            "symbol_hits",
            sym_ratio.alias("symbol_ratio"),
            "stopword_hits",
            (
                F.col("n_words").between(min_words, max_words)
                & mean_len.between(min_mean_word_len, max_mean_word_len)
                & (sym_ratio <= F.lit(max_symbol_ratio))
                & (alpha_frac >= F.lit(min_alpha_word_frac))
                & (F.col("stopword_hits") >= min_stopword_hits)
            ).alias("pass_gopher"),
        )
        .orderBy("doc_id")
    )


def gopher_top_ngram_frac(docs: DataFrame, ns: tuple[int, ...] = (2, 3, 4)) -> DataFrame:
    """Gopher's top-n-gram coverage rule inputs: for each n, the
    fraction of a document's characters covered by its single most
    frequent word n-gram (occurrences × n-gram length / length of the
    space-joined token stream). The paper drops docs whose top 2/3/4-
    gram covers more than 20/18/16% — returning the raw fraction keeps
    the thresholds a caller-side filter.

    (doc_id, n, top_gram_chars, top_gram_count, covered_chars,
    total_chars, top_frac) — one row per (doc, n) with at least one
    n-gram; ties on count break to the lexicographically smallest
    n-gram in both engines. Overlapping occurrences double-count
    covered_chars (consistent in both engines; the same simplification
    public reimplementations make).
    """
    from p6__mapreduce_spark.dedup.jaccard import shingle_postings

    # ONE tokenize pass shared by all three shingle widths AND the
    # total-chars branch (unpinned, each ran its own corpus tokenize —
    # plan audit r10: 4 documents scans); the pinned (doc_id, w) token
    # table is the written intermediate every multi-width n-gram
    # pipeline materializes at 100 TB.
    # Failure semantics (r11): corpus-sized token arrays → persist,
    # not localCheckpoint — recomputable lineage on executor loss,
    # disk spill instead of corpus-scale local checkpoint storage.
    toks = pin_corpus(docs.select("doc_id", tokens_expr("text").alias("w")))
    parts = []
    for n in ns:
        occ = shingle_postings(docs, n, distinct=False, toks=toks)
        parts.append(occ.select("doc_id", F.lit(n).cast("long").alias("n"), "shingle"))
    allocc = parts[0]
    for p in parts[1:]:
        allocc = allocc.unionByName(p)
    counts = allocc.groupBy("doc_id", "n", "shingle").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id", "n").orderBy(
        F.col("cnt").desc(), F.col("shingle").asc()
    )
    top = counts.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    totals = toks.select(
        "doc_id",
        F.length(F.array_join("w", " ")).cast("long").alias("total_chars"),
    )
    return (
        top.join(totals, "doc_id")
        .select(
            "doc_id",
            "n",
            F.length("shingle").cast("long").alias("top_gram_chars"),
            F.col("cnt").alias("top_gram_count"),
            (F.length("shingle") * F.col("cnt")).cast("long").alias("covered_chars"),
            "total_chars",
            (
                F.length("shingle") * F.col("cnt") * F.lit(1.0) / F.col("total_chars")
            ).alias("top_frac"),
        )
        .orderBy("doc_id", "n")
    )


def c4_quality_filters(docs: DataFrame, *, min_words: int = 5) -> DataFrame:
    """Per-document C4 structural rule inputs + verdict.

    (doc_id, n_words, has_brace, has_policy_phrase, keep) — has_brace
    is the paper's "remove any page containing '{'" (source-code
    leak); has_policy_phrase covers 'lorem ipsum' and the boilerplate
    policy phrases the paper names. The word floor stands in for the
    paper's 3-sentence floor on corpora (like the test one) with no
    sentence punctuation; sentence-span dedup is the corpus-global
    `passage_dedup_rewrite`, not a per-doc rule.
    """
    w = tokens_expr("text")
    lower = F.lower(F.col("text"))
    has_policy = None
    for phrase in C4_POLICY_PHRASES:
        cond = F.contains(lower, F.lit(phrase))
        has_policy = cond if has_policy is None else (has_policy | cond)
    return (
        docs.select(
            "doc_id",
            F.size(w).cast("long").alias("n_words"),
            F.contains(F.col("text"), F.lit("{")).alias("has_brace"),
            has_policy.alias("has_policy_phrase"),
        )
        .select(
            "doc_id",
            "n_words",
            "has_brace",
            "has_policy_phrase",
            (
                (F.col("n_words") >= min_words)
                & ~F.col("has_brace")
                & ~F.col("has_policy_phrase")
            ).alias("keep"),
        )
        .orderBy("doc_id")
    )
