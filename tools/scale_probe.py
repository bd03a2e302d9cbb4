#!/usr/bin/env python3
"""Scale-up probe: run the heavy operators at K x the sf0.1 data and
check the runtime grows ~linearly (the 100 TB design claim, measured).

Documents are inflated by unioning K copies with every token suffixed
with the copy digit — INSIDE the [a-z0-9] token charset, so each copy
keeps the base corpus's token-stream shape with a disjoint vocabulary
(the near-dup pair set is exactly K x the base corpus's, and the
similarity distribution — the thing that drives LSH candidate volume —
is unchanged). A separator-introducing suffix like "_i" instead
interleaves digit tokens into every shingle and lifts average pairwise
Jaccard to ~0.35, where r=2 banding admits ~90% of all pairs as
candidates — a useful adversarial regime (see SCALE.md) but not a
throughput measurement. Lineitem is inflated with offset order keys,
so aggregates are exactly K x.

Usage: python tools/scale_probe.py [K] [sf_dir]
Prints one JSON line with per-op times at 1x and Kx and the ratio.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def inflate_documents(docs: DataFrame, k: int) -> DataFrame:
    out = None
    for i in range(k):
        copy = docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            F.regexp_replace("text", r"([a-z0-9]+)", rf"$1x{i}").alias("text"),
        )
        out = copy if out is None else out.unionAll(copy)
    return out


def inflate_documents_lang(docs: DataFrame, k: int) -> DataFrame:
    # like inflate_documents but carries the lang column (DSIR's
    # target/source split): each copy keeps the base lang mix, so the
    # target fraction — the thing that shapes the bucket model — is
    # unchanged while gram volume grows k x
    out = None
    for i in range(k):
        copy = docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            F.regexp_replace("text", r"([a-z0-9]+)", rf"$1x{i}").alias("text"),
            "lang",
        )
        out = copy if out is None else out.unionAll(copy)
    return out


def inflate_events(ev: DataFrame, k: int) -> DataFrame:
    # offset user ids -> disjoint user populations per copy: per-user
    # sequences (the lag/window unit) stay base-sized, their count
    # grows k x — the regime that must parallelize, not serialize
    out = None
    for i in range(k):
        copy = ev.withColumn(
            "event_id", F.col("event_id") + F.lit(i * 100_000_000)
        ).withColumn("user_id", F.col("user_id") + F.lit(i * 100_000_000))
        out = copy if out is None else out.unionAll(copy)
    return out


def inflate_lineitem(li: DataFrame, k: int) -> DataFrame:
    out = None
    for i in range(k):
        copy = li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * 100_000_000))
        out = copy if out is None else out.unionAll(copy)
    return out


def inflate_embeddings(emb: DataFrame, k: int) -> DataFrame:
    # identical vectors under offset ids: bucket geometry is unchanged,
    # per-bucket candidate volume grows exactly k x — the quantity that
    # drives ANN cost
    out = None
    for i in range(k):
        copy = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
        out = copy if out is None else out.unionAll(copy)
    return out


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from p6__mapreduce_spark.dedup.minhash import minhash_lsh_pairs
    from p6__mapreduce_spark.operators.analytics import pricing_summary
    from p6__mapreduce_spark.operators.pipeline import doc_chunks, repetition_stats, sequence_packing
    from p6__mapreduce_spark.operators.ranking import (
        bigram_entropy,
        bm25_scores,
        tfidf_doc_terms,
        unigram_surprise,
    )
    from p6__mapreduce_spark.operators.text_analysis import rare_ngram_ratio
    from p6__mapreduce_spark.session import get_session
    from p6__mapreduce_spark.similarity.lsh import knn_lsh
    from p6__mapreduce_spark.sources.readers import load_table

    from p6__mapreduce_spark.dedup.geometry import recommend_minhash_geometry as _geom
    from p6__mapreduce_spark.dedup.simhash import (
        simhash64 as _simhash64,
        simhash64_pairs as _simhash64_pairs,
    )
    from p6__mapreduce_spark.multimodal.columns import (
        attach_ppm_payload,
        decode_image,
    )
    from p6__mapreduce_spark.operators.pipeline import source_cap

    def _decode(d):
        return decode_image(attach_ppm_payload(d))

    from p6__mapreduce_spark.dedup.editdist import edit_distance_pairs as _editdist
    from p6__mapreduce_spark.operators.analytics import skew_profile as _skew
    from p6__mapreduce_spark.operators.ranking import bigram_perplexity as _bigram_ppl
    from p6__mapreduce_spark.operators.textrank import textrank_keywords as _textrank
    from p6__mapreduce_spark.similarity.kmeans import kmeans_lloyd as _kmeans

    def _source_cap(d):
        # derive 7 sources from doc_id so inflation grows each source 10x
        # (the hot-source regime the salted two-stage cap is for)
        return source_cap(
            d.withColumn("source", F.pmod(F.col("doc_id"), F.lit(7)).cast("string")), 3
        )

    spark = get_session("scale-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    li = load_table(spark, sf_dir, "lineitem")
    emb = load_table(spark, sf_dir, "embeddings")

    from p6__mapreduce_spark.operators.attribution_markov import (
        markov_removal_attribution as _markov,
    )
    from p6__mapreduce_spark.operators.collocations import skipgram_pmi as _skipgram
    from p6__mapreduce_spark.operators.rankcorr import (
        spearman_user_activity_value as _spearman,
    )
    from p6__mapreduce_spark.operators.text_analysis import (
        winnow_fingerprints as _winnow,
    )
    from p6__mapreduce_spark.operators.evaluate import wasserstein1 as _w1
    from p6__mapreduce_spark.operators.kmv import kmv_audience_overlap as _kmv
    from p6__mapreduce_spark.similarity.pca import pca_top_component as _pca
    from p6__mapreduce_spark.similarity.quantize import int8_quant_audit as _int8

    ops = {
        "tpch_q1": (lambda d: pricing_summary(d), li, inflate_lineitem),
        # r8 doubling rewrite: per-doc O(n log k) arrays, no shuffle
        # before the output sort — must scale with doc count
        "winnow_fingerprints": (lambda d: _winnow(d), docs, inflate_documents),
        # r8 batch
        "skipgram_pmi": (lambda d: _skipgram(d), docs, inflate_documents),
        "int8_quant_audit": (lambda d: _int8(d), emb, inflate_embeddings),
        "repetition_stats": (lambda d: repetition_stats(d), docs, inflate_documents),
        "dedup_minhash_lsh": (lambda d: minhash_lsh_pairs(d), docs, inflate_documents),
        "doc_chunks": (lambda d: doc_chunks(d), docs, inflate_documents),
        "sequence_packing": (lambda d: sequence_packing(d), docs, inflate_documents),
        "knn_lsh": (
            # fixed 16-query set (copy 0 only) against the k x corpus
            lambda d: knn_lsh(d, d.filter(F.col("vec_id") < 16), k=5),
            emb,
            inflate_embeddings,
        ),
        "rare_bigram_ratio": (lambda d: rare_ngram_ratio(d), docs, inflate_documents),
        # suffixed copies have disjoint vocab: tf-idf/unigram rows grow
        # exactly k x, df/total recompute over the k x corpus
        "tfidf_doc_terms": (lambda d: tfidf_doc_terms(d), docs, inflate_documents),
        "bm25_scores": (
            lambda d: bm25_scores(d, ["spark", "window", "join", "hash", "stream"]),
            docs,
            inflate_documents,
        ),
        "unigram_surprise": (lambda d: unigram_surprise(d), docs, inflate_documents),
        "bigram_entropy": (lambda d: bigram_entropy(d), docs, inflate_documents),
        # round-4 ops: 64-bit fingerprints are scan-bound like 32-bit;
        # the pair join must stay linear-in-output (disjoint-vocab
        # copies -> k x the base pair set); the salted source cap and
        # the geometry probe (sample grows k x with the corpus) must
        # both stay ~linear; decode is a pure map over minted payloads
        "dedup_simhash64": (lambda d: _simhash64(d), docs, inflate_documents),
        "dedup_simhash64_pairs": (lambda d: _simhash64_pairs(d, 5), docs, inflate_documents),
        "source_cap": (lambda d: _source_cap(d), docs, inflate_documents),
        "minhash_geometry_probe": (lambda d: _geom(d), docs, inflate_documents),
        "multimodal_decode": (lambda d: _decode(d), docs, inflate_documents),
        # round-4 session ops: kmeans scans kx rows per iteration with
        # constant driver traffic; textrank's graph grows kx nodes/edges
        # (disjoint vocab per copy); perplexity is two token-keyed
        # joins; editdist pairs grow exactly kx (disjoint-vocab copies
        # -> kx the base near-dup pair set); skew/textrank collapse to
        # small outputs so time should track the scan
        "kmeans_lloyd": (lambda d: _kmeans(d), emb, inflate_embeddings),
        "textrank_keywords": (lambda d: _textrank(d), docs, inflate_documents),
        "bigram_perplexity": (lambda d: _bigram_ppl(d), docs, inflate_documents),
        "dedup_edit_distance": (
            lambda d: _editdist(d, minhash_lsh_pairs(d)),
            docs,
            inflate_documents,
        ),
        "skew_profile": (lambda d: _skew(d, "doc_id"), docs, inflate_documents),
    }

    # continuation ops. hybrid_search_rrf is intentionally absent: its
    # two legs are exactly bm25_scores (probed above) and a cosine
    # top-k scan (probed via knn_lsh), and everything past the legs is
    # O(n_candidates) by construction.
    from p6__mapreduce_spark.operators.bpe import bpe_learn_merges as _bpe
    from p6__mapreduce_spark.operators.dsir import dsir_weights as _dsir
    from p6__mapreduce_spark.operators.sketches import cms_token_audit as _cms
    from p6__mapreduce_spark.similarity.mining import mine_contrastive_pairs as _mine

    docs_lang = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    events = load_table(spark, sf_dir, "events")

    def _transition(ev):
        # the registered query reads from a dir; rebuild the same plan
        # over the (possibly inflated) events frame
        from pyspark.sql import Window

        seq = ev.select(
            "event_type",
            F.lag("event_type")
            .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
            .alias("prev_type"),
        )
        pairs = (
            seq.filter(F.col("prev_type").isNotNull())
            .groupBy("prev_type", F.col("event_type").alias("next_type"))
            .agg(F.count(F.lit(1)).alias("c_pair"))
        )
        return pairs

    ops.update(
        {
            # gram volume k x, bucket model constant-size: ~linear scan
            "dsir_weights": (lambda d: _dsir(d), docs_lang, inflate_documents_lang),
            # sketch matrix constant-size; explode + partial agg k x
            "cms_heavy_hitters": (lambda d: _cms(d), docs, inflate_documents),
            # vocab k x (disjoint suffixed words), rounds constant
            "bpe_learn_merges": (
                lambda d: _bpe(spark, d, num_merges=4),
                docs,
                inflate_documents,
            ),
            # fixed 16-query set against the k x candidate corpus
            "contrastive_mining": (
                lambda d: _mine(d, d.filter(F.col("vec_id") < 16)),
                emb,
                inflate_embeddings,
            ),
            # k x disjoint user populations: window state per task is
            # base-sized, matrix output stays |types|^2
            "event_transition_matrix": (lambda d: _transition(d), events, inflate_events),
            # r8 batch, events side: one per-user window + bounded
            # fixed-point rounds / bounded distinct-value rank tables
            "markov_removal_attribution": (lambda d: _markov(d), events, inflate_events),
            "spearman_activity_value": (lambda d: _spearman(d), events, inflate_events),
            # bottom-K rank over per-type distinct-hash tables; the
            # pairwise stage is K-row sketches only
            "kmv_audience_overlap": (lambda d: _kmv(d), events, inflate_events),
            # one (value) agg + bounded distinct-value window
            "wasserstein_purchase_vs_click": (
                lambda d: _w1(
                    d.filter(F.col("event_type").isin("purchase", "click")),
                    F.round(F.col("value") * 100).cast("long"),
                    F.col("event_type") == "purchase",
                    F.col("event_type") == "click",
                ),
                events,
                inflate_events,
            ),
            # one d^2-moments pass; 15 rounds on the bounded matrix
            "pca_top_component": (lambda d: _pca(d), emb, inflate_embeddings),
        }
    )

    # round-8 continuation batch
    from p6__mapreduce_spark.functions.hilbert import hilbert_df as _hilbert
    from p6__mapreduce_spark.operators.causal import isotonic_calibration as _iso
    from p6__mapreduce_spark.operators.graph import part_link_prediction as _linkpred
    from p6__mapreduce_spark.operators.lm import good_turing_unigrams as _gt
    from p6__mapreduce_spark.operators.logreg import logreg_quality_irls as _logreg

    orders = load_table(spark, sf_dir, "orders")

    def inflate_orders(o, kk):
        out = None
        for i in range(kk):
            copy = o.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(i * 100_000_000)
            )
            out = copy if out is None else out.unionAll(copy)
        return out

    ops.update(
        {
            # vocab k x (disjoint suffixed words); count-of-counts stays
            # a bounded table, so time must track the explode scan
            "good_turing_unigrams": (lambda d: _gt(d), docs, inflate_documents),
            # ROUNDS+1 scans of the (user, day) relation; moments are 10
            # int64s/round regardless of k
            "logreg_quality_irls": (lambda d: _logreg(d), events, inflate_events),
            # one (user, day) agg; the O(B^3) fit is k-invariant
            "isotonic_calibration": (lambda d: _iso(d), events, inflate_events),
            # pair volume exactly k x (disjoint order keys per copy);
            # degree joins stay part-vocabulary-sized per copy
            "link_prediction_scores": (lambda d: _linkpred(d), li, inflate_lineitem),
            # pure map: 10 fused projections, no shuffle
            "hilbert_codes": (
                lambda d: _hilbert(d, "o_orderkey", "o_custkey", "o_orderkey"),
                orders,
                inflate_orders,
            ),
        }
    )

    from p6__mapreduce_spark.operators.basket import apriori_triples as _apriori
    from p6__mapreduce_spark.operators.causal import ab_power_mde as _abpow
    from p6__mapreduce_spark.operators.lm import lm_greedy_generation as _lmgen
    from p6__mapreduce_spark.operators.robust import (
        binseg_changepoints_daily as _binseg,
        huber_regression_daily as _huber,
    )
    from p6__mapreduce_spark.operators.text_analysis import (
        vocab_growth_curve as _vgrowth,
    )
    from p6__mapreduce_spark.operators.causal import (
        logrank_test_conversion as _logrank,
    )
    from p6__mapreduce_spark.operators.evaluate import roc_curve_points as _roc
    from p6__mapreduce_spark.similarity.mmd import mmd_embedding_drift as _mmd
    from p6__mapreduce_spark.operators.ranking import phrase_search as _phrase
    from p6__mapreduce_spark.similarity.als import als_factorization as _als

    ops.update(
        {
            # 4 half-steps: ratings join vs bounded factor relations.
            # Inflate the PART dimension (offset l_partkey, orderkeys
            # intact so the orders join holds): k x ratings and k x
            # items, same users — the item-embedding-table growth axis
            "als_factorization": (
                lambda d: _als(orders, d),
                li,
                lambda b, kk: __import__("functools").reduce(
                    lambda a, c: a.unionAll(c),
                    [
                        b.withColumn(
                            "l_partkey", F.col("l_partkey") + F.lit(i * 100_000_000)
                        )
                        for i in range(kk)
                    ],
                ),
            ),
            # corpus collapses to per-user rows then day-bounded terms
            "logrank_test_conversion": (lambda d: _logrank(d), events, inflate_events),
            # explode -> vocab-bounded MIN-doc aggregate; suffixed
            # copies grow the vocab k x, checkpoints stay 20 rows
            "vocab_growth_curve": (lambda d: _vgrowth(d), docs, inflate_documents),
            # one (user, day) collapse; 5-row metric table after
            "ab_power_mde": (lambda d: _abpow(d), events, inflate_events),
            # 7 passes over the |days| relation (k x orders share the
            # same day domain -> day rows constant, cents k x)
            "huber_regression_daily": (lambda d: _huber(d), orders, inflate_orders),
            # corpus collapses once to the |days| prefix relation;
            # the 2-level split search runs on that bounded table, so
            # k x orders (same day domain) only grows the collapse
            "binseg_changepoints": (lambda d: _binseg(d), orders, inflate_orders),
            # corpus collapses once to the vocab-bounded bigram count
            # relation; the 15 limit(1) decode steps are corpus-size
            # independent (suffixed copies grow vocab k x, step count
            # fixed)
            "lm_greedy_generation": (lambda d: _lmgen(d), docs, inflate_documents),
            # one pass to per-(label, i, j) moment relations; k x
            # identical vectors per label -> moments scale, matrices
            # and the 45-pair compare are k-invariant
            "mmd_embedding_drift": (lambda d: _mmd(d), emb, inflate_embeddings),
            # corpus collapses to the distinct-score relation
            "roc_curve_points": (
                lambda d: _roc(
                    d.withColumn("n_chars", F.length("text")),
                    F.col("n_chars").cast("long"),
                    F.col("lang") == "en",
                ),
                docs_lang,
                inflate_documents_lang,
            ),
            # L1/L2 prune before the triple explode; k x disjoint
            # order keys -> k x baskets over the same part vocabulary
            "apriori_triples": (lambda d: _apriori(d), li, inflate_lineitem),
            # postings filtered to 3 terms before the adjacency joins;
            # copies keep the TEXT (doc_id offsets only) so the query
            # phrase's posting volume grows exactly k x
            "phrase_search": (
                lambda d: _phrase(d),
                docs,
                lambda b, kk: __import__("functools").reduce(
                    lambda a, c: a.unionAll(c),
                    [
                        b.withColumn(
                            "doc_id", F.col("doc_id") + F.lit(i * 10_000_000)
                        )
                        for i in range(kk)
                    ],
                ),
            ),
        }
    )

    # round-5 ops
    from p6__mapreduce_spark.operators.quality_filters import (
        c4_quality_filters as _c4,
        gopher_quality_filters as _gopher,
        gopher_top_ngram_frac as _topngram,
    )
    from p6__mapreduce_spark.similarity.ivfpq import knn_ivfpq as _ivfpq

    def _inflate_docs_src(d, kk):
        # inflate keeping a synthetic source so the source-level dedup
        # rollups see k x the docs per source (sources held constant)
        base_src = d.withColumn(
            "source", F.pmod(F.col("doc_id"), F.lit(7)).cast("string")
        )
        return inflate_documents(base_src.select("doc_id", "text"), kk).withColumn(
            "source", F.pmod(F.col("doc_id"), F.lit(7)).cast("string")
        )

    def _dup_rate(d):
        from p6__mapreduce_spark.dedup.jaccard import ngram_jaccard_pairs

        pairs = ngram_jaccard_pairs(d, threshold=0.8)
        members = (
            pairs.select(F.col("id1").alias("doc_id"))
            .unionByName(pairs.select(F.col("id2").alias("doc_id")))
            .distinct()
            .withColumn("is_dup", F.lit(1).cast("long"))
        )
        return (
            d.select("doc_id", "source")
            .join(members, "doc_id", "left")
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum(F.coalesce("is_dup", F.lit(0).cast("long"))).alias("n_dup"),
            )
        )

    docs_src = docs.withColumn(
        "source", F.pmod(F.col("doc_id"), F.lit(7)).cast("string")
    )
    ops.update(
        {
            # pure map-side passes: time must track the scan
            "gopher_quality_filters": (lambda d: _gopher(d), docs, inflate_documents),
            "c4_quality_filters": (lambda d: _c4(d), docs, inflate_documents),
            # postings explode + doc-keyed agg: linear in postings
            "gopher_top_ngram_frac": (lambda d: _topngram(d), docs, inflate_documents),
            # identical-vector copies: coarse cells grow k x members,
            # probed-list candidate volume grows exactly k x
            "knn_ivfpq": (
                lambda d: _ivfpq(d, n_queries=8, k_coarse=8, m=8, k=16),
                emb,
                inflate_embeddings,
            ),
            # pair set k x (disjoint vocab); rollup output |sources|^2
            "dedup_rate_by_source": (lambda d: _dup_rate(d), docs_src, _inflate_docs_src),
        }
    )
    # round-5 batch 2: bloom prejoin / grid quantiles / pagerank /
    # hashing trick / PMI / portable HLL
    from p6__mapreduce_spark.operators.bloom import bloom_prejoin_audit as _bloom
    from p6__mapreduce_spark.operators.features import (
        feature_hash_vectors as _fhash,
        ngram_pmi as _pmi,
    )
    from p6__mapreduce_spark.operators.graph import nation_trade_pagerank as _pr
    from p6__mapreduce_spark.operators.hll import hll_portable_audit as _hll
    from p6__mapreduce_spark.operators.sketches import grid_quantile_sketch as _gq

    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")

    def _inflate_orders(o, kk):
        # offset custkeys -> k x the qualifying key population; the
        # bloom stays fixed-size, so build cost must track the scan
        out = None
        for i in range(kk):
            copy = o.withColumn(
                "o_custkey", F.col("o_custkey") + F.lit(i * 100_000_000)
            ).withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * 100_000_000))
            out = copy if out is None else out.unionAll(copy)
        return out

    def _inflate_li_repeat(l, kk):
        # k IDENTICAL copies (keys preserved): the lineitem⋈orders edge
        # aggregation — pagerank's only corpus-scale phase — sees k x
        # rows into the same bounded N^2 matrix; iterations unchanged
        out = None
        for _ in range(kk):
            out = l if out is None else out.unionAll(l)
        return out

    def _inflate_customer(c, kk):
        # offset custkeys, every quasi-identifier column untouched: the
        # class STRUCTURE (nationkey x mktsegment x acctbal-bucket) is
        # identical, each class just holds k x members — so the finest
        # class table k_anon_generalization collapses to keeps its
        # cardinality and only the one corpus aggregation grows
        out = None
        for i in range(kk):
            copy = c.withColumn(
                "c_custkey", F.col("c_custkey") + F.lit(i * 100_000_000)
            )
            out = copy if out is None else out.unionAll(copy)
        return out

    from p6__mapreduce_spark.operators.pii import k_anon_generalization as _kanon_gen

    ops.update(
        {
            # one corpus collapse to the bounded finest-class relation;
            # the 8-width ladder re-aggregates that relation only (r9
            # verdict #6 — the last argued-not-measured SCALE.md entry)
            "k_anon_generalization": (lambda c: _kanon_gen(c), customer, _inflate_customer),
            # filter stays O(mbits); build + test must track the scans
            "bloom_prejoin_audit": (
                lambda o: _bloom(customer, o),
                orders,
                _inflate_orders,
            ),
            # histogram state fixed at groups x 4096; one partial-agg
            "value_quantile_sketch": (lambda d: _gq(d), events, inflate_events),
            # edge agg k x input, same bounded matrix; rounds constant
            "nation_trade_pagerank": (
                lambda l: _pr(nation, customer, supplier, orders, l),
                li,
                _inflate_li_repeat,
            ),
            # no vocab pass: explode + bounded-key agg, linear in tokens
            "feature_hash_vectors": (lambda d: _fhash(d), docs, inflate_documents),
            # disjoint-vocab copies: bigram/unigram tables k x, joins
            # posting-sized, top-k partial
            "ngram_pmi": (lambda d: _pmi(d), docs, inflate_documents),
            # registers fixed at groups x 256; map-side mixer + MAX agg
            "hll_user_audit": (lambda d: _hll(d), events, inflate_events),
        }
    )
    # round-5 continuation ops (range join / graph / LM / robust / evals)
    from p6__mapreduce_spark.dedup.jaccard import containment_pairs as _contain
    from p6__mapreduce_spark.dedup.triangles import triangle_stats as _tri
    from p6__mapreduce_spark.operators.basket import basket_part_pairs as _basket
    from p6__mapreduce_spark.operators.evaluate import ks_statistic as _ks
    from p6__mapreduce_spark.operators.lm import kneser_ney_bigram as _kn
    from p6__mapreduce_spark.operators.rangejoin import promo_window_event_stats as _promo
    from p6__mapreduce_spark.operators.robust import theil_sen_daily_revenue as _theil
    from p6__mapreduce_spark.similarity.jl import jl_projection_audit as _jl

    def _inflate_li_keys(l, kk):
        # offset order AND part keys per copy: k x disjoint baskets of
        # the base size — pair volume must grow k x, never k^2
        out = None
        for i in range(kk):
            copy = l.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.lit(i * 100_000_000)
            ).withColumn("l_partkey", F.col("l_partkey") + F.lit(i * 100_000_000))
            out = copy if out is None else out.unionAll(copy)
        return out

    ops.update(
        {
            # bigram vocab k x (disjoint suffixes); aux tables derive
            # from the aggregate — joins posting-sized
            "kneser_ney_bigram": (lambda d: _kn(d), docs, inflate_documents),
            # directed pair set k x the base's (disjoint vocab copies)
            "dedup_containment": (
                lambda d: _contain(d, threshold=0.8),
                docs,
                inflate_documents,
            ),
            # near-dup graph k x disjoint components: wedges/triangles
            # grow k x, orientation bounds unchanged
            "dedup_triangle_stats": (
                lambda d: _tri(minhash_lsh_pairs(d)),
                docs,
                inflate_documents,
            ),
            # k x disjoint baskets of constant size: pair fan-out k x
            "basket_part_pairs": (lambda l: _basket(l), li, _inflate_li_keys),
            # FIXED interval set, k x identical point copies: bin-join
            # fan-out and per-order counts grow exactly k x
            "promo_window_event_stats": (
                lambda l: _promo(orders, l),
                li,
                _inflate_li_repeat,
            ),
            # collapses to |days| rows FIRST: the |days|^2 pair grid is
            # corpus-size independent, so time must track the scan only
            "theil_sen_daily_revenue": (lambda o: _theil(o), orders, _inflate_orders),
            # per-distinct-value counts: distinct values ~constant under
            # identical-copy inflation, cumulative window constant
            "ks_purchase_vs_click": (
                lambda e: _ks(
                    e.filter(F.col("event_type").isin("purchase", "click")),
                    F.round(F.col("value") * 100).cast("long"),
                    F.col("event_type") == "purchase",
                    F.col("event_type") == "click",
                ),
                events,
                inflate_events,
            ),
            # fixed 16-query set, projection map-side: linear scan
            "jl_projection_audit": (
                lambda d: _jl(d, n_queries=8),
                emb,
                inflate_embeddings,
            ),
        }
    )
    # round-5 closing batch: intervals / divergence / SNM / lexical kNN
    from p6__mapreduce_spark.dedup.neighborhood import (
        sorted_neighborhood_pairs as _snm,
    )
    from p6__mapreduce_spark.operators.divergence import jsd_source_unigrams as _jsd
    from p6__mapreduce_spark.operators.intervals import (
        peak_concurrency_daily as _peak,
        scd2_user_state as _scd2,
    )

    docs_jsd = docs.withColumn(
        "source", F.pmod(F.col("doc_id"), F.lit(7)).cast("string")
    )

    def _inflate_docs_jsd(d, kk):
        return inflate_documents(d.drop("source"), kk).withColumn(
            "source", F.pmod(F.col("doc_id"), F.lit(7)).cast("string")
        )

    ops.update(
        {
            # k x disjoint user populations: window state per task is
            # base-sized, output rows grow exactly k x
            "scd2_user_state": (lambda d: _scd2(d), events, inflate_events),
            # sweep volume 2k x rows over the same |days| partitions;
            # running-sum state bounded per day-task
            "peak_concurrency_daily": (lambda d: _peak(d), events, inflate_events),
            # vocab k x disjoint copies: the (source, token) table and
            # the token self-join both grow k x, pair count |sources|^2
            "jsd_source_unigrams": (lambda d: _jsd(d), docs_jsd, _inflate_docs_jsd),
            # blocks grow k x in count (suffixed sort keys diverge at
            # the prefix), window b*(w-1) candidates per block: linear
            "dedup_sorted_neighborhood": (lambda d: _snm(d), docs, inflate_documents),
            # tfidf_cosine_topk is intentionally absent: the suffixing
            # inflation holds per-term df CONSTANT while N grows k x,
            # which defeats the relative df cap by construction (every
            # term passes at k x, candidate volume explodes on this
            # 31-token-vocabulary synthetic corpus where pairwise
            # token sharing is inherently dense). On a real Zipf
            # corpus df scales with N and the cap geometry is
            # invariant; the candidate bound IS the cap, asserted in
            # tests (absolute max_df path) rather than probed here.
        }
    )
    # round-6 two-phase rewrites: each probe pins the <=2x-at-10x
    # claim the r5 verdict asked for on the rewritten plans
    from p6__mapreduce_spark.operators.analytics import (
        pareto_frontier as _pareto,
        revenue_gini as _gini,
        rfm_segments as _rfm,
    )
    from p6__mapreduce_spark.operators.intervals import (
        weighted_median_price as _wmedian,
    )
    from p6__mapreduce_spark.operators.pipeline import (
        token_budget_pack as _tbp,
    )
    from p6__mapreduce_spark.operators.text_analysis import (
        quantile_normalize_tokens as _qnorm,
    )

    part = load_table(spark, sf_dir, "part")

    def _inflate_part(p, kk):
        # offset partkeys, identical (price, size) copies: the global
        # skyline is every copy of each frontier row, so output grows
        # exactly k x while level-1 local skylines stay tiny
        out = None
        for i in range(kk):
            copy = p.withColumn(
                "p_partkey", F.col("p_partkey") + F.lit(i * 100_000_000)
            )
            out = copy if out is None else out.unionAll(copy)
        return out

    ops.update(
        {
            # histogram collapse first: the cumulative window input is
            # |distinct prices| regardless of k — wall should track
            # the scan only
            "weighted_median_price": (
                lambda l: _wmedian(l),
                li,
                inflate_lineitem,
            ),
            # salted pre-filter keeps <= salts*budget rows per source
            # at ANY k; stage-2 window input constant
            "token_budget_pack": (lambda d: _tbp(d), docs_src, _inflate_docs_src),
            # three chained two-phase ranks over the k x customer
            # aggregate: per-task sort is |customers|*k/P
            "rfm_segments": (lambda o: _rfm(o), orders, _inflate_orders),
            # two-phase global rank over the k x customer aggregate
            "revenue_gini": (lambda o: _gini(o), orders, _inflate_orders),
            # two-phase per-source rank + bounded distinct-value
            # range join (suffixed vocab grows the distinct-value
            # table k x — still tiny vs corpus)
            "quantile_normalize_tokens": (
                lambda d: _qnorm(d),
                docs_src,
                _inflate_docs_src,
            ),
            # 64-way local skylines then the exact pass over their
            # union (k x frontier duplicates)
            "pareto_frontier_parts": (lambda p: _pareto(p), part, _inflate_part),
        }
    )
    only = set(sys.argv[3:])
    if only:
        ops = {n: v for n, v in ops.items() if n in only}
    report: dict[str, dict] = {}
    for name, (fn, base, inflate) in ops.items():
        t0 = time.time()
        rows1 = fn(base).count()
        t1 = time.time() - t0
        spark.catalog.clearCache()
        big = inflate(base, k)
        t0 = time.time()
        rowsk = fn(big).count()
        tk = time.time() - t0
        spark.catalog.clearCache()
        report[name] = {
            "rows_1x": rows1,
            "rows_kx": rowsk,
            "sec_1x": round(t1, 2),
            "sec_kx": round(tk, 2),
            "time_ratio": round(tk / t1, 2),
        }
    print(json.dumps({"k": k, "sf_dir": sf_dir, "ops": report}))


if __name__ == "__main__":
    main()
