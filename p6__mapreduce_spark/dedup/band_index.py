"""Cross-run near-dup state: a persisted MinHash band index.

``dedup/minhash.py: incremental_neardup_pairs`` computes corpus-side
bands inside one session — fine for a backfill, wrong for the daily
reality of a 100 TB pipeline, where TODAY'S batch must be checked
against ALL prior ingest without rescanning (or even re-shingling) the
historical corpus. This module persists the corpus's banded signatures
once and lets any later session probe them (r9 verdict #8):

  write_band_index(corpus)  ->  parquet rows
      (doc_id, band, bh, sig, n_shingles) partitioned by
      p = pmod(bh, INDEX_BUCKETS)
  probe_band_index(batch)   ->  (id1, id2, minhash_est) pairs,
      id1 = historical doc, id2 = batch doc

Scale contract:

- The probe NEVER touches historical text: candidates come from the
  band join, similarity from signature-position agreement (the
  standard MinHash estimator — matching positions / num_hashes). An
  exact-Jaccard re-verify needs historical shingles and is therefore a
  different cost class; callers who need it run
  ``incremental_neardup_pairs`` over the candidate doc subset.
- Probe cost is independent of corpus size in everything but the
  band-bucket scan: the index is hash-partitioned on ``p`` and the
  probe statically prunes to the batch's ``p`` values (bounded by
  16 bands x batch docs, tiny for a daily batch), so unmatched
  partitions are never opened; within matched partitions the join
  shuffles ONLY colliding (band, bh) groups. The pruned-scan residual
  grows with corpus/INDEX_BUCKETS per bucket — at cluster scale raise
  INDEX_BUCKETS so a bucket stays a few hundred MB.
- Appending a day's ingest = write_band_index(new_docs, mode="append")
  with doc_ids disjoint by construction (the caller's stable ids);
  no read-modify-write of existing buckets.

Determinism: signatures/bands reuse minhash.py's fixed affine
permutations; banding collisions are slice-EQUALITY collisions plus a
2^-32 F.hash false-candidate tail that the estimate filter re-checks
against full signatures — the emitted pair set equals the portable
slice-equality model (pinned by test) up to that vanishing tail, the
same argument class as minhash_lsh_pairs' registered oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from p6__mapreduce_spark.dedup.jaccard import shingle_postings
from p6__mapreduce_spark.dedup.minhash import minhash_signatures

INDEX_BUCKETS = 64  # pmod(bh, _) partition key; raise at cluster scale


def _banded_sigs(
    docs: DataFrame, k: int, num_hashes: int, num_bands: int
) -> DataFrame:
    """(doc_id, band, bh, p, sig, n_shingles) — one row per doc-band."""
    rows_per_band = num_hashes // num_bands
    postings = shingle_postings(docs, k)
    sigs = minhash_signatures(docs, k, num_hashes, postings=postings)
    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.hash(F.slice("sig", j * rows_per_band + 1, rows_per_band)).alias("bh"),
            )
            for j in range(num_bands)
        ]
    )
    return (
        sigs.select("doc_id", "sig", "n_shingles", F.explode(bands).alias("b"))
        .select(
            "doc_id",
            F.col("b.band").alias("band"),
            F.col("b.bh").alias("bh"),
            F.pmod(F.col("b.bh"), F.lit(INDEX_BUCKETS)).alias("p"),
            "sig",
            "n_shingles",
        )
    )


def write_band_index(
    docs: DataFrame,
    path: str,
    *,
    k: int = 3,
    num_hashes: int = 32,
    num_bands: int = 16,
    mode: str = "overwrite",
) -> None:
    """Persist the corpus's banded signatures, hash-partitioned on
    ``p`` so probes can statically prune to their band buckets.
    ``mode="append"`` is the daily-ingest path (disjoint doc_ids)."""
    _banded_sigs(docs, k, num_hashes, num_bands).write.partitionBy("p").mode(
        mode
    ).parquet(path)


def probe_band_index(
    spark: SparkSession,
    index_path: str,
    batch: DataFrame,
    *,
    threshold: float = 0.8,
    k: int = 3,
    num_hashes: int = 32,
    num_bands: int = 16,
) -> DataFrame:
    """(id1, id2, minhash_est) — batch docs vs the persisted corpus.

    id1 = historical doc_id, id2 = batch doc_id, minhash_est = matching
    signature positions / num_hashes, emitted when >= threshold and the
    pair shares at least one band bucket. Historical text is never
    read; the index scan is pruned to the batch's band buckets."""
    bb = _banded_sigs(batch, k, num_hashes, num_bands)
    # The batch's bucket set is bounded (<= num_bands x |batch| ints,
    # <= INDEX_BUCKETS distinct) — collect it and prune STATICALLY so
    # the parquet source lists only matching partition directories.
    # (Dynamic partition pruning would need a broadcast join against a
    # dimension with a selective filter; an explicit IN list on the
    # partition column is deterministic and plan-visible.)
    ps = sorted(r.p for r in bb.select("p").distinct().collect())
    index = spark.read.parquet(index_path).filter(F.col("p").isin(ps))
    cand = (
        index.alias("c")
        .join(
            bb.alias("b"),
            (F.col("c.p") == F.col("b.p"))
            & (F.col("c.band") == F.col("b.band"))
            & (F.col("c.bh") == F.col("b.bh")),
        )
        .select(
            F.col("c.doc_id").alias("id1"),
            F.col("b.doc_id").alias("id2"),
            F.col("c.sig").alias("s1"),
            F.col("b.sig").alias("s2"),
        )
        .distinct()
    )
    n_match = F.size(F.filter(F.zip_with("s1", "s2", lambda x, y: x == y), lambda m: m))
    est = F.col("n_match") * F.lit(1.0) / F.lit(float(num_hashes))
    return (
        cand.withColumn("n_match", n_match)
        .withColumn("minhash_est", est)
        .filter(F.col("minhash_est") >= F.lit(threshold))
        .select("id1", "id2", "minhash_est")
        .orderBy("id1", "id2")
    )


def probe_model_pairs(
    corpus: DataFrame,
    batch: DataFrame,
    *,
    threshold: float = 0.8,
    k: int = 3,
    num_hashes: int = 32,
    num_bands: int = 16,
) -> DataFrame:
    """Portable in-session model of the probe (test oracle): candidates
    by signature-slice EQUALITY (no F.hash), same estimate filter.
    Equal slices imply equal band hashes, so probe output ⊇ model up
    to F.hash's 2^-32 false-candidate tail, which the estimate filter
    then re-checks — making probe == model on any realistic input."""
    rows_per_band = num_hashes // num_bands
    cs = minhash_signatures(corpus, k, num_hashes).select(
        F.col("doc_id").alias("id1"), F.col("sig").alias("s1")
    )
    bs = minhash_signatures(batch, k, num_hashes).select(
        F.col("doc_id").alias("id2"), F.col("sig").alias("s2")
    )
    share_band = None
    for j in range(num_bands):
        eq = F.slice("s1", j * rows_per_band + 1, rows_per_band) == F.slice(
            "s2", j * rows_per_band + 1, rows_per_band
        )
        share_band = eq if share_band is None else (share_band | eq)
    n_match = F.size(F.filter(F.zip_with("s1", "s2", lambda x, y: x == y), lambda m: m))
    est = F.col("n_match") * F.lit(1.0) / F.lit(float(num_hashes))
    return (
        cs.crossJoin(bs)  # test-scale model only; the probe never does this
        .filter(share_band)
        .withColumn("n_match", n_match)
        .withColumn("minhash_est", est)
        .filter(F.col("minhash_est") >= F.lit(threshold))
        .select("id1", "id2", "minhash_est")
        .orderBy("id1", "id2")
    )
