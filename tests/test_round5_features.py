"""Round-5 feature-extraction unit tests: hashing trick, PMI
collocations, sampled-training oracles."""

from __future__ import annotations


def test_feature_hash_weights_are_signed_tfs(spark):
    from p6__mapreduce_spark.operators.features import feature_hash_vectors

    docs = spark.createDataFrame(
        [(1, "dog dog dog cat"), (2, "dog")], "doc_id long, text string"
    )
    out = feature_hash_vectors(docs, nbuckets=64).collect()
    by_doc: dict[int, dict[int, int]] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, {})[r.bucket] = r.weight
    # doc 2 has one token: exactly one bucket at weight +-1
    assert len(by_doc[2]) == 1
    (w2,) = by_doc[2].values()
    assert abs(w2) == 1
    # the same token hashes identically in both docs: doc 1 carries 3x
    # that weight in the same bucket (plus cat's bucket)
    (b2,) = by_doc[2].keys()
    assert by_doc[1][b2] == 3 * w2
    # total L1 mass is bounded by token count (collisions only cancel)
    assert sum(abs(w) for w in by_doc[1].values()) <= 4


def test_feature_hash_drops_cancelled_buckets(spark):
    from p6__mapreduce_spark.operators.features import feature_hash_vectors

    docs = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
    out = feature_hash_vectors(docs).collect()
    assert len(out) == 1 and abs(out[0].weight) == 1
    assert 0 <= out[0].bucket < 256


def test_ngram_pmi_hand_computed(spark):
    from p6__mapreduce_spark.operators.features import ngram_pmi

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b")], "doc_id long, text string"
    )
    out = {(r.w1, r.w2): r for r in ngram_pmi(docs, min_count=1, top_k=10).collect()}
    # bigrams: (a,b) x3, (b,a) x1; unigrams a=3, b=3, N=6
    ab, ba = out[("a", "b")], out[("b", "a")]
    assert (ab.c_xy, ab.c1, ab.c2) == (3, 3, 3)
    assert ab.lift_q6 == 2_000_000  # 3*6/(3*3) = 2.0
    assert ba.lift_q6 == 666_666  # floor(1*6/9 * 1e6)


def test_ngram_pmi_min_count_filters(spark):
    from p6__mapreduce_spark.operators.features import ngram_pmi

    docs = spark.createDataFrame(
        [(1, "x y x y x y"), (2, "p q")], "doc_id long, text string"
    )
    pairs = {(r.w1, r.w2) for r in ngram_pmi(docs, min_count=3, top_k=10).collect()}
    assert ("x", "y") in pairs  # seen 3x
    assert ("p", "q") not in pairs  # seen once


def test_sampled_training_oracles_match_duckdb(spark):
    """The sampled-training paths (kmeans/pq sample_mod=4) replay
    bit-for-bit in DuckDB — the 100 TB two-phase shape is itself
    oracle-exact, not just the full-corpus path."""
    import duckdb

    from p6__mapreduce_spark.similarity.kmeans import kmeans_lloyd, kmeans_oracle_sql
    from p6__mapreduce_spark.similarity.pq import pq_codes, pq_oracle_sql

    sf_dir = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    for sdf, osql in [
        (kmeans_lloyd(emb, k=8, iters=2, sample_mod=4), kmeans_oracle_sql(8, 2, sample_mod=4)),
        (pq_codes(emb, m=4, k=8, iters=2, sample_mod=4), pq_oracle_sql(4, 8, 2, 16, sample_mod=4)),
    ]:
        sp = sdf.toPandas()
        du = con.execute(osql).df()[list(sp.columns)]
        for c in sp.columns:
            du[c] = du[c].astype(sp[c].dtype)
        sp = sp.sort_values(list(sp.columns)).reset_index(drop=True)
        du = du.sort_values(list(sp.columns)).reset_index(drop=True)
        assert sp.equals(du)
