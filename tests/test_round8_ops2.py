"""Round-8 batch, part 2: KMV/theta audience-overlap sketch and the
dropDuplicatesWithinWatermark (state-TTL streaming dedup) pin."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_kmv_overlap_small_groups_exact(spark):
    """Constructed partial overlaps, all groups < K: the sketch holds
    every member, so estimates equal exact counts and the pairwise
    intersection is exactly the set intersection."""
    from p6__mapreduce_spark.operators.kmv import kmv_audience_overlap

    rows = []
    # A: users 0..99; B: users 50..149 (|A&B| = 50); C: users 200..209
    for u in range(100):
        rows.append((u, "2024-01-01 00:00:01", u, "a_click", 1.0))
    for u in range(50, 150):
        rows.append((1000 + u, "2024-01-01 00:00:02", u, "b_view", 1.0))
    for u in range(200, 210):
        rows.append((2000 + u, "2024-01-01 00:00:03", u, "c_buy", 1.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    )
    got = {(r.type_a, r.type_b): r for r in kmv_audience_overlap(df).collect()}
    ab = got[("a_click", "b_view")]
    assert ab.k_a == 100 and ab.k_b == 100
    assert ab.n_inter_sketch == 50 and ab.exact_overlap == 50
    assert ab.est_a == 100.0 and ab.est_overlap == 50.0
    ac = got[("a_click", "c_buy")]
    assert ac.exact_overlap == 0 and ac.n_inter_sketch == 0 and ac.est_overlap == 0.0
    assert len(got) == 3  # ordered pairs of 3 groups


def test_kmv_overlap_estimation_branch_accuracy(spark):
    """sf0.1 events: every type has ~1500 users (> K=256), so the
    threshold-scaled estimator runs; assert within 10% of exact (the
    ~1/sqrt(K) envelope; realized ~1.5%)."""
    from p6__mapreduce_spark.operators.kmv import kmv_audience_overlap
    from p6__mapreduce_spark.sources.readers import load_table

    ev = load_table(spark, "/root/testdata/sf0.1", "events")
    rows = kmv_audience_overlap(ev).collect()
    assert len(rows) == 10  # 5 choose 2
    for r in rows:
        assert r.k_a == 256 and r.k_b == 256  # estimator branch engaged
        assert abs(r.est_overlap - r.exact_overlap) <= 0.10 * max(r.exact_overlap, 1)


def test_streaming_dedup_ttl_matches_batch_distinct(spark, tmp_path):
    """dropDuplicatesWithinWatermark: duplicates arriving across
    forced micro-batches inside the watermark delay are dropped —
    output equals batch DISTINCT — and the progress shows the
    dedupeWithinWatermark state operator with a nonzero watermark."""
    from p6__mapreduce_spark.sources.readers import load_table
    from p6__mapreduce_spark.streaming.dedup import run_streaming_dedup_ttl

    part = str(tmp_path / "ev.parquet")
    load_table(spark, "/root/testdata/sf0.001", "events").limit(300).coalesce(
        1
    ).write.mode("overwrite").parquet(part)
    files = [f for f in os.listdir(part) if f.endswith(".parquet")]
    one = os.path.join(part, files[0])

    out = run_streaming_dedup_ttl(spark, one, keys=("event_id",))
    got = [(r.event_id,) for r in out.collect()]
    want = [
        (r.event_id,)
        for r in spark.read.parquet(one)
        .select("event_id")
        .distinct()
        .orderBy("event_id")
        .collect()
    ]
    assert got == want and len(got) > 0
    prog = out._ttl_progress
    ops = [o["operatorName"] for o in prog["stateOperators"]]
    assert "dedupeWithinWatermark" in ops
    # the TTL machinery is live: state rows bounded by distinct keys
    st = prog["stateOperators"][ops.index("dedupeWithinWatermark")]
    assert 0 < st["numRowsTotal"] <= len(want)
