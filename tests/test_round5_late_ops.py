"""Round-5 closing-batch unit tests: rolling 7-day actives, TF-IDF
cosine kNN, foreachBatch idempotent upsert."""

from __future__ import annotations

import datetime as dt

import pytest


def _events(spark, rows):
    """rows: (event_id, user_id, day, event_type, value)."""
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, d, 10, 0), u, t, float(v))
            for (i, u, d, t, v) in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def test_rolling_7d_window_counts(spark):
    import p6__mapreduce_spark.queries as qmod
    from p6__mapreduce_spark.queries import q_rolling_7d_active_users

    # users: u1 on day1, u2 on day5, u1 again on day9
    # day1: wau {u1}; day5: wau {u1,u2}; day9: wau {u2,u1} (day5 within 7d of day9? 9-5=4 <=6 yes)
    ev = _events(
        spark,
        [(0, 1, 1, "view", 1), (1, 2, 5, "view", 1), (2, 1, 9, "view", 1)],
    )
    orig = qmod.load_table
    qmod.load_table = lambda s, d, n: ev
    try:
        got = {r.day.day: r for r in q_rolling_7d_active_users(spark, "x").collect()}
    finally:
        qmod.load_table = orig
    assert (got[1].dau, got[1].wau) == (1, 1)
    assert (got[5].dau, got[5].wau) == (1, 2)
    assert (got[9].dau, got[9].wau) == (1, 2)


def test_rolling_7d_excludes_past_window(spark):
    import p6__mapreduce_spark.queries as qmod
    from p6__mapreduce_spark.queries import q_rolling_7d_active_users

    # u1 on day1 is OUTSIDE day8's trailing window (8-1=7 > 6)
    ev = _events(spark, [(0, 1, 1, "view", 1), (1, 2, 8, "view", 1)])
    orig = qmod.load_table
    qmod.load_table = lambda s, d, n: ev
    try:
        got = {r.day.day: r for r in q_rolling_7d_active_users(spark, "x").collect()}
    finally:
        qmod.load_table = orig
    assert got[8].wau == 1


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for (i, t) in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_tfidf_cosine_identical_docs_score_one(spark):
    from p6__mapreduce_spark.operators.ranking import tfidf_cosine_topk

    docs = _docs(
        spark,
        [(0, "apple banana cherry"), (1, "apple banana cherry"), (2, "dog elephant fox")],
    )
    got = tfidf_cosine_topk(docs, k=2, max_df=10).collect()
    by_anchor = {}
    for r in got:
        by_anchor.setdefault(r.doc_a, []).append(r)
    assert by_anchor[0][0].doc_b == 1
    assert by_anchor[0][0].cos_sim == pytest.approx(1.0)
    # doc 2 shares no token with anyone -> no candidate rows at all
    assert 2 not in by_anchor


def test_tfidf_cosine_df_cap_drops_stopwords(spark):
    from p6__mapreduce_spark.operators.ranking import tfidf_cosine_topk

    # 'the' appears in all 3 docs; with max_df=2 it can't generate
    # candidates, so docs sharing ONLY 'the' never pair
    docs = _docs(spark, [(0, "the apple"), (1, "the banana"), (2, "the apple pie")])
    got = tfidf_cosine_topk(docs, k=3, max_df=2).collect()
    pairs = {(r.doc_a, r.doc_b) for r in got}
    assert (0, 1) not in pairs and (1, 0) not in pairs
    assert (0, 2) in pairs and (2, 0) in pairs


def test_tfidf_cosine_rank_order_and_k(spark):
    from p6__mapreduce_spark.operators.ranking import tfidf_cosine_topk

    docs = _docs(
        spark,
        [
            (0, "a b c d"),
            (1, "a b c z"),   # 3 shared rare tokens with 0
            (2, "a y x w"),   # 1 shared token with 0
            (3, "q r s t"),
        ],
    )
    got = [r for r in tfidf_cosine_topk(docs, k=1, max_df=10).collect() if r.doc_a == 0]
    assert len(got) == 1 and got[0].doc_b == 1 and got[0].rank == 1


def test_foreachbatch_upsert_keeps_latest_and_survives_replay(spark, tmp_path):
    from p6__mapreduce_spark.streaming.idempotent import (
        run_foreachbatch_idempotent_upsert,
    )

    ev = _events(
        spark,
        [
            (0, 1, 1, "view", 10),
            (1, 1, 2, "view", 20),  # later ts wins
            (2, 1, 1, "buy", 5),
            (3, 2, 1, "view", 7),
        ],
    )
    p = str(tmp_path / "ev.parquet")
    ev.coalesce(1).write.mode("overwrite").parquet(p)
    import glob as _glob

    part = _glob.glob(p + "/part-*.parquet")[0]
    got = run_foreachbatch_idempotent_upsert(spark, part).collect()
    m = {(r.user_id, r.event_type): r.value for r in got}
    # the runner itself asserts replay-idempotence; here we check the fold
    assert m[(1, "view")] == 20.0
    assert m[(1, "buy")] == 5.0
    assert m[(2, "view")] == 7.0
    assert len(got) == 3
