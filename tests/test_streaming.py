"""Structured Streaming: the streaming windowed aggregation must agree
with its batch twin once all input is processed."""

from __future__ import annotations

from pyspark.sql import functions as F

from p6__mapreduce_spark.sources.readers import load_table
from p6__mapreduce_spark.streaming.windows import stream_event_counts, windowed_event_counts

SF = "/root/testdata/sf0.001"


def test_stream_matches_batch(spark, tmp_path):
    events = load_table(spark, SF, "events")
    src = str(tmp_path / "stream_src")
    events.write.parquet(src)

    batch = {
        (r.window_start, r.event_type): (r.cnt, r.value_cents)
        for r in windowed_event_counts(events, minutes=5).collect()
    }

    stream_input = spark.read.parquet(src)
    q = stream_event_counts(
        spark, src, stream_input.schema, minutes=5, query_name="t_stream"
    )
    try:
        q.processAllAvailable()
        got = {
            (r.window_start, r.event_type): (r.cnt, r.value_cents)
            for r in spark.sql("SELECT * FROM t_stream").collect()
        }
    finally:
        q.stop()
    assert got == batch
    assert len(got) > 100


def test_stateful_running_totals(spark, tmp_path):
    from p6__mapreduce_spark.streaming.stateful import user_running_totals

    events = load_table(spark, SF, "events")
    src = str(tmp_path / "state_src")
    events.write.parquet(src)

    from pyspark.sql import functions as F

    batch_want = {
        (r.user_id, r.n, r.cents)
        for r in events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
        .collect()
    }

    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = (
        user_running_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_state")
        .start()
    )
    try:
        q.processAllAvailable()
        # update mode: keep the LAST row per user (running totals grow)
        rows = spark.sql(
            "SELECT user_id, max(n_events) AS n, max(value_cents_total) AS cents "
            "FROM t_state GROUP BY user_id"
        ).collect()
        got = {(r.user_id, r.n, r.cents) for r in rows}
    finally:
        q.stop()
    assert got == batch_want


def test_foreach_batch_parquet_sink(spark, tmp_path):
    # the production sink path (SCALE.md): each micro-batch lands in a
    # partitioned parquet table via foreachBatch; after the run, the
    # sink equals the batch input exactly — no lost or duplicated rows
    events = load_table(spark, SF, "events").select("event_id", "user_id", "event_type")
    src = str(tmp_path / "fb_src")
    out = str(tmp_path / "fb_sink")
    # two files -> two micro-batches, so append semantics are exercised
    events.filter("event_id % 2 = 0").coalesce(1).write.mode("append").parquet(src)
    events.filter("event_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)

    batch_ids = []

    def sink(df, batch_id):
        batch_ids.append(batch_id)
        df.write.mode("append").partitionBy("event_type").parquet(out)

    q = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(batch_ids) >= 2  # genuinely ran as multiple micro-batches
    got = spark.read.parquet(out).select("event_id").collect()
    want = events.select("event_id").collect()
    assert sorted(r.event_id for r in got) == sorted(r.event_id for r in want)


def test_left_outer_stream_join_emits_unmatched_clicks(spark):
    from p6__mapreduce_spark.streaming.join import (
        run_streaming_click_purchase_left_join,
    )

    out = run_streaming_click_purchase_left_join(spark, SF).collect()
    # batch twin: LEFT JOIN with the same interval condition
    events = load_table(spark, SF, "events")
    c = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("cts")
    )
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
    )
    batch = c.join(
        p,
        (F.col("user_id") == F.col("pu"))
        & (F.col("pts") >= F.col("cts"))
        & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 6 HOURS")),
        "left",
    ).select("user_id", "click_id", "purchase_id").collect()
    got = {(r.user_id, r.click_id, r.purchase_id) for r in out}
    want = {(r.user_id, r.click_id, r.purchase_id) for r in batch}
    assert got == want
    # the point of OUTER: some clicks really are unmatched (null-padded)
    assert any(r.purchase_id is None for r in out)
    # and no sentinel leaked
    assert all(r.click_id >= 0 for r in out)


def test_streaming_checkpoint_resume_exactly_once(spark):
    """Kill a streaming query between micro-batches, restart it from
    its checkpoint, and the file sink still holds every input row
    exactly once — the recovery contract a production pipeline relies
    on (offsets + sink commit log, not at-least-once reprocessing)."""
    import shutil
    import tempfile

    events = load_table(spark, SF, "events").select("event_id", "user_id", "ts")
    n_total = events.count()
    mid = events.approxQuantile("event_id", [0.5], 0)[0]

    root = tempfile.mkdtemp(prefix="p6_chk_resume_")
    src, out, chk = (f"{root}/{d}" for d in ("src", "out", "chk"))
    try:
        def stage(df, name):
            part = f"{root}/_stage_{name}"
            df.coalesce(1).write.mode("overwrite").parquet(part)
            import os

            os.makedirs(src, exist_ok=True)
            data = next(
                f for f in os.listdir(part) if f.endswith(".parquet") and not f.startswith("_")
            )
            os.rename(f"{part}/{data}", f"{src}/{name}.parquet")
            shutil.rmtree(part)

        def run_once():
            q = (
                spark.readStream.schema(events.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", chk)
                .outputMode("append")
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()

        stage(events.filter(F.col("event_id") <= mid), "batch_0")
        run_once()  # first half processed, query then "crashes" (stop)
        first = spark.read.parquet(out).count()
        assert 0 < first < n_total

        stage(events.filter(F.col("event_id") > mid), "batch_1")
        run_once()  # restart from checkpoint: only the new file runs

        got = spark.read.parquet(out)
        assert got.count() == n_total  # no duplicates, no gaps
        assert got.select("event_id").distinct().count() == n_total
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_stream_static_join_enriches_each_microbatch(spark):
    """Stream-static join: a static dimension (per-user first-seen
    profile) joins into every micro-batch of the event stream — the
    enrichment pattern where the dim is re-resolvable per batch. The
    streamed result equals the batch join."""
    events = load_table(spark, SF, "events").select("event_id", "user_id", "ts")
    static_profile = (
        events.groupBy("user_id").agg(F.min("ts").alias("first_seen"))
    )

    import shutil
    import tempfile

    src = tempfile.mkdtemp(prefix="p6_ss_join_")
    try:
        events.filter("event_id % 2 = 0").coalesce(1).write.mode("append").parquet(src)
        events.filter("event_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        enriched = stream.join(static_profile, "user_id").select(
            "event_id",
            "user_id",
            (F.unix_micros("ts") - F.unix_micros("first_seen")).alias("age_us"),
        )
        name = "t_ss_join"
        q = (
            enriched.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {(r.event_id, r.user_id, r.age_us) for r in spark.table(name).collect()}
        want = {
            (r.event_id, r.user_id, r.age_us)
            for r in events.join(static_profile, "user_id")
            .select(
                "event_id",
                "user_id",
                (F.unix_micros("ts") - F.unix_micros("first_seen")).alias("age_us"),
            )
            .collect()
        }
        assert got == want and len(got) > 100
        assert min(r[2] for r in got) == 0  # each user's first event has age 0
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_rocksdb_state_store_matches_default(spark):
    """The at-scale state backend: re-run the streaming windowed
    aggregation with the RocksDB state store provider (what a 100 TB
    deployment uses so state spills off-heap to local disk instead of
    living in executor memory) and require identical results."""
    events = load_table(spark, SF, "events")
    batch = {
        (r.window_start, r.event_type): (r.cnt, r.value_cents)
        for r in windowed_event_counts(events, minutes=5).collect()
    }

    import shutil
    import tempfile

    src = tempfile.mkdtemp(prefix="p6_rocks_src_")
    key = "spark.sql.streaming.stateStore.providerClass"
    saved = spark.conf.get(key)
    try:
        events.write.mode("overwrite").parquet(src)
        spark.conf.set(
            key,
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        q = stream_event_counts(
            spark, src, spark.read.parquet(src).schema, minutes=5, query_name="t_rocks"
        )
        try:
            q.processAllAvailable()
            got = {
                (r.window_start, r.event_type): (r.cnt, r.value_cents)
                for r in spark.sql("SELECT * FROM t_rocks").collect()
            }
        finally:
            q.stop()
        assert got == batch and len(got) > 100
    finally:
        spark.conf.set(key, saved)
        shutil.rmtree(src, ignore_errors=True)


def test_transform_with_state_running_counts(spark):
    """Spark 4's transformWithStateInPandas — the successor API to
    applyInPandasWithState (typed state variables, timers, RocksDB-only
    backend). Pin it end-to-end: per-user running counts across two
    forced micro-batches must equal the batch GROUP BY.

    Capability gate: the API's driver-side schema worker imports
    google.protobuf, which this container ships broken (no pip
    installs allowed) — skip with the real reason rather than
    pretending coverage. applyInPandasWithState (same semantics, no
    protobuf dependency) is the oracle-checked path
    (stateful_running_totals)."""
    import shutil
    import tempfile

    import pytest

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip(
            "transformWithState needs google.protobuf (broken in this "
            "container); applyInPandasWithState covers arbitrary "
            "stateful streaming on the oracle-checked path"
        )

    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningCount(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.count = handle.getValueState("count", "cnt long")

        def handleInputRows(self, key, rows, timerValues):
            n = sum(len(pdf) for pdf in rows)
            prev = self.count.get()
            total = (prev[0] if prev else 0) + n
            self.count.update((total,))
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [total]})

        def close(self) -> None:
            pass

    events = load_table(spark, SF, "events").select("event_id", "user_id")
    want = {
        (r.user_id, r.n): None
        for r in events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }

    src = tempfile.mkdtemp(prefix="p6_tws_")
    key = "spark.sql.streaming.stateStore.providerClass"
    saved = spark.conf.get(key)
    try:
        events.filter("event_id % 2 = 0").coalesce(1).write.mode("append").parquet(src)
        events.filter("event_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)
        spark.conf.set(
            key,
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out = stream.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=RunningCount(),
            outputStructType="user_id long, n_events long",
            outputMode="Update",
            timeMode="None",
        )
        q = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName("t_tws")
            .start()
        )
        try:
            q.processAllAvailable()
            got = {
                (r.user_id, r.n): None
                for r in spark.sql(
                    "SELECT user_id, MAX(n_events) AS n FROM t_tws GROUP BY user_id"
                ).collect()
            }
        finally:
            q.stop()
        assert got == want and len(got) > 50
    finally:
        spark.conf.set(key, saved)
        shutil.rmtree(src, ignore_errors=True)


def test_statestore_reader_matches_batch_aggregate(spark, tmp_path):
    # Spark-4 checkpoint forensics: the keyed state of a committed
    # streaming aggregation, read back as a DataFrame, must equal the
    # batch GROUP BY over the same input
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    events = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a"), (4, "a")], "id long, k string"
    )
    events.write.parquet(src)
    stream = spark.readStream.schema("id long, k string").parquet(src)
    q = (
        stream.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.format("memory")
        .queryName(f"t_state_{tmp_path.name}")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from p6__mapreduce_spark.streaming.inspect import read_query_state, state_key_counts

    state = {(r.key.k): r.value["count"] for r in read_query_state(spark, ckpt).collect()}
    batch = {r.k: r.n for r in events.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert state == batch == {"a": 3, "b": 1}
    # skew diagnostic: key counts per state partition sum to |keys|
    assert sum(r.n_keys for r in state_key_counts(spark, ckpt).collect()) == 2


def test_stream_static_enrichment_matches_batch_join(spark):
    events = spark.createDataFrame(
        [(1, 7, "click"), (2, 8, "view"), (3, 7, "view"), (4, 9, "click")],
        "event_id long, user_id long, event_type string",
    )
    dim = spark.createDataFrame(
        [(7, "gold"), (8, "free")], "user_id long, segment string"
    )
    from p6__mapreduce_spark.streaming.join import run_stream_static_enrichment

    got = {
        (r.event_id, r.segment)
        for r in run_stream_static_enrichment(spark, events, dim).collect()
    }
    want = {
        (r.event_id, r.segment)
        for r in events.join(dim, "user_id").select("event_id", "segment").collect()
    }
    # inner semantics: user 9 (no dim row) drops out; no state, no watermark
    assert got == want == {(1, "gold"), (3, "gold"), (2, "free")}


def test_streaming_session_merges_across_microbatches(spark, tmp_path):
    """A session straddling the forced batch split (events on both
    sides of the cutoff within one gap) must merge into ONE session in
    the state store, and the heartbeat must flush trailing sessions."""
    import datetime as dt

    from p6__mapreduce_spark.streaming.windows import run_streaming_session_windows

    t = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    rows = [
        # user 1: 3 events bridging the 2024-01-16 cutoff, gaps < 30min
        (1, 1, t("2024-01-15T23:50:00")),
        (2, 1, t("2024-01-16T00:05:00")),
        (3, 1, t("2024-01-16T00:20:00")),
        # user 1 later, separate session (gap > 30min)
        (4, 1, t("2024-01-16T02:00:00")),
        # user 2: single-event trailing session (flushed only by the
        # heartbeat — nothing else advances the watermark past it)
        (5, 2, t("2024-01-20T12:00:00")),
    ]
    src = str(tmp_path / "events.parquet")
    spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp"
    ).coalesce(1).write.parquet(src)
    # the file-source runner expects a single parquet FILE path
    import os

    data = next(
        f for f in os.listdir(src) if f.endswith(".parquet") and not f.startswith("_")
    )
    out = run_streaming_session_windows(spark, os.path.join(src, data)).collect()
    got = {(r.user_id, r.session_start): (r.session_end, r.n_events) for r in out}
    s = int(t("2024-01-15T23:50:00").timestamp())
    assert got[(1, s)] == (int(t("2024-01-16T00:20:00").timestamp()) + 1800, 3)
    s2 = int(t("2024-01-16T02:00:00").timestamp())
    assert got[(1, s2)] == (s2 + 1800, 1)
    s3 = int(t("2024-01-20T12:00:00").timestamp())
    assert got[(2, s3)] == (s3 + 1800, 1)
    assert len(got) == 3  # sentinel filtered out


def test_full_outer_stream_join_includes_orphans_both_sides(spark, tmp_path):
    """FULL OUTER stream-stream join == batch FULL JOIN: matched pairs,
    unattributed clicks, and orphan purchases all present."""
    import datetime as dt

    from p6__mapreduce_spark.streaming.join import (
        run_streaming_click_purchase_full_join,
    )

    base = dt.datetime(2024, 1, 1, 12, 0)
    rows = [
        # u1: click then purchase within 6h -> matched pair
        (0, base, 1, "click", 1.0),
        (1, base + dt.timedelta(hours=1), 1, "purchase", 1.0),
        # u2: click with no purchase -> null-padded click
        (2, base, 2, "click", 1.0),
        # u3: purchase with no click -> null-padded purchase
        (3, base, 3, "purchase", 1.0),
        # u4: purchase 7h after click -> BOTH sides orphan
        (4, base, 4, "click", 1.0),
        (5, base + dt.timedelta(hours=7), 4, "purchase", 1.0),
    ]
    ev = spark.createDataFrame(
        [(i, ts, u, t, v) for (i, ts, u, t, v) in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    sf = str(tmp_path)
    ev.write.mode("overwrite").parquet(f"{sf}/events.parquet")
    got = run_streaming_click_purchase_full_join(spark, sf).collect()
    pairs = {(r.click_id, r.purchase_id) for r in got}
    assert (0, 1) in pairs          # matched
    assert (2, None) in pairs       # unattributed click
    assert (None, 3) in pairs       # orphan purchase
    assert (4, None) in pairs and (None, 5) in pairs  # out-of-gap pair
    assert len(got) == 5
    # orphan purchases keep their user via the coalesce
    u = {r.purchase_id: r.user_id for r in got if r.click_id is None}
    assert u == {3: 3, 5: 4}
