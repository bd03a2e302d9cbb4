"""Sinks.

The reference's only sink is lines printed to stdout by the Reducer
(``wordcount.c:39``, ``sort.c:27``). ``collect_lines`` reproduces that
(driver-side, test/demo use only — never on the 100 TB path);
``write_parquet`` is the engine's real distributed sink.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def collect_lines(df: DataFrame, sep: str = " ") -> list[str]:
    """Render each row as a space-joined text line (reference stdout shape).

    Driver-side materialization — only for golden-file tests at test
    scale, mirroring how the reference's stdout was diffed against
    ``tests/*.out``.
    """
    return [sep.join("" if v is None else str(v) for v in row) for row in df.collect()]


def write_parquet(df: DataFrame, path: str, *, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_parquet_observed(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    null_check_cols: list[str] | None = None,
) -> dict:
    """Write parquet AND collect QA counters from the SAME job via
    ``df.observe`` — at 100 TB the alternative (a second count/isNull
    scan to validate what was just written) doubles the pipeline's
    dominant cost. Returns {'row_count': n, 'nulls_<col>': n, ...},
    the numbers a pipeline gate checks before publishing a snapshot
    (compose with ``publish_parquet_atomic`` for gate-then-publish).

    Observation metrics are accumulator-style aggregates attached to
    the plan: they ride the write job's tasks, add no shuffle and no
    extra scan, and are exact (not sampled)."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    aggs = [F.count(F.lit(1)).alias("row_count")]
    for c in null_check_cols or []:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}"))
    obs = Observation()
    observed = df.observe(obs, *aggs)
    writer = observed.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return dict(obs.get)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    num_buckets: int = 32,
    *,
    sort_key: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: later equi-joins/aggregations on
    ``bucket_key`` between tables with matching bucketing read
    co-located buckets and skip the shuffle entirely — the 100 TB
    answer to repeated joins on the same key (pay the shuffle once at
    write time, never again at read time).
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_key)
    if sort_key:
        writer = writer.sortBy(sort_key)
    writer.saveAsTable(table)


def write_orc(df: DataFrame, path: str, *, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    """ORC sink (Spark-native, no extra jars) — same partitioned-layout
    semantics as ``write_parquet`` for ORC-consuming downstreams."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def publish_parquet_atomic(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str] | None = None,
    keep_versions: int = 2,
) -> str | None:
    """All-or-nothing batch publish: write to a fresh version directory
    under ``<path>.versions/``, then repoint ``path`` (a symlink) at it
    with a SINGLE ``rename(2)``.

    Because the swap is one atomic rename of a symlink, a reader of
    ``path`` at any instant resolves either the complete previous
    version or the complete new one — there is no window where the
    target is missing or partial (the two-rename dir swap this
    replaced had exactly that window). Crash recovery is equally
    simple: a job that dies before the swap leaves ``path`` untouched
    and only an orphan version directory, which the next successful
    publish garbage-collects; re-running the job is idempotent. On
    object stores (no rename) use a manifest/lakehouse format instead
    — see ``lakehouse.read_table_format``. This is the poor-man's
    transactional commit underlying every lakehouse format's v0.

    The newest ``keep_versions`` versions are retained (so the
    returned previous-version path stays readable for rollback);
    older ones are deleted. Returns the previous version's directory,
    or ``None`` on first publish.
    """
    import shutil

    versions_root = path + ".versions"
    os.makedirs(versions_root, exist_ok=True)

    def _versions() -> list[int]:
        return sorted(
            int(d[1:])
            for d in os.listdir(versions_root)
            if d.startswith("v") and d[1:].isdigit()
        )

    current_real = os.path.realpath(path) if os.path.islink(path) else None
    # any version dir NEWER than the one the symlink points at is an
    # orphan from a dead/failed run (publishes are serialized): remove
    # them so they neither get counted as versions nor shift GC
    current_v = -1
    if current_real and os.path.dirname(current_real) == os.path.abspath(versions_root):
        base = os.path.basename(current_real)
        if base.startswith("v") and base[1:].isdigit():
            current_v = int(base[1:])
    for v in _versions():
        if v > current_v:
            shutil.rmtree(os.path.join(versions_root, f"v{v}"), ignore_errors=True)
    existing = _versions()
    target = os.path.join(versions_root, f"v{(existing[-1] + 1) if existing else 1}")
    writer = df.write.mode("errorifexists")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(target)
    # migrate a legacy plain-directory layout once (not atomic, but
    # only ever taken for pre-versioning datasets)
    if os.path.exists(path) and not os.path.islink(path):
        current_real = os.path.join(versions_root, "v0")
        os.rename(path, current_real)
    # the atomic swap: build the new link aside, rename over `path`
    tmp_link = path + ".link.tmp"
    if os.path.lexists(tmp_link):
        os.remove(tmp_link)
    os.symlink(os.path.abspath(target), tmp_link)
    os.replace(tmp_link, path)
    # GC everything older than the newest keep_versions
    survivors = sorted(
        int(d[1:])
        for d in os.listdir(versions_root)
        if d.startswith("v") and d[1:].isdigit()
    )[:-max(keep_versions, 1)]
    for v in survivors:
        shutil.rmtree(os.path.join(versions_root, f"v{v}"), ignore_errors=True)
    return current_real


def published_versions(path: str) -> list[int]:
    """Retained version numbers of an atomic-publish dataset, oldest
    first ([] for a never-published path)."""
    versions_root = path + ".versions"
    if not os.path.isdir(versions_root):
        return []
    return sorted(
        int(d[1:])
        for d in os.listdir(versions_root)
        if d.startswith("v") and d[1:].isdigit()
    )


def read_published(spark, path: str, *, version: int | None = None) -> "DataFrame":
    """Time-travel read over the atomic-publish history: the live
    symlink by default, or any retained ``version`` — the rollback /
    reproduce-yesterday's-training-set read path that completes
    ``publish_parquet_atomic`` (lakehouse time travel's v0, bounded by
    ``keep_versions``). Raises with the retained list if the asked-for
    version was already garbage-collected."""
    if version is None:
        return spark.read.parquet(path)
    have = published_versions(path)
    if version not in have:
        raise ValueError(
            f"version {version} not retained for {path}; available: {have}"
        )
    return spark.read.parquet(os.path.join(path + ".versions", f"v{version}"))
