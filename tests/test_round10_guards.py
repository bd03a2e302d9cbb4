"""Round-10 guard pins.

1. EXPECTED_REGRESSIONS round stamps (r9 ADVICE #3): an entry
   adjudicates exactly one round-over-round comparison; one that
   outlives its landing round fails HERE until pruned, so a later real
   regression on the same query can never be silently "expected".
2. VARIANCE_BANDS sha pins (r9 verdict #5): a band is valid only for
   the byte-identical implementation it was derived on — editing the
   impl file fails this test until the band is re-derived or removed.
3. two_phase_rank adversarial orderings (r9 verdict #7): the
   distributed rank must equal the single-window model on pre-sorted,
   reverse-sorted, and single-hot-partition inputs — the layouts a
   range-partitioned rank could plausibly get wrong (degenerate
   sampled boundaries, all rows in one range).
"""

from __future__ import annotations

import glob
import os
import re

ROOT = os.path.join(os.path.dirname(__file__), "..")


def _latest_driver_round() -> int:
    latest = 0
    for path in glob.glob(os.path.join(ROOT, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if m:
            latest = max(latest, int(m.group(1)))
    return latest


def test_expected_regressions_entries_not_outlived():
    """Every ledger entry must stamp the CURRENT round (latest driver
    artifact + 1). The round after a plan replacement lands, its entry
    is stale — the new plan is the baseline — and must be pruned."""
    from bench import EXPECTED_REGRESSIONS

    current = _latest_driver_round() + 1
    stale = {
        n: e["round"] for n, e in EXPECTED_REGRESSIONS.items() if e["round"] != current
    }
    assert not stale, (
        f"EXPECTED_REGRESSIONS entries outlived their round (current r{current}): "
        f"{stale} — prune them; the replaced plan is the baseline now"
    )
    for e in EXPECTED_REGRESSIONS.values():
        assert isinstance(e["round"], int) and e["reason"]


def test_variance_bands_sha_pinned_to_current_impl():
    """A band derived on one implementation must not adjudicate a
    different one: the recorded sha12 must match the file on disk."""
    from bench import VARIANCE_BANDS, _impl_sha12

    for name, band in VARIANCE_BANDS.items():
        assert band["hi_s"] > 0 and band["reason"], name
        got = _impl_sha12(band["impl"])
        assert got == band["impl_sha12"], (
            f"{name}: impl {band['impl']} changed (sha {got} != pinned "
            f"{band['impl_sha12']}) — re-derive the variance band or remove it"
        )


def test_variance_band_ignored_when_impl_changes(tmp_path):
    """The bench-side check is the same sha compare: simulate an
    edited impl and assert the band would be ignored (mismatch)."""
    from bench import VARIANCE_BANDS, _impl_sha12

    band = VARIANCE_BANDS["dedup_kcore"]
    src = open(os.path.join(ROOT, band["impl"])).read()
    edited = tmp_path / "kcore.py"
    edited.write_text(src + "\n# edited\n")
    # _impl_sha12 resolves relative to the repo root, so hash directly
    import hashlib

    sha = hashlib.sha256(edited.read_bytes()).hexdigest()[:12]
    assert sha != band["impl_sha12"]
    assert _impl_sha12(band["impl"]) == band["impl_sha12"]


def _rank_model(rows: list[tuple]) -> dict:
    """Single-process model: rank by (v, k) — the window semantics."""
    return {k: i + 1 for i, (v, k) in enumerate(sorted(rows))}


def test_two_phase_rank_adversarial_orderings(spark):
    """Pre-sorted, reverse-sorted, and single-hot-partition layouts all
    reproduce the window model exactly (r9 verdict #7: the
    vocab_growth_curve rewrite made two_phase_rank the registry's
    distributed-ranking template — pin it under the orderings where
    sampled range boundaries are degenerate)."""
    from p6__mapreduce_spark.functions.ranks import two_phase_rank

    rows = [(i * 7 % 101, f"k{i:03d}") for i in range(200)]
    want = _rank_model(rows)

    layouts = {
        "pre_sorted": sorted(rows),
        "reverse_sorted": sorted(rows, reverse=True),
    }
    for name, data in layouts.items():
        df = spark.createDataFrame(data, "v long, k string").repartition(8)
        got = {
            r.k: r.rk
            for r in two_phase_rank(
                df, ["v", "k"], rank_col="rk", check_unique=True
            ).collect()
        }
        assert got == want, name

    # single hot partition: every row lands in ONE input partition
    # (repartition on a constant), so the sampler sees one partition
    # and the boundary list may be empty/degenerate
    from pyspark.sql import functions as F

    df = (
        spark.createDataFrame(rows, "v long, k string")
        .withColumn("c", F.lit(1))
        .repartition(8, "c")
        .drop("c")
    )
    got = {
        r.k: r.rk
        for r in two_phase_rank(df, ["v", "k"], rank_col="rk", check_unique=True).collect()
    }
    assert got == want

    # grouped variant under the hot layout: per-group ranks also match
    grows = [(i % 3, i * 13 % 97, f"k{i:03d}") for i in range(150)]
    gmodel: dict = {}
    for g in (0, 1, 2):
        sub = sorted((v, k) for gg, v, k in grows if gg == g)
        gmodel.update({k: i + 1 for i, (v, k) in enumerate(sub)})
    gdf = (
        spark.createDataFrame(grows, "g long, v long, k string")
        .withColumn("c", F.lit(1))
        .repartition(8, "c")
        .drop("c")
    )
    got_g = {
        r.k: r.rk
        for r in two_phase_rank(
            gdf, ["v", "k"], group_cols=["g"], rank_col="rk", check_unique=True
        ).collect()
    }
    assert got_g == gmodel
