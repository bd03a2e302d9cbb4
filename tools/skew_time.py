#!/usr/bin/env python3
"""Hot-key skew timing probe (r9 verdict #2, the fourth degenerate
regime).

Times the window-partitioned and groupBy/join-heavy query families on
the uniform sf dir and its skewed twin (tools/skew_gen.py: one key
holds ~50% of events/lineitem/orders rows) in ONE session, uniform
first, and reports the per-query ratio. A ratio is judged on the
STEADY basis: any query whose cold ratio exceeds the flag threshold is
re-run once on both dirs (first execution carries 1-1.5 s of one-time
codegen that false-flags sub-2 s queries — the bench.py recheck
discipline).

Output: one JSON line with {query: {uniform, skew, ratio, [steady_*]}}
plus a FLAGGED list (steady ratio > 3x and absolute delta > 0.5 s —
the r9 verdict's adjudication bar).

Usage: python tools/skew_time.py [uniform_dir] [skew_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Per-user / per-key window sorts: the hot user's rows all land in one
# window partition — the layout where a per-key sort degrades worst.
WINDOW_FAMILY = [
    "user_sessions",
    "event_span_per_user",
    "user_value_sliding_avg",
    "user_value_trailing_1h",
    "time_decayed_user_value",
    "running_value_since_purchase",
    "mode_event_type_per_user",
    "top_event_paths",
    "session_funnel",
    "multi_touch_attribution",
    "position_attribution",
    "scd2_user_state",
    "rolling_7d_active_users",
    "asof_last_signup",
]

# Shuffle-on-key aggregations and joins where one key carries half the
# probe side; includes the salted exemplar and the AQE skew-join path.
GROUPBY_JOIN_FAMILY = [
    "skewed_event_value_salted",
    "top_orders_per_customer",
    "customer_order_stats",
    "tpch_q13_custdist",
    "tpch_q17_small_quantity",
    "tpch_q18_large_volume",
    "tpch_q21_waiting_supplier",
    "tpch_q10_returned",
    "tpch_q5_local_supplier",
    "revenue_by_nation",
    "basket_part_pairs",
    "weighted_median_price",
    "median_price_by_priority",
    "user_event_type_sets",
]

FLAG_RATIO = 3.0
FLAG_ABS_S = 0.5


def main() -> None:
    uniform = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    skew = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_skew"

    from p6__mapreduce_spark.queries import QUERIES
    from p6__mapreduce_spark.session import get_session

    spark = get_session("skew-probe")
    names = WINDOW_FAMILY + GROUPBY_JOIN_FAMILY
    out: dict[str, dict] = {}

    def run(name: str, sf_dir: str) -> float:
        t0 = time.time()
        QUERIES[name](spark, sf_dir).count()
        took = round(time.time() - t0, 3)
        spark.catalog.clearCache()
        return took

    for name in names:
        tu = run(name, uniform)
        tsk = run(name, skew)
        out[name] = {"uniform": tu, "skew": tsk, "ratio": round(tsk / max(tu, 1e-9), 2)}
        print(f"{name}: uniform {tu}s  skew {tsk}s  ratio {out[name]['ratio']}x", flush=True)

    flagged = []
    for name, e in out.items():
        if e["ratio"] > FLAG_RATIO and e["skew"] - e["uniform"] > FLAG_ABS_S:
            # steady re-run on both dirs: strip first-run codegen noise
            e["steady_uniform"] = run(name, uniform)
            e["steady_skew"] = run(name, skew)
            e["steady_ratio"] = round(e["steady_skew"] / max(e["steady_uniform"], 1e-9), 2)
            print(
                f"recheck {name}: steady uniform {e['steady_uniform']}s "
                f"skew {e['steady_skew']}s ratio {e['steady_ratio']}x",
                flush=True,
            )
            if e["steady_ratio"] > FLAG_RATIO and e["steady_skew"] - e["steady_uniform"] > FLAG_ABS_S:
                flagged.append(name)

    print(json.dumps({"queries": out, "flagged": flagged, "uniform_dir": uniform, "skew_dir": skew}))


if __name__ == "__main__":
    main()
