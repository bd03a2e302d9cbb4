"""Custom stateful streaming operator: per-user running counters via
``applyInPandasWithState``.

This is the escape hatch for stream logic the built-in windowed
aggregates can't express (per-key accumulators with arbitrary update
rules). State is partitioned by the grouping key — each executor holds
only its keys' state, so state scales horizontally; a timeout policy
(not used in this running-total example) would bound it in time.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("value_cents_total", LongType()),
    ]
)
STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("cents", LongType())]
)


def _update(key, batches: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    n, cents = state.get if state.exists else (0, 0)
    for pdf in batches:
        n += len(pdf)
        cents += int(round(pdf["value"].astype(float).mul(100).round().sum()))
    state.update((n, cents))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "value_cents_total": [cents]})


def user_running_totals(stream_events):
    """events stream -> one updated (user_id, n_events, cents_total) row
    per user per micro-batch."""
    return stream_events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
