"""Streaming CDC-snapshot maintenance: latest event per key, carried in
state across micro-batches — the streaming twin of the batch inventory
query ``events_latest_by_user`` (window rank over the full history).

A changelog consumer can't re-rank history per batch; it keeps one row of
state per key (the current best (ts, event_id)) and upserts when a newer
event arrives.  ``applyInPandasWithState`` holds exactly that state;
state size is O(keys), independent of stream length.  Arrow-batched: the
per-batch reduction (sort_values + tail) is vectorized pandas per group,
not per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)

#: ts stored as epoch-micros so the state row is flat scalars (matches the
#: micros precision the catalog reads the nanos fixture at).
STATE_SCHEMA = StructType(
    [
        StructField("ts_us", LongType()),
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _update_latest(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    best = tuple(state.get) if state.exists else None
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        p = pdf.sort_values(["ts", "event_id"]).iloc[-1]
        cand = (
            int(p["ts"].value) // 1000,
            int(p["event_id"]),
            str(p["event_type"]),
            float(p["value"]),
        )
        if best is None or cand[:2] > best[:2]:
            best = cand
    state.update(best)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "event_id": [best[1]],
            "ts": [pd.Timestamp(best[0] * 1000)],
            "event_type": [best[2]],
            "value": [best[3]],
        }
    )


def latest_snapshot(events: DataFrame) -> DataFrame:
    """Per-key latest-event snapshot maintained incrementally; emits the
    key's current best row whenever a micro-batch touches the key (update
    mode), so the sink's last row per key IS the snapshot."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_latest,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
