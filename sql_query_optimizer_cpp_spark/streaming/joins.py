"""Stream-stream interval join: click->purchase attribution pairs.

The reference has no streaming at all (SURVEY.md §2.8); this is the
Structured-Streaming-native join surface: two event streams joined on a
key plus an event-time range condition.  Spark buffers each side in join
state and uses the watermarks + the time-range bound to evict state, so
the join runs unbounded with bounded memory — the property that makes a
100 TB/day attribution pipeline feasible at all.

One builder serves batch and streaming (the batch twin is what the DuckDB
oracle grades via ``inventory.events.join_event_attribution``); when the
input is a stream, per-side watermarks are applied before the join as
Spark requires for state eviction in append mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Attribution lookback: a click converts if a purchase by the same user
#: follows within this many seconds.
LOOKBACK_S = 1800


def click_purchase_pairs(
    events: DataFrame, lookback_s: int = LOOKBACK_S, watermark: str = "1 hour"
) -> DataFrame:
    """(user_id, purchase_id, purchase_ts, click_id, click_ts, gap_s) pairs:
    every click by the same user in the half-open lookback window
    ``[purchase_ts - lookback, purchase_ts)`` before each purchase.

    Works on a batch frame or a stream (self-joining one stream is
    supported; each filtered side gets its own watermark).  The join is an
    equi-join on user_id with the range condition as a post-predicate —
    in streaming, the range bound is what lets Spark expire click state
    older than ``watermark + lookback``.
    """
    ts = F.col("ts").cast("timestamp")
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        ts.alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("event_id").alias("purchase_id"),
        ts.alias("purchase_ts"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", watermark)
        purchases = purchases.withWatermark("purchase_ts", watermark)
    gap = F.unix_micros(F.col("purchase_ts")) - F.unix_micros(F.col("click_ts"))
    return (
        purchases.join(
            clicks,
            (purchases["user_id"] == clicks["user_id"])
            & (clicks["click_ts"] < purchases["purchase_ts"])
            & (
                clicks["click_ts"]
                >= purchases["purchase_ts"] - F.expr(f"INTERVAL {lookback_s} SECOND")
            ),
        )
        .drop(clicks["user_id"])
        .select(
            "user_id",
            "purchase_id",
            "purchase_ts",
            "click_id",
            "click_ts",
            (gap / 1e6).alias("gap_s"),
        )
    )
