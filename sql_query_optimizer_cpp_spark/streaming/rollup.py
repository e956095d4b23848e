"""Streaming maintenance of the hypertable rollup (continuous aggregate).

The batch operator (``operators/rollup.py``) computes hour partials in one
pass; the streaming form maintains them *incrementally*: each micro-batch
contributes its own partial states, appended to a partials log, and the
current aggregate at any grain is a re-aggregation (compaction) of the
log.  This works because the partial states are exactly mergeable —
count/decimal-sum/min/max — the same property that lets coarse grains
derive from fine ones.

This is the parquet-append analog of a Delta ``MERGE``-maintained
continuous aggregate: appends are cheap and conflict-free (no
read-modify-write per batch), reads pay a compaction that is bounded by
``micro-batches x live buckets`` — and a periodic compaction job (just
``compact`` written back to the log) keeps that factor flat.  At
100 TB/day the log partitions by bucket date so compaction prunes to the
hot tail.

Sum state stays DECIMAL end-to-end: micro-batch boundaries re-order the
additions relative to batch execution, so a double accumulator would make
streamed-equals-batch flaky by construction (same reasoning as
``streaming/windows.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.rollup import grain_partials, reaggregate


def incremental_rollup_to_log(
    events_stream: DataFrame,
    log_path: str,
    checkpoint_path: str,
    ts_col: str = "ts",
    key_col: str = "event_type",
    val_col: str = "value",
    grain: str = "hour",
):
    """Start a foreachBatch sink appending each micro-batch's ``grain``
    partials to the parquet log.  Returns the StreamingQuery (caller
    drives it, e.g. ``processAllAvailable`` in tests)."""

    def _append(batch: DataFrame, epoch_id: int) -> None:
        # foreachBatch is AT-LEAST-ONCE: a crash between the parquet
        # write and the checkpoint commit replays the epoch, and a plain
        # append would then double-count those partials into the log
        # (silent corruption of the continuous aggregate).  Writing each
        # epoch to its own overwritten partition directory makes the
        # replay idempotent — the standard epoch_id-keyed sink pattern.
        (
            grain_partials(batch, ts_col, key_col, val_col, grain)
            .write.mode("overwrite")
            .parquet(f"{log_path}/epoch={epoch_id}")
        )

    return (
        events_stream.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )


def compact(
    spark: SparkSession, log_path: str, key_col: str = "event_type", grain: str = "hour"
) -> DataFrame:
    """Current continuous aggregate at ``grain`` from the partials log:
    one re-aggregation merges every micro-batch's contribution (pass a
    coarser ``grain`` than the log's to roll up further in the same
    step).  Output rows are still partial states; to compact the log,
    write them back under a single fresh ``epoch=`` directory (cast
    ``_sum`` back to the log's decimal(18,6) first — Spark's SUM widens
    decimal precision by 10, and mixed physical decimal widths in one
    parquet directory fail to read) and delete the older epochs."""
    log = spark.read.parquet(log_path)
    # drop the epoch partition column the idempotent sink introduces
    if "epoch" in log.columns:
        log = log.drop("epoch")
    return reaggregate(log, key_col, grain)
