"""Hypertable-style hierarchical rollup (continuous aggregates).

TimescaleDB's continuous aggregates / Druid's rollup: aggregate the raw
event stream ONCE at the finest grain, then derive every coarser grain by
re-aggregating the finer partials — never by re-scanning raw data.  The
trick is choosing partial states that are exactly re-aggregatable:

- ``count``   → sum of counts
- ``sum``     → sum of partial sums, kept in DECIMAL so re-aggregation is
  exact and associative (double partial sums would drift by grouping
  order and break cross-engine/rollup-vs-direct equality)
- ``min/max`` → min of mins / max of maxes

At 100 TB this is the difference between one pass over the raw table plus
passes over bucket-count-sized partials (thousands of rows per key) and
one full raw scan *per grain*.  The hour-grain partials are persisted via
the shared tracked cache so the day grain reads them, not the parquet.

The reference has no time-series surface at all (SURVEY.md §2.8); this is
the brief's "hypertable rollup" extension operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cache import persist_tracked

_PARTIAL_SUM_TYPE = "decimal(18,6)"


def grain_partials(
    events: DataFrame, ts_col: str, key_col: str, val_col: str, grain: str
) -> DataFrame:
    """Re-aggregatable partials at ``grain`` straight from raw events —
    the only operator in the hierarchy that touches the raw table."""
    return events.groupBy(
        F.date_trunc(grain, ts_col).alias("bucket"), F.col(key_col)
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col(val_col).cast(_PARTIAL_SUM_TYPE)).alias("_sum"),
        F.min(val_col).alias("min_value"),
        F.max(val_col).alias("max_value"),
    )


def reaggregate(partials: DataFrame, key_col: str, grain: str) -> DataFrame:
    """Coarsen partials one level: input and output rows are partial
    states, so levels chain (hour -> day -> week -> ...)."""
    return partials.groupBy(
        F.date_trunc(grain, "bucket").alias("bucket"), F.col(key_col)
    ).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("_sum").alias("_sum"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


def hierarchical_rollup(
    events: DataFrame,
    ts_col: str,
    key_col: str,
    val_col: str,
    grains: tuple[str, ...] = ("hour", "day"),
) -> DataFrame:
    """Union of finalized aggregates at every grain, coarse grains derived
    from fine partials.  ``grains`` must be ordered fine -> coarse."""
    base = persist_tracked(
        grain_partials(events, ts_col, key_col, val_col, grains[0])
    )
    levels = [(grains[0], base)]
    for i, g in enumerate(grains[1:]):
        nxt = reaggregate(levels[-1][1], key_col, g)
        # every level except the coarsest feeds TWO consumers (its own
        # finalized slice of the union AND the next level's input) —
        # persist the intermediates too, or each middle grain is
        # re-aggregated once per coarser grain above it
        if i < len(grains) - 2:
            nxt = persist_tracked(nxt)
        levels.append((g, nxt))
    out = None
    for g, df in levels:
        finalized = df.select(
            F.lit(g).alias("grain"),
            "bucket",
            key_col,
            "n_events",
            F.col("_sum").cast("double").alias("sum_value"),
            "min_value",
            "max_value",
        )
        out = finalized if out is None else out.unionByName(finalized)
    return out
