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


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-salted equi-join for the case AQE's skew split can't fix and
    broadcast can't reach: ``left`` is the skewed big side, ``right`` is
    mid-size — too big to broadcast, small enough to replicate
    ``n_salts``×.

    Each left row gets a random salt in [0, n_salts); the right side is
    replicated once per salt value; the join keys become (on..., salt), so
    the hot key's rows spread across ``n_salts`` reducers instead of one.

    Only ``inner`` and ``left`` joins are salt-safe (an unmatched RIGHT
    row exists once per replica and would surface ``n_salts`` times under
    right/full semantics) — enforced.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, not {how!r}")
    salts = F.array([F.lit(i) for i in range(n_salts)])
    l = left.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    r = right.withColumn("_salt", F.explode(salts))
    return l.join(r, [*on, "_salt"], how).drop("_salt")
