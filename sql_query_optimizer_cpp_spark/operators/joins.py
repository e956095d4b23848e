"""Join variants beyond Spark's native ``how=`` set.

The reference parses INNER/LEFT/RIGHT/FULL/NATURAL/LEFT_ANTI/RIGHT_ANTI/
FULL_OUTER_ANTI join types (``engine/include/ast.h:10``,
``engine/src/parser.cpp:99-121``) but executes none of them itself.  Spark
natively covers inner/left/right/full/left_anti/left_semi/cross; the two
missing variants are composed here (SURVEY.md §7.4).

All compositions stay fully declarative — Catalyst still chooses
broadcast/shuffle strategies, and the anti joins reduce to a single
(possibly broadcast) join with no extra shuffle beyond what the equivalent
native join would need.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def right_anti_join(left: DataFrame, right: DataFrame, on: Column) -> DataFrame:
    """RIGHT ANTI JOIN (reference ``engine/src/parser.cpp:102``): rows of
    ``right`` with no match in ``left`` — Spark's left_anti with the
    operands swapped.  Output schema = ``right``'s schema.
    """
    return right.join(left, on, "left_anti")


def full_outer_anti_join(
    left: DataFrame,
    right: DataFrame,
    on: Column,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """FULL OUTER ANTI JOIN (reference ``engine/src/parser.cpp:103``): rows of
    either side with no match on the other — a full outer join filtered to
    tuples where one side's key is NULL.

    ``left_key``/``right_key`` are retained for API compatibility but the
    match test no longer inspects key columns: presence markers are added
    to each side BEFORE the join and the filter keeps rows where either
    marker is NULL.  Review found two defects in the key-null approach:
    a null-safe ``on`` (eqNullSafe) can MATCH rows whose keys are both
    NULL — which the key-null filter then misclassified as unmatched —
    and ``joined[key]`` raises AMBIGUOUS_REFERENCE when both sides name
    their key identically.  Markers are immune to both.  Output schema is
    the concatenation, unmatched side all-NULL (standard full-outer
    semantics).
    """
    lm = left.withColumn("_l_present", F.lit(True))
    rm = right.withColumn("_r_present", F.lit(True))
    joined = lm.join(rm, on, "full_outer")
    return joined.filter(
        F.col("_l_present").isNull() | F.col("_r_present").isNull()
    ).drop("_l_present", "_r_present")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    right_tiebreak: str | None = None,
) -> DataFrame:
    """AS-OF join: for each left row, the right row with the greatest
    ``right_ts <= left_ts`` within the same ``key`` (LEFT semantics: left
    rows with no prior right row keep NULL payloads).

    Spark has no native as-of join (SURVEY.md §2.3 J10).  Instead of a
    range join (quadratic per key) or per-group ``pd.merge_asof`` (Python
    boundary), this composes built-ins: tag and union both inputs, sort by
    (ts, side) within each key partition — right rows first on ties, so a
    right row at exactly left_ts matches — and carry payloads forward with
    ``last(ignorenulls)``.  One shuffle on ``key``, O(n log n) per
    partition, whole-stage codegen throughout; this is the shape that
    survives 100 TB (the shuffle key is the join key, state is one row of
    payload per partition cursor).

    ``right_tiebreak``: a unique right column ordering simultaneous right
    rows deterministically (required if (key, right_ts) can repeat).
    """
    lcols = [c for c in left.columns]
    tagged_left = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols if c != key],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_p_{c}") for c in payload_cols],
    )
    tagged_right = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != key],
        *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
    )
    unioned = tagged_left.unionByName(tagged_right)
    order = [F.col("_ts"), F.col("_side")]
    if right_tiebreak:
        order.append(F.col(f"_p_{right_tiebreak}"))
    w = (
        W.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"_p_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in payload_cols
        ],
    )
    return (
        filled.filter(F.col("_side") == 1)
        .select(
            F.col("_k").alias(key),
            F.col("_ts").alias(left_ts),
            *[F.col(c) for c in lcols if c not in (key, left_ts)],
            *[F.col(f"asof_{c}") for c in payload_cols],
        )
    )


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
) -> DataFrame:
    """Interval (range) join: point rows matched to interval rows with
    ``lo <= point < hi`` — binned so it executes as an equi-join.

    Spark plans a raw range predicate as BroadcastNestedLoopJoin (or a
    cartesian product when neither side broadcasts): O(n*m) comparisons,
    which does not survive a large interval side.  Binning is the standard
    scale fix (the same strategy behind Databricks' range-join hints):

    - each point gets one bin id ``floor(point / W)``;
    - each interval is exploded to every bin it overlaps
      (``sequence(floor(lo/W), floor(hi/W))`` — a JVM-side flatMap,
      ~``len/W + 1`` rows per interval);
    - bins equi-join (hash, broadcast if one side is small), then the exact
      predicate filters the bin-boundary false positives.

    Cost: one shuffle per side on the bin id (none for a broadcastable
    side), candidate pairs limited to same-bin pairs.  Pick ``bin_width``
    near the median interval length: wider bins → fewer interval replicas
    but more false-positive candidates; narrower → the reverse.

    The reference parses no range joins at all (SURVEY.md §2.3 J10 gap,
    ``engine/src/parser.cpp:99-121``); this is the missing scale-path
    variant alongside theta (``join_theta``) and as-of (:func:`asof_join`).
    Column names must not collide across the two inputs.
    """
    w = F.lit(float(bin_width))
    p = points.withColumn("_bin", F.floor(F.col(point_col) / w))
    iv = intervals.withColumn(
        "_bin", F.explode(F.sequence(F.floor(F.col(lo_col) / w), F.floor(F.col(hi_col) / w)))
    )
    return (
        p.join(iv, "_bin")
        .filter((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col)))
        .drop("_bin")
    )
