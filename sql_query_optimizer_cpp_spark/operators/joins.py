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

from pyspark.sql import Column, DataFrame


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

    ``left_key``/``right_key`` name the join key column on each side so the
    null-filter can be expressed; output schema is the concatenation, with
    the unmatched side all-NULL (standard full-outer semantics).
    """
    joined = left.join(right, on, "full_outer")
    return joined.filter(joined[left_key].isNull() | joined[right_key].isNull())
