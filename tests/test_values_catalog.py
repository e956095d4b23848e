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
