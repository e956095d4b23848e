"""Replay the driver's t2 oracle comparison for every inventory query at
sf0.001, plus the entry() smoke check."""

from __future__ import annotations

import pytest

from sql_query_optimizer_cpp_spark.inventory import all_queries

from .compare import assert_same_result
from .conftest import SF_DIR

QUERIES = all_queries()


def test_registry_nonempty():
    assert len(QUERIES) >= 10


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_parity(spark, duck, name):
    spec = QUERIES[name]
    df = spec.fn(spark, SF_DIR)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only check, like the driver
        return
    rel = duck.sql(spec.oracle)
    assert_same_result(df, rel, name=name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["c_custkey", "c_name", "party_name", "district_name"]


def test_oracle_keys_subset():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
