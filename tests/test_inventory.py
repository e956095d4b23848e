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
    # Drop all fixture temp views first so each query proves it registers
    # every view it needs — a missed (e.g. case-miss) table detection must
    # fail HERE deterministically, not only when query order leaves the
    # view unregistered (views persist across queries in a session).
    from sql_query_optimizer_cpp_spark.catalog import TABLES

    for t in TABLES:
        spark.catalog.dropTempView(t)
    df = spec.fn(spark, SF_DIR)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only check, like the driver
        return
    rel = duck.sql(spec.oracle)
    assert_same_result(df, rel, name=name)


_TYPE_CATEGORY = {
    # Spark simpleString prefixes / DuckDB type names -> comparable category
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "integer": "int", "hugeint": "decimal", "uhugeint": "decimal",
    "ubigint": "int", "uinteger": "int", "usmallint": "int", "utinyint": "int",
    "float": "float", "double": "float", "real": "float",
    "decimal": "decimal", "boolean": "bool", "string": "str", "varchar": "str",
    "date": "date", "timestamp": "ts", "timestamp_ntz": "ts",
    "timestamp with time zone": "ts",
}


def _category(type_str: str) -> str:
    t = type_str.lower()
    if t.startswith("decimal"):
        return "decimal"
    if t.startswith(("array", "struct", "map")) or t.endswith("[]"):
        return "nested"
    return _TYPE_CATEGORY.get(t, t)


@pytest.mark.parametrize("name", sorted(n for n in QUERIES if QUERIES[n].oracle))
def test_oracle_type_parity(spark, duck, name):
    """Column TYPE category must match between the Spark result schema and
    the DuckDB oracle relation — cheap (plan-only, nothing executes) and
    exactly the class of bug the driver's value-hash flags but fetchall()
    replay hides: r03's only reds were pack_sequences' ``start % ctx``
    riding a DuckDB window SUM(BIGINT)->HUGEINT into an Arrow
    decimal128 column, repr-diverging from Spark's bigint ('5.0' vs '5')
    while rows and column names still matched."""
    spec = QUERIES[name]
    sdtypes = {c.lower(): _category(t) for c, t in spec.fn(spark, SF_DIR).dtypes}
    rel = duck.sql(spec.oracle)
    ddtypes = {c.lower(): _category(str(t)) for c, t in zip(rel.columns, rel.types)}
    assert sdtypes == ddtypes, (
        f"{name}: result type categories diverge: spark={sdtypes} duck={ddtypes}"
    )


def test_detect_tables_case_insensitive():
    from sql_query_optimizer_cpp_spark.inventory import detect_tables

    assert detect_tables("SELECT * FROM ORDERS O, Lineitem l") == (
        "orders",
        "lineitem",
    )
    # word-boundary: 'reorders' must not match 'orders'
    assert detect_tables("SELECT * FROM reorders") == ()


def test_release_cached(spark):
    from sql_query_optimizer_cpp_spark.operators import dedup as dd

    spec = QUERIES["dedup_minhash_pairs"]
    spec.fn(spark, SF_DIR).count()
    assert dd.release_cached() >= 1  # the tracked shingle cache
    assert dd.release_cached() == 0  # idempotent once drained


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


def test_priority_names_all_registered():
    """Every _PRIORITY entry must name a registered query: all_queries()
    silently skips unknown names, so a typo in a rotation edit would
    silently drop that query from the driver's 50-entry grading window —
    exactly the failure mode the rotation exists to prevent."""
    from sql_query_optimizer_cpp_spark.inventory import _PRIORITY

    unknown = [n for n in _PRIORITY if n not in QUERIES]
    assert not unknown, f"_PRIORITY names not in registry: {unknown}"
    assert len(set(_PRIORITY)) == len(_PRIORITY), "duplicate _PRIORITY entries"
