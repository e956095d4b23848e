"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Both maps are thin re-exports of the engine's inventory registry
(``sql_query_optimizer_cpp_spark.inventory``), where every operator from
SURVEY.md §2 is declared once with its Spark implementation and its DuckDB
oracle side by side.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sql_query_optimizer_cpp_spark.inventory import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the reference's demo query (``demo_query.sql:1-11``:
    comma joins + two scalar subqueries + filters + LIMIT) ported onto the
    fixture schema — it exercises comma-join conversion (R1), scalar-
    subquery decorrelation (R2), and predicate pushdown (R3) in one plan.
    """
    spec = all_queries()["flagship_demo"]
    return spec.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for each query (omitted entries get the
    weaker rows-only check)."""
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
