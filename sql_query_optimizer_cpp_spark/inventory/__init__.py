"""Inventory: the engine's declared query/operator surface.

Every operator from SURVEY.md §2 (plus the LLM-data-pipeline extensions) is
registered here as a named :class:`QuerySpec` carrying

- ``fn(spark, sf_dir) -> DataFrame`` — the Spark implementation, and
- ``oracle`` — equivalent ANSI SQL that DuckDB can run on the same parquet
  fixtures (``None`` for genuinely non-SQL-expressible ops, which downgrades
  the driver's check to rows-only).

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin re-exports of this
registry, and ``tests/test_inventory.py`` replays the same comparison
locally at sf0.001.

Determinism rules (the driver hash-compares values):
- every LIMIT is preceded by a total ORDER BY (unique tie-break columns);
- double aggregations go through DECIMAL (exact, order-independent) and are
  cast back to DOUBLE so both engines emit bit-identical values and the
  result schema stays ``double``;
- column aliases match between Spark and oracle SQL exactly.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_tables, register_views


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, QuerySpec] = {}

_MODULES = (
    "core",
    "joins",
    "aggregates",
    "subqueries",
    "setops",
    "windows",
    "text",
    "dedup",
    "similarity",
    "events",
    "multimodal",
)


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable:
    """Decorator: register a (spark, sf_dir) -> DataFrame query under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


def shared_sql(
    name: str,
    sql: str,
    doc: str = "",
    tags: tuple[str, ...] = (),
    oracle: str | None = None,
) -> None:
    """Register a query whose Spark side is ``spark.sql(sql)`` over the
    fixture temp views.  When ``oracle`` is omitted the *same text* is the
    DuckDB oracle — parity by construction for the ANSI-compatible subset.
    """

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(sql)

    fn.__name__ = f"q_{name}"
    fn.__doc__ = doc or sql
    register(name, oracle=oracle if oracle is not None else sql, doc=doc, tags=tags)(fn)


def all_queries() -> dict[str, QuerySpec]:
    """Import every inventory module (idempotent) and return the registry."""
    for mod in _MODULES:
        importlib.import_module(f"{__name__}.{mod}")
    return REGISTRY


__all__ = [
    "QuerySpec",
    "REGISTRY",
    "register",
    "shared_sql",
    "all_queries",
    "load_tables",
    "register_views",
]
