"""Genetic join-order search (plans/genetic.py) — the working
implementation of the reference's disabled skeleton
(genetic_optimizer.h:9-35, enable_genetic_optimization=false in
config.cpp:13)."""

from __future__ import annotations

from itertools import permutations

from sql_query_optimizer_cpp_spark.catalog import load_tables
from sql_query_optimizer_cpp_spark.plans.genetic import (
    JoinEdge,
    JoinGraph,
    chain_cost,
    compose_join,
    genetic_join_order,
    graph_from_stats,
)

from .conftest import SF_DIR


def _star_graph() -> JoinGraph:
    """A 5-table star with one huge fact: the optimal left-deep order is
    non-obvious (dims first shrink the chain before the fact lands)."""
    rows = {"fact": 1_000_000, "d1": 100, "d2": 1_000, "d3": 50, "d4": 10}
    edges = [
        JoinEdge("fact", "d1", ndv_a=100, ndv_b=100),
        JoinEdge("fact", "d2", ndv_a=1_000, ndv_b=1_000),
        JoinEdge("d1", "d3", ndv_a=50, ndv_b=50),
        JoinEdge("d2", "d4", ndv_a=10, ndv_b=10),
    ]
    return JoinGraph(rows=rows, edges=edges)


def test_ga_finds_enumerated_optimum():
    """On a 5-table graph (120 orders — small enough to brute-force) the
    GA must land on the true optimum, not merely something decent."""
    g = _star_graph()
    best_order, best_cost = genetic_join_order(g, seed=42)
    exhaustive = min(
        chain_cost(list(p), g) for p in permutations(sorted(g.rows))
    )
    assert abs(best_cost - exhaustive) < 1e-6, (best_order, best_cost, exhaustive)


def test_ga_deterministic_and_seed_sensitive():
    g = _star_graph()
    o1, c1 = genetic_join_order(g, seed=7)
    o2, c2 = genetic_join_order(g, seed=7)
    assert o1 == o2 and c1 == c2
    # a different seed may walk differently but must cost the same on a
    # graph this small (both reach the optimum)
    _, c3 = genetic_join_order(g, seed=99)
    assert abs(c1 - c3) < 1e-6


def test_cartesian_orders_are_penalized():
    g = JoinGraph(
        rows={"a": 10, "b": 10, "c": 10},
        edges=[JoinEdge("a", "b", 10, 10), JoinEdge("b", "c", 10, 10)],
    )
    bad = chain_cost(["a", "c", "b"], g)  # a-c has no edge
    good = chain_cost(["a", "b", "c"], g)
    assert bad > good * 1000


_Q5_KEYS = [
    ("customer", "c_custkey", "orders", "o_custkey"),
    ("orders", "o_orderkey", "lineitem", "l_orderkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


def test_ga_on_live_tpch_q5_graph(spark):
    """End-to-end on real statistics: build the q5 join graph from the
    fixture tables (row counts + approx NDVs), search, and check that
    (a) the found order never costs more than the naive as-written order,
    (b) composing the join in TWO different valid orders yields the same
    row count — reordering must never change semantics."""
    names = ("customer", "orders", "lineitem", "supplier", "nation", "region")
    t = load_tables(spark, SF_DIR, names)
    graph = graph_from_stats(t, _Q5_KEYS)
    best_order, best_cost = genetic_join_order(graph, seed=42)
    naive_cost = chain_cost(list(names), graph)
    assert best_cost <= naive_cost + 1e-9

    n_best = compose_join(t, best_order, _Q5_KEYS).count()
    n_naive = compose_join(t, list(names), _Q5_KEYS).count()
    assert n_best == n_naive
