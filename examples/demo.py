#!/usr/bin/env python
"""Narrative demo — the Spark-native equivalent of the reference's
``run_demo.sh`` walkthrough.

Runs the flagship query (comma joins + scalar subqueries + filters, the
shape of the reference's ``demo_query.sql``), then shows everything the
reference's CLI showed — for real, from Catalyst:

1. the transform log (which rewrites fired, with plan evidence),
2. the optimized plan tree with per-node statistics,
3. the 4-component cost report in the reference's own cost-model style,
4. the result rows.

Usage: python examples/demo.py [sf_dir]   (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from sql_query_optimizer_cpp_spark.engine import Engine
from sql_query_optimizer_cpp_spark.session import get_session

FLAGSHIP = """
SELECT c.c_custkey, c.c_name,
  (SELECT n_name FROM nation n WHERE n.n_nationkey = c.c_nationkey) AS party_name,
  (SELECT r_name FROM region r JOIN nation n2 ON r.r_regionkey = n2.n_regionkey
    WHERE n2.n_nationkey = c.c_nationkey) AS district_name
FROM customer c, orders o, lineitem l
WHERE c.c_custkey = o.o_custkey
  AND o.o_orderkey = l.l_orderkey
  AND c.c_acctbal > 3000
  AND year(o.o_orderdate) = 2000
  AND 1=1
ORDER BY c.c_custkey, o.o_orderkey, l.l_linenumber
LIMIT 10
"""


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session(app_name="demo")
    eng = Engine(spark, sf_dir)

    print("=" * 72)
    print("UNOPTIMIZED QUERY (comma joins + 2 scalar subqueries + trivial filter)")
    print("=" * 72)
    print(FLAGSHIP)

    report = eng.optimize(FLAGSHIP)
    print("=" * 72)
    print("OPTIMIZER TRACE (named rewrites, from analyzed-vs-optimized plan diff)")
    print("=" * 72)
    print(report.render())

    print()
    print("=" * 72)
    print("COST REPORT (reference 4-component style over Catalyst estimates)")
    print("=" * 72)
    print(eng.cost(FLAGSHIP).render())

    print()
    print("=" * 72)
    print("GENETIC JOIN-ORDER SEARCH (the reference's disabled skeleton, live)")
    print("=" * 72)
    from sql_query_optimizer_cpp_spark.catalog import load_tables
    from sql_query_optimizer_cpp_spark.plans.genetic import (
        chain_cost,
        genetic_join_order,
        graph_from_stats,
    )

    names = ("customer", "orders", "lineitem", "supplier", "nation", "region")
    keys = [
        ("customer", "c_custkey", "orders", "o_custkey"),
        ("orders", "o_orderkey", "lineitem", "l_orderkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation", "n_regionkey", "region", "r_regionkey"),
    ]
    graph = graph_from_stats(load_tables(spark, sf_dir, names), keys)
    order, cost = genetic_join_order(graph, seed=42)
    print(f"as-written order cost: {chain_cost(list(names), graph):,.1f}")
    print(f"GA-found order:        {' -> '.join(order)}  (cost {cost:,.1f})")
    print("(advisory — Catalyst CBO+AQE still pick the executed plan)")

    print()
    print("=" * 72)
    print("RESULT")
    print("=" * 72)
    eng.sql(FLAGSHIP).show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
