"""Driver-gradeable GA join-order advice (SURVEY.md §2 R6).

Reference parity: ``engine/include/genetic_optimizer.h:9-35`` promises a
``GeneticOptimizer`` (population/tournament/crossover/mutation) that the
reference never implements; :mod:`..plans.genetic` is the working version.
This query makes that capability DRIVER-GRADED, not just property-tested:

- **Spark side** runs :func:`genetic_join_order` (seeded, deterministic)
  over the 5-table TPC-H chain region–nation–customer–orders–lineitem,
  with statistics — row counts and exact join-key NDVs — computed from
  the live fixture tables.
- **Oracle side** finds the GROUND-TRUTH optimum by exhaustively
  enumerating all 120 left-deep orders with a recursive CTE under the
  SAME cost model (hash-join cost ``(l+r)*0.01*2 + 0.1*max(l,r)``,
  System-R selectivity ``1/max(ndv_a, ndv_b)``, output clamped at 1 row,
  orders ranked by (cartesian steps, cost)).

Equality therefore proves the GA finds the enumerated optimum on real
statistics — a far stronger check than pinning its output to a constant.

Tie handling (why the result is cross-engine deterministic): the cost
formula is SYMMETRIC in (left, right), so the first two tables of any
order always commute at bitwise-identical cost — in both engines, since
every term ((l+r), max(l,r), l*r*sel) is symmetric.  Both sides therefore
canonicalize to the lexicographically smaller member of that two-element
tie class: the oracle via ``ORDER BY ncross, cost, ord`` (the tied pair
compares equal on cost in DuckDB too), the Spark side by swapping the
first two names when that sorts lower (cost provably unchanged).  The
NEXT-best cost class sits ≥15 cost units away at every fixture SF
(verified exhaustively), so float noise between engines cannot flip the
argmin.  If the GA converged to a worse order, the canonical swap keeps
it in the worse class and the oracle mismatch exposes it.

Everything that crosses the driver here is advisory metadata (5 table
names + counts), never rows — the 100 TB story is unchanged: at scale the
counts/NDVs come from the catalog (ANALYZE) instead of being recomputed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import register
from ..catalog import load_tables
from ..plans.genetic import (
    JoinEdge,
    JoinGraph,
    chain_cost_detail,
    genetic_join_order,
)

#: (table_a, key_a, table_b, key_b) — the query's equi-join edges.
_EDGES = (
    ("region", "r_regionkey", "nation", "n_regionkey"),
    ("nation", "n_nationkey", "customer", "c_nationkey"),
    ("customer", "c_custkey", "orders", "o_custkey"),
    ("orders", "o_orderkey", "lineitem", "l_orderkey"),
)
_TABLES = ("region", "nation", "customer", "orders", "lineitem")

# DuckDB oracle: exhaustive left-deep enumeration under the identical cost
# model.  ``joined`` is a '|'-delimited membership set; the recursive step
# extends every partial chain by every not-yet-joined table, multiplying in
# the selectivity of every edge that connects the newcomer to the set
# (exp(sum(ln ..)) = the product) and counting a cartesian step when no
# edge does.  Final pick: fewest cartesian steps, then cheapest, then
# lexicographic (resolving only the symmetric first-pair tie — see module
# doc).
_ORACLE = """
WITH RECURSIVE
t_rows AS (
  SELECT 'region' AS t, CAST((SELECT COUNT(*) FROM region) AS DOUBLE) AS n
  UNION ALL SELECT 'nation', CAST((SELECT COUNT(*) FROM nation) AS DOUBLE)
  UNION ALL SELECT 'customer', CAST((SELECT COUNT(*) FROM customer) AS DOUBLE)
  UNION ALL SELECT 'orders', CAST((SELECT COUNT(*) FROM orders) AS DOUBLE)
  UNION ALL SELECT 'lineitem', CAST((SELECT COUNT(*) FROM lineitem) AS DOUBLE)
),
edges AS (
  SELECT 'region' AS a, 'nation' AS b,
         1.0 / GREATEST((SELECT COUNT(DISTINCT r_regionkey) FROM region),
                        (SELECT COUNT(DISTINCT n_regionkey) FROM nation), 1) AS sel
  UNION ALL
  SELECT 'nation', 'customer',
         1.0 / GREATEST((SELECT COUNT(DISTINCT n_nationkey) FROM nation),
                        (SELECT COUNT(DISTINCT c_nationkey) FROM customer), 1)
  UNION ALL
  SELECT 'customer', 'orders',
         1.0 / GREATEST((SELECT COUNT(DISTINCT c_custkey) FROM customer),
                        (SELECT COUNT(DISTINCT o_custkey) FROM orders), 1)
  UNION ALL
  SELECT 'orders', 'lineitem',
         1.0 / GREATEST((SELECT COUNT(DISTINCT o_orderkey) FROM orders),
                        (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem), 1)
),
chains AS (
  SELECT t AS ord, '|' || t || '|' AS joined, n AS acc,
         CAST(0.0 AS DOUBLE) AS cost, 0 AS ncross, 1 AS len
  FROM t_rows
  UNION ALL
  SELECT c.ord || ',' || r.t,
         c.joined || r.t || '|',
         GREATEST(
           c.acc * r.n * COALESCE(
             (SELECT EXP(SUM(LN(e.sel))) FROM edges e
              WHERE (e.a = r.t AND c.joined LIKE '%|' || e.b || '|%')
                 OR (e.b = r.t AND c.joined LIKE '%|' || e.a || '|%')),
             1.0),
           1.0),
         c.cost + (c.acc + r.n) * 0.01 * 2 + 0.1 * GREATEST(c.acc, r.n),
         c.ncross + CASE WHEN EXISTS
             (SELECT 1 FROM edges e
              WHERE (e.a = r.t AND c.joined LIKE '%|' || e.b || '|%')
                 OR (e.b = r.t AND c.joined LIKE '%|' || e.a || '|%'))
           THEN 0 ELSE 1 END,
         c.len + 1
  FROM chains c
  JOIN t_rows r ON c.joined NOT LIKE '%|' || r.t || '|%'
),
best AS (
  SELECT ord FROM chains WHERE len = 5
  ORDER BY ncross, cost, ord LIMIT 1
)
SELECT CAST(p.pos AS INTEGER) AS pos,
       LIST_EXTRACT(STRING_SPLIT(best.ord, ','), p.pos) AS table_name,
       CAST(t.n AS BIGINT) AS n_rows
FROM best
CROSS JOIN (SELECT UNNEST([1, 2, 3, 4, 5]) AS pos) p
JOIN t_rows t ON t.t = LIST_EXTRACT(STRING_SPLIT(best.ord, ','), p.pos)
ORDER BY pos
"""


#: Minimum cost separation required between the optimal tie class and the
#: next-best class.  The module doc's determinism argument rests on two
#: fixture properties; _assert_tie_gap re-proves them at RUN time so a
#: future fixture/stat change fails LOUDLY here instead of flaking the
#: driver's hash compare (the r6 review flagged exactly this fragility).
_MIN_TIE_GAP = 1.0


def _assert_tie_gap(graph: JoinGraph) -> None:
    """Exhaustively re-verify (120 permutations, driver-side metadata
    arithmetic — no Spark job) that

    1. every order tied with the optimum (same cartesian count, cost
       within float noise) is the symmetric FIRST-PAIR swap of one
       canonical order — the only tie class both engines canonicalize; and
    2. the next-best cost class sits ≥ ``_MIN_TIE_GAP`` away, so
       cross-engine float noise cannot flip the argmin.
    """
    from itertools import permutations

    tables = sorted(graph.rows)
    scored = [
        (list(p), *chain_cost_detail(list(p), graph))
        for p in permutations(tables)
    ]
    best_ncross = min(nc for _, nc, _ in scored)
    in_class = [(o, c) for o, nc, c in scored if nc == best_ncross]
    best_cost = min(c for _, c in in_class)
    tol = 1e-9 * max(1.0, abs(best_cost))
    tied = [o for o, c in in_class if c - best_cost <= tol]
    canon = {tuple(sorted(o[:2]) + o[2:]) for o in tied}
    if len(canon) != 1:
        raise ValueError(
            "join_order_advice_ga determinism invariant broken: the "
            f"optimal cost class contains {len(canon)} distinct orders "
            f"beyond the symmetric first-pair tie ({sorted(canon)}); "
            "cross-engine canonicalization only covers the first-pair "
            "swap — fixture statistics changed in a way the oracle "
            "cannot disambiguate"
        )
    above = [c for _, c in in_class if c - best_cost > tol]
    if above and min(above) - best_cost < _MIN_TIE_GAP:
        raise ValueError(
            "join_order_advice_ga determinism invariant broken: "
            f"next-best cost class is only {min(above) - best_cost:.3g} "
            f"units above the optimum (< {_MIN_TIE_GAP}); float noise "
            "between engines could flip the argmin — fixture statistics "
            "no longer give the documented gap"
        )


@register(
    "join_order_advice_ga",
    oracle=_ORACLE,
    doc="R6 graded end-to-end: the genetic join-order search (the working "
    "implementation of the reference's skeleton-only GeneticOptimizer, "
    "engine/include/genetic_optimizer.h:9-35) runs over real fixture "
    "statistics; the oracle exhaustively enumerates every left-deep "
    "order under the same cost model, so a match proves the GA found "
    "the true optimum, not a memorized constant",
    tags=("plans", "advice"),
)
def join_order_advice_ga(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, _TABLES)
    # exact stats so both engines rank orders over identical numbers
    # (approx_count_distinct would drift cross-engine); one combinable
    # aggregate per table, metadata-scale results only
    rows = {name: t[name].count() for name in _TABLES}
    ndv: dict[tuple[str, str], int] = {}
    for a, ca, b, cb in _EDGES:
        for tbl, col in ((a, ca), (b, cb)):
            if (tbl, col) not in ndv:
                ndv[(tbl, col)] = t[tbl].agg(
                    F.countDistinct(col).alias("n")
                ).collect()[0]["n"]
    graph = JoinGraph(
        rows=dict(rows),
        edges=[
            JoinEdge(a=a, b=b, ndv_a=ndv[(a, ca)], ndv_b=ndv[(b, cb)])
            for a, ca, b, cb in _EDGES
        ],
    )
    _assert_tie_gap(graph)
    order, _cost = genetic_join_order(graph, seed=42)
    # canonicalize the symmetric first-pair tie (cost provably unchanged —
    # every cost term is symmetric in (l, r); see module doc)
    if order[1] < order[0]:
        order = [order[1], order[0], *order[2:]]
    from ..functions import values_df

    return values_df(
        spark,
        "pos int, table_name string, n_rows bigint",
        [(i + 1, name, rows[name]) for i, name in enumerate(order)],
    )
