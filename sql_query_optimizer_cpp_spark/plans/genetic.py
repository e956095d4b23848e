"""Genetic join-order search over the reference's 4-component cost model.

Reference parity: ``engine/include/genetic_optimizer.h:9-35`` declares a
``GeneticOptimizer`` (population 50, generations 100, tournament
selection, crossover, mutation) but ships NO implementation (.cpp absent)
and the feature is disabled in its config
(``engine/src/config.cpp:13``: ``enable_genetic_optimization = false``).
This module is the working implementation that skeleton promises:

- **Individual** = a left-deep join order (permutation of table names),
  the same search space PostgreSQL's GEQO explores.
- **Fitness** = negative accumulated cost of the chain under the
  reference's hash-join formula (``engine/src/cost_estimator.cpp:57-61``
  via :mod:`.cost`'s constants), with intermediate cardinalities from the
  classic System-R estimate |A ⋈ B| = |A|·|B| / max(ndv_a, ndv_b) using
  REAL statistics (row counts + join-key NDVs, e.g. from ANALYZE).
- **Operators** = tournament selection, order crossover (OX1), adjacent
  swap mutation; seeded RNG so a given (graph, seed) always returns the
  same order — an optimizer that flaps between plans on identical input
  is operationally worse than a slightly costlier stable one.

Spark-first positioning: Catalyst's CBO + AQE already reorder joins (and
are what every inventory query relies on — see ``session.py``); this
search is ADVISORY, like :mod:`.cost` — it recommends an order and can
compose a DataFrame in that order (``compose_join``), it never patches
Catalyst.  Where it earns its keep is the regime GEQO exists for: star
queries wide enough that exhaustive DP enumeration (n! orders) is off
the table — n=12 is already half a billion orders; the GA samples
population*generations ≈ 5000.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

from .cost import CPU_TUPLE_COST

#: reference constants, genetic_optimizer.h:24-25
POPULATION_SIZE = 50
GENERATIONS = 100
TOURNAMENT_K = 3
MUTATION_RATE = 0.2
CROSS_JOIN_PENALTY = 1e12  # an order that forces a cartesian step is bad


@dataclass(frozen=True)
class JoinEdge:
    """An equi-join edge ``a.col_a = b.col_b`` with both key NDVs."""

    a: str
    b: str
    ndv_a: int
    ndv_b: int

    @property
    def selectivity(self) -> float:
        # System-R: sel = 1 / max(ndv_left, ndv_right)
        return 1.0 / max(self.ndv_a, self.ndv_b, 1)


@dataclass
class JoinGraph:
    """Row counts per table + equi-join edges (from real stats)."""

    rows: dict[str, int]
    edges: list[JoinEdge] = field(default_factory=list)

    def edges_between(self, joined: set[str], nxt: str) -> list[JoinEdge]:
        return [
            e
            for e in self.edges
            if (e.a == nxt and e.b in joined) or (e.b == nxt and e.a in joined)
        ]


def chain_cost_detail(order: list[str], graph: JoinGraph) -> tuple[int, float]:
    """(cartesian_steps, cost) of the left-deep chain in ``order`` under
    the reference's hash-join formula, cardinalities propagated bottom-up.

    The pair is what the GA compares LEXICOGRAPHICALLY: a review pass
    proved an additive penalty constant is not a detector — on large-row
    graphs a legitimate penalty-free chain can cost more than any fixed
    constant, letting a cartesian order win.  Ordering by
    (fewest cartesian steps, then cost) makes 'never go cartesian when a
    connected order exists' structural instead of numeric.
    """
    if not order:
        return (0, 0.0)
    acc_rows = float(graph.rows[order[0]])
    total = 0.0
    n_cross = 0
    joined = {order[0]}
    for nxt in order[1:]:
        r = float(graph.rows[nxt])
        # hash-join cost: (l + r) * CPU_TUPLE_COST * 2 + 0.1 * max(l, r)
        total += (acc_rows + r) * CPU_TUPLE_COST * 2 + 0.1 * max(acc_rows, r)
        conn = graph.edges_between(joined, nxt)
        out = acc_rows * r
        if conn:
            for e in conn:
                out *= e.selectivity
        else:
            n_cross += 1
        acc_rows = max(out, 1.0)
        joined.add(nxt)
    return (n_cross, total)


def chain_cost(order: list[str], graph: JoinGraph) -> float:
    """Scalar cost: the detail cost plus the additive penalty per
    cartesian step (back-compat reporting form; the GA itself compares
    the detail tuple, where the penalty is structural)."""
    n_cross, total = chain_cost_detail(order, graph)
    return total + n_cross * CROSS_JOIN_PENALTY


def _order_crossover(rng: random.Random, p1: list[str], p2: list[str]) -> list[str]:
    """OX1: copy a slice from p1, fill the rest in p2's relative order."""
    n = len(p1)
    if n < 3:
        return list(p1)
    i, j = sorted(rng.sample(range(n), 2))
    slice_ = p1[i : j + 1]
    rest = [t for t in p2 if t not in slice_]
    return rest[:i] + slice_ + rest[i:]


def _mutate(rng: random.Random, order: list[str]) -> None:
    """Swap mutation: usually adjacent (local refinement), sometimes two
    arbitrary positions (escape hatch — adjacent-only swaps get stuck in
    symmetric local optima where two dim clusters must trade places)."""
    if len(order) < 2:
        return
    if rng.random() < MUTATION_RATE:
        i = rng.randrange(len(order) - 1)
        order[i], order[i + 1] = order[i + 1], order[i]
    if rng.random() < MUTATION_RATE:
        i, j = rng.sample(range(len(order)), 2)
        order[i], order[j] = order[j], order[i]


def greedy_order(graph: JoinGraph) -> list[str]:
    """Greedy connected construction: start at the smallest table, always
    append the table minimizing the (cartesian_steps, cost) detail of the
    extended prefix — connected candidates always beat disconnected ones,
    so on a connected graph the result has zero cartesian steps.  O(n^2);
    used to seed the GA population so the search starts from a sane order
    instead of pure shuffles."""
    remaining = set(graph.rows)
    if not remaining:
        return []
    order = [min(remaining, key=lambda t: (graph.rows[t], t))]
    remaining.discard(order[0])
    while remaining:
        best_t, best_c = None, None
        for t in sorted(remaining):
            c = chain_cost_detail(order + [t], graph)
            if best_c is None or c < best_c:
                best_t, best_c = t, c
        order.append(best_t)
        remaining.discard(best_t)
    return order


def genetic_join_order(
    graph: JoinGraph,
    seed: int = 42,
    population_size: int = POPULATION_SIZE,
    generations: int = GENERATIONS,
    seeds: list[list[str]] | None = None,
) -> tuple[list[str], float]:
    """Best-found left-deep join order and its cost.

    Deterministic for a given (graph, seed).  Early-stops when the best
    individual has not improved for 15 generations (the reference fixes
    generations=100; the early-stop only ever does less work).

    The initial population is SEEDED (GEQO-style) with the greedy
    connected order, the sorted order, and any caller-provided orders
    (e.g. the query's as-written order) — elitism then guarantees the
    result never costs more than any seed, turning 'advised order is at
    least as good as what you wrote' from a heuristic hope into an
    invariant.  A property test found the unseeded GA converging to a
    local optimum 13% above the naive order on a 5-table chain.
    """
    tables = sorted(graph.rows)
    rng = random.Random(seed)
    population = [greedy_order(graph), tables[:]]
    for extra in seeds or []:
        if sorted(extra) == tables:
            population.append(list(extra))
    population = population[:population_size]
    while len(population) < population_size:
        order = tables[:]
        rng.shuffle(order)
        population.append(order)

    def fitness(order: list[str]) -> tuple[int, float]:
        # lexicographic: fewest cartesian steps first, then cheapest —
        # tuples compare elementwise, so max() prefers (0, -x) over
        # (-1, -y) for ANY costs x, y
        n_cross, cost = chain_cost_detail(order, graph)
        return (-n_cross, -cost)

    scored = [(fitness(o), o) for o in population]
    best_f, best_o = max(scored, key=lambda t: t[0])
    stale = 0
    for _gen in range(generations):
        nxt_pop = [best_o[:]]  # elitism: never lose the best
        while len(nxt_pop) < population_size:
            # tournament selection, genetic_optimizer.h:33
            p1 = max(rng.sample(scored, TOURNAMENT_K), key=lambda t: t[0])[1]
            p2 = max(rng.sample(scored, TOURNAMENT_K), key=lambda t: t[0])[1]
            child = _order_crossover(rng, p1, p2)
            _mutate(rng, child)
            nxt_pop.append(child)
        scored = [(fitness(o), o) for o in nxt_pop]
        gen_best_f, gen_best_o = max(scored, key=lambda t: t[0])
        if gen_best_f > best_f:
            best_f, best_o = gen_best_f, gen_best_o
            stale = 0
        else:
            stale += 1
            if stale >= 15:
                break
    # report the scalar cost (detail cost + additive penalty) for display;
    # the search itself ranked by the (n_cross, cost) tuple
    return best_o, chain_cost(best_o, graph)


def graph_from_stats(
    tables: dict[str, "object"],
    keys: list[tuple[str, str, str, str]],
) -> JoinGraph:
    """Build a JoinGraph from live DataFrames: row counts + join-key NDVs.

    ``keys``: (table_a, col_a, table_b, col_b) per equi-join edge.  Uses
    approx_count_distinct for the NDVs (one combinable aggregate per
    table — the same harvest ANALYZE ... FOR COLUMNS performs; at scale
    you'd read these from the catalog instead of recomputing).
    """
    from pyspark.sql import functions as F

    rows = {name: df.count() for name, df in tables.items()}
    ndv_cache: dict[tuple[str, str], int] = {}

    def ndv(table: str, col: str) -> int:
        key = (table, col)
        if key not in ndv_cache:
            ndv_cache[key] = (
                tables[table]
                .agg(F.approx_count_distinct(col).alias("n"))
                .collect()[0]["n"]
            )
        return ndv_cache[key]

    edges = [
        JoinEdge(a=a, b=b, ndv_a=ndv(a, ca), ndv_b=ndv(b, cb))
        for a, ca, b, cb in keys
    ]
    return JoinGraph(rows=rows, edges=edges)


def graph_from_catalog(
    spark,
    keys: list[tuple[str, str, str, str]],
) -> JoinGraph | None:
    """Build a JoinGraph purely from catalog statistics (``ANALYZE TABLE
    ... FOR COLUMNS`` readback) — ZERO scan jobs, the 100 TB advice path.

    ``keys``: (table_a, col_a, table_b, col_b) per equi-join edge, table
    names referring to catalog tables (e.g. :func:`..catalog.analyze_tables`'s
    ``stats_<name>``).  Returns None when any required stat (a row count
    or a join-key distinct_count) is missing, so the caller can fall back
    to the live-scan :func:`graph_from_stats` — stats-when-present, scans
    only when absent.
    """
    from ..catalog import column_stats, table_row_count

    tables = sorted({t for a, _, b, _ in keys for t in (a, b)})
    rows: dict[str, int] = {}
    for t in tables:
        rc = table_row_count(spark, t)
        if rc is None:
            return None
        rows[t] = rc
    ndv_cache: dict[tuple[str, str], int | None] = {}

    def ndv(table: str, col: str) -> int | None:
        key = (table, col)
        if key not in ndv_cache:
            v = column_stats(spark, table, col).get("distinct_count")
            ndv_cache[key] = int(v) if v and v != "NULL" else None
        return ndv_cache[key]

    edges = []
    for a, ca, b, cb in keys:
        na, nb = ndv(a, ca), ndv(b, cb)
        if na is None or nb is None:
            return None
        edges.append(JoinEdge(a=a, b=b, ndv_a=na, ndv_b=nb))
    return JoinGraph(rows=rows, edges=edges)


def graph_for_advice(
    spark,
    tables: dict[str, "object"],
    keys: list[tuple[str, str, str, str]],
    catalog_names: dict[str, str] | None = None,
) -> JoinGraph:
    """The advice-path statistics policy: catalog stats when ANALYZE ran
    (zero scan jobs), live scans only as the fallback.

    ``catalog_names`` maps graph table name -> catalog table name (e.g.
    ``{'orders': 'stats_orders'}``); when given and every stat resolves
    from the catalog, no Spark job runs at all — at 100 TB recomputing
    COUNT/COUNT(DISTINCT) for ADVISORY metadata is the wrong trade, the
    harvest already happened at ANALYZE time.

    Stats mutated-after-ANALYZE are never silently served: every mapped
    catalog table is checked against the DML mutation epoch
    (:func:`..catalog.stats_stale`, pure session metadata), and stale ones
    are re-harvested (warn + re-materialize + re-ANALYZE) before the
    readback — advice then ranks on post-mutation counts.  The freshness
    check costs zero jobs; the refresh costs exactly the ANALYZE it would
    have been wrong to skip.
    """
    if catalog_names is not None:
        from ..catalog import analyze_tables, stats_stale

        stale = sorted(
            {
                m
                for m in catalog_names.values()
                if stats_stale(spark, m)
            }
        )
        if stale:
            import warnings

            warnings.warn(
                f"catalog stats for {stale} were invalidated by DML after "
                "their ANALYZE; re-harvesting before ranking join orders "
                "(silently serving pre-mutation counts would misrank)",
                stacklevel=2,
            )
            for m in stale:
                sf_dir = spark.conf.get(f"spark.sqlopt.statsDir.{m}", None)
                if sf_dir is not None:
                    analyze_tables(
                        spark, sf_dir, (m.removeprefix("stats_"),)
                    )
        mapped = [
            (catalog_names[a], ca, catalog_names[b], cb)
            for a, ca, b, cb in keys
        ]
        g = graph_from_catalog(spark, mapped)
        if g is not None:
            # map catalog names back to the caller's graph names
            back = {v: k for k, v in catalog_names.items()}
            return JoinGraph(
                rows={back[t]: n for t, n in g.rows.items()},
                edges=[
                    JoinEdge(back[e.a], back[e.b], e.ndv_a, e.ndv_b)
                    for e in g.edges
                ],
            )
    return graph_from_stats(tables, keys)


def compose_join(
    tables: dict[str, "object"],
    order: list[str],
    keys: list[tuple[str, str, str, str]],
):
    """Materialize the left-deep join in ``order`` as a DataFrame.

    Each step joins the accumulated frame to the next table on EVERY edge
    connecting it to any already-joined table (conjunctive equi-join);
    raises if the order would force a cartesian step.  The GA never
    produces such an order for a connected graph: it ranks candidates by
    (cartesian_steps, cost) lexicographically and its population is
    seeded with the greedy CONNECTED construction, so a zero-cross order
    always exists in the population and always outranks any cross order.

    Join conditions reference the ORIGINAL per-table DataFrames
    (``tables[prev][col]``), not the accumulated frame — after two joined
    tables share a bare column name, ``acc[col]`` would be ambiguous.
    (Passing the SAME DataFrame object under two names still can't be
    disambiguated this way; use ``df.alias(...)`` per name for
    self-joins.)
    """
    from functools import reduce

    acc = tables[order[0]]
    joined = {order[0]}
    by_pair = {}
    for a, ca, b, cb in keys:
        by_pair.setdefault(frozenset((a, b)), []).append((a, ca, b, cb))
    for nxt in order[1:]:
        conds = []
        for prev in joined:
            for a, ca, b, cb in by_pair.get(frozenset((prev, nxt)), ()):
                left_col, right_col = (ca, cb) if a == prev else (cb, ca)
                conds.append(
                    tables[prev][left_col] == tables[nxt][right_col]
                )
        if not conds:
            raise ValueError(
                f"order {order} makes {nxt} a cartesian step (no edge to {joined})"
            )
        acc = acc.join(tables[nxt], reduce(lambda x, y: x & y, conds))
        joined.add(nxt)
    return acc


# --- plan-derived graphs: advice straight from a SQL text -----------------------
def _walk_jplan(node, fn, alias=None, _token=None, _counter=None):
    if _counter is None:
        _counter = [0]
    name = node.nodeName()
    if name == "SubqueryAlias" and alias is None:
        # OUTERMOST alias wins: `FROM nation n1` plans as
        # SubqueryAlias(n1, SubqueryAlias(nation, View(...))) and the
        # user-facing name is n1 — it also keeps two uses of one view
        # distinct without synthetic suffixes.  The token identifies the
        # alias NODE (not just the name): one token covering two leaves
        # means a derived table, which a FROM-clause reorder cannot
        # touch — graph_from_plan refuses those.
        try:
            alias = node.alias()
            _counter[0] += 1
            _token = _counter[0]
        except Exception:
            pass
    fn(node, alias, _token)
    it = node.children().iterator()
    while it.hasNext():
        _walk_jplan(it.next(), fn, alias, _token, _counter)


def _expr_equalities(jexpr, out):
    """Collect (exprId, exprId) pairs from TOP-LEVEL-CONJUNCT
    EqualTo(attr, attr) nodes.

    Only the And spine is descended: an equality nested under OR, NOT,
    CASE etc. is NOT a conjunctive equi-join edge — review found the
    previous any-depth harvest turning ``NOT (a.x = b.y)`` (a
    near-cartesian predicate) and both branches of ``... OR ...`` into
    AND-ed edges, corrupting the cardinality model the GA optimizes.
    Non-equality conjuncts are simply ignored (they are filters, not
    join structure)."""
    cls = jexpr.getClass().getSimpleName()
    if cls == "And":
        _expr_equalities(jexpr.children().apply(0), out)
        _expr_equalities(jexpr.children().apply(1), out)
        return
    if cls == "EqualTo":
        left, right = jexpr.children().apply(0), jexpr.children().apply(1)
        if (
            left.getClass().getSimpleName() == "AttributeReference"
            and right.getClass().getSimpleName() == "AttributeReference"
        ):
            out.append((left.exprId().id(), right.exprId().id()))


def graph_from_plan(df) -> tuple[JoinGraph, list[str]]:
    """Derive a JoinGraph from a DataFrame's ANALYZED plan — the bridge
    that lets :func:`genetic_join_order` take a SQL query the way the
    reference's ``GeneticOptimizer::optimize(SelectQuery)`` signature
    promises (genetic_optimizer.h:14).

    Leaves become tables (named by their outermost SubqueryAlias, deduped
    with ``#i`` when a view appears twice, as nation does in TPC-H q8);
    TOP-LEVEL-CONJUNCT equi-conditions from INNER Join nodes and Filter
    conditions (comma joins put them in WHERE) become edges.  Row counts
    come from Catalyst leaf stats; NDV falls back to the leaf's row count
    (exact for the PK side of an FK join — the side that decides the
    System-R selectivity).

    Refused with ValueError (a FROM-clause reorder cannot preserve their
    semantics, so confident-but-wrong advice would be worse than none):
    derived tables / subqueries in FROM (one alias covering multiple
    leaves) and outer/semi/anti joins.
    """
    jplan = df._jdf.queryExecution().analyzed()
    leaves: list[tuple[str, object]] = []
    eqs: list[tuple[int, int]] = []
    token_leaf_count: dict[int, int] = {}

    def visit(node, alias, token):
        if node.children().isEmpty():
            if token is not None:
                token_leaf_count[token] = token_leaf_count.get(token, 0) + 1
                if token_leaf_count[token] > 1:
                    raise ValueError(
                        f"derived table/subquery {alias!r} spans multiple "
                        "base relations; join_order_advice only reorders "
                        "plain FROM-clause tables"
                    )
            nm = alias or node.nodeName().lower()
            names = [n for n, _ in leaves]
            if nm in names:
                nm = f"{nm}#{sum(1 for n in names if n.split('#')[0] == nm)}"
            leaves.append((nm, node))
        nn = node.nodeName()
        if "Join" in nn:
            jt = node.joinType().toString()
            if jt not in ("Inner", "Cross"):
                raise ValueError(
                    f"{jt} join is not freely reorderable; "
                    "join_order_advice handles inner/comma joins only"
                )
            cond = node.condition()
            if cond.isDefined():
                _expr_equalities(cond.get(), eqs)
        elif nn == "Filter":
            _expr_equalities(node.condition(), eqs)

    _walk_jplan(jplan, visit)

    rows: dict[str, int] = {}
    attr_owner: dict[int, str] = {}
    for nm, node in leaves:
        stats = node.stats()
        rc = stats.rowCount()
        if rc.isDefined():
            n = rc.get()
            rows[nm] = n if isinstance(n, int) else int(n.toString())
        else:
            sz = stats.sizeInBytes()
            rows[nm] = max((sz if isinstance(sz, int) else int(sz.toString())) // 100, 1)
        it = node.output().iterator()
        while it.hasNext():
            attr_owner[it.next().exprId().id()] = nm

    edges = []
    seen = set()
    for l_id, r_id in eqs:
        a, b = attr_owner.get(l_id), attr_owner.get(r_id)
        if a is None or b is None or a == b:
            continue
        key = frozenset((a, b, l_id, r_id))
        if key in seen:
            continue
        seen.add(key)
        edges.append(JoinEdge(a=a, b=b, ndv_a=rows[a], ndv_b=rows[b]))
    return JoinGraph(rows=rows, edges=edges), [n for n, _ in leaves]
