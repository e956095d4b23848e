"""Subquery inventory — the reference's headline rewrite surface.

R2 (scalar subquery -> LEFT JOIN, ``engine/src/query_rewriter.cpp:217-330``)
and subquery flattening (IN -> semi join, stubbed at
``query_rewriter.cpp:332-340``) are Catalyst built-ins
(``RewriteCorrelatedScalarSubquery``, ``RewritePredicateSubquery``); these
queries exercise them end-to-end, including the flagship election-demo
query ported onto the fixture schema (FIXTURES.md §C mapping:
candidate→customer, party→nation, district→region).
"""

from __future__ import annotations

from . import shared_sql

# --- R2: scalar subquery in SELECT ------------------------------------------------
shared_sql(
    "scalar_subquery",
    "SELECT c_custkey, c_name, "
    "(SELECT n_name FROM nation n WHERE n.n_nationkey = c.c_nationkey) AS nation_name "
    "FROM customer c WHERE c_acctbal > 9500",
    doc="R2: correlated scalar subquery — Catalyst decorrelates to LEFT JOIN "
    "(reference needed regex pattern-matching, query_rewriter.cpp:292-318)",
    tags=("subquery", "rewrite"),
)

shared_sql(
    "scalar_subquery_agg",
    "SELECT c_custkey, "
    "(SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders "
    "FROM customer c WHERE c_acctbal > 9000",
    doc="R2: correlated aggregate subquery (the N+1 pattern the reference's "
    "demo eliminates, OPTIMIZATION_DEMO.md:101-139)",
    tags=("subquery", "rewrite"),
)

# --- IN / EXISTS predicates (reference TODO.md:24,32 — unsupported there) ---------
shared_sql(
    "in_subquery",
    "SELECT c_custkey, c_name FROM customer WHERE c_custkey IN "
    "(SELECT o_custkey FROM orders WHERE o_totalprice > 450000)",
    doc="IN-subquery → left semi join (RewritePredicateSubquery)",
    tags=("subquery",),
)

shared_sql(
    "not_in_subquery",
    "SELECT s_suppkey, s_name FROM supplier WHERE s_nationkey NOT IN "
    "(SELECT n_nationkey FROM nation WHERE n_regionkey = 0)",
    doc="NOT IN subquery → null-aware anti join",
    tags=("subquery",),
)

# --- Flagship: the reference demo query (demo_query.sql:1-11) ---------------------
# Original: comma joins (candidate, electionwinner, election) + two scalar
# subqueries (party/district names) + filters (age > 30, ElectionYear = 2024)
# + LIMIT 10.  Port: customer↔candidate, orders↔electionwinner,
# lineitem↔election, nation↔party, region↔district; a deterministic total
# ORDER BY replaces the reference's unordered LIMIT.
shared_sql(
    "flagship_demo",
    "SELECT c.c_custkey, c.c_name, "
    "(SELECT n_name FROM nation n WHERE n.n_nationkey = c.c_nationkey) AS party_name, "
    "(SELECT r_name FROM region r JOIN nation n2 ON r.r_regionkey = n2.n_regionkey "
    " WHERE n2.n_nationkey = c.c_nationkey) AS district_name "
    "FROM customer c, orders o, lineitem l "
    "WHERE c.c_custkey = o.o_custkey "
    "AND o.o_orderkey = l.l_orderkey "
    "AND c.c_acctbal > 3000 "
    "AND year(o.o_orderdate) = 2000 "
    "ORDER BY c.c_custkey, o.o_orderkey, l.l_linenumber "
    "LIMIT 10",
    doc="Flagship (demo_query.sql): comma joins + 2 scalar subqueries + "
    "filters + LIMIT — exercises R1+R2+R3 in one Catalyst pass",
    tags=("subquery", "join", "rewrite", "bench"),
)

# --- scalar subquery in WHERE (uncorrelated) --------------------------------------
shared_sql(
    "scalar_subquery_where",
    "SELECT c_custkey, c_name, c_acctbal FROM customer "
    "WHERE c_acctbal > (SELECT "
    "CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c_acctbal) "
    "FROM customer) * 1.8",
    doc="uncorrelated scalar subquery in WHERE (threshold = 1.8x the mean "
    "balance, decimal-exact so both engines compute the same cutoff)",
    tags=("subquery",),
)


# --- correlated EXISTS / NOT EXISTS ----------------------------------------------
shared_sql(
    "exists_subquery",
    "SELECT c_custkey, c_name FROM customer c "
    "WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
    "AND o.o_totalprice > 300000) "
    "AND NOT EXISTS (SELECT 1 FROM orders o2 WHERE o2.o_custkey = c.c_custkey "
    "AND o2.o_orderstatus = 'P')",
    doc="correlated EXISTS + NOT EXISTS in one predicate — Catalyst plans "
    "these as a left-semi and a left-anti join on c_custkey (no per-row "
    "re-execution), the decorrelation that makes correlated subqueries "
    "viable at scale; complements in_subquery/not_in_subquery which "
    "exercise the IN spelling",
    tags=("subquery", "join"),
)


# --- recursive CTE ---------------------------------------------------------------
shared_sql(
    "recursive_cte_chain",
    "WITH RECURSIVE chain(c_custkey, anc, depth) AS ("
    "  SELECT c_custkey, CAST(c_custkey AS BIGINT), 0 FROM customer"
    "  UNION ALL"
    "  SELECT c_custkey, CAST(FLOOR(anc / 10) AS BIGINT), depth + 1"
    "  FROM chain WHERE anc > 0"
    ") "
    "SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_nodes, "
    "CAST(SUM(anc) AS BIGINT) AS anc_sum "
    "FROM chain GROUP BY depth ORDER BY depth",
    doc="WITH RECURSIVE (iterative fixpoint; Spark 4 executes the "
    "recursion as repeated UNION ALL rounds under one plan, the same "
    "union-fixpoint loop the dedup connected-components operator spells "
    "manually) — every customer's ancestor chain under a decimal-shift "
    "hierarchy, aggregated per depth; identical text runs on both "
    "engines.  Rounds are bounded by the key width (log10(max key)), so "
    "the recursion depth is data-independent at any scale",
    tags=("subquery", "setop"),
)
