"""Additional TPC-H-shaped benchmark queries (q4/q7/q10/q18), adapted to
the trimmed fixture schema (no l_commitdate/l_receiptdate/l_shipmode —
date predicates substitute l_shipdate vs o_orderdate; nation names are the
fixture's NATION_n).

All four are ``shared_sql``: the identical ANSI text runs on Spark and
DuckDB (parity by construction), with double aggregates through the
portable decimal-SUM text (``dsum_sql``) and ``year()`` pinned to BIGINT
(Spark emits INT, DuckDB BIGINT).

Plan shapes these exercise (asserted by the global plan guards):
- q4: correlated EXISTS → left-semi join on the fact table
- q7: two independent nation dims joined twice (supp/cust side) — both
  broadcast; one fact-fact shuffle
- q10: 3-way join + group-by + TakeOrderedAndProject top-20
- q18: IN over a grouped HAVING subquery → semi join against an aggregate
"""

from __future__ import annotations

from . import shared_sql
from ..functions import dsum_sql

shared_sql(
    "tpch_q4",
    "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count "
    "FROM orders "
    "WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' "
    "AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00' "
    "AND EXISTS (SELECT 1 FROM lineitem "
    "            WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate) "
    "GROUP BY o_orderpriority",
    doc="TPC-H Q4 (order priority checking, adapted: late-shipment EXISTS "
    "instead of commit/receipt dates) — correlated EXISTS decorrelates to "
    "a left-semi join",
    tags=("tpch", "subquery"),
)

shared_sql(
    "tpch_q7",
    "SELECT supp_nation, cust_nation, l_year, "
    + dsum_sql("volume", scale=4)
    + " AS revenue FROM ("
    "  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
    "         CAST(year(l_shipdate) AS BIGINT) AS l_year, "
    "         l_extendedprice * (1 - l_discount) AS volume "
    "  FROM supplier s "
    "  JOIN lineitem l ON s.s_suppkey = l.l_suppkey "
    "  JOIN orders o ON o.o_orderkey = l.l_orderkey "
    "  JOIN customer c ON c.c_custkey = o.o_custkey "
    "  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey "
    "  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey "
    "  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') "
    "     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')"
    ") shipping "
    "GROUP BY supp_nation, cust_nation, l_year",
    doc="TPC-H Q7 (volume shipping between two nations, by year) — nation "
    "dims broadcast on both the supplier and customer side, single "
    "fact-fact shuffle",
    tags=("tpch", "join", "agg"),
)

shared_sql(
    "tpch_q10",
    "SELECT c_custkey, c_name, "
    + dsum_sql("l_extendedprice * (1 - l_discount)", scale=4)
    + " AS revenue, c_acctbal, n_name "
    "FROM customer "
    "JOIN orders ON c_custkey = o_custkey "
    "JOIN lineitem ON l_orderkey = o_orderkey "
    "JOIN nation ON c_nationkey = n_nationkey "
    "WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' "
    "AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00' "
    "AND l_returnflag = 'R' "
    "GROUP BY c_custkey, c_name, c_acctbal, n_name "
    "ORDER BY revenue DESC, c_custkey LIMIT 20",
    doc="TPC-H Q10 (returned-item reporting, top-20 customers by lost "
    "revenue in a quarter; address/phone/comment columns absent from the "
    "fixture) — TakeOrderedAndProject with a unique tie-break",
    tags=("tpch", "join", "agg", "topk"),
)

shared_sql(
    "tpch_q12",
    "SELECT l_linestatus, "
    "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
    "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
    "CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') "
    "THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count "
    "FROM orders JOIN lineitem ON o_orderkey = l_orderkey "
    "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
    "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' "
    "GROUP BY l_linestatus",
    doc="TPC-H Q12 (shipping-priority audit, adapted: l_linestatus stands "
    "in for the absent l_shipmode, shipdate for commit/receipt dates) — "
    "conditional-count aggregation over one fact-fact join; the CASE "
    "branches fold into the map-side partial agg",
    tags=("tpch", "agg"),
)

shared_sql(
    "tpch_q19",
    "SELECT "
    + dsum_sql("l_extendedprice * (1 - l_discount)", scale=4)
    + " AS revenue, CAST(COUNT(*) AS BIGINT) AS n_lines "
    "FROM lineitem JOIN part ON p_partkey = l_partkey "
    "WHERE ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 "
    "        AND l_quantity BETWEEN 1 AND 20) "
    "    OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30 "
    "        AND l_quantity BETWEEN 10 AND 35) "
    "    OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 "
    "        AND l_quantity BETWEEN 20 AND 50)) "
    # Redundant single-table conjuncts derived from the disjunction: a
    # cross-table OR-of-ANDs is not factorable by Catalyst, so without
    # these both scans read everything and the whole predicate evaluates
    # post-join.  Stating the per-side unions explicitly (semantically
    # implied, verified by the oracle) pushes brand/size to the part scan
    # and quantity to the lineitem scan — the classic Q19 rewrite.
    "AND p_brand IN ('Brand#12', 'Brand#23', 'Brand#3') "
    "AND p_size BETWEEN 1 AND 50 "
    "AND l_quantity BETWEEN 1 AND 50",
    doc="TPC-H Q19 (discounted revenue under a disjunction of brand/size/"
    "quantity branches; container/shipmode columns absent from the "
    "fixture) — the common p_partkey = l_partkey conjunct stays a hash "
    "equi-join (never nested-loop); redundant per-side conjuncts derived "
    "from the OR reach both parquet scans as PushedFilters, with the full "
    "disjunction re-checked post-join",
    tags=("tpch", "join", "agg"),
)

shared_sql(
    "tpch_q18",
    "SELECT c_name, c_custkey, o_orderkey, o_totalprice, "
    + dsum_sql("l_quantity", scale=2)
    + " AS total_qty "
    "FROM customer "
    "JOIN orders ON c_custkey = o_custkey "
    "JOIN lineitem ON o_orderkey = l_orderkey "
    "WHERE o_orderkey IN ("
    "  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey "
    "  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 200) "
    "GROUP BY c_name, c_custkey, o_orderkey, o_totalprice "
    "ORDER BY o_totalprice DESC, o_orderkey LIMIT 100",
    doc="TPC-H Q18 (large-volume customer: orders whose total quantity "
    "exceeds 200) — IN over a grouped HAVING subquery becomes a semi join "
    "against the aggregate; quantity sum through portable decimal",
    tags=("tpch", "subquery", "agg", "topk"),
)
