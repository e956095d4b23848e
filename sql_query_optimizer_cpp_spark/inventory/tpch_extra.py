"""Additional TPC-H-shaped benchmark queries, adapted to the trimmed
fixture schema (no l_commitdate/l_receiptdate/l_shipmode/l_container,
no partsupp table, no c_phone/o_comment — date predicates substitute
l_shipdate vs o_orderdate, lineitem stands in for partsupp, nationkey
for phone country codes; nation names are the fixture's NATION_n).

All are ``shared_sql``: the identical ANSI text runs on Spark and DuckDB
(parity by construction), with double aggregates through the portable
decimal-SUM/AVG text (``dsum_sql``/``davg_sql``) and ``year()`` pinned
to BIGINT (Spark emits INT, DuckDB BIGINT).

Plan shapes these exercise (asserted by the global plan guards):
- q4: correlated EXISTS → left-semi join on the fact table
- q7: two independent nation dims joined twice (supp/cust side) — both
  broadcast; one fact-fact shuffle
- q10: 3-way join + group-by + TakeOrderedAndProject top-20
- q13: outer join with a join-side predicate → two-level aggregation
- q16: NOT IN over a dim subquery → null-aware anti join + COUNT(DISTINCT)
- q17: correlated scalar AVG subquery → decorrelated aggregate + join
- q18: IN over a grouped HAVING subquery → semi join against an aggregate
- q21: EXISTS + NOT EXISTS on the same fact → semi then anti join chain
- q22: uncorrelated scalar AVG threshold + NOT EXISTS anti join
"""

from __future__ import annotations

from . import shared_sql
from ..functions import davg_sql, dsum_sql

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

shared_sql(
    "tpch_q13",
    "SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM ("
    "  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count "
    "  FROM customer LEFT JOIN orders "
    "    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT' "
    "  GROUP BY c_custkey"
    ") c_orders "
    "GROUP BY c_count ORDER BY custdist DESC, c_count DESC",
    doc="TPC-H Q13 (customer order-count distribution, adapted: the "
    "o_comment NOT LIKE filter becomes a priority filter since the fixture "
    "has no comment column) — the filter sits in the LEFT JOIN's ON clause "
    "so filtered-out customers still appear with c_count = 0, then a "
    "second aggregation histograms the counts; COUNT(o_orderkey) counts "
    "only matched rows (NULL-skipping), the semantic core of the query",
    tags=("tpch", "join", "agg"),
)

shared_sql(
    "tpch_q16",
    "SELECT p_brand, p_type, p_size, "
    "CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt "
    "FROM lineitem JOIN part ON p_partkey = l_partkey "
    "WHERE p_brand <> 'Brand#45' AND p_type <> 'MEDIUM' "
    "AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35) "
    "AND l_suppkey NOT IN ("
    "  SELECT s_suppkey FROM supplier WHERE s_name LIKE '%77%') "
    "GROUP BY p_brand, p_type, p_size "
    "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size",
    doc="TPC-H Q16 (parts/supplier relationship count, adapted: the "
    "fixture has no partsupp table so lineitem supplies the part-supplier "
    "pairs, and no s_comment so the complaint filter matches s_name) — "
    "NOT IN over a non-null dim key becomes a null-aware anti join that "
    "Catalyst simplifies to a plain left-anti, then COUNT(DISTINCT) "
    "expands per group",
    tags=("tpch", "subquery", "agg"),
)

shared_sql(
    "tpch_q17",
    "SELECT CAST(" + dsum_sql("l_extendedprice", scale=4)
    + " / 7.0 AS DOUBLE) AS avg_yearly "
    "FROM lineitem JOIN part ON p_partkey = l_partkey "
    "WHERE p_brand = 'Brand#23' "
    "AND l_quantity < ("
    "  SELECT 0.2 * " + davg_sql("l_quantity")
    + "  FROM lineitem l2 WHERE l2.l_partkey = p_partkey)",
    doc="TPC-H Q17 (small-quantity-order revenue, adapted: the fixture "
    "has no p_container so the brand predicate alone selects the part "
    "group) — the correlated scalar AVG subquery decorrelates to a "
    "grouped aggregate joined back on l_partkey; the threshold uses the "
    "order-independent decimal AVG so both engines compute the identical "
    "double before the 0.2 multiply, and l_quantity values are integral "
    "so the comparison never sits on an FP boundary",
    tags=("tpch", "subquery", "agg"),
)

shared_sql(
    "tpch_q21",
    "SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait "
    "FROM supplier "
    "JOIN lineitem l1 ON s_suppkey = l1.l_suppkey "
    "JOIN orders ON o_orderkey = l1.l_orderkey "
    "JOIN nation ON s_nationkey = n_nationkey "
    "WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R' "
    "AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3') "
    "AND EXISTS ("
    "  SELECT 1 FROM lineitem l2 "
    "  WHERE l2.l_orderkey = l1.l_orderkey "
    "  AND l2.l_suppkey <> l1.l_suppkey) "
    "AND NOT EXISTS ("
    "  SELECT 1 FROM lineitem l3 "
    "  WHERE l3.l_orderkey = l1.l_orderkey "
    "  AND l3.l_suppkey <> l1.l_suppkey "
    "  AND l3.l_returnflag = 'R') "
    "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100",
    doc="TPC-H Q21 (suppliers who kept orders waiting, adapted: a "
    "returned line (l_returnflag = 'R') stands in for a late delivery "
    "since the fixture has no commit/receipt dates) — the EXISTS "
    "decorrelates to a left-semi and the NOT EXISTS to a left-anti, both "
    "correlated on l_orderkey with a non-equi extra conjunct, chained on "
    "the same fact table; LIMIT carries a unique (numwait, s_name) "
    "tie-break",
    tags=("tpch", "subquery", "join", "topk"),
)

shared_sql(
    "tpch_q22",
    "SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust, "
    + dsum_sql("c_acctbal", scale=4)
    + " AS totacctbal FROM ("
    "  SELECT CAST(c_nationkey AS BIGINT) AS cntrycode, c_acctbal, "
    "         c_custkey "
    "  FROM customer WHERE c_nationkey IN (10, 13, 17, 18, 23) "
    "  AND c_acctbal > ("
    "    SELECT " + davg_sql("c_acctbal")
    + "    FROM customer WHERE c_acctbal > 0.0 "
    "    AND c_nationkey IN (10, 13, 17, 18, 23))"
    ") custsale "
    "WHERE NOT EXISTS ("
    "  SELECT 1 FROM orders WHERE o_custkey = c_custkey "
    "  AND o_orderpriority = '1-URGENT') "
    "GROUP BY cntrycode ORDER BY cntrycode",
    doc="TPC-H Q22 (global sales opportunity, adapted: c_nationkey "
    "stands in for the phone country code, and — because every fixture "
    "customer has orders — the anti join excludes customers with URGENT "
    "orders rather than any orders, keeping the result non-trivial) — "
    "an uncorrelated scalar AVG threshold (computed once, broadcast) "
    "plus a NOT EXISTS anti join; the threshold uses the "
    "order-independent decimal AVG so the > comparison is bit-identical "
    "across engines",
    tags=("tpch", "subquery", "agg"),
)

#: The fixture has no partsupp table; the remaining TPC-H queries that
#: need one (q2/q9) derive an equivalent from lineitem: the distinct
#: (partkey, suppkey) pairs that actually traded, with the minimum
#: observed line price as the supply cost.  MIN over 2-decimal doubles
#: is order-independent AND keeps every downstream product/sum at <= 4
#: decimals, so no double->DECIMAL cast ever lands on a halfway
#: rounding boundary (a unit-price MIN(l_extendedprice / l_quantity)
#: carries full 53-bit precision and was observed to round-trip one
#: group 1e-4 apart between Spark's exact BigDecimal rounding and
#: DuckDB's multiply-then-nearbyint decimal cast).
_PARTSUPP_CTE = (
    "WITH partsupp AS ("
    "  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey, "
    "         MIN(l_extendedprice) AS ps_supplycost "
    "  FROM lineitem GROUP BY l_partkey, l_suppkey) "
)

shared_sql(
    "tpch_q2",
    _PARTSUPP_CTE
    + "SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_supplycost "
    "FROM part "
    "JOIN partsupp ON p_partkey = ps_partkey "
    "JOIN supplier ON s_suppkey = ps_suppkey "
    "JOIN nation ON s_nationkey = n_nationkey "
    "JOIN region ON n_regionkey = r_regionkey "
    "WHERE p_type = 'LARGE' AND p_size BETWEEN 10 AND 20 "
    "AND r_name = 'EUROPE' "
    "AND ps_supplycost = ("
    "  SELECT MIN(ps2.ps_supplycost) "
    "  FROM partsupp ps2 "
    "  JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey "
    "  JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey "
    "  JOIN region r2 ON n2.n_regionkey = r2.r_regionkey "
    "  WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE') "
    "ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100",
    doc="TPC-H Q2 (minimum-cost supplier per European part in a size/type "
    "class) — the correlated MIN subquery decorrelates to a per-part "
    "aggregate joined back on ps_partkey; supply cost from the derived "
    "partsupp CTE, equality safe because MIN over 2-decimal doubles is "
    "bit-identical in both engines",
    tags=("tpch", "subquery", "join", "topk"),
    tables=("part", "supplier", "nation", "region", "lineitem"),
)

shared_sql(
    "tpch_q8",
    "SELECT o_year, CAST("
    + dsum_sql("CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END", scale=4)
    + " / " + dsum_sql("volume", scale=4)
    + " AS DOUBLE) AS mkt_share FROM ("
    "  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, "
    "         l_extendedprice * (1 - l_discount) AS volume, "
    "         n2.n_name AS nation "
    "  FROM part "
    "  JOIN lineitem ON p_partkey = l_partkey "
    "  JOIN supplier ON s_suppkey = l_suppkey "
    "  JOIN orders ON l_orderkey = o_orderkey "
    "  JOIN customer ON o_custkey = c_custkey "
    "  JOIN nation n1 ON c_nationkey = n1.n_nationkey "
    "  JOIN region ON n1.n_regionkey = r_regionkey "
    "  JOIN nation n2 ON s_nationkey = n2.n_nationkey "
    "  WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY' "
    "  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' "
    "  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'"
    ") all_nations "
    "GROUP BY o_year ORDER BY o_year",
    doc="TPC-H Q8 (national market share within a region, by year) — "
    "conditional-sum ratio over an 8-table star join with nation joined "
    "twice; both sums go through portable decimal so the final double "
    "division is bit-identical across engines",
    tags=("tpch", "join", "agg"),
)

shared_sql(
    "tpch_q9",
    _PARTSUPP_CTE
    + "SELECT nation, o_year, "
    + dsum_sql("amount", scale=4)
    + " AS sum_profit FROM ("
    "  SELECT n_name AS nation, "
    "         CAST(year(o_orderdate) AS BIGINT) AS o_year, "
    "         l_extendedprice * (1 - l_discount) "
    "           - ps_supplycost * l_quantity AS amount "
    "  FROM part "
    "  JOIN lineitem ON p_partkey = l_partkey "
    "  JOIN supplier ON s_suppkey = l_suppkey "
    "  JOIN partsupp ON ps_suppkey = l_suppkey AND ps_partkey = l_partkey "
    "  JOIN orders ON o_orderkey = l_orderkey "
    "  JOIN nation ON s_nationkey = n_nationkey "
    "  WHERE p_name LIKE '%widget%'"
    ") profit "
    "GROUP BY nation, o_year "
    "ORDER BY nation, o_year DESC",
    doc="TPC-H Q9 (product-type profit by nation and year, adapted: "
    "supply cost from the derived partsupp CTE since the fixture has no "
    "partsupp; p_name LIKE matches the fixture's word-pair names) — "
    "the profit expression is per-row IEEE arithmetic (deterministic), "
    "summed through portable decimal",
    tags=("tpch", "join", "agg"),
    tables=("part", "supplier", "nation", "orders", "lineitem"),
)

shared_sql(
    "tpch_q11",
    "SELECT ps_partkey, value FROM ("
    "  SELECT l_partkey AS ps_partkey, "
    + dsum_sql("l_extendedprice", scale=4)
    + " AS value "
    "  FROM lineitem "
    "  JOIN supplier ON l_suppkey = s_suppkey "
    "  JOIN nation ON s_nationkey = n_nationkey "
    "  WHERE n_name = 'NATION_3' "
    "  GROUP BY l_partkey"
    ") part_value "
    "WHERE value > ("
    "  SELECT " + dsum_sql("l_extendedprice", scale=4)
    + " * 0.001 "
    "  FROM lineitem "
    "  JOIN supplier ON l_suppkey = s_suppkey "
    "  JOIN nation ON s_nationkey = n_nationkey "
    "  WHERE n_name = 'NATION_3') "
    "ORDER BY value DESC, ps_partkey",
    doc="TPC-H Q11 (important stock identification, adapted: traded value "
    "per part from lineitem since the fixture has no partsupp/availqty) — "
    "grouped sum filtered against an uncorrelated global-sum scalar "
    "subquery scaled by a fraction; both sums decimal-portable so the "
    "threshold comparison is deterministic",
    tags=("tpch", "subquery", "agg"),
)

shared_sql(
    "tpch_q15",
    "WITH revenue AS ("
    "  SELECT l_suppkey AS supplier_no, "
    + dsum_sql("l_extendedprice * (1 - l_discount)", scale=4)
    + " AS total_revenue "
    "  FROM lineitem "
    "  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
    "  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00' "
    "  GROUP BY l_suppkey) "
    "SELECT s_suppkey, s_name, total_revenue "
    "FROM supplier JOIN revenue ON s_suppkey = supplier_no "
    "WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue) "
    "ORDER BY s_suppkey",
    doc="TPC-H Q15 (top supplier by quarterly revenue; the standard "
    "view+MAX formulation as a CTE) — the revenue CTE is evaluated for "
    "both the join and the MAX scalar; revenue is decimal-portable so "
    "the equality against MAX is bit-exact across engines",
    tags=("tpch", "subquery", "agg"),
    tables=("supplier", "lineitem"),
)

shared_sql(
    "tpch_q20",
    "SELECT s_name, s_acctbal "
    "FROM supplier JOIN nation ON s_nationkey = n_nationkey "
    "WHERE n_name = 'NATION_3' "
    "AND s_suppkey IN ("
    "  SELECT l_suppkey FROM lineitem "
    "  WHERE l_partkey IN ("
    "    SELECT p_partkey FROM part WHERE p_name LIKE '%widget%') "
    "  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
    "  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' "
    "  GROUP BY l_suppkey, l_partkey "
    "  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 30) "
    "ORDER BY s_name",
    doc="TPC-H Q20 (potential part promotion, adapted: a supplier "
    "qualifies when it shipped more than a quantity threshold of some "
    "promoted part in the year, replacing the availqty comparison the "
    "fixture cannot express) — nested IN subqueries (parts inside the "
    "supplier filter) with a grouped-HAVING threshold; both INs become "
    "semi joins",
    tags=("tpch", "subquery", "join"),
)
