"""Join inventory — SURVEY.md §2.3 J1-J11.

DataFrame-API implementations with explicit broadcast hints for the
dimension side (customer/nation/region are dimensions; orders/lineitem are
facts).  At 100 TB the facts shuffle on their join keys and the dims
broadcast — exactly the plan these queries produce on local[32] too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from . import register, shared_sql
from ..catalog import load_tables
from ..functions import dsum, dsum_sql
from ..operators.joins import asof_join, full_outer_anti_join, right_anti_join


# --- J1: inner equi-join (engine/src/parser.cpp:112-119) -------------------------
@register(
    "join_inner",
    oracle="SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice "
    "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
    "WHERE o.o_orderstatus = 'F'",
    doc="J1 inner equi-join, dim side broadcast (test_queries.txt:5)",
    tags=("join",),
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    orders = t["orders"].filter(F.col("o_orderstatus") == "F")
    return (
        orders.join(
            F.broadcast(t["customer"]),
            orders.o_custkey == t["customer"].c_custkey,
            "inner",
        )
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
    )


# --- J2: outer joins (engine/src/parser.cpp:101-103) -----------------------------
@register(
    "join_left",
    oracle="SELECT c.c_custkey, o.o_orderkey, o.o_totalprice "
    "FROM customer c LEFT JOIN "
    "(SELECT * FROM orders WHERE o_totalprice > 450000) o "
    "ON c.c_custkey = o.o_custkey",
    doc="J2 LEFT JOIN — unmatched customers surface with NULL order columns",
    tags=("join",),
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    big = t["orders"].filter(F.col("o_totalprice") > 450000)
    return (
        t["customer"]
        .join(big, t["customer"].c_custkey == big.o_custkey, "left")
        .select("c_custkey", "o_orderkey", "o_totalprice")
    )


@register(
    "join_right",
    oracle="SELECT c.c_custkey, o.o_orderkey "
    "FROM (SELECT * FROM orders WHERE o_totalprice > 450000) o "
    "RIGHT JOIN customer c ON o.o_custkey = c.c_custkey",
    doc="J2 RIGHT JOIN (same rows as join_left, exercised as its own plan)",
    tags=("join",),
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    big = t["orders"].filter(F.col("o_totalprice") > 450000)
    return (
        big.join(t["customer"], big.o_custkey == t["customer"].c_custkey, "right")
        .select("c_custkey", "o_orderkey")
    )


@register(
    "join_full",
    oracle="SELECT c.c_custkey, c.c_nationkey, s.s_suppkey, s.s_nationkey "
    "FROM (SELECT * FROM customer WHERE c_acctbal > 9900) c "
    "FULL JOIN (SELECT * FROM supplier WHERE s_acctbal > 9000) s "
    "ON c.c_nationkey = s.s_nationkey",
    doc="J2 FULL OUTER JOIN with NULLs on both sides",
    tags=("join",),
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "supplier"))
    c = t["customer"].filter(F.col("c_acctbal") > 9900)
    s = t["supplier"].filter(F.col("s_acctbal") > 9000)
    return (
        c.join(s, c.c_nationkey == s.s_nationkey, "full")
        .select("c_custkey", "c_nationkey", "s_suppkey", "s_nationkey")
    )


# --- J3: NATURAL JOIN (engine/src/parser.cpp:104) --------------------------------
# Fixture columns are prefixed (n_/r_), so the natural key is exposed via
# renaming subqueries — the NATURAL JOIN itself is genuine in both engines.
shared_sql(
    "join_natural",
    "SELECT n_nationkey, n_name, regionkey, r_name FROM "
    "(SELECT n_nationkey, n_name, n_regionkey AS regionkey FROM nation) AS n "
    "NATURAL JOIN "
    "(SELECT r_regionkey AS regionkey, r_name FROM region) AS r",
    doc="J3 NATURAL JOIN on the shared 'regionkey' column",
    tags=("join",),
)


# --- J4: anti-join family (engine/include/ast.h:10) ------------------------------
@register(
    "join_left_anti",
    oracle="SELECT c_custkey, c_name FROM customer c "
    "WHERE NOT EXISTS (SELECT 1 FROM orders o "
    "WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)",
    doc="J4 LEFT ANTI: customers with no large order (filtered right side "
    "keeps the result non-empty at every sf)",
    tags=("join",),
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    big = t["orders"].filter(F.col("o_totalprice") > 400000)
    return (
        t["customer"]
        .join(big, t["customer"].c_custkey == big.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


@register(
    "join_right_anti",
    oracle="SELECT c_custkey, c_name FROM customer c WHERE NOT EXISTS ("
    "SELECT 1 FROM orders o WHERE o.o_orderstatus = 'F' AND o.o_custkey = c.c_custkey)",
    doc="J4 RIGHT ANTI (reference parser.cpp:102): right-side rows with no "
    "left match; composed as swapped left_anti (operators/joins.py)",
    tags=("join",),
)
def join_right_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    f_orders = t["orders"].filter(F.col("o_orderstatus") == "F")
    out = right_anti_join(
        f_orders,
        t["customer"],
        f_orders.o_custkey == t["customer"].c_custkey,
    )
    return out.select("c_custkey", "c_name")


@register(
    "join_full_outer_anti",
    oracle="SELECT c.c_custkey, c.c_nationkey, s.s_suppkey, s.s_nationkey "
    "FROM (SELECT * FROM customer WHERE c_acctbal > 9900) c "
    "FULL JOIN (SELECT * FROM supplier WHERE s_acctbal > 9000) s "
    "ON c.c_nationkey = s.s_nationkey "
    "WHERE c.c_custkey IS NULL OR s.s_suppkey IS NULL",
    doc="J4 FULL OUTER ANTI (reference parser.cpp:103): rows unmatched on "
    "either side; composed full join + null filter (operators/joins.py)",
    tags=("join",),
)
def join_full_outer_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "supplier"))
    c = t["customer"].filter(F.col("c_acctbal") > 9900)
    s = t["supplier"].filter(F.col("s_acctbal") > 9000)
    out = full_outer_anti_join(
        c, s, c.c_nationkey == s.s_nationkey, "c_custkey", "s_suppkey"
    )
    return out.select("c_custkey", "c_nationkey", "s_suppkey", "s_nationkey")


# --- J11: semi join (absent in reference; TODO.md:24 lists IN-subquery) ----------
@register(
    "join_semi",
    oracle="SELECT c_custkey, c_name FROM customer c "
    "WHERE EXISTS (SELECT 1 FROM orders o "
    "WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)",
    doc="J11 LEFT SEMI: customers having at least one large order",
    tags=("join",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    big = t["orders"].filter(F.col("o_totalprice") > 400000)
    return (
        t["customer"]
        .join(big, t["customer"].c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
    )


# --- J5: comma join — R1 comma-join→INNER JOIN conversion is Catalyst-native ----
# (reference needed 4 layers of rewriting: engine/src/query_rewriter.cpp:41-215)
shared_sql(
    "join_comma",
    "SELECT c.c_name, o.o_orderkey FROM customer c, orders o "
    "WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 9000",
    doc="J5/R1: implicit comma join; Catalyst extracts the equi-condition "
    "from WHERE natively",
    tags=("join", "rewrite"),
)

# --- J6: cross join (sqlopt.cpp:648-652 penalizes these 1000x) -------------------
shared_sql(
    "join_cross",
    "SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n",
    doc="J6 CROSS JOIN (125 rows of region x nation)",
    tags=("join",),
)

# --- J10: theta / non-equi join (reference parses but ignores; parser.cpp:113-118)
shared_sql(
    "join_theta",
    "SELECT n1.n_name AS nation_a, n2.n_name AS nation_b "
    "FROM nation n1 JOIN nation n2 "
    "ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey",
    doc="J10 theta join: unordered nation pairs within a region "
    "(equi part hash-joins; inequality as post-filter)",
    tags=("join",),
)


# --- multi-way join: R6 join-ordering surface ------------------------------------
@register(
    "join_three_way",
    oracle="SELECT r.r_name, n.n_name, count(*) AS n_customers "
    "FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey "
    "JOIN region r ON n.n_regionkey = r.r_regionkey "
    "GROUP BY r.r_name, n.n_name",
    doc="J1 chain + R6: 3-way join (fact + 2 broadcast dims) with aggregation; "
    "Catalyst/CBO orders the joins (reference used Selinger DP, sqlopt.cpp:607-670)",
    tags=("join", "agg"),
)
def join_three_way(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "nation", "region"))
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(F.count("*").alias("n_customers"))
    )


# --- J10 extension: AS-OF join (absent in reference and in native Spark) --------
@register(
    "join_asof",
    oracle="""
SELECT e.event_id, e.user_id, e.ts,
       p.event_id AS asof_event_id, p.value AS asof_value
FROM (SELECT * FROM events WHERE event_type <> 'purchase') e
ASOF LEFT JOIN (
  SELECT user_id, ts, event_id, value FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id, ts
                                 ORDER BY event_id DESC) AS _rn
    FROM events WHERE event_type = 'purchase')
  WHERE _rn = 1) p
  ON e.user_id = p.user_id AND e.ts >= p.ts
""",
    doc="J10 as-of join: each non-purchase event matched to the user's most "
    "recent prior (or simultaneous) purchase; composed as tagged union + "
    "last(ignorenulls) window — one shuffle, no range join "
    "(operators/joins.py asof_join); oracle uses DuckDB's native ASOF JOIN. "
    "DuckDB's ASOF picks an UNSPECIFIED right row when several share the "
    "greatest ts <= left ts, so both engines dedupe the right side to the "
    "max-event_id row per (user_id, ts) first — the tie rule is explicit "
    "and identical, not an accident of engine internals",
    tags=("join", "events"),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("events",))
    ev = t["events"]
    left = ev.filter(F.col("event_type") != "purchase").select(
        "user_id", "ts", "event_id"
    )
    tie_w = W.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    right = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "event_id", "value")
        .withColumn("_rn", F.row_number().over(tie_w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    out = asof_join(
        left,
        right,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        payload_cols=["event_id", "value"],
        right_tiebreak="event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_event_id"),
        F.col("asof_value"),
    )


# --- TPC-H Q5 shape: 6-table join — the join-reorder stress query ----------------
@register(
    "tpch_q5",
    oracle="SELECT n.n_name, "
    + dsum_sql("l.l_extendedprice * (1 - l.l_discount)", scale=6)
    + " AS revenue "
    "FROM customer c "
    "JOIN orders o ON c.c_custkey = o.o_custkey "
    "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
    "JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey "
    "JOIN nation n ON s.s_nationkey = n.n_nationkey "
    "JOIN region r ON n.n_regionkey = r.r_regionkey "
    "WHERE r.r_name = 'ASIA' "
    "AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' "
    "AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00' "
    "GROUP BY n.n_name",
    doc="TPC-H Q5 local supplier volume: 6-table join chain; CBO/AQE order "
    "the joins (the reference's Selinger DP territory, sqlopt.cpp:607-670)",
    tags=("join", "agg", "bench"),
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark, sf_dir, ("customer", "orders", "lineitem", "supplier", "nation", "region")
    )
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    r = t["region"].filter(F.col("r_name") == "ASIA")
    return (
        t["lineitem"]
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=6).alias(
                "revenue"
            )
        )
    )


# --- J10 (cont.): range join, binned to an equi-join -----------------------------
@register(
    "join_range",
    oracle="""
WITH bands AS (
    SELECT CAST(i AS BIGINT) AS band_id,
           i * 20000.0 AS lo,
           i * 20000.0 + 50000.0 AS hi
    FROM range(30) AS r(i)
)
SELECT b.band_id, count(*) AS n_orders,
       """
    + dsum_sql("o.o_totalprice")
    + """ AS sum_price
FROM orders o JOIN bands b
  ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
GROUP BY b.band_id
""",
    doc="J10 range join: orders matched to overlapping price bands "
    "(lo <= price < hi) via range_join_binned — interval side exploded to "
    "bin ids, hash equi-join on bin, exact predicate as post-filter; never "
    "a nested-loop join (plan-asserted in tests/test_plans.py)",
    tags=("join",),
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import range_join_binned

    t = load_tables(spark, sf_dir, ("orders",))
    # 30 overlapping price bands: [i*20k, i*20k + 50k) — each order lands
    # in 2-3 bands, the non-degenerate (overlapping-interval) case
    bands = spark.range(30).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 20000.0).alias("lo"),
        (F.col("id") * 20000.0 + 50000.0).alias("hi"),
    )
    j = range_join_binned(t["orders"], bands, "o_totalprice", "lo", "hi", 25000.0)
    return j.groupBy("band_id").agg(
        F.count("*").alias("n_orders"), dsum("o_totalprice").alias("sum_price")
    )


_LATERAL_SPARK = (
    "SELECT c.c_custkey, o.o_orderkey, o.o_totalprice "
    "FROM customer c JOIN LATERAL ("
    "  SELECT o_orderkey, o_totalprice FROM orders "
    "  WHERE o_custkey = c.c_custkey "
    "  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) o "
    "ORDER BY c.c_custkey"
)

shared_sql(
    "join_lateral",
    _LATERAL_SPARK,
    # DuckDB requires an explicit ON for JOIN LATERAL; Spark requires its
    # absence — same semantics, one dialect token apart
    oracle=_LATERAL_SPARK.replace(") o ", ") o ON true "),
    doc="correlated LATERAL join: each customer's single most expensive "
    "order (top-1-per-row as a correlated subquery instead of a window "
    "rank) — Catalyst decorrelates the LIMIT-bearing subquery rather "
    "than re-executing it per row",
    tags=("join", "subquery"),
)


# --- skew-salted fact-fact join, graded against the plain join -------------------
@register(
    "join_skew_salted",
    oracle="SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_items, "
    + dsum_sql("l.l_extendedprice * (1 - l.l_discount)", scale=6)
    + " AS revenue "
    "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
    "GROUP BY o.o_orderpriority",
    doc="skew-salted fact-fact join (operators/skew.salted_join): each "
    "lineitem row gets a random salt, orders replicates once per salt, "
    "and the join key becomes (orderkey, salt) so a pathologically hot "
    "key spreads over 16 reducers instead of one — for the skew AQE's "
    "split can't fix and broadcast can't reach; the oracle is the PLAIN "
    "join, proving the rewrite is semantics-preserving (salt never "
    "leaks into results)",
    tags=("join", "skew"),
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join

    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    li = t["lineitem"].select(
        F.col("l_orderkey").alias("orderkey"),
        "l_extendedprice",
        "l_discount",
    )
    o = t["orders"].select(
        F.col("o_orderkey").alias("orderkey"), "o_orderpriority"
    )
    j = salted_join(li, o, on=["orderkey"], n_salts=16)
    return j.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_items"),
        dsum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=6
        ).alias("revenue"),
    )


@register(
    "join_hint_strategies",
    oracle="WITH j AS (SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_sup "
    "FROM nation JOIN supplier ON n_nationkey = s_nationkey "
    "GROUP BY n_name) "
    "SELECT 'broadcast' AS strategy, n_name, n_sup FROM j "
    "UNION ALL SELECT 'merge', n_name, n_sup FROM j "
    "UNION ALL SELECT 'shuffle_hash', n_name, n_sup FROM j "
    "ORDER BY strategy, n_name",
    doc="J7/J8/J9 graded end-to-end (new r6): the SAME equi-join executes "
    "under all three physical strategy hints — BROADCAST, SHUFFLE_MERGE "
    "(sort-merge), SHUFFLE_HASH — and the three tagged results must be "
    "identical to the hint-free oracle.  The reference cost-models all "
    "three algorithms but always instantiates nested-loop (SURVEY §4.3); "
    "here each hint genuinely changes the physical plan "
    "(tests/test_plans.py::test_join_strategy_hints asserts the operator "
    "per hint) and this query proves strategy choice never changes "
    "results — the property that makes per-stats algorithm selection "
    "safe at any scale",
    tags=("joins", "plans"),
)
def join_hint_strategies(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("nation", "supplier"))
    out = None
    for tag, hint in (
        ("broadcast", "BROADCAST"),
        ("merge", "SHUFFLE_MERGE"),
        ("shuffle_hash", "SHUFFLE_HASH"),
    ):
        j = (
            t["nation"].hint(hint)
            .join(
                t["supplier"],
                t["nation"]["n_nationkey"] == t["supplier"]["s_nationkey"],
            )
            .groupBy("n_name")
            .agg(F.count("*").cast("long").alias("n_sup"))
            .select(F.lit(tag).alias("strategy"), "n_name", "n_sup")
        )
        out = j if out is None else out.unionByName(j)
    return out.orderBy("strategy", "n_name")
