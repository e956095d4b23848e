"""Scans, projections, filters, predicates, arithmetic, sort/limit.

Covers SURVEY.md §2.1 (S1 scan), §2.2 (P1-P5), §2.5 (O1-O3).  Most queries
are ports of the reference's own corpus (``test_queries.txt``,
``test_complex_queries.sql``, ``test_query.sql``) onto the fixture schema
using the FIXTURES.md §C mapping (users→customer, orders→orders,
products→part).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import register, shared_sql
from ..catalog import load_tables

# --- S1/P1: scans & projection ------------------------------------------------
# reference: ScanNode engine/include/execution_plan.h:45-57; select-list parse
# engine/src/parser.cpp:45-67.  Port of test_queries.txt:2 "SELECT * FROM customer".
shared_sql(
    "scan_star",
    "SELECT * FROM customer",
    doc="S1+P1: full scan, star projection (test_queries.txt:2)",
    tags=("scan",),
)


@register(
    "scan_project",
    oracle="SELECT c_custkey, c_name FROM customer",
    doc="P1: column-pruned projection; Catalyst pushes ReadSchema to parquet "
    "(test_queries.txt:4 'SELECT c.firstname, c.lastname FROM customer c')",
    tags=("scan",),
)
def scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer",))
    return t["customer"].select("c_custkey", "c_name")


# --- P2/P3: filters & comparison predicates ------------------------------------
# reference: FilterNode engine/include/execution_plan.h:106-118; op set sqlopt.cpp:287-295
shared_sql(
    "filter_point",
    "SELECT * FROM customer WHERE c_custkey = 1",
    doc="P2+P3 '=': point filter (test_queries.txt:3)",
    tags=("filter",),
)

shared_sql(
    "filter_compare",
    "SELECT o_orderkey, o_totalprice FROM orders "
    "WHERE o_totalprice >= 400000 AND o_orderstatus <> 'P'",
    doc="P3: >=, <> comparison predicates",
    tags=("filter",),
)


@register(
    "filter_like",
    oracle="SELECT c_custkey, c_name FROM customer WHERE c_name LIKE 'Customer#00000%'",
    doc="P3 LIKE (test_queries.txt:11 \"firstname LIKE 'A%'\")",
    tags=("filter",),
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer",))
    return (
        t["customer"]
        .filter(F.col("c_name").like("Customer#00000%"))
        .select("c_custkey", "c_name")
    )


@register(
    "filter_between",
    oracle="SELECT c_custkey, c_name, c_acctbal FROM customer "
    "WHERE c_acctbal BETWEEN 100 AND 500",
    doc="P4 BETWEEN (test_query.sql:1 'age BETWEEN 20 AND 30') — first-class "
    "in Spark via Column.between, unlike the reference's text pass-through",
    tags=("filter",),
)
def filter_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer",))
    return (
        t["customer"]
        .filter(F.col("c_acctbal").between(100, 500))
        .select("c_custkey", "c_name", "c_acctbal")
    )


# Port of test_complex_queries.sql:3 — OR of conjunction groups, NOT IN, modulo.
shared_sql(
    "pred_compound",
    "SELECT c_custkey, c_name FROM customer "
    "WHERE (c_acctbal >= 100 AND c_acctbal <= 5000) "
    "OR (c_mktsegment NOT IN ('BUILDING', 'AUTOMOBILE') AND c_custkey % 2 = 0)",
    doc="P4 OR/NOT/IN + P5 '%' (test_complex_queries.sql:3)",
    tags=("filter",),
)

shared_sql(
    "pred_in_list",
    "SELECT o_orderkey, o_orderstatus FROM orders "
    "WHERE o_orderstatus IN ('F', 'O') AND o_orderpriority IN ('1-URGENT', '2-HIGH')",
    doc="P4 IN-list (test_complex_queries.sql:1 \"status IN ('shipped','delivered')\")",
    tags=("filter",),
)

# --- P5: arithmetic in expressions ---------------------------------------------
# Port of test_complex_queries.sql:4 "WHERE amount + 10 > 50 AND amount * 0.9 < 100".
# Per-row double arithmetic is IEEE-deterministic, so SELECT * stays hash-safe.
shared_sql(
    "arith_filter",
    "SELECT * FROM orders WHERE o_totalprice + 10 > 50000 AND o_totalprice * 0.9 < 200000",
    doc="P5: arithmetic inside predicates (test_complex_queries.sql:4)",
    tags=("filter", "arith"),
)


@register(
    "arith_project",
    oracle="SELECT o_orderkey, o_totalprice * 1.1 AS amount_with_tax FROM orders "
    "WHERE o_orderstatus = 'F'",
    doc="P5: arithmetic in select list (test_queries.txt:12 'SUM(o.amount * 1.1)')",
    tags=("arith",),
)
def arith_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    return (
        t["orders"]
        .filter(F.col("o_orderstatus") == "F")
        .select(
            "o_orderkey",
            (F.col("o_totalprice") * 1.1).alias("amount_with_tax"),
        )
    )


# --- CASE expression (lexed-only keyword in the reference, lexer.cpp:36) --------
shared_sql(
    "case_when",
    "SELECT c_custkey, "
    "CASE WHEN c_acctbal < 0 THEN 'debt' "
    "     WHEN c_acctbal < 5000 THEN 'mid' "
    "     ELSE 'high' END AS bal_band "
    "FROM customer",
    doc="P4 CASE (keyword-only in reference; first-class here)",
    tags=("filter",),
)

# --- O1/O2/O3: sort, limit, fused top-k ------------------------------------------
# reference: OrderItem ast.h:24, sort cost cost_estimator.cpp:71-83, LIMIT
# parser.cpp:173-176.  Spark fuses ORDER BY+LIMIT into TakeOrderedAndProject.
shared_sql(
    "orderby_multi",
    "SELECT c_custkey, c_nationkey, c_acctbal FROM customer "
    "ORDER BY c_nationkey ASC, c_acctbal DESC, c_custkey LIMIT 100",
    doc="O1 multi-key ASC/DESC sort + O2 LIMIT (test_queries.txt:8)",
    tags=("sort",),
)


@register(
    "topk",
    oracle="SELECT c_custkey, c_name, c_acctbal FROM customer "
    "ORDER BY c_acctbal DESC, c_custkey LIMIT 10",
    doc="O3 top-k: ORDER BY+LIMIT fused by Spark into TakeOrderedAndProject "
    "(unique tie-break key keeps the result deterministic)",
    tags=("sort",),
)
def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer",))
    return (
        t["customer"]
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .select("c_custkey", "c_name", "c_acctbal")
        .limit(10)
    )


# --- Scalar-function surface (absent in reference, SURVEY.md §2.7) ---------------
# One query exercising the string/math library; text identical in both
# dialects (dayofweek/round excluded: engine semantics differ).
shared_sql(
    "scalar_functions",
    "SELECT c_custkey, "
    "upper(c_name) AS name_upper, "
    "lower(c_mktsegment) AS seg_lower, "
    "substring(c_name, 10, 5) AS name_mid, "
    "length(c_name) AS name_len, "
    "lpad(CAST(c_nationkey AS STRING), 4, '0') AS nation_padded, "
    "concat(c_name, ':', c_mktsegment) AS name_seg, "
    "abs(c_acctbal) AS bal_abs, "
    # floor/ceil: BIGINT in Spark but DOUBLE in DuckDB — pin the type
    "CAST(floor(c_acctbal) AS BIGINT) AS bal_floor, "
    "CAST(ceil(c_acctbal) AS BIGINT) AS bal_ceil, "
    "sqrt(abs(c_acctbal)) AS bal_sqrt, "
    "power(CAST(c_nationkey AS DOUBLE), 2) AS nation_sq, "
    "mod(c_custkey, 7) AS key_mod "
    "FROM customer",
    doc="scalar string/math functions (reference has none — §2.7)",
    tags=("functions",),
)

shared_sql(
    "date_functions",
    "SELECT o_orderkey, "
    "year(o_orderdate) AS yr, "
    "month(o_orderdate) AS mo, "
    "dayofmonth(o_orderdate) AS dom, "
    "CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start, "
    "CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS week_start "
    "FROM orders WHERE o_orderkey < 500",
    doc="date/time extraction and truncation (reference has none — §2.7)",
    tags=("functions",),
)


# --- NULL semantics: null-safe equality, NULLIF/COALESCE -------------------------
@register(
    "null_semantics",
    oracle="SELECT o_orderkey, "
    "NULLIF(o_orderstatus, 'P') AS status_or_null, "
    "COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_filled, "
    "(NULLIF(o_orderstatus, 'P') IS NOT DISTINCT FROM NULL) AS is_pending "
    "FROM orders WHERE o_orderkey < 200",
    doc="NULL handling: NULLIF/COALESCE and null-safe comparison (Spark "
    "<=> == DuckDB IS NOT DISTINCT FROM); fixtures have no native NULLs, "
    "NULLIF manufactures them",
    tags=("filter",),
)
def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    status_or_null = F.expr("NULLIF(o_orderstatus, 'P')")
    return (
        t["orders"]
        .filter(F.col("o_orderkey") < 200)
        .select(
            "o_orderkey",
            status_or_null.alias("status_or_null"),
            F.coalesce(status_or_null, F.lit("PENDING")).alias("status_filled"),
            status_or_null.eqNullSafe(F.lit(None)).alias("is_pending"),
        )
    )


@register(
    "filter_regex",
    oracle="SELECT c_custkey, c_name FROM customer "
    "WHERE regexp_matches(c_name, 'Customer#0*1[0-9]{2}$')",
    doc="regex predicate (Spark RLIKE / DuckDB regexp_matches — both "
    "unanchored searches)",
    tags=("filter",),
)
def filter_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer",))
    return (
        t["customer"]
        .filter(F.col("c_name").rlike("Customer#0*1[0-9]{2}$"))
        .select("c_custkey", "c_name")
    )


# --- GROUP BY ALL (same text both engines — parity by construction) --------------
shared_sql(
    "group_by_all_report",
    "SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
    "CAST(SUM(n_chars) AS BIGINT) AS total_chars "
    "FROM documents GROUP BY ALL",
    doc="GROUP BY ALL (every non-aggregate select item becomes a key) — "
    "the corpus-composition report spelled the way analysts actually "
    "write it; Spark and DuckDB both resolve ALL to (lang, source), so "
    "one SQL text serves as both implementation and oracle",
    tags=("agg",),
)
