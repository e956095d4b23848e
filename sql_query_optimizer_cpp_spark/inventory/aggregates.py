"""Aggregation inventory — SURVEY.md §2.4 A1-A5, plus the Spark extensions
(rollup/cube/grouping sets) the reference lacks.

Every SUM/AVG over doubles goes through the DECIMAL trick in
``functions.dsum`` so results are order-independent and hash-identical to
the DuckDB oracle (partial map-side aggregation stays enabled — decimal sums
are still associative and Catalyst still plans partial_sum → final_sum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import register, shared_sql
from ..catalog import load_tables
from ..functions import davg_sql, dsum, dsum_sql, pround, pround_sql


# --- A2: global aggregates, no grouping (test_queries.txt:6 COUNT(*)) ------------
@register(
    "agg_global",
    oracle="SELECT COUNT(*) AS n_orders, "
    + dsum_sql("o_totalprice")
    + " AS total_price, MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price "
    "FROM orders",
    doc="A2 COUNT/SUM/MIN/MAX without GROUP BY",
    tags=("agg",),
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    return t["orders"].agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


# --- A1+A2: hash aggregate with grouping (plan_generator.cpp:180-200) ------------
@register(
    "agg_groupby",
    oracle="SELECT o_orderstatus, COUNT(*) AS n, "
    + dsum_sql("o_totalprice")
    + " AS total, "
    + davg_sql("o_totalprice")
    + " AS avg_price, MIN(o_orderdate) AS first_order, MAX(o_orderdate) AS last_order "
    "FROM orders GROUP BY o_orderstatus",
    doc="A1 GROUP BY + A2 all five aggregate functions",
    tags=("agg",),
)
def agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    return t["orders"].groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        dsum("o_totalprice").alias("total"),
        (dsum("o_totalprice", scale=6) / F.count("o_totalprice")).alias("avg_price"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
    )


# --- A3: HAVING — port of test_complex_queries.sql:1 ------------------------------
# "SELECT u.name, SUM(o.amount * 1.1) AS total FROM users u INNER JOIN orders o
#  ... GROUP BY u.name HAVING SUM(o.amount) > 100 ORDER BY total DESC LIMIT 5"
@register(
    "agg_having",
    oracle="SELECT c.c_name, "
    + dsum_sql("o.o_totalprice * 1.1", scale=6)
    + " AS total "
    "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
    "WHERE c.c_acctbal > 0 AND o.o_orderstatus IN ('F', 'O') "
    "GROUP BY c.c_name "
    "HAVING " + dsum_sql("o.o_totalprice") + " > 1000000 "
    "ORDER BY total DESC, c_name LIMIT 5",
    doc="A3 HAVING with aggregate expression (test_complex_queries.sql:1)",
    tags=("agg", "sort"),
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    c = t["customer"].filter(F.col("c_acctbal") > 0)
    o = t["orders"].filter(F.col("o_orderstatus").isin("F", "O"))
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name")
        .agg(
            dsum(F.col("o_totalprice") * 1.1, scale=6).alias("total"),
            dsum("o_totalprice").alias("_sum_raw"),
        )
        .filter(F.col("_sum_raw") > 1000000)
        .orderBy(F.col("total").desc(), F.col("c_name"))
        .select("c_name", "total")
        .limit(5)
    )


# --- A4: DISTINCT (reference drops it from regenerated SQL — TODO.md:31; we don't)
@register(
    "agg_distinct",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    doc="A4 DISTINCT (test_queries.txt:7; reference bug TODO.md:31 fixed here)",
    tags=("agg",),
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer",))
    return t["customer"].select("c_mktsegment", "c_nationkey").distinct()


@register(
    "agg_count_distinct",
    oracle="SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_customers "
    "FROM orders GROUP BY o_orderstatus",
    doc="A4 COUNT(DISTINCT) — expand+two-phase aggregate in Spark",
    tags=("agg",),
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    return (
        t["orders"]
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n_customers"))
    )


# --- A5 extensions: rollup / cube / grouping sets (absent in reference) ----------
@register(
    "agg_rollup",
    oracle="SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, "
    + dsum_sql("o_totalprice")
    + " AS total FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)",
    doc="A5 ROLLUP: hierarchical subtotals incl. grand total",
    tags=("agg",),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    return t["orders"].rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), dsum("o_totalprice").alias("total")
    )


@register(
    "agg_cube",
    oracle="SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n "
    "FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)",
    doc="A5 CUBE: all grouping combinations",
    tags=("agg",),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    return (
        t["orders"]
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


shared_sql(
    "agg_grouping_sets",
    "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n FROM orders "
    "GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())",
    doc="A5 GROUPING SETS",
    tags=("agg",),
)


# --- TPC-H Q1 shape: the canonical scan-heavy aggregation (bench headline) -------
@register(
    "tpch_q1",
    oracle="SELECT l_returnflag, l_linestatus, "
    + dsum_sql("l_quantity")
    + " AS sum_qty, "
    + dsum_sql("l_extendedprice")
    + " AS sum_base_price, "
    + dsum_sql("l_extendedprice * (1 - l_discount)", scale=6)
    + " AS sum_disc_price, "
    + dsum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", scale=6)
    + " AS sum_charge, "
    + davg_sql("l_quantity")
    + " AS avg_qty, "
    + davg_sql("l_extendedprice")
    + " AS avg_price, "
    + davg_sql("l_discount")
    + " AS avg_disc, COUNT(*) AS count_order "
    "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' "
    "GROUP BY l_returnflag, l_linestatus",
    doc="TPC-H Q1 pricing summary: one wide scan, 8 aggregates, partial agg "
    "map-side; the scan-throughput headline query",
    tags=("agg", "bench"),
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem",))
    li = t["lineitem"].filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus").agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price, scale=6).alias("sum_disc_price"),
            dsum(charge, scale=6).alias("sum_charge"),
            (dsum("l_quantity", scale=6) / F.count("l_quantity")).alias("avg_qty"),
            (dsum("l_extendedprice", scale=6) / F.count("l_extendedprice")).alias(
                "avg_price"
            ),
            (dsum("l_discount", scale=6) / F.count("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --- TPC-H Q3 shape: join-heavy bench headline ------------------------------------
@register(
    "tpch_q3",
    oracle="SELECT l.l_orderkey, "
    + dsum_sql("l.l_extendedprice * (1 - l.l_discount)", scale=6)
    + " AS revenue, o.o_orderdate, o.o_orderpriority "
    "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
    "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
    "WHERE c.c_mktsegment = 'BUILDING' "
    "AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00' "
    "AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00' "
    "GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority "
    "ORDER BY revenue DESC, l_orderkey LIMIT 10",
    doc="TPC-H Q3 shipping priority: selective dim filter broadcast into "
    "fact-fact join + top-k",
    tags=("join", "agg", "bench"),
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    cutoff = F.lit("1998-03-15").cast("timestamp")
    c = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    o = t["orders"].filter(F.col("o_orderdate") < cutoff)
    li = t["lineitem"].filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=6).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .limit(10)
    )


# --- Ports of the reference's remaining complex-query corpus ----------------------
# test_complex_queries.sql:2 — LEFT JOIN folded to inner by the o-filter,
# mixed join chain + BETWEEN + ORDER BY count.
shared_sql(
    "complex_q2",
    "SELECT p.p_name, COUNT(*) AS order_count "
    "FROM part p LEFT JOIN lineitem l ON p.p_partkey = l.l_partkey "
    "JOIN orders o ON l.l_orderkey = o.o_orderkey "
    "WHERE p.p_retailprice BETWEEN 900 AND 950 AND o.o_orderstatus = 'F' "
    "GROUP BY p.p_name "
    "ORDER BY order_count DESC, p_name LIMIT 20",
    doc="reference test_complex_queries.sql:2 ported (products->part, "
    "order_items->lineitem); Catalyst folds the LEFT JOIN to inner since "
    "the WHERE references the right side",
    tags=("join", "agg"),
)

# test_complex_queries.sql:5 — 4-table chain + DISTINCT + arithmetic + OR/LIKE.
shared_sql(
    "complex_q5",
    "SELECT DISTINCT c.c_name, p.p_name, "
    "o.o_totalprice + l.l_quantity * p.p_retailprice AS total_value "
    "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
    "JOIN lineitem l ON o.o_orderkey = l.l_orderkey "
    "JOIN part p ON l.l_partkey = p.p_partkey "
    "WHERE c.c_acctbal > 0 AND o.o_orderstatus = 'P' AND p.p_retailprice > 0 "
    "AND (l.l_quantity > 30 OR p.p_name LIKE '%1%') "
    "ORDER BY total_value DESC, c_name, p_name LIMIT 10",
    doc="reference test_complex_queries.sql:5 ported: 4-table join, "
    "DISTINCT, select-list arithmetic, OR/LIKE predicate, top-k",
    tags=("join", "agg", "sort"),
)


# --- Pivot (extension; reference lacks set ops entirely) --------------------------
@register(
    "agg_pivot",
    oracle="SELECT o_orderstatus, "
    "CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS p_urgent, "
    "CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS p_high, "
    "CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS p_medium, "
    "CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS p_notspec, "
    "CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS p_low "
    "FROM orders GROUP BY o_orderstatus",
    doc="pivot: order counts by status x priority (oracle as CASE sums)",
    tags=("agg",),
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    piv = (
        t["orders"]
        .groupBy("o_orderstatus")
        .pivot(
            "o_orderpriority",
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
        )
        .count()
    )
    renames = {
        "1-URGENT": "p_urgent",
        "2-HIGH": "p_high",
        "3-MEDIUM": "p_medium",
        "4-NOT SPECIFIED": "p_notspec",
        "5-LOW": "p_low",
    }
    for old, new in renames.items():
        piv = piv.withColumnRenamed(old, new)
    # pivot emits NULL for empty cells; counts should read 0
    return piv.select(
        "o_orderstatus",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in renames.values()],
    )


# --- Percentiles (extension: exact linear-interpolation quantiles) ---------------
@register(
    "agg_percentiles",
    oracle="SELECT o_orderstatus, "
    "round(CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE), 4) AS p50, "
    "round(CAST(quantile_cont(o_totalprice, 0.9) AS DOUBLE), 4) AS p90 "
    "FROM orders GROUP BY o_orderstatus",
    doc="exact percentiles (type-7 linear interpolation in both engines; "
    "rounded to 4dp — the two engines interpolate with algebraically equal "
    "but FP-different formulas)",
    tags=("agg",),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    return (
        t["orders"]
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        )
    )


# --- Approximate distinct (tolerance assertion: oracle-exact on booleans) --------
@register(
    "agg_approx_distinct",
    # HLL sketch VALUES are engine-specific, but the accuracy CONTRACT is
    # not: each engine asserts its own estimate against its own exact count
    # with the same 5% tolerance, and both emit identical `true` rows —
    # turning the approx query into a hash-matched check instead of the
    # weaker rows-only one.
    oracle="SELECT o_orderstatus, "
    "abs(approx_count_distinct(o_custkey) - count(DISTINCT o_custkey)) "
    "<= 0.05 * count(DISTINCT o_custkey) AS within_tol "
    "FROM orders GROUP BY o_orderstatus",
    doc="approx_count_distinct (HLL) graded as a tolerance assertion: "
    "|approx - exact| <= 5% of exact per group, in BOTH engines — the "
    "sketch estimates differ, the accuracy guarantee matches; the exact "
    "twin agg_count_distinct is value-compared",
    tags=("agg",),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    # rsd=0.01 (not the 0.05 default): rsd is a standard deviation, not a
    # bound — asserting |err| <= 1σ fails ~⅓ of the time by construction
    # (observed 4.8–5.7% low on the ~1.4K-cardinality fixture groups).  At
    # rsd=0.01 the 5% tolerance has ~5σ headroom; DuckDB's default sketch
    # sits at ~0.7% error, so both engines emit all-true deterministically.
    return (
        t["orders"]
        .groupBy("o_orderstatus")
        .agg(
            (
                F.abs(
                    F.approx_count_distinct("o_custkey", 0.01)
                    - F.countDistinct("o_custkey")
                )
                <= 0.05 * F.countDistinct("o_custkey")
            ).alias("within_tol")
        )
    )


# --- TPC-H Q6: pure filter-aggregate (scan-throughput floor) ---------------------
@register(
    "tpch_q6",
    oracle="SELECT "
    + dsum_sql("l_extendedprice * l_discount", scale=6)
    + " AS revenue FROM lineitem "
    "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
    "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' "
    "AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24",
    doc="TPC-H Q6 forecasting revenue change: the pure pushdown+scan+agg "
    "query — every predicate reaches the parquet reader",
    tags=("agg", "bench"),
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem",))
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), scale=6).alias("revenue")
    )


# --- TPC-H Q14: conditional-aggregate ratio ---------------------------------------
@register(
    "tpch_q14",
    oracle="SELECT 100.0 * "
    + dsum_sql(
        "CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) "
        "ELSE 0 END",
        scale=6,
    )
    + " / "
    + dsum_sql("l.l_extendedprice * (1 - l.l_discount)", scale=6)
    + " AS promo_revenue_pct "
    "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
    "WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
    "AND l.l_shipdate < TIMESTAMP '1996-02-01 00:00:00'",
    doc="TPC-H Q14 promo revenue: ratio of two decimal-exact conditional "
    "sums (division of identical doubles — deterministic in both engines)",
    tags=("agg", "join"),
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * dsum(promo, scale=6)
                / dsum(disc_price, scale=6)
            ).alias("promo_revenue_pct")
        )
    )


# --- FILTER-clause aggregates (modern conditional aggregation, both dialects) ----
shared_sql(
    "agg_filter_clause",
    "SELECT o_orderstatus, "
    "COUNT(*) AS n, "
    "COUNT(*) FILTER (WHERE o_totalprice > 300000) AS n_large, "
    "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) "
    "FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE) AS urgent_total "
    "FROM orders GROUP BY o_orderstatus",
    doc="FILTER (WHERE ...) conditional aggregates — identical syntax in "
    "Spark 4 and DuckDB",
    tags=("agg",),
)


# --- Approximate quantiles (tolerance assertion, like agg_approx_distinct) -------
@register(
    "agg_approx_quantile",
    # Sketch VALUES differ by construction (Spark: Greenwald-Khanna rank
    # sketch at accuracy=10000; DuckDB: t-digest), so each engine asserts
    # its own estimate against its own exact quantile with the same 2%
    # value tolerance and the booleans are hash-compared.  Headroom math
    # (the agg_approx_distinct lesson): worst observed error on the
    # fixtures is 0.162% (DuckDB t-digest, sf0.01) — 2% is ~12x that,
    # while Spark's rank-error bound at accuracy=10000 is ~0.01%.
    oracle="SELECT o_orderstatus, "
    "abs(approx_quantile(o_totalprice, 0.5) - quantile_cont(o_totalprice, 0.5)) "
    "<= 0.02 * quantile_cont(o_totalprice, 0.5) AS within_tol "
    "FROM orders GROUP BY o_orderstatus",
    doc="approx_percentile graded as a tolerance assertion: |approx p50 - "
    "exact p50| <= 2% of exact per group in BOTH engines; the exact twin "
    "agg_percentiles is value-compared",
    tags=("agg", "approx"),
)
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    return (
        t["orders"]
        .groupBy("o_orderstatus")
        .agg(
            (
                F.abs(
                    F.expr("approx_percentile(o_totalprice, 0.5, 10000)")
                    - F.expr("percentile(o_totalprice, 0.5)")
                )
                <= 0.02 * F.expr("percentile(o_totalprice, 0.5)")
            ).alias("within_tol")
        )
    )


# --- Array aggregation (nested result types round-trip both engines) -------------
def agg_array_collect_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The array-typed variant: per-status sorted customer-key LIST column.

    collect_list is arrival-order nondeterministic, so array_sort is what
    makes the result comparable at all — across engines AND across Spark's
    own partitionings.  NOT driver-graded: the driver's pandas-based hash
    compare cannot factorize a top-level array column (r04 red:
    ``TypeError: unhashable type 'list'``), so the graded query below
    serializes it and this variant is asserted by the local suite
    (tests/test_operators.py::test_array_collect_roundtrip).
    """
    t = load_tables(spark, sf_dir, ("orders",))
    return (
        t["orders"]
        .filter(F.col("o_custkey") < 50)
        .groupBy("o_orderstatus")
        .agg(
            F.array_sort(F.collect_list("o_custkey")).alias("custkeys"),
            F.count("*").cast("long").alias("n"),
        )
    )


@register(
    "agg_array_collect",
    oracle="SELECT o_orderstatus, "
    "array_to_string(list_sort(list(o_custkey)), ',') AS custkeys, "
    "CAST(len(list(o_custkey)) AS BIGINT) AS n "
    "FROM orders WHERE o_custkey < 50 GROUP BY o_orderstatus",
    doc="array-valued aggregation, graded through a serialized projection: "
    "the per-status sorted customer-key list is built as a real "
    "array<bigint> (array_sort(collect_list)) then array_join-ed to a "
    "scalar string for the driver's pandas hash compare, which cannot "
    "factorize top-level list cells (the r04 red); the array-typed "
    "variant stays covered by the local suite",
    tags=("agg",),
)
def agg_array_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg_array_collect_arrays(spark, sf_dir).select(
        "o_orderstatus",
        F.array_join(
            F.transform(F.col("custkeys"), lambda x: x.cast("string")), ","
        ).alias("custkeys"),
        "n",
    )


# --- Ordered string aggregation (listagg / string_agg dialect pair) --------------
@register(
    "agg_listagg",
    oracle="SELECT o_orderstatus, "
    "string_agg(CAST(o_custkey AS VARCHAR), ',' "
    "ORDER BY o_custkey, o_orderkey) AS keys "
    "FROM orders WHERE o_custkey < 10 GROUP BY o_orderstatus",
    doc="ordered string aggregation — Spark listagg WITHIN GROUP vs "
    "DuckDB string_agg ORDER BY (same semantics, different spellings); "
    "the WITHIN GROUP ordering with a unique tie-break is what makes a "
    "concatenated string deterministic at all",
    tags=("agg",),
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import register_views

    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        "SELECT o_orderstatus, "
        "listagg(CAST(o_custkey AS STRING), ',') "
        "WITHIN GROUP (ORDER BY o_custkey, o_orderkey) AS keys "
        "FROM orders WHERE o_custkey < 10 GROUP BY o_orderstatus"
    )


# --- Mergeable HLL sketches (partial sketch -> union -> estimate) ----------------
@register(
    "agg_hll_union",
    # Like agg_approx_distinct: sketch BYTES are engine-specific, the
    # accuracy contract is not — each engine asserts its own estimate
    # against its own exact count and both emit identical (group, exact,
    # true) rows.
    oracle="SELECT o_orderpriority, "
    "CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact, "
    "abs(approx_count_distinct(o_custkey) - count(DISTINCT o_custkey)) "
    "<= 0.05 * count(DISTINCT o_custkey) AS within_tol "
    "FROM orders GROUP BY o_orderpriority",
    doc="mergeable-sketch distinct counting: per-(shard, group) Apache "
    "DataSketches HLL partials (hll_sketch_agg over o_orderkey%2 shards) "
    "merged with hll_union_agg, then estimated — the pre-aggregation "
    "pattern behind every incremental/rollup distinct-count at scale "
    "(sketches re-aggregate, COUNT(DISTINCT) does not); graded as a "
    "tolerance assertion at lgConfigK=14 (~0.8% rse, so the 5% check has "
    "~6 sigma of headroom)",
    tags=("agg",),
)
def agg_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    partials = (
        t["orders"]
        .withColumn("shard", F.col("o_orderkey") % 2)
        .groupBy("shard", "o_orderpriority")
        .agg(F.hll_sketch_agg("o_custkey", F.lit(14)).alias("sk"))
    )
    merged = partials.groupBy("o_orderpriority").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx")
    )
    exact = (
        t["orders"]
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n_exact"))
    )
    return exact.join(merged, "o_orderpriority").select(
        "o_orderpriority",
        "n_exact",
        (
            F.abs(F.col("approx") - F.col("n_exact"))
            <= 0.05 * F.col("n_exact")
        ).alias("within_tol"),
    )


# --- Weighted average (ratio of two exact decimal sums) --------------------------
@register(
    "agg_weighted_avg",
    oracle="SELECT l_returnflag, "
    + pround_sql(
        "CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(28,6))) "
        "AS DOUBLE) / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)",
        6,
    )
    + " AS w_avg_price, CAST(count(*) AS BIGINT) AS n "
    "FROM lineitem GROUP BY l_returnflag",
    doc="quantity-weighted average price per return flag: "
    "sum(w*x)/sum(w) with BOTH sums decimal-exact (the per-row double "
    "product is IEEE-portable, the aggregation order-independent) and "
    "one final division — the only correct way to average under "
    "non-uniform weights, and still one map-side-combinable aggregation",
    tags=("agg",),
)
def agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem",))
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            pround(
                F.sum(
                    (F.col("l_extendedprice") * F.col("l_quantity")).cast(
                        "decimal(28,6)"
                    )
                ).cast("double")
                / F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast(
                    "double"
                ),
                6,
            ).alias("w_avg_price"),
            F.count("*").cast("long").alias("n"),
        )
    )


# --- skew-salted two-phase aggregation, graded against the direct groupBy --------
@register(
    "agg_skew_salted",
    oracle="SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n, "
    + dsum_sql("l_quantity")
    + " AS total_qty FROM lineitem GROUP BY l_suppkey",
    doc="skew-salted two-phase aggregation (operators/skew.salted_agg): "
    "phase 1 aggregates on (key, salt) spreading a hot key over 16 "
    "partitions, phase 2 merges per-salt partials (count->sum, "
    "decimal-sum->sum) — for the single-group-dominates case where the "
    "hot partition's hash map overflows even with map-side combine; the "
    "oracle is the DIRECT groupBy, proving the two-phase rewrite exact",
    tags=("agg", "skew"),
)
def agg_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_agg

    t = load_tables(spark, sf_dir, ("lineitem",))
    return salted_agg(
        t["lineitem"],
        ["l_suppkey"],
        {
            "n": (F.count("*").cast("long"), F.sum("n").cast("long")),
            "total_qty": (
                F.sum(F.col("l_quantity").cast("decimal(18,2)")),
                F.sum("total_qty").cast("double"),
            ),
        },
    )


# --- GROUPING() markers under grouping sets --------------------------------------
@register(
    "agg_grouping_id",
    oracle="SELECT o_orderstatus, o_orderpriority, "
    "CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status, "
    "CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority, "
    "CAST(count(*) AS BIGINT) AS n, "
    + dsum_sql("o_totalprice")
    + " AS total "
    "FROM orders GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), "
    "(o_orderstatus), ())",
    doc="GROUPING() markers under grouping sets: the per-column 0/1 flag "
    "that tells a subtotal row apart from a genuine NULL group value — "
    "without it, rollup output over nullable keys is ambiguous; one "
    "expanded aggregation, identical semantics both engines",
    tags=("agg",),
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import register_views

    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        "SELECT o_orderstatus, o_orderpriority, "
        "CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status, "
        "CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority, "
        "CAST(count(*) AS BIGINT) AS n, "
        + dsum_sql("o_totalprice")
        + " AS total "
        "FROM orders GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), "
        "(o_orderstatus), ())"
    )


# --- Pearson correlation from exact integer/decimal moments ----------------------
@register(
    "agg_corr_moments",
    # moments are exact DECIMAL sums; the corr formula is then evaluated in
    # double with IDENTICAL spelling on both engines — every *, -, /, sqrt
    # is IEEE correctly-rounded over identical inputs, so bits match
    # without trusting either engine's native corr() accumulation order
    oracle="""
WITH m AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
  FROM lineitem GROUP BY 1)
SELECT l_returnflag, n,
       CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx > 0
             AND CAST(n AS DOUBLE) * syy - sy * sy > 0
            THEN round((CAST(n AS DOUBLE) * sxy - sx * sy)
                 / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)
                    * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)), 6)
            ELSE NULL END AS corr_qty_price
FROM m""",
    doc="Pearson correlation of quantity vs extendedprice per returnflag, "
    "computed from exact decimal moments (one combinable aggregation — "
    "the map-side-combine shape that scales) instead of the engines' "
    "native corr(), whose float accumulation order differs per "
    "partitioning; the closed-form double arithmetic is spelled "
    "identically on both sides so the result is bit-stable",
    tags=("agg",),
)
def agg_corr_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem",))
    dq = F.col("l_quantity").cast("decimal(18,2)")
    de = F.col("l_extendedprice").cast("decimal(18,2)")
    m = t["lineitem"].groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(dq).cast("double").alias("sx"),
        F.sum(de).cast("double").alias("sy"),
        F.sum(dq * de).cast("double").alias("sxy"),
        F.sum(dq * dq).cast("double").alias("sxx"),
        F.sum(de * de).cast("double").alias("syy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    # degenerate-variance guard (same class as events_anomaly_zscore):
    # a single-row or constant-column group makes a variance term 0 —
    # Spark's 0/0 is NaN while DuckDB's is NULL — and double cancellation
    # can make it slightly NEGATIVE, where DuckDB's sqrt hard-errors.
    # vx/vy are computed from identical double inputs with identical ops
    # on both engines, so the >0 branch decision matches bit-for-bit.
    vx = nd * sxx - sx * sx
    vy = nd * syy - sy * sy
    corr = (nd * sxy - sx * sy) / (F.sqrt(vx) * F.sqrt(vy))
    return m.select(
        "l_returnflag",
        "n",
        F.when((vx > 0) & (vy > 0), F.round(corr, 6)).alias(
            "corr_qty_price"
        ),
    )


# --- UNPIVOT: the inverse reshape of agg_pivot -----------------------------------
@register(
    "unpivot_metrics",
    # DuckDB's UNPIVOT spelling differs, so the oracle is the ANSI UNION
    # ALL equivalent — same rows, same types
    oracle="""
WITH m AS (
  SELECT o_orderstatus, CAST(COUNT(*) AS DOUBLE) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
  FROM orders GROUP BY 1)
SELECT o_orderstatus, 'n_orders' AS metric, n_orders AS value FROM m
UNION ALL
SELECT o_orderstatus, 'total_price' AS metric, total_price AS value FROM m""",
    doc="UNPIVOT (long-form reshape, the inverse of agg_pivot): per-status "
    "metrics melted to (status, metric, value) rows via Spark's native "
    "UNPIVOT clause — a narrow projection over the aggregate, no extra "
    "shuffle (the UNION ALL oracle would rescan; UNPIVOT does not)",
    tags=("agg",),
)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import register_views

    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        "SELECT o_orderstatus, metric, value FROM ("
        "  SELECT o_orderstatus, CAST(COUNT(*) AS DOUBLE) AS n_orders, "
        "         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price "
        "  FROM orders GROUP BY o_orderstatus"
        ") UNPIVOT (value FOR metric IN (n_orders, total_price))"
    )


# --- beyond-ref: exact heavy hitters without shuffling the key space (r8) --------
@register(
    "agg_heavy_hitters",
    oracle="SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n "
    "FROM lineitem GROUP BY l_partkey HAVING COUNT(*) >= 36 "
    "ORDER BY l_partkey",
    doc="Exact heavy hitters (new r8, operators/heavyhitters.py — the "
    "frequent-items pass every training-data pipeline runs over n-grams/"
    "URLs/fingerprints): phase 1 counts keys WITHIN each partition via "
    "one mapInPandas pass (zero shuffle; the per-partition Arrow batch "
    "iterator accumulates one local count per key) and emits only keys "
    "with local count >= ceil(T/P) — pigeonhole guarantees a key with "
    "global count >= T is locally frequent somewhere, so the candidate "
    "set has no false negatives; phase 2 recounts ONLY candidate rows "
    "(null-safe broadcast semi join) and applies the threshold exactly. "
    "Equality with the oracle's plain GROUP BY/HAVING proves the "
    "pigeonhole bound and the exact recount; at 100 TB the win is that "
    "the only full shuffle carries candidate keys' rows, never the "
    "billions-of-distinct-keys aggregation state.  Plan shape (no "
    "Exchange below MapInPandas, LeftSemi broadcast) pinned in "
    "tests/test_heavyhitters.py",
    tags=("agg",),
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.heavyhitters import heavy_hitters

    t = load_tables(spark, sf_dir, ("lineitem",))
    # lineitem averages ~30 rows per partkey at every sf (TPC-H keeps the
    # ratio constant), so T=36 cuts mid-distribution: a real tail of
    # heavy keys exists at sf0.001/0.01/0.1 alike
    li = t["lineitem"].select("l_partkey").repartition(8)
    return heavy_hitters(li, ["l_partkey"], 36).orderBy("l_partkey")
