"""Set operations — SURVEY.md §2.6.

Absent from the reference entirely (UNION is an explicit unsupported-syntax
hint, ``engine/src/cli.cpp:213``); cheap first-class extensions in Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import register, shared_sql
from ..catalog import load_tables

shared_sql(
    "union_all",
    "SELECT c_custkey FROM customer WHERE c_acctbal > 9000 "
    "UNION ALL "
    "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'",
    doc="UNION ALL (overlapping inputs kept as duplicates)",
    tags=("setop",),
)

shared_sql(
    "union_distinct",
    "SELECT c_custkey FROM customer WHERE c_acctbal > 9000 "
    "UNION "
    "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'",
    doc="UNION (distinct)",
    tags=("setop",),
)


@register(
    "intersect",
    oracle="SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' "
    "INTERSECT "
    "SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'",
    doc="INTERSECT: customers with both an F and an O order",
    tags=("setop",),
)
def intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    f = t["orders"].filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o = t["orders"].filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(o)


@register(
    "except_",
    oracle="SELECT c_custkey FROM customer "
    "EXCEPT "
    "SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'P'",
    doc="EXCEPT: customers with no pending order",
    tags=("setop",),
)
def except_(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    all_c = t["customer"].select("c_custkey")
    pending = (
        t["orders"]
        .filter(F.col("o_orderstatus") == "P")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    # DataFrame.subtract == SQL EXCEPT (distinct) semantics
    return all_c.subtract(pending)


@register(
    "intersect_all",
    oracle="SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' "
    "INTERSECT ALL "
    "SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'",
    doc="INTERSECT ALL (bag semantics: multiplicity = min of the two "
    "sides' multiplicities per value)",
    tags=("setop",),
)
def intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    f = t["orders"].filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o = t["orders"].filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersectAll(o)


@register(
    "except_all",
    oracle="SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' "
    "EXCEPT ALL "
    "SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'",
    doc="EXCEPT ALL (bag semantics: multiplicity = left minus right, "
    "floored at zero)",
    tags=("setop",),
)
def except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    f = t["orders"].filter(F.col("o_orderstatus") == "F").select("o_custkey")
    p = t["orders"].filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return f.exceptAll(p)
