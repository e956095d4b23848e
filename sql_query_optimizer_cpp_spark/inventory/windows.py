"""Window functions — absent from the reference (SURVEY.md §0), first-class
Spark extensions.

Determinism notes: every window ORDER BY ends in a unique key so
row_number/lag/lead are reproducible; running sums go through DECIMAL (some
engines evaluate windowed sums with segment trees, which reorders float
addition) and ranking functions are cast to BIGINT on the Spark side because
DuckDB emits BIGINT for them while Spark emits INT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from . import register
from ..catalog import load_tables
from ..functions import pround, pround_sql


@register(
    "win_topk_per_group",
    oracle="SELECT o_custkey, o_orderkey, o_totalprice, rn FROM ("
    "SELECT o_custkey, o_orderkey, o_totalprice, "
    "row_number() OVER (PARTITION BY o_custkey "
    "ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) t "
    "WHERE rn <= 3",
    doc="top-k per group via row_number window (the canonical Spark pattern)",
    tags=("window",),
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        t["orders"]
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "win_rank_lag",
    oracle="SELECT o_custkey, o_orderkey, "
    "rank() OVER w AS rnk, dense_rank() OVER w AS drnk, "
    "lag(o_orderkey) OVER w AS prev_order, lead(o_orderkey) OVER w AS next_order "
    "FROM orders WHERE o_custkey < 50 "
    "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)",
    doc="rank/dense_rank/lag/lead over an event sequence per customer",
    tags=("window",),
)
def win_rank_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        t["orders"]
        .filter(F.col("o_custkey") < 50)
        .select(
            "o_custkey",
            "o_orderkey",
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
            F.lag("o_orderkey").over(w).alias("prev_order"),
            F.lead("o_orderkey").over(w).alias("next_order"),
        )
    )


@register(
    "win_running_sum",
    oracle="SELECT o_custkey, o_orderkey, "
    "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER ("
    "PARTITION BY o_custkey ORDER BY o_orderkey "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total "
    "FROM orders WHERE o_custkey < 50",
    doc="cumulative sum per customer (decimal-exact for cross-engine parity)",
    tags=("window",),
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        t["orders"]
        .filter(F.col("o_custkey") < 50)
        .select(
            "o_custkey",
            "o_orderkey",
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .over(w)
            .cast("double")
            .alias("running_total"),
        )
    )


@register(
    "win_distribution",
    oracle="SELECT o_custkey, o_orderkey, "
    "CAST(ntile(4) OVER w AS BIGINT) AS quartile, "
    "percent_rank() OVER w AS pct_rank, "
    "cume_dist() OVER w AS cum_dist, "
    "first_value(o_orderkey) OVER w AS biggest_order "
    "FROM orders WHERE o_custkey < 50 "
    "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)",
    doc="distribution window functions: ntile/percent_rank/cume_dist/"
    "first_value (ntile cast: Spark int vs DuckDB bigint)",
    tags=("window",),
)
def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        t["orders"]
        .filter(F.col("o_custkey") < 50)
        .select(
            "o_custkey",
            "o_orderkey",
            F.ntile(4).over(w).cast("long").alias("quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cum_dist"),
            F.first("o_orderkey").over(w).alias("biggest_order"),
        )
    )


@register(
    "win_range_frame",
    oracle="SELECT event_id, user_id, ts, "
    "CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER ("
    "PARTITION BY user_id ORDER BY epoch_ms(ts) "
    "RANGE BETWEEN 1800000 PRECEDING AND CURRENT ROW) AS DOUBLE) "
    "AS trailing_30m "
    "FROM events",
    doc="time-based RANGE window frame: per-user 30-minute trailing sum — "
    "the frame is bounded by the ordering VALUE (epoch millis), not row "
    "count, so sparse and bursty users get the same time semantics; sum "
    "through DECIMAL so the frame-order float addition matches DuckDB "
    "bit-for-bit (epoch_ms / unix_millis both floor to the millisecond)",
    tags=("window", "events"),
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("events",))
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_millis(F.col("ts").cast("timestamp")))
        .rangeBetween(-1_800_000, 0)
    )
    return t["events"].select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("trailing_30m"),
    )


@register(
    "win_first_last",
    oracle="SELECT o_custkey, o_orderkey, "
    "first_value(o_orderkey) OVER w AS first_order, "
    "last_value(o_orderkey) OVER w AS last_order, "
    "nth_value(o_orderkey, 2) OVER w AS second_order "
    "FROM orders WHERE o_custkey < 50 "
    "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)",
    doc="first_value/last_value/nth_value over the FULL partition frame — "
    "the explicit UNBOUNDED FOLLOWING bound matters: the default frame "
    "ends at CURRENT ROW, which silently turns last_value into 'current "
    "value' (the classic window-function bug, identical in both engines)",
    tags=("window",),
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        t["orders"]
        .filter(F.col("o_custkey") < 50)
        .select(
            "o_custkey",
            "o_orderkey",
            F.first("o_orderkey").over(w).alias("first_order"),
            F.last("o_orderkey").over(w).alias("last_order"),
            F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
        )
    )


@register(
    "win_cumulative_share",
    oracle="SELECT c_custkey, c_nationkey, c_acctbal, "
    + pround_sql(
        "CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) OVER ("
        "PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) "
        "/ CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) OVER ("
        "PARTITION BY c_nationkey) AS DOUBLE)",
        6,
    )
    + " AS cum_share FROM customer",
    doc="cumulative share (running decimal-exact sum / partition total, "
    "two frames over ONE partitioning): the Pareto/concentration curve — "
    "'the top accounts hold X% of balance' — per nation; both window "
    "sums reuse the same c_nationkey shuffle, and the share divides two "
    "exact decimals cast to double so cross-engine bits match",
    tags=("window",),
)
def win_cumulative_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer",))
    dec = F.col("c_acctbal").cast("decimal(18,2)")
    w_run = (
        W.partitionBy("c_nationkey")
        .orderBy(F.col("c_acctbal").desc(), "c_custkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_all = W.partitionBy("c_nationkey")
    return t["customer"].select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        pround(
            F.sum(dec).over(w_run).cast("double")
            / F.sum(dec).over(w_all).cast("double"),
            6,
        ).alias("cum_share"),
    )


@register(
    "win_moving_avg",
    oracle="SELECT o_custkey, o_orderkey, "
    + pround_sql(
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)"
        " / (COUNT(*) OVER w)",
        6,
    )
    + " AS moving_avg "
    "FROM orders WHERE o_custkey < 50 "
    "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
    "ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)",
    doc="centered 5-row moving average per customer (2 preceding + 2 "
    "following — a bounded two-sided frame, unlike the cumulative and "
    "RANGE frames elsewhere): decimal-exact frame sum divided by the "
    "frame COUNT so edge rows average over their real 3-4 neighbors, "
    "and bits match across engines",
    tags=("window",),
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 2)
    )
    return (
        t["orders"]
        .filter(F.col("o_custkey") < 50)
        .select(
            "o_custkey",
            "o_orderkey",
            pround(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .over(w)
                .cast("double")
                / F.count("*").over(w),
                6,
            ).alias("moving_avg"),
        )
    )
