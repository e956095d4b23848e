"""Product-analytics inventory queries over ``events``, plus the
reference's MCV histogram surfaced as a result query.

The reference has no event analytics (SURVEY.md §2.8: streaming absent);
funnels and cohort retention are the two canonical event-stream readouts a
training-data pipeline's telemetry needs.  ``stats_mcv_topk`` is the
result-comparable twin of the reference's stats harvester (top-10
value-frequency histogram, ``engine/src/statistics_manager.cpp:95-109``),
which our engine otherwise exposes only through ``Engine.analyze`` /
``DESCRIBE EXTENDED`` readback (test-only).

Scale posture: every aggregation/join here keys on ``user_id`` — the
funnel's three stage frames and both retention frames co-partition after
the first shuffle, so the chain costs one effective repartition of the
events table.  The MCV query is a map-side-combinable count + top-k
(TakeOrderedAndProject): bytes shuffled ∝ distinct values, not rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import register, shared_sql
from ..catalog import load_tables
from ..functions import dsum, dsum_sql

#: Ordered funnel: a user converts through a stage only with an event of
#: that type STRICTLY LATER than their entry into the previous stage
#: (first-touch attribution; re-orderings within the same timestamp don't
#: count — both engines compare the same timestamps, so the rule is
#: portable).
FUNNEL_STAGES = ("view", "click", "purchase")

#: Retention horizon in days (cohort = calendar day of first activity).
RETENTION_DAYS = 7


@register(
    "events_funnel",
    oracle="""
WITH fv AS (
  SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN ts END) AS t0
  FROM events GROUP BY user_id),
fc AS (
  SELECT e.user_id, MIN(e.ts) AS t1
  FROM events e JOIN fv ON e.user_id = fv.user_id
  WHERE e.event_type = 'click' AND fv.t0 IS NOT NULL AND e.ts > fv.t0
  GROUP BY e.user_id),
fp AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN fc ON e.user_id = fc.user_id
  WHERE e.event_type = 'purchase' AND e.ts > fc.t1
  GROUP BY e.user_id)
SELECT stage, n_users FROM (
  SELECT 'view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users
  FROM fv WHERE t0 IS NOT NULL
  UNION ALL
  SELECT 'click', CAST(COUNT(*) AS BIGINT) FROM fc
  UNION ALL
  SELECT 'purchase', CAST(COUNT(*) AS BIGINT) FROM fp) s
""",
    doc="ordered conversion funnel view→click→purchase: per-stage user "
    "counts where each stage's event is strictly later than the user's "
    "first event of the previous stage — three same-key groupBys plus two "
    "same-key joins, one effective shuffle of events",
    tags=("events", "analytics"),
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, ("events",))["events"]
    stage0, *rest = FUNNEL_STAGES
    entered = (
        e.groupBy("user_id")
        .agg(F.min(F.when(F.col("event_type") == stage0, F.col("ts"))).alias("t"))
        .where(F.col("t").isNotNull())
    )
    frames = [(stage0, entered)]
    for stage in rest:
        prev = frames[-1][1]
        entered = (
            e.where(F.col("event_type") == stage)
            .join(prev.select("user_id", F.col("t").alias("t_prev")), "user_id")
            .where(F.col("ts") > F.col("t_prev"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t"))
        )
        frames.append((stage, entered))
    counts = [
        df.agg(F.count("*").alias("n_users")).select(
            F.lit(stage).alias("stage"), "n_users"
        )
        for stage, df in frames
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionAll(c)
    return out


@register(
    "events_retention",
    oracle=f"""
WITH cohort AS (
  SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP) AS cohort_day
  FROM events GROUP BY user_id)
SELECT c.cohort_day,
       CAST(date_diff('day', c.cohort_day,
                      CAST(date_trunc('day', e.ts) AS TIMESTAMP)) AS BIGINT)
         AS day_offset,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM events e JOIN cohort c ON e.user_id = c.user_id
WHERE date_diff('day', c.cohort_day,
                CAST(date_trunc('day', e.ts) AS TIMESTAMP)) <= {RETENTION_DAYS}
GROUP BY 1, 2
""",
    doc="cohort retention: users bucketed by first-activity day, distinct "
    "actives counted at each day offset 0..7 — day arithmetic via "
    "datediff-of-truncated-days so Spark and DuckDB agree exactly",
    tags=("events", "analytics"),
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, ("events",))["events"]
    cohort = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    offset = F.datediff(F.date_trunc("day", F.col("ts")), F.col("cohort_day"))
    return (
        e.join(cohort, "user_id")
        .where(offset <= RETENTION_DAYS)
        .groupBy("cohort_day", offset.cast("long").alias("day_offset"))
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


shared_sql(
    "stats_mcv_topk",
    "SELECT p_brand AS value, CAST(COUNT(*) AS BIGINT) AS freq "
    "FROM part GROUP BY p_brand "
    "ORDER BY freq DESC, value LIMIT 10",
    doc="top-10 most-common-values histogram (the reference stats "
    "harvester's MCV readout, statistics_manager.cpp:95-109, as a result "
    "query) — map-side-combinable count + TakeOrderedAndProject; shuffle "
    "bytes scale with distinct values, not rows",
    tags=("stats", "topk"),
)


@register(
    "orders_rfm",
    oracle="""
WITH anchor AS (SELECT MAX(o_orderdate) AS max_date FROM orders),
rfm AS (
  SELECT o_custkey,
         CAST(date_diff('day', MAX(o_orderdate),
                        (SELECT max_date FROM anchor)) AS BIGINT) AS recency_days,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         """
    + dsum_sql("o_totalprice")
    + """ AS monetary
  FROM orders GROUP BY o_custkey)
SELECT o_custkey, recency_days, frequency, monetary,
       CAST(ntile(5) OVER (ORDER BY monetary DESC, o_custkey) AS BIGINT)
         AS m_quintile
FROM rfm""",
    doc="RFM customer segmentation: per-customer recency (days since "
    "last order vs the corpus anchor date), frequency, decimal-exact "
    "monetary total, and a monetary quintile — one combinable aggregate "
    "on o_custkey, the scalar anchor broadcast, then a rank window; at "
    "scale the unpartitioned ntile becomes a two-pass quantile-cut "
    "(approx boundaries + map-side bucketing), same output contract",
    tags=("agg", "window"),
)
def orders_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir, ("orders",))
    anchor = t["orders"].agg(F.max("o_orderdate").alias("max_date"))
    rfm = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").cast("long").alias("frequency"),
            dsum("o_totalprice").alias("monetary"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "o_custkey",
            F.datediff(F.col("max_date"), F.col("last_order"))
            .cast("long")
            .alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    w = W.orderBy(F.col("monetary").desc(), "o_custkey")
    return rfm.withColumn("m_quintile", F.ntile(5).over(w).cast("long"))
