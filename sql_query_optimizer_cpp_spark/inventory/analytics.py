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
from ..functions import dsum, dsum_sql, pround, pround_sql

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
    # ONE shuffle of events (the per-user groupBy) instead of three
    # same-key groupBys plus two join-backs: each later stage's
    # timestamps are carried as a per-user array and the ordered-funnel
    # recursion (t_k = min stage-k ts strictly after t_{k-1}) runs as
    # array expressions inside the aggregated row.  NULL propagation
    # reproduces the join semantics exactly: a user absent from stage
    # k-1 has t_{k-1} NULL, so x > NULL filters everything and
    # array_min(empty) stays NULL.  Per-user array size is that user's
    # stage-event count — the same per-key hot-spot bound the
    # sessionization window already carries.
    e = load_tables(spark, sf_dir, ("events",))["events"]
    stage0, *rest = FUNNEL_STAGES
    aggs = [
        F.min(F.when(F.col("event_type") == stage0, F.col("ts"))).alias("t_0")
    ]
    for i, stage in enumerate(rest, start=1):
        aggs.append(
            F.collect_list(
                F.when(F.col("event_type") == stage, F.col("ts"))
            ).alias(f"_ts{i}")
        )
    per_user = e.groupBy("user_id").agg(*aggs)

    def _strictly_after(prev_col):
        return lambda x: x > prev_col

    for i in range(1, len(FUNNEL_STAGES)):
        per_user = per_user.withColumn(
            f"t_{i}",
            F.array_min(
                F.filter(
                    F.col(f"_ts{i}"), _strictly_after(F.col(f"t_{i - 1}"))
                )
            ),
        )
    counts = per_user.agg(
        *[
            F.count(F.col(f"t_{i}")).alias(f"n{i}")
            for i in range(len(FUNNEL_STAGES))
        ]
    )
    pairs = ", ".join(
        f"'{stage}', n{i}" for i, stage in enumerate(FUNNEL_STAGES)
    )
    return counts.selectExpr(
        f"stack({len(FUNNEL_STAGES)}, {pairs}) AS (stage, n_users)"
    )


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


@register(
    "orders_market_basket",
    oracle="""
WITH pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
SELECT part_a, part_b, CAST(COUNT(*) AS BIGINT) AS n
FROM pairs GROUP BY 1, 2
ORDER BY n DESC, part_a, part_b LIMIT 20""",
    doc="market-basket co-occurrence: top-20 part pairs bought in the "
    "same order (association-rule support counts) — the self-join blocks "
    "on the natural basket key l_orderkey (equi-join, pairs per order = "
    "O(basket^2) with baskets small), one combinable count, then "
    "TakeOrderedAndProject; the classic co-occurrence shape reused for "
    "token co-occurrence matrices at corpus scale",
    tags=("join", "agg"),
)
def orders_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem",))
    li = t["lineitem"].select("l_orderkey", "l_partkey")
    a = li.select(
        F.col("l_orderkey"), F.col("l_partkey").alias("part_a")
    )
    b = li.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("part_b")
    )
    return (
        a.join(
            b,
            (F.col("l_orderkey") == F.col("_ok"))
            & (F.col("part_a") < F.col("part_b")),
        )
        .groupBy("part_a", "part_b")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "part_a", "part_b")
        .limit(20)
    )


@register(
    "events_anomaly_zscore",
    # variance from exact integer moments: num = n*sumsq - sum^2 (exact
    # BIGINT), var = num/n^2 as ONE double division, std = sqrt (IEEE
    # correctly-rounded) -> both engines produce identical bits; z rounded
    # 6dp at output
    oracle="""
WITH hourly AS (
  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
moments AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_hours,
         CAST(SUM(n) AS BIGINT) AS s,
         CAST(SUM(n * n) AS BIGINT) AS ss
  FROM hourly GROUP BY 1)
SELECT h.event_type, h.bucket, h.n,
       round((CAST(h.n AS DOUBLE) - CAST(m.s AS DOUBLE) / m.n_hours)
             / sqrt(CAST(NULLIF(m.n_hours * m.ss - m.s * m.s, 0) AS DOUBLE)
                    / (m.n_hours * m.n_hours)), 6) AS z,
       abs((CAST(h.n AS DOUBLE) - CAST(m.s AS DOUBLE) / m.n_hours)
           / sqrt(CAST(NULLIF(m.n_hours * m.ss - m.s * m.s, 0) AS DOUBLE)
                  / (m.n_hours * m.n_hours))) >= 2.0 AS is_anomaly
FROM hourly h JOIN moments m ON h.event_type = m.event_type""",
    doc="volume-anomaly detection: per event_type, hourly counts scored "
    "as z-scores against that type's own mean/std (population std from "
    "exact integer moments, so the doubles match across engines "
    "bit-for-bit) — the telemetry check a pipeline runs on its own "
    "ingest rates; two combinable aggregations, the per-type moments "
    "broadcast back",
    tags=("events", "agg"),
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("events",))
    hourly = (
        t["events"]
        .groupBy(
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("bucket"),
        )
        .agg(F.count("*").cast("long").alias("n"))
    )
    moments = hourly.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_hours"),
        F.sum("n").cast("long").alias("s"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n_hours")
    # exact-integer variance numerator; when it is 0 (single bucket or
    # constant counts) both engines must emit NULL, not NaN/Infinity —
    # Spark's 0/0 and DuckDB's x/0 semantics diverge otherwise.  Guarded
    # here with when(num > 0) and in the oracle with NULLIF(num, 0).
    num = F.col("n_hours") * F.col("ss") - F.col("s") * F.col("s")
    var = num.cast("double") / (F.col("n_hours") * F.col("n_hours"))
    z = F.when(num > 0, (F.col("n").cast("double") - mean) / F.sqrt(var))
    return (
        hourly.join(F.broadcast(moments), "event_type")
        .select(
            "event_type",
            "bucket",
            "n",
            F.round(z, 6).alias("z"),
            (F.abs(z) >= 2.0).alias("is_anomaly"),
        )
    )


@register(
    "date_series_gapfill",
    oracle="""
WITH hourly AS (
  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2),
bounds AS (SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi
           FROM hourly GROUP BY 1),
series AS (SELECT b.event_type, CAST(g.ts AS TIMESTAMP) AS bucket
           FROM bounds b,
                unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS g(ts))
SELECT s.event_type, s.bucket, CAST(coalesce(h.n, 0) AS BIGINT) AS n
FROM series s
LEFT JOIN hourly h ON h.event_type = s.event_type AND h.bucket = s.bucket""",
    doc="gap-filled hourly time series per event_type: the dense, "
    "zero-filled series every dashboard / anomaly detector needs (a "
    "missing hour must be a 0, not an absent row) — Spark "
    "sequence()+explode generates each type's full [min,max] hour range "
    "(generator-side, no driver loop; range length is bounded by "
    "wall-clock span, not data volume), then a left join back onto the "
    "aggregated buckets; DuckDB twin uses lateral generate_series",
    tags=("events", "agg"),
)
def date_series_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("events",))
    hourly = (
        t["events"]
        .groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
        )
        .agg(F.count("*").cast("long").alias("n"))
    )
    series = (
        hourly.groupBy("event_type")
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            "event_type",
            F.explode(
                F.expr("sequence(lo, hi, interval 1 hour)")
            ).alias("bucket"),
        )
    )
    return series.join(hourly, ["event_type", "bucket"], "left").select(
        "event_type",
        "bucket",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
    )


@register(
    "events_dau_stickiness",
    oracle="""
WITH du AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   user_id FROM events),
days AS (SELECT DISTINCT day FROM du),
contrib AS (
  SELECT du.day + to_days(CAST(o.o AS INTEGER)) AS anchor_day, du.user_id
  FROM du, unnest(generate_series(0, 6)) AS o(o)),
wau AS (
  SELECT c.anchor_day AS day, CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS wau
  FROM contrib c JOIN days d ON d.day = c.anchor_day
  GROUP BY 1),
dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY 1)
SELECT dau.day, dau.dau, wau.wau,
       (floor((CAST(dau.dau AS DOUBLE) / wau.wau) * 1000000.0 + 0.5) / 1000000.0) AS stickiness
FROM dau JOIN wau ON dau.day = wau.day""",
    doc="DAU / trailing-7-day WAU / stickiness per day — the canonical "
    "engagement readout.  The trailing-window DISTINCT is NOT computed "
    "as a range join (nested-loop at scale): each (day, user) pair is "
    "exploded into the <=7 anchor days it contributes to, turning the "
    "window into an equi-groupBy on anchor day — shuffle bytes <= 7x the "
    "distinct day-user pairs, independent of raw event volume; at even "
    "larger horizons the same shape degrades gracefully (k× blowup) or "
    "swaps to mergeable HLL partials per day (agg_hll_union shows that "
    "surface)",
    tags=("events", "analytics"),
)
def events_dau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("events",))
    du = (
        t["events"]
        .select(
            F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
        )
        .distinct()
    )
    days = du.select("day").distinct()
    # explode the 0..6 day offsets (equi-shape; no range join)
    contrib = du.select(
        "day", "user_id", F.explode(F.expr("sequence(0, 6)")).alias("o")
    ).select(
        F.expr("day + make_dt_interval(o)").alias("anchor_day"), "user_id"
    )
    wau = (
        contrib.join(days, contrib.anchor_day == days.day)
        .groupBy("day")
        .agg(F.count_distinct("user_id").cast("long").alias("wau"))
    )
    dau = du.groupBy("day").agg(F.count("*").cast("long").alias("dau"))
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        pround(F.col("dau").cast("double") / F.col("wau"), 6).alias(
            "stickiness"
        ),
    )


@register(
    "orders_yoy_growth",
    oracle="""
WITH yearly AS (
  SELECT o_orderpriority, CAST(year(o_orderdate) AS BIGINT) AS yr,
         """
    + dsum_sql("o_totalprice")
    + """ AS revenue
  FROM orders GROUP BY 1, 2)
SELECT o_orderpriority, yr, revenue,
       (floor(((revenue - lag(revenue) OVER w) / NULLIF(lag(revenue) OVER w, 0)) * 1000000.0 + 0.5) / 1000000.0) AS yoy_growth
FROM yearly WINDOW w AS (PARTITION BY o_orderpriority ORDER BY yr)""",
    doc="year-over-year revenue growth per order priority: decimal-exact "
    "yearly sums, then a lag window over (priority, year) — the growth "
    "ratio divides two already-exact doubles once (NULLIF-guarded so a "
    "zero prior year yields NULL in both engines, and the first year has "
    "no prior so lag is NULL); the window partition count is tiny "
    "(priorities x years), so the second stage is trivially cheap at any "
    "scale — all the heavy lifting is the map-side-combinable first "
    "aggregate",
    tags=("agg", "window"),
)
def orders_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir, ("orders",))
    yearly = (
        t["orders"]
        .groupBy(
            "o_orderpriority",
            F.year("o_orderdate").cast("long").alias("yr"),
        )
        .agg(dsum("o_totalprice").alias("revenue"))
    )
    w = W.partitionBy("o_orderpriority").orderBy("yr")
    prev = F.lag("revenue").over(w)
    return yearly.select(
        "o_orderpriority",
        "yr",
        "revenue",
        pround(
            (F.col("revenue") - prev) / F.nullif(prev, F.lit(0.0)), 6
        ).alias("yoy_growth"),
    )


@register(
    "events_hourly_topk_types",
    oracle="""
WITH hourly AS (
  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket, event_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2)
SELECT bucket, event_type, n, rk FROM (
  SELECT bucket, event_type, n,
         CAST(row_number() OVER (PARTITION BY bucket
              ORDER BY n DESC, event_type) AS BIGINT) AS rk
  FROM hourly) t WHERE rk <= 3""",
    doc="top-3 event types per hour (windowed top-k over time buckets): "
    "hourly counts are a map-side-combinable aggregate, then the rank "
    "window partitions by bucket — thousands of small partitions, no "
    "single-reducer skew; deterministic via the event_type tie-break",
    tags=("events", "window", "topk"),
)
def events_hourly_topk_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir, ("events",))
    hourly = (
        t["events"]
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket"), "event_type"
        )
        .agg(F.count("*").cast("long").alias("n"))
    )
    w = W.partitionBy("bucket").orderBy(F.col("n").desc(), "event_type")
    return (
        hourly.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("bucket", "event_type", "n", "rk")
    )
