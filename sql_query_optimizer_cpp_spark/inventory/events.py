"""Event-time window inventory over the ``events`` table (batch mode).

The reference has no streaming at all (SURVEY.md §2.8); these are the
extension operators a training-data pipeline needs for event streams:
tumbling / sliding / session windows and JSON-ish property extraction.
The same window expressions run under Structured Streaming in
``streaming/windows.py``; batch mode here makes them oracle-checkable.

Oracle notes: Spark's ``window()`` aligns to the epoch, so the tumbling
oracle is ``date_trunc``; the sliding oracle enumerates the 2 covering
windows per event (slide = length/2); the session oracle is the classic
gaps-and-islands rewrite with a *strict* new-session condition
(gap >= 10 min), matching Spark's half-open [start, last+gap) semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import register
from ..catalog import load_tables
from ..functions import dsum, dsum_sql, pround_sql


@register(
    "events_tumbling",
    oracle="SELECT date_trunc('hour', ts) AS win_start, "
    "date_trunc('hour', ts) + INTERVAL 1 HOUR AS win_end, "
    "event_type, COUNT(*) AS n, "
    + dsum_sql("value", scale=6)
    + " AS total "
    "FROM events GROUP BY 1, 2, 3",
    doc="tumbling 1h event-time window + per-type aggregates",
    tags=("events", "window", "bench"),
)
def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("events",))
    return (
        t["events"]
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value", scale=6).alias("total"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type",
            "n",
            "total",
        )
    )


@register(
    "events_sliding",
    oracle="""
SELECT make_timestamp(((epoch_us(ts) // 1800000000) - k) * 1800000000) AS win_start,
       make_timestamp((((epoch_us(ts) // 1800000000) - k) * 1800000000) + 3600000000) AS win_end,
       COUNT(*) AS n, """
    + dsum_sql("value", scale=6)
    + """ AS total
FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) offsets
GROUP BY 1, 2""",
    doc="sliding window (1h length, 30min slide): each event lands in 2 "
    "windows; oracle enumerates them via epoch arithmetic",
    tags=("events", "window"),
)
def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("events",))
    return (
        t["events"]
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"), dsum("value", scale=6).alias("total"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "n",
            "total",
        )
    )


@register(
    "events_session",
    oracle="""
WITH o AS (
  SELECT user_id, event_id, ts, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events),
m AS (
  SELECT *, CASE WHEN prev IS NULL OR ts - prev >= INTERVAL 10 MINUTE
                 THEN 1 ELSE 0 END AS is_new
  FROM o),
g AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS grp
  FROM m)
SELECT user_id, MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 10 MINUTE AS session_end,
       COUNT(*) AS n_events, """
    + dsum_sql("value", scale=6)
    + """ AS total
FROM g GROUP BY user_id, grp""",
    doc="session windows (10min gap) per user; oracle is the gaps-and-"
    "islands rewrite of Spark's session_window merge semantics",
    tags=("events", "window"),
)
def events_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("events",))
    return (
        t["events"]
        .groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), dsum("value", scale=6).alias("total"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total",
        )
    )


@register(
    "events_props_extract",
    oracle="SELECT event_type, "
    "CAST(SUM(CAST(regexp_extract(props, '\"k\":\\s*(\\d+)', 1) AS BIGINT)) AS BIGINT)"
    " AS k_sum, COUNT(*) AS n "
    "FROM events GROUP BY event_type",
    doc="semi-structured property extraction from the JSON-ish props string "
    "(regex-based so no JSON-extension dependency in the oracle)",
    tags=("events", "text"),
)
def events_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("events",))
    k = F.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("long")
    return (
        t["events"]
        .groupBy("event_type")
        .agg(F.sum(k).cast("long").alias("k_sum"), F.count("*").alias("n"))
    )


# --- hypertable rollup: continuous aggregates, coarse from fine ------------------
@register(
    "events_rollup_hypertable",
    oracle="""
SELECT 'hour' AS grain, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
       event_type, count(*) AS n_events, """
    + dsum_sql("value", scale=6)
    + """ AS sum_value,
       min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY 2, 3
UNION ALL
SELECT 'day', CAST(date_trunc('day', ts) AS TIMESTAMP), event_type, count(*), """
    + dsum_sql("value", scale=6)
    + """, min(value), max(value)
FROM events GROUP BY 2, 3
""",
    doc="hypertable rollup (continuous aggregates): hour partials computed "
    "once from raw events, day grain re-aggregated from the persisted hour "
    "partials (count->sum, decimal-sum->sum, min/max->min/max) — the oracle "
    "aggregates each grain directly from raw, proving re-aggregation is "
    "exact; raw is scanned once (plan-asserted)",
    tags=("events", "rollup"),
)
def events_rollup_hypertable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rollup import hierarchical_rollup

    t = load_tables(spark, sf_dir, ("events",))
    return hierarchical_rollup(
        t["events"], "ts", "event_type", "value", grains=("hour", "day")
    )


# --- latest event per key: the CDC-snapshot shape --------------------------------
@register(
    "events_latest_by_user",
    oracle="SELECT user_id, event_id, ts, event_type, value FROM ("
    "  SELECT user_id, event_id, ts, event_type, value, "
    "         row_number() OVER (PARTITION BY user_id "
    "                            ORDER BY ts DESC, event_id DESC) AS rn "
    "  FROM events) ranked WHERE rn = 1",
    doc="latest event per user (max ts, event_id tie-break) — the "
    "compact-a-changelog-to-a-snapshot operation every CDC/upsert "
    "pipeline runs; one shuffle on the key, rank evaluated inside the "
    "window stage with no join-back.  Timestamp-parity note: both "
    "engines order on MICROS (catalog.load_tables truncates the nanos "
    "fixture via timestamp_micros; DuckDB's read_parquet coerces "
    "TIMESTAMP_NANOS to its micros TIMESTAMP), and the event_id "
    "tie-break makes the winner deterministic under any sub-micro ties",
    tags=("events", "window"),
)
def events_latest_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir, ("events",))
    w = W.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        t["events"]
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("user_id", "event_id", "ts", "event_type", "value")
    )


# --- JSON path extraction (props is a JSON-ish string column) --------------------
@register(
    "events_props_json",
    oracle="SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, "
    "CAST(count(*) AS BIGINT) AS n, "
    + dsum_sql("value", scale=6)
    + " AS total "
    "FROM events GROUP BY 1 ORDER BY k LIMIT 50",
    doc="JSON path extraction over the props column (Spark "
    "get_json_object vs DuckDB json_extract_string — same JSONPath "
    "subset), aggregated per extracted key value; the JSON parse is a "
    "per-row JVM expression, pushdown-friendly",
    tags=("events", "functions"),
)
def events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("events",))
    return (
        t["events"]
        .select(
            F.get_json_object("props", "$.k").cast("long").alias("k"),
            "value",
        )
        .groupBy("k")
        .agg(
            F.count("*").cast("long").alias("n"),
            dsum("value", scale=6).alias("total"),
        )
        .orderBy("k")
        .limit(50)
    )


# --- sessionization with entry/exit attribution ----------------------------------
@register(
    "events_sessionize_attrib",
    oracle="""
WITH o AS (
  SELECT user_id, event_id, ts, event_type, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events),
m AS (
  SELECT *, CASE WHEN prev IS NULL OR ts - prev >= INTERVAL 10 MINUTE
                 THEN 1 ELSE 0 END AS is_new
  FROM o),
g AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS grp
  FROM m),
r AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, grp
                               ORDER BY ts, event_id) AS rn_a,
            row_number() OVER (PARTITION BY user_id, grp
                               ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM g)
SELECT user_id, MIN(ts) AS session_start,
       MAX(CASE WHEN rn_a = 1 THEN event_type END) AS entry_type,
       MAX(CASE WHEN rn_d = 1 THEN event_type END) AS exit_type,
       COUNT(*) AS n_events, """
    + dsum_sql("value", scale=6)
    + """ AS total
FROM r GROUP BY user_id, grp""",
    doc="sessionization with first/last-touch attribution: gaps-and-"
    "islands sessions (10min gap) plus each session's entry and exit "
    "event_type — the session-attribution report behind funnel/marketing "
    "analytics; one shuffle on user_id feeds every window (same "
    "partitioning reused across lag, cumsum, and both ranks), then one "
    "combinable aggregation",
    tags=("events", "window"),
)
def events_sessionize_attrib(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir, ("events",))
    w_ord = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w_ord)
    # .cast("timestamp") before unix_micros: a no-op for the LTZ frames
    # load_tables builds, but keeps the query valid if events.ts arrives
    # as TIMESTAMP_NTZ (same guard as win_range_frame)
    is_new = F.when(
        prev.isNull()
        | (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(prev.cast("timestamp"))
            >= 600_000_000
        ),
        F.lit(1),
    ).otherwise(F.lit(0))
    g = (
        t["events"]
        .select("user_id", "event_id", "ts", "event_type", "value")
        .withColumn("is_new", is_new)
        .withColumn(
            "grp",
            F.sum("is_new").over(
                w_ord.rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
    )
    w_sess = W.partitionBy("user_id", "grp").orderBy("ts", "event_id")
    w_sess_d = W.partitionBy("user_id", "grp").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    r = g.withColumn("rn_a", F.row_number().over(w_sess)).withColumn(
        "rn_d", F.row_number().over(w_sess_d)
    )
    return (
        r.groupBy("user_id", "grp")
        .agg(
            F.min("ts").alias("session_start"),
            F.max(F.when(F.col("rn_a") == 1, F.col("event_type"))).alias(
                "entry_type"
            ),
            F.max(F.when(F.col("rn_d") == 1, F.col("event_type"))).alias(
                "exit_type"
            ),
            F.count("*").alias("n_events"),
            dsum("value", scale=6).alias("total"),
        )
        .drop("grp")
    )


# --- inter-event gap statistics --------------------------------------------------
@register(
    "events_gap_stats",
    oracle="""
WITH gaps AS (
  SELECT user_id,
         epoch_us(ts) - epoch_us(lag(ts) OVER (
             PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
  FROM events)
SELECT user_id, CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
       CAST(MAX(gap_us) AS DOUBLE) / 1e6 AS max_gap_s,
       """
    + pround_sql("CAST(SUM(gap_us) AS DOUBLE) / COUNT(gap_us) / 1e6")
    + """ AS avg_gap_s
FROM gaps WHERE gap_us IS NOT NULL GROUP BY user_id""",
    doc="inter-event gap statistics per user (count/max/mean seconds "
    "between consecutive events) — the cadence profile behind bot "
    "detection and session-gap tuning; gaps are exact integer "
    "microseconds from one lag window, aggregated map-side-combinably; "
    "the mean is display-rounded with the PORTABLE floor-based pround "
    "(native round() ties diverge 1 ulp across engines — the sf0.1 "
    "stress replay caught exactly one user's ...042.5-microsecond mean "
    "rounding differently)",
    tags=("events", "window"),
)
def events_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..functions import pround

    t = load_tables(spark, sf_dir, ("events",))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    mic = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = mic - F.lag(mic).over(w)
    return (
        t["events"]
        .select("user_id", gap.alias("gap_us"))
        .filter(F.col("gap_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("gap_us").cast("long").alias("n_gaps"),
            (F.max("gap_us").cast("double") / 1e6).alias("max_gap_s"),
            pround(
                F.sum("gap_us").cast("double") / F.count("gap_us") / 1e6
            ).alias("avg_gap_s"),
        )
    )


# --- click->purchase attribution (the stream-stream interval join, batch twin) ---
@register(
    "join_event_attribution",
    oracle="""
WITH clicks AS (
  SELECT user_id, event_id AS click_id, ts AS click_ts
  FROM events WHERE event_type = 'click'),
purchases AS (
  SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
  FROM events WHERE event_type = 'purchase'),
pairs AS (
  SELECT p.user_id, p.purchase_id, p.purchase_ts, c.click_id, c.click_ts
  FROM purchases p JOIN clicks c
    ON c.user_id = p.user_id
   AND c.click_ts < p.purchase_ts
   AND c.click_ts >= p.purchase_ts - INTERVAL 1800 SECOND),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY purchase_id
                               ORDER BY click_ts DESC, click_id DESC) AS rn
  FROM pairs)
SELECT user_id, purchase_id, purchase_ts,
       CAST(COUNT(*) AS BIGINT) AS n_prior_clicks,
       MAX(CASE WHEN rn = 1 THEN click_id END) AS attributed_click
FROM ranked GROUP BY user_id, purchase_id, purchase_ts""",
    doc="last-touch conversion attribution: each purchase joined to the "
    "same user's clicks in the 30-minute lookback (equi-join on user_id "
    "with the time bound as a post-predicate — never a cross join), "
    "counting prior clicks and picking the latest as attributed; the "
    "batch twin of streaming/joins.py's stream-stream interval join, "
    "where the same range bound is what lets Spark expire click state",
    tags=("events", "join", "streaming"),
)
def join_event_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..streaming.joins import click_purchase_pairs

    t = load_tables(spark, sf_dir, ("events",))
    pairs = click_purchase_pairs(t["events"])
    w = W.partitionBy("purchase_id").orderBy(
        F.col("click_ts").desc(), F.col("click_id").desc()
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .groupBy("user_id", "purchase_id", "purchase_ts")
        .agg(
            F.count("*").cast("long").alias("n_prior_clicks"),
            F.max(F.when(F.col("rn") == 1, F.col("click_id"))).alias(
                "attributed_click"
            ),
        )
    )


# --- event-type transition bigrams (Markov path analysis) ------------------------
@register(
    "events_path_bigrams",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events)
SELECT prev_type AS src_type, event_type AS dst_type,
       CAST(COUNT(*) AS BIGINT) AS n
FROM seq WHERE prev_type IS NOT NULL
GROUP BY 1, 2""",
    doc="event-path transition counts (the Markov-chain edge weights "
    "behind user-journey analysis): per-user lag gives consecutive "
    "event-type bigrams, then one combinable count per (src, dst) — one "
    "shuffle for the sequence window, one for the tiny 25-row aggregate",
    tags=("events", "window"),
)
def events_path_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir, ("events",))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        t["events"]
        .select(
            "user_id",
            "event_type",
            F.lag("event_type").over(w).alias("src_type"),
        )
        .filter(F.col("src_type").isNotNull())
        .groupBy("src_type", F.col("event_type").alias("dst_type"))
        .agg(F.count("*").cast("long").alias("n"))
    )
