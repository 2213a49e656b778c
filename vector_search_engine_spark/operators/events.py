"""Event-time operators over the ``events`` stream table: tumbling windows,
sessionization, JSON extraction, conditional pivots.

The reference's write path is streaming-shaped but has no event-time
semantics at all (SURVEY.md §2.7); these give the engine the real thing.
Batch forms are pinned against the oracle; the same plans run incrementally
under Structured Streaming (streaming/ingest.py) where the tumbling window
becomes ``F.window(ts, ...)`` + watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_S = 1800  # 30 min inactivity closes a session


def hourly_event_stats(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour event-time window per event type."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )


HOURLY_EVENT_STATS_ORACLE = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
"""


def sessionize(events: DataFrame, gap_s: int = SESSION_GAP_S) -> DataFrame:
    """Gap-based sessionization: a new session starts after >gap_s of
    inactivity.  Classic prefix-sum-of-boundaries formulation — two window
    functions, one shuffle on user_id."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    with_gap = events.withColumn(
        "new_session",
        F.when(
            F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
            > gap_s,
            1,
        )
        .otherwise(0)
        .cast("int"),
    ).withColumn(
        "session_seq",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        with_gap.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.min("ts").alias("session_start"),
            (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long")))
            .cast("long")
            .alias("duration_s"),
        )
        .select(
            "user_id",
            F.col("session_seq").cast("long").alias("session_seq"),
            "n_events",
            "session_start",
            "duration_s",
        )
    )


# floor(epoch(...)) matches Spark's timestamp->long cast (whole seconds)
SESSIONIZE_ORACLE = f"""
WITH g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > {SESSION_GAP_S}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM g
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       count(*) AS n_events,
       min(ts) AS session_start,
       CAST(max(floor(epoch(ts))) - min(floor(epoch(ts))) AS BIGINT) AS duration_s
FROM s
GROUP BY user_id, session_seq
"""


def json_props_stats(events: DataFrame) -> DataFrame:
    """JSON extraction from the ``props`` string column (semi-structured
    payloads — table stakes for a log-analytics engine)."""
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return events.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


JSON_PROPS_STATS_ORACLE = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
       min(CAST(props->>'$.k' AS BIGINT)) AS min_k,
       max(CAST(props->>'$.k' AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
"""


def user_funnel_pivot(events: DataFrame) -> DataFrame:
    """Conditional aggregation (pivot by event type) per user — top 50 most
    active users for bounded output."""
    cnt = lambda t: F.sum(  # noqa: E731
        F.when(F.col("event_type") == t, 1).otherwise(0)
    ).cast("long")
    return (
        events.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            cnt("view").alias("n_view"),
            cnt("click").alias("n_click"),
            cnt("purchase").alias("n_purchase"),
            cnt("error").alias("n_error"),
        )
        .orderBy(F.col("n_events").desc(), F.col("user_id"))
        .limit(50)
    )


USER_FUNNEL_PIVOT_ORACLE = """
SELECT user_id,
       count(*) AS n_events,
       count(*) FILTER (WHERE event_type = 'view') AS n_view,
       count(*) FILTER (WHERE event_type = 'click') AS n_click,
       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       count(*) FILTER (WHERE event_type = 'error') AS n_error
FROM events
GROUP BY user_id
ORDER BY n_events DESC, user_id
LIMIT 50
"""


def hourly_gapfill(events: DataFrame) -> DataFrame:
    """Gap-filled hourly rollup (the time_bucket_gapfill / hypertable
    pattern): every (hour, event_type) cell over the corpus's [min, max]
    hour span, zero-filled where no events landed.  The dense grid is
    generated declaratively — ``sequence()`` over the 2-row min/max agg
    crossed with the distinct types — so it is a broadcast-side derivation
    (a few thousand rows) regardless of fact-table size; the only big-data
    shuffle is the groupBy the rollup needs anyway."""
    counts = events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(F.count("*").cast("long").alias("n_events"))
    span = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    grid = span.select(
        F.explode(F.sequence("h0", "h1", F.expr("interval 1 hour"))).alias("hour")
    ).crossJoin(events.select("event_type").distinct())
    return (
        grid.join(counts, ["hour", "event_type"], "left")
        .select(
            "hour",
            "event_type",
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            (F.col("n_events").isNull()).alias("gap_filled"),
        )
    )


HOURLY_GAPFILL_ORACLE = """
WITH c AS (
  SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n_events
  FROM events GROUP BY 1, 2
),
grid AS (
  SELECT unnest(generate_series(date_trunc('hour', min(ts)),
                                date_trunc('hour', max(ts)),
                                INTERVAL 1 HOUR)) AS hour
  FROM events
),
full_grid AS (
  SELECT g.hour, t.event_type
  FROM grid g CROSS JOIN (SELECT DISTINCT event_type FROM events) t
)
SELECT f.hour, f.event_type,
       coalesce(c.n_events, 0) AS n_events,
       c.n_events IS NULL AS gap_filled
FROM full_grid f LEFT JOIN c ON f.hour = c.hour AND f.event_type = c.event_type
"""


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def daily_event_type_pivot(events: DataFrame) -> DataFrame:
    """True relational PIVOT (``RelationalGroupedDataset.pivot``): one
    column per event type, one row per day.  Pinning the pivot values
    skips the extra distinct-values job Spark otherwise runs — at 100 TB
    that first pass is a full scan you don't want."""
    return (
        # date_trunc (timestamp), not to_date: Python date objects land as
        # dtype=object driver-side, which the value-hash comparator
        # stringifies while the oracle's DATE arrives as datetime64
        events.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .pivot("event_type", EVENT_TYPES)
        # count(*) is rejected inside a Pivot; count(lit(1)) is the same agg
        .agg(F.count(F.lit(1)).cast("long"))
        .na.fill(0, EVENT_TYPES)
    )


DAILY_EVENT_TYPE_PIVOT_ORACLE = """
SELECT date_trunc('day', ts) AS day,
       count(*) FILTER (WHERE event_type = 'click') AS click,
       count(*) FILTER (WHERE event_type = 'error') AS error,
       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       count(*) FILTER (WHERE event_type = 'signup') AS signup,
       count(*) FILTER (WHERE event_type = 'view') AS view
FROM events
GROUP BY date_trunc('day', ts)
"""


def sliding_window_stats(events: DataFrame) -> DataFrame:
    """Sliding event-time windows (1 h wide, every 30 min) — each event
    lands in exactly 2 windows; one shuffle after Spark expands the
    window list per row."""
    w = F.window("ts", "1 hour", "30 minutes")
    return events.groupBy(w.alias("w"), "event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4).alias(
            "sum_value"
        ),
    ).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "event_type",
        "n_events",
        "sum_value",
    )


# each event replicated into its 2 covering windows via unnest-offsets
SLIDING_WINDOW_STATS_ORACLE = """
WITH expanded AS (
  SELECT e.*, time_bucket(INTERVAL '30 minutes', ts)
              - (o.o * INTERVAL '30 minutes') AS window_start
  FROM events e, (SELECT unnest([0, 1]) AS o) o
)
SELECT window_start,
       window_start + INTERVAL '1 hour' AS window_end,
       event_type,
       count(*) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_value
FROM expanded
GROUP BY window_start, event_type
"""


def user_cohort_retention(events: DataFrame) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, activity counted
    by day offset — two aggregations, one self-join on user_id (classic
    retention-triangle shape)."""
    day = F.date_trunc("day", F.col("ts"))
    cohort = events.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    activity = events.select("user_id", day.alias("active_day")).distinct()
    return (
        activity.join(cohort, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("active_day"), F.col("cohort_day"))
            .cast("long")
            .alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    )


USER_COHORT_RETENTION_ORACLE = """
WITH cohort AS (
  SELECT user_id, min(date_trunc('day', ts)) AS cohort_day
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS active_day FROM events
)
SELECT c.cohort_day,
       datediff('day', c.cohort_day, a.active_day)::BIGINT AS day_offset,
       count(DISTINCT a.user_id) AS n_users
FROM activity a JOIN cohort c USING (user_id)
GROUP BY c.cohort_day, day_offset
"""
