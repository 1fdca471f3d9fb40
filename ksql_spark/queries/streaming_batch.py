"""SURVEY.md §2.I — time-window aggregations, batch-testable forms.

The reference's only "streaming" is a one-shot snapshot reload (ksql.js:280);
the real streaming surface ([EXT]) lives in ksql_spark/streaming/. These batch
forms use the exact same window()/session_window() expressions that run under
readStream — the DuckDB oracle proves the window semantics; the streaming tests
(tests/test_streaming.py) prove batch/stream agreement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ksql_spark.registry import dsum, query, sql_dsum
from ksql_spark.tables import load


@query(
    "stream_tumbling_window",
    oracle=f"""
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS win_start,
           time_bucket(INTERVAL '10 minutes', ts) + INTERVAL 10 MINUTE AS win_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM events
    GROUP BY win_start, win_end
    """,
    ref="SURVEY §2 I2 (tumbling window; same expr streams under readStream)",
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    win = F.window("ts", "10 minutes")
    return (
        ev.groupBy(win)
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "stream_sliding_window",
    oracle="""
    SELECT win_start, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM (
        SELECT unnest([time_bucket(INTERVAL '5 minutes', ts),
                       time_bucket(INTERVAL '5 minutes', ts) - INTERVAL 5 MINUTE])
               AS win_start
        FROM events
    )
    GROUP BY win_start
    """,
    ref="SURVEY §2 I3 (sliding window 10m/5m: each event lands in 2 windows; "
    "oracle enumerates both member windows per event)",
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    win = F.window("ts", "10 minutes", "5 minutes")
    return (
        ev.groupBy(win)
        .agg(F.count("*").alias("n_events"))
        .select(F.col("window.start").alias("win_start"), "n_events")
    )


@query(
    "stream_session_window",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         >= INTERVAL 30 MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), numbered AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM numbered GROUP BY user_id, sid
    """,
    ref="SURVEY §2 I4 (session window, 30-min gap; oracle = gaps-and-islands. "
    "Spark session [start, last+gap) — an event at exactly prev+gap opens a "
    "new session, hence >= in the oracle)",
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "events_session_funnel",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, event_type, event_id,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         >= INTERVAL 30 MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), numbered AS (
        SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           CAST(count_if(event_type = 'view') AS BIGINT) AS n_views,
           CAST(count_if(event_type = 'purchase') AS BIGINT) AS n_purchases,
           COALESCE(
               MIN(CASE WHEN event_type = 'purchase' THEN ts END)
               > MIN(CASE WHEN event_type = 'view' THEN ts END), FALSE)
               AS converted
    FROM numbered GROUP BY user_id, sid
    """,
    ref="SURVEY §2 I4/E [EXT] (session funnel: gaps-and-islands sessionization "
    "+ view→purchase conversion per session — the standard product-analytics "
    "query; one shuffle on user_id, windows + conditional aggs)",
)
def events_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (user, 30-min session): views, purchases, and whether a purchase
    followed a view inside the session (conversion). Same sessionization as
    stream_session_window, so the streaming path can reuse the expression."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    prev_ts = F.lag("ts").over(w)
    new_session = F.when(
        prev_ts.isNull()
        | (F.col("ts") >= prev_ts + F.expr("INTERVAL 30 MINUTES")),
        1,
    ).otherwise(0)
    marked = ev.withColumn("new_session", new_session)
    sid = F.sum("new_session").over(
        Window.partitionBy("user_id").orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = marked.withColumn("sid", sid)
    first_view = F.min(F.when(F.col("event_type") == "view", F.col("ts")))
    first_buy = F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
    return numbered.groupBy("user_id", "sid").agg(
        F.min("ts").alias("session_start"),
        F.count_if(F.col("event_type") == "view").alias("n_views"),
        F.count_if(F.col("event_type") == "purchase").alias("n_purchases"),
        F.coalesce(first_buy > first_view, F.lit(False)).alias("converted"),
    ).drop("sid")


@query(
    "events_retention_cohort",
    oracle="""
    WITH firstday AS (
        SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS DATE) AS cohort_day
        FROM events GROUP BY user_id
    )
    SELECT f.cohort_day AS cohort_day,
           date_diff('day', f.cohort_day, CAST(date_trunc('day', e.ts) AS DATE))
               AS day_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
    FROM events e JOIN firstday f ON e.user_id = f.user_id
    WHERE date_diff('day', f.cohort_day, CAST(date_trunc('day', e.ts) AS DATE)) <= 7
    GROUP BY 1, 2
    """,
    ref="SURVEY §2 D/E [EXT] (retention cohorts: first-seen day per user -> "
    "day-offset activity matrix — the standard product-analytics retention "
    "triangle, companion to events_session_funnel)",
)
def events_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-0..7 retention triangle: users bucketed by first-event day, then
    distinct active users per (cohort_day, day_offset).

    Plan shape: ONE shuffle on user_id computes first-seen day; the join
    back to events rides the same hash partitioning (ReusedExchange-able);
    the final agg is |cohorts| x 8 rows. At 100 TB first-seen day comes from
    an incrementally-maintained user dimension instead of a full-history
    MIN — the query shape downstream is identical."""
    ev = load(spark, sf_dir, "events")
    firstday = ev.groupBy("user_id").agg(
        F.to_date(F.min("ts")).alias("cohort_day")
    )
    offset = F.datediff(F.to_date(F.col("ts")), F.col("cohort_day"))
    return (
        ev.join(firstday, "user_id")
        .where(offset <= 7)
        .select(
            "cohort_day",
            offset.cast("long").alias("day_offset"),
            "user_id",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user_id").alias("n_active"))
    )
