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
