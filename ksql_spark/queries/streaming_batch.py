"""SURVEY.md §2.I — time-window aggregations, batch-testable forms.

The reference's only "streaming" is a one-shot snapshot reload (ksql.js:280);
the real streaming surface ([EXT]) lives in ksql_spark/streaming/. These batch
forms use the exact same window()/session_window() expressions that run under
readStream — the DuckDB oracle proves the window semantics; the streaming tests
(tests/test_streaming.py) prove batch/stream agreement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ksql_spark.registry import davg, dsum, query, sql_davg, sql_dsum
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


@query(
    "events_resample_gapfill",
    oracle="""
    WITH bounds AS (
        SELECT user_id,
               date_trunc('day', MIN(ts)) AS d0,
               date_trunc('day', MAX(ts)) AS d1
        FROM events GROUP BY user_id
    ),
    spine AS (
        SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day_ts
        FROM bounds
    ),
    daily AS (
        SELECT user_id, date_trunc('day', ts) AS day_ts,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY user_id, day_ts
    )
    SELECT s.user_id, s.day_ts,
           COALESCE(d.n_events, 0) AS n_events,
           d.n_events IS NULL AS was_gap
    FROM spine s LEFT JOIN daily d
      ON s.user_id = d.user_id AND s.day_ts = d.day_ts
    """,
    ref="SURVEY §2 I2/C2 [EXT] composite (time-series resample with gap "
    "fill: dense per-user daily spine, zero-filled — the standard prep step "
    "before any per-user rate/trend model)",
)
def events_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense per-user daily event counts: every day between a user's first
    and last event appears, with 0 + was_gap=true for silent days.

    Scale shape: one shuffle on user_id for the bounds agg; sequence()
    generates each user's spine INSIDE the agg output partition (narrow
    explode — no cross join against a calendar table); the daily counts
    shuffle on the same leading key. Spine size is bounded by
    users x days-of-history — at 100 TB partition the left join on
    (user_id) so both sides co-locate (the daily agg's exchange is reused).
    """
    ev = load(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    bounds = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    spine = bounds.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("INTERVAL 1 DAY"))
        ).alias("day_ts"),
    )
    daily = ev.groupBy(
        "user_id", day.alias("day_ts")
    ).agg(F.count("*").alias("n_events"))
    return (
        spine.join(daily, ["user_id", "day_ts"], "left")
        .select(
            "user_id",
            F.col("day_ts").cast("timestamp_ntz").alias("day_ts"),
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
            F.col("n_events").isNull().alias("was_gap"),
        )
    )


@query(
    "events_zscore_outliers",
    oracle=f"""
    WITH stats AS (
        SELECT event_type,
               {sql_davg('value')} AS mu,
               {sql_dsum('value * value')} AS sq,
               {sql_dsum('value')} AS s,
               CAST(COUNT(value) AS BIGINT) AS n
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           (e.value - mu) / sqrt((sq - s * s / n) / (n - 1)) AS z
    FROM events e JOIN stats USING (event_type)
    WHERE abs((e.value - mu) / sqrt((sq - s * s / n) / (n - 1))) > 3.0
    """,
    ref="SURVEY §2 D7/C1 [EXT] composite (per-group z-score outliers: "
    "group stats broadcast back onto the stream — telemetry anomaly "
    "flagging; variance via the quantized-sum formula so the oracle "
    "comparison is bitwise)",
)
def events_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value is >3 sample standard deviations from their event
    type's mean.

    Deterministic variance: plain stddev_samp accumulates doubles in
    partition order (low bits vary run to run and vs DuckDB), so the
    variance is built from quantized dsum/davg terms —
    (Σx² − (Σx)²/n)/(n−1) — which are bit-identical in both engines.

    Scale shape: the stats table is |event types| rows → broadcast join;
    the events side is a single narrow scan. No wide exchange at any SF."""
    ev = load(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        davg("value").alias("mu"),
        dsum(F.col("value") * F.col("value")).alias("sq"),
        dsum("value").alias("s"),
        F.count("value").alias("n"),
    )
    # try_divide at every step: an event type with 0/1 non-null values or a
    # CONSTANT value column zeroes a divisor, and Spark 4's default ANSI
    # mode aborts the whole job on plain division; NULL z matches DuckDB's
    # x/0 = NULL, and WHERE abs(NULL) > 3 filters the row in both engines.
    z = F.try_divide(
        F.col("value") - F.col("mu"),
        F.sqrt(
            F.try_divide(
                F.col("sq") - F.try_divide(F.col("s") * F.col("s"), F.col("n")),
                F.col("n") - 1,
            )
        ),
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select("event_id", "event_type", "value", z.alias("z"))
        .where(F.abs(F.col("z")) > 3.0)
    )


@query(
    "events_anomaly_mad",
    oracle="""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med_v
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_id, e.event_type, e.value, m.med_v,
               abs(e.value - m.med_v) AS adev
        FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type, quantile_cont(adev, 0.5) AS mad_v
        FROM dev GROUP BY event_type
    )
    SELECT d.event_id, d.event_type, d.value
    FROM dev d JOIN mad USING (event_type)
    WHERE abs(d.value - d.med_v) > 10.0 * mad_v
    """,
    ref="SURVEY §2 D8/C1 [EXT] (robust outliers: median absolute deviation "
    "— unlike the z-score (events_zscore_outliers), MAD is immune to the "
    "outliers it hunts; two grouped exact medians + broadcast joins)",
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events deviating more than 10 MADs from their type's median.

    Scale shape: two grouped percentile aggs (|event types| rows each,
    both broadcast back onto the narrow events scan) — robust statistics
    without sorting the corpus. percentile→percentile_approx at 100 TB.
    All comparisons are on exact interpolated medians (bitwise vs
    quantile_cont), so the inequality cannot flip cross-engine."""
    ev = load(spark, sf_dir, "events")
    med = ev.groupBy(F.col("event_type").alias("et1")).agg(
        F.percentile("value", F.lit(0.5)).alias("med_v")
    )
    dev = ev.join(
        F.broadcast(med), F.col("event_type") == F.col("et1")
    ).withColumn("adev", F.abs(F.col("value") - F.col("med_v")))
    mad = dev.groupBy(F.col("event_type").alias("et2")).agg(
        F.percentile("adev", F.lit(0.5)).alias("mad_v")
    )
    return (
        dev.join(F.broadcast(mad), F.col("event_type") == F.col("et2"))
        .where(F.abs(F.col("value") - F.col("med_v")) > 10.0 * F.col("mad_v"))
        .select("event_id", "event_type", "value")
    )


@query(
    "events_ewma_smooth",
    oracle="""
    WITH o AS (
        SELECT user_id, event_id, value,
               list_filter(
                   list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING),
                   x -> x IS NOT NULL) AS vals
        FROM events
    )
    SELECT user_id, event_id,
           CASE WHEN len(vals) > 0
                THEN list_reduce(vals, (acc, x) -> acc / 2 + x) END AS decay_sum,
           CASE WHEN len(vals) > 0
                THEN list_reduce(vals, (acc, x) -> acc / 2 + x)
                     / (2.0 - power(2.0, CAST(1 - len(vals) AS DOUBLE))) END AS ewma
    FROM o
    """,
    ref="SURVEY §2 E3/E4 [EXT] (per-user EWMA smoothing, alpha = 1/2: the "
    "telemetry trend line. BIT-EXACT cross-engine without quantization: "
    "the half-life recursion S_t = x_t + S_{t-1}/2 is a LEFT FOLD over the "
    "window-ordered value list — both engines fold the identical sequence "
    "left-to-right under IEEE-754, and /2 is exact, so every intermediate "
    "double matches bitwise; the normalizer 2 - 2^(1-n) is an exact power "
    "of two. A plain windowed SUM of value*pow(.5,lag) would NOT be "
    "order-stable)",
)
def events_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (half-life decay) of each
    user's value stream: decay_sum_t = sum_k value_k * 2^-(t-k) via the
    fold S -> S/2 + x over the ordered prefix, normalized by the exact
    weight total 2 - 2^(1-n).

    Scale shape: one user_id exchange for the window sort (inherent to any
    per-user ordered statistic); the fold runs JVM-side over the collected
    prefix (higher-order aggregate, no Python). Prefix lists make this
    O(n_user^2) memory in the worst case — fine for per-user event counts
    (<=1e3); a 100 TB deployment with huge single-user streams would chunk
    by session first (win_sessionize_gaps) and EWMA within sessions."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # collect_list DROPS NULL values — the oracle mirrors this exactly with
    # list_filter(..., x -> x IS NOT NULL) over DuckDB's list() window
    # (which, unlike collect_list, KEEPS NULL elements — unfiltered, one
    # NULL value would NULL the whole fold there while Spark skipped it).
    vals = F.collect_list("value").over(w)
    # empty prefix (all values NULL so far) → NULL, matching the oracle's
    # CASE len(vals) > 0 guard; an unguarded fold would give 0.0 here and
    # DuckDB's list_reduce would error on the empty list.
    fold = F.when(
        F.size(vals) > 0,
        F.aggregate(vals, F.lit(0.0), lambda acc, x: acc / F.lit(2.0) + x),
    )
    w_sum = F.lit(2.0) - F.pow(
        F.lit(2.0), (F.lit(1) - F.size(vals)).cast("double")
    )
    return ev.select(
        "user_id",
        "event_id",
        fold.alias("decay_sum"),
        # try_divide: w_sum is 0 on the empty prefix, and under Spark 4's
        # default ANSI mode a plain `/` ABORTS the whole job on that row
        # (DIVIDE_BY_ZERO). NULL matches the oracle's CASE guard.
        F.try_divide(fold, w_sum).alias("ewma"),
    )


@query(
    "events_cumulative_users",
    oracle="""
    WITH days AS (
        SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
        FROM events
    )
    SELECT day,
           CAST((SELECT COUNT(DISTINCT user_id) FROM events e
                 WHERE CAST(date_trunc('day', e.ts) AS TIMESTAMP) <= days.day)
                AS BIGINT) AS cum_users
    FROM days
    """,
    ref="SURVEY §2 I/K [EXT] (cumulative distinct users by day — running "
    "EXACT distinct via windowed bitmap OR, the growth-accounting query "
    "naive plans re-scan the whole history for, per day. CROSS-METHOD "
    "oracle: correlated COUNT(DISTINCT) re-derivation)",
)
def events_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cumulative distinct users through each day. The naive plan is
    a per-day rescan of all history (O(days x corpus)); this one builds one
    DAILY user bitmap (day, word_idx, bits), densifies missing (day, word)
    cells to 0 over the small day x word grid, runs bit_or as a RUNNING
    WINDOW per word_idx (each word's history accumulates independently —
    parallel across the id domain, sequential only in days), and popcounts
    per day. One fact shuffle + a grid-sized window; history is never
    re-read.

    Scale: the grid is n_days x (id_domain/32) rows = the total size of
    n_days bitmap snapshots — the same state any exact running-distinct
    must carry; it lives distributed, partitioned by word_idx."""
    from pyspark.sql import Window

    from ksql_spark.operators.bitmaps import bitmap_words

    ev = load(spark, sf_dir, "events")
    daily = bitmap_words(
        ev.select(F.date_trunc("day", "ts").alias("day"), "user_id"),
        "user_id",
        ["day"],
    )
    # observed days suffice here (unlike events_rolling_wau's calendar
    # spine): the unbounded frame accumulates ALL history regardless of
    # how many calendar days separate grid rows
    days = daily.select("day").distinct()
    widx = daily.select("word_idx").distinct()
    grid = days.crossJoin(widx)
    dense = grid.join(daily, ["day", "word_idx"], "left").select(
        "day", "word_idx", F.coalesce("bits", F.lit(0)).alias("bits")
    )
    w = (
        Window.partitionBy("word_idx")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        dense.withColumn("cum_bits", F.bit_or("bits").over(w))
        .groupBy("day")
        .agg(F.sum(F.bit_count("cum_bits")).cast("bigint").alias("cum_users"))
    )


@query(
    "events_time_to_convert",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
         v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
         m AS (
             SELECT p.user_id, p.ts AS pts, v.ts AS vts
             FROM p ASOF LEFT JOIN v
               ON p.user_id = v.user_id AND v.ts <= p.ts
         )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_conversions,
           quantile_cont(epoch_us(pts) - epoch_us(vts), 0.5) AS median_lag_us
    FROM m WHERE vts IS NOT NULL
    GROUP BY user_id
    """,
    ref="SURVEY §2 I/K [EXT] (view→purchase conversion latency: per-user "
    "median of each purchase's lag behind its as-of view — the funnel "
    "latency metric; exact integer microsecond lags, interpolated "
    "median bit-identical cross-engine)",
)
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median time from the last view to each purchase, per user —
    composes the backward as-of join (join_asof's single-shuffle window
    formulation, reused directly) with an exact median over integer
    microsecond lags. Purchases with no prior view are excluded.

    Scale shape: inherits join_asof's ONE user_id shuffle; the median
    re-agg rides the same user_id partitioning."""
    from ksql_spark.queries.joins import join_asof

    m = join_asof(spark, sf_dir).where(F.col("asof_view_ts").isNotNull())
    # unix_micros refuses TIMESTAMP_NTZ; the session TZ is UTC, so the
    # ntz->tz cast is value-preserving (same convention as the streaming
    # EWMA test)
    lag_us = F.unix_micros(F.col("purchase_ts").cast("timestamp")) - F.unix_micros(
        F.col("asof_view_ts").cast("timestamp")
    )
    return (
        m.select("user_id", lag_us.alias("lag_us"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_conversions"),
            F.percentile("lag_us", F.lit(0.5)).alias("median_lag_us"),
        )
    )


@query(
    "events_rolling_wau",
    oracle="""
    WITH days AS (
        SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
        FROM events
    )
    SELECT day,
           CAST((SELECT COUNT(DISTINCT user_id) FROM events e
                 WHERE CAST(date_trunc('day', e.ts) AS TIMESTAMP) <= days.day
                   AND CAST(date_trunc('day', e.ts) AS TIMESTAMP)
                       >= days.day - INTERVAL 6 DAY) AS BIGINT) AS wau
    FROM days
    """,
    ref="SURVEY §2 I/K [EXT] (rolling 7-day active users — WAU — via a "
    "7-row trailing bit_or window over daily user bitmaps: the sliding "
    "EXACT distinct that pairs with events_cumulative_users' unbounded "
    "form. CROSS-METHOD oracle: correlated windowed COUNT(DISTINCT))",
)
def events_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly-active-users per day, exactly: daily user bitmaps, then a
    ROWS 6 PRECEDING bit_or window per bitmap word (the dense day x word
    grid makes row-frames equal day-frames), popcounted per day. Naive
    WAU re-scans 7 days of history per day; this touches each daily
    bitmap once.

    Scale: same envelope as events_cumulative_users — the grid is
    n_days x id_domain/32, partitioned by word_idx; only the frame
    differs (trailing 7 vs unbounded)."""
    from pyspark.sql import Window

    from ksql_spark.operators.bitmaps import bitmap_words

    ev = load(spark, sf_dir, "events")
    daily = bitmap_words(
        ev.select(F.date_trunc("day", "ts").alias("day"), "user_id"),
        "user_id",
        ["day"],
    )
    # the day spine must be the CALENDAR sequence, not just observed days:
    # with a zero-event calendar day, a row frame over observed days would
    # reach further back than INTERVAL 6 DAY and overcount (the oracle's
    # calendar window is the contract)
    bounds = ev.agg(
        F.min(F.date_trunc("day", "ts")).alias("lo"),
        F.max(F.date_trunc("day", "ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    grid = spine.crossJoin(daily.select("word_idx").distinct())
    dense = grid.join(daily, ["day", "word_idx"], "left").select(
        "day", "word_idx", F.coalesce("bits", F.lit(0)).alias("bits")
    )
    w = (
        Window.partitionBy("word_idx")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    wau = (
        dense.withColumn("wk_bits", F.bit_or("bits").over(w))
        .groupBy("day")
        .agg(F.sum(F.bit_count("wk_bits")).cast("bigint").alias("wau"))
    )
    # emit only observed days, matching the oracle's day list
    return wau.join(daily.select("day").distinct(), "day", "left_semi")


@query(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    ),
    pairs AS (
        SELECT prev_type, event_type AS next_type, COUNT(*) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type
    ),
    tot AS (SELECT prev_type, SUM(n) AS t FROM pairs GROUP BY prev_type)
    SELECT pairs.prev_type AS prev_type, next_type,
           CAST(n AS BIGINT) AS n,
           CAST(n AS DOUBLE) / t AS p
    FROM pairs JOIN tot USING (prev_type)
    """,
    ref="SURVEY §2 E/K [EXT] (behavioral Markov chain: event-type "
    "transition counts and conditional probabilities from each user's "
    "time-ordered stream — the session-model fit behind next-action "
    "prediction and funnel anomaly detection)",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over event types: for every
    consecutive (prev -> next) pair within a user's (ts, event_id)-ordered
    stream, the count and the row-normalized probability P(next|prev).
    Exact integer counts and one IEEE division — bit-identical.

    Scale shape: one user_id shuffle for the lag window; the pair agg is
    |event_types|²-bounded, its row totals a broadcast join back."""
    from pyspark.sql import Window

    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).where(F.col("prev_type").isNotNull())
    pairs = (
        seq.groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
    )
    tot = pairs.groupBy("prev_type").agg(F.sum("n").alias("t"))
    return pairs.join(F.broadcast(tot), "prev_type").select(
        "prev_type",
        "next_type",
        F.col("n").cast("bigint").alias("n"),
        (F.col("n").cast("double") / F.col("t")).alias("p"),
    )


@query(
    "events_longest_streak",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d
        FROM events
    ),
    grp AS (
        SELECT user_id, d,
               d - INTERVAL (ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY d)) DAY AS anchor
        FROM days
    ),
    streaks AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS len,
               MIN(d) AS streak_start
        FROM grp GROUP BY user_id, anchor
    )
    SELECT user_id, len AS longest_streak, streak_start
    FROM (
        SELECT user_id, len, streak_start,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id
                   ORDER BY len DESC, streak_start
               ) AS rn
        FROM streaks
    ) WHERE rn = 1
    """,
    ref="SURVEY §2 E/K [EXT] (longest consecutive-day activity streak per "
    "user — the canonical gaps-and-islands shape: day minus its per-user "
    "row_number is constant exactly within a consecutive run; earliest "
    "longest streak wins ties)",
)
def events_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest run of consecutive active days per user (ties -> the
    earliest streak). The island anchor (day - row_number days) is exact
    date arithmetic — identical in both engines.

    Scale shape: one user_id shuffle; distinct days, the anchor window,
    and both aggregations all ride the same partitioning."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).distinct()
    rn = F.row_number().over(Window.partitionBy("user_id").orderBy("d"))
    grp = days.withColumn("rn", rn).withColumn(
        "anchor", F.col("d") - F.expr("make_interval(0, 0, 0, rn)")
    )
    streaks = grp.groupBy("user_id", "anchor").agg(
        F.count("*").alias("len"), F.min("d").alias("streak_start")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("len").desc(), "streak_start"
    )
    return (
        streaks.withColumn("rn2", F.row_number().over(w))
        .where(F.col("rn2") == 1)
        .select(
            "user_id",
            F.col("len").cast("bigint").alias("longest_streak"),
            "streak_start",
        )
    )


@query(
    "events_pattern_vvp",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_id, event_type,
               lag(event_type, 1) OVER w AS prev1,
               lag(event_type, 2) OVER w AS prev2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_matches,
           CAST(MIN(event_id) AS BIGINT) AS first_match_event
    FROM seq
    WHERE event_type = 'purchase' AND prev1 = 'view' AND prev2 = 'view'
    GROUP BY user_id
    """,
    ref="SURVEY §2 E/I [EXT] (sequence pattern detection — the "
    "MATCH_RECOGNIZE-lite CEP shape: find every view,view,purchase run of "
    "3 consecutive events per user via lag chains; one user_id shuffle)",
)
def events_pattern_vvp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count view→view→purchase patterns in each user's consecutive event
    stream (the 'browsed then bought' CEP signal). A lag-chain over the
    (ts, event_id) total order is the portable spelling of the simplest
    MATCH_RECOGNIZE pattern — neither engine has the full operator, both
    have lag.

    Scale shape: one user_id shuffle, sequential scan, no joins; longer
    patterns add lags, not passes."""
    from pyspark.sql import Window

    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.lag("event_type", 1).over(w).alias("prev1"),
        F.lag("event_type", 2).over(w).alias("prev2"),
    )
    return (
        seq.where(
            (F.col("event_type") == "purchase")
            & (F.col("prev1") == "view")
            & (F.col("prev2") == "view")
        )
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_matches"),
            F.min("event_id").cast("bigint").alias("first_match_event"),
        )
    )


@query(
    "events_cusum_drift",
    oracle=f"""
    WITH stats AS (
        SELECT event_type, {sql_davg('value')} AS mu FROM events
        GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, e.event_id, e.ts, e.value, s.mu,
               CAST(SUM(CAST(floor((e.value - s.mu) * 1000000 + 0.5)
                             AS BIGINT)) OVER (
                   PARTITION BY e.event_type ORDER BY e.ts, e.event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) / 1000000.0 AS cusum
        FROM events e JOIN stats s USING (event_type)
    )
    SELECT event_type, event_id, cusum,
           abs(cusum) > 50.0 AS drifted
    FROM dev
    """,
    ref="SURVEY §2 K64 [EXT] (CUSUM drift detection: running sum of "
    "per-type mean deviations — the classic change-point monitor; a "
    "sustained shift in the value distribution accumulates linearly "
    "while noise cancels. Quantized running sum, threshold can't flip "
    "on a ulp)",
)
def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point signal per event type: the running sum of
    (value - type mean) over time order. Under a stable distribution the
    deviations cancel; after a level shift the cusum ramps linearly and
    crosses the alarm threshold — the standard production-metric drift
    monitor, here with a quantized accumulation so both engines agree
    bitwise on every partial sum and on the flag.

    Scale shape: type means broadcast back onto the scan; the running
    window partitions by event_type (parallel across types; a single
    dominant type takes the two-stage cumsum form)."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(davg("value").alias("mu"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # floor(x + 0.5), NOT the dsum helper's trunc-based cast: deviations are
    # sign-symmetric (half the rows are negative), and cast-to-long truncates
    # TOWARD ZERO — that would round every negative deviation one quantum
    # high, a deterministic +0.5e-6/row bias that ramps a drift-free cusum
    # into the alarm at ~1e8 rows. floor is symmetric round-half-up and
    # bit-identical in DuckDB. (dsum's users are positive-valued, where
    # trunc == floor.)
    dev_scaled = F.floor(
        (F.col("value") - F.col("mu")) * F.lit(1_000_000.0) + F.lit(0.5)
    ).cast("long")
    cusum = F.sum(dev_scaled).over(w).cast("double") / F.lit(1_000_000.0)
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "event_id",
            cusum.alias("cusum"),
            (F.abs(cusum) > 50.0).alias("drifted"),
        )
    )


@query(
    "events_anomaly_iqr",
    oracle="""
    WITH q AS (
        SELECT event_type,
               quantile_cont(value, 0.25) AS q1,
               quantile_cont(value, 0.75) AS q3
        FROM events GROUP BY event_type
    )
    SELECT e.event_type, e.event_id, e.value,
           e.value < q1 - 1.5 * (q3 - q1)
           OR e.value > q3 + 1.5 * (q3 - q1) AS is_outlier
    FROM events e JOIN q USING (event_type)
    """,
    ref="SURVEY §2 K65 [EXT] (Tukey-fence IQR outliers — the third robust "
    "screen beside z-score (K30, mean/stddev: fast, outlier-sensitive) "
    "and MAD (K35, most robust): quartile fences at 1.5·IQR, the boxplot "
    "rule. Exact interpolated quartiles bit-match DuckDB quantile_cont)",
)
def events_anomaly_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey's boxplot rule per event type: values outside
    [q1 - 1.5·IQR, q3 + 1.5·IQR] flag as outliers. Completes the robust-
    outlier trio — pick z-score for speed, IQR for the standard boxplot
    contract, MAD when even the quartiles may be contaminated.

    Scale shape: per-type exact quartiles (percentile_approx at 100 TB —
    same plan) broadcast back onto the scan; the flag is a per-row
    comparison on quantized-free exact-operand doubles."""
    ev = load(spark, sf_dir, "events")
    q = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.25)).alias("q1"),
        F.percentile("value", F.lit(0.75)).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    return ev.join(F.broadcast(q), "event_type").select(
        "event_type",
        "event_id",
        "value",
        (
            (F.col("value") < F.col("q1") - 1.5 * iqr)
            | (F.col("value") > F.col("q3") + 1.5 * iqr)
        ).alias("is_outlier"),
    )


_ACF_OVER = "OVER (PARTITION BY event_type ORDER BY ts, event_id)"


@query(
    "events_autocorrelation",
    oracle=f"""
    WITH base AS (
        SELECT event_type, value,
               lag(value, 1) {_ACF_OVER} AS y1,
               lag(value, 2) {_ACF_OVER} AS y2,
               lag(value, 3) {_ACF_OVER} AS y3
        FROM events
    ), pairs AS (
        SELECT event_type, 1 AS lag, value AS x, y1 AS y FROM base WHERE y1 IS NOT NULL
        UNION ALL
        SELECT event_type, 2, value, y2 FROM base WHERE y2 IS NOT NULL
        UNION ALL
        SELECT event_type, 3, value, y3 FROM base WHERE y3 IS NOT NULL
    )
    SELECT event_type, CAST(lag AS INT) AS lag,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(CAST(trunc(
               (COUNT(*) * ({sql_dsum('x * y')})
                - ({sql_dsum('x')}) * ({sql_dsum('y')}))
               / (sqrt(COUNT(*) * ({sql_dsum('x * x')})
                       - ({sql_dsum('x')}) * ({sql_dsum('x')}))
                  * sqrt(COUNT(*) * ({sql_dsum('y * y')})
                         - ({sql_dsum('y')}) * ({sql_dsum('y')})))
               * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0 AS acf
    FROM pairs GROUP BY event_type, lag
    """,
    ref="SURVEY §2 K57 family [EXT] (autocorrelation function at lags 1-3 "
    "per event-type series — the stationarity/seasonality screen run "
    "before trusting EWMA (K41) or CUSUM (K64) parameters; Pearson "
    "moment form over lag-paired values, the agg_corr discipline)",
)
def events_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACF(1..3) per event_type: pair each value with its lag-k predecessor
    in (ts, event_id) order, then Pearson r per (type, lag) in moment form
    with every sum an exact integer-quantized accumulation (partition-order
    and engine independent, like agg_corr).

    Scale shape: ONE per-type window pass computes all three lag columns
    (no self-joins), stack() unpivots them narrowly, and the final agg is
    a (|types| x 3)-group hash agg. Windows partition by the series key —
    per-series sequential work, parallel across series, the same posture
    as every events_* window entry (a 100 TB deployment keys series at
    sensor/entity granularity, millions of partitions)."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    base = ev.select(
        "event_type",
        F.col("value").alias("x"),
        F.lag("value", 1).over(w).alias("y1"),
        F.lag("value", 2).over(w).alias("y2"),
        F.lag("value", 3).over(w).alias("y3"),
    )
    pairs = base.select(
        "event_type",
        "x",
        F.expr("stack(3, 1, y1, 2, y2, 3, y3) AS (lag, y)"),
    ).where(F.col("y").isNotNull())
    n = F.count("*")
    sx, sy = dsum("x"), dsum("y")
    sxx, syy, sxy = (
        dsum(F.col("x") * F.col("x")),
        dsum(F.col("y") * F.col("y")),
        dsum(F.col("x") * F.col("y")),
    )
    r = F.try_divide(
        n * sxy - sx * sy,
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy),
    )
    return pairs.groupBy("event_type", F.col("lag").cast("int").alias("lag")).agg(
        n.cast("bigint").alias("n_pairs"),
        ((r * 1000000.0 + 0.5).cast("long").cast("double") / 1000000.0).alias("acf"),
    )


@query(
    "events_holt_linear",
    oracle="""
    WITH RECURSIVE series AS (
        SELECT user_id,
               list_filter(list(value ORDER BY ts, event_id),
                           x -> x IS NOT NULL) AS vals
        FROM events GROUP BY user_id
    ), nonempty AS (
        SELECT user_id, vals, len(vals) AS n FROM series WHERE len(vals) >= 1
    ), step AS (
        SELECT user_id, vals, n, 1 AS i,
               CAST(vals[1] AS DOUBLE) AS l, CAST(0.0 AS DOUBLE) AS b
        FROM nonempty
        UNION ALL
        SELECT user_id, vals, n, i + 1,
               vals[i + 1] / 2.0 + (l + b) / 2.0,
               ((vals[i + 1] / 2.0 + (l + b) / 2.0) - l) / 2.0 + b / 2.0
        FROM step WHERE i < n
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_obs,
           l AS level, b AS trend, l + b AS forecast_next
    FROM step WHERE i = n
    """,
    ref="SURVEY §2 K72 [EXT] (Holt linear double-exponential smoothing, "
    "alpha = beta = 1/2: level+trend recursion per user series, the "
    "trend-aware upgrade of events_ewma_smooth's single smoother; "
    "BIT-EXACT cross-engine — halving is IEEE-exact and both engines "
    "evaluate the identical add/subtract sequence, Spark as a struct-state "
    "left fold, DuckDB as a recursive CTE)",
)
def events_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear method per user: l_t = x_t/2 + (l_{t-1}+b_{t-1})/2,
    b_t = (l_t - l_{t-1})/2 + b_{t-1}/2, initialized l_1 = x_1, b_1 = 0;
    returns the final state and the one-step forecast l + b.

    Scale shape: ONE user_id shuffle into a per-user sorted list, then an
    O(n) JVM-side struct fold — no prefix lists (unlike the per-row EWMA
    entry), so memory is O(series length) per user and the output is one
    row per user. Huge single-user streams chunk by session first, the
    events_ewma_smooth caveat."""
    ev = load(spark, sf_dir, "events")
    arr = F.sort_array(F.collect_list(F.struct("ts", "event_id", "value")))
    vals = F.filter(
        F.transform(arr, lambda x: x["value"]), lambda v: v.isNotNull()
    )
    series = (
        ev.groupBy("user_id")
        .agg(vals.alias("vals"))
        .where(F.size("vals") >= 1)
        .withColumn("n", F.size("vals"))
    )
    init = F.struct(
        F.element_at("vals", 1).cast("double").alias("l"),
        F.lit(0.0).alias("b"),
    )
    rest = F.slice(F.col("vals"), 2, F.greatest(F.col("n") - 1, F.lit(0)))

    def _step(acc, x):
        new_l = x / F.lit(2.0) + (acc["l"] + acc["b"]) / F.lit(2.0)
        return F.struct(
            new_l.alias("l"),
            ((new_l - acc["l"]) / F.lit(2.0) + acc["b"] / F.lit(2.0)).alias("b"),
        )

    state = F.aggregate(rest, init, _step)
    return series.select(
        "user_id",
        F.col("n").cast("bigint").alias("n_obs"),
        state["l"].alias("level"),
        state["b"].alias("trend"),
        (state["l"] + state["b"]).alias("forecast_next"),
    )


@query(
    "events_holt_winters",
    oracle="""
    WITH RECURSIVE daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(COUNT(*) AS DOUBLE) AS x
        FROM events GROUP BY event_type, date_trunc('day', ts)
    ), series AS (
        SELECT event_type, list(x ORDER BY day) AS vals
        FROM daily GROUP BY event_type
    ), ready AS (
        SELECT event_type, vals, len(vals) AS n,
               (vals[1] + vals[2] + vals[3] + vals[4] + vals[5] + vals[6]
                + vals[7]) / 7.0 AS l0
        FROM series WHERE len(vals) >= 7
    ), step AS (
        SELECT event_type, vals, n, 7 AS i,
               l0 AS l, CAST(0.0 AS DOUBLE) AS b,
               list_transform(vals[1:7], v -> v - l0) AS seas
        FROM ready
        UNION ALL
        SELECT event_type, vals, n, i + 1,
               (vals[i + 1] - seas[1]) / 2.0 + (l + b) / 2.0,
               (((vals[i + 1] - seas[1]) / 2.0 + (l + b) / 2.0) - l) / 2.0
                   + b / 2.0,
               seas[2:7] ||
               [(vals[i + 1]
                 - ((vals[i + 1] - seas[1]) / 2.0 + (l + b) / 2.0)) / 2.0
                + seas[1] / 2.0]
        FROM step WHERE i < n
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           l AS level, b AS trend,
           l + b + seas[1] AS forecast_next
    FROM step WHERE i = n
    """,
    ref="SURVEY §2 K76 [EXT] (Holt-Winters additive triple-exponential "
    "smoothing, period 7, alpha = beta = gamma = 1/2: level+trend+seasonal "
    "recursion per event-type daily series — the seasonality-aware top of "
    "the EWMA (K41) / Holt (K72) smoother ladder; BIT-EXACT cross-engine: "
    "both engines evaluate the identical IEEE op sequence, Spark as a "
    "struct-state fold carrying a rolling 7-slot seasonal array, DuckDB "
    "as a recursive CTE carrying the same list)",
)
def events_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters additive per event type on daily counts, m = 7:
    l_t = (x_t - s_{t-7})/2 + (l+b)/2, b_t = (l_t - l)/2 + b/2,
    s_t = (x_t - l_t)/2 + s_{t-7}/2; initialized after the first season
    with l = mean(x_1..x_7) (explicit left-associated sum, so the fold
    and the SQL chain are the same IEEE sequence), b = 0, s_i = x_i - l.
    Forecast = l + b + next season slot.

    Scale shape: the daily pre-aggregation collapses the event stream to
    |types| x |days| rows BEFORE any per-series state; then one shuffle
    to per-type sorted lists and an O(n) JVM fold whose state is
    (l, b, 7-slot array) — constant per series, no prefix lists. The
    seasonal array rolls via slice+append inside the fold (the same
    bounded-state discipline as the CMS grid). Per-type series are
    calendar-bounded; a 100 TB corpus adds width (more types), not
    series length."""
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count("*").cast("double").alias("x"))
    )
    series = (
        daily.groupBy("event_type")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("day", "x"))),
                lambda s: s["x"],
            ).alias("vals")
        )
        .where(F.size("vals") >= 7)
        .withColumn("n", F.size("vals"))
    )
    first7 = F.slice(F.col("vals"), 1, 7)
    l0 = F.aggregate(first7, F.lit(0.0), lambda a, v: a + v) / F.lit(7.0)
    ready = series.select(
        "event_type", "vals", "n", l0.alias("l0")
    )
    init = F.struct(
        F.col("l0").alias("l"),
        F.lit(0.0).alias("b"),
        F.transform(
            F.slice(F.col("vals"), 1, 7), lambda v: v - F.col("l0")
        ).alias("seas"),
    )
    rest = F.slice(
        F.col("vals"), 8, F.greatest(F.col("n") - 7, F.lit(0))
    )

    def _step(acc, x):
        s_old = F.element_at(acc["seas"], 1)
        new_l = (x - s_old) / F.lit(2.0) + (acc["l"] + acc["b"]) / F.lit(2.0)
        new_b = (new_l - acc["l"]) / F.lit(2.0) + acc["b"] / F.lit(2.0)
        new_s = (x - new_l) / F.lit(2.0) + s_old / F.lit(2.0)
        return F.struct(
            new_l.alias("l"),
            new_b.alias("b"),
            F.concat(F.slice(acc["seas"], 2, 6), F.array(new_s)).alias("seas"),
        )

    state = F.aggregate(rest, init, _step)
    return ready.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        state["l"].alias("level"),
        state["b"].alias("trend"),
        (state["l"] + state["b"] + F.element_at(state["seas"], 1)).alias(
            "forecast_next"
        ),
    )


@query(
    "events_retention_cohorts",
    oracle="""
    WITH ue AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        FROM events
    ), cohort AS (
        SELECT user_id, MIN(day) AS cohort_day FROM ue GROUP BY user_id
    ), cell AS (
        SELECT c.cohort_day,
               CAST(date_diff('day', c.cohort_day, ue.day) AS BIGINT)
                   AS day_offset,
               ue.user_id
        FROM ue JOIN cohort c USING (user_id)
    ), sized AS (
        SELECT cohort_day, CAST(COUNT(DISTINCT user_id) AS BIGINT)
                   AS cohort_size
        FROM cohort GROUP BY cohort_day
        -- cohort table: cohort_day is per-user MIN, one row per user
    )
    SELECT cell.cohort_day, cell.day_offset,
           CAST(COUNT(DISTINCT cell.user_id) AS BIGINT) AS active_users,
           s.cohort_size
    FROM cell JOIN (
        SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS cohort_size
        FROM cohort GROUP BY cohort_day
    ) s USING (cohort_day)
    GROUP BY cell.cohort_day, cell.day_offset, s.cohort_size
    """,
    ref="SURVEY §2 K80 [EXT] (retention cohort matrix: users grouped by "
    "first-active day, activity counted per day offset — the product-"
    "analytics retention triangle; the cohort-relative counterpart of "
    "rolling WAU (I14))",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: for each first-active-day cohort and day
    offset, how many of the cohort's users were active — plus the cohort
    size for computing retention rates downstream.

    Scale shape: per-user first day is one user-keyed hash agg; the join
    back is user-keyed (co-partitioned with the dedup that follows);
    per-(cohort, offset) distinct users collapses via a (cohort, offset,
    user) dedup agg BEFORE the counting agg, so the count never plans an
    Expand over raw events. Cohort sizes are a calendar-bounded re-agg of
    the per-user table, joined on cohort_day (broadcastable: |days|
    rows). Output is the |days| x |offsets| triangle — calendar-bounded
    at any corpus size."""
    ev = load(spark, sf_dir, "events")
    ue = ev.select(
        "user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
    )
    cohort = ue.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    cell = (
        ue.join(cohort, "user_id")
        .select(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day"))
            .cast("bigint")
            .alias("day_offset"),
            "user_id",
        )
        .distinct()
    )
    sizes = cohort.groupBy("cohort_day").agg(
        F.count("*").alias("cohort_size")
    )
    return (
        cell.groupBy("cohort_day", "day_offset")
        .agg(F.count("*").alias("active_users"))
        .join(F.broadcast(sizes), "cohort_day")
        .select("cohort_day", "day_offset", "active_users", "cohort_size")
    )


@query(
    "events_seasonality_index",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY event_type, date_trunc('day', ts)
    ), dow AS (
        SELECT event_type, CAST(isodow(day) AS INT) AS iso_dow,
               CAST(SUM(c) AS BIGINT) AS n_events,
               CAST(COUNT(*) AS BIGINT) AS n_days
        FROM daily GROUP BY event_type, isodow(day)
    ), base AS (
        SELECT event_type,
               CAST(SUM(n_events) AS DOUBLE) / CAST(SUM(n_days) AS DOUBLE)
                   AS overall_daily_mean
        FROM dow GROUP BY event_type
    )
    SELECT d.event_type, d.iso_dow, d.n_events,
           CAST(trunc(
               (CAST(d.n_events AS DOUBLE) / CAST(d.n_days AS DOUBLE))
               / b.overall_daily_mean * 1000000 + 0.5) AS BIGINT)
               / 1000000.0 AS seasonal_index
    FROM dow d JOIN base b USING (event_type)
    """,
    ref="SURVEY §2 K82 [EXT] (day-of-week seasonality index: mean daily "
    "count per ISO weekday / overall daily mean, per event type — the "
    "classical-decomposition seasonal factor that CALIBRATES Holt-Winters "
    "(K76) period choice and gap-fill expectations (K29); uses the "
    "weekday()+1 == isodow() portability pin from fn_date_arith)",
)
def events_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal index per (event_type, ISO weekday): a value of 1.1 means
    that weekday runs 10% above the type's average day. Denominator is
    the type's overall daily mean recomputed from the same per-dow
    aggregate (sum of events / sum of observed days), so the index is
    self-consistent and day-count-weighted.

    Scale shape: the event stream collapses to |types| x |days| in ONE
    hash agg; the per-dow and per-type re-aggregations and the join back
    operate on calendar-bounded rows (<= types x 7). Nothing after the
    first agg is data-sized."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
    ).agg(F.count("*").alias("c"))
    dow = daily.groupBy(
        "event_type", (F.weekday("day") + 1).cast("int").alias("iso_dow")
    ).agg(
        F.sum("c").alias("n_events"),
        F.count("*").alias("n_days"),
    )
    base = dow.groupBy("event_type").agg(
        (
            F.sum("n_events").cast("double") / F.sum("n_days").cast("double")
        ).alias("overall_daily_mean")
    )
    idx = (
        (F.col("n_events").cast("double") / F.col("n_days").cast("double"))
        / F.col("overall_daily_mean")
        * 1000000
        + 0.5
    ).cast("bigint").cast("double") / 1000000.0
    return (
        dow.join(F.broadcast(base), "event_type")
        .select("event_type", "iso_dow", "n_events", idx.alias("seasonal_index"))
    )


@query(
    "events_ab_proportion_test",
    oracle="""
    WITH per_user AS (
        SELECT user_id, CAST(user_id % 2 AS INT) AS variant,
               MAX(CASE WHEN event_type = 'purchase'
                             AND ts < TIMESTAMP '2024-01-03'
                        THEN 1 ELSE 0 END) AS converted
        FROM events GROUP BY user_id
    ), arms AS (
        SELECT variant,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(converted) AS BIGINT) AS n_converted
        FROM per_user GROUP BY variant
    ), wide AS (
        SELECT
            MAX(CASE WHEN variant = 0 THEN n_users END) AS n0,
            MAX(CASE WHEN variant = 0 THEN n_converted END) AS c0,
            MAX(CASE WHEN variant = 1 THEN n_users END) AS n1,
            MAX(CASE WHEN variant = 1 THEN n_converted END) AS c1
        FROM arms
    )
    SELECT n0, c0, n1, c1,
           CAST(trunc(CAST(c0 AS DOUBLE) / n0 * 1000000 + 0.5) AS BIGINT)
               / 1000000.0 AS rate0,
           CAST(trunc(CAST(c1 AS DOUBLE) / n1 * 1000000 + 0.5) AS BIGINT)
               / 1000000.0 AS rate1,
           CAST(trunc(
               (CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
               / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                      * (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                      * (1.0 / n0 + 1.0 / n1))
               * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS z_stat
    FROM wide
    """,
    ref="SURVEY §2 K83 [EXT] (two-proportion z-test on conversion: "
    "user-level A/B arms by id parity, pooled-variance z statistic — the "
    "experiment-readout primitive behind every product launch decision; "
    "user-level conversion FIRST so heavy users can't inflate an arm)",
)
def events_ab_proportion_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled two-proportion z-test comparing purchase conversion between
    the even/odd user-id arms (a stand-in for a real assignment column —
    the operator shape is identical); conversion = purchased within the
    first two days (an unbounded horizon saturates both arms at 100% and
    degenerates the pooled variance to zero). Conversion is per USER (max
    over events), the denominator is users, not events — the
    unit-of-analysis correctness that naive event-level rates get wrong.
    try_divide keeps a degenerate split (pp in {0,1}) a NULL z rather
    than an ANSI abort, matching SQL x/0 semantics.

    Scale shape: one user-keyed hash agg (map-side combined) collapses
    the stream to per-user rows; the arm totals are a 2-row re-agg; the
    z arithmetic is a 1-row projection, quantized to 1e-6. Nothing after
    the first agg is data-sized."""
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") < F.lit("2024-01-03").cast("timestamp_ntz")),
                1,
            ).otherwise(0)
        ).alias("converted")
    ).select(
        (F.col("user_id") % 2).cast("int").alias("variant"), "converted"
    )
    arms = per_user.groupBy("variant").agg(
        F.count("*").alias("n_users"),
        F.sum("converted").alias("n_converted"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n_users"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("n_converted"))).alias("c0"),
        F.max(F.when(F.col("variant") == 1, F.col("n_users"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("n_converted"))).alias("c1"),
    )
    p0 = F.col("c0").cast("double") / F.col("n0")
    p1 = F.col("c1").cast("double") / F.col("n1")
    pp = (F.col("c0") + F.col("c1")).cast("double") / (F.col("n0") + F.col("n1"))
    z = F.try_divide(
        p1 - p0,
        F.sqrt(pp * (1.0 - pp) * (1.0 / F.col("n0") + 1.0 / F.col("n1"))),
    )

    def q6(c):
        return (c * 1000000 + 0.5).cast("bigint").cast("double") / 1000000.0

    return wide.select(
        "n0", "c0", "n1", "c1",
        q6(p0).alias("rate0"),
        q6(p1).alias("rate1"),
        q6(z).alias("z_stat"),
    )


@query(
    "events_type_correlation",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY date_trunc('day', ts), event_type
    ), pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(a.c AS DOUBLE) AS x, CAST(b.c AS DOUBLE) AS y
        FROM daily a JOIN daily b USING (day)
        WHERE a.event_type < b.event_type
    )
    SELECT type_a, type_b, CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(trunc(
               (COUNT(*) * ({sql_dsum('x * y')})
                - ({sql_dsum('x')}) * ({sql_dsum('y')}))
               / (sqrt(COUNT(*) * ({sql_dsum('x * x')})
                       - ({sql_dsum('x')}) * ({sql_dsum('x')}))
                  * sqrt(COUNT(*) * ({sql_dsum('y * y')})
                         - ({sql_dsum('y')}) * ({sql_dsum('y')})))
               * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS pearson_r
    FROM pairs GROUP BY type_a, type_b
    """,
    ref="SURVEY §2 K84 [EXT] (cross-type correlation matrix: Pearson r "
    "between daily count series of every event-type pair — the co-"
    "movement screen behind alert grouping and root-cause triage; the "
    "CROSS-series companion of K67's per-series autocorrelation)",
)
def events_type_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between each pair of event types' daily count
    series (type_a < type_b — each pair once), exact-moment formulation
    with scaled-long sums (the K67/agg_stats discipline), quantized to
    1e-6.

    Scale shape: the stream collapses to |types| x |days| in one hash
    agg; the pair build is a day-keyed self-join of that CALENDAR-BOUNDED
    table (|types|² x |days| rows max — never event-sized), then one
    bounded-output agg. At 100 TB only the first agg's exchange grows."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
        "event_type",
    ).agg(F.count("*").alias("c"))
    a = daily.select(
        "day", F.col("event_type").alias("type_a"), F.col("c").cast("double").alias("x")
    )
    b = daily.select(
        "day", F.col("event_type").alias("type_b"), F.col("c").cast("double").alias("y")
    )
    pairs = a.join(b, "day").where(F.col("type_a") < F.col("type_b"))
    n = F.count("*")
    sx, sy = dsum("x"), dsum("y")
    sxx, syy, sxy = dsum(F.col("x") * F.col("x")), dsum(F.col("y") * F.col("y")), dsum(
        F.col("x") * F.col("y")
    )
    # try_divide: a constant series has zero variance — NULL r (SQL x/0
    # semantics), not an ANSI job abort (the degenerate-corpus net)
    r = F.try_divide(
        n * sxy - sx * sy,
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy),
    )
    return pairs.groupBy("type_a", "type_b").agg(
        n.cast("bigint").alias("n_days"),
        ((r * 1000000 + 0.5).cast("bigint").cast("double") / 1000000.0).alias(
            "pearson_r"
        ),
    )


_PATH_TOPK = 10


@query(
    "events_top_paths",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_type AS e1,
               lead(event_type, 1) OVER w AS e2,
               lead(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), triples AS (
        SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n_occurrences
        FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        GROUP BY e1, e2, e3
    )
    SELECT e1, e2, e3, n_occurrences, CAST(rnk AS INT) AS rank
    FROM (
        SELECT *, row_number() OVER (ORDER BY n_occurrences DESC,
                                     e1, e2, e3) AS rnk
        FROM triples
    ) WHERE rnk <= {_PATH_TOPK}
    """,
    ref="SURVEY §2 K86 [EXT] (sequential path mining: top 3-step event "
    "paths by occurrence over per-user time-ordered streams — the "
    "navigation-flow / funnel-discovery primitive; generalizes the "
    "first-order Markov view (K57) to path n-grams, and longer paths "
    "add lags, not passes — the K60 CEP argument)",
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ten most common consecutive 3-event paths across all users (ties
    broken lexicographically). Paths come from TWO leads over one
    per-user window pass — no self-joins; a k-step path is k-1 leads in
    the same pass.

    Scale shape: one user-keyed window shuffle (the per-user sort is the
    same exchange every sessionize/CEP entry rides), then a hash agg
    whose output is |types|³-bounded, then a TakeOrdered-sized rank over
    that bounded table. Per-user stream length bounds window memory; the
    K41 chunk-by-session caveat applies to degenerate single-key
    streams."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).where(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    triples = seq.groupBy("e1", "e2", "e3").agg(
        F.count("*").alias("n_occurrences")
    )
    rw = Window.orderBy(F.col("n_occurrences").desc(), "e1", "e2", "e3")
    return (
        triples.withColumn("rank", F.row_number().over(rw))
        .where(F.col("rank") <= _PATH_TOPK)
        .select("e1", "e2", "e3", "n_occurrences",
                F.col("rank").cast("int").alias("rank"))
    )


@query(
    "events_rolling_slope",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY event_type, date_trunc('day', ts)
    ), idx AS (
        SELECT event_type, day, c,
               CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
                    AS BIGINT) AS x
        FROM daily
    ), framed AS (
        SELECT event_type, day, x,
               CAST(COUNT(*) OVER w AS BIGINT) AS n,
               CAST(SUM(x) OVER w AS BIGINT) AS sx,
               CAST(SUM(c) OVER w AS BIGINT) AS sy,
               CAST(SUM(x * c) OVER w AS BIGINT) AS sxy,
               CAST(SUM(x * x) OVER w AS BIGINT) AS sxx
        FROM idx
        WINDOW w AS (PARTITION BY event_type ORDER BY x
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, day, n AS n_days,
           CAST(trunc(
               CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE) * 1000000 + 0.5)
               AS BIGINT) / 1000000.0 AS slope_per_day
    FROM framed WHERE n >= 2
    """,
    ref="SURVEY §2 K87 [EXT] (rolling OLS trend: 7-day moving regression "
    "slope of daily counts per event type from exact integer moments in "
    "one window pass — the trend detector between EWMA smoothing (K41) "
    "and CUSUM alarms (K64): slope sign/magnitude is directly "
    "actionable where a smoothed level is not)",
)
def events_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling least-squares slope (events/day per day) of each
    type's daily count series. All window moments (n, Σx, Σy, Σxy, Σx²)
    are exact integers — x is the day's rank, y the count — so the slope
    is one deterministic double division, quantized to 1e-6. Frames with
    a single day are dropped (zero variance denominator).

    Scale shape: the stream collapses to |types| x |days| in one hash
    agg; BOTH window passes (rank, then the 7-row frame) ride a single
    event_type-keyed exchange over that calendar-bounded table. Window
    state is the 7-row frame — constant."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
    ).agg(F.count("*").alias("c"))
    rw = Window.partitionBy("event_type").orderBy("day")
    idx = daily.withColumn("x", F.row_number().over(rw).cast("bigint"))
    fw = (
        Window.partitionBy("event_type")
        .orderBy("x")
        .rowsBetween(-6, Window.currentRow)
    )
    framed = idx.select(
        "event_type",
        "day",
        F.count("*").over(fw).alias("n"),
        F.sum("x").over(fw).alias("sx"),
        F.sum("c").over(fw).alias("sy"),
        F.sum(F.col("x") * F.col("c")).over(fw).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(fw).alias("sxx"),
    )
    slope = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * 1000000
        + 0.5
    ).cast("bigint").cast("double") / 1000000.0
    return framed.where(F.col("n") >= 2).select(
        "event_type",
        "day",
        F.col("n").alias("n_days"),
        slope.alias("slope_per_day"),
    )


@query(
    "events_anomaly_seasonal",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY event_type, date_trunc('day', ts)
    ), base AS (
        SELECT a.event_type, a.day, a.c,
               CAST(COUNT(b.day) AS BIGINT) AS n_baseline,
               CAST(SUM(b.c) AS BIGINT) AS baseline_sum
        FROM daily a
        LEFT JOIN daily b
          ON a.event_type = b.event_type
         AND isodow(a.day) = isodow(b.day)
         AND b.day < a.day
        GROUP BY a.event_type, a.day, a.c
    )
    SELECT event_type, day, c AS n_events, n_baseline,
           CAST(trunc(CAST(c AS DOUBLE)
                      / (CAST(baseline_sum AS DOUBLE) / n_baseline)
                      * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS rate_ratio,
           CAST(c AS DOUBLE)
               > 1.5 * (CAST(baseline_sum AS DOUBLE) / n_baseline)
               AS is_spike
    FROM base WHERE n_baseline >= 2
    """,
    ref="SURVEY §2 K89 [EXT] (seasonal-baseline spike detection: each "
    "day's count vs the mean of PRIOR same-weekday days — the "
    "seasonality-aware anomaly screen that plain z-score (K30) and IQR "
    "(K65) get wrong on weekly-patterned streams (every Monday looks "
    "anomalous against an all-days baseline); requires >= 2 prior "
    "baseline days before judging)",
)
def events_anomaly_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag days running >1.5x their own weekday's historical mean, per
    event type. The baseline is strictly PRIOR same-dow days (no
    lookahead — the streaming-legal formulation) and a day is only judged
    once it has >= 2 baseline observations.

    Scale shape: the stream collapses to |types| x |days| in one agg; the
    baseline self-join is (type, dow)-blocked over that CALENDAR-BOUNDED
    table (per-cell ~|weeks|² pairs — a few thousand rows at any corpus
    size), then one bounded re-agg. At very long horizons the baseline
    join swaps for a running per-(type,dow) mean window — same output,
    O(1) state; spelled here as the join for oracle clarity."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
    ).agg(F.count("*").alias("c"))
    a = daily.select(
        "event_type", F.col("day").alias("d_a"), F.col("c").alias("c_a"),
        (F.weekday("day") + 1).alias("dow"),
    )
    b = daily.select(
        "event_type", F.col("day").alias("d_b"), F.col("c").alias("c_b"),
        (F.weekday("day") + 1).alias("dow"),
    )
    base = (
        a.join(b, ["event_type", "dow"], "left")
        .where(F.col("d_b").isNull() | (F.col("d_b") < F.col("d_a")))
        .groupBy("event_type", "d_a", "c_a")
        .agg(
            F.count("d_b").alias("n_baseline"),
            F.sum(F.when(F.col("d_b") < F.col("d_a"), F.col("c_b"))).alias(
                "baseline_sum"
            ),
        )
    )
    mean_b = F.col("baseline_sum").cast("double") / F.col("n_baseline")
    return base.where(F.col("n_baseline") >= 2).select(
        "event_type",
        F.col("d_a").alias("day"),
        F.col("c_a").alias("n_events"),
        "n_baseline",
        ((F.col("c_a").cast("double") / mean_b * 1000000 + 0.5).cast("bigint")
         .cast("double") / 1000000.0).alias("rate_ratio"),
        (F.col("c_a").cast("double") > 1.5 * mean_b).alias("is_spike"),
    )


@query(
    "events_dau_mau_stickiness",
    oracle="""
    WITH days AS (
        SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
        FROM events
    )
    SELECT day,
           CAST((SELECT COUNT(DISTINCT user_id) FROM events e
                 WHERE CAST(date_trunc('day', e.ts) AS TIMESTAMP)
                       = days.day) AS BIGINT) AS dau,
           CAST((SELECT COUNT(DISTINCT user_id) FROM events e
                 WHERE CAST(date_trunc('day', e.ts) AS TIMESTAMP) <= days.day
                   AND CAST(date_trunc('day', e.ts) AS TIMESTAMP)
                       >= days.day - INTERVAL 27 DAY) AS BIGINT) AS mau,
           CAST(trunc(
               CAST((SELECT COUNT(DISTINCT user_id) FROM events e
                     WHERE CAST(date_trunc('day', e.ts) AS TIMESTAMP)
                           = days.day) AS DOUBLE)
               / (SELECT COUNT(DISTINCT user_id) FROM events e
                  WHERE CAST(date_trunc('day', e.ts) AS TIMESTAMP)
                        <= days.day
                    AND CAST(date_trunc('day', e.ts) AS TIMESTAMP)
                        >= days.day - INTERVAL 27 DAY)
               * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS stickiness
    FROM days
    """,
    ref="SURVEY §2 K94 [EXT] (DAU/MAU stickiness: daily actives over "
    "trailing-28-day actives, exact, per day — the canonical product "
    "engagement ratio; BOTH frames read the same daily-bitmap grid "
    "(I13/I14 machinery), so the day's popcount and the 28-day bit_or "
    "cost one grid pass; cross-method oracle = correlated windowed "
    "COUNT(DISTINCT))",
)
def events_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stickiness per observed day: exact DAU / exact trailing-28-day MAU
    from the shared daily user-bitmap grid — the day's own popcount and a
    ROWS 27 PRECEDING bit_or over the dense calendar spine (zero-event
    days can't stretch the frame, the I14 pin), quantized to 1e-6.

    Scale: the grid is n_days x id_domain/32 words partitioned by
    word_idx (the I13/I14 envelope); both aggregates ride ONE window
    exchange. MAU at 100 TB id domains swaps the bitmap words for HLL
    sketches with the same frame shape — approximate where exact stops
    fitting (documented trade, agg_approx_distinct)."""
    from pyspark.sql import Window

    from ksql_spark.operators.bitmaps import bitmap_words

    ev = load(spark, sf_dir, "events")
    daily = bitmap_words(
        ev.select(F.date_trunc("day", "ts").alias("day"), "user_id"),
        "user_id",
        ["day"],
    )
    bounds = ev.agg(
        F.min(F.date_trunc("day", "ts")).alias("lo"),
        F.max(F.date_trunc("day", "ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    grid = spine.crossJoin(daily.select("word_idx").distinct())
    dense = grid.join(daily, ["day", "word_idx"], "left").select(
        "day", "word_idx", F.coalesce("bits", F.lit(0)).alias("bits")
    )
    w28 = (
        Window.partitionBy("word_idx")
        .orderBy("day")
        .rowsBetween(-27, Window.currentRow)
    )
    per_day = (
        dense.withColumn("m_bits", F.bit_or("bits").over(w28))
        .groupBy("day")
        .agg(
            F.sum(F.bit_count("bits")).cast("bigint").alias("dau"),
            F.sum(F.bit_count("m_bits")).cast("bigint").alias("mau"),
        )
    )
    out = per_day.select(
        "day",
        "dau",
        "mau",
        (
            (F.col("dau").cast("double") / F.col("mau") * 1000000 + 0.5)
            .cast("bigint")
            .cast("double")
            / 1000000.0
        ).alias("stickiness"),
    )
    return out.join(daily.select("day").distinct(), "day", "left_semi")


@query(
    "events_dau_mau_hll",
    oracle=None,  # HLL estimate ≠ exact → rows-only; ±5% law in tests
    ref="SURVEY §2 K94 production sibling [EXT] (DAU/MAU stickiness at "
    "100 TB id domains: the exact entry's daily bitmap grid requires a "
    "dictionary-bounded id space — real user-id domains are not — so "
    "this tier swaps each day's bitmap words for ONE mergeable HLL "
    "sketch per day (Datasketches, the I12/L14 machinery) and the "
    "trailing-28-day bit_or for a day-keyed union merge; laws in "
    "tests/test_wave13.py pin same day set + ±5%% on dau/mau/stickiness "
    "vs events_dau_mau_stickiness, plan-gated: one corpus scan, one "
    "sketch-merge exchange, no per-day rescan)",
    tags=("rows_only_by_design",),
)
def events_dau_mau_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per observed day, estimated sketch-side: one
    corpus pass collapses each day to a single HLL sketch of its active
    users (map-side partial sketch-merge does the heavy lifting); each
    day's sketch is then shipped to the 28 target days whose trailing
    window contains it (a bounded 28× explode of the |days|-row sketch
    table — never of the corpus) and union-merged per target day. DAU =
    the day's own estimate, MAU = the merged estimate, stickiness their
    1e-6-quantized ratio.

    Scale shape — why this is the 100 TB form of K94: the exact bitmap
    grid is O(days × id_domain/32) words and needs ids dense in a known
    dictionary; user-id domains at corpus scale are neither dense nor
    bounded. The sketch form carries a constant ~2-4 KB state per day
    (lgK=12, RSE ~0.8%), its only corpus-sized stage is the first hash
    agg, and the merge exchange moves ≤ 28·|days| sketches. Zero-event
    days contribute nothing and cannot stretch the frame (the I14 pin
    falls out of the contribution construction: target day t unions
    exactly the observed days in [t-27, t])."""
    from ksql_spark.operators.scale import pin

    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .transform(pin, eager=False)
    )
    contrib = daily.select(
        "day", "sk", F.explode(F.sequence(F.lit(0), F.lit(27))).alias("off")
    ).select(
        F.timestamp_add("DAY", F.col("off"), F.col("day")).alias("day"), "sk"
    )
    mau = contrib.groupBy("day").agg(
        F.round(F.hll_sketch_estimate(F.hll_union_agg("sk")))
        .cast("bigint")
        .alias("mau_est")
    )
    dau = daily.select(
        "day",
        F.round(F.hll_sketch_estimate("sk")).cast("bigint").alias("dau_est"),
    )
    # inner join on the observed-day sketch table = the exact entry's
    # left-semi restriction to days that actually occurred
    return dau.join(mau, "day").select(
        "day",
        "dau_est",
        "mau_est",
        (
            (
                F.col("dau_est").cast("double") / F.col("mau_est") * 1000000
                + 0.5
            )
            .cast("bigint")
            .cast("double")
            / 1000000.0
        ).alias("stickiness_est"),
    )


@query(
    "events_power_user_curve",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CAST(COUNT(DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP))
                    AS BIGINT) AS active_days
        FROM events GROUP BY user_id
    )
    SELECT active_days, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM per_user GROUP BY active_days
    """,
    ref="SURVEY §2 K95 [EXT] (power-user curve: the engagement histogram "
    "n_users by distinct-active-days — the distribution BEHIND the K94 "
    "DAU/MAU ratio; a product reads the two together to tell a broad-but-"
    "shallow corpus from a narrow-but-deep one)",
)
def events_power_user_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many users were active exactly k distinct days — the
    power-user curve (Andreessen-Horowitz 'L30' shape). Two hash
    aggregations: (user, day) distinct collapse, then the per-user day
    count, then the bounded histogram (≤ horizon days rows).

    Scale shape: the (user_id, day) distinct and the per-user count ride
    the SAME user_id-keyed exchange (partial aggregation map-side
    combines the duplicate (user, day) pairs before the shuffle); the
    final histogram agg is over |users| rows → ≤ |days| groups. No
    windows, no joins — this survives any corpus size that the user-id
    domain itself fits."""
    ev = load(spark, sf_dir, "events")
    per_user = (
        ev.select("user_id", F.date_trunc("day", "ts").alias("day"))
        .distinct()
        .groupBy("user_id")
        .agg(F.count("*").alias("active_days"))
    )
    return per_user.groupBy("active_days").agg(
        F.count("*").alias("n_users")
    )


@query(
    "events_changepoint_binseg",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY event_type, CAST(date_trunc('day', ts) AS TIMESTAMP)
    ), w AS (
        SELECT event_type, day, x,
               ROW_NUMBER() OVER pw AS k,
               SUM(x) OVER pw AS sx,
               SUM(x * x) OVER pw AS sx2,
               LEAD(day) OVER pw AS next_day,
               COUNT(*) OVER (PARTITION BY event_type) AS n,
               SUM(x) OVER (PARTITION BY event_type) AS s,
               SUM(x * x) OVER (PARTITION BY event_type) AS s2
        FROM daily
        WINDOW pw AS (PARTITION BY event_type ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), costs AS (
        SELECT *,
               CAST(trunc(((sx2 - CAST(sx AS DOUBLE) * sx / k)
                           + ((s2 - sx2)
                              - CAST(s - sx AS DOUBLE) * (s - sx) / (n - k)))
                          * 1000000 + 0.5) AS BIGINT) AS cost_q,
               CAST(trunc((s2 - CAST(s AS DOUBLE) * s / n)
                          * 1000000 + 0.5) AS BIGINT) AS total_q
        FROM w WHERE n >= 4 AND k BETWEEN 2 AND n - 2
    ), best AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY cost_q, day) AS rn
        FROM costs
    )
    SELECT event_type, next_day AS split_day, CAST(n AS BIGINT) AS n_days,
           total_q / 1000000.0 AS sse_total,
           cost_q / 1000000.0 AS sse_split,
           CAST(trunc((1.0 - cost_q / NULLIF(CAST(total_q AS DOUBLE), 0))
                      * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS gain
    FROM best WHERE rn = 1
    """,
    ref="SURVEY §2 K96 [EXT] (single binary-segmentation changepoint per "
    "event-type daily series: argmin over split points of "
    "SSE_left+SSE_right from exact prefix sums of x and x² — the "
    "level-shift LOCATOR complementing K63 CUSUM's drift DETECTOR; "
    "Scott-Knott / binary segmentation, one window pass, no per-split "
    "rescan)",
)
def events_changepoint_binseg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best mean-shift changepoint per event-type daily-count series by
    binary segmentation: for every split k the pooled SSE of the two
    segments comes from running prefix sums (Σx, Σx²) — evaluating ALL
    n-3 candidate splits costs ONE ordered pass, not n rescans. Both
    segments must hold ≥2 points; ties in quantized cost break to the
    earliest day; split_day is the first day of the new regime. gain is
    the SSE fraction explained (NULL for constant series, try_divide).

    Scale shape: the series collapses to |types| × |days| rows at the
    first agg (map-side combined); every window rides ONE event_type
    exchange (per-type partitions are calendar-bounded, never
    corpus-sized). All window inputs are exact bigints, so the double
    cost math is bit-identical cross-engine; comparisons happen on the
    1e-6-quantized integer cost."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").alias("x"))
    po = Window.partitionBy("event_type").orderBy("day")
    pw = po.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy("event_type")
    d = F.col
    w = (
        daily.withColumn("k", F.row_number().over(po))
        .withColumn("sx", F.sum("x").over(pw))
        .withColumn("sx2", F.sum(d("x") * d("x")).over(pw))
        .withColumn("next_day", F.lead("day").over(po))
        .withColumn("n", F.count("*").over(wall))
        .withColumn("s", F.sum("x").over(wall))
        .withColumn("s2", F.sum(d("x") * d("x")).over(wall))
    )
    cost = (
        d("sx2") - d("sx").cast("double") * d("sx") / d("k")
    ) + (
        (d("s2") - d("sx2"))
        - (d("s") - d("sx")).cast("double")
        * (d("s") - d("sx"))
        / (d("n") - d("k"))
    )
    total = d("s2") - d("s").cast("double") * d("s") / d("n")
    costs = w.where(
        (d("n") >= 4) & (d("k") >= 2) & (d("k") <= d("n") - 2)
    ).select(
        "event_type",
        "day",
        "next_day",
        "n",
        (cost * 1000000 + F.lit(0.5)).cast("long").alias("cost_q"),
        (total * 1000000 + F.lit(0.5)).cast("long").alias("total_q"),
    )
    rn = F.row_number().over(
        Window.partitionBy("event_type").orderBy("cost_q", "day")
    )
    best = costs.withColumn("rn", rn).where(d("rn") == 1)
    ratio = F.try_divide(
        d("cost_q").cast("double"),
        F.when(d("total_q") != 0, d("total_q").cast("double")),
    )
    return best.select(
        "event_type",
        d("next_day").alias("split_day"),
        d("n").alias("n_days"),
        (d("total_q").cast("double") / 1000000.0).alias("sse_total"),
        (d("cost_q").cast("double") / 1000000.0).alias("sse_split"),
        (
            ((F.lit(1.0) - ratio) * 1000000 + F.lit(0.5))
            .cast("long")
            .cast("double")
            / 1000000.0
        ).alias("gain"),
    )


@query(
    "events_audience_overlap",
    oracle="""
    WITH u AS (SELECT DISTINCT event_type, user_id FROM events),
    t AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
          FROM u GROUP BY event_type),
    inter AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(COUNT(*) AS BIGINT) AS n_overlap
        FROM u a JOIN u b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type
    )
    SELECT ta.event_type AS type_a, tb.event_type AS type_b,
           ta.n AS n_a, tb.n AS n_b,
           COALESCE(i.n_overlap, 0) AS n_overlap,
           CAST(trunc(CAST(COALESCE(i.n_overlap, 0) AS DOUBLE)
                      / (ta.n + tb.n - COALESCE(i.n_overlap, 0))
                      * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS jaccard
    FROM t ta JOIN t tb ON ta.event_type < tb.event_type
    LEFT JOIN inter i
      ON i.type_a = ta.event_type AND i.type_b = tb.event_type
    """,
    ref="SURVEY §2 K102 [EXT] (audience overlap: exact user-set "
    "intersection size and Jaccard for every event-type pair from "
    "bitmap AND over the I13/I14 per-type user-bitmap grids — the "
    "audience-segmentation question ('do purchasers also view?') that "
    "COUNT(DISTINCT CASE…) re-scans the corpus per pair to answer; "
    "bitmaps answer ALL pairs from one grid build)",
)
def events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every event-type pair with exact audience sizes, intersection
    count, and Jaccard similarity. The corpus collapses ONCE into
    per-type user bitmaps; the pairwise intersection is bit_and over
    words shared by word_idx — |types|²·words bounded work, zero
    additional corpus passes. The type-pair spine comes from the
    bounded per-type totals (broadcast), so zero-overlap pairs emit 0
    rather than vanishing.

    Scale: the grid agg is the one corpus-sized exchange (map-side
    combined on (type, word_idx)); the word join is keyed on word_idx
    over grid-sized inputs; at 100 TB id domains the exact bitmaps swap
    for the D14 HLL registers with the same pair-join shape (union via
    register max, intersection via inclusion-exclusion — documented
    trade, approximate)."""
    from ksql_spark.operators.bitmaps import bitmap_words

    ev = load(spark, sf_dir, "events")
    grid = bitmap_words(
        ev.select("event_type", "user_id"), "user_id", ["event_type"]
    ).localCheckpoint()
    totals = grid.groupBy("event_type").agg(
        F.sum(F.bit_count("bits")).cast("long").alias("n")
    )
    ga = grid.select(
        F.col("event_type").alias("type_a"), "word_idx",
        F.col("bits").alias("bits_a"),
    )
    gb = grid.select(
        F.col("event_type").alias("type_b"), "word_idx",
        F.col("bits").alias("bits_b"),
    )
    inter = (
        ga.join(gb, "word_idx")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.sum(F.bit_count(F.col("bits_a").bitwiseAND(F.col("bits_b"))))
            .cast("long")
            .alias("n_overlap")
        )
    )
    ta = totals.select(
        F.col("event_type").alias("type_a"), F.col("n").alias("n_a")
    )
    tb = totals.select(
        F.col("event_type").alias("type_b"), F.col("n").alias("n_b")
    )
    spine = ta.crossJoin(tb).where(F.col("type_a") < F.col("type_b"))
    out = spine.join(inter, ["type_a", "type_b"], "left").withColumn(
        "n_overlap", F.coalesce("n_overlap", F.lit(0))
    )
    union_n = F.col("n_a") + F.col("n_b") - F.col("n_overlap")
    return out.select(
        "type_a",
        "type_b",
        "n_a",
        "n_b",
        "n_overlap",
        (
            (F.col("n_overlap").cast("double") / union_n * 1000000
             + F.lit(0.5))
            .cast("long")
            .cast("double")
            / 1000000.0
        ).alias("jaccard"),
    )


@query(
    "events_hourly_chisq",
    oracle="""
    WITH obs AS (
        SELECT event_type, CAST(hour(ts) AS BIGINT) AS h,
               CAST(COUNT(*) AS BIGINT) AS o
        FROM events GROUP BY event_type, hour(ts)
    ), t AS (
        SELECT event_type, CAST(SUM(o) AS BIGINT) AS total
        FROM obs GROUP BY event_type
    ), spine AS (
        SELECT t.event_type, t.total, CAST(g.h AS BIGINT) AS h
        FROM t, unnest(range(0, 24)) AS g(h)
    ), filled AS (
        SELECT s.event_type, s.total, s.h, COALESCE(obs.o, 0) AS o
        FROM spine s LEFT JOIN obs
          ON obs.event_type = s.event_type AND obs.h = s.h
    )
    SELECT event_type, CAST(MIN(total) AS BIGINT) AS n_events,
           CAST(SUM(CAST(trunc(
               (o - total / 24.0) * (o - total / 24.0) / (total / 24.0)
               * 1000000 + 0.5) AS BIGINT)) AS BIGINT) / 1000000.0
               AS chi_sq,
           CAST(23 AS BIGINT) AS dof
    FROM filled GROUP BY event_type
    """,
    ref="SURVEY §2 K103 [EXT] (hour-of-day uniformity chi-square per "
    "event type: goodness-of-fit against the uniform 24-bin "
    "expectation, zero-observation hours included via a dense spine — "
    "the bot-traffic screen (organic traffic fails uniformity hard, "
    "scripted traffic doesn't); the TEST companion to K83's descriptive "
    "dow seasonality index)",
)
def events_hourly_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square statistic per event type for 'hourly volume is
    uniform' (E = total/24, 23 dof) — large values on human traffic,
    small on uniformly-scripted load; read against the χ²₂₃ table.
    Hours with zero events enter the sum at full weight (the spine —
    omitting them biases toward uniformity exactly when traffic is most
    concentrated). Per-term 1e-6 quantization BEFORE the sum keeps the
    reduction order-insensitive and cross-engine exact.

    Scale shape: corpus collapses to ≤ |types|·24 rows in one map-side-
    combined agg; the spine is a 24-row per-type expansion of the
    bounded totals table; final agg is |types| rows. Nothing downstream
    of the first agg scales with the corpus."""
    ev = load(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", F.hour("ts").cast("long").alias("h")
    ).agg(F.count("*").alias("o"))
    t = obs.groupBy("event_type").agg(F.sum("o").alias("total"))
    spine = t.select(
        "event_type",
        "total",
        F.explode(F.sequence(F.lit(0), F.lit(23))).alias("h"),
    ).select("event_type", "total", F.col("h").cast("long").alias("h"))
    filled = spine.join(obs, ["event_type", "h"], "left").withColumn(
        "o", F.coalesce("o", F.lit(0))
    )
    e = F.col("total") / 24.0
    term = (
        ((F.col("o") - e) * (F.col("o") - e) / e) * 1000000 + F.lit(0.5)
    ).cast("long")
    return filled.groupBy("event_type").agg(
        F.min("total").cast("long").alias("n_events"),
        (F.sum(term).cast("double") / 1000000.0).alias("chi_sq"),
        F.lit(23).cast("long").alias("dof"),
    )


@query(
    "events_markov_entropy_rate",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ), pairs AS (
        SELECT prev_type, event_type AS next_type,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    ), tot AS (
        SELECT prev_type, CAST(SUM(n) AS BIGINT) AS t
        FROM pairs GROUP BY prev_type
    ), g AS (SELECT CAST(SUM(n) AS BIGINT) AS gt FROM pairs),
    h AS (
        SELECT p.prev_type, MAX(t.t) AS t,
               CAST(SUM(CAST(trunc(
                   -(CAST(n AS DOUBLE) / t.t)
                   * ln(CAST(n AS DOUBLE) / t.t)
                   * 1000000000 + 0.5) AS BIGINT)) AS DOUBLE)
                   / 1000000000.0 AS h_nats
        FROM pairs p JOIN tot t USING (prev_type)
        GROUP BY p.prev_type
    )
    SELECT prev_type, t AS n_transitions,
           CAST(trunc(h_nats * 1000000 + 0.5) AS BIGINT) / 1000000.0
               AS branch_entropy_nats,
           CAST(trunc(CAST(t AS DOUBLE) / g.gt * 1000000 + 0.5) AS BIGINT)
               / 1000000.0 AS weight,
           CAST(trunc(CAST(t AS DOUBLE) / g.gt * h_nats * 1000000 + 0.5)
                AS BIGINT) / 1000000.0 AS rate_contribution
    FROM h, g
    """,
    ref="SURVEY §2 K104 [EXT] (Markov entropy rate: per-state branch "
    "entropy H(next|prev) and its stationary-weighted contribution to "
    "the chain's entropy rate Σ p(s)·H(·|s) — the predictability "
    "number over K59's transition matrix: near 0 = scripted journeys, "
    "near ln(|types|) = aimless; summing rate_contribution gives the "
    "corpus-level rate)",
)
def events_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How predictable is the next event given the current one: per
    source state, the Shannon entropy (nats) of its outgoing transition
    distribution, the state's empirical weight, and weight × entropy —
    the state's contribution to the chain entropy rate. Per-transition
    terms -p·ln(p) quantize at 1e-9 and sum exactly (the K85 idiom), so
    the |types|-bounded reduction is order-insensitive.

    Scale shape: one user_id shuffle for the lag window (the K59
    machinery), then everything is |types|²-bounded: pair agg
    (map-side combined), per-state totals broadcast back, a 1-row
    grand-total broadcast. Nothing after the lag pass scales with the
    corpus."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).where(F.col("prev_type").isNotNull())
    pairs = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count("*").alias("n"))
    tot = pairs.groupBy("prev_type").agg(F.sum("n").alias("t"))
    p = F.col("n").cast("double") / F.col("t")
    term = (-p * F.log(p) * 1000000000 + F.lit(0.5)).cast("long")
    h = (
        pairs.join(F.broadcast(tot), "prev_type")
        .groupBy("prev_type")
        .agg(
            F.max("t").alias("t"),
            (F.sum(term).cast("double") / 1000000000.0).alias("h_nats"),
        )
    )
    g = pairs.agg(F.sum("n").alias("gt"))
    q6 = lambda c: (c * 1000000 + F.lit(0.5)).cast("long").cast(
        "double"
    ) / 1000000.0
    return h.crossJoin(F.broadcast(g)).select(
        "prev_type",
        F.col("t").alias("n_transitions"),
        q6(F.col("h_nats")).alias("branch_entropy_nats"),
        q6(F.col("t").cast("double") / F.col("gt")).alias("weight"),
        q6(
            F.col("t").cast("double") / F.col("gt") * F.col("h_nats")
        ).alias("rate_contribution"),
    )


@query(
    "events_interarrival_dist",
    oracle="""
    WITH gaps AS (
        SELECT event_type,
               (epoch_us(ts) - epoch_us(LAG(ts) OVER (
                   PARTITION BY user_id, event_type ORDER BY ts, event_id
               ))) AS gap_us
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(trunc(quantile_cont(gap_us, 0.50) / 1000000.0 * 1000000 + 0.5)
                AS BIGINT) / 1000000.0 AS p50_s,
           CAST(trunc(quantile_cont(gap_us, 0.90) / 1000000.0 * 1000000 + 0.5)
                AS BIGINT) / 1000000.0 AS p90_s,
           CAST(trunc(quantile_cont(gap_us, 0.99) / 1000000.0 * 1000000 + 0.5)
                AS BIGINT) / 1000000.0 AS p99_s,
           CAST(trunc(AVG(gap_us) / 1000000.0 * 1000000 + 0.5)
                AS BIGINT) / 1000000.0 AS mean_s
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY event_type
    """,
    ref="SURVEY §2 D31 [EXT] (inter-arrival time distribution: per-user "
    "same-type event gaps -> exact p50/p90/p99 per type — the cadence "
    "profile behind rate-limit/alerting thresholds and the Poisson-ness "
    "screen for K41/K64 parameter choices; percentile interpolation "
    "bit-identical cross-engine per the agg_quantiles proof)",
)
def events_interarrival_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How often does a user repeat each action: per (user, event_type)
    consecutive-event gaps, summarized per type as exact interpolated
    p50/p90/p99 and mean, in seconds. Gaps are exact integer microsecond
    differences (unix_micros, the win_sessionize_gaps idiom); percentile
    interpolation over exact-integer inputs is the same IEEE expression in
    both engines (agg_quantiles proof), and mean_us is an exact integer
    mean quantized once at the end — no order-sensitive double sums.

    Scale shape: ONE window pass partitioned by (user_id, event_type) —
    finer-grained than any per-user window, millions of independent
    partitions at 100 TB — then a |types|-group hash agg with map-side
    partial aggregation. Exact percentiles over a |types|-bounded group
    count; at petabyte row counts per type the same plan takes
    percentile_approx with identical shape."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = ev.select(
        "event_type", (us - F.lag(us).over(w)).alias("gap_us")
    ).where(F.col("gap_us").isNotNull())
    q6s = lambda c: (c / 1000000.0 * 1000000 + F.lit(0.5)).cast("long").cast(
        "double"
    ) / 1000000.0
    return gaps.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_gaps"),
        q6s(F.expr("percentile(gap_us, 0.50)")).alias("p50_s"),
        q6s(F.expr("percentile(gap_us, 0.90)")).alias("p90_s"),
        q6s(F.expr("percentile(gap_us, 0.99)")).alias("p99_s"),
        q6s(F.sum("gap_us").cast("double") / F.count("*")).alias("mean_s"),
    )


@query(
    "events_entry_exit_matrix",
    oracle="""
    WITH gapped AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                    OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), labeled AS (
        SELECT user_id, event_type, ts, event_id,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM gapped
    ), sessions AS (
        SELECT user_id, session_id,
               first_value(event_type) OVER ws AS entry_type,
               last_value(event_type) OVER ws AS exit_type,
               COUNT(*) OVER ws AS n_events,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, session_id ORDER BY ts, event_id
               ) AS rn
        FROM labeled
        WINDOW ws AS (
            PARTITION BY user_id, session_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        )
    )
    SELECT entry_type, exit_type,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(trunc(CAST(SUM(n_events) AS DOUBLE) / COUNT(*)
                * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS avg_session_len
    FROM sessions WHERE rn = 1
    GROUP BY entry_type, exit_type
    """,
    ref="SURVEY §2 D32 [EXT] (session entry->exit matrix: gap-sessionize "
    "(E2/E3 rule), reduce each session to its first and last action, "
    "count the |types|x|types| landing matrix — the bounce/handoff "
    "analysis on top of the win_sessionize_gaps machinery)",
)
def events_entry_exit_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Where do sessions start and end: 30-minute-gap sessionization (the
    exact win_sessionize_gaps rule), then each session reduced to
    (entry_type, exit_type, n_events) and aggregated into the
    |types|x|types| matrix with session counts and mean session length.

    Scale shape: two window passes both partitioned by user_id (ONE
    shuffle — the session window is a subpartition of the user window so
    Spark reuses the exchange), then the session reduction rides the same
    partitioning and the final matrix agg is |types|²-bounded with
    map-side combine. No collect, no global window anywhere."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap_flag = (
        F.when(us - F.lag(us).over(w) > 1800 * 1_000_000, 1)
        .when(F.lag("ts").over(w).isNull(), 1)
        .otherwise(0)
    )
    labeled = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.sum(gap_flag)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_id"),
    )
    ws = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    wfull = ws.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    sessions = labeled.select(
        F.first("event_type").over(wfull).alias("entry_type"),
        F.last("event_type").over(wfull).alias("exit_type"),
        F.count("*").over(wfull).alias("n_events"),
        F.row_number().over(ws).alias("rn"),
    ).where(F.col("rn") == 1)
    return sessions.groupBy("entry_type", "exit_type").agg(
        F.count("*").cast("bigint").alias("n_sessions"),
        F.sum("n_events").cast("bigint").alias("n_events"),
        (
            (
                F.sum("n_events").cast("double") / F.count("*") * 1000000
                + F.lit(0.5)
            )
            .cast("long")
            .cast("double")
            / 1000000.0
        ).alias("avg_session_len"),
    )


@query(
    "events_props_value_bands",
    oracle=f"""
    WITH px AS (
        SELECT event_type,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
               value
        FROM events
    )
    SELECT event_type,
           CAST(k // 10 AS INT) AS k_band,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MIN(k) AS INT) AS min_k,
           CAST(MAX(k) AS INT) AS max_k,
           {sql_davg('value')} AS avg_value
    FROM px WHERE k IS NOT NULL
    GROUP BY event_type, CAST(k // 10 AS INT)
    """,
    ref="SURVEY §2 D33 [EXT] (semi-structured payload analytics: extract "
    "a numeric field from the JSON props column INSIDE the aggregation "
    "pipeline — get_json_object stays JVM-side/codegen'd, no UDF — and "
    "band it into deciles per event type; the everyday 'group by a "
    "field buried in the payload' query every event pipeline runs)",
)
def events_props_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric field extracted from the JSON payload (props->'$.k'),
    banded by tens, aggregated per (event_type, band): count, k range,
    exact-quantized mean value. Extraction uses get_json_object — a
    JVM expression inside whole-stage codegen, not a Python UDF — and
    malformed/missing payloads drop via the NULL filter (try-cast
    semantics on the extracted string).

    Scale shape: one narrow scan (props + two columns read), extraction
    fused into the scan stage, then a |types|x10-bounded hash agg with
    map-side combine. At 100 TB the JSON parse is the scan cost itself;
    a hot deployment would materialize k as a typed column at ingest —
    same query, zero parse."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    px = ev.select(
        "event_type", k.alias("k"), F.col("value")
    ).where(F.col("k").isNotNull())
    return px.groupBy(
        "event_type", F.expr("CAST(k div 10 AS INT)").alias("k_band")
    ).agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.min("k").cast("int").alias("min_k"),
        F.max("k").cast("int").alias("max_k"),
        davg("value").alias("avg_value"),
    )


@query(
    "events_stl_daily_decompose",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ), tr AS (
        SELECT event_type, day, c,
               CASE WHEN COUNT(*) OVER w7 = 7 THEN
                   CAST(trunc(CAST(SUM(c) OVER w7 AS DOUBLE) / 7.0
                        * 1000000 + 0.5) AS BIGINT)
               END AS t_int
        FROM daily
        WINDOW w7 AS (PARTITION BY event_type ORDER BY day
                      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ), det AS (
        SELECT event_type, day, c,
               CAST(t_int AS DOUBLE) / 1000000.0 AS trend,
               dayofweek(day) + 1 AS dow,
               c * 1000000 - t_int AS dq
        FROM tr
    ), seas AS (
        SELECT event_type, dow,
               CAST(trunc(CAST(SUM(dq) AS DOUBLE) / COUNT(dq) + 0.5)
                    AS BIGINT) AS s_int
        FROM det WHERE dq IS NOT NULL GROUP BY event_type, dow
    )
    SELECT d.event_type, d.day, d.c, d.trend,
           CAST(s.s_int AS DOUBLE) / 1000000.0 AS seasonal,
           CASE WHEN d.trend IS NOT NULL THEN
               CAST(d.dq - s.s_int AS DOUBLE) / 1000000.0
           END AS resid
    FROM det d LEFT JOIN seas s
      ON d.event_type = s.event_type AND d.dow = s.dow
    """,
    ref="SURVEY §2 D35 [EXT] (additive STL-lite decomposition of the "
    "daily count series per event type: trend = centered 7-day moving "
    "average (NULL at edges), seasonal = day-of-week mean of the "
    "detrended series, residual = the anomaly channel K66's seasonal "
    "spike detector thresholds — the decomposition VIEW of what K83 "
    "(seasonality index) and K82 (Holt-Winters) consume)",
)
def events_stl_daily_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition per event type over the daily
    grid: observed = trend + seasonal + residual. Trend is the exact
    7-day centered mean (integer window sum / 7, quantized once; NULL
    where the frame is incomplete); the detrended values are EXACT
    1e-6-scaled integers (c*1e6 - trend*1e6 in doubles is exact below
    2^53), so the day-of-week seasonal means accumulate in integers and
    every output is one identically-spelled double chain.

    Scale shape: one (type, day) agg over events (the only corpus-sized
    pass, map-side combined), then all windows/joins run on the
    calendar-bounded daily table: a per-type 7-row window, a |types|x7
    seasonal agg joined back by broadcast. The dual consumers of the
    daily table sit under one checkpoint."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type", F.date_trunc("day", "ts").alias("day")
        )
        .agg(F.count("*").cast("bigint").alias("c"))
        .localCheckpoint()
    )
    w7 = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    q6 = lambda c: (c * 1000000 + F.lit(0.5)).cast("long").cast(
        "double"
    ) / 1000000.0
    # trend carried as its 1e-6-scaled INTEGER so the detrended values
    # (and later the residuals) are pure bigint arithmetic — recombining
    # q6 doubles puts the rounding on exact .5 boundaries where one ulp
    # of float error flips the trunc differently per engine
    tr = daily.select(
        "event_type",
        "day",
        "c",
        F.when(
            F.count("*").over(w7) == 7,
            (F.sum("c").over(w7).cast("double") / 7.0 * 1000000 + F.lit(0.5))
            .cast("long"),
        ).alias("t_int"),
    )
    det = tr.select(
        "event_type",
        "day",
        "c",
        (F.col("t_int").cast("double") / 1000000.0).alias("trend"),
        F.dayofweek("day").alias("dow"),
        (F.col("c") * 1000000 - F.col("t_int")).alias("dq"),
    ).localCheckpoint()
    # seasonal mean kept as its 1e-6-scaled INTEGER so the residual
    # recombination c - trend - seasonal stays in the integer domain —
    # recombining the three q6 doubles directly lands the *1e6 + 0.5
    # rounding on an exact .5 boundary that float error flips per engine
    seas = (
        det.where(F.col("dq").isNotNull())
        .groupBy("event_type", "dow")
        .agg(
            (F.sum("dq").cast("double") / F.count("dq") + F.lit(0.5))
            .cast("long")
            .alias("s_int")
        )
    )
    return (
        det.join(F.broadcast(seas), ["event_type", "dow"], "left")
        .select(
            "event_type",
            "day",
            "c",
            "trend",
            (F.col("s_int").cast("double") / 1000000.0).alias("seasonal"),
            F.when(
                F.col("trend").isNotNull(),
                (F.col("dq") - F.col("s_int")).cast("double") / 1000000.0,
            ).alias("resid"),
        )
    )


_DYN_GAP_SQL = """CASE event_type WHEN 'click' THEN INTERVAL 10 MINUTE
               WHEN 'view' THEN INTERVAL 20 MINUTE
               ELSE INTERVAL 30 MINUTE END"""


@query(
    "stream_session_dynamic_gap",
    oracle=f"""
    WITH ext AS (
        SELECT user_id, ts, event_id,
               ts + {_DYN_GAP_SQL} AS ev_end
        FROM events
    ), marked AS (
        SELECT user_id, ts, event_id, ev_end,
               CASE WHEN MAX(ev_end) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ) IS NULL
                    OR ts >= MAX(ev_end) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS new_session
        FROM ext
    ), numbered AS (
        SELECT user_id, ts, ev_end,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ev_end) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM numbered GROUP BY user_id, sid
    """,
    ref="SURVEY §2 I15 [EXT] (dynamic-gap session window: per-event gap "
    "from the event's own type — clicks cool off in 10 min, views 20, "
    "the rest 30 — Spark 3.2 session_window(ts, gapExpr); sessions are "
    "the UNION of [ts, ts+gap) intervals, so the oracle is the "
    "running-max-end gaps-and-islands form, not the lag-gap one)",
)
def stream_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows whose idle gap depends on each event's type —
    the engagement-aware sessionization Spark exposes as
    session_window(ts, <expr>): an event extends its session to
    ts + gap(type), and the session closes when the next event starts
    at-or-after the maximum extended end so far (interval union, pinned
    by the running-max oracle — a plain lag-gap oracle is WRONG here
    because a short-gap event can sit inside a longer event's tail).

    Scale shape: identical to the static session window — one user_id
    shuffle, per-user sequential merge, parallel across users; the
    same expression runs under readStream with a watermark (the I4
    machinery), which is the point of using session_window instead of
    the window-function formulation."""
    ev = load(spark, sf_dir, "events")
    gap = F.expr(
        """CASE event_type WHEN 'click' THEN '10 minutes'
           WHEN 'view' THEN '20 minutes' ELSE '30 minutes' END"""
    )
    return (
        ev.groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(F.count("*").cast("bigint").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "events_daily_max_gap",
    oracle="""
    WITH gaps AS (
        SELECT event_type, ts,
               epoch_us(ts) - epoch_us(LAG(ts) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id
               )) AS gap_us
        FROM events
    )
    SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
           CAST(CASE WHEN MAX(gap_us) > 3600000000
                THEN 1 ELSE 0 END AS INT) AS outage_flag
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY event_type, CAST(date_trunc('day', ts) AS TIMESTAMP)
    """,
    ref="SURVEY §2 D37 [EXT] (ingest-outage screen: per (type, day) the "
    "maximum inter-event silence across the WHOLE type stream — a "
    "pipeline stall shows up as one giant gap even while per-user "
    "cadence (D31) looks normal; gap > 1 h flags the day, attributed "
    "to the day the stream RESUMED)",
)
def events_daily_max_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational freshness monitor: the longest silence within each
    event type per day (gap attributed to the day of the resuming
    event), with a 1-hour outage flag. Gaps are exact integer
    microseconds — no float anywhere.

    Scale shape: one window pass partitioned by event_type (the
    type-level stream IS the unit of monitoring; a 100 TB deployment
    monitors per topic-partition, same plan keyed finer), then a
    (type × day)-bounded hash agg with map-side combine."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = ev.select(
        "event_type",
        "ts",
        (us - F.lag(us).over(w)).alias("gap_us"),
    ).where(F.col("gap_us").isNotNull())
    return gaps.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.max("gap_us").cast("bigint").alias("max_gap_us"),
        F.when(F.max("gap_us") > 3600 * 1_000_000, 1)
        .otherwise(0)
        .cast("int")
        .alias("outage_flag"),
    )


@query(
    "events_ab_test_report",
    oracle="""
    WITH assign AS (
        SELECT user_id,
               CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
               CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS INT) AS converted
        FROM events GROUP BY user_id
    ), arms AS (
        SELECT CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
               CAST(SUM(CASE WHEN arm = 'A' THEN converted ELSE 0 END)
                    AS BIGINT) AS conv_a,
               CAST(SUM(CASE WHEN arm = 'B' THEN converted ELSE 0 END)
                    AS BIGINT) AS conv_b
        FROM assign
    )
    SELECT n_a, n_b, conv_a, conv_b,
           CAST(trunc(CAST(conv_a AS DOUBLE) / n_a * 1000000 + 0.5)
                AS BIGINT) / 1000000.0 AS rate_a,
           CAST(trunc(CAST(conv_b AS DOUBLE) / n_b * 1000000 + 0.5)
                AS BIGINT) / 1000000.0 AS rate_b,
           CAST(trunc((CAST(conv_b AS DOUBLE) / n_b
                       - CAST(conv_a AS DOUBLE) / n_a)
                * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS lift_abs,
           CAST(trunc(
               (CAST(conv_b AS DOUBLE) / n_b - CAST(conv_a AS DOUBLE) / n_a)
               / NULLIF(sqrt(
                   (CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                   * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                   * (1.0 / n_a + 1.0 / n_b)), 0)
               * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS z_score,
           CAST(trunc(
               ((CAST(n_a AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2)
                * (CAST(n_a AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2)
                + (CAST(n_b AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2)
                  * (CAST(n_b AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2))
               / (CAST(n_a + n_b AS DOUBLE) / 2)
               * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS srm_chisq
    FROM arms
    """,
    ref="SURVEY §2 D38 [EXT] (A/B experiment readout: deterministic "
    "user-parity assignment, user-level conversion (>=1 purchase), "
    "two-proportion pooled z-test for the lift AND the sample-ratio-"
    "mismatch chi-square guardrail (an SRM above ~3.84 means the "
    "assignment itself is broken and the z-score is meaningless — the "
    "first thing a real experimentation platform checks))",
)
def events_ab_test_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row experiment report: users split A/B by id parity, converted
    = had any purchase event; per-arm counts, rates, absolute lift, the
    pooled two-proportion z statistic, and the 50/50 sample-ratio-
    mismatch chi-square. Every statistic derives from four exact integer
    counts through identically-spelled double chains — the whole report
    is one |users|-group pass plus a 1-row reduction.

    Scale shape: user-level conversion is a map-side-combined user_id
    agg (the corpus-sized pass); the arm rollup is 2 rows. At 100 TB the
    same two aggs serve thousands of concurrent experiments by adding
    experiment_id to both keys."""
    ev = load(spark, sf_dir, "events")
    assign = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    ).select(
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("arm"),
        "converted",
    )
    arms = assign.agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.sum(F.when(F.col("arm") == "A", F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("conv_a"),
        F.sum(F.when(F.col("arm") == "B", F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("conv_b"),
    )
    q6 = lambda c: (c * 1000000 + F.lit(0.5)).cast("long").cast(
        "double"
    ) / 1000000.0
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ca, cb = F.col("conv_a").cast("double"), F.col("conv_b").cast("double")
    pa, pb = ca / F.col("n_a"), cb / F.col("n_b")
    pp = (ca + cb) / (F.col("n_a") + F.col("n_b"))
    se = F.sqrt(pp * (1.0 - pp) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b")))
    half = (na + nb) / 2
    chisq = ((na - half) * (na - half) + (nb - half) * (nb - half)) / half
    return arms.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        q6(pa).alias("rate_a"),
        q6(pb).alias("rate_b"),
        q6(pb - pa).alias("lift_abs"),
        q6((pb - pa) / F.nullif(se, F.lit(0.0))).alias("z_score"),
        q6(chisq).alias("srm_chisq"),
    )


def _benford_digit(dialect: str) -> str:
    """First-significant-digit CASE ladder. Truncation toward zero is
    spelled per engine: Spark CAST(double AS INT) truncates, DuckDB's
    CAST rounds so it needs an explicit trunc()."""
    t = (lambda e: f"CAST({e} AS INT)") if dialect == "spark" else (
        lambda e: f"CAST(trunc({e}) AS INT)")
    return f"""CASE
    WHEN value >= 100 THEN {t('value / 100')}
    WHEN value >= 10 THEN {t('value / 10')}
    WHEN value >= 1 THEN {t('value')}
    WHEN value >= 0.1 THEN {t('value * 10')}
    WHEN value >= 0.01 THEN {t('value * 100')}
    END"""


@query(
    "events_benford_digit_check",
    oracle=f"""
    WITH d AS (
        SELECT {_benford_digit("duck")} AS digit FROM events WHERE value > 0
    ), c AS (
        SELECT digit, CAST(COUNT(*) AS BIGINT) AS n
        FROM d WHERE digit IS NOT NULL GROUP BY digit
    ), t AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM c)
    SELECT digit, n,
           CAST(trunc(CAST(n AS DOUBLE) / nt * 1000000 + 0.5) AS BIGINT)
               / 1000000.0 AS observed_p,
           CAST(trunc(ln(1.0 + 1.0 / digit) / ln(10.0) * 1000000 + 0.5)
                AS BIGINT) / 1000000.0 AS benford_p,
           CAST(trunc(
               (CAST(n AS DOUBLE) - nt * (ln(1.0 + 1.0 / digit) / ln(10.0)))
               * (CAST(n AS DOUBLE) - nt * (ln(1.0 + 1.0 / digit) / ln(10.0)))
               / (nt * (ln(1.0 + 1.0 / digit) / ln(10.0)))
               * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS chisq_term
    FROM c, t
    """,
    ref="SURVEY §2 D42 [EXT] (Benford's-law first-digit audit: observed "
    "leading-digit shares of the value column vs log10(1+1/d), with "
    "per-digit chi-square terms (sum them against chi2_8 ~ 15.5) — the "
    "classic fabricated-data / instrumentation-bug screen; the digit "
    "extractor is a pure-arithmetic CASE ladder, no log/pow on data, "
    "so both engines compute it bit-identically)",
)
def events_benford_digit_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of event values against the
    Benford expectation. The digit comes from a magnitude CASE ladder
    (divide/multiply by powers of ten, then trunc) — deliberately NOT
    floor(v/10^floor(log10 v)), whose data-dependent transcendental is
    the kind of cross-engine ulp hazard the K116 trunc-pin documented.
    Expected shares use ln on CONSTANTS only; each output is one
    identically-spelled double chain quantized once.

    Scale shape: narrow scan -> 9-group hash agg (map-side combined)
    -> 1-row total broadcast back. Nothing after the scan exceeds 9
    rows."""
    ev = load(spark, sf_dir, "events")
    d = ev.where(F.col("value") > 0).select(
        F.expr(_benford_digit("spark")).alias("digit")
    )
    c = d.where(F.col("digit").isNotNull()).groupBy("digit").agg(
        F.count("*").cast("bigint").alias("n")
    )
    t = c.agg(F.sum("n").cast("bigint").alias("nt"))
    q6 = lambda cc: (cc * 1000000 + F.lit(0.5)).cast("long").cast(
        "double"
    ) / 1000000.0
    bp = F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0))
    nd = F.col("n").cast("double")
    e = F.col("nt") * bp
    return c.crossJoin(F.broadcast(t)).select(
        "digit",
        "n",
        q6(nd / F.col("nt")).alias("observed_p"),
        q6(bp).alias("benford_p"),
        q6((nd - e) * (nd - e) / e).alias("chisq_term"),
    )


@query(
    "events_growth_accounting",
    oracle="""
    WITH uw AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
        FROM events
    ), seq AS (
        SELECT user_id, week,
               LAG(week) OVER (PARTITION BY user_id ORDER BY week) AS prev_w,
               LEAD(week) OVER (PARTITION BY user_id ORDER BY week) AS next_w,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY week) AS rn
        FROM uw
    ), mx AS (SELECT MAX(week) AS max_w FROM uw),
    statuses AS (
        SELECT week,
               CASE WHEN rn = 1 THEN 'new'
                    WHEN prev_w = week - INTERVAL 7 DAY THEN 'retained'
                    ELSE 'resurrected' END AS status
        FROM seq
        UNION ALL
        SELECT week + INTERVAL 7 DAY AS week, 'churned' AS status
        FROM seq, mx
        WHERE (next_w IS NULL OR next_w > week + INTERVAL 7 DAY)
          AND week + INTERVAL 7 DAY <= mx.max_w
    )
    SELECT week,
           CAST(SUM(CASE WHEN status = 'new' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new,
           CAST(SUM(CASE WHEN status = 'retained' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_retained,
           CAST(SUM(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_resurrected,
           CAST(SUM(CASE WHEN status = 'churned' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_churned
    FROM statuses GROUP BY week
    """,
    ref="SURVEY §2 D47 [EXT] (weekly growth accounting: every active "
    "user classified new / retained / resurrected, plus churn events "
    "attributed to the first inactive week — the lifecycle "
    "decomposition (Social-Capital style) whose identity "
    "active_w = new + retained + resurrected and churn ledger feed "
    "every growth dashboard; D19's stickiness and K35's cohort "
    "retention are marginal views of this table)",
)
def events_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per calendar week: how many active users are brand new, retained
    from last week, or resurrected after a gap — and how many of last
    week's actives churned (counted in their first silent week, only
    within the observed range). Built from the distinct (user, week)
    activity grid with one per-user window pass; every status is exact
    calendar arithmetic, no floats anywhere.

    Scale shape: corpus pass -> distinct (user, week) (map-side
    combined, activity-grid-sized); one user-partitioned window for
    lag/lead/rank; the churn branch reuses the same pass's output with
    a 1-row max-week broadcast; final agg is weeks-bounded."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    uw = (
        ev.select(
            "user_id", F.date_trunc("week", "ts").alias("week")
        )
        .distinct()
        .localCheckpoint()
    )
    w = Window.partitionBy("user_id").orderBy("week")
    seq = uw.select(
        "user_id",
        "week",
        F.lag("week").over(w).alias("prev_w"),
        F.lead("week").over(w).alias("next_w"),
        F.row_number().over(w).alias("rn"),
    )
    mx = uw.agg(F.max("week").alias("max_w"))
    week7 = F.expr("week + INTERVAL 7 DAY")
    active = seq.select(
        "week",
        F.when(F.col("rn") == 1, "new")
        .when(F.col("prev_w") == F.expr("week - INTERVAL 7 DAY"), "retained")
        .otherwise("resurrected")
        .alias("status"),
    )
    churn = (
        seq.crossJoin(F.broadcast(mx))
        .where(
            (F.col("next_w").isNull() | (F.col("next_w") > week7))
            & (week7 <= F.col("max_w"))
        )
        .select(week7.alias("week"), F.lit("churned").alias("status"))
    )
    statuses = active.unionByName(churn)
    cnt = lambda st: F.sum(
        F.when(F.col("status") == st, 1).otherwise(0)
    ).cast("bigint")
    return statuses.groupBy("week").agg(
        cnt("new").alias("n_new"),
        cnt("retained").alias("n_retained"),
        cnt("resurrected").alias("n_resurrected"),
        cnt("churned").alias("n_churned"),
    )


@query(
    "events_slo_burn_rate",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_err
        FROM events GROUP BY 1
    )
    SELECT day, n_total, n_err,
           CAST(trunc(CAST(n_err AS DOUBLE) / n_total * 1000000 + 0.5)
                AS BIGINT) / 1000000.0 AS err_rate,
           CAST(trunc(CAST(SUM(n_err) OVER w AS DOUBLE)
                / SUM(n_total) OVER w / 0.01
                * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS burn_7d,
           CAST(CASE WHEN CAST(SUM(n_err) OVER w AS DOUBLE)
                          / SUM(n_total) OVER w > 0.01 * 2
                THEN 1 ELSE 0 END AS INT) AS page_flag
    FROM daily
    WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
    ref="SURVEY §2 D51 [EXT] (SLO error-budget burn rate: daily error "
    "share and the trailing-7-day burn multiple against a 1% SLO, "
    "with the 2x-burn page flag — the SRE multiwindow-alert pattern "
    "(Google SRE workbook); integer counts throughout, the rolling "
    "window runs on the calendar-bounded daily table)",
)
def events_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-budget accounting: per day, error share of all events and
    the trailing-7-day burn multiple (rolling error rate / 1% SLO);
    burn > 2 raises the page flag, computed from the same windowed
    sums so flag and number cannot diverge. All counts exact integers;
    two quantized chains.

    Scale shape: one corpus pass -> daily agg (map-side combined);
    the 7-row rolling window runs over the ~days-sized table (the D35
    posture — a bounded global window, not a data-sized one)."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.count("*").cast("bigint").alias("n_total"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("bigint")
        .alias("n_err"),
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    roll_rate = F.sum("n_err").over(w).cast("double") / F.sum(
        "n_total"
    ).over(w)
    q6 = lambda c: (c * 1000000 + F.lit(0.5)).cast("long").cast(
        "double"
    ) / 1000000.0
    return daily.select(
        "day",
        "n_total",
        "n_err",
        q6(F.col("n_err").cast("double") / F.col("n_total")).alias(
            "err_rate"
        ),
        q6(roll_rate / 0.01).alias("burn_7d"),
        F.when(roll_rate > 0.01 * 2, 1).otherwise(0).cast("int").alias(
            "page_flag"
        ),
    )


@query(
    "events_bot_score",
    oracle="""
    WITH gaps AS (
        SELECT user_id, event_type, ts,
               epoch_us(ts) - epoch_us(LAG(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
        FROM events
    ), per AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN date_part('hour', ts) < 6
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_night,
               CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
               CAST(SUM(gap_us) AS BIGINT) AS s1,
               CAST(SUM(CAST(trunc(gap_us / 1000.0) AS BIGINT)
                        * CAST(trunc(gap_us / 1000.0) AS BIGINT))
                    AS BIGINT) AS s2m
        FROM gaps GROUP BY user_id
    ), ent AS (
        SELECT user_id,
               CAST(SUM(CAST(trunc(-(CAST(c AS DOUBLE) / t)
                        * ln(CAST(c AS DOUBLE) / t)
                        * 1000000000 + 0.5) AS BIGINT)) AS BIGINT) AS hq
        FROM (
            SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c,
                   CAST(SUM(COUNT(*)) OVER (PARTITION BY user_id)
                        AS BIGINT) AS t
            FROM events GROUP BY user_id, event_type
        ) GROUP BY user_id
    )
    SELECT p.user_id, p.n,
           CAST(trunc(CAST(p.n_night AS DOUBLE) / p.n * 1000000 + 0.5)
                AS BIGINT) / 1000000.0 AS night_frac,
           CAST(trunc(
               sqrt(greatest(CAST(p.s2m AS DOUBLE) * 1000000.0 / p.n_gaps
                    - (CAST(p.s1 AS DOUBLE) / p.n_gaps)
                      * (CAST(p.s1 AS DOUBLE) / p.n_gaps), 0))
               / NULLIF(CAST(p.s1 AS DOUBLE) / p.n_gaps, 0)
               * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS gap_cv,
           CAST(trunc(CAST(e.hq AS DOUBLE) / 1000000000.0 * 1000000 + 0.5)
                AS BIGINT) / 1000000.0 AS type_entropy,
           CAST(CASE WHEN CAST(p.n_night AS DOUBLE) / p.n > 0.5
                       OR (p.n_gaps >= 10 AND
                           sqrt(greatest(CAST(p.s2m AS DOUBLE) * 1000000.0
                                / p.n_gaps
                                - (CAST(p.s1 AS DOUBLE) / p.n_gaps)
                                  * (CAST(p.s1 AS DOUBLE) / p.n_gaps), 0))
                           / NULLIF(CAST(p.s1 AS DOUBLE) / p.n_gaps, 0)
                           < 0.3)
                THEN 1 ELSE 0 END AS INT) AS bot_flag
    FROM per p JOIN ent e ON p.user_id = e.user_id
    """,
    ref="SURVEY §2 D52 [EXT] (behavioral bot scoring: night-hour share, "
    "inter-arrival coefficient of variation (metronome-regular gaps = "
    "automation) and action-type entropy per user, with a composite "
    "flag — the signals-fusion screen combining D31's cadence, K103's "
    "uniformity and K104's predictability lenses at USER granularity; "
    "gap moments accumulate at millisecond scale to stay in-range)",
)
def events_bot_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user automation signals: fraction of events in the 00-06h
    window, the CV of inter-event gaps (std/mean — near 0 means
    scripted timing; guarded to users with >= 10 gaps), Shannon entropy
    of the action mix, and a composite bot flag. Gap sums are exact
    integer microseconds; squared sums accumulate at millisecond scale
    (µs² overflows bigint over long histories) and the variance is
    clamped at 0 before the sqrt; entropy terms use the 1e-9 trunc
    discipline.

    Scale shape: one user-partitioned window pass for gaps, two
    user-keyed aggs (map-side combined) joined on user_id — all
    exchanges user-keyed, output |users|-sized."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = ev.select(
        "user_id",
        "ts",
        (us - F.lag(us).over(w)).alias("gap_us"),
    )
    gms = (F.col("gap_us") / 1000.0).cast("long")
    per = gaps.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.hour("ts") < 6, 1).otherwise(0))
        .cast("bigint")
        .alias("n_night"),
        F.count("gap_us").cast("bigint").alias("n_gaps"),
        F.sum("gap_us").cast("bigint").alias("s1"),
        F.sum(gms * gms).cast("bigint").alias("s2m"),
    )
    tw = Window.partitionBy("user_id")
    cell = ev.groupBy("user_id", "event_type").agg(
        F.count("*").cast("bigint").alias("c")
    ).select(
        "user_id", "c", F.sum("c").over(tw).cast("bigint").alias("t")
    )
    p = F.col("c").cast("double") / F.col("t")
    ent = cell.select(
        "user_id",
        (-p * F.log(p) * 1000000000 + F.lit(0.5)).cast("long").alias("tq"),
    ).groupBy("user_id").agg(F.sum("tq").cast("bigint").alias("hq"))
    mean_g = F.col("s1").cast("double") / F.col("n_gaps")
    var_g = F.greatest(
        F.col("s2m").cast("double") * 1000000.0 / F.col("n_gaps")
        - mean_g * mean_g,
        F.lit(0.0),
    )
    cv = F.sqrt(var_g) / F.nullif(mean_g, F.lit(0.0))
    night = F.col("n_night").cast("double") / F.col("n")
    q6 = lambda c: (c * 1000000 + F.lit(0.5)).cast("long").cast(
        "double"
    ) / 1000000.0
    return per.join(ent, "user_id").select(
        "user_id",
        "n",
        q6(night).alias("night_frac"),
        q6(cv).alias("gap_cv"),
        q6(F.col("hq").cast("double") / 1000000000.0).alias("type_entropy"),
        F.when(
            (night > 0.5) | ((F.col("n_gaps") >= 10) & (cv < 0.3)), 1
        )
        .otherwise(0)
        .cast("int")
        .alias("bot_flag"),
    )


# ---------------------------------------------------------------------------
# D99 — Page-Hinkley sequential drift test (round 11)
# ---------------------------------------------------------------------------

_PH_DELTA = 0.05  # drift allowance per step (absorbs benign wander)
_PH_LAMBDA = 5.0  # alarm threshold on the min-anchored excess


@query(
    "events_page_hinkley",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(floor({sql_dsum('value')} / COUNT(*) * 1000000 + 0.5)
                    AS BIGINT) AS x_q
        FROM events WHERE value IS NOT NULL
        GROUP BY event_type, d
    ),
    seq AS (
        SELECT event_type, d, x_q,
               SUM(x_q) OVER w AS cum_x_q,
               row_number() OVER w AS i
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    terms AS (
        SELECT event_type, d,
               CAST(floor((x_q / 1000000.0
                           - cum_x_q / 1000000.0 / i
                           - {_PH_DELTA}) * 1000000 + 0.5) AS BIGINT)
                   AS t_q
        FROM seq
    ),
    walk0 AS (
        SELECT event_type, d,
               SUM(t_q) OVER (PARTITION BY event_type ORDER BY d
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS m_q
        FROM terms
    ),
    walk AS (
        SELECT event_type, d, m_q,
               MIN(m_q) OVER (PARTITION BY event_type ORDER BY d
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS mmin_q
        FROM walk0
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(MAX(m_q - mmin_q) AS DOUBLE) / 1000000.0 AS max_excess,
           CAST(SUM(CASE WHEN m_q - mmin_q > {_PH_LAMBDA} * 1000000
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_alarm_days,
           MIN(CASE WHEN m_q - mmin_q > {_PH_LAMBDA} * 1000000
               THEN d END) AS first_alarm_day
    FROM walk GROUP BY event_type
    """,
    ref="SURVEY §2 D99 [EXT] (Page-Hinkley sequential drift test (Page "
    "1954; Hinkley 1971): cumulative deviation from the RUNNING mean "
    "minus a drift allowance, alarmed against its own running minimum — "
    "the one-sided sequential monitor beside K64's CUSUM, which "
    "deviates from the GLOBAL mean and therefore needs the whole series "
    "before it can score the first row; PH is streaming-legal (every "
    "statistic at day t uses only days <= t))",
)
def events_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley upward-drift monitor per event type on the daily mean
    value series: m_t = Σ_{i<=t} (x_i - x̄_i - δ) with x̄_i the running
    mean INCLUDING day i, alarm when m_t - min_{i<=t} m_i > λ. Reports
    per type the day count, the maximum min-anchored excess, alarm-day
    count, and the first alarm day (NULL when never alarmed — the clean
    corpus legitimately reads quiet; planted-drift probes in
    tests/test_wave11.py prove the detector detects).

    Scale shape: one corpus scan into the (type, day) agg; every window
    partitions by event_type over the calendar-bounded daily series.

    Determinism: daily means quantize to scaled longs BEFORE any window
    sum (DuckDB's windowed SUM over doubles is segment-tree ordered, not
    sequential — long addends make the order irrelevant); the PH terms
    re-quantize with sign-symmetric floor(x+0.5) (the K64 lesson), so
    the walk, its running min, and the alarm flags are exact integer
    comparisons in both engines."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.floor(
            dsum("value") / F.count(F.lit(1)) * F.lit(1_000_000.0)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("x_q")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seq = daily.select(
        "event_type",
        "d",
        "x_q",
        F.sum("x_q").over(w).alias("cum_x_q"),
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("d"))
        .alias("i"),
    )
    t_q = F.floor(
        (
            F.col("x_q") / F.lit(1_000_000.0)
            - F.col("cum_x_q") / F.lit(1_000_000.0) / F.col("i")
            - F.lit(_PH_DELTA)
        )
        * F.lit(1_000_000.0)
        + F.lit(0.5)
    ).cast("bigint")
    terms = seq.select("event_type", "d", t_q.alias("t_q"))
    walk = terms.select(
        "event_type",
        "d",
        F.sum("t_q").over(w).alias("m_q"),
    ).select(
        "event_type",
        "d",
        "m_q",
        F.min("m_q").over(w).alias("mmin_q"),
    )
    excess_q = F.col("m_q") - F.col("mmin_q")
    alarm = excess_q > F.lit(_PH_LAMBDA) * F.lit(1_000_000.0)
    return walk.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        (F.max(excess_q).cast("double") / F.lit(1_000_000.0)).alias(
            "max_excess"
        ),
        F.sum(alarm.cast("int")).cast("bigint").alias("n_alarm_days"),
        F.min(F.when(alarm, F.col("d"))).alias("first_alarm_day"),
    )
