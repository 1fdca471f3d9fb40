"""SURVEY.md §2.E — window functions.

Absent from the reference surface (AlaSQL 0.3.1 has no OVER()); all [EXT],
included because the north star is a full analytics engine (SURVEY §2.E).

Determinism: every window ORDER BY is fully tie-broken by a unique key;
windowed double sums use scaled-long accumulation inside the frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ksql_spark.registry import query
from ksql_spark.tables import load

# Shared oracle fragment: windowed exact sum of `value` scaled to longs —
# same trunc spelling as registry.sql_dsum (round() would be slower and
# tie-divergent across engines; see registry.py).
_WIN_VAL = "CAST(trunc(value * 1000000 + 0.5) AS BIGINT)"


@query(
    "win_rank",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           CAST(rank() OVER w AS INT) AS rnk,
           CAST(dense_rank() OVER w AS INT) AS drnk,
           CAST(ntile(4) OVER w AS INT) AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
    ref="SURVEY §2 E1 (rank/dense_rank/ntile)",
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "win_lag_lead",
    oracle="""
    SELECT event_id, user_id, value,
           lag(value) OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           first_value(event_id) OVER w AS first_event
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    ref="SURVEY §2 E2 (lag/lead/first_value)",
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("event_id").over(w).alias("first_event"),
    )


@query(
    "win_running_sum",
    oracle=f"""
    SELECT event_id, user_id,
           CAST(SUM({_WIN_VAL}) OVER w AS DOUBLE) / 1000000.0 AS running_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    ref="SURVEY §2 E3 (running aggregate over window; exact scaled-long sum)",
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scaled = (F.col("value") * 1000000.0 + 0.5).cast("long")
    return ev.select(
        "event_id",
        "user_id",
        (F.sum(scaled).over(w).cast("double") / 1000000.0).alias("running_value"),
    )


@query(
    "win_frame_rows",
    oracle=f"""
    SELECT event_id, user_id,
           (CAST(SUM({_WIN_VAL}) OVER w AS DOUBLE) / 1000000.0)
               / CAST(COUNT(*) OVER w AS DOUBLE) AS moving_avg3,
           CAST(COUNT(*) OVER w AS BIGINT) AS frame_n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    ref="SURVEY §2 E4 (explicit ROWS frame; 3-row moving average)",
)
def win_frame_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    scaled = (F.col("value") * 1000000.0 + 0.5).cast("long")
    cnt = F.count("*").over(w)
    return ev.select(
        "event_id",
        "user_id",
        (
            (F.sum(scaled).over(w).cast("double") / 1000000.0) / cnt.cast("double")
        ).alias("moving_avg3"),
        cnt.alias("frame_n"),
    )


@query(
    "win_distribution",
    oracle="""
    SELECT s_suppkey,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM supplier
    WINDOW w AS (ORDER BY s_acctbal, s_suppkey)
    """,
    ref="SURVEY §2 E1 (percent_rank/cume_dist — rank-derived ratios, identical "
    "double division in both engines)",
)
def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-table percent_rank/cume_dist — a GLOBAL-order window, which Spark
    necessarily plans as Exchange SinglePartition (each row's rank depends on
    all rows). Correct semantics definition at oracle scale; at 100 TB use the
    two-stage decomposition documented in docs/SCALE.md §Windows — IMPLEMENTED
    here as win_distribution_scaled (oracle-exact, plan-gated against
    Exchange SinglePartition)."""
    s = load(spark, sf_dir, "supplier")
    w = Window.orderBy("s_acctbal", "s_suppkey")
    return s.select(
        "s_suppkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@query(
    "win_range_frame",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_within_1000
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice
                 RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW)
    """,
    ref="SURVEY §2 E4 (value-based RANGE frame; count is tie-order-insensitive)",
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.count("*").over(w).alias("n_within_1000"),
    )


@query(
    "win_topn_per_group",
    oracle="""
    SELECT user_id, event_id, value FROM (
        SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY value DESC, event_id) AS rn
        FROM events
    ) WHERE rn <= 2
    """,
    ref="SURVEY §2 E5 (top-N per group = row_number + filter)",
)
def win_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        ev.select("user_id", "event_id", "value")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .drop("rn")
    )


@query(
    "win_ntile",
    oracle="""
    SELECT o_orderkey,
           CAST(ntile(4) OVER (PARTITION BY o_orderstatus
                               ORDER BY o_totalprice, o_orderkey) AS INT)
               AS quartile
    FROM orders
    """,
    ref="SURVEY §2 E1 family (NTILE bucketing; o_orderkey tie-break makes the "
    "bucket assignment deterministic — both engines use the same "
    "floor-division bucket-size rule)",
)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice"), F.col("o_orderkey")
    )
    return o.select("o_orderkey", F.ntile(4).over(w).alias("quartile"))


@query(
    "win_value_fns",
    oracle="""
    SELECT o_orderkey,
           first_value(o_totalprice) OVER w AS cheapest,
           last_value(o_totalprice) OVER w AS priciest,
           nth_value(o_totalprice, 2) OVER w AS second_cheapest
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    ref="SURVEY §2 E2 family (first_value/last_value/nth_value over a full-"
    "partition frame; unique tie-break keeps the frame order deterministic)",
)
def win_value_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice"), F.col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("cheapest"),
        F.last("o_totalprice").over(w).alias("priciest"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_cheapest"),
    )


@query(
    "win_distribution_scaled",
    oracle="""
    SELECT o_orderkey,
           CAST(row_number() OVER w AS BIGINT) AS rnk,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM orders
    WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
    """,
    ref="SURVEY §2 E1 / docs/SCALE.md §Windows (two-stage global rank: the "
    "scalable form of win_distribution — no Exchange SinglePartition)",
)
def win_distribution_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global rank / percent_rank / cume_dist WITHOUT the single-partition
    window win_distribution plans (there the whole table funnels through one
    task — the documented scale boundary this entry removes).

    Two-stage decomposition (same shape as llm_pack_sequences' cumsum,
    plan-gated against Exchange SinglePartition):
      1. repartitionByRange on the full sort key — partition p holds a
         contiguous, globally ordered key range (localCheckpoint pins the
         boundaries for both passes);
      2. per-partition row_number (window PARTITIONED BY partition id —
         parallel);
      3. one bounded job collects per-partition row counts (|partitions|
         rows, never table rows), prefix-summed on the driver;
      4. broadcast the starting offsets back: global rank = local rank +
         offset; the ratios divide by the broadcast total.
    The (o_totalprice, o_orderkey) key is UNIQUE, so rank == row_number and
    the rank-derived ratios are exact — with a non-unique key, ties stay
    inside one range partition (equal keys map to the same range), so
    rank()/dense_rank() decompose the same way with a first-tie offset.
    """
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    n_parts = max(4, spark.sparkContext.defaultParallelism // 4)
    parts = (
        o.repartitionByRange(n_parts, "o_totalprice", "o_orderkey")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = {
        r["_pid"]: r["c"]
        for r in parts.groupBy("_pid").agg(F.count("*").alias("c")).collect()
    }
    running, offset_rows = 0, []
    for pid in sorted(counts):  # range partitions are globally ordered by pid
        offset_rows.append((pid, running))
        running += counts[pid]
    n = running
    offsets = spark.createDataFrame(offset_rows, "_pid int, _start long")
    w_local = Window.partitionBy("_pid").orderBy("o_totalprice", "o_orderkey")
    rnk = (F.row_number().over(w_local) + F.col("_start")).alias("rnk")
    return (
        parts.join(F.broadcast(offsets), "_pid")
        .select(
            "o_orderkey",
            rnk,
            (
                F.when(F.lit(n) > 1, (F.col("rnk") - 1) / F.lit(float(n - 1)))
                .otherwise(F.lit(0.0))
            ).alias("pct_rank"),
            (F.col("rnk") / F.lit(float(n))).alias("cume"),
        )
    )


@query(
    "win_ratio_to_report",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           o_totalprice /
           (CAST(SUM(CAST(trunc(o_totalprice * 1000000 + 0.5) AS BIGINT))
                 OVER (PARTITION BY o_custkey) AS DOUBLE) / 1000000.0)
               AS share_of_customer
    FROM orders WHERE o_custkey < 200
    """,
    ref="SURVEY §2 E3 (ratio-to-report: each row's share of its partition "
    "total — the classic contribution-percentage window)",
)
def win_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each order's share of its customer's total spend.

    Plan: one hash exchange on o_custkey, unbounded-frame sum evaluated in a
    single pass per partition (no sort needed for an unordered frame). The
    partition total goes through the quantized scaled-long accumulation
    (registry.py determinism notes) so the share is bit-identical regardless
    of the row order the frame iterates — a raw double SUM would expose
    shuffle-read order in the low bits."""
    o = load(spark, sf_dir, "orders").where(F.col("o_custkey") < 200)
    w = Window.partitionBy("o_custkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        # try_divide: an all-zero-price customer zeroes the report total and
        # plain division ANSI-aborts; NULL share matches DuckDB's x/0 = NULL.
        F.try_divide(
            F.col("o_totalprice"),
            F.sum(
                (F.col("o_totalprice") * 1000000.0 + 0.5).cast("bigint")
            ).over(w).cast("double")
            / 1000000.0,
        ).alias("share_of_customer"),
    )


@query(
    "win_sessionize_gaps",
    oracle="""
    WITH gapped AS (
        SELECT user_id, event_id, ts,
               CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                    OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id,
           CAST(SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS INT) AS session_id
    FROM gapped
    """,
    ref="SURVEY §2 E2/E3/I4 (gap-based sessionization: lag-gap flag + "
    "running sum = session ids — the window-function formulation of "
    "session_window, usable mid-pipeline where a groupBy-session shape "
    "isn't (e.g. when later steps need per-EVENT session labels))",
)
def win_sessionize_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event session ids: a session breaks after a >30-minute silence.
    new_session = (gap > 30min or first event), session_id = running sum of
    the flags — every event keeps its own row (unlike session_window, which
    aggregates), so downstream joins can attach session context per event.

    Scale shape: both windows partition by user_id (one shuffle, parallel
    across users); the interval comparison and running sum are exact integer/
    timestamp math — bit-identical cross-engine, no doubles anywhere."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ntz has no direct long cast; micros via an (exact, UTC-session) TIMESTAMP
    # hop — strict > on micros == the oracle's > INTERVAL 30 MINUTE
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap_flag = (
        F.when(us - F.lag(us).over(w) > 1800 * 1_000_000, 1)
        .when(F.lag("ts").over(w).isNull(), 1)
        .otherwise(0)
    )
    ev = load(spark, sf_dir, "events")
    return (
        ev.select("user_id", "event_id", "ts", gap_flag.alias("new_session"))
        .select(
            "user_id",
            "event_id",
            F.sum("new_session")
            .over(
                Window.partitionBy("user_id")
                .orderBy("ts", "event_id")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            .cast("int")
            .alias("session_id"),
        )
    )


@query(
    "win_rolling_median",
    oracle="""
    SELECT event_id, user_id, value,
           quantile_cont(value, 0.5) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS rolling_median
    FROM events
    """,
    ref="SURVEY §2 E+ [EXT] (rolling exact median over a 7-row trailing "
    "frame — the robust smoother; Spark's median() refuses a frame but "
    "percentile(x, 0.5) accepts one, and its h=(n-1)p interpolation is "
    "bit-identical to DuckDB quantile_cont, as agg_quantiles proved for "
    "the aggregate form)",
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling median of the last 7 events (ties in ts broken by
    event_id): the outlier-immune alternative to a rolling mean — one
    spike moves a 7-row mean by spike/7, the median not at all.

    Scale shape: ONE user_id shuffle + sequential frame scan; the frame
    holds <= 7 values, so per-row cost is O(frame log frame) regardless
    of partition size, and the exact-percentile buffer never grows."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.percentile("value", F.lit(0.5)).over(w).alias("rolling_median"),
    )


@query(
    "win_distinct_in_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(len(list_distinct(list(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW
           ))) AS INT) AS distinct_types_10
    FROM events
    """,
    ref="SURVEY §2 E+ [EXT] (distinct count over a moving frame — neither "
    "engine supports COUNT(DISTINCT) OVER, but both can collect the frame "
    "and dedup it: Spark size(collect_set() OVER) == DuckDB "
    "len(list_distinct(list() OVER)) — behavioral-diversity signal over "
    "each user's trailing 10 events)",
)
def win_distinct_in_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many DISTINCT event types each user's last 10 events span — the
    windowed-distinct shape SQL engines refuse as COUNT(DISTINCT) OVER,
    expressed portably via frame collection + dedup.

    Scale: one user_id shuffle; the frame buffer holds <= 10 values per
    row, so memory is O(frame), not O(partition)."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.size(F.collect_set("event_type").over(w))
        .cast("int")
        .alias("distinct_types_10"),
    )


@query(
    "win_locf_ignore_nulls",
    oracle="""
    WITH masked AS (
        SELECT user_id, event_id, ts,
               CASE WHEN event_id % 5 <> 0 THEN value END AS reading
        FROM events
    )
    SELECT user_id, event_id, reading,
           last_value(reading IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS locf,
           first_value(reading IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
           ) AS nocb
    FROM masked
    """,
    ref="SURVEY §2 E8 [EXT] (IGNORE NULLS window semantics: last "
    "observation carried forward + next observation carried backward "
    "over a sparse sensor column — the gap-fill staple K29's resampler "
    "applies on the dense grid, here exposed as the declarative window "
    "form; Spark spells it last(col, ignorenulls=True) OVER)",
)
def win_locf_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF and NOCB over a sparse reading (every 5th event's value is
    masked to NULL deterministically): per user in time order, carry the
    last non-null value forward and the next non-null value backward —
    the two imputation primitives every sparse-telemetry pipeline needs.
    No arithmetic at all: the imputed values are the stored doubles, so
    cross-engine equality is bit-trivial; what is being pinned is the
    IGNORE NULLS frame semantics themselves.

    Scale shape: one user_id-partitioned window pass (both directions
    share the same partitioning — one shuffle, two sorts), parallel
    across users."""
    ev = load(spark, sf_dir, "events")
    masked = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_id") % 5 != 0, F.col("value")).alias("reading"),
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return masked.select(
        "user_id",
        "event_id",
        "reading",
        F.last("reading", ignorenulls=True).over(fwd).alias("locf"),
        F.first("reading", ignorenulls=True).over(bwd).alias("nocb"),
    )


@query(
    "win_time_range_frame",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_last_hour,
           CAST(SUM(CAST(trunc(value * 1000000 + 0.5) AS BIGINT)) OVER w
                AS DOUBLE) / 1000000.0 AS sum_value_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
    ref="SURVEY §2 E9 [EXT] (TIME-interval RANGE frame: rolling 1-hour "
    "per-user count/sum — the sliding-by-event-time window every "
    "rate-limit and rolling-exposure query needs; Spark has no "
    "INTERVAL range frames, so the idiomatic spelling is rangeBetween "
    "over unix microseconds — semantically identical peers-inclusive "
    "frames, pinned here against DuckDB's native INTERVAL form)",
)
def win_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 1-hour trailing event count and exact-quantized value sum
    per user, as an event-time RANGE frame (peers at the same timestamp
    all join the frame — ROWS frames can't express this). Spark lacks
    INTERVAL bounds on range frames; ordering by unix_micros with a
    numeric 3600-second lower bound is the standard equivalent — both
    engines include rows with ts in [current - 1h, current], endpoints
    inclusive. The sum accumulates 1e-6-quantized integers inside the
    frame, so frame-internal order can't leak.

    Scale shape: one user_id-partitioned window pass; the frame scan is
    per-user sequential (Spark's sliding range frame is O(n) amortized
    per partition), parallel across users."""
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, 0)
    )
    vq = (F.col("value") * 1000000 + F.lit(0.5)).cast("long")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count("*").over(w).cast("bigint").alias("n_last_hour"),
        (F.sum(vq).over(w).cast("double") / 1000000.0).alias(
            "sum_value_last_hour"
        ),
    )
