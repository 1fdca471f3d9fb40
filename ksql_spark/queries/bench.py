"""Headline bench queries (BASELINE.md §3) — these six are measured per-round
against the DuckDB baseline and double as correctness entries.

Scale notes: nation/region are broadcast (fixed 25/5 rows at any SF); the
lineitem⋈orders⋈customer joins shuffle on their keys with AQE handling skew;
aggregations are partial+final hash aggs (map-side combine) automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ksql_spark.registry import davg, dsum, query, sql_davg, sql_dsum
from ksql_spark.tables import load


@query(
    "q_filter_count",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS cnt
    FROM lineitem
    WHERE l_quantity > 25 AND l_discount BETWEEN 0.02 AND 0.06
    """,
    ref="SURVEY §2 B6/B10/D1; reference analog README.md:21 (count+filter)",
)
def q_filter_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter + global count. Predicates push down to the parquet scan."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where((F.col("l_quantity") > 25) & F.col("l_discount").between(0.02, 0.06))
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "q_groupby_agg",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_davg('l_quantity')} AS avg_qty,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    ref="SURVEY §2 D3/D4; reference analog README.md:26 (group-by + count)",
)
def q_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style 2-key hash aggregation (partial+final agg, no sort needed)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
        davg("l_quantity").alias("avg_qty"),
        F.count("*").alias("count_order"),
    )


@query(
    "q_join3_topk",
    oracle=f"""
    SELECT n_name,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS line_count
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    LIMIT 10
    """,
    ref="SURVEY §2 C1/D3/F5; reference analog README.md:30 (join USING + project)",
)
def q_join3_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by nation: 3-way join → agg → top-10.

    nation is broadcast (25 rows at every SF). lineitem⋈orders shuffles on
    orderkey; AQE picks broadcast for customer when it fits. Final top-10 is
    TakeOrderedAndProject (no full sort).
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count("*").alias("line_count"),
        )
        .orderBy(F.col("revenue").desc(), "n_name")
        .limit(10)
    )


@query(
    "q_window",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rnk FROM (
        SELECT c_custkey, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY c_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rnk
        FROM orders JOIN customer ON o_custkey = c_custkey
    ) WHERE rnk <= 3
    """,
    ref="SURVEY §2 E1/E5 (rank per group, top-3 filter)",
)
def q_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price. row_number over (custkey, price desc)
    with o_orderkey tie-break for determinism (SURVEY §5.2)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
    )


@query(
    "q_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
    ref="SURVEY §2 D10 (ROLLUP)",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(status, priority) counts — hierarchy totals incl. grand total."""
    o = load(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("cnt"))


@query(
    "q_events_session",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS hour_ts, user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM events
    GROUP BY hour_ts, user_id
    """,
    ref="SURVEY §2 I2 batch form (hourly per-user event agg)",
)
def q_events_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-user aggregation over the events table (batch form of the
    tumbling-window streaming agg; same expression works under readStream)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_ts"), F.col("user_id")
    ).agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
