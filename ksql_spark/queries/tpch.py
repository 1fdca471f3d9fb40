"""SURVEY.md §2 integration queries — TPC-H-shaped composite workloads.

The driver tables are a reduced TPC-H (no partsupp, fewer columns), so these
are the classic query SHAPES adapted to the available schema: multi-way joins
with correlated key paths (Q5), min-over-group join-back (Q2), left-join count
histograms (Q13), scalar-subquery + anti-join composites (Q22). Each exercises
several operators end-to-end in one plan — the integration counterpart to the
per-operator entries.

Scale notes are per-query; the shared posture: dims broadcast, the lineitem /
orders fact side never shuffles except on its aggregation key, doubles
accumulate via the quantized dsum/davg helpers (registry.py) for cross-engine
exactness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ksql_spark.registry import davg, dsum, query, sql_davg, sql_dsum
from ksql_spark.tables import load


@query(
    "tpch_q5_local_supplier",
    oracle=f"""
    SELECT n_name,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey   = c_custkey
    JOIN lineitem ON l_orderkey  = o_orderkey
    JOIN supplier ON l_suppkey   = s_suppkey AND s_nationkey = c_nationkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
    ref="TPC-H Q5 shape (local supplier volume): 6-way join with the "
    "correlated s_nationkey = c_nationkey path that prunes cross-nation "
    "supply; SURVEY §2 C1/C10/D4 composite",
)
def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from intra-nation supply per nation. Plan: region/nation/
    customer/supplier all broadcast (each orders-of-magnitude smaller than
    lineitem); lineitem joins orders on l_orderkey — the only wide exchange
    is the hash-agg on n_name (25 groups). The correlated nationkey equality
    is a join-side filter, not a post-join one, so mismatched rows never
    materialize."""
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    return (
        l.join(F.broadcast(o), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(
                c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
                .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH unit AS (
        SELECT l_partkey, l_suppkey,
               l_extendedprice / l_quantity AS unit_price
        FROM lineitem
    ),
    mins AS (
        SELECT l_partkey, MIN(unit_price) AS min_price
        FROM unit GROUP BY l_partkey
    )
    SELECT u.l_partkey AS partkey,
           MIN(u.l_suppkey) AS best_suppkey,
           m.min_price AS min_price
    FROM unit u JOIN mins m
      ON u.l_partkey = m.l_partkey AND u.unit_price = m.min_price
    GROUP BY u.l_partkey, m.min_price
    """,
    ref="TPC-H Q2 shape (min-cost supplier): correlated MIN per group with "
    "join-back on the achieving rows; SURVEY §2 B14/D4/C7 composite",
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheapest observed unit price per part and the (min-id) supplier
    achieving it. MIN over doubles is exact (no accumulation), and the
    double division is bit-identical across engines, so the equality
    join-back on unit_price is deterministic.

    Plan: the per-part min table is |parts| rows of (key, double) — Spark
    BROADCASTS it back onto the unit scan, so the probe side never shuffles
    before the join (verified: 1 BroadcastHashJoin, no SortMergeJoin). At a
    scale where |parts| outgrows the broadcast threshold, AQE falls back to
    a shuffle join where both sides hash on l_partkey — the probe exchange
    is then reused from the min aggregation's shuffle."""
    l = load(spark, sf_dir, "lineitem")
    unit = l.select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )
    mins = unit.groupBy(F.col("l_partkey").alias("m_partkey")).agg(
        F.min("unit_price").alias("min_price")
    )
    return (
        unit.join(
            mins,
            (F.col("l_partkey") == F.col("m_partkey"))
            & (F.col("unit_price") == F.col("min_price")),
        )
        .groupBy(F.col("l_partkey").alias("partkey"), F.col("min_price"))
        .agg(F.min("l_suppkey").alias("best_suppkey"))
        .select("partkey", "best_suppkey", "min_price")
    )


@query(
    "tpch_q13_order_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
    ref="TPC-H Q13 shape (customer order-count distribution): left join with "
    "a filtered JOIN condition (not a WHERE — zero-order customers survive), "
    "two-level aggregation; SURVEY §2 C2/D3 composite",
)
def tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many customers placed exactly N non-urgent orders. The priority
    filter must live in the JOIN condition: in a WHERE it would turn the
    left join inner and drop zero-order customers from the histogram.

    Plan: one shuffle on the join key, count per customer rides the same
    partitioning (partial agg), then a tiny second agg on c_count."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "tpch_q22_dormant_customers",
    oracle=f"""
    WITH avg_bal AS (
        SELECT {sql_davg('c_acctbal')} AS a
        FROM customer WHERE c_acctbal > 0
    ),
    big AS (
        SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 400000
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           {sql_dsum('c_acctbal')} AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > a
      AND c_custkey NOT IN (SELECT o_custkey FROM big)
    GROUP BY c_mktsegment
    """,
    ref="TPC-H Q22 shape (dormant high-balance customers): global scalar "
    "subquery threshold + anti-join on order history; SURVEY §2 B14/C9/D4 "
    "composite",
)
def tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average-balance customers who never placed a large order
    (> 400k), grouped by market segment. The balance threshold is the
    quantized davg (bit-identical both engines), so the > comparison can't
    flip on a ulp.

    Plan: the scalar average is a 1-row broadcast; the big-order custkey set
    anti-joins (its distinct projection is |large-order customers|, shuffled
    on the key — broadcastable when small); the customer scan is otherwise
    narrow."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(davg("c_acctbal").alias("a"))
    big = o.where(F.col("o_totalprice") > 400000).select("o_custkey").distinct()
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("a"))
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("numcust"), dsum("c_acctbal").alias("totacctbal"))
    )
