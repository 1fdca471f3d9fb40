"""SURVEY.md §2.F — sorts, limits, top-k.

Determinism rules (SURVEY §5.2): LIMIT queries are fully tie-broken by a unique
key; NULLS FIRST/LAST is spelled explicitly (Spark ASC default = NULLS FIRST,
DuckDB = NULLS LAST). Top-k compiles to TakeOrderedAndProject (no full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ksql_spark.registry import query
from ksql_spark.tables import load


@query(
    "sort_multi",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_shipdate FROM lineitem
    ORDER BY l_returnflag DESC NULLS LAST, l_shipdate ASC NULLS FIRST,
             l_orderkey, l_linenumber
    LIMIT 100
    """,
    ref="SURVEY §2 F1 (multi-key ORDER BY, explicit null ordering)",
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate")
        .orderBy(
            F.col("l_returnflag").desc_nulls_last(),
            F.col("l_shipdate").asc_nulls_first(),
            F.col("l_orderkey"),
            F.col("l_linenumber"),
        )
        .limit(100)
    )


@query(
    "limit_n",
    oracle="SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 25",
    ref="SURVEY §2 F2 (LIMIT; ordered for determinism)",
)
def limit_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_totalprice").orderBy("o_orderkey").limit(25)


@query(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_orderkey LIMIT 25 OFFSET 50
    """,
    ref="SURVEY §2 F3 (OFFSET, Spark >= 3.4)",
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_totalprice").orderBy("o_orderkey").offset(50).limit(25)


@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    ref="SURVEY §2 F5 (top-k → TakeOrderedAndProject; tie-broken on o_orderkey)",
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "part_skyline_2d",
    oracle="""
    SELECT p_partkey, p_retailprice, CAST(p_size AS BIGINT) AS p_size
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_retailprice <= p.p_retailprice
          AND q.p_size >= p.p_size
          AND (q.p_retailprice < p.p_retailprice
               OR q.p_size > p.p_size)
    )
    """,
    ref="SURVEY §2 F6 [EXT] (2-D skyline / Pareto-frontier operator "
    "(Börzsönyi et al. ICDE 2001): parts not dominated on (price min, "
    "size max) — the multi-criteria shortlist SQL cannot express "
    "without a quadratic NOT EXISTS; the Spark plan is the sort-filter "
    "skyline: ONE pass over price groups with an exclusive running max "
    "of size, via the ranged_cummax_excl scale primitive)",
)
def part_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier over parts: keep a part iff nothing is at-most-as-
    expensive AND at-least-as-big with one strict inequality. Dominance
    decomposes by price group: p is dominated iff the max size among
    STRICTLY cheaper parts reaches p's size, or a SAME-priced part is
    strictly bigger. Both tests read one price-grouped table — no pair
    join, no quadratic pass (the oracle IS the quadratic NOT EXISTS:
    independent semantics, not a re-spelling of this algorithm).

    Scale shape: one price_q hash agg (map-side combined, output =
    distinct prices), the operators/scale.py ranged_cummax_excl
    two-pass for the strict-prior max (range-partitioned local windows
    + a #partitions-row offset broadcast — no SinglePartition window),
    then a keyed join of parts back onto their price group. Prices are
    exact cents, so price_q is a lossless bigint key."""
    from ksql_spark.operators.scale import ranged_cummax_excl

    p = load(spark, sf_dir, "part")
    pq = (F.col("p_retailprice") * 100 + F.lit(0.5)).cast("long")
    rows = p.select(
        "p_partkey",
        "p_retailprice",
        F.col("p_size").cast("long").alias("p_size"),
        pq.alias("price_q"),
    )
    groups = rows.groupBy("price_q").agg(F.max("p_size").alias("gmax"))
    groups = ranged_cummax_excl(groups, ["price_q"], "gmax", "rmax_excl")
    joined = rows.join(groups, "price_q")
    dominated = (
        F.col("rmax_excl").isNotNull()
        & (F.col("rmax_excl") >= F.col("p_size"))
    ) | (F.col("gmax") > F.col("p_size"))
    return joined.where(~dominated).select(
        "p_partkey", "p_retailprice", "p_size"
    )
