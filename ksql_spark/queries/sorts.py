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
