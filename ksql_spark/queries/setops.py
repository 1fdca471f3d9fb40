"""SURVEY.md §2.G — set operations (UNION / UNION ALL / INTERSECT / EXCEPT).

Spark's union is positional (UNION ALL semantics); .distinct() recovers SQL
UNION. intersect/exceptAll match ANSI INTERSECT / EXCEPT ALL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ksql_spark.registry import query
from ksql_spark.tables import load


@query(
    "set_union",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9500
    UNION
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9500
    """,
    ref="SURVEY §2 G1 (UNION dedups)",
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    a = c.where(F.col("c_acctbal") > 9500).select(F.col("c_nationkey").alias("nationkey"))
    b = s.where(F.col("s_acctbal") > 9500).select(F.col("s_nationkey").alias("nationkey"))
    return a.union(b).distinct()


@query(
    "set_union_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9500
    UNION ALL
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9500
    """,
    ref="SURVEY §2 G2 (UNION ALL keeps duplicates)",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    a = c.where(F.col("c_acctbal") > 9500).select(F.col("c_nationkey").alias("nationkey"))
    b = s.where(F.col("s_acctbal") > 9500).select(F.col("s_nationkey").alias("nationkey"))
    return a.unionAll(b)


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9500
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9500
    """,
    ref="SURVEY §2 G3 (INTERSECT, distinct semantics)",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    a = c.where(F.col("c_acctbal") > 9500).select(F.col("c_nationkey").alias("nationkey"))
    b = s.where(F.col("s_acctbal") > 9500).select(F.col("s_nationkey").alias("nationkey"))
    return a.intersect(b)


@query(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9500
    EXCEPT ALL
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9500
    """,
    ref="SURVEY §2 G4 (EXCEPT ALL multiset semantics)",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    a = c.where(F.col("c_acctbal") > 9500).select(F.col("c_nationkey").alias("nationkey"))
    b = s.where(F.col("s_acctbal") > 9500).select(F.col("s_nationkey").alias("nationkey"))
    return a.exceptAll(b)


@query(
    "set_intersect_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9500
    INTERSECT ALL
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9500
    """,
    ref="SURVEY §2 G3 (INTERSECT ALL multiset semantics — min of the two "
    "per-value multiplicities survives)",
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    a = c.where(F.col("c_acctbal") > 9500).select(F.col("c_nationkey").alias("nationkey"))
    b = s.where(F.col("s_acctbal") > 9500).select(F.col("s_nationkey").alias("nationkey"))
    return a.intersectAll(b)


@query(
    "set_except_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9500
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9500
    """,
    ref="SURVEY §2 G4 (ANSI EXCEPT dedups before subtracting — the set form "
    "alongside set_except's multiset EXCEPT ALL)",
)
def set_except_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    a = c.where(F.col("c_acctbal") > 9500).select(F.col("c_nationkey").alias("nationkey"))
    b = s.where(F.col("s_acctbal") > 9500).select(F.col("s_nationkey").alias("nationkey"))
    return a.subtract(b)


@query(
    "set_union_by_name",
    oracle="""
    SELECT * FROM (
        SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
        WHERE o_orderstatus = 'F'
        UNION ALL BY NAME
        SELECT o_totalprice, o_orderkey FROM orders
        WHERE o_orderstatus = 'O'
    )
    """,
    ref="SURVEY §2 G [EXT] (UNION BY NAME: position-independent union "
    "that matches columns by NAME and null-fills the missing ones — "
    "DuckDB's UNION ALL BY NAME == Spark's "
    "unionByName(allowMissingColumns=True); the schema-drift-safe union "
    "every multi-source ingest needs)",
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union two projections with DIFFERENT column orders and one missing
    column: rows align by column name, the absent o_orderpriority
    null-fills on the second branch. The positional UNION ALL would have
    mis-zipped o_totalprice under o_orderkey silently — this is the
    ingest-safety surface, not sugar."""
    o = load(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    b = o.where(F.col("o_orderstatus") == "O").select(
        "o_totalprice", "o_orderkey"
    )
    return a.unionByName(b, allowMissingColumns=True)
