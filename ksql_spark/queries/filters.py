"""SURVEY.md §2.B — projections, filters, predicates.

Reference surface: AlaSQL SELECT/WHERE reachable via exec (ksql.js:159);
LIKE filters and NOT-on-nested-field appear verbatim in README.md:21,26,30,34.
Everything here is declarative DataFrame API → Catalyst pushes predicates and
prunes columns into the parquet scan (verified via .explain PushedFilters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ksql_spark.registry import query
from ksql_spark.tables import load


@query(
    "project_columns",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
    """,
    ref="SURVEY §2 B1; reference README.md:26 (column projection)",
)
def project_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain projection — ReadSchema shows only the three columns scanned."""
    return load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )


@query(
    "project_nested_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_value
    FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
    """,
    ref="SURVEY §2 B2; reference README.md:30 nested projection "
    "(pods.metadata->name) — JSON-string flavor on events.props",
)
def project_nested_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-path projection through the `->` mapping (JSON-string column)."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.select("event_id", k.alias("k_value")).where(k.isNotNull())


@query(
    "project_exprs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           l_quantity > 25 AS is_bulk
    FROM lineitem
    """,
    ref="SURVEY §2 B3 (expression projection + AS alias)",
)
def project_exprs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic/boolean expression projection with aliases (per-row double
    math is IEEE-deterministic, so no scaled-sum tricks needed)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
        ).alias("charge"),
        (F.col("l_quantity") > 25).alias("is_bulk"),
    )


@query(
    "distinct_rows",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    ref="SURVEY §2 B5 (SELECT DISTINCT)",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "filter_like",
    oracle="""
    SELECT p_partkey, p_name, p_brand FROM part
    WHERE p_name LIKE 'red%' OR p_name LIKE '%ring'
    """,
    ref="SURVEY §2 B6; reference README.md:21 (WHERE image LIKE 'mysql%')",
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.where(F.col("p_name").like("red%") | F.col("p_name").like("%ring")).select(
        "p_partkey", "p_name", "p_brand"
    )


@query(
    "filter_ilike",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE c_mktsegment ILIKE 'house%'
    """,
    ref="SURVEY §2 B6 [EXT] (case-insensitive LIKE)",
)
def filter_ilike(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.where(F.col("c_mktsegment").ilike("house%")).select(
        "c_custkey", "c_mktsegment"
    )


@query(
    "filter_compare",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
    WHERE l_quantity >= 30 AND l_discount < 0.05 AND l_returnflag <> 'A'
          AND l_linestatus = 'F'
    """,
    ref="SURVEY §2 B8 (comparison operators)",
)
def filter_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_quantity") >= 30)
        & (F.col("l_discount") < 0.05)
        & (F.col("l_returnflag") != "A")
        & (F.col("l_linestatus") == "F")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


@query(
    "filter_between",
    oracle="""
    SELECT o_orderkey, o_orderdate FROM orders
    WHERE o_orderdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-12-31'
    """,
    ref="SURVEY §2 B10 (BETWEEN)",
)
def filter_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.where(
        F.col("o_orderdate").between("1997-01-01", "1997-12-31")
    ).select("o_orderkey", "o_orderdate")


@query(
    "filter_in_subquery",
    oracle="""
    SELECT o_orderkey, o_custkey FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
    """,
    ref="SURVEY §2 B9 (IN subquery → Catalyst left-semi join)",
)
def filter_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery via SQL so Catalyst performs the semi-join rewrite itself."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_insub")
    load(spark, sf_dir, "customer").createOrReplaceTempView("v_customer_insub")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey FROM v_orders_insub
        WHERE o_custkey IN (SELECT c_custkey FROM v_customer_insub WHERE c_acctbal > 9000)
        """
    )


@query(
    "filter_in_list",
    oracle="""
    SELECT o_orderkey, o_orderpriority FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_orderstatus NOT IN ('F')
    """,
    ref="SURVEY §2 B9 (IN / NOT IN literal list)",
)
def filter_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.where(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & ~F.col("o_orderstatus").isin("F")
    ).select("o_orderkey", "o_orderpriority")


@query(
    "filter_exists",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
    ref="SURVEY §2 B12 (correlated EXISTS → semi join)",
)
def filter_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "customer").createOrReplaceTempView("v_customer_ex")
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_ex")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM v_customer_ex c
        WHERE EXISTS (SELECT 1 FROM v_orders_ex o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        """
    )


@query(
    "filter_null",
    oracle="""
    SELECT l_orderkey, l_linenumber, NULLIF(l_returnflag, 'N') AS flag_or_null
    FROM lineitem
    WHERE NULLIF(l_returnflag, 'N') IS NOT NULL
    """,
    ref="SURVEY §2 B11 (IS [NOT] NULL; driver data is null-free so nulls are manufactured)",
)
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    flag = F.nullif(F.col("l_returnflag"), F.lit("N"))
    return li.select(
        "l_orderkey", "l_linenumber", flag.alias("flag_or_null")
    ).where(flag.isNotNull())


@query(
    "filter_not_null",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    LEFT JOIN (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 400000) big
           ON c_custkey = big.o_custkey
    WHERE big.o_custkey IS NULL
    """,
    ref="SURVEY §2 B7; reference README.md:34 (LEFT JOIN … AND NOT <field> — ANSI form)",
)
def filter_not_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI version of the reference's truthiness idiom: left join then keep
    rows whose join partner is absent (ksql.js README.md:34 analog)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    big = o.where(F.col("o_totalprice") > 400000).select("o_custkey").distinct()
    return (
        c.join(big, c.c_custkey == big.o_custkey, "left")
        .where(F.col("o_custkey").isNull())
        .select("c_custkey", "c_name")
    )


@query(
    "case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'high'
                WHEN o_totalprice >= 100000 THEN 'mid'
                ELSE 'low' END AS price_band
    FROM orders
    """,
    ref="SURVEY §2 B13 (CASE WHEN)",
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
    )


@query(
    "scalar_subquery",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer
    WHERE c_acctbal > (SELECT MAX(s_acctbal) FROM supplier)
    """,
    ref="SURVEY §2 B14 (scalar subquery; MAX is order-insensitive → deterministic)",
)
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "customer").createOrReplaceTempView("v_customer_ss")
    load(spark, sf_dir, "supplier").createOrReplaceTempView("v_supplier_ss")
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal FROM v_customer_ss
        WHERE c_acctbal > (SELECT MAX(s_acctbal) FROM v_supplier_ss)
        """
    )


@query(
    "filter_not_in_nulls",
    oracle="""
    SELECT
        (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
         WHERE o_orderpriority NOT IN
               (SELECT NULLIF(o_orderpriority, o_orderpriority) FROM orders
                WHERE o_orderkey = 1)) AS cnt_with_null_list,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
         WHERE o_orderpriority NOT IN ('1-URGENT')) AS cnt_clean_list
    """,
    ref="SURVEY §2 B9/B11 (three-valued-logic torture: NOT IN against a "
    "list containing NULL matches NOTHING (x <> NULL is UNKNOWN for every "
    "x) — the classic silent-empty-result trap; both engines must agree "
    "on 0 rows, and on the sane count for a NULL-free list)",
)
def filter_not_in_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI NOT-IN-with-NULL pitfall, pinned: a NULL in the NOT IN
    subquery's result annihilates every comparison (UNKNOWN), so
    cnt_with_null_list MUST be 0 — identically in Spark and the oracle —
    while the NULL-free list behaves normally. An engine that 'fixes' this
    silently would break ANSI portability; this entry locks the agreement."""
    from ksql_spark.tables import ensure_views

    # deliberately the ENGINE's own NOT IN (null-aware anti join), not a
    # hand-rolled equivalent — the entry pins Spark's semantics vs ANSI
    ensure_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT
            (SELECT COUNT(*) FROM orders
             WHERE o_orderpriority NOT IN
                   (SELECT NULLIF(o_orderpriority, o_orderpriority) FROM orders
                    WHERE o_orderkey = 1)) AS cnt_with_null_list,
            (SELECT COUNT(*) FROM orders
             WHERE o_orderpriority NOT IN ('1-URGENT')) AS cnt_clean_list
        """
    )


@query(
    "project_lateral_alias",
    oracle="""
    SELECT o_orderkey,
           o_totalprice * 0.9 AS discounted,
           discounted * 0.07 AS tax
    FROM orders
    """,
    ref="SURVEY §2 B3 [EXT] (lateral column alias: a select item referencing "
    "an alias defined earlier in the SAME select list — Spark 4 analyzer "
    "feature, identical semantics in DuckDB; avoids nesting a subquery "
    "just to reuse a computed column)",
)
def project_lateral_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral column aliases: `tax` is computed from the sibling alias
    `discounted` — pure analyzer sugar, the plan inlines the expression, so
    the scan/projection shape is unchanged. Double math is a fixed IEEE
    sequence, bit-identical in both engines."""
    from ksql_spark.tables import ensure_views

    ensure_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey,
               o_totalprice * 0.9 AS discounted,
               discounted * 0.07 AS tax
        FROM orders
        """
    )
