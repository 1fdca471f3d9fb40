"""SURVEY.md §2.J — user-defined function surface.

The reference's extension point is `alasql.fn.name = f` then `name(x)` in SQL
(AlaSQL-documented [D]; none registered in the repo). Spark-side:
  J1 scalar  → Arrow-batched @pandas_udf (10-100x over row-at-a-time Python)
  J2 agg     → pandas_udf grouped aggregate
  J3 table   → Python UDTF (Spark 4) / mapInPandas flat-map

Arbitrary-JS transparent eval (J4, `a->fn()` H9) is deliberately NOT
reproduced — registered UDFs only (SURVEY §2 H9 security note).

Oracle note: Python UDFs must produce engine-portable values to be
hash-compared — these use exact string/integer math only.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType, StringType

from ksql_spark.registry import query
from ksql_spark.tables import ensure_views, load


@pandas_udf(StringType())
def norm_name(s: pd.Series) -> pd.Series:
    """Scalar Pandas UDF (Arrow batches): canonicalize a name."""
    return s.str.strip().str.lower().str.replace("customer#", "cust:", regex=False)


@pandas_udf(LongType())
def int_qty_sum(q: pd.Series) -> int:
    """Grouped-aggregate Pandas UDF: exact integer sum (order-insensitive)."""
    return int(q.astype("int64").sum())


@query(
    "udf_scalar",
    oracle="""
    SELECT c_custkey,
           replace(lower(trim(c_name)), 'customer#', 'cust:') AS norm
    FROM customer
    """,
    ref="SURVEY §2 J1 (scalar UDF; AlaSQL alasql.fn analog → @pandas_udf)",
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select("c_custkey", norm_name("c_name").alias("norm"))


@query(
    "udaf_grouped",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_total
    FROM lineitem GROUP BY l_returnflag
    """,
    ref="SURVEY §2 J2 (custom aggregate → pandas_udf grouped agg; integer math "
    "so partition order cannot change the result)",
)
def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(int_qty_sum("l_quantity").alias("qty_total"))


@query(
    "udtf_flatmap",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS word
    FROM documents WHERE doc_id < 50
    """,
    ref="SURVEY §2 J3 (table function / flat-map → mapInPandas; one row in, "
    "N rows out)",
)
def udtf_flatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat-map via mapInPandas: doc → one row per word. (posexplode would be
    the built-in route — this exercises the Python UDTF-style surface.)"""
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 50)

    def explode_words(batches):
        for pdf in batches:
            words = pdf["text"].str.split(" ")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].repeat(words.str.len()),
                    "word": [w for lst in words for w in lst],
                }
            )

    return d.select("doc_id", "text").mapInPandas(explode_words, "doc_id long, word string")


@query(
    "udtf_native",
    oracle="""
    SELECT doc_id,
           CAST(i - 1 AS INT) AS pos,
           string_split(text, ' ')[i] AS word
    FROM (SELECT doc_id, text,
                 unnest(range(1, len(string_split(text, ' ')) + 1)) AS i
          FROM documents WHERE doc_id < 50)
    """,
    ref="SURVEY §2 J3 (NATIVE Spark 4 Python UDTF — @udtf class with eval(), "
    "registered and callable from SQL via LATERAL; the modern surface over "
    "the mapInPandas route of udtf_flatmap)",
)
def udtf_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's first-class Python UDTF: a class with eval() yielding rows,
    registered in the session catalog and invoked from SQL with LATERAL —
    one (pos, word) row per token.

    Scale shape: the UDTF executes per-row in the Python worker over Arrow
    batches, pipelined with the scan (no shuffle). A pure-performance
    implementation would be posexplode(split(...)) — fully JVM-side; this
    entry exists to pin the extension SURFACE the reference's AlaSQL
    user-functions offered, on the engine-native API."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="pos int, word string")
    class SplitWords:
        def eval(self, text: str):
            if text is None:
                return
            for i, w in enumerate(text.split(" ")):
                yield i, w

    spark.udtf.register("split_words", SplitWords)
    ensure_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT d.doc_id, s.pos, s.word
        FROM documents d, LATERAL split_words(d.text) s
        WHERE d.doc_id < 50
        """
    )


@query(
    "udf_sql_function",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(trunc(l_extendedprice * (1.0 - l_discount)
                * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0
               AS revenue
    FROM lineitem GROUP BY l_returnflag
    """,
    ref="SURVEY §2 J1/J2 [EXT] (SQL-language UDF: CREATE FUNCTION ... "
    "RETURNS ... RETURN expr — the declarative user-function surface "
    "AlaSQL exposed as alasql.fn, here as a catalog function Catalyst "
    "INLINES into the plan, so unlike a Python UDF it costs nothing)",
)
def udf_sql_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A SQL-language scalar function (quantized discounted price) created
    in the catalog and used inside an aggregate. Catalyst inlines the body
    — the plan is identical to writing the expression inline (whole-stage
    codegen, pushdown intact), which is why SQL UDFs are the FIRST choice
    for user logic at 100 TB; Python UDFs are for logic SQL cannot say."""
    ensure_views(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION q_disc_price(p DOUBLE, d DOUBLE)
        RETURNS BIGINT RETURN CAST(p * (1.0 - d) * 1000000 + 0.5 AS BIGINT)
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(SUM(q_disc_price(l_extendedprice, l_discount)) AS DOUBLE)
               / 1000000.0 AS revenue
        FROM lineitem GROUP BY l_returnflag
        """
    )


@query(
    "param_query",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    WHERE o_totalprice > 200000.0
    GROUP BY o_orderpriority
    """,
    ref="SURVEY §2 B [EXT] (parameterized SQL: spark.sql(query, args=...) "
    "named-parameter binding — the injection-safe templating surface the "
    "reference's string-concatenated REPL queries lacked; parameters bind "
    "as literals so pushdown/pruning see constants)",
)
def param_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL: the threshold arrives via args binding, not
    string interpolation. The bound value is a LITERAL to the optimizer,
    so predicate pushdown and partition pruning work exactly as if it were
    inlined — and the text is injection-safe for REPL/HTTP use."""
    ensure_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n
        FROM orders
        WHERE o_totalprice > :threshold
        GROUP BY o_orderpriority
        """,
        args={"threshold": 200000.0},
    )
