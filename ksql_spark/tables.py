"""Loaders for the driver test tables (TESTDATA.md / FIXTURES.md §1).

Analog of the reference's table ingest (`ksql.js:190-247` loads K8s lists into
in-memory tables); here the source is parquet and the "table" is a DataFrame.
Column pruning + predicate pushdown reach the parquet scan for free because we
return the raw scan and let callers select/filter declaratively.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at ANY scale factor (region and
#: nation are fixed-size: 5 / 25 rows even at 100 TB TPC-H scale).
ALWAYS_BROADCAST = frozenset({"region", "nation"})


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


#: Analysis cache: (session, dir, table) → DataFrame. Caches file listing +
#: footer schema resolution (~50ms per read), NOT data — scans still hit parquet.
_LOAD_CACHE: dict = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table; normalizes events.ts (nanos int64 → timestamp_ntz)."""
    key = (spark, sf_dir, name)
    cached = _LOAD_CACHE.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as int64 via nanosAsLong; truncate to micros
        # exactly like DuckDB's ns→µs truncation so oracle values match bitwise.
        df = df.withColumn("ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
    if len(_LOAD_CACHE) > 256:
        _LOAD_CACHE.clear()
    _LOAD_CACHE[key] = df
    return df


#: session → sf_dir whose tables the session's temp views currently point at.
_VIEWS_DIR: dict = {}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register all driver tables as temp views (mirrors ksql.js:128-135 table setup)."""
    sf_dir = sf_dir or default_sf_dir()
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
    _VIEWS_DIR[spark] = sf_dir


def ensure_views(spark: SparkSession, sf_dir: str) -> None:
    """register_views, skipped when this session's views already point at
    sf_dir. Safe because spark.sql resolves a view at ANALYSIS time — a
    DataFrame built after ensure_views keeps its plan even if the views are
    re-pointed later. Callers that bypass register_views and re-register
    these view names directly would go stale — register_views is the single
    registration path for the driver tables."""
    if _VIEWS_DIR.get(spark) != sf_dir:
        register_views(spark, sf_dir)
