"""Driver contract for the spark-graft builder (PySpark target).

Thin re-export of ksql_spark.registry: every operator registers its PySpark
builder and its DuckDB oracle SQL side by side (ksql_spark/queries/*), so the
two surfaces cannot drift apart. See SURVEY.md §2 for the inventory.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from ksql_spark.registry import all_specs  # noqa: E402


def _ensure_confs(spark: SparkSession) -> None:
    """Confs the engine depends on; safe to set at runtime on an existing session."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # events.parquet stores TIMESTAMP(NANOS); Spark reads it only via this flag
    # (ksql_spark.tables.load converts the raw int64 back to timestamp_ntz).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (revenue by nation, 3-way join top-10) on sf0.001."""
    _ensure_confs(spark)
    spec = all_specs()["q_join3_topk"]
    return spec.builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, spec in all_specs().items():
        def make(b):
            def run(spark: SparkSession, sf_dir: str) -> DataFrame:
                _ensure_confs(spark)
                return b(spark, sf_dir)
            return run
        out[name] = make(spec.builder)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key (omitted → rows-only check)."""
    return {name: spec.oracle for name, spec in all_specs().items() if spec.oracle}
