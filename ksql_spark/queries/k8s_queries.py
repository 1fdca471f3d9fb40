"""SURVEY.md §2.A — k8s source scan as a driver-checkable query entry.

scan_k8s_pods reads the fixture snapshot through the real `k8s` Python
DataSource path (rows-only check: no DuckDB oracle for a custom source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ksql_spark.registry import query


@query(
    "scan_k8s_pods",
    oracle=None,  # custom source; driver does the rows-only check
    ref="SURVEY §2 A1; reference ksql.js:190-221 (pods list -> table with "
    "uid/node stamps)",
)
def scan_k8s_pods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pods snapshot via spark.read.format('k8s') (fixture mode), projecting
    the reference's stamped scalars + a nested field."""
    from ksql_spark.sources.k8s import load_k8s

    pods = load_k8s(spark, "pods")
    return pods.select(
        "uid",
        "node",
        F.col("metadata.name").alias("pod_name"),
        F.col("status.phase").alias("phase"),
        F.size("spec.containers").alias("n_containers"),
    )
