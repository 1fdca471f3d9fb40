"""SURVEY.md §2.A — k8s source scan as a driver-checkable query entry.

scan_k8s_pods reads the fixture snapshot through the real `k8s` Python
DataSource path. Its oracle is a GOLDEN-FILE check (VERDICT r6 item 4):
DuckDB reads the SAME committed fixture JSON with read_json and projects
the same fields — so the custom-source pipeline (registration, schema,
nested-field mapping, container sizing) is hash-compared against an
independent engine's parse of the identical bytes, upgrading the entry
from rows-only to oracle-exact.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

from ksql_spark.registry import query

#: The committed deterministic fixture (ksql_spark/sources/fixtures.py
#: rewrites it idempotently; content is a pure function of the builders).
_PODS_JSON = (
    Path(__file__).resolve().parents[1] / "sources" / "k8s_fixtures" / "pods.json"
)


@query(
    "scan_k8s_pods",
    oracle=f"""
    SELECT it.metadata.uid AS uid,
           it.spec.nodeName AS node,
           it.metadata.name AS pod_name,
           it.status.phase AS phase,
           CAST(len(it.spec.containers) AS INTEGER) AS n_containers
    FROM (SELECT unnest(items) AS it
          FROM read_json('{_PODS_JSON.as_posix()}'))
    """,
    ref="SURVEY §2 A1; reference ksql.js:190-221 (pods list -> table with "
    "uid/node stamps)",
)
def scan_k8s_pods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pods snapshot via spark.read.format('k8s') (fixture mode), projecting
    the reference's stamped scalars + a nested field."""
    from ksql_spark.sources.k8s import load_k8s
    from ksql_spark.sources.fixtures import ensure_fixtures

    ensure_fixtures()  # the oracle reads the same files; keep them current
    pods = load_k8s(spark, "pods")
    return pods.select(
        "uid",
        "node",
        F.col("metadata.name").alias("pod_name"),
        F.col("status.phase").alias("phase"),
        F.size("spec.containers").alias("n_containers"),
    )
