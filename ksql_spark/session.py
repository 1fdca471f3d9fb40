"""SparkSession factory.

Scale posture (SURVEY.md §4.3 "100 TB posture"): AQE on (runtime coalescing,
skew-join splitting, dynamic broadcast), Arrow on (vectorized Python interop),
ANSI semantics left at Spark defaults. `shuffle_partitions` defaults small for
the local test scale; on a real cluster callers pass cores*3 or rely on AQE
coalescing from a high initial value.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ksql-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("KSQL_SPARK_SHUFFLE_PARTITIONS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python DataSource pushFilters stays OFF: Spark 4.1 caches the
        # mutated reader per relation, so a pushed filter on a shared temp
        # view silently under-returns every later query on that view
        # (verified; see sources/k8s.py note). Selector options cover the
        # k8s server-side-filter use case safely.
        .config("spark.sql.python.filterPushdown.enabled", "false")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet stores TIMESTAMP(NANOS); Spark only reads micros —
        # read the raw int64 and convert in tables.load (driver data contract).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("KSQL_SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    # probe/ops escape hatch: KSQL_SPARK_EXTRA_CONF="k1=v1;k2=v2" (e.g. a
    # faster spark.cleaner.periodicGC.interval so long iterative jobs on a
    # small scratch disk reclaim dereferenced shuffle files promptly)
    extra = os.environ.get("KSQL_SPARK_EXTRA_CONF", "")
    for kv in filter(None, (p.strip() for p in extra.split(";"))):
        k, _, v = kv.partition("=")
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    # 100 TB posture seam (operators/scale.py pin()): with
    # spark.ksql_spark.reliablePin=true AND a checkpoint dir, iterative
    # working-set pins become RELIABLE checkpoints (written to this dir,
    # no JVM block residency) instead of localCheckpoint's
    # MEMORY_AND_DISK blocks — the lever that moves adjacency-sized
    # state out of the driver JVM on a single box.
    ckpt = os.environ.get("KSQL_SPARK_CHECKPOINT_DIR", "")
    if ckpt:
        spark.sparkContext.setCheckpointDir(ckpt)
    return spark
