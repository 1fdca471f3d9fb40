"""Experiment 3: build-path + reader confs.

 floor      — fresh spark.range(16).count() per run (pure job overhead)
 build_tmpl — builder() call only (template spark.sql with DataFrame args)
 build_view — spark.sql on pre-registered temp views, call only
 g_tmpl     — q_groupby via template + noop (current)
 g_view     — q_groupby via views-SQL + noop
 g_view_big — same but columnarReaderBatchSize=16384 session clone? (conf is
              static per session for reader batch — set via runtime conf works
              for parquet batch size? measure anyway)
 f_view     — q_filter_count via views-SQL + noop
"""
from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from ksql_spark.registry import all_specs
from ksql_spark.session import get_spark
from ksql_spark.tables import register_views

SF = "/root/testdata/sf0.1"
REPS = 7

GSQL = """SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST((l_quantity) * 1000000.0 + 0.5 AS BIGINT)) AS DOUBLE)/1000000.0 AS sum_qty,
       CAST(SUM(CAST((l_extendedprice) * 1000000.0 + 0.5 AS BIGINT)) AS DOUBLE)/1000000.0 AS sum_base_price,
       CAST(SUM(CAST((l_extendedprice * (1 - l_discount)) * 1000000.0 + 0.5 AS BIGINT)) AS DOUBLE)/1000000.0 AS sum_disc_price,
       (CAST(SUM(CAST((l_quantity) * 1000000.0 + 0.5 AS BIGINT)) AS DOUBLE)/1000000.0) / COUNT(l_quantity) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus"""
FSQL = """SELECT COUNT(*) AS cnt FROM lineitem
WHERE l_quantity > 25 AND l_discount BETWEEN 0.02 AND 0.06"""


def main() -> None:
    spark = get_spark(app_name="bench-exp3", shuffle_partitions=1)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 30))
    spark.conf.set("spark.sql.files.openCostInBytes", str(1 << 30))
    register_views(spark, SF)
    specs = all_specs()

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    cases = {
        "floor": lambda: spark.range(16).count(),
        "build_tmpl": lambda: specs["q_groupby_agg"].builder(spark, SF),
        "build_view": lambda: spark.sql(GSQL),
        "g_tmpl": lambda: noop(specs["q_groupby_agg"].builder(spark, SF)),
        "g_view": lambda: noop(spark.sql(GSQL)),
        "f_tmpl": lambda: noop(specs["q_filter_count"].builder(spark, SF)),
        "f_view": lambda: noop(spark.sql(FSQL)),
    }
    for fn in cases.values():
        fn()
    samples = {k: [] for k in cases}
    for _ in range(REPS):
        for k, fn in cases.items():
            t0 = time.perf_counter()
            fn()
            samples[k].append(time.perf_counter() - t0)
    print(json.dumps({k: round(statistics.median(v) * 1000, 1)
                      for k, v in samples.items()}, indent=1))

    # reader-batch-size A/B needs a fresh session (static conf); quick check
    spark.stop()
    from pyspark.sql import SparkSession
    spark2 = (SparkSession.builder.master("local[32]").appName("exp3b")
              .config("spark.sql.shuffle.partitions", "1")
              .config("spark.sql.adaptive.enabled", "false")
              .config("spark.sql.parquet.columnarReaderBatchSize", "16384")
              .config("spark.sql.columnVector.offheap.enabled", "true")
              .config("spark.memory.offHeap.enabled", "true")
              .config("spark.memory.offHeap.size", "4g")
              .config("spark.sql.files.maxPartitionBytes", str(1 << 30))
              .config("spark.sql.files.openCostInBytes", str(1 << 30))
              .config("spark.ui.enabled", "false")
              .getOrCreate())
    spark2.sparkContext.setLogLevel("ERROR")
    spark2.read.parquet(f"{SF}/lineitem.parquet").createOrReplaceTempView("lineitem")
    for _ in range(2):
        noop(spark2.sql(GSQL))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        noop(spark2.sql(GSQL))
        ts.append(time.perf_counter() - t0)
    print(json.dumps({"g_view_bigbatch_offheap": round(statistics.median(ts) * 1000, 1)}))
    spark2.stop()


if __name__ == "__main__":
    main()
