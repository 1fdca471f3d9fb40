"""Experiment 10 (round 6): q_rollup levers.

 a) current: GROUP BY ROLLUP — Expand x3 over 150k rows, then hash agg
 b) two-phase: finest-level agg (15 rows) first, then union the rollup
    levels from the tiny aggregate — no Expand over the fact rows
 c) current at shuffle_partitions 4 (does the expand path parallelize?)
All with bench.py's conf profile, interleaved, median of 7.
"""
from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import SparkSession, functions as F

SF = "/root/testdata/sf0.1"
REPS = 7


def main() -> None:
    spark = (
        SparkSession.builder.appName("bench-exp10")
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "1")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.parquet.columnarReaderBatchSize", "16384")
        .config("spark.sql.columnVector.offheap.enabled", "true")
        .config("spark.memory.offHeap.enabled", "true")
        .config("spark.memory.offHeap.size", "4g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 30))
    spark.conf.set("spark.sql.files.openCostInBytes", str(1 << 30))
    spark.read.parquet(f"{SF}/orders.parquet").createOrReplaceTempView("orders")

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    def a():
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        noop(spark.sql(
            "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt "
            "FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)"
        ))

    def b():
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        base = spark.sql(
            "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt "
            "FROM orders GROUP BY o_orderstatus, o_orderpriority"
        )
        roll = base.rollup("o_orderstatus", "o_orderpriority").agg(
            F.sum("cnt").alias("cnt")
        )
        noop(roll)

    def c():
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        noop(spark.sql(
            "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt "
            "FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)"
        ))

    cases = {"a_rollup_sp1": a, "b_twophase": b, "c_rollup_sp4": c}
    for f in cases.values():  # warm
        f()
    samples = {k: [] for k in cases}
    for _ in range(REPS):
        for k, f in cases.items():
            t0 = time.perf_counter()
            f()
            samples[k].append(time.perf_counter() - t0)
    for k, ts in samples.items():
        print(k, round(statistics.median(ts), 4), [round(t, 3) for t in ts])
    spark.stop()


if __name__ == "__main__":
    main()
