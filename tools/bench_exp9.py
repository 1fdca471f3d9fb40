"""Experiment 9 (round 5): parallelize join3's single-task probe.

The sf0.1 parquet is ONE row group, so the probe stage (600k-row lineitem
scan + 3 BHJ probes + partial agg) runs in ONE task. A REPARTITION of the
scan costs one extra 600k-row exchange but lets the probe+agg run 8-way.
Also sweeps the same trick on q_groupby_agg (scan+agg single-task today).
"""
from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import SparkSession

from ksql_spark.queries.bench import _sp_dsum, ensure_views

SF = "/root/testdata/sf0.1"
REPS = 9

CUR = f"""
    SELECT /*+ BROADCAST(nation) */ n_name,
           {_sp_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS line_count
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    LIMIT 10
"""


def repart_join(n: int) -> str:
    return f"""
    SELECT /*+ BROADCAST(nation) */ n_name,
           {_sp_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS line_count
    FROM (SELECT /*+ REPARTITION({n}) */ l_orderkey, l_extendedprice, l_discount
          FROM lineitem) l
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    LIMIT 10
"""

GB_CUR = f"""
    SELECT l_returnflag, l_linestatus,
           {_sp_dsum('l_quantity')} AS sum_qty,
           {_sp_dsum('l_extendedprice')} AS sum_base_price,
           {_sp_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
"""

GB_REP = f"""
    SELECT l_returnflag, l_linestatus,
           {_sp_dsum('l_quantity')} AS sum_qty,
           {_sp_dsum('l_extendedprice')} AS sum_base_price,
           {_sp_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           COUNT(*) AS count_order
    FROM (SELECT /*+ REPARTITION(8) */ l_returnflag, l_linestatus, l_quantity,
                 l_extendedprice, l_discount FROM lineitem)
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
"""


def main() -> None:
    spark = (SparkSession.builder.master("local[32]").appName("exp9")
             .config("spark.sql.shuffle.partitions", "1")
             .config("spark.sql.adaptive.enabled", "false")
             .config("spark.sql.parquet.columnarReaderBatchSize", "16384")
             .config("spark.sql.columnVector.offheap.enabled", "true")
             .config("spark.memory.offHeap.enabled", "true")
             .config("spark.memory.offHeap.size", "4g")
             .config("spark.sql.files.maxPartitionBytes", str(1 << 30))
             .config("spark.sql.files.openCostInBytes", str(1 << 30))
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.legacy.parquet.nanosAsLong", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    ensure_views(spark, SF)
    variants = {
        "j_cur": CUR, "j_rep4": repart_join(4), "j_rep8": repart_join(8),
        "j_rep16": repart_join(16),
        "gb_cur": GB_CUR, "gb_rep8": GB_REP,
    }

    def run(sql: str) -> None:
        spark.sql(sql).write.mode("overwrite").format("noop").save()

    for name, q in variants.items():
        run(q)
    samples = {n: [] for n in variants}
    for _ in range(REPS):
        for name, q in variants.items():
            t0 = time.perf_counter()
            run(q)
            samples[name].append(time.perf_counter() - t0)
    for name, ts in samples.items():
        print(f"{name}: median {statistics.median(ts)*1000:.0f} ms  "
              f"min {min(ts)*1000:.0f}  all {[round(t*1000) for t in ts]}")


if __name__ == "__main__":
    main()
