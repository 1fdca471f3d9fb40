"""Experiment 7: q_join3_topk variants under the final bench profile.

Theories to test (fresh run each time, interleaved):
 v_cur    — current: broadcast hint nation, planner broadcasts orders+customer
 v_sp4    — same but final agg at sp=4 (parallel probe? no—probe is 1 task;
            tests whether partial-agg out-partitioning matters)
 v_nobc_o — forbid the orders broadcast (shuffle join li⋈o at sp4),
            broadcast c+n only
 v_presum — pre-aggregate lineitem per orderkey FIRST (600k→150k in the scan
            task's partial agg), then broadcast-join orders/customer/nation
            onto the 150k aggregate. Same result, radically smaller join
            input. Semantically exact for revenue/count.
 v_presum_sql — presum expressed in one SQL (planner may merge stages)
"""
from __future__ import annotations

import json
import statistics
import time

from pyspark.sql import SparkSession

SF = "/root/testdata/sf0.1"
REPS = 7

DSUM = ("CAST(SUM(CAST((l_extendedprice * (1 - l_discount)) * 1000000.0 + 0.5"
        " AS BIGINT)) AS DOUBLE) / 1000000.0")

V_CUR = f"""
SELECT /*+ BROADCAST(nation) */ n_name, {DSUM} AS revenue, COUNT(*) AS line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY revenue DESC, n_name LIMIT 10"""

V_NOBC_O = f"""
SELECT /*+ BROADCAST(nation), BROADCAST(customer), SHUFFLE_HASH(orders) */
       n_name, {DSUM} AS revenue, COUNT(*) AS line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY revenue DESC, n_name LIMIT 10"""

V_PRESUM = f"""
WITH lag AS (
  SELECT l_orderkey,
         SUM(CAST((l_extendedprice * (1 - l_discount)) * 1000000.0 + 0.5
             AS BIGINT)) AS qrev,
         COUNT(*) AS lc
  FROM lineitem GROUP BY l_orderkey
)
SELECT /*+ BROADCAST(nation), BROADCAST(customer) */ n_name,
       CAST(SUM(qrev) AS DOUBLE) / 1000000.0 AS revenue,
       SUM(lc) AS line_count
FROM lag JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY revenue DESC, n_name LIMIT 10"""


def main() -> None:
    spark = (SparkSession.builder.master("local[32]").appName("exp7")
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
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("lineitem", "orders", "customer", "nation"):
        spark.read.parquet(f"{SF}/{t}.parquet").createOrReplaceTempView(t)

    def run(sql, sp=1):
        spark.conf.set("spark.sql.shuffle.partitions", str(sp))
        spark.sql(sql).write.mode("overwrite").format("noop").save()
        spark.conf.set("spark.sql.shuffle.partitions", "1")

    cases = {
        "v_cur": lambda: run(V_CUR, 1),
        "v_sp4": lambda: run(V_CUR, 4),
        "v_nobc_o": lambda: run(V_NOBC_O, 4),
        "v_presum": lambda: run(V_PRESUM, 4),
        "v_presum_sp1": lambda: run(V_PRESUM, 1),
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
    spark.stop()


if __name__ == "__main__":
    main()
