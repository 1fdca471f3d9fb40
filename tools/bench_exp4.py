"""Experiment 4: floor decomposition + join decomposition, all under the
candidate reader confs (offheap vectors + 16k batch).

floors:
  r32_count   — spark.range(16).count()            (32 slices + shuffle)
  r1_count    — spark.range(16,...,numSlices=1).count()
  r1_noop     — fresh range(16,1) + noop save      (1 stage, 1 task)
  prebuilt_noop — SAME range df noop repeatedly    (no shuffle => honest)
join parts:
  j_scan_li   — sum over the 3 lineitem join cols
  j_li_o      — lineitem⋈orders broadcast, count-agg only
  j_li_o_sh   — lineitem⋈orders shuffle-hash sp8
  j_full      — full q_join3 (broadcast all) under new confs
  j_full_pre  — prejoin o⋈c⋈n then single broadcast into lineitem
others under new confs:
  w_sp4, e_sp4, rollup, filter
"""
from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import SparkSession

SF = "/root/testdata/sf0.1"
REPS = 7


def main() -> None:
    spark = (SparkSession.builder.master("local[32]").appName("exp4")
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
    for t in ("lineitem", "orders", "customer", "nation", "events"):
        spark.read.parquet(f"{SF}/{t}.parquet").createOrReplaceTempView(t)

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    def sp(n, sql):
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
        noop(spark.sql(sql))
        spark.conf.set("spark.sql.shuffle.partitions", "1")

    rng = spark.range(16, 32, 1, 1)
    noop(rng)

    cases = {
        "r32_count": lambda: spark.range(16).count(),
        "r1_count": lambda: spark.range(16, 32, 1, 1).count(),
        "r1_noop": lambda: noop(spark.range(16, 32, 1, 1)),
        "prebuilt_noop": lambda: noop(rng),
        "j_scan_li": lambda: noop(spark.sql(
            "SELECT SUM(l_extendedprice*(1-l_discount)), SUM(l_orderkey) FROM lineitem")),
        "j_li_o": lambda: noop(spark.sql(
            """SELECT /*+ BROADCAST(o) */ COUNT(*) c, SUM(l_extendedprice) s
               FROM lineitem JOIN orders o ON l_orderkey=o_orderkey""")),
        "j_li_o_sh": lambda: sp(8,
            """SELECT /*+ SHUFFLE_HASH(o) */ COUNT(*) c, SUM(l_extendedprice) s
               FROM lineitem JOIN orders o ON l_orderkey=o_orderkey"""),
        "j_full": lambda: noop(spark.sql(
            """SELECT /*+ BROADCAST(n), BROADCAST(c), BROADCAST(o) */ n_name,
                      SUM(l_extendedprice*(1-l_discount)) rev, COUNT(*) lc
               FROM lineitem JOIN orders o ON l_orderkey=o_orderkey
               JOIN customer c ON o_custkey=c_custkey
               JOIN nation n ON c_nationkey=n_nationkey
               GROUP BY n_name ORDER BY rev DESC, n_name LIMIT 10""")),
        "j_full_pre": lambda: noop(spark.sql(
            """WITH dim AS (SELECT /*+ BROADCAST(c), BROADCAST(n) */
                      o_orderkey, n_name
                 FROM orders JOIN customer c ON o_custkey=c_custkey
                 JOIN nation n ON c_nationkey=n_nationkey)
               SELECT /*+ BROADCAST(dim) */ n_name,
                      SUM(l_extendedprice*(1-l_discount)) rev, COUNT(*) lc
               FROM lineitem JOIN dim ON l_orderkey=o_orderkey
               GROUP BY n_name ORDER BY rev DESC, n_name LIMIT 10""")),
        "w_sp4": lambda: sp(4,
            """SELECT c_custkey, o_orderkey, o_totalprice, rnk FROM (
                 SELECT c_custkey, o_orderkey, o_totalprice,
                        ROW_NUMBER() OVER (PARTITION BY c_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) rnk
                 FROM orders JOIN customer ON o_custkey=c_custkey) WHERE rnk<=3"""),
        "e_sp4": lambda: sp(4,
            """SELECT date_trunc('hour', ts) h,
                      user_id, COUNT(*) ne, SUM(value) sv
               FROM events GROUP BY h, user_id"""),
        "rollup": lambda: noop(spark.sql(
            """SELECT o_orderstatus, o_orderpriority, COUNT(*) cnt
               FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""")),
        "filter": lambda: noop(spark.sql(
            """SELECT COUNT(*) cnt FROM lineitem
               WHERE l_quantity > 25 AND l_discount BETWEEN 0.02 AND 0.06""")),
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
