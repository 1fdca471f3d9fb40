"""Experiment 5: compression-off A/B for broadcast/shuffle-heavy queries.

Two child sessions (can't flip static confs in-place): base = exp4 confs;
nocomp = base + broadcast/shuffle compression off. Run the same four queries
in each, interleaved within each session.
"""
from __future__ import annotations

import json
import statistics
import sys
import time

from pyspark.sql import SparkSession

SF = "/root/testdata/sf0.1"
REPS = 7

QUERIES = {
    "join3": ("""SELECT /*+ BROADCAST(n), BROADCAST(c), BROADCAST(o) */ n_name,
                      SUM(l_extendedprice*(1-l_discount)) rev, COUNT(*) lc
               FROM lineitem JOIN orders o ON l_orderkey=o_orderkey
               JOIN customer c ON o_custkey=c_custkey
               JOIN nation n ON c_nationkey=n_nationkey
               GROUP BY n_name ORDER BY rev DESC, n_name LIMIT 10""", 1),
    "window": ("""SELECT c_custkey, o_orderkey, o_totalprice, rnk FROM (
                 SELECT c_custkey, o_orderkey, o_totalprice,
                        ROW_NUMBER() OVER (PARTITION BY c_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) rnk
                 FROM orders JOIN customer ON o_custkey=c_custkey) WHERE rnk<=3""", 4),
    "events": ("""SELECT date_trunc('hour', ts) h, user_id, COUNT(*) ne,
                        SUM(value) sv FROM events GROUP BY h, user_id""", 4),
    "groupby": ("""SELECT l_returnflag, l_linestatus, SUM(l_quantity) a,
                        SUM(l_extendedprice) b, SUM(l_extendedprice*(1-l_discount)) c,
                        AVG(l_quantity) d, COUNT(*) e
                 FROM lineitem GROUP BY l_returnflag, l_linestatus""", 1),
}


def bench_session(extra: dict) -> dict:
    b = (SparkSession.builder.master("local[32]").appName("exp5")
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
         .config("spark.ui.enabled", "false"))
    for k, v in extra.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("lineitem", "orders", "customer", "nation", "events"):
        spark.read.parquet(f"{SF}/{t}.parquet").createOrReplaceTempView(t)

    def run(sql, sp):
        spark.conf.set("spark.sql.shuffle.partitions", str(sp))
        spark.sql(sql).write.mode("overwrite").format("noop").save()
        spark.conf.set("spark.sql.shuffle.partitions", "1")

    for sql, sp in QUERIES.values():
        run(sql, sp)
    samples = {k: [] for k in QUERIES}
    for _ in range(REPS):
        for k, (sql, sp) in QUERIES.items():
            t0 = time.perf_counter()
            run(sql, sp)
            samples[k].append(time.perf_counter() - t0)
    out = {k: round(statistics.median(v) * 1000, 1) for k, v in samples.items()}
    spark.stop()
    return out


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "base"
    if which == "base":
        print(json.dumps({"base": bench_session({})}))
    else:
        print(json.dumps({"nocomp": bench_session({
            "spark.broadcast.compress": "false",
            "spark.shuffle.compress": "false",
            "spark.shuffle.spill.compress": "false",
            "spark.rdd.compress": "false",
        })}))


if __name__ == "__main__":
    main()
