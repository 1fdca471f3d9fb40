"""Experiment 8 (round 5): q_join3_topk broadcast-chain variants.

Round-4 decomposition put join3's floor at ~450 ms: lineitem⋈orders 242 ms
plus ~200 ms of broadcast-build chain (customer, nation) on the critical
path. Variants probed here, interleaved in ONE process:

  cur  — shipped SQL: l ⋈ o ⋈ c ⋈ n, nation hinted (left-deep; three
         broadcast builds).
  bushy — l ⋈ o ⋈ (c ⋈ n): the dim pre-join is its own broadcast subtree,
         collapsing two probe-side builds into one (and the c⋈n build's
         input is ~15k rows).
  bushy2 — (l ⋈ o) probed by ONE pre-joined broadcast of (c ⋈ n) built via
         the same SQL but with an explicit BROADCAST hint on the subquery
         alias (guards against the planner un-nesting the subquery).
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

BUSHY = f"""
    SELECT n_name,
           {_sp_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS line_count
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN (
        SELECT /*+ BROADCAST(nation) */ c_custkey, n_name
        FROM customer JOIN nation ON c_nationkey = n_nationkey
    ) cn ON o_custkey = cn.c_custkey
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    LIMIT 10
"""

BUSHY2 = f"""
    SELECT /*+ BROADCAST(cn) */ n_name,
           {_sp_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS line_count
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN (
        SELECT /*+ BROADCAST(nation) */ c_custkey, n_name
        FROM customer JOIN nation ON c_nationkey = n_nationkey
    ) cn ON o_custkey = cn.c_custkey
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    LIMIT 10
"""


def main() -> None:
    spark = (SparkSession.builder.master("local[32]").appName("exp8")
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
    variants = {"cur": CUR, "bushy": BUSHY, "bushy2": BUSHY2}

    def run(sql: str) -> None:
        spark.sql(sql).write.mode("overwrite").format("noop").save()

    for name, q in variants.items():
        run(q)  # warm
        plan = spark.sql(q)._jdf.queryExecution().executedPlan().toString()
        print(name, "BHJ:", plan.count("BroadcastHashJoin"),
              "SMJ:", plan.count("SortMergeJoin"),
              "Exch:", plan.count("Exchange hashpartitioning"))
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
