"""Round-7 bench experiment: materialization path + ANSI-mode A/B.

Two hypotheses from the round-7 phase split (tools/bench_profile.py):

1. The noop `df.write.save()` materialization re-runs optimization +
   physical planning for the WriteToDataSourceV2 wrapper on every timed
   run (execN - rddN gap of 20-45 ms/query), so each run pays planning
   twice (builder analysis + write-command planning). A fresh-built
   DataFrame materialized via `qe.toRdd().count()` plans ONCE and still
   executes every stage from scratch (fresh RDD lineage -> fresh shuffle
   ids -> no cross-run reuse; verified: shuffle write bytes are nonzero on
   every run). Both forms are full executions of a freshly built query —
   the A/B is write-wrapper overhead, not work elision.

2. Spark 4 defaults spark.sql.ansi.enabled=true, which compiles overflow/
   cast checks into every arithmetic op and CAST in the codegen'd hot
   loops (dsum does 1 multiply + 1 add + 1 double->long cast PER ROW per
   aggregate). DuckDB's baseline numbers come from its own default
   posture. ANSI off is an engine-posture knob; results are identical at
   these magnitudes (asserted below).

Protocol: interleaved variants, median of N, one process, idle host.
"""
from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import SparkSession

from ksql_spark.registry import all_specs

SF_DIR = "/root/testdata/sf0.1"
NAMES = ["q_filter_count", "q_groupby_agg", "q_join3_topk",
         "q_window", "q_rollup", "q_events_session"]
SP = {"q_filter_count": 1, "q_groupby_agg": 1, "q_join3_topk": 1,
      "q_window": 4, "q_rollup": 1, "q_events_session": 4}
REPS = 9


def bench_session() -> SparkSession:
    return (
        SparkSession.builder.appName("bench-exp11")
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "1")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.parquet.columnarReaderBatchSize", "16384")
        .config("spark.sql.columnVector.offheap.enabled", "true")
        .config("spark.memory.offHeap.enabled", "true")
        .config("spark.memory.offHeap.size", "4g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def main() -> None:
    spark = bench_session()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 30))
    spark.conf.set("spark.sql.files.openCostInBytes", str(1 << 30))
    specs = all_specs()

    def run(name: str, ansi: bool, mat: str) -> float:
        spark.conf.set("spark.sql.shuffle.partitions", str(SP[name]))
        spark.conf.set("spark.sql.ansi.enabled", str(ansi).lower())
        t0 = time.perf_counter()
        df = specs[name].builder(spark, SF_DIR)
        if mat == "noop":
            df.write.mode("overwrite").format("noop").save()
        else:  # fresh plan, one planning pass, full execution
            df._jdf.queryExecution().toRdd().count()
        return time.perf_counter() - t0

    variants = [("noop/ansi", True, "noop"), ("rdd/ansi", True, "rdd"),
                ("noop/noansi", False, "noop"), ("rdd/noansi", False, "rdd")]

    # result-identity check: ANSI off must not change any query's rows
    for n in NAMES:
        spark.conf.set("spark.sql.ansi.enabled", "true")
        a = specs[n].builder(spark, SF_DIR).collect()
        spark.conf.set("spark.sql.ansi.enabled", "false")
        b = specs[n].builder(spark, SF_DIR).collect()
        key = lambda r: tuple((v is None, v) for v in r)  # NULL-safe sort
        assert sorted(map(tuple, a), key=key) == sorted(map(tuple, b), key=key), n
    print("ANSI on/off result identity: OK", flush=True)

    # warmup both materializations, both modes
    for _ in range(2):
        for n in NAMES:
            for _, ansi, mat in variants:
                run(n, ansi, mat)

    samples = {(n, v): [] for n in NAMES for v, _, _ in variants}
    for _ in range(REPS):
        for n in NAMES:
            for v, ansi, mat in variants:
                samples[(n, v)].append(run(n, ansi, mat))

    print(f"{'query':<18}" + "".join(f"{v:>14}" for v, _, _ in variants))
    tot = {v: 0.0 for v, _, _ in variants}
    for n in NAMES:
        row = []
        for v, _, _ in variants:
            m = statistics.median(samples[(n, v)])
            tot[v] += m
            row.append(f"{m*1000:13.1f}")
        print(f"{n:<18}" + "".join(row))
    print(f"{'TOTAL':<18}" + "".join(f"{tot[v]*1000:13.1f}" for v, _, _ in variants))
    spark.stop()


if __name__ == "__main__":
    main()
