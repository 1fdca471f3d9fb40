"""Experiment 6: noop-save vs toRdd-count materialization, bench-identical
conditions (template builders, dsum spellings, per-query sp), interleaved.

The noop save wraps the query in a SECOND fresh QueryExecution (the write
command re-analyzes + re-plans the whole tree); toRdd().count() executes the
first QueryExecution's physical plan directly — still a fresh plan per run
(fresh shuffles + broadcasts => full execution), one planning pass instead of
two.
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

from ksql_spark.registry import all_specs

SF = "/root/testdata/sf0.1"
REPS = 9
SP = {"q_filter_count": 1, "q_groupby_agg": 1, "q_join3_topk": 1,
      "q_window": 4, "q_rollup": 1, "q_events_session": 4}


def main() -> None:
    spark = (SparkSession.builder.master("local[32]").appName("exp6")
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
    specs = all_specs()

    def v_noop(n):
        spark.conf.set("spark.sql.shuffle.partitions", str(SP[n]))
        specs[n].builder(spark, SF).write.mode("overwrite").format("noop").save()

    def v_rdd(n):
        spark.conf.set("spark.sql.shuffle.partitions", str(SP[n]))
        specs[n].builder(spark, SF)._jdf.queryExecution().toRdd().count()

    for n in SP:
        v_noop(n); v_rdd(n)
    samples = {n: {"noop": [], "rdd": []} for n in SP}
    for _ in range(REPS):
        for n in SP:
            for tag, fn in (("noop", v_noop), ("rdd", v_rdd)):
                t0 = time.perf_counter()
                fn(n)
                samples[n][tag].append(time.perf_counter() - t0)
    out = {n: {t: round(statistics.median(v) * 1000, 1) for t, v in d.items()}
           for n, d in samples.items()}
    out["TOTAL"] = {t: round(sum(out[n][t] for n in SP), 1) for t in ("noop", "rdd")}
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
