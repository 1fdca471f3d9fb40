"""Phase-split profiler for the six headline bench queries.

Answers ONE question per query: where do the milliseconds go at sf0.1?
  build  — Python builder call (load + spark.sql py4j round-trip + analysis)
  plan   — force executedPlan (optimization + physical planning)
  exec1  — first full execution via noop write (includes codegen compile)
  execN  — median of repeated noop writes on the SAME DataFrame object
  rddN   — median of repeated toRdd().count() on the SAME DataFrame object
           (skips per-save re-planning; pure physical re-execution)

Run on an IDLE machine; everything in one process, interleaved.
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

NAMES = ["q_filter_count", "q_groupby_agg", "q_join3_topk",
         "q_window", "q_rollup", "q_events_session"]
SF_DIR = "/root/testdata/sf0.1"
REPS = 7


def t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark(app_name="bench-profile", shuffle_partitions=1)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 30))
    spark.conf.set("spark.sql.files.openCostInBytes", str(1 << 30))
    specs = all_specs()

    # global warmup
    for n in NAMES:
        specs[n].builder(spark, SF_DIR).write.mode("overwrite").format("noop").save()

    out = {}
    for n in NAMES:
        r = {}
        r["build"] = t(lambda: specs[n].builder(spark, SF_DIR))
        df = specs[n].builder(spark, SF_DIR)
        qe = df._jdf.queryExecution()
        r["plan"] = t(lambda: qe.executedPlan())
        r["exec1"] = t(lambda: df.write.mode("overwrite").format("noop").save())
        execs = [t(lambda: df.write.mode("overwrite").format("noop").save())
                 for _ in range(REPS)]
        r["execN"] = statistics.median(execs)
        rdd = df._jdf.queryExecution().toRdd()
        rdds = [t(lambda: rdd.count()) for _ in range(REPS)]
        r["rddN"] = statistics.median(rdds)
        out[n] = {k: round(v * 1000, 1) for k, v in r.items()}
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
