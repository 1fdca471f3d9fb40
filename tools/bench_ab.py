"""A/B: per-run materialization strategy for bench.py.

v1 (current): fresh build + noop write  — pays V2 write-command overhead.
v2:           fresh build + toRdd().count() — fresh QueryExecution per run, so
              shuffles/broadcasts re-execute (full execution), but no write
              command pipeline.
Interleaved in one process; median of REPS.
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


def main() -> None:
    spark = get_spark(app_name="bench-ab", shuffle_partitions=1)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 30))
    spark.conf.set("spark.sql.files.openCostInBytes", str(1 << 30))
    specs = all_specs()

    def v1(n):
        df = specs[n].builder(spark, SF_DIR)
        df.write.mode("overwrite").format("noop").save()

    def v2(n):
        df = specs[n].builder(spark, SF_DIR)
        df._jdf.queryExecution().toRdd().count()

    for n in NAMES:  # warm both paths
        v1(n); v2(n)

    samples: dict[str, dict[str, list[float]]] = {
        n: {"v1": [], "v2": []} for n in NAMES}
    for _ in range(REPS):
        for n in NAMES:
            for tag, fn in (("v1", v1), ("v2", v2)):
                t0 = time.perf_counter()
                fn(n)
                samples[n][tag].append(time.perf_counter() - t0)
    out = {n: {tag: round(statistics.median(ts) * 1000, 1)
               for tag, ts in d.items()} for n, d in samples.items()}
    out["TOTAL"] = {tag: round(sum(out[n][tag] for n in NAMES), 1)
                    for tag in ("v1", "v2")}
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
