"""Per-round benchmark (BASELINE.md §4 protocol).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS], warm session, one discard run then median of N.
Queries are materialized with the noop sink (full execution, no driver collect
cost). Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from ksql_spark.registry import all_specs
from ksql_spark.session import get_spark

BENCH_QUERIES = [
    "q_filter_count",
    "q_groupby_agg",
    "q_join3_topk",
    "q_window",
    "q_rollup",
    "q_events_session",
]

RUNS = int(os.environ.get("KSQL_BENCH_RUNS", "5"))


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None
    spark = get_spark(app_name="ksql-spark-bench", shuffle_partitions=8)
    # Small-scale profile: at sf<=0.1 every join side is statically broadcast-
    # able and inputs are single-row-group files, so AQE's per-stage
    # materialization barriers only add latency (~25% here). On a cluster at
    # real scale AQE stays on (session.py default) — it's what handles skew
    # and runtime join re-planning.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    specs = all_specs()
    names = [n for n in BENCH_QUERIES if n in specs]

    # Warm-up: JVM codegen + parquet footer caches (excluded per BASELINE.md §4).
    for n in names:
        materialize(specs[n].builder(spark, sf_dir))

    per_query: dict[str, float] = {}
    for n in names:
        times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            materialize(specs[n].builder(spark, sf_dir))
            times.append(time.perf_counter() - t0)
        per_query[n] = round(statistics.median(times), 4)

    total = round(sum(per_query.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_total_median",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
