"""Per-entry performance sweep over the whole registry (optimization rounds).

Times every queries() entry at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS], materializing through the noop sink (guide §1.4:
full execution of every column, no collect cost). One warm pass per entry is
NOT taken (the point is a ranking, not a bench artifact); --runs N keeps the
min of N back-to-back runs per entry to shave scheduler noise for the ranking.

Writes a JSON {name: {"sec": best, "runs": [..]}} to --out and prints the
slowest entries. Jobs are labeled so the UI/eventlog is attributable.

Usage: python tools/perf_sweep.py [--sf-dir DIR] [--runs 1] [--only a,b]
       [--out /tmp/perf_sweep.json] [--skip-slow name1,name2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--only", default=None)
    ap.add_argument("--out", default="/tmp/perf_sweep.json")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("ksql-spark-perf-sweep")
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("KSQL_SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    qs = e.queries()
    names = list(qs)
    if args.only:
        names = [n for n in args.only.split(",") if n in qs]

    results: dict[str, dict] = {}
    t_all = time.monotonic()
    for i, name in enumerate(names, 1):
        runs = []
        status = "ok"
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"perf_sweep:{name}")
            t0 = time.monotonic()
            try:
                df = qs[name](spark, args.sf_dir)
                df.write.mode("overwrite").format("noop").save()
            except Exception:
                # ADVICE r13: an erroring run's elapsed time is the
                # traceback path, not the query — recording it would let a
                # failed entry misrank the sweep. ERROR entries get sec=NaN
                # (excluded from min/total below).
                status = "ERROR"
                traceback.print_exc()
                break
            runs.append(time.monotonic() - t0)
        best = min(runs) if runs and status == "ok" else float("nan")
        results[name] = {"sec": round(best, 3), "runs": [round(r, 3) for r in runs],
                         "status": status}
        print(f"[{i}/{len(names)}] {name}: {best:.2f}s {status if status != 'ok' else ''}",
              flush=True)

    payload = {
        "sf_dir": args.sf_dir,
        "cpus": cpus,
        "elapsed_sec": round(time.monotonic() - t_all, 1),
        "entries": results,
    }
    Path(args.out).write_text(json.dumps(payload, indent=1))
    import math

    ok = {n: v for n, v in results.items() if not math.isnan(v["sec"])}
    ranked = sorted(ok.items(), key=lambda kv: -kv[1]["sec"])
    total = sum(v["sec"] for v in ok.values())
    n_err = len(results) - len(ok)
    if n_err:
        print(f"\n{n_err} ERROR entries excluded from ranking/total")
    print(f"\ntotal {total:.1f}s across {len(results)} entries; slowest {args.top}:")
    for name, v in ranked[: args.top]:
        print(f"  {v['sec']:8.2f}s  {name}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
