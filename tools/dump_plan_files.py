"""Dump `.explain("formatted")` for named registry entries to files.

Evidence artifacts for optimization rounds: plans/r13/<name>_<tag>.txt.

Usage: python tools/dump_plan_files.py --tag before --only a,b,c [--out-dir plans/r13]
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--tag", required=True)
    ap.add_argument("--only", required=True)
    ap.add_argument("--out-dir", default=str(REPO / "plans" / "r13"))
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("ksql-spark-plan-dump")
        .master("local[4]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    qs = e.queries()
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in args.only.split(","):
        name = name.strip()
        if not name:
            continue
        if name not in qs:
            print(f"SKIP {name}: not in queries()")
            continue
        df = qs[name](spark, args.sf_dir)
        txt = df._jdf.queryExecution().explainString(mode)
        p = out_dir / f"{name}_{args.tag}.txt"
        p.write_text(txt)
        print(f"wrote {p} ({len(txt)} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
