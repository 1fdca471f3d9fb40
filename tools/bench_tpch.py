"""Secondary benchmark: all TPC-H-shape integration entries vs DuckDB at sf0.1.

Not part of the driver's bench gate (bench.py's 6 headline queries are); this
is scale-performance EVIDENCE for the 17 classic shapes — the same builder and
oracle the correctness gate runs, timed. Protocol mirrors bench.py: warm
session, one discard run, interleaved round-robin, median of N, noop-sink
materialization on the Spark side / fetchall on DuckDB (it has no noop sink;
result sets here are tiny, so fetch cost is negligible for both).

Usage: python tools/bench_tpch.py [--sf-dir DIR] [--runs N]
Prints one JSON line: {"spark_total": s, "duckdb_total": s, "ratio": r,
"queries": {name: {"spark": s, "duckdb": s}}}
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--sp", type=int, default=1)
    args = ap.parse_args()

    import duckdb

    from pyspark.sql import SparkSession

    from ksql_spark.registry import all_specs

    spark = (
        SparkSession.builder.master("local[32]").appName("tpch-bench")
        .config("spark.sql.shuffle.partitions", "1")  # overridden below via --sp
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
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", str(args.sp))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    specs = {k: v for k, v in all_specs().items() if k.startswith("tpch_")}

    def run_spark(name: str) -> None:
        specs[name].builder(spark, args.sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()

    def run_duck(name: str) -> None:
        con.execute(specs[name].oracle).fetchall()

    names = sorted(specs)
    for n in names:  # warm-up (JVM codegen, parquet footers, duck caches)
        run_spark(n)
        run_duck(n)

    s_samples = {n: [] for n in names}
    d_samples = {n: [] for n in names}
    for _ in range(args.runs):
        for n in names:
            t0 = time.perf_counter()
            run_spark(n)
            s_samples[n].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            run_duck(n)
            d_samples[n].append(time.perf_counter() - t0)

    queries = {
        n: {
            "spark": round(statistics.median(s_samples[n]), 4),
            "duckdb": round(statistics.median(d_samples[n]), 4),
        }
        for n in names
    }
    st = round(sum(q["spark"] for q in queries.values()), 4)
    dt = round(sum(q["duckdb"] for q in queries.values()), 4)
    print(
        json.dumps(
            {
                "spark_total": st,
                "duckdb_total": dt,
                "ratio": round(st / dt, 3) if dt else None,
                "sf_dir": args.sf_dir,
                "queries": queries,
            }
        )
    )


if __name__ == "__main__":
    main()
