"""Symmetric DuckDB baseline for the 6 headline bench queries.

VERDICT r7 item 2 / ADVICE r7: bench.py reports the per-query MIN of spaced
block-medians (to dodge hypervisor contention epochs), while BASELINE.md §3's
DuckDB numbers were a single median-of-5 — a downward-biased estimator on one
side only. This tool re-measures the DuckDB side of the SAME six queries (the
registry oracles bench.py's Spark builders are correctness-checked against)
under the IDENTICAL protocol: quiet-window wait, 2 warm-up passes, round-robin
interleaved blocks of median-of-RUNS, BLOCK_GAP-spaced, adaptive extension
while the newest block still improves, then BOTH estimators published.

Usage: python tools/bench_duckdb_baseline.py [--sf-dir DIR]
Prints one JSON line mirroring bench.py's shape (queries = min-of-block-
medians, queries_median_of_blocks, block_totals, loadavg keys).
"""

from __future__ import annotations

import argparse
import json
import os
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

RUNS = int(os.environ.get("KSQL_BENCH_RUNS", "7"))
BLOCKS = int(os.environ.get("KSQL_BENCH_BLOCKS", "3"))
BLOCK_GAP_SEC = float(os.environ.get("KSQL_BENCH_BLOCK_GAP", "20"))
QUIET_LOAD = float(os.environ.get("KSQL_BENCH_QUIET_LOAD", "3.0"))
QUIET_WAIT_SEC = float(os.environ.get("KSQL_BENCH_QUIET_WAIT", "150"))
WARMUPS = int(os.environ.get("KSQL_BENCH_WARMUPS", "2"))


def wait_for_quiet() -> None:
    deadline = time.time() + QUIET_WAIT_SEC
    while time.time() < deadline and os.getloadavg()[0] >= QUIET_LOAD:
        time.sleep(5.0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    import duckdb

    from ksql_spark.registry import all_specs
    from bench import BENCH_QUERIES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )
    specs = all_specs()
    names = [n for n in BENCH_QUERIES if n in specs]
    sql = {n: specs[n].oracle for n in names}

    def run_one(n: str) -> None:
        con.execute(sql[n]).fetchall()

    for _ in range(WARMUPS):
        for n in names:
            run_one(n)

    wait_for_quiet()
    load_start = os.getloadavg()[0]

    def one_block() -> dict[str, float]:
        samples: dict[str, list[float]] = {n: [] for n in names}
        for _ in range(RUNS):
            for n in names:
                t0 = time.perf_counter()
                run_one(n)
                samples[n].append(time.perf_counter() - t0)
        return {n: statistics.median(ts) for n, ts in samples.items()}

    max_wall = float(os.environ.get("KSQL_BENCH_MAX_SEC", "300"))
    t_start = time.time()
    block_medians: list[dict[str, float]] = []
    while True:
        if block_medians:
            time.sleep(BLOCK_GAP_SEC)
        block_medians.append(one_block())
        if len(block_medians) < BLOCKS:
            continue
        totals = [sum(bm.values()) for bm in block_medians]
        still_improving = len(totals) > 1 and totals[-1] < 0.98 * min(totals[:-1])
        if not still_improving or time.time() - t_start > max_wall:
            break
    per_query = {n: round(min(bm[n] for bm in block_medians), 4) for n in names}
    per_query_med = {
        n: round(statistics.median([bm[n] for bm in block_medians]), 4)
        for n in names
    }
    print(
        json.dumps(
            {
                "metric": "duckdb_headline_total",
                "value": round(sum(per_query.values()), 4),
                "unit": "sec",
                "queries": per_query,
                "estimator": "min_of_block_medians",
                "queries_median_of_blocks": per_query_med,
                "total_median_of_blocks": round(sum(per_query_med.values()), 4),
                "sf_dir": args.sf_dir,
                "load_1m_start": round(load_start, 2),
                "load_1m_end": round(os.getloadavg()[0], 2),
                "block_totals": [
                    round(sum(bm.values()), 4) for bm in block_medians
                ],
            }
        )
    )


if __name__ == "__main__":
    main()
