"""Synthesize an sf1-equivalent probe dataset from /root/testdata/sf0.1.

TESTDATA.md ships sf{0.001,0.01,0.1}; the VERDICT r7 item 7 memory/robustness
probe wants one decade more. This replicates each fact table REP times with
CONSISTENT key shifts (copy i adds i*SHIFT to every entity key, so FK joins
keep exactly the sf0.1 join fan-out), leaves the fixed dimensions (nation,
region) alone, and writes multi-file parquet (default row-group settings —
unlike the single-row-group driver files, this exercises real split planning).
Rows: lineitem 6M / orders 1.5M / events 1M / documents 50k / embeddings 20k —
the TPC-H sf1 design point. Text/embeddings replicate verbatim on purpose:
planted 10x exact duplicates are a realistic dedup stress, and doc_id-keyed
draws stay unbiased because the shifted ids re-hash.

Usage: python tools/make_sfprobe.py [--rep 10] [--out /root/repo/tmp_sfprobe]
       python tools/make_sfprobe.py --rep 1000 --tables lineitem,orders \
           --out /root/repo/tmp_sf100probe   # sf100-equivalent spot decade

Replication is explode-based (one narrow pass per table): a rep-way unionAll
at rep=1000 would hand the analyzer an 8000-branch plan. Key semantics are
identical: copy i adds i*SHIFT to every entity key. Shifted ids stay < 2^31
only for rep <= 200 — the sf100 probe's ids reach ~10^10 and live in LONG
columns; entries that pack ids into 32 bits (Morton/z-order) are not probed
at that scale.
"""

from __future__ import annotations

import argparse
import shutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SHIFT = 10_000_000  # > any sf0.1 key; keeps shifted ids < 2^31 for rep <= 200

FACTS = {
    # table: (key columns to shift, files to write)
    "lineitem": (["l_orderkey", "l_partkey", "l_suppkey"], 32),
    "orders": (["o_orderkey", "o_custkey"], 16),
    "events": (["event_id", "user_id"], 16),
    "documents": (["doc_id"], 8),
    "embeddings": (["vec_id"], 8),
    "customer": (["c_custkey"], 8),
    "part": (["p_partkey"], 4),
    "supplier": (["s_suppkey"], 2),
}
DIMS = ["nation", "region"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rep", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=str(REPO / "tmp_sfprobe"))
    ap.add_argument(
        "--tables",
        default=None,
        help="comma list of fact tables to replicate (default: all); "
        "dimensions are always copied",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("make-sfprobe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    for t in DIMS:
        dst = out / f"{t}.parquet"
        if dst.exists() or dst.is_dir():
            shutil.rmtree(dst, ignore_errors=True)
        spark.read.parquet(f"{args.src}/{t}.parquet").coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(dst))
        print(f"{t}: copied")
    wanted = set(args.tables.split(",")) if args.tables else set(FACTS)
    unknown = wanted - set(FACTS)
    if unknown:
        ap.error(
            f"--tables names not in FACTS: {sorted(unknown)} "
            f"(valid: {sorted(FACTS)})"
        )
    # Unlisted fact tables are still COPIED unreplicated (ADVICE r10): a
    # probe dir missing e.g. documents.parquet fails any query touching it
    # with a confusing missing-file error, and a silently absent table is
    # worse — a stale file from a previous run would be read instead.
    for t in sorted(set(FACTS) - wanted):
        dst = out / f"{t}.parquet"
        if dst.exists() or dst.is_dir():
            shutil.rmtree(dst, ignore_errors=True)
        spark.read.parquet(f"{args.src}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(str(dst))
        print(f"{t}: copied unreplicated (not in --tables)", flush=True)
    for t, (keys, nfiles) in FACTS.items():
        if t not in wanted:
            continue
        src = spark.read.parquet(f"{args.src}/{t}.parquet")
        if args.rep > 50:
            # a single-file source gives ~3 input splits; the x rep explode
            # would run on 3 cores — spread the narrow map first
            src = src.repartition(32)
        # Explode-based replication: one narrow pass, no rep-way union plan.
        allp = src.withColumn(
            "__copy",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.lit(args.rep - 1).cast("long"))
            ),
        )
        for k in keys:
            allp = allp.withColumn(
                k,
                (F.col(k).cast("long") + F.col("__copy") * F.lit(SHIFT).cast("long")),
            )
        allp = allp.drop("__copy")
        nfiles_eff = min(512, nfiles * max(1, args.rep // 10))
        (
            allp.repartition(nfiles_eff)
            .write.mode("overwrite")
            .parquet(str(out / f"{t}.parquet"))
        )
        n = spark.read.parquet(str(out / f"{t}.parquet")).count()
        print(f"{t}: {n} rows, {nfiles_eff} files", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
