"""Dump the per-round relax/half-step plans for the frontier-loop family.

The entries' FINAL plans are pin-hidden (ExistingRDD projections), so the
checkable evidence for the relax-join strategy is the plan of one loop
iteration rebuilt over pinned inputs — the exact shape every executed round
runs (the graph_sssp_weighted_before.txt format).

Usage: python tools/probe_relax_plans.py --tag before --out-dir plans/r14
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def fmt(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--tag", required=True)
    ap.add_argument("--out-dir", default=str(REPO / "plans" / "r14"))
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.appName("ksql-spark-relax-plan-probe")
        .master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from ksql_spark.operators.scale import pin, pin_invariant
    from ksql_spark.queries.graph import (
        _LANDMARKS,
        coship_adj,
    )
    from ksql_spark.registry import dsum
    from ksql_spark.tables import load

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    li = load(spark, args.sf_dir, "lineitem")

    # --- landmark relaxation round (graph_landmark_distances /
    # graph_closeness_landmarks): round 2 over the pinned round-1 state ---
    adj = coship_adj(li, checkpoint=True)
    d = spark.createDataFrame(
        [(x, x, 0) for x in _LANDMARKS], "lm long, s long, dist long"
    )

    def lm_round(state):
        from ksql_spark.queries.graph import _lm_relax

        return _lm_relax(state, adj)

    d1 = pin(lm_round(d).drop("changed"), eager=False)
    round2 = lm_round(d1)
    (out / f"graph_landmark_distances_roundplan_{args.tag}.txt").write_text(
        "== Landmark relax round plan (adj pinned, d = pinned round-1 "
        "state;\n   the shape every executed round runs; also the "
        "graph_closeness_landmarks body) ==\n" + fmt(round2)
    )

    # --- BFS level (graph_bfs / graph_diameter_doublesweep): level-2 next
    # frontier over the pinned level-1 frontier ---
    from ksql_spark.queries.graph import _bfs_level

    adj_b = pin_invariant(coship_adj(li, exclude_self=False))
    seed = spark.createDataFrame([(0, 0)], "suppkey long, depth int")
    f1 = pin(_bfs_level(seed, seed, adj_b, 1), eager=False)
    visited = seed.unionByName(f1)
    level2 = _bfs_level(f1, visited, adj_b, 2)
    (out / f"graph_bfs_levelplan_{args.tag}.txt").write_text(
        "== BFS next-level plan (adj pinned, frontier = pinned level-1 "
        "frontier;\n   the shape every executed level runs; also the "
        "diameter double-sweep body) ==\n" + fmt(level2)
    )

    # --- HITS half-step (graph_hits): authority half-step over a pinned
    # hub vector ---
    edges = pin(
        li.select(
            F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")
        ).distinct(),
        eager=False,
    )
    h = pin(
        edges.select("s").distinct().select("s", F.lit(1.0).alias("h")),
        eager=False,
    )
    from ksql_spark.queries.graph import _hits_contrib

    araw = _hits_contrib(edges, h, "s", "p", "h")
    (out / f"graph_hits_halfstepplan_{args.tag}.txt").write_text(
        "== HITS half-step contribution plan (edges pinned, score vector "
        "pinned;\n   the shape all 8 half-steps run) ==\n" + fmt(araw)
    )

    print("wrote 3 round-plan dumps to", out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
