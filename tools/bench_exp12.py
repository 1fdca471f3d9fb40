"""A/B the landmark relax join strategy per round (r14 session 2).

Variants: smj (no hint), bcast (broadcast state), bcast_fan (broadcast state
over an adjacency repartitioned by s1 to fan_parts before pinning).
Times each round's changed-count action separately in ONE session,
alternating variants (the BENCH_NOTES interleave discipline).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("exp12-landmark-relax")
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from ksql_spark.operators.scale import fan_parts, pin
    from ksql_spark.queries.graph import _LANDMARKS, _LM_ROUNDS, coship_adj
    from ksql_spark.tables import load

    li = load(spark, sf_dir, "lineitem")

    def run(variant: str) -> list[float]:
        adj = coship_adj(li)
        if variant == "bcast_fan":
            adj = adj.repartition(fan_parts(spark), "s1")
        adj = pin(adj, eager=False)
        d = spark.createDataFrame(
            [(x, x, 0) for x in _LANDMARKS], "lm long, s long, dist long"
        )
        times = []
        for _ in range(_LM_ROUNDS):
            left = F.broadcast(d) if variant != "smj" else d
            relaxed = left.join(adj, d.s == adj.s1).select(
                "lm", F.col("s2").alias("s"), (F.col("dist") + 1).alias("dist")
            )
            nxt = pin(
                d.withColumn("own", F.lit(True))
                .unionByName(relaxed.withColumn("own", F.lit(False)))
                .groupBy("lm", "s")
                .agg(
                    F.min("dist").alias("dist"),
                    F.min(F.when(F.col("own"), F.col("dist"))).alias("own_d"),
                )
                .select(
                    "lm", "s", "dist",
                    (F.col("own_d").isNull()
                     | (F.col("dist") < F.col("own_d"))).alias("changed"),
                ),
                eager=False,
            )
            t0 = time.monotonic()
            changed = nxt.where("changed").limit(1).count()
            times.append(time.monotonic() - t0)
            d = nxt.drop("changed")
            if changed == 0:
                break
        return times

    for rep in range(3):
        for v in ("smj", "bcast", "bcast_fan"):
            spark.sparkContext.setJobDescription(f"exp12:{v}:{rep}")
            t0 = time.monotonic()
            rounds = run(v)
            total = time.monotonic() - t0
            print(
                f"{v:10s} rep{rep}: total {total:6.2f}s  rounds "
                + " ".join(f"{t:.2f}" for t in rounds),
                flush=True,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
