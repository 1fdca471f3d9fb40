"""One-off experiment: recall@5 of the portable hyperplane LSH vs exact
brute-force, across (bands, planes-per-band) configs at sf0.01.
Informs the round-5 choice that must clear the 0.5 gate (VERDICT r4 #4)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession, Window, functions as F

from ksql_spark.operators import vectors
from ksql_spark.tables import load

SF = "/root/testdata/sf0.01"


def plane_dot(p: int, vec: str = "embedding") -> str:
    return f"""aggregate(transform(sequence(1, size({vec})),
        i -> CAST(element_at({vec}, i) AS DOUBLE) *
             (((({p} * 1000003 + (i - 1)) * 2654435761) % 4294967296)
              / 4294967296.0 - 0.5)),
        CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"""


def band_bucket(band: int, planes: int) -> str:
    return " + ".join(
        f"(CASE WHEN {plane_dot(band * planes + r)} > 0 THEN {1 << r} ELSE 0 END)"
        for r in range(planes)
    )


def lsh_topk(spark, bands: int, planes: int):
    e = load(spark, SF, "embeddings")
    rows = [
        e.select(
            "vec_id",
            F.lit(b).alias("band"),
            F.expr(f"CAST({band_bucket(b, planes)} AS INT)").alias("bucket"),
        )
        for b in range(bands)
    ]
    b = rows[0]
    for br in rows[1:]:
        b = b.unionAll(br)
    q = b.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("band").alias("q_band"),
        F.col("bucket").alias("q_bucket"),
    )
    cand = (
        q.join(
            b,
            (F.col("q_band") == F.col("band"))
            & (F.col("q_bucket") == F.col("bucket"))
            & (F.col("query_id") != F.col("vec_id")),
        )
        .select("query_id", F.col("vec_id").alias("cid"))
        .distinct()
    )
    qe = e.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb"))
    ce = e.select(F.col("vec_id").alias("cid2"), F.col("embedding").alias("c_emb"))
    cos = F.try_divide(
        vectors.dot("q_emb", "c_emb"),
        vectors.l2_norm("q_emb") * vectors.l2_norm("c_emb"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        cand.join(qe, F.col("query_id") == F.col("qid"))
        .join(ce, F.col("cid") == F.col("cid2"))
        .select("query_id", F.col("cid").alias("vec_id"), cos.alias("cosine"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .drop("rn")
    )


def exact_topk(spark):
    e = load(spark, SF, "embeddings")
    q = e.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = e.select(F.col("vec_id").alias("vec_id"), F.col("embedding").alias("c_emb"))
    cos = F.try_divide(
        vectors.dot("q_emb", "c_emb"),
        vectors.l2_norm("q_emb") * vectors.l2_norm("c_emb"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id", cos.alias("cosine"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .drop("rn")
    )


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    truth = {
        (r["query_id"], r["vec_id"]) for r in exact_topk(spark).collect()
    }
    import time

    for bands, planes in [(4, 4), (5, 4), (6, 4), (6, 3), (8, 3), (8, 4), (10, 4)]:
        t0 = time.time()
        got = lsh_topk(spark, bands, planes).collect()
        pairs = {(r["query_id"], r["vec_id"]) for r in got}
        recall = len(pairs & truth) / len(truth)
        print(
            f"bands={bands} planes={planes}: recall@5={recall:.3f} "
            f"candidates_rows={len(got)} ({time.time()-t0:.1f}s)"
        )


if __name__ == "__main__":
    main()
