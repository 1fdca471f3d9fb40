"""Adversarial-skew stress: the salted-join pattern must stay correct AND
actually spread the hot key (SURVEY §4.3; the registry entry
`join_salted_skew` demonstrates the pattern on driver data, this test attacks
it with a 100:1 hot key).
"""

from __future__ import annotations

from pyspark.sql import functions as F

SALT_N = 8


def test_salted_join_correct_and_spread_under_hot_key(spark):
    # key 0 is hot (50k rows); keys 1..500 have ~100 each
    hot = spark.range(50_000).select(
        F.lit(0).alias("k"), F.col("id").alias("payload")
    )
    cold = spark.range(50_000).select(
        (F.col("id") % 500 + 1).alias("k"), F.col("id").alias("payload")
    )
    fact = hot.union(cold)
    dim = spark.range(501).select(
        F.col("id").alias("dk"), (F.col("id") * 10).alias("dval")
    )

    salted_fact = fact.withColumn("_salt", F.pmod(F.col("payload"), F.lit(SALT_N)))
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(SALT_N)]))
    )
    got = (
        salted_fact.join(
            salted_dim,
            (F.col("k") == F.col("dk")) & (salted_fact["_salt"] == salted_dim["_salt"]),
        )
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.min("dval").alias("dval"))
    )
    plain = (
        fact.join(dim, F.col("k") == F.col("dk"))
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.min("dval").alias("dval"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, plain.collect()))

    # the hot key's largest (key, salt) cell must be ~1/SALT_N of the key
    cells = (
        salted_fact.where(F.col("k") == 0)
        .groupBy("k", "_salt")
        .count()
        .agg(F.max("count").alias("mx"))
        .collect()[0]["mx"]
    )
    assert cells <= 50_000 / SALT_N * 1.2  # even spread within 20%


def test_dsum_partition_order_invariance(spark):
    """The scaled-long accumulation must yield IDENTICAL doubles under any
    partitioning/ordering of the input — the law every oracle comparison in
    this repo rests on. Plain double SUM fails this test's spirit (low bits
    shift with partition count); dsum must not."""
    import random

    from ksql_spark.registry import dsum

    for seed in (7, 42, 1234):
        rng = random.Random(seed)
        vals = [(i, rng.uniform(-1e6, 1e6)) for i in range(20_000)]
        df = spark.createDataFrame(vals, "id long, v double")
        results = set()
        for parts in (1, 7, 32):
            out = (
                df.repartition(parts)
                .agg(dsum("v").alias("s"))
                .collect()[0]["s"]
            )
            results.add(out)
        assert len(results) == 1, f"seed {seed}: dsum varied {results}"
