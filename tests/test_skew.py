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


def test_keycollision_dedup_survives_pathological_hot_key(spark):
    """K73 under attack: 50k documents sharing ONE canonical key (plus a
    cold tail) must partial-aggregate map-side into a single group — the
    op completes and reports the hot group exactly, rather than timing
    out sorting one giant window partition (the skew mode the min-STRUCT
    agg design avoids)."""
    from ksql_spark.queries.llm import llm_keycollision_dedup  # noqa: F401
    from ksql_spark.operators import text as _t
    import pyspark.sql.functions as F

    hot = spark.range(50_000).select(
        F.col("id").alias("doc_id"),
        F.lit("alpha beta gamma").alias("text"),
    )
    cold = spark.range(1_000).select(
        (F.col("id") + 100_000).alias("doc_id"),
        F.concat(F.lit("unique"), F.col("id").cast("string")).alias("text"),
    )
    d = hot.unionByName(cold)
    key_arr = F.array_sort(F.array_distinct(_t.words("text")))
    got = (
        d.select(
            "doc_id",
            F.sha2(F.array_join(key_arr, " "), 256).alias("ckey_digest"),
        )
        .groupBy("ckey_digest")
        .agg(F.min("doc_id").alias("canonical_doc_id"), F.count("*").alias("n_docs"))
        .where(F.col("n_docs") > 1)
        .collect()
    )
    assert len(got) == 1
    assert got[0]["canonical_doc_id"] == 0 and got[0]["n_docs"] == 50_000


def test_fuzzy_join_block_residual_under_hot_block(spark):
    """C14 under attack: one block holding 2,000 identical-key rows would
    naively be a 4M-pair comparison; the equi-join + residual must
    complete and return only residual-passing pairs (here: distance <= 1
    between 'name N' variants) without a cartesian plan."""
    import pyspark.sql.functions as F

    rows = spark.range(2_000).select(
        F.col("id").alias("pk"),
        F.lit("blk").alias("blk_word"),
        F.lit(1).alias("p_size"),
        F.concat(F.lit("name"), (F.col("id") % 10).cast("string")).alias("nm"),
    )
    a = rows.select(
        F.col("pk").alias("pa"), "blk_word", "p_size", F.col("nm").alias("na")
    )
    b = rows.select(
        F.col("pk").alias("pb"), "blk_word", "p_size", F.col("nm").alias("nb")
    )
    j = a.join(
        b,
        on=[
            a["blk_word"] == b["blk_word"],
            a["p_size"] == b["p_size"],
            F.col("pa") < F.col("pb"),
            F.levenshtein(F.col("na"), F.col("nb")) <= 0,
        ],
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # identical-name pairs only: per name variant C(200,2) pairs x 10
    assert j.count() == 10 * (200 * 199 // 2)
