"""Quality tests for the sketch-based LLM ops (rows-only in the driver gate):
MinHash-LSH must actually FIND planted near-duplicates; IVF ANN must have
decent recall vs the exact brute-force top-k.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ksql_spark.operators import dedup
from ksql_spark.registry import all_specs

from .conftest import SF_DIR


def test_minhash_finds_planted_near_dups(spark):
    """Plant near-identical copies (one word changed) of 10 documents and an
    exact copy of 5 more; banding must surface them all as candidate pairs."""
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .limit(100)
    )
    near = (
        docs.where(F.col("doc_id") < 10)
        .select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.lit("zzz "), F.expr("substring(text, 5)")).alias("text"),
        )
    )
    exact = docs.where((F.col("doc_id") >= 10) & (F.col("doc_id") < 15)).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(near).unionByName(exact)
    pairs = dedup.minhash_near_dups(
        corpus, "text", "doc_id", k=40, bands=8, jaccard_threshold=0.5
    ).collect()
    found = {(r.doc_a, r.doc_b) for r in pairs}
    for i in range(5):
        assert (10 + i, 200010 + i) in found, f"exact copy of doc {10+i} missed"
    near_hits = sum(1 for i in range(10) if (i, 100000 + i) in found)
    assert near_hits >= 8, f"only {near_hits}/10 planted near-dups found"


def test_simhash_exact_copy_same_bucket(spark):
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .limit(20)
    )
    sig = docs.select("doc_id", dedup.simhash32("text").alias("sh")).collect()
    by_id = {r.doc_id: r.sh for r in sig}
    # identical text → identical simhash (deterministic hashing)
    again = docs.select("doc_id", dedup.simhash32("text").alias("sh")).collect()
    assert {r.doc_id: r.sh for r in again} == by_id


def test_ivf_recall_vs_bruteforce(spark):
    specs = all_specs()
    exact = specs["llm_sim_topk"].builder(spark, SF_DIR).collect()
    approx = specs["ann_ivf_topk"].builder(spark, SF_DIR).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.vec_id)
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    avg = sum(recalls) / len(recalls)
    # IVF probes 4/16 KMeans cells; embeddings cluster by label so recall
    # should be well above the 0.2 random-probe floor.
    assert avg >= 0.4, f"IVF recall@5 too low: {avg:.2f} ({recalls})"


def test_lsh_recall_vs_bruteforce(spark):
    """Euclidean-LSH top-5 vs exact cosine top-5: embeddings are ~unit-norm so
    nearest-by-euclidean ≈ nearest-by-cosine; recall must beat random."""
    specs = all_specs()
    exact = specs["llm_sim_topk"].builder(spark, SF_DIR).collect()
    approx = specs["ann_lsh_topk"].builder(spark, SF_DIR).collect()
    exact_sets, approx_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.vec_id)
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    avg = sum(recalls) / len(recalls)
    assert avg >= 0.4, f"LSH recall@5 too low: {avg:.2f} ({recalls})"


def test_partitioned_write_layout(spark, tmp_path):
    """Scale-relevant sink: hive-partitioned parquet (partition pruning path)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path / "by_lang")
    docs.write.mode("overwrite").partitionBy("lang").parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # partition pruning: the filtered scan lists only the matching directory
    one = back.where(F.col("lang") == "en")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "lang=en" in plan or "PartitionFilters" in plan
    assert one.count() == docs.where(F.col("lang") == "en").count()


def test_minhash_rejects_indivisible_bands():
    import pytest

    with pytest.raises(ValueError, match="divisible"):
        dedup.minhash_near_dups(None, "text", "doc_id", k=42, bands=4)


def test_stratified_sample_portable_and_stable(spark):
    """The hash split must be deterministic across runs and respect per-stratum
    rates (wide tolerance — sf0.01 strata are small)."""
    from ksql_spark.registry import all_specs

    b = all_specs()["llm_sample_stratified"].builder
    sf = "/root/testdata/sf0.01"
    a = {r.doc_id for r in b(spark, sf).collect()}
    again = {r.doc_id for r in b(spark, sf).collect()}
    assert a == again and a
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    totals = {r.lang: r.n for r in docs.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    kept = (
        b(spark, sf)
        .groupBy("lang").count().withColumnRenamed("count", "k").collect()
    )
    from ksql_spark.queries.llm import _STRATA_PERMILLE

    for r in kept:
        expect = _STRATA_PERMILLE.get(r.lang, 0) / 1000
        assert abs(r.k / totals[r.lang] - expect) < 0.15
