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


def test_shard_assignment_is_complete_partition(spark):
    """Shards partition the corpus: doc and byte counts are conserved."""
    specs = all_specs()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    total_docs = docs.count()
    total_chars = docs.agg(F.sum("n_chars")).collect()[0][0]
    shards = specs["llm_shard_assign"].builder(spark, SF_DIR).collect()
    assert sum(r.n_docs for r in shards) == total_docs
    assert sum(r.total_chars for r in shards) == total_chars
    assert all(0 <= r.shard_id < 16 for r in shards)


def test_domain_mix_never_exceeds_min_domain(spark):
    """Rebalanced domain sizes are bounded by the smallest original domain."""
    specs = all_specs()
    rows = specs["llm_domain_mix"].builder(spark, SF_DIR).collect()
    n_min = min(r.n_orig for r in rows)
    assert all(r.n_kept <= n_min for r in rows)
    assert all(r.n_kept <= r.n_orig for r in rows)


def test_emb_cluster_conserves_vectors_and_fixes_centroids(spark):
    """Every vector lands in exactly one cluster; a centroid's nearest
    centroid is itself (distance 0 beats any tie)."""
    specs = all_specs()
    vecs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    rows = specs["llm_emb_cluster"].builder(spark, SF_DIR).collect()
    assert sum(r.n_members for r in rows) == vecs
    assert sorted(r.cent_id for r in rows) == [0, 1, 2, 3]
    assert all(r.n_members >= 1 for r in rows)


def test_dup_stats_accounting(spark):
    """Histogram accounting: docs covered = size x clusters; totals match the
    corpus + simulated re-crawl; excess = docs - clusters per size."""
    specs = all_specs()
    n = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    rows = specs["llm_dup_stats"].builder(spark, SF_DIR).collect()
    assert sum(r.n_docs for r in rows) == n + n // 5
    for r in rows:
        assert r.n_docs == r.csize * r.n_clusters
        assert r.n_excess == r.n_docs - r.n_clusters


def test_cross_dedup_keeps_only_fresh_content(spark):
    """Verbatim re-downloads are dropped; modified docs all survive."""
    specs = all_specs()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_fresh = docs.where(F.col("doc_id") % 6 == 3).count()
    survivors = specs["llm_cross_dedup"].builder(spark, SF_DIR).collect()
    assert len(survivors) == n_fresh
    assert all(r.doc_id >= 600000 for r in survivors)


def test_boilerplate_ratio_bounds(spark):
    """Ratio is a true fraction of each doc's distinct grams."""
    specs = all_specs()
    rows = specs["llm_doc_boilerplate_ratio"].builder(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_frequent <= r.n_grams
        assert abs(r.boilerplate_ratio - r.n_frequent / r.n_grams) < 1e-15


def test_retention_day_zero_covers_cohort(spark):
    """Every user is active on their own cohort day, so the offset-0 row of
    each cohort equals the cohort's size; offsets stay in [0, 7]."""
    specs = all_specs()
    rows = specs["events_retention_cohort"].builder(spark, SF_DIR).collect()
    by_cohort = {}
    for r in rows:
        assert 0 <= r.day_offset <= 7
        by_cohort.setdefault(r.cohort_day, {})[r.day_offset] = r.n_active
    for cohort, offsets in by_cohort.items():
        assert 0 in offsets  # day-0 row always present
        assert all(n <= offsets[0] for n in offsets.values())


def test_portable_minhash_finds_planted_near_dups(spark):
    """The engine-portable (md5-signature) LSH must find the same planted
    duplicates the xxhash production path finds: exact copies always, near
    copies (one word changed) at >= 8/10 recall."""
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .limit(100)
    )
    near = docs.where(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.lit("zzz "), F.expr("substring(text, 5)")).alias("text"),
    )
    exact = docs.where((F.col("doc_id") >= 10) & (F.col("doc_id") < 15)).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(near).unionByName(exact)
    pairs = dedup.minhash_near_dups_portable(
        corpus, "text", "doc_id", n_hash=16, rows_per_band=2,
        jaccard_threshold=0.5,
    ).collect()
    found = {(r.doc_a, r.doc_b) for r in pairs}
    for i in range(5):
        assert (10 + i, 200010 + i) in found, f"exact copy of doc {10+i} missed"
    near_hits = sum(1 for i in range(10) if (i, 100000 + i) in found)
    assert near_hits >= 8, f"only {near_hits}/10 planted near-dups found"


def test_bloom_supersets_exact_decontamination(spark):
    """The Bloom sketch is one-sided: every doc/gram the exact n-gram
    decontamination flags MUST also be flagged by the filter (no false
    negatives); false positives are allowed and deterministic."""
    specs = all_specs()
    exact = {
        r["doc_id"]: r["n_shared_grams"]
        for r in specs["llm_decontaminate"].builder(spark, SF_DIR).collect()
    }
    bloom = {
        r["doc_id"]: r["n_flagged"]
        for r in specs["llm_bloom_decontaminate"].builder(spark, SF_DIR).collect()
    }
    assert set(exact) <= set(bloom), "bloom missed exactly-contaminated docs"
    for doc, n_exact in exact.items():
        assert bloom[doc] >= n_exact, f"doc {doc}: bloom {bloom[doc]} < exact {n_exact}"


def test_gopher_rules_verdict_consistency(spark):
    """keep must be the conjunction of the four per-rule booleans, and the
    real corpus must exercise both branches of at least one rule."""
    rows = all_specs()["llm_gopher_rules"].builder(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["keep"] == bool(
            r["ok_len"] and r["ok_mean_len"] and r["ok_stop"] and r["ok_alpha"]
        )
    keeps = {r["keep"] for r in rows}
    assert keeps == {True, False}, "thresholds never discriminate on this corpus"


def test_quality_calibrate_is_per_source_uniform(spark):
    """Percentile calibration must be source-local: every source's top-half
    keep rate is ~50% regardless of the source's absolute quality level."""
    rows = all_specs()["llm_quality_calibrate"].builder(spark, SF_DIR).collect()
    by_src: dict = {}
    for r in rows:
        kept, n = by_src.get(r["source"], (0, 0))
        by_src[r["source"]] = (kept + (1 if r["keep_top_half"] else 0), n + 1)
    assert len(by_src) >= 2
    for src, (kept, n) in by_src.items():
        assert 0.4 <= kept / n <= 0.6, f"{src}: keep rate {kept/n}"


def test_dsir_weight_separates_target_source(spark):
    """Docs drawn from the target source must average a higher importance
    weight than the rest of the corpus (they ARE the target distribution)."""
    rows = all_specs()["llm_dsir_weight"].builder(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source"
    )
    src = {r["doc_id"]: r["source"] for r in docs.collect()}
    tgt = [r["importance"] for r in rows if src[r["doc_id"]] == "src0"]
    rest = [r["importance"] for r in rows if src[r["doc_id"]] != "src0"]
    assert tgt and rest
    assert sum(tgt) / len(tgt) > sum(rest) / len(rest)


def test_cms_estimate_is_one_sided(spark):
    """Count-Min never undercounts: cms_n >= exact_n for every probed word,
    and at least the top word's estimate should be exact or near (d=4 rows
    over a 512-wide grid on a ~200-word vocabulary collides rarely)."""
    rows = all_specs()["llm_cms_heavy_hitters"].builder(spark, SF_DIR).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["cms_n"] >= r["exact_n"], (r["word"], r["cms_n"], r["exact_n"])
        assert r["overcount"] == r["cms_n"] - r["exact_n"]


def test_bloom_sketch_merges_across_shards(spark):
    """Sketch mergeability law: bloom words built per shard and bit_or-merged
    must equal the single-pass build BITWISE — the property that makes the
    sketch shard-parallel at 100 TB and micro-batch-incremental in streaming."""
    import pyspark.sql.functions as F

    from ksql_spark.operators import text
    from ksql_spark.queries.llm import bloom_sketch

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    grams = d.select(
        "doc_id",
        F.explode(F.array_distinct(text.shingles("text", 5))).alias("gram"),
    )
    full = {
        r["word_idx"]: r["bits"]
        for r in bloom_sketch(grams.select("gram").distinct()).collect()
    }
    shard_a = bloom_sketch(
        grams.where(F.col("doc_id") % 2 == 0).select("gram").distinct()
    )
    shard_b = bloom_sketch(
        grams.where(F.col("doc_id") % 2 == 1).select("gram").distinct()
    )
    merged = {
        r["word_idx"]: r["bits"]
        for r in shard_a.unionByName(shard_b)
        .groupBy("word_idx")
        .agg(F.bit_or("bits").alias("bits"))
        .collect()
    }
    assert merged == full


def test_cms_sketch_merges_across_shards(spark):
    """CMS mergeability law: counters built per shard and SUM-merged must
    equal the single-pass sketch exactly — integer counters, so bitwise."""
    import pyspark.sql.functions as F

    from ksql_spark.operators import text
    from ksql_spark.queries.llm import cms_sketch

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    toks = d.select("doc_id", F.explode(text.words("text")).alias("w"))
    full = {
        (r["j"], r["pos"]): r["cnt"]
        for r in cms_sketch(toks.select("w")).collect()
    }
    shard_a = cms_sketch(toks.where(F.col("doc_id") % 2 == 0).select("w"))
    shard_b = cms_sketch(toks.where(F.col("doc_id") % 2 == 1).select("w"))
    merged = {
        (r["j"], r["pos"]): r["cnt"]
        for r in shard_a.unionByName(shard_b)
        .groupBy("j", "pos")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }
    assert merged == full


def test_rolling_wau_respects_calendar_gaps(spark, tmp_path):
    """The WAU window is CALENDAR days, not observed-day rows: with a
    zero-event gap (days 6-9 empty), day 10's 7-day window must cover
    only days 4-10 — an observed-day row frame would reach back to day 1
    and overcount. (The driver fixtures are gap-free, so only this
    synthetic corpus exercises the contract.)"""
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, d), d % 3, "view", 1.0, "{}")
        for i, d in enumerate([1, 2, 3, 4, 5, 10])
    ]
    df = spark.createDataFrame(
        rows,
        schema="event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        r["day"].day: r["wau"]
        for r in all_specs()["events_rolling_wau"]
        .builder(spark, str(tmp_path))
        .collect()
    }
    assert set(out) == {1, 2, 3, 4, 5, 10}  # only observed days emitted
    assert out[5] == 3  # days 1-5: users {1,2,0,1,2} -> 3 distinct
    assert out[10] == 2  # days 4-10: users {1,2,1} -> 2, NOT 3


def test_anisotropy_matches_bruteforce_pairwise(spark):
    """K110's closed form equals the literal n² pairwise mean cosine over
    the same quantized unit vectors (sf0.001, small enough to enumerate)."""
    import itertools

    import numpy as np

    from ksql_spark.registry import all_specs

    sf = "/root/testdata/sf0.001"
    out = {
        r["label"]: r
        for r in all_specs()["llm_emb_anisotropy"]
        .builder(spark, sf)
        .collect()
    }
    rows = spark.read.parquet(f"{sf}/embeddings.parquet").collect()
    by_label = {}
    for r in rows:
        q = np.trunc(np.array(r["embedding"], dtype=np.float64) * 1e6 + 0.5)
        n2 = float((q * q).sum())
        if n2 == 0:
            continue
        vq = np.trunc(q / np.sqrt(n2) * 1e6 + 0.5)
        by_label.setdefault(r["label"], []).append(vq)
    for label, vecs in by_label.items():
        n = len(vecs)
        if n < 2:
            assert out[label]["mean_pairwise_cosine"] is None
            continue
        s = sum(
            float(np.dot(a, b))
            for a, b in itertools.permutations(vecs, 2)
        )
        expected = s / (n * (n - 1)) / 1e12
        got = out[label]["mean_pairwise_cosine"]
        assert abs(got - expected) < 2e-6, (label, got, expected)


def test_emb_gram_diagonal_is_nonnegative_variance(spark):
    """K109 sanity: cov(i,i) >= 0 for every dimension and e_xy(i,i) >=
    cov(i,i) - the mean-square always dominates the variance."""
    from ksql_spark.registry import all_specs

    rows = (
        all_specs()["llm_emb_gram"]
        .builder(spark, "/root/testdata/sf0.001")
        .where("i = j")
        .collect()
    )
    assert len(rows) == 64
    for r in rows:
        assert r["cov"] >= -1e-6, r
        assert r["e_xy"] >= r["cov"] - 1e-6, r


def test_kappa_bounded_and_chance_corrected(spark):
    """K111: kappa in [-1, 1] and never exceeds raw agreement po when
    agreement beats chance (the chance correction only subtracts)."""
    from ksql_spark.registry import all_specs

    rows = (
        all_specs()["llm_lang_kappa"]
        .builder(spark, "/root/testdata/sf0.01")
        .collect()
    )
    assert rows
    for r in rows:
        if r["kappa"] is None:
            continue
        assert -1.0 - 1e-9 <= r["kappa"] <= 1.0 + 1e-9, dict(r.asDict())
        assert r["n11"] + r["n10"] + r["n01"] + r["n00"] == r["n"]


def test_jsd_bits_bounded_zero_one(spark):
    """D34: Jensen-Shannon divergence in bits is bounded [0, 1] — the
    property that makes it an alertable drift score."""
    from ksql_spark.registry import all_specs

    rows = (
        all_specs()["orders_priority_mix_jsd"]
        .builder(spark, "/root/testdata/sf0.01")
        .collect()
    )
    assert rows
    for r in rows:
        assert -1e-6 <= r["jsd_bits"] <= 1.0 + 1e-6, dict(r.asDict())


def test_stl_additive_identity_exact(spark):
    """D35: observed == trend + seasonal + resid EXACTLY (1e-6 grid) on
    every interior row — the recombination is integer arithmetic by
    construction, so the identity has no float slack at all."""
    from ksql_spark.registry import all_specs

    rows = (
        all_specs()["events_stl_daily_decompose"]
        .builder(spark, "/root/testdata/sf0.01")
        .collect()
    )
    interior = [r for r in rows if r["trend"] is not None]
    assert interior
    for r in interior:
        lhs = round(r["c"] * 1e6)
        rhs = round((r["trend"] + r["seasonal"] + r["resid"]) * 1e6)
        assert lhs == rhs, dict(r.asDict())


def test_landmark_distance_triangle_inequality(spark):
    """L13: the sketch's defining property — for every node pair (u, v)
    reached by a common landmark, d(u,l) + d(l,v) >= the true 3-hop BFS
    distance wherever graph_bfs knows it (landmark 0 == BFS root)."""
    from ksql_spark.registry import all_specs

    S = all_specs()
    sf = "/root/testdata/sf0.001"
    lm = {
        (r["landmark"], r["suppkey"]): r["dist"]
        for r in S["graph_landmark_distances"].builder(spark, sf).collect()
    }
    bfs = {
        r["suppkey"]: r["depth"]
        for r in S["graph_bfs"].builder(spark, sf).collect()
    }
    common = [k for k in bfs if (0, k) in lm]
    assert common
    for k in common:
        # landmark 0 distances within 3 rounds must agree with BFS on
        # nodes BFS reached in <= 3 hops, and never undershoot
        if bfs[k] <= 3:
            assert lm[(0, k)] == bfs[k], (k, lm[(0, k)], bfs[k])


def test_growth_accounting_identity(spark):
    """D47's defining identities on real data: per week,
    new + retained + resurrected == distinct active users, and
    churned(w) == active(w-1) - retained(w) for interior weeks."""
    from pyspark.sql import functions as F

    from ksql_spark.registry import all_specs

    sf = "/root/testdata/sf0.01"
    rows = {
        r["week"]: r
        for r in all_specs()["events_growth_accounting"]
        .builder(spark, sf)
        .collect()
    }
    actives = {
        r["week"]: r["n"]
        for r in spark.read.parquet(f"{sf}/events.parquet")
        .select("user_id", F.date_trunc("week", "ts").alias("week"))
        .distinct()
        .groupBy("week")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(rows) >= set(actives)
    for wk, n_active in actives.items():
        r = rows[wk]
        assert r["n_new"] + r["n_retained"] + r["n_resurrected"] == n_active
    weeks = sorted(actives)
    for prev, cur in zip(weeks, weeks[1:]):
        r = rows[cur]
        assert r["n_churned"] == actives[prev] - r["n_retained"], (prev, cur)


def test_ivf_sample_order_invariant(spark):
    """The IVF/PQ training reservoir must be a pure function of vec_id VALUES:
    permuting the input partitioning must select the identical sample set
    (VERDICT r6 item 3 — limit() was first-partitions-biased)."""
    from ksql_spark.queries.llm import _reservoir_sample

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    cap = 64
    natural = [r.vec_id for r in _reservoir_sample(e, cap).collect()]
    shuffled = [
        r.vec_id
        for r in _reservoir_sample(e.repartition(7, F.col("embedding")), cap).collect()
    ]
    reversed_ = [
        r.vec_id
        for r in _reservoir_sample(
            e.orderBy(F.col("vec_id").desc()).repartition(3), cap
        ).collect()
    ]
    assert natural == shuffled == reversed_
    assert len(natural) == cap
    # and it is NOT simply the first rows of the file (a real corpus-wide draw)
    first_cap = [r.vec_id for r in e.orderBy("vec_id").limit(cap).collect()]
    assert set(natural) != set(first_cap)


def test_centroid_cache_key_tracks_data_changes(tmp_path):
    """_emb_fingerprint must change when the files under an sf_dir change, so
    _CENTROID_CACHE can never serve stale centroids (VERDICT r6 item 4)."""
    import shutil

    from ksql_spark.queries.llm import _emb_fingerprint

    src = f"{SF_DIR}/embeddings.parquet"
    dst_dir = tmp_path / "sf"
    dst_dir.mkdir()
    dst = dst_dir / "embeddings.parquet"
    if __import__("os").path.isdir(src):
        shutil.copytree(src, dst)
    else:
        shutil.copy2(src, dst)
    fp1 = _emb_fingerprint(str(dst_dir))
    assert fp1[0] >= 1 and fp1[1] > 0
    # touch-with-content-change: append a byte to one file
    target = (
        next(p for p in sorted(dst.rglob("*")) if p.is_file())
        if dst.is_dir()
        else dst
    )
    with open(target, "ab") as f:
        f.write(b"\0")
    fp2 = _emb_fingerprint(str(dst_dir))
    assert fp1 != fp2


def test_minhash_paths_cross_agreement(spark):
    """Cross-path agreement law (VERDICT r6 item 4) for the three rows-only
    dedup entries: at equal jaccard thresholds on the planted-dup fixture,
    the production xxhash path's pair set CONTAINS the portable md5 path's
    pair set, and both contain every planted pair. The two paths use
    different shingle families (the xxhash path's word shingles are coarser
    on this synthetic corpus, so it legitimately surfaces MORE true pairs);
    containment + planted-recall is the strongest law that holds across
    families, and it pins the rows-only path to the oracle-exact one."""
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .limit(100)
    )
    near = docs.where(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.lit("zzz "), F.expr("substring(text, 5)")).alias("text"),
    )
    exact = docs.where((F.col("doc_id") >= 10) & (F.col("doc_id") < 15)).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(near).unionByName(exact)
    xx = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_near_dups(
            corpus, "text", "doc_id", k=40, bands=8, jaccard_threshold=0.5
        ).collect()
    }
    pt = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_near_dups_portable(
            corpus, "text", "doc_id", n_hash=16, rows_per_band=2,
            jaccard_threshold=0.5,
        ).collect()
    }
    planted = {(10 + i, 200010 + i) for i in range(5)}
    assert planted <= pt and planted <= xx
    missing = pt - xx
    assert not missing, f"portable-only pairs (containment broken): {sorted(missing)[:10]}"


def _planted_corpus(spark):
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .limit(80)
    )
    exact = docs.where(F.col("doc_id") < 8).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text"
    )
    return docs.unionByName(exact), {(i, 200000 + i) for i in range(8)}


def test_dedup_cluster_paths_cross_agreement(spark):
    """Agreement law for the rows-only llm_dedup_cluster (VERDICT r6 item 4):
    on a corpus with planted exact copies, (a) both hash families co-cluster
    every exact-copy pair (identical texts have identical signatures under
    ANY hash family), and (b) the portable path's co-cluster relation is
    CONTAINED in the xxhash path's (same containment as the pair-level law —
    components of a supergraph only merge, never split)."""
    from ksql_spark.queries.graph import connected_components

    corpus, planted = _planted_corpus(spark)

    def clusters(pairs_df):
        half = pairs_df.select(
            F.col("doc_a").alias("s1"), F.col("doc_b").alias("s2")
        )
        adj = half.unionByName(
            half.select(F.col("s2").alias("s1"), F.col("s1").alias("s2"))
        )
        labels = {
            r["suppkey"]: r["component"]
            for r in connected_components(adj).collect()
        }
        return labels

    xx = clusters(
        dedup.minhash_near_dups(
            corpus, "text", "doc_id", k=40, bands=4, jaccard_threshold=0.8
        )
    )
    pt = clusters(
        dedup.minhash_near_dups_portable(
            corpus, "text", "doc_id", n_hash=16, rows_per_band=2,
            jaccard_threshold=0.8,
        )
    )
    for a, b in planted:
        assert xx.get(a) is not None and xx[a] == xx[b], (a, b, "xx split")
        assert pt.get(a) is not None and pt[a] == pt[b], (a, b, "pt split")
    # containment: any two docs the portable path co-clusters, xx co-clusters
    ids = list(pt)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if pt[a] == pt[b]:
                assert xx.get(a) == xx.get(b), (a, b, "portable-only merge")


def test_simhash_paths_cross_agreement(spark):
    """Agreement law for the rows-only llm_dedup_simhash: exactly-equal
    texts receive ONE fingerprint per path (the cross-family invariant —
    near-copies may split differently because the bit votes come from
    different hash families, and that divergence is documented here)."""
    corpus, planted = _planted_corpus(spark)
    xx = {
        r["doc_id"]: r["sh"]
        for r in corpus.select(
            "doc_id", dedup.simhash32("text").alias("sh")
        ).collect()
    }
    hs = F.transform(
        F.array_distinct(F.split(F.col("text"), " ")),
        lambda x: F.conv(F.substring(F.md5(x.cast("binary")), 1, 8), 16, 10).cast(
            "long"
        ),
    )
    bit_terms = " + ".join(
        f"(CASE WHEN size(filter(hs, h -> shiftright(h, {j}) % 2 = 1)) * 2 "
        f"> size(hs) THEN {1 << j}L ELSE 0L END)"
        for j in range(32)
    )
    pt = {
        r["doc_id"]: r["sh"]
        for r in corpus.select("doc_id", hs.alias("hs"))
        .select("doc_id", F.expr(f"CAST({bit_terms} AS BIGINT)").alias("sh"))
        .collect()
    }
    for a, b in planted:
        assert xx[a] == xx[b], (a, b, "xx fingerprints differ on exact copy")
        assert pt[a] == pt[b], (a, b, "portable fingerprints differ on exact copy")


def test_ann_paths_cross_agreement(spark):
    """Cross-path agreement laws (VERDICT r7 item 3) for the three rows-only
    ANN entries, each pinned against its ORACLE-EXACT portable sibling on the
    same corpus with llm_sim_topk (exact cosine) as the shared anchor:

      * IVF: the MLlib-KMeans path and the portable fixed-codebook path
        probe the same clustered corpus — their top-5 sets must overlap
        >= 0.4 on average (measured 0.60 at sf0.01), and the trained path's
        recall vs exact must not trail the portable path's by more than 0.2.
      * LSH: random-hyperplane engine path vs portable banded path — average
        top-5 overlap >= 0.5 (measured 0.80).
      * PQ: the portable sibling deliberately uses a random-sample codebook
        (its value is oracle-exact ADC mechanics, not retrieval quality), so
        overlap is NOT the law; the law is quality ORDERING — the engine's
        KMeans-trained codebook must beat the random-sample codebook's
        recall vs exact by >= 0.1 (measured 0.40 vs 0.07).
    """
    specs = all_specs()

    def topk_sets(key):
        out = {}
        for r in specs[key].builder(spark, SF_DIR).collect():
            out.setdefault(r["query_id"], set()).add(r["vec_id"])
        return out

    exact = topk_sets("llm_sim_topk")

    def recall(sets_):
        vals = [
            len(sets_.get(q, set()) & exact[q]) / len(exact[q]) for q in exact
        ]
        return sum(vals) / len(vals)

    def overlap(a, b):
        qs = sorted(set(a) | set(b))
        vals = [
            len(a.get(q, set()) & b.get(q, set())) / max(1, len(b.get(q, set())))
            for q in qs
        ]
        return sum(vals) / len(vals)

    ivf, ivf_p = topk_sets("ann_ivf_topk"), topk_sets("ann_ivf_topk_portable")
    assert overlap(ivf, ivf_p) >= 0.4, overlap(ivf, ivf_p)
    assert recall(ivf) >= recall(ivf_p) - 0.2, (recall(ivf), recall(ivf_p))

    lsh, lsh_p = topk_sets("ann_lsh_topk"), topk_sets("ann_lsh_topk_portable")
    assert overlap(lsh, lsh_p) >= 0.5, overlap(lsh, lsh_p)

    pq, pq_p = topk_sets("ann_pq_topk"), topk_sets("ann_pq_topk_portable")
    assert recall(pq) >= recall(pq_p) + 0.1, (recall(pq), recall(pq_p))


def _global_exact_dropped(spark, threshold=0.35):
    """Ground truth for the SemDeDup laws: vec_ids having ANY lower-id
    neighbor (no cluster blocking) at cosine >= threshold. All-pairs is fine
    at fixture scale — this is the law's oracle, not a production path."""
    from ksql_spark.operators import vectors

    e = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding", vectors.l2_norm("embedding").alias("nrm"))
    )
    a, b = e.alias("a"), e.alias("b")
    cos = F.try_divide(
        vectors.dot(F.col("a.embedding"), F.col("b.embedding")),
        F.col("a.nrm") * F.col("b.nrm"),
    )
    return {
        r.v
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .where(cos >= threshold)
        .select(F.col("b.vec_id").alias("v"))
        .distinct()
        .collect()
    }


def test_semantic_dedup_scaled_laws(spark):
    """llm_semantic_dedup_scaled (KMeans K ∝ n production codebook) laws:

    * precision 1.0, EXACT: cluster blocking only restricts which pairs are
      compared, so every dropped vector must have a real lower-id global
      neighbor at cosine >= t — a drop outside the global-exact set would
      mean the pair stage compared a pair it invented;
    * recall >= 0.5 vs global-exact dedup (same gate as the ANN family);
    * schema identical to the oracle-exact fixed-centroid twin, so the
      driver sees one stable contract across both paths.
    """
    specs = all_specs()
    scaled = specs["llm_semantic_dedup_scaled"].builder(spark, SF_DIR)
    twin = specs["llm_semantic_dedup"].builder(spark, SF_DIR)
    assert scaled.schema == twin.schema
    rows = scaled.collect()
    truth = _global_exact_dropped(spark)
    got = {r.vec_id for r in rows if r.dropped}
    assert got <= truth, f"unjustified drops: {sorted(got - truth)[:10]}"
    assert truth, "fixture must exercise the decision (threshold calibration)"
    recall = len(got & truth) / len(truth)
    assert recall >= 0.5, f"SemDeDup-scaled recall too low: {recall:.2f}"
    # rows cover the whole corpus exactly once
    n = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert len(rows) == n and len({r.vec_id for r in rows}) == n


def test_semantic_dedup_twin_paths_share_pair_stage(spark):
    """Both SemDeDup spellings must flow through _semantic_dedup_decide —
    byte-identical drop rule, threshold, and bucket fan-out — so the
    oracle-exact twin's driver evidence transfers to the production path.
    Pinned structurally: with the SAME assignment input, the two decisions
    are the same DataFrame graph (here: exact equality of results when the
    production path is given the fixed-centroid assignment)."""
    from ksql_spark.queries.llm import _assign_fixed_centroids, _semantic_dedup_decide

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    m = _assign_fixed_centroids(e)
    via_helper = {
        (r.vec_id, r.cent_id, r.dropped)
        for r in _semantic_dedup_decide(m).collect()
    }
    twin = {
        (r.vec_id, r.cent_id, r.dropped)
        for r in all_specs()["llm_semantic_dedup"].builder(spark, SF_DIR).collect()
    }
    assert via_helper == twin


def test_sampled_medoids_law_top_decile(spark):
    """llm_cluster_medoids_sampled law: per cluster, the sampled-estimate
    medoid's EXACT total cost must rank in the top decile (and never worse
    than rank 3) of that cluster's exact Σ-distance ranking — the CLARA-
    style guarantee the production path trades exactness for. Also pins
    determinism (two runs, identical rows) and that every cluster present
    in the exact twin is present here."""
    from ksql_spark.operators import vectors

    specs = all_specs()
    got = {r.cent_id: r for r in specs["llm_cluster_medoids_sampled"].builder(spark, SF_DIR).collect()}
    again = {r.cent_id: r for r in specs["llm_cluster_medoids_sampled"].builder(spark, SF_DIR).collect()}
    assert {k: (v.medoid_id, v.sampled_cost) for k, v in got.items()} == {
        k: (v.medoid_id, v.sampled_cost) for k, v in again.items()
    }
    exact = {r.cent_id: r for r in specs["llm_cluster_medoids"].builder(spark, SF_DIR).collect()}
    assert set(got) == set(exact)
    # exact per-member costs, computed brute-force at fixture scale
    from ksql_spark.queries.llm import _assign_fixed_centroids

    m = _assign_fixed_centroids(
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    ).select("vec_id", "embedding", "cent_id")
    x, y = m.alias("x"), m.alias("y")
    dq = (
        vectors.l2_sq_dist(F.col("x.embedding"), F.col("y.embedding")) * 1000000
        + F.lit(0.5)
    ).cast("long")
    costs = (
        x.join(
            y,
            (F.col("x.cent_id") == F.col("y.cent_id"))
            & (F.col("x.vec_id") != F.col("y.vec_id")),
        )
        .groupBy(F.col("x.cent_id").alias("cent_id"), F.col("x.vec_id").alias("vec_id"))
        .agg(F.sum(dq).alias("cost_q"))
        .collect()
    )
    by_cluster: dict = {}
    for r in costs:
        by_cluster.setdefault(r.cent_id, []).append((r.cost_q, r.vec_id))
    for cid, rows in by_cluster.items():
        ranking = [v for _, v in sorted(rows)]
        pick = got[cid].medoid_id
        rank = ranking.index(pick) + 1
        bound = max(3, len(ranking) // 10)
        assert rank <= bound, (
            f"cluster {cid}: sampled medoid {pick} ranks {rank}/{len(ranking)}"
            f" (bound {bound})"
        )


def test_pipeline_e2e_scaled_identity_law(spark):
    """llm_pipeline_e2e_scaled (VERDICT r9 item 3) identity law on the
    fixture: the production pipeline's survivor set must equal the
    oracle-exact pipeline's survivors MINUS the scaled SemDeDup drops
    (the only stage the production path adds), and every row's
    (cent_id, medoid_id) must match the sampled-medoid entry for the
    row's fixed-centroid cluster. This ties the rows-only production
    composite back to driver-hash-checked evidence."""
    specs = all_specs()
    scaled = specs["llm_pipeline_e2e_scaled"].builder(spark, SF_DIR).collect()
    exact = specs["llm_pipeline_e2e"].builder(spark, SF_DIR).collect()
    sem_dropped = {
        r.vec_id
        for r in specs["llm_semantic_dedup_scaled"].builder(spark, SF_DIR).collect()
        if r.dropped
    }
    exact_by_id = {r.doc_id: r for r in exact}
    want_ids = set(exact_by_id) - sem_dropped
    got_by_id = {r.doc_id: r for r in scaled}
    assert set(got_by_id) == want_ids
    # per-row metrics identical to the exact pipeline's
    for did, r in got_by_id.items():
        ex = exact_by_id[did]
        assert (r.n_tokens, r.quality, r.emb_norm) == (
            ex.n_tokens, ex.quality, ex.emb_norm,
        ), did
    # shard anchors match the sampled-medoid entry per cluster
    medoids = {
        r.cent_id: r.medoid_id
        for r in specs["llm_cluster_medoids_sampled"].builder(spark, SF_DIR).collect()
    }
    from ksql_spark.queries.llm import _assign_fixed_centroids

    assign = {
        r.vec_id: r.cent_id
        for r in _assign_fixed_centroids(
            spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        ).collect()
    }
    for did, r in got_by_id.items():
        assert r.cent_id == assign[did], did
        assert r.medoid_id == medoids[r.cent_id], did


def test_dedup_cluster_collapse_equals_uncollapsed_below_cap(spark, tmp_path):
    """Equivalence law for the r10 exact-collapse posture: on any corpus
    whose exact-dup groups stay under minhash_near_dups' bucket cap, the
    collapse-first cluster output must be IDENTICAL to the un-collapsed
    spelling (pairs over all docs -> components -> left-join map). The
    planted corpus mixes exact groups of depth 1/2/5, chained near-dups
    across groups, and singletons."""
    from ksql_spark.queries.graph import connected_components
    from ksql_spark.registry import all_specs

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon") * 3
    near = base.replace("alpha", "ALPHA", 1)
    far = ("one two three four five six seven eight nine ten eleven "
           "twelve thirteen fourteen fifteen sixteen") * 3
    texts = [base] * 5 + [near] * 2 + [far] + [f"uniq{i} " * 40 for i in range(4)]
    df = spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).repartition(7)  # partition order must not matter
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    got = {
        r["doc_id"]: (r["canonical_id"], r["is_canonical"])
        for r in all_specs()["llm_dedup_cluster"].builder(spark, str(tmp_path)).collect()
    }

    # un-collapsed reference: the pre-r10 spelling, inline
    d = spark.read.parquet(f"{tmp_path}/documents.parquet")
    pairs = dedup.minhash_near_dups(
        d, "text", "doc_id", k=40, bands=4, jaccard_threshold=0.8
    )
    half = pairs.select(F.col("doc_a").alias("s1"), F.col("doc_b").alias("s2"))
    adj = half.unionByName(
        half.select(F.col("s2").alias("s1"), F.col("s1").alias("s2"))
    )
    labels = {
        r["suppkey"]: r["component"] for r in connected_components(adj).collect()
    }
    want = {}
    for i in range(len(texts)):
        canon = labels.get(i, i)
        want[i] = (canon, i == canon)
    assert got == want


def test_semantic_dedup_hier_laws(spark):
    """llm_semantic_dedup_hier (two-level production codebook) laws — the
    same contract as the flat scaled sibling, so evidence transfers:

    * precision 1.0, EXACT: fine-cell blocking only restricts which pairs
      are compared, so every drop must exist in the global-exact set;
    * recall >= 0.5 vs global-exact dedup;
    * schema identical to the oracle-exact fixed-centroid twin;
    * full-corpus coverage, each vector exactly once;
    * sub-fits are partitioning-independent: identical output from a
      7-way repartitioned session run (groups sort by vec_id before
      fitting, reservoirs are hash-ranked)."""
    specs = all_specs()
    hier = specs["llm_semantic_dedup_hier"].builder(spark, SF_DIR)
    twin = specs["llm_semantic_dedup"].builder(spark, SF_DIR)
    assert hier.schema == twin.schema
    rows = hier.collect()
    truth = _global_exact_dropped(spark)
    got = {r.vec_id for r in rows if r.dropped}
    assert got <= truth, f"unjustified drops: {sorted(got - truth)[:10]}"
    assert truth
    recall = len(got & truth) / len(truth)
    assert recall >= 0.5, f"hier SemDeDup recall too low: {recall:.2f}"
    n = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert len(rows) == n and len({r.vec_id for r in rows}) == n
    # effective codebook is genuinely hierarchical: >1 coarse cell used
    assert len({r.cent_id // 100000 for r in rows}) >= 2


def test_pipeline_e2e_hier_identity_law(spark):
    """llm_pipeline_e2e_hier (VERDICT r10 item 3) identity law on the
    fixture: the hier production pipeline's survivor set must equal the
    oracle-exact pipeline's survivors MINUS the hier SemDeDup drops (the
    only stage that differs from the exact path), with per-row metrics and
    (cent_id, medoid_id) shard anchors byte-equal to the exact twin's —
    the same law that ties llm_pipeline_e2e_scaled to driver-hash-checked
    evidence, now covering the past-the-K-cap switch target."""
    specs = all_specs()
    hier = specs["llm_pipeline_e2e_hier"].builder(spark, SF_DIR).collect()
    exact = specs["llm_pipeline_e2e"].builder(spark, SF_DIR).collect()
    sem_dropped = {
        r.vec_id
        for r in specs["llm_semantic_dedup_hier"].builder(spark, SF_DIR).collect()
        if r.dropped
    }
    exact_by_id = {r.doc_id: r for r in exact}
    want_ids = set(exact_by_id) - sem_dropped
    got_by_id = {r.doc_id: r for r in hier}
    assert set(got_by_id) == want_ids
    for did, r in got_by_id.items():
        ex = exact_by_id[did]
        assert (r.n_tokens, r.quality, r.emb_norm) == (
            ex.n_tokens, ex.quality, ex.emb_norm,
        ), did
    medoids = {
        r.cent_id: r.medoid_id
        for r in specs["llm_cluster_medoids_sampled"].builder(spark, SF_DIR).collect()
    }
    from ksql_spark.queries.llm import _assign_fixed_centroids

    assign = {
        r.vec_id: r.cent_id
        for r in _assign_fixed_centroids(
            spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        ).collect()
    }
    for did, r in got_by_id.items():
        assert r.cent_id == assign[did], did
        assert r.medoid_id == medoids[r.cent_id], did
