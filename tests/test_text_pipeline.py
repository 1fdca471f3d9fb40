"""Behavior tests for the [EXT] text-pipeline operators (chunking, scrubbing,
repetition scoring) and connected components — oracle parity is covered by
test_oracle.py; these pin the semantics on crafted inputs."""

from __future__ import annotations

from ksql_spark.queries.graph import connected_components
from ksql_spark.queries.text_pipeline import CHUNK, STRIDE
from ksql_spark.registry import all_specs


def _doc_df(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_chunking_overlap(spark, tmp_path):
    words = [f"w{i}" for i in range(120)]
    df = _doc_df(spark, [" ".join(words)])
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = all_specs()["llm_chunk_sliding"].builder(spark, str(tmp_path))
    rows = {r.chunk_idx: r for r in out.collect()}
    # starts at 0, 25, 50, 75, 100 → 5 chunks
    assert sorted(rows) == [0, 1, 2, 3, 4]
    assert rows[0].chunk_text.split(" ") == words[:CHUNK]
    assert rows[1].chunk_text.split(" ") == words[STRIDE : STRIDE + CHUNK]
    assert rows[4].n_tokens == 20  # 120 - 100 trailing tokens
    assert rows[4].chunk_text.split(" ") == words[100:]


def test_chunking_short_doc_single_chunk(spark, tmp_path):
    df = _doc_df(spark, ["only three words"])
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    rows = all_specs()["llm_chunk_sliding"].builder(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0].chunk_text == "only three words"
    assert rows[0].n_tokens == 3


def test_scrub_redacts_injected_pii(spark, tmp_path):
    df = _doc_df(spark, ["clean text"])
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    row = all_specs()["llm_scrub_pii"].builder(spark, str(tmp_path)).collect()[0]
    assert "<EMAIL>" in row.scrubbed and "<URL>" in row.scrubbed
    assert "<NUM>" in row.scrubbed
    assert "@example.com" not in row.scrubbed
    assert row.scrubbed.startswith("clean text")
    assert row.chars_removed > 0


def test_repetition_ratio_bounds(spark, tmp_path):
    df = _doc_df(
        spark,
        [
            "a b a b a b a b",  # 7 bigrams, 2 distinct
            "all words here distinct",  # 3 bigrams, all distinct
            "single",  # no bigrams → ratio 1.0 by convention
        ],
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {
        r.doc_id: r
        for r in all_specs()["llm_repetition_ratio"].builder(spark, str(tmp_path)).collect()
    }
    assert out[0].n_bigrams == 7 and abs(out[0].uniq_ratio - 2 / 7) < 1e-12
    assert out[1].uniq_ratio == 1.0
    assert out[2].n_bigrams == 0 and out[2].uniq_ratio == 1.0


def test_connected_components_two_cliques(spark):
    # nodes {1,2,3} form one component, {10,11} another (symmetric adjacency)
    pairs = [(1, 2), (2, 3), (10, 11)]
    edges = pairs + [(b, a) for a, b in pairs] + [(n, n) for n in (1, 2, 3, 10, 11)]
    adj = spark.createDataFrame(edges, "s1 long, s2 long")
    got = {r.suppkey: r.component for r in connected_components(adj).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_dedup_cluster_chained_duplicates(spark, tmp_path):
    """A~B and B~C near-dups (never A~C directly) must land in ONE cluster
    with min doc_id canonical; unrelated docs stay singletons."""
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon") * 3
    a = base
    b = base.replace("alpha", "ALPHA", 1)          # ~identical to a
    c = base.replace("alpha", "ALPHA", 1).replace("beta", "BETA", 1)  # ~ b
    other = ("one two three four five six seven eight nine ten eleven "
             "twelve thirteen fourteen fifteen sixteen") * 3
    df = _doc_df(spark, [a, b, c, other])
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {
        r.doc_id: (r.canonical_id, r.is_canonical)
        for r in all_specs()["llm_dedup_cluster"].builder(spark, str(tmp_path)).collect()
    }
    assert out[0] == (0, True)
    assert out[1] == (0, False) and out[2] == (0, False)
    assert out[3] == (3, True)


def test_dedup_cluster_null_and_empty_text_stay_self_canonical(spark, tmp_path):
    """NULL-text and empty-text documents must SURVIVE clustering as
    self-canonical singletons (ADVICE r10, medium): sha2(NULL) is NULL and
    a plain inner map-back join on the digest silently dropped every
    NULL-text doc from the output. Also pins that two NULL-text docs are
    NOT merged with each other (NULL is "unknown", not "identical") while
    two EMPTY-text docs DO collapse (identical content, exact-dedup path),
    and that real duplicates still cluster alongside the degenerate rows."""
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon") * 3
    rows = [
        (0, base), (1, base),      # exact dups -> cluster at 0
        (2, None), (3, None),      # NULL text -> each its own singleton
        (4, ""), (5, ""),          # empty text -> identical -> collapse at 4
        (6, "solo doc " * 30),     # ordinary singleton
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "src", len(t) if t else 0) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {
        r.doc_id: (r.canonical_id, r.is_canonical)
        for r in all_specs()["llm_dedup_cluster"].builder(spark, str(tmp_path)).collect()
    }
    assert len(out) == 7, sorted(out)  # EVERY doc mapped — none dropped
    assert out[0] == (0, True) and out[1] == (0, False)
    assert out[2] == (2, True) and out[3] == (3, True)
    assert out[4] == (4, True) and out[5] == (4, False)
    assert out[6] == (6, True)


def test_dedup_cluster_deep_exact_group_survives_bucket_cap(spark, tmp_path):
    """The exact-collapse posture (round 10): an exact-dup group DEEPER than
    minhash_near_dups' max_bucket_size (200) must still cluster — without
    the collapse every band bucket holds the whole group, trips the cap,
    and the group loses ALL its pairs (each copy becomes its own canonical,
    the silent sf100 cliff). Also pins that a near-dup of the group's text
    still joins the cluster through the representative, and that the
    collapse never over-merges unrelated docs."""
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon") * 3
    near = base.replace("alpha", "ALPHA", 1)  # near-dup of base, distinct text
    other = ("one two three four five six seven eight nine ten eleven "
             "twelve thirteen fourteen fifteen sixteen") * 3
    texts = [base] * 240 + [near, other]  # 240 > max_bucket_size=200
    df = _doc_df(spark, texts)
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {
        r.doc_id: (r.canonical_id, r.is_canonical)
        for r in all_specs()["llm_dedup_cluster"].builder(spark, str(tmp_path)).collect()
    }
    assert len(out) == 242
    # every exact copy maps to the group minimum, only doc 0 is canonical
    for i in range(240):
        assert out[i] == (0, i == 0), (i, out[i])
    # the near-dup reaches the cluster through the representative
    assert out[240] == (0, False)
    # the unrelated doc stays a singleton
    assert out[241] == (241, True)
