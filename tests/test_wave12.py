"""Semantic micro-fixture tests + law pins for the round-12 wave
(collapsed winnowing, IVF-tier semantic decontamination, the e2e
flat/hier corpus-size dispatcher). The driver oracle check proves
cross-engine parity; these pin SEMANTICS and the production-sibling
equivalence/recall laws against planted probes."""

from __future__ import annotations

import pytest

from ksql_spark.registry import all_specs

from .conftest import SF_DIR

SPECS = all_specs()


def _write_documents(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")


def _write_embeddings(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")


# ---------------------------------------------------------------------------
# K148 production sibling — exact-collapse before winnowing
# ---------------------------------------------------------------------------

def _pairs(rows):
    return {
        (r["doc_a"], r["doc_b"]): (r["n_shared"], r["overlap"]) for r in rows
    }


def test_winnowing_collapsed_equals_raw_on_dup_free_corpus(spark, tmp_path):
    """Equivalence law: with no exact duplicates, the collapse is the
    identity map (every doc is its own representative), so the collapsed
    entry must be ROW-IDENTICAL to the raw one."""
    shared = "one two three four five six seven eight nine ten"
    docs = [
        (1, f"{shared} aaa bbb ccc ddd eee", "en", "s", 10),
        (2, f"zzz yyy xxx www vvv {shared}", "en", "s", 10),
        (3, f"{shared} fff ggg hhh iii jjj kkk", "en", "s", 10),
        (4, "another unrelated document with its own private vocabulary",
            "en", "s", 10),
    ]
    _write_documents(spark, tmp_path, docs)
    raw = _pairs(
        SPECS["llm_winnowing_pairs"].builder(spark, str(tmp_path)).collect()
    )
    col = _pairs(
        SPECS["llm_winnowing_pairs_collapsed"]
        .builder(spark, str(tmp_path))
        .collect()
    )
    assert raw == col and raw  # identical, and non-trivially so


def test_winnowing_collapsed_kills_replica_clique_blowup(spark, tmp_path):
    """A d-deep verbatim clique pairs d(d-1)/2 times raw; collapsed it
    contributes ZERO intra-clique pairs, and its cross-corpus shared-run
    pair survives once under the representative id."""
    shared = "one two three four five six seven eight nine ten"
    clique = f"{shared} aaa bbb ccc ddd eee"
    docs = [(i, clique, "en", "s", 10) for i in range(1, 11)]  # d = 10
    docs.append((99, f"zzz yyy xxx www vvv {shared}", "en", "s", 10))
    _write_documents(spark, tmp_path, docs)
    raw = _pairs(
        SPECS["llm_winnowing_pairs"].builder(spark, str(tmp_path)).collect()
    )
    col = _pairs(
        SPECS["llm_winnowing_pairs_collapsed"]
        .builder(spark, str(tmp_path))
        .collect()
    )
    # raw: all 45 intra-clique pairs materialize (plus 10 vs doc 99)
    intra_raw = [(a, b) for (a, b) in raw if a != 99 and b != 99]
    assert len(intra_raw) == 45
    # collapsed: the clique is one representative (min id = 1): no
    # intra-clique pairs at all, and exactly one pair against doc 99
    intra_col = [(a, b) for (a, b) in col if a != 99 and b != 99]
    assert intra_col == []
    assert set(col) == {(1, 99)}
    # the representative's pair carries the same evidence any raw
    # clique member's pair against 99 did
    assert col[(1, 99)] == raw[(1, 99)]


def test_winnowing_collapsed_rescues_pairs_past_the_df_cap(spark, tmp_path):
    """A clique deeper than the 64-df stopgram band saturates RAW
    winnowing (every clique fingerprint exceeds the cap, so even the
    cross-corpus pair dies); collapsed, the clique counts once and the
    cross-corpus pair survives — the silent-failure mode the collapse
    exists to fix."""
    shared = "one two three four five six seven eight nine ten"
    clique = f"{shared} aaa bbb ccc ddd eee"
    docs = [(i, clique, "en", "s", 10) for i in range(1, 71)]  # d = 70 > 64
    docs.append((99, f"zzz yyy xxx www vvv {shared}", "en", "s", 10))
    _write_documents(spark, tmp_path, docs)
    raw = _pairs(
        SPECS["llm_winnowing_pairs"].builder(spark, str(tmp_path)).collect()
    )
    col = _pairs(
        SPECS["llm_winnowing_pairs_collapsed"]
        .builder(spark, str(tmp_path))
        .collect()
    )
    # raw: clique fingerprints sit in 70 docs > 64 -> dropped as
    # stopgrams; the shared-run fingerprints vs doc 99 are in 71 docs ->
    # also dropped. The true near-dup pair is silently LOST.
    assert (1, 99) not in raw
    # collapsed: clique df = 1 (one representative), shared-run df = 2
    # -> the pair is found
    assert set(col) == {(1, 99)}
