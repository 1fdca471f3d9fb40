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


# ---------------------------------------------------------------------------
# K150 IVF tier — laws vs the brute sibling
# ---------------------------------------------------------------------------

def test_semdecon_ivf_exact_on_small_corpus_via_flat_fallback(spark):
    """Below 64*K vectors the shared flat-search fallback probes ALL
    cells, so on the driver fixture the IVF tier must be ROW-IDENTICAL
    to the brute tier (same doc set, same nearest, same quantized cosine,
    same flag)."""
    brute = {
        r["doc_id"]: r
        for r in SPECS["llm_semantic_decontaminate"]
        .builder(spark, SF_DIR)
        .collect()
    }
    ivf = {
        r["doc_id"]: r
        for r in SPECS["llm_semantic_decontaminate_ivf"]
        .builder(spark, SF_DIR)
        .collect()
    }
    assert set(brute) == set(ivf) and brute
    for k in brute:
        assert ivf[k]["nearest_eval_id"] == brute[k]["nearest_eval_id"]
        assert ivf[k]["max_cos"] == brute[k]["max_cos"]
        assert ivf[k]["contaminated"] == brute[k]["contaminated"]


def _planted_embedding_corpus():
    """> 64*K vectors so real IVF pruning engages (no flat fallback):
    8 well-separated clusters on distinct basis pairs, eval ids are
    multiples of 29, and 10 planted train vectors are tiny perturbations
    of eval vectors (cos > 0.999 — paraphrase-level contamination the
    IVF tier MUST recall)."""
    dim = 64
    rows = []
    vid = 1
    eval_rows = []
    # 8 clusters x 150 train vectors = 1200 (> 1024 -> nprobe stays 4)
    for c in range(8):
        base = [0.0] * dim
        base[c * 2] = 10.0
        base[c * 2 + 1] = 3.0
        for j in range(150):
            v = list(base)
            # deterministic small within-cluster spread
            v[c * 2] += ((j * 7) % 13) * 0.05
            v[c * 2 + 1] += ((j * 11) % 17) * 0.05
            v[(c * 2 + 2) % dim] += ((j * 3) % 5) * 0.04
            while vid % 29 == 0:  # keep train ids off the eval split
                vid += 1
            rows.append((vid, [float(x) for x in v], c))
            vid += 1
    # one eval vector per cluster, sitting inside the cluster cloud
    for c in range(8):
        base = [0.0] * dim
        base[c * 2] = 10.3
        base[c * 2 + 1] = 3.2
        eid = 29 * (c + 1)
        eval_rows.append((eid, [float(x) for x in base], c))
    # 10 planted near-copies of eval vectors (train side)
    planted = []
    for i in range(10):
        c = i % 8
        src = eval_rows[c][1]
        v = list(src)
        v[(c * 2 + 3) % dim] += 0.01  # ~cos 0.9999
        pid = 100000 + i
        while pid % 29 == 0:
            pid += 1
        planted.append(pid)
        rows.append((pid, [float(x) for x in v], c))
    return rows + eval_rows, planted


def test_semdecon_ivf_laws_under_real_pruning(spark, tmp_path):
    rows, planted = _planted_embedding_corpus()
    _write_embeddings(spark, tmp_path, rows)
    brute = {
        r["doc_id"]: r
        for r in SPECS["llm_semantic_decontaminate"]
        .builder(spark, str(tmp_path))
        .collect()
    }
    ivf = {
        r["doc_id"]: r
        for r in SPECS["llm_semantic_decontaminate_ivf"]
        .builder(spark, str(tmp_path))
        .collect()
    }
    # row-set parity: every train doc reports, in both tiers
    assert set(ivf) == set(brute) and len(ivf) > 1024
    # bound law: pruning can only DROP candidates, never raise the max
    for k, r in ivf.items():
        if r["max_cos"] is not None:
            assert r["max_cos"] <= brute[k]["max_cos"] + 1e-9
    # flag law: ivf-flagged is a subset of brute-flagged
    assert all(
        brute[k]["contaminated"]
        for k, r in ivf.items()
        if r["contaminated"]
    )
    # recall law: every planted near-copy is flagged by BOTH tiers with
    # the right nearest eval — a contaminated pair lands in the same
    # coarse cell with margin, so pruning cannot lose it
    for pid in planted:
        assert brute[pid]["contaminated"] is True
        assert ivf[pid]["contaminated"] is True
        assert ivf[pid]["nearest_eval_id"] == brute[pid]["nearest_eval_id"]


def test_semdecon_ivf_plan_shape(spark):
    """The scale contract, asserted on the executed plan: no cartesian
    product anywhere, the candidate stage is a broadcast HASH join (on
    cell), and the only nested-loop join is the bounded eval x centroids
    probe stage."""
    df = SPECS["llm_semantic_decontaminate_ivf"].builder(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1


# ---------------------------------------------------------------------------
# K28 corpus-size dispatcher — llm_pipeline_e2e_auto
# ---------------------------------------------------------------------------

def _rowset(df):
    return sorted(tuple(r) for r in df.collect())


def test_e2e_auto_routes_flat_below_boundary(spark):
    """The fixture is far below the ~1M-vector boundary: the dispatcher
    must return exactly llm_pipeline_e2e_scaled's rows."""
    auto = SPECS["llm_pipeline_e2e_auto"].builder(spark, SF_DIR)
    flat = SPECS["llm_pipeline_e2e_scaled"].builder(spark, SF_DIR)
    assert _rowset(auto) == _rowset(flat)


def test_e2e_auto_routes_hier_past_boundary(spark, monkeypatch):
    """Force the boundary under the fixture size: the dispatcher must
    return exactly llm_pipeline_e2e_hier's rows."""
    import ksql_spark.queries.llm as llm_mod

    monkeypatch.setattr(llm_mod, "_E2E_HIER_BOUNDARY", 10)
    auto = SPECS["llm_pipeline_e2e_auto"].builder(spark, SF_DIR)
    hier = SPECS["llm_pipeline_e2e_hier"].builder(spark, SF_DIR)
    assert _rowset(auto) == _rowset(hier)


def test_e2e_auto_count_is_footer_metadata_only(spark):
    """The switch input must come from parquet footers, not a Spark job:
    counting the fixture via the helper matches the real row count and
    triggers ZERO Spark jobs."""
    import ksql_spark.queries.llm as llm_mod

    sc = spark.sparkContext
    before = sc.statusTracker().getJobIdsForGroup(None)
    n = llm_mod._emb_count_meta(SF_DIR)
    after = sc.statusTracker().getJobIdsForGroup(None)
    assert len(after) == len(before)
    assert n == spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
