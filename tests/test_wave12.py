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


# ---------------------------------------------------------------------------
# round-12 wave micro-fixtures
# ---------------------------------------------------------------------------

import datetime
import math


def _write_orders(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")


def _write_lineitem(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")


def _d(day):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(days=day)


# ---- D101 Kruskal-Wallis ----

def test_kruskal_wallis_hand_computed(spark, tmp_path):
    # A = {1, 2}, B = {3, 4}: ranks 1..4, R_A = 3, R_B = 7,
    # H = 12/(4*5) * (9/2 + 49/2) - 3*5 = 2.4; no ties -> corrected == H
    rows = [
        (1, 1, "O", 1.0, _d(0), "A"),
        (2, 1, "O", 2.0, _d(0), "A"),
        (3, 1, "O", 3.0, _d(0), "B"),
        (4, 1, "O", 4.0, _d(0), "B"),
    ]
    _write_orders(spark, tmp_path, rows)
    r = SPECS["orders_kruskal_wallis"].builder(spark, str(tmp_path)).collect()[0]
    assert r["n"] == 4 and r["k"] == 2
    assert abs(r["h_stat"] - 2.4) < 1e-6
    assert abs(r["h_corrected"] - 2.4) < 1e-6


def test_kruskal_wallis_identical_groups_zero(spark, tmp_path):
    rows = []
    for i, g in enumerate(["A", "B", "C"] * 10):
        rows.append((i, 1, "O", float(i % 10), _d(0), g))
    _write_orders(spark, tmp_path, rows)
    r = SPECS["orders_kruskal_wallis"].builder(spark, str(tmp_path)).collect()[0]
    # the three groups hold the same value multiset -> H ~ 0
    assert abs(r["h_stat"]) < 1e-6


# ---- D102 Nelson-Aalen ----

def test_nelson_aalen_hand_computed(spark, tmp_path):
    # c1, c2 repeat after 2 days; c3 single (censored at horizon = day 2)
    rows = [
        (1, 1, "O", 10.0, _d(0), "A"), (2, 1, "O", 10.0, _d(2), "A"),
        (3, 2, "O", 10.0, _d(0), "A"), (4, 2, "O", 10.0, _d(2), "A"),
        (5, 3, "O", 10.0, _d(0), "A"),
    ]
    _write_orders(spark, tmp_path, rows)
    out = SPECS["orders_nelson_aalen"].builder(spark, str(tmp_path)).collect()
    assert len(out) == 1  # one event time (dur = 2)
    r = out[0]
    assert r["duration_days"] == 2 and r["n_risk"] == 3 and r["n_events"] == 2
    assert abs(r["cum_hazard"] - round(2 / 3, 6)) < 2e-6
    assert abs(r["na_survival"] - round(math.exp(-2 / 3), 6)) < 2e-6


# ---- D103 Atkinson ----

def test_atkinson_zero_on_equal_revenue(spark, tmp_path):
    rows = [(i, i, "O", 100.0, _d(0), "A") for i in range(1, 21)]
    _write_orders(spark, tmp_path, rows)
    r = SPECS["customer_atkinson_index"].builder(spark, str(tmp_path)).collect()[0]
    assert r["n"] == 20
    assert abs(r["atkinson_half"]) < 1e-6
    assert abs(r["atkinson_one"]) < 1e-6


def test_atkinson_orders_inequality_and_epsilon(spark, tmp_path):
    # concentrated revenue: one whale, many minnows -> A(1) > A(0.5) > 0
    rows = [(1, 1, "O", 10000.0, _d(0), "A")]
    rows += [(i, i, "O", 10.0, _d(0), "A") for i in range(2, 42)]
    _write_orders(spark, tmp_path, rows)
    r = SPECS["customer_atkinson_index"].builder(spark, str(tmp_path)).collect()[0]
    assert 0 < r["atkinson_half"] < r["atkinson_one"] < 1


# ---- D104 Brown-Forsythe ----

def test_brown_forsythe_w_zero_then_grows_with_spread_gap(spark, tmp_path):
    """Same spread in both groups -> W = 0; a 5x spread gap -> W large.
    (Distinct subdirs per corpus: load() caches file listings per path.)"""
    def mk(spread_b):
        rows, eid = [], 0
        vals_a = [10.0 - 2, 10.0 - 1, 10.0 + 1, 10.0 + 2] * 10
        vals_b = [10.0 - 2 * spread_b, 10.0 - spread_b,
                  10.0 + spread_b, 10.0 + 2 * spread_b] * 10
        for v in vals_a:
            rows.append((eid, _d(0), 1, "a", v, "{}")); eid += 1
        for v in vals_b:
            rows.append((eid, _d(0), 1, "b", v, "{}")); eid += 1
        return rows

    d1, d2 = tmp_path / "same", tmp_path / "diff"
    d1.mkdir(); d2.mkdir()
    _write_events(spark, d1, mk(1.0))
    _write_events(spark, d2, mk(5.0))
    w_same = SPECS["events_brown_forsythe"].builder(spark, str(d1)).collect()[0]["w_stat"]
    w_diff = SPECS["events_brown_forsythe"].builder(spark, str(d2)).collect()[0]["w_stat"]
    assert abs(w_same) < 1e-6 and w_diff > 10.0


# ---- D105 GCRA ----

def test_gcra_burst_of_ten_in_one_second_flags_five(spark, tmp_path):
    # bucket depth 1 + tau/T = 5: events 6..10 of an instant burst violate
    rows = [(i, _d(0), 1, "view", 1.0, "{}") for i in range(10)]
    # slow user: one event every 5 minutes -> never violates
    rows += [
        (100 + i, _d(0) + datetime.timedelta(minutes=5 * i), 2, "view", 1.0, "{}")
        for i in range(10)
    ]
    _write_events(spark, tmp_path, rows)
    out = {
        r["user_id"]: r
        for r in SPECS["events_rate_limit_gcra"].builder(spark, str(tmp_path)).collect()
    }
    assert out[1]["n_events"] == 10 and out[1]["n_violations"] == 5
    assert out[1]["worst_excess_sec"] > 0
    assert out[2]["n_violations"] == 0 and out[2]["worst_excess_sec"] == 0.0


# ---- K152 Hamming ANN ----

def test_hamming_topk_recall_vs_cosine(spark):
    """Recall law: sign quantization preserves angular neighborhoods —
    average top-5 overlap with the exact float cosine top-5 on the
    fixture must clear a stated floor."""
    ham = SPECS["ann_hamming_topk"].builder(spark, SF_DIR).collect()
    cos = SPECS["llm_sim_topk"].builder(spark, SF_DIR).collect()
    h = {}
    for r in ham:
        h.setdefault(r["query_id"], set()).add(r["vec_id"])
    c = {}
    for r in cos:
        c.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [len(h[q] & c[q]) / len(c[q]) for q in c]
    assert sum(recalls) / len(recalls) >= 0.2, recalls


def test_hamming_distance_exact_on_planted_signs(spark, tmp_path):
    base = [1.0] * 64
    flip3 = list(base); flip3[0] = flip3[5] = flip3[40] = -1.0
    flip10 = list(base)
    for i in range(10):
        flip10[i * 6] = -1.0
    _write_embeddings(spark, tmp_path, [
        (0, base, 0), (10, flip3, 0), (11, flip10, 0), (12, base, 0),
    ])
    out = {
        (r["query_id"], r["vec_id"]): r["hamming"]
        for r in SPECS["ann_hamming_topk"].builder(spark, str(tmp_path)).collect()
    }
    assert out[(0, 12)] == 0
    assert out[(0, 10)] == 3
    assert out[(0, 11)] == 10


# ---- K153 Dirichlet QL ----

def test_dirichlet_ql_ranks_matching_docs_first(spark, tmp_path):
    docs = [
        (1, "fast table scan " * 5, "en", "s", 50),        # all q1 terms, high tf
        (2, "fast table scan over rows", "en", "s", 30),   # all q1 terms once
        (3, "completely unrelated words here", "en", "s", 30),
        (4, "fast fast fast nothing else", "en", "s", 30),  # one q1 term
    ]
    _write_documents(spark, tmp_path, docs)
    out = [
        r for r in
        SPECS["llm_dirichlet_ql_topk"].builder(spark, str(tmp_path)).collect()
        if r["query_id"] == "q1"
    ]
    ranks = {r["doc_id"]: r["rank"] for r in out}
    scores = {r["doc_id"]: r["score"] for r in out}
    # full-match docs outrank the partial match, which outranks no-match
    assert ranks[1] < ranks[4] and ranks[2] < ranks[4]
    assert scores[1] > scores[2] > scores[4] > scores[3]


# ---- K154 LSH planner ----

def test_lsh_plan_fixpoint_and_shape(spark):
    rows = {r["rows_per_band"]: r
            for r in SPECS["llm_lsh_param_plan"].builder(spark, SF_DIR).collect()}
    assert set(rows) == set(range(1, 11))
    for r_, row in rows.items():
        b = row["bands"]
        assert b == 40 // r_
        expect = (1.0 / b) ** (1.0 / r_)
        assert abs(row["threshold_star"] - expect) < 2e-6
        assert row["total_err"] >= max(row["fp_area"], row["fn_area"])
    # r = 1 (40 independent bands) candidates nearly everything -> FP-heavy;
    # large r starves recall -> FN grows monotonically past the optimum
    assert rows[1]["fp_area"] > rows[10]["fp_area"]
    assert rows[10]["fn_area"] > rows[1]["fn_area"]
    # K31's shipped banding (b=4, r=10) has its S-curve fixpoint near the
    # 0.8 target — the planner justifies the hard-coded choice
    assert abs(rows[10]["threshold_star"] - 0.87) < 0.02


# ---- K155 Gumbel / A-ES sampling ----

def test_gumbel_topk_matches_pure_python_reference(spark, tmp_path):
    text_pool = [
        "the quick brown fox jumps over a lazy dog and runs far away",
        "a stream of words in the river of text flows to the sea",
        "short doc",
        "the a of and to in is the a of and to in is repeated tokens",
    ]
    docs = [(i, text_pool[i % 4], "en", "s", 10) for i in range(1, 301)]
    _write_documents(spark, tmp_path, docs)
    out = SPECS["llm_gumbel_topk_sample"].builder(spark, str(tmp_path)).collect()
    assert len(out) == 100

    # pure-python reference of the same deterministic draw
    def quality(t):
        w = t.split()
        uniq = len(set(w)) / len(w)
        stop = sum(1 for x in w if x in
                   ("the", "a", "of", "and", "to", "in", "is")) / len(w)
        return 0.4 * min(1.0, len(w) / 100.0) + 0.3 * uniq + 0.3 * stop

    keys = []
    for i in range(1, 301):
        q = quality(text_pool[i % 4])
        u_num = ((i % 2147483648) * 2654435761) % 4294967296
        k = -math.log((u_num + 0.5) / 4294967296.0) / q
        keys.append((k, i))
    expect = {i for _, i in sorted(keys)[:100]}
    assert {r["doc_id"] for r in out} == expect


# ---- L21 landmark closeness ----

def test_closeness_on_planted_path_graph(spark, tmp_path):
    # path 0-1-2-3-4-5 via pairwise shared parts; landmarks are 0,1,2,3
    rows, ok = [], 0
    for a, b in [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)]:
        pid = 100 + a
        for s in (a, b):
            rows.append((ok, pid, s, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", _d(0)))
            ok += 1
    _write_lineitem(spark, tmp_path, rows)
    out = {
        r["suppkey"]: r
        for r in SPECS["graph_closeness_landmarks"].builder(spark, str(tmp_path)).collect()
    }
    # node 4 is 4 hops from landmark 0 — outside the 3-round horizon, so
    # nodes 4 and 5 are excluded; 0..3 report exact hop sums
    assert set(out) == {0, 1, 2, 3}
    assert out[0]["sum_dist"] == 6 and out[3]["sum_dist"] == 6
    assert out[1]["sum_dist"] == 4 and out[2]["sum_dist"] == 4
    assert abs(out[1]["closeness_est"] - 1.0) < 1e-6
    assert abs(out[0]["closeness_est"] - round(4 / 6, 6)) < 2e-6


# ---- L22 k-truss ----

def test_ktruss_keeps_clique_drops_pendant(spark, tmp_path):
    # K4 on suppliers 1..4 (each pair shares a private part) + a pendant
    # edge 10-11: every K4 edge sits in 2 triangles (support 2, survives
    # k=4), the pendant has no triangle and drops
    rows, ok, pid = [], 0, 500
    import itertools
    for a, b in itertools.combinations([1, 2, 3, 4], 2):
        for s in (a, b):
            rows.append((ok, pid, s, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", _d(0)))
            ok += 1
        pid += 1
    for s in (10, 11):
        rows.append((ok, pid, s, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", _d(0)))
        ok += 1
    _write_lineitem(spark, tmp_path, rows)
    out = {
        (r["s1"], r["s2"]): r["support"]
        for r in SPECS["graph_ktruss"].builder(spark, str(tmp_path)).collect()
    }
    assert set(out) == {(a, b) for a, b in itertools.combinations([1, 2, 3, 4], 2)}
    assert all(v == 2 for v in out.values())


# ---------------------------------------------------------------------------
# round-12b mini-wave micro-fixtures
# ---------------------------------------------------------------------------

def _write_customer(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/customer.parquet")


def _write_part(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ).write.mode("overwrite").parquet(f"{tmp_path}/part.parquet")


def test_anova_hand_computed(spark, tmp_path):
    # A = {1, 2, 3}, B = {4, 5, 6}: SS_b = 13.5, SS_w = 4, F = 13.5/(4/4) = 13.5
    rows = [
        (1, 1, "O", 1.0, _d(0), "A"), (2, 1, "O", 2.0, _d(0), "A"),
        (3, 1, "O", 3.0, _d(0), "A"), (4, 1, "O", 4.0, _d(0), "B"),
        (5, 1, "O", 5.0, _d(0), "B"), (6, 1, "O", 6.0, _d(0), "B"),
    ]
    _write_orders(spark, tmp_path, rows)
    r = SPECS["orders_anova_oneway"].builder(spark, str(tmp_path)).collect()[0]
    assert r["n"] == 6 and r["k"] == 2
    # whole-unit quantization: trunc(13.5 + 0.5) = 14, trunc(4 + 0.5) = 4
    assert r["ss_between"] == 14.0 and r["ss_within"] == 4.0
    assert abs(r["f_stat"] - 13.5) < 0.7  # f computed on raw doubles pre-quant


def test_cramers_v_independence_is_zero_and_identity_is_one(spark, tmp_path):
    # independent axes: every (priority, segment) cell equal -> V = 0
    custs = [(i, f"c{i}", 0, 0.0, "SEG_A" if i % 2 == 0 else "SEG_B")
             for i in range(1, 5)]
    _write_customer(spark, tmp_path, custs)
    orders = []
    ok = 1
    for ck in range(1, 5):
        for pr in ("P1", "P2"):
            orders.append((ok, ck, "O", 1.0, _d(0), pr)); ok += 1
    _write_orders(spark, tmp_path, orders)
    r = SPECS["orders_cramers_v"].builder(spark, str(tmp_path)).collect()[0]
    assert abs(r["cramers_v"]) < 1e-6 and abs(r["chi2"]) < 1e-6
    # perfectly dependent axes: priority determined by segment -> V = 1
    d2 = tmp_path / "dep"
    d2.mkdir()
    _write_customer(spark, d2, custs)
    orders2 = []
    ok = 1
    for ck in range(1, 5):
        pr = "P1" if ck % 2 == 0 else "P2"
        for _ in range(3):
            orders2.append((ok, ck, "O", 1.0, _d(0), pr)); ok += 1
    _write_orders(spark, d2, orders2)
    r2 = SPECS["orders_cramers_v"].builder(spark, str(d2)).collect()[0]
    assert abs(r2["cramers_v"] - 1.0) < 1e-6


def test_eoq_square_root_law(spark, tmp_path):
    # brand X: demand 1000, price 100 -> h = 20, EOQ = sqrt(2*1000*100/20) = 100
    parts = [(1, "p1", "X", "t", 1, 100.0)]
    lines = [(i, 1, 1, 1, 10.0, 0.0, 0.0, 0.0, "N", "O", _d(0))
             for i in range(100)]
    _write_part(spark, tmp_path, parts)
    _write_lineitem(spark, tmp_path, lines)
    r = SPECS["part_eoq_ladder"].builder(spark, str(tmp_path)).collect()[0]
    assert r["brand"] == "X" and r["demand"] == 1000.0
    assert abs(r["eoq"] - 100.0) < 1e-6
    assert abs(r["orders_per_period"] - 10.0) < 1e-6


def test_newsvendor_picks_the_06_fractile(spark, tmp_path):
    # daily demands 10, 20, ..., 60 (6 days): the 0.6 quantile
    # (interpolated) = 10 + 0.6*5*10 = 40
    parts = [(1, "p1", "X", "t", 1, 100.0)]
    lines = []
    for day in range(6):
        lines.append((day, 1, 1, 1, 10.0 * (day + 1), 0.0, 0.0, 0.0,
                      "N", "O", _d(day)))
    _write_part(spark, tmp_path, parts)
    _write_lineitem(spark, tmp_path, lines)
    r = SPECS["part_newsvendor_stock"].builder(spark, str(tmp_path)).collect()[0]
    assert r["n_days"] == 6
    assert abs(r["stock_level"] - 40.0) < 1e-6
    assert abs(r["median_demand"] - 35.0) < 1e-6


def test_neyman_gives_more_budget_to_high_variance_strata(spark, tmp_path):
    # source "flat": identical docs (sigma 0); source "mixed": half rich,
    # half poor (sigma > 0). Neyman sends ~the whole budget to "mixed";
    # proportional splits by size.
    rich = ("the quick brown fox jumps over a lazy dog and keeps running "
            "to the river of words beyond the hill every single day ") * 2
    poor = "z q"
    docs = []
    did = 0
    for _ in range(100):
        docs.append((did, rich, "en", "flat", 100)); did += 1
    for i in range(100):
        docs.append((did, rich if i % 2 == 0 else poor, "en", "mixed", 100))
        did += 1
    _write_documents(spark, tmp_path, docs)
    out = {r["source"]: r for r in
           SPECS["llm_neyman_allocation"].builder(spark, str(tmp_path)).collect()}
    assert out["flat"]["sigma_h"] == 0.0 and out["flat"]["neyman_n"] == 0
    assert out["mixed"]["neyman_n"] == 10000
    assert out["flat"]["proportional_n"] == 5000
    assert out["mixed"]["proportional_n"] == 5000


def test_hamming_rerank_recall_beats_raw_hamming(spark):
    """The two-stage law: re-ranking the 50-deep binary shortlist with
    exact cosine must recall at least as much of the true cosine top-5
    as the raw Hamming top-5 does, and clear a stated floor."""
    exact = SPECS["llm_sim_topk"].builder(spark, SF_DIR).collect()
    raw = SPECS["ann_hamming_topk"].builder(spark, SF_DIR).collect()
    rr = SPECS["ann_hamming_rerank_topk"].builder(spark, SF_DIR).collect()

    def by_q(rows):
        out = {}
        for r in rows:
            out.setdefault(r["query_id"], set()).add(r["vec_id"])
        return out

    e, h, z = by_q(exact), by_q(raw), by_q(rr)
    rec_raw = sum(len(h[q] & e[q]) / len(e[q]) for q in e) / len(e)
    rec_rr = sum(len(z[q] & e[q]) / len(e[q]) for q in e) / len(e)
    assert rec_rr >= rec_raw
    assert rec_rr >= 0.5, (rec_raw, rec_rr)
