"""Semantic micro-fixture tests + plan gates for the round-11 wave
(log-rank, Page-Hinkley, bullwhip, curation surgery, preference pairs,
winnowing, HITS, Hilbert layout). The driver oracle check proves
cross-engine parity; these pin the SEMANTICS against hand-computed answers
and planted probes, so a bug that fools both engines identically (wrong
formula, wrong tie rule, a detector that never detects) still fails."""

from __future__ import annotations

import datetime
import math

import pytest

from ksql_spark.registry import all_specs

from .conftest import SF_DIR

SPECS = all_specs()


def plan_of(spark, name: str) -> str:
    df = SPECS[name].builder(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")


def _write_orders(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")


def _write_customer(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/customer.parquet")


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


# ---------------------------------------------------------------------------
# D98 — log-rank test
# ---------------------------------------------------------------------------

def test_logrank_identical_curves_give_zero_chi2(spark, tmp_path):
    """Both segments repeat with the IDENTICAL duration multiset -> at every
    event time o1 == e1 exactly (n1/n is the same constant share), so
    chi2 must be exactly 0."""
    orders, custs = [], []
    k = 0
    for g, seg in ((1, "BUILDING"), (0, "AUTOMOBILE")):
        for i in range(20):
            cid = g * 1000 + i
            custs.append((cid, f"c{cid}", 0, 0.0, seg))
            dur = 5 + (i % 4)  # same duration multiset in both segments
            orders.append((k, cid, "F", 10.0, _d(0), "1-URGENT"))
            k += 1
            orders.append((k, cid, "F", 10.0, _d(dur), "1-URGENT"))
            k += 1
    _write_orders(spark, tmp_path, orders)
    _write_customer(spark, tmp_path, custs)
    r = SPECS["orders_logrank_segments"].builder(spark, str(tmp_path)).collect()[0]
    assert r["n1_subjects"] == 20 and r["n2_subjects"] == 20
    assert r["chi2"] == 0.0


def test_logrank_detects_faster_churning_segment(spark, tmp_path):
    """BUILDING customers all repeat at day 2; the rest at day 40 (or are
    censored) — the hand-computable extreme: early event times are all
    group-1 events while group 2 is fully at risk, so O1 - E1 is large
    and chi2 must blow past the 1-df 5% critical value 3.84."""
    orders, custs = [], []
    k = 0
    for i in range(25):
        custs.append((i, f"b{i}", 0, 0.0, "BUILDING"))
        orders.append((k, i, "F", 10.0, _d(0), "1-URGENT")); k += 1
        orders.append((k, i, "F", 10.0, _d(2), "1-URGENT")); k += 1
    for i in range(25):
        cid = 1000 + i
        custs.append((cid, f"a{cid}", 0, 0.0, "MACHINERY"))
        orders.append((k, cid, "F", 10.0, _d(0), "1-URGENT")); k += 1
        if i % 2 == 0:  # half repeat late, half censored at horizon
            orders.append((k, cid, "F", 10.0, _d(40), "1-URGENT")); k += 1
    _write_orders(spark, tmp_path, orders)
    _write_customer(spark, tmp_path, custs)
    r = SPECS["orders_logrank_segments"].builder(spark, str(tmp_path)).collect()[0]
    assert r["o1_events"] == 25
    assert r["e1_expected"] < r["o1_events"]  # group 1 churned MORE than expected early
    assert r["chi2"] > 3.84


# ---------------------------------------------------------------------------
# D99 — Page-Hinkley drift
# ---------------------------------------------------------------------------

def test_page_hinkley_alarms_on_planted_level_shift(spark, tmp_path):
    """30 quiet days at 10.0 then 30 days at 11.0: the running-mean lag makes
    every post-shift term positive (~0.5 - delta each), so the excess ramps
    past lambda=5 well before day 60 — and the first alarm day must sit
    AFTER the shift day, never before (no lookahead)."""
    rows = []
    for t in range(60):
        v = 10.0 if t < 30 else 11.0
        rows.append((t, _d(t), t, "drift", v, "{}"))
        rows.append((1000 + t, _d(t), t, "quiet", 10.0, "{}"))
    _write_events(spark, tmp_path, rows)
    out = {
        r["event_type"]: r
        for r in SPECS["events_page_hinkley"].builder(spark, str(tmp_path)).collect()
    }
    drift, quiet = out["drift"], out["quiet"]
    assert drift["n_days"] == 60
    assert drift["n_alarm_days"] > 0
    assert drift["first_alarm_day"] >= datetime.date(2024, 1, 31)
    assert drift["max_excess"] > 5.0
    # a perfectly flat series accumulates only the -delta allowance: the
    # walk is monotone DOWN, excess stays 0, and it never alarms
    assert quiet["n_alarm_days"] == 0 and quiet["first_alarm_day"] is None
    assert quiet["max_excess"] == 0.0


def test_page_hinkley_is_sequential_no_lookahead(spark, tmp_path):
    """Streaming legality: the statistics for the first k days must be
    unchanged by whatever arrives later (K64's CUSUM fails this — its
    global mean shifts). Run on the 30-day prefix and on the full series;
    the prefix's alarm state must match the full run restricted to it."""
    rows_pre = [(t, _d(t), t, "drift", 10.0, "{}") for t in range(30)]
    rows_full = rows_pre + [
        (t, _d(t), t, "drift", 11.0, "{}") for t in range(30, 60)
    ]
    _write_events(spark, tmp_path / "pre", rows_pre)
    pre = SPECS["events_page_hinkley"].builder(
        spark, str(tmp_path / "pre")
    ).collect()[0]
    _write_events(spark, tmp_path / "full", rows_full)
    full = SPECS["events_page_hinkley"].builder(
        spark, str(tmp_path / "full")
    ).collect()[0]
    # the 30 quiet prefix days alarmed in neither run
    assert pre["n_alarm_days"] == 0
    assert full["first_alarm_day"] is None or full[
        "first_alarm_day"
    ] >= datetime.date(2024, 1, 31)


# ---------------------------------------------------------------------------
# D100 — bullwhip ratio
# ---------------------------------------------------------------------------

def test_bullwhip_detects_order_burst_smoothed_by_shipping(spark, tmp_path):
    """All quantity is ORDERED in one burst month but SHIPS spread evenly
    over four months: the order stream's CV2 is the 4-month burst maximum
    (3.0) while the ship stream's is 0 -> ratio NULL-guarded? No: shipped
    CV2 is exactly 0, so the ratio is NULL (division guard) — plant a
    slightly uneven ship stream instead and assert ratio >> 1."""
    orders = [(i, 1, "F", 10.0, _d(0), "1-URGENT") for i in range(8)]
    li = []
    for i in range(8):
        # ship months: 0,0,1,1,2,2,3,3 + a monotone qty drift so the ship
        # stream's variance is small but strictly positive (a ratio with a
        # zero denominator is NULL by the division guard, by design)
        ship_mo = i // 2
        qty = 10.0 + i * 0.5
        li.append((i, 1, 1, 1, qty, 100.0, 0.0, 0.0, "N", "O",
                   _d(ship_mo * 31)))
    _write_orders(spark, tmp_path, orders)
    _write_lineitem(spark, tmp_path, li)
    r = SPECS["orders_bullwhip_ratio"].builder(spark, str(tmp_path)).collect()[0]
    assert r["n_months"] == 4
    # ordered: [84, 0, 0, 0] -> mean 21, var 3*441 = 1323, cv2 = 3.0
    assert abs(r["cv2_ordered"] - 3.0) < 1e-6
    assert r["cv2_shipped"] < 0.01
    assert r["bullwhip_ratio"] > 100.0


def test_bullwhip_identity_when_streams_coincide(spark, tmp_path):
    """Every line ships in its order month -> the two monthly series are
    identical and the ratio is exactly 1."""
    orders, li = [], []
    for m in range(4):
        qty = 10.0 * (m + 1)
        orders.append((m, 1, "F", 10.0, _d(m * 31), "1-URGENT"))
        li.append((m, 1, 1, 1, qty, 100.0, 0.0, 0.0, "N", "O", _d(m * 31)))
    _write_orders(spark, tmp_path, orders)
    _write_lineitem(spark, tmp_path, li)
    r = SPECS["orders_bullwhip_ratio"].builder(spark, str(tmp_path)).collect()[0]
    assert r["bullwhip_ratio"] == 1.0
    assert r["cv2_ordered"] == r["cv2_shipped"] > 0


# ---------------------------------------------------------------------------
# K146 — paragraph dedup surgery
# ---------------------------------------------------------------------------

def _write_documents(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")


def _write_embeddings(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")


def test_paragraph_dedup_cuts_noncanonical_and_within_doc_repeats(spark, tmp_path):
    docs = [
        (1, "alpha beta\nshared para here", "en", "s", 10),
        (2, "shared para here\ngamma delta", "en", "s", 10),
        (3, "Alpha  Beta", "en", "s", 10),   # normalizes to doc1 para 1
        (4, "dup dup\ndup dup", "en", "s", 10),  # within-doc repeat
        (5, None, "en", "s", 0),
    ]
    _write_documents(spark, tmp_path, docs)
    out = {
        r["doc_id"]: r
        for r in SPECS["llm_paragraph_dedup"].builder(spark, str(tmp_path)).collect()
    }
    assert out[1]["n_removed"] == 0 and out[1]["text_clean"] == docs[0][1]
    # doc2 loses 'shared para here' (canonical lives at doc1 pos2)
    assert out[2]["n_removed"] == 1 and out[2]["text_clean"] == "gamma delta"
    assert out[2]["chars_removed"] == len("shared para here")
    # doc3's single para normalizes to doc1's first -> fully emptied
    assert out[3]["n_removed"] == 1 and out[3]["text_clean"] == ""
    # within-doc repeat: second occurrence cut
    assert out[4]["n_removed"] == 1 and out[4]["text_clean"] == "dup dup"
    # NULL text doc still present, empty output (full-corpus contract)
    assert out[5]["n_paras"] == 0 and out[5]["text_clean"] == ""


# ---------------------------------------------------------------------------
# K147 — C4 line rules
# ---------------------------------------------------------------------------

def test_c4_line_rules_fire_individually(spark, tmp_path):
    good = "this line has enough words to survive easily."
    docs = [
        # every rule violated once + three good lines -> page kept
        (1, "\n".join([good, "too short.", "no terminal punctuation here at all",
                       "enable javascript to view this page please.",
                       good, good]), "en", "s", 10),
        # lorem ipsum kills the page even with good lines
        (2, "\n".join([good, good, good, "lorem ipsum dolor sit amet."]),
         "en", "s", 10),
        # curly brace kills the page
        (3, "\n".join([good, good, good, "function f() { return 1; }."]),
         "en", "s", 10),
        # only two surviving lines -> below the 3-line page gate
        (4, "\n".join([good, good, "nope"]), "en", "s", 10),
        (5, None, "en", "s", 0),
    ]
    _write_documents(spark, tmp_path, docs)
    out = {
        r["doc_id"]: r
        for r in SPECS["llm_line_rules_c4"].builder(spark, str(tmp_path)).collect()
    }
    assert out[1]["n_lines"] == 6 and out[1]["n_kept_lines"] == 3
    assert out[1]["doc_keep"] is True
    assert out[1]["text_clean"] == "\n".join([good, good, good])
    assert out[2]["doc_keep"] is False  # lorem ipsum page rule
    assert out[3]["doc_keep"] is False  # curly-brace page rule
    assert out[4]["n_kept_lines"] == 2 and out[4]["doc_keep"] is False
    assert out[5]["n_lines"] == 0 and out[5]["doc_keep"] is False


# ---------------------------------------------------------------------------
# K148 — winnowing fingerprints
# ---------------------------------------------------------------------------

def test_winnowing_catches_shared_run_and_skips_disjoint(spark, tmp_path):
    shared = "one two three four five six seven eight nine ten"
    docs = [
        (1, f"{shared} aaa bbb ccc ddd eee", "en", "s", 10),
        (2, f"zzz yyy xxx www vvv {shared}", "en", "s", 10),
        (3, "completely different words nothing in common at all here",
            "en", "s", 10),
        (4, "another unrelated document with its own private vocabulary",
            "en", "s", 10),
    ]
    _write_documents(spark, tmp_path, docs)
    rows = SPECS["llm_winnowing_pairs"].builder(spark, str(tmp_path)).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r for r in rows}
    # the 10-word shared run is far past the w+k-1=6 guarantee: the pair
    # must surface with >= 2 shared fingerprints and a meaningful overlap
    assert (1, 2) in pairs
    assert pairs[(1, 2)]["n_shared"] >= 2
    assert 0 < pairs[(1, 2)]["overlap"] <= 1.0
    # disjoint docs never pair
    assert all(a == 1 and b == 2 for (a, b) in pairs)


def test_winnowing_short_doc_still_fingerprints(spark, tmp_path):
    # 4 words -> 2 grams -> below the w=4 window: the single-min fallback
    # must still emit exactly ONE fingerprint. A 1-fingerprint doc can
    # never clear the >= 2 shared-fp pair floor, so the branch is proved
    # at the fingerprint stage directly (ADVICE r11: the old output-level
    # assertion was vacuously true via its empty branch).
    from ksql_spark.queries.llm import _winnow_fingerprints

    docs = [
        (1, "tiny doc four words", "en", "s", 4),
        (2, "tiny doc four words", "en", "s", 4),
        (3, "three words only", "en", "s", 3),  # exactly 1 gram
        (4, "ab", "en", "s", 1),  # < k words -> 0 grams -> 0 fingerprints
    ]
    _write_documents(spark, tmp_path, docs)
    d = spark.read.parquet(str(tmp_path / "documents.parquet"))
    fps = _winnow_fingerprints(d).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], []).append(r["h"])
    # the <w-gram fallback emits exactly one fingerprint per short doc,
    # and identical short docs emit the SAME one (so they do count into
    # fingerprint document-frequency / live-band statistics)
    assert len(by_doc.get(1, [])) == 1 and len(by_doc.get(2, [])) == 1
    assert by_doc[1] == by_doc[2]
    assert len(by_doc.get(3, [])) == 1  # single-gram doc: min of 1 hash
    assert 4 not in by_doc  # sub-k doc yields no grams, no fingerprint
    # and at the output level the pair floor correctly suppresses the
    # 1-shared-fp short-dup pair
    rows = SPECS["llm_winnowing_pairs"].builder(spark, str(tmp_path)).collect()
    assert rows == []


# ---------------------------------------------------------------------------
# K149 — preference pairs
# ---------------------------------------------------------------------------

def test_preference_pairs_pick_quality_extremes(spark, tmp_path):
    # cluster 0 = vectors near e0; centroids are vec_id < 4
    e0 = [1.0] + [0.0] * 7
    e1 = [0.0, 1.0] + [0.0] * 6
    embs = [
        (0, e0, 0), (1, e1, 0), (2, [0.0, 0.0, 1.0] + [0.0] * 5, 0),
        (3, [0.0] * 3 + [1.0] + [0.0] * 4, 0),
        (10, e0, 0), (11, e0, 0), (12, e1, 0), (13, e1, 0),
    ]
    rich = ("the quick brown fox jumps over a lazy dog and keeps running "
            "to the river of words ") * 3
    docs = [
        (10, "word " * 10, "en", "s", 50),         # low quality (repetitive)
        (11, rich, "en", "s", 200),                # high quality
        (12, "word " * 10, "en", "s", 50),
        (13, "word " * 10, "en", "s", 50),         # tie with 12 -> no pair? equal q
        (0, rich, "en", "s", 200), (1, "word " * 10, "en", "s", 50),
        (2, "x", "en", "s", 1), (3, "x", "en", "s", 1),
    ]
    _write_documents(spark, tmp_path, docs)
    _write_embeddings(spark, tmp_path, embs)
    rows = SPECS["llm_preference_pairs"].builder(spark, str(tmp_path)).collect()
    by_cluster = {r["cent_id"]: r for r in rows}
    # cluster 0 ('en'): docs {0, 10, 11} -> chosen one of the rich docs
    c0 = by_cluster[0]
    assert c0["chosen_doc"] in (0, 11) and c0["q_chosen"] > c0["q_rejected"]
    assert c0["margin"] > 0
    # cluster 1: docs {1, 12, 13} all identical low quality -> zero margin
    # -> NO pair emitted
    assert 1 not in by_cluster or by_cluster[1]["margin"] > 0


# ---------------------------------------------------------------------------
# K150 — semantic decontamination
# ---------------------------------------------------------------------------

def test_semantic_decontaminate_flags_paraphrase_tier(spark, tmp_path):
    base = [1.0, 2.0, 3.0, 4.0] + [0.0] * 4
    near = [1.0, 2.0, 3.0, 4.1] + [0.0] * 4     # cos ~ 0.9996
    ortho = [0.0] * 4 + [1.0, 0.0, 0.0, 0.0]
    embs = [
        (0, base, 0),      # eval (0 % 29 == 0)
        (29, ortho, 0),    # eval
        (1, near, 0),      # train: paraphrase-level hit
        (2, ortho, 0),     # train: exactly matches eval 29
        (3, [1.0, -2.0, 3.0, -4.0] + [0.0] * 4, 0),  # train: far from both
    ]
    _write_embeddings(spark, tmp_path, embs)
    out = {
        r["doc_id"]: r
        for r in SPECS["llm_semantic_decontaminate"].builder(
            spark, str(tmp_path)
        ).collect()
    }
    assert out[1]["contaminated"] is True and out[1]["nearest_eval_id"] == 0
    assert out[2]["contaminated"] is True and out[2]["nearest_eval_id"] == 29
    assert out[2]["max_cos"] == 1.0
    assert out[3]["contaminated"] is False
    # n-gram tier composition: same eval stand-in as llm_decontaminate
    assert set(out) == {1, 2, 3}


# ---------------------------------------------------------------------------
# L20 — HITS
# ---------------------------------------------------------------------------

def test_hits_hub_ordering_and_normalization(spark, tmp_path):
    """Star fixture: supplier 1 supplies the two parts every other supplier
    also supplies (popular = authoritative), supplier 2 supplies one of
    them, supplier 3 supplies only a private part. Hub order must be
    1 > 2 > 3 and the final hub vector L1-normalized (sums to ~1)."""
    li = []
    k = 0
    def edge(s, p):
        nonlocal k
        li.append((k, p, s, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", _d(0))); k += 1
    # parts 100, 101 are supplied by everyone -> authoritative
    for s in (1, 2, 4, 5):
        edge(s, 100)
    for s in (1, 4, 5):
        edge(s, 101)
    edge(3, 999)  # private part -> no authority mass flows to supplier 3
    _write_lineitem(spark, tmp_path, li)
    out = {r["suppkey"]: r["hub"] for r in
           SPECS["graph_hits"].builder(spark, str(tmp_path)).collect()}
    assert out[1] > out[2] > out[3]
    assert abs(sum(out.values()) - 1.0) < 1e-4


# ---------------------------------------------------------------------------
# F8 — Hilbert locality
# ---------------------------------------------------------------------------

def test_hilbert_buckets_have_zorder_span_guarantee(spark):
    """Quadrant recursion: every 4096-bucket spans < 64 quantization steps
    in BOTH dimensions — the same skipping guarantee as Z-order."""
    rows = SPECS["sort_hilbert_locality"].builder(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["day_span"] < 64 and r["cust_span"] < 64


def test_hilbert_consecutive_buckets_more_adjacent_than_zorder(spark):
    """THE reason to prefer Hilbert: consecutive curve segments are grid-
    adjacent. Measure the mean L1 centroid jump between consecutive
    non-empty buckets for both layouts on the same grid — Hilbert's must
    be strictly smaller (Morton teleports across quadrant seams)."""
    def jumps(name):
        rows = sorted(
            SPECS[name].builder(spark, SF_DIR).collect(),
            key=lambda r: r["bucket"],
        )
        cents = [
            ((r["min_day_q"] + r["max_day_q"]) / 2.0,
             (r["min_cust_q"] + r["max_cust_q"]) / 2.0)
            for r in rows
        ]
        ds = [
            abs(a[0] - b[0]) + abs(a[1] - b[1])
            for a, b in zip(cents, cents[1:])
        ]
        return sum(ds) / len(ds)

    assert jumps("sort_hilbert_locality") < jumps("sort_zorder_locality")


def test_hilbert_index_matches_reference_walk(spark):
    """Pin the fold against a pure-python xy2d for a handful of coords."""
    from ksql_spark.queries.sorts import hilbert_index

    def ref(x, y, order=12):
        d = 0
        for i in range(order):
            s = 1 << (order - 1 - i)
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
        return d

    import pyspark.sql.functions as F
    coords = [(0, 0), (1, 0), (4095, 4095), (123, 4001), (2048, 2047)]
    df = spark.createDataFrame(coords, "x long, y long").select(
        "x", "y", hilbert_index(F.col("x"), F.col("y")).alias("d")
    )
    for r in df.collect():
        assert r["d"] == ref(r["x"], r["y"]), (r["x"], r["y"])


# ---------------------------------------------------------------------------
# K151 — isotonic calibration
# ---------------------------------------------------------------------------

def test_pav_pools_planted_violation_to_weighted_mean(spark, tmp_path):
    """Three quality bands where the MIDDLE band has a HIGHER en-rate than
    the top band: PAV must pool the two into one block at the weighted
    mean rate while the bottom block survives untouched."""
    docs = []
    did = 0
    rich = ("the quick brown fox jumps over a lazy dog and keeps running "
            "to the river of words beyond the hill every single day ") * 2
    mid = "the a of and to in is plus some more filler words here"
    poor = "x y"
    # bottom band (bin 3): 10 docs, 0% en
    for _ in range(10):
        docs.append((did, poor, "de", "s", 2)); did += 1
    # middle band (the 'rich' text lands in bin 4 — its x2 repetition costs
    # unique-word ratio): 10 docs, 100% en — the planted VIOLATION vs bin 5
    for _ in range(10):
        docs.append((did, rich, "en", "s", 200)); did += 1
    # top band (bin 5): 10 docs, 50% en
    for i in range(10):
        docs.append((did, mid, "en" if i % 2 == 0 else "fr", "s", 50))
        did += 1
    _write_documents(spark, tmp_path, docs)
    rows = sorted(
        SPECS["llm_isotonic_calibration"].builder(spark, str(tmp_path)).collect(),
        key=lambda r: r["bin_lo"],
    )
    # rates must come out monotone non-decreasing over the block order
    rates = [r["iso_rate"] for r in rows]
    assert rates == sorted(rates)
    # the violating middle/top bins pooled: one block holds 20 docs at 0.75
    pooled = [r for r in rows if r["n"] == 20]
    assert pooled and abs(pooled[0]["iso_rate"] - 0.75) < 1e-6
    assert pooled[0]["bin_lo"] < pooled[0]["bin_hi"]
    # the clean bottom block is untouched
    assert rows[0]["n"] == 10 and rows[0]["iso_rate"] == 0.0


def test_pav_identity_on_already_monotone_bins(spark, tmp_path):
    """A calibrated corpus (rate increases with quality) must come back
    with singleton blocks only — PAV never merges without a violation."""
    docs = []
    did = 0
    poor = "z q"
    rich = ("the quick brown fox jumps over a lazy dog and keeps running "
            "to the river of words beyond the hill every single day ") * 2
    for _ in range(10):
        docs.append((did, poor, "de", "s", 2)); did += 1
    for i in range(10):
        docs.append((did, rich, "en" if i % 2 == 0 else "fr", "s", 200))
        did += 1
    # NULL-text docs must be excluded, not binned (ADVICE r11: engines
    # bin an unguarded NULL score divergently) — row counts prove it
    docs.append((did, None, "en", "s", 0)); did += 1
    docs.append((did, None, "de", "s", 0)); did += 1
    _write_documents(spark, tmp_path, docs)
    rows = SPECS["llm_isotonic_calibration"].builder(spark, str(tmp_path)).collect()
    assert all(r["bin_lo"] == r["bin_hi"] for r in rows)
    assert sum(r["n"] for r in rows) == 20  # the 2 NULL-text docs dropped
