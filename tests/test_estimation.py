"""Semantic micro-fixture tests + plan gates for the round-10 wave
(ksql_spark/queries/estimation.py + graph_modularity). The driver oracle
check proves cross-engine parity; these pin the SEMANTICS against
hand-computed answers and invariants, so a bug that fools both engines
identically (wrong formula, wrong tie rule) still fails — and pin the
physical-plan shapes that matter at 100 TB."""

from __future__ import annotations

import math

import pytest

from ksql_spark.registry import all_specs

from .conftest import SF_DIR, SF_SMALL

SPECS = all_specs()


def plan_of(spark, name: str) -> str:
    df = SPECS[name].builder(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# D83 — BLB confidence interval
# ---------------------------------------------------------------------------

def test_blb_ci_brackets_the_mean(spark):
    out = SPECS["events_blb_mean_ci"].builder(spark, SF_DIR).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_subsets"] == 8 and r["n_replicates"] == 40
    assert r["ci_lo"] < r["ci_hi"]
    # the event values are iid-ish uniforms: the averaged 92.5% band must
    # bracket the point estimate, and its width must be small relative to
    # the mean but strictly positive
    assert r["ci_lo"] <= r["mean_value"] <= r["ci_hi"]
    assert (r["ci_hi"] - r["ci_lo"]) < 0.5 * r["mean_value"]


def test_blb_rank_window_is_subset_partitioned(spark):
    plan = plan_of(spark, "events_blb_mean_ci")
    # the replicate rank window must be partitioned by subset — never a
    # data-proportional global sort (the r9 scale-killer class)
    assert "Window" in plan
    import re

    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "su" in spec, f"unpartitioned window: {spec}"


# ---------------------------------------------------------------------------
# D84 — Chapman capture-recapture
# ---------------------------------------------------------------------------

def test_capture_recapture_cells_and_coverage(spark):
    out = SPECS["events_capture_recapture"].builder(spark, SF_DIR).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_both"] <= min(r["n_view"], r["n_click"])
    assert max(r["n_view"], r["n_click"]) <= r["n_universe"]
    # Chapman never estimates below the directly-observed union bound
    assert r["n_chapman"] >= r["n_both"]
    assert r["ci_lo"] <= r["n_chapman"] <= r["ci_hi"]
    # with dense per-user activity the estimate must land near the
    # enumerated universe (both capture occasions see almost everyone)
    assert 0.5 * r["n_universe"] < r["n_chapman"] < 1.5 * r["n_universe"]


def test_capture_recapture_chapman_formula(spark):
    r = SPECS["events_capture_recapture"].builder(spark, SF_DIR).collect()[0]
    expect = (r["n_view"] + 1) * (r["n_click"] + 1) / (r["n_both"] + 1) - 1
    assert abs(r["n_chapman"] - expect) < 1e-5


# ---------------------------------------------------------------------------
# D85 — chain-ladder completion
# ---------------------------------------------------------------------------

def test_chain_ladder_invariants(spark):
    out = SPECS["events_chain_ladder"].builder(spark, SF_DIR).collect()
    assert out
    max_age = max(r["latest_age"] for r in out)
    for r in out:
        # development factors are >= 1 (cumulative counts can't shrink),
        # so ultimates only ever add to what arrived
        assert r["ultimate"] >= r["cum_purchases"] - 1e-6, r
        assert abs(r["reserve"] - (r["ultimate"] - r["cum_purchases"])) < 2e-6
        # the oldest cohort is fully developed: nothing left to ladder
        if r["latest_age"] == max_age:
            assert abs(r["ultimate"] - r["cum_purchases"]) < 1e-6
    # cohorts are one per first-seen day; ages complement the calendar
    cohorts = sorted(r["cohort"] for r in out)
    assert len(set(cohorts)) == len(cohorts)


def test_chain_ladder_younger_cohorts_carry_reserve(spark):
    out = SPECS["events_chain_ladder"].builder(spark, SF_DIR).collect()
    # at least one censored (young) cohort must be developed upward —
    # an all-zero reserve column means the ladder never fired
    assert any(r["reserve"] > 0 for r in out)


# ---------------------------------------------------------------------------
# D86 — empirical-Bayes shrinkage
# ---------------------------------------------------------------------------

def test_eb_shrinkage_pulls_toward_prior_mean(spark):
    out = SPECS["events_eb_shrinkage"].builder(spark, SF_DIR).collect()
    assert out
    mu = sum(r["raw_rate"] for r in out) / len(out)
    for r in out:
        lo, hi = min(r["raw_rate"], mu), max(r["raw_rate"], mu)
        # the posterior mean lies strictly between the raw rate and the
        # prior mean a/(a+b) == mu (method of moments), inclusive
        assert lo - 2e-6 <= r["shrunk_rate"] <= hi + 2e-6, r
        assert 0.0 <= r["shrunk_rate"] <= 1.0
    # shrinkage is real: somebody moved
    assert any(abs(r["shrunk_rate"] - r["raw_rate"]) > 1e-6 for r in out)


# ---------------------------------------------------------------------------
# D87 — panel within estimator vs a pandas replica
# ---------------------------------------------------------------------------

def test_panel_within_matches_pandas_replica(spark):
    import pandas as pd

    out = SPECS["orders_panel_within_ols"].builder(spark, SF_SMALL).collect()
    assert len(out) == 1
    r = out[0]
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
    lc = li.groupby("l_orderkey").size().rename("x").reset_index()
    ob = o.merge(lc, left_on="o_orderkey", right_on="l_orderkey")
    ob["y"] = ob["o_totalprice"].astype(float)
    ob["x"] = ob["x"].astype(float)
    gm = ob.groupby("o_custkey")[["x", "y"]].transform("mean")
    xt, yt = ob["x"] - gm["x"], ob["y"] - gm["y"]
    beta_w = (xt * yt).sum() / (xt * xt).sum()
    xp, yp = ob["x"] - ob["x"].mean(), ob["y"] - ob["y"].mean()
    beta_p = (xp * yp).sum() / (xp * xp).sum()
    assert r["n_orders"] == len(ob)
    assert r["n_entities"] == ob["o_custkey"].nunique()
    # quantized engine math vs float64 pandas: agree to ~1e-4 relative
    assert abs(r["beta_within"] - beta_w) < 1e-3 * max(1.0, abs(beta_w))
    assert abs(r["beta_pooled"] - beta_p) < 1e-3 * max(1.0, abs(beta_p))
    assert 0.0 <= r["r2_within"] <= 1.0


# ---------------------------------------------------------------------------
# K135 — Bradley-Terry source ranking
# ---------------------------------------------------------------------------

def test_bradley_terry_bookkeeping_and_normalization(spark):
    out = SPECS["llm_bradley_terry_sources"].builder(spark, SF_DIR).collect()
    assert out
    # every duel hands out exactly one win: sum(wins) == sum(games)/2
    assert 2 * sum(r["wins"] for r in out) == sum(r["games"] for r in out)
    for r in out:
        assert 0 <= r["wins"] <= r["games"]
        assert r["strength"] is not None and r["strength"] >= 0.0
    # sum-normalized strengths average to 1
    tot = sum(r["strength"] for r in out)
    assert abs(tot - len(out)) < 1e-3 * len(out)
    # ranks follow strengths (ties broken by source name)
    by_rank = sorted(out, key=lambda r: r["rnk"])
    for a, b in zip(by_rank, by_rank[1:]):
        assert (a["strength"], b["source"]) >= (b["strength"], a["source"])


def test_bradley_terry_strength_tracks_win_rate(spark):
    out = SPECS["llm_bradley_terry_sources"].builder(spark, SF_DIR).collect()
    best = max(out, key=lambda r: r["strength"])
    worst = min(out, key=lambda r: r["strength"])
    # MM fixed point must order the extreme win rates correctly
    assert best["wins"] / best["games"] > worst["wins"] / worst["games"]


# ---------------------------------------------------------------------------
# K136 / K137 — hygiene screens: the drill rows prove detection
# ---------------------------------------------------------------------------

def test_code_prose_drill_fires_exactly_on_code(spark):
    out = SPECS["llm_code_prose_score"].builder(spark, SF_DIR).collect()
    drill = {r["source"]: r for r in out if r["mode"] == "drill"}
    assert set(drill) == {"planted_code", "planted_json", "planted_prose"}
    assert drill["planted_code"]["n_code_like"] == 1
    assert drill["planted_json"]["n_code_like"] == 1
    assert drill["planted_prose"]["n_code_like"] == 0
    assert drill["planted_code"]["avg_sym_density"] > 0.02
    # the live driver corpus is clean prose
    for r in out:
        if r["mode"] == "live":
            assert r["n_code_like"] == 0, r


def test_mojibake_drill_counts_exactly(spark):
    out = SPECS["llm_mojibake_audit"].builder(spark, SF_DIR).collect()
    drill = {r["source"]: r for r in out if r["mode"] == "drill"}
    moji = drill["planted_mojibake"]
    # 2 smart-quote prefixes + 2 stray accent carriers, hand-counted
    assert moji["artifact_chars"] == 4
    assert moji["n_flagged"] == 1
    repl = drill["planted_replacement"]
    assert repl["artifact_chars"] == 3  # three U+FFFD
    assert repl["n_flagged"] == 1
    assert drill["planted_clean"]["artifact_chars"] == 0
    assert drill["planted_clean"]["n_flagged"] == 0
    for r in out:
        if r["mode"] == "live":
            assert r["artifact_chars"] == 0, r


# ---------------------------------------------------------------------------
# K138 — Kneser-Ney bigrams
# ---------------------------------------------------------------------------

def test_kneser_ney_probabilities_and_order(spark):
    out = SPECS["llm_bigram_kneser_ney"].builder(spark, SF_DIR).collect()
    assert len(out) == 30
    for r in out:
        assert 0.0 < r["p_kn"] <= 1.0, r
        assert 0.0 < r["p_cont"] <= 1.0, r
        assert r["c_bigram"] >= 1
    # descending by smoothed probability with (w1, w2) tiebreak
    for a, b in zip(out, out[1:]):
        assert (
            a["p_kn"] > b["p_kn"]
            or (a["p_kn"] == b["p_kn"] and (a["w1"], a["w2"]) <= (b["w1"], b["w2"]))
        )


def test_kneser_ney_topk_is_take_ordered(spark):
    plan = plan_of(spark, "llm_bigram_kneser_ney")
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan  # never a global rank window


# ---------------------------------------------------------------------------
# L17 — modularity
# ---------------------------------------------------------------------------

def test_modularity_contributions_bounded_and_consistent(spark):
    out = SPECS["graph_modularity"].builder(spark, SF_DIR).collect()
    assert out
    m2 = sum(r["degree_sum"] for r in out)
    assert m2 % 2 == 0  # undirected edges stored in both directions
    q = sum(r["q_contrib"] for r in out)
    assert -1.0 <= q < 1.0
    for r in out:
        assert 0 <= r["internal_edges"] <= r["degree_sum"]
        # per-community contribution is bounded by its degree share
        assert r["q_contrib"] <= r["degree_sum"] / m2 + 1e-6


# ---------------------------------------------------------------------------
# plan gates for the wave's corpus-sized stages
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "name, visible_scans, pinned",
    [
        # pinned entries read their (single-scan) checkpoint, so the
        # visible parquet-scan count is what the plan re-reads BEYOND the
        # pin — the house convention (the D81/K58 gates): a regression that
        # adds a corpus re-scan shows up as a count bump either way.
        ("events_blb_mean_ci", 1, True),  # weighted pass; subset stats pinned
        ("events_capture_recapture", 1, False),
        ("events_chain_ladder", 0, True),  # ev pinned at source
        ("events_eb_shrinkage", 0, True),  # per-user table pinned
        ("orders_panel_within_ols", 0, True),  # order-grain table pinned
        ("llm_bradley_terry_sources", 0, True),  # champion table pinned
        ("llm_code_prose_score", 1, False),
        ("llm_mojibake_audit", 1, False),
        ("llm_bigram_kneser_ney", 0, True),  # bigram-type table pinned
        ("graph_modularity", 0, True),  # per-community cells pinned
    ],
)
def test_wave_scan_counts(spark, name, visible_scans, pinned):
    """Corpus scans are the unit of cost at 100 TB: each entry's plan must
    read parquet exactly the documented number of times beyond its pins."""
    plan = plan_of(spark, name)
    scans = plan.count("Scan parquet")
    assert scans == visible_scans, f"{name}: {scans} visible parquet scans"
    if pinned:
        assert "ExistingRDD" in plan or "LogicalRDD" in plan, name


@pytest.mark.parametrize(
    "name",
    [
        "events_capture_recapture",
        "events_eb_shrinkage",
        "orders_panel_within_ols",
        "llm_code_prose_score",
        "llm_mojibake_audit",
        "llm_bigram_kneser_ney",
    ],
)
def test_wave_no_cartesian(spark, name):
    plan = plan_of(spark, name)
    assert "CartesianProduct" not in plan, name


# ---------------------------------------------------------------------------
# tranche 2: D88-D91, K139, L18
# ---------------------------------------------------------------------------

def test_gumbel_return_levels_ordered(spark):
    out = SPECS["events_gumbel_maxima"].builder(spark, SF_DIR).collect()
    assert len(out) == 1
    r = out[0]
    assert r["gumbel_beta"] is not None and r["gumbel_beta"] > 0
    # return levels strictly increase with horizon and sit above the mean
    assert r["block_max_mean"] < r["rl_10"] < r["rl_100"] < r["rl_1000"]
    # mu sits below the block-max mean by exactly gamma*beta
    assert abs(
        (r["block_max_mean"] - r["gumbel_mu"]) - 0.5772156649015329 * r["gumbel_beta"]
    ) < 1e-4


def test_cmh_cell_consistency(spark):
    out = SPECS["events_cmh_test"].builder(spark, SF_DIR).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_strata"] >= 1
    assert r["sum_a"] >= 0 and r["sum_e"] >= 0
    assert r["chi2_cmh"] is None or r["chi2_cmh"] >= 0
    assert r["or_mh"] is None or r["or_mh"] >= 0
    # id-parity assignment on iid data: observed ~ expected, so the CMH
    # statistic must not scream (an astronomically large value means the
    # cells were built wrong)
    if r["chi2_cmh"] is not None:
        assert r["chi2_cmh"] < 50, r


def test_stochastic_dominance_bounds(spark):
    out = SPECS["orders_stochastic_dominance"].builder(spark, SF_DIR).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_bins"] == 200
    assert 0.0 <= r["frac_urgent_dominates"] <= 1.0
    assert 0.0 <= r["max_violation"] <= 1.0
    assert r["max_violation"] <= r["ks_gap"] <= 1.0
    # if urgent dominates everywhere, there is no violation by definition
    if r["frac_urgent_dominates"] == 1.0:
        assert r["max_violation"] == 0.0


def test_safety_stock_replica_on_one_part(spark):
    import pandas as pd

    out = {
        r["p_partkey"]: r
        for r in SPECS["part_safety_stock"].builder(spark, SF_SMALL).collect()
    }
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
    part = pd.read_parquet(f"{SF_SMALL}/part.parquet")
    assert set(out) == set(part["p_partkey"])
    months = li["l_shipdate"].dt.to_period("M").nunique()
    pk = li["l_partkey"].iloc[0]
    dem = li[li["l_partkey"] == pk].groupby(
        li["l_shipdate"].dt.to_period("M")
    )["l_quantity"].sum()
    dense = dem.reindex(
        li["l_shipdate"].dt.to_period("M").unique(), fill_value=0.0
    )
    r = out[pk]
    assert r["n_months"] == months
    assert abs(r["mean_monthly"] - dense.mean()) < 1e-3
    assert abs(r["sd_monthly"] - dense.std(ddof=1)) < 1e-2
    assert abs(
        r["reorder_point"] - (r["mean_monthly"] + r["safety_stock"])
    ) < 2e-6
    for row in out.values():
        assert row["safety_stock"] >= 0


def test_pca_power_unit_vector_and_rayleigh(spark):
    import numpy as np
    import pandas as pd

    out = SPECS["llm_emb_pca_power"].builder(spark, SF_SMALL).collect()
    d = len(out)
    v = np.array([r["loading"] for r in sorted(out, key=lambda r: r["dim"])])
    # normalized to unit length (within the 1e-6 quantizer)
    assert abs(float(np.dot(v, v)) - 1.0) < 1e-3
    lam = out[0]["eigenvalue"]
    share = out[0]["explained_share"]
    assert lam > 0 and 0.0 < share <= 1.0
    # against numpy's full eigendecomposition of the sample covariance
    emb = np.stack(
        pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")["embedding"].map(
            np.asarray
        )
    ).astype(float)
    cov = np.cov(emb, rowvar=False, bias=True)
    evals = np.linalg.eigvalsh(cov)
    assert abs(lam - evals[-1]) < max(5e-3, 5e-2 * evals[-1])
    assert d == emb.shape[1]


def test_rich_club_monotone_counts(spark):
    out = sorted(
        SPECS["graph_rich_club"].builder(spark, SF_DIR).collect(),
        key=lambda r: r["k"],
    )
    assert [r["k"] for r in out] == [2, 4, 8, 16, 32, 64]
    for a, b in zip(out, out[1:]):
        # raising the threshold can only shrink the club
        assert b["n_nodes"] <= a["n_nodes"]
        assert b["n_edges"] <= a["n_edges"]
    for r in out:
        assert r["n_edges"] % 2 == 0  # directed double-count of undirected
        if r["phi"] is not None:
            assert 0.0 <= r["phi"] <= 1.0
        # club edges can't exceed the complete directed graph on the club
        if r["n_nodes"] > 1:
            assert r["n_edges"] <= r["n_nodes"] * (r["n_nodes"] - 1)


@pytest.mark.parametrize(
    "name, visible_scans, pinned",
    [
        ("events_gumbel_maxima", 1, False),
        ("events_cmh_test", 1, False),
        ("orders_stochastic_dominance", 1, False),
        ("part_safety_stock", 2, True),  # month list pinned; md + part scans
        ("llm_emb_pca_power", 0, True),  # covariance + iterations pinned
        ("graph_rich_club", 0, True),  # adjacency + degree table pinned
    ],
)
def test_wave2_scan_counts(spark, name, visible_scans, pinned):
    plan = plan_of(spark, name)
    scans = plan.count("Scan parquet")
    assert scans == visible_scans, f"{name}: {scans} visible parquet scans"
    if pinned:
        assert "ExistingRDD" in plan or "LogicalRDD" in plan, name
    assert "CartesianProduct" not in plan, name


# ---------------------------------------------------------------------------
# tranche 3: D92-D94, K140-K142
# ---------------------------------------------------------------------------

def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")


def test_bass_recovers_planted_diffusion(spark, tmp_path):
    """Simulate a discrete Bass process exactly (M=1000, p=0.03, q=0.38:
    n_t = round((p + q C/M)(M - C))) as per-user first events; the fitted
    (p, q, M) must land near the planted values and the peak day inside
    the horizon."""
    import datetime

    M, p, q = 1000, 0.03, 0.38
    rows, c, uid, day = [], 0, 0, 0
    while c < M and day < 80:
        n = round((p + q * c / M) * (M - c))
        n = max(n, 0)
        for _ in range(n):
            rows.append(
                (uid, datetime.datetime(2024, 1, 1) +
                 datetime.timedelta(days=day), uid, "visit", 1.0, "{}")
            )
            uid += 1
        c += n
        day += 1
    _write_events(spark, tmp_path, rows)
    r = SPECS["events_bass_diffusion"].builder(spark, str(tmp_path)).collect()[0]
    assert r["m0_adopters"] == c
    # the fit sees the whole curve, so it must recover the parameters
    assert abs(r["m_hat"] - M) / M < 0.15, r["m_hat"]
    assert abs(r["p_innovation"] - p) < 0.02, r["p_innovation"]
    assert abs(r["q_imitation"] - q) < 0.12, r["q_imitation"]
    assert 0 < r["t_peak_days"] < day


def test_bass_degenerate_two_days_nulls(spark, tmp_path):
    """Two observation days cannot identify a quadratic: the normal
    equations are singular and every model column must be NULL (never an
    abort)."""
    import datetime

    rows = [
        (i, datetime.datetime(2024, 1, 1 + i % 2), i, "visit", 1.0, "{}")
        for i in range(6)
    ]
    _write_events(spark, tmp_path, rows)
    r = SPECS["events_bass_diffusion"].builder(spark, str(tmp_path)).collect()[0]
    assert r["n_days"] == 2
    assert r["m_hat"] is None and r["t_peak_days"] is None


def test_newey_west_inflates_se_on_autocorrelated_residuals(spark, tmp_path):
    """Planted series: linear trend + slow sinusoid. The residual from the
    OLS line IS the sinusoid — positively autocorrelated at small lags —
    so the Bartlett HAC standard error must exceed the naive OLS one,
    while the slope estimate stays near the planted trend."""
    import datetime
    import math as m

    rows = []
    for t in range(1, 91):
        y = 0.5 * t + 10.0 * m.sin(2 * m.pi * t / 30.0)
        rows.append(
            (t, datetime.datetime(2024, 1, 1) +
             datetime.timedelta(days=t - 1), t, "visit", y, "{}")
        )
    _write_events(spark, tmp_path, rows)
    r = SPECS["events_newey_west_trend"].builder(spark, str(tmp_path)).collect()[0]
    assert r["n_days"] == 90
    assert r["lag_l"] == 3  # floor(4 * (90/100)^(2/9))
    assert abs(r["beta"] - 0.5) < 0.1
    assert r["se_hac"] > r["se_ols"]
    assert abs(r["t_hac"]) < abs(r["t_ols"])


def test_newey_west_degenerate_empty_daily_agrees_with_oracle(spark, tmp_path):
    """ADVICE r10: on an EMPTY daily table (every value NULL) Spark's
    log(0/100) is NULL while DuckDB's ln(0.0) is -inf, so lag_l diverged
    (NULL vs 0). The CASE WHEN n > 0 guard pins BOTH engines to the same
    degenerate row: n_days 0, lag_l 0, every model column NULL."""
    import datetime

    import duckdb

    rows = [
        (i, datetime.datetime(2024, 1, 1 + i), i, "visit", None, "{}")
        for i in range(4)
    ]
    _write_events(spark, tmp_path, rows)
    r = SPECS["events_newey_west_trend"].builder(spark, str(tmp_path)).collect()[0]
    assert r["n_days"] == 0 and r["lag_l"] == 0
    assert all(
        r[c] is None for c in ("beta", "se_ols", "se_hac", "t_ols", "t_hac")
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    o = con.sql(SPECS["events_newey_west_trend"].oracle).fetchall()[0]
    cols = ["n_days", "lag_l", "beta", "se_ols", "se_hac", "t_ols", "t_hac"]
    assert tuple(r[c] for c in cols) == o


def test_littles_law_exact_on_stationary_system(spark, tmp_path):
    """Deterministic stationary queue: one order per day, each in flight
    exactly 5 days. On any interior window L = 5, lambda = 1, W = 5, so
    the law holds with zero gap."""
    import datetime

    d0 = datetime.datetime(2024, 1, 1)
    orders = [
        (t, t, "F", 100.0, d0 + datetime.timedelta(days=t), "1-URGENT")
        for t in range(100)
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    lines = [
        (t, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O",
         d0 + datetime.timedelta(days=t + 4))
        for t in range(100)
    ]
    spark.createDataFrame(
        lines,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    r = SPECS["orders_littles_law_audit"].builder(spark, str(tmp_path)).collect()[0]
    assert r["l_avg_wip"] == pytest.approx(5.0, abs=1e-6)
    assert r["lambda_per_day"] == pytest.approx(1.0, abs=1e-6)
    assert r["w_avg_days"] == pytest.approx(5.0, abs=1e-6)
    assert r["lw_product"] == pytest.approx(5.0, abs=1e-6)
    assert abs(r["rel_gap"]) < 1e-6


def _write_docs(spark, tmp_path, texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in zip(ids, texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")


def test_good_turing_hand_computed_ladder(spark, tmp_path):
    """Corpus 'a b c c d d d': counts 1,1,2,3 -> N1=2, N2=1, N3=1, N=7.
    Raw Turing: r*(1) = 2*N2/N1 = 1, r*(2) = 3*N3/N2 = 3, r*(3) = NULL
    (no N4). Unseen mass P0 = N1/N = 2/7. Gale Z: Z1 = 2/(0.5*(2-0)) = 2,
    Z2 = 1/(0.5*(3-1)) = 1, Z3 = 1/(0.5*((2*3-2)-2)) = 1."""
    _write_docs(spark, tmp_path, ["a b c c d d d"])
    out = {
        r["r"]: r
        for r in SPECS["llm_good_turing"].builder(spark, str(tmp_path)).collect()
    }
    assert sorted(out) == [1, 2, 3]
    assert out[1]["nr"] == 2 and out[2]["nr"] == 1 and out[3]["nr"] == 1
    assert out[1]["r_star_turing"] == pytest.approx(1.0, abs=1e-6)
    assert out[2]["r_star_turing"] == pytest.approx(3.0, abs=1e-6)
    assert out[3]["r_star_turing"] is None
    assert out[1]["p_unseen"] == pytest.approx(2 / 7, abs=1e-6)
    assert out[1]["z_r"] == pytest.approx(2.0, abs=1e-6)
    assert out[2]["z_r"] == pytest.approx(1.0, abs=1e-6)
    assert out[3]["z_r"] == pytest.approx(1.0, abs=1e-6)
    # LGT estimates exist on every row (the holes raw Turing leaves)
    for r in out.values():
        assert r["r_star_lgt"] is not None and r["r_star_lgt"] > 0


def test_kn_perplexity_tier_accounting_and_range(spark):
    r = SPECS["llm_kn_perplexity"].builder(spark, SF_DIR).collect()[0]
    assert (
        r["n_seen"] + r["n_backoff"] + r["n_w1_unseen"] + r["n_oov"]
        == r["n_eval_bigrams"]
    )
    assert r["n_eval_types"] <= r["n_eval_bigrams"]
    # every probability is < 1, so cross-entropy > 0 and perplexity > 1
    assert r["cross_entropy_nats"] > 0
    assert r["perplexity"] > 1
    assert r["perplexity"] == pytest.approx(
        math.exp(r["cross_entropy_nats"]), rel=1e-4
    )


def test_kn_perplexity_replica_on_planted_split(spark, tmp_path):
    """Two docs pinned to known split buckets (Knuth centile of doc_id):
    a train doc and an eval doc. The tiered ladder is replicated exactly
    in python on the planted corpus."""
    def bucket(doc_id):
        return ((doc_id % 2147483648) * 2654435761 % 4294967296) % 100

    train_id = next(i for i in range(1, 500) if bucket(i) < 80)
    eval_id = next(i for i in range(1, 500) if bucket(i) >= 90)
    train_text = "a b a b a c"
    eval_text = "a b c x"
    _write_docs(spark, tmp_path, [train_text, eval_text], [train_id, eval_id])
    r = SPECS["llm_kn_perplexity"].builder(spark, str(tmp_path)).collect()[0]
    # train bigrams: 'a b' x2, 'b a' x2, 'a c' x1 -> B = 3 types
    # eval bigrams: 'a b' (seen), 'b c' (backoff: b seen as w1, c seen as
    # continuation), 'c x' (x never a continuation -> oov)
    assert r["n_eval_bigrams"] == 3
    assert r["n_seen"] == 1 and r["n_backoff"] == 1 and r["n_oov"] == 1
    D, B = 0.75, 3
    # model tables: c(a b)=2, ctot(a)=3, n1f(a)=2; ctot(b)=2, n1f(b)=1;
    # pcont: a->1/3 ... 'b' appears as w2 in 1 type, 'c' in 1, 'a' in 1
    def q6(x):
        import math as m
        return m.trunc(x * 1e6 + 0.5) / 1e6

    p_ab = (2 - D) / 3 + D * 2 / 3 * (1 / B)
    p_bc = D * 1 / 2 * (1 / B)
    p_cx = 1.0 / (B + 1)
    ce = -(q6(math.log(p_ab)) + q6(math.log(p_bc)) + q6(math.log(p_cx))) / 3
    assert r["cross_entropy_nats"] == pytest.approx(ce, abs=2e-6)


def test_audio_autocorr_numpy_replica_and_bounds(spark, tmp_path):
    """One synthesized clip checked against an independent numpy replica
    of the sample formula; Cauchy-Schwarz bounds every normalized rho."""
    import numpy as np

    _write_docs(spark, tmp_path, ["x" * 57])  # n_chars = 57
    r = SPECS["llm_audio_autocorr"].builder(spark, str(tmp_path)).collect()[0]
    nc = 57
    n = (1 + nc % 2) * (100 + nc % 400)
    i = np.arange(n, dtype=np.int64)
    s = (i * 62) % 256 + 256 * ((i * 62 + 31) % 256)
    s = np.where(s >= 32768, s - 65536, s)
    assert r["n_samples"] == n
    assert r["energy"] == int((s * s).sum())
    for lag, col in [(1, "rho1"), (2, "rho2"), (4, "rho4"), (8, "rho8")]:
        expect = int((s[:-lag] * s[lag:]).sum()) / int((s * s).sum())
        assert r[col] == pytest.approx(expect, abs=2e-6), lag
        assert abs(r[col]) <= 1.0 + 1e-9
    assert r["best_lag"] in (1, 2, 4, 8)


@pytest.mark.parametrize(
    "name, visible_scans, pinned",
    [
        ("events_bass_diffusion", 0, True),  # adopter table pinned
        ("events_newey_west_trend", 0, True),  # indexed daily table pinned
        ("orders_littles_law_audit", 0, True),  # order-interval table pinned
        ("llm_good_turing", 0, True),  # counts-of-counts ladder pinned
        ("llm_kn_perplexity", 1, True),  # train types pinned; eval scan
        ("llm_audio_autocorr", 1, False),  # one Arrow pass, no shuffle
    ],
)
def test_wave3_scan_counts(spark, name, visible_scans, pinned):
    plan = plan_of(spark, name)
    scans = plan.count("Scan parquet")
    assert scans == visible_scans, f"{name}: {scans} visible parquet scans"
    if pinned:
        assert "ExistingRDD" in plan or "LogicalRDD" in plan, name
    assert "CartesianProduct" not in plan, name


def test_audio_autocorr_no_exchange(spark):
    """The ACF pass is one Arrow-batched map over the corpus — any
    exchange in this plan is a bug."""
    plan = plan_of(spark, "llm_audio_autocorr")
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# tranche 4: D95, K143
# ---------------------------------------------------------------------------

def test_cointegration_flags_planted_stable_relation(spark, tmp_path):
    """Planted pair: y_t = 100 + 2 x_t + alternating ±1 residual — the
    residual mean-reverts every step, so the DF stat is deeply negative
    and the screen must flag cointegration; beta must recover the planted
    long-run coefficient."""
    import datetime

    d0 = datetime.datetime(2024, 1, 1)
    rows = []
    key = 0
    for t in range(60):
        x = 5 + (t % 7)  # orders that day
        resid = 1.0 if t % 2 == 0 else -1.0
        total = (100.0 + 2.0 * x + resid) * 1000.0  # thousands -> dollars
        for j in range(x):
            # o_totalprice sums to total across the day's x orders
            rows.append(
                (key, key, "F", total / x,
                 d0 + datetime.timedelta(days=t), "1-URGENT")
            )
            key += 1
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    r = SPECS["orders_cointegration_screen"].builder(spark, str(tmp_path)).collect()[0]
    assert r["n_days"] == 60
    assert abs(r["beta_thousands_per_order"] - 2.0) < 0.2
    # alternating residual: rho ~ -2 (e_t ~ -e_{t-1}), df_stat << -3.34
    assert r["df_stat"] < -3.34
    assert r["cointegrated_5pct"] is True


def test_cointegration_degenerate_constant_x(spark, tmp_path):
    """One order every day: x is constant, the OLS x-variance is zero and
    every statistic must be NULL (never an abort)."""
    import datetime

    rows = [
        (t, t, "F", 100.0 + t,
         datetime.datetime(2024, 1, 1) + datetime.timedelta(days=t),
         "1-URGENT")
        for t in range(30)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    r = SPECS["orders_cointegration_screen"].builder(spark, str(tmp_path)).collect()[0]
    assert r["beta_thousands_per_order"] is None
    assert r["df_stat"] is None and r["cointegrated_5pct"] is None


def test_token_budget_ladder_arithmetic(spark, tmp_path):
    """Corpus with exactly 100 tokens: every ladder row's epochs_needed is
    params_b * 20e9 / 100, nothing is single-epoch feasible, and the
    one-epoch capacity is 100/20e9 billion parameters."""
    texts = ["w " * 9 + "w", "v " * 89 + "v"]  # 10 + 90 tokens
    spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {
        r["params_b"]: r
        for r in SPECS["llm_token_budget_plan"].builder(spark, str(tmp_path)).collect()
    }
    assert sorted(out) == [1, 3, 7, 13, 30, 70]
    for pb, r in out.items():
        assert r["corpus_tokens"] == 100
        assert r["optimal_tokens"] == pb * 20_000_000_000
        assert r["epochs_needed"] == pytest.approx(
            pb * 20_000_000_000 / 100, rel=1e-6
        )
        assert r["single_epoch_feasible"] is False
        assert r["max_params_b_at_one_epoch"] == pytest.approx(
            100 / 20e9, abs=1e-6
        )


@pytest.mark.parametrize(
    "name, visible_scans, pinned",
    [
        ("orders_cointegration_screen", 0, True),  # daily table pinned
        ("llm_token_budget_plan", 1, False),  # one corpus scan, 6-row ladder
    ],
)
def test_wave4_scan_counts(spark, name, visible_scans, pinned):
    plan = plan_of(spark, name)
    scans = plan.count("Scan parquet")
    assert scans == visible_scans, f"{name}: {scans} visible parquet scans"
    if pinned:
        assert "ExistingRDD" in plan or "LogicalRDD" in plan, name
    assert "CartesianProduct" not in plan, name


# ---------------------------------------------------------------------------
# tranche 5: D96, L19
# ---------------------------------------------------------------------------

def test_erlang_ladder_monotonicity_and_replica(spark):
    """More servers -> strictly less waiting; every probability in [0,1];
    utilization < 1 on every stable row; one cell checked against an
    independent python replica of Jagerman's recursion."""
    rows = sorted(
        SPECS["orders_erlang_staffing"].builder(spark, SF_DIR).collect(),
        key=lambda r: r["c"],
    )
    assert len(rows) == 6
    waits = []
    for r in rows:
        assert 0 < r["utilization"] < 1
        assert 0 <= r["p_wait"] <= 1
        assert r["wq_days"] >= 0
        assert r["hw_sqrt_staff_c"] >= math.ceil(r["offered_erlangs"])
        waits.append(r["wq_days"])
    assert waits == sorted(waits, reverse=True), "Wq must fall as c grows"
    # replica of the stable Erlang-B fold on the smallest ladder cell
    r = rows[0]
    a, c = r["offered_erlangs"], r["c"]
    b = 1.0
    for k in range(1, c + 1):
        b = a * b / (k + a * b)
    cw = b / (1.0 - (a / c) * (1.0 - b))
    assert r["p_wait"] == pytest.approx(cw, abs=5e-5)


def test_erlang_degenerate_empty_orders(spark, tmp_path):
    """No completed orders: the ladder still emits its 6 rows with NULL
    model columns (never an abort)."""
    spark.createDataFrame(
        [],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        [],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    out = SPECS["orders_erlang_staffing"].builder(spark, str(tmp_path)).collect()
    assert len(out) == 6
    assert all(r["p_wait"] is None for r in out)


def test_diameter_double_sweep_on_planted_path(spark, tmp_path):
    """Planted path graph 0-1-2-3-4 (suppliers chained by shared parts):
    sweep 1 from node 0 reaches node 4 at depth 4, sweep 2 from 4 comes
    all the way back — diameter_lb = 4, u = 4."""
    lines = []
    ln = 0
    # part p links suppliers p and p+1 -> a 5-node path
    for p in range(4):
        for s in (p, p + 1):
            ln += 1
            lines.append((ln, p, s, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
                          __import__("datetime").datetime(2024, 1, 1)))
    spark.createDataFrame(
        lines,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    r = SPECS["graph_diameter_doublesweep"].builder(spark, str(tmp_path)).collect()[0]
    assert r["start_node"] == 0
    assert r["sweep1_ecc"] == 4 and r["u_node"] == 4
    assert r["diameter_lb"] == 4
    assert r["n_reached"] == 5


def test_diameter_sweep2_at_least_sweep1(spark):
    """The double-sweep guarantee: ecc(u) >= ecc(start) (u is the farthest
    node, so the return trip is at least as long, modulo the shared cap)."""
    r = SPECS["graph_diameter_doublesweep"].builder(spark, SF_DIR).collect()[0]
    assert r["diameter_lb"] >= r["sweep1_ecc"]
    assert r["n_reached"] >= 1


@pytest.mark.parametrize(
    "name, visible_scans, pinned",
    [
        ("orders_erlang_staffing", 0, True),  # moment table pinned
        ("graph_diameter_doublesweep", 0, True),  # adjacency + pick pinned
    ],
)
def test_wave5_scan_counts(spark, name, visible_scans, pinned):
    plan = plan_of(spark, name)
    scans = plan.count("Scan parquet")
    assert scans == visible_scans, f"{name}: {scans} visible parquet scans"
    if pinned:
        assert "ExistingRDD" in plan or "LogicalRDD" in plan, name
    assert "CartesianProduct" not in plan, name


def test_watermark_lateness_planted_disorder(spark, tmp_path):
    """100 in-order events one minute apart, then 5 late arrivals with
    hand-picked lateness {90, 30, 3, 3, 1} minutes: the audit must count
    exactly those 5, report max 90, and place the watermark quantiles on
    the hand-computed histogram (n=105: p95 -> ceil at the 100th row =
    on-time bucket 0... the 99.7th percentile boundary picks 3, p99.9 -> 30)."""
    import datetime

    d0 = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(100):  # event_id == arrival order; ts strictly rising
        rows.append((i, d0 + datetime.timedelta(minutes=i), i, "v", 1.0, "{}"))
    # late events: ts is minutes BEFORE the running max (minute 99)
    for j, late in enumerate([90, 30, 3, 3, 1]):
        rows.append(
            (100 + j, d0 + datetime.timedelta(minutes=99 - late),
             100 + j, "v", 1.0, "{}")
        )
    _write_events(spark, tmp_path, rows)
    r = SPECS["events_watermark_lateness_audit"].builder(spark, str(tmp_path)).collect()[0]
    assert r["n_events"] == 105
    assert r["n_late"] == 5
    assert r["late_rate"] == pytest.approx(5 / 105, abs=1e-6)
    assert r["max_lateness_min"] == 90
    # cum counts: 0 -> 100, 1 -> 101, 3 -> 103, 30 -> 104, 90 -> 105
    # p95: need cc*1000 >= 105*950 = 99750 -> cc >= 99.75 -> bucket 0 (cc=100)
    assert r["wm_p95_min"] == 0
    # p99: cc >= 103.95 -> bucket 30 (cc=104)
    assert r["wm_p99_min"] == 30
    # p99.9: cc*10000 >= 105*9990 -> cc >= 104.895 -> bucket 90 (cc=105)
    assert r["wm_p999_min"] == 90


def test_watermark_lateness_all_in_order(spark, tmp_path):
    """A strictly ordered stream: zero lateness everywhere, every watermark
    quantile lands on 0 minutes."""
    import datetime

    rows = [
        (i, datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=i),
         i, "v", 1.0, "{}")
        for i in range(50)
    ]
    _write_events(spark, tmp_path, rows)
    r = SPECS["events_watermark_lateness_audit"].builder(spark, str(tmp_path)).collect()[0]
    assert r["n_late"] == 0 and r["late_rate"] == 0.0
    assert r["max_lateness_min"] == 0
    assert r["wm_p95_min"] == r["wm_p99_min"] == r["wm_p999_min"] == 0


def test_watermark_lateness_no_single_partition_window(spark):
    """The per-event running-max pass must ride the ranged device: every
    window in the plan is either _pid-partitioned (the device's local
    windows) or sits on the bounded minute histogram."""
    import re

    plan = plan_of(spark, "events_watermark_lateness_audit")
    assert "CartesianProduct" not in plan
    unpart = [
        m.split(",")[0].strip()
        for m in re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
        if re.match(r"^\S+#\d+L? (ASC|DESC)", m.split(",")[0].strip())
    ]
    # the only unpartitioned ordered window is over late_min (bounded)
    assert all("late_min" in u for u in unpart), unpart


# ---------------------------------------------------------------------------
# tranche 6: K144
# ---------------------------------------------------------------------------

def test_matryoshka_self_check_and_monotone_fidelity(spark):
    out = {
        r["dims"]: r
        for r in SPECS["llm_emb_matryoshka_eval"].builder(spark, SF_DIR).collect()
    }
    assert sorted(out) == [8, 16, 32, 64]
    full = out[64]
    # the full-dim row is the self-check: identical series
    assert full["corr_vs_full"] == pytest.approx(1.0, abs=2e-6)
    assert full["mae_vs_full"] == pytest.approx(0.0, abs=2e-6)
    # every pairwise count is the same filtered pair set size, <= C(256,2)
    assert all(r["n_pairs"] == full["n_pairs"] for r in out.values())
    assert full["n_pairs"] <= 256 * 255 // 2
    # fidelity cannot degrade as the prefix grows (on this corpus)
    assert out[8]["mae_vs_full"] >= out[16]["mae_vs_full"] >= out[32]["mae_vs_full"]
    for r in out.values():
        assert -1.0 - 1e-9 <= r["corr_vs_full"] <= 1.0 + 1e-9


def test_matryoshka_planted_informative_prefix(spark, tmp_path):
    """Embeddings whose FIRST 8 dims carry all the signal (rest zero):
    the d=8 row must already be a perfect proxy (corr 1, mae 0)."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(40):
        head = [rng.uniform(-1, 1) for _ in range(8)]
        rows.append((i, [float(x) for x in head] + [0.0] * 56, i % 3))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    out = {
        r["dims"]: r
        for r in SPECS["llm_emb_matryoshka_eval"].builder(spark, str(tmp_path)).collect()
    }
    for d in (8, 16, 32, 64):
        assert out[d]["corr_vs_full"] == pytest.approx(1.0, abs=5e-6), d
        assert out[d]["mae_vs_full"] == pytest.approx(0.0, abs=5e-6), d


def test_matryoshka_plan_shape(spark):
    """The sample stage closes via TakeOrderedAndProject (never a global
    sort window) — asserted on the stage itself since the entry pins it
    into an RDD scan; the bounded pair join may nest loops but never a
    CartesianProduct."""
    from pyspark.sql import functions as F

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    h = ((F.col("vec_id") % F.lit(2147483648)) * F.lit(2654435761)) % F.lit(
        4294967296
    )
    stage = (
        e.select("vec_id", "embedding")
        .orderBy(h.asc(), F.col("vec_id").asc())
        .limit(256)
    )
    sp = stage._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in sp
    plan = plan_of(spark, "llm_emb_matryoshka_eval")
    assert "CartesianProduct" not in plan
    import re

    for m in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        first = m.split(",")[0].strip()
        assert not re.match(r"^\S+#\d+L? (ASC|DESC)", first), m


def test_dedup_threshold_sweep_monotone(spark):
    """Stricter thresholds can only shrink the pair set and the touched-doc
    set; the base cutoff row equals the full verified pair count."""
    out = {
        r["threshold"]: r
        for r in SPECS["llm_dedup_threshold_sweep"].builder(spark, SF_DIR).collect()
    }
    assert sorted(out) == [0.5, 0.6, 0.7, 0.8, 0.9]
    base = SPECS["llm_dedup_near_portable"].builder(spark, SF_DIR).count()
    assert out[0.5]["n_pairs"] == base
    prev_p, prev_d = None, None
    for t in sorted(out):
        r = out[t]
        assert r["n_docs_in_pairs"] <= 2 * r["n_pairs"] or r["n_pairs"] == 0
        assert 0 <= r["touched_share"] <= 1
        if prev_p is not None:
            assert r["n_pairs"] <= prev_p and r["n_docs_in_pairs"] <= prev_d
        prev_p, prev_d = r["n_pairs"], r["n_docs_in_pairs"]


def test_dedup_threshold_sweep_planted_cliff(spark, tmp_path):
    """Two identical docs (3-gram jaccard 1.0) and two partially
    overlapping docs (40 shared + 6 private words each -> 38 common grams
    of 44: jaccard 38/50 = 0.76): every threshold keeps the exact pair;
    the partial pair survives through 0.7 and vanishes at 0.8 — the
    cliff the sweep exists to expose."""
    shared = [f"s{i}" for i in range(40)]
    a_extra = [f"a{i}" for i in range(6)]
    b_extra = [f"b{i}" for i in range(6)]
    texts = [
        " ".join(shared + a_extra),
        " ".join(shared + b_extra),
        "dup dup " + " ".join(f"w{i}" for i in range(30)),
        "dup dup " + " ".join(f"w{i}" for i in range(30)),
    ]
    spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {
        r["threshold"]: r
        for r in SPECS["llm_dedup_threshold_sweep"].builder(spark, str(tmp_path)).collect()
    }
    assert out[0.9]["n_pairs"] == 1  # only the exact pair
    assert out[0.9]["n_docs_in_pairs"] == 2
    assert out[0.7]["n_pairs"] == 2  # the 0.76 partial pair still in
    assert out[0.8]["n_pairs"] == 1  # cliff between 0.7 and 0.8
