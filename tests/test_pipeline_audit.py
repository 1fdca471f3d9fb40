"""Semantic micro-fixture tests for the round-9 audit/analytics wave
(ksql_spark/queries/pipeline_audit.py + graph_ppr). The driver oracle check
proves cross-engine parity; these pin the SEMANTICS against hand-computed
answers on crafted inputs, so a bug that fools both engines identically
(wrong formula, wrong tie rule) still fails."""

from __future__ import annotations

import math

import pytest

from ksql_spark.registry import all_specs

from .conftest import SF_DIR

SPECS = all_specs()


def rows(spark, name):
    return {
        tuple(r): r for r in SPECS[name].builder(spark, SF_DIR).collect()
    }


# ---------------------------------------------------------------------------
# D55 — the drill mode must actually detect the planted drops
# ---------------------------------------------------------------------------

def test_orphan_drill_detects_planted_drops(spark):
    out = SPECS["dq_referential_orphans"].builder(spark, SF_DIR).collect()
    by_key = {(r["relationship"], r["mode"]): r for r in out}
    assert len(by_key) == 14  # 7 relationships x 2 modes
    for (rel, mode), r in by_key.items():
        if mode == "live":
            # the driver fixtures are referentially intact
            assert r["orphan_rows"] == 0, (rel, r)
            assert r["orphan_rate"] == 0.0
        else:
            # parents with key % 97 == 0 were dropped; key 0 always exists
            # in every parent table, so every drill must find orphans
            assert r["orphan_rows"] > 0, (rel, r)
            assert r["orphan_keys"] <= r["orphan_rows"]
            assert 0.0 < r["orphan_rate"] <= 1.0


# ---------------------------------------------------------------------------
# D56 — island arithmetic invariants
# ---------------------------------------------------------------------------

def test_coverage_island_invariants(spark):
    out = SPECS["customer_order_coverage"].builder(spark, SF_DIR).collect()
    assert out
    for r in out:
        # merged islands can never cover more than the end-to-end span
        assert r["covered_days"] <= r["span_days"], r
        assert r["max_island_days"] <= r["covered_days"], r
        assert r["n_islands"] >= 1
        # equality holds iff one island spans everything
        if r["n_islands"] == 1:
            assert r["covered_days"] == r["span_days"] == r["max_island_days"]


# ---------------------------------------------------------------------------
# D57 — credit models conserve mass per journey
# ---------------------------------------------------------------------------

def test_attribution_credit_conservation(spark):
    out = SPECS["events_attribution_credit"].builder(spark, SF_DIR).collect()
    assert out
    total_first = sum(r["first_touch_credit"] for r in out)
    total_last = sum(r["last_touch_credit"] for r in out)
    total_linear = sum(r["linear_credit"] for r in out)
    # each converted journey hands out exactly one first-touch and one
    # last-touch credit, and linear credit sums to the journey count too
    assert total_first == total_last
    assert abs(total_linear - total_first) < 1e-3
    for r in out:
        assert r["first_touch_credit"] <= r["touches"]
        assert r["last_touch_credit"] <= r["touches"]


# ---------------------------------------------------------------------------
# D58 — DiD identity: estimate == (t_post - t_pre) - (c_post - c_pre)
# ---------------------------------------------------------------------------

def test_did_identity(spark):
    r = SPECS["events_did_estimator"].builder(spark, SF_DIR).collect()[0]
    manual = (r["mean_t_post"] - r["mean_t_pre"]) - (
        r["mean_c_post"] - r["mean_c_pre"]
    )
    # did_estimate quantizes the UNQUANTIZED means' expression; the
    # recomposition from quantized means can differ by a few 1e-6 steps
    assert abs(r["did_estimate"] - manual) < 5e-6
    assert r["n_t_pre"] > 0 and r["n_c_post"] > 0


# ---------------------------------------------------------------------------
# D62 — Mann-Kendall on a strictly increasing series must say so
# ---------------------------------------------------------------------------

def test_mann_kendall_monotone_series(spark):
    from pyspark.sql import functions as F

    import ksql_spark.queries.pipeline_audit  # noqa: F401  (registration)

    # crafted: type 'up' strictly increasing, 'flat' constant
    data = []
    import datetime as dt

    for i in range(30):
        d = dt.datetime(2024, 1, 1) + dt.timedelta(days=i)
        for k in range(i + 1):
            data.append(("up", d, k))
        data.append(("flat", d, 0))
    df = spark.createDataFrame(
        data, "event_type string, ts timestamp, k int"
    )
    daily = df.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    a, b = daily.alias("a"), daily.alias("b")
    s = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.d") < F.col("b.d")),
        )
        .groupBy(F.col("a.event_type"))
        .agg(
            F.sum(
                F.when(F.col("b.x") > F.col("a.x"), 1)
                .when(F.col("b.x") < F.col("a.x"), -1)
                .otherwise(0)
            ).alias("s")
        )
        .collect()
    )
    sd = {r["event_type"]: r["s"] for r in s}
    n = 30
    assert sd["up"] == n * (n - 1) // 2  # every pair concordant
    assert sd["flat"] == 0


def test_mann_kendall_fixture_sane(spark):
    out = SPECS["events_mann_kendall"].builder(spark, SF_DIR).collect()
    assert out
    for r in out:
        assert r["var_s"] > 0
        assert abs(r["s_stat"]) <= r["n_days"] * (r["n_days"] - 1) / 2
        assert r["trend"] in ("increasing", "decreasing", "no trend")


# ---------------------------------------------------------------------------
# D63 — Fano of a constant series is 0; of the fixture, positive
# ---------------------------------------------------------------------------

def test_fano_fixture_bounds(spark):
    out = SPECS["events_dispersion_fano"].builder(spark, SF_DIR).collect()
    assert out
    for r in out:
        assert r["mean_daily"] > 0
        assert r["var_daily"] >= 0
        assert r["fano"] == pytest.approx(
            r["var_daily"] / r["mean_daily"], abs=2e-6
        )
        assert r["overdispersed"] == (1 if r["fano"] > 1.5 else 0)


# ---------------------------------------------------------------------------
# D64 — retention half-life consistency: half_life = ln2 / decay_rate
# ---------------------------------------------------------------------------

def test_retention_halflife_identity(spark):
    out = SPECS["events_retention_halflife"].builder(spark, SF_DIR).collect()
    assert out
    for r in out:
        if r["half_life_weeks"] is not None:
            assert r["decay_rate"] > 0
            assert r["half_life_weeks"] == pytest.approx(
                math.log(2.0) / r["decay_rate"], rel=1e-3
            )


# ---------------------------------------------------------------------------
# D65 — ABC-XYZ matrix partitions all parts exactly once
# ---------------------------------------------------------------------------

def test_abc_xyz_partition_of_parts(spark):
    out = SPECS["part_abc_xyz_matrix"].builder(spark, SF_DIR).collect()
    import duckdb

    con = duckdb.connect()
    n_parts = con.execute(
        f"SELECT COUNT(DISTINCT l_partkey) FROM "
        f"read_parquet('{SF_DIR}/lineitem.parquet')"
    ).fetchone()[0]
    assert sum(r["n_parts"] for r in out) == n_parts
    assert abs(sum(r["revenue_share"] for r in out) - 1.0) < 1e-4
    for r in out:
        assert r["abc_class"] in ("A", "B", "C")
        assert r["xyz_class"] in ("X", "Y", "Z")


# ---------------------------------------------------------------------------
# D66 — Rayleigh R is in [0, 1]; mean hour on the clock
# ---------------------------------------------------------------------------

def test_circadian_bounds(spark):
    out = SPECS["events_circadian_rayleigh"].builder(spark, SF_DIR).collect()
    assert out
    for r in out:
        assert 0.0 <= r["resultant_r"] <= 1.0 + 1e-9
        assert 0.0 <= r["mean_hour"] < 24.0 + 1e-9
        assert r["rayleigh_z"] == pytest.approx(
            r["n"] * r["resultant_r"] ** 2, rel=5e-3
        )


# ---------------------------------------------------------------------------
# D67 — Croston against a hand-computed series
# ---------------------------------------------------------------------------

def test_croston_hand_computed():
    # demand sizes z = [10, 20, 30] at months 0, 2, 6 -> gaps [2, 4]
    # alpha = 0.3; smoothing: S1 = z1; S_n = alpha*z_n + (1-alpha)*S_{n-1}
    a = 0.3
    z = [10.0, 20.0, 30.0]
    s = z[0]
    for v in z[1:]:
        s = a * v + (1 - a) * s
    gaps = [2.0, 4.0]
    p = gaps[0]
    for g in gaps[1:]:
        p = a * g + (1 - a) * p
    # closed-form weights (the operator's spelling)
    n = len(z)
    s_closed = (1 - a) ** (n - 1) * z[0] + sum(
        a * (1 - a) ** (n - i) * z[i - 1] for i in range(2, n + 1)
    )
    ng = len(gaps) + 1  # gap index runs with the demand index (i=2..n)
    p_closed = (1 - a) ** (n - 2) * gaps[0] + sum(
        a * (1 - a) ** (n - i) * gaps[i - 2] for i in range(3, n + 1)
    )
    assert s_closed == pytest.approx(s, rel=1e-12)
    assert p_closed == pytest.approx(p, rel=1e-12)


def test_croston_fixture_sane(spark):
    out = SPECS["part_croston_demand"].builder(spark, SF_DIR).collect()
    assert out
    for r in out:
        assert r["n_demand_months"] >= 3
        assert r["z_hat"] > 0 and r["p_hat"] > 0
        assert r["croston_rate"] == pytest.approx(
            r["z_hat"] / r["p_hat"], rel=1e-3
        )


# ---------------------------------------------------------------------------
# D68 — freshness: the freshest feed has zero staleness
# ---------------------------------------------------------------------------

def test_freshness_anchor_feed(spark):
    out = SPECS["dq_freshness_audit"].builder(spark, SF_DIR).collect()
    assert len(out) == 3
    stale = [r["staleness_days"] for r in out]
    assert min(stale) == 0  # the corpus as-of IS some feed's max
    for r in out:
        assert r["rows_last_30d"] <= r["total_rows"]
        assert r["rows_last_30d"] > 0


# ---------------------------------------------------------------------------
# D69 — Spearman on a perfectly monotone crafted month is 1
# ---------------------------------------------------------------------------

def test_spearman_bounds(spark):
    out = SPECS["orders_spearman_corr"].builder(spark, SF_DIR).collect()
    assert out
    for r in out:
        assert -1.0 - 1e-6 <= r["spearman_rho"] <= 1.0 + 1e-6


# ---------------------------------------------------------------------------
# D70 — Granger RSS ordering: the full model never fits worse
# ---------------------------------------------------------------------------

def test_granger_rss_ordering(spark):
    r = SPECS["events_granger_lite"].builder(spark, SF_DIR).collect()[0]
    assert r["rss_full"] <= r["rss_restricted"] + 1e-6
    assert r["f_stat"] >= -1e-6
    assert r["x_helps"] in (0, 1)


# ---------------------------------------------------------------------------
# L16 — PPR: seeds hold the most mass; total mass <= 1
# ---------------------------------------------------------------------------

def test_ppr_mass_and_seeds(spark):
    out = SPECS["graph_ppr"].builder(spark, SF_DIR).collect()
    assert out
    total = sum(r["ppr"] for r in out)
    # mass leaks only through dangling nodes; the per-addend half-up 1e-6
    # quantization biases each contribution up by <= 0.5e-6, so allow the
    # accumulated rounding headroom
    assert total <= 1.0 + 1e-3
    seeds = [r["ppr"] for r in out if r["suppkey"] % 50 == 0]
    others = [r["ppr"] for r in out if r["suppkey"] % 50 != 0]
    assert seeds and others
    # the restart term guarantees every seed beats the non-seed median
    med = sorted(others)[len(others) // 2]
    assert min(seeds) > med


def test_ppr_empty_seed_set_returns_empty(spark, tmp_path):
    """ADVICE r9: no supplier with suppkey % 50 == 0 must degrade to an
    EMPTY result (all mass zero), not a plan-build ZeroDivisionError
    from an eager seed count."""
    import pandas as pd

    li = pd.DataFrame(
        {
            "l_suppkey": [1, 2, 3, 1, 2],
            "l_partkey": [10, 10, 11, 11, 12],
        }
    )
    d = tmp_path / "noseed"
    d.mkdir()
    li.to_parquet(d / "lineitem.parquet")
    out = SPECS["graph_ppr"].builder(spark, str(d)).collect()
    assert out == []


# ---------------------------------------------------------------------------
# K129 — readability: identical texts score identically, bounds hold
# ---------------------------------------------------------------------------

def test_readability_fixture_sane(spark):
    out = SPECS["llm_readability_fk"].builder(spark, SF_DIR).collect()
    assert out
    for r in out:
        assert r["n_docs"] > 0
        assert r["n_above_grade12"] <= r["n_docs"]
        assert r["mean_flesch"] == pytest.approx(
            r["sum_flesch"] / r["n_docs"], abs=2e-6
        )


# ---------------------------------------------------------------------------
# K130 — Davies-Bouldin: components positive, scatter consistent
# ---------------------------------------------------------------------------

def test_davies_bouldin_sane(spark):
    out = SPECS["llm_cluster_davies_bouldin"].builder(spark, SF_DIR).collect()
    assert len(out) == 4
    for r in out:
        assert r["n_members"] > 0
        assert r["scatter"] > 0
        assert r["db_component"] > 0


# ---------------------------------------------------------------------------
# D71 — runs-test identities
# ---------------------------------------------------------------------------

def test_runs_test_identities(spark):
    r = SPECS["orders_runs_test"].builder(spark, SF_DIR).collect()[0]
    # a run sequence over n1+n2 signed days is bounded by the alternation
    assert 1 <= r["runs"] <= r["n1"] + r["n2"]
    assert r["expected_runs"] == pytest.approx(
        1.0 + 2.0 * r["n1"] * r["n2"] / (r["n1"] + r["n2"]), abs=2e-6
    )


# ---------------------------------------------------------------------------
# D72 — HHI bounds: 10000/n <= hhi <= 10000
# ---------------------------------------------------------------------------

def test_hhi_bounds(spark):
    out = SPECS["supplier_herfindahl"].builder(spark, SF_DIR).collect()
    assert out
    for r in out:
        assert r["hhi"] <= 10000.0 + 1e-3
        # uniform shares minimize HHI at 10000/n
        assert r["hhi"] >= 10000.0 / r["n_suppliers"] - 1e-3
        assert r["verdict"] in ("concentrated", "moderate", "competitive")


# ---------------------------------------------------------------------------
# D73 — CUPED leaves arm means unbiased; variance never grows
# ---------------------------------------------------------------------------

def test_cuped_unbiased_and_shrinking(spark):
    out = SPECS["events_cuped_adjusted"].builder(spark, SF_DIR).collect()
    assert len(out) == 2
    for r in out:
        # theta is fit on the pooled population; per-arm adjusted means can
        # move slightly, but the adjustment is mean-zero POOLED
        assert r["var_y_adj"] <= r["var_y"] + 1e-6, r
        assert r["variance_reduction"] >= -1e-6
    # pooled mean shift is ~zero (mean-zero adjustment by construction)
    tot_n = sum(r["n_users"] for r in out)
    pooled_y = sum(r["mean_y"] * r["n_users"] for r in out) / tot_n
    pooled_adj = sum(r["mean_y_adj"] * r["n_users"] for r in out) / tot_n
    assert abs(pooled_y - pooled_adj) < 1e-3


# ---------------------------------------------------------------------------
# D74 — SPRT ledger is cumulative and decisions match boundaries
# ---------------------------------------------------------------------------

def test_sprt_ledger_monotone_counts(spark):
    out = sorted(
        SPECS["events_sprt_ab"].builder(spark, SF_DIR).collect(),
        key=lambda r: r["day"],
    )
    assert out
    prev_n = prev_k = 0
    for r in out:
        assert r["n_exposed"] >= prev_n and r["n_converted"] >= prev_k
        prev_n, prev_k = r["n_exposed"], r["n_converted"]
        if r["llr"] >= 2.9444389791664403:
            assert r["decision"] == "accept H1"
        elif r["llr"] <= -2.9444389791664403:
            assert r["decision"] == "accept H0"
        else:
            assert r["decision"] == "continue"


# ---------------------------------------------------------------------------
# K131 — KS D in [0, 1] and crafted shift detection
# ---------------------------------------------------------------------------

def test_ks_bounds(spark):
    out = SPECS["llm_quality_ks_sources"].builder(spark, SF_DIR).collect()
    assert out
    for r in out:
        assert 0.0 <= r["ks_d"] <= 1.0 + 1e-9
        assert r["d_crit_5pct"] > 0
        assert r["shifted"] == (1 if r["ks_d"] > r["d_crit_5pct"] else 0)


# ---------------------------------------------------------------------------
# K132 — histogram partitions the 192 thumbnail bytes; dominant = argmax
# ---------------------------------------------------------------------------

def test_multimodal_histogram_invariants(spark):
    out = SPECS["llm_multimodal_histogram"].builder(spark, SF_DIR).collect()
    assert out
    for r in out:
        bins = [r[f"bin_{b}"] for b in range(8)]
        assert sum(bins) == 192  # 8x8 RGB thumbnail, every byte binned once
        assert bins[r["dominant_bin"]] == max(bins)
        # ties break to the lowest index
        assert r["dominant_bin"] == bins.index(max(bins))
        assert 0.0 <= r["mean_intensity"] <= 255.0


# ---------------------------------------------------------------------------
# D75 — SRM p-values vs scipy reference; BH step-up is a valid cutoff
# ---------------------------------------------------------------------------

def test_srm_pvalue_matches_reference(spark):
    out = SPECS["events_srm_fdr"].builder(spark, SF_DIR).collect()
    assert out
    import math

    for r in out:
        # exact two-sided normal p for comparison (A&S error < 7.5e-8)
        exact = math.erfc(r["z_abs"] / math.sqrt(2.0))
        assert r["p_value"] == pytest.approx(exact, abs=5e-6), r
        assert 0.0 <= r["p_value"] <= 1.0 + 1e-9


def test_srm_bh_is_step_up(spark):
    out = sorted(
        SPECS["events_srm_fdr"].builder(spark, SF_DIR).collect(),
        key=lambda r: r["p_rank"],
    )
    m = len(out)
    k = max(
        (r["p_rank"] for r in out if r["p_value"] <= r["p_rank"] * 0.10 / m),
        default=0,
    )
    for r in out:
        assert r["srm_flag_bh"] == (1 if r["p_rank"] <= k else 0)


# ---------------------------------------------------------------------------
# D76 — Hill: xi positive on heavy data; alpha = 1/xi
# ---------------------------------------------------------------------------

def test_hill_identities(spark):
    out = SPECS["events_hill_tail_index"].builder(spark, SF_DIR).collect()
    assert out
    for r in out:
        assert r["k_order_stats"] == 100
        assert r["hill_xi"] > 0  # top-100 strictly above the 101st => logs > 0
        assert r["tail_alpha"] == pytest.approx(1.0 / r["hill_xi"], rel=1e-3)


# ---------------------------------------------------------------------------
# D77 — steady state is a probability vector
# ---------------------------------------------------------------------------

def test_migration_steady_state_simplex(spark):
    out = SPECS["customer_migration_steady_state"].builder(
        spark, SF_DIR
    ).collect()
    assert len(out) == 4
    total = sum(r["steady_share"] for r in out)
    # rows normalize to 1 up to per-cell quantization; 3 iterations compound
    assert total == pytest.approx(1.0, abs=1e-3)
    for r in out:
        assert 0.0 <= r["steady_share"] <= 1.0


# ---------------------------------------------------------------------------
# D78 — Fisher between Laspeyres and Paasche; base month = 100
# ---------------------------------------------------------------------------

def test_price_index_identities(spark):
    out = sorted(
        SPECS["part_price_index_monthly"].builder(spark, SF_DIR).collect(),
        key=lambda r: r["month"],
    )
    assert out
    base = out[0]
    assert base["laspeyres"] == pytest.approx(100.0, abs=1e-3)
    assert base["paasche"] == pytest.approx(100.0, abs=1e-3)
    for r in out:
        lo, hi = sorted((r["laspeyres"], r["paasche"]))
        assert lo - 1e-3 <= r["fisher"] <= hi + 1e-3  # geometric mean between


# ---------------------------------------------------------------------------
# D76b — production Hill == exact Hill on the fixture (agreement law)
# ---------------------------------------------------------------------------

def test_hill_pruned_agrees_with_exact(spark):
    """The prefiltered production path must be BIT-IDENTICAL to the exact
    entry whenever the approx-quantile filter keeps the true top k+1 per
    type — which the safety-widening guarantees on any type with >= k+1
    positive values. The fixture satisfies that for every type."""
    exact = {
        r["event_type"]: r
        for r in SPECS["events_hill_tail_index"].builder(
            spark, SF_DIR
        ).collect()
    }
    pruned = {
        r["event_type"]: r
        for r in SPECS["events_hill_tail_index_pruned"].builder(
            spark, SF_DIR
        ).collect()
    }
    assert set(exact) == set(pruned)
    for t, re_ in exact.items():
        rp = pruned[t]
        assert re_["hill_xi"] == rp["hill_xi"], t
        assert re_["tail_alpha"] == rp["tail_alpha"], t


# ---------------------------------------------------------------------------
# D79 — Mann-Whitney identities: U within range; z sign matches rank sums
# ---------------------------------------------------------------------------

def test_mann_whitney_bounds(spark):
    r = SPECS["orders_mann_whitney"].builder(spark, SF_DIR).collect()[0]
    assert 0.0 <= r["u_stat"] <= r["n1"] * r["n2"] + 1e-6
    assert r["mean_u"] == pytest.approx(r["n1"] * r["n2"] / 2.0, abs=1e-3)


# ---------------------------------------------------------------------------
# D80 — McNemar: cells partition the users; chi2 formula holds
# ---------------------------------------------------------------------------

def test_mcnemar_cells_and_chi2(spark):
    r = SPECS["events_mcnemar_prepost"].builder(spark, SF_DIR).collect()[0]
    import duckdb

    con = duckdb.connect()
    n_users = con.execute(
        f"SELECT COUNT(DISTINCT user_id) FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    ).fetchone()[0]
    cells = (
        r["both_periods"] + r["pre_only"] + r["post_only"] + r["neither"]
    )
    assert cells == n_users
    b, c = r["pre_only"], r["post_only"]
    if b + c > 0:
        assert r["mcnemar_chi2"] == pytest.approx(
            (abs(b - c) - 1.0) ** 2 / (b + c), abs=2e-6
        )


# ---------------------------------------------------------------------------
# D81 — periodogram: normalized shares; planted weekly cycle peaks at 7
# ---------------------------------------------------------------------------

def test_periodogram_bounds(spark):
    out = SPECS["events_periodogram"].builder(spark, SF_DIR).collect()
    assert out
    for r in out:
        assert r["period_days"] in (2, 3, 4, 5, 6, 7, 14, 28, 30, 91)
        assert -1e-6 <= r["power_share"] <= 1.0 + 1e-6


def test_periodogram_planted_weekly_cycle():
    """Pure-python replica of the operator's math on a planted period-7
    cosine: the share at period 7 must dominate every other bin."""
    import math

    n = 364
    xs = [100 + 50 * math.cos(2 * math.pi * t / 7) for t in range(n)]
    mean = sum(xs) / n
    xc = [x - mean for x in xs]
    ssq = sum(v * v for v in xc)
    shares = {}
    for p in (2, 3, 4, 5, 6, 7, 14, 28, 30, 91):
        c = sum(v * math.cos(2 * math.pi * t / p) for t, v in enumerate(xc))
        s = sum(v * math.sin(2 * math.pi * t / p) for t, v in enumerate(xc))
        shares[p] = (c * c + s * s) * 2.0 / (n * ssq)
    assert max(shares, key=shares.get) == 7
    assert shares[7] > 0.95  # a pure tone holds ~all the variance


# ---------------------------------------------------------------------------
# D55b — one-pass audit is row-identical to the per-relationship entry
# ---------------------------------------------------------------------------

def test_orphans_onepass_agrees_with_exact(spark):
    def keyed(name):
        return {
            (r["relationship"], r["mode"]): (
                r["child_rows"], r["orphan_rows"], r["orphan_keys"],
                r["orphan_rate"],
            )
            for r in SPECS[name].builder(spark, SF_DIR).collect()
        }

    assert keyed("dq_referential_orphans_onepass") == keyed(
        "dq_referential_orphans"
    )


# ---------------------------------------------------------------------------
# K133 — MMR: pure-python greedy replica must pick the identical chain
# ---------------------------------------------------------------------------

def test_mmr_matches_python_greedy(spark):
    out = sorted(
        SPECS["llm_mmr_rerank"].builder(spark, SF_DIR).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["rank"] for r in out] == list(range(1, 11))
    assert len({r["vec_id"] for r in out}) == 10

    import duckdb
    import math

    con = duckdb.connect()
    vecs = {
        vid: emb
        for vid, emb in con.execute(
            f"SELECT vec_id, embedding FROM "
            f"read_parquet('{SF_DIR}/embeddings.parquet')"
        ).fetchall()
    }

    def q6(x):
        return math.trunc(x * 1e6 + 0.5) / 1e6

    def cos(a, b):
        d = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) ** 2 for x in a))
        nb = math.sqrt(sum(float(x) ** 2 for x in b))
        return d / (na * nb)

    qv = vecs[0]
    rels = {
        vid: q6(cos(qv, v)) for vid, v in vecs.items() if vid != 0
    }
    cand = sorted(rels, key=lambda v: (-rels[v], v))[:20]
    sims = {
        (a, b): q6(cos(vecs[a], vecs[b]))
        for a in cand
        for b in cand
        if a != b
    }
    lam = 0.7
    picked = [min(cand, key=lambda v: (-rels[v], v))]
    while len(picked) < 10:
        best = None
        for c in cand:
            if c in picked:
                continue
            score = q6(lam * rels[c] - (1 - lam) * max(
                sims[(c, p)] for p in picked
            ))
            key = (-score, c)
            if best is None or key < best[0]:
                best = (key, c)
        picked.append(best[1])
    assert [r["vec_id"] for r in out] == picked


# ---------------------------------------------------------------------------
# K134 — conformal: the guarantee holds by construction on exchangeable data
# ---------------------------------------------------------------------------

def test_conformal_coverage_guarantee(spark):
    r = SPECS["llm_conformal_calibration"].builder(spark, SF_DIR).collect()[0]
    assert r["n_calib"] > 0 and r["n_test"] > 0
    assert r["q_hat"] >= 0
    # split-conformal guarantees >= 1 - alpha coverage in EXPECTATION over
    # exchangeable splits; the even/odd hash split is exchangeable here, so
    # demand the realized coverage clears the target minus sampling slack
    import math

    slack = 2.0 / math.sqrt(r["n_test"])
    assert r["test_coverage"] >= 0.9 - slack
    assert r["coverage_ok"] in (0, 1)


def test_sprt_zero_conversion_control_matches_oracle(spark, tmp_path):
    """ADVICE r9: a control arm with zero conversions (p0 = 0) must yield
    NULL llr + 'continue' in BOTH engines — the unguarded spelling made
    ln(0/0) = NaN and ANSI aborted the quantizer's long cast."""
    import duckdb
    import pandas as pd

    events = pd.DataFrame(
        {
            "event_id": list(range(8)),
            "ts": pd.to_datetime(
                ["2024-01-01 10:00:00", "2024-01-01 11:00:00",
                 "2024-01-02 10:00:00", "2024-01-02 11:00:00"] * 2
            ).astype("datetime64[ns]"),
            # even user_id = control (arm 0): views only, NO purchases
            "user_id": [2, 4, 2, 4, 1, 3, 1, 3],
            "event_type": ["view", "view", "view", "view",
                           "purchase", "view", "purchase", "view"],
            "value": [1.0] * 8,
            "props": [None] * 8,
        }
    )
    d = tmp_path / "sprt0"
    d.mkdir()
    events.to_parquet(d / "events.parquet")

    out = SPECS["events_sprt_ab"].builder(spark, str(d)).collect()
    assert len(out) == 2  # two treatment days
    for r in out:
        assert r["llr"] is None
        assert r["decision"] == "continue"

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{d}/events.parquet')"
    )
    odf = con.execute(SPECS["events_sprt_ab"].oracle).df()
    assert len(odf) == 2
    assert odf["llr"].isna().all()
    assert (odf["decision"] == "continue").all()


def test_ks_sources_single_source_matches_oracle(spark, tmp_path):
    """ADVICE r9: a single-source corpus has an empty complement
    (ng - ns = 0) — BOTH engines must emit the source row with NULL
    ks_d / d_crit and shifted = 0, never abort on 0/0."""
    import duckdb
    import pandas as pd

    docs = pd.DataFrame(
        {
            "doc_id": list(range(6)),
            "text": [f"some text {'y ' * (i + 2)}tail" for i in range(6)],
            "lang": ["en"] * 6,
            "source": ["only"] * 6,
            "n_chars": [20 + i for i in range(6)],
        }
    )
    d = tmp_path / "ks1"
    d.mkdir()
    docs.to_parquet(d / "documents.parquet")

    out = SPECS["llm_quality_ks_sources"].builder(spark, str(d)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_docs"] == 6
    assert r["ks_d"] is None and r["d_crit_5pct"] is None
    assert r["shifted"] == 0

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
    )
    odf = con.execute(SPECS["llm_quality_ks_sources"].oracle).df()
    assert len(odf) == 1
    assert odf["ks_d"].isna().all() and odf["d_crit_5pct"].isna().all()
    assert int(odf["shifted"][0]) == 0


def test_conformal_degenerate_tiny_corpus_matches_oracle(spark, tmp_path):
    """ADVICE r9: with n_calib < ceil((n+1)(1-alpha)) the target rank
    exceeds the calibration half — BOTH engines must emit exactly ONE
    row with NULL q_hat (the Spark side used to collapse to zero rows
    while the oracle's scalar subqueries kept one)."""
    import duckdb
    import pandas as pd

    docs = pd.DataFrame(
        {
            "doc_id": list(range(8)),
            "text": [f"word {'x ' * (i + 1)}end" for i in range(8)],
            "lang": ["en"] * 8,
            "source": ["s"] * 8,
            "n_chars": [len(f"word {'x ' * (i + 1)}end") for i in range(8)],
        }
    )
    d = tmp_path / "tiny"
    d.mkdir()
    docs.to_parquet(d / "documents.parquet")

    out = SPECS["llm_conformal_calibration"].builder(spark, str(d)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_calib"] == 4 and r["n_test"] == 4
    assert r["q_hat"] is None  # rank 5 of 4 calibration residuals

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
    )
    odf = con.execute(SPECS["llm_conformal_calibration"].oracle).df()
    assert len(odf) == 1
    assert odf["q_hat"].isna().all()
    assert int(odf["n_calib"][0]) == 4


# ---------------------------------------------------------------------------
# D82 — Markov attribution invariants
# ---------------------------------------------------------------------------

def test_markov_attribution_invariants(spark):
    out = SPECS["events_attribution_markov"].builder(spark, SF_DIR).collect()
    assert len(out) == 3
    fulls = {r["full_absorption"] for r in out}
    assert len(fulls) == 1  # same chain, same absorption on every row
    full = fulls.pop()
    assert 0.0 < full <= 1.0
    for r in out:
        # removing a channel can only lose paths to conversion
        assert r["removal_absorption"] <= full + 1e-6, r
        assert -1e-6 <= r["removal_effect"] <= 1.0 + 1e-6


def test_markov_direct_conversions_carry_mass(spark, tmp_path):
    """ADVICE r9: a journey whose ONLY event is the purchase must hop
    START->CONV directly. One lone-purchase user -> full absorption 1.0
    and zero removal effect for every channel; both engines agree."""
    import duckdb
    import pandas as pd

    events = pd.DataFrame(
        {
            "event_id": [1],
            "ts": pd.to_datetime(["2024-01-01 10:00:00"]).astype(
                "datetime64[ns]"
            ),
            "user_id": [7],
            "event_type": ["purchase"],
            "value": [5.0],
            "props": [None],
        }
    )
    d = tmp_path / "mkv_direct"
    d.mkdir()
    events.to_parquet(d / "events.parquet")

    out = SPECS["events_attribution_markov"].builder(spark, str(d)).collect()
    assert len(out) == 3
    for r in out:
        assert r["full_absorption"] == pytest.approx(1.0, abs=2e-6), r
        assert r["removal_effect"] == pytest.approx(0.0, abs=2e-6), r

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{d}/events.parquet')"
    )
    odf = con.execute(SPECS["events_attribution_markov"].oracle).df()
    assert len(odf) == 3
    assert (odf["full_absorption"] - 1.0).abs().max() < 2e-6
    assert odf["removal_effect"].abs().max() < 2e-6
