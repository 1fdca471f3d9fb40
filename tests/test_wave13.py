"""Round-13 wave laws: the K94 HLL id-domain production sibling
(events_dau_mau_hll) against the exact bitmap entry, plus its plan gates.

The exact K94 grid needs a dictionary-bounded id domain (bitmap words are
O(id_domain/32) per day); 100 TB user domains are not bounded, so the
sibling carries one constant-size HLL sketch per day instead. Laws:

  * same observed-day set as events_dau_mau_stickiness;
  * dau/mau estimates within ±5% of the exact counts (lgK=12 RSE ~0.8%,
    and Datasketches HLL is exact in sparse mode at fixture cardinalities);
  * stickiness within ±5% relative;
  * plan gates: no cartesian product, ONE events scan (the pinned daily
    sketch table feeds both the DAU read and the 28-day merge), and the
    28x contribution explode runs on the |days|-row sketch table, never
    the corpus.
"""

from __future__ import annotations

from ksql_spark.registry import all_specs

from .conftest import SF_DIR

SPECS = all_specs()


def _rows(spark, name, sf=SF_DIR):
    return SPECS[name].builder(spark, sf).collect()


def test_dau_mau_hll_laws_vs_exact(spark):
    est = {r["day"]: r for r in _rows(spark, "events_dau_mau_hll")}
    exact = {r["day"]: r for r in _rows(spark, "events_dau_mau_stickiness")}
    # law 1: identical observed-day sets
    assert set(est) == set(exact)
    for d, r in est.items():
        e = exact[d]
        # law 2: ±5% on the cardinality estimates
        assert abs(r["dau_est"] - e["dau"]) <= 0.05 * max(e["dau"], 1), (
            d, r["dau_est"], e["dau"],
        )
        assert abs(r["mau_est"] - e["mau"]) <= 0.05 * max(e["mau"], 1), (
            d, r["mau_est"], e["mau"],
        )
        # law 3: ±5% relative on the ratio
        assert abs(r["stickiness_est"] - e["stickiness"]) <= (
            0.05 * e["stickiness"] + 1e-9
        ), (d, r["stickiness_est"], e["stickiness"])
        # sanity: a day's actives can never exceed its trailing-28 actives
        assert r["dau_est"] <= r["mau_est"]


def test_dau_mau_hll_plan_shape(spark):
    df = SPECS["events_dau_mau_hll"].builder(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # one corpus scan: the pinned daily sketch table feeds both branches
    assert plan.count("events.parquet") <= 1, plan.count("events.parquet")


# ---------------------------------------------------------------------------
# r13 wave planted probes — every expectation computed BY HAND in the
# comments (the GCRA/Cramér-V lesson: independently derived numbers, not
# engine output pasted back)
# ---------------------------------------------------------------------------

import datetime


def _d(day):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(days=day)


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


def _write_part(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ).write.mode("overwrite").parquet(f"{tmp_path}/part.parquet")


# ---- D110 Friedman ----

def test_friedman_hand_computed(spark, tmp_path):
    # 2 complete month-blocks, 3 treatments, consistent ordering A<B<C:
    # ranks (1,2,3) in both blocks -> R = (2,4,6),
    # Q = 12/(2*3*4) * (4+16+36) - 3*2*4 = 28 - 24 = 4.
    # A third month holding ONLY priority A is incomplete -> dropped.
    rows = []
    ok = 1
    for mo, base in [(0, 0.0), (31, 100.0)]:  # Jan, Feb
        for i, (pri, val) in enumerate([("A", 10.0), ("B", 20.0), ("C", 30.0)]):
            rows.append((ok, 1, "O", base + val, _d(mo + i), pri))
            ok += 1
    rows.append((ok, 1, "O", 5.0, _d(62), "A"))  # March: incomplete
    _write_orders(spark, tmp_path, rows)
    r = SPECS["orders_friedman_test"].builder(spark, str(tmp_path)).collect()[0]
    assert r["n_blocks"] == 2 and r["k"] == 3
    assert abs(r["q_stat"] - 4.0) < 1e-6


# ---- D111 Kendall tau-b ----

def test_kendall_tau_hand_computed(spark, tmp_path):
    # daily (x, y): (1,10), (2,20), (3,5), (4,30) -> of the 6 pairs,
    # concordant = {12,14,24,34} = 4, discordant = {13,23} = 2, no ties:
    # tau = (4-2)/6 = 0.333333; z = 2/sqrt(4*3*13/18) = 0.679366.
    rows, ok = [], 1
    day_specs = [(0, [10.0]), (1, [10.0, 10.0]), (2, [1.0, 1.0, 3.0]),
                 (3, [7.5, 7.5, 7.5, 7.5])]
    for day, prices in day_specs:
        for pr in prices:
            rows.append((ok, 1, "O", pr, _d(day), "A"))
            ok += 1
    _write_orders(spark, tmp_path, rows)
    r = SPECS["orders_kendall_tau_daily"].builder(spark, str(tmp_path)).collect()[0]
    assert r["n_days"] == 4
    assert r["n_concordant"] == 4 and r["n_discordant"] == 2
    assert abs(r["tau_b"] - 0.333333) < 1e-6
    assert abs(r["z_stat"] - 0.679366) < 1e-5


# ---- D112 Allen-Cunneen ----

def test_allen_cunneen_deterministic_flow_zero_correction(spark, tmp_path):
    """One order per day, every service exactly 2 days -> BOTH squared
    CVs are 0, so the Allen-Cunneen wait is exactly 0 while the M/M/c
    wait is positive: the planted case where the variability correction
    must vanish identically."""
    orows, lrows = [], []
    for i in range(10):
        orows.append((i + 1, 1, "O", 100.0, _d(i), "A"))
        lrows.append((i + 1, 1, 1, 1, 5.0, 50.0, 0.0, 0.0, "N", "O",
                      _d(i + 1)))  # ships next day -> dur = 2
    _write_orders(spark, tmp_path, orows)
    _write_lineitem(spark, tmp_path, lrows)
    r = SPECS["orders_allen_cunneen_wait"].builder(spark, str(tmp_path)).collect()[0]
    assert abs(r["ca2"]) < 1e-6 and abs(r["cs2"]) < 1e-6
    assert abs(r["s_days"] - 2.0) < 1e-6
    assert r["wq_mmc_days"] > 0
    assert abs(r["wq_ac_days"]) < 1e-6


def test_allen_cunneen_bursty_arrivals_amplify_wait(spark, tmp_path):
    # 9 orders land on one day + 1 order 8 days later: arrival
    # dispersion ca2 >> 1, so wq_ac > wq_mmc (service still fixed).
    orows, lrows = [], []
    for i in range(9):
        orows.append((i + 1, 1, "O", 100.0, _d(0), "A"))
        lrows.append((i + 1, 1, 1, 1, 5.0, 50.0, 0.0, 0.0, "N", "O", _d(1)))
    orows.append((10, 1, "O", 100.0, _d(8), "A"))
    lrows.append((10, 1, 1, 1, 5.0, 50.0, 0.0, 0.0, "N", "O", _d(9)))
    _write_orders(spark, tmp_path, orows)
    _write_lineitem(spark, tmp_path, lrows)
    r = SPECS["orders_allen_cunneen_wait"].builder(spark, str(tmp_path)).collect()[0]
    assert r["ca2"] > 1.0
    assert r["wq_ac_days"] > r["wq_mmc_days"]


# ---- D113 Theil ----

def test_theil_zero_on_equal_revenue(spark, tmp_path):
    orows = [(i, i, "O", 100.0, _d(0), "A") for i in range(1, 9)]
    crows = [(i, f"c{i}", 0, 0.0, "S1" if i <= 4 else "S2")
             for i in range(1, 9)]
    _write_orders(spark, tmp_path, orows)
    _write_customer(spark, tmp_path, crows)
    r = SPECS["customer_theil_decomposition"].builder(spark, str(tmp_path)).collect()[0]
    assert abs(r["theil_total"]) < 1e-6
    assert abs(r["theil_within"]) < 1e-6
    assert abs(r["theil_between"]) < 1e-6


def test_theil_between_only_hand_computed(spark, tmp_path):
    # Segment S1: 2 customers x 100; segment S2: 2 customers x 300.
    # Within-segment spread is zero -> T_within = 0 and the whole index
    # is between: T = 0.25*ln(0.5) + 0.75*ln(1.5) = 0.130812 (by hand:
    # 0.25*(-0.693147) + 0.75*0.405465 = -0.173287 + 0.304099).
    orows = [(1, 1, "O", 100.0, _d(0), "A"), (2, 2, "O", 100.0, _d(0), "A"),
             (3, 3, "O", 300.0, _d(0), "A"), (4, 4, "O", 300.0, _d(0), "A")]
    crows = [(1, "a", 0, 0.0, "S1"), (2, "b", 0, 0.0, "S1"),
             (3, "c", 0, 0.0, "S2"), (4, "d", 0, 0.0, "S2")]
    _write_orders(spark, tmp_path, orows)
    _write_customer(spark, tmp_path, crows)
    r = SPECS["customer_theil_decomposition"].builder(spark, str(tmp_path)).collect()[0]
    assert abs(r["theil_total"] - 0.130812) < 2e-6
    assert abs(r["theil_within"]) < 1e-6
    assert abs(r["theil_between"] - 0.130812) < 2e-6
    assert abs(r["between_share"] - 1.0) < 1e-4


# ---- D114 Cp/Cpk ----

# ---- D115 Greenwood ----

def test_km_greenwood_hand_computed(spark, tmp_path):
    # c1, c2 repeat after 2 days; c3 censored at the horizon (day 2):
    # one event time dur=2 with n=3, d=2 -> S = 1/3,
    # gw = 2/(3*(3-2)) = 0.666667, se = (1/3)*sqrt(0.666667) = 0.272166,
    # ci = [max(1/3 - 1.96*se, 0), min(1/3 + 1.96*se, 1)]
    #    = [0, 0.866778]  (1.96*0.272166 = 0.533445, by hand)
    rows = [
        (1, 1, "O", 10.0, _d(0), "A"), (2, 1, "O", 10.0, _d(2), "A"),
        (3, 2, "O", 10.0, _d(0), "A"), (4, 2, "O", 10.0, _d(2), "A"),
        (5, 3, "O", 10.0, _d(0), "A"),
    ]
    _write_orders(spark, tmp_path, rows)
    out = SPECS["orders_km_greenwood"].builder(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["duration_days"] == 2 and r["n_risk"] == 3 and r["n_events"] == 2
    assert abs(r["survival"] - 0.333333) < 2e-6
    assert abs(r["greenwood_se"] - 0.272166) < 2e-6
    assert abs(r["ci_lo"]) < 1e-9
    assert abs(r["ci_hi"] - 0.866778) < 3e-6


# ---- D116 Jonckheere-Terpstra ----

def test_jonckheere_hand_computed(spark, tmp_path):
    # A = {1, 2}, B = {3, 4}: every cross pair increases -> J = 4;
    # E[J] = (16 - 8)/4 = 2; Var = (16*11 - 2*16*7/ ... spelled:
    # sn23 = 2 * 4 * 7 = 56 -> Var = (176 - 56)/72 = 1.666667;
    # z = (4 - 2)/sqrt(1.666667) = 1.549193 (by hand).
    rows = [
        (1, 1, "O", 1.0, _d(0), "A"), (2, 1, "O", 2.0, _d(0), "A"),
        (3, 1, "O", 3.0, _d(0), "B"), (4, 1, "O", 4.0, _d(0), "B"),
    ]
    _write_orders(spark, tmp_path, rows)
    r = SPECS["orders_jonckheere_terpstra"].builder(spark, str(tmp_path)).collect()[0]
    assert r["n"] == 4 and r["k"] == 2
    assert abs(r["j_stat"] - 4.0) < 1e-9
    assert abs(r["mean_j"] - 2.0) < 1e-9
    assert abs(r["z_stat"] - 1.549193) < 2e-6


def test_jonckheere_reversed_order_negative(spark, tmp_path):
    # values DECREASE along the group order -> J = 0, z symmetric negative
    rows = [
        (1, 1, "O", 3.0, _d(0), "A"), (2, 1, "O", 4.0, _d(0), "A"),
        (3, 1, "O", 1.0, _d(0), "B"), (4, 1, "O", 2.0, _d(0), "B"),
    ]
    _write_orders(spark, tmp_path, rows)
    r = SPECS["orders_jonckheere_terpstra"].builder(spark, str(tmp_path)).collect()[0]
    assert abs(r["j_stat"]) < 1e-9
    assert abs(r["z_stat"] + 1.549193) < 2e-6


def test_jonckheere_half_tie_credit(spark, tmp_path):
    # A = {1}, B = {1}: the single cross pair is a tie -> J = 0.5 exactly
    rows = [
        (1, 1, "O", 1.0, _d(0), "A"), (2, 1, "O", 1.0, _d(0), "B"),
    ]
    _write_orders(spark, tmp_path, rows)
    r = SPECS["orders_jonckheere_terpstra"].builder(spark, str(tmp_path)).collect()[0]
    assert abs(r["j_stat"] - 0.5) < 1e-9


def test_capability_hand_computed(spark, tmp_path):
    # Brand BA: quantities (23, 25, 27) -> mu = 25, s^2 = (4+0+4)/2 = 4,
    # sd = 2; Cp = 49/12 = 4.083333; Cpk = min(25, 24)/6 = 4.0; oos 0.
    # Brand BB: quantities (55, 5) -> one above USL=50 -> oos_rate 0.5.
    lrows = [
        (1, 1, 1, 1, 23.0, 10.0, 0.0, 0.0, "N", "O", _d(0)),
        (2, 1, 1, 1, 25.0, 10.0, 0.0, 0.0, "N", "O", _d(0)),
        (3, 1, 1, 1, 27.0, 10.0, 0.0, 0.0, "N", "O", _d(0)),
        (4, 2, 1, 1, 55.0, 10.0, 0.0, 0.0, "N", "O", _d(0)),
        (5, 2, 1, 1, 5.0, 10.0, 0.0, 0.0, "N", "O", _d(0)),
    ]
    prows = [(1, "pa", "BA", "t", 1, 10.0), (2, "pb", "BB", "t", 1, 10.0)]
    _write_lineitem(spark, tmp_path, lrows)
    _write_part(spark, tmp_path, prows)
    out = {r["brand"]: r for r in
           SPECS["part_process_capability"].builder(spark, str(tmp_path)).collect()}
    ba = out["BA"]
    assert abs(ba["mean_qty"] - 25.0) < 1e-6 and abs(ba["sd_qty"] - 2.0) < 1e-6
    assert abs(ba["cp"] - 4.083333) < 2e-6
    assert abs(ba["cpk"] - 4.0) < 1e-6
    assert abs(ba["oos_rate"]) < 1e-9
    assert abs(out["BB"]["oos_rate"] - 0.5) < 1e-6
