"""Independent pure-python/numpy replicas of the closed-form statistics
entries (VERDICT r12 item 1).

The driver's DuckDB differential oracle is green-while-wrong whenever BOTH
engines share a mis-spelled formula — round 12 proved it twice (the GCRA
TAT off-by-one and Cramér's V dropping empty-cell χ² mass were oracle-exact
for a full round each). This harness closes that class: for each stats
entry, `replica_<name>` recomputes the expected output from the RAW parquet
rows in pure pandas/numpy — the FORMULA spelled independently from both the
Spark builder and its SQL oracle — and a parameterized test asserts
agreement with the registered entry at sf0.001. Degenerate planted-fixture
probes (hand-computed expectations) live beside the full-data checks for
entries that don't already carry one in test_wave11/test_wave12/
test_estimation/test_llm_quality.

The QUANTIZATION DEVICE (1e-6/1e-9 scaled-long addend sums — pure
determinism machinery, not statistics) is intentionally mirrored, so any
disagreement is a formula divergence, not float noise. Comparison: exact
for ints/strings/bools, atol 1.5e-6 for doubles (1 ulp of transcendental
input can flip a 1e-6 quantization boundary; formula bugs move results by
orders of magnitude more).

scipy is absent in this container — every formula is spelled directly
(numpy 1.26 + pandas only), per the K133/K155/K139 precedent.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from ksql_spark.registry import all_specs

SPECS = all_specs()
SF = "/root/testdata/sf0.001"

REPLICAS: dict[str, object] = {}


def replica(name):
    def deco(fn):
        assert name in SPECS, name
        REPLICAS[name] = fn
        return fn

    return deco


# ---------------------------------------------------------------------------
# determinism-device mirrors (NOT the statistics — see module docstring)
# ---------------------------------------------------------------------------


def q6(x):
    """1e-6 round-half-up-for-positives via trunc, the _q6 device."""
    return np.trunc(np.asarray(x, dtype=float) * 1e6 + 0.5) / 1e6


def q6s(x: float) -> float:
    return float(math.trunc(x * 1e6 + 0.5)) / 1e6


def dsum(a) -> float:
    """Scaled-long exact sum: quantize addends at 1e-6, sum integers."""
    scaled = np.trunc(np.asarray(a, dtype=float) * 1e6 + 0.5)
    return float(sum(int(v) for v in scaled)) / 1e6


def tq(x: float, scale: float) -> int:
    return int(math.trunc(x * scale + 0.5))


def load(table: str) -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/{table}.parquet")


# ---------------------------------------------------------------------------
# comparator
# ---------------------------------------------------------------------------


def assert_frames_agree(got: pd.DataFrame, exp: pd.DataFrame, atol=1.5e-6):
    assert sorted(got.columns) == sorted(exp.columns), (
        sorted(got.columns),
        sorted(exp.columns),
    )
    cols = sorted(exp.columns)
    got = got[cols].sort_values(cols, na_position="first").reset_index(drop=True)
    exp = exp[cols].sort_values(cols, na_position="first").reset_index(drop=True)
    assert len(got) == len(exp), (len(got), len(exp))
    for c in cols:
        g, e = got[c], exp[c]
        if pd.api.types.is_float_dtype(e) or pd.api.types.is_float_dtype(g):
            ga = pd.to_numeric(g).to_numpy(dtype=float)
            ea = pd.to_numeric(e).to_numpy(dtype=float)
            both_nan = np.isnan(ga) & np.isnan(ea)
            close = np.isclose(ga, ea, rtol=0.0, atol=atol, equal_nan=True)
            bad = ~(close | both_nan)
            assert not bad.any(), (c, got[bad], exp[bad])
        else:
            mism = (g != e) & ~(g.isna() & e.isna())
            assert not mism.any(), (c, got[mism], exp[mism])


# ---------------------------------------------------------------------------
# D101 — Kruskal-Wallis H  (ranks independently via pandas rank(average))
# ---------------------------------------------------------------------------


@replica("orders_kruskal_wallis")
def replica_kruskal_wallis(sf_dir=SF) -> pd.DataFrame:
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    x, g = o["o_totalprice"], o["o_orderpriority"]
    r = x.rank(method="average")  # tie-averaged global ranks, 1-based
    n = len(o)
    grp = pd.DataFrame({"g": g, "r": r}).groupby("g")["r"]
    n_j = grp.count()
    # rank sums: ranks are half-integers, the 1e6 scaling is exact
    r_j = grp.sum()
    s = float((r_j * r_j / n_j).sum())
    k = len(n_j)
    h = 12.0 / (n * (n + 1.0)) * s - 3.0 * (n + 1.0)
    t = x.value_counts().to_numpy()
    tie_term = float(sum(int(v) ** 3 - int(v) for v in t))
    denom = 1.0 - tie_term / (float(n) ** 3 - n)
    h_corr = h / denom if denom != 0 else np.nan
    return pd.DataFrame(
        {"n": [n], "k": [k], "h_stat": [q6s(h)], "h_corrected": [q6s(h_corr)]}
    )


# ---------------------------------------------------------------------------
# D102 — Nelson-Aalen cumulative hazard
# ---------------------------------------------------------------------------


@replica("orders_nelson_aalen")
def replica_nelson_aalen(sf_dir=SF) -> pd.DataFrame:
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    d = o["o_orderdate"].dt.normalize()
    hi = d.max()
    durs, events = [], []
    for _, dates in d.groupby(o["o_custkey"]):
        ds = dates.sort_values().to_numpy()
        if len(ds) >= 2:
            durs.append((ds[1] - ds[0]) / np.timedelta64(1, "D"))
            events.append(1)
        else:
            durs.append((np.datetime64(hi) - ds[0]) / np.timedelta64(1, "D"))
            events.append(0)
    subj = pd.DataFrame({"dur": np.array(durs, dtype=np.int64), "ev": events})
    by = subj.groupby("dur").agg(
        n_events=("ev", "sum"), n_leaving=("ev", "count")
    )
    by = by.sort_index()
    # risk set: subjects with dur >= t
    n_risk = by["n_leaving"][::-1].cumsum()[::-1]
    rows = []
    hz_q9 = 0
    for dur in by.index:
        d_i, nr = int(by.loc[dur, "n_events"]), int(n_risk.loc[dur])
        if d_i <= 0:
            continue
        hz_q9 += tq(d_i / nr, 1e9)
        rows.append(
            {
                "duration_days": int(dur),
                "n_risk": nr,
                "n_events": d_i,
                "cum_hazard": math.trunc(hz_q9 / 1e3 + 0.5) / 1e6,
                "na_survival": math.trunc(math.exp(-hz_q9 / 1e9) * 1e6 + 0.5)
                / 1e6,
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D103 — Atkinson inequality index
# ---------------------------------------------------------------------------


@replica("customer_atkinson_index")
def replica_atkinson(sf_dir=SF) -> pd.DataFrame:
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    rev = np.array(
        [
            dsum(v)
            for _, v in o.groupby("o_custkey")["o_totalprice"]
        ]
    )
    rev = rev[rev > 0]
    n = len(rev)
    s_rev, s_sqrt, s_ln = dsum(rev), dsum(np.sqrt(rev)), dsum(np.log(rev))
    mean = s_rev / n
    half = 1.0 - (s_sqrt / n) ** 2 / mean  # 1 - (mean sqrt)^2 / mean
    one = 1.0 - math.exp(s_ln / n) / mean  # 1 - geometric mean / mean
    return pd.DataFrame(
        {
            "n": [n],
            "mean_rev": [q6s(mean)],
            "atkinson_half": [q6s(half)],
            "atkinson_one": [q6s(one)],
        }
    )


# ---------------------------------------------------------------------------
# D104 — Brown-Forsythe W
# ---------------------------------------------------------------------------


@replica("events_brown_forsythe")
def replica_brown_forsythe(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    e = e[e["value"].notna()]
    med = e.groupby("event_type")["value"].median()
    z = (e["value"] - e["event_type"].map(med)).abs()
    grp = pd.DataFrame({"g": e["event_type"], "z": z}).groupby("g")["z"]
    n_j = grp.count()
    s_z = grp.apply(lambda v: dsum(v))
    s_zz = grp.apply(lambda v: dsum(v * v))
    n, k = int(n_j.sum()), len(n_j)
    sz_all = float(s_z.sum())
    s_between = float((s_z * s_z / n_j).sum())
    s_zz_all = float(s_zz.sum())
    w = (
        (n - k)
        / (k - 1.0)
        * (s_between - sz_all * sz_all / n)
        / (s_zz_all - s_between)
    )
    return pd.DataFrame({"n": [n], "k": [k], "w_stat": [q6s(w)]})


# ---------------------------------------------------------------------------
# D105 — GCRA rate-limit audit (the recursion run LITERALLY, not unrolled:
# TAT_k = max(t_k, TAT_(k-1)) + T, violation iff t_k < TAT_(k-1) - tau —
# this is the independent check that caught the r12 off-by-one)
# ---------------------------------------------------------------------------

_GCRA_T = 60_000
_GCRA_TAU = 240_000


@replica("events_rate_limit_gcra")
def replica_gcra(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    t_ms = e["ts"].astype("int64") // 1000  # us -> ms epoch
    df = pd.DataFrame(
        {"u": e["user_id"], "t": t_ms, "eid": e["event_id"]}
    ).sort_values(["u", "t", "eid"])
    rows = []
    for u, sub in df.groupby("u", sort=False):
        ts = sub["t"].to_numpy()
        tat = None  # TAT after previous event
        n_viol, worst = 0, None
        for tk in ts:
            if tat is None:
                tat = tk + _GCRA_T  # first arrival conforms, debits T
            else:
                excess = (tat - _GCRA_TAU - tk) / 1000.0
                if tk < tat - _GCRA_TAU:
                    n_viol += 1
                worst = excess if worst is None else max(worst, excess)
                tat = max(tk, tat) + _GCRA_T
        rows.append(
            {
                "user_id": u,
                "n_events": len(ts),
                "n_violations": n_viol,
                "worst_excess_sec": q6s(worst)
                if worst is not None and worst > 0
                else 0.0,
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D106 — one-way ANOVA F
# ---------------------------------------------------------------------------


@replica("orders_anova_oneway")
def replica_anova(sf_dir=SF) -> pd.DataFrame:
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    grp = o.groupby("o_orderpriority")["o_totalprice"]
    n_j = grp.count()
    s_x = grp.apply(lambda v: dsum(v))
    s_xx = grp.apply(
        lambda v: float(sum(int(math.trunc(x * x + 0.5)) for x in v))
    )
    n, k = int(n_j.sum()), len(n_j)
    sx_all = float(s_x.sum())
    s_groups = float((s_x * s_x / n_j).sum())
    s_xx_all = float(s_xx.sum())
    ss_b = s_groups - sx_all * sx_all / n
    ss_w = s_xx_all - s_groups
    f = (ss_b / (k - 1.0)) / (ss_w / (n - float(k)))
    return pd.DataFrame(
        {
            "n": [n],
            "k": [k],
            "ss_between": [float(math.trunc(ss_b + 0.5))],
            "ss_within": [float(math.trunc(ss_w + 0.5))],
            "f_stat": [q6s(f)],
        }
    )


# ---------------------------------------------------------------------------
# D107 — Cramér's V (full r×c grid built independently via crosstab, which
# materializes EMPTY cells — the class of the r12 empty-cell bug)
# ---------------------------------------------------------------------------


@replica("orders_cramers_v")
def replica_cramers_v(sf_dir=SF) -> pd.DataFrame:
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    ct = pd.crosstab(j["o_orderpriority"], j["c_mktsegment"])  # full grid
    n = int(ct.to_numpy().sum())
    r_i = ct.sum(axis=1).to_numpy(dtype=float)
    c_j = ct.sum(axis=0).to_numpy(dtype=float)
    e_ij = np.outer(r_i, c_j) / n
    o_ij = ct.to_numpy(dtype=float)
    terms = (o_ij - e_ij) ** 2 / e_ij
    chi_q9 = sum(int(math.trunc(t * 1e9 + 0.5)) for t in terms.ravel())
    nr, nc = ct.shape
    chi2 = math.trunc(chi_q9 / 1e3 + 0.5) / 1e6
    v = math.sqrt(chi_q9 / 1e9 / (n * (min(nr, nc) - 1.0)))
    return pd.DataFrame(
        {
            "n": [n],
            "nr": [nr],
            "nc": [nc],
            "chi2": [chi2],
            "cramers_v": [q6s(v)],
        }
    )


# ---------------------------------------------------------------------------
# D108 — EOQ ladder
# ---------------------------------------------------------------------------

_EOQ_K = 100.0
_EOQ_H = 0.2


@replica("part_eoq_ladder")
def replica_eoq(sf_dir=SF) -> pd.DataFrame:
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    p = pd.read_parquet(f"{sf_dir}/part.parquet")
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    rows = []
    for brand, sub in j.groupby("p_brand"):
        demand = dsum(sub["l_quantity"])
        price_sum = dsum(sub["p_retailprice"])
        n_lines = len(sub)
        avg_price = price_sum / n_lines
        if demand > 0 and price_sum > 0:
            eoq = math.sqrt(2.0 * demand * _EOQ_K / (_EOQ_H * avg_price))
            eoq_q, opp = q6s(eoq), q6s(demand / eoq)
        else:
            eoq_q, opp = np.nan, np.nan
        rows.append(
            {
                "brand": brand,
                "demand": demand,
                "avg_price": q6s(avg_price),
                "eoq": eoq_q,
                "orders_per_period": opp,
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D109 — newsvendor critical fractile (quantile independently via numpy)
# ---------------------------------------------------------------------------


@replica("part_newsvendor_stock")
def replica_newsvendor(sf_dir=SF) -> pd.DataFrame:
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    p = pd.read_parquet(f"{sf_dir}/part.parquet")
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    daily = (
        j.groupby(["p_brand", "l_shipdate"])["l_quantity"]
        .apply(dsum)
        .reset_index(name="demand")
    )
    frac = 0.3 / (0.3 + 0.2)
    rows = []
    for brand, sub in daily.groupby("p_brand"):
        d = sub["demand"].to_numpy()
        rows.append(
            {
                "brand": brand,
                "n_days": len(d),
                "stock_level": q6s(float(np.quantile(d, frac))),
                "median_demand": q6s(float(np.quantile(d, 0.5))),
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D98 — log-rank / Mantel-Cox test (r11)
# ---------------------------------------------------------------------------


@replica("orders_logrank_segments")
def replica_logrank(sf_dir=SF) -> pd.DataFrame:
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    d = o["o_orderdate"].dt.normalize()
    hi = d.max()
    seg = dict(zip(c["c_custkey"], c["c_mktsegment"]))
    subj = []
    for cust, dates in d.groupby(o["o_custkey"]):
        ds = dates.sort_values().to_numpy()
        if len(ds) >= 2:
            dur, ev = (ds[1] - ds[0]) / np.timedelta64(1, "D"), 1
        else:
            dur, ev = (np.datetime64(hi) - ds[0]) / np.timedelta64(1, "D"), 0
        subj.append((int(dur), ev, 1 if seg[cust] == "BUILDING" else 0))
    sdf = pd.DataFrame(subj, columns=["dur", "ev", "g"])
    by = (
        sdf.assign(ev1=sdf["ev"] * sdf["g"])
        .groupby("dur")
        .agg(
            d1=("ev1", "sum"),
            d_all=("ev", "sum"),
            l1=("g", "sum"),
            l_all=("ev", "count"),
        )
        .sort_index()
    )
    n1 = by["l1"][::-1].cumsum()[::-1]
    n = by["l_all"][::-1].cumsum()[::-1]
    o1, e1_q, v_q = 0, 0, 0
    for dur in by.index:
        d_all = int(by.loc[dur, "d_all"])
        if d_all <= 0:
            continue
        n1_t, n_t = int(n1.loc[dur]), int(n.loc[dur])
        o1 += int(by.loc[dur, "d1"])
        e1_q += tq(d_all * (n1_t / n_t), 1e6)
        if n_t > 1:
            v_q += tq(
                d_all
                * (n1_t / n_t)
                * ((n_t - n1_t) / n_t)
                * ((n_t - d_all) / (n_t - 1)),
                1e6,
            )
    e1 = e1_q / 1e6
    chi2 = (
        math.trunc((o1 - e1) ** 2 / (v_q / 1e6) * 1e6 + 0.5) / 1e6
        if v_q > 0
        else np.nan
    )
    return pd.DataFrame(
        {
            "n1_subjects": [int(sdf["g"].sum())],
            "n2_subjects": [int((1 - sdf["g"]).sum())],
            "o1_events": [o1],
            "e1_expected": [e1],
            "chi2": [chi2],
        }
    )


# ---------------------------------------------------------------------------
# D99 — Page-Hinkley drift monitor (r11; the walk run sequentially, the
# literal textbook recursion, against the engine's window unroll)
# ---------------------------------------------------------------------------

_PH_DELTA, _PH_LAMBDA = 0.05, 5.0


@replica("events_page_hinkley")
def replica_page_hinkley(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    e = e[e["value"].notna()]
    day = e["ts"].dt.normalize()
    daily = (
        e.assign(d=day)
        .groupby(["event_type", "d"])["value"]
        .apply(lambda v: int(math.floor(dsum(v) / len(v) * 1e6 + 0.5)))
        .reset_index(name="x_q")
        .sort_values(["event_type", "d"])
    )
    rows = []
    for et, sub in daily.groupby("event_type"):
        xs = sub["x_q"].to_list()
        ds = [ts.date() for ts in sub["d"]]
        cum = 0
        m_q, mmin = 0, None
        n_alarm, max_ex, first_alarm = 0, 0, None
        for i, (x, dte) in enumerate(zip(xs, ds), start=1):
            cum += x
            t_q = int(math.floor((x / 1e6 - cum / 1e6 / i - _PH_DELTA) * 1e6 + 0.5))
            m_q += t_q
            mmin = m_q if mmin is None else min(mmin, m_q)
            ex = m_q - mmin
            max_ex = max(max_ex, ex)
            if ex > _PH_LAMBDA * 1e6:
                n_alarm += 1
                if first_alarm is None:
                    first_alarm = dte
        rows.append(
            {
                "event_type": et,
                "n_days": len(xs),
                "max_excess": max_ex / 1e6,
                "n_alarm_days": n_alarm,
                "first_alarm_day": first_alarm,
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D100 — bullwhip ratio (r11)
# ---------------------------------------------------------------------------


@replica("orders_bullwhip_ratio")
def replica_bullwhip(sf_dir=SF) -> pd.DataFrame:
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    mo_order = j["o_orderdate"].dt.to_period("M").dt.to_timestamp()
    mo_ship = j["l_shipdate"].dt.to_period("M").dt.to_timestamp()
    months = sorted(set(mo_order) | set(mo_ship))
    qa = {
        m: dsum(v)
        for m, v in j["l_quantity"].groupby(mo_order)
    }
    qb = {
        m: dsum(v)
        for m, v in j["l_quantity"].groupby(mo_ship)
    }
    a = np.array([qa.get(m, 0.0) for m in months])
    b = np.array([qb.get(m, 0.0) for m in months])
    n = len(months)
    sa, sb = dsum(a), dsum(b)
    saa = float(sum(int(math.trunc(x * x + 0.5)) for x in a))
    sbb = float(sum(int(math.trunc(x * x + 0.5)) for x in b))
    ma, mb = sa / n, sb / n
    va = max(saa / n - ma * ma, 0.0)
    vb = max(sbb / n - mb * mb, 0.0)
    cv2a = va / (ma * ma) if ma != 0 else np.nan
    cv2b = vb / (mb * mb) if mb != 0 else np.nan
    ratio = cv2a / cv2b if cv2b else np.nan
    return pd.DataFrame(
        {
            "n_months": [n],
            "mean_ordered": [q6s(ma)],
            "mean_shipped": [q6s(mb)],
            "cv2_ordered": [q6s(cv2a)],
            "cv2_shipped": [q6s(cv2b)],
            "bullwhip_ratio": [q6s(ratio)],
        }
    )


# ---------------------------------------------------------------------------
# the parameterized full-fixture check
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name", sorted(REPLICAS))
def test_replica_agrees_at_sf0001(spark, name):
    exp = REPLICAS[name]()
    got = SPECS[name].builder(spark, SF).toPandas()
    assert_frames_agree(got, exp)
