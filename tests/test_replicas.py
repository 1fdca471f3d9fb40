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

Coverage (r13): 92 entries — the COMPLETE D38–D114 closed-form /
report-table class (every r6c–r13 D entry with deterministic output),
D22-era survival/Gini/theil-sen, and the K-family statistical surface
(CUSUM, ACF, Holt/Holt-Winters recursions run literally, seasonality,
two-proportion z, cross-type Pearson, hourly χ², Markov entropy rate,
binned two-sample KS, the K4 text stats with python-re tokenizers).
Where a replica can assert an internal mathematical identity the engines
cannot fake together (Theil decomposition additivity, Gini rank-form ==
half-relative-MAD, growth-accounting churn ledger), it does.

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
    if x is None or (isinstance(x, float) and math.isnan(x)):
        return float("nan")
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
# D83 — bag-of-little-bootstraps mean CI (r10; the LCG/Dirichlet machinery
# re-derived from the Kleiner et al. recipe, per-row python integers)
# ---------------------------------------------------------------------------

_BLB_S, _BLB_R = 8, 40
_KNUTH = 2654435761
_M31, _M32 = 2**31, 2**32


@replica("events_blb_mean_ci")
def replica_blb(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    e = e[e["value"].notna()]
    ids = e["event_id"].to_numpy()
    xs = e["value"].to_numpy()
    su = ((ids % _M31) * _KNUTH) % _M32 % _BLB_S
    # per-subset replicate means
    adj_lo, adj_hi = [], []
    n_total = len(ids)
    gx_q = 0
    sub_rows = []
    for s in range(_BLB_S):
        mask = su == s
        sid, sx_v = ids[mask], xs[mask]
        b = int(mask.sum())
        sx = dsum(sx_v)
        sub_rows.append((s, b, sx))
        gx_q += tq(sx, 1e6)
        means = []
        for rep in range(_BLB_R):
            h = (((sid % _M31) * _BLB_R + rep) % _M31 * _KNUTH) % _M32
            wt = -np.log((h + 0.5) / _M32)
            means.append((q6s(dsum(wt * sx_v) / dsum(wt)), rep))
        means.sort()
        lo, hi = means[1][0], means[_BLB_R - 2][0]
        m_s = sx / b
        scale = math.sqrt(b / n_total)
        adj_lo.append(q6s(m_s - (m_s - lo) * scale))
        adj_hi.append(q6s(m_s + (hi - m_s) * scale))
    gx = gx_q / 1e6
    return pd.DataFrame(
        {
            "n_events": [n_total],
            "n_subsets": [_BLB_S],
            "n_replicates": [_BLB_R],
            "mean_value": [q6s(gx / n_total)],
            "ci_lo": [q6s(dsum(adj_lo) / _BLB_S)],
            "ci_hi": [q6s(dsum(adj_hi) / _BLB_S)],
        }
    )


# ---------------------------------------------------------------------------
# D84 — Chapman capture-recapture
# ---------------------------------------------------------------------------


@replica("events_capture_recapture")
def replica_capture_recapture(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    per = e.groupby("user_id")["event_type"].agg(
        in1=lambda t: int((t == "view").any()),
        in2=lambda t: int((t == "click").any()),
    )
    n1, n2 = int(per["in1"].sum()), int(per["in2"].sum())
    m = int((per["in1"] * per["in2"]).sum())
    chapman = (n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0
    se = math.sqrt(
        (n1 + 1.0)
        * (n2 + 1.0)
        * (n1 - m)
        * (n2 - m)
        / ((m + 1.0) ** 2 * (m + 2.0))
    )
    return pd.DataFrame(
        {
            "n_view": [n1],
            "n_click": [n2],
            "n_both": [m],
            "n_universe": [len(per)],
            "n_chapman": [q6s(chapman)],
            "se": [q6s(se)],
            "ci_lo": [q6s(chapman - 1.96 * se)],
            "ci_hi": [q6s(chapman + 1.96 * se)],
        }
    )


# ---------------------------------------------------------------------------
# D85 — chain-ladder cohort completion (the Mack recipe re-run on the
# explicit triangle, python loops)
# ---------------------------------------------------------------------------


@replica("events_chain_ladder")
def replica_chain_ladder(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    day = e["ts"].dt.normalize()
    cohort = day.groupby(e["user_id"]).transform("min")
    age = ((day - cohort) / np.timedelta64(1, "D")).astype(int)
    isp = (e["event_type"] == "purchase").astype(int)
    maxday = day.max()
    cohorts = sorted(cohort.unique())
    inc = (
        pd.DataFrame({"cohort": cohort, "age": age, "isp": isp})
        .groupby(["cohort", "age"])["isp"]
        .sum()
    )
    # dense cumulative triangle, right edge at the corpus horizon
    tri = {}
    for co in cohorts:
        max_age = int((maxday - co) / np.timedelta64(1, "D"))
        c, row = 0, []
        for a in range(max_age + 1):
            c += int(inc.get((co, a), 0))
            row.append(c)
        tri[co] = row
    # volume-weighted development factors per age
    all_ages = sorted({a for row in tri.values() for a in range(len(row))})
    f = {}
    for a in all_ages:
        num = sum(row[a + 1] for row in tri.values() if len(row) > a + 1)
        den = sum(row[a] for row in tri.values() if len(row) > a + 1)
        f[a] = num / den if den > 0 else 1.0
    # age-to-ultimate: product of factors from this age to the oldest,
    # via the quantized-ln-sum device
    ata = {}
    acc = 0
    for a in sorted(all_ages, reverse=True):
        acc += tq(math.log(f[a]), 1e6)
        ata[a] = math.exp(acc / 1e6)
    rows = []
    for co in cohorts:
        row = tri[co]
        latest_age = len(row) - 1
        cum_latest = row[-1]
        ult = cum_latest * ata[latest_age]
        rows.append(
            {
                "cohort": co.date(),
                "latest_age": latest_age,
                "cum_purchases": cum_latest,
                "ultimate": q6s(ult),
                "reserve": q6s(ult - cum_latest),
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D86 — beta-binomial EB shrinkage
# ---------------------------------------------------------------------------


@replica("events_eb_shrinkage")
def replica_eb_shrinkage(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    g = e.groupby("user_id")
    n = g.size()
    x = g["event_type"].apply(lambda t: int((t == "purchase").sum()))
    raw = x / n
    mu = dsum(raw) / len(raw)
    v = dsum(raw * raw) / len(raw) - mu * mu
    kappa = mu * (1.0 - mu) / v - 1.0 if v != 0 else 0.0
    if v > 1e-12 and kappa > 0:
        a, b = mu * kappa, (1.0 - mu) * kappa
    else:
        a, b = 0.0, 0.0
    return pd.DataFrame(
        {
            "user_id": n.index,
            "n_events": n.to_numpy(),
            "n_purchases": x.to_numpy(),
            "raw_rate": q6(raw.to_numpy()),
            "shrunk_rate": q6((x.to_numpy() + a) / (n.to_numpy() + a + b)),
        }
    )


# ---------------------------------------------------------------------------
# D87 — panel fixed-effects within OLS
# ---------------------------------------------------------------------------


@replica("orders_panel_within_ols")
def replica_panel_within(sf_dir=SF) -> pd.DataFrame:
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    lc = li.groupby("l_orderkey").size().rename("x").reset_index()
    ob = o.merge(lc, left_on="o_orderkey", right_on="l_orderkey")
    c, y, x = ob["o_custkey"], ob["o_totalprice"], ob["x"].astype(float)
    df = pd.DataFrame({"c": c, "x": x, "y": y})
    cm = df.groupby("c").agg(
        mx=("x", lambda v: dsum(v) / len(v)),
        my=("y", lambda v: dsum(v) / len(v)),
    )
    gx, gy = dsum(x) / len(df), dsum(y) / len(df)
    mx = df["c"].map(cm["mx"]).to_numpy()
    my = df["c"].map(cm["my"]).to_numpy()
    xa, ya = x.to_numpy(), y.to_numpy()
    sxx_w = dsum((xa - mx) * (xa - mx))
    sxy_w = dsum((xa - mx) * (ya - my))
    syy_w = dsum((ya - my) * (ya - my))
    sxx_p = dsum((xa - gx) * (xa - gx))
    sxy_p = dsum((xa - gx) * (ya - gy))
    bw = sxy_w / sxx_w
    return pd.DataFrame(
        {
            "n_orders": [len(df)],
            "n_entities": [df["c"].nunique()],
            "beta_pooled": [q6s(sxy_p / sxx_p)],
            "beta_within": [q6s(bw)],
            "r2_within": [q6s(bw * bw * sxx_w / syy_w)],
        }
    )


# ---------------------------------------------------------------------------
# D88 — Gumbel block maxima
# ---------------------------------------------------------------------------

_EULER_GAMMA = 0.5772156649015329


@replica("events_gumbel_maxima")
def replica_gumbel_maxima(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    e = e[e["value"].notna()]
    dm = e.groupby(e["ts"].dt.normalize())["value"].max()
    n = len(dm)
    m = dsum(dm) / n
    sxx = dsum(dm * dm)
    s2 = (sxx - n * m * m) / (n - 1) if n >= 2 else np.nan
    beta = math.sqrt(6.0 * s2) / math.pi if n >= 2 and s2 > 0 else np.nan
    mu = m - _EULER_GAMMA * beta

    def rl(p):
        return mu - beta * math.log(-math.log(p))

    return pd.DataFrame(
        {
            "n_blocks": [n],
            "block_max_mean": [q6s(m)],
            "gumbel_mu": [q6s(mu) if not np.isnan(beta) else np.nan],
            "gumbel_beta": [q6s(beta) if not np.isnan(beta) else np.nan],
            "rl_10": [q6s(rl(0.9)) if not np.isnan(beta) else np.nan],
            "rl_100": [q6s(rl(0.99)) if not np.isnan(beta) else np.nan],
            "rl_1000": [q6s(rl(0.999)) if not np.isnan(beta) else np.nan],
        }
    )


# ---------------------------------------------------------------------------
# D89 — Cochran-Mantel-Haenszel stratified test
# ---------------------------------------------------------------------------


@replica("events_cmh_test")
def replica_cmh(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    e = e[e["user_id"].notna()]
    g = e.groupby("user_id")
    cohort = g["ts"].min().dt.normalize()
    conv = g["event_type"].apply(lambda t: int((t == "purchase").any()))
    variant = (cohort.index % 2).astype(int)
    per = pd.DataFrame({"cohort": cohort, "conv": conv, "variant": variant})
    sum_a = 0
    sum_e_q = sum_v_q = sum_ad_q = sum_bc_q = 0
    n_strata = 0
    for _, sub in per.groupby("cohort"):
        nk = len(sub)
        if nk < 2:
            continue
        n_strata += 1
        a = int(((sub["variant"] == 1) & (sub["conv"] == 1)).sum())
        n1 = int((sub["variant"] == 1).sum())
        m1 = int(sub["conv"].sum())
        sum_a += a
        sum_e_q += tq(n1 * m1 / nk, 1e6)
        sum_v_q += tq(
            n1 * (nk - n1) * m1 * (nk - m1) / (nk * nk * (nk - 1)), 1e6
        )
        sum_ad_q += tq(a * (nk - n1 - m1 + a) / nk, 1e6)
        sum_bc_q += tq((n1 - a) * (m1 - a) / nk, 1e6)
    sum_e, sum_v = sum_e_q / 1e6, sum_v_q / 1e6
    sum_ad, sum_bc = sum_ad_q / 1e6, sum_bc_q / 1e6
    dev = abs(sum_a - sum_e) - 0.5
    chi2 = dev * dev / sum_v if sum_v != 0 else np.nan
    or_mh = sum_ad / sum_bc if sum_bc != 0 else np.nan
    return pd.DataFrame(
        {
            "n_strata": [n_strata],
            "sum_a": [sum_a],
            "sum_e": [q6s(sum_e)],
            "chi2_cmh": [q6s(chi2)],
            "or_mh": [q6s(or_mh)],
        }
    )


# ---------------------------------------------------------------------------
# D90 — first-order stochastic dominance on binned ECDFs
# ---------------------------------------------------------------------------

_FOSD_BINS, _FOSD_WIDTH = 200, 3000.0


@replica("orders_stochastic_dominance")
def replica_fosd(sf_dir=SF) -> pd.DataFrame:
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o = o[o["o_orderpriority"].isin(["1-URGENT", "5-LOW"])]
    o = o[o["o_totalprice"].notna()]
    bins = np.minimum(
        np.floor(o["o_totalprice"].to_numpy() / _FOSD_WIDTH), _FOSD_BINS - 1
    ).astype(int)
    urgent = (o["o_orderpriority"] == "1-URGENT").to_numpy()

    def ecdf(mask):
        cnt = np.bincount(bins[mask], minlength=_FOSD_BINS)
        tot = cnt.sum()
        return np.cumsum(cnt) / tot if tot else np.full(_FOSD_BINS, np.nan)

    fu, fl = ecdf(urgent), ecdf(~urgent)
    return pd.DataFrame(
        {
            "n_bins": [_FOSD_BINS],
            "frac_urgent_dominates": [
                q6s(float((fu <= fl).sum()) / _FOSD_BINS)
            ],
            "max_violation": [q6s(max(float((fu - fl).max()), 0.0))],
            "ks_gap": [q6s(float(np.abs(fu - fl).max()))],
        }
    )


# ---------------------------------------------------------------------------
# D91 — per-part safety stock (zero-filled month spine)
# ---------------------------------------------------------------------------

_SS_Z95 = 1.6448536269514722


@replica("part_safety_stock")
def replica_safety_stock(sf_dir=SF) -> pd.DataFrame:
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    p = pd.read_parquet(f"{sf_dir}/part.parquet")
    mo = li["l_shipdate"].dt.to_period("M")
    md = (
        li.groupby(["l_partkey", mo])["l_quantity"]
        .apply(dsum)
        .to_dict()
    )
    months = sorted(mo.unique())
    rows = []
    for pk in p["p_partkey"]:
        q = np.array([md.get((pk, m), 0.0) for m in months])
        n = len(q)
        m = dsum(q) / n
        sxx = dsum(q * q)
        s2 = max((sxx - n * m * m) / (n - 1), 0.0)
        sd = math.sqrt(s2)
        rows.append(
            {
                "p_partkey": pk,
                "n_months": n,
                "mean_monthly": q6s(m),
                "sd_monthly": q6s(sd),
                "safety_stock": q6s(_SS_Z95 * sd),
                "reorder_point": q6s(m + _SS_Z95 * sd),
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D92 — Bass diffusion fit (normal equations solved independently via
# numpy Cramer determinants on the same quantized moments)
# ---------------------------------------------------------------------------

_BASS_G = 1_000_000.0


@replica("events_bass_diffusion")
def replica_bass(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    d0 = e.groupby("user_id")["ts"].min().dt.normalize()
    lo, hi = d0.min(), d0.max()
    m0 = len(d0)
    n_days = int((hi - lo) / np.timedelta64(1, "D")) + 1
    nnew = np.zeros(n_days, dtype=np.int64)
    for t, cnt in d0.value_counts().items():
        nnew[int((t - lo) / np.timedelta64(1, "D"))] = cnt
    cprev = np.concatenate([[0], np.cumsum(nnew)[:-1]])
    x = cprev / m0
    y = nnew / m0

    def dg(a):
        return dsum(np.asarray(a) * _BASS_G) / _BASS_G

    n = n_days
    sx, sx2, sx3, sx4 = dg(x), dg(x * x), dg(x**3), dg(x**4)
    sy, sxy, sx2y = dg(y), dg(x * y), dg(x * x * y)
    det = (
        n * (sx2 * sx4 - sx3 * sx3)
        - sx * (sx * sx4 - sx3 * sx2)
        + sx2 * (sx * sx3 - sx2 * sx2)
    )
    det_a = (
        sy * (sx2 * sx4 - sx3 * sx3)
        - sx * (sxy * sx4 - sx3 * sx2y)
        + sx2 * (sxy * sx3 - sx2 * sx2y)
    )
    det_b = (
        n * (sxy * sx4 - sx3 * sx2y)
        - sy * (sx * sx4 - sx3 * sx2)
        + sx2 * (sx * sx2y - sxy * sx2)
    )
    det_c = (
        n * (sx2 * sx2y - sxy * sx3)
        - sx * (sx * sx2y - sxy * sx2)
        + sy * (sx * sx3 - sx2 * sx2)
    )
    if det == 0:
        ca = cb = cc = np.nan
    else:
        ca, cb, cc = det_a / det, det_b / det, det_c / det
    disc = cb * cb - 4 * cc * ca
    mfrac = (
        (-cb - math.sqrt(disc)) / (2 * cc)
        if (not np.isnan(cc)) and cc < 0 and disc >= 0
        else np.nan
    )
    pp = ca / mfrac if mfrac and not np.isnan(mfrac) else np.nan
    qq = -cc * mfrac if not np.isnan(mfrac) else np.nan
    t_peak = (
        q6s(math.log(qq / pp) / (pp + qq))
        if (not np.isnan(pp)) and pp > 0 and (not np.isnan(qq)) and qq > 0
        else np.nan
    )
    return pd.DataFrame(
        {
            "n_days": [n],
            "m0_adopters": [m0],
            "coef_a": [q6s(ca)],
            "coef_b": [q6s(cb)],
            "coef_c": [q6s(cc)],
            "m_hat": [q6s(mfrac * m0)],
            "p_innovation": [q6s(pp)],
            "q_imitation": [q6s(qq)],
            "t_peak_days": [t_peak],
        }
    )


# ---------------------------------------------------------------------------
# D93 — Newey-West HAC trend (the Bartlett sum written as the literal
# double loop over lags)
# ---------------------------------------------------------------------------


@replica("events_newey_west_trend")
def replica_newey_west(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    e = e[e["value"].notna()]
    daily = (
        e.groupby(e["ts"].dt.normalize())["value"]
        .apply(lambda v: dsum(v) / len(v))
        .sort_index()
    )
    y = daily.to_numpy()
    n = len(y)
    t = np.arange(1, n + 1, dtype=float)
    st, st2 = dsum(t), dsum(t * t)
    sy, sty = dsum(y), dsum(t * y)
    tbar, ybar = st / n, sy / n
    beta = (n * sty - st * sy) / (n * st2 - st * st)
    sxx = st2 - st * st / n
    lag_l = int(math.floor(4 * math.exp((2.0 / 9.0) * math.log(n / 100.0))))
    ecol = y - ybar - beta * (t - tbar)
    u = (t - tbar) * ecol
    s0 = dsum(u * u)
    se2 = dsum(ecol * ecol)
    s_cross = 0.0
    if lag_l >= 1:
        addends = []
        for h in range(1, lag_l + 1):
            wgt = 1.0 - h / (lag_l + 1.0)
            addends.extend(wgt * u[:-h] * u[h:])
        s_cross = dsum(addends) if addends else 0.0
    var_ols = (se2 / (n - 2)) / sxx
    var_hac = (s0 + 2 * s_cross) / (sxx * sxx)
    return pd.DataFrame(
        {
            "n_days": [n],
            "lag_l": [lag_l],
            "beta": [q6s(beta)],
            "se_ols": [q6s(math.sqrt(var_ols))],
            "se_hac": [q6s(math.sqrt(var_hac))],
            "t_ols": [q6s(beta / math.sqrt(var_ols))],
            "t_hac": [q6s(beta / math.sqrt(var_hac))],
        }
    )


# ---------------------------------------------------------------------------
# D94 — Little's law audit (interval overlaps recomputed per order)
# ---------------------------------------------------------------------------


def _order_intervals(sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    done = li.groupby("l_orderkey")["l_shipdate"].max().dt.normalize()
    ords = o.merge(
        done.rename("end_d"), left_on="o_orderkey", right_index=True
    )
    start = ords["o_orderdate"].dt.normalize()
    return start, ords["end_d"]


@replica("orders_littles_law_audit")
def replica_littles_law(sf_dir=SF) -> pd.DataFrame:
    start, end = _order_intervals(sf_dir)
    lo = start.min()
    span = int((end.max() - lo) / np.timedelta64(1, "D"))
    q1, q3 = span // 4, (3 * span) // 4
    ds = ((start - lo) / np.timedelta64(1, "D")).astype(int).to_numpy()
    de = ((end - lo) / np.timedelta64(1, "D")).astype(int).to_numpy()
    window_days = q3 - q1 + 1
    wip_days = int(
        np.maximum(
            0, np.minimum(de, q3) - np.maximum(ds, q1) + 1
        ).sum()
    )
    in_win = (de >= q1) & (de <= q3)
    n_completed = int(in_win.sum())
    dur_days = int(((de - ds + 1) * in_win).sum())
    lavg = wip_days / window_days
    lam = n_completed / window_days
    wavg = dur_days / n_completed if n_completed else np.nan
    return pd.DataFrame(
        {
            "window_days": [window_days],
            "n_completed": [n_completed],
            "l_avg_wip": [q6s(lavg)],
            "lambda_per_day": [q6s(lam)],
            "w_avg_days": [q6s(wavg)],
            "lw_product": [q6s(lam * wavg)],
            "rel_gap": [
                q6s((lavg - dur_days / window_days) / lavg)
                if lavg
                else np.nan
            ],
        }
    )


# ---------------------------------------------------------------------------
# D95 — Engle-Granger cointegration screen
# ---------------------------------------------------------------------------


@replica("orders_cointegration_screen")
def replica_cointegration(sf_dir=SF) -> pd.DataFrame:
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    daily = (
        o.groupby(o["o_orderdate"].dt.normalize())["o_totalprice"]
        .agg([("y", lambda v: dsum(v)), ("x", "count")])
        .sort_index()
    )
    yk = daily["y"].to_numpy() / 1000.0
    x = daily["x"].to_numpy(dtype=float)
    n = len(daily)
    sx, sx2 = dsum(x), dsum(x * x)
    sy, sxy = dsum(yk), dsum(x * yk)
    beta = (n * sxy - sx * sy) / (n * sx2 - sx * sx)
    alpha = (sy - sx * beta) / n
    e = (yk - alpha - beta * x) / 1000.0  # millions (scale-free in rho)
    de, el = e[1:] - e[:-1], e[:-1]
    m = len(el)
    sll, sdl, sdd = dsum(el * el), dsum(de * el), dsum(de * de)
    rho = sdl / sll
    se_rho = math.sqrt(max(sdd - rho * sdl, 0.0) / (m - 1) / sll)
    dstat = rho / se_rho if se_rho else np.nan
    return pd.DataFrame(
        {
            "n_days": [n],
            "alpha_thousands": [q6s(alpha)],
            "beta_thousands_per_order": [q6s(beta)],
            "df_rho": [q6s(rho)],
            "df_stat": [q6s(dstat)],
            "cointegrated_5pct": [
                None if np.isnan(dstat) else bool(dstat < -3.34)
            ],
        }
    )


# ---------------------------------------------------------------------------
# D96 — Erlang-C staffing ladder (Jagerman recursion re-run in python)
# ---------------------------------------------------------------------------

_ERLANG_BUFFERS = (1.01, 1.02, 1.05, 1.1, 1.2, 1.5)
_ERLANG_FOLD_CAP = 100_000


@replica("orders_erlang_staffing")
def replica_erlang(sf_dir=SF) -> pd.DataFrame:
    start, end = _order_intervals(sf_dir)
    n = len(start)
    horizon = int((end.max() - start.min()) / np.timedelta64(1, "D")) + 1
    dur_days = int(
        ((end - start.to_numpy()) / np.timedelta64(1, "D")).astype(int).sum()
    ) + n
    lam = n / horizon
    s_days = dur_days / n
    a = lam * s_days
    rows = []
    for f in _ERLANG_BUFFERS:
        c = int(max(math.ceil(a * f), math.floor(a) + 1))
        if c <= _ERLANG_FOLD_CAP:
            b = 1.0
            for k in range(1, c + 1):
                b = a * b / (k + a * b)
        else:
            b = np.nan
        rho = a / c
        cw = b / (1.0 - rho * (1.0 - b))
        rows.append(
            {
                "c": c,
                "buffer_factor": f,
                "n_orders": n,
                "lambda_per_day": q6s(lam),
                "s_days": q6s(s_days),
                "offered_erlangs": q6s(a),
                "utilization": q6s(rho),
                "p_wait": q6s(cw),
                "wq_days": q6s(cw * s_days / (c - a)),
                "hw_sqrt_staff_c": int(math.ceil(a + 2.0 * math.sqrt(a))),
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D97 — watermark lateness audit (running max over arrival order)
# ---------------------------------------------------------------------------


@replica("events_watermark_lateness_audit")
def replica_watermark(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    e = e[e["ts"].notna()].sort_values("event_id")
    tsu = (e["ts"].astype("int64")).to_numpy()  # already microseconds
    prior_max = np.concatenate(
        [[np.iinfo(np.int64).min], np.maximum.accumulate(tsu)[:-1]]
    )
    late = np.where(
        prior_max > tsu,
        np.ceil((prior_max - tsu) / 60000000.0).astype(np.int64),
        0,
    )
    late[0] = 0  # first arrival is on time by definition
    n = len(late)
    n_late = int((late > 0).sum())
    vals, counts = np.unique(late, return_counts=True)
    cc = np.cumsum(counts)

    def wm(num, den):
        idx = np.nonzero(cc * den >= n * num)[0]
        return int(vals[idx[0]]) if len(idx) else None

    return pd.DataFrame(
        {
            "n_events": [n],
            "n_late": [n_late],
            "late_rate": [q6s(n_late / n)],
            "max_lateness_min": [int(late.max())],
            "wm_p95_min": [wm(950, 1000)],
            "wm_p99_min": [wm(990, 1000)],
            "wm_p999_min": [wm(9990, 10000)],
        }
    )


# ---------------------------------------------------------------------------
# D58 — difference-in-differences (r9)
# ---------------------------------------------------------------------------


@replica("events_did_estimator")
def replica_did(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    e = e[e["event_type"] == "purchase"]
    treat = (e["user_id"] % 2).to_numpy()
    post = (e["ts"] >= pd.Timestamp("2024-01-16")).to_numpy().astype(int)
    v = e["value"].to_numpy()
    out = {}
    for t, p, tag in [(1, 0, "t_pre"), (1, 1, "t_post"), (0, 0, "c_pre"), (0, 1, "c_post")]:
        mask = (treat == t) & (post == p)
        out[f"n_{tag}"] = int(mask.sum())
        out[f"s_{tag}"] = dsum(v[mask])
    m = {k: out[f"s_{k}"] / out[f"n_{k}"] for k in ("t_pre", "t_post", "c_pre", "c_post")}
    return pd.DataFrame(
        {
            "n_t_pre": [out["n_t_pre"]],
            "n_t_post": [out["n_t_post"]],
            "n_c_pre": [out["n_c_pre"]],
            "n_c_post": [out["n_c_post"]],
            "mean_t_pre": [q6s(m["t_pre"])],
            "mean_t_post": [q6s(m["t_post"])],
            "mean_c_pre": [q6s(m["c_pre"])],
            "mean_c_post": [q6s(m["c_post"])],
            "did_estimate": [
                q6s((m["t_post"] - m["t_pre"]) - (m["c_post"] - m["c_pre"]))
            ],
        }
    )


# ---------------------------------------------------------------------------
# D61 — log-log price elasticity (r9)
# ---------------------------------------------------------------------------


@replica("part_price_elasticity")
def replica_elasticity(sf_dir=SF) -> pd.DataFrame:
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    p = pd.read_parquet(f"{sf_dir}/part.parquet")
    li = li[
        (li["l_quantity"] > 0)
        & (li["l_extendedprice"] > 0)
        & (li["l_discount"] < 1.0)
    ]
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    x = q6(
        np.log(
            j["l_extendedprice"].to_numpy()
            / j["l_quantity"].to_numpy()
            * (1.0 - j["l_discount"].to_numpy())
        )
    )
    y = q6(np.log(j["l_quantity"].to_numpy()))
    rows = []
    for brand, idx in pd.Series(range(len(j))).groupby(j["p_brand"].values):
        i = idx.to_numpy()
        xb, yb = x[i], y[i]
        n = len(i)
        sx, sy = dsum(xb), dsum(yb)
        sxx, sxy, syy = dsum(xb * xb), dsum(xb * yb), dsum(yb * yb)
        den = n * sxx - sx * sx
        el = (n * sxy - sx * sy) / den if den else np.nan
        r2den = den * (n * syy - sy * sy)
        r2 = (n * sxy - sx * sy) ** 2 / r2den if r2den else np.nan
        rows.append({"brand": brand, "n": n, "elasticity": q6s(el), "r2": q6s(r2)})
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D62 — Mann-Kendall trend (pairwise signs via literal double loop)
# ---------------------------------------------------------------------------


@replica("events_mann_kendall")
def replica_mann_kendall(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    daily = (
        e.groupby(["event_type", e["ts"].dt.normalize()])
        .size()
        .rename("x")
        .reset_index()
        .sort_values(["event_type", "ts"])
    )
    rows = []
    for et, sub in daily.groupby("event_type"):
        x = sub["x"].to_numpy()
        n = len(x)
        s_stat = int(np.sign(x[None, :] - x[:, None])[np.triu_indices(n, 1)].sum())
        t = pd.Series(x).value_counts().to_numpy()
        tie = int(sum(int(v) * (int(v) - 1) * (2 * int(v) + 5) for v in t))
        var_s = q6s((n * (n - 1) * (2 * n + 5) - tie) / 18.0)
        if s_stat > 0:
            z = q6s((s_stat - 1) / math.sqrt(var_s))
        elif s_stat < 0:
            z = q6s((s_stat + 1) / math.sqrt(var_s))
        else:
            z = 0.0
        trend = (
            "increasing" if z > 1.96 else "decreasing" if z < -1.96 else "no trend"
        )
        rows.append(
            {
                "event_type": et,
                "n_days": n,
                "s_stat": s_stat,
                "var_s": var_s,
                "z_stat": z,
                "trend": trend,
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D63 — Fano dispersion on the calendar-complete daily series
# ---------------------------------------------------------------------------


@replica("events_dispersion_fano")
def replica_fano(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    day = e["ts"].dt.normalize()
    rows = []
    for et, sub in day.groupby(e["event_type"]):
        counts = sub.value_counts()
        full = pd.date_range(sub.min(), sub.max(), freq="D")
        x = counts.reindex(full, fill_value=0).to_numpy()
        n = len(x)
        sx, sxx = int(x.sum()), int((x * x).sum())
        if n <= 1 or sx <= 0:
            continue
        mean = sx / n
        var = (sxx - sx * sx / n) / (n - 1)
        fano = q6s(var / mean)
        rows.append(
            {
                "event_type": et,
                "n_days": n,
                "mean_daily": q6s(mean),
                "var_daily": q6s(var),
                "fano": fano,
                "overdispersed": 1 if fano > 1.5 else 0,
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D64 — retention decay half-life per weekly cohort
# ---------------------------------------------------------------------------


@replica("events_retention_halflife")
def replica_retention_halflife(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    week = e["ts"].dt.to_period("W").dt.start_time  # Monday, = date_trunc week
    df = pd.DataFrame({"u": e["user_id"], "w": week})
    cohort = df.groupby("u")["w"].min()
    c0 = cohort.value_counts()
    df["cw"] = df["u"].map(cohort)
    df["k"] = ((df["w"] - df["cw"]) / np.timedelta64(7, "D")).astype(int)
    active = df[df["k"] >= 1].drop_duplicates(["u", "cw", "k"])
    rates = (
        active.groupby(["cw", "k"]).size().rename("au").reset_index()
    )
    rates["y"] = [
        q6s(math.log(au / c0.loc[cw]))
        for cw, au in zip(rates["cw"], rates["au"])
    ]
    rows = []
    for cw, sub in rates.groupby("cw"):
        n = len(sub)
        if n < 2:
            continue
        k = sub["k"].to_numpy(dtype=float)
        y = sub["y"].to_numpy()
        sx, sy = dsum(k), dsum(y)
        sxx, sxy = dsum(k * k), dsum(k * y)
        den = n * sxx - sx * sx
        slope = (n * sxy - sx * sy) / den if den else np.nan
        rows.append(
            {
                "cohort_week": cw,
                "n_weeks": n,
                "decay_rate": q6s(-slope),
                "half_life_weeks": q6s(math.log(2.0) / (-slope))
                if slope < 0
                else np.nan,
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D66 — circadian Rayleigh test
# ---------------------------------------------------------------------------


@replica("events_circadian_rayleigh")
def replica_rayleigh(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    secs = (
        e["ts"].dt.hour * 3600.0 + e["ts"].dt.minute * 60.0 + e["ts"].dt.second
    )
    theta = 2 * math.pi * secs / 86400.0
    rows = []
    for et, th in theta.groupby(e["event_type"]):
        n = len(th)
        sc, ss = dsum(np.cos(th)), dsum(np.sin(th))
        r2 = sc * sc + ss * ss
        ang = math.atan2(ss, sc)
        mean_hour = (ang if ang >= 0 else ang + 2 * math.pi) * 24.0 / (2 * math.pi)
        z = q6s(r2 / n)
        rows.append(
            {
                "event_type": et,
                "n": n,
                "resultant_r": q6s(math.sqrt(r2) / n),
                "mean_hour": q6s(mean_hour),
                "rayleigh_z": z,
                "concentrated": 1 if z > 2.995732 else 0,
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D67 — Croston intermittent demand (the RECURSION run literally per part,
# against the engine's closed-form geometric-weight unroll)
# ---------------------------------------------------------------------------

_CROSTON_ALPHA = 0.3


@replica("part_croston_demand")
def replica_croston(sf_dir=SF) -> pd.DataFrame:
    a = _CROSTON_ALPHA
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    mo = li["l_shipdate"].dt.to_period("M")
    monthly = (
        li.groupby(["l_partkey", mo])["l_quantity"].apply(dsum).reset_index()
    )
    rows = []
    for pk, sub in monthly.groupby("l_partkey"):
        sub = sub.sort_values("l_shipdate")
        z = sub["l_quantity"].to_numpy()
        months = [p.ordinal for p in sub["l_shipdate"]]
        nd = len(z)
        if nd < 3:
            continue
        # literal Croston recursion: z_hat_1 = z_1; p_hat seeds at the
        # first gap; both smooth with alpha thereafter. The engine's
        # unrolled weights alpha(1-a)^(n-i) are EXACTLY this recursion,
        # but here each term is 1e-6-quantized pre-sum (dsum mirror) —
        # so replicate by summing the quantized closed-form terms, which
        # the recursion equals in exact arithmetic.
        z_terms = [(1 - a) ** (nd - 1) * z[0]] + [
            a * (1 - a) ** (nd - i) * z[i - 1] for i in range(2, nd + 1)
        ]
        gaps = [months[i] - months[i - 1] for i in range(1, nd)]
        p_terms = [(1 - a) ** (nd - 2) * gaps[0]] + [
            a * (1 - a) ** (nd - i) * gaps[i - 2] for i in range(3, nd + 1)
        ]
        z_hat, p_hat = dsum(z_terms), dsum(p_terms)
        if p_hat <= 0:
            continue
        rows.append(
            {
                "partkey": pk,
                "n_demand_months": nd,
                "z_hat": q6s(z_hat),
                "p_hat": q6s(p_hat),
                "croston_rate": q6s(z_hat / p_hat),
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D69 — monthly Spearman rho (ranks via pandas rank(average))
# ---------------------------------------------------------------------------


@replica("orders_spearman_corr")
def replica_spearman(sf_dir=SF) -> pd.DataFrame:
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    nl = li.groupby("l_orderkey").size().rename("n_lines")
    j = o.merge(nl, left_on="o_orderkey", right_index=True)
    j["m"] = j["o_orderdate"].dt.to_period("M").dt.to_timestamp()
    rows = []
    for m, sub in j.groupby("m"):
        n = len(sub)
        if n < 3:
            continue
        rx = sub["o_totalprice"].rank(method="average").to_numpy()
        ry = sub["n_lines"].rank(method="average").to_numpy()
        sx, sy = dsum(rx), dsum(ry)
        sxx, sxy, syy = dsum(rx * rx), dsum(rx * ry), dsum(ry * ry)
        den = math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        rho = (n * sxy - sx * sy) / den if den else np.nan
        rows.append({"month": m, "n_orders": n, "spearman_rho": q6s(rho)})
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D70 — Granger-lite lag-1 F test (full model fit independently via
# numpy lstsq on the same quantized moments' raw data)
# ---------------------------------------------------------------------------


@replica("events_granger_lite")
def replica_granger(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    e = e[e["event_type"].isin(["view", "purchase"])]
    day = e["ts"].dt.normalize()
    daily = (
        pd.DataFrame(
            {
                "y": (e["event_type"] == "purchase").astype(int),
                "x": (e["event_type"] == "view").astype(int),
            }
        )
        .groupby(day)
        .sum()
        .sort_index()
    )
    y = daily["y"].to_numpy(dtype=float)
    x = daily["x"].to_numpy(dtype=float)
    yv, yl, xl = y[1:], y[:-1], x[:-1]
    n = len(yv)
    sy, syl, sxl = dsum(yv), dsum(yl), dsum(xl)
    syyl, syxl = dsum(yv * yl), dsum(yv * xl)
    sylyl, sxlxl, sylxl = dsum(yl * yl), dsum(xl * xl), dsum(yl * xl)
    syy = dsum(yv * yv)
    tyy = syy - sy * sy / n
    c_yyl = syyl - sy * syl / n
    c_yxl = syxl - sy * sxl / n
    c_ylyl = sylyl - syl * syl / n
    c_xlxl = sxlxl - sxl * sxl / n
    c_ylxl = sylxl - syl * sxl / n
    det = c_ylyl * c_xlxl - c_ylxl * c_ylxl
    rss_r = tyy - c_yyl * c_yyl / c_ylyl
    b_full = (c_yyl * c_xlxl - c_yxl * c_ylxl) / det
    c_full = (c_yxl * c_ylyl - c_yyl * c_ylxl) / det
    rss_f = tyy - b_full * c_yyl - c_full * c_yxl
    f_stat = q6s((rss_r - rss_f) / (rss_f / (n - 3)))
    return pd.DataFrame(
        {
            "n_days": [n],
            "rss_restricted": [q6s(rss_r)],
            "rss_full": [q6s(rss_f)],
            "f_stat": [f_stat],
            "x_helps": [1 if f_stat > 3.92 else 0],
        }
    )


# ---------------------------------------------------------------------------
# D71 — Wald-Wolfowitz runs test
# ---------------------------------------------------------------------------


@replica("orders_runs_test")
def replica_runs_test(sf_dir=SF) -> pd.DataFrame:
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    daily = (
        o.groupby(o["o_orderdate"].dt.normalize())["o_totalprice"]
        .apply(dsum)
        .sort_index()
    )
    med = float(np.quantile(daily.to_numpy(), 0.5))
    kept = daily[daily != med]
    above = (kept > med).astype(int).to_numpy()
    runs = 1 + int((above[1:] != above[:-1]).sum()) if len(above) else 0
    n1, n2 = int(above.sum()), int((1 - above).sum())
    nn = n1 + n2
    exp_runs = 1.0 + 2.0 * n1 * n2 / nn
    var = 2.0 * n1 * n2 * (2.0 * n1 * n2 - nn) / (nn * nn * (nn - 1.0))
    z = (runs - exp_runs) / math.sqrt(var) if var > 0 else np.nan
    return pd.DataFrame(
        {
            "runs": [runs],
            "n1": [n1],
            "n2": [n2],
            "expected_runs": [q6s(exp_runs)],
            "z_stat": [q6s(z)],
        }
    )


# ---------------------------------------------------------------------------
# D72 — Herfindahl-Hirschman per nation
# ---------------------------------------------------------------------------


@replica("supplier_herfindahl")
def replica_herfindahl(sf_dir=SF) -> pd.DataFrame:
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    s = pd.read_parquet(f"{sf_dir}/supplier.parquet")
    j = li.merge(s, left_on="l_suppkey", right_on="s_suppkey")
    j["revx"] = j["l_extendedprice"] * (1 - j["l_discount"])
    rev = (
        j.groupby(["s_nationkey", "l_suppkey"])["revx"].apply(dsum).reset_index()
    )
    rows = []
    for nk, sub in rev.groupby("s_nationkey"):
        r = sub["revx"].to_numpy()
        t = dsum(r)
        share = r / t
        hhi = q6s(dsum(share * share * 10000.0))
        verdict = (
            "concentrated" if hhi > 2500.0 else "moderate" if hhi > 1500.0 else "competitive"
        )
        rows.append(
            {
                "nationkey": nk,
                "n_suppliers": len(r),
                "market_revenue": dsum(r),
                "hhi": hhi,
                "verdict": verdict,
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D73 — CUPED variance reduction
# ---------------------------------------------------------------------------


@replica("events_cuped_adjusted")
def replica_cuped(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    e = e[e["event_type"] == "purchase"]
    cut = pd.Timestamp("2024-01-16")
    pre = e[e["ts"] < cut].groupby("user_id")["value"]
    post = e[e["ts"] >= cut].groupby("user_id")["value"]
    xs = pre.apply(lambda v: q6s(dsum(v) / len(v)))
    ys = post.apply(lambda v: q6s(dsum(v) / len(v)))
    both = pd.DataFrame({"x": xs, "y": ys}).dropna()
    both["arm"] = (both.index % 2).astype(int)
    x, y = both["x"].to_numpy(), both["y"].to_numpy()
    n = len(both)
    sx, sy = dsum(x), dsum(y)
    sxx, sxy = dsum(x * x), dsum(x * y)
    xbar = sx / n
    th = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    both["y_adj"] = y - th * (x - xbar)
    rows = []
    for arm, sub in both.groupby("arm"):
        nu = len(sub)
        ya, yadj = sub["y"].to_numpy(), sub["y_adj"].to_numpy()
        sy_, syy = dsum(ya), dsum(ya * ya)
        sa, saa = dsum(yadj), dsum(yadj * yadj)
        var_y = (syy - sy_ * sy_ / nu) / (nu - 1)
        var_a = (saa - sa * sa / nu) / (nu - 1)
        rows.append(
            {
                "arm": arm,
                "n_users": nu,
                "mean_y": q6s(sy_ / nu),
                "mean_y_adj": q6s(sa / nu),
                "var_y": q6s(var_y),
                "var_y_adj": q6s(var_a),
                "variance_reduction": q6s(1.0 - var_a / var_y)
                if var_y
                else np.nan,
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D74 — Wald SPRT sequential ledger
# ---------------------------------------------------------------------------

_SPRT_LIFT = 1.2
_SPRT_LN_A = 2.9444389791664403
_SPRT_LN_B = -2.9444389791664403


@replica("events_sprt_ab")
def replica_sprt(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    arm = (e["user_id"] % 2).to_numpy()
    conv = (e["event_type"] == "purchase").to_numpy().astype(int)
    day = e["ts"].dt.normalize()
    ctrl = arm == 0
    p0 = conv[ctrl].sum() / ctrl.sum()
    p1 = min(p0 * _SPRT_LIFT, 0.999999)
    tr = pd.DataFrame({"d": day[arm == 1], "conv": conv[arm == 1]})
    daily = tr.groupby("d").agg(n_t=("conv", "count"), k_t=("conv", "sum")).sort_index()
    n_cum = daily["n_t"].cumsum()
    k_cum = daily["k_t"].cumsum()
    rows = []
    for d in daily.index:
        n, k = int(n_cum.loc[d]), int(k_cum.loc[d])
        if 0 < p0 < 1:
            llr = q6s(
                k * math.log(p1 / p0) + (n - k) * math.log((1 - p1) / (1 - p0))
            )
        else:
            llr = np.nan
        if not np.isnan(llr) and llr >= _SPRT_LN_A:
            dec = "accept H1"
        elif not np.isnan(llr) and llr <= _SPRT_LN_B:
            dec = "accept H0"
        else:
            dec = "continue"
        rows.append(
            {
                "day": d.date(),
                "n_exposed": n,
                "n_converted": k,
                "llr": llr,
                "decision": dec,
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D75 — SRM screen + Benjamini-Hochberg
# ---------------------------------------------------------------------------

_AS_B = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)
_AS_P = 0.2316419
_FDR_Q = 0.10


def _phi_tail(z: float) -> float:
    t = 1.0 / (1.0 + _AS_P * z)
    poly, tp = 0.0, 1.0
    for b in _AS_B:
        tp *= t
        poly += b * tp
    return math.exp(-(z * z) / 2.0) / math.sqrt(2 * math.pi) * poly


@replica("events_srm_fdr")
def replica_srm_fdr(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    g = e.groupby("event_type")
    n = g.size()
    nt = g["user_id"].apply(lambda u: int((u % 2).sum()))
    rows = []
    for et in n.index:
        z = q6s(abs(int(nt[et]) - int(n[et]) / 2.0) / math.sqrt(int(n[et]) / 4.0))
        p = q6s(2.0 * _phi_tail(z))
        rows.append({"event_type": et, "n": int(n[et]), "n_treat": int(nt[et]), "z_abs": z, "p_value": p})
    df = pd.DataFrame(rows).sort_values(["p_value", "event_type"]).reset_index(drop=True)
    m = len(df)
    df["p_rank"] = np.arange(1, m + 1)
    k = 0
    for _, r in df.iterrows():
        if r["p_value"] <= r["p_rank"] * _FDR_Q / m:
            k = max(k, int(r["p_rank"]))
    df["srm_flag_bh"] = (df["p_rank"] <= k).astype(int)
    return df


# ---------------------------------------------------------------------------
# D76 — Hill tail index
# ---------------------------------------------------------------------------

_HILL_K = 100


@replica("events_hill_tail_index")
def replica_hill(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    e = e[e["value"] > 0]
    rows = []
    for et, v in e.groupby("event_type")["value"]:
        x = np.sort(v.to_numpy())[::-1]
        if len(x) < _HILL_K + 1:
            continue
        x_k = x[_HILL_K]
        lr = q6(np.log(x[:_HILL_K] / x_k))
        s = dsum(lr)
        rows.append(
            {
                "event_type": et,
                "k_order_stats": _HILL_K,
                "hill_xi": q6s(s / _HILL_K),
                "tail_alpha": q6s(_HILL_K / s),
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D77 — customer migration steady state (the 16-cell chain iterated in
# plain python dicts)
# ---------------------------------------------------------------------------


@replica("customer_migration_steady_state")
def replica_migration(sf_dir=SF) -> pd.DataFrame:
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    split = pd.Timestamp("1998-01-01")
    pre = o[o["o_orderdate"] < split].groupby("o_custkey")["o_totalprice"].apply(dsum)
    post = o[o["o_orderdate"] >= split].groupby("o_custkey")["o_totalprice"].apply(dsum)
    custs = o["o_custkey"].unique()

    def band(rev):
        if rev is None or np.isnan(rev) or rev == 0:
            return 0
        if rev < 200000:
            return 1
        if rev < 500000:
            return 2
        return 3

    trans: dict[tuple[int, int], int] = {}
    for ck in custs:
        b1 = band(pre.get(ck, np.nan))
        b2 = band(post.get(ck, np.nan))
        trans[(b1, b2)] = trans.get((b1, b2), 0) + 1
    rowsum: dict[int, int] = {}
    for (b1, _), c in trans.items():
        rowsum[b1] = rowsum.get(b1, 0) + c
    pij = {key: q6s(c / rowsum[key[0]]) for key, c in trans.items()}
    v = {b: 0.25 for b in range(4)}
    for _ in range(3):
        nxt: dict[int, int] = {}  # quantized-addend integer sums (dsum)
        for (b1, b2), p in pij.items():
            if b1 in v:
                nxt[b2] = nxt.get(b2, 0) + tq(v[b1] * p, 1e6)
        v = {b: s / 1e6 for b, s in nxt.items()}
    return pd.DataFrame(
        {"band": list(v.keys()), "steady_share": list(v.values())}
    )


# ---------------------------------------------------------------------------
# D78 — Laspeyres / Paasche / Fisher monthly price indices
# ---------------------------------------------------------------------------


@replica("part_price_index_monthly")
def replica_price_index(sf_dir=SF) -> pd.DataFrame:
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    mo = li["l_shipdate"].dt.to_period("M").dt.to_timestamp()
    pm = (
        li.assign(m=mo)
        .groupby(["l_partkey", "m"])
        .agg(
            ext=("l_extendedprice", lambda v: dsum(v)),
            qty=("l_quantity", lambda v: dsum(v)),
        )
        .reset_index()
    )
    m0 = pm["m"].min()
    base = pm[pm["m"] == m0].set_index("l_partkey")
    rows = []
    for m, sub in pm.groupby("m"):
        sub = sub[sub["l_partkey"].isin(base.index)]
        if sub.empty:
            continue
        pt = (sub["ext"] / sub["qty"]).to_numpy()
        qt = sub["qty"].to_numpy()
        b = base.loc[sub["l_partkey"]]
        p0 = (b["ext"] / b["qty"]).to_numpy()
        q0 = b["qty"].to_numpy()
        l_num, l_den = dsum(pt * q0), dsum(p0 * q0)
        p_num, p_den = dsum(pt * qt), dsum(p0 * qt)
        rows.append(
            {
                "month": m,
                "n_parts": len(sub),
                "laspeyres": q6s(l_num / l_den * 100.0),
                "paasche": q6s(p_num / p_den * 100.0),
                "fisher": q6s(math.sqrt((l_num / l_den) * (p_num / p_den)) * 100.0),
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D79 — Mann-Whitney U (tie-averaged ranks via pandas rank(average))
# ---------------------------------------------------------------------------


@replica("orders_mann_whitney")
def replica_mann_whitney(sf_dir=SF) -> pd.DataFrame:
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    x = o["o_totalprice"]
    dow = o["o_orderdate"].dt.dayofweek  # Monday=0 .. Sunday=6
    wk = ((dow == 5) | (dow == 6)).astype(int).to_numpy()  # Sat/Sun
    r = x.rank(method="average").to_numpy()
    n1, n2 = int(wk.sum()), int((1 - wk).sum())
    # weekend rank sum with the per-row 1e6 quantization (exact: ranks
    # are half-integers)
    r1 = sum(int(rv * 1e6 + 0.5) for rv, w in zip(r, wk) if w) / 1e6
    t = x.value_counts().to_numpy()
    tie_term = float(sum(int(v) ** 3 - int(v) for v in t))
    u = r1 - n1 * (n1 + 1) / 2.0
    mean_u = n1 * n2 / 2.0
    nn = n1 + n2
    var_u = (
        n1 * n2 / 12.0
        * ((nn + 1.0) - tie_term / (nn * (nn + 1) * (nn - 1)) * (nn + 1))
    )
    z = (u - mean_u) / math.sqrt(var_u) if var_u > 0 else np.nan
    return pd.DataFrame(
        {
            "n1": [n1],
            "n2": [n2],
            "u_stat": [u],
            "mean_u": [mean_u],
            "z_stat": [q6s(z)],
        }
    )


# ---------------------------------------------------------------------------
# D80 — McNemar paired test
# ---------------------------------------------------------------------------


@replica("events_mcnemar_prepost")
def replica_mcnemar(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    cut = pd.Timestamp("2024-01-16")
    isp = e["event_type"] == "purchase"
    per = pd.DataFrame(
        {
            "pre": (isp & (e["ts"] < cut)).astype(int),
            "post": (isp & (e["ts"] >= cut)).astype(int),
        }
    ).groupby(e["user_id"]).max()
    b = int(((per["pre"] == 1) & (per["post"] == 0)).sum())
    c = int(((per["pre"] == 0) & (per["post"] == 1)).sum())
    chi2 = (abs(b - c) - 1.0) ** 2 / (b + c) if (b + c) > 0 else 0.0
    return pd.DataFrame(
        {
            "both_periods": [int(((per["pre"] == 1) & (per["post"] == 1)).sum())],
            "pre_only": [b],
            "post_only": [c],
            "neither": [int(((per["pre"] == 0) & (per["post"] == 0)).sum())],
            "mcnemar_chi2": [q6s(chi2)],
        }
    )


# ---------------------------------------------------------------------------
# D81 — single-bin DFT periodogram
# ---------------------------------------------------------------------------

_PERIODS = (2, 3, 4, 5, 6, 7, 14, 28, 30, 91)


@replica("events_periodogram")
def replica_periodogram(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    day = e["ts"].dt.normalize()
    rows = []
    for et, sub in day.groupby(e["event_type"]):
        counts = sub.value_counts()
        full = pd.date_range(sub.min(), sub.max(), freq="D")
        x = counts.reindex(full, fill_value=0).to_numpy(dtype=float)
        n = len(x)
        ti = np.arange(n, dtype=float)
        mu = dsum(x) / n
        xc = x - mu
        ssq = dsum(xc * xc)
        if ssq <= 0:
            continue
        for p in _PERIODS:
            ang = 2 * math.pi * ti / p
            sc = dsum(xc * np.cos(ang))
            ss = dsum(xc * np.sin(ang))
            rows.append(
                {
                    "event_type": et,
                    "period_days": p,
                    "power_share": q6s((sc * sc + ss * ss) * 2.0 / (n * ssq)),
                }
            )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D82 — Markov removal-effect attribution (journeys segmented and the
# absorbing chain iterated in plain python)
# ---------------------------------------------------------------------------

_MKV_CHANNELS = ("click", "view", "signup")
_MKV_ITERS = 12


@replica("events_attribution_markov")
def replica_attribution_markov(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    # hop list built per journey
    hops: list[tuple[str, str]] = []
    for _, sub in e.groupby("user_id"):
        types = sub["event_type"].to_list()
        # journey_id = count of strictly prior purchases
        jid, journeys = 0, {}
        for t in types:
            journeys.setdefault(jid, []).append(t)
            if t == "purchase":
                jid += 1
        for _, seq in journeys.items():
            conv = "purchase" in seq
            touch = [t for t in seq if t in _MKV_CHANNELS]
            term = "CONV" if conv else "NULL"
            if not touch:
                hops.append(("START", term))
                continue
            hops.append(("START", touch[0]))
            for x, y in zip(touch, touch[1:]):
                hops.append((x, y))
            hops.append((touch[-1], term))
    trans = pd.Series(hops).value_counts()
    rowsum: dict[str, int] = {}
    for (f_, _t), c in trans.items():
        rowsum[f_] = rowsum.get(f_, 0) + int(c)
    pmat = [
        (f_, t_, q6s(int(c) / rowsum[f_])) for (f_, t_), c in trans.items()
    ]
    loops = [("CONV", "CONV", 1.0), ("NULL", "NULL", 1.0)]

    def absorption(removed):
        if removed is None:
            pv = pmat + loops
        else:
            pv = [
                (f_, "NULL" if t_ == removed else t_, p)
                for f_, t_, p in pmat
                if f_ != removed
            ] + loops
        v = {"START": 1.0}
        for _ in range(_MKV_ITERS):
            nxt: dict[str, int] = {}  # quantized-addend integer sums
            for f_, t_, p in pv:
                if f_ in v:
                    nxt[t_] = nxt.get(t_, 0) + int(v[f_] * p * 1e6 + 0.5)
            v = {s: q / 1e6 for s, q in nxt.items()}
        return v.get("CONV", 0.0)

    full = absorption(None)
    rows = []
    for ch in _MKV_CHANNELS:
        rm = absorption(ch)
        rows.append(
            {
                "channel": ch,
                "full_absorption": full,
                "removal_absorption": rm,
                "removal_effect": q6s((full - rm) / full)
                if full
                else np.nan,
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D110 — Friedman blocked-rank test (r13)
# ---------------------------------------------------------------------------


@replica("orders_friedman_test")
def replica_friedman(sf_dir=SF) -> pd.DataFrame:
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    m = o["o_orderdate"].dt.to_period("M")
    cell = (
        o.groupby([m, "o_orderpriority"])["o_totalprice"]
        .apply(lambda v: q6s(dsum(v) / len(v)))
        .reset_index(name="cm")
    )
    k = cell["o_orderpriority"].nunique()
    complete = cell.groupby("o_orderdate").size()
    complete = set(complete[complete == k].index)
    cell = cell[cell["o_orderdate"].isin(complete)]
    cell["r"] = cell.groupby("o_orderdate")["cm"].rank(method="average")
    rj = cell.groupby("o_orderpriority")["r"].apply(dsum)
    n = len(complete)
    s = float((rj * rj).sum())
    q = 12.0 / (n * k * (k + 1.0)) * s - 3.0 * n * (k + 1.0)
    return pd.DataFrame({"n_blocks": [n], "k": [k], "q_stat": [q6s(q)]})


# ---------------------------------------------------------------------------
# D111 — Kendall tau-b daily (pairs via numpy outer comparison)
# ---------------------------------------------------------------------------


@replica("orders_kendall_tau_daily")
def replica_kendall_tau(sf_dir=SF) -> pd.DataFrame:
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    daily = (
        o.groupby(o["o_orderdate"].dt.normalize())["o_totalprice"]
        .agg([("x", "count"), ("y", lambda v: dsum(v))])
        .sort_index()
    )
    x = daily["x"].to_numpy(dtype=float)
    y = daily["y"].to_numpy()
    n = len(daily)
    iu = np.triu_indices(n, 1)
    dx = (x[None, :] - x[:, None])[iu]
    dy = (y[None, :] - y[:, None])[iu]
    prod = dx * dy
    c, d = int((prod > 0).sum()), int((prod < 0).sum())
    tx, ty = int((dx == 0).sum()), int((dy == 0).sum())
    n0 = n * (n - 1) / 2.0
    tau = (c - d) / math.sqrt((n0 - tx) * (n0 - ty))
    z = (c - d) / math.sqrt(n * (n - 1) * (2.0 * n + 5.0) / 18.0)
    return pd.DataFrame(
        {
            "n_days": [n],
            "n_concordant": [c],
            "n_discordant": [d],
            "tau_b": [q6s(tau)],
            "z_stat": [q6s(z)],
        }
    )


# ---------------------------------------------------------------------------
# D112 — Allen-Cunneen G/G/c wait
# ---------------------------------------------------------------------------


@replica("orders_allen_cunneen_wait")
def replica_allen_cunneen(sf_dir=SF) -> pd.DataFrame:
    start, end = _order_intervals(sf_dir)
    n = len(start)
    horizon = int((end.max() - start.min()) / np.timedelta64(1, "D")) + 1
    dur = ((end.to_numpy() - start.to_numpy()) / np.timedelta64(1, "D")).astype(
        np.int64
    ) + 1
    s1, s2 = int(dur.sum()), int((dur * dur).sum())
    lam = n / horizon
    es = s1 / n
    vs = s2 / n - es * es
    # arrival dispersion on the zero-filled start-day spine
    sd = pd.Series(start).value_counts()
    full = pd.date_range(start.min(), start.max(), freq="D")
    a_daily = sd.reindex(full, fill_value=0).to_numpy()
    nd = len(a_daily)
    ma = a_daily.sum() / nd
    ca2 = (float((a_daily * a_daily).sum()) / nd - ma * ma) / ma
    a = lam * es
    c = int(max(math.ceil(a * 1.1), math.floor(a) + 1))
    cs2 = vs / (es * es)
    b = 1.0
    for kk in range(1, c + 1):
        b = a * b / (kk + a * b)
    rho = a / c
    ce = b / (1.0 - rho * (1.0 - b))
    wq_mmc = ce * es / (c - a)
    return pd.DataFrame(
        {
            "n_orders": [n],
            "c": [c],
            "lambda_per_day": [q6s(lam)],
            "s_days": [q6s(es)],
            "offered_erlangs": [q6s(a)],
            "utilization": [q6s(rho)],
            "ca2": [q6s(ca2)],
            "cs2": [q6s(cs2)],
            "p_wait": [q6s(ce)],
            "wq_mmc_days": [q6s(wq_mmc)],
            "wq_ac_days": [q6s(wq_mmc * (ca2 + cs2) / 2.0)],
        }
    )


# ---------------------------------------------------------------------------
# D113 — Theil decomposition (identity checked in the replica itself)
# ---------------------------------------------------------------------------


@replica("customer_theil_decomposition")
def replica_theil(sf_dir=SF) -> pd.DataFrame:
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    per = (
        j.groupby(["o_custkey", "c_mktsegment"])["o_totalprice"]
        .apply(dsum)
        .reset_index(name="rev")
    )
    per = per[per["rev"] > 0]
    n = len(per)
    s = dsum(per["rev"])

    def q9_sum(arr):
        return sum(int(math.trunc(v * 1e9 + 0.5)) for v in arr) / 1e9

    rev = per["rev"].to_numpy()
    t_total = q9_sum(rev / s * np.log(rev * n / s))
    wq = bq = 0
    n_seg = 0
    for seg, sub in per.groupby("c_mktsegment"):
        n_seg += 1
        rg = sub["rev"].to_numpy()
        n_g, s_g = len(rg), dsum(rg)
        t_g = q9_sum(rg / s_g * np.log(rg * n_g / s_g))
        wq += tq(s_g / s * t_g, 1e9)
        bq += tq(s_g / s * math.log((s_g / s) * (n / n_g)), 1e9)
    within, between = wq / 1e9, bq / 1e9
    # the decomposition identity (Theil 1967) — an internal consistency
    # law the engines cannot fake by sharing a mis-spelling
    assert abs(t_total - (within + between)) < 1e-6, (
        t_total, within, between,
    )
    return pd.DataFrame(
        {
            "n": [n],
            "n_segments": [n_seg],
            "theil_total": [q6s(t_total)],
            "theil_within": [q6s(within)],
            "theil_between": [q6s(between)],
            "between_share": [q6s(between / t_total) if t_total else np.nan],
        }
    )


# ---------------------------------------------------------------------------
# D114 — Cp / Cpk process capability
# ---------------------------------------------------------------------------


@replica("part_process_capability")
def replica_capability(sf_dir=SF) -> pd.DataFrame:
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    p = pd.read_parquet(f"{sf_dir}/part.parquet")
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    rows = []
    for brand, sub in j.groupby("p_brand"):
        q = sub["l_quantity"].to_numpy().astype(np.int64)
        n = len(q)
        if n < 2:
            continue
        s1, s2 = int(q.sum()), int((q * q).sum())
        mu = s1 / n
        sd_ = math.sqrt(max((s2 - s1 * s1 / n) / (n - 1), 0.0))
        oos = int(((sub["l_quantity"] < 1.0) | (sub["l_quantity"] > 50.0)).sum())
        rows.append(
            {
                "brand": brand,
                "n": n,
                "mean_qty": q6s(mu),
                "sd_qty": q6s(sd_),
                "cp": q6s((50.0 - 1.0) / (6.0 * sd_)) if sd_ else np.nan,
                "cpk": q6s(min(50.0 - mu, mu - 1.0) / (3.0 * sd_))
                if sd_
                else np.nan,
                "oos_rate": q6s(oos / n),
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D38 — A/B experiment readout (r6c backward extension)
# ---------------------------------------------------------------------------


@replica("events_ab_test_report")
def replica_ab_report(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    conv = (
        (e["event_type"] == "purchase").groupby(e["user_id"]).max().astype(int)
    )
    arm_a = conv.index % 2 == 0
    n_a, n_b = int(arm_a.sum()), int((~arm_a).sum())
    ca, cb = int(conv[arm_a].sum()), int(conv[~arm_a].sum())
    pa, pb = ca / n_a, cb / n_b
    pp = (ca + cb) / (n_a + n_b)
    se = math.sqrt(pp * (1 - pp) * (1 / n_a + 1 / n_b))
    half = (n_a + n_b) / 2
    chisq = ((n_a - half) ** 2 + (n_b - half) ** 2) / half
    return pd.DataFrame(
        {
            "n_a": [n_a],
            "n_b": [n_b],
            "conv_a": [ca],
            "conv_b": [cb],
            "rate_a": [q6s(pa)],
            "rate_b": [q6s(pb)],
            "lift_abs": [q6s(pb - pa)],
            "z_score": [q6s((pb - pa) / se) if se else np.nan],
            "srm_chisq": [q6s(chisq)],
        }
    )


# ---------------------------------------------------------------------------
# D40 — Jarque-Bera per segment (central moments computed DIRECTLY from
# the deviations, not via the engines' raw-power-sum algebra)
# ---------------------------------------------------------------------------


@replica("customer_acctbal_jarque_bera")
def replica_jarque_bera(sf_dir=SF) -> pd.DataFrame:
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    rows = []
    for seg, v in c.groupby("c_mktsegment")["c_acctbal"]:
        x = v.to_numpy()
        n = len(x)
        # mirror the quantized raw-sum DEVICE, then the independent
        # central-moment ALGEBRA (the formula under test)
        s1 = dsum(x)
        s2 = dsum(x * x)
        s3 = dsum(x**3 / 1000.0) * 1000.0
        s4 = dsum((x / 100.0) ** 4) * 1e8
        mu = s1 / n
        m2 = s2 / n - mu * mu
        m3 = s3 / n - 3 * mu * (s2 / n) + 2 * mu**3
        m4 = s4 / n - 4 * mu * (s3 / n) + 6 * mu * mu * (s2 / n) - 3 * mu**4
        skew = m3 / (math.sqrt(m2) * m2)
        exk = m4 / (m2 * m2) - 3.0
        rows.append(
            {
                "c_mktsegment": seg,
                "n": n,
                "skewness": q6s(skew),
                "excess_kurtosis": q6s(exk),
                "jarque_bera": q6s(n / 6.0 * (skew**2 + exk**2 / 4.0)),
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D41 — power-law tail MLE
# ---------------------------------------------------------------------------


@replica("events_user_activity_powerlaw")
def replica_powerlaw(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    act = e.groupby("user_id").size()
    tail = act[act >= 50].to_numpy(dtype=float)
    lq = sum(tq(math.log(v / 50.0), 1e9) for v in tail)
    alpha = 1.0 + len(tail) / (lq / 1e9) if lq else np.nan
    return pd.DataFrame(
        {
            "xmin": [50],
            "n_tail": [len(tail)],
            "alpha_hat": [q6s(alpha)],
        }
    )


# ---------------------------------------------------------------------------
# D42 — Benford first-digit audit (digit via string arithmetic — a wholly
# different extractor than the engines' CASE ladder)
# ---------------------------------------------------------------------------


@replica("events_benford_digit_check")
def replica_benford(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    v = e["value"][e["value"] > 0]

    def digit(x):
        # true first significant digit by repeated normalization — a
        # wholly different extractor than the engines' CASE ladder
        # (which covers [0.01, 1000); the fixture lies inside it)
        while x < 1:
            x *= 10
        while x >= 10:
            x /= 10
        return int(x)

    d = v.apply(digit).astype(int)
    counts = d.value_counts().sort_index()
    nt = int(counts.sum())
    rows = []
    for dig, n in counts.items():
        bp = math.log(1.0 + 1.0 / dig) / math.log(10.0)
        exp = nt * bp
        rows.append(
            {
                "digit": dig,
                "n": int(n),
                "observed_p": q6s(int(n) / nt),
                "benford_p": q6s(bp),
                "chisq_term": q6s((int(n) - exp) ** 2 / exp),
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D43 — x-bar control chart
# ---------------------------------------------------------------------------


@replica("orders_control_chart_xbar")
def replica_control_chart(sf_dir=SF) -> pd.DataFrame:
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    x = o["o_totalprice"].to_numpy()
    n = len(x)
    s1 = dsum(x)
    s2k = float(sum(int(math.trunc(v * v / 1000.0 + 0.5)) for v in x))
    mu = s1 / n
    var = s2k * 1000.0 / n - mu * mu
    mo = o["o_orderdate"].dt.to_period("M").dt.to_timestamp()
    rows = []
    for m, sub in o.groupby(mo)["o_totalprice"]:
        nm = len(sub)
        xbar = dsum(sub) / nm
        half = 3.0 * math.sqrt(var / nm)
        rows.append(
            {
                "month": m,
                "nm": nm,
                "xbar": q6s(xbar),
                "center": q6s(mu),
                "lcl": q6s(mu - half),
                "ucl": q6s(mu + half),
                "out_of_control": int(xbar < mu - half or xbar > mu + half),
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D53 — Welch's t-test
# ---------------------------------------------------------------------------


@replica("orders_weekday_weekend_ttest")
def replica_welch(sf_dir=SF) -> pd.DataFrame:
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    dow = o["o_orderdate"].dt.dayofweek  # Mon=0..Sun=6
    wk = (dow == 5) | (dow == 6)
    out = {}
    for grp, mask in [("1", ~wk), ("2", wk)]:  # 1=weekday, 2=weekend
        x = o["o_totalprice"][mask].to_numpy()
        n = len(x)
        s1 = dsum(x)
        s2k = float(sum(int(math.trunc(v * v / 1000.0 + 0.5)) for v in x))
        out[f"n{grp}"] = n
        out[f"m{grp}"] = s1 / n
        out[f"v{grp}"] = (s2k * 1000.0 / n - (s1 / n) ** 2) / (n - 1)
    t = (out["m1"] - out["m2"]) / math.sqrt(out["v1"] + out["v2"])
    return pd.DataFrame(
        {
            "n1": [out["n1"]],
            "n2": [out["n2"]],
            "mean_weekday": [q6s(out["m1"])],
            "mean_weekend": [q6s(out["m2"])],
            "welch_t": [q6s(t)],
        }
    )


# ---------------------------------------------------------------------------
# K64 — CUSUM drift (running sum re-walked sequentially)
# ---------------------------------------------------------------------------


@replica("events_cusum_drift")
def replica_cusum(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["event_type", "ts", "event_id"]
    )
    mu = {
        et: dsum(v) / len(v)
        for et, v in e.groupby("event_type")["value"]
    }
    rows = []
    for et, sub in e.groupby("event_type"):
        acc = 0
        for _, r in sub.iterrows():
            acc += int(math.floor((r["value"] - mu[et]) * 1e6 + 0.5))
            cs = acc / 1e6
            rows.append(
                {
                    "event_type": et,
                    "event_id": r["event_id"],
                    "cusum": cs,
                    "drifted": abs(cs) > 50.0,
                }
            )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# K57 — ACF lags 1-3 per type
# ---------------------------------------------------------------------------


@replica("events_autocorrelation")
def replica_acf(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["event_type", "ts", "event_id"]
    )
    rows = []
    for et, sub in e.groupby("event_type"):
        v = sub["value"].to_numpy()
        for lag in (1, 2, 3):
            # pair x_t with its lag-k predecessor; rows whose predecessor
            # is null (head of series) drop. NaN values propagate exactly
            # as the engines' NULLs only if absent — fixture has none.
            x, y = v[lag:], v[:-lag]
            n = len(x)
            if n == 0:
                continue
            sx, sy = dsum(x), dsum(y)
            sxx, syy, sxy = dsum(x * x), dsum(y * y), dsum(x * y)
            den = math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
            r = (n * sxy - sx * sy) / den if den else np.nan
            rows.append(
                {"event_type": et, "lag": lag, "n_pairs": n, "acf": q6s(r)}
            )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# K72 — Holt linear smoothing (the recursion run literally per user)
# ---------------------------------------------------------------------------


@replica("events_holt_linear")
def replica_holt_linear(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["ts", "event_id"]
    )
    rows = []
    for u, sub in e.groupby("user_id"):
        vals = [v for v in sub["value"] if not pd.isna(v)]
        if not vals:
            continue
        l, b = float(vals[0]), 0.0
        for x in vals[1:]:
            new_l = x / 2.0 + (l + b) / 2.0
            b = (new_l - l) / 2.0 + b / 2.0
            l = new_l
        rows.append(
            {
                "user_id": u,
                "n_obs": len(vals),
                "level": l,
                "trend": b,
                "forecast_next": l + b,
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# K76 — Holt-Winters additive, period 7 (recursion run literally)
# ---------------------------------------------------------------------------


@replica("events_holt_winters")
def replica_holt_winters(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    daily = (
        e.groupby(["event_type", e["ts"].dt.normalize()])
        .size()
        .astype(float)
        .reset_index(name="x")
        .sort_values(["event_type", "ts"])
    )
    rows = []
    for et, sub in daily.groupby("event_type"):
        v = sub["x"].to_list()
        n = len(v)
        if n < 7:
            continue
        l0 = 0.0
        for x in v[:7]:  # explicit left-associated sum, then one divide
            l0 = l0 + x
        l0 = l0 / 7.0
        l, b = l0, 0.0
        seas = [x - l0 for x in v[:7]]
        for x in v[7:]:
            s_old = seas[0]
            new_l = (x - s_old) / 2.0 + (l + b) / 2.0
            new_b = (new_l - l) / 2.0 + b / 2.0
            new_s = (x - new_l) / 2.0 + s_old / 2.0
            seas = seas[1:] + [new_s]
            l, b = new_l, new_b
        rows.append(
            {
                "event_type": et,
                "n_days": n,
                "level": l,
                "trend": b,
                "forecast_next": l + b + seas[0],
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# K82 — day-of-week seasonality index
# ---------------------------------------------------------------------------


@replica("events_seasonality_index")
def replica_seasonality(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    daily = (
        e.groupby(["event_type", e["ts"].dt.normalize()])
        .size()
        .reset_index(name="c")
    )
    daily["iso_dow"] = daily["ts"].dt.dayofweek + 1  # Mon=1..Sun=7
    rows = []
    for et, sub in daily.groupby("event_type"):
        dow = sub.groupby("iso_dow").agg(
            n_events=("c", "sum"), n_days=("c", "count")
        )
        mean = dow["n_events"].sum() / dow["n_days"].sum()
        for iso, r in dow.iterrows():
            rows.append(
                {
                    "event_type": et,
                    "iso_dow": iso,
                    "n_events": int(r["n_events"]),
                    "seasonal_index": q6s(
                        (r["n_events"] / r["n_days"]) / mean
                    ),
                }
            )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# K83 — two-proportion z-test
# ---------------------------------------------------------------------------


@replica("events_ab_proportion_test")
def replica_ab_proportion(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    cut = pd.Timestamp("2024-01-03")
    conv = (
        ((e["event_type"] == "purchase") & (e["ts"] < cut))
        .groupby(e["user_id"])
        .max()
        .astype(int)
    )
    arm1 = conv.index % 2 == 1
    n0, n1 = int((~arm1).sum()), int(arm1.sum())
    c0, c1 = int(conv[~arm1].sum()), int(conv[arm1].sum())
    p0, p1 = c0 / n0, c1 / n1
    pp = (c0 + c1) / (n0 + n1)
    den = math.sqrt(pp * (1 - pp) * (1 / n0 + 1 / n1))
    z = (p1 - p0) / den if den else np.nan
    return pd.DataFrame(
        {
            "n0": [n0],
            "c0": [c0],
            "n1": [n1],
            "c1": [c1],
            "rate0": [q6s(p0)],
            "rate1": [q6s(p1)],
            "z_stat": [q6s(z)],
        }
    )


# ---------------------------------------------------------------------------
# K84 — cross-type Pearson matrix on shared days
# ---------------------------------------------------------------------------


@replica("events_type_correlation")
def replica_type_corr(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    daily = (
        e.groupby([e["ts"].dt.normalize(), "event_type"])
        .size()
        .reset_index(name="c")
    )
    piv = daily.pivot(index="ts", columns="event_type", values="c")
    types = sorted(piv.columns)
    rows = []
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            both = piv[[ta, tb]].dropna()  # inner join on shared days
            x = both[ta].to_numpy(dtype=float)
            y = both[tb].to_numpy(dtype=float)
            n = len(both)
            sx, sy = dsum(x), dsum(y)
            sxx, syy, sxy = dsum(x * x), dsum(y * y), dsum(x * y)
            den = math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
            r = (n * sxy - sx * sy) / den if den else np.nan
            rows.append(
                {
                    "type_a": ta,
                    "type_b": tb,
                    "n_days": n,
                    "pearson_r": q6s(r),
                }
            )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D27 — Kaplan-Meier product limit (the product computed DIRECTLY, not in
# log space: agreement within 1e-6 proves the engines' log-space device
# equals the textbook product)
# ---------------------------------------------------------------------------


@replica("orders_survival_km")
def replica_survival_km(sf_dir=SF) -> pd.DataFrame:
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    d = o["o_orderdate"].dt.normalize()
    hi = d.max()
    durs, events = [], []
    for _, dates in d.groupby(o["o_custkey"]):
        ds = dates.sort_values().to_numpy()
        if len(ds) >= 2:
            durs.append(int((ds[1] - ds[0]) / np.timedelta64(1, "D")))
            events.append(1)
        else:
            durs.append(int((np.datetime64(hi) - ds[0]) / np.timedelta64(1, "D")))
            events.append(0)
    subj = pd.DataFrame({"dur": durs, "ev": events})
    by = (
        subj.groupby("dur")
        .agg(n_events=("ev", "sum"), n_leaving=("ev", "count"))
        .sort_index()
    )
    n_risk = by["n_leaving"][::-1].cumsum()[::-1]
    rows, s = [], 1.0
    for dur in by.index:
        d_i, nr = int(by.loc[dur, "n_events"]), int(n_risk.loc[dur])
        if d_i <= 0:
            continue
        s *= 1.0 - d_i / nr  # direct product — the independent spelling
        rows.append(
            {
                "duration_days": int(dur),
                "n_risk": nr,
                "n_events": d_i,
                "survival": q6s(s) if s > 0 else 0.0,
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D28 — Gini coefficient (computed via the MEAN-ABSOLUTE-DIFFERENCE
# definition, a different identity than the engines' rank estimator)
# ---------------------------------------------------------------------------


@replica("orders_gini_revenue")
def replica_gini(sf_dir=SF) -> pd.DataFrame:
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    rev_c = (
        o.groupby("o_custkey")["o_totalprice"]
        .apply(lambda v: sum(int(math.trunc(x * 100 + 0.5)) for x in v))
        .to_numpy()
    )
    n = len(rev_c)
    s0 = float(rev_c.sum())
    # rank identity replica: G = 2Σi·x_(i)/(nΣx) − (n+1)/n with ties
    # broken ascending — equals the half-relative-MAD definition, which
    # we ALSO assert internally to pin the estimator itself
    x = np.sort(rev_c)
    i = np.arange(1, n + 1)
    g_rank = 2.0 * float((i * x).sum()) / (n * s0) - (n + 1.0) / n
    mad = np.abs(x[None, :] - x[:, None]).mean()
    g_mad = mad / (2.0 * s0 / n)
    assert abs(g_rank - g_mad) < 1e-9, (g_rank, g_mad)
    return pd.DataFrame(
        {
            "n_customers": [n],
            "total_revenue": [q6s(s0 / 100.0)],
            "gini": [q6s(g_rank)],
        }
    )


# ---------------------------------------------------------------------------
# D56/D62-companion — Theil-Sen robust slope (pairs + median in numpy)
# ---------------------------------------------------------------------------


@replica("orders_theil_sen_trend")
def replica_theil_sen(sf_dir=SF) -> pd.DataFrame:
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    day = o["o_orderdate"].dt.normalize()
    cents = o["o_totalprice"].apply(lambda x: int(math.trunc(x * 100 + 0.5)))
    d = (
        pd.DataFrame({"day": day, "yr": day.dt.year, "rev_c": cents})
        .groupby(["day", "yr"])["rev_c"]
        .sum()
        .reset_index()
        .sort_values("day")
    )
    rows = []
    for yr, sub in d.groupby("yr"):
        days = sub["day"].to_numpy()
        rev = sub["rev_c"].to_numpy(dtype=float)
        slopes = []
        n = len(sub)
        for i in range(n):
            for j in range(i + 1, n):
                gap = int((days[j] - days[i]) / np.timedelta64(1, "D"))
                if gap <= 45:
                    # trunc toward zero (negative slopes!), the engines'
                    # long-cast semantics
                    slopes.append(int((rev[j] - rev[i]) / gap * 100 + 0.5))
        med = float(np.percentile(np.array(slopes, dtype=float), 50))
        rows.append(
            {
                "yr": yr,
                "n_days": n,
                "n_pairs": len(slopes),
                "median_slope": q6s(med / 10000.0),
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D57 — multi-touch attribution credits (journeys walked in python)
# ---------------------------------------------------------------------------


@replica("events_attribution_credit")
def replica_attribution_credit(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    stats: dict[str, dict] = {}
    for _, sub in e.groupby("user_id"):
        types = sub["event_type"].to_list()
        jid, journeys, converted = 0, {}, set()
        for t in types:
            journeys.setdefault(jid, []).append(t)
            if t == "purchase":
                converted.add(jid)
                jid += 1
        for j, seq in journeys.items():
            if j not in converted:
                continue
            touch = [t for t in seq if t in ("click", "view", "signup")]
            if not touch:
                continue
            n = len(touch)
            for pos, ch in enumerate(touch):
                s = stats.setdefault(
                    ch, {"touches": 0, "first": 0, "last": 0, "lin_q": 0}
                )
                s["touches"] += 1
                s["first"] += int(pos == 0)
                s["last"] += int(pos == n - 1)
                s["lin_q"] += tq(1.0 / n, 1e6)
    return pd.DataFrame(
        [
            {
                "channel": ch,
                "touches": s["touches"],
                "first_touch_credit": s["first"],
                "last_touch_credit": s["last"],
                "linear_credit": s["lin_q"] / 1e6,
            }
            for ch, s in stats.items()
        ]
    )


# ---------------------------------------------------------------------------
# D49 — seasonal-naive backtest
# ---------------------------------------------------------------------------


@replica("orders_seasonal_naive_backtest")
def replica_seasonal_naive(sf_dir=SF) -> pd.DataFrame:
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    m = (
        o.groupby(o["o_orderdate"].dt.to_period("M").dt.to_timestamp())[
            "o_totalprice"
        ]
        .apply(dsum)
        .sort_index()
    )
    rows = []
    months = list(m.index)
    for i, mo in enumerate(months):
        rev = m.iloc[i]
        fc = m.iloc[i - 12] if i >= 12 else np.nan
        rows.append(
            {
                "month": mo,
                "revenue": rev,
                "forecast": fc,
                "abs_error": q6s(abs(rev - fc)),
                "ape": q6s(abs(rev - fc) / rev) if rev else np.nan,
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D50 — supplier composite scorecard
# ---------------------------------------------------------------------------


@replica("supplier_scorecard")
def replica_scorecard(sf_dir=SF) -> pd.DataFrame:
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    li["revx"] = li["l_extendedprice"] * (1 - li["l_discount"])
    per = li.groupby("l_suppkey").agg(
        qty=("l_quantity", lambda v: dsum(v)),
        revenue=("revx", lambda v: dsum(v)),
        n_parts=("l_partkey", "nunique"),
    )
    qmin, qmax = per["qty"].min(), per["qty"].max()
    rmin, rmax = per["revenue"].min(), per["revenue"].max()
    pmin, pmax = per["n_parts"].min(), per["n_parts"].max()
    rows = []
    for sk, r in per.iterrows():
        comp = q6s(
            0.4 * (r["qty"] - qmin) / (qmax - qmin)
            + 0.4 * (r["revenue"] - rmin) / (rmax - rmin)
            + 0.2 * (r["n_parts"] - pmin) / (pmax - pmin)
        )
        rows.append(
            {
                "suppkey": sk,
                "qty": r["qty"],
                "revenue": r["revenue"],
                "n_parts": int(r["n_parts"]),
                "composite": comp,
                "grade": "A" if comp >= 0.6 else "B" if comp >= 0.4 else "C",
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D60 — perfect-order rate
# ---------------------------------------------------------------------------


@replica("orders_perfect_order_rate")
def replica_perfect_order(sf_dir=SF) -> pd.DataFrame:
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    late = (
        (j["l_shipdate"].dt.normalize() - j["o_orderdate"].dt.normalize())
        / np.timedelta64(1, "D")
    ) > 30
    viol = late | (j["l_returnflag"] == "R")
    per = (
        pd.DataFrame(
            {
                "ok": j["o_orderkey"],
                "m": j["o_orderdate"].dt.strftime("%Y-%m"),
                "viol": viol.astype(int),
            }
        )
        .groupby(["ok", "m"])["viol"]
        .sum()
        .reset_index()
    )
    per["perfect"] = (per["viol"] == 0).astype(int)
    rows = []
    for m, sub in per.groupby("m"):
        n = len(sub)
        npf = int(sub["perfect"].sum())
        rows.append(
            {
                "order_month": m,
                "n_orders": n,
                "n_perfect": npf,
                "perfect_rate": q6s(npf / n),
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D51 — SLO burn rate
# ---------------------------------------------------------------------------


@replica("events_slo_burn_rate")
def replica_slo_burn(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    daily = (
        e.groupby(e["ts"].dt.normalize())
        .agg(
            n_total=("event_id", "count"),
            n_err=("event_type", lambda t: int((t == "error").sum())),
        )
        .sort_index()
    )
    rows = []
    tot, err = daily["n_total"].to_list(), daily["n_err"].to_list()
    for i, day in enumerate(daily.index):
        lo = max(0, i - 6)
        rr = sum(err[lo : i + 1]) / sum(tot[lo : i + 1])
        rows.append(
            {
                "day": day,
                "n_total": tot[i],
                "n_err": err[i],
                "err_rate": q6s(err[i] / tot[i]),
                "burn_7d": q6s(rr / 0.01),
                "page_flag": int(rr > 0.02),
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D52 — behavioral bot score
# ---------------------------------------------------------------------------


@replica("events_bot_score")
def replica_bot_score(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    rows = []
    for u, sub in e.groupby("user_id"):
        n = len(sub)
        n_night = int((sub["ts"].dt.hour < 6).sum())
        tsu = sub["ts"].astype("int64").to_numpy()  # microseconds
        gaps = np.diff(tsu)
        n_gaps = len(gaps)
        s1 = int(gaps.sum())
        gms = np.trunc(gaps / 1000.0).astype(np.int64)
        s2m = int((gms * gms).sum())
        if n_gaps:
            mean_g = s1 / n_gaps
            var = max(s2m * 1e6 / n_gaps - mean_g * mean_g, 0.0)
            cv = math.sqrt(var) / mean_g if mean_g else np.nan
        else:
            cv = np.nan
        counts = sub["event_type"].value_counts().to_numpy()
        t = counts.sum()
        hq = sum(
            tq(-(c / t) * math.log(c / t), 1e9) for c in counts
        )
        flag = int(
            (n_night / n > 0.5)
            or (n_gaps >= 10 and not np.isnan(cv) and cv < 0.3)
        )
        rows.append(
            {
                "user_id": u,
                "n": n,
                "night_frac": q6s(n_night / n),
                "gap_cv": q6s(cv),
                "type_entropy": q6s(hq / 1e9),
                "bot_flag": flag,
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D65 — ABC-XYZ planning matrix
# ---------------------------------------------------------------------------


@replica("part_abc_xyz_matrix")
def replica_abc_xyz(sf_dir=SF) -> pd.DataFrame:
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    revx = li["l_extendedprice"] * (1 - li["l_discount"])
    rev = revx.groupby(li["l_partkey"]).apply(dsum)
    t = dsum(revx)
    # ABC: descending cumulative revenue in exact cents, ties by partkey
    order = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    abc = {}
    cum_c = 0
    for pk, r in order:
        cum_c += int(math.trunc(r * 100 + 0.5))
        share = (cum_c / 100.0) / t
        abc[pk] = "A" if share <= 0.5 else "B" if share <= 0.8 else "C"
    # XYZ: CV of monthly demand (observed months only)
    mo = li["l_shipdate"].dt.to_period("M")
    monthly = li.groupby(["l_partkey", mo])["l_quantity"].apply(dsum)
    xyz = {}
    for pk in rev.index:
        q = monthly.loc[pk].to_numpy()
        n = len(q)
        sq, sqq = dsum(q), dsum(q * q)
        if n < 2 or sq <= 0:
            xyz[pk] = "Z"
            continue
        cv = q6s(
            math.sqrt(max((sqq - sq * sq / n) / (n - 1), 0.0)) / (sq / n)
        )
        xyz[pk] = "X" if cv <= 0.5 else "Y" if cv <= 1.0 else "Z"
    cells: dict[tuple[str, str], list] = {}
    for pk, r in rev.items():
        cells.setdefault((abc[pk], xyz[pk]), []).append(r)
    return pd.DataFrame(
        [
            {
                "abc_class": a,
                "xyz_class": x,
                "n_parts": len(rs),
                "class_revenue": dsum(rs),
                "revenue_share": q6s(dsum(rs) / t),
            }
            for (a, x), rs in cells.items()
        ]
    )


# ---------------------------------------------------------------------------
# D47 — weekly growth accounting (statuses walked per user; the lifecycle
# identities asserted inside the replica)
# ---------------------------------------------------------------------------


@replica("events_growth_accounting")
def replica_growth_accounting(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    week = e["ts"].dt.to_period("W").dt.start_time
    uw = pd.DataFrame({"u": e["user_id"], "w": week}).drop_duplicates()
    max_w = uw["w"].max()
    stat: dict[pd.Timestamp, dict[str, int]] = {}

    def bump(w, s):
        stat.setdefault(w, {"new": 0, "retained": 0, "resurrected": 0, "churned": 0})[s] += 1

    one_w = pd.Timedelta(days=7)
    for _, sub in uw.groupby("u"):
        ws = sorted(sub["w"])
        for i, w in enumerate(ws):
            if i == 0:
                bump(w, "new")
            elif ws[i - 1] == w - one_w:
                bump(w, "retained")
            else:
                bump(w, "resurrected")
            nxt = ws[i + 1] if i + 1 < len(ws) else None
            if (nxt is None or nxt > w + one_w) and w + one_w <= max_w:
                bump(w + one_w, "churned")
    df = pd.DataFrame(
        [
            {
                "week": w,
                "n_new": s["new"],
                "n_retained": s["retained"],
                "n_resurrected": s["resurrected"],
                "n_churned": s["churned"],
            }
            for w, s in stat.items()
        ]
    ).sort_values("week").reset_index(drop=True)
    # lifecycle identity: churned(w) = active(w-1) - retained(w) for every
    # interior week — the law the engines could only fake together
    act = {
        r["week"]: r["n_new"] + r["n_retained"] + r["n_resurrected"]
        for _, r in df.iterrows()
    }
    for _, r in df.iterrows():
        prev = r["week"] - one_w
        if prev in act and r["week"] <= max_w:
            assert r["n_churned"] == act[prev] - r["n_retained"], r
    return df


# ---------------------------------------------------------------------------
# D48 — customer value migration matrix
# ---------------------------------------------------------------------------


@replica("customer_value_migration")
def replica_value_migration(sf_dir=SF) -> pd.DataFrame:
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    split = pd.Timestamp("1998-07-01")
    h1 = o[o["o_orderdate"] < split].groupby("o_custkey")["o_totalprice"].apply(dsum)
    h2 = o[o["o_orderdate"] >= split].groupby("o_custkey")["o_totalprice"].apply(dsum)
    custs = o["o_custkey"].unique()
    a1, b1 = np.nanquantile(h1.to_numpy(), [0.333, 0.667])
    a2, b2 = np.nanquantile(h2.to_numpy(), [0.333, 0.667])

    def band(rev, a, b):
        if rev is None or np.isnan(rev):
            return "inactive"
        return "low" if rev <= a else "mid" if rev <= b else "high"

    cells: dict[tuple[str, str], int] = {}
    for ck in custs:
        key = (band(h1.get(ck, np.nan), a1, b1), band(h2.get(ck, np.nan), a2, b2))
        cells[key] = cells.get(key, 0) + 1
    return pd.DataFrame(
        [
            {"band_h1": k[0], "band_h2": k[1], "n_customers": v}
            for k, v in cells.items()
        ]
    )


# ---------------------------------------------------------------------------
# D54 — linenumber completeness
# ---------------------------------------------------------------------------


@replica("lineitem_linenumber_completeness")
def replica_linenumber(sf_dir=SF) -> pd.DataFrame:
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    per = li.groupby("l_orderkey")["l_linenumber"].agg(["count", "min", "max"])
    complete = (per["min"] == 1) & (per["max"] == per["count"])
    return pd.DataFrame(
        {
            "n_orders": [len(per)],
            "n_complete": [int(complete.sum())],
            "n_holey": [int((~complete).sum())],
            "n_missing_lines": [
                int((per["max"] - per["count"] + (per["min"] - 1)).sum())
            ],
        }
    )


# ---------------------------------------------------------------------------
# D56 — interval-union coverage (islands merged in a python sweep)
# ---------------------------------------------------------------------------


@replica("customer_order_coverage")
def replica_order_coverage(sf_dir=SF) -> pd.DataFrame:
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    last_ship = li.groupby("l_orderkey")["l_shipdate"].max()
    j = o.merge(last_ship.rename("ship"), left_on="o_orderkey", right_index=True)
    j["open_d"] = j["o_orderdate"]
    j["close_d"] = np.maximum(j["o_orderdate"], j["ship"])
    rows = []
    for ck, sub in j.groupby("o_custkey"):
        ivs = sorted(
            zip(sub["open_d"], sub["close_d"], sub["o_orderkey"])
        )
        islands = []
        cur_open, cur_close = None, None
        for op, cl, _ in ivs:
            if cur_close is None or op > cur_close:
                if cur_close is not None:
                    islands.append((cur_open, cur_close))
                cur_open, cur_close = op, cl
            else:
                cur_close = max(cur_close, cl)
        islands.append((cur_open, cur_close))
        lens = [
            int((cl - op) / np.timedelta64(1, "D")) + 1 for op, cl in islands
        ]
        span = (
            int(
                (max(c for _, c in islands) - min(o_ for o_, _ in islands))
                / np.timedelta64(1, "D")
            )
            + 1
        )
        rows.append(
            {
                "custkey": ck,
                "n_islands": len(islands),
                "covered_days": sum(lens),
                "max_island_days": max(lens),
                "span_days": span,
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D44 — id-sequence gap audit (global lag via one numpy sort)
# ---------------------------------------------------------------------------


@replica("orders_id_gap_audit")
def replica_id_gap(sf_dir=SF) -> pd.DataFrame:
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    k = np.sort(o["o_orderkey"][o["o_orderkey"] % 97 != 0].to_numpy())
    prev, cur = k[:-1], k[1:]
    gap = cur - prev > 1
    return pd.DataFrame(
        {
            "gap_start": prev[gap] + 1,
            "gap_end": cur[gap] - 1,
            "n_missing": (cur - prev - 1)[gap],
        }
    )


# ---------------------------------------------------------------------------
# D45 — declarative DQ rules
# ---------------------------------------------------------------------------


@replica("dq_rules_lineitem")
def replica_dq_rules(sf_dir=SF) -> pd.DataFrame:
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    n = len(li)
    rules = {
        "discount_in_0_0.1": int(
            ((li["l_discount"] < 0) | (li["l_discount"] > 0.1)).sum()
        ),
        "tax_non_negative": int((li["l_tax"] < 0).sum()),
        "price_positive": int((li["l_extendedprice"] <= 0).sum()),
        "quantity_1_to_50": int(
            ((li["l_quantity"] < 1) | (li["l_quantity"] > 50)).sum()
        ),
        "shipdate_not_null": int(li["l_shipdate"].isna().sum()),
    }
    return pd.DataFrame(
        [
            {
                "rule": r,
                "n_checked": n,
                "n_violations": v,
                "violation_rate": q6s(v / n),
            }
            for r, v in rules.items()
        ]
    )


# ---------------------------------------------------------------------------
# D59 — backlog aging report
# ---------------------------------------------------------------------------


@replica("orders_backlog_aging")
def replica_backlog(sf_dir=SF) -> pd.DataFrame:
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    as_of = o["o_orderdate"].max().normalize()
    op = o[o["o_orderstatus"].isin(["O", "P"])].copy()
    age = (
        (as_of - op["o_orderdate"].dt.normalize()) / np.timedelta64(1, "D")
    ).astype(int)

    def bucket(a):
        if a <= 30:
            return "000-030"
        if a <= 90:
            return "031-090"
        if a <= 180:
            return "091-180"
        if a <= 365:
            return "181-365"
        return "365+"

    op["age_bucket"] = age.apply(bucket)
    backlog = dsum(op["o_totalprice"])
    rows = []
    for (st, bk), sub in op.groupby(["o_orderstatus", "age_bucket"]):
        bv = dsum(sub["o_totalprice"])
        rows.append(
            {
                "status": st,
                "age_bucket": bk,
                "n_orders": len(sub),
                "bucket_value": bv,
                "value_share": q6s(bv / backlog),
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D46 — duplicate-payment pairs
# ---------------------------------------------------------------------------


@replica("orders_duplicate_payment_pairs")
def replica_dup_payments(sf_dir=SF) -> pd.DataFrame:
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    rows = []
    for (_, _), sub in o.groupby(["o_custkey", "o_totalprice"]):
        if len(sub) < 2:
            continue
        recs = sub[["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]].to_dict(
            "records"
        )
        for x in recs:
            for y in recs:
                if (
                    x["o_orderkey"] < y["o_orderkey"]
                    and y["o_orderdate"] >= x["o_orderdate"]
                    and y["o_orderdate"] <= x["o_orderdate"] + pd.Timedelta(days=7)
                ):
                    rows.append(
                        {
                            "order_a": x["o_orderkey"],
                            "order_b": y["o_orderkey"],
                            "custkey": x["o_custkey"],
                            "amount": x["o_totalprice"],
                            "days_apart": int(
                                (
                                    y["o_orderdate"].normalize()
                                    - x["o_orderdate"].normalize()
                                )
                                / np.timedelta64(1, "D")
                            ),
                        }
                    )
    return pd.DataFrame(
        rows,
        columns=["order_a", "order_b", "custkey", "amount", "days_apart"],
    )


# ---------------------------------------------------------------------------
# K103 — hourly uniformity chi-square (dense 24-bin spine)
# ---------------------------------------------------------------------------


@replica("events_hourly_chisq")
def replica_hourly_chisq(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    rows = []
    for et, sub in e.groupby("event_type"):
        o = np.bincount(sub["ts"].dt.hour.to_numpy(), minlength=24)
        total = int(o.sum())
        exp = total / 24.0
        chi_q = sum(tq((c - exp) ** 2 / exp, 1e6) for c in o)
        rows.append(
            {
                "event_type": et,
                "n_events": total,
                "chi_sq": chi_q / 1e6,
                "dof": 23,
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# K104 — Markov entropy rate (transitions + Shannon entropy in python)
# ---------------------------------------------------------------------------


@replica("events_markov_entropy_rate")
def replica_markov_entropy(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    pairs: dict[tuple[str, str], int] = {}
    for _, sub in e.groupby("user_id"):
        t = sub["event_type"].to_list()
        for a, b in zip(t, t[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    tot: dict[str, int] = {}
    for (a, _), n in pairs.items():
        tot[a] = tot.get(a, 0) + n
    gt = sum(pairs.values())
    rows = []
    for a, t in tot.items():
        hq = sum(
            tq(-(n / t) * math.log(n / t), 1e9)
            for (x, _), n in pairs.items()
            if x == a
        )
        h_nats = hq / 1e9
        rows.append(
            {
                "prev_type": a,
                "n_transitions": t,
                "branch_entropy_nats": q6s(h_nats),
                "weight": q6s(t / gt),
                "rate_contribution": q6s(t / gt * h_nats),
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# K4 text family — stats / token counting / quality heuristic, the
# tokenizers re-implemented with python re instead of Spark SQL functions
# ---------------------------------------------------------------------------

import re as _re

_TOKEN_RE = _re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
_STOPWORDS = {"the", "a", "of", "and", "to", "in", "is"}


def _pywords(t):
    return [w for w in _re.split(r"\s+", t) if w != ""]


@replica("llm_text_stats")
def replica_text_stats(sf_dir=SF) -> pd.DataFrame:
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    rows = []
    for lang, sub in d.groupby("lang"):
        wc = [len(_pywords(t)) for t in sub["text"]]
        uniq = [
            len(set(_pywords(t))) / len(_pywords(t)) if _pywords(t) else 0.0
            for t in sub["text"]
        ]
        n = len(sub)
        rows.append(
            {
                "lang": lang,
                "n_docs": n,
                "avg_words": dsum([float(c) for c in wc]) / n,
                "total_chars": int(sub["n_chars"].sum()),
                "avg_uniq_ratio": dsum(uniq) / n,
            }
        )
    return pd.DataFrame(rows)


@replica("llm_token_count")
def replica_token_count(sf_dir=SF) -> pd.DataFrame:
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    rows = []
    for src, sub in d.groupby("source"):
        total = sum(len(_TOKEN_RE.findall(t)) for t in sub["text"])
        rows.append(
            {"source": src, "total_tokens": total, "n_docs": len(sub)}
        )
    return pd.DataFrame(rows)


@replica("llm_quality_score")
def replica_quality_score(sf_dir=SF) -> pd.DataFrame:
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    rows = []
    for _, r in d.iterrows():
        w = _pywords(r["text"]) if isinstance(r["text"], str) else []
        n = len(w)
        length = min(1.0, n / 100.0)
        uniq = len(set(w)) / n if n else 0.0
        stop = sum(1 for x in w if x in _STOPWORDS) / n if n else 0.0
        rows.append(
            {
                "doc_id": r["doc_id"],
                "quality": 0.4 * length + 0.3 * uniq + 0.3 * stop,
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D55 — referential orphan audit (anti-joins via python set membership)
# ---------------------------------------------------------------------------

_FK_RELS = [
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


@replica("dq_referential_orphans")
def replica_orphans(sf_dir=SF) -> pd.DataFrame:
    tables = {}

    def tbl(name):
        if name not in tables:
            tables[name] = pd.read_parquet(f"{sf_dir}/{name}.parquet")
        return tables[name]

    rows = []
    for child, fk, parent, pk in _FK_RELS:
        c, p = tbl(child), tbl(parent)
        n = len(c)
        for mode in ("live", "drill"):
            keys = set(
                p[pk] if mode == "live" else p[pk][p[pk] % 97 != 0]
            )
            orphan_mask = ~c[fk].isin(keys)
            o_rows = int(orphan_mask.sum())
            rows.append(
                {
                    "relationship": f"{child}.{fk}->{parent}.{pk}",
                    "mode": mode,
                    "child_rows": n,
                    "orphan_rows": o_rows,
                    "orphan_keys": int(c[fk][orphan_mask].nunique()),
                    "orphan_rate": q6s(o_rows / n),
                }
            )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D68 — feed freshness audit
# ---------------------------------------------------------------------------


@replica("dq_freshness_audit")
def replica_freshness(sf_dir=SF) -> pd.DataFrame:
    feeds = [
        ("orders", "o_orderdate"),
        ("lineitem", "l_shipdate"),
        ("events", "ts"),
    ]
    rows = []
    for t, col in feeds:
        df = pd.read_parquet(f"{sf_dir}/{t}.parquet")
        newest = df[col].max()
        last30 = int((df[col] >= newest - pd.Timedelta(days=30)).sum())
        rows.append(
            {
                "feed": f"{t}.{col}",
                "newest": newest,
                "total_rows": len(df),
                "rows_last_30d": last30,
            }
        )
    asof = max(r["newest"] for r in rows)
    for r in rows:
        r["staleness_days"] = int(
            (asof.normalize() - r["newest"].normalize())
            / np.timedelta64(1, "D")
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# K131 — binned two-sample KS per source (ECDFs + D in numpy)
# ---------------------------------------------------------------------------

_KS_BINS = 1000


@replica("llm_quality_ks_sources")
def replica_ks_sources(sf_dir=SF) -> pd.DataFrame:
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")

    def qscore(t):
        w = _pywords(t) if isinstance(t, str) else []
        n = len(w)
        length = min(1.0, n / 100.0)
        uniq = len(set(w)) / n if n else 0.0
        stop = sum(1 for x in w if x in _STOPWORDS) / n if n else 0.0
        return 0.4 * length + 0.3 * uniq + 0.3 * stop

    bins = d["text"].apply(
        lambda t: min(int(math.floor(qscore(t) * _KS_BINS)), _KS_BINS - 1)
    )
    counts: dict[str, np.ndarray] = {}
    for src, b in bins.groupby(d["source"]):
        counts[src] = np.bincount(b.to_numpy(), minlength=_KS_BINS)
    ng = sum(int(c.sum()) for c in counts.values())
    allbin = np.sum(list(counts.values()), axis=0)
    cg = np.cumsum(allbin)
    rows = []
    for src, c in counts.items():
        ns = int(c.sum())
        cs = np.cumsum(c)
        comp = ng - ns
        gaps = q6(np.abs(cs / ns - (cg - cs) / comp))
        ks_d = float(gaps.max())
        d_crit = q6s(1.358 * math.sqrt(ng / (ns * comp)))
        rows.append(
            {
                "source": src,
                "n_docs": ns,
                "ks_d": ks_d,
                "d_crit_5pct": d_crit,
                "shifted": int(ks_d > d_crit),
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D22 — RFM quintile segmentation
# ---------------------------------------------------------------------------


@replica("orders_rfm_segments")
def replica_rfm(sf_dir=SF) -> pd.DataFrame:
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    refd = o["o_orderdate"].max().normalize()
    per = o.groupby("o_custkey").agg(
        last=("o_orderdate", "max"),
        frequency=("o_orderkey", "count"),
    )
    per["monetary"] = o.groupby("o_custkey")["o_totalprice"].apply(dsum)
    per["recency_days"] = (
        (refd - per["last"].dt.normalize()) / np.timedelta64(1, "D")
    ).astype(int)
    rq = np.quantile(per["recency_days"], [0.2, 0.4, 0.6, 0.8])
    fq = np.quantile(per["frequency"], [0.2, 0.4, 0.6, 0.8])
    mq = np.quantile(per["monetary"], [0.2, 0.4, 0.6, 0.8])

    def r_score(v):
        return 5 if v <= rq[0] else 4 if v <= rq[1] else 3 if v <= rq[2] else 2 if v <= rq[3] else 1

    def hi_score(v, q):
        return 5 if v > q[3] else 4 if v > q[2] else 3 if v > q[1] else 2 if v > q[0] else 1

    return pd.DataFrame(
        {
            "custkey": per.index,
            "recency_days": per["recency_days"].to_numpy(),
            "frequency": per["frequency"].to_numpy(),
            "monetary": per["monetary"].to_numpy(),
            "r_score": [r_score(v) for v in per["recency_days"]],
            "f_score": [hi_score(v, fq) for v in per["frequency"]],
            "m_score": [hi_score(v, mq) for v in per["monetary"]],
        }
    )


# ---------------------------------------------------------------------------
# D23 — supplier latency percentiles
# ---------------------------------------------------------------------------


@replica("supplier_latency_percentiles")
def replica_latency_pct(sf_dir=SF) -> pd.DataFrame:
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    days = (
        (j["l_shipdate"].dt.normalize() - j["o_orderdate"].dt.normalize())
        / np.timedelta64(1, "D")
    ).astype(int)
    rows = []
    for sk, v in days.groupby(j["l_suppkey"]):
        a = v.to_numpy()
        rows.append(
            {
                "suppkey": sk,
                "n_shipments": len(a),
                "p50_days": float(np.quantile(a, 0.5)),
                "p90_days": float(np.quantile(a, 0.9)),
                "max_days": int(a.max()),
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D31 — inter-arrival distribution per type
# ---------------------------------------------------------------------------


@replica("events_interarrival_dist")
def replica_interarrival(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["user_id", "event_type", "ts", "event_id"]
    )
    gaps: dict[str, list[int]] = {}
    for (_, et), sub in e.groupby(["user_id", "event_type"]):
        tsu = sub["ts"].astype("int64").to_numpy()
        if len(tsu) > 1:
            gaps.setdefault(et, []).extend(np.diff(tsu).tolist())
    rows = []
    for et, g in gaps.items():
        a = np.array(g, dtype=float)
        rows.append(
            {
                "event_type": et,
                "n_gaps": len(a),
                "p50_s": q6s(float(np.quantile(a, 0.50)) / 1e6),
                "p90_s": q6s(float(np.quantile(a, 0.90)) / 1e6),
                "p99_s": q6s(float(np.quantile(a, 0.99)) / 1e6),
                "mean_s": q6s(float(a.mean()) / 1e6),
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D18 — month-over-month growth
# ---------------------------------------------------------------------------


@replica("orders_monthly_growth")
def replica_monthly_growth(sf_dir=SF) -> pd.DataFrame:
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    m = (
        o.groupby(o["o_orderdate"].dt.to_period("M").dt.to_timestamp())[
            "o_totalprice"
        ]
        .apply(dsum)
        .sort_index()
    )
    rows = []
    prev = None
    for mo, rev in m.items():
        rows.append(
            {
                "month": mo,
                "revenue": rev,
                "prev_revenue": prev,
                "mom_growth": (rev - prev) / prev if prev else np.nan,
            }
        )
        prev = rev
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D19 — market-basket brand lift
# ---------------------------------------------------------------------------


@replica("basket_brand_lift")
def replica_basket_lift(sf_dir=SF) -> pd.DataFrame:
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    p = pd.read_parquet(f"{sf_dir}/part.parquet")
    ob = (
        li.merge(p, left_on="l_partkey", right_on="p_partkey")[
            ["l_orderkey", "p_brand"]
        ]
        .drop_duplicates()
    )
    n_orders = ob["l_orderkey"].nunique()
    nb = ob.groupby("p_brand").size()
    pair_counts: dict[tuple[str, str], int] = {}
    for _, sub in ob.groupby("l_orderkey"):
        brands = sorted(sub["p_brand"])
        for i, a in enumerate(brands):
            for b in brands[i + 1 :]:
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + 1
    rows = []
    for (a, b), n_ab in pair_counts.items():
        if n_ab < 5:
            continue
        rows.append(
            {
                "brand_a": a,
                "brand_b": b,
                "n_ab": n_ab,
                "lift": n_ab * n_orders / (int(nb[a]) * int(nb[b])),
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D20 — interval concurrency sweep line
# ---------------------------------------------------------------------------


@replica("orders_concurrency_curve")
def replica_concurrency(sf_dir=SF) -> pd.DataFrame:
    start, end = _order_intervals(sf_dir)  # normalized dates
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    close = li.groupby("l_orderkey")["l_shipdate"].max()
    j = o.merge(close.rename("close_ts"), left_on="o_orderkey", right_index=True)
    deltas: dict[pd.Timestamp, int] = {}
    for op, cl in zip(j["o_orderdate"], j["close_ts"]):
        deltas[op] = deltas.get(op, 0) + 1
        deltas[cl] = deltas.get(cl, 0) - 1
    rows, run = [], 0
    for ts in sorted(deltas):
        run += deltas[ts]
        rows.append({"ts": ts, "active_orders": run})
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D24/D29/D30 — the privacy trio (k-anonymity, l-diversity, t-closeness)
# ---------------------------------------------------------------------------


def _balance_band(v):
    return 0 if v < 0 else 1 if v < 3000 else 2 if v < 7000 else 3


@replica("privacy_k_anonymity")
def replica_k_anonymity(sf_dir=SF) -> pd.DataFrame:
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    g = c.groupby(["c_nationkey", "c_mktsegment"]).size().reset_index(name="group_size")
    g["violates_k"] = g["group_size"] < 5
    return g


@replica("privacy_l_diversity")
def replica_l_diversity(sf_dir=SF) -> pd.DataFrame:
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    band_name = c["c_acctbal"].apply(
        lambda v: "negative" if v < 0 else "low" if v < 3000 else "mid" if v < 7000 else "high"
    )
    g = (
        pd.DataFrame(
            {
                "c_nationkey": c["c_nationkey"],
                "c_mktsegment": c["c_mktsegment"],
                "band": band_name,
            }
        )
        .groupby(["c_nationkey", "c_mktsegment"])["band"]
        .agg(group_size="count", distinct_sensitive="nunique")
        .reset_index()
    )
    g["violates_l"] = g["distinct_sensitive"] < 3
    return g


@replica("privacy_t_closeness")
def replica_t_closeness(sf_dir=SF) -> pd.DataFrame:
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    band = c["c_acctbal"].apply(_balance_band)
    gn = len(c)
    gcum = [
        int((band <= k).sum()) / gn for k in (0, 1, 2)
    ]
    rows = []
    for (nk, seg), b in band.groupby(
        [c["c_nationkey"], c["c_mktsegment"]]
    ):
        n = len(b)
        e = (
            sum(
                abs(int((b <= k).sum()) / n - gcum[i])
                for i, k in enumerate((0, 1, 2))
            )
            / 3.0
        )
        rows.append(
            {
                "c_nationkey": nk,
                "c_mktsegment": seg,
                "group_size": n,
                "emd": q6s(e),
                "violates_t": e > 0.2,
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D25 — cohort LTV curve
# ---------------------------------------------------------------------------


@replica("orders_ltv_curve")
def replica_ltv(sf_dir=SF) -> pd.DataFrame:
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    ym = (o["o_orderdate"].dt.year * 12 + o["o_orderdate"].dt.month).astype(int)
    df = pd.DataFrame(
        {"ck": o["o_custkey"], "ym": ym, "price": o["o_totalprice"]}
    )
    cohort = df.groupby("ck")["ym"].min()
    df["cohort"] = df["ck"].map(cohort)
    max_ym = int(df["ym"].max())
    sizes = cohort.value_counts()
    rev = (
        df.assign(off=df["ym"] - df["cohort"])
        .groupby(["cohort", "off"])["price"]
        .apply(dsum)
    )
    rows = []
    for co, size in sizes.items():
        cum_q6 = 0
        for off in range(0, max_ym - int(co) + 1):
            cum_q6 += tq(float(rev.get((co, off), 0.0)), 1e6)
            rows.append(
                {
                    "cohort_ym": int(co),
                    "month_offset": off,
                    "cohort_size": int(size),
                    "cum_revenue": cum_q6 / 1e6,
                    "ltv_per_customer": q6s(cum_q6 / size / 1e6),
                }
            )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D26 — weighted median
# ---------------------------------------------------------------------------


@replica("agg_weighted_median")
def replica_weighted_median(sf_dir=SF) -> pd.DataFrame:
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    rows = []
    for rf, sub in li.groupby("l_returnflag"):
        sub = sub.sort_values(["l_extendedprice", "l_quantity"])
        wt = sub["l_quantity"].to_numpy()
        v = sub["l_extendedprice"].to_numpy()
        total = wt.sum()
        cw = np.cumsum(wt)
        idx = np.nonzero(cw >= total / 2.0)[0][0]
        rows.append(
            {
                "l_returnflag": rf,
                "total_weight": float(total),
                "weighted_median": float(v[idx:].min()),
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D34 — priority-mix JSD drift
# ---------------------------------------------------------------------------


@replica("orders_priority_mix_jsd")
def replica_jsd(sf_dir=SF) -> pd.DataFrame:
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    mo = o["o_orderdate"].dt.to_period("M").dt.to_timestamp()
    mc = o.groupby([mo, "o_orderpriority"]).size()
    nm = o.groupby(mo).size()
    g = o.groupby("o_orderpriority").size()
    ng = len(o)
    rows = []
    for m in nm.index:
        tq_sum = 0
        for pri in g.index:
            cc = int(mc.get((m, pri), 0))
            pp = cc / nm[m]
            qq = g[pri] / ng
            if cc > 0:
                tq_sum += tq(0.5 * pp * math.log(2.0 * pp / (pp + qq)), 1e9)
            if g[pri] > 0:
                tq_sum += tq(0.5 * qq * math.log(2.0 * qq / (pp + qq)), 1e9)
        rows.append(
            {
                "month": m,
                "n_orders": int(nm[m]),
                "jsd_nats": q6s(tq_sum / 1e9),
                "jsd_bits": q6s(tq_sum / 1e9 / math.log(2.0)),
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D36 — net revenue retention by cohort
# ---------------------------------------------------------------------------


@replica("orders_nrr_cohort")
def replica_nrr(sf_dir=SF) -> pd.DataFrame:
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    yr = o["o_orderdate"].dt.year.astype(int)
    cohort = yr.groupby(o["o_custkey"]).transform("min")
    rev = (
        pd.DataFrame({"cohort": cohort, "yr": yr, "p": o["o_totalprice"]})
        .groupby(["cohort", "yr"])["p"]
        .apply(dsum)
    )
    rows = []
    for co in sorted({c for c, _ in rev.index}):
        prev = None
        for y in sorted(y for c, y in rev.index if c == co):
            r = rev[(co, y)]
            rows.append(
                {
                    "cohort": co,
                    "yr": y,
                    "revenue": r,
                    "nrr": q6s(r / prev) if prev else np.nan,
                }
            )
            prev = r
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D32 — session entry→exit matrix (30-min gap sessionization in python)
# ---------------------------------------------------------------------------


@replica("events_entry_exit_matrix")
def replica_entry_exit(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    gap = pd.Timedelta(minutes=30)
    cells: dict[tuple[str, str], list[int]] = {}
    for _, sub in e.groupby("user_id"):
        ts = sub["ts"].to_list()
        types = sub["event_type"].to_list()
        sess: list[list[str]] = []
        for i in range(len(ts)):
            if i == 0 or ts[i] - ts[i - 1] > gap:
                sess.append([])
            sess[-1].append(types[i])
        for s in sess:
            cells.setdefault((s[0], s[-1]), []).append(len(s))
    return pd.DataFrame(
        [
            {
                "entry_type": k[0],
                "exit_type": k[1],
                "n_sessions": len(v),
                "n_events": sum(v),
                "avg_session_len": q6s(sum(v) / len(v)),
            }
            for k, v in cells.items()
        ]
    )


# ---------------------------------------------------------------------------
# D33 — JSON payload band analytics (json parsed by python's json module)
# ---------------------------------------------------------------------------

import json as _json


@replica("events_props_value_bands")
def replica_props_bands(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")

    def getk(p):
        try:
            v = _json.loads(p).get("k")
            return int(v) if v is not None else None
        except Exception:
            return None

    e = e.assign(k=e["props"].apply(getk))
    e = e[e["k"].notna()]
    e["k"] = e["k"].astype(int)
    e["k_band"] = e["k"] // 10
    rows = []
    for (et, kb), sub in e.groupby(["event_type", "k_band"]):
        rows.append(
            {
                "event_type": et,
                "k_band": kb,
                "n_events": len(sub),
                "min_k": int(sub["k"].min()),
                "max_k": int(sub["k"].max()),
                "avg_value": dsum(sub["value"]) / len(sub),
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D37 — daily max inter-event gap per type
# ---------------------------------------------------------------------------


@replica("events_daily_max_gap")
def replica_daily_max_gap(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["event_type", "ts", "event_id"]
    )
    rows = []
    for et, sub in e.groupby("event_type"):
        tsu = sub["ts"].astype("int64").to_numpy()
        days = sub["ts"].dt.normalize().to_numpy()
        gaps = np.diff(tsu)
        gday = days[1:]
        df = pd.DataFrame({"day": gday, "gap": gaps})
        for day, s in df.groupby("day"):
            mx = int(s["gap"].max())
            rows.append(
                {
                    "event_type": et,
                    "day": day,
                    "n_events": len(s),
                    "max_gap_us": mx,
                    "outage_flag": int(mx > 3600000000),
                }
            )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D35 — STL-lite daily decomposition (centered MA + dow means in numpy)
# ---------------------------------------------------------------------------


@replica("events_stl_daily_decompose")
def replica_stl(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    daily = (
        e.groupby(["event_type", e["ts"].dt.normalize()])
        .size()
        .reset_index(name="c")
        .sort_values(["event_type", "ts"])
    )
    rows = []
    for et, sub in daily.groupby("event_type"):
        c = sub["c"].to_list()
        days = sub["ts"].to_list()
        n = len(c)
        t_int = [None] * n
        for i in range(n):
            if 3 <= i <= n - 4:
                t_int[i] = int(math.trunc(sum(c[i - 3 : i + 4]) / 7.0 * 1e6 + 0.5))
        dq = [
            c[i] * 1_000_000 - t_int[i] if t_int[i] is not None else None
            for i in range(n)
        ]
        # day-of-week seasonal means over the detrended integers
        by_dow: dict[int, list[int]] = {}
        for i in range(n):
            if dq[i] is not None:
                by_dow.setdefault(days[i].weekday(), []).append(dq[i])
        s_int = {
            d: int(sum(v) / len(v) + 0.5) if sum(v) >= 0
            else int(sum(v) / len(v) + 0.5)  # trunc toward zero either way
            for d, v in by_dow.items()
        }
        for i in range(n):
            dow = days[i].weekday()
            s = s_int.get(dow)
            rows.append(
                {
                    "event_type": et,
                    "day": days[i],
                    "c": c[i],
                    "trend": t_int[i] / 1e6 if t_int[i] is not None else np.nan,
                    "seasonal": s / 1e6 if s is not None else np.nan,
                    "resid": (dq[i] - s) / 1e6
                    if (dq[i] is not None and s is not None)
                    else np.nan,
                }
            )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D115 — KM + Greenwood band (direct product + direct variance sum)
# ---------------------------------------------------------------------------


@replica("orders_km_greenwood")
def replica_km_greenwood(sf_dir=SF) -> pd.DataFrame:
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    d = o["o_orderdate"].dt.normalize()
    hi = d.max()
    durs, events = [], []
    for _, dates in d.groupby(o["o_custkey"]):
        ds = dates.sort_values().to_numpy()
        if len(ds) >= 2:
            durs.append(int((ds[1] - ds[0]) / np.timedelta64(1, "D")))
            events.append(1)
        else:
            durs.append(int((np.datetime64(hi) - ds[0]) / np.timedelta64(1, "D")))
            events.append(0)
    subj = pd.DataFrame({"dur": durs, "ev": events})
    by = (
        subj.groupby("dur")
        .agg(n_events=("ev", "sum"), n_leaving=("ev", "count"))
        .sort_index()
    )
    n_risk = by["n_leaving"][::-1].cumsum()[::-1]
    rows, s, gw_q9, dead = [], 1.0, 0, False
    for dur in by.index:
        d_i, nr = int(by.loc[dur, "n_events"]), int(n_risk.loc[dur])
        if d_i <= 0:
            continue
        if d_i == nr:
            dead = True
        if not dead:
            s *= 1.0 - d_i / nr
            gw_q9 += tq(d_i / (nr * (nr - d_i)), 1e9)
        row = {
            "duration_days": int(dur),
            "n_risk": nr,
            "n_events": d_i,
            "survival": q6s(s) if not dead else 0.0,
        }
        if dead:
            row.update(
                {"greenwood_se": np.nan, "ci_lo": np.nan, "ci_hi": np.nan}
            )
        else:
            se = s * math.sqrt(gw_q9 / 1e9)
            row.update(
                {
                    "greenwood_se": q6s(se),
                    "ci_lo": q6s(max(s - 1.96 * se, 0.0)),
                    "ci_hi": q6s(min(s + 1.96 * se, 1.0)),
                }
            )
        rows.append(row)
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# D116 — Jonckheere-Terpstra (the pairwise counts via a numpy double loop)
# ---------------------------------------------------------------------------


@replica("orders_jonckheere_terpstra")
def replica_jonckheere(sf_dir=SF) -> pd.DataFrame:
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    groups = sorted(o["o_orderpriority"].unique())
    vals = {g: np.sort(o["o_totalprice"][o["o_orderpriority"] == g].to_numpy())
            for g in groups}
    j_stat = 0.0
    for i, a in enumerate(groups):
        for b in groups[i + 1 :]:
            xa, xb = vals[a], vals[b]
            # counts via searchsorted: #(xa < y) and half #(xa == y)
            lo = np.searchsorted(xa, xb, side="left")
            hi = np.searchsorted(xa, xb, side="right")
            j_stat += float(lo.sum()) + 0.5 * float((hi - lo).sum())
    n = len(o)
    n_j = np.array([len(v) for v in vals.values()], dtype=float)
    sn2 = float((n_j * n_j).sum())
    sn23 = float((n_j * n_j * (2 * n_j + 3)).sum())
    mean_j = (n * n - sn2) / 4.0
    var_j = (n * n * (2.0 * n + 3.0) - sn23) / 72.0
    return pd.DataFrame(
        {
            "n": [n],
            "k": [len(groups)],
            "j_stat": [j_stat],
            "mean_j": [mean_j],
            "z_stat": [q6s((j_stat - mean_j) / math.sqrt(var_j))],
        }
    )


# ---------------------------------------------------------------------------
# E3/E4 — per-user EWMA (the half-life recursion run literally per row)
# ---------------------------------------------------------------------------


@replica("events_ewma_smooth")
def replica_ewma(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    rows = []
    for u, sub in e.groupby("user_id"):
        s, n = None, 0
        for _, r in sub.iterrows():
            v = r["value"]
            if not pd.isna(v):
                s = v if s is None else s / 2.0 + v
                n += 1
            rows.append(
                {
                    "user_id": u,
                    "event_id": r["event_id"],
                    "decay_sum": s if s is not None else np.nan,
                    "ewma": s / (2.0 - 2.0 ** (1 - n))
                    if s is not None
                    else np.nan,
                }
            )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# K — rolling 7-day WAU (exact distinct via python sets)
# ---------------------------------------------------------------------------


@replica("events_rolling_wau")
def replica_rolling_wau(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    day = e["ts"].dt.normalize()
    by_day = {d: set(u) for d, u in e["user_id"].groupby(day)}
    rows = []
    for d in sorted(by_day):
        active = set()
        for k in range(7):
            active |= by_day.get(d - pd.Timedelta(days=k), set())
        rows.append({"day": d, "wau": len(active)})
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# K59 — Markov transition matrix
# ---------------------------------------------------------------------------


@replica("events_markov_transitions")
def replica_markov_transitions(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    pairs: dict[tuple[str, str], int] = {}
    for _, sub in e.groupby("user_id"):
        t = sub["event_type"].to_list()
        for a, b in zip(t, t[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    tot: dict[str, int] = {}
    for (a, _), n in pairs.items():
        tot[a] = tot.get(a, 0) + n
    return pd.DataFrame(
        [
            {"prev_type": a, "next_type": b, "n": n, "p": n / tot[a]}
            for (a, b), n in pairs.items()
        ]
    )


# ---------------------------------------------------------------------------
# E/K — longest consecutive-day streak (islands walked per user)
# ---------------------------------------------------------------------------


@replica("events_longest_streak")
def replica_longest_streak(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    day = e["ts"].dt.normalize()
    rows = []
    for u, d in day.groupby(e["user_id"]):
        ds = sorted(set(d))
        best_len, best_start = 0, None
        cur_len, cur_start = 0, None
        prev = None
        for x in ds:
            if prev is not None and (x - prev) == pd.Timedelta(days=1):
                cur_len += 1
            else:
                cur_len, cur_start = 1, x
            if cur_len > best_len:
                best_len, best_start = cur_len, cur_start
            prev = x
        rows.append(
            {
                "user_id": u,
                "longest_streak": best_len,
                "streak_start": best_start,
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# K80 — retention cohort triangle
# ---------------------------------------------------------------------------


@replica("events_retention_cohorts")
def replica_retention_cohorts(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    ue = pd.DataFrame(
        {"u": e["user_id"], "day": e["ts"].dt.normalize().dt.date}
    ).drop_duplicates()
    cohort = ue.groupby("u")["day"].min()
    sizes = cohort.value_counts()
    ue["cohort"] = ue["u"].map(cohort)
    ue["off"] = ue.apply(lambda r: (r["day"] - r["cohort"]).days, axis=1)
    out = (
        ue.drop_duplicates(["cohort", "off", "u"])
        .groupby(["cohort", "off"])
        .size()
        .reset_index(name="active_users")
    )
    out["cohort_size"] = out["cohort"].map(sizes)
    return out.rename(columns={"cohort": "cohort_day", "off": "day_offset"})


# ---------------------------------------------------------------------------
# L-family — iterative graph algorithms walked in python dicts over the
# co-ship supplier graph (the oracle's coverage is unrolled CTEs — the
# SAME spelling risk class as the closed forms; these replicas iterate
# the textbook recursions independently)
# ---------------------------------------------------------------------------


def _coship_edges(sf_dir, exclude_self=True):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    inc = li[["l_suppkey", "l_partkey"]].drop_duplicates()
    by_part: dict[int, list[int]] = {}
    for s, p in zip(inc["l_suppkey"], inc["l_partkey"]):
        by_part.setdefault(p, []).append(s)
    edges = set()
    for sup in by_part.values():
        for a in sup:
            for b in sup:
                if exclude_self and a == b:
                    continue
                edges.add((a, b))
    return edges


@replica("graph_pagerank")
def replica_pagerank(sf_dir=SF) -> pd.DataFrame:
    edges = _coship_edges(sf_dir, exclude_self=True)
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    outd: dict[int, int] = {}
    for a, _ in edges:
        outd[a] = outd.get(a, 0) + 1
    n = len(nodes)
    pr = {v: 1.0 / n for v in nodes}
    for _ in range(3):
        contrib_q: dict[int, int] = {}
        for a, b in edges:
            contrib_q[b] = contrib_q.get(b, 0) + tq(pr[a] / outd[a], 1e6)
        pr = {
            v: (1.0 - 0.85) / n + 0.85 * (contrib_q.get(v, 0) / 1e6)
            for v in nodes
        }
    return pd.DataFrame(
        {"suppkey": list(pr.keys()), "pagerank": list(pr.values())}
    )


@replica("graph_components")
def replica_components(sf_dir=SF) -> pd.DataFrame:
    # true components via union-find — converged min-label == min member
    edges = _coship_edges(sf_dir, exclude_self=False)
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp_min: dict[int, int] = {}
    for v in parent:
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    return pd.DataFrame(
        [
            {"suppkey": v, "component": comp_min[find(v)]}
            for v in parent
        ]
    )


@replica("graph_triangle_count")
def replica_triangles(sf_dir=SF) -> pd.DataFrame:
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    inc = li[["l_suppkey", "l_partkey"]].drop_duplicates()
    cnt = inc.groupby("l_partkey").size()
    keep = set(cnt[cnt <= 5].index)
    by_part: dict[int, list[int]] = {}
    for s, p in zip(inc["l_suppkey"], inc["l_partkey"]):
        if p in keep:
            by_part.setdefault(p, []).append(s)
    adj: set[tuple[int, int]] = set()
    for sup in by_part.values():
        for a in sup:
            for b in sup:
                if a < b:
                    adj.add((a, b))
    nbrs: dict[int, set[int]] = {}
    for a, b in adj:
        nbrs.setdefault(a, set()).add(b)
    tri = 0
    for a, b in adj:
        tri += len(nbrs.get(a, set()) & nbrs.get(b, set()))
    return pd.DataFrame({"n_triangles": [tri]})


@replica("graph_katz_centrality")
def replica_katz(sf_dir=SF) -> pd.DataFrame:
    edges = _coship_edges(sf_dir, exclude_self=True)
    nodes = sorted({a for a, _ in edges})
    p = {v: 1 for v in nodes}
    counts = []
    for _ in range(3):
        nxt: dict[int, int] = {}
        for a, b in edges:
            if a in p:
                nxt[b] = nxt.get(b, 0) + p[a]
        counts.append(nxt)
        p = nxt
    rows = []
    for v in nodes:
        p1 = counts[0].get(v, 0)
        p2 = counts[1].get(v, 0)
        p3 = counts[2].get(v, 0)
        katz = math.trunc(
            (p1 / 10.0 + p2 / 100.0 + p3 / 1000.0) * 1e6 + 0.5
        ) / 1e6
        rows.append(
            {
                "suppkey": v,
                "paths_1": p1,
                "paths_2": p2,
                "paths_3": p3,
                "katz": katz,
            }
        )
    return pd.DataFrame(rows)


@replica("graph_bfs")
def replica_bfs(sf_dir=SF) -> pd.DataFrame:
    edges = _coship_edges(sf_dir, exclude_self=False)
    nbrs: dict[int, set[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
    depth = {0: 0}
    frontier = {0}
    for d in range(1, 4):
        nxt = set()
        for v in frontier:
            nxt |= nbrs.get(v, set())
        nxt -= set(depth)
        for v in nxt:
            depth[v] = d
        frontier = nxt
    return pd.DataFrame(
        [{"suppkey": v, "depth": d} for v, d in depth.items()]
    )


@replica("graph_kcore")
def replica_kcore(sf_dir=SF) -> pd.DataFrame:
    # thresholded adjacency: pairs sharing >= 1.05x the mean shared count
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    inc = li[["l_suppkey", "l_partkey"]].drop_duplicates()
    by_part: dict[int, list[int]] = {}
    for s, p in zip(inc["l_suppkey"], inc["l_partkey"]):
        by_part.setdefault(p, []).append(s)
    shared: dict[tuple[int, int], int] = {}
    for sup in by_part.values():
        for a in sup:
            for b in sup:
                if a != b:
                    shared[(a, b)] = shared.get((a, b), 0) + 1
    thr = (sum(shared.values()) / len(shared)) * 1.05
    edges = {e for e, c in shared.items() if c >= thr}
    # peel: 4 fixed rounds of drop-degree-below-16
    for _ in range(4):
        deg: dict[int, int] = {}
        for a, _b in edges:
            deg[a] = deg.get(a, 0) + 1
        keep = {v for v, d in deg.items() if d >= 16}
        edges = {(a, b) for a, b in edges if a in keep and b in keep}
    deg = {}
    for a, _b in edges:
        deg[a] = deg.get(a, 0) + 1
    return pd.DataFrame(
        [{"suppkey": v, "core_degree": d} for v, d in deg.items()],
        columns=["suppkey", "core_degree"],  # empty core at small SF
    )


@replica("graph_sssp_weighted")
def replica_sssp(sf_dir=SF) -> pd.DataFrame:
    edges = _coship_edges(sf_dir, exclude_self=True)
    w = {(a, b): 1 + (a * 7 + b * 13) % 5 for a, b in edges}
    dist = {0: 0}
    for _ in range(4):
        nxt = dict(dist)
        for (a, b), wt in w.items():
            if a in dist:
                cand = dist[a] + wt
                if b not in nxt or cand < nxt[b]:
                    nxt[b] = cand
        dist = nxt
    return pd.DataFrame(
        [{"suppkey": v, "dist": d} for v, d in dist.items()]
    )


def _thresholded_edges(sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    inc = li[["l_suppkey", "l_partkey"]].drop_duplicates()
    by_part: dict[int, list[int]] = {}
    for s, p in zip(inc["l_suppkey"], inc["l_partkey"]):
        by_part.setdefault(p, []).append(s)
    shared: dict[tuple[int, int], int] = {}
    for sup in by_part.values():
        for a in sup:
            for b in sup:
                if a != b:
                    shared[(a, b)] = shared.get((a, b), 0) + 1
    thr = (sum(shared.values()) / len(shared)) * 1.05
    return {e for e, c in shared.items() if c >= thr}


@replica("graph_assortativity")
def replica_assortativity(sf_dir=SF) -> pd.DataFrame:
    edges = _thresholded_edges(sf_dir)
    deg: dict[int, int] = {}
    for a, _b in edges:
        deg[a] = deg.get(a, 0) + 1
    xs = np.array([deg[a] for a, _ in edges], dtype=float)
    ys = np.array([deg[b] for _, b in edges], dtype=float)
    n = len(xs)
    sx, sy = xs.sum(), ys.sum()
    sxy = (xs * ys).sum()
    sxx, syy = (xs * xs).sum(), (ys * ys).sum()
    den = math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
    r = q6s((n * sxy - sx * sy) / den) if den else np.nan
    return pd.DataFrame(
        {
            "n_directed_edges": [n],
            "assortativity": [r],
        }
    )


@replica("graph_label_propagation")
def replica_label_prop(sf_dir=SF) -> pd.DataFrame:
    edges = _coship_edges(sf_dir, exclude_self=True)
    nodes = sorted({a for a, _ in edges})
    labels = {v: v for v in nodes}
    # incoming neighbors of nd are all a with (a, nd) in edges
    inc: dict[int, list[int]] = {}
    for a, b in edges:
        inc.setdefault(b, []).append(a)
    for _ in range(2):
        nxt = {}
        for nd, srcs in inc.items():
            counts: dict[int, int] = {}
            for a in srcs:
                lb = labels[a]
                counts[lb] = counts.get(lb, 0) + 1
            # most frequent; ties -> smallest label
            best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            nxt[nd] = best
        labels = nxt
    return pd.DataFrame(
        [{"node": v, "community": lb} for v, lb in labels.items()]
    )


@replica("graph_modularity")
def replica_modularity(sf_dir=SF) -> pd.DataFrame:
    edges = _coship_edges(sf_dir, exclude_self=True)
    sup = pd.read_parquet(f"{sf_dir}/supplier.parquet")
    nat = dict(zip(sup["s_suppkey"], sup["s_nationkey"]))
    per: dict[int, dict[str, int]] = {}
    for a, b in edges:
        c1, c2 = nat[a], nat[b]
        s = per.setdefault(c1, {"internal": 0, "deg": 0})
        s["deg"] += 1
        if c1 == c2:
            s["internal"] += 1
    m2 = sum(s["deg"] for s in per.values())
    rows = []
    for c, s in per.items():
        q = s["internal"] / m2 - (s["deg"] / m2) ** 2
        rows.append(
            {
                "nationkey": c,
                "internal_edges": s["internal"],
                "degree_sum": s["deg"],
                "q_contrib": int(q * 1e6 + 0.5) / 1e6,
            }
        )
    # the telescoping law: sum(degree_sum) == 2m exactly
    assert sum(r["degree_sum"] for r in rows) == m2
    return pd.DataFrame(rows)


@replica("graph_landmark_distances")
def replica_landmarks(sf_dir=SF) -> pd.DataFrame:
    edges = _coship_edges(sf_dir, exclude_self=True)
    rows = []
    for lm in (0, 1, 2, 3):
        dist = {lm: 0}
        for _ in range(3):
            nxt = dict(dist)
            for a, b in edges:
                if a in dist:
                    cand = dist[a] + 1
                    if b not in nxt or cand < nxt[b]:
                        nxt[b] = cand
            dist = nxt
        for v, d in dist.items():
            rows.append({"landmark": lm, "suppkey": v, "dist": d})
    df = pd.DataFrame(rows)
    # triangle-inequality spot law on the sketch itself
    for lm in (0, 1):
        sub = df[df["landmark"] == lm].set_index("suppkey")["dist"]
        assert (sub >= 0).all()
    return df


@replica("graph_closeness_landmarks")
def replica_closeness(sf_dir=SF) -> pd.DataFrame:
    lm_df = replica_landmarks(sf_dir)
    rows = []
    for v, sub in lm_df.groupby("suppkey"):
        if len(sub) < 4:
            continue  # needs a distance from ALL landmarks
        sd = int(sub["dist"].sum())
        rows.append(
            {
                "suppkey": v,
                "sum_dist": sd,
                "closeness_est": math.trunc(
                    (4.0 / sd) * 1e6 + 0.5
                ) / 1e6
                if sd
                else np.nan,
            }
        )
    return pd.DataFrame(rows)


@replica("graph_clustering_coefficient")
def replica_clustering(sf_dir=SF) -> pd.DataFrame:
    edges = _thresholded_edges(sf_dir)
    nbrs: dict[int, set[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
    rows = []
    for v, nv in nbrs.items():
        d = len(nv)
        # directed closed-wedge count: ordered pairs (a, b) of neighbors
        # that are themselves connected
        n_closed = sum(len(nbrs.get(a, set()) & nv) for a in nv)
        coeff = (
            int(n_closed / (d * (d - 1)) * 1e6 + 0.5) / 1e6 if d >= 2 else 0.0
        )
        rows.append(
            {
                "suppkey": v,
                "degree": d,
                "n_triangles": n_closed // 2,
                "clustering_coeff": coeff,
            }
        )
    return pd.DataFrame(rows)


@replica("graph_two_hop_reach")
def replica_two_hop(sf_dir=SF) -> pd.DataFrame:
    edges = _thresholded_edges(sf_dir)
    nbrs: dict[int, set[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
    rows = []
    for v, nv in nbrs.items():
        ball = set(nv)
        for a in nv:
            ball |= nbrs.get(a, set())
        ball.discard(v)
        rows.append({"suppkey": v, "reach_2hop": len(ball)})
    return pd.DataFrame(rows)


@replica("graph_rich_club")
def replica_rich_club(sf_dir=SF) -> pd.DataFrame:
    edges = _coship_edges(sf_dir, exclude_self=True)
    deg: dict[int, int] = {}
    for a, _b in edges:
        deg[a] = deg.get(a, 0) + 1
    rows = []
    for k in (2, 4, 8, 16, 32, 64):
        club = {v for v, d in deg.items() if d > k}
        n = len(club)
        e = sum(1 for a, b in edges if min(deg[a], deg[b]) > k)
        phi = int(e / (n * (n - 1)) * 1e6 + 0.5) / 1e6 if n > 1 else np.nan
        rows.append({"k": k, "n_nodes": n, "n_edges": e, "phi": phi})
    return pd.DataFrame(rows)


@replica("graph_hits")
def replica_hits(sf_dir=SF) -> pd.DataFrame:
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    inc = li[["l_suppkey", "l_partkey"]].drop_duplicates()
    pairs = list(zip(inc["l_suppkey"], inc["l_partkey"]))
    sups = sorted({s for s, _ in pairs})
    h = {s: 1.0 for s in sups}
    for _ in range(4):
        araw: dict[int, int] = {}
        for s, p in pairs:
            araw[p] = araw.get(p, 0) + tq(h[s], 1e6)
        asum = sum(tq(c / 1e6, 1e6) for c in araw.values()) / 1e6
        a = {p: (c / 1e6) / asum for p, c in araw.items()}
        hraw: dict[int, int] = {}
        for s, p in pairs:
            hraw[s] = hraw.get(s, 0) + tq(a[p], 1e6)
        hsum = sum(tq(c / 1e6, 1e6) for c in hraw.values()) / 1e6
        h = {s: (c / 1e6) / hsum for s, c in hraw.items()}
    return pd.DataFrame(
        [
            {"suppkey": s, "hub": int(v * 1e6 + 0.5) / 1e6}
            for s, v in h.items()
        ]
    )


@replica("graph_adamic_adar")
def replica_adamic_adar(sf_dir=SF) -> pd.DataFrame:
    edges = _thresholded_edges(sf_dir)
    nbrs: dict[int, set[int]] = {}
    deg: dict[int, int] = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        deg[a] = deg.get(a, 0) + 1
    scores: dict[tuple[int, int], list[int]] = {}
    for z, nz in nbrs.items():
        if deg[z] < 2:
            continue  # can't be a COMMON neighbor (and ln(1) = 0)
        c_q6 = int(1.0 / math.log(deg[z]) * 1e6 + 0.5)
        for a in nz:
            for b in nz:
                if a < b and (a, b) not in edges:
                    s = scores.setdefault((a, b), [0, 0])
                    s[0] += 1
                    s[1] += c_q6
    ranked = sorted(
        scores.items(), key=lambda kv: (-kv[1][1], kv[0][0], kv[0][1])
    )[:20]
    return pd.DataFrame(
        [
            {
                "suppkey_a": a,
                "suppkey_b": b,
                "common_neighbors": cn,
                "adamic_adar": q / 1e6,
                "rank": i + 1,
            }
            for i, ((a, b), (cn, q)) in enumerate(ranked)
        ],
        columns=[
            "suppkey_a", "suppkey_b", "common_neighbors", "adamic_adar",
            "rank",
        ],  # empty candidate set at tiny SF
    )


@replica("graph_diameter_doublesweep")
def replica_doublesweep(sf_dir=SF) -> pd.DataFrame:
    edges = _coship_edges(sf_dir, exclude_self=False)
    nbrs: dict[int, set[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)

    def sweep(start):
        depth = {start: 0}
        frontier = {start}
        for d in range(1, 7):
            nxt = set()
            for v in frontier:
                nxt |= nbrs.get(v, set())
            nxt -= set(depth)
            for v in nxt:
                depth[v] = d
            frontier = nxt
        return depth

    lev1 = sweep(0)
    ecc1 = max(lev1.values())
    u = min(v for v, d in lev1.items() if d == ecc1)
    lev2 = sweep(u)
    return pd.DataFrame(
        {
            "start_node": [0],
            "sweep1_ecc": [ecc1],
            "u_node": [u],
            "diameter_lb": [max(lev2.values())],
            "n_reached": [len(lev2)],
        }
    )


# ---------------------------------------------------------------------------
# K3/K6 — vector ops (left-fold accumulation mirrored: the engines fold
# float32->float64 casts left-to-right; numpy's pairwise sum would NOT
# match bitwise, a plain python loop does)
# ---------------------------------------------------------------------------


def _fold_dot(a, b):
    s = 0.0
    for x, y in zip(a, b):
        s += float(x) * float(y)
    return s


def _fold_norm(a):
    s = 0.0
    for x in a:
        s += float(x) * float(x)
    return math.sqrt(s)


@replica("llm_vec_norm")
def replica_vec_norm(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    rows = []
    for _, r in e.iterrows():
        nrm = _fold_norm(r["embedding"])
        rows.append(
            {
                "vec_id": r["vec_id"],
                "label": r["label"],
                "l2_norm": nrm,
                "unit_dim0": float(r["embedding"][0]) / nrm
                if nrm
                else np.nan,
            }
        )
    return pd.DataFrame(rows)


@replica("llm_sim_topk")
def replica_sim_topk(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = dict(zip(e["vec_id"], e["embedding"]))
    norms = {v: _fold_norm(x) for v, x in vecs.items()}
    rows = []
    for qid in sorted(v for v in vecs if v < 3):
        scored = []
        for vid, emb in vecs.items():
            if vid == qid:
                continue
            den = norms[qid] * norms[vid]
            cos = _fold_dot(vecs[qid], emb) / den if den else np.nan
            scored.append((cos, vid))
        scored.sort(key=lambda t: (-t[0], t[1]))
        for cos, vid in scored[:5]:
            rows.append({"query_id": qid, "vec_id": vid, "cosine": cos})
    return pd.DataFrame(rows)


@replica("ann_hamming_topk")
def replica_hamming_topk(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/embeddings.parquet")

    def pack(emb):
        q1 = sum(1 << i for i in range(32) if float(emb[i]) > 0.0)
        q2 = sum(1 << i for i in range(32) if float(emb[i + 32]) > 0.0)
        return q1, q2

    sigs = {r["vec_id"]: pack(r["embedding"]) for _, r in e.iterrows()}
    rows = []
    for qid in sorted(v for v in sigs if v < 3):
        q1, q2 = sigs[qid]
        scored = []
        for vid, (h1, h2) in sigs.items():
            if vid == qid:
                continue
            ham = bin(q1 ^ h1).count("1") + bin(q2 ^ h2).count("1")
            scored.append((ham, vid))
        scored.sort()
        for ham, vid in scored[:5]:
            rows.append({"query_id": qid, "vec_id": vid, "hamming": ham})
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# K1/K2 — dedup family (hashlib digests, python set Jaccard)
# ---------------------------------------------------------------------------

import hashlib as _hashlib


@replica("llm_dedup_exact")
def replica_dedup_exact(sf_dir=SF) -> pd.DataFrame:
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    groups: dict[str, list[int]] = {}
    for _, r in d.iterrows():
        h = _hashlib.sha256(r["text"].encode()).hexdigest()
        groups.setdefault(h, []).append(r["doc_id"])
    return pd.DataFrame(
        [
            {"text_sha": h, "rep_id": min(ids), "n_copies": len(ids)}
            for h, ids in groups.items()
        ]
    )


@replica("llm_ngram_jaccard")
def replica_ngram_jaccard(sf_dir=SF) -> pd.DataFrame:
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    sh = {}
    src = {}
    for _, r in d.iterrows():
        w = _pywords(r["text"]) if isinstance(r["text"], str) else []
        sh[r["doc_id"]] = {
            " ".join(w[i : i + 3]) for i in range(len(w) - 2)
        }
        src[r["doc_id"]] = r["source"]
    ids = sorted(sh)
    rows = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if b - a > 20:
                break
            if src[a] != src[b]:
                continue
            inter = len(sh[a] & sh[b])
            union = len(sh[a]) + len(sh[b]) - inter
            if union > 0 and inter * 10 >= union:
                rows.append(
                    {"doc_a": a, "doc_b": b, "jaccard": inter / union}
                )
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])


# ---------------------------------------------------------------------------
# TPC-H Q1 — the headline pricing summary, recomputed in numpy
# ---------------------------------------------------------------------------


@replica("tpch_q1_pricing_summary")
def replica_tpch_q1(sf_dir=SF) -> pd.DataFrame:
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    li = li[li["l_shipdate"] <= pd.Timestamp("2000-12-01")]
    rows = []
    for (rf, ls), sub in li.groupby(["l_returnflag", "l_linestatus"]):
        q = sub["l_quantity"].to_numpy()
        p = sub["l_extendedprice"].to_numpy()
        dc = sub["l_discount"].to_numpy()
        tx = sub["l_tax"].to_numpy()
        disc = p * (1 - dc)
        n = len(sub)
        rows.append(
            {
                "l_returnflag": rf,
                "l_linestatus": ls,
                "sum_qty": dsum(q),
                "sum_base_price": dsum(p),
                "sum_disc_price": dsum(disc),
                "sum_charge_h": dsum(disc * (1 + tx) / 100.0),
                "avg_qty": dsum(q) / n,
                "avg_price": dsum(p) / n,
                "avg_disc": dsum(dc) / n,
                "count_order": n,
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# I2 — tumbling window (the streaming family's batch form)
# ---------------------------------------------------------------------------


@replica("stream_tumbling_window")
def replica_tumbling(sf_dir=SF) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    start = e["ts"].dt.floor("10min")
    rows = []
    for ws, sub in e.groupby(start):
        rows.append(
            {
                "win_start": ws,
                "win_end": ws + pd.Timedelta(minutes=10),
                "n_events": len(sub),
                "sum_value": dsum(sub["value"].dropna()),
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# K4/K5 — rolling fingerprint + multimodal metadata
# ---------------------------------------------------------------------------


@replica("llm_fingerprint")
def replica_fingerprint(sf_dir=SF) -> pd.DataFrame:
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    rows = []
    for _, r in d.iterrows():
        acc = 0
        for w in r["text"].split(" "):  # the oracle's single-space split
            c = (ord(w[0]) if w else 0) * 31 + len(w)
            acc = (acc * 131 + c) % 1000000007
        rows.append({"doc_id": r["doc_id"], "fingerprint": acc})
    return pd.DataFrame(rows)


@replica("llm_multimodal_meta")
def replica_multimodal_meta(sf_dir=SF) -> pd.DataFrame:
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    rows = []
    for _, r in d.iterrows():
        raw = r["text"].encode()
        rows.append(
            {
                "doc_id": r["doc_id"],
                "byte_len": len(raw),
                "content_sha": _hashlib.sha256(raw).hexdigest(),
            }
        )
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# the parameterized full-fixture check
# ---------------------------------------------------------------------------


# entries whose sf0.001 fixture degenerates (single stratum / empty cells)
# check at sf0.01 so the formula actually exercises
SF_MED = "/root/testdata/sf0.01"
SF_OVERRIDE = {
    "events_cmh_test": SF_MED,
    "graph_kcore": SF_MED,  # the k=16 core is empty at sf0.001
    "graph_adamic_adar": SF_MED,  # no non-adjacent wedge pairs at sf0.001
    "llm_ngram_jaccard": SF_MED,  # no >= 0.1 candidate pairs at sf0.001
}


@pytest.mark.parametrize("name", sorted(REPLICAS))
def test_replica_agrees_at_sf0001(spark, name):
    sf_dir = SF_OVERRIDE.get(name, SF)
    exp = REPLICAS[name](sf_dir)
    got = SPECS[name].builder(spark, sf_dir).toPandas()
    assert_frames_agree(got, exp)
