"""[EXT] Estimation-at-scale & corpus-hygiene operators (round-10 wave):
resampling inference (bag-of-little-bootstraps CI D83), population estimation
(Chapman capture-recapture D84), censored-cohort completion (chain-ladder
D85), hierarchical shrinkage (beta-binomial empirical Bayes D86), panel
econometrics (within fixed-effects estimator D87), preference aggregation
(Bradley-Terry source ranking K135 — the RLHF eval primitive), corpus
hygiene screens (code-vs-prose K136, mojibake/encoding-artifact audit K137),
and smoothed language modeling (interpolated Kneser-Ney bigrams K138).

Reference scope note: the reference (ksql.js) delegates all SQL to AlaSQL and
has none of these; they follow SURVEY.md §2's [EXT] mandate (training-data
pipeline operators as first-class components).

Determinism: every double goes through the house 1e-6 quantization
(registry.dsum / trunc-half-up) so Spark and DuckDB agree bit-for-bit
regardless of partition order; hash-derived pseudo-randomness is the Knuth
multiplicative LCG spelled identically in both engines (the K22/K43
curation.py device), never engine hash functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ksql_spark.operators import text
from ksql_spark.operators.scale import pin
from ksql_spark.registry import dsum, dsum_wide, query, sql_dsum
from ksql_spark.tables import load


def _q6(c):
    """Scalar 1e-6 quantization, house spelling (trunc-toward-zero of
    x*1e6+0.5 — identical in Spark's double→long cast and DuckDB's
    CAST(trunc(...) AS BIGINT))."""
    return (c * F.lit(1000000.0) + F.lit(0.5)).cast("long") / F.lit(1000000.0)


def _sql_q6(expr: str) -> str:
    return f"CAST(trunc(({expr}) * 1000000 + 0.5) AS BIGINT) / 1000000.0"


# ---------------------------------------------------------------------------
# D83 — bag of little bootstraps CI for the mean
# ---------------------------------------------------------------------------

_BLB_S = 8  # disjoint hash subsets ("little bags")
_BLB_R = 40  # bootstrap replicates per subset


@query(
    "events_blb_mean_ci",
    oracle=f"""
    WITH e AS (
        SELECT value AS x, event_id,
               (((event_id % 2147483648) * 2654435761) % 4294967296)
                   % {_BLB_S} AS su
        FROM events WHERE value IS NOT NULL
    ),
    w AS (
        SELECT su, rep,
               -ln((((((event_id % 2147483648) * {_BLB_R} + rep)
                      % 2147483648) * 2654435761) % 4294967296 + 0.5)
                   / 4294967296.0) AS wt,
               x
        FROM (SELECT *, unnest(range(0, {_BLB_R})) AS rep FROM e)
    ),
    repmeans AS (
        SELECT su, rep,
               {_sql_q6(f"({sql_dsum('wt * x')}) / ({sql_dsum('wt')})")}
                   AS rep_mean
        FROM w GROUP BY su, rep
    ),
    ranked AS (
        SELECT su, rep_mean,
               row_number() OVER (PARTITION BY su ORDER BY rep_mean, rep)
                   AS rn
        FROM repmeans
    ),
    band AS (
        SELECT su, MAX(CASE WHEN rn = 2 THEN rep_mean END) AS lo,
               MAX(CASE WHEN rn = {_BLB_R - 1} THEN rep_mean END) AS hi
        FROM ranked GROUP BY su
    ),
    sub AS (
        SELECT su, CAST(COUNT(*) AS BIGINT) AS b, {sql_dsum('x')} AS sx
        FROM e GROUP BY su
    ),
    tot AS (
        SELECT CAST(SUM(b) AS BIGINT) AS n, {sql_dsum('sx')} AS gx FROM sub
    ),
    adj AS (
        SELECT s.su,
               {_sql_q6('(s.sx / s.b) - ((s.sx / s.b) - band.lo)'
                        ' * sqrt(CAST(s.b AS DOUBLE) / tot.n)')} AS adj_lo,
               {_sql_q6('(s.sx / s.b) + (band.hi - (s.sx / s.b))'
                        ' * sqrt(CAST(s.b AS DOUBLE) / tot.n)')} AS adj_hi
        FROM sub s JOIN band ON band.su = s.su CROSS JOIN tot
    )
    SELECT tot.n AS n_events,
           CAST({_BLB_S} AS INT) AS n_subsets,
           CAST({_BLB_R} AS INT) AS n_replicates,
           {_sql_q6('tot.gx / tot.n')} AS mean_value,
           {_sql_q6(f"({sql_dsum('adj_lo')}) / {_BLB_S}.0")} AS ci_lo,
           {_sql_q6(f"({sql_dsum('adj_hi')}) / {_BLB_S}.0")} AS ci_hi
    FROM adj CROSS JOIN tot GROUP BY tot.n, tot.gx
    """,
    ref="SURVEY §2 D83 [EXT] (bag of little bootstraps: s=8 disjoint hash "
    "subsets, r=40 Bayesian-bootstrap replicates per subset with "
    "w=-ln(U) Dirichlet weights (Rubin 1981), per-subset (2nd,39th) "
    "order-statistic band rescaled by sqrt(b/n) — the b-out-of-n "
    "correction — then averaged across bags (Kleiner et al. 2014); "
    "the only shuffle carries s*r partial sums)",
)
def events_blb_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-of-little-bootstraps confidence interval for the mean event
    value: the resampling CI you can actually run on 100 TB, where a
    classic bootstrap would re-materialize the corpus r times.

    Model: s=8 disjoint subsets by Knuth-LCG hash of event_id; within each
    subset r=40 Bayesian-bootstrap replicates (Rubin 1981: per-(row, rep)
    weight w = -ln(U), U a per-(row, rep) LCG uniform — a Dirichlet-weighted
    mean, smoother than multinomial counts and fully deterministic); the
    (2nd, 39th) order statistics of the 40 replicate means form a 92.5%
    percentile band, whose half-widths are rescaled by sqrt(b/n) (the
    b-out-of-n correction, Kleiner et al. 2014 §3) and averaged across
    bags (the BLB outer average).

    Scale shape: one corpus scan exploded x40 map-side, collapsed by
    partial aggregation into s*r = 320 groups (the shuffle carries 320
    partial-sum rows per task, never the corpus); the rank window runs on
    the bounded 320-row replicate table; subset/total stats come from a
    second column-pruned scan (two scans total, both reading only
    (event_id, value) — cheaper than materializing the x40 explosion).
    Every weight addend is 1e-6-quantized before the exact long sum
    (dsum), so replicate means are bit-identical across engines and
    partition orders."""
    e = (
        load(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            F.col("value").alias("x"),
            "event_id",
            (
                ((F.col("event_id") % F.lit(2147483648)) * F.lit(2654435761))
                % F.lit(4294967296)
                % F.lit(_BLB_S)
            ).alias("su"),
        )
    )
    # per-(subset, rep) Dirichlet-weighted sums: explode is map-side only;
    # partial agg collapses to s*r groups before the exchange
    h = (
        (
            (F.col("event_id") % F.lit(2147483648)) * F.lit(_BLB_R)
            + F.col("rep")
        )
        % F.lit(2147483648)
        * F.lit(2654435761)
    ) % F.lit(4294967296)
    wt = -F.log((h.cast("double") + F.lit(0.5)) / F.lit(4294967296.0))
    repmeans = (
        e.select("su", "x", "event_id", F.explode(F.sequence(F.lit(0), F.lit(_BLB_R - 1))).alias("rep"))
        .select("su", "rep", wt.alias("wt"), "x")
        .groupBy("su", "rep")
        .agg(
            # value-weighted sums are corpus-proportional: wide accumulator
            _q6(dsum_wide(F.col("wt") * F.col("x")) / dsum_wide("wt")).alias(
                "rep_mean"
            )
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("su").orderBy("rep_mean", "rep")
    )
    band = (
        repmeans.select("su", "rep_mean", rn.alias("rn"))
        .groupBy("su")
        .agg(
            F.max(F.when(F.col("rn") == 2, F.col("rep_mean"))).alias("lo"),
            F.max(
                F.when(F.col("rn") == _BLB_R - 1, F.col("rep_mean"))
            ).alias("hi"),
        )
    )
    sub = e.groupBy("su").agg(
        F.count(F.lit(1)).cast("bigint").alias("b"), dsum_wide("x").alias("sx")
    ).transform(pin, eager=False)
    tot = sub.agg(
        F.sum("b").cast("bigint").alias("n"), dsum("sx").alias("gx")
    )
    m_s = F.col("sx") / F.col("b")
    scale_s = F.sqrt(F.col("b").cast("double") / F.col("n"))
    adj = (
        sub.join(band, "su")
        .crossJoin(F.broadcast(tot))
        .select(
            _q6(m_s - (m_s - F.col("lo")) * scale_s).alias("adj_lo"),
            _q6(m_s + (F.col("hi") - m_s) * scale_s).alias("adj_hi"),
        )
    )
    return (
        adj.agg(
            _q6(dsum("adj_lo") / F.lit(float(_BLB_S))).alias("ci_lo"),
            _q6(dsum("adj_hi") / F.lit(float(_BLB_S))).alias("ci_hi"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("n").alias("n_events"),
            F.lit(_BLB_S).cast("int").alias("n_subsets"),
            F.lit(_BLB_R).cast("int").alias("n_replicates"),
            _q6(F.col("gx") / F.col("n")).alias("mean_value"),
            "ci_lo",
            "ci_hi",
        )
    )


# ---------------------------------------------------------------------------
# D84 — Chapman capture-recapture population estimate
# ---------------------------------------------------------------------------

@query(
    "events_capture_recapture",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS in1,
               MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS in2
        FROM events GROUP BY user_id
    ),
    cells AS (
        SELECT CAST(SUM(in1) AS BIGINT) AS n1,
               CAST(SUM(in2) AS BIGINT) AS n2,
               CAST(SUM(in1 * in2) AS BIGINT) AS m,
               CAST(COUNT(*) AS BIGINT) AS n_universe
        FROM per_user
    )
    SELECT n1 AS n_view, n2 AS n_click, m AS n_both, n_universe,
           {_sql_q6('(n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0')}
               AS n_chapman,
           {_sql_q6('sqrt((n1 + 1.0) * (n2 + 1.0) * (n1 - m) * (n2 - m)'
                    ' / ((m + 1.0) * (m + 1.0) * (m + 2.0)))')} AS se,
           {_sql_q6('(n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0'
                    ' - 1.96 * sqrt((n1 + 1.0) * (n2 + 1.0) * (n1 - m)'
                    ' * (n2 - m) / ((m + 1.0) * (m + 1.0) * (m + 2.0)))')}
               AS ci_lo,
           {_sql_q6('(n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0'
                    ' + 1.96 * sqrt((n1 + 1.0) * (n2 + 1.0) * (n1 - m)'
                    ' * (n2 - m) / ((m + 1.0) * (m + 1.0) * (m + 2.0)))')}
               AS ci_hi
    FROM cells
    """,
    ref="SURVEY §2 D84 [EXT] (Chapman capture-recapture: the bias-corrected "
    "Lincoln-Petersen estimate N = (n1+1)(n2+1)/(m+1) - 1 of total "
    "population from two overlapping sightings — 'view' and 'click' "
    "audiences as the two capture occasions, Seber variance CI; one "
    "user-keyed flag agg then a 1-row cell rollup)",
)
def events_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chapman estimator of the total user population from two capture
    occasions (users seen in 'view' vs 'click' events): the mark-recapture
    estimate ecology/epidemiology uses when the universe can't be
    enumerated — here checkable against the enumerated n_universe, which
    the estimate should cover when the two occasions are independent.

    Scale shape: one user-keyed aggregation (map-side partial) to per-user
    capture flags, then a 1-row rollup; the Chapman point estimate, Seber
    (1970) variance, and the 1.96 normal band are closed-form scalar math
    on exact BIGINT cells. m+1 and m+2 are never zero, so the chain is
    total without guards."""
    per_user = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "view", 1).otherwise(0)
            ).alias("in1"),
            F.max(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("in2"),
        )
    )
    cells = per_user.agg(
        F.sum("in1").cast("bigint").alias("n1"),
        F.sum("in2").cast("bigint").alias("n2"),
        F.sum(F.col("in1") * F.col("in2")).cast("bigint").alias("m"),
        F.count(F.lit(1)).cast("bigint").alias("n_universe"),
    )
    n1, n2, m = (
        F.col("n1").cast("double"),
        F.col("n2").cast("double"),
        F.col("m").cast("double"),
    )
    chapman = (n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0
    se = F.sqrt(
        (n1 + 1.0)
        * (n2 + 1.0)
        * (n1 - m)
        * (n2 - m)
        / ((m + 1.0) * (m + 1.0) * (m + 2.0))
    )
    return cells.select(
        F.col("n1").alias("n_view"),
        F.col("n2").alias("n_click"),
        F.col("m").alias("n_both"),
        "n_universe",
        _q6(chapman).alias("n_chapman"),
        _q6(se).alias("se"),
        _q6(chapman - 1.96 * se).alias("ci_lo"),
        _q6(chapman + 1.96 * se).alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# D86 — beta-binomial empirical-Bayes shrinkage
# ---------------------------------------------------------------------------

@query(
    "events_eb_shrinkage",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS x,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   * 1.0 / COUNT(*) AS raw
        FROM events GROUP BY user_id
    ),
    prior AS (
        SELECT ({sql_dsum('raw')}) / COUNT(*) AS mu,
               ({sql_dsum('raw * raw')}) / COUNT(*)
                   - (({sql_dsum('raw')}) / COUNT(*))
                   * (({sql_dsum('raw')}) / COUNT(*)) AS v
        FROM per_user
    ),
    ab AS (
        SELECT CASE WHEN v > 0.000000000001
                         AND mu * (1.0 - mu) / v - 1.0 > 0
                    THEN mu * (mu * (1.0 - mu) / v - 1.0) ELSE 0.0 END AS a,
               CASE WHEN v > 0.000000000001
                         AND mu * (1.0 - mu) / v - 1.0 > 0
                    THEN (1.0 - mu) * (mu * (1.0 - mu) / v - 1.0)
                    ELSE 0.0 END AS b
        FROM prior
    )
    SELECT user_id, n AS n_events, x AS n_purchases,
           {_sql_q6('raw')} AS raw_rate,
           {_sql_q6('(x + a) / (n + a + b)')} AS shrunk_rate
    FROM per_user CROSS JOIN ab
    """,
    ref="SURVEY §2 D86 [EXT] (beta-binomial empirical Bayes: "
    "method-of-moments Beta prior fitted from the across-user rate "
    "moments, per-user posterior-mean rate (x+a)/(n+a+b) — the "
    "James-Stein-style shrinkage that stops low-n users from topping "
    "rate leaderboards; two aggs plus one broadcast 1-row prior)",
)
def events_eb_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user purchase-rate shrinkage toward the corpus prior: fit a
    Beta(a, b) by method of moments on the across-user raw rates
    (kappa = mu(1-mu)/v - 1; a = mu*kappa, b = (1-mu)*kappa), then report
    each user's posterior mean (x+a)/(n+a+b). Degenerate corpora (zero
    across-user variance, or moments outside the Beta-representable
    region kappa <= 0) fall back to a = b = 0, i.e. no shrinkage —
    spelled identically in both engines.

    Scale shape: one user-keyed aggregation (map-side partial) to the
    SF-proportional per-user table, pinned once; the prior is a 1-row
    aggregate of that table broadcast back onto it. Rate moments go
    through dsum so the fitted prior is bit-identical across partition
    orders; raw/n divisions are single IEEE ops shared by both engines."""
    per_user = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("x"),
        )
        .select(
            "user_id",
            "n",
            "x",
            (F.col("x").cast("double") / F.col("n")).alias("raw"),
        )
        .transform(pin, eager=False)
    )
    mu = dsum("raw") / F.count(F.lit(1))
    prior = per_user.agg(
        mu.alias("mu"),
        (dsum(F.col("raw") * F.col("raw")) / F.count(F.lit(1))).alias("rr"),
    ).select("mu", (F.col("rr") - F.col("mu") * F.col("mu")).alias("v"))
    kappa = F.col("mu") * (1.0 - F.col("mu")) / F.col("v") - 1.0
    ok = (F.col("v") > 1e-12) & (kappa > 0)
    ab = prior.select(
        F.when(ok, F.col("mu") * kappa).otherwise(0.0).alias("a"),
        F.when(ok, (1.0 - F.col("mu")) * kappa).otherwise(0.0).alias("b"),
    )
    return per_user.crossJoin(F.broadcast(ab)).select(
        "user_id",
        F.col("n").alias("n_events"),
        F.col("x").alias("n_purchases"),
        _q6(F.col("raw")).alias("raw_rate"),
        _q6(
            (F.col("x") + F.col("a"))
            / (F.col("n") + F.col("a") + F.col("b"))
        ).alias("shrunk_rate"),
    )


# ---------------------------------------------------------------------------
# D87 — panel fixed-effects (within) estimator
# ---------------------------------------------------------------------------

@query(
    "orders_panel_within_ols",
    oracle=f"""
    WITH ob AS (
        SELECT o.o_custkey AS c, o.o_totalprice AS y,
               CAST(lc.x AS DOUBLE) AS x
        FROM orders o
        JOIN (SELECT l_orderkey, COUNT(*) AS x
              FROM lineitem GROUP BY l_orderkey) lc
          ON lc.l_orderkey = o.o_orderkey
    ),
    cm AS (
        SELECT c, ({sql_dsum('x')}) / COUNT(*) AS mx,
               ({sql_dsum('y')}) / COUNT(*) AS my
        FROM ob GROUP BY c
    ),
    g AS (
        SELECT ({sql_dsum('x')}) / COUNT(*) AS gx,
               ({sql_dsum('y')}) / COUNT(*) AS gy
        FROM ob
    ),
    mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(COUNT(DISTINCT ob.c) AS BIGINT) AS n_entities,
               {sql_dsum('(ob.x - cm.mx) * (ob.x - cm.mx)')} AS sxx_w,
               {sql_dsum('(ob.x - cm.mx) * (ob.y - cm.my)')} AS sxy_w,
               {sql_dsum('(ob.y - cm.my) * (ob.y - cm.my)')} AS syy_w,
               {sql_dsum('(ob.x - g.gx) * (ob.x - g.gx)')} AS sxx_p,
               {sql_dsum('(ob.x - g.gx) * (ob.y - g.gy)')} AS sxy_p
        FROM ob JOIN cm USING (c) CROSS JOIN g
    )
    SELECT n_orders, n_entities,
           {_sql_q6('sxy_p / NULLIF(sxx_p, 0)')} AS beta_pooled,
           {_sql_q6('sxy_w / NULLIF(sxx_w, 0)')} AS beta_within,
           {_sql_q6('(sxy_w / NULLIF(sxx_w, 0)) * (sxy_w / NULLIF(sxx_w, 0))'
                    ' * sxx_w / NULLIF(syy_w, 0)')} AS r2_within
    FROM mom
    """,
    ref="SURVEY §2 D87 [EXT] (panel fixed-effects within estimator: "
    "customer-demeaned OLS slope of order value on order width (line "
    "count) vs the pooled slope — the Mundlak/FE device separating "
    "within-customer response from between-customer composition; "
    "entity means via one custkey-keyed agg, wide rank-free moments "
    "through dsum_wide)",
)
def orders_panel_within_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within (fixed-effects) vs pooled OLS slope of order totalprice on
    order line count. The within estimator demeans x and y by customer
    (absorbing customer fixed effects exactly — the one-way within
    transformation is exact for any unbalanced panel), so the slope reads
    the WITHIN-customer price-width response; the pooled slope mixes in
    between-customer composition. r2_within = beta^2 * Sxx / Syy on the
    demeaned moments.

    Scale shape: the lineitem width agg is orderkey-keyed (natural key),
    joined to orders on the same key (SF-proportional, un-hinted — AQE
    picks broadcast vs shuffle); entity means are one custkey-keyed agg
    joined back on custkey; grand means are a broadcast 1-row aggregate.
    Second moments in y (~1e11 per addend at 1e6 scale) ride dsum_wide's
    decimal(38,0) accumulator — the sf10-probe overflow lesson; DuckDB's
    SUM(BIGINT) is already HUGEINT so the oracle spelling is unchanged."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    lc = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("x"))
    ob = (
        o.join(lc, o.o_orderkey == lc.l_orderkey)
        .select(
            F.col("o_custkey").alias("c"),
            F.col("o_totalprice").alias("y"),
            F.col("x").cast("double").alias("x"),
        )
        .transform(pin, eager=False)
    )
    cm = ob.groupBy("c").agg(
        (dsum_wide("x") / F.count(F.lit(1))).alias("mx"),
        (dsum_wide("y") / F.count(F.lit(1))).alias("my"),
    )
    # grand sums run over the WHOLE fact: 150M quantized totalprices
    # overflow the plain long accumulator (caught by the sf100 decade) —
    # dsum_wide's decimal(38,0) holds any corpus; DuckDB needs no twin
    g = ob.agg(
        (dsum_wide("x") / F.count(F.lit(1))).alias("gx"),
        (dsum_wide("y") / F.count(F.lit(1))).alias("gy"),
    )
    xt, yt = F.col("x") - F.col("mx"), F.col("y") - F.col("my")
    xp, yp = F.col("x") - F.col("gx"), F.col("y") - F.col("gy")
    mom = (
        ob.join(cm, "c")
        .crossJoin(F.broadcast(g))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.countDistinct("c").cast("bigint").alias("n_entities"),
            dsum_wide(xt * xt).alias("sxx_w"),
            dsum_wide(xt * yt).alias("sxy_w"),
            dsum_wide(yt * yt).alias("syy_w"),
            dsum_wide(xp * xp).alias("sxx_p"),
            dsum_wide(xp * yp).alias("sxy_p"),
        )
    )
    bw = F.col("sxy_w") / F.nullif(F.col("sxx_w"), F.lit(0.0))
    return mom.select(
        "n_orders",
        "n_entities",
        _q6(F.col("sxy_p") / F.nullif(F.col("sxx_p"), F.lit(0.0))).alias(
            "beta_pooled"
        ),
        _q6(bw).alias("beta_within"),
        _q6(
            bw * bw * F.col("sxx_w") / F.nullif(F.col("syy_w"), F.lit(0.0))
        ).alias("r2_within"),
    )


# ---------------------------------------------------------------------------
# D85 — chain-ladder completion of censored purchase cohorts
# ---------------------------------------------------------------------------

def _chain_ladder_oracle() -> str:
    q6_ult = _sql_q6("l.cum_latest * a.ata")
    q6_res = _sql_q6("l.cum_latest * a.ata - l.cum_latest")
    return f"""
    WITH ev AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS isp
        FROM events
    ),
    fu AS (SELECT user_id, MIN(day) AS cohort FROM ev GROUP BY user_id),
    base AS (
        SELECT fu.cohort, datediff('day', fu.cohort, ev.day) AS age, ev.isp
        FROM ev JOIN fu USING (user_id)
    ),
    cells AS (
        SELECT cohort, age, CAST(SUM(isp) AS BIGINT) AS inc
        FROM base GROUP BY cohort, age
    ),
    maxd AS (SELECT MAX(day) AS maxday FROM ev),
    spine AS (
        SELECT c.cohort,
               unnest(range(0, datediff('day', c.cohort, m.maxday) + 1))
                   AS age
        FROM (SELECT DISTINCT cohort FROM fu) c CROSS JOIN maxd m
    ),
    tri AS (
        SELECT s.cohort, s.age, COALESCE(cells.inc, 0) AS inc0
        FROM spine s LEFT JOIN cells
          ON cells.cohort = s.cohort AND cells.age = s.age
    ),
    cum AS (
        SELECT cohort, age,
               CAST(SUM(inc0) OVER (PARTITION BY cohort ORDER BY age)
                    AS BIGINT) AS c
        FROM tri
    ),
    cl AS (
        SELECT cohort, age, c,
               LEAD(c) OVER (PARTITION BY cohort ORDER BY age) AS nxt
        FROM cum
    ),
    fac AS (
        SELECT age,
               CASE WHEN SUM(CASE WHEN nxt IS NOT NULL THEN c END) > 0
                    THEN CAST(SUM(nxt) AS DOUBLE)
                         / SUM(CASE WHEN nxt IS NOT NULL THEN c END)
                    ELSE 1.0 END AS f
        FROM cl GROUP BY age
    ),
    ata AS (
        SELECT age,
               exp(CAST(SUM(CAST(trunc(ln(f) * 1000000 + 0.5) AS BIGINT))
                        OVER (ORDER BY age DESC) AS DOUBLE) / 1000000.0)
                   AS ata
        FROM fac
    ),
    latest AS (
        SELECT cohort, CAST(MAX(age) AS BIGINT) AS latest_age,
               max_by(c, age) AS cum_latest
        FROM cum GROUP BY cohort
    )
    SELECT l.cohort, l.latest_age,
           CAST(l.cum_latest AS BIGINT) AS cum_purchases,
           {q6_ult} AS ultimate,
           {q6_res} AS reserve
    FROM latest l JOIN ata a ON a.age = l.latest_age
    """


@query(
    "events_chain_ladder",
    oracle=_chain_ladder_oracle(),
    ref="SURVEY §2 D85 [EXT] (chain-ladder completion: first-event-day "
    "cohorts x day age cumulative purchase triangle, right-censored at "
    "the corpus edge; volume-weighted all-cohort development factors "
    "f_a = sum C(.,a+1)/sum C(.,a) over cohorts observing both ages "
    "(Mack 1993), age-to-ultimate via exp of the reverse-cumulative "
    "1e-6-quantized ln f, per-cohort ultimate and reserve — the "
    "actuarial completion the naive 'sum what arrived' cohort read "
    "understates for young cohorts)",
)
def events_chain_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chain-ladder (Mack) development of the cohort purchase triangle:
    cohorts = per-user first event day; development age = days since
    first event; cells = cumulative purchases. Young cohorts are
    right-censored at the corpus edge, so their raw cumulative counts
    understate their eventual ('ultimate') purchases; the ladder
    completes them with volume-weighted development factors estimated
    from the cohorts that DID observe each age transition.

    Scale shape: two user-keyed exchanges (first-day agg, join back) and
    one (cohort, age) aggregation off the corpus scan; everything after
    lives on the bounded triangle (|days|^2/2 cells) — the dense spine is
    a broadcast cross of the bounded cohort list with a bounded age
    sequence, the cumulative/lead windows are cohort-partitioned, and the
    age-to-ultimate product runs as exp(reverse cumsum of quantized ln f)
    on the <=|days|-row factor table (exact long accumulation, so both
    engines chain identical factors). Factors with an empty or zero
    denominator fall back to 1.0 (no observed development)."""
    ev = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            F.to_date("ts").alias("day"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("isp"),
        )
        .transform(pin, eager=False)
    )
    fu = ev.groupBy("user_id").agg(F.min("day").alias("cohort"))
    base = ev.join(fu, "user_id").select(
        "cohort", F.datediff("day", "cohort").alias("age"), "isp"
    )
    cells = base.groupBy("cohort", "age").agg(F.sum("isp").alias("inc"))
    maxd = ev.agg(F.max("day").alias("maxday"))
    spine = (
        fu.select("cohort")
        .distinct()
        .crossJoin(F.broadcast(maxd))
        .select(
            "cohort",
            F.explode(
                F.sequence(F.lit(0), F.datediff("maxday", "cohort"))
            ).alias("age"),
        )
    )
    tri = spine.join(cells, ["cohort", "age"], "left").select(
        "cohort", "age", F.coalesce("inc", F.lit(0)).alias("inc0")
    )
    wc = Window.partitionBy("cohort").orderBy("age")
    cum = tri.select(
        "cohort", "age", F.sum("inc0").over(wc).cast("bigint").alias("c")
    ).transform(pin, eager=False)
    cl = cum.select("cohort", "age", "c", F.lead("c").over(wc).alias("nxt"))
    den = F.sum(F.when(F.col("nxt").isNotNull(), F.col("c")))
    fac = cl.groupBy("age").agg(
        F.when(den > 0, F.sum("nxt").cast("double") / den)
        .otherwise(1.0)
        .alias("f")
    )
    # age-to-ultimate factor: product of f from this age onward, as exp of
    # the reverse running sum of 1e-6-quantized ln f (exact long cumsum on
    # the bounded <=|days|-row factor table; f >= 1 whenever development
    # was observed, so ln f >= 0 and the quantizer never sees -inf)
    wrev = Window.orderBy(F.col("age").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    lnq = (F.log("f") * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    ata = fac.select(
        "age",
        F.exp(
            F.sum(lnq).over(wrev).cast("double") / F.lit(1000000.0)
        ).alias("ata"),
    )
    latest = cum.groupBy("cohort").agg(
        F.max("age").cast("bigint").alias("latest_age"),
        F.max_by("c", "age").alias("cum_latest"),
    )
    ult = F.col("cum_latest") * F.col("ata")
    return latest.join(
        ata, latest.latest_age == ata.age
    ).select(
        "cohort",
        "latest_age",
        F.col("cum_latest").cast("bigint").alias("cum_purchases"),
        _q6(ult).alias("ultimate"),
        _q6(ult - F.col("cum_latest")).alias("reserve"),
    )


# ---------------------------------------------------------------------------
# K135 — Bradley-Terry preference ranking of sources
# ---------------------------------------------------------------------------

_BT_BUCKETS = 256
_BT_ITERS = 12


def _bt_oracle() -> str:
    from ksql_spark.queries.curation import SQL_QUALITY

    head = f"""
    WITH docs AS MATERIALIZED (
        SELECT doc_id, source, ({SQL_QUALITY}) AS q,
               (((doc_id % 2147483648) * 2654435761) % 4294967296)
                   % {_BT_BUCKETS} AS bucket
        FROM documents WHERE text IS NOT NULL AND len(text) > 0
    ),
    champ AS MATERIALIZED (
        SELECT bucket, source, q FROM (
            SELECT bucket, source, q,
                   row_number() OVER (PARTITION BY bucket, source
                                      ORDER BY q DESC, doc_id DESC) AS rn
            FROM docs) WHERE rn = 1
    ),
    duels AS (
        SELECT a.source AS sa, b.source AS sb,
               CASE WHEN a.q > b.q THEN 1 ELSE 0 END AS awin
        FROM champ a JOIN champ b
          ON a.bucket = b.bucket AND a.source < b.source AND a.q <> b.q
    ),
    pairagg AS MATERIALIZED (
        SELECT sa, sb, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(awin) AS BIGINT) AS wa
        FROM duels GROUP BY sa, sb
    ),
    sym AS MATERIALIZED (
        SELECT sa AS a, sb AS b, n FROM pairagg
        UNION ALL SELECT sb, sa, n FROM pairagg
    ),
    wins AS MATERIALIZED (
        SELECT s, CAST(SUM(w) AS BIGINT) AS wins,
               CAST(SUM(n) AS BIGINT) AS games
        FROM (SELECT sa AS s, wa AS w, n FROM pairagg
              UNION ALL SELECT sb, n - wa, n FROM pairagg)
        GROUP BY s
    ),
    it0 AS MATERIALIZED (SELECT s, 1.0 AS pi FROM wins)"""
    its = []
    for i in range(1, _BT_ITERS + 1):
        p = f"it{i - 1}"
        its.append(f""",
    d{i} AS MATERIALIZED (
        SELECT sym.a AS s, {sql_dsum('sym.n / (pa.pi + pb.pi)')} AS den
        FROM sym JOIN {p} pa ON pa.s = sym.a JOIN {p} pb ON pb.s = sym.b
        GROUP BY sym.a
    ),
    r{i} AS MATERIALIZED (
        SELECT wins.s, {_sql_q6('wins.wins / d.den')} AS pi0
        FROM wins JOIN d{i} d USING (s)
    ),
    t{i} AS MATERIALIZED (SELECT {sql_dsum('pi0')} AS t, COUNT(*) AS cnt FROM r{i}),
    it{i} AS MATERIALIZED (
        SELECT s, {_sql_q6('pi0 * cnt / t')} AS pi
        FROM r{i} CROSS JOIN t{i}
    )""")
    tail = f"""
    SELECT w.s AS source, w.games, w.wins,
           p.pi AS strength,
           CAST(rank() OVER (ORDER BY p.pi DESC NULLS LAST, w.s)
                AS BIGINT) AS rnk
    FROM wins w JOIN it{_BT_ITERS} p ON p.s = w.s
    """
    return head + "".join(its) + tail


@query(
    "llm_bradley_terry_sources",
    oracle=_bt_oracle(),
    ref="SURVEY §2 K135 [EXT] (Bradley-Terry preference aggregation — the "
    "RLHF/eval-leaderboard primitive (Bradley & Terry 1952; Elo's model "
    "with logistic strengths): per-(hash-bucket, source) champion docs "
    "duel within their bucket, decisive outcomes feed the "
    "minorization-maximization fixed point pi_a = W_a / sum n_ab/"
    "(pi_a+pi_b) (Hunter 2004), 12 quantized sum-normalized iterations)",
)
def llm_bradley_terry_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry strength ranking of document sources from pairwise
    quality duels. Pairing is deterministic and bounded: each doc hashes
    into one of 256 buckets (Knuth LCG); each (bucket, source)'s champion
    is its highest-quality doc (tie-break: highest doc_id); within a
    bucket every source-pair's champions duel, the higher K4 quality
    score winning (exact ties are skipped — no coin flips). Strengths
    come from 12 Hunter-MM iterations pi_a = W_a / sum_b n_ab/(pi_a+pi_b),
    sum-normalized and 1e-6-quantized per step so both engines walk an
    identical trajectory.

    Scale shape: one corpus scan into a (bucket, source)-keyed max-struct
    aggregation (map-side partial; the shuffle carries <=256*|sources|
    champion rows, never the corpus); duels, win counts, and all 12 MM
    iterations live on bounded tables (<=|sources|^2 rows), each
    iteration pinned so the loop is over plans, not lineage (the D82
    posture). Sources with no decisive duel are absent (no evidence, no
    rank)."""
    from ksql_spark.operators.scale import pin as _pin

    docs = (
        load(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull() & (F.length("text") > 0))
        .select(
            "doc_id",
            "source",
            text.quality_score("text").alias("q"),
            (
                ((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761))
                % F.lit(4294967296)
                % F.lit(_BT_BUCKETS)
            ).alias("bucket"),
        )
    )
    # pinned: both duel sides read the champion table, and an unpinned plan
    # would re-run the corpus scan + champion agg per side
    champ = (
        docs.groupBy("bucket", "source")
        .agg(F.max(F.struct("q", "doc_id")).alias("m"))
        .select("bucket", "source", F.col("m.q").alias("q"))
        .transform(_pin, eager=False)
    )
    a = champ.select(
        F.col("bucket").alias("ab"),
        F.col("source").alias("sa"),
        F.col("q").alias("qa"),
    )
    b = champ.select(
        F.col("bucket").alias("bb"),
        F.col("source").alias("sb"),
        F.col("q").alias("qb"),
    )
    duels = a.join(
        b,
        (F.col("ab") == F.col("bb"))
        & (F.col("sa") < F.col("sb"))
        & (F.col("qa") != F.col("qb")),
    )
    pairagg = (
        duels.select(
            "sa",
            "sb",
            F.when(F.col("qa") > F.col("qb"), 1).otherwise(0).alias("awin"),
        )
        .groupBy("sa", "sb")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("awin").cast("bigint").alias("wa"),
        )
        .transform(_pin, eager=False)
    )
    sym = pairagg.select(
        F.col("sa").alias("a"), F.col("sb").alias("b"), "n"
    ).unionAll(
        pairagg.select(
            F.col("sb").alias("a"), F.col("sa").alias("b"), "n"
        )
    )
    wins = (
        pairagg.select(
            F.col("sa").alias("s"), F.col("wa").alias("w"), "n"
        )
        .unionAll(
            pairagg.select(
                F.col("sb").alias("s"),
                (F.col("n") - F.col("wa")).alias("w"),
                "n",
            )
        )
        .groupBy("s")
        .agg(
            F.sum("w").cast("bigint").alias("wins"),
            F.sum("n").cast("bigint").alias("games"),
        )
        .transform(_pin, eager=False)
    )
    pi = wins.select("s", F.lit(1.0).alias("pi"))
    for _ in range(_BT_ITERS):
        pa = pi.select(F.col("s").alias("a"), F.col("pi").alias("pia"))
        pb = pi.select(F.col("s").alias("b"), F.col("pi").alias("pib"))
        d = (
            sym.join(pa, "a")
            .join(pb, "b")
            .groupBy("a")
            .agg(
                dsum(
                    F.col("n") / (F.col("pia") + F.col("pib"))
                ).alias("den")
            )
        )
        r = wins.join(d, wins.s == d.a).select(
            "s", _q6(F.col("wins") / F.col("den")).alias("pi0")
        )
        t = r.agg(
            dsum("pi0").alias("t"), F.count(F.lit(1)).alias("cnt")
        )
        pi = (
            r.crossJoin(F.broadcast(t))
            .select(
                "s",
                _q6(F.col("pi0") * F.col("cnt") / F.col("t")).alias("pi"),
            )
            .transform(_pin, eager=False)
        )
    rnk = F.rank().over(
        Window.orderBy(F.col("strength").desc_nulls_last(), "source")
    )
    return (
        wins.join(pi, "s")
        .select(
            F.col("s").alias("source"),
            "games",
            "wins",
            F.col("pi").alias("strength"),
        )
        .select("source", "games", "wins", "strength", rnk.cast("bigint").alias("rnk"))
    )


# ---------------------------------------------------------------------------
# K136 — code-vs-prose hygiene screen (with planted drill rows)
# ---------------------------------------------------------------------------

#: (source, text) planted probes: the driver corpus is clean prose, so the
#: live screen legitimately reads ~0 — the drill rows prove the detector
#: DETECTS (the D55 planted-drop discipline). Plain ASCII, no SQL quoting
#: hazards.
_CODE_DRILL_ROWS = [
    (
        "planted_code",
        "def load(x): return x * 2; y = load(3); assert y == 6; print(y);",
    ),
    (
        "planted_json",
        '"key": [1, 2, 3], "flagValue": true, "innerMap": "x=1;y=2;z=3"',
    ),
    (
        "planted_prose",
        "the cat sat on the mat and the dog ran to the park in the morning",
    ),
]

_SYM_RE = r"[{}();=<>\[\]]"
_DIGIT_RE = "[0-9]"
_CAMEL_RE = "[a-z][A-Z]"


def _code_prose_oracle() -> str:
    values = ", ".join(
        "('" + s + "', '" + t.replace("'", "''") + "')"
        for s, t in _CODE_DRILL_ROWS
    )
    sym = f"len(text) - len(regexp_replace(text, '{_SYM_RE}', '', 'g'))"
    dig = f"len(text) - len(regexp_replace(text, '{_DIGIT_RE}', '', 'g'))"
    cam = f"len(regexp_extract_all(text, '{_CAMEL_RE}'))"
    return f"""
    WITH corpus AS (
        SELECT 'live' AS mode, source, text FROM documents
        UNION ALL
        SELECT 'drill', v.source, v.text
        FROM (VALUES {values}) AS v(source, text)
    ),
    feat AS (
        SELECT mode, source,
               ({sym}) * 1.0 / len(text) AS sym_den,
               ({dig}) * 1.0 / len(text) AS dig_den,
               ({cam}) * 1.0 / len(text) AS cam_den
        FROM corpus WHERE text IS NOT NULL AND len(text) > 0
    )
    SELECT mode, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN sym_den > 0.02 OR cam_den > 0.005
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_code_like,
           {_sql_q6(f"({sql_dsum('sym_den')}) / COUNT(*)")} AS avg_sym_density,
           {_sql_q6(f"({sql_dsum('dig_den')}) / COUNT(*)")} AS avg_digit_density,
           {_sql_q6(f"({sql_dsum('cam_den')}) / COUNT(*)")} AS avg_camel_density
    FROM feat GROUP BY mode, source
    """


@query(
    "llm_code_prose_score",
    oracle=_code_prose_oracle(),
    ref="SURVEY §2 K136 [EXT] (code-vs-prose screen: per-doc densities of "
    "code syntax chars, digits, and camelCase boundaries classify "
    "code-like docs per source — the corpus-mix gate separating code "
    "from prose before tokenizer/quality decisions; live rows plus "
    "planted drill probes proving the detector detects)",
)
def llm_code_prose_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-likeness screen per (mode, source): symbol density (braces,
    parens, semicolons, operators), digit density, and camelCase-boundary
    density, with code_like = sym > 2% OR camel > 0.5%. The live driver
    corpus is clean prose (expected ~0 everywhere); the 'drill' mode runs
    the same expressions over three planted probes (python-ish, json-ish,
    prose) and must flag exactly the first two — the D55 planted-drop
    discipline: an all-zeros screen only counts if it provably CAN fire.

    Scale shape: one corpus scan; every feature is a regex length-diff or
    match count inside whole-stage codegen (no UDF, no explode); one
    (mode, source)-keyed aggregation with map-side partials. The planted
    rows are a 3-row literal union — constant-folded, never shuffled."""
    d = load(spark, sf_dir, "documents").select(
        F.lit("live").alias("mode"), "source", "text"
    )
    drill = spark.createDataFrame(
        [("drill", s, t) for s, t in _CODE_DRILL_ROWS],
        "mode string, source string, text string",
    )
    corpus = d.unionAll(drill).where(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    n = F.length("text").cast("double")
    sym = (
        F.length("text") - F.length(F.regexp_replace("text", _SYM_RE, ""))
    ) / n
    dig = (
        F.length("text") - F.length(F.regexp_replace("text", _DIGIT_RE, ""))
    ) / n
    cam = F.regexp_count("text", F.lit(_CAMEL_RE)) / n
    feat = corpus.select(
        "mode",
        "source",
        sym.alias("sym_den"),
        dig.alias("dig_den"),
        cam.alias("cam_den"),
    )
    return feat.groupBy("mode", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(
            F.when(
                (F.col("sym_den") > 0.02) | (F.col("cam_den") > 0.005), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_code_like"),
        _q6(dsum("sym_den") / F.count(F.lit(1))).alias("avg_sym_density"),
        _q6(dsum("dig_den") / F.count(F.lit(1))).alias("avg_digit_density"),
        _q6(dsum("cam_den") / F.count(F.lit(1))).alias("avg_camel_density"),
    )


# ---------------------------------------------------------------------------
# K137 — mojibake / encoding-artifact audit (with planted drill rows)
# ---------------------------------------------------------------------------

#: the classic UTF-8-read-as-Latin-1 artifact sequences: U+00E2 U+20AC
#: ("a-circumflex euro", the mangled smart-quote prefix), U+00C3 (stray
#: accent carrier), U+FFFD (the replacement character a lossy decode
#: leaves behind).
_MOJI_SMART = "â€"
_MOJI_ACCENT = "Ã"
_MOJI_REPL = "�"

_MOJI_DRILL_ROWS = [
    (
        "planted_mojibake",
        f"the caf{_MOJI_ACCENT}© serves {_MOJI_SMART}œespresso"
        f"{_MOJI_SMART}œ and croissants {_MOJI_ACCENT} la carte",
    ),
    (
        "planted_replacement",
        f"data {_MOJI_REPL}loss{_MOJI_REPL} detected in {_MOJI_REPL}segment"
        " 7 of the archive",
    ),
    (
        "planted_clean",
        "the quick brown fox jumps over the lazy dog every single day",
    ),
]


def _mojibake_oracle() -> str:
    values = ", ".join(
        "('" + s + "', '" + t.replace("'", "''") + "')"
        for s, t in _MOJI_DRILL_ROWS
    )
    c1 = f"(len(text) - len(replace(text, '{_MOJI_SMART}', ''))) / 2"
    c2 = f"len(text) - len(replace(text, '{_MOJI_ACCENT}', ''))"
    c3 = f"len(text) - len(replace(text, '{_MOJI_REPL}', ''))"
    return f"""
    WITH corpus AS (
        SELECT 'live' AS mode, source, text FROM documents
        UNION ALL
        SELECT 'drill', v.source, v.text
        FROM (VALUES {values}) AS v(source, text)
    ),
    feat AS (
        SELECT mode, source,
               CAST(({c1}) + ({c2}) + ({c3}) AS BIGINT) AS artifacts,
               (({c1}) + ({c2}) + ({c3})) / len(text) AS rate
        FROM corpus WHERE text IS NOT NULL AND len(text) > 0
    )
    SELECT mode, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN rate > 0.001 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_flagged,
           CAST(SUM(artifacts) AS BIGINT) AS artifact_chars,
           {_sql_q6(f"({sql_dsum('rate')}) / COUNT(*)")} AS avg_rate
    FROM feat GROUP BY mode, source
    """


@query(
    "llm_mojibake_audit",
    oracle=_mojibake_oracle(),
    ref="SURVEY §2 K137 [EXT] (mojibake audit: UTF-8-as-Latin-1 artifact "
    "sequences (U+00E2 U+20AC smart-quote prefix, stray U+00C3) and "
    "U+FFFD replacement chars counted per doc via replace-length "
    "diffs — the web-crawl encoding-damage screen; live rows plus "
    "planted drill probes proving the detector detects)",
)
def llm_mojibake_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-artifact (mojibake) audit per (mode, source): counts of
    the classic UTF-8-decoded-as-Latin-1 sequences (the 2-codepoint
    smart-quote prefix U+00E2 U+20AC, stray accent carriers U+00C3) and
    U+FFFD replacement characters, as codepoint-exact replace-length
    diffs (regex-free, so no engine regex dialect in play); docs with
    artifact rate > 0.1% are flagged. The live corpus is clean ASCII
    (expected zero); the drill probes must flag exactly the two damaged
    rows.

    Scale shape: one corpus scan, three replace() length diffs in
    whole-stage codegen, one (mode, source)-keyed aggregation — the same
    single-pass shape as K136."""
    d = load(spark, sf_dir, "documents").select(
        F.lit("live").alias("mode"), "source", "text"
    )
    drill = spark.createDataFrame(
        [("drill", s, t) for s, t in _MOJI_DRILL_ROWS],
        "mode string, source string, text string",
    )
    corpus = d.unionAll(drill).where(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    c1 = (
        F.length("text")
        - F.length(F.replace("text", F.lit(_MOJI_SMART), F.lit("")))
    ) / F.lit(2)
    c2 = F.length("text") - F.length(
        F.replace("text", F.lit(_MOJI_ACCENT), F.lit(""))
    )
    c3 = F.length("text") - F.length(
        F.replace("text", F.lit(_MOJI_REPL), F.lit(""))
    )
    artifacts = c1 + c2 + c3
    feat = corpus.select(
        "mode",
        "source",
        artifacts.cast("bigint").alias("artifacts"),
        (artifacts / F.length("text")).alias("rate"),
    )
    return feat.groupBy("mode", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("rate") > 0.001, 1).otherwise(0))
        .cast("bigint")
        .alias("n_flagged"),
        F.sum("artifacts").cast("bigint").alias("artifact_chars"),
        _q6(dsum("rate") / F.count(F.lit(1))).alias("avg_rate"),
    )


# ---------------------------------------------------------------------------
# K138 — interpolated Kneser-Ney bigram probabilities
# ---------------------------------------------------------------------------

_KN_D = 0.75
_KN_TOPK = 30


@query(
    "llm_bigram_kneser_ney",
    oracle=f"""
    WITH toks AS (
        SELECT string_split(text, ' ') AS w FROM documents
        WHERE text IS NOT NULL AND len(text) > 0
    ),
    bg AS (
        SELECT unnest(list_transform(range(1, len(w)),
                      i -> array_to_string(w[i:i+1], ' '))) AS gram
        FROM toks
    ),
    c2 AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY gram),
    sp AS (
        SELECT split_part(gram, ' ', 1) AS w1,
               split_part(gram, ' ', 2) AS w2, c
        FROM c2
    ),
    c1 AS (
        SELECT w1, CAST(SUM(c) AS BIGINT) AS ctot,
               CAST(COUNT(*) AS BIGINT) AS n1f
        FROM sp GROUP BY w1
    ),
    cont AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1p FROM sp GROUP BY w2),
    nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS nbi FROM sp)
    SELECT sp.w1, sp.w2, sp.c AS c_bigram,
           {_sql_q6('n1p * 1.0 / nbi')} AS p_cont,
           {_sql_q6(f'greatest(sp.c - {_KN_D}, 0) / c1.ctot'
                    f' + {_KN_D} * c1.n1f / c1.ctot * (n1p * 1.0 / nbi)')}
               AS p_kn
    FROM sp JOIN c1 USING (w1) JOIN cont USING (w2) CROSS JOIN nb
    ORDER BY p_kn DESC, sp.w1, sp.w2 LIMIT {_KN_TOPK}
    """,
    ref="SURVEY §2 K138 [EXT] (interpolated Kneser-Ney: absolute "
    "discounting D=0.75 with continuation-count backoff P_cont(w2) = "
    "N1+(.w2)/N1+(..) (Kneser & Ney 1995; Chen & Goodman 1999) — the "
    "smoothing that K50's raw conditional bigram model lacks; all "
    "counts from one bigram aggregation, top-30 via TakeOrdered)",
)
def llm_bigram_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities over the corpus LM:
    P_KN(w2|w1) = max(c(w1 w2) - D, 0)/c(w1 .) + D * N1+(w1 .)/c(w1 .)
    * P_cont(w2), with P_cont the continuation-probability backoff —
    'how many distinct contexts precede w2' rather than how often it
    occurs (the Kneser-Ney insight that keeps 'Francisco' rare outside
    'San'). Top-30 bigrams by smoothed probability.

    Scale shape: one corpus scan exploding word bigrams into a gram-keyed
    count aggregation (the only corpus-sized exchange, map-side combined);
    the w1 totals, continuation counts, and the 1-row bigram-type count
    are vocabulary-bounded tables broadcast onto the bigram-type table
    (at 100 TB the type tables hash to fixed buckets — the K50 posture);
    the final top-30 closes via orderBy().limit() = TakeOrderedAndProject,
    never a global rank window."""
    d = load(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    bg = d.select(F.explode(text.shingles("text", 2)).alias("gram"))
    c2 = bg.groupBy("gram").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    sp = c2.select(
        F.split_part(F.col("gram"), F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part(F.col("gram"), F.lit(" "), F.lit(2)).alias("w2"),
        "c",
    ).transform(pin, eager=False)
    c1 = sp.groupBy("w1").agg(
        F.sum("c").cast("bigint").alias("ctot"),
        F.count(F.lit(1)).cast("bigint").alias("n1f"),
    )
    cont = sp.groupBy("w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n1p")
    )
    nb = sp.agg(F.count(F.lit(1)).cast("bigint").alias("nbi"))
    pcont_raw = F.col("n1p") * F.lit(1.0) / F.col("nbi")
    pkn = (
        F.greatest(F.col("c") - F.lit(_KN_D), F.lit(0.0)) / F.col("ctot")
        + F.lit(_KN_D) * F.col("n1f") / F.col("ctot") * pcont_raw
    )
    return (
        sp.join(F.broadcast(c1), "w1")
        .join(F.broadcast(cont), "w2")
        .crossJoin(F.broadcast(nb))
        .select(
            "w1",
            "w2",
            F.col("c").alias("c_bigram"),
            _q6(pcont_raw).alias("p_cont"),
            _q6(pkn).alias("p_kn"),
        )
        .orderBy(F.col("p_kn").desc(), "w1", "w2")
        .limit(_KN_TOPK)
    )


# ---------------------------------------------------------------------------
# D88 — Gumbel block-maxima / return levels (extreme-value analysis)
# ---------------------------------------------------------------------------

_EULER_GAMMA = 0.5772156649015329


@query(
    "events_gumbel_maxima",
    oracle=f"""
    WITH dm AS (
        SELECT CAST(ts AS DATE) AS day, MAX(value) AS mx
        FROM events WHERE value IS NOT NULL GROUP BY day
    ),
    mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               ({sql_dsum('mx')}) / COUNT(*) AS m,
               ({sql_dsum('mx * mx')}) AS sxx
        FROM dm
    ),
    fit AS (
        SELECT n, m,
               CASE WHEN n >= 2 AND (sxx - n * m * m) / (n - 1) > 0
                    THEN sqrt(6.0 * (sxx - n * m * m) / (n - 1))
                         / 3.141592653589793
                    ELSE NULL END AS beta
        FROM mom
    )
    SELECT n AS n_blocks,
           {_sql_q6('m')} AS block_max_mean,
           {_sql_q6(f'm - {_EULER_GAMMA} * beta')} AS gumbel_mu,
           {_sql_q6('beta')} AS gumbel_beta,
           {_sql_q6(f'm - {_EULER_GAMMA} * beta - beta * ln(-ln(0.9))')}
               AS rl_10,
           {_sql_q6(f'm - {_EULER_GAMMA} * beta - beta * ln(-ln(0.99))')}
               AS rl_100,
           {_sql_q6(f'm - {_EULER_GAMMA} * beta - beta * ln(-ln(0.999))')}
               AS rl_1000
    FROM fit
    """,
    ref="SURVEY §2 D88 [EXT] (Gumbel block maxima: daily-max blocks, "
    "method-of-moments fit beta = s*sqrt(6)/pi, mu = mean - gamma*beta "
    "(Gumbel 1958), T-block return levels mu - beta*ln(-ln(1-1/T)) — "
    "the extreme-value 'how bad can a day get?' where D76's Hill reads "
    "the tail exponent; one corpus agg to the bounded daily table, "
    "closed-form fit)",
)
def events_gumbel_maxima(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extreme-value (Gumbel/EV1) fit on daily block maxima of event
    value, with 10/100/1000-day return levels — the capacity-planning
    question ('what peak should we budget for?') that quantiles of the
    raw distribution systematically understate. Method-of-moments fit:
    beta = s*sqrt(6)/pi, mu = m - 0.5772...*beta; degenerate series
    (fewer than 2 blocks, or zero variance) yield NULL fit columns
    identically in both engines.

    Scale shape: one corpus scan collapsing to the calendar-bounded
    daily-maxima table (map-side partial max), then closed-form scalar
    math on a 1-row moment aggregate. Nothing downstream of the first
    agg is data-proportional."""
    dm = (
        load(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.max("value").alias("mx"))
    )
    mom = dm.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (dsum("mx") / F.count(F.lit(1))).alias("m"),
        dsum(F.col("mx") * F.col("mx")).alias("sxx"),
    )
    s2 = (F.col("sxx") - F.col("n") * F.col("m") * F.col("m")) / (
        F.col("n") - 1
    )
    beta = F.when(
        (F.col("n") >= 2) & (s2 > 0),
        F.sqrt(6.0 * s2) / F.lit(3.141592653589793),
    ).otherwise(F.lit(None).cast("double"))
    fit = mom.select("n", "m", beta.alias("beta"))
    mu = F.col("m") - F.lit(_EULER_GAMMA) * F.col("beta")

    def rl(p: float):
        return mu - F.col("beta") * F.log(-F.log(F.lit(p)))

    return fit.select(
        F.col("n").alias("n_blocks"),
        _q6(F.col("m")).alias("block_max_mean"),
        _q6(mu).alias("gumbel_mu"),
        _q6(F.col("beta")).alias("gumbel_beta"),
        _q6(rl(0.9)).alias("rl_10"),
        _q6(rl(0.99)).alias("rl_100"),
        _q6(rl(0.999)).alias("rl_1000"),
    )


# ---------------------------------------------------------------------------
# D89 — Cochran-Mantel-Haenszel stratified association test
# ---------------------------------------------------------------------------

@query(
    "events_cmh_test",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id, CAST(user_id % 2 AS INT) AS variant,
               MIN(CAST(ts AS DATE)) AS cohort,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS conv
        FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ),
    cells AS (
        SELECT cohort,
               CAST(SUM(CASE WHEN variant = 1 AND conv = 1 THEN 1 ELSE 0
                        END) AS BIGINT) AS a,
               CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1,
               CAST(SUM(conv) AS BIGINT) AS m1,
               CAST(COUNT(*) AS BIGINT) AS nk
        FROM per_user GROUP BY cohort
        HAVING COUNT(*) >= 2
    ),
    sums AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
               CAST(SUM(a) AS BIGINT) AS sum_a,
               {sql_dsum('n1 * 1.0 * m1 / nk')} AS sum_e,
               {sql_dsum('n1 * 1.0 * (nk - n1) * m1 * (nk - m1)'
                         ' / (nk * 1.0 * nk * (nk - 1))')} AS sum_v,
               {sql_dsum('a * 1.0 * (nk - n1 - m1 + a) / nk')} AS sum_ad,
               {sql_dsum('(n1 - a) * 1.0 * (m1 - a) / nk')} AS sum_bc
        FROM cells
    )
    SELECT n_strata, sum_a, {_sql_q6('sum_e')} AS sum_e,
           {_sql_q6('(abs(sum_a - sum_e) - 0.5) * (abs(sum_a - sum_e) - 0.5)'
                    ' / NULLIF(sum_v, 0)')} AS chi2_cmh,
           {_sql_q6('sum_ad / NULLIF(sum_bc, 0)')} AS or_mh
    FROM sums
    """,
    ref="SURVEY §2 D89 [EXT] (Cochran-Mantel-Haenszel: variant x "
    "conversion 2x2 tables stratified by signup-day cohort, "
    "continuity-corrected CMH chi-square + Mantel-Haenszel common odds "
    "ratio (Mantel & Haenszel 1959) — the stratified readout that "
    "blocks Simpson reversals K83's pooled z-test is exposed to; one "
    "user-keyed agg, bounded per-cohort cells)",
)
def events_cmh_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified A/B association: per signup-day cohort a 2x2 table of
    id-parity variant x user conversion; the CMH statistic pools the
    per-stratum evidence Sum(a_k - E_k) against Sum(Var_k) with the 0.5
    continuity correction, and the Mantel-Haenszel common odds ratio
    Sum(a d/n)/Sum(b c/n) gives the effect size — the device that reads
    the treatment effect WITHIN cohorts, immune to the Simpson reversal
    a cohort-mix shift induces in the pooled K83 z-test. Strata with
    fewer than 2 users are excluded (their variance term divides by
    n-1 = 0) in both engines.

    Scale shape: one user-keyed corpus agg (map-side partial) to the
    SF-proportional user table, one cohort agg to the calendar-bounded
    cell table, closed-form scalar chain on a 1-row sum. Degenerate
    variance/odds denominators NULL out via NULLIF, never abort."""
    per_user = (
        load(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.min(F.to_date("ts")).alias("cohort"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv"),
        )
        .select(
            (F.col("user_id") % 2).cast("int").alias("variant"),
            "cohort",
            "conv",
        )
    )
    cells = (
        per_user.groupBy("cohort")
        .agg(
            F.sum(
                F.when((F.col("variant") == 1) & (F.col("conv") == 1), 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("a"),
            F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n1"),
            F.sum("conv").cast("bigint").alias("m1"),
            F.count(F.lit(1)).cast("bigint").alias("nk"),
        )
        .where(F.col("nk") >= 2)
    )
    a, n1, m1, nk = (F.col(c) for c in ("a", "n1", "m1", "nk"))
    sums = cells.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        F.sum("a").cast("bigint").alias("sum_a"),
        dsum(n1 * 1.0 * m1 / nk).alias("sum_e"),
        dsum(
            n1 * 1.0 * (nk - n1) * m1 * (nk - m1) / (nk * 1.0 * nk * (nk - 1))
        ).alias("sum_v"),
        dsum(a * 1.0 * (nk - n1 - m1 + a) / nk).alias("sum_ad"),
        dsum((n1 - a) * 1.0 * (m1 - a) / nk).alias("sum_bc"),
    )
    dev = F.abs(F.col("sum_a") - F.col("sum_e")) - 0.5
    return sums.select(
        "n_strata",
        "sum_a",
        _q6(F.col("sum_e")).alias("sum_e"),
        _q6(dev * dev / F.nullif(F.col("sum_v"), F.lit(0.0))).alias(
            "chi2_cmh"
        ),
        _q6(
            F.col("sum_ad") / F.nullif(F.col("sum_bc"), F.lit(0.0))
        ).alias("or_mh"),
    )


# ---------------------------------------------------------------------------
# D90 — first-order stochastic dominance audit on binned ECDFs
# ---------------------------------------------------------------------------

_FOSD_BINS = 200
_FOSD_WIDTH = 3000.0


@query(
    "orders_stochastic_dominance",
    oracle=f"""
    WITH src AS (
        SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'u' ELSE 'l' END
                   AS grp,
               CAST(least(floor(o_totalprice / {_FOSD_WIDTH}),
                          {_FOSD_BINS - 1}) AS INT) AS bin
        FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
          AND o_totalprice IS NOT NULL
    ),
    counts AS (
        SELECT grp, bin, CAST(COUNT(*) AS BIGINT) AS c
        FROM src GROUP BY grp, bin
    ),
    spine AS (
        SELECT g.grp, t.b AS bin
        FROM (SELECT 'u' AS grp UNION ALL SELECT 'l') g,
             (SELECT unnest(range(0, {_FOSD_BINS})) AS b) t
    ),
    cum AS (
        SELECT spine.grp, spine.bin,
               CAST(SUM(COALESCE(counts.c, 0)) OVER (
                   PARTITION BY spine.grp ORDER BY spine.bin) AS BIGINT)
                   AS cc,
               CAST(SUM(COALESCE(counts.c, 0)) OVER (
                   PARTITION BY spine.grp) AS BIGINT) AS tot
        FROM spine LEFT JOIN counts
          ON counts.grp = spine.grp AND counts.bin = spine.bin
    ),
    wide AS (
        SELECT bin,
               MAX(CASE WHEN grp = 'u' THEN cc * 1.0 / NULLIF(tot, 0) END)
                   AS fu,
               MAX(CASE WHEN grp = 'l' THEN cc * 1.0 / NULLIF(tot, 0) END)
                   AS fl
        FROM cum GROUP BY bin
    )
    SELECT CAST({_FOSD_BINS} AS INT) AS n_bins,
           {_sql_q6('SUM(CASE WHEN fu <= fl THEN 1 ELSE 0 END) * 1.0'
                    f' / {_FOSD_BINS}')} AS frac_urgent_dominates,
           {_sql_q6('greatest(MAX(fu - fl), 0.0)')} AS max_violation,
           {_sql_q6('MAX(abs(fu - fl))')} AS ks_gap
    FROM wide
    """,
    ref="SURVEY §2 D90 [EXT] (first-order stochastic dominance: urgent- "
    "vs low-priority order-value ECDFs on a fixed 200-bin grid, "
    "dominance fraction + max violation + KS gap — the 'is A's whole "
    "DISTRIBUTION better?' readout where D53's t-test compares one "
    "moment (Hadar & Russell 1969); the K131 binned-ECDF device, no "
    "self-join, bounded grid)",
)
def orders_stochastic_dominance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order stochastic dominance audit between the urgent and low
    order-priority value distributions: on a fixed 200-bin grid,
    frac_urgent_dominates = share of grid points where F_urgent <= F_low
    (urgent stochastically larger), max_violation = the largest
    dominance breach, ks_gap = the largest absolute ECDF gap. FOSD
    holding (frac = 1) means EVERY expected-utility maximizer prefers
    the urgent distribution — a strictly stronger statement than D53's
    mean comparison.

    Scale shape: one corpus scan into a (grp, bin) count agg (map-side
    partial; the exchange carries <=400 cells), dense 2x200 spine by a
    bounded cross, group-partitioned cumulative windows over the
    bounded grid, 1-row closed form. Empty groups NULL their ECDF via
    NULLIF rather than dividing by zero."""
    src = (
        load(spark, sf_dir, "orders")
        .where(
            F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
            & F.col("o_totalprice").isNotNull()
        )
        .select(
            F.when(F.col("o_orderpriority") == "1-URGENT", "u")
            .otherwise("l")
            .alias("grp"),
            F.least(
                F.floor(F.col("o_totalprice") / F.lit(_FOSD_WIDTH)),
                F.lit(_FOSD_BINS - 1),
            )
            .cast("int")
            .alias("bin"),
        )
    )
    counts = src.groupBy("grp", "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    spine = (
        spark.range(2)
        .select(F.when(F.col("id") == 0, "u").otherwise("l").alias("grp"))
        .crossJoin(
            spark.range(_FOSD_BINS).select(F.col("id").cast("int").alias("bin"))
        )
    )
    wgrp = Window.partitionBy("grp").orderBy("bin")
    wtot = Window.partitionBy("grp")
    cum = (
        spine.join(counts, ["grp", "bin"], "left")
        .select(
            "grp",
            "bin",
            F.sum(F.coalesce("c", F.lit(0)))
            .over(wgrp)
            .cast("bigint")
            .alias("cc"),
            F.sum(F.coalesce("c", F.lit(0)))
            .over(wtot)
            .cast("bigint")
            .alias("tot"),
        )
    )
    ecdf = F.col("cc") * F.lit(1.0) / F.nullif(F.col("tot"), F.lit(0))
    wide = cum.groupBy("bin").agg(
        F.max(F.when(F.col("grp") == "u", ecdf)).alias("fu"),
        F.max(F.when(F.col("grp") == "l", ecdf)).alias("fl"),
    )
    return wide.agg(
        F.lit(_FOSD_BINS).cast("int").alias("n_bins"),
        _q6(
            F.sum(F.when(F.col("fu") <= F.col("fl"), 1).otherwise(0))
            * F.lit(1.0)
            / F.lit(_FOSD_BINS)
        ).alias("frac_urgent_dominates"),
        _q6(
            F.greatest(F.max(F.col("fu") - F.col("fl")), F.lit(0.0))
        ).alias("max_violation"),
        _q6(F.max(F.abs(F.col("fu") - F.col("fl")))).alias("ks_gap"),
    )


# ---------------------------------------------------------------------------
# D91 — per-part safety stock / reorder point
# ---------------------------------------------------------------------------

_SS_Z95 = 1.6448536269514722  # Phi^-1(0.95)


@query(
    "part_safety_stock",
    oracle=f"""
    WITH md AS (
        SELECT l_partkey, date_trunc('month', l_shipdate) AS mo,
               {sql_dsum('l_quantity')} AS qty
        FROM lineitem GROUP BY l_partkey, mo
    ),
    months AS (SELECT DISTINCT date_trunc('month', l_shipdate) AS mo
               FROM lineitem),
    spine AS (
        SELECT p.p_partkey, months.mo FROM part p CROSS JOIN months
    ),
    dense AS (
        SELECT spine.p_partkey, COALESCE(md.qty, 0.0) AS qty
        FROM spine LEFT JOIN md
          ON md.l_partkey = spine.p_partkey AND md.mo = spine.mo
    ),
    mom AS (
        SELECT p_partkey, CAST(COUNT(*) AS BIGINT) AS n_months,
               ({sql_dsum('qty')}) / COUNT(*) AS m,
               {sql_dsum('qty * qty')} AS sxx
        FROM dense GROUP BY p_partkey
    )
    SELECT p_partkey, n_months,
           {_sql_q6('m')} AS mean_monthly,
           {_sql_q6('sqrt(greatest((sxx - n_months * m * m)'
                    ' / (n_months - 1), 0.0))')} AS sd_monthly,
           {_sql_q6(f'{_SS_Z95} * sqrt(greatest((sxx - n_months * m * m)'
                    ' / (n_months - 1), 0.0))')} AS safety_stock,
           {_sql_q6(f'm + {_SS_Z95} * sqrt(greatest((sxx - n_months * m * m)'
                    ' / (n_months - 1), 0.0))')} AS reorder_point
    FROM mom
    """,
    ref="SURVEY §2 D91 [EXT] (safety stock at 95% cycle service level: "
    "per-part monthly demand on the ZERO-FILLED month spine (intermittent "
    "demand has real zero months — D67's Croston lesson), z*sigma buffer "
    "+ reorder point for a one-month lead time — the inventory sizing "
    "that closes the D65 ABC-XYZ / D67 Croston planning loop)",
)
def part_safety_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part safety stock and reorder point at a 95% cycle service
    level with one-month lead time: ss = z95 * sd(monthly demand),
    rop = mean + ss. Monthly demand is measured on the DENSE month
    spine (parts x observed months, zeros filled) — skipping the zero
    months halves the variance of intermittent parts and silently
    undersizes their buffer, the same failure D67's Croston entry
    exists to avoid.

    Scale shape: one (part, month)-keyed corpus agg; the month list is
    calendar-bounded and broadcast-crossed with the part dimension (a
    bounded x|parts| expansion, linear in parts); one part-keyed moment
    agg closes it. Negative variance from quantized cancellation clamps
    to 0 via greatest() in both engines."""
    li = load(spark, sf_dir, "lineitem")
    md = li.groupBy(
        "l_partkey", F.date_trunc("month", "l_shipdate").alias("mo")
    ).agg(dsum("l_quantity").alias("qty"))
    months = (
        li.select(F.date_trunc("month", "l_shipdate").alias("mo"))
        .distinct()
        .transform(pin, eager=False)
    )
    spine = (
        load(spark, sf_dir, "part")
        .select("p_partkey")
        .crossJoin(F.broadcast(months))
    )
    dense = spine.join(
        md,
        (md.l_partkey == spine.p_partkey) & (md.mo == spine.mo),
        "left",
    ).select("p_partkey", F.coalesce("qty", F.lit(0.0)).alias("qty"))
    mom = dense.groupBy("p_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months"),
        (dsum("qty") / F.count(F.lit(1))).alias("m"),
        dsum(F.col("qty") * F.col("qty")).alias("sxx"),
    )
    s2 = F.greatest(
        (F.col("sxx") - F.col("n_months") * F.col("m") * F.col("m"))
        / (F.col("n_months") - 1),
        F.lit(0.0),
    )
    sd = F.sqrt(s2)
    return mom.select(
        "p_partkey",
        "n_months",
        _q6(F.col("m")).alias("mean_monthly"),
        _q6(sd).alias("sd_monthly"),
        _q6(F.lit(_SS_Z95) * sd).alias("safety_stock"),
        _q6(F.col("m") + F.lit(_SS_Z95) * sd).alias("reorder_point"),
    )


# ---------------------------------------------------------------------------
# K139 — top principal component via power iteration on the covariance
# ---------------------------------------------------------------------------

_PCA_ITERS = 8

#: exact-integer covariance cell (the K109 emb_gram device, full matrix):
#: components quantized to 1e-6 integers, decimal(38,0) sums, one double
#: division chain, 1e-6-quantized output — bit-identical across engines.
_PCA_COV_SQL = """
    WITH comp AS MATERIALIZED (
        SELECT CAST(ti.i - 1 AS INT) AS i, CAST(tj.j - 1 AS INT) AS j,
               CAST(trunc(CAST(embedding[ti.i] AS DOUBLE) * 1000000 + 0.5)
                    AS BIGINT) AS xi,
               CAST(trunc(CAST(embedding[tj.j] AS DOUBLE) * 1000000 + 0.5)
                    AS BIGINT) AS xj
        FROM embeddings,
             unnest(range(1, len(embedding) + 1)) AS ti(i),
             unnest(range(1, len(embedding) + 1)) AS tj(j)
    ),
    cov AS MATERIALIZED (
        SELECT i, j,
               CAST(trunc((CAST(SUM(xi * xj) AS DOUBLE) / COUNT(*)
                           - (CAST(SUM(xi) AS DOUBLE) / COUNT(*))
                             * (CAST(SUM(xj) AS DOUBLE) / COUNT(*)))
                    / 1000000000000.0 * 1000000 + 0.5) AS BIGINT) / 1000000.0
                   AS c
        FROM comp GROUP BY i, j
    ),
    dims AS MATERIALIZED (SELECT DISTINCT i AS dim FROM cov),
    nd AS (SELECT COUNT(*) AS d FROM dims),
    v0 AS MATERIALIZED (
        SELECT dim, 1.0 / sqrt(CAST((SELECT d FROM nd) AS DOUBLE)) AS v
        FROM dims
    )"""


def _pca_oracle() -> str:
    its = []
    for t in range(1, _PCA_ITERS + 1):
        p = f"v{t - 1}"
        its.append(f""",
    w{t} AS MATERIALIZED (
        SELECT cov.i AS dim, {sql_dsum(f'cov.c * {p}.v * 1000.0')} AS w
        FROM cov JOIN {p} ON {p}.dim = cov.j GROUP BY cov.i
    ),
    n{t} AS MATERIALIZED (
        SELECT sqrt({sql_dsum('w * w')}) AS nrm FROM w{t}
    ),
    v{t} AS MATERIALIZED (
        SELECT dim, {_sql_q6('w / NULLIF(nrm, 0)')} AS v
        FROM w{t} CROSS JOIN n{t}
    )""")
    tail = f""",
    tr AS (SELECT {sql_dsum('c')} AS trace FROM cov WHERE i = j)
    SELECT v{_PCA_ITERS}.dim AS dim,
           v{_PCA_ITERS}.v AS loading,
           {_sql_q6('nrm / 1000.0')} AS eigenvalue,
           {_sql_q6('nrm / 1000.0 / NULLIF(trace, 0)')} AS explained_share
    FROM v{_PCA_ITERS} CROSS JOIN n{_PCA_ITERS} CROSS JOIN tr
    """
    return _PCA_COV_SQL + "".join(its) + tail


@query(
    "llm_emb_pca_power",
    oracle=_pca_oracle(),
    ref="SURVEY §2 K139 [EXT] (top principal component by power iteration "
    "on the exact K109 covariance: 8 normalized matvec rounds from the "
    "uniform start vector, eigenvalue = final matvec norm (von Mises & "
    "Pollaczek-Geiringer 1929), explained share vs the trace — the "
    "anisotropy DIRECTION where K110 reads only its magnitude; "
    "everything after the d^2-bounded covariance agg lives on d-row "
    "tables)",
)
def llm_emb_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading eigenpair of the embedding covariance via 8 power
    iterations: v_{t+1} = Cv_t / ||Cv_t||, eigenvalue = the final matvec
    norm, explained_share = lambda1 / trace(C) — which single direction
    the embedding cloud collapses along (the common-anisotropy axis that
    'all-but-the-top' post-processing removes), and how much of the
    total variance it soaks up. Both engines walk the identical
    trajectory: the covariance is the K109 exact-integer cell, each
    matvec sum is dsum-quantized AT A x1000 GAIN (scale-invariant
    under the per-step normalization; without it the 1e-6 quantizer
    eats the tiny w^2 norm addends and the unit vector drifts ~0.3%),
    each normalized vector re-quantized; eigenvalue = norm/1000.

    Scale shape: one corpus pass exploding each row into its d^2 = 4096
    (i, j, product) terms (no self-join; map-side combine to d^2 cells),
    collected once — d² is bounded by the embedding-width contract, the
    sanctioned bounded-collect class — and the 8 iterations run on the
    driver over the d-row state with arithmetic identical to the former
    per-step-pinned join plans. The uniform start vector is deterministic;
    with the top eigengap positive, 8 rounds converge well past the 1e-6
    quantizer."""
    e = load(spark, sf_dir, "embeddings")
    # r14 (guide §1.2 per-task work): quantize each component ONCE per row
    # — inlined in the pair lambdas, embedding[i] was re-quantized for
    # every j (2·d² = 8192 double-mult+casts per row instead of d = 64).
    # Same device as llm_emb_gram; output bit-identical (the q array holds
    # exactly the former per-term values).
    q = e.select(
        F.expr(
            "transform(embedding, x ->"
            " CAST(CAST(x AS DOUBLE) * 1000000 + 0.5 AS BIGINT))"
        ).alias("q")
    )
    # r14 second pass: generate only the UPPER TRIANGLE i <= j — d(d+1)/2
    # cells instead of d², halving the dominant explode+agg corpus pass.
    # The lower triangle is mirrored after the collect below: cell (j, i)
    # aggregates the SAME row set (rows with size > max(i, j)), the same
    # Σ xi·xj (per-row products commute exactly in integers), and swaps
    # sxi/sxj — whose roles in covq multiply, and IEEE double
    # multiplication is commutative — so c_ji is bit-identical to c_ij.
    terms = q.select(
        F.explode(
            F.expr(
                """
                flatten(transform(sequence(0, size(q) - 1), i ->
                    transform(sequence(i, size(q) - 1), j ->
                        struct(
                            CAST(i AS INT) AS i, CAST(j AS INT) AS j,
                            q[i] AS xi, q[j] AS xj))))
                """
            )
        ).alias("t")
    ).select("t.i", "t.j", "t.xi", "t.xj")
    covq = (
        F.col("sp").cast("double") / F.col("n")
        - (F.col("sxi").cast("double") / F.col("n"))
        * (F.col("sxj").cast("double") / F.col("n"))
    ) / 1e12
    cov = terms.groupBy("i", "j").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            (F.col("xi") * F.col("xj")).cast("decimal(38,0)")
        ).alias("sp"),
        F.sum(F.col("xi").cast("decimal(38,0)")).alias("sxi"),
        F.sum(F.col("xj").cast("decimal(38,0)")).alias("sxj"),
    ).select("i", "j", _q6(covq).alias("c"))

    # r14 second pass (VERDICT r13 items 5/7 precedent — the markov / PAV
    # device): the 8 power iterations ran as ~32 chained pinned join/agg
    # plans over the d-row state — pure stage scheduling at every scale.
    # The covariance is bounded at d² rows BY CONSTRUCTION (d = the fixed
    # embedding width, independent of corpus size), i.e. the sanctioned
    # §5 bounded-collect class: one corpus-pass job collects it, and the
    # iterations run in plain Python with IDENTICAL arithmetic — the same
    # IEEE-754 double products in the same order, dsum's trunc-toward-zero
    # long addends (Python int()) summed exactly (order-free integer sums),
    # the same /1e6, math.sqrt = IEEE sqrt — so every intermediate vector,
    # and the output, is bit-identical to the former join spelling.
    import math

    cov_rows = [(r["i"], r["j"], r["c"]) for r in cov.collect()]
    # mirror the lower triangle (bit-exact — see the terms comment above)
    cov_rows += [(j, i, c) for i, j, c in cov_rows if i != j]

    def py_dsum(xs) -> float | None:
        # mirror of registry.dsum: sum of cast(x*1e6+0.5 as long), /1e6;
        # SUM skips NULL addends and is NULL over zero non-null rows
        tot, seen = 0, False
        for x in xs:
            if x is None:
                continue
            seen = True
            tot += int(x * 1000000.0 + 0.5)
        return float(tot) / 1000000.0 if seen else None

    def py_q6(x: float | None) -> float | None:
        # scalar mirror of _q6: trunc-toward-zero of x*1e6+0.5, then /1e6
        if x is None:
            return None
        return float(int(x * 1000000.0 + 0.5)) / 1000000.0

    dims = sorted({i for i, _, _ in cov_rows})
    d = len(dims)
    out_schema = (
        "dim int, loading double, eigenvalue double, explained_share double"
    )
    if d == 0:
        return spark.createDataFrame([], out_schema)
    v = {dim: 1.0 / math.sqrt(float(d)) for dim in dims}
    nrm: float | None = None
    for _ in range(_PCA_ITERS):
        w = {
            dim: py_dsum(
                (c * v[j]) * 1000.0 if v[j] is not None else None
                for i, j, c in cov_rows
                if i == dim
            )
            for dim in dims
        }
        s = py_dsum(
            wi * wi if wi is not None else None for wi in w.values()
        )
        nrm = math.sqrt(s) if s is not None else None
        v = {
            dim: py_q6(
                w[dim] / nrm
                if nrm is not None and nrm != 0.0 and w[dim] is not None
                else None
            )
            for dim in dims
        }
    trace = py_dsum(c for i, j, c in cov_rows if i == j)
    eig = py_q6(nrm / 1000.0 if nrm is not None else None)
    share = py_q6(
        (nrm / 1000.0) / trace
        if nrm is not None and trace is not None and trace != 0.0
        else None
    )
    return spark.createDataFrame(
        [(dim, v[dim], eig, share) for dim in dims], out_schema
    )


# ---------------------------------------------------------------------------
# D92 — Bass diffusion fit on daily adoption
# ---------------------------------------------------------------------------

_BASS_G = 1_000_000.0  # moment gain: x,y in [0,1] -> addends near 1e6, so the
# 1e-6 dsum quantizer works at an effective 1e-12 on the raw moments (the
# K139 PCA gain device); scaled addends stay < 9.2e12.


@query(
    "events_bass_diffusion",
    oracle=f"""
    WITH a AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
    ),
    bounds AS (
        SELECT MIN(d0) AS lo, MAX(d0) AS hi,
               CAST(COUNT(*) AS BIGINT) AS m0 FROM a
    ),
    newbyday AS (
        SELECT d0, CAST(COUNT(*) AS BIGINT) AS nnew FROM a GROUP BY d0
    ),
    spine AS (
        SELECT i AS t FROM bounds,
               unnest(range(0, date_diff('day', lo, hi) + 1)) AS u(i)
    ),
    daily AS (
        SELECT s.t, COALESCE(n.nnew, 0) AS nnew
        FROM spine s
        LEFT JOIN (SELECT date_diff('day', b.lo, n.d0) AS t, n.nnew
                   FROM newbyday n CROSS JOIN bounds b) n USING (t)
    ),
    cum AS (
        SELECT t, nnew,
               COALESCE(SUM(nnew) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cprev
        FROM daily
    ),
    xy AS (
        SELECT t, CAST(cprev AS DOUBLE) / b.m0 AS x,
               CAST(nnew AS DOUBLE) / b.m0 AS y
        FROM cum CROSS JOIN bounds b
    ),
    mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               ({sql_dsum(f'x * {_BASS_G}')}) / {_BASS_G} AS sx,
               ({sql_dsum(f'x * x * {_BASS_G}')}) / {_BASS_G} AS sx2,
               ({sql_dsum(f'x * x * x * {_BASS_G}')}) / {_BASS_G} AS sx3,
               ({sql_dsum(f'x * x * x * x * {_BASS_G}')}) / {_BASS_G} AS sx4,
               ({sql_dsum(f'y * {_BASS_G}')}) / {_BASS_G} AS sy,
               ({sql_dsum(f'x * y * {_BASS_G}')}) / {_BASS_G} AS sxy,
               ({sql_dsum(f'x * x * y * {_BASS_G}')}) / {_BASS_G} AS sx2y
        FROM xy
    ),
    coef AS (
        SELECT n, m0,
               (n * (sx2 * sx4 - sx3 * sx3)
                - sx * (sx * sx4 - sx3 * sx2)
                + sx2 * (sx * sx3 - sx2 * sx2)) AS det,
               (sy * (sx2 * sx4 - sx3 * sx3)
                - sx * (sxy * sx4 - sx3 * sx2y)
                + sx2 * (sxy * sx3 - sx2 * sx2y)) AS det_a,
               (n * (sxy * sx4 - sx3 * sx2y)
                - sy * (sx * sx4 - sx3 * sx2)
                + sx2 * (sx * sx2y - sxy * sx2)) AS det_b,
               (n * (sx2 * sx2y - sxy * sx3)
                - sx * (sx * sx2y - sxy * sx2)
                + sy * (sx * sx3 - sx2 * sx2)) AS det_c
        FROM mom CROSS JOIN bounds
    ),
    abc AS (
        SELECT n, m0,
               det_a / NULLIF(det, 0) AS ca,
               det_b / NULLIF(det, 0) AS cb,
               det_c / NULLIF(det, 0) AS cc
        FROM coef
    ),
    root AS (
        SELECT n, m0, ca, cb, cc,
               CASE WHEN cc < 0 AND cb * cb - 4 * cc * ca >= 0
                    THEN (-cb - sqrt(cb * cb - 4 * cc * ca)) / (2 * cc)
               END AS mfrac
        FROM abc
    ),
    pq AS (
        SELECT n, m0, ca, cb, cc, mfrac,
               ca / NULLIF(mfrac, 0) AS p, -cc * mfrac AS q
        FROM root
    )
    SELECT n AS n_days, m0 AS m0_adopters,
           {_sql_q6('ca')} AS coef_a, {_sql_q6('cb')} AS coef_b,
           {_sql_q6('cc')} AS coef_c,
           {_sql_q6('mfrac * m0')} AS m_hat,
           {_sql_q6('p')} AS p_innovation,
           {_sql_q6('q')} AS q_imitation,
           CASE WHEN p > 0 AND q > 0
                THEN {_sql_q6('ln(q / p) / (p + q)')} END AS t_peak_days
    FROM pq
    """,
    ref="SURVEY §2 D92 [EXT] (Bass 1969 diffusion: discrete-analogue OLS "
    "n_t = a + b*C + c*C^2 on the zero-filled adoption spine in "
    "penetration-fraction units, market size from the quadratic's "
    "positive root M = (-b - sqrt(b^2-4ac))/2c, p = a/M, q = -cM, "
    "peak at ln(q/p)/(p+q) — the adoption forecast D24's raw cohort "
    "read cannot give; all moments off a calendar-bounded daily table)",
)
def events_bass_diffusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bass diffusion-model fit on first-event adoption: who still hasn't
    adopted, and when does adoption peak? Discrete Bass regression
    (Bass 1969; Mahajan/Muller/Bass 1990 review): daily new adopters
    n_t = a + b*C_{t-1} + c*C_{t-1}^2, with C the cumulative count. In
    penetration units (x = C/m0, y = n/m0) the moments stay in [0,1], so
    the quantized sums ride a x1e6 gain (the K139 device) instead of a
    wider accumulator. Ultimate market size m_hat = root of the fitted
    quadratic, innovation/imitation split (p, q), and the peak-adoption
    day ln(q/p)/(p+q). Degenerate fits (singular normal equations,
    non-negative c, complex roots, p<=0) degrade to NULL columns
    identically in both engines.

    Scale shape: one user-keyed agg (first event day), then a
    calendar-bounded daily spine — the cumulative window and the seven
    OLS moments all run on <= |days| rows; the corpus is scanned once."""
    e = load(spark, sf_dir, "events")
    a = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d0"))
    a = pin(a, eager=False)  # consumed by bounds + newbyday
    bounds = pin(
        a.agg(
            F.min("d0").alias("lo"),
            F.max("d0").alias("hi"),
            F.count(F.lit(1)).cast("bigint").alias("m0"),
        ),
        eager=False,
    )
    newbyday = a.groupBy("d0").agg(
        F.count(F.lit(1)).cast("bigint").alias("nnew")
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.lit(0), F.datediff(F.col("hi"), F.col("lo")))
        ).alias("t")
    )
    nbt = newbyday.crossJoin(F.broadcast(bounds)).select(
        F.datediff(F.col("d0"), F.col("lo")).alias("t"), "nnew"
    )
    daily = (
        spine.join(nbt, "t", "left")
        .select("t", F.coalesce("nnew", F.lit(0)).alias("nnew"))
    )
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    cum = daily.select(
        "t", "nnew", F.coalesce(F.sum("nnew").over(w), F.lit(0)).alias("cprev")
    )
    xy = cum.crossJoin(F.broadcast(bounds)).select(
        (F.col("cprev").cast("double") / F.col("m0")).alias("x"),
        (F.col("nnew").cast("double") / F.col("m0")).alias("y"),
    )
    g = F.lit(_BASS_G)
    x, y = F.col("x"), F.col("y")
    mom = xy.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (dsum(x * g) / g).alias("sx"),
        (dsum(x * x * g) / g).alias("sx2"),
        (dsum(x * x * x * g) / g).alias("sx3"),
        (dsum(x * x * x * x * g) / g).alias("sx4"),
        (dsum(y * g) / g).alias("sy"),
        (dsum(x * y * g) / g).alias("sxy"),
        (dsum(x * x * y * g) / g).alias("sx2y"),
    )
    n, sx, sx2, sx3, sx4, sy, sxy, sx2y = (
        F.col("n"), F.col("sx"), F.col("sx2"), F.col("sx3"),
        F.col("sx4"), F.col("sy"), F.col("sxy"), F.col("sx2y"),
    )
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
    coef = mom.crossJoin(F.broadcast(bounds)).select(
        "n",
        "m0",
        F.try_divide(det_a, F.nullif(det, F.lit(0.0))).alias("ca"),
        F.try_divide(det_b, F.nullif(det, F.lit(0.0))).alias("cb"),
        F.try_divide(det_c, F.nullif(det, F.lit(0.0))).alias("cc"),
    )
    ca, cb, cc = F.col("ca"), F.col("cb"), F.col("cc")
    disc = cb * cb - F.lit(4.0) * cc * ca
    root = coef.select(
        "n",
        "m0",
        "ca",
        "cb",
        "cc",
        F.when(
            (cc < 0) & (disc >= 0),
            (-cb - F.sqrt(disc)) / (F.lit(2.0) * cc),
        ).alias("mfrac"),
    )
    mfrac = F.col("mfrac")
    pq = root.select(
        "n",
        "m0",
        "ca",
        "cb",
        "cc",
        "mfrac",
        F.try_divide(ca, F.nullif(mfrac, F.lit(0.0))).alias("p"),
        (-cc * mfrac).alias("q"),
    )
    p, q = F.col("p"), F.col("q")
    return pq.select(
        F.col("n").alias("n_days"),
        F.col("m0").alias("m0_adopters"),
        _q6(ca).alias("coef_a"),
        _q6(cb).alias("coef_b"),
        _q6(cc).alias("coef_c"),
        _q6(mfrac * F.col("m0")).alias("m_hat"),
        _q6(p).alias("p_innovation"),
        _q6(q).alias("q_imitation"),
        F.when((p > 0) & (q > 0), _q6(F.log(q / p) / (p + q))).alias(
            "t_peak_days"
        ),
    )


# ---------------------------------------------------------------------------
# D93 — OLS daily trend with Newey-West (HAC) standard errors
# ---------------------------------------------------------------------------


@query(
    "events_newey_west_trend",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d,
               ({sql_dsum('value')}) / COUNT(*) AS y
        FROM events WHERE value IS NOT NULL GROUP BY d
    ),
    idx AS (
        SELECT y, CAST(row_number() OVER (ORDER BY d) AS DOUBLE) AS t
        FROM daily
    ),
    mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               {sql_dsum('t')} AS st, {sql_dsum('t * t')} AS st2,
               {sql_dsum('y')} AS sy, {sql_dsum('t * y')} AS sty
        FROM idx
    ),
    fit AS (
        SELECT n, st / n AS tbar, sy / n AS ybar,
               (n * sty - st * sy) / NULLIF(n * st2 - st * st, 0) AS beta,
               st2 - st * st / n AS sxx,
               CASE WHEN n > 0
                    THEN CAST(floor(4 * exp((2.0 / 9.0) * ln(n / 100.0)))
                              AS BIGINT)
                    ELSE 0 END AS lag_l
        FROM mom
    ),
    u AS (
        SELECT idx.t,
               (idx.t - f.tbar)
               * (idx.y - f.ybar - f.beta * (idx.t - f.tbar)) AS u,
               (idx.y - f.ybar - f.beta * (idx.t - f.tbar)) AS e
        FROM idx CROSS JOIN fit f
    ),
    s0 AS (
        SELECT {sql_dsum('u * u')} AS s0, {sql_dsum('e * e')} AS se2 FROM u
    ),
    lagged AS (
        SELECT a.u AS ua, b.u AS ub, h.h
        FROM u a
        CROSS JOIN (SELECT unnest(range(1, (SELECT greatest(lag_l, 1) + 1
                                            FROM fit))) AS h) h
        JOIN u b ON b.t = a.t + h.h
        CROSS JOIN fit f
        WHERE h.h <= f.lag_l
    ),
    scross AS (
        SELECT COALESCE({sql_dsum('(1.0 - h / (f.lag_l + 1.0)) * ua * ub')},
                        0.0) AS s_cross
        FROM lagged CROSS JOIN fit f
    )
    SELECT f.n AS n_days, f.lag_l,
           {_sql_q6('f.beta')} AS beta,
           {_sql_q6('sqrt((s0.se2 / NULLIF(f.n - 2, 0)) / NULLIF(f.sxx, 0))')}
               AS se_ols,
           {_sql_q6('sqrt((s0.s0 + 2 * sx.s_cross)'
                    ' / NULLIF(f.sxx * f.sxx, 0))')} AS se_hac,
           {_sql_q6('f.beta / NULLIF(sqrt((s0.se2 / NULLIF(f.n - 2, 0))'
                    ' / NULLIF(f.sxx, 0)), 0)')} AS t_ols,
           {_sql_q6('f.beta / NULLIF(sqrt((s0.s0 + 2 * sx.s_cross)'
                    ' / NULLIF(f.sxx * f.sxx, 0)), 0)')} AS t_hac
    FROM fit f CROSS JOIN s0 CROSS JOIN scross sx
    """,
    ref="SURVEY §2 D93 [EXT] (Newey & West 1987 HAC inference for the "
    "daily OLS trend: Bartlett-kernel weighted autocovariances of the "
    "score series u_t = (t - tbar) e_t at the standard lag rule "
    "L = floor(4 (T/100)^(2/9)) — serial correlation inflates the naive "
    "OLS t-stat on autocorrelated dailies, the inference D28's slope "
    "and D62's Mann-Kendall don't provide; all sums on the "
    "calendar-bounded daily table)",
)
def events_newey_west_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-mean trend slope with autocorrelation-robust (Newey-West)
    standard errors: the OLS beta is unchanged, but its variance uses the
    Bartlett-kernel HAC estimator S = sum(u^2) + 2 sum_h w_h sum_t u_t
    u_{t+h}, w_h = 1 - h/(L+1), so a positively autocorrelated series
    (every real daily metric) doesn't fake significance. Reports both the
    naive and HAC t so the inflation is visible.

    Scale shape: one corpus scan into the day-keyed mean agg; everything
    after (index, moments, residual scores, the h<=L lag join) lives on
    the calendar-bounded daily table — the lag pairs are |days| * L rows.
    Degenerate series (n<3, zero x-variance) yield NULL errors in both
    engines via the same NULLIF guards."""
    e = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    daily = e.groupBy(F.to_date("ts").alias("d")).agg(
        (dsum("value") / F.count(F.lit(1))).alias("y")
    )
    idx = pin(
        daily.select(
            "y",
            F.row_number().over(Window.orderBy("d")).cast("double").alias("t"),
        ),
        eager=False,
    )
    mom = idx.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum("t").alias("st"),
        dsum(F.col("t") * F.col("t")).alias("st2"),
        dsum("y").alias("sy"),
        dsum(F.col("t") * F.col("y")).alias("sty"),
    )
    n, st, st2, sy, sty = (
        F.col("n"), F.col("st"), F.col("st2"), F.col("sy"), F.col("sty")
    )
    fit = pin(
        mom.select(
            "n",
            (st / n).alias("tbar"),
            (sy / n).alias("ybar"),
            F.try_divide(
                n * sty - st * sy, F.nullif(n * st2 - st * st, F.lit(0.0))
            ).alias("beta"),
            (st2 - st * st / n).alias("sxx"),
            # n > 0 guard (ADVICE r10): on an EMPTY daily table Spark's
            # log(0) yields NULL (lag_l NULL) while DuckDB's ln(0.0) yields
            # -inf (lag_l 0) — the CASE pins both engines to lag_l = 0.
            F.when(
                n > 0,
                F.floor(
                    F.lit(4.0)
                    * F.exp(F.lit(2.0 / 9.0) * F.log(n / F.lit(100.0)))
                ),
            )
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("lag_l"),
        ),
        eager=False,
    )
    ucol = (F.col("t") - F.col("tbar")) * (
        F.col("y") - F.col("ybar") - F.col("beta") * (F.col("t") - F.col("tbar"))
    )
    ecol = F.col("y") - F.col("ybar") - F.col("beta") * (
        F.col("t") - F.col("tbar")
    )
    u = pin(
        idx.crossJoin(F.broadcast(fit)).select(
            "t", ucol.alias("u"), ecol.alias("e")
        ),
        eager=False,
    )
    s0 = u.agg(
        dsum(F.col("u") * F.col("u")).alias("s0"),
        dsum(F.col("e") * F.col("e")).alias("se2"),
    )
    hladder = u.crossJoin(F.broadcast(fit)).select(
        "t",
        "u",
        "lag_l",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.col("lag_l"), F.lit(1)).cast("int"))
        ).alias("h"),
    ).where(F.col("h") <= F.col("lag_l"))
    b = u.select(F.col("t").alias("t2"), F.col("u").alias("ub"))
    lagged = hladder.join(
        b, F.col("t2") == F.col("t") + F.col("h").cast("double")
    )
    scross = lagged.crossJoin(F.broadcast(fit.select(F.col("lag_l").alias("ll")))).agg(
        F.coalesce(
            dsum(
                (F.lit(1.0) - F.col("h") / (F.col("ll") + F.lit(1.0)))
                * F.col("u")
                * F.col("ub")
            ),
            F.lit(0.0),
        ).alias("s_cross")
    )
    se2n = F.col("se2") / F.nullif((F.col("n") - 2).cast("double"), F.lit(0.0))
    var_ols = F.try_divide(se2n, F.nullif(F.col("sxx"), F.lit(0.0)))
    var_hac = F.try_divide(
        F.col("s0") + F.lit(2.0) * F.col("s_cross"),
        F.nullif(F.col("sxx") * F.col("sxx"), F.lit(0.0)),
    )
    return (
        fit.crossJoin(F.broadcast(s0))
        .crossJoin(F.broadcast(scross))
        .select(
            F.col("n").alias("n_days"),
            "lag_l",
            _q6(F.col("beta")).alias("beta"),
            _q6(F.sqrt(var_ols)).alias("se_ols"),
            _q6(F.sqrt(var_hac)).alias("se_hac"),
            _q6(
                F.try_divide(
                    F.col("beta"), F.nullif(F.sqrt(var_ols), F.lit(0.0))
                )
            ).alias("t_ols"),
            _q6(
                F.try_divide(
                    F.col("beta"), F.nullif(F.sqrt(var_hac), F.lit(0.0))
                )
            ).alias("t_hac"),
        )
    )


# ---------------------------------------------------------------------------
# D94 — Little's law fulfillment audit
# ---------------------------------------------------------------------------


@query(
    "orders_littles_law_audit",
    oracle=f"""
    WITH done AS (
        SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS end_d
        FROM lineitem GROUP BY l_orderkey
    ),
    ords AS (
        SELECT CAST(o.o_orderdate AS DATE) AS start_d, d.end_d
        FROM orders o JOIN done d ON d.l_orderkey = o.o_orderkey
    ),
    bounds AS (
        SELECT MIN(start_d) AS lo,
               date_diff('day', MIN(start_d), MAX(end_d)) AS span
        FROM ords
    ),
    win AS (
        SELECT lo, span, span // 4 AS q1, (3 * span) // 4 AS q3 FROM bounds
    ),
    rel AS (
        SELECT date_diff('day', w.lo, o.start_d) AS ds,
               date_diff('day', w.lo, o.end_d) AS de,
               w.q1, w.q3
        FROM ords o CROSS JOIN win w
    ),
    m AS (
        SELECT CAST(MAX(q3 - q1 + 1) AS BIGINT) AS window_days,
               CAST(SUM(greatest(0, least(de, q3) - greatest(ds, q1) + 1))
                    AS BIGINT) AS wip_days,
               CAST(SUM(CASE WHEN de BETWEEN q1 AND q3 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_completed,
               CAST(SUM(CASE WHEN de BETWEEN q1 AND q3
                             THEN de - ds + 1 ELSE 0 END) AS BIGINT)
                   AS dur_days
        FROM rel
    )
    SELECT window_days, n_completed,
           {_sql_q6('CAST(wip_days AS DOUBLE) / window_days')} AS l_avg_wip,
           {_sql_q6('CAST(n_completed AS DOUBLE) / window_days')}
               AS lambda_per_day,
           {_sql_q6('CAST(dur_days AS DOUBLE) / NULLIF(n_completed, 0)')}
               AS w_avg_days,
           {_sql_q6('(CAST(n_completed AS DOUBLE) / window_days)'
                    ' * (CAST(dur_days AS DOUBLE) / NULLIF(n_completed, 0))')}
               AS lw_product,
           {_sql_q6('((CAST(wip_days AS DOUBLE) / window_days)'
                    ' - (CAST(dur_days AS DOUBLE) / window_days))'
                    ' / NULLIF(CAST(wip_days AS DOUBLE) / window_days, 0)')}
               AS rel_gap
    FROM m
    """,
    ref="SURVEY §2 D94 [EXT] (Little's law L = lambda*W (Little 1961) "
    "audited on the interior [span/4, 3*span/4] window of the order "
    "fulfillment process: time-average WIP from exact interval overlaps "
    "(never a day explode), throughput and mean flow time from "
    "window-completing orders; the relative gap measures how far the "
    "process is from the stationarity the law assumes — the queueing "
    "consistency check behind every ops dashboard)",
)
def orders_littles_law_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's law consistency audit over order fulfillment: an order is
    in progress from o_orderdate to its last line's shipdate. On the
    interior window (middle half of the horizon, integer day offsets so
    every bound is exact), measure independently: L = time-average WIP
    (sum of per-order day-overlaps with the window / window days),
    lambda = completions per window day, W = mean flow time of the
    completing orders. In steady state L = lambda*W; the reported
    relative gap is the stationarity violation (edge effects, drift).

    Scale shape: one lineitem agg keyed by orderkey (the only
    corpus-sized exchange), an AQE-planned join to orders, a broadcast
    1-row bounds/window table, then exact integer interval arithmetic
    per order into one final agg — no day spine ever materializes, so
    horizon length never multiplies the row count."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    done = li.groupBy("l_orderkey").agg(
        F.max(F.to_date("l_shipdate")).alias("end_d")
    )
    ords = pin(
        o.join(done, o.o_orderkey == done.l_orderkey).select(
            F.to_date("o_orderdate").alias("start_d"), "end_d"
        ),
        eager=False,
    )
    bounds = ords.agg(
        F.min("start_d").alias("lo"),
        F.datediff(F.max("end_d"), F.min("start_d")).alias("span"),
    )
    win = bounds.select(
        "lo",
        "span",
        F.floor(F.col("span") / 4).cast("bigint").alias("q1"),
        F.floor(F.col("span") * 3 / 4).cast("bigint").alias("q3"),
    )
    rel = ords.crossJoin(F.broadcast(win)).select(
        F.datediff(F.col("start_d"), F.col("lo")).cast("bigint").alias("ds"),
        F.datediff(F.col("end_d"), F.col("lo")).cast("bigint").alias("de"),
        "q1",
        "q3",
    )
    ds, de, q1, q3 = F.col("ds"), F.col("de"), F.col("q1"), F.col("q3")
    in_win = de.between(q1, q3)
    m = rel.agg(
        F.max(q3 - q1 + 1).cast("bigint").alias("window_days"),
        F.sum(
            F.greatest(F.lit(0).cast("bigint"), F.least(de, q3) - F.greatest(ds, q1) + 1)
        )
        .cast("bigint")
        .alias("wip_days"),
        F.sum(F.when(in_win, 1).otherwise(0)).cast("bigint").alias("n_completed"),
        F.sum(F.when(in_win, de - ds + 1).otherwise(0))
        .cast("bigint")
        .alias("dur_days"),
    )
    wd = F.col("window_days").cast("double")
    lavg = F.col("wip_days").cast("double") / wd
    lam = F.col("n_completed").cast("double") / wd
    wavg = F.try_divide(
        F.col("dur_days").cast("double"),
        F.nullif(F.col("n_completed").cast("double"), F.lit(0.0)),
    )
    return m.select(
        "window_days",
        "n_completed",
        _q6(lavg).alias("l_avg_wip"),
        _q6(lam).alias("lambda_per_day"),
        _q6(wavg).alias("w_avg_days"),
        _q6(lam * wavg).alias("lw_product"),
        _q6(
            F.try_divide(
                lavg - F.col("dur_days").cast("double") / wd,
                F.nullif(lavg, F.lit(0.0)),
            )
        ).alias("rel_gap"),
    )


# ---------------------------------------------------------------------------
# K140 — Simple Good-Turing frequency smoothing
# ---------------------------------------------------------------------------


@query(
    "llm_good_turing",
    oracle=f"""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents
        WHERE text IS NOT NULL AND len(text) > 0
    ),
    wc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS r FROM toks GROUP BY w),
    cc AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS nr FROM wc GROUP BY r),
    tot AS (
        SELECT CAST(SUM(r * nr) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN r = 1 THEN nr ELSE 0 END) AS BIGINT) AS n1
        FROM cc
    ),
    ladder AS (
        SELECT r, nr,
               COALESCE(LAG(r) OVER (ORDER BY r), 0) AS q,
               LEAD(r) OVER (ORDER BY r) AS t_next
        FROM cc
    ),
    z AS (
        SELECT r, nr,
               nr / (0.5 * (COALESCE(t_next, 2 * r - q) - q)) AS zr
        FROM ladder
    ),
    lz AS (
        SELECT r, nr, zr,
               {_sql_q6('ln(r)')} AS lr, {_sql_q6('ln(zr)')} AS lzr
        FROM z
    ),
    fitm AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               {sql_dsum('lr')} AS slr, {sql_dsum('lr * lr')} AS slr2,
               {sql_dsum('lzr')} AS slz, {sql_dsum('lr * lzr')} AS slrlz
        FROM lz
    ),
    fit AS (
        SELECT (k * slrlz - slr * slz) / NULLIF(k * slr2 - slr * slr, 0)
                   AS b
        FROM fitm
    ),
    nxt AS (
        SELECT a.r, a.nr, a.zr, b.nr AS nr_next
        FROM lz a LEFT JOIN cc b ON b.r = a.r + 1
    )
    SELECT n.r, n.nr,
           {_sql_q6('n.zr')} AS z_r,
           CASE WHEN n.nr_next IS NOT NULL THEN
               {_sql_q6('(n.r + 1.0) * n.nr_next / n.nr')} END
               AS r_star_turing,
           {_sql_q6('(n.r + 1.0) * exp(f.b * (ln(n.r + 1.0) - ln(n.r)))')}
               AS r_star_lgt,
           {_sql_q6('f.b')} AS lgt_slope,
           {_sql_q6('CAST(t.n1 AS DOUBLE) / t.n_tokens')} AS p_unseen
    FROM nxt n CROSS JOIN fit f CROSS JOIN tot t
    """,
    ref="SURVEY §2 K140 [EXT] (Simple Good-Turing (Good 1953; Gale & "
    "Sampson 1995): counts-of-counts N_r, Gale's Z_r = N_r/(0.5(t-q)) "
    "gap smoothing, the raw Turing estimate r* = (r+1)N_{r+1}/N_r next "
    "to the log-log linear-Good-Turing fit r*(LGT) = "
    "(r+1)(1+1/r)^b, and the unseen mass P0 = N_1/N — the smoothing "
    "complement of K138's Kneser-Ney; everything after the word count "
    "lives on the counts-of-counts ladder)",
)
def llm_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple Good-Turing smoothing table for the unigram corpus model:
    per observed frequency r, the counts-of-counts N_r, Gale's
    gap-normalized Z_r, the raw Turing adjusted count (NULL where
    N_{r+1} = 0 — exactly the holes the smoothed fit exists to fill),
    the linear-Good-Turing estimate from the log Z ~ log r regression,
    and the corpus-level unseen probability mass N_1/N. The per-row ln
    terms are 1e-6-quantized before the moment sums so both engines fit
    the same line (the house transcendental discipline).

    Scale shape: one corpus scan into the word-count agg (the only
    corpus-sized exchange, map-side combined); the counts-of-counts
    ladder is tiny (distinct frequencies ~ O(sqrt(vocab))), so its
    windows, regression moments, and self-join run on a bounded table
    broadcast everywhere."""
    d = load(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    wc = (
        d.select(F.explode(text.words("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("r"))
    )
    cc = pin(
        wc.groupBy("r").agg(F.count(F.lit(1)).cast("bigint").alias("nr")),
        eager=False,
    )
    tot = cc.agg(
        F.sum(F.col("r") * F.col("nr")).cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("r") == 1, F.col("nr")).otherwise(0))
        .cast("bigint")
        .alias("n1"),
    )
    wl = Window.orderBy("r")
    ladder = cc.select(
        "r",
        "nr",
        F.coalesce(F.lag("r").over(wl), F.lit(0).cast("bigint")).alias("q"),
        F.lead("r").over(wl).alias("t_next"),
    )
    z = ladder.select(
        "r",
        "nr",
        (
            F.col("nr")
            / (
                F.lit(0.5)
                * (
                    F.coalesce(F.col("t_next"), 2 * F.col("r") - F.col("q"))
                    - F.col("q")
                )
            )
        ).alias("zr"),
    )
    lz = pin(
        z.select(
            "r",
            "nr",
            "zr",
            _q6(F.log("r")).alias("lr"),
            _q6(F.log("zr")).alias("lzr"),
        ),
        eager=False,
    )
    fitm = lz.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        dsum("lr").alias("slr"),
        dsum(F.col("lr") * F.col("lr")).alias("slr2"),
        dsum("lzr").alias("slz"),
        dsum(F.col("lr") * F.col("lzr")).alias("slrlz"),
    )
    fit = fitm.select(
        F.try_divide(
            F.col("k") * F.col("slrlz") - F.col("slr") * F.col("slz"),
            F.nullif(
                F.col("k") * F.col("slr2") - F.col("slr") * F.col("slr"),
                F.lit(0.0),
            ),
        ).alias("b")
    )
    nxt = lz.join(
        cc.select((F.col("r") - 1).alias("r"), F.col("nr").alias("nr_next")),
        "r",
        "left",
    )
    return (
        nxt.crossJoin(F.broadcast(fit))
        .crossJoin(F.broadcast(tot))
        .select(
            "r",
            "nr",
            _q6(F.col("zr")).alias("z_r"),
            F.when(
                F.col("nr_next").isNotNull(),
                _q6((F.col("r") + F.lit(1.0)) * F.col("nr_next") / F.col("nr")),
            ).alias("r_star_turing"),
            _q6(
                (F.col("r") + F.lit(1.0))
                * F.exp(
                    F.col("b")
                    * (F.log(F.col("r") + F.lit(1.0)) - F.log(F.col("r")))
                )
            ).alias("r_star_lgt"),
            _q6(F.col("b")).alias("lgt_slope"),
            _q6(
                F.col("n1").cast("double") / F.col("n_tokens")
            ).alias("p_unseen"),
        )
    )


# ---------------------------------------------------------------------------
# K141 — Kneser-Ney bigram holdout perplexity
# ---------------------------------------------------------------------------

_LCG_BUCKET = "(((doc_id % 2147483648) * 2654435761) % 4294967296) % 100"
_LNP = "ln(p)"  # quantized per eval type before the token-weighted sum


@query(
    "llm_kn_perplexity",
    oracle=f"""
    WITH tagged AS (
        SELECT text, {_LCG_BUCKET} AS bucket FROM documents
        WHERE text IS NOT NULL AND len(text) > 0
    ),
    trbg AS (
        SELECT unnest(list_transform(range(1, len(w)),
                      i -> array_to_string(w[i:i+1], ' '))) AS gram
        FROM (SELECT string_split(text, ' ') AS w FROM tagged
              WHERE bucket < 80)
    ),
    c2 AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS c FROM trbg GROUP BY gram),
    sp AS (
        SELECT split_part(gram, ' ', 1) AS w1,
               split_part(gram, ' ', 2) AS w2, c
        FROM c2
    ),
    c1 AS (
        SELECT w1, CAST(SUM(c) AS BIGINT) AS ctot,
               CAST(COUNT(*) AS BIGINT) AS n1f
        FROM sp GROUP BY w1
    ),
    cont AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1p FROM sp GROUP BY w2),
    nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS nbi FROM sp),
    evbg AS (
        SELECT unnest(list_transform(range(1, len(w)),
                      i -> array_to_string(w[i:i+1], ' '))) AS gram
        FROM (SELECT string_split(text, ' ') AS w FROM tagged
              WHERE bucket >= 90)
    ),
    ev AS (
        SELECT split_part(gram, ' ', 1) AS w1,
               split_part(gram, ' ', 2) AS w2,
               CAST(COUNT(*) AS BIGINT) AS m
        FROM evbg GROUP BY 1, 2
    ),
    scored AS (
        SELECT ev.m,
               CASE WHEN sp.c IS NOT NULL THEN 1 ELSE 0 END AS hit,
               CASE WHEN sp.c IS NULL AND c1.ctot IS NOT NULL
                         AND cont.n1p IS NOT NULL THEN 1 ELSE 0 END
                   AS backoff,
               CASE WHEN c1.ctot IS NULL AND cont.n1p IS NOT NULL
                    THEN 1 ELSE 0 END AS w1_unseen,
               CASE WHEN cont.n1p IS NULL THEN 1 ELSE 0 END AS oov,
               CASE
                   WHEN sp.c IS NOT NULL THEN
                       greatest(sp.c - {_KN_D}, 0) / c1.ctot
                       + {_KN_D} * c1.n1f / c1.ctot
                         * (cont.n1p * 1.0 / nb.nbi)
                   WHEN c1.ctot IS NOT NULL AND cont.n1p IS NOT NULL THEN
                       {_KN_D} * c1.n1f / c1.ctot
                       * (cont.n1p * 1.0 / nb.nbi)
                   WHEN cont.n1p IS NOT NULL THEN
                       cont.n1p * 1.0 / nb.nbi
                   ELSE 1.0 / (nb.nbi + 1)
               END AS p
        FROM ev
        LEFT JOIN sp ON sp.w1 = ev.w1 AND sp.w2 = ev.w2
        LEFT JOIN c1 ON c1.w1 = ev.w1
        LEFT JOIN cont ON cont.w2 = ev.w2
        CROSS JOIN nb
    )
    SELECT CAST(SUM(m) AS BIGINT) AS n_eval_bigrams,
           CAST(COUNT(*) AS BIGINT) AS n_eval_types,
           CAST(SUM(m * hit) AS BIGINT) AS n_seen,
           CAST(SUM(m * backoff) AS BIGINT) AS n_backoff,
           CAST(SUM(m * w1_unseen) AS BIGINT) AS n_w1_unseen,
           CAST(SUM(m * oov) AS BIGINT) AS n_oov,
           {_sql_q6(f"-({sql_dsum(f'm * ({_sql_q6(_LNP)})')}) / SUM(m)")}
               AS cross_entropy_nats,
           {_sql_q6(f"exp(-({sql_dsum(f'm * ({_sql_q6(_LNP)})')}) / SUM(m))")}
               AS perplexity
    FROM scored
    """,
    ref="SURVEY §2 K141 [EXT] (the evaluation loop for K138's "
    "interpolated Kneser-Ney model: train on the Knuth-centile <80 "
    "split, score the >=90 holdout with the tiered backoff ladder "
    "seen-bigram -> discount-backoff -> continuation-only -> uniform "
    "1/(B+1) floor, perplexity = exp of the token-weighted mean "
    "negative quantized-log probability — Chen & Goodman 1999's "
    "held-out methodology)",
)
def llm_kn_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holdout perplexity of the interpolated Kneser-Ney bigram LM: the
    K138 model is fit on the train split (Knuth LCG centile < 80 — the
    same content-stable split as llm_train_eval_split, so the eval
    boundary never migrates) and scored on the test split (centile >=
    90). Eval bigrams fall through a tiered ladder that is total (every
    bigram gets positive probability): seen bigram -> KN formula;
    unseen bigram with seen context and continuation -> the discounted
    backoff term; unseen context -> continuation probability alone;
    unseen successor -> the uniform 1/(B+1) floor. Per-type ln(p) is
    1e-6-quantized before the token-weighted sum (house transcendental
    discipline), so cross-entropy and perplexity agree bit-for-bit
    cross-engine.

    Scale shape: two corpus scans (train / eval bigram explosions), each
    collapsing map-side into gram-type counts; all joins are between
    vocabulary-bounded type tables (eval types x model types, AQE-planned
    — never row-level); the output is one row."""
    d = load(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    bucket = (
        ((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761))
        % F.lit(4294967296)
    ) % 100
    tagged = d.select("text", bucket.alias("bucket"))
    trbg = tagged.where(F.col("bucket") < 80).select(
        F.explode(text.shingles("text", 2)).alias("gram")
    )
    c2 = trbg.groupBy("gram").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    sp = pin(
        c2.select(
            F.split_part(F.col("gram"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("gram"), F.lit(" "), F.lit(2)).alias("w2"),
            "c",
        ),
        eager=False,
    )
    c1 = sp.groupBy("w1").agg(
        F.sum("c").cast("bigint").alias("ctot"),
        F.count(F.lit(1)).cast("bigint").alias("n1f"),
    )
    cont = sp.groupBy("w2").agg(F.count(F.lit(1)).cast("bigint").alias("n1p"))
    nb = sp.agg(F.count(F.lit(1)).cast("bigint").alias("nbi"))
    evbg = tagged.where(F.col("bucket") >= 90).select(
        F.explode(text.shingles("text", 2)).alias("gram")
    )
    ev = evbg.groupBy("gram").agg(
        F.count(F.lit(1)).cast("bigint").alias("m")
    ).select(
        F.split_part(F.col("gram"), F.lit(" "), F.lit(1)).alias("ew1"),
        F.split_part(F.col("gram"), F.lit(" "), F.lit(2)).alias("ew2"),
        "m",
    )
    joined = (
        ev.join(
            sp,
            (F.col("w1") == F.col("ew1")) & (F.col("w2") == F.col("ew2")),
            "left",
        )
        .drop("w1", "w2")
        .join(c1, c1.w1 == F.col("ew1"), "left")
        .drop("w1")
        .join(cont, cont.w2 == F.col("ew2"), "left")
        .drop("w2")
        .crossJoin(F.broadcast(nb))
    )
    c, ctot, n1f, n1p, nbi = (
        F.col("c"), F.col("ctot"), F.col("n1f"), F.col("n1p"), F.col("nbi")
    )
    pcont = n1p * F.lit(1.0) / nbi
    p = (
        F.when(
            c.isNotNull(),
            F.greatest(c - F.lit(_KN_D), F.lit(0.0)) / ctot
            + F.lit(_KN_D) * n1f / ctot * pcont,
        )
        .when(ctot.isNotNull() & n1p.isNotNull(), F.lit(_KN_D) * n1f / ctot * pcont)
        .when(n1p.isNotNull(), pcont)
        .otherwise(F.lit(1.0) / (nbi + 1))
    )
    scored = joined.select(
        "m",
        F.when(c.isNotNull(), 1).otherwise(0).alias("hit"),
        F.when(c.isNull() & ctot.isNotNull() & n1p.isNotNull(), 1)
        .otherwise(0)
        .alias("backoff"),
        F.when(ctot.isNull() & n1p.isNotNull(), 1).otherwise(0).alias("w1u"),
        F.when(n1p.isNull(), 1).otherwise(0).alias("oov"),
        _q6(F.log(p)).alias("lp"),
    )
    m = F.col("m")
    nll = dsum(m * F.col("lp"))
    return scored.agg(
        F.sum(m).cast("bigint").alias("n_eval_bigrams"),
        F.count(F.lit(1)).cast("bigint").alias("n_eval_types"),
        F.sum(m * F.col("hit")).cast("bigint").alias("n_seen"),
        F.sum(m * F.col("backoff")).cast("bigint").alias("n_backoff"),
        F.sum(m * F.col("w1u")).cast("bigint").alias("n_w1_unseen"),
        F.sum(m * F.col("oov")).cast("bigint").alias("n_oov"),
        _q6(-nll / F.sum(m)).alias("cross_entropy_nats"),
        _q6(F.exp(-nll / F.sum(m))).alias("perplexity"),
    )


# ---------------------------------------------------------------------------
# D95 — Engle-Granger cointegration screen
# ---------------------------------------------------------------------------


@query(
    "orders_cointegration_screen",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               {sql_dsum('o_totalprice')} AS y,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM orders GROUP BY d
    ),
    mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               {sql_dsum('x')} AS sx, {sql_dsum('x * x')} AS sx2,
               {sql_dsum('y / 1000.0')} AS sy,
               {sql_dsum('x * y / 1000.0')} AS sxy
        FROM daily
    ),
    fit AS (
        SELECT n,
               (n * sxy - sx * sy) / NULLIF(n * sx2 - sx * sx, 0) AS beta,
               (sy - sx * (n * sxy - sx * sy)
                          / NULLIF(n * sx2 - sx * sx, 0)) / n AS alpha
        FROM mom
    ),
    resid AS (
        -- DF regression runs on residuals in MILLIONS: rho and the DF t are
        -- scale-free, and the /1000 keeps e^2 addends inside the quantized
        -- long domain through sf100 (the r10 decade caught the thousands
        -- spelling overflowing Sum(e^2) at 15M orders)
        SELECT d, (y / 1000.0 - f.alpha - f.beta * x) / 1000.0 AS e
        FROM daily CROSS JOIN fit f
    ),
    lagged AS (
        SELECT e - LAG(e) OVER (ORDER BY d) AS de,
               LAG(e) OVER (ORDER BY d) AS el
        FROM resid
    ),
    dfm AS (
        SELECT CAST(COUNT(el) AS BIGINT) AS m,
               {sql_dsum('el * el')} AS sll,
               {sql_dsum('de * el')} AS sdl,
               {sql_dsum('de * de')} AS sdd
        FROM lagged WHERE el IS NOT NULL
    ),
    df AS (
        SELECT f.n, f.alpha, f.beta, m,
               sdl / NULLIF(sll, 0) AS rho,
               sqrt(greatest(sdd - (sdl / NULLIF(sll, 0)) * sdl, 0)
                    / NULLIF(m - 1, 0) / NULLIF(sll, 0)) AS se_rho
        FROM fit f CROSS JOIN dfm
    )
    SELECT n AS n_days,
           {_sql_q6('alpha')} AS alpha_thousands,
           {_sql_q6('beta')} AS beta_thousands_per_order,
           {_sql_q6('rho')} AS df_rho,
           {_sql_q6('rho / NULLIF(se_rho, 0)')} AS df_stat,
           CASE WHEN rho / NULLIF(se_rho, 0) < -3.34 THEN TRUE
                WHEN rho / NULLIF(se_rho, 0) IS NULL THEN NULL
                ELSE FALSE END AS cointegrated_5pct
    FROM df
    """,
    ref="SURVEY §2 D95 [EXT] (Engle & Granger 1987 two-step cointegration "
    "screen: OLS of daily revenue (in thousands, so the quantized moments "
    "keep headroom) on daily order count, then the Dickey-Fuller "
    "no-constant regression de_t = rho*e_{t-1} on the residuals; "
    "df_stat below the ~5% Engle-Granger critical value -3.34 "
    "(MacKinnon 1991, one regressor + constant) flags a stable "
    "long-run relation — the spurious-regression guard D70's "
    "Granger-lite lacks; all sums on the calendar-bounded daily table)",
)
def orders_cointegration_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engle-Granger cointegration screen between daily revenue and daily
    order volume: step 1 fits the long-run OLS relation, step 2 runs the
    Dickey-Fuller regression on its residuals. A df_stat below -3.34
    (the 5% Engle-Granger critical value with one regressor) means the
    residual mean-reverts — the two series share a stable long-run link,
    so ratio metrics built on them (average order value) are trustworthy;
    a unit-root residual means any such ratio drifts and the regression
    is spurious.

    Scale shape: one corpus scan into the day-keyed agg; the OLS
    moments, residual build, lag window, and DF moments all live on the
    calendar-bounded daily table. Degenerate series (n<3, constant x)
    yield NULL stats through the same NULLIF guards in both engines."""
    o = load(spark, sf_dir, "orders")
    daily = pin(
        o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
            dsum("o_totalprice").alias("y"),
            F.count(F.lit(1)).cast("bigint").alias("x"),
        ),
        eager=False,
    )
    yk = F.col("y") / F.lit(1000.0)
    mom = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum("x").alias("sx"),
        # x*x and x*y reach ~5e9 per day at sf10 and the 2,500-day sums
        # blow the 1e6-scaled LONG accumulator (caught by the r10 decade);
        # same addends, decimal(38,0) accumulator — oracles unchanged
        # (DuckDB SUM(BIGINT) is already HUGEINT)
        dsum_wide(F.col("x") * F.col("x")).alias("sx2"),
        dsum(yk).alias("sy"),
        dsum_wide(F.col("x") * yk).alias("sxy"),
    )
    n, sx, sx2, sy, sxy = (
        F.col("n"), F.col("sx"), F.col("sx2"), F.col("sy"), F.col("sxy")
    )
    beta = F.try_divide(n * sxy - sx * sy, F.nullif(n * sx2 - sx * sx, F.lit(0.0)))
    fit = pin(
        mom.select(
            "n",
            beta.alias("beta"),
            ((sy - sx * beta) / n).alias("alpha"),
        ),
        eager=False,
    )
    resid = daily.crossJoin(F.broadcast(fit)).select(
        "d",
        # millions — see the oracle note (scale cancels in rho / df_stat)
        ((yk - F.col("alpha") - F.col("beta") * F.col("x")) / F.lit(1000.0)).alias("e"),
    )
    wl = Window.orderBy("d")
    lagged = resid.select(
        (F.col("e") - F.lag("e").over(wl)).alias("de"),
        F.lag("e").over(wl).alias("el"),
    ).where(F.col("el").isNotNull())
    dfm = lagged.agg(
        F.count("el").cast("bigint").alias("m"),
        dsum_wide(F.col("el") * F.col("el")).alias("sll"),
        dsum_wide(F.col("de") * F.col("el")).alias("sdl"),
        dsum_wide(F.col("de") * F.col("de")).alias("sdd"),
    )
    rho = F.try_divide(F.col("sdl"), F.nullif(F.col("sll"), F.lit(0.0)))
    se_rho = F.sqrt(
        F.try_divide(
            F.try_divide(
                F.greatest(F.col("sdd") - rho * F.col("sdl"), F.lit(0.0)),
                F.nullif((F.col("m") - 1).cast("double"), F.lit(0.0)),
            ),
            F.nullif(F.col("sll"), F.lit(0.0)),
        )
    )
    dstat = F.try_divide(rho, F.nullif(se_rho, F.lit(0.0)))
    return fit.crossJoin(F.broadcast(dfm)).select(
        F.col("n").alias("n_days"),
        _q6(F.col("alpha")).alias("alpha_thousands"),
        _q6(F.col("beta")).alias("beta_thousands_per_order"),
        _q6(rho).alias("df_rho"),
        _q6(dstat).alias("df_stat"),
        F.when(dstat < -3.34, F.lit(True))
        .when(dstat.isNull(), F.lit(None).cast("boolean"))
        .otherwise(F.lit(False))
        .alias("cointegrated_5pct"),
    )


# ---------------------------------------------------------------------------
# K143 — compute-optimal token budget (Chinchilla planning table)
# ---------------------------------------------------------------------------

_CHIN_SIZES = (1, 3, 7, 13, 30, 70)  # billions of parameters
_CHIN_RATIO = 20.0  # compute-optimal tokens per parameter (Hoffmann 2022)


@query(
    "llm_token_budget_plan",
    oracle=f"""
    WITH corpus AS (
        SELECT CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents WHERE text IS NOT NULL AND len(text) > 0
    ),
    ladder AS (
        SELECT CAST(unnest(ARRAY{list(_CHIN_SIZES)}) AS BIGINT) AS params_b
    )
    SELECT l.params_b, c.n_tokens AS corpus_tokens, c.n_docs,
           CAST(l.params_b * 1000000000 * {_CHIN_RATIO} AS BIGINT)
               AS optimal_tokens,
           {_sql_q6(f'l.params_b * 1000000000 * {_CHIN_RATIO}'
                    ' / NULLIF(c.n_tokens, 0)')} AS epochs_needed,
           c.n_tokens >= l.params_b * 1000000000 * {_CHIN_RATIO}
               AS single_epoch_feasible,
           {_sql_q6(f'c.n_tokens / ({_CHIN_RATIO} * 1000000000.0)')}
               AS max_params_b_at_one_epoch
    FROM ladder l CROSS JOIN corpus c
    """,
    ref="SURVEY §2 K143 [EXT] (compute-optimal data sizing, Hoffmann et "
    "al. 2022 'Training Compute-Optimal Large Language Models': the "
    "~20-tokens-per-parameter rule against the measured corpus token "
    "supply over a bounded model-size ladder — the first planning "
    "readout of any training-data pipeline: which model can this corpus "
    "feed for one epoch, and how many epochs would each target need; "
    "one corpus scan, 6-row broadcast ladder)",
)
def llm_token_budget_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chinchilla planning table: the corpus's whitespace token supply
    against the compute-optimal demand (20 tokens per parameter) of a
    standard model-size ladder. epochs_needed > 1 means the corpus must
    repeat (with the K-family dedup/quality consequences); the scalar
    max_params_b_at_one_epoch is the largest compute-optimal model this
    corpus feeds without repetition.

    Scale shape: one corpus scan collapsing map-side into a 1-row token
    count; the size ladder is a 6-row literal broadcast — thresholds
    cost arithmetic, not scans (the L18 ladder discipline)."""
    d = load(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    corpus = d.agg(
        F.sum(F.size(text.words("text"))).cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )
    ladder = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(s).cast("bigint") for s in _CHIN_SIZES])
        ).alias("params_b")
    )
    demand = F.col("params_b") * F.lit(1_000_000_000) * F.lit(_CHIN_RATIO)
    return ladder.crossJoin(F.broadcast(corpus)).select(
        "params_b",
        F.col("n_tokens").alias("corpus_tokens"),
        "n_docs",
        demand.cast("bigint").alias("optimal_tokens"),
        _q6(
            F.try_divide(
                demand, F.nullif(F.col("n_tokens").cast("double"), F.lit(0.0))
            )
        ).alias("epochs_needed"),
        (F.col("n_tokens") >= demand).alias("single_epoch_feasible"),
        _q6(
            F.col("n_tokens") / F.lit(_CHIN_RATIO * 1_000_000_000.0)
        ).alias("max_params_b_at_one_epoch"),
    )


# ---------------------------------------------------------------------------
# D96 — Erlang-C staffing ladder
# ---------------------------------------------------------------------------

_ERLANG_BUFFERS = (1.01, 1.02, 1.05, 1.1, 1.2, 1.5)
_ERLANG_FOLD_CAP = 100_000  # exact Erlang-B recursion is Theta(c); beyond
# this the Halfin-Whitt sqrt-staffing column is the answer (closed form)


@query(
    "orders_erlang_staffing",
    oracle=f"""
    WITH done AS (
        SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS end_d
        FROM lineitem GROUP BY l_orderkey
    ),
    ords AS (
        SELECT CAST(o.o_orderdate AS DATE) AS start_d, d.end_d
        FROM orders o JOIN done d ON d.l_orderkey = o.o_orderkey
    ),
    mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               date_diff('day', MIN(start_d), MAX(end_d)) + 1 AS horizon,
               CAST(SUM(date_diff('day', start_d, end_d) + 1) AS BIGINT)
                   AS dur_days
        FROM ords
    ),
    base AS (
        SELECT n, horizon,
               CAST(n AS DOUBLE) / horizon AS lam,
               CAST(dur_days AS DOUBLE) / n AS s_days,
               (CAST(n AS DOUBLE) / horizon)
               * (CAST(dur_days AS DOUBLE) / n) AS a
        FROM mom
    ),
    ladder AS (
        SELECT CAST(unnest(ARRAY{list(_ERLANG_BUFFERS)}) AS DOUBLE) AS f
    ),
    cells AS (
        SELECT b.n AS n_orders, b.lam, b.s_days, b.a, l.f,
               CAST(greatest(ceil(b.a * l.f), floor(b.a) + 1) AS BIGINT) AS c
        FROM base b CROSS JOIN ladder l
    ),
    eb AS (
        SELECT *,
               CASE WHEN c <= {_ERLANG_FOLD_CAP} THEN
                   list_reduce(
                       list_prepend(1.0, list_transform(range(1, c + 1),
                                                        k -> CAST(k AS DOUBLE))),
                       (acc, k) -> a * acc / (k + a * acc))
               END AS b_erlang
        FROM cells
    )
    SELECT c, f AS buffer_factor, n_orders,
           {_sql_q6('lam')} AS lambda_per_day,
           {_sql_q6('s_days')} AS s_days,
           {_sql_q6('a')} AS offered_erlangs,
           {_sql_q6('a / c')} AS utilization,
           {_sql_q6('b_erlang / (1.0 - (a / c) * (1.0 - b_erlang))')}
               AS p_wait,
           {_sql_q6('(b_erlang / (1.0 - (a / c) * (1.0 - b_erlang)))'
                    ' * s_days / (c - a)')} AS wq_days,
           CAST(ceil(a + 2.0 * sqrt(a)) AS BIGINT) AS hw_sqrt_staff_c
    FROM eb
    """,
    ref="SURVEY §2 D96 [EXT] (Erlang-C staffing ladder on the measured "
    "order-fulfillment M/M/c: offered load a = lambda*S from the same "
    "interval data as D94's Little audit, blocking via Jagerman's "
    "numerically-stable Erlang-B recursion B_k = aB/(k+aB) folded "
    "k=1..c (never the a^k/k! terms, which overflow past a~700), "
    "Erlang C = B/(1-rho(1-B)), Wq = C*S/(c-a); the fold is Theta(c) "
    "so it caps at c=1e5 and the Halfin-Whitt sqrt-staffing column "
    "c = a + 2*sqrt(a) (Halfin & Whitt 1981) is the closed-form scale "
    "path — 'how many parallel fulfillment slots buy how little queueing')",
)
def orders_erlang_staffing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staffing ladder for the order-fulfillment queue: measured arrival
    rate and mean service time give the offered load in erlangs; for each
    buffer factor f the ladder reports c = servers, utilization,
    P(wait) (Erlang C), and the mean queueing delay Wq. The Erlang-B
    blocking probability runs through Jagerman's stable recursion as a
    per-row HOF fold — bit-identical across engines because both fold the
    same doubles in the same order (the vector-fold precedent). Beyond
    the documented fold cap the exact columns are NULL and the
    Halfin-Whitt square-root-staffing recommendation (closed form, O(1)
    at any scale) is the production answer.

    Scale shape: one orderkey-keyed lineitem agg + an AQE-planned join
    (the only corpus-sized work), a 1-row moment table, a 6-row literal
    ladder — the fold cost is Theta(c) per ladder row, independent of
    corpus size given the cap."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    done = li.groupBy("l_orderkey").agg(
        F.max(F.to_date("l_shipdate")).alias("end_d")
    )
    ords = o.join(done, o.o_orderkey == done.l_orderkey).select(
        F.to_date("o_orderdate").alias("start_d"), "end_d"
    )
    mom = ords.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.datediff(F.max("end_d"), F.min("start_d")) + 1).alias("horizon"),
        F.sum(F.datediff(F.col("end_d"), F.col("start_d")) + 1)
        .cast("bigint")
        .alias("dur_days"),
    )
    lam = F.col("n").cast("double") / F.col("horizon")
    s_days = F.col("dur_days").cast("double") / F.col("n")
    base = pin(
        mom.select(
            "n",
            "horizon",
            lam.alias("lam"),
            s_days.alias("s_days"),
            (lam * s_days).alias("a"),
        ),
        eager=False,
    )
    ladder = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(f).cast("double") for f in _ERLANG_BUFFERS])
        ).alias("f")
    )
    a = F.col("a")
    cells = base.crossJoin(ladder).select(
        F.col("n").alias("n_orders"),
        "lam",
        "s_days",
        "a",
        "f",
        F.greatest(F.ceil(a * F.col("f")), F.floor(a) + 1)
        .cast("bigint")
        .alias("c"),
    )
    b_erlang = F.when(
        F.col("c") <= _ERLANG_FOLD_CAP,
        F.aggregate(
            F.sequence(F.lit(1).cast("bigint"), F.col("c")),
            F.lit(1.0),
            lambda acc, k: a * acc / (k.cast("double") + a * acc),
        ),
    )
    eb = cells.withColumn("b_erlang", b_erlang)
    rho = a / F.col("c")
    c_erlang = F.col("b_erlang") / (
        F.lit(1.0) - rho * (F.lit(1.0) - F.col("b_erlang"))
    )
    return eb.select(
        "c",
        F.col("f").alias("buffer_factor"),
        "n_orders",
        _q6(F.col("lam")).alias("lambda_per_day"),
        _q6(F.col("s_days")).alias("s_days"),
        _q6(a).alias("offered_erlangs"),
        _q6(rho).alias("utilization"),
        _q6(c_erlang).alias("p_wait"),
        _q6(c_erlang * F.col("s_days") / (F.col("c") - a)).alias("wq_days"),
        F.ceil(a + F.lit(2.0) * F.sqrt(a)).cast("bigint").alias("hw_sqrt_staff_c"),
    )


# ---------------------------------------------------------------------------
# D97 — watermark lateness audit (streaming-config readout, batch-measured)
# ---------------------------------------------------------------------------


@query(
    "events_watermark_lateness_audit",
    oracle="""
    WITH seq AS (
        SELECT event_id, epoch_us(ts) AS tsu,
               MAX(epoch_us(ts)) OVER (ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prior_max
        FROM events WHERE ts IS NOT NULL
    ),
    lat AS (
        SELECT CASE WHEN prior_max IS NOT NULL AND prior_max > tsu
                    THEN CAST(ceil((prior_max - tsu) / 60000000.0) AS BIGINT)
                    ELSE 0 END AS late_min
        FROM seq
    ),
    hist AS (
        SELECT late_min, CAST(COUNT(*) AS BIGINT) AS c
        FROM lat GROUP BY late_min
    ),
    cum AS (
        SELECT late_min, c,
               SUM(c) OVER (ORDER BY late_min
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
               SUM(c) OVER () AS n
        FROM hist
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_events,
           CAST(MAX(n) - SUM(CASE WHEN late_min = 0 THEN c ELSE 0 END)
                AS BIGINT) AS n_late,
           CAST(trunc(((MAX(n) - SUM(CASE WHEN late_min = 0 THEN c ELSE 0
                                     END)) * 1.0 / MAX(n))
                      * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS late_rate,
           CAST(MAX(late_min) AS BIGINT) AS max_lateness_min,
           CAST(MIN(CASE WHEN cc * 1000 >= n * 950 THEN late_min END)
                AS BIGINT) AS wm_p95_min,
           CAST(MIN(CASE WHEN cc * 1000 >= n * 990 THEN late_min END)
                AS BIGINT) AS wm_p99_min,
           CAST(MIN(CASE WHEN cc * 10000 >= n * 9990 THEN late_min END)
                AS BIGINT) AS wm_p999_min
    FROM cum
    """,
    ref="SURVEY §2 D97 [EXT] (watermark sizing from measured event-time "
    "disorder: per event, lateness vs the running max event time over "
    "arrival order (event_id) — computed with the ranged_cummax_excl "
    "scale primitive, never an unpartitioned window; ceil-minute "
    "resolution makes the quantile table calendar-bounded, and the "
    "wm_p* columns read directly as 'withWatermark(X minutes) captures "
    "95/99/99.9% of events' — the I-family configuration decision, "
    "measured instead of guessed)",
)
def events_watermark_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How out-of-order is this stream, and what watermark captures it?
    Lateness of each event = running max event time over STRICTLY prior
    arrivals minus its own event time (0 when in order; the globally
    first event is on time by definition). The audit reports the late
    rate, the worst disorder, and the ceil-minute lateness quantiles
    that translate directly into `withWatermark` settings — the number
    every streaming job (I2/I3/I6) needs and almost every team guesses.

    Scale shape: arrival order rides operators/scale.py's
    ranged_cummax_excl (range partitions + local exclusive window +
    broadcast prefix maxima — the skyline device, no single-partition
    sort); the minute-resolution histogram is calendar-bounded
    (<= horizon minutes rows), so its cumulative window and the
    threshold picks cost nothing at any corpus size. Integer-only
    quantile thresholds (cc*1000 >= n*950) dodge double comparison
    entirely."""
    from ksql_spark.operators.scale import ranged_cummax_excl

    e = load(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    seq = ranged_cummax_excl(
        # ts is TIMESTAMP_NTZ (driver contract); session tz is UTC, so the
        # cast-then-unix_micros equals DuckDB's epoch_us on the naive value
        e.select("event_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("tsu")),
        ["event_id"],
        "tsu",
        out_col="prior_max",
    )
    lat = seq.select(
        F.when(
            F.col("prior_max").isNotNull() & (F.col("prior_max") > F.col("tsu")),
            F.ceil((F.col("prior_max") - F.col("tsu")) / F.lit(60000000.0)),
        )
        .otherwise(0)
        .cast("bigint")
        .alias("late_min")
    )
    hist = pin(
        lat.groupBy("late_min").agg(F.count(F.lit(1)).cast("bigint").alias("c")),
        eager=False,
    )
    wc = Window.orderBy("late_min").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "late_min",
        "c",
        F.sum("c").over(wc).alias("cc"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )
    cc, n, lm, c = F.col("cc"), F.col("n"), F.col("late_min"), F.col("c")
    return cum.agg(
        F.max(n).cast("bigint").alias("n_events"),
        (F.max(n) - F.sum(F.when(lm == 0, c).otherwise(0)))
        .cast("bigint")
        .alias("n_late"),
        _q6(
            (F.max(n) - F.sum(F.when(lm == 0, c).otherwise(0)))
            * F.lit(1.0)
            / F.max(n)
        ).alias("late_rate"),
        F.max(lm).cast("bigint").alias("max_lateness_min"),
        F.min(F.when(cc * 1000 >= n * 950, lm)).cast("bigint").alias("wm_p95_min"),
        F.min(F.when(cc * 1000 >= n * 990, lm)).cast("bigint").alias("wm_p99_min"),
        F.min(F.when(cc * 10000 >= n * 9990, lm))
        .cast("bigint")
        .alias("wm_p999_min"),
    )
