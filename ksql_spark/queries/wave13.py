"""Round-13 operator wave (SURVEY.md §2 D110-D114): blocked-rank and
pairwise-concordance inference, variability-corrected queueing, decomposable
inequality, and SPC capability indices. Each operator is a named published
method with a paired DuckDB oracle, a planted probe with independently
computed expectations (tests/test_wave13.py), and a pure-numpy replica
(tests/test_replicas.py) — the r13 independent-verification bar applied from
day one. Reference analog: the reference engine delegates all querying to
AlaSQL (ksql.js:159) and has none of this surface — these extend the
mandated [EXT] analytics north star.

House discipline: quantized-scaled accumulation (registry dsum family),
exact integer pair counts, calendar/k-bounded tables after the first agg,
and scale shapes that survive 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ksql_spark.registry import dsum, query, sql_dsum
from ksql_spark.tables import load


def _q6(c) -> F.Column:
    return (c * 1000000 + F.lit(0.5)).cast("long").cast("double") / 1000000.0


def _sql_q6(expr: str) -> str:
    return f"CAST(trunc(({expr}) * 1000000 + 0.5) AS BIGINT) / 1000000.0"


# ---------------------------------------------------------------------------
# D110 — Friedman blocked-rank test
# ---------------------------------------------------------------------------


@query(
    "orders_friedman_test",
    oracle=f"""
    WITH cell AS (
        SELECT date_trunc('month', o_orderdate) AS m, o_orderpriority AS g,
               {_sql_q6(f"({sql_dsum('o_totalprice')}) / COUNT(*)")} AS cm
        FROM orders GROUP BY m, g
    ), kk AS (
        SELECT CAST(COUNT(DISTINCT g) AS BIGINT) AS k FROM cell
    ), complete AS (
        SELECT m FROM cell GROUP BY m
        HAVING COUNT(*) = (SELECT k FROM kk)
    ), ranked AS (
        SELECT cell.m, cell.g,
               CAST(rank() OVER (PARTITION BY cell.m ORDER BY cm) AS DOUBLE)
               + (CAST(COUNT(*) OVER (PARTITION BY cell.m, cm) AS DOUBLE)
                  - 1) / 2.0 AS r
        FROM cell JOIN complete ON complete.m = cell.m
    ), rj AS (
        SELECT g, {sql_dsum('r')} AS r_j,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM ranked GROUP BY g
    ), tot AS (
        SELECT CAST(MAX(n) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS k,
               SUM(r_j * r_j) AS s
        FROM rj
    )
    SELECT n AS n_blocks, k,
           {_sql_q6(
               '12.0 / (CAST(n AS DOUBLE) * k * (k + 1.0)) * s'
               ' - 3.0 * n * (k + 1.0)'
           )} AS q_stat
    FROM tot
    """,
    ref="SURVEY §2 D110 [EXT] (Friedman test (Friedman 1937): blocked "
    "rank ANOVA — months are blocks, the 5 order priorities are "
    "treatments, each block ranks its per-priority mean order value; "
    "Q = 12/(nk(k+1))·ΣR_j² − 3n(k+1), chi-square with k−1 df — the "
    "repeated-measures member of the k-sample family: D101 "
    "Kruskal-Wallis pools all observations into one ranking (month "
    "effects leak into the statistic), Friedman ranks WITHIN each "
    "month so seasonality cancels by construction)",
)
def orders_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman blocked-rank test of 'does any priority price differently
    once month effects are removed': per complete month-block, ranks of
    the k per-priority mean values, rank sums R_j across blocks, the
    chi-square-distributed Q. One row (n_blocks, k, q_stat).

    Scale shape: one (month, priority) hash agg collapses the corpus
    (map-side combined, calendar × 5 output rows); ranking windows
    partition on the month over ≤ k rows each; everything downstream is
    bounded. Incomplete blocks (a month missing a priority) drop — the
    classical complete-block design.

    Determinism: cell means ride dsum then 1e-6-quantize BEFORE ranking
    (both engines rank identical doubles); ranks are half-integers so
    rank sums are exact in dsum."""
    o = load(spark, sf_dir, "orders")
    cell = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("m"),
        F.col("o_orderpriority").alias("g"),
    ).agg(_q6(dsum("o_totalprice") / F.count(F.lit(1))).alias("cm"))
    kk = cell.agg(F.count_distinct("g").cast("bigint").alias("k"))
    complete = (
        cell.groupBy("m")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(kk))
        .where(F.col("cnt") == F.col("k"))
        .select("m")
    )
    wr = Window.partitionBy("m").orderBy("cm")
    wt = Window.partitionBy("m", "cm")
    ranked = cell.join(complete, "m").select(
        "g",
        (
            F.rank().over(wr).cast("double")
            + (F.count(F.lit(1)).over(wt).cast("double") - 1) / 2.0
        ).alias("r"),
    )
    rj = ranked.groupBy("g").agg(
        dsum("r").alias("r_j"), F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = rj.agg(
        F.max("n").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(F.col("r_j") * F.col("r_j")).alias("s"),
    )
    n, k = F.col("n").cast("double"), F.col("k").cast("double")
    return tot.select(
        F.col("n").alias("n_blocks"),
        "k",
        _q6(
            12.0 / (n * k * (k + 1.0)) * F.col("s") - 3.0 * n * (k + 1.0)
        ).alias("q_stat"),
    )


# ---------------------------------------------------------------------------
# D111 — Kendall tau-b on the daily series
# ---------------------------------------------------------------------------


@query(
    "orders_kendall_tau_daily",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS x,
               {sql_dsum('o_totalprice')} AS y
        FROM orders GROUP BY d
    ), pairs AS (
        SELECT CAST(SUM(CASE WHEN (b.x - a.x) * (b.y - a.y) > 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS c,
               CAST(SUM(CASE WHEN (b.x - a.x) * (b.y - a.y) < 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS dd,
               CAST(SUM(CASE WHEN a.x = b.x THEN 1 ELSE 0 END) AS BIGINT)
                   AS tx,
               CAST(SUM(CASE WHEN a.y = b.y THEN 1 ELSE 0 END) AS BIGINT)
                   AS ty
        FROM daily a JOIN daily b ON a.d < b.d
    ), nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily)
    SELECT n AS n_days, c AS n_concordant, dd AS n_discordant,
           {_sql_q6(
               '(c - dd) / NULLIF(sqrt('
               '(n * (n - 1.0) / 2.0 - tx) * (n * (n - 1.0) / 2.0 - ty)'
               '), 0)'
           )} AS tau_b,
           {_sql_q6(
               '(c - dd) / NULLIF(sqrt('
               'n * (n - 1.0) * (2.0 * n + 5.0) / 18.0), 0)'
           )} AS z_stat
    FROM pairs CROSS JOIN nn
    """,
    ref="SURVEY §2 D111 [EXT] (Kendall rank correlation (Kendall 1938), "
    "tau-b tie-corrected form: concordant minus discordant pairs of "
    "(daily order count, daily revenue), normalized by "
    "√((n0−n1)(n0−n2)) — the pairwise-concordance member beside D69's "
    "Spearman (rank-moment) and agg_corr's Pearson (linear): tau has "
    "a direct probabilistic reading, P(concordant) − P(discordant), "
    "and its normal z uses the exact null variance n(n−1)(2n+5)/18)",
)
def orders_kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between daily order volume and daily revenue:
    exact concordant/discordant/tied pair counts over the
    calendar-bounded daily table, tie-corrected tau-b, and the normal
    z. One row.

    Scale shape: the corpus collapses to ≤ |days| rows in one agg; the
    pair stage is a self-join on that CALENDAR-BOUNDED table (~days²/2
    pairs — a few million at a century of days, never corpus-sized);
    pair counts are exact integers.

    Determinism: y is the 1e-6-quantized dsum of daily revenue, so y
    equality (ties) and sign comparisons agree bitwise across engines;
    everything else is integer arithmetic until the final two
    quantized divisions."""
    o = load(spark, sf_dir, "orders")
    from ksql_spark.operators.scale import pin

    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("x"),
            dsum("o_totalprice").alias("y"),
        )
        .transform(pin, eager=False)
    )
    a, b = daily.alias("a"), daily.alias("b")
    dx = F.col("b.x") - F.col("a.x")
    dy = F.col("b.y") - F.col("a.y")
    pairs = a.join(b, F.col("a.d") < F.col("b.d")).agg(
        F.sum(F.when(dx * dy > 0, 1).otherwise(0)).cast("bigint").alias("c"),
        F.sum(F.when(dx * dy < 0, 1).otherwise(0)).cast("bigint").alias("dd"),
        F.sum(F.when(F.col("a.x") == F.col("b.x"), 1).otherwise(0))
        .cast("bigint")
        .alias("tx"),
        F.sum(F.when(F.col("a.y") == F.col("b.y"), 1).otherwise(0))
        .cast("bigint")
        .alias("ty"),
    )
    nn = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    n = F.col("n").cast("double")
    n0 = n * (n - 1.0) / 2.0
    num = (F.col("c") - F.col("dd")).cast("double")
    return pairs.crossJoin(F.broadcast(nn)).select(
        F.col("n").alias("n_days"),
        F.col("c").alias("n_concordant"),
        F.col("dd").alias("n_discordant"),
        _q6(
            num
            / F.nullif(
                F.sqrt((n0 - F.col("tx")) * (n0 - F.col("ty"))), F.lit(0.0)
            )
        ).alias("tau_b"),
        _q6(
            num
            / F.nullif(
                F.sqrt(n * (n - 1.0) * (2.0 * n + 5.0) / 18.0), F.lit(0.0)
            )
        ).alias("z_stat"),
    )


# ---------------------------------------------------------------------------
# D112 — Allen-Cunneen G/G/c waiting-time approximation
# ---------------------------------------------------------------------------

_AC_BUFFER = 1.1  # staffing buffer over the offered load (one ladder row)


@query(
    "orders_allen_cunneen_wait",
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
                   AS s1,
               CAST(SUM(CAST(date_diff('day', start_d, end_d) + 1 AS BIGINT)
                        * (date_diff('day', start_d, end_d) + 1)) AS BIGINT)
                   AS s2
        FROM ords
    ),
    arr_bounds AS (
        SELECT MIN(start_d) AS lo, MAX(start_d) AS hi FROM ords
    ),
    arr_obs AS (
        SELECT start_d, CAST(COUNT(*) AS BIGINT) AS a FROM ords
        GROUP BY start_d
    ),
    arr_daily AS (
        SELECT COALESCE(arr_obs.a, 0) AS a
        FROM (SELECT CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 DAY))
                     AS DATE) AS d FROM arr_bounds) spine
        LEFT JOIN arr_obs ON arr_obs.start_d = spine.d
    ),
    arr_mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS nd,
               CAST(SUM(a) AS BIGINT) AS sa,
               CAST(SUM(a * a) AS BIGINT) AS saa
        FROM arr_daily
    ),
    base AS (
        SELECT n, horizon, s1, s2, nd, sa, saa,
               CAST(n AS DOUBLE) / horizon AS lam,
               CAST(s1 AS DOUBLE) / n AS es,
               CAST(s2 AS DOUBLE) / n
                   - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                   AS vs,
               (CAST(saa AS DOUBLE) / nd
                - (CAST(sa AS DOUBLE) / nd) * (CAST(sa AS DOUBLE) / nd))
               / NULLIF(CAST(sa AS DOUBLE) / nd, 0) AS ca2
        FROM mom CROSS JOIN arr_mom
    ),
    staffed AS (
        SELECT *,
               lam * es AS a,
               CAST(greatest(ceil(lam * es * {_AC_BUFFER}),
                             floor(lam * es) + 1) AS BIGINT) AS c,
               vs / NULLIF(es * es, 0) AS cs2
        FROM base
    ),
    eb AS (
        SELECT *,
               list_reduce(
                   list_prepend(1.0, list_transform(range(1, c + 1),
                                                    k -> CAST(k AS DOUBLE))),
                   (acc, k) -> a * acc / (k + a * acc)) AS b_erlang
        FROM staffed
    )
    SELECT n AS n_orders, c,
           {_sql_q6('lam')} AS lambda_per_day,
           {_sql_q6('es')} AS s_days,
           {_sql_q6('a')} AS offered_erlangs,
           {_sql_q6('a / c')} AS utilization,
           {_sql_q6('ca2')} AS ca2,
           {_sql_q6('cs2')} AS cs2,
           {_sql_q6('b_erlang / (1.0 - (a / c) * (1.0 - b_erlang))')}
               AS p_wait,
           {_sql_q6('(b_erlang / (1.0 - (a / c) * (1.0 - b_erlang)))'
                    ' * es / (c - a)')} AS wq_mmc_days,
           {_sql_q6('(b_erlang / (1.0 - (a / c) * (1.0 - b_erlang)))'
                    ' * es / (c - a) * (ca2 + cs2) / 2.0')} AS wq_ac_days
    FROM eb
    """,
    ref="SURVEY §2 D112 [EXT] (Allen-Cunneen G/G/c approximation (Allen "
    "1978; the Pollaczek-Khinchine variability term generalized to c "
    "servers): Wq(G/G/c) ≈ Wq(M/M/c) · (ca²+cs²)/2 — D96's Erlang-C "
    "ladder assumes Poisson arrivals AND exponential service (both "
    "CV² = 1); this entry MEASURES both squared CVs (arrival "
    "dispersion via the Whitt QNA daily-count form, service from "
    "exact duration moments) and reports how much the M/M/c answer "
    "under- or over-states the real queueing delay)",
)
def orders_allen_cunneen_wait(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variability-corrected queueing delay for the fulfillment pool:
    the D96 M/M/c machinery (offered load, Jagerman Erlang-B fold,
    Erlang C) at one staffing point c = ⌈1.1a⌉, multiplied by the
    Allen-Cunneen factor (ca² + cs²)/2 from the MEASURED arrival and
    service variability. One row; wq_ac_days vs wq_mmc_days is the
    correction the exponential assumption hides.

    Scale shape: one orderkey-keyed lineitem agg + an AQE-planned join
    (the only corpus-sized work); service moments are exact integer
    day sums; arrival dispersion lives on the zero-filled calendar
    spine (bounded); the Θ(c) fold runs once.

    Determinism: all moments are exact integers until the final double
    chain, which both engines spell identically; the HOF fold is the
    D96 cross-engine-exact precedent."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    from ksql_spark.operators.scale import pin

    done = li.groupBy("l_orderkey").agg(
        F.max(F.to_date("l_shipdate")).alias("end_d")
    )
    ords = pin(
        o.join(done, o.o_orderkey == done.l_orderkey).select(
            F.to_date("o_orderdate").alias("start_d"), "end_d"
        ),
        eager=False,
    )
    dur = F.datediff(F.col("end_d"), F.col("start_d")) + 1
    mom = ords.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.datediff(F.max("end_d"), F.min("start_d")) + 1).alias("horizon"),
        F.sum(dur).cast("bigint").alias("s1"),
        F.sum(dur.cast("bigint") * dur).cast("bigint").alias("s2"),
    )
    arr_bounds = ords.agg(
        F.min("start_d").alias("lo"), F.max("start_d").alias("hi")
    )
    arr_obs = ords.groupBy("start_d").agg(
        F.count(F.lit(1)).cast("bigint").alias("a")
    )
    spine = arr_bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("d")
    )
    arr_daily = spine.join(
        arr_obs, spine.d == arr_obs.start_d, "left"
    ).select(F.coalesce("a", F.lit(0)).alias("a"))
    arr_mom = arr_daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("nd"),
        F.sum("a").cast("bigint").alias("sa"),
        F.sum(F.col("a") * F.col("a")).cast("bigint").alias("saa"),
    )
    base = mom.crossJoin(F.broadcast(arr_mom))
    lam = F.col("n").cast("double") / F.col("horizon")
    es = F.col("s1").cast("double") / F.col("n")
    vs = F.col("s2").cast("double") / F.col("n") - es * es
    ma = F.col("sa").cast("double") / F.col("nd")
    ca2 = (F.col("saa").cast("double") / F.col("nd") - ma * ma) / F.nullif(
        ma, F.lit(0.0)
    )
    a = lam * es
    c = F.greatest(F.ceil(a * _AC_BUFFER), F.floor(a) + 1).cast("bigint")
    cs2 = vs / F.nullif(es * es, F.lit(0.0))
    staffed = base.select(
        F.col("n").alias("n_orders"),
        lam.alias("lam"),
        es.alias("es"),
        a.alias("a"),
        c.alias("c"),
        ca2.alias("ca2"),
        cs2.alias("cs2"),
    )
    av = F.col("a")
    b_erlang = F.aggregate(
        F.sequence(F.lit(1).cast("bigint"), F.col("c")),
        F.lit(1.0),
        lambda acc, k: av * acc / (k.cast("double") + av * acc),
    )
    eb = staffed.withColumn("b_erlang", b_erlang)
    rho = av / F.col("c")
    ce = F.col("b_erlang") / (1.0 - rho * (1.0 - F.col("b_erlang")))
    wq_mmc = ce * F.col("es") / (F.col("c") - av)
    return eb.select(
        "n_orders",
        "c",
        _q6(F.col("lam")).alias("lambda_per_day"),
        _q6(F.col("es")).alias("s_days"),
        _q6(av).alias("offered_erlangs"),
        _q6(rho).alias("utilization"),
        _q6(F.col("ca2")).alias("ca2"),
        _q6(F.col("cs2")).alias("cs2"),
        _q6(ce).alias("p_wait"),
        _q6(wq_mmc).alias("wq_mmc_days"),
        _q6(wq_mmc * (F.col("ca2") + F.col("cs2")) / 2.0).alias(
            "wq_ac_days"
        ),
    )


# ---------------------------------------------------------------------------
# D113 — Theil inequality index with between/within decomposition
# ---------------------------------------------------------------------------


@query(
    "customer_theil_decomposition",
    oracle=f"""
    WITH per_c AS (
        SELECT o.o_custkey, c.c_mktsegment AS seg,
               {sql_dsum('o.o_totalprice')} AS rev
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY o.o_custkey, c.c_mktsegment
    ), pos AS (
        SELECT seg, rev FROM per_c WHERE rev > 0
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, {sql_dsum('rev')} AS s
        FROM pos
    ), t_total AS (
        SELECT SUM(CAST(trunc(rev / t.s * ln(rev * t.n / t.s)
                        * 1000000000 + 0.5) AS BIGINT)) AS tq
        FROM pos CROSS JOIN tot t
    ), seg_agg AS (
        SELECT seg, CAST(COUNT(*) AS BIGINT) AS n_g, {sql_dsum('rev')} AS s_g
        FROM pos GROUP BY seg
    ), t_seg AS (
        SELECT p.seg,
               SUM(CAST(trunc(p.rev / g.s_g * ln(p.rev * g.n_g / g.s_g)
                        * 1000000000 + 0.5) AS BIGINT)) AS tgq
        FROM pos p JOIN seg_agg g ON g.seg = p.seg
        GROUP BY p.seg
    ), parts AS (
        SELECT SUM(CAST(trunc(g.s_g / t.s
                        * (CAST(ts.tgq AS DOUBLE) / 1000000000.0)
                        * 1000000000 + 0.5) AS BIGINT)) AS wq,
               SUM(CAST(trunc(g.s_g / t.s * ln((g.s_g / t.s) * (t.n * 1.0 / g.n_g))
                        * 1000000000 + 0.5) AS BIGINT)) AS bq,
               CAST(COUNT(*) AS BIGINT) AS n_segments
        FROM seg_agg g JOIN t_seg ts ON ts.seg = g.seg CROSS JOIN tot t
    )
    SELECT t.n, n_segments,
           {_sql_q6('CAST(tt.tq AS DOUBLE) / 1000000000.0')} AS theil_total,
           {_sql_q6('CAST(wq AS DOUBLE) / 1000000000.0')} AS theil_within,
           {_sql_q6('CAST(bq AS DOUBLE) / 1000000000.0')} AS theil_between,
           {_sql_q6(
               '(CAST(bq AS DOUBLE) / 1000000000.0)'
               ' / NULLIF(CAST(tt.tq AS DOUBLE) / 1000000000.0, 0)'
           )} AS between_share
    FROM parts CROSS JOIN tot t CROSS JOIN t_total tt
    """,
    ref="SURVEY §2 D113 [EXT] (Theil index with exact decomposition "
    "(Theil 1967): T = Σ(x/S)ln(x·n/S) over per-customer revenue, "
    "split ADDITIVELY into within-segment (revenue-share-weighted "
    "segment Theils) plus between-segment (share vs population-share "
    "divergence) — the decomposability D28's Gini and D103's Atkinson "
    "lack: between_share answers 'how much of the inequality is "
    "segment composition vs within-segment spread' in one identity)",
)
def customer_theil_decomposition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Theil-T inequality of per-customer revenue, decomposed by market
    segment: T_total = T_within + T_between exactly (up to the shared
    1e-9 term quantization). One row.

    Scale shape: one custkey agg + a customer-dimension join builds the
    per-customer table (pinned — three reductions read it); totals and
    segment aggregates are bounded; the three Theil sums are one pass
    each over the per-customer table with 1e-9-quantized transcendental
    terms (the D103 discipline — ln on the shared quantized revenue).

    Determinism: rev is the 1e-6-quantized dsum; all ln/division inputs
    are bit-identical; each term quantizes at 1e-9 and sums exactly."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    from ksql_spark.operators.scale import pin

    per_c = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_custkey", F.col("c_mktsegment").alias("seg"))
        .agg(dsum("o_totalprice").alias("rev"))
        .where(F.col("rev") > 0)
        .transform(pin, eager=False)
    )
    tot = per_c.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"), dsum("rev").alias("s")
    )

    def q9sum(expr) -> F.Column:
        return F.sum((expr * 1000000000 + F.lit(0.5)).cast("long"))

    rev = F.col("rev")
    t_total = per_c.crossJoin(F.broadcast(tot)).agg(
        q9sum(rev / F.col("s") * F.log(rev * F.col("n") / F.col("s"))).alias(
            "tq"
        )
    )
    seg_agg = per_c.groupBy("seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        dsum("rev").alias("s_g"),
    )
    t_seg = (
        per_c.join(F.broadcast(seg_agg), "seg")
        .groupBy("seg")
        .agg(
            q9sum(
                rev / F.col("s_g") * F.log(rev * F.col("n_g") / F.col("s_g"))
            ).alias("tgq")
        )
    )
    parts = (
        seg_agg.join(t_seg, "seg")
        .crossJoin(F.broadcast(tot))
        .agg(
            q9sum(
                F.col("s_g")
                / F.col("s")
                * (F.col("tgq").cast("double") / 1000000000.0)
            ).alias("wq"),
            q9sum(
                F.col("s_g")
                / F.col("s")
                * F.log(
                    (F.col("s_g") / F.col("s"))
                    * (F.col("n") * F.lit(1.0) / F.col("n_g"))
                )
            ).alias("bq"),
            F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        )
    )
    tt = F.col("tq").cast("double") / 1000000000.0
    wv = F.col("wq").cast("double") / 1000000000.0
    bv = F.col("bq").cast("double") / 1000000000.0
    return (
        parts.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(t_total))
        .select(
            "n",
            "n_segments",
            _q6(tt).alias("theil_total"),
            _q6(wv).alias("theil_within"),
            _q6(bv).alias("theil_between"),
            _q6(bv / F.nullif(tt, F.lit(0.0))).alias("between_share"),
        )
    )


# ---------------------------------------------------------------------------
# D114 — process capability indices (Cp / Cpk)
# ---------------------------------------------------------------------------

_CAP_LSL = 1.0  # TPC-H quantity domain lower spec
_CAP_USL = 50.0  # upper spec


@query(
    "part_process_capability",
    oracle=f"""
    WITH m AS (
        SELECT p.p_brand AS brand,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS s1,
               CAST(SUM(CAST(l.l_quantity AS BIGINT)
                        * CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS s2,
               CAST(SUM(CASE WHEN l.l_quantity < {_CAP_LSL}
                             OR l.l_quantity > {_CAP_USL}
                        THEN 1 ELSE 0 END) AS BIGINT) AS oos
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY p.p_brand
    ), fit AS (
        SELECT brand, n, oos,
               CAST(s1 AS DOUBLE) / n AS mu,
               sqrt(greatest((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
                              * s1 / n) / (n - 1), 0)) AS sd
        FROM m WHERE n >= 2
    )
    SELECT brand, n,
           {_sql_q6('mu')} AS mean_qty,
           {_sql_q6('sd')} AS sd_qty,
           {_sql_q6(f'({_CAP_USL} - {_CAP_LSL}) / NULLIF(6.0 * sd, 0)')}
               AS cp,
           {_sql_q6(
               f'least({_CAP_USL} - mu, mu - {_CAP_LSL})'
               ' / NULLIF(3.0 * sd, 0)'
           )} AS cpk,
           {_sql_q6('CAST(oos AS DOUBLE) / n')} AS oos_rate
    FROM fit
    """,
    ref="SURVEY §2 D114 [EXT] (process capability indices (Kane 1986; "
    "the Juran SPC canon): Cp = (USL−LSL)/6σ is the entitlement of a "
    "CENTERED process, Cpk = min(USL−μ, μ−LSL)/3σ penalizes "
    "off-center drift — the capability companion to D43's x-bar chart "
    "(which flags instability; these grade whether a STABLE process "
    "even fits its spec), with the observed out-of-spec rate beside "
    "the parametric indices as the honesty column)",
)
def part_process_capability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cp/Cpk per brand over line quantities against the [1, 50] spec
    band: exact integer moments → sample σ, the two capability indices,
    and the observed out-of-spec share. One row per brand.

    Scale shape: one partkey join (AQE-degradable) into a 25-row brand
    agg of integer sums; everything downstream is per-row math on the
    bounded ladder. Quantities are integers in doubles — the moment
    sums are exact BIGINTs, so σ is bit-identical cross-engine."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    q = F.col("l_quantity").cast("bigint")
    m = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(q).cast("bigint").alias("s1"),
            F.sum(q * q).cast("bigint").alias("s2"),
            F.sum(
                F.when(
                    (F.col("l_quantity") < _CAP_LSL)
                    | (F.col("l_quantity") > _CAP_USL),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("oos"),
        )
        .where(F.col("n") >= 2)
    )
    n = F.col("n")
    mu = F.col("s1").cast("double") / n
    sd = F.sqrt(
        F.greatest(
            (F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1") / n)
            / (n - 1),
            F.lit(0.0),
        )
    )
    return m.select(
        "brand",
        "n",
        _q6(mu).alias("mean_qty"),
        _q6(sd).alias("sd_qty"),
        _q6(
            (_CAP_USL - _CAP_LSL) / F.nullif(6.0 * sd, F.lit(0.0))
        ).alias("cp"),
        _q6(
            F.least(_CAP_USL - mu, mu - _CAP_LSL)
            / F.nullif(3.0 * sd, F.lit(0.0))
        ).alias("cpk"),
        _q6(F.col("oos").cast("double") / n).alias("oos_rate"),
    )


# ---------------------------------------------------------------------------
# D115 — Kaplan-Meier with Greenwood variance band
# ---------------------------------------------------------------------------


@query(
    "orders_km_greenwood",
    oracle="""
    WITH ranked AS (
        SELECT o_custkey, o_orderdate,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate) AS rn
        FROM orders
    ), per AS (
        SELECT o_custkey,
               MIN(CASE WHEN rn = 1 THEN o_orderdate END) AS t1,
               MIN(CASE WHEN rn = 2 THEN o_orderdate END) AS t2
        FROM ranked WHERE rn <= 2 GROUP BY o_custkey
    ), horizon AS (
        SELECT MAX(o_orderdate) AS hi FROM orders
    ), subjects AS (
        SELECT CASE WHEN t2 IS NOT NULL
                    THEN CAST(date_diff('day', CAST(t1 AS DATE),
                                        CAST(t2 AS DATE)) AS BIGINT)
                    ELSE CAST(date_diff('day', CAST(t1 AS DATE),
                                        CAST(hi AS DATE)) AS BIGINT)
               END AS dur,
               CAST(t2 IS NOT NULL AS INT) AS event
        FROM per, horizon
    ), by_dur AS (
        SELECT dur,
               CAST(SUM(event) AS BIGINT) AS n_events,
               CAST(COUNT(*) AS BIGINT) AS n_leaving
        FROM subjects GROUP BY dur
    ), risk AS (
        SELECT dur, n_events,
               CAST((SELECT COUNT(*) FROM subjects s
                     WHERE s.dur >= by_dur.dur) AS BIGINT) AS n_risk
        FROM by_dur
    ), terms AS (
        SELECT dur, n_events, n_risk,
               SUM(CASE WHEN n_events = n_risk THEN 0
                   ELSE CAST(trunc(
                        ln(1.0 - CAST(n_events AS DOUBLE) / n_risk)
                        * 1000000000 + 0.5) AS BIGINT) END)
                   OVER (ORDER BY dur) AS lnsum_q9,
               SUM(CASE WHEN n_events = n_risk THEN 0
                   ELSE CAST(trunc(
                        CAST(n_events AS DOUBLE)
                        / (CAST(n_risk AS DOUBLE) * (n_risk - n_events))
                        * 1000000000 + 0.5) AS BIGINT) END)
                   OVER (ORDER BY dur) AS gw_q9,
               MAX(CASE WHEN n_events = n_risk THEN 1 ELSE 0 END)
                   OVER (ORDER BY dur) AS hit_zero
        FROM risk WHERE n_events > 0
    ), surv AS (
        SELECT dur, n_risk, n_events,
               CASE WHEN hit_zero = 1 THEN 0.0
                    ELSE exp(CAST(lnsum_q9 AS DOUBLE) / 1000000000.0)
               END AS s_raw,
               CAST(gw_q9 AS DOUBLE) / 1000000000.0 AS gw,
               hit_zero
        FROM terms
    )
    SELECT dur AS duration_days, n_risk, n_events,
           CAST(trunc(s_raw * 1000000 + 0.5) AS BIGINT) / 1000000.0
               AS survival,
           CASE WHEN hit_zero = 0 THEN
               CAST(trunc(s_raw * sqrt(gw) * 1000000 + 0.5) AS BIGINT)
                   / 1000000.0 END AS greenwood_se,
           CASE WHEN hit_zero = 0 THEN
               CAST(trunc(greatest(s_raw - 1.96 * s_raw * sqrt(gw), 0.0)
                    * 1000000 + 0.5) AS BIGINT) / 1000000.0 END AS ci_lo,
           CASE WHEN hit_zero = 0 THEN
               CAST(trunc(least(s_raw + 1.96 * s_raw * sqrt(gw), 1.0)
                    * 1000000 + 0.5) AS BIGINT) / 1000000.0 END AS ci_hi
    FROM surv
    """,
    ref="SURVEY §2 D115 [EXT] (Greenwood's formula (Greenwood 1926): "
    "Var(S(t)) = S(t)^2 * SUM d_i/(n_i(n_i - d_i)) over event times — "
    "the variance band the D27 Kaplan-Meier POINT estimate ships "
    "without; the plain 95%% band clipped to [0,1], SE and CI NULL "
    "past an absorbing S=0 step (the d=n term divides by zero — the "
    "estimator's own domain edge); same subjects/censoring machinery "
    "and window bounds as D27/D102)",
)
def orders_km_greenwood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier time-to-repeat-purchase curve WITH its Greenwood
    95% confidence band: survival from the D27 log-space product,
    variance from the cumulative d/(n(n-d)) sum (1e-9-quantized
    addends, exact accumulation), se = S*sqrt(gw), band clipped to the
    probability domain. One row per event time.

    Scale shape: identical to D27 — one customer agg, calendar-bounded
    duration tallies, the allowlisted descending/ascending cumulative
    windows over <= |distinct durations| rows. The Greenwood sum rides
    the SAME ascending window as the survival product."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    ranked = o.select(
        "o_custkey", "o_orderdate", F.row_number().over(w).alias("rn")
    ).where(F.col("rn") <= 2)
    per = ranked.groupBy("o_custkey").agg(
        F.min(F.when(F.col("rn") == 1, F.col("o_orderdate"))).alias("t1"),
        F.min(F.when(F.col("rn") == 2, F.col("o_orderdate"))).alias("t2"),
    )
    horizon = o.agg(F.max("o_orderdate").alias("hi"))
    subjects = per.crossJoin(F.broadcast(horizon)).select(
        F.when(
            F.col("t2").isNotNull(),
            F.datediff(F.to_date("t2"), F.to_date("t1")),
        )
        .otherwise(F.datediff(F.to_date("hi"), F.to_date("t1")))
        .cast("bigint")
        .alias("dur"),
        F.col("t2").isNotNull().cast("int").alias("event"),
    )
    by_dur = subjects.groupBy("dur").agg(
        F.sum("event").cast("bigint").alias("n_events"),
        F.count(F.lit(1)).cast("bigint").alias("n_leaving"),
    )
    dw = Window.orderBy(F.col("dur").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = by_dur.withColumn(
        "n_risk", F.sum("n_leaving").over(dw).cast("bigint")
    )
    d = F.col("n_events").cast("double")
    nr = F.col("n_risk").cast("double")
    absorbing = F.col("n_events") == F.col("n_risk")
    ln_q9 = F.when(absorbing, F.lit(0).cast("bigint")).otherwise(
        (F.log(1.0 - d / nr) * 1000000000 + 0.5).cast("bigint")
    )
    gw_q9 = F.when(absorbing, F.lit(0).cast("bigint")).otherwise(
        (d / (nr * (nr - d)) * 1000000000 + 0.5).cast("bigint")
    )
    zero = F.when(absorbing, 1).otherwise(0)
    kw = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    terms = (
        risk.where(F.col("n_events") > 0)
        .withColumn("lnsum_q9", F.sum(ln_q9).over(kw))
        .withColumn("gw_q9", F.sum(gw_q9).over(kw))
        .withColumn("hit_zero", F.max(zero).over(kw))
    )
    s_raw = F.when(F.col("hit_zero") == 1, F.lit(0.0)).otherwise(
        F.exp(F.col("lnsum_q9").cast("double") / 1000000000.0)
    )
    gw = F.col("gw_q9").cast("double") / 1000000000.0
    se_raw = s_raw * F.sqrt(gw)
    ok = F.col("hit_zero") == 0
    return terms.select(
        F.col("dur").alias("duration_days"),
        "n_risk",
        "n_events",
        _q6(s_raw).alias("survival"),
        F.when(ok, _q6(se_raw)).alias("greenwood_se"),
        F.when(ok, _q6(F.greatest(s_raw - 1.96 * se_raw, F.lit(0.0)))).alias(
            "ci_lo"
        ),
        F.when(ok, _q6(F.least(s_raw + 1.96 * se_raw, F.lit(1.0)))).alias(
            "ci_hi"
        ),
    )


# ---------------------------------------------------------------------------
# D116 — Jonckheere-Terpstra ordered k-sample trend test
# ---------------------------------------------------------------------------


@query(
    "orders_jonckheere_terpstra",
    oracle="""
    WITH vg AS (
        SELECT o_totalprice AS x, o_orderpriority AS g,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM orders GROUP BY x, g
    ), nj AS (
        SELECT g, CAST(SUM(c) AS BIGINT) AS n_j FROM vg GROUP BY g
    ), tot AS (
        -- HUGEINT products: n_j^2(2n_j+3) overflows BIGINT past ~1.6M
        SELECT CAST(SUM(n_j) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(CAST(n_j AS HUGEINT) * n_j) AS DOUBLE) AS sn2,
               CAST(SUM(CAST(n_j AS HUGEINT) * n_j * (2 * n_j + 3))
                    AS DOUBLE) AS sn23
        FROM nj
    ), u AS (
        -- J = SUM over ordered group pairs a<b of #{x_a < x_b} + half-ties
        SELECT CAST(SUM(CASE WHEN a.x < b.x THEN a.c * b.c ELSE 0 END)
                    AS DOUBLE)
               + 0.5 * SUM(CASE WHEN a.x = b.x THEN a.c * b.c ELSE 0 END)
                   AS j_stat
        FROM vg a JOIN vg b ON a.g < b.g
    )
    SELECT tot.n, tot.k,
           u.j_stat,
           (CAST(tot.n AS DOUBLE) * tot.n - tot.sn2) / 4.0 AS mean_j,
           CAST(trunc(
               (u.j_stat - (CAST(tot.n AS DOUBLE) * tot.n - tot.sn2) / 4.0)
               / NULLIF(sqrt(
                   (CAST(tot.n AS DOUBLE) * tot.n * (2.0 * tot.n + 3.0)
                    - tot.sn23) / 72.0), 0)
               * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS z_stat
    FROM u CROSS JOIN tot
    """,
    ref="SURVEY §2 D116 [EXT] (Jonckheere-Terpstra ordered-alternative "
    "test (Terpstra 1952; Jonckheere 1954): J = Σ_{a<b} U_ab over the "
    "ORDERED priority ladder, ties counted half; against the ordered "
    "alternative the JT test dominates D101's Kruskal-Wallis (which "
    "spends power on ALL permutations of the groups) — completes the "
    "k-sample quartet: D101 any-location, D104 dispersion, D106 "
    "parametric means, D116 MONOTONE trend in the group order; null "
    "moments E[J] = (N²−Σn_j²)/4 and the untied Var (ties are a "
    "vanishing share of cent-granular money pairs, and BOTH engines + "
    "the replica spell the identical statistic))",
)
def orders_jonckheere_terpstra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is order value MONOTONE in the priority order ('1-URGENT' < … <
    '5-LOW')? J = Σ over ordered group pairs of between-pair
    Mann-Whitney counts (half-credit ties), with the exact null mean
    and the normal z. One row.

    Scale shape — ONE ranged pass carrying k running counters (the sf1
    probe measured the oracle's collapsed pair join at 173 s — a
    |distinct values|² stage, the exact scale-killer class; this form
    replaced it at 10.0 s with identical J — 17x, same statistic): the corpus collapses to one
    row per distinct value with k per-group counts (the D79/D101
    value-collapse device, pivoted over the ≤25-row group domain
    collected once at build — a bounded action); a range-partitioned
    local window + #partitions-row boundary stitch gives every group's
    running count at every value (the ranged_cumsum decomposition, k
    columns in one shuffle); then each row contributes
    Σ_{a<b} c_b·(cum_a − c_a) + ½·c_b·c_a — all exact integers in
    decimal(38,0), J assembled from the two integer sums. Only the
    final z divides. The oracle keeps the pair-join spelling (clear,
    and fine at oracle scale) — both compute the identical statistic."""
    o = load(spark, sf_dir, "orders")
    from ksql_spark.operators.scale import pin

    vg = o.groupBy(
        F.col("o_totalprice").alias("x"),
        F.col("o_orderpriority").alias("g"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    # bounded group-domain collect (≤ |priorities| rows) — the loop and
    # pivot need the ordered label list; class (a/d) build-time action
    groups = sorted(
        r["g"] for r in o.select(F.col("o_orderpriority").alias("g")).distinct().collect()
    )
    piv = (
        vg.groupBy("x").pivot("g", groups).sum("c").na.fill(0)
    )
    nparts = max(4, spark.sparkContext.defaultParallelism // 4)
    parts = pin(
        piv.repartitionByRange(nparts, "x").withColumn(
            "_pid", F.spark_partition_id()
        )
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    with_local = parts.select(
        "*",
        *[
            F.sum(F.col(g)).over(w_local).alias(f"_loc_{i}")
            for i, g in enumerate(groups)
        ],
    )
    ptot = parts.groupBy("_pid").agg(
        *[
            F.sum(F.col(groups[i])).alias(f"_tot_{i}")
            for i in range(len(groups))
        ]
    )
    w_prev = (
        Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    )  # #partitions-row table — bounded
    offs = ptot.select(
        "_pid",
        *[
            F.coalesce(F.sum(F.col(f"_tot_{i}")).over(w_prev), F.lit(0))
            .alias(f"_off_{i}")
            for i in range(len(groups))
        ],
    )
    cum = with_local.join(F.broadcast(offs), "_pid")
    # per-row JT contribution: groups BELOW b contribute their strict-less
    # running count plus half their at-value count
    p_terms, t_terms = [], []
    for bi in range(1, len(groups)):
        cb = F.col(groups[bi]).cast("decimal(38,0)")
        for ai in range(bi):
            ca = F.col(groups[ai]).cast("decimal(38,0)")
            cum_a = (F.col(f"_loc_{ai}") + F.col(f"_off_{ai}")).cast(
                "decimal(38,0)"
            )
            p_terms.append(cb * (cum_a - ca))
            t_terms.append(cb * ca)
    p_expr = p_terms[0]
    for t in p_terms[1:]:
        p_expr = p_expr + t
    t_expr = t_terms[0]
    for t in t_terms[1:]:
        t_expr = t_expr + t
    u = cum.agg(
        F.sum(p_expr).cast("double").alias("p_int"),
        F.sum(t_expr).cast("double").alias("t_int"),
    ).select((F.col("p_int") + 0.5 * F.col("t_int")).alias("j_stat"))
    nj = vg.groupBy("g").agg(F.sum("c").cast("bigint").alias("n_j"))
    n_j = F.col("n_j")
    # moment products in decimal(38,0): n_j^2(2n_j+3) overflows a LONG past
    # n_j ~ 1.6M (the sf10 probe caught the ANSI abort at 15M-row groups;
    # the oracle's BIGINT product would overflow the same way — HUGEINT
    # there). Exact integers either way; one double cast at the end.
    njd = n_j.cast("decimal(38,0)")
    tot = nj.agg(
        F.sum("n_j").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(njd * njd).cast("double").alias("sn2"),
        F.sum(njd * njd * (2 * njd + 3)).cast("double").alias("sn23"),
    )
    n = F.col("n").cast("double")
    mean_j = (n * n - F.col("sn2")) / 4.0
    var_j = (n * n * (2.0 * n + 3.0) - F.col("sn23")) / 72.0
    return u.crossJoin(F.broadcast(tot)).select(
        "n",
        "k",
        "j_stat",
        mean_j.alias("mean_j"),
        _q6(
            (F.col("j_stat") - mean_j)
            / F.nullif(F.sqrt(var_j), F.lit(0.0))
        ).alias("z_stat"),
    )
