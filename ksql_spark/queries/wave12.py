"""Round-12 operator wave (SURVEY.md §2 D101-D105, K152-K155): rank /
variance / inequality / hazard inference, a rate-limiter audit, and three
retrieval-and-sampling tiers. Each operator is a named published method with
a paired DuckDB oracle; reference analog: the reference engine delegates all
querying to AlaSQL (ksql.js:159) and has none of this surface — these extend
the mandated [EXT] analytics/LLM-pipeline north star.

House discipline throughout: exact-integer or quantized-scaled accumulation
(registry dsum family), tie-broken top-k, bounded broadcasts, and scale
shapes that survive 100 TB (ranged two-pass ranks, calendar/k-bounded
windows, per-user partitioned windows, HOF folds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ksql_spark.operators import text
from ksql_spark.queries.curation import SQL_QUALITY
from ksql_spark.queries.llm import _dot_sql, _norm_sql
from ksql_spark.registry import dsum, query, sql_dsum
from ksql_spark.tables import load

#: shared 1e-6 output quantizer (the house discipline)
def _q6(c) -> F.Column:
    return (c * 1000000 + F.lit(0.5)).cast("long").cast("double") / 1000000.0


def _sql_q6(expr: str) -> str:
    return f"CAST(trunc(({expr}) * 1000000 + 0.5) AS BIGINT) / 1000000.0"


# ---------------------------------------------------------------------------
# D101 — Kruskal-Wallis H test (k-sample rank ANOVA)
# ---------------------------------------------------------------------------


@query(
    "orders_kruskal_wallis",
    oracle=f"""
    WITH labeled AS (
        SELECT o_totalprice AS x, o_orderpriority AS g FROM orders
    ), ranked AS (
        SELECT g,
               CAST(rank() OVER (ORDER BY x) AS DOUBLE)
               + (CAST(COUNT(*) OVER (PARTITION BY x) AS DOUBLE) - 1) / 2.0
                   AS r,
               x
        FROM labeled
    ), gsum AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n_j, {sql_dsum('r')} AS r_j
        FROM ranked GROUP BY g
    ), tot AS (
        SELECT CAST(SUM(n_j) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS k,
               SUM(r_j * r_j / n_j) AS s
        FROM gsum
    ), ties AS (
        SELECT CAST(SUM(CAST(t AS HUGEINT) * (t - 1) * (t + 1)) AS DOUBLE)
                   AS tie_term
        FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM labeled GROUP BY x)
    )
    SELECT n, k,
           {_sql_q6('12.0 / (n * (n + 1.0)) * s - 3.0 * (n + 1.0)')} AS h_stat,
           {_sql_q6(
               '(12.0 / (n * (n + 1.0)) * s - 3.0 * (n + 1.0))'
               ' / NULLIF(1.0 - tie_term'
               ' / (CAST(n AS DOUBLE) * n * n - n), 0)'
           )} AS h_corrected
    FROM tot CROSS JOIN ties
    """,
    ref="SURVEY §2 D101 [EXT] (Kruskal-Wallis H: the k-sample rank ANOVA "
    "(Kruskal & Wallis 1952) over order value across the 5 order "
    "priorities — D79's Mann-Whitney generalized past two groups, with "
    "the standard tie correction H/(1 - Σ(t³-t)/(N³-N)); the "
    "distribution-free screen for 'does ANY priority price differently' "
    "before pairwise drill-down)",
)
def orders_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H over o_totalprice grouped by o_orderpriority:
    tie-averaged global ranks, per-group rank sums R_j, H = 12/(N(N+1))
    ΣR_j²/n_j − 3(N+1), and the tie-corrected H. One row.

    Scale shape (the D79 ranged two-pass device, extended to k groups):
    ranks depend only on the VALUE, so the corpus collapses to one row
    per distinct (x, group) in a single hash agg; the global cumulative
    count over x rides ranged_cumsum (range-partition + local window +
    #partitions-row boundary offsets — no single-partition sort); rank
    sums re-aggregate to ONE row per group. Nothing after the first agg
    is data-sized, and no unpartitioned window exists anywhere.

    Determinism: r·1e6 is an exact integral double (ranks are
    half-integers), so the per-(x, g) scaled addend c·trunc(r·1e6+0.5)
    equals the oracle's per-row sum exactly; accumulation runs in
    decimal(38,0) (rank sums ~ N²/2 overflow a long past sf10 — the
    dsum_wide lesson), and the tie term multiplies in decimal end to
    end (t³ overflows scaled longs at sf10 tie depths). The H double
    arithmetic is spelled identically on both sides, then 1e-6
    quantized."""
    from ksql_spark.operators.scale import ranged_cumsum

    o = load(spark, sf_dir, "orders")
    per_xg = o.groupBy(
        F.col("o_totalprice").alias("x"),
        F.col("o_orderpriority").alias("g"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    per_x = per_xg.groupBy("x").agg(F.sum("c").cast("bigint").alias("t"))
    cum = ranged_cumsum(per_x, ["x"], "t", out_col="cum_t")
    t = F.col("t")
    r = (F.col("cum_t") - t).cast("double") + (t.cast("double") + 1.0) / 2.0
    scaled_r = (r * F.lit(1_000_000.0) + F.lit(0.5)).cast("long")
    gsum = (
        per_xg.join(cum.select("x", "t", "cum_t"), "x")
        .groupBy("g")
        .agg(
            F.sum("c").cast("bigint").alias("n_j"),
            (
                F.sum(F.col("c").cast("decimal(38,0)") * scaled_r)
                .cast("double")
                / 1_000_000.0
            ).alias("r_j"),
        )
    )
    tot = gsum.agg(
        F.sum("n_j").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(F.col("r_j") * F.col("r_j") / F.col("n_j")).alias("s"),
    )
    ties = per_x.agg(
        F.sum(
            t.cast("decimal(38,0)")
            * (t - 1).cast("decimal(38,0)")
            * (t + 1).cast("decimal(38,0)")
        )
        .cast("double")
        .alias("tie_term")
    )
    n = F.col("n").cast("double")
    h = 12.0 / (n * (n + 1.0)) * F.col("s") - 3.0 * (n + 1.0)
    return (
        tot.crossJoin(F.broadcast(ties))
        .select(
            "n",
            "k",
            _q6(h).alias("h_stat"),
            _q6(
                h
                / F.nullif(
                    1.0 - F.col("tie_term") / (n * n * n - n), F.lit(0.0)
                )
            ).alias("h_corrected"),
        )
    )


# ---------------------------------------------------------------------------
# D102 — Nelson-Aalen cumulative hazard
# ---------------------------------------------------------------------------


@query(
    "orders_nelson_aalen",
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
               SUM(CAST(trunc(CAST(n_events AS DOUBLE) / n_risk
                        * 1000000000 + 0.5) AS BIGINT))
                   OVER (ORDER BY dur) AS hz_q9
        FROM risk WHERE n_events > 0
    )
    SELECT dur AS duration_days, n_risk, n_events,
           CAST(trunc(CAST(hz_q9 AS DOUBLE) / 1000.0 + 0.5) AS BIGINT)
               / 1000000.0 AS cum_hazard,
           CAST(trunc(exp(-CAST(hz_q9 AS DOUBLE) / 1000000000.0)
                      * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS na_survival
    FROM terms
    """,
    ref="SURVEY §2 D102 [EXT] (Nelson-Aalen cumulative hazard estimator "
    "(Nelson 1972; Aalen 1978): H(t) = Σ d_i/n_i over event times — the "
    "hazard-scale companion to D27's Kaplan-Meier product-limit curve "
    "and D98's log-rank comparison; exp(-H) is the Fleming-Harrington "
    "survival estimate, which dominates KM's in small risk sets)",
)
def orders_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard of time-to-second-order, with the
    same subjects/censoring construction as orders_survival_km (repeat
    customers = events at their first-to-second gap; one-order customers
    censored at the horizon): per event time, the risk set, d/n hazard
    increments accumulated exactly (1e-9-quantized addends), and the
    Fleming-Harrington survival exp(-H).

    Scale shape: byte-identical to D27 — one customer-keyed agg builds
    subjects, per-duration tallies are calendar-bounded, the risk set is
    a descending cumulative over <= |distinct durations| rows and the
    hazard accumulation an ascending one (both unpartitioned windows
    allowlisted with the D27 bound in tests/test_plans.py)."""
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
    hz_q9 = (
        F.col("n_events").cast("double") / F.col("n_risk") * 1000000000
        + F.lit(0.5)
    ).cast("bigint")
    kw = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    terms = risk.where(F.col("n_events") > 0).withColumn(
        "hz_q9", F.sum(hz_q9).over(kw)
    )
    return terms.select(
        F.col("dur").alias("duration_days"),
        "n_risk",
        "n_events",
        (
            (F.col("hz_q9").cast("double") / 1000.0 + F.lit(0.5))
            .cast("bigint")
            .cast("double")
            / 1000000.0
        ).alias("cum_hazard"),
        (
            (
                F.exp(-F.col("hz_q9").cast("double") / 1000000000.0) * 1000000
                + F.lit(0.5)
            )
            .cast("bigint")
            .cast("double")
            / 1000000.0
        ).alias("na_survival"),
    )


# ---------------------------------------------------------------------------
# D103 — Atkinson inequality index
# ---------------------------------------------------------------------------


@query(
    "customer_atkinson_index",
    oracle=f"""
    WITH per_c AS (
        SELECT o_custkey, {sql_dsum('o_totalprice')} AS rev
        FROM orders GROUP BY o_custkey
    ), agg AS (
        -- Atkinson is defined on POSITIVE incomes: ln/sqrt of a refunded
        -- (negative-revenue) customer would NaN one engine and abort the
        -- other; the domain restriction is part of the estimator
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               {sql_dsum('rev')} AS s_rev,
               {sql_dsum('sqrt(rev)')} AS s_sqrt,
               {sql_dsum('ln(rev)')} AS s_ln
        FROM per_c WHERE rev > 0
    )
    SELECT n,
           {_sql_q6('s_rev / n')} AS mean_rev,
           {_sql_q6(
               '1.0 - (s_sqrt / n) * (s_sqrt / n) / (s_rev / n)'
           )} AS atkinson_half,
           {_sql_q6('1.0 - exp(s_ln / n) / (s_rev / n)')} AS atkinson_one
    FROM agg
    """,
    ref="SURVEY §2 D103 [EXT] (Atkinson inequality index (Atkinson 1970): "
    "1 - the ε-welfare-weighted generalized mean over the arithmetic "
    "mean of per-customer revenue, at ε = 0.5 (power mean of √x) and "
    "ε = 1 (geometric mean) — the welfare-founded companion to D28's "
    "Gini: ε states HOW MUCH the analyst cares about the bottom of the "
    "distribution, where Gini fixes one implicit weighting)",
)
def customer_atkinson_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atkinson index of per-customer revenue concentration at ε = 0.5
    and ε = 1: A(0.5) = 1 − (mean √x)²/mean x, A(1) = 1 − geomean/mean.
    One row; 0 = perfect equality, →1 as revenue concentrates.

    Scale shape: one customer-keyed hash agg (map-side combined) then a
    1-row reduction — no window, no join, nothing data-sized after the
    first agg. Revenues are strictly positive (TPC-H totalprice > 0),
    so ln/√ are total; both engines compute them on the SAME
    1e-6-quantized per-customer revenue, making the transcendental
    inputs bit-identical."""
    o = load(spark, sf_dir, "orders")
    per_c = o.groupBy("o_custkey").agg(dsum("o_totalprice").alias("rev"))
    # positive-income domain (see oracle comment)
    per_c = per_c.where(F.col("rev") > 0)
    agg = per_c.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum("rev").alias("s_rev"),
        dsum(F.sqrt(F.col("rev"))).alias("s_sqrt"),
        dsum(F.log(F.col("rev"))).alias("s_ln"),
    )
    n = F.col("n").cast("double")
    mean = F.col("s_rev") / n
    return agg.select(
        "n",
        _q6(mean).alias("mean_rev"),
        _q6(
            1.0 - (F.col("s_sqrt") / n) * (F.col("s_sqrt") / n) / mean
        ).alias("atkinson_half"),
        _q6(1.0 - F.exp(F.col("s_ln") / n) / mean).alias("atkinson_one"),
    )


# ---------------------------------------------------------------------------
# D104 — Brown-Forsythe variance-equality test
# ---------------------------------------------------------------------------


@query(
    "events_brown_forsythe",
    oracle=f"""
    WITH vals AS (
        SELECT event_type AS g, value AS x FROM events
        WHERE value IS NOT NULL
    ), med AS (
        SELECT g, median(x) AS m FROM vals GROUP BY g
    ), z AS (
        SELECT vals.g, abs(x - m) AS z FROM vals JOIN med USING (g)
    ), gs AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n_j,
               {sql_dsum('z')} AS s_z, {sql_dsum('z * z')} AS s_zz
        FROM z GROUP BY g
    ), tot AS (
        SELECT CAST(SUM(n_j) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS k,
               SUM(s_z) AS sz_all,
               SUM(s_z * s_z / n_j) AS s_between,
               SUM(s_zz) AS s_zz_all
        FROM gs
    )
    SELECT n, k,
           {_sql_q6(
               '(CAST(n AS DOUBLE) - k) / NULLIF(k - 1.0, 0)'
               ' * (s_between - sz_all * sz_all / n)'
               ' / NULLIF(s_zz_all - s_between, 0)'
           )} AS w_stat
    FROM tot
    """,
    ref="SURVEY §2 D104 [EXT] (Brown-Forsythe test (Brown & Forsythe "
    "1974): Levene's variance-equality ANOVA computed on absolute "
    "deviations from the group MEDIAN — robust to the heavy tails that "
    "break the classical Bartlett test; the dispersion sibling of D53's "
    "mean test: a metric can keep its mean and silently widen)",
)
def events_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe W over event values grouped by event_type: z =
    |x − median_g|, W = ((N−k)/(k−1)) · Σn_j(z̄_j−z̄)² / ΣΣ(z−z̄_j)²,
    spelled via the sum-of-squares algebra (Σn_j z̄_j² − N z̄² between,
    Σz² − Σn_j z̄_j² within) so both engines reduce the same three
    per-group sums. One row.

    Scale shape: one narrow scan into a per-type exact median (k-bounded
    output), the medians BROADCAST back onto the scan (k ~ |event
    types|), then one per-type hash agg and a 1-row reduction — no
    window, nothing data-sized after the scan."""
    e = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    vals = e.select(F.col("event_type").alias("g"), F.col("value").alias("x"))
    med = vals.groupBy("g").agg(F.median("x").alias("m"))
    z = vals.join(F.broadcast(med), "g").select(
        "g", F.abs(F.col("x") - F.col("m")).alias("z")
    )
    gs = z.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_j"),
        dsum("z").alias("s_z"),
        dsum(F.col("z") * F.col("z")).alias("s_zz"),
    )
    tot = gs.agg(
        F.sum("n_j").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("s_z").alias("sz_all"),
        F.sum(F.col("s_z") * F.col("s_z") / F.col("n_j")).alias("s_between"),
        F.sum("s_zz").alias("s_zz_all"),
    )
    n, k = F.col("n").cast("double"), F.col("k").cast("double")
    w = (
        (n - F.col("k")) / F.nullif(F.col("k").cast("double") - 1.0, F.lit(0.0))
        * (F.col("s_between") - F.col("sz_all") * F.col("sz_all") / n)
        / F.nullif(F.col("s_zz_all") - F.col("s_between"), F.lit(0.0))
    )
    return tot.select("n", "k", _q6(w).alias("w_stat"))


# ---------------------------------------------------------------------------
# D105 — GCRA rate-limit audit (leaky bucket as a windowed closed form)
# ---------------------------------------------------------------------------

_GCRA_T_MS = 60_000  # sustained rate: one event per minute
_GCRA_TAU_MS = 240_000  # tolerance: a burst of 1 + tau/T = 5 events


@query(
    "events_rate_limit_gcra",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, epoch_ms(ts) AS t,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS k
        FROM events
    ), m AS (
        SELECT user_id, t, k,
               MAX(t - k * {_GCRA_T_MS}) OVER (
                   PARTITION BY user_id ORDER BY k
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS prev_m
        FROM ev
    ), flagged AS (
        SELECT user_id,
               -- TAT_(k-1) = max_(j<=k-1)(t_j - j*T) + k*T (the unrolled
               -- recursion evaluated one step back)
               CASE WHEN prev_m IS NOT NULL
                         AND t < prev_m + k * {_GCRA_T_MS}
                             - {_GCRA_TAU_MS}
                    THEN 1 ELSE 0 END AS violation,
               CASE WHEN prev_m IS NOT NULL
                    THEN (prev_m + k * {_GCRA_T_MS}
                          - {_GCRA_TAU_MS} - t) / 1000.0
                    ELSE NULL END AS excess_sec
        FROM m
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(violation) AS BIGINT) AS n_violations,
           CASE WHEN MAX(excess_sec) > 0
                THEN {_sql_q6('MAX(excess_sec)')} ELSE 0.0 END
               AS worst_excess_sec
    FROM flagged GROUP BY user_id
    """,
    ref="SURVEY §2 D105 [EXT] (GCRA / virtual-scheduling rate-limit audit "
    "(ATM Forum TM 4.0; the leaky-bucket meter behind RFC 2697-style "
    "policers), meter-with-update variant: every arrival debits the "
    "bucket; TAT_k = max(t_k, TAT_(k-1)) + T unrolls to a per-user "
    "RUNNING MAX of t_j - j·T — a sequential recursion became one "
    "partitioned window, the D43/E3 drawdown closed-form device)",
)
def events_rate_limit_gcra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retroactive rate-limit audit per user: with sustained rate 1/T
    (T = 60 s) and burst tolerance τ = 240 s (bucket of 5), flag every
    event that a GCRA policer would have marked non-conforming, and
    report the per-user violation count and worst excess.

    The closed form: the theoretical arrival time recursion TAT_k =
    max(t_k, TAT_(k-1)) + T (every arrival debits — the meter-with-
    update variant, which keeps the recursion linear) solves to
    TAT_k = max_(j<=k)(t_j - j·T) + (k+1)·T, so the per-event
    conformance test needs only a running max of (t_j - j·T) over the
    user's ordered events — one partitioned window, no iteration, no
    state machine. Event k violates iff t_k < TAT_(k-1) - τ.

    Scale shape: one per-user row_number + one per-user running-max
    window (millions of independent partitions), then a user-keyed hash
    agg riding the same exchange. Milliseconds are exact BIGINTs in
    both engines (epoch_ms == unix_millis)."""
    e = load(spark, sf_dir, "events")
    ow = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ; unix_millis needs TIMESTAMP — the cast reads the
    # naive value in the session zone (UTC in this harness, matching
    # DuckDB's epoch_ms on naive timestamps)
    ev = e.select(
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("t"),
        F.row_number().over(ow).alias("k"),
    )
    mw = (
        Window.partitionBy("user_id")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    m = ev.withColumn(
        "prev_m", F.max(F.col("t") - F.col("k") * _GCRA_T_MS).over(mw)
    )
    tat_prev = F.col("prev_m") + F.col("k") * _GCRA_T_MS
    violation = F.when(
        F.col("prev_m").isNotNull()
        & (F.col("t") < tat_prev - _GCRA_TAU_MS),
        1,
    ).otherwise(0)
    excess = F.when(
        F.col("prev_m").isNotNull(),
        (tat_prev - _GCRA_TAU_MS - F.col("t")).cast("double") / 1000.0,
    )
    flagged = m.select(
        "user_id", violation.alias("violation"), excess.alias("excess_sec")
    )
    return flagged.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("violation").cast("bigint").alias("n_violations"),
        F.when(F.max("excess_sec") > 0, _q6(F.max("excess_sec")))
        .otherwise(F.lit(0.0))
        .alias("worst_excess_sec"),
    )


# ---------------------------------------------------------------------------
# K152 — binary sign-quantized embeddings + exact Hamming top-k
# ---------------------------------------------------------------------------

_HAM_TOPK = 5


def _sign_pack_spark(emb, lo: int) -> F.Column:
    """Pack 32 sign bits (dims lo..lo+31, 1-indexed element_at) into one
    long: bit i set iff embedding[lo+i+1] > 0. Pure integer fold."""
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(31)),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.when(
            F.get(emb, (F.lit(lo) + i).cast("int")) > 0,
            # shiftleft needs a literal bit count; 2^i via pow is exact in
            # double far past i = 31 and casts back to the same long
            F.pow(F.lit(2.0), i).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )


def _sign_pack_sql(col: str, lo: int) -> str:
    return (
        f"list_sum(list_transform(range(0, 32), i -> CASE WHEN "
        f"{col}[{lo} + i + 1] > 0 THEN (CAST(1 AS BIGINT) << i) "
        f"ELSE CAST(0 AS BIGINT) END))"
    )


@query(
    "ann_hamming_topk",
    oracle=f"""
    WITH sig AS (
        SELECT vec_id,
               {_sign_pack_sql('embedding', 0)} AS h1,
               {_sign_pack_sql('embedding', 32)} AS h2
        FROM embeddings
    )
    SELECT query_id, vec_id, hamming FROM (
        SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
               CAST(bit_count(xor(q.h1, v.h1))
                    + bit_count(xor(q.h2, v.h2)) AS BIGINT) AS hamming,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY bit_count(xor(q.h1, v.h1))
                            + bit_count(xor(q.h2, v.h2)), v.vec_id) AS rn
        FROM (SELECT * FROM sig WHERE vec_id < 3) q
        CROSS JOIN sig v
        WHERE q.vec_id <> v.vec_id
    ) WHERE rn <= {_HAM_TOPK}
    """,
    ref="SURVEY §2 K152 [EXT] (binary sign quantization + exact Hamming "
    "top-k: each 64-dim float vector compresses 32x to two packed sign "
    "longs, and nearest neighbors rank by popcount of the XOR — the "
    "binary-hashing retrieval tier (Charikar 2002 SimHash for random "
    "projections; sign quantization is its axis-aligned special case, "
    "the form binary passage retrieval / faiss IndexBinaryFlat ship). "
    "Unlike K20's PQ or K32c's LSH this tier is EXACT over the "
    "quantized space, so it oracle-checks bit-for-bit; recall vs the "
    "float cosine top-k is law-pinned in tests/test_wave12.py)",
)
def ann_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Hamming top-5 neighbors over sign-quantized embeddings for
    each query vector (vec_id < 3): dims pack to two 32-bit sign words
    per vector (one narrow HOF fold, no UDF), distance = popcount(XOR),
    ties break on vec_id.

    Why this tier exists at 100 TB: the packed signature is 16 bytes
    per vector regardless of dim (a 30 TB float-embedding column scans
    as ~0.5 TB of signatures), XOR+popcount is branch-free integer
    codegen, and sign quantization preserves angular neighborhoods
    (Goemans-Williamson: P[sign differs] = angle/pi per random
    hyperplane; axis-aligned here). The float re-rank runs only on the
    candidate set this tier returns.

    Scale shape: signature computation is per-row expression work on the
    corpus scan; the 3-row query set broadcasts; top-k per query is one
    query-partitioned window over the candidate stream (the llm_sim_topk
    posture with 16-byte rows instead of 256-byte vectors)."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        _sign_pack_spark(F.col("embedding"), 0).alias("h1"),
        _sign_pack_spark(F.col("embedding"), 32).alias("h2"),
    )
    q = e.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("h1").alias("q1"),
        F.col("h2").alias("q2"),
    )
    ham = (
        F.bit_count(F.col("q1").bitwiseXOR(F.col("h1")))
        + F.bit_count(F.col("q2").bitwiseXOR(F.col("h2")))
    ).cast("bigint")
    w = Window.partitionBy("query_id").orderBy(F.col("hamming"), F.col("vec_id"))
    return (
        F.broadcast(q)
        .crossJoin(e)
        .where(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id", ham.alias("hamming"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _HAM_TOPK)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# K153 — Dirichlet-smoothed query-likelihood retrieval
# ---------------------------------------------------------------------------

_QL_QUERIES = [
    ("q1", "fast table scan"),
    ("q2", "window merge batch"),
    ("q3", "stream filter sort"),
]
_QL_MU = 2000.0
_QL_TOPK = 5


@query(
    "llm_dirichlet_ql_topk",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, text,
               -- \\s+ split + empty-drop == Spark words(): agrees on
               -- multi-space/tab/newline corpora (the ADVICE r11 rule)
               CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                                    w -> w <> '')) AS BIGINT) AS dl
        FROM documents WHERE text IS NOT NULL
    ), tok AS (
        SELECT doc_id, w.term
        FROM docs d, unnest(list_filter(regexp_split_to_array(d.text, '\\s+'),
                                        w -> w <> '')) AS w(term)
    ), totals AS (
        SELECT CAST(SUM(dl) AS DOUBLE) AS coll_len FROM docs
    ), queries(query_id, qtext) AS (
        VALUES {", ".join(f"('{qid}', '{qt}')" for qid, qt in _QL_QUERIES)}
    ), qterms AS (
        SELECT DISTINCT query_id, unnest(string_split(qtext, ' ')) AS term
        FROM queries
    ), cf AS (
        SELECT term, CAST(COUNT(*) AS DOUBLE) AS cf
        FROM tok WHERE term IN (SELECT term FROM qterms)
        GROUP BY term
    ), posting AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tok WHERE term IN (SELECT term FROM qterms)
        GROUP BY doc_id, term
    ), base AS (
        -- per-(doc, query) constant: every query term scores
        -- log(mu*p(w|C) / (dl + mu)) when absent
        SELECT d.doc_id, q.query_id,
               -- parenthesized (cf/coll_len) first: the Spark side builds
               -- p_c = cf/coll_len then mu*p_c — same association, same ulp
               SUM(CAST(trunc(ln({_QL_MU} * (cf.cf / t.coll_len)
                              / (d.dl + {_QL_MU}))
                        * 1000000000 + 0.5) AS BIGINT)) AS b_q9
        FROM docs d
        CROSS JOIN qterms q
        JOIN cf USING (term)
        CROSS JOIN totals t
        GROUP BY d.doc_id, q.query_id
    ), bonus AS (
        -- matched terms add log((tf + mu*p) / (mu*p))
        SELECT p.doc_id, q.query_id,
               SUM(CAST(trunc(ln((p.tf + {_QL_MU} * (cf.cf / t.coll_len))
                              / ({_QL_MU} * (cf.cf / t.coll_len)))
                        * 1000000000 + 0.5) AS BIGINT)) AS m_q9
        FROM posting p
        JOIN qterms q USING (term)
        JOIN cf USING (term)
        CROSS JOIN totals t
        GROUP BY p.doc_id, q.query_id
    ), scored AS (
        SELECT b.doc_id, b.query_id,
               CAST(trunc((b.b_q9 + COALESCE(m.m_q9, 0)) / 1000.0 + 0.5)
                    AS BIGINT) / 1000000.0 AS score
        FROM base b LEFT JOIN bonus m
          ON b.doc_id = m.doc_id AND b.query_id = m.query_id
    )
    SELECT query_id, doc_id, CAST(rnk AS INT) AS rank, score
    FROM (
        SELECT query_id, doc_id, score,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, doc_id) AS rnk
        FROM scored
    ) WHERE rnk <= {_QL_TOPK}
    """,
    ref="SURVEY §2 K153 [EXT] (query-likelihood retrieval with Dirichlet "
    "prior smoothing (Zhai & Lafferty SIGIR 2001): score = Σ_w log((tf "
    "+ μ·p(w|C))/(|d| + μ)) decomposed into a per-doc absent-term "
    "constant plus a matched-term bonus — the language-modeling "
    "retrieval family beside K66's BM25 (probabilistic) and K70's RRF "
    "fusion; same 3-query workload as K66 so the rankers compare "
    "doc-for-doc)",
)
def llm_dirichlet_ql_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet-smoothed query likelihood top-5 per query: collection
    LM p(w|C) from corpus term frequencies, each document scored
    Σ_w∈q log((tf_wd + μ·p(w|C)) / (dl + μ)) with μ = 2000, decomposed
    as (per-doc constant over all query terms) + (matched-term bonus) so
    unmatched terms never materialize a posting row.

    Scale shape: the K66 inverted-posting pattern — the ~10-term query
    dictionary broadcasts, the exploded term stream is filtered against
    it BEFORE any shuffle (postings exchange only matching terms), the
    collection frequencies are a |terms|-row broadcast, and the per-doc
    constant is |docs| x |queries| narrow rows (3 queries). Log terms
    quantize at 1e-9 and sum exactly; scores re-quantize to 1e-6."""
    d = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    docs = d.select(
        "doc_id", text.word_count("text").cast("bigint").alias("dl"),
        text.words("text").alias("ws"),
    )
    tok = docs.select("doc_id", F.explode("ws").alias("term"))
    totals = docs.agg(F.sum("dl").cast("double").alias("coll_len"))
    qrows = []
    for qid, qt in _QL_QUERIES:
        for term in sorted(set(qt.split())):
            qrows.append((qid, term))
    qterms = spark.createDataFrame(qrows, "query_id string, term string")
    cf = (
        tok.join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("double").alias("cf"))
    )
    posting = (
        tok.join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    qcf = F.broadcast(
        qterms.join(cf, "term").crossJoin(totals)
    )  # (query_id, term, cf, coll_len) — bounded
    p_c = F.col("cf") / F.col("coll_len")
    base = (
        docs.select("doc_id", "dl")
        .crossJoin(qcf)
        .groupBy("doc_id", "query_id")
        .agg(
            F.sum(
                (
                    F.log(_QL_MU * p_c / (F.col("dl") + _QL_MU)) * 1000000000
                    + F.lit(0.5)
                ).cast("bigint")
            ).alias("b_q9")
        )
    )
    bonus = (
        posting.join(qcf, "term")
        .groupBy("doc_id", "query_id")
        .agg(
            F.sum(
                (
                    F.log((F.col("tf") + _QL_MU * p_c) / (_QL_MU * p_c))
                    * 1000000000
                    + F.lit(0.5)
                ).cast("bigint")
            ).alias("m_q9")
        )
    )
    scored = base.join(bonus, ["doc_id", "query_id"], "left").select(
        "doc_id",
        "query_id",
        (
            (
                (F.col("b_q9") + F.coalesce("m_q9", F.lit(0))).cast("double")
                / 1000.0
                + F.lit(0.5)
            )
            .cast("bigint")
            .cast("double")
            / 1000000.0
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _QL_TOPK)
        .select("query_id", "doc_id", F.col("rnk").cast("int").alias("rank"), "score")
    )


# ---------------------------------------------------------------------------
# K154 — MinHash-LSH banding parameter planner (the S-curve integral)
# ---------------------------------------------------------------------------

_LSH_N_HASHES = 40  # K31's signature budget
_LSH_TARGET_T = 0.8  # K31's jaccard_threshold
_LSH_GRID = 200  # midpoint-rule integration grid


@query(
    "llm_lsh_param_plan",
    oracle=f"""
    WITH plans AS (
        SELECT CAST(r AS BIGINT) AS rows_per_band,
               CAST({_LSH_N_HASHES} // r AS BIGINT) AS bands
        FROM range(1, 11) AS t(r)
    ), err AS (
        SELECT rows_per_band, bands,
               list_sum(list_transform(range(0, {_LSH_GRID}), m ->
                   CASE WHEN (m + 0.5) / {_LSH_GRID} < {_LSH_TARGET_T}
                        THEN CAST(trunc((1.0 - pow(1.0 - pow(
                                 (m + 0.5) / {_LSH_GRID}, rows_per_band),
                                 bands)) * 1000000000 + 0.5) AS BIGINT)
                        ELSE CAST(0 AS BIGINT) END)) AS fp_q9,
               list_sum(list_transform(range(0, {_LSH_GRID}), m ->
                   CASE WHEN (m + 0.5) / {_LSH_GRID} >= {_LSH_TARGET_T}
                        THEN CAST(trunc(pow(1.0 - pow(
                                 (m + 0.5) / {_LSH_GRID}, rows_per_band),
                                 bands) * 1000000000 + 0.5) AS BIGINT)
                        ELSE CAST(0 AS BIGINT) END)) AS fn_q9
        FROM plans
    )
    SELECT rows_per_band, bands,
           {_sql_q6(f'CAST(fp_q9 AS DOUBLE) / 1000.0 / {_LSH_GRID} / 1000000.0')}
               AS fp_area,
           {_sql_q6(f'CAST(fn_q9 AS DOUBLE) / 1000.0 / {_LSH_GRID} / 1000000.0')}
               AS fn_area,
           {_sql_q6(
               f'CAST(fp_q9 + fn_q9 AS DOUBLE) / 1000.0 / {_LSH_GRID}'
               ' / 1000000.0'
           )} AS total_err,
           {_sql_q6('pow(1.0 / bands, 1.0 / rows_per_band)')} AS threshold_star
    FROM err
    """,
    ref="SURVEY §2 K154 [EXT] (MinHash-LSH banding planner: for every "
    "(bands b, rows r) factoring of K31's 40-hash signature budget, the "
    "candidate S-curve p(s) = 1-(1-s^r)^b integrated below/above the "
    "target Jaccard 0.8 — the false-positive and false-negative areas "
    "of Leskovec-Rajaraman-Ullman MMDS §3.4, plus the curve's fixpoint "
    "threshold (1/b)^(1/r); the table IS the tuning decision K31/K2 "
    "hard-code, now derivable per corpus contract)",
)
def llm_lsh_param_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding plan table: for r = 1..10 rows/band (b = 40 // r
    bands), the midpoint-rule FP area (mass of sub-threshold pairs the
    banding would candidate) and FN area (mass of true pairs it would
    miss), their sum, and the S-curve threshold (1/b)^(1/r). The argmin
    row is the banding to run; K31's shipped (b=4, r=10) is visible in
    context rather than folklore.

    A PLANNING entry: input-independent like K143's compute-optimal
    budget — the whole computation is a 10-row literal plan with one
    200-term HOF fold per row (no table scan, no shuffle, no explode).
    Integrand terms quantize at 1e-9 and sum exactly, so both engines
    integrate bit-identically."""
    plans = spark.range(1, 11).select(
        F.col("id").cast("bigint").alias("rows_per_band"),
        (F.lit(_LSH_N_HASHES) / F.col("id")).cast("bigint").alias("bands"),
    )
    s_m = lambda m: (m.cast("double") + 0.5) / _LSH_GRID
    p_s = lambda m: 1.0 - F.pow(
        1.0 - F.pow(s_m(m), F.col("rows_per_band").cast("double")),
        F.col("bands").cast("double"),
    )
    grid = F.sequence(F.lit(0), F.lit(_LSH_GRID - 1))
    fp_q9 = F.aggregate(
        grid,
        F.lit(0).cast("bigint"),
        lambda acc, m: acc
        + F.when(
            s_m(m) < _LSH_TARGET_T,
            (p_s(m) * 1000000000 + F.lit(0.5)).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint")),
    )
    fn_q9 = F.aggregate(
        grid,
        F.lit(0).cast("bigint"),
        lambda acc, m: acc
        + F.when(
            s_m(m) >= _LSH_TARGET_T,
            ((1.0 - p_s(m)) * 1000000000 + F.lit(0.5)).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint")),
    )
    e = plans.select(
        "rows_per_band", "bands", fp_q9.alias("fp_q9"), fn_q9.alias("fn_q9")
    )
    area = lambda c: _q6(c.cast("double") / 1000.0 / _LSH_GRID / 1000000.0)
    return e.select(
        "rows_per_band",
        "bands",
        area(F.col("fp_q9")).alias("fp_area"),
        area(F.col("fn_q9")).alias("fn_area"),
        area(F.col("fp_q9") + F.col("fn_q9")).alias("total_err"),
        _q6(
            F.pow(
                1.0 / F.col("bands").cast("double"),
                1.0 / F.col("rows_per_band").cast("double"),
            )
        ).alias("threshold_star"),
    )


# ---------------------------------------------------------------------------
# K155 — Efraimidis-Spirakis weighted sampling without replacement
# ---------------------------------------------------------------------------

_ES_K = 100


@query(
    "llm_gumbel_topk_sample",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id,
               ({SQL_QUALITY}) AS quality,
               ((doc_id % 2147483648) * 2654435761) % 4294967296 AS hk
        FROM documents
    ), keyed AS (
        SELECT doc_id, quality,
               -ln((hk + 0.5) / 4294967296.0) / quality AS ekey
        FROM scored WHERE quality > 0
    )
    SELECT doc_id, {_sql_q6('quality')} AS quality, {_sql_q6('ekey')} AS ekey
    FROM keyed
    -- qualified keyed.ekey binds the RAW race key, not the quantized
    -- SELECT alias: selection must compare raw doubles exactly like the
    -- Spark side, else 1e-6-collapsed ties straddling rank k diverge
    ORDER BY keyed.ekey, doc_id LIMIT {_ES_K}
    """,
    ref="SURVEY §2 K155 [EXT] (Efraimidis-Spirakis A-ES weighted "
    "sampling WITHOUT replacement (Efraimidis & Spirakis 2006, the "
    "exponential-race / Gumbel-top-k form): key_i = -ln(u_i)/w_i, keep "
    "the k smallest — the ONE distributed algorithm for exact weighted "
    "k-subset draws (per-row key + TakeOrdered, no sequential pass); "
    "complements K27's Bernoulli thinning (llm_sample_weighted keeps a "
    "RANDOM-SIZED subset, this keeps EXACTLY k with inclusion "
    "probability proportional to weight at the margin)",
)
def llm_gumbel_topk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted exact-k corpus draw: per document a deterministic
    uniform u from the house Knuth hash (offset +0.5 so u is never 0),
    exponential race key -ln(u)/quality, global k = 100 smallest keys
    (ties broken by doc_id). Zero/empty-quality docs are excluded (their
    weight is 0 — unsampleable by definition).

    Scale shape: one narrow scan computing a per-row key, then
    TakeOrderedAndProject (per-partition top-k + a k-row driver merge —
    no global sort, no shuffle of the corpus). THE way to draw an
    exactly-k weighted subset from 100 TB in one pass.

    Determinism: u is exact integer arithmetic; ln/division are the
    same IEEE computation in both engines (the D27 ln discipline);
    selection compares raw doubles identically, reported values
    quantize at 1e-6."""
    d = load(spark, sf_dir, "documents")
    u_num = (
        (F.col("doc_id") % F.lit(2147483648))
        * F.lit(2654435761).cast("long")
    ) % F.lit(4294967296)
    quality = text.quality_score("text")
    scored = d.select(
        "doc_id",
        quality.alias("quality"),
        (
            -F.log((u_num.cast("double") + 0.5) / 4294967296.0)
            / quality
        ).alias("ekey"),
    ).where(F.col("quality") > 0)
    return (
        scored.orderBy(F.col("ekey"), F.col("doc_id"))
        .limit(_ES_K)
        .select("doc_id", _q6(F.col("quality")).alias("quality"), _q6(F.col("ekey")).alias("ekey"))
    )


# ---------------------------------------------------------------------------
# D106 — one-way ANOVA F (the parametric twin of D101/D104)
# ---------------------------------------------------------------------------

_SQL_XX = "CAST(SUM(CAST(trunc(x * x + 0.5) AS BIGINT)) AS DOUBLE)"


@query(
    "orders_anova_oneway",
    oracle=f"""
    WITH vals AS (
        SELECT o_orderpriority AS g, o_totalprice AS x FROM orders
    ), gs AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n_j,
               {sql_dsum('x')} AS s_x, {_SQL_XX} AS s_xx
        FROM vals GROUP BY g
    ), tot AS (
        SELECT CAST(SUM(n_j) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS k,
               SUM(s_x) AS sx_all,
               SUM(s_x * s_x / n_j) AS s_groups,
               SUM(s_xx) AS s_xx_all
        FROM gs
    )
    SELECT n, k,
           -- SS values reach ~3e14 (squared money x n): the 1e6 quantizer's
           -- long cast would overflow, and sub-unit precision is meaningless
           -- on squared dollars -- quantize at scale 1
           CAST(CAST(trunc(s_groups - sx_all * sx_all / n + 0.5) AS BIGINT)
                AS DOUBLE) AS ss_between,
           CAST(CAST(trunc(s_xx_all - s_groups + 0.5) AS BIGINT) AS DOUBLE)
               AS ss_within,
           {_sql_q6(
               '(s_groups - sx_all * sx_all / n) / NULLIF(k - 1.0, 0)'
               ' / NULLIF((s_xx_all - s_groups) / (CAST(n AS DOUBLE) - k), 0)'
           )} AS f_stat
    FROM tot
    """,
    ref="SURVEY §2 D106 [EXT] (one-way ANOVA F (Fisher 1925): "
    "between-group over within-group mean squares of order value across "
    "the 5 priorities — the parametric member of the round's k-sample "
    "trio: D101 tests LOCATION rank-free, D104 tests DISPERSION "
    "median-robustly, this tests MEANS under normality; the three "
    "together are the standard triage before pairwise drill-down)",
)
def orders_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA over o_totalprice by o_orderpriority: SS_between =
    ΣS_j²/n_j − S²/N, SS_within = Σx² − ΣS_j²/n_j (the sum-of-squares
    algebra, so both engines reduce the same three per-group sums), and
    F = (SS_b/(k−1)) / (SS_w/(N−k)). One row.

    Scale shape: ONE per-group hash agg (map-side combined, k = 5 output
    rows) then a 1-row reduction — no window, no join. Σx rides dsum; Σx²
    quantizes at scale 1 (x² ~ 1e10 would overflow the 1e6-scaled long)
    and accumulates in decimal(38,0) so sf100 row counts cannot overflow
    (the dsum_wide posture)."""
    o = load(spark, sf_dir, "orders")
    vals = o.select(
        F.col("o_orderpriority").alias("g"),
        F.col("o_totalprice").alias("x"),
    )
    xx = (F.col("x") * F.col("x") + F.lit(0.5)).cast("long")
    gs = vals.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_j"),
        dsum("x").alias("s_x"),
        F.sum(xx.cast("decimal(38,0)")).cast("double").alias("s_xx"),
    )
    tot = gs.agg(
        F.sum("n_j").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("s_x").alias("sx_all"),
        F.sum(F.col("s_x") * F.col("s_x") / F.col("n_j")).alias("s_groups"),
        F.sum("s_xx").alias("s_xx_all"),
    )
    n, k = F.col("n").cast("double"), F.col("k").cast("double")
    ss_b = F.col("s_groups") - F.col("sx_all") * F.col("sx_all") / n
    ss_w = F.col("s_xx_all") - F.col("s_groups")
    return tot.select(
        "n",
        "k",
        (ss_b + F.lit(0.5)).cast("bigint").cast("double").alias("ss_between"),
        (ss_w + F.lit(0.5)).cast("bigint").cast("double").alias("ss_within"),
        _q6(
            ss_b / F.nullif(F.col("k").cast("double") - 1.0, F.lit(0.0))
            / F.nullif(ss_w / (n - F.col("k")), F.lit(0.0))
        ).alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# D107 — Cramér's V categorical association
# ---------------------------------------------------------------------------


@query(
    "orders_cramers_v",
    oracle=f"""
    WITH joined AS (
        SELECT o.o_orderpriority AS r, c.c_mktsegment AS cseg
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), cell AS (
        SELECT r, cseg, CAST(COUNT(*) AS BIGINT) AS o_ij
        FROM joined GROUP BY r, cseg
    ), rm AS (SELECT r, CAST(SUM(o_ij) AS BIGINT) AS r_i FROM cell GROUP BY r),
    cm AS (SELECT cseg, CAST(SUM(o_ij) AS BIGINT) AS c_j FROM cell GROUP BY cseg),
    tot AS (SELECT CAST(SUM(o_ij) AS BIGINT) AS n,
                   CAST(COUNT(DISTINCT r) AS BIGINT) AS nr,
                   CAST(COUNT(DISTINCT cseg) AS BIGINT) AS nc
            FROM cell),
    full_grid AS (
        -- EMPTY cells carry chi-square mass too ((0-e)^2/e = e): build the
        -- full r x c grid from the margins and left-join observed counts
        SELECT rm.r, cm.cseg, rm.r_i, cm.c_j,
               COALESCE(cell.o_ij, 0) AS o_ij
        FROM rm CROSS JOIN cm
        LEFT JOIN cell ON cell.r = rm.r AND cell.cseg = cm.cseg
    ),
    chi AS (
        SELECT SUM(CAST(trunc(
                   (o_ij - CAST(r_i AS DOUBLE) * c_j / n)
                   * (o_ij - CAST(r_i AS DOUBLE) * c_j / n)
                   / (CAST(r_i AS DOUBLE) * c_j / n)
                   * 1000000000 + 0.5) AS BIGINT)) AS chi_q9
        FROM full_grid CROSS JOIN tot
    )
    SELECT n, nr, nc,
           CAST(trunc(CAST(chi_q9 AS DOUBLE) / 1000.0 + 0.5) AS BIGINT)
               / 1000000.0 AS chi2,
           {_sql_q6(
               'sqrt(CAST(chi_q9 AS DOUBLE) / 1000000000.0'
               ' / (n * (least(nr, nc) - 1.0)))'
           )} AS cramers_v
    FROM chi CROSS JOIN tot
    """,
    ref="SURVEY §2 D107 [EXT] (Cramér's V (Cramér 1946): chi-square "
    "association between two categorical axes — order priority × "
    "customer market segment — normalized to [0,1] by n·(min(r,c)−1), "
    "so association strength compares across table shapes; the "
    "categorical companion to D69's Spearman (ordinal) and K84's "
    "Pearson matrix (numeric))",
)
def orders_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V between o_orderpriority and c_mktsegment: the 5×5
    contingency table, χ² against independence margins, and V =
    √(χ²/(n·(min(r,c)−1))). One row.

    Scale shape: one customer-keyed equi-join (AQE picks the strategy;
    both sides SF-proportional, so at 100 TB it is a co-partitioned
    shuffled hash join — never broadcast-hinted), then ONE hash agg to
    the bounded r×c cell table; margins/totals are re-aggregations of
    those ≤ 25 rows. Per-cell χ² terms quantize at 1e-9 and sum
    exactly."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    cell = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("o_orderpriority").alias("r"),
            F.col("c_mktsegment").alias("cseg"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("o_ij"))
    )
    rm = cell.groupBy("r").agg(F.sum("o_ij").cast("bigint").alias("r_i"))
    cm = cell.groupBy("cseg").agg(F.sum("o_ij").cast("bigint").alias("c_j"))
    tot = cell.agg(
        F.sum("o_ij").cast("bigint").alias("n"),
        F.count_distinct("r").cast("bigint").alias("nr"),
        F.count_distinct("cseg").cast("bigint").alias("nc"),
    )
    e_ij = F.col("r_i").cast("double") * F.col("c_j") / F.col("n")
    term_q9 = (
        (F.col("o_ij") - e_ij) * (F.col("o_ij") - e_ij) / e_ij * 1000000000
        + F.lit(0.5)
    ).cast("bigint")
    # empty cells carry chi-square mass too ((0-e)^2/e = e): cross the
    # bounded margins into the full r x c grid and left-join observed counts
    grid = (
        rm.crossJoin(F.broadcast(cm))
        .join(cell, ["r", "cseg"], "left")
        .select("r", "cseg", "r_i", "c_j",
                F.coalesce("o_ij", F.lit(0)).alias("o_ij"))
    )
    chi = grid.crossJoin(F.broadcast(tot)).agg(
        F.sum(term_q9).alias("chi_q9")
    )
    return chi.crossJoin(F.broadcast(tot)).select(
        "n",
        "nr",
        "nc",
        (
            (F.col("chi_q9").cast("double") / 1000.0 + F.lit(0.5))
            .cast("bigint")
            .cast("double")
            / 1000000.0
        ).alias("chi2"),
        _q6(
            F.sqrt(
                F.col("chi_q9").cast("double")
                / 1000000000.0
                / (
                    F.col("n").cast("double")
                    * (F.least("nr", "nc").cast("double") - 1.0)
                )
            )
        ).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# D108 — economic order quantity ladder
# ---------------------------------------------------------------------------

_EOQ_ORDER_COST = 100.0  # fixed cost per replenishment order
_EOQ_HOLD_RATE = 0.2  # annual holding cost as a fraction of unit price


@query(
    "part_eoq_ladder",
    oracle=f"""
    WITH pd AS (
        SELECT p.p_brand AS brand,
               {sql_dsum('l.l_quantity')} AS demand,
               {sql_dsum('p.p_retailprice')} AS price_sum,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand
    )
    SELECT brand, demand,
           {_sql_q6('price_sum / n_lines')} AS avg_price,
           -- EOQ is undefined off the positive-demand/price domain
           -- (sqrt of a negative would NaN/abort): NULL there
           CASE WHEN demand > 0 AND price_sum > 0 THEN {_sql_q6(
               f'sqrt(2.0 * demand * {_EOQ_ORDER_COST}'
               f' / ({_EOQ_HOLD_RATE} * (price_sum / n_lines)))'
           )} END AS eoq,
           CASE WHEN demand > 0 AND price_sum > 0 THEN {_sql_q6(
               f'demand / sqrt(2.0 * demand * {_EOQ_ORDER_COST}'
               f' / ({_EOQ_HOLD_RATE} * (price_sum / n_lines)))'
           )} END AS orders_per_period
    FROM pd
    """,
    ref="SURVEY §2 D108 [EXT] (economic order quantity (Harris 1913; "
    "the Wilson formula): EOQ = √(2DK/h) per brand from observed demand "
    "D, fixed order cost K, and holding cost h = rate × avg unit price "
    "— the replenishment LOT SIZE beside D91's safety stock (WHEN to "
    "reorder) and D96's staffing ladder; the square-root law that "
    "batches 100 orders into √-many)",
)
def part_eoq_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EOQ per brand: observed lineitem demand as the period demand D,
    K = 100 per order, h = 20% of the brand's average retail price;
    reports EOQ = √(2DK/h) and the implied orders per period D/EOQ.

    Scale shape: one partkey equi-join (part side degradable by AQE) into
    a 25-row brand agg; everything after is per-row math on the bounded
    ladder. Demand/price sums ride dsum; √ inputs are the shared
    quantized values so both engines agree bitwise."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    pd_ = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            dsum("l_quantity").alias("demand"),
            dsum("p_retailprice").alias("price_sum"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )
    avg_price = F.col("price_sum") / F.col("n_lines")
    eoq = F.sqrt(
        2.0 * F.col("demand") * _EOQ_ORDER_COST / (_EOQ_HOLD_RATE * avg_price)
    )
    ok = (F.col("demand") > 0) & (F.col("price_sum") > 0)
    return pd_.select(
        "brand",
        "demand",
        _q6(avg_price).alias("avg_price"),
        F.when(ok, _q6(eoq)).alias("eoq"),
        F.when(ok, _q6(F.col("demand") / eoq)).alias("orders_per_period"),
    )


# ---------------------------------------------------------------------------
# D109 — newsvendor critical fractile
# ---------------------------------------------------------------------------

_NV_UNDERAGE = 0.3  # lost margin per unit short (fraction of price)
_NV_OVERAGE = 0.2  # holding/salvage loss per unit over (fraction of price)


@query(
    "part_newsvendor_stock",
    oracle=f"""
    WITH daily AS (
        SELECT p.p_brand AS brand, l.l_shipdate AS d,
               {sql_dsum('l.l_quantity')} AS demand
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand, l.l_shipdate
    )
    SELECT brand,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           {_sql_q6('quantile_cont(demand, '
                    f'{_NV_UNDERAGE / (_NV_UNDERAGE + _NV_OVERAGE)})')}
               AS stock_level,
           {_sql_q6('quantile_cont(demand, 0.5)')} AS median_demand
    FROM daily GROUP BY brand
    """,
    ref="SURVEY §2 D109 [EXT] (newsvendor critical fractile (Arrow, "
    "Harris & Marschak 1951): optimal single-period stock = the "
    "cu/(cu+co) quantile of the demand distribution — with underage "
    "cost 0.3·price and overage 0.2·price, cu/(cu+co) = 0.3/0.5 = 0.6 "
    "— the 0.6 fractile of daily "
    "brand demand; the PROFIT-OPTIMAL cousin of D91's service-level "
    "safety stock (which fixes a z-score instead of costs))",
)
def part_newsvendor_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newsvendor stock level per brand: the cu/(cu+co) = 0.6 quantile
    of observed daily demand (interpolated, the agg_median convention),
    beside the median for reference. One row per brand.

    Scale shape: one partkey join into a (brand, day) hash agg
    (calendar-bounded output), then a 25-group exact-percentile agg —
    the same two-level collapse as D23's latency percentiles; nothing
    after the first agg is data-sized."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    daily = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), F.col("l_shipdate").alias("d"))
        .agg(dsum("l_quantity").alias("demand"))
    )
    frac = _NV_UNDERAGE / (_NV_UNDERAGE + _NV_OVERAGE)
    return daily.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        _q6(F.percentile("demand", F.lit(frac))).alias("stock_level"),
        _q6(F.percentile("demand", F.lit(0.5))).alias("median_demand"),
    )


# ---------------------------------------------------------------------------
# K156 — Neyman-allocation stratified sampling plan
# ---------------------------------------------------------------------------

_NEYMAN_BUDGET = 10_000


@query(
    "llm_neyman_allocation",
    oracle=f"""
    WITH scored AS (
        SELECT source, ({SQL_QUALITY}) AS s FROM documents WHERE text IS NOT NULL
    ), strata AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_h,
               {sql_dsum('s')} AS s1, {sql_dsum('s * s')} AS s2
        FROM scored GROUP BY source
    ), sd AS (
        SELECT source, n_h,
               sqrt(greatest(s2 / n_h - (s1 / n_h) * (s1 / n_h), 0)) AS sigma
        FROM strata
    ), tot AS (
        SELECT SUM(n_h * sigma) AS denom, CAST(SUM(n_h) AS BIGINT) AS n
        FROM sd
    )
    SELECT source, n_h,
           {_sql_q6('sigma')} AS sigma_h,
           -- all-homogeneous strata (denom 0) degenerate to the
           -- proportional plan: Neyman is undefined with zero variance
           -- everywhere, and trunc(inf) would abort either engine
           CASE WHEN denom > 0
                THEN CAST(trunc({_NEYMAN_BUDGET} * n_h * sigma / denom)
                          AS BIGINT)
                ELSE CAST(trunc({_NEYMAN_BUDGET} * CAST(n_h AS DOUBLE) / n)
                          AS BIGINT) END AS neyman_n,
           CAST(trunc({_NEYMAN_BUDGET} * CAST(n_h AS DOUBLE) / n) AS BIGINT)
               AS proportional_n
    FROM sd CROSS JOIN tot
    """,
    ref="SURVEY §2 K156 [EXT] (Neyman-allocation stratified sampling "
    "(Neyman 1934): split an n = 10k annotation/eval budget across "
    "source strata ∝ N_h·σ_h — variance-optimal where K52's split and "
    "K27's draws are share-preserving; high-variance sources get MORE "
    "than their share, the standard design for building eval sets and "
    "labeling batches over heterogeneous corpora)",
)
def llm_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sampling plan for a 10k-item budget: stratum size N_h,
    quality-score standard deviation σ_h, the Neyman-optimal allocation
    trunc(n·N_h σ_h / Σ N_k σ_k), and the proportional allocation for
    comparison.

    Scale shape: one narrow corpus scan into a per-source moment agg
    (map-side combined, |sources| output rows); the allocation math is
    per-row on the bounded stratum table against a broadcast 1-row
    denominator. σ from the quantized-moment identity E[s²]−E[s]²
    (guarded at 0 against rounding), computed on the SAME dsum moments
    in both engines."""
    d = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    s = text.quality_score("text")
    strata = d.select(F.col("source"), s.alias("s")).groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_h"),
        dsum("s").alias("s1"),
        dsum(F.col("s") * F.col("s")).alias("s2"),
    )
    sigma = F.sqrt(
        F.greatest(
            F.col("s2") / F.col("n_h")
            - (F.col("s1") / F.col("n_h")) * (F.col("s1") / F.col("n_h")),
            F.lit(0.0),
        )
    )
    sd = strata.select("source", "n_h", sigma.alias("sigma"))
    tot = sd.agg(
        F.sum(F.col("n_h") * F.col("sigma")).alias("denom"),
        F.sum("n_h").cast("bigint").alias("n"),
    )
    return sd.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_h",
        _q6(F.col("sigma")).alias("sigma_h"),
        F.when(
            F.col("denom") > 0,
            (
                _NEYMAN_BUDGET * F.col("n_h") * F.col("sigma")
                / F.col("denom")
            ).cast("bigint"),
        )
        .otherwise(
            (
                _NEYMAN_BUDGET * F.col("n_h").cast("double") / F.col("n")
            ).cast("bigint")
        )
        .alias("neyman_n"),
        (
            _NEYMAN_BUDGET * F.col("n_h").cast("double") / F.col("n")
        ).cast("bigint").alias("proportional_n"),
    )


# ---------------------------------------------------------------------------
# K152b — binary-candidate + float re-rank (the production two-stage)
# ---------------------------------------------------------------------------

_HAM_CAND = 50  # binary-tier candidate pool per query


@query(
    "ann_hamming_rerank_topk",
    oracle=f"""
    WITH sig AS (
        SELECT vec_id, embedding,
               {_sign_pack_sql('embedding', 0)} AS h1,
               {_sign_pack_sql('embedding', 32)} AS h2
        FROM embeddings
    ), cand AS (
        SELECT query_id, vec_id, q_emb, embedding FROM (
            SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
                   q.embedding AS q_emb, v.embedding AS embedding,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY bit_count(xor(q.h1, v.h1))
                                + bit_count(xor(q.h2, v.h2)), v.vec_id) AS rn
            FROM (SELECT * FROM sig WHERE vec_id < 3) q
            CROSS JOIN sig v
            WHERE q.vec_id <> v.vec_id
        ) WHERE rn <= {_HAM_CAND}
    )
    SELECT query_id, vec_id, cosine FROM (
        SELECT query_id, vec_id,
               {_dot_sql('q_emb', 'embedding')} / ({_norm_sql('q_emb')} * {_norm_sql('embedding')}) AS cosine,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY {_dot_sql('q_emb', 'embedding')} / ({_norm_sql('q_emb')} * {_norm_sql('embedding')}) DESC,
                            vec_id) AS rn
        FROM cand
    ) WHERE rn <= 5
    """,
    ref="SURVEY §2 K152 [EXT] (the production TWO-STAGE retrieval "
    "composition: the 16-byte binary tier shortlists 50 candidates per "
    "query by popcount, then EXACT float cosine re-ranks the shortlist "
    "to top-5 — the coarse-then-rerank pattern every binary/PQ index "
    "ships (faiss refine, binary passage retrieval); cost = one "
    "signature scan + 50 float comparisons per query instead of a "
    "full-corpus float scan. Deterministic end to end, so unlike the "
    "IVF/LSH tiers it oracle-checks bit-for-bit; recall law vs the "
    "exact cosine top-5 in tests/test_wave12.py)",
)
def ann_hamming_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage ANN: Hamming-shortlist 50 candidates per query over the
    packed sign signatures, then exact cosine re-rank to top-5 (ties:
    lowest vec_id at both stages).

    Scale shape: stage 1 is ann_hamming_topk's plan with a deeper k —
    per-row fold signatures, 3-row broadcast query side, one
    query-partitioned window over 16-byte rows; stage 2 touches ONLY
    |queries| x 50 float vectors. The float corpus column is read once
    (same scan provides signature and embedding); at 100 TB the
    signature column would be a separate 0.5 TB projection and stage 2
    a point-lookup join against the candidate ids."""
    from ksql_spark.operators import vectors

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        "embedding",
        _sign_pack_spark(F.col("embedding"), 0).alias("h1"),
        _sign_pack_spark(F.col("embedding"), 32).alias("h2"),
    )
    q = e.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("h1").alias("q1"),
        F.col("h2").alias("q2"),
    )
    ham = (
        F.bit_count(F.col("q1").bitwiseXOR(F.col("h1")))
        + F.bit_count(F.col("q2").bitwiseXOR(F.col("h2")))
    )
    cw = Window.partitionBy("query_id").orderBy(ham, F.col("vec_id"))
    cand = (
        F.broadcast(q)
        .crossJoin(e)
        .where(F.col("query_id") != F.col("vec_id"))
        .withColumn("rn", F.row_number().over(cw))
        .where(F.col("rn") <= _HAM_CAND)
        .select("query_id", "vec_id", "q_emb", "embedding")
    )
    cos = F.try_divide(
        vectors.dot("q_emb", "embedding"),
        vectors.l2_norm("q_emb") * vectors.l2_norm("embedding"),
    )
    rw = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        cand.select("query_id", "vec_id", cos.alias("cosine"))
        .withColumn("rn", F.row_number().over(rw))
        .where(F.col("rn") <= 5)
        .drop("rn")
    )
