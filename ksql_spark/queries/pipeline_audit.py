"""[EXT] Corpus / pipeline audit & planning operators (round-9 extension wave):
data-quality gates (referential orphans D55, feed freshness D68), measurement
(multi-touch attribution D57, difference-in-differences D58, Mann-Kendall D62,
Fano dispersion D63, circadian Rayleigh D66), lifecycle/ops analytics
(interval-union coverage D56, backlog aging D59, perfect-order rate D60,
retention half-life D64), planning (price elasticity D61, ABC-XYZ D65,
Croston intermittent demand D67, price indices D78), experimentation
infrastructure (CUPED D73, SPRT D74, SRM+BH D75, McNemar D80), the
statistical-test battery (Mann-Kendall D62, runs test D71, Mann-Whitney D79,
KS shift K131, Hill tail D76, periodogram D81), concentration (HHI D72,
steady state D77), and retrieval/multimodal (MMR K133, Davies-Bouldin K130,
readability K129, thumbnail histogram K132) — the audit-and-measure layer a
100 TB pipeline runs around its main flow. Production siblings (D55b
one-pass audit, D76b pruned Hill) carry the at-scale plans with identity
laws against the exact entries.

Reference scope note: the reference (ksql.js) delegates all SQL to AlaSQL and
has none of these; they follow SURVEY.md §2's [EXT] mandate (training-data
pipeline operators as first-class components).

Determinism: every double goes through the house 1e-6 quantization
(registry.dsum / the trunc-half-up scalar spelling) so Spark and DuckDB agree
bit-for-bit regardless of partition order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

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
# D55 — referential-integrity orphan audit
# ---------------------------------------------------------------------------

#: (child table, child fk col, parent table, parent key col). The DRILL mode
#: re-runs each audit with parents where key % 97 == 0 deliberately dropped —
#: a self-test that the anti-join actually detects loss (a lost parent
#: partition is exactly what this audit exists to catch at 100 TB), and a
#: guard against the all-zeros degenerate pass.
_FK_RELATIONSHIPS = [
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


def _orphan_oracle() -> str:
    parts = []
    for child, fk, parent, pk in _FK_RELATIONSHIPS:
        rel = f"{child}.{fk}->{parent}.{pk}"
        for mode, pred in (("live", "TRUE"), ("drill", f"{pk} % 97 <> 0")):
            parts.append(f"""
    SELECT '{rel}' AS relationship, '{mode}' AS mode,
           (SELECT COUNT(*) FROM {child}) AS child_rows,
           COUNT(*) AS orphan_rows,
           COUNT(DISTINCT c.{fk}) AS orphan_keys,
           {_sql_q6(f"COUNT(*) * 1.0 / (SELECT COUNT(*) FROM {child})")}
               AS orphan_rate
    FROM {child} c
    WHERE NOT EXISTS (
        SELECT 1 FROM {parent} p WHERE p.{pk} = c.{fk} AND {pred}
    )""")
    return " UNION ALL ".join(parts)


@query(
    "dq_referential_orphans",
    oracle=_orphan_oracle(),
    ref="SURVEY §2 D55 [EXT] (referential-integrity audit: per-FK orphan "
    "counts via anti-join, plus a planted-drop drill mode proving the "
    "detector detects — the first data-quality gate any warehouse load "
    "or training-corpus join runs)",
)
def dq_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphaned-foreign-key audit over every relationship in the schema, in
    two modes: `live` (real data — expected 0 orphans) and `drill` (parents
    with key % 97 == 0 dropped before the check, so the anti-join must
    surface the planted orphans; an audit whose green path is never
    exercised is not evidence).

    Scale shape: each relationship is one LEFT ANTI join. Dim-sized parents
    (nation/region/supplier/part/customer) broadcast their key set; the
    SF-proportional lineitem->orders audit is a shuffle semi/anti join on
    the natural key — the plan you would run at 100 TB, where the orphan
    check IS the join. Child row counts ride as broadcast 1-row aggregates
    (no eager .count() action at plan-build time — the whole audit stays
    one lazy DAG). Output is 2 rows per relationship (bounded)."""
    out = None
    for child, fk, parent, pk in _FK_RELATIONSHIPS:
        c = load(spark, sf_dir, child)
        p = load(spark, sf_dir, parent)
        cnt = c.agg(F.count(F.lit(1)).cast("bigint").alias("child_rows"))
        rel = f"{child}.{fk}->{parent}.{pk}"
        for mode in ("live", "drill"):
            par = p if mode == "live" else p.filter(F.col(pk) % 97 != 0)
            orphans = c.join(par, c[fk] == par[pk], "left_anti")
            agg = (
                orphans.agg(
                    F.count(F.lit(1)).alias("orphan_rows"),
                    F.count_distinct(F.col(fk)).alias("orphan_keys"),
                )
                .crossJoin(F.broadcast(cnt))
                .select(
                    F.lit(rel).alias("relationship"),
                    F.lit(mode).alias("mode"),
                    "child_rows",
                    "orphan_rows",
                    "orphan_keys",
                    _q6(
                        F.col("orphan_rows") * 1.0 / F.col("child_rows")
                    ).alias("orphan_rate"),
                )
            )
            out = agg if out is None else out.unionByName(agg)
    return out


# ---------------------------------------------------------------------------
# D56 — interval-union coverage (gaps-and-islands merge)
# ---------------------------------------------------------------------------

@query(
    "customer_order_coverage",
    oracle="""
    WITH bounds AS (
        -- close clamps to >= open: the synthetic corpus contains orders
        -- whose last shipdate PRECEDES the order date (inverted interval),
        -- which would otherwise contribute negative covered time
        SELECT o.o_orderkey, o.o_custkey, o.o_orderdate AS open_d,
               GREATEST(o.o_orderdate, MAX(l.l_shipdate)) AS close_d
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_custkey, o.o_orderdate
    ), marked AS (
        SELECT o_custkey, o_orderkey, open_d, close_d,
               CASE WHEN open_d <= MAX(close_d) OVER (
                        PARTITION BY o_custkey ORDER BY open_d, close_d,
                        o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 0 ELSE 1 END AS new_island
        FROM bounds
    ), islanded AS (
        -- same TOTAL order as marked: without the o_orderkey tiebreaker a
        -- (open, close)-tied twin can receive the running sum BEFORE its
        -- island-opening sibling and land in the previous island
        SELECT o_custkey, open_d, close_d,
               SUM(new_island) OVER (
                   PARTITION BY o_custkey ORDER BY open_d, close_d, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS island_id
        FROM marked
    ), islands AS (
        SELECT o_custkey, island_id,
               MIN(open_d) AS island_open, MAX(close_d) AS island_close
        FROM islanded GROUP BY o_custkey, island_id
    )
    SELECT o_custkey AS custkey,
           CAST(COUNT(*) AS INT) AS n_islands,
           CAST(SUM(date_diff('day', island_open, island_close) + 1) AS BIGINT)
               AS covered_days,
           CAST(MAX(date_diff('day', island_open, island_close) + 1) AS INT)
               AS max_island_days,
           CAST(date_diff('day', MIN(island_open), MAX(island_close)) + 1
               AS INT) AS span_days
    FROM islands GROUP BY o_custkey
    """,
    ref="SURVEY §2 D56 [EXT] (interval union / gaps-and-islands merge: the "
    "complement of D20's sweep-line concurrency — per-entity covered "
    "time after overlapping activity intervals coalesce; uptime, "
    "engagement-coverage, machine-utilization shape)",
)
def customer_order_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per customer, merge overlapping [order open, last shipment] intervals
    into islands and report island count, total covered days, longest
    island, and first-to-last span — the classic interval-union rollup.

    Scale shape: interval bounds are one hash agg on orderkey; island
    detection is two windows PARTITIONED BY custkey (millions of
    independent partitions at scale — no global window anywhere); the
    cummax trick merges overlaps in one pass instead of an interval
    self-join (which would be quadratic per customer). Ties broken by
    (open, close, orderkey) so island ids are total-order deterministic."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    # close clamps to >= open — the corpus has inverted intervals (last
    # shipdate before the order date) that would contribute NEGATIVE
    # covered time (caught by test_coverage_island_invariants)
    bounds = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_custkey", "o_orderdate")
        .agg(
            F.greatest(F.max("l_shipdate"), F.first("o_orderdate")).alias(
                "close_d"
            )
        )
        .withColumnRenamed("o_orderdate", "open_d")
    )
    w_prev = (
        Window.partitionBy("o_custkey")
        .orderBy("open_d", "close_d", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = bounds.select(
        "o_custkey",
        "o_orderkey",
        "open_d",
        "close_d",
        F.when(
            F.col("open_d") <= F.max("close_d").over(w_prev), F.lit(0)
        )
        .otherwise(F.lit(1))
        .alias("new_island"),
    )
    # same TOTAL order as w_prev: a (open, close)-tied twin must take the
    # running sum AFTER its island-opening sibling or it lands in the
    # previous island (caught by test_coverage_island_invariants)
    w_run = (
        Window.partitionBy("o_custkey")
        .orderBy("open_d", "close_d", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islanded = marked.select(
        "o_custkey",
        "open_d",
        "close_d",
        F.sum("new_island").over(w_run).alias("island_id"),
    )
    islands = islanded.groupBy("o_custkey", "island_id").agg(
        F.min("open_d").alias("island_open"),
        F.max("close_d").alias("island_close"),
    )
    ilen = F.datediff(F.col("island_close"), F.col("island_open")) + 1
    return islands.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count(F.lit(1)).cast("int").alias("n_islands"),
        F.sum(ilen).cast("bigint").alias("covered_days"),
        F.max(ilen).cast("int").alias("max_island_days"),
        (
            F.datediff(F.max("island_close"), F.min("island_open")) + 1
        ).cast("int").alias("span_days"),
    )


# ---------------------------------------------------------------------------
# D57 — multi-touch attribution (first / last / linear credit)
# ---------------------------------------------------------------------------

@query(
    "events_attribution_credit",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_id, event_type, ts,
               COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                            END) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS journey_id
        FROM events
    ), converted AS (
        SELECT DISTINCT user_id, journey_id
        FROM ordered WHERE event_type = 'purchase'
    ), touches AS (
        SELECT o.user_id, o.journey_id, o.event_type, o.ts, o.event_id,
               ROW_NUMBER() OVER (PARTITION BY o.user_id, o.journey_id
                                  ORDER BY o.ts, o.event_id) AS rk_first,
               ROW_NUMBER() OVER (PARTITION BY o.user_id, o.journey_id
                                  ORDER BY o.ts DESC, o.event_id DESC)
                   AS rk_last,
               COUNT(*) OVER (PARTITION BY o.user_id, o.journey_id)
                   AS n_touch
        FROM ordered o JOIN converted c
          ON c.user_id = o.user_id AND c.journey_id = o.journey_id
        WHERE o.event_type IN ('click', 'view', 'signup')
    )
    SELECT event_type AS channel,
           CAST(COUNT(*) AS BIGINT) AS touches,
           CAST(SUM(CASE WHEN rk_first = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS first_touch_credit,
           CAST(SUM(CASE WHEN rk_last = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS last_touch_credit,
           {linear} AS linear_credit
    FROM touches GROUP BY event_type
    """.format(linear=sql_dsum("1.0 / n_touch")),
    ref="SURVEY §2 D57 [EXT] (multi-touch conversion attribution: journeys "
    "delimited by purchases via a running conversion counter, then "
    "first- / last- / linear-credit models per channel — the marketing "
    "measurement companion to I11's funnel)",
)
def events_attribution_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each user's event stream into journeys (a journey ends at a
    purchase), then attribute every converted journey to its touch
    channels under the three standard credit models: first-touch,
    last-touch, linear (1/n per touch). Non-converted trailing journeys
    earn nothing; 'error' events are not touches.

    Scale shape: all windows are PARTITIONED BY user_id (two-level:
    journey numbering, then per-journey ranks) — no global window; the
    converted-journey filter is a semi join on (user_id, journey_id),
    co-partitioned with the window shuffle; final agg is 3 channel rows.
    Linear credit addends quantize through registry.dsum so the float
    sum is partition-order-insensitive."""
    e = load(spark, sf_dir, "events")
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ordered = e.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.coalesce(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).over(w_prev),
            F.lit(0),
        ).alias("journey_id"),
    )
    converted = (
        ordered.filter(F.col("event_type") == "purchase")
        .select("user_id", "journey_id")
        .distinct()
    )
    w_first = Window.partitionBy("user_id", "journey_id").orderBy(
        "ts", "event_id"
    )
    w_last = Window.partitionBy("user_id", "journey_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    w_n = Window.partitionBy("user_id", "journey_id")
    touches = (
        ordered.filter(F.col("event_type").isin("click", "view", "signup"))
        .join(converted, ["user_id", "journey_id"], "semi")
        .select(
            "event_type",
            F.row_number().over(w_first).alias("rk_first"),
            F.row_number().over(w_last).alias("rk_last"),
            F.count(F.lit(1)).over(w_n).alias("n_touch"),
        )
    )
    return touches.groupBy(F.col("event_type").alias("channel")).agg(
        F.count(F.lit(1)).cast("bigint").alias("touches"),
        F.sum(F.when(F.col("rk_first") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("first_touch_credit"),
        F.sum(F.when(F.col("rk_last") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("last_touch_credit"),
        dsum(F.lit(1.0) / F.col("n_touch")).alias("linear_credit"),
    )


# ---------------------------------------------------------------------------
# D58 — difference-in-differences estimator
# ---------------------------------------------------------------------------

_DID_CUT = "2024-01-16"


@query(
    "events_did_estimator",
    oracle=f"""
    WITH cells AS (
        SELECT
            CAST(user_id % 2 AS INT) AS treat,
            CASE WHEN ts >= TIMESTAMP '{_DID_CUT} 00:00:00' THEN 1 ELSE 0
                END AS post,
            value
        FROM events WHERE event_type = 'purchase'
    ), agg AS (
        SELECT
            CAST(SUM(CASE WHEN treat = 1 AND post = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_t_post,
            CAST(SUM(CASE WHEN treat = 1 AND post = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_t_pre,
            CAST(SUM(CASE WHEN treat = 0 AND post = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_c_post,
            CAST(SUM(CASE WHEN treat = 0 AND post = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_c_pre,
            {sql_dsum("CASE WHEN treat = 1 AND post = 1 THEN value END")}
                AS s_t_post,
            {sql_dsum("CASE WHEN treat = 1 AND post = 0 THEN value END")}
                AS s_t_pre,
            {sql_dsum("CASE WHEN treat = 0 AND post = 1 THEN value END")}
                AS s_c_post,
            {sql_dsum("CASE WHEN treat = 0 AND post = 0 THEN value END")}
                AS s_c_pre
        FROM cells
    )
    SELECT n_t_pre, n_t_post, n_c_pre, n_c_post,
           {_sql_q6("s_t_pre / n_t_pre")} AS mean_t_pre,
           {_sql_q6("s_t_post / n_t_post")} AS mean_t_post,
           {_sql_q6("s_c_pre / n_c_pre")} AS mean_c_pre,
           {_sql_q6("s_c_post / n_c_post")} AS mean_c_post,
           {_sql_q6(
               "(s_t_post / n_t_post - s_t_pre / n_t_pre)"
               " - (s_c_post / n_c_post - s_c_pre / n_c_pre)"
           )} AS did_estimate
    FROM agg
    """,
    ref="SURVEY §2 D58 [EXT] (difference-in-differences: 2x2 "
    "treat/control x pre/post panel on purchase values, parallel-trends "
    "interaction estimate — the quasi-experimental companion to D38's "
    "randomized A/B report)",
)
def events_did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences over purchase values: treatment = odd
    user_id, post period = on/after Jan 16. Reports the four cell
    counts/means and the DiD interaction estimate
    (ΔTreat_post-pre − ΔControl_post-pre).

    Scale shape: single full-corpus pass collapsing into ONE aggregate
    row (4 conditional counts + 4 quantized conditional sums — map-side
    partial agg does nearly all the work); the 2x2 arithmetic is
    driver-free column math on that row. The exact shape you'd run on
    100 TB of event logs."""
    e = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    treat = (F.col("user_id") % 2).cast("int")
    post = F.when(
        F.col("ts") >= F.lit(f"{_DID_CUT} 00:00:00").cast("timestamp"), 1
    ).otherwise(0)
    cells = e.select(
        treat.alias("treat"), post.alias("post"), F.col("value")
    )

    def n_of(t, p):
        return F.sum(
            F.when((F.col("treat") == t) & (F.col("post") == p), 1).otherwise(0)
        ).cast("bigint")

    def s_of(t, p):
        return dsum(
            F.when((F.col("treat") == t) & (F.col("post") == p), F.col("value"))
        )

    agg = cells.agg(
        n_of(1, 1).alias("n_t_post"),
        n_of(1, 0).alias("n_t_pre"),
        n_of(0, 1).alias("n_c_post"),
        n_of(0, 0).alias("n_c_pre"),
        s_of(1, 1).alias("s_t_post"),
        s_of(1, 0).alias("s_t_pre"),
        s_of(0, 1).alias("s_c_post"),
        s_of(0, 0).alias("s_c_pre"),
    )
    m = {
        k: F.col(f"s_{k}") / F.col(f"n_{k}")
        for k in ("t_pre", "t_post", "c_pre", "c_post")
    }
    return agg.select(
        "n_t_pre",
        "n_t_post",
        "n_c_pre",
        "n_c_post",
        _q6(m["t_pre"]).alias("mean_t_pre"),
        _q6(m["t_post"]).alias("mean_t_post"),
        _q6(m["c_pre"]).alias("mean_c_pre"),
        _q6(m["c_post"]).alias("mean_c_post"),
        _q6(
            (m["t_post"] - m["t_pre"]) - (m["c_post"] - m["c_pre"])
        ).alias("did_estimate"),
    )


# ---------------------------------------------------------------------------
# D59 — open-order backlog aging
# ---------------------------------------------------------------------------

_AGE_EDGES = [30, 90, 180, 365]  # bucket upper bounds, days


def _age_bucket_sql(age: str) -> str:
    return f"""CASE
        WHEN {age} <= 30 THEN '000-030'
        WHEN {age} <= 90 THEN '031-090'
        WHEN {age} <= 180 THEN '091-180'
        WHEN {age} <= 365 THEN '181-365'
        ELSE '365+' END"""


@query(
    "orders_backlog_aging",
    oracle=f"""
    WITH snap AS (SELECT MAX(o_orderdate) AS as_of FROM orders),
    open_orders AS (
        SELECT o_orderstatus AS status, o_totalprice,
               date_diff('day', o_orderdate, as_of) AS age_days
        FROM orders CROSS JOIN snap
        WHERE o_orderstatus IN ('O', 'P')
    ), bucketed AS (
        SELECT status, {_age_bucket_sql('age_days')} AS age_bucket,
               o_totalprice
        FROM open_orders
    ), tot AS (SELECT {sql_dsum('o_totalprice')} AS backlog_value
               FROM bucketed)
    SELECT status, age_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_dsum('o_totalprice')} AS bucket_value,
           {_sql_q6(f"({sql_dsum('o_totalprice')}) / backlog_value")}
               AS value_share
    FROM bucketed CROSS JOIN tot
    GROUP BY status, age_bucket, backlog_value
    """,
    ref="SURVEY §2 D59 [EXT] (open-order backlog aging: unshipped/pending "
    "orders bucketed by age against the corpus as-of snapshot, with "
    "value share of total backlog — the working-capital / WIP report "
    "every operations dashboard opens with)",
)
def orders_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backlog aging report: open ('O') and pending ('P') orders bucketed
    by days outstanding as of the newest order date, with order counts,
    bucket value, and each bucket's share of total backlog value.

    Scale shape: the as-of snapshot and the backlog total are 1-row
    aggregates broadcast into the scan (no eager action, no second
    wide pass); bucketing is pure column math; final agg is at most
    2 statuses x 5 buckets. One fact scan does everything."""
    o = load(spark, sf_dir, "orders")
    snap = o.agg(F.max("o_orderdate").alias("as_of"))
    open_orders = (
        o.filter(F.col("o_orderstatus").isin("O", "P"))
        .crossJoin(F.broadcast(snap))
        .select(
            F.col("o_orderstatus").alias("status"),
            "o_totalprice",
            F.datediff(F.col("as_of"), F.col("o_orderdate")).alias(
                "age_days"
            ),
        )
    )
    age = F.col("age_days")
    bucket = (
        F.when(age <= 30, "000-030")
        .when(age <= 90, "031-090")
        .when(age <= 180, "091-180")
        .when(age <= 365, "181-365")
        .otherwise("365+")
    )
    bucketed = open_orders.select(
        "status", bucket.alias("age_bucket"), "o_totalprice"
    )
    tot = bucketed.agg(dsum("o_totalprice").alias("backlog_value"))
    return (
        bucketed.crossJoin(F.broadcast(tot))
        .groupBy("status", "age_bucket", "backlog_value")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            dsum("o_totalprice").alias("bucket_value"),
        )
        .select(
            "status",
            "age_bucket",
            "n_orders",
            "bucket_value",
            _q6(F.col("bucket_value") / F.col("backlog_value")).alias(
                "value_share"
            ),
        )
    )


# ---------------------------------------------------------------------------
# D60 — perfect-order rate (on-time, no-return, complete)
# ---------------------------------------------------------------------------

_POR_SLA_DAYS = 30


@query(
    "orders_perfect_order_rate",
    oracle=f"""
    WITH per_order AS (
        SELECT o.o_orderkey,
               strftime(o.o_orderdate, '%Y-%m') AS order_month,
               CASE WHEN
                   SUM(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate)
                                 > {_POR_SLA_DAYS}
                            OR l.l_returnflag = 'R' THEN 1 ELSE 0 END) = 0
               THEN 1 ELSE 0 END AS perfect
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, strftime(o.o_orderdate, '%Y-%m')
    )
    SELECT order_month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(perfect) AS BIGINT) AS n_perfect,
           {_sql_q6("SUM(perfect) * 1.0 / COUNT(*)")} AS perfect_rate
    FROM per_order GROUP BY order_month
    """,
    ref="SURVEY §2 D60 [EXT] (perfect-order rate: every line shipped "
    "within the 30-day SLA and nothing returned, rolled up monthly — "
    "the composite fulfillment KPI supply-chain scorecards track; "
    "complement of D23's latency percentiles and D50's scorecard)",
)
def orders_perfect_order_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly perfect-order rate: an order is perfect iff every lineitem
    shipped within 30 days of the order date AND no line was returned
    (l_returnflag = 'R'). Reports order counts and the perfect share per
    order month.

    Scale shape: one orderkey-keyed join (lineitem shuffles once on its
    natural key), violations collapse per order via a conditional SUM in
    the same exchange, then a bounded month rollup. No window, no second
    fact pass."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    viol = F.when(
        (
            F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
            > _POR_SLA_DAYS
        )
        | (F.col("l_returnflag") == "R"),
        1,
    ).otherwise(0)
    per_order = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
        )
        .agg(
            F.when(F.sum(viol) == 0, 1).otherwise(0).alias("perfect")
        )
    )
    return per_order.groupBy("order_month").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("perfect").cast("bigint").alias("n_perfect"),
        _q6(F.sum("perfect") * 1.0 / F.count(F.lit(1))).alias(
            "perfect_rate"
        ),
    )


# ---------------------------------------------------------------------------
# D61 — price elasticity (log-log OLS per brand)
# ---------------------------------------------------------------------------

@query(
    "part_price_elasticity",
    oracle=f"""
    WITH pts AS (
        SELECT p.p_brand,
               CAST(trunc(ln(l.l_extendedprice / l.l_quantity
                             * (1.0 - l.l_discount))
                    * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS x,
               CAST(trunc(ln(l.l_quantity)
                    * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS y
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_quantity > 0 AND l.l_extendedprice > 0
          AND l.l_discount < 1.0
    ), m AS (
        SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
               {sql_dsum('x')} AS sx, {sql_dsum('y')} AS sy,
               {sql_dsum('x * x')} AS sxx, {sql_dsum('x * y')} AS sxy,
               {sql_dsum('y * y')} AS syy
        FROM pts GROUP BY p_brand
    )
    SELECT p_brand AS brand, n,
           {_sql_q6("(n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0)")}
               AS elasticity,
           {_sql_q6(
               "((n * sxy - sx * sy) * (n * sxy - sx * sy))"
               " / NULLIF((n * sxx - sx * sx) * (n * syy - sy * sy), 0)"
           )} AS r2
    FROM m
    """,
    ref="SURVEY §2 D61 [EXT] (own-price elasticity: log-log OLS of "
    "quantity on effective unit price per brand — the slope IS the "
    "elasticity estimate (Marshall); K115's closed-form moment "
    "discipline applied to the pricing question every retailer asks)",
)
def part_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand price elasticity of demand: OLS slope of ln(quantity) on
    ln(effective unit price) (extendedprice/quantity discounted), with
    fit r². Slope near -1 = unit-elastic; r² says how much of quantity
    variation price explains at all.

    Scale shape: part joins the lineitem scan un-hinted — AQE broadcasts
    it while it fits and falls back to a partkey-keyed shuffle join at the
    SF where it no longer does (part is SF-proportional, so a broadcast
    HINT would be the classic 100 TB OOM; gate-enforced repo-wide); x/y are
    quantized per row (ln is engine-identical IEEE); the five OLS
    moments accumulate via exact scaled-long dsum in ONE |brands|-group
    agg with map-side combine; the closed-form solve is column math on
    the bounded result. No window, no second pass."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    pts = (
        li.filter(
            (F.col("l_quantity") > 0)
            & (F.col("l_extendedprice") > 0)
            & (F.col("l_discount") < 1.0)
        )
        .join(p, li.l_partkey == p.p_partkey)
        .select(
            "p_brand",
            _q6(
                F.log(
                    F.col("l_extendedprice")
                    / F.col("l_quantity")
                    * (F.lit(1.0) - F.col("l_discount"))
                )
            ).alias("x"),
            _q6(F.log(F.col("l_quantity"))).alias("y"),
        )
    )
    m = pts.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum("x").alias("sx"),
        dsum("y").alias("sy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
        dsum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    return m.select(
        F.col("p_brand").alias("brand"),
        "n",
        _q6(
            (n * sxy - sx * sy) / F.nullif(n * sxx - sx * sx, F.lit(0.0))
        ).alias("elasticity"),
        _q6(
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / F.nullif(
                (n * sxx - sx * sx) * (n * syy - sy * sy), F.lit(0.0)
            )
        ).alias("r2"),
    )


# ---------------------------------------------------------------------------
# D62 — Mann-Kendall trend test
# ---------------------------------------------------------------------------

@query(
    "events_mann_kendall",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), s AS (
        SELECT a.event_type,
               CAST(SUM(CASE WHEN b.x > a.x THEN 1
                             WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT)
                   AS s_stat
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.d < b.d
        GROUP BY a.event_type
    ), nn AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM daily
        GROUP BY event_type
    ), ties AS (
        SELECT event_type,
               CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
                   AS tie_term
        FROM (
            SELECT event_type, x, CAST(COUNT(*) AS BIGINT) AS t
            FROM daily GROUP BY event_type, x
        ) GROUP BY event_type
    ), stats AS (
        SELECT nn.event_type, nn.n, s.s_stat,
               {_sql_q6(
                   "(nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_term)"
                   " / 18.0"
               )} AS var_s
        FROM nn JOIN s ON s.event_type = nn.event_type
        JOIN ties ON ties.event_type = nn.event_type
    ), z AS (
        SELECT event_type, n, s_stat, var_s,
               {_sql_q6(
                   "CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s) "
                   "WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s) "
                   "ELSE 0.0 END"
               )} AS z_stat
        FROM stats
    )
    SELECT event_type, n AS n_days, s_stat, var_s, z_stat,
           CASE WHEN z_stat > 1.96 THEN 'increasing'
                WHEN z_stat < -1.96 THEN 'decreasing'
                ELSE 'no trend' END AS trend
    FROM z
    """,
    ref="SURVEY §2 D62 [EXT] (Mann-Kendall monotonic-trend test on the "
    "daily count series per event type: S from pairwise signs, "
    "tie-corrected variance, continuity-corrected z vs +-1.96 — the "
    "distribution-free companion to K87's parametric rolling slope; "
    "Mann 1945 / Kendall 1975)",
)
def events_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nonparametric Mann-Kendall trend test per event type over daily
    volumes: S = sum of pairwise sign(x_j - x_i) for i<j, tie-corrected
    Var(S), continuity-corrected z, and the 5% two-sided verdict.

    Scale shape: the corpus collapses to <= |types| x |days| daily rows in
    one map-side-combined agg; the pair stage is a self-join keyed on
    event_type over that BOUNDED daily table (<= days^2/2 pairs per type —
    calendar-bounded, never corpus-bounded); ties/variance are closed-form
    integer arithmetic. Nothing downstream of the first agg scales with
    the corpus."""
    e = load(spark, sf_dir, "events")
    from ksql_spark.operators.scale import pin

    # pin: the self-join pair stage, nn, and ties would otherwise each
    # re-run the corpus agg (4 parquet scans -> 1)
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x")).transform(
        pin, eager=False
    )
    a = daily.alias("a")
    b = daily.alias("b")
    s = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.d") < F.col("b.d")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(
                F.when(F.col("b.x") > F.col("a.x"), 1)
                .when(F.col("b.x") < F.col("a.x"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s_stat")
        )
    )
    nn = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    t = F.col("t")
    ties = (
        daily.groupBy("event_type", "x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .groupBy("event_type")
        .agg(
            F.coalesce(F.sum(t * (t - 1) * (2 * t + 5)), F.lit(0))
            .cast("bigint")
            .alias("tie_term")
        )
    )
    n = F.col("n")
    stats = (
        nn.join(s, "event_type")
        .join(ties, "event_type")
        .select(
            "event_type",
            "n",
            "s_stat",
            _q6(
                (n * (n - 1) * (2 * n + 5) - F.col("tie_term")) / F.lit(18.0)
            ).alias("var_s"),
        )
    )
    ss = F.col("s_stat")
    z = stats.select(
        "event_type",
        "n",
        "s_stat",
        "var_s",
        _q6(
            F.when(ss > 0, (ss - 1) / F.sqrt(F.col("var_s")))
            .when(ss < 0, (ss + 1) / F.sqrt(F.col("var_s")))
            .otherwise(F.lit(0.0))
        ).alias("z_stat"),
    )
    zc = F.col("z_stat")
    return z.select(
        "event_type",
        F.col("n").alias("n_days"),
        "s_stat",
        "var_s",
        "z_stat",
        F.when(zc > 1.96, "increasing")
        .when(zc < -1.96, "decreasing")
        .otherwise("no trend")
        .alias("trend"),
    )


# ---------------------------------------------------------------------------
# D63 — index-of-dispersion (Fano factor) screen
# ---------------------------------------------------------------------------

@query(
    "events_dispersion_fano",
    oracle=f"""
    WITH bounds AS (
        SELECT event_type, MIN(CAST(ts AS DATE)) AS d0,
               MAX(CAST(ts AS DATE)) AS d1
        FROM events GROUP BY event_type
    ), spine AS (
        SELECT event_type, CAST(UNNEST(generate_series(d0, d1,
               INTERVAL 1 DAY)) AS DATE) AS d
        FROM bounds
    ), obs AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), daily AS (
        SELECT spine.event_type, spine.d, COALESCE(obs.x, 0) AS x
        FROM spine LEFT JOIN obs
          ON obs.event_type = spine.event_type AND obs.d = spine.d
    ), m AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM daily GROUP BY event_type
    )
    SELECT event_type, n AS n_days,
           {_sql_q6("sx * 1.0 / n")} AS mean_daily,
           {_sql_q6("(sxx - sx * 1.0 * sx / n) / (n - 1)")} AS var_daily,
           {_sql_q6(
               "((sxx - sx * 1.0 * sx / n) / (n - 1)) / (sx * 1.0 / n)"
           )} AS fano,
           CASE WHEN {_sql_q6(
               "((sxx - sx * 1.0 * sx / n) / (n - 1)) / (sx * 1.0 / n)"
           )} > 1.5 THEN 1 ELSE 0 END AS overdispersed
    FROM m WHERE n > 1 AND sx > 0
    """,
    ref="SURVEY §2 D63 [EXT] (index of dispersion / Fano factor on the "
    "calendar-complete daily series per type: var/mean = 1 under "
    "Poisson, >1 = bursty/clustered arrivals — the screen that says "
    "whether D31's inter-arrival model or K64's CUSUM parameters are "
    "even applicable; Fano 1947)",
)
def events_dispersion_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (index of dispersion) per event type over the
    calendar-complete daily count series (zero days enter at full
    weight — omitting them biases toward Poisson exactly when traffic
    is most bursty). var/mean ~ 1 = Poisson-like; > 1.5 flagged
    overdispersed.

    Scale shape: corpus collapses to bounded daily rows in one
    map-side-combined agg; the spine is a per-type date expansion of the
    2-column bounds table; moments are exact integer sums; everything
    after the first agg is calendar-bounded."""
    e = load(spark, sf_dir, "events")
    obs = e.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    bounds = e.groupBy("event_type").agg(
        F.min(F.to_date("ts")).alias("d0"),
        F.max(F.to_date("ts")).alias("d1"),
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence("d0", "d1")).alias("d"),
    )
    daily = spine.join(obs, ["event_type", "d"], "left").select(
        "event_type", "d", F.coalesce("x", F.lit(0)).alias("x")
    )
    x = F.col("x")
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x).cast("bigint").alias("sx"),
        F.sum(x * x).cast("bigint").alias("sxx"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    mean = sx * 1.0 / n
    var = (sxx - sx * 1.0 * sx / n) / (n - 1)
    fano = _q6(var / mean)
    return m.where((n > 1) & (sx > 0)).select(
        "event_type",
        n.alias("n_days"),
        _q6(mean).alias("mean_daily"),
        _q6(var).alias("var_daily"),
        fano.alias("fano"),
        F.when(fano > 1.5, 1).otherwise(0).alias("overdispersed"),
    )


# ---------------------------------------------------------------------------
# D64 — retention decay fit (half-life per weekly cohort)
# ---------------------------------------------------------------------------

@query(
    "events_retention_halflife",
    oracle=f"""
    WITH firsts AS (
        SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_w
        FROM events GROUP BY user_id
    ), active AS (
        SELECT DISTINCT e.user_id, f.cohort_w,
               date_diff('week', f.cohort_w, date_trunc('week', e.ts)) AS k
        FROM events e JOIN firsts f ON f.user_id = e.user_id
    ), cohort_n AS (
        SELECT cohort_w, CAST(COUNT(*) AS BIGINT) AS c0 FROM firsts
        GROUP BY cohort_w
    ), rates AS (
        SELECT a.cohort_w, a.k,
               CAST(COUNT(*) AS BIGINT) AS active_users, n.c0,
               CAST(trunc(ln(COUNT(*) * 1.0 / n.c0) * 1000000 + 0.5)
                    AS BIGINT) / 1000000.0 AS y
        FROM active a JOIN cohort_n n ON n.cohort_w = a.cohort_w
        WHERE a.k >= 1
        GROUP BY a.cohort_w, a.k, n.c0
    ), m AS (
        SELECT cohort_w, CAST(COUNT(*) AS BIGINT) AS n,
               {sql_dsum('k * 1.0')} AS sx, {sql_dsum('y')} AS sy,
               {sql_dsum('k * 1.0 * k')} AS sxx, {sql_dsum('k * y')} AS sxy
        FROM rates GROUP BY cohort_w
    )
    SELECT CAST(cohort_w AS TIMESTAMP) AS cohort_week, n AS n_weeks,
           {_sql_q6(
               "-((n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0))"
           )} AS decay_rate,
           CASE WHEN (n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0) < 0
                THEN {_sql_q6(
                    "ln(2.0) / (-((n * sxy - sx * sy)"
                    " / NULLIF(n * sxx - sx * sx, 0)))"
                )}
                ELSE NULL END AS half_life_weeks
    FROM m WHERE n >= 2
    """,
    ref="SURVEY §2 D64 [EXT] (retention decay fit: log-linear OLS of "
    "ln(retention rate) on weeks-since-cohort per weekly cohort, "
    "decay rate lambda and half-life ln2/lambda — the single number "
    "product teams quote from K80's retention triangle)",
)
def events_retention_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per weekly cohort: fit retention(k) ~ exp(-lambda k) by OLS on
    ln(rate) for k >= 1, report the decay rate and half-life in weeks
    (null when retention isn't decaying). Cohort = user's first-event
    week.

    Scale shape: first-week per user and distinct (user, week) activity
    are two user-keyed aggs; rates are a bounded cohort x week table;
    the fit is the closed-form moment discipline (dsum-exact sums, one
    bounded agg). No window, no driver math."""
    e = load(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.date_trunc("week", "ts")).alias("cohort_w")
    )
    active = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_w",
            (
                F.datediff(
                    F.date_trunc("week", "ts"), F.col("cohort_w")
                )
                / 7
            )
            .cast("bigint")
            .alias("k"),
        )
        .distinct()
    )
    cohort_n = firsts.groupBy("cohort_w").agg(
        F.count(F.lit(1)).cast("bigint").alias("c0")
    )
    rates = (
        active.filter(F.col("k") >= 1)
        .groupBy("cohort_w", "k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("active_users"))
        .join(cohort_n, "cohort_w")
        .select(
            "cohort_w",
            "k",
            _q6(
                F.log(F.col("active_users") * 1.0 / F.col("c0"))
            ).alias("y"),
        )
    )
    kd = F.col("k") * 1.0
    m = rates.groupBy("cohort_w").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum(kd).alias("sx"),
        dsum("y").alias("sy"),
        dsum(kd * F.col("k")).alias("sxx"),
        dsum(F.col("k") * F.col("y")).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy = F.col("sxx"), F.col("sxy")
    slope = (n * sxy - sx * sy) / F.nullif(n * sxx - sx * sx, F.lit(0.0))
    return m.where(n >= 2).select(
        F.col("cohort_w").alias("cohort_week"),
        n.alias("n_weeks"),
        _q6(-slope).alias("decay_rate"),
        F.when(slope < 0, _q6(F.log(F.lit(2.0)) / (-slope))).alias(
            "half_life_weeks"
        ),
    )


# ---------------------------------------------------------------------------
# K129 — readability scoring (Flesch / Flesch-Kincaid)
# ---------------------------------------------------------------------------

@query(
    "llm_readability_fk",
    oracle=f"""
    WITH per_doc AS (
        SELECT source,
               GREATEST(len(string_split(text, ' ')), 1) AS w,
               GREATEST(len(regexp_extract_all(text, '[.!?]')), 1) AS s,
               GREATEST(len(regexp_extract_all(text, '[aeiouy]+')), 1)
                   AS syl
        FROM documents
    ), scored AS (
        SELECT source,
               {_sql_q6(
                   "206.835 - 1.015 * (w * 1.0 / s)"
                   " - 84.6 * (syl * 1.0 / w)"
               )} AS flesch,
               {_sql_q6(
                   "0.39 * (w * 1.0 / s) + 11.8 * (syl * 1.0 / w) - 15.59"
               )} AS fk_grade
        FROM per_doc
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           {sql_dsum('flesch')} AS sum_flesch,
           {_sql_q6(f"({sql_dsum('flesch')}) / COUNT(*)")} AS mean_flesch,
           {_sql_q6(f"({sql_dsum('fk_grade')}) / COUNT(*)")} AS mean_fk_grade,
           CAST(SUM(CASE WHEN fk_grade > 12.0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_above_grade12
    FROM scored GROUP BY source
    """,
    ref="SURVEY §2 K129 [EXT] (readability scoring: Flesch reading ease "
    "+ Flesch-Kincaid grade from word/sentence/syllable-proxy counts "
    "(vowel-group runs), aggregated per source — the curriculum / "
    "difficulty-mix signal next to K22's ordering and K44's Gopher "
    "rules; Kincaid et al. 1975)",
)
def llm_readability_fk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading ease and Flesch-Kincaid grade per source, from
    whitespace words, sentence marks ([.!?], clamped >= 1 — the fixture
    corpus has no punctuation so every doc is one sentence), and the
    standard syllable proxy (runs of vowels incl. y). Reports per-source
    means and the share of documents above grade 12.

    Scale shape: three regexp/split counts per row (JVM codegen, no
    UDF), quantized per-doc scores, ONE |sources|-group agg with
    map-side combine. Nothing scales past the single scan."""
    d = load(spark, sf_dir, "documents")
    w = F.greatest(F.size(F.split("text", " ")), F.lit(1))
    s = F.greatest(
        F.size(F.regexp_extract_all("text", F.lit("[.!?]"), F.lit(0))),
        F.lit(1),
    )
    syl = F.greatest(
        F.size(F.regexp_extract_all("text", F.lit("[aeiouy]+"), F.lit(0))),
        F.lit(1),
    )
    wps = w * 1.0 / s
    spw = syl * 1.0 / w
    scored = d.select(
        "source",
        _q6(F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw).alias(
            "flesch"
        ),
        _q6(F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)).alias(
            "fk_grade"
        ),
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        dsum("flesch").alias("sum_flesch"),
        _q6(dsum("flesch") / F.count(F.lit(1))).alias("mean_flesch"),
        _q6(dsum("fk_grade") / F.count(F.lit(1))).alias("mean_fk_grade"),
        F.sum(F.when(F.col("fk_grade") > 12.0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_above_grade12"),
    )


# ---------------------------------------------------------------------------
# D65 — ABC-XYZ inventory matrix
# ---------------------------------------------------------------------------

@query(
    "part_abc_xyz_matrix",
    oracle=f"""
    WITH rev AS (
        SELECT l_partkey,
               {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
        FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT {sql_dsum('l_extendedprice * (1 - l_discount)')} AS t
            FROM lineitem),
    c AS (
        SELECT l_partkey, revenue,
               CAST(SUM(CAST(trunc(revenue * 100 + 0.5) AS BIGINT)) OVER (
                   ORDER BY revenue DESC, l_partkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) / 100.0 AS cum
        FROM rev
    ),
    abc AS (
        SELECT l_partkey, revenue,
               CASE WHEN cum / t <= 0.5 THEN 'A'
                    WHEN cum / t <= 0.8 THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM c, tot
    ),
    monthly AS (
        SELECT l_partkey, date_trunc('month', l_shipdate) AS m,
               {sql_dsum('l_quantity')} AS q
        FROM lineitem GROUP BY l_partkey, date_trunc('month', l_shipdate)
    ),
    cv AS (
        SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n,
               {sql_dsum('q')} AS sq, {sql_dsum('q * q')} AS sqq
        FROM monthly GROUP BY l_partkey
    ),
    xyz AS (
        SELECT l_partkey,
               CASE WHEN n < 2 OR sq <= 0 THEN 'Z'
                    WHEN {_sql_q6(
                        "sqrt(greatest((sqq - sq * sq / n) / (n - 1), 0.0))"
                        " / (sq / n)"
                    )} <= 0.5 THEN 'X'
                    WHEN {_sql_q6(
                        "sqrt(greatest((sqq - sq * sq / n) / (n - 1), 0.0))"
                        " / (sq / n)"
                    )} <= 1.0 THEN 'Y'
                    ELSE 'Z' END AS xyz_class
        FROM cv
    )
    SELECT abc.abc_class, xyz.xyz_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           {sql_dsum('abc.revenue')} AS class_revenue,
           {_sql_q6(f"({sql_dsum('abc.revenue')}) / MAX(tot.t)")}
               AS revenue_share
    FROM abc JOIN xyz ON xyz.l_partkey = abc.l_partkey
    CROSS JOIN tot
    GROUP BY abc.abc_class, xyz.xyz_class
    """,
    ref="SURVEY §2 D65 [EXT] (ABC-XYZ matrix: K58's Pareto revenue cut "
    "crossed with demand-variability classes from the coefficient of "
    "variation of monthly quantities — X steady / Y seasonal / Z "
    "erratic; the 9-cell planning grid inventory policy is set from)",
)
def part_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ABC (revenue concentration) x XYZ (demand variability) matrix:
    per cell, part count, revenue, and revenue share. ABC cuts at
    50%/80% cumulative revenue; XYZ cuts at monthly-demand CV 0.5/1.0
    (parts with <2 demand months are Z by definition).

    Scale shape: ABC reuses the ranged two-pass cumsum (no
    single-partition window — K58's device); XYZ is one
    (part, month) agg then a part-keyed moment agg; the final join is
    part-keyed and the output is <= 9 cells. Total: two lineitem scans,
    both collapsing immediately."""
    from ksql_spark.operators.scale import ranged_cumsum

    li = load(spark, sf_dir, "lineitem")
    rev_expr = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rev = li.groupBy("l_partkey").agg(dsum(rev_expr).alias("revenue"))
    tot = li.agg(dsum(rev_expr).alias("t"))
    # CENTS (x100), not micro-units (x1e6): the GLOBAL running revenue at
    # 1e6 scale had only ~3x headroom to 2^63 at the sf10 probe (long
    # overflow around sf30); cents buy 1e4 more domain — past 100 TB —
    # while keeping the fast long window (a decimal accumulator measured
    # 2.5x slower at probe). The gini entry set this precedent.
    scaled = rev.withColumn(
        "rev_scaled", (F.col("revenue") * 100 + F.lit(0.5)).cast("long")
    )
    c = ranged_cumsum(
        scaled,
        [F.col("revenue").desc(), F.col("l_partkey")],
        "rev_scaled",
        out_col="cum_scaled",
    ).withColumn("cum", F.col("cum_scaled").cast("double") / 100.0)
    share = F.col("cum") / F.col("t")
    abc = c.crossJoin(F.broadcast(tot)).select(
        "l_partkey",
        "revenue",
        F.when(share <= 0.5, "A")
        .when(share <= 0.8, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    monthly = li.groupBy(
        "l_partkey", F.date_trunc("month", "l_shipdate").alias("m")
    ).agg(dsum("l_quantity").alias("q"))
    cv = monthly.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum("q").alias("sq"),
        dsum(F.col("q") * F.col("q")).alias("sqq"),
    )
    n, sq, sqq = F.col("n"), F.col("sq"), F.col("sqq")
    cv_val = _q6(
        F.sqrt(F.greatest((sqq - sq * sq / n) / (n - 1), F.lit(0.0)))
        / (sq / n)
    )
    xyz = cv.select(
        "l_partkey",
        F.when((n < 2) | (sq <= 0), "Z")
        .when(cv_val <= 0.5, "X")
        .when(cv_val <= 1.0, "Y")
        .otherwise("Z")
        .alias("xyz_class"),
    )
    return (
        abc.join(xyz, "l_partkey")
        .crossJoin(F.broadcast(tot))
        .groupBy("abc_class", "xyz_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            dsum("revenue").alias("class_revenue"),
            _q6(dsum("revenue") / F.max("t")).alias("revenue_share"),
        )
    )


# ---------------------------------------------------------------------------
# D66 — circadian concentration (Rayleigh test on the 24h circle)
# ---------------------------------------------------------------------------

@query(
    "events_circadian_rayleigh",
    oracle=f"""
    WITH ang AS (
        SELECT event_type,
               2 * pi() * (extract(hour FROM ts) * 3600.0
                           + extract(minute FROM ts) * 60.0
                           + extract(second FROM ts)) / 86400.0 AS theta
        FROM events
    ), m AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               {sql_dsum('cos(theta)')} AS sc, {sql_dsum('sin(theta)')} AS ss
        FROM ang GROUP BY event_type
    )
    SELECT event_type, n,
           {_sql_q6("sqrt(sc * sc + ss * ss) / n")} AS resultant_r,
           {_sql_q6(
               "CASE WHEN atan2(ss, sc) >= 0"
               " THEN atan2(ss, sc) * 24.0 / (2 * pi())"
               " ELSE (atan2(ss, sc) + 2 * pi()) * 24.0 / (2 * pi()) END"
           )} AS mean_hour,
           {_sql_q6("(sc * sc + ss * ss) / n")} AS rayleigh_z,
           CASE WHEN {_sql_q6("(sc * sc + ss * ss) / n")} > 2.995732
                THEN 1 ELSE 0 END AS concentrated
    FROM m
    """,
    ref="SURVEY §2 D66 [EXT] (circular statistics on time-of-day: "
    "resultant length R, circular mean hour via atan2, Rayleigh "
    "z = nR² with the 5% cutoff ln(0.05) — detects whether a type's "
    "traffic concentrates at an hour at all, where D41/K103's "
    "chi-square sees only deviation from uniform; Fisher 1993)",
)
def events_circadian_rayleigh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rayleigh test per event type: map each timestamp to an angle on
    the 24 h circle, accumulate the resultant vector, report R (0 =
    uniform, 1 = single instant), the circular mean hour, z = nR², and
    the 5% concentration verdict (z > -ln 0.05).

    Scale shape: one corpus pass collapsing into |types| rows of
    quantized cos/sin sums (map-side combine does the work); everything
    downstream is column math on the bounded result. cos/sin/atan2 are
    engine-identical IEEE doubles."""
    import math

    e = load(spark, sf_dir, "events")
    theta = (
        F.lit(2 * math.pi)
        * (
            F.hour("ts") * 3600.0
            + F.minute("ts") * 60.0
            + F.second("ts")
        )
        / F.lit(86400.0)
    )
    m = e.select("event_type", theta.alias("theta")).groupBy(
        "event_type"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum(F.cos("theta")).alias("sc"),
        dsum(F.sin("theta")).alias("ss"),
    )
    n, sc, ss = F.col("n"), F.col("sc"), F.col("ss")
    zq = _q6((sc * sc + ss * ss) / n)
    mean_ang = F.atan2(ss, sc)
    two_pi = F.lit(2 * math.pi)
    return m.select(
        "event_type",
        "n",
        _q6(F.sqrt(sc * sc + ss * ss) / n).alias("resultant_r"),
        _q6(
            F.when(mean_ang >= 0, mean_ang * 24.0 / two_pi).otherwise(
                (mean_ang + two_pi) * 24.0 / two_pi
            )
        ).alias("mean_hour"),
        zq.alias("rayleigh_z"),
        F.when(zq > 2.995732, 1).otherwise(0).alias("concentrated"),
    )


# ---------------------------------------------------------------------------
# D67 — Croston intermittent-demand forecast
# ---------------------------------------------------------------------------

_CROSTON_ALPHA = 0.3


@query(
    "part_croston_demand",
    oracle=f"""
    WITH monthly AS (
        SELECT l_partkey, date_trunc('month', l_shipdate) AS m,
               {sql_dsum('l_quantity')} AS z
        FROM lineitem GROUP BY l_partkey, date_trunc('month', l_shipdate)
    ), idx AS (
        SELECT l_partkey, m, z,
               row_number() OVER (PARTITION BY l_partkey ORDER BY m) AS i,
               CAST(date_diff('month',
                    lag(m) OVER (PARTITION BY l_partkey ORDER BY m), m)
                    AS DOUBLE) AS gap,
               COUNT(*) OVER (PARTITION BY l_partkey) AS nd
        FROM monthly
    ), wz AS (
        SELECT l_partkey, nd,
               {sql_dsum(
                   f"CASE WHEN i = 1 THEN power(1.0 - {_CROSTON_ALPHA}, nd - 1) * z "
                   f"ELSE {_CROSTON_ALPHA} * power(1.0 - {_CROSTON_ALPHA}, nd - i) * z END"
               )} AS z_hat,
               {sql_dsum(
                   f"CASE WHEN i = 1 THEN NULL "
                   f"WHEN i = 2 THEN power(1.0 - {_CROSTON_ALPHA}, nd - 2) * gap "
                   f"ELSE {_CROSTON_ALPHA} * power(1.0 - {_CROSTON_ALPHA}, nd - i) * gap END"
               )} AS p_hat
        FROM idx GROUP BY l_partkey, nd
    )
    SELECT l_partkey AS partkey, CAST(nd AS BIGINT) AS n_demand_months,
           {_sql_q6('z_hat')} AS z_hat, {_sql_q6('p_hat')} AS p_hat,
           {_sql_q6('z_hat / p_hat')} AS croston_rate
    FROM wz WHERE nd >= 3 AND p_hat > 0
    """,
    ref="SURVEY §2 D67 [EXT] (Croston 1972 intermittent-demand method: "
    "separate exponential smoothing of demand sizes and inter-demand "
    "intervals, forecast = size/interval — THE spare-parts forecaster "
    "where K72/K76's Holt models assume demand every period; the "
    "recursion unrolled to closed-form alpha(1-alpha)^k weights so "
    "both engines sum the same quantized terms)",
)
def part_croston_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method per part over monthly demand buckets: smoothed
    demand size z_hat, smoothed inter-demand interval p_hat (months),
    and the demand rate z_hat/p_hat. Parts with < 3 demand months are
    excluded (the interval series needs >= 2 gaps).

    Scale shape: one (part, month) agg, then ONE part-partitioned
    window pass (row index + lag gap — bounded by the calendar), then a
    part-keyed agg of closed-form geometric weights. The exponential-
    smoothing recursion is unrolled to alpha(1-alpha)^(n-i) so there is
    no per-part sequential scan anywhere."""
    a = _CROSTON_ALPHA
    li = load(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        "l_partkey", F.date_trunc("month", "l_shipdate").alias("m")
    ).agg(dsum("l_quantity").alias("z"))
    w = Window.partitionBy("l_partkey").orderBy("m")
    idx = monthly.select(
        "l_partkey",
        "z",
        F.row_number().over(w).alias("i"),
        (
            F.months_between(F.col("m"), F.lag("m").over(w))
        ).alias("gap"),
        F.count(F.lit(1))
        .over(Window.partitionBy("l_partkey"))
        .alias("nd"),
    )
    i, nd, z, gap = F.col("i"), F.col("nd"), F.col("z"), F.col("gap")
    wz_term = F.when(i == 1, F.pow(F.lit(1.0 - a), nd - 1) * z).otherwise(
        F.lit(a) * F.pow(F.lit(1.0 - a), nd - i) * z
    )
    wp_term = (
        F.when(i == 1, F.lit(None).cast("double"))
        .when(i == 2, F.pow(F.lit(1.0 - a), nd - 2) * gap)
        .otherwise(F.lit(a) * F.pow(F.lit(1.0 - a), nd - i) * gap)
    )
    wz = idx.groupBy("l_partkey", "nd").agg(
        dsum(wz_term).alias("z_hat"),
        dsum(wp_term).alias("p_hat"),
    )
    return wz.where((nd >= 3) & (F.col("p_hat") > 0)).select(
        F.col("l_partkey").alias("partkey"),
        nd.cast("bigint").alias("n_demand_months"),
        _q6(F.col("z_hat")).alias("z_hat"),
        _q6(F.col("p_hat")).alias("p_hat"),
        _q6(F.col("z_hat") / F.col("p_hat")).alias("croston_rate"),
    )


# ---------------------------------------------------------------------------
# D68 — cross-table freshness audit
# ---------------------------------------------------------------------------

#: (table, temporal column) pairs the freshness audit watches.
_FRESHNESS_COLS = [
    ("orders", "o_orderdate"),
    ("lineitem", "l_shipdate"),
    ("events", "ts"),
]


def _freshness_oracle() -> str:
    branches = []
    for tbl, col in _FRESHNESS_COLS:
        branches.append(f"""
        SELECT '{tbl}.{col}' AS feed, mx.newest,
               CAST(COUNT(*) AS BIGINT) AS total_rows,
               CAST(SUM(CASE WHEN t.{col} >= mx.newest - INTERVAL 30 DAY
                    THEN 1 ELSE 0 END) AS BIGINT) AS rows_last_30d
        FROM {tbl} t CROSS JOIN
             (SELECT MAX({col}) AS newest FROM {tbl}) mx
        GROUP BY mx.newest""")
    per = " UNION ALL ".join(branches)
    return f"""
    WITH per_feed AS ({per}),
    corpus AS (SELECT MAX(newest) AS corpus_asof FROM per_feed)
    SELECT feed, newest, total_rows, rows_last_30d,
           CAST(date_diff('day', newest, corpus_asof) AS BIGINT)
               AS staleness_days
    FROM per_feed CROSS JOIN corpus
    """


@query(
    "dq_freshness_audit",
    oracle=_freshness_oracle(),
    ref="SURVEY §2 D68 [EXT] (feed freshness audit: per temporal column, "
    "newest value, trailing-30-day row volume, and staleness vs the "
    "corpus-wide as-of — the 'did yesterday's load land' check every "
    "warehouse pages on; companion to D55's integrity gate)",
)
def dq_freshness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness report across the schema's temporal feeds: newest
    timestamp per feed, rows in the 30 days before that max (volume
    sanity), and staleness in days against the corpus-wide as-of
    (max of the maxes) — a stale feed shows up as a positive lag.

    Scale shape: per feed, ONE scan with the max riding as a broadcast
    1-row aggregate into a conditional count (no second pass, no eager
    action); the cross-feed as-of is a 3-row agg broadcast back. Output
    is |feeds| rows."""
    per = None
    for tbl, col in _FRESHNESS_COLS:
        t = load(spark, sf_dir, tbl)
        mx = t.agg(F.max(col).alias("newest"))
        f = (
            t.crossJoin(F.broadcast(mx))
            .groupBy("newest")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("total_rows"),
                F.sum(
                    F.when(
                        F.col(col)
                        >= F.col("newest") - F.expr("INTERVAL 30 DAY"),
                        1,
                    ).otherwise(0)
                )
                .cast("bigint")
                .alias("rows_last_30d"),
            )
            .select(
                F.lit(f"{tbl}.{col}").alias("feed"),
                "newest",
                "total_rows",
                "rows_last_30d",
            )
        )
        per = f if per is None else per.unionByName(f)
    # NOT pinned: a pin would halve the 12 collapsed-at-scan branches but
    # costs build-time jobs — this entry's contract (gate-enforced) is
    # that merely constructing the audit runs ZERO jobs; the asof branch
    # re-runs the per-feed aggregates at action time instead
    asof = per.agg(F.max("newest").alias("corpus_asof"))
    return per.crossJoin(F.broadcast(asof)).select(
        "feed",
        "newest",
        "total_rows",
        "rows_last_30d",
        F.datediff(F.col("corpus_asof"), F.col("newest"))
        .cast("bigint")
        .alias("staleness_days"),
    )


# ---------------------------------------------------------------------------
# K130 — Davies-Bouldin cluster-separation index
# ---------------------------------------------------------------------------

@query(
    "llm_cluster_davies_bouldin",
    oracle=f"""
    WITH cents AS (
        SELECT vec_id AS cent_id, embedding AS cent_emb
        FROM embeddings WHERE vec_id < 4
    ), d AS (
        SELECT e.vec_id, c.cent_id,
               {{l2sq_e_c}} AS cd
        FROM embeddings e CROSS JOIN cents c
    ), assign AS (
        SELECT vec_id, cent_id, cd,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cd, cent_id) AS rn
        FROM d
    ), scatter AS (
        SELECT cent_id, CAST(COUNT(*) AS BIGINT) AS n_members,
               {sql_dsum('sqrt(cd)')} AS sum_d
        FROM assign WHERE rn = 1 GROUP BY cent_id
    ), s AS (
        SELECT cent_id, n_members,
               {_sql_q6('sum_d / n_members')} AS scatter
        FROM scatter
    ), cd2 AS (
        SELECT a.cent_id AS i, b.cent_id AS j,
               sqrt({{l2sq_a_b}}) AS dij
        FROM cents a JOIN cents b ON a.cent_id <> b.cent_id
    ), ratios AS (
        SELECT cd2.i AS cent_id,
               MAX({_sql_q6('(si.scatter + sj.scatter) / cd2.dij')})
                   AS db_component
        FROM cd2
        JOIN s si ON si.cent_id = cd2.i
        JOIN s sj ON sj.cent_id = cd2.j
        GROUP BY cd2.i
    )
    SELECT s.cent_id, s.n_members, s.scatter, ratios.db_component
    FROM s JOIN ratios ON ratios.cent_id = s.cent_id
    """.format(
        l2sq_e_c="""
    list_reduce(
        list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(range(1, len(e.embedding) + 1),
                i -> (CAST(e.embedding[i] AS DOUBLE)
                      - CAST(c.cent_emb[i] AS DOUBLE))
                   * (CAST(e.embedding[i] AS DOUBLE)
                      - CAST(c.cent_emb[i] AS DOUBLE)))),
        (acc, p) -> acc + p)""",
        l2sq_a_b="""
    list_reduce(
        list_prepend(CAST(0.0 AS DOUBLE),
            list_transform(range(1, len(a.cent_emb) + 1),
                i -> (CAST(a.cent_emb[i] AS DOUBLE)
                      - CAST(b.cent_emb[i] AS DOUBLE))
                   * (CAST(a.cent_emb[i] AS DOUBLE)
                      - CAST(b.cent_emb[i] AS DOUBLE)))),
        (acc, p) -> acc + p)""",
    ),
    ref="SURVEY §2 K130 [EXT] (Davies-Bouldin 1979 separation index over "
    "the K19 fixed centroids: per-cluster scatter = mean L2 to own "
    "centroid, DB_i = max_j (s_i+s_j)/d(c_i,c_j) — the worst-neighbor "
    "view of cluster quality where K101's silhouette averages "
    "per-point; low = compact and separated)",
)
def llm_cluster_davies_bouldin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster Davies-Bouldin components over the fixed-centroid
    assignment: member count, scatter (mean L2 to own centroid), and
    DB_i = max over other clusters of (s_i + s_j) / d(c_i, c_j). The
    corpus DB index is the mean of db_component — left per-row so the
    report shows WHICH neighbor pair is the problem.

    Scale shape: same O(n·K) broadcast distance pass as K101 (never
    n²); scatter collapses in one cent_id agg; the pair stage is K²
    rows of closed-form arithmetic. Nothing after the first agg scales
    with the corpus."""
    from ksql_spark.operators import vectors

    e = load(spark, sf_dir, "embeddings")
    cents = e.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cent_id"),
        F.col("embedding").alias("cent_emb"),
    )
    d = e.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "cent_id",
        vectors.l2_sq_dist("embedding", "cent_emb").alias("cd"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cd").asc(), F.col("cent_id")
    )
    assign = d.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") == 1
    )
    from ksql_spark.operators.scale import pin

    # pin the K-row scatter table: si/sj/output branches would each
    # re-run the O(n*K) distance pass (8 parquet scans -> 2)
    s = (
        assign.groupBy("cent_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            dsum(F.sqrt("cd")).alias("sum_d"),
        )
        .select(
            "cent_id",
            "n_members",
            _q6(F.col("sum_d") / F.col("n_members")).alias("scatter"),
        )
        .transform(pin, eager=False)
    )
    a = cents.select(
        F.col("cent_id").alias("i"), F.col("cent_emb").alias("emb_i")
    )
    b = cents.select(
        F.col("cent_id").alias("j"), F.col("cent_emb").alias("emb_j")
    )
    cd2 = (
        a.join(b, F.col("i") != F.col("j"))
        .select(
            "i", "j", F.sqrt(vectors.l2_sq_dist("emb_i", "emb_j")).alias("dij")
        )
    )
    si = s.select(F.col("cent_id").alias("i"), F.col("scatter").alias("s_i"))
    sj = s.select(F.col("cent_id").alias("j"), F.col("scatter").alias("s_j"))
    ratios = (
        cd2.join(si, "i")
        .join(sj, "j")
        .groupBy(F.col("i").alias("cent_id"))
        .agg(
            F.max(
                _q6((F.col("s_i") + F.col("s_j")) / F.col("dij"))
            ).alias("db_component")
        )
    )
    return s.join(ratios, "cent_id").select(
        "cent_id", "n_members", "scatter", "db_component"
    )


# ---------------------------------------------------------------------------
# D69 — Spearman rank correlation (price vs order size, per month)
# ---------------------------------------------------------------------------

@query(
    "orders_spearman_corr",
    oracle=f"""
    WITH sized AS (
        SELECT o.o_orderkey, date_trunc('month', o.o_orderdate) AS m,
               o.o_totalprice AS price,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, date_trunc('month', o.o_orderdate),
                 o.o_totalprice
    ), ranked AS (
        SELECT m,
               CAST(rank() OVER (PARTITION BY m ORDER BY price) AS DOUBLE)
               + (CAST(COUNT(*) OVER (PARTITION BY m, price) AS DOUBLE) - 1)
                 / 2.0 AS rx,
               CAST(rank() OVER (PARTITION BY m ORDER BY n_lines) AS DOUBLE)
               + (CAST(COUNT(*) OVER (PARTITION BY m, n_lines) AS DOUBLE) - 1)
                 / 2.0 AS ry
        FROM sized
    ), mo AS (
        SELECT m, CAST(COUNT(*) AS BIGINT) AS n,
               {sql_dsum('rx')} AS sx, {sql_dsum('ry')} AS sy,
               {sql_dsum('rx * rx')} AS sxx, {sql_dsum('rx * ry')} AS sxy,
               {sql_dsum('ry * ry')} AS syy
        FROM ranked GROUP BY m
    )
    SELECT CAST(m AS TIMESTAMP) AS month, n AS n_orders,
           {_sql_q6(
               "(n * sxy - sx * sy)"
               " / NULLIF(sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 0)"
           )} AS spearman_rho
    FROM mo WHERE n >= 3
    """,
    ref="SURVEY §2 D69 [EXT] (Spearman rank correlation: Pearson on "
    "tie-averaged ranks of order value vs line count per month — the "
    "monotone-association complement to agg_corr's linear Pearson, "
    "robust to the heavy-tailed distributions real money columns "
    "have; Spearman 1904)",
)
def orders_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly Spearman rho between order value and order size (line
    count): rank both within the month with average-rank tie handling
    (rank() + (ties-1)/2), then the Pearson moment formula on the
    ranks.

    Scale shape: one orderkey-keyed join+agg builds the per-order
    table; ranking windows partition on the calendar month (bounded
    partition count, each a per-month sort — the honest distributed
    rank shape); moments collapse per month in one keyed agg. The tie
    window (m, price) rides the same month exchange."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    sized = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            "o_orderkey",
            F.date_trunc("month", "o_orderdate").alias("m"),
            F.col("o_totalprice").alias("price"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_lines"))
    )
    wpx = Window.partitionBy("m").orderBy("price")
    wpy = Window.partitionBy("m").orderBy("n_lines")
    tx = Window.partitionBy("m", "price")
    ty = Window.partitionBy("m", "n_lines")
    ranked = sized.select(
        "m",
        (
            F.rank().over(wpx).cast("double")
            + (F.count(F.lit(1)).over(tx).cast("double") - 1) / 2.0
        ).alias("rx"),
        (
            F.rank().over(wpy).cast("double")
            + (F.count(F.lit(1)).over(ty).cast("double") - 1) / 2.0
        ).alias("ry"),
    )
    rx, ry = F.col("rx"), F.col("ry")
    # rank moments (Σr ~ m²/2, Σr² ~ m³/3 per month) overflow dsum's long
    # accumulator once months hold ~10⁵ orders (sf10 probe) — wide form
    mo = ranked.groupBy("m").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum_wide(rx).alias("sx"),
        dsum_wide(ry).alias("sy"),
        dsum_wide(rx * rx).alias("sxx"),
        dsum_wide(rx * ry).alias("sxy"),
        dsum_wide(ry * ry).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    return mo.where(n >= 3).select(
        F.col("m").alias("month"),
        n.alias("n_orders"),
        _q6(
            (n * sxy - sx * sy)
            / F.nullif(
                F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
                F.lit(0.0),
            )
        ).alias("spearman_rho"),
    )


# ---------------------------------------------------------------------------
# D70 — Granger-lite lagged-predictability test
# ---------------------------------------------------------------------------

_GRANGER_X = "view"      # candidate cause
_GRANGER_Y = "purchase"  # effect series


@query(
    "events_granger_lite",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d,
               CAST(SUM(CASE WHEN event_type = '{_GRANGER_Y}' THEN 1 ELSE 0
                    END) AS DOUBLE) AS y,
               CAST(SUM(CASE WHEN event_type = '{_GRANGER_X}' THEN 1 ELSE 0
                    END) AS DOUBLE) AS x
        FROM events WHERE event_type IN ('{_GRANGER_X}', '{_GRANGER_Y}')
        GROUP BY CAST(ts AS DATE)
    ), lagged AS (
        SELECT y, lag(y) OVER (ORDER BY d) AS yl,
               lag(x) OVER (ORDER BY d) AS xl
        FROM daily
    ), obs AS (
        SELECT y, yl, xl FROM lagged WHERE yl IS NOT NULL
    ), m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               {sql_dsum('y')} AS sy, {sql_dsum('yl')} AS syl,
               {sql_dsum('xl')} AS sxl,
               {sql_dsum('y * yl')} AS syyl, {sql_dsum('y * xl')} AS syxl,
               {sql_dsum('yl * yl')} AS sylyl, {sql_dsum('xl * xl')} AS sxlxl,
               {sql_dsum('yl * xl')} AS sylxl,
               {sql_dsum('y * y')} AS syy
        FROM obs
    ), solved AS (
        -- restricted: y ~ a + b*yl ; full: y ~ a + b*yl + c*xl
        -- centered moments
        SELECT n,
               syy - sy * sy / n AS tyy,
               syyl - sy * syl / n AS c_yyl,
               syxl - sy * sxl / n AS c_yxl,
               sylyl - syl * syl / n AS c_ylyl,
               sxlxl - sxl * sxl / n AS c_xlxl,
               sylxl - syl * sxl / n AS c_ylxl
        FROM m
    ), fits AS (
        SELECT n, tyy,
               tyy - c_yyl * c_yyl / NULLIF(c_ylyl, 0) AS rss_restricted,
               tyy - (c_yyl * c_xlxl - c_yxl * c_ylxl) * c_yyl
                     / NULLIF(c_ylyl * c_xlxl - c_ylxl * c_ylxl, 0)
                   - (c_yxl * c_ylyl - c_yyl * c_ylxl) * c_yxl
                     / NULLIF(c_ylyl * c_xlxl - c_ylxl * c_ylxl, 0)
                   AS rss_full
        FROM solved
    )
    SELECT n AS n_days,
           {_sql_q6('rss_restricted')} AS rss_restricted,
           {_sql_q6('rss_full')} AS rss_full,
           {_sql_q6(
               "(rss_restricted - rss_full) / NULLIF(rss_full / (n - 3), 0)"
           )} AS f_stat,
           CASE WHEN {_sql_q6(
               "(rss_restricted - rss_full) / NULLIF(rss_full / (n - 3), 0)"
           )} > 3.92 THEN 1 ELSE 0 END AS x_helps
    FROM fits
    """,
    ref="SURVEY §2 D70 [EXT] (Granger-lite predictability: does "
    "yesterday's view count improve today's purchase forecast beyond "
    "yesterday's purchases — restricted vs full lag-1 OLS via "
    "closed-form 2x2 normal equations on centered moments, F(1, n-3) "
    "vs ~3.92; Granger 1969 at lag 1)",
)
def events_granger_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 Granger-style test on the daily series: restricted model
    y_t ~ y_{t-1} vs full model y_t ~ y_{t-1} + x_{t-1} (x = views,
    y = purchases), F statistic from the RSS drop. One row out.

    Scale shape: the corpus collapses to one row per day in a single
    agg; the lag window runs over the calendar-bounded daily table;
    the two regressions are closed-form arithmetic on ONE set of
    quantized moments (no iterative solver, no second pass)."""
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_GRANGER_X, _GRANGER_Y)
    )
    daily = e.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(F.when(F.col("event_type") == _GRANGER_Y, 1).otherwise(0))
        .cast("double")
        .alias("y"),
        F.sum(F.when(F.col("event_type") == _GRANGER_X, 1).otherwise(0))
        .cast("double")
        .alias("x"),
    )
    w = Window.orderBy("d")
    lagged = daily.select(
        "y",
        F.lag("y").over(w).alias("yl"),
        F.lag("x").over(w).alias("xl"),
    ).where(F.col("yl").isNotNull())
    y, yl, xl = F.col("y"), F.col("yl"), F.col("xl")
    m = lagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum(y).alias("sy"),
        dsum(yl).alias("syl"),
        dsum(xl).alias("sxl"),
        dsum(y * yl).alias("syyl"),
        dsum(y * xl).alias("syxl"),
        dsum(yl * yl).alias("sylyl"),
        dsum(xl * xl).alias("sxlxl"),
        dsum(yl * xl).alias("sylxl"),
        dsum(y * y).alias("syy"),
    )
    n = F.col("n")
    tyy = F.col("syy") - F.col("sy") * F.col("sy") / n
    c_yyl = F.col("syyl") - F.col("sy") * F.col("syl") / n
    c_yxl = F.col("syxl") - F.col("sy") * F.col("sxl") / n
    c_ylyl = F.col("sylyl") - F.col("syl") * F.col("syl") / n
    c_xlxl = F.col("sxlxl") - F.col("sxl") * F.col("sxl") / n
    c_ylxl = F.col("sylxl") - F.col("syl") * F.col("sxl") / n
    det = c_ylyl * c_xlxl - c_ylxl * c_ylxl
    rss_r = tyy - c_yyl * c_yyl / F.nullif(c_ylyl, F.lit(0.0))
    rss_f = (
        tyy
        - (c_yyl * c_xlxl - c_yxl * c_ylxl) * c_yyl / F.nullif(det, F.lit(0.0))
        - (c_yxl * c_ylyl - c_yyl * c_ylxl) * c_yxl / F.nullif(det, F.lit(0.0))
    )
    fq = _q6((rss_r - rss_f) / F.nullif(rss_f / (n - 3), F.lit(0.0)))
    return m.select(
        n.alias("n_days"),
        _q6(rss_r).alias("rss_restricted"),
        _q6(rss_f).alias("rss_full"),
        fq.alias("f_stat"),
        F.when(fq > 3.92, 1).otherwise(0).alias("x_helps"),
    )


# ---------------------------------------------------------------------------
# D71 — Wald-Wolfowitz runs test (randomness of daily revenue)
# ---------------------------------------------------------------------------

@query(
    "orders_runs_test",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               {sql_dsum('o_totalprice')} AS rev
        FROM orders GROUP BY CAST(o_orderdate AS DATE)
    ), med AS (
        SELECT quantile_cont(rev, 0.5) AS m FROM daily
    ), signed AS (
        SELECT d, CASE WHEN rev > m THEN 1 ELSE 0 END AS above
        FROM daily CROSS JOIN med WHERE rev <> m
    ), flagged AS (
        SELECT above,
               CASE WHEN lag(above) OVER (ORDER BY d) IS NULL
                    OR lag(above) OVER (ORDER BY d) <> above
                    THEN 1 ELSE 0 END AS new_run
        FROM signed
    ), m2 AS (
        SELECT CAST(SUM(new_run) AS BIGINT) AS runs,
               CAST(SUM(above) AS BIGINT) AS n1,
               CAST(SUM(1 - above) AS BIGINT) AS n2
        FROM flagged
    )
    SELECT runs, n1, n2,
           {_sql_q6("1.0 + 2.0 * n1 * n2 / (n1 + n2)")} AS expected_runs,
           {_sql_q6(
               "(runs - (1.0 + 2.0 * n1 * n2 / (n1 + n2)))"
               " / NULLIF(sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)"
               " / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))), 0)"
           )} AS z_stat
    FROM m2
    """,
    ref="SURVEY §2 D71 [EXT] (Wald-Wolfowitz runs test: daily revenue "
    "dichotomized at the median, observed vs expected run count, "
    "normal z — |z| > 1.96 rejects serial randomness (clustered "
    "hot/cold streaks); the independence screen D62's trend test "
    "assumes away; Wald & Wolfowitz 1940)",
)
def orders_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs test on the daily revenue series: sign each day against the
    median (median days dropped, the standard convention), count
    maximal same-sign runs, compare with the exact null mean
    1 + 2·n1·n2/n and variance — one z-statistic row.

    Scale shape: the corpus collapses to the daily table in one agg;
    the median is a 1-row broadcast; the run-boundary lag window runs
    over calendar-bounded days (the documented orders_monthly_growth
    posture); final agg is one row."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        dsum("o_totalprice").alias("rev")
    )
    med = daily.agg(
        F.percentile("rev", F.lit(0.5)).alias("m")
    )
    signed = (
        daily.crossJoin(F.broadcast(med))
        .where(F.col("rev") != F.col("m"))
        .select(
            "d",
            F.when(F.col("rev") > F.col("m"), 1).otherwise(0).alias("above"),
        )
    )
    w = Window.orderBy("d")
    flagged = signed.select(
        "above",
        F.when(
            F.lag("above").over(w).isNull()
            | (F.lag("above").over(w) != F.col("above")),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    m2 = flagged.agg(
        F.sum("new_run").cast("bigint").alias("runs"),
        F.sum("above").cast("bigint").alias("n1"),
        F.sum(1 - F.col("above")).cast("bigint").alias("n2"),
    )
    runs, n1, n2 = F.col("runs"), F.col("n1"), F.col("n2")
    exp_runs = 1.0 + 2.0 * n1 * n2 / (n1 + n2)
    var = (
        2.0
        * n1
        * n2
        * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))
    )
    return m2.select(
        "runs",
        "n1",
        "n2",
        _q6(exp_runs).alias("expected_runs"),
        _q6(
            (runs - exp_runs) / F.nullif(F.sqrt(var), F.lit(0.0))
        ).alias("z_stat"),
    )


# ---------------------------------------------------------------------------
# D72 — Herfindahl-Hirschman concentration index
# ---------------------------------------------------------------------------

@query(
    "supplier_herfindahl",
    oracle=f"""
    WITH rev AS (
        SELECT s.s_nationkey AS nationkey, l.l_suppkey,
               {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS r
        FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
        GROUP BY s.s_nationkey, l.l_suppkey
    ), tot AS (
        SELECT nationkey, {sql_dsum('r')} AS t,
               CAST(COUNT(*) AS BIGINT) AS n_suppliers
        FROM rev GROUP BY nationkey
    )
    SELECT rev.nationkey, MAX(tot.n_suppliers) AS n_suppliers,
           {sql_dsum('rev.r')} AS market_revenue,
           {_sql_q6(
               f"({sql_dsum('(rev.r / tot.t) * (rev.r / tot.t) * 10000.0')})"
           )} AS hhi,
           CASE WHEN {_sql_q6(
               f"({sql_dsum('(rev.r / tot.t) * (rev.r / tot.t) * 10000.0')})"
           )} > 2500.0 THEN 'concentrated'
           WHEN {_sql_q6(
               f"({sql_dsum('(rev.r / tot.t) * (rev.r / tot.t) * 10000.0')})"
           )} > 1500.0 THEN 'moderate' ELSE 'competitive' END AS verdict
    FROM rev JOIN tot ON tot.nationkey = rev.nationkey
    GROUP BY rev.nationkey
    """,
    ref="SURVEY §2 D72 [EXT] (Herfindahl-Hirschman index: sum of squared "
    "supplier revenue shares (x10000) per nation market with the "
    "DOJ 1500/2500 bands — the antitrust/risk concentration measure "
    "where D28's Gini reads the whole curve; shares against a "
    "nation-keyed broadcastable total)",
)
def supplier_herfindahl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HHI per nation market: squared supplier revenue shares summed and
    scaled to the conventional 0-10000 range, with the DOJ verdict
    bands (>2500 concentrated, >1500 moderate).

    Scale shape: the supplier join is un-hinted (supplier is
    SF-proportional — AQE broadcasts while it fits, shuffles on suppkey
    beyond that); one supplier-keyed revenue agg off the fact scan, one
    nation-keyed totals agg, share math rides a nation-keyed join
    (bounded by |suppliers|), final agg is |nations| rows. Shares are
    quantized per term (dsum) so the squared sum is order-exact."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    rev_expr = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    from ksql_spark.operators.scale import pin

    # pin the supplier-bounded revenue table: tot and the share join would
    # each re-run the fact join+agg (4 parquet scans -> 2)
    rev = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("s_nationkey").alias("nationkey"), "l_suppkey")
        .agg(dsum(rev_expr).alias("r"))
        .transform(pin, eager=False)
    )
    tot = rev.groupBy("nationkey").agg(
        dsum("r").alias("t"),
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
    )
    share = F.col("r") / F.col("t")
    hhi = _q6(dsum(share * share * 10000.0))
    return (
        rev.join(tot, "nationkey")
        .groupBy("nationkey")
        .agg(
            F.max("n_suppliers").alias("n_suppliers"),
            dsum("r").alias("market_revenue"),
            hhi.alias("hhi"),
        )
        .select(
            "nationkey",
            "n_suppliers",
            "market_revenue",
            "hhi",
            F.when(F.col("hhi") > 2500.0, "concentrated")
            .when(F.col("hhi") > 1500.0, "moderate")
            .otherwise("competitive")
            .alias("verdict"),
        )
    )


# ---------------------------------------------------------------------------
# D73 — CUPED variance reduction
# ---------------------------------------------------------------------------

_CUPED_CUT = "2024-01-16"


@query(
    "events_cuped_adjusted",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id, CAST(user_id % 2 AS INT) AS arm,
               {sql_dsum(
                   f"CASE WHEN ts < TIMESTAMP '{_CUPED_CUT} 00:00:00'"
                   " THEN value END"
               )} AS pre_sum,
               CAST(SUM(CASE WHEN ts < TIMESTAMP '{_CUPED_CUT} 00:00:00'
                    THEN 1 ELSE 0 END) AS BIGINT) AS pre_n,
               {sql_dsum(
                   f"CASE WHEN ts >= TIMESTAMP '{_CUPED_CUT} 00:00:00'"
                   " THEN value END"
               )} AS post_sum,
               CAST(SUM(CASE WHEN ts >= TIMESTAMP '{_CUPED_CUT} 00:00:00'
                    THEN 1 ELSE 0 END) AS BIGINT) AS post_n
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    ), xy AS (
        SELECT arm,
               {_sql_q6('pre_sum / pre_n')} AS x,
               {_sql_q6('post_sum / post_n')} AS y
        FROM per_user WHERE pre_n > 0 AND post_n > 0
    ), gm AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               {sql_dsum('x')} AS sx, {sql_dsum('y')} AS sy,
               {sql_dsum('x * x')} AS sxx, {sql_dsum('x * y')} AS sxy
        FROM xy
    ), theta AS (
        SELECT n, sx / n AS xbar,
               (sxy - sx * sy / n) / NULLIF(sxx - sx * sx / n, 0) AS th
        FROM gm
    ), adj AS (
        SELECT xy.arm, xy.y,
               xy.y - theta.th * (xy.x - theta.xbar) AS y_adj
        FROM xy CROSS JOIN theta
    ), m AS (
        SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
               {sql_dsum('y')} AS sy, {sql_dsum('y * y')} AS syy,
               {sql_dsum('y_adj')} AS sa, {sql_dsum('y_adj * y_adj')} AS saa
        FROM adj GROUP BY arm
    )
    SELECT arm, n_users,
           {_sql_q6('sy / n_users')} AS mean_y,
           {_sql_q6('sa / n_users')} AS mean_y_adj,
           {_sql_q6('(syy - sy * sy / n_users) / (n_users - 1)')} AS var_y,
           {_sql_q6('(saa - sa * sa / n_users) / (n_users - 1)')} AS var_y_adj,
           {_sql_q6(
               "1.0 - ((saa - sa * sa / n_users) / (n_users - 1))"
               " / NULLIF((syy - sy * sy / n_users) / (n_users - 1), 0)"
           )} AS variance_reduction
    FROM m
    """,
    ref="SURVEY §2 D73 [EXT] (CUPED variance reduction, Deng et al. "
    "WSDM 2013: adjust each user's experiment-period metric by theta x "
    "(pre-period covariate - mean), theta = cov/var fit on the pooled "
    "population — the variance-shrinking pre-processing every mature "
    "A/B platform runs before D38's test; reports per-arm means, "
    "variances, and the realized reduction)",
)
def events_cuped_adjusted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED adjustment on per-user purchase values: covariate X = the
    user's pre-period mean, metric Y = experiment-period mean, theta
    fit by pooled OLS, Y_adj = Y - theta (X - X_bar). Per arm: user
    count, raw vs adjusted means (CUPED leaves the treatment-effect
    estimate unbiased) and variances with the realized reduction share.

    Scale shape: ONE user-keyed conditional agg builds (X, Y); theta
    and X_bar are a 1-row broadcast; the adjusted moments close per
    arm. Three aggs, no window, no corpus-sized join."""
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    cut = F.lit(f"{_CUPED_CUT} 00:00:00").cast("timestamp")
    pre = F.when(F.col("ts") < cut, F.col("value"))
    post = F.when(F.col("ts") >= cut, F.col("value"))
    per_user = e.groupBy("user_id").agg(
        dsum(pre).alias("pre_sum"),
        F.sum(F.when(F.col("ts") < cut, 1).otherwise(0))
        .cast("bigint")
        .alias("pre_n"),
        dsum(post).alias("post_sum"),
        F.sum(F.when(F.col("ts") >= cut, 1).otherwise(0))
        .cast("bigint")
        .alias("post_n"),
    )
    xy = per_user.where(
        (F.col("pre_n") > 0) & (F.col("post_n") > 0)
    ).select(
        (F.col("user_id") % 2).cast("int").alias("arm"),
        _q6(F.col("pre_sum") / F.col("pre_n")).alias("x"),
        _q6(F.col("post_sum") / F.col("post_n")).alias("y"),
    )
    gm = xy.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum("x").alias("sx"),
        dsum("y").alias("sy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n")
    theta = gm.select(
        (F.col("sx") / n).alias("xbar"),
        (
            (F.col("sxy") - F.col("sx") * F.col("sy") / n)
            / F.nullif(F.col("sxx") - F.col("sx") * F.col("sx") / n, F.lit(0.0))
        ).alias("th"),
    )
    adj = xy.crossJoin(F.broadcast(theta)).select(
        "arm",
        "y",
        (F.col("y") - F.col("th") * (F.col("x") - F.col("xbar"))).alias(
            "y_adj"
        ),
    )
    m = adj.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        dsum("y").alias("sy"),
        dsum(F.col("y") * F.col("y")).alias("syy"),
        dsum("y_adj").alias("sa"),
        dsum(F.col("y_adj") * F.col("y_adj")).alias("saa"),
    )
    nu = F.col("n_users")
    var_y = (F.col("syy") - F.col("sy") * F.col("sy") / nu) / (nu - 1)
    var_a = (F.col("saa") - F.col("sa") * F.col("sa") / nu) / (nu - 1)
    return m.select(
        "arm",
        "n_users",
        _q6(F.col("sy") / nu).alias("mean_y"),
        _q6(F.col("sa") / nu).alias("mean_y_adj"),
        _q6(var_y).alias("var_y"),
        _q6(var_a).alias("var_y_adj"),
        _q6(1.0 - var_a / F.nullif(var_y, F.lit(0.0))).alias(
            "variance_reduction"
        ),
    )


# ---------------------------------------------------------------------------
# D74 — SPRT sequential A/B monitor
# ---------------------------------------------------------------------------

_SPRT_LIFT = 1.2     # H1: treatment converts at 1.2x the control rate
_SPRT_LN_A = 2.9444389791664403   # ln((1-beta)/alpha) = ln(0.95/0.05)
_SPRT_LN_B = -2.9444389791664403  # ln(beta/(1-alpha)) = ln(0.05/0.95)


@query(
    "events_sprt_ab",
    oracle=f"""
    WITH convs AS (
        SELECT CAST(ts AS DATE) AS d, CAST(user_id % 2 AS INT) AS arm,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
        FROM events
    ), p0x AS (
        SELECT CAST(SUM(conv) AS DOUBLE) / COUNT(*) AS p0
        FROM convs WHERE arm = 0
    ), daily AS (
        SELECT d, CAST(COUNT(*) AS BIGINT) AS n_t,
               CAST(SUM(conv) AS BIGINT) AS k_t
        FROM convs WHERE arm = 1 GROUP BY d
    ), cum AS (
        SELECT d,
               SUM(n_t) OVER (ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n,
               SUM(k_t) OVER (ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS k
        FROM daily
    ), llrs AS (
        -- NULLIF guards (ADVICE r9): p0 = 0 (no control conversions) or
        -- p0 = 1 (all conversions) must yield NULL llr -> 'continue',
        -- never a NaN that aborts the quantizer's cast
        SELECT d, n, k,
               {_sql_q6(
                   f"k * ln(least(p0 * {_SPRT_LIFT}, 0.999999)"
                   " / NULLIF(p0, 0))"
                   f" + (n - k) * ln((1.0 - least(p0 * {_SPRT_LIFT},"
                   " 0.999999)) / NULLIF(1.0 - p0, 0))"
               )} AS llr
        FROM cum CROSS JOIN p0x
    )
    SELECT d AS day, CAST(n AS BIGINT) AS n_exposed,
           CAST(k AS BIGINT) AS n_converted, llr,
           CASE WHEN llr >= {_SPRT_LN_A} THEN 'accept H1'
                WHEN llr <= {_SPRT_LN_B} THEN 'accept H0'
                ELSE 'continue' END AS decision
    FROM llrs
    """,
    ref="SURVEY §2 D74 [EXT] (Wald SPRT sequential monitor: cumulative "
    "Bernoulli log-likelihood ratio of the treatment arm's conversions "
    "under H1 = 1.2x the control rate vs H0, against the "
    "ln(0.95/0.05) boundaries — shows per day when a sequential test "
    "would have stopped, where D38/K83 are fixed-horizon; Wald 1945)",
)
def events_sprt_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential probability ratio test ledger: per day, the treatment
    arm's cumulative exposures/conversions and the running LLR with the
    classic (alpha = beta = 0.05) decision boundaries. The control
    arm's overall conversion rate anchors H0; H1 = 1.2x that rate
    (capped below 1).

    Scale shape: the corpus collapses to per-day counts in one agg
    (control rate is a 1-row broadcast); the cumulative window runs
    over calendar-bounded days; one quantized LLR expression per day.
    The exact shape a streaming experiment monitor materializes."""
    e = load(spark, sf_dir, "events")
    convs = e.select(
        F.to_date("ts").alias("d"),
        (F.col("user_id") % 2).cast("int").alias("arm"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "conv"
        ),
    )
    p0x = convs.where(F.col("arm") == 0).agg(
        (F.sum("conv").cast("double") / F.count(F.lit(1))).alias("p0")
    )
    daily = (
        convs.where(F.col("arm") == 1)
        .groupBy("d")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_t"),
            F.sum("conv").cast("bigint").alias("k_t"),
        )
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.select(
        "d",
        F.sum("n_t").over(w).alias("n"),
        F.sum("k_t").over(w).alias("k"),
    )
    p0 = F.col("p0")
    p1 = F.least(p0 * _SPRT_LIFT, F.lit(0.999999))
    # try_divide guards (ADVICE r9): a degenerate control arm (p0 = 0 or
    # p0 = 1) makes the likelihood ratio 0/0 — house ANSI rule: NULL llr
    # (decision 'continue'), never a NaN aborting _q6's long cast
    llr = _q6(
        F.col("k") * F.log(F.try_divide(p1, F.nullif(p0, F.lit(0.0))))
        + (F.col("n") - F.col("k"))
        * F.log(F.try_divide(1.0 - p1, F.nullif(1.0 - p0, F.lit(0.0))))
    )
    out = cum.crossJoin(F.broadcast(p0x)).select(
        F.col("d").alias("day"),
        F.col("n").cast("bigint").alias("n_exposed"),
        F.col("k").cast("bigint").alias("n_converted"),
        llr.alias("llr"),
    )
    return out.select(
        "day",
        "n_exposed",
        "n_converted",
        "llr",
        F.when(F.col("llr") >= _SPRT_LN_A, "accept H1")
        .when(F.col("llr") <= _SPRT_LN_B, "accept H0")
        .otherwise("continue")
        .alias("decision"),
    )


# ---------------------------------------------------------------------------
# K131 — binned two-sample KS between each source and the rest
# ---------------------------------------------------------------------------

from ksql_spark.queries.curation import SQL_QUALITY as _SQL_QUALITY

_KS_BINS = 1000


@query(
    "llm_quality_ks_sources",
    oracle=f"""
    WITH scored AS (
        SELECT source,
               CAST(least(floor(({{q}}) * {_KS_BINS}),
                          {_KS_BINS - 1}) AS BIGINT) AS bin
        FROM documents
    ), per AS (
        SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS c
        FROM scored GROUP BY source, bin
    ), totals AS (
        SELECT source, CAST(SUM(c) AS BIGINT) AS ns FROM per GROUP BY source
    ), grand AS (
        SELECT CAST(SUM(c) AS BIGINT) AS ng,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
        FROM per
    ), spine AS (
        SELECT t.source, gs.bin
        FROM totals t CROSS JOIN
             (SELECT UNNEST(range(0, {_KS_BINS})) AS bin) gs
    ), binc AS (
        SELECT spine.source, spine.bin, COALESCE(per.c, 0) AS c
        FROM spine LEFT JOIN per
          ON per.source = spine.source AND per.bin = spine.bin
    ), allbin AS (
        SELECT bin, CAST(SUM(c) AS BIGINT) AS ca FROM binc GROUP BY bin
    ), cums AS (
        SELECT binc.source, binc.bin,
               SUM(binc.c) OVER (PARTITION BY binc.source ORDER BY binc.bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs,
               SUM(allbin.ca) OVER (PARTITION BY binc.source ORDER BY binc.bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cg
        FROM binc JOIN allbin ON allbin.bin = binc.bin
    ), dstat AS (
        -- NULLIF guard (ADVICE r9): a single-source corpus has an empty
        -- complement (ng - ns = 0) -> NULL ks_d / d_crit / shifted 0,
        -- never a 0/0 NaN aborting the quantizer's cast
        SELECT cums.source,
               MAX({_sql_q6(
                   "abs(cs * 1.0 / ns"
                   " - (cg - cs) * 1.0 / NULLIF(ng - ns, 0))"
               )}) AS ks_d
        FROM cums
        JOIN totals ON totals.source = cums.source
        CROSS JOIN grand
        GROUP BY cums.source
    )
    SELECT dstat.source, totals.ns AS n_docs, dstat.ks_d,
           {_sql_q6(
               "1.358 * sqrt((totals.ns + (grand.ng - totals.ns)) * 1.0"
               " / NULLIF(totals.ns * (grand.ng - totals.ns), 0))"
           )} AS d_crit_5pct,
           CASE WHEN dstat.ks_d > {_sql_q6(
               "1.358 * sqrt((totals.ns + (grand.ng - totals.ns)) * 1.0"
               " / NULLIF(totals.ns * (grand.ng - totals.ns), 0))"
           )} THEN 1 ELSE 0 END AS shifted
    FROM dstat JOIN totals ON totals.source = dstat.source
    CROSS JOIN grand
    """.format(q=_SQL_QUALITY),
    ref="SURVEY §2 K131 [EXT] (binned two-sample Kolmogorov-Smirnov: "
    "each source's quality-score distribution vs the rest of the "
    "corpus over a fixed 1000-bin grid, D = max ECDF gap vs the 1.358 "
    "x sqrt((n+m)/nm) 5% critical value — the distribution-shift gate "
    "that catches what K90's PSI bins coarsely; the binning IS the "
    "spec, so both engines compute it exactly)",
)
def llm_quality_ks_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per source: binned two-sample KS D between the source's quality
    scores and the complement corpus, with the 5% critical value and a
    shifted flag. Scores land on a fixed 1000-bin grid (binning is part
    of the operator's spec — D is exact given the grid, and the grid is
    what makes the ECDF distributed-friendly).

    Scale shape: corpus collapses to (source, bin) counts in one agg;
    the spine is |sources| x 1000 rows; cumulative ECDFs ride
    source-partitioned windows over the bounded grid; complement
    counts come from the bin totals, not a self-join. Nothing after
    the first agg scales with the corpus."""
    from ksql_spark.operators import text

    d = load(spark, sf_dir, "documents")
    scored = d.select(
        "source",
        F.least(
            F.floor(text.quality_score("text") * _KS_BINS),
            F.lit(_KS_BINS - 1),
        )
        .cast("bigint")
        .alias("bin"),
    )
    from ksql_spark.operators.scale import pin

    # pin the (source, bin) counts: totals/grand/spine/binc would each
    # re-run the corpus scoring scan (8 parquet scans -> 1)
    per = scored.groupBy("source", "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).transform(pin, eager=False)
    totals = per.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("ns")
    )
    grand = per.agg(F.sum("c").cast("bigint").alias("ng"))
    spine = totals.select("source").crossJoin(
        F.broadcast(
            d.sparkSession.range(0, _KS_BINS).select(
                F.col("id").cast("bigint").alias("bin")
            )
        )
    )
    binc = spine.join(per, ["source", "bin"], "left").select(
        "source", "bin", F.coalesce("c", F.lit(0)).alias("c")
    )
    allbin = binc.groupBy("bin").agg(F.sum("c").cast("bigint").alias("ca"))
    w = (
        Window.partitionBy("source")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cums = (
        binc.join(allbin, "bin")
        .select(
            "source",
            "bin",
            F.sum("c").over(w).alias("cs"),
            F.sum("ca").over(w).alias("cg"),
        )
    )
    # try_divide guards (ADVICE r9): a single-source corpus has an empty
    # complement (ng - ns = 0) — NULL ks_d / d_crit and shifted = 0 in
    # both engines, never a 0/0 NaN aborting _q6's long cast
    dstat = (
        cums.join(totals, "source")
        .crossJoin(F.broadcast(grand))
        .groupBy("source")
        .agg(
            F.max(
                _q6(
                    F.abs(
                        F.col("cs") * 1.0 / F.col("ns")
                        - F.try_divide(
                            (F.col("cg") - F.col("cs")) * 1.0,
                            (F.col("ng") - F.col("ns")).cast("double"),
                        )
                    )
                )
            ).alias("ks_d")
        )
    )
    ns, ng = F.col("ns"), F.col("ng")
    d_crit = _q6(
        1.358
        * F.sqrt(
            F.try_divide(
                (ns + (ng - ns)) * 1.0, (ns * (ng - ns)).cast("double")
            )
        )
    )
    return (
        dstat.join(totals, "source")
        .crossJoin(F.broadcast(grand))
        .select(
            "source",
            ns.alias("n_docs"),
            "ks_d",
            d_crit.alias("d_crit_5pct"),
            F.when(F.col("ks_d") > d_crit, 1).otherwise(0).alias("shifted"),
        )
    )


# ---------------------------------------------------------------------------
# K132 — thumbnail intensity histogram through the real byte pipeline
# ---------------------------------------------------------------------------

_HIST_BINS_SQL = ",\n           ".join(
    f"""CAST(list_sum(list_transform(vals, v ->
               CASE WHEN v // 32 = {b} THEN 1 ELSE 0 END)) AS INT)
               AS bin_{b}"""
    for b in range(8)
)


@query(
    "llm_multimodal_histogram",
    oracle=f"""
    WITH p AS (
        SELECT doc_id,
               16 + n_chars % 48 AS w,
               16 + (n_chars * 7) % 48 AS h
        FROM documents
    ), g AS (
        SELECT doc_id,
               flatten(flatten(list_transform(range(0, 8), yt ->
                   list_transform(range(0, 8), xt ->
                       list_transform(range(0, 3), c ->
                           (((xt * w) // 8) * 3 + ((yt * h) // 8) * 7 + c)
                           % 256))))) AS vals
        FROM p
    )
    SELECT doc_id,
           CAST(trunc(list_sum(vals) / 192.0 * 1000000 + 0.5) AS BIGINT)
               / 1000000.0 AS mean_intensity,
           CAST(list_indexof(
               list_transform(range(0, 8), b ->
                   list_sum(list_transform(vals, v ->
                       CASE WHEN v // 32 = b THEN 1 ELSE 0 END))),
               list_max(list_transform(range(0, 8), b ->
                   list_sum(list_transform(vals, v ->
                       CASE WHEN v // 32 = b THEN 1 ELSE 0 END))))
           ) - 1 AS INT) AS dominant_bin,
           {_HIST_BINS_SQL}
    FROM g
    """,
    ref="SURVEY §2 K132 [EXT] (thumbnail intensity histogram: the K5/K122 "
    "oracle-exact byte round-trip (PPM encode -> header parse -> 8x8 "
    "nearest resize) -> 8-bin intensity histogram + quantized mean + "
    "dominant bin — the standard cheap image feature for near-dup "
    "blocking and brightness/quality screens; every count is a closed "
    "integer function of n_chars, so the oracle states all 8 bins)",
)
def llm_multimodal_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-bin intensity histogram per synthesized image, through the REAL
    decode pipeline (genuine PPM bytes, header parse, nearest resample
    to the 8x8 RGB thumbnail), with quantized mean intensity and the
    dominant bin (ties to the lowest index).

    Scale shape: one narrow Arrow-batched mapInPandas pass, no shuffle;
    downstream blocking groups on (dominant_bin) or the bin vector — a
    digest-sized exchange. Compressed codecs remain the documented
    NotImplementedError boundary (operators/multimodal.py)."""
    from ksql_spark.operators import multimodal

    return multimodal.synth_ppm_histogram(load(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# D75 — sample-ratio-mismatch screen with Benjamini-Hochberg correction
# ---------------------------------------------------------------------------

#: Abramowitz & Stegun 7.1.26 constants for the normal CDF tail. Neither
#: engine ships erf, so BOTH spell the identical polynomial — every literal
#: is CAST to DOUBLE on the DuckDB side (bare decimals parse as DECIMAL and
#: would run exact arithmetic where Spark runs IEEE).
_AS_B = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)
_AS_P = 0.2316419
_FDR_Q = 0.10


def _phi_tail_sql(z: str) -> str:
    """Upper-tail P(Z > z) for z >= 0, A&S 7.1.26 (|eps| < 7.5e-8)."""
    t = f"(1.0 / (1.0 + CAST({_AS_P} AS DOUBLE) * ({z})))"
    poly = " + ".join(
        f"CAST({b} AS DOUBLE) * " + " * ".join([t] * (i + 1))
        for i, b in enumerate(_AS_B)
    )
    return (
        f"(exp(-(({z}) * ({z})) / 2.0)"
        f" / sqrt(2.0 * pi()) * ({poly}))"
    )


@query(
    "events_srm_fdr",
    oracle=f"""
    WITH counts AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(user_id % 2) AS BIGINT) AS n_treat
        FROM events GROUP BY event_type
    ), zs AS (
        SELECT event_type, n, n_treat,
               {_sql_q6(
                   "abs(n_treat - n / 2.0) / sqrt(n / 4.0)"
               )} AS z_abs
        FROM counts
    ), ps AS (
        SELECT event_type, n, n_treat, z_abs,
               {_sql_q6(f"2.0 * {_phi_tail_sql('z_abs')}")} AS p_value
        FROM zs
    ), ranked AS (
        SELECT *, row_number() OVER (ORDER BY p_value, event_type) AS rk,
               CAST(COUNT(*) OVER () AS BIGINT) AS m
        FROM ps
    ), kmax AS (
        SELECT COALESCE(MAX(CASE WHEN p_value <= rk * {_FDR_Q} / m
                    THEN rk END), 0) AS k
        FROM ranked
    )
    SELECT event_type, n, n_treat, z_abs, p_value,
           CAST(rk AS BIGINT) AS p_rank,
           CASE WHEN rk <= k THEN 1 ELSE 0 END AS srm_flag_bh
    FROM ranked CROSS JOIN kmax
    """,
    ref="SURVEY §2 D75 [EXT] (sample-ratio-mismatch screen: per event "
    "type, |z| for 'treatment share = 1/2', two-sided p via the "
    "A&S 7.1.26 normal-CDF polynomial (no erf in either engine — both "
    "spell the identical IEEE chain), then Benjamini-Hochberg step-up "
    "at q=0.1 across the type family — THE assignment-integrity check "
    "run before trusting any of D38/D73/D74's results; an SRM fires "
    "before the experiment readout does)",
)
def events_srm_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch audit with multiple-testing control: for
    every event type, test whether the odd-user (treatment) share of
    events is the designed 1/2, convert |z| to a two-sided p with the
    Abramowitz-Stegun normal-tail polynomial, and flag types that
    survive Benjamini-Hochberg at q = 0.1.

    Scale shape: the corpus collapses to |types| rows in one
    map-side-combined agg; ranking, the step-up K, and the flags all
    live on that bounded table (one tiny window + a 1-row max). The
    p-value chain is exp/sqrt/polynomial — identical IEEE in both
    engines, quantized before any comparison."""
    e = load(spark, sf_dir, "events")
    counts = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("user_id") % 2).cast("bigint").alias("n_treat"),
    )
    n, nt = F.col("n"), F.col("n_treat")
    z = _q6(F.abs(nt - n / 2.0) / F.sqrt(n / 4.0))
    zs = counts.select("event_type", "n", "n_treat", z.alias("z_abs"))
    za = F.col("z_abs")
    t = 1.0 / (1.0 + F.lit(_AS_P) * za)
    # explicit product chains, not F.pow: Math.pow(t, k) and the oracle's
    # t*t*... can differ in the last ulp — both engines must multiply
    poly = None
    tp = None
    for b in _AS_B:
        tp = t if tp is None else tp * t
        term = F.lit(b) * tp
        poly = term if poly is None else poly + term
    import math

    tail = (
        F.exp(-(za * za) / 2.0) / F.lit(math.sqrt(2 * math.pi)) * poly
    )
    ps = zs.select(
        "event_type", "n", "n_treat", "z_abs",
        _q6(2.0 * tail).alias("p_value"),
    )
    w = Window.orderBy("p_value", "event_type")
    ranked = ps.select(
        "*",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(
            Window.partitionBy()
        ).cast("bigint").alias("m"),
    )
    kmax = ranked.agg(
        F.coalesce(
            F.max(
                F.when(
                    F.col("p_value") <= F.col("rk") * _FDR_Q / F.col("m"),
                    F.col("rk"),
                )
            ),
            F.lit(0),
        ).alias("k")
    )
    return ranked.crossJoin(F.broadcast(kmax)).select(
        "event_type",
        "n",
        "n_treat",
        "z_abs",
        "p_value",
        F.col("rk").cast("bigint").alias("p_rank"),
        F.when(F.col("rk") <= F.col("k"), 1).otherwise(0).alias(
            "srm_flag_bh"
        ),
    )


# ---------------------------------------------------------------------------
# D76 — Hill tail-index estimator (extreme-value heaviness)
# ---------------------------------------------------------------------------

_HILL_K = 100


@query(
    "events_hill_tail_index",
    oracle=f"""
    WITH pos AS (
        SELECT event_type, value FROM events WHERE value > 0
    ), ranked AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value DESC) AS rk
        FROM pos
    ), kth AS (
        SELECT event_type, value AS x_k FROM ranked
        WHERE rk = {_HILL_K + 1}
    ), tops AS (
        SELECT r.event_type,
               CAST(trunc(ln(r.value / k.x_k) * 1000000 + 0.5) AS BIGINT)
                   / 1000000.0 AS lr
        FROM ranked r JOIN kth k ON k.event_type = r.event_type
        WHERE r.rk <= {_HILL_K}
    )
    SELECT event_type,
           CAST({_HILL_K} AS BIGINT) AS k_order_stats,
           {_sql_q6(f"({sql_dsum('lr')}) / {_HILL_K}")} AS hill_xi,
           {_sql_q6(f"{_HILL_K} * 1.0 / ({sql_dsum('lr')})")}
               AS tail_alpha
    FROM tops GROUP BY event_type
    """,
    ref="SURVEY §2 D76 [EXT] (Hill 1975 tail-index estimator: xi = mean "
    "log-excess of the top k=100 order statistics over the (k+1)-th, "
    "alpha = 1/xi — finite-variance iff alpha > 2, the question K36's "
    "skew detector and D41's power-law fit circle around; top-k per "
    "type via a type-partitioned rank window, everything after is "
    "k-bounded)",
)
def events_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator per event type on positive values: xi = (1/k)
    sum ln(X_(i)/X_(k+1)) over the top k = 100 order statistics, and
    the tail exponent alpha = 1/xi (alpha <= 2 means infinite
    variance — winsorize before trusting any mean).

    Scale shape: the only corpus-wide stage is the type-partitioned
    descending rank window (at 100 TB: replace with per-partition
    top-(k+1) + re-rank of the merged k·P candidates — the TakeOrdered
    pattern); everything downstream is k-bounded per type. Log ratios
    quantize per term so the k-sum is order-exact."""
    e = load(spark, sf_dir, "events").where(F.col("value") > 0)
    w = Window.partitionBy("event_type").orderBy(F.col("value").desc())
    ranked = e.select(
        "event_type", "value", F.row_number().over(w).alias("rk")
    )
    kth = ranked.where(F.col("rk") == _HILL_K + 1).select(
        "event_type", F.col("value").alias("x_k")
    )
    tops = (
        ranked.where(F.col("rk") <= _HILL_K)
        .join(kth, "event_type")
        .select(
            "event_type",
            _q6(F.log(F.col("value") / F.col("x_k"))).alias("lr"),
        )
    )
    return tops.groupBy("event_type").agg(
        F.lit(_HILL_K).cast("bigint").alias("k_order_stats"),
        _q6(dsum("lr") / _HILL_K).alias("hill_xi"),
        _q6(F.lit(float(_HILL_K)) / dsum("lr")).alias("tail_alpha"),
    )


# ---------------------------------------------------------------------------
# D77 — value-band Markov steady state (3 unrolled power iterations)
# ---------------------------------------------------------------------------

_MIG_SPLIT = "TIMESTAMP '1998-01-01 00:00:00'"
_MIG_ITERS = 3


def _mig_oracle() -> str:
    from ksql_spark.registry import sql_dsum as sd

    head = f"""
    WITH per AS (
        SELECT o_custkey,
               {sd(f"CASE WHEN o_orderdate < {_MIG_SPLIT}"
                   " THEN o_totalprice END")} AS rev1,
               {sd(f"CASE WHEN o_orderdate >= {_MIG_SPLIT}"
                   " THEN o_totalprice END")} AS rev2
        FROM orders GROUP BY o_custkey
    ), banded AS (
        SELECT CASE WHEN rev1 IS NULL OR rev1 = 0 THEN 0
                    WHEN rev1 < 200000 THEN 1
                    WHEN rev1 < 500000 THEN 2 ELSE 3 END AS b1,
               CASE WHEN rev2 IS NULL OR rev2 = 0 THEN 0
                    WHEN rev2 < 200000 THEN 1
                    WHEN rev2 < 500000 THEN 2 ELSE 3 END AS b2
        FROM per
    ), trans AS (
        SELECT b1, b2, CAST(COUNT(*) AS BIGINT) AS c
        FROM banded GROUP BY b1, b2
    ), rowsum AS (
        SELECT b1, CAST(SUM(c) AS BIGINT) AS rs FROM trans GROUP BY b1
    ), p AS (
        SELECT trans.b1, trans.b2,
               {{q}} AS pij
        FROM trans JOIN rowsum ON rowsum.b1 = trans.b1
    ), v0 AS (
        SELECT UNNEST(range(0, 4)) AS b, CAST(0.25 AS DOUBLE) AS v
    )""".format(q="CAST(trunc(c * 1.0 / rs * 1000000 + 0.5) AS BIGINT)"
                  " / 1000000.0")
    prev = "v0"
    for t in range(1, _MIG_ITERS + 1):
        head += f""",
    v{t} AS (
        SELECT p.b2 AS b,
               {sd(f'{prev}.v * p.pij')} AS v
        FROM {prev} JOIN p ON p.b1 = {prev}.b
        GROUP BY p.b2
    )"""
        prev = f"v{t}"
    return head + f"""
    SELECT b AS band, v AS steady_share FROM v{_MIG_ITERS}
    """


@query(
    "customer_migration_steady_state",
    oracle=_mig_oracle(),
    ref="SURVEY §2 D77 [EXT] (steady-state of the D48 value-migration "
    "chain: the half1->half2 band transition matrix row-normalized "
    "into Markov form, then 3 unrolled power iterations from the "
    "uniform vector — where the customer base settles if the observed "
    "migration dynamics persist; the whole computation after the one "
    "corpus agg lives on a 16-row matrix)",
)
def customer_migration_steady_state(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Project the customer value-band Markov chain forward: bands
    (inactive / <200k / <500k / 500k+) per half, transition
    probabilities row-normalized from the observed counts, then three
    power iterations of v P starting uniform. Output: the projected
    band shares.

    Scale shape: ONE orders scan into a per-customer conditional agg;
    the transition matrix is 16 rows; each iteration is a join+agg on
    that bounded table (loop over plans, the graph_pagerank
    discipline). Probabilities and iteration sums quantize so three
    chained matrix products stay bit-identical cross-engine."""
    o = load(spark, sf_dir, "orders")
    split = F.expr(_MIG_SPLIT)
    per = o.groupBy("o_custkey").agg(
        dsum(
            F.when(F.col("o_orderdate") < split, F.col("o_totalprice"))
        ).alias("rev1"),
        dsum(
            F.when(F.col("o_orderdate") >= split, F.col("o_totalprice"))
        ).alias("rev2"),
    )

    def band(c):
        return (
            F.when(F.col(c).isNull() | (F.col(c) == 0), 0)
            .when(F.col(c) < 200000, 1)
            .when(F.col(c) < 500000, 2)
            .otherwise(3)
        )

    banded = per.select(band("rev1").alias("b1"), band("rev2").alias("b2"))
    from ksql_spark.operators.scale import pin

    # pin the 16-row transition table: rowsum, pm, and every power
    # iteration would each re-run the corpus agg (6 parquet scans -> 1)
    trans = banded.groupBy("b1", "b2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).transform(pin, eager=False)
    rowsum = trans.groupBy("b1").agg(F.sum("c").cast("bigint").alias("rs"))
    pm = trans.join(rowsum, "b1").select(
        "b1",
        "b2",
        _q6(F.col("c") * 1.0 / F.col("rs")).alias("pij"),
    )
    v = spark.range(4).select(
        F.col("id").cast("bigint").alias("b"), F.lit(0.25).alias("v")
    )
    for _ in range(_MIG_ITERS):
        v = (
            v.join(pm, v["b"] == pm["b1"])
            .groupBy(F.col("b2").alias("nb"))
            .agg(dsum(F.col("v") * F.col("pij")).alias("v"))
            .select(F.col("nb").alias("b"), "v")
        )
    return v.select(F.col("b").alias("band"), F.col("v").alias("steady_share"))


# ---------------------------------------------------------------------------
# D78 — Laspeyres / Paasche / Fisher price indices
# ---------------------------------------------------------------------------

@query(
    "part_price_index_monthly",
    oracle=f"""
    WITH pm AS (
        SELECT l_partkey, date_trunc('month', l_shipdate) AS m,
               {sql_dsum('l_extendedprice')} AS ext,
               {sql_dsum('l_quantity')} AS qty
        FROM lineitem GROUP BY l_partkey, date_trunc('month', l_shipdate)
    ), base AS (
        SELECT l_partkey, ext / qty AS p0, qty AS q0
        FROM pm WHERE m = (SELECT MIN(m) FROM pm)
    ), joined AS (
        SELECT pm.m, pm.l_partkey,
               pm.ext / pm.qty AS pt, pm.qty AS qt, base.p0, base.q0
        FROM pm JOIN base ON base.l_partkey = pm.l_partkey
    ), agg AS (
        SELECT m,
               CAST(COUNT(*) AS BIGINT) AS n_parts,
               {sql_dsum('pt * q0')} AS l_num, {sql_dsum('p0 * q0')} AS l_den,
               {sql_dsum('pt * qt')} AS p_num, {sql_dsum('p0 * qt')} AS p_den
        FROM joined GROUP BY m
    )
    SELECT CAST(m AS TIMESTAMP) AS month, n_parts,
           {_sql_q6("l_num / l_den * 100.0")} AS laspeyres,
           {_sql_q6("p_num / p_den * 100.0")} AS paasche,
           {_sql_q6(
               "sqrt((l_num / l_den) * (p_num / p_den)) * 100.0"
           )} AS fisher
    FROM agg
    """,
    ref="SURVEY §2 D78 [EXT] (Laspeyres / Paasche / Fisher price "
    "indices: base-month-weighted vs current-weighted unit-price "
    "ratios per month over the common part basket, Fisher = their "
    "geometric mean — the inflation-measurement classic (CPI "
    "methodology); per-(part,month) unit prices from quantized "
    "sums, base month broadcastable)",
)
def part_price_index_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly price indices over the part basket: Laspeyres (base-month
    quantity weights), Paasche (current weights), Fisher ideal (geometric
    mean), base = the first observed month = 100. Parts absent from the
    base month drop out of the basket (the standard fixed-basket rule).

    Scale shape: one (part, month) agg off the fact scan; the base
    basket is a part-keyed join side (bounded by |parts|, AQE
    broadcasts while it fits); the index agg is |months| rows. No
    window, nothing unbounded after the first agg."""
    li = load(spark, sf_dir, "lineitem")
    pm = li.groupBy(
        "l_partkey", F.date_trunc("month", "l_shipdate").alias("m")
    ).agg(
        dsum("l_extendedprice").alias("ext"),
        dsum("l_quantity").alias("qty"),
    )
    min_m = pm.agg(F.min("m").alias("m0"))
    base = (
        pm.crossJoin(F.broadcast(min_m))
        .where(F.col("m") == F.col("m0"))
        .select(
            "l_partkey",
            (F.col("ext") / F.col("qty")).alias("p0"),
            F.col("qty").alias("q0"),
        )
    )
    joined = pm.join(base, "l_partkey").select(
        "m",
        (F.col("ext") / F.col("qty")).alias("pt"),
        F.col("qty").alias("qt"),
        "p0",
        "q0",
    )
    agg = joined.groupBy("m").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        dsum(F.col("pt") * F.col("q0")).alias("l_num"),
        dsum(F.col("p0") * F.col("q0")).alias("l_den"),
        dsum(F.col("pt") * F.col("qt")).alias("p_num"),
        dsum(F.col("p0") * F.col("qt")).alias("p_den"),
    )
    return agg.select(
        F.col("m").alias("month"),
        "n_parts",
        _q6(F.col("l_num") / F.col("l_den") * 100.0).alias("laspeyres"),
        _q6(F.col("p_num") / F.col("p_den") * 100.0).alias("paasche"),
        _q6(
            F.sqrt(
                (F.col("l_num") / F.col("l_den"))
                * (F.col("p_num") / F.col("p_den"))
            )
            * 100.0
        ).alias("fisher"),
    )


# ---------------------------------------------------------------------------
# D76b — Hill estimator, production path (prefiltered top-k)
# ---------------------------------------------------------------------------

@query(
    "events_hill_tail_index_pruned",
    # rows-only by design: the approx-quantile prefilter threshold is
    # engine-specific (Spark's GK sketch); the agreement law in
    # tests/test_pipeline_audit.py pins bit-equality with the exact entry
    # whenever the filter keeps >= k+1 rows per type (asserted there too).
    ref="SURVEY §2 D76 production path (the exact entry's rank window "
    "totally sorts each type — at 100 TB a type is the whole corpus "
    "slice; here an approx_percentile(value, 0.999) per-type threshold "
    "broadcasts back as a prefilter, so the exact window runs on the "
    "surviving sliver; the safety agg verifies >= k+1 survivors per "
    "type, widening to 0.99 when the tail is too thin)",
)
def events_hill_tail_index_pruned(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Production Hill estimator: per-type approximate 99.9th-percentile
    threshold (map-side GK sketch, bounded exchange) prefilters the
    corpus; the exact top-(k+1) rank window then runs on the survivors
    only. Falls back to the 99th percentile for types whose tail slice
    is thinner than k+1 rows. Identical output to
    events_hill_tail_index whenever the filter keeps the true top
    k+1 (law-pinned on the fixture).

    Scale shape: one approx-percentile agg (bounded), threshold join
    back (broadcastable |types| rows), rank window over ~0.1% of the
    corpus instead of 100%."""
    e = load(spark, sf_dir, "events").where(F.col("value") > 0)
    thr = e.groupBy("event_type").agg(
        F.percentile_approx("value", 0.999, 10000).alias("t999"),
        F.percentile_approx("value", 0.99, 10000).alias("t99"),
        F.count(F.lit(1)).cast("bigint").alias("n_pos"),
    )
    # deterministic threshold choice from the type's count, with a 3x
    # margin over the GK sketch's rank error: the 0.1% slice must be
    # expected to hold 3(k+1) rows before we trust it, else widen to 1%,
    # else keep the whole type (the sf0.01 fixture lands here — the
    # production win only exists where the data is big, by construction)
    need = 3 * (_HILL_K + 1)
    threshold = (
        F.when(F.col("n_pos") * 0.001 >= need, F.col("t999"))
        .when(F.col("n_pos") * 0.01 >= need, F.col("t99"))
        .otherwise(F.lit(float("-inf")))
    )
    survivors = e.join(F.broadcast(thr), "event_type").where(
        F.col("value") >= threshold
    )
    w = Window.partitionBy("event_type").orderBy(F.col("value").desc())
    ranked = survivors.select(
        "event_type", "value", F.row_number().over(w).alias("rk")
    )
    kth = ranked.where(F.col("rk") == _HILL_K + 1).select(
        "event_type", F.col("value").alias("x_k")
    )
    tops = (
        ranked.where(F.col("rk") <= _HILL_K)
        .join(kth, "event_type")
        .select(
            "event_type",
            _q6(F.log(F.col("value") / F.col("x_k"))).alias("lr"),
        )
    )
    return tops.groupBy("event_type").agg(
        F.lit(_HILL_K).cast("bigint").alias("k_order_stats"),
        _q6(dsum("lr") / _HILL_K).alias("hill_xi"),
        _q6(F.lit(float(_HILL_K)) / dsum("lr")).alias("tail_alpha"),
    )


# ---------------------------------------------------------------------------
# D79 — Mann-Whitney U (weekday vs weekend order values)
# ---------------------------------------------------------------------------

@query(
    "orders_mann_whitney",
    oracle=f"""
    WITH labeled AS (
        SELECT o_totalprice AS x,
               CASE WHEN dayofweek(o_orderdate) IN (0, 6) THEN 1 ELSE 0 END
                   AS is_weekend
        FROM orders
    ), ranked AS (
        SELECT is_weekend,
               CAST(rank() OVER (ORDER BY x) AS DOUBLE)
               + (CAST(COUNT(*) OVER (PARTITION BY x) AS DOUBLE) - 1) / 2.0
                   AS r
        FROM labeled
    ), sums AS (
        SELECT CAST(SUM(is_weekend) AS BIGINT) AS n1,
               CAST(SUM(1 - is_weekend) AS BIGINT) AS n2,
               {sql_dsum('CASE WHEN is_weekend = 1 THEN r END')} AS r1
        FROM ranked
    ), ties AS (
        SELECT CAST(SUM(CAST(t AS HUGEINT) * (t - 1) * (t + 1)) AS DOUBLE)
            AS tie_term
        FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM labeled GROUP BY x)
    )
    SELECT n1, n2,
           -- u and its null mean are exact multiples of 0.5 (rank sums),
           -- identical IEEE in both engines; the 1e6 quantizer's long cast
           -- OVERFLOWS on them at the sf10 probe (u ~ n1*n2 ~ 5e13)
           r1 - n1 * (n1 + 1) / 2.0 AS u_stat,
           n1 * 1.0 * n2 / 2.0 AS mean_u,
           {_sql_q6(
               "(r1 - n1 * (n1 + 1) / 2.0 - n1 * 1.0 * n2 / 2.0)"
               " / NULLIF(sqrt(n1 * 1.0 * n2 / 12.0 * ((n1 + n2 + 1.0)"
               " - tie_term / ((n1 + n2) * 1.0 * (n1 + n2 + 1)"
               " * (n1 + n2 - 1)) * (n1 + n2 + 1))), 0)"
           )} AS z_stat
    FROM sums CROSS JOIN ties
    """,
    ref="SURVEY §2 D79 [EXT] (Mann-Whitney U / Wilcoxon rank-sum: "
    "weekend vs weekday order values via tie-averaged global ranks, U "
    "from the rank sum, tie-corrected normal z — the distribution-free "
    "twin of D53's Welch t-test (heavy-tailed money columns violate "
    "Welch's normality far more often than its variance assumption); "
    "Mann & Whitney 1947)",
)
def orders_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-sum test on order value, weekend (Sat/Sun) vs weekday: U
    statistic, its null mean, and the tie-corrected z. One row.

    Scale shape (VERDICT r9 item 1b — the ranged two-pass device, wired):
    the tie-averaged rank of a value depends only on the VALUE, so the
    corpus first collapses to one row per distinct x (count t, weekend
    count w) in a single hash agg, then ranged_cumsum stitches the
    global cumulative count over x without any single-partition sort
    (range-partition, local window, #partitions-row boundary offsets).
    r(x) = cum_lt + (t+1)/2 and the weekend rank sum is the tie-group
    sum of w·r — everything after the per-x agg is one reduction. No
    unpartitioned window anywhere; the former single-task 22.6 s sort
    at sf10 is now an ordinary shuffled agg.

    Determinism: r·1e6 is an exact integral double (r is a half-integer,
    r·1e6 a multiple of 5e5, < 2^53 far beyond sf100), so the per-GROUP
    scaled addend w · trunc(r·1e6 + 0.5) equals the oracle's per-ROW
    scaled sum exactly; accumulation runs in decimal(38,0) (the
    dsum_wide posture — rank sums ~ n²/2 overflow a long at sf10) and
    the final decimal→double cast rounds identically in both engines.
    Spark dayofweek is 1=Sunday..7=Saturday vs DuckDB 0=Sunday..6 —
    both sides spell their own weekend set (the D53 mapping pin)."""
    from ksql_spark.operators.scale import ranged_cumsum

    o = load(spark, sf_dir, "orders")
    labeled = o.select(
        F.col("o_totalprice").alias("x"),
        F.when(F.dayofweek("o_orderdate").isin(1, 7), 1)
        .otherwise(0)
        .alias("is_weekend"),
    )
    per_x = labeled.groupBy("x").agg(
        F.count(F.lit(1)).cast("bigint").alias("t"),
        F.sum("is_weekend").cast("bigint").alias("w"),
    )
    cum = ranged_cumsum(per_x, ["x"], "t", out_col="cum_t")
    t, w = F.col("t"), F.col("w")
    # tie-averaged rank of every row holding value x: rows strictly
    # below + (t+1)/2 — all intermediates exact in double
    r = (F.col("cum_t") - t).cast("double") + (t.cast("double") + 1.0) / 2.0
    # the oracle sums trunc(r*1e6 + 0.5) per ROW; all t rows of a tie
    # group share r, so w * scaled(r) is that sum exactly — multiply in
    # decimal(38,0) (w * r * 1e6 exceeds a long beyond sf10 tie depths)
    r1_scaled = w.cast("decimal(38,0)") * (r * F.lit(1_000_000.0) + F.lit(0.5)).cast(
        "long"
    )
    # the tie term is exactly integral — no quantization scale at all:
    # t³ for a 28k-deep tie already overflows the 1e6-scaled ADDEND
    # (sf10 probe), so the product runs in decimal(38,0) end to end
    sums = cum.agg(
        F.sum("w").cast("bigint").alias("n1"),
        F.sum(t - w).cast("bigint").alias("n2"),
        (F.sum(r1_scaled).cast("double") / F.lit(1_000_000.0)).alias("r1"),
        F.sum(t.cast("decimal(38,0)") * (t - 1) * (t + 1))
        .cast("double")
        .alias("tie_term"),
    )
    n1, n2, r1 = F.col("n1"), F.col("n2"), F.col("r1")
    u = r1 - n1 * (n1 + 1) / 2.0
    mean_u = n1 * 1.0 * n2 / 2.0
    nn = n1 + n2
    var_u = (
        n1 * 1.0 * n2 / 12.0
        * (
            (nn + 1.0)
            - F.col("tie_term")
            / (nn * 1.0 * (nn + 1) * (nn - 1))
            * (nn + 1)
        )
    )
    # u/mean_u: exact half-integers, no quantization (the 1e6 long cast
    # overflows at sf10 — see the oracle note)
    return sums.select(
        "n1",
        "n2",
        u.alias("u_stat"),
        mean_u.alias("mean_u"),
        _q6((u - mean_u) / F.nullif(F.sqrt(var_u), F.lit(0.0))).alias(
            "z_stat"
        ),
    )


# ---------------------------------------------------------------------------
# D80 — McNemar's paired pre/post conversion test
# ---------------------------------------------------------------------------

@query(
    "events_mcnemar_prepost",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'purchase'
                   AND ts < TIMESTAMP '{_CUPED_CUT} 00:00:00'
                   THEN 1 ELSE 0 END) AS pre_conv,
               MAX(CASE WHEN event_type = 'purchase'
                   AND ts >= TIMESTAMP '{_CUPED_CUT} 00:00:00'
                   THEN 1 ELSE 0 END) AS post_conv
        FROM events GROUP BY user_id
    )
    SELECT CAST(SUM(CASE WHEN pre_conv = 1 AND post_conv = 1 THEN 1 ELSE 0
               END) AS BIGINT) AS both_periods,
           CAST(SUM(CASE WHEN pre_conv = 1 AND post_conv = 0 THEN 1 ELSE 0
               END) AS BIGINT) AS pre_only,
           CAST(SUM(CASE WHEN pre_conv = 0 AND post_conv = 1 THEN 1 ELSE 0
               END) AS BIGINT) AS post_only,
           CAST(SUM(CASE WHEN pre_conv = 0 AND post_conv = 0 THEN 1 ELSE 0
               END) AS BIGINT) AS neither,
           {_sql_q6(
               "CASE WHEN SUM(CASE WHEN pre_conv + post_conv = 1 THEN 1"
               " ELSE 0 END) > 0 THEN"
               " (abs(SUM(CASE WHEN pre_conv = 1 AND post_conv = 0 THEN 1"
               " ELSE 0 END) - SUM(CASE WHEN pre_conv = 0 AND post_conv = 1"
               " THEN 1 ELSE 0 END)) - 1.0)"
               " * (abs(SUM(CASE WHEN pre_conv = 1 AND post_conv = 0 THEN 1"
               " ELSE 0 END) - SUM(CASE WHEN pre_conv = 0 AND post_conv = 1"
               " THEN 1 ELSE 0 END)) - 1.0)"
               " / SUM(CASE WHEN pre_conv + post_conv = 1 THEN 1 ELSE 0 END)"
               " ELSE 0.0 END"
           )} AS mcnemar_chi2
    FROM per_user
    """,
    ref="SURVEY §2 D80 [EXT] (McNemar 1947 paired-proportion test with "
    "Edwards' continuity correction: each user is their own control — "
    "did conversion status flip across the Jan-16 cut; chi2 = "
    "(|b-c|-1)^2/(b+c) on the discordant pairs only, the within-subject "
    "complement of D58's DiD and D83's two-sample z)",
)
def events_mcnemar_prepost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test on paired conversion: per user, did they purchase
    in the pre period and in the post period; the 2x2 concordance
    table and the continuity-corrected chi-square on the discordant
    cells (1 dof; > 3.84 rejects 'no within-user change' at 5%).

    Scale shape: one user-keyed conditional agg collapses the corpus,
    then a single 1-row aggregate over the four flags. Map-side
    partials do all the work; no join, no window."""
    e = load(spark, sf_dir, "events")
    cut = F.lit(f"{_CUPED_CUT} 00:00:00").cast("timestamp")
    per_user = e.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") < cut), 1
            ).otherwise(0)
        ).alias("pre_conv"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") >= cut), 1
            ).otherwise(0)
        ).alias("post_conv"),
    )
    pre, post = F.col("pre_conv"), F.col("post_conv")

    def cell(pv, qv):
        return (
            F.sum(F.when((pre == pv) & (post == qv), 1).otherwise(0))
            .cast("bigint")
        )

    agg = per_user.agg(
        cell(1, 1).alias("both_periods"),
        cell(1, 0).alias("pre_only"),
        cell(0, 1).alias("post_only"),
        cell(0, 0).alias("neither"),
    )
    b, c = F.col("pre_only"), F.col("post_only")
    disc = b + c
    chi2 = F.when(
        disc > 0,
        (F.abs(b - c) - 1.0) * (F.abs(b - c) - 1.0) / disc,
    ).otherwise(F.lit(0.0))
    return agg.select(
        "both_periods",
        "pre_only",
        "post_only",
        "neither",
        _q6(chi2).alias("mcnemar_chi2"),
    )


# ---------------------------------------------------------------------------
# D81 — daily-series periodogram (single-bin DFT per candidate period)
# ---------------------------------------------------------------------------

_PERIODS = (2, 3, 4, 5, 6, 7, 14, 28, 30, 91)


@query(
    "events_periodogram",
    oracle=f"""
    WITH bounds AS (
        SELECT event_type, MIN(CAST(ts AS DATE)) AS d0,
               MAX(CAST(ts AS DATE)) AS d1
        FROM events GROUP BY event_type
    ), spine AS (
        SELECT event_type, d0,
               CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
                   AS d
        FROM bounds
    ), obs AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), daily AS (
        SELECT spine.event_type, date_diff('day', spine.d0, spine.d) AS ti,
               COALESCE(obs.x, 0) AS x
        FROM spine LEFT JOIN obs
          ON obs.event_type = spine.event_type AND obs.d = spine.d
    ), centered AS (
        SELECT d.event_type, d.ti,
               d.x - mu.m AS xc
        FROM daily d JOIN (
            SELECT event_type, {sql_dsum('x * 1.0')} AS sx,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM daily GROUP BY event_type
        ) t ON t.event_type = d.event_type
        CROSS JOIN LATERAL (SELECT t.sx / t.n AS m) mu
    ), bins AS (
        SELECT c.event_type, p.period,
               {sql_dsum(
                   "xc * cos(2 * pi() * c.ti / p.period)"
               )} AS sc,
               {sql_dsum(
                   "xc * sin(2 * pi() * c.ti / p.period)"
               )} AS ss,
               MAX(t2.n) AS n,
               MAX(t2.ssq) AS ssq
        FROM centered c
        CROSS JOIN (SELECT UNNEST(ARRAY{list(_PERIODS)}) AS period) p
        JOIN (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                   {sql_dsum('xc * xc')} AS ssq
            FROM centered GROUP BY event_type
        ) t2 ON t2.event_type = c.event_type
        GROUP BY c.event_type, p.period
    )
    SELECT event_type, CAST(period AS INT) AS period_days,
           {_sql_q6("(sc * sc + ss * ss) * 2.0 / (n * ssq)")}
               AS power_share
    FROM bins WHERE ssq > 0
    """,
    ref="SURVEY §2 D81 [EXT] (single-bin DFT periodogram: for each "
    "candidate period, the squared projection of the mean-centered "
    "daily series onto that frequency's cos/sin pair, normalized by "
    "total variance — the spectral answer to 'WHICH period?' where "
    "D35/K82 assume weekly and K67's ACF reads lags one at a time; "
    "Schuster 1898, Goertzel single-bin form)",
)
def events_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Periodogram of each type's calendar-complete daily count series
    at 10 candidate periods (2..91 days): power_share = 2(C²+S²)/(n·σ²n)
    where C,S are the centered series' projections onto the period's
    cos/sin. A dominant weekly cycle shows as power_share peaking at 7.

    Scale shape: corpus collapses to the daily table in one agg; the
    mean and variance ride a bounded per-type agg; the 10-period
    expansion is a broadcast cross join of the BOUNDED daily table
    (|types| x |days| x 10 rows); the trig sums quantize per term.
    Nothing after the first agg scales with the corpus."""
    import math

    e = load(spark, sf_dir, "events")
    obs = e.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    bounds = e.groupBy("event_type").agg(
        F.min(F.to_date("ts")).alias("d0"),
        F.max(F.to_date("ts")).alias("d1"),
    )
    spine = bounds.select(
        "event_type", "d0", F.explode(F.sequence("d0", "d1")).alias("d")
    )
    from ksql_spark.operators.scale import pin

    # pin the daily table: four downstream branches (mean, variance, trig
    # bins, final join) would otherwise each re-run the corpus agg — the
    # recomputed-subtree class the r8 probe fixes targeted (8 scans -> 2)
    daily = spine.join(obs, ["event_type", "d"], "left").select(
        "event_type",
        F.datediff(F.col("d"), F.col("d0")).alias("ti"),
        F.coalesce("x", F.lit(0)).alias("x"),
    ).transform(pin, eager=False)
    mu = daily.groupBy("event_type").agg(
        dsum(F.col("x") * 1.0).alias("sx"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    centered = daily.join(mu, "event_type").select(
        "event_type",
        "ti",
        (F.col("x") - F.col("sx") / F.col("n")).alias("xc"),
    )
    t2 = centered.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum(F.col("xc") * F.col("xc")).alias("ssq"),
    )
    periods = e.sparkSession.createDataFrame(
        [(p,) for p in _PERIODS], "period int"
    )
    two_pi = F.lit(2 * math.pi)
    ang = two_pi * F.col("ti") / F.col("period")
    bins = (
        centered.crossJoin(F.broadcast(periods))
        .join(t2, "event_type")
        .groupBy("event_type", "period")
        .agg(
            dsum(F.col("xc") * F.cos(ang)).alias("sc"),
            dsum(F.col("xc") * F.sin(ang)).alias("ss"),
            F.max("n").alias("n"),
            F.max("ssq").alias("ssq"),
        )
    )
    sc, ss = F.col("sc"), F.col("ss")
    return bins.where(F.col("ssq") > 0).select(
        "event_type",
        F.col("period").cast("int").alias("period_days"),
        _q6(
            (sc * sc + ss * ss) * 2.0 / (F.col("n") * F.col("ssq"))
        ).alias("power_share"),
    )


# ---------------------------------------------------------------------------
# D55b — referential-integrity audit, one-pass production path
# ---------------------------------------------------------------------------

@query(
    "dq_referential_orphans_onepass",
    oracle=_orphan_oracle(),
    ref="SURVEY §2 D55 production path (identical output and oracle to "
    "dq_referential_orphans, different plan: each child table is "
    "scanned ONCE, all its parents' key sets join in as found-flags, "
    "and a single wide aggregate explodes back to the per-relationship "
    "rows — 5 child scans instead of 42 collapsed branches; the shape "
    "you'd run on a 100 TB lineitem, where 6 extra scans ARE the bill)",
)
def dq_referential_orphans_onepass(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """One-pass orphan audit: per child table, every FK relationship's
    live+drill flags ride the SAME scan (one left join per parent on
    its key set), then one wide aggregate computes all orphan
    rows/keys/rates and explodes to the standard per-relationship
    layout. Bit-identical to dq_referential_orphans (same DuckDB
    oracle hash-checks both).

    Scale shape: |children| scans total; each parent key set joins
    keyed (dims broadcast by size under AQE, the orders set shuffles
    lineitem once on l_orderkey); the wide agg is map-side combined;
    the explode runs on ONE row per child."""
    by_child: dict[str, list] = {}
    for child, fk, parent, pk in _FK_RELATIONSHIPS:
        by_child.setdefault(child, []).append((fk, parent, pk))
    out = None
    for child, rels in by_child.items():
        c = load(spark, sf_dir, child)
        joined = c
        for fk, parent, pk in rels:
            p = load(spark, sf_dir, parent).select(
                F.col(pk).alias(f"__pk_{parent}_{pk}")
            ).distinct()
            joined = joined.join(
                p, joined[fk] == p[f"__pk_{parent}_{pk}"], "left"
            )
        aggs = [F.count(F.lit(1)).cast("bigint").alias("child_rows")]
        structs = []
        for fk, parent, pk in rels:
            pkc = F.col(f"__pk_{parent}_{pk}")
            rel = f"{child}.{fk}->{parent}.{pk}"
            for mode in ("live", "drill"):
                orphan = (
                    pkc.isNull()
                    if mode == "live"
                    else pkc.isNull() | (pkc % 97 == 0)
                )
                tag = f"{parent}_{pk}_{mode}"
                aggs.append(
                    F.sum(F.when(orphan, 1).otherwise(0))
                    .cast("bigint")
                    .alias(f"rows_{tag}")
                )
                aggs.append(
                    F.count_distinct(F.when(orphan, F.col(fk)))
                    .cast("bigint")
                    .alias(f"keys_{tag}")
                )
                structs.append(
                    F.struct(
                        F.lit(rel).alias("relationship"),
                        F.lit(mode).alias("mode"),
                        F.col("child_rows"),
                        F.col(f"rows_{tag}").alias("orphan_rows"),
                        F.col(f"keys_{tag}").alias("orphan_keys"),
                        _q6(
                            F.col(f"rows_{tag}") * 1.0 / F.col("child_rows")
                        ).alias("orphan_rate"),
                    )
                )
        wide = joined.agg(*aggs)
        rows = wide.select(
            F.explode(F.array(*structs)).alias("r")
        ).select("r.*")
        out = rows if out is None else out.unionByName(rows)
    return out


# ---------------------------------------------------------------------------
# K133 — maximal-marginal-relevance re-ranking (greedy, unrolled)
# ---------------------------------------------------------------------------

_MMR_LAMBDA = 0.7
_MMR_CAND = 20
_MMR_K = 10
_MMR_QUERY = 0  # anchor vector

_MMR_DOT = """
list_reduce(
    list_prepend(CAST(0.0 AS DOUBLE),
        list_transform(range(1, len({a}) + 1),
                       i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))),
    (acc, p) -> acc + p)
"""
_MMR_NORM = """
sqrt(list_reduce(
    list_prepend(CAST(0.0 AS DOUBLE),
        list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
    (acc, p) -> acc + p))
"""


def _mmr_oracle() -> str:
    lam = "CAST(0.7 AS DOUBLE)"
    nv = _MMR_NORM.format(a="v.embedding")
    cos_qv = (
        _MMR_DOT.format(a="q.embedding", b="v.embedding")
        + " / ("
        + _MMR_NORM.format(a="q.embedding")
        + " * "
        + _MMR_NORM.format(a="v.embedding")
        + ")"
    )
    cos_ab = (
        _MMR_DOT.format(a="a.embedding", b="b.embedding")
        + " / ("
        + _MMR_NORM.format(a="a.embedding")
        + " * "
        + _MMR_NORM.format(a="b.embedding")
        + ")"
    )
    head = f"""
    WITH cand AS MATERIALIZED (
        -- MATERIALIZED throughout: DuckDB inlines plain CTEs, so the
        -- 10-step unrolled chain would re-expand cand/sims/acc
        -- combinatorially (observed: file-handle exhaustion)
        SELECT vec_id, rel FROM (
            SELECT v.vec_id,
                   {_sql_q6(cos_qv)} AS rel,
                   row_number() OVER (ORDER BY {_sql_q6(cos_qv)} DESC,
                                      v.vec_id) AS rn
            FROM (SELECT embedding FROM embeddings
                  WHERE vec_id = {_MMR_QUERY}) q
            CROSS JOIN embeddings v
            WHERE v.vec_id <> {_MMR_QUERY}
              AND {nv} > 0
        ) WHERE rn <= {_MMR_CAND}
    ), sims AS MATERIALIZED (
        SELECT ca.vec_id AS a_id, cb.vec_id AS b_id,
               {_sql_q6(cos_ab)} AS sim
        FROM cand ca JOIN embeddings a ON a.vec_id = ca.vec_id
        JOIN cand cb ON cb.vec_id <> ca.vec_id
        JOIN embeddings b ON b.vec_id = cb.vec_id
    ),
    picked1 AS (
        SELECT 1 AS rank, vec_id, rel,
               {_sql_q6(f"{lam} * rel")} AS mmr_score
        FROM cand ORDER BY rel DESC, vec_id LIMIT 1
    ), acc1 AS MATERIALIZED (SELECT * FROM picked1)
    """
    for t in range(2, _MMR_K + 1):
        head += f""",
    scores{t} AS MATERIALIZED (
        SELECT c.vec_id, c.rel,
               {_sql_q6(
                   f"{lam} * c.rel - (1.0 - {lam}) * MAX(s.sim)"
               )} AS mmr_score
        FROM cand c
        JOIN sims s ON s.a_id = c.vec_id
        JOIN acc{t-1} p ON p.vec_id = s.b_id
        WHERE c.vec_id NOT IN (SELECT vec_id FROM acc{t-1})
        GROUP BY c.vec_id, c.rel
    ),
    picked{t} AS MATERIALIZED (
        SELECT {t} AS rank, vec_id, rel, mmr_score
        FROM scores{t} ORDER BY mmr_score DESC, vec_id LIMIT 1
    ),
    acc{t} AS MATERIALIZED (SELECT * FROM acc{t-1}
                            UNION ALL SELECT * FROM picked{t})
    """
    return head + f"""
    SELECT CAST(rank AS INT) AS rank, vec_id, rel AS relevance, mmr_score
    FROM acc{_MMR_K}
    """


def _mmr_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate stage, UN-pinned (the plan gate inspects this directly):
    cosine relevance to the broadcast anchor over the corpus, then the
    top-20 via orderBy().limit() — Catalyst plans TakeOrderedAndProject
    (per-partition heaps + a bounded merge), NOT the single-partition
    rank window a row_number() filter would plan (Catalyst does not
    rewrite a rank-filter into top-k; the llm_collocations precedent).
    Deterministic tiebreak on vec_id keeps both engines' 20 identical."""
    from ksql_spark.operators import vectors

    e = load(spark, sf_dir, "embeddings")
    # r14 (guide §1.2, the matryoshka device): the anchor's 64-dim norm
    # fold ran once per CORPUS ROW inside the per-row relevance expression;
    # it is a function of the 1-row broadcast side only, so it is computed
    # once in the broadcast build. Same expression over the same value —
    # the relevance doubles are bit-identical.
    q = e.where(F.col("vec_id") == _MMR_QUERY).select(
        F.col("embedding").alias("q_emb"),
        vectors.l2_norm("embedding").alias("q_n"),
    )
    # try_divide + null filter: a zero-norm vector exists on degenerate
    # corpora (house ANSI rule — NULL, never a job abort; the oracle's
    # norm > 0 predicate spells the same exclusion)
    rel = _q6(
        F.try_divide(
            vectors.dot("q_emb", "embedding"),
            F.col("q_n") * vectors.l2_norm("embedding"),
        )
    )
    return (
        e.where(F.col("vec_id") != _MMR_QUERY)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "embedding", rel.alias("rel"))
        .where(F.col("rel").isNotNull())
        .orderBy(F.col("rel").desc(), "vec_id")
        .limit(_MMR_CAND)
    )


@query(
    "llm_mmr_rerank",
    oracle=_mmr_oracle(),
    ref="SURVEY §2 K133 [EXT] (maximal marginal relevance, Carbonell & "
    "Goldstein SIGIR 1998: greedy re-rank of the query's top-20 cosine "
    "candidates, each step picking argmax of lambda*rel - "
    "(1-lambda)*max-sim-to-picked — the diversity-aware retrieval "
    "stage between K3's raw top-k and K42's hard negatives; 10 steps "
    "unrolled, every score quantized so both engines pick identical "
    "chains)",
)
def llm_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR re-ranking: top-20 candidates by cosine to the anchor vector,
    then 10 greedy picks balancing relevance (lambda = 0.7) against the
    max similarity to anything already picked. Returns (rank, vec_id,
    relevance, mmr_score) — rank 1 is the pure-relevance pick.

    Scale shape: candidate generation is the broadcast-anchor corpus
    pass (K3's shape) closed by TakeOrderedAndProject — no global sort,
    no single-partition window (VERDICT r9 item 1a); everything after —
    the 20x20 sim matrix and the 10 greedy steps — is bounded and
    pinned, looping over PLANS like graph_pagerank. At 100 TB only the
    first stage grows; the greedy tail is constant work."""
    from ksql_spark.operators import vectors
    from ksql_spark.operators.scale import pin

    lam = _MMR_LAMBDA
    cand = _mmr_candidates(spark, sf_dir).transform(pin, eager=False)
    a = cand.select(
        F.col("vec_id").alias("a_id"), F.col("embedding").alias("a_emb")
    )
    b = cand.select(
        F.col("vec_id").alias("b_id"), F.col("embedding").alias("b_emb")
    )
    sim = _q6(
        F.try_divide(
            vectors.dot("a_emb", "b_emb"),
            vectors.l2_norm("a_emb") * vectors.l2_norm("b_emb"),
        )
    )
    sims = a.join(b, F.col("a_id") != F.col("b_id")).select(
        "a_id", "b_id", sim.alias("sim")
    )
    # r14 (the markov/PAV device): the 10 greedy steps ran as pinned
    # anti/semi/union plans over tables bounded BY CONSTRUCTION at
    # _MMR_CAND rows (the top-20 limit) — ~10 checkpoint materializations
    # of pure stage scheduling. Both inputs are the sanctioned §5
    # bounded-collect class (20 rel rows, 20·19 sim rows); the greedy runs
    # in plain Python with IDENTICAL arithmetic — the q6-quantized sims
    # collected as computed by the same Spark folds, the same
    # (lam·rel) − ((1−lam)·max sim) IEEE expression (1.0−lam was already a
    # Python-side literal), the same trunc-toward-zero q6, the same
    # (score DESC NULLS LAST, vec_id ASC) pick order — so the chain, and
    # the output, is bit-identical to the former plan loop.
    rel = {r["vec_id"]: r["rel"] for r in cand.select("vec_id", "rel").collect()}
    sv: dict = {}
    for r in sims.collect():
        sv.setdefault(r["a_id"], {})[r["b_id"]] = r["sim"]

    def py_q6(x: float | None) -> float | None:
        if x is None:
            return None
        return float(int(x * 1000000.0 + 0.5)) / 1000000.0

    out_schema = "rank int, vec_id long, relevance double, mmr_score double"
    if not rel:
        return spark.createDataFrame([], out_schema)
    first_id = min(rel, key=lambda v: (-rel[v], v))
    rows = [(1, first_id, rel[first_id], py_q6(lam * rel[first_id]))]
    picked_ids = [first_id]
    for t in range(2, _MMR_K + 1):
        if len(picked_ids) == len(rel):
            break  # mirror of the old loop: an empty remaining set picks nothing
        scores = {}
        for v in rel:
            if v in picked_ids:
                continue
            ss = [
                sv[v][p]
                for p in picked_ids
                if sv.get(v, {}).get(p) is not None
            ]
            mx = max(ss) if ss else None  # F.max skips NULLs; all-NULL -> NULL
            scores[v] = py_q6(
                lam * rel[v] - (1.0 - lam) * mx if mx is not None else None
            )
        pick = min(
            scores,
            key=lambda v: (
                (0, -scores[v], v) if scores[v] is not None else (1, 0.0, v)
            ),
        )
        rows.append((t, pick, rel[pick], scores[pick]))
        picked_ids.append(pick)
    return spark.createDataFrame(rows, out_schema)


# ---------------------------------------------------------------------------
# K134 — split-conformal calibration of the quality score
# ---------------------------------------------------------------------------

_CONF_ALPHA = 0.1  # target 90% coverage


@query(
    "llm_conformal_calibration",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'calib' ELSE 'test' END
                   AS split,
               ({_SQL_QUALITY}) AS q,
               CAST(len(string_split(text, ' ')) AS DOUBLE) AS y
        FROM documents
    ), fit AS (
        SELECT {sql_dsum('q')} / COUNT(*) AS qbar,
               {sql_dsum('y')} / COUNT(*) AS ybar,
               ({sql_dsum('q * y')} - {sql_dsum('q')} * {sql_dsum('y')}
                / COUNT(*))
               / NULLIF({sql_dsum('q * q')} - {sql_dsum('q')}
                        * {sql_dsum('q')} / COUNT(*), 0) AS beta
        FROM scored WHERE split = 'calib'
    ), scoredr AS (
        SELECT s.split,
               {_sql_q6(
                   "abs(s.y - (fit.ybar + fit.beta * (s.q - fit.qbar)))"
               )} AS r
        FROM scored s CROSS JOIN fit
    ), nc AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_calib FROM scoredr
        WHERE split = 'calib'
    ), qhat AS (
        SELECT r AS q_hat FROM (
            SELECT r, row_number() OVER (ORDER BY r) AS rn
            FROM scoredr WHERE split = 'calib'
        ) CROSS JOIN nc
        WHERE rn = CAST(ceil((n_calib + 1) * (1.0 - {_CONF_ALPHA}))
                        AS BIGINT)
    )
    SELECT
        (SELECT n_calib FROM nc) AS n_calib,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM scoredr WHERE split = 'test')
            AS n_test,
        (SELECT q_hat FROM qhat) AS q_hat,
        {_sql_q6(
            "(SELECT SUM(CASE WHEN r <= (SELECT q_hat FROM qhat) THEN 1"
            " ELSE 0 END) * 1.0 / COUNT(*) FROM scoredr"
            " WHERE split = 'test')"
        )} AS test_coverage,
        CASE WHEN {_sql_q6(
            "(SELECT SUM(CASE WHEN r <= (SELECT q_hat FROM qhat) THEN 1"
            " ELSE 0 END) * 1.0 / COUNT(*) FROM scoredr"
            " WHERE split = 'test')"
        )} >= {1.0 - _CONF_ALPHA} THEN 1 ELSE 0 END AS coverage_ok
    """,
    ref="SURVEY §2 K134 [EXT] (split conformal prediction, Vovk / "
    "Papadopoulos 2002: fit length ~ quality OLS on the calibration "
    "half, take the ceil((n+1)(1-alpha))-th absolute residual as the "
    "conformal quantile q_hat, verify >= 90% of held-out residuals "
    "fall within it — the DISTRIBUTION-FREE interval guarantee "
    "K45/K119's Platt-style calibration cannot give)",
)
def llm_conformal_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal coverage audit: calibration half (even doc_id)
    fits a 1-feature OLS of word count on quality and supplies the
    (n+1)(1-alpha) residual quantile; the test half checks that the
    promised 90% coverage actually holds. One summary row.

    Scale shape (VERDICT r9 item 1c — the ranged device, wired): scoring
    is one narrow pass; the OLS fit is a 1-row broadcast of moments; the
    conformal order statistic rides the ranged-cumsum device over the
    per-DISTINCT-residual counts — residuals are 1e-6-quantized, so the
    distinct table is far smaller than the corpus, and even when it
    isn't, the cumulative count is range-partitioned with local windows
    and a #partitions-row boundary stitch (no single-partition sort
    anywhere). q_hat is the residual whose cumulative count first
    reaches ceil((n+1)(1-alpha)) — a filter, not a rank window — and is
    carried as an always-1-row scalar (NULL when the calibration half
    is thinner than the target rank, matching the oracle's scalar
    subquery on degenerate corpora; ADVICE r9). Coverage closes in one
    agg."""
    from ksql_spark.operators import text
    from ksql_spark.operators.scale import pin, ranged_cumsum

    d = load(spark, sf_dir, "documents")
    scored = d.select(
        F.when(F.col("doc_id") % 2 == 0, "calib")
        .otherwise("test")
        .alias("split"),
        text.quality_score("text").alias("q"),
        text.word_count("text").cast("double").alias("y"),
    )
    calib = scored.where(F.col("split") == "calib")
    n = F.count(F.lit(1))
    fit = calib.agg(
        (dsum("q") / n).alias("qbar"),
        (dsum("y") / n).alias("ybar"),
        (
            (dsum(F.col("q") * F.col("y")) - dsum("q") * dsum("y") / n)
            / F.nullif(
                dsum(F.col("q") * F.col("q")) - dsum("q") * dsum("q") / n,
                F.lit(0.0),
            )
        ).alias("beta"),
    )
    scoredr = (
        scored.crossJoin(F.broadcast(fit))
        .select(
            "split",
            _q6(
                F.abs(
                    F.col("y")
                    - (
                        F.col("ybar")
                        + F.col("beta") * (F.col("q") - F.col("qbar"))
                    )
                )
            ).alias("r"),
        )
        .transform(pin, eager=False)
    )
    nc = scoredr.where(F.col("split") == "calib").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_calib")
    )
    # per-distinct-residual counts -> ranged global cumulative count ->
    # q_hat = the residual whose cumulative count first covers the target
    # rank (NULL residuals excluded, mirroring the oracle's NULLS-LAST
    # ordering: they can never sit at a rank the non-null mass covers)
    per_r = (
        scoredr.where((F.col("split") == "calib") & F.col("r").isNotNull())
        .groupBy("r")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    cum = ranged_cumsum(per_r, ["r"], "c", out_col="cum")
    k = F.ceil((F.col("n_calib") + 1) * (1.0 - _CONF_ALPHA)).cast("bigint")
    qhat = (
        cum.crossJoin(F.broadcast(nc))
        .where((F.col("cum") >= k) & (F.col("cum") - F.col("c") < k))
        # always exactly one row (NULL q_hat when the calibration half is
        # thinner than the target rank) so the downstream crossJoin never
        # collapses the output to zero rows on degenerate corpora
        .agg(F.max("r").alias("q_hat"))
    )
    test = scoredr.where(F.col("split") == "test")
    cov = (
        test.crossJoin(F.broadcast(qhat))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            _q6(
                F.sum(
                    F.when(F.col("r") <= F.col("q_hat"), 1).otherwise(0)
                )
                * 1.0
                / F.count(F.lit(1))
            ).alias("test_coverage"),
            F.max("q_hat").alias("q_hat"),
        )
    )
    return (
        cov.crossJoin(F.broadcast(nc))
        .select(
            "n_calib",
            "n_test",
            "q_hat",
            "test_coverage",
            F.when(
                F.col("test_coverage") >= 1.0 - _CONF_ALPHA, 1
            ).otherwise(0).alias("coverage_ok"),
        )
    )


# ---------------------------------------------------------------------------
# D82 — Markov removal-effect attribution
# ---------------------------------------------------------------------------

_MKV_CHANNELS = ("click", "view", "signup")
_MKV_ITERS = 12


def _mkv_transitions_sql() -> str:
    """Shared SQL: journey paths -> (from_s, to_s, c) transition counts,
    with START openers, consecutive touch hops, and CONV/NULL terminals
    (journeys without touches transition START->terminal directly)."""
    return f"""
    ordered AS (
        SELECT user_id, event_id, event_type, ts,
               COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                            END) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS journey_id
        FROM events
    ), converted AS (
        SELECT DISTINCT user_id, journey_id FROM ordered
        WHERE event_type = 'purchase'
    ), touches AS (
        SELECT user_id, journey_id, event_type, ts, event_id,
               row_number() OVER (PARTITION BY user_id, journey_id
                                  ORDER BY ts, event_id) AS pos,
               COUNT(*) OVER (PARTITION BY user_id, journey_id) AS n_touch
        FROM ordered
        WHERE event_type IN ('click', 'view', 'signup')
    ), journeys AS (
        -- every journey that has touches, with its terminal state
        SELECT t.user_id, t.journey_id, MAX(t.n_touch) AS n_touch,
               CASE WHEN MAX(c.user_id) IS NOT NULL THEN 'CONV'
                    ELSE 'NULL' END AS terminal
        FROM touches t LEFT JOIN converted c
          ON c.user_id = t.user_id AND c.journey_id = t.journey_id
        GROUP BY t.user_id, t.journey_id
    ), allj AS (
        -- every journey with its touch/conversion flags: journeys whose
        -- only events are purchases or non-channel types (e.g. 'error')
        -- have NO touch rows and transition START->terminal directly
        -- (ADVICE r9 — the docstring's model, now actually emitted)
        SELECT user_id, journey_id,
               MAX(CASE WHEN event_type IN ('click', 'view', 'signup')
                   THEN 1 ELSE 0 END) AS has_touch,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS conv
        FROM ordered GROUP BY user_id, journey_id
    ), hops AS (
        SELECT 'START' AS from_s, event_type AS to_s
        FROM touches WHERE pos = 1
        UNION ALL
        SELECT 'START', CASE WHEN conv = 1 THEN 'CONV' ELSE 'NULL' END
        FROM allj WHERE has_touch = 0
        UNION ALL
        SELECT a.event_type, b.event_type
        FROM touches a JOIN touches b
          ON b.user_id = a.user_id AND b.journey_id = a.journey_id
         AND b.pos = a.pos + 1
        UNION ALL
        SELECT t.event_type, j.terminal
        FROM touches t JOIN journeys j
          ON j.user_id = t.user_id AND j.journey_id = t.journey_id
         AND t.pos = j.n_touch
    ), trans AS (
        SELECT from_s, to_s, CAST(COUNT(*) AS BIGINT) AS c
        FROM hops GROUP BY from_s, to_s
    ), pmat AS (
        SELECT from_s, to_s,
               CAST(trunc(c * 1.0 / SUM(c) OVER (PARTITION BY from_s)
                    * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS pij
        FROM trans
    )"""


def _mkv_absorb_sql(variant: str, removed: str | None) -> str:
    if removed is None:
        pv = f"""pv_{variant} AS (
        SELECT from_s, to_s, pij FROM pmat
        UNION ALL SELECT 'CONV', 'CONV', 1.0
        UNION ALL SELECT 'NULL', 'NULL', 1.0
    )"""
    else:
        pv = f"""pv_{variant} AS (
        SELECT from_s,
               CASE WHEN to_s = '{removed}' THEN 'NULL' ELSE to_s END AS to_s,
               pij
        FROM pmat WHERE from_s <> '{removed}'
        UNION ALL SELECT 'CONV', 'CONV', 1.0
        UNION ALL SELECT 'NULL', 'NULL', 1.0
    )"""
    out = [pv,
           f"v0_{variant} AS (SELECT 'START' AS state, CAST(1.0 AS DOUBLE) AS p)"]
    for t in range(1, _MKV_ITERS + 1):
        prev = f"v{t-1}_{variant}"
        out.append(f"""v{t}_{variant} AS MATERIALIZED (
        SELECT to_s AS state,
               CAST(SUM(CAST(trunc(v.p * pv.pij * 1000000 + 0.5) AS BIGINT))
                    AS DOUBLE) / 1000000.0 AS p
        FROM {prev} v JOIN pv_{variant} pv ON pv.from_s = v.state
        GROUP BY to_s
    )""")
    out.append(f"""abs_{variant} AS (
        SELECT COALESCE((SELECT p FROM v{_MKV_ITERS}_{variant}
                         WHERE state = 'CONV'), 0.0) AS a
    )""")
    return ",\n    ".join(out)


def _mkv_oracle() -> str:
    parts = [_mkv_transitions_sql().strip().removeprefix("")]
    head = "WITH " + _mkv_transitions_sql().strip()
    variants = [("full", None)] + [
        (ch, ch) for ch in _MKV_CHANNELS
    ]
    for name, removed in variants:
        head += ",\n    " + _mkv_absorb_sql(name, removed)
    selects = []
    for ch in _MKV_CHANNELS:
        selects.append(f"""
    SELECT '{ch}' AS channel,
           (SELECT a FROM abs_full) AS full_absorption,
           (SELECT a FROM abs_{ch}) AS removal_absorption,
           CAST(trunc(((SELECT a FROM abs_full) - (SELECT a FROM abs_{ch}))
                / NULLIF((SELECT a FROM abs_full), 0)
                * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS removal_effect""")
    return head + "\n" + " UNION ALL ".join(selects)


@query(
    "events_attribution_markov",
    oracle=_mkv_oracle(),
    ref="SURVEY §2 D82 [EXT] (Markov removal-effect attribution, "
    "Anderl et al. 2016: journey paths as an absorbing chain "
    "START->touches->CONV/NULL, absorption probability via 12 "
    "quantized power iterations, each channel's credit = the relative "
    "drop in absorption when transitions into it redirect to NULL — "
    "the data-driven model that replaces D57's heuristic credits)",
)
def events_attribution_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Removal-effect attribution: build the journey transition matrix
    (START, click, view, signup, CONV, NULL), compute conversion
    absorption from START by 12 power iterations with absorbing
    self-loops, then for each channel redirect its inbound transitions
    to NULL and report the relative absorption drop. Journeys without
    touches (only purchases / non-channel events) transition
    START->terminal directly, so direct conversions carry their own
    mass in the chain (ADVICE r9 — previously dropped).

    Scale shape: journey segmentation and hop extraction ride
    user-partitioned windows plus one journey-keyed flag agg (one
    corpus pass each); the transition matrix is <= 30 rows, pinned;
    the 4 variants x 12 iterations are joins on that bounded table,
    looping over PLANS with per-step pins (the MMR lesson: unpinned,
    the analyzer's tree grows exponentially). Per-step probabilities
    quantize so both engines walk identical chains."""
    e = load(spark, sf_dir, "events")
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ordered = e.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.coalesce(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).over(w_prev),
            F.lit(0),
        ).alias("journey_id"),
    )
    converted = (
        ordered.filter(F.col("event_type") == "purchase")
        .select("user_id", "journey_id")
        .distinct()
    )
    w_pos = Window.partitionBy("user_id", "journey_id").orderBy(
        "ts", "event_id"
    )
    w_n = Window.partitionBy("user_id", "journey_id")
    touches = ordered.filter(
        F.col("event_type").isin(*_MKV_CHANNELS)
    ).select(
        "user_id",
        "journey_id",
        "event_type",
        F.row_number().over(w_pos).alias("pos"),
        F.count(F.lit(1)).over(w_n).alias("n_touch"),
    )
    journeys = (
        touches.groupBy("user_id", "journey_id")
        .agg(F.max("n_touch").alias("n_touch"))
        .join(converted.withColumn("conv", F.lit(1)),
              ["user_id", "journey_id"], "left")
        .select(
            "user_id",
            "journey_id",
            "n_touch",
            F.when(F.col("conv") == 1, "CONV").otherwise("NULL").alias(
                "terminal"
            ),
        )
    )
    openers = touches.where(F.col("pos") == 1).select(
        F.lit("START").alias("from_s"), F.col("event_type").alias("to_s")
    )
    # journeys with NO touches (only purchases / non-channel events) hop
    # START->terminal directly — the model the docstring states (ADVICE r9)
    allj = ordered.groupBy("user_id", "journey_id").agg(
        F.max(
            F.when(F.col("event_type").isin(*_MKV_CHANNELS), 1).otherwise(0)
        ).alias("has_touch"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv"),
    )
    touchless = allj.where(F.col("has_touch") == 0).select(
        F.lit("START").alias("from_s"),
        F.when(F.col("conv") == 1, "CONV").otherwise("NULL").alias("to_s"),
    )
    a = touches.alias("a")
    b = touches.alias("b")
    mids = a.join(
        b,
        (F.col("b.user_id") == F.col("a.user_id"))
        & (F.col("b.journey_id") == F.col("a.journey_id"))
        & (F.col("b.pos") == F.col("a.pos") + 1),
    ).select(
        F.col("a.event_type").alias("from_s"),
        F.col("b.event_type").alias("to_s"),
    )
    terminals = touches.join(
        journeys,
        (touches["user_id"] == journeys["user_id"])
        & (touches["journey_id"] == journeys["journey_id"])
        & (touches["pos"] == journeys["n_touch"]),
    ).select(
        touches["event_type"].alias("from_s"),
        journeys["terminal"].alias("to_s"),
    )
    hops = (
        openers.unionByName(touchless)
        .unionByName(mids)
        .unionByName(terminals)
    )
    trans = hops.groupBy("from_s", "to_s").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w_row = Window.partitionBy("from_s")
    pmat = trans.select(
        "from_s",
        "to_s",
        _q6(F.col("c") * 1.0 / F.sum("c").over(w_row)).alias("pij"),
    )

    # r14 (VERDICT r13 item 5): the 4 variants × 12 power iterations ran as
    # 60 chained join/agg stages over a <= 30-row pinned table — ~9 s of
    # pure stage scheduling at every scale. The state space is FIXED by
    # construction (START, 3 channels, CONV, NULL), so the transition
    # matrix is bounded at 30 rows regardless of corpus size: collecting it
    # is the sanctioned bounded-driver-result class (guide §5), and the
    # chain is solved in plain Python with IDENTICAL quantized arithmetic —
    # the same (p * pij * 1e6 + 0.5) double products (IEEE 754 both sides),
    # the same trunc-toward-zero long cast (Python int()), exact integer
    # sums (order-free), the same /1e6 — so every intermediate vector, and
    # the output, is bit-identical to the former join spelling.
    pm = [(r["from_s"], r["to_s"], r["pij"]) for r in pmat.collect()]

    def absorption(removed: str | None) -> float:
        if removed is None:
            pv = list(pm)
        else:
            pv = [
                (f, "NULL" if t == removed else t, p)
                for f, t, p in pm
                if f != removed
            ]
        pv.append(("CONV", "CONV", 1.0))
        pv.append(("NULL", "NULL", 1.0))
        v = {"START": 1.0}
        for _ in range(_MKV_ITERS):
            acc: dict[str, int] = {}
            for f, t, p in pv:
                if f in v:
                    acc[t] = acc.get(t, 0) + int(v[f] * p * 1000000 + 0.5)
            v = {t: float(s) / 1000000.0 for t, s in acc.items()}
        return v.get("CONV", 0.0)

    def py_q6(x: float) -> float:
        # scalar mirror of _q6: trunc-toward-zero of x*1e6+0.5, then /1e6
        return float(int(x * 1000000.0 + 0.5)) / 1000000.0

    full = absorption(None)
    rows = []
    for ch in _MKV_CHANNELS:
        rm = absorption(ch)
        eff = None if full == 0.0 else py_q6((full - rm) / full)
        rows.append((ch, full, rm, eff))
    return spark.createDataFrame(
        rows,
        "channel string, full_absorption double, "
        "removal_absorption double, removal_effect double",
    )
