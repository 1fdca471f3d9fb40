"""[EXT] Corpus / pipeline audit & planning operators (round-9 extension wave):
referential-integrity audit, interval-union coverage, multi-touch attribution,
difference-in-differences — the data-quality and measurement layer a 100 TB
pipeline runs around its main flow.

Reference scope note: the reference (ksql.js) delegates all SQL to AlaSQL and
has none of these; they follow SURVEY.md §2's [EXT] mandate (training-data
pipeline operators as first-class components).

Determinism: every double goes through the house 1e-6 quantization
(registry.dsum / the trunc-half-up scalar spelling) so Spark and DuckDB agree
bit-for-bit regardless of partition order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ksql_spark.registry import dsum, query, sql_dsum
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
        SELECT o.o_orderkey, o.o_custkey, o.o_orderdate AS open_d,
               MAX(l.l_shipdate) AS close_d
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_custkey, o.o_orderdate
    ), marked AS (
        SELECT o_custkey, open_d, close_d,
               CASE WHEN open_d <= MAX(close_d) OVER (
                        PARTITION BY o_custkey ORDER BY open_d, close_d,
                        o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 0 ELSE 1 END AS new_island
        FROM bounds
    ), islanded AS (
        SELECT o_custkey, open_d, close_d,
               SUM(new_island) OVER (
                   PARTITION BY o_custkey ORDER BY open_d, close_d
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
    bounds = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_custkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("close_d"))
        .withColumnRenamed("o_orderdate", "open_d")
    )
    w_prev = (
        Window.partitionBy("o_custkey")
        .orderBy("open_d", "close_d", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = bounds.select(
        "o_custkey",
        "open_d",
        "close_d",
        F.when(
            F.col("open_d") <= F.max("close_d").over(w_prev), F.lit(0)
        )
        .otherwise(F.lit(1))
        .alias("new_island"),
    )
    w_run = (
        Window.partitionBy("o_custkey")
        .orderBy("open_d", "close_d")
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
