"""SURVEY.md §2.C — joins.

Reference surface: `JOIN … USING uid` (README.md:30) and `LEFT JOIN` (README.md:34)
through AlaSQL exec (ksql.js:159). Catalyst picks broadcast-hash/shuffle-hash/
sort-merge; we only hint broadcast for the fixed-size dims (nation/region).

Scale notes per operator are in the docstrings — every join here either
broadcasts a provably-small side or shuffles on its equi-keys (AQE handles skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ksql_spark.registry import davg, query, sql_davg
from ksql_spark.tables import load


@query(
    "join_inner_using",
    oracle="""
    SELECT o_custkey AS custkey, o_orderkey, c_name
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    ref="SURVEY §2 C1; reference README.md:30 (JOIN … USING uid)",
)
def join_inner_using(spark: SparkSession, sf_dir: str) -> DataFrame:
    """USING-style equi-join (single shared key column in the output)."""
    o = load(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "custkey")
    c = load(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "custkey")
    return o.join(c, "custkey").select("custkey", "o_orderkey", "c_name")


@query(
    "join_left",
    oracle="""
    SELECT c_custkey, CAST(COUNT(big.o_orderkey) AS BIGINT) AS n_big_orders
    FROM customer
    LEFT JOIN (SELECT o_custkey, o_orderkey FROM orders WHERE o_totalprice > 400000) big
           ON c_custkey = big.o_custkey
    GROUP BY c_custkey
    """,
    ref="SURVEY §2 C2; reference README.md:34 (LEFT JOIN … USING)",
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join + count(col) — nulls from non-matches are not counted."""
    c = load(spark, sf_dir, "customer")
    big = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 400000)
        .select("o_custkey", "o_orderkey")
    )
    return (
        c.join(big, c.c_custkey == big.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_big_orders"))
    )


@query(
    "join_right",
    oracle="""
    SELECT c_custkey, big.o_orderkey
    FROM (SELECT o_custkey, o_orderkey FROM orders WHERE o_totalprice > 400000) big
    RIGHT JOIN customer ON big.o_custkey = c_custkey
    """,
    ref="SURVEY §2 C3 (RIGHT OUTER JOIN)",
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    big = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 400000)
        .select("o_custkey", "o_orderkey")
    )
    c = load(spark, sf_dir, "customer")
    return big.join(c, big.o_custkey == c.c_custkey, "right").select(
        "c_custkey", "o_orderkey"
    )


@query(
    "join_full",
    oracle="""
    SELECT hc.nationkey AS cust_nationkey, hs.nationkey AS supp_nationkey,
           hc.n_cust, hs.n_supp
    FROM (SELECT c_nationkey AS nationkey, CAST(COUNT(*) AS BIGINT) AS n_cust
          FROM customer WHERE c_acctbal > 9900 GROUP BY c_nationkey) hc
    FULL OUTER JOIN
         (SELECT s_nationkey AS nationkey, CAST(COUNT(*) AS BIGINT) AS n_supp
          FROM supplier WHERE s_acctbal > 9000 GROUP BY s_nationkey) hs
    ON hc.nationkey = hs.nationkey
    """,
    ref="SURVEY §2 C4 (FULL OUTER JOIN, non-matches on both sides)",
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    hc = (
        c.where(F.col("c_acctbal") > 9900)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_cust"))
    )
    hs = (
        s.where(F.col("s_acctbal") > 9000)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_supp"))
    )
    return hc.join(hs, hc.nationkey == hs.nationkey, "full").select(
        hc.nationkey.alias("cust_nationkey"),
        hs.nationkey.alias("supp_nationkey"),
        "n_cust",
        "n_supp",
    )


@query(
    "join_cross",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
    ref="SURVEY §2 C5 (CROSS JOIN; both sides fixed-size → broadcast NL)",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@query(
    "join_theta",
    oracle="""
    SELECT a.s_suppkey AS suppkey_a, b.s_suppkey AS suppkey_b,
           a.s_acctbal AS bal_a, b.s_acctbal AS bal_b
    FROM supplier a JOIN supplier b
      ON a.s_suppkey < b.s_suppkey AND a.s_acctbal + b.s_acctbal > 19500
    """,
    ref="SURVEY §2 C6 (theta / non-equi join → BroadcastNestedLoopJoin)",
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi join. Supplier is the smallest fact-side table; at scale a pure
    theta join is inherently O(n*m) — Spark broadcasts the smaller side."""
    a = load(spark, sf_dir, "supplier").alias("a")
    b = load(spark, sf_dir, "supplier").alias("b")
    cond = (F.col("a.s_suppkey") < F.col("b.s_suppkey")) & (
        F.col("a.s_acctbal") + F.col("b.s_acctbal") > 19500
    )
    return a.join(b, cond).select(
        F.col("a.s_suppkey").alias("suppkey_a"),
        F.col("b.s_suppkey").alias("suppkey_b"),
        F.col("a.s_acctbal").alias("bal_a"),
        F.col("b.s_acctbal").alias("bal_b"),
    )


@query(
    "join_self",
    oracle="""
    SELECT a.n_name AS name_a, b.n_name AS name_b, a.n_regionkey AS regionkey
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    """,
    ref="SURVEY §2 C7 (self-join via aliases)",
)
def join_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = load(spark, sf_dir, "nation").alias("a")
    b = load(spark, sf_dir, "nation").alias("b")
    cond = (F.col("a.n_regionkey") == F.col("b.n_regionkey")) & (
        F.col("a.n_nationkey") < F.col("b.n_nationkey")
    )
    return a.join(b, cond).select(
        F.col("a.n_name").alias("name_a"),
        F.col("b.n_name").alias("name_b"),
        F.col("a.n_regionkey").alias("regionkey"),
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
    ref="SURVEY §2 C9 (left-semi join; reference spells it EXISTS/IN)",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
    ref="SURVEY §2 C9 (left-anti join; reference spells it NOT EXISTS)",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_natural",
    oracle="""
    SELECT nationkey, n_name, r_name FROM
        (SELECT n_nationkey AS nationkey, n_name, n_regionkey AS regionkey FROM nation)
        NATURAL JOIN
        (SELECT r_regionkey AS regionkey, r_name FROM region)
    """,
    ref="SURVEY §2 C8 [D?] — verified: Spark SQL supports NATURAL JOIN",
)
def join_natural(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "nation").createOrReplaceTempView("v_nation_nat")
    load(spark, sf_dir, "region").createOrReplaceTempView("v_region_nat")
    return spark.sql(
        """
        SELECT nationkey, n_name, r_name FROM
            (SELECT n_nationkey AS nationkey, n_name, n_regionkey AS regionkey
             FROM v_nation_nat)
            NATURAL JOIN
            (SELECT r_regionkey AS regionkey, r_name FROM v_region_nat)
        """
    )


@query(
    "join_range",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate, o_orderdate
    FROM lineitem JOIN orders
      ON l_orderkey = o_orderkey
     AND l_shipdate BETWEEN o_orderdate AND o_orderdate + INTERVAL 90 DAY
    """,
    ref="SURVEY §2 C10 (equi + range band join; hash join on key, band filter)",
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-key + time-band join — stays a hash join (the range is a residual
    filter), so it scales like a normal shuffle join, not a nested loop."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate <= o.o_orderdate + F.expr("INTERVAL 90 DAYS"))
    )
    return li.join(o, cond).select("l_orderkey", "l_linenumber", "l_shipdate", "o_orderdate")


def _asof_tagged(ev: DataFrame) -> DataFrame:
    """Tagged union shared by the as-of join family (backward / forward /
    nearest): views carry side=0, purchases side=1, so views sort BEFORE
    purchases at equal ts in BOTH scan directions — the inclusive <= / >=
    boundary convention lives here, in exactly one place."""
    views = ev.where(F.col("event_type") == "view").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.lit(0).alias("side"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(1).alias("side")
    )
    return views.unionByName(purchases)


def _asof_window(direction: str):
    """Per-user full-history frame for one as-of direction: 'back' scans ts
    ascending (last view <= current), 'fwd' descending (last view >= current);
    `side` is the equal-ts tiebreak in both."""
    order = ["ts", "side"] if direction == "back" else [F.col("ts").desc(), "side"]
    return (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )


def _asof_view_ts():
    """The carried value: the most recent view-side ts in scan order.
    (A function, not a module constant — building a Column needs an active
    SparkContext, which doesn't exist at import time.)"""
    return F.when(F.col("side") == 0, F.col("ts"))


@query(
    "join_asof",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts AS purchase_ts, v.ts AS asof_view_ts
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN
         (SELECT user_id, ts FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    """,
    ref="SURVEY §2 C10 (as-of join; Spark lacks it natively — union+window impl)",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, Spark-first: union both sides tagged, one window pass carries
    the latest right-side timestamp forward per key.

    Scale: ONE shuffle on (user_id) and a sequential window scan — no row
    explosion, no O(n*m) nested loop, no driver-side merge_asof. This is the
    100 TB-safe formulation (a pandas merge_asof per group would need the whole
    key group in one worker's memory; this streams).
    """
    ev = load(spark, sf_dir, "events")
    tagged = _asof_tagged(ev).withColumn(
        "asof_view_ts",
        F.last(_asof_view_ts(), ignorenulls=True).over(_asof_window("back")),
    )
    return (
        tagged.where(F.col("side") == 1)
        .select("event_id", "user_id", F.col("ts").alias("purchase_ts"), "asof_view_ts")
    )


@query(
    "join_asof_forward",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts AS purchase_ts, v.ts AS next_view_ts
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN
         (SELECT user_id, ts FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND v.ts >= p.ts
    """,
    ref="SURVEY §2 C10 [EXT] (FORWARD as-of join — the earliest right-side "
    "row at-or-after each left row; pandas merge_asof direction='forward'. "
    "Same union+window plan as join_asof with the scan order reversed)",
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each purchase matched with the user's FIRST view at or
    after it (the 'what did they do next' direction; join_asof is backward).

    Scale: identical to join_asof — ONE user_id shuffle, one sequential
    window scan ordered ts DESC so last(view_ts) carries the SMALLEST
    view ts >= purchase ts; views sort before purchases at equal ts for the
    inclusive >= semantics. No row explosion at any SF."""
    ev = load(spark, sf_dir, "events")
    tagged = _asof_tagged(ev).withColumn(
        "next_view_ts",
        F.last(_asof_view_ts(), ignorenulls=True).over(_asof_window("fwd")),
    )
    return (
        tagged.where(F.col("side") == 1)
        .select("event_id", "user_id", F.col("ts").alias("purchase_ts"), "next_view_ts")
    )


@query(
    "join_asof_nearest",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
         b AS (
             SELECT p.event_id, v.ts AS back_ts
             FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts
         ),
         f AS (
             SELECT p.event_id, v.ts AS fwd_ts
             FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts >= p.ts
         )
    SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
           CASE WHEN back_ts IS NULL THEN fwd_ts
                WHEN fwd_ts IS NULL THEN back_ts
                WHEN (p.ts - back_ts) <= (fwd_ts - p.ts) THEN back_ts
                ELSE fwd_ts END AS nearest_view_ts
    FROM p JOIN b USING (event_id) JOIN f USING (event_id)
    """,
    ref="SURVEY §2 C10 [EXT] (NEAREST as-of join — pandas merge_asof "
    "direction='nearest': closest right-side row in either direction, ties "
    "to the backward match. Completes the backward/forward/nearest triple)",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of: each purchase matched with the user's temporally
    CLOSEST view, looking both directions; equidistant candidates resolve
    to the backward (at-or-before) match, pandas merge_asof's tie rule.

    Scale: still ONE user_id shuffle — both directional candidates come
    from the same tagged union, via two window passes that share the
    exchange (same partitioning, opposite sort orders), then a per-row
    interval comparison picks the winner. No row explosion, no second
    shuffle, no driver-side merge."""
    ev = load(spark, sf_dir, "events")
    tagged = (
        _asof_tagged(ev)
        .withColumn(
            "back_ts",
            F.last(_asof_view_ts(), ignorenulls=True).over(_asof_window("back")),
        )
        .withColumn(
            "fwd_ts",
            F.last(_asof_view_ts(), ignorenulls=True).over(_asof_window("fwd")),
        )
    )
    nearest = (
        F.when(F.col("back_ts").isNull(), F.col("fwd_ts"))
        .when(F.col("fwd_ts").isNull(), F.col("back_ts"))
        .when(
            (F.col("ts") - F.col("back_ts")) <= (F.col("fwd_ts") - F.col("ts")),
            F.col("back_ts"),
        )
        .otherwise(F.col("fwd_ts"))
    )
    return tagged.where(F.col("side") == 1).select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        nearest.alias("nearest_view_ts"),
    )


@query(
    "join_lateral",
    oracle="""
    SELECT n_name, l.top_bal
    FROM nation, LATERAL (
        SELECT max(c_acctbal) AS top_bal
        FROM customer WHERE c_nationkey = n_nationkey
    ) l
    """,
    ref="SURVEY §2 C family [EXT] (correlated LATERAL subquery — Spark 3.2+ "
    "decorrelates it into a join, so the per-row subquery never executes "
    "row-at-a-time; same text runs in DuckDB)",
)
def join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Highest customer balance per nation via LATERAL. Catalyst rewrites the
    correlated subquery into an aggregate + join (decorrelation), so the plan
    is a hash agg + broadcast join — not N executions of the inner query."""
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT n_name, l.top_bal
        FROM {n}, LATERAL (
            SELECT max(c_acctbal) AS top_bal
            FROM {c} WHERE c_nationkey = n_nationkey
        ) l
        """,
        n=n, c=c,
    )


@query(
    "join_interval_attribution",
    oracle="""
    SELECT v.user_id,
           v.event_id AS view_id,
           b.event_id AS buy_id,
           b.value AS buy_value
    FROM events v JOIN events b
      ON v.user_id = b.user_id
     AND v.event_type = 'view' AND b.event_type = 'purchase'
     AND b.ts >= v.ts AND b.ts <= v.ts + INTERVAL 1 HOUR
    """,
    ref="SURVEY §2 C10/I9 (interval attribution join, batch form — the exact "
    "expression streaming/jobs.py:view_purchase_join runs under readStream "
    "with watermarks; batch/stream agreement is tested in test_streaming.py)",
)
def join_interval_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each view matched with the same user's purchases in the next hour.
    Plan: one shuffle on user_id + range condition as a post-join filter; at
    scale the time bound is what keeps the per-key match set small."""
    ev = load(spark, sf_dir, "events")
    v = ev.where(F.col("event_type") == "view").alias("v")
    b = ev.where(F.col("event_type") == "purchase").alias("b")
    return v.join(
        b,
        (F.col("v.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") >= F.col("v.ts"))
        & (F.col("b.ts") <= F.col("v.ts") + F.expr("INTERVAL 1 HOUR")),
    ).select(
        F.col("v.user_id").alias("user_id"),
        F.col("v.event_id").alias("view_id"),
        F.col("b.event_id").alias("buy_id"),
        F.col("b.value").alias("buy_value"),
    )


@query(
    "join_null_safe",
    oracle="""
    WITH a AS (
        SELECT NULLIF(event_type, 'view') AS k,
               CAST(COUNT(*) AS BIGINT) AS n_a
        FROM events GROUP BY k
    ),
    b AS (
        SELECT NULLIF(event_type, 'view') AS k,
               CAST(COUNT(*) AS BIGINT) AS n_b
        FROM events WHERE user_id % 2 = 0 GROUP BY k
    )
    SELECT a.k, a.n_a, b.n_b
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
    ref="SURVEY §2 C1/C6 (null-safe equality join: Spark `<=>` vs ANSI "
    "IS NOT DISTINCT FROM — NULL keys MATCH each other instead of silently "
    "dropping, the standard trap when a join key is derived via NULLIF / "
    "failed parses)",
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join two aggregates on a deliberately-nullable key with eqNullSafe:
    the NULL group survives the join (a plain `=` would drop it).

    Plan note: `<=>` still hash-partitions both sides on the key (NULL
    hashes to a bucket like any value), so the join stays a hash join —
    no fallback to nested-loop. Same at any scale."""
    ev = load(spark, sf_dir, "events")
    k = F.expr("NULLIF(event_type, 'view')")
    a = ev.groupBy(k.alias("k")).agg(F.count("*").alias("n_a"))
    b = (
        ev.where(F.col("user_id") % 2 == 0)
        .groupBy(k.alias("kb"))
        .agg(F.count("*").alias("n_b"))
    )
    return (
        a.join(b, F.col("k").eqNullSafe(F.col("kb")))
        .select("k", "n_a", "n_b")
    )


#: Salt fan-out for the skew-join demonstration (cluster guidance: pick the
#: hot key's row count / target-partition-size; 8-16 is typical).
SALT_N = 8


@query(
    "join_salted_skew",
    oracle=f"""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(user_avg) AS user_avg
    FROM events
    JOIN (SELECT user_id AS du, {sql_davg('value')} AS user_avg
          FROM events GROUP BY du) d
      ON user_id = du
    GROUP BY user_id
    """,
    ref="SURVEY §2 C1/D3 (salted skew join: fact side salts the key, dim "
    "side replicates x SALT_N so a hot key spreads over SALT_N reducers — "
    "the manual form of AQE's skew-join splitting, usable when the skewed "
    "side is a JOIN input rather than a shuffle AQE can see)",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event counts joined with per-user average value, executed as
    a salted join: fact key (user_id, salt = event_id mod 8), dim rows
    replicated across all 8 salts. Result is IDENTICAL to the unsalted join
    (the oracle spells the plain form) — the salt only changes partitioning.

    Scale shape: a hot user's rows land in 8 different reduce partitions
    instead of one; the dim replication is x8 on the SMALL side only. The
    final re-aggregation on user_id restores per-key totals."""
    ev = load(spark, sf_dir, "events")
    dim = ev.groupBy(F.col("user_id").alias("du")).agg(
        davg("value").alias("user_avg")
    )
    fact = ev.withColumn("_salt", F.pmod(F.col("event_id"), F.lit(SALT_N)))
    dim_rep = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(SALT_N)]))
    )
    return (
        fact.join(
            dim_rep,
            (F.col("user_id") == F.col("du")) & (fact["_salt"] == dim_rep["_salt"]),
        )
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.min("user_avg").alias("user_avg"))
    )


#: (session, sf_dir) pairs whose bucketed tables already exist this session.
_BUCKETED: set = set()


def _ensure_bucketed(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write bucketed+sorted copies of orders/customer ONCE per session+dir
    (8 buckets on the join key). This is the ingest-side investment that buys
    shuffle-free joins forever after — the Spark-native analog of a
    co-partitioned table layout."""
    import hashlib

    # stable across processes (hash() is PYTHONHASHSEED-salted, which would
    # mint new table names — and warehouse litter — every run)
    tag = int(hashlib.md5(sf_dir.encode()).hexdigest()[:8], 16)
    ot, ct = f"bkt_orders_{tag}", f"bkt_customer_{tag}"
    key = (id(spark), sf_dir)
    # fast path only when BOTH tables still exist — tests (and users) can
    # drop one externally, and returning a name for a missing table would
    # fail later at analysis time inside the join builder
    if (
        key in _BUCKETED
        and spark.catalog.tableExists(ot)
        and spark.catalog.tableExists(ct)
    ):
        return ot, ct
    # A previous PROCESS may have left the warehouse directories behind while
    # this session's (in-memory) catalog has no table entry — saveAsTable then
    # fails with LOCATION_ALREADY_EXISTS. These paths are exclusively ours
    # (bkt_* + sf-dir digest), so clearing stale ones is safe.
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in (ot, ct):
        if not spark.catalog.tableExists(t):
            shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    (
        load(spark, sf_dir, "orders")
        .write.bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(ot)
    )
    (
        load(spark, sf_dir, "customer")
        .write.bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(ct)
    )
    _BUCKETED.add(key)
    return ot, ct


@query(
    "join_bucketed_colocated",
    oracle="""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    ref="SURVEY §2 A6/C1 + §4.3 (bucketed co-located join: both tables "
    "bucketed+sorted on the join key at write time -> SortMergeJoin with "
    "ZERO exchanges and ZERO sorts at read time; the physical layout "
    "strategy for repeatedly-joined 100 TB tables)",
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders⋈customer via 8-bucket co-located layout, then a small
    re-aggregation by segment (the only exchange in the plan).

    The MERGE hint pins SortMergeJoin so the gate proves the bucket layout
    (not a broadcast) is what removed the exchanges: bucket count matches on
    both sides, sortBy matches the join key, so neither side shuffles OR
    sorts (test_plans.py:test_bucketed_join_no_exchange_no_sort)."""
    ot, ct = _ensure_bucketed(spark, sf_dir)
    o = spark.table(ot)
    c = spark.table(ct)
    return (
        o.hint("merge")
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"))
    )


@query(
    "join_fuzzy_blocked",
    oracle="""
    WITH p AS (
        SELECT p_partkey, p_name,
               split_part(p_name, ' ', 1) AS blk_word, p_size
        FROM part
    )
    SELECT a.p_partkey AS partkey_a, b.p_partkey AS partkey_b,
           a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
    FROM p a JOIN p b
      ON a.blk_word = b.blk_word AND a.p_size = b.p_size
     AND a.p_partkey < b.p_partkey
     AND levenshtein(a.p_name, b.p_name) <= 3
    """,
    ref="SURVEY §2 C14 [EXT] (blocked fuzzy join / record linkage: "
    "edit-distance matching made tractable by equi-key blocking — the "
    "standard entity-resolution shape; Levenshtein is identical classic "
    "edit distance in Spark and DuckDB)",
)
def join_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage: near-identical part names within (first-word, size)
    blocks, Levenshtein <= 3.

    Scale shape: a naive fuzzy join is O(n²) string comparisons — never
    materialized here. The EQUI part of the join condition (block word +
    exact size) hashes both sides, so Catalyst plans a plain hash/SMJ on
    the block key and evaluates levenshtein only WITHIN co-partitioned
    blocks; pair space is sum(|block|²), bounded because the block key is
    (bounded first-token vocabulary × bounded size domain). The skew
    diagnostic for oversized blocks is `graph_degree_distribution`'s
    histogram shape (SURVEY L6); production multi-pass linkage adds a
    second blocking key rather than widening a block. The `a < b` and
    distance predicates ride along as join residuals — no post-filter scan
    of a wider pair set (plan-gated: single equi-join, no
    CartesianProduct / BroadcastNestedLoop)."""
    p = load(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("blk_word"),
        "p_size",
    )
    a = p.select(
        F.col("p_partkey").alias("partkey_a"),
        F.col("p_name").alias("name_a"),
        "blk_word",
        "p_size",
    )
    b = p.select(
        F.col("p_partkey").alias("partkey_b"),
        F.col("p_name").alias("name_b"),
        "blk_word",
        "p_size",
    )
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        a.join(
            b,
            on=[
                a["blk_word"] == b["blk_word"],
                a["p_size"] == b["p_size"],
                F.col("partkey_a") < F.col("partkey_b"),
                dist <= 3,
            ],
        )
        .select(
            "partkey_a",
            "partkey_b",
            "name_a",
            "name_b",
            dist.cast("int").alias("edit_dist"),
        )
    )


@query(
    "join_cardinality_estimate",
    oracle="""
    WITH ok AS (
        SELECT CAST(o_orderkey AS VARCHAR) AS w
        FROM orders WHERE o_orderpriority = '1-URGENT'
    ), lk AS (
        SELECT CAST(l_orderkey AS VARCHAR) AS w FROM lineitem
    ), oj AS (SELECT w, unnest([0, 1, 2, 3]) AS j FROM ok),
    lj AS (SELECT w, unnest([0, 1, 2, 3]) AS j FROM lk),
    ska AS (
        SELECT j, ('0x' || substr(md5(w), 1 + 8 * j, 8))::BIGINT % 512 AS pos,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM oj GROUP BY 1, 2
    ), skb AS (
        SELECT j, ('0x' || substr(md5(w), 1 + 8 * j, 8))::BIGINT % 512 AS pos,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM lj GROUP BY 1, 2
    ), prod AS (
        SELECT a.j, CAST(SUM(a.cnt * b.cnt) AS BIGINT) AS ip
        FROM ska a JOIN skb b ON a.j = b.j AND a.pos = b.pos
        GROUP BY a.j
    ), est AS (SELECT MIN(ip) AS estimate_rows FROM prod),
    exact AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS exact_rows
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderpriority = '1-URGENT'
    )
    SELECT exact_rows, estimate_rows,
           estimate_rows >= exact_rows AS one_sided_ok
    FROM exact, est
    """,
    ref="SURVEY §2 C15 [EXT] (join cardinality estimation via Count-Min "
    "inner product: |A join B| on a key = <f_A, f_B> frequency-vector "
    "inner product, upper-bounded by min over CMS rows of the counter "
    "inner products (Cormode & Muthukrishnan 2005) — the sketch an "
    "optimizer consults BEFORE committing a join order or a broadcast "
    "decision; one-sidedness structural and asserted in the output)",
)
def join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimate the urgent-orders x lineitem join size from two 4x512
    Count-Min sketches WITHOUT running the join, next to the exact count
    (here the oracle proof runs both; an optimizer would run only the
    sketch side). Estimate = min over hash rows of the counter-vector
    inner product — an upper bound on the true inner product, the
    standard CMS join-size bound.

    Scale shape: each side collapses to a <= 2048-row sketch in one
    map-side-combined agg (key strings hash; no join executes to
    estimate); the inner product joins two 2048-row grids. Sketches are
    the SUM-mergeable kind, so per-shard/per-partition sketches combine
    — a catalog can maintain them incrementally (run_cms_sink) and
    answer join-size queries for any key pair in O(d*w). The exact
    branch exists for the cross-engine proof and the one-sided gate.
    Accuracy scales with width: expected overcount per row is
    ~|A|*|B|/w, so the demo's w=512 is deliberately loose at sf0.01
    (~30x) — an optimizer sizes w to the key cardinality (w ~ 1/eps),
    trading the same sketch rows for a tighter bound."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    from ksql_spark.queries.llm import cms_sketch

    urgent = o.where(F.col("o_orderpriority") == "1-URGENT")
    ska = cms_sketch(
        urgent.select(F.col("o_orderkey").cast("string").alias("w"))
    )
    skb = cms_sketch(li.select(F.col("l_orderkey").cast("string").alias("w")))
    prod = (
        ska.alias("a")
        .join(skb.alias("b"), ["j", "pos"])
        .groupBy("j")
        .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).alias("ip"))
    )
    est = prod.agg(F.min("ip").alias("estimate_rows"))
    exact = (
        urgent.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .agg(F.count("*").alias("exact_rows"))
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "exact_rows",
        "estimate_rows",
        (F.col("estimate_rows") >= F.col("exact_rows")).alias("one_sided_ok"),
    )


_ER_PAIR_SQL = """
    SELECT a.p_partkey AS pa, b.p_partkey AS pb
    FROM (SELECT p_partkey, p_name,
                 split_part(p_name, ' ', 1) AS blk_word, p_size FROM part) a
    JOIN (SELECT p_partkey, p_name,
                 split_part(p_name, ' ', 1) AS blk_word, p_size FROM part) b
      ON a.blk_word = b.blk_word AND a.p_size = b.p_size
     AND a.p_partkey < b.p_partkey
     AND levenshtein(a.p_name, b.p_name) <= 3
"""


@query(
    "er_resolve_parts",
    oracle=f"""
    WITH pairs AS MATERIALIZED ({_ER_PAIR_SQL}),
    sym AS MATERIALIZED (
        SELECT pa AS s1, pb AS s2 FROM pairs
        UNION SELECT pb, pa FROM pairs
        UNION SELECT pa, pa FROM pairs
        UNION SELECT pb, pb FROM pairs
    ),
    reach AS (
        WITH RECURSIVE r(a, b) AS (
            SELECT s1, s2 FROM sym
            UNION
            SELECT r.a, sym.s2 FROM r JOIN sym ON sym.s1 = r.b
        ) SELECT a, b FROM r
    ),
    labels AS (
        SELECT a AS p_partkey, MIN(b) AS entity_id FROM reach GROUP BY a
    )
    SELECT p.p_partkey,
           COALESCE(l.entity_id, p.p_partkey) AS entity_id,
           p.p_partkey = COALESCE(l.entity_id, p.p_partkey) AS is_canonical
    FROM part p LEFT JOIN labels l USING (p_partkey)
    """,
    ref="SURVEY §2 C16 [EXT] (entity resolution end-to-end: C14's "
    "block+match pairs chained through connected components (L2) into "
    "transitive entity ids — the complete Fellegi-Sunter-shaped ER "
    "pipeline (block, compare, CLUSTER), because pairwise matches alone "
    "leave A~B~C unresolved; oracle = recursive transitive closure over "
    "the identical pair graph, the llm_dedup_cluster_portable technique)",
)
def er_resolve_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every part mapped to a transitive entity id (min partkey of its
    fuzzy-match component) with a canonical flag — the table an ER
    pipeline actually ships. Match rule = the C14 blocked Levenshtein
    join; chains (A~B, B~C, never A~C) land in ONE entity, which is the
    point of the clustering step.

    Scale shape: pairs inherit C14's blocked-equi-join posture;
    components run min-label propagation with O(nodes) state and one
    node-keyed shuffle per round, rounds ~ component diameter — fuzzy-dup
    components are shallow (name variants of one product), so
    convergence is fast and ASSERTED (connected_components raises rather
    than returning split entities). Singletons never enter the
    propagation: they fall out of the final left join at zero cost."""
    from ksql_spark.queries.graph import connected_components

    p = load(spark, sf_dir, "part")
    pairs = join_fuzzy_blocked(spark, sf_dir).select(
        F.col("partkey_a").alias("pa"), F.col("partkey_b").alias("pb")
    )
    adj = (
        pairs.select(F.col("pa").alias("s1"), F.col("pb").alias("s2"))
        .unionByName(pairs.select(F.col("pb").alias("s1"), F.col("pa").alias("s2")))
        .unionByName(pairs.select(F.col("pa").alias("s1"), F.col("pa").alias("s2")))
        .unionByName(pairs.select(F.col("pb").alias("s1"), F.col("pb").alias("s2")))
        .distinct()
        .localCheckpoint()
    )
    labels = connected_components(adj).select(
        F.col("suppkey").alias("p_partkey"), F.col("component").alias("entity_id")
    )
    return p.select("p_partkey").join(labels, "p_partkey", "left").select(
        "p_partkey",
        F.coalesce(F.col("entity_id"), F.col("p_partkey")).alias("entity_id"),
        (
            F.col("p_partkey")
            == F.coalesce(F.col("entity_id"), F.col("p_partkey"))
        ).alias("is_canonical"),
    )


@query(
    "join_asof_tolerance",
    oracle="""
    WITH b AS (
        SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
               v.ts AS asof_view_ts
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase') p
        ASOF LEFT JOIN
             (SELECT user_id, ts FROM events
              WHERE event_type = 'view') v
          ON p.user_id = v.user_id AND v.ts <= p.ts
    )
    SELECT event_id, user_id, purchase_ts,
           CASE WHEN asof_view_ts IS NOT NULL
                     AND purchase_ts - asof_view_ts <= INTERVAL 2 DAY
                THEN asof_view_ts END AS asof_view_ts
    FROM b
    """,
    ref="SURVEY §2 C10 [EXT] (as-of join with tolerance — pandas "
    "merge_asof's `tolerance` parameter: a backward match older than "
    "the cutoff is a NON-match, the stale-quote guard in market-data "
    "and attribution joins; same one-shuffle union+window plan as "
    "join_asof with a gap post-filter)",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of with a 2-day staleness tolerance: each purchase
    takes the user's latest view at-or-before it ONLY if that view is
    within 2 days — an older view is treated as no context, not stale
    context (NULL, matching merge_asof tolerance semantics).

    Scale: identical plan to join_asof — ONE user_id shuffle, one
    sequential window carry, then a narrow row-local gap comparison.
    The tolerance never becomes a range-join explosion because the
    candidate is already unique per row before the gap test."""
    ev = load(spark, sf_dir, "events")
    tagged = _asof_tagged(ev).withColumn(
        "asof_view_ts_raw",
        F.last(_asof_view_ts(), ignorenulls=True).over(_asof_window("back")),
    )
    within = F.col("asof_view_ts_raw") >= F.col("ts") - F.expr(
        "INTERVAL 2 DAY"
    )
    return tagged.where(F.col("side") == 1).select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.when(
            F.col("asof_view_ts_raw").isNotNull() & within,
            F.col("asof_view_ts_raw"),
        ).alias("asof_view_ts"),
    )


@query(
    "join_pit_state",
    oracle="""
    WITH state AS (
        SELECT user_id, event_type AS state, ts AS valid_from,
               LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS valid_to
        FROM events WHERE event_type <> 'purchase'
    ), spine AS (
        SELECT event_id AS buy_id, user_id, ts
        FROM events WHERE event_type = 'purchase'
    )
    SELECT sp.buy_id, sp.user_id,
           st.state AS prior_state,
           CAST(epoch_us(sp.ts) - epoch_us(st.valid_from) AS BIGINT)
               AS state_age_us
    FROM spine sp LEFT JOIN state st
      ON sp.user_id = st.user_id
     AND st.valid_from <= sp.ts
     AND (st.valid_to IS NULL OR sp.ts < st.valid_to)
    """,
    ref="SURVEY §2 C17 [EXT] (point-in-time / SCD2 state join: non-"
    "purchase events become validity intervals via LEAD, each purchase "
    "joins the ONE interval containing its timestamp — the feature-"
    "store correctness pattern that prevents label leakage (features "
    "strictly as-of the label time, never after); intervals partition "
    "time per user so the match is provably unique, pinned in "
    "tests/test_properties.py)",
)
def join_pit_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What state was the user in when they purchased: build an SCD2-
    style interval table (state = last non-purchase action, validity
    [ts, next-ts)) and point-in-time join every purchase into it. A
    purchase before the user's first state row keeps NULLs (LEFT join)
    — the honest cold-start answer, not a leaked future value. Ages
    are exact integer microseconds.

    Scale shape: the interval build is one user_id-partitioned LEAD
    window; the PIT join is user_id-keyed (both sides shuffle once on
    the same key — co-partitioned) with the containment predicate as a
    post-join residual; per-user match fan-in is bounded by that
    user's interval count, and exactly one interval survives per
    purchase. The classic unbounded-range-join trap never appears
    because the equality key carries the join."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    state = (
        ev.where(F.col("event_type") != "purchase")
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
        )
    )
    state = state.alias("st")
    spine = (
        ev.where(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("buy_id"), "user_id", "ts")
        .alias("sp")
    )
    cond = (
        (F.col("sp.user_id") == F.col("st.user_id"))
        & (F.col("st.valid_from") <= F.col("sp.ts"))
        & (
            F.col("st.valid_to").isNull()
            | (F.col("sp.ts") < F.col("st.valid_to"))
        )
    )
    us = lambda c: F.unix_micros(c.cast("timestamp"))
    return spine.join(state, cond, "left").select(
        "buy_id",
        F.col("sp.user_id").alias("user_id"),
        F.col("st.state").alias("prior_state"),
        (us(F.col("sp.ts")) - us(F.col("st.valid_from")))
        .cast("bigint")
        .alias("state_age_us"),
    )
