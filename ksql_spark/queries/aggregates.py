"""SURVEY.md §2.D — aggregations.

Reference surface: COUNT(*) (README.md:21), GROUP BY + count (README.md:26);
the rest of the family is AlaSQL-delegated [D]. All hash aggregations get
partial+final (map-side combine) from Spark automatically.

Determinism: double reductions use scaled-long accumulation (registry.dsum);
variance/stddev are computed from exact moments so partition order can't leak
into low bits (SURVEY §5.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ksql_spark.registry import (davg, dsum, dsum1, query, sql_davg,
                                 sql_dsum, sql_dsum1)
from ksql_spark.tables import load


@query(
    "agg_count_star",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM part WHERE p_name LIKE 'red%'
    """,
    ref="SURVEY §2 D1; reference README.md:21 (select count(*) … LIKE)",
)
def agg_count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.where(F.col("p_name").like("red%")).agg(F.count("*").alias("cnt"))


@query(
    "agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(l_partkey) AS BIGINT) AS n_lines,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_part
    FROM lineitem GROUP BY l_returnflag
    """,
    ref="SURVEY §2 D2 (COUNT(col), COUNT(DISTINCT) — Catalyst expand rewrite)",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("l_partkey").alias("n_lines"),
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
    )


@query(
    "agg_group_by",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
    ref="SURVEY §2 D3; reference README.md:26 (GROUP BY + count)",
)
def agg_group_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


@query(
    "agg_basic",
    oracle=f"""
    SELECT c_mktsegment,
           {sql_dsum('c_acctbal')} AS sum_bal,
           {sql_davg('c_acctbal')} AS avg_bal,
           MIN(c_acctbal) AS min_bal,
           MAX(c_acctbal) AS max_bal
    FROM customer GROUP BY c_mktsegment
    """,
    ref="SURVEY §2 D4 (SUM/AVG/MIN/MAX)",
)
def agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        dsum("c_acctbal").alias("sum_bal"),
        davg("c_acctbal").alias("avg_bal"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
    )


@query(
    "agg_minby",
    oracle="""
    SELECT user_id,
           arg_min(event_id, ts) AS first_event_id,
           arg_max(event_id, ts) AS last_event_id
    FROM events GROUP BY user_id
    """,
    ref="SURVEY §2 D5 (deterministic FIRST/LAST via min_by/max_by; ksql.js era "
    "FIRST/LAST were order-dependent — SURVEY §4.3)",
)
def agg_minby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AlaSQL FIRST/LAST depend on row order; min_by/max_by over the event time
    is the deterministic Spark-native equivalent (ts is unique per the fixture)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.min_by("event_id", "ts").alias("first_event_id"),
        F.max_by("event_id", "ts").alias("last_event_id"),
    )


@query(
    "agg_collect",
    oracle="""
    SELECT n_regionkey, array_to_string(list_sort(list(n_name)), ',') AS nations
    FROM nation GROUP BY n_regionkey
    """,
    ref="SURVEY §2 D6 (collect_list; array_sort'ed for order-insensitive compare; "
    "joined to one string because the driver's canonicalizer cannot hash an "
    "array column — round-1 CORRECTNESS err 'unhashable type: list')",
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations")
    )


@query(
    "agg_stats",
    oracle=f"""
    SELECT l_returnflag,
           ({sql_dsum('l_quantity * l_quantity')}
            - ({sql_dsum('l_quantity')}) * ({sql_dsum('l_quantity')}) / COUNT(l_quantity))
           / (COUNT(l_quantity) - 1) AS var_qty,
           sqrt(({sql_dsum('l_quantity * l_quantity')}
            - ({sql_dsum('l_quantity')}) * ({sql_dsum('l_quantity')}) / COUNT(l_quantity))
           / (COUNT(l_quantity) - 1)) AS stddev_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    ref="SURVEY §2 D7 (VAR/STDEV — exact-moment formulation for bitwise parity; "
    "engine users would call F.var_samp/F.stddev_samp directly)",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance/stddev from exact moments (sum, sum-of-squares as scaled
    longs) so the result is independent of partitioning — Welford-style built-ins
    (F.var_samp) are order-sensitive in the last bits and can't be hash-compared."""
    li = load(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    n = F.count(q)
    s = dsum(q)
    ss = dsum(q * q)
    # try_divide: a group with 0 or 1 non-null quantities has n or n-1 = 0,
    # and Spark 4's default ANSI mode aborts the JOB on plain division by
    # zero; NULL variance matches DuckDB's x/0 = NULL.
    var = F.try_divide(ss - F.try_divide(s * s, n), n - 1)
    return li.groupBy("l_returnflag").agg(
        var.alias("var_qty"), F.sqrt(var).alias("stddev_qty")
    )


@query(
    "agg_median",
    oracle="""
    SELECT l_returnflag, median(l_quantity) AS med_qty,
           quantile_cont(l_quantity, 0.9) AS p90_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    ref="SURVEY §2 D8 (MEDIAN / continuous percentile)",
)
def agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.median("l_quantity").alias("med_qty"),
        F.percentile("l_quantity", F.lit(0.9)).alias("p90_qty"),
    )


@query(
    "agg_having",
    oracle="""
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
    """,
    ref="SURVEY §2 D9 (HAVING = post-aggregation filter)",
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .where(F.col("n_orders") >= 15)
    )


@query(
    "agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    ref="SURVEY §2 D10 (ROLLUP)",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"), F.count("*").alias("n_lines")
    )


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    ref="SURVEY §2 D11 (CUBE)",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders")
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    ref="SURVEY §2 D12 (GROUPING SETS via Spark SQL)",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
        FROM v_orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "agg_group_expr",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY order_year
    """,
    ref="SURVEY §2 D13 (GROUP BY computed expression)",
)
def agg_group_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy(F.year("o_orderdate").alias("order_year")).agg(
        F.count("*").alias("n_orders")
    )


@query(
    "agg_string_concat",
    oracle="""
    SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations_csv
    FROM nation GROUP BY n_regionkey
    """,
    ref="SURVEY §2 D6 (string aggregation with pinned order — "
    "concat_ws over a sorted collect_list)",
)
def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations_csv")
    )


@query(
    "agg_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric, val
    FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
          FROM lineitem)
    UNPIVOT (val FOR metric IN (l_quantity, l_discount, l_tax))
    """,
    ref="SURVEY §2 D [EXT] (UNPIVOT/melt — wide→long reshape, "
    "DataFrame.unpivot; the inverse of agg_pivot)",
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
        "metric",
        "val",
    )


@query(
    "agg_mode",
    oracle="""
    SELECT o_orderpriority, o_orderstatus AS mode_status FROM (
        SELECT o_orderpriority, o_orderstatus,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY COUNT(*) DESC, o_orderstatus) AS rn
        FROM orders GROUP BY o_orderpriority, o_orderstatus
    ) WHERE rn = 1
    """,
    ref="SURVEY §2 D [EXT] (MODE with a deterministic tie-break — built-in "
    "F.mode breaks ties arbitrarily, so it can't be hash-compared)",
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent order status per priority; ties broken by smallest value
    (max count, then lexicographically first status) in BOTH engines."""
    o = load(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderpriority", "o_orderstatus").agg(F.count("*").alias("cnt"))
    return counts.groupBy("o_orderpriority").agg(
        F.min_by(
            "o_orderstatus", F.struct(-F.col("cnt"), F.col("o_orderstatus"))
        ).alias("mode_status")
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(COALESCE(COUNT(*) FILTER (WHERE o_orderstatus = 'F'), 0) AS BIGINT) AS F,
           CAST(COALESCE(COUNT(*) FILTER (WHERE o_orderstatus = 'O'), 0) AS BIGINT) AS O,
           CAST(COALESCE(COUNT(*) FILTER (WHERE o_orderstatus = 'P'), 0) AS BIGINT) AS P
    FROM orders GROUP BY o_orderpriority
    """,
    ref="SURVEY §2 D [EXT] (PIVOT — df.groupBy().pivot(); oracle via "
    "conditional aggregation)",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
    )


@query(
    "agg_approx_distinct",
    # The HLL sketch value differs engine-to-engine, so the oracle checks a
    # tolerance instead: Spark emits whether its estimate is within 5% of the
    # exact distinct count; DuckDB asserts that flag must be TRUE (plus the
    # exact row count). A >5%-off sketch hash-mismatches and fails the row.
    oracle="""
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_lines,
           TRUE AS approx_within_tol
    FROM lineitem GROUP BY l_returnflag
    """,
    ref="SURVEY §2 D14 [EXT] (approx_count_distinct — the 100 TB path for "
    "distinct counts; exact countDistinct shuffles an Expand of every value. "
    "rsd=0.02 makes the 5% tolerance hold with overwhelming probability)",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production form is the approx aggregate ALONE (sketch merge, no Expand).
    The exact count_distinct alongside it exists purely to make this entry
    driver-checkable (the tolerance flag needs both numbers in one plan) and
    runs at oracle scale only — it is the anti-pattern the approx path
    replaces, not part of the operator."""
    li = load(spark, sf_dir, "lineitem")
    approx = F.approx_count_distinct("l_partkey", rsd=0.02)
    exact = F.count_distinct("l_partkey")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_lines"),
        (F.abs(approx - exact) / exact < F.lit(0.05)).alias("approx_within_tol"),
    )


@query(
    "agg_corr",
    oracle=f"""
    SELECT l_returnflag,
           CAST(CAST(trunc(
               (COUNT(*) * ({sql_dsum1('l_quantity * l_extendedprice')})
                - ({sql_dsum1('l_quantity')}) * ({sql_dsum1('l_extendedprice')}))
               / (sqrt(COUNT(*) * ({sql_dsum1('l_quantity * l_quantity')})
                       - ({sql_dsum1('l_quantity')}) * ({sql_dsum1('l_quantity')}))
                  * sqrt(COUNT(*) * ({sql_dsum1('l_extendedprice * l_extendedprice')})
                         - ({sql_dsum1('l_extendedprice')}) * ({sql_dsum1('l_extendedprice')})))
               * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0 AS corr_qty_price
    FROM lineitem GROUP BY l_returnflag
    """,
    ref="SURVEY §2 D7 family [EXT] (Pearson correlation from integer-quantized "
    "moments (dsum1 — the 1e6 scale would overflow long on price² sums), "
    "result quantized to 6 decimals — F.corr's Welford streaming update is "
    "partition-order-sensitive in the last bits and cannot be hash-compared; "
    "engine users would call F.corr directly)",
)
def agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson r between quantity and price per returnflag, moment form:
    (n·Σxy − Σx·Σy) / (√(n·Σx²−(Σx)²)·√(n·Σy²−(Σy)²)) with every Σ an exact
    integer-quantized sum, so the value is partition-order independent."""
    li = load(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    n = F.count("*")
    sx, sy = dsum1(x), dsum1(y)
    sxx, syy, sxy = dsum1(x * x), dsum1(y * y), dsum1(x * y)
    # try_divide: a CONSTANT column zeroes a denominator sqrt and plain
    # division would ANSI-abort; NULL r matches DuckDB's x/0 = NULL.
    r = F.try_divide(
        n * sxy - sx * sy,
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy),
    )
    return li.groupBy("l_returnflag").agg(
        ((r * 1000000.0 + 0.5).cast("long").cast("double") / 1000000.0)
        .alias("corr_qty_price")
    )


@query(
    "agg_conditional",
    oracle="""
    SELECT o_orderpriority,
           CAST(count_if(o_totalprice > 150000) AS BIGINT) AS n_big,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_orderstatus = 'F') AS any_finished
    FROM orders GROUP BY o_orderpriority
    """,
    ref="SURVEY §2 D4 family [EXT] (conditional/boolean aggregates — "
    "count_if/bool_and/bool_or, identical names both engines)",
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 150000).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
    )


@query(
    "agg_skew_twostage",
    oracle=f"""
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_dsum('o_totalprice')} AS sum_price
    FROM orders GROUP BY o_custkey
    """,
    ref="SURVEY §2 D3 family [EXT] (salted two-stage aggregation — THE skew "
    "recipe at 100 TB: stage 1 aggregates (key, salt) so one hot key spreads "
    "over 16 reducers, stage 2 folds the partials; oracle proves it equals "
    "the plain GROUP BY bit-for-bit, incl. the scaled-long sum surviving "
    "re-aggregation because long addition is associative)",
)
def agg_skew_twostage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count/sum per customer via explicit salt → partial → final. AQE's skew
    handling covers joins; for aggregations whose partial combine can't keep
    up with one hot key, this manual spread is the standard fix."""
    o = load(spark, sf_dir, "orders")
    salted = o.withColumn("_salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(16)))
    partial = salted.groupBy("o_custkey", "_salt").agg(
        F.count("*").alias("pn"),
        F.sum(
            (F.col("o_totalprice") * F.lit(1000000.0) + F.lit(0.5)).cast("long")
        ).alias("psum"),
    )
    return partial.groupBy("o_custkey").agg(
        F.sum("pn").alias("n_orders"),
        (F.sum("psum").cast("double") / F.lit(1000000.0)).alias("sum_price"),
    )


@query(
    "agg_quantiles",
    oracle="""
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.25) AS p25,
           quantile_cont(o_totalprice, 0.50) AS p50,
           quantile_cont(o_totalprice, 0.75) AS p75,
           quantile_cont(o_totalprice, 0.90) AS p90
    FROM orders GROUP BY o_orderpriority
    """,
    ref="SURVEY §2 D8 family (multi-quantile: exact interpolated percentiles "
    "per group — Spark `percentile` and DuckDB `quantile_cont` share the "
    "h = (n-1)p linear-interpolation definition, probe-verified bit-exact "
    "on all 20 values incl. interpolated ones)",
)
def agg_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p25/p50/p75/p90 of order value per priority. Exact percentile is an
    order statistic (selection + one interpolation), not an accumulation, so
    it is deterministic cross-engine without dsum quantization.

    Scale note: exact percentile sorts within each group (memory O(group));
    at 100 TB per-group cardinalities this becomes approx_percentile with a
    bounded t-digest/GK sketch — the D14 pattern (sketch + tolerance oracle)
    already demonstrated by agg_approx_distinct."""
    o = load(spark, sf_dir, "orders")
    qs = F.expr("percentile(o_totalprice, array(0.25, 0.5, 0.75, 0.9))")
    return (
        o.groupBy("o_orderpriority")
        .agg(qs.alias("_q"))
        .select(
            "o_orderpriority",
            F.col("_q")[0].alias("p25"),
            F.col("_q")[1].alias("p50"),
            F.col("_q")[2].alias("p75"),
            F.col("_q")[3].alias("p90"),
        )
    )


@query(
    "agg_approx_quantiles",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS p50_ok, TRUE AS p90_ok
    FROM lineitem
    """,
    ref="SURVEY §2 D8/D14 (approx percentile sketch vs exact, 1% tolerance "
    "gate — the sketch is what actually runs at 100 TB, the exact form is "
    "the small-scale oracle; same tolerance-oracle pattern as ann_*_recall)",
)
def agg_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate that percentile_approx (KLL-style sketch, mergeable across
    partitions — the only formulation that scales) lands within 1% of the
    exact interpolated percentile on p50/p90 of l_extendedprice.

    The emitted booleans are computed Spark-side from BOTH estimates; the
    oracle asserts they are TRUE — a tolerance oracle, recorded as such."""
    l = load(spark, sf_dir, "lineitem")
    both = l.agg(
        F.count("*").alias("n_rows"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("e50"),
        F.percentile("l_extendedprice", F.lit(0.9)).alias("e90"),
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000)).alias("a50"),
        F.percentile_approx("l_extendedprice", F.lit(0.9), F.lit(10000)).alias("a90"),
    )
    tol = 0.01
    return both.select(
        "n_rows",
        (F.abs(F.col("a50") - F.col("e50")) <= tol * F.abs(F.col("e50"))).alias("p50_ok"),
        (F.abs(F.col("a90") - F.col("e90")) <= tol * F.abs(F.col("e90"))).alias("p90_ok"),
    )


@query(
    "agg_hll_mergeable",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS within_tol
    FROM events GROUP BY event_type
    """,
    ref="SURVEY §2 D14 [EXT] (mergeable HLL sketches, Datasketches "
    "hll_sketch_agg/hll_union_agg: per-shard sketches unioned to a global "
    "estimate — the 100 TB distinct-count pattern where re-scanning for an "
    "exact count is not an option; 5%-tolerance oracle)",
)
def agg_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via per-shard HLL sketches merged with
    hll_union_agg, gated within 5% of the exact count.

    The point is the MERGE: each of 4 shards builds an independent sketch
    (in real life: per partition / per day / per ingest batch) and the union
    is algebraic — no re-scan of raw data to combine. The emitted boolean
    compares the merged estimate against the exact count computed in the
    same job; the oracle asserts it is TRUE (tolerance oracle)."""
    ev = load(spark, sf_dir, "events")
    per_shard = (
        ev.withColumn("shard", F.pmod(F.col("event_id"), F.lit(4)))
        .groupBy("event_type", "shard")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    merged = per_shard.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users")
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact")
    )
    return exact.join(merged, "event_type").select(
        "event_type",
        "n_exact",
        (
            F.abs(F.col("approx_users") - F.col("n_exact"))
            <= 0.05 * F.col("n_exact")
        ).alias("within_tol"),
    )


@query(
    "agg_quantiles_grouped",
    oracle="""
    SELECT lang,
           quantile_cont(n_chars, 0.25) AS p25,
           quantile_cont(n_chars, 0.50) AS p50,
           quantile_cont(n_chars, 0.75) AS p75
    FROM documents GROUP BY lang
    """,
    ref="SURVEY §2 D8 (exact interpolated quantiles PER GROUP — length "
    "distribution by language; grouped form of agg_quantiles)",
)
def agg_quantiles_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p25/p50/p75 of document length per language (exact interpolation,
    bit-matching DuckDB quantile_cont; percentile_approx at 100 TB)."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.percentile("n_chars", F.lit(0.25)).alias("p25"),
        F.percentile("n_chars", F.lit(0.50)).alias("p50"),
        F.percentile("n_chars", F.lit(0.75)).alias("p75"),
    )


@query(
    "agg_grouping_id",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
    ref="SURVEY §2 D10 (GROUPING() markers on ROLLUP: the only reliable way "
    "to tell a subtotal row from a genuine NULL group value — D10's "
    "correctness footnote made queryable)",
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP counts with GROUPING() flags: g_status/g_priority = 1 exactly
    on subtotal rows where that column was rolled away. Identical semantics
    in both engines; without these flags a NULL-valued group and a subtotal
    are indistinguishable."""
    o = load(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count("*").alias("cnt"),
        )
        .select(
            "o_orderstatus", "o_orderpriority", "g_status", "g_priority", "cnt"
        )
    )


@query(
    "agg_skew_detection",
    oracle="""
    WITH per_key AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY user_id
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total, CAST(COUNT(*) AS BIGINT) AS n_keys FROM per_key)
    SELECT user_id, n,
           CAST(n AS DOUBLE) / total AS share,
           CAST(n AS DOUBLE) * CAST(n_keys AS DOUBLE)
             > 3.0 * CAST(total AS DOUBLE) AS is_hot
    FROM per_key, tot
    """,
    ref="SURVEY §2 D3/D4 + §4.3 [EXT] (skew detection: per-key share of "
    "total + hot-key flag (>3x the uniform share) — the diagnostic that "
    "decides WHEN join_salted_skew / AQE skew handling is needed)",
)
def agg_skew_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key cardinality share with a hot-key flag (key is hot when its
    count exceeds 3x the uniform share). The cross-multiplication runs in
    DOUBLE on both engines: int64 `n * n_keys` silently wraps at the very
    scale this diagnostic is pitched for (n ~ 1e10 on a hot key times
    n_keys ~ 1e9 overflows 2^63 and, with Spark's default non-ANSI mode,
    flips is_hot without an error). Doubles lose exactness only past 2^53
    and identically under IEEE-754 on both engines, so the oracle still
    matches bitwise.

    Scale shape: one groupBy on the key; the total is a 1-row broadcast
    cross join. Run this BEFORE a big join — its output decides the salting
    factor (SALT_N ~ hot-key share / uniform share)."""
    ev = load(spark, sf_dir, "events")
    per_key = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    tot = per_key.agg(
        F.sum("n").alias("total"), F.count("*").alias("n_keys")
    )
    return per_key.crossJoin(F.broadcast(tot)).select(
        "user_id",
        "n",
        (F.col("n").cast("double") / F.col("total")).alias("share"),
        (
            F.col("n").cast("double") * F.col("n_keys").cast("double")
            > 3.0 * F.col("total").cast("double")
        ).alias("is_hot"),
    )


@query(
    "agg_group_by_all",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY ALL
    """,
    ref="SURVEY §2 D3 [EXT] (GROUP BY ALL: every non-aggregate select item "
    "becomes a grouping key — the DuckDB-originated sugar Spark 4 adopted; "
    "compiles to the identical hash aggregate as the explicit spelling)",
)
def agg_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL at the SQL surface — analyzer sugar only: the physical
    plan is byte-identical to GROUP BY o_orderstatus, o_orderpriority, so
    every scale property of agg_group_by carries over."""
    from ksql_spark.tables import ensure_views

    ensure_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders GROUP BY ALL
        """
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
    """,
    ref="SURVEY §2 D+ [EXT] (EXACT mergeable distinct count via bitmap "
    "bit_or aggregation — the RoaringBitmap pattern for bounded id "
    "domains; the exact complement of agg_hll_mergeable's approximate "
    "sketch. Oracle is CROSS-METHOD: plain COUNT(DISTINCT), so the "
    "bitmap math is checked against an independent algorithm)",
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type counted EXACTLY through a bitmap:
    each user_id sets bit (id % 32) of word (id / 32); per-group bitmaps
    merge with bit_or (associative + commutative = map-side partial
    aggregation, and shard-parallel at scale, like any sketch — but this
    one is exact); the final count is the sum of per-word popcounts.

    Scale shape: the shuffle carries (event_type, word_idx, 8-byte word)
    rows — domain/32 words per group regardless of row count, vs
    COUNT(DISTINCT)'s expand-and-reshuffle of every distinct pair. Works
    whenever ids are dictionary-bounded (user/doc/entity ids at 100 TB are
    dense dictionary codes; for sparse 64-bit ids this is what Roaring
    containers generalize). Cross-method oracle: COUNT(DISTINCT)."""
    from ksql_spark.operators.bitmaps import bitmap_words

    ev = load(spark, sf_dir, "events")
    words = bitmap_words(ev, "user_id", ["event_type"])
    # coalesce: a group whose ids are ALL NULL yields one (group, NULL,
    # NULL-bits) word — its popcount sum is NULL where COUNT(DISTINCT)
    # reports 0 (the hypothesis bitmap law caught this edge)
    return (
        words.groupBy("event_type")
        .agg(
            F.coalesce(F.sum(F.bit_count("bits")), F.lit(0))
            .cast("bigint")
            .alias("n_users")
        )
    )


@query(
    "agg_filter_clause",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(COUNT(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT)
               AS n_big,
           {sql_dsum('o_totalprice')} AS total_price,
           CAST(COUNT(*) AS BIGINT) AS n_all
    FROM orders GROUP BY o_orderpriority
    """,
    ref="SURVEY §2 D [EXT] (the SQL:2003 FILTER (WHERE ...) aggregate "
    "modifier — the standard spelling of conditional aggregation; the "
    "same text runs in Spark 4 and DuckDB, and Catalyst compiles it to "
    "the identical plan as the CASE WHEN form agg_conditional uses)",
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation via the standard FILTER clause at the SQL
    surface. Semantically identical to CASE WHEN inside the aggregate
    (agg_conditional) — this entry pins that the standard syntax parses
    and produces the same hash-aggregate plan, so users porting ANSI SQL
    need not rewrite."""
    from ksql_spark.tables import ensure_views

    ensure_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT)
                   AS n_big,
               CAST(SUM(CAST(o_totalprice * 1000000 + 0.5 AS LONG)) AS DOUBLE)
                   / 1000000.0 AS total_price,
               COUNT(*) AS n_all
        FROM orders GROUP BY o_orderpriority
        """
    )


@query(
    "agg_bool",
    oracle="""
    SELECT o_orderpriority,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_totalprice > 400000) AS any_over_400k,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY o_orderpriority
    """,
    ref="SURVEY §2 D [EXT] (boolean aggregates bool_and/bool_or — the "
    "SQL:1999 EVERY/ANY forms; Spark and DuckDB share the bool_and/"
    "bool_or spelling, and both short-circuit as partial aggs)",
)
def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-level invariant checks via boolean aggregation — the idiom
    data-quality assertions compile to (is every order over the floor,
    did any breach the cap). Partial+final hash agg like any other
    aggregate; short-circuits map-side."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_over_400k"),
        F.count("*").alias("n"),
    )


@query(
    "abc_analysis_parts",
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
    )
    SELECT l_partkey, revenue,
           cum / t AS cum_share,
           CASE WHEN cum / t <= 0.5 THEN 'A'
                WHEN cum / t <= 0.8 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM c, tot
    """,
    ref="SURVEY §2 D/E [EXT] (ABC / Pareto analysis: parts classified by "
    "cumulative revenue share — A carries the first 50%, B to 80%, C the "
    "tail; the classic inventory-prioritization query. The global cumsum "
    "is operators/scale.py:ranged_cumsum — range-partitioned two-pass, "
    "never a single-partition window)",
)
def abc_analysis_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto classification of parts by revenue contribution. Revenue and
    its global running sum are quantized (dsum / exact long accumulation),
    the total is a 1-row broadcast, and the share division is
    exact-operand IEEE — class boundaries cannot flip on a ulp between
    engines.

    Scale shape: one l_partkey agg, then the two-pass ranged cumsum
    (range partition on the sort key -> per-partition window ->
    #partitions-row offset broadcast) — the same scaled shape
    llm_token_budget uses; no Exchange SinglePartition."""
    from ksql_spark.operators.scale import ranged_cumsum

    li = load(spark, sf_dir, "lineitem")
    rev_expr = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rev = li.groupBy("l_partkey").agg(dsum(rev_expr).alias("revenue"))
    tot = li.agg(dsum(rev_expr).alias("t"))
    # ranged_cumsum accumulates LONGS — run it over the 1e6-scaled integer
    # form of the (already 6-dp-quantized) revenue and descale after; the
    # oracle windows the identical scaled sum
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
    return c.crossJoin(F.broadcast(tot)).select(
        "l_partkey",
        "revenue",
        share.alias("cum_share"),
        F.when(share <= 0.5, "A").when(share <= 0.8, "B").otherwise("C").alias(
            "abc_class"
        ),
    )


@query(
    "orders_monthly_growth",
    oracle=f"""
    WITH m AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
               {sql_dsum('o_totalprice')} AS revenue
        FROM orders GROUP BY 1
    )
    SELECT month, revenue,
           lag(revenue) OVER (ORDER BY month) AS prev_revenue,
           (revenue - lag(revenue) OVER (ORDER BY month))
               / lag(revenue) OVER (ORDER BY month) AS mom_growth
    FROM m
    """,
    ref="SURVEY §2 D/E [EXT] (month-over-month revenue growth — the "
    "canonical BI trend query: monthly quantized totals + lag + relative "
    "delta; the only global window runs over |months| rows, bounded by "
    "the calendar, not the data)",
)
def orders_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue with its month-over-month growth rate. The lag
    window is GLOBAL but over the month table (|months| rows — calendar-
    bounded at any data scale, so the single partition is fine and
    permanent, unlike data-proportional global windows). Quantized
    monthly sums make the growth division exact-operand IEEE."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(dsum("o_totalprice").alias("revenue"))
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return m.select(
        "month",
        "revenue",
        prev.alias("prev_revenue"),
        ((F.col("revenue") - prev) / prev).alias("mom_growth"),
    )


@query(
    "basket_brand_lift",
    oracle="""
    WITH ob AS (
        SELECT DISTINCT l_orderkey, p_brand
        FROM lineitem JOIN part ON p_partkey = l_partkey
    ),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM ob),
    b AS (SELECT p_brand, COUNT(*) AS n_b FROM ob GROUP BY p_brand),
    pairs AS (
        SELECT a.p_brand AS brand_a, c.p_brand AS brand_b,
               COUNT(*) AS n_ab
        FROM ob a JOIN ob c
          ON a.l_orderkey = c.l_orderkey AND a.p_brand < c.p_brand
        GROUP BY 1, 2
    )
    SELECT brand_a, brand_b, CAST(n_ab AS BIGINT) AS n_ab,
           CAST(n_ab * n.n_orders AS DOUBLE)
               / CAST(ba.n_b * bb.n_b AS DOUBLE) AS lift
    FROM pairs
    JOIN b ba ON ba.p_brand = brand_a
    JOIN b bb ON bb.p_brand = brand_b
    CROSS JOIN n
    WHERE n_ab >= 5
    """,
    ref="SURVEY §2 D19 [EXT] (market-basket association: brand-pair "
    "co-occurrence lift across orders — the Apriori/FP-growth 2-itemset "
    "shape. lift = P(ab)/(P(a)P(b)) spelled as the exact integer "
    "cross-ratio n_ab*N/(n_a*n_b), one IEEE division; the pair space is "
    "|brands|²-bounded because baskets collapse to DISTINCT "
    "(order, brand) FIRST, never a lineitem self-join)",
)
def basket_brand_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which part brands are ordered together more than chance predicts:
    support count and lift for every brand pair with >= 5 co-occurring
    orders. Lift > 1 = affinity, < 1 = substitution — the association
    signal recommenders and assortment planning start from.

    Scale shape (the thing naive basket mining gets wrong): collapse to
    DISTINCT (order, brand) BEFORE pairing — the self-join is then
    per-order over <= |brands| rows, and the pair agg is |brands|²-bounded
    regardless of corpus size. The brand marginals and the order count
    broadcast back onto that bounded pair table."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    ob = (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    n = ob.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    b = ob.groupBy("p_brand").agg(F.count("*").alias("n_b"))
    a, c = ob.alias("a"), ob.alias("c")
    pairs = (
        a.join(
            c,
            (F.col("a.l_orderkey") == F.col("c.l_orderkey"))
            & (F.col("a.p_brand") < F.col("c.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("brand_a"),
            F.col("c.p_brand").alias("brand_b"),
        )
        .agg(F.count("*").alias("n_ab"))
        .where(F.col("n_ab") >= 5)
    )
    ba = b.select(F.col("p_brand").alias("brand_a"), F.col("n_b").alias("na"))
    bb = b.select(F.col("p_brand").alias("brand_b"), F.col("n_b").alias("nb"))
    return (
        pairs.join(F.broadcast(ba), "brand_a")
        .join(F.broadcast(bb), "brand_b")
        .crossJoin(F.broadcast(n))
        .select(
            "brand_a",
            "brand_b",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            (
                (F.col("n_ab") * F.col("n_orders")).cast("double")
                / (F.col("na") * F.col("nb")).cast("double")
            ).alias("lift"),
        )
    )


@query(
    "orders_concurrency_curve",
    oracle="""
    WITH bounds AS (
        SELECT o.o_orderkey, o.o_orderdate AS open_ts,
               MAX(l.l_shipdate) AS close_ts
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_orderdate
    ),
    ev AS (
        SELECT open_ts AS ts, 1 AS delta FROM bounds
        UNION ALL
        SELECT close_ts AS ts, -1 AS delta FROM bounds
    ),
    curve AS (
        SELECT ts, SUM(delta) AS net FROM ev GROUP BY ts
    )
    SELECT ts,
           CAST(SUM(net) OVER (
               ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS active_orders
    FROM curve
    """,
    ref="SURVEY §2 D20 [EXT] (interval concurrency via sweep-line: +1 at "
    "each order's open, -1 at its last shipment, running sum = orders "
    "in flight at every boundary — the occupancy/staffing/backlog "
    "operator. Coalescing deltas per timestamp FIRST makes the curve "
    "well-defined under simultaneous opens/closes and shrinks the "
    "cumsum input to |distinct timestamps|)",
)
def orders_concurrency_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many orders are simultaneously in flight (opened, not yet
    fully shipped) at every time boundary — the sweep-line concurrency
    curve behind occupancy, staffing, and backlog questions. Exact
    integer deltas; ties collapse per timestamp before the running sum,
    so the curve is total-order deterministic.

    Scale shape: the +1/-1 event stream is 2 rows per order; per-ts
    coalescing is one hash agg; the global running sum is
    operators/scale.py:ranged_cumsum (range-partitioned two-pass — a
    data-proportional global window would be the naive single-partition
    killer here)."""
    from ksql_spark.operators.scale import ranged_cumsum

    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    bounds = (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("close_ts"))
    )
    ev = bounds.select(
        F.col("o_orderdate").alias("ts"), F.lit(1).alias("delta")
    ).unionByName(
        bounds.select(F.col("close_ts").alias("ts"), F.lit(-1).alias("delta"))
    )
    curve = ev.groupBy("ts").agg(F.sum("delta").alias("net"))
    return ranged_cumsum(curve, ["ts"], "net", out_col="active_orders").select(
        "ts", F.col("active_orders").cast("bigint").alias("active_orders")
    )


_HIST_BINS = 64


def price_histogram(li: DataFrame, bounds: DataFrame) -> DataFrame:
    """The histogram SKETCH itself: bin every l_extendedprice against the
    broadcast (mn, width) bounds, hash-agg to <= _HIST_BINS rows. Shards
    sketched with the SAME bounds SUM-merge into the single-pass sketch
    (test-pinned, the CMS merge-law discipline)."""
    binned = li.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.lit(_HIST_BINS - 1),
            F.floor((F.col("l_extendedprice") - F.col("mn")) / F.col("width")),
        ).alias("bin")
    )
    return binned.groupBy("bin").agg(F.count("*").alias("cnt"))


@query(
    "agg_histogram_quantile",
    oracle=f"""
    WITH b AS (
        SELECT MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx,
               CAST(COUNT(*) AS BIGINT) AS n,
               (MAX(l_extendedprice) - MIN(l_extendedprice)) / {_HIST_BINS}.0
                   AS width
        FROM lineitem
    ), binned AS (
        SELECT least({_HIST_BINS - 1},
                     CAST(floor((l_extendedprice - b.mn) / b.width)
                          AS BIGINT)) AS bin
        FROM lineitem, b
    ), hist AS (
        SELECT bin, CAST(COUNT(*) AS BIGINT) AS cnt FROM binned GROUP BY bin
    ), cum AS (
        SELECT bin, cnt, SUM(cnt) OVER (ORDER BY bin) AS cum FROM hist
    ), qs(quantile, q) AS (
        VALUES ('p50', 0.5), ('p90', 0.9), ('p99', 0.99)
    ), tgt AS (
        SELECT quantile, CAST(ceil(q * b.n) AS BIGINT) AS target, b.n,
               b.mn, b.width
        FROM qs, b
    ), pick AS (
        SELECT t.quantile, t.target, t.n, t.mn, t.width,
               MIN(c.bin) AS bin
        FROM tgt t JOIN cum c ON c.cum >= t.target
        GROUP BY t.quantile, t.target, t.n, t.mn, t.width
    )
    SELECT p.quantile, p.n, CAST(p.bin AS INT) AS bin,
           CAST(trunc(
               (p.mn + (CAST(p.bin AS DOUBLE)
                        + CAST(p.target - (c.cum - c.cnt) AS DOUBLE)
                          / CAST(c.cnt AS DOUBLE)) * p.width)
               * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS estimate
    FROM pick p JOIN cum c ON p.bin = c.bin
    """,
    ref="SURVEY §2 D21 [EXT] (mergeable equi-width histogram quantile "
    "sketch — the quantile member of the mergeable-sketch family "
    "(HLL/bloom/CMS/bitmap): per-shard bin counts SUM-merge, p50/p90/p99 "
    "read off the merged cdf with linear interpolation; error bounded by "
    "one bin width, test-pinned)",
)
def agg_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of l_extendedprice from a 64-bin equi-width histogram
    sketch — approximate quantiles whose STATE is SUM-mergeable across
    shards/micro-batches (unlike exact percentile, whose state is the
    data). Estimate = linear cdf interpolation inside the target bin;
    |error| <= one bin width by construction (tests pin this vs the exact
    percentile).

    Scale shape: pass 1 is a 1-row min/max/count agg (broadcast); pass 2
    bins every row NARROWLY and hash-aggregates to <= 64 rows — the only
    data-wide exchange carries bin ids, and partial aggregation collapses
    each map task to <= 64 rows before it. Everything after (cumsum,
    quantile pick, interpolation) operates on the 64-row sketch: the
    window is sketch-sized, never data-sized (same bounded-state argument
    as the CMS grid, llm_cms_heavy_hitters). Merging shards = summing bin
    counts; bounds come from the ingest min/max stats at 100 TB. All
    arithmetic is IEEE-identical cross-engine; the final estimate is
    quantized to 1e-6 (registry discipline)."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    b = li.agg(
        F.min("l_extendedprice").alias("mn"),
        F.max("l_extendedprice").alias("mx"),
        F.count("*").alias("n"),
        (
            (F.max("l_extendedprice") - F.min("l_extendedprice"))
            / float(_HIST_BINS)
        ).alias("width"),
    )
    hist = price_histogram(li, b)
    cum = hist.withColumn(
        "cum",
        F.sum("cnt").over(
            Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    qs = spark.createDataFrame(
        [("p50", 0.5), ("p90", 0.9), ("p99", 0.99)], "quantile string, q double"
    )
    tgt = qs.crossJoin(F.broadcast(b)).select(
        "quantile",
        F.ceil(F.col("q") * F.col("n")).cast("bigint").alias("target"),
        "n",
        "mn",
        "width",
    )
    pick = (
        tgt.join(cum.select(F.col("bin").alias("cbin"), F.col("cum").alias("ccum")),
                 F.col("ccum") >= F.col("target"))
        .groupBy("quantile", "target", "n", "mn", "width")
        .agg(F.min("cbin").alias("bin"))
    )
    est = (
        F.col("mn")
        + (
            F.col("bin").cast("double")
            + (F.col("target") - (F.col("cum") - F.col("cnt"))).cast("double")
            / F.col("cnt").cast("double")
        )
        * F.col("width")
    )
    return (
        pick.join(cum, "bin")
        .select(
            "quantile",
            "n",
            F.col("bin").cast("int").alias("bin"),
            ((est * 1000000 + 0.5).cast("bigint") / 1000000.0).alias("estimate"),
        )
    )


@query(
    "orders_rfm_segments",
    oracle=f"""
    WITH per AS (
        SELECT o_custkey AS custkey,
               MAX(o_orderdate) AS last_order,
               CAST(COUNT(*) AS BIGINT) AS frequency,
               {sql_dsum('o_totalprice')} AS monetary
        FROM orders GROUP BY o_custkey
    ), ref AS (
        SELECT MAX(o_orderdate) AS refd FROM orders
    ), met AS (
        SELECT custkey,
               CAST(date_diff('day', CAST(last_order AS DATE),
                              CAST(refd AS DATE)) AS BIGINT) AS recency_days,
               frequency, monetary
        FROM per, ref
    ), thr AS (
        SELECT quantile_cont(recency_days, 0.2) AS r20,
               quantile_cont(recency_days, 0.4) AS r40,
               quantile_cont(recency_days, 0.6) AS r60,
               quantile_cont(recency_days, 0.8) AS r80,
               quantile_cont(frequency, 0.2) AS f20,
               quantile_cont(frequency, 0.4) AS f40,
               quantile_cont(frequency, 0.6) AS f60,
               quantile_cont(frequency, 0.8) AS f80,
               quantile_cont(monetary, 0.2) AS m20,
               quantile_cont(monetary, 0.4) AS m40,
               quantile_cont(monetary, 0.6) AS m60,
               quantile_cont(monetary, 0.8) AS m80
        FROM met
    )
    SELECT custkey, recency_days, frequency, monetary,
           CAST(CASE WHEN recency_days <= r20 THEN 5
                     WHEN recency_days <= r40 THEN 4
                     WHEN recency_days <= r60 THEN 3
                     WHEN recency_days <= r80 THEN 2
                     ELSE 1 END AS INT) AS r_score,
           CAST(CASE WHEN frequency > f80 THEN 5
                     WHEN frequency > f60 THEN 4
                     WHEN frequency > f40 THEN 3
                     WHEN frequency > f20 THEN 2
                     ELSE 1 END AS INT) AS f_score,
           CAST(CASE WHEN monetary > m80 THEN 5
                     WHEN monetary > m60 THEN 4
                     WHEN monetary > m40 THEN 3
                     WHEN monetary > m20 THEN 2
                     ELSE 1 END AS INT) AS m_score
    FROM met, thr
    """,
    ref="SURVEY §2 D22 [EXT] (RFM customer segmentation: "
    "recency/frequency/monetary quintile scores — the classic "
    "marketing-analytics segmentation; broadcast-threshold bucketing, "
    "the llm_curriculum no-window discipline, NOT ntile)",
)
def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM scores per customer: days since last order (lower = better),
    order count, and exact-quantized spend, each bucketed 1-5 against
    interpolated quintile thresholds. Boundary semantics: recency uses
    <= (a customer AT the good-side threshold gets the better score),
    frequency/monetary use > — both spelled identically in the oracle,
    and threshold doubles are bitwise cross-engine (F.percentile ==
    quantile_cont, the agg_quantiles pin).

    Scale shape: ONE customer-keyed hash agg builds the metric table
    (map-side combined); the quintile thresholds are a 1-row aggregate
    BROADCAST back (percentile -> percentile_approx at 100 TB, same plan
    shape — the llm_curriculum argument); scoring is a narrow CASE pass.
    No window, no ntile, no global sort anywhere."""
    o = load(spark, sf_dir, "orders")
    per = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        dsum("o_totalprice").alias("monetary"),
    )
    ref = o.agg(F.max("o_orderdate").alias("refd"))
    met = per.crossJoin(F.broadcast(ref)).select(
        "custkey",
        F.datediff(F.to_date("refd"), F.to_date("last_order"))
        .cast("bigint")
        .alias("recency_days"),
        "frequency",
        "monetary",
    )
    thr = met.agg(
        *[
            F.percentile(c, F.lit(q)).alias(f"{c[0]}{int(q * 100)}")
            for c in ("recency_days", "frequency", "monetary")
            for q in (0.2, 0.4, 0.6, 0.8)
        ]
    )

    def down(col, t):  # lower is better (recency)
        return (
            F.when(F.col(col) <= F.col(f"{t}20"), 5)
            .when(F.col(col) <= F.col(f"{t}40"), 4)
            .when(F.col(col) <= F.col(f"{t}60"), 3)
            .when(F.col(col) <= F.col(f"{t}80"), 2)
            .otherwise(1)
            .cast("int")
        )

    def up(col, t):  # higher is better
        return (
            F.when(F.col(col) > F.col(f"{t}80"), 5)
            .when(F.col(col) > F.col(f"{t}60"), 4)
            .when(F.col(col) > F.col(f"{t}40"), 3)
            .when(F.col(col) > F.col(f"{t}20"), 2)
            .otherwise(1)
            .cast("int")
        )

    return met.crossJoin(F.broadcast(thr)).select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary",
        down("recency_days", "r").alias("r_score"),
        up("frequency", "f").alias("f_score"),
        up("monetary", "m").alias("m_score"),
    )


@query(
    "supplier_latency_percentiles",
    oracle="""
    WITH lat AS (
        SELECT l_suppkey AS suppkey,
               CAST(date_diff('day', CAST(o_orderdate AS DATE),
                              CAST(l_shipdate AS DATE)) AS BIGINT)
                   AS ship_days
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT suppkey,
           CAST(COUNT(*) AS BIGINT) AS n_shipments,
           quantile_cont(ship_days, 0.5) AS p50_days,
           quantile_cont(ship_days, 0.9) AS p90_days,
           MAX(ship_days) AS max_days
    FROM lat GROUP BY suppkey
    """,
    ref="SURVEY §2 D23 [EXT] (supplier order-to-ship latency percentiles: "
    "p50/p90/max days from order date to line shipment per supplier — the "
    "operational SLA view; interpolated percentiles bitwise cross-engine, "
    "the agg_quantiles pin)",
)
def supplier_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency distribution per supplier (p50/p90/max days).

    Scale shape: the lineitem-orders join shuffles both sides on the
    orderkey — the canonical co-located-join candidate: at 100 TB both
    tables are bucketed on orderkey at write (join_bucketed_colocated's
    layout) and the join costs zero exchanges; here Catalyst picks
    broadcast/SMJ by size. The per-supplier percentile agg shuffles
    |lineitem| narrow (suppkey, days) pairs once; exact percentile state
    is per-group sorted values — swap percentile_approx at 100 TB for
    constant-memory state, same plan shape (the llm_curriculum note)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    lat = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        F.col("l_suppkey").alias("suppkey"),
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
        .cast("bigint")
        .alias("ship_days"),
    )
    return lat.groupBy("suppkey").agg(
        F.count("*").alias("n_shipments"),
        F.percentile("ship_days", F.lit(0.5)).alias("p50_days"),
        F.percentile("ship_days", F.lit(0.9)).alias("p90_days"),
        F.max("ship_days").alias("max_days"),
    )


_KANON_K = 5


@query(
    "privacy_k_anonymity",
    oracle=f"""
    WITH groups AS (
        SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
        FROM customer GROUP BY c_nationkey, c_mktsegment
    )
    SELECT c_nationkey, c_mktsegment, n AS group_size,
           n < {_KANON_K} AS violates_k
    FROM groups
    """,
    ref="SURVEY §2 D24 [EXT] (k-anonymity audit, k=5: equivalence-class "
    "sizes over the quasi-identifier tuple (nation, market segment) with "
    "per-class violation flags — the Sweeney 2002 re-identification "
    "check run before any data release; the privacy complement of PII "
    "scrubbing K8, which removes direct identifiers but not "
    "quasi-identifier joins)",
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every quasi-identifier equivalence class with its size and whether
    it violates k=5 anonymity — a class of fewer than k customers is
    re-identifiable by joining (nation, segment) against any external
    dataset. The release decision (suppress, generalize nation -> region,
    or pass) consumes exactly this table.

    Scale shape: ONE hash agg on the quasi-identifier tuple (map-side
    combined; output bounded by the QI domain product, here 25 x 5), flag
    is a narrow projection. Wider QI sets stay the same single-agg shape
    with a larger bounded domain; continuous QIs get bucketed first (the
    D21 histogram binning)."""
    c = load(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count("*").alias("group_size"))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "group_size",
            (F.col("group_size") < _KANON_K).alias("violates_k"),
        )
    )


@query(
    "orders_ltv_curve",
    oracle=f"""
    WITH om AS (
        SELECT o_custkey AS custkey,
               CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                   AS ym,
               o_totalprice
        FROM orders
    ), first AS (
        SELECT custkey, MIN(ym) AS cohort_ym FROM om GROUP BY custkey
    ), sizes AS (
        SELECT cohort_ym, CAST(COUNT(*) AS BIGINT) AS cohort_size
        FROM first GROUP BY cohort_ym
    ), rev AS (
        SELECT f.cohort_ym, om.ym - f.cohort_ym AS month_offset,
               {sql_dsum('om.o_totalprice')} AS r
        FROM om JOIN first f USING (custkey)
        GROUP BY f.cohort_ym, om.ym - f.cohort_ym
    ), spine AS (
        SELECT s.cohort_ym, s.cohort_size, CAST(g.o AS BIGINT) AS month_offset
        FROM sizes s,
             unnest(range(0, (SELECT MAX(ym) FROM om)
                             - s.cohort_ym + 1)) AS g(o)
    ), filled AS (
        SELECT sp.cohort_ym, sp.cohort_size, sp.month_offset,
               COALESCE(rev.r, 0.0) AS r
        FROM spine sp LEFT JOIN rev USING (cohort_ym, month_offset)
    ), cum AS (
        SELECT cohort_ym, cohort_size, month_offset,
               SUM(CAST(trunc(r * 1000000 + 0.5) AS BIGINT))
                   OVER (PARTITION BY cohort_ym ORDER BY month_offset)
                   AS cum_q6
        FROM filled
    )
    SELECT cohort_ym, month_offset, cohort_size,
           CAST(cum_q6 AS DOUBLE) / 1000000.0 AS cum_revenue,
           CAST(trunc(CAST(cum_q6 AS DOUBLE) / cohort_size / 1000000.0
                      * 1000000 + 0.5) AS BIGINT) / 1000000.0
               AS ltv_per_customer
    FROM cum
    """,
    ref="SURVEY §2 D25 [EXT] (cohort LTV curve: cumulative revenue per "
    "first-order-month cohort at every month offset, divided by cohort "
    "size — the lifetime-value readout behind CAC payback decisions; "
    "the REVENUE companion of the K80 retention triangle)",
)
def orders_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average cumulative revenue per customer by acquisition cohort
    (first-order month, encoded year*12+month) and month offset, on a
    DENSE offset spine (a cohort with a quiet month still gets a row —
    its curve plateaus instead of skipping). Monthly revenue quantizes
    to 1e-6 longs before the running sum, so the curve is exact.

    Scale shape: one customer-keyed agg for cohorts, one
    (cohort, offset)-keyed agg for revenue (both map-side combined);
    the spine is generated per cohort row by sequence() — the
    events_resample_gapfill narrow-explode pattern, never a cross join;
    the cumulative window partitions by cohort over CALENDAR-bounded
    offsets. Output is |cohorts| x |offsets|."""
    o = load(spark, sf_dir, "orders")
    om = o.select(
        F.col("o_custkey").alias("custkey"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("bigint")
        .alias("ym"),
        "o_totalprice",
    )
    first = om.groupBy("custkey").agg(F.min("ym").alias("cohort_ym"))
    sizes = first.groupBy("cohort_ym").agg(F.count("*").alias("cohort_size"))
    rev = (
        om.join(first, "custkey")
        .groupBy("cohort_ym", (F.col("ym") - F.col("cohort_ym")).alias("month_offset"))
        .agg(dsum("o_totalprice").alias("r"))
    )
    max_ym = om.agg(F.max("ym").alias("max_ym"))
    spine = (
        sizes.crossJoin(F.broadcast(max_ym))
        .select(
            "cohort_ym",
            "cohort_size",
            F.explode(
                F.sequence(F.lit(0).cast("bigint"), F.col("max_ym") - F.col("cohort_ym"))
            ).alias("month_offset"),
        )
    )
    filled = spine.join(rev, ["cohort_ym", "month_offset"], "left").select(
        "cohort_ym",
        "cohort_size",
        "month_offset",
        F.coalesce(F.col("r"), F.lit(0.0)).alias("r"),
    )
    from pyspark.sql import Window

    cw = (
        Window.partitionBy("cohort_ym")
        .orderBy("month_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum_q6 = F.sum((F.col("r") * 1000000 + 0.5).cast("bigint")).over(cw)
    return filled.select(
        "cohort_ym",
        "month_offset",
        "cohort_size",
        (cum_q6.cast("double") / 1000000.0).alias("cum_revenue"),
        (
            (cum_q6.cast("double") / F.col("cohort_size") / 1000000.0 * 1000000 + 0.5)
            .cast("bigint")
            .cast("double")
            / 1000000.0
        ).alias("ltv_per_customer"),
    )


@query(
    "agg_weighted_median",
    oracle="""
    WITH w AS (
        SELECT l_returnflag, l_extendedprice AS v, l_quantity AS wt
        FROM lineitem
    ), tot AS (
        SELECT l_returnflag, SUM(wt) AS total_w FROM w GROUP BY l_returnflag
    ), cum AS (
        SELECT l_returnflag, v, wt,
               SUM(wt) OVER (PARTITION BY l_returnflag
                             ORDER BY v, wt) AS cw
        FROM w
    )
    SELECT c.l_returnflag,
           CAST(t.total_w AS DOUBLE) AS total_weight,
           MIN(c.v) AS weighted_median
    FROM cum c JOIN tot t USING (l_returnflag)
    WHERE c.cw >= t.total_w / 2.0
    GROUP BY c.l_returnflag, t.total_w
    """,
    ref="SURVEY §2 D26 [EXT] (weighted median: smallest value whose "
    "cumulative weight crosses half the total — quantity-weighted price "
    "medians, the inequality/index-number workhorse plain percentile "
    "cannot express; cum-weight window formulation, not per-group "
    "collect)",
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median of l_extendedprice per return flag: the
    smallest price at which cumulative shipped quantity reaches half the
    group's total. Weights are TPC-H integer-valued quantities, so the
    running and total sums are exact in doubles and the crossing point is
    deterministic (ties inside one price can't change the min picked).

    Scale shape: ONE group-keyed window (sorted runs within each hash
    partition — the E-family posture) for the cumulative weight, one
    group agg for totals (broadcast back), one filtered min. No
    per-group collect_list: state is the external sort run, which
    spills, where a collected array would OOM on a 100 TB group."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    tot = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("total_w"))
    cw = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_quantity"
    ).rowsBetween(Window.unboundedPreceding, 0)
    cum = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("v"),
        F.sum("l_quantity").over(cw).alias("cw"),
    )
    return (
        cum.join(F.broadcast(tot), "l_returnflag")
        .where(F.col("cw") >= F.col("total_w") / 2.0)
        .groupBy("l_returnflag", "total_w")
        .agg(F.min("v").alias("weighted_median"))
        .select(
            "l_returnflag",
            F.col("total_w").cast("double").alias("total_weight"),
            "weighted_median",
        )
    )


@query(
    "orders_survival_km",
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
               MAX(CASE WHEN n_events = n_risk THEN 1 ELSE 0 END)
                   OVER (ORDER BY dur) AS hit_zero
        FROM risk WHERE n_events > 0
    )
    SELECT dur AS duration_days, n_risk, n_events,
           CASE WHEN hit_zero = 1 THEN 0.0
                ELSE CAST(trunc(exp(CAST(lnsum_q9 AS DOUBLE) / 1000000000.0)
                           * 1000000 + 0.5) AS BIGINT) / 1000000.0
           END AS survival
    FROM terms
    """,
    ref="SURVEY §2 D27 [EXT] (Kaplan-Meier product-limit estimator on "
    "time-to-repeat-purchase with RIGHT CENSORING at the observation "
    "horizon — the survival curve behind churn/repeat analyses; naive "
    "'average days between orders' silently drops one-order customers "
    "and biases low. Log-space product: per-step ln terms quantized at "
    "1e-9, exact cumulative sum, one exp)",
)
def orders_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KM survival S(d) of 'still no second order after d days': subjects
    = customers, duration = first-to-second order days (repeaters) or
    first-order-to-horizon days (censored singles), risk sets counted on
    BOTH. The product over event times runs in log space with the
    registry quantization discipline so the curve is engine- and
    partition-order-exact.

    Scale shape: one customer-keyed agg builds subjects (map-side
    combined); per-duration tallies are a calendar-bounded agg; the risk
    set is total-minus-prefix over SORTED distinct durations (spelled as
    a correlated count in the oracle, a descending cumulative here —
    both exact); the KM window runs over <= |distinct durations| rows.
    Nothing after the first agg is data-sized."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    ranked = o.select(
        "o_custkey",
        "o_orderdate",
        F.row_number().over(w).alias("rn"),
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
        F.sum("event").alias("n_events"),
        F.count("*").alias("n_leaving"),
    )
    dw = Window.orderBy(F.col("dur").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = by_dur.withColumn("n_risk", F.sum("n_leaving").over(dw))
    # the final event time can have n_events == n_risk (everyone left
    # leaves with an event): S hits exactly 0 there — an absorbing flag,
    # not a ln(0) (which would abort/NaN in either engine)
    ln_q9 = F.when(F.col("n_events") == F.col("n_risk"), F.lit(0).cast("bigint")).otherwise(
        (
            F.log(1.0 - F.col("n_events").cast("double") / F.col("n_risk"))
            * 1000000000
            + 0.5
        ).cast("bigint")
    )
    zero = F.when(F.col("n_events") == F.col("n_risk"), 1).otherwise(0)
    kw = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    terms = (
        risk.where(F.col("n_events") > 0)
        .withColumn("lnsum_q9", F.sum(ln_q9).over(kw))
        .withColumn("hit_zero", F.max(zero).over(kw))
    )
    surv = F.when(F.col("hit_zero") == 1, F.lit(0.0)).otherwise(
        (
            F.exp(F.col("lnsum_q9").cast("double") / 1000000000.0)
            * 1000000
            + 0.5
        )
        .cast("bigint")
        .cast("double")
        / 1000000.0
    )
    return terms.select(
        F.col("dur").alias("duration_days"),
        "n_risk",
        "n_events",
        surv.alias("survival"),
    )


@query(
    "orders_gini_revenue",
    oracle="""
    WITH rev AS (
        SELECT o_custkey,
               SUM(CAST(trunc(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev_c
        FROM orders GROUP BY o_custkey
    ), ranked AS (
        SELECT rev_c, ROW_NUMBER() OVER (ORDER BY rev_c, o_custkey) AS i
        FROM rev
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(CAST(rev_c AS DECIMAL(38, 0))) AS DOUBLE) AS s0,
               CAST(SUM(CAST(i AS DECIMAL(38, 0)) * rev_c) AS DOUBLE) AS s1
        FROM ranked
    )
    SELECT n_customers,
           CAST(trunc(s0 / 100.0 * 1000000 + 0.5) AS BIGINT) / 1000000.0
               AS total_revenue,
           CAST(trunc((2.0 * s1 / (n_customers * s0)
                       - (n_customers + 1.0) / n_customers)
                      * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS gini
    FROM s
    """,
    ref="SURVEY §2 D28 [EXT] (Gini coefficient of customer revenue "
    "concentration via the rank-based estimator G = 2*Σ(i·x_i)/(n·Σx) - "
    "(n+1)/n over ascending revenues — the concentration complement of "
    "the D22 ABC/Pareto cut: ABC says WHERE the cut falls, Gini scores "
    "HOW concentrated the whole curve is in one number)",
)
def orders_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row revenue-concentration report: customer count, total
    revenue, and the Gini coefficient of per-customer revenue. Revenue
    is quantized to exact cents at the first aggregate, the global
    ascending rank comes from the two-pass ranged cumulative sum (never
    a single-partition window), and Σ i·x_i accumulates in
    decimal(38,0) — exact in both engines, so the final double division
    is bit-identical.

    Scale shape: one o_custkey hash agg (map-side combined), then the
    operators/scale.py ranged_cumsum decomposition for the global rank
    (range-partitioned local windows + a #partitions-row offset join),
    then a single 1-row reduction. The decimal accumulator is the
    overflow headroom: rank·cents products reach ~1e16 at sf0.1 and
    ~1e26 at the 100 TB customer count — past bigint, inside
    decimal(38,0)."""
    from ksql_spark.operators.scale import ranged_cumsum

    o = load(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(
            (F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("rev_c")
    )
    ranked = ranged_cumsum(
        rev.withColumn("_one", F.lit(1)),
        ["rev_c", "o_custkey"],
        "_one",
        "i",
    )
    s = ranked.agg(
        F.count("*").alias("n_customers"),
        F.sum(F.col("rev_c").cast("decimal(38,0)"))
        .cast("double")
        .alias("s0"),
        F.sum(F.col("i").cast("decimal(38,0)") * F.col("rev_c"))
        .cast("double")
        .alias("s1"),
    )
    q6 = lambda c: (c * 1000000 + F.lit(0.5)).cast("long").cast(
        "double"
    ) / 1000000.0
    n = F.col("n_customers").cast("double")
    return s.select(
        "n_customers",
        q6(F.col("s0") / 100.0).alias("total_revenue"),
        q6(
            2.0 * F.col("s1") / (n * F.col("s0")) - (n + 1.0) / n
        ).alias("gini"),
    )


_LDIV_L = 3


@query(
    "privacy_l_diversity",
    oracle=f"""
    WITH tagged AS (
        SELECT c_nationkey, c_mktsegment,
               CASE WHEN c_acctbal < 0 THEN 'negative'
                    WHEN c_acctbal < 3000 THEN 'low'
                    WHEN c_acctbal < 7000 THEN 'mid'
                    ELSE 'high' END AS balance_band
        FROM customer
    )
    SELECT c_nationkey, c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS group_size,
           CAST(COUNT(DISTINCT balance_band) AS BIGINT)
               AS distinct_sensitive,
           COUNT(DISTINCT balance_band) < {_LDIV_L} AS violates_l
    FROM tagged GROUP BY c_nationkey, c_mktsegment
    """,
    ref="SURVEY §2 D29 [EXT] (l-diversity audit, l=3: distinct sensitive "
    "values — banded account balance — per quasi-identifier equivalence "
    "class; the Machanavajjhala et al. 2007 strengthening of D24 "
    "k-anonymity: a class can be large yet still leak when every member "
    "shares one sensitive value)",
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each (nation, segment) equivalence class with its size, the count
    of distinct sensitive balance-bands present, and whether it violates
    l=3 diversity — k-anonymity's blind spot is the homogeneous class
    (10 members, all 'negative') where membership alone discloses the
    sensitive attribute.

    Scale shape: the sensitive band is a narrow projection, then ONE
    hash agg on the QI tuple with an exact distinct over a 4-value
    domain (Spark plans this as the two-phase Expand only over the
    bounded band domain; output rows bounded by the QI product). Wider
    sensitive domains swap the exact distinct for the D15 bitmap or
    D14 HLL — same single-agg shape."""
    c = load(spark, sf_dir, "customer")
    band = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
    )
    return (
        c.select("c_nationkey", "c_mktsegment", band.alias("balance_band"))
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count("*").alias("group_size"),
            F.count_distinct(F.col("balance_band")).alias(
                "distinct_sensitive"
            ),
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "group_size",
            "distinct_sensitive",
            (F.col("distinct_sensitive") < _LDIV_L).alias("violates_l"),
        )
    )


_TCLOSE_T = 0.2


@query(
    "privacy_t_closeness",
    oracle=f"""
    WITH tagged AS (
        SELECT c_nationkey, c_mktsegment,
               CASE WHEN c_acctbal < 0 THEN 0
                    WHEN c_acctbal < 3000 THEN 1
                    WHEN c_acctbal < 7000 THEN 2
                    ELSE 3 END AS band
        FROM customer
    ), cls AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN band = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
               CAST(SUM(CASE WHEN band = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
               CAST(SUM(CASE WHEN band = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
        FROM tagged GROUP BY c_nationkey, c_mktsegment
    ), gl AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS gn,
               CAST(SUM(CASE WHEN band = 0 THEN 1 ELSE 0 END) AS BIGINT) AS g0,
               CAST(SUM(CASE WHEN band = 1 THEN 1 ELSE 0 END) AS BIGINT) AS g1,
               CAST(SUM(CASE WHEN band = 2 THEN 1 ELSE 0 END) AS BIGINT) AS g2
        FROM tagged
    ), emd AS (
        SELECT c_nationkey, c_mktsegment, n,
               (abs(CAST(c0 AS DOUBLE) / n - CAST(g0 AS DOUBLE) / gn)
                + abs(CAST(c0 + c1 AS DOUBLE) / n
                      - CAST(g0 + g1 AS DOUBLE) / gn)
                + abs(CAST(c0 + c1 + c2 AS DOUBLE) / n
                      - CAST(g0 + g1 + g2 AS DOUBLE) / gn)) / 3.0 AS e
        FROM cls, gl
    )
    SELECT c_nationkey, c_mktsegment, n AS group_size,
           CAST(trunc(e * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS emd,
           e > {_TCLOSE_T} AS violates_t
    FROM emd
    """,
    ref="SURVEY §2 D30 [EXT] (t-closeness audit, t=0.2: ordered-domain "
    "earth-mover distance between each quasi-identifier class's "
    "sensitive balance-band distribution and the global one — Li et "
    "al. 2007, closing the privacy trio after D24 k-anonymity and D29 "
    "l-diversity: a class can be large AND diverse yet still leak by "
    "skewing toward one end of the sensitive scale)",
)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (nation, segment) class: the EMD between its balance-band
    distribution and the corpus-wide one, over the ordered 4-band
    domain (EMD for ordinal discrete = mean |cumulative difference|,
    normalized by m-1=3), with the t=0.2 violation flag. The three
    cumulative terms are spelled explicitly from conditional counts —
    no aggregation-order float summation anywhere.

    Scale shape: ONE hash agg on the QI tuple with 4 conditional sums
    (map-side combined, output bounded by the QI domain), one 1-row
    global agg broadcast back. Same single-agg envelope as D24/D29 —
    the whole privacy trio reads one pass."""
    c = load(spark, sf_dir, "customer")
    band = (
        F.when(F.col("c_acctbal") < 0, 0)
        .when(F.col("c_acctbal") < 3000, 1)
        .when(F.col("c_acctbal") < 7000, 2)
        .otherwise(3)
    )
    tagged = c.select("c_nationkey", "c_mktsegment", band.alias("band"))
    conds = [
        F.sum(F.when(F.col("band") == i, 1).otherwise(0)).alias(f"c{i}")
        for i in range(3)
    ]
    cls = tagged.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("n"), *conds
    )
    glob = tagged.agg(
        F.count("*").alias("gn"),
        *[
            F.sum(F.when(F.col("band") == i, 1).otherwise(0)).alias(f"g{i}")
            for i in range(3)
        ],
    )
    j = cls.crossJoin(F.broadcast(glob))
    dn = F.col("n").cast("double")
    dg = F.col("gn").cast("double")
    e = (
        F.abs(F.col("c0") / dn - F.col("g0") / dg)
        + F.abs(
            (F.col("c0") + F.col("c1")) / dn
            - (F.col("g0") + F.col("g1")) / dg
        )
        + F.abs(
            (F.col("c0") + F.col("c1") + F.col("c2")) / dn
            - (F.col("g0") + F.col("g1") + F.col("g2")) / dg
        )
    ) / 3.0
    return j.select(
        "c_nationkey",
        "c_mktsegment",
        F.col("n").alias("group_size"),
        ((e * 1000000 + F.lit(0.5)).cast("long").cast("double") / 1000000.0)
        .alias("emd"),
        (e > _TCLOSE_T).alias("violates_t"),
    )


@query(
    "orders_priority_mix_jsd",
    oracle="""
    WITH mc AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
               o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM orders GROUP BY 1, 2
    ), months AS (
        SELECT month, CAST(SUM(c) AS BIGINT) AS nm FROM mc GROUP BY month
    ), gdist AS (
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS g,
               CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS ng
        FROM orders GROUP BY o_orderpriority
    ), spine AS (
        SELECT m.month, m.nm, gl.o_orderpriority, gl.g, gl.ng,
               COALESCE(mc.c, 0) AS c
        FROM months m CROSS JOIN gdist gl
        LEFT JOIN mc ON mc.month = m.month
                    AND mc.o_orderpriority = gl.o_orderpriority
    ), terms AS (
        SELECT month, nm,
               CAST(trunc(CASE WHEN c > 0 THEN
                   0.5 * (CAST(c AS DOUBLE) / nm)
                   * ln(2.0 * (CAST(c AS DOUBLE) / nm)
                        / (CAST(c AS DOUBLE) / nm + CAST(g AS DOUBLE) / ng))
                   * 1000000000 + 0.5 ELSE 0.0 END) AS BIGINT)
               + CAST(trunc(CASE WHEN g > 0 THEN
                   0.5 * (CAST(g AS DOUBLE) / ng)
                   * ln(2.0 * (CAST(g AS DOUBLE) / ng)
                        / (CAST(c AS DOUBLE) / nm + CAST(g AS DOUBLE) / ng))
                   * 1000000000 + 0.5 ELSE 0.0 END) AS BIGINT) AS tq
        FROM spine
    )
    SELECT month, CAST(MAX(nm) AS BIGINT) AS n_orders,
           CAST(trunc(CAST(SUM(tq) AS DOUBLE) / 1000000000.0
                * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS jsd_nats,
           CAST(trunc(CAST(SUM(tq) AS DOUBLE) / 1000000000.0 / ln(2.0)
                * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS jsd_bits
    FROM terms GROUP BY month
    """,
    ref="SURVEY §2 D34 [EXT] (categorical composition drift: "
    "Jensen-Shannon divergence between each month's order-priority mix "
    "and the global mix — the bounded, symmetric drift number for "
    "CATEGORICAL columns, complementing K90's PSI which needs binned "
    "numeric scores; JSD in bits is in [0,1], alert above ~0.1)",
)
def orders_priority_mix_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-vs-global priority-mix drift as Jensen-Shannon divergence:
    JSD(p‖q) = ½Σ p·ln(2p/(p+q)) + ½Σ q·ln(2q/(p+q)) over the dense
    month × priority spine (absent cells contribute only the q half).
    Each of the two per-cell terms quantizes at 1e-9 independently, so
    the |priorities|-bounded per-month reduction is order-insensitive
    and the nats→bits conversion is one spelled-identically division.

    Scale shape: a calendar-bounded (month, priority) agg and a
    |priorities| global agg (both map-side combined), a months×5 spine
    via broadcast cross join, and a months-bounded final agg. After the
    two first-pass aggs nothing scales with the order count."""
    o = load(spark, sf_dir, "orders")
    # ONE orders scan: the (month, priority) count is calendar-bounded, so
    # checkpoint it and derive the month totals, the global priority mix
    # AND the grand total from it (the tpch_q20 dual-consumer pattern —
    # without this, Catalyst re-scans orders once per consumer).
    mc = (
        o.groupBy(
            F.date_trunc("month", "o_orderdate").alias("month"),
            "o_orderpriority",
        )
        .agg(F.count("*").cast("bigint").alias("c"))
        .localCheckpoint()
    )
    months = mc.groupBy("month").agg(
        F.sum("c").cast("bigint").alias("nm")
    )
    glob = (
        mc.groupBy("o_orderpriority")
        .agg(F.sum("c").cast("bigint").alias("g"))
        .crossJoin(
            F.broadcast(mc.agg(F.sum("c").cast("bigint").alias("ng")))
        )
    )
    spine = (
        months.crossJoin(F.broadcast(glob))
        .join(F.broadcast(mc), ["month", "o_orderpriority"], "left")
        .select(
            "month",
            "nm",
            "g",
            "ng",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
        )
    )
    p = F.col("c").cast("double") / F.col("nm")
    q = F.col("g").cast("double") / F.col("ng")
    t1 = F.when(
        F.col("c") > 0,
        0.5 * p * F.log(2.0 * p / (p + q)) * 1000000000 + F.lit(0.5),
    ).otherwise(F.lit(0.0)).cast("long")
    t2 = F.when(
        F.col("g") > 0,
        0.5 * q * F.log(2.0 * q / (p + q)) * 1000000000 + F.lit(0.5),
    ).otherwise(F.lit(0.0)).cast("long")
    terms = spine.select("month", "nm", (t1 + t2).alias("tq"))
    q6 = lambda c: (c * 1000000 + F.lit(0.5)).cast("long").cast(
        "double"
    ) / 1000000.0
    return terms.groupBy("month").agg(
        F.max("nm").cast("bigint").alias("n_orders"),
        q6(F.sum("tq").cast("double") / 1000000000.0).alias("jsd_nats"),
        q6(
            F.sum("tq").cast("double") / 1000000000.0 / F.log(F.lit(2.0))
        ).alias("jsd_bits"),
    )


@query(
    "orders_nrr_cohort",
    oracle=f"""
    WITH first_o AS (
        SELECT o_custkey,
               CAST(MIN(date_part('year', o_orderdate)) AS INT) AS cohort
        FROM orders GROUP BY o_custkey
    ), rev AS (
        SELECT f.cohort,
               CAST(date_part('year', o.o_orderdate) AS INT) AS yr,
               {sql_dsum('o.o_totalprice')} AS revenue
        FROM orders o JOIN first_o f ON o.o_custkey = f.o_custkey
        GROUP BY 1, 2
    )
    SELECT cohort, yr, revenue,
           CAST(trunc(revenue / NULLIF(LAG(revenue) OVER (
                    PARTITION BY cohort ORDER BY yr), 0)
                * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS nrr
    FROM rev
    """,
    ref="SURVEY §2 D36 [EXT] (net revenue retention: each acquisition-"
    "year cohort's revenue ratioed against its own prior year — the "
    "expansion/contraction read on D25's cohort LTV curve (LTV says "
    "how much a cohort is worth, NRR says which direction it is "
    "moving); first-year rows have NULL NRR by construction)",
)
def orders_nrr_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net revenue retention by acquisition cohort: customers grouped by
    first-order year, cohort revenue per calendar year, and each year's
    revenue over the cohort's previous year. Revenue accumulates via
    the exact scaled-long dsum; the ratio is one double division over
    two already-quantized values (spelled identically), NULL on a
    zero/absent prior year.

    Scale shape: ONE orders scan — the cohort stamp is min(year) OVER
    (PARTITION BY o_custkey), so the customer grouping costs one
    o_custkey shuffle instead of an agg + self-join (two scans); then a
    (cohort × year) agg and a lag window on the years×cohorts-bounded
    grid. Nothing after the stamp window scales with order count."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    wc = Window.partitionBy("o_custkey")
    rev = (
        o.select(
            F.min(F.year("o_orderdate")).over(wc).cast("int").alias("cohort"),
            F.year("o_orderdate").cast("int").alias("yr"),
            "o_totalprice",
        )
        .groupBy("cohort", "yr")
        .agg(dsum("o_totalprice").alias("revenue"))
    )
    w = Window.partitionBy("cohort").orderBy("yr")
    q6 = lambda c: (c * 1000000 + F.lit(0.5)).cast("long").cast(
        "double"
    ) / 1000000.0
    return rev.select(
        "cohort",
        "yr",
        "revenue",
        q6(
            F.col("revenue")
            / F.nullif(F.lag("revenue").over(w), F.lit(0.0))
        ).alias("nrr"),
    )


@query(
    "orders_iso_week_revenue",
    oracle=f"""
    SELECT CAST(isoyear(o_orderdate) AS INT) AS iso_year,
           CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_dsum('o_totalprice')} AS revenue
    FROM orders
    GROUP BY 1, 2
    """,
    ref="SURVEY §2 D39 [EXT] (ISO-8601 week aggregation: fiscal weekly "
    "revenue keyed (iso_year, iso_week) — pins the week-53 / year-"
    "boundary semantics where Jan 1 can belong to the PREVIOUS iso "
    "year (2001-01-01 is 2001-W01 but 2021-01-01 is 2020-W53); naive "
    "year(o_orderdate) grouping silently splits those weeks in two)",
)
def orders_iso_week_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly revenue on the ISO calendar: the (yearofweek, weekofyear)
    pair keeps year-boundary weeks whole — grouping by plain year would
    split week 52/53 across two rows and corrupt week-over-week
    comparisons. Spark's weekofyear/yearofweek are ISO by definition;
    DuckDB spells them weekofyear/isoyear.

    Scale shape: one scan, one calendar-bounded hash agg with map-side
    combine; revenue is the exact scaled-long dsum."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy(
        F.expr("CAST(extract(YEAROFWEEK FROM o_orderdate) AS INT)").alias(
            "iso_year"
        ),
        F.weekofyear("o_orderdate").cast("int").alias("iso_week"),
    ).agg(
        F.count("*").cast("bigint").alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    )


@query(
    "customer_acctbal_jarque_bera",
    oracle=f"""
    WITH m AS (
        SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
               {sql_dsum('c_acctbal')} AS s1,
               {sql_dsum('c_acctbal * c_acctbal')} AS s2,
               {sql_dsum('c_acctbal * c_acctbal * c_acctbal / 1000.0')} AS s3k,
               {sql_dsum('(c_acctbal / 100.0) * (c_acctbal / 100.0) '
                         '* (c_acctbal / 100.0) * (c_acctbal / 100.0)')} AS s4m
        FROM customer GROUP BY c_mktsegment
    ), cm AS (
        SELECT c_mktsegment, n,
               s1 / n AS mu,
               s2 / n - (s1 / n) * (s1 / n) AS m2,
               s3k * 1000.0 / n - 3 * (s1 / n) * (s2 / n)
                   + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
               s4m * 100000000.0 / n
                   - 4 * (s1 / n) * (s3k * 1000.0 / n)
                   + 6 * (s1 / n) * (s1 / n) * (s2 / n)
                   - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
        FROM m
    )
    SELECT c_mktsegment, n,
           CAST(trunc(m3 / NULLIF(sqrt(m2) * m2, 0) * 1000000 + 0.5)
                AS BIGINT) / 1000000.0 AS skewness,
           CAST(trunc((m4 / NULLIF(m2 * m2, 0) - 3.0) * 1000000 + 0.5)
                AS BIGINT) / 1000000.0 AS excess_kurtosis,
           CAST(trunc(CAST(n AS DOUBLE) / 6.0
                * ((m3 / NULLIF(sqrt(m2) * m2, 0))
                   * (m3 / NULLIF(sqrt(m2) * m2, 0))
                   + (m4 / NULLIF(m2 * m2, 0) - 3.0)
                     * (m4 / NULLIF(m2 * m2, 0) - 3.0) / 4.0)
                * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS jarque_bera
    FROM cm
    """,
    ref="SURVEY §2 D40 [EXT] (Jarque-Bera normality test per market "
    "segment: JB = n/6·(S² + K²/4) from exact central moments — the "
    "screen run before parametric assumptions (z-tests, control "
    "charts) are trusted on a balance distribution; moments via the "
    "agg_skew scaled-sum discipline, 4th-power sums pre-scaled to "
    "keep the 1e6-scaled accumulator in range)",
)
def customer_acctbal_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness, excess kurtosis and the Jarque-Bera statistic of
    account balances per market segment. Raw power sums accumulate via
    exact scaled longs — the cubic sum pre-divides by 1e3 and the
    quartic by 1e8 (acctbal ~1e4, so x⁴ ~1e16 would overflow the 1e6-
    scaled accumulator; the pre-scale keeps every addend in range and
    is undone exactly in the moment algebra). One identically-spelled
    double chain per output.

    Scale shape: one scan, one |segments|-group moment agg with
    map-side combine; closed-form solve per group."""
    c = load(spark, sf_dir, "customer")
    x = F.col("c_acctbal")
    m = c.groupBy("c_mktsegment").agg(
        F.count("*").cast("bigint").alias("n"),
        dsum(x).alias("s1"),
        dsum(x * x).alias("s2"),
        dsum(x * x * x / 1000.0).alias("s3k"),
        dsum((x / 100.0) * (x / 100.0) * (x / 100.0) * (x / 100.0)).alias(
            "s4m"
        ),
    )
    n = F.col("n")
    mu = F.col("s1") / n
    m2 = F.col("s2") / n - mu * mu
    m3 = (
        F.col("s3k") * 1000.0 / n
        - 3 * mu * (F.col("s2") / n)
        + 2 * mu * mu * mu
    )
    m4 = (
        F.col("s4m") * 100000000.0 / n
        - 4 * mu * (F.col("s3k") * 1000.0 / n)
        + 6 * mu * mu * (F.col("s2") / n)
        - 3 * mu * mu * mu * mu
    )
    skew = m3 / F.nullif(F.sqrt(m2) * m2, F.lit(0.0))
    exk = m4 / F.nullif(m2 * m2, F.lit(0.0)) - 3.0
    q6 = lambda cc: (cc * 1000000 + F.lit(0.5)).cast("long").cast(
        "double"
    ) / 1000000.0
    return m.select(
        "c_mktsegment",
        "n",
        q6(skew).alias("skewness"),
        q6(exk).alias("excess_kurtosis"),
        q6(n.cast("double") / 6.0 * (skew * skew + exk * exk / 4.0)).alias(
            "jarque_bera"
        ),
    )


@query(
    "events_user_activity_powerlaw",
    oracle="""
    WITH act AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY user_id
    ), tail AS (
        SELECT c,
               CAST(trunc(ln(CAST(c AS DOUBLE) / 50.0) * 1000000000 + 0.5)
                    AS BIGINT) AS lq
        FROM act WHERE c >= 50
    )
    SELECT CAST(50 AS BIGINT) AS xmin,
           CAST(COUNT(*) AS BIGINT) AS n_tail,
           CAST(trunc((1.0 + CAST(COUNT(*) AS DOUBLE)
                / NULLIF(CAST(SUM(lq) AS DOUBLE) / 1000000000.0, 0))
                * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS alpha_hat
    FROM tail
    """,
    ref="SURVEY §2 D41 [EXT] (heavy-tail exponent of user activity: the "
    "Hill / Clauset-Shalizi-Newman MLE alpha = 1 + n/Σln(x/xmin) over "
    "users with >= xmin events — alpha near 2 means a few users "
    "dominate (skew-join risk, K36's diagnosis), large alpha means "
    "homogeneous traffic; the user-dimension sibling of K78's word "
    "Zipf slope, closed-form, NO rank or sort)",
)
def events_user_activity_powerlaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete power-law tail fit of events-per-user: the continuous
    MLE alpha_hat = 1 + n_tail / Σ ln(x_i / xmin) at fixed xmin = 50.
    Each ln term quantizes at 1e-9 (trunc discipline) so the reduction
    is exact integer addition; one double chain at the end. The
    estimated alpha quantifies how concentrated activity is — the
    number that predicts whether user-keyed shuffles need salting.

    Scale shape: one user agg (map-side combined), a filtered
    tail-sized term pass, a 1-row reduction. No sort anywhere — the
    fixed-xmin form needs no order statistics."""
    ev = load(spark, sf_dir, "events")
    act = ev.groupBy("user_id").agg(F.count("*").cast("bigint").alias("c"))
    tail = act.where(F.col("c") >= 50).select(
        (
            F.log(F.col("c").cast("double") / 50.0) * 1000000000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("lq")
    )
    q6 = lambda cc: (cc * 1000000 + F.lit(0.5)).cast("long").cast(
        "double"
    ) / 1000000.0
    return tail.agg(
        F.lit(50).cast("bigint").alias("xmin"),
        F.count("*").cast("bigint").alias("n_tail"),
        q6(
            1.0
            + F.count("*").cast("double")
            / F.nullif(
                F.sum("lq").cast("double") / 1000000000.0, F.lit(0.0)
            )
        ).alias("alpha_hat"),
    )


@query(
    "orders_control_chart_xbar",
    oracle=f"""
    WITH g AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               {sql_dsum('o_totalprice')} AS s1,
               {sql_dsum1('o_totalprice * o_totalprice / 1000.0')} AS s2k
        FROM orders
    ), mth AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
               CAST(COUNT(*) AS BIGINT) AS nm,
               {sql_dsum('o_totalprice')} AS sm
        FROM orders GROUP BY 1
    )
    SELECT month, nm,
           CAST(trunc(sm / nm * 1000000 + 0.5) AS BIGINT) / 1000000.0
               AS xbar,
           CAST(trunc(s1 / n * 1000000 + 0.5) AS BIGINT) / 1000000.0
               AS center,
           CAST(trunc((s1 / n - 3.0 * sqrt((s2k * 1000.0 / n
                       - (s1 / n) * (s1 / n)) / nm))
                * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS lcl,
           CAST(trunc((s1 / n + 3.0 * sqrt((s2k * 1000.0 / n
                       - (s1 / n) * (s1 / n)) / nm))
                * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS ucl,
           CAST(CASE WHEN sm / nm < s1 / n - 3.0 * sqrt((s2k * 1000.0 / n
                          - (s1 / n) * (s1 / n)) / nm)
                       OR sm / nm > s1 / n + 3.0 * sqrt((s2k * 1000.0 / n
                          - (s1 / n) * (s1 / n)) / nm)
                THEN 1 ELSE 0 END AS INT) AS out_of_control
    FROM mth, g
    """,
    ref="SURVEY §2 D43 [EXT] (x-bar control chart: monthly subgroup "
    "means against center ± 3σ/√n_m limits from global moments "
    "(Shewhart) — the process-stability read that separates common-"
    "cause noise from assignable shifts; variance sum pre-scaled /1e3 "
    "to keep the exact accumulator in range, the D40 discipline)",
)
def orders_control_chart_xbar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart x-bar chart over monthly order values: each month's mean
    against control limits center ± 3σ/√n_m (σ from the global moments,
    n_m the month's subgroup size), plus the out-of-control flag. All
    sums are exact scaled longs; the squared-price sum pre-divides by
    1e3 AND accumulates at integer scale (dsum1) — at the 1e-6 scale
    price² already overflows the long accumulator at sf0.1. The limits
    are one double chain reused verbatim in the flag comparison so
    flag and bounds can never disagree.

    Scale shape: two aggs over one scan each (global moments broadcast
    as a 1-row cross join; monthly means calendar-bounded)."""
    o = load(spark, sf_dir, "orders")
    x = F.col("o_totalprice")
    g = o.agg(
        F.count("*").cast("bigint").alias("n"),
        dsum(x).alias("s1"),
        dsum1(x * x / 1000.0).alias("s2k"),
    )
    mth = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(
        F.count("*").cast("bigint").alias("nm"),
        dsum(x).alias("sm"),
    )
    mu = F.col("s1") / F.col("n")
    var = F.col("s2k") * 1000.0 / F.col("n") - mu * mu
    half = 3.0 * F.sqrt(var / F.col("nm"))
    xbar = F.col("sm") / F.col("nm")
    q6 = lambda c: (c * 1000000 + F.lit(0.5)).cast("long").cast(
        "double"
    ) / 1000000.0
    return mth.crossJoin(F.broadcast(g)).select(
        "month",
        "nm",
        q6(xbar).alias("xbar"),
        q6(mu).alias("center"),
        q6(mu - half).alias("lcl"),
        q6(mu + half).alias("ucl"),
        F.when((xbar < mu - half) | (xbar > mu + half), 1)
        .otherwise(0)
        .cast("int")
        .alias("out_of_control"),
    )


@query(
    "orders_id_gap_audit",
    oracle="""
    WITH keyed AS (
        SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 97 <> 0
    ), lagged AS (
        SELECT k, LAG(k) OVER (ORDER BY k) AS prev FROM keyed
    )
    SELECT prev + 1 AS gap_start, k - 1 AS gap_end,
           CAST(k - prev - 1 AS BIGINT) AS n_missing
    FROM lagged WHERE prev IS NOT NULL AND k - prev > 1
    """,
    ref="SURVEY §2 D44 [EXT] (id-sequence gap audit: every missing run "
    "in a surrogate-key sequence — the lost-data / failed-ingest "
    "detector; the every-97th filter plants deterministic gaps. "
    "Global LAG is the textbook Exchange-SinglePartition trap, so "
    "this rides the NEW ranged_lag scale primitive "
    "(operators/scale.py): range-partition, lag locally, stitch "
    "boundaries with a #partitions-row driver pass)",
)
def orders_id_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-id runs in the (gap-planted) orderkey sequence:
    (gap_start, gap_end, n_missing) per hole. The global
    consecutive-pair comparison uses ranged_lag — the distributed form
    of LAG() OVER (ORDER BY k) — so no single-partition window exists
    at any scale; the oracle spells the naive global window, proving
    the decomposition exact.

    Scale shape: repartitionByRange on the key (the one necessary
    exchange), per-partition window, #partitions-row boundary stitch,
    narrow filter. Output is gap-count-sized."""
    from ksql_spark.operators.scale import ranged_lag

    o = load(spark, sf_dir, "orders")
    keyed = o.where(F.col("o_orderkey") % 97 != 0).select(
        F.col("o_orderkey").alias("k")
    )
    lagged = ranged_lag(keyed, ["k"], "k", out_col="prev")
    return lagged.where(
        F.col("prev").isNotNull() & (F.col("k") - F.col("prev") > 1)
    ).select(
        (F.col("prev") + 1).alias("gap_start"),
        (F.col("k") - 1).alias("gap_end"),
        (F.col("k") - F.col("prev") - 1).cast("bigint").alias("n_missing"),
    )


@query(
    "dq_rules_lineitem",
    oracle="""
    WITH c AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1
                        THEN 1 ELSE 0 END) AS BIGINT) AS v1,
               CAST(SUM(CASE WHEN l_tax < 0 THEN 1 ELSE 0 END) AS BIGINT) AS v2,
               CAST(SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS v3,
               CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
                        THEN 1 ELSE 0 END) AS BIGINT) AS v4,
               CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS v5
        FROM lineitem
    )
    SELECT rule, n AS n_checked, v AS n_violations,
           CAST(trunc(CAST(v AS DOUBLE) / n * 1000000 + 0.5) AS BIGINT)
               / 1000000.0 AS violation_rate
    FROM (
        SELECT 'discount_in_0_0.1' AS rule, n, v1 AS v FROM c
        UNION ALL SELECT 'tax_non_negative', n, v2 FROM c
        UNION ALL SELECT 'price_positive', n, v3 FROM c
        UNION ALL SELECT 'quantity_1_to_50', n, v4 FROM c
        UNION ALL SELECT 'shipdate_not_null', n, v5 FROM c
    )
    """,
    ref="SURVEY §2 D45 [EXT] (declarative data-quality rule audit: "
    "domain/nullability/range invariants evaluated as counters in ONE "
    "scan, reported one row per rule — the dbt-test / Great-"
    "Expectations pattern as a query; rules over lineitem's documented "
    "TPC-H domains)",
)
def dq_rules_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five data-quality invariants over lineitem (discount domain, tax
    sign, positive price, quantity range, shipdate presence), each
    reported as (rule, n_checked, n_violations, rate). All five rules
    evaluate in ONE pass as conditional counters; the per-rule rows
    come from a 1-row stack, not five scans.

    Scale shape: one scan -> 1-row agg (map-side combined) -> stack to
    5 rows. Adding a rule adds a counter, never a pass."""
    li = load(spark, sf_dir, "lineitem")
    c = li.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(
            F.when(
                (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("v1"),
        F.sum(F.when(F.col("l_tax") < 0, 1).otherwise(0))
        .cast("bigint")
        .alias("v2"),
        F.sum(F.when(F.col("l_extendedprice") <= 0, 1).otherwise(0))
        .cast("bigint")
        .alias("v3"),
        F.sum(
            F.when(
                (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("v4"),
        F.sum(F.when(F.col("l_shipdate").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("v5"),
    )
    stacked = c.select(
        F.expr(
            """
            stack(5,
                'discount_in_0_0.1', v1,
                'tax_non_negative', v2,
                'price_positive', v3,
                'quantity_1_to_50', v4,
                'shipdate_not_null', v5) AS (rule, v)
            """
        ),
        "n",
    )
    q6 = lambda cc: (cc * 1000000 + F.lit(0.5)).cast("long").cast(
        "double"
    ) / 1000000.0
    return stacked.select(
        "rule",
        F.col("n").alias("n_checked"),
        F.col("v").alias("n_violations"),
        q6(F.col("v").cast("double") / F.col("n")).alias("violation_rate"),
    )


@query(
    "orders_duplicate_payment_pairs",
    oracle="""
    SELECT a.o_orderkey AS order_a, b.o_orderkey AS order_b,
           a.o_custkey AS custkey, a.o_totalprice AS amount,
           CAST(date_diff('day', a.o_orderdate, b.o_orderdate) AS BIGINT)
               AS days_apart
    FROM orders a JOIN orders b
      ON a.o_custkey = b.o_custkey
     AND a.o_totalprice = b.o_totalprice
     AND a.o_orderkey < b.o_orderkey
     AND b.o_orderdate >= a.o_orderdate
     AND b.o_orderdate <= a.o_orderdate + INTERVAL 7 DAY
    """,
    ref="SURVEY §2 D46 [EXT] (duplicate-payment detection: same "
    "customer, identical amount, within 7 days — the classic AP/fraud "
    "double-charge screen; the join keys on (custkey, amount) so "
    "candidate groups are exact-amount collisions only, with the date "
    "band as a residual — never a time-band self-join across "
    "different amounts)",
)
def orders_duplicate_payment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered pairs of orders by the same customer for the identical
    total amount within a 7-day window — double-charge / replayed-
    payment candidates. The equality keys (custkey, totalprice) carry
    the join; the week band and id ordering are residual filters, so
    per-key fan-out is bounded by exact-amount collision counts (rare
    by construction in real ledgers, and salted like any hot key if a
    unit amount dominates).

    Scale shape: one shuffled equi-join on (custkey, amount) — both
    sides the same scan, co-partitioned; exact-integer day distance."""
    o = load(spark, sf_dir, "orders")
    a, b = o.alias("a"), o.alias("b")
    return a.join(
        b,
        (F.col("a.o_custkey") == F.col("b.o_custkey"))
        & (F.col("a.o_totalprice") == F.col("b.o_totalprice"))
        & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
        & (F.col("b.o_orderdate") >= F.col("a.o_orderdate"))
        & (
            F.col("b.o_orderdate")
            <= F.col("a.o_orderdate") + F.expr("INTERVAL 7 DAY")
        ),
    ).select(
        F.col("a.o_orderkey").alias("order_a"),
        F.col("b.o_orderkey").alias("order_b"),
        F.col("a.o_custkey").alias("custkey"),
        F.col("a.o_totalprice").alias("amount"),
        F.datediff(F.col("b.o_orderdate"), F.col("a.o_orderdate"))
        .cast("bigint")
        .alias("days_apart"),
    )


_H_SPLIT = "TIMESTAMP '1998-07-01 00:00:00'"


@query(
    "customer_value_migration",
    oracle=f"""
    WITH per AS (
        SELECT o_custkey AS custkey,
               {sql_dsum(f"CASE WHEN o_orderdate < {_H_SPLIT} "
                         "THEN o_totalprice END")} AS rev1,
               {sql_dsum(f"CASE WHEN o_orderdate >= {_H_SPLIT} "
                         "THEN o_totalprice END")} AS rev2
        FROM orders GROUP BY o_custkey
    ), thr AS (
        SELECT quantile_cont(rev1, 0.333) AS a1,
               quantile_cont(rev1, 0.667) AS b1,
               quantile_cont(rev2, 0.333) AS a2,
               quantile_cont(rev2, 0.667) AS b2
        FROM per
    ), banded AS (
        SELECT CASE WHEN rev1 IS NULL THEN 'inactive'
                    WHEN rev1 <= a1 THEN 'low'
                    WHEN rev1 <= b1 THEN 'mid' ELSE 'high' END AS band_h1,
               CASE WHEN rev2 IS NULL THEN 'inactive'
                    WHEN rev2 <= a2 THEN 'low'
                    WHEN rev2 <= b2 THEN 'mid' ELSE 'high' END AS band_h2
        FROM per, thr
    )
    SELECT band_h1, band_h2, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM banded GROUP BY band_h1, band_h2
    """,
    ref="SURVEY §2 D48 [EXT] (customer value migration: revenue "
    "terciles per half-period cross-tabbed into the 4×4 "
    "low/mid/high/inactive transition matrix — the upgrade/downgrade/"
    "churn flow view on top of D22's point-in-time RFM; thresholds are "
    "within-half quantiles so the bands are relative, not inflation-"
    "biased)",
)
def customer_value_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Where did each customer's value band move between the two halves
    of the observed range: per-customer revenue in each half (exact
    dsum; NULL = inactive that half), within-half tercile thresholds
    (exact interpolated percentiles, the agg_quantiles proof), and the
    4×4 band-transition matrix.

    Scale shape: ONE orders scan -> per-customer conditional agg (the
    corpus pass, map-side combined); thresholds are a 1-row broadcast
    over that bounded table; the matrix agg is 16 rows."""
    o = load(spark, sf_dir, "orders")
    split = F.expr(_H_SPLIT)
    per = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        dsum(
            F.when(F.col("o_orderdate") < split, F.col("o_totalprice"))
        ).alias("rev1"),
        dsum(
            F.when(F.col("o_orderdate") >= split, F.col("o_totalprice"))
        ).alias("rev2"),
    ).localCheckpoint()
    thr = per.agg(
        F.expr("percentile(rev1, 0.333)").alias("a1"),
        F.expr("percentile(rev1, 0.667)").alias("b1"),
        F.expr("percentile(rev2, 0.333)").alias("a2"),
        F.expr("percentile(rev2, 0.667)").alias("b2"),
    )
    band = lambda rev, a, b: (
        F.when(F.col(rev).isNull(), "inactive")
        .when(F.col(rev) <= F.col(a), "low")
        .when(F.col(rev) <= F.col(b), "mid")
        .otherwise("high")
    )
    return (
        per.crossJoin(F.broadcast(thr))
        .select(
            band("rev1", "a1", "b1").alias("band_h1"),
            band("rev2", "a2", "b2").alias("band_h2"),
        )
        .groupBy("band_h1", "band_h2")
        .agg(F.count("*").cast("bigint").alias("n_customers"))
    )


@query(
    "orders_seasonal_naive_backtest",
    oracle=f"""
    WITH m AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
               {sql_dsum('o_totalprice')} AS revenue
        FROM orders GROUP BY 1
    )
    SELECT month, revenue,
           LAG(revenue, 12) OVER (ORDER BY month) AS forecast,
           CAST(trunc(abs(revenue - LAG(revenue, 12) OVER (ORDER BY month))
                * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS abs_error,
           CAST(trunc(abs(revenue - LAG(revenue, 12) OVER (ORDER BY month))
                / NULLIF(revenue, 0) * 1000000 + 0.5) AS BIGINT)
               / 1000000.0 AS ape
    FROM m
    """,
    ref="SURVEY §2 D49 [EXT] (seasonal-naive forecast backtest: "
    "forecast(m) = revenue(m-12), per-month absolute and percentage "
    "error — the BASELINE every fancier forecaster (K82 Holt-Winters, "
    "K83 seasonality index) must beat before it earns production; "
    "first 12 months have NULL forecast honestly. The month window is "
    "calendar-bounded, so the global LAG is a dozens-of-rows frame, "
    "not a data-sized SinglePartition hazard)",
)
def orders_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the seasonal-naive forecaster on monthly revenue:
    each month predicted by the same month last year, with absolute
    error and APE per month (mean of ape = MAPE). Revenue is the exact
    dsum; errors are single quantized chains over two already-quantized
    values — LAG of an exact value stays exact.

    Scale shape: one scan -> calendar-bounded month agg; the lag-12
    window runs over ~80 rows regardless of data size (the D18
    monthly-growth posture)."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(dsum("o_totalprice").alias("revenue"))
    w = Window.orderBy("month")
    fc = F.lag("revenue", 12).over(w)
    q6 = lambda c: (c * 1000000 + F.lit(0.5)).cast("long").cast(
        "double"
    ) / 1000000.0
    return m.select(
        "month",
        "revenue",
        fc.alias("forecast"),
        q6(F.abs(F.col("revenue") - fc)).alias("abs_error"),
        q6(
            F.abs(F.col("revenue") - fc)
            / F.nullif(F.col("revenue"), F.lit(0.0))
        ).alias("ape"),
    )


@query(
    "supplier_scorecard",
    oracle=f"""
    WITH per AS (
        SELECT l_suppkey AS suppkey,
               {sql_dsum('l_quantity')} AS qty,
               {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
               CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts
        FROM lineitem GROUP BY l_suppkey
    ), mm AS (
        SELECT MIN(qty) AS qmin, MAX(qty) AS qmax,
               MIN(revenue) AS rmin, MAX(revenue) AS rmax,
               MIN(n_parts) AS pmin, MAX(n_parts) AS pmax
        FROM per
    ), scored AS (
        SELECT suppkey, qty, revenue, n_parts,
               CAST(trunc(
                   (0.4 * (qty - qmin) / NULLIF(qmax - qmin, 0)
                    + 0.4 * (revenue - rmin) / NULLIF(rmax - rmin, 0)
                    + 0.2 * CAST(n_parts - pmin AS DOUBLE)
                      / NULLIF(pmax - pmin, 0))
                   * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS composite
        FROM per, mm
    )
    SELECT suppkey, qty, revenue, n_parts, composite,
           CASE WHEN composite >= 0.6 THEN 'A'
                WHEN composite >= 0.4 THEN 'B' ELSE 'C' END AS grade
    FROM scored
    """,
    ref="SURVEY §2 D50 [EXT] (composite KPI scorecard: three supplier "
    "metrics min-max normalized against the population and blended "
    "0.4/0.4/0.2 into a graded score — the vendor-management staple; "
    "normalization bounds are a 1-row broadcast, the grade thresholds "
    "reuse the SAME quantized composite so band and score cannot "
    "disagree)",
)
def supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded supplier scorecard: shipped quantity, discounted revenue
    and assortment breadth per supplier, each min-max normalized over
    the supplier population, blended into a composite and banded
    A/B/C. Metrics accumulate via exact dsum; the composite is one
    double chain quantized once and the grade compares that quantized
    value.

    Scale shape: one lineitem scan -> supplier agg (map-side combined;
    the distinct-part count is the only expanding term and keys on the
    same shuffle), 1-row min/max broadcast, narrow scoring pass."""
    li = load(spark, sf_dir, "lineitem")
    per = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        dsum("l_quantity").alias("qty"),
        dsum(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).alias("revenue"),
        F.count_distinct("l_partkey").cast("bigint").alias("n_parts"),
    ).localCheckpoint()  # supplier-bounded; two consumers (bounds + scoring)
    mm = per.agg(
        F.min("qty").alias("qmin"),
        F.max("qty").alias("qmax"),
        F.min("revenue").alias("rmin"),
        F.max("revenue").alias("rmax"),
        F.min("n_parts").alias("pmin"),
        F.max("n_parts").alias("pmax"),
    )
    norm = lambda v, lo, hi: (F.col(v) - F.col(lo)) / F.nullif(
        F.col(hi) - F.col(lo), F.lit(0.0)
    )
    comp = (
        0.4 * norm("qty", "qmin", "qmax")
        + 0.4 * norm("revenue", "rmin", "rmax")
        + 0.2
        * (F.col("n_parts") - F.col("pmin")).cast("double")
        / F.nullif(
            (F.col("pmax") - F.col("pmin")).cast("double"), F.lit(0.0)
        )
    )
    q6 = lambda c: (c * 1000000 + F.lit(0.5)).cast("long").cast(
        "double"
    ) / 1000000.0
    scored = per.crossJoin(F.broadcast(mm)).select(
        "suppkey",
        "qty",
        "revenue",
        "n_parts",
        q6(comp).alias("composite"),
    )
    return scored.select(
        "*",
        F.when(F.col("composite") >= 0.6, "A")
        .when(F.col("composite") >= 0.4, "B")
        .otherwise("C")
        .alias("grade"),
    )


@query(
    "orders_weekday_weekend_ttest",
    oracle=f"""
    WITH g AS (
        SELECT CASE WHEN dayofweek(o_orderdate) IN (0, 6)
                    THEN 'weekend' ELSE 'weekday' END AS grp,
               o_totalprice AS x
        FROM orders
    ), m AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
               {sql_dsum('x')} AS s1,
               {sql_dsum1('x * x / 1000.0')} AS s2k
        FROM g GROUP BY grp
    ), wide AS (
        SELECT
            MAX(CASE WHEN grp = 'weekday' THEN n END) AS n1,
            MAX(CASE WHEN grp = 'weekday' THEN s1 END) AS a1,
            MAX(CASE WHEN grp = 'weekday' THEN s2k END) AS b1,
            MAX(CASE WHEN grp = 'weekend' THEN n END) AS n2,
            MAX(CASE WHEN grp = 'weekend' THEN s1 END) AS a2,
            MAX(CASE WHEN grp = 'weekend' THEN s2k END) AS b2
        FROM m
    )
    SELECT n1, n2,
           CAST(trunc(a1 / n1 * 1000000 + 0.5) AS BIGINT) / 1000000.0
               AS mean_weekday,
           CAST(trunc(a2 / n2 * 1000000 + 0.5) AS BIGINT) / 1000000.0
               AS mean_weekend,
           CAST(trunc(
               (a1 / n1 - a2 / n2)
               / NULLIF(sqrt(
                   (b1 * 1000.0 / n1 - (a1 / n1) * (a1 / n1)) / (n1 - 1)
                   + (b2 * 1000.0 / n2 - (a2 / n2) * (a2 / n2))
                     / (n2 - 1)), 0)
               * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS welch_t
    FROM wide
    """,
    ref="SURVEY §2 D53 [EXT] (Welch's unequal-variance t-test: weekday "
    "vs weekend order values — the two-sample mean comparison that, "
    "unlike pooled Student's t, survives the unequal group sizes and "
    "variances real business splits always have; sample variances "
    "from exact moments (n-1 denominator), one double chain)",
)
def orders_weekday_weekend_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's t statistic for weekday vs weekend mean order value:
    t = (m1 - m2) / sqrt(s1²/n1 + s2²/n2) with sample variances from
    exact scaled-long moments (the squared sums at integer scale, the
    D43 overflow discipline). Spark dayofweek is 1=Sunday..7; DuckDB
    dayofweek is 0=Sunday..6 — the weekend test pins that mapping too.

    Scale shape: one scan, a 2-group moment agg, a 1-row pivot, closed
    form."""
    o = load(spark, sf_dir, "orders")
    g = o.select(
        F.when(F.dayofweek("o_orderdate").isin(1, 7), "weekend")
        .otherwise("weekday")
        .alias("grp"),
        F.col("o_totalprice").alias("x"),
    )
    m = g.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("n"),
        dsum("x").alias("s1"),
        dsum1(F.col("x") * F.col("x") / 1000.0).alias("s2k"),
    )
    pick = lambda grp, col: F.max(
        F.when(F.col("grp") == grp, F.col(col))
    )
    wide = m.agg(
        pick("weekday", "n").alias("n1"),
        pick("weekday", "s1").alias("a1"),
        pick("weekday", "s2k").alias("b1"),
        pick("weekend", "n").alias("n2"),
        pick("weekend", "s1").alias("a2"),
        pick("weekend", "s2k").alias("b2"),
    )
    m1 = F.col("a1") / F.col("n1")
    m2 = F.col("a2") / F.col("n2")
    # population variance / (n-1) IS s²/n — the Welch standard-error term
    v1 = (F.col("b1") * 1000.0 / F.col("n1") - m1 * m1) / (F.col("n1") - 1)
    v2 = (F.col("b2") * 1000.0 / F.col("n2") - m2 * m2) / (F.col("n2") - 1)
    q6 = lambda c: (c * 1000000 + F.lit(0.5)).cast("long").cast(
        "double"
    ) / 1000000.0
    return wide.select(
        "n1",
        "n2",
        q6(m1).alias("mean_weekday"),
        q6(m2).alias("mean_weekend"),
        q6((m1 - m2) / F.nullif(F.sqrt(v1 + v2), F.lit(0.0))).alias(
            "welch_t"
        ),
    )


@query(
    "lineitem_linenumber_completeness",
    oracle="""
    WITH per AS (
        SELECT l_orderkey,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(MIN(l_linenumber) AS BIGINT) AS mn,
               CAST(MAX(l_linenumber) AS BIGINT) AS mx
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN mn = 1 AND mx = n_lines THEN 1 ELSE 0 END)
                AS BIGINT) AS n_complete,
           CAST(SUM(CASE WHEN mn = 1 AND mx = n_lines THEN 0 ELSE 1 END)
                AS BIGINT) AS n_holey,
           CAST(SUM(mx - n_lines + (mn - 1)) AS BIGINT) AS n_missing_lines
    FROM per
    """,
    ref="SURVEY §2 D54 [EXT] (child-sequence completeness audit: every "
    "order's linenumbers must be exactly 1..count — min=1 and "
    "max=count detect any hole or offset without materializing the "
    "expected sequence; the per-parent companion of D44's global "
    "id-gap audit, and the referential-completeness check every "
    "order/line ingest should run)",
)
def lineitem_linenumber_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row completeness report over order line numbers: an order is
    complete iff its linenumbers are exactly the contiguous 1..count
    run (min = 1 ∧ max = count ⇔ no holes, no offset, since
    linenumbers are unique per order); also the total number of
    missing positions implied by max-vs-count plus any leading offset.
    All integer arithmetic.

    Scale shape: one scan -> per-order agg keyed on the natural
    l_orderkey (map-side combined) -> 1-row rollup."""
    li = load(spark, sf_dir, "lineitem")
    per = li.groupBy("l_orderkey").agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.min("l_linenumber").cast("bigint").alias("mn"),
        F.max("l_linenumber").cast("bigint").alias("mx"),
    )
    complete = (F.col("mn") == 1) & (F.col("mx") == F.col("n_lines"))
    return per.agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum(F.when(complete, 1).otherwise(0))
        .cast("bigint")
        .alias("n_complete"),
        F.sum(F.when(complete, 0).otherwise(1))
        .cast("bigint")
        .alias("n_holey"),
        F.sum(F.col("mx") - F.col("n_lines") + (F.col("mn") - 1))
        .cast("bigint")
        .alias("n_missing_lines"),
    )


@query(
    "orders_revenue_drawdown",
    oracle="""
    WITH d AS (
        SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
               SUM(CAST(trunc(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev_c
        FROM orders GROUP BY 1
    ), t AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(rev_c) AS BIGINT) AS total_c
        FROM d
    ), c AS (
        SELECT day, rev_c, n,
               CAST(SUM(n * rev_c - total_c) OVER (
                   ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_q
        FROM d, t
    ), p AS (
        SELECT day, rev_c, n, cum_q,
               CAST(MAX(cum_q) OVER (
                   ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS peak_q
        FROM c
    )
    SELECT day,
           CAST(rev_c AS DOUBLE) / 100.0 AS daily_revenue,
           CAST(peak_q - cum_q AS BIGINT) AS drawdown_q,
           CAST(peak_q - cum_q AS DOUBLE) / n / 100.0 AS drawdown,
           CAST(CASE WHEN peak_q - cum_q > 0 THEN 1 ELSE 0 END AS INT)
               AS underwater
    FROM p
    """,
    ref="SURVEY §2 D55 [EXT] (drawdown / underwater curve: daily revenue "
    "as an equity curve — cumulative deviation from the overall daily "
    "mean — with running peak and per-day decline from that peak; the "
    "classic peak-to-trough risk readout. The deviation is scaled by "
    "n_days (n·rev − total) so cumsum, peak and drawdown stay exact "
    "integers end to end; descaling by n·100 happens only at emit)",
)
def orders_revenue_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Underwater curve of the daily-revenue equity line. The mean-
    deviation trick keeps everything integral: dev(d) = n·rev_c(d) −
    total_c sums to an exact long cumsum whose running max is the peak;
    drawdown_q = peak − cum ≥ 0 exactly, and the only doubles are the
    final descales (identically spelled in the oracle).

    Scale shape: one scan -> calendar-bounded day agg (the only
    data-sized exchange); the cumsum/peak windows run over <=2,500
    day rows regardless of SF (the D18/D49 calendar-bounded posture),
    with the 1-row totals broadcast back."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    d = o.groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("day")).agg(
        F.sum(
            (F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("rev_c")
    )
    t = d.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("rev_c").cast("bigint").alias("total_c"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    c = (
        d.crossJoin(F.broadcast(t))
        .withColumn(
            "cum_q",
            F.sum(F.col("n") * F.col("rev_c") - F.col("total_c")).over(w),
        )
        .withColumn("peak_q", F.max("cum_q").over(w))
    )
    dd = F.col("peak_q") - F.col("cum_q")
    return c.select(
        "day",
        (F.col("rev_c").cast("double") / 100.0).alias("daily_revenue"),
        dd.cast("long").alias("drawdown_q"),
        (dd.cast("double") / F.col("n") / 100.0).alias("drawdown"),
        F.when(dd > 0, 1).otherwise(0).cast("int").alias("underwater"),
    )


@query(
    "orders_theil_sen_trend",
    oracle="""
    WITH d AS (
        SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
               CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
               SUM(CAST(trunc(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev_c
        FROM orders GROUP BY 1, 2
    ), pairs AS (
        SELECT a.yr AS yr,
               CAST(trunc(CAST(b.rev_c - a.rev_c AS DOUBLE)
                    / date_diff('day', a.day, b.day) * 100 + 0.5)
                    AS BIGINT) AS slope_q
        FROM d a JOIN d b
          ON a.yr = b.yr AND b.day > a.day
         AND date_diff('day', a.day, b.day) <= 45
    ), nd AS (
        SELECT yr, CAST(COUNT(*) AS BIGINT) AS n_days FROM d GROUP BY yr
    )
    SELECT p.yr AS yr, nd.n_days,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(trunc(median(p.slope_q) / 10000.0 * 1000000 + 0.5)
                AS BIGINT) / 1000000.0 AS median_slope
    FROM pairs p JOIN nd ON nd.yr = p.yr
    GROUP BY p.yr, nd.n_days
    """,
    ref="SURVEY §2 D56 [EXT] (Theil-Sen robust trend: per year, the "
    "median of pairwise daily-revenue slopes over day pairs at most 45 "
    "days apart — the 29%-breakdown-point slope estimator that one "
    "holiday spike cannot drag the way the D43/K115 least-squares lines "
    "can; slopes quantized from exact cent-level day revenues, median "
    "interpolation identical in both engines on integer inputs)",
)
def orders_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-of-slopes robust trend per year. Day revenues are exact
    cent-scaled longs; each pair slope is one double division quantized
    at 1e-4 dollars/day, so the median runs over exact integers (the
    even-count midpoint interpolation (a+b)/2 is exact in both engines
    for integer operands).

    Scale shape: one scan -> calendar-bounded day agg; the pair join is
    year-keyed over <=366-row sides with a <=45-day span cap, so the
    pair space is calendar-bounded (<=16k pairs/year) at ANY corpus
    size — never a data-sized cross product."""
    o = load(spark, sf_dir, "orders")
    d = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day"),
        F.year("o_orderdate").cast("int").alias("yr"),
    ).agg(
        F.sum(
            (F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("rev_c")
    )
    a = d.alias("a")
    b = d.alias("b")
    gap = F.datediff(F.col("b.day"), F.col("a.day"))
    pairs = a.join(
        b,
        (F.col("a.yr") == F.col("b.yr"))
        & (F.col("b.day") > F.col("a.day"))
        & (gap <= 45),
    ).select(
        F.col("a.yr").alias("yr"),
        (
            (F.col("b.rev_c") - F.col("a.rev_c")).cast("double")
            / gap
            * 100
            + F.lit(0.5)
        )
        .cast("long")
        .alias("slope_q"),
    )
    nd = d.groupBy("yr").agg(F.count("*").cast("bigint").alias("n_days"))
    med = F.expr("percentile(slope_q, 0.5)")
    return (
        pairs.join(nd, "yr")
        .groupBy("yr", "n_days")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            (
                (med / 10000.0 * 1000000 + F.lit(0.5)).cast("long").cast(
                    "double"
                )
                / 1000000.0
            ).alias("median_slope"),
        )
    )


# ---------------------------------------------------------------------------
# Round-11 additions (D98 log-rank, D100 bullwhip). House scalar quantizers —
# same trunc-half-up spelling as estimation.py's _q6/_sql_q6.
# ---------------------------------------------------------------------------


def _Q6(c):
    return (c * F.lit(1000000.0) + F.lit(0.5)).cast("long") / F.lit(1000000.0)


def _SQL_Q6(expr: str) -> str:
    return f"CAST(trunc(({expr}) * 1000000 + 0.5) AS BIGINT) / 1000000.0"


# ---------------------------------------------------------------------------
# D98 — log-rank test between segment survival curves
# ---------------------------------------------------------------------------


@query(
    "orders_logrank_segments",
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
               CAST(t2 IS NOT NULL AS INT) AS event,
               CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g
        FROM per JOIN customer c ON per.o_custkey = c.c_custkey
        CROSS JOIN horizon
    ), by_dur AS (
        SELECT dur,
               CAST(SUM(CASE WHEN g = 1 THEN event ELSE 0 END) AS BIGINT)
                   AS d1,
               CAST(SUM(event) AS BIGINT) AS d_all,
               CAST(SUM(g) AS BIGINT) AS l1,
               CAST(COUNT(*) AS BIGINT) AS l_all
        FROM subjects GROUP BY dur
    ), risk AS (
        SELECT dur, d1, d_all,
               SUM(l1) OVER (ORDER BY dur DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS n1,
               SUM(l_all) OVER (ORDER BY dur DESC
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS n
        FROM by_dur
    ), terms AS (
        SELECT SUM(d1) AS o1,
               SUM(CAST(trunc(d_all * (CAST(n1 AS DOUBLE) / n)
                              * 1000000 + 0.5) AS BIGINT)) AS e1_q,
               SUM(CASE WHEN n > 1 THEN
                   CAST(trunc(d_all * (CAST(n1 AS DOUBLE) / n)
                              * (CAST(n - n1 AS DOUBLE) / n)
                              * (CAST(n - d_all AS DOUBLE) / (n - 1))
                              * 1000000 + 0.5) AS BIGINT)
                   ELSE 0 END) AS v_q
        FROM risk WHERE d_all > 0
    )
    SELECT (SELECT CAST(SUM(g) AS BIGINT) FROM subjects) AS n1_subjects,
           (SELECT CAST(SUM(1 - g) AS BIGINT) FROM subjects) AS n2_subjects,
           CAST(o1 AS BIGINT) AS o1_events,
           CAST(e1_q AS DOUBLE) / 1000000.0 AS e1_expected,
           CASE WHEN v_q > 0 THEN
               CAST(trunc((o1 - e1_q / 1000000.0)
                          * (o1 - e1_q / 1000000.0)
                          / (v_q / 1000000.0) * 1000000 + 0.5) AS BIGINT)
                   / 1000000.0
           END AS chi2
    FROM terms
    """,
    ref="SURVEY §2 D98 [EXT] (log-rank / Mantel-Cox test between the "
    "BUILDING-segment and rest-of-market time-to-repeat-purchase "
    "survival curves (Mantel 1966; Peto & Peto 1972) — the INFERENCE "
    "beside D27's Kaplan-Meier ESTIMATE, exactly as D79's Mann-Whitney "
    "sits beside the medians it compares: at every event time the "
    "hypergeometric expectation e1 = d·n1/n and variance are "
    "accumulated, chi2 = (O1-E1)²/V with 1 df)",
)
def orders_logrank_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test of 'do BUILDING-segment customers repeat-purchase on a
    different clock?': subjects/durations/censoring exactly as
    orders_survival_km, split by c_mktsegment = 'BUILDING'; at each event
    time the observed group-1 events are compared with the hypergeometric
    expectation d·n1/n, variance d·(n1/n)·(n2/n)·(n-d)/(n-1), and the
    one-df chi-square (O-E)²/V is reported. One row.

    Scale shape: one customer-keyed window+agg builds subjects (the D27
    device) plus a broadcast-sized customer-segment join; per-duration
    tallies are a calendar-bounded agg and both risk sets come from ONE
    descending cumulative window over <= horizon-days distinct-duration
    rows (allowlisted + bound-asserted in tests/test_plans.py). The
    final reduction is a quantized-term dsum, so nothing after the first
    agg is data-sized.

    Determinism: e1/v terms are products of exact bigint ratios in double,
    quantized at 1e-6 per EVENT-TIME row and summed as exact longs; the
    chi-square is one final division re-quantized at 1e-6."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    ranked = o.select(
        "o_custkey", "o_orderdate", F.row_number().over(w).alias("rn")
    ).where(F.col("rn") <= 2)
    per = ranked.groupBy("o_custkey").agg(
        F.min(F.when(F.col("rn") == 1, F.col("o_orderdate"))).alias("t1"),
        F.min(F.when(F.col("rn") == 2, F.col("o_orderdate"))).alias("t2"),
    )
    horizon = o.agg(F.max("o_orderdate").alias("hi"))
    subjects = (
        per.join(c, per["o_custkey"] == c["c_custkey"])
        .crossJoin(F.broadcast(horizon))
        .select(
            F.when(
                F.col("t2").isNotNull(),
                F.datediff(F.to_date("t2"), F.to_date("t1")),
            )
            .otherwise(F.datediff(F.to_date("hi"), F.to_date("t1")))
            .cast("bigint")
            .alias("dur"),
            F.col("t2").isNotNull().cast("int").alias("event"),
            F.when(F.col("c_mktsegment") == "BUILDING", 1)
            .otherwise(0)
            .alias("g"),
        )
    )
    by_dur = subjects.groupBy("dur").agg(
        F.sum(F.when(F.col("g") == 1, F.col("event")).otherwise(0))
        .cast("bigint")
        .alias("d1"),
        F.sum("event").cast("bigint").alias("d_all"),
        F.sum("g").cast("bigint").alias("l1"),
        F.count("*").cast("bigint").alias("l_all"),
    )
    dw = Window.orderBy(F.col("dur").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = by_dur.select(
        "dur",
        "d1",
        "d_all",
        F.sum("l1").over(dw).alias("n1"),
        F.sum("l_all").over(dw).alias("n"),
    ).where(F.col("d_all") > 0)
    n1d = F.col("n1").cast("double")
    nd = F.col("n").cast("double")
    e1_term = F.col("d_all") * (n1d / nd)
    v_term = F.when(
        F.col("n") > 1,
        F.col("d_all")
        * (n1d / nd)
        * ((nd - n1d) / nd)
        * ((nd - F.col("d_all").cast("double")) / (nd - 1.0)),
    ).otherwise(F.lit(0.0))
    sums = risk.agg(
        F.sum("d1").cast("bigint").alias("o1"),
        F.sum((e1_term * 1000000 + F.lit(0.5)).cast("long")).alias("e1_q"),
        F.sum((v_term * 1000000 + F.lit(0.5)).cast("long")).alias("v_q"),
    )
    counts = subjects.agg(
        F.sum("g").cast("bigint").alias("n1_subjects"),
        F.sum(1 - F.col("g")).cast("bigint").alias("n2_subjects"),
    )
    o1 = F.col("o1").cast("double")
    e1 = F.col("e1_q").cast("double") / 1000000.0
    v = F.col("v_q").cast("double") / 1000000.0
    return (
        F.broadcast(counts)
        .crossJoin(sums)
        .select(
            "n1_subjects",
            "n2_subjects",
            F.col("o1").alias("o1_events"),
            e1.alias("e1_expected"),
            F.when(
                F.col("v_q") > 0,
                ((o1 - e1) * (o1 - e1) / v * 1000000 + F.lit(0.5))
                .cast("long")
                .cast("double")
                / 1000000.0,
            ).alias("chi2"),
        )
    )


# ---------------------------------------------------------------------------
# D100 — bullwhip (order-vs-fulfillment variance amplification) audit
# ---------------------------------------------------------------------------


@query(
    "orders_bullwhip_ratio",
    oracle=f"""
    WITH li AS (
        SELECT l.l_quantity AS qty,
               CAST(date_trunc('month', o.o_orderdate) AS TIMESTAMP)
                   AS mo_order,
               CAST(date_trunc('month', l.l_shipdate) AS TIMESTAMP)
                   AS mo_ship
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), months AS (
        SELECT DISTINCT mo_order AS mo FROM li
        UNION SELECT DISTINCT mo_ship FROM li
    ), a AS (
        SELECT mo, {sql_dsum('qty')} AS q FROM li
        JOIN months ON mo = mo_order GROUP BY mo
    ), b AS (
        SELECT mo, {sql_dsum('qty')} AS q FROM li
        JOIN months ON mo = mo_ship GROUP BY mo
    ), dense AS (
        SELECT months.mo,
               COALESCE(a.q, 0.0) AS qa, COALESCE(b.q, 0.0) AS qb
        FROM months LEFT JOIN a ON a.mo = months.mo
        LEFT JOIN b ON b.mo = months.mo
    ), mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               {sql_dsum('qa')} AS sa, {sql_dsum1('qa * qa')} AS saa,
               {sql_dsum('qb')} AS sb, {sql_dsum1('qb * qb')} AS sbb
        FROM dense
    )
    SELECT n AS n_months,
           {_SQL_Q6('sa / n')} AS mean_ordered,
           {_SQL_Q6('sb / n')} AS mean_shipped,
           {_SQL_Q6('greatest(saa / n - (sa / n) * (sa / n), 0.0)'
                    ' / NULLIF((sa / n) * (sa / n), 0)')} AS cv2_ordered,
           {_SQL_Q6('greatest(sbb / n - (sb / n) * (sb / n), 0.0)'
                    ' / NULLIF((sb / n) * (sb / n), 0)')} AS cv2_shipped,
           {_SQL_Q6(
               '(greatest(saa / n - (sa / n) * (sa / n), 0.0)'
               ' / NULLIF((sa / n) * (sa / n), 0))'
               ' / NULLIF(greatest(sbb / n - (sb / n) * (sb / n), 0.0)'
               ' / NULLIF((sb / n) * (sb / n), 0), 0)'
           )} AS bullwhip_ratio
    FROM mom
    """,
    ref="SURVEY §2 D100 [EXT] (bullwhip-style demand-distortion audit "
    "(Lee, Padmanabhan & Whang 1997; ratio form Chen, Drezner, Ryan & "
    "Simchi-Levi 2000): CV² of the monthly ORDER-placement quantity "
    "stream over CV² of the monthly FULFILLMENT (ship-date) stream on "
    "one shared month spine — ratio > 1 means the order stream the "
    "upstream echelon sees is burstier than what actually ships, the "
    "amplification that oversizes D91's safety stock when measured on "
    "the wrong stream)",
)
def orders_bullwhip_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-amplification (bullwhip) ratio between the order-placement
    and fulfillment views of the SAME quantity stream: each lineitem's
    quantity is bucketed once by its order month and once by its ship
    month; CV² = var/mean² per stream over the shared (union) month
    spine, ratio = CV²_ordered / CV²_shipped. One row.

    Scale shape: one orderkey-keyed lineitem⋈orders join (bucketed/
    co-located at 100 TB — the join_bucketed_colocated posture), then
    two calendar-bounded month aggs and a 1-row moment reduction; the
    spine is the union of observed months so both streams zero-fill
    identically. Population variance from exact quantized moments (dsum
    for sums, dsum1 for the large-magnitude squares), clamped at 0
    against quantized cancellation — the D91 discipline."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.col("l_quantity").alias("qty"),
        F.date_trunc("month", "o_orderdate").alias("mo_order"),
        F.date_trunc("month", "l_shipdate").alias("mo_ship"),
    )
    months = (
        j.select(F.col("mo_order").alias("mo"))
        .union(j.select(F.col("mo_ship").alias("mo")))
        .distinct()
    )
    a = j.groupBy(F.col("mo_order").alias("mo")).agg(dsum("qty").alias("qa"))
    b = j.groupBy(F.col("mo_ship").alias("mo")).agg(dsum("qty").alias("qb"))
    dense = (
        months.join(a, "mo", "left")
        .join(b, "mo", "left")
        .select(
            F.coalesce("qa", F.lit(0.0)).alias("qa"),
            F.coalesce("qb", F.lit(0.0)).alias("qb"),
        )
    )
    mom = dense.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum("qa").alias("sa"),
        dsum1(F.col("qa") * F.col("qa")).alias("saa"),
        dsum("qb").alias("sb"),
        dsum1(F.col("qb") * F.col("qb")).alias("sbb"),
    )
    n = F.col("n")
    ma, mb = F.col("sa") / n, F.col("sb") / n
    va = F.greatest(F.col("saa") / n - ma * ma, F.lit(0.0))
    vb = F.greatest(F.col("sbb") / n - mb * mb, F.lit(0.0))
    cv2a = va / F.nullif(ma * ma, F.lit(0.0))
    cv2b = vb / F.nullif(mb * mb, F.lit(0.0))
    return mom.select(
        n.alias("n_months"),
        _Q6(ma).alias("mean_ordered"),
        _Q6(mb).alias("mean_shipped"),
        _Q6(cv2a).alias("cv2_ordered"),
        _Q6(cv2b).alias("cv2_shipped"),
        _Q6(cv2a / F.nullif(cv2b, F.lit(0.0))).alias("bullwhip_ratio"),
    )
