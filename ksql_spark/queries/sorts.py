"""SURVEY.md §2.F — sorts, limits, top-k.

Determinism rules (SURVEY §5.2): LIMIT queries are fully tie-broken by a unique
key; NULLS FIRST/LAST is spelled explicitly (Spark ASC default = NULLS FIRST,
DuckDB = NULLS LAST). Top-k compiles to TakeOrderedAndProject (no full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ksql_spark.registry import query
from ksql_spark.tables import load


@query(
    "sort_multi",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_shipdate FROM lineitem
    ORDER BY l_returnflag DESC NULLS LAST, l_shipdate ASC NULLS FIRST,
             l_orderkey, l_linenumber
    LIMIT 100
    """,
    ref="SURVEY §2 F1 (multi-key ORDER BY, explicit null ordering)",
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate")
        .orderBy(
            F.col("l_returnflag").desc_nulls_last(),
            F.col("l_shipdate").asc_nulls_first(),
            F.col("l_orderkey"),
            F.col("l_linenumber"),
        )
        .limit(100)
    )


@query(
    "limit_n",
    oracle="SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 25",
    ref="SURVEY §2 F2 (LIMIT; ordered for determinism)",
)
def limit_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_totalprice").orderBy("o_orderkey").limit(25)


@query(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_orderkey LIMIT 25 OFFSET 50
    """,
    ref="SURVEY §2 F3 (OFFSET, Spark >= 3.4)",
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_totalprice").orderBy("o_orderkey").offset(50).limit(25)


@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    ref="SURVEY §2 F5 (top-k → TakeOrderedAndProject; tie-broken on o_orderkey)",
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "part_skyline_2d",
    oracle="""
    SELECT p_partkey, p_retailprice, CAST(p_size AS BIGINT) AS p_size
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_retailprice <= p.p_retailprice
          AND q.p_size >= p.p_size
          AND (q.p_retailprice < p.p_retailprice
               OR q.p_size > p.p_size)
    )
    """,
    ref="SURVEY §2 F6 [EXT] (2-D skyline / Pareto-frontier operator "
    "(Börzsönyi et al. ICDE 2001): parts not dominated on (price min, "
    "size max) — the multi-criteria shortlist SQL cannot express "
    "without a quadratic NOT EXISTS; the Spark plan is the sort-filter "
    "skyline: ONE pass over price groups with an exclusive running max "
    "of size, via the ranged_cummax_excl scale primitive)",
)
def part_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier over parts: keep a part iff nothing is at-most-as-
    expensive AND at-least-as-big with one strict inequality. Dominance
    decomposes by price group: p is dominated iff the max size among
    STRICTLY cheaper parts reaches p's size, or a SAME-priced part is
    strictly bigger. Both tests read one price-grouped table — no pair
    join, no quadratic pass (the oracle IS the quadratic NOT EXISTS:
    independent semantics, not a re-spelling of this algorithm).

    Scale shape: one price_q hash agg (map-side combined, output =
    distinct prices), the operators/scale.py ranged_cummax_excl
    two-pass for the strict-prior max (range-partitioned local windows
    + a #partitions-row offset broadcast — no SinglePartition window),
    then a keyed join of parts back onto their price group. Prices are
    exact cents, so price_q is a lossless bigint key."""
    from ksql_spark.operators.scale import ranged_cummax_excl

    p = load(spark, sf_dir, "part")
    pq = (F.col("p_retailprice") * 100 + F.lit(0.5)).cast("long")
    rows = p.select(
        "p_partkey",
        "p_retailprice",
        F.col("p_size").cast("long").alias("p_size"),
        pq.alias("price_q"),
    )
    groups = rows.groupBy("price_q").agg(F.max("p_size").alias("gmax"))
    groups = ranged_cummax_excl(groups, ["price_q"], "gmax", "rmax_excl")
    joined = rows.join(groups, "price_q")
    dominated = (
        F.col("rmax_excl").isNotNull()
        & (F.col("rmax_excl") >= F.col("p_size"))
    ) | (F.col("gmax") > F.col("p_size"))
    return joined.where(~dominated).select(
        "p_partkey", "p_retailprice", "p_size"
    )


def _interleave_sql(x: str, y: str, bits: int, shr: str) -> str:
    """Bit-interleave expression: z = sum_k ((x>>k)&1)<<2k | ((y>>k)&1)<<2k+1.

    Same exact integer arithmetic in both engines; `shr` picks the spelling
    ('spark' -> shiftright/shiftleft functions, 'duck' -> >> / << operators).
    """
    terms = []
    for k in range(bits):
        if shr == "spark":
            terms.append(
                f"shiftleft(shiftright({x}, {k}) & 1, {2 * k})"
                f" + shiftleft(shiftright({y}, {k}) & 1, {2 * k + 1})"
            )
        else:
            terms.append(
                f"((({x} >> {k}) & 1) << {2 * k})"
                f" + ((({y} >> {k}) & 1) << {2 * k + 1})"
            )
    return "(" + " + ".join(terms) + ")"


_Z_DUCK = _interleave_sql("dq", "cq", 12, "duck")
_Z_SPARK = _interleave_sql("dq", "cq", 12, "spark")


_ZORDER_ZONEMAP_ORACLE = f"""
    WITH mx AS (
        SELECT CAST(MIN(date_diff('day', DATE '1995-01-01', o_orderdate))
                    AS BIGINT) AS min_d,
               CAST(MAX(date_diff('day', DATE '1995-01-01', o_orderdate))
                    AS BIGINT) AS max_d,
               CAST(MIN(o_custkey) AS BIGINT) AS min_c,
               CAST(MAX(o_custkey) AS BIGINT) AS max_c
        FROM orders
    ), q AS (
        SELECT CAST(trunc((date_diff('day', DATE '1995-01-01', o_orderdate)
                           - min_d) * 4096.0 / (max_d - min_d + 1))
                    AS BIGINT) AS dq,
               CAST(trunc((o_custkey - min_c) * 4096.0
                          / (max_c - min_c + 1)) AS BIGINT) AS cq
        FROM orders, mx
    ), z AS (
        SELECT dq, cq, {_Z_DUCK} >> 12 AS bucket FROM q
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(dq) AS BIGINT) AS min_day_q,
           CAST(MAX(dq) AS BIGINT) AS max_day_q,
           CAST(MIN(cq) AS BIGINT) AS min_cust_q,
           CAST(MAX(cq) AS BIGINT) AS max_cust_q,
           CAST(MAX(dq) - MIN(dq) AS BIGINT) AS day_span,
           CAST(MAX(cq) - MIN(cq) AS BIGINT) AS cust_span
    FROM z GROUP BY bucket
    """


@query(
    "sort_zorder_locality",
    oracle=_ZORDER_ZONEMAP_ORACLE,
    ref="SURVEY §2 F7 [EXT] (Z-order / Morton clustering key: interleave "
    "the bits of two quantized sort dimensions so one physical order "
    "bounds BOTH dims per file — the multi-dimensional data-skipping "
    "layout (Delta/Iceberg Z-ORDER); the per-bucket min/max table IS "
    "the zone map a 100 TB writer would persist, and the <=64 span "
    "in each dimension per 4096-bucket is the skipping guarantee)",
)
def sort_zorder_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-order locality audit over orders: quantize (orderdate-day,
    custkey) into 12 bits each against broadcast min/max extrema, interleave into a
    24-bit z-value, bucket by the top 12 bits (= top 6 bits of EACH dim),
    and report the per-bucket zone map. Because a bucket fixes 6 high
    bits per dimension, every bucket's span is < 2^6 = 64 quantization
    steps in BOTH dims — the property that lets a scan on either
    predicate skip ~63/64 of files; tests/test_properties.py asserts it.

    All arithmetic is exact integer (quantization is one trunc against an
    exact 1-row max; the interleave is pure shifts/masks), so the oracle
    matches bitwise. Scale shape: 1-row scalar broadcast + one narrow
    scan + a 4096-bounded hash agg with map-side combine; writing the
    actual layout is `df.repartitionByRange(N, zkey).sortWithinPartitions
    (zkey)` — same expression, no new machinery."""
    o = load(spark, sf_dir, "orders")
    # Quantize against broadcast MIN/MAX in BOTH dims (ADVICE r11): the
    # 1995-01-01 literal is only a day-numbering epoch and cancels in the
    # min-normalized form, so pre-1995 (or arbitrary-era) data still lands
    # every coordinate in [0, 4095] where the bit walk is defined.
    day = "datediff(o_orderdate, DATE '1995-01-01')"
    mx = o.agg(
        F.expr(f"CAST(MIN({day}) AS BIGINT)").alias("min_d"),
        F.expr(f"CAST(MAX({day}) AS BIGINT)").alias("max_d"),
        F.min("o_custkey").cast("bigint").alias("min_c"),
        F.max("o_custkey").cast("bigint").alias("max_c"),
    )
    q = o.crossJoin(F.broadcast(mx)).select(
        F.expr(
            f"CAST(({day} - min_d) * 4096.0"
            " / (max_d - min_d + 1) AS BIGINT)"
        ).alias("dq"),
        F.expr(
            "CAST((o_custkey - min_c) * 4096.0"
            " / (max_c - min_c + 1) AS BIGINT)"
        ).alias("cq"),
    )
    z = q.select(
        "dq", "cq", F.expr(f"shiftright({_Z_SPARK}, 12)").alias("bucket")
    )
    return z.groupBy(F.col("bucket").cast("bigint").alias("bucket")).agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.min("dq").cast("bigint").alias("min_day_q"),
        F.max("dq").cast("bigint").alias("max_day_q"),
        F.min("cq").cast("bigint").alias("min_cust_q"),
        F.max("cq").cast("bigint").alias("max_cust_q"),
        (F.max("dq") - F.min("dq")).cast("bigint").alias("day_span"),
        (F.max("cq") - F.min("cq")).cast("bigint").alias("cust_span"),
    )


@query(
    "sort_zorder_write_audit",
    oracle=_ZORDER_ZONEMAP_ORACLE,
    ref="SURVEY §2 F7 [EXT] (the WRITE side of sort_zorder_locality: "
    "operators/layout.py write_zordered actually lays orders out in Morton "
    "order — repartitionByRange(z) + sortWithinPartitions(z) — and this "
    "entry hash-checks the written files' roundtrip via the identical "
    "zone-map aggregation; the per-file footer-stats skipping property is "
    "gated in tests/test_layout.py)",
)
def sort_zorder_write_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write orders Z-ordered on (orderday, custkey) to a scratch dir, read
    the files back, and emit the same 4096-bucket zone map as
    sort_zorder_locality — oracle-exact iff the layout write is lossless.

    Scale shape: the write is one range exchange on the z-key + a local
    sort (the exact plan Delta/Iceberg Z-ORDER runs); the audit is the F7
    aggregation over the readback."""
    import hashlib
    import os
    import tempfile

    from ksql_spark.operators.layout import write_zordered

    o = load(spark, sf_dir, "orders").withColumn(
        "orderday", F.datediff(F.col("o_orderdate"), F.lit("1995-01-01"))
    )
    # stable per-input scratch dir (see llm_shard_write_audit)
    tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:12]
    out = os.path.join(tempfile.gettempdir(), f"ksql_zorder_audit_{tag}")
    write_zordered(o, out, "o_custkey", "orderday", n_files=16)
    back = spark.read.parquet(out).drop("orderday")
    # same MIN/MAX-normalized grid as sort_zorder_locality (ADVICE r11)
    day = "datediff(o_orderdate, DATE '1995-01-01')"
    mx = back.agg(
        F.expr(f"CAST(MIN({day}) AS BIGINT)").alias("min_d"),
        F.expr(f"CAST(MAX({day}) AS BIGINT)").alias("max_d"),
        F.min("o_custkey").cast("bigint").alias("min_c"),
        F.max("o_custkey").cast("bigint").alias("max_c"),
    )
    q = back.crossJoin(F.broadcast(mx)).select(
        F.expr(
            f"CAST(({day} - min_d) * 4096.0"
            " / (max_d - min_d + 1) AS BIGINT)"
        ).alias("dq"),
        F.expr(
            "CAST((o_custkey - min_c) * 4096.0"
            " / (max_c - min_c + 1) AS BIGINT)"
        ).alias("cq"),
    )
    z = q.select(
        "dq", "cq", F.expr(f"shiftright({_Z_SPARK}, 12)").alias("bucket")
    )
    return z.groupBy(F.col("bucket").cast("bigint").alias("bucket")).agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.min("dq").cast("bigint").alias("min_day_q"),
        F.max("dq").cast("bigint").alias("max_day_q"),
        F.min("cq").cast("bigint").alias("min_cust_q"),
        F.max("cq").cast("bigint").alias("max_cust_q"),
        (F.max("dq") - F.min("dq")).cast("bigint").alias("day_span"),
        (F.max("cq") - F.min("cq")).cast("bigint").alias("cust_span"),
    )


# ---------------------------------------------------------------------------
# F8 — Hilbert-curve clustering key (round 11)
# ---------------------------------------------------------------------------

_HILBERT_ORDER = 12  # 12 bits per dimension -> 24-bit curve index


def _hilbert_duck_ctes() -> str:
    """12 chained CTE steps of the Lam-Shapiro xy2d walk (each references
    only its predecessor once in FROM — a linear chain, safe un-MATERIALIZED).
    Input CTE `q` must provide (dq, cq); output CTE s12 carries (dq, cq, d)."""
    out = """, s0 AS (
        SELECT dq, cq, dq AS x, cq AS y, CAST(0 AS BIGINT) AS d FROM q
    )"""
    for i in range(_HILBERT_ORDER):
        s = 1 << (_HILBERT_ORDER - 1 - i)
        out += f""",
    s{i + 1} AS (
        SELECT dq, cq,
               CASE WHEN (y & {s}) = 0 THEN
                   CASE WHEN (x & {s}) > 0 THEN {s} - 1 - y ELSE y END
               ELSE x END AS x,
               CASE WHEN (y & {s}) = 0 THEN
                   CASE WHEN (x & {s}) > 0 THEN {s} - 1 - x ELSE x END
               ELSE y END AS y,
               d + {s}::BIGINT * {s} * xor(
                   3 * (CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END),
                   CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END) AS d
        FROM s{i}
    )"""
    return out


_HILBERT_ZONEMAP_ORACLE = f"""
    WITH mx AS (
        SELECT CAST(MIN(date_diff('day', DATE '1995-01-01', o_orderdate))
                    AS BIGINT) AS min_d,
               CAST(MAX(date_diff('day', DATE '1995-01-01', o_orderdate))
                    AS BIGINT) AS max_d,
               CAST(MIN(o_custkey) AS BIGINT) AS min_c,
               CAST(MAX(o_custkey) AS BIGINT) AS max_c
        FROM orders
    ), q AS (
        SELECT CAST(trunc((date_diff('day', DATE '1995-01-01', o_orderdate)
                           - min_d) * 4096.0 / (max_d - min_d + 1))
                    AS BIGINT) AS dq,
               CAST(trunc((o_custkey - min_c) * 4096.0
                          / (max_c - min_c + 1)) AS BIGINT) AS cq
        FROM orders, mx
    ){_hilbert_duck_ctes()}
    SELECT CAST(d >> 12 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(dq) AS BIGINT) AS min_day_q,
           CAST(MAX(dq) AS BIGINT) AS max_day_q,
           CAST(MIN(cq) AS BIGINT) AS min_cust_q,
           CAST(MAX(cq) AS BIGINT) AS max_cust_q,
           CAST(MAX(dq) - MIN(dq) AS BIGINT) AS day_span,
           CAST(MAX(cq) - MIN(cq) AS BIGINT) AS cust_span
    FROM s{_HILBERT_ORDER} GROUP BY bucket
    """


def hilbert_index(x, y, order: int = _HILBERT_ORDER):
    """Hilbert xy2d index of two quantized coordinate Columns — the
    Lam & Shapiro (1994) bit walk as a STRUCT-STATE FOLD over the per-level
    side lengths, so the expression stays O(1) regardless of order (an
    unrolled column chain triples per step: new x reads old y twice and the
    rotation reads both — ~3^12 nodes by level 12; the fold lambda is one
    expression evaluated iteratively at runtime). Pure integer shifts/
    masks/xor: bit-identical in any engine."""
    svals = F.array(
        *[F.lit(1 << (order - 1 - i)).cast("long") for i in range(order)]
    )
    init = F.struct(
        x.cast("long").alias("x"),
        y.cast("long").alias("y"),
        F.lit(0).cast("long").alias("d"),
    )

    def step(acc, s):
        rx = F.when(acc["x"].bitwiseAND(s) > 0, F.lit(1)).otherwise(0).cast("long")
        ry = F.when(acc["y"].bitwiseAND(s) > 0, F.lit(1)).otherwise(0).cast("long")
        d2 = acc["d"] + s * s * (rx * 3).bitwiseXOR(ry)
        flip = rx == 1
        x1 = F.when(flip, s - 1 - acc["x"]).otherwise(acc["x"])
        y1 = F.when(flip, s - 1 - acc["y"]).otherwise(acc["y"])
        swap = ry == 0
        return F.struct(
            F.when(swap, y1).otherwise(acc["x"]).alias("x"),
            F.when(swap, x1).otherwise(acc["y"]).alias("y"),
            d2.alias("d"),
        )

    return F.aggregate(svals, init, step)["d"]


@query(
    "sort_hilbert_locality",
    oracle=_HILBERT_ZONEMAP_ORACLE,
    ref="SURVEY §2 F8 [EXT] (Hilbert-curve clustering key (Hilbert 1891; "
    "xy2d walk per Lam & Shapiro 1994): like F7's Z-order a quadrant-"
    "recursive space-filling curve — the top 12 index bits fix a depth-6 "
    "quadrant, so every 4096-bucket has the same < 64-step span guarantee "
    "in BOTH dims — but with strictly better run locality: consecutive "
    "Hilbert cells are always grid-ADJACENT (Morton order teleports "
    "across quadrant seams), so range scans over the sort key touch "
    "fewer distinct grid regions; the layout Databricks liquid "
    "clustering and Iceberg adopted over Z-order for exactly this "
    "reason. Locality comparison asserted vs F7 in tests/test_wave11.py)",
)
def sort_hilbert_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-order locality audit over orders: quantize (orderday,
    custkey) to 12 bits each against broadcast min/max extrema (exactly F7's
    grid), compute the 24-bit Hilbert index via the fold-based bit walk,
    bucket by the top 12 bits, and report the same per-bucket zone map
    as sort_zorder_locality — so the two layouts are comparable row for
    row. Writing the layout is `repartitionByRange(N, hkey) +
    sortWithinPartitions(hkey)`, identical machinery to the F7 writer.

    Scale shape: 1-row scalar broadcast + one narrow scan (the fold is
    per-row integer arithmetic, no shuffle) + a 4096-bounded hash agg
    with map-side combine.

    Determinism: every operation is integer shift/mask/xor on exact
    quantized coordinates — bitwise-identical cross-engine, no floats
    anywhere past the shared trunc quantization."""
    o = load(spark, sf_dir, "orders")
    # Quantize against broadcast MIN/MAX in BOTH dims (ADVICE r11): the
    # 1995-01-01 literal is only a day-numbering epoch and cancels in the
    # min-normalized form, so pre-1995 (or arbitrary-era) data still lands
    # every coordinate in [0, 4095] where the bit walk is defined.
    day = "datediff(o_orderdate, DATE '1995-01-01')"
    mx = o.agg(
        F.expr(f"CAST(MIN({day}) AS BIGINT)").alias("min_d"),
        F.expr(f"CAST(MAX({day}) AS BIGINT)").alias("max_d"),
        F.min("o_custkey").cast("bigint").alias("min_c"),
        F.max("o_custkey").cast("bigint").alias("max_c"),
    )
    q = o.crossJoin(F.broadcast(mx)).select(
        F.expr(
            f"CAST(({day} - min_d) * 4096.0"
            " / (max_d - min_d + 1) AS BIGINT)"
        ).alias("dq"),
        F.expr(
            "CAST((o_custkey - min_c) * 4096.0"
            " / (max_c - min_c + 1) AS BIGINT)"
        ).alias("cq"),
    )
    h = q.select(
        "dq",
        "cq",
        F.shiftright(hilbert_index(F.col("dq"), F.col("cq")), 12).alias(
            "bucket"
        ),
    )
    return h.groupBy(F.col("bucket").cast("bigint").alias("bucket")).agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.min("dq").cast("bigint").alias("min_day_q"),
        F.max("dq").cast("bigint").alias("max_day_q"),
        F.min("cq").cast("bigint").alias("min_cust_q"),
        F.max("cq").cast("bigint").alias("max_cust_q"),
        (F.max("dq") - F.min("dq")).cast("bigint").alias("day_span"),
        (F.max("cq") - F.min("cq")).cast("bigint").alias("cust_span"),
    )
