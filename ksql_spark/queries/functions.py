"""SURVEY.md §2.H — scalar functions (string/math/date/cast/conditional/JSON/
array/map) plus §2.A A4 (flatten/explode).

The reference reaches these through AlaSQL's scalar-function surface
(package.json:5 → exec at ksql.js:159); its `->` operator on nested objects
(README.md:30,34) maps to struct dot-paths / element_at / get_json_object —
exercised here on events.props (JSON string column).

Type-width alignments with the DuckDB oracle are explicit casts (Spark
length/instr/ceil/floor return int/long where DuckDB returns bigint/double).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ksql_spark.registry import query
from ksql_spark.tables import load


@query(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS uname,
           lower(c_mktsegment) AS lseg,
           substring(c_name, 10, 9) AS id_digits,
           replace(c_name, 'Customer#', 'C-') AS short_name,
           CAST(length(c_name) AS INT) AS name_len,
           CAST(instr(c_name, '#') AS INT) AS hash_pos,
           concat(c_mktsegment, ':', c_name) AS tagged
    FROM customer
    """,
    ref="SURVEY §2 H2 (UPPER/LOWER/SUBSTRING/REPLACE/LEN/INSTR/CONCAT)",
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.substring("c_name", 10, 9).alias("id_digits"),
        F.replace(F.col("c_name"), F.lit("Customer#"), F.lit("C-")).alias("short_name"),
        F.length("c_name").alias("name_len"),
        F.instr(F.col("c_name"), "#").alias("hash_pos"),
        F.concat_ws("", F.col("c_mktsegment"), F.lit(":"), F.col("c_name")).alias("tagged"),
    )


@query(
    "fn_string_extra",
    oracle="""
    SELECT s_suppkey,
           lpad(CAST(s_suppkey AS VARCHAR), 8, '0') AS padded,
           rpad(s_name, 25, '.') AS rpadded,
           CAST(position('#' in s_name) AS INT) AS hash_at,
           CAST(levenshtein(s_name, 'Supplier#000000000') AS INT) AS edit_dist,
           reverse(s_name) AS rev,
           repeat('ab', 3) AS rep
    FROM supplier
    """,
    ref="SURVEY §2 H2 [EXT] extras (lpad/rpad/position/levenshtein/reverse/repeat)",
)
def fn_string_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.lpad(F.col("s_suppkey").cast("string"), 8, "0").alias("padded"),
        F.rpad("s_name", 25, ".").alias("rpadded"),
        F.instr(F.col("s_name"), "#").alias("hash_at"),
        F.levenshtein("s_name", F.lit("Supplier#000000000")).alias("edit_dist"),
        F.reverse("s_name").alias("rev"),
        F.repeat(F.lit("ab"), 3).alias("rep"),
    )


@query(
    "fn_regex",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '[a-z]+') AS first_word,
           regexp_matches(text, 'spark') AS mentions_spark,
           regexp_replace(text, ' +', '_', 'g') AS underscored
    FROM documents
    """,
    ref="SURVEY §2 H2 [EXT] (regexp_* extras)",
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", "[a-z]+", 0).alias("first_word"),
        F.col("text").rlike("spark").alias("mentions_spark"),
        F.regexp_replace("text", " +", "_").alias("underscored"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS abs_off,
           round(l_extendedprice / 7, 2) AS rounded,
           CAST(ceil(l_quantity / 7) AS DOUBLE) AS ceil_q,
           CAST(floor(l_quantity / 7) AS DOUBLE) AS floor_q,
           power(l_quantity, 2) AS q_sq,
           sqrt(l_extendedprice) AS price_root
    FROM lineitem
    """,
    ref="SURVEY §2 H3 (ABS/ROUND/CEIL/FLOOR/POWER/SQRT)",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_off"),
        # note: round-on-double ties differ between engines (Spark rounds the
        # shortest decimal repr, DuckDB the exact binary) — avoid tie grids.
        F.round(F.col("l_extendedprice") / 7, 2).alias("rounded"),
        F.ceil(F.col("l_quantity") / 7).cast("double").alias("ceil_q"),
        F.floor(F.col("l_quantity") / 7).cast("double").alias("floor_q"),
        F.pow("l_quantity", F.lit(2)).alias("q_sq"),
        F.sqrt("l_extendedprice").alias("price_root"),
    )


@query(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS y,
           CAST(month(o_orderdate) AS INT) AS m,
           CAST(day(o_orderdate) AS INT) AS d,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT)
               AS days_since_epoch_start,
           o_orderdate + INTERVAL 30 DAY AS due_date
    FROM orders
    """,
    ref="SURVEY §2 H4 (YEAR/MONTH/DAY/DATEDIFF/date_trunc/interval arithmetic)",
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp_ntz"))
        .alias("days_since_epoch_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
    )


@query(
    "fn_date_format",
    oracle="""
    SELECT event_id,
           strftime(ts, '%Y-%m-%d %H:%M') AS minute_str,
           strftime(ts, '%Y-%m') AS month_str
    FROM events
    """,
    ref="SURVEY §2 H4 (timestamp → string formatting; each engine spells its "
    "own pattern dialect, outputs must agree byte-for-byte)",
)
def fn_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm").alias("minute_str"),
        F.date_format("ts", "yyyy-MM").alias("month_str"),
    )


@query(
    "fn_cast",
    oracle="""
    SELECT l_orderkey,
           CAST(l_quantity AS INT) AS qty_int,
           CAST(l_orderkey AS VARCHAR) AS key_str,
           CAST(l_shipdate AS DATE) AS ship_day,
           CAST(l_linenumber AS BIGINT) AS line_big
    FROM lineitem
    """,
    ref="SURVEY §2 H5 (CAST/CONVERT; l_quantity is integral so truncation-vs-"
    "round cast semantics cannot diverge)",
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_orderkey").cast("string").alias("key_str"),
        F.col("l_shipdate").cast("date").alias("ship_day"),
        F.col("l_linenumber").cast("long").alias("line_big"),
    )


@query(
    "fn_conditional",
    oracle="""
    SELECT o_orderkey,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_label,
           CASE WHEN o_totalprice > 200000 THEN 'big' ELSE 'small' END AS size_label,
           nullif(o_orderpriority, '4-NOT SPECIFIED') AS prio_or_null
    FROM orders
    """,
    ref="SURVEY §2 H6 (COALESCE/IFNULL/IIF/NULLIF)",
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_label"
        ),
        F.when(F.col("o_totalprice") > 200000, "big").otherwise("small").alias("size_label"),
        F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED")).alias("prio_or_null"),
    )


@query(
    "fn_trim_variants",
    oracle="""
    SELECT n_nationkey,
           ltrim(concat('  ', n_name)) AS l,
           rtrim(concat(n_name, '  ')) AS r,
           trim(concat(' ', n_name, ' ')) AS b,
           trim(n_name, 'N_01') AS custom
    FROM nation
    """,
    ref="SURVEY §2 H2 (LTRIM/RTRIM/TRIM incl. custom trim set)",
)
def fn_trim_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.ltrim(F.concat(F.lit("  "), F.col("n_name"))).alias("l"),
        F.rtrim(F.concat(F.col("n_name"), F.lit("  "))).alias("r"),
        F.trim(F.concat(F.lit(" "), F.col("n_name"), F.lit(" "))).alias("b"),
        F.expr("trim(BOTH 'N_01' FROM n_name)").alias("custom"),
    )


@query(
    "fn_hash",
    oracle="""
    SELECT doc_id,
           md5(text) AS md5_hex,
           sha256(text) AS sha256_hex,
           CAST(length(text) AS BIGINT) AS n_bytes
    FROM documents
    """,
    ref="SURVEY §2 H [EXT] (cryptographic digests — content addressing for "
    "dedup/multimodal; engine-portable hex output unlike xxhash64)",
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("md5_hex"),
        F.sha2(F.col("text"), 256).alias("sha256_hex"),
        F.length("text").cast("long").alias("n_bytes"),
    )


@query(
    "fn_variant_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_int
    FROM events
    """,
    ref="SURVEY §1.3 (Spark 4 VariantType as the open-schema escape hatch: "
    "parse_json -> try_variant_get; the semi-structured path for K8s raw "
    "objects at scale — binary variant beats repeated JSON string parsing)",
)
def fn_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        # try_parse_json: malformed/empty props must yield NULL (DuckDB's
        # json_extract_string does), not abort the scan
        F.try_variant_get(F.try_parse_json("props"), "$.k", "int").alias("k_int"),
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT n_nationkey,
           n_nationkey & 12 AS band,
           n_nationkey | 1 AS bor,
           xor(n_nationkey, 21) AS bxor,
           n_nationkey << 2 AS shl,
           n_nationkey >> 1 AS shr
    FROM nation
    """,
    ref="SURVEY §2 H [EXT] (bitwise operators)",
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    return n.select(
        "n_nationkey",
        k.bitwiseAND(F.lit(12)).alias("band"),
        k.bitwiseOR(F.lit(1)).alias("bor"),
        k.bitwiseXOR(F.lit(21)).alias("bxor"),
        F.shiftleft(k, 2).alias("shl"),
        F.shiftright(k, 1).alias("shr"),
    )


@query(
    "fn_json_extract",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
           json_extract_string(props, '$.missing') AS absent
    FROM events
    """,
    ref="SURVEY §2 H7/H14; reference `->` nested access (README.md:30,34) on a "
    "JSON-string column maps to get_json_object (SURVEY §4.3)",
)
def fn_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("absent"),
    )


@query(
    "fn_array_index",
    oracle="""
    SELECT vec_id,
           embedding[1] AS first_dim,
           embedding[-1] AS last_dim,
           embedding[5] AS fifth_dim
    FROM embeddings
    """,
    ref="SURVEY §2 H8; reference `a->(0)` array index → element_at (1-based) / "
    "getItem (0-based)",
)
def fn_array_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.col("embedding").getItem(0).alias("first_dim"),
        F.element_at("embedding", -1).alias("last_dim"),
        F.element_at("embedding", 5).alias("fifth_dim"),
    )


@query(
    "fn_struct_build",
    oracle="""
    SELECT n_nationkey,
           to_json(struct_pack(name := n_name, region := n_regionkey)) AS obj
    FROM nation
    """,
    ref="SURVEY §2 H10 (JSON object literal {a:1} → struct + to_json)",
)
def fn_struct_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.to_json(
            F.struct(F.col("n_name").alias("name"), F.col("n_regionkey").alias("region"))
        ).alias("obj"),
    )


@query(
    "fn_array_ops",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           CAST(embedding[1:3][1] AS DOUBLE) AS first3_1,
           CAST(embedding[1:3][2] AS DOUBLE) AS first3_2,
           CAST(embedding[1:3][3] AS DOUBLE) AS first3_3,
           list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(embedding,
                                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
               (a, b) -> a + b) AS l2_sq
    FROM embeddings
    """,
    ref="SURVEY §2 H12 [EXT] (size/slice/transform/aggregate higher-order fns; "
    "left-fold sum matches DuckDB list_reduce bitwise. The slice is projected "
    "element-wise: the driver's canonicalizer cannot hash an array column, and "
    "float→double widening is IEEE-exact in both engines)",
)
def fn_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    sq = F.transform(
        F.col("embedding"), lambda x: x.cast("double") * x.cast("double")
    )
    first3 = F.slice("embedding", 1, 3)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at(first3, 1).cast("double").alias("first3_1"),
        F.element_at(first3, 2).cast("double").alias("first3_2"),
        F.element_at(first3, 3).cast("double").alias("first3_3"),
        F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x).alias("l2_sq"),
    )


@query(
    "fn_map_ops",
    oracle="""
    SELECT user_id,
           CAST(COALESCE(COUNT(*) FILTER (WHERE event_type = 'view'), 0) AS BIGINT)
               AS n_view,
           CAST(COALESCE(COUNT(*) FILTER (WHERE event_type = 'purchase'), 0) AS BIGINT)
               AS n_purchase,
           CAST(COUNT(DISTINCT event_type) AS INT) AS n_types
    FROM events GROUP BY user_id
    """,
    ref="SURVEY §2 H13 [EXT] (map build + element_at; oracle checks the same "
    "values computed relationally)",
)
def fn_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a real MapType column (event_type → count per user) with
    map_from_entries, then read it back with element_at / size — the oracle
    computes identical numbers without maps (DuckDB maps are dialect-odd)."""
    ev = load(spark, sf_dir, "events")
    # NULL event_type rows are excluded before the map build (Spark map keys
    # cannot be NULL — an unfiltered build ABORTS on the first null key);
    # matches the oracle, whose FILTER counts and COUNT(DISTINCT) skip NULLs.
    per_type = (
        ev.where(F.col("event_type").isNotNull())
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("cnt"))
    )
    maps = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("event_type"), F.col("cnt")))
        ).alias("type_counts")
    )
    return maps.select(
        "user_id",
        F.coalesce(F.element_at("type_counts", "view"), F.lit(0)).alias("n_view"),
        F.coalesce(F.element_at("type_counts", "purchase"), F.lit(0)).alias("n_purchase"),
        F.size(F.map_keys("type_counts")).alias("n_types"),
    )


@query(
    "flatten_explode",
    oracle="""
    SELECT vec_id, CAST(i - 1 AS INT) AS pos, embedding[i] AS val
    FROM (SELECT vec_id, embedding,
                 unnest(range(1, len(embedding) + 1)) AS i
          FROM embeddings)
    """,
    ref="SURVEY §2 A4; reference flattens pods→containers one row per child "
    "(ksql.js:197-213) — posexplode is the Spark-native equivalent",
)
def flatten_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    return e.select("vec_id", F.posexplode("embedding").alias("pos", "val"))


@query(
    "fn_url_parse",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               'https://host' || (doc_id % 7) || '.example/docs/' || doc_id
               || '?lang=' || lang || '#s' || (doc_id % 3) AS url
        FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, '^([a-z][a-z0-9+.-]*)://', 1) AS scheme,
           regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]*)', 1) AS host,
           regexp_extract(url, '^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
           regexp_extract(url, '\\?([^#]*)', 1) AS query,
           regexp_extract(url, '#(.*)$', 1) AS fragment
    FROM u
    """,
    ref="SURVEY §2 H2 family [EXT] (URL component extraction — one regexp "
    "spelling shared by both engines, '' on no-match in both; Spark's "
    "parse_url would differ from any DuckDB reimplementation on edge URLs, "
    "so the portable form IS the operator. URLs synthesized: the corpus "
    "has no URL column)",
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://host"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".example/docs/"), F.col("doc_id").cast("string"),
        F.lit("?lang="), F.col("lang"),
        F.lit("#s"), (F.col("doc_id") % 3).cast("string"),
    )
    return d.select(
        "doc_id",
        F.regexp_extract(url, r"^([a-z][a-z0-9+.-]*)://", 1).alias("scheme"),
        F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://([^/?#]*)", 1).alias("host"),
        F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1).alias("path"),
        F.regexp_extract(url, r"\?([^#]*)", 1).alias("query"),
        F.regexp_extract(url, r"#(.*)$", 1).alias("fragment"),
    )


@query(
    "fn_string_distance",
    oracle="""
    SELECT p_partkey,
           CAST(levenshtein(p_name, p_brand) AS INT) AS d_name_brand,
           CAST(levenshtein(p_type, 'STANDARD') AS INT) AS d_type_std
    FROM part
    """,
    ref="SURVEY §2 H2 (edit-distance string similarity — fuzzy matching for "
    "entity resolution / near-dup title detection; exact same metric in "
    "both engines)",
)
def fn_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein distances per part row (to a sibling column and to a
    constant). Pure codegen'd expression — scan-bound at any scale; the
    O(len^2) DP cost is per-row, independent of corpus size."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.levenshtein("p_name", "p_brand").alias("d_name_brand"),
        F.levenshtein("p_type", F.lit("STANDARD")).alias("d_type_std"),
    )


@query(
    "fn_try_cast",
    oracle="""
    SELECT doc_id,
           TRY_CAST(lang AS INT) AS lang_as_int,
           TRY_CAST(CAST(n_chars AS VARCHAR) AS INT) AS chars_roundtrip,
           TRY_CAST(source AS DOUBLE) IS NULL AS source_not_numeric
    FROM documents
    """,
    ref="SURVEY §2 H5 (TRY_CAST totality: malformed input yields NULL "
    "instead of aborting the job — the cast a 100 TB pipeline over dirty "
    "data must use; complements the strict CAST entry fn_cast)",
)
def fn_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe casts over deliberately non-numeric columns: bad parses
    become NULL, valid round-trips survive, and the job NEVER aborts —
    the totality contract strict ANSI CAST cannot give on dirty data."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("lang").try_cast("int").alias("lang_as_int"),
        F.col("n_chars").cast("string").try_cast("int").alias("chars_roundtrip"),
        F.col("source").try_cast("double").isNull().alias("source_not_numeric"),
    )


@query(
    "flatten_outer",
    oracle="""
    SELECT d.doc_id, t.w
    FROM (SELECT doc_id,
                 CASE WHEN doc_id % 50 = 0 THEN []
                      ELSE string_split(text, ' ')[1:3] END AS words3
          FROM documents) d
    LEFT JOIN LATERAL (SELECT unnest(d.words3) AS w) t ON TRUE
    """,
    ref="SURVEY §2 A4/H12 (OUTER explode: rows with EMPTY arrays survive "
    "flattening as a single NULL row — plain explode silently drops them, "
    "the classic row-loss bug in flatten pipelines)",
)
def flatten_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer over a 3-word prefix array that is EMPTY for every 50th
    document: those docs keep one (doc_id, NULL) row. The inner-explode
    variant (`flatten_explode`) would lose them entirely."""
    d = load(spark, sf_dir, "documents")
    words3 = F.when(
        F.col("doc_id") % 50 == 0, F.array().cast("array<string>")
    ).otherwise(F.slice(F.split(F.col("text"), " "), 1, 3))
    return d.select("doc_id", words3.alias("words3")).select(
        "doc_id", F.explode_outer("words3").alias("w")
    )


@query(
    "fn_date_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 2 MONTH AS TIMESTAMP) AS plus2m,
           CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
           CAST(quarter(o_orderdate) AS INT) AS q,
           CAST(isodow(o_orderdate) AS INT) AS iso_dow,
           CAST(weekofyear(o_orderdate) AS INT) AS iso_week
    FROM orders
    """,
    ref="SURVEY §2 H4 [EXT] (calendar arithmetic breadth beyond fn_date: "
    "month addition with end-of-month clamping — add_months == DuckDB "
    "+INTERVAL MONTH, both clamp Jan 31 + 1 mo to Feb end — last_day, "
    "quarter, ISO day-of-week and ISO week number. Day-of-week numbering "
    "is an engine trap: Spark dayofweek() is 1=Sunday, DuckDB dayofweek() "
    "is 0=Sunday; the ISO forms (Mon=1..Sun=7) agree, so the entry pins "
    "the portable spelling: Spark weekday()+1 == DuckDB isodow())",
)
def fn_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar functions beyond the fn_date basics, each spelled in its
    cross-engine-deterministic form (see ref note on the day-of-week trap).
    All narrow per-row expressions — scan-bound at any scale."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.add_months("o_orderdate", 2).cast("timestamp").alias("plus2m"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.quarter("o_orderdate").cast("int").alias("q"),
        (F.weekday("o_orderdate") + 1).cast("int").alias("iso_dow"),
        F.weekofyear("o_orderdate").cast("int").alias("iso_week"),
    )


@query(
    "fn_datetime_format",
    oracle="""
    SELECT event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS iso_s,
           strftime(ts, '%A') AS day_name,
           strftime(ts, '%B') AS month_name,
           strftime(ts, '%j') AS day_of_year,
           strftime(ts, '%I:%M %p') AS twelve_hour
    FROM events
    """,
    ref="SURVEY §2 H16 [EXT] (datetime formatting parity: Spark's JDK "
    "DateTimeFormatter patterns (yyyy-MM-dd, EEEE, MMMM, DDD, hh:mm a) "
    "pinned against DuckDB's strftime (%Y-%m-%d, %A, %B, %j, %I:%M %p) "
    "— five pattern families where silent divergence (locale names, "
    "zero-padding, 12-hour clock) corrupts downstream string keys)",
)
def fn_datetime_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five formatted renderings of the event timestamp: ISO seconds,
    full day name, full month name, zero-padded day-of-year, 12-hour
    clock with AM/PM. Pure string formatting — what is being pinned is
    that the two engines' pattern languages, default locales and
    padding rules produce byte-identical strings for these families
    (day/month names are locale-sensitive: Spark's session locale and
    DuckDB's C locale both emit English here).

    Scale shape: narrow scan, per-row JVM formatting inside codegen."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("iso_s"),
        F.date_format("ts", "EEEE").alias("day_name"),
        F.date_format("ts", "MMMM").alias("month_name"),
        F.date_format("ts", "DDD").alias("day_of_year"),
        F.date_format("ts", "hh:mm a").alias("twelve_hour"),
    )


@query(
    "fn_bit_functions",
    oracle="""
    SELECT event_id,
           CAST(bit_count(event_id) AS INT) AS popcount,
           CAST((event_id >> 3) & 1 AS INT) AS bit3,
           CAST(event_id & 255 AS BIGINT) AS low_byte,
           CAST(xor(event_id, 4095) AS BIGINT) AS xor_mask,
           CAST((event_id << 2) | 3 AS BIGINT) AS shifted_or
    FROM events WHERE event_id < 1000
    """,
    ref="SURVEY §2 H17 [EXT] (bit-manipulation function parity: "
    "popcount, single-bit probe, AND/XOR masks, shift-or — the "
    "primitives every bitmap/bloom/hash-partitioning layer builds on "
    "(operators/bitmaps.py is made of exactly these); DuckDB spells "
    "XOR as # and probes bits MSB-first on the BIT type, pinned here)",
)
def fn_bit_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five bitwise primitives over event ids: population count, a
    single-bit probe (Spark getbit(x, 3) vs the shift-mask spelling —
    DuckDB's own get_bit works on BIT values and indexes MSB-first,
    exactly the divergence that motivates pinning), AND mask, XOR mask
    (a FUNCTION in DuckDB, an operator in Spark), and a shift-or
    compose. Pure integer ops, bit-identical by definition — the entry
    exists to pin the SPELLINGS.

    Scale shape: narrow filtered scan, per-row codegen."""
    ev = load(spark, sf_dir, "events")
    return ev.where(F.col("event_id") < 1000).select(
        "event_id",
        F.bit_count("event_id").cast("int").alias("popcount"),
        F.getbit("event_id", F.lit(3)).cast("int").alias("bit3"),
        F.expr("event_id & 255").cast("bigint").alias("low_byte"),
        F.expr("event_id ^ 4095").cast("bigint").alias("xor_mask"),
        F.expr("shiftleft(event_id, 2) | 3").cast("bigint").alias(
            "shifted_or"
        ),
    )


@query(
    "fn_string_pad_translate",
    oracle="""
    SELECT o_orderkey,
           lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS padded_key,
           rpad(o_orderpriority, 20, '.') AS padded_priority,
           translate(o_orderpriority, '-', '_') AS translated,
           repeat(substring(o_orderstatus, 1, 1), 3) AS repeated,
           reverse(CAST(o_orderkey AS VARCHAR)) AS reversed_key
    FROM orders WHERE o_orderkey < 500
    """,
    ref="SURVEY §2 H18 [EXT] (string shaping parity: lpad/rpad fill, "
    "translate character mapping, repeat, reverse — the fixed-width "
    "key/export formatting family; pins pad-truncation and multi-char "
    "fill semantics across engines)",
)
def fn_string_pad_translate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five string-shaping primitives over order keys: zero-padded
    fixed-width key, dot-padded right fill, character translation,
    repeat, reverse. Byte-identical by definition — pinned for the
    spelling/semantics (e.g. both engines truncate when the input
    exceeds the pad width).

    Scale shape: filtered narrow scan, per-row codegen."""
    o = load(spark, sf_dir, "orders")
    return o.where(F.col("o_orderkey") < 500).select(
        "o_orderkey",
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0").alias(
            "padded_key"
        ),
        F.rpad("o_orderpriority", 20, ".").alias("padded_priority"),
        F.translate("o_orderpriority", "-", "_").alias("translated"),
        F.repeat(F.substring("o_orderstatus", 1, 1), 3).alias("repeated"),
        F.reverse(F.col("o_orderkey").cast("string")).alias("reversed_key"),
    )
