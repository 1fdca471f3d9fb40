"""Corpus-curation operators (SURVEY.md §2.K [EXT]) — the selection/ordering
decisions a pretraining data pipeline makes AFTER per-document signals exist:
curriculum bucketing, token-budget selection, prefix dedup, vocabulary
extraction, outlier clipping.

All pure DataFrame ops (no Python in the hot path). Global-order steps use
either broadcast quantile thresholds (no window at all) or the
range-partitioned cumsum from operators/scale.py — never a single-partition
window. Reference analog: the reference engine has no corpus tooling
(ksql.js:131-134 defines only K8s tables); these extend the mandated
LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import Window as SparkWindow

from ksql_spark.operators import text
from ksql_spark.operators.scale import pin, ranged_cumsum
from ksql_spark.registry import davg, query, sql_davg
from ksql_spark.tables import load

#: DuckDB spelling of operators/text.py:quality_score (same formula as the
#: llm_quality_score oracle — single-space corpora make string_split(text,' ')
#: identical to the \s+ split).
SQL_QUALITY = """
    0.4 * least(1.0, len(string_split(text,' ')) / 100.0)
    + 0.3 * (len(list_distinct(string_split(text,' '))) * 1.0
             / len(string_split(text,' ')))
    + 0.3 * (len(list_filter(string_split(text,' '),
                 x -> x IN ('the','a','of','and','to','in','is'))) * 1.0
             / len(string_split(text,' ')))
"""

TOKEN_BUDGET = 25_000


@query(
    "llm_curriculum",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, len(string_split(text,' ')) AS n_tokens,
               ({SQL_QUALITY}) AS quality
        FROM documents
    ),
    q AS (
        SELECT quantile_cont(quality, 0.25) AS q1,
               quantile_cont(quality, 0.50) AS q2,
               quantile_cont(quality, 0.75) AS q3
        FROM scored
    )
    SELECT CAST(CASE WHEN quality <= q1 THEN 0
                     WHEN quality <= q2 THEN 1
                     WHEN quality <= q3 THEN 2
                     ELSE 3 END AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
           {sql_davg('quality')} AS avg_quality
    FROM scored, q
    GROUP BY bucket
    """,
    ref="SURVEY §2 K4/K10 [EXT] (curriculum bucketing: quality quartiles → "
    "training phases; threshold-broadcast formulation, no global window)",
)
def llm_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile curriculum buckets by quality score: bucket 0 = lowest
    quality (train first / drop), bucket 3 = highest (anneal on).

    Scale shape: the obvious NTILE(4) is a single-partition global window.
    Instead the three quartile boundaries are computed in ONE aggregation
    (exact percentile here; percentile_approx at 100 TB — same plan shape),
    broadcast as a 1-row cross join, and the bucket is a per-row CASE —
    scan-bound, no window anywhere. Exact interpolated percentiles match
    DuckDB's quantile_cont bitwise (proven by the agg_quantiles entry)."""
    d = load(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        text.word_count("text").alias("n_tokens"),
        text.quality_score("text").alias("quality"),
    )
    q = scored.agg(
        F.percentile("quality", F.lit(0.25)).alias("q1"),
        F.percentile("quality", F.lit(0.50)).alias("q2"),
        F.percentile("quality", F.lit(0.75)).alias("q3"),
    )
    bucket = (
        F.when(F.col("quality") <= F.col("q1"), 0)
        .when(F.col("quality") <= F.col("q2"), 1)
        .when(F.col("quality") <= F.col("q3"), 2)
        .otherwise(3)
    )
    return (
        scored.crossJoin(F.broadcast(q))
        .select("doc_id", "n_tokens", "quality", bucket.cast("int").alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
            davg("quality").alias("avg_quality"),
        )
    )


@query(
    "llm_token_budget",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, len(string_split(text,' ')) AS n_tokens,
               ({SQL_QUALITY}) AS quality
        FROM documents
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(SUM(n_tokens) OVER (
               ORDER BY quality DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_tokens,
           SUM(n_tokens) OVER (
               ORDER BY quality DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) - n_tokens < {TOKEN_BUDGET} AS selected
    FROM scored
    """,
    ref="SURVEY §2 K4/K10/K11 [EXT] (token-budget selection: greedy "
    "best-quality-first until the training budget fills; the cumsum is the "
    "range-partitioned two-pass, not a global window)",
)
def llm_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy quality-ordered selection under a total token budget: a doc is
    selected iff the budget is not yet exhausted when its turn comes (its
    exclusive running offset < budget). Every doc is returned with its
    running total and verdict, so downstream can audit the cut line.

    Scale shape: cumsum over (quality DESC, doc_id) via
    operators/scale.py:ranged_cumsum — range partitioning on the sort key
    keeps the prefix-sum parallel; no Exchange SinglePartition
    (test_plans.py gate)."""
    d = load(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        text.word_count("text").cast("long").alias("n_tokens"),
        text.quality_score("text").alias("quality"),
    )
    cum = ranged_cumsum(
        scored,
        [F.col("quality").desc(), F.col("doc_id")],
        "n_tokens",
        out_col="cum_tokens",
    )
    return cum.select(
        "doc_id",
        "n_tokens",
        F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
        ((F.col("cum_tokens") - F.col("n_tokens")) < TOKEN_BUDGET).alias("selected"),
    )


@query(
    "llm_dedup_prefix",
    oracle="""
    WITH p AS (
        SELECT doc_id,
               array_to_string(list_slice(string_split(text,' '), 1, 8), ' ')
                   AS prefix
        FROM documents
    ),
    g AS (
        SELECT prefix, CAST(COUNT(*) AS BIGINT) AS group_size,
               MIN(doc_id) AS canon
        FROM p GROUP BY prefix
    )
    SELECT p.doc_id, g.group_size, p.doc_id = g.canon AS is_canonical
    FROM p JOIN g USING (prefix)
    """,
    ref="SURVEY §2 K2 [EXT] (prefix dedup: the CommonCrawl-style "
    "first-k-words duplicate heuristic — catches boilerplate mirrors that "
    "differ only in tails; complements MinHash (llm_dedup_near) and exact "
    "hash (llm_dedup_exact))",
)
def llm_dedup_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group documents by their first-8-words prefix; the minimum doc_id in
    each group is canonical, the rest are prefix-duplicates.

    Scale shape: one shuffle on the prefix for the group stats; the
    stats-side output partitioning matches the join key so only the probe
    side exchanges again. At 100 TB the join key should be xxhash64(prefix)
    (8 bytes instead of a string) — same plan, smaller shuffle; the string
    key here keeps the oracle exact."""
    d = load(spark, sf_dir, "documents")
    p = d.select(
        "doc_id",
        F.concat_ws(" ", F.slice(text.words("text"), 1, 8)).alias("prefix"),
    )
    g = p.groupBy("prefix").agg(
        F.count("*").alias("group_size"), F.min("doc_id").alias("canon")
    )
    return p.join(g, "prefix").select(
        "doc_id",
        "group_size",
        (F.col("doc_id") == F.col("canon")).alias("is_canonical"),
    )


@query(
    "llm_vocab_topk",
    oracle="""
    SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    ORDER BY cnt DESC, word
    LIMIT 200
    """,
    ref="SURVEY §2 K4 [EXT] (corpus vocabulary: explode→count→top-k, the "
    "seed step of any tokenizer/vocab build)",
)
def llm_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-200 corpus vocabulary by raw frequency (deterministic word
    tiebreak).

    Scale shape: explode→partial count (map-side combine shrinks each task's
    output to its distinct words)→final count on the word key→
    TakeOrderedAndProject. The only wide exchange carries (word, partial
    count) pairs — vocabulary-sized, not corpus-sized."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(text.words("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "word")
        .limit(200)
    )


@query(
    "llm_winsorize",
    oracle="""
    WITH q AS (
        SELECT quantile_cont(n_chars, 0.05) AS lo,
               quantile_cont(n_chars, 0.95) AS hi
        FROM documents
    )
    SELECT doc_id, n_chars,
           least(greatest(CAST(n_chars AS DOUBLE), lo), hi)
               AS n_chars_winsorized
    FROM documents, q
    """,
    ref="SURVEY §2 K4/D8 [EXT] (winsorization: clip a numeric feature at "
    "p05/p95 — standard outlier treatment before length-balanced sampling)",
)
def llm_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clip document length at the exact 5th/95th percentiles.

    Scale shape: identical to llm_curriculum — percentiles in one agg
    (percentile_approx at 100 TB), broadcast 1-row cross join, per-row
    least/greatest. No window, no second shuffle."""
    d = load(spark, sf_dir, "documents")
    q = d.agg(
        F.percentile("n_chars", F.lit(0.05)).alias("lo"),
        F.percentile("n_chars", F.lit(0.95)).alias("hi"),
    )
    return d.crossJoin(F.broadcast(q)).select(
        "doc_id",
        "n_chars",
        F.least(
            F.greatest(F.col("n_chars").cast("double"), F.col("lo")), F.col("hi")
        ).alias("n_chars_winsorized"),
    )


@query(
    "llm_sample_weighted",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, ({SQL_QUALITY}) AS quality
        FROM documents
    )
    SELECT doc_id, quality,
           ((((doc_id % 2147483648) * 2654435761) % 4294967296) / 4294967296.0) < quality
               AS selected
    FROM scored
    """,
    ref="SURVEY §2 K10 [EXT] (quality-weighted sampling: keep-probability = "
    "quality via the Knuth multiplicative hash — deterministic, seedless, "
    "engine-portable integer math; complements the uniform hash-mod "
    "llm_sample_stratified)",
)
def llm_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus sampling: each document is kept with probability equal
    to its quality score, decided by a deterministic per-key uniform draw
    u = ((doc_id mod 2^31) * 2654435761 mod 2^32) / 2^32 (Knuth's
    multiplicative hash — exact BIGINT math kept below 2^62 by reducing the
    id first, so Spark's ANSI int64 never overflows and both engines agree
    bitwise; a seed would be an added XOR on doc_id).

    Scale shape: pure narrow scan — no shuffle, no window, no join; the
    decision is a per-row expression. The standard way to thin 100 TB to a
    quality-weighted subset in one pass."""
    d = load(spark, sf_dir, "documents")
    u = (
        ((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761).cast("long")) % F.lit(4294967296)
    ).cast("double") / F.lit(4294967296.0)
    return d.select(
        "doc_id",
        text.quality_score("text").alias("quality"),
        (u < F.col("quality")).alias("selected"),
    )


_NORM_SQL = """
sqrt(list_reduce(
    list_prepend(CAST(0.0 AS DOUBLE),
        list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
    (acc, p) -> acc + p))
"""


@query(
    "llm_pipeline_e2e",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, text,
               len(string_split(text,' ')) AS n_tokens,
               ({SQL_QUALITY}) AS quality
        FROM documents
    ),
    gated AS (
        SELECT * FROM scored WHERE quality >= 0.3
    ),
    canon AS (
        SELECT md5(text) AS h, MIN(doc_id) AS keep_id
        FROM gated GROUP BY h
    ),
    deduped AS (
        SELECT g.* FROM gated g JOIN canon c
          ON md5(g.text) = c.h AND g.doc_id = c.keep_id
    )
    SELECT d.doc_id, CAST(d.n_tokens AS BIGINT) AS n_tokens, d.quality,
           {_NORM_SQL} AS emb_norm
    FROM deduped d JOIN embeddings e ON d.doc_id = e.vec_id
    WHERE ((((d.doc_id % 2147483648) * 2654435761) % 4294967296) / 4294967296.0) < d.quality
    """,
    ref="SURVEY §2 K1/K4/K6/K10 [EXT] composite (the flagship shard-build "
    "pipeline: quality gate -> exact dedup -> embedding join -> weighted "
    "selection, ONE declarative plan end-to-end — what a user actually runs "
    "nightly over the corpus)",
)
def llm_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-shard selection in a single Catalyst plan:

      1. score quality + token counts (narrow scan);
      2. gate quality >= 0.3 (filter, pushed into the scan's project);
      3. exact dedup — keep the min doc_id per md5(text) (one shuffle on the
         hash; the canonical set joins back on the same key, exchange
         reused);
      4. join the embeddings table on doc_id = vec_id (at 100 TB both sides
         hash on the id; here the deduped side broadcasts);
      5. weighted keep via the deterministic Knuth draw (per-row expr);
      6. emit the shard manifest: id, tokens, quality, embedding L2 norm.

    Because every stage is an engine-portable expression, the WHOLE pipeline
    is oracle-exact — not just its pieces. One job, three exchanges total
    (dedup agg + its join-back + embedding join), everything else narrow."""
    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    scored = d.select(
        "doc_id",
        "text",
        text.word_count("text").cast("long").alias("n_tokens"),
        text.quality_score("text").alias("quality"),
    ).where(F.col("quality") >= 0.3)
    h = F.md5(F.col("text").cast("binary"))
    canon = (
        scored.groupBy(h.alias("h")).agg(F.min("doc_id").alias("keep_id"))
    )
    deduped = scored.join(
        canon,
        (h == F.col("h")) & (F.col("doc_id") == F.col("keep_id")),
    )
    from ksql_spark.operators import vectors

    u = (
        ((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761).cast("long")) % F.lit(4294967296)
    ).cast("double") / F.lit(4294967296.0)
    return (
        deduped.join(e, F.col("doc_id") == F.col("vec_id"))
        .where(u < F.col("quality"))
        .select(
            "doc_id",
            "n_tokens",
            "quality",
            vectors.l2_norm("embedding").alias("emb_norm"),
        )
    )


@query(
    "llm_sample_fixed_k",
    oracle="""
    SELECT doc_id
    FROM documents
    ORDER BY ((doc_id % 2147483648) * 2654435761) % 4294967296, doc_id
    LIMIT 100
    """,
    ref="SURVEY §2 K10/F5 [EXT] (fixed-size uniform sample: the K smallest "
    "deterministic hash draws — a seedless reservoir sample; same Knuth "
    "draw as llm_sample_weighted)",
)
def llm_sample_fixed_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-100-document uniform sample: order by the deterministic Knuth
    draw, take the first 100 (doc_id tiebreak).

    Scale shape: TakeOrderedAndProject — each task keeps its local top-100
    by hash, the driver merges #partitions × 100 rows. No global sort, no
    shuffle of the corpus; this is how you cut a fixed-size eval set from
    100 TB in one pass."""
    d = load(spark, sf_dir, "documents")
    u = ((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761).cast("long")) % F.lit(4294967296)
    return d.select("doc_id").orderBy(u, "doc_id").limit(100)


@query(
    "llm_sample_stratified_k",
    oracle="""
    SELECT lang, doc_id FROM (
        SELECT lang, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY ((doc_id % 2147483648) * 2654435761) % 4294967296, doc_id
               ) AS rn
        FROM documents
    ) WHERE rn <= 20
    """,
    ref="SURVEY §2 K10/E5 [EXT] (stratified fixed-K: 20 uniform draws PER "
    "LANGUAGE via per-group rank over the deterministic hash — the "
    "balanced-eval-set builder)",
)
def llm_sample_stratified_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 20 documents per language, drawn uniformly by the
    deterministic hash order.

    Scale shape: the window partitions by lang — parallel across groups,
    never a single-partition window; each group's rank is a local sort of
    that group only. One shuffle on lang."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    u = ((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761).cast("long")) % F.lit(4294967296)
    w = Window.partitionBy("lang").orderBy(u.asc(), F.col("doc_id"))
    return (
        d.select("lang", "doc_id", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 20)
        .select("lang", "doc_id")
    )


@query(
    "llm_text_normalize",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
               ' +', ' ', 'g')) AS norm_text
    FROM documents
    """,
    ref="SURVEY §2 K4/H2 [EXT] (canonical text normalization: lowercase, "
    "strip non-alphanumerics, collapse runs of spaces — the pre-hash step "
    "for every exact/near dedup pass)",
)
def llm_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized text per document (lowercase → drop non-[a-z0-9 ] → collapse
    spaces → trim). Both engines use the same explicit character classes so
    the regex semantics cannot diverge (POSIX classes deliberately avoided).

    Scale shape: pure per-row expressions — scan-bound, codegen'd, no
    Python."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
                " +",
                " ",
            )
        ).alias("norm_text"),
    )


@query(
    "profile_documents",
    oracle="""
    SELECT 'doc_id' AS col, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT(doc_id) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct,
           CAST(MIN(doc_id) AS VARCHAR) AS min_val,
           CAST(MAX(doc_id) AS VARCHAR) AS max_val
    FROM documents
    UNION ALL
    SELECT 'lang', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(lang) AS BIGINT),
           CAST(COUNT(DISTINCT lang) AS BIGINT),
           MIN(lang), MAX(lang)
    FROM documents
    UNION ALL
    SELECT 'source', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(source) AS BIGINT),
           CAST(COUNT(DISTINCT source) AS BIGINT),
           MIN(source), MAX(source)
    FROM documents
    UNION ALL
    SELECT 'n_chars', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(n_chars) AS BIGINT),
           CAST(COUNT(DISTINCT n_chars) AS BIGINT),
           CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR)
    FROM documents
    """,
    ref="SURVEY §2 D1/D2/G2 [EXT] (data profiling: per-column null/distinct/"
    "range summary — the first command anyone runs on an unfamiliar corpus; "
    "generic over any column list)",
)
def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of the documents table: rows, nulls, distincts,
    min/max (stringified) for each profiled column.

    Scale shape: ONE aggregation pass computes every column's stats
    simultaneously (count/count(col)/min/max are all partial-aggregable;
    count_distinct rewrites to expand+two-phase agg); the per-column rows
    are then a constant-width unpivot of that single result. At 100 TB swap
    count_distinct for approx_count_distinct — same single-pass shape.
    Generalizes to any table: the builder iterates columns, not data."""
    d = load(spark, sf_dir, "documents")
    cols = ["doc_id", "lang", "source", "n_chars"]
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs += [
            (F.count("*") - F.count(c)).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one = d.agg(*aggs)
    parts = [
        one.select(
            F.lit(c).alias("col"),
            F.col("n_rows"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_val"),
            F.col(f"{c}__max").alias("max_val"),
        )
        for c in cols
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


@query(
    "snapshot_diff_status",
    oracle="""
    WITH v1 AS (
        SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 10 < 9
    ),
    v2 AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0
                    ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 10 > 0
    )
    SELECT CASE WHEN v1.o_orderkey IS NULL THEN 'added'
                WHEN v2.o_orderkey IS NULL THEN 'removed'
                WHEN v1.o_totalprice <> v2.o_totalprice THEN 'changed'
                ELSE 'unchanged' END AS status,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
    GROUP BY status
    """,
    ref="SURVEY §2 A5/C4 [EXT] (snapshot diff: the reference's refresh model "
    "(ksql.js:280 re-loads cluster snapshots) made first-class — classify "
    "every key across two table versions as added/removed/changed/unchanged "
    "via one full outer join)",
)
def snapshot_diff_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff two deterministic 'snapshots' of orders (overlapping key ranges,
    some values mutated) into per-status counts.

    Scale shape: one full outer join on the snapshot key (both sides hash on
    it), statuses decided per-row, then a 4-group agg. This is how a
    periodic-refresh pipeline (the reference's model) turns snapshots into a
    change feed without CDC support from the source."""
    o = load(spark, sf_dir, "orders")
    v1 = o.where(F.col("o_orderkey") % 10 < 9).select(
        F.col("o_orderkey").alias("k1"), F.col("o_totalprice").alias("p1")
    )
    v2 = o.where(F.col("o_orderkey") % 10 > 0).select(
        F.col("o_orderkey").alias("k2"),
        F.when(F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 1.0)
        .otherwise(F.col("o_totalprice"))
        .alias("p2"),
    )
    status = (
        F.when(F.col("k1").isNull(), "added")
        .when(F.col("k2").isNull(), "removed")
        .when(F.col("p1") != F.col("p2"), "changed")
        .otherwise("unchanged")
    )
    return (
        v1.join(v2, F.col("k1") == F.col("k2"), "full_outer")
        .select(status.alias("status"))
        .groupBy("status")
        .agg(F.count("*").alias("n"))
    )


@query(
    "llm_source_vocab_overlap",
    oracle="""
    WITH v AS (
        SELECT DISTINCT source, unnest(string_split(text, ' ')) AS w
        FROM documents
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM v a JOIN v b ON a.w = b.w AND a.source < b.source
    GROUP BY source_a, source_b
    """,
    ref="SURVEY §2 K4/C7 [EXT] (cross-domain vocabulary overlap: shared "
    "distinct words per source pair — the quick domain-similarity probe "
    "before deciding mixing weights)",
)
def llm_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-vocabulary size for every (source_a < source_b) pair.

    Scale shape: the distinct (source, word) projection collapses the corpus
    to vocabulary scale BEFORE the self-join; the join keys on the word, so
    a word shared by s sources expands to s² pairs only within its own hash
    bucket. Output is |sources|² rows — constant."""
    d = load(spark, sf_dir, "documents")
    v = d.select(
        "source", F.explode(text.words("text")).alias("w")
    ).distinct()
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").alias("n_shared"))
    )


@query(
    "llm_dedup_keep_best",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, md5(text) AS h, ({SQL_QUALITY}) AS quality
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, h, quality,
               ROW_NUMBER() OVER (
                   PARTITION BY h ORDER BY quality DESC, doc_id
               ) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY h) AS BIGINT) AS n_copies
        FROM scored
    )
    SELECT doc_id, quality, n_copies
    FROM ranked WHERE rn = 1
    """,
    ref="SURVEY §2 K1/K4/E5 [EXT] (exact dedup keeping the BEST copy: "
    "rank within each content-hash group by quality — what a curation "
    "pipeline actually wants, vs llm_dedup_exact's min-id canonical)",
)
def llm_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per distinct text: the highest-quality copy (doc_id tiebreak),
    with the group's copy count.

    Scale shape: one shuffle on the content hash; the rank window partitions
    by that same hash (parallel across groups, each group tiny). Exactly the
    top-1-per-group pattern — no second pass, no join-back."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("h"),
        text.quality_score("text").alias("quality"),
    )
    w = Window.partitionBy("h").orderBy(F.col("quality").desc(), F.col("doc_id"))
    cw = Window.partitionBy("h")
    return (
        scored.select(
            "doc_id",
            "quality",
            F.row_number().over(w).alias("rn"),
            F.count("*").over(cw).alias("n_copies"),
        )
        .where(F.col("rn") == 1)
        .select("doc_id", "quality", "n_copies")
    )


@query(
    "llm_rarity_score",
    oracle=f"""
    WITH freq AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT unnest(string_split(text,' ')) AS w FROM documents)
        WHERE w <> '' GROUP BY w
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM freq),
    per_word AS (
        SELECT doc_id, w FROM (
            SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents
        ) WHERE w <> ''
    )
    SELECT doc_id,
           {sql_davg('CAST(total AS DOUBLE) / n')} AS avg_inv_freq,
           CAST(COUNT(*) AS BIGINT) AS n_words
    FROM per_word JOIN freq USING (w) CROSS JOIN tot
    GROUP BY doc_id
    """,
    ref="SURVEY §2 K4 [EXT] (document rarity: mean inverse corpus frequency "
    "of its words — the transcendental-free perplexity proxy; high = rare "
    "vocabulary, low = boilerplate. Exact rational per-word scores, "
    "quantized mean)",
)
def llm_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average inverse word frequency per document (total_tokens / word_count
    per word, davg across the doc). A unigram-LM surprise proxy with NO
    log() — every per-word score is an exact integer ratio, so the oracle
    match is bitwise (a log-based perplexity would drift in libm low bits
    across engines).

    Scale shape: word frequencies = one explode+count (vocabulary-sized
    output, broadcastable); the per-word join hashes on the word; the final
    agg shuffles doc_id. Same skeleton as llm_tfidf."""
    d = load(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(text.words("text")).alias("w"))
    freq = words.groupBy("w").agg(F.count("*").alias("n"))
    tot = freq.agg(F.sum("n").alias("total"))
    return (
        words.join(freq, "w")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            davg(F.col("total").cast("double") / F.col("n")).alias("avg_inv_freq"),
            F.count("*").alias("n_words"),
        )
    )


def _minhash_portable_oracle(n_hash: int = 8, rows_per_band: int = 2) -> str:
    # NOTE: this oracle tokenizes with string_split(text, ' ') — exact parity
    # with the Spark side (words(): \s+ split, empties dropped) holds on
    # single-space-separated corpora, which the driver fixtures are. On
    # multi-space/newline text the two tokenizations (hence gram sets) can
    # differ; the Spark builder is self-consistent either way because its
    # >=3-words gate uses the same words() tokenizer as its shingles.
    gram = ("list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1), "
            "i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] "
            "|| ' ' || string_split(text,' ')[i+2]))")
    sigs = ",\n           ".join(
        f"list_min(list_transform(grams, x -> md5('{h}:' || x))) AS s{h}"
        for h in range(n_hash)
    )
    bands = "\n        UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, "
        f"md5(s{rows_per_band*b} || s{rows_per_band*b+1}) AS bh FROM s"
        for b in range(n_hash // rows_per_band)
    )
    return f"""
    WITH g AS (
        SELECT doc_id, {gram} AS grams
        FROM documents
        WHERE len(string_split(text,' ')) >= 3
    ),
    s AS (
        SELECT doc_id, grams,
           {sigs}
        FROM g
    ),
    b AS (
        {bands}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
        FROM b a JOIN b c
          ON a.band_idx = c.band_idx AND a.bh = c.bh AND a.doc_id < c.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(len(list_filter(ga.grams, x -> list_contains(gb.grams, x))) AS DOUBLE)
           / CAST(len(ga.grams) + len(gb.grams)
                  - len(list_filter(ga.grams, x -> list_contains(gb.grams, x)))
             AS DOUBLE) AS jaccard
    FROM cand
    JOIN g ga ON ga.doc_id = doc_a
    JOIN g gb ON gb.doc_id = doc_b
    WHERE len(list_filter(ga.grams, x -> list_contains(gb.grams, x))) * 2
          >= len(ga.grams) + len(gb.grams)
            - len(list_filter(ga.grams, x -> list_contains(gb.grams, x)))
    """


@query(
    "llm_dedup_near_portable",
    oracle=_minhash_portable_oracle(),
    ref="SURVEY §2 K2 [EXT] (ENGINE-PORTABLE MinHash-LSH: md5-string min "
    "signatures → banded candidate join → exact Jaccard >= 0.5 verify — the "
    "full LSH pipeline, ORACLE-EXACT end to end; the production entry "
    "llm_dedup_near keeps xxhash64 (faster, engine-specific → rows-only). "
    "Same banding math, provably identical candidates in both engines)",
)
def llm_dedup_near_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs via portable MinHash-LSH: 8 signatures (min of
    md5('<h>:'||shingle) hex strings — lexicographic min is identical in any
    engine), 4 bands x 2 rows, candidates = docs sharing any band hash,
    verified at exact 3-gram Jaccard >= 0.5.

    Scale shape: identical to llm_dedup_near — signatures are a narrow
    per-doc pass; the candidate join shuffles (band_idx, band_hash) pairs
    (4 rows/doc); only candidate pairs pay the exact-Jaccard verify. md5 is
    ~3x slower than xxhash64 per shingle — the price of cross-engine
    exactness; keep the xxhash entry for production, this one for parity
    proof."""
    from ksql_spark.operators.dedup import minhash_near_dups_portable

    d = load(spark, sf_dir, "documents")
    return minhash_near_dups_portable(
        d, "text", "doc_id", n_hash=8, rows_per_band=2, jaccard_threshold=0.5
    )


@query(
    "llm_dedup_cluster_portable",
    oracle=f"""
    WITH pairs AS ({_minhash_portable_oracle()}),
    sym AS (
        SELECT doc_a AS s1, doc_b AS s2 FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs
        UNION SELECT doc_a, doc_a FROM pairs
        UNION SELECT doc_b, doc_b FROM pairs
    ),
    reach AS (
        WITH RECURSIVE r(a, b) AS (
            SELECT s1, s2 FROM sym
            UNION
            SELECT r.a, sym.s2 FROM r JOIN sym ON sym.s1 = r.b
        ) SELECT a, b FROM r
    ),
    labels AS (
        SELECT a AS doc_id, MIN(b) AS canonical_id FROM reach GROUP BY a
    )
    SELECT d.doc_id,
           COALESCE(l.canonical_id, d.doc_id) AS canonical_id,
           d.doc_id = COALESCE(l.canonical_id, d.doc_id) AS is_canonical
    FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id
    """,
    ref="SURVEY §2 K2+L2 [EXT] (ORACLE-EXACT near-dup cluster resolution: "
    "the portable MinHash-LSH pairs chained into connected components — "
    "closes the rows-only gap of llm_dedup_cluster; oracle = recursive "
    "transitive closure over the identical pair graph)",
)
def llm_dedup_cluster_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document mapped to its near-dup cluster canonical (min doc_id
    reachable through portable-LSH verified pairs; singletons map to
    themselves) — the full dedup decision, bit-checkable cross-engine
    because every stage (md5 signatures, banding, Jaccard verify, min-label
    closure) is engine-portable math.

    Scale shape: pairs are sub-quadratic (banded LSH); the component step is
    the O(nodes)-state min-label propagation (queries/graph.py); the final
    left join restores singleton docs."""
    from ksql_spark.queries.graph import connected_components

    d = load(spark, sf_dir, "documents")
    pairs = llm_dedup_near_portable(spark, sf_dir)
    half = pairs.select(F.col("doc_a").alias("s1"), F.col("doc_b").alias("s2"))
    adj = half.unionByName(
        half.select(F.col("s2").alias("s1"), F.col("s1").alias("s2"))
    )
    labels = connected_components(adj).withColumnsRenamed(
        {"suppkey": "ldoc", "component": "canonical_id"}
    )
    return (
        d.select("doc_id")
        .join(labels, F.col("doc_id") == F.col("ldoc"), "left")
        .select(
            "doc_id",
            F.coalesce("canonical_id", "doc_id").alias("canonical_id"),
        )
        .withColumn("is_canonical", F.col("doc_id") == F.col("canonical_id"))
    )


def _simhash_portable_oracle(n_bits: int = 32) -> str:
    bit_terms = " + ".join(
        f"(CASE WHEN len(list_filter(hs, h -> (h >> {j}) & 1 = 1)) * 2 "
        f"> len(hs) THEN {1 << j} ELSE 0 END)"
        for j in range(n_bits)
    )
    return f"""
    WITH w AS (
        SELECT doc_id,
               list_transform(
                   list_distinct(string_split(text, ' ')),
                   x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS hs
        FROM documents
    ),
    sh AS (
        SELECT doc_id, CAST({bit_terms} AS BIGINT) AS simhash FROM w
    )
    SELECT simhash, MIN(doc_id) AS rep_id, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM sh GROUP BY simhash
    """


@query(
    "llm_dedup_simhash_portable",
    oracle=_simhash_portable_oracle(),
    ref="SURVEY §2 K2 [EXT] (ENGINE-PORTABLE SimHash: 32-bit per-word "
    "hashes from md5 hex (Spark conv(hex,16,10) == DuckDB '0x'::BIGINT), "
    "strict-majority bit vote — the fingerprint is bit-identical in both "
    "engines, closing llm_dedup_simhash's rows-only gap)",
)
def llm_dedup_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-32 fingerprint buckets with a fully portable hash: per
    distinct word, the first 8 md5 hex chars as a 32-bit int; fingerprint
    bit j is set iff a strict majority of the doc's words have bit j set
    (ties → 0). Same grouping contract as llm_dedup_simhash (bucket →
    min-id representative + count).

    Scale shape: one narrow per-doc pass (HOF filters, no explode), one
    shuffle on the 8-byte fingerprint. md5+conv costs ~3x xxhash64 — the
    portability price, as with llm_dedup_near_portable."""
    d = load(spark, sf_dir, "documents")
    hs = F.transform(
        F.array_distinct(F.split(F.col("text"), " ")),
        lambda x: F.conv(F.substring(F.md5(x.cast("binary")), 1, 8), 16, 10).cast(
            "long"
        ),
    )
    w = d.select("doc_id", hs.alias("hs"))
    # one SQL expression mirroring the oracle's bit votes exactly
    bit_terms = " + ".join(
        f"(CASE WHEN size(filter(hs, h -> shiftright(h, {j}) % 2 = 1)) * 2 "
        f"> size(hs) THEN {1 << j}L ELSE 0L END)"
        for j in range(32)
    )
    return (
        w.select("doc_id", F.expr(f"CAST({bit_terms} AS BIGINT)").alias("simhash"))
        .groupBy("simhash")
        .agg(F.min("doc_id").alias("rep_id"), F.count("*").alias("n_docs"))
    )


#: 8 bands x 3 planes: a candidate shares ANY band's 3-bit sign bucket —
#: the OR-amplification that gives LSH usable recall (a single 24-plane
#: bucket would almost never collide on a near-uniform corpus). Swept at
#: sf0.01 (tools/lsh_recall_exp.py): 4x4 = 0.40 recall@5 (the round-4
#: config, below the 0.5 bar), 5x4 = 0.53, 6x3 = 0.73, 8x3 = 0.80 —
#: fewer planes per band = coarser buckets = more candidates = higher
#: recall; 8x3 buys real margin over the enforced 0.5 gate
#: (ann_lsh_portable_recall) for 8 band rows/vector instead of 4.
_LSH_BANDS, _LSH_PLANES_PER_BAND = 8, 3


def _plane_dot_duck(p: int, vec: str = "embedding") -> str:
    """DuckDB dot(vec, plane_p) where plane components are the Knuth draw
    u(p,i) = hash(p*1000003 + i)/2^32 - 0.5 — exact integer math, identical
    in Spark."""
    return f"""list_reduce(list_transform(range(1, len({vec}) + 1),
        i -> CAST({vec}[i] AS DOUBLE) *
             (((({p} * 1000003 + (i - 1)) * 2654435761) % 4294967296)
              / 4294967296.0 - 0.5)),
        (acc, x) -> acc + x)"""


def _plane_dot_spark(p: int, vec: str = "embedding") -> str:
    return f"""aggregate(transform(sequence(1, size({vec})),
        i -> CAST(element_at({vec}, i) AS DOUBLE) *
             (((({p} * 1000003 + (i - 1)) * 2654435761) % 4294967296)
              / 4294967296.0 - 0.5)),
        CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"""


def _band_bucket(dot_fn, band: int) -> str:
    return " + ".join(
        f"(CASE WHEN {dot_fn(band * _LSH_PLANES_PER_BAND + r)} > 0 "
        f"THEN {1 << r} ELSE 0 END)"
        for r in range(_LSH_PLANES_PER_BAND)
    )


def _lsh_portable_oracle() -> str:
    band_sql = "\n        UNION ALL ".join(
        f"SELECT vec_id, embedding, {b} AS band, "
        f"CAST({_band_bucket(_plane_dot_duck, b)} AS INT) AS bucket "
        "FROM embeddings"
        for b in range(_LSH_BANDS)
    )
    dot = """list_reduce(list_transform(range(1, len(q.embedding) + 1),
        i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)),
        (acc, x) -> acc + x)"""
    norm = lambda a: f"""sqrt(list_reduce(list_transform({a},
        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, p) -> acc + p))"""
    return f"""
    WITH b AS (
        {band_sql}
    ),
    q AS (SELECT * FROM b WHERE vec_id < 3),
    cand AS (
        SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS cid
        FROM q JOIN b c
          ON q.band = c.band AND q.bucket = c.bucket AND q.vec_id <> c.vec_id
    ),
    scored AS (
        SELECT cand.query_id, cand.cid AS vec_id,
               {dot} / ({norm('q.embedding')} * {norm('c.embedding')}) AS cosine
        FROM cand
        JOIN embeddings q ON q.vec_id = cand.query_id
        JOIN embeddings c ON c.vec_id = cand.cid
    )
    SELECT query_id, vec_id, cosine FROM (
        SELECT query_id, vec_id, cosine,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, vec_id) AS rn
        FROM scored
    ) WHERE rn <= 5
    """


@query(
    "ann_lsh_topk_portable",
    oracle=_lsh_portable_oracle(),
    ref="SURVEY §2 K3 [EXT] (ENGINE-PORTABLE random-hyperplane LSH: plane "
    "components from the Knuth integer draw, sign-bit bucket, exact cosine "
    "within bucket — the ANN bucketing fully ORACLE-EXACT, closing "
    "ann_lsh_topk's rows-only gap; the MLlib BucketedRandomProjectionLSH "
    "entry stays as the production path)",
)
def ann_lsh_topk_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 cosine neighbors via OR-amplified random-hyperplane
    LSH: 8 bands of 3 deterministic planes each; a candidate shares ANY
    band's sign-bit bucket; exact cosine ranks the candidates. Every number
    — plane components (integer Knuth draws), dots, buckets, cosines — is
    the same bit pattern in Spark and DuckDB (identical left-fold order for
    the double sums), so the WHOLE ANN path is oracle-exact.

    Scale shape: band/bucket assignment is one narrow pass emitting 8 rows
    per vector; the candidate join hashes on (band, bucket); only
    same-bucket pairs pay the exact cosine. More bands / fewer planes =
    higher recall at linearly more candidates — the standard LSH dial.
    Measured recall@5 = 0.80 at sf0.01 (see the _LSH_BANDS sweep note) and
    ENFORCED >= 0.5 by ann_lsh_portable_recall; MLlib's
    BucketedRandomProjectionLSH path (ann_lsh_topk, recall 0.93) stays the
    production entry."""
    e = load(spark, sf_dir, "embeddings")
    band_rows = [
        e.select(
            "vec_id",
            F.lit(b).alias("band"),
            F.expr(
                f"CAST({_band_bucket(_plane_dot_spark, b)} AS INT)"
            ).alias("bucket"),
        )
        for b in range(_LSH_BANDS)
    ]
    b = band_rows[0]
    for br in band_rows[1:]:
        b = b.unionAll(br)
    q = b.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("band").alias("q_band"),
        F.col("bucket").alias("q_bucket"),
    )
    cand = (
        q.join(
            b,
            (F.col("q_band") == F.col("band"))
            & (F.col("q_bucket") == F.col("bucket"))
            & (F.col("query_id") != F.col("vec_id")),
        )
        .select("query_id", F.col("vec_id").alias("cid"))
        .distinct()
    )
    from ksql_spark.operators import vectors

    # r14 (guide §1.2, the matryoshka device): each side's norm fold is a
    # one-side function — projected once per join input row instead of once
    # per candidate pair; same expression, bit-identical cosines.
    qe = e.select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        vectors.l2_norm("embedding").alias("q_n"),
    )
    ce = e.select(
        F.col("vec_id").alias("cid2"),
        F.col("embedding").alias("c_emb"),
        vectors.l2_norm("embedding").alias("c_n"),
    )
    cos = F.try_divide(
        vectors.dot("q_emb", "c_emb"),
        F.col("q_n") * F.col("c_n"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        cand.join(qe, F.col("query_id") == F.col("qid"))
        .join(ce, F.col("cid") == F.col("cid2"))
        .select(
            "query_id", F.col("cid").alias("vec_id"), cos.alias("cosine")
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .drop("rn")
    )


from ksql_spark.queries.llm import _ANN_RECALL_ORACLE


@query(
    "ann_lsh_portable_recall",
    oracle=_ANN_RECALL_ORACLE,
    ref="SURVEY §2 K3 [EXT] (portable-LSH quality gate: avg recall@5 vs "
    "exact brute-force >= 0.5, measured 0.80 at sf0.01 with the 8x3 "
    "band config — the enforcement the round-4 'measured 0.4, noted' "
    "footnote lacked)",
)
def ann_lsh_portable_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enforced recall gate for ann_lsh_topk_portable (same tolerance-oracle
    pattern as ann_ivf_recall/ann_lsh_recall): avg recall@5 against the
    exact brute-force top-5 must clear 0.5, else the boolean row
    hash-mismatches. Deterministic — the planes are fixed integer Knuth
    draws, so the measured 0.80 cannot drift run-to-run."""
    from ksql_spark.queries.llm import _ann_recall

    return _ann_recall(spark, sf_dir, ann_lsh_topk_portable, 0.5)


_IVF_K, _IVF_NPROBE = 16, 4

_SQL_L2SQ = """list_reduce(list_transform(range(1, len({a}) + 1),
    i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))
         * (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))),
    (acc, x) -> acc + x)"""


def _ivf_portable_oracle() -> str:
    l2 = _SQL_L2SQ.format(a="v.embedding", b="c.embedding")
    l2q = _SQL_L2SQ.format(a="q.embedding", b="c.embedding")
    dot = """list_reduce(list_transform(range(1, len(q.embedding) + 1),
        i -> CAST(q.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
        (acc, x) -> acc + x)"""
    norm = lambda a: f"""sqrt(list_reduce(list_transform({a},
        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, p) -> acc + p))"""
    return f"""
    WITH cents AS (
        SELECT vec_id AS cent_id, embedding FROM embeddings
        ORDER BY ((vec_id % 2147483648) * 2654435761) % 4294967296, vec_id
        LIMIT {_IVF_K}
    ),
    assigned AS (
        SELECT vec_id, cell FROM (
            SELECT v.vec_id, c.cent_id AS cell,
                   ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                      ORDER BY {l2}, c.cent_id) AS rn
            FROM embeddings v CROSS JOIN cents c
        ) WHERE rn = 1
    ),
    probes AS (
        SELECT query_id, cell FROM (
            SELECT q.vec_id AS query_id, c.cent_id AS cell,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                      ORDER BY {l2q}, c.cent_id) AS rn
            FROM embeddings q CROSS JOIN cents c
            WHERE q.vec_id < 3
        ) WHERE rn <= {_IVF_NPROBE}
    )
    SELECT query_id, vec_id, cosine FROM (
        SELECT p.query_id, a.vec_id,
               {dot} / ({norm('q.embedding')} * {norm('e.embedding')}) AS cosine,
               ROW_NUMBER() OVER (PARTITION BY p.query_id
                                  ORDER BY {dot} / ({norm('q.embedding')}
                                           * {norm('e.embedding')}) DESC,
                                           a.vec_id) AS rn
        FROM probes p
        JOIN assigned a ON a.cell = p.cell AND a.vec_id <> p.query_id
        JOIN embeddings q ON q.vec_id = p.query_id
        JOIN embeddings e ON e.vec_id = a.vec_id
    ) WHERE rn <= 5
    """


@query(
    "ann_ivf_topk_portable",
    oracle=_ivf_portable_oracle(),
    ref="SURVEY §2 K3 [EXT] (ENGINE-PORTABLE IVF: the coarse codebook is "
    "the 16 hash-selected corpus vectors (random-sample quantizer — no "
    "KMeans), cell assignment by exact L2, nprobe=4 probing, exact cosine "
    "re-rank — the complete IVF search ORACLE-EXACT; the KMeans-fitted "
    "entry ann_ivf_topk stays the production path)",
)
def ann_ivf_topk_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5 with a deterministic random-sample codebook:
    centroids = the 16 corpus vectors with the smallest Knuth-hash ids (a
    random-sample quantizer — standard IVF bootstrap before any KMeans
    refinement), cells assigned by exact squared-L2 argmin (cent_id
    tiebreak), queries probe their 4 nearest cells, candidates re-ranked by
    exact cosine. Every stage is portable arithmetic → bit-identical to the
    oracle.

    Scale shape: identical to ann_ivf_topk — the K-row codebook broadcasts
    (O(K*dim)); assignment is a narrow cross-probe O(n*K); search touches
    ~n*nprobe/K candidates. Only the codebook CONSTRUCTION differs (hash
    sample vs fitted KMeans — recall is lower for the unfitted codebook,
    which is why the MLlib path stays production)."""
    e = load(spark, sf_dir, "embeddings")
    from pyspark.sql import Window

    from ksql_spark.operators import vectors

    u = ((F.col("vec_id") % F.lit(2147483648)) * F.lit(2654435761).cast("long")) % F.lit(4294967296)
    cents = (
        e.orderBy(u, "vec_id")
        .limit(_IVF_K)
        .select(F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_emb"))
    )
    dist = vectors.l2_sq_dist("embedding", "c_emb")
    aw = Window.partitionBy("vec_id").orderBy(F.col("d").asc(), F.col("cent_id"))
    # r14 (guide §1.2, the matryoshka device): one-side norm folds projected
    # once per row on each join input instead of once per (query, candidate)
    # pair; same expression, bit-identical cosines.
    assigned = (
        e.crossJoin(F.broadcast(cents))
        .select("vec_id", "embedding", "cent_id", dist.alias("d"))
        .withColumn("rn", F.row_number().over(aw))
        .where(F.col("rn") == 1)
        .select(
            "vec_id",
            F.col("embedding").alias("a_emb"),
            vectors.l2_norm("embedding").alias("a_n"),
            F.col("cent_id").alias("cell"),
        )
    )
    qdist = vectors.l2_sq_dist("q_emb", "c_emb")
    q = e.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        vectors.l2_norm("embedding").alias("q_n"),
    )
    pw = Window.partitionBy("query_id").orderBy(F.col("qd").asc(), F.col("cent_id"))
    probes = (
        q.crossJoin(F.broadcast(cents))
        .select("query_id", "q_emb", "q_n", "cent_id", qdist.alias("qd"))
        .withColumn("rn", F.row_number().over(pw))
        .where(F.col("rn") <= _IVF_NPROBE)
        .select("query_id", "q_emb", "q_n", F.col("cent_id").alias("cell"))
    )
    cos = F.try_divide(
        vectors.dot("q_emb", "a_emb"),
        F.col("q_n") * F.col("a_n"),
    )
    tw = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        probes.join(assigned, "cell")
        .where(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id", cos.alias("cosine"))
        .withColumn("rn", F.row_number().over(tw))
        .where(F.col("rn") <= 5)
        .drop("rn")
    )


def _minhash_estimate_oracle(n_hash: int = 8) -> str:
    gram = ("list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1), "
            "i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] "
            "|| ' ' || string_split(text,' ')[i+2]))")
    sigs = ",\n           ".join(
        f"list_min(list_transform(grams, x -> md5('{h}:' || x))) AS s{h}"
        for h in range(n_hash)
    )
    matches = " + ".join(
        f"(CASE WHEN a.s{h} = b.s{h} THEN 1 ELSE 0 END)" for h in range(n_hash)
    )
    return f"""
    WITH g AS (
        SELECT doc_id, source, {gram} AS grams
        FROM documents
        WHERE len(string_split(text,' ')) >= 3
    ),
    s AS (
        SELECT doc_id, source,
           {sigs}
        FROM g
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST({matches} AS INT) AS est_matches,
           CAST({matches} AS DOUBLE) / {n_hash} AS est_jaccard
    FROM s a JOIN s b
      ON a.source = b.source AND a.doc_id < b.doc_id
     AND b.doc_id - a.doc_id <= 20
    WHERE {matches} >= 1
    """


@query(
    "llm_minhash_estimate",
    oracle=_minhash_estimate_oracle(),
    ref="SURVEY §2 K2 [EXT] (MinHash JACCARD ESTIMATOR: similarity "
    "estimated as the fraction of matching signature components — the "
    "production fast path that skips exact set intersection entirely; "
    "completes the portable MinHash story: banding candidates "
    "(llm_dedup_near_portable), exact verify (same), estimator (this))",
)
def llm_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimated Jaccard from 8 portable md5 min-signatures over blocked
    candidate pairs (same source, nearby ids — the llm_ngram_jaccard
    block): est = |matching components| / n_hash. E[est] = true Jaccard;
    at scale this replaces the exact intersection re-rank when +-1/8
    resolution suffices (standard MinHash estimator).

    Scale shape: signatures are one narrow per-doc pass (n_hash folds over
    the gram array); the pair join carries 8 fixed-width hex strings per
    side, never gram sets; the comparison is 8 equality checks per pair."""
    from pyspark.sql import functions as F

    from ksql_spark.operators import text as text_ops

    n_hash = 8
    d = load(spark, sf_dir, "documents")
    grams_col = F.array_distinct(text_ops.shingles("text", 3))
    def _sig(h: int):
        # NB: a `lambda x, h=h` would be a TWO-parameter lambda — PySpark
        # passes the array INDEX as the second argument, silently replacing
        # the intended "h:" prefix with a Column repr string. Capture the
        # prefix as a closure free variable instead.
        prefix = f"{h}:"
        return F.array_min(
            F.transform(
                F.col("grams"),
                lambda x: F.md5(F.concat(F.lit(prefix), x).cast("binary")),
            )
        ).alias(f"s{h}")

    sig_cols = [_sig(h) for h in range(n_hash)]
    # LAZY pin (r14, guide §1.2 step 1 — the r13 banded-table device,
    # already the posture in minhash_near_dups_portable): `s` feeds BOTH
    # sides of the blocked pair join below, and the subtrees differ (probe
    # explode vs bucket), so ReuseExchange never fires and the scan +
    # 3-gram shingle + 8 md5-per-gram signature pipeline ran TWICE per
    # execution. The pinned payload is (doc_id, source, 8 fixed hex
    # strings) — never the text or the gram arrays.
    from ksql_spark.operators.scale import pin as _pin

    s = _pin(
        d.where(F.size(text_ops.words("text")) >= 3)
        .select("doc_id", "source", grams_col.alias("grams"))
        .select("doc_id", "source", *sig_cols),
        eager=False,
    )
    # id-bucket fan-out on the equi-key (round-8 probe, bit-exact — the
    # llm_ngram_containment rationale): directional Δ<=20 pairs need only
    # {bucket, bucket+1} probes, bounding candidates to ~20/doc.
    bucket = F.floor(F.col("doc_id") / 20)
    a = s.withColumn("probe", F.explode(F.array(bucket, bucket + 1))).select(
        F.col("doc_id").alias("doc_a"), F.col("source").alias("src_a"),
        F.col("probe"),
        *[F.col(f"s{h}").alias(f"a{h}") for h in range(n_hash)],
    )
    b = s.withColumn("bucket", bucket).select(
        F.col("doc_id").alias("doc_b"), F.col("source").alias("src_b"),
        F.col("bucket"),
        *[F.col(f"s{h}").alias(f"b{h}") for h in range(n_hash)],
    )
    matches = sum(
        F.when(F.col(f"a{h}") == F.col(f"b{h}"), 1).otherwise(0)
        for h in range(n_hash)
    )
    return (
        a.join(
            b,
            (F.col("src_a") == F.col("src_b"))
            & (F.col("probe") == F.col("bucket"))
            & (F.col("doc_a") < F.col("doc_b"))
            & (F.col("doc_b") - F.col("doc_a") <= 20),
        )
        .select(
            "doc_a", "doc_b",
            matches.cast("int").alias("est_matches"),
            (matches.cast("double") / n_hash).alias("est_jaccard"),
        )
        .where(F.col("est_matches") >= 1)
    )


@query(
    "llm_gopher_rules",
    oracle="""
    WITH s AS (
        SELECT doc_id, string_split(text, ' ') AS w,
               len(string_split(text, ' ')) AS n_words
        FROM documents
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(list_sum(list_transform(w, x -> len(x))) AS DOUBLE) / n_words
               AS mean_word_len,
           CAST(len(list_filter(w,
                x -> x IN ('the','a','of','and','to','in','is'))) AS BIGINT)
               AS stop_hits,
           CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
                AS DOUBLE) / n_words AS alpha_ratio,
           n_words BETWEEN 40 AND 100000 AS ok_len,
           CAST(list_sum(list_transform(w, x -> len(x))) AS DOUBLE) / n_words
               BETWEEN 2.0 AND 12.0 AS ok_mean_len,
           len(list_filter(w,
               x -> x IN ('the','a','of','and','to','in','is'))) >= 2 AS ok_stop,
           CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
                AS DOUBLE) / n_words >= 0.8 AS ok_alpha,
           (n_words BETWEEN 40 AND 100000)
           AND (CAST(list_sum(list_transform(w, x -> len(x))) AS DOUBLE)
                / n_words BETWEEN 2.0 AND 12.0)
           AND (len(list_filter(w,
                x -> x IN ('the','a','of','and','to','in','is'))) >= 2)
           AND (CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
                AS DOUBLE) / n_words >= 0.8) AS keep
    FROM s
    """,
    ref="SURVEY §2 K44 [EXT] (Gopher-style quality rule set — Rae et al. "
    "2021 table A1 shape: word-count bounds, mean-word-length bounds, "
    "min stopword evidence, min alphabetic-word share, with per-rule "
    "booleans for filter auditability)",
)
def llm_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Gopher-style quality rules with auditable per-rule
    verdicts: a doc passes iff word count is in [40, 100000], mean word
    length in [2, 12], it contains >= 2 stopwords, and >= 80% of its words
    contain an alphabetic character. All integer counts and exact-operand
    IEEE divisions, so both engines agree bitwise.

    Scale shape: one narrow scan — every signal is a per-row HOF over the
    word array (no explode, no shuffle, no UDF). The keep decision is
    scan-bound at any corpus size; empty/NULL docs yield NULL signals and
    keep=false rather than an ANSI abort."""
    d = load(spark, sf_dir, "documents")
    w = text.words("text")
    n = F.size(w)
    sum_len = F.aggregate(
        F.transform(w, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    mean_len = F.when(n > 0, sum_len.cast("double") / n.cast("double"))
    stop_hits = F.size(F.filter(w, lambda x: x.isin(*text.STOPWORDS)))
    alpha_ratio = F.when(
        n > 0,
        F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]"))).cast("double")
        / n.cast("double"),
    )
    ok_len = n.between(40, 100000)
    ok_mean_len = mean_len.between(2.0, 12.0)
    ok_stop = stop_hits >= 2
    ok_alpha = alpha_ratio >= 0.8
    return d.select(
        "doc_id",
        n.cast("bigint").alias("n_words"),
        mean_len.alias("mean_word_len"),
        stop_hits.cast("bigint").alias("stop_hits"),
        alpha_ratio.alias("alpha_ratio"),
        ok_len.alias("ok_len"),
        ok_mean_len.alias("ok_mean_len"),
        ok_stop.alias("ok_stop"),
        ok_alpha.alias("ok_alpha"),
        F.coalesce(ok_len & ok_mean_len & ok_stop & ok_alpha, F.lit(False)).alias(
            "keep"
        ),
    )


@query(
    "llm_quality_calibrate",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, source, ({SQL_QUALITY}) AS quality FROM documents
    )
    SELECT doc_id, source, quality,
           percent_rank() OVER (PARTITION BY source ORDER BY quality, doc_id)
               AS source_pctl,
           percent_rank() OVER (PARTITION BY source ORDER BY quality, doc_id)
               >= 0.5 AS keep_top_half
    FROM scored
    """,
    ref="SURVEY §2 K45 [EXT] (source-calibrated quality percentile: a raw "
    "quality threshold over-prunes low-scoring domains; ranking WITHIN each "
    "source makes the cut source-fair — the percentile-calibration step "
    "quality-filter pipelines apply before mixing domains)",
)
def llm_quality_calibrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality percentile (percent_rank over each source
    partition, ties broken by doc_id) + a top-half keep flag. percent_rank
    is (rank-1)/(n-1) — exact integer operands, one IEEE division —
    so both engines agree bitwise.

    Scale shape: one shuffle on source, sequential rank scan per partition.
    A pathologically large single source makes that partition wide — the
    two-stage pattern of win_distribution_scaled (per-range ranks + offset
    broadcast) applies unchanged if a real corpus hits it."""
    d = load(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "source", text.quality_score("text").alias("quality")
    )
    wspec = SparkWindow.partitionBy("source").orderBy("quality", "doc_id")
    pr = F.percent_rank().over(wspec)
    return scored.select(
        "doc_id",
        "source",
        "quality",
        pr.alias("source_pctl"),
        (pr >= 0.5).alias("keep_top_half"),
    )


@query(
    "llm_dsir_weight",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
        FROM documents
    ),
    tgt AS (SELECT w, COUNT(*) AS t_n FROM toks WHERE source = 'src0' GROUP BY w),
    raw AS (SELECT w, COUNT(*) AS r_n FROM toks GROUP BY w),
    tot AS (
        SELECT (SELECT COUNT(*) FROM toks WHERE source = 'src0') AS t_tot,
               (SELECT COUNT(*) FROM toks) AS r_tot
    ),
    ratio AS (
        SELECT t.doc_id,
               CASE WHEN tot.t_tot > 0
                    THEN CAST(COALESCE(g.t_n, 0) * tot.r_tot AS DOUBLE)
                         / CAST(r.r_n * tot.t_tot AS DOUBLE)
                    ELSE 0.0 END AS ratio
        FROM toks t
        JOIN raw r USING (w)
        LEFT JOIN tgt g USING (w)
        CROSS JOIN tot
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
           {sql_davg('ratio')} AS importance
    FROM ratio GROUP BY doc_id
    """,
    ref="SURVEY §2 K46 [EXT] (DSIR-shaped importance weight — Xie et al. "
    "2023: per-doc mean target/raw unigram frequency ratio, the "
    "transcendental-free spelling of the log-likelihood-ratio importance "
    "score; at 100 TB the unigram would be Knuth-hashed into bounded "
    "feature buckets, same plan)",
)
def llm_dsir_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-Selection-via-Importance-Resampling weight: treating source
    'src0' as the high-quality target distribution, each doc scores the
    mean over its word occurrences of (target_freq * raw_total) /
    (raw_freq * target_total). >1 means the doc looks more target-like
    than the average corpus doc. Integer cross-multiplied frequencies
    (products < 2^53, exactly representable) and one IEEE division per
    word keep it bit-identical cross-engine; the quantized dsum makes the
    per-doc mean partition-order invariant.

    Scale shape: the two frequency tables are vocabulary-sized (bounded —
    at 100 TB DSIR hashes features into 2^20 buckets first, same plan) and
    BROADCAST onto the corpus token stream; the only wide exchange is the
    final doc_id re-agg, with map-side partial aggregation. The corpus
    never shuffles on the word."""
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", "source", F.explode(text.words("text")).alias("w"))
    tgt = (
        toks.where(F.col("source") == "src0")
        .groupBy("w")
        .agg(F.count("*").alias("t_n"))
    )
    raw = toks.groupBy("w").agg(F.count("*").alias("r_n"))
    tot = toks.agg(
        F.count("*").alias("r_tot"),
        F.count(F.when(F.col("source") == "src0", F.lit(1))).alias("t_tot"),
    )
    ratio_expr = (
        (F.coalesce(F.col("t_n"), F.lit(0)) * F.col("r_tot")).cast("double")
        / (F.col("r_n") * F.col("t_tot")).cast("double")
    )
    ratio = (
        toks.join(F.broadcast(raw), "w")
        .join(F.broadcast(tgt), "w", "left")
        .crossJoin(F.broadcast(tot))
        # t_tot = 0 (no target docs at all) is a degenerate corpus: the
        # ratio would be x/0.0 = Inf and the quantizing cast would abort
        # under ANSI — define the weight as 0.0 there instead.
        .select(
            "doc_id",
            F.when(F.col("t_tot") > 0, ratio_expr).otherwise(F.lit(0.0)).alias(
                "ratio"
            ),
        )
    )
    return ratio.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_words"),
        davg("ratio").alias("importance"),
    )


@query(
    "llm_train_eval_split",
    oracle="""
    WITH b AS (
        SELECT doc_id, source,
               (((doc_id % 2147483648) * 2654435761) % 4294967296) % 100 AS bucket
        FROM documents
    )
    SELECT source,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM b GROUP BY source, split
    """,
    ref="SURVEY §2 K52 [EXT] (deterministic 80/10/10 train/val/test split "
    "by Knuth-hash centile — content-stable across runs AND engines "
    "(re-crawls keep a doc in its split: no eval contamination from "
    "re-shuffling), audited per source so domain shift between splits "
    "is visible)",
)
def llm_train_eval_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-centile train/val/test assignment with per-(source, split)
    accounting. The split is a pure function of doc_id — re-running the
    pipeline (or running it in another engine) never migrates a document
    across the eval boundary, which is the property decontamination
    audits depend on.

    Scale shape: membership is a per-row expression on the narrow scan;
    the audit agg shuffles only (source, split) group rows. The split
    column itself costs nothing at 100 TB."""
    d = load(spark, sf_dir, "documents")
    bucket = (((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761)) % F.lit(4294967296)) % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        d.select("doc_id", "source", split.alias("split"))
        .groupBy("source", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
            F.max("doc_id").cast("bigint").alias("max_doc"),
        )
    )


@query(
    "llm_source_interleave",
    oracle="""
    WITH r AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY ((doc_id % 2147483648) * 2654435761) % 4294967296, doc_id
               ) - 1 AS rk,
               DENSE_RANK() OVER (ORDER BY source) - 1 AS src_idx,
               (SELECT COUNT(DISTINCT source) FROM documents) AS n_src
        FROM documents
    )
    SELECT doc_id, source,
           CAST(rk * n_src + src_idx AS BIGINT) AS interleave_pos
    FROM r
    """,
    ref="SURVEY §2 K53 [EXT] (training-order interleaving: stripe the "
    "sources round-robin so no gradient window sees one domain clumped "
    "— position = within-source rank x n_sources + source index, a "
    "closed-form global order with NO global sort)",
)
def llm_source_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic round-robin training order across sources: document
    k of source j lands at global position k*n_sources + j. Consecutive
    training positions cycle through all sources, so a data-loader
    reading in interleave_pos order never feeds the model a long
    single-domain run (the source-clumping failure mode of naive
    concatenation). Within each source, order is the usual Knuth-hash
    shuffle.

    Scale shape: the within-source rank partitions by source (parallel
    across domains; a pathologically dominant source takes the
    win_distribution_scaled two-stage form); the source index and count
    are a |domains|-row broadcast. The global order is COMPUTED, not
    sorted — no global exchange anywhere."""
    d = load(spark, sf_dir, "documents")
    hash_col = ((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761)) % F.lit(4294967296)
    w = SparkWindow.partitionBy("source").orderBy(hash_col.asc(), F.col("doc_id"))
    srcs = (
        d.select("source")
        .distinct()
        .select(
            "source",
            (F.dense_rank().over(SparkWindow.orderBy("source")) - 1).alias(
                "src_idx"
            ),
        )
    )
    # n_src stays a lazy 1-row broadcast — an eager .count() here would
    # launch a Spark job during PLAN CONSTRUCTION (dump_plans/test_plans
    # only want the plan)
    n_src = srcs.agg((F.max("src_idx") + 1).alias("n_src"))
    return (
        d.select("doc_id", "source")
        .withColumn("rk", F.row_number().over(w) - 1)
        .join(F.broadcast(srcs), "source")
        .crossJoin(F.broadcast(n_src))
        .select(
            "doc_id",
            "source",
            (F.col("rk") * F.col("n_src") + F.col("src_idx"))
            .cast("bigint")
            .alias("interleave_pos"),
        )
    )


@query(
    "llm_source_kl",
    oracle="""
    WITH cnt AS (
        SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT source, unnest(string_split(text, ' ')) AS w
              FROM documents)
        GROUP BY source, w
    ), tot AS (
        SELECT source, CAST(SUM(c) AS BIGINT) AS tot FROM cnt GROUP BY source
    ), vocab AS (SELECT DISTINCT w FROM cnt),
    vsize AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
    dense AS (
        SELECT t.source, vocab.w,
               (CAST(COALESCE(c.c, 0) + 1 AS DOUBLE))
                   / CAST(t.tot + vs.v AS DOUBLE) AS p
        FROM tot t
        CROSS JOIN vocab
        CROSS JOIN vsize vs
        LEFT JOIN cnt c ON c.source = t.source AND c.w = vocab.w
    )
    SELECT a.source AS source_p, b.source AS source_q,
           CAST(SUM(CAST(trunc(a.p * ln(a.p / b.p) * 100000000 + 0.5)
                    AS BIGINT)) AS DOUBLE) / 100000000.0 AS kl_nats
    FROM dense a JOIN dense b ON a.w = b.w AND a.source <> b.source
    GROUP BY source_p, source_q
    """,
    ref="SURVEY §2 K14/K40 family [EXT] (pairwise KL divergence between "
    "Laplace-smoothed source unigram distributions — the asymmetric "
    "domain-distance matrix behind mixing/reweighting decisions; "
    "complements llm_dsir_weight's importance ratios and "
    "llm_source_vocab_overlap's set overlap)",
)
def llm_source_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL(P_source || Q_source) in nats for every ordered source pair,
    over add-one-smoothed unigram distributions on the union vocabulary
    (smoothing keeps every q(w) > 0, so the divergence is finite and the
    sum ranges over the full vocabulary for both sides).

    Determinism: p and q are exact rationals evaluated identically in
    both engines ((c+1)/(tot+V) in IEEE double); each word's contribution
    p·ln(p/q) is quantized to 8 decimals (contributions are tiny — 1e-4
    scale — so the dsum discipline needs the finer grid; |sum| stays
    far inside the long range) and accumulated exactly in longs.

    Scale shape: the corpus collapses to (source, word) counts in ONE
    gram-keyed shuffle (the llm_dup_stats exchange); everything after is
    vocabulary-scale — the dense |S|xV probability matrix self-joins on
    the word, expanding each word only to its |S|² pair bucket, and the
    final agg is |S|² rows. V-proportional, never corpus-proportional;
    the vocab-bounded posture llm_vocab_topk documents."""
    d = load(spark, sf_dir, "documents")
    cnt = (
        d.select("source", F.explode(text.words("text")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").alias("c"))
    )
    tot = cnt.groupBy("source").agg(F.sum("c").alias("tot"))
    vocab = cnt.select("w").distinct()
    vsize = vocab.agg(F.count("*").alias("v"))
    dense = (
        tot.crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(vsize))
        .join(cnt, ["source", "w"], "left")
        .select(
            "source",
            "w",
            (
                (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double")
                / (F.col("tot") + F.col("v")).cast("double")
            ).alias("p"),
        )
    )
    a, b = dense.alias("a"), dense.alias("b")
    contrib = (
        F.col("a.p") * F.log(F.col("a.p") / F.col("b.p")) * 100000000.0
        + 0.5
    ).cast("long")
    return (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.source") != F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_p"),
            F.col("b.source").alias("source_q"),
        )
        .agg(
            (F.sum(contrib).cast("double") / 100000000.0).alias("kl_nats")
        )
    )


@query(
    "llm_zipf_slope",
    oracle="""
    WITH cnt AS (
        SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT source, unnest(string_split(text, ' ')) AS w
              FROM documents)
        GROUP BY source, w
    ), ranked AS (
        SELECT source, c,
               row_number() OVER (PARTITION BY source
                                  ORDER BY c DESC, w) AS rnk
        FROM cnt
    ), q AS (
        SELECT source,
               CAST(CAST(trunc(ln(rnk) * 1000000 + 0.5) AS BIGINT) AS DOUBLE)
                   / 1000000.0 AS x,
               CAST(CAST(trunc(ln(c)   * 1000000 + 0.5) AS BIGINT) AS DOUBLE)
                   / 1000000.0 AS y
        FROM ranked
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(CAST(trunc(
               (COUNT(*) * (CAST(SUM(CAST(trunc(x * y * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0)
                - (CAST(SUM(CAST(trunc(x * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0)
                  * (CAST(SUM(CAST(trunc(y * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0))
               / (COUNT(*) * (CAST(SUM(CAST(trunc(x * x * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0)
                  - (CAST(SUM(CAST(trunc(x * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0)
                    * (CAST(SUM(CAST(trunc(x * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0))
               * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0 AS zipf_slope
    FROM q GROUP BY source
    """,
    ref="SURVEY §2 K4 family [EXT] (Zipf's-law slope per source: OLS fit of "
    "ln(freq) on ln(rank) over the source's frequency-ranked vocabulary — "
    "the distributional-health screen that flags template/boilerplate "
    "sources (slope near 0) and artificially truncated vocabularies "
    "(slope << -1) before mixing)",
)
def llm_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares slope of ln(freq) vs ln(rank) per source — natural
    corpora track Zipf's law with slope ~ -1.

    Determinism: x = ln(rank) and y = ln(freq) are quantized to the 1e6
    grid FIRST (identical in both engines), then every moment sum
    accumulates trunc-quantized products exactly in longs, and the final
    slope quantizes to 6 decimals — the agg_corr discipline, applied to
    OLS. Rank ties break on the word, so the ranking is total.

    Scale shape: one gram-keyed shuffle to (source, word) counts, a
    VOCAB-bounded per-source window for the ranks (llm_vocab_topk's
    posture: |S| partitions of |V_s| rows, never corpus rows), and a
    |S|-group moment agg. Nothing after the first agg touches corpus
    scale."""
    d = load(spark, sf_dir, "documents")
    cnt = (
        d.select("source", F.explode(text.words("text")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").alias("c"))
    )
    rw = SparkWindow.partitionBy("source").orderBy(
        F.col("c").desc(), F.col("w")
    )
    ranked = cnt.withColumn("rnk", F.row_number().over(rw))

    def q6(col):
        return (col * 1000000.0 + 0.5).cast("long").cast("double") / 1000000.0

    qd = ranked.select(
        "source",
        q6(F.log(F.col("rnk").cast("double"))).alias("x"),
        q6(F.log(F.col("c").cast("double"))).alias("y"),
    )
    n = F.count("*")

    def s6(col):
        return F.sum((col * 1000000.0 + 0.5).cast("long")).cast("double") / 1000000.0

    sx, sy = s6(F.col("x")), s6(F.col("y"))
    sxx, sxy = s6(F.col("x") * F.col("x")), s6(F.col("x") * F.col("y"))
    slope = F.try_divide(n * sxy - sx * sy, n * sxx - sx * sx)
    return qd.groupBy("source").agg(
        n.cast("bigint").alias("n_words"),
        q6(slope).alias("zipf_slope"),
    )


_PQ_M, _PQ_SUB, _PQ_KP, _PQ_TOPK = 8, 8, 16, 5


def _pq_portable_oracle() -> str:
    l2 = _SQL_L2SQ.format(a="s.sub", b="c.cent_sub")
    l2q = _SQL_L2SQ.format(a="q.sub", b="c.cent_sub")
    return f"""
    WITH cents AS (
        SELECT vec_id AS code_id, embedding FROM embeddings
        ORDER BY ((vec_id % 2147483648) * 2654435761) % 4294967296, vec_id
        LIMIT {_PQ_KP}
    ), csubs AS (
        SELECT r.m, code_id,
               embedding[r.m * {_PQ_SUB} + 1 : (r.m + 1) * {_PQ_SUB}]
                   AS cent_sub
        FROM cents, unnest(range(0, {_PQ_M})) AS r(m)
    ), subs AS (
        SELECT vec_id, r.m,
               embedding[r.m * {_PQ_SUB} + 1 : (r.m + 1) * {_PQ_SUB}] AS sub
        FROM embeddings, unnest(range(0, {_PQ_M})) AS r(m)
    ), codes AS (
        SELECT vec_id, m, code_id FROM (
            SELECT s.vec_id, s.m, c.code_id,
                   ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                                      ORDER BY {l2}, c.code_id) AS rn
            FROM subs s JOIN csubs c USING (m)
        ) WHERE rn = 1
    ), lut AS (
        SELECT q.vec_id AS query_id, q.m, c.code_id,
               CAST(trunc({l2q} * 1000000 + 0.5) AS BIGINT) AS pd_q6
        FROM subs q JOIN csubs c USING (m)
        WHERE q.vec_id < 3
    )
    SELECT query_id, vec_id,
           CAST(approx_q6 AS DOUBLE) / 1000000.0 AS approx_d,
           CAST(rnk AS INT) AS rank
    FROM (
        SELECT l.query_id, k.vec_id,
               SUM(l.pd_q6) AS approx_q6,
               ROW_NUMBER() OVER (
                   PARTITION BY l.query_id
                   ORDER BY SUM(l.pd_q6), k.vec_id) AS rnk
        FROM codes k
        JOIN lut l ON l.m = k.m AND l.code_id = k.code_id
        WHERE l.query_id <> k.vec_id
        GROUP BY l.query_id, k.vec_id
    ) WHERE rnk <= {_PQ_TOPK}
    """


@query(
    "ann_pq_topk_portable",
    oracle=_pq_portable_oracle(),
    ref="SURVEY §2 K3 [EXT] (ENGINE-PORTABLE product quantization: "
    "per-subspace codebooks are the sub-slices of 16 hash-selected corpus "
    "vectors (random-sample quantizer, no KMeans), exact-L2 encoding, "
    "quantized asymmetric-distance lookup — the complete PQ ADC search "
    "ORACLE-EXACT, closing the last ANN strategy without a cross-engine "
    "check; the KMeans-fitted ann_pq_topk stays the production path)",
)
def ann_pq_topk_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ approximate top-5, fully deterministic: M=8 subspaces x 8 dims,
    per-subspace K'=16 codebook = sub-slices of the 16 smallest-Knuth-hash
    corpus vectors; encode by exact squared-L2 argmin (code_id tiebreak);
    rank by ADC = sum over subspaces of the query's distance to the
    assigned centroid. Per-cell LUT distances quantize to 1e-6 longs
    BEFORE the sum, so the ADC total and the ranking are exact integers —
    partition-order- and engine-independent.

    Scale shape: identical to ann_pq_topk — the codebook is O(M*K'*SUB)
    broadcast, encoding is one narrow O(n*M*K') pass, the corpus side of
    the ranking join carries only (vec_id, m, code_id) rows (the 16x
    memory compression that makes 100 TB ANN feasible), and the LUT
    (|queries|*M*K' rows) broadcasts. No corpus-corpus join anywhere."""
    from pyspark.sql import Window

    from ksql_spark.operators import vectors

    e = load(spark, sf_dir, "embeddings")
    u = ((F.col("vec_id") % F.lit(2147483648)) * F.lit(2654435761).cast("long")) % F.lit(4294967296)
    cents = (
        e.orderBy(u, "vec_id")
        .limit(_PQ_KP)
        .select(F.col("vec_id").alias("code_id"), F.col("embedding").alias("c_emb"))
    )
    ms = F.explode(F.sequence(F.lit(0), F.lit(_PQ_M - 1))).alias("m")
    csubs = cents.select("code_id", "c_emb", ms).select(
        "m",
        "code_id",
        F.slice(F.col("c_emb"), F.col("m") * _PQ_SUB + 1, _PQ_SUB).alias("cent_sub"),
    )
    subs = e.select("vec_id", "embedding", ms).select(
        "vec_id",
        "m",
        F.slice(F.col("embedding"), F.col("m") * _PQ_SUB + 1, _PQ_SUB).alias("sub"),
    )
    d = vectors.l2_sq_dist("sub", "cent_sub")
    enc_w = Window.partitionBy("vec_id", "m").orderBy(F.col("d").asc(), F.col("code_id"))
    codes = (
        subs.join(F.broadcast(csubs), "m")
        .select("vec_id", "m", "code_id", d.alias("d"))
        .withColumn("rn", F.row_number().over(enc_w))
        .where(F.col("rn") == 1)
        .select("vec_id", "m", "code_id")
    )
    lut = (
        subs.where(F.col("vec_id") < 3)
        .select(F.col("vec_id").alias("query_id"), "m", F.col("sub").alias("q_sub"))
        .join(F.broadcast(csubs.withColumnRenamed("cent_sub", "c_sub")), "m")
        .select(
            "query_id",
            "m",
            "code_id",
            (vectors.l2_sq_dist("q_sub", "c_sub") * 1000000 + 0.5)
            .cast("bigint")
            .alias("pd_q6"),
        )
    )
    rank_w = Window.partitionBy("query_id").orderBy(
        F.col("approx_q6").asc(), F.col("vec_id")
    )
    return (
        codes.join(F.broadcast(lut), ["m", "code_id"])
        .where(F.col("query_id") != F.col("vec_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("pd_q6").alias("approx_q6"))
        .withColumn("rank", F.row_number().over(rank_w))
        .where(F.col("rank") <= _PQ_TOPK)
        .select(
            "query_id",
            "vec_id",
            (F.col("approx_q6").cast("double") / 1000000.0).alias("approx_d"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


@query(
    "llm_quality_roc_auc",
    oracle=f"""
    WITH scored AS (
        SELECT CAST(trunc(({SQL_QUALITY}) * 1000000 + 0.5) AS BIGINT) AS sq,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        FROM documents
    ), by_s AS (
        SELECT sq, CAST(SUM(pos) AS BIGINT) AS np_s,
               CAST(SUM(1 - pos) AS BIGINT) AS nn_s
        FROM scored GROUP BY sq
    ), cum AS (
        SELECT sq, np_s, nn_s,
               CAST(SUM(nn_s) OVER (ORDER BY sq
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - nn_s AS BIGINT) AS nn_below
        FROM by_s
    )
    SELECT CAST(SUM(np_s) AS BIGINT) AS n_pos,
           CAST(SUM(nn_s) AS BIGINT) AS n_neg,
           CAST(trunc(SUM(np_s * (nn_below + nn_s / 2.0))
                      / NULLIF(CAST(SUM(np_s) AS DOUBLE) * SUM(nn_s), 0)
                      * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS auc
    FROM cum
    """,
    ref="SURVEY §2 K97 [EXT] (ROC-AUC of the K4 quality score against the "
    "lang='en' pseudo-label via the Mann-Whitney U rank-sum identity "
    "AUC = U/(n_pos*n_neg) with the standard half-credit tie correction "
    "— the one-number answer to 'does the quality classifier actually "
    "separate the corpus?', the threshold-free complement of K45's "
    "calibration table)",
)
def llm_quality_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row classifier evaluation: AUC of the quality score for
    discriminating English documents, computed from the rank-sum
    identity — for each distinct (1e-6-quantized) score, positives at
    that score earn one credit per negative BELOW it plus half per
    negative TIED with it; AUC = total credit / (n_pos · n_neg).
    Degenerate corpora (no positives or no negatives) yield NULL.

    Scale shape: the corpus collapses to ≤1e6+1 rows at the score-value
    agg (map-side combined — the quantization bounds the domain
    regardless of corpus size); the exclusive running negative count
    rides the operators/scale.py ranged_cumsum decomposition (no
    single-partition window), then one 1-row reduction. Credits are
    exact multiples of 0.5 well inside 2^52, so the double sum is
    bit-identical cross-engine."""
    from ksql_spark.operators.scale import ranged_cumsum
    from ksql_spark.operators import text

    d = load(spark, sf_dir, "documents")
    scored = d.select(
        (text.quality_score("text") * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("sq"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    by_s = scored.groupBy("sq").agg(
        F.sum("pos").alias("np_s"),
        F.sum(1 - F.col("pos")).alias("nn_s"),
    )
    cum = ranged_cumsum(by_s, ["sq"], "nn_s", "nn_incl").withColumn(
        "nn_below", F.col("nn_incl") - F.col("nn_s")
    )
    u = F.sum(
        F.col("np_s") * (F.col("nn_below") + F.col("nn_s") / F.lit(2.0))
    )
    denom = F.sum("np_s").cast("double") * F.sum("nn_s")
    return cum.agg(
        F.sum("np_s").alias("n_pos"),
        F.sum("nn_s").alias("n_neg"),
        (
            (
                F.try_divide(u, F.when(denom != 0, denom)) * 1000000
                + F.lit(0.5)
            )
            .cast("long")
            .cast("double")
            / 1000000.0
        ).alias("auc"),
    )


_BLOCKLIST = ("slow", "dup", "stale")


@query(
    "llm_blocklist_filter",
    oracle=f"""
    WITH hits AS (
        SELECT doc_id, source,
               CAST(len(list_filter(string_split(text, ' '),
                        x -> x IN {str(tuple(_BLOCKLIST))})) AS BIGINT)
                   AS blocked_hits,
               CAST(len(list_filter(list_distinct(string_split(text, ' ')),
                        x -> x IN {str(tuple(_BLOCKLIST))})) AS BIGINT)
                   AS distinct_blocked_terms
        FROM documents
    )
    SELECT doc_id, source, blocked_hits, distinct_blocked_terms
    FROM hits WHERE blocked_hits > 0
    """,
    ref="SURVEY §2 K98 [EXT] (blocklist / unsafe-term filter: per-doc hit "
    "count and distinct-term count against a broadcast denylist, "
    "emitting only flagged docs — the safety-filter stage every "
    "production corpus pipeline runs between K8 PII scrubbing and K12 "
    "corpus filtering; absent terms cost nothing, the list is a "
    "plan-time literal)",
)
def llm_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents containing any blocklisted term, with total occurrence
    count and distinct-term count — the audit table a safety review
    reads (high distinct_blocked_terms = systematic, high hits with one
    term = topical). The blocklist is a literal array folded into the
    row expression; real deployments broadcast a few-MB list the same
    way (or join a bloom filter for multi-GB lists — K48 machinery).

    Scale shape: one narrow whole-stage-codegen pass over (doc_id,
    source, text); the filter drops clean docs before anything
    shuffles. No joins, no windows, no UDFs."""
    from ksql_spark.operators.text import words

    d = load(spark, sf_dir, "documents")
    w = words("text")
    bl = list(_BLOCKLIST)
    out = d.select(
        "doc_id",
        "source",
        F.size(F.filter(w, lambda x: x.isin(*bl))).cast("long").alias(
            "blocked_hits"
        ),
        F.size(
            F.filter(F.array_distinct(w), lambda x: x.isin(*bl))
        ).cast("long").alias("distinct_blocked_terms"),
    )
    return out.where(F.col("blocked_hits") > 0)


@query(
    "llm_source_diversity",
    oracle="""
    WITH s AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS c
        FROM documents GROUP BY source
    ), t AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM s)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
           MAX(t.n) AS n_docs,
           CAST(SUM(CAST(trunc(
               -(CAST(c AS DOUBLE) / t.n) * ln(CAST(c AS DOUBLE) / t.n)
               * 1000000000 + 0.5) AS BIGINT)) AS BIGINT) / 1000000000.0
               AS shannon_nats,
           CAST(trunc(CAST(SUM(c * c) AS DOUBLE)
                      / (CAST(MAX(t.n) AS DOUBLE) * MAX(t.n))
                      * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS simpson,
           CAST(trunc((CAST(MAX(t.n) AS DOUBLE) * MAX(t.n))
                      / CAST(SUM(c * c) AS DOUBLE)
                      * 1000000 + 0.5) AS BIGINT) / 1000000.0
               AS effective_sources
    FROM s, t
    """,
    ref="SURVEY §2 K105 [EXT] (corpus-mix diversity indices: Shannon "
    "entropy, Simpson concentration Σp², and the effective source "
    "count 1/Σp² over the source proportions — the one-row mix-health "
    "monitor read alongside K14 domain-mix planning: effective_sources "
    "collapsing toward 1 is the early warning that one crawl dominates "
    "the corpus)",
)
def llm_source_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus mix report: source count, document count, Shannon
    entropy (nats, 1e-9-quantized terms summed exactly — the K85
    idiom), Simpson concentration from EXACT integer Σc² (no float
    proportions until the single final division), and the effective
    number of equally-weighted sources. 'Ten sources, 1.3 effective' is
    the shape the domain-mix rebalancer exists to fix.

    Scale shape: one source hash agg (map-side combined, |sources|
    rows), a 1-row total, a |sources|-row final reduction. Σc² stays in
    bigint — exact to ~3e9 docs per source; the decimal(38) swap is the
    documented headroom past that."""
    d = load(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(F.count("*").alias("c"))
    t = s.agg(F.sum("c").alias("n"))
    j = s.crossJoin(F.broadcast(t))
    p = F.col("c").cast("double") / F.col("n")
    term = (-p * F.log(p) * 1000000000 + F.lit(0.5)).cast("long")
    q6 = lambda c: (c * 1000000 + F.lit(0.5)).cast("long").cast(
        "double"
    ) / 1000000.0
    agg = j.agg(
        F.count("*").alias("n_sources"),
        F.max("n").alias("n_docs"),
        (F.sum(term).cast("double") / 1000000000.0).alias("sh"),
        F.sum(F.col("c") * F.col("c")).alias("c2"),
    )
    nn = F.col("n_docs").cast("double") * F.col("n_docs")
    return agg.select(
        "n_sources",
        "n_docs",
        (
            (F.col("sh") * 1000000000 + F.lit(0.5)).cast("long")
            .cast("double") / 1000000000.0
        ).alias("shannon_nats"),
        q6(F.col("c2").cast("double") / nn).alias("simpson"),
        q6(nn / F.col("c2").cast("double")).alias("effective_sources"),
    )


@query(
    "llm_quality_reliability_bins",
    oracle=f"""
    WITH scored AS (
        SELECT ({SQL_QUALITY}) AS s,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        FROM documents
        WHERE text IS NOT NULL
    ), binned AS (
        SELECT CAST(least(9, CAST(trunc(s * 10) AS INT)) AS INT) AS bin,
               s, pos
        FROM scored
    )
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(trunc(CAST(SUM(CAST(trunc(s * 1000000 + 0.5) AS BIGINT))
                    AS DOUBLE) / 1000000.0 / COUNT(*)
                * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS avg_score,
           CAST(trunc(CAST(SUM(pos) AS DOUBLE) / COUNT(*)
                * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS pos_rate,
           CAST(trunc(abs(CAST(SUM(CAST(trunc(s * 1000000 + 0.5) AS BIGINT))
                        AS DOUBLE) / 1000000.0 / COUNT(*)
                    - CAST(SUM(pos) AS DOUBLE) / COUNT(*))
                * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS abs_gap
    FROM binned GROUP BY bin
    """,
    ref="SURVEY §2 K119 [EXT] (reliability diagram / calibration bins: "
    "quality-score deciles vs observed lang='en' rate — the per-bin "
    "table whose n-weighted abs_gap sum IS the expected calibration "
    "error (ECE); the calibration companion to K97's ROC-AUC "
    "(discrimination) and K67's per-source uniform recalibration)",
)
def llm_quality_reliability_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is the quality score calibrated as a probability of the en
    pseudo-label: per score-decile bin, count, mean score (quantized
    exact mean), observed positive rate, and |mean score − rate| — the
    reliability-diagram table; Σ (n_b/n)·abs_gap = ECE. Scores
    quantize at 1e-6 before the bin mean so the accumulation is exact.

    Scale shape: one narrow HOF scan -> 10-group agg, map-side
    combined. Nothing after the scan exceeds 10 rows.

    NULL-text docs are excluded (same guard + rationale as
    llm_isotonic_calibration, ADVICE r11: engines bin NULL scores
    divergently)."""
    d = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    sq = (text.quality_score("text") * 1000000 + F.lit(0.5)).cast("long")
    binned = d.select(
        F.least(
            F.lit(9),
            (text.quality_score("text") * 10).cast("int"),
        ).alias("bin"),
        sq.alias("sq"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    q6 = lambda c: (c * 1000000 + F.lit(0.5)).cast("long").cast(
        "double"
    ) / 1000000.0
    avg_s = F.sum("sq").cast("double") / 1000000.0 / F.count("*")
    rate = F.sum("pos").cast("double") / F.count("*")
    return binned.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n"),
        q6(avg_s).alias("avg_score"),
        q6(rate).alias("pos_rate"),
        q6(F.abs(avg_s - rate)).alias("abs_gap"),
    )


@query(
    "llm_quality_pr_curve",
    oracle=f"""
    WITH scored AS (
        SELECT ({SQL_QUALITY}) AS s,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        FROM documents
    ), thresholds AS (
        SELECT CAST(unnest([0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7,
                           0.8, 0.9]) AS DOUBLE) AS t
    )
    SELECT t,
           CAST(SUM(CASE WHEN s >= t THEN pos ELSE 0 END) AS BIGINT) AS tp,
           CAST(SUM(CASE WHEN s >= t THEN 1 - pos ELSE 0 END) AS BIGINT) AS fp,
           CAST(SUM(CASE WHEN s < t THEN pos ELSE 0 END) AS BIGINT) AS fn,
           CAST(trunc(CAST(SUM(CASE WHEN s >= t THEN pos ELSE 0 END) AS DOUBLE)
                / NULLIF(SUM(CASE WHEN s >= t THEN 1 ELSE 0 END), 0)
                * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS precision_at_t,
           CAST(trunc(CAST(SUM(CASE WHEN s >= t THEN pos ELSE 0 END) AS DOUBLE)
                / NULLIF(SUM(pos), 0)
                * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS recall_at_t
    FROM scored CROSS JOIN thresholds
    GROUP BY t
    """,
    ref="SURVEY §2 K120 [EXT] (precision/recall curve points: quality-"
    "score threshold sweep against the en pseudo-label at nine "
    "operating points — the table that picks a FILTERING threshold "
    "(K12's corpus filter) by its precision/recall trade, where K97's "
    "AUC only ranks; the K114 cutoff-parameterization trick keeps it "
    "rank-free)",
)
def llm_quality_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision and recall of 'keep documents with quality >= t' as a
    detector of the en pseudo-label, at t = 0.1..0.9. Exact integer
    confusion counts per threshold via a broadcast threshold table
    (the rank-free K114 shape); empty predicate sets yield NULL
    precision honestly.

    Scale shape: one narrow scan cross-joined with 9 broadcast
    thresholds -> 9-group agg with map-side combine."""
    d = load(spark, sf_dir, "documents")
    scored = d.select(
        text.quality_score("text").alias("s"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )
    ts = d.sparkSession.createDataFrame(
        [(t / 10.0,) for t in range(1, 10)], "t double"
    )
    ge = F.col("s") >= F.col("t")
    tp = F.sum(F.when(ge, F.col("pos")).otherwise(0)).cast("bigint")
    fp = F.sum(F.when(ge, 1 - F.col("pos")).otherwise(0)).cast("bigint")
    fn = F.sum(F.when(~ge, F.col("pos")).otherwise(0)).cast("bigint")
    kept = F.sum(F.when(ge, 1).otherwise(0))
    q6 = lambda c: (c * 1000000 + F.lit(0.5)).cast("long").cast(
        "double"
    ) / 1000000.0
    return scored.crossJoin(F.broadcast(ts)).groupBy("t").agg(
        tp.alias("tp"),
        fp.alias("fp"),
        fn.alias("fn"),
        q6(
            tp.cast("double") / F.nullif(kept, F.lit(0))
        ).alias("precision_at_t"),
        q6(
            tp.cast("double") / F.nullif(F.sum("pos"), F.lit(0))
        ).alias("recall_at_t"),
    )


@query(
    "llm_shard_write_audit",
    oracle="""
    SELECT CAST(((doc_id % 2147483648) * 2654435761) % 4294967296 % 16
                AS BIGINT) AS shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1
    """,
    ref="SURVEY §2 K18 [EXT] (the WRITE side of llm_shard_assign: "
    "operators/layout.py write_sharded materializes the 16-shard hive "
    "partitionBy layout, and this entry re-aggregates the WRITTEN files — "
    "oracle-exact iff the physical layout matches the audited hash "
    "assignment byte-for-byte; directory structure, balance, and pruned "
    "readback are gated in tests/test_layout.py)",
)
def llm_shard_write_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the corpus as the 16-shard training layout and audit the files
    on disk: read back the hive-partitioned directories and re-compute the
    per-shard accounting from what was actually written.

    Scale shape: the write is one shuffle keyed on shard_id; the audit is a
    16-row aggregate over the readback scan (shard_id comes from directory
    names — partition pruning metadata, not data)."""
    import hashlib
    import os
    import tempfile

    from ksql_spark.operators.layout import write_sharded

    d = load(spark, sf_dir, "documents")
    # stable per-input scratch dir: repeated sweeps overwrite in place
    # instead of accumulating mkdtemp dirs (single-writer driver contract)
    tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:12]
    out = os.path.join(tempfile.gettempdir(), f"ksql_shard_audit_{tag}")
    write_sharded(d, out, key_col="doc_id", n_shards=16)
    back = spark.read.parquet(out)
    return (
        back.groupBy(F.col("shard_id").cast("bigint").alias("shard_id"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


_SWEEP_THRESHOLDS = (0.5, 0.6, 0.7, 0.8, 0.9)


@query(
    "llm_dedup_threshold_sweep",
    oracle=f"""
    WITH pairs AS ({_minhash_portable_oracle()}),
    ladder AS (
        SELECT CAST(unnest(ARRAY{list(_SWEEP_THRESHOLDS)}) AS DOUBLE) AS t
    ),
    hits AS (
        SELECT l.t, p.doc_a, p.doc_b
        FROM ladder l JOIN pairs p ON p.jaccard >= l.t
    ),
    docs AS (
        SELECT t, doc_a AS d FROM hits UNION SELECT t, doc_b FROM hits
    ),
    nd AS (
        SELECT t, CAST(COUNT(DISTINCT d) AS BIGINT) AS n_docs_in_pairs
        FROM docs GROUP BY t
    ),
    np AS (
        SELECT t, CAST(COUNT(*) AS BIGINT) AS n_pairs FROM hits GROUP BY t
    ),
    corpus AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_corpus FROM documents)
    SELECT l.t AS threshold,
           COALESCE(np.n_pairs, 0) AS n_pairs,
           COALESCE(nd.n_docs_in_pairs, 0) AS n_docs_in_pairs,
           c.n_corpus,
           CAST(trunc((COALESCE(nd.n_docs_in_pairs, 0) * 1.0
                       / NULLIF(c.n_corpus, 0)) * 1000000 + 0.5) AS BIGINT)
               / 1000000.0 AS touched_share
    FROM ladder l
    LEFT JOIN np ON np.t = l.t
    LEFT JOIN nd ON nd.t = l.t
    CROSS JOIN corpus c
    """,
    ref="SURVEY §2 K145 [EXT] (dedup threshold sensitivity: the verified "
    "portable-LSH pair set swept across jaccard cutoffs 0.5-0.9 in one "
    "pass — per threshold the surviving pair count, the documents touched "
    "by any pair (the upper bound on near-dup removals), and the touched "
    "share of the corpus; the 'pick the threshold' curve every dedup "
    "rollout reads before committing — parameterized like K47's cutoff "
    "sweep, thresholds cost arithmetic, not re-runs)",
)
def llm_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How threshold-sensitive is near-dedup on this corpus? One verified
    pair pipeline (the oracle-exact portable LSH at base cutoff 0.5),
    then every stricter threshold evaluated by filtering — per cutoff:
    surviving pairs, documents touched by at least one pair (the removal
    upper bound: actual drops need the cluster step, which keeps one doc
    per component), and the touched corpus share. A cliff between two
    thresholds means the corpus has a near-dup band right there — the
    rollout decision this curve exists to inform.

    Scale shape: the pair set is computed ONCE (sub-quadratic banded
    LSH); the ladder is a 5-row broadcast joined onto pairs, so extra
    thresholds cost conditional counting only. The distinct-doc count per
    threshold shuffles pair-sized rows — bounded by the verified pair
    set, never the corpus."""
    d = load(spark, sf_dir, "documents")
    pairs = pin(llm_dedup_near_portable(spark, sf_dir), eager=False)
    ladder = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(t).cast("double") for t in _SWEEP_THRESHOLDS])
        ).alias("t")
    )
    hits = pin(
        ladder.join(pairs, pairs.jaccard >= ladder.t).select(
            "t", "doc_a", "doc_b"
        ),
        eager=False,
    )
    np_ = hits.groupBy("t").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )
    docs = hits.select("t", F.col("doc_a").alias("d")).unionByName(
        hits.select("t", F.col("doc_b").alias("d"))
    ).distinct()
    nd = docs.groupBy("t").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs_in_pairs")
    )
    corpus = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_corpus"))
    return (
        ladder.join(np_, "t", "left")
        .join(nd, "t", "left")
        .crossJoin(F.broadcast(corpus))
        .select(
            F.col("t").alias("threshold"),
            F.coalesce("n_pairs", F.lit(0).cast("bigint")).alias("n_pairs"),
            F.coalesce("n_docs_in_pairs", F.lit(0).cast("bigint")).alias(
                "n_docs_in_pairs"
            ),
            "n_corpus",
            (
                (
                    F.coalesce("n_docs_in_pairs", F.lit(0).cast("bigint"))
                    * F.lit(1.0)
                    / F.nullif(F.col("n_corpus").cast("double"), F.lit(0.0))
                    * F.lit(1000000.0)
                    + F.lit(0.5)
                ).cast("long")
                / F.lit(1000000.0)
            ).alias("touched_share"),
        )
    )


# ---------------------------------------------------------------------------
# K149 — DPO preference-pair construction (round 11)
# ---------------------------------------------------------------------------


@query(
    "llm_preference_pairs",
    oracle=f"""
    WITH cents AS (
        SELECT vec_id AS cent_id, embedding AS cent_emb
        FROM embeddings WHERE vec_id < 4
    ),
    assigned AS (
        SELECT vec_id, cent_id FROM (
            SELECT e.vec_id, c.cent_id,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_reduce(
                           list_prepend(CAST(0.0 AS DOUBLE),
                               list_transform(range(1, len(e.embedding) + 1),
                                   i -> (CAST(e.embedding[i] AS DOUBLE)
                                         - CAST(c.cent_emb[i] AS DOUBLE))
                                        * (CAST(e.embedding[i] AS DOUBLE)
                                           - CAST(c.cent_emb[i] AS DOUBLE)))),
                           (acc, p) -> acc + p) ASC, c.cent_id) AS rn
            FROM embeddings e CROSS JOIN cents c
        ) WHERE rn = 1
    ),
    scored AS (
        SELECT a.cent_id, d.lang, d.doc_id,
               CAST(trunc(({SQL_QUALITY}) * 1000000 + 0.5) AS BIGINT) AS q_q
        FROM documents d JOIN assigned a ON d.doc_id = a.vec_id
        WHERE d.text IS NOT NULL AND d.lang IS NOT NULL
    ),
    pairs AS (
        SELECT cent_id, lang,
               CAST(COUNT(*) AS BIGINT) AS n_group,
               max({{'q': q_q, 'nd': -doc_id}}) AS ch,
               min({{'q': q_q, 'nd': -doc_id}}) AS rj
        FROM scored GROUP BY cent_id, lang
        HAVING COUNT(*) >= 2
    )
    SELECT cent_id, lang, n_group,
           CAST(-ch['nd'] AS BIGINT) AS chosen_doc,
           CAST(-rj['nd'] AS BIGINT) AS rejected_doc,
           CAST(ch['q'] AS DOUBLE) / 1000000.0 AS q_chosen,
           CAST(rj['q'] AS DOUBLE) / 1000000.0 AS q_rejected,
           CAST(ch['q'] - rj['q'] AS DOUBLE) / 1000000.0 AS margin
    FROM pairs WHERE ch['q'] > rj['q']
    """,
    ref="SURVEY §2 K149 [EXT] (DPO/RLHF preference-pair construction "
    "(Rafailov et al. 2023; RLHF data prep per Ouyang et al. 2022): "
    "within each (embedding cluster, lang) prompt-proxy group, chosen = "
    "highest-quality doc, rejected = lowest, margin = quality gap — the "
    "terminal data-prep step that turns a scored corpus into the "
    "(chosen, rejected) pairs preference optimization consumes; K135's "
    "Bradley-Terry RANKS sources from duels, this EMITS the duels)",
)
def llm_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(chosen, rejected) preference pairs per (K19 fixed-centroid cluster,
    lang) group: highest vs lowest K4-quality document, deterministic
    ties (chosen breaks to the LOWEST doc_id, rejected to the HIGHEST —
    the argmax/argmin struct device), zero-margin groups emit nothing
    (a DPO pair with equal rewards is gradient-free noise).

    Scale shape: the cluster assignment is the shared O(n·K) broadcast-
    centroid pass (_assign_fixed_centroids); quality is one narrow HOF
    scan; the group stage is ONE hash agg carrying two 16-byte structs
    per group — never a rank window over the corpus, so a billion-doc
    group costs the same exchange as a ten-doc one.

    Determinism: quality quantizes to a scaled long BEFORE the argmax
    structs, so cross-engine tie-breaks compare exact integers."""
    from ksql_spark.queries.llm import _assign_fixed_centroids

    d = load(spark, sf_dir, "documents").where(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    e = load(spark, sf_dir, "embeddings")
    assigned = _assign_fixed_centroids(e).select("vec_id", "cent_id")
    q_q = (
        text.quality_score("text") * F.lit(1_000_000.0) + F.lit(0.5)
    ).cast("long")
    scored = d.join(assigned, d["doc_id"] == assigned["vec_id"]).select(
        "cent_id", "lang", "doc_id", q_q.alias("q_q")
    )
    pairs = (
        scored.groupBy("cent_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_group"),
            F.max(
                F.struct(F.col("q_q").alias("q"), (-F.col("doc_id")).alias("nd"))
            ).alias("ch"),
            F.min(
                F.struct(F.col("q_q").alias("q"), (-F.col("doc_id")).alias("nd"))
            ).alias("rj"),
        )
        .where(F.col("n_group") >= 2)
        .where(F.col("ch.q") > F.col("rj.q"))
    )
    return pairs.select(
        "cent_id",
        "lang",
        "n_group",
        (-F.col("ch.nd")).cast("bigint").alias("chosen_doc"),
        (-F.col("rj.nd")).cast("bigint").alias("rejected_doc"),
        (F.col("ch.q").cast("double") / 1000000.0).alias("q_chosen"),
        (F.col("rj.q").cast("double") / 1000000.0).alias("q_rejected"),
        ((F.col("ch.q") - F.col("rj.q")).cast("double") / 1000000.0).alias(
            "margin"
        ),
    )


# ---------------------------------------------------------------------------
# K150 — embedding-tier decontamination (round 11)
# ---------------------------------------------------------------------------

_SEMDECON_T = 0.95  # cosine past which a train doc is a paraphrase-level hit


_SD_DOT = """list_reduce(
    list_prepend(CAST(0.0 AS DOUBLE),
        list_transform(range(1, len(t.embedding) + 1),
                       i -> CAST(t.embedding[i] AS DOUBLE)
                            * CAST(v.e_emb[i] AS DOUBLE))),
    (acc, p) -> acc + p)"""
_SD_TNORM = """sqrt(list_reduce(
    list_prepend(CAST(0.0 AS DOUBLE),
        list_transform(t.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
    (acc, p) -> acc + p))"""
_SD_ENORM = """sqrt(list_reduce(
    list_prepend(CAST(0.0 AS DOUBLE),
        list_transform(v.e_emb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
    (acc, p) -> acc + p))"""


@query(
    "llm_semantic_decontaminate",
    oracle=f"""
    WITH ev AS (
        SELECT vec_id AS eval_id, embedding AS e_emb
        FROM embeddings WHERE vec_id % 29 = 0
    ),
    tr AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id % 29 <> 0
    ),
    best AS (
        SELECT vec_id,
               max({{'c': cos, 'ne': -eval_id}}) AS b
        FROM (
            SELECT t.vec_id, v.eval_id,
                   {_SD_DOT} / NULLIF(({_SD_TNORM} * {_SD_ENORM}), 0) AS cos
            FROM tr t CROSS JOIN ev v
        ) GROUP BY vec_id
    )
    SELECT vec_id AS doc_id,
           CAST(-b['ne'] AS BIGINT) AS nearest_eval_id,
           CAST(trunc(b['c'] * 1000000 + 0.5) AS BIGINT) / 1000000.0
               AS max_cos,
           CAST(trunc(b['c'] * 1000000 + 0.5) AS BIGINT)
               >= {int(_SEMDECON_T * 1000000)} AS contaminated
    FROM best
    """,
    ref="SURVEY §2 K150 [EXT] (embedding-tier benchmark decontamination: "
    "max cosine of each train vector against the broadcast eval set, "
    "flagged past 0.95 — the PARAPHRASE tier K13's exact word-5-gram "
    "collision cannot see (a reworded benchmark item shares no 5-gram "
    "but embeds nearly identically; n-gram + embedding two-tier decon "
    "per Yang et al. 2023 'Rethinking Benchmark Contamination'); same "
    "eval-split stand-in (id % 29) as K13 so the tiers compose)",
)
def llm_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per train vector (vec_id % 29 != 0): the nearest eval vector
    (vec_id % 29 == 0) by cosine, the similarity (1e-6-quantized), and
    the contamination verdict — flagged on the SAME quantized value that
    is reported, so flag and max_cos are always mutually consistent.
    Ties on cosine break to the lowest eval_id via the argmax struct
    device.

    Scale shape: the eval side is benchmark-sized regardless of corpus
    size, so it BROADCASTS and the train side never shuffles — one
    narrow O(n_train · n_eval · dim) scan into a doc-keyed max-struct
    agg (never a rank window); the llm_sim_topk posture with the K13
    decontamination framing. At 100 TB the same plan runs with the
    IVF-bucketed index (ann_ivf_topk) as the candidate stage."""
    from ksql_spark.operators import vectors

    e = load(spark, sf_dir, "embeddings")
    ev = e.where(F.col("vec_id") % 29 == 0).select(
        F.col("vec_id").alias("eval_id"),
        F.col("embedding").alias("e_emb"),
        vectors.l2_norm("embedding").alias("e_norm"),
    )
    tr = e.where(F.col("vec_id") % 29 != 0).select(
        "vec_id", "embedding", vectors.l2_norm("embedding").alias("t_norm")
    )
    cos = F.try_divide(
        vectors.dot("embedding", "e_emb"),
        F.nullif(F.col("t_norm") * F.col("e_norm"), F.lit(0.0)),
    )
    best = (
        tr.crossJoin(F.broadcast(ev))
        .select(
            "vec_id",
            F.struct(cos.alias("c"), (-F.col("eval_id")).alias("ne")).alias(
                "p"
            ),
        )
        .groupBy("vec_id")
        .agg(F.max("p").alias("b"))
    )
    return best.select(
        F.col("vec_id").alias("doc_id"),
        (-F.col("b.ne")).cast("bigint").alias("nearest_eval_id"),
        (
            (F.col("b.c") * 1000000 + F.lit(0.5)).cast("long").cast("double")
            / 1000000.0
        ).alias("max_cos"),
        # flag on the SAME 1e-6-quantized value that is reported, so a
        # consumer joining max_cos against the flag never sees
        # max_cos == 0.950000 with contaminated = false (ADVICE r11)
        (
            (F.col("b.c") * 1000000 + F.lit(0.5)).cast("long")
            >= int(_SEMDECON_T * 1000000)
        ).alias("contaminated"),
    )


def _ivf_cell_of(cent_rows, emb) -> F.Column:
    """Nearest coarse-quantizer cell as a pure HOF fold — ZERO exchange on
    the (100 TB) side it runs over: the K centroids enter the plan as a
    literal array of structs, and the argmin over squared-L2 distance is
    one F.aggregate per row (ties break to the lowest cent_id, the same
    (dist asc, cent_id asc) rule as ann_ivf_topk's window form).

    Degenerate-input caveat (ADVICE r13): a NULL / empty / all-NaN
    embedding yields all-NULL (or NaN) distances, so the strict `d <`
    fold keeps the init cent_id = -1 — where the replaced ORDER BY cd ASC
    window (NULLS FIRST) would have assigned the lowest cent_id. Rows
    assigned cell -1 silently miss every probe. The embeddings corpus
    contains no such vectors (dims are fixed-width doubles from the
    generator), and _assign_fixed_centroids carries the explicit NULL
    branches for the paths where data-derived inputs could; if this
    helper is ever pointed at untrusted embeddings, add the same
    branches."""
    emb_d = emb.cast("array<double>")
    cent_arr = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("cid"),
                F.array(*[F.lit(float(x)) for x in c]).alias("ce"),
            )
            for i, c in cent_rows
        ]
    )

    def d2(ce):
        return F.aggregate(
            F.zip_with(emb_d, ce, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    # distances materialize ONCE per centroid (transform), so the argmin
    # fold compares precomputed doubles instead of re-running the K x dim
    # arithmetic in both the WHEN condition and the result struct
    dists = F.transform(
        cent_arr,
        lambda cent: F.struct(
            cent["cid"].alias("cid"), d2(cent["ce"]).alias("d")
        ),
    )
    init = F.struct(
        F.lit(-1).cast("int").alias("cid"),
        F.lit(float("inf")).alias("d"),
    )
    step = lambda acc, cand: F.when(cand["d"] < acc["d"], cand).otherwise(acc)
    return F.aggregate(dists, init, step)["cid"]


@query(
    "llm_semantic_decontaminate_ivf",
    oracle=None,  # IVF-pruned candidate stage ≠ exact → rows-only; laws below
    ref="SURVEY §2 K150 [EXT] (the 100 TB tier of embedding "
    "decontamination: the brute sibling compares every train vector "
    "against every eval vector (fine while n_eval is benchmark-bounded); "
    "this tier routes candidates through ann_ivf_topk's FIXED-K coarse "
    "quantizer — train vectors fold to their nearest cell with zero "
    "exchange, eval vectors probe their nprobe=4 nearest cells, and "
    "cosine is computed only inside probed cells. Laws pinned in "
    "tests/test_wave12.py: row-set parity with brute, max_cos is a "
    "LOWER BOUND of brute's (pruning can only drop candidates), flagged "
    "set ⊆ brute's, and planted near-copies are ALL recalled)",
)
def llm_semantic_decontaminate_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-tier semantic decontamination: same output contract as
    llm_semantic_decontaminate (one row per train vector; nearest eval,
    1e-6-quantized max cosine, flag on the quantized value), but the
    candidate stage is IVF-pruned — each train vector is compared ONLY
    against eval vectors probing its coarse cell. Train vectors whose
    cell no eval probes report NULL nearest/max_cos and contaminated =
    false (nothing near them by the quantizer's own geometry).

    Why this is the 100 TB path: the brute tier is O(n_train · n_eval ·
    dim) on ONE narrow pass — right while n_eval is benchmark-bounded,
    wrong once the eval suite grows to millions of rows (eval-suite
    unions, paraphrase banks). Here the train side stays exchange-FREE
    (the cell id is a per-row HOF fold over K literal centroids — no
    crossJoin, no shuffle, no window), the eval side broadcasts (eval ×
    nprobe rows), and the only join is a broadcast HASH join on cell_id
    with per-train fan-out = evals probing that cell (≈ n_eval ·
    nprobe / K) instead of n_eval. A contaminated pair (cos >= 0.95) is
    near-identical in embedding space, so train and eval land in the
    same cell with margin — the planted-copy recall law in
    tests/test_wave12.py pins exactly that.

    Shares _ivf_coarse with ann_ivf_topk (same centroids, same cells,
    same flat-search fallback for tiny corpora).

    Measured boundary (SCALE.md round 13): the pruning factor is
    CONSTANT at nprobe/K = 1/4, so once the eval suite itself scales
    (69k eval vectors at the 2M-embedding sf100 probe) the per-train
    fan-out n_eval·nprobe/K reaches ~17k candidates/row and the join
    spills past the box (killed before ENOSPC at ~60 GB). At that eval
    scale the cell count must grow with the data (K ≈ √(n_eval·n_train),
    ~4096 here) — kept fixed at the oracle-checked K=16 in this entry;
    the boundary and the required config are the documented trade."""
    from ksql_spark.operators import vectors
    from ksql_spark.queries.llm import _ivf_coarse

    K, NPROBE = 16, 4
    cent_rows, n_sample = _ivf_coarse(spark, sf_dir, K=K)
    nprobe = K if n_sample < 64 * K else NPROBE
    cents = spark.createDataFrame(
        cent_rows, "cent_id int, cent_emb array<double>"
    )
    e = load(spark, sf_dir, "embeddings")
    tr = e.where(F.col("vec_id") % 29 != 0).select(
        "vec_id",
        "embedding",
        vectors.l2_norm("embedding").alias("t_norm"),
        _ivf_cell_of(cent_rows, F.col("embedding")).alias("cell"),
    )
    probe_w = SparkWindow.partitionBy("eval_id").orderBy(
        F.col("qd").asc(), F.col("cell")
    )
    ev = (
        e.where(F.col("vec_id") % 29 == 0)
        .select(
            F.col("vec_id").alias("eval_id"),
            F.col("embedding").alias("e_emb"),
            vectors.l2_norm("embedding").alias("e_norm"),
        )
        .crossJoin(F.broadcast(cents))
        .select(
            "eval_id",
            "e_emb",
            "e_norm",
            F.col("cent_id").alias("cell"),
            vectors.l2_sq_dist("e_emb", "cent_emb").alias("qd"),
        )
        .withColumn("prn", F.row_number().over(probe_w))
        .where(F.col("prn") <= nprobe)
        .select("cell", "eval_id", "e_emb", "e_norm")
    )
    cos = F.try_divide(
        vectors.dot("embedding", "e_emb"),
        F.nullif(F.col("t_norm") * F.col("e_norm"), F.lit(0.0)),
    )
    best = (
        tr.join(F.broadcast(ev), "cell", "left")
        .select(
            "vec_id",
            F.struct(cos.alias("c"), (-F.col("eval_id")).alias("ne")).alias(
                "p"
            ),
        )
        .groupBy("vec_id")
        .agg(F.max("p").alias("b"))
    )
    return best.select(
        F.col("vec_id").alias("doc_id"),
        (-F.col("b.ne")).cast("bigint").alias("nearest_eval_id"),
        (
            (F.col("b.c") * 1000000 + F.lit(0.5)).cast("long").cast("double")
            / 1000000.0
        ).alias("max_cos"),
        F.coalesce(
            (F.col("b.c") * 1000000 + F.lit(0.5)).cast("long")
            >= int(_SEMDECON_T * 1000000),
            F.lit(False),
        ).alias("contaminated"),
    )


# ---------------------------------------------------------------------------
# K151 — isotonic calibration via pool-adjacent-violators (round 11)
# ---------------------------------------------------------------------------

_PAV_STEPS = 9  # 10 bins need at most 9 merges


def _pav_oracle() -> str:
    head = f"""
    WITH scored AS (
        SELECT ({SQL_QUALITY}) AS s,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        FROM documents
        WHERE text IS NOT NULL
    ),
    b0 AS MATERIALIZED (
        SELECT CAST(least(9, CAST(trunc(s * 10) AS INT)) AS INT) AS lo,
               CAST(least(9, CAST(trunc(s * 10) AS INT)) AS INT) AS hi,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(pos) AS BIGINT) AS sp
        FROM scored GROUP BY 1, 2
    )
    """
    for t in range(1, _PAV_STEPS + 1):
        head += f""",
    p{t} AS MATERIALIZED (
        SELECT lo, hi, n, sp,
               lead(lo) OVER (ORDER BY lo) AS nlo,
               lead(hi) OVER (ORDER BY lo) AS nhi,
               lead(n) OVER (ORDER BY lo) AS nn2,
               lead(sp) OVER (ORDER BY lo) AS nsp
        FROM b{t - 1}
    ),
    v{t} AS MATERIALIZED (
        SELECT lo AS flo, nlo AS plo FROM p{t}
        WHERE nlo IS NOT NULL AND sp * nn2 > nsp * n
        ORDER BY lo LIMIT 1
    ),
    b{t} AS MATERIALIZED (
        SELECT p.lo,
               CASE WHEN v.flo = p.lo THEN p.nhi ELSE p.hi END AS hi,
               CASE WHEN v.flo = p.lo THEN p.n + p.nn2 ELSE p.n END AS n,
               CASE WHEN v.flo = p.lo THEN p.sp + p.nsp ELSE p.sp END AS sp
        FROM p{t} p LEFT JOIN v{t} v ON true
        WHERE v.flo IS NULL OR p.lo <> v.plo
    )
    """
    return head + f"""
    SELECT CAST(lo AS INT) AS bin_lo, CAST(hi AS INT) AS bin_hi,
           n, sp AS n_pos,
           CAST(trunc(CAST(sp AS DOUBLE) / n * 1000000 + 0.5) AS BIGINT)
               / 1000000.0 AS iso_rate
    FROM b{_PAV_STEPS}
    """


@query(
    "llm_isotonic_calibration",
    oracle=_pav_oracle(),
    ref="SURVEY §2 K151 [EXT] (isotonic calibration by pool-adjacent-"
    "violators (Ayer et al. 1955; Zadrozny & Elkan 2002) over K119's "
    "reliability deciles: adjacent bins violating monotonicity of the "
    "observed lang='en' rate pool into weighted blocks — leftmost "
    "violation first, 9 unrolled merge steps (10 bins need at most 9) — "
    "yielding the monotone step function that MAPS raw quality scores "
    "to calibrated probabilities; K119 MEASURES the miscalibration "
    "(ECE), this FIXES it; violations compared by exact integer "
    "cross-multiplication sp_i·n_j > sp_j·n_i, so the merge sequence "
    "is engine-exact with no float anywhere before the final rate)",
)
def llm_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (monotone non-decreasing) fit of P(en | quality decile):
    the PAV block table after 9 leftmost-merge steps — each row one
    pooled block [bin_lo, bin_hi] with member count, positives, and the
    calibrated rate. A perfectly calibrated score keeps 10 singleton
    blocks; heavy pooling = the score's ordering disagrees with the
    label ordering in that region.

    Scale shape: ONE corpus scan into the 10-row decile agg; the block
    table is bounded at 10 rows BY CONSTRUCTION (quality_score is in
    [0,1], so least(9, trunc(q*10)) lands in {0..9} regardless of corpus
    size) — the sanctioned bounded-driver-result class (guide §5, the
    events_attribution_markov posture). r14 (VERDICT r13 item 5 device):
    the nine PAV merge steps previously ran as 9 rounds of pinned
    window/limit/join plans over the <= 10-row table — ~3 s of pure stage
    scheduling (20 build-time jobs) at every scale. The table is now
    collected once and the merges run in plain Python with IDENTICAL
    arithmetic: block counts are exact integers, the leftmost-violation
    pick is the same integer cross-multiplication sp_i*n_j > sp_j*n_i,
    and the final rate is the same IEEE double expression (counts stay
    under 2^53, so Python's int/int true division equals Spark's
    cast-double division bit for bit; Python int() and Spark cast(long)
    both truncate toward zero), so every merge decision and the output
    are bit-identical to the former plan spelling.

    NULL-text docs are excluded up front (ADVICE r11): they have no
    meaningful quality score and the engines bin an unguarded NULL
    divergently (DuckDB least(9, trunc(NULL*10)) = NULL vs Spark's
    size(NULL) = -1 path -> bin 0), so the guard is a correctness
    contract for full corpora, not a fixture convenience."""
    d = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    b0 = (
        d.select(
            F.least(
                F.lit(9), (text.quality_score("text") * 10).cast("int")
            ).alias("lo"),
            F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
        )
        .groupBy("lo")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("pos").cast("bigint").alias("sp"),
        )
    )
    # blocks as [lo, hi, n, sp], ascending lo — the lead() adjacency
    blocks = sorted(
        [[r["lo"], r["lo"], r["n"], r["sp"]] for r in b0.collect()]
    )
    for _ in range(_PAV_STEPS):
        # leftmost adjacent violation: rate_i > rate_{i+1} by exact
        # integer cross-multiplication (the former v-subquery predicate)
        vi = None
        for i in range(len(blocks) - 1):
            if blocks[i][3] * blocks[i + 1][2] > blocks[i + 1][3] * blocks[i][2]:
                vi = i
                break
        if vi is None:
            continue  # no violation: the former left join kept all rows
        lft, rgt = blocks[vi], blocks[vi + 1]
        blocks[vi] = [lft[0], rgt[1], lft[2] + rgt[2], lft[3] + rgt[3]]
        del blocks[vi + 1]
    rows = [
        (
            int(lo),
            int(hi),
            n,
            sp,
            float(int(sp / n * 1000000.0 + 0.5)) / 1000000.0,
        )
        for lo, hi, n, sp in blocks
    ]
    return spark.createDataFrame(
        rows, "bin_lo int, bin_hi int, n bigint, n_pos bigint, iso_rate double"
    )
