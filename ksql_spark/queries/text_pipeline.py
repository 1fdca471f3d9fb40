"""[EXT] Training-data pipeline text operators beyond the reference surface:
document chunking, PII scrubbing, repetition-based quality scoring.

These are the text-side companions to queries/llm.py's dedup/similarity ops —
the operations a 100 TB pretraining corpus pipeline runs between ingest and
tokenization. All are JVM-side higher-order-function / regexp expressions
(narrow, no shuffle except stated), so they scale linearly with the corpus.

Reference scope note: the reference (ksql.js) delegates all SQL to AlaSQL and
has no text-pipeline surface; these follow SURVEY.md §2 [EXT] mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ksql_spark.operators import text as text_ops
from ksql_spark.registry import query
from ksql_spark.tables import load

CHUNK = 50  # tokens per chunk
STRIDE = 25  # tokens between chunk starts (50% overlap)

# RE2-safe patterns (no backrefs/lookahead) so Spark (Java regex) and DuckDB
# (RE2) agree byte-for-byte.
_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_URL = "https?://[A-Za-z0-9./_-]+"
_LONG_DIGITS = "[0-9]{7,}"


def _bigrams(words):
    """Word-bigram array over a single-space token split — shared by
    llm_repetition_ratio and llm_corpus_filter so the construction (and its
    sequence(1,0)-descending guard) cannot drift between them.

    The token array is let-bound (text_ops.let): callers pass a raw split()
    expression, and placed directly inside the per-bigram lambda it would
    re-split the document twice per bigram (O(n²) regex work per doc)."""
    return text_ops.let(
        words,
        lambda w: F.when(
            F.size(w) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(w) - 1),
                lambda i: F.concat(
                    F.element_at(w, i), F.lit(" "), F.element_at(w, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )


@query(
    "llm_chunk_sliding",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ), s AS (
        SELECT doc_id, words,
               unnest(range(0, greatest(len(words), 1), {STRIDE})) AS start
        FROM w
    )
    SELECT doc_id,
           CAST(start // {STRIDE} AS INT) AS chunk_idx,
           array_to_string(words[start + 1 : start + {CHUNK}], ' ') AS chunk_text,
           CAST(least({CHUNK}, len(words) - start) AS INT) AS n_tokens
    FROM s
    """,
    ref="SURVEY §2 [EXT] corpus chunking (sliding token windows, 50% overlap "
    "— the standard pretraining-context windowing; narrow map + explode, "
    "no shuffle)",
)
def llm_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each document into overlapping CHUNK-token windows every STRIDE
    tokens. Plan: one projection with HOFs + posexplode — embarrassingly
    parallel, output ~len/STRIDE rows per doc."""
    d = load(spark, sf_dir, "documents")
    # Token array projected once per row: embedded directly in the per-chunk
    # lambda below, the slice() would re-split the document for every chunk.
    w = d.select("doc_id", F.split(F.col("text"), " ").alias("__w"))
    words = F.col("__w")
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(words) - 1, F.lit(0)), F.lit(STRIDE)
    )
    chunks = F.transform(
        starts,
        lambda s: F.array_join(F.slice(words, s + 1, CHUNK), " "),
    )
    return (
        w.select(
            "doc_id",
            F.size(words).alias("n_words"),
            F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            "chunk_text",
            F.least(
                F.lit(CHUNK), F.col("n_words") - F.col("chunk_idx") * STRIDE
            ).cast("int").alias("n_tokens"),
        )
    )


@query(
    "llm_scrub_pii",
    oracle=f"""
    WITH dirty AS (
        SELECT doc_id,
               text || ' contact user' || doc_id ||
               '@example.com via https://site' || (doc_id % 10) ||
               '.example/path id 1234567' || doc_id AS text
        FROM documents
    )
    SELECT doc_id,
           regexp_replace(
               regexp_replace(
                   regexp_replace(text, '{_EMAIL}', '<EMAIL>', 'g'),
                   '{_URL}', '<URL>', 'g'),
               '{_LONG_DIGITS}', '<NUM>', 'g') AS scrubbed,
           CAST(length(text) - length(
               regexp_replace(
                   regexp_replace(
                       regexp_replace(text, '{_EMAIL}', '<EMAIL>', 'g'),
                       '{_URL}', '<URL>', 'g'),
                   '{_LONG_DIGITS}', '<NUM>', 'g')) AS INT) AS chars_removed
    FROM dirty
    """,
    ref="SURVEY §2 [EXT] PII scrubbing (email/URL/long-digit redaction; "
    "RE2-safe patterns so both engines agree. PII is injected "
    "deterministically because the synthetic corpus contains none — the "
    "redaction itself is what the oracle verifies)",
)
def llm_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact emails, URLs and long digit runs. Narrow regexp projection —
    at 100 TB this is scan-bound, no shuffle, fully codegen'd."""
    d = load(spark, sf_dir, "documents")
    dirty = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com via https://site"),
        (F.col("doc_id") % 10).cast("string"),
        F.lit(".example/path id 1234567"), F.col("doc_id").cast("string"),
    )
    scrub = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(dirty, _EMAIL, "<EMAIL>"), _URL, "<URL>"
        ),
        _LONG_DIGITS,
        "<NUM>",
    )
    return d.select(
        "doc_id",
        scrub.alias("scrubbed"),
        (F.length(dirty) - F.length(scrub)).alias("chars_removed"),
    )


@query(
    "llm_repetition_ratio",
    oracle="""
    WITH b AS (
        SELECT doc_id,
               list_transform(
                   range(1, greatest(len(string_split(text, ' ')), 1)),
                   i -> string_split(text, ' ')[i] || ' ' ||
                        string_split(text, ' ')[i + 1]) AS bigrams
        FROM documents
    )
    SELECT doc_id,
           CAST(len(bigrams) AS INT) AS n_bigrams,
           CASE WHEN len(bigrams) = 0 THEN CAST(1.0 AS DOUBLE)
                ELSE CAST(len(list_distinct(bigrams)) AS DOUBLE) / len(bigrams)
           END AS uniq_ratio
    FROM b
    """,
    ref="SURVEY §2 [EXT] repetition quality metric (distinct-bigram ratio — "
    "low ratio flags boilerplate/spam docs; pure HOF projection, IEEE "
    "division is identically rounded in both engines)",
)
def llm_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-bigram fraction per document (1.0 = no repetition).

    Two-step projection: the bigram array is materialized once per row in
    the inner select (it feeds three expressions in the outer one; inlined,
    each would rebuild the whole array — CollapseProject keeps expensive
    multi-referenced aliases un-collapsed, so the split runs once)."""
    d = load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    b = d.select("doc_id", _bigrams(words).alias("__bigrams"))
    n = F.size("__bigrams")
    return b.select(
        "doc_id",
        n.alias("n_bigrams"),
        F.when(n == 0, F.lit(1.0))
        .otherwise(F.size(F.array_distinct("__bigrams")).cast("double") / n)
        .alias("uniq_ratio"),
    )


PACK_BUDGET = 128  # tokens per packed context window


@query(
    "llm_pack_sequences",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ), s AS (
        SELECT doc_id, words,
               unnest(range(0, greatest(len(words), 1), {STRIDE})) AS start
        FROM w
    ), chunks AS (
        SELECT doc_id, CAST(start // {STRIDE} AS INT) AS chunk_idx,
               CAST(least({CHUNK}, len(words) - start) AS INT) AS n_tokens
        FROM s
    )
    SELECT doc_id, chunk_idx, n_tokens,
           CAST((SUM(n_tokens) OVER (
                     ORDER BY doc_id, chunk_idx
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - n_tokens) // {PACK_BUDGET} AS INT) AS pack_id
    FROM chunks
    """,
    ref="SURVEY §2 [EXT] sequence packing (chunks → fixed-budget context "
    "windows by running-token offset — the pretraining batch-packing step; "
    "two-pass range-partitioned cumulative sum, NO single-partition window)",
)
def llm_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign each chunk to a context-window pack: pack_id = floor(running
    token offset / budget) over (doc_id, chunk_idx) order. Deterministic,
    engine-portable integer math; a chunk spanning a boundary starts the next
    pack's overflow (offset-based packing, the standard approximation).

    Scale shape (the zipWithIndex pattern, operators/scale.py:ranged_cumsum):
    a naive global cumsum is a single-partition window — the whole corpus
    through one task. Instead:
      1. repartitionByRange on the sort key → partition p holds a contiguous
         key range, all ranges ordered across p (localCheckpoint pins the
         partitioning so both passes see identical boundaries);
      2. per-partition running sum (window PARTITIONED by spark_partition_id —
         parallel, no global exchange);
      3. one bounded job collects the per-partition token totals (== number of
         partitions rows, never corpus rows) and prefix-sums them on the
         driver;
      4. broadcast-join the per-partition starting offsets back.
    test_plans.py gates that no Exchange SinglePartition appears in the plan.
    At 100 TB step 1's checkpoint becomes a reliable checkpoint dir; steps 2-4
    are unchanged.
    """
    d = load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(words) - 1, F.lit(0)), F.lit(STRIDE)
    )
    chunks = (
        d.select(
            "doc_id",
            F.size(words).alias("n_words"),
            F.posexplode(starts).alias("chunk_idx", "start"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.least(
                F.lit(CHUNK), F.col("n_words") - F.col("start")
            ).cast("int").alias("n_tokens"),
        )
    )
    from ksql_spark.operators.scale import ranged_cumsum

    offset = F.col("_cum") - F.col("n_tokens")  # exclusive running offset
    return ranged_cumsum(
        chunks, ["doc_id", "chunk_idx"], "n_tokens", out_col="_cum"
    ).select(
        "doc_id",
        "chunk_idx",
        "n_tokens",
        F.floor(offset / PACK_BUDGET).cast("int").alias("pack_id"),
    )


@query(
    "llm_corpus_filter",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_words,
               CASE WHEN len(string_split(text,' ')) < 2 THEN 1.0
                    ELSE len(list_distinct(list_transform(
                             range(1, len(string_split(text,' '))),
                             i -> string_split(text,' ')[i] || ' ' ||
                                  string_split(text,' ')[i+1]))) * 1.0
                         / (len(string_split(text,' ')) - 1)
               END AS uniq_ratio,
               0.4 * least(1.0, len(string_split(text,' ')) / 100.0)
               + 0.3 * (len(list_distinct(string_split(text,' '))) * 1.0
                        / len(string_split(text,' ')))
               + 0.3 * (len(list_filter(string_split(text,' '),
                            x -> x IN ('the','a','of','and','to','in','is'))) * 1.0
                        / len(string_split(text,' '))) AS quality
        FROM documents
    )
    SELECT doc_id, n_words >= 20 AS len_ok, uniq_ratio >= 0.5 AS rep_ok,
           quality >= 0.3 AS quality_ok,
           (n_words >= 20 AND uniq_ratio >= 0.5 AND quality >= 0.3) AS keep
    FROM scored
    """,
    ref="SURVEY §2 K4/K9 [EXT] (composite corpus filter — the actual "
    "keep/drop decision a pretraining pipeline ships: length gate AND "
    "repetition gate AND quality gate, each signal reused from its own "
    "oracle-checked entry; one narrow pass, verdict per document)",
)
def llm_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    r"""Per-document keep/drop verdict with per-gate booleans (auditability:
    which gate rejected a doc matters as much as the verdict).

    Every signal here uses the SAME single-space token split as this entry's
    oracle — operators.text.quality_score tokenizes on \s+ (drops empties),
    which diverges from string_split(text, ' ') on multi-space/tab text, so
    the quality formula is spelled inline on the shared split instead."""
    d = load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    uniq = F.when(n_words < 2, F.lit(1.0)).otherwise(
        F.size(F.array_distinct(_bigrams(words))).cast("double") / (n_words - 1)
    )
    stop = F.array([F.lit(w) for w in
                    ("the", "a", "of", "and", "to", "in", "is")])
    quality = (
        0.4 * F.least(F.lit(1.0), n_words / F.lit(100.0))
        + 0.3 * (F.size(F.array_distinct(words)).cast("double") / n_words)
        + 0.3 * (
            F.size(F.filter(words, lambda w: F.array_contains(stop, w)))
            .cast("double") / n_words
        )
    )
    len_ok = (n_words >= 20).alias("len_ok")
    rep_ok = (uniq >= 0.5).alias("rep_ok")
    q_ok = (quality >= 0.3).alias("quality_ok")
    return d.select(
        "doc_id",
        len_ok,
        rep_ok,
        q_ok,
        ((n_words >= 20) & (uniq >= 0.5) & (quality >= 0.3)).alias("keep"),
    )


@query(
    "llm_pack_efficiency",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ), s AS (
        SELECT doc_id, words,
               unnest(range(0, greatest(len(words), 1), {STRIDE})) AS start
        FROM w
    ), chunks AS (
        SELECT doc_id, CAST(start // {STRIDE} AS INT) AS chunk_idx,
               CAST(least({CHUNK}, len(words) - start) AS INT) AS n_tokens
        FROM s
    ), packed AS (
        SELECT n_tokens,
               (SUM(n_tokens) OVER (
                    ORDER BY doc_id, chunk_idx
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - n_tokens) // {PACK_BUDGET} AS pack_id
        FROM chunks
    ),
    per_pack AS (
        SELECT pack_id, SUM(n_tokens) AS fill FROM packed GROUP BY pack_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_packs,
           CAST(SUM(fill) AS BIGINT) AS total_tokens,
           CAST(SUM(CASE WHEN fill < {PACK_BUDGET}
                         THEN {PACK_BUDGET} - fill ELSE 0 END) AS BIGINT)
               AS padding_waste,
           CAST(SUM(least(fill, {PACK_BUDGET})) AS DOUBLE)
               / (COUNT(*) * {PACK_BUDGET}) AS utilization
    FROM per_pack
    """,
    ref="SURVEY §2 K62 [EXT] (packing-efficiency audit: per-window fill, "
    "padding waste, and utilization of llm_pack_sequences' assignment — "
    "the metric batch-packing is tuned against; padding waste is compute "
    "burned on pad tokens at training time)",
)
def llm_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How full the packed context windows are: window count, total packed
    tokens, padding waste (budget minus fill for underfull windows — the
    boundary-overflow windows that exceed budget pad nothing), and overall
    utilization. This single row is what you tune CHUNK/STRIDE/BUDGET
    against. Built on llm_pack_sequences' own assignment, so the audit
    can't drift from the packer.

    Scale shape: inherits the packer's two-pass cumsum; the efficiency
    agg collapses to |packs| rows then one scalar row."""
    packed = llm_pack_sequences(spark, sf_dir)
    per_pack = packed.groupBy("pack_id").agg(F.sum("n_tokens").alias("fill"))
    fill = F.col("fill")
    return per_pack.agg(
        F.count("*").cast("bigint").alias("n_packs"),
        F.sum("fill").cast("bigint").alias("total_tokens"),
        F.sum(
            F.when(fill < PACK_BUDGET, PACK_BUDGET - fill).otherwise(0)
        )
        .cast("bigint")
        .alias("padding_waste"),
        (
            F.sum(F.least(fill, F.lit(PACK_BUDGET))).cast("double")
            / (F.count("*") * PACK_BUDGET)
        ).alias("utilization"),
    )


_BATCH_BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048)


@query(
    "llm_batch_bucketing",
    oracle="""
    WITH toks AS (
        SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS t
        FROM documents
    ), assigned AS (
        SELECT CASE WHEN t <= 16 THEN 16 WHEN t <= 32 THEN 32
                    WHEN t <= 64 THEN 64 WHEN t <= 128 THEN 128
                    WHEN t <= 256 THEN 256 WHEN t <= 512 THEN 512
                    WHEN t <= 1024 THEN 1024 ELSE 2048 END AS bucket_len,
               LEAST(t, 2048) AS kept
        FROM toks
    )
    SELECT CAST(bucket_len AS BIGINT) AS bucket_len,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(kept) AS BIGINT) AS tokens_kept,
           CAST(SUM(bucket_len - kept) AS BIGINT) AS padding_tokens,
           CAST(trunc(CAST(SUM(bucket_len - kept) AS DOUBLE)
                      / (COUNT(*) * bucket_len) * 1000000 + 0.5)
                AS BIGINT) / 1000000.0 AS pad_frac
    FROM assigned GROUP BY bucket_len
    """,
    ref="SURVEY §2 K99 [EXT] (length-bucketed batch planning: docs binned "
    "to power-of-two sequence buckets with per-bucket padding-waste "
    "fraction — the dynamic-batching decision table; the bucketed "
    "alternative to K11's packing (packing concatenates, bucketing pads "
    "— pad_frac is exactly the compute a trainer burns on pad tokens), "
    "over-cap docs truncate to the 2048 cap)",
)
def llm_batch_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per power-of-two bucket (16..2048): document count, real tokens
    kept, pad tokens burned, and the padding fraction of a batch built
    at that length — the table that decides whether to train with
    bucketed batches (simple, pad_frac waste) or packed sequences (K11,
    zero pad, attention-mask complexity). Docs past the 2048 cap
    truncate to the cap (kept = least(t, cap)).

    Scale shape: the bucket is a literal CASE chain in whole-stage
    codegen (no join, no log2 float edge-cases at exact powers of two);
    ONE map-side-combined agg with ≤8 output rows. Nothing here grows
    with the corpus."""
    d = load(spark, sf_dir, "documents")
    from ksql_spark.operators.text import words

    t = F.size(words("text")).cast("long")
    expr = None
    for b in _BATCH_BUCKETS[:-1]:
        expr = (
            F.when(t <= b, F.lit(b))
            if expr is None
            else expr.when(t <= b, F.lit(b))
        )
    bucket_len = expr.otherwise(F.lit(_BATCH_BUCKETS[-1])).cast("long")
    kept = F.least(t, F.lit(_BATCH_BUCKETS[-1]).cast("long"))
    assigned = d.select(
        bucket_len.alias("bucket_len"), kept.alias("kept")
    )
    g = assigned.groupBy("bucket_len").agg(
        F.count("*").alias("n_docs"),
        F.sum("kept").alias("tokens_kept"),
        F.sum(F.col("bucket_len") - F.col("kept")).alias("padding_tokens"),
    )
    return g.select(
        "bucket_len",
        "n_docs",
        "tokens_kept",
        "padding_tokens",
        (
            (
                F.col("padding_tokens").cast("double")
                / (F.col("n_docs") * F.col("bucket_len"))
                * 1000000
                + F.lit(0.5)
            )
            .cast("long")
            .cast("double")
            / 1000000.0
        ).alias("pad_frac"),
    )
