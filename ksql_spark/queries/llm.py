"""SURVEY.md §2.K — LLM-data-pipeline operators (all [EXT], mandated by the
north star: dedup, similarity search, text analysis, multimodal columns).

Implementations live in ksql_spark/operators/{text,vectors,dedup,multimodal}.py;
this module binds them to driver tables + DuckDB oracles. Hash-based sketches
(MinHash/SimHash/IVF) are engine-specific → rows-only checks; everything
arithmetic is oracle-checked bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ksql_spark.operators import dedup, multimodal, text, vectors
from ksql_spark.operators.scale import pin as scale_pin
from ksql_spark.registry import davg, dsum, query, sql_davg, sql_dsum
from ksql_spark.tables import load

# DuckDB spelling of the same left-fold vector math used by operators.vectors.
# The 0.0 seed is PREPENDED into the reduced list so the fold is exactly
# Spark's aggregate(init=0.0, acc+p): bare list_reduce starts at the first
# element, which (a) ERRORS on an empty vector where Spark returns 0.0, and
# (b) returns -0.0 where Spark's 0.0 + (-0.0) normalizes to +0.0 — both
# found by tests/test_properties.py::test_vector_dot_cross_engine_bitwise.
_DOT = """
list_reduce(
    list_prepend(CAST(0.0 AS DOUBLE),
        list_transform(range(1, len({a}) + 1),
                       i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))),
    (acc, p) -> acc + p)
"""
_NORM = """
sqrt(list_reduce(
    list_prepend(CAST(0.0 AS DOUBLE),
        list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
    (acc, p) -> acc + p))
"""


def _dot_sql(a: str, b: str) -> str:
    return _DOT.format(a=a, b=b)


def _norm_sql(a: str) -> str:
    return _NORM.format(a=a)


# Deterministic KMeans codebooks per (kind, sf_dir, data-fingerprint): the fit
# is seeded and the bounded sample is a pure function of vec_id values (Knuth-
# hash reservoir, partition-order independent), so the centroids are a pure
# function of the input DATA. The fingerprint component (file count + total
# bytes + newest mtime of the embeddings parquet) invalidates the cache when
# the files under an sf_dir change (VERDICT r6 "what's wrong" #4). Caching
# spares the second full fit when a *_recall entry re-invokes its builder
# right after the *_topk entry (driver sweep, tests).
_CENTROID_CACHE: dict[tuple, list] = {}


def _emb_fingerprint(sf_dir: str) -> tuple:
    """(n_files, total_bytes, max_mtime_ns) of the embeddings parquet under
    sf_dir — a cheap local-metadata stat, no Spark job. On a remote FS this
    helper is the one seam to swap for a FileSystem.listStatus call."""
    import os

    path = os.path.join(sf_dir, "embeddings.parquet")
    files = []
    if os.path.isdir(path):
        for root, _, names in os.walk(path):
            files += [os.path.join(root, n) for n in names]
    elif os.path.exists(path):
        files = [path]
    stats = [os.stat(f) for f in sorted(files)]
    return (
        len(stats),
        sum(s.st_size for s in stats),
        max((s.st_mtime_ns for s in stats), default=0),
    )


def _reservoir_sample(e: DataFrame, cap: int) -> DataFrame:
    """Deterministic bounded training sample: keep the `cap` vectors with the
    smallest Knuth multiplicative hash of vec_id. A pure function of the
    vec_id VALUES — invariant to partitioning, file order, and row order
    (TakeOrderedAndProject plan: per-partition top-cap, tiny driver merge; no
    global sort, no full-corpus limit() first-partitions bias — VERDICT r6
    "what's wrong" #3). The id is reduced mod 2^31 BEFORE the multiply so the
    product stays < 2^62 for any int64 vec_id — the unreduced form overflows
    signed 64-bit (ANSI ARITHMETIC_OVERFLOW) past vec_id ≈ 3.47e9 (ADVICE r7).
    Ties cannot occur for distinct vec_id below 2^31 (odd multiplier mod 2^32
    is injective); vec_id itself breaks ties beyond that."""
    hk = (
        F.pmod(F.col("vec_id"), F.lit(2147483648)) * F.lit(2654435761).cast("long")
    ) % F.lit(4294967296)
    return (
        e.withColumn("_hk", hk)
        .orderBy(F.col("_hk").asc(), F.col("vec_id").asc())
        .limit(cap)
        .drop("_hk")
    )


@query(
    "llm_dedup_exact",
    oracle="""
    SELECT sha256(text) AS text_sha,
           MIN(doc_id) AS rep_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM documents GROUP BY sha256(text)
    """,
    ref="SURVEY §2 K1 (exact dedup: hash-group, one shuffle on the digest)",
)
def llm_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return dedup.exact_dedup_groups(d, "text", "doc_id")


@query(
    "llm_dedup_near",
    oracle=None,  # xxhash64 signatures are engine-specific → rows-only
    ref="SURVEY §2 K2 (MinHash+LSH banding near-dup; no n-squared pair space — "
    "operators/dedup.py:minhash_near_dups)",
)
def llm_dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    # fixture docs share a ~40-word vocabulary, so random pairs already hit
    # word-jaccard ~0.6 — 0.8 keeps only genuinely near-identical pairs, and
    # 10-row bands keep candidate generation sub-quadratic on this corpus.
    return dedup.minhash_near_dups(d, "text", "doc_id", k=40, bands=4, jaccard_threshold=0.8)


@query(
    "llm_substring_dup_spans",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    g AS (
        SELECT doc_id, CAST(i AS INT) AS pos,
               md5(array_to_string(w[i:i+7], ' ')) AS gram_md5
        FROM toks, unnest(range(1, len(w) - 6)) AS t(i)
        WHERE len(w) >= 8
    ),
    dup AS (
        SELECT gram_md5 FROM g GROUP BY gram_md5
        HAVING COUNT(DISTINCT doc_id) >= 2
    )
    SELECT g.doc_id, g.pos, g.gram_md5 FROM g JOIN dup USING (gram_md5)
    """,
    ref="SURVEY §2 K2 [EXT] (substring-level exact dedup, the Lee et al. "
    "2022 'Deduplicating Training Data' shape: every 8-word window shared "
    "verbatim by >= 2 distinct documents, with its position — the spans a "
    "substring-dedup pass would cut, vs K1/K2's whole-document decisions)",
)
def llm_substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated 8-token spans across documents: (doc_id, pos, gram_md5)
    for every window whose exact text occurs in at least two distinct docs.
    Doc-level dedup (K1) misses boilerplate INSIDE otherwise-unique pages;
    this is the span-level complement that substring dedup pipelines cut.

    Scale shape: one narrow scan → posexplode of 8-word windows; the
    frequency agg and the join-back both hash on the 16-byte md5 digest
    (never the text), and the join-back reuses the agg's partitioning —
    ONE effective wide exchange of digests. COUNT(DISTINCT doc_id) is the
    standard two-phase expand. Never a doc-pair self-join; output is
    bounded by the duplicated-span count."""
    d = load(spark, sf_dir, "documents")
    # LAZY pin (r14, guide §1.2/§2.4): `g` feeds BOTH the distinct-doc
    # frequency agg and the join-back — un-pinned the two exchange subtrees
    # differ (the agg side carries the partial count_distinct expand), so
    # ReuseExchange never fires and the scan + shingle posexplode + md5 map
    # work runs TWICE per execution (measured: 2 scans / 2 Generates in the
    # pre-pin plan). The pinned payload is (doc_id, pos, 16-byte digest) —
    # the text column never rides the pin or any exchange.
    g = scale_pin(
        d.select(
            "doc_id",
            F.posexplode(text.shingles("text", 8)).alias("pos0", "gram"),
        ).select(
            "doc_id",
            (F.col("pos0") + 1).alias("pos"),
            F.md5(F.col("gram").cast("binary")).alias("gram_md5"),
        ),
        eager=False,
    )
    dup = (
        g.groupBy("gram_md5")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("gram_md5")
    )
    return g.join(dup, "gram_md5").select("doc_id", "pos", "gram_md5")


@query(
    "llm_dedup_cluster",
    oracle=None,  # xxhash64-seeded LSH candidates -> rows-only
    ref="SURVEY §2 K2+L2 (near-dup CLUSTER resolution: LSH pair graph -> "
    "connected components -> min-id canonical per cluster. This is the "
    "keep-one step a dedup pipeline actually ships: pairs alone don't say "
    "which doc to keep when dups chain A~B~C)",
)
def llm_dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document mapped to its near-dup cluster representative
    (canonical_id = min doc_id reachable through exact-copy identity and
    LSH-verified pairs; singletons map to themselves). Filter is_canonical
    to materialize the deduplicated corpus.

    Production ordering (exact BEFORE near — the standard pipeline, e.g.
    Lee et al. 2022 "Deduplicating Training Data Makes Language Models
    Better"): identical texts collapse to one representative (min doc_id
    per sha-256 group, a digest-only exchange) and ONLY representatives
    enter the LSH pair space. Two wins at 100 TB: (a) a d-deep exact-dup
    group contributes zero within-group candidate pairs instead of d²
    (the sf100 probe's 1000-deep planted groups made d² the whole job);
    (b) exact copies can never overflow `max_bucket_size` — without the
    collapse, a group deeper than the bucket cap silently loses ALL its
    pairs (the cap's documented contract is 'exact dedup catches those' —
    this entry now actually composes that step). Identical texts have
    identical signatures, so the representative meets exactly the
    candidates any copy would; canonical ids are unchanged (each group's
    representative IS its min doc_id, so the component minimum over
    representatives equals the minimum over all copies).

    Scale: one digest agg + map-back join (sha-256 only, text never
    shuffles), pairs sub-quadratic (banded LSH over distinct texts), the
    component step O(distinct)-state label propagation."""
    from ksql_spark.queries.graph import connected_components

    d = load(spark, sf_dir, "documents")
    # Null-safe grouping key: sha2(NULL) is NULL, and the inner map-back join
    # below never matches NULL keys — a plain sha key silently DROPS every
    # NULL-text document from the output, breaking the "every document
    # mapped" contract (ADVICE r10). Each NULL-text doc gets a unique
    # synthetic key, so it forms its own singleton group (rep_id = doc_id,
    # self-canonical). NULL-text reps entering the LSH stage are harmless:
    # their word arrays are NULL, so the Jaccard verify NULLs out and no
    # pair survives the threshold.
    ids = d.select(
        "doc_id",
        F.coalesce(
            F.sha2(F.col("text"), 256),
            F.concat(F.lit("null:"), F.col("doc_id").cast("string")),
        ).alias("text_sha"),
    )
    # LAZY pins: `groups` feeds both the LSH rep filter and the copy->rep
    # map-back; `pairs`' symmetrization union consumes it twice — un-pinned,
    # each branch re-runs the whole upstream pipeline (round-8 probe).
    groups = scale_pin(
        ids.groupBy("text_sha").agg(F.min("doc_id").alias("rep_id")),
        eager=False,
    )
    pairs = scale_pin(
        dedup.minhash_near_dups(
            d,
            "text",
            "doc_id",
            k=40,
            bands=4,
            jaccard_threshold=0.8,
            reps=groups.select(F.col("rep_id").alias("doc_id")),
        ),
        eager=False,
    )
    half = pairs.select(F.col("doc_a").alias("s1"), F.col("doc_b").alias("s2"))
    adj = half.unionByName(
        half.select(F.col("s2").alias("s1"), F.col("s1").alias("s2"))
    )
    labels = connected_components(adj).withColumnsRenamed(
        {"suppkey": "rep_id", "component": "canonical_id"}
    )
    return (
        ids.join(groups, "text_sha")
        .join(labels, "rep_id", "left")
        .select(
            "doc_id",
            F.coalesce("canonical_id", "rep_id").alias("canonical_id"),
        )
        .withColumn("is_canonical", F.col("doc_id") == F.col("canonical_id"))
    )


@query(
    "llm_dedup_simhash",
    oracle=None,  # xxhash64-based fingerprint → rows-only
    ref="SURVEY §2 K2 (SimHash fingerprint buckets — operators/dedup.py:simhash32)",
)
def llm_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.col("doc_id"), dedup.simhash32("text").alias("simhash"))
        .groupBy("simhash")
        .agg(F.min("doc_id").alias("rep_id"), F.count("*").alias("n_docs"))
    )


@query(
    "llm_ngram_jaccard",
    oracle="""
    WITH sh AS (
        SELECT doc_id, source,
               list_distinct(
                   list_transform(range(1, len(string_split(text,' ')) - 1),
                       i -> string_split(text,' ')[i] || ' ' ||
                            string_split(text,' ')[i+1] || ' ' ||
                            string_split(text,' ')[i+2])) AS grams
        FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(list_filter(a.grams, x -> list_contains(b.grams, x))) AS DOUBLE)
           / CAST(len(a.grams) + len(b.grams)
                  - len(list_filter(a.grams, x -> list_contains(b.grams, x))) AS DOUBLE)
               AS jaccard
    FROM sh a JOIN sh b
      ON a.source = b.source AND a.doc_id < b.doc_id AND b.doc_id - a.doc_id <= 20
    WHERE len(a.grams) + len(b.grams)
            - len(list_filter(a.grams, x -> list_contains(b.grams, x))) > 0
      AND len(list_filter(a.grams, x -> list_contains(b.grams, x))) * 10
          >= len(a.grams) + len(b.grams)
            - len(list_filter(a.grams, x -> list_contains(b.grams, x)))
    """,
    ref="SURVEY §2 K2 (exact 3-gram Jaccard on a bounded candidate set; the "
    "unbounded version goes through MinHash banding instead)",
)
def llm_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard ≥ 0.1 for candidate pairs (same source, nearby ids).
    Bounding the candidate set keeps this exact form scannable; at scale the
    candidate generation is LSH (llm_dedup_near), not a blocked self-join."""
    d = load(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id", "source", F.array_distinct(text.shingles("text", 3)).alias("grams")
    )
    # id-bucket fan-out on the equi-key (round-8 probe, bit-exact — same
    # rationale as llm_ngram_containment): b in (a, a+20] lives in a's
    # bucket or the next one, so 2 probe rows bound candidates to ~20/doc
    # instead of the same-source product.
    bucket = F.floor(F.col("doc_id") / 20)
    a = sh.withColumn("probe", F.explode(F.array(bucket, bucket + 1))).alias("a")
    b = sh.withColumn("bucket", bucket).alias("b")
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    union = F.size(F.col("a.grams")) + F.size(F.col("b.grams")) - inter
    return (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.probe") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("b.doc_id") - F.col("a.doc_id") <= 20),
        )
        # union > 0 first: a pair of sub-3-word docs has two EMPTY gram
        # sets — 0/0 would ANSI-abort, and "two empty docs" is not a dup
        # signal; the oracle carries the same guard.
        .where((union > 0) & (inter * 10 >= union))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
    )


@query(
    "llm_vec_norm",
    oracle=f"""
    SELECT vec_id, label,
           {_norm_sql('embedding')} AS l2_norm,
           CAST(embedding[1] AS DOUBLE) / {_norm_sql('embedding')} AS unit_dim0
    FROM embeddings
    """,
    ref="SURVEY §2 K6 (embedding norms / normalization — operators/vectors.py)",
)
def llm_vec_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    norm = vectors.l2_norm("embedding")
    return e.select(
        "vec_id",
        "label",
        norm.alias("l2_norm"),
        # try_divide: a zero vector has norm 0 — NULL (DuckDB x/0 parity),
        # not an ANSI DIVIDE_BY_ZERO job abort
        F.try_divide(
            F.col("embedding").getItem(0).cast("double"), norm
        ).alias("unit_dim0"),
    )


@query(
    "llm_sim_topk",
    oracle=f"""
    SELECT query_id, vec_id, cosine FROM (
        SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
               {_dot_sql('q.embedding', 'v.embedding')}
               / ({_norm_sql('q.embedding')} * {_norm_sql('v.embedding')}) AS cosine,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {_dot_sql('q.embedding', 'v.embedding')}
                            / ({_norm_sql('q.embedding')} * {_norm_sql('v.embedding')})
                            DESC, v.vec_id) AS rn
        FROM (SELECT * FROM embeddings WHERE vec_id < 3) q
        CROSS JOIN embeddings v
        WHERE q.vec_id <> v.vec_id
    ) WHERE rn <= 5
    """,
    ref="SURVEY §2 K3 (brute-force cosine top-k baseline; scale path = LSH/IVF "
    "— ann_ivf_topk)",
)
def llm_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for each query vector (vec_id < 3).
    Query set is broadcast; the corpus scan is embarrassingly parallel."""
    e = load(spark, sf_dir, "embeddings").withColumn(
        "v_norm", vectors.l2_norm("embedding")
    )  # norm computed ONCE per corpus row, not once per (query, row) pair
    q = e.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("v_norm").alias("q_norm"),
    )
    pairs = F.broadcast(q).crossJoin(e).where(F.col("query_id") != F.col("vec_id"))
    cos = F.try_divide(
        vectors.dot("q_emb", "embedding"), F.col("q_norm") * F.col("v_norm")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        pairs.select("query_id", "vec_id", cos.alias("cosine"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .drop("rn")
    )


@query(
    "llm_hard_negatives",
    oracle=f"""
    SELECT query_id, vec_id, cosine, CAST(rn AS INT) AS rank FROM (
        SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
               {_dot_sql('q.embedding', 'v.embedding')}
               / ({_norm_sql('q.embedding')} * {_norm_sql('v.embedding')}) AS cosine,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {_dot_sql('q.embedding', 'v.embedding')}
                            / ({_norm_sql('q.embedding')} * {_norm_sql('v.embedding')})
                            DESC, v.vec_id) AS rn
        FROM (SELECT * FROM embeddings WHERE vec_id < 3) q
        CROSS JOIN embeddings v
        WHERE q.vec_id <> v.vec_id AND q.label <> v.label
    ) WHERE rn <= 3
    """,
    ref="SURVEY §2 K3/K6 [EXT] (hard-negative mining for contrastive "
    "training: per anchor, the top-3 most-similar vectors with a DIFFERENT "
    "label — the highest-loss negatives an embedding-model batch builder "
    "wants; the label-filtered sibling of llm_sim_topk)",
)
def llm_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 hard negatives per anchor (vec_id < 3): nearest-by-cosine
    vectors whose label DIFFERS from the anchor's — semantically close yet
    wrongly-labeled pairs are the informative negatives for contrastive /
    triplet training.

    Scale shape: identical to llm_sim_topk (anchors broadcast, one narrow
    corpus pass, per-anchor window) — the label predicate just rides the
    same join condition; at corpus scale the exact pass is replaced by the
    ANN entries feeding the same label filter."""
    e = load(spark, sf_dir, "embeddings").withColumn(
        "v_norm", vectors.l2_norm("embedding")
    )
    q = e.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("v_norm").alias("q_norm"),
        F.col("label").alias("q_label"),
    )
    pairs = (
        F.broadcast(q)
        .crossJoin(e)
        .where(
            (F.col("query_id") != F.col("vec_id"))
            & (F.col("q_label") != F.col("label"))
        )
    )
    cos = F.try_divide(
        vectors.dot("q_emb", "embedding"), F.col("q_norm") * F.col("v_norm")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        pairs.select("query_id", "vec_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
    )


@query(
    "llm_tokenizer_fertility",
    oracle=r"""
    SELECT lang,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')))
                AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS DOUBLE)
           / SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')))
               AS chars_per_token
    FROM documents GROUP BY lang
    """,
    ref="SURVEY §2 K4 [EXT] (tokenizer fertility: characters per BPE-ish "
    "token by language — the standard metric for how (un)fairly a tokenizer "
    "treats each language in a multilingual corpus; ratio of two exact "
    "integer sums, so the double division is bit-stable)",
)
def llm_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Characters per token by language under the shared BPE-ish regex —
    high fertility = the tokenizer fragments that language into more, less
    meaningful pieces (costlier context, worse downstream quality).

    Scale shape: one narrow scan + one |langs|-row hash agg; both sums are
    exact integers, so the final division is partition-order invariant
    without quantization."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.sum("n_chars").alias("total_chars"),
        F.sum(text.token_count("text").cast("long")).alias("total_tokens"),
        F.try_divide(
            F.sum("n_chars").cast("double"),
            F.sum(text.token_count("text").cast("long")),
        ).alias("chars_per_token"),
    )


@query(
    "llm_emb_cosine_dup",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
           {_dot_sql('a.embedding', 'b.embedding')}
           / ({_norm_sql('a.embedding')} * {_norm_sql('b.embedding')}) AS cosine
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_dot_sql('a.embedding', 'b.embedding')}
          / ({_norm_sql('a.embedding')} * {_norm_sql('b.embedding')}) > 0.9
    """,
    ref="SURVEY §2 K2/K6 (embedding-cosine near-dup within label blocks; "
    "unblocked version uses random-projection LSH)",
)
def llm_emb_cosine_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").withColumn(
        "v_norm", vectors.l2_norm("embedding")
    )  # per-row norm precomputed before the pair join (3x less fold work)
    a, b = e.alias("a"), e.alias("b")
    # try_divide: zero-norm vectors must yield NULL cosine (filtered by the
    # threshold), not an ANSI DIVIDE_BY_ZERO job abort; DuckDB x/0 is NULL
    # too, so the oracle comparison is unchanged.
    cos = F.try_divide(
        vectors.dot(F.col("a.embedding"), F.col("b.embedding")),
        F.col("a.v_norm") * F.col("b.v_norm"),
    )
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label"),
            cos.alias("cosine"),
        )
        .where(F.col("cosine") > 0.9)
    )


def _ivf_coarse(
    spark: SparkSession, sf_dir: str, K: int = 16, sample_cap: int = 4096
) -> tuple[list, int]:
    """Fixed-K coarse quantizer over the embeddings table, cached per
    (sf_dir, fingerprint): the deterministic Knuth-hash reservoir sample
    (<= sample_cap vectors, corpus-order-invariant) fit by seeded MLlib
    KMeans on one vec_id-sorted partition — centroids are a pure function
    of the data and INDEPENDENT of corpus size. Shared by ann_ivf_topk
    and the IVF-tier decontamination sibling so both probe the same
    cells. Returns ([(cent_id, [floats])], n_sample)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    e = load(spark, sf_dir, "embeddings")
    cache_key = ("ivf", sf_dir, _emb_fingerprint(sf_dir))
    cached = _CENTROID_CACHE.get(cache_key)
    if cached is None:
        sample = (
            _reservoir_sample(e.select("vec_id", "embedding"), sample_cap)
            .coalesce(1)
            .sortWithinPartitions("vec_id")
            .select(
                array_to_vector(F.col("embedding").cast("array<double>")).alias("vec")
            )
            .cache()
        )
        n_sample = sample.count()
        k = min(K, max(1, n_sample))
        model = KMeans(k=k, seed=42, maxIter=20, featuresCol="vec").fit(sample)
        sample.unpersist()
        cent_rows = [
            (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
        ]
        _CENTROID_CACHE[cache_key] = (cent_rows, n_sample)
    else:
        cent_rows, n_sample = cached
    return cent_rows, n_sample


@query(
    "ann_ivf_topk",
    oracle=None,  # pruned search ≠ exact → rows-only; recall tested in tests/
    ref="SURVEY §2 K3 (IVF-style ANN: FIXED-K coarse quantizer → cell "
    "assignment → probe nprobe cells only; the 100 TB similarity-search path)",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5 with a fixed-K coarse quantizer (VERDICT r02
    item 3): K=16 centroids from MLlib KMeans fit on a BOUNDED sample
    (<= 4096 vectors), so K is independent of corpus size. The broadcast side
    is O(K * dim) constant and cell assignment is O(n * K) — linear in n,
    never the old O(n²/50) of corpus-proportional centroids. Cells are
    assigned by squared-L2 distance (the classic IVF metric — matches what
    KMeans optimized); each query probes its 4 nearest cells, so search cost
    is O(n * nprobe / K) candidate pairs. Measured recall@5 = 0.80 at sf0.01
    vs exact brute force (gate >= 0.5, ann_ivf_recall).

    The training sample is a deterministic Knuth-hash reservoir (smallest-
    hash SAMPLE_CAP vectors — _reservoir_sample): unlike the old limit(), it
    is a corpus-wide draw provably independent of partition/file order
    (tests/test_llm_quality.py::test_ivf_sample_order_invariant), so a skewed first
    file cannot bias the quantizer at 100 TB. The sample is coalesced to one
    vec_id-sorted partition before the seeded fit, making the centroids a
    pure function of the data. At 100 TB the only change is a larger fixed K
    (e.g. 4096) — the quantizer stays independent of n.

    Cross-path agreement law (VERDICT r7 item 3, pinned by
    tests/test_llm_quality.py::test_ann_paths_cross_agreement): avg top-5
    overlap with the oracle-exact ann_ivf_topk_portable >= 0.4 (measured
    0.60) and recall vs exact within 0.2 of the portable sibling's."""
    K, NPROBE = 16, 4
    e = load(spark, sf_dir, "embeddings")
    cent_rows, n_sample = _ivf_coarse(spark, sf_dir)
    # Flat-search fallback (every production ANN index has one): below ~64
    # vectors/cell the cell pruning saves nothing and costs recall — probe
    # ALL cells (exact search) for tiny corpora. n_sample is capped at
    # SAMPLE_CAP, so this can only trigger for corpora smaller than
    # 64*K=1024 vectors; at any real scale nprobe stays NPROBE.
    nprobe = K if n_sample < 64 * K else NPROBE
    cents = spark.createDataFrame(cent_rows, "cent_id int, cent_emb array<double>")

    # Cell assignment as the zero-exchange HOF argmin (_ivf_cell_of): the
    # previous crossJoin(K cents) + row_number window shuffled and sorted
    # n×K rows WITH the embedding payload just to pick each row's minimum.
    # The fold computes the same squared-L2 doubles (same zip_with/aggregate
    # spelling as vectors.l2_sq_dist) with the same (dist asc, cent_id asc)
    # tie-break, in one narrow pass — assignments are bit-identical.
    from ksql_spark.queries.curation import _ivf_cell_of

    # r14 (guide §1.2 per-task work, the matryoshka device): both norms are
    # one-side functions but sat inside the per-pair cosine — each 64-dim
    # norm fold re-ran once per (query, candidate) row. Projected once per
    # row on each join input instead; same expression over the same values,
    # so the cosine doubles are bit-identical.
    assigned = e.select(
        "vec_id",
        "embedding",
        _ivf_cell_of(cent_rows, F.col("embedding")).alias("cent_id"),
        vectors.l2_norm("embedding").alias("e_n"),
    )
    q = e.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        vectors.l2_norm("embedding").alias("q_n"),
    )
    probe_w = Window.partitionBy("query_id").orderBy(F.col("qd").asc(), F.col("cent_id"))
    probes = (
        q.crossJoin(F.broadcast(cents))
        .select(
            "query_id", "q_emb", "q_n", "cent_id",
            vectors.l2_sq_dist("q_emb", "cent_emb").alias("qd"),
        )
        .withColumn("prn", F.row_number().over(probe_w))
        .where(F.col("prn") <= nprobe)
        .select("query_id", "q_emb", "q_n", "cent_id")
    )
    cos = F.try_divide(
        vectors.dot("q_emb", "embedding"),
        F.col("q_n") * F.col("e_n"),
    )
    topk_w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        probes.join(assigned, "cent_id")
        .where(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id", cos.alias("cosine"))
        .withColumn("rn", F.row_number().over(topk_w))
        .where(F.col("rn") <= 5)
        .drop("rn")
    )


@query(
    "ann_lsh_topk",
    oracle=None,  # LSH bucketing is approximate → rows-only; recall tested in tests/
    ref="SURVEY §2 K3 (random-projection LSH ANN via MLlib "
    "BucketedRandomProjectionLSH — the other 100 TB similarity-search path)",
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approx top-5 neighbors for query vectors via MLlib's random-projection
    LSH (approxSimilarityJoin = bucket-join, never the full n*m pair space).
    Output: (query_id, vec_id, dist) — euclidean distance, deterministic given
    the fixed seed.

    Cross-path agreement law (VERDICT r7 item 3, pinned by
    tests/test_llm_quality.py::test_ann_paths_cross_agreement): avg top-5
    overlap with the oracle-exact ann_lsh_topk_portable >= 0.5 (measured
    0.80), on top of the >= 0.5 recall gate vs exact (ann_lsh_recall)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    e = load(spark, sf_dir, "embeddings").withColumn(
        "vec", array_to_vector(F.col("embedding").cast("array<double>"))
    )
    model = BucketedRandomProjectionLSH(
        inputCol="vec", outputCol="hashes", bucketLength=2.0, numHashTables=4, seed=42
    ).fit(e)
    q = e.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("q_vec")
    )
    joined = model.approxSimilarityJoin(
        q.withColumnRenamed("q_vec", "vec"), e, 3.0, distCol="dist"
    )
    pairs = joined.select(
        F.col("datasetA.query_id").alias("query_id"),
        F.col("datasetB.vec_id").alias("vec_id"),
        "dist",
    ).where(F.col("query_id") != F.col("vec_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("dist"), F.col("vec_id"))
    return pairs.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 5).drop("rn")


def _ann_recall(spark, sf_dir, approx_builder, threshold: float) -> DataFrame:
    """Tolerance-oracle helper (same pattern as agg_approx_distinct): compute
    average recall@k of an ANN variant against the exact brute-force top-k in
    ONE relational plan and emit a boolean the oracle asserts TRUE. A recall
    regression (bad centroids, broken banding) hash-mismatches the row."""
    exact = llm_sim_topk(spark, sf_dir).select("query_id", "vec_id")
    approx = approx_builder(spark, sf_dir).select("query_id", "vec_id")
    per_q = (
        exact.join(approx.withColumnRenamed("vec_id", "a_vec"),
                   on="query_id")
        .groupBy("query_id")
        .agg(
            (F.count_distinct(
                F.when(F.col("vec_id") == F.col("a_vec"), F.col("vec_id"))
            ) / F.count_distinct("vec_id")).alias("recall")
        )
    )
    return per_q.agg(
        F.count("*").alias("n_queries"),
        (F.avg("recall") >= F.lit(threshold)).alias("avg_recall_ok"),
    )


_ANN_RECALL_ORACLE = """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, TRUE AS avg_recall_ok
    FROM embeddings WHERE vec_id < 3
    """


@query(
    "ann_ivf_recall",
    oracle=_ANN_RECALL_ORACLE,
    ref="SURVEY §2 K3 (IVF quality gate: avg recall@5 vs exact brute-force "
    ">= 0.5, measured 0.80 at sf0.01 — tolerance oracle, the sketch itself "
    "is engine-specific)",
)
def ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ann_recall(spark, sf_dir, ann_ivf_topk, 0.5)


@query(
    "ann_lsh_recall",
    oracle=_ANN_RECALL_ORACLE,
    ref="SURVEY §2 K3 (LSH quality gate: avg recall@5 vs exact brute-force "
    ">= 0.5, measured 0.93 at sf0.01 — tolerance oracle)",
)
def ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ann_recall(spark, sf_dir, ann_lsh_topk, 0.5)


@query(
    "llm_text_stats",
    oracle=f"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           {sql_davg("len(string_split(text, ' '))")} AS avg_words,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           {sql_davg("len(list_distinct(string_split(text, ' '))) * 1.0 "
                     "/ len(string_split(text, ' '))")} AS avg_uniq_ratio
    FROM documents GROUP BY lang
    """,
    ref="SURVEY §2 K4 (corpus text stats per language — operators/text.py)",
)
def llm_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        davg(text.word_count("text").cast("double")).alias("avg_words"),
        F.sum("n_chars").alias("total_chars"),
        davg(text.unique_word_ratio("text")).alias("avg_uniq_ratio"),
    )


@query(
    "llm_token_count",
    oracle=r"""
    SELECT source,
           CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')))
                AS BIGINT) AS total_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY source
    """,
    ref="SURVEY §2 K4 (BPE-ish regex token counting — operators/text.py:token_count)",
)
def llm_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.sum(text.token_count("text").cast("long")).alias("total_tokens"),
        F.count("*").alias("n_docs"),
    )


@query(
    "llm_quality_score",
    oracle="""
    SELECT doc_id,
           0.4 * least(1.0, len(string_split(text,' ')) / 100.0)
           + 0.3 * (len(list_distinct(string_split(text,' '))) * 1.0
                    / len(string_split(text,' ')))
           + 0.3 * (len(list_filter(string_split(text,' '),
                        x -> x IN ('the','a','of','and','to','in','is'))) * 1.0
                    / len(string_split(text,' '))) AS quality
    FROM documents
    """,
    ref="SURVEY §2 K4 (quality heuristic: length/diversity/stopword ratios — "
    "operators/text.py:quality_score)",
)
def llm_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", text.quality_score("text").alias("quality"))


@query(
    "llm_lang_id",
    oracle="""
    SELECT lang,
           CASE WHEN len(list_filter(string_split(text,' '),
                         x -> x IN ('the','a','of'))) > 0
                THEN 'en' ELSE 'unk' END AS predicted,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY lang, predicted
    """,
    ref="SURVEY §2 K4 (language-ID heuristic vs labeled lang — "
    "operators/text.py:lang_guess)",
)
def llm_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        d.select("lang", text.lang_guess("text").alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n_docs"))
    )


@query(
    "llm_tfidf",
    oracle="""
    WITH tf AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents
    ), tf_counts AS (
        SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tf GROUP BY doc_id, word
    ), dfreq AS (
        SELECT word, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        FROM tf GROUP BY word
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT doc_id, word, tf,
           CAST(CAST(trunc(
               tf * ln((CAST(n_docs AS DOUBLE) + 1.0) / (CAST(df AS DOUBLE) + 1.0))
               * 1000000 + 0.5) AS BIGINT) AS DOUBLE) / 1000000.0 AS tfidf
    FROM tf_counts JOIN dfreq USING (word) CROSS JOIN n
    WHERE tf >= 3
    """,
    ref="SURVEY §2 K4 (tf-idf, exact relational formulation: explode → tf per "
    "(doc,word) → df per word → smooth-idf weight; HashingTF+IDF is the "
    "hashed-feature variant of the same shuffle shape)",
)
def llm_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact TF-IDF (tf >= 3 to keep output bounded). Plan: one explode, two
    hash aggs (doc,word) and (word), plus a 1-row count aggregate cross-joined
    in (AQE broadcasts it) — the same shape at 100 TB with the word-level agg
    as the only wide shuffle. The doc count stays relational: building the
    DataFrame triggers zero Spark jobs (an eager d.count() here would full-scan
    the corpus at plan-build time)."""
    d = load(spark, sf_dir, "documents")
    words_df = d.select("doc_id", F.explode(text.words("text")).alias("word"))
    tf = words_df.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    dfreq = words_df.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count("*").cast("double").alias("n_docs"))
    return (
        tf.join(dfreq, "word")
        .where(F.col("tf") >= 3)
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "word",
            "tf",
            # libm ln() differs by 1 ulp between JVM and DuckDB → quantize the
            # weight to 6 decimals (same trunc spelling both sides)
            (
                (
                    F.col("tf")
                    * F.log(
                        (F.col("n_docs") + 1.0) / (F.col("df").cast("double") + 1.0)
                    )
                    * 1000000.0
                    + 0.5
                )
                .cast("long")
                .cast("double")
                / 1000000.0
            ).alias("tfidf"),
        )
    )


@query(
    "llm_length_histogram",
    oracle="""
    SELECT CAST(CASE WHEN n_chars < 0 THEN 0
                     WHEN n_chars >= 1000 THEN 21
                     ELSE CAST(floor(n_chars / 50.0) AS INT) + 1 END AS INT)
               AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents GROUP BY bucket
    """,
    ref="SURVEY §2 K4 (corpus length histogram — width_bucket; the standard "
    "pre-filter diagnostic before length-based quality cuts)",
)
def llm_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.groupBy(
        F.width_bucket("n_chars", F.lit(0), F.lit(1000), F.lit(20))
        .cast("int")
        .alias("bucket")
    ).agg(
        F.count("*").alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


#: permille kept per language stratum (eval-split staple)
_STRATA_PERMILLE = {"en": 500, "es": 250, "zh": 250, "de": 100, "fr": 100}


@query(
    "llm_sample_stratified",
    oracle=f"""
    SELECT doc_id, lang FROM documents
    WHERE ((doc_id % 2147483648) * 2654435761) % 4294967296 % 1000 <
          CASE lang {' '.join(f"WHEN '{k}' THEN {v}" for k, v in _STRATA_PERMILLE.items())}
               ELSE 0 END
    """,
    ref="SURVEY §2 K [EXT] (stratified sampling via a PORTABLE deterministic "
    "hash — Knuth multiplicative on the key, exact int64 math both engines. "
    "Better than engine-RNG sampleBy for corpus pipelines: the split is "
    "reproducible across engines/runs/partitionings, membership is decidable "
    "per row with no shuffle, and it became oracle-checkable)",
)
def llm_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep ~frac of each lang stratum: hash(doc_id) mod 1000 < permille[lang].
    Narrow filter, no shuffle, no RNG state — at 100 TB the sample is stable
    under retries/reshuffles, which seeded sampleBy cannot guarantee.

    The key is reduced mod 2^31 BEFORE the Knuth multiply so the product
    stays below 2^63 for any int64 doc_id — (2^31-1) * 2654435761 ≈ 5.7e18
    (mod 2^32 would NOT suffice: ~1.14e19 wraps in Spark while DuckDB
    errors — ADVICE r02). Same spelling both engines."""
    d = load(spark, sf_dir, "documents")
    bucket = (
        (F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761)
    ) % F.lit(4294967296) % F.lit(1000)
    threshold = F.coalesce(
        F.element_at(
            F.create_map(
                *[F.lit(x) for kv in _STRATA_PERMILLE.items() for x in kv]
            ),
            F.col("lang"),
        ),
        F.lit(0),
    )
    return d.where(bucket < threshold).select("doc_id", "lang")


@query(
    "llm_fingerprint",
    oracle="""
    SELECT doc_id,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(text, ' '),
                   w -> CAST(ascii(w) * 31 + length(w) AS BIGINT))),
               (acc, c) -> (acc * 131 + c) % 1000000007) AS fingerprint
    FROM documents
    """,
    ref="SURVEY §2 K4 (rolling polynomial document fingerprint — "
    "operators/text.py:fingerprint; exact integer math, engine-portable)",
)
def llm_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", text.fingerprint("text").alias("fingerprint"))


@query(
    "llm_multimodal_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS byte_len,
           sha256(text) AS content_sha
    FROM documents
    """,
    ref="SURVEY §2 K5 (multimodal column convention: binary payload + typed "
    "metadata + content address — operators/multimodal.py)",
)
def llm_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = multimodal.attach_payload(load(spark, sf_dir, "documents"), "text")
    return d.select(
        "doc_id",
        F.col("media_meta.byte_len").alias("byte_len"),
        F.col("media_meta.content_sha").alias("content_sha"),
    )


@query(
    "llm_multimodal_features",
    oracle="""
    SELECT doc_id,
           CAST(9 + length(CAST(16 + n_chars % 48 AS VARCHAR))
                  + length(CAST(16 + (n_chars * 7) % 48 AS VARCHAR))
                  + 3 * (16 + n_chars % 48) * (16 + (n_chars * 7) % 48)
               AS INT) AS byte_len,
           CAST(16 + n_chars % 48 AS INT) AS width,
           CAST(16 + (n_chars * 7) % 48 AS INT) AS height
    FROM documents
    """,
    ref="SURVEY §2 K5 [EXT] (the PRODUCTION extract_features operator made "
    "oracle-exact, round 6: real synthetic PPM payloads — dims from "
    "n_chars, 'P6\\n{w} {h}\\n255\\n' header + 3wh pixel bytes — flow "
    "through the Arrow mapInPandas sniff cascade (netpbm branch of "
    "sniff_image_dims), so byte_len/width/height are closed-form; the "
    "content_sha column stays Spark-side only — DuckDB 1.0 sha256 can't "
    "hash BLOBs — and is verified by llm_multimodal_meta + unit goldens. "
    "Sniffing over ARBITRARY bytes (PNG/GIF/BMP/JPEG/stub) remains "
    "covered by fixture goldens in tests/test_streaming.py)",
)
def llm_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = multimodal.synth_payload_ppm(load(spark, sf_dir, "documents"))
    return multimodal.extract_features(d).select(
        "doc_id", "byte_len", "width", "height"
    )


@query(
    "llm_multimodal_resize",
    oracle="""
    SELECT doc_id,
           CAST(16 + n_chars % 48 AS INT) AS width,
           CAST(16 + (n_chars * 7) % 48 AS INT) AS height,
           CAST(list_sum(flatten(flatten(list_transform(range(0, 8), yt ->
               list_transform(range(0, 8), xt ->
                   list_transform(range(0, 3), c ->
                       (((xt * (16 + n_chars % 48)) // 8) * 3
                        + ((yt * (16 + (n_chars * 7) % 48)) // 8) * 7
                        + c) % 256)))))) AS BIGINT) AS resized_sum
    FROM documents
    """,
    ref="SURVEY §2 K5 [EXT] (REAL pixel transform, oracle-exact: synthesize "
    "a binary PPM per doc (dims from n_chars, pixel = (3x+7y+c) mod 256), "
    "round-trip encode -> netpbm header parse -> numpy nearest-neighbor "
    "resize to 8x8 -> pixel sum; the floor mapping src=(dst*extent)//8 "
    "makes the expected sum a closed-form integer the oracle states "
    "directly — the first multimodal entry whose PIXEL path, not just its "
    "metadata, is cross-engine verified)",
)
def llm_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.synth_ppm_resize(
        load(spark, sf_dir, "documents"), out_w=8, out_h=8
    )


@query(
    "llm_multimodal_frames",
    oracle="""
    WITH p AS (
        SELECT doc_id,
               8 + n_chars % 8 AS w,
               8 + (n_chars * 3) % 8 AS h,
               4 + n_chars % 5 AS nf
        FROM documents WHERE doc_id < 50
    )
    SELECT doc_id,
           CAST((i * nf) // 4 AS INT) AS frame_idx,
           CAST(list_sum(flatten(list_transform(range(0, h), y ->
               list_transform(range(0, w), x ->
                   (7 * x + 11 * y + 31 * ((i * nf) // 4)) % 256))))
             AS BIGINT) AS frame_sum
    FROM p, unnest(range(0, 4)) AS t(i)
    """,
    ref="SURVEY §2 K5 [EXT] (the PRODUCTION sample_frames operator made "
    "oracle-exact, round 6: real synthetic Y4M payloads — frame count/dims "
    "from n_chars, frame f pixel (7x+11y+31f) mod 256 — flow through the "
    "operator's own container sniff, FRAME-marker decode, and floor-mapped "
    "even sampling src=(i*nf)//4, emitting closed-form luma sums; "
    "frame_sha stays Spark-side only (not SQL-hashable) and is pinned by "
    "tests/test_streaming.py's hashlib recomputation; the STUB fallback "
    "path keeps its own unit coverage)",
)
def llm_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = multimodal.synth_payload_y4m(
        load(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    )
    return multimodal.sample_frames(d, n_frames=4).select(
        "doc_id", "frame_idx", "frame_sum"
    )


@query(
    "llm_multimodal_framesample",
    oracle="""
    WITH p AS (
        SELECT doc_id,
               8 + n_chars % 8 AS w,
               8 + (n_chars * 3) % 8 AS h,
               4 + n_chars % 5 AS nf
        FROM documents
    )
    SELECT doc_id,
           CAST((i * nf) // 3 AS INT) AS frame_idx,
           CAST(list_sum(flatten(list_transform(range(0, h), y ->
               list_transform(range(0, w), x ->
                   (7 * x + 11 * y + 31 * ((i * nf) // 3)) % 256))))
             AS BIGINT) AS frame_sum
    FROM p, unnest(range(0, 3)) AS t(i)
    """,
    ref="SURVEY §2 K5 [EXT] (REAL video frame sampling, oracle-exact: "
    "synthesize a genuine monochrome YUV4MPEG2 stream per doc (frame count/"
    "dims from n_chars, frame f pixel = (7x+11y+31f) mod 256), round-trip "
    "encode -> FRAME-marker walk decode -> evenly-spaced floor-mapped "
    "sample of 3 frames -> pixel sum per sampled frame; the video "
    "counterpart of llm_multimodal_resize)",
)
def llm_multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.synth_y4m_frame_sample(
        load(spark, sf_dir, "documents"), n_out=3
    )


@query(
    "llm_multimodal_audio",
    oracle="""
    SELECT doc_id,
           CAST(1 + n_chars % 2 AS INT) AS n_channels,
           CAST(CASE n_chars % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                WHEN 2 THEN 22050 ELSE 44100 END AS INT) AS sample_rate,
           CAST(100 + n_chars % 400 AS BIGINT) AS n_samples,
           CAST((100 + n_chars % 400) * 1000
                // (CASE n_chars % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                    WHEN 2 THEN 22050 ELSE 44100 END) AS BIGINT) AS duration_ms
    FROM documents
    """,
    ref="SURVEY §2 K5 [EXT] (REAL audio round-trip, oracle-exact: write a "
    "genuine RIFF/WAV per doc via stdlib wave (channels/rate/frames from "
    "n_chars), decode the actual bytes back with the same stdlib reader "
    "extract_audio_meta uses, emit the recovered metadata — closes the "
    "audio corner of K5 the way resize/framesample close image/video)",
)
def llm_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.synth_wav_meta(load(spark, sf_dir, "documents"))


@query(
    "llm_decontaminate",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    g AS (
        SELECT doc_id,
               unnest(list_distinct(
                   list_transform(range(1, len(w) - 3),
                                  i -> array_to_string(w[i:i+4], ' ')))) AS gram
        FROM toks
    ),
    eg AS (SELECT DISTINCT doc_id AS eval_id, gram FROM g WHERE doc_id % 29 = 0),
    cg AS (SELECT doc_id, gram FROM g WHERE doc_id % 29 <> 0)
    SELECT cg.doc_id AS doc_id,
           COUNT(DISTINCT cg.gram) AS n_shared_grams,
           COUNT(DISTINCT eg.eval_id) AS n_eval_hits
    FROM cg JOIN eg ON cg.gram = eg.gram
    GROUP BY cg.doc_id
    """,
    ref="SURVEY §2 K [EXT] (benchmark decontamination: flag training docs "
    "sharing any word-5-gram with the held-out eval split — the standard "
    "n-gram-collision test-set-overlap check in LLM corpus pipelines)",
)
def llm_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval n-gram decontamination. Eval split = doc_id % 29 == 0 (a
    stand-in for an external benchmark table; the operator shape is the same).

    Plan shape (scale-critical): both sides are a narrow scan -> 5-gram
    explode; the EVAL side is tiny (a benchmark is ~1e3-1e5 docs regardless
    of corpus size), so its distinct (eval_id, gram) set is BROADCAST and the
    100 TB corpus side never shuffles on gram — the only wide exchange is the
    final groupBy on doc_id, bounded by contaminated rows. Never a corpus
    self-join.
    """
    d = load(spark, sf_dir, "documents")
    grams5 = F.array_distinct(text.shingles("text", 5))
    eval_g = (
        d.where(F.col("doc_id") % 29 == 0)
        .select(F.col("doc_id").alias("eval_id"), F.explode(grams5).alias("gram"))
        .distinct()
    )
    corpus_g = d.where(F.col("doc_id") % 29 != 0).select(
        "doc_id", F.explode(grams5).alias("gram")
    )
    return (
        corpus_g.join(F.broadcast(eval_g), "gram")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("gram").alias("n_shared_grams"),
            F.countDistinct("eval_id").alias("n_eval_hits"),
        )
    )


@query(
    "llm_domain_mix",
    oracle="""
    WITH c AS (SELECT source, COUNT(*) AS n_orig FROM documents GROUP BY source),
    m AS (SELECT MIN(n_orig) AS n_min FROM c)
    SELECT d.source AS source, c.n_orig AS n_orig,
           COUNT(*) AS n_kept
    FROM documents d JOIN c USING (source), m
    WHERE ((d.doc_id % 2147483648) * 2654435761) % 4294967296 % 1000
          * c.n_orig < 1000 * m.n_min
    GROUP BY d.source, c.n_orig
    """,
    ref="SURVEY §2 K [EXT] (domain-mix rebalancing: deterministic downsample "
    "of every source domain to the smallest domain's size — the uniform-mix "
    "special case of weighted corpus mixing)",
)
def llm_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebalance the corpus to a uniform domain mix: keep each document iff
    its portable Knuth-hash permille bucket falls under ceil-free exact rate
    n_min/n_source (integer cross-multiplied — no float rate, no rounding
    divergence between engines; same mod-2^31 overflow guard as
    llm_sample_stratified).

    Plan shape: per-source counts are a tiny aggregate (|domains| rows) that
    BROADCASTS back onto the corpus scan, so membership is decided in one
    narrow pass — no shuffle of the 100 TB side, stable under retries (unlike
    RNG sampleBy). Rates below 1/1000 round down to keeping nothing of that
    domain (permille granularity; widen the bucket modulus if a mix needs
    finer rates — watch the int64 headroom: bucket * n_orig must stay under
    2^63).
    """
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("n_orig"))
    n_min = counts.agg(F.min("n_orig").alias("n_min"))
    bucket = (
        (F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761)
    ) % F.lit(4294967296) % F.lit(1000)
    return (
        d.join(F.broadcast(counts), "source")
        .crossJoin(F.broadcast(n_min))
        .where(bucket * F.col("n_orig") < F.lit(1000) * F.col("n_min"))
        .groupBy("source", "n_orig")
        .agg(F.count("*").alias("n_kept"))
    )


@query(
    "llm_temperature_mix",
    oracle="""
    WITH c AS (SELECT source, COUNT(*) AS n_orig FROM documents GROUP BY source),
    m AS (SELECT MIN(n_orig) AS n_min FROM c)
    SELECT d.source AS source, c.n_orig AS n_orig,
           COUNT(*) AS n_kept
    FROM documents d JOIN c USING (source), m
    WHERE ((d.doc_id % 2147483648) * 2654435761) % 4294967296 % 1000
          * (((d.doc_id % 2147483648) * 2654435761) % 4294967296 % 1000)
          * c.n_orig < 1000000 * m.n_min
    GROUP BY d.source, c.n_orig
    """,
    ref="SURVEY §2 K [EXT] (temperature-based source mixing, the alpha=0.5 "
    "multilingual-sampling rebalance: keep-rate sqrt(n_min/n_s) flattens "
    "big sources toward — not all the way to — uniform, preserving "
    "sqrt(n_min*n_s) docs per source; llm_domain_mix is the full-flatten "
    "alpha=0 special case)",
)
def llm_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature (alpha = 0.5) source rebalance: keep each document with
    deterministic rate sqrt(n_min / n_source) — big sources are damped by
    the square root instead of flattened outright, the standard temperature
    trade-off between diversity and respecting natural abundance (expected
    kept per source = sqrt(n_min * n_source), the geometric mean).

    The sqrt never touches a float: `bucket < 1000*sqrt(n_min/n_s)` is
    evaluated as the INTEGER cross-square `bucket^2 * n_s < 10^6 * n_min`
    (bucket is the portable Knuth-hash permille, so bucket^2 <= ~1e6 and
    the product stays far under 2^63 for any real per-source count).

    Plan shape: identical to llm_domain_mix — per-source counts broadcast
    back, membership decided in one narrow pass over the corpus, no shuffle
    of the big side, retry-stable (no RNG)."""
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("n_orig"))
    n_min = counts.agg(F.min("n_orig").alias("n_min"))
    bucket = (
        (F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761)
    ) % F.lit(4294967296) % F.lit(1000)
    return (
        d.join(F.broadcast(counts), "source")
        .crossJoin(F.broadcast(n_min))
        .where(bucket * bucket * F.col("n_orig") < F.lit(1000000) * F.col("n_min"))
        .groupBy("source", "n_orig")
        .agg(F.count("*").alias("n_kept"))
    )


@query(
    "llm_boilerplate_ngrams",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    g AS (
        SELECT doc_id,
               unnest(list_distinct(
                   list_transform(range(1, len(w) - 1),
                                  i -> array_to_string(w[i:i+2], ' ')))) AS gram
        FROM toks
    )
    SELECT gram, CAST(COUNT(*) AS BIGINT) AS doc_freq
    FROM g GROUP BY gram HAVING COUNT(*) >= 3
    """,
    ref="SURVEY §2 K [EXT] (boilerplate detection: corpus-frequent word "
    "3-grams by document frequency — the frequent-lines/frequent-ngrams "
    "pass used to strip headers, footers and navigation chrome from "
    "web-crawl training corpora)",
)
def llm_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide frequent-n-gram (boilerplate) detector: distinct 3-grams
    per document, grouped by gram, kept where document frequency >= 3.

    Plan shape (scale-critical): narrow scan -> shingle explode -> ONE
    hash-aggregate shuffle keyed on the gram string. No self-join, no
    collect; the reduce side is |distinct grams| not |corpus|, and map-side
    partial counts collapse per-partition repeats before the exchange. At
    100 TB you'd add a cheap frequency pre-filter (count-min or a first
    pass dropping hapax grams via partial-agg early exit) — the relational
    shape is unchanged."""
    d = load(spark, sf_dir, "documents")
    grams = F.array_distinct(text.shingles("text", 3))
    return (
        d.select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("doc_freq"))
        .where(F.col("doc_freq") >= 3)
    )


@query(
    "llm_dup_stats",
    oracle="""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 5 = 0
    ),
    c AS (SELECT sha256(text) AS h, COUNT(*) AS csize FROM corpus GROUP BY 1)
    SELECT csize,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(csize) AS BIGINT) AS n_docs,
           CAST(SUM(csize - 1) AS BIGINT) AS n_excess
    FROM c GROUP BY csize
    """,
    ref="SURVEY §2 K [EXT] (dedup audit: exact-dup cluster-size histogram — "
    "the before/after accounting every corpus dedup pass reports: how many "
    "clusters of each size, how many docs are removable)",
)
def llm_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size histogram over a corpus with a simulated
    re-crawl (every 5th document re-ingested under a new id — sf0.01 data
    has no natural dup texts, so the overlap is manufactured identically on
    both engines). Output: cluster size -> number of clusters, docs covered,
    and excess (removable) docs.

    Plan shape: two scans union'd (at 100 TB: yesterday's corpus + today's
    crawl), ONE shuffle on the 32-byte digest, then a tiny re-aggregation on
    csize (|distinct sizes| rows). Never materializes pair space."""
    d = load(spark, sf_dir, "documents")
    recrawl = d.where(F.col("doc_id") % 5 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1000000)
    )
    corpus = d.select("doc_id", "text").unionByName(recrawl.select("doc_id", "text"))
    clusters = corpus.groupBy(F.sha2("text", 256).alias("h")).agg(
        F.count("*").alias("csize")
    )
    return clusters.groupBy("csize").agg(
        F.count("*").alias("n_clusters"),
        F.sum("csize").alias("n_docs"),
        F.sum(F.col("csize") - F.lit(1)).alias("n_excess"),
    )


@query(
    "llm_cross_dedup",
    oracle="""
    WITH newbatch AS (
        SELECT doc_id + 500000 AS doc_id, text
        FROM documents WHERE doc_id % 6 = 0
        UNION ALL
        SELECT doc_id + 600000 AS doc_id, text || ' freshcontent'
        FROM documents WHERE doc_id % 6 = 3
    ),
    existing AS (SELECT DISTINCT sha256(text) AS h FROM documents)
    SELECT n.doc_id AS doc_id
    FROM newbatch n LEFT JOIN existing e ON sha256(n.text) = e.h
    WHERE e.h IS NULL
    """,
    ref="SURVEY §2 K [EXT] (cross-corpus dedup: anti-join a new crawl batch "
    "against the existing corpus on content digest — the incremental-ingest "
    "companion to within-corpus exact dedup)",
)
def llm_cross_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup: which documents of a new batch are NOT
    already in the corpus (by content digest). The batch is simulated from
    the same table — half its rows are verbatim re-downloads (dropped), half
    carry fresh content (kept) — identically on both engines.

    Plan shape: LEFT ANTI join on sha256 — both sides shuffle on the 32-byte
    digest only (the existing side projects nothing else), so at 100 TB the
    exchange carries |corpus| * 32 bytes, not the corpus text. With the
    digest column pre-materialized (the natural layout: store sha at ingest)
    it degrades to a bucketed join with zero wide exchange."""
    d = load(spark, sf_dir, "documents")
    newbatch = (
        d.where(F.col("doc_id") % 6 == 0)
        .select((F.col("doc_id") + 500000).alias("doc_id"), "text")
        .unionByName(
            d.where(F.col("doc_id") % 6 == 3).select(
                (F.col("doc_id") + 600000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" freshcontent")).alias("text"),
            )
        )
    )
    existing = d.select(F.sha2("text", 256).alias("h")).distinct()
    return (
        newbatch.withColumn("h", F.sha2("text", 256))
        .join(existing, "h", "left_anti")
        .select("doc_id")
    )


@query(
    "llm_shard_assign",
    oracle="""
    SELECT CAST(((doc_id % 2147483648) * 2654435761) % 4294967296 % 16
                AS BIGINT) AS shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1
    """,
    ref="SURVEY §2 K [EXT] (training-shard assignment: deterministic "
    "Knuth-hash sharding of the corpus into 16 balanced output shards + "
    "per-shard size accounting — the layout step before a sharded "
    "training-data write)",
)
def llm_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document to one of 16 training shards by the portable
    Knuth multiplicative hash (same mod-2^31 overflow guard as
    llm_sample_stratified), and report per-shard doc counts and byte sizes —
    the balance check before `df.write.partitionBy("shard_id")`.

    Plan shape: narrow scan -> 16-row aggregate. The real write is
    repartition("shard_id") -> partitionBy write: one shuffle keyed on the
    shard, each reducer streams one shard file. Hash sharding (vs ranges)
    keeps shards balanced regardless of doc_id distribution."""
    d = load(spark, sf_dir, "documents")
    shard = (
        ((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761))
        % F.lit(4294967296)
        % F.lit(16)
    ).cast("long")
    return (
        d.select(shard.alias("shard_id"), "n_chars")
        .groupBy("shard_id")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


_L2SQ = """
list_reduce(
    list_prepend(CAST(0.0 AS DOUBLE),
        list_transform(range(1, len({a}) + 1),
            i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))
               * (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)))),
    (acc, p) -> acc + p)
"""


def _assign_fixed_centroids(e):
    """Nearest-of-K=4-fixed-centroids assignment (centroids = embeddings of
    vec_id < 4; squared-L2, tie-broken on centroid id) — the ONE place the
    deterministic Lloyd-step arithmetic lives, shared by llm_emb_cluster and
    llm_semantic_dedup so their matching oracle spellings cannot drift
    across copies. Returns (vec_id, embedding, cent_id, cd)."""
    cents = e.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_emb")
    )
    # Zero-exchange argmin (same device as _ivf_cell_of, but the centroids
    # are DATA-derived, so they ride a one-row collect_list aggregate that
    # is broadcast onto the corpus — no build-time driver collect): the
    # previous crossJoin + row_number window shuffled AND sorted n×4 rows
    # carrying the embedding payload just to take each row's minimum.
    # Equivalence with the window form (ORDER BY cd ASC, cent_id ASC, i.e.
    # NULLS FIRST): the centroid array is sorted by cent_id, the fold keeps
    # the first NULL-distance candidate if one exists (a NULL/zero-length
    # embedding zips to a NULL distance), else the strictly-smallest cd,
    # ties resolving to the earliest = lowest cent_id. The distance is the
    # SAME vectors.l2_sq_dist expression, so cd is bit-identical. The
    # size(cents) > 0 guard reproduces the inner-join's empty-centroids
    # behaviour (no rows).
    carr = cents.agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("cent_id"), F.col("cent_emb")))
        ).alias("__cents")
    )
    dists = F.transform(
        F.col("__cents"),
        lambda c: F.struct(
            vectors.l2_sq_dist(F.col("embedding"), c["cent_emb"]).alias("cd"),
            c["cent_id"].alias("cent_id"),
        ),
    )
    init = F.struct(
        F.lit(float("inf")).alias("cd"), F.lit(-1).cast("long").alias("cent_id")
    )
    best = F.aggregate(
        dists,
        init,
        lambda acc, cand: F.when(acc["cd"].isNull(), acc)
        .when(cand["cd"].isNull(), cand)
        .when(cand["cd"] < acc["cd"], cand)
        .otherwise(acc),
    )
    return (
        e.crossJoin(F.broadcast(carr))
        .where(F.size(F.col("__cents")) > 0)
        .select("vec_id", "embedding", best.alias("__best"))
        .select(
            "vec_id",
            "embedding",
            F.col("__best.cent_id").alias("cent_id"),
            F.col("__best.cd").alias("cd"),
        )
    )


@query(
    "llm_emb_cluster",
    oracle=f"""
    WITH cents AS (
        SELECT vec_id AS cent_id, embedding AS cent_emb
        FROM embeddings WHERE vec_id < 4
    ),
    d AS (
        SELECT e.vec_id, c.cent_id,
               {_L2SQ.format(a='e.embedding', b='c.cent_emb')} AS cd
        FROM embeddings e CROSS JOIN cents c
    ),
    a AS (
        SELECT vec_id, cent_id, cd,
               row_number() OVER (PARTITION BY vec_id ORDER BY cd, cent_id) AS rn
        FROM d
    )
    SELECT cent_id, CAST(COUNT(*) AS BIGINT) AS n_members,
           {sql_davg('cd')} AS avg_dist
    FROM a WHERE rn = 1 GROUP BY cent_id
    """,
    ref="SURVEY §2 K [EXT] (corpus clustering: fixed-centroid nearest-"
    "centroid assignment over the embedding column — one deterministic "
    "Lloyd iteration, the building block of semantic corpus bucketing / "
    "topic balancing)",
)
def llm_emb_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every embedding to its nearest of K=4 FIXED centroids (the
    embeddings of vec_id < 4 — deterministic on both engines, unlike a
    KMeans fit) by squared-L2, tie-broken on centroid id; report cluster
    sizes and mean distance (quantized davg for cross-engine exactness).

    Plan shape: centroids are O(K·dim) BROADCAST; assignment is one narrow
    O(n·K) pass (never n²); the per-vector argmin window partitions on
    vec_id so it rides the same exchange-free layout; final agg is K rows.
    Identical shape to ann_ivf_topk's assignment stage — this is the
    oracle-exact anchor for that rows-only sketch."""
    assigned = _assign_fixed_centroids(load(spark, sf_dir, "embeddings"))
    return assigned.groupBy("cent_id").agg(
        F.count("*").alias("n_members"), davg("cd").alias("avg_dist")
    )


#: semantic-dedup pair-join fan-out: multiplies the (cent_id) join
#: parallelism by this bucket count with every pair kept exactly once.
_SEMDEDUP_BUCKETS = 8


@query(
    "llm_semantic_dedup",
    oracle=f"""
    WITH cents AS (
        SELECT vec_id AS cent_id, embedding AS cent_emb
        FROM embeddings WHERE vec_id < 4
    ),
    d AS (
        SELECT e.vec_id, e.embedding, c.cent_id,
               {_L2SQ.format(a='e.embedding', b='c.cent_emb')} AS cd
        FROM embeddings e CROSS JOIN cents c
    ),
    m AS (
        SELECT vec_id, embedding, cent_id FROM (
            SELECT vec_id, embedding, cent_id,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY cd, cent_id) AS rn
            FROM d
        ) WHERE rn = 1
    ),
    dropped AS (
        SELECT DISTINCT y.vec_id
        FROM m x JOIN m y ON x.cent_id = y.cent_id AND x.vec_id < y.vec_id
        WHERE {_dot_sql('x.embedding', 'y.embedding')}
              / ({_norm_sql('x.embedding')} * {_norm_sql('y.embedding')})
              >= 0.35
    )
    SELECT m.vec_id, m.cent_id,
           m.vec_id IN (SELECT vec_id FROM dropped) AS dropped
    FROM m
    """,
    ref="SURVEY §2 K2/K6 [EXT] (SemDeDup shape — Abbas et al. 2023: cluster "
    "the embedding space, then near-dup ONLY within clusters, so the pair "
    "space is n²/K instead of n²; drop rule = exists a lower-id same-"
    "cluster vector with cosine >= t. Fixed centroids keep it oracle-exact; "
    "production swaps in a KMeans fit + the same plan)",
)
def llm_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic (embedding-space) dedup, cluster-blocked: assign every
    vector to its nearest of K=4 fixed centroids (the deterministic
    llm_emb_cluster assignment), then flag `dropped` for any vector with a
    lower-id neighbor in the SAME cluster at cosine >= 0.35. The threshold
    is fixture-calibrated (these embeddings are near-uniform — max pairwise
    cosine 0.51, so 0.35 exercises the decision on ~19% of vectors; real
    corpora use ~0.95 on genuinely duplicated content).

    Scale shape — the entire point of SemDeDup: the pair join is blocked on
    cent_id, shrinking the pair space from n² to Σ_k n_k² ≈ n²/K; at 100 TB
    K grows with the corpus (KMeans centroids, ~n/1000 cells) so each
    cluster's self-join stays bounded, and the assignment pass stays the
    broadcast O(n·K) narrow scan proven by llm_emb_cluster. The drop rule
    is relational (EXISTS lower-id neighbor), not iterative, so the whole
    decision is one Catalyst plan.

    Two bit-exact pair-stage optimizations (round-8 sf1 probe: 20k vectors →
    ~50M in-cluster pairs took 11 min before, ~70 s after):
    * norms are computed ONCE PER ROW in the join inputs instead of letting
      the per-pair predicate re-evaluate both 64-dim l2_norm expressions
      50M times — same expression on the same input, so the double result
      (and the oracle hash) is unchanged;
    * the equi-join key is (cent_id, bucket): with K=4 clusters the plain
      cent_id join gives 4-way parallelism on a 32-core box; fanning the x
      side out to all _SEMDEDUP_BUCKETS y-buckets keeps every (x, y) pair
      exactly once while multiplying join parallelism by the bucket count
      (x replication is O(n·S) rows — nothing against the O(n²/K) pairs).
    """
    m = _assign_fixed_centroids(load(spark, sf_dir, "embeddings"))
    return _semantic_dedup_decide(m)


def _semantic_dedup_decide(m: DataFrame, threshold: float = 0.35) -> DataFrame:
    """SemDeDup drop decision over an assignment (vec_id, embedding,
    cent_id): flag `dropped` for any vector with a lower-id same-cluster
    neighbor at cosine >= threshold. The ONE copy of the bucket-fanned pair
    stage, shared by the oracle-exact fixed-centroid entry and the KMeans
    production entry so the two paths cannot drift.

    Pair-stage shape (round-8 sf1 probe, 11 min -> ~70 s): per-row norms
    hoisted into the join inputs; equi-join key (cent_id, bucket) fans the
    x side to all _SEMDEDUP_BUCKETS y-buckets, keeping every (x, y) pair
    exactly once while multiplying join parallelism by the bucket count."""
    S = _SEMDEDUP_BUCKETS
    x = m.select(
        F.col("cent_id").alias("x_cent"),
        F.col("vec_id").alias("x_id"),
        F.col("embedding").alias("x_emb"),
        vectors.l2_norm("embedding").alias("x_norm"),
        F.explode(F.sequence(F.lit(0), F.lit(S - 1))).alias("x_probe"),
    )
    y = m.select(
        F.col("cent_id").alias("y_cent"),
        F.col("vec_id").alias("y_id"),
        F.col("embedding").alias("y_emb"),
        vectors.l2_norm("embedding").alias("y_norm"),
        F.pmod(F.col("vec_id"), F.lit(S)).cast("int").alias("y_bucket"),
    )
    # try_divide: a zero vector has norm 0 and plain `/` would
    # DIVIDE_BY_ZERO-abort under ANSI mode; NULL >= t is false, so zero
    # vectors are simply never near-dups (DuckDB x/0 is NULL — identical).
    cos = F.try_divide(
        vectors.dot("x_emb", "y_emb"),
        F.col("x_norm") * F.col("y_norm"),
    )
    dropped = (
        x.join(
            y,
            (F.col("x_cent") == F.col("y_cent"))
            & (F.col("x_probe") == F.col("y_bucket"))
            & (F.col("x_id") < F.col("y_id")),
        )
        .where(cos >= threshold)
        .select(F.col("y_id").alias("d_id"))
        .distinct()
    )
    return (
        m.join(dropped, m["vec_id"] == dropped["d_id"], "left")
        .select(
            "vec_id", "cent_id", F.col("d_id").isNotNull().alias("dropped")
        )
    )


#: SemDeDup production cell size: K = clamp(n / cell, 4, 4096) KMeans
#: centroids, so per-cluster pair spaces stay ~cell² regardless of corpus
#: size. Measured on the round-8 sf1 probe (20k vectors): K=32 vs the
#: oracle-parity K=4 ran the identical plan 6.3x faster (210 s -> 33 s),
#: confirming the n²/K pair-space contract (SCALE.md "Pair-stage HOF
#: floors"). Round-9 cell choice: cell=512 probed 42.2 s (K=39),
#: cell=256 probed 33.9 s (K=78) — under the 40 s VERDICT target with
#: per-cluster pair spaces still ~256² (comfortably above the SemDeDup
#: paper's ~n/K≈100-1000 regime floor).
_SEMDEDUP_CELL = 256


@query(
    "llm_semantic_dedup_scaled",
    oracle=None,  # KMeans centroids ≠ SQL-expressible → rows-only; laws below
    ref="SURVEY §2 K2/K6 [EXT] (SemDeDup production path — Abbas et al. "
    "2023 §3: K grows with the corpus so each cluster's self-join stays "
    "bounded; the oracle-parity fixed-centroid twin is llm_semantic_dedup. "
    "Laws pinned in tests/test_llm_quality.py: every drop is justified by "
    "a real lower-id global neighbor at cosine >= t (precision 1.0, exact) "
    "and recall vs the global-exact drop set >= 0.5)",
    tags=("rows_only_by_design",),
)
def llm_semantic_dedup_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with the PRODUCTION codebook: K = clamp(n/256, 4, 4096)
    centroids from a seeded MLlib KMeans fit on a bounded deterministic
    sample (the same Knuth-hash reservoir as ann_ivf_topk, <= 4096 vectors,
    one sorted partition → centroids are a pure function of the data), then
    the identical bucket-fanned pair stage as the oracle-exact entry.

    Scale shape — what the fixed-K=4 oracle twin cannot give you at 100 TB:
    the pair space is Σ_k n_k² ≈ n·cell instead of n²/4, i.e. LINEAR in n at
    fixed cell size; the fit is O(sample·K) on <= 4096 vectors regardless of
    corpus size; assignment stays the broadcast O(n·K) narrow pass.

    Documented boundary (round 10): K caps at 4096 because the fit sample
    does (KMeans needs K <= sample size), so linearity holds up to
    n ≈ 4096·256 ≈ 1M vectors; beyond that the cell size — and with it the
    pair space n·cell = n²/4096 — grows again. The 100 TB device is a
    TWO-LEVEL codebook (coarse K=4096, then an independent sub-KMeans per
    coarse cell on that cell's own bounded reservoir — cells are disjoint,
    so the sub-fits parallelize and effective K = 4096·K2 with every
    broadcast still 4096 rows). Same drop decision, same laws; not wired
    here because the test corpora sit far below the boundary — this note
    is the contract for when one does not. The
    drop decision, bucket fan-out, and threshold are byte-identical code
    (_semantic_dedup_decide), so correctness evidence transfers: the twin is
    driver-checked oracle-exact, and this entry's laws pin that its drops
    are real (precision 1.0) with recall >= 0.5 vs global-exact dedup."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    SAMPLE_CAP = 4096
    e = load(spark, sf_dir, "embeddings")
    n = e.count()  # parquet metadata count — no data scan
    k_target = int(max(4, min(4096, n // _SEMDEDUP_CELL)))
    cache_key = ("semdedup", sf_dir, _emb_fingerprint(sf_dir), k_target)
    cent_rows = _CENTROID_CACHE.get(cache_key)
    if cent_rows is None:
        sample = (
            _reservoir_sample(e.select("vec_id", "embedding"), SAMPLE_CAP)
            .coalesce(1)
            .sortWithinPartitions("vec_id")
            .select(
                array_to_vector(F.col("embedding").cast("array<double>")).alias("vec")
            )
            .cache()
        )
        k = min(k_target, max(1, sample.count()))
        model = KMeans(k=k, seed=42, maxIter=20, featuresCol="vec").fit(sample)
        sample.unpersist()
        cent_rows = [
            (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
        ]
        _CENTROID_CACHE[cache_key] = cent_rows
    cents = spark.createDataFrame(cent_rows, "cent_id int, cent_emb array<double>")
    w = Window.partitionBy("vec_id").orderBy(F.col("cd").asc(), F.col("cent_id"))
    m = (
        e.crossJoin(F.broadcast(cents))
        .select(
            "vec_id", "embedding", "cent_id",
            vectors.l2_sq_dist("embedding", "cent_emb").alias("cd"),
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        # cent_id LONG: schema-identical to the fixed-centroid twin (whose
        # centroid ids are vec_ids) so the driver sees one stable contract
        .select("vec_id", "embedding", F.col("cent_id").cast("long").alias("cent_id"))
    )
    return _semantic_dedup_decide(m)


@query(
    "ann_pq_topk",
    oracle=None,  # product-quantized search ≠ exact → rows-only; recall gated below
    ref="SURVEY §2 K3 (product quantization ANN: M=16 subspaces × K'=32 "
    "KMeans codebook, asymmetric-distance (ADC) lookup — the memory-"
    "compressed 100 TB similarity-search path: 16 one-byte codes per vector "
    "instead of 256 bytes of floats, 16x compression)",
)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ approximate top-5: split each 64-dim vector into M=16 4-dim
    subvectors, quantize each against a K'=32 codebook fitted by KMeans on a
    BOUNDED pooled sample of subvectors (shared across the M subspaces —
    codebook size independent of n, fixed seed), then rank by ADC:
    approx_d(q, v) = Σ_m ||q_m − c[code(v, m)]||².

    Plan shape: codes are built in one O(n·M·K') narrow pass against a
    BROADCAST O(K'·dim/M) codebook; the per-query lookup table is
    O(|queries|·M·K') and also broadcast; ranking joins codes to the LUT on
    (m, code) — the corpus side never shuffles on anything wider than its
    16-byte code row. This is how a 100 TB corpus fits an in-memory ANN
    index: 16 B of codes per vector vs 256 B of raw floats (16x).

    Cross-path agreement law (VERDICT r7 item 3, pinned by
    tests/test_llm_quality.py::test_ann_paths_cross_agreement): the portable
    sibling ann_pq_topk_portable deliberately uses a random-sample codebook
    (oracle-exact ADC mechanics, weak retrieval), so the law is quality
    ORDERING, not overlap — this KMeans-trained path's recall vs exact must
    beat the portable sibling's by >= 0.1 (measured 0.40 vs 0.07 at
    sf0.01), on top of the >= 0.5 recall gate (ann_pq_recall)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    M, SUB, KP, TOPK, SAMPLE_CAP = 16, 4, 32, 5, 4096
    e = load(spark, sf_dir, "embeddings")
    sub_struct = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(M - 1)),
            lambda m: F.struct(
                m.cast("int").alias("m"),
                F.slice(F.col("embedding"), m * SUB + 1, SUB).alias("sub"),
            ),
        )
    )
    subs = e.select("vec_id", sub_struct.alias("s")).select(
        "vec_id", F.col("s.m").alias("m"), F.col("s.sub").alias("sub")
    )
    # Codebook: ONE KMeans over a bounded pooled sample of subvectors (shared
    # across the M subspaces — K' stays independent of n, like ann_ivf_topk's
    # fixed-K quantizer; per-subspace codebooks would be M small fits with the
    # same plan shape).
    # Deterministic subvector sample: Knuth-hash reservoir keyed on the
    # unique (vec_id, m) pair id — partition/file-order independent, same
    # contract as ann_ivf_topk's training sample (VERDICT r6 #3).
    pq_key = ("pq", sf_dir, _emb_fingerprint(sf_dir))
    code_rows = _CENTROID_CACHE.get(pq_key)
    if code_rows is None:
        # pair_id reduced mod 2^31 before the Knuth multiply: the unreduced
        # form overflows int64 at vec_id ≈ 3.47e9 / M (ADVICE r7); reduction
        # first keeps the product < 2^62 for any int64 vec_id.
        pair_id = F.col("vec_id") * F.lit(M) + F.col("m")
        hk = (
            F.pmod(pair_id, F.lit(2147483648)) * F.lit(2654435761).cast("long")
        ) % F.lit(4294967296)
        sample = (
            subs.withColumn("_hk", hk)
            .orderBy(F.col("_hk").asc(), F.col("vec_id").asc(), F.col("m").asc())
            .limit(SAMPLE_CAP)
            .coalesce(1)
            .sortWithinPartitions("vec_id", "m")
            .select(array_to_vector(F.col("sub").cast("array<double>")).alias("v"))
            .cache()
        )
        k = min(KP, max(1, sample.count()))
        model = KMeans(k=k, seed=42, maxIter=20, featuresCol="v").fit(sample)
        sample.unpersist()
        code_rows = [
            (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
        ]
        _CENTROID_CACHE[pq_key] = code_rows
    subcents = spark.createDataFrame(code_rows, "code_id int, cent_sub array<double>")
    # Encoding as the zero-exchange HOF argmin (_ivf_cell_of over the K'=32
    # literal sub-codebook): the previous crossJoin + row_number window
    # shuffled and sorted n·M·K' rows to pick each subvector's nearest code.
    # Same squared-L2 fold spelling as vectors.l2_sq_dist, same
    # (d asc, code_id asc) tie-break — codes are bit-identical.
    from ksql_spark.queries.curation import _ivf_cell_of

    codes = subs.select(
        "vec_id", "m", _ivf_cell_of(code_rows, F.col("sub")).alias("code_id")
    )
    qsubs = subs.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "m", F.col("sub").alias("q_sub")
    )
    lut = qsubs.crossJoin(F.broadcast(subcents)).select(
        "query_id", "m", "code_id",
        vectors.l2_sq_dist("q_sub", "cent_sub").alias("pd"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("approx_d").asc(), F.col("vec_id"))
    return (
        codes.join(F.broadcast(lut), ["m", "code_id"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("pd").alias("approx_d"))
        .where(F.col("query_id") != F.col("vec_id"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOPK)
        .drop("rn")
    )


@query(
    "ann_pq_recall",
    oracle=_ANN_RECALL_ORACLE,
    ref="SURVEY §2 K3 (PQ quality gate: avg recall@5 vs exact brute-force "
    ">= 0.2, measured 0.33 at sf0.01 — tolerance oracle; PQ trades recall "
    "for a 32x memory compression, so its gate sits below the IVF/LSH ones "
    "by design)",
)
def ann_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ann_recall(spark, sf_dir, ann_pq_topk, 0.2)


@query(
    "llm_doc_boilerplate_ratio",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    g AS (
        SELECT doc_id,
               unnest(list_distinct(
                   list_transform(range(1, len(w) - 1),
                                  i -> array_to_string(w[i:i+2], ' ')))) AS gram
        FROM toks
    ),
    df AS (SELECT gram, COUNT(*) AS gram_df FROM g GROUP BY gram)
    SELECT g.doc_id AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(count_if(df.gram_df >= 3) AS BIGINT) AS n_frequent,
           CAST(count_if(df.gram_df >= 3) AS DOUBLE) / COUNT(*) AS boilerplate_ratio
    FROM g JOIN df USING (gram)
    GROUP BY g.doc_id
    """,
    ref="SURVEY §2 K15 companion (per-document boilerplate ratio: fraction "
    "of a doc's distinct 3-grams that are corpus-frequent — the doc-level "
    "application of the corpus-level frequent-gram table, like tf-idf is to "
    "idf; a high ratio flags template/chrome-heavy docs for the K12 filter)",
)
def llm_doc_boilerplate_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of each document's distinct 3-grams that appear in >= 3 docs
    corpus-wide. Exact integer-derived ratio (bit-stable division).

    Plan shape: as written, Spark plans TWO scan+explode passes (the df
    aggregate's partial-count subplan differs from the probe side, so
    ReuseExchange cannot fire) plus the join on gram and the final doc_id
    agg. That is the honest cost of the self-contained oracle-checkable
    form. The 100 TB deployment does NOT run this shape: the df table is
    the already-materialized output of llm_boilerplate_ngrams (without its
    HAVING), and only its FREQUENT subset (tiny) joins back — one explode
    pass over the corpus probing a broadcast frequent-gram set."""
    d = load(spark, sf_dir, "documents")
    grams = (
        d.select("doc_id", F.explode(F.array_distinct(text.shingles("text", 3))).alias("gram"))
    )
    df_tbl = grams.groupBy("gram").agg(F.count("*").alias("gram_df"))
    return (
        grams.join(df_tbl, "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.count_if(F.col("gram_df") >= 3).alias("n_frequent"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_frequent",
            (F.col("n_frequent").cast("double") / F.col("n_grams")).alias(
                "boilerplate_ratio"
            ),
        )
    )


@query(
    "llm_top_ngram_coverage",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS w,
               len(replace(text, ' ', '')) AS total_chars
        FROM documents
    ),
    g2 AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(w)),
                      i -> array_to_string(w[i:i+1], ' '))) AS gram
        FROM toks
    ),
    c2 AS (
        SELECT doc_id, MAX(cnt * chars) AS top2_chars
        FROM (SELECT doc_id, COUNT(*) AS cnt, len(gram) - 1 AS chars
              FROM g2 GROUP BY doc_id, gram, len(gram) - 1)
        GROUP BY doc_id
    ),
    g3 AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(w) - 1),
                      i -> array_to_string(w[i:i+2], ' '))) AS gram
        FROM toks
    ),
    c3 AS (
        SELECT doc_id,
               COALESCE(SUM(CASE WHEN cnt >= 2 THEN cnt * chars END), 0)
                   AS dup3_chars
        FROM (SELECT doc_id, COUNT(*) AS cnt, len(gram) - 2 AS chars
              FROM g3 GROUP BY doc_id, gram, len(gram) - 2)
        GROUP BY doc_id
    )
    SELECT t.doc_id AS doc_id,
           CAST(t.total_chars AS BIGINT) AS total_chars,
           CAST(COALESCE(c2.top2_chars, 0) AS DOUBLE) / t.total_chars
               AS top2_cov,
           CAST(COALESCE(c3.dup3_chars, 0) AS DOUBLE) / t.total_chars
               AS dup3_frac
    FROM toks t
    LEFT JOIN c2 ON t.doc_id = c2.doc_id
    LEFT JOIN c3 ON t.doc_id = c3.doc_id
    """,
    ref="SURVEY §2 K47 [EXT] (Gopher repetition signals — Rae et al. 2021 "
    "table A1: fraction of characters in the most frequent word 2-gram, "
    "fraction of characters in duplicated word 3-grams; the n-gram-level "
    "complement of llm_repetition_ratio's distinct-bigram share)",
)
def llm_top_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc n-gram repetition coverage: top2_cov = (occurrences x
    non-space chars) of the doc's most frequent word 2-gram over total
    non-space chars; dup3_frac = the same char mass summed over every
    3-gram that occurs at least twice. High values flag boilerplate /
    template docs that a distinct-word ratio misses. MAX of exact integer
    products makes the top-gram tie-free; divisions are exact-operand IEEE.

    Scale shape: two explode -> (doc_id, gram) hash aggs with map-side
    combine, each re-agged on doc_id — all shuffles carry doc-local gram
    counts (corpus-size bound, never a gram self-join); the two signal
    tables join back to the narrow base scan on doc_id. Docs shorter than
    the gram width coalesce to 0 coverage."""
    d = load(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).alias(
            "total_chars"
        ),
    )
    g2 = d.select("doc_id", F.explode(text.shingles("text", 2)).alias("gram"))
    c2 = (
        g2.groupBy("doc_id", "gram")
        .agg((F.count("*") * (F.length(F.col("gram")) - 1)).alias("cov"))
        .groupBy("doc_id")
        .agg(F.max("cov").alias("top2_chars"))
    )
    g3 = d.select("doc_id", F.explode(text.shingles("text", 3)).alias("gram"))
    c3 = (
        g3.groupBy("doc_id", "gram")
        .agg(
            F.count("*").alias("cnt"),
            (F.length(F.col("gram")) - 2).alias("chars"),
        )
        .groupBy("doc_id")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("cnt") >= 2, F.col("cnt") * F.col("chars")
                    )
                ),
                F.lit(0),
            ).alias("dup3_chars")
        )
    )
    return (
        base.join(c2, "doc_id", "left")
        .join(c3, "doc_id", "left")
        .select(
            "doc_id",
            F.col("total_chars").cast("bigint").alias("total_chars"),
            F.when(
                F.col("total_chars") > 0,
                F.coalesce(F.col("top2_chars"), F.lit(0)).cast("double")
                / F.col("total_chars").cast("double"),
            ).alias("top2_cov"),
            F.when(
                F.col("total_chars") > 0,
                F.coalesce(F.col("dup3_chars"), F.lit(0)).cast("double")
                / F.col("total_chars").cast("double"),
            ).alias("dup3_frac"),
        )
    )


#: Bloom geometry: m = 4096 bit positions packed 32 bits per BIGINT word
#: (sign bit never used — DuckDB << on the sign bit of a BIGINT is the
#: hazard this sidesteps), k = 3 positions per gram from disjoint 8-hex-char
#: slices of one md5 (Spark conv(hex,16,10) == DuckDB '0x'::BIGINT).
_BLOOM_BITS, _BLOOM_WORD = 4096, 32


def _bloom_pos_duck(i: int) -> str:
    return (
        f"('0x' || substr(md5(gram), {1 + 8 * i}, 8))::BIGINT % {_BLOOM_BITS}"
    )


def _bloom_positions():
    """Array of the k=3 bit positions for the `gram` column."""

    def pos_col(i: int):
        return (
            F.conv(
                F.substring(F.md5(F.col("gram").cast("binary")), 1 + 8 * i, 8),
                16,
                10,
            ).cast("long")
            % _BLOOM_BITS
        )

    return F.array(*[pos_col(i) for i in range(3)])


def _bloom_mask():
    # PySpark's F.shiftleft wants a literal int shift; the SQL form takes a
    # column (pos % 32 <= 31, so the BIGINT sign bit is never touched).
    return F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {_BLOOM_WORD} AS INT))"
    )


def bloom_sketch(grams: DataFrame) -> DataFrame:
    """(word_idx, bits) bloom words for a one-column `gram` DataFrame.

    bit_or is associative + commutative, so sketches built over shards (or
    streaming micro-batches) merge with another bit_or groupBy into exactly
    the single-pass sketch — the mergeability law tests/test_llm_quality.py
    asserts bitwise."""
    return (
        grams.select(F.explode(_bloom_positions()).alias("pos"))
        .groupBy((F.col("pos") / _BLOOM_WORD).cast("long").alias("word_idx"))
        .agg(F.bit_or(_bloom_mask()).alias("bits"))
    )


@query(
    "llm_bloom_decontaminate",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    g AS (
        SELECT doc_id,
               unnest(list_distinct(
                   list_transform(range(1, len(w) - 3),
                                  i -> array_to_string(w[i:i+4], ' ')))) AS gram
        FROM toks
    ),
    eg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 29 = 0),
    epos AS (
        SELECT unnest([{_bloom_pos_duck(0)},
                       {_bloom_pos_duck(1)},
                       {_bloom_pos_duck(2)}]) AS pos
        FROM eg
    ),
    bloom AS (
        SELECT pos // {_BLOOM_WORD} AS word_idx,
               bit_or(CAST(1 AS BIGINT)
                      << CAST(pos % {_BLOOM_WORD} AS INT)) AS bits
        FROM epos GROUP BY pos // {_BLOOM_WORD}
    ),
    cpos AS (
        SELECT doc_id, gram,
               unnest([{_bloom_pos_duck(0)},
                       {_bloom_pos_duck(1)},
                       {_bloom_pos_duck(2)}]) AS pos
        FROM (SELECT DISTINCT doc_id, gram FROM g WHERE doc_id % 29 <> 0)
    ),
    probe AS (
        SELECT doc_id, gram,
               MIN(CASE WHEN (COALESCE(b.bits, 0)
                              & (CAST(1 AS BIGINT)
                                 << CAST(pos % {_BLOOM_WORD} AS INT))) <> 0
                        THEN 1 ELSE 0 END) AS all_hit
        FROM cpos LEFT JOIN bloom b ON cpos.pos // {_BLOOM_WORD} = b.word_idx
        GROUP BY doc_id, gram
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_flagged
    FROM probe WHERE all_hit = 1
    GROUP BY doc_id
    """,
    ref="SURVEY §2 K48 [EXT] (Bloom-filter decontamination sketch: the "
    "eval split's 5-grams compressed into a 4096-bit broadcastable bitmap "
    "via bit_or aggregation — the mergeable-sketch formulation of "
    "llm_decontaminate for when even the eval gram SET is too big to "
    "broadcast; deliberately one-sided: supersets llm_decontaminate's "
    "exact hits with deterministic false positives)",
)
def llm_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-sketch benchmark decontamination. Build: each distinct eval
    5-gram sets k=3 bit positions (disjoint 8-hex-char md5 slices mod
    4096); the filter is 128 BIGINT words of 32 used bits, built by
    bit_or aggregation (associative + commutative = map-side partial
    merge — the same mergeability HLL gets from datasketches). Probe: a
    train doc's gram is flagged iff all 3 of its bits are set; output is
    flagged-gram counts per doc. Every hash, shift, and mask is exact
    integer math — both engines agree bitwise, false positives included.

    Scale shape: the WHOLE filter is 1 KiB regardless of eval-set size —
    it broadcasts where llm_decontaminate's distinct gram set (GBs for a
    large benchmark suite) might not; the corpus side stays a narrow
    explode joined against 128 broadcast rows, and the only wide exchange
    is the final doc_id re-agg. At 100 TB you size m up (2^30 bits = 128
    MiB broadcast) and the plan is unchanged."""
    d = load(spark, sf_dir, "documents")
    grams5 = F.array_distinct(text.shingles("text", 5))
    positions = _bloom_positions()
    mask = _bloom_mask()
    bloom = bloom_sketch(
        d.where(F.col("doc_id") % 29 == 0)
        .select(F.explode(grams5).alias("gram"))
        .distinct()
    )
    corpus_pos = (
        d.where(F.col("doc_id") % 29 != 0)
        .select("doc_id", F.explode(grams5).alias("gram"))
        .distinct()
        .select("doc_id", "gram", F.explode(positions).alias("pos"))
    )
    probe = (
        corpus_pos.join(
            F.broadcast(bloom),
            (F.col("pos") / _BLOOM_WORD).cast("long") == F.col("word_idx"),
            "left",
        )
        .select(
            "doc_id",
            "gram",
            F.when(
                F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(mask) != 0, 1
            )
            .otherwise(0)
            .alias("hit"),
        )
        .groupBy("doc_id", "gram")
        .agg(F.min("hit").alias("all_hit"))
    )
    return (
        probe.where(F.col("all_hit") == 1)
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_flagged"))
    )


#: Count-Min geometry: d = 4 hash rows from the 4 disjoint 8-hex-char md5
#: slices, w = 512 counters per row. Deterministic and engine-portable —
#: both engines compute the identical sketch, collisions included.
_CMS_ROWS, _CMS_WIDTH = 4, 512


def _cms_pos_expr():
    return F.expr(
        "CAST(conv(substring(md5(CAST(w AS BINARY)), 1 + 8 * j, 8), 16, 10)"
        f" AS BIGINT) % {_CMS_WIDTH}"
    )


def cms_sketch(toks: DataFrame) -> DataFrame:
    """(j, pos, cnt) Count-Min counters for a one-column `w` token
    DataFrame. SUM-mergeable: sketches built over shards (or streaming
    micro-batches) re-aggregate with SUM(cnt) into exactly the single-pass
    sketch — the law tests/test_llm_quality.py pins, mirroring
    bloom_sketch's bit_or merge."""
    js = F.array(*[F.lit(j) for j in range(_CMS_ROWS)])
    # r14 (guide §1.2 per-task work): md5(w) is j-invariant — inlined in
    # the per-(row, j) position expression it was hashed _CMS_ROWS times
    # per token. Hash once per token BEFORE the explode; the positions
    # read slices of the same hex string, so every (j, pos, cnt) counter
    # is bit-identical.
    return (
        toks.select(F.md5(F.col("w").cast("binary")).alias("h"))
        .select("h", F.explode(js).alias("j"))
        .select(
            "j",
            F.expr(
                "CAST(conv(substring(h, 1 + 8 * j, 8), 16, 10) AS BIGINT)"
                f" % {_CMS_WIDTH}"
            ).alias("pos"),
        )
        .groupBy("j", "pos")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "llm_cms_heavy_hitters",
    oracle=f"""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    exact AS (SELECT w, COUNT(*) AS exact_n FROM toks GROUP BY w),
    top AS (SELECT w, exact_n FROM exact ORDER BY exact_n DESC, w LIMIT 20),
    tok4 AS (SELECT w, unnest([0, 1, 2, 3]) AS j FROM toks),
    sk AS (
        SELECT j,
               ('0x' || substr(md5(w), 1 + 8 * j, 8))::BIGINT % {_CMS_WIDTH}
                   AS pos,
               COUNT(*) AS cnt
        FROM tok4 GROUP BY 1, 2
    ),
    tpos AS (
        SELECT t.w, t.exact_n, q.j,
               ('0x' || substr(md5(t.w), 1 + 8 * q.j, 8))::BIGINT
                   % {_CMS_WIDTH} AS pos
        FROM top t, (SELECT unnest([0, 1, 2, 3]) AS j) q
    )
    SELECT tpos.w AS word,
           CAST(tpos.exact_n AS BIGINT) AS exact_n,
           CAST(MIN(sk.cnt) AS BIGINT) AS cms_n,
           CAST(MIN(sk.cnt) - tpos.exact_n AS BIGINT) AS overcount
    FROM tpos JOIN sk ON sk.j = tpos.j AND sk.pos = tpos.pos
    GROUP BY tpos.w, tpos.exact_n
    """,
    ref="SURVEY §2 K49 [EXT] (portable Count-Min sketch: d=4 x w=512 "
    "counter grid from md5-slice hashes, estimate = min over rows — "
    "completes the mergeable-sketch family: HLL approximates distinct, "
    "Bloom membership, CMS frequency. One-sided by construction "
    "(cms_n >= exact_n, enforced in tests); collisions deterministic "
    "and bit-identical cross-engine)",
)
def llm_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min-sketch frequency estimates for the corpus's 20 most
    frequent words, with the exact count and the (always >= 0) sketch
    overcount beside them. Each token occurrence increments one counter
    per hash row; a word's estimate is the MIN of its d counters — the
    overcount is exactly the hash-collision mass, identical in both
    engines because the hashes are.

    Scale shape: the sketch is a (j, pos)-keyed aggregation capped at
    d x w = 2048 rows NO MATTER the corpus size (SUM-mergeable — shards
    sketch independently and the partial aggs combine, like the HLL
    union); the probe side is 20 x 4 rows joined against the broadcast
    sketch. The exact-count branch is vocabulary-bounded. Nothing wide
    ever shuffles except the token->vocab agg that any exact top-k
    needs anyway."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(F.explode(text.words("text")).alias("w"))
    exact = toks.groupBy("w").agg(F.count("*").alias("exact_n"))
    top = exact.orderBy(F.col("exact_n").desc(), "w").limit(20)
    js = F.array(*[F.lit(j) for j in range(_CMS_ROWS)])
    sk = cms_sketch(toks)
    tpos = top.select("w", "exact_n", F.explode(js).alias("j")).select(
        "w", "exact_n", "j", _cms_pos_expr().alias("pos")
    )
    return (
        tpos.join(F.broadcast(sk), ["j", "pos"])
        .groupBy("w", "exact_n")
        .agg(F.min("cnt").alias("cms_n"))
        .select(
            F.col("w").alias("word"),
            F.col("exact_n").cast("bigint").alias("exact_n"),
            F.col("cms_n").cast("bigint").alias("cms_n"),
            (F.col("cms_n") - F.col("exact_n")).cast("bigint").alias("overcount"),
        )
    )


@query(
    "llm_bigram_coherence",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(w)),
                      i -> array_to_string(w[i:i+1], ' '))) AS gram
        FROM toks
    ),
    c2 AS (SELECT gram, COUNT(*) AS n2 FROM bg GROUP BY gram),
    c1 AS (
        SELECT split_part(gram, ' ', 1) AS w1, COUNT(*) AS n1
        FROM bg GROUP BY 1
    ),
    r AS (
        SELECT bg.doc_id,
               CAST(c2.n2 AS DOUBLE) / CAST(c1.n1 AS DOUBLE) AS p
        FROM bg
        JOIN c2 USING (gram)
        JOIN c1 ON split_part(bg.gram, ' ', 1) = c1.w1
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           {sql_davg('p')} AS coherence
    FROM r GROUP BY doc_id
    """,
    ref="SURVEY §2 K50 [EXT] (bigram LM coherence — the CCNet/KenLM "
    "perplexity-filter shape without transcendentals: mean corpus-level "
    "conditional bigram probability P(w2|w1) = C(w1 w2)/C(w1 *) per doc; "
    "word-salad docs score near the unigram baseline, natural text "
    "scores high. Exact integer counts, one IEEE division per bigram, "
    "quantized mean)",
)
def llm_bigram_coherence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc bigram coherence under the corpus's own bigram language
    model: the mean conditional probability of each consecutive word pair.
    The transcendental-free stand-in for a perplexity filter (CCNet uses
    KenLM log-scores; the ORDERING of docs is what the filter consumes,
    and a monotone probability mean preserves it engine-exactly).

    Scale shape: bigram and prefix count tables are vocabulary-bounded
    (hashed to fixed buckets at 100 TB) and BROADCAST onto the doc bigram
    stream; the only wide exchange is the final doc_id re-agg with
    map-side combine. The corpus never self-joins and never shuffles on
    the gram."""
    d = load(spark, sf_dir, "documents")
    bg = d.select("doc_id", F.explode(text.shingles("text", 2)).alias("gram"))
    c2 = bg.groupBy("gram").agg(F.count("*").alias("n2"))
    c1 = (
        bg.select(F.split_part(F.col("gram"), F.lit(" "), F.lit(1)).alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("n1"))
    )
    r = (
        bg.join(F.broadcast(c2), "gram")
        .join(
            F.broadcast(c1),
            F.split_part(F.col("gram"), F.lit(" "), F.lit(1)) == F.col("w1"),
        )
        .select(
            "doc_id",
            (F.col("n2").cast("double") / F.col("n1").cast("double")).alias("p"),
        )
    )
    return r.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        davg("p").alias("coherence"),
    )


@query(
    "llm_emb_outliers",
    oracle=f"""
    WITH ex AS (
        SELECT vec_id, label,
               unnest(list_transform(range(1, len(embedding) + 1),
                      i -> struct_pack(dim := i,
                                       val := CAST(embedding[i] AS DOUBLE))),
                      recursive := true)
        FROM embeddings
    ),
    cent AS (
        SELECT label, dim, {sql_davg('val')} AS c
        FROM ex GROUP BY label, dim
    ),
    dist AS (
        SELECT vec_id, ex.label AS label,
               {sql_dsum('(val - c) * (val - c)')} AS dist2
        FROM ex JOIN cent USING (label, dim)
        GROUP BY vec_id, ex.label
    ),
    thr AS (SELECT label, {sql_davg('dist2')} AS mean_d FROM dist GROUP BY label)
    SELECT vec_id, label, dist2, dist2 > 2 * mean_d AS is_outlier
    FROM dist JOIN thr USING (label)
    """,
    ref="SURVEY §2 K51 [EXT] (embedding-space outlier detection: squared "
    "L2 distance to the per-label centroid, flagged past 2x the label's "
    "mean distance — the mislabeled/garbage-vector screen run before "
    "contrastive training or ANN index build; per-dim quantized means "
    "keep the centroid bit-identical cross-engine)",
)
def llm_emb_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid distance outliers: explode vectors to
    (vec_id, label, dim, val), average per (label, dim) into an exact
    quantized centroid, re-aggregate each vector's quantized squared
    distance, and flag vectors beyond 2x their label's mean distance.

    Scale shape: the explode is narrow (dim fan-out, no shuffle); the
    centroid agg shuffles on (label, dim) with map-side combine; the
    distance re-agg shuffles on vec_id; the K-row threshold table
    BROADCASTS back. No pairwise distances anywhere — O(n·dim), the same
    cost envelope as llm_emb_cluster's assignment pass."""
    e = load(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "val0")
    ).select(
        "vec_id",
        "label",
        (F.col("pos") + 1).alias("dim"),
        F.col("val0").cast("double").alias("val"),
    )
    cent = ex.groupBy("label", "dim").agg(davg("val").alias("c"))
    diff = F.col("val") - F.col("c")
    dist = (
        ex.join(cent, ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(dsum(diff * diff).alias("dist2"))
    )
    thr = dist.groupBy("label").agg(davg("dist2").alias("mean_d"))
    return dist.join(F.broadcast(thr), "label").select(
        "vec_id",
        "label",
        "dist2",
        (F.col("dist2") > 2 * F.col("mean_d")).alias("is_outlier"),
    )


@query(
    "llm_tokenize_ids",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(string_split(text, ' ')) + 1),
                      i -> struct_pack(pos := i,
                                       w := string_split(text, ' ')[i])),
                      recursive := true)
        FROM documents
    ),
    vocab AS (
        SELECT w,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, w) - 1 AS id
        FROM toks GROUP BY w
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           array_to_string(list(id ORDER BY pos), ',') AS token_ids
    FROM toks JOIN vocab USING (w)
    GROUP BY doc_id
    """,
    ref="SURVEY §2 K54 [EXT] (tokenize-to-ids: frequency-ranked dense "
    "vocabulary (id 0 = most frequent, BPE-merge-table ordering) mapped "
    "over every document in position order — the text→tensor boundary "
    "step after which the pipeline hands off to training)",
)
def llm_tokenize_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map every document to its dense token-id sequence under a
    frequency-ranked corpus vocabulary (ties broken lexicographically, so
    the id assignment is total and engine-identical). Output keeps
    position order — the actual model input, not a bag of words.

    Scale shape: the vocabulary rank is a window over the VOCAB table
    (bounded; a web-scale vocab takes the win_distribution_scaled
    two-stage form), then broadcasts onto the token stream; the id
    sequences reassemble via sort_array(struct(pos, id)) per doc — one
    doc_id shuffle, arrays never cross docs."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(text.words("text")).alias("pos0", "w")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "w")
    vocab = (
        toks.groupBy("w")
        .agg(F.count("*").alias("n"))
        .select(
            "w",
            (
                F.row_number().over(
                    Window.orderBy(F.col("n").desc(), F.col("w"))
                )
                - 1
            ).alias("id"),
        )
    )
    return (
        toks.join(F.broadcast(vocab), "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            # serialized as CSV, not a raw array: the driver's value hash
            # (and pandas sort) can't take list cells — agg_collect set the
            # same convention
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "id"))),
                    lambda x: x["id"].cast("string"),
                ),
            ).alias("token_ids"),
        )
    )


@query(
    "llm_ngram_novelty",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    g AS (
        SELECT doc_id,
               unnest(list_distinct(
                   list_transform(range(1, len(w) - 1),
                                  i -> array_to_string(w[i:i+2], ' ')))) AS gram
        FROM toks
    ),
    firstseen AS (SELECT gram, MIN(doc_id) AS first_doc FROM g GROUP BY gram)
    SELECT g.doc_id AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(COUNT(*) FILTER (WHERE g.doc_id = f.first_doc) AS BIGINT)
               AS n_novel,
           CAST(COUNT(*) FILTER (WHERE g.doc_id = f.first_doc) AS DOUBLE)
               / COUNT(*) AS novelty
    FROM g JOIN firstseen f USING (gram)
    GROUP BY g.doc_id
    """,
    ref="SURVEY §2 K56 [EXT] (n-gram novelty: share of a doc's distinct "
    "3-grams it is the FIRST to contribute (min doc_id order = crawl "
    "order) — the incremental-crawl marginal-value score: a re-crawl of "
    "known content scores ~0, fresh content ~1; the per-doc view of "
    "llm_cross_dedup's batch decision)",
)
def llm_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much NEW n-gram content each doc adds to the corpus, treating
    doc_id as arrival order: novelty = fraction of the doc's distinct
    3-grams whose first occurrence is this doc.

    Scale shape: one gram-keyed MIN agg (map-side combined; exchanges
    carry distinct grams once, not occurrences) joined back to the gram
    stream — at bench SF the min-table broadcasts so the corpus side
    never shuffles on gram; at scale both sides hash on the gram (the
    first-occurrence question inherently joins on it, like
    llm_dup_stats), keyed by its md5 digest as in
    llm_substring_dup_spans. Then a doc_id re-agg."""
    d = load(spark, sf_dir, "documents")
    g = d.select(
        "doc_id",
        F.explode(F.array_distinct(text.shingles("text", 3))).alias("gram"),
    )
    firstseen = g.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(
        F.when(F.col("doc_id") == F.col("first_doc"), 1).otherwise(0)
    )
    return (
        g.join(firstseen, "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            novel.cast("bigint").alias("n_novel"),
            (novel.cast("double") / F.count("*")).alias("novelty"),
        )
    )


@query(
    "llm_emb_cluster_iter2",
    oracle=f"""
    WITH cents AS (
        SELECT vec_id AS cent_id, embedding AS cent_emb
        FROM embeddings WHERE vec_id < 4
    ),
    d AS (
        SELECT e.vec_id, c.cent_id,
               {_L2SQ.format(a='e.embedding', b='c.cent_emb')} AS cd
        FROM embeddings e CROSS JOIN cents c
    ),
    a1 AS (
        SELECT vec_id, cent_id FROM (
            SELECT vec_id, cent_id,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY cd, cent_id) AS rn
            FROM d
        ) WHERE rn = 1
    ),
    ex AS (
        SELECT a1.cent_id,
               unnest(list_transform(range(1, len(e.embedding) + 1),
                      i -> struct_pack(dim := i,
                                       val := CAST(e.embedding[i] AS DOUBLE))),
                      recursive := true)
        FROM embeddings e JOIN a1 ON e.vec_id = a1.vec_id
    ),
    c1 AS (
        SELECT cent_id, dim, {sql_davg('val')} AS c
        FROM ex GROUP BY cent_id, dim
    ),
    vex AS (
        SELECT vec_id,
               unnest(list_transform(range(1, len(embedding) + 1),
                      i -> struct_pack(dim := i,
                                       val := CAST(embedding[i] AS DOUBLE))),
                      recursive := true)
        FROM embeddings
    ),
    d2 AS (
        SELECT vex.vec_id, c1.cent_id,
               {sql_dsum('(val - c) * (val - c)')} AS cd
        FROM vex JOIN c1 USING (dim)
        GROUP BY vex.vec_id, c1.cent_id
    ),
    a2 AS (
        SELECT vec_id, cent_id, cd FROM (
            SELECT vec_id, cent_id, cd,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY cd, cent_id) AS rn
            FROM d2
        ) WHERE rn = 1
    )
    SELECT cent_id, CAST(COUNT(*) AS BIGINT) AS n_members,
           {sql_davg('cd')} AS avg_dist
    FROM a2 GROUP BY cent_id
    """,
    ref="SURVEY §2 K61 [EXT] (TWO Lloyd iterations with RECOMPUTED "
    "centroids — the genuinely iterative step llm_emb_cluster's single "
    "fixed-centroid pass omits: assign, average per (cluster, dim) into "
    "new quantized centroids, re-assign. The full train-the-index loop, "
    "oracle-exact cross-engine)",
)
def llm_emb_cluster_iter2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means after a second Lloyd iteration: iteration-1 assignment to
    the fixed seed centroids (vec_id < 4), per-(cluster, dim) quantized
    mean as the NEW centroids, then re-assignment by quantized squared-L2
    against them. Cluster sizes shift between iterations exactly when a
    vector is nearer its neighbors' mean than its seed — the convergence
    behavior itself is now cross-engine bit-checked.

    Scale shape: iteration-1 is the K19 broadcast pass; the centroid
    recompute is a (cluster, dim) hash agg (K x dim rows out); the
    re-assignment joins the exploded vectors to the K x dim centroid
    table on dim (bounded broadcast) and re-aggs per (vec, cluster) —
    O(n·K·dim) narrow work, no pairwise stage anywhere."""
    e = load(spark, sf_dir, "embeddings")
    a1 = _assign_fixed_centroids(e).select("vec_id", "cent_id")
    ex = (
        e.join(a1, "vec_id")
        .select("cent_id", F.posexplode("embedding").alias("pos", "v"))
        .select(
            "cent_id",
            (F.col("pos") + 1).alias("dim"),
            F.col("v").cast("double").alias("val"),
        )
    )
    c1 = ex.groupBy("cent_id", "dim").agg(davg("val").alias("c"))
    vex = e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "v")
    ).select(
        "vec_id",
        (F.col("pos") + 1).alias("dim"),
        F.col("v").cast("double").alias("val"),
    )
    diff = F.col("val") - F.col("c")
    d2 = (
        vex.join(F.broadcast(c1), "dim")
        .groupBy("vec_id", "cent_id")
        .agg(dsum(diff * diff).alias("cd"))
    )
    w = Window.partitionBy("vec_id").orderBy("cd", "cent_id")
    a2 = d2.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return a2.groupBy("cent_id").agg(
        F.count("*").alias("n_members"), davg("cd").alias("avg_dist")
    )


@query(
    "llm_lang_label_audit",
    oracle="""
    WITH det AS (
        SELECT doc_id, lang AS declared,
               CASE WHEN len(list_filter(string_split(text, ' '),
                        x -> x IN ('the', 'a', 'of'))) > 0
                    THEN 'en' ELSE 'unk' END AS detected
        FROM documents
    )
    SELECT declared, detected,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS example_doc
    FROM det GROUP BY declared, detected
    """,
    ref="SURVEY §2 K63 [EXT] (metadata-vs-content label audit: the "
    "declared lang column cross-tabulated against the content-derived "
    "language guess — the label-noise screen run before trusting "
    "upstream metadata for mixing/filtering decisions; one narrow scan "
    "+ a |langs|² agg)",
)
def llm_lang_label_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of declared vs detected language with an example
    doc per cell. Off-diagonal cells are label noise: docs whose metadata
    disagrees with their content — exactly what silently corrupts
    temperature mixing (K40) and per-language fertility stats (K43) if
    trusted unaudited.

    Scale shape: detection is the same narrow HOF pass as llm_lang_id;
    the cross-tab is bounded by |langs|² rows."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.col("lang").alias("declared"),
            text.lang_guess("text").alias("detected"),
        )
        .groupBy("declared", "detected")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("example_doc"),
        )
    )


# ---------------------------------------------------------------------------
# K66 (round 6): BM25 lexical retrieval — the sparse complement of the
# embedding ANN family (llm_sim_topk / ann_*). Okapi BM25 per Robertson &
# Spärck Jones probabilistic relevance framework (public knowledge; the
# Lucene-style smoothed idf ln(1 + (N - df + 0.5)/(df + 0.5))).
# ---------------------------------------------------------------------------

#: Fixed query workload: literal strings over the corpus vocabulary, so the
#: retrieval math (not a query parser) is what the oracle checks.
_BM25_QUERIES = [
    ("q1", "fast table scan"),
    ("q2", "window merge batch"),
    ("q3", "stream filter sort"),
]
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 5


@query(
    "llm_bm25_topk",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, text, len(string_split(text, ' ')) AS dl
        FROM documents WHERE text IS NOT NULL
    ), totals AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
        FROM docs
    ), queries(query_id, qtext) AS (
        VALUES {", ".join(f"('{qid}', '{qt}')" for qid, qt in _BM25_QUERIES)}
    ), qterms AS (
        SELECT DISTINCT query_id, unnest(string_split(qtext, ' ')) AS term
        FROM queries
    ), posting AS (
        SELECT d.doc_id, w.term, CAST(COUNT(*) AS BIGINT) AS tf, MAX(d.dl) AS dl
        FROM docs d, unnest(string_split(d.text, ' ')) AS w(term)
        WHERE w.term IN (SELECT term FROM qterms)
        GROUP BY d.doc_id, w.term
    ), dfreq AS (
        SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        FROM posting GROUP BY term
    ), contrib AS (
        SELECT q.query_id, p.doc_id,
               CAST(trunc(
                   ln(1.0 + (t.n_docs - df + 0.5) / (df + 0.5))
                   * (p.tf * ({_BM25_K1} + 1.0))
                   / (p.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                      + {_BM25_B} * p.dl / t.avgdl))
                   * 1000000 + 0.5) AS BIGINT) AS c
        FROM posting p
        JOIN qterms q USING (term)
        JOIN dfreq USING (term)
        CROSS JOIN totals t
    ), scored AS (
        SELECT query_id, doc_id,
               CAST(SUM(c) AS DOUBLE) / 1000000.0 AS score
        FROM contrib GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, CAST(rnk AS INT) AS rank, score
    FROM (
        SELECT query_id, doc_id, score,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, doc_id) AS rnk
        FROM scored
    ) WHERE rnk <= {_BM25_TOPK}
    """,
    ref="SURVEY §2 K66 [EXT] (Okapi BM25 top-k lexical retrieval — the "
    "sparse-retrieval complement of the dense ANN family; Robertson/"
    "Spärck Jones weighting, Lucene-smoothed idf)",
)
def llm_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval for a bounded query workload over the corpus.

    Scale shape (the inverted-index pattern without materializing one):
    the query-term dictionary (|terms| ~ 10) BROADCASTS; the exploded
    term stream is semi-filtered against it BEFORE any shuffle, so the
    posting aggregation exchanges only matching-term rows — at 100 TB the
    wide shuffles carry (doc, query_term) postings, never the corpus
    vocabulary. Doc length dl is computed narrowly per row (size(words)),
    avgdl/N in a broadcast 1-row aggregate; scores quantize each term
    contribution to 6 decimals and accumulate exactly in longs (the
    registry dsum discipline), making the ranking deterministic across
    partition orders and engines. Top-k is a per-query window over
    |queries| x |matched docs| rows, partitioned by query_id."""
    d = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # Tokenize ONCE per doc (r14, guide §1.2 per-task work): explode()
    # lives in a Generate node, so a sibling `size(words(text))` column
    # lands in the Project ABOVE it and re-splits the document once per
    # emitted token — O(len²) splits per doc (measured 4.2-4.5 s vs 0.5 s
    # for the corpus token stream at sf0.1). Projecting the array first
    # makes dl an O(1) array-length read per row.
    docs = d.select("doc_id", text.words("text").alias("w")).select(
        "doc_id", F.explode("w").alias("term"), F.size("w").alias("dl")
    )
    totals = d.select(F.size(text.words("text")).alias("dl")).agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*").cast("double")).alias("avgdl"),
    )
    qterms = d.sparkSession.createDataFrame(
        sorted({(qid, t) for qid, q in _BM25_QUERIES for t in q.split()}),
        "query_id string, term string",
    )
    # Lazy pin: posting feeds BOTH dfreq and contrib — un-pinned, the
    # corpus-wide explode + broadcast-term filter + (doc, term) aggregation
    # executes twice per plan (guide §1.2 step 1). The pinned payload is
    # the (doc_id, term, tf, dl) posting list — query-term-bounded, never
    # the corpus text.
    posting = scale_pin(
        docs.join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"), F.max("dl").alias("dl")),
        eager=False,
    )
    dfreq = posting.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    contrib = (
        posting.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(totals))
        .select(
            "query_id",
            "doc_id",
            (
                idf
                * (F.col("tf") * (_BM25_K1 + 1.0))
                / (
                    F.col("tf")
                    + _BM25_K1
                    * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
                )
                * 1000000.0
                + 0.5
            )
            .cast("long")
            .alias("c"),
        )
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        (F.sum("c").cast("double") / 1000000.0).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _BM25_TOPK)
        .select("query_id", "doc_id", F.col("rank").cast("int").alias("rank"), "score")
    )


_RRF_K = 60
_RRF_N_PER = 20
_RRF_TOPK = 10


def _query_doc_rankings(spark: SparkSession, sf_dir: str):
    """Shared sparse/dense top-N rankings for the query docs (<3): BM25
    over each query doc's own words and cosine over its embedding, self
    excluded, ranks 1.._RRF_N_PER — ONE definition consumed by RRF fusion
    (K70) and the retriever-agreement diagnostic (K91), mirrored by the
    shared _QDOC_RANK_CTES oracle prefix."""
    d = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # ---- sparse: BM25 with the query docs' distinct words as terms
    qterms = d.where(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"),
        F.explode(F.array_distinct(text.words("text"))).alias("term"),
    )
    # Tokenize ONCE per doc + lazy-pin the posting list — same two devices
    # as llm_bm25_topk (see the comments there): the sibling size() column
    # otherwise re-splits per emitted token, and posting feeds both dfreq
    # and contrib.
    docs = d.select("doc_id", text.words("text").alias("w")).select(
        "doc_id", F.explode("w").alias("term"), F.size("w").alias("dl")
    )
    totals = d.select(F.size(text.words("text")).alias("dl")).agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*").cast("double")).alias("avgdl"),
    )
    posting = scale_pin(
        docs.join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"), F.max("dl").alias("dl")),
        eager=False,
    )
    dfreq = posting.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    contrib = (
        posting.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(totals))
        .where(F.col("doc_id") != F.col("query_id"))
        .select(
            "query_id",
            "doc_id",
            (
                idf
                * (F.col("tf") * (_BM25_K1 + 1.0))
                / (
                    F.col("tf")
                    + _BM25_K1
                    * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
                )
                * 1000000.0
                + 0.5
            )
            .cast("long")
            .alias("c"),
        )
    )
    sw = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    srn = (
        contrib.groupBy("query_id", "doc_id")
        .agg(F.sum("c").alias("score"))
        .withColumn("sparse_rank", F.row_number().over(sw))
        .where(F.col("sparse_rank") <= _RRF_N_PER)
        .select("query_id", "doc_id", "sparse_rank")
    )
    # ---- dense: cosine top-N per query embedding (llm_sim_topk shape)
    e = load(spark, sf_dir, "embeddings").withColumn(
        "v_norm", vectors.l2_norm("embedding")
    )
    q = e.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("v_norm").alias("q_norm"),
    )
    cos = F.try_divide(
        vectors.dot("q_emb", "embedding"), F.col("q_norm") * F.col("v_norm")
    )
    dw = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("doc_id")
    )
    dense = (
        F.broadcast(q)
        .crossJoin(e)
        .where(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("doc_id"), cos.alias("cosine"))
        .withColumn("dense_rank", F.row_number().over(dw))
        .where(F.col("dense_rank") <= _RRF_N_PER)
        .select("query_id", "doc_id", "dense_rank")
    )
    return srn, dense


_QDOC_RANK_CTES = f"""docs AS (
        SELECT doc_id, text, len(string_split(text, ' ')) AS dl
        FROM documents WHERE text IS NOT NULL
    ), totals AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
        FROM docs
    ), qterms AS (
        SELECT DISTINCT doc_id AS query_id,
               unnest(string_split(text, ' ')) AS term
        FROM documents WHERE doc_id < 3
    ), posting AS (
        SELECT d.doc_id, w.term, CAST(COUNT(*) AS BIGINT) AS tf, MAX(d.dl) AS dl
        FROM docs d, unnest(string_split(d.text, ' ')) AS w(term)
        WHERE w.term IN (SELECT term FROM qterms)
        GROUP BY d.doc_id, w.term
    ), dfreq AS (
        SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        FROM posting GROUP BY term
    ), contrib AS (
        SELECT q.query_id, p.doc_id,
               CAST(trunc(
                   ln(1.0 + (t.n_docs - df + 0.5) / (df + 0.5))
                   * (p.tf * ({_BM25_K1} + 1.0))
                   / (p.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                      + {_BM25_B} * p.dl / t.avgdl))
                   * 1000000 + 0.5) AS BIGINT) AS c
        FROM posting p
        JOIN qterms q USING (term)
        JOIN dfreq USING (term)
        CROSS JOIN totals t
        WHERE p.doc_id <> q.query_id
    ), sparse AS (
        SELECT query_id, doc_id,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY SUM(c) DESC, doc_id) AS r
        FROM contrib GROUP BY query_id, doc_id
    ), srn AS (SELECT * FROM sparse WHERE r <= {_RRF_N_PER}),
    dense AS (
        SELECT query_id, doc_id, rn FROM (
            SELECT q.vec_id AS query_id, v.vec_id AS doc_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY {_dot_sql('q.embedding', 'v.embedding')}
                                / ({_norm_sql('q.embedding')}
                                   * {_norm_sql('v.embedding')})
                                DESC, v.vec_id) AS rn
            FROM (SELECT * FROM embeddings WHERE vec_id < 3) q
            CROSS JOIN embeddings v
            WHERE q.vec_id <> v.vec_id
        ) WHERE rn <= {_RRF_N_PER}
    )"""


@query(
    "llm_rrf_hybrid",
    oracle=f"""
    WITH {_QDOC_RANK_CTES}, fused AS (
        SELECT COALESCE(s.query_id, d.query_id) AS query_id,
               COALESCE(s.doc_id, d.doc_id) AS doc_id,
               s.r AS sparse_rank, d.rn AS dense_rank,
               CAST(CAST(trunc(
                   (COALESCE(1.0 / ({_RRF_K} + s.r), 0.0)
                    + COALESCE(1.0 / ({_RRF_K} + d.rn), 0.0))
                   * 100000000 + 0.5) AS BIGINT) AS DOUBLE) / 100000000.0
                   AS rrf_score
        FROM srn s FULL JOIN dense d
          ON s.query_id = d.query_id AND s.doc_id = d.doc_id
    )
    SELECT query_id, doc_id, rrf_score,
           CAST(sparse_rank AS INT) AS sparse_rank,
           CAST(dense_rank AS INT) AS dense_rank
    FROM (
        SELECT *, row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY rrf_score DESC, doc_id) AS final_r
        FROM fused
    ) WHERE final_r <= {_RRF_TOPK}
    """,
    ref="SURVEY §2 K70 [EXT] (reciprocal-rank fusion of sparse BM25 (K66) "
    "and dense cosine (K3) rankings — query-by-document hybrid retrieval, "
    "RRF(d) = sum over rankers of 1/(60 + rank); Cormack/Clarke/Buettcher "
    "fusion, the standard hybrid-search combiner)",
)
def llm_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval for query docs 0..2: each query's OWN text drives a
    BM25 ranking and its OWN embedding drives a cosine ranking (self
    excluded from both); the two top-20 lists fuse by reciprocal rank and
    the top-10 fused results are returned with the per-ranker ranks.

    Determinism: BM25 scores use the quantized-contribution discipline of
    llm_bm25_topk; cosine uses the bit-reproducible fold of llm_sim_topk;
    RRF terms 1/(60+rank) are rationals of small integers evaluated
    identically in IEEE, quantized to 8 decimals before the final ordering.

    Scale shape: the sparse side is K66's broadcast-term-filtered posting
    pipeline (per-query-doc term sets are bounded by doc length); the
    dense side is K3's broadcast-query narrow corpus pass; the fusion is
    a full outer join of two |queries| x 20 rank lists — trivially
    broadcastable at any corpus size."""
    srn, dense = _query_doc_rankings(spark, sf_dir)
    # ---- fuse
    fused = srn.join(dense, ["query_id", "doc_id"], "full")
    rrf = (
        (
            F.coalesce(F.lit(1.0) / (_RRF_K + F.col("sparse_rank")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (_RRF_K + F.col("dense_rank")), F.lit(0.0))
        )
        * 100000000.0
        + 0.5
    ).cast("long").cast("double") / 100000000.0
    fw = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id")
    )
    return (
        fused.withColumn("rrf_score", rrf)
        .withColumn("final_r", F.row_number().over(fw))
        .where(F.col("final_r") <= _RRF_TOPK)
        .select(
            "query_id",
            "doc_id",
            "rrf_score",
            F.col("sparse_rank").cast("int").alias("sparse_rank"),
            F.col("dense_rank").cast("int").alias("dense_rank"),
        )
    )


@query(
    "llm_substring_dedup_apply",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    g AS (
        SELECT doc_id, CAST(i AS INT) AS pos,
               md5(array_to_string(w[i:i+7], ' ')) AS gram_md5
        FROM toks, unnest(range(1, len(w) - 6)) AS t(i)
        WHERE len(w) >= 8
    ),
    dupg AS (
        SELECT gram_md5 FROM g GROUP BY gram_md5
        HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    occ AS (SELECT g.* FROM g JOIN dupg USING (gram_md5)),
    canon AS (
        SELECT gram_md5, min({'d': doc_id, 'p': pos}) AS c
        FROM occ GROUP BY gram_md5
    ),
    noncanon AS (
        SELECT o.doc_id, o.pos
        FROM occ o JOIN canon USING (gram_md5)
        WHERE NOT (o.doc_id = c['d'] AND o.pos = c['p'])
    ),
    cut AS (
        SELECT DISTINCT doc_id, pos + CAST(k AS INT) AS p
        FROM noncanon, unnest(range(0, 8)) AS t(k)
    ),
    tok AS (
        SELECT doc_id, CAST(i AS INT) AS p, w[i] AS tk
        FROM toks, unnest(range(1, len(w) + 1)) AS t(i)
    ),
    kept AS (
        SELECT t.doc_id, t.p, t.tk
        FROM tok t LEFT JOIN cut c ON t.doc_id = c.doc_id AND t.p = c.p
        WHERE c.p IS NULL
    )
    SELECT d.doc_id,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
           CAST(COALESCE(nc.n_cut, 0) AS BIGINT) AS n_cut,
           COALESCE(k.text_clean, '') AS text_clean
    FROM documents d
    LEFT JOIN (SELECT doc_id, string_agg(tk, ' ' ORDER BY p) AS text_clean
               FROM kept GROUP BY doc_id) k USING (doc_id)
    LEFT JOIN (SELECT doc_id, COUNT(*) AS n_cut FROM cut GROUP BY doc_id)
        nc USING (doc_id)
    """,
    ref="SURVEY §2 K38 [EXT] (the APPLY step of Lee et al. 2022 substring "
    "dedup: cut every token covered by a non-canonical occurrence of a "
    "cross-document duplicated 8-gram — canonical = lexicographic-min "
    "(doc, pos) — and reassemble the kept tokens; completes K38's span "
    "DETECTION with the surgery a pipeline actually ships)",
)
def llm_substring_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-deduplicated corpus: every occurrence of a cross-document
    duplicated 8-token window is removed except the single canonical one
    (global lexicographic-min (doc_id, pos) per gram), and each document's
    surviving tokens are reassembled in order. Returns (doc_id, n_tokens,
    n_cut, text_clean) for EVERY document, untouched docs included.

    Scale shape: gram digests shuffle exactly as llm_substring_dup_spans
    (16-byte md5 keys, never gram text); the canonical pick is a min-STRUCT
    AGG per gram — a hash agg, deliberately not a per-gram window, so a
    boilerplate gram with millions of occurrences partial-aggregates
    map-side instead of sorting one giant partition; span->position
    coverage is a bounded x8 explode; the rebuild is a document-scoped
    collect_list (bounded by doc length, the llm_chunk_sliding posture)."""
    d = load(spark, sf_dir, "documents")
    # LAZY pins (r14, guide §1.2/§2.4 — VERDICT r13 item 7 decomposition):
    # the pre-pin plan held 10 parquet scans / 11 Generates and ZERO
    # ReusedExchange — `g` (scan + shingle posexplode + md5) re-derived 6x
    # because `occ` feeds both `canon` and `noncanon`, and the whole
    # noncanon -> x8 explode -> distinct chain re-derived for BOTH `cut`
    # consumers (the kept anti-join and the n_cut agg). Three pins collapse
    # that: g computes once (digest rows only — the text column never rides
    # a pin or an exchange), occ once (the duplicated subset of g), cut
    # once (two integer columns per row).
    g = scale_pin(
        d.select(
            "doc_id",
            F.posexplode(text.shingles("text", 8)).alias("pos0", "gram"),
        ).select(
            "doc_id",
            (F.col("pos0") + 1).alias("pos"),
            F.md5(F.col("gram").cast("binary")).alias("gram_md5"),
        ),
        eager=False,
    )
    dupg = (
        g.groupBy("gram_md5")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("gram_md5")
    )
    occ = scale_pin(g.join(dupg, "gram_md5"), eager=False)
    canon = occ.groupBy("gram_md5").agg(
        F.min(
            F.struct(F.col("doc_id").alias("d"), F.col("pos").alias("p"))
        ).alias("c")
    )
    noncanon = (
        occ.join(canon, "gram_md5")
        .where(
            ~(
                (F.col("doc_id") == F.col("c.d"))
                & (F.col("pos") == F.col("c.p"))
            )
        )
        .select("doc_id", "pos")
    )
    cut = scale_pin(
        noncanon.select(
            "doc_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + 7)).alias("p"),
        ).distinct(),
        eager=False,
    )
    tok = d.select(
        "doc_id", F.posexplode(text.words("text")).alias("pos0", "tk")
    ).select("doc_id", (F.col("pos0") + 1).alias("p"), "tk")
    kept = tok.join(cut, ["doc_id", "p"], "left_anti")
    clean = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "tk"))),
                lambda x: x["tk"],
            ),
        ).alias("text_clean")
    )
    ncut = cut.groupBy("doc_id").agg(F.count("*").alias("n_cut"))
    return (
        d.select(
            "doc_id", F.size(text.words("text")).cast("bigint").alias("n_tokens")
        )
        .join(clean, "doc_id", "left")
        .join(ncut, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("n_cut"), F.lit(0)).cast("bigint").alias("n_cut"),
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
        )
    )


@query(
    "llm_keycollision_dedup",
    oracle="""
    WITH keyed AS (
        SELECT doc_id,
               array_to_string(
                   list_sort(list_distinct(string_split(text, ' '))),
                   ' ') AS ckey
        FROM documents WHERE text IS NOT NULL
    )
    SELECT MIN(doc_id) AS canonical_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(len(string_split(MIN(ckey), ' ')) AS INT) AS n_key_tokens
    FROM keyed
    GROUP BY ckey
    HAVING COUNT(*) > 1
    """,
    ref="SURVEY §2 K73 [EXT] (key-collision canonicalization dedup — the "
    "OpenRefine fingerprint-clustering method: canonical key = sorted "
    "distinct token set, so reorderings and repetitions of the same "
    "vocabulary collapse; the normalization-based layer between exact "
    "sha dedup (K1) and MinHash near-dup (K2))",
)
def llm_keycollision_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprint key-collision dedup: docs sharing a sorted-distinct-word
    key are duplicates regardless of word order or repetition counts.

    Scale shape: the canonical key is computed NARROWLY per row
    (split -> array_distinct -> array_sort, all JVM codegen), then hashed
    to a 32-byte sha2 digest so the single group-by exchange carries
    digests, never key text (the K1 exact-dedup posture; keys can be
    longer than the documents for short-vocab corpora). min/count
    partial-aggregate map-side, so a pathological key shared by 1e6 docs
    arrives at the reducer as one row per map partition. Key-token count
    is recomputed from the key itself (size of the array) rather than
    carried per row."""
    d = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    key_arr = F.array_sort(F.array_distinct(text.words("text")))
    keyed = d.select(
        "doc_id",
        F.sha2(F.array_join(key_arr, " "), 256).alias("ckey_digest"),
        F.size(key_arr).alias("nk"),
    )
    return (
        keyed.groupBy("ckey_digest")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count("*").alias("n_docs"),
            F.min("nk").cast("int").alias("n_key_tokens"),
        )
        .where(F.col("n_docs") > 1)
        .select("canonical_doc_id", "n_docs", "n_key_tokens")
    )


@query(
    "llm_eval_overlap_ratio",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    g AS (
        SELECT doc_id,
               unnest(list_distinct(
                   list_transform(range(1, len(w) - 3),
                                  i -> array_to_string(w[i:i+4], ' ')))) AS gram
        FROM toks
    ),
    eg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 29 = 0),
    cg AS (SELECT doc_id, gram FROM g WHERE doc_id % 29 <> 0)
    SELECT cg.doc_id AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(COUNT(eg.gram) AS BIGINT) AS n_overlap,
           CAST(trunc(CAST(COUNT(eg.gram) AS DOUBLE) / COUNT(*) * 1000000
                      + 0.5) AS BIGINT) AS overlap_ppm
    FROM cg LEFT JOIN eg ON cg.gram = eg.gram
    GROUP BY cg.doc_id
    """,
    ref="SURVEY §2 K74 [EXT] (contamination severity: per-train-doc "
    "fraction of distinct 5-grams shared with the eval split — the "
    "graded score behind K13's binary drop; the number reported in "
    "dataset cards as 'n-gram overlap with benchmarks')",
)
def llm_eval_overlap_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document eval-overlap severity: |distinct 5-grams ∩ eval grams|
    / |distinct 5-grams|, in ppm (exact integer — the registry quantization
    discipline; 0 for clean docs, which ARE reported, unlike K13).

    Scale shape: identical to llm_decontaminate — the eval gram set is
    benchmark-sized regardless of corpus size, deduplicated and BROADCAST;
    the corpus side stays a narrow scan -> per-doc distinct-gram explode
    -> left join against the broadcast -> one groupBy(doc_id) exchange
    whose width is the corpus doc count, not the gram count. The ratio
    denominator comes from the same aggregation (COUNT(*) over the doc's
    grams) — no second pass over the corpus."""
    d = load(spark, sf_dir, "documents")
    grams5 = F.array_distinct(text.shingles("text", 5))
    eval_g = (
        d.where(F.col("doc_id") % 29 == 0)
        .select(F.explode(grams5).alias("gram"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    corpus_g = d.where(F.col("doc_id") % 29 != 0).select(
        "doc_id", F.explode(grams5).alias("gram")
    )
    joined = corpus_g.join(F.broadcast(eval_g), "gram", "left")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.count("hit").alias("n_overlap"),
            (
                F.count("hit").cast("double")
                / F.count("*")
                * 1000000.0
                + 0.5
            )
            .cast("long")
            .alias("overlap_ppm"),
        )
        .select("doc_id", "n_grams", "n_overlap", "overlap_ppm")
    )


_KEYNESS_TOPK = 5


@query(
    "llm_source_keyness",
    oracle=f"""
    WITH toks AS (
        SELECT source, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE text IS NOT NULL
    ), sw AS (
        SELECT source, w, CAST(COUNT(*) AS BIGINT) AS a
        FROM toks GROUP BY source, w
    ), stot AS (
        SELECT source, CAST(SUM(a) AS BIGINT) AS c FROM sw GROUP BY source
    ), wtot AS (
        SELECT w, CAST(SUM(a) AS BIGINT) AS ab FROM sw GROUP BY w
    ), tot AS (
        SELECT CAST(SUM(a) AS BIGINT) AS cd FROM sw
    ), scored AS (
        SELECT sw.source, sw.w, sw.a,
               CAST(trunc(2.0 * (
                   CAST(sw.a AS DOUBLE)
                   * ln(CAST(sw.a AS DOUBLE)
                        / (CAST(stot.c AS DOUBLE) * CAST(wtot.ab AS DOUBLE)
                           / CAST(tot.cd AS DOUBLE)))
                   + CASE WHEN wtot.ab - sw.a = 0 THEN 0.0
                     ELSE CAST(wtot.ab - sw.a AS DOUBLE)
                          * ln(CAST(wtot.ab - sw.a AS DOUBLE)
                               / (CAST(tot.cd - stot.c AS DOUBLE)
                                  * CAST(wtot.ab AS DOUBLE)
                                  / CAST(tot.cd AS DOUBLE)))
                     END) * 1000000 + 0.5) AS BIGINT) AS g2_q6
        FROM sw
        JOIN stot USING (source)
        JOIN wtot USING (w)
        CROSS JOIN tot
    )
    SELECT source, w AS term, a AS n_in_source,
           CAST(g2_q6 AS DOUBLE) / 1000000.0 AS g2,
           CAST(rnk AS INT) AS rank
    FROM (
        SELECT *, row_number() OVER (PARTITION BY source
                                     ORDER BY g2_q6 DESC, w) AS rnk
        FROM scored
    ) WHERE rnk <= {_KEYNESS_TOPK}
    """,
    ref="SURVEY §2 K75 [EXT] (per-source keyness: the Rayson & Garside "
    "2000 two-term log-likelihood (the corpus-linguistics keyness form "
    "of Dunning 1993 G², using the two observed-presence cells) of each "
    "term's source-vs-rest contingency; surfaces what makes a source "
    "DISTINCTIVE, complementing KL divergence (K68) which scores whole "
    "distributions)",
)
def llm_source_keyness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 signature terms per source by Dunning G² keyness (observed
    vs expected token counts, source vs rest-of-corpus). The two G² terms
    use observed counts a and (ab - a) against expectations proportional
    to source/rest token mass; zero-observed terms contribute 0 (the
    x·ln(x) → 0 limit). Scores quantize to 1e-6 BEFORE ranking so the
    top-k is deterministic cross-engine; ties break on the term.

    Scale shape: one (source, word) hash agg with map-side combine is the
    only corpus-wide exchange (output is vocab × sources, not tokens);
    source totals (|sources| rows), word totals (vocab rows — at 100 TB a
    HAVING floor or CMS pre-filter bounds this, the llm_vocab_topk
    argument), and the 1-row grand total all BROADCAST back onto the
    vocab-sized frame. The rank window partitions by source over
    vocab-bounded rows — never data-sized."""
    d = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    toks = d.select("source", F.explode(text.words("text")).alias("w"))
    sw = toks.groupBy("source", "w").agg(F.count("*").alias("a"))
    stot = sw.groupBy("source").agg(F.sum("a").alias("c"))
    wtot = sw.groupBy("w").agg(F.sum("a").alias("ab"))
    tot = sw.agg(F.sum("a").alias("cd"))
    ad = F.col("a").cast("double")
    bd = (F.col("ab") - F.col("a")).cast("double")
    e1 = F.col("c").cast("double") * F.col("ab").cast("double") / F.col("cd").cast("double")
    e2 = (
        (F.col("cd") - F.col("c")).cast("double")
        * F.col("ab").cast("double")
        / F.col("cd").cast("double")
    )
    g2 = 2.0 * (
        ad * F.log(ad / e1)
        + F.when(F.col("ab") - F.col("a") == 0, F.lit(0.0)).otherwise(
            bd * F.log(bd / e2)
        )
    )
    scored = (
        sw.join(F.broadcast(stot), "source")
        .join(wtot, "w")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "w",
            "a",
            (g2 * 1000000 + 0.5).cast("bigint").alias("g2_q6"),
        )
    )
    rw = Window.partitionBy("source").orderBy(F.col("g2_q6").desc(), F.col("w"))
    return (
        scored.withColumn("rank", F.row_number().over(rw))
        .where(F.col("rank") <= _KEYNESS_TOPK)
        .select(
            "source",
            F.col("w").alias("term"),
            F.col("a").alias("n_in_source"),
            (F.col("g2_q6").cast("double") / 1000000.0).alias("g2"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


@query(
    "llm_unigram_surprisal",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE text IS NOT NULL
    ), wc AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY w
    ), tot AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM wc
    ), per_tok AS (
        SELECT t.doc_id,
               CAST(trunc(-ln(CAST(wc.cnt AS DOUBLE) / CAST(tot.n AS DOUBLE))
                          * 1000000 + 0.5) AS BIGINT) AS s_q6
        FROM toks t JOIN wc USING (w) CROSS JOIN tot
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(s_q6) AS DOUBLE) / COUNT(*) / 1000000.0
               AS mean_surprisal_nats
    FROM per_tok GROUP BY doc_id
    """,
    ref="SURVEY §2 K77 [EXT] (unigram surprisal: per-doc mean -ln p(w) "
    "under the corpus MLE unigram LM — the cheapest perplexity proxy in "
    "the quality-filter ladder, below bigram coherence (K50); low = "
    "repetitive/boilerplate, high = rare-token noise)",
)
def llm_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean token surprisal per document under the corpus's own unigram
    distribution (MLE — every corpus token has p > 0 by construction).
    Per-token surprisals quantize to 1e-6 and accumulate in exact longs,
    so the per-doc mean is partition-order deterministic.

    Scale shape: one vocab-sized word-count agg (map-side combined); the
    count table joins back onto the exploded token stream — broadcast
    while the vocabulary fits (it does by orders of magnitude at any
    corpus size once HAVING-floored; un-floored web vocab would shuffle
    on the word key, the llm_vocab_topk argument), then ONE groupBy
    (doc_id) whose width is the doc count. The 1-row total broadcasts."""
    d = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    toks = d.select("doc_id", F.explode(text.words("text")).alias("w"))
    wc = toks.groupBy("w").agg(F.count("*").alias("cnt"))
    tot = wc.agg(F.sum("cnt").alias("n"))
    per_tok = (
        toks.join(F.broadcast(wc), "w")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            (
                -F.log(F.col("cnt").cast("double") / F.col("n").cast("double"))
                * 1000000
                + 0.5
            )
            .cast("bigint")
            .alias("s_q6"),
        )
    )
    return per_tok.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        (F.sum("s_q6").cast("double") / F.count("*") / 1000000.0).alias(
            "mean_surprisal_nats"
        ),
    )


_COLLOC_MIN_COUNT = 5
_COLLOC_TOPK = 20


@query(
    "llm_collocations",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS w
        FROM documents WHERE text IS NOT NULL
    ), big AS (
        SELECT w[i] AS w1, w[i + 1] AS w2
        FROM toks, unnest(range(1, len(w))) AS r(i)
    ), bc AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS nb
        FROM big GROUP BY w1, w2
    ), tot AS (
        SELECT CAST(SUM(nb) AS BIGINT) AS n FROM bc
    ), u1 AS (
        SELECT w1 AS w, CAST(SUM(nb) AS BIGINT) AS c1 FROM bc GROUP BY w1
    ), u2 AS (
        SELECT w2 AS w, CAST(SUM(nb) AS BIGINT) AS c2 FROM bc GROUP BY w2
    ), scored AS (
        SELECT bc.w1, bc.w2, bc.nb,
               CAST(trunc(ln(CAST(bc.nb AS DOUBLE) * CAST(tot.n AS DOUBLE)
                             / (CAST(u1.c1 AS DOUBLE)
                                * CAST(u2.c2 AS DOUBLE)))
                          * 1000000 + 0.5) AS BIGINT) AS pmi_q6
        FROM bc
        JOIN u1 ON bc.w1 = u1.w
        JOIN u2 ON bc.w2 = u2.w
        CROSS JOIN tot
        WHERE bc.nb >= {_COLLOC_MIN_COUNT}
    )
    SELECT w1, w2, nb AS n_pair,
           CAST(pmi_q6 AS DOUBLE) / 1000000.0 AS pmi,
           CAST(rnk AS INT) AS rank
    FROM (
        SELECT *, row_number() OVER (ORDER BY pmi_q6 DESC, w1, w2) AS rnk
        FROM scored
    ) WHERE rnk <= {_COLLOC_TOPK}
    """,
    ref="SURVEY §2 K78 [EXT] (PMI collocation extraction: top bigrams by "
    "pointwise mutual information with a count floor — Church & Hanks "
    "1990, the classic multiword-expression detector; the PAIR-level "
    "association complement of bigram coherence (K50), which scores "
    "docs, not pairs)",
)
def llm_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 collocations by PMI = ln(p(w1,w2) / p(w1·)p(·w2)) over
    adjacent-token bigrams, count floor 5 (PMI without a floor top-ranks
    hapax pairs — the textbook failure mode). Unigram margins are the
    bigram table's own row sums, so numerator and denominators live on one
    vocabulary-sized frame. PMI quantizes to 1e-6 before ranking.

    Scale shape: bigrams are a NARROW per-doc zip (no self-join); the one
    corpus-wide exchange is the (w1, w2) hash agg with map-side combine —
    output is bigram-vocabulary-sized. Margins re-aggregate that table
    (two vocab-sized aggs) and join back; at 100 TB the count floor is
    applied BEFORE the margin joins, collapsing the frame to frequent
    pairs. The final top-k is TakeOrderedAndProject-sized (rank over the
    floored pair set)."""
    d = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    w = text.words("text")
    # greatest(…, 0): an empty/whitespace-only doc has size(w) = 0 and a
    # raw size-1 length aborts slice (degenerate-corpus net)
    big = d.select(
        F.explode(
            F.zip_with(
                F.slice(w, 1, F.greatest(F.size(w) - 1, F.lit(0))),
                F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    bc = big.groupBy("w1", "w2").agg(F.count("*").alias("nb"))
    tot = bc.agg(F.sum("nb").alias("n"))
    u1 = bc.groupBy("w1").agg(F.sum("nb").alias("c1"))
    u2 = bc.groupBy("w2").agg(F.sum("nb").alias("c2"))
    pmi = F.log(
        F.col("nb").cast("double")
        * F.col("n").cast("double")
        / (F.col("c1").cast("double") * F.col("c2").cast("double"))
    )
    scored = (
        bc.where(F.col("nb") >= _COLLOC_MIN_COUNT)
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "nb",
            (pmi * 1000000 + 0.5).cast("bigint").alias("pmi_q6"),
        )
    )
    # top-k via orderBy+limit (TakeOrderedAndProject) — the candidate bigram
    # set is corpus-scale, so a global row_number window would funnel it all
    # through one partition before discarding all but k (the sf10 AA lesson,
    # SCALE.md round 9); the 20-row rank window after the limit is free.
    # Bit-exact: (pmi_q6 DESC, w1, w2) is a total order.
    top = scored.orderBy(F.col("pmi_q6").desc(), "w1", "w2").limit(_COLLOC_TOPK)
    rw = Window.orderBy(F.col("pmi_q6").desc(), "w1", "w2")
    return (
        top.withColumn("rank", F.row_number().over(rw))
        .select(
            "w1",
            "w2",
            F.col("nb").alias("n_pair"),
            (F.col("pmi_q6").cast("double") / 1000000.0).alias("pmi"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


@query(
    "llm_lang_source_mi",
    oracle="""
    WITH cell AS (
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS c
        FROM documents GROUP BY lang, source
    ), tot AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n FROM cell
    ), ml AS (
        SELECT lang, CAST(SUM(c) AS BIGINT) AS cl FROM cell GROUP BY lang
    ), ms AS (
        SELECT source, CAST(SUM(c) AS BIGINT) AS cs FROM cell GROUP BY source
    ), terms AS (
        SELECT CAST(trunc(
                   (CAST(cell.c AS DOUBLE) / CAST(tot.n AS DOUBLE))
                   * ln(CAST(cell.c AS DOUBLE) * CAST(tot.n AS DOUBLE)
                        / (CAST(ml.cl AS DOUBLE) * CAST(ms.cs AS DOUBLE)))
                   * 1000000000 + 0.5) AS BIGINT) AS t_q9
        FROM cell
        JOIN ml USING (lang)
        JOIN ms USING (source)
        CROSS JOIN tot
    )
    SELECT (SELECT n FROM tot) AS n_docs,
           CAST(SUM(t_q9) AS DOUBLE) / 1000000000.0 AS mi_nats
    FROM terms
    """,
    ref="SURVEY §2 K79 [EXT] (lang x source mutual information: "
    "I(lang; source) in nats over the document metadata contingency — "
    "the single-number redundancy check behind the K63 confusion matrix: "
    "MI ~ 0 means language adds nothing a source label doesn't already "
    "say, high MI means per-source language mixes diverge)",
)
def llm_lang_source_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between the declared language and source labels:
    sum over cells of p(l,s)·ln(p(l,s)/(p(l)p(s))), per-cell terms
    quantized to 1e-9 (terms are < 1) and summed exactly.

    Scale shape: ONE (lang, source) hash agg is the only corpus-wide
    exchange; everything after operates on the |langs| x |sources| cell
    table (both label domains are bounded), margins re-aggregated from
    the cells and broadcast back. Output is one row."""
    d = load(spark, sf_dir, "documents")
    cell = d.groupBy("lang", "source").agg(F.count("*").alias("c"))
    tot = cell.agg(F.sum("c").alias("n"))
    ml = cell.groupBy("lang").agg(F.sum("c").alias("cl"))
    ms = cell.groupBy("source").agg(F.sum("c").alias("cs"))
    term = (
        (F.col("c").cast("double") / F.col("n").cast("double"))
        * F.log(
            F.col("c").cast("double")
            * F.col("n").cast("double")
            / (F.col("cl").cast("double") * F.col("cs").cast("double"))
        )
        * 1000000000
        + 0.5
    ).cast("bigint")
    terms = (
        cell.join(F.broadcast(ml), "lang")
        .join(F.broadcast(ms), "source")
        .crossJoin(F.broadcast(tot))
        .select(F.col("n"), term.alias("t_q9"))
    )
    return terms.groupBy("n").agg(
        (F.sum("t_q9").cast("double") / 1000000000.0).alias("mi_nats")
    ).select(F.col("n").alias("n_docs"), "mi_nats")


_BPE_TOPK = 5


@query(
    "llm_bpe_merges",
    oracle=f"""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS word
        FROM documents WHERE text IS NOT NULL
    ), wc AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY word
    ), p1 AS (
        SELECT c[i] AS s1, c[i + 1] AS s2, n
        FROM (SELECT string_split(word, '') AS c, n FROM wc),
             unnest(range(1, len(c))) AS r(i)
    ), stats1 AS (
        SELECT s1, s2, CAST(SUM(n) AS BIGINT) AS weight
        FROM p1 GROUP BY s1, s2
    ), best1 AS (
        SELECT s1 AS b1, s2 AS b2 FROM stats1
        ORDER BY weight DESC, s1, s2 LIMIT 1
    ), wc2 AS (
        SELECT replace(word, b1 || b2, chr(1)) AS word, n
        FROM wc, best1
    ), p2 AS (
        SELECT c[i] AS s1, c[i + 1] AS s2, n
        FROM (SELECT string_split(word, '') AS c, n FROM wc2),
             unnest(range(1, len(c))) AS r(i)
    ), stats2 AS (
        SELECT s1, s2, CAST(SUM(n) AS BIGINT) AS weight
        FROM p2 GROUP BY s1, s2
    ), top1 AS (
        SELECT 1 AS iteration, s1, s2, weight,
               row_number() OVER (ORDER BY weight DESC, s1, s2) AS rnk
        FROM stats1
    ), top2 AS (
        SELECT 2 AS iteration, s1, s2, weight,
               row_number() OVER (ORDER BY weight DESC, s1, s2) AS rnk
        FROM stats2
    ), unioned AS (
        SELECT * FROM top1 WHERE rnk <= {_BPE_TOPK}
        UNION ALL
        SELECT * FROM top2 WHERE rnk <= {_BPE_TOPK}
    )
    SELECT CAST(iteration AS INT) AS iteration,
           CASE WHEN u.s1 = chr(1) THEN b.b1 || b.b2 ELSE u.s1 END AS sym1,
           CASE WHEN u.s2 = chr(1) THEN b.b1 || b.b2 ELSE u.s2 END AS sym2,
           u.weight, CAST(u.rnk AS INT) AS rank
    FROM unioned u CROSS JOIN best1 b
    """,
    ref="SURVEY §2 K81 [EXT] (BPE merge training, two genuine iterations: "
    "count adjacent symbol pairs over the word-frequency dictionary, "
    "apply the best merge (left-to-right non-overlapping replace — the "
    "canonical Sennrich et al. 2016 behavior), recount — the actual "
    "tokenizer-training step behind K34 token counting / K43 fertility)",
)
def llm_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two iterations of byte-pair-encoding training: top-5 pair stats
    before and after applying the first merge (merged symbol displayed as
    the concatenated pair). Iteration 2's counts genuinely reflect the
    applied merge — pairs overlapping the merged symbol disappear, new
    (merged, next) pairs appear — so this pins the iterative training
    loop, not just one pair count.

    Scale shape: classic BPE trains on the word-frequency DICTIONARY, not
    the corpus — the one corpus-wide exchange is the word-count agg
    (vocab-sized output, map-side combined). Everything after (char pair
    explode x ~avg-word-length, the 1-row argmax merge broadcast back,
    the replace + recount) is vocabulary-scale work repeated per merge;
    production BPE runs ~30k merges over exactly this loop shape with the
    dictionary cached. The merge marker is chr(1), outside the token
    alphabet."""
    d = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    wc = (
        d.select(F.explode(text.words("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )

    def pair_stats(words: DataFrame) -> DataFrame:
        c = F.split(F.col("word"), "")
        pairs = words.select(
            F.explode(
                F.zip_with(
                    F.slice(c, 1, F.size(c) - 1),
                    F.slice(c, 2, F.size(c) - 1),
                    lambda a, b: F.struct(a.alias("s1"), b.alias("s2")),
                )
            ).alias("p"),
            "n",
        ).select(F.col("p.s1").alias("s1"), F.col("p.s2").alias("s2"), "n")
        return pairs.groupBy("s1", "s2").agg(F.sum("n").alias("weight"))

    def topk(stats: DataFrame, it: int) -> DataFrame:
        w = Window.orderBy(F.col("weight").desc(), "s1", "s2")
        return (
            stats.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= _BPE_TOPK)
            .select(F.lit(it).alias("iteration"), "s1", "s2", "weight", "rnk")
        )

    stats1 = pair_stats(wc).localCheckpoint()
    best1 = (
        stats1.orderBy(F.col("weight").desc(), "s1", "s2")
        .limit(1)
        .select(F.col("s1").alias("b1"), F.col("s2").alias("b2"))
    )
    marker = F.expr("char(1)")
    wc2 = wc.crossJoin(F.broadcast(best1)).select(
        F.replace(
            F.col("word"), F.concat(F.col("b1"), F.col("b2")), marker
        ).alias("word"),
        "n",
    )
    stats2 = pair_stats(wc2)
    unioned = topk(stats1, 1).unionByName(topk(stats2, 2))

    def disp(col):
        return F.when(
            F.col(col) == marker, F.concat(F.col("b1"), F.col("b2"))
        ).otherwise(F.col(col))

    return unioned.crossJoin(F.broadcast(best1)).select(
        F.col("iteration").cast("int").alias("iteration"),
        disp("s1").alias("sym1"),
        disp("s2").alias("sym2"),
        "weight",
        F.col("rnk").cast("int").alias("rank"),
    )


@query(
    "llm_char_entropy",
    oracle="""
    WITH chars AS (
        SELECT doc_id, unnest(string_split(text, '')) AS ch
        FROM documents WHERE text IS NOT NULL
    ), cc AS (
        SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS c
        FROM chars GROUP BY doc_id, ch
    ), tot AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM cc GROUP BY doc_id
    )
    SELECT cc.doc_id, MAX(tot.n) AS n_chars,
           CAST(SUM(CAST(trunc(
               -(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
               * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
               * 1000000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000000.0
               AS entropy_nats
    FROM cc JOIN tot USING (doc_id)
    GROUP BY cc.doc_id
    """,
    ref="SURVEY §2 K85 [EXT] (character-level Shannon entropy per doc — "
    "the mojibake/binary-junk screen in the quality ladder: natural text "
    "sits in a narrow entropy band, base64/random bytes score high, "
    "run-length junk scores near zero; the CHARACTER-alphabet complement "
    "of word-level surprisal K77)",
)
def llm_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (nats) of each document's character distribution.
    Per-character terms -p·ln(p) quantize to 1e-9 (each < 1/e) and sum
    exactly, so the per-doc entropy is partition-order deterministic.

    Scale shape: one (doc_id, char) hash agg over the exploded character
    stream (map-side combine collapses each task to <= |alphabet| rows
    per doc), a doc-keyed total re-agg, and a co-partitioned join back —
    all exchanges carry (doc, char) or (doc) keys. Per-doc alphabet is
    bounded (<= 256 for bytes, small multiples for unicode text), so
    state never grows with doc length."""
    d = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    chars = d.select(
        "doc_id", F.explode(F.split(F.col("text"), "")).alias("ch")
    )
    cc = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("c"))
    tot = cc.groupBy("doc_id").agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n").cast("double")
    term = (-p * F.log(p) * 1000000000 + 0.5).cast("bigint")
    return (
        cc.join(tot, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.max("n").alias("n_chars"),
            (F.sum(term).cast("double") / 1000000000.0).alias("entropy_nats"),
        )
    )


@query(
    "llm_export_sft_records",
    oracle="""
    WITH base AS (
        SELECT doc_id, string_split(text, ' ') AS w, source, lang
        FROM documents
        WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 8
    )
    SELECT doc_id,
           '{"meta":{"id":' || CAST(doc_id AS VARCHAR)
           || ',"source":"' || source || '","lang":"' || lang
           || '"},"prompt":"'
           || replace(replace(array_to_string(w[1:4], ' '),
                              chr(92), chr(92) || chr(92)),
                      '"', chr(92) || '"')
           || '","completion":"'
           || replace(replace(array_to_string(w[5:len(w)], ' '),
                              chr(92), chr(92) || chr(92)),
                      '"', chr(92) || '"')
           || '"}' AS record
    FROM base
    """,
    ref="SURVEY §2 K88 [EXT] (SFT record export: split each doc into a "
    "4-token prompt prefix and a completion tail, emit one escaped "
    "JSONL training record with metadata — the terminal step of every "
    "curation pipeline (the REPL's INTO JSONL sink writes exactly these "
    "rows); manual field-ordered assembly, because engine to_json key "
    "order is not a cross-engine contract)",
)
def llm_export_sft_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prompt/completion JSONL records with metadata, one per sufficiently
    long document. Escaping handles backslash-then-quote in that order
    (the JSON-string minimum; corpus text is pre-scrubbed by K8 upstream)
    and the record is assembled with explicit field order — to_json's key
    ordering and whitespace are engine-internal, so a byte-stable export
    spells the layout itself.

    Scale shape: pure narrow projection (split, slice, replace, concat —
    all codegen), zero exchanges: export scales with scan bandwidth.
    Writing shards = repartition(n) + write, the K18 posture."""
    d = load(spark, sf_dir, "documents")
    w = text.words("text")
    base = d.where(
        F.col("text").isNotNull() & (F.size(w) >= 8)
    ).select("doc_id", w.alias("w"), "source", "lang")

    def esc(c):
        return F.replace(
            F.replace(c, F.lit("\\"), F.lit("\\\\")), F.lit('"'), F.lit('\\"')
        )

    prompt = esc(F.array_join(F.slice(F.col("w"), 1, 4), " "))
    completion = esc(
        F.array_join(
            F.slice(F.col("w"), 5, F.greatest(F.size("w") - 4, F.lit(0))), " "
        )
    )
    record = F.concat(
        F.lit('{"meta":{"id":'),
        F.col("doc_id").cast("string"),
        F.lit(',"source":"'),
        F.col("source"),
        F.lit('","lang":"'),
        F.col("lang"),
        F.lit('"},"prompt":"'),
        prompt,
        F.lit('","completion":"'),
        completion,
        F.lit('"}'),
    )
    return base.select("doc_id", record.alias("record"))


_PSI_BINS = 10


@query(
    "llm_score_drift_psi",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, CAST(doc_id % 29 = 0 AS INT) AS is_eval,
               CAST(len(string_split(text, ' ')) AS DOUBLE)
                   / greatest(n_chars, 1) AS score
        FROM documents WHERE text IS NOT NULL
    ), b AS (
        SELECT MIN(score) AS mn,
               (MAX(score) - MIN(score)) / {_PSI_BINS}.0 AS width
        FROM scored
    ), binned AS (
        SELECT is_eval,
               least({_PSI_BINS - 1},
                     CAST(floor((score - b.mn) / b.width) AS BIGINT)) AS bin
        FROM scored, b
    ), counts AS (
        SELECT bin,
               CAST(SUM(1 - is_eval) AS BIGINT) AS n_train,
               CAST(SUM(is_eval) AS BIGINT) AS n_eval
        FROM binned GROUP BY bin
    ), tot AS (
        SELECT CAST(SUM(n_train) AS BIGINT) AS tt,
               CAST(SUM(n_eval) AS BIGINT) AS te,
               CAST(COUNT(*) AS BIGINT) AS nb
        FROM counts
    ), terms AS (
        SELECT bin,
               (CAST(n_train AS DOUBLE) + 0.5) / (tt + 0.5 * nb) AS p,
               (CAST(n_eval AS DOUBLE) + 0.5) / (te + 0.5 * nb) AS q
        FROM counts, tot
    )
    SELECT CAST(SUM(CAST(trunc(
               (p - q) * ln(p / q) * 1000000000 + 0.5) AS BIGINT))
               AS DOUBLE) / 1000000000.0 AS psi,
           CAST(COUNT(*) AS BIGINT) AS n_bins
    FROM terms
    """,
    ref="SURVEY §2 K90 [EXT] (population stability index between the "
    "train and eval splits' quality-score distributions: "
    "sum (p-q)*ln(p/q) over equi-width score deciles with add-half "
    "Laplace smoothing — THE production drift gate (<0.1 stable, >0.25 "
    "shifted); the distribution-level complement of the K63 label audit "
    "and K68 source KL)",
)
def llm_score_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row PSI between train and eval on a cheap quality proxy
    (tokens-per-char). Deciles are equi-width bins over the pooled score
    range (the D21 binning); both distributions are add-half smoothed so
    an empty bin contributes a finite term; per-bin terms quantize at
    1e-9 and sum exactly.

    Scale shape: one narrow scoring pass, a 1-row bounds agg broadcast
    back, one bin-keyed count agg (<= 10 output rows, map-side
    combined), then constant-size math. The same sketch rows SUM-merge
    across shards, so PSI is computable incrementally (run_histogram_sink
    with a class column is the streaming form)."""
    d = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    scored = d.select(
        (F.col("doc_id") % 29 == 0).cast("int").alias("is_eval"),
        (
            F.size(text.words("text")).cast("double")
            / F.greatest(F.col("n_chars"), F.lit(1))
        ).alias("score"),
    )
    b = scored.agg(
        F.min("score").alias("mn"),
        ((F.max("score") - F.min("score")) / float(_PSI_BINS)).alias("width"),
    )
    binned = scored.crossJoin(F.broadcast(b)).select(
        "is_eval",
        F.least(
            F.lit(_PSI_BINS - 1),
            F.floor((F.col("score") - F.col("mn")) / F.col("width")),
        ).alias("bin"),
    )
    counts = binned.groupBy("bin").agg(
        F.sum(1 - F.col("is_eval")).alias("n_train"),
        F.sum("is_eval").alias("n_eval"),
    )
    tot = counts.agg(
        F.sum("n_train").alias("tt"),
        F.sum("n_eval").alias("te"),
        F.count("*").alias("nb"),
    )
    p = (F.col("n_train").cast("double") + 0.5) / (
        F.col("tt") + 0.5 * F.col("nb")
    )
    q = (F.col("n_eval").cast("double") + 0.5) / (
        F.col("te") + 0.5 * F.col("nb")
    )
    terms = counts.crossJoin(F.broadcast(tot)).select(
        (((p - q) * F.log(p / q)) * 1000000000 + 0.5).cast("bigint").alias("t_q9")
    )
    return terms.agg(
        (F.sum("t_q9").cast("double") / 1000000000.0).alias("psi"),
        F.count("*").alias("n_bins"),
    )


_AGREE_K = 5


@query(
    "llm_retriever_agreement",
    oracle=f"""
    WITH {_QDOC_RANK_CTES}
    SELECT s.query_id,
           CAST({_AGREE_K} AS INT) AS k,
           CAST(COUNT(d.doc_id) AS BIGINT) AS n_common,
           CAST(COUNT(d.doc_id) AS DOUBLE) / {_AGREE_K} AS overlap_at_k
    FROM (SELECT * FROM srn WHERE r <= {_AGREE_K}) s
    LEFT JOIN (SELECT * FROM dense WHERE rn <= {_AGREE_K}) d
      ON s.query_id = d.query_id AND s.doc_id = d.doc_id
    GROUP BY s.query_id
    """,
    ref="SURVEY §2 K91 [EXT] (retriever agreement diagnostic: "
    "intersection@5 between the BM25 (K66) and dense-cosine (K3) top "
    "lists per query — low overlap is WHY hybrid fusion (K70) wins: the "
    "rankers see different evidence; high overlap says one retriever "
    "suffices. Reuses ONE shared ranking definition with the RRF entry "
    "on both the Spark and oracle sides)",
)
def llm_retriever_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per query doc: how many of the sparse top-5 also appear in the
    dense top-5 (and the overlap ratio). The rankings are the SAME
    builders RRF fuses — this is the diagnostic read before deciding a
    hybrid stack is worth its cost.

    Scale shape: inherits the shared rankings' postures (broadcast-term
    BM25, broadcast-query dense pass); the agreement join is over two
    |queries| x 5 rank lists — constant-sized at any corpus size."""
    srn, dense = _query_doc_rankings(spark, sf_dir)
    s5 = srn.where(F.col("sparse_rank") <= _AGREE_K)
    d5 = dense.where(F.col("dense_rank") <= _AGREE_K).select(
        "query_id", F.col("doc_id").alias("d_doc")
    )
    return (
        s5.join(
            d5,
            (s5["query_id"] == d5["query_id"]) & (s5["doc_id"] == d5["d_doc"]),
            "left",
        )
        .groupBy(s5["query_id"].alias("query_id"))
        .agg(F.count("d_doc").alias("n_common"))
        .select(
            "query_id",
            F.lit(_AGREE_K).cast("int").alias("k"),
            "n_common",
            (F.col("n_common").cast("double") / float(_AGREE_K)).alias(
                "overlap_at_k"
            ),
        )
    )


@query(
    "llm_dedup_savings",
    oracle="""
    WITH g AS (
        SELECT sha256(text) AS h,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MIN(n_chars) AS BIGINT) AS sz
        FROM documents WHERE text IS NOT NULL
        GROUP BY sha256(text)
    )
    SELECT CAST(SUM(n) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_unique,
           CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_removed,
           CAST(SUM(n * sz) AS BIGINT) AS bytes_before,
           CAST(SUM(sz) AS BIGINT) AS bytes_after,
           CAST(trunc((1.0 - CAST(SUM(sz) AS DOUBLE) / SUM(n * sz))
                      * 1000000 + 0.5) AS BIGINT) / 1000000.0
               AS savings_ratio
    FROM g
    """,
    ref="SURVEY §2 K92 [EXT] (dedup savings report: corpus-level doc and "
    "byte reduction from exact dedup — the one-row summary every "
    "pipeline run logs before/after the K1 pass; per-group sizes are "
    "exact because exact-dup texts share n_chars (MIN = the one size))",
)
def llm_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What exact dedup buys: docs and bytes before/after keeping one
    copy per sha256 group, plus the savings ratio. Group size uses
    MIN(n_chars) — well-defined because byte-identical texts have one
    length.

    Scale shape: ONE digest-keyed hash agg (the K1 exchange — 32-byte
    keys, map-side combined), then a 1-row re-agg. Nothing else."""
    d = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    g = d.groupBy(F.sha2(F.col("text"), 256).alias("h")).agg(
        F.count("*").alias("n"), F.min("n_chars").alias("sz")
    )
    return g.agg(
        F.sum("n").alias("n_docs"),
        F.count("*").alias("n_unique"),
        (F.sum("n") - F.count("*")).alias("n_removed"),
        F.sum(F.col("n") * F.col("sz")).alias("bytes_before"),
        F.sum("sz").alias("bytes_after"),
        (
            (
                (1.0 - F.sum("sz").cast("double") / F.sum(F.col("n") * F.col("sz")))
                * 1000000
                + 0.5
            )
            .cast("bigint")
            .cast("double")
            / 1000000.0
        ).alias("savings_ratio"),
    )


_CTX_WINDOWS = (16, 32, 64, 128)


@query(
    "llm_context_window_plan",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents WHERE text IS NOT NULL
    ), w(win) AS (VALUES {", ".join(f"({w})" for w in _CTX_WINDOWS)})
    SELECT CAST(w.win AS INT) AS window_tokens,
           CAST(SUM(CASE WHEN n_tok <= w.win THEN 1 ELSE 0 END) AS BIGINT)
               AS docs_fitting,
           CAST(COUNT(*) AS BIGINT) AS docs_total,
           CAST(SUM(least(n_tok, w.win)) AS BIGINT) AS tokens_kept,
           CAST(SUM(n_tok) AS BIGINT) AS tokens_total,
           CAST(trunc((1.0 - CAST(SUM(least(n_tok, w.win)) AS DOUBLE)
                       / SUM(n_tok)) * 1000000 + 0.5) AS BIGINT)
               / 1000000.0 AS truncation_loss
    FROM toks CROSS JOIN w
    GROUP BY w.win
    """,
    ref="SURVEY §2 K93 [EXT] (context-window planning table: per candidate "
    "window size, the fraction of docs fitting and of TOKENS surviving "
    "truncation — the decision table behind CHUNK/STRIDE (K7) and packing "
    "budget (K11) configuration; token loss, not doc counts, is what "
    "moves the training distribution)",
)
def llm_context_window_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each candidate context window: docs fitting whole, tokens kept
    under truncate-to-window, and the token-level truncation loss. The
    windows are a 4-row constant dimension.

    Scale shape: one narrow token-count pass; the windows table
    cross-joins as a broadcast 4-row dimension (row explosion x4, then
    map-side combine collapses to 4 output rows). One bounded agg."""
    d = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    toks = d.select(F.size(text.words("text")).cast("long").alias("n_tok"))
    w = spark.createDataFrame([(x,) for x in _CTX_WINDOWS], "win int")
    j = toks.crossJoin(F.broadcast(w))
    kept = F.least(F.col("n_tok"), F.col("win").cast("long"))
    return (
        j.groupBy("win")
        .agg(
            F.sum(F.when(F.col("n_tok") <= F.col("win"), 1).otherwise(0)).alias(
                "docs_fitting"
            ),
            F.count("*").alias("docs_total"),
            F.sum(kept).alias("tokens_kept"),
            F.sum("n_tok").alias("tokens_total"),
            (
                (
                    (1.0 - F.sum(kept).cast("double") / F.sum("n_tok"))
                    * 1000000
                    + 0.5
                )
                .cast("bigint")
                .cast("double")
                / 1000000.0
            ).alias("truncation_loss"),
        )
        .select(
            F.col("win").cast("int").alias("window_tokens"),
            "docs_fitting",
            "docs_total",
            "tokens_kept",
            "tokens_total",
            "truncation_loss",
        )
    )


@query(
    "llm_emb_centroid_drift",
    oracle="""
    WITH comp AS (
        SELECT label, t.i AS dim,
               CAST(trunc(CAST(embedding[t.i] AS DOUBLE) * 1000000 + 0.5)
                    AS BIGINT) AS vq
        FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
    ), cent AS (
        SELECT label, dim,
               CAST(trunc(CAST(SUM(vq) AS DOUBLE) / COUNT(*) + 0.5)
                    AS BIGINT) AS cq
        FROM comp GROUP BY label, dim
    ), pairs AS (
        SELECT a.label AS label_a, b.label AS label_b,
               CAST(SUM(a.cq * b.cq) AS BIGINT) AS dot,
               CAST(SUM(a.cq * a.cq) AS BIGINT) AS na,
               CAST(SUM(b.cq * b.cq) AS BIGINT) AS nb
        FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
        GROUP BY a.label, b.label
    )
    SELECT label_a, label_b,
           CAST(trunc(CAST(dot AS DOUBLE)
                / NULLIF(sqrt(CAST(na AS DOUBLE))
                         * sqrt(CAST(nb AS DOUBLE)), 0)
                * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS centroid_cosine
    FROM pairs
    """,
    ref="SURVEY §2 K100 [EXT] (embedding centroid drift: cosine between "
    "per-label mean vectors for every label pair — the batch-vs-batch / "
    "model-version drift monitor over the embedding column; the "
    "distribution-level complement of K51 outliers (point-level) and "
    "K90 PSI (scalar-score-level))",
)
def llm_emb_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine similarity between the mean embedding of every label pair
    — labels standing in for corpus batches / embedding-model versions;
    a pair drifting below ~0.95 is the re-embed trigger. Component sums
    accumulate in exact 1e-6-quantized integers and each centroid
    component re-quantizes after the mean, so the pairwise dot/norm math
    is exact integer arithmetic and the single double division at the
    end is bit-identical cross-engine (zero-norm centroids yield NULL).

    Scale shape: the (label, dim) mean is ONE map-side-combined agg over
    the exploded components (n·dim rows in, |labels|·dim out — the only
    corpus-sized pass); the pair join runs over that bounded table
    (|labels|²·dim products, broadcast-sized at any corpus size). Never
    an n² row pass."""
    e = load(spark, sf_dir, "embeddings")
    comp = e.select(
        "label", F.posexplode("embedding").alias("dim", "v")
    ).select(
        "label",
        "dim",
        (F.col("v").cast("double") * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("vq"),
    )
    cent = comp.groupBy("label", "dim").agg(
        (
            (F.sum("vq").cast("double") / F.count("*")) + F.lit(0.5)
        )
        .cast("long")
        .alias("cq")
    )
    a = cent.select(
        F.col("label").alias("label_a"),
        "dim",
        F.col("cq").alias("ca"),
    )
    b = cent.select(
        F.col("label").alias("label_b"),
        "dim",
        F.col("cq").alias("cb"),
    )
    pairs = (
        a.join(b, ["dim"])
        .where(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.sum(F.col("ca") * F.col("cb")).alias("dot"),
            F.sum(F.col("ca") * F.col("ca")).alias("na"),
            F.sum(F.col("cb") * F.col("cb")).alias("nb"),
        )
    )
    denom = F.sqrt(F.col("na").cast("double")) * F.sqrt(
        F.col("nb").cast("double")
    )
    return pairs.select(
        "label_a",
        "label_b",
        (
            (
                F.try_divide(
                    F.col("dot").cast("double"),
                    F.when(denom != 0, denom),
                )
                * 1000000
                + F.lit(0.5)
            )
            .cast("long")
            .cast("double")
            / 1000000.0
        ).alias("centroid_cosine"),
    )


@query(
    "llm_silhouette",
    oracle=f"""
    WITH cents AS (
        SELECT vec_id AS cent_id, embedding AS cent_emb
        FROM embeddings WHERE vec_id < 4
    ), d AS (
        SELECT e.vec_id, c.cent_id,
               {_L2SQ.format(a='e.embedding', b='c.cent_emb')} AS cd
        FROM embeddings e CROSS JOIN cents c
    ), r AS (
        SELECT vec_id, cent_id, cd,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cd, cent_id) AS rn
        FROM d
    ), ab AS (
        SELECT vec_id,
               MIN(CASE WHEN rn = 1 THEN cent_id END) AS cent_id,
               MIN(CASE WHEN rn = 1 THEN cd END) AS a_sq,
               MIN(CASE WHEN rn > 1 THEN cd END) AS b_sq
        FROM r GROUP BY vec_id
    ), s AS (
        SELECT cent_id,
               CASE WHEN greatest(sqrt(a_sq), sqrt(b_sq)) = 0 THEN 0.0
                    ELSE (sqrt(b_sq) - sqrt(a_sq))
                         / greatest(sqrt(a_sq), sqrt(b_sq)) END AS sil
        FROM ab
    )
    SELECT cent_id, CAST(COUNT(*) AS BIGINT) AS n_members,
           {sql_davg('sil')} AS avg_silhouette
    FROM s GROUP BY cent_id
    """,
    ref="SURVEY §2 K101 [EXT] (simplified silhouette per cluster over the "
    "K19 fixed centroids: a = L2 to own centroid, b = L2 to the nearest "
    "OTHER centroid, s = (b-a)/max(a,b) — the Hruschka et al. "
    "centroid-based silhouette that replaces the O(n²) pairwise "
    "original; the cluster-quality gate read before trusting K19/K39 "
    "bucketing decisions)",
)
def llm_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-quality report: per fixed centroid, member count and mean
    simplified silhouette — s near 1 = compact and separated, near 0 =
    boundary-straddling, negative = likely mis-assigned. Distances are
    true L2 (sqrt of the shared deterministic squared-distance
    arithmetic); a point equidistant-at-zero scores 0 by convention.

    Scale shape: centroids are O(K·dim) broadcast; the distance pass is
    the same narrow O(n·K) cross join as llm_emb_cluster (never n² —
    the simplification is exactly what makes silhouette feasible at
    100 TB); per-point a/b collapse in one vec_id-keyed agg, final agg
    is K rows with quantized davg."""
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
    r = d.withColumn("rn", F.row_number().over(w))
    ab = r.groupBy("vec_id").agg(
        F.min(F.when(F.col("rn") == 1, F.col("cent_id"))).alias("cent_id"),
        F.min(F.when(F.col("rn") == 1, F.col("cd"))).alias("a_sq"),
        F.min(F.when(F.col("rn") > 1, F.col("cd"))).alias("b_sq"),
    )
    big = F.greatest(F.sqrt("a_sq"), F.sqrt("b_sq"))
    sil = F.when(big == 0, F.lit(0.0)).otherwise(
        (F.sqrt("b_sq") - F.sqrt("a_sq")) / big
    )
    return (
        ab.select("cent_id", sil.alias("sil"))
        .groupBy("cent_id")
        .agg(
            F.count("*").alias("n_members"),
            davg("sil").alias("avg_silhouette"),
        )
    )


def _int8_err_sql(x: str, am: str) -> str:
    """One component's int8-dequantization error, DuckDB spelling (shared
    sub-expression spelled twice — err * err, never libm pow)."""
    e = (
        f"(CAST({x} AS DOUBLE) - least(127.0, greatest(-127.0, "
        f"round(CAST({x} AS DOUBLE) / ({am} / 127.0)))) * ({am} / 127.0))"
    )
    return f"({e} * {e})"


@query(
    "llm_emb_quantization_error",
    oracle=f"""
    WITH v AS (
        SELECT label, embedding,
               list_max(list_transform(embedding,
                        x -> abs(CAST(x AS DOUBLE)))) AS am
        FROM embeddings
    ), e AS (
        SELECT label,
               CASE WHEN am = 0 THEN CAST(0 AS BIGINT)
                    ELSE CAST(trunc(
                        list_reduce(list_transform(embedding,
                            x -> {_int8_err_sql('x', 'am')}),
                            (a, b) -> a + b) / len(embedding)
                        * 1000000000 + 0.5) AS BIGINT)
               END AS mq
        FROM v
    )
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(mq) AS DOUBLE) / COUNT(*) / 1000000000.0 AS avg_mse,
           CAST(MAX(mq) AS DOUBLE) / 1000000000.0 AS max_mse
    FROM e GROUP BY label
    """,
    ref="SURVEY §2 K106 [EXT] (int8 symmetric-quantization error audit: "
    "per-vector MSE of quantize-dequantize at scale = max|v|/127, "
    "aggregated per label — the decision table for shipping embeddings "
    "at 4× smaller storage, the ERROR side of the trade K32e PQ "
    "measures as RECALL; per-vector MSE quantizes at 1e-9 before the "
    "group reduction)",
)
def llm_emb_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Would int8 embeddings be good enough: per label, the mean and
    worst per-vector MSE introduced by symmetric int8 quantization
    (component → round(v/scale) clamped to ±127, scale = max|v|/127
    per vector). Zero vectors quantize losslessly by convention. The
    fold runs in fixed array order with a 0.0 seed, so the double
    arithmetic is bit-identical cross-engine before the 1e-9 term
    quantization.

    Scale shape: one narrow whole-stage-codegen HOF pass over the
    embedding column (no explode — per-row array fold), then a
    |labels|-row agg. Nothing shuffles but the bounded group keys."""
    e = load(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    am = F.array_max(
        F.transform(emb, lambda x: F.abs(x.cast("double")))
    )
    v = e.select("label", "embedding", am.alias("am"))
    scale = F.col("am") / 127.0

    def err2(x):
        q = F.least(
            F.lit(127.0),
            F.greatest(F.lit(-127.0), F.round(x.cast("double") / scale)),
        )
        d = x.cast("double") - q * scale
        return d * d

    fold = F.aggregate(
        emb, F.lit(0.0), lambda acc, x: acc + err2(x)
    ) / F.size(emb)
    mq = F.when(F.col("am") == 0, F.lit(0).cast("long")).otherwise(
        (fold * 1000000000 + F.lit(0.5)).cast("long")
    )
    per = v.select("label", mq.alias("mq"))
    return per.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        (F.sum("mq").cast("double") / F.count("*") / 1000000000.0).alias(
            "avg_mse"
        ),
        (F.max("mq").cast("double") / 1000000000.0).alias("max_mse"),
    )


@query(
    "llm_lexical_diversity",
    oracle="""
    WITH tok AS (
        SELECT source, unnest(string_split(text, ' ')) AS word
        FROM documents
    ), wc AS (
        SELECT source, word, CAST(COUNT(*) AS BIGINT) AS n
        FROM tok WHERE word <> '' GROUP BY source, word
    )
    SELECT source,
           CAST(SUM(n) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS vocab,
           CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
           CAST(trunc(CAST(COUNT(*) AS DOUBLE) / SUM(n)
                * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS ttr,
           CAST(trunc(ln(CAST(COUNT(*) AS DOUBLE)) / ln(CAST(SUM(n) AS DOUBLE))
                * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS herdan_c,
           CAST(trunc(CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                / COUNT(*) * 1000000 + 0.5) AS BIGINT) / 1000000.0
               AS hapax_ratio
    FROM wc
    GROUP BY source
    """,
    ref="SURVEY §2 K107 [EXT] (corpus-level lexical diversity per source: "
    "type-token ratio, Herdan's C = ln V / ln N (the size-robust TTR), "
    "hapax-legomena ratio — the vocabulary-richness triple screening "
    "sources for template spam (low TTR) vs OCR noise (hapax spikes); "
    "corpus-level counterpart of the per-doc unique_word_ratio in K4)",
)
def llm_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary richness over the POOLED source corpus (not
    per-doc averages): N tokens, V types, hapax count, TTR = V/N,
    Herdan's C = ln V / ln N, hapax/V. All counts are exact integers;
    the three ratios are single double divisions quantized once — no
    order-sensitive accumulation anywhere.

    Scale shape: explode -> (source, word) hash agg with map-side combine
    (the llm_vocab_topk posture: the wide exchange carries vocabulary-
    sized partial counts, not corpus tokens), then a |sources|-group
    rollup. Nothing scales beyond |vocab| after the first agg."""
    d = load(spark, sf_dir, "documents")
    wc = (
        d.select("source", F.explode(text.words("text")).alias("word"))
        .groupBy("source", "word")
        .agg(F.count("*").alias("n"))
    )
    q6 = lambda c: (c * 1000000 + F.lit(0.5)).cast("long").cast(
        "double"
    ) / 1000000.0
    v = F.count("*").cast("bigint")
    n = F.sum("n").cast("bigint")
    hapax = F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).cast("bigint")
    return wc.groupBy("source").agg(
        n.alias("n_tokens"),
        v.alias("vocab"),
        hapax.alias("hapax"),
        q6(v.cast("double") / n).alias("ttr"),
        q6(F.log(v.cast("double")) / F.log(n.cast("double"))).alias(
            "herdan_c"
        ),
        q6(hapax.cast("double") / v).alias("hapax_ratio"),
    )


@query(
    "llm_vocab_growth",
    oracle="""
    WITH tot AS (
        SELECT CAST(MAX(doc_id) + 1 AS BIGINT) AS n_docs FROM documents
    ), tok AS (
        SELECT source,
               CAST(least(9, trunc(doc_id * 10.0 / n_docs)) AS INT) AS decile,
               unnest(string_split(text, ' ')) AS word
        FROM documents, tot
    ), firsts AS (
        SELECT source, word, MIN(decile) AS first_dec
        FROM tok WHERE word <> '' GROUP BY source, word
    ), new_v AS (
        SELECT source, first_dec AS decile,
               CAST(COUNT(*) AS BIGINT) AS new_vocab
        FROM firsts GROUP BY source, first_dec
    ), toks AS (
        SELECT source, decile, CAST(COUNT(*) AS BIGINT) AS n_tokens
        FROM tok WHERE word <> '' GROUP BY source, decile
    )
    SELECT t.source, t.decile,
           CAST(SUM(t.n_tokens) OVER w AS BIGINT) AS cum_tokens,
           CAST(SUM(COALESCE(v.new_vocab, 0)) OVER w AS BIGINT) AS cum_vocab,
           CAST(COALESCE(v.new_vocab, 0) AS BIGINT) AS new_vocab
    FROM toks t LEFT JOIN new_v v USING (source, decile)
    WINDOW w AS (PARTITION BY t.source ORDER BY t.decile
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    ref="SURVEY §2 K108 [EXT] (Heaps'-law vocabulary growth curve: corpus "
    "split into doc-id deciles per source, each word attributed to the "
    "decile where it FIRST appears, cumulative vocab vs cumulative "
    "tokens — the V(N) ~ K*N^beta curve whose flattening says a source "
    "is exhausted / templated and more of it adds no new signal)",
)
def llm_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth per source across ten doc-id deciles: cumulative
    distinct words vs cumulative tokens (Heaps' law curve) plus the
    per-decile new-word count. "First appearance" is computed as
    MIN(decile) per (source, word) — an agg, not an ordered scan — so no
    window ever sees corpus-sized data: the only windows run over the
    10-row-per-source decile frame.

    Scale shape: ONE corpus pass — explode -> (source, word, decile)
    count with map-side combine — materialized (localCheckpoint, it is
    vocabulary-sized) so the two consumers (first-decile MIN-agg and
    per-decile token totals) never re-scan the corpus; then a
    |sources|x10 cumsum. The decile boundary is a 1-row broadcast
    (max doc_id), the llm_curriculum threshold posture."""
    d = load(spark, sf_dir, "documents")
    tot = d.agg((F.max("doc_id") + 1).cast("bigint").alias("n_docs"))
    tok = d.crossJoin(F.broadcast(tot)).select(
        "source",
        F.least(
            F.lit(9),
            F.floor(F.col("doc_id") * 10.0 / F.col("n_docs")),
        )
        .cast("int")
        .alias("decile"),
        F.explode(text.words("text")).alias("word"),
    )
    # ONE corpus pass: (source, word, decile) counts, then everything
    # downstream is vocabulary-sized. localCheckpoint stops Catalyst from
    # re-running the corpus scan for the two consumers below (the tpch_q20
    # dual-consumer materialization pattern).
    wdc = (
        tok.groupBy("source", "word", "decile")
        .agg(F.count("*").alias("n"))
        .localCheckpoint()
    )
    firsts = wdc.groupBy("source", "word").agg(
        F.min("decile").alias("first_dec")
    )
    new_v = firsts.groupBy(
        "source", F.col("first_dec").alias("decile")
    ).agg(F.count("*").cast("bigint").alias("new_vocab"))
    toks = wdc.groupBy("source", "decile").agg(
        F.sum("n").cast("bigint").alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    nv = F.coalesce(F.col("new_vocab"), F.lit(0))
    return (
        toks.join(new_v, ["source", "decile"], "left")
        .select(
            "source",
            "decile",
            F.sum("n_tokens").over(w).cast("bigint").alias("cum_tokens"),
            F.sum(nv).over(w).cast("bigint").alias("cum_vocab"),
            nv.cast("bigint").alias("new_vocab"),
        )
    )


@query(
    "llm_emb_gram",
    oracle="""
    WITH comp AS (
        SELECT CAST(ti.i - 1 AS INT) AS i, CAST(tj.j - 1 AS INT) AS j,
               CAST(trunc(CAST(embedding[ti.i] AS DOUBLE) * 1000000 + 0.5)
                    AS BIGINT) AS xi,
               CAST(trunc(CAST(embedding[tj.j] AS DOUBLE) * 1000000 + 0.5)
                    AS BIGINT) AS xj
        FROM embeddings,
             unnest(range(1, len(embedding) + 1)) AS ti(i),
             unnest(range(1, len(embedding) + 1)) AS tj(j)
        WHERE tj.j >= ti.i
    )
    SELECT i, j, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(trunc(CAST(SUM(xi * xj) AS DOUBLE) / COUNT(*)
                / 1000000000000.0 * 1000000 + 0.5) AS BIGINT) / 1000000.0
               AS e_xy,
           CAST(trunc((CAST(SUM(xi * xj) AS DOUBLE) / COUNT(*)
                       - (CAST(SUM(xi) AS DOUBLE) / COUNT(*))
                         * (CAST(SUM(xj) AS DOUBLE) / COUNT(*)))
                / 1000000000000.0 * 1000000 + 0.5) AS BIGINT) / 1000000.0
               AS cov
    FROM comp GROUP BY i, j
    """,
    ref="SURVEY §2 K109 [EXT] (exact second-moment / covariance matrix of "
    "the embedding column, upper triangle — the d x d statistic behind "
    "PCA whitening, Mahalanobis outlier scoring and ZCA decorrelation; "
    "components quantize to 1e-6 integers first so every sum is exact "
    "integer arithmetic, the K100 centroid-drift discipline)",
)
def llm_emb_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle Gram/covariance matrix of the corpus embeddings:
    per dimension pair (i <= j), E[x_i * x_j] and cov(x_i, x_j) with all
    accumulation in exact integers (components quantized at 1e-6, so
    products sit at the 1e-12 scale; the sums use a decimal(38,0)
    accumulator that cannot overflow at any corpus size) and exactly one
    double division chain at the end, spelled identically in DuckDB.

    Scale shape: ONE narrow pass — each row explodes into its own
    d(d+1)/2 = 2080 (i, j, product) terms via nested sequence/transform
    (no self-join, no shuffle of vectors) — then a d²-bounded hash agg
    with map-side combine. The exchange carries at most
    #partitions x 2080 partial rows regardless of corpus size. At much
    larger d the same plan chunks the pair space by i-block; the
    per-row term generation is embarrassingly parallel either way."""
    e = load(spark, sf_dir, "embeddings")
    # r14 (guide §1.2 per-task work): quantize each component ONCE per row
    # — inlined in the pair lambdas, embedding[i] was re-quantized for
    # every j (d(d+1) = 4160 double-mult+casts per row instead of d = 64;
    # measured 5.2-6.5 -> 4.1-5.1 s at sf0.1, output bit-identical by
    # exceptAll probe: the q array holds exactly the former per-term
    # values).
    q = e.select(
        F.expr(
            "transform(embedding, x ->"
            " CAST(CAST(x AS DOUBLE) * 1000000 + 0.5 AS BIGINT))"
        ).alias("q")
    )
    terms = q.select(
        F.explode(
            F.expr(
                """
                flatten(transform(sequence(0, size(q) - 1), i ->
                    transform(sequence(i, size(q) - 1), j ->
                        struct(
                            CAST(i AS INT) AS i, CAST(j AS INT) AS j,
                            q[i] AS xi, q[j] AS xj))))
                """
            )
        ).alias("t")
    ).select("t.i", "t.j", "t.xi", "t.xj")
    g = terms.groupBy("i", "j").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum((F.col("xi") * F.col("xj")).cast("decimal(38,0)")).alias("sp"),
        F.sum(F.col("xi").cast("decimal(38,0)")).alias("sxi"),
        F.sum(F.col("xj").cast("decimal(38,0)")).alias("sxj"),
    )
    q6 = lambda c: (c * 1000000 + F.lit(0.5)).cast("long").cast(
        "double"
    ) / 1000000.0
    e_xy = F.col("sp").cast("double") / F.col("n") / 1e12
    cov = (
        F.col("sp").cast("double") / F.col("n")
        - (F.col("sxi").cast("double") / F.col("n"))
        * (F.col("sxj").cast("double") / F.col("n"))
    ) / 1e12
    return g.select(
        "i", "j", "n", q6(e_xy).alias("e_xy"), q6(cov).alias("cov")
    )


@query(
    "llm_emb_anisotropy",
    oracle="""
    WITH base AS (
        SELECT label, embedding,
               list_sum(list_transform(embedding, x ->
                   CAST(trunc(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
                   * CAST(trunc(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
               )) AS n2
        FROM embeddings
    ), comp AS (
        SELECT label, CAST(t.i - 1 AS INT) AS dim,
               CAST(trunc(
                   CAST(CAST(trunc(CAST(embedding[t.i] AS DOUBLE) * 1000000
                                   + 0.5) AS BIGINT) AS DOUBLE)
                   / sqrt(CAST(n2 AS DOUBLE)) * 1000000 + 0.5
               ) AS BIGINT) AS vq
        FROM base, unnest(range(1, len(embedding) + 1)) AS t(i)
        WHERE n2 > 0
    ), per_dim AS (
        SELECT label, dim, SUM(vq) AS s, SUM(vq * vq) AS r,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM comp GROUP BY label, dim
    ), per_label AS (
        SELECT label, MAX(c) AS n, SUM(s * s) AS q, SUM(r) AS r2
        FROM per_dim GROUP BY label
    )
    SELECT label, CAST(n AS BIGINT) AS n_vectors,
           CAST(trunc((CAST(q AS DOUBLE) - CAST(r2 AS DOUBLE))
                / NULLIF(CAST(n AS DOUBLE) * (n - 1), 0)
                / 1000000000000.0 * 1000000 + 0.5) AS BIGINT) / 1000000.0
               AS mean_pairwise_cosine,
           CAST(trunc(sqrt(CAST(q AS DOUBLE)) / CAST(n AS DOUBLE)
                / 1000000.0 * 1000000 + 0.5) AS BIGINT) / 1000000.0
               AS mean_dir_norm
    FROM per_label
    """,
    ref="SURVEY §2 K110 [EXT] (embedding anisotropy per label: mean "
    "pairwise cosine among unit-normalized vectors via the closed form "
    "sum_pairs cos = ||Sum v_hat||^2 - n — Ethayarajh 2019's isotropy "
    "diagnostic, computed in ONE pass with no pair enumeration; "
    "mean_dir_norm = ||mean direction|| is the equivalent "
    "concentration number (0 = isotropic, 1 = collapsed))",
)
def llm_emb_anisotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How directionally collapsed is each label's embedding cloud: the
    exact mean pairwise cosine over all n(n-1) ordered pairs of
    unit-normalized vectors, WITHOUT enumerating pairs — for unit
    vectors sum_{a!=b} cos(a,b) = ||sum v_hat||^2 - n. Components
    normalize against the exact integer-quantized norm, re-quantize at
    1e-6, and every subsequent sum is exact integer math (decimal
    accumulators), so the identity holds bitwise cross-engine; the two
    output ratios are single double chains quantized once.

    Scale shape: one narrow explode -> (label, dim) agg (map-side
    combined, |labels| x d out) -> |labels| rollup. The n² pair space is
    never materialized — that is the point. Zero-norm vectors drop (the
    cosine is undefined there), single-vector labels yield NULL."""
    e = load(spark, sf_dir, "embeddings")
    base = e.select(
        "label",
        "embedding",
        F.expr(
            """
            aggregate(
                transform(embedding, x ->
                    CAST(CAST(x AS DOUBLE) * 1000000 + 0.5 AS BIGINT)),
                CAST(0 AS BIGINT), (a, qv) -> a + qv * qv)
            """
        ).alias("n2"),
    ).where(F.col("n2") > 0)
    comp = base.select(
        "label",
        F.posexplode(
            F.expr(
                """
                transform(embedding, x ->
                    CAST(
                        CAST(CAST(CAST(x AS DOUBLE) * 1000000 + 0.5
                             AS BIGINT) AS DOUBLE)
                        / sqrt(CAST(n2 AS DOUBLE)) * 1000000 + 0.5
                    AS BIGINT))
                """
            )
        ).alias("dim", "vq"),
    )
    per_dim = comp.groupBy("label", "dim").agg(
        F.sum(F.col("vq").cast("decimal(38,0)")).alias("s"),
        F.sum((F.col("vq") * F.col("vq")).cast("decimal(38,0)")).alias("r"),
        F.count("*").cast("bigint").alias("c"),
    )
    per_label = per_dim.groupBy("label").agg(
        F.max("c").alias("n"),
        F.sum(F.col("s") * F.col("s")).alias("q"),
        F.sum("r").alias("r2"),
    )
    q6 = lambda c: (c * 1000000 + F.lit(0.5)).cast("long").cast(
        "double"
    ) / 1000000.0
    mpc = (
        F.try_divide(
            F.col("q").cast("double") - F.col("r2").cast("double"),
            F.nullif(F.col("n").cast("double") * (F.col("n") - 1), F.lit(0.0)),
        )
        / 1e12
    )
    mdn = F.sqrt(F.col("q").cast("double")) / F.col("n").cast("double") / 1e6
    return per_label.select(
        "label",
        F.col("n").cast("bigint").alias("n_vectors"),
        q6(mpc).alias("mean_pairwise_cosine"),
        q6(mdn).alias("mean_dir_norm"),
    )


@query(
    "llm_lang_kappa",
    oracle="""
    WITH det AS (
        SELECT source,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS a,
               CASE WHEN len(list_filter(string_split(text, ' '),
                        x -> x IN ('the', 'a', 'of'))) > 0
                    THEN 1 ELSE 0 END AS b
        FROM documents
    ), cm AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(a * b) AS BIGINT) AS n11,
               CAST(SUM(a * (1 - b)) AS BIGINT) AS n10,
               CAST(SUM((1 - a) * b) AS BIGINT) AS n01,
               CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n00
        FROM det GROUP BY source
    )
    SELECT source, n, n11, n10, n01, n00,
           CAST(trunc(CAST(n11 + n00 AS DOUBLE) / n * 1000000 + 0.5)
                AS BIGINT) / 1000000.0 AS po,
           CAST(trunc(
               (CAST(n11 + n00 AS DOUBLE) / n
                - (CAST(n11 + n10 AS DOUBLE) / n * (CAST(n11 + n01 AS DOUBLE) / n)
                   + CAST(n01 + n00 AS DOUBLE) / n * (CAST(n10 + n00 AS DOUBLE) / n)))
               / NULLIF(1.0 - (CAST(n11 + n10 AS DOUBLE) / n * (CAST(n11 + n01 AS DOUBLE) / n)
                   + CAST(n01 + n00 AS DOUBLE) / n * (CAST(n10 + n00 AS DOUBLE) / n)), 0)
               * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS kappa
    FROM cm
    """,
    ref="SURVEY §2 K111 [EXT] (Cohen's kappa between declared lang "
    "metadata and content-derived detection, per source — the "
    "chance-corrected version of K63's raw agreement: a source that is "
    "95% English shows high raw agreement even with a broken detector; "
    "kappa strips that marginal-rate credit (Cohen 1960))",
)
def llm_lang_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chance-corrected metadata/content agreement per source: binary
    rater A = (declared lang == en), rater B = (stopword detector says
    en); kappa = (po - pe) / (1 - pe) from the exact 2x2 confusion
    counts. pe credits what two random raters with the same marginals
    would agree on — kappa near 0 with high po flags a degenerate
    detector, not good metadata. All-counts-integer, one double chain
    quantized once; pe = 1 (a constant-label source) yields NULL.

    Scale shape: one narrow HOF scan -> |sources|-group agg with
    map-side combine. Nothing after the scan exceeds |sources| rows."""
    d = load(spark, sf_dir, "documents")
    det = d.select(
        "source",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("a"),
        F.when(
            F.size(
                F.filter(
                    text.words("text"),
                    lambda w: w.isin("the", "a", "of"),
                )
            )
            > 0,
            1,
        )
        .otherwise(0)
        .alias("b"),
    )
    cm = det.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("a") * F.col("b")).cast("bigint").alias("n11"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("bigint").alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).cast("bigint").alias("n01"),
        F.sum((1 - F.col("a")) * (1 - F.col("b")))
        .cast("bigint")
        .alias("n00"),
    )
    nd = F.col("n").cast("double")
    po = (F.col("n11") + F.col("n00")).cast("double") / nd
    pe = (
        (F.col("n11") + F.col("n10")).cast("double")
        / nd
        * ((F.col("n11") + F.col("n01")).cast("double") / nd)
    ) + (
        (F.col("n01") + F.col("n00")).cast("double")
        / nd
        * ((F.col("n10") + F.col("n00")).cast("double") / nd)
    )
    q6 = lambda c: (c * 1000000 + F.lit(0.5)).cast("long").cast(
        "double"
    ) / 1000000.0
    return cm.select(
        "source",
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        q6(po).alias("po"),
        q6((po - pe) / F.nullif(F.lit(1.0) - pe, F.lit(0.0))).alias("kappa"),
    )


@query(
    "llm_perplexity_holdout",
    oracle="""
    WITH tot AS (
        SELECT CAST(MAX(doc_id) + 1 AS BIGINT) AS n_docs FROM documents
    ), tok AS (
        SELECT source,
               CAST(least(9, trunc(doc_id * 10.0 / n_docs)) AS INT) AS decile,
               unnest(string_split(text, ' ')) AS word
        FROM documents, tot
    ), train AS (
        SELECT source, word, CAST(COUNT(*) AS BIGINT) AS c
        FROM tok WHERE word <> '' AND decile < 9 GROUP BY source, word
    ), test AS (
        SELECT source, word, CAST(COUNT(*) AS BIGINT) AS t
        FROM tok WHERE word <> '' AND decile = 9 GROUP BY source, word
    ), scal AS (
        SELECT source,
               CAST(SUM(CASE WHEN decile < 9 AND word <> '' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_train,
               CAST(COUNT(DISTINCT CASE WHEN word <> '' THEN word END)
                    AS BIGINT) AS v_all
        FROM tok GROUP BY source
    ), scored AS (
        SELECT te.source, te.t,
               CASE WHEN tr.c IS NULL THEN te.t ELSE 0 END AS oov_t,
               te.t * CAST(trunc(
                   -ln((CAST(COALESCE(tr.c, 0) + 1 AS DOUBLE))
                       / (s.n_train + s.v_all))
                   * 1000000000 + 0.5) AS BIGINT) AS sq
        FROM test te
        LEFT JOIN train tr USING (source, word)
        JOIN scal s USING (source)
    )
    SELECT source,
           CAST(SUM(t) AS BIGINT) AS test_tokens,
           CAST(trunc(CAST(SUM(oov_t) AS DOUBLE) / SUM(t)
                * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS oov_rate,
           CAST(trunc(CAST(SUM(sq) AS DOUBLE) / 1000000000.0 / SUM(t)
                * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS mean_surprisal,
           CAST(trunc(exp(CAST(trunc(CAST(SUM(sq) AS DOUBLE) / 1000000000.0
                    / SUM(t) * 1000000 + 0.5) AS BIGINT) / 1000000.0)
                * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS perplexity
    FROM scored GROUP BY source
    """,
    ref="SURVEY §2 K112 [EXT] (hold-out unigram perplexity per source: "
    "add-one-smoothed LM fit on doc-id deciles 0-8, scored on decile 9 "
    "— the train/test generalization gap that separates repetitive "
    "sources (low ppl: more adds nothing) from genuinely diverse ones; "
    "the predictive companion to K77's in-sample surprisal and K108's "
    "vocabulary growth)",
)
def llm_perplexity_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source hold-out perplexity: train an add-one-smoothed unigram
    LM on the first nine doc-id deciles, score the tenth —
    p(w) = (c_train(w)+1) / (N_train + V_source); report test-token
    count, OOV mass, mean surprisal (nats) and its exp (perplexity).
    Per-word -ln p quantizes at 1e-9 BEFORE weighting by the integer
    test count, so the accumulation is exact integer math and the
    mean/exp chain is one identically-spelled double expression.

    Scale shape: one corpus explode -> three vocabulary-sized aggs
    (train counts, test counts, per-source scalars), a vocabulary-keyed
    (source, word) LEFT join between two agg outputs, and a broadcast
    |sources|-row scalar join. No window, nothing corpus-sized after
    the first agg; the decile boundary is the K108 1-row broadcast."""
    d = load(spark, sf_dir, "documents")
    tot = d.agg((F.max("doc_id") + 1).cast("bigint").alias("n_docs"))
    tok = d.crossJoin(F.broadcast(tot)).select(
        "source",
        F.least(
            F.lit(9), F.floor(F.col("doc_id") * 10.0 / F.col("n_docs"))
        )
        .cast("int")
        .alias("decile"),
        F.explode(text.words("text")).alias("word"),
    )
    swd = (
        tok.groupBy("source", "word", "decile")
        .agg(F.count("*").alias("n"))
        .localCheckpoint()
    )
    train = swd.where("decile < 9").groupBy("source", "word").agg(
        F.sum("n").cast("bigint").alias("c")
    )
    test = swd.where("decile = 9").groupBy("source", "word").agg(
        F.sum("n").cast("bigint").alias("t")
    )
    scal = swd.groupBy("source").agg(
        F.sum(F.when(F.col("decile") < 9, F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("n_train"),
        F.count_distinct(F.col("word")).cast("bigint").alias("v_all"),
    )
    scored = (
        test.join(train, ["source", "word"], "left")
        .join(F.broadcast(scal), "source")
        .select(
            "source",
            "t",
            F.when(F.col("c").isNull(), F.col("t"))
            .otherwise(0)
            .alias("oov_t"),
            (
                F.col("t")
                * (
                    -F.log(
                        (F.coalesce(F.col("c"), F.lit(0)) + 1).cast(
                            "double"
                        )
                        / (F.col("n_train") + F.col("v_all"))
                    )
                    * 1000000000
                    + F.lit(0.5)
                ).cast("long")
            ).alias("sq"),
        )
    )
    q6 = lambda c: (c * 1000000 + F.lit(0.5)).cast("long").cast(
        "double"
    ) / 1000000.0
    mean_s = q6(
        F.sum("sq").cast("double") / 1000000000.0 / F.sum("t")
    )
    return scored.groupBy("source").agg(
        F.sum("t").cast("bigint").alias("test_tokens"),
        q6(F.sum("oov_t").cast("double") / F.sum("t")).alias("oov_rate"),
        mean_s.alias("mean_surprisal"),
        q6(F.exp(mean_s)).alias("perplexity"),
    )


@query(
    "llm_source_shingle_overlap",
    oracle="""
    WITH sh AS (
        SELECT DISTINCT source, unnest(
            list_transform(range(1, len(string_split(text, ' ')) - 1),
                i -> string_split(text, ' ')[i] || ' '
                     || string_split(text, ' ')[i+1] || ' '
                     || string_split(text, ' ')[i+2])) AS g
        FROM documents
    ), sizes AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS nv FROM sh GROUP BY source
    ), inter AS (
        SELECT a.source AS src_a, b.source AS src_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM sh a JOIN sh b ON a.g = b.g AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT i.src_a, i.src_b, i.n_shared,
           sa.nv AS n_a, sb.nv AS n_b,
           CAST(trunc(CAST(i.n_shared AS DOUBLE)
                / (sa.nv + sb.nv - i.n_shared)
                * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.source = i.src_a
    JOIN sizes sb ON sb.source = i.src_b
    """,
    ref="SURVEY §2 K113 [EXT] (cross-source template sharing: Jaccard "
    "over distinct 3-word shingles for every source pair — phrase-level "
    "where K34's vocab overlap is word-level, so shared TEMPLATES "
    "(mirrors, boilerplate farms) light up while mere same-language "
    "pairs stay low; the source-granular screen run before K17's "
    "cross-corpus dedup decides what to collapse)",
)
def llm_source_shingle_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """|shingles(a) ∩ shingles(b)| and Jaccard for every source pair,
    over distinct 3-word shingles. High Jaccard = shared templates /
    mirrored content between sources; the pairing happens inside each
    shingle's (≤|sources|-sized) source set, so no shingle ever meets
    another shingle.

    Scale shape: explode -> distinct (shingle, source) — the corpus
    collapses to shingle-vocabulary scale first; per-shingle source
    sets are |sources|-bounded, pairs explode from the sorted set via
    nested transform (the K109 per-row pair-generation trick, no
    self-join); sizes join back as a |sources|-row broadcast. Output
    is |sources|² rows."""
    d = load(spark, sf_dir, "documents")
    sh = (
        d.select(
            "source", F.explode(text.shingles("text", 3)).alias("g")
        )
        .distinct()
        .localCheckpoint()
    )
    sizes = sh.groupBy("source").agg(
        F.count("*").cast("bigint").alias("nv")
    )
    pairs = (
        sh.groupBy("g")
        .agg(F.array_sort(F.collect_set("source")).alias("ss"))
        .where(F.size("ss") >= 2)
        .select(
            F.explode(
                F.expr(
                    """
                    flatten(transform(sequence(0, size(ss) - 2), i ->
                        transform(sequence(i + 1, size(ss) - 1), j ->
                            struct(ss[i] AS src_a, ss[j] AS src_b))))
                    """
                )
            ).alias("p")
        )
        .groupBy("p.src_a", "p.src_b")
        .agg(F.count("*").cast("bigint").alias("n_shared"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("nv").alias("n_a"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("nv").alias("n_b"))
    q6 = lambda c: (c * 1000000 + F.lit(0.5)).cast("long").cast(
        "double"
    ) / 1000000.0
    return (
        pairs.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_shared",
            "n_a",
            "n_b",
            q6(
                F.col("n_shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
            ).alias("jaccard"),
        )
    )


@query(
    "llm_vocab_coverage_cutoff",
    oracle="""
    WITH wc AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM (
            SELECT unnest(string_split(text, ' ')) AS word FROM documents
        ) WHERE word <> '' GROUP BY word
    ), tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(COUNT(*) AS BIGINT) AS vt
        FROM wc
    ), cuts AS (
        SELECT unnest([1, 2, 4, 8, 16, 32, 64, 128, 256]) AS cutoff
    )
    SELECT c.cutoff,
           CAST(SUM(CASE WHEN w.n >= c.cutoff THEN 1 ELSE 0 END) AS BIGINT)
               AS vocab_kept,
           CAST(SUM(CASE WHEN w.n >= c.cutoff THEN w.n ELSE 0 END) AS BIGINT)
               AS tokens_covered,
           CAST(trunc(CAST(SUM(CASE WHEN w.n >= c.cutoff THEN w.n ELSE 0 END)
                    AS DOUBLE) / MAX(t.nt) * 1000000 + 0.5) AS BIGINT)
               / 1000000.0 AS coverage
    FROM wc w CROSS JOIN cuts c CROSS JOIN tot t
    GROUP BY c.cutoff
    """,
    ref="SURVEY §2 K114 [EXT] (tokenizer vocab-threshold curve: for each "
    "min-frequency cutoff, surviving vocabulary size and fraction of "
    "corpus tokens still covered — the Zipf-CDF table that picks the "
    "vocab pruning threshold (coverage cliffs = bad cutoffs); the "
    "CUTOFF-parameterized complement of K47's top-N coverage)",
)
def llm_vocab_coverage_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token coverage as a function of the minimum word frequency kept:
    for cutoffs 1..256 (powers of two), how many vocabulary types
    survive and what fraction of all corpus tokens they cover. All
    integer counts; one double ratio per row quantized once.

    Scale shape: ONE vocabulary agg (map-side combined), then the
    9-cutoff evaluation is a broadcast cross join over the vocab table
    folded straight back into a 9-row agg — no rank, no sort, no
    global window (the cutoff parameterization is what makes the
    rank-free formulation possible, unlike top-N coverage)."""
    d = load(spark, sf_dir, "documents")
    wc = (
        d.select(F.explode(text.words("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("n"))
        .localCheckpoint()
    )
    tot = wc.agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.count("*").cast("bigint").alias("vt"),
    )
    cuts = wc.sparkSession.createDataFrame(
        [(c,) for c in [1, 2, 4, 8, 16, 32, 64, 128, 256]],
        "cutoff int",
    )
    q6 = lambda c: (c * 1000000 + F.lit(0.5)).cast("long").cast(
        "double"
    ) / 1000000.0
    kept = F.when(F.col("n") >= F.col("cutoff"), F.col("n")).otherwise(0)
    return (
        wc.crossJoin(F.broadcast(cuts))
        .crossJoin(F.broadcast(tot))
        .groupBy("cutoff")
        .agg(
            F.sum(F.when(F.col("n") >= F.col("cutoff"), 1).otherwise(0))
            .cast("bigint")
            .alias("vocab_kept"),
            F.sum(kept).cast("bigint").alias("tokens_covered"),
            q6(F.sum(kept).cast("double") / F.max("nt")).alias("coverage"),
        )
    )


from ksql_spark.queries.curation import SQL_QUALITY as _OLS_QUALITY


@query(
    "llm_quality_length_ols",
    oracle=f"""
    WITH scored AS (
        SELECT source,
               CAST(trunc(ln(CAST(len(string_split(text, ' ')) AS DOUBLE))
                    * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS x,
               ({_OLS_QUALITY}) AS y
        FROM documents
    ), m AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
               {sql_dsum('x')} AS sx, {sql_dsum('y')} AS sy,
               {sql_dsum('x * x')} AS sxx, {sql_dsum('x * y')} AS sxy,
               {sql_dsum('y * y')} AS syy
        FROM scored GROUP BY source
    )
    SELECT source, n,
           CAST(trunc((n * sxy - sx * sy) / NULLIF(n * sxx - sx * sx, 0)
                * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS slope,
           CAST(trunc((sy - sx * ((n * sxy - sx * sy)
                       / NULLIF(n * sxx - sx * sx, 0))) / n
                * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS intercept,
           CAST(trunc(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                / NULLIF((n * sxx - sx * sx) * (n * syy - sy * sy), 0)
                * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS r2
    FROM m
    """,
    ref="SURVEY §2 K115 [EXT] (quality-vs-length regression audit: OLS "
    "of the quality score on ln(token count) per source — slope and r² "
    "expose a quality score that is length in disguise (r² near 1 = "
    "the filter is just a length filter; K25's winsorize would then be "
    "the honest operator); closed-form moments, the agg_corr "
    "discipline)",
)
def llm_quality_length_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source least-squares fit quality ~ ln(tokens): slope,
    intercept and r². A high r² means the quality score carries almost
    no signal beyond document length — the classic failure mode of
    hand-rolled quality heuristics, worth auditing before the score
    gates a corpus. x quantizes at 1e-6 (ln is engine-identical IEEE),
    every moment accumulates via the exact scaled-long dsum, and the
    three outputs are single double chains over those exact sums.

    Scale shape: one narrow HOF scan -> |sources|-group moment agg with
    map-side combine; closed-form solve per group. No second pass, no
    window, no join."""
    d = load(spark, sf_dir, "documents")
    q6 = lambda c: (c * 1000000 + F.lit(0.5)).cast("long").cast(
        "double"
    ) / 1000000.0
    scored = d.select(
        "source",
        q6(F.log(text.word_count("text").cast("double"))).alias("x"),
        text.quality_score("text").alias("y"),
    )
    m = scored.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n"),
        dsum("x").alias("sx"),
        dsum("y").alias("sy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
        dsum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    slope = (n * sxy - sx * sy) / F.nullif(n * sxx - sx * sx, F.lit(0.0))
    return m.select(
        "source",
        "n",
        q6(slope).alias("slope"),
        q6((sy - sx * slope) / n).alias("intercept"),
        q6(
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / F.nullif(
                (n * sxx - sx * sx) * (n * syy - sy * sy), F.lit(0.0)
            )
        ).alias("r2"),
    )


@query(
    "llm_bigram_entropy_rate",
    oracle="""
    WITH tok AS (
        SELECT source, doc_id, string_split(text, ' ') AS w
        FROM documents
    ), big AS (
        SELECT source, w[i] AS w1, w[i + 1] AS w2
        FROM tok, unnest(range(1, len(w))) AS t(i)
    ), pc AS (
        SELECT source, w1, w2, CAST(COUNT(*) AS BIGINT) AS n
        FROM big GROUP BY source, w1, w2
    ), st AS (
        SELECT source, w1, CAST(SUM(n) AS BIGINT) AS t
        FROM pc GROUP BY source, w1
    ), terms AS (
        SELECT pc.source,
               pc.w1,
               pc.n,
               CAST(trunc(-(CAST(pc.n AS DOUBLE) / st.t)
                    * ln(CAST(pc.n AS DOUBLE) / st.t)
                    * 1000000000 + 0.5) AS BIGINT) AS hq,
               st.t
        FROM pc JOIN st ON pc.source = st.source AND pc.w1 = st.w1
    ), branch AS (
        SELECT source, t,
               CAST(SUM(hq) AS DOUBLE) / 1000000000.0 AS h
        FROM terms GROUP BY source, w1, t
    )
    SELECT source,
           CAST(SUM(t) AS BIGINT) AS n_bigrams,
           CAST(trunc(SUM(CAST(trunc(CAST(t AS DOUBLE) * h * 1000000 + 0.5)
                    AS BIGINT)) / 1000000.0 / CAST(SUM(t) AS DOUBLE)
                * 1000000 + 0.5) AS BIGINT) / 1000000.0
               AS entropy_rate_nats
    FROM branch GROUP BY source
    """,
    ref="SURVEY §2 K116 [EXT] (word-bigram entropy rate per source: "
    "H(w2|w1) = Σ p(w1)·H(·|w1), the text-level analog of K104's event "
    "Markov entropy — low = templated/scripted text, high = diverse "
    "prose; sits between K85 (character level) and K50 (coherence "
    "scoring) in the text-statistics ladder)",
)
def llm_bigram_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional next-word entropy per source: per state w1 the
    Shannon entropy of its successor distribution, weighted by state
    frequency — the corpus's word-level predictability. Per-transition
    terms -p·ln p quantize at 1e-9 (the K104 idiom); each branch
    entropy is then weighted by the integer state count and quantized
    at 1e-6 before the final exact-integer reduction, so nothing
    order-sensitive survives.

    Scale shape: one corpus pass explodes bigrams into a
    (source, w1, w2)-keyed count agg (map-side combined, the only
    corpus-sized exchange); state totals join back keyed on
    (source, w1) — vocabulary-sized, co-partitioned with the pair
    table; everything after is |vocab|- then |sources|-bounded."""
    d = load(spark, sf_dir, "documents")
    # guard: sequence(0, n) counts DOWN for n < 0 (the shingles() hazard),
    # so sub-2-word / NULL texts must drop BEFORE the transform
    big = (
        d.select("source", text.words("text").alias("w"))
        .where(F.size("w") >= 2)
        .select(
            "source",
            F.explode(
                F.expr(
                    """
                    transform(sequence(0, size(w) - 2),
                        i -> struct(w[i] AS w1, w[i + 1] AS w2))
                    """
                )
            ).alias("b"),
        )
        .select("source", "b.w1", "b.w2")
    )
    pc = big.groupBy("source", "w1", "w2").agg(
        F.count("*").cast("bigint").alias("n")
    )
    st = pc.groupBy("source", "w1").agg(
        F.sum("n").cast("bigint").alias("t")
    )
    p = F.col("n").cast("double") / F.col("t")
    hq = (-p * F.log(p) * 1000000000 + F.lit(0.5)).cast("long")
    terms = pc.join(st, ["source", "w1"]).select(
        "source", "w1", "t", hq.alias("hq")
    )
    branch = terms.groupBy("source", "w1", "t").agg(
        (F.sum("hq").cast("double") / 1000000000.0).alias("h")
    )
    wq = (
        F.col("t").cast("double") * F.col("h") * 1000000 + F.lit(0.5)
    ).cast("long")
    q6 = lambda c: (c * 1000000 + F.lit(0.5)).cast("long").cast(
        "double"
    ) / 1000000.0
    return branch.select("source", "t", wq.alias("wq")).groupBy(
        "source"
    ).agg(
        F.sum("t").cast("bigint").alias("n_bigrams"),
        q6(
            F.sum("wq").cast("double")
            / 1000000.0
            / F.sum("t").cast("double")
        ).alias("entropy_rate_nats"),
    )


@query(
    "llm_cluster_label_nmi",
    oracle=f"""
    WITH cents AS (
        SELECT vec_id AS cent_id, embedding AS cent_emb
        FROM embeddings WHERE vec_id < 4
    ),
    d AS (
        SELECT e.vec_id, e.label, c.cent_id,
               {_L2SQ.format(a='e.embedding', b='c.cent_emb')} AS cd
        FROM embeddings e CROSS JOIN cents c
    ),
    a AS (
        SELECT vec_id, label, cent_id,
               row_number() OVER (PARTITION BY vec_id ORDER BY cd, cent_id)
                   AS rn
        FROM d
    ),
    cell AS (
        SELECT cent_id, label, CAST(COUNT(*) AS BIGINT) AS c
        FROM a WHERE rn = 1 GROUP BY cent_id, label
    ),
    rc AS (SELECT cent_id, CAST(SUM(c) AS BIGINT) AS r FROM cell GROUP BY cent_id),
    lc AS (SELECT label, CAST(SUM(c) AS BIGINT) AS l FROM cell GROUP BY label),
    n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cell),
    hc AS (
        SELECT SUM(CAST(trunc(-(CAST(r AS DOUBLE) / n.n)
                 * ln(CAST(r AS DOUBLE) / n.n) * 1000000000 + 0.5)
                 AS BIGINT)) AS hq
        FROM rc, n
    ),
    hl AS (
        SELECT SUM(CAST(trunc(-(CAST(l AS DOUBLE) / n.n)
                 * ln(CAST(l AS DOUBLE) / n.n) * 1000000000 + 0.5)
                 AS BIGINT)) AS hq
        FROM lc, n
    ),
    mi AS (
        SELECT SUM(CAST(trunc((CAST(c AS DOUBLE) / n.n)
                 * ln(CAST(c AS DOUBLE) * n.n
                      / (CAST(rc.r AS DOUBLE) * lc.l))
                 * 1000000000 + 0.5) AS BIGINT)) AS miq
        FROM cell JOIN rc USING (cent_id) JOIN lc USING (label), n
    ),
    pur AS (
        SELECT SUM(mx) AS p FROM (
            SELECT cent_id, MAX(c) AS mx FROM cell GROUP BY cent_id
        )
    )
    SELECT n.n AS n_vectors,
           CAST(trunc(CAST(pur.p AS DOUBLE) / n.n * 1000000 + 0.5)
                AS BIGINT) / 1000000.0 AS purity,
           CAST(trunc(CAST(hc.hq AS DOUBLE) / 1000000000.0 * 1000000 + 0.5)
                AS BIGINT) / 1000000.0 AS h_cluster,
           CAST(trunc(CAST(hl.hq AS DOUBLE) / 1000000000.0 * 1000000 + 0.5)
                AS BIGINT) / 1000000.0 AS h_label,
           CAST(trunc(CAST(mi.miq AS DOUBLE) / 1000000000.0 * 1000000 + 0.5)
                AS BIGINT) / 1000000.0 AS mutual_info,
           CAST(trunc(CAST(mi.miq AS DOUBLE)
                / NULLIF(sqrt(CAST(hc.hq AS DOUBLE) * CAST(hl.hq AS DOUBLE)),
                         0)
                * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS nmi
    FROM n, hc, hl, mi, pur
    """,
    ref="SURVEY §2 K117 [EXT] (external cluster validation: purity and "
    "normalized mutual information between the K-centroid assignment "
    "(K19's deterministic Lloyd step) and the ground-truth labels — "
    "the EXTERNAL quality number beside K101's internal silhouette; "
    "NMI = I(C;L)/sqrt(H(C)H(L)), all terms 1e-9-quantized with the "
    "trunc discipline)",
)
def llm_cluster_label_nmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How well do the embedding clusters recover the labels: purity
    (majority-label mass) and NMI over the cluster × label confusion
    table. Every probability comes from exact integer cell counts;
    each -p ln p / p ln(np/(r·l)) term quantizes at 1e-9 before the
    bounded (K×|labels|) reduction, and the two ratios at the end are
    identically-spelled double chains.

    Scale shape: the assignment is the shared broadcast-centroid O(n·K)
    pass (_assign_fixed_centroids); the confusion table and every total
    derived from it are K×|labels|-bounded. One corpus pass, no pair
    enumeration."""
    e = load(spark, sf_dir, "embeddings")
    assigned = _assign_fixed_centroids(e).select("vec_id", "cent_id")
    cell = (
        assigned.join(e.select("vec_id", "label"), "vec_id")
        .groupBy("cent_id", "label")
        .agg(F.count("*").cast("bigint").alias("c"))
        .localCheckpoint()
    )
    rc = cell.groupBy("cent_id").agg(F.sum("c").cast("bigint").alias("r"))
    lc = cell.groupBy("label").agg(F.sum("c").cast("bigint").alias("l"))
    n = cell.agg(F.sum("c").cast("bigint").alias("n"))
    q9 = lambda c: (c * 1000000000 + F.lit(0.5)).cast("long")
    hc = (
        rc.crossJoin(F.broadcast(n))
        .select(
            q9(
                -(F.col("r").cast("double") / F.col("n"))
                * F.log(F.col("r").cast("double") / F.col("n"))
            ).alias("t")
        )
        .agg(F.sum("t").alias("hq"))
    )
    hl = (
        lc.crossJoin(F.broadcast(n))
        .select(
            q9(
                -(F.col("l").cast("double") / F.col("n"))
                * F.log(F.col("l").cast("double") / F.col("n"))
            ).alias("t")
        )
        .agg(F.sum("t").alias("hq"))
    )
    mi = (
        cell.join(F.broadcast(rc), "cent_id")
        .join(F.broadcast(lc), "label")
        .crossJoin(F.broadcast(n))
        .select(
            q9(
                (F.col("c").cast("double") / F.col("n"))
                * F.log(
                    F.col("c").cast("double")
                    * F.col("n")
                    / (F.col("r").cast("double") * F.col("l"))
                )
            ).alias("t")
        )
        .agg(F.sum("t").alias("miq"))
    )
    pur = (
        cell.groupBy("cent_id")
        .agg(F.max("c").alias("mx"))
        .agg(F.sum("mx").alias("p"))
    )
    q6 = lambda c: (c * 1000000 + F.lit(0.5)).cast("long").cast(
        "double"
    ) / 1000000.0
    out = (
        n.crossJoin(F.broadcast(hc.withColumnRenamed("hq", "hcq")))
        .crossJoin(F.broadcast(hl.withColumnRenamed("hq", "hlq")))
        .crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(pur))
    )
    return out.select(
        F.col("n").alias("n_vectors"),
        q6(F.col("p").cast("double") / F.col("n")).alias("purity"),
        q6(F.col("hcq").cast("double") / 1000000000.0).alias("h_cluster"),
        q6(F.col("hlq").cast("double") / 1000000000.0).alias("h_label"),
        q6(F.col("miq").cast("double") / 1000000000.0).alias("mutual_info"),
        q6(
            F.col("miq").cast("double")
            / F.nullif(
                F.sqrt(
                    F.col("hcq").cast("double") * F.col("hlq").cast("double")
                ),
                F.lit(0.0),
            )
        ).alias("nmi"),
    )


@query(
    "llm_quality_wilson_interval",
    oracle=f"""
    WITH scored AS (
        SELECT source,
               CASE WHEN ({_OLS_QUALITY}) >= 0.5 THEN 1 ELSE 0 END AS pass
        FROM documents
    ), agg AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(pass) AS BIGINT) AS k
        FROM scored GROUP BY source
    )
    SELECT source, n, k,
           CAST(trunc(CAST(k AS DOUBLE) / n * 1000000 + 0.5) AS BIGINT)
               / 1000000.0 AS p_hat,
           CAST(trunc(
               ((CAST(k AS DOUBLE) / n + 3.8416 / (2 * n)
                 - 1.96 * sqrt((CAST(k AS DOUBLE) / n
                                * (1.0 - CAST(k AS DOUBLE) / n)
                                + 3.8416 / (4 * n)) / n))
                / (1.0 + 3.8416 / n))
               * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS wilson_lo,
           CAST(trunc(
               ((CAST(k AS DOUBLE) / n + 3.8416 / (2 * n)
                 + 1.96 * sqrt((CAST(k AS DOUBLE) / n
                                * (1.0 - CAST(k AS DOUBLE) / n)
                                + 3.8416 / (4 * n)) / n))
                / (1.0 + 3.8416 / n))
               * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS wilson_hi
    FROM agg
    """,
    ref="SURVEY §2 K118 [EXT] (Wilson 95% score interval on the per-"
    "source quality pass rate — the binomial CI that stays inside "
    "[0,1] and behaves at small n where the Wald interval collapses; "
    "what an eval dashboard should put around every pass-rate before "
    "anyone compares two sources)",
)
def llm_quality_wilson_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pass rate (quality >= 0.5) per source with its Wilson 95%
    interval: (p + z²/2n ± z·sqrt((p(1-p) + z²/4n)/n)) / (1 + z²/n),
    z = 1.96 (z² = 3.8416 spelled as a constant so both engines fold
    it identically). Exact integer n/k; each bound is one double chain
    quantized once.

    Scale shape: one narrow HOF scan -> |sources|-group agg; closed
    form per group."""
    d = load(spark, sf_dir, "documents")
    agg = d.select(
        "source",
        F.when(text.quality_score("text") >= 0.5, 1).otherwise(0).alias(
            "pass"
        ),
    ).groupBy("source").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("pass").cast("bigint").alias("k"),
    )
    n = F.col("n")
    p = F.col("k").cast("double") / n
    z2 = F.lit(3.8416)
    denom = 1.0 + z2 / n
    centre = p + z2 / (2 * n)
    spread = 1.96 * F.sqrt((p * (1.0 - p) + z2 / (4 * n)) / n)
    q6 = lambda c: (c * 1000000 + F.lit(0.5)).cast("long").cast(
        "double"
    ) / 1000000.0
    return agg.select(
        "source",
        "n",
        "k",
        q6(p).alias("p_hat"),
        q6((centre - spread) / denom).alias("wilson_lo"),
        q6((centre + spread) / denom).alias("wilson_hi"),
    )


@query(
    "llm_cluster_medoids",
    oracle=f"""
    WITH cents AS (
        SELECT vec_id AS cent_id, embedding AS cent_emb
        FROM embeddings WHERE vec_id < 4
    ),
    d AS (
        SELECT e.vec_id, e.embedding, c.cent_id,
               {_L2SQ.format(a='e.embedding', b='c.cent_emb')} AS cd
        FROM embeddings e CROSS JOIN cents c
    ),
    a AS (
        SELECT vec_id, embedding, cent_id,
               row_number() OVER (PARTITION BY vec_id ORDER BY cd, cent_id)
                   AS rn
        FROM d
    ), members AS (
        SELECT vec_id, embedding, cent_id FROM a WHERE rn = 1
    ), pair_cost AS (
        SELECT x.cent_id, x.vec_id,
               SUM(CAST(trunc(
                   {_L2SQ.format(a='x.embedding', b='y.embedding')}
                   * 1000000 + 0.5) AS BIGINT)) AS cost_q
        FROM members x JOIN members y
          ON x.cent_id = y.cent_id AND x.vec_id <> y.vec_id
        GROUP BY x.cent_id, x.vec_id
    ), ranked AS (
        SELECT cent_id, vec_id, cost_q,
               row_number() OVER (PARTITION BY cent_id
                                  ORDER BY cost_q, vec_id) AS rn
        FROM pair_cost
    )
    SELECT cent_id, vec_id AS medoid_id,
           CAST(trunc(CAST(cost_q AS DOUBLE) / 1000000.0
                * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS total_cost
    FROM ranked WHERE rn = 1
    """,
    ref="SURVEY §2 K121 [EXT] (cluster medoids / representative "
    "selection: within each K19 cluster the member minimizing the sum "
    "of squared distances to its peers — the coreset/exemplar pick "
    "behind diverse-subset curation and 'show me one doc per topic'; "
    "pair space is CLUSTER-BLOCKED (n²/K, the K39 SemDeDup bound), "
    "1e-6-quantized distance sums make the argmin engine-exact)",
)
def llm_cluster_medoids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The most central member of each embedding cluster: assign to the
    4 fixed centroids (the shared Lloyd step), then per cluster the
    vector with the minimum total squared distance to its co-members,
    tie-broken by id. Distances quantize at 1e-6 before the per-member
    sum so the argmin is deterministic cross-engine.

    Scale shape: assignment is the broadcast-centroid narrow pass; the
    pair cost is a cluster-keyed self-join (n²/K pairs, the SemDeDup
    blocking bound — plan-gated no-cartesian), aggregated per member
    with map-side combine; the final argmin is a per-cluster window
    over |members| rows. At 100 TB the same shape runs on a per-
    cluster SAMPLE (the standard medoid approximation) — one extra
    filter, identical plan."""
    e = load(spark, sf_dir, "embeddings")
    members = _assign_fixed_centroids(e).select(
        "vec_id", "embedding", "cent_id"
    )
    # bucket fan-out on the pair-join key (round-8 probe, bit-exact — the
    # _SEMDEDUP_BUCKETS rationale): cent_id alone gives K=4-way parallelism;
    # x probing all S y-buckets keeps every pair exactly once at K·S tasks.
    # The quantized pair distance itself stays the per-pair l2_sq_dist HOF —
    # a norm-expansion rewrite would change double low bits vs the oracle.
    S = _SEMDEDUP_BUCKETS
    x = members.withColumn(
        "probe", F.explode(F.sequence(F.lit(0), F.lit(S - 1)))
    ).alias("x")
    y = members.withColumn(
        "bucket", F.pmod(F.col("vec_id"), F.lit(S)).cast("int")
    ).alias("y")
    dq = (
        vectors.l2_sq_dist(F.col("x.embedding"), F.col("y.embedding"))
        * 1000000
        + F.lit(0.5)
    ).cast("long")
    pair_cost = (
        x.join(
            y,
            (F.col("x.cent_id") == F.col("y.cent_id"))
            & (F.col("x.probe") == F.col("y.bucket"))
            & (F.col("x.vec_id") != F.col("y.vec_id")),
        )
        .groupBy(F.col("x.cent_id").alias("cent_id"), F.col("x.vec_id").alias("vec_id"))
        .agg(F.sum(dq).alias("cost_q"))
    )
    w = Window.partitionBy("cent_id").orderBy("cost_q", "vec_id")
    return (
        pair_cost.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "cent_id",
            F.col("vec_id").alias("medoid_id"),
            (
                (F.col("cost_q").cast("double") / 1000000.0 * 1000000
                 + F.lit(0.5)).cast("long").cast("double") / 1000000.0
            ).alias("total_cost"),
        )
    )


#: medoid production sampling: each member's centrality is estimated against
#: this many deterministically-sampled co-members instead of ALL of them —
#: pair space n_k·m per cluster instead of n_k² (the documented lever the
#: round-8 probe measured; 268 s exact → the sampled path's bound).
_MEDOID_SAMPLE = 64


@query(
    "llm_cluster_medoids_sampled",
    oracle=None,  # sampled Σ-distance estimate ≠ exact → rows-only; law below
    ref="SURVEY §2 K121 [EXT] (production medoids: per-cluster sampled "
    "centrality — every member's cost is the Σ of squared distances to m "
    "deterministically-sampled peers, argmin over the estimates; the "
    "standard CLARA/CLARANS-style medoid approximation. Law pinned in "
    "tests/test_llm_quality.py: on the fixture the sampled medoid's EXACT "
    "cost ranks in the top decile of its cluster)",
    tags=("rows_only_by_design",),
)
def llm_cluster_medoids_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled-peer medoids — the production form of llm_cluster_medoids:
    same fixed-centroid assignment, but each member's centrality is
    estimated against only the m=_MEDOID_SAMPLE co-members with the
    smallest Knuth hash of vec_id (a deterministic per-cluster draw —
    partition/file-order independent, the _reservoir_sample contract
    applied per cluster via one window).

    Scale shape — the lever the exact twin cannot pull: pair space drops
    from Σ_k n_k² to Σ_k n_k·m (LINEAR in n at fixed m); the sampled peer
    set is O(K·m) rows, so the cost join's build side stays bounded and
    the whole estimate is one equi-join on cent_id + one map-side-combine
    agg + one per-cluster argmin window. The exact twin stays registered
    as the oracle-parity spec; this entry is the one you run at 100 TB."""
    e = load(spark, sf_dir, "embeddings")
    members = _assign_fixed_centroids(e).select("vec_id", "embedding", "cent_id")
    hk = (
        F.pmod(F.col("vec_id"), F.lit(2147483648)) * F.lit(2654435761).cast("long")
    ) % F.lit(4294967296)
    peer_w = Window.partitionBy("cent_id").orderBy(F.col("_hk").asc(), F.col("vec_id"))
    peers = (
        members.withColumn("_hk", hk)
        .withColumn("_pr", F.row_number().over(peer_w))
        .where(F.col("_pr") <= _MEDOID_SAMPLE)
        .select(
            F.col("cent_id").alias("y_cent"),
            F.col("vec_id").alias("y_id"),
            F.col("embedding").alias("y_emb"),
        )
    )
    dq = (
        vectors.l2_sq_dist(F.col("embedding"), F.col("y_emb")) * 1000000
        + F.lit(0.5)
    ).cast("long")
    cost = (
        members.join(
            peers,
            (F.col("cent_id") == F.col("y_cent"))
            & (F.col("vec_id") != F.col("y_id")),
        )
        .groupBy("cent_id", "vec_id")
        .agg(F.sum(dq).alias("cost_q"), F.count("*").alias("n_peers"))
    )
    w = Window.partitionBy("cent_id").orderBy("cost_q", "vec_id")
    return (
        cost.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "cent_id",
            F.col("vec_id").alias("medoid_id"),
            (F.col("cost_q").cast("double") / 1000000.0).alias("sampled_cost"),
            F.col("n_peers").cast("long").alias("n_sampled_peers"),
        )
    )


@query(
    "llm_pipeline_e2e_scaled",
    oracle=None,  # KMeans SemDeDup stage ≠ SQL-expressible → rows-only; law below
    ref="SURVEY §2 K28 production posture (VERDICT r9 item 3: the flagship "
    "shard-build pipeline routed through the 100 TB-path siblings — "
    "quality gate -> exact dedup -> llm_semantic_dedup_scaled (KMeans "
    "K ∝ n, pair space linear in n) -> weighted selection -> shard "
    "layout by fixed-centroid cluster with llm_cluster_medoids_sampled "
    "anchors. Identity law pinned in tests/test_llm_quality.py: on the "
    "fixture, survivors == exact-pipeline survivors minus the scaled "
    "SemDeDup drops, and every (cent_id, medoid_id) matches the "
    "medoid entry)",
    tags=("rows_only_by_design",),
)
def llm_pipeline_e2e_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-shard selection on the PRODUCTION path — the
    pipeline you run at 100 TB, composing the scaled siblings instead of
    the fixed-K oracle twins:

      1. score quality + token counts, gate quality >= 0.3 (narrow scan);
      2. exact dedup — min doc_id per md5(text) (one hash shuffle);
      3. semantic dedup via llm_semantic_dedup_scaled: KMeans K ∝ n
         codebook, bucket-fanned per-cluster pair stage — pair space
         LINEAR in n (drop any vector with a lower-id near-dup at
         cosine >= 0.35);
      4. weighted keep via the deterministic Knuth draw (per-row expr);
      5. shard layout: fixed-centroid cluster id + the cluster's
         CLARA-style sampled medoid as the shard anchor (broadcast
         K-row join).

    Every stage keeps its sibling's scale shape: the only corpus-wide
    exchanges are the dedup agg + join-back, the embedding join, and the
    linear pair stage; the KMeans fit is O(sample·K) on a <= 4096-vector
    deterministic reservoir; medoid estimation is Σ n_k·m pairs. The
    exact-twin pipeline (llm_pipeline_e2e) stays registered as the
    oracle-parity spec; the identity law ties this entry to it on the
    fixture, so correctness evidence transfers."""
    return _pipeline_e2e_production(spark, sf_dir, llm_semantic_dedup_scaled)


def _pipeline_e2e_production(spark, sf_dir, sem_dedup_fn):
    """Shared production shard-build pipeline: quality gate -> exact dedup ->
    the given semantic-dedup sibling -> weighted keep -> fixed-centroid shard
    layout with sampled medoid anchors. `sem_dedup_fn` is the corpus-size
    switch: `llm_semantic_dedup_scaled` (flat K ∝ n codebook) up to its
    K<=4096 linearity boundary (~1M vectors), `llm_semantic_dedup_hier`
    (two-level codebook, effective K = K_c*K2) past it — both emit the same
    (vec_id, dropped, ...) schema via the byte-shared decide stage, so the
    pipeline composition is identical."""
    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    scored = d.select(
        "doc_id",
        "text",
        text.word_count("text").cast("long").alias("n_tokens"),
        text.quality_score("text").alias("quality"),
    ).where(F.col("quality") >= 0.3)
    h = F.md5(F.col("text").cast("binary"))
    canon = scored.groupBy(h.alias("h")).agg(F.min("doc_id").alias("keep_id"))
    deduped = scored.join(
        canon,
        (h == F.col("h")) & (F.col("doc_id") == F.col("keep_id")),
    )
    # production semantic dedup: keep vectors the chosen sibling retains
    sem_kept = (
        sem_dedup_fn(spark, sf_dir)
        .where(~F.col("dropped"))
        .select("vec_id")
    )
    u = (
        (
            (F.col("doc_id") % F.lit(2147483648))
            * F.lit(2654435761).cast("long")
        )
        % F.lit(4294967296)
    ).cast("double") / F.lit(4294967296.0)
    survivors = (
        deduped.join(e, F.col("doc_id") == F.col("vec_id"))
        .join(sem_kept, "vec_id", "semi")
        .where(u < F.col("quality"))
        .select("doc_id", "n_tokens", "quality", "vec_id", "embedding")
    )
    # shard layout: fixed-centroid cluster + its sampled medoid anchor
    assign = _assign_fixed_centroids(e).select("vec_id", "cent_id")
    medoids = llm_cluster_medoids_sampled(spark, sf_dir).select(
        "cent_id", "medoid_id"
    )
    return (
        survivors.join(assign, "vec_id")
        .join(F.broadcast(medoids), "cent_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "quality",
            "cent_id",
            "medoid_id",
            vectors.l2_norm("embedding").alias("emb_norm"),
        )
    )


@query(
    "llm_multimodal_ahash",
    oracle="""
    WITH p AS (
        SELECT doc_id,
               16 + n_chars % 48 AS w,
               16 + (n_chars * 7) % 48 AS h
        FROM documents
    ), g AS (
        SELECT doc_id,
               flatten(list_transform(range(0, 8), yt ->
                   list_transform(range(0, 8), xt ->
                       list_sum(list_transform(range(0, 3), c ->
                           (((xt * w) // 8) * 3 + ((yt * h) // 8) * 7 + c)
                           % 256))))) AS gv
        FROM p
    )
    SELECT doc_id,
           CAST(list_sum(list_transform(range(0, 64), i ->
               CASE WHEN i >= 32 AND 64 * gv[i + 1] > list_sum(gv)
                    THEN 1 << (i - 32) ELSE 0 END)) AS BIGINT) AS ahash_hi,
           CAST(list_sum(list_transform(range(0, 64), i ->
               CASE WHEN i < 32 AND 64 * gv[i + 1] > list_sum(gv)
                    THEN 1 << i ELSE 0 END)) AS BIGINT) AS ahash_lo,
           CAST(list_sum(list_transform(gv, x ->
               CASE WHEN 64 * x > list_sum(gv) THEN 1 ELSE 0 END))
               AS INT) AS n_set
    FROM g
    """,
    ref="SURVEY §2 K122 [EXT] (image average-hash: the synth-PPM byte "
    "round-trip (K5's oracle-exact pixel path) -> 8×8 nearest resize "
    "-> grayscale sum -> above-mean bit per cell = the 64-bit aHash, "
    "emitted as two 32-bit halves — the image analog of K32b SimHash; "
    "hamming distance over the halves is the near-dup metric, exact "
    "collision the hamming-0 bucket. The strict integer threshold "
    "64·g > Σg avoids any mean division, so the oracle states every "
    "bit in closed form)",
)
def llm_multimodal_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual average-hash of every synthesized image, through the
    REAL byte pipeline (PPM encode → header parse → nearest-neighbor
    resample) with the hash math in exact integers; the flattened gv
    index in the oracle walks the same row-major (y, x) order as the
    numpy array, so all 64 bits line up.

    Scale shape: one Arrow-batched mapInPandas pass, no shuffle; dedup
    consumers group on (ahash_hi, ahash_lo) — a digest-sized
    exchange."""
    return multimodal.synth_ppm_ahash(load(spark, sf_dir, "documents"))


@query(
    "llm_tfidf_cosine_pairs",
    oracle="""
    WITH tf AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents
    ), tfc AS (
        SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tf WHERE word <> '' GROUP BY doc_id, word
    ), dfreq AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tfc GROUP BY word
    ), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    wts AS (
        SELECT t.doc_id, t.word,
               CAST(trunc(t.tf * ln((CAST(n.n_docs AS DOUBLE) + 1.0)
                                    / (CAST(d.df AS DOUBLE) + 1.0))
                    * 1000000 + 0.5) AS BIGINT) AS wq
        FROM tfc t JOIN dfreq d USING (word), n
    ), norms AS (
        SELECT doc_id, SUM(wq * wq) AS n2 FROM wts GROUP BY doc_id
    ), cand AS (
        SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        FROM tfc a JOIN tfc b ON a.word = b.word AND a.doc_id < b.doc_id
        JOIN dfreq d ON d.word = a.word
        WHERE d.df BETWEEN 2 AND 5
    ), dots AS (
        SELECT c.da, c.db,
               CAST(COUNT(*) AS BIGINT) AS n_shared_terms,
               SUM(wa.wq * wb.wq) AS dot
        FROM cand c
        JOIN wts wa ON wa.doc_id = c.da
        JOIN wts wb ON wb.doc_id = c.db AND wb.word = wa.word
        GROUP BY c.da, c.db
    )
    SELECT d.da AS doc_a, d.db AS doc_b, d.n_shared_terms,
           CAST(trunc(CAST(d.dot AS DOUBLE)
                / NULLIF(sqrt(CAST(na.n2 AS DOUBLE))
                         * sqrt(CAST(nb.n2 AS DOUBLE)), 0)
                * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS cosine
    FROM dots d
    JOIN norms na ON na.doc_id = d.da
    JOIN norms nb ON nb.doc_id = d.db
    """,
    ref="SURVEY §2 K123 [EXT] (sparse TF-IDF cosine similarity: "
    "candidate pairs blocked on RARE shared terms (2 <= df <= 5 — the "
    "prefix-filtering trick: a common word never generates pairs), "
    "full dot product over all shared terms via posting-keyed joins — "
    "the lexical/sparse complement of K3's dense-embedding ANN, "
    "catching near-dups that share vocabulary but embed apart)",
)
def llm_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF cosine for document pairs that share at least one rare
    term: weights quantize at 1e-6 (trunc discipline) so dots and norms
    are exact integer sums; the single double chain at the end is
    identically spelled. Blocking bounds the pair space by rare-term
    posting lists (<= C(5,2) pairs per qualifying word) — common words
    never pair anything.

    Scale shape: explode -> (doc, word) counts (the corpus exchange),
    df agg, candidate build keyed on rare words only, then the dot is
    two posting-keyed equi-joins (da, then (db, word)) aggregated per
    pair with map-side combine; norms broadcast-join back. Never an
    unblocked doc×doc pass (plan-gated no-cartesian)."""
    d = load(spark, sf_dir, "documents")
    tfc = (
        d.select("doc_id", F.explode(text.words("text")).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").cast("bigint").alias("tf"))
        .localCheckpoint()
    )
    dfreq = tfc.groupBy("word").agg(
        F.count("*").cast("bigint").alias("df")
    )
    n = d.agg(F.count("*").cast("bigint").alias("n_docs"))
    wts = (
        tfc.join(dfreq, "word")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "word",
            (
                F.col("tf")
                * F.log(
                    (F.col("n_docs").cast("double") + 1.0)
                    / (F.col("df").cast("double") + 1.0)
                )
                * 1000000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("wq"),
        )
        .localCheckpoint()
    )
    norms = wts.groupBy("doc_id").agg(
        F.sum(F.col("wq") * F.col("wq")).alias("n2")
    )
    rare = dfreq.where(F.col("df").between(2, 5)).select("word")
    a = tfc.join(rare, "word").select(
        "word", F.col("doc_id").alias("da")
    )
    b = tfc.join(rare, "word").select(
        "word", F.col("doc_id").alias("db")
    )
    cand = (
        a.join(b, "word")
        .where(F.col("da") < F.col("db"))
        .select("da", "db")
        .distinct()
    )
    wa = wts.select(
        F.col("doc_id").alias("da"), "word", F.col("wq").alias("wa")
    )
    wb = wts.select(
        F.col("doc_id").alias("db"), "word", F.col("wq").alias("wb")
    )
    dots = (
        cand.join(wa, "da")
        .join(wb, ["db", "word"])
        .groupBy("da", "db")
        .agg(
            F.count("*").cast("bigint").alias("n_shared_terms"),
            F.sum(F.col("wa") * F.col("wb")).alias("dot"),
        )
    )
    na = norms.select(F.col("doc_id").alias("da"), F.col("n2").alias("na2"))
    nb = norms.select(F.col("doc_id").alias("db"), F.col("n2").alias("nb2"))
    q6 = lambda c: (c * 1000000 + F.lit(0.5)).cast("long").cast(
        "double"
    ) / 1000000.0
    return (
        dots.join(na, "da")
        .join(nb, "db")
        .select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            "n_shared_terms",
            q6(
                F.col("dot").cast("double")
                / F.nullif(
                    F.sqrt(F.col("na2").cast("double"))
                    * F.sqrt(F.col("nb2").cast("double")),
                    F.lit(0.0),
                )
            ).alias("cosine"),
        )
    )


@query(
    "llm_ngram_containment",
    oracle="""
    WITH sh AS (
        SELECT doc_id, source,
               list_distinct(
                   list_transform(range(1, len(string_split(text,' ')) - 1),
                       i -> string_split(text,' ')[i] || ' ' ||
                            string_split(text,' ')[i+1] || ' ' ||
                            string_split(text,' ')[i+2])) AS grams
        FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(a.grams) AS BIGINT) AS n_grams_a,
           CAST(len(list_filter(a.grams, x -> list_contains(b.grams, x)))
                AS BIGINT) AS n_shared,
           CAST(trunc(
               CAST(len(list_filter(a.grams, x -> list_contains(b.grams, x)))
                    AS DOUBLE) / len(a.grams)
               * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS containment_a_in_b
    FROM sh a JOIN sh b
      ON a.source = b.source AND a.doc_id <> b.doc_id
     AND abs(b.doc_id - a.doc_id) <= 20
    WHERE len(a.grams) > 0
      AND len(list_filter(a.grams, x -> list_contains(b.grams, x))) * 5
          >= len(a.grams)
    """,
    ref="SURVEY §2 K124 [EXT] (directed shingle containment "
    "C(A→B) = |A∩B|/|A| >= 0.2 on the K2 bounded candidate set — "
    "Broder's ASYMMETRIC resemblance: detects a short doc quoted/"
    "embedded inside a long one, which symmetric Jaccard dilutes "
    "toward zero; ordered pairs, both directions reported)",
)
def llm_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed 3-gram containment for nearby same-source pairs: what
    fraction of A's shingles appear in B (>= 0.2 kept) — the
    quote/subset detector symmetric Jaccard misses when |A| << |B|.
    Ordered pairs (both directions), exact integer overlap counts, one
    quantized division.

    Scale shape: the K2 candidate discipline — bounded blocked pairs
    (same source, id distance <= 20) joined on the block key; at scale
    candidates come from MinHash banding instead, identical downstream
    shape. Set ops run per-pair on the two gram arrays (JVM HOFs).

    Round-8 probe fixes, both bit-exact: (1) the equi-join key carries an
    id BUCKET (floor(id/20); a probes b's bucket±1) so the candidate space
    is ~40 pairs/doc instead of the full same-source product — at the sf1
    probe the source-only key made 5×10⁸ SMJ candidates and the entry ran
    >14 min before being killed; (2) the A-in-B overlap count uses
    array_intersect (hash-set O(|a|+|b|); a.grams is already distinct, so
    it equals the old O(|a|·|b|) filter/array_contains count exactly)."""
    d = load(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id",
        "source",
        F.array_distinct(text.shingles("text", 3)).alias("grams"),
    )
    bucket = F.floor(F.col("doc_id") / 20)
    a = sh.withColumn(
        "probe", F.explode(F.array(bucket - 1, bucket, bucket + 1))
    ).alias("a")
    b = sh.withColumn("bucket", bucket).alias("b")
    shared = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    na = F.size(F.col("a.grams"))
    q6 = lambda c: (c * 1000000 + F.lit(0.5)).cast("long").cast(
        "double"
    ) / 1000000.0
    return (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.probe") == F.col("b.bucket"))
            & (F.col("a.doc_id") != F.col("b.doc_id"))
            & (
                F.abs(F.col("b.doc_id") - F.col("a.doc_id")) <= 20
            ),
        )
        .where((na > 0) & (shared * 5 >= na))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            na.cast("bigint").alias("n_grams_a"),
            shared.cast("bigint").alias("n_shared"),
            q6(shared.cast("double") / na).alias("containment_a_in_b"),
        )
    )


@query(
    "llm_char_trigram_lang_id",
    oracle="""
    WITH tot AS (
        SELECT CAST(MAX(doc_id) + 1 AS BIGINT) AS n_docs FROM documents
    ), base AS (
        SELECT doc_id, lang,
               CAST(least(9, trunc(doc_id * 10.0 / n_docs)) AS INT) AS decile,
               list_transform(range(1, len(text) - 1),
                              i -> substring(text, CAST(i AS INT), 3)) AS tg
        FROM documents, tot WHERE len(text) >= 3
    ), train_counts AS (
        SELECT lang, unnest(tg) AS g FROM base WHERE decile < 9
    ), tc AS (
        SELECT lang, g, CAST(COUNT(*) AS BIGINT) AS c
        FROM train_counts GROUP BY lang, g
    ), prof AS (
        SELECT lang, g FROM (
            SELECT lang, g,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY c DESC, g) AS rn
            FROM tc
        ) WHERE rn <= 20
    ), test_grams AS (
        SELECT DISTINCT doc_id, lang AS true_lang, unnest(tg) AS g
        FROM base WHERE decile = 9
    ), scores AS (
        SELECT t.doc_id, t.true_lang, p.lang AS cand,
               CAST(COUNT(*) AS BIGINT) AS hits
        FROM test_grams t JOIN prof p ON t.g = p.g
        GROUP BY t.doc_id, t.true_lang, p.lang
    ), pred AS (
        SELECT doc_id, true_lang, cand AS pred_lang FROM (
            SELECT doc_id, true_lang, cand,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY hits DESC, cand) AS rn
            FROM scores
        ) WHERE rn = 1
    )
    SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred GROUP BY true_lang, pred_lang
    """,
    ref="SURVEY §2 K125 [EXT] (character-trigram language ID, trained "
    "end-to-end: top-20 trigram profiles per language from doc-id "
    "deciles 0-8 (Cavnar-Trenkle n-gram profiling), decile-9 docs "
    "classified by profile-hit argmax, reported as the "
    "true×predicted confusion matrix — a real train/evaluate loop in "
    "pure relational algebra, upgrading K34's stopword heuristic)",
)
def llm_char_trigram_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a Cavnar-Trenkle-style profile (top-20 character trigrams
    per language) on 90% of the corpus, classify the held-out decile by
    distinct-trigram profile hits (deterministic argmax: hits DESC,
    lang ASC), and emit the confusion matrix. All counts exact
    integers; the only windows are per-language rank over trigram
    counts (vocabulary-bounded) and per-doc argmax over ≤|langs| rows.

    Scale shape: one corpus explode -> (lang, trigram) count (map-side
    combined, the K4 posture); profiles are |langs|×20 — broadcast-
    sized for the scoring join, which keys on the trigram; per-doc
    score rows are ≤|langs| each. The decile boundary is the K108
    1-row broadcast."""
    d = load(spark, sf_dir, "documents")
    tot = d.agg((F.max("doc_id") + 1).cast("bigint").alias("n_docs"))
    base = (
        d.crossJoin(F.broadcast(tot))
        .where(F.length("text") >= 3)
        .select(
            "doc_id",
            "lang",
            F.least(
                F.lit(9),
                F.floor(F.col("doc_id") * 10.0 / F.col("n_docs")),
            )
            .cast("int")
            .alias("decile"),
            F.expr(
                """
                transform(sequence(1, length(text) - 2),
                          i -> substring(text, i, 3))
                """
            ).alias("tg"),
        )
    )
    tc = (
        base.where("decile < 9")
        .select("lang", F.explode("tg").alias("g"))
        .groupBy("lang", "g")
        .agg(F.count("*").alias("c"))
    )
    wr = Window.partitionBy("lang").orderBy(F.col("c").desc(), "g")
    prof = (
        tc.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") <= 20)
        .select(F.col("lang").alias("cand"), "g")
    )
    test_grams = (
        base.where("decile = 9")
        .select(
            "doc_id",
            F.col("lang").alias("true_lang"),
            F.explode("tg").alias("g"),
        )
        .distinct()
    )
    scores = (
        test_grams.join(F.broadcast(prof), "g")
        .groupBy("doc_id", "true_lang", "cand")
        .agg(F.count("*").alias("hits"))
    )
    wp = Window.partitionBy("doc_id").orderBy(
        F.col("hits").desc(), "cand"
    )
    pred = (
        scores.withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") == 1)
        .select("true_lang", F.col("cand").alias("pred_lang"))
    )
    return pred.groupBy("true_lang", "pred_lang").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )


@query(
    "llm_multimodal_dhash",
    oracle="""
    WITH p AS (
        SELECT doc_id,
               16 + n_chars % 48 AS w,
               16 + (n_chars * 7) % 48 AS h
        FROM documents
    ), g AS (
        SELECT doc_id,
               flatten(list_transform(range(0, 8), yt ->
                   list_transform(range(0, 9), xt ->
                       list_sum(list_transform(range(0, 3), c ->
                           (((xt * w) // 9) * 3 + ((yt * h) // 8) * 7 + c)
                           % 256))))) AS gv
        FROM p
    )
    SELECT doc_id,
           CAST(list_sum(flatten(list_transform(range(0, 8), yt ->
               list_transform(range(0, 8), xt ->
                   CASE WHEN yt * 8 + xt >= 32
                             AND gv[yt * 9 + xt + 1] > gv[yt * 9 + xt + 2]
                        THEN 1 << (yt * 8 + xt - 32) ELSE 0 END))))
               AS BIGINT) AS dhash_hi,
           CAST(list_sum(flatten(list_transform(range(0, 8), yt ->
               list_transform(range(0, 8), xt ->
                   CASE WHEN yt * 8 + xt < 32
                             AND gv[yt * 9 + xt + 1] > gv[yt * 9 + xt + 2]
                        THEN 1 << (yt * 8 + xt) ELSE 0 END))))
               AS BIGINT) AS dhash_lo,
           CAST(list_sum(flatten(list_transform(range(0, 8), yt ->
               list_transform(range(0, 8), xt ->
                   CASE WHEN gv[yt * 9 + xt + 1] > gv[yt * 9 + xt + 2]
                        THEN 1 ELSE 0 END)))) AS INT) AS n_set
    FROM g
    """,
    ref="SURVEY §2 K126 [EXT] (image difference-hash: the synth-PPM byte "
    "round-trip resized to 9×8 so each row yields 8 horizontal gradient "
    "signs — bit (y·8+x) iff g[y,x] > g[y,x+1]; the brightness-invariant "
    "complement of K122's aHash, same two-32-bit-half hamming convention. "
    "Strict integer comparisons, so the oracle states every bit in "
    "closed form)",
)
def llm_multimodal_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual difference-hash of every synthesized image through the
    REAL byte pipeline (PPM encode → header parse → 9×8 nearest
    resample); the flattened gv index walks the same row-major (y, x)
    order as the numpy array, one extra column per row feeding the
    horizontal comparison, so all 64 gradient bits line up with the
    oracle.

    Scale shape: one Arrow-batched mapInPandas pass, no shuffle; dedup
    consumers group on (dhash_hi, dhash_lo) — a digest-sized exchange.
    Pairing with llm_multimodal_ahash gives the standard two-hash vote
    (aHash = luminance profile, dHash = gradient profile)."""
    return multimodal.synth_ppm_dhash(load(spark, sf_dir, "documents"))


@query(
    "llm_audio_segment_features",
    oracle="""
    WITH p AS (
        SELECT doc_id,
               (1 + n_chars % 2) * (100 + n_chars % 400) AS n
        FROM documents
    ), samp AS (
        SELECT doc_id, n, i,
               CAST((i * 4) // n AS INT) AS seg,
               CASE WHEN ((i * 62) % 256) + 256 * ((i * 62 + 31) % 256)
                         >= 32768
                    THEN ((i * 62) % 256) + 256 * ((i * 62 + 31) % 256)
                         - 65536
                    ELSE ((i * 62) % 256) + 256 * ((i * 62 + 31) % 256)
               END AS s
        FROM p, unnest(range(0, n)) AS t(i)
    ), lagged AS (
        SELECT doc_id, seg, s, i,
               LAG(s) OVER (PARTITION BY doc_id ORDER BY i) AS s_prev,
               LAG(seg) OVER (PARTITION BY doc_id ORDER BY i) AS seg_prev
        FROM samp
    )
    SELECT doc_id, seg,
           CAST(COUNT(*) AS INT) AS n_in_seg,
           CAST(SUM(s * s) AS BIGINT) AS sum_sq,
           CAST(SUM(CASE WHEN seg_prev = seg AND s_prev * s < 0
                         THEN 1 ELSE 0 END) AS INT) AS zero_crossings,
           CAST(MAX(ABS(s)) AS INT) AS peak
    FROM lagged
    GROUP BY doc_id, seg
    """,
    ref="SURVEY §2 K127 [EXT] (audio feature extraction through the REAL "
    "WAV byte path: the K5 RIFF round-trip clip split into 4 equal "
    "segments by the floor mapping, per segment the exact-integer energy "
    "Σs², zero-crossing count and peak |s| — the RMS/ZCR first-stage "
    "features of every speech/music pipeline; sample i is the pure "
    "function int16(le16(62i mod 256, (62i+31) mod 256)) so the oracle "
    "states every feature exactly)",
)
def llm_audio_segment_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment RMS energy / zero-crossing rate / peak over genuine
    WAV bytes: the builder writes and re-reads each clip with stdlib
    `wave` and takes an int16 view of the recovered frames; the oracle
    re-derives every interleaved sample from its index formula and walks
    the same (i-1, i) pairs for crossings (segment-interior only, both
    ends mapped to the same segment by the identical floor expression).

    Scale shape: one Arrow-batched mapInPandas pass emitting 4 rows per
    doc; no shuffle."""
    return multimodal.synth_wav_segment_features(
        load(spark, sf_dir, "documents"), n_seg=4
    )


@query(
    "llm_multimodal_motion",
    oracle="""
    WITH p AS (
        SELECT doc_id,
               8 + n_chars % 8 AS w,
               8 + (n_chars * 3) % 8 AS h,
               4 + n_chars % 5 AS nf
        FROM documents
    )
    SELECT doc_id,
           CAST(f AS INT) AS from_frame,
           CAST(31 * w * h + 194 * list_sum(flatten(
               list_transform(range(0, h), y ->
                   list_transform(range(0, w), x ->
                       CASE WHEN (7 * x + 11 * y + 31 * f) % 256 >= 225
                            THEN 1 ELSE 0 END)))) AS BIGINT) AS motion_energy
    FROM p, unnest(range(0, nf - 1)) AS t(f)
    """,
    ref="SURVEY §2 K128 [EXT] (video motion energy through the REAL Y4M "
    "byte path: sum of absolute luma differences between consecutive "
    "decoded frames — the standard shot-boundary/motion signal; the +31 "
    "mod 256 frame progression makes each pixel's |diff| 31 or 225 "
    "(wrap), so motion(f) = 31wh + 194·#wraps and the oracle states it "
    "in closed form)",
)
def llm_multimodal_motion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-to-frame motion energy over genuine Y4M container bytes:
    the builder decodes the actual FRAME-marker stream and diffs
    consecutive int64-cast luma planes; the oracle counts the mod-256
    wrap pixels per transition. Completes the per-modality feature trio
    (image dHash / audio RMS-ZCR / video motion).

    Scale shape: one Arrow-batched mapInPandas pass emitting nf-1 rows
    per doc; no shuffle."""
    return multimodal.synth_y4m_motion_energy(load(spark, sf_dir, "documents"))


def _Q6(c):
    """Scalar 1e-6 quantization, house spelling (trunc-toward-zero of
    x*1e6+0.5 — identical in Spark's double->long cast and DuckDB's
    CAST(trunc(...) AS BIGINT))."""
    return (c * F.lit(1000000.0) + F.lit(0.5)).cast("long") / F.lit(1000000.0)


@query(
    "llm_audio_autocorr",
    oracle="""
    WITH p AS (
        SELECT doc_id,
               (1 + n_chars % 2) * (100 + n_chars % 400) AS n
        FROM documents
    ), samp AS (
        SELECT doc_id, n, i,
               CASE WHEN ((i * 62) % 256) + 256 * ((i * 62 + 31) % 256)
                         >= 32768
                    THEN ((i * 62) % 256) + 256 * ((i * 62 + 31) % 256)
                         - 65536
                    ELSE ((i * 62) % 256) + 256 * ((i * 62 + 31) % 256)
               END AS s
        FROM p, unnest(range(0, n)) AS t(i)
    ), led AS (
        SELECT doc_id, n, s,
               LEAD(s, 1) OVER w AS s1, LEAD(s, 2) OVER w AS s2,
               LEAD(s, 4) OVER w AS s4, LEAD(s, 8) OVER w AS s8
        FROM samp
        WINDOW w AS (PARTITION BY doc_id ORDER BY i)
    ), sums AS (
        SELECT doc_id, CAST(MAX(n) AS INT) AS n_samples,
               CAST(SUM(s * s) AS BIGINT) AS energy,
               CAST(COALESCE(SUM(s * s1), 0) AS BIGINT) AS ac1,
               CAST(COALESCE(SUM(s * s2), 0) AS BIGINT) AS ac2,
               CAST(COALESCE(SUM(s * s4), 0) AS BIGINT) AS ac4,
               CAST(COALESCE(SUM(s * s8), 0) AS BIGINT) AS ac8
        FROM led GROUP BY doc_id
    ), ratio AS (
        SELECT doc_id, n_samples, energy,
               CAST(trunc((CAST(ac1 AS DOUBLE) / energy) * 1000000 + 0.5)
                    AS BIGINT) / 1000000.0 AS rho1,
               CAST(trunc((CAST(ac2 AS DOUBLE) / energy) * 1000000 + 0.5)
                    AS BIGINT) / 1000000.0 AS rho2,
               CAST(trunc((CAST(ac4 AS DOUBLE) / energy) * 1000000 + 0.5)
                    AS BIGINT) / 1000000.0 AS rho4,
               CAST(trunc((CAST(ac8 AS DOUBLE) / energy) * 1000000 + 0.5)
                    AS BIGINT) / 1000000.0 AS rho8
        FROM sums
    )
    SELECT doc_id, n_samples, energy, rho1, rho2, rho4, rho8,
           CAST(CASE WHEN rho1 >= rho2 AND rho1 >= rho4 AND rho1 >= rho8
                     THEN 1
                WHEN rho2 >= rho4 AND rho2 >= rho8 THEN 2
                WHEN rho4 >= rho8 THEN 4
                ELSE 8 END AS BIGINT) AS best_lag
    FROM ratio
    """,
    ref="SURVEY §2 K142 [EXT] (ACF periodicity through the REAL WAV byte "
    "path: the K5/K127 RIFF round-trip clip's exact-integer "
    "autocorrelation ladder r_l = sum s_i*s_{i+l} at lags {1,2,4,8} "
    "normalized by energy, dominant lag by smallest-lag-wins maxima — "
    "the pitch/periodicity first stage next to K127's RMS/ZCR; sample "
    "i is the pure function int16(le16(62i mod 256, (62i+31) mod 256)) "
    "so the oracle states every product exactly)",
)
def llm_audio_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-clip autocorrelation ladder over genuine WAV bytes: the
    builder writes and re-reads each synthesized clip with stdlib
    `wave`, takes an int16 view, and computes the exact-integer lag
    products (zero floating point until the final normalized ratios,
    which are 1e-6-quantized in both engines). best_lag is the
    smallest lag attaining the maximal normalized ACF — the
    dominant-periodicity readout of a pitch tracker's first stage.

    Scale shape: one Arrow-batched mapInPandas pass emitting one row
    per doc; no shuffle; the ratio/argmax arithmetic is per-row."""
    raw = multimodal.synth_wav_autocorr(load(spark, sf_dir, "documents"))
    e = F.col("energy").cast("double")
    rho = {
        lag: _Q6(F.col(f"ac{lag}").cast("double") / e) for lag in (1, 2, 4, 8)
    }
    best = (
        F.when(
            (rho[1] >= rho[2]) & (rho[1] >= rho[4]) & (rho[1] >= rho[8]),
            F.lit(1).cast("bigint"),
        )
        .when((rho[2] >= rho[4]) & (rho[2] >= rho[8]), F.lit(2).cast("bigint"))
        .when(rho[4] >= rho[8], F.lit(4).cast("bigint"))
        .otherwise(F.lit(8).cast("bigint"))
    )
    return raw.select(
        "doc_id",
        "n_samples",
        "energy",
        rho[1].alias("rho1"),
        rho[2].alias("rho2"),
        rho[4].alias("rho4"),
        rho[8].alias("rho8"),
        best.alias("best_lag"),
    )


_MRL_DIMS = (8, 16, 32, 64)
_MRL_SAMPLE = 256

_MRL_DOT = """
list_reduce(
    list_prepend(CAST(0.0 AS DOUBLE),
        list_transform(range(1, {d} + 1),
            i -> CAST(a.emb[i] AS DOUBLE) * CAST(b.emb[i] AS DOUBLE))),
    (acc, p) -> acc + p)"""

_MRL_NRM = """
sqrt(list_reduce(
    list_prepend(CAST(0.0 AS DOUBLE),
        list_transform(range(1, {d} + 1),
            i -> CAST({s}.emb[i] AS DOUBLE) * CAST({s}.emb[i] AS DOUBLE))),
    (acc, p) -> acc + p))"""


def _mrl_cos(d) -> str:
    dot = _MRL_DOT.format(d=d)
    na = _MRL_NRM.format(d=d, s="a")
    nb = _MRL_NRM.format(d=d, s="b")
    return (
        f"CAST(trunc((CASE WHEN {na} > 0 AND {nb} > 0 THEN ({dot}) / ({na} * {nb}) END)"
        " * 1000000 + 0.5) AS BIGINT) / 1000000.0"
    )


@query(
    "llm_emb_matryoshka_eval",
    oracle=f"""
    WITH samp AS (
        SELECT vec_id, embedding AS emb
        FROM embeddings
        ORDER BY (((vec_id % 2147483648) * 2654435761) % 4294967296) ASC,
                 vec_id ASC
        LIMIT {_MRL_SAMPLE}
    ),
    pairs AS (
        SELECT {_mrl_cos(8)} AS c8, {_mrl_cos(16)} AS c16,
               {_mrl_cos(32)} AS c32, {_mrl_cos(64)} AS c64
        FROM samp a JOIN samp b ON a.vec_id < b.vec_id
    ),
    long AS (
        SELECT d, cd, c64 FROM pairs,
        LATERAL (VALUES (CAST(8 AS BIGINT), c8), (16, c16),
                        (32, c32), (64, c64)) AS t(d, cd)
        WHERE cd IS NOT NULL AND c64 IS NOT NULL
    ),
    mom AS (
        SELECT d, CAST(COUNT(*) AS BIGINT) AS n_pairs,
               {sql_dsum('cd')} AS sx, {sql_dsum('cd * cd')} AS sx2,
               {sql_dsum('c64')} AS sy, {sql_dsum('c64 * c64')} AS sy2,
               {sql_dsum('cd * c64')} AS sxy,
               {sql_dsum('abs(cd - c64)')} AS sae
        FROM long GROUP BY d
    )
    SELECT d AS dims, n_pairs,
           CAST(trunc(((n_pairs * sxy - sx * sy)
                / NULLIF(sqrt((n_pairs * sx2 - sx * sx)
                              * (n_pairs * sy2 - sy * sy)), 0))
               * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS corr_vs_full,
           CAST(trunc((sae / n_pairs) * 1000000 + 0.5) AS BIGINT)
               / 1000000.0 AS mae_vs_full
    FROM mom
    """,
    ref="SURVEY §2 K144 [EXT] (matryoshka truncation quality, Kusupati et "
    "al. 2022 'Matryoshka Representation Learning': pairwise-cosine "
    "fidelity of the d-dim PREFIX of the embedding vs the full vector "
    "over a deterministic Knuth-hash 256-vector sample — Pearson "
    "similarity-preservation and MAE per d in {{8,16,32,64}}; the "
    "'how small can the ANN index vectors be?' decision, measured; "
    "sample via TakeOrdered, pair space bounded at 32,640, zero-norm "
    "prefixes NULL out identically in both engines)",
)
def llm_emb_matryoshka_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Can this corpus's embeddings be truncated? For each prefix length d,
    compare d-dim cosine against full-dim cosine over all pairs of a
    bounded deterministic sample: corr_vs_full near 1 at d=16 means the
    ANN index (K3) can store quarter-size vectors — the
    matryoshka-representation readout that halves-or-better similarity
    infra cost when it holds (the d=64 row is the self-check: corr 1,
    MAE 0).

    Scale shape: the sample is a 256-row TakeOrderedAndProject on the
    Knuth hash (no global sort, deterministic across partitionings); the
    pair space is sample-bounded (32,640 rows) regardless of corpus
    size; per-pair cosines ride the exact HOF folds and 1e-6
    quantization, so the correlation moments agree bitwise."""
    hash_col = (
        ((F.col("vec_id") % F.lit(2147483648)) * F.lit(2654435761))
        % F.lit(4294967296)
    )
    e = load(spark, sf_dir, "embeddings")
    # r14 (guide §1.2 per-task work): the prefix slice+cast and its L2 norm
    # depend on ONE side only, but sat inside the pair projection — each of
    # the 256 sample rows re-sliced and re-normed once per PAIR (127x
    # redundancy: 2 slices + 2 norm folds x 4 dims per pair, 32,640 pairs).
    # They now project once per sample row INSIDE the pin; the pair stage
    # computes only the dot folds. Bit-identical: same slice/cast/fold
    # expressions over the same values, evaluated earlier (dot()'s internal
    # re-cast is a no-op on the pre-cast double arrays), and the cosine
    # combines the same three doubles as before.
    samp = (
        e.select("vec_id", F.col("embedding").alias("emb"))
        .orderBy(hash_col.asc(), F.col("vec_id").asc())
        .limit(_MRL_SAMPLE)
        .select(
            "vec_id",
            *[
                F.slice(F.col("emb"), 1, d)
                .cast("array<double>")
                .alias(f"e{d}")
                for d in _MRL_DIMS
            ],
        )
        .select(
            "vec_id",
            *[F.col(f"e{d}") for d in _MRL_DIMS],
            *[
                vectors.l2_norm(F.col(f"e{d}")).alias(f"n{d}")
                for d in _MRL_DIMS
            ],
        )
        .transform(scale_pin, eager=False)
    )
    a = samp.alias("a")
    b = samp.alias("b")

    def cos_d(d: int):
        na = F.col(f"a.n{d}")
        nb = F.col(f"b.n{d}")
        return _Q6(
            F.when(
                (na > 0) & (nb > 0),
                vectors.dot(F.col(f"a.e{d}"), F.col(f"b.e{d}")) / (na * nb),
            )
        )

    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id")).select(
        *[cos_d(d).alias(f"c{d}") for d in _MRL_DIMS]
    )
    long = (
        pairs.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(d).cast("bigint").alias("d"),
                            F.col(f"c{d}").alias("cd"),
                            F.col("c64").alias("c64"),
                        )
                        for d in _MRL_DIMS
                    ]
                )
            ).alias("r")
        )
        .select("r.d", "r.cd", "r.c64")
        .where(F.col("cd").isNotNull() & F.col("c64").isNotNull())
    )
    cd, c64 = F.col("cd"), F.col("c64")
    mom = long.groupBy("d").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        dsum(cd).alias("sx"),
        dsum(cd * cd).alias("sx2"),
        dsum(c64).alias("sy"),
        dsum(c64 * c64).alias("sy2"),
        dsum(cd * c64).alias("sxy"),
        dsum(F.abs(cd - c64)).alias("sae"),
    )
    n, sx, sx2, sy, sy2, sxy = (
        F.col("n_pairs"), F.col("sx"), F.col("sx2"),
        F.col("sy"), F.col("sy2"), F.col("sxy"),
    )
    corr = F.try_divide(
        n * sxy - sx * sy,
        F.nullif(F.sqrt((n * sx2 - sx * sx) * (n * sy2 - sy * sy)), F.lit(0.0)),
    )
    return mom.select(
        F.col("d").alias("dims"),
        "n_pairs",
        _Q6(corr).alias("corr_vs_full"),
        _Q6(F.col("sae") / n).alias("mae_vs_full"),
    )


_HIER_COARSE_CELL = 1024  # coarse K = clamp(n/1024, 2, 4096)
_HIER_PER_CELL_SAMPLE = 512  # bounded per-cell reservoir for the sub-fits
_HIER_SUB_MAX = 64  # sub-codebook K2 = clamp(cell_n/256, 1, 64)


@query(
    "llm_semantic_dedup_hier",
    oracle=None,  # MLlib coarse fit + numpy sub-fits → rows-only; laws below
    ref="SURVEY §2 K39 sibling [EXT] (the TWO-LEVEL codebook the K-cap "
    "boundary note names: coarse KMeans cells (broadcast-sized), then an "
    "independent deterministic Lloyd sub-fit PER CELL over a bounded "
    "per-cell reservoir via applyInPandas — effective K = K_coarse*K2 "
    "grows past the flat entry's 4096 cap while every broadcast stays "
    "coarse-sized and every pandas group stays <= 512 rows; drop "
    "decision byte-shared with both twins (_semantic_dedup_decide))",
)
def llm_semantic_dedup_hier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with the hierarchical production codebook — the scale
    device `llm_semantic_dedup_scaled` documents for corpora past its
    K<=4096 linearity boundary (~1M vectors at cell 256), wired:

    1. coarse stage: K_c = clamp(n/1024, 2, 4096) MLlib KMeans centroids
       from the bounded deterministic reservoir (identical machinery to
       the scaled entry), broadcast argmin assignment;
    2. sub stage: per coarse cell, a deterministic numpy Lloyd fit
       (init = first K2 sample vectors by vec_id, 10 iterations,
       first-min ties) over a <= 512-row per-cell Knuth-hash reservoir —
       the fits are DISJOINT, so applyInPandas runs them in parallel
       with bounded group memory at any corpus size;
    3. sub assignment joins each vector against ONLY its cell's K2
       centroids (equi-join on coarse_id — never a global broadcast of
       the K_c*K2 codebook), cent_id = coarse*100000 + sub;
    4. the byte-shared _semantic_dedup_decide pair stage — pair space
       Σ n_k² over the FINE cells, linear in n at fixed fine-cell size
       with no 4096 ceiling.

    Laws (tests/test_llm_quality.py): precision 1.0 vs global-exact
    dedup (cluster blocking only restricts comparisons), recall >= 0.5,
    schema identical to both twins, full-corpus coverage, and
    partitioning-independence of the sub-fits (groups sort by vec_id
    before fitting)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    SAMPLE_CAP = 4096
    e = load(spark, sf_dir, "embeddings")
    n = e.count()  # parquet metadata count — no data scan
    kc = int(max(2, min(4096, n // _HIER_COARSE_CELL)))
    cache_key = ("semdedup_hier", sf_dir, _emb_fingerprint(sf_dir), kc)
    cent_rows = _CENTROID_CACHE.get(cache_key)
    if cent_rows is None:
        sample = (
            _reservoir_sample(e.select("vec_id", "embedding"), SAMPLE_CAP)
            .where(F.col("embedding").isNotNull())
            .coalesce(1)
            .sortWithinPartitions("vec_id")
            .select(
                array_to_vector(F.col("embedding").cast("array<double>")).alias("vec")
            )
            .cache()
        )
        k = min(kc, max(1, sample.count()))
        model = KMeans(k=k, seed=42, maxIter=20, featuresCol="vec").fit(sample)
        sample.unpersist()
        cent_rows = [
            (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
        ]
        _CENTROID_CACHE[cache_key] = cent_rows
    cents = spark.createDataFrame(cent_rows, "coarse_id int, cent_emb array<double>")
    w = Window.partitionBy("vec_id").orderBy(F.col("cd").asc(), F.col("coarse_id"))
    coarse = scale_pin(
        e.crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            "embedding",
            "coarse_id",
            vectors.l2_sq_dist("embedding", "cent_emb").alias("cd"),
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "vec_id",
            "embedding",
            "coarse_id",
            F.count(F.lit(1))
            .over(Window.partitionBy("coarse_id"))
            .cast("long")
            .alias("cell_n"),
        ),
        eager=False,
    )
    hash_col = (
        ((F.col("vec_id") % F.lit(2147483648)) * F.lit(2654435761))
        % F.lit(4294967296)
    )
    ws = Window.partitionBy("coarse_id").orderBy(
        hash_col.asc(), F.col("vec_id").asc()
    )
    samp = (
        coarse.where(F.col("embedding").isNotNull())
        .withColumn("srn", F.row_number().over(ws))
        .where(F.col("srn") <= _HIER_PER_CELL_SAMPLE)
        .select("coarse_id", "cell_n", "vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    )

    def fit_cell(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("vec_id")  # partitioning-independent input order
        X = np.array(pdf["emb"].tolist(), dtype=np.float64)
        k2 = int(max(1, min(_HIER_SUB_MAX, int(pdf["cell_n"].iloc[0]) // _SEMDEDUP_CELL)))
        k2 = min(k2, len(pdf))
        C = X[:k2].copy()  # deterministic init: first k2 sample rows by vec_id
        for _ in range(10):
            d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)  # numpy argmin: first minimum — ties stable
            for j in range(k2):
                pts = X[a == j]
                if len(pts):
                    C[j] = pts.mean(axis=0)
        return pd.DataFrame(
            {
                "coarse_id": [int(pdf["coarse_id"].iloc[0])] * k2,
                "sub_id": list(range(k2)),
                "sub_emb": [[float(x) for x in c] for c in C],
            }
        )

    subs = scale_pin(
        samp.groupBy("coarse_id").applyInPandas(
            fit_cell, "coarse_id int, sub_id int, sub_emb array<double>"
        ),
        eager=False,
    )
    wv = Window.partitionBy("vec_id").orderBy(F.col("sd").asc(), F.col("sub_id"))
    m = scale_pin(
        coarse.join(subs, "coarse_id")
        .select(
            "vec_id",
            "embedding",
            "coarse_id",
            "sub_id",
            vectors.l2_sq_dist(
                F.col("embedding").cast("array<double>"), "sub_emb"
            ).alias("sd"),
        )
        .withColumn("rn", F.row_number().over(wv))
        .where(F.col("rn") == 1)
        .select(
            "vec_id",
            "embedding",
            (F.col("coarse_id").cast("long") * F.lit(100000) + F.col("sub_id"))
            .alias("cent_id"),
        ),
        eager=False,
    )
    return _semantic_dedup_decide(m)


@query(
    "llm_pipeline_e2e_hier",
    oracle=None,  # two-level KMeans SemDeDup stage ≠ SQL-expressible → rows-only
    ref="SURVEY §2 K28 production posture past the K-cap boundary (VERDICT "
    "r10 item 3: llm_pipeline_e2e_scaled composes the flat K<=4096 "
    "codebook whose linearity ends ~1M vectors; this sibling is the "
    "corpus-size switch target — the SAME quality gate -> exact dedup -> "
    "weighted select -> fixed-centroid shard layout, with "
    "llm_semantic_dedup_hier (coarse cells + per-cell sub-codebooks, "
    "effective K = K_c*K2) as the semantic stage. Identity law pinned in "
    "tests/test_llm_quality.py: on the fixture, survivors == exact-"
    "pipeline survivors minus the HIER SemDeDup drops, per-row metrics "
    "and (cent_id, medoid_id) anchors byte-equal to the exact twin's)",
    tags=("rows_only_by_design",),
)
def llm_pipeline_e2e_hier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-shard selection on the production path for
    corpora PAST the flat codebook's ~1M-vector linearity boundary: the
    semantic-dedup stage is the two-level hierarchical codebook
    (`llm_semantic_dedup_hier`) instead of the flat K ∝ n one. Every other
    stage — and its scale shape — is byte-shared with
    `llm_pipeline_e2e_scaled` via `_pipeline_e2e_production`: the only
    corpus-wide exchanges are the dedup agg + join-back, the embedding
    join, and the hier pair stage (linear in n at fixed fine-cell size,
    no 4096 ceiling); fits stay bounded (coarse reservoir <= 4096 rows,
    per-cell sub-fits <= 512 rows, disjoint + parallel)."""
    return _pipeline_e2e_production(spark, sf_dir, llm_semantic_dedup_hier)


#: Flat-codebook linearity boundary (SCALE.md): llm_semantic_dedup_scaled's
#: K ∝ n codebook caps at K = 4096, past which per-cell occupancy — and the
#: within-cell pair stage — grows with n again. Measured crossover ~1M
#: vectors; above it the two-level hier codebook keeps the pair stage linear.
_E2E_HIER_BOUNDARY = 1_000_000


def _emb_count_meta(sf_dir: str) -> int:
    """Embedding-corpus row count from parquet FOOTERS only (pyarrow
    metadata read — zero Spark jobs, zero data pages; the class-(c)
    metadata-only action). Same local-FS seam caveat as _emb_fingerprint:
    on a remote FS this is the one helper to swap for a listing call."""
    import os

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.isdir(path):
        files = sorted(
            os.path.join(root, n)
            for root, _, names in os.walk(path)
            for n in names
            if n.endswith(".parquet")
        )
    else:
        files = [path]
    return sum(pq.read_metadata(f).num_rows for f in files)


@query(
    "llm_pipeline_e2e_auto",
    oracle=None,  # routes to a KMeans-staged sibling → rows-only; laws below
    ref="SURVEY §2 K28 production posture — the corpus-size DISPATCHER "
    "(VERDICT r10 item 3 second half, registered r12): the flat-vs-hier "
    "switch rule (flat K<=4096 below ~1M vectors, two-level hier past "
    "it) as CODE instead of prose. The corpus count comes from parquet "
    "footers only (pyarrow metadata — no Spark job, no data pages), and "
    "the entry returns the routed twin's DataFrame unchanged, so the "
    "identity law is exact by construction: tests/test_wave12.py pins "
    "row-equality with llm_pipeline_e2e_scaled on the (sub-boundary) "
    "fixture AND with llm_pipeline_e2e_hier when the boundary is forced "
    "under the fixture size)",
    tags=("rows_only_by_design",),
)
def llm_pipeline_e2e_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-shard selection with the corpus-size switch
    applied automatically: below _E2E_HIER_BOUNDARY (~1M vectors, the
    measured flat-codebook linearity boundary) the semantic-dedup stage
    is llm_semantic_dedup_scaled; at or past it, llm_semantic_dedup_hier.
    Both twins emit the same schema through the byte-shared decide stage,
    so the composed pipeline — and its scale shape — is identical either
    way; the only new work is one footer-metadata count at build time."""
    n = _emb_count_meta(sf_dir)
    sem = (
        llm_semantic_dedup_scaled
        if n < _E2E_HIER_BOUNDARY
        else llm_semantic_dedup_hier
    )
    return _pipeline_e2e_production(spark, sf_dir, sem)


# ---------------------------------------------------------------------------
# K146 — paragraph-level dedup surgery (round 11, CCNet granularity)
# ---------------------------------------------------------------------------


@query(
    "llm_paragraph_dedup",
    oracle="""
    WITH paras AS (
        SELECT doc_id, CAST(i AS INT) AS pos, p[i] AS para,
               md5(lower(trim(regexp_replace(p[i], '\\s+', ' ', 'g'))))
                   AS pkey
        FROM (SELECT doc_id, string_split(text, chr(10)) AS p
              FROM documents WHERE text IS NOT NULL),
             unnest(range(1, len(p) + 1)) AS t(i)
        WHERE trim(p[i]) <> ''
    ),
    canon AS (
        SELECT pkey, min({'d': doc_id, 'p': pos}) AS c
        FROM paras GROUP BY pkey
    ),
    kept AS (
        SELECT paras.doc_id, paras.pos, paras.para,
               (paras.doc_id = c['d'] AND paras.pos = c['p']) AS keep
        FROM paras JOIN canon USING (pkey)
    )
    SELECT d.doc_id,
           CAST(COALESCE(s.n_paras, 0) AS BIGINT) AS n_paras,
           CAST(COALESCE(s.n_removed, 0) AS BIGINT) AS n_removed,
           CAST(COALESCE(s.chars_removed, 0) AS BIGINT) AS chars_removed,
           COALESCE(k.text_clean, '') AS text_clean
    FROM documents d
    LEFT JOIN (SELECT doc_id, COUNT(*) AS n_paras,
                      SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS n_removed,
                      SUM(CASE WHEN keep THEN 0 ELSE len(para) END)
                          AS chars_removed
               FROM kept GROUP BY doc_id) s USING (doc_id)
    LEFT JOIN (SELECT doc_id, string_agg(para, chr(10) ORDER BY pos)
                   AS text_clean
               FROM kept WHERE keep GROUP BY doc_id) k USING (doc_id)
    """,
    ref="SURVEY §2 K146 [EXT] (CCNet-granularity paragraph dedup surgery "
    "(Wenzek et al. 2020): normalize each newline-split paragraph "
    "(lower/trim/space-collapse), keep only the global canonical "
    "occurrence per normalized key — lexicographic-min (doc, pos), the "
    "K71 canon device — and reassemble; the granularity BETWEEN K1's "
    "whole-doc sha dedup and K38/K71's 8-token substring surgery, and "
    "the one CCNet actually ships for web text)",
)
def llm_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-deduplicated corpus: paragraphs (newline-split; the driver
    fixture is single-line, so each live doc is one paragraph — the
    multi-paragraph surgery is pinned by planted fixtures in
    tests/test_wave11.py) are keyed by md5 of their lower/trim/space-
    collapsed normalization; every occurrence except the global
    lexicographic-min (doc_id, pos) canonical is removed, including
    WITHIN-document repeats; whitespace-only paragraphs drop as
    structure, not content. Returns every document (NULL-text docs
    included, with empty text_clean — the ADVICE-r10 full-corpus
    contract) with paragraph/removal/char accounting.

    Scale shape: exchanges carry 32-char md5 keys + (doc,pos) pairs,
    never paragraph text, except the kept-paragraph join-back which is
    doc-keyed; the canonical pick is a min-STRUCT hash agg (never a
    per-key window — the K71 posture, so a boilerplate paragraph with
    millions of occurrences partial-aggregates map-side); the rebuild
    is a doc-scoped sort_array(collect_list), bounded by doc length."""
    d = load(spark, sf_dir, "documents")
    paras = (
        d.where(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.posexplode(F.split("text", "\n")).alias("pos0", "para"),
        )
        .where(F.trim(F.col("para")) != "")
        .select(
            "doc_id",
            (F.col("pos0") + 1).alias("pos"),
            "para",
            F.md5(
                F.lower(
                    F.trim(F.regexp_replace("para", "\\s+", " "))
                ).cast("binary")
            ).alias("pkey"),
        )
    )
    canon = paras.groupBy("pkey").agg(
        F.min(
            F.struct(F.col("doc_id").alias("d"), F.col("pos").alias("p"))
        ).alias("c")
    )
    kept = paras.join(canon, "pkey").select(
        "doc_id",
        "pos",
        "para",
        (
            (F.col("doc_id") == F.col("c.d")) & (F.col("pos") == F.col("c.p"))
        ).alias("keep"),
    )
    stats = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_paras"),
        F.sum(F.when(F.col("keep"), 0).otherwise(1))
        .cast("bigint")
        .alias("n_removed"),
        F.sum(F.when(F.col("keep"), 0).otherwise(F.length("para")))
        .cast("bigint")
        .alias("chars_removed"),
    )
    clean = (
        kept.where("keep")
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "para"))),
                    lambda x: x["para"],
                ),
            ).alias("text_clean")
        )
    )
    return (
        d.select("doc_id")
        .join(stats, "doc_id", "left")
        .join(clean, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_paras", F.lit(0)).cast("bigint").alias("n_paras"),
            F.coalesce("n_removed", F.lit(0))
            .cast("bigint")
            .alias("n_removed"),
            F.coalesce("chars_removed", F.lit(0))
            .cast("bigint")
            .alias("chars_removed"),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        )
    )


# ---------------------------------------------------------------------------
# K147 — C4 line-level filter surgery (round 11)
# ---------------------------------------------------------------------------

_C4_MIN_WORDS_PER_LINE = 5
_C4_MIN_KEPT_LINES = 3


@query(
    "llm_line_rules_c4",
    oracle=f"""
    WITH lines AS (
        SELECT doc_id, CAST(i AS INT) AS pos, l[i] AS line,
               len(list_filter(string_split(l[i], ' '), w -> w <> ''))
                   AS n_words,
               right(trim(l[i]), 1) IN ('.', '!', '?', '"') AS terminal,
               contains(lower(l[i]), 'javascript') AS has_js
        FROM (SELECT doc_id, string_split(text, chr(10)) AS l
              FROM documents WHERE text IS NOT NULL),
             unnest(range(1, len(l) + 1)) AS t(i)
    ),
    judged AS (
        SELECT doc_id, pos, line,
               n_words >= {_C4_MIN_WORDS_PER_LINE}
               AND terminal AND NOT has_js AS keep
        FROM lines
    ),
    per_doc AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_kept_lines
        FROM judged GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(p.n_lines, 0) AS BIGINT) AS n_lines,
           CAST(COALESCE(p.n_kept_lines, 0) AS BIGINT) AS n_kept_lines,
           COALESCE(k.text_clean, '') AS text_clean,
           COALESCE(p.n_kept_lines, 0) >= {_C4_MIN_KEPT_LINES}
           AND NOT contains(lower(COALESCE(d.text, '')), 'lorem ipsum')
           AND NOT contains(COALESCE(d.text, ''), '{{') AS doc_keep
    FROM documents d
    LEFT JOIN per_doc p USING (doc_id)
    LEFT JOIN (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos)
                   AS text_clean
               FROM judged WHERE keep GROUP BY doc_id) k USING (doc_id)
    """,
    ref="SURVEY §2 K147 [EXT] (C4 line-level cleaning rules (Raffel et "
    "al. 2020 §2.2): keep only lines ending in terminal punctuation "
    "with >= 5 words and no 'javascript' artifact; pages keep only with "
    ">= 3 surviving lines and neither 'lorem ipsum' nor a curly brace — "
    "the LINE-granularity surgery beside K44's doc-level Gopher flags "
    "(Gopher JUDGES documents; C4 REWRITES them line by line))",
)
def llm_line_rules_c4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-cleaned corpus: each newline-split line survives iff it ends in
    terminal punctuation ('.', '!', '?', '\"'), carries >= 5 whitespace
    words, and doesn't mention 'javascript' (case-folded); the document
    survives iff >= 3 lines remain and the RAW text contains neither
    'lorem ipsum' nor '{'. Returns every document (NULL text included —
    full-corpus contract) with line accounting, the cleaned text, and
    the page-level keep flag. The punctuation-free driver fixture
    legitimately keeps nothing — planted probes in tests/test_wave11.py
    prove each rule fires (the K136 planted-drill discipline).

    Scale shape: entirely per-document HOF/string arithmetic — the line
    explode is doc-bounded and feeds one doc-keyed agg pair; no corpus
    exchange carries anything but (doc_id, line) during the rebuild, and
    a flags-only variant (drop text_clean) is a zero-shuffle scan."""
    d = load(spark, sf_dir, "documents")
    lines = (
        d.where(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.posexplode(F.split("text", "\n")).alias("pos0", "line"),
        )
        .select(
            "doc_id",
            (F.col("pos0") + 1).alias("pos"),
            "line",
            F.size(
                F.filter(F.split("line", " "), lambda w: w != "")
            ).alias("n_words"),
            F.substring(F.trim(F.col("line")), -1, 1)
            .isin(".", "!", "?", '"')
            .alias("terminal"),
            F.lower(F.col("line")).contains("javascript").alias("has_js"),
        )
    )
    judged = lines.select(
        "doc_id",
        "pos",
        "line",
        (
            (F.col("n_words") >= _C4_MIN_WORDS_PER_LINE)
            & F.col("terminal")
            & ~F.col("has_js")
        ).alias("keep"),
    )
    per_doc = judged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum(F.col("keep").cast("int")).cast("bigint").alias("n_kept_lines"),
    )
    clean = (
        judged.where("keep")
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda x: x["line"],
                ),
            ).alias("text_clean")
        )
    )
    raw = F.coalesce(F.col("text"), F.lit(""))
    return (
        d.select("doc_id", "text")
        .join(per_doc, "doc_id", "left")
        .join(clean, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_lines", F.lit(0)).cast("bigint").alias("n_lines"),
            F.coalesce("n_kept_lines", F.lit(0))
            .cast("bigint")
            .alias("n_kept_lines"),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            (
                (F.coalesce("n_kept_lines", F.lit(0)) >= _C4_MIN_KEPT_LINES)
                & ~F.lower(raw).contains("lorem ipsum")
                & ~raw.contains("{")
            ).alias("doc_keep"),
        )
    )


# ---------------------------------------------------------------------------
# K148 — winnowing fingerprints (round 11, MOSS)
# ---------------------------------------------------------------------------

_WINNOW_K = 3  # words per gram
_WINNOW_W = 4  # gram hashes per window
_WINNOW_DF_CAP = 64  # fingerprints in more docs than this are stopgrams


def _winnow_fingerprints(d: DataFrame) -> DataFrame:
    """Winnowing fingerprint stage, exposed for direct testing: per doc the
    distinct w-window minima over the k-gram hash sequence (docs with
    1..w-1 grams keep their single global minimum — the short-doc fallback
    can never clear the >= 2 shared-fingerprint pair floor on its own, so
    tests exercise THIS stage to prove the branch)."""
    grams = d.select(
        "doc_id", text.shingles("text", _WINNOW_K).alias("gs")
    ).select(
        "doc_id",
        F.transform(
            F.col("gs"),
            lambda g: F.conv(
                F.substring(F.md5(g.cast("binary")), 1, 8), 16, 10
            ).cast("long"),
        ).alias("hs"),
    )
    n = F.size(F.col("hs"))
    mins = F.when(
        n >= _WINNOW_W,
        F.transform(
            F.sequence(F.lit(1), n - (_WINNOW_W - 1)),
            lambda i: F.array_min(F.slice(F.col("hs"), i, _WINNOW_W)),
        ),
    ).otherwise(
        F.when(n >= 1, F.array(F.array_min(F.col("hs")))).otherwise(
            F.array().cast("array<long>")
        )
    )
    return grams.select(
        "doc_id", F.explode(F.array_distinct(mins)).alias("h")
    )



def _winnow_oracle(docs_cte: str) -> str:
    """DuckDB winnowing-pair oracle over an arbitrary (doc_id, text) CTE
    body — shared by the raw K148 entry and its exact-collapsed
    production sibling so the fingerprint/pair spelling can never drift
    between the two."""
    return f"""
    WITH docs AS ({docs_cte}),
    toks AS (
        -- \\s+ regexp split + empty-drop == the Spark side's words(): the two
        -- engines agree on multi-space/tab/newline corpora, not just the
        -- single-space fixture convention (ADVICE r11).
        SELECT doc_id,
               list_filter(regexp_split_to_array(text, '\\s+'),
                           w -> w <> '') AS w
        FROM docs
    ),
    g AS (
        SELECT doc_id, CAST(i AS INT) AS pos,
               ('0x' || substr(md5(array_to_string(
                    w[i:i+{_WINNOW_K - 1}], ' ')), 1, 8))::BIGINT AS h
        FROM toks, unnest(range(1, len(w) - {_WINNOW_K - 2})) AS t(i)
        WHERE len(w) >= {_WINNOW_K}
    ),
    m AS (SELECT doc_id, COUNT(*) AS n_grams FROM g GROUP BY doc_id),
    wins AS (
        SELECT doc_id, CAST(k AS INT) AS k
        FROM m, unnest(range(1, n_grams - {_WINNOW_W - 2})) AS t(k)
        WHERE n_grams >= {_WINNOW_W}
    ),
    fps AS (
        SELECT DISTINCT doc_id, h FROM (
            SELECT w.doc_id, MIN(g.h) AS h
            FROM wins w JOIN g ON g.doc_id = w.doc_id
                 AND g.pos BETWEEN w.k AND w.k + {_WINNOW_W - 1}
            GROUP BY w.doc_id, w.k
            UNION ALL
            SELECT g.doc_id, MIN(g.h) AS h
            FROM g JOIN m ON g.doc_id = m.doc_id
            WHERE m.n_grams < {_WINNOW_W}
            GROUP BY g.doc_id
        )
    ),
    live AS (
        SELECT h FROM fps GROUP BY h
        HAVING COUNT(*) BETWEEN 2 AND {_WINNOW_DF_CAP}
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_fps FROM fps GROUP BY doc_id)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared,
           CAST(trunc(COUNT(*) * 1.0 / least(sa.n_fps, sb.n_fps)
                * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS overlap
    FROM fps a JOIN live USING (h)
    JOIN fps b ON a.h = b.h AND a.doc_id < b.doc_id
    JOIN sizes sa ON sa.doc_id = a.doc_id
    JOIN sizes sb ON sb.doc_id = b.doc_id
    GROUP BY a.doc_id, b.doc_id, sa.n_fps, sb.n_fps
    HAVING COUNT(*) >= 2
    """


@query(
    "llm_winnowing_pairs",
    oracle=_winnow_oracle(
        "SELECT doc_id, text FROM documents WHERE text IS NOT NULL"
    ),
    ref="SURVEY §2 K148 [EXT] (winnowing fingerprint candidate pairs "
    "(Schleimer, Wilkerson & Aiken 2003 — the MOSS algorithm): per doc, "
    "the distinct minima of every w=4 window over the k=3-word-gram "
    "hash sequence; the selection GUARANTEE is that any shared run of "
    ">= w+k-1 = 6 words yields a shared fingerprint, with expected "
    "density 2/(w+1) — position-selective where K31's MinHash is "
    "set-global; fingerprints in > 64 docs are dropped as stopgrams, "
    "MOSS's own over-common-match rule)",
)
def llm_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing candidate duplicate pairs: each document keeps the
    distinct window-minimum gram hashes (w=4 windows over md5-slice
    hashes of k=3-word shingles; docs with 1..3 grams keep their single
    global minimum so short docs still fingerprint), pairs sharing >= 2
    live fingerprints report the count and the overlap coefficient
    n_shared / min(|fps_a|, |fps_b|).

    Scale shape: the per-doc hash sequence and its window minima are
    doc-bounded HOF arithmetic (one narrow pass, ~2/(w+1) of grams
    survive, so exchanges carry ~40%% of the gram count as 8-byte
    hashes); the pair stage joins per-fingerprint doc lists with the
    2..64 document-frequency band (the MOSS stopgram rule) bounding any
    hot key's fan-out at 64², exactly the K38 duplicated-gram posture.

    Determinism: hashes are the house portable md5-slice bigints
    (Spark conv(hex,16,10) == DuckDB '0x'::BIGINT), minima/counts exact
    integers, the overlap coefficient 1e-6-quantized.

    This is the RAW posture — its measured worst case is a duplicate-
    heavy corpus, where verbatim-replica cliques pair 45x/clique under
    the 64-df cap (36.2 s at sf1 on the 10x-replica probe). Production
    runs llm_winnowing_pairs_collapsed (exact-collapse FIRST — the r10
    llm_dedup_cluster lesson)."""
    d = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    return _winnow_pairs_from(d)


def _winnow_pairs_from(d: DataFrame) -> DataFrame:
    """Fingerprint + band + pair stage shared by the raw and collapsed
    winnowing entries (input: a (doc_id, text) frame, text non-null)."""
    fps = _winnow_fingerprints(d)
    live = (
        fps.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(
            (F.col("df") >= 2) & (F.col("df") <= _WINNOW_DF_CAP)
        )
        .select("h")
    )
    sizes = fps.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fps"))
    a = fps.join(live, "h")
    b = fps.select(F.col("h"), F.col("doc_id").alias("doc_b"))
    pairs = (
        a.join(b, (a["h"] == b["h"]) & (a["doc_id"] < b["doc_b"]))
        .groupBy(a["doc_id"].alias("doc_a"), "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .where(F.col("n_shared") >= 2)
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_fps").alias("na")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n_fps").alias("nb")
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            (
                (
                    F.col("n_shared").cast("double")
                    / F.least("na", "nb").cast("double")
                    * 1000000
                    + F.lit(0.5)
                )
                .cast("long")
                .cast("double")
                / 1000000.0
            ).alias("overlap"),
        )
    )


@query(
    "llm_winnowing_pairs_collapsed",
    oracle=_winnow_oracle(
        "SELECT MIN(doc_id) AS doc_id, text FROM documents"
        " WHERE text IS NOT NULL GROUP BY text"
    ),
    ref="SURVEY §2 K148 [EXT] (the PRODUCTION posture of winnowing: exact "
    "dedup collapses verbatim replicas to their min-doc_id representative "
    "BEFORE fingerprinting — the Lee et al. 2022 exact-before-near "
    "ordering, same composition the r10 llm_dedup_cluster fix shipped. "
    "Raw winnowing's measured worst case is the duplicate-heavy corpus "
    "every real crawl is: a d-deep replica clique pairs d(d-1)/2 times "
    "under the 64-df cap (45x/clique on the sf1 10x-replica probe) and "
    "a clique deeper than 64 silently saturates the stopgram band; "
    "collapsed, the clique contributes ONE representative and its pairs "
    "carry to every copy through the K1 sha map)",
)
def llm_winnowing_pairs_collapsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint pairs over exact-dedup representatives:
    identical texts collapse to min-doc_id (sha-256 digest-only
    exchange, text never shuffles in the collapse), and only
    representatives enter the fingerprint/band/pair stage. Output
    schema is identical to llm_winnowing_pairs; doc ids are
    representative ids (expand with the K1 sha map when copy-level
    pairs are needed — every copy pairs exactly as its rep does).

    Equivalence law (pinned in tests/test_wave12.py): on a corpus with
    no exact duplicates the output is ROW-IDENTICAL to the raw entry;
    on replica corpora the intra-clique pair blow-up is gone (a d-deep
    clique emits 0 within-clique pairs instead of d(d-1)/2, and its
    fingerprints count ONCE into the 2..64 document-frequency band, so
    deep cliques no longer saturate the stopgram cap).

    Scale shape: one sha-256 hash-agg (map-side combined, digests only)
    + a doc_id semi-join to pull representative text, then exactly the
    raw entry's stages — doc-bounded HOF fingerprints, the 2..64 df
    band, 64²-bounded pair fan-out. The collapse makes the pair stage's
    input the DISTINCT corpus, which at crawl scale is the difference
    between 45x-replicated cliques and none."""
    d = load(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    reps = (
        d.select("doc_id", F.sha2(F.col("text"), 256).alias("text_sha"))
        .groupBy("text_sha")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return _winnow_pairs_from(d.join(reps, "doc_id", "semi"))
