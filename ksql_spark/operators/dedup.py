"""Deduplication operators for LLM data pipelines (SURVEY.md §2.K K1/K2 [EXT]).

Strategies, cheapest first:
  * exact_dedup           — sha2 grouping (one shuffle on the hash)
  * ngram_jaccard_pairs   — exact Jaccard over k-word shingles for a bounded
                            candidate set (oracle-checkable)
  * minhash_near_dups     — MinHash + LSH banding: candidates meet only if a
                            band collides → O(n·bands) shuffle, no O(n²) blowup;
                            the 100 TB path (banding ≈ Broder's scheme)
  * simhash               — 32-bit sign-aggregated fingerprint; near-dups share
                            buckets (optionally with rotations for hamming<k)

Hash source is xxhash64 (stable across Spark runs/versions by contract), so
signatures are deterministic but engine-specific → these ops use rows-only
verification (the driver's weaker gate) except the exact/Jaccard forms.

Published basis (public knowledge): MinHash resemblance sketches and banding —
Broder, "On the resemblance and containment of documents" (1997); LSH framing —
Indyk & Motwani (1998); SimHash — Charikar, "Similarity estimation techniques
from rounding algorithms" (2002), applied to web-scale dedup in Manku et al.
(WWW 2007). See also PAPERS.md (compressed-index string similarity, ICDE 2022).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ksql_spark.operators.text import let, words


def exact_dedup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One row per distinct text: representative id (min), copy count, hash."""
    return (
        df.groupBy(F.sha2(F.col(text_col), 256).alias("text_sha"))
        .agg(
            F.min(id_col).alias("rep_id"),
            F.count("*").alias("n_copies"),
        )
    )


def minhash_signature(text_col, k: int = 16) -> Column:
    """MinHash signature (array<long>, length k) over distinct words.

    Hash family = xxhash64 seeded by the permutation index (hashing the tuple
    (word, i)) — independent hashes with no modular arithmetic, so ANSI-mode
    long math cannot overflow. Signature element i = min over the doc's words.

    The distinct-word array is let-bound (text.let) so tokenization runs once
    per row: placed directly inside the outer lambda it would re-split and
    re-distinct the document for every one of the k permutations.
    """
    return let(
        F.array_distinct(words(text_col)),
        lambda w: F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda i: F.array_min(F.transform(w, lambda x: F.xxhash64(x, i))),
        ),
    )


def minhash_near_dups(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 40,
    bands: int = 4,
    jaccard_threshold: float = 0.6,
    max_bucket_size: int = 200,
    reps: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs via LSH banding, verified by exact Jaccard.

    Plan shape (scale-critical): signature (narrow map) → explode to `bands`
    rows/doc → shuffle on (band, band_hash) via a self-join → candidate pairs
    only where a band collides → exact Jaccard on candidates. Never materializes
    the n² pair space.

    Tuning: rows-per-band = k/bands sets the collision sharpness
    (P(band) = j^rows). The default 10 rows/band keeps random-pair candidates
    rare even on corpora with high baseline similarity while catching j>=0.9
    near-dups with P ≈ 1-(1-j^10)^bands. `max_bucket_size` is the degenerate-
    bucket safety valve (docs/SCALE.md): a bucket holding >cap docs (e.g. one
    boilerplate string repeated across the corpus) would alone create cap²
    candidate pairs, so it is skipped; exact-dedup (cheaper) catches those.

    Exchange discipline (the 100 TB invariant, plan-gated in
    tests/test_plans.py::test_minhash_band_exchange_carries_no_text): the
    band exchange carries ONLY (doc_id, band, band_hash) — 24 bytes/row ×
    bands rows/doc — never the document text or the signature array. The
    distinct-word arrays needed for exact-Jaccard verification are joined
    back onto the (tiny) candidate-pair set afterwards, so the corpus text
    crosses no shuffle boundary at any point.

    `reps` (optional, a DataFrame with one `doc_id` column): restrict the
    PAIR SPACE to these ids — the exact-collapse posture. Identical texts
    produce identical signatures, so running LSH on one representative per
    distinct text loses nothing while turning a d-deep exact-dup group's
    d² within-bucket pairs into zero (the representative meets only OTHER
    texts). The restriction is a semi-join on the 24-byte banded rows, so
    the text-free exchange discipline is preserved; verification joins are
    unchanged (candidates only ever name rep ids).
    """
    if k % bands != 0:
        raise ValueError(
            f"k ({k}) must be divisible by bands ({bands}); a remainder would "
            "silently drop the trailing signature elements and degrade recall"
        )
    rows = k // bands
    sig = F.col("__sig")
    banded = df.select(
        F.col(id_col).alias("doc_id"),
        minhash_signature(text_col, k).alias("__sig"),
    ).select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(sig, b * rows + 1, rows),
                            lambda v: v.cast("string"),
                        ),
                    )
                ),
            )
        ).alias("band", "band_hash"),
    )
    if reps is not None:
        banded = banded.join(reps.select("doc_id"), "doc_id", "left_semi")
    # LAZY pin: the banded table feeds the bucket-size aggregate, the
    # size-filter join, and BOTH sides of the candidate self-join — un-pinned,
    # the full signature pipeline (tokenize + k hashes per word per doc) is
    # re-executed up to 4x in one plan (ReusedExchange cannot cover the agg
    # branch). The pinned table is the 24-byte/row banded form, bands
    # rows/doc — exactly the exchange-discipline payload, never the text.
    from ksql_spark.operators.scale import pin as _pin

    banded = _pin(banded, eager=False)
    bucket_sizes = banded.groupBy("band", "band_hash").agg(
        F.count("*").alias("bucket_n")
    )
    banded = banded.join(
        bucket_sizes.where(F.col("bucket_n") <= max_bucket_size).drop("bucket_n"),
        ["band", "band_hash"],
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # Join the distinct-word arrays back onto the candidate pairs — same
    # tokenizer as the signature side (operators.text.words): candidate
    # generation and verification must never tokenize differently. The
    # candidate set is small (LSH collisions only), so it is pinned once and
    # broadcast into a semi-join that restricts the corpus scan to candidate
    # docs BEFORE tokenizing: the previous shape tokenized every corpus row
    # twice (once per side) because the word projection sat below the join.
    # Inner equi-joins are unchanged by pre-filtering the docs side to ids
    # that appear in cand, so the output is identical.
    cand = _pin(cand, eager=False)
    cand_ids = (
        cand.select(F.col("doc_a").alias("__wid"))
        .unionByName(cand.select(F.col("doc_b").alias("__wid")))
        .distinct()
    )
    docs = _pin(
        df.select(F.col(id_col).alias("__wid"), F.col(text_col).alias("__t"))
        .join(F.broadcast(cand_ids), "__wid", "left_semi")
        .select("__wid", F.array_distinct(words(F.col("__t"))).alias("__w")),
        eager=False,
    )
    cand = (
        cand.join(
            docs.select(F.col("__wid"), F.col("__w").alias("words_a")),
            F.col("doc_a") == F.col("__wid"),
        )
        .drop("__wid")
        .join(
            docs.select(F.col("__wid"), F.col("__w").alias("words_b")),
            F.col("doc_b") == F.col("__wid"),
        )
        .drop("__wid")
    )
    inter = F.size(F.array_intersect(F.col("words_a"), F.col("words_b")))
    union = F.size("words_a") + F.size("words_b") - inter
    # try_divide: two EMPTY docs band-collide (all-null signatures hash
    # equal) and reach verification with union = 0 — under ANSI a plain
    # division would abort the job. NULL jaccard fails the threshold filter,
    # which is right: identical empties belong to exact dedup, not near-dup.
    return (
        cand.withColumn(
            "jaccard", F.try_divide(inter.cast("double"), union.cast("double"))
        )
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash32(text_col) -> Column:
    """32-bit SimHash: per-word xxhash64 → per-bit +/-1 votes folded across the
    document → sign vector recombined into a long. Pure HOF math, JVM-side.

    The fold runs over the per-word HASHES (one xxhash64 per word, computed
    in a prior transform) rather than the words: `getbit(xxhash64(word), j)`
    inside the bit lambda re-hashed the word for each of the 32 bits. Same
    hash per word, so the vote vector — and the fingerprint — is unchanged."""
    hashes = F.transform(
        F.array_distinct(words(text_col)), lambda word: F.xxhash64(word)
    )
    bit_votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), 32),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(31)),
                lambda j: F.when(
                    F.getbit(h, j) == 1, F.lit(1).cast("long")
                ).otherwise(F.lit(-1).cast("long")),
            ),
            lambda a, b: a + b,
        ),
    )
    return F.aggregate(
        F.zip_with(
            bit_votes,
            F.sequence(F.lit(0), F.lit(31)),
            lambda vote, j: F.when(
                vote > 0, F.pow(F.lit(2.0), j).cast("long")
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def minhash_near_dups_portable(
    df,
    text_col: str,
    id_col: str,
    n_hash: int = 8,
    rows_per_band: int = 2,
    jaccard_threshold: float = 0.5,
):
    """Engine-portable MinHash-LSH near-dup pairs (md5-hex-string min
    signatures; lexicographic min is identical in any engine, unlike
    xxhash64 in minhash_near_dups). Returns (doc_a, doc_b, jaccard) with
    jaccard computed exactly on distinct 3-gram sets and gated at
    `jaccard_threshold`.

    Same banding math as the xxhash path: n_hash signatures, bands of
    rows_per_band, candidates = ids sharing any band hash. ~3x slower per
    shingle than xxhash64 — use for cross-engine parity, audits, and
    oracle checks; the xxhash path for production throughput."""
    from pyspark.sql import functions as F

    from ksql_spark.operators import text as text_ops

    if n_hash % rows_per_band != 0:
        raise ValueError(f"n_hash={n_hash} not divisible by rows_per_band={rows_per_band}")
    grams_col = F.array_distinct(text_ops.shingles(text_col, 3))
    # Gate on the SAME tokenizer that builds the shingles (words(): \s+
    # split, empties dropped). A plain split-on-' ' count can pass a doc
    # whose multi-space/newline text yields <3 real words — its gram array
    # would be empty, array_min NULL, every band hash NULL, and the doc
    # silently excluded while a space-split oracle still emits grams.
    from ksql_spark.operators.scale import pin

    # LAZY pin (no job at plan-construction time): the gram arrays feed the
    # signature stage AND both sides of the Jaccard verify, and the
    # signature table feeds every band branch of the union below — without
    # the pin each of those branches re-derives the whole md5-signature
    # subtree (round-8 sf1 probe: 4 band branches × 8 signatures × |grams|
    # md5s = the entry ran 120 s; pinned 15 s, values identical).
    g = pin(
        df.where(F.size(text_ops.words(text_col)) >= 3)
        .select(F.col(id_col).alias("_id"), grams_col.alias("grams")),
        eager=False,
    )
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
    s = pin(g.select("_id", *sig_cols), eager=False)
    band_rows = [
        s.select(
            "_id",
            F.lit(b).alias("band_idx"),
            F.md5(
                F.concat(
                    *[F.col(f"s{rows_per_band * b + r}") for r in range(rows_per_band)]
                ).cast("binary")
            ).alias("bh"),
        )
        for b in range(n_hash // rows_per_band)
    ]
    bands = band_rows[0]
    for br in band_rows[1:]:
        bands = bands.unionAll(br)
    a, c = bands.alias("a"), bands.alias("c")
    cand = (
        a.join(
            c,
            (F.col("a.band_idx") == F.col("c.band_idx"))
            & (F.col("a.bh") == F.col("c.bh"))
            & (F.col("a._id") < F.col("c._id")),
        )
        .select(F.col("a._id").alias("doc_a"), F.col("c._id").alias("doc_b"))
        .distinct()
    )
    ga = g.select(F.col("_id").alias("da"), F.col("grams").alias("grams_a"))
    gb = g.select(F.col("_id").alias("db"), F.col("grams").alias("grams_b"))
    inter = F.size(F.array_intersect(F.col("grams_a"), F.col("grams_b")))
    union = F.size(F.col("grams_a")) + F.size(F.col("grams_b")) - inter
    jac = inter.cast("double") / union.cast("double")
    return (
        cand.join(ga, F.col("doc_a") == F.col("da"))
        .join(gb, F.col("doc_b") == F.col("db"))
        .where(jac >= jaccard_threshold)
        .select("doc_a", "doc_b", jac.alias("jaccard"))
    )
