"""Null / empty / degenerate-input totality for the pipeline operators.

The driver fixtures contain no NULLs, empty documents, or zero vectors, so
the oracle gate can never catch a crash on them — but a production corpus
has all three, and Spark 4's ANSI mode turns an unguarded division into a
job-aborting error (not a quiet NaN). These tests pin the defined semantics:
every text/vector helper is TOTAL over null/empty input.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ksql_spark.operators import dedup, text, vectors


@pytest.fixture(scope="module")
def degenerate_docs(spark):
    return spark.createDataFrame(
        [
            (1, None),
            (2, ""),
            (3, "   "),
            (4, "x"),
            (5, "a b c d"),
            (6, "a b c d"),
        ],
        "doc_id long, text string",
    )


def test_text_helpers_total_over_null_and_empty(spark, degenerate_docs):
    rows = degenerate_docs.select(
        "doc_id",
        text.word_count("text").alias("wc"),
        text.token_count("text").alias("tc"),
        text.unique_word_ratio("text").alias("uwr"),
        text.stopword_ratio("text").alias("swr"),
        text.quality_score("text").alias("q"),
        F.size(text.shingles("text", 3)).alias("nsh"),
        text.fingerprint("text").alias("fp"),
        text.lang_guess("text").alias("lg"),
        dedup.simhash32("text").alias("sim"),
    ).collect()
    by_id = {r.doc_id: r for r in rows}
    # NULL text: counts/hashes are NULL, ratios/score are a defined 0.0
    assert by_id[1].wc is None and by_id[1].fp is None
    assert by_id[1].q == 0.0 and by_id[1].uwr == 0.0 and by_id[1].swr == 0.0
    # empty / whitespace-only: everything 0, no DIVIDE_BY_ZERO abort
    for i in (2, 3):
        assert by_id[i].wc == 0 and by_id[i].q == 0.0 and by_id[i].nsh == 0
    # sub-k-word doc: empty shingle set, not a crash
    assert by_id[4].nsh == 0 and by_id[4].wc == 1
    assert by_id[5].q > 0.0 and by_id[5].lg in ("en", "unk")


def test_near_dup_pipeline_survives_empty_docs(spark, degenerate_docs):
    """Empty docs band-collide (all-null signatures) and reach jaccard
    verification with union=0 — must be dropped, not abort the job."""
    pairs = dedup.minhash_near_dups(
        degenerate_docs, "text", "doc_id", k=8, bands=2, jaccard_threshold=0.5
    ).collect()
    ids = {(r.doc_a, r.doc_b) for r in pairs}
    assert (2, 3) not in ids and (1, 2) not in ids  # empties never pair
    assert (5, 6) in ids  # identical real docs still found


def test_vector_helpers_total_over_null_empty_zero(spark):
    ev = spark.createDataFrame(
        [(1, None), (2, [3.0, 4.0]), (3, []), (4, [0.0, 0.0])],
        "vec_id long, e array<double>",
    )
    rows = ev.select(
        "vec_id",
        vectors.dot("e", "e").alias("d"),
        vectors.l2_norm("e").alias("n"),
        vectors.cosine("e", "e").alias("c"),
        vectors.normalize("e").alias("u"),
    ).collect()
    by_id = {r.vec_id: r for r in rows}
    assert by_id[1].d is None and by_id[1].n is None and by_id[1].c is None
    assert by_id[2].n == 5.0 and by_id[2].c == 1.0
    assert by_id[2].u == [0.6, 0.8]
    # zero-norm vectors: cosine/normalize are NULL, never an ANSI abort
    assert by_id[3].n == 0.0 and by_id[3].c is None
    assert by_id[4].c is None and by_id[4].u == [None, None]


def test_exact_dedup_groups_nulls_and_empties(spark, degenerate_docs):
    """Exact dedup: empty-string docs form a real cluster; NULL text maps to
    a NULL digest group (sha2(NULL) is NULL) rather than crashing."""
    groups = dedup.exact_dedup_groups(degenerate_docs, "text", "doc_id").collect()
    sizes = sorted(g.n_copies for g in groups)
    assert sum(sizes) == 6  # every row lands in exactly one group
    assert max(sizes) == 2  # the identical pair clusters


def test_ewma_fold_total_over_null_values(spark):
    """events_ewma_smooth's fold skips NULL values (collect_list drops
    them) and the normalizer tracks the same non-null count, so rows keep
    a consistent prefix; an all-NULL user yields NULL (try_divide — a
    plain `/` would DIVIDE_BY_ZERO-abort the whole job under Spark 4's
    default ANSI mode, which this test caught on the first version)."""
    from ksql_spark.registry import all_specs  # noqa: F401 (registration)
    from ksql_spark.queries.streaming_batch import events_ewma_smooth

    df = spark.createDataFrame(
        [
            (1, 10, "2024-01-01 00:00:00", 2.0),
            (2, 10, "2024-01-01 00:01:00", None),
            (3, 10, "2024-01-01 00:02:00", 4.0),
            (4, 20, "2024-01-01 00:00:00", None),
        ],
        "event_id long, user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        rows = {r.event_id: r for r in events_ewma_smooth(spark, d).collect()}
    # fold over the 2 non-null values: S = 2/2 + 4 = 5; W = 2 - 2^-1 = 1.5
    assert rows[3].decay_sum == 5.0
    assert abs(rows[3].ewma - 5.0 / 1.5) < 1e-12
    # all-NULL user: NULL (both fields), not an abort — and the oracle's
    # CASE len > 0 guard agrees
    assert rows[4].decay_sum is None and rows[4].ewma is None


def test_weighted_median_semantics_with_null_weights(spark):
    """D26 semantics pin: NULL weights contribute nothing to either the
    running or the total weight (SUM skips NULLs in both engines), so the
    weighted median over (v,w) pairs with NULL weights equals the median
    over the non-null subset — and a group whose weights are ALL NULL
    yields no output row (total NULL, comparison never true) rather than
    an abort."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    rows = spark.createDataFrame(
        [("A", 1.0, 1.0), ("A", 2.0, None), ("A", 3.0, 1.0),
         ("B", 9.0, None)],
        "g string, v double, wt double",
    )
    tot = rows.groupBy("g").agg(F.sum("wt").alias("total_w"))
    cw = Window.partitionBy("g").orderBy("v", "wt").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = rows.select("g", "v", F.sum("wt").over(cw).alias("cw"))
    got = (
        cum.join(tot, "g")
        .where(F.col("cw") >= F.col("total_w") / 2.0)
        .groupBy("g")
        .agg(F.min("v").alias("wm"))
        .collect()
    )
    by_g = {r.g: r.wm for r in got}
    assert by_g == {"A": 1.0}  # cum weight 1.0 >= 2.0/2 at v=1.0; B absent


def test_holt_winters_requires_full_first_season(spark):
    """K76 semantics pin: a series shorter than one season (7 days) is
    excluded — the recursion has no seasonal baseline to subtract; it
    must not emit a row with garbage init state."""
    from ksql_spark.queries.streaming_batch import events_holt_winters

    import pandas as pd
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        pd.DataFrame(
            {
                "event_id": range(3),
                "ts": pd.to_datetime(
                    ["2024-01-01", "2024-01-02", "2024-01-03"]
                ),
                "user_id": [1, 1, 1],
                "event_type": ["short"] * 3,
                "value": [1.0, 2.0, 3.0],
                "props": ["{}"] * 3,
            }
        ).to_parquet(os.path.join(d, "events.parquet"))
        out = events_holt_winters(spark, d).collect()
    assert out == []  # 3 days < one season -> no row, no abort
