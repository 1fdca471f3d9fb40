"""Invariant tests for the corpus-curation operators (queries/curation.py)
and the ranged_cumsum scale primitive (operators/scale.py). The exact-value
gate is the DuckDB oracle (driver_sim); these pin the semantic invariants an
oracle refactor could silently lose.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ksql_spark.operators.scale import ranged_cumsum
from ksql_spark.registry import all_specs

SPECS = all_specs()
SF_DIR = "/root/testdata/sf0.001"


def test_ranged_cumsum_matches_serial_truth(spark):
    """The two-pass distributed cumsum must equal the single-partition prefix
    sum for an arbitrary (desc, tiebreak) total order with duplicate keys."""
    rows = [(i % 7, i, (i * 37) % 11 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "grp int, id int, v long")
    got = {
        r["id"]: r["c"]
        for r in ranged_cumsum(
            df, [F.col("grp").desc(), F.col("id")], "v", out_col="c", n_parts=8
        ).collect()
    }
    serial = sorted(rows, key=lambda r: (-r[0], r[1]))
    acc = 0
    for grp, i, v in serial:
        acc += v
        assert got[i] == acc, f"id={i}: {got[i]} != {acc}"


def test_curriculum_buckets_partition_corpus(spark):
    df = SPECS["llm_curriculum"].builder(spark, SF_DIR)
    rows = {r["bucket"]: r for r in df.collect()}
    assert set(rows) <= {0, 1, 2, 3} and len(rows) >= 2
    n_docs = SPECS["llm_quality_score"].builder(spark, SF_DIR).count()
    assert sum(r["n_docs"] for r in rows.values()) == n_docs
    # average quality strictly ordered across occupied buckets
    avgs = [rows[b]["avg_quality"] for b in sorted(rows)]
    assert all(a < b for a, b in zip(avgs, avgs[1:]))


def test_token_budget_is_greedy_prefix(spark):
    from ksql_spark.queries.curation import TOKEN_BUDGET

    rows = SPECS["llm_token_budget"].builder(spark, SF_DIR).collect()
    sel = [r for r in rows if r["selected"]]
    assert sel, "budget selects at least one doc"
    # every selected doc started within budget; every rejected one did not
    for r in rows:
        started_within = r["cum_tokens"] - r["n_tokens"] < TOKEN_BUDGET
        assert r["selected"] == started_within
    # cum_tokens is a permutation-consistent running total
    assert max(r["cum_tokens"] for r in rows) == sum(r["n_tokens"] for r in rows)


def test_token_budget_no_single_partition_exchange(spark):
    plan = (
        SPECS["llm_token_budget"]
        .builder(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan
    assert "Window" in plan  # per-partition cumsum window survives


def test_dedup_prefix_one_canonical_per_group(spark):
    df = SPECS["llm_dedup_prefix"].builder(spark, SF_DIR)
    agg = df.groupBy("group_size").agg(
        F.count("*").alias("n"),
        F.sum(F.col("is_canonical").cast("int")).alias("canon"),
    )
    for r in agg.collect():
        # each group of size s contributes s rows and exactly 1 canonical
        assert r["canon"] * r["group_size"] == r["n"]


def test_vocab_topk_ordering(spark):
    rows = SPECS["llm_vocab_topk"].builder(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 200
    counts = [r["cnt"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(r["word"] for r in rows)  # no empty tokens


def test_winsorize_clips_to_percentiles(spark):
    rows = SPECS["llm_winsorize"].builder(spark, SF_DIR).collect()
    lo = min(r["n_chars_winsorized"] for r in rows)
    hi = max(r["n_chars_winsorized"] for r in rows)
    for r in rows:
        assert lo <= r["n_chars_winsorized"] <= hi
        if lo < r["n_chars"] < hi:
            assert r["n_chars_winsorized"] == float(r["n_chars"])
    # something actually got clipped on a 100+ doc corpus
    assert any(r["n_chars_winsorized"] != float(r["n_chars"]) for r in rows)


def test_pipeline_cli_writes_manifest(spark, tmp_path):
    """The CLI drives llm_pipeline_e2e end-to-end and writes a readable
    manifest with the contract schema."""
    out = str(tmp_path / "manifest")
    from ksql_spark import pipeline

    rc = pipeline.main(["--sf-dir", SF_DIR, "--out", out])
    assert rc == 0
    got = spark.read.parquet(out)
    assert set(got.columns) == {"doc_id", "n_tokens", "quality", "emb_norm"}
    assert got.count() > 0


def test_ranged_cummax_excl_matches_serial_truth(spark):
    """The two-pass exclusive running max must equal the serial strict-prior
    max for an arbitrary order with duplicates, NULL for the first row, and
    correct carry across empty-prefix partitions."""
    from ksql_spark.operators.scale import ranged_cummax_excl

    vals = [5, 3, 8, 8, 1, 9, 2, 9, 7, 0, 4, 6] * 20
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id int, v long")
    got = {
        r["id"]: r["m"]
        for r in ranged_cummax_excl(
            df, ["id"], "v", out_col="m", n_parts=7
        ).collect()
    }
    best = None
    for i, v in rows:
        assert got[i] == best, f"id={i}: {got[i]} != {best}"
        best = v if best is None or v > best else best


def test_ranged_cumsum_decimal_column(spark):
    """ADVICE r9: the offsets column must carry SUM's own output type — a
    DecimalType value column used to be forced into LONG, making `running`
    a Python Decimal that createDataFrame's LongType verifier rejects."""
    import decimal

    rows = [(i, decimal.Decimal(f"{(i * 13) % 97}.{i % 100:02d}")) for i in range(200)]
    df = spark.createDataFrame(rows, "id int, v decimal(10,2)")
    got = {
        r["id"]: r["c"]
        for r in ranged_cumsum(df, ["id"], "v", out_col="c", n_parts=6).collect()
    }
    acc = decimal.Decimal(0)
    for i, v in rows:
        acc += v
        assert got[i] == acc, f"id={i}: {got[i]} != {acc}"


def test_pin_invariant_skips_already_pinned_and_is_lazy(spark):
    """ADVICE r9: iterative consumers must not re-checkpoint an input the
    caller already pinned, and merely CONSTRUCTING the consumer's DataFrame
    must not run a Spark job (the pin is lazy)."""
    from ksql_spark.operators.scale import is_pinned, pin, pin_invariant

    df = spark.range(10).withColumnRenamed("id", "s1")
    pinned = pin(df)
    assert is_pinned(pinned)
    assert pin_invariant(pinned) is pinned  # no second checkpoint
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    lazy = pin_invariant(df.withColumn("s2", F.col("s1") + 1))
    after = set(tracker.getJobIdsForGroup(None) or [])
    assert before == after, "constructing a lazy pin must not trigger a job"
    assert lazy.count() == 10  # first consuming job materializes it
