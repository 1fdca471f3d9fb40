"""Physical-layout writers (SURVEY §2 K18 / F7 — the write side).

The query entries `llm_shard_assign` and `sort_zorder_locality` COMPUTE a
layout (shard ids, z-order zone maps); these operators actually WRITE it and
are what a 100 TB pipeline ships:

  * write_sharded    — deterministic Knuth-hash shard assignment →
                       `partitionBy("shard_id")` hive layout. One shuffle
                       keyed on the shard; each reducer streams one shard
                       directory. Reading a shard back is partition pruning.
  * write_zordered   — Morton/Z-order clustering: quantize two dims, bit-
                       interleave, `repartitionByRange(zkey)` +
                       `sortWithinPartitions(zkey)` → each output file spans
                       a narrow range of BOTH dims, so min/max footer stats
                       skip ~(1 - 1/2^bits_per_file) of files on either
                       predicate (the Delta/Iceberg Z-ORDER effect with
                       plain parquet + stats pruning).

Both are deterministic pure functions of the input rows (hash sharding; exact
integer z-keys), so a re-write after failure converges to the same layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: Knuth multiplicative hash constants — same spelling as llm_shard_assign's
#: oracle, so the written layout matches the audited assignment bit-for-bit.
_KNUTH = 2654435761
_M32 = 4294967296
_M31 = 2147483648


def shard_expr(key_col: str, n_shards: int):
    """Portable shard id: ((key mod 2^31) * Knuth) mod 2^32 mod n_shards.

    Sign contract: % is sign-preserving in both Spark and DuckDB, so a
    NEGATIVE key maps to a negative shard id (its own directory). Keys are
    expected non-negative (all driver ids are); offset signed keys before
    sharding. Kept sign-preserving so the written layout matches the
    llm_shard_assign audit oracle bit-for-bit."""
    return (
        ((F.col(key_col) % F.lit(_M31)) * F.lit(_KNUTH)) % F.lit(_M32)
        % F.lit(n_shards)
    ).cast("long")


def write_sharded(
    df: DataFrame, path: str, key_col: str = "doc_id", n_shards: int = 16
) -> None:
    """Write `df` as a hive-partitioned training-shard layout:
    path/shard_id=0..n_shards-1/part-*.parquet.

    Plan: one narrow projection adds shard_id, one shuffle
    (repartition on shard_id) co-locates each shard on one reducer, and
    partitionBy writes one directory per shard. At 100 TB raise the
    repartition width to a multiple of n_shards (several files per shard)
    so a shard is not capped at one writer task; the layout contract
    (hash → directory) is unchanged."""
    (
        df.withColumn("shard_id", shard_expr(key_col, n_shards))
        .repartition(n_shards, "shard_id")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(path)
    )


def _interleave(x: str, y: str, bits: int) -> str:
    terms = []
    for k in range(bits):
        terms.append(
            f"shiftleft(shiftright({x}, {k}) & 1, {2 * k})"
            f" + shiftleft(shiftright({y}, {k}) & 1, {2 * k + 1})"
        )
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    dim_x: str,
    dim_y: str,
    n_files: int = 64,
    bits: int = 12,
) -> None:
    """Write `df` re-clustered on the Morton interleave of two INTEGER
    columns (quantized to `bits` bits each against their exact global
    min/max — a 1-row broadcast, no second scan pattern at scale).

    repartitionByRange on the z-key gives each of the `n_files` output
    files a contiguous z-range; because a contiguous z-range fixes the
    high bits of BOTH dimensions, every file's footer min/max spans a
    narrow slice of each dim — the property tests/test_layout.py asserts
    by reading the written footers and counting how many files a
    single-dim predicate can skip. sortWithinPartitions keeps row groups
    inside a file equally tight (page/row-group stats).

    Internal column names (_zq/_zr/_z and the bounds fields) would
    collide with same-named input columns; inputs are expected free of
    the underscore-prefixed names below (the engine's internal-column
    convention throughout)."""
    bounds = df.agg(
        F.min(dim_x).cast("long").alias("_zx_min"),
        (F.max(dim_x) - F.min(dim_x) + 1).cast("long").alias("_zx_span"),
        F.min(dim_y).cast("long").alias("_zy_min"),
        (F.max(dim_y) - F.min(dim_y) + 1).cast("long").alias("_zy_span"),
    )
    scale = 1 << bits
    q = df.crossJoin(F.broadcast(bounds)).withColumn(
        "_zq",
        F.expr(
            f"CAST(({dim_x} - _zx_min) * {scale}.0 / _zx_span AS BIGINT)"
        ),
    ).withColumn(
        "_zr",
        F.expr(
            f"CAST(({dim_y} - _zy_min) * {scale}.0 / _zy_span AS BIGINT)"
        ),
    ).withColumn("_z", F.expr(_interleave("_zq", "_zr", bits)))
    (
        q.drop("_zx_min", "_zx_span", "_zy_min", "_zy_span", "_zq", "_zr")
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
