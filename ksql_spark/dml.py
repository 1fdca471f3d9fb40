"""SURVEY §2 A13 — row-level UPDATE / DELETE via copy-on-write over parquet
catalog tables.

The reference never uses row DML (AlaSQL provides it [D]; unused in
ksql.js), and plain parquet is a v1 source — Spark's native `UPDATE`/`DELETE`
SQL needs a v2 ACID format (Delta/Iceberg). This module provides the
snapshot-model equivalent: read → transform → atomically swap, the same
copy-on-write shape those formats perform per file, done here at table
granularity.

Guarantees and limits (documented, tested):
  * atomic swap: the new snapshot is written to a side directory first, the
    table is repointed with ALTER TABLE SET LOCATION, then the old directory
    is dropped — readers see the old or the new snapshot, never a mix;
  * single-writer: no commit protocol arbitrates concurrent writers (that is
    exactly what Delta/Iceberg add); concurrent update_table calls can lose
    one writer's changes;
  * full-table rewrite: at 100 TB you partition the table and rewrite only
    affected partitions, or use a v2 format — this is the small-catalog /
    test-scale path, matching the reference's in-memory snapshot model.
"""

from __future__ import annotations

import shutil
import uuid
from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession, functions as F


def _table_location(spark: SparkSession, table: str) -> Path:
    desc = {
        r["col_name"]: r["data_type"]
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    }
    loc = desc.get("Location")
    if not loc:
        raise ValueError(f"table {table} has no filesystem location")
    return Path(loc.removeprefix("file:"))


def _swap_snapshot(spark: SparkSession, table: str, new_df: DataFrame) -> None:
    """Write new_df beside the current location, repoint, drop the old dir."""
    old = _table_location(spark, table)
    new = old.with_name(f"{old.name}__cow_{uuid.uuid4().hex[:8]}")
    new_df.write.mode("overwrite").parquet(str(new))
    spark.sql(f"ALTER TABLE {table} SET LOCATION '{new}'")
    spark.sql(f"REFRESH TABLE {table}")
    shutil.rmtree(old, ignore_errors=True)


def update_table(
    spark: SparkSession,
    table: str,
    assignments: dict[str, Column | str],
    where: Column | str | None = None,
) -> int:
    """UPDATE `table` SET col=expr[, ...] [WHERE cond] — copy-on-write.

    `assignments` maps column name → Column or SQL expression string; `where`
    bounds the affected rows (None = all). Returns the number of rows updated.
    """
    df = spark.table(table)
    cond = F.expr(where) if isinstance(where, str) else where
    if cond is None:
        cond = F.lit(True)
    n = df.where(cond).count()
    cols = []
    for name in df.columns:
        if name in assignments:
            expr = assignments[name]
            col = F.expr(expr) if isinstance(expr, str) else expr
            cols.append(F.when(cond, col).otherwise(F.col(name)).alias(name))
        else:
            cols.append(F.col(name))
    _swap_snapshot(spark, table, df.select(*cols))
    return n


def delete_from(
    spark: SparkSession, table: str, where: Column | str
) -> int:
    """DELETE FROM `table` WHERE cond — copy-on-write. Returns rows deleted."""
    df = spark.table(table)
    cond = F.expr(where) if isinstance(where, str) else where
    n = df.where(cond).count()
    _swap_snapshot(spark, table, df.where(~cond | cond.isNull()))
    return n
