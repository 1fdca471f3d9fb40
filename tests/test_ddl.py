"""SURVEY §2 A11 (CREATE TABLE DDL) + A13 (DML).

The reference declares advisory-typed tables (ksql.js:130-135) and never uses
row DML; Spark SQL gives real typed DDL + INSERT on catalog tables. UPDATE/
DELETE need a v2 writable format (e.g. Delta) — documented out of scope
(SURVEY §2 A13), asserted here as the expected failure mode.
"""

from __future__ import annotations

import pytest


@pytest.fixture()
def warehouse_table(spark, tmp_path):
    name = "ddl_demo"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(
        f"CREATE TABLE {name} (id BIGINT, label STRING, score DOUBLE) "
        f"USING PARQUET LOCATION '{tmp_path}/ddl_demo'"
    )
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_create_insert_select(spark, warehouse_table):
    t = warehouse_table
    spark.sql(f"INSERT INTO {t} VALUES (1, 'a', 0.5), (2, 'b', 1.5)")
    spark.sql(f"INSERT INTO {t} SELECT 3, 'c', 2.5")
    rows = sorted(tuple(r) for r in spark.sql(f"SELECT * FROM {t}").collect())
    assert rows == [(1, "a", 0.5), (2, "b", 1.5), (3, "c", 2.5)]


def test_insert_overwrite(spark, warehouse_table):
    t = warehouse_table
    spark.sql(f"INSERT INTO {t} VALUES (1, 'a', 0.5)")
    spark.sql(f"INSERT OVERWRITE TABLE {t} VALUES (9, 'z', 9.9)")
    rows = [tuple(r) for r in spark.sql(f"SELECT * FROM {t}").collect()]
    assert rows == [(9, "z", 9.9)]


def test_update_needs_v2_format(spark, warehouse_table):
    # row-level UPDATE on a v1 parquet table is unsupported — the documented
    # A13 boundary (snapshot model; Delta would lift it)
    with pytest.raises(Exception):
        spark.sql(f"UPDATE {warehouse_table} SET score = 0 WHERE id = 1")
