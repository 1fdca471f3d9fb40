"""SURVEY §2 A10 (file sinks) + A7/A9 (stdout/empty markers are REPL-tested).

Round-trip: query result → parquet/csv/json → read back → identical rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_SMALL


def _result(spark):
    return (
        spark.read.parquet(f"{SF_SMALL}/nation.parquet")
        .select("n_nationkey", "n_name", "n_regionkey")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_parquet_roundtrip(spark, tmp_path):
    df = _result(spark)
    path = str(tmp_path / "out_parquet")
    df.write.mode("overwrite").parquet(path)
    assert _rows(spark.read.parquet(path)) == _rows(df)


def test_csv_roundtrip(spark, tmp_path):
    df = _result(spark)
    path = str(tmp_path / "out_csv")
    df.write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.option("header", True).schema(df.schema).csv(path)
    assert _rows(back) == _rows(df)


def test_json_roundtrip(spark, tmp_path):
    df = _result(spark)
    path = str(tmp_path / "out_json")
    df.write.mode("overwrite").json(path)
    back = spark.read.schema(df.schema).json(path)
    assert _rows(back) == _rows(df)
