"""Oracle-dtype pin at authoring time (VERDICT r10 item 5).

The driver's value-hash compare is dtype-sensitive for numeric columns: a
DuckDB typing-ladder literal that comes back DECIMAL while the Spark side is
DOUBLE (two r10 mid-round failures) is an err row even when every value
agrees. This sweep catches the class statically — Spark analyzed schema vs
DuckDB DESCRIBE — so the next dtype drift fails at `pytest` time, not inside
a driver window.

Neither engine executes: Spark only analyzes the plan, DuckDB only binds the
query. Whole sweep ~2 min over all oracle-backed entries at sf0.001.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools"))

from dtype_sweep import TABLES, duck_family, families_conflict, spark_family  # noqa: E402

from .conftest import full_tier  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@full_tier
def test_oracle_dtypes_match_spark_schema(spark, duck):
    from ksql_spark.registry import all_specs

    specs = all_specs()
    violations: dict[str, list] = {}
    for name, spec in specs.items():
        if not spec.oracle:
            continue
        sdf = spec.builder(spark, SF_DIR)
        stypes = {
            f.name: spark_family(f.dataType.simpleString())
            for f in sdf.schema.fields
        }
        dtypes = {
            r[0]: duck_family(r[1])
            for r in duck.execute(f"DESCRIBE {spec.oracle}").fetchall()
        }
        bad = [
            [col, stypes[col], dtypes[col]]
            for col in sorted(set(stypes) & set(dtypes))
            if families_conflict(stypes[col], dtypes[col])
        ]
        if set(stypes) != set(dtypes):
            bad.append(["<columns>", sorted(stypes), sorted(dtypes)])
        if bad:
            violations[name] = bad
    assert not violations, (
        f"{len(violations)} entries with Spark-vs-oracle dtype conflicts "
        f"(driver hash compare WILL flag these): {violations}"
    )
