"""Shared fixtures: one SparkSession for the whole test run, a DuckDB oracle
connection with the driver views pre-registered, and a result comparator that
mirrors the driver's check (row count + column names + order-insensitive values).
"""

from __future__ import annotations

import math
import os
import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from ksql_spark.session import get_spark  # noqa: E402
from ksql_spark.tables import TABLES  # noqa: E402

# sf0.01 is what the driver checks; small enough to stay fast locally.
SF_DIR = os.environ.get("KSQL_TEST_SF_DIR", "/root/testdata/sf0.01")
SF_SMALL = "/root/testdata/sf0.001"

#: Builder closing-pass tier (VERDICT r13 item 1b): the handful of
#: REPO-WIDE sweep gates (every-builder job census, every-plan window
#: sweep, degenerate-corpus sweep, dtype census — ~32 min of the ~55 min
#: suite) exceed the round driver's verify budget, which truncated the r13
#: run at ~81%. They stay in the suite, opt-in via KSQL_FULL_TESTS=1, and
#: the builder's closing pass runs them (recorded in OPTIMIZATION_r14.md);
#: the default run keeps every per-entry/per-operator gate.
import pytest as _pytest  # noqa: E402

full_tier = _pytest.mark.skipif(
    not os.environ.get("KSQL_FULL_TESTS"),
    reason="repo-wide sweep tier: set KSQL_FULL_TESTS=1 (builder closing pass)",
)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="ksql-spark-tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm(v):
    """Normalize a cell for comparison (Rows→tuples, arrays→tuples, NaN marker)."""
    from pyspark.sql import Row

    if isinstance(v, Row):
        return tuple((k, _norm(x)) for k, x in sorted(v.asDict().items()))
    if isinstance(v, dict):
        return tuple((k, _norm(x)) for k, x in sorted(v.items()))
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def spark_result(df):
    cols = sorted(df.columns)
    rows = [tuple(_norm(r[c]) for c in cols) for r in df.collect()]
    return cols, rows


def duck_result(con, sql):
    cur = con.execute(sql)
    names = [d[0] for d in cur.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    rows = [tuple(_norm(r[i]) for i in order) for r in cur.fetchall()]
    return sorted(names), rows


def _sort_key(row):
    return tuple((str(type(v)), str(v)) for v in row)


def assert_results_match(spark_res, duck_res, name=""):
    scols, srows = spark_res
    dcols, drows = duck_res
    assert scols == dcols, f"{name}: column names differ: spark={scols} duck={dcols}"
    assert len(srows) == len(drows), (
        f"{name}: row count differs: spark={len(srows)} duck={len(drows)}"
    )
    srows = sorted(srows, key=_sort_key)
    drows = sorted(drows, key=_sort_key)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)}/{len(srows)} rows differ; first 3: "
        + "; ".join(f"#{i} spark={a} duck={b}" for i, a, b in mismatches[:3])
    )


#: Spark simpleString dtype → the DuckDB column type the oracle must produce.
#: The driver's value hash is width-sensitive, so int vs BIGINT is an err row
#: there even when values agree (see tools/driver_sim.py dtype check).
_WIDTH_MAP = {
    "int": {"INTEGER"},
    "bigint": {"BIGINT"},
    "smallint": {"SMALLINT"},
    "float": {"FLOAT"},
    "double": {"DOUBLE"},
    "boolean": {"BOOLEAN"},
}


def assert_widths_match(df, con, sql, name=""):
    """Numeric/boolean column widths must agree between the Spark schema and
    the DuckDB result description."""
    # cursor.description reports generic NUMBER; DESCRIBE gives real types
    duck_types = {
        r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()
    }
    for f in df.schema.fields:
        want = _WIDTH_MAP.get(f.dataType.simpleString())
        if want is None or f.name not in duck_types:
            continue
        got = duck_types[f.name].upper()
        assert got in want, (
            f"{name}: column {f.name} width mismatch — spark "
            f"{f.dataType.simpleString()} vs duckdb {got} (driver hashes are "
            "width-sensitive; add explicit casts on both sides)"
        )
