"""Oracle-dtype pin (VERDICT r10 item 5): statically compare every entry's
Spark result schema against its DuckDB oracle's DESCRIBE types, mapped to the
pandas dtype each engine would materialize, WITHOUT executing either query.

The driver's hash compare is dtype-sensitive for numeric columns (driver_sim
frames_equal: kinds {i,u,f} must match exactly after toPandas), so a DuckDB
typing-ladder literal coming back DECIMAL while Spark says DOUBLE — the r10
mid-round failure class — is a driver err row even when values agree. This
sweep catches that class at authoring time: Spark side = analyzed schema
(plan only); DuckDB side = DESCRIBE <oracle> (plans, never executes).

Usage: python tools/dtype_sweep.py [--sf-dir DIR] [--only k1,k2]
Prints one JSON line {"checked": N, "violations": {...}}.
"""

from __future__ import annotations

import argparse
import json
import re
import sys
import time
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Engine type -> the pandas dtype family toPandas()/.df() materializes for a
# null-free column. Families: i8/i16/i32/i64, f32/f64, decimal, bool, str,
# date, ts, other. The driver gate only bites when BOTH sides land in a
# numeric pandas kind and widths differ, or one side lands object(Decimal).
_SPARK_MAP = {
    "tinyint": "i8", "smallint": "i16", "int": "i32", "integer": "i32",
    "bigint": "i64", "long": "i64", "float": "f32", "double": "f64",
    "boolean": "bool", "string": "str", "date": "date",
    "timestamp": "ts", "timestamp_ntz": "ts", "binary": "other",
}

_DUCK_MAP = {
    "TINYINT": "i8", "SMALLINT": "i16", "INTEGER": "i32", "BIGINT": "i64",
    "HUGEINT": "f64",  # duckdb .df() converts HUGEINT to float64
    "UTINYINT": "u8", "USMALLINT": "u16", "UINTEGER": "u32", "UBIGINT": "u64",
    "FLOAT": "f32", "REAL": "f32", "DOUBLE": "f64",
    "BOOLEAN": "bool", "VARCHAR": "str", "JSON": "str", "DATE": "date",
    "TIMESTAMP": "ts", "TIMESTAMP WITH TIME ZONE": "ts", "BLOB": "other",
}


def spark_family(dt: str) -> str:
    dt = dt.lower()
    if dt.startswith("decimal"):
        return "decimal"
    if dt.startswith(("array", "map", "struct")):
        return "other"
    return _SPARK_MAP.get(dt, f"?spark:{dt}")


def duck_family(dt: str) -> str:
    dt = dt.upper()
    if dt.startswith("DECIMAL"):
        return "decimal"
    if dt.endswith("[]") or dt.startswith(("STRUCT", "MAP", "LIST", "UNION")):
        return "other"
    return _DUCK_MAP.get(dt, f"?duck:{dt}")


_NUMERIC = re.compile(r"^[iuf]\d+$")


def families_conflict(s: str, d: str) -> bool:
    """True when the pair would (or could) fail the driver's dtype gate."""
    if s == d:
        return False
    # decimal on either side materializes object(Decimal) in pandas while the
    # other side is a float/int column -> driver col-dtype or value mismatch
    if "decimal" in (s, d):
        return True
    # both numeric but different width/kind -> driver dtype mismatch
    if _NUMERIC.match(s) and _NUMERIC.match(d):
        return True
    # unknown engine type mapped -> surface it
    if s.startswith("?") or d.startswith("?"):
        return True
    return False


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from ksql_spark.registry import all_specs

    specs = all_specs()
    names = [n for n, s in specs.items() if s.oracle]
    if args.only:
        names = [n for n in args.only.split(",") if n in specs]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    t0 = time.monotonic()
    checked = 0
    violations: dict[str, list] = {}
    errors: dict[str, str] = {}
    for i, name in enumerate(names, 1):
        spec = specs[name]
        try:
            sdf = spec.builder(spark, args.sf_dir)
            stypes = {f.name: spark_family(f.dataType.simpleString())
                      for f in sdf.schema.fields}
            desc = con.execute(f"DESCRIBE {spec.oracle}").fetchall()
            dtypes = {r[0]: duck_family(r[1]) for r in desc}
            bad = []
            for col in sorted(set(stypes) & set(dtypes)):
                if families_conflict(stypes[col], dtypes[col]):
                    bad.append([col, stypes[col], dtypes[col]])
            if set(stypes) != set(dtypes):
                bad.append(["<columns>", sorted(stypes), sorted(dtypes)])
            if bad:
                violations[name] = bad
            checked += 1
        except Exception as exc:  # noqa: BLE001
            errors[name] = repr(exc)[:200]
        if i % 50 == 0:
            print(f"... {i}/{len(names)} ({time.monotonic()-t0:.0f}s)",
                  file=sys.stderr, flush=True)

    print(json.dumps({
        "checked": checked, "n_violations": len(violations),
        "violations": violations, "errors": errors,
        "elapsed_sec": round(time.monotonic() - t0, 1),
    }))
    spark.stop()
    return 1 if (violations or errors) else 0


if __name__ == "__main__":
    raise SystemExit(main())
