"""Driver simulator — mirrors the round driver's correctness check.

Creates a VANILLA SparkSession (no engine confs — catches conf-dependency
bugs), imports __spark_entry__, runs every queries() entry at sf0.01, and
compares against oracle_sql() via DuckDB views over the same parquet:
sorted-columns + sorted-rows exact compare. Oracle-less entries get a
rows-only check (runs, >=0 rows, stable schema).

Usage: python tools/driver_sim.py [--sf-dir DIR] [--only name1,name2] [--first N]
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def _norm(v):
    """Mirror the driver's canonicalization: nulls (None/NaN/NaT) collapse to
    None; date/datetime variants collapse to an ISO timestamp string."""
    import datetime as dt

    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return None
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return dt.datetime(v.year, v.month, v.day).isoformat()
    return v


def values_equal(a, b) -> bool:
    # floats compare EXACTLY — the real driver hash-compares values bitwise,
    # so any tolerance here would hide rows the driver will mark err
    a, b = _norm(a), _norm(b)
    if a is None or b is None:
        return a is b
    return a == b


def frames_equal(s: pd.DataFrame, o: pd.DataFrame) -> tuple[bool, str]:
    if list(s.columns) != list(o.columns):
        return False, f"cols {list(s.columns)} != {list(o.columns)}"
    if len(s) != len(o):
        return False, f"rows {len(s)} != {len(o)}"
    # numeric width must match too: the driver's hash is dtype-sensitive, so
    # Spark int vs oracle BIGINT (e.g. a missing CAST ... AS INT) is an err
    # row there even when the values agree (README width-cast convention)
    for c in s.columns:
        sk, ok = s[c].dtype.kind, o[c].dtype.kind
        if {sk, ok} <= {"i", "u", "f"} and s[c].dtype != o[c].dtype:
            return False, f"col {c} dtype {s[c].dtype} != {o[c].dtype}"
    for c in s.columns:
        sv, ov = s[c].tolist(), o[c].tolist()
        for i, (x, y) in enumerate(zip(sv, ov)):
            if not values_equal(x, y):
                return False, f"col {c} row {i}: {x!r} != {y!r}"
    return True, ""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("--first", type=int, default=None)
    ap.add_argument("--skip", type=int, default=0)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    names = list(qs)
    if args.only:
        names = [n for n in args.only.split(",") if n in qs]
    if args.skip:
        names = names[args.skip :]
    if args.first:
        names = names[: args.first]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    n_pass = n_rows_only = n_fail = 0
    failures = {}
    t_start = time.monotonic()
    for i, name in enumerate(names, 1):
        t0 = time.monotonic()
        try:
            sdf = qs[name](spark, args.sf_dir).toPandas()
            if name in osql:
                odf = con.execute(osql[name]).df()
                ok, why = frames_equal(canon(sdf), canon(odf))
                if ok:
                    n_pass += 1
                    status = "pass"
                else:
                    n_fail += 1
                    failures[name] = why
                    status = f"FAIL {why}"
            else:
                n_rows_only += 1
                status = f"rows-only ({len(sdf)} rows)"
        except Exception as exc:  # noqa: BLE001
            n_fail += 1
            failures[name] = repr(exc)[:300]
            status = f"ERROR {repr(exc)[:120]}"
        print(f"[{i}/{len(names)}] {name}: {status} ({time.monotonic()-t0:.1f}s)",
              flush=True)

    print(json.dumps({
        "pass": n_pass, "rows_only": n_rows_only, "fail": n_fail,
        "total": len(names), "elapsed_sec": round(time.monotonic() - t_start, 1),
        "failures": failures,
    }))
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
