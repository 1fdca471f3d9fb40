"""Totality net over the WHOLE registry: every builder must survive a
hostile corpus — NULL / empty / whitespace-only text, NULL group keys,
NULL measure values, zero vectors — without aborting. The driver fixtures
contain none of these, so the oracle gate can never catch an ANSI-mode
DIVIDE_BY_ZERO or an unguarded index; this suite can (it is how the
round-5 EWMA abort was found at the helper level, generalized to every
entry).

Only no-crash is asserted (plus non-negative row counts): semantics on
degenerate rows are pinned per-helper in test_null_robustness.py; here the
contract is "a production corpus with dirty rows must never kill the job".
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ksql_spark.registry import all_specs

from .conftest import SF_SMALL, full_tier

SPECS = all_specs()

#: entries excluded from the sweep: the bucketed join writes warehouse
#: tables (covered by its own suite) and the k8s scan ignores sf_dir.
#: The ann_* model-fitting entries ARE included — their flat-search /
#: bounded-sample fallbacks must hold on a 201-vector corpus with a zero
#: vector, and do.
SKIP = {"join_bucketed_colocated"}
SKIP_PREFIXES = ("scan_k8s",)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

NASTY_TEXT = [None, "", "   ", "a", "a  b\tc  d", "x " * 3 + "\n\ny z"]


@pytest.fixture(scope="module")
def degen_dir(tmp_path_factory):
    """All 10 driver tables, built from a small sf0.001 sample with
    degenerate rows injected into every text-ish and measure column."""
    d = tmp_path_factory.mktemp("degen_corpus")
    con = duckdb.connect()
    for t in TABLES:
        df = con.sql(
            f"SELECT * FROM read_parquet('{SF_SMALL}/{t}.parquet') LIMIT 200"
        ).df()
        if t == "documents":
            extra = pd.DataFrame(
                {
                    "doc_id": [90_001 + i for i in range(len(NASTY_TEXT))],
                    "text": NASTY_TEXT,
                    "lang": [None, "", "xx", None, "en", "en"],
                    "source": [None, "", "s", "s", None, "s"],
                    "n_chars": [0, 0, 3, 1, 9, 10],
                }
            )
            df = pd.concat([df, extra], ignore_index=True)
        elif t == "events":
            extra = pd.DataFrame(
                {
                    "event_id": [90_001, 90_002, 90_003],
                    "ts": pd.to_datetime(
                        ["2024-01-01 00:00:00"] * 3
                    ).astype("datetime64[ns]"),
                    "user_id": [90_001, 90_001, 90_002],
                    "event_type": [None, "", "view"],
                    "value": [None, None, None],  # all-NULL users exist
                    "props": [None, "", "not json"],
                }
            )
            df = pd.concat([df, extra], ignore_index=True)
        elif t == "embeddings":
            dim = len(df["embedding"].iloc[0])
            extra = pd.DataFrame(
                {
                    "vec_id": [90_001],
                    "embedding": [np.zeros(dim, dtype="float32")],
                    "label": [0],
                }
            )
            df = pd.concat([df, extra], ignore_index=True)
        elif t == "customer":
            df.loc[df.index[:3], "c_mktsegment"] = None  # NULL group keys
        elif t == "lineitem":
            df.loc[df.index[:3], "l_returnflag"] = None
        if t == "embeddings":
            arr = pa.array(
                [np.asarray(v, dtype="float32") for v in df["embedding"]],
                type=pa.list_(pa.float32()),
            )
            table = pa.Table.from_arrays(
                [
                    pa.array(df["vec_id"], type=pa.int64()),
                    arr,
                    pa.array(df["label"], type=pa.int32()),
                ],
                names=["vec_id", "embedding", "label"],
            )
        else:
            table = pa.Table.from_pandas(df, preserve_index=False)
        pq.write_table(table, f"{d}/{t}.parquet")
    return str(d)


@pytest.mark.parametrize(
    "name",
    [
        n
        for n in sorted(SPECS)
        if n not in SKIP and not n.startswith(SKIP_PREFIXES)
    ],
)
@full_tier
def test_entry_survives_degenerate_corpus(name, spark, degen_dir):
    rows = SPECS[name].builder(spark, degen_dir).limit(500).collect()
    assert rows is not None  # reaching here = no abort; content unasserted
