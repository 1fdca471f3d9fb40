"""Differential oracle test: every registered query with an oracle must match
DuckDB at sf0.01 — the exact check the driver performs (SURVEY.md §5.2)."""

from __future__ import annotations

import pytest

from ksql_spark.registry import all_specs

from .conftest import (SF_DIR, assert_results_match, assert_widths_match,
                       duck_result, spark_result)

SPECS = all_specs()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, duck):
    spec = SPECS[name]
    df = spec.builder(spark, SF_DIR)
    sres = spark_result(df)
    if spec.oracle is None:
        # rows-only check (mirrors the driver's weaker gate)
        assert sres[1] is not None
        return
    dres = duck_result(duck, spec.oracle)
    assert_results_match(sres, dres, name=name)
    assert_widths_match(df, duck, spec.oracle, name=name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"n_name", "revenue", "line_count"}


def test_contract_shapes():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert all(callable(v) for v in q.values())
    assert all(isinstance(v, str) and v.strip() for v in o.values())
