"""The local twin of the driver's correctness gate: every queries()
entry with an oracle_sql() twin must agree with DuckDB at sf0.001."""

from __future__ import annotations

import importlib.util
import os

import pytest

from .oracle_compare import compare, duck_con

_ENTRY = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py")
spec = importlib.util.spec_from_file_location("spark_entry", _ENTRY)
entry_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry_mod)

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.schema is not None


def test_every_oracle_key_has_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_vs_duckdb(spark, sf_tiny, name):
    con = duck_con(sf_tiny)
    oracle = con.execute(ORACLES[name]).fetchdf()
    got = QUERIES[name](spark, sf_tiny)
    compare(got, oracle, name)
