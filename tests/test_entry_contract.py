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


def test_cardinality_hll_estimate_within_bound(spark, sf_tiny):
    """The scale path for the cardinality agg is approx_count_distinct
    (HLL++, rsd default 0.05). Assert the estimator tracks the exact
    per-group cardinality well inside 5 sigma of its configured rsd on
    every bucket — the contract that lets a deployment swap it in."""
    from pyspark.sql import functions as F

    from snowplow_elasticsearch_loader_spark.sources import load_table

    ev = load_table(spark, sf_tiny, "events")
    rsd = 0.05
    both = (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", rsd).alias("est"),
        )
        .collect()
    )
    assert both
    for r in both:
        exact, est = int(r["exact"]), int(r["est"])
        assert abs(est - exact) <= max(5, 5 * rsd * exact), (
            f"{r['event_type']}: HLL estimate {est} vs exact {exact}"
        )
