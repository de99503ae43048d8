"""Physical-plan inspection helpers.

The reference hand-tunes its physical policies (SURVEY §4); here the
optimizer owns them, so plan SHAPE is part of the test surface: filters
must reach the parquet scan (PushedFilters), partition columns must
prune (PartitionFilters), small sides must broadcast, and top-k must
use WindowGroupLimit (partial top-k before the exchange). These helpers
make those assertions one-liners in pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def assert_in_plan(df: DataFrame, *needles: str) -> None:
    plan = formatted_plan(df)
    missing = [n for n in needles if n not in plan]
    assert not missing, f"plan is missing {missing}\n---\n{plan[:4000]}"


def assert_not_in_plan(df: DataFrame, *needles: str) -> None:
    plan = formatted_plan(df)
    present = [n for n in needles if n in plan]
    assert not present, f"plan unexpectedly contains {present}\n---\n{plan[:4000]}"
