"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship BM25 top-k query on sf0.001;
``queries``/``oracle_sql`` expose every implemented operator (SURVEY.md
§2) with DuckDB twins where SQL-expressible. Implementations live in
``snowplow_elasticsearch_loader_spark.contract``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from snowplow_elasticsearch_loader_spark.contract import (  # noqa: E402
    ORACLE_SQL,
    SPARK_QUERIES,
    q_bm25_topk,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 over sf0.001 documents for the reference
    query set (naive relational path; driver checks rows>0)."""
    return q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
