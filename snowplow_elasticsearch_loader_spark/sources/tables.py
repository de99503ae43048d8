"""Table sources (SURVEY S1 analog).

The reference's source is a Kinesis stream of tokened byte batches
(core/Processing.scala:42-49); our batch source is a table scan —
parquet here, Iceberg (``spark.read.format('iceberg')`` with optional
snapshot pinning) when the runtime is present. Keeping this behind one
function means every operator upstream is storage-agnostic and keeps
Catalyst's pushdown/pruning (scan-level filters and column pruning are
asserted in tests via the physical plan).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    fmt: str = "parquet",
    snapshot_id: int | None = None,
) -> DataFrame:
    from ..shipping import ensure_shipped

    ensure_shipped(spark)
    if fmt == "iceberg":
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        return reader.load(os.path.join(sf_dir, name))
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
