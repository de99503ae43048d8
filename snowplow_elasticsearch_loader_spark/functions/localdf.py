"""Driver-known small tables as pure-JVM literal plans.

``spark.createDataFrame(rows)`` over Python rows builds a PICKLED RDD
(``applySchemaToPythonRDD``): every evaluation of that scan — each
broadcast build, each AQE re-plan, each reuse miss — forks Python
workers just to unpickle a handful of driver-known rows. Measured in
this sandbox, one JVM-side BM25 query forked ~190 workers through this
path (each paying the daemon's arena prefault), inflating a 7 s query
to 190+ s. A literal struct-array that Catalyst folds to a
LocalRelation touches no Python at evaluation time, which is what the
input-hint's "no per-row Python" demands of the engine's own plumbing.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def literal_df(
    spark: SparkSession, rows: Sequence[Sequence], schema: T.StructType | str
) -> DataFrame:
    """Small (driver-known) rows -> DataFrame as a literal plan.

    Intended for tables of at most a few hundred rows (query terms,
    fixtures): the rows become expression-tree literals, so plan size
    grows with row count."""
    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    atype = T.ArrayType(T.StructType(schema.fields), containsNull=False)
    items = [
        F.struct(
            *[
                F.lit(v).cast(f.dataType).alias(f.name)
                for v, f in zip(row, schema.fields)
            ]
        )
        for row in rows
    ]
    arr = F.array(*items).cast(atype) if items else F.lit(None).cast(atype)
    return spark.range(1).select(F.explode(arr).alias("_r")).select("_r.*")
