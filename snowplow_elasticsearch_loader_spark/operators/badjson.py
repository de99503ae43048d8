"""Bad-row JSON normalization (SURVEY S6) and limit-error
classification (S12).

The reference rewrites union-typed JSON fields so the downstream store
never sees a field that is sometimes a string, sometimes an object,
sometimes an array (core/BadRowTransformer.scala:28-72: rename to
``_str``/``_list``, stringify nested objects). Spark/parquet demand
monotyped columns for exactly the same reason ES mappings do, so the
Spark-native re-expression normalizes union JSON fields into typed
COLUMNS: per field, exactly one of ``<f>_str`` / ``<f>_list`` /
``<f>_obj`` is non-null, plus the original JSON text for lossless
echo. All JVM-side (get_json_object + first-character type dispatch —
JSON text type is decidable from its first non-space byte), no UDFs.

S12: the reference counts failures matching ``.*Limit.*has been
exceeded.*`` into a dedicated metric (core/ElasticsearchSink.scala:
162-164,195-198); ``limit_error_count`` is the same regex classifier
over a dead-letter table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LIMIT_ERROR_PATTERN = "Limit.*has been exceeded"


def _typed_value(j: Column):
    """(first-char, value) helpers for JSON type dispatch."""
    head = F.substring(F.ltrim(j), 1, 1)
    return head


def normalize_union_field(df: DataFrame, json_col: str, field: str) -> DataFrame:
    """Split the union-typed ``$.field`` of ``json_col`` into monotyped
    columns: <field>_str (scalar as text), <field>_list (JSON array
    text), <field>_obj (JSON object text). Exactly one is non-null when
    the field exists — the BadRowTransformer contract."""
    v = F.get_json_object(F.col(json_col), f"$.{field}")
    head = _typed_value(v)
    is_obj = head == "{"
    is_list = head == "["
    return (
        df.withColumn(
            f"{field}_str",
            F.when(v.isNotNull() & ~is_obj & ~is_list, v),
        )
        .withColumn(f"{field}_list", F.when(is_list, v))
        .withColumn(f"{field}_obj", F.when(is_obj, v))
    )


def normalize_badrows(df: DataFrame, json_col: str, fields: list[str]) -> DataFrame:
    for f in fields:
        df = normalize_union_field(df, json_col, f)
    return df


def limit_error_count(badrows: DataFrame, error_col: str = "error") -> DataFrame:
    """Singleton (index_limit_error) — the S12 metric."""
    return badrows.agg(
        F.coalesce(
            F.sum(F.when(F.col(error_col).rlike(LIMIT_ERROR_PATTERN), 1).otherwise(0)),
            F.lit(0),
        ).alias("index_limit_error")
    )
