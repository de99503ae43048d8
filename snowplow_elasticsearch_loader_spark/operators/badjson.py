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


# ---------------------------------------------------------------------------
# Full BadRowTransformer parity (core/BadRowTransformer.scala:30-72):
# the reference applies 12 fixed path-targeted fixes to self-describing
# bad-row JSON — rename union-typed fields with a _str/_list suffix
# (objects keep their name) and stringify specific nested values — but
# ONLY for the com.snowplowanalytics.snowplow.badrows schema vendor;
# other JSON passes through unchanged, unparseable input is an error.

_BADROWS_VENDOR = "com.snowplowanalytics.snowplow.badrows"


def _rename_field(obj, field: str) -> None:
    """renameField analog: string -> <field>_str, array -> <field>_list,
    anything else (incl. objects) left unchanged. Insertion order
    matches circe's remove+add (suffix key appended)."""
    if not isinstance(obj, dict) or field not in obj:
        return
    v = obj[field]
    if isinstance(v, str):
        del obj[field]
        obj[field + "_str"] = v
    elif isinstance(v, list):
        del obj[field]
        obj[field + "_list"] = v


def _serialize_field(obj, field: str) -> None:
    """serializeField analog: non-string value -> compact JSON text."""
    import json

    if not isinstance(obj, dict) or field not in obj:
        return
    if not isinstance(obj[field], str):
        obj[field] = json.dumps(obj[field], separators=(",", ":"), ensure_ascii=False)


def _obj_at(data, *path):
    """Descend objects only (circe root.x.y.obj semantics: a missing or
    non-object step makes the fix a no-op)."""
    cur = data
    for p in path:
        if not isinstance(cur, dict):
            return None
        cur = cur.get(p)
    return cur if isinstance(cur, dict) else None


def _each_obj(data, *path):
    holder = _obj_at(data, *path[:-1]) if len(path) > 1 else (
        data if isinstance(data, dict) else None
    )
    arr = holder.get(path[-1]) if holder else None
    return [x for x in arr if isinstance(x, dict)] if isinstance(arr, list) else []


def transform_badrow_data(data) -> None:
    """Apply the 12 fixes in the reference's exact order (mutates)."""
    _rename_field(data, "failure")                                   # 1
    _rename_field(data, "payload")                                   # 2
    _serialize_field(_obj_at(data, "payload", "raw"), "parameters")  # 3
    _rename_field(_obj_at(data, "failure"), "error")                 # 4
    _rename_field(_obj_at(data, "failure"), "errors")                # 5
    _rename_field(_obj_at(data, "failure"), "message")               # 6
    for m in _each_obj(data, "failure", "messages"):
        _rename_field(m, "error")                                    # 7
        _serialize_field(m, "expectedMapping")                       # 8
        _serialize_field(m, "json")                                  # 9
        msg = m.get("message")
        if isinstance(msg, dict):
            _rename_field(msg, "error")                              # 10
    for item in _each_obj(data, "failure_list"):
        _rename_field(item, "error")                                 # 11
        _serialize_field(item, "value")                              # 12


_SCHEMA_KEY_RE = None


def _parse_schema_key(uri: str):
    """Full iglu SchemaKey parse (vendor, name, format, version) or
    None. Mirrors the reference's SelfDescribingData decode
    (core/BadRowTransformer.scala:48-49): a schema string that is not a
    complete, well-formed ``iglu:vendor/name/jsonschema/x-y-z`` URI is
    NOT transformed — the row passes through unchanged — whereas a bare
    vendor-prefix split would transform rows the reference leaves
    alone."""
    global _SCHEMA_KEY_RE
    if _SCHEMA_KEY_RE is None:
        import re

        _SCHEMA_KEY_RE = re.compile(
            r"^iglu:([a-zA-Z0-9\-_.]+)/([a-zA-Z0-9\-_]+)/([a-zA-Z0-9\-_]+)/(\d+-\d+-\d+)$"
        )
    m = _SCHEMA_KEY_RE.match(uri)
    return m.groups() if m else None


def handle_iglu_json(row: str) -> tuple[str | None, str | None]:
    """(transformed json text, error): the handleIgluJson contract —
    self-describing badrows-vendor JSON gets the 12 fixes applied to
    its `data`; any other valid JSON passes through; parse failure is
    routed as an error instead of thrown."""
    import json

    try:
        j = json.loads(row)
    except Exception as e:
        return None, f"BadRowTransformer cannot parse row as JSON: {e}"
    if isinstance(j, dict) and isinstance(j.get("schema"), str) and isinstance(j.get("data"), dict):
        key = _parse_schema_key(j["schema"])
        if key is not None and key[0] == _BADROWS_VENDOR:
            transform_badrow_data(j["data"])
            return json.dumps(j, separators=(",", ":"), ensure_ascii=False), None
    return json.dumps(j, separators=(",", ":"), ensure_ascii=False), None


def transform_badrows(df: DataFrame, json_col: str = "json") -> DataFrame:
    """df + (transformed, _error) via mapInPandas. JSON tree rewriting
    is inherently per-element (the reference also folds fixes per row,
    core/BadRowTransformer.scala:61-62); the loop body is stdlib-json C
    parsing, not python field logic per row of a relational operator."""
    from pyspark.sql import types as T

    from ..shipping import ensure_shipped

    ensure_shipped(df.sparkSession)
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("transformed", T.StringType()), T.StructField("_error", T.StringType())]
    )

    def run(it):
        import pandas as pd

        for pdf in it:
            res = [handle_iglu_json(x) if x is not None else (None, "null_row") for x in pdf[json_col]]
            out = pdf.copy()
            out["transformed"] = [t for t, _ in res]
            out["_error"] = [e for _, e in res]
            yield out

    return df.mapInPandas(run, schema=out_schema)


def limit_error_count(badrows: DataFrame, error_col: str = "error") -> DataFrame:
    """Singleton (index_limit_error) — the S12 metric."""
    return badrows.agg(
        F.coalesce(
            F.sum(F.when(F.col(error_col).rlike(LIMIT_ERROR_PATTERN), 1).otherwise(0)),
            F.lit(0),
        ).alias("index_limit_error")
    )
